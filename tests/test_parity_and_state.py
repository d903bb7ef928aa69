"""Parity-checking mode (sourcemapprocessor/parity.go port) and state
primitives (LRU)."""

from __future__ import annotations

from opentelemetry_collector_symbolicator_ray.config import SourceMapConfig
from opentelemetry_collector_symbolicator_ray.stages.js_processor import JsLogProcessor
from opentelemetry_collector_symbolicator_ray.state.lru import LRUCache

from tests.test_js_processor import FakeSymbolicator


def _attrs_consistent(cfg):
    # structured arrays exactly match what the raw-stack parser produces
    return {
        cfg.columns_attribute_key: [17, 5],
        cfg.lines_attribute_key: [13, 20],
        cfg.functions_attribute_key: ["bar", "foo"],
        cfg.urls_attribute_key: ["http://path/to/file.js", "http://path/to/file.js"],
        cfg.exception_type_attribute_key: "TypeError",
        cfg.exception_message_attribute_key: "boom",
        cfg.stack_trace_attribute_key: (
            "TypeError: boom\n"
            "    at bar (http://path/to/file.js:13:17)\n"
            "    at foo (http://path/to/file.js:20:5)"
        ),
    }


def test_parity_consistent():
    proc = JsLogProcessor(
        cfg=SourceMapConfig(enable_parity_checking=True), symbolicator=FakeSymbolicator()
    )
    cfg = proc.cfg
    attrs = _attrs_consistent(cfg)
    assert proc.process_attributes(attrs, {})
    assert attrs["parity.status"] == "consistent"
    assert attrs["parity.totalMismatches"] == 0
    assert attrs["parity.stackframe.comparison"] == ["consistent", "consistent"]
    assert attrs["tracekit.lines"] == [13, 20]
    assert attrs["processorParser.lines"] == [13, 20]
    assert attrs["processorParser.functions"] == ["bar", "foo"]


def test_parity_different():
    proc = JsLogProcessor(
        cfg=SourceMapConfig(enable_parity_checking=True), symbolicator=FakeSymbolicator()
    )
    cfg = proc.cfg
    attrs = _attrs_consistent(cfg)
    attrs[cfg.columns_attribute_key] = [99, 5]  # first frame disagrees
    assert proc.process_attributes(attrs, {})
    assert attrs["parity.status"] == "different"
    assert attrs["parity.totalMismatches"] == 1
    assert attrs["parity.stackframe.comparison"] == ["different", "consistent"]


def test_parity_processor_parser_failed():
    proc = JsLogProcessor(
        cfg=SourceMapConfig(enable_parity_checking=True), symbolicator=FakeSymbolicator()
    )
    cfg = proc.cfg
    attrs = _attrs_consistent(cfg)
    attrs[cfg.stack_trace_attribute_key] = "unparseable\ngarbage\nlines"
    assert proc.process_attributes(attrs, {})
    assert attrs["parity.status"] == "processor-parser-failed"


def test_parity_disabled_by_default():
    proc = JsLogProcessor(cfg=SourceMapConfig(), symbolicator=FakeSymbolicator())
    attrs = _attrs_consistent(proc.cfg)
    assert proc.process_attributes(attrs, {})
    assert "parity.status" not in attrs


def test_lru_eviction_and_refresh():
    cache: LRUCache[int] = LRUCache(2)
    cache.put("a", 1)
    cache.put("b", 2)
    assert cache.get("a") == 1  # refresh a
    cache.put("c", 3)  # evicts b
    assert "b" not in cache
    assert cache.get("b") is None
    assert cache.get("a") == 1
    assert cache.get("c") == 3
    assert len(cache) == 2
    assert cache.hits == 3 and cache.misses == 1


# ---------- codec property tests ----------

from hypothesis import given, settings, strategies as st

_attr_values = st.recursive(
    st.one_of(
        st.text(max_size=40),
        st.integers(min_value=-(2**53), max_value=2**53),
        st.booleans(),
    ),
    lambda children: st.lists(children, max_size=4),
    max_leaves=8,
)
_attr_maps = st.dictionaries(st.text(min_size=1, max_size=20), _attr_values, max_size=6)


@settings(max_examples=200, deadline=None)
@given(event_name=st.text(max_size=20), attrs=_attr_maps, resource=_attr_maps)
def test_codec_bijective(event_name, attrs, resource):
    from opentelemetry_collector_symbolicator_ray.codec import decode_record, encode_record

    record = {"event_name": event_name, "attributes": attrs, "resource_attributes": resource}
    tokens = encode_record(record)
    assert decode_record(tokens) == record
    # canonical: re-encoding the decoded record is byte-stable
    assert encode_record(decode_record(tokens)) == tokens


# ---------- per-lookup timeout -> FetchError("timeout") ----------

def test_timeout_produces_fetch_error_texts(tmp_path):
    """Per-lookup wall-clock timeout yields the reference's FetchError
    texts (symbolicator.go:113-117 twins).  timeout=0 forces the path."""
    import pytest

    from opentelemetry_collector_symbolicator_ray.errors import (
        DsymFetchError,
        ProguardFetchError,
        SourceMapFetchError,
    )
    from opentelemetry_collector_symbolicator_ray.sources.stores import (
        DsymStore,
        ProguardStore,
        SourceMapStore,
    )
    from opentelemetry_collector_symbolicator_ray.stages.dsym_processor import DsymSymbolicator
    from opentelemetry_collector_symbolicator_ray.stages.js_processor import JsSymbolicator
    from opentelemetry_collector_symbolicator_ray.stages.proguard_processor import (
        ProguardSymbolicator,
    )
    from opentelemetry_collector_symbolicator_ray.synth_artifacts import (
        write_dsym,
        write_js_sourcemap,
        write_proguard_mapping,
    )

    write_js_sourcemap(str(tmp_path), "t.js")
    write_proguard_mapping(str(tmp_path), "u-1")
    write_dsym(str(tmp_path), "AAAABBBB-1111-2222-3333-444455556666", "Bin")

    js = JsSymbolicator(SourceMapStore(str(tmp_path)), timeout=0.0)
    with pytest.raises(SourceMapFetchError, match="failed to fetch source map for t.js: timeout"):
        js.symbolicate(0, 1, "f", "t.js", "")

    pg = ProguardSymbolicator(ProguardStore(str(tmp_path)), timeout=0.0)
    with pytest.raises(ProguardFetchError, match="failed to fetch ProGuard mapping for u-1: timeout"):
        pg.symbolicate("u-1", "a.b.c", "a", 5)

    ds = DsymSymbolicator(DsymStore(str(tmp_path)), timeout=0.0)
    with pytest.raises(DsymFetchError, match="failed to fetch dSYM for AAAABBBB-1111-2222-3333-444455556666: timeout"):
        ds.symbolicate_frame("AAAABBBB-1111-2222-3333-444455556666", "Bin", 100436)

