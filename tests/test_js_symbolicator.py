"""JS store + symbolicator integration tests, mirroring
sourcemapprocessor/symbolicator_test.go:24-100 and store_test.go against
generated fixtures with the reference fixture's shape."""

from __future__ import annotations

import pytest

from opentelemetry_collector_symbolicator_ray.errors import (
    FetchError,
    SourceMapFetchError,
    StoreError,
    SymbolicationError,
)
from opentelemetry_collector_symbolicator_ray.functions.sourcemap import (
    SourceMapCache,
    decode_vlq_segment,
    encode_mappings,
)
from opentelemetry_collector_symbolicator_ray.sources.stores import SourceMapStore
from opentelemetry_collector_symbolicator_ray.stages.js_processor import (
    JsSymbolicator,
    build_cache_key,
    format_stack_frame,
)
from opentelemetry_collector_symbolicator_ray.synth_artifacts import write_js_sourcemap

JS_URL = "https://www.example.com/assets/js/basic-mapping.js"
NO_URL = "https://www.example.com/assets/js/does-not-exist.js"
UUID = "e63db37d-9886-452a-8e56-2250dcc20102"
UUID_FILE = "uuid-mapping.js"

MAX_INT64 = 2**63 - 1


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("sourcemaps")
    write_js_sourcemap(str(d), "basic-mapping.js")
    write_js_sourcemap(str(d / UUID), UUID_FILE)
    return str(d)


@pytest.fixture()
def sym(assets):
    return JsSymbolicator(SourceMapStore(assets), timeout=5.0, cache_size=128)


def test_symbolicate_basic(sym):
    # Golden from sourcemapprocessor/symbolicator_test.go:41-44.
    sf = sym.symbolicate(0, 34, "b", JS_URL, "")
    assert format_stack_frame(sf) == "    at bar(basic-mapping.js:8:1)"


def test_symbolicate_no_url(sym):
    sf = sym.symbolicate(0, 34, "b", "", "")
    assert format_stack_frame(sf) == "    at b(:0:34)"


def test_symbolicate_uuid(sym):
    sf = sym.symbolicate(0, 34, "b", UUID_FILE, UUID)
    assert format_stack_frame(sf) == "    at bar(uuid-mapping.js:8:1)"


def test_symbolicate_missing_file(sym):
    with pytest.raises(SourceMapFetchError):
        sym.symbolicate(0, 34, "b", NO_URL, "")


def test_symbolicate_out_of_range(sym):
    with pytest.raises(SymbolicationError, match="line must be uint32"):
        sym.symbolicate(MAX_INT64, 34, "b", JS_URL, "")
    with pytest.raises(SymbolicationError, match="column must be uint32"):
        sym.symbolicate(0, MAX_INT64, "b", JS_URL, "")


def test_cache_population(sym):
    assert len(sym.cache) == 0
    sym.symbolicate(0, 34, "b", JS_URL, "")
    assert len(sym.cache) == 1
    # Same URL, different UUID => separate fetch (and a failure here).
    with pytest.raises(FetchError):
        sym.symbolicate(0, 34, "b", UUID_FILE, "different-uuid-1234")
    assert len(sym.cache) == 1
    sym.symbolicate(0, 34, "b", UUID_FILE, UUID)
    assert len(sym.cache) == 2


def test_build_cache_key():
    assert build_cache_key("app.js", "") == "app.js"
    assert build_cache_key("app.js", "build-v1.0") == "app.js|build-v1.0"
    assert build_cache_key("vendor.js", "build-v1.0") == "vendor.js|build-v1.0"


def test_store_takes_last_mapping_url(assets):
    # The fixture embeds two decoy sourceMappingURL strings before the
    # real one (store.go:64-65: last match wins).
    store = SourceMapStore(assets)
    source, smap = store.get_source_map(JS_URL, "")
    assert b"embedded-content.js.map" in source
    assert b'"version": 3' in smap or b'"version":3' in smap


def test_store_missing_source(assets):
    store = SourceMapStore(assets)
    with pytest.raises(StoreError, match="failed to find source file"):
        store.get_source_map(NO_URL, "")


def test_store_query_preserved(tmp_path):
    import os

    # Query strings become part of the on-disk key (store.go:48-50).
    write_js_sourcemap(str(tmp_path), "q.js")
    os.rename(tmp_path / "q.js", tmp_path / "q.js?v=1")
    store = SourceMapStore(str(tmp_path))
    source, _ = store.get_source_map("https://ex.com/a/q.js?v=1", "")
    assert source


def test_vlq_roundtrip():
    tokens = [(0, 0, 0, 0, None), (0, 9, 0, 9, 0), (1, 4, 3, 2, 1), (2, 0, 7, 0, 0)]
    mappings = encode_mappings(tokens)
    smc = SourceMapCache("x", '{"version":3,"names":["a","b"],"sources":["s.js"],"mappings":"%s"}' % mappings)
    got = [(t.gen_line, t.gen_col, t.src_line, t.src_col, t.name) for t in smc.tokens]
    assert got == [
        (0, 0, 0, 0, None),
        (0, 9, 0, 9, "a"),
        (1, 4, 3, 2, "b"),
        (2, 0, 7, 0, "a"),
    ]
    assert decode_vlq_segment("AAAA") == [0, 0, 0, 0]
