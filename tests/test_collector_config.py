"""Loader for the reference collector's config.yaml shape
(/root/reference/config.yaml, processor mapstructure keys from
{sourcemap,dsym,proguard}processor/config.go)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from opentelemetry_collector_symbolicator_ray.collector_config import (
    load_collector_config,
)

REFERENCE_SHAPE = """
receivers:
  otlp:
    protocols:
      grpc:
        endpoint: 0.0.0.0:4317
      http:
        endpoint: 0.0.0.0:4318

processors:
  source_map_symbolicator:
    symbolicator_failure_attribute_key: exception.symbolicator.failed
    source_map_store: s3_store
    s3_source_maps:
      region: us-east-1
      bucket: my-maps
      prefix: maps/v1
    timeout: 250ms
    source_map_cache_size: 64
    allowed_languages: [webjs, javascript]
  dsym_symbolicator:
    local_dsyms:
      path: ./test_assets
    preserve_stack_trace: false
  proguard_symbolicator:
    proguard_uuid_attribute_key: app.custom.uuid
  batch:
    send_batch_size: 1024

service:
  pipelines:
    traces:
      receivers: [otlp]
      processors: [source_map_symbolicator]
      exporters: [debug]
    logs:
      receivers: [otlp]
      processors: [dsym_symbolicator, proguard_symbolicator, batch]
      exporters: [debug]
"""


def test_loader_maps_reference_config_shape(tmp_path):
    f = tmp_path / "config.yaml"
    f.write_text(REFERENCE_SHAPE)
    loaded = load_collector_config(str(f))
    cfg = loaded["config"]
    sm = cfg.sourcemap
    assert sm.source_map_store == "s3_store"
    assert sm.region == "us-east-1"
    assert sm.bucket == "my-maps"
    assert sm.store_prefix == "maps/v1"
    assert sm.timeout == pytest.approx(0.25)
    assert sm.source_map_cache_size == 64
    assert sm.allowed_languages == ["webjs", "javascript"]
    ds = cfg.dsym
    assert ds.dsym_store == "file_store"
    assert ds.local_path == "./test_assets"
    assert ds.preserve_stack_trace is False
    assert cfg.proguard.proguard_uuid_attribute_key == "app.custom.uuid"
    assert cfg.batch_size == 1024
    assert loaded["pipelines"] == {
        "traces": ["source_map_symbolicator"],
        "logs": ["dsym_symbolicator", "proguard_symbolicator", "batch"],
    }
    assert loaded["otlp"] == {"grpc": "0.0.0.0:4317", "http": "0.0.0.0:4318"}


def test_loader_rejects_unknown_keys(tmp_path):
    f = tmp_path / "bad.yaml"
    f.write_text("processors:\n  source_map_symbolicator:\n    not_a_key: 1\n")
    with pytest.raises(ValueError, match="unknown config key"):
        load_collector_config(str(f))
    f.write_text("processors:\n  mystery_processor: {}\n")
    with pytest.raises(ValueError, match="unknown processor"):
        load_collector_config(str(f))


def test_cli_run_with_collector_config_matches_default(tmp_path):
    """A YAML that spells out the default routing must produce the exact
    aggregates of the flag-configured run (same corpus, fresh outputs)."""
    corpus = tmp_path / "corpus"
    subprocess.run(
        [sys.executable, "-m", "opentelemetry_collector_symbolicator_ray", "synth",
         "--out", str(corpus), "--rows", "300", "--files", "2"],
        check=True, cwd="/root/repo", capture_output=True,
    )
    yaml_cfg = tmp_path / "config.yaml"
    yaml_cfg.write_text(f"""
processors:
  source_map_symbolicator:
    local_source_maps:
      path: {corpus}/artifacts/sourcemaps
    allowed_languages: [webjs, javascript]
  dsym_symbolicator:
    local_dsyms:
      path: {corpus}/artifacts/dsyms
    allowed_languages: [swift]
  proguard_symbolicator:
    local_store:
      path: {corpus}/artifacts/proguard
    allowed_languages: [java, kotlin]
""")

    def run(out, extra):
        p = subprocess.run(
            [sys.executable, "-m", "opentelemetry_collector_symbolicator_ray", "run",
             "--input", str(corpus), "--output", out, *extra],
            check=True, cwd="/root/repo", capture_output=True, text=True,
        )
        return json.loads(p.stdout.strip().splitlines()[-1])

    a = run(str(tmp_path / "out_default"), [])
    b = run(str(tmp_path / "out_yaml"), ["--collector-config", str(yaml_cfg)])
    # durations are wall-clock; compare everything else
    def strip(d):
        return {
            sink: {
                k: v
                for k, v in agg.items()
                if "duration" not in k and not k.startswith("dur_")
            }
            for sink, agg in d.items()
        }
    assert strip(a) == strip(b)


def test_serve_cli_with_collector_config(tmp_path):
    """`serve --collector-config`: stores AND the listener endpoint come
    from the collector YAML (endpoint 127.0.0.1:0 binds ephemeral)."""
    import glob
    import os
    import subprocess

    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.codec import decode_batch_tokens
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus
    from tests.test_otlp_http import post, record_to_otlp

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 30, num_files=1, seed=31)
    yaml_cfg = tmp_path / "config.yaml"
    yaml_cfg.write_text(f"""
receivers:
  otlp:
    protocols:
      http:
        endpoint: 127.0.0.1:0
processors:
  source_map_symbolicator:
    local_source_maps:
      path: {corpus}/artifacts/sourcemaps
    allowed_languages: [webjs, javascript]
  dsym_symbolicator:
    local_dsyms:
      path: {corpus}/artifacts/dsyms
    allowed_languages: [swift]
  proguard_symbolicator:
    local_store:
      path: {corpus}/artifacts/proguard
    allowed_languages: [java, kotlin]
""")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "opentelemetry_collector_symbolicator_ray", "serve",
            "--spool", str(tmp_path / "spool"), "--output", str(tmp_path / "out"),
            "--artifacts", os.path.join(corpus, "artifacts"),
            "--drain-interval", "1.0", "--max-drains", "2",
            "--concurrency", "2", "--batch-size", "32",
            "--collector-config", str(yaml_cfg),
        ],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd="/root/repo", env={**os.environ, "RAY_ADDRESS": "local"},
    )
    try:
        info = json.loads(proc.stdout.readline())
        base = info["listening"]
        assert base.startswith("http://127.0.0.1:")
        n = 0
        for path in sorted(glob.glob(os.path.join(corpus, "*.parquet"))):
            for record in decode_batch_tokens(pq.read_table(path)):
                status, _ = post(f"{base}/v1/logs", json.dumps(record_to_otlp(record)).encode())
                assert status == 200
                n += 1
        out_lines = [json.loads(l) for l in proc.stdout]
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
    totals = out_lines[-1]["totals"]
    assert sum(v["rows"] for v in totals.values()) == n


def test_read_harmonized_mixed_schemas(ray_session, tmp_path):
    """Three producer generations — full schema, missing+extra column,
    narrower int type — read as ONE dataset with the target schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.sources.tabular import read_harmonized

    target = pa.schema(
        [("id", pa.int64()), ("val", pa.float64()), ("tag", pa.string())]
    )
    pq.write_table(
        pa.table({"id": pa.array([1, 2], type=pa.int64()),
                  "val": pa.array([1.5, 2.5]), "tag": pa.array(["a", "b"])}),
        tmp_path / "v1.parquet",
    )
    pq.write_table(  # v2: dropped `tag`, added `extra`
        pa.table({"id": pa.array([3], type=pa.int64()),
                  "val": pa.array([3.5]), "extra": pa.array([9])}),
        tmp_path / "v2.parquet",
    )
    pq.write_table(  # v0: int32 ids, no val
        pa.table({"id": pa.array([4, 5], type=pa.int32()),
                  "tag": pa.array(["d", "e"])}),
        tmp_path / "v0.parquet",
    )
    ds = read_harmonized(
        [str(tmp_path / f) for f in ("v1.parquet", "v2.parquet", "v0.parquet")],
        target,
    )
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "val", "tag"]
    assert df["id"].tolist() == [1, 2, 3, 4, 5]
    assert df["tag"].isna().tolist() == [False, False, True, False, False]
    assert df["val"].isna().tolist() == [False, False, False, True, True]


def test_pipelines_section_disables_unwired_processors(tmp_path):
    """A processor configured but wired into no service pipeline is
    inert (collector parity); records it would have claimed route to
    unsymbolicated."""
    import os

    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.stages.symbolicate_stage import (
        SymbolicatorChain,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus, make_record

    f = tmp_path / "config.yaml"
    f.write_text("""
processors:
  source_map_symbolicator: {}
  dsym_symbolicator: {}
  proguard_symbolicator: {}
service:
  pipelines:
    logs:
      processors: [dsym_symbolicator]
""")
    loaded = load_collector_config(str(f))
    assert loaded["config"].enabled_processors == ["dsym"]

    # chain honors the enabled set: an android (proguard) record no
    # longer routes when only dsym is wired
    d = str(tmp_path / "corpus")
    generate_corpus(d, 50, num_files=1, seed=3)
    full_cfg = PipelineConfig.with_default_routing(os.path.join(d, "artifacts"))
    dsym_only = PipelineConfig.with_default_routing(os.path.join(d, "artifacts"))
    dsym_only.enabled_processors = ["dsym"]
    full = SymbolicatorChain(full_cfg)
    gated = SymbolicatorChain(dsym_only)
    sinks_full, sinks_gated = set(), set()
    for i in range(300):
        _, record, _ = make_record(i, seed=3)
        import copy

        sinks_full.add(full.process_record(copy.deepcopy(record))[0])
        sinks_gated.add(gated.process_record(copy.deepcopy(record))[0])
    assert {"js", "android", "apple"} <= sinks_full
    assert "android" not in sinks_gated and "js" not in sinks_gated
    assert "apple" in sinks_gated


def test_loader_durations_and_gcs_block(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("""
processors:
  source_map_symbolicator:
    timeout: 1m
  dsym_symbolicator:
    gcs_dsyms:
      bucket: my-dsyms
      prefix: ios/
  proguard_symbolicator:
    timeout: 250ms
""")
    loaded = load_collector_config(str(f))
    assert loaded["config"].sourcemap.timeout == 60.0
    assert loaded["config"].proguard.timeout == pytest.approx(0.25)
    ds = loaded["config"].dsym
    assert ds.dsym_store == "gcs_store"
    assert ds.bucket == "my-dsyms" and ds.store_prefix == "ios/"

    f.write_text("processors:\n  dsym_symbolicator:\n    timeout: fortnight\n")
    with pytest.raises(ValueError, match="unparseable duration"):
        load_collector_config(str(f))


def test_explicit_store_key_beats_nested_block(tmp_path):
    """The collector picks the backend solely from the *_store key
    (dsymprocessor/factory.go switch); a leftover s3_dsyms block must
    supply parameters only, never flip the kind — regardless of YAML
    key order."""
    f = tmp_path / "c.yaml"
    # block BEFORE the explicit key (the order that used to lose)
    f.write_text("""
processors:
  dsym_symbolicator:
    s3_dsyms:
      bucket: leftover
      region: us-east-1
    dsym_store: file_store
""")
    ds = load_collector_config(str(f))["config"].dsym
    assert ds.dsym_store == "file_store"
    assert ds.bucket == "leftover"  # params still applied

    # block AFTER the explicit key: same answer
    f.write_text("""
processors:
  dsym_symbolicator:
    dsym_store: file_store
    s3_dsyms:
      bucket: leftover
""")
    ds = load_collector_config(str(f))["config"].dsym
    assert ds.dsym_store == "file_store"

    # no explicit key: the block implies the kind (engine convenience)
    f.write_text("""
processors:
  dsym_symbolicator:
    s3_dsyms:
      bucket: b
""")
    assert load_collector_config(str(f))["config"].dsym.dsym_store == "s3_store"


def test_pipeline_referencing_unconfigured_processor_raises(tmp_path):
    """Collector startup validation: service.pipelines naming a
    processor id with no processors: section refuses to load instead of
    silently running with fewer processors."""
    f = tmp_path / "c.yaml"
    f.write_text("""
processors:
  dsym_symbolicator: {}
service:
  pipelines:
    logs:
      processors: [dsym_symbolicator, source_map_symbolicator]
""")
    with pytest.raises(ValueError, match="unconfigured processor"):
        load_collector_config(str(f))

    f.write_text("""
processors:
  dsym_symbolicator: {}
service:
  pipelines:
    logs:
      processors: [batch]
""")
    with pytest.raises(ValueError, match="unconfigured processor"):
        load_collector_config(str(f))
