"""OTLP/JSON ingestion source tests: value-mapping round-trip and
end-to-end parity with the parquet source through the full
symbolication pipeline."""

from __future__ import annotations

import os

from opentelemetry_collector_symbolicator_ray.sources.otlp import (
    otlp_to_records,
    read_otlp_jsonl,
    record_to_otlp,
    write_otlp_jsonl,
)
from opentelemetry_collector_symbolicator_ray.synth import generate_corpus, make_record

N_ROWS = 200


def test_otlp_roundtrip_all_record_shapes():
    """record -> OTLP/JSON -> record is the identity for every
    generator shape (logs incl. MetricKit attrs, span records with
    events, structured stacktraces with int arrays)."""
    for i in range(N_ROWS):
        _, record, _ = make_record(i, seed=11)
        assert otlp_to_records(record_to_otlp(record)) == [record]


def test_otlp_source_pipeline_parity(ray_session, tmp_path):
    """read_otlp_jsonl -> symbolicate == read_parquet -> symbolicate
    (per-sink aggregates, telemetry stripped)."""
    import ray.data

    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        drop_telemetry,
        input_files,
        per_sink_aggregates,
        symbolicate,
    )

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, N_ROWS, num_files=2, seed=13)
    otlp_dir = str(tmp_path / "otlp")
    n = write_otlp_jsonl(corpus, otlp_dir)
    assert n == N_ROWS

    cfg = PipelineConfig.with_default_routing(
        os.path.join(corpus, "artifacts"), concurrency=2, batch_size=128
    )
    a = per_sink_aggregates(
        symbolicate(ray.data.read_parquet(input_files(corpus)), cfg)
    ).to_pylist()
    files = sorted(
        os.path.join(otlp_dir, f) for f in os.listdir(otlp_dir) if f.endswith(".jsonl")
    )
    b = per_sink_aggregates(symbolicate(read_otlp_jsonl(files), cfg)).to_pylist()
    assert drop_telemetry(a) == drop_telemetry(b)


def test_skip_bad_lines_quarantine(ray_session, tmp_path):
    """skip_bad_lines=True drops malformed lines instead of failing the
    read; default stays fail-loud."""
    import json

    import pytest
    import ray

    p = str(tmp_path / "dirty.jsonl")
    rec = {
        "event_name": "e",
        "attributes": {},
        "resource_attributes": {"telemetry.sdk.language": "webjs"},
    }
    with open(p, "w") as f:
        f.write(json.dumps(record_to_otlp(rec)) + "\n")
        f.write("{broken\n")
        f.write(json.dumps(record_to_otlp(rec)) + "\n")

    assert read_otlp_jsonl([p], skip_bad_lines=True).count() == 2
    with pytest.raises(ray.exceptions.RayTaskError):
        read_otlp_jsonl([p]).count()


def test_otlp_doc_ids_unique_for_identical_records(ray_session, tmp_path):
    """Identical OTLP records repeated across lines and files must get
    DISTINCT doc_ids (the unique-doc_id contract behind routing salt and
    downstream joins), and the ids must be deterministic across runs."""
    import json

    rec = {
        "event_name": "e",
        "attributes": {},
        "resource_attributes": {"telemetry.sdk.language": "webjs"},
    }
    line = json.dumps(record_to_otlp(rec))
    files = []
    for name in ("a.jsonl", "b.jsonl"):
        p = str(tmp_path / name)
        with open(p, "w") as f:
            for _ in range(50):  # same record on every line
                f.write(line + "\n")
        files.append(p)

    ids1 = [r["doc_id"] for r in read_otlp_jsonl(files).take_all()]
    assert len(ids1) == 100
    assert len(set(ids1)) == 100  # globally unique
    ids2 = [r["doc_id"] for r in read_otlp_jsonl(files).take_all()]
    assert sorted(ids1) == sorted(ids2)  # deterministic across runs
