"""End-to-end pipeline tests over the deterministic synthetic corpus:
routing, per-sink aggregates, token roundtrip/determinism, checkpoint
resume (SURVEY.md §5 layer 3)."""

from __future__ import annotations

import os

import pytest

from opentelemetry_collector_symbolicator_ray.codec import decode_record, encode_record
from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
    drop_telemetry,
    input_files,
    per_sink_aggregates,
    run_checkpointed,
    symbolicate,
)
from opentelemetry_collector_symbolicator_ray.state.checkpoint import ShardManifest
from opentelemetry_collector_symbolicator_ray.synth import generate_corpus, make_record

N_ROWS = 600


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    generate_corpus(d, N_ROWS, num_files=6, seed=42)
    return d


def make_cfg(corpus):
    return PipelineConfig.with_default_routing(
        os.path.join(corpus, "artifacts"), concurrency=2, batch_size=128
    )


def test_codec_roundtrip():
    for i in range(50):
        _, record, _ = make_record(i, seed=7)
        assert decode_record(encode_record(record)) == record


def test_e2e_routing_and_aggregates(ray_session, corpus):
    import ray.data

    cfg = make_cfg(corpus)
    ds = ray.data.read_parquet(input_files(corpus))
    out = symbolicate(ds, cfg)
    agg = per_sink_aggregates(out).to_pylist()
    by_sink = {row["sink"]: row for row in agg}

    assert set(by_sink) == {"js", "android", "apple", "unsymbolicated"}
    total = sum(r["rows"] for r in agg)
    assert total == N_ROWS
    # mix roughly matches the generator weights
    assert by_sink["js"]["rows"] > by_sink["apple"]["rows"]
    assert by_sink["unsymbolicated"]["rows"] > 0
    # symbolication actually happened and some edges failed
    assert by_sink["js"]["frames_processed"] > 0
    assert by_sink["android"]["frames_processed"] > 0
    assert by_sink["apple"]["frames_processed"] > 0
    assert by_sink["js"]["failed_rows"] > 0
    assert by_sink["unsymbolicated"]["frames_processed"] == 0
    assert by_sink["unsymbolicated"]["failed_rows"] == 0


def test_e2e_rows_processed_and_deterministic(ray_session, corpus):
    import ray.data

    cfg = make_cfg(corpus)
    out = symbolicate(ray.data.read_parquet(input_files(corpus)), cfg)
    rows = sorted(
        ((r["doc_id"], r["sink"], r["symbolicator_failed"], tuple(r["tokens"])) for r in out.take_all()),
    )
    # run again: byte-identical routed rows (token-array equality per doc_id)
    out2 = symbolicate(ray.data.read_parquet(input_files(corpus)), cfg)
    rows2 = sorted(
        ((r["doc_id"], r["sink"], r["symbolicator_failed"], tuple(r["tokens"])) for r in out2.take_all()),
    )
    assert rows == rows2

    # processed rows carry the processor tags; unsymbolicated rows are
    # byte-identical to their inputs
    inputs = {}
    for i in range(N_ROWS):
        doc_id, record, _ = make_record(i, seed=42)
        inputs[doc_id] = record
    for doc_id, sink, failed, tokens in rows[:200]:
        record = decode_record(list(tokens))
        if sink == "unsymbolicated":
            assert record == inputs[doc_id]
        else:
            assert "honeycomb.processor_type" in record["attributes"]
            expected_type = {
                "js": "source_map_symbolicator",
                "android": "proguard_symbolicator",
                "apple": "dsym_symbolicator",
            }[sink]
            assert record["attributes"]["honeycomb.processor_type"] == expected_type
            assert record["attributes"]["exception.symbolicator.failed"] == failed


def test_e2e_salted_repartition_same_result(ray_session, corpus):
    import ray.data

    cfg = make_cfg(corpus)
    plain = per_sink_aggregates(symbolicate(ray.data.read_parquet(input_files(corpus)), cfg)).to_pylist()
    salted = per_sink_aggregates(
        symbolicate(ray.data.read_parquet(input_files(corpus)), cfg, salted=True)
    ).to_pylist()
    assert drop_telemetry(plain) == drop_telemetry(salted)
    # telemetry parity columns ride along on both paths
    assert all("symbolication_duration" in r for r in plain)


def test_checkpoint_resume(ray_session, corpus, tmp_path):
    out_a = str(tmp_path / "run_fresh")
    out_b = str(tmp_path / "run_resumed")
    cfg = make_cfg(corpus)

    # fresh full run
    agg_fresh = run_checkpointed(corpus, out_a, cfg, shard_size=2)

    # killed run: only 1 shard completes, then resume
    partial = run_checkpointed(corpus, out_b, cfg, shard_size=2, max_shards=1)
    assert set(ShardManifest(out_b).committed_shards()) == {0}
    assert sum(v["rows"] for v in partial.values()) < N_ROWS

    manifest_path = os.path.join(out_b, "manifest", "shard-00000.json")
    mtime_before = os.path.getmtime(manifest_path)
    agg_resumed = run_checkpointed(corpus, out_b, cfg, shard_size=2)
    # completed shard was not reprocessed
    assert os.path.getmtime(manifest_path) == mtime_before

    assert drop_telemetry(agg_fresh) == drop_telemetry(agg_resumed)
    # duration sums and cache gauges are recorded in the manifests
    assert agg_fresh["js"]["symbolication_duration"] > 0
    assert agg_fresh["js"]["sourcemap_cache_size"] > 0
    # duration histogram conservation: bucket counts partition the rows
    for sink, counters in agg_fresh.items():
        hist_total = sum(
            counters[k] for k in ("dur_le_100us", "dur_le_1ms", "dur_le_10ms", "dur_gt_10ms")
        )
        assert hist_total == counters["rows"], sink
    assert sum(v["rows"] for v in agg_resumed.values()) == N_ROWS
    # content hash equality: resumed run output == fresh run output
    for sink in agg_fresh:
        assert agg_fresh[sink]["token_hash"] == agg_resumed[sink]["token_hash"]


def test_span_event_records():
    """Trace spans: the sourcemap processor runs over span attrs AND each
    span event's attrs (sourcemapprocessor/processor.go:70-85)."""
    import pyarrow as pa

    from opentelemetry_collector_symbolicator_ray.codec import encode_batch_records
    from opentelemetry_collector_symbolicator_ray.stages.symbolicate_stage import (
        SymbolicatorChain,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    d = "/tmp/ocsr_span_fixture"
    generate_corpus(d, 50, num_files=1, seed=3)
    cfg = PipelineConfig.with_default_routing(os.path.join(d, "artifacts"))
    chain = SymbolicatorChain(cfg)

    span_records, ids = [], []
    for i in range(400):
        doc_id, record, _ = make_record(i, seed=3)
        if isinstance(record.get("events"), list):
            span_records.append(record)
            ids.append(doc_id)
    assert span_records, "generator must emit span records"

    tokens, n_tok = encode_batch_records(span_records)
    batch = pa.table(
        {
            "doc_id": pa.array(ids),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": pa.array(["synth"] * len(ids)),
        }
    )
    out = chain(batch)
    sinks = out.column("sink").to_pylist()
    assert "js" in sinks

    for tok, sink in zip(out.column("tokens").to_pylist(), sinks):
        record = decode_record(tok)
        ev_attrs = record["events"][0]["attributes"]
        if sink == "js":
            assert ev_attrs["honeycomb.processor_type"] == "source_map_symbolicator"
            # span's own non-exception attrs untouched
            assert record["attributes"]["span.kind"] == "client"
            assert "honeycomb.processor_type" not in record["attributes"]
        else:
            assert "honeycomb.processor_type" not in ev_attrs


def test_semantic_drift_golden(ray_session):
    """Pinned per-sink aggregates for the seed corpus (generator v3,
    600 rows, seed 42; generator v4 adds opera11/safari raw styles).  If the generator or any processor semantics
    change, this golden changes WITH INTENT — update it only alongside a
    deliberate semantic change."""
    import __ray_entry__ as entry_mod

    table = entry_mod.queries()["sym_checkpointed_agg"]("/root/testdata/sf0.001")
    got = {
        r["sink"]: (
            r["rows"], r["failed_rows"], r["frames_processed"],
            r["frames_failed"], r["fetch_failures"], r["token_hash"],
        )
        for r in table.to_pylist()
    }
    assert got == {
        "android": (134, 6, 460, 6, 2, 291784222525),
        "apple": (120, 24, 399, 3, 123, 260694383757),
        "js": (245, 13, 804, 8, 1, 536452325812),
        "unsymbolicated": (101, 0, 0, 0, 0, 226112319990),
    }


def test_hot_key_detection_and_targeted_salting(ray_session, corpus):
    """detect_hot_debug_ids finds the Zipf-hot build ids from a small
    sample; salting only those keys still yields identical aggregates."""
    import ray.data

    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        detect_hot_debug_ids,
        salted_repartition,
    )
    from opentelemetry_collector_symbolicator_ray.synth import (
        APPLE_BUILDS,
        JS_UUIDS,
        PROGUARD_UUIDS,
    )

    files = input_files(corpus)
    hot = detect_hot_debug_ids(files, sample_rows=600, hot_fraction=0.05)
    # the generator makes the first id of each platform hot (~30% of its
    # platform's rows)
    assert JS_UUIDS[0] in hot or PROGUARD_UUIDS[0] in hot or APPLE_BUILDS[0][0] in hot

    cfg = make_cfg(corpus)
    plain = per_sink_aggregates(
        symbolicate(ray.data.read_parquet(files), cfg)
    ).to_pylist()
    ds = salted_repartition(ray.data.read_parquet(files), cfg, hot_ids=frozenset(hot))
    targeted = per_sink_aggregates(symbolicate(ds, cfg)).to_pylist()
    assert drop_telemetry(plain) == drop_telemetry(targeted)


def test_orphan_part_reconciliation(ray_session, corpus, tmp_path):
    """Part files written by failed/retried attempts (present on disk but
    absent from the committed manifest) are removed, so out/<sink>/ is
    exactly the manifest's output set."""
    import glob
    import json

    out_dir = str(tmp_path / "run")
    cfg = make_cfg(corpus)
    run_checkpointed(corpus, out_dir, cfg, shard_size=2, max_shards=1)

    # plant an orphan "retry ghost" for shard 0, then resume the rest
    ghost = os.path.join(out_dir, "js", "part-00000-deadbeef0000.parquet")
    with open(ghost, "wb") as f:
        f.write(b"not really parquet")
    # shard 0 is committed; its reconciliation already ran — simulate a
    # ghost for the NEXT shard instead (uncommitted -> cleaned at start)
    ghost1 = os.path.join(out_dir, "js", "part-00001-deadbeef0001.parquet")
    with open(ghost1, "wb") as f:
        f.write(b"not really parquet")

    run_checkpointed(corpus, out_dir, cfg, shard_size=2)
    assert not os.path.exists(ghost1)  # cleaned before reprocessing

    all_parts = set(glob.glob(os.path.join(out_dir, "*", "part-*.parquet")))
    recorded = set()
    for mf in glob.glob(os.path.join(out_dir, "manifest", "shard-*.json")):
        with open(mf) as f:
            recorded.update(json.load(f)["outputs"])
    # everything on disk (minus the shard-0 ghost we planted after its
    # commit) is manifest-recorded
    assert all_parts - recorded == {ghost}


def test_fused_file_reader_matches_two_stage(ray_session, corpus, tmp_path):
    """SymbolicatorChainFromFiles (read+process+write fused in the actor)
    produces the same per-sink aggregates as the two-stage pipeline."""
    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        aggregates_from_summaries,
        symbolicate_and_write,
        symbolicate_files,
    )

    import ray.data

    cfg = make_cfg(corpus)
    files = input_files(corpus)
    a = aggregates_from_summaries(
        symbolicate_and_write(ray.data.read_parquet(files), cfg, str(tmp_path / "a"), "t")
    ).to_pylist()
    b = aggregates_from_summaries(
        symbolicate_files(files, cfg, str(tmp_path / "b"), "t")
    ).to_pylist()
    assert drop_telemetry(a) == drop_telemetry(b)
    assert a[0]["symbolication_duration"] > 0


def test_empty_batch_handling():
    """The chain preserves the output schema on zero-row batches."""
    import pyarrow as pa

    from opentelemetry_collector_symbolicator_ray.codec import encode_batch_records
    from opentelemetry_collector_symbolicator_ray.stages.symbolicate_stage import (
        OUTPUT_SCHEMA,
        SymbolicatorChain,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    d = "/tmp/ocsr_span_fixture"
    generate_corpus(d, 50, num_files=1, seed=3)
    chain = SymbolicatorChain(
        PipelineConfig.with_default_routing(os.path.join(d, "artifacts"))
    )
    tokens, n_tok = encode_batch_records([])
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.string()),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": pa.array([], type=pa.string()),
        }
    )
    out = chain(empty)
    assert out.num_rows == 0
    assert out.schema.equals(OUTPUT_SCHEMA)


def test_pipeline_step_registry(ray_session, corpus):
    """SURVEY §2.11: config-driven pipeline composition by step NAME
    reproduces the hand-built flagship pipeline exactly; unknown steps
    fail with the available set; custom steps plug in."""
    import pyarrow as pa
    import pytest
    import ray.data

    from opentelemetry_collector_symbolicator_ray.pipelines.registry import (
        available_steps,
        build_pipeline,
        register_step,
    )
    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        drop_telemetry,
        input_files,
        per_sink_aggregates,
        symbolicate,
    )

    cfg = make_cfg(corpus)
    spec = [
        {"step": "read_parquet", "input_dir": corpus},
        {"step": "salted_repartition"},
        {"step": "symbolicate"},
    ]
    composed = per_sink_aggregates(build_pipeline(spec, cfg)).to_pylist()
    direct = per_sink_aggregates(
        symbolicate(ray.data.read_parquet(input_files(corpus)), cfg, salted=True)
    ).to_pylist()
    assert drop_telemetry(composed) == drop_telemetry(direct)

    with pytest.raises(ValueError, match="unknown pipeline step: 'nope'"):
        build_pipeline([{"step": "nope"}], cfg)
    assert "symbolicate" in available_steps()

    # third-party step registration (the distro-extension seam)
    @register_step("drop_unsymbolicated")
    def _drop(ds, cfg):
        import pyarrow.compute as pc

        return ds.filter(expr="sink != 'unsymbolicated'")

    spec2 = spec + [{"step": "drop_unsymbolicated"}]
    filtered = per_sink_aggregates(build_pipeline(spec2, cfg)).to_pylist()
    assert all(r["sink"] != "unsymbolicated" for r in filtered)
    total_kept = sum(r["rows"] for r in filtered)
    total_all = sum(r["rows"] for r in composed)
    assert 0 < total_kept < total_all


def test_skip_failed_shards_resilience(ray_session, tmp_path):
    """A corrupt input file fails its shard only: with
    skip_failed_shards=True the run completes the healthy shards,
    records the failure, and a resume after repair processes exactly
    the failed shard — final aggregates equal an all-healthy run."""
    import shutil

    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import drop_telemetry

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 300, num_files=4, seed=31)
    cfg = make_cfg(corpus)

    # reference run on the healthy corpus
    ref = run_checkpointed(corpus, str(tmp_path / "ref"), cfg, shard_size=1)

    # corrupt ONE input file (keep a backup)
    victim = input_files(corpus)[1]
    shutil.copy(victim, victim + ".bak")
    with open(victim, "wb") as f:
        f.write(b"this is not parquet")

    out = str(tmp_path / "out")
    partial = run_checkpointed(corpus, out, cfg, shard_size=1, skip_failed_shards=True)
    mf = ShardManifest(out)
    assert set(mf.failed_shards()) == {1}
    assert "error" in mf.failed_shards()[1]
    assert set(mf.committed_shards()) == {0, 2, 3}
    assert sum(v["rows"] for v in partial.values()) < 300

    # fail-loud default still raises on the corrupt shard
    import pytest

    with pytest.raises(Exception):
        run_checkpointed(corpus, str(tmp_path / "loud"), cfg, shard_size=1)

    # repair + resume: only shard 1 runs; failure note cleared; equal totals
    shutil.move(victim + ".bak", victim)
    healed = run_checkpointed(corpus, out, cfg, shard_size=1, skip_failed_shards=True)
    assert mf.failed_shards() == {}
    assert set(mf.committed_shards()) == {0, 1, 2, 3}
    assert drop_telemetry(healed) == drop_telemetry(ref)


def test_pipelined_equals_sequential_checkpointed(ray_session, corpus, tmp_path):
    """The single-execution warm-pool checkpointed path commits the same
    per-shard manifests and identical aggregates as the sequential
    per-shard path (telemetry stripped: durations/gauges are wall-clock
    and pool-local)."""
    import json

    cfg = make_cfg(corpus)
    a = run_checkpointed(corpus, str(tmp_path / "pipe"), cfg, shard_size=2)
    b = run_checkpointed(corpus, str(tmp_path / "seq"), cfg, shard_size=2, pipelined=False)
    assert drop_telemetry(a) == drop_telemetry(b)

    ma, mb = ShardManifest(str(tmp_path / "pipe")), ShardManifest(str(tmp_path / "seq"))
    assert ma.committed_shards() == mb.committed_shards()
    for sid in ma.committed_shards():
        ea, eb = ma.read(sid), mb.read(sid)
        assert ea["input_files"] == eb["input_files"]
        # per-shard per-sink counters match shard-for-shard
        assert drop_telemetry(ea["sinks"]) == drop_telemetry(eb["sinks"])

    # pipelined mode refuses the flags that need per-shard isolation
    import pytest

    with pytest.raises(ValueError, match="isolation"):
        run_checkpointed(corpus, str(tmp_path / "x"), cfg, salted=True, pipelined=True)


def test_pipelined_survives_actor_death_exactly_once(
    ray_session, corpus, tmp_path, monkeypatch
):
    """Exactly-once under ACTOR death (not just driver kill): a chain
    worker that writes its part files and then dies mid-task is
    restarted by Ray, the task retries on the fresh actor, and commit-
    time reconciliation removes the dead attempt's orphan parts —
    totals equal a clean run and every part on disk is
    manifest-recorded."""
    import glob
    import json

    import opentelemetry_collector_symbolicator_ray.stages.symbolicate_stage as stage_mod

    ref_out = str(tmp_path / "ref")
    ref = run_checkpointed(corpus, ref_out, make_cfg(corpus), shard_size=2)

    marker = str(tmp_path / "crashed.marker")
    real_cls = stage_mod.SymbolicatorChainFromFiles

    class CrashOnce(real_cls):
        def __call__(self, batch):
            out = real_cls.__call__(self, batch)
            if not os.path.exists(marker):
                open(marker, "w").close()
                os._exit(1)  # die AFTER writing parts, BEFORE returning
            return out

    monkeypatch.setattr(stage_mod, "SymbolicatorChainFromFiles", CrashOnce)
    out = str(tmp_path / "crashy")
    agg = run_checkpointed(corpus, out, make_cfg(corpus), shard_size=2)

    assert os.path.exists(marker)  # the crash really happened
    assert drop_telemetry(agg) == drop_telemetry(ref)

    recorded = set()
    for mf in glob.glob(os.path.join(out, "manifest", "shard-*.json")):
        with open(mf) as f:
            recorded.update(json.load(f)["outputs"])
    on_disk = set(glob.glob(os.path.join(out, "*", "part-*.parquet")))
    assert on_disk == recorded  # dead attempt's duplicates reconciled away


def test_pipelined_commits_healthy_shards_despite_corrupt_file(
    ray_session, tmp_path
):
    """A corrupt input file in ONE shard must not abort the pipelined
    run before anything commits: every healthy shard commits, the error
    names exactly the bad shard, and a resume after repair completes."""
    import shutil

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 300, num_files=4, seed=43)
    cfg = make_cfg(corpus)
    ref = run_checkpointed(corpus, str(tmp_path / "ref"), cfg, shard_size=1)

    victim = input_files(corpus)[1]
    shutil.copy(victim, victim + ".bak")
    with open(victim, "wb") as f:
        f.write(b"definitely not parquet")

    out = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match=r"shard\(s\) \[1\]"):
        run_checkpointed(corpus, out, cfg, shard_size=1)
    # the healthy shards committed BEFORE the raise
    assert set(ShardManifest(out).committed_shards()) == {0, 2, 3}

    shutil.move(victim + ".bak", victim)
    healed = run_checkpointed(corpus, out, cfg, shard_size=1)
    assert set(ShardManifest(out).committed_shards()) == {0, 1, 2, 3}
    assert drop_telemetry(healed) == drop_telemetry(ref)


def test_per_processor_telemetry_conserves_sink_aggregates(ray_session, corpus):
    """The per-processor telemetry view (metadata.yaml parity) is a
    regrouping of the per-sink aggregates under the exclusive-route
    invariant: each processor row must carry exactly its sink's frame /
    fetch / duration totals, buckets must partition the rows, and the
    store-specific fetch-failure metric names must match metadata.yaml."""
    import ray.data

    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        PROCESSOR_FETCH_METRIC,
        SINK_PROCESSOR,
        per_processor_telemetry,
    )

    cfg = make_cfg(corpus)
    ds = ray.data.read_parquet(input_files(corpus))
    out = symbolicate(ds, cfg).materialize()
    sinks = {r["sink"]: r for r in per_sink_aggregates(out).to_pylist()}
    procs = {r["processor"]: r for r in per_processor_telemetry(out).to_pylist()}

    assert set(procs) == {
        "source_map_symbolicator", "proguard_symbolicator", "dsym_symbolicator"
    }
    for sink, pname in SINK_PROCESSOR.items():
        p, s = procs[pname], sinks[sink]
        assert p["processor_total_processed_frames"] == s["frames_processed"]
        assert p["processor_total_failed_frames"] == s["frames_failed"]
        assert p["processor_total_fetch_failures"] == s["fetch_failures"]
        assert p["processor_symbolication_duration_count"] == s["rows"]
        assert p["processor_symbolication_duration_sum"] == pytest.approx(
            s["symbolication_duration"]
        )
        buckets = (
            p["dur_le_100us"] + p["dur_le_1ms"] + p["dur_le_10ms"] + p["dur_gt_10ms"]
        )
        assert buckets == s["rows"]
        assert p["fetch_failure_metric"] == PROCESSOR_FETCH_METRIC[pname]
    # unsymbolicated rows record nothing (reference starts the duration
    # timer only after the gate passes)
    total_proc_rows = sum(
        p["processor_symbolication_duration_count"] for p in procs.values()
    )
    assert total_proc_rows == sum(
        s["rows"] for k, s in sinks.items() if k != "unsymbolicated"
    )
