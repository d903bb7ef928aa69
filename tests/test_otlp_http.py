"""In-engine OTLP/HTTP listener tests (sources/otlp_http.py): request
handling on the standard OTLP paths, spool rotation atomicity, and
full-pipeline parity with the parquet source through the micro-batch
drain — the network-receiver half of operator S1 (reference ingests
OTLP/HTTP on :4318, config.yaml:1-7)."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest

from opentelemetry_collector_symbolicator_ray.sources.otlp import (
    otlp_to_records,
    record_to_otlp,
)
from opentelemetry_collector_symbolicator_ray.sources.otlp_http import (
    OTLPHttpReceiver,
    drain_to_dataset,
)


def post(url: str, body: bytes) -> tuple[int, bytes]:
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.fixture
def receiver(tmp_path):
    r = OTLPHttpReceiver(str(tmp_path / "spool"), rotate_records=1000)
    yield r
    r.close()


def _sample_request(i: int = 0) -> dict:
    return record_to_otlp(
        {
            "event_name": f"e{i}",
            "attributes": {"k": i},
            "resource_attributes": {"telemetry.sdk.language": "webjs"},
        }
    )


def test_http_receiver_accepts_and_rejects(receiver):
    base = f"http://{receiver.host}:{receiver.port}"
    status, body = post(f"{base}/v1/logs", json.dumps(_sample_request()).encode())
    assert status == 200 and json.loads(body) == {}
    status, _ = post(f"{base}/v1/traces", json.dumps(_sample_request(1)).encode())
    assert status == 200

    status, body = post(f"{base}/v1/logs", b"{not json")
    assert status == 400 and "error" in json.loads(body)
    status, _ = post(f"{base}/v1/metrics", json.dumps(_sample_request()).encode())
    assert status == 404  # reference pipelines: logs + traces only

    assert receiver.received == 2
    assert receiver.rejected == 1


def test_spool_rotation_and_drain_roundtrip(ray_session, receiver):
    base = f"http://{receiver.host}:{receiver.port}"
    sent = [_sample_request(i) for i in range(25)]
    for req in sent:
        status, _ = post(f"{base}/v1/logs", json.dumps(req).encode())
        assert status == 200

    # nothing is drainable until rotation seals the open file
    assert receiver.completed_files() == []
    files = receiver.rotate()
    assert len(files) == 1 and files[0].endswith(".jsonl")
    # atomicity: no half-written .open files left visible to drains
    assert not any(f.endswith(".open") for f in os.listdir(receiver.spool_dir))

    ds = drain_to_dataset(receiver)
    rows = ds.take_all()
    assert len(rows) == 25
    assert len({r["doc_id"] for r in rows}) == 25  # unique doc_ids

    from opentelemetry_collector_symbolicator_ray.codec import decode_batch_tokens
    import pyarrow as pa

    got = decode_batch_tokens(pa.Table.from_pylist(rows))
    want = [otlp_to_records(req)[0] for req in sent]
    assert sorted(got, key=lambda r: r["event_name"]) == sorted(
        want, key=lambda r: r["event_name"]
    )

    # an empty drain (no new spool) yields an empty, correctly-typed set
    empty = drain_to_dataset(receiver)
    assert empty.count() == 25  # completed files re-drain until archived


def test_rotate_by_record_threshold(tmp_path):
    r = OTLPHttpReceiver(str(tmp_path / "spool"), rotate_records=10)
    try:
        base = f"http://{r.host}:{r.port}"
        for i in range(25):
            status, _ = post(f"{base}/v1/logs", json.dumps(_sample_request(i)).encode())
            assert status == 200
        # 25 records at threshold 10 -> 2 sealed files + 1 open
        assert len(r.completed_files()) == 2
        files = r.rotate()
        assert len(files) == 3
        n_lines = sum(len(open(f).read().splitlines()) for f in files)
        assert n_lines == 25
    finally:
        r.close()


def test_http_ingest_pipeline_parity(ray_session, tmp_path):
    """corpus -> OTLP/HTTP POSTs -> drain -> symbolicate produces the
    same per-sink aggregates as the parquet source (telemetry
    stripped)."""
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_symbolicator_ray.codec import decode_batch_tokens
    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        drop_telemetry,
        input_files,
        per_sink_aggregates,
        symbolicate,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 120, num_files=1, seed=17)

    r = OTLPHttpReceiver(str(tmp_path / "spool"), rotate_records=50)
    try:
        base = f"http://{r.host}:{r.port}"
        for path in sorted(glob.glob(os.path.join(corpus, "*.parquet"))):
            for record in decode_batch_tokens(pq.read_table(path)):
                status, _ = post(
                    f"{base}/v1/logs", json.dumps(record_to_otlp(record)).encode()
                )
                assert status == 200
        ds = drain_to_dataset(r)
    finally:
        r.close()

    cfg = PipelineConfig.with_default_routing(
        os.path.join(corpus, "artifacts"), concurrency=2, batch_size=64
    )
    a = per_sink_aggregates(
        symbolicate(ray.data.read_parquet(input_files(corpus)), cfg)
    ).to_pylist()
    b = per_sink_aggregates(symbolicate(ds, cfg)).to_pylist()
    assert drop_telemetry(a) == drop_telemetry(b)


def test_checkpointed_spool_drain(ray_session, tmp_path):
    """drain_spool_checkpointed: each completed spool file is one
    committed shard (sid = ingest sequence), totals equal the parquet
    path, and a re-drain is a no-op."""
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from opentelemetry_collector_symbolicator_ray.codec import decode_batch_tokens
    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        drop_telemetry,
        input_files,
        per_sink_aggregates,
        symbolicate,
    )
    from opentelemetry_collector_symbolicator_ray.sources.otlp_http import (
        drain_spool_checkpointed,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 120, num_files=1, seed=19)
    cfg = PipelineConfig.with_default_routing(
        os.path.join(corpus, "artifacts"), concurrency=2, batch_size=64
    )

    r = OTLPHttpReceiver(str(tmp_path / "spool"), rotate_records=40)
    try:
        base = f"http://{r.host}:{r.port}"
        for path in sorted(glob.glob(os.path.join(corpus, "*.parquet"))):
            for record in decode_batch_tokens(pq.read_table(path)):
                status, _ = post(
                    f"{base}/v1/logs", json.dumps(record_to_otlp(record)).encode()
                )
                assert status == 200
        r.rotate()
    finally:
        r.close()

    out = str(tmp_path / "out")
    res = drain_spool_checkpointed(str(tmp_path / "spool"), out, cfg)
    assert res["drained_shards"] == [0, 1, 2]  # 120 records / 40 per file

    want = {
        row["sink"]: row
        for row in per_sink_aggregates(
            symbolicate(ray.data.read_parquet(input_files(corpus)), cfg)
        ).to_pylist()
    }
    got = res["totals"]

    def comparable(d):
        # token_hash folds doc_ids, which legitimately differ between
        # OTLP-synthesized ids and the parquet corpus ids
        return drop_telemetry(
            {
                k: {kk: vv for kk, vv in v.items() if kk not in ("sink", "token_hash")}
                for k, v in d.items()
            }
        )

    assert comparable(got) == comparable(want)

    # re-drain: committed spool files skip; totals unchanged
    res2 = drain_spool_checkpointed(str(tmp_path / "spool"), out, cfg)
    assert res2["drained_shards"] == []
    assert res2["totals"] == res["totals"]


def test_serve_cli_end_to_end(tmp_path):
    """`serve` CLI: listener + periodic drains in a real subprocess —
    POST records, watch the drain line commit them, aggregates match."""
    import subprocess
    import sys
    import time

    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 40, num_files=1, seed=29)

    proc = subprocess.Popen(
        [
            sys.executable, "-m", "opentelemetry_collector_symbolicator_ray", "serve",
            "--spool", str(tmp_path / "spool"), "--output", str(tmp_path / "out"),
            "--artifacts", os.path.join(corpus, "artifacts"),
            "--port", "0", "--drain-interval", "1.0", "--max-drains", "3",
            "--concurrency", "2", "--batch-size", "32",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"},
    )
    try:
        line = proc.stdout.readline()
        info = json.loads(line)
        base = info["listening"]

        import glob

        import pyarrow.parquet as pq

        from opentelemetry_collector_symbolicator_ray.codec import decode_batch_tokens

        n_posted = 0
        for path in sorted(glob.glob(os.path.join(corpus, "*.parquet"))):
            for record in decode_batch_tokens(pq.read_table(path)):
                status, _ = post(
                    f"{base}/v1/logs", json.dumps(record_to_otlp(record)).encode()
                )
                assert status == 200
                n_posted += 1

        out_lines = [json.loads(l) for l in proc.stdout]
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()

    assert len(out_lines) == 3  # --max-drains honored
    totals = out_lines[-1]["totals"]
    assert sum(v["rows"] for v in totals.values()) == n_posted
    # manifests on disk agree with the printed totals
    agg = subprocess.run(
        [
            sys.executable, "-m", "opentelemetry_collector_symbolicator_ray",
            "aggregates", "--output", str(tmp_path / "out"),
        ],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    assert json.loads(agg.stdout.strip().splitlines()[-1]) == totals


def test_drain_archive_bounds_spool(ray_session, tmp_path):
    """archive=True moves committed spool files to <spool>/drained/
    after commit, so the listing stays bounded; re-drains stay no-ops
    and totals are unchanged."""
    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.sources.otlp_http import (
        drain_spool_checkpointed,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 30, num_files=1, seed=37)
    cfg = PipelineConfig.with_default_routing(
        os.path.join(corpus, "artifacts"), concurrency=2, batch_size=32
    )
    spool = str(tmp_path / "spool")
    r = OTLPHttpReceiver(spool, rotate_records=10)
    try:
        base = f"http://{r.host}:{r.port}"
        for i in range(20):
            status, _ = post(f"{base}/v1/logs", json.dumps(_sample_request(i)).encode())
            assert status == 200
        r.rotate()
    finally:
        r.close()

    out = str(tmp_path / "out")
    res = drain_spool_checkpointed(spool, out, cfg, archive=True)
    assert res["drained_shards"] == [0, 1]
    assert not any(f.endswith(".jsonl") for f in os.listdir(spool))
    assert sorted(os.listdir(os.path.join(spool, "drained"))) == [
        "ingest-000000.jsonl", "ingest-000001.jsonl",
    ]
    res2 = drain_spool_checkpointed(spool, out, cfg, archive=True)
    assert res2["drained_shards"] == [] and res2["totals"] == res["totals"]


def test_http_listener_fuzz_never_crashes(receiver):
    """Garbage bodies (binary junk, truncated JSON, deep nesting, huge
    strings, wrong types) must yield 4xx responses — never kill the
    listener; a valid request afterwards still lands."""
    import random

    rng = random.Random(99)
    base = f"http://{receiver.host}:{receiver.port}"
    bodies = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(1, 400)))
        for _ in range(20)
    ] + [
        b"", b"null", b"[1,2,3]", b'"just a string"', b"123",
        b'{"resourceLogs": ' * 50,
        b'{"a": "' + b"x" * 100_000 + b'"',
    ]
    for body in bodies:
        status, _ = post(f"{base}/v1/logs", body)
        assert 400 <= status < 500

    status, _ = post(f"{base}/v1/logs", json.dumps(_sample_request()).encode())
    assert status == 200
    assert receiver.received == 1


def test_archive_restart_never_reuses_sequences(ray_session, tmp_path):
    """THE confirmed data-loss bug: after drain --archive and a
    listener restart, new spool files must get FRESH sequence numbers —
    never a committed one (which would make them look already-drained
    and be silently skipped/clobbered)."""
    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.sources.otlp_http import (
        drain_spool_checkpointed,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 10, num_files=1, seed=41)
    cfg = PipelineConfig.with_default_routing(
        os.path.join(corpus, "artifacts"), concurrency=1, batch_size=32
    )
    spool, out = str(tmp_path / "spool"), str(tmp_path / "out")

    r1 = OTLPHttpReceiver(spool, rotate_records=100)
    try:
        post(f"http://{r1.host}:{r1.port}/v1/logs", json.dumps(_sample_request(1)).encode())
        r1.rotate()
    finally:
        r1.close()
    res1 = drain_spool_checkpointed(spool, out, cfg, archive=True)
    assert res1["drained_shards"] == [0]

    # restart: the allocator must scan drained/ and continue at 1
    r2 = OTLPHttpReceiver(spool, rotate_records=100)
    try:
        post(f"http://{r2.host}:{r2.port}/v1/logs", json.dumps(_sample_request(2)).encode())
        files = r2.rotate()
    finally:
        r2.close()
    assert [os.path.basename(f) for f in files] == ["ingest-000001.jsonl"]

    res2 = drain_spool_checkpointed(spool, out, cfg, archive=True)
    assert res2["drained_shards"] == [1]  # the new record IS processed
    assert sum(v["rows"] for v in res2["totals"].values()) == 2
    assert sorted(os.listdir(os.path.join(spool, "drained"))) == [
        "ingest-000000.jsonl", "ingest-000001.jsonl",
    ]


def test_orphaned_open_spool_recovered_on_restart(tmp_path):
    """Acked records stranded in a crashed receiver's .jsonl.open file
    are sealed (made drainable) by the next receiver startup."""
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    with open(os.path.join(spool, "ingest-000000.jsonl.open"), "w") as f:
        f.write(json.dumps(_sample_request(7)) + "\n")

    r = OTLPHttpReceiver(spool, rotate_records=100)
    try:
        # orphan sealed and visible to drains
        assert [os.path.basename(p) for p in r.completed_files()] == [
            "ingest-000000.jsonl"
        ]
        # and the allocator moved PAST the recovered sequence
        post(f"http://{r.host}:{r.port}/v1/logs", json.dumps(_sample_request(8)).encode())
        files = r.rotate()
    finally:
        r.close()
    assert [os.path.basename(p) for p in files] == [
        "ingest-000000.jsonl", "ingest-000001.jsonl",
    ]


def test_two_receivers_shared_spool_no_truncation(tmp_path):
    """Two receivers on ONE spool dir (shared-storage topology) must
    never truncate each other's open file: O_EXCL allocation gives them
    disjoint sequences and every acked record survives."""
    spool = str(tmp_path / "spool")
    a = OTLPHttpReceiver(spool, rotate_records=100)
    b = OTLPHttpReceiver(spool, rotate_records=100)
    try:
        for i in range(5):
            post(f"http://{a.host}:{a.port}/v1/logs", json.dumps(_sample_request(i)).encode())
            post(f"http://{b.host}:{b.port}/v1/logs", json.dumps(_sample_request(100 + i)).encode())
        files = sorted(set(a.rotate()) | set(b.rotate()))
    finally:
        a.close()
        b.close()
    n_lines = sum(len(open(f).read().splitlines()) for f in files)
    assert n_lines == 10  # nothing clobbered
    assert len(files) == 2  # disjoint sequences


def test_compact_and_replay_archived_spool(ray_session, tmp_path):
    """compact-spool merges drained shards into one parquet archive and
    read_archived_spool replays EXACTLY the doc_ids the live drain path
    would have produced (audit/backfill contract); source jsonl is
    removed only after the archive commits, and a second compact is a
    clean no-op."""
    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.sources.otlp import read_otlp_jsonl
    from opentelemetry_collector_symbolicator_ray.sources.otlp_http import (
        compact_drained_spool,
        drain_spool_checkpointed,
        read_archived_spool,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 30, num_files=1, seed=37)
    cfg = PipelineConfig.with_default_routing(
        os.path.join(corpus, "artifacts"), concurrency=2, batch_size=32
    )
    spool = str(tmp_path / "spool")
    r = OTLPHttpReceiver(spool, rotate_records=10)
    try:
        base = f"http://{r.host}:{r.port}"
        for i in range(20):
            status, _ = post(f"{base}/v1/logs", json.dumps(_sample_request(i)).encode())
            assert status == 200
        r.rotate()
    finally:
        r.close()

    # capture the live-path doc ids BEFORE drain moves the files
    live_files = sorted(
        os.path.join(spool, f) for f in os.listdir(spool) if f.endswith(".jsonl")
    )
    live_ids = sorted(
        row["doc_id"] for row in read_otlp_jsonl(live_files).take_all()
    )

    out = str(tmp_path / "out")
    drain_spool_checkpointed(spool, out, cfg, archive=True)

    res = compact_drained_spool(spool)
    assert res["archived_files"] == 2 and res["rows"] == 20
    assert os.path.basename(res["archive"]) == "archive-000000-000001.parquet"
    # sources deleted after the rename committed
    assert not any(
        f.endswith(".jsonl") for f in os.listdir(os.path.join(spool, "drained"))
    )

    replay_ids = sorted(
        row["doc_id"] for row in read_archived_spool([res["archive"]]).take_all()
    )
    assert replay_ids == live_ids and len(replay_ids) == 20

    # idempotent on an empty drained dir
    res2 = compact_drained_spool(spool)
    assert res2 == {"archived_files": 0, "archive": None}
