"""Cross-actor single-flight artifact cache tests (state/artifact_cache.py)."""

from __future__ import annotations

import time

import pytest

import ray


def test_single_flight_dedupes_concurrent_fetches(ray_session, tmp_path):
    """N concurrent workers fetching the same cold key -> backend hit
    once; all receive the bytes; coordinator stats reflect the dedup."""
    from opentelemetry_collector_symbolicator_ray.state.artifact_cache import (
        ArtifactCacheCoordinator,
        single_flight_fetch,
    )

    coord = ArtifactCacheCoordinator.options(name="test_sf_cache").remote()
    counter = tmp_path / "fetches"

    def slow_backend(key: str) -> bytes:
        with open(counter, "a") as f:
            f.write(key + "\n")
        time.sleep(0.3)
        return f"data:{key}".encode()

    @ray.remote
    def worker(i: int):
        fetch = single_flight_fetch(slow_backend, coord)
        return fetch("shared-key")

    results = ray.get([worker.remote(i) for i in range(8)])
    assert results == [b"data:shared-key"] * 8
    backend_calls = open(counter).read().splitlines()
    assert backend_calls == ["shared-key"]
    stats = ray.get(coord.stats.remote())
    assert stats["backend_fetches"] == 1
    assert stats["entries"] == 1


def test_single_flight_error_propagates_per_caller(ray_session):
    """A missing artifact raises in EVERY caller (no cached error, next
    caller re-elects as leader) — matching unshared fetch semantics."""
    from opentelemetry_collector_symbolicator_ray.state.artifact_cache import (
        ArtifactCacheCoordinator,
        single_flight_fetch,
    )

    coord = ArtifactCacheCoordinator.options(name="test_sf_err").remote()

    def failing_backend(key: str) -> bytes:
        raise FileNotFoundError(key)

    fetch = single_flight_fetch(failing_backend, coord)
    for _ in range(3):
        with pytest.raises(FileNotFoundError):
            fetch("missing-key")
    stats = ray.get(coord.stats.remote())
    assert stats["backend_fetches"] == 3  # every attempt led and failed
    assert stats["entries"] == 0


def test_byte_budget_lru_eviction(ray_session):
    from opentelemetry_collector_symbolicator_ray.state.artifact_cache import (
        ArtifactCacheCoordinator,
        single_flight_fetch,
    )

    coord = ArtifactCacheCoordinator.options(name="test_sf_lru").remote(max_bytes=100)
    fetch = single_flight_fetch(lambda k: b"x" * 40, coord)
    for key in ("a", "b", "c"):  # 120 bytes > budget -> "a" evicted
        fetch(key)
    stats = ray.get(coord.stats.remote())
    assert stats["entries"] == 2
    assert stats["cached_bytes"] == 80


def test_pipeline_parity_with_shared_cache(ray_session, tmp_path):
    """Full pipeline with shared_artifact_cache=True produces identical
    per-sink aggregates to the unshared path."""
    import os

    import ray.data

    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        drop_telemetry,
        input_files,
        per_sink_aggregates,
        symbolicate,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 300, num_files=2, seed=21)
    arts = os.path.join(corpus, "artifacts")
    plain_cfg = PipelineConfig.with_default_routing(arts, concurrency=2, batch_size=128)
    shared_cfg = PipelineConfig.with_default_routing(
        arts, concurrency=2, batch_size=128, shared_artifact_cache=True
    )
    a = per_sink_aggregates(
        symbolicate(ray.data.read_parquet(input_files(corpus)), plain_cfg)
    ).to_pylist()
    b = per_sink_aggregates(
        symbolicate(ray.data.read_parquet(input_files(corpus)), shared_cfg)
    ).to_pylist()
    assert drop_telemetry(a) == drop_telemetry(b)


def test_leader_death_recovery(ray_session):
    """A leader that dies without filling (killed actor) cannot wedge
    the key: followers time out, depose the stale in-flight entry, and
    re-elect — the fetch completes."""
    from opentelemetry_collector_symbolicator_ray.state.artifact_cache import (
        ArtifactCacheCoordinator,
        single_flight_fetch,
    )

    coord = ArtifactCacheCoordinator.options(name="test_sf_dead").remote(
        leader_timeout=1.0
    )
    # simulate a dead leader: claim leadership, never fill
    assert isinstance(ray.get(coord.begin.remote("wedged-key")), int)

    fetch = single_flight_fetch(lambda k: b"recovered", coord)
    t0 = time.monotonic()
    assert fetch("wedged-key") == b"recovered"
    elapsed = time.monotonic() - t0
    assert elapsed >= 0.9  # waited out the dead leader once
    stats = ray.get(coord.stats.remote())
    assert stats["leader_timeouts"] >= 1
    # and the key is now served from cache instantly
    assert fetch("wedged-key") == b"recovered"


def test_deposed_leader_fill_cannot_clear_incumbent(ray_session):
    """A slow-but-alive leader deposed by the follower timeout must not
    clear the NEW leader's in-flight entry when its late fill() arrives:
    the generation token pins fill to the term that earned it, so woken
    followers can never find neither-cache-nor-inflight and mass
    self-elect (redundant backend fetches)."""
    from opentelemetry_collector_symbolicator_ray.state.artifact_cache import (
        ArtifactCacheCoordinator,
    )

    coord = ArtifactCacheCoordinator.options(name="test_sf_depose").remote(
        leader_timeout=0.5
    )
    gen1 = ray.get(coord.begin.remote("slow-key"))
    assert isinstance(gen1, int)
    # second caller waits out the slow leader, deposes it, becomes the
    # incumbent with a NEW generation
    gen2 = ray.get(coord.begin.remote("slow-key"))
    assert isinstance(gen2, int) and gen2 != gen1

    # the deposed leader's fetch FAILED and its late fill arrives: it
    # must not pop/set the incumbent's event
    ray.get(coord.fill.remote("slow-key", gen1, None))
    stats = ray.get(coord.stats.remote())
    assert stats["inflight"] == 1  # incumbent's entry survives
    assert stats["stale_fills"] == 1

    # the incumbent completes normally; followers are served from cache
    ray.get(coord.fill.remote("slow-key", gen2, b"fresh"))
    stats = ray.get(coord.stats.remote())
    assert stats["inflight"] == 0
    assert ray.get(coord.begin.remote("slow-key")) == b"fresh"

    # a deposed leader that SUCCEEDED still deposits its (valid) bytes
    gen3 = ray.get(coord.begin.remote("other-key"))
    gen4 = ray.get(coord.begin.remote("other-key"))  # deposes gen3
    ray.get(coord.fill.remote("other-key", gen3, b"late-but-valid"))
    assert ray.get(coord.begin.remote("other-key")) == b"late-but-valid"
    # incumbent's entry is still pending until ITS fill
    assert ray.get(coord.stats.remote())["inflight"] == 1
    ray.get(coord.fill.remote("other-key", gen4, b"late-but-valid"))
    assert ray.get(coord.stats.remote())["inflight"] == 0


def test_sharded_coordinators_route_and_dedupe(ray_session, tmp_path):
    """Keys hash-partition over coordinator shards: every key has ONE
    home shard (single-flight preserved per key), load spreads across
    shards, and all callers get the right bytes."""
    import zlib

    from opentelemetry_collector_symbolicator_ray.state.artifact_cache import (
        ArtifactCacheCoordinator,
        single_flight_fetch,
    )

    n_shards = 3
    coords = [
        ArtifactCacheCoordinator.options(name=f"test_sf_shard_{i}").remote()
        for i in range(n_shards)
    ]
    counter = tmp_path / "fetches"

    def backend(key: str) -> bytes:
        with open(counter, "a") as f:
            f.write(key + "\n")
        return f"data:{key}".encode()

    @ray.remote
    def worker(key: str):
        fetch = single_flight_fetch(backend, coords)
        return fetch(key)

    keys = [f"artifact-{i}" for i in range(12)]
    # every key fetched by 4 concurrent workers
    results = ray.get([worker.remote(k) for k in keys for _ in range(4)])
    assert results == [f"data:{k}".encode() for k in keys for _ in range(4)]
    assert sorted(open(counter).read().splitlines()) == sorted(keys)  # one fetch per key

    # shard occupancy matches the crc32 routing, and >1 shard is used
    per_shard = [ray.get(c.stats.remote())["entries"] for c in coords]
    want = [0] * n_shards
    for k in keys:
        want[zlib.crc32(k.encode()) % n_shards] += 1
    assert per_shard == want
    assert sum(1 for n in per_shard if n) > 1


def test_pipeline_parity_with_sharded_cache(ray_session, tmp_path):
    """Full pipeline with artifact_cache_shards=2 produces identical
    per-sink aggregates to the unshared path."""
    import os

    import ray.data

    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        drop_telemetry,
        input_files,
        per_sink_aggregates,
        symbolicate,
    )
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, 300, num_files=2, seed=23)
    arts = os.path.join(corpus, "artifacts")
    plain_cfg = PipelineConfig.with_default_routing(arts, concurrency=2, batch_size=128)
    sharded_cfg = PipelineConfig.with_default_routing(
        arts, concurrency=2, batch_size=128,
        shared_artifact_cache=True, artifact_cache_shards=2,
    )
    a = per_sink_aggregates(
        symbolicate(ray.data.read_parquet(input_files(corpus)), plain_cfg)
    ).to_pylist()
    b = per_sink_aggregates(
        symbolicate(ray.data.read_parquet(input_files(corpus)), sharded_cfg)
    ).to_pylist()
    assert drop_telemetry(a) == drop_telemetry(b)
