"""Cross-actor shared artifact cache with single-flight fetch.

The reference wraps every artifact backend fetch in a
``singleflight.Group`` (sourcemapprocessor/symbolicator.go:70-88 and
twins) so concurrent requests for the same debug artifact hit the
backend once.  Inside one symbolizer actor our per-actor LRU already
serializes; ACROSS the actor pool, concurrent cold misses for a hot
debug-id would each hit the backend.  This module closes that gap with
the one pattern Ray Data cannot express as a batch transform — a shared
mutable index — implemented as a small named Ray actor:

- followers of an in-flight key await an ``asyncio.Event`` (async actor,
  so waiting never blocks the actor's event loop);
- the winning leader fetches via its OWN store backend and fills the
  cache — the coordinator never needs the (unpicklable, per-actor)
  fetch closure;
- artifact BYTES are cached with a byte-budgeted LRU; parsing stays
  per-symbolizer (parsed objects are not shareable across processes).

Scale note: the coordinator is a deliberate single point per job; it
only sees COLD MISSES (hits are served by per-actor LRUs), and payloads
transit Ray's object store implicitly as actor-call results.  For very
large clusters, shard by ``hash(key) % n_coordinators``.
"""

from __future__ import annotations

import asyncio
from collections import OrderedDict

import ray

COORDINATOR_NAME = "ocsr_artifact_cache"


@ray.remote(num_cpus=0)
class ArtifactCacheCoordinator:
    # num_cpus=0: the coordinator must always be schedulable even when
    # the symbolizer pool has every CPU slot — it only coordinates.
    """Async actor: byte-LRU of fetched artifacts + single-flight gate."""

    def __init__(self, max_bytes: int = 256 * 1024 * 1024, leader_timeout: float = 30.0) -> None:
        self.max_bytes = max_bytes
        self.leader_timeout = leader_timeout
        self.cache: OrderedDict[str, bytes] = OrderedDict()
        self.cached_bytes = 0
        # key -> (generation, event): the generation token pins fill()
        # to the leadership term that earned it, so a slow-but-alive
        # leader deposed by the follower timeout cannot clear the NEW
        # leader's in-flight entry when it finally completes (which
        # would wake followers into mass self-election).
        self.inflight: dict[str, tuple[int, asyncio.Event]] = {}
        self._gen = 0
        self.backend_fetches = 0
        self.hits = 0
        self.waits = 0
        self.leader_timeouts = 0
        self.stale_fills = 0

    async def begin(self, key: str) -> bytes | int:
        """Returns cached bytes on hit, or the leadership GENERATION
        TOKEN (int) if the caller became the fetch leader — the token
        must be passed back to ``fill``.  Followers await the leader and
        loop: a successful fill serves them from cache; a failed fill
        (no cache entry) elects the next caller as leader, so every
        caller either gets bytes or raises its OWN store error —
        fetch-error semantics are identical to the unshared path.

        Liveness under leader DEATH (actor killed mid-fetch, so ``fill``
        never runs): followers wait at most ``leader_timeout`` seconds,
        then depose the stale in-flight entry and re-elect — no key can
        wedge the pool permanently."""
        while True:
            if key in self.cache:
                self.cache.move_to_end(key)
                self.hits += 1
                return self.cache[key]
            entry = self.inflight.get(key)
            if entry is None:
                self._gen += 1
                self.inflight[key] = (self._gen, asyncio.Event())
                self.backend_fetches += 1
                return self._gen
            self.waits += 1
            try:
                await asyncio.wait_for(asyncio.shield(entry[1].wait()), self.leader_timeout)
            except asyncio.TimeoutError:
                # leader presumed dead: depose it (only if the SAME
                # term is still registered; a new leader keeps its slot)
                if self.inflight.get(key) is entry:
                    del self.inflight[key]
                    self.leader_timeouts += 1
            # loop re-checks the cache (leader failure leaves no entry
            # -> next iteration elects a new leader)

    async def fill(self, key: str, gen: int, data: bytes | None) -> None:
        """Leader completion: publish bytes (or ``None`` on fetch
        failure) and wake followers.  ``gen`` must be the token returned
        by the ``begin`` call that elected this leader: a deposed
        leader's late fill still deposits valid bytes (cache fill is
        idempotent) but does NOT clear the incumbent leader's in-flight
        entry."""
        if data is not None and key not in self.cache:
            self.cache[key] = data
            self.cached_bytes += len(data)
            while self.cached_bytes > self.max_bytes and self.cache:
                _, evicted = self.cache.popitem(last=False)
                self.cached_bytes -= len(evicted)
        entry = self.inflight.get(key)
        if entry is not None and entry[0] == gen:
            del self.inflight[key]
            entry[1].set()
        elif entry is not None:
            self.stale_fills += 1

    async def stats(self) -> dict:
        return {
            "entries": len(self.cache),
            "cached_bytes": self.cached_bytes,
            "backend_fetches": self.backend_fetches,
            "hits": self.hits,
            "waits": self.waits,
            "leader_timeouts": self.leader_timeouts,
            "stale_fills": self.stale_fills,
            "inflight": len(self.inflight),
        }


def get_or_create_coordinator(max_bytes: int = 256 * 1024 * 1024, shard: int = 0, n_shards: int = 1):
    """Named-actor rendezvous: every symbolizer actor shares the same
    coordinator (or shard-set) per job."""
    name = COORDINATOR_NAME if n_shards <= 1 else f"{COORDINATOR_NAME}-{shard}of{n_shards}"
    return ArtifactCacheCoordinator.options(
        name=name, get_if_exists=True, lifetime=None
    ).remote(max_bytes)


def get_or_create_coordinators(n_shards: int = 1, max_bytes: int = 256 * 1024 * 1024) -> list:
    """Sharded coordinator set for very large clusters: the single
    coordinator only sees cold misses, but at thousands of actors even
    misses concentrate — keys hash-partition over ``n_shards``
    independent coordinators (each with a proportional byte budget), so
    coordination scales horizontally with no shared state between
    shards (a key always lands on the same shard: single-flight
    semantics are preserved per key)."""
    per_shard = max(1, max_bytes // max(1, n_shards))
    return [
        get_or_create_coordinator(per_shard, shard=i, n_shards=n_shards)
        for i in range(n_shards)
    ]


def single_flight_fetch(fetch, coordinator=None):
    """Wrap a store fetch callable with the shared-cache single-flight
    protocol.  ``coordinator`` may be a single handle or a LIST of
    shard handles (keys route by crc32 — stable, so one key has exactly
    one home shard).  On leader failure the exception propagates (and
    followers re-elect), preserving the store's error semantics
    byte-for-byte."""
    import zlib

    if coordinator is None:
        coordinator = get_or_create_coordinator()
    handles = coordinator if isinstance(coordinator, list) else [coordinator]

    def wrapped(key: str) -> bytes:
        h = handles[zlib.crc32(key.encode()) % len(handles)] if len(handles) > 1 else handles[0]
        res = ray.get(h.begin.remote(key))
        if isinstance(res, int):  # leader; res is the generation token
            try:
                data = fetch(key)
            except Exception:
                ray.get(h.fill.remote(key, res, None))
                raise
            ray.get(h.fill.remote(key, res, data))
            return data
        return res

    return wrapped
