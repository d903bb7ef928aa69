"""Deduplication operators over the ``documents`` table: exact
(hash-partition + per-group min), exact n-gram Jaccard pairs, MinHash+LSH
near-dup, SimHash, and embedding-cosine near-dup — the
training-data-pipeline dedup suite.

Scale notes (100 TB): exact dedup is a hash-key groupby (map-side
partial via the md5 projection, then a shuffle on the digest key).
MinHash+LSH is fully distributed: band buckets shuffle with
``groupby(bucket)`` (bucket-size capped) and exact-Jaccard verification
runs inside the bucket groups, whose rows carry the shingle blobs — no
whole-corpus state ever reaches the driver.  The exact all-pairs operators (n-gram Jaccard, embedding
cosine) are the oracle-verifiable counterparts: inherently O(n^2)
compute, but executed as block-pair Ray tasks over the Dataset's own
Arrow block refs with memory bounded per task; at scale you run the LSH
/ ANN paths instead.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _read_docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Keep min(doc_id) per exact text digest.  Ray shape: vectorized
    md5 projection -> groupby(digest).min(doc_id)."""

    def digest(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text_md5": pa.array(hashes, type=pa.string())}
        )

    from ray.data.aggregate import Min

    ds = _read_docs(sf_dir).map_batches(digest, batch_format="pyarrow")
    agg = ds.groupby("text_md5").aggregate(Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id"]).sort("doc_id")


def exact_dedup_stats(sf_dir: str) -> pa.Table:
    """(n_docs, n_unique_texts) — tiny driver-side result."""

    def digest(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table({"text_md5": pa.array(hashes, type=pa.string())})

    ds = _read_docs(sf_dir).map_batches(digest, batch_format="pyarrow")
    n_docs = ds.count()
    n_unique = ds.groupby("text_md5").count().count()
    return pa.table({"n_docs": pa.array([n_docs]), "n_unique_texts": pa.array([n_unique])})


# ---------- exact n-gram (word-set) Jaccard: block-pair tasks ----------


def _word_hash_rows(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, whashes) rows: each doc's distinct-word set as sorted
    63-bit blake2b hashes (collision odds ~|vocab|^2 / 2^64 — nil), so
    downstream set ops are pure numpy on int64 arrays instead of Python
    string sets."""

    def to_hashes(batch: pa.Table) -> pa.Table:
        lists = []
        for t in batch.column("text").to_pylist():
            hs = {
                int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big") >> 1
                for w in t.split(" ")
            }
            lists.append(sorted(hs))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "whashes": pa.array(lists, type=pa.list_(pa.int64())),
            }
        )

    return _read_docs(sf_dir).map_batches(to_hashes, batch_format="pyarrow")


def _table_id_lists(tbl: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ids, offsets, flat_values) numpy views of a list<int64> column."""
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    c = tbl.column(col).combine_chunks()
    return ids, c.offsets.to_numpy(), c.values.to_numpy(zero_copy_only=False).astype(np.int64)


@ray.remote
def _block_pair_jaccard(ta: pa.Table, tb: pa.Table, threshold: float, chunk: int = 512) -> list:
    """All-pairs exact Jaccard between two Arrow blocks.  Works in
    (chunk x chunk) tiles: per tile, a local vocabulary from np.unique
    and a dense binary matmul for intersection sizes — memory bounded by
    chunk * |local vocab|, never n x vocab."""
    ids_a, off_a, val_a = _table_id_lists(ta, "whashes")
    ids_b, off_b, val_b = _table_id_lists(tb, "whashes")
    sizes_a = np.diff(off_a)
    sizes_b = np.diff(off_b)
    out = []
    for lo_a in range(0, len(ids_a), chunk):
        hi_a = min(len(ids_a), lo_a + chunk)
        va = val_a[off_a[lo_a]: off_a[hi_a]]
        rows_a = np.repeat(np.arange(hi_a - lo_a), sizes_a[lo_a:hi_a])
        for lo_b in range(0, len(ids_b), chunk):
            hi_b = min(len(ids_b), lo_b + chunk)
            vb = val_b[off_b[lo_b]: off_b[hi_b]]
            vocab = np.unique(np.concatenate([va, vb]))
            A = np.zeros((hi_a - lo_a, len(vocab)), dtype=np.int32)
            A[rows_a, np.searchsorted(vocab, va)] = 1
            B = np.zeros((hi_b - lo_b, len(vocab)), dtype=np.int32)
            B[np.repeat(np.arange(hi_b - lo_b), sizes_b[lo_b:hi_b]), np.searchsorted(vocab, vb)] = 1
            inter = A @ B.T
            union = sizes_a[lo_a:hi_a][:, None] + sizes_b[lo_b:hi_b][None, :] - inter
            jac = inter / np.maximum(union, 1)
            ii, jj = np.nonzero(jac >= threshold)
            ga = ids_a[lo_a + ii]
            gb = ids_b[lo_b + jj]
            keep = ga != gb
            lo_ids = np.minimum(ga[keep], gb[keep])
            hi_ids = np.maximum(ga[keep], gb[keep])
            out.extend(zip(lo_ids.tolist(), hi_ids.tolist()))
    return out


def _guard_block_pair_fanout(op: str, n_blocks: int, max_blocks: int, scale_alt: str) -> None:
    """No-silent-caps guard for exact all-pairs operators: log the task
    fan-out, and refuse outright when the O(B^2/2) block-pair task count
    would explode (e.g. 4096 blocks -> 8.4M tasks) — pointing at the
    sub-quadratic scale path instead."""
    import sys

    n_tasks = n_blocks * (n_blocks + 1) // 2
    # stderr: stdout belongs to the one-JSON-line bench/driver contract
    print(f"{op}: {n_blocks} blocks -> {n_tasks} block-pair tasks", file=sys.stderr)
    if n_blocks > max_blocks:
        raise ValueError(
            f"{op}: {n_blocks} input blocks would fan out to {n_tasks} "
            f"block-pair tasks (exact all-pairs is O(n^2)); this operator is "
            f"the small-scale oracle counterpart — use {scale_alt} at this "
            f"scale, or raise max_blocks (currently {max_blocks}) explicitly."
        )


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8, max_blocks: int = 128) -> pa.Table:
    """Exact word-set Jaccard pairs >= threshold (doc_a < doc_b) — the
    exact counterpart the SQL oracle verifies.  Distributed shape: the
    word-hash Dataset's own Arrow block refs fan out to O(B^2/2)
    block-pair tasks; no driver-side corpus materialization.  (Exact
    all-pairs is O(n^2) by definition — above ``max_blocks`` input
    blocks the guard refuses and points at minhash_lsh_dedup.)"""
    refs = _word_hash_rows(sf_dir).to_arrow_refs()
    _guard_block_pair_fanout("ngram_jaccard_pairs", len(refs), max_blocks, "minhash_lsh_dedup")
    tasks = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            tasks.append(_block_pair_jaccard.remote(refs[i], refs[j], threshold))
    seen: set[tuple[int, int]] = set()
    for chunk in ray.get(tasks):
        seen.update(chunk)
    pairs = sorted(seen)
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], type=pa.int64()),
        }
    )


# ---------- MinHash + LSH ----------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_MD5_MEMO: dict[str, int] = {}
_MD5_MEMO_CAP = 1 << 20  # ~48 MB worst case per worker; zipfian shingle
# vocabularies repeat heavily (measured 2.6x on the shingle-hash stage),
# and past the cap the function just computes — never evicts, never
# blocks, stays exact.


def _md5_lower64(s: str) -> int:
    """md5 digest bytes [8:16] little-endian as an unsigned 64-bit int —
    bit-for-bit DuckDB's ``md5_number_lower``, which is what makes the
    whole MinHash+LSH pipeline SQL-replayable (the
    ``docs_minhash_lsh_pairs`` / ``docs_near_dedup_keep*`` oracles
    re-run shingling, permutation minima, band bucketing, star-cap and
    exact-Jaccard verification in DuckDB and hash-compare the result).
    Memoized per worker process: shingle vocabularies are zipfian, so
    most calls hit the dict instead of hashlib."""
    v = _MD5_MEMO.get(s)
    if v is None:
        v = int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
        if len(_MD5_MEMO) < _MD5_MEMO_CAP:
            _MD5_MEMO[s] = v
    return v


def _shingle_hashes(text: str, k: int = 2) -> np.ndarray:
    words = text.split(" ")
    shingles = {" ".join(words[i: i + k]) for i in range(max(1, len(words) - k + 1))}
    return np.array([_md5_lower64(s) for s in shingles], dtype=np.uint64)


def _shingle_rows(sf_dir: str, k: int) -> "ray.data.Dataset":
    """(doc_id, shingles) rows: per-doc k-shingle md5-lower-64 set as a
    binary blob of sorted UNIQUE little-endian int64s (binary, not
    list<int64>, so the column survives Arrow hash joins as a payload
    field; np.frombuffer restores the array zero-copy).  np.unique (not
    just sort) keeps the ``np.intersect1d(..., assume_unique=True)``
    contract in downstream exact-Jaccard verification honest even if
    two distinct shingles ever hash-collided (odds ~2^-64 per pair).
    MinHash semantics are unchanged (min over a set ignores
    duplicates).  Hash values use the full uint64 range, so the int64
    view (two's-complement reinterpret, not a value cast) is what hits
    the blob."""

    def fn(batch: pa.Table) -> pa.Table:
        blobs = [
            np.unique(_shingle_hashes(t, k).view(np.int64)).astype("<i8").tobytes()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": pa.array(blobs, type=pa.binary()),
            }
        )

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def minhash_signatures(sf_dir: str, num_perm: int = 64, k: int = 2) -> "ray.data.Dataset":
    """Per-doc MinHash signature (shingle -> permuted min) as a
    vectorized numpy stage."""
    a, b = _minhash_params(num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        sigs = []
        for blob in batch.column("shingles").to_pylist():
            h = np.frombuffer(blob, dtype="<i8").astype(np.uint64)
            # (num_perm, n_shingles) permuted hashes, min over shingles
            perm = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
            sigs.append(perm.min(axis=1).astype(np.int64))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "signature": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.int64())),
            }
        )

    return _shingle_rows(sf_dir, k).map_batches(fn, batch_format="pyarrow")


def minhash_lsh_pairs_ds(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    k: int = 2,
    max_bucket: int = 256,
) -> "ray.data.Dataset":
    """MinHash+LSH near-dup detection, fully distributed:

    1. shingle stage (once; blobs of sorted int64 md5-lower-64 hashes) ->
    2. band-bucket rows CARRYING each doc's shingle blob -> 3. ONE
    ``groupby(bucket)`` shuffle co-locates every bucket's docs with
    their shingles -> 4. exact-Jaccard verification runs inside
    ``map_groups`` (vectorized intersections, bucket-size capped) ->
    5. multi-band duplicate pairs collapse in a second (pairs-sized)
    distributed groupby.

    This is the in-shuffle verification shape: no whole-corpus state on
    the driver, no second pass over the corpus.  Cost model: shingle
    blobs are replicated x ``bands`` through the shuffle (the classic
    LSH-dedup tradeoff vs. a candidate/shingle re-join), and a pair
    sharing multiple bands is re-verified per band — bounded by
    ``bands`` and only for near-identical docs.

    Degenerate buckets (> ``max_bucket`` docs, e.g. thousands of
    identical documents) verify a STAR around the min doc_id instead of
    the O(n^2) clique — every member stays connected to its keeper, so
    dedup connectivity is preserved without the quadratic blowup.

    Returns verified pairs (doc_a < doc_b), LSH-candidates only (the
    approximate/scalable counterpart of ngram_jaccard_pairs)."""
    from ray.data.aggregate import Count

    rows_per_band = num_perm // bands
    shingles = _shingle_rows(sf_dir, k)

    # hoisted: the permutation params ride the serialized closure once
    # per task instead of being re-derived per batch
    perm_a, perm_b = _minhash_params(num_perm)

    def to_buckets(batch: pa.Table) -> pa.Table:
        a, b = perm_a, perm_b
        doc_ids, buckets, blobs = [], [], []
        ids = batch.column("doc_id").to_pylist()
        for i, blob in enumerate(batch.column("shingles").to_pylist()):
            h = np.frombuffer(blob, dtype="<i8").astype(np.uint64)
            perm = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
            sig = perm.min(axis=1).astype(np.int64)
            for band in range(bands):
                chunk = sig[band * rows_per_band: (band + 1) * rows_per_band]
                # band index is inside the hashed string, so keys are
                # distinct across bands; md5-lower-64 keeps the shuffle
                # key a compact int64 while staying SQL-replayable
                key = _md5_lower64(str(band) + ":" + ",".join(map(str, chunk)))
                doc_ids.append(int(ids[i]))
                buckets.append(key - (1 << 64) if key >= (1 << 63) else key)
                blobs.append(blob)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "bucket": pa.array(buckets, type=pa.int64()),
                "shingles": pa.array(blobs, type=pa.binary()),
            }
        )

    # compact before the bucket shuffle: band rows are small (doc_id +
    # key + shingle blob) but spread over many near-empty read blocks,
    # and Ray's sort-based groupby pays per-block sampling/merge
    # overhead; 8 blocks measured ~1.4x faster end-to-end at sf0.1
    # than the raw block layout, identical output
    band_rows = shingles.map_batches(to_buckets, batch_format="pyarrow").repartition(8)

    # the LSH shuffle: one bucket = one co-located group; candidate
    # generation AND exact verification happen here, capped
    def verify_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        blobs = group.column("shingles").to_pylist()
        order = np.argsort(ids)
        ids = [ids[i] for i in order]
        sets = [np.frombuffer(blobs[i], dtype="<i8") for i in order]
        if len(ids) > max_bucket:
            # degenerate bucket: star around the keeper, O(n) not O(n^2)
            cand = [(0, j) for j in range(1, len(ids))]
        else:
            cand = [(i, j) for i in range(len(ids)) for j in range(i + 1, len(ids))]
        keep_a, keep_b = [], []
        for i, j in cand:
            if ids[i] == ids[j]:
                continue
            xa, xb = sets[i], sets[j]
            inter = np.intersect1d(xa, xb, assume_unique=True).size
            union = xa.size + xb.size - inter
            if union and inter / union >= threshold:
                keep_a.append(ids[i])
                keep_b.append(ids[j])
        return pa.table(
            {
                "doc_a": pa.array(keep_a, type=pa.int64()),
                "doc_b": pa.array(keep_b, type=pa.int64()),
            }
        )

    verified = band_rows.groupby("bucket").map_groups(
        verify_bucket, batch_format="pyarrow"
    )
    # a pair verified in multiple bands collapses DISTRIBUTED: one more
    # pairs-sized groupby, so the pair set never has to fit one process.
    # Native Count aggregate instead of map_groups(first_row): the hash
    # aggregate collapses duplicates without a per-group Python call
    # (measured ~1.3x end-to-end at sf0.1), then the count column drops.
    return (
        verified.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_bands"))
        .map_batches(
            lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow"
        )
    )


def minhash_lsh_dedup(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    k: int = 2,
    max_bucket: int = 256,
) -> pa.Table:
    """Driver-table view of ``minhash_lsh_pairs_ds`` (sorted verified
    pairs) — the collect here is PAIR-SET-sized, not corpus-sized; use
    the Dataset variant when even the pair set may not fit one
    process."""
    ds = minhash_lsh_pairs_ds(
        sf_dir, num_perm=num_perm, bands=bands, threshold=threshold,
        k=k, max_bucket=max_bucket,
    )
    pairs = sorted(
        {(r["doc_a"], r["doc_b"]) for r in ds.take_all()}
    )
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], type=pa.int64()),
        }
    )


def connected_components(
    edges: "ray.data.Dataset",
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    max_iters: int = 30,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Distributed connected components over an edge-list Dataset via
    vectorized min-label propagation.

    Round state is a ``(node, label)`` table, one row per edge endpoint,
    materialized per round (it is edge-endpoint-sized, never
    corpus-sized).  Each round is two shuffles and ZERO per-row Python:

    1. message send — ``safe_join(adjacency, labels)`` on ``node``
       attaches every node's current label to each outgoing edge (the
       Arrow hash-join kernel; ``safe_join`` coalesces both sides first
       so the round-4 schema-less-empty-partition crash class cannot
       recur at any partition count), and a ``map_batches`` re-addresses
       the pair to the receiving endpoint;
    2. label apply — the messages union the current labels and one
       ``groupby(node).min(label)`` resolves the new fixpoint candidate.

    Round 0 seeds each node with ``min(self, min(neighbors))`` — the
    first propagation step fused into the seeding aggregate — so
    near-clique LSH graphs typically finish in 1-2 further rounds.
    Convergence: the label sum is monotone non-increasing and strictly
    decreases until the fixpoint; the sum is read from the already-
    materialized round result, so the stop test re-executes nothing.
    ``max_iters`` bounds pathological path graphs (rounds = diameter).

    All per-round state stays in the object store; the driver sees one
    integer per round.  ``num_partitions`` is accepted for API
    compatibility and ignored (shuffle sizing is Ray's own; the join
    goes through ``safe_join``).

    Returns a Dataset of ``(node, component)`` where component is the
    min node id of the node's component.  Nodes with no edges don't
    appear (their component is trivially themselves)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min as AggMin

    from ._join import safe_join

    del num_partitions  # kept for signature compatibility; unused

    def to_adj(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a).combine_chunks().cast(pa.int64())
        b = batch.column(col_b).combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "peer": pa.concat_arrays([b, a]),
            }
        )

    adj = edges.map_batches(to_adj, batch_format="pyarrow").materialize()
    if adj.count() == 0:
        # a FULLY empty side defeats even safe_join's repartition
        # coalescing (there is no schema-carrying block to coalesce) —
        # and a graph with no edges has no non-trivial components
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "component": pa.array([], type=pa.int64()),
                }
            )
        )

    def seed(batch: pa.Table) -> pa.Table:
        label = pc.min_element_wise(
            batch.column("node"), pc.cast(batch.column("nbr_min"), pa.int64())
        )
        return pa.table({"node": batch.column("node"), "label": label})

    labels = (
        adj.groupby("node")
        .aggregate(AggMin("peer", alias_name="nbr_min"))
        .map_batches(seed, batch_format="pyarrow")
        .materialize()
    )

    def readdress(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch.column("peer"), "label": batch.column("label")}
        )

    prev_sum = labels.sum("label")
    for _ in range(max_iters):
        msgs = safe_join(
            adj, labels, join_type="inner", num_partitions=4, on=("node",)
        ).map_batches(readdress, batch_format="pyarrow")
        labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(AggMin("label", alias_name="label"))
            .materialize()
        )
        new_sum = labels.sum("label")
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    def to_components(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "component": pc.cast(batch.column("label"), pa.int64()),
            }
        )

    return labels.map_batches(to_components, batch_format="pyarrow")

def duplicate_spans(sf_dir: str, k: int = 8) -> "ray.data.Dataset":
    """Substring-level (span) dedup signal — the exact-duplicate-span
    pass of a training-data pipeline (cf. Lee et al., "Deduplicating
    Training Data Makes Language Models Better": repeated spans, not
    just whole-doc dups, drive memorization).  For every k-word window
    position in every document, the window is *duplicated* iff its
    md5-lower-64 hash occurs in MORE THAN ONE distinct document; the
    result is per-doc (n_windows, n_dup_windows, dup_ppm), the
    "fraction of this doc covered by cross-document repeated text"
    score a span-dedup filter thresholds on.

    Ray shape (100 TB): docs project to (doc_id, whash) position rows —
    texts never shuffle.  ONE ``groupby(whash)`` co-locates all
    occurrences of a span; groups spanning >1 doc emit per-doc position
    counts (group-sized, tiny).  Those counts union with the per-doc
    totals (kind-tagged rows, the asof_join union shape) into ONE small
    ``groupby(doc_id)`` — no join operator, no broadcast of the
    duplicated-hash set (which at corpus scale can exceed driver
    memory).  Window hashing is md5-lower-64 so the whole operator is
    SQL-replayable (``docs_dup_spans`` oracle)."""
    import pyarrow.compute as pc

    def to_rows(batch: pa.Table) -> pa.Table:
        doc_ids, hashes = [], []
        tot_ids, totals = [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            words = t.split(" ")
            n = max(0, len(words) - k + 1)
            tot_ids.append(did)
            totals.append(n)
            for i in range(n):
                doc_ids.append(did)
                hashes.append(
                    np.int64(np.uint64(_md5_lower64(" ".join(words[i: i + k]))))
                )
        # kind 0 = per-doc total (whash null), kind 1 = window position
        n_pos, n_tot = len(doc_ids), len(tot_ids)
        return pa.table(
            {
                "whash": pa.concat_arrays(
                    [
                        pa.array(hashes, type=pa.int64()),
                        pa.nulls(n_tot, pa.int64()),
                    ]
                ),
                "doc_id": pa.array(doc_ids + tot_ids, type=pa.int64()),
                "n": pa.array([1] * n_pos + totals, type=pa.int64()),
                "kind": pa.array([1] * n_pos + [0] * n_tot, type=pa.int8()),
            }
        )

    rows = _read_docs(sf_dir).map_batches(to_rows, batch_format="pyarrow")
    pos = rows.filter(expr="kind == 1")
    tot = rows.filter(expr="kind == 0")

    def dup_counts(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id")
        if len(pc.unique(ids)) < 2:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "kind": pa.array([], type=pa.int8()),
                }
            )
        agg = group.group_by("doc_id").aggregate([("n", "sum")])
        m = agg.num_rows
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "n": agg.column("n_sum"),
                "kind": pa.array([1] * m, type=pa.int8()),
            }
        )

    dup = pos.groupby("whash").map_groups(dup_counts, batch_format="pyarrow")

    # vectorized finalize: split each row's count into (window, dup)
    # columns by kind, let NATIVE Sum aggregates do the per-doc fold
    # (no per-doc Python group call — docs are corpus-count-sized), and
    # derive dup_ppm in one integer map over the aggregate result
    def split_kinds(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n"), pa.int64())
        iswin = pc.cast(pc.equal(batch.column("kind"), 0), pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_win": pc.multiply(n, iswin),
                "n_dup": pc.multiply(n, pc.subtract(pa.scalar(1, pa.int64()), iswin)),
            }
        )

    from ray.data.aggregate import Sum as AggSum

    def ppm(batch: pa.Table) -> pa.Table:
        n_win = batch.column("sum(n_win)").to_numpy(zero_copy_only=False)
        n_dup = batch.column("sum(n_dup)").to_numpy(zero_copy_only=False)
        out = np.where(n_win > 0, (n_dup * 1_000_000) // np.maximum(n_win, 1), 0)
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_windows": pa.array(n_win, type=pa.int64()),
                "n_dup_windows": pa.array(n_dup, type=pa.int64()),
                "dup_ppm": pa.array(out, type=pa.int64()),
            }
        )

    return (
        tot.select_columns(["doc_id", "n", "kind"])
        .union(dup)
        .map_batches(split_kinds, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(AggSum("n_win"), AggSum("n_dup"))
        .map_batches(ppm, batch_format="pyarrow")
        .sort("doc_id")
    )


def simhash64(sf_dir: str, cache_cap: int = 1 << 20) -> "ray.data.Dataset":
    """64-bit SimHash over md5-lower-64 word hashes.  The word hash is
    ``int.from_bytes(md5(w).digest()[8:], "little")`` — bit-for-bit
    DuckDB's ``md5_number_lower``, which makes the whole operator
    SQL-checkable (the ``docs_simhash`` oracle reproduces the bit-vote
    math with UNNEST + bit ops).  Votes are word-OCCURRENCE weighted
    (``text.split(" ")`` keeps duplicates), ties (vote sum 0) vote 0.
    The per-worker word-hash memo is capacity-bounded."""

    word_hash_cache: dict[str, int] = {}

    def word_hash(w: str) -> int:
        h = word_hash_cache.get(w)
        if h is None:
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[8:], "little")
            if len(word_hash_cache) < cache_cap:
                word_hash_cache[w] = h
        return h

    bit_positions = np.arange(64, dtype=np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column("text").to_pylist():
            hashes = np.array([word_hash(w) for w in t.split(" ")], dtype=np.uint64)
            # (n_words, 64) bit matrix, accumulated as +/-1 votes
            bits = (hashes[:, None] >> bit_positions) & np.uint64(1)
            acc = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
            sim = int(((acc > 0).astype(np.uint64) << bit_positions).sum(dtype=np.uint64))
            # interpret as signed int64 for Arrow
            if sim >= 1 << 63:
                sim -= 1 << 64
            out.append(sim)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(out, type=pa.int64())}
        )

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


@ray.remote
def _block_pair_cosine(ta: pa.Table, tb: pa.Table, threshold: float) -> list:
    """Cosine >= threshold pairs between two embedding blocks (unit
    normalization inside the task; one matmul per block pair)."""

    def block(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("embedding").combine_chunks()
        mat = c.values.to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(c), -1)
        return ids, mat / np.maximum(np.linalg.norm(mat, axis=1)[:, None], 1e-12)

    ids_a, ua = block(ta)
    ids_b, ub = block(tb)
    sims = ua @ ub.T
    ii, jj = np.nonzero(sims >= threshold)
    ga, gb = ids_a[ii], ids_b[jj]
    keep = ga != gb
    lo = np.minimum(ga[keep], gb[keep])
    hi = np.maximum(ga[keep], gb[keep])
    return list(zip(lo.tolist(), hi.tolist()))


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.85, max_blocks: int = 128) -> pa.Table:
    """Embedding-cosine near-dup pairs via blocked brute force: the
    Dataset's own Arrow block refs fan out to block-pair Ray tasks —
    the driver never ray.gets a block, only the (tiny) matching pairs.
    (Exact all-pairs is the oracle-verifiable counterpart; above
    ``max_blocks`` input blocks the guard refuses and points at the ANN
    scale path, ivf_knn / the persistent IVF index.)"""
    refs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_arrow_refs()
    _guard_block_pair_fanout(
        "embedding_neardup_pairs", len(refs), max_blocks, "ivf_knn / ivf_build+ivf_query"
    )
    tasks = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            tasks.append(_block_pair_cosine.remote(refs[i], refs[j], threshold))
    seen: set[tuple[int, int]] = set()
    for chunk in ray.get(tasks):
        seen.update(chunk)
    pairs = sorted(seen)
    return pa.table(
        {
            "vec_a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "vec_b": pa.array([p[1] for p in pairs], type=pa.int64()),
        }
    )


def near_dedup_keep(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    k: int = 2,
    cc: str = "driver",
) -> "ray.data.Dataset":
    """End-to-end near-duplicate REMOVAL: LSH pair detection ->
    connected components over the verified pair set -> keep the min
    doc_id of each component -> filter the corpus down to survivors.

    ``cc`` picks the component engine:

    - ``"driver"`` (default): union-find on the driver over PAIRS ONLY
      (pairs << corpus after LSH), dropped ids broadcast into a
      vectorized corpus filter.  The right default — the pair set after
      LSH verification is tiny relative to the corpus.
    - ``"distributed"``: label-propagation ``connected_components``
      over the pair DATASET plus a hash anti-join corpus filter —
      nothing pair-shaped ever materializes on the driver.  For the
      pathological corpus whose verified pair set itself breaks the
      driver-sized assumption.

    Either way the corpus-sized work — pair detection and the final
    filter — is distributed, and the result is the surviving doc_ids
    as a DATASET (corpus-sized: callers stream or write it, never a
    driver table)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    if cc == "distributed":
        pairs_ds = minhash_lsh_pairs_ds(
            sf_dir, num_perm=num_perm, bands=bands, threshold=threshold, k=k
        )
        from ._join import safe_join

        comps = connected_components(pairs_ds)
        # survivors of the pair graph are nodes labeling themselves;
        # everything else in a component drops
        drops = comps.filter(expr="node != component").materialize()
        if drops.count() == 0:
            # dup-free corpus: nothing to anti-join away (and a fully
            # empty right side would crash the hash join — see
            # connected_components' empty-adjacency guard)
            return docs.sort("doc_id")
        return safe_join(
            docs, drops, join_type="left_anti", num_partitions=8,
            on=("doc_id",), right_on=("node",),
        ).sort("doc_id")
    if cc != "driver":
        raise ValueError(f"unknown cc engine {cc!r}")

    pairs = minhash_lsh_dedup(sf_dir, num_perm=num_perm, bands=bands, threshold=threshold, k=k)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    dropped = np.array(
        sorted(x for x in parent if find(x) != x), dtype=np.int64
    )
    dropped_ref = ray.put(dropped)

    def keep_filter(batch: pa.Table) -> pa.Table:
        drop = ray.get(dropped_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(ids, drop))).select(["doc_id"])

    return docs.map_batches(keep_filter, batch_format="pyarrow").sort("doc_id")


def simhash_dupes(sf_dir: str, max_dist: int = 6) -> pa.Table:
    """SimHash near-dup pairs via the SAME banded-LSH Hamming
    verification as image/audio dedup (multimodal.banded_hamming_dupes)
    — one 64-bit-fingerprint dedup engine across text and media
    modalities.  Returns (doc_a, doc_b, dist) with int doc ids."""
    from .multimodal import banded_hamming_dupes

    sims = simhash64(sf_dir)

    def stringify(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        # zero-padding must cover the full int64 range (19 digits) so
        # lexicographic order == numeric order — the banded engine's
        # doc_a < doc_b contract and star-cap keeper (min id) depend on
        # it; negative ids would break the padding invariant, so refuse
        if any(i < 0 for i in ids):
            raise ValueError("simhash_dupes requires non-negative doc_ids")
        return pa.table(
            {
                "media_id": pa.array([f"{i:019d}" for i in ids], type=pa.string()),
                "simhash": batch.column("simhash"),
            }
        )

    pairs = banded_hamming_dupes(
        sims.map_batches(stringify, batch_format="pyarrow"),
        "media_id",
        "simhash",
        max_dist=max_dist,
    )
    return pa.table(
        {
            "doc_a": pa.array(
                [int(v) for v in pairs.column("media_a").to_pylist()], type=pa.int64()
            ),
            "doc_b": pa.array(
                [int(v) for v in pairs.column("media_b").to_pylist()], type=pa.int64()
            ),
            "dist": pairs.column("dist"),
        }
    )

def snapshot_diff(sf_dir: str) -> pa.Table:
    """Incremental-ingestion diff between two corpus snapshots — the
    change-detection pass that lets a 100 TB pipeline reprocess only
    what moved.  Snapshot B is a deterministic, oracle-shared mutation
    of the base corpus (docs dropped when doc_id%13==5, text reversed
    when doc_id%17==3, new doc_ids appended at +1_000_000 when
    doc_id%19==7).  Ray shape: both sides reduce to (doc_id,
    fingerprint) projections — the texts themselves never shuffle —
    then ONE distributed ``full_outer`` hash join classifies every doc
    as added / removed / changed; unchanged rows are filtered out
    in-stream so the result is change-set-sized."""
    import pyarrow.compute as pc

    def fp_base(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "fp_a": pa.array(
                    [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()],
                    type=pa.string(),
                ),
            }
        )

    def fp_b(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if doc_id % 13 == 5:
                continue  # removed in snapshot B
            text = t[::-1] if doc_id % 17 == 3 else t
            ids.append(doc_id)
            fps.append(hashlib.md5(text.encode()).hexdigest())
            if doc_id % 19 == 7:  # added in snapshot B
                ids.append(doc_id + 1_000_000)
                fps.append(hashlib.md5(f"new {doc_id}".encode()).hexdigest())
        return pa.table(
            {
                "b_doc_id": pa.array(ids, type=pa.int64()),
                "fp_b": pa.array(fps, type=pa.string()),
            }
        )

    base = _read_docs(sf_dir).map_batches(fp_base, batch_format="pyarrow")
    snap = _read_docs(sf_dir).map_batches(fp_b, batch_format="pyarrow")
    from ._join import safe_join

    joined = safe_join(
        base,
        snap,
        join_type="full_outer",
        num_partitions=8,
        on=("doc_id",),
        right_on=("b_doc_id",),
    )

    def classify(batch: pa.Table) -> pa.Table:
        # the hash join coalesces the two key columns into one doc_id
        a = batch.column("fp_a").to_pylist()
        b = batch.column("fp_b").to_pylist()
        ids = batch.column("doc_id").to_pylist()
        out_id, out_c = [], []
        for i in range(len(a)):
            if a[i] is None:
                out_id.append(ids[i])
                out_c.append("added")
            elif b[i] is None:
                out_id.append(ids[i])
                out_c.append("removed")
            elif a[i] != b[i]:
                out_id.append(ids[i])
                out_c.append("changed")
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "change": pa.array(out_c, type=pa.string()),
            }
        )

    rows = sorted(
        joined.map_batches(classify, batch_format="pyarrow").take_all(),
        key=lambda r: (r["doc_id"], r["change"]),
    )
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "change": pa.array([r["change"] for r in rows], type=pa.string()),
        }
    )


def normalized_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Normalization-aware exact dedup: case-fold, collapse whitespace
    runs and trim before hashing, so trivially-reformatted copies
    collapse into one group (the cheap precursor to MinHash in a
    training-data dedup ladder).  Ray shape: vectorized Arrow kernels
    (RE2 regex, same engine as the DuckDB oracle's regexp_replace) ->
    md5 digest -> ONE groupby(digest) keeping min(doc_id) + the variant
    count; texts never shuffle, only (digest, doc_id) pairs do."""

    def digest(batch: pa.Table) -> pa.Table:
        norm = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(batch.column("text")), pattern="[ \\t\\n\\f\\r]+", replacement=" "
            ),
            characters=" ",
        )
        hashes = [hashlib.md5(t.encode()).hexdigest() for t in norm.to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "norm_md5": pa.array(hashes, type=pa.string()),
            }
        )

    from ray.data.aggregate import Count, Min

    agg = (
        _read_docs(sf_dir)
        .map_batches(digest, batch_format="pyarrow")
        .groupby("norm_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_variants"))
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "n_variants": pc.cast(batch.column("n_variants"), pa.int64()),
            }
        )

    return agg.map_batches(project, batch_format="pyarrow").sort("doc_id")


def jaccard_prefix_pairs(
    sf_dir: str, threshold: float = 0.8, max_group: int = 4096
) -> "ray.data.Dataset":
    """EXACT word-set Jaccard pairs via prefix filtering (the
    AllPairs/PPJoin family) — the sub-quadratic scale path that returns
    the SAME answer as the O(n^2) ``ngram_jaccard_pairs`` oracle
    counterpart, with no block-pair fan-out.

    Prefix-filter theorem: J(A,B) >= t implies |A∩B| >= ceil(t*|A|)
    (and symmetrically for B), so under ANY shared global token order a
    qualifying pair must collide inside each side's first
    n - ceil(t*n) + 1 tokens.  Tokens are ordered by ascending GLOBAL
    document frequency (rarest first) so prefix postings are maximally
    selective — stopwords almost never enter a prefix.

    Ray shape (all stages stream):
      1. explode docs to (doc_id, tok) rows;
      2. one ``groupby(tok)`` for global DF (vocab-sized, distributed —
         never broadcast);
      3. hash-join tokens with their DF (``safe_join``), regroup by doc
         to rebuild each doc's (df, tok)-ordered set and emit prefix
         postings CARRYING the doc's full sorted-hash blob (the same
         in-shuffle-verify trick as minhash_lsh_dedup — candidates are
         verified where they collide, no second corpus pass);
      4. one ``groupby(tok)`` over postings: exact-Jaccard verify all
         postings pairs in the group;
      5. pair groupby dedup (a pair can collide on several prefix
         tokens) -> sort.
    A group with > ``max_group`` postings raises (exactness forbids the
    silent star-caps the LSH variants replay in SQL) — at that density
    use minhash_lsh_dedup."""
    import math

    from ray.data.aggregate import Count
    from ._join import safe_join

    def explode(batch: pa.Table) -> pa.Table:
        ids, offs, vals = _table_id_lists(batch, "whashes")
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, np.diff(offs)), type=pa.int64()),
                "tok": pa.array(vals, type=pa.int64()),
            }
        )

    toks = _word_hash_rows(sf_dir).map_batches(explode, batch_format="pyarrow")
    df = toks.groupby("tok").aggregate(Count(alias_name="df"))
    joined = safe_join(toks, df, join_type="inner", on=("tok",))

    def postings(group: pa.Table) -> pa.Table:
        tok = group.column("tok").to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = group.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(tok)
        p = n - math.ceil(threshold * n) + 1
        order = np.lexsort((tok, dfv))[:p]
        blob = np.sort(tok).astype("<i8").tobytes()
        did = int(group.column("doc_id")[0].as_py())
        return pa.table(
            {
                "tok": pa.array(tok[order], type=pa.int64()),
                "doc_id": pa.array([did] * p, type=pa.int64()),
                "whashes": pa.array([blob] * p, type=pa.binary()),
            }
        )

    posts = joined.groupby("doc_id").map_groups(postings, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) > max_group:
            raise ValueError(
                f"jaccard_prefix_pairs: prefix-token group of {len(ids)} "
                f"postings exceeds max_group={max_group}; use "
                f"minhash_lsh_dedup at this similarity density."
            )
        sets = [
            np.frombuffer(b, dtype="<i8")
            for b in group.column("whashes").to_pylist()
        ]
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
                union = len(sets[i]) + len(sets[j]) - inter
                if union and inter / union >= threshold:
                    out_a.append(int(min(ids[i], ids[j])))
                    out_b.append(int(max(ids[i], ids[j])))
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
            }
        )

    pairs = posts.groupby("tok").map_groups(verify, batch_format="pyarrow")
    uniq = pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="_n"))
    return uniq.select_columns(["doc_a", "doc_b"]).sort(["doc_a", "doc_b"])


def _levenshtein(a: str, b: str, bchars: "np.ndarray | None" = None) -> int:
    """Unit-cost Levenshtein distance over UTF-8 BYTES — DuckDB's
    ``levenshtein`` is byte-level (verified: multibyte chars count once
    per byte), and the oracle swaps that function in for the Jaccard
    verify, so the engine kernel must match byte-for-byte.  Row-DP with
    the insertion chain vectorized via the ``minimum.accumulate(g - j)``
    trick — O(len(a)) Python iterations of O(len(b)) numpy work instead
    of a scalar double loop."""
    if a == b:
        return 0
    if bchars is None:
        bchars = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    abytes = a.encode("utf-8")
    lb = len(bchars)
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    for i, ca in enumerate(abytes, 1):
        sub = prev[:-1] + (bchars != ca)
        t = np.minimum(prev[1:] + 1, sub)
        full = np.concatenate(([np.int64(i)], t))
        prev = np.minimum.accumulate(full - idx) + idx
    return int(prev[-1])


def editdist_dupes(
    sf_dir: str,
    max_dist: int = 40,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 2,
    max_bucket: int = 256,
) -> pa.Table:
    """Edit-distance-verified near-duplicate pairs — the THIRD verify
    kernel over the shared banded-LSH candidate engine (exact Jaccard =
    ``minhash_lsh_pairs_ds``, Hamming = ``simhash_dupes``, Levenshtein
    = here): MinHash band buckets generate candidates with the SAME
    permutation constants / band keys / >max_bucket star-cap, band rows
    carry the raw text as the shuffle payload, and verification runs
    IN the bucket shuffle (``groupby(bucket).map_groups``) as a banded
    DP — no corpus state on the driver, no re-join to fetch texts.  A
    ``|len(a)-len(b)| > max_dist`` pre-filter skips the DP for
    length-divergent candidates (pure pruning: length difference lower-
    bounds the distance).  Pairs verified in several bands collapse in
    one pairs-sized distributed groupby.

    Oracle: the shared MinHash-candidate CTE chain with the Jaccard
    verify swapped for DuckDB's ``levenshtein(text_a, text_b)``."""
    from ray.data.aggregate import Count

    rows_per_band = num_perm // bands
    perm_a, perm_b = _minhash_params(num_perm)

    def to_buckets(batch: pa.Table) -> pa.Table:
        doc_ids, buckets, texts = [], [], []
        ids = batch.column("doc_id").to_pylist()
        for i, text in enumerate(batch.column("text").to_pylist()):
            h = np.unique(_shingle_hashes(text, k).view(np.int64)).astype(np.uint64)
            perm = (perm_a[:, None] * h[None, :] + perm_b[:, None]) % _MERSENNE
            sig = perm.min(axis=1).astype(np.int64)
            for band in range(bands):
                chunk = sig[band * rows_per_band: (band + 1) * rows_per_band]
                key = _md5_lower64(str(band) + ":" + ",".join(map(str, chunk)))
                doc_ids.append(int(ids[i]))
                buckets.append(key - (1 << 64) if key >= (1 << 63) else key)
                texts.append(text)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "bucket": pa.array(buckets, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    band_rows = (
        _read_docs(sf_dir).map_batches(to_buckets, batch_format="pyarrow").repartition(8)
    )

    def verify_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        txts = group.column("text").to_pylist()
        order = np.argsort(ids)
        ids = [ids[i] for i in order]
        txts = [txts[i] for i in order]
        if len(ids) > max_bucket:
            cand = [(0, j) for j in range(1, len(ids))]
        else:
            cand = [(i, j) for i in range(len(ids)) for j in range(i + 1, len(ids))]
        blens = [len(t.encode("utf-8")) for t in txts]
        chars = [None] * len(ids)  # lazily-built per-doc byte arrays
        keep_a, keep_b = [], []
        for i, j in cand:
            if ids[i] == ids[j]:
                continue
            # byte-length difference lower-bounds the byte-level distance
            if abs(blens[i] - blens[j]) > max_dist:
                continue
            if chars[j] is None:
                chars[j] = np.frombuffer(txts[j].encode("utf-8"), dtype=np.uint8)
            if _levenshtein(txts[i], txts[j], chars[j]) <= max_dist:
                keep_a.append(ids[i])
                keep_b.append(ids[j])
        return pa.table(
            {
                "doc_a": pa.array(keep_a, type=pa.int64()),
                "doc_b": pa.array(keep_b, type=pa.int64()),
            }
        )

    pairs = (
        band_rows.groupby("bucket")
        .map_groups(verify_bucket, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_bands"))
        .map_batches(lambda t: t.select(["doc_a", "doc_b"]), batch_format="pyarrow")
    )
    rows = sorted((int(r["doc_a"]), int(r["doc_b"])) for r in pairs.take_all())
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )


def cross_source_leaks(sf_dir: str) -> pa.Table:
    """Cross-partition leak detection: exact texts appearing in MORE
    THAN ONE source — the train/eval-shard contamination check a
    mixture pipeline runs before freezing splits (same failure class as
    benchmark contamination, but between the pipeline's own strata).
    Ray shape: digest projection -> per-batch (digest, source) pre-dedup
    -> one pair groupby -> digest-level distinct-source count > 1; the
    leaked set is duplicate-sized, with min doc_id and source span per
    digest for triage."""
    from ray.data.aggregate import Count as AggCount
    from ray.data.aggregate import Min as AggMin

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def digest(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode()).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "text_md5": pa.array(hashes, type=pa.string()),
                "source": batch.column("source"),
                "doc_id": batch.column("doc_id"),
            }
        )

    pairs = (
        ds.map_batches(digest, batch_format="pyarrow")
        .groupby(["text_md5", "source"])
        .aggregate(AggMin("doc_id", alias_name="doc_id"))
    )
    leaks = (
        pairs.groupby("text_md5")
        .aggregate(
            AggCount(alias_name="n_sources"), AggMin("doc_id", alias_name="min_doc")
        )
        .map_batches(
            lambda b: b.filter(pc.greater(b.column("n_sources"), pa.scalar(1))),
            batch_format="pyarrow",
        )
    )
    rows = sorted(leaks.take_all(), key=lambda r: r["text_md5"])
    return pa.table(
        {
            "text_md5": pa.array([r["text_md5"] for r in rows], type=pa.string()),
            "n_sources": pa.array([int(r["n_sources"]) for r in rows], type=pa.int64()),
            "min_doc": pa.array([int(r["min_doc"]) for r in rows], type=pa.int64()),
        }
    )


def dup_cluster_sizes(sf_dir: str, threshold: float = 0.8) -> pa.Table:
    """Duplicate-cluster size histogram: how many near-dup components
    exist at each size — the dedup-ROI readout (a corpus of pairs saves
    little; a few giant clusters save a lot).  Composition: LSH pairs
    -> distributed connected components -> component-size groupby ->
    size histogram; every intermediate is pair/component-sized."""
    from ray.data.aggregate import Count as AggCount

    pairs_ds = minhash_lsh_pairs_ds(sf_dir, threshold=threshold)
    comps = connected_components(pairs_ds)
    sizes = comps.groupby("component").aggregate(AggCount(alias_name="size"))
    hist = sorted(
        sizes.groupby("size").aggregate(AggCount(alias_name="n_clusters")).take_all(),
        key=lambda r: int(r["size"]),
    )
    return pa.table(
        {
            "size": pa.array([int(r["size"]) for r in hist], type=pa.int64()),
            "n_clusters": pa.array(
                [int(r["n_clusters"]) for r in hist], type=pa.int64()
            ),
        }
    )
