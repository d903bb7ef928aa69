"""Deduplication operators over the ``documents`` table: exact
(hash-partition + per-group min), exact n-gram Jaccard pairs, MinHash+LSH
near-dup, and SimHash — the training-data-pipeline dedup suite.

Scale notes (100 TB): exact dedup is a hash-key groupby (map-side
partial via the md5 projection, then a shuffle on the digest key).  The
pairwise operators use the broadcast-small-side pattern: the comparison
index (CSR shingle matrix / minhash band table) is built once, put in
the object store with ``ray.put``, and read by every ``map_batches``
task — no O(n^2) shuffle.  At full scale the LSH band groupby replaces
the broadcast for the candidate-generation step.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

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


# ---------- shared shingle / word-set machinery ----------


def _word_sets(sf_dir: str) -> tuple[list[int], "object"]:
    """Build the broadcast comparison index: per-doc word-set rows of a
    CSR-style binary matrix over the corpus vocabulary.  Built with a
    distributed pass; only (doc_id, word-id list) reaches the driver."""

    def to_words(batch: pa.Table) -> pa.Table:
        words = [sorted(set(t.split(" "))) for t in batch.column("text").to_pylist()]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "words": pa.array(words, type=pa.list_(pa.string()))}
        )

    rows = _read_docs(sf_dir).map_batches(to_words, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["doc_id"])
    vocab: dict[str, int] = {}
    doc_ids = []
    sets = []
    for row in rows:
        doc_ids.append(row["doc_id"])
        ids = []
        for w in row["words"]:
            if w not in vocab:
                vocab[w] = len(vocab)
            ids.append(vocab[w])
        sets.append(np.array(sorted(ids), dtype=np.int32))
    # dense binary matrix (vocab is small for word-level shingles; a CSR
    # sparse matrix is the drop-in at larger vocab)
    mat = np.zeros((len(doc_ids), len(vocab)), dtype=np.int32)
    for i, ids in enumerate(sets):
        mat[i, ids] = 1
    return doc_ids, mat


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8) -> pa.Table:
    """Exact word-set Jaccard pairs >= threshold (doc_a < doc_b), via a
    broadcast matrix multiply per batch block — the exact counterpart the
    SQL oracle can verify."""
    doc_ids, mat = _word_sets(sf_dir)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(np.array(doc_ids, dtype=np.int64))

    n = len(doc_ids)
    block = 512
    blocks = [(lo, min(n, lo + block)) for lo in range(0, n, block)]

    @ray.remote
    def pairs_for_block(lo: int, hi: int, mat, ids):
        sub = mat[lo:hi]
        inter = sub @ mat.T  # (hi-lo, n) intersection sizes
        sizes = mat.sum(axis=1)
        union = sizes[lo:hi][:, None] + sizes[None, :] - inter
        jac = inter / np.maximum(union, 1)
        out = []
        for i in range(hi - lo):
            gi = lo + i
            js = np.nonzero(jac[i] >= threshold)[0]
            for j in js:
                if j > gi:
                    out.append((int(ids[gi]), int(ids[j])))
        return out

    results = ray.get([pairs_for_block.remote(lo, hi, mat_ref, ids_ref) for lo, hi in blocks])
    pairs = sorted(p for chunk in results for p in chunk)
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


def _shingle_hashes(text: str, k: int = 2) -> np.ndarray:
    words = text.split(" ")
    shingles = {" ".join(words[i: i + k]) for i in range(max(1, len(words) - k + 1))}
    return np.array([zlib.crc32(s.encode()) for s in shingles], dtype=np.uint64)


def minhash_signatures(sf_dir: str, num_perm: int = 64, k: int = 2) -> "ray.data.Dataset":
    """Per-doc MinHash signature (shingle -> permuted min) as a
    vectorized numpy stage."""
    a, b = _minhash_params(num_perm)

    def fn(batch: pa.Table) -> pa.Table:
        sigs = []
        for t in batch.column("text").to_pylist():
            h = _shingle_hashes(t, k)
            # (num_perm, n_shingles) permuted hashes, min over shingles
            perm = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
            sigs.append(perm.min(axis=1).astype(np.int64))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "signature": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.int64())),
            }
        )

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def minhash_lsh_dedup(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    k: int = 2,
) -> pa.Table:
    """MinHash+LSH near-dup detection: signature -> band buckets ->
    groupby(bucket) candidate pairs -> exact-Jaccard verification.
    Returns verified pairs (doc_a < doc_b), LSH-candidates only (the
    approximate/scalable counterpart of ngram_jaccard_pairs)."""
    rows_per_band = num_perm // bands
    sig_ds = minhash_signatures(sf_dir, num_perm=num_perm, k=k)

    def to_buckets(batch: pa.Table) -> pa.Table:
        doc_ids, buckets = [], []
        ids = batch.column("doc_id").to_pylist()
        for doc_id, sig in zip(ids, batch.column("signature").to_pylist()):
            for band in range(bands):
                chunk = sig[band * rows_per_band: (band + 1) * rows_per_band]
                key = zlib.crc32((str(band) + ":" + ",".join(map(str, chunk))).encode())
                doc_ids.append(doc_id)
                buckets.append((band << 32) | key)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "bucket": pa.array(buckets, type=pa.int64()),
            }
        )

    buckets = sig_ds.map_batches(to_buckets, batch_format="pyarrow")

    # bucket groupby -> candidate pairs (the LSH shuffle)
    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group.column("doc_id").to_pylist())
        pairs = [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]
        return pa.table(
            {
                "doc_a": pa.array([p[0] for p in pairs], type=pa.int64()),
                "doc_b": pa.array([p[1] for p in pairs], type=pa.int64()),
            }
        )

    candidates = buckets.groupby("bucket").map_groups(emit_pairs, batch_format="pyarrow")
    cand_pairs = {(r["doc_a"], r["doc_b"]) for r in candidates.take_all()}

    # exact verification with the SAME k-shingle measure the LSH
    # signatures estimate (not word sets)
    def to_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sets = [
            sorted(int(h) for h in _shingle_hashes(t, k))
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shingles": pa.array(sets, type=pa.list_(pa.int64())),
            }
        )

    shingle_rows = _read_docs(sf_dir).map_batches(to_shingles, batch_format="pyarrow").take_all()
    shingles = {r["doc_id"]: frozenset(r["shingles"]) for r in shingle_rows}
    verified = []
    for a_id, b_id in sorted(cand_pairs):
        sa, sb = shingles[a_id], shingles[b_id]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if union and inter / union >= threshold:
            verified.append((a_id, b_id))
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in verified], type=pa.int64()),
            "doc_b": pa.array([p[1] for p in verified], type=pa.int64()),
        }
    )


def simhash64(sf_dir: str) -> "ray.data.Dataset":
    """64-bit SimHash over blake2b word hashes (deterministic across
    processes; rows-only check)."""

    word_hash_cache: dict[str, int] = {}

    def word_hash(w: str) -> int:
        h = word_hash_cache.get(w)
        if h is None:
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
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


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.85) -> pa.Table:
    """Embedding-cosine near-dup pairs via blocked brute force against a
    broadcast matrix (float64; doc-pair output is float-free so the SQL
    oracle hash-matches)."""
    tbl = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .sort("vec_id")
        .to_arrow_refs()
    )
    chunks = [ray.get(ref) for ref in tbl]
    full = pa.concat_tables(chunks)
    ids = np.array(full.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(full.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / np.maximum(norms[:, None], 1e-12)

    unit_ref = ray.put(unit)
    ids_ref = ray.put(ids)
    n = len(ids)
    block = 1024
    blocks = [(lo, min(n, lo + block)) for lo in range(0, n, block)]

    @ray.remote
    def pairs_for_block(lo, hi, unit, ids):
        sims = unit[lo:hi] @ unit.T
        out = []
        for i in range(hi - lo):
            gi = lo + i
            js = np.nonzero(sims[i] >= threshold)[0]
            for j in js:
                if j > gi:
                    out.append((int(ids[gi]), int(ids[j])))
        return out

    results = ray.get([pairs_for_block.remote(lo, hi, unit_ref, ids_ref) for lo, hi in blocks])
    pairs = sorted(p for chunk in results for p in chunk)
    return pa.table(
        {
            "vec_a": pa.array([p[0] for p in pairs], type=pa.int64()),
            "vec_b": pa.array([p[1] for p in pairs], type=pa.int64()),
        }
    )
