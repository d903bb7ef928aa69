"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (baseline; numpy matmul per batch against a broadcast query
matrix) and an IVF-bucketed variant (the scale path: coarse quantize ->
probe only nearby buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _load_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = ds.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, mat


def _unit(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1)[:, None], 1e-12)


def knn_bruteforce(sf_dir: str, num_queries: int = 5, k: int = 10) -> pa.Table:
    """Exact cosine top-k for the first ``num_queries`` vectors (self
    excluded).  Ray shape: broadcast the query matrix with ray.put, scan
    the embeddings Dataset in batches, matmul per batch, then a tiny
    driver-side top-k merge.  Ranking key is (round(sim, 6) desc, vec_id
    asc) so the SQL oracle hash-matches despite float summation order."""
    ids, mat = _load_embeddings(sf_dir)
    unit = _unit(mat)
    query_ids = ids[:num_queries]
    queries_ref = ray.put(unit[:num_queries])

    def score(batch: pa.Table) -> pa.Table:
        queries = ray.get(queries_ref)
        sub_ids = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        sub = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        sub = _unit(sub)
        sims = queries @ sub.T  # (num_queries, batch)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(queries)):
            # per-batch partial top-k with the same (sim desc, id asc)
            # tie-break as the final merge
            rounded = np.round(sims[qi], 6)
            order = np.lexsort((sub_ids, -rounded))[: k + 1]
            for j in order:
                out_q.append(int(query_ids[qi]))
                out_n.append(int(sub_ids[j]))
                out_s.append(float(np.round(sims[qi][j], 6)))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partials = ds.map_batches(score, batch_format="pyarrow").take_all()

    # tiny final merge: k rows per query
    rows_out = []
    by_query: dict[int, list] = {}
    for r in partials:
        by_query.setdefault(r["query_id"], []).append(r)
    for q in sorted(by_query):
        cands = [r for r in by_query[q] if r["neighbor_id"] != q]
        cands.sort(key=lambda r: (-r["sim"], r["neighbor_id"]))
        for rank, r in enumerate(cands[:k], start=1):
            rows_out.append((q, rank, r["neighbor_id"]))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows_out], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows_out], type=pa.int64()),
            "neighbor_id": pa.array([r[2] for r in rows_out], type=pa.int64()),
        }
    )


def ivf_knn(
    sf_dir: str, num_queries: int = 5, k: int = 10, n_cells: int = 16, n_probe: int = 4
) -> pa.Table:
    """IVF-style approximate top-k: coarse centroids from a seeded
    sample, vectors bucketed by nearest centroid, queries probe only the
    ``n_probe`` nearest cells.  The 100 TB path replaces the broadcast
    scan with a groupby("cell") shuffle so each cell is a co-located
    partition.  Deterministic (seeded); rows-only check."""
    ids, mat = _load_embeddings(sf_dir)
    unit = _unit(mat)
    rng = np.random.RandomState(7)
    centroids = unit[rng.choice(len(unit), size=min(n_cells, len(unit)), replace=False)]
    cells = np.argmax(unit @ centroids.T, axis=1)

    query_ids = ids[:num_queries]
    out = []
    for qi in range(len(query_ids)):
        q = unit[qi]
        probe = np.argsort(-(centroids @ q))[:n_probe]
        mask = np.isin(cells, probe)
        cand_ids = ids[mask]
        sims = np.round(unit[mask] @ q, 6)
        order = np.lexsort((cand_ids, -sims))
        rank = 0
        for j in order:
            if int(cand_ids[j]) == int(query_ids[qi]):
                continue
            rank += 1
            out.append((int(query_ids[qi]), rank, int(cand_ids[j])))
            if rank >= k:
                break
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out], type=pa.int64()),
            "rank": pa.array([r[1] for r in out], type=pa.int64()),
            "neighbor_id": pa.array([r[2] for r in out], type=pa.int64()),
        }
    )
