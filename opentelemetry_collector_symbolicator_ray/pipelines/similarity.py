"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (baseline; numpy matmul per batch against a broadcast query
matrix) and an IVF-bucketed variant (the scale path: coarse quantize ->
``groupby("cell")`` shuffle -> probe only nearby cells).

Nothing here materializes the corpus on the driver: queries/centroids
are fetched with predicate-pushdown reads (a handful of rows), the scan
stays a streaming ``map_batches``, and only tiny per-batch/per-cell
top-k partials reach the driver for the final merge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

import ray
import ray.data


def _unit(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1)[:, None], 1e-12)


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, float64 matrix) from an Arrow batch without a Python-object
    hop: flatten the list<float> values buffer and reshape (fixed dim)."""
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column("embedding").combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return ids, flat.reshape(len(col), -1) if len(col) else flat.reshape(0, 0)


def _fetch_rows(sf_dir: str, expr) -> tuple[np.ndarray, np.ndarray]:
    """Pruned read: only the filtered rows (queries / centroids) leave
    the scan — never the whole table."""
    rows = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"], filter=expr
    ).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, mat


def knn_bruteforce(sf_dir: str, num_queries: int = 5, k: int = 10) -> pa.Table:
    """Exact cosine top-k for the first ``num_queries`` vectors (self
    excluded).  Ray shape: broadcast the query matrix with ray.put, scan
    the embeddings Dataset in batches, matmul per batch, then a tiny
    driver-side top-k merge.  Ranking key is (round(sim, 6) desc, vec_id
    asc) so the SQL oracle hash-matches despite float summation order."""
    query_ids, q_mat = _fetch_rows(sf_dir, pads.field("vec_id") < num_queries)
    queries_ref = ray.put(_unit(q_mat))

    def score(batch: pa.Table) -> pa.Table:
        queries = ray.get(queries_ref)
        sub_ids, sub = _batch_matrix(batch)
        if not len(sub_ids):
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
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
                out_s.append(float(rounded[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    partials = ds.map_batches(score, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k)


def _merge_topk(partials: list[dict], k: int) -> pa.Table:
    """Tiny driver-side merge of per-batch/per-cell top-k partials:
    k rows per query, self excluded, (sim desc, id asc) order."""
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


def _sample_centroids(sf_dir: str, n: int, n_cells: int) -> np.ndarray:
    """Seeded centroid sample as a unit-normalized matrix.

    Primary path assumes ``vec_id`` is the contiguous range 0..n-1
    (true for the synth corpus): sample ids directly and fetch them with
    one isin-pushdown read (n_cells rows).  Corpora with NON-contiguous
    ids are detected (a sampled id is missing from the fetch) and fall
    back to a distributed deterministic sample — per-batch partial
    top-k of the smallest crc32-keyed ids, merged on the driver — so
    only the id column streams and a tiny candidate set reaches the
    driver; no positional assumption, no full materialization."""
    import zlib

    rng = np.random.RandomState(7)
    chosen = rng.choice(n, size=min(n_cells, n), replace=False)
    cent_ids, cent_mat = _fetch_rows(sf_dir, pads.field("vec_id").isin([int(c) for c in chosen]))
    if len(cent_ids) == len(chosen):
        # contiguous ids: preserve the historical rng.choice ORDER (cell
        # indices follow it; output ranking does not)
        order = {int(v): i for i, v in enumerate(cent_ids)}
        return _unit(cent_mat)[[order[int(c)] for c in chosen]]

    want = min(n_cells, n)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ids):
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "skey": pa.array([], type=pa.int64())})
        keys = np.array([zlib.crc32(str(int(v)).encode()) for v in ids], dtype=np.int64)
        keep = np.argsort(keys, kind="stable")[:want]
        return pa.table({"vec_id": pa.array(ids[keep], type=pa.int64()),
                         "skey": pa.array(keys[keep], type=pa.int64())})

    cands = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    cands.sort(key=lambda r: (r["skey"], r["vec_id"]))
    sample_ids = [int(r["vec_id"]) for r in cands[:want]]
    cent_ids, cent_mat = _fetch_rows(sf_dir, pads.field("vec_id").isin(sample_ids))
    order = {int(v): i for i, v in enumerate(cent_ids)}
    return _unit(cent_mat)[[order[s] for s in sample_ids]]


def ivf_knn(
    sf_dir: str,
    num_queries: int = 5,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    cell_chunk: int = 8192,
) -> pa.Table:
    """Distributed IVF approximate top-k — the ANN scale path.

    Pipeline shape (all stages stream; nothing whole-corpus reaches the
    driver):

    1. centroids: seeded sample fetched with an isin-pushdown read
       (n_cells rows);
    2. assign: ``map_batches`` tags every vector with its nearest-centroid
       ``cell`` (vectorized argmax against the broadcast centroid matrix);
    3. probe: ``groupby("cell").map_groups`` — the shuffle co-locates each
       cell as one partition; only cells probed by >=1 query score their
       vectors against the (broadcast) probing queries, emitting a
       per-cell top-(k+1) partial;
    4. a tiny driver merge ranks the union.

    At 100 TB the cell assignment is computed once and the table is kept
    partitioned by ``cell``, so a query batch touches only ``n_probe``
    partitions.  Deterministic (seeded); rows-only check.
    """
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    n = ds.count()  # parquet metadata only — no scan
    centroids = _sample_centroids(sf_dir, n, n_cells)

    query_ids, q_mat = _fetch_rows(sf_dir, pads.field("vec_id") < num_queries)
    q_unit = _unit(q_mat)
    # n_probe nearest cells per query (driver-side: num_queries x n_cells)
    probes = [np.argsort(-(centroids @ q))[:n_probe] for q in q_unit]
    cell_to_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(probes):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(qi)

    cent_ref = ray.put(centroids)
    q_ref = ray.put(q_unit)
    c2q_ref = ray.put(cell_to_queries)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        ids, mat = _batch_matrix(batch)
        if not len(ids):
            return batch.append_column("cell", pa.array([], type=pa.int64()))
        cells = np.argmax(_unit(mat) @ cents.T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cells, type=pa.int64()))

    def per_cell_topk(group: pa.Table) -> pa.Table:
        cell = int(group.column("cell")[0].as_py())
        c2q = ray.get(c2q_ref)
        q_idx = c2q.get(cell, [])
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "sim": pa.array([], type=pa.float64()),
            }
        )
        if not q_idx:
            return empty
        queries = ray.get(q_ref)[q_idx]
        # a cell can be arbitrarily large (hot cells at 100 TB): score it
        # in bounded sub-batches (zero-copy Arrow slices -> chunk-sized
        # float64 matrices), keeping a per-query top-(k+1) partial across
        # chunks — the merged partial equals the whole-cell top-(k+1)
        cand_ids: list[list[np.ndarray]] = [[] for _ in q_idx]
        cand_sims: list[list[np.ndarray]] = [[] for _ in q_idx]
        for lo in range(0, group.num_rows, cell_chunk):
            ids, mat = _batch_matrix(group.slice(lo, cell_chunk))
            if not len(ids):
                continue
            sims = np.round(queries @ _unit(mat).T, 6)  # (n_queries, chunk)
            for row in range(len(q_idx)):
                order = np.lexsort((ids, -sims[row]))[: k + 1]
                cand_ids[row].append(ids[order])
                cand_sims[row].append(sims[row][order])
        out_q, out_n, out_s = [], [], []
        for row, qi in enumerate(q_idx):
            ids_c = np.concatenate(cand_ids[row])
            sims_c = np.concatenate(cand_sims[row])
            order = np.lexsort((ids_c, -sims_c))[: k + 1]
            for j in order:
                out_q.append(int(query_ids[qi]))
                out_n.append(int(ids_c[j]))
                out_s.append(float(sims_c[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(per_cell_topk, batch_format="pyarrow")
        .take_all()
    )
    return _merge_topk(partials, k)


def ivf_build(sf_dir: str, index_dir: str, n_cells: int = 16) -> dict:
    """Build a persistent IVF index: assign every vector to its nearest
    centroid and write the table CELL-PARTITIONED
    (``write_parquet(partition_cols=["cell"])``) plus a tiny centroid
    sidecar.  This is the partition-once-query-many layout for ANN at
    100 TB: each cell is its own parquet partition, so a query batch
    reads ONLY its ``n_probe`` partitions via partition pruning — no
    full scan, no shuffle at query time."""
    import json
    import os

    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    n = ds.count()
    centroids = _sample_centroids(sf_dir, n, n_cells)
    cent_ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        ids, mat = _batch_matrix(batch)
        cells = (
            np.argmax(_unit(mat) @ cents.T, axis=1).astype(np.int64)
            if len(ids)
            else np.array([], dtype=np.int64)
        )
        # cell twice: hive partition column (pruning) + in-file copy
        # (partition columns are path-encoded, not stored in the files)
        out = batch.append_column("cell", pa.array(cells, type=pa.int64()))
        return out.append_column("cell_id", pa.array(cells, type=pa.int64()))

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"]
    )
    with open(os.path.join(index_dir, "centroids.json"), "w") as f:
        json.dump({"centroids": centroids.tolist()}, f)
    return {"n_cells": int(len(centroids)), "n_vectors": int(n)}


def ivf_query(
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> pa.Table:
    """Query a persisted IVF index: read ONLY the probed cell partitions
    (partition pruning on the ``cell`` hive column), score per batch
    against the broadcast queries, merge tiny top-k partials."""
    import json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as f:
        centroids = np.array(json.load(f)["centroids"], dtype=np.float64)
    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    probes = [np.argsort(-(centroids @ q))[:n_probe] for q in q_unit]
    cell_to_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(probes):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(qi)
    probe_cells = sorted(cell_to_queries)

    q_ref = ray.put(q_unit)
    c2q_ref = ray.put(cell_to_queries)
    ids_arr = np.asarray(query_ids, dtype=np.int64)

    # partition pruning: only the probed cells' files are read
    import glob as globmod

    files = [
        f
        for c in probe_cells
        for f in sorted(globmod.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
    ]
    ds = ray.data.read_parquet(files)

    def score(batch: pa.Table) -> pa.Table:
        c2q = ray.get(c2q_ref)
        qm = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "sim": pa.array([], type=pa.float64()),
            }
        )
        if not len(ids):
            return empty
        unit = _unit(mat)
        # a batch may coalesce several small cell files — score each
        # cell's rows against only that cell's probing queries
        cells_np = batch.column("cell_id").to_numpy(zero_copy_only=False)
        out_q, out_n, out_s = [], [], []
        for cell in np.unique(cells_np):
            q_idx = c2q.get(int(cell), [])
            if not q_idx:
                continue
            mask = cells_np == cell
            sub_ids = ids[mask]
            sims = np.round(qm[q_idx] @ unit[mask].T, 6)
            for row, qi in enumerate(q_idx):
                order = np.lexsort((sub_ids, -sims[row]))[: k + 1]
                for j in order:
                    out_q.append(int(ids_arr[qi]))
                    out_n.append(int(sub_ids[j]))
                    out_s.append(float(sims[row][j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = ds.map_batches(score, batch_format="pyarrow").take_all()
    return _merge_topk(partials, k)


def ivf_knn_indexed(sf_dir: str, num_queries: int = 5, k: int = 10, n_probe: int = 4) -> pa.Table:
    """ivf_knn through the persistent index path: build (cached per
    sf_dir) then query — must return the same rows as ivf_knn since
    centroids/assignment/ranking are identical."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    index_dir = f"/tmp/ocsr_ivf/{tag}"
    if not os.path.exists(os.path.join(index_dir, "centroids.json")):
        ivf_build(sf_dir, index_dir)
    query_ids, q_mat = _fetch_rows(sf_dir, pads.field("vec_id") < num_queries)
    return ivf_query(index_dir, q_mat, query_ids, k=k, n_probe=n_probe)


def quantize_embeddings(sf_dir: str) -> "ray.data.Dataset":
    """Symmetric per-vector int8 quantization (the 4x storage-reduction
    stage of an embedding pipeline): scale = max|x| / 127, stored
    alongside the int8 codes plus the reconstruction RMSE — all
    vectorized per batch, streaming.

    Exactness contract (shared verbatim with the SQL oracle):
    codes = clip(floor(x/scale + 0.5), ±127) — half-up, NOT np.round's
    half-to-even, which DuckDB's ROUND cannot replay; per-element
    squared reconstruction error floors to int64 atto-units (1e18) so
    the per-vector sum is ORDER-INDEPENDENT; ``scale_micro`` floors the
    scale to picounits; ``codes_chk`` is the position-weighted integer
    checksum sum(code_i * i) pinning every code without shipping the
    blob through SQL; ``rmse = sqrt(sq_atto / (d * 1e18))`` is one
    staged IEEE division + one shared libm sqrt."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        if not len(ids):
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "scale": pa.array([], type=pa.float64()),
                    "scale_micro": pa.array([], type=pa.int64()),
                    "codes": pa.array([], type=pa.binary()),
                    "codes_chk": pa.array([], type=pa.int64()),
                    "rmse": pa.array([], type=pa.float64()),
                }
            )
        d = mat.shape[1]
        scale = np.maximum(np.abs(mat).max(axis=1), 1e-12) / 127.0
        codes = np.clip(
            np.floor(mat / scale[:, None] + 0.5), -127, 127
        ).astype(np.int8)
        recon = codes.astype(np.float64) * scale[:, None]
        sq_atto = np.floor((mat - recon) ** 2 * 1e18).astype(np.int64).sum(axis=1)
        rmse = np.sqrt(sq_atto.astype(np.float64) / (d * 1e18))
        chk = (codes.astype(np.int64) * np.arange(1, d + 1, dtype=np.int64)).sum(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "scale": pa.array(scale, type=pa.float64()),
                "scale_micro": pa.array(
                    np.floor(scale * 1e12).astype(np.int64), type=pa.int64()
                ),
                "codes": pa.array([c.tobytes() for c in codes], type=pa.binary()),
                "codes_chk": pa.array(chk, type=pa.int64()),
                "rmse": pa.array(rmse, type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(fn, batch_format="pyarrow").sort("vec_id")


def embedding_norms(sf_dir: str) -> "ray.data.Dataset":
    """Per-vector L2 norm, rounded to 6 decimals — the normalization
    profile stage of an embedding pipeline.  The squared-sum
    accumulates SEQUENTIALLY per row (np.cumsum over the squares) so fp
    addition order matches DuckDB's left-to-right list_sum exactly and
    the oracle hash-compares."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        if not len(ids):
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "norm_r6": pa.array([], type=pa.float64()),
                }
            )
        sq = mat * mat
        ssum = np.cumsum(sq, axis=1)[:, -1]  # sequential, not pairwise
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "norm_r6": pa.array(np.round(np.sqrt(ssum), 6), type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(fn, batch_format="pyarrow").sort("vec_id")


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5) -> pa.Table:
    """Distributed mini k-means over the embeddings table — the
    iterative-algorithm pattern: each Lloyd iteration is ONE streaming
    pass (map_batches emits per-batch partial sums + counts per
    cluster, tiny k x d partials reduce on the driver), so the corpus
    never materializes and the driver state is k centroids.  Seeded
    deterministic init via the shared centroid sampler.  After ``iters``
    update steps a FINAL assignment-only pass computes the reported
    cluster sizes + within-cluster inertia against the FINAL centroids
    (without it they would describe the previous iteration's centroids —
    a consumer pairing these rows with a final-centroid predict stage
    would see inconsistent counts).  Rows-only; the convergence
    property — non-increasing inertia — is the test oracle."""
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    n = ds.count()
    centroids = _sample_centroids(sf_dir, n, k)  # unit-normalized seeds

    inertias: list[float] = []
    # iters update passes + 1 evaluation-only pass (no update)
    for it in range(iters + 1):
        cent_ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            ids, mat = _batch_matrix(batch)
            if not len(ids):
                return pa.table(
                    {
                        "cell": pa.array([], type=pa.int64()),
                        "count": pa.array([], type=pa.int64()),
                        "sums": pa.array([], type=pa.binary()),
                        "sq_err": pa.array([], type=pa.float64()),
                    }
                )
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                - 2 * (mat @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            cells, counts_, errs, sums = [], [], [], []
            for c in np.unique(assign):
                mask = assign == c
                cells.append(int(c))
                counts_.append(int(mask.sum()))
                errs.append(float(d2[mask, c].sum()))
                sums.append(mat[mask].sum(axis=0).astype("<f8").tobytes())
            return pa.table(
                {
                    "cell": pa.array(cells, type=pa.int64()),
                    "count": pa.array(counts_, type=pa.int64()),
                    "sums": pa.array(sums, type=pa.binary()),
                    "sq_err": pa.array(errs, type=pa.float64()),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        dim = centroids.shape[1]
        sums = np.zeros((len(centroids), dim))
        counts = np.zeros(len(centroids), dtype=np.int64)
        inertia = 0.0
        for r in rows:
            c = r["cell"]
            sums[c] += np.frombuffer(r["sums"], dtype="<f8")
            counts[c] += r["count"]
            inertia += r["sq_err"]
        inertias.append(float(inertia))
        if it == iters:
            break  # evaluation pass: report against THESE centroids
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    return pa.table(
        {
            "cluster": pa.array(np.arange(len(centroids)), type=pa.int64()),
            "size": pa.array(counts, type=pa.int64()),
            "inertia_r3": pa.array(
                [round(inertias[-1], 3)] * len(centroids), type=pa.float64()
            ),
        }
    )

def semantic_dedup(
    sf_dir: str,
    n_cells: int = 16,
    threshold: float = 0.95,
    iters: int = 3,
    max_cluster: int = 4096,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then find
    near-duplicate pairs ONLY within each cluster — the published scale
    path that turns O(n^2) cosine dedup into O(n^2/k) cluster-local
    work.  Within a cluster, vectors whose cosine similarity reaches
    ``threshold`` form components (cluster-local union-find; the
    cluster fits one task by construction) and every non-min member is
    marked dropped.

    Ray shape (100 TB): ``iters`` Lloyd passes stream kxd partials to
    the driver (the kmeans_embeddings pattern), the final assignment
    pass emits (cell, vec_id, unit-vector blob) rows, and ONE
    ``groupby(cell)`` co-locates each cluster for in-shuffle pairwise
    verification — the same in-shuffle-verify shape as the MinHash-LSH
    text path, with the cluster id playing the band-bucket role.
    Degenerate clusters (> ``max_cluster``) fall back to
    representative-only comparison — each member against the vector
    closest to the centroid (SemDeDup's own formulation) — keeping the
    worst cluster O(n), not O(n^2).

    Returns a Dataset of (vec_id, cell, keep) sorted by vec_id;
    rows-only (iterative float k-means is not SQL-expressible)."""
    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    n = ds.count()
    centroids = _sample_centroids(sf_dir, n, n_cells)

    for _ in range(iters):
        cent_ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            ids, mat = _batch_matrix(batch)
            if not len(ids):
                return pa.table(
                    {
                        "cell": pa.array([], type=pa.int64()),
                        "count": pa.array([], type=pa.int64()),
                        "sums": pa.array([], type=pa.binary()),
                    }
                )
            sims = _unit(mat) @ cents.T
            assign = np.argmax(sims, axis=1)
            cells, counts_, sums = [], [], []
            for c in np.unique(assign):
                mask = assign == c
                cells.append(int(c))
                counts_.append(int(mask.sum()))
                sums.append(mat[mask].sum(axis=0).astype("<f8").tobytes())
            return pa.table(
                {
                    "cell": pa.array(cells, type=pa.int64()),
                    "count": pa.array(counts_, type=pa.int64()),
                    "sums": pa.array(sums, type=pa.binary()),
                }
            )

        agg = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        dim = centroids.shape[1]
        sums = np.zeros((n_cells, dim))
        counts = np.zeros(n_cells, dtype=np.int64)
        for ref in agg:
            t = ray.get(ref)
            for cell, cnt, blob in zip(
                t.column("cell").to_pylist(),
                t.column("count").to_pylist(),
                t.column("sums").to_pylist(),
            ):
                counts[cell] += cnt
                sums[cell] += np.frombuffer(blob, dtype="<f8")
        nonempty = counts > 0
        centroids[nonempty] = _unit(sums[nonempty] / counts[nonempty, None])

    cent_ref = ray.put(centroids)

    def assign_rows(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        ids, mat = _batch_matrix(batch)
        if not len(ids):
            return pa.table(
                {
                    "cell": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "unit": pa.array([], type=pa.binary()),
                    "cdist": pa.array([], type=pa.float64()),
                }
            )
        u = _unit(mat)
        sims = u @ cents.T
        assign = np.argmax(sims, axis=1)
        return pa.table(
            {
                "cell": pa.array(assign, type=pa.int64()),
                "vec_id": pa.array(ids, type=pa.int64()),
                "unit": pa.array([r.astype("<f8").tobytes() for r in u], type=pa.binary()),
                # distance-to-centroid proxy picks the representative
                "cdist": pa.array(
                    (1.0 - sims[np.arange(len(ids)), assign]), type=pa.float64()
                ),
            }
        )

    def dedup_cluster(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        blobs = group.column("unit").to_pylist()
        u = np.vstack([np.frombuffer(blobs[i], dtype="<f8") for i in order])
        cell = group.column("cell")[0].as_py()
        m = len(ids)
        keep = np.ones(m, dtype=bool)
        if m > max_cluster:
            cd = np.asarray(group.column("cdist").to_pylist())[order]
            rep = int(np.lexsort((ids, cd))[0])  # closest to centroid, min id ties
            sims = u @ u[rep]
            dup = (sims >= threshold) & (np.arange(m) != rep)
            keep[dup & (ids > ids[rep])] = False
        else:
            sims = u @ u.T
            # union-find over >=threshold pairs; keep the min id per
            # component (matches the text near-dup keep semantics)
            parent = np.arange(m)

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            for a, b in zip(ii.tolist(), jj.tolist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            for x in range(m):
                if find(x) != x:
                    keep[x] = False
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "cell": pa.array([cell] * m, type=pa.int64()),
                "keep": pa.array(keep.tolist(), type=pa.bool_()),
            }
        )

    return (
        ds.map_batches(assign_rows, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(dedup_cluster, batch_format="pyarrow")
        .sort("vec_id")
    )


def label_centroids(sf_dir: str) -> pa.Table:
    """Per-label centroid sums of the embedding column — the grouped
    vector-mean every prototype / class-balance stage needs.  Ray shape:
    per-batch numpy scatter-add partials (one row per label per block,
    carrying a d-length int64 vector), then a label groupby merges the
    block partials — the raw vectors never shuffle, only label-count x d
    integers.  Values accumulate in EXACT integer micro-units
    (round-half-away-from-zero of value*1e6, the same expression as the
    SQL oracle) so the sum is order-independent and hash-comparable
    despite float non-associativity; consumers divide sum_micro/n/1e6
    for the mean.  Emitted long-form (label, pos, sum_micro, n)."""

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch.column("embedding").combine_chunks()
        if not len(col):
            return pa.table(
                {
                    "label": pa.array([], type=pa.int64()),
                    "sums": pa.array([], type=pa.list_(pa.int64())),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(len(col), -1) * 1e6
        micro = np.where(mat >= 0, np.floor(mat + 0.5), np.ceil(mat - 0.5)).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), micro.shape[1]), dtype=np.int64)
        np.add.at(sums, inv, micro)
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table(
            {
                "label": pa.array(uniq, type=pa.int64()),
                "sums": pa.array([s.tolist() for s in sums], type=pa.list_(pa.int64())),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        label = int(group.column("label")[0].as_py())
        stacked = np.array(group.column("sums").to_pylist(), dtype=np.int64)
        total = stacked.sum(axis=0)
        n = int(group.column("n").to_numpy(zero_copy_only=False).sum())
        d = len(total)
        return pa.table(
            {
                "label": pa.array([label] * d, type=pa.int64()),
                "pos": pa.array(np.arange(1, d + 1), type=pa.int64()),
                "sum_micro": pa.array(total, type=pa.int64()),
                "n": pa.array([n] * d, type=pa.int64()),
            }
        )

    out = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .map_groups(merge, batch_format="pyarrow")
        .sort(["label", "pos"])
    )
    return out

def ivf_recall(
    sf_dir: str, num_queries: int = 5, k: int = 10, n_probe: int = 4
) -> pa.Table:
    """ANN quality evaluation: recall@k of the IVF path against the
    exact brute-force neighbors — the measurement every ANN deployment
    runs before trusting an index.  Both paths already stream; the
    comparison is query-count-sized.  Invariant pinned by the test
    suite: probing ALL cells makes IVF exhaustive, so recall must be
    exactly 1.0 there."""
    exact = knn_bruteforce(sf_dir, num_queries, k)
    approx = ivf_knn(sf_dir, num_queries, k, n_probe=n_probe)

    def to_sets(t: pa.Table) -> dict[int, set]:
        out: dict[int, set] = {}
        for q, n in zip(t.column("query_id").to_pylist(), t.column("neighbor_id").to_pylist()):
            out.setdefault(int(q), set()).add(int(n))
        return out

    e, a = to_sets(exact), to_sets(approx)
    qs = sorted(e)
    return pa.table(
        {
            "query_id": pa.array(qs, type=pa.int64()),
            "recall": pa.array(
                [len(e[q] & a.get(q, set())) / len(e[q]) for q in qs], type=pa.float64()
            ),
            "n_probe": pa.array([n_probe] * len(qs), type=pa.int64()),
        }
    )


def embedding_covariance(sf_dir: str) -> pa.Table:
    """Distributed covariance (Gram) matrix of the embedding columns —
    the one-pass distributed-linear-algebra pattern: each block
    contributes an EXACT int64 ``E.T @ E`` partial (elements floored to
    integer micro-units first, so the matmul is integer arithmetic and
    the reduction is order-independent), plus per-dim sums and a count;
    d x d partials reduce on the driver (d²=4096 ints per block — the
    vectors themselves never shuffle), and the final population
    covariance is ONE staged IEEE expression shared with the SQL oracle
    ((Sij/n - (Si/n)(Sj/n)) / 1e12).  Output: the upper triangle as
    (i, j, cov) rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding").combine_chunks()
        dim = len(col[0])
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = np.floor(flat * 1e6).astype(np.int64).reshape(-1, dim)
        gram = m.T @ m  # int64-exact
        return pa.table(
            {
                "n": pa.array([len(m)], type=pa.int64()),
                "sums": pa.array([m.sum(axis=0).tolist()], type=pa.list_(pa.int64())),
                "gram": pa.array([gram.reshape(-1).tolist()], type=pa.list_(pa.int64())),
            }
        )

    n_total = 0
    sums = None
    gram = None
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        n_total += int(row["n"])
        s = np.array(row["sums"], dtype=object)  # Python ints: no overflow
        g = np.array(row["gram"], dtype=object)
        sums = s if sums is None else sums + s
        gram = g if gram is None else gram + g
    dim = int(round(len(gram) ** 0.5))
    gram = gram.reshape(dim, dim)

    ii, jj, cov = [], [], []
    n = float(n_total)
    for i in range(dim):
        mean_i = float(sums[i]) / n
        for j in range(i, dim):
            c = (float(gram[i][j]) / n - mean_i * (float(sums[j]) / n)) / 1e12
            ii.append(i)
            jj.append(j)
            cov.append(c)
    return pa.table(
        {
            "i": pa.array(ii, type=pa.int64()),
            "j": pa.array(jj, type=pa.int64()),
            "cov": pa.array(cov, type=pa.float64()),
        }
    )


def embedding_top_eigvec(sf_dir: str, iterations: int = 500) -> pa.Table:
    """First principal component of the embedding distribution — power
    iteration on the EXACT covariance from ``embedding_covariance``
    (the distributed pass; d² integers reach the driver, the corpus
    never re-streams).  Deterministic: the start vector is 1/sqrt(d)
    (no RNG), iteration count fixed, the sign convention pins
    ``v[argmax |v|] > 0``.  Rows-only driver check (iterative float
    fixpoints aren't SQL-expressible); pytest verifies unit norm, the
    Rayleigh quotient against ``np.linalg.eigh``'s top eigenvalue, and
    alignment |v·v_eigh| ≈ 1."""
    cov_rows = embedding_covariance(sf_dir).to_pylist()
    dim = max(int(r["j"]) for r in cov_rows) + 1
    C = np.zeros((dim, dim), dtype=np.float64)
    for r in cov_rows:
        C[int(r["i"]), int(r["j"])] = float(r["cov"])
        C[int(r["j"]), int(r["i"])] = float(r["cov"])
    v = np.full(dim, 1.0 / np.sqrt(dim))
    for _ in range(iterations):
        w = C @ v
        n = np.linalg.norm(w)
        if n == 0:
            break
        v = w / n
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    lam = float(v @ (C @ v))
    return pa.table(
        {
            "dim": pa.array(np.arange(dim), type=pa.int64()),
            "component": pa.array(v, type=pa.float64()),
            "eigenvalue": pa.array([lam] * dim, type=pa.float64()),
        }
    )
