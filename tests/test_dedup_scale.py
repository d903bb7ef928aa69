"""Scale-hardening tests for the distributed dedup/ANN suite:
degenerate LSH buckets must not go O(n^2), and the distributed IVF path
must agree with the brute-force ranking on probed cells."""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def identical_docs_dir(tmp_path_factory):
    """1000 byte-identical documents — every LSH band hashes them into
    ONE bucket."""
    d = tmp_path_factory.mktemp("identical")
    text = "the quick brown fox jumps over the lazy dog again and again"
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(1000)), type=pa.int64()),
            "text": pa.array([text] * 1000, type=pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_lsh_degenerate_bucket_star_cap(ray_session, identical_docs_dir):
    """A 1000-doc bucket (over max_bucket) emits the O(n) star around
    the min doc_id, not the O(n^2) clique — and still links every dup to
    its keeper."""
    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import minhash_lsh_dedup

    t0 = time.monotonic()
    pairs = minhash_lsh_dedup(identical_docs_dir, threshold=0.8, max_bucket=256)
    elapsed = time.monotonic() - t0

    rows = pairs.to_pylist()
    # star: doc 0 paired with each of 1..999 exactly once
    assert len(rows) == 999
    assert all(r["doc_a"] == 0 for r in rows)
    assert sorted(r["doc_b"] for r in rows) == list(range(1, 1000))
    # O(n) candidates, not 499500 pairs: must finish fast
    assert elapsed < 120


def test_lsh_small_bucket_still_clique(ray_session, tmp_path):
    """Below the cap the full verified clique is returned."""
    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import minhash_lsh_dedup

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tbl = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], type=pa.int64()),
            "text": pa.array([text] * 3, type=pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    pairs = minhash_lsh_dedup(str(tmp_path), threshold=0.8)
    assert sorted((r["doc_a"], r["doc_b"]) for r in pairs.to_pylist()) == [
        (10, 20),
        (10, 30),
        (20, 30),
    ]


def test_ivf_neighbors_subset_of_probed_bruteforce(ray_session):
    """Distributed IVF returns each query's exact ranking restricted to
    probed cells: every IVF neighbor list must be a subsequence-ordered
    subset of the brute-force candidates, and ranks strictly 1..k."""
    from opentelemetry_collector_symbolicator_ray.pipelines.similarity import (
        ivf_knn,
        knn_bruteforce,
    )

    sf = "/root/testdata/sf0.001"
    brute = knn_bruteforce(sf, num_queries=3, k=5).to_pylist()
    ivf = ivf_knn(sf, num_queries=3, k=5).to_pylist()
    assert {r["query_id"] for r in ivf} == {r["query_id"] for r in brute}
    by_q: dict[int, list[int]] = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert ranks == list(range(1, len(ranks) + 1))


def test_near_dedup_keep_components(ray_session):
    """near_dedup_keep drops exactly the non-min members of each LSH
    pair component: keep + dropped partition the corpus, every pair has
    at most one surviving endpoint, and each component's min survives."""
    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import (
        minhash_lsh_dedup,
        near_dedup_keep,
    )

    sf = "/root/testdata/sf0.001"
    pairs = minhash_lsh_dedup(sf, threshold=0.8).to_pylist()
    keep_ds = near_dedup_keep(sf, threshold=0.8)
    import ray.data as rd

    assert isinstance(keep_ds, rd.Dataset)  # corpus-sized result streams
    kept = {r["doc_id"] for r in keep_ds.take_all()}
    assert len(kept) == 500 - len({x for r in pairs for x in (r["doc_a"], r["doc_b"])} - _component_minima(pairs))
    for r in pairs:
        assert not (r["doc_a"] in kept and r["doc_b"] in kept) or r["doc_a"] == r["doc_b"]
    assert _component_minima(pairs) <= kept


def _component_minima(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for x in parent:
        comps.setdefault(find(x), set()).add(x)
    return {min(v) for v in comps.values()}


def test_ivf_index_build_query_matches_shuffle_path(ray_session, tmp_path):
    """The persistent cell-partitioned IVF index (build once, probe only
    n_probe partitions at query time) returns exactly the shuffle-path
    ivf_knn rows, and only probed partitions are read."""
    import glob

    import numpy as np
    import pyarrow.dataset as pads

    from opentelemetry_collector_symbolicator_ray.pipelines.similarity import (
        _fetch_rows,
        ivf_build,
        ivf_knn,
        ivf_query,
    )

    sf = "/root/testdata/sf0.001"
    index_dir = str(tmp_path / "ivf")
    meta = ivf_build(sf, index_dir)
    assert meta["n_cells"] == 16
    # every vector landed in exactly one partition
    n_rows = 0
    for part in glob.glob(f"{index_dir}/cell=*/*.parquet"):
        import pyarrow.parquet as pq

        n_rows += pq.read_metadata(part).num_rows
    assert n_rows == meta["n_vectors"]

    qids, qmat = _fetch_rows(sf, pads.field("vec_id") < 3)
    got = ivf_query(index_dir, qmat, qids, k=5, n_probe=4).to_pylist()
    want = ivf_knn(sf, num_queries=3, k=5).to_pylist()
    assert got == want


def test_ivf_dominant_cell_chunked(ray_session):
    """A cell holding the WHOLE corpus (worst-case skew) is scored in
    bounded sub-batches; chunking never changes the result."""
    from opentelemetry_collector_symbolicator_ray.pipelines.similarity import (
        ivf_knn,
        knn_bruteforce,
    )

    sf = "/root/testdata/sf0.001"
    # n_cells=1 -> every vector in one dominant cell; tiny cell_chunk
    # bounds each matmul; probing the single cell == exact brute force
    a = ivf_knn(sf, num_queries=3, k=5, n_cells=1, n_probe=1, cell_chunk=37).to_pylist()
    b = knn_bruteforce(sf, num_queries=3, k=5).to_pylist()
    assert a == b
    # chunk size is invisible on the standard config too
    c = ivf_knn(sf, num_queries=3, k=5, cell_chunk=13).to_pylist()
    d = ivf_knn(sf, num_queries=3, k=5).to_pylist()
    assert c == d


def test_block_pair_fanout_guard_fires(ray_session):
    """The no-silent-caps guard on exact all-pairs operators: above
    max_blocks the O(B^2/2) fan-out refuses loudly and points at the
    sub-quadratic scale path."""
    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import (
        embedding_neardup_pairs,
        ngram_jaccard_pairs,
    )

    sf = "/root/testdata/sf0.001"
    with pytest.raises(ValueError, match="minhash_lsh_dedup"):
        ngram_jaccard_pairs(sf, max_blocks=0)
    with pytest.raises(ValueError, match="ivf"):
        embedding_neardup_pairs(sf, max_blocks=0)
    # at/below the cap both still run
    assert ngram_jaccard_pairs(sf, threshold=0.99, max_blocks=4096).num_rows >= 0


def test_ivf_noncontiguous_vec_ids(ray_session, tmp_path):
    """Centroid sampling must not assume vec_id == row position: on a
    corpus with id gaps the fallback (distributed crc32-keyed sample)
    kicks in, and probing ALL cells still reproduces the brute-force
    ranking exactly."""
    import numpy as np

    from opentelemetry_collector_symbolicator_ray.pipelines.similarity import (
        ivf_knn,
        knn_bruteforce,
    )

    rng = np.random.RandomState(3)
    # queries keep ids 0..2 (fetched via vec_id < num_queries); the rest
    # of the corpus has large, gappy ids
    ids = list(range(3)) + [1000 + 7 * i for i in range(60)]
    mat = rng.randn(len(ids), 16).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([list(map(float, row)) for row in mat],
                                  type=pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    sf = str(tmp_path)

    brute = knn_bruteforce(sf, num_queries=3, k=5).to_pylist()
    ivf_all = ivf_knn(sf, num_queries=3, k=5, n_cells=8, n_probe=8).to_pylist()
    assert ivf_all == brute  # all cells probed == exact


def test_tfidf_join_path_matches_broadcast(ray_session):
    """The web-scale word-key-join TF-IDF path (no driver vocab dict)
    must reproduce the broadcast path exactly, and both stream their
    corpus-sized result as a Dataset."""
    import ray.data as rd

    from opentelemetry_collector_symbolicator_ray.pipelines.text import tfidf_top_term

    sf = "/root/testdata/sf0.001"
    broadcast = tfidf_top_term(sf, mode="broadcast")
    join = tfidf_top_term(sf, mode="join")
    assert isinstance(broadcast, rd.Dataset) and isinstance(join, rd.Dataset)
    assert broadcast.take_all() == join.take_all()

    # auto picks join when the vocab exceeds the threshold
    forced = tfidf_top_term(sf, mode="auto", vocab_threshold=1)
    assert forced.take_all() == join.take_all()


def test_hll_approx_distinct_within_bound(ray_session):
    """The distributed HyperLogLog sketch lands within its theoretical
    error band of the exact distinct-word count (p=12 -> ~1.6% sigma;
    assert 5% = ~3 sigma), and is deterministic."""
    import duckdb

    from opentelemetry_collector_symbolicator_ray.pipelines.text import (
        approx_distinct_words,
    )

    sf = "/root/testdata/sf0.001"
    exact = duckdb.sql(
        f"""SELECT COUNT(DISTINCT w) FROM (
              SELECT UNNEST(string_split(text, ' ')) AS w
              FROM read_parquet('{sf}/documents.parquet'))"""
    ).fetchone()[0]
    got = approx_distinct_words(sf).to_pylist()[0]["approx_distinct"]
    assert abs(got - exact) / exact < 0.05
    assert approx_distinct_words(sf).to_pylist()[0]["approx_distinct"] == got


def test_kmeans_converges_and_partitions(ray_session):
    """Distributed Lloyd iterations: cluster sizes partition the corpus
    and inertia is non-increasing with more iterations."""
    from opentelemetry_collector_symbolicator_ray.pipelines.similarity import (
        kmeans_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    one = kmeans_embeddings(sf, k=8, iters=1).to_pylist()
    five = kmeans_embeddings(sf, k=8, iters=5).to_pylist()
    assert sum(r["size"] for r in five) == 500
    assert len(five) == 8
    assert five[0]["inertia_r3"] <= one[0]["inertia_r3"]
    # deterministic
    again = kmeans_embeddings(sf, k=8, iters=5).to_pylist()
    assert again == five


def test_simhash_banded_dupes_cross_modal_engine(ray_session, tmp_path):
    """Text SimHash dedup rides the SAME banded-Hamming engine as
    image/audio dedup: byte-identical docs pair at distance 0."""
    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import simhash_dupes

    text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content with nothing shared at all whatsoever"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 50], type=pa.int64()),
            "text": pa.array([text, text, other], type=pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    pairs = simhash_dupes(str(tmp_path)).to_pylist()
    assert {(r["doc_a"], r["doc_b"], r["dist"]) for r in pairs} >= {(1, 2, 0)}
    assert all({r["doc_a"], r["doc_b"]} != {1, 50} for r in pairs)


def test_simhash_dupes_wide_and_negative_ids(ray_session, tmp_path):
    """Pair ordering (doc_a < doc_b numerically) must survive doc_ids
    wider than 12 digits, and negative ids are refused loudly (they
    would silently corrupt the star-cap keeper choice)."""
    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import simhash_dupes

    text = "the quick brown fox jumps over the lazy dog again and again"
    big_a, big_b = 999_999_999_999, 1_000_000_000_000  # 12 vs 13 digits
    tbl = pa.table(
        {
            "doc_id": pa.array([big_a, big_b], type=pa.int64()),
            "text": pa.array([text, text], type=pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    pairs = simhash_dupes(str(tmp_path)).to_pylist()
    assert pairs == [{"doc_a": big_a, "doc_b": big_b, "dist": 0}]

    neg = pa.table(
        {
            "doc_id": pa.array([-1, 5], type=pa.int64()),
            "text": pa.array([text, text], type=pa.string()),
        }
    )
    pq.write_table(neg, str(tmp_path / "documents.parquet"))
    import ray.exceptions

    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        simhash_dupes(str(tmp_path)).to_pylist()


def test_revenue_forecast_zero_match_returns_zero(ray_session, tmp_path):
    """A filter matching no rows yields revenue_cents=0 / n_items=0 —
    never a crash on the None aggregate."""
    from opentelemetry_collector_symbolicator_ray.pipelines.analytics import (
        revenue_forecast,
    )

    tbl = pa.table(
        {
            "l_extendedprice": pa.array([100.0, 200.0], type=pa.float64()),
            "l_discount": pa.array([0.5, 0.5], type=pa.float64()),  # outside [0.05, 0.07]
            "l_quantity": pa.array([1.0, 2.0], type=pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    out = revenue_forecast(str(tmp_path)).to_pylist()
    assert out == [{"revenue_cents": 0, "n_items": 0}]


def test_connected_components_label_propagation(ray_session):
    """Distributed CC over a hand-built edge list: a 5-node chain (needs
    diameter rounds, exercising the fixpoint loop), a star, one isolated
    pair — every node must label with its component's min id."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import (
        connected_components,
    )

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),          # chain: component 1
        (10, 11), (10, 12), (10, 13),             # star:  component 10
        (20, 21),                                  # pair:  component 20
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in edges], type=pa.int64()),
                "doc_b": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
    )
    got = {r["node"]: r["component"] for r in connected_components(ds).take_all()}
    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
            10: 10, 11: 10, 12: 10, 13: 10,
            20: 20, 21: 20}
    assert got == want


def test_near_dedup_keep_distributed_equals_driver(ray_session):
    """cc="distributed" (label-propagation components + anti-join
    filter; pairs never on the driver) must produce the same keep-set
    as the driver union-find path."""
    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import (
        near_dedup_keep,
    )

    sf = "/root/testdata/sf0.001"
    driver = [r["doc_id"] for r in near_dedup_keep(sf, threshold=0.8).take_all()]
    dist = [
        r["doc_id"]
        for r in near_dedup_keep(sf, threshold=0.8, cc="distributed").take_all()
    ]
    assert driver == dist and len(driver) > 0

    import pytest

    with pytest.raises(ValueError, match="unknown cc engine"):
        near_dedup_keep(sf, cc="bogus")


def test_ivf_recall_full_probe_is_exact(ray_session):
    """Probing every cell makes IVF exhaustive: recall@k must be exactly
    1.0 per query; partial probes stay usefully above the random floor."""
    from opentelemetry_collector_symbolicator_ray.pipelines import similarity

    sf = "/root/testdata/sf0.001"
    full = similarity.ivf_recall(sf, 5, 10, n_probe=16)
    assert full.column("recall").to_pylist() == [1.0] * 5
    partial = similarity.ivf_recall(sf, 5, 10, n_probe=4)
    rs = partial.column("recall").to_pylist()
    assert sum(rs) / len(rs) >= 0.2


def test_semantic_dedup_invariants(ray_session):
    """SemDeDup invariants: (vec_id, cell, keep) partitions the corpus,
    every cluster keeps at least one member, same-cell pairs at or above
    the threshold never both survive, and each cluster's minimum vec_id
    that belongs to a component survives (min-keep rule)."""
    import numpy as np

    from opentelemetry_collector_symbolicator_ray.pipelines.similarity import (
        semantic_dedup,
    )

    sf = "/root/testdata/sf0.001"
    rows = semantic_dedup(sf, threshold=0.35).take_all()
    assert len(rows) > 0
    by_cell: dict[int, list[dict]] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        assert any(m["keep"] for m in members), f"cluster {cell} kept nothing"

    # same-cell >= threshold pairs have at most one surviving endpoint
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {
        int(i): np.asarray(e, dtype=np.float64)
        for i, e in zip(tbl.column("vec_id").to_pylist(), tbl.column("embedding").to_pylist())
    }
    unit = {i: v / np.linalg.norm(v) for i, v in vecs.items()}
    kept = {r["vec_id"] for r in rows if r["keep"]}
    checked = 0
    for cell, members in by_cell.items():
        ids = sorted(m["vec_id"] for m in members)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                if float(unit[ids[x]] @ unit[ids[y]]) >= 0.35:
                    checked += 1
                    assert not (ids[x] in kept and ids[y] in kept)
    assert checked > 0, "corpus produced no same-cell near-dup pairs to verify"


def test_lm_perplexity_join_path_matches_broadcast(ray_session):
    """The web-scale word-key-join LM scoring path (no driver vocab
    dict) must reproduce the broadcast path bit-for-bit, including the
    float avg_logprob/ppl columns, and auto must switch on the
    measured vocabulary size."""
    import ray.data as rd

    from opentelemetry_collector_symbolicator_ray.pipelines.text import lm_perplexity

    sf = "/root/testdata/sf0.001"
    broadcast = lm_perplexity(sf, mode="broadcast")
    join = lm_perplexity(sf, mode="join")
    assert isinstance(broadcast, rd.Dataset) and isinstance(join, rd.Dataset)
    b_rows, j_rows = broadcast.take_all(), join.take_all()
    assert b_rows == j_rows  # exact equality incl. float bits

    # perplexity sanity: every row positive, exp(-avg) consistent
    import math

    for r in b_rows[:25]:
        assert r["ppl"] > 0
        assert r["ppl"] == math.exp(-r["avg_logprob"])

    # auto picks the join path when the vocab exceeds the threshold
    forced = lm_perplexity(sf, mode="auto", vocab_threshold=1)
    assert forced.take_all() == j_rows


def test_new_ops_block_layout_independence(ray_session):
    """The round-5 session-6 operators must return identical results
    under a radically different block layout (tiny target block size =>
    many small blocks => different per-batch combiner groupings and
    shuffle partition contents) — the partitioning-independence claim
    their integer-unit staging exists to guarantee."""
    import ray.data as rd

    from opentelemetry_collector_symbolicator_ray.pipelines import analytics, text

    sf = "/root/testdata/sf0.001"

    def run_all():
        return {
            "pagerank": analytics.purchase_graph_pagerank(sf, iterations=4).to_pylist(),
            "salted": analytics.salted_type_counts(sf).to_pylist(),
            "incr": analytics.incremental_daily_agg(sf).to_pylist(),
            "lm": text.lm_perplexity(sf).take_all(),
        }

    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    baseline = run_all()
    try:
        ctx.target_max_block_size = 16 * 1024  # ~100x smaller blocks
        tiny = run_all()
    finally:
        ctx.target_max_block_size = old
    for k in baseline:
        assert tiny[k] == baseline[k], k


def test_triangle_count_bruteforce_and_join_path(ray_session, tmp_path):
    """Crafted co-purchase graph: the oriented-wedge count equals a
    brute-force enumeration, and the web-scale degree-join path
    (broadcast_max_nodes=0) reproduces the broadcast path exactly.
    Duplicate (order, part) rows must not inflate edges."""
    from itertools import combinations

    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines.analytics import (
        copurchase_triangle_count,
    )

    orders = {
        1: [1, 2, 3],
        2: [2, 3, 4],
        3: [1, 4],
        4: [5, 6],       # disconnected edge, no triangle
        5: [1, 2, 3],    # duplicate co-purchases of order 1
        6: [7],          # single-part order: no edges
    }
    ok, pk = [], []
    for o, parts in orders.items():
        for p in parts:
            ok.append(o); pk.append(p)
            ok.append(o); pk.append(p)  # exact duplicate rows
    pq.write_table(
        pa.table({"l_orderkey": pa.array(ok, type=pa.int64()),
                  "l_partkey": pa.array(pk, type=pa.int64())}),
        str(tmp_path / "lineitem.parquet"),
    )

    edges = set()
    for parts in orders.values():
        for u, v in combinations(sorted(set(parts)), 2):
            edges.add((u, v))
    nodes = sorted({n for e in edges for n in e})
    expect = sum(
        1
        for u, v, w in combinations(nodes, 3)
        if (u, v) in edges and (u, w) in edges and (v, w) in edges
    )
    assert expect == 4  # (1,2,3) (2,3,4) (1,3,4) (1,2,4)

    got_b = copurchase_triangle_count(str(tmp_path)).to_pylist()
    got_j = copurchase_triangle_count(str(tmp_path), broadcast_max_nodes=0).to_pylist()
    assert got_b == [{"triangles": expect}]
    assert got_j == got_b


def test_levenshtein_kernel_matches_duckdb():
    """The vectorized DP must equal DuckDB's levenshtein on random
    strings (incl. empties and unicode) — the oracle swaps this kernel
    in for the Jaccard verify, so drift here is silent wrongness."""
    import random

    import duckdb

    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import _levenshtein

    rng = random.Random(42)
    alphabet = "abcx √© 9"
    cases = [("", ""), ("", "abc"), ("abc", ""), ("kitten", "sitting")]
    for _ in range(300):
        a = "".join(rng.choices(alphabet, k=rng.randint(0, 14)))
        b = "".join(rng.choices(alphabet, k=rng.randint(0, 14)))
        cases.append((a, b))
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert _levenshtein(a, b) == want, (a, b)


def test_editdist_dupes_crafted(ray_session, tmp_path):
    """A one-word edit is caught; an unrelated doc is not; the pair is
    reported once despite matching in many bands."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import editdist_dupes

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "hazy", 1)       # distance 1
    far = "completely different text about embeddings " * 8
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array([base, near, far]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = editdist_dupes(str(tmp_path), max_dist=5).to_pylist()
    assert got == [{"doc_a": 1, "doc_b": 2}]


def test_local_skyline_matches_bruteforce():
    """The vectorized block-skyline must equal NOT-EXISTS dominance on
    random data dense with ties and exact duplicates (duplicates
    dominate nothing — both must survive)."""
    import numpy as np
    import pyarrow as pa

    from opentelemetry_collector_symbolicator_ray.pipelines.analytics import (
        _local_skyline,
    )

    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(1, 60))
        qty = rng.integers(0, 6, size=n).astype("int64")   # small range => ties
        rev = rng.integers(0, 6, size=n).astype("int64")
        tbl = pa.table(
            {
                "l_partkey": pa.array(np.arange(n), type=pa.int64()),
                "total_qty": pa.array(qty, type=pa.int64()),
                "revenue_cents": pa.array(rev, type=pa.int64()),
            }
        )
        got = sorted(r["l_partkey"] for r in _local_skyline(tbl).to_pylist())
        want = [
            int(i)
            for i in range(n)
            if not any(
                qty[j] >= qty[i]
                and rev[j] >= rev[i]
                and (qty[j] > qty[i] or rev[j] > rev[i])
                for j in range(n)
            )
        ]
        assert got == want, (trial, got, want)


def test_kcore_matches_reference_peeling(ray_session):
    """Distributed k-core peeling must equal single-process peeling on
    the real sf0.001 graph for several k, including a k that empties
    the graph."""
    import duckdb

    from opentelemetry_collector_symbolicator_ray.pipelines.analytics import (
        copurchase_kcore,
    )

    edges = duckdb.sql("""
        WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')),
        e AS (SELECT DISTINCT a.l_partkey u, b.l_partkey v
              FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
                                  AND a.l_partkey < b.l_partkey)
        SELECT u, v FROM e
    """).fetchall()

    def reference_kcore(k):
        es = set(map(tuple, edges))
        while True:
            deg = {}
            for u, v in es:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            drop = {n for n, d in deg.items() if d < k}
            if not drop:
                break
            es = {(u, v) for u, v in es if u not in drop and v not in drop}
            if not es:
                break
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        return dict(sorted(deg.items()))

    for k in (2, 6, 10_000):
        got = {
            r["node"]: r["core_deg"]
            for r in copurchase_kcore("/root/testdata/sf0.001", k=k).to_pylist()
        }
        assert got == reference_kcore(k), k


def test_near_dedup_keep_distributed_dup_free_corpus(ray_session, tmp_path):
    """A corpus with NO near-duplicates must pass through cc='distributed'
    unharmed (an empty pair set previously crashed the anti-join with
    the schema-less empty-partition ArrowInvalid)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines.dedup import (
        connected_components,
        near_dedup_keep,
    )
    import ray.data as rd

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta gamma delta epsilon",
                        "completely different words in here",
                        "third unrelated document text body",
                    ]
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    kept = [r["doc_id"] for r in near_dedup_keep(str(tmp_path), cc="distributed").take_all()]
    assert kept == [1, 2, 3]

    empty = rd.from_arrow(
        pa.table(
            {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())}
        )
    )
    assert connected_components(empty).take_all() == []


def test_bloom_semijoin_empty_small_side(ray_session):
    """A priority matching NO orders returns an empty typed table
    instead of feeding a fully-empty side into the hash join."""
    from opentelemetry_collector_symbolicator_ray.pipelines.analytics import (
        bloom_semijoin_revenue,
    )

    out = bloom_semijoin_revenue("/root/testdata/sf0.001", priority="NO-SUCH-PRIORITY")
    assert out.num_rows == 0
    assert out.column_names == ["l_returnflag", "n_rows", "revenue_cents"]


def test_pagerank_driver_mode_equals_distributed(ray_session):
    """The driver-local integer PageRank loop must be bit-identical to
    the distributed iteration (scatter-adds commute; all-int math)."""
    from opentelemetry_collector_symbolicator_ray.pipelines.analytics import (
        purchase_graph_pagerank,
    )

    sf = "/root/testdata/sf0.001"
    a = purchase_graph_pagerank(sf, iterations=4, mode="driver")
    b = purchase_graph_pagerank(sf, iterations=4, mode="distributed")
    assert a.equals(b)


def test_cms_overestimates_and_tightens_with_width(ray_session):
    """CMS point estimates are >= exact by construction (tested at a
    tiny width that forces collisions) and exact at a width with
    negligible collision mass."""
    from opentelemetry_collector_symbolicator_ray.pipelines.analytics import (
        cms_user_counts,
    )

    sf = "/root/testdata/sf0.001"
    tight = cms_user_counts(sf, width=8, depth=4).to_pylist()
    assert all(r["cms_estimate"] >= r["exact_n"] for r in tight)
    assert any(r["cms_estimate"] > r["exact_n"] for r in tight)  # collisions real
    wide = cms_user_counts(sf, width=1 << 14, depth=4).to_pylist()
    assert all(r["cms_estimate"] == r["exact_n"] for r in wide)


def test_top_eigvec_matches_numpy_eigh(ray_session):
    """Power iteration on the exact distributed covariance must align
    with numpy's dense eigendecomposition: unit norm, top eigenvalue,
    |cosine| ~ 1."""
    import numpy as np

    from opentelemetry_collector_symbolicator_ray.pipelines.similarity import (
        embedding_covariance,
        embedding_top_eigvec,
    )

    sf = "/root/testdata/sf0.001"
    out = embedding_top_eigvec(sf).to_pylist()
    v = np.array([r["component"] for r in out])
    lam = out[0]["eigenvalue"]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9

    rows = embedding_covariance(sf).to_pylist()
    d = max(r["j"] for r in rows) + 1
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    evals, evecs = np.linalg.eigh(C)
    assert abs(lam - evals[-1]) < 1e-6 * max(1.0, abs(evals[-1]))
    assert abs(abs(v @ evecs[:, -1]) - 1.0) < 1e-6
