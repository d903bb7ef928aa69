"""Sequence packing + weighted-mix sampling invariants (the ops whose
semantics the SQL oracle can't fully pin: greedy bin state is
iterative, so the packing contract is asserted against a reference
single-process implementation here)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_symbolicator_ray.pipelines.dedup import _md5_lower64

SF = "/root/testdata/sf0.001"


def test_pack_sequences_invariants(ray_session):
    from opentelemetry_collector_symbolicator_ray.pipelines.text import pack_sequences

    budget = 256
    rows = pack_sequences(SF, budget=budget).take_all()

    # every document appears exactly once
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 500

    # no pack exceeds the budget unless it is a single oversized doc
    by_pack: dict[int, list[dict]] = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pack, members in by_pack.items():
        total = sum(m["n_tokens"] for m in members)
        if total > budget:
            assert len(members) == 1, f"pack {pack} overflows with {len(members)} docs"

    # pack_pos is the exclusive prefix sum of the pack's member sizes
    for members in by_pack.values():
        members = sorted(members, key=lambda m: m["pack_pos"])
        running = 0
        for m in members:
            assert m["pack_pos"] == running
            running += m["n_tokens"]

    # packing actually packs: far fewer bins than docs at this budget
    assert len(by_pack) < 500 / 2


def test_pack_sequences_matches_reference_and_is_deterministic(ray_session):
    """The distributed assignment must equal a single-process greedy
    first-fit over the same (partition, doc_id-order) layout — i.e. the
    result is a pure function of content, not of Ray block boundaries."""
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines.text import pack_sequences

    budget, P = 256, 32
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = sorted(
        (int(i), len(t.split(" ")))
        for i, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    expect: dict[int, tuple[int, int]] = {}
    for part in range(P):
        bins: list[tuple[int, int]] = []
        next_bin = 0
        for doc_id, t in docs:
            if _md5_lower64(str(doc_id)) % P != part:
                continue
            placed = False
            for bi, (b_id, used) in enumerate(bins):
                if used + t <= budget:
                    expect[doc_id] = ((part << 32) | b_id, used)
                    bins[bi] = (b_id, used + t)
                    placed = True
                    break
            if not placed:
                expect[doc_id] = ((part << 32) | next_bin, 0)
                bins.append((next_bin, t))
                next_bin += 1
            bins = [(b, u) for b, u in bins if budget - u > 0]

    got = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"])
        for r in pack_sequences(SF, budget=budget, num_partitions=P).take_all()
    }
    assert got == expect

    again = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"])
        for r in pack_sequences(SF, budget=budget, num_partitions=P).take_all()
    }
    assert again == got


def test_weighted_lang_sample_rates(ray_session):
    """Higher-threshold languages keep more; a zeroed language keeps
    nothing; sample is a subset of the unweighted population."""
    from opentelemetry_collector_symbolicator_ray.pipelines.text import (
        weighted_lang_sample,
    )

    rows = weighted_lang_sample(SF).take_all()
    by_lang: dict[str, int] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert by_lang.get("en", 0) > by_lang.get("zh", 0)

    none_kept = weighted_lang_sample(SF, rates={"en": "00"}).take_all()
    assert none_kept == []

    all_en = weighted_lang_sample(SF, rates={"en": "ff"}).take_all()
    import duckdb

    n_en = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet') WHERE lang='en'"
    ).fetchone()[0]
    # "ff" keeps every md5 whose first byte < 0xff (255/256 of docs)
    assert len(all_en) == pytest.approx(n_en, abs=3)
    assert all(r["lang"] == "en" for r in all_en)


def test_heavy_hitters_truncating_sketch_equals_exact(ray_session, tmp_path):
    """Force per-block MG truncation (capacity far below per-block
    vocabulary) and assert the checked two-pass sketch still returns the
    exact top-k; also pin the proven-exact path against the fallback."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines import text

    # skewed synthetic corpus: 'hot0..hot4' dominate, long uniform tail
    rows = []
    for i in range(200):
        words = [f"hot{j}" for j in range(5) for _ in range(10 - j)]
        words += [f"tail{i}_{t}" for t in range(30)]
        rows.append(" ".join(words))
    d = tmp_path / "hh"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(200), type=pa.int64()),
                  "text": pa.array(rows, type=pa.string()),
                  "lang": pa.array(["en"] * 200), "source": pa.array(["s"] * 200),
                  "n_chars": pa.array([len(r) for r in rows], type=pa.int64())}),
        d / "documents.parquet",
    )
    exact = text._exact_top_words(str(d), 8)
    sketched = text.heavy_hitter_words(str(d), k=8, capacity=16)
    assert sketched.equals(exact)
    # capacity so small the bound swamps the k-th count -> fallback path
    fb = text.heavy_hitter_words(str(d), k=8, capacity=2)
    assert fb.equals(exact)


def test_bloom_semijoin_exact_under_heavy_false_positives(ray_session):
    """A 64-bit Bloom filter (near-total false-positive saturation) must
    not change the semi-join result — the exact hash join removes every
    false survivor."""
    from opentelemetry_collector_symbolicator_ray.pipelines import analytics

    sf = "/root/testdata/sf0.001"
    tight = analytics.bloom_semijoin_revenue(sf, nbits=64, nhashes=1)
    normal = analytics.bloom_semijoin_revenue(sf)
    assert tight.equals(normal)


def test_training_export_deterministic_and_partitioned(ray_session, tmp_path):
    """Two runs of the export land identical manifests, and the output
    is hive-partitioned per shard so a loader can read shards
    independently."""
    import os

    from opentelemetry_collector_symbolicator_ray.pipelines import export

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "exp")
    m1 = export.export_training_shards(sf, out)
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shard_dirs) == m1.num_rows
    m2 = export.export_training_shards(sf, out)
    assert m1.equals(m2)
    assert int(m1.column("n_docs").to_pylist()[0]) > 0


def test_token_budget_mix_bucket_invariance(ray_session):
    """The distributed prefix sum must be exact regardless of bucket
    granularity: a 4-doc bucket layout (many buckets, offsets dominate)
    must equal the default 1024-doc layout, and every language's kept
    set must be the doc_id-ordered prefix within budget."""
    from opentelemetry_collector_symbolicator_ray.pipelines.text import (
        token_budget_mix,
    )

    sf = "/root/testdata/sf0.001"
    a = token_budget_mix(sf, budget=5000, bucket_size=4).to_pandas()
    b = token_budget_mix(sf, budget=5000, bucket_size=1024).to_pandas()
    assert a.equals(b), "bucket size changed the kept set"
    for lang, grp in a.groupby("lang"):
        grp = grp.sort_values("doc_id")
        assert (grp["cum_tokens"] == grp["n_tokens"].cumsum()).all()
        assert grp["cum_tokens"].iloc[-1] <= 5000


def test_bloom_antijoin_exact_under_heavy_false_positives(ray_session):
    """The Q22-style anti-join's Bloom prefilter only routes rows between
    the shuffle-free 'definite non-orderer' path and the exact left_anti
    join — a saturated 64-bit filter (everything looks 'maybe') must
    yield the identical result."""
    from opentelemetry_collector_symbolicator_ray.pipelines import analytics

    sf = "/root/testdata/sf0.001"
    tight = analytics.customers_without_orders(sf, nbits=64, nhashes=1)
    normal = analytics.customers_without_orders(sf)
    assert tight.equals(normal)
    assert normal.num_rows > 0


def test_bpe_train_matches_single_process_reference(ray_session):
    """The distributed pair-count/merge loop must learn exactly the
    merge list a single-process BPE (dict-of-words) learns: same pairs,
    same order, same freqs — ties broken by (count DESC, left, right)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines.text import bpe_train

    SF = "/root/testdata/sf0.001"
    n_merges = 25

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column("text").to_pylist()
    wc = Counter()
    for t in texts:
        wc.update(t.split(" "))
    vocab = {w: (tuple(w) + ("</w>",), f) for w, f in wc.items()}
    expect = []
    for rank in range(n_merges):
        pc_ = Counter()
        for syms, f in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] += f
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        if freq < 2:
            break
        expect.append((rank, left, right, freq))
        merged = left + right
        new_vocab = {}
        for w, (syms, f) in vocab.items():
            i, new = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            new_vocab[w] = (tuple(new), f)
        vocab = new_vocab

    got = bpe_train(SF, n_merges=n_merges)
    got_rows = list(
        zip(
            got.column("rank").to_pylist(),
            got.column("left").to_pylist(),
            got.column("right").to_pylist(),
            got.column("pair_freq").to_pylist(),
        )
    )
    assert got_rows == expect
    assert len(got_rows) == n_merges  # corpus is rich enough to not early-stop

def test_bpe_encode_matches_single_process_reference(ray_session):
    """The distributed encode stage must reproduce, per document, the
    published GPT-2 BPE encode algorithm (merge ALL occurrences of the
    lowest-rank adjacent pair per sweep) applied with the trained merge
    list — and the trained-merge consistency invariant: a word that IS
    a training merge product encodes to few tokens."""
    import hashlib

    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines.text import (
        bpe_encode,
        bpe_train,
    )

    SF = "/root/testdata/sf0.001"
    n_merges = 25
    merges = bpe_train(SF, n_merges=n_merges)
    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(), merges.column("right").to_pylist())
        )
    }

    def ref_encode_word(word):
        syms = list(word) + ["</w>"]
        while True:
            pairs = {(a, b) for a, b in zip(syms, syms[1:])}
            ranked = [p for p in pairs if p in ranks]
            if not ranked:
                return syms
            a, b = min(ranked, key=lambda p: ranks[p])
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    expect = {}
    for doc_id, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        toks = []
        for w in t.split(" "):
            toks.extend(ref_encode_word(w))
        expect[doc_id] = (
            len(t.split(" ")),
            len(toks),
            hashlib.md5(" ".join(toks).encode()).hexdigest(),
        )

    got = bpe_encode(SF, merges=merges).take_all()
    assert len(got) == len(expect)
    for r in got:
        assert (r["n_words"], r["n_tokens"], r["token_digest"]) == expect[r["doc_id"]]
    # compression sanity: merges actually fire (tokens < raw chars+1)
    raw = sum(len(w) + 1 for t in tbl.column("text").to_pylist() for w in t.split(" "))
    assert sum(r["n_tokens"] for r in got) < raw


def test_bpe_train_driver_mode_equals_distributed(ray_session):
    """The auto-switch driver-local merge loop must reproduce the
    distributed iteration bit-for-bit (same tie-breaks, same stop)."""
    from opentelemetry_collector_symbolicator_ray.pipelines.text import bpe_train

    sf = "/root/testdata/sf0.001"
    a = bpe_train(sf, n_merges=12, mode="driver")
    b = bpe_train(sf, n_merges=12, mode="distributed")
    assert a.equals(b)
