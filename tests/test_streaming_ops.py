"""Edge-case tests for the streaming-shaped operators: deterministic
tie-breaking in cumulative windows and empty-input behavior."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def test_running_totals_timestamp_ties(ray_session, tmp_path):
    """Events sharing (user, ts) are ordered by event_id on BOTH sides —
    the cumulative sums agree row-for-row with the SQL window even when
    the sort key alone is ambiguous."""
    from opentelemetry_collector_symbolicator_ray.pipelines.streaming import (
        running_user_totals,
    )

    ts = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([5, 3, 4, 1, 2], type=pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 7], type=pa.int64()),
            "ts": pa.array([ts, ts, ts, ts + 10, ts], type=pa.timestamp("us")),
            "value": pa.array([1.11, 2.22, 3.33, 4.44, 5.55], type=pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = running_user_totals(str(tmp_path)).take_all()
    want = duckdb.sql(
        f"""SELECT event_id, user_id,
                   SUM(CAST(ROUND(value, 2) * 100 AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS running_cents
            FROM read_parquet('{tmp_path}/events.parquet') ORDER BY event_id"""
    ).fetchall()
    assert [(r["event_id"], r["user_id"], r["running_cents"]) for r in got] == want
    # ties resolved by event_id: 2 -> 3 -> 4 -> 5 accumulate in id order,
    # then event 1 (later ts) caps the total
    by_id = {r["event_id"]: r["running_cents"] for r in got}
    assert by_id[2] == 555
    assert by_id[3] == 555 + 222
    assert by_id[4] == 555 + 222 + 333
    assert by_id[5] == 555 + 222 + 333 + 111
    assert by_id[1] == 555 + 222 + 333 + 111 + 444


def test_windows_empty_events(ray_session, tmp_path):
    """Windowed aggregates over an empty events table produce empty,
    well-typed Datasets — no crash on the empty aggregate."""
    from opentelemetry_collector_symbolicator_ray.pipelines.streaming import (
        running_user_totals,
        tumbling_event_counts,
        user_sessions,
    )

    tbl = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.timestamp("us")),
            "value": pa.array([], type=pa.float64()),
            "event_type": pa.array([], type=pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    sf = str(tmp_path)
    assert tumbling_event_counts(sf).count() == 0
    assert user_sessions(sf).count() == 0
    assert running_user_totals(sf).count() == 0


def test_pii_redaction_planted(ray_session, tmp_path):
    """Planted emails/phones are replaced with typed placeholders and
    counted — and the result matches the SQL oracle patterns verbatim."""
    from opentelemetry_collector_symbolicator_ray.pipelines.text import (
        PII_EMAIL_PATTERN,
        PII_PHONE_PATTERN,
        pii_redact,
    )

    docs = [
        "contact me at alice.smith+x@example.org or bob@test.co today",
        "call 555-123-4567 or +1 555.123.4567 thanks",
        "clean document with no sensitive content at all",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    rows = {r["doc_id"]: r for r in pii_redact(str(tmp_path)).take_all()}
    assert rows[0]["n_emails"] == 2
    assert rows[0]["redacted"] == "contact me at <EMAIL> or <EMAIL> today"
    assert rows[1]["n_phones"] == 2
    assert "<PHONE>" in rows[1]["redacted"] and "4567" not in rows[1]["redacted"]
    assert rows[2]["redacted"] == docs[2]
    assert rows[2]["n_emails"] == 0 and rows[2]["n_phones"] == 0

    want = duckdb.sql(
        f"""SELECT doc_id,
                   regexp_replace(regexp_replace(text, '{PII_EMAIL_PATTERN}', '<EMAIL>', 'g'),
                                  '{PII_PHONE_PATTERN}', '<PHONE>', 'g') AS redacted
            FROM read_parquet('{tmp_path}/documents.parquet') ORDER BY doc_id"""
    ).fetchall()
    assert [(r[0], r[1]) for r in want] == [
        (i, rows[i]["redacted"]) for i in range(3)
    ]


def test_contamination_flags_overlap(ray_session, tmp_path):
    """Training docs sharing 3-grams with the eval slice are flagged
    with exact shared counts; disjoint docs are not."""
    from opentelemetry_collector_symbolicator_ray.pipelines.text import (
        eval_contamination,
    )

    eval_doc = "the quick brown fox jumps over the lazy dog"
    leaked = "here is the quick brown fox jumps text copied"  # shares 3 of the 3-grams +
    clean = "completely different words nothing shared whatsoever here today"
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 100, 101], type=pa.int64()),
            "text": pa.array([eval_doc, leaked, clean], type=pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = eval_contamination(str(tmp_path), eval_max_doc_id=20).take_all()
    assert [r["doc_id"] for r in out] == [100]
    # shared 3-grams: "the quick brown", "quick brown fox", "brown fox jumps"
    assert out[0]["shared_ngrams"] == 3


def _ts_table(rows, cols=("event_id", "user_id", "ts")):
    import pyarrow as pa

    arrays = {
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
    }
    return pa.table({c: arrays[c] for c in cols})


def test_asof_join_edges(ray_session):
    """Boundary semantics: equal timestamps MATCH (l.ts >= r.ts),
    left rows before any right row get nulls, keys with no right rows
    get nulls, and the greatest-not-exceeding right row wins."""
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_symbolicator_ray.pipelines.streaming import asof_join

    left = rd.from_arrow(_ts_table([
        (1, 7, 1000), (2, 7, 2000), (3, 7, 500),   # key 7
        (4, 9, 1000),                               # key 9: no rights
    ]))
    right_tbl = _ts_table([
        (101, 7, 1000),   # equal-ts: must match event 1
        (102, 7, 1500),   # most recent for event 2
        (103, 7, 99),     # too old for nothing (event 3 at 500 matches this)
    ])
    right = rd.from_arrow(right_tbl.rename_columns(["r_id", "user_id", "ts"]))
    out = asof_join(
        left, right, key="user_id", ts_col="ts", take={"r_id": "r_id"}
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    got = {int(e): (None if r != r else int(r)) for e, r in zip(out.event_id, out.r_id)}
    assert got == {1: 101, 2: 102, 3: 103, 4: None}


def test_range_join_counts_edges(ray_session):
    """Window is (ts - lookback, ts]: the left instant is included, the
    exact lookback edge is excluded; keys with no rights count 0."""
    import ray.data as rd

    from opentelemetry_collector_symbolicator_ray.pipelines.streaming import (
        range_join_counts,
    )

    left = rd.from_arrow(_ts_table([(1, 7, 1000), (2, 8, 1000)]))
    right = rd.from_arrow(_ts_table([
        (101, 7, 1000),  # == left instant -> counted
        (102, 7, 900),   # inside
        (103, 7, 800),   # == ts - lookback -> EXCLUDED (open lower bound)
        (104, 7, 1001),  # future -> excluded
    ]))
    out = range_join_counts(
        left, right, key="user_id", ts_col="ts", lookback_us=200, out_col="n"
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert dict(zip(out.event_id, out.n)) == {1: 2, 2: 0}


def test_grouped_hll_within_bound_of_exact(ray_session):
    """The grouped HyperLogLog user-count sketch must land within the
    small-range (linear-counting) error bound of the exact distinct
    count for every event type."""
    from opentelemetry_collector_symbolicator_ray.pipelines import analytics

    sf = "/root/testdata/sf0.001"
    approx = {
        r["event_type"]: r["approx_users"]
        for r in analytics.approx_distinct_users_by_type(sf).to_pylist()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in analytics.distinct_users_by_type(sf).to_pylist()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(2, int(0.05 * n)), (t, approx[t], n)


def test_quantile_selection_forced_refinement_matches_numpy(ray_session, tmp_path):
    """Drive the histogram-refinement selector through MULTIPLE rounds
    (tiny bins/tail_limit) on an adversarial distribution (heavy
    duplicates + clustered values) and pin it to numpy's linear
    interpolation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines import streaming

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [
            np.full(5000, 42.0),                      # heavy duplicate mass
            rng.normal(100.0, 0.001, 3000),           # tight cluster
            rng.uniform(-1e6, 1e6, 2000),             # wide tail
        ]
    )
    rng.shuffle(vals)
    d = tmp_path / "q"
    d.mkdir()
    pq.write_table(pa.table({"value": pa.array(vals, type=pa.float64())}),
                   d / "events.parquet")
    qs = (0.1, 0.5, 0.9, 0.99)
    t = streaming.global_value_quantiles(str(d), qs=qs, bins=8, tail_limit=16)
    got = dict(zip(t.column("q").to_pylist(), t.column("value").to_pylist()))
    for q in qs:
        expect = float(np.quantile(vals, q))
        key = f"p{int(round(q * 100))}"
        assert got[key] == expect, (q, got[key], expect)


def test_quantile_selection_all_duplicates(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines import streaming

    d = tmp_path / "dup"
    d.mkdir()
    pq.write_table(
        pa.table({"value": pa.array(np.full(1000, 3.14), type=pa.float64())}),
        d / "events.parquet",
    )
    t = streaming.global_value_quantiles(str(d), qs=(0.5,), bins=4, tail_limit=8)
    assert t.column("value").to_pylist() == [3.14]


def test_quantile_selection_ulp_adjacent_values(ray_session, tmp_path):
    """Two ULP-adjacent values straddling the rank: histogram bins can't
    separate them, so the no-shrink guard must hand the bracket to the
    tail pass instead of spinning."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_symbolicator_ray.pipelines import streaming

    a = 1.0
    b = float(np.nextafter(a, 2.0))
    vals = np.array([a] * 500 + [b] * 500)
    d = tmp_path / "ulp"
    d.mkdir()
    pq.write_table(pa.table({"value": pa.array(vals, type=pa.float64())}),
                   d / "events.parquet")
    t = streaming.global_value_quantiles(str(d), qs=(0.25, 0.5, 0.75), bins=4, tail_limit=8)
    got = dict(zip(t.column("q").to_pylist(), t.column("value").to_pylist()))
    for q in (0.25, 0.5, 0.75):
        assert got[f"p{int(round(q*100))}"] == float(np.quantile(vals, q)), q


def test_asof_join_hot_key_skew(ray_session):
    """One user holds 95% of both sides (the hot-debug-id shape): the
    per-key group must still compute the correct greatest-not-exceeding
    match for every left row, verified against a numpy brute force."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from opentelemetry_collector_symbolicator_ray.pipelines.streaming import asof_join

    rng = np.random.RandomState(13)
    n_hot, n_cold = 20000, 50
    l_users = np.concatenate([np.full(n_hot, 7), rng.randint(100, 110, n_cold)])
    l_ts = rng.randint(0, 1_000_000, len(l_users)).astype("int64")
    r_users = np.concatenate([np.full(n_hot // 2, 7), rng.randint(100, 110, n_cold)])
    r_ts = rng.randint(0, 1_000_000, len(r_users)).astype("int64")

    left = rd.from_arrow(pa.table({
        "event_id": pa.array(np.arange(len(l_users)), type=pa.int64()),
        "user_id": pa.array(l_users, type=pa.int64()),
        "ts": pa.array(l_ts, type=pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "r_id": pa.array(np.arange(len(r_users)), type=pa.int64()),
        "user_id": pa.array(r_users, type=pa.int64()),
        "ts": pa.array(r_ts, type=pa.timestamp("us")),
    }))
    out = (
        asof_join(left, right, key="user_id", ts_col="ts", take={"r_id": "matched_r"})
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(out) == len(l_users)
    # brute force: the matched right row's ts must be the max right ts
    # <= the left ts for that key (ids may tie on ts; ts must not)
    got = out["matched_r"].to_numpy()
    for i in rng.choice(len(l_users), 300, replace=False):
        m = r_ts[(r_users == l_users[i]) & (r_ts <= l_ts[i])]
        if not len(m):
            assert got[i] != got[i], i  # NaN
        else:
            assert r_ts[int(got[i])] == m.max(), i


def test_watermarked_counts_drops_late_events(ray_session, tmp_path):
    """A disordered log (the driver tables are perfectly time-ordered, so
    the drop path never fires there): events whose ts falls more than
    `lateness` behind the running max of STRICTLY EARLIER arrivals are
    dropped; ties with the watermark survive; and the result is identical
    at bucket_size 1024, 3 and 1 (bucketing is an implementation detail,
    not a semantic)."""
    import numpy as np

    from opentelemetry_collector_symbolicator_ray.pipelines.streaming import (
        watermarked_window_counts,
    )

    H = 3_600_000_000  # 1h in us
    base = 1_700_000_000_000_000
    # arrival order = event_id; crafted lags:
    #   id 1: ts base           (first arrival, always kept)
    #   id 2: ts base+3h        (advances watermark to base+2h)
    #   id 3: ts base+1h        (late by 2h-lateness -> DROPPED at lateness=1h)
    #   id 4: ts base+2h        (exactly AT the watermark -> kept, >= is not <)
    #   id 5: ts base-5h        (very late -> DROPPED)
    #   id 6: ts base+4h        (kept, advances watermark)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "ts": pa.array(
                [base, base + 3 * H, base + H, base + 2 * H, base - 5 * H, base + 4 * H],
                type=pa.timestamp("us"),
            ),
            "event_type": pa.array(["a", "a", "a", "b", "b", "a"], type=pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    # python replica over arrival order
    kept = []
    prev_max = None
    for eid, ts_us, ty in sorted(
        zip(
            tbl.column("event_id").to_pylist(),
            [t.value if hasattr(t, "value") else t for t in pa.compute.cast(tbl.column("ts"), pa.int64()).to_pylist()],
            tbl.column("event_type").to_pylist(),
        )
    ):
        if prev_max is None or ts_us >= prev_max - H:
            kept.append((ts_us // H, ty))
        prev_max = ts_us if prev_max is None else max(prev_max, ts_us)
    expect = {}
    for w, ty in kept:
        expect[(w, ty)] = expect.get((w, ty), 0) + 1
    assert len(kept) == 4  # ids 1, 2, 4, 6 — the crafted drop set

    results = {}
    for bs in (1024, 3, 1):
        got = {
            (r["window_id"], r["event_type"]): r["n_events"]
            for r in watermarked_window_counts(
                str(tmp_path), lateness_us=H, window_us=H, bucket_size=bs
            ).take_all()
        }
        results[bs] = got
        assert got == expect, f"bucket_size={bs}: {got} != {expect}"
    assert results[1024] == results[3] == results[1]


def test_pattern_match_counts_crafted(ray_session, tmp_path):
    """Non-overlapping 'vc+p' semantics on a crafted log: ties in ts
    resolve by event_id, physical row order is shuffled, and matchless
    users are excluded from the output."""
    import numpy as np

    from opentelemetry_collector_symbolicator_ray.pipelines.streaming import (
        pattern_match_counts,
    )

    t0 = 1_700_000_000_000_000
    # user 1: v c p v c c p  -> 2 matches
    # user 2: v c v c p      -> 1 match (leftmost-nonoverlap starts at idx 2)
    # user 3: c p v          -> 0 matches (excluded)
    # user 4: v c p with ALL ts equal -> order comes from event_id alone
    rows = []
    for i, ty in enumerate(["view", "click", "purchase", "view", "click", "click", "purchase"]):
        rows.append((100 + i, 1, t0 + i, ty))
    for i, ty in enumerate(["view", "click", "view", "click", "purchase"]):
        rows.append((200 + i, 2, t0 + i, ty))
    for i, ty in enumerate(["click", "purchase", "view"]):
        rows.append((300 + i, 3, t0 + i, ty))
    for i, ty in enumerate(["view", "click", "purchase"]):
        rows.append((400 + i, 4, t0, ty))  # identical ts: event_id breaks the tie
    rng = np.random.default_rng(7)
    rows = [rows[i] for i in rng.permutation(len(rows))]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = {r["user_id"]: r["n_matches"] for r in pattern_match_counts(str(tmp_path)).take_all()}
    assert got == {1: 2, 2: 1, 4: 1}


def test_zorder_clusters_prune_better_than_time_clustering(ray_session):
    """The point of Z-ordering: for a 2-D box query (user range x time
    range), z-code clusters intersect the box in fewer clusters than
    pure time-ordered clustering of the same granularity."""
    import numpy as np

    from opentelemetry_collector_symbolicator_ray.pipelines.streaming import (
        US_PER_HOUR,
        zorder_codes,
    )

    sf = "/root/testdata/sf0.001"
    rows = zorder_codes(sf).take_all()
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"])
    user = dict(zip(ev.column("event_id").to_pylist(), ev.column("user_id").to_pylist()))
    ts_us = pa.compute.cast(ev.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
    hour = dict(
        zip(ev.column("event_id").to_pylist(), (ts_us // US_PER_HOUR).tolist())
    )
    users = np.array([user[r["event_id"]] for r in rows])
    hours = np.array([hour[r["event_id"]] for r in rows])
    zcode = np.array([r["zcode"] for r in rows])
    # adaptive granularity: the coarsest shift that still yields >=32
    # clusters on this corpus (sf0.001 spans few user/hour bits)
    for shift in range(24, -1, -1):
        zc = zcode >> shift
        if len(np.unique(zc)) >= 32:
            break

    u_lo, u_hi = np.percentile(users, [30, 70])
    h_lo, h_hi = np.percentile(hours, [30, 70])
    box = (users >= u_lo) & (users <= u_hi) & (hours >= h_lo) & (hours <= h_hi)
    assert box.sum() > 0

    # same cluster-count granularity for the time-ordered baseline
    n_clusters = len(np.unique(zc))
    t_order = np.argsort(hours, kind="stable")
    t_cluster = np.empty(len(rows), dtype=np.int64)
    t_cluster[t_order] = np.arange(len(rows)) * n_clusters // len(rows)

    z_touched = len(np.unique(zc[box]))
    t_touched = len(np.unique(t_cluster[box]))
    # time clustering must scan every time-slice cluster inside the time
    # range regardless of user filter; z-order prunes on both dims
    assert z_touched < t_touched, (z_touched, t_touched)
