"""Relational demonstrations of the engine's wide operators (groupby
aggregate with map-side partials, broadcast join, sort/limit top-k) over
the driver's TPC-H-ish tables — each with an exact DuckDB oracle.

Float sums are emitted as integer cents (round-to-2-decimals, x100,
cast to int64) on BOTH sides so the driver's value-hash comparison is
fully immune to summation-order / rounding-implementation ULP drift.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum


def _cents(v) -> int:
    """Shared integer-cents conversion (round-to-2dp, x100, int64) — ONE
    implementation of the oracle-shared rounding rule so it cannot drift
    per query."""
    return int(round(round(float(v), 2) * 100))


def _cents_array(col) -> pa.Array:
    """Vectorized twin of ``_cents`` (Arrow kernels, no Python loop —
    this runs per-ROW in fact-stream stages like the Q17 join-back, not
    just on aggregate outputs).  Bit-identical to the scalar path on
    2-decimal inputs and on aggregate sums (verified over 200k samples
    + the full oracle-parity gate); the two can only diverge within an
    ULP of a half-cent boundary at ≥3 decimals, which neither the
    generated tables nor float sums of 2dp values produce."""
    x = pc.round(pc.cast(col, pa.float64()), ndigits=2)
    return pc.cast(pc.round(pc.multiply(x, pa.scalar(100.0)), ndigits=0), pa.int64())


def events_by_type(sf_dir: str) -> pa.Table:
    """groupby(event_type): count + sum(value) (rounded)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    agg = ds.groupby("event_type").aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="total_value")
    )
    rows = sorted(agg.take_all(), key=lambda r: r["event_type"])
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows]),
            "n_events": pa.array([int(r["n_events"]) for r in rows], type=pa.int64()),
            "total_value_cents": pa.array(
                [_cents(r["total_value"]) for r in rows],
                type=pa.int64(),
            ),
        }
    )


def lineitem_pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-style pricing summary: groupby(returnflag, linestatus)
    with sums pre-aggregated map-side by Ray's groupby."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def project(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice")
        disc = batch.column("l_discount")
        disc_price = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "l_quantity": batch.column("l_quantity"),
                "l_extendedprice": price,
                "disc_price": disc_price,
            }
        )

    agg = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
    )
    rows = sorted(agg.take_all(), key=lambda r: (r["l_returnflag"], r["l_linestatus"]))
    return pa.table(
        {
            "l_returnflag": pa.array([r["l_returnflag"] for r in rows]),
            "l_linestatus": pa.array([r["l_linestatus"] for r in rows]),
            "sum_qty_cents": pa.array(
                [_cents(r["sum_qty"]) for r in rows], type=pa.int64()
            ),
            "sum_base_price_cents": pa.array(
                [_cents(r["sum_base_price"]) for r in rows],
                type=pa.int64(),
            ),
            "sum_disc_price_cents": pa.array(
                [_cents(r["sum_disc_price"]) for r in rows],
                type=pa.int64(),
            ),
            "count_order": pa.array([int(r["count_order"]) for r in rows], type=pa.int64()),
        }
    )


def top_customers(sf_dir: str, limit: int = 10) -> pa.Table:
    """Top-k customers by total spend: groupby + distributed sort+limit
    over the naked custkey — the name column never enters the shuffle.
    The per-customer aggregate is keyed on ``o_custkey`` alone (an int64
    a tenth the width of (key, name) pairs), the top-k rows are taken
    with a distributed sort+limit, and names attach AFTER the limit via
    one vectorized lookup against the driver-held dimension table — a
    k-row operation instead of a fact-stream-wide join."""
    customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).take_all()
    cust_keys = pa.array([r["c_custkey"] for r in customers], type=pa.int64())
    cust_names = pa.array([r["c_name"] for r in customers], type=pa.string())

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    agg = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_spend"), Count(alias_name="n_orders")
    )

    # customer-count-sized aggregate: cents in a streaming stage, top-k
    # via distributed sort+limit — only `limit` rows reach the driver
    def to_cents(batch: pa.Table) -> pa.Table:
        cents = _cents_array(batch.column("total_spend"))
        return pa.table(
            {
                "c_custkey": pc.cast(batch.column("o_custkey"), pa.int64()),
                "total_spend_cents": cents,
                "n_orders": pc.cast(batch.column("n_orders"), pa.int64()),
            }
        )

    rows = (
        agg.map_batches(to_cents, batch_format="pyarrow")
        .sort(["total_spend_cents", "c_custkey"], descending=[True, False])
        .limit(limit)
        .take_all()
    )
    keys = pa.array([r["c_custkey"] for r in rows], type=pa.int64())
    idx = pc.index_in(keys, value_set=cust_keys)
    names = pc.fill_null(pc.take(cust_names, idx), "")
    return pa.table(
        {
            "c_custkey": keys,
            "c_name": names,
            "total_spend_cents": pa.array(
                [int(r["total_spend_cents"]) for r in rows], type=pa.int64()
            ),
            "n_orders": pa.array([int(r["n_orders"]) for r in rows], type=pa.int64()),
        }
    )


def error_events_by_user(sf_dir: str) -> "ray.data.Dataset":
    """Predicate + projection pushdown at the read: only the 'error'
    rows of the two needed columns leave storage (read_parquet row
    filter), then a small groupby."""
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "value"],
        filter=pads.field("event_type") == "error",
    )
    agg = ds.groupby("user_id").aggregate(
        Count(alias_name="n_errors"), Sum("value", alias_name="total_value")
    )

    # user-count-sized result: cents in a streaming stage, distributed
    # sort, returned as a Dataset
    def to_cents(batch: pa.Table) -> pa.Table:
        cents = _cents_array(batch.column("total_value"))
        return pa.table(
            {
                "user_id": pc.cast(batch.column("user_id"), pa.int64()),
                "n_errors": pc.cast(batch.column("n_errors"), pa.int64()),
                "total_value_cents": cents,
            }
        )

    from .streaming import _compact_sort

    return _compact_sort(agg.map_batches(to_cents, batch_format="pyarrow"), "user_id")


def label_stratified_sample(sf_dir: str, per_label: int = 5) -> pa.Table:
    """Deterministic stratified sampling: ``per_label`` vectors per
    label, chosen by content-hash order (md5 of the id string) so the
    sample is stable under re-partitioning — the per-key quota shape is
    ``groupby(label).map_groups``."""
    import hashlib

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"])

    def take_sample(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_pylist()
        picked = sorted(ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))[:per_label]
        label = group.column("label")[0].as_py()
        picked = sorted(picked)
        return pa.table(
            {
                "label": pa.array([int(label)] * len(picked), type=pa.int32()),
                "vec_id": pa.array(picked, type=pa.int64()),
            }
        )

    out = ds.groupby("label").map_groups(take_sample, batch_format="pyarrow")
    rows = sorted(out.take_all(), key=lambda r: (r["label"], r["vec_id"]))
    return pa.table(
        {
            "label": pa.array([int(r["label"]) for r in rows], type=pa.int32()),
            "vec_id": pa.array([int(r["vec_id"]) for r in rows], type=pa.int64()),
        }
    )


def label_text_stats(sf_dir: str, num_partitions: int = 8) -> pa.Table:
    """Distributed hash join of two big tables (``Dataset.join``):
    documents x embeddings on doc_id == vec_id, then a per-label
    aggregate.  The text column is projected down to its word count
    BEFORE the join, so the join shuffle moves two ints per row instead
    of the document body — the projection-before-shuffle rule."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_counts(batch: pa.Table) -> pa.Table:
        n_words = pc.list_value_length(pc.split_pattern(batch.column("text"), " "))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pc.cast(n_words, pa.int64()),
            }
        )

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"])
    joined = docs.map_batches(to_counts, batch_format="pyarrow").join(
        emb, join_type="inner", num_partitions=num_partitions, on=("doc_id",), right_on=("vec_id",)
    )
    agg = joined.groupby("label").aggregate(
        Count(alias_name="n_docs"), Sum("n_words", alias_name="total_words")
    )
    rows = sorted(agg.take_all(), key=lambda r: r["label"])
    return pa.table(
        {
            "label": pa.array([int(r["label"]) for r in rows], type=pa.int32()),
            "n_docs": pa.array([int(r["n_docs"]) for r in rows], type=pa.int64()),
            "total_words": pa.array([int(r["total_words"]) for r in rows], type=pa.int64()),
        }
    )


def top_events_per_user(sf_dir: str, k: int = 2) -> "ray.data.Dataset":
    """Per-key top-k (the grouped-reorder primitive): each user's k
    highest-value events via ``groupby(user).map_groups`` with the
    deterministic (value desc, ts, event_type) ordering the SQL oracle
    uses."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "value"]
    )

    def topk(group: pa.Table) -> pa.Table:
        vals = group.column("value").to_numpy(zero_copy_only=False)
        us = pc.cast(group.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_pylist()
        order = sorted(range(len(vals)), key=lambda i: (-vals[i], us[i], types[i]))[:k]
        user = group.column("user_id")[0].as_py()
        return pa.table(
            {
                "user_id": pa.array([int(user)] * len(order), type=pa.int64()),
                "rank": pa.array(list(range(1, len(order) + 1)), type=pa.int64()),
                "event_type": pa.array([types[i] for i in order], type=pa.string()),
                "value_cents": pa.array(
                    [_cents(vals[i]) for i in order],
                    type=pa.int64(),
                ),
            }
        )

    # user-count-sized result: stream it (distributed sort, no
    # driver-side materialization)
    from .streaming import _compact_sort

    return _compact_sort(
        ds.groupby("user_id").map_groups(topk, batch_format="pyarrow"),
        ["user_id", "rank"],
    )


def orders_by_region(sf_dir: str) -> pa.Table:
    """TPC-H Q5-style multi-join rollup: orders -> customer -> nation ->
    region, grouped by region name.  Ray shape: the three DIMENSION
    tables (customer/nation/region — small side at any scale) are
    pre-joined into ONE custkey -> region-name lookup table on the
    driver, ray.put once, and hash-joined against each streaming orders
    batch with the vectorized ``pa.Table.join`` kernel; the fact table
    (orders) never shuffles."""
    customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).take_all()
    nations = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).take_all()
    regions = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).take_all()
    region_by_key = {r["r_regionkey"]: r["r_name"] for r in regions}
    region_by_nation = {n["n_nationkey"]: region_by_key[n["n_regionkey"]] for n in nations}
    lookup = pa.table(
        {
            "o_custkey": pa.array([c["c_custkey"] for c in customers], type=pa.int64()),
            "r_name": pa.array(
                [region_by_nation[c["c_nationkey"]] for c in customers], type=pa.string()
            ),
        }
    )
    lookup_ref = ray.put(lookup)

    def join(batch: pa.Table) -> pa.Table:
        joined = batch.join(ray.get(lookup_ref), keys="o_custkey", join_type="inner")
        return pa.table(
            {
                "r_name": joined.column("r_name"),
                "o_totalprice": joined.column("o_totalprice"),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    agg = (
        orders.map_batches(join, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"))
    )
    rows = sorted(agg.take_all(), key=lambda r: r["r_name"])
    return pa.table(
        {
            "r_name": pa.array([r["r_name"] for r in rows]),
            "n_orders": pa.array([int(r["n_orders"]) for r in rows], type=pa.int64()),
            "total_cents": pa.array(
                [_cents(r["total"]) for r in rows],
                type=pa.int64(),
            ),
        }
    )


def supplier_nation_stats(sf_dir: str) -> pa.Table:
    """Suppliers per nation (dimension-dimension join): supplier joined
    to nation via the broadcast lookup, grouped by nation name with
    count + account-balance sum."""
    nations = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    lookup = pa.table(
        {
            "s_nationkey": pa.array(
                [n["n_nationkey"] for n in nations], type=pa.int32()
            ),
            "n_name": pa.array([n["n_name"] for n in nations], type=pa.string()),
        }
    )
    lookup_ref = ray.put(lookup)

    def join(batch: pa.Table) -> pa.Table:
        joined = batch.join(ray.get(lookup_ref), keys="s_nationkey", join_type="inner")
        return pa.table(
            {"n_name": joined.column("n_name"), "s_acctbal": joined.column("s_acctbal")}
        )

    suppliers = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )
    agg = (
        suppliers.map_batches(join, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("s_acctbal", alias_name="total"))
    )
    rows = sorted(agg.take_all(), key=lambda r: r["n_name"])
    return pa.table(
        {
            "n_name": pa.array([r["n_name"] for r in rows]),
            "n_suppliers": pa.array([int(r["n_suppliers"]) for r in rows], type=pa.int64()),
            "acctbal_cents": pa.array(
                [_cents(r["total"]) for r in rows],
                type=pa.int64(),
            ),
        }
    )


def shipping_priority(sf_dir: str, limit: int = 10) -> pa.Table:
    """TPC-H Q3-style FACT-FACT join: lineitem x orders on l_orderkey —
    both sides are fact tables, so this is the one join class broadcast
    can't serve.  Ray shape: a true distributed hash join
    (``Dataset.join``) with projection pushed to the reads and the
    date predicates pushed to the parquet scan (Q3's
    ``o_orderdate < cutoff < l_shipdate``, row-group pruning before any
    bytes ship), then groupby + top-k by revenue.  The shuffle moves
    only (orderkey, revenue-term) and (orderkey, date, priority) —
    never whole rows."""
    import datetime

    import pyarrow.dataset as pads

    cutoff = datetime.datetime(1998, 1, 1)
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > pa.scalar(cutoff),
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table({"l_orderkey": batch.column("l_orderkey"), "revenue": rev})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < pa.scalar(cutoff),
    )

    def project_orders(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "o_date_us": pc.cast(batch.column("o_orderdate"), pa.int64()),
                "o_orderpriority": batch.column("o_orderpriority"),
            }
        )

    joined = lineitem.map_batches(revenue, batch_format="pyarrow").join(
        orders.map_batches(project_orders, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    agg = joined.groupby(["l_orderkey", "o_date_us", "o_orderpriority"]).aggregate(
        Sum("revenue", alias_name="revenue")
    )

    # the per-order aggregate is order-count-sized: convert to cents in
    # a streaming stage and take the top-k with a DISTRIBUTED
    # sort+limit — the driver only ever sees `limit` rows
    def to_cents(batch: pa.Table) -> pa.Table:
        cents = _cents_array(batch.column("revenue"))
        return pa.table(
            {
                "l_orderkey": pc.cast(batch.column("l_orderkey"), pa.int64()),
                "o_date_us": pc.cast(batch.column("o_date_us"), pa.int64()),
                "o_orderpriority": batch.column("o_orderpriority"),
                "revenue_cents": cents,
            }
        )

    rows = (
        agg.map_batches(to_cents, batch_format="pyarrow")
        .sort(["revenue_cents", "l_orderkey"], descending=[True, False])
        .limit(limit)
        .take_all()
    )
    return pa.table(
        {
            "l_orderkey": pa.array([r["l_orderkey"] for r in rows], type=pa.int64()),
            "o_date_us": pa.array([int(r["o_date_us"]) for r in rows], type=pa.int64()),
            "o_orderpriority": pa.array([r["o_orderpriority"] for r in rows]),
            "revenue_cents": pa.array([int(r["revenue_cents"]) for r in rows], type=pa.int64()),
        }
    )


def revenue_forecast(sf_dir: str) -> pa.Table:
    """TPC-H Q6-style pure filter + aggregate — the predicate-pushdown
    showcase: discount/quantity predicates evaluate at the parquet scan
    (row-group pruning at scale), only two columns leave storage, and a
    single global sum comes back."""
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=(
            (pads.field("l_discount") >= 0.05)
            & (pads.field("l_discount") <= 0.07)
            & (pads.field("l_quantity") < 24)
        ),
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch.column("l_extendedprice"), batch.column("l_discount"))
        return pa.table({"revenue": rev})

    agg = ds.map_batches(revenue, batch_format="pyarrow").aggregate(
        Sum("revenue", alias_name="revenue"), Count(alias_name="n_items")
    )
    # zero matching rows: Sum aggregates to None — the forecast is 0,
    # not a crash (the oracle COALESCEs the same way)
    agg = agg or {}
    revenue_total = agg.get("revenue") or 0.0
    n_items = agg.get("n_items") or 0
    return pa.table(
        {
            "revenue_cents": pa.array([_cents(revenue_total)], type=pa.int64()),
            "n_items": pa.array([int(n_items)], type=pa.int64()),
        }
    )


def props_stats_by_type(sf_dir: str) -> pa.Table:
    """Semi-structured extraction — the JSON-column pattern every log
    pipeline needs: ``props`` holds per-event JSON; a streaming
    map_batches parses it (orjson, compiled once per process) and
    projects the typed field, then a grouped aggregate summarizes per
    event type.  Integer-exact vs the DuckDB json_extract oracle."""
    import orjson

    from ray.data.aggregate import Max, Min

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        ks = [int(orjson.loads(p)["k"]) for p in batch.column("props").to_pylist()]
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "k": pa.array(ks, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="k_sum"),
            Min("k", alias_name="k_min"),
            Max("k", alias_name="k_max"),
        )
    )
    rows = sorted(agg.take_all(), key=lambda r: r["event_type"])
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows]),
            "n_events": pa.array([int(r["n_events"]) for r in rows], type=pa.int64()),
            "k_sum": pa.array([int(r["k_sum"]) for r in rows], type=pa.int64()),
            "k_min": pa.array([int(r["k_min"]) for r in rows], type=pa.int64()),
            "k_max": pa.array([int(r["k_max"]) for r in rows], type=pa.int64()),
        }
    )

def distinct_users_by_type(sf_dir: str) -> pa.Table:
    """Exact COUNT(DISTINCT user_id) per event_type — the two-stage
    distinct-aggregate pattern: a per-batch ``pa.Table.group_by``
    pre-dedup shrinks the shuffle to distinct-pairs-per-block, one
    groupby over (event_type, user_id) dedups globally, and the second
    groupby runs over the pair-count-sized distinct set.  The raw event
    stream is never shuffled — only already-deduped pairs move."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])

    def pair_dedup(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    pairs = (
        ds.map_batches(pair_dedup, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_n"))
    )
    agg = pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    rows = sorted(agg.take_all(), key=lambda r: r["event_type"])
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in rows], type=pa.string()),
            "n_users": pa.array([int(r["n_users"]) for r in rows], type=pa.int64()),
        }
    )


def bloom_semijoin_revenue(
    sf_dir: str, priority: str = "1-URGENT", nbits: int = 1 << 17, nhashes: int = 4
) -> pa.Table:
    """Semi-join ``lineitem ⋉ orders(priority)`` with a broadcast Bloom
    prefilter ahead of the exact distributed hash join — the
    shuffle-reduction pattern for fact-fact semi-joins at scale: the
    Bloom bit array (16 KiB here, MBs at 100 TB — always
    broadcastable) is built in one streaming pass over the small
    filtered side, ``ray.put`` once, and probed vectorized per batch so
    only probable matches enter the ``Dataset.join`` shuffle.  False
    positives are removed by the join itself, so the result is exact
    regardless of the Bloom error rate."""
    import numpy as np
    import pyarrow.dataset as pads

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey"],
        filter=pads.field("o_orderpriority") == priority,
    )

    # one streaming pass over the filtered small side; only the fixed-size
    # bit array lives on the driver
    bits = np.zeros(nbits, dtype=bool)
    mults = [np.uint64(0x9E3779B97F4A7C15 + 2 * h + 1) for h in range(nhashes)]
    with np.errstate(over="ignore"):
        for batch in orders.iter_batches(batch_format="pyarrow"):
            keys = batch.column("o_orderkey").to_numpy().astype(np.uint64)
            for m in mults:
                bits[((keys * m) >> np.uint64(44)) % nbits] = True
    if not bits.any():
        # empty small side: every probe batch would filter to zero rows
        # and a FULLY empty join side crashes the hash join (see
        # _join.safe_join LIMITATION) — and the answer is known
        return pa.table(
            {
                "l_returnflag": pa.array([], type=pa.string()),
                "n_rows": pa.array([], type=pa.int64()),
                "revenue_cents": pa.array([], type=pa.int64()),
            }
        )
    bloom_ref = ray.put(np.packbits(bits))

    def probe(batch: pa.Table) -> pa.Table:
        packed = ray.get(bloom_ref)
        bloom = np.unpackbits(packed, count=nbits).astype(bool)
        keys = batch.column("l_orderkey").to_numpy().astype(np.uint64)
        keep = np.ones(len(keys), dtype=bool)
        with np.errstate(over="ignore"):
            for m in mults:
                keep &= bloom[((keys * m) >> np.uint64(44)) % nbits]
        batch = batch.filter(pa.array(keep))
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_returnflag": batch.column("l_returnflag"),
                "revenue": rev,
            }
        )

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    survivors = lineitem.map_batches(probe, batch_format="pyarrow")

    # exact verification: distributed hash join of the (pre-pruned)
    # survivors against the real key set — only Bloom survivors shuffle
    from ._join import safe_join

    joined = safe_join(
        survivors,
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    agg = joined.groupby("l_returnflag").aggregate(
        Count(alias_name="n_rows"), Sum("revenue", alias_name="revenue")
    )
    rows = sorted(agg.take_all(), key=lambda r: r["l_returnflag"])
    return pa.table(
        {
            "l_returnflag": pa.array([r["l_returnflag"] for r in rows], type=pa.string()),
            "n_rows": pa.array([int(r["n_rows"]) for r in rows], type=pa.int64()),
            "revenue_cents": pa.array([_cents(r["revenue"]) for r in rows], type=pa.int64()),
        }
    )

def table_checksum(sf_dir: str) -> pa.Table:
    """Order-independent table FINGERPRINT — the anti-entropy check a
    replicated 100 TB lake runs to compare copies without moving rows:
    each row hashes to md5-lower-64 of its canonical serialization and
    the fingerprint is the SUM of row hashes mod 2^64 (addition
    commutes, so the result is identical for ANY block layout, task
    order or physical row order — no sort, no shuffle; each block
    emits ONE partial).  Floats are excluded from the canonical string
    (integer/string fields only) so there are no rounding semantics to
    disagree on; the oracle replays the same concat + md5 + HUGEINT
    sum.  Signed int64 wrap matches the repo's simhash convention."""
    import hashlib

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64()).to_pylist()
        s = 0
        for eid, t, uid, ty in zip(
            batch.column("event_id").to_pylist(),
            ts_us,
            batch.column("user_id").to_pylist(),
            batch.column("event_type").to_pylist(),
        ):
            s += int.from_bytes(
                hashlib.md5(f"{eid}|{t}|{uid}|{ty}".encode()).digest()[8:], "little"
            )
        return pa.table(
            {
                "part_sum": pa.array([str(s % (1 << 64))], type=pa.string()),
                "n": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    rows = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    total = sum(int(r["part_sum"]) for r in rows) % (1 << 64)
    if total >= 1 << 63:
        total -= 1 << 64
    return pa.table(
        {
            "n_rows": pa.array([sum(r["n"] for r in rows)], type=pa.int64()),
            "checksum": pa.array([total], type=pa.int64()),
        }
    )


def _splitmix64(x: "np.ndarray") -> "np.ndarray":
    """Vectorized splitmix64 — a public-domain integer mixer with full
    avalanche, used to hash int64 keys for sketches without a per-row
    Python digest call."""
    import numpy as np

    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hll_estimate(regs: "np.ndarray", m: int) -> int:
    """Shared HLL estimator with the harmonic sum carried as an EXACT
    integer ``S = sum_r 2^(63-reg_r)`` (a zero register contributes
    2^63) so the estimate is bit-reproducible in SQL: the oracle
    computes the same HUGEINT S and evaluates the identical float
    expression ``alpha*m*m*2^63/S`` (same literals, same left-to-right
    associativity), with the standard linear-counting small-range
    correction and a tie-free ``floor(est+0.5)`` integer conversion
    (Python round() is half-even, SQL ROUND is half-away — floor+0.5
    sidesteps the disagreement)."""
    import math

    import numpy as np

    hist = np.bincount(regs, minlength=1)
    s_exact = 0
    for r, c in enumerate(hist):
        if c:
            s_exact += int(c) << (63 - int(r))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m * 9223372036854775808.0 / float(s_exact)
    zeros = int(hist[0])
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return int(math.floor(est + 0.5))


def approx_distinct_users_by_type(sf_dir: str, p: int = 12) -> pa.Table:
    """Grouped HyperLogLog: approximate COUNT(DISTINCT user_id) per
    event_type as a MERGEABLE per-group sketch.  The exact variant
    (``distinct_users_by_type``) shuffles every distinct (type, user)
    pair — itself huge at 100 TB; here each block emits one 2^p-byte
    register blob per group present, the group merge is an elementwise
    max, and shuffle volume is groups x blocks x 4 KiB regardless of
    user cardinality.  Same estimator + linear-counting correction as
    ``text.approx_distinct_words``; user_ids hash via vectorized
    splitmix64 (no per-row digest).  SQL-replayable end to end: the
    oracle re-runs splitmix64 (HUGEINT split multiplication = uint64
    wraparound), register indexing/ranking, and the estimator; the
    harmonic sum is carried as an EXACT integer S = sum(2^(63-reg))
    so the only float ops are the shared final expression — both sides
    compute `alpha*m*m*2^63/S` with identical literals/associativity
    and convert via floor(est+0.5) (no round-half tie semantics to
    disagree on).  The pytest gate additionally asserts every estimate
    lands within the small-range bound of the exact count."""
    import numpy as np

    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        types = np.asarray(batch.column("event_type").to_pylist())
        users = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        out_t, out_r = [], []
        for t in np.unique(types):
            h = _splitmix64(users[types == t])
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            rest = h << np.uint64(p)
            ranks = np.full(len(h), 64 - p + 1, dtype=np.uint8)
            nz = rest != 0
            bl = np.zeros(len(h), dtype=np.int64)
            bl[nz] = np.frompyfunc(int.bit_length, 1, 1)(rest[nz]).astype(np.int64)
            ranks[nz] = (64 - bl[nz] + 1).astype(np.uint8)
            regs = np.zeros(m, dtype=np.uint8)
            np.maximum.at(regs, idx, ranks)
            out_t.append(str(t))
            out_r.append(regs.tobytes())
        return pa.table(
            {
                "event_type": pa.array(out_t, type=pa.string()),
                "regs": pa.array(out_r, type=pa.binary()),
            }
        )

    def estimate(group: pa.Table) -> pa.Table:
        import numpy as np

        regs = np.zeros(m, dtype=np.uint8)
        for blob in group.column("regs").to_pylist():
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "approx_users": pa.array([_hll_estimate(regs, m)], type=pa.int64()),
            }
        )

    rows = sorted(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(estimate, batch_format="pyarrow")
        .take_all(),
        key=lambda r: r["event_type"],
    )
    return pa.Table.from_pylist(rows)

def orders_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(region, nation) over the orders fact table — the
    OLAP hierarchy aggregate.  Ray shape: aggregate ONCE at the finest
    (region, nation) grain with the broadcast-dimension join (the fact
    table never shuffles — same pattern as orders_by_region), then
    derive the region subtotals and the grand total FROM the
    nation-level aggregate, which is dimension-cardinality-sized; the
    upper rollup levels cost no extra pass over the data.  Rolled-up
    columns emit 'ALL' (the oracle COALESCEs its ROLLUP NULLs the same
    way)."""
    customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).take_all()
    nations = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).take_all()
    regions = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).take_all()
    region_by_key = {r["r_regionkey"]: r["r_name"] for r in regions}
    nation_info = {
        n["n_nationkey"]: (region_by_key[n["n_regionkey"]], n["n_name"]) for n in nations
    }
    lookup = pa.table(
        {
            "o_custkey": pa.array([c["c_custkey"] for c in customers], type=pa.int64()),
            "region": pa.array(
                [nation_info[c["c_nationkey"]][0] for c in customers], type=pa.string()
            ),
            "nation": pa.array(
                [nation_info[c["c_nationkey"]][1] for c in customers], type=pa.string()
            ),
        }
    )
    lookup_ref = ray.put(lookup)

    def join(batch: pa.Table) -> pa.Table:
        joined = batch.join(ray.get(lookup_ref), keys="o_custkey", join_type="inner")
        return pa.table(
            {
                "region": joined.column("region"),
                "nation": joined.column("nation"),
                "o_totalprice": joined.column("o_totalprice"),
            }
        )

    agg = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .map_batches(join, batch_format="pyarrow")
        .groupby(["region", "nation"])
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"))
    )
    fine = sorted(agg.take_all(), key=lambda r: (r["region"], r["nation"]))

    # roll up from the dimension-cardinality-sized fine grain
    out: list[dict] = []
    by_region: dict[str, list] = {}
    for r in fine:
        by_region.setdefault(r["region"], []).append(r)
    for region in sorted(by_region):
        rows = by_region[region]
        for r in rows:
            out.append(
                {
                    "region": region,
                    "nation": r["nation"],
                    "n_orders": int(r["n_orders"]),
                    "total_cents": _cents(r["total"]),
                }
            )
        out.append(
            {
                "region": region,
                "nation": "ALL",
                "n_orders": sum(int(r["n_orders"]) for r in rows),
                "total_cents": _cents(sum(float(r["total"]) for r in rows)),
            }
        )
    out.append(
        {
            "region": "ALL",
            "nation": "ALL",
            "n_orders": sum(int(r["n_orders"]) for r in fine),
            "total_cents": _cents(sum(float(r["total"]) for r in fine)),
        }
    )
    # plain-string (region, nation) sort = the oracle's ORDER BY over the
    # COALESCEd ROLLUP labels: 'ALL' interleaves alphabetically (e.g.
    # AFRICA < ALL < AMERICA), so append order alone would diverge from
    # an order-sensitive hash even with identical values
    out.sort(key=lambda r: (r["region"], r["nation"]))
    return pa.table(
        {
            "region": pa.array([r["region"] for r in out], type=pa.string()),
            "nation": pa.array([r["nation"] for r in out], type=pa.string()),
            "n_orders": pa.array([r["n_orders"] for r in out], type=pa.int64()),
            "total_cents": pa.array([r["total_cents"] for r in out], type=pa.int64()),
        }
    )

def zscore_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Per-event-type z-score normalization of ``value`` — the grouped
    feature-standardization stage of an ML pipeline, made hash-exact:
    moments accumulate as EXACT int64 sums of integer cents (order
    independent), and the per-row z uses the same staged IEEE-double
    expression as the SQL oracle, so the float64 output is
    bit-identical.  Ray shape: one pass of per-batch (n, sum, sumsq)
    partials (type-count-sized), a driver merge + broadcast, then a
    second streaming pass computes z vectorized."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def cents_of(batch: pa.Table) -> "np.ndarray":
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        return np.array(
            [int(round(round(float(v), 2) * 100)) for v in vals], dtype=np.int64
        )

    def moments(batch: pa.Table) -> pa.Table:
        cents = cents_of(batch)
        types = np.asarray(batch.column("event_type").to_pylist())
        out = []
        for t in np.unique(types):
            c = cents[types == t]
            out.append((str(t), len(c), int(c.sum()), int((c * c).sum())))
        return pa.table(
            {
                "event_type": pa.array([o[0] for o in out], type=pa.string()),
                "n": pa.array([o[1] for o in out], type=pa.int64()),
                "s1": pa.array([o[2] for o in out], type=pa.int64()),
                "s2": pa.array([o[3] for o in out], type=pa.int64()),
            }
        )

    stats: dict[str, list[int]] = {}
    for row in ds.map_batches(moments, batch_format="pyarrow").take_all():
        s = stats.setdefault(row["event_type"], [0, 0, 0])
        s[0] += int(row["n"])
        s[1] += int(row["s1"])
        s[2] += int(row["s2"])
    import math

    params = {}
    for t, (n, s1, s2) in stats.items():
        mean = float(s1) / n
        var = (float(s2) - float(s1) * float(s1) / n) / n
        params[t] = (mean, math.sqrt(var))
    params_ref = ray.put(params)

    def z(batch: pa.Table) -> pa.Table:
        p = ray.get(params_ref)
        cents = cents_of(batch).astype(np.float64)
        types = batch.column("event_type").to_pylist()
        means = np.array([p[t][0] for t in types])
        stds = np.array([p[t][1] for t in types])
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "z": pa.array((cents - means) / stds, type=pa.float64()),
            }
        )

    return ds.map_batches(z, batch_format="pyarrow").sort("event_id")

def validate_events(sf_dir: str) -> pa.Table:
    """Data-quality validation pass (the expectations gate a lake runs
    before accepting a drop): one streaming scan evaluates every rule
    vectorized per batch and emits per-rule violation counts — rule
    results are rule-count-sized partials, merged on the driver; no
    shuffle, no second pass.  Rules are plain Arrow predicates so adding
    one is adding a kernel, not a pipeline."""
    import orjson

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts", "value", "props"],
    )
    known_types = pa.array(["view", "click", "purchase", "signup", "error"])

    def _count_true(mask) -> int:
        # pc.sum skips nulls, so a null comparison is "not a violation" —
        # exactly the oracle's CASE WHEN pred THEN 1 ELSE 0 semantics
        v = pc.sum(pc.cast(mask, pa.int64())).as_py()
        return int(v) if v is not None else 0

    def check(batch: pa.Table) -> pa.Table:
        value = batch.column("value")
        viol = {
            "value_nonnegative": _count_true(pc.less(value, pa.scalar(0.0))),
            "value_le_100": _count_true(pc.greater(value, pa.scalar(100.0))),
            "event_type_known": _count_true(
                pc.invert(pc.is_in(batch.column("event_type"), value_set=known_types))
            ),
            "user_id_not_null": _count_true(pc.is_null(batch.column("user_id"))),
            "props_has_int_k": 0,
        }
        for p in batch.column("props").to_pylist():
            try:
                k = orjson.loads(p).get("k")
                # bool is an int subclass in Python but not castable to
                # BIGINT in the oracle's TRY_CAST — exclude it explicitly
                if not isinstance(k, int) or isinstance(k, bool):
                    viol["props_has_int_k"] += 1
            except Exception:
                viol["props_has_int_k"] += 1
        return pa.table(
            {
                "rule": pa.array(list(viol.keys()), type=pa.string()),
                "n_violations": pa.array([int(v) for v in viol.values()], type=pa.int64()),
            }
        )

    totals: dict[str, int] = {}
    for row in ds.map_batches(check, batch_format="pyarrow").take_all():
        totals[row["rule"]] = totals.get(row["rule"], 0) + int(row["n_violations"])
    rules = sorted(totals)
    return pa.table(
        {
            "rule": pa.array(rules, type=pa.string()),
            "n_violations": pa.array([totals[r] for r in rules], type=pa.int64()),
        }
    )

def promo_revenue_share(sf_dir: str) -> pa.Table:
    """TPC-H Q14-shaped conditional aggregate: per ship-month, revenue
    from PROMO parts vs total — the broadcast fact-dimension join (part
    is ray.put once; lineitem streams and never shuffles) with a
    CASE-style split aggregated map-side.  Revenue accumulates in EXACT
    integer units (price-cents x remaining-discount-percent, both exact
    integers for 2-decimal inputs), so the sums are order-independent
    and boundary-free — a double sum here measurably lands within one
    ULP of a half-cent at sf0.001; consumers divide for the share so no
    float ratio enters the hash comparison."""
    import numpy as np
    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]).take_all()
    lookup = pa.table(
        {
            "l_partkey": pa.array([p["p_partkey"] for p in parts], type=pa.int64()),
            "is_promo": pa.array(
                [p["p_type"].startswith("PROMO") for p in parts], type=pa.bool_()
            ),
        }
    )
    lookup_ref = ray.put(lookup)

    def join(batch: pa.Table) -> pa.Table:
        joined = batch.join(ray.get(lookup_ref), keys="l_partkey", join_type="inner")
        price_c = np.rint(
            joined.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_pct = np.rint(
            joined.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rev_units = price_c * (100 - disc_pct)  # cent-hundredths, exact
        promo_mask = joined.column("is_promo").to_numpy(zero_copy_only=False)
        month = pc.strftime(joined.column("l_shipdate"), format="%Y-%m")
        return pa.table(
            {
                "month": month,
                "revenue": pa.array(rev_units, type=pa.int64()),
                "promo_revenue": pa.array(
                    np.where(promo_mask, rev_units, 0), type=pa.int64()
                ),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(join, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Sum("promo_revenue", alias_name="promo"), Sum("revenue", alias_name="total")
        )
    )
    rows = sorted(agg.take_all(), key=lambda r: r["month"])
    return pa.table(
        {
            "month": pa.array([r["month"] for r in rows], type=pa.string()),
            "promo_units": pa.array([int(r["promo"]) for r in rows], type=pa.int64()),
            "total_units": pa.array([int(r["total"]) for r in rows], type=pa.int64()),
        }
    )


def lineitem_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four grouping
    sets — (flag, status), (flag), (status), () — with 'ALL' as the
    rolled-up marker.  Ray shape: ONE distributed groupby at the finest
    grain (per-row integer cents so every level sums exactly), then the
    three coarser levels are rolled up from the finest cells on the
    driver — the cell table is |flags| x |statuses|-sized, so no second
    corpus pass and no extra shuffle at any data scale."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_cents": _cents_array(batch.column("l_quantity")),
            }
        )

    finest = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity"],
        )
        .map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n_rows"), Sum("qty_cents", alias_name="sum_qty_cents"))
        .take_all()
    )
    cells: dict[tuple[str, str], tuple[int, int]] = {}
    for r in finest:
        flag, status = str(r["l_returnflag"]), str(r["l_linestatus"])
        n, q = int(r["n_rows"]), int(r["sum_qty_cents"])
        for key in ((flag, status), (flag, "ALL"), ("ALL", status), ("ALL", "ALL")):
            pn, pq = cells.get(key, (0, 0))
            cells[key] = (pn + n, pq + q)
    keys = sorted(cells)
    return pa.table(
        {
            "l_returnflag": pa.array([k[0] for k in keys], type=pa.string()),
            "l_linestatus": pa.array([k[1] for k in keys], type=pa.string()),
            "n_rows": pa.array([cells[k][0] for k in keys], type=pa.int64()),
            "sum_qty_cents": pa.array([cells[k][1] for k in keys], type=pa.int64()),
        }
    )


def local_supplier_volume(sf_dir: str) -> pa.Table:
    """TPC-H Q5-style local-supplier volume: revenue from lineitems
    whose CUSTOMER and SUPPLIER sit in the same nation, grouped by
    nation — the classic correlated-dimension fact-fact topology.

    Ray shape: customer/supplier/nation key maps are dimension-sized,
    so each broadcasts once via ``ray.put`` and annotates its fact
    stream inside ``map_batches`` (orders gain c_nationkey, lineitems
    gain s_nationkey + the double revenue term); the one real
    shuffle is the fact-fact hash join on orderkey — shipping only
    (orderkey, natkey, cents) triples — and the same-nation filter +
    nation-name groupby run on the join output.  The per-nation result
    is nation-count-sized."""
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).take_all()
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).take_all()
    nations = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    supp_nat = pa.table(
        {
            "l_suppkey": pa.array([s["s_suppkey"] for s in supp], type=pa.int64()),
            "s_nationkey": pa.array([s["s_nationkey"] for s in supp], type=pa.int64()),
        }
    )
    cust_nat = pa.table(
        {
            "o_custkey": pa.array([c["c_custkey"] for c in cust], type=pa.int64()),
            "c_nationkey": pa.array([c["c_nationkey"] for c in cust], type=pa.int64()),
        }
    )
    nat_keys = pa.array([int(n["n_nationkey"]) for n in nations], type=pa.int64())
    nat_names = pa.array([str(n["n_name"]) for n in nations], type=pa.string())
    supp_ref, cust_ref = ray.put(supp_nat), ray.put(cust_nat)

    def lineitem_side(batch: pa.Table) -> pa.Table:
        # revenue stays a double until ONE final round per nation (the
        # lineitem_pricing convention): per-row cents would need
        # Python-round == DuckDB-ROUND on every product, and the two
        # disagree on rare half-cent boundaries (measured: 1 row in
        # 60k at sf0.01)
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_suppkey": batch.column("l_suppkey"),
                "revenue": rev,
            }
        )
        return t.join(ray.get(supp_ref), keys="l_suppkey", join_type="inner").drop_columns(
            ["l_suppkey"]
        )

    def orders_side(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "o_custkey": batch.column("o_custkey"),
            }
        )
        return t.join(ray.get(cust_ref), keys="o_custkey", join_type="inner").drop_columns(
            ["o_custkey"]
        )

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(orders_side, batch_format="pyarrow")

    from ._join import safe_join

    joined = safe_join(
        lineitem,
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def local_only(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("s_nationkey"), batch.column("c_nationkey"))
        kept = batch.filter(mask)
        idx = pc.index_in(kept.column("s_nationkey"), value_set=nat_keys)
        names = pc.take(nat_names, idx)
        return pa.table({"n_name": names, "revenue": kept.column("revenue")})

    agg = (
        joined.map_batches(local_only, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Count(alias_name="n_items"), Sum("revenue", alias_name="revenue")
        )
    )
    rows = sorted(agg.take_all(), key=lambda r: r["n_name"])
    return pa.table(
        {
            "n_name": pa.array([r["n_name"] for r in rows], type=pa.string()),
            "n_items": pa.array([int(r["n_items"]) for r in rows], type=pa.int64()),
            "revenue_cents": pa.array(
                [_cents(r["revenue"]) for r in rows], type=pa.int64()
            ),
        }
    )


def small_quantity_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q17-style correlated-aggregate join-back: lineitems whose
    quantity is below 20% of their part's average quantity — the
    "join the fact to its own per-key aggregate" shape (SQL correlated
    subquery) that requires TWO passes over the key space, not a
    broadcast: part-key cardinality is fact-like at scale.

    Ray shape: pass 1 is a ``groupby(l_partkey)`` computing (sum, n)
    partials; pass 2 hash-joins the thresholds back to the fact stream
    (``safe_join`` — the aggregate side can be sparse after filters)
    and applies the comparison vectorized.  Quantities are integral so
    the double sums are order-independent-exact; the threshold is the
    single IEEE expression 0.2 * (sum/n) on both engine and oracle."""
    from ._join import safe_join

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    per_part = lineitem.groupby("l_partkey").aggregate(
        Sum("l_quantity", alias_name="qty_sum"), Count(alias_name="qty_n")
    )

    def to_threshold(batch: pa.Table) -> pa.Table:
        thr = pc.multiply(
            pa.scalar(0.2),
            pc.divide(
                batch.column("qty_sum"), pc.cast(batch.column("qty_n"), pa.float64())
            ),
        )
        return pa.table({"t_partkey": batch.column("l_partkey"), "thr": thr})

    thresholds = per_part.map_batches(to_threshold, batch_format="pyarrow")
    joined = safe_join(
        lineitem,
        thresholds,
        join_type="inner",
        on=("l_partkey",),
        right_on=("t_partkey",),
        num_partitions=8,
    )

    def qualifying(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.less(batch.column("l_quantity"), batch.column("thr")))
        return pa.table({"price_cents": _cents_array(kept.column("l_extendedprice"))})

    agg = joined.map_batches(qualifying, batch_format="pyarrow").aggregate(
        Count(alias_name="n_items"), Sum("price_cents", alias_name="total_price_cents")
    )
    return pa.table(
        {
            "n_items": pa.array([int(agg["n_items"])], type=pa.int64()),
            "total_price_cents": pa.array([int(agg["total_price_cents"])], type=pa.int64()),
        }
    )


def customers_without_orders(
    sf_dir: str,
    priority: str = "1-URGENT",
    nbits: int = 1 << 17,
    nhashes: int = 4,
) -> pa.Table:
    """TPC-H Q22-style ANTI-join: high-balance customers that placed NO
    order of the given priority, grouped by market segment (the
    reference tables carry no phone column, so segment stands in for
    Q22's country code, and the priority filter keeps the anti side
    non-degenerate — every synthetic customer has *some* order).

    Ray shape — the scale-correct anti-join is the dual of
    ``bloom_semijoin_revenue``: a Bloom filter over the order custkeys
    is built in one streaming pass and broadcast once.  A Bloom NEGATIVE
    is definitive, so every customer whose key misses the filter is a
    PROVEN non-orderer and never enters any shuffle; only the
    Bloom-positive sliver (true orderers + the small false-positive
    rate) needs the exact distributed ``left_anti`` join to weed out
    false positives.  At 100 TB that turns an all-to-all anti-join of
    the full customer table into a shuffle over ~(orderers + epsilon).

    The balance threshold (mean positive balance, Q22's correlated
    scalar subquery) is computed over integer cents so both engine and
    oracle evaluate the identical sum exactly, then compared through
    the single IEEE division sum/n on both sides."""
    import numpy as np

    from ._join import safe_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "c_mktsegment": batch.column("c_mktsegment"),
                "bal_cents": _cents_array(batch.column("c_acctbal")),
            }
        )

    cust_cents = cust.map_batches(to_cents, batch_format="pyarrow")

    # scalar threshold: ONE streaming aggregate; integer cents make the
    # sum order-independent-exact, the final sum/n is the same IEEE op
    # DuckDB performs for BIGINT / BIGINT
    pos = cust_cents.filter(expr="bal_cents > 0")
    tot = pos.aggregate(Sum("bal_cents", alias_name="s"), Count(alias_name="n"))
    thr_cents = float(tot["s"]) / float(tot["n"])

    import pyarrow.dataset as pads

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == priority,
    )
    bits = np.zeros(nbits, dtype=bool)
    mults = [np.uint64(0x9E3779B97F4A7C15 + 2 * h + 1) for h in range(nhashes)]
    with np.errstate(over="ignore"):
        for batch in orders.iter_batches(batch_format="pyarrow"):
            keys = batch.column("o_custkey").to_numpy().astype(np.uint64)
            for m in mults:
                bits[((keys * m) >> np.uint64(44)) % nbits] = True
    bloom_ref = ray.put(np.packbits(bits))

    def split(batch: pa.Table, want_maybe: bool) -> pa.Table:
        thr_mask = pc.greater(
            pc.cast(batch.column("bal_cents"), pa.float64()), pa.scalar(thr_cents)
        )
        batch = batch.filter(thr_mask)
        packed = ray.get(bloom_ref)
        bloom = np.unpackbits(packed, count=nbits).astype(bool)
        keys = batch.column("c_custkey").to_numpy().astype(np.uint64)
        maybe = np.ones(len(keys), dtype=bool)
        with np.errstate(over="ignore"):
            for m in mults:
                maybe &= bloom[((keys * m) >> np.uint64(44)) % nbits]
        return batch.filter(pa.array(maybe if want_maybe else ~maybe))

    definite = cust_cents.map_batches(
        lambda b: split(b, want_maybe=False), batch_format="pyarrow"
    )
    maybe = cust_cents.map_batches(
        lambda b: split(b, want_maybe=True), batch_format="pyarrow"
    )
    # exact weed-out of Bloom false positives: only the positive sliver
    # shuffles; duplicate right keys are fine for anti semantics
    confirmed = safe_join(
        maybe,
        orders,
        join_type="left_anti",
        num_partitions=8,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    agg = (
        definite.union(confirmed)
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_custs"), Sum("bal_cents", alias_name="total"))
    )
    rows = sorted(agg.take_all(), key=lambda r: r["c_mktsegment"])
    return pa.table(
        {
            "c_mktsegment": pa.array([r["c_mktsegment"] for r in rows], type=pa.string()),
            "n_custs": pa.array([int(r["n_custs"]) for r in rows], type=pa.int64()),
            "total_bal_cents": pa.array([int(r["total"]) for r in rows], type=pa.int64()),
        }
    )


def dominant_event_type(sf_dir: str) -> pa.Table:
    """Per-user modal event type (argmax-per-group with a deterministic
    smallest-string tie-break) — the "dominant label per key" reduction
    every training-data pipeline needs (dominant language per domain,
    majority dedup-cluster label, ...).

    Ray shape: NO per-group Python — the mode is three vectorized hash
    aggregates: (1) ``groupby(user, type).count()`` collapses the fact
    stream to key×label cardinality, (2) ``groupby(user).max(n)``
    extracts the winning count, (3) an equality ``safe_join`` back +
    ``groupby(user).min(type)`` applies the tie-break.  Stages 2-3 run
    over the already-collapsed table, so the single fact-sized shuffle
    is stage 1 (which Ray pre-aggregates map-side)."""
    from ray.data.aggregate import Max, Min

    from ._join import safe_join

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    counts = events.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="n")
    )
    winners = counts.groupby("user_id").aggregate(Max("n", alias_name="mx"))
    joined = safe_join(
        counts,
        winners,
        join_type="inner",
        num_partitions=8,
        on=("user_id",),
        right_on=("user_id",),
    )
    tied = joined.filter(expr="n == mx")
    agg = tied.groupby("user_id").aggregate(
        Min("event_type", alias_name="event_type"), Max("n", alias_name="n")
    )
    rows = sorted(agg.take_all(), key=lambda r: r["user_id"])
    return pa.table(
        {
            "user_id": pa.array([int(r["user_id"]) for r in rows], type=pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows], type=pa.string()),
            "n": pa.array([int(r["n"]) for r in rows], type=pa.int64()),
        }
    )


def suppliers_kept_waiting(sf_dir: str, limit: int = 20) -> pa.Table:
    """TPC-H Q21-style 'suppliers who kept orders waiting', adapted to
    this corpus's columns (no receipt/commit dates; `l_returnflag='R'`
    stands in for the late-delivery predicate): for every order served
    by >= 2 distinct suppliers, find the supplier whose lineitems were
    the ONLY returned ones — the multi-EXISTS + NOT-EXISTS correlated
    semi/anti-join topology — and count qualifying orders per supplier.

    Ray shape: a per-batch vectorized (orderkey, suppkey, is_r)
    combiner pre-dedups inside the scan so the ONE fact shuffle ships
    pair rows, not lineitems; a pair-sized ``groupby(orderkey)``
    derives per-order supplier/failure totals; ``safe_join`` attaches
    them back to the pairs (the dominant_event_type join-back shape);
    the EXISTS/NOT-EXISTS predicate becomes a vectorized filter; and
    the final count is a supplier-sized aggregate.  Supplier names
    attach AFTER the aggregate from a dimension-sized driver map (the
    top_customers convention — names never enter a shuffle)."""
    from ._join import safe_join

    def combiner(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_suppkey": batch.column("l_suppkey"),
                "is_r": pc.cast(
                    pc.equal(batch.column("l_returnflag"), pa.scalar("R")), pa.int64()
                ),
            }
        )
        return t.group_by(["l_orderkey", "l_suppkey"]).aggregate([("is_r", "max")]).rename_columns(
            ["l_orderkey", "l_suppkey", "is_r"]
        )

    from ray.data.aggregate import Max

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_returnflag"],
        )
        .map_batches(combiner, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("is_r", alias_name="is_r"))
        .materialize()  # consumed twice: order totals + join left side
    )
    order_stats = pairs.groupby("l_orderkey").aggregate(
        Count(alias_name="n_supp"), Sum("is_r", alias_name="n_fail")
    )
    joined = safe_join(
        pairs, order_stats, join_type="inner", num_partitions=8, on=("l_orderkey",)
    )

    def qualifying(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.equal(batch.column("is_r"), pa.scalar(1, pa.int64())),
                pc.greater_equal(batch.column("n_supp"), pa.scalar(2, pa.int64())),
            ),
            pc.equal(batch.column("n_fail"), pa.scalar(1, pa.int64())),
        )
        return batch.filter(mask).select(["l_suppkey"])

    waits = (
        joined.map_batches(qualifying, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Count(alias_name="numwait"))
        .take_all()  # supplier-sized
    )
    names = {
        int(r["s_suppkey"]): str(r["s_name"])
        for r in ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
        ).take_all()
    }
    rows = sorted(
        ((-int(r["numwait"]), names[int(r["l_suppkey"])]) for r in waits),
    )[:limit]
    return pa.table(
        {
            "s_name": pa.array([n for _, n in rows], type=pa.string()),
            "numwait": pa.array([-w for w, _ in rows], type=pa.int64()),
        }
    )


def purchase_graph_pagerank(
    sf_dir: str,
    iterations: int = 10,
    limit: int = 30,
    mode: str = "auto",
    driver_edge_threshold: int = 20_000_000,
) -> pa.Table:
    """Distributed PageRank over the customer<->supplier purchase graph
    (an undirected edge per distinct (customer, supplier) order
    relationship) — the web-graph quality-weighting algorithm early
    training corpora used for page filtering, expressed as iterative
    message passing.

    Exactness contract (shared verbatim with the SQL oracle, which
    unrolls the iterations as chained CTEs): ranks live entirely in
    int64 micro-units (start 1e12 // n_nodes); each edge contributes
    ``rank // degree`` (integer floor division), so per-node sums are
    ORDER-INDEPENDENT; damping 0.85 is the pure-integer
    ``(sum * 17) // 20`` with teleport base ``15e10 // n_nodes`` — the
    whole fixpoint is float-free and bit-stable at any parallelism.

    Scale shape: the one fact-fact `safe_join` (orders x lineitem on
    orderkey) runs ONCE to derive distinct edges; each iteration is one
    edge-vs-ranks hash join on ``src`` plus one ``groupby(dst)`` sum —
    node-sized rank tables roll forward on the cluster, never the
    driver; the driver sees only scalar n_nodes and the final top-k.

    ``mode``: the bpe_train auto-switch — each distributed iteration
    costs ~2-3s of Ray scheduling on a join whose inputs are kilobytes
    here, and the fixpoint is PURE INTEGER math, so a driver-local
    numpy loop over the (src, dst, deg) arrays produces the bit-same
    ranks (scatter-adds commute).  "auto" switches when the edge list
    fits (<= ``driver_edge_threshold``); "distributed" keeps the
    cluster loop (the adversarial-graph path; same oracle)."""
    from ._join import safe_join

    def li_project(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_suppkey": batch.column("l_suppkey"),
            }
        )
        return t.group_by(["l_orderkey", "l_suppkey"]).aggregate([])

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_project, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: b.rename_columns(["l_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    joined = safe_join(
        lineitem, orders, join_type="inner", num_partitions=8, on=("l_orderkey",)
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        # node ids: customer -> 2k, supplier -> 2k+1; UNDIRECTED graph
        # (both directions emitted) so every node has out-degree >= 1
        c = pc.multiply(pc.cast(batch.column("o_custkey"), pa.int64()), pa.scalar(2, pa.int64()))
        s = pc.add(
            pc.multiply(pc.cast(batch.column("l_suppkey"), pa.int64()), pa.scalar(2, pa.int64())),
            pa.scalar(1, pa.int64()),
        )
        both = pa.table(
            {
                "src": pa.concat_arrays([c.combine_chunks(), s.combine_chunks()]),
                "dst": pa.concat_arrays([s.combine_chunks(), c.combine_chunks()]),
            }
        )
        return both.group_by(["src", "dst"]).aggregate([])  # per-batch pre-dedup

    edges = (
        joined.map_batches(to_edges, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_m"))
        .drop_columns(["_m"])  # global distinct edges
        .materialize()
    )
    degrees = edges.groupby("src").aggregate(Count(alias_name="deg")).materialize()
    n_nodes = degrees.count()
    mass, base = 10**12 // n_nodes, (15 * 10**10) // n_nodes

    edges_deg = safe_join(
        edges, degrees, join_type="inner", num_partitions=8, on=("src",)
    ).materialize()

    if mode == "driver" or (
        mode == "auto" and edges_deg.count() <= driver_edge_threshold
    ):
        import numpy as np

        rows_ed = edges_deg.take_all()
        src_a = np.array([int(r["src"]) for r in rows_ed], dtype=np.int64)
        dst_a = np.array([int(r["dst"]) for r in rows_ed], dtype=np.int64)
        deg_a = np.array([int(r["deg"]) for r in rows_ed], dtype=np.int64)
        nodes = np.unique(np.concatenate((src_a, dst_a)))
        src_i = np.searchsorted(nodes, src_a)
        dst_i = np.searchsorted(nodes, dst_a)
        ranks_v = np.full(len(nodes), mass, dtype=np.int64)
        for _ in range(iterations):
            contrib = ranks_v[src_i] // deg_a
            s = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(s, dst_i, contrib)
            ranks_v = base + (s * 17) // 20
        order = np.lexsort((nodes, -ranks_v))[:limit]
        top_nodes, top_ranks = nodes[order], ranks_v[order]
        return pa.table(
            {
                "kind": pa.array(
                    ["customer" if n % 2 == 0 else "supplier" for n in top_nodes],
                    type=pa.string(),
                ),
                "key": pa.array(top_nodes // 2, type=pa.int64()),
                "rank_micro": pa.array(top_ranks, type=pa.int64()),
            }
        )

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("src"),
                "rank": pa.array([mass] * batch.num_rows, type=pa.int64()),
            }
        )

    ranks = degrees.map_batches(seed, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        sent = safe_join(
            edges_deg, ranks, join_type="inner", num_partitions=8, on=("src",)
        )

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch.column("rank").to_numpy(zero_copy_only=False)
            d = batch.column("deg").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "dst": batch.column("dst"),
                    "c": pa.array(r // d, type=pa.int64()),
                }
            )

        summed = (
            sent.map_batches(contrib, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="s"))
        )

        def damp(batch: pa.Table) -> pa.Table:
            s = batch.column("s").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "src": batch.column("dst"),
                    "rank": pa.array(base + (s * 17) // 20, type=pa.int64()),
                }
            )

        ranks = summed.map_batches(damp, batch_format="pyarrow").materialize()

    top = ranks.sort(["rank", "src"], descending=[True, False]).limit(limit).take_all()
    return pa.table(
        {
            "kind": pa.array(
                ["customer" if r["src"] % 2 == 0 else "supplier" for r in top],
                type=pa.string(),
            ),
            "key": pa.array([r["src"] // 2 for r in top], type=pa.int64()),
            "rank_micro": pa.array([r["rank"] for r in top], type=pa.int64()),
        }
    )


def salted_type_counts(sf_dir: str, salt: int = 16) -> pa.Table:
    """Generic two-phase SALTED aggregation — the hot-key-skew shape for
    groupby at scale: phase 1 shuffles on (event_type, event_id % salt)
    so one hot key spreads over `salt` reducers; phase 2 re-aggregates
    the salt-fan-out-sized partials by the real key.

    Exactness: values convert to integer cents PER ROW before either
    phase, so both sums are associative integer adds — the result is
    provably independent of the salt fan-out (that independence is what
    makes salting sound), and the oracle is the plain one-phase
    GROUP BY."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "salt": pc.cast(
                    pc.bit_wise_and(
                        batch.column("event_id"), pa.scalar(salt - 1, pa.int64())
                    ),
                    pa.int64(),
                ),
                "cents": _cents_array(batch.column("value")),
            }
        )

    phase1 = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
        )
        .map_batches(project, batch_format="pyarrow")
        .groupby(["event_type", "salt"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="c"))
    )
    out = (
        phase1.groupby("event_type")
        .aggregate(Sum("n", alias_name="n_events"), Sum("c", alias_name="total_value_cents"))
        .sort("event_type")
        .take_all()
    )
    return pa.table(
        {
            "event_type": pa.array([r["event_type"] for r in out], type=pa.string()),
            "n_events": pa.array([int(r["n_events"]) for r in out], type=pa.int64()),
            "total_value_cents": pa.array(
                [int(r["total_value_cents"]) for r in out], type=pa.int64()
            ),
        }
    )


def incremental_daily_agg(sf_dir: str) -> pa.Table:
    """Incremental aggregate maintenance (the lambda-architecture /
    materialized-view pattern): a BASE aggregate and a DELTA aggregate
    computed in separate executions merge into exactly the full
    recompute — here split deterministically by event_id parity, merged
    with one partial-sized groupby sum.  Per-row integer cents make the
    merge associative, so base+delta == full holds bit-exactly no
    matter where the split falls; the oracle IS the full recompute."""
    def agg_split(keep_even: bool) -> pa.Table:
        def project(batch: pa.Table) -> pa.Table:
            parity = pc.bit_wise_and(batch.column("event_id"), pa.scalar(1, pa.int64()))
            mask = pc.equal(parity, pa.scalar(0 if keep_even else 1, pa.int64()))
            b = batch.filter(mask)
            ts = pc.cast(b.column("ts"), pa.int64())  # epoch microseconds
            return pa.table(
                {
                    # truncating int division == floor for non-negative ts,
                    # matching the oracle's epoch_us(ts) // 86400000000
                    "day_id": pc.divide(ts, pa.scalar(86_400_000_000, pa.int64())),
                    "cents": _cents_array(b.column("value")),
                }
            )

        return (
            ray.data.read_parquet(
                f"{sf_dir}/events.parquet", columns=["event_id", "ts", "value"]
            )
            .map_batches(project, batch_format="pyarrow")
            .groupby("day_id")
            .aggregate(Count(alias_name="n"), Sum("cents", alias_name="c"))
            .take_all()
        )

    merged: dict[int, tuple[int, int]] = {}
    for part in (agg_split(True), agg_split(False)):  # two independent executions
        for r in part:
            n, c = merged.get(int(r["day_id"]), (0, 0))
            merged[int(r["day_id"])] = (n + int(r["n"]), c + int(r["c"]))
    days = sorted(merged)
    return pa.table(
        {
            "day_id": pa.array(days, type=pa.int64()),
            "n_events": pa.array([merged[d][0] for d in days], type=pa.int64()),
            "total_value_cents": pa.array([merged[d][1] for d in days], type=pa.int64()),
        }
    )


def customer_order_distribution(sf_dir: str, exclude_priority: str = "1-URGENT") -> pa.Table:
    """TPC-H Q13-style customer order-count distribution: how many
    customers placed exactly N qualifying orders, including the
    customers who placed none (sourcemap of Q13's LEFT JOIN).

    Ray shape: the orders fact stream never joins customer at all — one
    ``groupby(o_custkey).count()`` (map-side partials) produces the
    customer-count-sized per-customer table, a second tiny
    ``groupby(n_orders).count()`` produces the distribution, and the
    zero bucket is derived arithmetically (total customers − customers
    with ≥1 qualifying order; o_custkey ⊆ c_custkey by construction).
    At 100 TB the only shuffle ships (custkey, partial-count) pairs;
    the distribution itself is histogram-sized."""
    import pyarrow.dataset as pads

    per_cust = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey"],
            filter=pads.field("o_orderpriority") != exclude_priority,
        )
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    dist = per_cust.groupby("n_orders").aggregate(Count(alias_name="custdist"))
    rows = {int(r["n_orders"]): int(r["custdist"]) for r in dist.take_all()}
    total_customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    zero = total_customers - sum(rows.values())
    if zero:
        rows[0] = rows.get(0, 0) + zero
    ks = sorted(rows)
    return pa.table(
        {
            "n_orders": pa.array(ks, type=pa.int64()),
            "custdist": pa.array([rows[k] for k in ks], type=pa.int64()),
        }
    )


def large_volume_customers(
    sf_dir: str, min_quantity: float = 250.0, limit: int = 100
) -> pa.Table:
    """TPC-H Q18-style large-volume customers: orders whose total
    lineitem quantity exceeds ``min_quantity``, with customer names.

    Ray shape: quantity sums reduce map-side in the ``groupby``
    (orderkey-sized output), the HAVING filter shrinks that to the far
    tail BEFORE any join, and the one distributed join
    (survivors × orders, ``safe_join``) ships only survivor keys plus
    the orders projection.  Customer names attach AFTER the sort/limit
    (the ``top_customers`` convention: dimension strings never enter
    the shuffle or the sort, and the post-limit lookup is ≤``limit``
    rows)."""
    qty = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        )
        .groupby("l_orderkey")
        .aggregate(Sum("l_quantity", alias_name="sum_qty"))
        .filter(expr=f"sum_qty > {min_quantity}")
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    from ._join import safe_join

    joined = safe_join(
        qty, orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    top = joined.sort(["sum_qty", "l_orderkey"], descending=[True, False]).limit(limit)
    rows = top.take_all()  # ≤ limit rows

    # post-limit dimension lookup: fetch ONLY the ≤limit customer names
    need = sorted({int(r["o_custkey"]) for r in rows})
    import pyarrow.dataset as pads

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filter=pads.field("c_custkey").isin(need),
    ).take_all()
    names = {int(c["c_custkey"]): str(c["c_name"]) for c in cust}
    return pa.table(
        {
            "c_name": pa.array([names[int(r["o_custkey"])] for r in rows], type=pa.string()),
            "o_orderkey": pa.array([int(r["l_orderkey"]) for r in rows], type=pa.int64()),
            "o_orderdate": pa.array(
                [r["o_orderdate"].strftime("%Y-%m-%d") for r in rows], type=pa.string()
            ),
            "total_price_cents": pa.array(
                [_cents(r["o_totalprice"]) for r in rows], type=pa.int64()
            ),
            # quantities are integer-valued doubles, so the sum is exact
            "sum_qty": pa.array([int(r["sum_qty"]) for r in rows], type=pa.int64()),
        }
    )


def top_supplier_revenue(
    sf_dir: str, ship_from: str = "1996-01-01", ship_to: str = "1996-04-01"
) -> pa.Table:
    """TPC-H Q15-style top supplier(s): the supplier(s) with the maximum
    revenue over a 3-month ship-date window, ties included (Q15's
    view + MAX subquery semantics).

    Ray shape: the date window prunes at the parquet scan, revenue
    partials reduce map-side into a supplier-count-sized table, the MAX
    is one tiny ``aggregate``, and the equality filter + name attach
    touch only the winner rows.  Revenue stays double until ONE final
    cents conversion per supplier (the ``local_supplier_volume``
    convention), so the comparison key is the integer the oracle also
    computes."""
    import datetime

    import pyarrow.dataset as pads
    from ray.data.aggregate import Max

    lo = pa.scalar(datetime.datetime.fromisoformat(ship_from))
    hi = pa.scalar(datetime.datetime.fromisoformat(ship_to))

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table({"l_suppkey": batch.column("l_suppkey"), "revenue": rev})

    per_supp = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
            filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
        )
        .map_batches(revenue, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .map_batches(
            lambda b: pa.table(
                {
                    "l_suppkey": b.column("l_suppkey"),
                    "revenue_cents": _cents_array(b.column("revenue")),
                }
            ),
            batch_format="pyarrow",
        )
    )
    best = per_supp.aggregate(Max("revenue_cents", alias_name="best"))["best"]
    winners = sorted(
        per_supp.filter(expr=f"revenue_cents == {int(best)}").take_all(),
        key=lambda r: int(r["l_suppkey"]),
    )
    need = [int(r["l_suppkey"]) for r in winners]
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filter=pads.field("s_suppkey").isin(need),
    ).take_all()
    names = {int(s["s_suppkey"]): str(s["s_name"]) for s in supp}
    return pa.table(
        {
            "s_suppkey": pa.array(need, type=pa.int64()),
            "s_name": pa.array([names[k] for k in need], type=pa.string()),
            "revenue_cents": pa.array(
                [int(r["revenue_cents"]) for r in winners], type=pa.int64()
            ),
        }
    )


def copurchase_triangle_count(
    sf_dir: str, broadcast_max_nodes: int = 5_000_000
) -> pa.Table:
    """Distributed triangle counting over the part co-purchase graph
    (nodes = parts, an edge where two parts appear in the same order) —
    the degree-orientation algorithm, with every fan-out stage a
    VECTORIZED self-join (no per-group Python: a per-order/per-node
    ``map_groups`` version measured 247s at sf0.01; this shape runs the
    same data in seconds):

    1. distinct (order, part) pairs; edges = pairs ⋈ pairs on the order
       key, filtered to u < v, deduped by one ``groupby`` — the
       standard relational edge build;
    2. node degrees from one endpoint explode + ``groupby``;
    3. orient each edge from its lower (degree, node) endpoint to the
       higher — bounding out-neighborhoods by ~sqrt(E), which keeps the
       wedge fan-out polynomial under degree skew.  Degrees attach via
       a broadcast lookup below ``broadcast_max_nodes`` (node tables are
       ~sqrt of edge tables; parts here) and via two ``safe_join``s
       above it — the ``tfidf_top_term`` auto-switch convention;
    4. wedges = oriented ⋈ oriented on the low endpoint, keeping
       neighbor pairs ordered by the SAME (degree, node) total order,
       so a closing edge — if it exists — carries exactly that key;
    5. close: union-tag wedges and oriented edges on the pair key; one
       ``groupby`` counts wedges that meet an edge.  Each triangle is
       counted exactly once (at its lowest-degree vertex); no driver-
       side graph state beyond the optional degree broadcast.

    Oracle: a three-way self-join on the u<v edge list (orientation-
    independent count)."""
    import numpy as np

    from ._join import safe_join

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )
        .groupby(["l_orderkey", "l_partkey"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    left = pairs.map_batches(
        lambda b: pa.table({"ok_l": b.column("l_orderkey"), "u": b.column("l_partkey")}),
        batch_format="pyarrow",
    )
    right = pairs.map_batches(
        lambda b: pa.table({"ok_r": b.column("l_orderkey"), "v": b.column("l_partkey")}),
        batch_format="pyarrow",
    )
    # edges feeds degrees AND the degree-attach stage (and, on the join
    # path, two hash joins): materialize once — it is edge-sized, the
    # same class of intermediate connected_components pins — so the
    # expensive pairs self-join runs exactly once, and so no executed
    # plan ever contains more than ONE hash-shuffle join (chaining
    # joins in a single streaming plan deadlocks their aggregator
    # pools on small clusters; connected_components.py:473 precedent).
    edges = (
        safe_join(
            left, right, join_type="inner", num_partitions=8,
            on=("ok_l",), right_on=("ok_r",),
        )
        .map_batches(
            lambda b: b.filter(pc.less(b.column("u"), b.column("v"))).select(["u", "v"]),
            batch_format="pyarrow",
        )
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )

    degrees = (
        edges.map_batches(
            lambda b: pa.table(
                {
                    "node": pa.concat_arrays(
                        [b.column("u").combine_chunks(), b.column("v").combine_chunks()]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .materialize()  # node-sized; consumed 2-3 times below
    )

    n_nodes = degrees.count()
    if n_nodes <= broadcast_max_nodes:
        rows = degrees.take_all()
        nodes = np.array([int(r["node"]) for r in rows], dtype=np.int64)
        degs = np.array([int(r["deg"]) for r in rows], dtype=np.int64)
        order = np.argsort(nodes)
        deg_ref = ray.put((nodes[order], degs[order]))

        def attach_deg(batch: pa.Table) -> pa.Table:
            nd, dg = ray.get(deg_ref)
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            du = dg[np.searchsorted(nd, u)]
            dv = dg[np.searchsorted(nd, v)]
            return pa.table(
                {
                    "u": batch.column("u"),
                    "v": batch.column("v"),
                    "deg_u": pa.array(du, type=pa.int64()),
                    "deg_v": pa.array(dv, type=pa.int64()),
                }
            )

        with_deg = edges.map_batches(attach_deg, batch_format="pyarrow")
    else:  # node table too big to broadcast: two hash joins
        with_du = safe_join(
            edges, degrees, join_type="inner", num_partitions=8,
            on=("u",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table(
                {"u": b.column("u"), "v": b.column("v"), "deg_u": b.column("deg")}
            ),
            batch_format="pyarrow",
        ).materialize()  # one join per executed plan (see edges note)
        with_deg = safe_join(
            with_du, degrees, join_type="inner", num_partitions=8,
            on=("v",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table(
                {
                    "u": b.column("u"),
                    "v": b.column("v"),
                    "deg_u": b.column("deg_u"),
                    "deg_v": b.column("deg"),
                }
            ),
            batch_format="pyarrow",
        )

    def orient(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du = batch.column("deg_u").to_numpy(zero_copy_only=False)
        dv = batch.column("deg_v").to_numpy(zero_copy_only=False)
        # lexicographic (degree, node) total order — strict because node
        # ids are unique
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "lo": pa.array(np.where(u_first, u, v), type=pa.int64()),
                "hi": pa.array(np.where(u_first, v, u), type=pa.int64()),
                "hi_deg": pa.array(np.where(u_first, dv, du), type=pa.int64()),
            }
        )

    # the oriented edge list feeds THREE consumers (both wedge-join
    # sides + the closing edge keys); materialize once so it is not
    # recomputed — it is edge-sized (<< corpus-sized), the same class of
    # intermediate the dedup pipelines pin
    oriented = with_deg.map_batches(orient, batch_format="pyarrow").materialize()

    w_left = oriented.map_batches(
        lambda b: pa.table(
            {"lo_l": b.column("lo"), "x": b.column("hi"), "dx": b.column("hi_deg")}
        ),
        batch_format="pyarrow",
    )
    w_right = oriented.map_batches(
        lambda b: pa.table(
            {"lo_r": b.column("lo"), "y": b.column("hi"), "dy": b.column("hi_deg")}
        ),
        batch_format="pyarrow",
    )

    # --- close the wedges.  The wedge stream is the blow-up point
    # (Σ outdeg² rows ≈ 130x the edge count on the sf0.01 graph), so it
    # must NEVER feed a global shuffle raw.  Two closers, auto-switched
    # exactly like the degree attach:
    #   broadcast close (edge set fits + node ids pack into 32 bits):
    #     the closing-edge membership test runs INSIDE the wedge join's
    #     own map_batches via searchsorted on a ray.put sorted edge-code
    #     array — per-batch scalar counts are all that leave the tasks;
    #   join close (the scale path): wedges pre-aggregate per batch
    #     (lexsort-unique pair counts — the map-side combiner), then an
    #     INNER safe_join against the DISTINCT edge list keeps only
    #     closing pairs, and a Sum finishes.  No global pair groupby in
    #     either path (a union+groupby close measured 70s of the 82s
    #     total at sf0.01; the broadcast close runs the same graph in
    #     seconds).
    edge_arr = None
    n_edges = oriented.count()
    max_node = int(
        max(
            degrees.max("node") if n_nodes else 0,
            0,
        )
    )
    use_broadcast_close = (
        n_edges <= broadcast_max_nodes and 0 <= max_node < (1 << 31)
    )
    if use_broadcast_close:
        ed = oriented.take_all()
        edge_arr = np.sort(
            np.array(
                [(int(r["lo"]) << 32) | int(r["hi"]) for r in ed], dtype=np.int64
            )
        )
        edges_ref = ray.put(edge_arr)

        def count_closed(batch: pa.Table) -> pa.Table:
            codes = ray.get(edges_ref)
            x = batch.column("x").to_numpy(zero_copy_only=False)
            y = batch.column("y").to_numpy(zero_copy_only=False)
            dx = batch.column("dx").to_numpy(zero_copy_only=False)
            dy = batch.column("dy").to_numpy(zero_copy_only=False)
            keep = (dx < dy) | ((dx == dy) & (x < y))  # orient's total order
            probe = (x[keep] << 32) | y[keep]
            idx = np.searchsorted(codes, probe)
            idx[idx >= len(codes)] = len(codes) - 1 if len(codes) else 0
            n = int((codes[idx] == probe).sum()) if len(codes) else 0
            return pa.table({"t": pa.array([n], type=pa.int64())})

        closed = safe_join(
            w_left, w_right, join_type="inner", num_partitions=8,
            on=("lo_l",), right_on=("lo_r",),
        ).map_batches(count_closed, batch_format="pyarrow")
    else:
        def wedge_partials(batch: pa.Table) -> pa.Table:
            x = batch.column("x").to_numpy(zero_copy_only=False)
            y = batch.column("y").to_numpy(zero_copy_only=False)
            dx = batch.column("dx").to_numpy(zero_copy_only=False)
            dy = batch.column("dy").to_numpy(zero_copy_only=False)
            keep = (dx < dy) | ((dx == dy) & (x < y))
            xk, yk = x[keep], y[keep]
            order = np.lexsort((yk, xk))
            xs, ys = xk[order], yk[order]
            new = np.concatenate(
                ([True], (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1]))
            ) if len(xs) else np.zeros(0, dtype=bool)
            starts = np.flatnonzero(new)
            counts = np.diff(np.concatenate((starts, [len(xs)])))
            return pa.table(
                {
                    "x": pa.array(xs[starts], type=pa.int64()),
                    "y": pa.array(ys[starts], type=pa.int64()),
                    "n_wedges": pa.array(counts, type=pa.int64()),
                }
            )

        wedge_ds = safe_join(
            w_left, w_right, join_type="inner", num_partitions=8,
            on=("lo_l",), right_on=("lo_r",),
        ).map_batches(wedge_partials, batch_format="pyarrow").materialize()

        edge_pairs = oriented.map_batches(
            lambda b: pa.table({"ex": b.column("lo"), "ey": b.column("hi")}),
            batch_format="pyarrow",
        )
        closed = safe_join(
            wedge_ds, edge_pairs, join_type="inner", num_partitions=8,
            on=("x", "y"), right_on=("ex", "ey"),
        ).map_batches(
            lambda b: pa.table({"t": b.column("n_wedges")}), batch_format="pyarrow"
        )
    total = closed.aggregate(Sum("t", alias_name="triangles"))["triangles"]
    return pa.table({"triangles": pa.array([int(total or 0)], type=pa.int64())})


def type_value_trend(sf_dir: str) -> pa.Table:
    """Grouped OLS regression (per-event-type trend of ``value`` over
    time) from EXACT sufficient statistics — the distributed-regression
    pattern: one streaming pass emits per-batch integer partials
    (n, Σx, Σy, Σxy, Σx²) per type with x = whole days since epoch and
    y = integer cents, a type-count-sized table reaches the driver, and
    the normal-equation arithmetic runs in arbitrary-precision Python
    ints (n·Σxy overflows int64 at billions of rows; the PARTIALS never
    do — per-block sums are block-bounded).  slope/intercept then come
    from ONE staged IEEE-double expression shared with the oracle
    (HUGEINT arithmetic + CAST AS DOUBLE on the SQL side), so the float
    output is bit-identical.  No shuffle at all: partials -> driver.
    Same moments discipline as ``zscore_by_type`` above."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        days = (
            pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        cents = np.array(
            [int(round(round(float(v), 2) * 100)) for v in vals], dtype=np.int64
        )
        types = np.asarray(batch.column("event_type").to_pylist())
        rows = []
        for t in np.unique(types):
            m = types == t
            x, y = days[m], cents[m]
            rows.append(
                (
                    str(t),
                    int(m.sum()),
                    int(x.sum()),
                    int(y.sum()),
                    int((x * y).sum()),
                    int((x * x).sum()),
                )
            )
        names = ["event_type", "n", "sx", "sy", "sxy", "sxx"]
        return pa.table(
            {
                nm: pa.array(
                    [r[i] for r in rows],
                    type=pa.string() if i == 0 else pa.int64(),
                )
                for i, nm in enumerate(names)
            }
        )

    stats: dict[str, list[int]] = {}
    for row in ds.map_batches(partials, batch_format="pyarrow").take_all():
        s = stats.setdefault(row["event_type"], [0, 0, 0, 0, 0])
        for i, k in enumerate(("n", "sx", "sy", "sxy", "sxx")):
            s[i] += int(row[k])

    out = []
    for t in sorted(stats):
        n, sx, sy, sxy, sxx = stats[t]
        num = n * sxy - sx * sy  # exact bigints — the overflow-free zone
        den = n * sxx - sx * sx
        if den == 0:
            slope, intercept = None, None
        else:
            slope = float(num) / float(den)
            intercept = (float(sy) - slope * float(sx)) / float(n)
        out.append((t, n, slope, intercept))
    return pa.table(
        {
            "event_type": pa.array([o[0] for o in out], type=pa.string()),
            "n": pa.array([o[1] for o in out], type=pa.int64()),
            "slope_cents_per_day": pa.array([o[2] for o in out], type=pa.float64()),
            "intercept_cents": pa.array([o[3] for o in out], type=pa.float64()),
        }
    )


def binational_volume(sf_dir: str) -> pa.Table:
    """TPC-H Q7-style international shipping volume: revenue between
    DIFFERENT customer/supplier nations, grouped by (supplier nation,
    customer nation, ship year).  Same topology as
    ``local_supplier_volume`` above (the correlated-dimension fact-fact
    join): dimension key maps broadcast once via ``ray.put`` and
    annotate their fact stream inside ``map_batches``, the single real
    shuffle is the orderkey hash join shipping (orderkey, natkey,
    year, revenue) tuples, and the inequality filter + nation-pair
    groupby run on the join output.  Result is nation²·years-sized;
    names attach to the aggregate, never to the fact stream."""
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).take_all()
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).take_all()
    nations = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    name_of = {int(n["n_nationkey"]): str(n["n_name"]) for n in nations}
    supp_nat = pa.table(
        {
            "l_suppkey": pa.array([s["s_suppkey"] for s in supp], type=pa.int64()),
            "s_nationkey": pa.array(
                [int(s["s_nationkey"]) for s in supp], type=pa.int64()
            ),
        }
    )
    cust_nat = pa.table(
        {
            "o_custkey": pa.array([c["c_custkey"] for c in cust], type=pa.int64()),
            "c_nationkey": pa.array(
                [int(c["c_nationkey"]) for c in cust], type=pa.int64()
            ),
        }
    )
    supp_ref, cust_ref = ray.put(supp_nat), ray.put(cust_nat)

    def lineitem_side(batch: pa.Table) -> pa.Table:
        # per-row contribution floored to int64 MICRO-dollars, so the
        # group sums are order-independent-exact (the bm25/lm_perplexity
        # integer-units pattern): Q7 groups are only a few rows each and
        # a double Sum measurably lands 1 ulp off the oracle's
        # sequential sum on half-cent boundaries
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        micro = pc.cast(pc.floor(pc.multiply(rev, pa.scalar(1e6))), pa.int64())
        t = pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_suppkey": batch.column("l_suppkey"),
                "l_year": pc.cast(pc.year(batch.column("l_shipdate")), pa.int64()),
                "micro": micro,
            }
        )
        return t.join(
            ray.get(supp_ref), keys="l_suppkey", join_type="inner"
        ).drop_columns(["l_suppkey"])

    def orders_side(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "o_custkey": batch.column("o_custkey"),
            }
        )
        return t.join(
            ray.get(cust_ref), keys="o_custkey", join_type="inner"
        ).drop_columns(["o_custkey"])

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(lineitem_side, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(orders_side, batch_format="pyarrow")

    from ._join import safe_join

    joined = safe_join(
        lineitem,
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def international_only(batch: pa.Table) -> pa.Table:
        mask = pc.not_equal(batch.column("s_nationkey"), batch.column("c_nationkey"))
        kept = batch.filter(mask)
        return kept.select(["s_nationkey", "c_nationkey", "l_year", "micro"])

    agg = (
        joined.map_batches(international_only, batch_format="pyarrow")
        .groupby(["s_nationkey", "c_nationkey", "l_year"])
        .aggregate(Count(alias_name="n_items"), Sum("micro", alias_name="micro"))
    )
    rows = sorted(
        agg.take_all(),
        key=lambda r: (
            name_of[int(r["s_nationkey"])],
            name_of[int(r["c_nationkey"])],
            int(r["l_year"]),
        ),
    )
    return pa.table(
        {
            "supp_nation": pa.array(
                [name_of[int(r["s_nationkey"])] for r in rows], type=pa.string()
            ),
            "cust_nation": pa.array(
                [name_of[int(r["c_nationkey"])] for r in rows], type=pa.string()
            ),
            "l_year": pa.array([int(r["l_year"]) for r in rows], type=pa.int64()),
            "n_items": pa.array([int(r["n_items"]) for r in rows], type=pa.int64()),
            # cents from integer micro-units with INTEGER half-up
            # division — the 4-decimal revenue terms make exact
            # half-cent sums routine in small groups, where float
            # ROUND (half-away) and Python round (correctly-rounded
            # decimal) disagree; integers have no tie ambiguity
            "revenue_cents": pa.array(
                [(int(r["micro"]) + 5000) // 10000 for r in rows], type=pa.int64()
            ),
        }
    )


def _local_skyline(batch: pa.Table) -> pa.Table:
    """Vectorized 2-D max-skyline over one block: sort by (qty desc,
    rev desc); a point is dominated iff the max revenue among STRICTLY
    greater qty is >= its revenue, or a same-qty point has STRICTLY
    greater revenue.  Exact-duplicate points dominate nothing (no
    strict coordinate), matching SQL NOT-EXISTS dominance."""
    import numpy as np

    if len(batch) == 0:
        return batch
    qty = batch.column("total_qty").to_numpy(zero_copy_only=False)
    rev = batch.column("revenue_cents").to_numpy(zero_copy_only=False)
    order = np.lexsort((-rev, -qty))
    q, r = qty[order], rev[order]
    # group boundaries of equal qty in the sorted view
    new_grp = np.concatenate(([True], q[1:] != q[:-1]))
    grp = np.cumsum(new_grp) - 1
    # max rev within each qty group = first element of the group (rev desc)
    grp_max = r[new_grp][grp]
    # running max of rev over STRICTLY greater qty groups (exclusive)
    starts_max = np.maximum.accumulate(r[new_grp])  # inclusive per group
    m1 = np.where(grp == 0, np.int64(-1), starts_max[np.maximum(grp - 1, 0)])
    dominated = (m1 >= r) | (grp_max > r)
    keep = order[~dominated]
    keep.sort()
    return batch.take(pa.array(keep))


def part_skyline(sf_dir: str) -> pa.Table:
    """Pareto frontier (2-D max-skyline) of parts by (total quantity,
    total revenue) — the distributed-skyline pattern: any globally
    non-dominated point is non-dominated in every subset containing it,
    so a per-block LOCAL skyline pass prunes the part table down to
    block-skyline survivors (tiny), and ONE coalesced final pass over
    the union computes the exact global frontier.  No all-pairs work
    ever leaves a block; the driver never sees the part table.
    Dominance runs on exact integers (integral quantities; per-part
    revenue rounded ONCE to cents with the shared ``_cents`` rule), so
    engine and oracle agree on every tie."""
    def project(batch: pa.Table) -> pa.Table:
        # int64 micro-dollar contributions: dominance needs EXACT group
        # revenues — a 1-ulp double-sum divergence can flip a tie and
        # change the frontier membership (same discipline as Q7 above)
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table(
            {
                "l_partkey": batch.column("l_partkey"),
                "qty": batch.column("l_quantity"),
                "micro": pc.cast(pc.floor(pc.multiply(rev, pa.scalar(1e6))), pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(project, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("qty", alias_name="qty"), Sum("micro", alias_name="micro"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # integer half-up cents (see binational_volume: float rounding
        # is tie-ambiguous exactly where dominance needs exactness)
        cents = pc.divide(
            pc.add(batch.column("micro"), pa.scalar(5000, pa.int64())),
            pa.scalar(10000, pa.int64()),
        )
        return pa.table(
            {
                "l_partkey": batch.column("l_partkey"),
                "total_qty": pc.cast(pc.round(batch.column("qty")), pa.int64()),
                "revenue_cents": cents,
            }
        )

    survivors = (
        agg.map_batches(finalize, batch_format="pyarrow")
        .map_batches(_local_skyline, batch_format="pyarrow")  # local prune
        .repartition(1)
        .map_batches(_local_skyline, batch_format="pyarrow")  # exact global pass
    )
    rows = sorted(survivors.take_all(), key=lambda r: int(r["l_partkey"]))
    return pa.table(
        {
            "l_partkey": pa.array([int(r["l_partkey"]) for r in rows], type=pa.int64()),
            "total_qty": pa.array([int(r["total_qty"]) for r in rows], type=pa.int64()),
            "revenue_cents": pa.array(
                [int(r["revenue_cents"]) for r in rows], type=pa.int64()
            ),
        }
    )


def orders_priority_pivot(sf_dir: str) -> pa.Table:
    """PIVOT / crosstab: order counts as (priority rows) x (year
    columns) — the BI-shaped wide output.  Ray shape: ONE long-format
    ``groupby(priority, year)`` count (priorities x years partials;
    map-side combined), then the priority-count-sized pivot happens on
    the driver — the wide schema is metadata, never a shuffle.  Year
    columns are the fixed 1995-2001 span of the generated data (a
    static schema is what makes the result SQL-checkable; out-of-span
    years would add columns, not break rows)."""
    years = list(range(1995, 2002))
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_orderdate"]
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "priority": batch.column("o_orderpriority"),
                "y": pc.cast(pc.year(batch.column("o_orderdate")), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(["priority", "y"])
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    cells: dict[str, dict[int, int]] = {}
    for r in agg:
        cells.setdefault(r["priority"], {})[int(r["y"])] = int(r["n"])
    prios = sorted(cells)
    cols: dict[str, pa.Array] = {
        "o_orderpriority": pa.array(prios, type=pa.string())
    }
    for y in years:
        cols[f"y{y}"] = pa.array(
            [cells[p].get(y, 0) for p in prios], type=pa.int64()
        )
    cols["total"] = pa.array(
        [sum(cells[p].values()) for p in prios], type=pa.int64()
    )
    return pa.table(cols)


def weighted_price_quantiles(sf_dir: str) -> pa.Table:
    """Exact WEIGHTED order statistics (p25/median/p75 of extended
    price, weighted by quantity) without a global sort — the weighted
    twin of ``global_value_quantiles``: ONE ``groupby(cents)`` bounded
    by the price RANGE (not row count) sums integer weights per value,
    the driver prefix-sums the tiny table, and each quantile is the
    SMALLEST value whose cumulative weight crosses the exact integer
    threshold ``4*cum >= k*total`` — all-integer comparisons, no
    interpolation, no float anywhere."""
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = np.array(
            [int(round(round(float(v), 2) * 100)) for v in vals], dtype=np.int64
        )
        w = np.round(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        order = np.argsort(cents, kind="stable")
        cs, ws = cents[order], w[order]
        new = np.concatenate(([True], cs[1:] != cs[:-1])) if len(cs) else np.zeros(0, bool)
        starts = np.flatnonzero(new)
        sums = np.add.reduceat(ws, starts) if len(cs) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "cents": pa.array(cs[starts], type=pa.int64()),
                "w": pa.array(sums, type=pa.int64()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("w", alias_name="w"))
        .take_all()
    )
    rows.sort(key=lambda r: int(r["cents"]))
    cents = np.array([int(r["cents"]) for r in rows], dtype=np.int64)
    cum = np.cumsum(np.array([int(r["w"]) for r in rows], dtype=np.int64))
    tot = int(cum[-1]) if len(cum) else 0
    out = {}
    for name, k in (("p25_cents", 1), ("median_cents", 2), ("p75_cents", 3)):
        idx = int(np.searchsorted(4 * cum, k * tot))  # first 4*cum >= k*tot
        out[name] = int(cents[idx]) if len(cents) else None
    return pa.table(
        {
            "p25_cents": pa.array([out["p25_cents"]], type=pa.int64()),
            "median_cents": pa.array([out["median_cents"]], type=pa.int64()),
            "p75_cents": pa.array([out["p75_cents"]], type=pa.int64()),
        }
    )


def acctbal_histogram(sf_dir: str, width_cents: int = 100_000) -> pa.Table:
    """Equi-width histogram of supplier account balances: fixed $1000
    bins via TRUNCATING integer division (DuckDB ``//`` truncates
    toward zero on negatives — numpy floors, so the engine mirrors
    truncation explicitly with sign-aware division).  One map-side
    combined groupby over bin ids; bin-count-sized result."""
    import numpy as np

    ds = ray.data.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column("s_acctbal").to_numpy(zero_copy_only=False)
        cents = np.array(
            [int(round(round(float(v), 2) * 100)) for v in vals], dtype=np.int64
        )
        bins = np.sign(cents) * (np.abs(cents) // width_cents)  # trunc division
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(uniq, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    rows = sorted(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n_suppliers"))
        .take_all(),
        key=lambda r: int(r["bin"]),
    )
    return pa.table(
        {
            "bin": pa.array([int(r["bin"]) for r in rows], type=pa.int64()),
            "lo_cents": pa.array(
                [int(r["bin"]) * width_cents for r in rows], type=pa.int64()
            ),
            "n_suppliers": pa.array(
                [int(r["n_suppliers"]) for r in rows], type=pa.int64()
            ),
        }
    )


def _copurchase_edges(sf_dir: str) -> "ray.data.Dataset":
    """Shared co-purchase edge build (see copurchase_triangle_count
    step 1): distinct (order, part) pairs self-joined on the order key,
    u < v, with per-edge SUPPORT (number of distinct orders containing
    both parts) — the frequent-itemset count.  Edge-sized, materialized
    by callers that consume it more than once."""
    from ._join import safe_join

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )
        .groupby(["l_orderkey", "l_partkey"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )
    left = pairs.map_batches(
        lambda b: pa.table({"ok_l": b.column("l_orderkey"), "u": b.column("l_partkey")}),
        batch_format="pyarrow",
    )
    right = pairs.map_batches(
        lambda b: pa.table({"ok_r": b.column("l_orderkey"), "v": b.column("l_partkey")}),
        batch_format="pyarrow",
    )
    return (
        safe_join(
            left, right, join_type="inner", num_partitions=8,
            on=("ok_l",), right_on=("ok_r",),
        )
        .map_batches(
            lambda b: b.filter(pc.less(b.column("u"), b.column("v"))).select(["u", "v"]),
            batch_format="pyarrow",
        )
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="support"))
    )


def copurchase_top_pairs(sf_dir: str, min_support: int = 2, k: int = 25) -> pa.Table:
    """Frequent-itemset mining, pair stage (the A-Priori L2 step):
    part pairs co-purchased in >= ``min_support`` distinct orders,
    top-``k`` by (support DESC, u, v).  The support counting IS the
    relational edge build (one self-join + one pair groupby); the
    top-k is a distributed sort/limit over the min_support-filtered
    pair table — never the raw pair stream."""
    ds = (
        _copurchase_edges(sf_dir)
        .map_batches(
            lambda b: b.filter(
                pc.greater_equal(b.column("support"), pa.scalar(min_support))
            ),
            batch_format="pyarrow",
        )
        .sort(["support", "u", "v"], descending=[True, False, False])
        .limit(k)
    )
    rows = ds.take_all()
    return pa.table(
        {
            "u": pa.array([int(r["u"]) for r in rows], type=pa.int64()),
            "v": pa.array([int(r["v"]) for r in rows], type=pa.int64()),
            "support": pa.array([int(r["support"]) for r in rows], type=pa.int64()),
        }
    )


def copurchase_degree_distribution(sf_dir: str) -> pa.Table:
    """Degree distribution of the co-purchase graph: nodes-per-degree —
    the graph-shape profile (power-law check) every graph pipeline
    starts with.  Two nested groupbys over edge-/node-sized tables;
    the endpoint explode is a zero-copy concat."""
    degrees = (
        _copurchase_edges(sf_dir)
        .map_batches(
            lambda b: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            b.column("u").combine_chunks().cast(pa.int64()),
                            b.column("v").combine_chunks().cast(pa.int64()),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
    )
    rows = sorted(
        degrees.groupby("deg").aggregate(Count(alias_name="n_nodes")).take_all(),
        key=lambda r: int(r["deg"]),
    )
    return pa.table(
        {
            "deg": pa.array([int(r["deg"]) for r in rows], type=pa.int64()),
            "n_nodes": pa.array([int(r["n_nodes"]) for r in rows], type=pa.int64()),
        }
    )


def copurchase_bfs_depths(sf_dir: str, max_depth: int = 4) -> pa.Table:
    """Distributed BFS: minimum hop distance from the graph's min part
    id over co-purchase edges, out to ``max_depth`` — the iterative
    frontier-expansion shape (the message-passing loop shared with
    ``dedup.connected_components``): each round is ONE ``safe_join`` of
    the current frontier against the materialized adjacency plus a
    ``groupby(node).min(depth)`` fold of new reaches into the label
    table; per-round state is node-sized, the driver sees one count per
    round, and the loop stops early when a round reaches nobody new.

    Oracle: a recursive CTE whose UNION dedups (node, depth) pairs —
    the same min-depth fixpoint."""
    import numpy as np

    from ray.data.aggregate import Min as AggMin

    from ._join import safe_join

    edges = _copurchase_edges(sf_dir).drop_columns(["support"])
    adj = edges.map_batches(
        lambda b: pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        b.column("u").combine_chunks().cast(pa.int64()),
                        b.column("v").combine_chunks().cast(pa.int64()),
                    ]
                ),
                "peer": pa.concat_arrays(
                    [
                        b.column("v").combine_chunks().cast(pa.int64()),
                        b.column("u").combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    src = adj.min("node")
    if src is None:
        return pa.table(
            {
                "node": pa.array([], type=pa.int64()),
                "depth": pa.array([], type=pa.int64()),
            }
        )
    labels = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array([int(src)], type=pa.int64()),
                "depth": pa.array([0], type=pa.int64()),
            }
        )
    ).materialize()
    frontier = labels
    n_labeled = 1
    for d in range(1, max_depth + 1):
        reached = safe_join(
            adj, frontier, join_type="inner", num_partitions=4, on=("node",)
        ).map_batches(
            lambda b, d=d: pa.table(
                {
                    "node": b.column("peer"),
                    "depth": pa.array(
                        np.full(len(b), d, dtype=np.int64), type=pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(reached)
            .groupby("node")
            .aggregate(AggMin("depth", alias_name="depth"))
            .materialize()
        )
        new_count = labels.count()
        if new_count == n_labeled:
            break
        # next frontier: exactly the nodes first reached THIS round
        frontier = labels.map_batches(
            lambda b, d=d: b.filter(pc.equal(b.column("depth"), pa.scalar(d))),
            batch_format="pyarrow",
        ).materialize()
        n_labeled = new_count

    rows = sorted(labels.take_all(), key=lambda r: int(r["node"]))
    return pa.table(
        {
            "node": pa.array([int(r["node"]) for r in rows], type=pa.int64()),
            "depth": pa.array([int(r["depth"]) for r in rows], type=pa.int64()),
        }
    )


def copurchase_kcore(sf_dir: str, k: int = 6, max_rounds: int = 30) -> pa.Table:
    """k-core decomposition by distributed peeling: iteratively delete
    every node with degree < ``k`` (and its edges) until the remaining
    subgraph is stable — the classic graph-sparsification pass before
    community/cohesion analysis.  Each round is: one ``groupby(node)``
    degree count, a vectorized survivor filter, and TWO ``safe_join``
    semi-joins pruning the edge list to surviving endpoints (each join
    in its own executed plan, the chained-join discipline); the edge
    table shrinks monotonically and the driver sees one edge count per
    round.  Returns the surviving (node, degree-in-core) rows.  Not
    SQL-expressible (iterative fixpoint over a shrinking multiset) —
    gated by a single-process peeling reference in pytest."""
    from ray.data.aggregate import Count as AggCount

    from ._join import safe_join

    edges = _copurchase_edges(sf_dir).drop_columns(["support"]).materialize()
    n_edges = edges.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        degrees = (
            edges.map_batches(
                lambda b: pa.table(
                    {
                        "node": pa.concat_arrays(
                            [
                                b.column("u").combine_chunks().cast(pa.int64()),
                                b.column("v").combine_chunks().cast(pa.int64()),
                            ]
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(AggCount(alias_name="deg"))
            .materialize()
        )
        survivors = degrees.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b.column("deg"), pa.scalar(k))
            ).select(["node"]),
            batch_format="pyarrow",
        ).materialize()
        if survivors.count() == 0:
            # a FULLY empty join side defeats even safe_join's
            # repartition coalescing (no schema-carrying block exists
            # to coalesce) — and the answer is already known
            n_edges = 0
            break
        pruned_u = safe_join(
            edges, survivors, join_type="inner", num_partitions=4,
            on=("u",), right_on=("node",),
        ).map_batches(
            lambda b: b.select(["u", "v"]), batch_format="pyarrow"
        ).materialize()
        pruned = safe_join(
            pruned_u, survivors, join_type="inner", num_partitions=4,
            on=("v",), right_on=("node",),
        ).map_batches(
            lambda b: b.select(["u", "v"]), batch_format="pyarrow"
        ).materialize()
        new_edges = pruned.count()
        if new_edges == n_edges:
            break
        edges, n_edges = pruned, new_edges

    if n_edges == 0:
        return pa.table(
            {
                "node": pa.array([], type=pa.int64()),
                "core_deg": pa.array([], type=pa.int64()),
            }
        )
    final = (
        edges.map_batches(
            lambda b: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            b.column("u").combine_chunks().cast(pa.int64()),
                            b.column("v").combine_chunks().cast(pa.int64()),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(AggCount(alias_name="core_deg"))
    )
    rows = sorted(final.take_all(), key=lambda r: int(r["node"]))
    return pa.table(
        {
            "node": pa.array([int(r["node"]) for r in rows], type=pa.int64()),
            "core_deg": pa.array([int(r["core_deg"]) for r in rows], type=pa.int64()),
        }
    )


def orders_with_all_flags(sf_dir: str) -> pa.Table:
    """Relational DIVISION (the 'suppliers who stock ALL parts' shape):
    orders whose lineitems span every return flag present in the
    corpus.  Two-stage distinct aggregate — per-batch (order, flag)
    pre-dedup, one pair groupby, then an order-level flag count
    compared to the GLOBAL distinct flag count (computed from the same
    pair table, no second corpus pass); output is the qualifying order
    count plus the flag cardinality it divided by."""
    import numpy as np

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
        )
        .groupby(["l_orderkey", "l_returnflag"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )
    n_flags = pairs.groupby("l_returnflag").aggregate(Count(alias_name="_n")).count()
    per_order = pairs.groupby("l_orderkey").aggregate(Count(alias_name="n_flags"))
    qualifying = per_order.map_batches(
        lambda b: b.filter(pc.equal(b.column("n_flags"), pa.scalar(n_flags))),
        batch_format="pyarrow",
    ).count()
    return pa.table(
        {
            "n_orders": pa.array([int(qualifying)], type=pa.int64()),
            "n_flags": pa.array([int(n_flags)], type=pa.int64()),
        }
    )


def orders_ivm_by_nation(sf_dir: str, delta_days: int = 90) -> pa.Table:
    """Incremental view maintenance for a JOIN view — maintain
    ``orders ⋈ customer -> per-nation (n_orders, total_cents)`` when a
    delta of new orders arrives, WITHOUT recomputing the base: the
    view's delta is ``delta_orders ⋈ customer`` aggregated (the
    classic dV = dA ⋈ B for an insert-only delta into a key-joined
    view), merged into the base aggregate by integer addition.  The
    base/delta split here is the last ``delta_days`` of order dates
    (integer day arithmetic, identical in the oracle); the merged
    result must equal the full recompute — which is exactly what the
    oracle computes, so the incremental path is verified against the
    batch semantics it must preserve.  Customer nation keys broadcast
    once; each side is one scan + one nation-sized aggregate."""
    import numpy as np

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).take_all()
    cmap_keys = np.array([int(c["c_custkey"]) for c in cust], dtype=np.int64)
    cmap_nat = np.array([int(c["c_nationkey"]) for c in cust], dtype=np.int64)
    order_c = np.argsort(cmap_keys)
    cref = ray.put((cmap_keys[order_c], cmap_nat[order_c]))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    hi_day = pc.cast(pa.scalar(orders.max("o_orderdate")), pa.int64()).as_py() // 86_400_000_000
    cutoff = hi_day - delta_days  # day > cutoff => delta partition

    def agg_side(is_delta: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ck, cn = ray.get(cref)
            days = (
                pc.cast(batch.column("o_orderdate"), pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                // 86_400_000_000
            )
            m = (days > cutoff) if is_delta else (days <= cutoff)
            keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)[m]
            vals = batch.column("o_totalprice").to_numpy(zero_copy_only=False)[m]
            cents = np.array(
                [int(round(round(float(v), 2) * 100)) for v in vals], dtype=np.int64
            )
            nat = cn[np.searchsorted(ck, keys)]
            uniq, inv = np.unique(nat, return_inverse=True)
            n = np.bincount(inv)
            s = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(s, inv, cents)  # integer scatter-add — exact
            return pa.table(
                {
                    "nation": pa.array(uniq, type=pa.int64()),
                    "n_orders": pa.array(n.astype(np.int64), type=pa.int64()),
                    "cents": pa.array(s, type=pa.int64()),
                }
            )

        return (
            orders.map_batches(fn, batch_format="pyarrow")
            .groupby("nation")
            .aggregate(
                Sum("n_orders", alias_name="n_orders"), Sum("cents", alias_name="cents")
            )
        )

    base = {  # the standing view (nation-sized)
        int(r["nation"]): [int(r["n_orders"]), int(r["cents"])]
        for r in agg_side(False).take_all()
    }
    # delta maintenance: add dV into the view by key
    for r in agg_side(True).take_all():
        v = base.setdefault(int(r["nation"]), [0, 0])
        v[0] += int(r["n_orders"])
        v[1] += int(r["cents"])
    nations = sorted(base)
    return pa.table(
        {
            "nation": pa.array(nations, type=pa.int64()),
            "n_orders": pa.array([base[n][0] for n in nations], type=pa.int64()),
            "total_cents": pa.array([base[n][1] for n in nations], type=pa.int64()),
        }
    )


def orders_delayed_by_priority(sf_dir: str, grace_days: int = 60) -> pa.Table:
    """TPC-H Q4-shaped EXISTS semi-join with a cross-table predicate:
    count orders, by priority, having ANY lineitem shipped more than
    ``grace_days`` after the order date.  Shape: the per-order
    ``MAX(l_shipdate)`` pre-aggregate FIRST collapses the fact stream
    to an order-sized table (the semi-join's EXISTS needs only the
    max), then ONE order-key ``safe_join`` against orders applies the
    day-arithmetic predicate vectorized and a priority-sized groupby
    finishes.  Day math is integer µs//86400e6 on both sides."""
    from ray.data.aggregate import Max

    from ._join import safe_join

    last_ship = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "l_orderkey": b.column("l_orderkey"),
                    "ship_day": pc.cast(
                        pc.divide(
                            pc.cast(b.column("l_shipdate"), pa.int64()),
                            pa.scalar(86_400_000_000),
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("l_orderkey")
        .aggregate(Max("ship_day", alias_name="max_ship_day"))
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "order_day": pc.cast(
                    pc.divide(
                        pc.cast(b.column("o_orderdate"), pa.int64()),
                        pa.scalar(86_400_000_000),
                    ),
                    pa.int64(),
                ),
                "o_orderpriority": b.column("o_orderpriority"),
            }
        ),
        batch_format="pyarrow",
    )
    joined = safe_join(
        orders, last_ship, join_type="inner", num_partitions=8,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )
    agg = (
        joined.map_batches(
            lambda b: b.filter(
                pc.greater(
                    b.column("max_ship_day"),
                    pc.add(b.column("order_day"), pa.scalar(grace_days)),
                )
            ).select(["o_orderpriority"]),
            batch_format="pyarrow",
        )
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_delayed"))
    )
    rows = sorted(agg.take_all(), key=lambda r: r["o_orderpriority"])
    return pa.table(
        {
            "o_orderpriority": pa.array(
                [r["o_orderpriority"] for r in rows], type=pa.string()
            ),
            "n_delayed": pa.array([int(r["n_delayed"]) for r in rows], type=pa.int64()),
        }
    )


def returned_item_customers(sf_dir: str, k: int = 20) -> pa.Table:
    """TPC-H Q10-shaped returned-item ranking: top-``k`` customers by
    revenue lost to returned lineitems (``l_returnflag = 'R'``).  The
    return-flag predicate pushes into the parquet scan, per-row
    contributions floor to int64 micro-dollars (the Q7 discipline — an
    integer-exact sum at any grouping), ONE orderkey ``safe_join``
    attaches customers, and the customer-sized aggregate sorts
    distributed for the top-k; nation names attach to the k rows on
    the driver."""
    import numpy as np
    import pyarrow.dataset as pads

    from ._join import safe_join

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R",
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "micro": pc.cast(
                    pc.floor(
                        pc.multiply(
                            pc.multiply(
                                b.column("l_extendedprice"),
                                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                            ),
                            pa.scalar(1e6),
                        )
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    joined = safe_join(
        lineitem, orders, join_type="inner", num_partitions=16,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    top = (
        joined.groupby("o_custkey")
        .aggregate(Sum("micro", alias_name="micro"))
        .sort(["micro", "o_custkey"], descending=[True, False])
        .limit(k)
        .take_all()
    )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).take_all()
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nation_of = {int(c["c_custkey"]): int(c["c_nationkey"]) for c in cust}
    name_of = {int(n["n_nationkey"]): str(n["n_name"]) for n in nat}
    # presentation order matches the oracle's final ORDER BY on ROUNDED
    # cents (micro order can differ from cents order on rounding ties)
    rows = sorted(
        (
            (
                int(r["o_custkey"]),
                (int(r["micro"]) + 5000) // 10000,
            )
            for r in top
        ),
        key=lambda t: (-t[1], t[0]),
    )
    return pa.table(
        {
            "c_custkey": pa.array([t[0] for t in rows], type=pa.int64()),
            "n_name": pa.array(
                [name_of[nation_of[t[0]]] for t in rows], type=pa.string()
            ),
            "revenue_cents": pa.array([t[1] for t in rows], type=pa.int64()),
        }
    )


def segment_status_matrix(sf_dir: str) -> pa.Table:
    """Two-dimension dimensional aggregate: order counts and exact
    total cents per (market segment, order status) — the
    segment-health matrix a BI layer serves.  Customer segment map
    broadcasts once via ``ray.put``; one annotated scan of orders and
    one (segments x statuses)-sized groupby."""
    import numpy as np

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).take_all()
    keys = np.array([int(c["c_custkey"]) for c in cust], dtype=np.int64)
    segs = np.array([str(c["c_mktsegment"]) for c in cust])
    order = np.argsort(keys)
    seg_ref = ray.put((keys[order], segs[order]))

    def annotate(batch: pa.Table) -> pa.Table:
        ck, sg = ray.get(seg_ref)
        custkeys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        vals = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.array(
            [int(round(round(float(v), 2) * 100)) for v in vals], dtype=np.int64
        )
        return pa.table(
            {
                "segment": pa.array(sg[np.searchsorted(ck, custkeys)], type=pa.string()),
                "status": batch.column("o_orderstatus"),
                "cents": pa.array(cents, type=pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderstatus", "o_totalprice"],
        )
        .map_batches(annotate, batch_format="pyarrow")
        .groupby(["segment", "status"])
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents"))
    )
    rows = sorted(agg.take_all(), key=lambda r: (r["segment"], r["status"]))
    return pa.table(
        {
            "segment": pa.array([r["segment"] for r in rows], type=pa.string()),
            "status": pa.array([r["status"] for r in rows], type=pa.string()),
            "n_orders": pa.array([int(r["n_orders"]) for r in rows], type=pa.int64()),
            "total_cents": pa.array(
                [int(r["total_cents"]) for r in rows], type=pa.int64()
            ),
        }
    )


def cms_user_counts(
    sf_dir: str, width: int = 512, depth: int = 4, n_probe: int = 20
) -> pa.Table:
    """Count-min sketch of per-user event counts — the THIRD mergeable
    sketch family (HLL = distinct, Misra-Gries = heavy hitters, CMS =
    point frequency): each block scatter-adds its events into a d x w
    int64 counter array (no keys in the partial — the sketch IS the
    partial), arrays merge by elementwise addition through a (r, b)
    groupby, and point estimates are ``min_r counter[r][h_r(key)]``,
    an overestimate by construction.  Hashing is splitmix64 +
    Kirsch-Mitzenmacher double hashing (``(h1 + r*h2) mod w`` with
    h1/h2 the 32-bit halves — small-integer arithmetic the SQL oracle
    replays exactly).  Output: the ``n_probe`` most active users with
    exact count and CMS estimate; the est >= exact invariant is part
    of the contract (asserted in pytest at any width)."""
    import numpy as np

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(users)
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        h2 = (h >> np.uint64(32)).astype(np.int64)
        counters = np.zeros((depth, width), dtype=np.int64)
        for r in range(depth):
            np.add.at(counters[r], (h1 + r * h2) % width, 1)
        rs, bs = np.nonzero(counters)
        return pa.table(
            {
                "r": pa.array(rs.astype(np.int64), type=pa.int64()),
                "b": pa.array(bs.astype(np.int64), type=pa.int64()),
                "c": pa.array(counters[rs, bs], type=pa.int64()),
            }
        )

    sketch_rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["r", "b"])
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    counters = np.zeros((depth, width), dtype=np.int64)
    for row in sketch_rows:
        counters[int(row["r"]), int(row["b"])] = int(row["c"])

    exact = (
        ds.groupby("user_id").aggregate(Count(alias_name="n"))
        .sort(["n", "user_id"], descending=[True, False])
        .limit(n_probe)
        .take_all()
    )
    users = np.array([int(r["user_id"]) for r in exact], dtype=np.int64)
    h = _splitmix64(users)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = (h >> np.uint64(32)).astype(np.int64)
    ests = np.min(
        np.stack([counters[r][(h1 + r * h2) % width] for r in range(depth)]), axis=0
    )
    return pa.table(
        {
            "user_id": pa.array(users, type=pa.int64()),
            "exact_n": pa.array([int(r["n"]) for r in exact], type=pa.int64()),
            "cms_estimate": pa.array(ests, type=pa.int64()),
        }
    )


def part_abc_classes(sf_dir: str) -> pa.Table:
    """ABC / Pareto analysis: classify parts by cumulative revenue
    share — A while the running share is < 80%, B until < 95%, else C
    (thresholds compared in EXACT integers: ``5*cum < 4*total`` and
    ``20*cum < 19*total``, so no float share ever exists).  Shape: the
    part-revenue aggregate (micro-unit integer sums, the Q7
    discipline) sorts DISTRIBUTED by (revenue DESC, part), and the
    classification is a prefix-sum scan of the part-sized result; ties
    and boundary rows are deterministic because the prefix is over
    exact integers in a total order."""
    import numpy as np

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "l_partkey": b.column("l_partkey"),
                    "micro": pc.cast(
                        pc.floor(
                            pc.multiply(
                                pc.multiply(
                                    b.column("l_extendedprice"),
                                    pc.subtract(
                                        pa.scalar(1.0), b.column("l_discount")
                                    ),
                                ),
                                pa.scalar(1e6),
                            )
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("l_partkey")
        .aggregate(Sum("micro", alias_name="micro"))
        .sort(["micro", "l_partkey"], descending=[True, False])
    )
    rows = agg.take_all()  # part-sized
    parts = np.array([int(r["l_partkey"]) for r in rows], dtype=np.int64)
    micro = [int(r["micro"]) for r in rows]
    total = sum(micro)
    cum = 0
    classes = []
    for m in micro:
        cum += m
        if 5 * cum < 4 * total:
            classes.append("A")
        elif 20 * cum < 19 * total:
            classes.append("B")
        else:
            classes.append("C")
    order = np.argsort(parts, kind="stable")
    return pa.table(
        {
            "l_partkey": pa.array(parts[order], type=pa.int64()),
            "revenue_cents": pa.array(
                [(micro[i] + 5000) // 10000 for i in order], type=pa.int64()
            ),
            "abc_class": pa.array([classes[i] for i in order], type=pa.string()),
        }
    )


def type_value_medians(sf_dir: str) -> pa.Table:
    """Exact per-group medians without sorting any group: per
    (event_type, cents) counts (bounded by types x value RANGE, not by
    rows), per-type prefix sums on the driver, and the lower median is
    the smallest value with ``2*cum >= total`` — all-integer threshold
    crossing, the grouped form of ``weighted_price_quantiles``."""
    import numpy as np

    def cents_col(batch: pa.Table) -> pa.Table:
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        cents = np.array(
            [int(round(round(float(v), 2) * 100)) for v in vals], dtype=np.int64
        )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": pa.array(cents, type=pa.int64()),
            }
        )

    rows = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(cents_col, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((int(r["cents"]), int(r["n"])))
    out_t, out_m, out_n = [], [], []
    for t in sorted(by_type):
        series = sorted(by_type[t])
        total = sum(n for _, n in series)
        cum = 0
        for c, n in series:
            cum += n
            if 2 * cum >= total:
                out_t.append(t)
                out_m.append(c)
                out_n.append(total)
                break
    return pa.table(
        {
            "event_type": pa.array(out_t, type=pa.string()),
            "median_cents": pa.array(out_m, type=pa.int64()),
            "n_events": pa.array(out_n, type=pa.int64()),
        }
    )


def nation_balance_comparison(sf_dir: str) -> pa.Table:
    """Conformed-dimension two-fact comparison: supplier vs customer
    account-balance totals per nation in ONE result — the union-tagged
    aggregate shape (tag each fact stream, aggregate once, pivot the
    two tags driver-side) instead of two pipelines and a join.  Cents
    are exact integers; averages are one staged division per cell."""
    import numpy as np

    def project(acct_col: str, nat_col: str, tag: str):
        def fn(batch: pa.Table) -> pa.Table:
            vals = batch.column(acct_col).to_numpy(zero_copy_only=False)
            cents = np.array(
                [int(round(round(float(v), 2) * 100)) for v in vals], dtype=np.int64
            )
            return pa.table(
                {
                    "nation": pc.cast(batch.column(nat_col), pa.int64()),
                    "tag": pa.array([tag] * len(batch), type=pa.string()),
                    "cents": pa.array(cents, type=pa.int64()),
                }
            )

        return fn

    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    ).map_batches(project("s_acctbal", "s_nationkey", "supplier"), batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    ).map_batches(project("c_acctbal", "c_nationkey", "customer"), batch_format="pyarrow")

    agg = (
        supp.union(cust)
        .groupby(["nation", "tag"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="cents"))
        .take_all()
    )
    cells: dict[int, dict[str, tuple[int, int]]] = {}
    for r in agg:
        cells.setdefault(int(r["nation"]), {})[r["tag"]] = (
            int(r["n"]),
            int(r["cents"]),
        )
    nations = sorted(cells)

    def avg(nation: int, tag: str):
        n, c = cells[nation].get(tag, (0, 0))
        return None if n == 0 else float(c) / float(n)

    return pa.table(
        {
            "nation": pa.array(nations, type=pa.int64()),
            "n_suppliers": pa.array(
                [cells[n].get("supplier", (0, 0))[0] for n in nations], type=pa.int64()
            ),
            "supp_avg_cents": pa.array(
                [avg(n, "supplier") for n in nations], type=pa.float64()
            ),
            "n_customers": pa.array(
                [cells[n].get("customer", (0, 0))[0] for n in nations], type=pa.int64()
            ),
            "cust_avg_cents": pa.array(
                [avg(n, "customer") for n in nations], type=pa.float64()
            ),
        }
    )
