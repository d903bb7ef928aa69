"""Streaming-shaped operators over the ordered ``events`` log.

Ray Data has no event-time windows/watermarks; the engine expresses
windowed semantics as batch operators over the partitioned log
(guide-recommended shape): tumbling windows are a derived-window-key
groupby; sessionization is ``groupby(user).map_groups`` with per-group
ordering by ``ts``.  Ordering assumption: per-group windowing sorts by
``ts`` inside the group (equal timestamps are session/window-neutral),
so results are independent of physical row order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

US_PER_HOUR = 3600 * 1_000_000


def _compact_sort(ds: "ray.data.Dataset", keys, blocks: int = 16) -> "ray.data.Dataset":
    """Sort an AGGREGATE-SIZED Dataset after compacting it: grouped
    aggregates emit hundreds of near-empty blocks, and Ray's sort pays
    per-block sampling/shuffle overhead (~0.7s on a 1000-row table).
    Repartitioning to a handful of blocks first halves that fixed cost;
    only use on results that are aggregate-sized (windows, users,
    labels), never on corpus-sized data."""
    return ds.repartition(blocks).sort(keys)


def _window_cents(batch: pa.Table, key: str) -> pa.Table:
    """Streaming cents conversion for windowed aggregates (the window
    table grows with the time range — never a driver-side loop).

    The per-value loop is deliberate: ``pc.round`` (binary half-even)
    disagrees with Python's correctly-rounded decimal ``round`` on
    exact .xx5 halves (measured: 8k+ divergences per 200k adversarial
    values), and these cents feed hash-exact oracle comparisons.  The
    batch here is window-count-sized, not corpus-sized."""
    cents = [
        int(round(round(float(v), 2) * 100))
        for v in batch.column("total_value").to_pylist()
    ]
    return pa.table(
        {
            "event_type": batch.column("event_type"),
            key: pc.cast(batch.column(key), pa.int64()),
            "n_events": pc.cast(batch.column("n_events"), pa.int64()),
            "total_value_cents": pa.array(cents, type=pa.int64()),
        }
    )


def tumbling_event_counts(sf_dir: str, window_us: int = US_PER_HOUR) -> "ray.data.Dataset":
    """Tumbling windows per event type: window key derived vectorized in
    map_batches (no shuffle), then a grouped aggregate.  The result is
    window-count-sized (grows with the time range), so it streams out as
    a sorted Dataset."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        epoch_us = pc.cast(batch.column("ts"), pa.int64())
        window_id = pc.divide(epoch_us, pa.scalar(window_us, type=pa.int64()))
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_id": window_id,
                "value": batch.column("value"),
            }
        )

    agg = (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
        .map_batches(lambda b: _window_cents(b, "window_id"), batch_format="pyarrow")
    )
    return _compact_sort(agg, ["event_type", "window_id"])


def user_sessions(sf_dir: str, gap_us: int = 1800 * 1_000_000) -> "ray.data.Dataset":
    """Gap-based sessionization: groupby(user).map_groups sorts each
    user's events by ts and counts gap-breaks — the canonical Ray shape
    for per-key stateful windowing (one group = one key's full log).
    Arrow-native per group: zero-copy ts -> numpy, no pandas hop."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def sessions(group: pa.Table) -> pa.Table:
        ts = np.sort(pc.cast(group.column("ts"), pa.int64()).to_numpy(zero_copy_only=False))
        n_sessions = 1 + int((np.diff(ts) > gap_us).sum()) if len(ts) else 0
        return pa.table(
            {
                "user_id": pa.array([group.column("user_id")[0].as_py()], type=pa.int64()),
                "n_events": pa.array([len(ts)], type=pa.int64()),
                "n_sessions": pa.array([n_sessions], type=pa.int64()),
            }
        )

    # user-count-sized: stream the sorted result
    return _compact_sort(
        ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow"), "user_id"
    )


def hopping_event_counts(
    sf_dir: str, window_us: int = US_PER_HOUR, hop_us: int = 900 * 1_000_000
) -> "ray.data.Dataset":
    """Hopping (sliding) windows: each event belongs to window_size/hop
    overlapping windows, expanded VECTORIZED inside map_batches
    (np.repeat row fan-out — the flat_map shape), then the same grouped
    aggregate as tumbling windows.  ``hop_id`` is the window's start
    bucket (start = hop_id * hop_us)."""
    k = window_us // hop_us
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def expand(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        base = us // hop_us
        n = len(base)
        idx = np.repeat(np.arange(n), k)
        hop_ids = np.repeat(base, k) - np.tile(np.arange(k), n)
        keep = hop_ids >= 0
        out = pa.table(
            {
                "event_type": batch.column("event_type").take(pa.array(idx[keep])),
                "hop_id": pa.array(hop_ids[keep], type=pa.int64()),
                "value": batch.column("value").take(pa.array(idx[keep])),
            }
        )
        return out

    agg = (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "hop_id"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="total_value"))
        .map_batches(lambda b: _window_cents(b, "hop_id"), batch_format="pyarrow")
    )
    return _compact_sort(agg, ["event_type", "hop_id"])


def running_user_totals(sf_dir: str) -> "ray.data.Dataset":
    """Per-user RUNNING total (the cumulative window aggregate —
    SUM OVER PARTITION BY user ORDER BY ts): ``groupby(user_id)``
    co-locates each user's log, ``map_groups`` sorts it by
    (ts, event_id) and emits the cumulative sum.  Values convert to
    integer cents BEFORE accumulation (per-value round is bit-identical
    across engines; integer cumsum is exact), so the SQL window oracle
    hash-matches regardless of float summation order.  Returns a
    Dataset (one row per event) sorted by event_id."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def running(group: pa.Table) -> pa.Table:
        ts = pc.cast(group.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        val = group.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        cents = np.array(
            [int(round(round(float(v), 2) * 100)) for v in val[order]], dtype=np.int64
        )
        run = np.cumsum(cents)
        uid = int(group.column("user_id")[0].as_py())
        return pa.table(
            {
                "event_id": pa.array(eid[order], type=pa.int64()),
                "user_id": pa.array([uid] * len(eid), type=pa.int64()),
                "running_cents": pa.array(run, type=pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(running, batch_format="pyarrow").sort("event_id")


def event_type_percentiles(sf_dir: str) -> pa.Table:
    """Median / p90 of value per event type (quantile_cont semantics:
    linear interpolation, exactly numpy's default) — the per-group
    order-statistic aggregate: ``groupby(event_type).map_groups`` sorts
    the group's values once and reads both quantiles from it."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def quantiles(group: pa.Table) -> pa.Table:
        vals = np.sort(group.column("value").to_numpy(zero_copy_only=False))
        med = float(np.quantile(vals, 0.5))
        p90 = float(np.quantile(vals, 0.9))
        return pa.table(
            {
                "event_type": pa.array([group.column("event_type")[0].as_py()]),
                "n_events": pa.array([len(vals)], type=pa.int64()),
                "median_cents": pa.array(
                    [int(round(round(med, 2) * 100))], type=pa.int64()
                ),
                "p90_cents": pa.array([int(round(round(p90, 2) * 100))], type=pa.int64()),
            }
        )

    rows = sorted(
        ds.groupby("event_type").map_groups(quantiles, batch_format="pyarrow").take_all(),
        key=lambda r: r["event_type"],
    )
    return pa.Table.from_pylist(rows)
