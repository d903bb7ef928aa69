"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.001 (override with GRAFT_PARITY_SF_DIR) and compare row-count +
schema + order-insensitive values against oracle_sql() via DuckDB.

Dtype-strict: the driver's value-hash is dtype-sensitive (round 3's
only red row was an engine int64 vs an oracle HUGEINT->float64 window
sum with bit-identical values), so numeric KIND mismatches here are
failures, not tolerated coercions."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = os.environ.get("GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def assert_frames_match(ray_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str):
    a, b = normalize(ray_df), normalize(oracle_df)
    assert list(a.columns) == list(b.columns), f"{name}: column mismatch {a.columns} vs {b.columns}"
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for col in a.columns:
        ak, bk = a[col].dtype.kind, b[col].dtype.kind
        assert ak == bk, (
            f"{name}.{col}: dtype kind mismatch engine={a[col].dtype} "
            f"oracle={b[col].dtype} — the driver's value-hash is "
            f"dtype-sensitive; cast the oracle (or engine) so kinds agree"
        )
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            # NULLs (e.g. unmatched LEFT-asof rows) surface as NaN/NaT;
            # null==null for parity (the driver's hash is byte-stable)
            if (x is None or (not isinstance(x, (list, tuple)) and pd.isna(x))) and (
                y is None or (not isinstance(y, (list, tuple)) and pd.isna(y))
            ):
                continue
            if isinstance(x, float) or isinstance(y, float):
                assert math.isclose(float(x), float(y), rel_tol=0, abs_tol=1e-9), (
                    f"{name}.{col}[{i}]: {x} != {y}"
                )
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(ray_session, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    ray_df = to_pandas(q(SF_DIR))
    oracle_df = con.execute(sql).fetchdf()
    assert_frames_match(ray_df, oracle_df, name)
    # The driver's value-hash is ROW-ORDER-sensitive; when the oracle
    # pins an order (ORDER BY), the engine must emit the same row order,
    # not just the same multiset (round-4 advice: orders_rollup appended
    # subtotal rows in engine order and only the sorted compare hid it).
    if "order by" in sql.lower():
        a = ray_df[sorted(ray_df.columns)].reset_index(drop=True)
        b = oracle_df[sorted(oracle_df.columns)].reset_index(drop=True)
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            mismatch = next(
                (
                    i
                    for i, (x, y) in enumerate(zip(av, bv))
                    if not (
                        (x is None or (not isinstance(x, (list, tuple)) and pd.isna(x)))
                        and (y is None or (not isinstance(y, (list, tuple)) and pd.isna(y)))
                    )
                    and not (
                        math.isclose(float(x), float(y), rel_tol=0, abs_tol=1e-9)
                        if isinstance(x, float) or isinstance(y, float)
                        else x == y
                    )
                ),
                None,
            )
            assert mismatch is None, (
                f"{name}.{col}: row ORDER diverges from the oracle's ORDER BY "
                f"at row {mismatch}: engine={av[mismatch]!r} oracle={bv[mismatch]!r}"
            )


def test_rows_only_queries_run(ray_session):
    qs = entry_mod.queries()
    for name in sorted(set(qs) - set(ORACLE_KEYS)):
        if name.startswith("sym_"):
            continue  # covered in test_entry_contract
        df = to_pandas(qs[name](SF_DIR))
        assert len(df) >= 0 and len(df.columns) > 0


def test_entry_contract(ray_session):
    df = to_pandas(entry_mod.entry())
    assert len(df) >= 1
    assert "sink" in df.columns

    counts = to_pandas(entry_mod.queries()["sym_sink_counts"](SF_DIR))
    assert set(counts["sink"]) == {"js", "android", "apple", "unsymbolicated"}
    routed = to_pandas(entry_mod.queries()["sym_routed_rows"](SF_DIR))
    assert len(routed) == counts["rows"].sum()
