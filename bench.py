#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline symbolication pipeline plus representative
training-data queries over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "rows": ..., "rows_per_sec": ..., "tokens_per_sec": ...}

``--scaling`` runs the headline pipeline in two fresh processes at
num_cpus=N/4 and N on the same input and reports throughput at both plus
the scaling efficiency (the sandbox stand-in for the north rule's
N vs 4N node criterion; results are recorded in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def sf_of(sf_dir: str) -> float:
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_corpus(sf_dir: str) -> tuple[str, int]:
    """Headline-pipeline corpus: larger than the correctness corpus so
    the actor pool is actually saturated."""
    from opentelemetry_collector_symbolicator_ray.synth import generate_corpus

    sf = sf_of(sf_dir)
    rows = max(4000, int(400_000 * sf))
    out = f"/tmp/ocsr_bench/sf{sf}-r{rows}-s42"
    generate_corpus(out, rows, num_files=16, seed=42)
    return out, rows


def run_headline(sf_dir: str, num_cpus: int) -> dict:
    import ray
    import ray.data

    from opentelemetry_collector_symbolicator_ray.config import PipelineConfig
    from opentelemetry_collector_symbolicator_ray.pipelines.symbolicate import (
        input_files,
        per_sink_aggregates,
        symbolicate,
    )

    corpus, rows = bench_corpus(sf_dir)
    cfg = PipelineConfig.with_default_routing(
        os.path.join(corpus, "artifacts"),
        concurrency=max(2, num_cpus - 2),
        batch_size=512,
    )

    started = time.perf_counter()
    ds = ray.data.read_parquet(input_files(corpus))
    agg = per_sink_aggregates(symbolicate(ds, cfg))
    elapsed = time.perf_counter() - started

    n_tokens_ds = ray.data.read_parquet(input_files(corpus), columns=["n_tok"])
    n_tokens = int(n_tokens_ds.sum("n_tok"))
    return {
        "seconds": elapsed,
        "rows": rows,
        "tokens": n_tokens,
        "rows_per_sec": rows / elapsed,
        "tokens_per_sec": n_tokens / elapsed,
        "sinks": {r["sink"]: int(r["rows"]) for r in agg.to_pylist()},
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as entry_mod

    timings: dict[str, float] = {}
    picks = [
        "docs_exact_dedup",
        "docs_token_counts",
        "docs_minhash_lsh_pairs",
        "emb_knn",
        "emb_neardup_pairs",
        "events_by_type",
        "lineitem_pricing",
        "top_customers",
    ]
    queries = entry_mod.queries()
    for name in picks:
        started = time.perf_counter()
        result = queries[name](sf_dir)
        # consume lazily-built datasets
        if hasattr(result, "materialize"):
            result.materialize()
        timings[name] = round(time.perf_counter() - started, 3)
    return timings


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--headline-only", action="store_true", help=argparse.SUPPRESS)
    parser.add_argument("--num-cpus", type=int, default=None, help=argparse.SUPPRESS)
    args = parser.parse_args()

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = args.num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if args.scaling:
        # Two fresh processes at num_cpus/4 and num_cpus on the same input.
        low = max(2, num_cpus // 4)
        results = {}
        for n in (low, num_cpus):
            out = subprocess.run(
                [sys.executable, __file__, "--headline-only", "--num-cpus", str(n)],
                capture_output=True,
                text=True,
                env={**os.environ, "GRAFT_SF_DIR": sf_dir},
                check=True,
            )
            results[n] = json.loads(out.stdout.strip().splitlines()[-1])
        eff = results[num_cpus]["rows_per_sec"] / (
            (num_cpus / low) * results[low]["rows_per_sec"]
        )
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency (rows/s at 4N vs 4x rows/s at N)",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "low_cpus": low,
                    "high_cpus": num_cpus,
                    "low_rows_per_sec": round(results[low]["rows_per_sec"], 1),
                    "high_rows_per_sec": round(results[num_cpus]["rows_per_sec"], 1),
                    "sf": sf_of(sf_dir),
                }
            )
        )
        return

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)

    headline = run_headline(sf_dir, num_cpus)
    if args.headline_only:
        print(json.dumps({"rows_per_sec": headline["rows_per_sec"], **headline}))
        ray.shutdown()
        return

    queries = run_queries(sf_dir)
    total = round(headline["seconds"] + sum(queries.values()), 3)
    queries = {"symbolicate_headline": round(headline["seconds"], 3), **queries}
    print(
        json.dumps(
            {
                "metric": "symbolicated sequences/sec on pre-tokenized corpus + training-data query suite",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf_of(sf_dir),
                "num_cpus": num_cpus,
                "rows": headline["rows"],
                "rows_per_sec": round(headline["rows_per_sec"], 1),
                "tokens_per_sec": round(headline["tokens_per_sec"], 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
