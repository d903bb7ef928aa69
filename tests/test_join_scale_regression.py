"""Regression for the round-4 driver-scale crash: Ray 2.49's hash-shuffle
``Dataset.join`` dies with ``ArrowInvalid ... FieldRef.Name(...)`` when a
join partition receives only schema-less empty blocks — a condition that
only materializes at high CPU counts (groupby/map_groups emit ~64 blocks
for a handful of rows at 32 CPUs, so 16-partition joins see all-empty
partitions), never on the 4-CPU pytest cluster.  The session fixture runs
at 4 CPUs, so this test spawns a fresh 32-CPU Ray instance in a
SUBPROCESS to reproduce the driver's exact condition and prove the
``safe_join`` guard and the join-free ``connected_components`` hold
there.

Skipped below 32 host CPUs (the hazard needs the real block fan-out)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import sys
sys.path.insert(0, %(repo)r)
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         ignore_reinit_error=True)
import pyarrow as pa
import ray.data
from opentelemetry_collector_symbolicator_ray.pipelines._join import safe_join
from opentelemetry_collector_symbolicator_ray.pipelines.dedup import (
    connected_components,
)

edges = ray.data.from_arrow(
    pa.table({"doc_a": pa.array([1, 2, 3], pa.int64()),
              "doc_b": pa.array([2, 3, 4], pa.int64())})
)

# groupby().map_groups at 32 CPUs fans a 4-row table into ~64 blocks,
# most of them the schema-less empties that break the raw join
def to_nodes(b):
    both = pa.concat_arrays([
        b.column("doc_a").combine_chunks().cast(pa.int64()),
        b.column("doc_b").combine_chunks().cast(pa.int64()),
    ])
    return pa.table({"node": both, "label": both})

labels = (
    edges.map_batches(to_nodes, batch_format="pyarrow")
    .groupby("node").map_groups(lambda g: g.slice(0, 1),
                                batch_format="pyarrow")
    .materialize()
)
la = labels.map_batches(
    lambda b: pa.table({"_na": b.column("node"), "_la": b.column("label")}),
    batch_format="pyarrow",
)

# 1) the guarded join must succeed at the exact failing partition count
out = safe_join(edges, la, join_type="inner", num_partitions=16,
                on=("doc_a",), right_on=("_na",))
assert out.count() == 3, out.count()

# 2) the join-free connected components must converge on the same input
got = {r["node"]: r["component"] for r in connected_components(edges).take_all()}
assert got == {1: 1, 2: 1, 3: 1, 4: 1}, got

# 3) the full registered query that crashed at driver scale in round 4:
# LSH pairs -> distributed CC -> anti-join filter, at 32 CPUs
from opentelemetry_collector_symbolicator_ray.pipelines.dedup import (
    near_dedup_keep,
)

kept = near_dedup_keep("/root/testdata/sf0.001", cc="distributed").count()
assert kept > 0, kept
print("DCC_QUERY_ROWS", kept)

# 4) document whether the raw join still crashes (informational: a Ray
# upgrade may fix it; the guard must stay correct either way)
try:
    edges.join(la, join_type="inner", num_partitions=16,
               on=("doc_a",), right_on=("_na",)).count()
    print("RAW_JOIN_OK")
except Exception:
    print("RAW_JOIN_STILL_CRASHES")

ray.shutdown()
print("SCALE_REGRESSION_PASS")
"""


@pytest.mark.skipif((os.cpu_count() or 0) < 32,
                    reason="needs 32 host CPUs to reproduce the block fan-out")
def test_safe_join_and_cc_at_driver_scale():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"},
    )
    assert "SCALE_REGRESSION_PASS" in proc.stdout, (
        proc.stdout[-2000:] + "\n--- stderr ---\n" + proc.stderr[-2000:]
    )
