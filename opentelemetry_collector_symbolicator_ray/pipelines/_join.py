"""Hardened ``Dataset.join`` wrapper shared by every pipeline join site.

Ray Data's hash-shuffle join (2.49) crashes when a join partition is fed
ONLY schema-less zero-row blocks: upstream ``groupby().map_groups`` /
``flat_map`` / filter stages can emit empty blocks that carry no Arrow
schema, the ``HashShuffleAggregator`` then finalizes a schema-less empty
table for that partition, and pyarrow's ``Table.join`` dies with
``ArrowInvalid: No match or multiple matches for key field reference
FieldRef.Name(...)``.  This is a *small-data + many-partitions* hazard —
exactly the shape of a label/edge table from LSH dedup on a modest corpus
(round-4 red row ``docs_near_dedup_keep_dcc``) — so it bites at driver
scale (32 CPUs → 16 partitions) while a 4-CPU pytest run (2 partitions)
never sees it.

Empirically verified guards (Ray 2.49.2, 32-CPU local cluster, real
LSH-derived 28-row / 64-block edge table):

- raw join at 16 partitions:          **crashes**
- clamp to 2 partitions:              OK
- ``repartition(k)`` on ONE side:     still **crashes**
- ``repartition(k)`` on BOTH sides:   OK (k=4 blocks, 16 partitions)

``repartition(n)`` (no shuffle — a split/merge pass) concatenates the
schema-less empties into real schema-carrying blocks, so every aggregator
partition sees at least a typed zero-row slice.  Both sides must be
treated.  The merge pass is one extra linear read of each side; for the
small/medium tables these joins handle that is noise, and it removes the
scale-dependent crash class entirely.

LIMITATION: a FULLY empty side (every block filtered to zero rows, e.g.
an empty LSH pair set on a dup-free corpus) still crashes — there is no
schema-carrying block for ``repartition`` to coalesce.  Callers whose
side can legitimately be empty must guard with ``count() == 0`` and
short-circuit to the trivially-known result (precedents:
``dedup.connected_components`` empty-adjacency guard,
``dedup.near_dedup_keep`` empty-drops guard,
``analytics.copurchase_kcore`` empty-survivors guard).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Tuple

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def safe_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    join_type: str,
    on: Tuple[str, ...],
    right_on: Optional[Tuple[str, ...]] = None,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """``left.join(right, ...)`` with both sides coalesced to
    ``num_partitions`` schema-carrying blocks first (see module
    docstring for why one-sided coalescing is NOT enough)."""
    left = left.repartition(num_partitions)
    right = right.repartition(num_partitions)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )
