"""Hierarchy flattening — the WITH RECURSIVE shape (org charts, BOM
explosion, category trees): every node of a parent-pointer forest resolves
to its ROOT and DEPTH.

Sequential engines walk pointers row-at-a-time; the distributed form is
POINTER DOUBLING: a label table (node, ptr, d) where ptr starts at the
parent and d at the hop count (0 for roots, which self-loop).  Each round
joins the labels against themselves on ``ptr = node`` and composes:
``ptr ← ptr.ptr, d ← d + ptr.d`` — after r rounds every chain of length
≤ 2^r is fully resolved, so ceil(log2(max_depth)) rounds finish the whole
forest.  Roots are fixed points (self-join contributes +0), so extra rounds
are harmless no-ops — the round count is derived from a depth BOUND, never
from a driver-side convergence scan.

Each round is one distributed hash join (O(|nodes|) shuffled per round,
O(log depth) rounds total) — the scale path; a broadcast parent map would
put the whole tree on the driver.  Cf. the undirected analogue in
``stages/neardup.py`` (min-label propagation) and ``stages/graph.py``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def resolve_roots(
    ds: rd.Dataset,
    *,
    node_col: str,
    parent_col: str,
    max_depth: int,
    num_partitions: int = 2,
) -> rd.Dataset:
    """(node, parent) Dataset → (node, root, depth) Dataset.

    A row whose ``parent == node`` is a root (depth 0).  ``max_depth`` is a
    BOUND on the longest chain (e.g. ``ceil(log_b(max_id)) + 1`` for a
    ``parent = node // b`` tree); rounds = ceil(log2(max_depth)), and
    overshooting only wastes a no-op round.

    ``num_partitions`` sizes EVERY round's hash join: each partition adds
    fixed shuffle-actor cost per round (measured: 4→2 partitions cut a
    3-round resolve from 47 s to 6 s at 1.5 k nodes), so keep it small at
    small scale and raise it with |nodes| (same sweep evidence as the
    ``Dataset.join`` num_partitions table in CLAUDE.md)."""

    def init(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_root = pc.equal(t[node_col], t[parent_col])
        d = pc.if_else(is_root, 0, 1)
        return pa.table(
            {
                "node": t[node_col],
                "ptr": t[parent_col],
                "d": pc.cast(d, pa.int64()),
            }
        )

    labels = ds.map_batches(init, batch_format="pyarrow")

    rounds = max(1, (max(1, max_depth) - 1).bit_length())
    for _ in range(rounds):
        right = labels.map_batches(
            lambda t: pa.table({"rnode": t["node"], "rptr": t["ptr"], "rd": t["d"]}),
            batch_format="pyarrow",
        )
        joined = labels.join(
            right,
            join_type="inner",
            num_partitions=num_partitions,
            on=("ptr",),
            right_on=("rnode",),
        )
        # materialize each round: labels are O(|nodes|) narrow rows, and an
        # iterative plan left lazy would chain every round's shuffle fleet
        # into ONE execution — more concurrent actors than small clusters
        # have CPUs (observed deadlock at 4 CPUs).  Same per-iteration
        # discipline as k-means / PageRank.
        labels = joined.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "ptr": t["rptr"],
                    "d": pa.compute.add(t["d"], t["rd"]),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "root": t["ptr"], "depth": t["d"]}),
        batch_format="pyarrow",
    )
