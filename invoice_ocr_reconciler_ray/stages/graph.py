"""Generic connected components over an explicit (src, dst) edge Dataset.

A thin, reusable front on the SAME distributed min-label propagation the
near-dup clustering runs (``stages/neardup.py:cluster_pairs``): every node
starts labeled with itself; each round every node takes the min label in
its undirected neighborhood (one ``groupby(node)`` shuffle per round);
stops at the first unchanged round.  Labels stay a distributed Dataset end
to end; the edge list is broadcast once via ``ray.put`` (documented
O(|edges|) driver/broadcast bound — edges are the SMALL side for the
workloads this engine targets: near-dup pair lists, citation/hub graphs).
Rounds needed = graph diameter, so callers pick ``max_rounds`` from the
topology they feed it; non-convergence raises rather than truncating.

This front is what upgrades the clustering machinery from rows-only to
ORACLE-checked: ``events_graph_components`` runs it on a deterministic
hash-derived graph and DuckDB recomputes the components with a recursive
transitive-closure CTE (pipelines/queries.py).
"""

from __future__ import annotations

import pyarrow as pa


def connected_components(
    nodes_ds,
    edges_ds,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 8,
):
    """Dataset(node) × Dataset(src, dst) → Dataset(node, component) where
    component = min node id reachable over undirected edges.  ``nodes_ds``
    may carry duplicates (e.g. block-local distinct only) — the per-round
    min-reduction collapses them; the output is distinct per node."""
    from . import neardup

    ids = nodes_ds.map_batches(
        lambda t: pa.table({"doc_id": t[node_col]}), batch_format="pyarrow"
    )
    pairs = edges_ds.map_batches(
        lambda t: pa.table({"id_a": t[src_col], "id_b": t[dst_col]}),
        batch_format="pyarrow",
    )
    labs = neardup.cluster_pairs(ids, pairs, max_rounds=max_rounds)
    return labs.map_batches(
        lambda t: pa.table({node_col: t["doc_id"], "component": t["cluster_id"]}),
        batch_format="pyarrow",
    )
