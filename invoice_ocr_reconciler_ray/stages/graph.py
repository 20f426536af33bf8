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


def triangle_count_per_node(
    nodes_ds,
    edges_ds,
    *,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
):
    """Dataset(node) × Dataset(src, dst) → Dataset(node, n_triangles): the
    number of triangles each node participates in (undirected, self-loops
    ignored) — the third graph op next to PageRank and connected
    components, and the standard clustering-coefficient numerator.

    Shape: the edge list is collected once and broadcast as a CSR-style
    sorted-neighbor adjacency (``ray.put`` — same documented O(|edges|)
    bound as cluster_pairs); each node block counts its nodes' triangles
    with vectorized ``np.intersect1d`` over neighbor lists (node u's count
    = ½ Σ_{v ∈ N(u)} |N(u) ∩ N(v)|).  Nodes stream — no shuffle.  For
    graphs whose edge list outgrows a broadcast, partition by the standard
    u<v<w orientation (each edge to its lower endpoint's partition) — the
    documented scale path, same note as cluster_pairs."""
    import numpy as np
    import ray
    import ray.data as rd  # noqa: F401

    batches = list(
        edges_ds.select_columns([src_col, dst_col]).iter_batches(
            batch_format="pyarrow"
        )
    )
    adj: dict[int, "np.ndarray"] = {}
    if batches:
        et = pa.concat_tables(batches)
        u = et.column(src_col).to_numpy(zero_copy_only=False)
        v = et.column(dst_col).to_numpy(zero_copy_only=False)
        keep = u != v
        u, v = u[keep], v[keep]
        src = np.concatenate([u, v])
        dst = np.concatenate([v, u])
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        # dedup parallel edges
        if len(src):
            first = np.ones(len(src), dtype=bool)
            first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            src, dst = src[first], dst[first]
        bounds = np.searchsorted(src, np.unique(src))
        uniq = np.unique(src)
        ends = np.append(bounds[1:], len(src))
        for n, lo, hi in zip(uniq, bounds, ends):
            adj[int(n)] = dst[lo:hi]  # sorted by construction
    from .broadcast import guard_broadcast_bytes

    guard_broadcast_bytes(
        int(sum(a.nbytes for a in adj.values())),
        label="triangle-count adjacency",
        alternative="hash-partition edges by min-endpoint and count wedges "
        "via a per-partition Dataset.join instead of a broadcast adjacency",
    )
    adj_ref = ray.put(adj)

    def count(t: pa.Table) -> pa.Table:
        import numpy as np

        a = ray.get(adj_ref)
        out = []
        for n in t[node_col].to_pylist():
            nb = a.get(int(n))
            if nb is None or len(nb) < 2:
                out.append(0)
                continue
            tri = 0
            for v2 in nb:
                nb2 = a.get(int(v2))
                if nb2 is not None:
                    tri += len(np.intersect1d(nb, nb2, assume_unique=True))
            out.append(tri // 2)
        return pa.table(
            {
                node_col: t[node_col],
                "n_triangles": pa.array(out, pa.int64()),
            }
        )

    return nodes_ds.map_batches(count, batch_format="pyarrow")
