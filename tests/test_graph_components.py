"""Generic connected-components stage: hand-built topologies through the
distributed min-label propagation (chain, two components, isolated node,
duplicate node rows)."""

import pyarrow as pa
import ray.data as rd

from invoice_ocr_reconciler_ray.stages.graph import connected_components


def test_components_chain_two_comps_isolated(ray_session):
    # chain 5-4-3-2-1 (diameter 4 — needs several propagation rounds),
    # separate pair 10-11, isolated node 20
    nodes = rd.from_arrow(
        pa.table({"node": pa.array([1, 2, 3, 4, 5, 10, 11, 20], pa.int64())})
    )
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([5, 4, 3, 2, 10], pa.int64()),
                "dst": pa.array([4, 3, 2, 1, 11], pa.int64()),
            }
        )
    )
    out = (
        connected_components(nodes, edges, max_rounds=8)
        .to_pandas()
        .set_index("node")
        .component
    )
    assert out.to_dict() == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}
    assert str(out.dtype) == "int64"


def test_components_duplicate_node_rows_collapse(ray_session):
    """nodes_ds with duplicate rows (block-local distinct only) still yields
    one output row per node."""
    nodes = rd.from_arrow(
        pa.table({"node": pa.array([1, 1, 2, 2, 3], pa.int64())})
    )
    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64())}
        )
    )
    out = connected_components(nodes, edges).to_pandas()
    assert len(out) == 3
    assert out.set_index("node").component.to_dict() == {1: 1, 2: 1, 3: 3}


def test_triangle_counts_hand_graph(ray_session):
    """K4 on {1,2,3,4} (every node in 3 triangles), a pendant node 5 on
    node 1 (no triangles), an isolated node 6; parallel/reversed edges and
    self-loops must not change counts."""
    from invoice_ocr_reconciler_ray.stages.graph import triangle_count_per_node

    src = [1, 1, 1, 2, 2, 3, 1, 3, 1, 6]
    dst = [2, 3, 4, 3, 4, 4, 5, 2, 1, 6]  # 3->2 dup reversed; 1->1 self-loop
    nodes = rd.from_arrow(
        pa.table({"node": pa.array([1, 2, 3, 4, 5, 6], pa.int64())})
    )
    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )
    out = (
        triangle_count_per_node(nodes, edges)
        .to_pandas()
        .set_index("node")
        .n_triangles
    )
    assert out.to_dict() == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0}
    assert str(out.dtype) == "int64"


def test_resolve_roots_pointer_doubling_matches_walk(ray_session):
    """Hierarchy flattening: roots/depths from log-round pointer doubling
    must equal a sequential pointer walk, incl. multi-root forests and a
    depth bound that overshoots (no-op rounds)."""
    import numpy as np

    from invoice_ocr_reconciler_ray.stages.hierarchy import resolve_roots

    # forest: parent = n // 5 for n >= 5; nodes 1..4 are self-loop roots
    nodes = np.arange(1, 800, dtype=np.int64)
    parents = np.where(nodes >= 5, nodes // 5, nodes)
    ds = rd.from_arrow(
        pa.table({"n": pa.array(nodes), "p": pa.array(parents)})
    ).repartition(6)
    out = (
        resolve_roots(ds, node_col="n", parent_col="p", max_depth=16)
        .to_pandas()
        .set_index("node")
        .sort_index()
    )

    def walk(n):
        d = 0
        while n >= 5:
            n //= 5
            d += 1
        return n, d

    for n in [1, 4, 5, 24, 25, 124, 125, 624, 625, 799]:
        root, depth = walk(n)
        assert (out.loc[n, "root"], out.loc[n, "depth"]) == (root, depth), n
    assert len(out) == len(nodes)
