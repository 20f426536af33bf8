"""Broadcast-size guards (VERDICT r3 #1): a planted oversized dim triggers
the shuffle fallback / a clear BroadcastSizeError — never a silent oversized
ray.put — and the fallback's results are identical to the broadcast path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from invoice_ocr_reconciler_ray.stages.broadcast import (
    BroadcastSizeError,
    dim_is_broadcastable,
    guard_broadcast_bytes,
    parquet_bytes_estimate,
    table_nbytes,
)

SF = "/root/testdata/sf0.001"


def _sorted_df(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_parquet_estimate_and_broadcastable():
    est = parquet_bytes_estimate(f"{SF}/part.parquet", ["p_partkey", "p_type"])
    assert est > 0
    full = parquet_bytes_estimate(f"{SF}/part.parquet")
    assert full >= est
    assert dim_is_broadcastable(f"{SF}/part.parquet", ["p_partkey"], max_bytes=full)
    assert not dim_is_broadcastable(f"{SF}/part.parquet", ["p_partkey"], max_bytes=1)


def test_guard_raises_with_reroute_message():
    with pytest.raises(BroadcastSizeError, match="Scale-safe alternative"):
        guard_broadcast_bytes(
            10**9, label="test side", alternative="use the shuffle path"
        )
    # under budget: no raise
    guard_broadcast_bytes(10, label="ok", alternative="n/a")


def test_winner_map_guard_trips(monkeypatch):
    from invoice_ocr_reconciler_ray.stages.dedup import winners_to_arrays

    monkeypatch.setenv("IOCR_BROADCAST_MAX_BYTES", "8")
    with pytest.raises(BroadcastSizeError, match="partition"):
        winners_to_arrays({f"url-{i}": f"{i:016x}:{i:016x}" for i in range(100)})
    monkeypatch.delenv("IOCR_BROADCAST_MAX_BYTES")
    assert len(winners_to_arrays({"u": "p"})["keys"]) == 1


def test_promo_share_fallback_equals_broadcast(ray_session, monkeypatch):
    from invoice_ocr_reconciler_ray.pipelines.queries import promo_revenue_share

    base = _sorted_df(promo_revenue_share(SF))
    monkeypatch.setenv("IOCR_BROADCAST_MAX_BYTES", "1")  # plant oversized dim
    rerouted = _sorted_df(promo_revenue_share(SF))
    monkeypatch.delenv("IOCR_BROADCAST_MAX_BYTES")
    pd.testing.assert_frame_equal(base, rerouted)


def test_top_brands_fallback_equals_broadcast(ray_session, monkeypatch):
    from invoice_ocr_reconciler_ray.pipelines.queries import returnflag_top_brands

    base = _sorted_df(returnflag_top_brands(SF))
    monkeypatch.setenv("IOCR_BROADCAST_MAX_BYTES", "1")
    rerouted = _sorted_df(returnflag_top_brands(SF))
    monkeypatch.delenv("IOCR_BROADCAST_MAX_BYTES")
    pd.testing.assert_frame_equal(base, rerouted)


def test_cluster_pairs_edge_guard_trips(ray_session, monkeypatch):
    # VERDICT r4 #4: the cluster_pairs edge pull is byte-budget guarded
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.neardup import cluster_pairs

    ids = rd.from_items([{"doc_id": i} for i in range(8)])
    pairs = rd.from_items([{"id_a": i, "id_b": i + 1} for i in range(7)])
    monkeypatch.setenv("IOCR_BROADCAST_MAX_BYTES", "8")
    with pytest.raises(BroadcastSizeError, match="cluster_pairs edge list"):
        cluster_pairs(ids, pairs).materialize()
    monkeypatch.delenv("IOCR_BROADCAST_MAX_BYTES")
    out = cluster_pairs(ids, pairs).to_pandas()
    assert (out["cluster_id"] == 0).all()  # one chain → one cluster


def test_triangle_adjacency_guard_trips(ray_session, monkeypatch):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.graph import triangle_count_per_node

    nodes = rd.from_items([{"node": i} for i in range(3)])
    edges = rd.from_items(
        [{"src": 0, "dst": 1}, {"src": 1, "dst": 2}, {"src": 0, "dst": 2}]
    )
    monkeypatch.setenv("IOCR_BROADCAST_MAX_BYTES", "8")
    with pytest.raises(BroadcastSizeError, match="triangle-count adjacency"):
        triangle_count_per_node(nodes, edges).materialize()
    monkeypatch.delenv("IOCR_BROADCAST_MAX_BYTES")
    out = triangle_count_per_node(nodes, edges).to_pandas()
    assert (out["n_triangles"] == 1).all()


def test_pagerank_state_guard_trips(ray_session, monkeypatch):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.pagerank import pagerank

    edges = rd.from_items([{"src": 0, "dst": 1}, {"src": 1, "dst": 0}])
    monkeypatch.setenv("IOCR_BROADCAST_MAX_BYTES", "8")
    with pytest.raises(BroadcastSizeError, match="pagerank rank/degree state"):
        pagerank(edges, 2)
    monkeypatch.delenv("IOCR_BROADCAST_MAX_BYTES")
    assert pagerank(edges, 2).num_rows == 2


def test_table_nbytes_shapes():
    assert table_nbytes(pa.table({"a": [1, 2, 3]})) > 0
    assert table_nbytes(np.zeros(10)) == 80
    assert table_nbytes({"x": np.zeros(2), "y": b"abc"}) == 19
    assert table_nbytes("abcd") == 4
