"""Dedup canonicalization, blocked-join cost profile, logistic-regression
trainer — canonical pick order (longest, then smallest id), exact pair
products, GD convergence on separable data and block-order determinism."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_canonical_pick_order_and_group_size(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([5, 2, 9, 1], pa.int64()),
            "text": pa.array(["same", "same", "same", "other"]),
            "n_chars": pa.array([4, 9, 9, 5], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import dedup_canonical_pick

    out = (
        dedup_canonical_pick(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # "same" group: n_chars 9 ties between doc 2 and doc 9 → doc 2 wins
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["group_size"]) == [1, 3]
    assert str(out["group_size"].dtype) == "int64"


def test_block_cost_products(ray_session, tmp_path):
    pq.write_table(
        pa.table({"c_nationkey": pa.array([1, 1, 1, 2], pa.int32())}),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table({"s_nationkey": pa.array([1, 2, 2, 3], pa.int32())}),
        tmp_path / "supplier.parquet",
    )
    from invoice_ocr_reconciler_ray.pipelines.queries import linkage_block_cost

    out = (
        linkage_block_cost(str(tmp_path))
        .to_pandas()
        .set_index("nationkey")
    )
    # nation 3 has no customers → inner-join drop
    assert list(out.index) == [1, 2]
    assert out.loc[1, "n_pairs"] == 3 and out.loc[2, "n_pairs"] == 2


def test_logistic_converges_and_is_block_order_invariant(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.sgd import train_logistic

    rng = np.random.default_rng(3)
    n = 400
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y = (x1 + 2 * x2 > 0).astype(np.int8)  # separable by construction
    t = pa.table(
        {
            "x1": pa.array(x1),
            "x2": pa.array(x2),
            "y": pa.array(y),
        }
    )
    m1 = train_logistic(
        rd.from_arrow(t).repartition(8),
        feature_cols=["x1", "x2"],
        label_col="y",
        lr=0.5,
        epochs=30,
    )
    # loss decreases monotonically under full-batch GD with a sane lr
    assert m1["losses"][-1] < m1["losses"][0] * 0.6
    # learned direction matches the true boundary: w2/w1 ≈ 2, both positive
    w1, w2 = m1["weights"]
    assert w1 > 0 and w2 > 0 and 1.2 < w2 / w1 < 3.0
    assert m1["n_rows"] == n

    # block-order invariance: different partitioning, identical model
    m2 = train_logistic(
        rd.from_arrow(t).repartition(3),
        feature_cols=["x1", "x2"],
        label_col="y",
        lr=0.5,
        epochs=30,
    )
    assert np.allclose(m1["weights"], m2["weights"], rtol=1e-12, atol=1e-12)
    assert np.isclose(m1["bias"], m2["bias"], rtol=1e-12, atol=1e-12)
