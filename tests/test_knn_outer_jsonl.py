"""kNN join, native full-outer join, and the JSONL sink/source roundtrip."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _vec_table(ids, mat):
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat], pa.list_(pa.float32())),
        }
    )


def test_knn_join_matches_bruteforce(ray_session):
    """Random vectors: the streaming broadcast-build kNN join returns exactly
    the numpy full-similarity-matrix top-k, with the (sim DESC, build_id)
    tiebreak and the declared int64/float64 schema."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.ann import knn_join

    rng = np.random.RandomState(7)
    pmat = rng.randn(23, 8)
    bmat = rng.randn(57, 8)
    pids = list(range(100, 123))
    bids = list(range(500, 557))
    out = knn_join(
        rd.from_arrow(_vec_table(pids, pmat)),
        rd.from_arrow(_vec_table(bids, bmat)),
        k=4,
    ).to_pandas()

    # schema must be exactly int64/int64/float64/int64 (the r2 dtype lesson)
    assert [str(t) for t in out.dtypes] == ["int64", "int64", "float64", "int64"]
    assert list(out.columns) == ["probe_id", "build_id", "sim", "rank"]

    pu = pmat / np.linalg.norm(pmat, axis=1)[:, None]
    bu = bmat / np.linalg.norm(bmat, axis=1)[:, None]
    sims = pu @ bu.T
    for i, pid in enumerate(pids):
        order = np.lexsort((np.asarray(bids), -sims[i]))[:4]
        got = out[out.probe_id == pid].sort_values("rank")
        assert got.build_id.tolist() == [bids[j] for j in order]
        assert np.allclose(got.sim.to_numpy(), np.round(sims[i][order], 6))
        assert got["rank"].tolist() == [1, 2, 3, 4]


def test_knn_join_tie_break_prefers_smaller_build_id(ray_session):
    """Planted identical build vectors produce exactly-equal sims — the
    smaller build_id must rank first (the oracle's row_number tiebreak)."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.ann import knn_join

    v = np.array([[1.0, 0.0], [0.0, 1.0]])
    build = np.array([[2.0, 0.0], [4.0, 0.0], [0.0, 3.0]])  # b0 ≡ b1 direction
    out = knn_join(
        rd.from_arrow(_vec_table([1, 2], v)),
        rd.from_arrow(_vec_table([10, 11, 12], build)),
        k=2,
    ).to_pandas()
    p1 = out[out.probe_id == 1].sort_values("rank")
    assert p1.build_id.tolist() == [10, 11]  # tie on sim=1.0 → smaller id first
    assert p1.sim.tolist() == [1.0, 1.0]


def test_full_outer_join_classification(ray_session):
    """orders ⟗ high-balance customers vs a pandas outer merge on the same
    parquet: matched / left-only / right-only row sets agree exactly, and
    sentinels keep every column un-upcast int64 / string."""
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_customer_full_outer

    out = orders_customer_full_outer(SF).to_pandas()
    assert [str(t) for t in out.dtypes] == ["int64", "int64", "int64", "object", "int64"]

    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    orders = orders[orders.o_totalprice > 350000][["o_orderkey", "o_custkey"]]
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    cust = cust[cust.c_acctbal > 5000]
    merged = orders.merge(cust, left_on="o_custkey", right_on="c_custkey", how="outer")

    assert len(out) == len(merged)
    # left-only: order present, customer filtered out → c_name sentinel ''
    left_only = int(merged.c_custkey.isna().sum())
    assert int((out.c_name == "").sum()) == left_only
    # right-only: high-balance customer with no orders → o_orderkey == -1
    right_only = int(merged.o_orderkey.isna().sum())
    assert int((out.o_orderkey == -1).sum()) == right_only
    assert right_only > 0 and left_only > 0  # the fixture really exercises both sides


def test_jsonl_roundtrip_exact(ray_session):
    """write_json → read_json roundtrip returns exactly the parquet
    projection (values and dtypes) — JSON escaping / numeric fidelity."""
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_jsonl_export

    out = docs_jsonl_export(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = (
        pd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
        )
        .query("doc_id < 2000")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.dtype == np.int64 and out.n_chars.dtype == np.int64
    pd.testing.assert_frame_equal(out, want)
