"""Star denormalization: fact hash-join + broadcast dim hops equal a plain
pandas three-way merge on a hand fixture."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_star_denorm_matches_pandas_merge(ray_session, tmp_path):
    t95 = pd.Timestamp("1995-06-01")
    t97 = pd.Timestamp("1997-06-01")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
                "l_linenumber": pa.array([1, 2, 1, 1], pa.int32()),
                "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
                "l_shipdate": pa.array([t95, t95, t95, t97]),  # row 4 pruned
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([100, 200, 100], pa.int64()),
                "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"],
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([100, 200], pa.int64()),
                "c_name": ["Customer#100", "Customer#200"],
                "c_nationkey": pa.array([5, 7], pa.int32()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([5, 7], pa.int32()),
                "n_name": ["ETHIOPIA", "GERMANY"],
            }
        ),
        tmp_path / "nation.parquet",
    )
    from invoice_ocr_reconciler_ray.pipelines.queries import lineitem_star_denorm

    out = (
        lineitem_star_denorm(str(tmp_path))
        .to_pandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    assert len(out) == 3  # 1997 row pruned at the read
    assert out.price_cents.tolist() == [1000, 2000, 3000]
    assert out.o_orderpriority.tolist() == ["1-URGENT", "1-URGENT", "2-HIGH"]
    assert out.c_name.tolist() == ["Customer#100", "Customer#100", "Customer#200"]
    assert out.n_name.tolist() == ["ETHIOPIA", "ETHIOPIA", "GERMANY"]
    assert str(out.l_linenumber.dtype) == "int64"
    assert str(out.price_cents.dtype) == "int64"
