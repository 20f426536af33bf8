"""Weighted median (exact integer selection) and grouped EWMA (closed form
vs the serial recurrence)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_weighted_median_exact(ray_session, tmp_path):
    # flag A: values 1.00(w1), 2.00(w1), 3.00(w10) → total 12, first value
    # with 2*cw >= 12 is 3.00 (cw: 1,2,12).  flag B: 5.00(w2), 7.00(w2) →
    # total 4, 2*cw>=4 at the FIRST value (lower weighted median) = 5.00
    t = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", "A", "B", "B"]),
            "l_quantity": pa.array([1.0, 1.0, 10.0, 2.0, 2.0]),
            "l_extendedprice": pa.array([1.0, 2.0, 3.0, 5.0, 7.0]),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        lineitem_weighted_median,
    )

    out = (
        lineitem_weighted_median(str(tmp_path))
        .to_pandas()
        .set_index("l_returnflag")
    )
    assert out.loc["A", "weighted_median_cents"] == 300
    assert out.loc["A", "total_weight"] == 12
    assert out.loc["B", "weighted_median_cents"] == 500
    assert str(out["weighted_median_cents"].dtype) == "int64"


def test_weighted_median_duplicate_values_merge(ray_session, tmp_path):
    # the same price appearing in many rows must merge its weights BEFORE
    # the cumulative scan (per-(flag,value) combiner semantics)
    t = pa.table(
        {
            "l_returnflag": pa.array(["A"] * 4),
            "l_quantity": pa.array([1.0, 1.0, 1.0, 1.0]),
            "l_extendedprice": pa.array([2.0, 2.0, 1.0, 3.0]),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        lineitem_weighted_median,
    )

    out = lineitem_weighted_median(str(tmp_path)).to_pandas()
    # cw over distinct values (100:1, 200:3, 300:4) → first 2*cw>=4 is 200
    assert out["weighted_median_cents"].iloc[0] == 200


def test_grouped_ewma_matches_serial(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.timeseries import grouped_ewma

    rng = np.random.default_rng(11)
    n = 500
    ts = np.datetime64("2024-01-01", "us") + np.arange(n).astype(
        "timedelta64[s]"
    )
    vals = rng.uniform(0, 100, n)
    t = pa.table(
        {
            "user_id": pa.array(np.r_[np.zeros(n // 2), np.ones(n // 2)].astype(np.int64)),
            "ts": pa.array(np.r_[ts[: n // 2], ts[: n // 2]]),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "value": pa.array(vals),
        }
    )
    out = (
        grouped_ewma(
            rd.from_arrow(t).repartition(8),
            key_col="user_id",
            ts_col="ts",
            id_col="event_id",
            value_col="value",
            alpha=0.25,
        )
        .to_pandas()
        .set_index("user_id")
    )

    def serial(x):
        s = x[0]
        for v in x[1:]:
            s = 0.25 * v + 0.75 * s
        return s

    assert np.isclose(out.loc[0, "ewma"], serial(vals[: n // 2]), rtol=1e-9)
    assert np.isclose(out.loc[1, "ewma"], serial(vals[n // 2 :]), rtol=1e-9)
    assert out.loc[0, "n_events"] == n // 2
