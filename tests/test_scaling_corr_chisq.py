"""Feature scaling, pairwise correlation, chi-square contingency — analytic
tests for the exact-sufficient-statistic family: perfect ±1 correlations,
z-score/min-max endpoints, independence ⇒ zero chi-square terms."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_pairwise_corr_exact_endpoints(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.regression import pairwise_corr

    x = np.arange(1, 101, dtype=np.int64)
    t = pa.table({"a": pa.array(x), "b": pa.array(2 * x + 5), "c": pa.array(-x)})
    out = (
        pairwise_corr(rd.from_arrow(t), cols=["a", "b", "c"])
        .to_pandas()
        .set_index(["col_x", "col_y"])
    )
    # perfect linear dependence lands within a few ulp of ±1 (sqrt(a)·sqrt(b)
    # isn't sqrt(ab)); the ORACLE guarantees bit-equality with SQL, this
    # test pins the math itself
    assert abs(out.loc[("a", "b"), "corr"] - 1.0) < 1e-12
    assert abs(out.loc[("a", "c"), "corr"] + 1.0) < 1e-12
    assert abs(out.loc[("b", "c"), "corr"] + 1.0) < 1e-12
    assert (out["n_rows"] == 100).all()
    assert str(out["corr"].dtype) == "float64"


def test_scaled_features_endpoints(ray_session, tmp_path):
    # one group, quantities 10..20: minmax hits exactly 0 and 1; z of the
    # mean value is exactly 0
    q = np.arange(10, 21, dtype=np.float64)
    t = pa.table(
        {
            "l_orderkey": pa.array(np.arange(len(q)), pa.int64()),
            "l_linenumber": pa.array(np.ones(len(q), np.int32)),
            "l_returnflag": pa.array(["A"] * len(q)),
            "l_quantity": pa.array(q),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        lineitem_scaled_features,
    )

    out = lineitem_scaled_features(str(tmp_path)).to_pandas().sort_values("qty")
    assert out["minmax_scaled"].iloc[0] == 0.0
    assert out["minmax_scaled"].iloc[-1] == 1.0
    assert out.loc[out["qty"] == 15, "z_score"].iloc[0] == 0.0
    # symmetric range → z is antisymmetric around the mean
    z = out["z_score"].to_numpy()
    assert np.allclose(z + z[::-1], 0.0)
    assert str(out["z_score"].dtype) == "float64"
    assert str(out["qty"].dtype) == "int64"


def test_chisq_independent_table_is_zero(ray_session, tmp_path):
    # counts proportional across rows/cols → expected == observed → 0 terms
    # type x: 10 on Mon, 20 on Tue; type y: 30 on Mon, 60 on Tue
    rows = []
    for et, day, n in [("x", 5, 10), ("x", 6, 20), ("y", 5, 30), ("y", 6, 60)]:
        # 2024-01-01 is a Monday; isodow(Mon)=1 — use Jan 5 (Fri), 6 (Sat)
        for i in range(n):
            rows.append((et, np.datetime64(f"2024-01-{day:02d}T12:00:00", "us")))
    t = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_chisq_type_dow

    out = events_chisq_type_dow(str(tmp_path)).to_pandas()
    assert len(out) == 4
    assert (out["chi2_term"] == 0.0).all()
    assert (out["expected"] == out["n_obs"]).all()
    assert str(out["n_obs"].dtype) == "int64"
    assert str(out["dow"].dtype) == "int64"
