"""Edge-case unit tests for the wave-G registry ops (_q17_ops)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.array(days, "int64") * DAY, pa.timestamp("us"))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_churn_sweep_thresholds(tmp_path):
    # horizon = day 200; custs last-active at 200, 150, 100, 5
    _write(
        tmp_path,
        "orders",
        {
            "o_custkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
            "o_orderdate": _ts([10, 200, 150, 100, 5]),
        },
    )
    out = (
        Q.customer_churn_threshold_sweep(str(tmp_path))
        .to_pandas()
        .set_index("threshold_days")
    )
    # T=30: last < 170 -> custs 2,3,4 churned; T=60: last < 140 -> 3,4;
    # T=90: last < 110 -> 3,4; T=180: last < 20 -> cust 4 only
    assert out.loc[30, "n_churned"] == 3
    assert out.loc[60, "n_churned"] == 2
    assert out.loc[90, "n_churned"] == 2
    assert out.loc[180, "n_churned"] == 1
    assert out.loc[30, "n_customers"] == 4
    assert out.loc[30, "churn_ppm"] == 3 * 1_000_000 // 4


def test_quantile_fan_disc_convention(tmp_path):
    # one month, values 100..1000: quantile_disc p10 = sorted[ceil(1)-1]=100,
    # p25 = sorted[ceil(2.5)-1] = 300, p50 = 500, p75 = 800, p90 = 900
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": _ts([1] * 10),
            "o_totalprice": pa.array([float(i) for i in range(1, 11)], pa.float64()),
        },
    )
    out = Q.orders_monthly_quantile_fan(str(tmp_path)).to_pandas().iloc[0]
    assert (out.p10_cents, out.p25_cents, out.p50_cents) == (100, 300, 500)
    assert (out.p75_cents, out.p90_cents) == (800, 900)


def test_wave_g_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in ["customer_churn_threshold_sweep", "orders_monthly_quantile_fan"]:
        assert k in reg and k in osql
