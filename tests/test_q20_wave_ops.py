"""Edge-case unit tests for the wave-J registry ops (_q20_ops)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.array(days, "int64") * DAY, pa.timestamp("us"))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_motif_finds_repeated_regime(tmp_path):
    # 18 months: months 0-5 and 12-17 carry the identical pattern,
    # months 6-11 something else -> window 0 matches window 12 at distance 0
    pattern = [1.0, 2.0, 3.0, 1.0, 2.0, 3.0]
    middle = [9.0, 8.0, 7.0, 9.0, 8.0, 7.0]
    vals = pattern + middle + pattern
    # one order on the 1st of each consecutive month (30.5-day stride keeps
    # months distinct; use exact month starts instead)
    days = []
    d = 0
    lens = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31] * 2
    for i in range(18):
        days.append(d)
        d += lens[i]
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": _ts(days),
            "o_totalprice": pa.array(vals, pa.float64()),
        },
    )
    out = Q.orders_monthly_motif_discovery(str(tmp_path)).to_pandas()
    first = out.iloc[0]
    assert first.l1_dist_cents == 0  # window 0 == window 12
    assert out.l1_dist_cents.min() == 0


def test_neyman_alloc_sums_to_budget(tmp_path):
    # two strata: one high-variance, one constant (zero weight -> 0 draws)
    _write(
        tmp_path,
        "orders",
        {
            "o_orderpriority": pa.array(["A"] * 4 + ["B"] * 4, pa.string()),
            "o_totalprice": pa.array(
                [10.0, 1000.0, 10.0, 1000.0, 50.0, 50.0, 50.0, 50.0], pa.float64()
            ),
        },
    )
    out = Q.orders_neyman_allocation_plan(str(tmp_path)).to_pandas().set_index("priority")
    assert out.alloc.sum() == 1000
    assert out.loc["A", "alloc"] == 1000  # all draws to the variable stratum
    assert out.loc["B", "alloc"] == 0


def test_wave_j_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in ["orders_monthly_motif_discovery", "orders_neyman_allocation_plan"]:
        assert k in reg and k in osql
