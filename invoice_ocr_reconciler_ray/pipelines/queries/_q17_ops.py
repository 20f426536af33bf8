"""Query-registry family module 17: churn parameter sweep + monthly
quantile fan (round-5 continuation, wave G — names verified absent from
the 803-entry registry):

* `customer_churn_threshold_sweep` — how many customers count as
  "churned" under inactivity thresholds of 30/60/90/180 days at the
  data horizon?  The retention-definition sensitivity sweep a growth
  team runs before picking a KPI; fully distributed (per-customer last
  day → per-block threshold census, no driver customer table);
* `orders_monthly_quantile_fan` — the monthly order-value fan chart
  (p10/p25/p50/p75/p90) in exact cents under the quantile_disc
  convention, one sorted-group kernel per month.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max, Sum

from ._common import _t

_DAY_US = 86_400_000_000
_CHURN_T = (30, 60, 90, 180)


def customer_churn_threshold_sweep(sf_dir: str):
    """Churn-definition sensitivity: a customer is churned under
    threshold T when their LAST order is more than T days before the
    global data horizon (max order day).  One distributed pass folds the
    per-customer last day (block partial max + groupby); a second
    map_batches emits the 4-threshold census per block so no per-customer
    table ever reaches the driver.  The horizon itself comes from parquet
    row-group statistics — a metadata decision."""
    import pyarrow.parquet as pq
    from datetime import datetime

    md = pq.ParquetFile(_t(sf_dir, "orders")).metadata
    ci = md.schema.to_arrow_schema().get_field_index("o_orderdate")
    his = [md.row_group(rg).column(ci).statistics.max for rg in range(md.num_row_groups)]
    delta = max(his) - datetime(1970, 1, 1)
    horizon = (delta.days * 86_400 + delta.seconds) // 86_400

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def last_partial(t: pa.Table) -> pa.Table:
        day = pa.array(
            t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // _DAY_US,
            pa.int64(),
        )
        return (
            pa.table({"o_custkey": t["o_custkey"], "last_day": day})
            .group_by("o_custkey")
            .aggregate([("last_day", "max")])
            .rename_columns(["o_custkey", "last_day"])
        )

    last = (
        ds.map_batches(last_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Max("last_day", alias_name="last_day"))
    )

    def census(t: pa.Table) -> pa.Table:
        ld = t["last_day"].combine_chunks().to_numpy(zero_copy_only=False)
        rows_t, rows_n, rows_c = [], [], []
        for T in _CHURN_T:
            rows_t.append(T)
            rows_n.append(len(ld))
            rows_c.append(int((ld < horizon - T).sum()))
        return pa.table(
            {
                "threshold_days": pa.array(rows_t, pa.int64()),
                "n_customers": pa.array(rows_n, pa.int64()),
                "n_churned": pa.array(rows_c, pa.int64()),
            }
        )

    g = (
        last.map_batches(census, batch_format="pyarrow")
        .groupby("threshold_days")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("n_churned", alias_name="n_churned"),
        )
        .to_pandas()
        .sort_values("threshold_days", kind="mergesort")
    )
    n = g["n_customers"].to_numpy().astype(np.int64)
    c = g["n_churned"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "threshold_days": pa.array(
                g["threshold_days"].to_numpy().astype(np.int64), pa.int64()
            ),
            "n_customers": pa.array(n, pa.int64()),
            "n_churned": pa.array(c, pa.int64()),
            "churn_ppm": pa.array(c * 1_000_000 // n, pa.int64()),
        }
    )


CUSTOMER_CHURN_THRESHOLD_SWEEP_SQL = """
WITH last AS (
  SELECT o_custkey,
         MAX(epoch_us(o_orderdate) // 86400000000) AS last_day
  FROM orders GROUP BY o_custkey
), h AS (
  SELECT MAX(last_day) AS horizon FROM last
), t AS (
  SELECT CAST(unnest([30, 60, 90, 180]) AS BIGINT) AS threshold_days
)
SELECT threshold_days,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN last_day < horizon - threshold_days
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(SUM(CASE WHEN last_day < horizon - threshold_days
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS churn_ppm
FROM last, h, t
GROUP BY threshold_days
ORDER BY threshold_days
"""


def orders_monthly_quantile_fan(sf_dir: str):
    """Monthly order-value FAN CHART — p10/p25/p50/p75/p90 of the order
    totals per month in exact cents (quantile_disc convention,
    sorted[⌈q·n⌉−1]): the dispersion-over-time view a single median line
    hides.  Co-partition by month; each group is one sorted numpy
    selection; output is month-bounded."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(pc.cast(t["o_totalprice"], pa.float64()), 100.0), 0.5)
            ),
            pa.int64(),
        )
        return pa.table({"ym": pc.strftime(t["o_orderdate"], format="%Y-%m"), "cents": cents})

    _QS = (10, 25, 50, 75, 90)

    def fan(g: pa.Table) -> pa.Table:
        v = np.sort(g["cents"].combine_chunks().to_numpy(zero_copy_only=False))
        n = len(v)
        out = {"ym": pa.array([g["ym"][0].as_py()], pa.string())}
        for q in _QS:
            # quantile_disc: sorted[ceil(q/100 * n) - 1]
            idx = -(-q * n // 100) - 1
            out[f"p{q}_cents"] = pa.array([int(v[idx])], pa.int64())
        return pa.table(out)

    g = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("ym")
        .map_groups(fan, batch_format="pyarrow")
        .to_pandas()
        .sort_values("ym", kind="mergesort")
    )
    cols = {"ym": pa.array([str(m) for m in g["ym"]], pa.string())}
    for q in _QS:
        cols[f"p{q}_cents"] = pa.array(
            g[f"p{q}_cents"].to_numpy().astype(np.int64), pa.int64()
        )
    return pa.table(cols)


ORDERS_MONTHLY_QUANTILE_FAN_SQL = """
WITH c AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT ym,
       CAST(quantile_disc(cents, 0.10) AS BIGINT) AS p10_cents,
       CAST(quantile_disc(cents, 0.25) AS BIGINT) AS p25_cents,
       CAST(quantile_disc(cents, 0.50) AS BIGINT) AS p50_cents,
       CAST(quantile_disc(cents, 0.75) AS BIGINT) AS p75_cents,
       CAST(quantile_disc(cents, 0.90) AS BIGINT) AS p90_cents
FROM c GROUP BY ym ORDER BY ym
"""
