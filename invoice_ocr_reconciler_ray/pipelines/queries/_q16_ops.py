"""Query-registry family module 16: the composed AP-close report and
deterministic resampling inference (round-5 continuation, wave F).

* `ap_close_audit_report` — the month-end accounts-payable close in ONE
  composed report, chaining three wave-B controls (three-way-match
  invoice variance, duplicate-payment suspects, 90+-day register aging)
  into a per-step flag/cents summary — the reference's reconciliation
  domain as a single engine pipeline.  The oracle literally embeds the
  three legs' existing SQL oracles as subqueries, so composition is
  verified end-to-end on both sides.
* `orders_hash_bootstrap_replicates` — a DETERMINISTIC multiplier
  bootstrap: 16 resampling replicates whose per-order weights come from
  the repo's exact md5 bridge (w = first-8-hex-digits % 8, mean 3.5),
  giving exact integer replicate totals both engines reproduce
  bit-for-bit — the resampling-inference primitive (spread of the
  replicate totals estimates the total's sampling variability) without
  a random number generator anywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t
from ._q12_ops import (
    ORDERS_DOUBLE_PAYMENT_AUDIT_SQL,
    ORDERS_THREE_WAY_MATCH_CENSUS_SQL,
    orders_double_payment_audit,
    orders_three_way_match_census,
)
from ._q04_events_docs3 import REGISTER_AGING_REPORT_SQL, register_aging_report


def ap_close_audit_report(sf_dir: str):
    """Month-end AP close: one report row per control step —
    (1) three-way-match invoice variances (orders flagged + total absolute
    variance cents), (2) duplicate-payment suspect pairs (pairs + amount
    at risk = Σ min of each pair), (3) register entries 90+ days past due
    (rows + cents).  Each leg runs its existing registry pipeline and the
    step rows are its small-output reductions, so the composed report
    inherits every leg's scale shape (joins, group kernels, CSV-ingest)
    unchanged."""
    twm = orders_three_way_match_census(sf_dir)
    var_rows = twm.filter(pc.equal(twm["invoice_status"], "inv_variance"))
    n_var = int(pc.sum(var_rows["n_orders"]).as_py() or 0)
    c_var = int(pc.sum(var_rows["sum_abs_invoice_delta_cents"]).as_py() or 0)

    dp = orders_double_payment_audit(sf_dir)
    n_dp = dp.num_rows
    c_dp = int(
        pc.sum(pc.min_element_wise(dp["cents_a"], dp["cents_b"])).as_py() or 0
    )

    ag = register_aging_report(sf_dir)
    old = ag.filter(pc.equal(ag["bucket"], "90+"))
    n_ag = int(pc.sum(old["n"]).as_py() or 0)
    c_ag = int(pc.sum(old["amount_cents"]).as_py() or 0)

    return pa.table(
        {
            "step": pa.array(
                [
                    "duplicate_payment_pairs",
                    "register_overdue_90plus",
                    "three_way_invoice_variance",
                ],
                pa.string(),
            ),
            "n_flagged": pa.array([n_dp, n_ag, n_var], pa.int64()),
            "cents_at_risk": pa.array([c_dp, c_ag, c_var], pa.int64()),
        }
    )


AP_CLOSE_AUDIT_REPORT_SQL = f"""
SELECT 'duplicate_payment_pairs' AS step,
       CAST(COUNT(*) AS BIGINT) AS n_flagged,
       CAST(COALESCE(SUM(LEAST(cents_a, cents_b)), 0) AS BIGINT)
         AS cents_at_risk
FROM ({ORDERS_DOUBLE_PAYMENT_AUDIT_SQL})
UNION ALL
SELECT 'register_overdue_90plus',
       CAST(COALESCE(SUM(n), 0) AS BIGINT),
       CAST(COALESCE(SUM(amount_cents), 0) AS BIGINT)
FROM ({REGISTER_AGING_REPORT_SQL}) WHERE bucket = '90+'
UNION ALL
SELECT 'three_way_invoice_variance',
       CAST(COALESCE(SUM(n_orders), 0) AS BIGINT),
       CAST(COALESCE(SUM(sum_abs_invoice_delta_cents), 0) AS BIGINT)
FROM ({ORDERS_THREE_WAY_MATCH_CENSUS_SQL}) WHERE invoice_status = 'inv_variance'
ORDER BY step
"""


def orders_hash_bootstrap_replicates(sf_dir: str):
    """Deterministic multiplier bootstrap over total revenue: replicate
    b ∈ 0..15 weights each order by md5(key:b)'s first 8 hex digits mod 8
    (the repo's exact md5 bridge — mean weight 3.5, integer, identical in
    hashlib and DuckDB's md5()).  Output per replicate: Σw and the
    weighted revenue total in exact cents; the spread across replicates
    is the resampling estimate of the total's sampling variability, with
    not a single RNG or float in the pipeline.  One distributed pass
    emits 16 partial cells per block."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0
            + 0.5
        ).astype(np.int64)
        bs, ws, cs = [], [], []
        for b in range(16):
            w = np.fromiter(
                (
                    int(hashlib.md5(f"{k}:{b}".encode()).hexdigest()[:8], 16) % 8
                    for k in keys
                ),
                np.int64,
                len(keys),
            )
            bs.append(np.full(1, b, np.int64))
            ws.append(np.array([int(w.sum())], np.int64))
            cs.append(np.array([int((w * cents).sum())], np.int64))
        return pa.table(
            {
                "b": pa.array(np.concatenate(bs), pa.int64()),
                "n_weight": pa.array(np.concatenate(ws), pa.int64()),
                "weighted_cents": pa.array(np.concatenate(cs), pa.int64()),
            }
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(
            Sum("n_weight", alias_name="n_weight"),
            Sum("weighted_cents", alias_name="weighted_cents"),
        )
        .to_pandas()
        .sort_values("b", kind="mergesort")
    )
    return pa.table(
        {
            "b": pa.array(g["b"].to_numpy().astype(np.int64), pa.int64()),
            "n_weight": pa.array(g["n_weight"].to_numpy().astype(np.int64), pa.int64()),
            "weighted_cents": pa.array(
                g["weighted_cents"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


ORDERS_HASH_BOOTSTRAP_REPLICATES_SQL = """
WITH reps AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS b),
w AS (
  SELECT reps.b,
         CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
               || CAST(reps.b AS VARCHAR)), 1, 8)) AS UBIGINT) % 8 AS BIGINT)
           AS wt,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders CROSS JOIN reps
)
SELECT b,
       CAST(SUM(wt) AS BIGINT) AS n_weight,
       CAST(SUM(wt * cents) AS BIGINT) AS weighted_cents
FROM w GROUP BY b ORDER BY b
"""
