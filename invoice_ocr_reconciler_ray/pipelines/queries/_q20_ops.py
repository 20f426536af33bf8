"""Query-registry family module 20: motif discovery + survey-sampling
allocation (round-5 continuation, wave J):

* `orders_monthly_motif_discovery` — matrix-profile-flavored motif
  search over the monthly revenue series: for every 6-month window, the
  L1 distance to its nearest NON-OVERLAPPING window (exact integer
  cents) and that neighbor's start — repeated-regime discovery without
  a single float;
* `orders_neyman_allocation_plan` — Neyman optimal sample allocation
  across priority strata (n_h ∝ N_h·σ_h = √(n·Σx²−(Σx)²)) for a budget
  of 1000, assigned by the D'HONDT divisor method: every stratum's
  weight/k quotients (k = 1..1000) rank globally and the top 1000 are
  the draws — one fixed-IEEE sqrt per stratum and a deterministic
  (quotient, priority, k) order, so no global float sum ever forms and
  both engines allocate identically.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t

_W = 6


def orders_monthly_motif_discovery(sf_dir: str):
    """Motif discovery (the integer core of a matrix profile): every
    6-month window of the monthly revenue series is compared with every
    window starting at least 6 months away; the profile row is the
    minimal L1 distance in exact cents and the tie-broken (smallest
    start) nearest neighbor.  Monthly cells via block partials; the
    ≤ ~80² window fold is driver work / one SQL self-join over six
    lead() columns."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(pc.cast(t["o_totalprice"], pa.float64()), 100.0), 0.5)
            ),
            pa.int64(),
        )
        ym = pc.strftime(t["o_orderdate"], format="%Y-%m")
        return (
            pa.table({"ym": ym, "y": cents})
            .group_by("ym")
            .aggregate([("y", "sum")])
            .rename_columns(["ym", "y"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("y", alias_name="y"))
        .to_pandas()
        .sort_values("ym", kind="mergesort")
    )
    yms = [str(m) for m in g["ym"]]
    y = g["y"].to_numpy().astype(np.int64)
    n_w = len(y) - _W + 1
    wins = np.stack([y[i : i + _W] for i in range(n_w)])
    rows = []
    for i in range(n_w):
        best = None
        for j in range(n_w):
            if abs(i - j) < _W:
                continue
            d = int(np.abs(wins[i] - wins[j]).sum())
            if best is None or d < best[0] or (d == best[0] and j < best[1]):
                best = (d, j)
        if best is None:
            continue
        rows.append((yms[i], yms[best[1]], best[0]))
    return pa.table(
        {
            "win_start": pa.array([r[0] for r in rows], pa.string()),
            "nn_start": pa.array([r[1] for r in rows], pa.string()),
            "l1_dist_cents": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


ORDERS_MONTHLY_MOTIF_DISCOVERY_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS y
  FROM orders GROUP BY ym
), w AS (
  SELECT ym, ROW_NUMBER() OVER (ORDER BY ym) AS i,
         y AS y0,
         lead(y, 1) OVER (ORDER BY ym) AS y1,
         lead(y, 2) OVER (ORDER BY ym) AS y2,
         lead(y, 3) OVER (ORDER BY ym) AS y3,
         lead(y, 4) OVER (ORDER BY ym) AS y4,
         lead(y, 5) OVER (ORDER BY ym) AS y5
  FROM m
), win AS (SELECT * FROM w WHERE y5 IS NOT NULL),
pairs AS (
  SELECT a.ym AS win_start, b.ym AS nn_start, b.i AS j,
         ABS(a.y0 - b.y0) + ABS(a.y1 - b.y1) + ABS(a.y2 - b.y2)
         + ABS(a.y3 - b.y3) + ABS(a.y4 - b.y4) + ABS(a.y5 - b.y5) AS d
  FROM win a JOIN win b ON ABS(a.i - b.i) >= 6
), best AS (
  SELECT win_start, nn_start, d,
         ROW_NUMBER() OVER (PARTITION BY win_start ORDER BY d, j) AS rn
  FROM pairs
)
SELECT win_start, nn_start, CAST(d AS BIGINT) AS l1_dist_cents
FROM best WHERE rn = 1
ORDER BY win_start
"""


def orders_neyman_allocation_plan(sf_dir: str):
    """Neyman optimal allocation of a 1000-draw sample across priority
    strata.  N_h·σ_h reduces to √(n·Σx²−(Σx)²), one correctly-rounded
    sqrt over an exact int64 term — and the 1000 draws are assigned by
    the D'Hondt divisor method: all weight/k quotients (k = 1..1000)
    rank globally under the deterministic (quotient desc, priority, k)
    order and each stratum receives as many draws as it has quotients in
    the top 1000.  No global float accumulation exists anywhere, so the
    plan is bit-reproducible in both engines.  The variance fold is the
    usual block partial + tiny groupby."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        # whole DOLLARS keep n·Σx² inside exact integer range at scale
        # (cents² sums overflow int64 within a single large stratum)
        dollars = pc.cast(
            pc.floor(pc.cast(t["o_totalprice"], pa.float64())), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "priority": t["o_orderpriority"],
                    "n": pa.array(np.ones(len(dollars), np.int64)),
                    "sx": pa.array(dollars, pa.int64()),
                    "sxx": pa.array(dollars * dollars, pa.int64()),
                }
            )
            .group_by("priority")
            .aggregate([("n", "sum"), ("sx", "sum"), ("sxx", "sum")])
            .rename_columns(["priority", "n", "sx", "sxx"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("priority")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
        .sort_values("priority", kind="mergesort")
    )
    pri = [str(p) for p in g["priority"]]
    n = g["n"].to_numpy().astype(np.int64)
    sx = [int(v) for v in g["sx"]]
    sxx = [int(v) for v in g["sxx"]]
    # exact python ints (n·Σx² exceeds int64 at large scale)
    var_term = [int(n[i]) * sxx[i] - sx[i] * sx[i] for i in range(len(n))]
    weight = [math.sqrt(float(v)) for v in var_term]
    quots = []
    for i, p in enumerate(pri):
        for k in range(1, 1001):
            quots.append((weight[i] / k, p, k, i))
    quots.sort(key=lambda r: (-r[0], r[1], r[2]))
    alloc = np.zeros(len(pri), np.int64)
    for _, _, _, i in quots[:1000]:
        alloc[i] += 1
    return pa.table(
        {
            "priority": pa.array(pri, pa.string()),
            "n_h": pa.array(n, pa.int64()),
            "sum_dollars": pa.array(sx, pa.int64()),
            "sum_sq_dollars": pa.array(sxx, pa.int64()),
            "alloc": pa.array(alloc, pa.int64()),
        }
    )


ORDERS_NEYMAN_ALLOCATION_PLAN_SQL = """
WITH s AS (
  SELECT o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)
                  * CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS sxx
  FROM orders GROUP BY o_orderpriority
), wgt AS (
  SELECT priority, n, sx, sxx,
         sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                   AS DOUBLE)) AS w
  FROM s
), quot AS (
  SELECT priority, CAST(unnest(range(1, 1001)) AS BIGINT) AS k
  FROM wgt
), ranked AS (
  SELECT q.priority, q.k,
         ROW_NUMBER() OVER (ORDER BY w.w / q.k DESC, q.priority, q.k) AS rk
  FROM quot q JOIN wgt w ON q.priority = w.priority
), seats AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS alloc
  FROM ranked WHERE rk <= 1000 GROUP BY priority
)
SELECT wgt.priority, n AS n_h, sx AS sum_dollars, sxx AS sum_sq_dollars,
       CAST(COALESCE(seats.alloc, 0) AS BIGINT) AS alloc
FROM wgt LEFT JOIN seats ON wgt.priority = seats.priority
ORDER BY wgt.priority
"""
