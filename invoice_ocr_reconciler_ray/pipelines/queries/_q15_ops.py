"""Query-registry family module 15: two-stage quantization / pagination
equivalence / moving median / rank concordance (round-5 continuation,
wave E — names verified absent from the 796-entry registry):

* `embeddings_residual_vq_audit` — residual (two-stage) vector
  quantization with power-of-two scales so coarse code, fine code and
  residual are ALL exact integers in both engines;
* `orders_pagination_equivalence_audit` — OFFSET pagination vs
  keyset-cursor pagination computed as two independent Ray plans that
  must return the identical page (the API-migration proof);
* `orders_monthly_moving_median` — 7-month trailing moving median of
  revenue in exact cents (quantile_disc convention per window);
* `orders_monthly_count_value_concordance` — Kendall-style concordant /
  discordant / tie pair counts between the monthly order-count and
  revenue series (the exact integer core of τ_b, no sqrt taken);
* `orders_median_ci_binomial` — distribution-free 95 % confidence
  interval for the monthly-revenue median from binomial order
  statistics, all combinatorics in exact big integers (2ⁿ obtained as
  Σ C(n,i), never a float power).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t


def embeddings_residual_vq_audit(sf_dir: str):
    """Residual vector quantization audit — stage 1 at scale 128, stage 2
    encodes the residual at scale 16384 (both powers of two, so x·scale
    is IEEE-exact and the codes are exact integers in numpy and DuckDB
    alike): q₁ = ⌊x·128 + ½⌋, residual r = ⌊x·16384 + ½⌋ − 128·q₁.  Per
    label: component count, Σr² and max|r| — the fidelity budget of a
    two-stage codebook, with zero float drift possible.  Pure per-row
    map; label-bounded groupby."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        if t.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n_components": pa.array([], pa.int64()),
                    "sum_sq_residual": pa.array([], pa.int64()),
                    "max_abs_residual": pa.array([], pa.int64()),
                }
            )
        vecs = _vecs(t, "embedding").astype(np.float64)
        q1 = np.floor(vecs * 128.0 + 0.5).astype(np.int64)
        q2 = np.floor(vecs * 16384.0 + 0.5).astype(np.int64)
        r = q2 - 128 * q1
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(labels, return_inverse=True)
        d = vecs.shape[1]
        nc = np.zeros(len(uk), np.int64)
        ss = np.zeros(len(uk), np.int64)
        mx = np.zeros(len(uk), np.int64)
        np.add.at(nc, inv, d)
        np.add.at(ss, inv, (r * r).sum(axis=1))
        np.maximum.at(mx, inv, np.abs(r).max(axis=1))
        return pa.table(
            {
                "label": pa.array(uk, pa.int64()),
                "n_components": pa.array(nc, pa.int64()),
                "sum_sq_residual": pa.array(ss, pa.int64()),
                "max_abs_residual": pa.array(mx, pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum("n_components", alias_name="n_components"),
            Sum("sum_sq_residual", alias_name="sum_sq_residual"),
            Max("max_abs_residual", alias_name="max_abs_residual"),
        )
        .to_pandas()
        .sort_values("label", kind="mergesort")
    )
    return pa.table(
        {
            "label": pa.array(g["label"].to_numpy().astype(np.int64), pa.int64()),
            "n_components": pa.array(
                g["n_components"].to_numpy().astype(np.int64), pa.int64()
            ),
            "sum_sq_residual": pa.array(
                g["sum_sq_residual"].to_numpy().astype(np.int64), pa.int64()
            ),
            "max_abs_residual": pa.array(
                g["max_abs_residual"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


EMBEDDINGS_RESIDUAL_VQ_AUDIT_SQL = """
WITH ex AS (
  SELECT CAST(label AS BIGINT) AS label,
         unnest(embedding) AS v
  FROM embeddings
), q AS (
  SELECT label,
         CAST(FLOOR(CAST(v AS DOUBLE) * 16384 + 0.5) AS BIGINT)
           - 128 * CAST(FLOOR(CAST(v AS DOUBLE) * 128 + 0.5) AS BIGINT) AS r
  FROM ex
)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(r * r) AS BIGINT) AS sum_sq_residual,
       CAST(MAX(ABS(r)) AS BIGINT) AS max_abs_residual
FROM q GROUP BY label ORDER BY label
"""


def orders_pagination_equivalence_audit(sf_dir: str):
    """Pagination-equivalence audit: page 3 of the price-descending order
    listing (20/page, orderkey tie-break) computed by TWO independent Ray
    plans — OFFSET 40 through the report paginator, and a KEYSET cursor
    (strictly after the last row of page 2 in sort order, the
    infinite-scroll migration every API eventually makes).  The audit row
    reports both row counts, the count of position-wise identical keys,
    and the boundary keys — equivalence holds by construction, and the
    oracle recomputes the page once."""
    from ...stages.report import paginated

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    off = paginated(
        ds,
        sort_keys=["o_totalprice", "o_orderkey"],
        descending=[True, False],
        limit=20,
        offset=40,
    )
    off_t = (
        off if isinstance(off, pa.Table) else pa.concat_tables(
            list(off.iter_batches(batch_format="pyarrow"))
        )
    )
    # cursor = last row of page 2 (independent OFFSET plan)
    page2 = paginated(
        ds,
        sort_keys=["o_totalprice", "o_orderkey"],
        descending=[True, False],
        limit=20,
        offset=20,
    )
    p2_t = (
        page2 if isinstance(page2, pa.Table) else pa.concat_tables(
            list(page2.iter_batches(batch_format="pyarrow"))
        )
    )
    cp = float(p2_t["o_totalprice"][-1].as_py())
    ck = int(p2_t["o_orderkey"][-1].as_py())

    def after_cursor(t: pa.Table) -> pa.Table:
        price = t["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        key = t["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = (price < cp) | ((price == cp) & (key > ck))
        return t.filter(pa.array(keep))

    ks = (
        ds.map_batches(after_cursor, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(20)
    )
    ks_t = pa.concat_tables(list(ks.iter_batches(batch_format="pyarrow")))
    n_match = sum(
        int(a == b and x == y)
        for a, b, x, y in zip(
            off_t["o_orderkey"].to_pylist(),
            ks_t["o_orderkey"].to_pylist(),
            off_t["o_totalprice"].to_pylist(),
            ks_t["o_totalprice"].to_pylist(),
        )
    )
    return pa.table(
        {
            "n_offset": pa.array([off_t.num_rows], pa.int64()),
            "n_keyset": pa.array([ks_t.num_rows], pa.int64()),
            "n_identical": pa.array([n_match], pa.int64()),
            "first_key": pa.array([int(off_t["o_orderkey"][0].as_py())], pa.int64()),
            "last_key": pa.array([int(off_t["o_orderkey"][-1].as_py())], pa.int64()),
            "equivalent": pa.array(
                [int(n_match == off_t.num_rows == ks_t.num_rows)], pa.int64()
            ),
        }
    )


ORDERS_PAGINATION_EQUIVALENCE_AUDIT_SQL = """
WITH page AS (
  SELECT o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
), p3 AS (
  SELECT * FROM page WHERE rn > 40 AND rn <= 60
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_offset,
       CAST(COUNT(*) AS BIGINT) AS n_keyset,
       CAST(COUNT(*) AS BIGINT) AS n_identical,
       CAST(MIN(CASE WHEN rn = 41 THEN o_orderkey END) AS BIGINT) AS first_key,
       CAST(MIN(CASE WHEN rn = 60 THEN o_orderkey END) AS BIGINT) AS last_key,
       CAST(1 AS BIGINT) AS equivalent
FROM p3
"""


def orders_monthly_moving_median(sf_dir: str):
    """7-month trailing MOVING MEDIAN of monthly revenue — the robust
    trend line an outlier month can't bend (the moving-average ops in the
    registry all can).  Exact cents with the quantile_disc convention
    (sorted[⌈n/2⌉−1]) inside every ROWS-based window, so short leading
    windows are well-defined.  Monthly totals via block partials; the
    ≤ ~90-window fold is driver work / one SQL window."""
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
    y = g["y"].to_numpy().astype(np.int64)
    med = []
    for i in range(len(y)):
        w = np.sort(y[max(0, i - 6) : i + 1])
        med.append(int(w[(len(w) + 1) // 2 - 1]))
    return pa.table(
        {
            "ym": pa.array([str(m) for m in g["ym"]], pa.string()),
            "y_cents": pa.array(y, pa.int64()),
            "moving_median_cents": pa.array(med, pa.int64()),
        }
    )


ORDERS_MONTHLY_MOVING_MEDIAN_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS y
  FROM orders GROUP BY ym
)
SELECT ym, y AS y_cents,
       CAST(quantile_disc(y, 0.5) OVER (ORDER BY ym
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS moving_median_cents
FROM m ORDER BY ym
"""


def orders_monthly_count_value_concordance(sf_dir: str):
    """Kendall-style concordance between the monthly ORDER-COUNT series
    and the monthly REVENUE series: over all month pairs, concordant /
    discordant / tied counts — the exact integer core of τ_b (the sqrt
    normalization is left to the reader, keeping the op float-free).
    Month cells via block partials; the O(M²)≈3.5k pair fold is driver
    work / one SQL self-join."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(pc.cast(t["o_totalprice"], pa.float64()), 100.0), 0.5)
            ),
            pa.int64(),
        )
        ym = pc.strftime(t["o_orderdate"], format="%Y-%m")
        tb = pa.table(
            {"ym": ym, "y": cents, "n": pa.array(np.ones(t.num_rows, np.int64))}
        )
        return (
            tb.group_by("ym")
            .aggregate([("y", "sum"), ("n", "sum")])
            .rename_columns(["ym", "y", "n"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("y", alias_name="y"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("ym", kind="mergesort")
    )
    c = g["n"].to_numpy().astype(np.int64)
    v = g["y"].to_numpy().astype(np.int64)
    i, j = np.triu_indices(len(c), k=1)
    dc = np.sign(c[j] - c[i])
    dv = np.sign(v[j] - v[i])
    prod = dc * dv
    return pa.table(
        {
            "n_pairs": pa.array([len(prod)], pa.int64()),
            "n_concordant": pa.array([int((prod > 0).sum())], pa.int64()),
            "n_discordant": pa.array([int((prod < 0).sum())], pa.int64()),
            "n_ties": pa.array([int((prod == 0).sum())], pa.int64()),
        }
    )


ORDERS_MONTHLY_COUNT_VALUE_CONCORDANCE_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY ym
), p AS (
  SELECT sign(b.n - a.n) * sign(b.y - a.y) AS prod
  FROM m a JOIN m b ON a.ym < b.ym
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_concordant,
       CAST(SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discordant,
       CAST(SUM(CASE WHEN prod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ties
FROM p
"""


def orders_median_ci_binomial(sf_dir: str):
    """Distribution-free 95 % CI for the MEDIAN of monthly revenue, from
    binomial order statistics: the lower rank is the largest k with
    P(Bin(n,½) < k) ≤ 0.025 — tested exactly as 40·Σ_{i<k} C(n,i) ≤ 2ⁿ,
    with 2ⁿ obtained as Σᵢ C(n,i) so not a single float enters the
    combinatorics (Python big ints / SQL HUGEINT via the exact Pascal
    recurrence C(n,i) = C(n,i−1)·(n−i+1)/i).  Degenerate small-n series
    fall back to the full range (l = 1).  Monthly cells via block
    partials; the order-statistic fold is an O(n) driver pass."""
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
    )
    y = np.sort(g["y"].to_numpy().astype(np.int64))
    n = len(y)
    import math as _math

    cum = 0
    two_n = 1 << n
    l_rank = 0
    for k in range(1, n + 1):
        cum += _math.comb(n, k - 1)  # = P(Bin < k) numerator
        if 40 * cum <= two_n:
            l_rank = k
        else:
            break
    if l_rank == 0:
        l_rank = 1
    u_rank = n + 1 - l_rank
    med = int(y[(n + 1) // 2 - 1])
    return pa.table(
        {
            "n_months": pa.array([n], pa.int64()),
            "l_rank": pa.array([l_rank], pa.int64()),
            "u_rank": pa.array([u_rank], pa.int64()),
            "median_cents": pa.array([med], pa.int64()),
            "ci_lo_cents": pa.array([int(y[l_rank - 1])], pa.int64()),
            "ci_hi_cents": pa.array([int(y[u_rank - 1])], pa.int64()),
        }
    )


ORDERS_MEDIAN_CI_BINOMIAL_SQL = """
WITH RECURSIVE m AS MATERIALIZED (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS y
  FROM orders GROUP BY ym
), nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM m),
binom AS (
  SELECT CAST(0 AS BIGINT) AS i, CAST(1 AS HUGEINT) AS c,
         CAST(1 AS HUGEINT) AS cum
  UNION ALL
  SELECT b.i + 1,
         b.c * ((SELECT n FROM nn) - b.i) / (b.i + 1),
         b.cum + b.c * ((SELECT n FROM nn) - b.i) / (b.i + 1)
  FROM binom b WHERE b.i < (SELECT n FROM nn)
), two_n AS (
  SELECT cum AS t FROM binom WHERE i = (SELECT n FROM nn)
), lr AS (
  -- l = largest k with 40 * P(Bin < k)*2^n <= 2^n; cum at i = k-1
  SELECT CAST(COALESCE(MAX(i + 1), 1) AS BIGINT) AS l_rank
  FROM binom, two_n
  WHERE 40 * cum <= t AND i < (SELECT n FROM nn)
), ranks AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY y) AS r FROM m
)
SELECT (SELECT n FROM nn) AS n_months,
       l_rank,
       (SELECT n FROM nn) + 1 - l_rank AS u_rank,
       (SELECT y FROM ranks WHERE r = ((SELECT n FROM nn) + 1) // 2)
         AS median_cents,
       (SELECT y FROM ranks WHERE r = l_rank) AS ci_lo_cents,
       (SELECT y FROM ranks, lr WHERE r = (SELECT n FROM nn) + 1 - l_rank)
         AS ci_hi_cents
FROM lr
"""
