"""Query-registry family module 6/9 (dominant family: orders_events; split from the monolithic queries.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum
from ...stages import neardup
from ...stages.ann import brute_force_topk, ivf_topk, knn_join
from ...stages.fuzzy import fuzzy_reconcile
from ...stages.text_analysis import (
    fingerprint_stage,
    lang_id_stage,
    quality_stage,
    token_count_stage,
)

from ._common import (
    _cents,
    _t,
)



def events_gap_memory_coefficient(sf_dir: str):
    """The MEMORY coefficient of the (burstiness, memory) plane: pooled
    Pearson correlation between consecutive inter-event gaps (g_i, g_{i+1})
    across all users, from six exact int64 sums over whole-second gaps
    (per-block partials stay far from overflow; the global int64 bound is
    documented at ~10⁶ pairs × (30-day span)²) and one fixed √·√
    expression."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(g: pa.Table) -> pa.Table:
        ts = np.sort(
            g["ts"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        gaps = np.diff(ts) // 1_000_000  # whole seconds
        x, y = gaps[:-1], gaps[1:]
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    agg = (
        ds.groupby("user_id")
        .map_groups(partial, batch_format="pyarrow")
        .sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
    )
    n = int(agg["sum(n)"])
    sx, sy = int(agg["sum(sx)"]), int(agg["sum(sy)"])
    sxx, syy = int(agg["sum(sxx)"]), int(agg["sum(syy)"])
    sxy = int(agg["sum(sxy)"])
    mem = (float(sxy) - float(sx) * float(sy) / float(n)) / (
        np.sqrt(float(sxx) - float(sx) * float(sx) / float(n))
        * np.sqrt(float(syy) - float(sy) * float(sy) / float(n))
    )
    return pa.table(
        {
            "n_gap_pairs": pa.array([n], pa.int64()),
            "memory_coeff": pa.array([mem], pa.float64()),
        }
    )


EVENTS_GAP_MEMORY_COEFFICIENT_SQL = """
WITH g AS (
  SELECT user_id, ts,
         (epoch_us(ts)
          - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts))
           // 1000000 AS gap
  FROM events QUALIFY gap IS NOT NULL),
p AS (
  SELECT gap AS x,
         LEAD(gap) OVER (PARTITION BY user_id ORDER BY ts) AS y
  FROM g QUALIFY y IS NOT NULL),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
             CAST(SUM(x*y) AS BIGINT) AS sxy
      FROM p)
SELECT n AS n_gap_pairs,
       (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))
       / (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
          * sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)))
         AS memory_coeff
FROM t
"""


def part_typesize_price_spread(sf_dir: str):
    """Conformed-product price dispersion: for every (type, size) cell
    carried by ≥2 brands, the brand count and the min→max retail price
    spread in exact ppm — the price-matching audit a procurement pipeline
    runs.  Block partials carry (cell → n, n-distinct-brand candidates via
    min/max brand, min/max cents); the ≥2-brand gate uses an exact distinct
    count from a (cell, brand) combiner."""
    ds = rd.read_parquet(
        _t(sf_dir, "part"), columns=["p_type", "p_size", "p_brand", "p_retailprice"]
    )

    cellbrand = (
        ds.map_batches(
            lambda t: t.select(["p_type", "p_size", "p_brand"])
            .group_by(["p_type", "p_size", "p_brand"])
            .aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["p_type", "p_size", "p_brand"])
        .aggregate(Count(alias_name="m"))
        .to_pandas()
    )
    nbrands = cellbrand.groupby(["p_type", "p_size"]).size()

    def stats(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "p_type": t["p_type"],
                "p_size": pc.cast(t["p_size"], pa.int64()),
                "n_parts": pa.array(np.ones(t.num_rows, np.int64)),
                "min_cents": _cents(t["p_retailprice"]),
                "max_cents": _cents(t["p_retailprice"]),
            }
        )
        g = tb.group_by(["p_type", "p_size"]).aggregate(
            [("n_parts", "sum"), ("min_cents", "min"), ("max_cents", "max")]
        )
        return g.rename_columns(
            ["p_type", "p_size", "n_parts", "min_cents", "max_cents"]
        )

    agg = (
        ds.map_batches(stats, batch_format="pyarrow")
        .groupby(["p_type", "p_size"])
        .aggregate(
            Sum("n_parts", alias_name="n_parts"),
            Min("min_cents", alias_name="min_cents"),
            Max("max_cents", alias_name="max_cents"),
        )
        .to_pandas()
    )
    agg["n_brands"] = [
        int(nbrands[(r["p_type"], r["p_size"])]) for _, r in agg.iterrows()
    ]
    agg = agg[agg["n_brands"] >= 2]
    spread = [
        (int(mx) - int(mn)) * 1_000_000 // int(mn)
        for mn, mx in zip(agg["min_cents"], agg["max_cents"])
    ]
    return pa.table(
        {
            "p_type": pa.array(agg["p_type"], pa.string()),
            "p_size": pa.array(agg["p_size"].to_numpy(np.int64)),
            "n_parts": pa.array(agg["n_parts"].to_numpy(np.int64)),
            "n_brands": pa.array(agg["n_brands"].to_numpy(np.int64)),
            "min_cents": pa.array(agg["min_cents"].to_numpy(np.int64)),
            "max_cents": pa.array(agg["max_cents"].to_numpy(np.int64)),
            "spread_ppm": pa.array(spread, pa.int64()),
        }
    )


PART_TYPESIZE_PRICE_SPREAD_SQL = """
SELECT p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
       CAST(MIN(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(MAX(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS max_cents,
       CAST((MAX(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT))
             - MIN(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT))) * 1000000
            // MIN(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS spread_ppm
FROM part GROUP BY 1, 2 HAVING COUNT(DISTINCT p_brand) >= 2
"""


def customer_spend_hoover_index(sf_dir: str):
    """Hoover (Pietra) inequality index — the log-free Gini companion: the
    share of total spend that would have to move to equalize everyone,
    exactly Σ|x·n − S|·10⁶ // (2·n·S) on arbitrary-precision ints.  The
    fact pass is the usual per-customer cents combiner; the |·| walk runs
    over the per-customer aggregate (two-pass broadcast shape at 100 TB)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    spend = (
        ds.map_batches(
            lambda t: pa.table({"c": t["o_custkey"], "s": _cents(t["o_totalprice"])})
            .group_by("c")
            .aggregate([("s", "sum")])
            .rename_columns(["c", "s"]),
            batch_format="pyarrow",
        )
        .groupby("c")
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()["s"]
    )
    xs = [int(v) for v in spend]
    n = len(xs)
    s = sum(xs)
    dev = sum(abs(x * n - s) for x in xs)
    return pa.table(
        {
            "n_customers": pa.array([n], pa.int64()),
            "total_cents": pa.array([s], pa.int64()),
            "hoover_ppm": pa.array([dev * 1_000_000 // (2 * n * s)], pa.int64()),
        }
    )


CUSTOMER_SPEND_HOOVER_INDEX_SQL = """
WITH sp AS (
  SELECT CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS s FROM sp)
SELECT CAST(n AS BIGINT) AS n_customers, CAST(s AS BIGINT) AS total_cents,
       CAST((SELECT SUM(ABS(CAST(x AS HUGEINT)*t.n - t.s)) FROM sp, t)
            * 1000000 // (2*n*s) AS BIGINT) AS hoover_ppm
FROM t
"""


def events_duplicate_value_window(sf_dir: str):
    """Duplicate-transaction detector with a TIME WINDOW: same (user, exact
    cents value) recurring within 7 days — the classic double-charge audit.
    Groups co-partition by (user, value); the adjacent-gap scan per group is
    a vectorized diff; output keeps only offending groups (non-empty on this
    corpus by measurement)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])
    WIN = 7 * 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": t["user_id"],
                "c": _cents(t["value"]),
                "ts": t["ts"],
            }
        )

    def scan(g: pa.Table) -> pa.Table:
        ts = np.sort(
            g["ts"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        gaps = np.diff(ts)
        hits = int((gaps <= WIN).sum())
        if hits == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "value_cents": pa.array([], pa.int64()),
                    "n_pairs_in_window": pa.array([], pa.int64()),
                    "min_gap_seconds": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "user_id": pc.cast(g["u"].slice(0, 1), pa.int64()),
                "value_cents": pc.cast(g["c"].slice(0, 1), pa.int64()),
                "n_pairs_in_window": pa.array([hits], pa.int64()),
                "min_gap_seconds": pa.array(
                    [int(gaps.min()) // 1_000_000], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["u", "c"])
        .map_groups(scan, batch_format="pyarrow")
    )


EVENTS_DUPLICATE_VALUE_WINDOW_SQL = """
WITH v AS (
  SELECT user_id, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c, ts
  FROM events),
w AS (
  SELECT user_id, c,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id, c ORDER BY ts) AS gap
  FROM v QUALIFY gap IS NOT NULL)
SELECT CAST(user_id AS BIGINT) AS user_id, c AS value_cents,
       CAST(SUM(CASE WHEN gap <= 604800000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs_in_window,
       CAST(MIN(gap) // 1000000 AS BIGINT) AS min_gap_seconds
FROM w GROUP BY 1, 2
HAVING SUM(CASE WHEN gap <= 604800000000 THEN 1 ELSE 0 END) > 0
"""


def orders_urgent_sequence_runs(sf_dir: str):
    """Wald–Wolfowitz TWO-SAMPLE runs test: is URGENT vs non-URGENT random
    in (date, orderkey) order?  Run count from the same global-sort +
    per-block-partial + boundary-stitch discipline as the RLE audit; the
    expected runs 1 + 2n₁n₂/n and its variance are exact-int-fed fixed IEEE
    expressions."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).sort(["o_orderdate", "o_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        u = pc.equal(t["o_orderpriority"], "1-URGENT").to_numpy(zero_copy_only=False)
        runs = 1 + int((u[1:] != u[:-1]).sum())
        first_dt = int(
            np.datetime64(t["o_orderdate"][0].as_py(), "us").astype(np.int64)
        )
        return pa.table(
            {
                "first_dt": pa.array([first_dt], pa.int64()),
                "first_k": pa.array([int(t["o_orderkey"][0].as_py())], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
                "n1": pa.array([int(u.sum())], pa.int64()),
                "runs": pa.array([runs], pa.int64()),
                "first_u": pa.array([int(u[0])], pa.int64()),
                "last_u": pa.array([int(u[-1])], pa.int64()),
            }
        )

    blocks = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["first_dt", "first_k"], kind="mergesort")
    )
    n = int(blocks["n"].sum())
    n1 = int(blocks["n1"].sum())
    n2 = n - n1
    runs = int(blocks["runs"].sum())
    lu = blocks["last_u"].to_numpy(np.int64)
    fu = blocks["first_u"].to_numpy(np.int64)
    runs -= int((lu[:-1] == fu[1:]).sum())
    mu = 1.0 + 2.0 * float(n1) * float(n2) / float(n)
    var = (
        2.0
        * float(n1)
        * float(n2)
        * (2.0 * float(n1) * float(n2) - float(n))
        / (float(n) * float(n) * (float(n) - 1.0))
    )
    z = (float(runs) - mu) / np.sqrt(var)
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "n_urgent": pa.array([n1], pa.int64()),
            "n_runs": pa.array([runs], pa.int64()),
            "ww_z": pa.array([z], pa.float64()),
        }
    )


ORDERS_URGENT_SEQUENCE_RUNS_SQL = """
WITH s AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS u,
         LAG(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           OVER (ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(u) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN prev IS NULL OR u <> prev THEN 1 ELSE 0 END)
                  AS BIGINT) AS runs
      FROM s)
SELECT n AS n_orders, n1 AS n_urgent, runs AS n_runs,
       (CAST(runs AS DOUBLE)
        - (1e0 + 2e0*CAST(n1 AS DOUBLE)*CAST(n - n1 AS DOUBLE)/CAST(n AS DOUBLE)))
       / sqrt(2e0*CAST(n1 AS DOUBLE)*CAST(n - n1 AS DOUBLE)
              * (2e0*CAST(n1 AS DOUBLE)*CAST(n - n1 AS DOUBLE) - CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1e0)))
         AS ww_z
FROM t
"""


def docs_lang_length_median_test(sf_dir: str):
    """Mood's MEDIAN TEST across languages: does token length sit above or
    below the GLOBAL median uniformly?  The global median uses the
    quantile_disc convention on the bounded length grid; the k×2 chi-square
    is pure integer milli ((o·n − r·c)²·1000 // (n·r·c) summed per cell —
    every numerator nonnegative)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def lens(t: pa.Table) -> pa.Table:
        txt = t["text"].to_pylist()
        ln = np.array([len(s.split()) if s else 0 for s in txt], np.int64)
        return pa.table({"lang": t["lang"], "ln": pa.array(ln)})

    base = ds.map_batches(lens, batch_format="pyarrow")
    grid = (
        base.map_batches(
            lambda t: pa.table(
                {"ln": t["ln"], "cnt": pa.array(np.ones(t.num_rows, np.int64))}
            )
            .group_by("ln")
            .aggregate([("cnt", "sum")])
            .rename_columns(["ln", "cnt"]),
            batch_format="pyarrow",
        )
        .groupby("ln")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("ln", kind="mergesort")
    )
    vals = grid["ln"].to_numpy(np.int64)
    cum = grid["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    med = int(vals[np.searchsorted(cum, -(-n // 2), side="left")])

    cells = (
        base.map_batches(
            lambda t: pa.table(
                {
                    "lang": t["lang"],
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "a": pa.array(
                        (
                            t["ln"].to_numpy(zero_copy_only=False) > med
                        ).astype(np.int64)
                    ),
                }
            )
            .group_by("lang")
            .aggregate([("n", "sum"), ("a", "sum")])
            .rename_columns(["lang", "n", "a"]),
            batch_format="pyarrow",
        )
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("a", alias_name="a"))
        .to_pandas()
        .sort_values("lang", kind="mergesort")
    )
    A = int(cells["a"].sum())  # total above
    chi2_milli = 0
    for _, r in cells.iterrows():
        ni, ai = int(r["n"]), int(r["a"])
        for o, colsum in ((ai, A), (ni - ai, n - A)):
            num = (o * n - ni * colsum) ** 2 * 1000
            chi2_milli += num // (n * ni * colsum)
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "median_tokens": pa.array([med], pa.int64()),
            "n_langs": pa.array([len(cells)], pa.int64()),
            "chi2_milli": pa.array([chi2_milli], pa.int64()),
        }
    )


DOCS_LANG_LENGTH_MEDIAN_TEST_SQL = """
WITH d AS (
  SELECT lang,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
           AS ln
  FROM documents),
m AS (SELECT quantile_disc(ln, 0.5) AS med, CAST(COUNT(*) AS HUGEINT) AS n
      FROM d),
c AS (SELECT lang, CAST(COUNT(*) AS HUGEINT) AS ni,
             CAST(SUM(CASE WHEN ln > (SELECT med FROM m) THEN 1 ELSE 0 END)
                  AS HUGEINT) AS ai
      FROM d GROUP BY 1),
t AS (SELECT SUM(ai) AS a_tot FROM c),
x AS (
  SELECT SUM((ai*m.n - ni*t.a_tot)*(ai*m.n - ni*t.a_tot)*1000
               // (m.n*ni*t.a_tot)
             + ((ni-ai)*m.n - ni*(m.n - t.a_tot))
               * ((ni-ai)*m.n - ni*(m.n - t.a_tot))*1000
               // (m.n*ni*(m.n - t.a_tot))) AS chi2
  FROM c, m, t)
SELECT CAST(m.n AS BIGINT) AS n_docs, CAST(m.med AS BIGINT) AS median_tokens,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_langs,
       CAST(x.chi2 AS BIGINT) AS chi2_milli
FROM m, x
"""


def docs_intra_doc_drift(sf_dir: str):
    """Intra-document topical drift — a curation signal: Jaccard similarity
    between the first- and second-half TOKEN SETS of each document (low
    similarity = topic shift / concatenation artifact), censused into ppm
    deciles.  The whole computation is block-local per doc (sets never
    shuffle); docs with <2 tokens are skipped on both sides."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def drift(t: pa.Table) -> pa.Table:
        buckets = []
        for s in t["text"].to_pylist():
            toks = [w.lower() for w in (s or "").split()]
            n = len(toks)
            if n < 2:
                continue
            a, b = set(toks[: n // 2]), set(toks[n // 2 :])
            inter = len(a & b)
            union = len(a | b)
            jac = inter * 1_000_000 // union
            buckets.append(min(jac // 100_000, 9))
        if not buckets:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        arr = np.array(buckets, np.int64)
        tb = pa.table(
            {"bucket": pa.array(arr), "n_docs": pa.array(np.ones(len(arr), np.int64))}
        )
        g = tb.group_by("bucket").aggregate([("n_docs", "sum")])
        return g.rename_columns(["bucket", "n_docs"])

    return (
        ds.map_batches(drift, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


DOCS_INTRA_DOC_DRIFT_SQL = """
WITH d AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS l
  FROM documents WHERE len(string_split_regex(lower(trim(text)), '\\s+')) >= 2
                   AND trim(text) <> ''),
p AS (
  SELECT doc_id, len(l) AS n, unnest(l) AS term,
         CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM d),
h1 AS (SELECT DISTINCT doc_id, term FROM p WHERE pos <= n // 2),
h2 AS (SELECT DISTINCT doc_id, term FROM p WHERE pos > n // 2),
j AS (
  SELECT c1.doc_id,
         c1.c AS c1, c2.c AS c2, COALESCE(i.c, 0) AS inter
  FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM h1 GROUP BY 1) c1
  JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM h2 GROUP BY 1) c2
    ON c1.doc_id = c2.doc_id
  LEFT JOIN (SELECT h1.doc_id, CAST(COUNT(*) AS BIGINT) AS c
             FROM h1 JOIN h2 ON h1.doc_id = h2.doc_id AND h1.term = h2.term
             GROUP BY 1) i ON c1.doc_id = i.doc_id)
SELECT LEAST(inter * 1000000 // (c1 + c2 - inter) // 100000, 9) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM j GROUP BY 1
"""


def customer_order_concentration_hist(sf_dir: str):
    """Single-order dependency: per customer the largest order's share of
    lifetime spend in exact ppm, censused into deciles — the risk profile
    'does one order dominate this account'.  Per-customer (max, sum) cents
    partials, one groupby, a tiny bucket census."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"])
        tb = pa.table({"ck": t["o_custkey"], "mx": c, "s": c})
        g = tb.group_by("ck").aggregate([("mx", "max"), ("s", "sum")])
        return g.rename_columns(["ck", "mx", "s"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Max("mx", alias_name="mx"), Sum("s", alias_name="s"))
        .to_pandas()
    )
    ppm = [int(m) * 1_000_000 // int(s) for m, s in zip(agg["mx"], agg["s"])]
    bucket = np.minimum(np.array(ppm, np.int64) // 100_000, 9)
    tb = pa.table(
        {
            "bucket": pa.array(bucket),
            "n_customers": pa.array(np.ones(len(bucket), np.int64)),
        }
    )
    g = tb.group_by("bucket").aggregate([("n_customers", "sum")])
    return g.rename_columns(["bucket", "n_customers"])


CUSTOMER_ORDER_CONCENTRATION_HIST_SQL = """
WITH c AS (
  SELECT CAST(MAX(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS mx,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM orders GROUP BY o_custkey)
SELECT LEAST(mx * 1000000 // s // 100000, 9) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM c GROUP BY 1
"""


def docs_term_burstiness_topk(sf_dir: str):
    """Church–Gale term burstiness: collection frequency over document
    frequency (cf·1000 // df) — bursty terms concentrate in few documents,
    the signal behind stopword/keyword splits.  Per-block (term, doc) count
    combiners keep the shuffle at O(doc-vocab pairs); top-20 by
    (ratio DESC, term ASC)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), reps)
        tb = pa.table(
            {
                "term": flat,
                "doc_id": pa.array(doc.astype(np.int64)),
                "cf": pa.array(np.ones(len(doc), np.int64)),
            }
        )
        tb = tb.filter(pc.not_equal(tb["term"], ""))
        g = tb.group_by(["term", "doc_id"]).aggregate([("cf", "sum")])
        return g.rename_columns(["term", "doc_id", "cf"])

    perdoc = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["term", "doc_id"])
        .aggregate(Sum("cf", alias_name="cf"))
        .to_pandas()
    )
    term = perdoc.groupby("term").agg(cf=("cf", "sum"), df=("cf", "size")).reset_index()
    term["ratio_milli"] = [
        int(c) * 1000 // int(d) for c, d in zip(term["cf"], term["df"])
    ]
    term = term.sort_values(
        ["ratio_milli", "term"], ascending=[False, True], kind="mergesort"
    ).head(20)
    return pa.table(
        {
            "term": pa.array(term["term"], pa.string()),
            "cf": pa.array(term["cf"].to_numpy(np.int64)),
            "df": pa.array(term["df"].to_numpy(np.int64)),
            "ratio_milli": pa.array(term["ratio_milli"].to_numpy(np.int64)),
        }
    )


DOCS_TERM_BURSTINESS_TOPK_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
td AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS cf
       FROM toks WHERE term <> '' GROUP BY 1, 2),
t AS (SELECT term, CAST(SUM(cf) AS BIGINT) AS cf,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM td GROUP BY 1)
SELECT term, cf, df, CAST(cf * 1000 // df AS BIGINT) AS ratio_milli
FROM t ORDER BY ratio_milli DESC, term LIMIT 20
"""


def orders_dow_eta_squared(sf_dir: str):
    """Effect size of the weekday on order value: η² = SSB/SST in exact ppm
    via HUGEINT-floored sums of squares (the ANOVA decomposition as a SHARE,
    not a test statistic).  Per-(isodow) exact sufficient stats; everything
    after the 7-row merge is integer arithmetic."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        b = _cents(t["o_totalprice"])
        dow = pc.add(pc.day_of_week(t["o_orderdate"]), 1)  # ISO 1..7
        tb = pa.table(
            {
                "dow": pc.cast(dow, pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "s": b,
                "q": pc.multiply(b, b),
            }
        )
        g = tb.group_by("dow").aggregate([("n", "sum"), ("s", "sum"), ("q", "sum")])
        return g.rename_columns(["dow", "n", "s", "q"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dow")
        .aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("q", alias_name="q")
        )
        .to_pandas()
    )
    n = int(agg["n"].sum())
    s = int(agg["s"].sum())
    # the GLOBAL Σb² passes int64 (per-dow partials don't) — sum in Python
    q = sum(int(x) for x in agg["q"])
    tt = sum(int(sg) * int(sg) // int(ng) for sg, ng in zip(agg["s"], agg["n"]))
    ssb = max(tt - s * s // n, 0)
    sst = q - s * s // n
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "k_dows": pa.array([len(agg)], pa.int64()),
            "eta2_ppm": pa.array([ssb * 1_000_000 // sst], pa.int64()),
        }
    )


ORDERS_DOW_ETA_SQUARED_SQL = """
WITH v AS (
  SELECT isodow(o_orderdate) AS dow,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS b
  FROM orders),
g AS (SELECT dow, CAST(COUNT(*) AS HUGEINT) AS n_g,
             CAST(SUM(b) AS HUGEINT) AS s_g,
             CAST(SUM(CAST(b AS HUGEINT)*b) AS HUGEINT) AS q_g
      FROM v GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(n_g) AS n, SUM(s_g) AS s,
             SUM(q_g) AS q, SUM(s_g*s_g // n_g) AS tt
      FROM g)
SELECT CAST(n AS BIGINT) AS n_orders, k AS k_dows,
       CAST(GREATEST(tt - s*s//n, 0) * 1000000 // (q - s*s//n) AS BIGINT)
         AS eta2_ppm
FROM t
"""


def docs_dedup_rate_by_source(sf_dir: str):
    """Data-card dedup table: exact-text duplicate rate PER SOURCE —
    (source, text-digest) partials so text never shuffles, then per-source
    distinct-vs-total accounting with the dup rate in exact ppm."""
    import hashlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        src = t["source"].to_pylist()
        dig = [hashlib.md5((s or "").encode()).hexdigest() for s in t["text"].to_pylist()]
        tb = pa.table(
            {
                "source": pa.array(src, pa.string()),
                "h": pa.array(dig, pa.string()),
                "n": pa.array(np.ones(len(src), np.int64)),
            }
        )
        g = tb.group_by(["source", "h"]).aggregate([("n", "sum")])
        return g.rename_columns(["source", "h", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "h"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    per = agg.groupby("source").agg(n_docs=("n", "sum"), n_unique=("n", "size"))
    per = per.sort_index()
    dup_ppm = [
        (int(nd) - int(nu)) * 1_000_000 // int(nd)
        for nd, nu in zip(per["n_docs"], per["n_unique"])
    ]
    return pa.table(
        {
            "source": pa.array(per.index.to_numpy(), pa.string()),
            "n_docs": pa.array(per["n_docs"].to_numpy(np.int64)),
            "n_unique": pa.array(per["n_unique"].to_numpy(np.int64)),
            "dup_ppm": pa.array(dup_ppm, pa.int64()),
        }
    )


DOCS_DEDUP_RATE_BY_SOURCE_SQL = """
WITH g AS (SELECT source, text, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents GROUP BY 1, 2)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST((SUM(n) - COUNT(*)) * 1000000 // SUM(n) AS BIGINT) AS dup_ppm
FROM g GROUP BY 1
"""


def lineitem_partial_corr_qty_price_given_discount(sf_dir: str):
    """PARTIAL correlation: quantity↔price with the discount effect removed,
    r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)).  Sufficient stats use
    integer DOLLARS for price (cents² sums pass int64 at scale; the dollar
    grid is the documented unit) and exact ints for quantity/discount; the
    three Pearson r's and the composition are one fixed IEEE expression
    tree."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_quantity", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        x = _cents(t["l_quantity"]).to_numpy(zero_copy_only=False) // 100  # units
        y = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False) // 100
        z = _cents(t["l_discount"]).to_numpy(zero_copy_only=False)  # whole %
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sz": pa.array([int(z.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
                "szz": pa.array([int((z * z).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxz": pa.array([int((x * z).sum())], pa.int64()),
                "syz": pa.array([int((y * z).sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n", "sx", "sy", "sz", "sxx", "syy", "szz", "sxy", "sxz", "syz"]
    )

    def corr(sab, sa, sb, saa, sbb, n):
        return (float(sab) - float(sa) * float(sb) / float(n)) / (
            np.sqrt(float(saa) - float(sa) * float(sa) / float(n))
            * np.sqrt(float(sbb) - float(sb) * float(sb) / float(n))
        )

    n = int(agg["sum(n)"])
    g = {k: int(agg[f"sum({k})"]) for k in ("sx", "sy", "sz", "sxx", "syy", "szz", "sxy", "sxz", "syz")}
    r_xy = corr(g["sxy"], g["sx"], g["sy"], g["sxx"], g["syy"], n)
    r_xz = corr(g["sxz"], g["sx"], g["sz"], g["sxx"], g["szz"], n)
    r_yz = corr(g["syz"], g["sy"], g["sz"], g["syy"], g["szz"], n)
    r_part = (r_xy - r_xz * r_yz) / np.sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz))
    return pa.table(
        {
            "n_lines": pa.array([n], pa.int64()),
            "r_xy": pa.array([r_xy], pa.float64()),
            "r_partial": pa.array([r_part], pa.float64()),
        }
    )


LINEITEM_PARTIAL_CORR_QTY_PRICE_GIVEN_DISCOUNT_SQL = """
WITH v AS (
  SELECT CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) // 100 AS x,
         CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) // 100 AS y,
         CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) AS z
  FROM lineitem),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(z) AS BIGINT) AS sz,
             CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
             CAST(SUM(z*z) AS BIGINT) AS szz,
             CAST(SUM(x*y) AS BIGINT) AS sxy, CAST(SUM(x*z) AS BIGINT) AS sxz,
             CAST(SUM(y*z) AS BIGINT) AS syz
      FROM v),
r AS (
  SELECT n,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))
           / (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
              * sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))) AS r_xy,
         (CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sz AS DOUBLE)/CAST(n AS DOUBLE))
           / (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
              * sqrt(CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)*CAST(sz AS DOUBLE)/CAST(n AS DOUBLE))) AS r_xz,
         (CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sz AS DOUBLE)/CAST(n AS DOUBLE))
           / (sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))
              * sqrt(CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE)*CAST(sz AS DOUBLE)/CAST(n AS DOUBLE))) AS r_yz
  FROM t)
SELECT n AS n_lines, r_xy,
       (r_xy - r_xz*r_yz) / sqrt((1e0 - r_xz*r_xz) * (1e0 - r_yz*r_yz))
         AS r_partial
FROM r
"""


def embeddings_hubness_census(sf_dir: str):
    """HUBNESS — the vector-search pathology metric: how often each vector
    appears in other vectors' exact top-10 neighbor lists (integer µ-unit
    distances, (d², id) tie-break), censused by occurrence count.  The
    batch side is a brute-force matmul against the broadcast corpus (the
    IVF route stands in at scale); the census is a tiny groupby."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    corpus = ds.to_pandas().sort_values("vec_id", kind="mergesort")
    cq = np.floor(
        np.stack(corpus["embedding"].to_numpy()).astype(np.float64) * 1_000_000 + 0.5
    ).astype(np.int64)
    cid = corpus["vec_id"].to_numpy(np.int64)
    corpus_ref = ray.put((cid, cq))

    def topk(t: pa.Table) -> pa.Table:
        ids, q_all = ray.get(corpus_ref)
        from ...stages.cluster import _vecs

        q = np.floor(_vecs(t, "embedding") * 1_000_000 + 0.5).astype(np.int64)
        me = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = (
            (q * q).sum(axis=1)[:, None]
            - 2 * (q @ q_all.T)
            + (q_all * q_all).sum(axis=1)[None, :]
        )
        # exclude self by id, order by (d2, id)
        out = []
        for i in range(len(me)):
            mask = ids != me[i]
            dd = d2[i][mask]
            jj = ids[mask]
            order = np.lexsort((jj, dd))[:10]
            out.append(jj[order])
        flat = np.concatenate(out) if out else np.array([], np.int64)
        tb = pa.table(
            {
                "hub_id": pa.array(flat.astype(np.int64)),
                "occ": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        g = tb.group_by("hub_id").aggregate([("occ", "sum")])
        return g.rename_columns(["hub_id", "occ"])

    occ = (
        ds.map_batches(topk, batch_format="pyarrow")
        .groupby("hub_id")
        .aggregate(Sum("occ", alias_name="occ"))
        .to_pandas()
    )
    n_vec = len(cid)
    census = occ.groupby("occ").size()
    zero = n_vec - len(occ)
    buckets = {0: zero} if zero > 0 else {}
    for k, v in census.items():
        buckets[int(k)] = int(v)
    items = sorted(buckets.items())
    return pa.table(
        {
            "k_occurrences": pa.array([i[0] for i in items], pa.int64()),
            "n_vectors": pa.array([i[1] for i in items], pa.int64()),
        }
    )


EMBEDDINGS_HUBNESS_CENSUS_SQL = """
WITH ex AS (
  SELECT vec_id,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5) AS BIGINT) AS q,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim
  FROM embeddings),
d AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         CAST(SUM((a.q - b.q)*(a.q - b.q)) AS BIGINT) AS d2
  FROM ex a JOIN ex b ON a.dim = b.dim AND a.vec_id <> b.vec_id
  GROUP BY 1, 2),
r AS (
  SELECT dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY d2, dst) AS rn
  FROM d),
occ AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS k FROM r WHERE rn <= 10
        GROUP BY 1),
allv AS (SELECT vec_id FROM embeddings),
full_occ AS (
  SELECT allv.vec_id, COALESCE(occ.k, 0) AS k
  FROM allv LEFT JOIN occ ON allv.vec_id = occ.dst)
SELECT CAST(k AS BIGINT) AS k_occurrences,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM full_occ GROUP BY 1
"""


def lineitem_revenue_waterfall(sf_dir: str):
    """Finance waterfall: gross extended price → discount taken → net →
    tax charged → final, one exact-cents row with each step's share of
    gross in ppm.  Per-line discount/tax amounts use the same
    FLOOR(x·100+0.5) cent quantization on the per-line float products in
    both engines."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount", "l_tax"],
    )

    def partial(t: pa.Table) -> pa.Table:
        gross = _cents(t["l_extendedprice"])
        disc = _cents(
            pc.multiply(t["l_extendedprice"], t["l_discount"])
        )
        net = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        tax = _cents(pc.multiply(net, t["l_tax"]))
        return pa.table(
            {
                "gross": pa.array([pc.sum(gross).as_py() or 0], pa.int64()),
                "disc": pa.array([pc.sum(disc).as_py() or 0], pa.int64()),
                "net": pa.array([pc.sum(_cents(net)).as_py() or 0], pa.int64()),
                "tax": pa.array([pc.sum(tax).as_py() or 0], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["gross", "disc", "net", "tax"]
    )
    gross = int(agg["sum(gross)"])
    disc = int(agg["sum(disc)"])
    net = int(agg["sum(net)"])
    tax = int(agg["sum(tax)"])
    return pa.table(
        {
            "gross_cents": pa.array([gross], pa.int64()),
            "discount_cents": pa.array([disc], pa.int64()),
            "net_cents": pa.array([net], pa.int64()),
            "tax_cents": pa.array([tax], pa.int64()),
            "final_cents": pa.array([net + tax], pa.int64()),
            "discount_ppm": pa.array([disc * 1_000_000 // gross], pa.int64()),
            "tax_ppm": pa.array([tax * 1_000_000 // gross], pa.int64()),
        }
    )


LINEITEM_REVENUE_WATERFALL_SQL = """
WITH t AS (
  SELECT CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS gross,
         CAST(SUM(CAST(FLOOR(l_extendedprice*l_discount*100 + 0.5) AS BIGINT))
           AS BIGINT) AS disc,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5)
           AS BIGINT)) AS BIGINT) AS net,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*l_tax*100 + 0.5)
           AS BIGINT)) AS BIGINT) AS tax
  FROM lineitem)
SELECT gross AS gross_cents, disc AS discount_cents, net AS net_cents,
       tax AS tax_cents, CAST(net + tax AS BIGINT) AS final_cents,
       CAST(disc * 1000000 // gross AS BIGINT) AS discount_ppm,
       CAST(tax * 1000000 // gross AS BIGINT) AS tax_ppm
FROM t
"""


def events_user_theilsen_slope(sf_dir: str):
    """Theil–Sen robust trend slope per user — the discrete median of all
    pairwise slopes (cⱼ−cᵢ)/(tⱼ−tᵢ) over the time-ordered value series
    (equal-timestamp pairs excluded).  Exactness: each slope is ONE IEEE
    division of two exact int64-derived doubles (bit-identical in both
    engines); the median is the quantile_disc pick sorted[ceil(n/2)−1] —
    a selection, never an average, so no float folding anywhere.  Per-user
    groups co-partition; the O(n²) pair kernel is vectorized (same scale
    profile as the Mann–Kendall op; a merge-sort median-of-slopes is the
    swap-in past ~10⁴ events/user)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64()),
            "ts_slope": pa.array([], pa.float64()),
        }
    )

    def sen(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False).astype(np.float64)
        t = (
            s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        n = len(c)
        if n < 2:
            return _empty
        i, j = np.triu_indices(n, 1)
        dt = t[j] - t[i]
        keep = dt != 0.0
        if not keep.any():
            return _empty
        slopes = np.sort((c[j][keep] - c[i][keep]) / dt[keep])
        m = len(slopes)
        med = float(slopes[(m + 1) // 2 - 1])
        return pa.table(
            {
                "user_id": pa.array([int(s["user_id"][0].as_py())], pa.int64()),
                "n_pairs": pa.array([m], pa.int64()),
                "ts_slope": pa.array([med], pa.float64()),
            }
        )

    return (
        ds.groupby("user_id").map_groups(sen, batch_format="pyarrow").sort(["user_id"])
    )


EVENTS_USER_THEILSEN_SLOPE_SQL = """
WITH v AS (SELECT user_id, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c,
                  epoch_us(ts) AS t,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
s AS (SELECT a.user_id,
             CAST(b.c - a.c AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
      FROM v a JOIN v b ON a.user_id = b.user_id AND b.rn > a.rn AND b.t <> a.t)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       quantile_disc(slope, 0.5) AS ts_slope
FROM s GROUP BY 1 ORDER BY 1
"""


def lineitem_busday_ship_lag(sf_dir: str):
    """Order-to-ship lead time in BUSINESS DAYS (Mon–Fri), as a histogram —
    the SLA report a calendar-day lag misstates by ~2/7.  Closed-form exact
    integer weekday math, no calendar tables: with dm = days since Monday
    1970-01-05, g(dm) = 5·(dm÷7) + min(dm mod 7 + 1, 5) counts weekdays from
    that Monday through the date inclusive, and busdays in (order, ship] is
    g(ship) − g(order).  Lineitem ships only (orderkey, epoch-day) into the
    8-partition join; the histogram reduces via block partials."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ship_day": pa.array(
                    t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                    // 86_400_000_000,
                    pa.int64(),
                ),
            }
        )

    li = li.map_batches(prep, batch_format="pyarrow")
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def g_busdays(day: np.ndarray) -> np.ndarray:
        dm = day - 4  # epoch day 4 = Monday 1970-01-05; all data is 1992+
        return 5 * (dm // 7) + np.minimum(dm % 7 + 1, 5)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"busdays": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        ship = t["ship_day"].combine_chunks().to_numpy(zero_copy_only=False)
        od = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        lag = g_busdays(ship) - g_busdays(od)
        vals, counts = np.unique(lag, return_counts=True)
        return pa.table(
            {
                "busdays": pa.array(vals, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("busdays")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["busdays"])
    )


LINEITEM_BUSDAY_SHIP_LAG_SQL = """
WITH j AS (
  SELECT epoch_us(l_shipdate) // 86400000000 - 4 AS ds,
         epoch_us(o_orderdate) // 86400000000 - 4 AS do_
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
g AS (SELECT (5*(ds//7) + LEAST(ds%7 + 1, 5))
           - (5*(do_//7) + LEAST(do_%7 + 1, 5)) AS busdays FROM j)
SELECT CAST(busdays AS BIGINT) AS busdays, CAST(COUNT(*) AS BIGINT) AS n
FROM g GROUP BY 1 ORDER BY 1
"""


def events_ordinal_patterns(sf_dir: str):
    """Ordinal-pattern census (Bandt–Pompe permutation-entropy front end):
    every consecutive value TRIPLE in each user's time-ordered series is
    classified by its three pairwise comparison signs — code = 9·sgn₃(b,a)
    + 3·sgn₃(c,b) + sgn₃(c,a) with sgn₃ ∈ {0,1,2} — and the corpus-wide
    code histogram is the motif profile (ties get their own codes instead
    of being broken arbitrarily).  Exact integers end to end; per-user
    kernels emit partial counts so the final shuffle is O(27) rows per
    block."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    _empty = pa.table(
        {"pattern_code": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )

    def census(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        if len(c) < 3:
            return _empty
        a, b, cc = c[:-2], c[1:-1], c[2:]
        code = (
            (np.sign(b - a) + 1) * 9
            + (np.sign(cc - b) + 1) * 3
            + (np.sign(cc - a) + 1)
        ).astype(np.int64)
        vals, counts = np.unique(code, return_counts=True)
        return pa.table(
            {
                "pattern_code": pa.array(vals, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(census, batch_format="pyarrow")
        .groupby("pattern_code")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["pattern_code"])
    )


EVENTS_ORDINAL_PATTERNS_SQL = """
WITH v AS (SELECT user_id, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c,
                  lead(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
                    OVER w AS c2,
                  lead(CAST(FLOOR(value*100 + 0.5) AS BIGINT), 2)
                    OVER w AS c3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT (CASE WHEN c2 > c THEN 2 WHEN c2 = c THEN 1 ELSE 0 END)*9
           + (CASE WHEN c3 > c2 THEN 2 WHEN c3 = c2 THEN 1 ELSE 0 END)*3
           + (CASE WHEN c3 > c THEN 2 WHEN c3 = c THEN 1 ELSE 0 END) AS code
      FROM v WHERE c3 IS NOT NULL)
SELECT CAST(code AS BIGINT) AS pattern_code, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY 1 ORDER BY 1
"""


def orders_weekday_rank_profile(sf_dir: str):
    """Friedman-style weekday rank profile: daily revenue (cents) ranks
    WITHIN each Monday-anchored week, ranks summed per ISO weekday — a
    seasonality test robust to level shifts across weeks (the Friedman
    two-way-ranks layout; weeks act as blocks, days present in a week rank
    among themselves so sparse weeks still contribute).  Ties get average
    ranks kept exact as 2·rank: 2·RANK() + tie_count − 1.  Daily totals
    come from block partials; the ranking folds over the O(calendar-days)
    daily table — bounded by the date range, not the row count."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pa.array(
            t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000,
            pa.int64(),
        )
        tb = pa.table({"day": day, "rev": _cents(t["o_totalprice"])})
        return tb.group_by("day").aggregate([("rev", "sum")]).rename_columns(
            ["day", "rev"]
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    day = daily["day"].to_numpy(dtype=np.int64)
    rev = daily["rev"].to_numpy(dtype=np.int64)
    dm = day - 4  # Monday 1970-01-05 anchor
    wk = dm // 7
    dow = dm % 7 + 1  # 1=Mon .. 7=Sun (isodow)
    # 2x average rank within week: 2*min_rank + ties - 1, vectorized via
    # lexsort over (week, revenue)
    order = np.lexsort((rev, wk))
    wks, revs = wk[order], rev[order]
    # position within week (0-based)
    week_start = np.r_[True, wks[1:] != wks[:-1]]
    pos = np.arange(len(wks)) - np.maximum.accumulate(
        np.where(week_start, np.arange(len(wks)), 0)
    )
    # min rank of each tie group = pos of first equal value in the week
    grp_start = week_start | np.r_[True, revs[1:] != revs[:-1]]
    first_pos = pos[np.maximum.accumulate(np.where(grp_start, np.arange(len(wks)), 0))]
    # tie count per group broadcast to members
    starts_idx = np.flatnonzero(grp_start)
    sizes = np.diff(np.r_[starts_idx, len(wks)])
    ties = np.repeat(sizes, sizes)
    rank2 = 2 * (first_pos + 1) + ties - 1
    out_dow = dow[order]
    res = {}
    for d in range(1, 8):
        m = out_dow == d
        if m.any():
            res[d] = (int(rank2[m].sum()), int(m.sum()))
    return pa.table(
        {
            "isodow": pa.array(sorted(res), pa.int64()),
            "rank2_sum": pa.array([res[d][0] for d in sorted(res)], pa.int64()),
            "n_days": pa.array([res[d][1] for d in sorted(res)], pa.int64()),
        }
    )


ORDERS_WEEKDAY_RANK_PROFILE_SQL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 - 4 AS dm,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
r AS (SELECT dm % 7 + 1 AS isodow,
             2*RANK() OVER (PARTITION BY dm // 7 ORDER BY rev)
               + COUNT(*) OVER (PARTITION BY dm // 7, rev) - 1 AS rank2
      FROM d)
SELECT CAST(isodow AS BIGINT) AS isodow,
       CAST(SUM(rank2) AS BIGINT) AS rank2_sum,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM r GROUP BY 1 ORDER BY 1
"""


def customer_chao1_richness(sf_dir: str):
    """Chao1 species-richness estimate of the ACTIVE customer population —
    species = customers observed in orders, F1/F2 = customers seen exactly
    once/twice; chao1 = D + F1(F1−1)/(2(F2+1)) (the bias-corrected form,
    defined even at F2 = 0).  The ecology estimator transplanted to "how
    many buyers does the order sample imply".  Exact integers: the
    correction term ships as floor-divided ppm so neither engine touches a
    float.  Per-customer counts shrink block-locally; D/F1/F2 reduce as
    one-row partials — nothing O(customers) leaves the cluster."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"ck": t["o_custkey"]})
            .group_by("ck")
            .aggregate([("ck", "count")])
            .rename_columns(["ck", "n"])
        )

    per_cust = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("n", alias_name="n"))
    )

    def fold(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "d": pa.array([len(n)], pa.int64()),
                "f1": pa.array([int((n == 1).sum())], pa.int64()),
                "f2": pa.array([int((n == 2).sum())], pa.int64()),
            }
        )

    agg = per_cust.map_batches(fold, batch_format="pyarrow").sum(["d", "f1", "f2"])
    d, f1, f2 = int(agg["sum(d)"]), int(agg["sum(f1)"]), int(agg["sum(f2)"])
    chao1_ppm = d * 1_000_000 + f1 * (f1 - 1) * 1_000_000 // (2 * (f2 + 1))
    return pa.table(
        {
            "observed": pa.array([d], pa.int64()),
            "f1": pa.array([f1], pa.int64()),
            "f2": pa.array([f2], pa.int64()),
            "chao1_ppm": pa.array([chao1_ppm], pa.int64()),
        }
    )


CUSTOMER_CHAO1_RICHNESS_SQL = """
WITH c AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM c)
SELECT d AS observed, f1, f2,
       CAST(d * 1000000 + f1 * (f1 - 1) * 1000000 // (2 * (f2 + 1))
            AS BIGINT) AS chao1_ppm
FROM s
"""


def events_wilcoxon_signed_rank(sf_dir: str):
    """Wilcoxon signed-rank test on paired per-user halves: each user's
    difference d = Σ(odd-position cents) − Σ(even-position cents) over the
    time-ordered series (a within-user A/B pairing by alternation); |d|
    ranks across users with average-tie ranks kept exact as 2·rank, and
    W⁺/W⁻ are the signed rank sums (zero-difference users drop, per the
    standard procedure).  Exact integers throughout.  Per-user diffs are a
    co-partitioned kernel; the rank fold is O(active users) — the
    distributed swap-in is rank.global_value_rank over the diff column."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def diff(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        sign = np.where(np.arange(len(c)) % 2 == 0, 1, -1)  # rn 1-based odd
        return pa.table({"d": pa.array([int((c * sign).sum())], pa.int64())})

    diffs = (
        ds.groupby("user_id")
        .map_groups(diff, batch_format="pyarrow")
        .to_pandas()["d"]
        .to_numpy(dtype=np.int64)
    )
    diffs = diffs[diffs != 0]
    if len(diffs) == 0:
        return pa.table(
            {
                "n_users": pa.array([0], pa.int64()),
                "w_plus_x2": pa.array([0], pa.int64()),
                "w_minus_x2": pa.array([0], pa.int64()),
            }
        )
    ad = np.abs(diffs)
    order = np.argsort(ad, kind="stable")
    ads, ds_ = ad[order], diffs[order]
    grp = np.r_[True, ads[1:] != ads[:-1]]
    starts = np.flatnonzero(grp)
    sizes = np.diff(np.r_[starts, len(ads)])
    min_rank = np.repeat(starts + 1, sizes)
    rank2 = 2 * min_rank + np.repeat(sizes, sizes) - 1
    return pa.table(
        {
            "n_users": pa.array([len(ds_)], pa.int64()),
            "w_plus_x2": pa.array([int(rank2[ds_ > 0].sum())], pa.int64()),
            "w_minus_x2": pa.array([int(rank2[ds_ < 0].sum())], pa.int64()),
        }
    )


EVENTS_WILCOXON_SIGNED_RANK_SQL = """
WITH v AS (SELECT user_id, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
d AS (SELECT user_id,
             CAST(SUM(CASE WHEN rn % 2 = 1 THEN c ELSE -c END) AS BIGINT) AS d
      FROM v GROUP BY 1
      HAVING SUM(CASE WHEN rn % 2 = 1 THEN c ELSE -c END) <> 0),
r AS (SELECT d, 2*RANK() OVER (ORDER BY ABS(d))
              + COUNT(*) OVER (PARTITION BY ABS(d)) - 1 AS rank2 FROM d)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN d > 0 THEN rank2 ELSE 0 END) AS BIGINT) AS w_plus_x2,
       CAST(SUM(CASE WHEN d < 0 THEN rank2 ELSE 0 END) AS BIGINT) AS w_minus_x2
FROM r
"""


def trade_graph_modularity(sf_dir: str):
    """Newman modularity of the nation partition over the bipartite
    customer–supplier trade graph (edges = DISTINCT trading pairs):
    per community c, Q_c = e_c/m − (d_c/2m)², reported EXACTLY as the
    integer numerator contrib = 4·m·e_c − d_c² over the common denominator
    4m² (no division ships) — positive contribs mean nations trade
    internally more than degree chance predicts.  Degree sums need no
    per-node pass: Σ_{nodes∈c} deg = edges with that endpoint in c.
    Distinct pairs shrink block-locally before the joins; the nation
    matrix is O(nations²) on the driver."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])

    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return (
            pa.table({"ck": t["o_custkey"], "sk": t["l_suppkey"]})
            .group_by(["ck", "sk"])
            .aggregate([])
        )

    edges = (
        joined.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["ck", "sk"])
        .aggregate(Count(alias_name="_cnt"))
    )
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    supp = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    ew = edges.join(
        cust, join_type="inner", num_partitions=8, on=("ck",), right_on=("c_custkey",)
    ).join(supp, join_type="inner", num_partitions=8, on=("sk",), right_on=("s_suppkey",))

    def census(t: pa.Table) -> pa.Table:
        return (
            pa.table({"cnat": t["c_nationkey"], "snat": t["s_nationkey"]})
            .group_by(["cnat", "snat"])
            .aggregate([("cnat", "count")])
            .rename_columns(["cnat", "snat", "n"])
        )

    mat = (
        ew.map_batches(census, batch_format="pyarrow")
        .groupby(["cnat", "snat"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    cnat = mat["cnat"].to_numpy(dtype=np.int64)
    snat = mat["snat"].to_numpy(dtype=np.int64)
    n = mat["n"].to_numpy(dtype=np.int64)
    m = int(n.sum())
    nats = np.unique(np.r_[cnat, snat])
    rows = []
    for nat in nats:
        e_c = int(n[(cnat == nat) & (snat == nat)].sum())
        d_c = int(n[cnat == nat].sum()) + int(n[snat == nat].sum())
        rows.append((int(nat), e_c, d_c, 4 * m * e_c - d_c * d_c))
    return pa.table(
        {
            "nationkey": pa.array([r[0] for r in rows], pa.int64()),
            "intra_edges": pa.array([r[1] for r in rows], pa.int64()),
            "degree_sum": pa.array([r[2] for r in rows], pa.int64()),
            "contrib_x4m2": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


TRADE_GRAPH_MODULARITY_SQL = """
WITH e AS (SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
g AS (SELECT c.c_nationkey AS cnat, s.s_nationkey AS snat
      FROM e JOIN customer c ON e.ck = c.c_custkey
             JOIN supplier s ON e.sk = s.s_suppkey),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM g),
nats AS (SELECT cnat AS nat FROM g UNION SELECT snat FROM g),
per AS (SELECT nat,
               CAST((SELECT COUNT(*) FROM g WHERE cnat = nat AND snat = nat)
                    AS BIGINT) AS intra_edges,
               CAST((SELECT COUNT(*) FROM g WHERE cnat = nat) +
                    (SELECT COUNT(*) FROM g WHERE snat = nat)
                    AS BIGINT) AS degree_sum
        FROM nats)
SELECT CAST(nat AS BIGINT) AS nationkey, intra_edges, degree_sum,
       CAST(4 * m.m * intra_edges - degree_sum * degree_sum AS BIGINT)
         AS contrib_x4m2
FROM per, m ORDER BY 1
"""


def orders_monthly_dominance_count(sf_dir: str):
    """Pareto dominance-depth census within each order month: order A
    dominates B when it is no later AND no cheaper-to-the-buyer is wrong —
    here: price ≥ and date ≤ with at least one strict (the 2-D skyline's
    counting generalization; dominated_by = 0 rows ARE the monthly
    skyline).  The corpus-wide histogram of dominance counts profiles how
    "layered" each month's order book is.  Exact integers (cents, epoch
    days); months co-partition and the per-month kernel is vectorized —
    the sort-sweep Fenwick kernel is the swap-in past ~10⁴ orders/month."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "day": pa.array(
                    t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                    // 86_400_000_000,
                    pa.int64(),
                ),
                "price": _cents(t["o_totalprice"]),
            }
        )

    def dom(g: pa.Table) -> pa.Table:
        day = g["day"].combine_chunks().to_numpy(zero_copy_only=False)
        price = g["price"].combine_chunks().to_numpy(zero_copy_only=False)
        de = day[:, None] <= day[None, :]
        pe = price[:, None] >= price[None, :]
        strict = (day[:, None] < day[None, :]) | (price[:, None] > price[None, :])
        dominated_by = (de & pe & strict).sum(axis=0).astype(np.int64)
        vals, counts = np.unique(dominated_by, return_counts=True)
        return pa.table(
            {
                "dominated_by": pa.array(vals, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .map_groups(dom, batch_format="pyarrow")
        .groupby("dominated_by")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["dominated_by"])
    )


ORDERS_MONTHLY_DOMINANCE_COUNT_SQL = """
WITH o AS (SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS month,
                  epoch_us(o_orderdate) // 86400000000 AS day_,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price
           FROM orders),
d AS (SELECT b.o_orderkey,
             CAST(COUNT(a.month) AS BIGINT) AS dominated_by
      FROM o b LEFT JOIN o a
        ON a.month = b.month AND a.day_ <= b.day_ AND a.price >= b.price
       AND (a.day_ < b.day_ OR a.price > b.price)
      GROUP BY b.o_orderkey)
SELECT dominated_by, CAST(COUNT(*) AS BIGINT) AS n
FROM d GROUP BY 1 ORDER BY 1
"""


def _daily_order_revenue(sf_dir: str):
    """(epoch-day, revenue-cents) daily totals via block partials + one
    small groupby — O(calendar days) rows, bounded by the date range."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pa.array(
            t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000,
            pa.int64(),
        )
        tb = pa.table({"day": day, "rev": _cents(t["o_totalprice"])})
        return tb.group_by("day").aggregate([("rev", "sum")]).rename_columns(
            ["day", "rev"]
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("day")
    )
    return (
        daily["day"].to_numpy(dtype=np.int64),
        daily["rev"].to_numpy(dtype=np.int64),
    )


def orders_siegel_slope(sf_dir: str):
    """Siegel REPEATED-MEDIANS trend slope of daily revenue — even more
    outlier-proof than Theil–Sen (50 % breakdown): for every day i take the
    discrete median over j≠i of slope(i,j), then the discrete median of
    those per-day medians.  Every slope is ONE IEEE division of exact
    int64-derived doubles and both medians are selections (quantile_disc
    convention sorted[ceil(n/2)−1]) — bit-identical, no float folding.
    O(days²) on the bounded daily table."""
    day, rev = _daily_order_revenue(sf_dir)
    n = len(day)
    dr = rev[None, :] - rev[:, None]
    dd = day[None, :] - day[:, None]
    mask = ~np.eye(n, dtype=bool)
    slopes = dr[mask].astype(np.float64) / dd[mask].astype(np.float64)
    slopes = slopes.reshape(n, n - 1)
    slopes.sort(axis=1)
    med_i = slopes[:, (n - 1 + 1) // 2 - 1].copy()
    med_i.sort()
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "siegel_slope": pa.array([float(med_i[(n + 1) // 2 - 1])], pa.float64()),
        }
    )


ORDERS_SIEGEL_SLOPE_SQL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day_,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
s AS (SELECT a.day_,
             quantile_disc(CAST(b.rev - a.rev AS DOUBLE)
                           / CAST(b.day_ - a.day_ AS DOUBLE), 0.5) AS med_i
      FROM d a JOIN d b ON b.day_ <> a.day_ GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       quantile_disc(med_i, 0.5) AS siegel_slope
FROM s
"""


def events_circular_median_hour(sf_dir: str):
    """Circular MEDIAN hour-of-day per event type — the hour minimizing the
    total wrap-around distance Σ min(|h−k|, 24−|h−k|) over the type's hour
    histogram (circular statistics without a single trig call, so it stays
    exact-integer; ties resolve to the smallest hour).  The histogram is
    O(types×24) — block partials shrink everything before the shuffle and
    the 24-candidate argmin folds on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        hr = pa.array(
            (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000)
            % 24,
            pa.int64(),
        )
        return (
            pa.table({"event_type": t["event_type"], "hr": hr})
            .group_by(["event_type", "hr"])
            .aggregate([("hr", "count")])
            .rename_columns(["event_type", "hr", "n"])
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out_t, out_h, out_d = [], [], []
    for et, g in hist.groupby("event_type", sort=True):
        k = g["hr"].to_numpy(dtype=np.int64)
        cnt = g["n"].to_numpy(dtype=np.int64)
        h = np.arange(24, dtype=np.int64)
        diff = np.abs(h[:, None] - k[None, :])
        dist = (cnt[None, :] * np.minimum(diff, 24 - diff)).sum(axis=1)
        best = int(dist.argmin())  # argmin returns first (smallest h) on ties
        out_t.append(str(et))
        out_h.append(best)
        out_d.append(int(dist[best]))
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "circ_median_hour": pa.array(out_h, pa.int64()),
            "total_circ_dist": pa.array(out_d, pa.int64()),
        }
    )


EVENTS_CIRCULAR_MEDIAN_HOUR_SQL = """
WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 % 24 AS hr,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
cand AS (SELECT DISTINCT event_type, c.h
         FROM h, (SELECT unnest(range(24)) AS h) c),
d AS (SELECT cand.event_type, cand.h,
             CAST(SUM(hh.n * LEAST(abs(cand.h - hh.hr),
                                   24 - abs(cand.h - hh.hr))) AS BIGINT) AS dist
      FROM cand JOIN h hh ON cand.event_type = hh.event_type GROUP BY 1, 2),
m AS (SELECT event_type, h, dist,
             row_number() OVER (PARTITION BY event_type ORDER BY dist, h) AS rn
      FROM d)
SELECT event_type, CAST(h AS BIGINT) AS circ_median_hour,
       dist AS total_circ_dist
FROM m WHERE rn = 1 ORDER BY 1
"""


def orders_pettitt_changepoint(sf_dir: str):
    """Pettitt nonparametric changepoint test on the daily-revenue series:
    U_t = Σ_{i≤t,j>t} sgn(revⱼ − revᵢ), the split with max |U_t| is the
    most likely level shift.  Computed via the rank identity
    U_t = t(n−t) + t(t+1) − Σ_{i≤t} 2·midrank(revᵢ) (midranks kept exact
    as 2·RANK + ties − 1), so both engines run O(n log n) instead of the
    textbook O(n³) triple loop — exact integers end to end; earliest t
    wins ties on |U|."""
    day, rev = _daily_order_revenue(sf_dir)
    n = len(day)
    order = np.argsort(rev, kind="stable")
    rank2 = np.empty(n, dtype=np.int64)
    sr = rev[order]
    grp = np.r_[True, sr[1:] != sr[:-1]]
    starts = np.flatnonzero(grp)
    sizes = np.diff(np.r_[starts, n])
    rank2[order] = 2 * np.repeat(starts + 1, sizes) + np.repeat(sizes, sizes) - 1
    t = np.arange(1, n, dtype=np.int64)  # splits after position t (1..n-1)
    w2 = np.cumsum(rank2)[:-1]
    u = t * (n - t) + t * (t + 1) - w2
    k = int(np.abs(u).max())
    pos = int(np.abs(u).argmax())  # earliest on ties
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "cp_day": pa.array([int(day[pos])], pa.int64()),
            "u_at_cp": pa.array([int(u[pos])], pa.int64()),
            "k_stat": pa.array([k], pa.int64()),
        }
    )


ORDERS_PETTITT_CHANGEPOINT_SQL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day_,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
r AS (SELECT day_, row_number() OVER (ORDER BY day_) AS t,
             2*RANK() OVER (ORDER BY rev)
               + COUNT(*) OVER (PARTITION BY rev) - 1 AS rank2
      FROM d),
u AS (SELECT day_, t,
             t*((SELECT COUNT(*) FROM d) - t) + t*(t+1)
               - SUM(rank2) OVER (ORDER BY t) AS u
      FROM r QUALIFY t < (SELECT COUNT(*) FROM d)),
m AS (SELECT day_, u, row_number() OVER (ORDER BY abs(u) DESC, t) AS rn,
             CAST(MAX(abs(u)) OVER () AS BIGINT) AS k_stat,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days
      FROM u)
SELECT n_days, CAST(day_ AS BIGINT) AS cp_day, CAST(u AS BIGINT) AS u_at_cp,
       k_stat
FROM m WHERE rn = 1
"""


def part_association_rules(sf_dir: str):
    """Association-rule mining (the Apriori/FP-growth READOUT layer over the
    co-purchase counts): for every directed rule a→b between parts bought in
    the same order, confidence = n_ab/n_a and lift = n_ab·N/(n_a·n_b), both
    as floor-divided ppm integers; top-10 rules by confidence (then support,
    then pair — a deterministic limit boundary).  Distinct (order, part)
    partials → 8-partition self-join (pair blow-up bounded by basket size)
    → pair counts join item counts on each side — rules never leave the
    cluster until the final top-10."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"ok": t["l_orderkey"], "pk": t["l_partkey"]})
            .group_by(["ok", "pk"])
            .aggregate([])
        )

    d = (
        li.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["ok", "pk"])
        .aggregate(Count(alias_name="_c"))
    )
    n_orders = int(
        d.map_batches(
            lambda t: pa.table({"ok": t["ok"]}).group_by("ok").aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("ok")
        .aggregate(Count(alias_name="_o"))
        .count()
    )
    items = d.groupby("pk").aggregate(Count(alias_name="n_item"))
    a = d.map_batches(
        lambda t: t.select(["ok", "pk"]).rename_columns(["ok", "p1"]),
        batch_format="pyarrow",
    )
    b = d.map_batches(
        lambda t: t.select(["ok", "pk"]).rename_columns(["ok2", "p2"]),
        batch_format="pyarrow",
    )
    j = a.join(b, join_type="inner", num_partitions=8, on=("ok",), right_on=("ok2",))
    pairs = (
        j.map_batches(
            lambda t: t.filter(pc.not_equal(t["p1"], t["p2"])).select(["p1", "p2"]),
            batch_format="pyarrow",
        )
        .groupby(["p1", "p2"])
        .aggregate(Count(alias_name="support"))
    )
    ia = items.map_batches(
        lambda t: t.rename_columns(["pk_a", "n_a"]), batch_format="pyarrow"
    )
    ib = items.map_batches(
        lambda t: t.rename_columns(["pk_b", "n_b"]), batch_format="pyarrow"
    )
    enriched = pairs.join(
        ia, join_type="inner", num_partitions=8, on=("p1",), right_on=("pk_a",)
    ).join(ib, join_type="inner", num_partitions=8, on=("p2",), right_on=("pk_b",))

    def score(t: pa.Table) -> pa.Table:
        sup = t["support"].combine_chunks().to_numpy(zero_copy_only=False)
        na = t["n_a"].combine_chunks().to_numpy(zero_copy_only=False)
        nb = t["n_b"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "antecedent": t["p1"],
                "consequent": t["p2"],
                "support": pa.array(sup, pa.int64()),
                "confidence_ppm": pa.array(sup * 1_000_000 // na, pa.int64()),
                "lift_ppm": pa.array(
                    sup * n_orders * 1_000_000 // (na * nb), pa.int64()
                ),
            }
        )

    return (
        enriched.map_batches(score, batch_format="pyarrow")
        .sort(
            ["confidence_ppm", "support", "antecedent", "consequent"],
            descending=[True, True, False, False],
        )
        .limit(10)
    )


PART_ASSOCIATION_RULES_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM d),
items AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_item FROM d GROUP BY 1),
pairs AS (SELECT a.pk AS p1, b.pk AS p2, CAST(COUNT(*) AS BIGINT) AS support
          FROM d a JOIN d b ON a.ok = b.ok AND a.pk <> b.pk GROUP BY 1, 2)
SELECT p1 AS antecedent, p2 AS consequent, support,
       CAST(support * 1000000 // ia.n_item AS BIGINT) AS confidence_ppm,
       CAST(support * n.n_orders * 1000000 // (ia.n_item * ib.n_item)
            AS BIGINT) AS lift_ppm
FROM pairs JOIN items ia ON p1 = ia.pk JOIN items ib ON p2 = ib.pk, n
ORDER BY confidence_ppm DESC, support DESC, antecedent, consequent
LIMIT 10
"""


def orders_hodges_lehmann_weekend(sf_dir: str):
    """Hodges–Lehmann location-shift estimate between WEEKEND and WEEKDAY
    daily revenue: the discrete median of all pairwise differences
    rev_weekend − rev_weekday — the robust effect-size companion to the
    rank tests (Mann–Whitney says "different"; HL says "by how much").
    Exact integers: cents differences, selection median (quantile_disc
    convention), zero float arithmetic.  O(n_we·n_wd) over the bounded
    daily table."""
    day, rev = _daily_order_revenue(sf_dir)
    dow = (day - 4) % 7 + 1
    we = rev[dow >= 6]
    wd = rev[dow <= 5]
    diffs = (we[:, None] - wd[None, :]).ravel()
    diffs.sort()
    m = len(diffs)
    return pa.table(
        {
            "n_weekend_days": pa.array([len(we)], pa.int64()),
            "n_weekday_days": pa.array([len(wd)], pa.int64()),
            "hl_shift_cents": pa.array([int(diffs[(m + 1) // 2 - 1])], pa.int64()),
        }
    )


ORDERS_HODGES_LEHMANN_WEEKEND_SQL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day_,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
k AS (SELECT (day_ - 4) % 7 + 1 AS dow, rev FROM d),
we AS (SELECT rev FROM k WHERE dow >= 6),
wd AS (SELECT rev FROM k WHERE dow <= 5)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM we) AS n_weekend_days,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM wd) AS n_weekday_days,
       CAST(quantile_disc(we.rev - wd.rev, 0.5) AS BIGINT) AS hl_shift_cents
FROM we, wd
"""


def lineitem_split_gini_gain(sf_dir: str):
    """Decision-stump split evaluation (the inner loop of distributed
    tree learning): for every candidate threshold "discount ≤ t %", the
    Gini-impurity ingredients of predicting l_returnflag — per side, the
    class-count sum-of-squares (impurity = 1 − Σc²/n², kept as the exact
    integer pieces n and Σc² so no division ships).  The (discount-level ×
    flag) matrix reduces block-locally to O(11×3); the threshold sweep is
    a driver-side cumsum over that bounded grid."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_discount", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        pct = _cents(t["l_discount"])  # 0.00-0.10 grid → 0..10 integer pct
        return (
            pa.table({"pct": pct, "f": t["l_returnflag"]})
            .group_by(["pct", "f"])
            .aggregate([("pct", "count")])
            .rename_columns(["pct", "f", "n"])
        )

    mat = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pct", "f"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    pcts = np.sort(mat["pct"].unique())
    flags = np.sort(mat["f"].unique())
    grid = np.zeros((len(pcts), len(flags)), dtype=np.int64)
    pi = {p: i for i, p in enumerate(pcts)}
    fi = {f: i for i, f in enumerate(flags)}
    for p, f, n in mat.itertuples(index=False):
        grid[pi[p], fi[f]] = n
    cum = grid.cumsum(axis=0)
    total = cum[-1]
    rows = []
    for i, thr in enumerate(pcts[:-1]):  # right side must be non-empty
        left, right = cum[i], total - cum[i]
        rows.append(
            (
                int(thr),
                int(left.sum()),
                int((left * left).sum()),
                int(right.sum()),
                int((right * right).sum()),
            )
        )
    return pa.table(
        {
            "thr_pct": pa.array([r[0] for r in rows], pa.int64()),
            "n_left": pa.array([r[1] for r in rows], pa.int64()),
            "sumsq_left": pa.array([r[2] for r in rows], pa.int64()),
            "n_right": pa.array([r[3] for r in rows], pa.int64()),
            "sumsq_right": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


LINEITEM_SPLIT_GINI_GAIN_SQL = """
WITH c AS (SELECT CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) AS pct,
                  l_returnflag AS f, CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2),
t AS (SELECT DISTINCT pct AS thr FROM c
      WHERE pct < (SELECT MAX(pct) FROM c)),
l AS (SELECT t.thr, c.f, SUM(c.n) AS n FROM t JOIN c ON c.pct <= t.thr
      GROUP BY 1, 2),
r AS (SELECT t.thr, c.f, SUM(c.n) AS n FROM t JOIN c ON c.pct > t.thr
      GROUP BY 1, 2),
ls AS (SELECT thr, CAST(SUM(n) AS BIGINT) AS n_left,
              CAST(SUM(n*n) AS BIGINT) AS sumsq_left FROM l GROUP BY 1),
rs AS (SELECT thr, CAST(SUM(n) AS BIGINT) AS n_right,
              CAST(SUM(n*n) AS BIGINT) AS sumsq_right FROM r GROUP BY 1)
SELECT CAST(ls.thr AS BIGINT) AS thr_pct, n_left, sumsq_left,
       n_right, sumsq_right
FROM ls JOIN rs ON ls.thr = rs.thr ORDER BY 1
"""


def embeddings_srp_hamming_hist(sf_dir: str):
    """Sign-random-projection (SRP) code collision profile: each 64-dim
    embedding quantizes to its sign bit-code (two 32-bit halves so BIGINT
    never overflows), and the histogram of pairwise Hamming distances
    profiles how discriminative 1-bit-per-dim quantization is on this
    corpus — the design curve for choosing SimHash/SRP band widths.  Codes
    are computed block-parallel; the all-pairs census runs on the O(n)
    code vector (the LSH-banded bucket join in stages/ann.py is the
    at-scale swap-in; this op IS its calibration readout)."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def codes(t: pa.Table) -> pa.Table:
        emb = np.stack(t["embedding"].to_pandas().to_numpy())
        bits = emb > 0
        w32 = 1 << np.arange(32, dtype=np.int64)
        lo = (bits[:, :32] * w32).sum(axis=1).astype(np.int64)
        hi = (bits[:, 32:64] * w32).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
            }
        )

    df = ds.map_batches(codes, batch_format="pyarrow").to_pandas()
    lo = df["lo"].to_numpy(dtype=np.int64)
    hi = df["hi"].to_numpy(dtype=np.int64)
    pop16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.int64)

    def popcount(v: np.ndarray) -> np.ndarray:
        return pop16[v & 0xFFFF] + pop16[(v >> 16) & 0xFFFF]

    n = len(lo)
    iu = np.triu_indices(n, 1)
    hd = popcount(lo[iu[0]] ^ lo[iu[1]]) + popcount(hi[iu[0]] ^ hi[iu[1]])
    vals, counts = np.unique(hd, return_counts=True)
    return pa.table(
        {
            "hamming": pa.array(vals, pa.int64()),
            "n_pairs": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


EMBEDDINGS_SRP_HAMMING_HIST_SQL = """
WITH c AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN e > 0 AND p <= 32 THEN 2**(p-1) ELSE 0 END)
              AS BIGINT) AS lo,
         CAST(SUM(CASE WHEN e > 0 AND p > 32 THEN 2**(p-33) ELSE 0 END)
              AS BIGINT) AS hi
  FROM (SELECT vec_id, unnest(embedding) AS e,
               unnest(range(1, len(embedding)+1)) AS p
        FROM embeddings)
  GROUP BY 1),
p AS (SELECT bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS hd
      FROM c a JOIN c b ON a.vec_id < b.vec_id)
SELECT CAST(hd AS BIGINT) AS hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p GROUP BY 1 ORDER BY 1
"""


def docs_flesch_scores(sf_dir: str):
    """Flesch reading-ease, integer-scaled: per document the exact
    ingredient counts (words W, sentence marks S, syllables ≈ vowel groups
    with a 1-per-word floor) and the score numerator 206835·S·W − 1015·W²
    − 84600·Syl·S over the implied denominator 1000·S·W — the classic
    readability formula with every rational kept as integers so both
    engines agree to the last bit.  One vectorized pass: regex vowel-group
    counts per token (pc.count_substring_regex), parent-index scatter-add
    back to documents."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def flesch(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(t["text"])
        keep = pc.not_equal(pc.utf8_trim_whitespace(txt), "")
        sub = t.filter(keep)
        txt = pc.utf8_lower(sub["text"])
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), pattern=r"\s+")
        w = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        vg = (
            pc.count_substring_regex(flat, pattern=r"[aeiouy]+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        syl_tok = np.maximum(vg, 1)
        syl = np.zeros(len(sub), dtype=np.int64)
        np.add.at(syl, parent, syl_tok)
        s = np.maximum(
            pc.count_substring_regex(txt, pattern=r"[.!?]+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64),
            1,
        )
        num = 206835 * s * w - 1015 * w * w - 84600 * syl * s
        return pa.table(
            {
                "doc_id": sub["doc_id"],
                "n_words": pa.array(w, pa.int64()),
                "n_sents": pa.array(s, pa.int64()),
                "n_syllables": pa.array(syl, pa.int64()),
                "flesch_num": pa.array(num, pa.int64()),
            }
        )

    return ds.map_batches(flesch, batch_format="pyarrow")


DOCS_FLESCH_SCORES_SQL = """
WITH d AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents
           WHERE trim(text) <> ''),
tok AS (SELECT doc_id, unnest(string_split_regex(txt, '\\s+')) AS w FROM d),
syl AS (SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(GREATEST(len(regexp_extract_all(w, '[aeiouy]+')), 1))
                    AS BIGINT) AS n_syllables
        FROM tok GROUP BY 1),
sen AS (SELECT doc_id,
               GREATEST(CAST(len(regexp_extract_all(txt, '[.!?]+')) AS BIGINT),
                        1) AS n_sents
        FROM d)
SELECT syl.doc_id, n_words, n_sents, n_syllables,
       CAST(206835*n_sents*n_words - 1015*n_words*n_words
            - 84600*n_syllables*n_sents AS BIGINT) AS flesch_num
FROM syl JOIN sen ON syl.doc_id = sen.doc_id
"""


def customer_jain_fairness(sf_dir: str):
    """Jain's fairness index of customer spend — J = (Σx)²/(n·Σx²), the
    networking fair-share metric turned revenue-concentration gauge (1 =
    perfectly even, 1/n = one whale).  Reported as an exact floor-divided
    ppm.  Overflow discipline: per-customer totals stay int64, but Σx²
    does NOT — block partials carry it as (hi, lo) = (q ÷ 2³², q mod 2³²)
    int64 pairs and the driver refolds with Python bignums, so no width
    assumption anywhere; the SQL side mirrors with HUGEINT."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"ck": t["o_custkey"], "x": _cents(t["o_totalprice"])})
        return tb.group_by("ck").aggregate([("x", "sum")]).rename_columns(["ck", "x"])

    per_cust = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("x", alias_name="x"))
    )

    def fold(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False).astype(object)  # Python ints
        q = sum(int(v) * int(v) for v in x)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "s": pa.array([int(sum(int(v) for v in x))], pa.int64()),
                "q_hi": pa.array([q >> 32], pa.int64()),
                "q_lo": pa.array([q & 0xFFFFFFFF], pa.int64()),
            }
        )

    agg = per_cust.map_batches(fold, batch_format="pyarrow").to_pandas()
    n = int(agg["n"].sum())
    s = sum(int(v) for v in agg["s"])
    q = sum((int(h) << 32) + int(l) for h, l in zip(agg["q_hi"], agg["q_lo"]))
    return pa.table(
        {
            "n_customers": pa.array([n], pa.int64()),
            "total_cents": pa.array([s], pa.int64()),
            "jain_ppm": pa.array([s * s * 1_000_000 // (n * q)], pa.int64()),
        }
    )


CUSTOMER_JAIN_FAIRNESS_SQL = """
WITH c AS (SELECT CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS x
           FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS s,
             SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q
      FROM c)
SELECT CAST(n AS BIGINT) AS n_customers, CAST(s AS BIGINT) AS total_cents,
       CAST(s * s * 1000000 // (n * q) AS BIGINT) AS jain_ppm
FROM t
"""


def orders_block_maxima_return_periods(sf_dir: str):
    """Extreme-value block-maxima readout: the monthly maxima of daily
    revenue, ranked, with the empirical return period (n_blocks+1)/rank as
    an exact ×100 integer — "a day this big recurs every ~N months", the
    Gumbel-analysis front end without a single float fit.  Daily totals
    reduce distributed; the monthly-maxima sweep folds over the bounded
    calendar table.  Top 10, fully tie-broken (rev desc, month asc)."""
    day, rev = _daily_order_revenue(sf_dir)
    month = (
        (np.datetime64("1970-01-01") + day.astype("timedelta64[D]"))
        .astype("datetime64[M]")
        .astype(str)
    )
    months = np.unique(month)
    mmax = np.array(
        [rev[month == m].max() for m in months], dtype=np.int64
    )
    nb = len(months)
    order = np.lexsort((months, -mmax))
    rows = []
    for r, idx in enumerate(order[:10], start=1):
        rows.append(
            (str(months[idx]), int(mmax[idx]), r, (nb + 1) * 100 // r)
        )
    return pa.table(
        {
            "month": pa.array([r[0] for r in rows], pa.string()),
            "max_daily_cents": pa.array([r[1] for r in rows], pa.int64()),
            "rnk": pa.array([r[2] for r in rows], pa.int64()),
            "return_period_x100": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


ORDERS_BLOCK_MAXIMA_RETURN_PERIODS_SQL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day_,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
m AS (SELECT strftime(DATE '1970-01-01' + day_ * INTERVAL 1 DAY, '%Y-%m')
               AS month,
             CAST(MAX(rev) AS BIGINT) AS max_daily_cents
      FROM d GROUP BY 1),
r AS (SELECT month, max_daily_cents,
             CAST(row_number() OVER (ORDER BY max_daily_cents DESC, month)
                  AS BIGINT) AS rnk,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS nb
      FROM m)
SELECT month, max_daily_cents, rnk,
       CAST((nb + 1) * 100 // rnk AS BIGINT) AS return_period_x100
FROM r WHERE rnk <= 10 ORDER BY rnk
"""


def events_typical_day_medians(sf_dir: str):
    """The "typical day" curve: per hour-of-day, the quartile profile
    (Q1/median/Q3, discrete selections — exact cents) and count of event
    values — the robust version of an hourly-mean load curve.  Hours
    co-partition into 24 groups; each group kernel is one sort + three
    index picks."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        hr = pa.array(
            (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000)
            % 24,
            pa.int64(),
        )
        return pa.table({"hr": hr, "c": _cents(t["value"])})

    def quartiles(g: pa.Table) -> pa.Table:
        c = np.sort(g["c"].combine_chunks().to_numpy(zero_copy_only=False))
        n = len(c)
        return pa.table(
            {
                "hr": pa.array([int(g["hr"][0].as_py())], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "q1_cents": pa.array([int(c[(n + 3) // 4 - 1])], pa.int64()),
                "median_cents": pa.array([int(c[(n + 1) // 2 - 1])], pa.int64()),
                "q3_cents": pa.array([int(c[(3 * n + 3) // 4 - 1])], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("hr")
        .map_groups(quartiles, batch_format="pyarrow")
        .sort(["hr"])
    )


EVENTS_TYPICAL_DAY_MEDIANS_SQL = """
WITH v AS (SELECT epoch_us(ts) // 3600000000 % 24 AS hr,
                  CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c
           FROM events)
SELECT CAST(hr AS BIGINT) AS hr, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(quantile_disc(c, 0.25) AS BIGINT) AS q1_cents,
       CAST(quantile_disc(c, 0.5) AS BIGINT) AS median_cents,
       CAST(quantile_disc(c, 0.75) AS BIGINT) AS q3_cents
FROM v GROUP BY 1 ORDER BY 1
"""


def orders_above_median_longest_run(sf_dir: str):
    """Gaps-and-islands vs a global reference level: days with revenue
    strictly above the corpus median (discrete) form runs in day order;
    report the median, how many days clear it, the number of runs and the
    longest — the "how long do hot streaks last" readout that level-free
    up/down-runs can't answer.  Exact integers; the run scan folds over
    the bounded daily table."""
    day, rev = _daily_order_revenue(sf_dir)
    n = len(rev)
    srt = np.sort(rev)
    med = int(srt[(n + 1) // 2 - 1])
    above = rev > med
    # run-length encode the boolean sequence in day order
    change = np.r_[True, above[1:] != above[:-1]]
    run_ids = np.cumsum(change) - 1
    longest = 0
    n_runs = 0
    for rid in np.unique(run_ids):
        m = run_ids == rid
        if above[m][0]:
            n_runs += 1
            longest = max(longest, int(m.sum()))
    return pa.table(
        {
            "median_cents": pa.array([med], pa.int64()),
            "n_above": pa.array([int(above.sum())], pa.int64()),
            "n_runs": pa.array([n_runs], pa.int64()),
            "longest_run": pa.array([longest], pa.int64()),
        }
    )


ORDERS_ABOVE_MEDIAN_LONGEST_RUN_SQL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day_,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
m AS (SELECT CAST(quantile_disc(rev, 0.5) AS BIGINT) AS med FROM d),
a AS (SELECT day_, rev > m.med AS above,
             row_number() OVER (ORDER BY day_) AS rn
      FROM d, m),
g AS (SELECT above, rn - row_number() OVER (PARTITION BY above ORDER BY rn)
               AS grp
      FROM a),
runs AS (SELECT CAST(COUNT(*) AS BIGINT) AS len
         FROM g WHERE above GROUP BY grp)
SELECT (SELECT med FROM m) AS median_cents,
       (SELECT CAST(COALESCE(SUM(len), 0) AS BIGINT) FROM runs) AS n_above,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM runs) AS n_runs,
       (SELECT CAST(COALESCE(MAX(len), 0) AS BIGINT) FROM runs) AS longest_run
"""


def orders_seasonal_kendall(sf_dir: str):
    """Seasonal Mann–Kendall (Hirsch–Slack): the monotone-trend S statistic
    computed SEPARATELY for each calendar month's across-years revenue
    series, so seasonality can't masquerade as trend — the standard
    hydrology fix, all exact integers (pairwise sign sums over ≤ n_years
    points).  Monthly totals reduce distributed; the 12 tiny series fold
    on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ym = pc.strftime(t["o_orderdate"], format="%Y-%m")
        tb = pa.table({"ym": ym, "rev": _cents(t["o_totalprice"])})
        return tb.group_by("ym").aggregate([("rev", "sum")]).rename_columns(
            ["ym", "rev"]
        )

    monthly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    year = monthly["ym"].str.slice(0, 4).astype(np.int64).to_numpy()
    moy = monthly["ym"].str.slice(5, 7).astype(np.int64).to_numpy()
    rev = monthly["rev"].to_numpy(dtype=np.int64)
    out_m, out_n, out_s = [], [], []
    for m in np.unique(moy):
        mask = moy == m
        yr, rv = year[mask], rev[mask]
        order = np.argsort(yr)
        rv = rv[order]
        n = len(rv)
        iu = np.triu_indices(n, 1)
        s = int(np.sign(rv[iu[1]] - rv[iu[0]]).sum()) if n > 1 else 0
        out_m.append(int(m))
        out_n.append(n)
        out_s.append(s)
    return pa.table(
        {
            "month_of_year": pa.array(out_m, pa.int64()),
            "n_years": pa.array(out_n, pa.int64()),
            "s_stat": pa.array(out_s, pa.int64()),
        }
    )


ORDERS_SEASONAL_KENDALL_SQL = """
WITH m AS (SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr,
                  CAST(strftime(o_orderdate, '%m') AS BIGINT) AS moy,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1, 2),
s AS (SELECT a.moy,
             CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                           WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM m a JOIN m b ON a.moy = b.moy AND b.yr > a.yr GROUP BY 1),
n AS (SELECT moy, CAST(COUNT(*) AS BIGINT) AS n_years FROM m GROUP BY 1)
SELECT CAST(n.moy AS BIGINT) AS month_of_year, n.n_years,
       CAST(COALESCE(s.s_stat, 0) AS BIGINT) AS s_stat
FROM n LEFT JOIN s ON n.moy = s.moy ORDER BY 1
"""


def events_ripley_k_temporal(sf_dir: str):
    """Ripley's K for a temporal point process: at each lag L, the total
    count of within-user ordered event pairs at most L apart — clustering
    beyond Poisson shows as super-linear growth in L.  Per-user kernels
    are one sort + four binary-search sweeps (O(n log n), never the n²
    join); pair counts are exact integers and additive across users, so
    the reduce is a plain sum."""
    lags = [60_000_000, 300_000_000, 3_600_000_000, 86_400_000_000]
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def count_pairs(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        t = s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.arange(1, len(t) + 1)
        return pa.table(
            {
                "lag_us": pa.array(lags, pa.int64()),
                "n_pairs": pa.array(
                    [int((np.searchsorted(t, t + L, side="right") - idx).sum())
                     for L in lags],
                    pa.int64(),
                ),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(count_pairs, batch_format="pyarrow")
        .groupby("lag_us")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        .sort(["lag_us"])
    )


EVENTS_RIPLEY_K_TEMPORAL_SQL = """
WITH v AS (SELECT user_id, epoch_us(ts) AS t,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS rn
           FROM events),
lags AS (SELECT unnest([60000000, 300000000, 3600000000, 86400000000])
           AS lag_us),
p AS (SELECT l.lag_us, CAST(COUNT(a.user_id) AS BIGINT) AS n_pairs
      FROM lags l
      LEFT JOIN (v a JOIN v b
                 ON a.user_id = b.user_id AND b.rn > a.rn)
        ON b.t - a.t <= l.lag_us
      GROUP BY 1)
SELECT CAST(lag_us AS BIGINT) AS lag_us, n_pairs FROM p ORDER BY 1
"""


def nation_top_customers_with_others(sf_dir: str):
    """The classic "top-N plus OTHERS" report rollup: per nation, the three
    biggest customers by lifetime spend as ranked rows, and everyone else
    collapsed into one rnk-0 OTHERS row (custkey −1) carrying the residual
    total and member count — the shape every dashboard needs and naive
    GROUP BY can't produce.  Spend partials shrink block-locally; one
    8-partition join attaches nations; the per-nation rank kernel sorts
    O(customers-per-nation)."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"ck": t["o_custkey"], "spend": _cents(t["o_totalprice"])})
        return tb.group_by("ck").aggregate([("spend", "sum")]).rename_columns(
            ["ck", "spend"]
        )

    spend = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("spend", alias_name="spend"))
    )
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    j = spend.join(
        cust, join_type="inner", num_partitions=8, on=("ck",), right_on=("c_custkey",)
    )

    def topn(g: pa.Table) -> pa.Table:
        ck = g["ck"].combine_chunks().to_numpy(zero_copy_only=False)
        sp = g["spend"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -sp))
        nat = int(g["c_nationkey"][0].as_py())
        rows = []
        for r, idx in enumerate(order[:3], start=1):
            rows.append((nat, r, int(ck[idx]), int(sp[idx]), 1))
        rest = order[3:]
        if len(rest):
            rows.append((nat, 0, -1, int(sp[rest].sum()), len(rest)))
        return pa.table(
            {
                "nationkey": pa.array([r[0] for r in rows], pa.int64()),
                "rnk": pa.array([r[1] for r in rows], pa.int64()),
                "custkey": pa.array([r[2] for r in rows], pa.int64()),
                "spend_cents": pa.array([r[3] for r in rows], pa.int64()),
                "n_customers": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    return (
        j.groupby("c_nationkey")
        .map_groups(topn, batch_format="pyarrow")
        .sort(["nationkey", "rnk"])
    )


NATION_TOP_CUSTOMERS_WITH_OTHERS_SQL = """
WITH s AS (SELECT o_custkey AS ck,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS spend
           FROM orders GROUP BY 1),
r AS (SELECT c.c_nationkey AS nationkey, s.ck, s.spend,
             row_number() OVER (PARTITION BY c.c_nationkey
                                ORDER BY s.spend DESC, s.ck) AS rn
      FROM s JOIN customer c ON s.ck = c.c_custkey),
top AS (SELECT nationkey, CAST(rn AS BIGINT) AS rnk, CAST(ck AS BIGINT)
          AS custkey, spend AS spend_cents, CAST(1 AS BIGINT) AS n_customers
        FROM r WHERE rn <= 3),
oth AS (SELECT nationkey, CAST(0 AS BIGINT) AS rnk, CAST(-1 AS BIGINT)
          AS custkey, CAST(SUM(spend) AS BIGINT) AS spend_cents,
          CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM r WHERE rn > 3 GROUP BY 1)
SELECT CAST(nationkey AS BIGINT) AS nationkey, rnk, custkey, spend_cents,
       n_customers
FROM (SELECT * FROM top UNION ALL SELECT * FROM oth)
ORDER BY 1, 2
"""


def events_user_value_jitter(sf_dir: str):
    """Per-user value JITTER: the discrete median of |Δcents| between
    consecutive events in time order (median absolute successive
    difference — the robust volatility of a user's spend stream, immune
    to level and to a single spike).  Exact integers; the usual
    co-partition + per-group sort shape."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_steps": pa.array([], pa.int64()),
            "masd_cents": pa.array([], pa.int64()),
        }
    )

    def jitter(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        if len(c) < 2:
            return _empty
        d = np.sort(np.abs(np.diff(c)))
        n = len(d)
        return pa.table(
            {
                "user_id": pa.array([int(s["user_id"][0].as_py())], pa.int64()),
                "n_steps": pa.array([n], pa.int64()),
                "masd_cents": pa.array([int(d[(n + 1) // 2 - 1])], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(jitter, batch_format="pyarrow")
        .sort(["user_id"])
    )


EVENTS_USER_VALUE_JITTER_SQL = """
WITH v AS (SELECT user_id,
                  abs(CAST(FLOOR(value*100 + 0.5) AS BIGINT)
                      - lag(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
                          OVER (PARTITION BY user_id ORDER BY ts, event_id))
                    AS ad
           FROM events)
SELECT user_id, CAST(COUNT(ad) AS BIGINT) AS n_steps,
       CAST(quantile_disc(ad, 0.5) AS BIGINT) AS masd_cents
FROM v WHERE ad IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def orders_quartiles_cont_x4(sf_dir: str):
    """CONTINUOUS (type-7 / quantile_cont) quartiles kept EXACT: at
    q ∈ {¼,½,¾} the interpolation fraction is a quarter, so 4× the
    interpolated value is the integer c[i]·(4−f) + c[i+1]·f with
    h4 = (n−1)·4q, i = h4÷4, f = h4 mod 4 — the linear-interpolation
    convention with zero float arithmetic (disc quantiles elsewhere pick;
    this op interpolates).  Per-priority group kernels sort once."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"p": t["o_orderpriority"], "c": _cents(t["o_totalprice"])}
        )

    def quart(g: pa.Table) -> pa.Table:
        c = np.sort(g["c"].combine_chunks().to_numpy(zero_copy_only=False))
        n = len(c)

        def x4(qn: int) -> int:  # qn = 4q ∈ {1,2,3}
            h4 = (n - 1) * qn
            i, f = h4 // 4, h4 % 4
            j = i + 1 if f else i
            return int(c[i]) * (4 - f) + int(c[j]) * f

        return pa.table(
            {
                "o_orderpriority": pa.array([str(g["p"][0].as_py())], pa.string()),
                "n": pa.array([n], pa.int64()),
                "q1_x4": pa.array([x4(1)], pa.int64()),
                "med_x4": pa.array([x4(2)], pa.int64()),
                "q3_x4": pa.array([x4(3)], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("p")
        .map_groups(quart, batch_format="pyarrow")
        .sort(["o_orderpriority"])
    )


ORDERS_QUARTILES_CONT_X4_SQL = """
WITH v AS (SELECT o_orderpriority AS p,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c
           FROM orders),
a AS (SELECT p, list(c ORDER BY c) AS arr, CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY 1)
SELECT p AS o_orderpriority, n,
       CAST(arr[(n-1)*1//4 + 1] * (4 - (n-1)*1%4)
            + arr[CASE WHEN (n-1)*1%4 = 0 THEN (n-1)*1//4 ELSE (n-1)*1//4 + 1 END + 1]
              * ((n-1)*1%4) AS BIGINT) AS q1_x4,
       CAST(arr[(n-1)*2//4 + 1] * (4 - (n-1)*2%4)
            + arr[CASE WHEN (n-1)*2%4 = 0 THEN (n-1)*2//4 ELSE (n-1)*2//4 + 1 END + 1]
              * ((n-1)*2%4) AS BIGINT) AS med_x4,
       CAST(arr[(n-1)*3//4 + 1] * (4 - (n-1)*3%4)
            + arr[CASE WHEN (n-1)*3%4 = 0 THEN (n-1)*3//4 ELSE (n-1)*3//4 + 1 END + 1]
              * ((n-1)*3%4) AS BIGINT) AS q3_x4
FROM a ORDER BY 1
"""


def orders_monthly_iqr_outliers(sf_dir: str):
    """Time-bucketed robust quality monitor: per month, the Tukey-fence
    outlier count against THAT month's own quartiles (disc) — level shifts
    across months don't pollute the fence the way one global fence would.
    Fence kept integral: outlier ⇔ 2·c > 2·Q3 + 3·(Q3−Q1).  Months
    co-partition; each kernel is one sort + two picks + one vectorized
    compare."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "c": _cents(t["o_totalprice"]),
            }
        )

    def fence(g: pa.Table) -> pa.Table:
        c = g["c"].combine_chunks().to_numpy(zero_copy_only=False)
        s = np.sort(c)
        n = len(s)
        q1 = int(s[(n + 3) // 4 - 1])
        q3 = int(s[(3 * n + 3) // 4 - 1])
        n_out = int((2 * c > 2 * q3 + 3 * (q3 - q1)).sum())
        return pa.table(
            {
                "month": pa.array([str(g["month"][0].as_py())], pa.string()),
                "n": pa.array([n], pa.int64()),
                "q1_cents": pa.array([q1], pa.int64()),
                "q3_cents": pa.array([q3], pa.int64()),
                "n_outliers": pa.array([n_out], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .map_groups(fence, batch_format="pyarrow")
        .sort(["month"])
    )


ORDERS_MONTHLY_IQR_OUTLIERS_SQL = """
WITH v AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c
           FROM orders),
q AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(quantile_disc(c, 0.25) AS BIGINT) AS q1_cents,
             CAST(quantile_disc(c, 0.75) AS BIGINT) AS q3_cents
      FROM v GROUP BY 1)
SELECT q.month, q.n, q.q1_cents, q.q3_cents,
       CAST(COALESCE(SUM(CASE WHEN 2*v.c > 2*q.q3_cents
                                    + 3*(q.q3_cents - q.q1_cents)
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers
FROM q JOIN v ON q.month = v.month
GROUP BY 1, 2, 3, 4 ORDER BY 1
"""


def docs_f2_selfjoin_size(sf_dir: str):
    """Second frequency moment F2 = Σ_term tf² — the classic AMS statistic
    and the EXACT size of a term-equality self-join (the number a query
    planner needs before daring that join).  Block term-count partials →
    O(vocab) groupby; Σtf² folds as one-row partials with the (hi, lo)
    int64-wrap-proof split."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def term_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        )
        toks = pc.drop_null(toks)
        toks = toks.filter(pc.not_equal(toks, ""))
        return (
            pa.Table.from_arrays([toks], names=["term"])
            .group_by("term")
            .aggregate([("term", "count")])
            .rename_columns(["term", "n"])
        )

    tf = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )

    def fold(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        q = sum(int(v) * int(v) for v in n)
        return pa.table(
            {
                "vocab": pa.array([len(n)], pa.int64()),
                "total": pa.array([int(n.sum())], pa.int64()),
                "f2_hi": pa.array([q >> 32], pa.int64()),
                "f2_lo": pa.array([q & 0xFFFFFFFF], pa.int64()),
            }
        )

    agg = tf.map_batches(fold, batch_format="pyarrow").to_pandas()
    f2 = sum((int(h) << 32) + int(l) for h, l in zip(agg["f2_hi"], agg["f2_lo"]))
    return pa.table(
        {
            "vocab": pa.array([int(agg["vocab"].sum())], pa.int64()),
            "total_tokens": pa.array([int(agg["total"].sum())], pa.int64()),
            "f2_selfjoin_rows": pa.array([f2], pa.int64()),
        }
    )


DOCS_F2_SELFJOIN_SIZE_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks
      WHERE term <> '' GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(CAST(n AS HUGEINT) * n) AS BIGINT) AS f2_selfjoin_rows
FROM c
"""


def embeddings_triplet_violations(sf_dir: str):
    """Metric-learning health check — triplet violations with deterministic
    mining: anchor a pairs with the NEXT same-label vector (by vec_id) as
    positive and the FIRST vector of the next label value as negative;
    violation ⇔ d²(a,p) ≥ d²(a,n).  Distances are exact int64 sums over
    µ-quantized coordinates (FLOOR(x·10⁶ + 0.5)), so both engines agree to
    the last bit.  Mining needs a global per-label vec_id order, so this
    folds the O(n·d) µ-matrix on the driver (the IVF-centroid bound); the
    at-scale swap-in is a label co-partitioned map_groups with the label→
    first-vector map broadcast."""
    ds = rd.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )
    df = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    emb = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(emb * 1_000_000 + 0.5).astype(np.int64)
    vid = df["vec_id"].to_numpy(dtype=np.int64)
    lab = df["label"].to_numpy(dtype=np.int64)
    labels = np.unique(lab)
    nxt = {l: labels[(i + 1) % len(labels)] for i, l in enumerate(labels)}
    first_of = {l: int(np.flatnonzero(lab == l)[0]) for l in labels}
    n_anchors = n_viol = 0
    margin_sum = 0
    for l in labels:
        idx = np.flatnonzero(lab == l)
        if len(idx) < 2:
            continue
        a, p = idx[:-1], idx[1:]
        nidx = first_of[nxt[l]]
        d2p = ((q[a] - q[p]) ** 2).sum(axis=1)
        d2n = ((q[a] - q[nidx]) ** 2).sum(axis=1)
        n_anchors += len(a)
        n_viol += int((d2p >= d2n).sum())
        margin_sum += int((d2n - d2p).sum())
    return pa.table(
        {
            "n_anchors": pa.array([n_anchors], pa.int64()),
            "n_violations": pa.array([n_viol], pa.int64()),
            "margin_sum_mu2": pa.array([margin_sum], pa.int64()),
        }
    )


EMBEDDINGS_TRIPLET_VIOLATIONS_SQL = """
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS v
  FROM embeddings),
lab AS (SELECT DISTINCT label FROM q),
nxt AS (SELECT label,
               COALESCE(lead(label) OVER (ORDER BY label),
                        first_value(label) OVER (ORDER BY label)) AS next_label
        FROM lab),
firsts AS (SELECT label, arg_min(v, vec_id) AS v0 FROM q GROUP BY 1),
pairs AS (SELECT q.vec_id, q.label, q.v,
                 lead(q.v) OVER (PARTITION BY q.label ORDER BY q.vec_id) AS vp
          FROM q),
trip AS (SELECT row_number() OVER (ORDER BY p.vec_id) AS tid, p.v, p.vp, f.v0
         FROM pairs p JOIN nxt ON p.label = nxt.label
                      JOIN firsts f ON nxt.next_label = f.label
         WHERE p.vp IS NOT NULL),
el AS (SELECT tid, unnest(v) AS a, unnest(vp) AS b, unnest(v0) AS c
       FROM trip),
d AS (SELECT tid, SUM((a - b) * (a - b)) AS d2p,
             SUM((a - c) * (a - c)) AS d2n
      FROM el GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
       CAST(SUM(CASE WHEN d2p >= d2n THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(SUM(d2n - d2p) AS BIGINT) AS margin_sum_mu2
FROM d
"""


def nation_cross_quartile_matrix(sf_dir: str):
    """Relative-distribution matrix: for every ordered nation pair (a, b),
    how many of a's order prices land strictly above b's own Q3 (disc) —
    the "would rank top-quartile over there" cross-placement readout that
    single-nation quantiles can't give.  Two-phase: per-nation Q3 via
    co-partitioned kernels → the O(nations) threshold vector broadcasts →
    block partials count (nation × threshold) hits → one tiny groupby.
    Exact integers throughout."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    j = orders.join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"nat": t["c_nationkey"], "c": _cents(t["o_totalprice"])}
        )

    priced = j.map_batches(prep, batch_format="pyarrow").materialize()

    def q3(g: pa.Table) -> pa.Table:
        c = np.sort(g["c"].combine_chunks().to_numpy(zero_copy_only=False))
        n = len(c)
        return pa.table(
            {
                "nat": pa.array([int(g["nat"][0].as_py())], pa.int64()),
                "q3": pa.array([int(c[(3 * n + 3) // 4 - 1])], pa.int64()),
            }
        )

    thr = priced.groupby("nat").map_groups(q3, batch_format="pyarrow").to_pandas()
    t_nat = thr["nat"].to_numpy(dtype=np.int64)
    t_q3 = thr["q3"].to_numpy(dtype=np.int64)
    order = np.argsort(t_nat)
    t_nat, t_q3 = t_nat[order], t_q3[order]
    thr_ref = ray.put((t_nat, t_q3))

    def census(t: pa.Table) -> pa.Table:
        nats, q3s = ray.get(thr_ref)
        nat = t["nat"].combine_chunks().to_numpy(zero_copy_only=False)
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        above = c[:, None] > q3s[None, :]  # rows × thresholds
        out_a, out_b, out_n = [], [], []
        for i, a in enumerate(nats):
            m = nat == a
            if not m.any():
                continue
            cnt = above[m].sum(axis=0)
            for jx, b in enumerate(nats):
                if a != b:
                    out_a.append(int(a))
                    out_b.append(int(b))
                    out_n.append(int(cnt[jx]))
        return pa.table(
            {
                "nat_a": pa.array(out_a, pa.int64()),
                "nat_b": pa.array(out_b, pa.int64()),
                "n_above": pa.array(out_n, pa.int64()),
            }
        )

    return (
        priced.map_batches(census, batch_format="pyarrow")
        .groupby(["nat_a", "nat_b"])
        .aggregate(Sum("n_above", alias_name="n_above"))
        .sort(["nat_a", "nat_b"])
    )


NATION_CROSS_QUARTILE_MATRIX_SQL = """
WITH v AS (SELECT c.c_nationkey AS nat,
                  CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT) AS c
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
q AS (SELECT nat, CAST(quantile_disc(c, 0.75) AS BIGINT) AS q3
      FROM v GROUP BY 1)
SELECT CAST(a.nat AS BIGINT) AS nat_a, CAST(b.nat AS BIGINT) AS nat_b,
       CAST(SUM(CASE WHEN v.c > b.q3 THEN 1 ELSE 0 END) AS BIGINT) AS n_above
FROM v JOIN q a ON v.nat = a.nat JOIN q b ON a.nat <> b.nat
GROUP BY 1, 2 ORDER BY 1, 2
"""


def customer_reorder_hazard(sf_dir: str):
    """Discrete-time HAZARD curve of reordering (the Kaplan–Meier
    complement): consecutive order gaps per customer bucket into
    {0–7, 8–30, 31–90, 91+} days; hazard(b) = gaps ending in b over gaps
    surviving INTO b, as exact floor-divided ppm — "given you've waited
    this long, how likely is the next order now".  Per-customer gap
    kernels; the 4-bucket life table folds from one-row partials."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    edges = np.array([8, 31, 91], dtype=np.int64)  # bucket starts after 0

    def gaps(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("o_orderdate", "ascending"), ("o_orderkey", "ascending")],
            )
        )
        day = (
            s["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        if len(day) < 2:
            return pa.table({"b": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        d = np.diff(day)
        b = np.searchsorted(edges, d, side="right")  # 0..3
        vals, counts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "b": pa.array(vals, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.groupby("o_custkey")
        .map_groups(gaps, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n_b = np.zeros(4, dtype=np.int64)
    for b, n in hist.itertuples(index=False):
        n_b[int(b)] = n
    total = int(n_b.sum())
    at_risk = total - np.r_[0, np.cumsum(n_b)[:-1]]
    labels = ["0-7", "8-30", "31-90", "91+"]
    keep = at_risk > 0
    return pa.table(
        {
            "bucket": pa.array([labels[i] for i in range(4) if keep[i]], pa.string()),
            "n_events": pa.array([int(n_b[i]) for i in range(4) if keep[i]], pa.int64()),
            "n_at_risk": pa.array([int(at_risk[i]) for i in range(4) if keep[i]], pa.int64()),
            "hazard_ppm": pa.array(
                [int(n_b[i]) * 1_000_000 // int(at_risk[i]) for i in range(4) if keep[i]],
                pa.int64(),
            ),
        }
    )


CUSTOMER_REORDER_HAZARD_SQL = """
WITH g AS (SELECT o_custkey,
                  epoch_us(o_orderdate) // 86400000000
                    - lag(epoch_us(o_orderdate) // 86400000000)
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS gap
           FROM orders),
b AS (SELECT CASE WHEN gap < 8 THEN 0 WHEN gap < 31 THEN 1
                  WHEN gap < 91 THEN 2 ELSE 3 END AS b
      FROM g WHERE gap IS NOT NULL),
h AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
lt AS (SELECT b, n,
              CAST(SUM(n) OVER (ORDER BY b DESC) AS BIGINT) AS at_risk
       FROM h)
SELECT CASE b WHEN 0 THEN '0-7' WHEN 1 THEN '8-30' WHEN 2 THEN '31-90'
              ELSE '91+' END AS bucket,
       n AS n_events, at_risk AS n_at_risk,
       CAST(n * 1000000 // at_risk AS BIGINT) AS hazard_ppm
FROM lt ORDER BY b
"""


def events_type_run_histogram(sf_dir: str):
    """Pooled run-length distribution: within each user's time-ordered
    stream, consecutive same-type runs RLE-compress; the corpus histogram
    (type, run length → count) is the repetition texture of the event
    stream — the input to "is autoplay looping" style diagnostics.  Exact
    integers; per-user kernels emit partial histograms so only O(types ×
    lengths) rows shuffle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def rle(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        types = s["event_type"].to_pandas().to_numpy()
        n = len(types)
        change = np.r_[True, types[1:] != types[:-1]]
        starts = np.flatnonzero(change)
        lens = np.diff(np.r_[starts, n])
        tb = pa.table(
            {
                "event_type": pa.array(types[starts], pa.string()),
                "run_len": pa.array(lens.astype(np.int64), pa.int64()),
            }
        )
        return (
            tb.group_by(["event_type", "run_len"])
            .aggregate([("run_len", "count")])
            .rename_columns(["event_type", "run_len", "n"])
        )

    return (
        ds.groupby("user_id")
        .map_groups(rle, batch_format="pyarrow")
        .groupby(["event_type", "run_len"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["event_type", "run_len"])
    )


EVENTS_TYPE_RUN_HISTOGRAM_SQL = """
WITH v AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rt
           FROM events),
runs AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS run_len
         FROM v GROUP BY user_id, event_type, rn - rt)
SELECT event_type, run_len, CAST(COUNT(*) AS BIGINT) AS n
FROM runs GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_char_bigram_top20(sf_dir: str):
    """Character-bigram frequency census — the statistic a BPE/WordPiece
    initializer reads first: the 20 most frequent adjacent character pairs
    across the corpus (count desc, bigram asc — deterministic boundary).
    Per-block byte-level counting with a separator guard (documents never
    concatenate across the join byte); only observed (bigram, count) pairs
    shuffle."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def bigrams(t: pa.Table) -> pa.Table:
        txts = [x for x in t["text"].to_pylist() if x]
        if not txts:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        joined = "\x00".join(s.lower() for s in txts)
        b = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
        pair = b[:-1].astype(np.uint32) * 256 + b[1:]
        # drop pairs touching the separator or any non-ASCII byte
        ok = (b[:-1] != 0) & (b[1:] != 0) & (b[:-1] < 128) & (b[1:] < 128)
        vals, counts = np.unique(pair[ok], return_counts=True)
        return pa.table(
            {
                "bigram": pa.array(
                    [chr(v >> 8) + chr(v & 0xFF) for v in vals], pa.string()
                ),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(bigrams, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(20)
    )


DOCS_CHAR_BIGRAM_TOP20_SQL = """
WITH d AS (SELECT lower(text) AS txt FROM documents WHERE text <> ''),
p AS (SELECT txt, unnest(range(1, length(txt))) AS i FROM d),
bg AS (SELECT substring(txt, CAST(i AS INTEGER), 2) AS bigram FROM p)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM bg GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20
"""


def customer_nrr_by_year(sf_dir: str):
    """Net revenue retention by cohort year — for each base year, the
    revenue its ACTIVE customers generate the FOLLOWING year over their
    base-year revenue, as exact floor-divided ppm (the SaaS NRR metric on
    order data; >1e6 means expansion beat churn).  (customer, year)
    revenue reduces distributed; the year-pair join fans out ≤ years² per
    customer; the final fold is O(years)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(t["o_orderdate"]), pa.int64())
        tb = pa.table({"ck": t["o_custkey"], "yr": yr, "rev": _cents(t["o_totalprice"])})
        return tb.group_by(["ck", "yr"]).aggregate([("rev", "sum")]).rename_columns(
            ["ck", "yr", "rev"]
        )

    cy = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["ck", "yr"])
        .aggregate(Sum("rev", alias_name="rev"))
    )
    base = (
        cy.groupby("yr").aggregate(Sum("rev", alias_name="base_rev")).to_pandas()
    )
    nxt = cy.map_batches(
        lambda t: t.rename_columns(["ck2", "yr2", "rev2"]), batch_format="pyarrow"
    )
    j = cy.join(
        nxt, join_type="inner", num_partitions=8, on=("ck",), right_on=("ck2",)
    )

    def retained_partial(t: pa.Table) -> pa.Table:
        m = pc.equal(t["yr2"], pc.add(t["yr"], 1))
        sub = t.filter(m)
        return (
            pa.table({"yr": sub["yr"], "ret": sub["rev2"]})
            .group_by("yr")
            .aggregate([("ret", "sum")])
            .rename_columns(["yr", "ret"])
        )

    ret = (
        j.map_batches(retained_partial, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(Sum("ret", alias_name="ret"))
        .to_pandas()
    )
    ret_map = dict(zip(ret["yr"].astype(int), ret["ret"].astype(int)))
    base = base.sort_values("yr")
    years = base["yr"].astype(int).tolist()
    rows = [
        (y, int(b), int(ret_map.get(y, 0)), int(ret_map.get(y, 0)) * 1_000_000 // int(b))
        for y, b in zip(years, base["base_rev"].astype(int))
        if y < max(years)
    ]
    return pa.table(
        {
            "base_year": pa.array([r[0] for r in rows], pa.int64()),
            "base_rev_cents": pa.array([r[1] for r in rows], pa.int64()),
            "retained_rev_cents": pa.array([r[2] for r in rows], pa.int64()),
            "nrr_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


CUSTOMER_NRR_BY_YEAR_SQL = """
WITH r AS (SELECT o_custkey AS ck,
                  CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1, 2),
base AS (SELECT yr, CAST(SUM(rev) AS BIGINT) AS base_rev_cents
         FROM r GROUP BY 1),
ret AS (SELECT a.yr, CAST(SUM(b.rev) AS BIGINT) AS retained_rev_cents
        FROM r a JOIN r b ON a.ck = b.ck AND b.yr = a.yr + 1
        GROUP BY 1)
SELECT base.yr AS base_year, base.base_rev_cents,
       CAST(COALESCE(ret.retained_rev_cents, 0) AS BIGINT)
         AS retained_rev_cents,
       CAST(COALESCE(ret.retained_rev_cents, 0) * 1000000
            // base.base_rev_cents AS BIGINT) AS nrr_ppm
FROM base LEFT JOIN ret ON base.yr = ret.yr
WHERE base.yr < (SELECT MAX(yr) FROM r)
ORDER BY 1
"""


def orders_monthly_gini(sf_dir: str):
    """Inequality as a TIME SERIES: the Gini coefficient of order prices
    within each month, via the exact sorted-rank identity
    G = Σ(2i−n−1)·xᵢ / (n·Σx) (tie-order invariant), numerator and
    denominator folded in Python bignums inside the kernel so no int64
    width assumption, shipped as floor-divided ppm.  Months co-partition;
    each kernel is one sort + one weighted sum."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "c": _cents(t["o_totalprice"]),
            }
        )

    def gini(g: pa.Table) -> pa.Table:
        c = np.sort(g["c"].combine_chunks().to_numpy(zero_copy_only=False))
        n = len(c)
        i = np.arange(1, n + 1, dtype=np.int64)
        num = sum(int(w) * int(x) for w, x in zip(2 * i - n - 1, c))
        den = n * sum(int(x) for x in c)
        return pa.table(
            {
                "month": pa.array([str(g["month"][0].as_py())], pa.string()),
                "n": pa.array([n], pa.int64()),
                "gini_ppm": pa.array([num * 1_000_000 // den], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .map_groups(gini, batch_format="pyarrow")
        .sort(["month"])
    )


ORDERS_MONTHLY_GINI_SQL = """
WITH v AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c
           FROM orders),
r AS (SELECT month, c,
             row_number() OVER (PARTITION BY month ORDER BY c) AS i,
             COUNT(*) OVER (PARTITION BY month) AS n
      FROM v)
SELECT month, CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM((2*i - n - 1) * CAST(c AS HUGEINT)) * 1000000
            // (CAST(MAX(n) AS HUGEINT) * SUM(CAST(c AS HUGEINT)))
            AS BIGINT) AS gini_ppm
FROM r GROUP BY 1 ORDER BY 1
"""


def docs_zipf_length_law(sf_dir: str):
    """Zipf's law of ABBREVIATION readout: terms ranked by corpus frequency
    (count desc, term asc), banded by rank (1–8, 9–16, 17–24, 25+); per
    band the term count, total occurrences and the frequency-weighted
    character length Σ tf·len — frequent words should be measurably
    shorter.  Exact integers; the rank sweep folds over the O(vocab)
    aggregate (the TF-IDF driver-merge bound)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def term_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        )
        toks = pc.drop_null(toks)
        toks = toks.filter(pc.not_equal(toks, ""))
        return (
            pa.Table.from_arrays([toks], names=["term"])
            .group_by("term")
            .aggregate([("term", "count")])
            .rename_columns(["term", "n"])
        )

    tf = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    terms = tf["term"].to_numpy()
    n = tf["n"].to_numpy(dtype=np.int64)
    order = np.lexsort((terms, -n))
    terms, n = terms[order], n[order]
    lens = np.array([len(t) for t in terms], dtype=np.int64)
    rank = np.arange(1, len(terms) + 1)
    band = np.minimum((rank - 1) // 8, 3)
    rows = []
    for b in range(4):
        m = band == b
        if not m.any():
            continue
        rows.append(
            (
                ["1-8", "9-16", "17-24", "25+"][b],
                int(m.sum()),
                int(n[m].sum()),
                int(lens[m].sum()),
                int((n[m] * lens[m]).sum()),
            )
        )
    return pa.table(
        {
            "rank_band": pa.array([r[0] for r in rows], pa.string()),
            "n_terms": pa.array([r[1] for r in rows], pa.int64()),
            "total_tf": pa.array([r[2] for r in rows], pa.int64()),
            "sum_len": pa.array([r[3] for r in rows], pa.int64()),
            "weighted_len": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


DOCS_ZIPF_LENGTH_LAW_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks
      WHERE term <> '' GROUP BY 1),
r AS (SELECT term, n, row_number() OVER (ORDER BY n DESC, term) AS rnk
      FROM c),
b AS (SELECT CASE WHEN rnk <= 8 THEN '1-8' WHEN rnk <= 16 THEN '9-16'
                  WHEN rnk <= 24 THEN '17-24' ELSE '25+' END AS rank_band,
             n, CAST(length(term) AS BIGINT) AS l
      FROM r)
SELECT rank_band, CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(n) AS BIGINT) AS total_tf,
       CAST(SUM(l) AS BIGINT) AS sum_len,
       CAST(SUM(n * l) AS BIGINT) AS weighted_len
FROM b GROUP BY 1
"""


def docs_source_shingle_containment(sf_dir: str):
    """Source-to-source 5-gram shingle CONTAINMENT matrix — the asymmetric
    companion to Jaccard ("how much of A's phrasing appears inside B"):
    per ordered source pair, |shingles(A) ∩ shingles(B)| over |shingles(A)|
    as exact floor-divided ppm.  Shingles build vectorized (token shifts
    masked to same-doc positions), dedup block-locally to (source,
    shingle) pairs, and the intersection is an 8-partition self-join on
    shingle — set algebra at source granularity, text never re-scans."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def shingles(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(t["text"])), pattern=r"[^a-z0-9]+"
        )
        flat = np.array(
            [x if x else "" for x in pc.list_flatten(toks).to_pylist()], dtype=object
        )
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        src = np.array(t["source"].to_pylist(), dtype=object)
        if len(flat) < 5:
            return pa.table(
                {"source": pa.array([], pa.string()), "sh": pa.array([], pa.string())}
            )
        ok = np.ones(len(flat) - 4, dtype=bool)
        for k in range(1, 5):
            ok &= parent[k : len(flat) - 4 + k] == parent[: len(flat) - 4]
        ok &= np.array([bool(w) for w in flat[: len(flat) - 4]])
        ok &= np.array([bool(w) for w in flat[4:]])
        idx = np.flatnonzero(ok)
        sh = np.array(
            [" ".join(flat[i : i + 5]) for i in idx], dtype=object
        )
        tb = pa.table(
            {
                "source": pa.array(src[parent[idx]], pa.string()),
                "sh": pa.array(sh, pa.string()),
            }
        )
        return tb.group_by(["source", "sh"]).aggregate([])

    pairs = (
        ds.map_batches(shingles, batch_format="pyarrow")
        .groupby(["source", "sh"])
        .aggregate(Count(alias_name="_c"))
    )
    sizes = pairs.groupby("source").aggregate(Count(alias_name="n_sh")).to_pandas()
    size_map = dict(zip(sizes["source"], sizes["n_sh"].astype(int)))
    other = pairs.map_batches(
        lambda t: t.select(["source", "sh"]).rename_columns(["source_b", "sh2"]),
        batch_format="pyarrow",
    )
    j = pairs.join(
        other, join_type="inner", num_partitions=8, on=("sh",), right_on=("sh2",)
    )

    def census(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.not_equal(t["source"], t["source_b"]))
        return (
            pa.table({"src_a": sub["source"], "src_b": sub["source_b"]})
            .group_by(["src_a", "src_b"])
            .aggregate([("src_a", "count")])
            .rename_columns(["src_a", "src_b", "inter"])
        )

    mat = (
        j.map_batches(census, batch_format="pyarrow")
        .groupby(["src_a", "src_b"])
        .aggregate(Sum("inter", alias_name="inter"))
        .to_pandas()
    )
    mat = mat.sort_values(["src_a", "src_b"]).reset_index(drop=True)
    cont = [
        int(i) * 1_000_000 // size_map[a]
        for a, i in zip(mat["src_a"], mat["inter"].astype(int))
    ]
    return pa.table(
        {
            "src_a": pa.array(mat["src_a"], pa.string()),
            "src_b": pa.array(mat["src_b"], pa.string()),
            "inter": pa.array(mat["inter"].astype(np.int64), pa.int64()),
            "containment_ppm": pa.array(cont, pa.int64()),
        }
    )


DOCS_SOURCE_SHINGLE_CONTAINMENT_SQL = """
WITH d AS (SELECT source, string_split_regex(lower(trim(text)), '[^a-z0-9]+')
             AS w
           FROM documents WHERE trim(text) <> ''),
pos AS (SELECT source, w, unnest(range(1, len(w) - 3)) AS i
        FROM d WHERE len(w) >= 5),
sh AS (SELECT DISTINCT source,
              w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                   || ' ' || w[i+4] AS sh
       FROM pos WHERE w[i] <> '' AND w[i+4] <> ''),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
inter AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(COUNT(*) AS BIGINT) AS inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.source <> b.source
          GROUP BY 1, 2)
SELECT i.src_a, i.src_b, i.inter,
       CAST(i.inter * 1000000 // s.n_sh AS BIGINT) AS containment_ppm
FROM inter i JOIN sizes s ON i.src_a = s.source
ORDER BY 1, 2
"""


def events_haar_energy(sf_dir: str):
    """Multiresolution (Haar wavelet) energy spectrum of the event stream —
    all INTEGER: hourly counts over a 512-hour window anchored at the first
    event, unnormalized Haar details at level k = (sum of first half) −
    (sum of second half) per 2^k block, energy_k = Σ d² — which timescale
    carries the traffic variance, with zero floats anywhere.  Hourly
    counts reduce distributed; the 512-bucket spectrum folds on the
    driver (bounded by the window, not the data)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        hr = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000
        vals, counts = np.unique(hr, return_counts=True)
        return pa.table(
            {
                "hr": pa.array(vals, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hr")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    hr = hourly["hr"].to_numpy(dtype=np.int64)
    n = hourly["n"].to_numpy(dtype=np.int64)
    base = int(hr.min())
    off = hr - base
    keep = off < 512
    sig = np.zeros(512, dtype=np.int64)
    sig[off[keep]] = n[keep]
    levels, blocks, energies = [], [], []
    for k in range(1, 10):
        b = 1 << k
        half = sig.reshape(-1, b)
        d = half[:, : b // 2].sum(axis=1) - half[:, b // 2 :].sum(axis=1)
        levels.append(k)
        blocks.append(512 // b)
        energies.append(int((d * d).sum()))
    return pa.table(
        {
            "level": pa.array(levels, pa.int64()),
            "n_blocks": pa.array(blocks, pa.int64()),
            "energy": pa.array(energies, pa.int64()),
        }
    )


EVENTS_HAAR_ENERGY_SQL = """
WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr, CAST(COUNT(*) AS BIGINT)
             AS n
           FROM events GROUP BY 1),
b AS (SELECT hr - (SELECT MIN(hr) FROM h) AS off, n FROM h
      WHERE hr - (SELECT MIN(hr) FROM h) < 512),
lv AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS level),
d AS (SELECT lv.level, b.off // (1 << lv.level) AS blk,
             CAST(SUM(CASE WHEN (b.off // (1 << (lv.level - 1))) % 2 = 0
                           THEN b.n ELSE -b.n END) AS BIGINT) AS det
      FROM lv, b GROUP BY 1, 2)
SELECT CAST(level AS BIGINT) AS level,
       CAST(512 // (1 << level) AS BIGINT) AS n_blocks,
       CAST(SUM(det * det) AS BIGINT) AS energy
FROM d GROUP BY level ORDER BY 1
"""


def orders_qn_scale_estimator(sf_dir: str):
    """Rousseeuw–Croux Qn robust scale of daily revenue — the k-th smallest
    of all pairwise absolute differences (k = C(h,2), h = n÷2 + 1): 50 %
    breakdown like the MAD but ~82 % efficient and location-free.  A pure
    SELECTION over exact integer cents, so both engines agree bit-for-bit.
    O(days²) over the bounded daily table (the O(n log n) Croux–Rousseeuw
    band algorithm is the swap-in past ~10⁵ points)."""
    day, rev = _daily_order_revenue(sf_dir)
    n = len(rev)
    iu = np.triu_indices(n, 1)
    diffs = np.abs(rev[iu[0]] - rev[iu[1]])
    h = n // 2 + 1
    k = h * (h - 1) // 2
    qn = int(np.partition(diffs, k - 1)[k - 1])
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "qn_cents": pa.array([qn], pa.int64()),
        }
    )


ORDERS_QN_SCALE_ESTIMATOR_SQL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day_,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
k AS (SELECT n, (n // 2 + 1) * (n // 2) // 2 AS k FROM n),
p AS (SELECT abs(a.rev - b.rev) AS ad
      FROM d a JOIN d b ON a.day_ < b.day_)
SELECT (SELECT n FROM k) AS n_days, (SELECT k FROM k) AS k,
       CAST((SELECT ad FROM p ORDER BY ad
             LIMIT 1 OFFSET (SELECT k FROM k) - 1) AS BIGINT) AS qn_cents
"""


def orders_monthly_inversions(sf_dir: str):
    """Intra-month price DISORDER: per month, the inversion count of the
    price sequence in (date, orderkey) order — 0 means prices only rose
    through the month, max n(n−1)/2 means they only fell; the Kendall-
    distance-to-sorted readout.  Exact integers; months co-partition and
    the kernel is vectorized (a merge-sort inversion counter is the
    swap-in past ~10⁴ orders/month)."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "ok": t["o_orderkey"],
                "day": pa.array(
                    t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                    // 86_400_000_000,
                    pa.int64(),
                ),
                "c": _cents(t["o_totalprice"]),
            }
        )

    def inv(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("day", "ascending"), ("ok", "ascending")]
            )
        )
        c = s["c"].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(c)
        iu = np.triu_indices(n, 1)
        inversions = int((c[iu[0]] > c[iu[1]]).sum())
        return pa.table(
            {
                "month": pa.array([str(s["month"][0].as_py())], pa.string()),
                "n": pa.array([n], pa.int64()),
                "n_pairs": pa.array([n * (n - 1) // 2], pa.int64()),
                "inversions": pa.array([inversions], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .map_groups(inv, batch_format="pyarrow")
        .sort(["month"])
    )


ORDERS_MONTHLY_INVERSIONS_SQL = """
WITH v AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c,
                  row_number() OVER (PARTITION BY strftime(o_orderdate, '%Y-%m')
                                     ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders),
i AS (SELECT a.month, CAST(COUNT(*) AS BIGINT) AS inversions
      FROM v a JOIN v b ON a.month = b.month AND a.rn < b.rn AND a.c > b.c
      GROUP BY 1),
n AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1)
SELECT n.month, n.n, CAST(n.n * (n.n - 1) // 2 AS BIGINT) AS n_pairs,
       CAST(COALESCE(i.inversions, 0) AS BIGINT) AS inversions
FROM n LEFT JOIN i ON n.month = i.month ORDER BY 1
"""


def events_type_leadership_switches(sf_dir: str):
    """The "bar-chart race" statistic: cumulative per-type event counts
    evaluated at every observed day; count the days where the LEADER (max
    cumulative count, ties to the alphabetically first type) differs from
    the previous day's — plus who ends up on top.  Exact integers; daily
    (day, type) counts reduce distributed and the race replays over the
    bounded days×types grid."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = pa.array(
            t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000,
            pa.int64(),
        )
        return (
            pa.table({"day": day, "event_type": t["event_type"]})
            .group_by(["day", "event_type"])
            .aggregate([("day", "count")])
            .rename_columns(["day", "event_type", "n"])
        )

    dc = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    days = np.sort(dc["day"].unique())
    types = np.sort(dc["event_type"].unique())
    grid = np.zeros((len(days), len(types)), dtype=np.int64)
    di = {d: i for i, d in enumerate(days)}
    ti = {t: i for i, t in enumerate(types)}
    for d, t, n in dc.itertuples(index=False):
        grid[di[d], ti[t]] = n
    cum = grid.cumsum(axis=0)
    leaders = cum.argmax(axis=1)  # first (alphabetically smallest) on ties
    switches = int((leaders[1:] != leaders[:-1]).sum())
    return pa.table(
        {
            "n_days": pa.array([len(days)], pa.int64()),
            "n_switches": pa.array([switches], pa.int64()),
            "final_leader": pa.array([str(types[leaders[-1]])], pa.string()),
        }
    )


EVENTS_TYPE_LEADERSHIP_SWITCHES_SQL = """
WITH dc AS (SELECT epoch_us(ts) // 86400000000 AS day_, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
grid AS (SELECT d.day_, t.event_type, COALESCE(dc.n, 0) AS n
         FROM (SELECT DISTINCT day_ FROM dc) d
         CROSS JOIN (SELECT DISTINCT event_type FROM dc) t
         LEFT JOIN dc ON dc.day_ = d.day_ AND dc.event_type = t.event_type),
cum AS (SELECT day_, event_type,
               SUM(n) OVER (PARTITION BY event_type ORDER BY day_) AS c
        FROM grid),
lead_ AS (SELECT day_, event_type,
                 row_number() OVER (PARTITION BY day_
                                    ORDER BY c DESC, event_type) AS rn
          FROM cum),
l AS (SELECT day_, event_type AS leader FROM lead_ WHERE rn = 1),
s AS (SELECT leader,
             lag(leader) OVER (ORDER BY day_) AS prev,
             row_number() OVER (ORDER BY day_ DESC) AS rdesc
      FROM l)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM l) AS n_days,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND leader <> prev
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_switches,
       MAX(CASE WHEN rdesc = 1 THEN leader END) AS final_leader
FROM s
"""


def customer_brand_transition_matrix(sf_dir: str):
    """Sequential basket analysis: each order's DOMINANT brand (max summed
    quantity, ties to the alphabetically first brand), then per customer
    the consecutive-order brand transitions in (date, orderkey) order,
    pooled into the brand→brand switch matrix — the input to a loyalty /
    cannibalization model.  Exact integers (centi-quantities).  Shape:
    lineitem→part 8-partition join, per-order argmax kernel, orders join,
    per-customer sequence kernel; only (brand_a, brand_b) partials
    shuffle at the end."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey", "l_quantity"]
    )
    part = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    lp = li.join(
        part, join_type="inner", num_partitions=8, on=("l_partkey",), right_on=("p_partkey",)
    )

    def qty_partial(t: pa.Table) -> pa.Table:
        qc = pc.cast(
            pc.floor(pc.add(pc.multiply(pc.cast(t["l_quantity"], pa.float64()), 100.0), 0.5)),
            pa.int64(),
        )
        return (
            pa.table({"ok": t["l_orderkey"], "brand": t["p_brand"], "q": qc})
            .group_by(["ok", "brand"])
            .aggregate([("q", "sum")])
            .rename_columns(["ok", "brand", "q"])
        )

    ob = (
        lp.map_batches(qty_partial, batch_format="pyarrow")
        .groupby(["ok", "brand"])
        .aggregate(Sum("q", alias_name="q"))
    )

    def argmax_brand(g: pa.Table) -> pa.Table:
        q = g["q"].combine_chunks().to_numpy(zero_copy_only=False)
        brands = g["brand"].to_pandas().to_numpy()
        order = np.lexsort((brands, -q))
        return pa.table(
            {
                "ok": g["ok"].slice(0, 1),
                "brand": pa.array([str(brands[order[0]])], pa.string()),
            }
        )

    dom = ob.groupby("ok").map_groups(argmax_brand, batch_format="pyarrow")
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    j = dom.join(
        orders, join_type="inner", num_partitions=8, on=("ok",), right_on=("o_orderkey",)
    )

    def transitions(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("o_orderdate", "ascending"), ("ok", "ascending")]
            )
        )
        b = s["brand"].to_pandas().to_numpy()
        if len(b) < 2:
            return pa.table(
                {
                    "brand_a": pa.array([], pa.string()),
                    "brand_b": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        tb = pa.table(
            {
                "brand_a": pa.array(b[:-1], pa.string()),
                "brand_b": pa.array(b[1:], pa.string()),
            }
        )
        return (
            tb.group_by(["brand_a", "brand_b"])
            .aggregate([("brand_a", "count")])
            .rename_columns(["brand_a", "brand_b", "n"])
        )

    return (
        j.groupby("o_custkey")
        .map_groups(transitions, batch_format="pyarrow")
        .groupby(["brand_a", "brand_b"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["brand_a", "brand_b"])
    )


CUSTOMER_BRAND_TRANSITION_MATRIX_SQL = """
WITH oq AS (SELECT l_orderkey AS ok, p.p_brand AS brand,
                   CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS q
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2),
dom AS (SELECT ok, brand FROM (
          SELECT ok, brand,
                 row_number() OVER (PARTITION BY ok ORDER BY q DESC, brand)
                   AS rn
          FROM oq) WHERE rn = 1),
seq AS (SELECT o.o_custkey, d.brand,
               lead(d.brand) OVER (PARTITION BY o.o_custkey
                                   ORDER BY o.o_orderdate, d.ok) AS nxt
        FROM dom d JOIN orders o ON d.ok = o.o_orderkey)
SELECT brand AS brand_a, nxt AS brand_b, CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_trailing7_slope_pieces(sf_dir: str):
    """Rolling-regression TREND as exact integers: over each trailing
    7-observation window of daily revenue, the OLS slope numerator
    n·Σxy − Σx·Σy with observation index x' = 0..6 (so Σx' = 21 and the
    denominator is the constant 196 — omitted): slope_num = 7·Σ j·yⱼ −
    21·Σyⱼ.  Positive = locally rising.  Division-free, both engines
    identical; the window convolution folds over the bounded daily
    table."""
    day, rev = _daily_order_revenue(sf_dir)
    n = len(rev)
    if n < 7:
        return pa.table(
            {"day": pa.array([], pa.int64()), "slope_num": pa.array([], pa.int64())}
        )
    w = np.arange(7, dtype=np.int64)
    jy = np.convolve(rev, (7 * w - 21)[::-1], mode="valid")  # Σ(7j−21)·y
    return pa.table(
        {
            "day": pa.array(day[6:], pa.int64()),
            "slope_num": pa.array(jy.astype(np.int64), pa.int64()),
        }
    )


ORDERS_TRAILING7_SLOPE_PIECES_SQL = """
WITH d AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day_,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
w AS (SELECT day_,
             lag(rev, 6) OVER o AS y0, lag(rev, 5) OVER o AS y1,
             lag(rev, 4) OVER o AS y2, lag(rev, 3) OVER o AS y3,
             lag(rev, 2) OVER o AS y4, lag(rev, 1) OVER o AS y5,
             rev AS y6
      FROM d WINDOW o AS (ORDER BY day_))
SELECT CAST(day_ AS BIGINT) AS day,
       CAST(7*(0*y0 + 1*y1 + 2*y2 + 3*y3 + 4*y4 + 5*y5 + 6*y6)
            - 21*(y0 + y1 + y2 + y3 + y4 + y5 + y6) AS BIGINT) AS slope_num
FROM w WHERE y0 IS NOT NULL ORDER BY 1
"""


def lineitem_joint_tail_counts(sf_dir: str):
    """Joint tail-dependence census: do big-quantity and big-price
    lineitems co-occur beyond chance?  Thresholds are the exact P90
    discrete quantiles of centi-quantity and price cents (via the
    histogram-refine machinery — no global sort); the verdict ships as
    the cross-multiplied integers obs_cross = n_both·n vs exp_cross =
    n_top_qty·n_top_price, so no division ever happens."""
    from ...stages.quantiles import exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_quantity", "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        qc = pc.cast(
            pc.floor(pc.add(pc.multiply(pc.cast(t["l_quantity"], pa.float64()), 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table({"qty_c": qc, "price_c": _cents(t["l_extendedprice"])})

    narrow = ds.map_batches(prep, batch_format="pyarrow").materialize()
    thr_q = int(exact_quantiles(narrow, "qty_c", [0.9])["value"][0].as_py())
    thr_p = int(exact_quantiles(narrow, "price_c", [0.9])["value"][0].as_py())

    def census(t: pa.Table) -> pa.Table:
        q = t["qty_c"].combine_chunks().to_numpy(zero_copy_only=False)
        p = t["price_c"].combine_chunks().to_numpy(zero_copy_only=False)
        tq = q > thr_q
        tp = p > thr_p
        return pa.table(
            {
                "n": pa.array([len(q)], pa.int64()),
                "n_top_qty": pa.array([int(tq.sum())], pa.int64()),
                "n_top_price": pa.array([int(tp.sum())], pa.int64()),
                "n_both": pa.array([int((tq & tp).sum())], pa.int64()),
            }
        )

    agg = narrow.map_batches(census, batch_format="pyarrow").sum(
        ["n", "n_top_qty", "n_top_price", "n_both"]
    )
    n = int(agg["sum(n)"])
    ntq = int(agg["sum(n_top_qty)"])
    ntp = int(agg["sum(n_top_price)"])
    nb = int(agg["sum(n_both)"])
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "thr_qty_c": pa.array([thr_q], pa.int64()),
            "thr_price_c": pa.array([thr_p], pa.int64()),
            "n_top_qty": pa.array([ntq], pa.int64()),
            "n_top_price": pa.array([ntp], pa.int64()),
            "n_both": pa.array([nb], pa.int64()),
            "obs_cross": pa.array([nb * n], pa.int64()),
            "exp_cross": pa.array([ntq * ntp], pa.int64()),
        }
    )


LINEITEM_JOINT_TAIL_COUNTS_SQL = """
WITH v AS (SELECT CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS qty_c,
                  CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS price_c
           FROM lineitem),
t AS (SELECT CAST(quantile_disc(qty_c, 0.9) AS BIGINT) AS thr_q,
             CAST(quantile_disc(price_c, 0.9) AS BIGINT) AS thr_p
      FROM v),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN qty_c > thr_q THEN 1 ELSE 0 END) AS BIGINT)
               AS n_top_qty,
             CAST(SUM(CASE WHEN price_c > thr_p THEN 1 ELSE 0 END) AS BIGINT)
               AS n_top_price,
             CAST(SUM(CASE WHEN qty_c > thr_q AND price_c > thr_p
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_both
      FROM v, t)
SELECT n, t.thr_q AS thr_qty_c, t.thr_p AS thr_price_c,
       n_top_qty, n_top_price, n_both,
       CAST(n_both * n AS BIGINT) AS obs_cross,
       CAST(n_top_qty * n_top_price AS BIGINT) AS exp_cross
FROM c, t
"""


def events_type_trigrams_top10(sf_dir: str):
    """Sequential-pattern mining one level past the transition matrix:
    consecutive event-type TRIPLES per user's time-ordered stream, pooled,
    top-10 by count (ties to the lexicographically first triple — a
    deterministic limit boundary).  Per-user kernels emit partial triple
    counts; only O(observed triples) rows shuffle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    _empty = pa.table(
        {
            "t1": pa.array([], pa.string()),
            "t2": pa.array([], pa.string()),
            "t3": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def trigrams(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        t = s["event_type"].to_pandas().to_numpy()
        if len(t) < 3:
            return _empty
        tb = pa.table(
            {
                "t1": pa.array(t[:-2], pa.string()),
                "t2": pa.array(t[1:-1], pa.string()),
                "t3": pa.array(t[2:], pa.string()),
            }
        )
        return (
            tb.group_by(["t1", "t2", "t3"])
            .aggregate([("t1", "count")])
            .rename_columns(["t1", "t2", "t3", "n"])
        )

    return (
        ds.groupby("user_id")
        .map_groups(trigrams, batch_format="pyarrow")
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "t1", "t2", "t3"], descending=[True, False, False, False])
        .limit(10)
    )


EVENTS_TYPE_TRIGRAMS_TOP10_SQL = """
WITH v AS (SELECT user_id, event_type AS t1,
                  lead(event_type) OVER w AS t2,
                  lead(event_type, 2) OVER w AS t3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM v WHERE t3 IS NOT NULL
GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 10
"""


def events_type_adoption_latency(sf_dir: str):
    """Feature-adoption latency: per event type, the discrete median of
    (user's first event of that type − user's first event EVER) in µs
    across adopting users — how deep into a lifecycle each behavior
    appears (0 = it's an entry behavior for the median adopter).  Exact
    integers; per-user kernels emit one (type, latency) row per adopted
    type, per-type kernels take the selection median."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )

    def lat(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = g["event_type"].to_pandas().to_numpy()
        t0 = int(ts.min())
        firsts: dict = {}
        for t, x in zip(types, ts):
            if t not in firsts or x < firsts[t]:
                firsts[t] = int(x)
        ks = sorted(firsts)
        return pa.table(
            {
                "event_type": pa.array(ks, pa.string()),
                "lat": pa.array([firsts[k] - t0 for k in ks], pa.int64()),
            }
        )

    def med(g: pa.Table) -> pa.Table:
        v = np.sort(g["lat"].combine_chunks().to_numpy(zero_copy_only=False))
        n = len(v)
        return pa.table(
            {
                "event_type": pa.array([str(g["event_type"][0].as_py())], pa.string()),
                "n_users": pa.array([n], pa.int64()),
                "median_latency_us": pa.array([int(v[(n + 1) // 2 - 1])], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(lat, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(med, batch_format="pyarrow")
        .sort(["event_type"])
    )


EVENTS_TYPE_ADOPTION_LATENCY_SQL = """
WITH f AS (SELECT user_id, event_type,
                  CAST(epoch_us(MIN(ts)) AS BIGINT) AS first_t
           FROM events GROUP BY 1, 2),
u AS (SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS t0
      FROM events GROUP BY 1)
SELECT f.event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(quantile_disc(f.first_t - u.t0, 0.5) AS BIGINT)
         AS median_latency_us
FROM f JOIN u ON f.user_id = u.user_id
GROUP BY 1 ORDER BY 1
"""


def events_global_quiet_gaps(sf_dir: str):
    """Top-10 corpus-wide QUIET periods: the largest gaps between globally
    consecutive events in (ts, event_id) order — outage forensics over the
    whole stream, not per user.  Distributed shape: global sort → per-block
    intra-gap top-10 partials + (first, last) block edges → the driver
    stitches the O(blocks) boundary gaps and merges (the varint-op
    boundary-stitch discipline).  Exact integer µs."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts"]).sort(
        ["ts", "event_id"]
    )

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(us) == 0:
            return pa.table(
                {
                    "kind": pa.array([], pa.string()),
                    "gap_us": pa.array([], pa.int64()),
                    "start_ts_us": pa.array([], pa.int64()),
                    "start_event_id": pa.array([], pa.int64()),
                }
            )
        rows_k, rows_g, rows_s, rows_i = [], [], [], []
        if len(us) > 1:
            gaps = us[1:] - us[:-1]
            top = np.argsort(-gaps, kind="stable")[:10]
            for i in top:
                rows_k.append("gap")
                rows_g.append(int(gaps[i]))
                rows_s.append(int(us[i]))
                rows_i.append(int(eid[i]))
        # block edges for the boundary stitch
        rows_k += ["first", "last"]
        rows_g += [0, 0]
        rows_s += [int(us[0]), int(us[-1])]
        rows_i += [int(eid[0]), int(eid[-1])]
        return pa.table(
            {
                "kind": pa.array(rows_k, pa.string()),
                "gap_us": pa.array(rows_g, pa.int64()),
                "start_ts_us": pa.array(rows_s, pa.int64()),
                "start_event_id": pa.array(rows_i, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    firsts = parts[parts["kind"] == "first"].sort_values(
        ["start_ts_us", "start_event_id"]
    )
    lasts = parts[parts["kind"] == "last"].sort_values(
        ["start_ts_us", "start_event_id"]
    )
    cand = [
        (int(g), int(s), int(i))
        for g, s, i in zip(
            parts[parts["kind"] == "gap"]["gap_us"],
            parts[parts["kind"] == "gap"]["start_ts_us"],
            parts[parts["kind"] == "gap"]["start_event_id"],
        )
    ]
    lf = lasts.reset_index(drop=True)
    ff = firsts.reset_index(drop=True)
    for b in range(len(lf) - 1):
        cand.append(
            (
                int(ff["start_ts_us"][b + 1]) - int(lf["start_ts_us"][b]),
                int(lf["start_ts_us"][b]),
                int(lf["start_event_id"][b]),
            )
        )
    cand.sort(key=lambda r: (-r[0], r[1], r[2]))
    top = cand[:10]
    return pa.table(
        {
            "rnk": pa.array(list(range(1, len(top) + 1)), pa.int64()),
            "gap_us": pa.array([r[0] for r in top], pa.int64()),
            "start_ts_us": pa.array([r[1] for r in top], pa.int64()),
            "start_event_id": pa.array([r[2] for r in top], pa.int64()),
        }
    )


EVENTS_GLOBAL_QUIET_GAPS_SQL = """
WITH v AS (SELECT event_id, epoch_us(ts) AS t,
                  lead(epoch_us(ts)) OVER (ORDER BY ts, event_id) AS nt
           FROM events),
g AS (SELECT nt - t AS gap_us, t AS start_ts_us, event_id
      FROM v WHERE nt IS NOT NULL),
r AS (SELECT gap_us, start_ts_us, event_id,
             row_number() OVER (ORDER BY gap_us DESC, start_ts_us, event_id)
               AS rnk
      FROM g)
SELECT CAST(rnk AS BIGINT) AS rnk, CAST(gap_us AS BIGINT) AS gap_us,
       CAST(start_ts_us AS BIGINT) AS start_ts_us,
       CAST(event_id AS BIGINT) AS start_event_id
FROM r WHERE rnk <= 10 ORDER BY rnk
"""


def customer_spend_quantile_bands_by_segment(sf_dir: str):
    """Per market segment, the P10/P50/P90 discrete quantiles of PER-
    CUSTOMER lifetime spend — the "who are this segment's typical and
    whale customers" band report.  Spend reduces distributed, one
    8-partition join attaches segments, per-segment kernels are one sort
    + three picks.  Exact integer cents."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"ck": t["o_custkey"], "spend": _cents(t["o_totalprice"])})
        return tb.group_by("ck").aggregate([("spend", "sum")]).rename_columns(
            ["ck", "spend"]
        )

    spend = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("spend", alias_name="spend"))
    )
    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    j = spend.join(
        cust, join_type="inner", num_partitions=8, on=("ck",), right_on=("c_custkey",)
    )

    def bands(g: pa.Table) -> pa.Table:
        v = np.sort(g["spend"].combine_chunks().to_numpy(zero_copy_only=False))
        n = len(v)
        return pa.table(
            {
                "c_mktsegment": pa.array([str(g["c_mktsegment"][0].as_py())], pa.string()),
                "n_customers": pa.array([n], pa.int64()),
                "p10_cents": pa.array([int(v[(n + 9) // 10 - 1])], pa.int64()),
                "p50_cents": pa.array([int(v[(n + 1) // 2 - 1])], pa.int64()),
                "p90_cents": pa.array([int(v[(9 * n + 9) // 10 - 1])], pa.int64()),
            }
        )

    return (
        j.groupby("c_mktsegment")
        .map_groups(bands, batch_format="pyarrow")
        .sort(["c_mktsegment"])
    )


CUSTOMER_SPEND_QUANTILE_BANDS_BY_SEGMENT_SQL = """
WITH s AS (SELECT o_custkey,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS spend
           FROM orders GROUP BY 1)
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(quantile_disc(s.spend, 0.1) AS BIGINT) AS p10_cents,
       CAST(quantile_disc(s.spend, 0.5) AS BIGINT) AS p50_cents,
       CAST(quantile_disc(s.spend, 0.9) AS BIGINT) AS p90_cents
FROM s JOIN customer c ON s.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1
"""


def events_arrival_uniformity_ks(sf_dir: str):
    """Kolmogorov–Smirnov goodness-of-fit of arrival times against the
    UNIFORM process on the observed span (the conditional-on-N Poisson
    test), kept exact by cross-multiplying: with sorted offsets oᵢ and
    span T, D⁺·n·T = max(i·T − n·oᵢ) and D⁻·n·T = max(n·oᵢ − (i−1)·T) —
    pure integers, tie-order invariant.  Offsets sort via the global sort
    operator; the max folds as block partials over (i, oᵢ) pairs."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table(
            {"us": pa.array(t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False), pa.int64())}
        )

    us = (
        ds.map_batches(to_us, batch_format="pyarrow")
        .sort("us")
        .to_pandas()["us"]
        .to_numpy(dtype=np.int64)
    )
    n = len(us)
    t0 = int(us[0])
    span = int(us[-1]) - t0
    o = us - t0
    i = np.arange(1, n + 1, dtype=np.int64)
    d_plus = int((i * span - n * o).max())
    d_minus = int((n * o - (i - 1) * span).max())
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "span_us": pa.array([span], pa.int64()),
            "d_plus_nt": pa.array([d_plus], pa.int64()),
            "d_minus_nt": pa.array([d_minus], pa.int64()),
        }
    )


EVENTS_ARRIVAL_UNIFORMITY_KS_SQL = """
WITH v AS (SELECT epoch_us(ts) AS t FROM events),
b AS (SELECT MIN(t) AS t0, MAX(t) - MIN(t) AS span,
             CAST(COUNT(*) AS BIGINT) AS n FROM v),
r AS (SELECT t - b.t0 AS o, row_number() OVER (ORDER BY t) AS i, b.span, b.n
      FROM v, b)
SELECT (SELECT n FROM b) AS n, CAST((SELECT span FROM b) AS BIGINT) AS span_us,
       CAST(MAX(i * span - n * o) AS BIGINT) AS d_plus_nt,
       CAST(MAX(n * o - (i - 1) * span) AS BIGINT) AS d_minus_nt
FROM r
"""


def events_type_scc(sf_dir: str):
    """Strongly connected components of the DIRECTED type-transition graph
    (nodes = event types, edges = observed consecutive transitions): which
    behaviors form closed loops users cycle within vs one-way funnels.
    Per-user kernels emit distinct edge partials; the SCC itself runs on
    the O(types²) condensed graph (Warshall closure — types is a tiny,
    bounded alphabet), with each component labeled by its lexicographically
    first member."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    _empty = pa.table(
        {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
    )

    def edges(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        t = s["event_type"].to_pandas().to_numpy()
        if len(t) < 2:
            return _empty
        tb = pa.table(
            {"a": pa.array(t[:-1], pa.string()), "b": pa.array(t[1:], pa.string())}
        )
        return tb.group_by(["a", "b"]).aggregate([])

    e = (
        ds.groupby("user_id")
        .map_groups(edges, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    types = np.unique(np.r_[e["a"].to_numpy(), e["b"].to_numpy()])
    ti = {t: i for i, t in enumerate(types)}
    k = len(types)
    reach = np.eye(k, dtype=bool)
    for a, b in zip(e["a"], e["b"]):
        reach[ti[a], ti[b]] = True
    for m in range(k):  # Floyd–Warshall transitive closure
        reach |= reach[:, m : m + 1] & reach[m : m + 1, :]
    mutual = reach & reach.T
    roots = [str(types[np.flatnonzero(mutual[i])[0]]) for i in range(k)]
    sizes = [int(mutual[i].sum()) for i in range(k)]
    return pa.table(
        {
            "event_type": pa.array([str(t) for t in types], pa.string()),
            "scc_root": pa.array(roots, pa.string()),
            "scc_size": pa.array(sizes, pa.int64()),
        }
    )


EVENTS_TYPE_SCC_SQL = """
WITH RECURSIVE v AS (SELECT user_id, event_type AS a,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS b
           FROM events),
e AS (SELECT DISTINCT a, b FROM v WHERE b IS NOT NULL),
nodes AS (SELECT DISTINCT a AS t FROM e UNION SELECT DISTINCT b FROM e),
reach AS (
  SELECT a, b FROM (SELECT a, b FROM e
                    UNION SELECT t AS a, t AS b FROM nodes)
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
),
mutual AS (SELECT r1.a AS t, r1.b AS u
           FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
SELECT t AS event_type, MIN(u) AS scc_root,
       CAST(COUNT(DISTINCT u) AS BIGINT) AS scc_size
FROM mutual GROUP BY 1 ORDER BY 1
"""


def customer_gap_trend_census(sf_dir: str):
    """Are repeat buyers speeding up or slowing down?  Per customer with
    ≥ 3 orders, the Mann–Kendall S over the inter-order gap sequence:
    S > 0 = gaps lengthening (decelerating), S < 0 = accelerating, 0 =
    flat — reported as one census row.  Exact integers; per-customer
    kernels emit one classification each and the census folds as one-row
    partials."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def cls(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("o_orderdate", "ascending"), ("o_orderkey", "ascending")],
            )
        )
        day = (
            s["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        if len(day) < 3:
            return pa.table(
                {
                    "acc": pa.array([], pa.int64()),
                    "dec": pa.array([], pa.int64()),
                    "flat": pa.array([], pa.int64()),
                }
            )
        gaps = np.diff(day)
        iu = np.triu_indices(len(gaps), 1)
        sgn = int(np.sign(gaps[iu[1]] - gaps[iu[0]]).sum())
        return pa.table(
            {
                "acc": pa.array([1 if sgn < 0 else 0], pa.int64()),
                "dec": pa.array([1 if sgn > 0 else 0], pa.int64()),
                "flat": pa.array([1 if sgn == 0 else 0], pa.int64()),
            }
        )

    agg = (
        ds.groupby("o_custkey")
        .map_groups(cls, batch_format="pyarrow")
        .sum(["acc", "dec", "flat"])
    )
    acc, dec, flat = int(agg["sum(acc)"]), int(agg["sum(dec)"]), int(agg["sum(flat)"])
    return pa.table(
        {
            "n_eligible": pa.array([acc + dec + flat], pa.int64()),
            "n_accelerating": pa.array([acc], pa.int64()),
            "n_decelerating": pa.array([dec], pa.int64()),
            "n_flat": pa.array([flat], pa.int64()),
        }
    )


CUSTOMER_GAP_TREND_CENSUS_SQL = """
WITH g AS (SELECT o_custkey,
                  epoch_us(o_orderdate) // 86400000000
                    - lag(epoch_us(o_orderdate) // 86400000000)
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS gap,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders),
v AS (SELECT o_custkey, gap, rn FROM g WHERE gap IS NOT NULL),
s AS (SELECT a.o_custkey,
             CAST(SUM(CASE WHEN b.gap > a.gap THEN 1
                           WHEN b.gap < a.gap THEN -1 ELSE 0 END) AS BIGINT)
               AS s
      FROM v a JOIN v b ON a.o_custkey = b.o_custkey AND b.rn > a.rn
      GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_eligible,
       CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_accelerating,
       CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_decelerating,
       CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat
FROM s
"""


def events_box_occupancy_scales(sf_dir: str):
    """Box-counting occupancy across time scales (the fractal-dimension
    front end, Allan-variance's counting cousin): at each box size (1 min,
    10 min, 1 h, 1 day) how many boxes in the observed span contain at
    least one event vs how many the span holds.  Distinct boxes reduce as
    block partials (O(boxes) through the shuffle); exact integers."""
    scales = [60_000_000, 600_000_000, 3_600_000_000, 86_400_000_000]
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def boxes(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        out_s, out_b = [], []
        for sc in scales:
            b = np.unique(us // sc)
            out_s += [sc] * len(b)
            out_b += [int(x) for x in b]
        return (
            pa.table(
                {
                    "scale_us": pa.array(out_s, pa.int64()),
                    "box": pa.array(out_b, pa.int64()),
                }
            )
            .group_by(["scale_us", "box"])
            .aggregate([])
        )

    occ = (
        ds.map_batches(boxes, batch_format="pyarrow")
        .groupby(["scale_us", "box"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    rows = []
    for sc in scales:
        b = occ[occ["scale_us"] == sc]["box"].to_numpy(dtype=np.int64)
        rows.append((sc, len(b), int(b.max() - b.min() + 1)))
    return pa.table(
        {
            "scale_us": pa.array([r[0] for r in rows], pa.int64()),
            "n_occupied": pa.array([r[1] for r in rows], pa.int64()),
            "n_boxes_span": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


EVENTS_BOX_OCCUPANCY_SCALES_SQL = """
WITH s AS (SELECT unnest([60000000, 600000000, 3600000000, 86400000000])
             AS scale_us),
o AS (SELECT s.scale_us, epoch_us(e.ts) // s.scale_us AS box
      FROM events e, s)
SELECT CAST(scale_us AS BIGINT) AS scale_us,
       CAST(COUNT(DISTINCT box) AS BIGINT) AS n_occupied,
       CAST(MAX(box) - MIN(box) + 1 AS BIGINT) AS n_boxes_span
FROM o GROUP BY 1 ORDER BY 1
"""


def orders_classical_decomposition(sf_dir: str):
    """Classical seasonal decomposition, kept EXACT: the 2×12 centered
    moving-average trend of monthly revenue scaled ×24 (edge weights 1,
    interior 2 — i.e. 2·S₁₃ − y₋₆ − y₊₆, pure integers) and the detrended
    remainder 24·y − trend_x24 — the additive-decomposition front end with
    zero float arithmetic.  Only months with a full ±6 window emit.
    Monthly totals reduce distributed; the convolution folds over the
    bounded month table."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ym = pc.strftime(t["o_orderdate"], format="%Y-%m")
        tb = pa.table({"month": ym, "rev": _cents(t["o_totalprice"])})
        return tb.group_by("month").aggregate([("rev", "sum")]).rename_columns(
            ["month", "rev"]
        )

    monthly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    rev = monthly["rev"].to_numpy(dtype=np.int64)
    months = monthly["month"].to_numpy()
    n = len(rev)
    if n < 13:
        return pa.table(
            {
                "month": pa.array([], pa.string()),
                "rev_cents": pa.array([], pa.int64()),
                "trend_x24": pa.array([], pa.int64()),
                "detrended_x24": pa.array([], pa.int64()),
            }
        )
    s13 = np.convolve(rev, np.ones(13, dtype=np.int64), mode="valid")
    trend = 2 * s13 - rev[:-12] - rev[12:]
    mid = rev[6 : n - 6]
    return pa.table(
        {
            "month": pa.array(months[6 : n - 6], pa.string()),
            "rev_cents": pa.array(mid, pa.int64()),
            "trend_x24": pa.array(trend, pa.int64()),
            "detrended_x24": pa.array(24 * mid - trend, pa.int64()),
        }
    )


ORDERS_CLASSICAL_DECOMPOSITION_SQL = """
WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
w AS (SELECT month, rev,
             SUM(rev) OVER (ORDER BY month
                            ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING) AS s13,
             lag(rev, 6) OVER (ORDER BY month) AS ym6,
             lead(rev, 6) OVER (ORDER BY month) AS yp6
      FROM m)
SELECT month, rev AS rev_cents,
       CAST(2*s13 - ym6 - yp6 AS BIGINT) AS trend_x24,
       CAST(24*rev - (2*s13 - ym6 - yp6) AS BIGINT) AS detrended_x24
FROM w WHERE ym6 IS NOT NULL AND yp6 IS NOT NULL ORDER BY month
"""


def supplier_reach_histogram(sf_dir: str):
    """Supplier market REACH: how many distinct customer nations each
    supplier actually ships to, summarized as a reach → supplier-count
    histogram (the export-diversification census).  Distinct (supplier,
    nation) pairs shrink block-locally before each shuffle; two
    8-partition joins thread orderkey → custkey → nation; exact
    integers."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    j1 = li.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def distinct_cs(t: pa.Table) -> pa.Table:
        return (
            pa.table({"sk": t["l_suppkey"], "ck": t["o_custkey"]})
            .group_by(["sk", "ck"])
            .aggregate([])
        )

    sc = (
        j1.map_batches(distinct_cs, batch_format="pyarrow")
        .groupby(["sk", "ck"])
        .aggregate(Count(alias_name="_c"))
    )
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    j2 = sc.join(
        cust, join_type="inner", num_partitions=8, on=("ck",), right_on=("c_custkey",)
    )

    def distinct_sn(t: pa.Table) -> pa.Table:
        return (
            pa.table({"sk": t["sk"], "nat": t["c_nationkey"]})
            .group_by(["sk", "nat"])
            .aggregate([])
        )

    reach = (
        j2.map_batches(distinct_sn, batch_format="pyarrow")
        .groupby(["sk", "nat"])
        .aggregate(Count(alias_name="_c"))
        .groupby("sk")
        .aggregate(Count(alias_name="reach"))
    )
    return (
        reach.groupby("reach")
        .aggregate(Count(alias_name="n_suppliers"))
        .sort(["reach"])
    )


SUPPLIER_REACH_HISTOGRAM_SQL = """
WITH sn AS (SELECT DISTINCT l.l_suppkey AS sk, c.c_nationkey AS nat
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                            JOIN customer c ON o.o_custkey = c.c_custkey),
r AS (SELECT sk, CAST(COUNT(*) AS BIGINT) AS reach FROM sn GROUP BY 1)
SELECT reach, CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM r GROUP BY 1 ORDER BY 1
"""


def lineitem_ship_batch_histogram(sf_dir: str):
    """Shipping-batch census: lineitems sharing (supplier, ship day) form a
    physical batch; the histogram of batch sizes is the consolidation
    profile (all-1s = no batching, heavy tail = milk runs).  Exact
    integers; (supplier, day) counts reduce via block partials and only
    O(batch sizes) rows reach the final groupby."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_suppkey", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = pa.array(
            t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000,
            pa.int64(),
        )
        return (
            pa.table({"sk": t["l_suppkey"], "day": day})
            .group_by(["sk", "day"])
            .aggregate([("sk", "count")])
            .rename_columns(["sk", "day", "n"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["sk", "day"])
        .aggregate(Sum("n", alias_name="batch_size"))
        .groupby("batch_size")
        .aggregate(Count(alias_name="n_batches"))
        .sort(["batch_size"])
    )


LINEITEM_SHIP_BATCH_HISTOGRAM_SQL = """
WITH b AS (SELECT l_suppkey, epoch_us(l_shipdate) // 86400000000 AS day_,
                  CAST(COUNT(*) AS BIGINT) AS batch_size
           FROM lineitem GROUP BY 1, 2)
SELECT batch_size, CAST(COUNT(*) AS BIGINT) AS n_batches
FROM b GROUP BY 1 ORDER BY 1
"""


def lineitem_quantity_uniformity_gof(sf_dir: str):
    """Chi-square goodness-of-fit front end for quantity-vs-uniform, kept
    EXACT by cross-multiplication: with K observed categories and N rows the
    per-category deviation is (K·n − N)² — the χ² statistic is Σdev/(K·N)
    but the integer numerators hash bit-stably while a float division
    would not.  Per-block counts reduce distributed; the K·N scaling folds
    over the tiny category table on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        return (
            pa.table({"quantity": q})
            .group_by("quantity")
            .aggregate([("quantity", "count")])
            .rename_columns(["quantity", "n"])
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("quantity")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("quantity")
        .reset_index(drop=True)
    )
    n = counts["n"].to_numpy(dtype=np.int64)
    k = np.int64(len(n))
    total = np.int64(n.sum())
    dev = k * n - total
    return pa.table(
        {
            "quantity": pa.array(counts["quantity"].to_numpy(dtype=np.int64)),
            "n": pa.array(n),
            "dev_sq": pa.array(dev * dev),
        }
    )


LINEITEM_QUANTITY_UNIFORMITY_GOF_SQL = """
WITH c AS (SELECT CAST(l_quantity AS BIGINT) AS quantity,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS total
      FROM c)
SELECT quantity, n,
       CAST((k*n - total) * (k*n - total) AS BIGINT) AS dev_sq
FROM c, t ORDER BY quantity
"""


def orders_calendar_coverage(sf_dir: str):
    """Calendar-coverage audit: for each month, how many distinct days saw
    at least one order, the month's day count, and the occupancy in ppm —
    the gap-detection complement of the revenue series (a month at
    700000 ppm has silent days worth investigating).  Distinct dates shrink
    block-locally; only one row per active day reaches the driver."""
    import calendar

    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"d": t["o_orderdate"]}).group_by("d").aggregate([])
        )

    days = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    dt = pd.to_datetime(days["d"])
    month = dt.dt.strftime("%Y-%m")
    act = month.value_counts().sort_index()
    months = act.index.to_numpy()
    active = act.to_numpy(dtype=np.int64)
    mdays = np.array(
        [calendar.monthrange(int(m[:4]), int(m[5:7]))[1] for m in months],
        dtype=np.int64,
    )
    return pa.table(
        {
            "month": pa.array(months, pa.string()),
            "active_days": pa.array(active),
            "month_days": pa.array(mdays),
            "coverage_ppm": pa.array(active * 1_000_000 // mdays),
        }
    )


ORDERS_CALENDAR_COVERAGE_SQL = """
WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS active_days,
                  CAST(day(last_day(MIN(o_orderdate))) AS BIGINT) AS month_days
           FROM orders GROUP BY 1)
SELECT month, active_days, month_days,
       CAST(active_days * 1000000 // month_days AS BIGINT) AS coverage_ppm
FROM m ORDER BY month
"""


def part_brand_token_jaccard(sf_dir: str):
    """Brand naming-vocabulary overlap: the Jaccard similarity of each brand
    pair's part-name token sets, cross-multiplied to exact integers
    (n_inter, n_union, jacc_ppm = inter·10⁶ // union) — the catalog-
    taxonomy confusability matrix.  Distinct (brand, token) pairs shrink
    inside every block before the shuffle; the 25×25 matrix folds on the
    driver.  Zero-overlap pairs still emit (a LEFT-join-style census, not
    a match list)."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_brand", "p_name"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["p_name"], " ")
        flat = pc.list_flatten(toks)
        brand = pa.Array.from_pandas(
            np.repeat(
                t["p_brand"].to_numpy(zero_copy_only=False),
                pc.list_value_length(toks).to_numpy(zero_copy_only=False),
            )
        )
        return (
            pa.table({"b": brand, "tok": flat}).group_by(["b", "tok"]).aggregate([])
        )

    bt = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["b", "tok"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    sets = {b: set(g["tok"]) for b, g in bt.groupby("b")}
    brands = sorted(sets)
    rows = []
    for i, b1 in enumerate(brands):
        for b2 in brands[i + 1 :]:
            inter = len(sets[b1] & sets[b2])
            union = len(sets[b1] | sets[b2])
            rows.append((b1, b2, inter, union, inter * 1_000_000 // union))
    return pa.table(
        {
            "brand1": pa.array([r[0] for r in rows], pa.string()),
            "brand2": pa.array([r[1] for r in rows], pa.string()),
            "n_inter": pa.array([r[2] for r in rows], pa.int64()),
            "n_union": pa.array([r[3] for r in rows], pa.int64()),
            "jacc_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


PART_BRAND_TOKEN_JACCARD_SQL = """
WITH bt AS (SELECT DISTINCT p_brand AS b, tok
            FROM (SELECT p_brand, unnest(string_split(p_name, ' ')) AS tok
                  FROM part)),
sz AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM bt GROUP BY 1),
inter AS (SELECT a.b AS b1, c.b AS b2, CAST(COUNT(*) AS BIGINT) AS n_inter
          FROM bt a JOIN bt c ON a.tok = c.tok AND a.b < c.b GROUP BY 1, 2)
SELECT s1.b AS brand1, s2.b AS brand2,
       COALESCE(i.n_inter, 0) AS n_inter,
       CAST(s1.n + s2.n - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union,
       CAST(COALESCE(i.n_inter, 0) * 1000000
            // (s1.n + s2.n - COALESCE(i.n_inter, 0)) AS BIGINT) AS jacc_ppm
FROM sz s1 JOIN sz s2 ON s1.b < s2.b
LEFT JOIN inter i ON i.b1 = s1.b AND i.b2 = s2.b
ORDER BY brand1, brand2
"""


def orders_price_quantum_audit(sf_dir: str):
    """Price-quantum forensics: for each candidate quantum (5¢, 10¢, …,
    $100) the count and ppm of order totals divisible by it, plus the
    exact GCD of ALL price-cents (the true lattice pitch; 1 here = no
    quantization) repeated as a column.  GCD is associative and
    commutative so it folds per block (np.gcd.reduce) and merges on the
    driver — the canonical distributed-reduce shape."""
    divisors = np.array([5, 10, 25, 50, 100, 500, 1000, 10000], dtype=np.int64)
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        div_counts = (c[:, None] % divisors[None, :] == 0).sum(axis=0)
        return pa.table(
            {
                "divisor": pa.array(divisors),
                "n_divisible": pa.array(div_counts.astype(np.int64)),
                "n_rows": pa.array(np.full(len(divisors), len(c), dtype=np.int64)),
                "gcd_part": pa.array(
                    np.full(len(divisors), np.gcd.reduce(c), dtype=np.int64)
                ),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("divisor", as_index=False)
        .agg(
            n_divisible=("n_divisible", "sum"),
            n_rows=("n_rows", "sum"),
            gcd_all=("gcd_part", lambda s: np.gcd.reduce(s.to_numpy())),
        )
        .sort_values("divisor")
    )
    n = parts["n_divisible"].to_numpy(dtype=np.int64)
    total = parts["n_rows"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "divisor": pa.array(parts["divisor"].to_numpy(dtype=np.int64)),
            "n_divisible": pa.array(n),
            "ppm": pa.array(n * 1_000_000 // total),
            "gcd_all": pa.array(parts["gcd_all"].to_numpy(dtype=np.int64)),
        }
    )


ORDERS_PRICE_QUANTUM_AUDIT_SQL = """
WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders),
g AS (SELECT CAST(list_reduce(list(cents), (a, b) -> gcd(a, b)) AS BIGINT)
             AS gcd_all,
      CAST(COUNT(*) AS BIGINT) AS total FROM c),
d AS (SELECT unnest([5, 10, 25, 50, 100, 500, 1000, 10000]) AS divisor)
SELECT CAST(d.divisor AS BIGINT) AS divisor,
       CAST(SUM(CASE WHEN c.cents % d.divisor = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_divisible,
       CAST(SUM(CASE WHEN c.cents % d.divisor = 0 THEN 1 ELSE 0 END)
            * 1000000 // MAX(g.total) AS BIGINT) AS ppm,
       MAX(g.gcd_all) AS gcd_all
FROM d, c, g GROUP BY 1 ORDER BY 1
"""


def part_name_lcp_histogram(sf_dir: str):
    """Key-space clustering census on STRINGS: the longest-common-prefix
    length between lexicographically adjacent distinct part names,
    histogrammed — long prefixes mean shared templates (prefix-compressible
    dictionaries, range-partition-friendly keys).  Distinct names shrink
    block-locally; the sorted LCP walk runs over the tiny distinct set on
    the driver.  Oracle reproduces LCP via the monotone prefix-equality
    count (list_filter over scalar range)."""
    import os

    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_name"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"p_name": t["p_name"]}).group_by("p_name").aggregate([])

    names = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_name")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()["p_name"]
        .sort_values()
        .to_numpy()
    )
    lcps = np.array(
        [
            len(os.path.commonprefix([names[i - 1], names[i]]))
            for i in range(1, len(names))
        ],
        dtype=np.int64,
    )
    vals, counts = np.unique(lcps, return_counts=True)
    return pa.table(
        {
            "lcp_len": pa.array(vals.astype(np.int64)),
            "n_pairs": pa.array(counts.astype(np.int64)),
        }
    )


PART_NAME_LCP_HISTOGRAM_SQL = """
WITH n AS (SELECT DISTINCT p_name FROM part),
s AS (SELECT p_name, lag(p_name) OVER (ORDER BY p_name) AS prev FROM n),
l AS (SELECT CAST(length(list_filter(
                 range(1, least(length(p_name), length(prev)) + 1),
                 i -> substr(p_name, 1, i) = substr(prev, 1, i)))
             AS BIGINT) AS lcp_len
      FROM s WHERE prev IS NOT NULL)
SELECT lcp_len, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM l GROUP BY 1 ORDER BY 1
"""


def orders_price_hist_intersection_yoy(sf_dir: str):
    """Distribution-drift tracking via HISTOGRAM INTERSECTION: consecutive
    years' order totals binned into $1000 bands; overlap = Σ min(h₁, h₂)
    and the Sørensen-style 2·inter/(n₁+n₂) in exact ppm — the cheap
    integer alternative to Wasserstein for is-this-year-shaped-like-last-
    year.  (year, band) partials reduce distributed; the year-pair fold
    runs over the tiny banded table on the driver."""
    import pandas as pd

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        band = pc.divide(_cents(t["o_totalprice"]), 100_000)
        return (
            pa.table({"y": y, "band": band})
            .group_by(["y", "band"])
            .aggregate([("y", "count")])
            .rename_columns(["y", "band", "n"])
        )

    b = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["y", "band"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = b.pivot_table(index="band", columns="y", values="n", fill_value=0)
    years = sorted(int(y) for y in piv.columns)
    rows = []
    for y1, y2 in zip(years, years[1:]):
        h1 = piv[y1].to_numpy(dtype=np.int64)
        h2 = piv[y2].to_numpy(dtype=np.int64)
        n1, n2 = int(h1.sum()), int(h2.sum())
        inter = int(np.minimum(h1, h2).sum())
        rows.append((y1, y2, n1, n2, inter, 2 * inter * 1_000_000 // (n1 + n2)))
    return pa.table(
        {
            "year1": pa.array([r[0] for r in rows], pa.int64()),
            "year2": pa.array([r[1] for r in rows], pa.int64()),
            "n1": pa.array([r[2] for r in rows], pa.int64()),
            "n2": pa.array([r[3] for r in rows], pa.int64()),
            "n_inter": pa.array([r[4] for r in rows], pa.int64()),
            "overlap_ppm": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


ORDERS_PRICE_HIST_INTERSECTION_YOY_SQL = """
WITH b AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) // 100000
                      AS band,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1, 2),
t AS (SELECT y, CAST(SUM(n) AS BIGINT) AS tot FROM b GROUP BY 1),
i AS (SELECT b1.y AS year1, b2.y AS year2,
             CAST(SUM(LEAST(b1.n, b2.n)) AS BIGINT) AS n_inter
      FROM b b1 JOIN b b2 ON b2.y = b1.y + 1 AND b1.band = b2.band
      GROUP BY 1, 2)
SELECT t1.y AS year1, t2.y AS year2, t1.tot AS n1, t2.tot AS n2,
       COALESCE(i.n_inter, 0) AS n_inter,
       CAST(2 * COALESCE(i.n_inter, 0) * 1000000 // (t1.tot + t2.tot)
            AS BIGINT) AS overlap_ppm
FROM t t1 JOIN t t2 ON t2.y = t1.y + 1
LEFT JOIN i ON i.year1 = t1.y AND i.year2 = t2.y
ORDER BY year1
"""


def docs_lang_weighted_jaccard(sf_dir: str):
    """WEIGHTED Jaccard between language term-count vectors — Σmin/Σmax
    over term frequencies, the multiset upgrade of the set-Jaccard vocab
    matrix (a pair sharing vocabulary but at wildly different rates scores
    low here and high there).  Exact integers: sum_min, sum_max,
    wjacc_ppm.  Block-local (lang, term) combiners shrink the shuffle;
    the 10-pair fold runs on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def term_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        n_per_row = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        langs = pa.array(
            np.repeat(
                t["lang"].to_numpy(zero_copy_only=False).astype(object), n_per_row
            ),
            pa.string(),
        )
        flat = pc.list_flatten(toks)
        tb = pa.table({"lang": langs, "term": flat}).filter(
            pc.not_equal(pc.coalesce(flat, ""), "")
        )
        return (
            tb.group_by(["lang", "term"])
            .aggregate([("term", "count")])
            .rename_columns(["lang", "term", "n"])
        )

    tc = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = tc.pivot_table(index="term", columns="lang", values="n", fill_value=0)
    langs = sorted(piv.columns)
    rows = []
    for i, l1 in enumerate(langs):
        for l2 in langs[i + 1 :]:
            v1 = piv[l1].to_numpy(dtype=np.int64)
            v2 = piv[l2].to_numpy(dtype=np.int64)
            smin = int(np.minimum(v1, v2).sum())
            smax = int(np.maximum(v1, v2).sum())
            rows.append((l1, l2, smin, smax, smin * 1_000_000 // smax))
    return pa.table(
        {
            "lang1": pa.array([r[0] for r in rows], pa.string()),
            "lang2": pa.array([r[1] for r in rows], pa.string()),
            "sum_min": pa.array([r[2] for r in rows], pa.int64()),
            "sum_max": pa.array([r[3] for r in rows], pa.int64()),
            "wjacc_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


DOCS_LANG_WEIGHTED_JACCARD_SQL = """
WITH toks AS (
  SELECT lang,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
tc AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
       FROM toks WHERE term <> '' GROUP BY 1, 2),
langs AS (SELECT DISTINCT lang FROM tc),
pairs AS (SELECT l1.lang AS lang1, l2.lang AS lang2
          FROM langs l1 JOIN langs l2 ON l1.lang < l2.lang),
terms AS (SELECT DISTINCT term FROM tc),
grid AS (SELECT p.lang1, p.lang2, t.term,
                COALESCE(c1.n, 0) AS n1, COALESCE(c2.n, 0) AS n2
         FROM pairs p CROSS JOIN terms t
         LEFT JOIN tc c1 ON c1.lang = p.lang1 AND c1.term = t.term
         LEFT JOIN tc c2 ON c2.lang = p.lang2 AND c2.term = t.term)
SELECT lang1, lang2,
       CAST(SUM(LEAST(n1, n2)) AS BIGINT) AS sum_min,
       CAST(SUM(GREATEST(n1, n2)) AS BIGINT) AS sum_max,
       CAST(SUM(LEAST(n1, n2)) * 1000000 // SUM(GREATEST(n1, n2))
            AS BIGINT) AS wjacc_ppm
FROM grid GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_weekday_friedman_ranks(sf_dir: str):
    """Friedman blocked-rank front end: months are blocks, weekdays are
    treatments; within each COMPLETE month (all 7 weekdays traded) the
    weekday revenues are ranked with average-rank tie handling kept exact
    by the ×2 trick (avg_rank·2 = 2·#smaller + #equal + 1, an integer).
    Per-weekday rank sums are the Friedman statistic's sufficient input.
    Monthly revenue reduces distributed; ranking folds over the ≤80×7
    table on the driver."""
    import pandas as pd

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ym = pc.strftime(t["o_orderdate"], format="%Y-%m")
        dow = pc.add(pc.day_of_week(t["o_orderdate"]), 1)
        return (
            pa.table({"month": ym, "dow": dow, "rev": _cents(t["o_totalprice"])})
            .group_by(["month", "dow"])
            .aggregate([("rev", "sum")])
            .rename_columns(["month", "dow", "rev"])
        )

    md = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["month", "dow"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    full = md.groupby("month")["dow"].transform("size") == 7
    md = md[full]
    sums = np.zeros(8, dtype=np.int64)
    n_months = md["month"].nunique()
    for _, g in md.groupby("month"):
        rev = g["rev"].to_numpy(dtype=np.int64)
        dows = g["dow"].to_numpy(dtype=np.int64)
        smaller = (rev[:, None] > rev[None, :]).sum(axis=1)
        equal = (rev[:, None] == rev[None, :]).sum(axis=1)
        rank_x2 = 2 * smaller + equal + 1
        np.add.at(sums, dows, rank_x2)
    return pa.table(
        {
            "dow": pa.array(np.arange(1, 8, dtype=np.int64)),
            "n_months": pa.array(np.full(7, n_months, dtype=np.int64)),
            "rank_sum_x2": pa.array(sums[1:8]),
        }
    )


ORDERS_WEEKDAY_FRIEDMAN_RANKS_SQL = """
WITH md AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   CAST(isodow(o_orderdate) AS BIGINT) AS dow,
                   CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1, 2),
full_m AS (SELECT month FROM md GROUP BY 1 HAVING COUNT(*) = 7),
r AS (SELECT m.dow,
             2*RANK() OVER (PARTITION BY m.month ORDER BY m.rev)
               + COUNT(*) OVER (PARTITION BY m.month, m.rev) - 1 AS rank_x2
      FROM md m JOIN full_m f ON m.month = f.month)
SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_months,
       CAST(SUM(rank_x2) AS BIGINT) AS rank_sum_x2
FROM r GROUP BY 1 ORDER BY 1
"""


def lineitem_qty_discount_concordance_census(sf_dir: str):
    """Goodman-Kruskal concordance CENSUS for (quantity, discount): the
    full pair decomposition — concordant, discordant, tied-on-qty-only,
    tied-on-discount-only, tied-on-both — as exact integers (the
    sufficient statistics for gamma, tau-b and Somers' D all at once,
    left unrationed so no float division can smear).  The N² pair space
    never materializes: block partials build the 50×11 contingency grid
    and the O(grid²) fold runs on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_quantity", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        d = pc.cast(
            pc.floor(
                pc.add(pc.multiply(pc.cast(t["l_discount"], pa.float64()), 10000.0), 0.5)
            ),
            pa.int64(),
        )
        return (
            pa.table({"q": q, "dbp": d})
            .group_by(["q", "dbp"])
            .aggregate([("q", "count")])
            .rename_columns(["q", "dbp", "n"])
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["q", "dbp"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    q = grid["q"].to_numpy(dtype=np.int64)
    d = grid["dbp"].to_numpy(dtype=np.int64)
    n = grid["n"].to_numpy(dtype=np.int64)
    total = int(n.sum())
    outer = n[:, None] * n[None, :]
    qg = q[:, None] < q[None, :]
    dg = d[:, None] < d[None, :]
    dl = d[:, None] > d[None, :]
    qe = q[:, None] == q[None, :]
    de = d[:, None] == d[None, :]
    conc = int(outer[qg & dg].sum())
    disc = int(outer[qg & dl].sum())
    tie_q = int(outer[qe & dg].sum())
    tie_d = int(outer[de & qg].sum())
    tie_both = int((n * (n - 1) // 2).sum())
    n_pairs = total * (total - 1) // 2
    assert conc + disc + tie_q + tie_d + tie_both == n_pairs
    return pa.table(
        {
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "n_conc": pa.array([conc], pa.int64()),
            "n_disc": pa.array([disc], pa.int64()),
            "n_tie_qty_only": pa.array([tie_q], pa.int64()),
            "n_tie_disc_only": pa.array([tie_d], pa.int64()),
            "n_tie_both": pa.array([tie_both], pa.int64()),
        }
    )


LINEITEM_QTY_DISCOUNT_CONCORDANCE_CENSUS_SQL = """
WITH g AS (SELECT CAST(l_quantity AS BIGINT) AS q,
                  CAST(FLOOR(l_discount*10000 + 0.5) AS BIGINT) AS dbp,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
SELECT CAST(MAX(t.total) * (MAX(t.total) - 1) // 2 AS BIGINT) AS n_pairs,
       CAST((SELECT COALESCE(SUM(a.n*b.n), 0) FROM g a JOIN g b
             ON b.q > a.q AND b.dbp > a.dbp) AS BIGINT) AS n_conc,
       CAST((SELECT COALESCE(SUM(a.n*b.n), 0) FROM g a JOIN g b
             ON b.q > a.q AND b.dbp < a.dbp) AS BIGINT) AS n_disc,
       CAST((SELECT COALESCE(SUM(a.n*b.n), 0) FROM g a JOIN g b
             ON b.q = a.q AND b.dbp > a.dbp) AS BIGINT) AS n_tie_qty_only,
       CAST((SELECT COALESCE(SUM(a.n*b.n), 0) FROM g a JOIN g b
             ON b.dbp = a.dbp AND b.q > a.q) AS BIGINT) AS n_tie_disc_only,
       CAST((SELECT SUM(n*(n-1)//2) FROM g) AS BIGINT) AS n_tie_both
FROM t
"""


def embeddings_dim_sign_census(sf_dir: str):
    """Per-dimension SIGN balance of the embedding space: positives,
    negatives, zeros and the absolute imbalance |pos − neg| per coordinate
    — a centered-representation audit (a healthy encoder is near-balanced;
    a dimension stuck one-sided is a dead or bias unit).  Vectors never
    leave their blocks: each block folds to a 64-row partial and the
    shuffle moves O(dims) rows."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        pos = (m > 0).sum(axis=0).astype(np.int64)
        neg = (m < 0).sum(axis=0).astype(np.int64)
        zer = (m == 0).sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, m.shape[1] + 1, dtype=np.int64)),
                "n_pos": pa.array(pos),
                "n_neg": pa.array(neg),
                "n_zero": pa.array(zer),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n_pos", alias_name="n_pos"),
            Sum("n_neg", alias_name="n_neg"),
            Sum("n_zero", alias_name="n_zero"),
        )
        .to_pandas()
        .sort_values("dim")
    )
    pos = agg["n_pos"].to_numpy(dtype=np.int64)
    neg = agg["n_neg"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "dim": pa.array(agg["dim"].to_numpy(dtype=np.int64)),
            "n_pos": pa.array(pos),
            "n_neg": pa.array(neg),
            "n_zero": pa.array(agg["n_zero"].to_numpy(dtype=np.int64)),
            "imbalance": pa.array(np.abs(pos - neg)),
        }
    )


EMBEDDINGS_DIM_SIGN_CENSUS_SQL = """
WITH e AS (SELECT unnest(embedding) AS x,
                  unnest(range(1, len(embedding) + 1)) AS dim
           FROM embeddings)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
       CAST(SUM(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(ABS(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END)
                - SUM(CASE WHEN x < 0 THEN 1 ELSE 0 END)) AS BIGINT)
           AS imbalance
FROM e GROUP BY 1 ORDER BY 1
"""


def events_user_type_cochran_q(sf_dir: str):
    """Cochran's Q sufficient statistics: users are blocks, event types are
    binary treatments (used-at-least-once).  Emits per-type adopter counts
    plus the row-total moments ΣRᵢ and ΣRᵢ² the Q statistic needs — all
    exact integers, so the test folds downstream without a float in the
    pipeline.  Distinct (user, type) pairs shrink block-locally; the
    moment fold runs over the tiny incidence table on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"u": t["user_id"], "ty": t["event_type"]})
            .group_by(["u", "ty"])
            .aggregate([])
        )

    inc = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["u", "ty"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    col = inc.groupby("ty").size().sort_index()
    row = inc.groupby("u").size()
    n_users = int(row.shape[0])
    sum_r = int(row.sum())
    sum_r2 = int((row * row).sum())
    k = len(col)
    return pa.table(
        {
            "event_type": pa.array(col.index.to_numpy(), pa.string()),
            "c_users": pa.array(col.to_numpy(dtype=np.int64)),
            "n_users": pa.array(np.full(k, n_users, dtype=np.int64)),
            "sum_r": pa.array(np.full(k, sum_r, dtype=np.int64)),
            "sum_r2": pa.array(np.full(k, sum_r2, dtype=np.int64)),
        }
    )


EVENTS_USER_TYPE_COCHRAN_Q_SQL = """
WITH inc AS (SELECT DISTINCT user_id, event_type FROM events),
r AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ri FROM inc GROUP BY 1),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(ri) AS BIGINT) AS sum_r,
             CAST(SUM(ri*ri) AS BIGINT) AS sum_r2 FROM r)
SELECT i.event_type, CAST(COUNT(*) AS BIGINT) AS c_users,
       MAX(m.n_users) AS n_users, MAX(m.sum_r) AS sum_r,
       MAX(m.sum_r2) AS sum_r2
FROM inc i, m GROUP BY 1 ORDER BY 1
"""


def events_sessionize_threshold_curve(sf_dir: str):
    """Sessionization SENSITIVITY curve: the session count at five
    idle-gap thresholds (30 s … 1 h) in one pass — the knob-tuning
    artifact behind every sessionize deployment (a flat curve means the
    choice is safe, a cliff means it isn't).  n_sessions(T) = n_users +
    #gaps>T, so per-user sorted gaps fold to a 5-counter partial inside
    map_groups and only O(users·5) rows shuffle."""
    thresholds = np.array([30, 60, 300, 900, 3600], dtype=np.int64)
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])

    def per_user(g: pa.Table) -> pa.Table:
        s = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        us = s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        gaps = np.diff(us)
        over = (gaps[:, None] > thresholds[None, :] * 1_000_000).sum(axis=0)
        return pa.table(
            {
                "threshold_s": pa.array(thresholds),
                "n_over": pa.array(over.astype(np.int64)),
                "n_users": pa.array(np.ones(len(thresholds), dtype=np.int64)),
            }
        )

    agg = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("threshold_s")
        .aggregate(
            Sum("n_over", alias_name="n_over"),
            Sum("n_users", alias_name="n_users"),
        )
        .to_pandas()
        .sort_values("threshold_s")
    )
    return pa.table(
        {
            "threshold_s": pa.array(agg["threshold_s"].to_numpy(dtype=np.int64)),
            "n_sessions": pa.array(
                (agg["n_users"] + agg["n_over"]).to_numpy(dtype=np.int64)
            ),
        }
    )


EVENTS_SESSIONIZE_THRESHOLD_CURVE_SQL = """
WITH g AS (SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events),
u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM events),
t AS (SELECT unnest([30, 60, 300, 900, 3600]) AS threshold_s)
SELECT CAST(t.threshold_s AS BIGINT) AS threshold_s,
       CAST(MAX(u.nu) + SUM(CASE WHEN g.gap > CAST(t.threshold_s AS BIGINT)
                                              * 1000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM t, g, u WHERE g.gap IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def orders_lorenz_asymmetry_point(sf_dir: str):
    """The Lorenz-curve point at the MEAN — F(μ) (share of orders below
    mean) and L(μ) (share of revenue below mean), whose sum is the Lorenz
    asymmetry coefficient — kept exact by the rational-mean trick:
    x < μ = S/n  ⇔  x·n < S, so no division ever happens.  Two-phase
    broadcast shape: a cheap global (n, S) aggregate, then a counting
    pass with the thresholds captured in the closure."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def cents_tbl(t: pa.Table) -> pa.Table:
        return pa.table({"c": _cents(t["o_totalprice"])})

    cds = ds.map_batches(cents_tbl, batch_format="pyarrow")
    tot = cds.aggregate(Sum("c", alias_name="s"), Count(alias_name="n"))
    s_total, n_total = int(tot["s"]), int(tot["n"])

    def below(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        mask = c * n_total < s_total
        return pa.table(
            {
                "n_below": pa.array([int(mask.sum())], pa.int64()),
                "sum_below": pa.array([int(c[mask].sum())], pa.int64()),
            }
        )

    parts = cds.map_batches(below, batch_format="pyarrow").to_pandas()
    n_below = int(parts["n_below"].sum())
    sum_below = int(parts["sum_below"].sum())
    return pa.table(
        {
            "n": pa.array([n_total], pa.int64()),
            "total_cents": pa.array([s_total], pa.int64()),
            "n_below": pa.array([n_below], pa.int64()),
            "sum_below_cents": pa.array([sum_below], pa.int64()),
            "f_ppm": pa.array([n_below * 1_000_000 // n_total], pa.int64()),
            "l_ppm": pa.array([sum_below * 1_000_000 // s_total], pa.int64()),
        }
    )


ORDERS_LORENZ_ASYMMETRY_POINT_SQL = """
WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM c)
SELECT MAX(t.n) AS n, MAX(t.s) AS total_cents,
       CAST(SUM(CASE WHEN c.cents * t.n < t.s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_below,
       CAST(SUM(CASE WHEN c.cents * t.n < t.s THEN c.cents ELSE 0 END)
            AS BIGINT) AS sum_below_cents,
       CAST(SUM(CASE WHEN c.cents * t.n < t.s THEN 1 ELSE 0 END)
            * 1000000 // MAX(t.n) AS BIGINT) AS f_ppm,
       CAST(SUM(CASE WHEN c.cents * t.n < t.s THEN c.cents ELSE 0 END)
            * 1000000 // MAX(t.s) AS BIGINT) AS l_ppm
FROM c, t
"""
