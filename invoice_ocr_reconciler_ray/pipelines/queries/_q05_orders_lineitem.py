"""Query-registry family module 5/9 (dominant family: orders_lineitem; split from the monolithic queries.py)."""

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



def events_session_bounce_ppm(sf_dir: str):
    """Session BOUNCE RATE: share of 30-min-gap sessions containing exactly
    one event — the classic engagement KPI over the same session definition
    as ``events_sessionize``.  Per-user session sizes come from the sorted
    group kernel; the global roll-up is a distributed ``Dataset.sum`` over
    the per-user partials (never a driver row loop), so the user dimension
    can grow without bound.  Integer ppm output."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000

    def per_user(g: pa.Table) -> pa.Table:
        ts = np.sort(
            g["ts"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64),
            kind="stable",
        )
        brk = np.r_[True, np.diff(ts) > gap_us]
        starts = np.nonzero(brk)[0]
        sizes = np.diff(np.r_[starts, len(ts)])
        return pa.table(
            {
                "n_sessions": pa.array([len(starts)], pa.int64()),
                "n_bounce": pa.array([int((sizes == 1).sum())], pa.int64()),
            }
        )

    agg = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .sum(["n_sessions", "n_bounce"])
    )
    ns, nb = int(agg["sum(n_sessions)"]), int(agg["sum(n_bounce)"])
    return pa.table(
        {
            "n_sessions": pa.array([ns], pa.int64()),
            "n_bounce": pa.array([nb], pa.int64()),
            "bounce_ppm": pa.array([nb * 1_000_000 // ns], pa.int64()),
        }
    )


EVENTS_SESSION_BOUNCE_PPM_SQL = """
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
y AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM x),
s AS (SELECT user_id, sess, COUNT(*) AS n FROM y GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS bounce_ppm
FROM s
"""


def events_next_greater_distance(sf_dir: str):
    """NEXT GREATER ELEMENT per event: for each event in a user's
    time-ordered stream, the forward distance (in events) to the first later
    event with a strictly larger cents value — 0 when none follows.  The
    monotonic-stack op class; here groups are small (≤~100 events/user) so
    the kernel is a vectorized O(n²) upper-triangle compare (first-hit via
    argmax over a boolean matrix); the O(n) stack is the documented swap-in
    for long per-user streams.  Exact integers end to end."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def nge(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        n = len(c)
        # hit[i, j] = later event j strictly greater than event i
        hit = (c[None, :] > c[:, None]) & (
            np.arange(n)[None, :] > np.arange(n)[:, None]
        )
        any_hit = hit.any(axis=1)
        first = hit.argmax(axis=1)
        dist = np.where(any_hit, first - np.arange(n), 0).astype(np.int64)
        return pa.table(
            {
                "event_id": s["event_id"],
                "dist_to_greater": pa.array(dist, pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(nge, batch_format="pyarrow")
        .sort(["event_id"])
    )


EVENTS_NEXT_GREATER_DISTANCE_SQL = """
WITH v AS (
  SELECT event_id, user_id, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)
SELECT a.event_id,
       CAST(COALESCE(MIN(b.rn) - a.rn, 0) AS BIGINT) AS dist_to_greater
FROM v a LEFT JOIN v b
  ON a.user_id = b.user_id AND b.rn > a.rn AND b.c > a.c
GROUP BY a.event_id, a.rn
ORDER BY a.event_id
"""


def segment_nation_mix(sf_dir: str):
    """Market-segment × nation composition: customer counts per (segment,
    nation) with each cell's share WITHIN its segment in ppm.  Dimension
    join is a broadcast map over the 25-row nation table (never a shuffle);
    the cell grid is O(segments × nations) so the within-segment share is a
    driver-side normalize over the tiny aggregate (the documented pattern
    for second-level aggregates of bounded cardinality)."""
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_mktsegment", "c_nationkey"])
    nat = rd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"segment": t["c_mktsegment"], "nk": t["c_nationkey"]})
            .group_by(["segment", "nk"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["segment", "nk", "n"])

    cells = (
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby(["segment", "nk"])
        .aggregate(Sum("n", alias_name="n_customers"))
        .to_pandas()
    )
    cells["nation"] = cells["nk"].astype(int).map(nmap)
    seg_tot = cells.groupby("segment")["n_customers"].transform("sum")
    cells["share_ppm"] = (
        cells["n_customers"].astype("int64") * 1_000_000 // seg_tot.astype("int64")
    )
    out = cells[["segment", "nation", "n_customers", "share_ppm"]].sort_values(
        ["segment", "nation"], kind="mergesort"
    )
    out["n_customers"] = out["n_customers"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SEGMENT_NATION_MIX_SQL = """
SELECT c_mktsegment AS segment, n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(*) * 1000000
            // SUM(COUNT(*)) OVER (PARTITION BY c_mktsegment) AS BIGINT)
         AS share_ppm
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_dow_revenue(sf_dir: str):
    """Revenue profile by ISO day-of-week (1=Monday … 7=Sunday): order
    count, revenue cents, and share of total revenue in ppm.  Block-local
    pyarrow partials (dow key + cents sum) → one 7-row groupby; the share
    normalizes against the grand total on the driver (7 rows — bounded).
    pyarrow ``day_of_week`` is 0=Monday; +1 aligns it with DuckDB isodow."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(t["o_orderdate"]), 1)
        tb = pa.table({"dow": pc.cast(dow, pa.int64()), "cents": _cents(t["o_totalprice"])})
        g = tb.group_by("dow").aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["dow", "cents", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dow")
        .aggregate(Sum("cents", alias_name="revenue_cents"), Sum("n", alias_name="n_orders"))
        .to_pandas()
        .sort_values("dow", kind="mergesort")
    )
    total = int(cells["revenue_cents"].sum())
    share = cells["revenue_cents"].astype("int64") * 1_000_000 // total
    return pa.table(
        {
            "dow": pa.array(cells["dow"].astype("int64")),
            "n_orders": pa.array(cells["n_orders"].astype("int64")),
            "revenue_cents": pa.array(cells["revenue_cents"].astype("int64")),
            "share_ppm": pa.array(share.astype("int64")),
        }
    )


ORDERS_DOW_REVENUE_SQL = """
WITH d AS (
  SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders)
SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST(SUM(cents) * 1000000 // (SELECT SUM(cents) FROM d) AS BIGINT)
         AS share_ppm
FROM d GROUP BY 1 ORDER BY 1
"""


def orders_priority_qq_deciles(sf_dir: str):
    """QQ PLOT data: total-price deciles of URGENT orders against LOW
    orders — the distribution-comparison op (are urgent orders priced
    differently?).  Discrete quantiles via the sorted[⌈q·n⌉−1] convention in
    pure INTEGER index math (idx = (d·n+9)//10 − 1) so no float boundary can
    shift a rank; each priority's decile vector comes from one per-group
    sorted kernel, joined on decile.  At scale the sort-in-group becomes the
    two-phase histogram-refine selection in ``stages/quantiles`` (same
    convention, documented swap-in)."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(
                t["o_orderpriority"], value_set=pa.array(["1-URGENT", "5-LOW"])
            )
        ),
        batch_format="pyarrow",
    )

    def deciles(g: pa.Table) -> pa.Table:
        c = np.sort(_cents(g["o_totalprice"]).to_numpy(zero_copy_only=False))
        n = len(c)
        d = np.arange(1, 10, dtype=np.int64)
        idx = (d * n + 9) // 10 - 1
        return pa.table(
            {
                "pri": pa.array([g["o_orderpriority"][0].as_py()] * 9, pa.string()),
                "decile": pa.array(d, pa.int64()),
                "cents": pa.array(c[idx], pa.int64()),
            }
        )

    wide = (
        ds.groupby("o_orderpriority")
        .map_groups(deciles, batch_format="pyarrow")
        .to_pandas()
        .pivot(index="decile", columns="pri", values="cents")
        .reset_index()
    )
    return pa.table(
        {
            "decile": pa.array(wide["decile"].astype("int64")),
            "urgent_cents": pa.array(wide["1-URGENT"].astype("int64")),
            "low_cents": pa.array(wide["5-LOW"].astype("int64")),
            "gap_cents": pa.array(
                (wide["1-URGENT"] - wide["5-LOW"]).astype("int64")
            ),
        }
    )


ORDERS_PRIORITY_QQ_DECILES_SQL = """
WITH v AS (
  SELECT o_orderpriority AS pri,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
d AS (SELECT unnest(range(1, 10)) AS decile),
q AS (
  SELECT d.decile, v.pri, v.cents
  FROM d JOIN v ON v.rn = (d.decile * v.n + 9) // 10)
SELECT q.decile,
       CAST(MAX(CASE WHEN pri = '1-URGENT' THEN cents END) AS BIGINT) AS urgent_cents,
       CAST(MAX(CASE WHEN pri = '5-LOW' THEN cents END) AS BIGINT) AS low_cents,
       CAST(MAX(CASE WHEN pri = '1-URGENT' THEN cents END)
            - MAX(CASE WHEN pri = '5-LOW' THEN cents END) AS BIGINT) AS gap_cents
FROM q GROUP BY 1 ORDER BY 1
"""


def customer_negative_balance_by_segment(sf_dir: str):
    """Credit-risk census: per market segment, how many customers carry a
    NEGATIVE account balance, and the segment's negative share in ppm.
    One block-local partial (segment → n, n_neg) and a 5-row groupby — the
    canonical pre-aggregated boolean-share shape."""
    ds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_mktsegment", "c_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        neg = pc.cast(pc.less(_cents(t["c_acctbal"]), 0), pa.int64())
        tb = pa.table({"segment": t["c_mktsegment"], "neg": neg})
        g = tb.group_by("segment").aggregate([("neg", "sum"), ([], "count_all")])
        return g.rename_columns(["segment", "n_neg", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("segment")
        .aggregate(Sum("n_neg", alias_name="n_negative"), Sum("n", alias_name="n_customers"))
        .to_pandas()
        .sort_values("segment", kind="mergesort")
    )
    ppm = cells["n_negative"].astype("int64") * 1_000_000 // cells["n_customers"].astype("int64")
    return pa.table(
        {
            "segment": pa.array(cells["segment"]),
            "n_customers": pa.array(cells["n_customers"].astype("int64")),
            "n_negative": pa.array(cells["n_negative"].astype("int64")),
            "negative_ppm": pa.array(ppm.astype("int64")),
        }
    )


CUSTOMER_NEGATIVE_BALANCE_BY_SEGMENT_SQL = """
SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
       CAST(SUM(CASE WHEN CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) < 0
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS negative_ppm
FROM customer GROUP BY 1 ORDER BY 1
"""


def lineitem_discount_tax_grid(sf_dir: str):
    """JOINT categorical profile of the two rate columns: line count and
    revenue cents per (discount %, tax %) cell — the 2-D contingency shape
    (~11×9 cells) built from block-local pyarrow partials and one tiny
    groupby.  Rates land on an exact percent grid, so the keys are the cents
    kernel applied to the rates (0.04 → 4), tie-free integers."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_discount", "l_tax", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "disc_pct": _cents(t["l_discount"]),
                "tax_pct": _cents(t["l_tax"]),
                "cents": _cents(t["l_extendedprice"]),
            }
        )
        g = tb.group_by(["disc_pct", "tax_pct"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["disc_pct", "tax_pct", "cents", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["disc_pct", "tax_pct"])
        .aggregate(Sum("cents", alias_name="revenue_cents"), Sum("n", alias_name="n_lines"))
        .sort(["disc_pct", "tax_pct"])
    )


LINEITEM_DISCOUNT_TAX_GRID_SQL = """
SELECT CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) AS disc_pct,
       CAST(FLOOR(l_tax*100 + 0.5) AS BIGINT) AS tax_pct,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
"""


def part_brand_type_agg(sf_dir: str):
    """Grouped LIST AGGREGATION (SQL string_agg/LISTAGG): per brand, the
    sorted-distinct catalogue of part types as one CSV string plus the type
    count.  Block partials emit distinct (brand, type) pairs only (the
    pyarrow empty-aggregate DISTINCT idiom), the groupby sees ≤ brands×types
    rows, and the CSV is assembled in the per-group kernel — list state never
    crosses the shuffle unaggregated."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_brand", "p_type"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["p_brand", "p_type"]).aggregate([])

    def agg(g: pa.Table) -> pa.Table:
        types = sorted(set(g["p_type"].to_pylist()))
        return pa.table(
            {
                "brand": pa.array([g["p_brand"][0].as_py()], pa.string()),
                "n_types": pa.array([len(types)], pa.int64()),
                "types_csv": pa.array([",".join(types)], pa.string()),
            }
        )

    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("p_brand")
        .map_groups(agg, batch_format="pyarrow")
        .sort(["brand"])
    )


PART_BRAND_TYPE_AGG_SQL = """
WITH d AS (SELECT DISTINCT p_brand, p_type FROM part)
SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_types,
       string_agg(p_type, ',' ORDER BY p_type) AS types_csv
FROM d GROUP BY 1 ORDER BY 1
"""


def orders_ship_span_hist(sf_dir: str):
    """Fulfilment-spread histogram: per order, the span in WEEKS between its
    first and last line shipment, rolled up to span_weeks → n_orders.
    Pre-aggregated min/max partials per block (never raw lines through the
    shuffle), one groupby merge, then integer week bucketing (µs // 7-day) —
    shipdates are midnight-aligned so the µs quotient equals calendar days."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["l_shipdate"], pa.timestamp("us")), pa.int64())
        tb = pa.table({"k": t["l_orderkey"], "us": us})
        g = tb.group_by("k").aggregate([("us", "min"), ("us", "max")])
        return g.rename_columns(["k", "lo", "hi"])

    def span_bucket(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        wk = (hi - lo) // (7 * 86_400_000_000)
        tb = pa.table({"span_weeks": pa.array(wk, pa.int64())})
        g = tb.group_by("span_weeks").aggregate([([], "count_all")])
        return g.rename_columns(["span_weeks", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
        .map_batches(span_bucket, batch_format="pyarrow")
        .groupby("span_weeks")
        .aggregate(Sum("n", alias_name="n_orders"))
        .sort(["span_weeks"])
    )


ORDERS_SHIP_SPAN_HIST_SQL = """
WITH s AS (
  SELECT l_orderkey,
         (epoch_us(max(l_shipdate)) - epoch_us(min(l_shipdate)))
           // CAST(604800000000 AS BIGINT) AS span_weeks
  FROM lineitem GROUP BY 1)
SELECT CAST(span_weeks AS BIGINT) AS span_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM s GROUP BY 1 ORDER BY 1
"""


def docs_simpson_diversity_by_lang(sf_dir: str):
    """Gini–Simpson token diversity per language, plus the inverse-Simpson
    'effective vocabulary size' — the RATIONAL diversity indices (unlike
    Shannon entropy they need no log, so exact integer parity holds):
    simpson_ppm = (n² − Σc²)·10⁶ // n², inv_simpson_ppm = n²·10⁶ // Σc².
    Block partials carry (lang, term, count) — O(vocab) per block — and the
    per-lang merge reduces to the two sufficient sums.  int64 bound:
    n²·10⁶ caps n at ~3e6 tokens per lang (fine through sf0.1; rescale to
    per-mille beyond)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        langs = t["lang"].combine_chunks().take(parents.filter(keep))
        tb = pa.table({"lang": langs, "term": flat})
        g = tb.group_by(["lang", "term"]).aggregate([("term", "count")])
        return g.rename_columns(["lang", "term", "cnt"])

    def merge(g: pa.Table) -> pa.Table:
        # re-merge per-block term partials, then reduce to (n, Σc²)
        m = (
            pa.table({"term": g["term"], "cnt": g["cnt"]})
            .group_by("term")
            .aggregate([("cnt", "sum")])
        )
        c = m["cnt_sum"].to_numpy(zero_copy_only=False)
        n = int(c.sum())
        sq = int(np.sum(c * c))
        return pa.table(
            {
                "lang": g["lang"].slice(0, 1),
                "n_tokens": pa.array([n], pa.int64()),
                "simpson_ppm": pa.array([(n * n - sq) * 1_000_000 // (n * n)], pa.int64()),
                "inv_simpson_ppm": pa.array([n * n * 1_000_000 // sq], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(merge, batch_format="pyarrow")
        .sort(["lang"])
    )


DOCS_SIMPSON_DIVERSITY_BY_LANG_SQL = """
WITH t AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents),
c AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2),
s AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt*cnt) AS BIGINT) AS sq
      FROM c GROUP BY 1)
SELECT lang, n AS n_tokens,
       CAST((n*n - sq) * 1000000 // (n*n) AS BIGINT) AS simpson_ppm,
       CAST(n*n * 1000000 // sq AS BIGINT) AS inv_simpson_ppm
FROM s ORDER BY lang
"""


def lineitem_ship_monotonicity(sf_dir: str):
    """Fulfilment-order audit: are an order's lines shipped in line-number
    order?  Per order, check the shipdate sequence (sorted by linenumber,
    shipdate-tiebroken: the data has duplicate (orderkey, linenumber) pairs)
    is non-decreasing; roll up to a single (n_orders, n_monotone, ppm) row.
    Monotonicity needs the whole group → one groupby(orderkey) with a
    vectorized diff kernel; the roll-up is a distributed Dataset.sum over
    per-order bits (never a driver row loop)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber", "l_shipdate"]
    )

    def mono(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("l_linenumber", "ascending"), ("l_shipdate", "ascending")],
            )
        )
        d = (
            s["l_shipdate"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        ok = bool(np.all(np.diff(d) >= 0))
        return pa.table(
            {
                "one": pa.array([1], pa.int64()),
                "mono": pa.array([1 if ok else 0], pa.int64()),
            }
        )

    agg = (
        ds.groupby("l_orderkey")
        .map_groups(mono, batch_format="pyarrow")
        .sum(["one", "mono"])
    )
    n, m = int(agg["sum(one)"]), int(agg["sum(mono)"])
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "n_monotone": pa.array([m], pa.int64()),
            "monotone_ppm": pa.array([m * 1_000_000 // n], pa.int64()),
        }
    )


LINEITEM_SHIP_MONOTONICITY_SQL = """
WITH o AS (
  SELECT l_orderkey,
         COALESCE(l_shipdate >= lag(l_shipdate)
                  OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_shipdate), TRUE)
           AS ok
  FROM lineitem),
m AS (SELECT l_orderkey, CASE WHEN bool_and(ok) THEN 1 ELSE 0 END AS mono
      FROM o GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(mono) AS BIGINT) AS n_monotone,
       CAST(SUM(mono) * 1000000 // COUNT(*) AS BIGINT) AS monotone_ppm
FROM m
"""


def region_balance_compare(sf_dir: str):
    """Two-sided dimension roll-up: supplier vs customer account balances
    aggregated to the REGION grain (supplier→nation→region and
    customer→nation→region), joined into one 5-row comparison with the
    exact cents delta.  Both fact scans are block-local partials keyed by
    regionkey through a broadcast 25-row nation→region map; the final join
    of two 5-row aggregates happens on the driver."""
    nat = rd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = rd.read_parquet(_t(sf_dir, "region")).to_pandas()
    n2r = dict(zip(nat["n_nationkey"].astype(int), nat["n_regionkey"].astype(int)))
    rname = dict(zip(reg["r_regionkey"].astype(int), reg["r_name"]))

    def make_partial(nk_col: str, bal_col: str):
        def partial(t: pa.Table) -> pa.Table:
            nk = t[nk_col].to_numpy(zero_copy_only=False).astype(np.int64)
            rk = np.array([n2r[int(k)] for k in np.unique(nk)], np.int64)
            lut = dict(zip(np.unique(nk).tolist(), rk.tolist()))
            rks = np.array([lut[int(k)] for k in nk], np.int64)
            tb = pa.table({"rk": pa.array(rks), "cents": _cents(t[bal_col])})
            g = tb.group_by("rk").aggregate([("cents", "sum"), ([], "count_all")])
            return g.rename_columns(["rk", "cents", "n"])

        return partial

    def roll(table: str, nk: str, bal: str):
        return (
            rd.read_parquet(_t(sf_dir, table), columns=[nk, bal])
            .map_batches(make_partial(nk, bal), batch_format="pyarrow")
            .groupby("rk")
            .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
            .to_pandas()
        )

    s = roll("supplier", "s_nationkey", "s_acctbal").set_index("rk")
    c = roll("customer", "c_nationkey", "c_acctbal").set_index("rk")
    keys = sorted(set(s.index) | set(c.index))
    return pa.table(
        {
            "region": pa.array([rname[int(k)] for k in keys], pa.string()),
            "n_suppliers": pa.array([int(s["n"].get(k, 0)) for k in keys], pa.int64()),
            "supplier_cents": pa.array([int(s["cents"].get(k, 0)) for k in keys], pa.int64()),
            "n_customers": pa.array([int(c["n"].get(k, 0)) for k in keys], pa.int64()),
            "customer_cents": pa.array([int(c["cents"].get(k, 0)) for k in keys], pa.int64()),
            "balance_delta_cents": pa.array(
                [int(c["cents"].get(k, 0)) - int(s["cents"].get(k, 0)) for k in keys],
                pa.int64(),
            ),
        }
    ).sort_by("region")


REGION_BALANCE_COMPARE_SQL = """
WITH s AS (
  SELECT n_regionkey AS rk, CAST(COUNT(*) AS BIGINT) AS ns,
         CAST(SUM(CAST(FLOOR(s_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
  FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY 1),
c AS (
  SELECT n_regionkey AS rk, CAST(COUNT(*) AS BIGINT) AS nc,
         CAST(SUM(CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT)) AS BIGINT) AS cc
  FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1)
SELECT r_name AS region,
       COALESCE(ns, 0) AS n_suppliers, COALESCE(sc, 0) AS supplier_cents,
       COALESCE(nc, 0) AS n_customers, COALESCE(cc, 0) AS customer_cents,
       COALESCE(cc, 0) - COALESCE(sc, 0) AS balance_delta_cents
FROM region
LEFT JOIN s ON r_regionkey = s.rk
LEFT JOIN c ON r_regionkey = c.rk
WHERE ns IS NOT NULL OR nc IS NOT NULL
ORDER BY 1
"""


def events_welch_ttest_weekend(sf_dir: str):
    """WELCH'S t-test: do weekend events carry different values than weekday
    events?  Sufficient statistics (n, Σc, Σc²) are exact integer cents per
    side from block partials; the t statistic is ONE fixed IEEE expression —
    t = (s₁/n₁ − s₂/n₂) / √(v₁/n₁ + v₂/n₂),
    vᵢ = (nᵢ·qᵢ − sᵢ²)/(nᵢ·(nᵢ−1)) — computed float-from-exact-ints with the
    products taken in DOUBLE (n·q exceeds int64 at large n) in the same
    operand order both sides, so bit parity holds (÷ and √ are correctly
    rounded).  Weekend = ISO dow 6/7."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(t["ts"]), 1)
        we = pc.cast(pc.greater_equal(dow, 6), pa.int64())
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        tb = pa.table(
            {
                "we": we,
                "n": pa.array(np.ones(len(c), np.int64)),
                "s": pa.array(c),
                "q": pa.array(c * c),
            }
        )
        g = tb.group_by("we").aggregate([("n", "sum"), ("s", "sum"), ("q", "sum")])
        return g.rename_columns(["we", "n", "s", "q"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("we")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("q", alias_name="q"))
        .to_pandas()
        .set_index("we")
    )

    def stats(w: int):
        return (
            int(cells["n"].get(w, 0)),
            int(cells["s"].get(w, 0)),
            int(cells["q"].get(w, 0)),
        )

    n1, s1, q1 = stats(1)
    n2, s2, q2 = stats(0)
    v1 = (float(n1) * float(q1) - float(s1) * float(s1)) / (float(n1) * (float(n1) - 1.0))
    v2 = (float(n2) * float(q2) - float(s2) * float(s2)) / (float(n2) * (float(n2) - 1.0))
    t_stat = (float(s1) / float(n1) - float(s2) / float(n2)) / np.sqrt(
        v1 / float(n1) + v2 / float(n2)
    )
    return pa.table(
        {
            "n_weekend": pa.array([n1], pa.int64()),
            "sum_weekend_cents": pa.array([s1], pa.int64()),
            "n_weekday": pa.array([n2], pa.int64()),
            "sum_weekday_cents": pa.array([s2], pa.int64()),
            "welch_t": pa.array([float(t_stat)], pa.float64()),
        }
    )


EVENTS_WELCH_TTEST_WEEKEND_SQL = """
WITH v AS (
  SELECT CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS we,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c
  FROM events),
g AS (SELECT we, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c*c) AS BIGINT) AS q
      FROM v GROUP BY 1),
w AS (SELECT n AS n1, s AS s1, q AS q1 FROM g WHERE we = 1),
d AS (SELECT n AS n2, s AS s2, q AS q2 FROM g WHERE we = 0)
SELECT n1 AS n_weekend, s1 AS sum_weekend_cents,
       n2 AS n_weekday, s2 AS sum_weekday_cents,
       (CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE)/CAST(n2 AS DOUBLE))
         / sqrt(
             ((CAST(n1 AS DOUBLE)*CAST(q1 AS DOUBLE)
               - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE))
              / (CAST(n1 AS DOUBLE)*(CAST(n1 AS DOUBLE) - 1e0)))
               / CAST(n1 AS DOUBLE)
             + ((CAST(n2 AS DOUBLE)*CAST(q2 AS DOUBLE)
                 - CAST(s2 AS DOUBLE)*CAST(s2 AS DOUBLE))
                / (CAST(n2 AS DOUBLE)*(CAST(n2 AS DOUBLE) - 1e0)))
               / CAST(n2 AS DOUBLE)
           ) AS welch_t
FROM w, d
"""


def part_brand_price_range_overlap(sf_dir: str):
    """Grouped-INTERVAL overlap: each brand's retail-price range [min, max]
    in cents, crossed into brand pairs with the exact overlap width
    max(0, min(hi)−max(lo)) — the range-vs-range join shape (≙ the interval
    family of ``events_interval_overlap``, lifted to per-group extrema).
    Extrema come from block partials + a 25-row groupby; the O(brands²)
    pair grid is driver-side by design (bounded dimension)."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"b": t["p_brand"], "c": _cents(t["p_retailprice"])})
        g = tb.group_by("b").aggregate([("c", "min"), ("c", "max")])
        return g.rename_columns(["b", "lo", "hi"])

    ext = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
        .to_pandas()
        .sort_values("b", kind="mergesort")
        .reset_index(drop=True)
    )
    rows = {"brand_a": [], "brand_b": [], "overlap_cents": []}
    for i in range(len(ext)):
        for j in range(i + 1, len(ext)):
            lo = max(int(ext["lo"][i]), int(ext["lo"][j]))
            hi = min(int(ext["hi"][i]), int(ext["hi"][j]))
            rows["brand_a"].append(ext["b"][i])
            rows["brand_b"].append(ext["b"][j])
            rows["overlap_cents"].append(max(0, hi - lo))
    return pa.table(
        {
            "brand_a": pa.array(rows["brand_a"], pa.string()),
            "brand_b": pa.array(rows["brand_b"], pa.string()),
            "overlap_cents": pa.array(rows["overlap_cents"], pa.int64()),
        }
    )


PART_BRAND_PRICE_RANGE_OVERLAP_SQL = """
WITH e AS (
  SELECT p_brand AS b,
         CAST(MIN(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS lo,
         CAST(MAX(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS hi
  FROM part GROUP BY 1)
SELECT a.b AS brand_a, c.b AS brand_b,
       CAST(GREATEST(0, LEAST(a.hi, c.hi) - GREATEST(a.lo, c.lo)) AS BIGINT)
         AS overlap_cents
FROM e a JOIN e c ON a.b < c.b
ORDER BY 1, 2
"""


def customer_balance_spend_spearman(sf_dir: str):
    """Cross-table SPEARMAN: rank correlation between a customer's account
    balance and their lifetime order spend (0 for never-ordered customers,
    via the broadcast-side default).  Spend is a fact-side cents aggregate;
    balance joins in as a broadcast dim array; ranks use the same centered
    doubled-average-rank integer trick as ``lineitem_spearman_by_flag``
    (Σe² ≤ 4n³ — safe through ~1.3e6 customers)."""
    spend = (
        rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: pa.table({"c": t["o_custkey"], "s": _cents(t["o_totalprice"])})
            .group_by("c")
            .aggregate([("s", "sum")])
            .rename_columns(["c", "s"]),
            batch_format="pyarrow",
        )
        .groupby("c")
        .aggregate(Sum("s", alias_name="spend"))
        .to_pandas()
        .set_index("c")["spend"]
    )
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_acctbal"])
    bal_tbl = cust.map_batches(
        lambda t: pa.table({"k": t["c_custkey"], "bal": _cents(t["c_acctbal"])}),
        batch_format="pyarrow",
    ).to_pandas()
    bal = bal_tbl["bal"].to_numpy(np.int64)
    sp = (
        bal_tbl["k"].map(spend).fillna(0).astype("int64").to_numpy(np.int64)
    )

    def _centered_doubled_ranks(v: np.ndarray) -> np.ndarray:
        n = len(v)
        uniq, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
        minrank = np.r_[0, np.cumsum(cnt)[:-1]] + 1
        doubled = 2 * minrank + cnt - 1
        return doubled[inv] - (n + 1)

    ex = _centered_doubled_ranks(bal)
    ey = _centered_doubled_ranks(sp)
    sxy, sxx, syy = (
        int(np.sum(ex * ey)),
        int(np.sum(ex * ex)),
        int(np.sum(ey * ey)),
    )
    rho = float(sxy) / (np.sqrt(float(sxx)) * np.sqrt(float(syy)))
    return pa.table(
        {
            "n_customers": pa.array([len(bal)], pa.int64()),
            "spearman_rho": pa.array([rho], pa.float64()),
        }
    )


CUSTOMER_BALANCE_SPEND_SPEARMAN_SQL = """
WITH sp AS (
  SELECT o_custkey AS c,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS spend
  FROM orders GROUP BY 1),
v AS (
  SELECT CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS bal,
         COALESCE(sp.spend, 0) AS spend
  FROM customer LEFT JOIN sp ON c_custkey = sp.c),
r AS (
  SELECT 2*RANK() OVER (ORDER BY bal) + COUNT(*) OVER (PARTITION BY bal) - 1
           - (COUNT(*) OVER () + 1) AS ex,
         2*RANK() OVER (ORDER BY spend) + COUNT(*) OVER (PARTITION BY spend) - 1
           - (COUNT(*) OVER () + 1) AS ey
  FROM v)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(ex*ey) AS DOUBLE)
         / (sqrt(CAST(SUM(ex*ex) AS DOUBLE)) * sqrt(CAST(SUM(ey*ey) AS DOUBLE)))
         AS spearman_rho
FROM r
"""


def lineitem_kruskal_wallis_returnflag(sf_dir: str):
    """Exact Kruskal–Wallis H across the three returnflag groups (A/N/R) on
    l_extendedprice — the k-group generalization of
    ``lineitem_mannwhitney_returnflag``, sharing its bounded per-value
    partial layout.  Midranks use the DOUBLED rank-sum identity
    R2_g = Σ_v g_v·(2C_v + c_v + 1) (exact int64, ≤ N(2N+1)); H is then ONE
    fixed IEEE expression 3·(Σ_g R2_g²/n_g)/(N(N+1)) − 3(N+1) evaluated in
    the identical association order by DuckDB (R2² exceeds int64 so the
    squares live in float — each product/divide is a single correctly
    rounded op on exact-int inputs)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_extendedprice", "l_returnflag"]
    )

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "p": _cents(t["l_extendedprice"]),
                "a": pc.cast(pc.equal(t["l_returnflag"], "A"), pa.int64()),
                "nn": pc.cast(pc.equal(t["l_returnflag"], "N"), pa.int64()),
                "r": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64()),
            }
        )
        g = tb.group_by("p").aggregate([("a", "sum"), ("nn", "sum"), ("r", "sum")])
        return g.rename_columns(["p", "a", "nn", "r"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(
            Sum("a", alias_name="a"),
            Sum("nn", alias_name="nn"),
            Sum("r", alias_name="r"),
        )
        .to_pandas()
        .sort_values("p", kind="mergesort")
    )
    a = agg["a"].to_numpy().astype(np.int64)
    nn = agg["nn"].to_numpy().astype(np.int64)
    r = agg["r"].to_numpy().astype(np.int64)
    c_v = a + nn + r
    c_before = c_v.cumsum() - c_v
    w = 2 * c_before + c_v + 1
    n_a, n_n, n_r = int(a.sum()), int(nn.sum()), int(r.sum())
    r2_a, r2_n, r2_r = int((a * w).sum()), int((nn * w).sum()), int((r * w).sum())
    n = n_a + n_n + n_r
    t_sum = (
        float(r2_a) * float(r2_a) / float(n_a)
        + float(r2_n) * float(r2_n) / float(n_n)
        + float(r2_r) * float(r2_r) / float(n_r)
    )
    kw_h = 3.0 * t_sum / (float(n) * float(n + 1)) - 3.0 * float(n + 1)
    return pa.table(
        {
            "n_total": pa.array([n], pa.int64()),
            "n_a": pa.array([n_a], pa.int64()),
            "n_n": pa.array([n_n], pa.int64()),
            "n_r": pa.array([n_r], pa.int64()),
            "r2_a": pa.array([r2_a], pa.int64()),
            "r2_n": pa.array([r2_n], pa.int64()),
            "r2_r": pa.array([r2_r], pa.int64()),
            "kw_h": pa.array([kw_h], pa.float64()),
        }
    )


LINEITEM_KRUSKAL_WALLIS_RETURNFLAG_SQL = """
WITH v AS (
  SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS p,
         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS a,
         CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS nn,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem),
c AS (SELECT p, CAST(SUM(a) AS BIGINT) AS a, CAST(SUM(nn) AS BIGINT) AS nn,
             CAST(SUM(r) AS BIGINT) AS r, CAST(COUNT(*) AS BIGINT) AS c_v
      FROM v GROUP BY 1),
s AS (SELECT a, nn, r, c_v,
             CAST(SUM(c_v) OVER (ORDER BY p) AS BIGINT) - c_v AS c_before
      FROM c),
g AS (SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(nn) AS BIGINT) AS n_n,
             CAST(SUM(r) AS BIGINT) AS n_r,
             CAST(SUM(a*(2*c_before + c_v + 1)) AS BIGINT) AS r2_a,
             CAST(SUM(nn*(2*c_before + c_v + 1)) AS BIGINT) AS r2_n,
             CAST(SUM(r*(2*c_before + c_v + 1)) AS BIGINT) AS r2_r
      FROM s)
SELECT n_a + n_n + n_r AS n_total, n_a, n_n, n_r, r2_a, r2_n, r2_r,
       3e0*(CAST(r2_a AS DOUBLE)*CAST(r2_a AS DOUBLE)/CAST(n_a AS DOUBLE)
          + CAST(r2_n AS DOUBLE)*CAST(r2_n AS DOUBLE)/CAST(n_n AS DOUBLE)
          + CAST(r2_r AS DOUBLE)*CAST(r2_r AS DOUBLE)/CAST(n_r AS DOUBLE))
         / (CAST(n_a+n_n+n_r AS DOUBLE) * CAST(n_a+n_n+n_r+1 AS DOUBLE))
       - 3e0*CAST(n_a+n_n+n_r+1 AS DOUBLE) AS kw_h
FROM g
"""


def part_red_revenue_by_nation_year(sf_dir: str):
    """TPC-H Q9-shape product-line profit rollup (no partsupp table in this
    corpus, so revenue stands in for profit): revenue from lineitems whose
    part name contains 'red', by supplier nation × ship year.  Ray plan: the
    part side is a predicate-filtered key scan broadcast as a SORTED numpy
    array (np.isin via searchsorted; at 100 TB this side flips to the Bloom
    route of stages/broadcast.py), supplier→nation is a broadcast dim map,
    so the whole 4-table star collapses into ONE shuffle-free lineitem pass
    of block-local partials + a tiny (nation, year) groupby."""
    part = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_name"])
    pk = (
        part.map_batches(
            lambda t: t.filter(pc.match_substring(t["p_name"], "red")).select(
                ["p_partkey"]
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["p_partkey"]
        .to_numpy(np.int64)
    )
    pk = np.sort(pk)
    sup = rd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nat = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    s2n = {
        int(k): nmap[int(v)]
        for k, v in zip(sup["s_suppkey"], sup["s_nationkey"])
    }
    pk_ref, s2n_ref = ray.put(pk), ray.put(s2n)

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, lp)
        idx[idx == len(keys)] = 0
        mask = keys[idx] == lp
        t = t.filter(pa.array(mask))
        if t.num_rows == 0:
            return pa.table(
                {
                    "nation": pa.array([], pa.string()),
                    "ship_year": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                }
            )
        smap = ray.get(s2n_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        tb = pa.table(
            {
                "nation": pa.array([smap[int(k)] for k in sk], pa.string()),
                "ship_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "revenue_cents": _cents(rev),
                "n_lines": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["nation", "ship_year"]).aggregate(
            [("revenue_cents", "sum"), ("n_lines", "sum")]
        )
        return g.rename_columns(["nation", "ship_year", "revenue_cents", "n_lines"])

    return (
        rd.read_parquet(
            _t(sf_dir, "lineitem"),
            columns=[
                "l_partkey",
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["nation", "ship_year"])
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_lines", alias_name="n_lines"),
        )
    )


PART_RED_REVENUE_BY_NATION_YEAR_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def customer_acctbal_anova(sf_dir: str):
    """One-way ANOVA of account balance across market segments, reported as
    an integer-exact F statistic in milli-units: all sufficient statistics
    (n_g, Σcents_g, Σcents²_g) are exact int64 block partials; the
    between/within decomposition uses truncating integer division on
    arbitrary-precision Python ints on the driver (mirrored by DuckDB
    HUGEINT `//`, which truncates toward zero — every numerator here is
    nonnegative so trunc == floor), so f_milli can never drift a ULP."""
    ds = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_mktsegment", "c_acctbal"]
    )

    def partial(t: pa.Table) -> pa.Table:
        b = _cents(t["c_acctbal"])
        b2 = pc.multiply(b, b)
        tb = pa.table({"seg": t["c_mktsegment"], "n": pa.array(np.ones(t.num_rows, np.int64)), "s": b, "q": b2})
        g = tb.group_by("seg").aggregate([("n", "sum"), ("s", "sum"), ("q", "sum")])
        return g.rename_columns(["seg", "n", "s", "q"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("seg")
        .aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("q", alias_name="q")
        )
        .to_pandas()
    )
    n = int(agg["n"].sum())
    s = int(agg["s"].sum())
    q = sum(int(x) for x in agg["q"])  # Python ints: immune to int64 wrap
    k = len(agg)
    tt = sum(int(sg) * int(sg) // int(ng) for sg, ng in zip(agg["s"], agg["n"]))
    ssb = max(tt - s * s // n, 0)
    ssw = q - tt
    f_milli = ssb * (n - k) * 1000 // (ssw * (k - 1))
    return pa.table(
        {
            "n_customers": pa.array([n], pa.int64()),
            "k_segments": pa.array([k], pa.int64()),
            "f_milli": pa.array([f_milli], pa.int64()),
        }
    )


CUSTOMER_ACCTBAL_ANOVA_SQL = """
WITH v AS (
  SELECT c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS b
  FROM customer),
g AS (SELECT seg, CAST(COUNT(*) AS HUGEINT) AS n_g,
             CAST(SUM(b) AS HUGEINT) AS s_g,
             CAST(SUM(CAST(b AS HUGEINT)*b) AS HUGEINT) AS q_g
      FROM v GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS k, SUM(n_g) AS n, SUM(s_g) AS s,
             SUM(q_g) AS q, SUM(s_g*s_g // n_g) AS tt
      FROM g)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(k AS BIGINT) AS k_segments,
       CAST(GREATEST(tt - s*s//n, 0) * (n-k) * 1000
            // ((q - tt) * (k-1)) AS BIGINT) AS f_milli
FROM t
"""


def customer_balance_spend_kendall(sf_dir: str):
    """Kendall τ-b between account balance and lifetime spend — the
    inversion-counting sibling of ``customer_balance_spend_spearman`` (same
    fact-side cents aggregate + broadcast dim array).  S = P−Q comes from an
    O(n log n) bottom-up vectorized merge (np.searchsorted per run pair
    counts cross-run discordances; within-run pairs share x and contribute
    0), tie corrections are exact Σt(t−1)/2 ints, and τ-b is the same fixed
    √·√ IEEE expression DuckDB evaluates — the oracle cross-checks S against
    a literal pairwise SIGN·SIGN self-join."""
    spend = (
        rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: pa.table({"c": t["o_custkey"], "s": _cents(t["o_totalprice"])})
            .group_by("c")
            .aggregate([("s", "sum")])
            .rename_columns(["c", "s"]),
            batch_format="pyarrow",
        )
        .groupby("c")
        .aggregate(Sum("s", alias_name="spend"))
        .to_pandas()
        .set_index("c")["spend"]
    )
    bal_tbl = (
        rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_acctbal"])
        .map_batches(
            lambda t: pa.table({"k": t["c_custkey"], "bal": _cents(t["c_acctbal"])}),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    x = bal_tbl["bal"].to_numpy(np.int64)
    y = bal_tbl["k"].map(spend).fillna(0).astype("int64").to_numpy(np.int64)
    n = len(x)

    order = np.lexsort((y, x))
    ys = y[order]

    def _count_inversions(a: np.ndarray) -> int:
        inv, width = 0, 1
        a = a.copy()
        while width < len(a):
            for lo in range(0, len(a) - width, 2 * width):
                mid, hi = lo + width, min(lo + 2 * width, len(a))
                left, right = a[lo:mid], a[mid:hi]
                # pairs (l in left, r in right) with l > r are discordant
                inv += int(
                    (len(left) - np.searchsorted(left, right, side="right")).sum()
                )
                a[lo:hi] = np.concatenate([left, right])[
                    np.argsort(np.concatenate([left, right]), kind="stable")
                ]
            width *= 2
        return inv

    disc = _count_inversions(ys)

    def _tie_term(v: np.ndarray) -> int:
        _, cnt = np.unique(v, return_counts=True)
        return int((cnt.astype(object) * (cnt - 1) // 2).sum())

    n0 = n * (n - 1) // 2
    n1 = _tie_term(x)
    n2 = _tie_term(y)
    # joint-tie key: spend is nonnegative and < 2^40 cents, so the packing
    # is injective even for negative balances
    xy = x.astype(object) * (1 << 40) + y
    n3 = _tie_term(xy)
    s_num = n0 - n1 - n2 + n3 - 2 * disc
    tau_b = float(s_num) / (np.sqrt(float(n0 - n1)) * np.sqrt(float(n0 - n2)))
    return pa.table(
        {
            "n_customers": pa.array([n], pa.int64()),
            "s_num": pa.array([s_num], pa.int64()),
            "kendall_tau_b": pa.array([tau_b], pa.float64()),
        }
    )


CUSTOMER_BALANCE_SPEND_KENDALL_SQL = """
WITH sp AS (
  SELECT o_custkey AS c,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS spend
  FROM orders GROUP BY 1),
v AS (
  SELECT c_custkey AS k,
         CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS bal,
         COALESCE(sp.spend, 0) AS spend
  FROM customer LEFT JOIN sp ON c_custkey = sp.c),
s AS (
  SELECT CAST(SUM(SIGN(a.bal - b.bal) * SIGN(a.spend - b.spend)) AS BIGINT)
           AS s_num
  FROM v a JOIN v b ON a.k < b.k),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*)*(COUNT(*)-1)//2 AS BIGINT) AS n0
  FROM v),
tx AS (SELECT CAST(SUM(c*(c-1)//2) AS BIGINT) AS n1
       FROM (SELECT COUNT(*) AS c FROM v GROUP BY bal)),
ty AS (SELECT CAST(SUM(c*(c-1)//2) AS BIGINT) AS n2
       FROM (SELECT COUNT(*) AS c FROM v GROUP BY spend))
SELECT t.n AS n_customers, s.s_num,
       CAST(s.s_num AS DOUBLE)
         / (sqrt(CAST(t.n0 - tx.n1 AS DOUBLE)) * sqrt(CAST(t.n0 - ty.n2 AS DOUBLE)))
         AS kendall_tau_b
FROM s, t, tx, ty
"""


def orders_lorenz_deciles(sf_dir: str):
    """Lorenz curve of order value concentration: for each population decile
    of orders (cheapest first), the cumulative share of total order value in
    exact ppm.  The same bounded per-value partial layout as the rank-stat
    family (cents value → count partials, merged by one tiny groupby); the
    driver walks the sorted value grid with arbitrary-precision Python ints
    (prefix·1e6 can pass int64 at large SF), slicing tie groups at the exact
    integer positions m_k = k·n//10 — positions inside a tie group are exact
    because every tied order contributes the identical value."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "p": _cents(t["o_totalprice"]),
                "cnt": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("p").aggregate([("cnt", "sum")])
        return g.rename_columns(["p", "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("p", kind="mergesort")
    )
    vals = agg["p"].to_numpy(np.int64)
    cnt = agg["cnt"].to_numpy(np.int64)
    cum_cnt = cnt.cumsum()
    n = int(cum_cnt[-1])
    tot = sum(int(v) * int(c) for v, c in zip(vals, cnt))
    deciles, n_inc, share = [], [], []
    for k in range(1, 11):
        m = k * n // 10
        i = int(np.searchsorted(cum_cnt, m, side="left"))
        before_cnt = int(cum_cnt[i - 1]) if i > 0 else 0
        prefix = sum(int(v) * int(c) for v, c in zip(vals[:i], cnt[:i]))
        prefix += (m - before_cnt) * int(vals[i]) if m > before_cnt else 0
        deciles.append(k)
        n_inc.append(m)
        share.append(prefix * 1_000_000 // tot)
    return pa.table(
        {
            "decile": pa.array(deciles, pa.int64()),
            "n_included": pa.array(n_inc, pa.int64()),
            "cum_share_ppm": pa.array(share, pa.int64()),
        }
    )


ORDERS_LORENZ_DECILES_SQL = """
WITH v AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS p FROM orders),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(CAST(p AS HUGEINT)) AS HUGEINT) AS tot FROM v),
c AS (SELECT p, ROW_NUMBER() OVER (ORDER BY p) AS rn,
             SUM(CAST(p AS HUGEINT)) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
      FROM v),
d AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS decile)
SELECT d.decile,
       CAST(d.decile * t.n // 10 AS BIGINT) AS n_included,
       CAST(c.cs * 1000000 // t.tot AS BIGINT) AS cum_share_ppm
FROM d CROSS JOIN t JOIN c ON c.rn = d.decile * t.n // 10
"""


def supplier_customer_balance_ks(sf_dir: str):
    """Cross-TABLE two-sample Kolmogorov–Smirnov: do supplier and customer
    account balances come from the same distribution?  Each side contributes
    per-value indicator partials (the union of two reads — same per-value
    layout as ``lineitem_ks_returnflag`` but across heterogeneous tables);
    the driver pass over the bounded cents grid takes
    D_num = max_v |cumS(v)·n_c − cumC(v)·n_s| exactly — no float ever
    enters, the ppm is truncating integer division on both sides."""
    su = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "b": _cents(t["s_acctbal"]),
                "s": pa.array(np.ones(t.num_rows, np.int64)),
                "c": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    cu = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_acctbal"]).map_batches(
        lambda t: pa.table(
            {
                "b": _cents(t["c_acctbal"]),
                "s": pa.array(np.zeros(t.num_rows, np.int64)),
                "c": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    agg = (
        su.union(cu)
        .groupby("b")
        .aggregate(Sum("s", alias_name="s"), Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("b", kind="mergesort")
    )
    cs = agg["s"].to_numpy(np.int64).cumsum()
    cc = agg["c"].to_numpy(np.int64).cumsum()
    n_s, n_c = int(cs[-1]), int(cc[-1])
    d_num = int(np.abs(cs * n_c - cc * n_s).max())
    return pa.table(
        {
            "n_suppliers": pa.array([n_s], pa.int64()),
            "n_customers": pa.array([n_c], pa.int64()),
            "d_num": pa.array([d_num], pa.int64()),
            "d_ppm": pa.array([d_num * 1_000_000 // (n_s * n_c)], pa.int64()),
        }
    )


SUPPLIER_CUSTOMER_BALANCE_KS_SQL = """
WITH u AS (
  SELECT CAST(FLOOR(s_acctbal*100 + 0.5) AS BIGINT) AS b, 1 AS s, 0 AS c
  FROM supplier
  UNION ALL
  SELECT CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS b, 0 AS s, 1 AS c
  FROM customer),
g AS (SELECT b, CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(c) AS BIGINT) AS c
      FROM u GROUP BY 1),
w AS (SELECT CAST(SUM(s) OVER (ORDER BY b) AS BIGINT) AS cs,
             CAST(SUM(c) OVER (ORDER BY b) AS BIGINT) AS cc
      FROM g),
t AS (SELECT CAST(SUM(s) AS BIGINT) AS ns, CAST(SUM(c) AS BIGINT) AS nc FROM u)
SELECT ns AS n_suppliers, nc AS n_customers,
       CAST(MAX(ABS(cs*nc - cc*ns)) AS BIGINT) AS d_num,
       CAST(MAX(ABS(cs*nc - cc*ns)) * 1000000 // (ns*nc) AS BIGINT) AS d_ppm
FROM w, t GROUP BY ns, nc
"""


def events_daily_dispersion(sf_dir: str):
    """Poisson overdispersion check: the variance-to-mean ratio of DAILY
    event counts in exact ppm.  Block-local per-day count partials → one
    tiny day groupby; the dispersion index is pure integer arithmetic on the
    driver (((n·Q − S²)·10⁶) // (S·(n−1)), every factor nonnegative so
    Python floor == DuckDB HUGEINT trunc)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "d": pc.floor_temporal(t["ts"], unit="day"),
                "cnt": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("d").aggregate([("cnt", "sum")])
        return g.rename_columns(["d", "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    c = [int(x) for x in agg["cnt"]]
    n, s, q = len(c), sum(c), sum(x * x for x in c)
    vmr_ppm = (n * q - s * s) * 1_000_000 // (s * (n - 1))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "n_events": pa.array([s], pa.int64()),
            "vmr_ppm": pa.array([vmr_ppm], pa.int64()),
        }
    )


EVENTS_DAILY_DISPERSION_SQL = """
WITH d AS (SELECT CAST(COUNT(*) AS HUGEINT) AS c
           FROM events GROUP BY CAST(ts AS DATE)),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(c) AS s, SUM(c*c) AS q FROM d)
SELECT CAST(n AS BIGINT) AS n_days, CAST(s AS BIGINT) AS n_events,
       CAST((n*q - s*s) * 1000000 // (s*(n-1)) AS BIGINT) AS vmr_ppm
FROM t
"""


def orders_bowley_skewness(sf_dir: str):
    """Quartile (Bowley) skewness of order value — reported as the exact
    integer numerator Q1+Q3−2·Q2 and denominator Q3−Q1 in cents (a ratio of
    possibly-negative ints would hit the Python-floor vs DuckDB-trunc
    division split, so the division is left to the reader).  Quartiles use
    the quantile_disc convention sorted[⌈q·n⌉−1] on the bounded per-value
    cents grid — same partial layout as the rank-stat family."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "p": _cents(t["o_totalprice"]),
                "cnt": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("p").aggregate([("cnt", "sum")])
        return g.rename_columns(["p", "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("p", kind="mergesort")
    )
    vals = agg["p"].to_numpy(np.int64)
    cum = agg["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])

    def qd(q: float) -> int:
        m = -(-int(q * 4 * n) // 4)  # ceil(q*n) with q in {.25,.5,.75} exact
        return int(vals[np.searchsorted(cum, m, side="left")])

    q1, q2, q3 = qd(0.25), qd(0.5), qd(0.75)
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "q1_cents": pa.array([q1], pa.int64()),
            "q2_cents": pa.array([q2], pa.int64()),
            "q3_cents": pa.array([q3], pa.int64()),
            "bowley_num_cents": pa.array([q1 + q3 - 2 * q2], pa.int64()),
            "bowley_den_cents": pa.array([q3 - q1], pa.int64()),
        }
    )


ORDERS_BOWLEY_SKEWNESS_SQL = """
WITH v AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS p FROM orders),
q AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             quantile_disc(p, 0.25) AS q1, quantile_disc(p, 0.5) AS q2,
             quantile_disc(p, 0.75) AS q3
      FROM v)
SELECT n AS n_orders, q1 AS q1_cents, q2 AS q2_cents, q3 AS q3_cents,
       CAST(q1 + q3 - 2*q2 AS BIGINT) AS bowley_num_cents,
       CAST(q3 - q1 AS BIGINT) AS bowley_den_cents
FROM q
"""


def lineitem_quantity_cpk(sf_dir: str):
    """Statistical-process-control capability index Cpk for line quantities
    against spec limits [1, 50] (in centi-units): exact int64 sufficient
    stats (n, Σ, Σ²) from block partials, then ONE fixed IEEE expression —
    µ = S/n, σ = √((Q − S·S/n)/(n−1)), Cpk = min((USL−µ)/(3σ), (µ−LSL)/(3σ))
    — written with e0 literals so DuckDB types every constant DOUBLE and
    both engines execute the identical correctly-rounded op sequence."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        v = _cents(t["l_quantity"])
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([pc.sum(v).as_py() or 0], pa.int64()),
                "q": pa.array([pc.sum(pc.multiply(v, v)).as_py() or 0], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(["n", "s", "q"])
    n, s, q = int(agg["sum(n)"]), int(agg["sum(s)"]), int(agg["sum(q)"])
    mu = float(s) / float(n)
    sigma = np.sqrt(
        (float(q) - float(s) * float(s) / float(n)) / float(n - 1)
    )
    cpu = (5000.0 - mu) / (3.0 * sigma)
    cpl = (mu - 100.0) / (3.0 * sigma)
    return pa.table(
        {
            "n_lines": pa.array([n], pa.int64()),
            "sum_centi": pa.array([s], pa.int64()),
            "sumsq_centi": pa.array([q], pa.int64()),
            "cpk": pa.array([min(cpu, cpl)], pa.float64()),
        }
    )


LINEITEM_QUANTITY_CPK_SQL = """
WITH t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)
                * CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem),
e AS (SELECT n, s, q,
             CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
             sqrt((CAST(q AS DOUBLE)
                   - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                  / CAST(n-1 AS DOUBLE)) AS sigma
      FROM t)
SELECT n AS n_lines, s AS sum_centi, q AS sumsq_centi,
       LEAST((5000e0 - mu)/(3e0*sigma), (mu - 100e0)/(3e0*sigma)) AS cpk
FROM e
"""


def orders_priority_wasserstein(sf_dir: str):
    """1-D optimal transport: the exact Wasserstein-1 (earth mover's)
    distance between the order-value distributions of '1-URGENT' and
    '5-LOW', computed on the bounded per-value cents grid as
    Σ_i |cumA_i·n_b − cumB_i·n_a|·(v_{i+1}−v_i) // (n_a·n_b) — pure integer
    (arbitrary precision on the driver, HUGEINT in DuckDB), so the EMD in
    cents can never drift.  Same per-value indicator partials as the KS/MWU
    family; the grid walk is a driver pass over ≤|price grid| rows."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_totalprice", "o_orderpriority"]
    )
    prios = pa.array(["1-URGENT", "5-LOW"], pa.string())

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["o_orderpriority"], value_set=prios))
        tb = pa.table(
            {
                "p": _cents(t["o_totalprice"]),
                "a": pc.cast(pc.equal(t["o_orderpriority"], "1-URGENT"), pa.int64()),
                "b": pc.cast(pc.equal(t["o_orderpriority"], "5-LOW"), pa.int64()),
            }
        )
        g = tb.group_by("p").aggregate([("a", "sum"), ("b", "sum")])
        return g.rename_columns(["p", "a", "b"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
        .to_pandas()
        .sort_values("p", kind="mergesort")
    )
    vals = [int(x) for x in agg["p"]]
    ca = agg["a"].to_numpy(np.int64).cumsum()
    cb = agg["b"].to_numpy(np.int64).cumsum()
    n_a, n_b = int(ca[-1]), int(cb[-1])
    w1 = 0
    for i in range(len(vals) - 1):
        w1 += abs(int(ca[i]) * n_b - int(cb[i]) * n_a) * (vals[i + 1] - vals[i])
    return pa.table(
        {
            "n_urgent": pa.array([n_a], pa.int64()),
            "n_low": pa.array([n_b], pa.int64()),
            "w1_cents": pa.array([w1 // (n_a * n_b)], pa.int64()),
        }
    )


ORDERS_PRIORITY_WASSERSTEIN_SQL = """
WITH v AS (
  SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS p,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a,
         CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS b
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
g AS (SELECT p, CAST(SUM(a) AS HUGEINT) AS a, CAST(SUM(b) AS HUGEINT) AS b
      FROM v GROUP BY 1),
w AS (SELECT SUM(a) OVER (ORDER BY p) AS ca, SUM(b) OVER (ORDER BY p) AS cb,
             LEAD(p) OVER (ORDER BY p) - p AS gap
      FROM g),
t AS (SELECT CAST(SUM(a) AS HUGEINT) AS na, CAST(SUM(b) AS HUGEINT) AS nb FROM v)
SELECT CAST(na AS BIGINT) AS n_urgent, CAST(nb AS BIGINT) AS n_low,
       CAST(SUM(ABS(ca*nb - cb*na) * gap) // (na*nb) AS BIGINT) AS w1_cents
FROM w, t WHERE gap IS NOT NULL GROUP BY na, nb
"""


def embeddings_silhouette(sf_dir: str):
    """Per-point silhouette coefficient on SQUARED Euclidean distance over
    µ-unit-quantized vectors — no pairwise pass anywhere: because
    Σ_j d²(i,j) = n_c·|q_i|² + Σ_c|q_j|² − 2·q_i·Σ_c q_j, one per-label
    (count, Σ|q|², Σq-vector) statistics table (|labels|·d ints, broadcast)
    turns silhouette into a vectorized per-point map.  a/b are single
    correctly-rounded divisions of exact ints; the (b−a)/max(a,b) float is
    the same fixed expression DuckDB evaluates."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"))

    def stats_partial(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lab) == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sv": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "ssq": pa.array([], pa.int64()),
                }
            )
        q = np.floor(_vecs(t, "embedding") * 1_000_000 + 0.5).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, q)
        ssq = np.zeros(len(uniq), np.int64)
        np.add.at(ssq, inv, (q * q).sum(axis=1))
        counts = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "sv": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
                "ssq": pa.array(np.repeat(ssq, d), pa.int64()),
            }
        )

    st = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(
            Sum("sv", alias_name="sv"),
            Sum("n", alias_name="n"),
            Sum("ssq", alias_name="ssq"),
        )
        .to_pandas()
        .sort_values(["label", "dim"], kind="mergesort")
    )
    labels = st["label"].unique()
    d = int(st["dim"].max()) + 1
    sv = st["sv"].to_numpy(np.int64).reshape(len(labels), d)
    # every (label, dim) row carries the full per-label count/ssq (repeated
    # across dims inside each block partial), so `first` per label is exact
    n_c = st.groupby("label")["n"].first().loc[labels].to_numpy(np.int64)
    ssq_c = st.groupby("label")["ssq"].first().loc[labels].to_numpy(np.int64)
    stats_ref = ray.put((np.asarray(labels, np.int64), n_c, sv, ssq_c))

    def score(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        labs, nc, svm, ssqc = ray.get(stats_ref)
        q = np.floor(_vecs(t, "embedding") * 1_000_000 + 0.5).astype(np.int64)
        own = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        qq = (q * q).sum(axis=1)  # |q_i|²
        # S[i, c] = n_c·|q_i|² + ssq_c − 2·q_i·sv_c  (exact int64 algebra)
        dots = q @ svm.T
        s_ic = np.outer(qq, nc) + ssqc[None, :] - 2 * dots
        own_idx = np.searchsorted(labs, own)
        rows = np.arange(len(own))
        a_num = s_ic[rows, own_idx]
        a_den = nc[own_idx] - 1
        a = a_num.astype(np.float64) / a_den.astype(np.float64)
        mean_other = s_ic.astype(np.float64) / nc.astype(np.float64)[None, :]
        mean_other[rows, own_idx] = np.inf
        b = mean_other.min(axis=1)
        mx = np.maximum(a, b)
        sil = np.where(
            (a_den == 0) | (mx == 0.0), 0.0, (b - a) / np.where(mx == 0, 1, mx)
        )
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "label": pc.cast(t["label"], pa.int64()),
                "silhouette": pa.array(sil, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


EMBEDDINGS_SILHOUETTE_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5) AS BIGINT) AS q,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim
  FROM embeddings),
ls AS (SELECT label, dim, CAST(SUM(q) AS BIGINT) AS sv FROM ex GROUP BY 1, 2),
lc AS (SELECT label, CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n,
              CAST(SUM(q*q) AS BIGINT) AS ssq
       FROM ex GROUP BY 1),
pt AS (SELECT vec_id, label, CAST(SUM(q*q) AS BIGINT) AS qq FROM ex GROUP BY 1, 2),
dots AS (
  SELECT ex.vec_id, ls.label AS clabel, CAST(SUM(ex.q * ls.sv) AS BIGINT) AS dot
  FROM ex JOIN ls ON ex.dim = ls.dim GROUP BY 1, 2),
s AS (
  SELECT pt.vec_id, pt.label, dots.clabel, lc.n,
         lc.n*pt.qq + lc.ssq - 2*dots.dot AS s_int
  FROM pt JOIN dots ON pt.vec_id = dots.vec_id
  JOIN lc ON dots.clabel = lc.label),
ab AS (
  SELECT vec_id, label,
         MAX(CASE WHEN clabel = label THEN
               CASE WHEN n > 1 THEN CAST(s_int AS DOUBLE)/CAST(n-1 AS DOUBLE)
                    ELSE NULL END END) AS a,
         MIN(CASE WHEN clabel <> label
                  THEN CAST(s_int AS DOUBLE)/CAST(n AS DOUBLE) END) AS b
  FROM s GROUP BY 1, 2)
SELECT vec_id, label,
       CASE WHEN a IS NULL OR GREATEST(a, b) = 0e0 THEN 0e0
            ELSE (b - a)/GREATEST(a, b) END AS silhouette
FROM ab
"""


def customer_decile_migration(sf_dir: str):
    """Rank-migration matrix: customers active in BOTH halves of the order
    history, bucketed into spend deciles per half (deterministic
    (spend, custkey) tie-break, exact (r−1)·10//n formula — NOT SQL NTILE,
    whose extras go to the first tiles), counted per (decile_h1, decile_h2)
    cell.  Ray side: one fact pass with per-(half, custkey) cents partials,
    a small groupby, then driver ranking of the per-half customer lists
    (scale path: chain rank.global_value_rank per half)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"])
    # data-derived split: exact µs midpoint of the order-date span, the same
    # integer expression DuckDB evaluates ((epoch_min + epoch_max)//2)
    mm = ds.aggregate(Min("o_orderdate"), Max("o_orderdate"))
    lo = np.datetime64(mm["min(o_orderdate)"], "us").astype(np.int64)
    hi = np.datetime64(mm["max(o_orderdate)"], "us").astype(np.int64)
    split = np.int64((int(lo) + int(hi)) // 2).astype("datetime64[us]").item()

    def partial(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.greater_equal(t["o_orderdate"], pa.scalar(split)), pa.int64())
        tb = pa.table(
            {"c": t["o_custkey"], "h": h, "s": _cents(t["o_totalprice"])}
        )
        g = tb.group_by(["c", "h"]).aggregate([("s", "sum")])
        return g.rename_columns(["c", "h", "s"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c", "h"])
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()
    )
    piv = agg.pivot(index="c", columns="h", values="s").dropna()
    cust = piv.index.to_numpy(np.int64)

    def decile(spend: np.ndarray) -> np.ndarray:
        order = np.lexsort((cust, spend))
        r = np.empty(len(spend), np.int64)
        r[order] = np.arange(len(spend), dtype=np.int64)  # 0-based row number
        return r * 10 // len(spend) + 1

    d1 = decile(piv[0].to_numpy(np.int64))
    d2 = decile(piv[1].to_numpy(np.int64))
    tb = pa.table(
        {
            "decile_h1": pa.array(d1),
            "decile_h2": pa.array(d2),
            "n_customers": pa.array(np.ones(len(d1), np.int64)),
        }
    )
    g = tb.group_by(["decile_h1", "decile_h2"]).aggregate([("n_customers", "sum")])
    return g.rename_columns(["decile_h1", "decile_h2", "n_customers"])


CUSTOMER_DECILE_MIGRATION_SQL = """
WITH cut AS (
  SELECT make_timestamp((epoch_us(MIN(o_orderdate))
                         + epoch_us(MAX(o_orderdate))) // 2) AS split
  FROM orders),
sp AS (
  SELECT o_custkey AS c,
         CASE WHEN o_orderdate >= cut.split THEN 1 ELSE 0 END AS h,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM orders, cut GROUP BY 1, 2),
both_h AS (
  SELECT a.c, a.s AS s1, b.s AS s2
  FROM sp a JOIN sp b ON a.c = b.c AND a.h = 0 AND b.h = 1),
r AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY s1, c) - 1) * 10
           // (COUNT(*) OVER ()) + 1 AS decile_h1,
         (ROW_NUMBER() OVER (ORDER BY s2, c) - 1) * 10
           // (COUNT(*) OVER ()) + 1 AS decile_h2
  FROM both_h)
SELECT CAST(decile_h1 AS BIGINT) AS decile_h1,
       CAST(decile_h2 AS BIGINT) AS decile_h2,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM r GROUP BY 1, 2
"""


def events_weekend_cliffs_delta(sf_dir: str):
    """Cliff's delta effect size between weekend and weekday event values —
    the ordinal cousin of ``events_welch_ttest_weekend``: δ = (#(w>d) −
    #(w<d)) / (n_w·n_d), computed EXACTLY on the bounded per-value cents
    grid (#(w>d) = Σ_v w_v·cumD(<v), a pure integer convolution of the two
    CDF partials).  The signed ppm uses explicit sign·(|num|·10⁶//den) so
    Python floor and DuckDB trunc can never disagree on negatives."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        dow = pc.day_of_week(t["ts"])  # Monday=0 .. Sunday=6
        we = pc.cast(pc.greater_equal(dow, 5), pa.int64())
        tb = pa.table(
            {
                "v": _cents(t["value"]),
                "w": we,
                "d": pc.subtract(1, we),
            }
        )
        g = tb.group_by("v").aggregate([("w", "sum"), ("d", "sum")])
        return g.rename_columns(["v", "w", "d"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("w", alias_name="w"), Sum("d", alias_name="d"))
        .to_pandas()
        .sort_values("v", kind="mergesort")
    )
    w = agg["w"].to_numpy(np.int64)
    d = agg["d"].to_numpy(np.int64)
    cum_d = d.cumsum()
    cum_w = w.cumsum()
    n_w, n_d = int(cum_w[-1]), int(cum_d[-1])
    gt = int((w * (cum_d - d)).sum())          # weekend strictly above
    lt = int((d * (cum_w - w)).sum())          # weekend strictly below
    num = gt - lt
    den = n_w * n_d
    ppm = (1 if num >= 0 else -1) * (abs(num) * 1_000_000 // den)
    return pa.table(
        {
            "n_weekend": pa.array([n_w], pa.int64()),
            "n_weekday": pa.array([n_d], pa.int64()),
            "delta_num": pa.array([num], pa.int64()),
            "delta_ppm": pa.array([ppm], pa.int64()),
        }
    )


EVENTS_WEEKEND_CLIFFS_DELTA_SQL = """
WITH v AS (
  SELECT CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v,
         CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS w,
         CASE WHEN isodow(ts) >= 6 THEN 0 ELSE 1 END AS d
  FROM events),
c AS (SELECT v, CAST(SUM(w) AS BIGINT) AS w, CAST(SUM(d) AS BIGINT) AS d
      FROM v GROUP BY 1),
s AS (SELECT w, d,
             CAST(SUM(d) OVER (ORDER BY v) AS BIGINT) - d AS cd_before,
             CAST(SUM(w) OVER (ORDER BY v) AS BIGINT) - w AS cw_before
      FROM c),
t AS (SELECT CAST(SUM(w) AS BIGINT) AS n_w, CAST(SUM(d) AS BIGINT) AS n_d FROM v),
g AS (SELECT CAST(SUM(w*cd_before) - SUM(d*cw_before) AS BIGINT) AS num FROM s)
SELECT n_w AS n_weekend, n_d AS n_weekday, num AS delta_num,
       CAST(SIGN(num) AS BIGINT) * (ABS(num) * 1000000 // (n_w*n_d)) AS delta_ppm
FROM g, t
"""


def orders_urgent_highvalue_odds(sf_dir: str):
    """2×2 association: odds ratio between URGENT priority and high order
    value (above the exact global median by the quantile_disc convention).
    The contingency cells are block-local indicator partials; the cutoff is
    one per-value-grid driver pass; or_milli is pure nonnegative integer
    arithmetic (a·d·1000 // (b·c)) on both sides."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_totalprice", "o_orderpriority"]
    )

    def grid(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "p": _cents(t["o_totalprice"]),
                "cnt": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return (
            tb.group_by("p").aggregate([("cnt", "sum")]).rename_columns(["p", "cnt"])
        )

    agg = (
        ds.map_batches(grid, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("p", kind="mergesort")
    )
    vals = agg["p"].to_numpy(np.int64)
    cum = agg["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    med = int(vals[np.searchsorted(cum, -(-n // 2), side="left")])

    def cells(t: pa.Table) -> pa.Table:
        hi = pc.greater(_cents(t["o_totalprice"]), med)
        ur = pc.equal(t["o_orderpriority"], "1-URGENT")
        b_hi = hi.to_numpy(zero_copy_only=False)
        b_ur = ur.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array([int(np.sum(b_ur & b_hi))], pa.int64()),
                "b": pa.array([int(np.sum(b_ur & ~b_hi))], pa.int64()),
                "c": pa.array([int(np.sum(~b_ur & b_hi))], pa.int64()),
                "d": pa.array([int(np.sum(~b_ur & ~b_hi))], pa.int64()),
            }
        )

    cell = ds.map_batches(cells, batch_format="pyarrow").sum(["a", "b", "c", "d"])
    a, b = int(cell["sum(a)"]), int(cell["sum(b)"])
    c, d = int(cell["sum(c)"]), int(cell["sum(d)"])
    return pa.table(
        {
            "median_cents": pa.array([med], pa.int64()),
            "n_urgent_high": pa.array([a], pa.int64()),
            "n_urgent_low": pa.array([b], pa.int64()),
            "n_other_high": pa.array([c], pa.int64()),
            "n_other_low": pa.array([d], pa.int64()),
            "or_milli": pa.array([a * d * 1000 // (b * c)], pa.int64()),
        }
    )


ORDERS_URGENT_HIGHVALUE_ODDS_SQL = """
WITH v AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS p,
                  o_orderpriority AS pri
           FROM orders),
m AS (SELECT quantile_disc(p, 0.5) AS med FROM v),
cells AS (
  SELECT CAST(SUM(CASE WHEN pri = '1-URGENT' AND p > med THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN pri = '1-URGENT' AND p <= med THEN 1 ELSE 0 END) AS BIGINT) AS cb,
         CAST(SUM(CASE WHEN pri <> '1-URGENT' AND p > med THEN 1 ELSE 0 END) AS BIGINT) AS cc,
         CAST(SUM(CASE WHEN pri <> '1-URGENT' AND p <= med THEN 1 ELSE 0 END) AS BIGINT) AS cd
  FROM v, m)
SELECT (SELECT med FROM m) AS median_cents,
       ca AS n_urgent_high, cb AS n_urgent_low,
       cc AS n_other_high, cd AS n_other_low,
       CAST(ca*cd*1000 // (cb*cc) AS BIGINT) AS or_milli
FROM cells
"""


def lineitem_monthend_ship_share(sf_dir: str):
    """Calendar-quirk audit: the share of lineitems shipping in the LAST
    THREE days of their calendar month (quota-rush detection), per year,
    in exact ppm.  Month lengths come from real calendar arithmetic
    (pandas days_in_month ≙ DuckDB last_day) — block-local boolean-share
    partials, one tiny year groupby."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        s = t["l_shipdate"].to_pandas()
        late = (s.dt.day > s.dt.days_in_month - 3).to_numpy()
        tb = pa.table(
            {
                "yr": pa.array(s.dt.year.to_numpy(np.int64)),
                "n": pa.array(np.ones(len(s), np.int64)),
                "late": pa.array(late.astype(np.int64)),
            }
        )
        g = tb.group_by("yr").aggregate([("n", "sum"), ("late", "sum")])
        return g.rename_columns(["yr", "n", "late"])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        late = t["late"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "yr": t["yr"],
                "n_lines": pa.array(n),
                "n_monthend": pa.array(late),
                "monthend_ppm": pa.array(late * 1_000_000 // n),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(Sum("n", alias_name="n"), Sum("late", alias_name="late"))
        .map_batches(finish, batch_format="pyarrow")
    )


LINEITEM_MONTHEND_SHIP_SHARE_SQL = """
SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN EXTRACT(day FROM l_shipdate)
                   > EXTRACT(day FROM last_day(l_shipdate)) - 3
                THEN 1 ELSE 0 END) AS BIGINT) AS n_monthend,
       CAST(SUM(CASE WHEN EXTRACT(day FROM l_shipdate)
                   > EXTRACT(day FROM last_day(l_shipdate)) - 3
                THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS monthend_ppm
FROM lineitem GROUP BY 1
"""


def orders_priority_status_residuals(sf_dir: str):
    """Chi-square STANDARDIZED RESIDUALS for the priority × status
    contingency table — which cells drive the association: per cell,
    observed count (exact int), expected in exact milli
    (r_i·c_j·1000 // n), and the residual (o − e)/√e as ONE fixed IEEE
    expression on exact-int inputs.  Cell partials are block-local; the
    margin math runs on the driver over the ≤|priorities|·|statuses| grid."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderpriority", "o_orderstatus"]
    )

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "pri": t["o_orderpriority"],
                "st": t["o_orderstatus"],
                "o": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["pri", "st"]).aggregate([("o", "sum")])
        return g.rename_columns(["pri", "st", "o"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pri", "st"])
        .aggregate(Sum("o", alias_name="o"))
        .to_pandas()
    )
    n = int(agg["o"].sum())
    r = agg.groupby("pri")["o"].sum()
    c = agg.groupby("st")["o"].sum()
    rows = []
    for _, row in agg.iterrows():
        o = int(row["o"])
        ri, cj = int(r[row["pri"]]), int(c[row["st"]])
        e = float(ri) * float(cj) / float(n)
        rows.append(
            {
                "pri": row["pri"],
                "st": row["st"],
                "observed": o,
                "expected_milli": ri * cj * 1000 // n,
                "std_residual": (float(o) - e) / np.sqrt(e),
            }
        )
    import pandas as pd

    out = pd.DataFrame(rows)
    return pa.table(
        {
            "pri": pa.array(out["pri"], pa.string()),
            "st": pa.array(out["st"], pa.string()),
            "observed": pa.array(out["observed"], pa.int64()),
            "expected_milli": pa.array(out["expected_milli"], pa.int64()),
            "std_residual": pa.array(out["std_residual"], pa.float64()),
        }
    )


ORDERS_PRIORITY_STATUS_RESIDUALS_SQL = """
WITH o AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
                  CAST(COUNT(*) AS BIGINT) AS o
           FROM orders GROUP BY 1, 2),
r AS (SELECT pri, CAST(SUM(o) AS BIGINT) AS ri FROM o GROUP BY 1),
c AS (SELECT st, CAST(SUM(o) AS BIGINT) AS cj FROM o GROUP BY 1),
t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o)
SELECT o.pri, o.st, o.o AS observed,
       CAST(r.ri*c.cj*1000 // t.n AS BIGINT) AS expected_milli,
       (CAST(o.o AS DOUBLE)
        - CAST(r.ri AS DOUBLE)*CAST(c.cj AS DOUBLE)/CAST(t.n AS DOUBLE))
         / sqrt(CAST(r.ri AS DOUBLE)*CAST(c.cj AS DOUBLE)/CAST(t.n AS DOUBLE))
         AS std_residual
FROM o JOIN r ON o.pri = r.pri JOIN c ON o.st = c.st CROSS JOIN t
"""


def lineitem_price_quantity_grid(sf_dir: str):
    """2-D quantile binning: the joint census of (extendedprice decile ×
    quantity quintile), with bins defined by quantile_disc VALUE THRESHOLDS
    (row decile = smallest k with value ≤ Q_k) so ties never straddle a bin
    on either engine.  Two bounded per-value grid passes produce the cutoff
    vectors (broadcast as plain ints); the census is one block-local
    searchsorted partial + a ≤50-row groupby."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_extendedprice", "l_quantity"])

    def cutoffs(col: str, kbins: int) -> list[int]:
        def grid(t: pa.Table) -> pa.Table:
            tb = pa.table(
                {
                    "p": _cents(t[col]),
                    "cnt": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            return (
                tb.group_by("p")
                .aggregate([("cnt", "sum")])
                .rename_columns(["p", "cnt"])
            )

        agg = (
            ds.map_batches(grid, batch_format="pyarrow")
            .groupby("p")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
            .sort_values("p", kind="mergesort")
        )
        vals = agg["p"].to_numpy(np.int64)
        cum = agg["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        return [
            int(vals[np.searchsorted(cum, -(-k * n // kbins), side="left")])
            for k in range(1, kbins)
        ]

    pq_cuts = cutoffs("l_extendedprice", 10)
    qq_cuts = cutoffs("l_quantity", 5)

    def census(t: pa.Table) -> pa.Table:
        p = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        q = _cents(t["l_quantity"]).to_numpy(zero_copy_only=False)
        pd_bin = np.searchsorted(np.asarray(pq_cuts, np.int64), p, side="left") + 1
        qd_bin = np.searchsorted(np.asarray(qq_cuts, np.int64), q, side="left") + 1
        tb = pa.table(
            {
                "price_decile": pa.array(pd_bin.astype(np.int64)),
                "qty_quintile": pa.array(qd_bin.astype(np.int64)),
                "n_lines": pa.array(np.ones(len(p), np.int64)),
            }
        )
        g = tb.group_by(["price_decile", "qty_quintile"]).aggregate(
            [("n_lines", "sum")]
        )
        return g.rename_columns(["price_decile", "qty_quintile", "n_lines"])

    return (
        ds.map_batches(census, batch_format="pyarrow")
        .groupby(["price_decile", "qty_quintile"])
        .aggregate(Sum("n_lines", alias_name="n_lines"))
    )


LINEITEM_PRICE_QUANTITY_GRID_SQL = """
WITH v AS (SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS p,
                  CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS q
           FROM lineitem),
pc AS (SELECT unnest(quantile_disc(p, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]))
         AS cut FROM v),
qc AS (SELECT unnest(quantile_disc(q, [0.2, 0.4, 0.6, 0.8])) AS cut FROM v),
b AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) + 1 FROM pc WHERE pc.cut < v.p)
           AS price_decile,
         (SELECT CAST(COUNT(*) AS BIGINT) + 1 FROM qc WHERE qc.cut < v.q)
           AS qty_quintile
  FROM v)
SELECT price_decile, qty_quintile, CAST(COUNT(*) AS BIGINT) AS n_lines
FROM b GROUP BY 1, 2
"""


def docs_english_length_pointbiserial(sf_dir: str):
    """Point-biserial correlation between a binary attribute (lang = 'en')
    and document length in tokens: exact int sufficient stats (n₁, n₀, ΣL₁,
    ΣL₀, ΣL²) from one block-local pass, then ONE fixed IEEE expression
    r_pb = (M₁−M₀)/s_n · √(n₁·n₀/n²) — the whitespace token count reuses the
    corpus tokenizer convention (split on runs of whitespace)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t["text"].to_pylist()
        ln = np.array([len(s.split()) if s else 0 for s in txt], np.int64)
        en = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n1": pa.array([int(en.sum())], pa.int64()),
                "n0": pa.array([int((~en).sum())], pa.int64()),
                "s1": pa.array([int(ln[en].sum())], pa.int64()),
                "s0": pa.array([int(ln[~en].sum())], pa.int64()),
                "q": pa.array([int((ln * ln).sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").sum(
        ["n1", "n0", "s1", "s0", "q"]
    )
    n1, n0 = int(agg["sum(n1)"]), int(agg["sum(n0)"])
    s1, s0 = int(agg["sum(s1)"]), int(agg["sum(s0)"])
    q = int(agg["sum(q)"])
    n = n1 + n0
    s = s1 + s0
    m1 = float(s1) / float(n1)
    m0 = float(s0) / float(n0)
    sn = np.sqrt(
        (float(q) - float(s) * float(s) / float(n)) / float(n)
    )
    r_pb = (m1 - m0) / sn * np.sqrt(float(n1) * float(n0) / (float(n) * float(n)))
    return pa.table(
        {
            "n_en": pa.array([n1], pa.int64()),
            "n_other": pa.array([n0], pa.int64()),
            "sum_tokens_en": pa.array([s1], pa.int64()),
            "sum_tokens_other": pa.array([s0], pa.int64()),
            "r_pb": pa.array([r_pb], pa.float64()),
        }
    )


DOCS_ENGLISH_LENGTH_POINTBISERIAL_SQL = """
WITH d AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS en,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ln
  FROM documents),
t AS (SELECT CAST(SUM(en) AS BIGINT) AS n1,
             CAST(SUM(1-en) AS BIGINT) AS n0,
             CAST(SUM(en*ln) AS BIGINT) AS s1,
             CAST(SUM((1-en)*ln) AS BIGINT) AS s0,
             CAST(SUM(ln*ln) AS BIGINT) AS q
      FROM d)
SELECT n1 AS n_en, n0 AS n_other, s1 AS sum_tokens_en, s0 AS sum_tokens_other,
       (CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE)
        - CAST(s0 AS DOUBLE)/CAST(n0 AS DOUBLE))
       / sqrt((CAST(q AS DOUBLE)
               - CAST(s1+s0 AS DOUBLE)*CAST(s1+s0 AS DOUBLE)/CAST(n1+n0 AS DOUBLE))
              / CAST(n1+n0 AS DOUBLE))
       * sqrt(CAST(n1 AS DOUBLE)*CAST(n0 AS DOUBLE)
              / (CAST(n1+n0 AS DOUBLE)*CAST(n1+n0 AS DOUBLE))) AS r_pb
FROM t
"""


def lineitem_monthly_vwap(sf_dir: str):
    """Volume-weighted average price per ship month: Σ(price·qty)/Σqty as an
    exact integer VWAP in milli-cents — the weighted-mean aggregate shape.
    Both factors are cents ints, so the Σ(p·q) partial is exact; the final
    division is one truncating int op per month row (nonnegative on both
    sides)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_extendedprice", "l_quantity"],
    )

    def partial(t: pa.Table) -> pa.Table:
        p = _cents(t["l_extendedprice"])
        q = _cents(t["l_quantity"])
        tb = pa.table(
            {
                "month": pc.strftime(t["l_shipdate"], format="%Y-%m"),
                "pq": pc.multiply(p, q),
                "q": q,
            }
        )
        g = tb.group_by("month").aggregate([("pq", "sum"), ("q", "sum")])
        return g.rename_columns(["month", "pq", "q"])

    def finish(t: pa.Table) -> pa.Table:
        pq = t["pq"].to_numpy(zero_copy_only=False).astype(object)
        q = t["q"].to_numpy(zero_copy_only=False).astype(object)
        vwap = np.array([int(a) * 1000 // int(b) for a, b in zip(pq, q)], np.int64)
        return pa.table(
            {
                "month": t["month"],
                "sum_qty_centi": pc.cast(t["q"], pa.int64()),
                "vwap_millicents": pa.array(vwap),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("pq", alias_name="pq"), Sum("q", alias_name="q"))
        .map_batches(finish, batch_format="pyarrow")
    )


LINEITEM_MONTHLY_VWAP_SQL = """
SELECT strftime(l_shipdate, '%Y-%m') AS month,
       CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_qty_centi,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS HUGEINT)
              * CAST(FLOOR(l_quantity*100 + 0.5) AS HUGEINT)) * 1000
            // SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS HUGEINT)) AS BIGINT)
         AS vwap_millicents
FROM lineitem GROUP BY 1
"""


def customer_top_supplier_share(sf_dir: str):
    """Share-of-wallet: each customer's single biggest supplier (by exact
    cents spend through their orders) and that supplier's share of the
    customer's total, in ppm.  Ray plan: lineitem pre-aggregated to
    (orderkey, suppkey) partials BEFORE the 8-partition orders join (the
    CLAUDE-measured sweet spot), then one (custkey, suppkey) groupby and a
    per-customer vectorized argmax with (spend DESC, suppkey ASC)
    tie-break — the same deterministic-winner discipline as the dedup
    stage."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_extendedprice"]
    )

    def lpartial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "sk": t["l_suppkey"],
                "sp": _cents(t["l_extendedprice"]),
            }
        )
        g = tb.group_by(["l_orderkey", "sk"]).aggregate([("sp", "sum")])
        return g.rename_columns(["l_orderkey", "sk", "sp"])

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    per_cs = (
        li.map_batches(lpartial, batch_format="pyarrow")
        .join(
            orders,
            join_type="inner",
            num_partitions=8,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .map_batches(
            lambda t: pa.table(
                {"ck": t["o_custkey"], "sk": t["sk"], "sp": t["sp"]}
            )
            .group_by(["ck", "sk"])
            .aggregate([("sp", "sum")])
            .rename_columns(["ck", "sk", "sp"]),
            batch_format="pyarrow",
        )
        .groupby(["ck", "sk"])
        .aggregate(Sum("sp", alias_name="sp"))
    )

    def top1(g: pa.Table) -> pa.Table:
        sp = g["sp"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = g["sk"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sk, -sp))
        i = order[0]
        tot = int(sp.sum())
        return pa.table(
            {
                "c_custkey": g["ck"].slice(0, 1),
                "top_suppkey": pa.array([int(sk[i])], pa.int64()),
                "top_spend_cents": pa.array([int(sp[i])], pa.int64()),
                "total_spend_cents": pa.array([tot], pa.int64()),
                "share_ppm": pa.array([int(sp[i]) * 1_000_000 // tot], pa.int64()),
            }
        )

    return per_cs.groupby("ck").map_groups(top1, batch_format="pyarrow")


CUSTOMER_TOP_SUPPLIER_SHARE_SQL = """
WITH sp AS (
  SELECT o_custkey AS ck, l_suppkey AS sk,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2),
r AS (
  SELECT ck, sk, sp,
         ROW_NUMBER() OVER (PARTITION BY ck ORDER BY sp DESC, sk) AS rn,
         CAST(SUM(sp) OVER (PARTITION BY ck) AS BIGINT) AS tot
  FROM sp)
SELECT ck AS c_custkey, sk AS top_suppkey, sp AS top_spend_cents,
       tot AS total_spend_cents,
       CAST(sp * 1000000 // tot AS BIGINT) AS share_ppm
FROM r WHERE rn = 1
"""


def customer_first_last_spend_ratio(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE per group: for every customer with ≥2
    orders, the value of their first and last order ((date, orderkey) order
    — the key tie-break makes same-day pairs deterministic) and the
    first→last ratio in exact ppm.  Block-local candidate pruning: each
    block keeps only its per-customer first/last rows PLUS an order count,
    so the groupby moves ≤2 rows + one count per (customer, block) instead
    of the whole fact table."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        d = pa.table(
            {
                "ck": t["o_custkey"],
                "ok": t["o_orderkey"],
                "dt": t["o_orderdate"],
                "p": _cents(t["o_totalprice"]),
            }
        )
        idx = pc.sort_indices(
            d,
            sort_keys=[
                ("ck", "ascending"),
                ("dt", "ascending"),
                ("ok", "ascending"),
            ],
        )
        s = d.take(idx)
        ck = s["ck"].to_numpy(zero_copy_only=False)
        first = np.r_[True, ck[1:] != ck[:-1]]
        last = np.r_[ck[1:] != ck[:-1], True]
        cand = s.filter(pa.array(first | last))
        # per-customer block counts ride along on the first-row candidates
        cnt = np.bincount(np.cumsum(first) - 1)
        n_col = np.zeros(cand.num_rows, np.int64)
        cand_first = first[first | last]
        n_col[cand_first] = cnt
        return cand.append_column("n", pa.array(n_col))

    def pick(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("dt", "ascending"), ("ok", "ascending")]
        )
        s = g.take(idx)
        total = int(pc.sum(g["n"]).as_py())
        f = int(s["p"][0].as_py())
        last = int(s["p"][s.num_rows - 1].as_py())
        if total < 2:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "first_cents": pa.array([], pa.int64()),
                    "last_cents": pa.array([], pa.int64()),
                    "ratio_ppm": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "c_custkey": pc.cast(s["ck"].slice(0, 1), pa.int64()),
                "first_cents": pa.array([f], pa.int64()),
                "last_cents": pa.array([last], pa.int64()),
                "ratio_ppm": pa.array([f * 1_000_000 // last], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .map_groups(pick, batch_format="pyarrow")
    )


CUSTOMER_FIRST_LAST_SPEND_RATIO_SQL = """
WITH r AS (
  SELECT o_custkey AS ck,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS p,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rf,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders)
SELECT a.ck AS c_custkey,
       a.p AS first_cents, b.p AS last_cents,
       CAST(a.p * 1000000 // b.p AS BIGINT) AS ratio_ppm
FROM r a JOIN r b ON a.ck = b.ck AND a.rf = 1 AND b.rl = 1
WHERE a.n >= 2
"""


def orders_mom_growth_volatility(sf_dir: str):
    """Month-over-month revenue growth volatility: arithmetic returns in
    exact signed ppm (explicit SIGN·(ABS·10⁶//prev) so floor/trunc agree),
    then the stdev of those ~80 small ints via exact (n,S,Q) and one fixed
    √ expression.  Monthly revenue is the usual cents partial + tiny
    groupby; the return series walk is a driver pass over months."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "rev": _cents(t["o_totalprice"]),
            }
        )
        g = tb.group_by("month").aggregate([("rev", "sum")])
        return g.rename_columns(["month", "rev"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("month", kind="mergesort")
    )
    rev = [int(x) for x in agg["rev"]]
    rets = []
    for prev, cur in zip(rev, rev[1:]):
        d = cur - prev
        rets.append((1 if d >= 0 else -1) * (abs(d) * 1_000_000 // prev))
    n = len(rets)
    s = sum(rets)
    q = sum(r * r for r in rets)
    vol = np.sqrt(
        (float(q) - float(s) * float(s) / float(n)) / float(n - 1)
    )
    return pa.table(
        {
            "n_months": pa.array([len(rev)], pa.int64()),
            "n_returns": pa.array([n], pa.int64()),
            "mean_ret_ppm_trunc": pa.array([(1 if s >= 0 else -1) * (abs(s) // n)], pa.int64()),
            "vol_ppm": pa.array([vol], pa.float64()),
        }
    )


ORDERS_MOM_GROWTH_VOLATILITY_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
r AS (
  SELECT rev, LAG(rev) OVER (ORDER BY month) AS prev FROM m),
ret AS (
  SELECT CAST(SIGN(rev - prev) AS BIGINT) * (ABS(rev - prev) * 1000000 // prev)
           AS ppm
  FROM r WHERE prev IS NOT NULL),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(ppm) AS BIGINT) AS s,
             CAST(SUM(ppm*ppm) AS BIGINT) AS q
      FROM ret)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_months,
       n AS n_returns,
       CAST(SIGN(s) AS BIGINT) * (ABS(s) // n) AS mean_ret_ppm_trunc,
       sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
            / CAST(n-1 AS DOUBLE)) AS vol_ppm
FROM t
"""


def purchase_graph_degree_assortativity(sf_dir: str):
    """Degree assortativity of the supplier–customer bipartite purchase
    graph: Pearson correlation between deg(supplier) and deg(customer)
    across DISTINCT purchase edges — do high-fanout suppliers serve
    high-fanout customers?  Edges come from the lineitem→orders join
    (pre-aggregated per orderkey), degrees from two tiny edge groupbys; the
    correlation is five exact int sums over edges + one fixed √·√
    expression.  Degree maps broadcast (supplier side is small; the
    customer side documents the shuffle-join fallback at 100 TB)."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"])

    def lpartial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"l_orderkey": t["l_orderkey"], "sk": t["l_suppkey"]})
            .group_by(["l_orderkey", "sk"])
            .aggregate([])
        )

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    edges = (
        li.map_batches(lpartial, batch_format="pyarrow")
        .join(
            orders,
            join_type="inner",
            num_partitions=8,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .map_batches(
            lambda t: pa.table({"sk": t["sk"], "ck": t["o_custkey"]})
            .group_by(["sk", "ck"])
            .aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["sk", "ck"])
        .aggregate(Count(alias_name="m"))
        .to_pandas()[["sk", "ck"]]
    )
    ds_deg = edges.groupby("sk").size()
    dc_deg = edges.groupby("ck").size()
    x = edges["sk"].map(ds_deg).to_numpy(np.int64)
    y = edges["ck"].map(dc_deg).to_numpy(np.int64)
    n = len(edges)
    sx, sy = int(x.sum()), int(y.sum())
    sxx = int((x * x).sum())
    syy = int((y * y).sum())
    sxy = int((x * y).sum())
    r = (float(sxy) - float(sx) * float(sy) / float(n)) / (
        np.sqrt(float(sxx) - float(sx) * float(sx) / float(n))
        * np.sqrt(float(syy) - float(sy) * float(sy) / float(n))
    )
    return pa.table(
        {
            "n_edges": pa.array([n], pa.int64()),
            "sum_sdeg": pa.array([sx], pa.int64()),
            "sum_cdeg": pa.array([sy], pa.int64()),
            "assortativity_r": pa.array([r], pa.float64()),
        }
    )


PURCHASE_GRAPH_DEGREE_ASSORTATIVITY_SQL = """
WITH e AS (
  SELECT DISTINCT l_suppkey AS sk, o_custkey AS ck
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
ds AS (SELECT sk, CAST(COUNT(*) AS BIGINT) AS xd FROM e GROUP BY 1),
dc AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS yd FROM e GROUP BY 1),
v AS (SELECT xd, yd FROM e JOIN ds ON e.sk = ds.sk JOIN dc ON e.ck = dc.ck),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xd) AS BIGINT) AS sx, CAST(SUM(yd) AS BIGINT) AS sy,
             CAST(SUM(xd*xd) AS BIGINT) AS sxx,
             CAST(SUM(yd*yd) AS BIGINT) AS syy,
             CAST(SUM(xd*yd) AS BIGINT) AS sxy
      FROM v)
SELECT n AS n_edges, sx AS sum_sdeg, sy AS sum_cdeg,
       (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))
       / (sqrt(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))
          * sqrt(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)))
         AS assortativity_r
FROM t
"""


def docs_prefix_template_census(sf_dir: str):
    """C4/CCNet-style boilerplate-template detection: documents sharing an
    identical 5-token prefix form a template cluster; report every cluster
    with ≥2 members (prefix, size, member doc_id span).  Block-local
    (prefix → count, min_id, max_id) partials make the groupby input tiny —
    the prefix string itself is the partition key, never full text."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t["text"].to_pylist()
        pref = [" ".join(s.split()[:5]) if s else "" for s in txt]
        tb = pa.table(
            {
                "prefix": pa.array(pref, pa.string()),
                "n_docs": pa.array(np.ones(len(pref), np.int64)),
                "min_doc": t["doc_id"],
                "max_doc": t["doc_id"],
            }
        )
        g = tb.group_by("prefix").aggregate(
            [("n_docs", "sum"), ("min_doc", "min"), ("max_doc", "max")]
        )
        return g.rename_columns(["prefix", "n_docs", "min_doc", "max_doc"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("prefix")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Min("min_doc", alias_name="min_doc"),
            Max("max_doc", alias_name="max_doc"),
        )
        .filter(lambda row: row["n_docs"] >= 2)
    )


DOCS_PREFIX_TEMPLATE_CENSUS_SQL = """
WITH p AS (
  SELECT doc_id,
         array_to_string(string_split_regex(trim(text), '\\s+')[1:5], ' ')
           AS prefix
  FROM documents)
SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM p GROUP BY 1 HAVING COUNT(*) >= 2
"""


def orders_price_harmonic_mean(sf_dir: str):
    """Harmonic mean of order values with NO float: reciprocals are
    truncated integer micro-reciprocals 10¹²//v on the bounded cents grid
    (a defined statistic both engines compute bit-identically), so
    H = n·10¹² // Σ c_v·(10¹²//v) is pure integer arithmetic end-to-end."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "p": _cents(t["o_totalprice"]),
                "cnt": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("p").aggregate([("cnt", "sum")])
        return g.rename_columns(["p", "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    n = int(agg["cnt"].sum())
    recip = sum(int(c) * (10**12 // int(p)) for p, c in zip(agg["p"], agg["cnt"]))
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "recip_sum_micro": pa.array([recip], pa.int64()),
            "harmonic_mean_cents": pa.array([n * 10**12 // recip], pa.int64()),
        }
    )


ORDERS_PRICE_HARMONIC_MEAN_SQL = """
WITH v AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS p FROM orders),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(1000000000000 AS HUGEINT) // p) AS recip
      FROM v)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(recip AS BIGINT) AS recip_sum_micro,
       CAST(n * 1000000000000 // recip AS BIGINT) AS harmonic_mean_cents
FROM t
"""


def lineitem_ship_before_order_audit(sf_dir: str):
    """Cross-table TEMPORAL consistency audit: lineitems whose shipdate
    precedes their order's orderdate (impossible-chronology detection), per
    ship year in exact ppm.  The fact side cannot pre-aggregate (the
    predicate needs the joined orderdate), so this is an honest 8-partition
    shuffle join followed by block-local boolean-share partials — the audit
    sibling of ``referential_integrity_audit``."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])

    def census(t: pa.Table) -> pa.Table:
        before = pc.cast(pc.less(t["l_shipdate"], t["o_orderdate"]), pa.int64())
        tb = pa.table(
            {
                "yr": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "b": before,
            }
        )
        g = tb.group_by("yr").aggregate([("n", "sum"), ("b", "sum")])
        return g.rename_columns(["yr", "n", "b"])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "yr": t["yr"],
                "n_lines": pa.array(n),
                "n_before_order": pa.array(b),
                "before_ppm": pa.array(b * 1_000_000 // n),
            }
        )

    return (
        li.join(
            orders,
            join_type="inner",
            num_partitions=8,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .map_batches(census, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(Sum("n", alias_name="n"), Sum("b", alias_name="b"))
        .map_batches(finish, batch_format="pyarrow")
    )


LINEITEM_SHIP_BEFORE_ORDER_AUDIT_SQL = """
SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT)
         AS n_before_order,
       CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS before_ppm
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def part_copurchase_triples(sf_dir: str):
    """Frequent 3-itemsets: the top-20 part TRIPLES by co-purchase support
    (orders containing all three), fully ordered by (support DESC, p1, p2,
    p3) so the cut is deterministic under ties.  Per-order triple expansion
    happens in map_groups (orders have ≤7 distinct parts → ≤35 triples);
    the support groupby moves triples, never order contents."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def triples(g: pa.Table) -> pa.Table:
        from itertools import combinations

        pk = sorted(set(g["l_partkey"].to_pylist()))
        tr = list(combinations(pk, 3))
        if not tr:
            return pa.table(
                {
                    "p1": pa.array([], pa.int64()),
                    "p2": pa.array([], pa.int64()),
                    "p3": pa.array([], pa.int64()),
                    "support": pa.array([], pa.int64()),
                }
            )
        arr = np.array(tr, np.int64)
        return pa.table(
            {
                "p1": pa.array(arr[:, 0]),
                "p2": pa.array(arr[:, 1]),
                "p3": pa.array(arr[:, 2]),
                "support": pa.array(np.ones(len(tr), np.int64)),
            }
        )

    return (
        ds.groupby("l_orderkey")
        .map_groups(triples, batch_format="pyarrow")
        .groupby(["p1", "p2", "p3"])
        .aggregate(Sum("support", alias_name="support"))
        .sort(["support", "p1", "p2", "p3"], descending=[True, False, False, False])
        .limit(20)
    )


PART_COPURCHASE_TRIPLES_SQL = """
WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tr AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3
  FROM pl a
  JOIN pl b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN pl c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey)
SELECT p1, p2, p3, CAST(COUNT(*) AS BIGINT) AS support
FROM tr GROUP BY 1, 2, 3
ORDER BY support DESC, p1, p2, p3 LIMIT 20
"""


def docs_top_term_coverage_curve(sf_dir: str):
    """Vocabulary coverage curve: for k = 1..20, the exact ppm of all corpus
    tokens covered by the k most frequent terms ((count DESC, term ASC)
    order) — the curve that decides tokenizer vocabulary sizes.  Block-local
    term-count combiners keep the shuffle O(vocab); the 20-point curve is a
    driver walk."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def term_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        )
        toks = pc.drop_null(toks)
        toks = toks.filter(pc.not_equal(toks, ""))
        g = (
            pa.Table.from_arrays([toks], names=["term"])
            .group_by("term")
            .aggregate([("term", "count")])
        )
        return g.rename_columns(["term", "n"])

    agg = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
    )
    total = int(agg["n"].sum())
    cum = agg["n"].to_numpy(np.int64).cumsum()
    k = np.arange(1, min(20, len(cum)) + 1, dtype=np.int64)
    return pa.table(
        {
            "k": pa.array(k),
            "top_term": pa.array(agg["term"].to_numpy()[: len(k)], pa.string()),
            "cum_tokens": pa.array(cum[: len(k)]),
            "coverage_ppm": pa.array(cum[: len(k)] * 1_000_000 // total),
        }
    )


DOCS_TOP_TERM_COVERAGE_CURVE_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks WHERE term <> ''
      GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
r AS (SELECT term, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, term) AS k,
             CAST(SUM(n) OVER (ORDER BY n DESC, term
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM c)
SELECT CAST(k AS BIGINT) AS k, term AS top_term, cum AS cum_tokens,
       CAST(cum * 1000000 // t.total AS BIGINT) AS coverage_ppm
FROM r, t WHERE k <= 20
"""


def orders_priority_trend_mann_kendall(sf_dir: str):
    """Mann–Kendall monotonic-trend test per order priority on the monthly
    revenue series: S = Σ_{i<j} sign(r_j − r_i) is exact (sign(0) = 0 under
    revenue ties on both engines), the no-tie-correction variance
    n(n−1)(2n+5)/18 is exact, and the continuity-corrected
    z = (S − sign(S))/√Var is one fixed IEEE expression.  Monthly revenue is
    the usual cents partial; the O(n²) pair walk runs on ~80 months per
    priority, driver-side (the oracle cross-checks with a literal pairwise
    join)."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "pri": t["o_orderpriority"],
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "rev": _cents(t["o_totalprice"]),
            }
        )
        g = tb.group_by(["pri", "month"]).aggregate([("rev", "sum")])
        return g.rename_columns(["pri", "month", "rev"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pri", "month"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values(["pri", "month"], kind="mergesort")
    )
    out = {"pri": [], "n_months": [], "s_stat": [], "mk_z": []}
    for pri, grp in agg.groupby("pri", sort=True):
        r = grp["rev"].to_numpy(np.int64)
        n = len(r)
        diff = np.sign(r[None, :] - r[:, None])
        s = int(np.triu(diff, 1).sum())
        var = n * (n - 1) * (2 * n + 5) // 18
        z = (float(s) - float(np.sign(s))) / np.sqrt(float(var))
        out["pri"].append(pri)
        out["n_months"].append(n)
        out["s_stat"].append(s)
        out["mk_z"].append(z)
    return pa.table(
        {
            "pri": pa.array(out["pri"], pa.string()),
            "n_months": pa.array(out["n_months"], pa.int64()),
            "s_stat": pa.array(out["s_stat"], pa.int64()),
            "mk_z": pa.array(out["mk_z"], pa.float64()),
        }
    )


ORDERS_PRIORITY_TREND_MANN_KENDALL_SQL = """
WITH m AS (
  SELECT o_orderpriority AS pri, strftime(o_orderdate, '%Y-%m') AS month,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2),
s AS (
  SELECT a.pri, CAST(SUM(SIGN(b.rev - a.rev)) AS BIGINT) AS s_stat
  FROM m a JOIN m b ON a.pri = b.pri AND a.month < b.month
  GROUP BY 1),
n AS (SELECT pri, CAST(COUNT(*) AS BIGINT) AS n_months FROM m GROUP BY 1)
SELECT n.pri, n.n_months, s.s_stat,
       (CAST(s.s_stat AS DOUBLE) - CAST(SIGN(s.s_stat) AS DOUBLE))
         / sqrt(CAST(n.n_months*(n.n_months-1)*(2*n.n_months+5)//18 AS DOUBLE))
         AS mk_z
FROM n JOIN s ON n.pri = s.pri
"""


def customer_btyd_features(sf_dir: str):
    """BTYD (buy-till-you-die) model feature extraction — the per-customer
    (frequency x, recency t_x, observation span T) triple every
    Pareto/NBD-style CLV fit consumes: x = repeat-order count, t_x = days
    from first to last order, T = days from first order to the corpus's
    global max order date.  Block partials carry per-customer (count, min,
    max) — one tiny groupby; the global horizon is a driver scalar reused
    broadcast-style in the finish map."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"]
    )
    horizon = ds.aggregate(Max("o_orderdate"))["max(o_orderdate)"]
    horizon_us = int(np.datetime64(horizon, "us").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "ck": t["o_custkey"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "first_dt": t["o_orderdate"],
                "last_dt": t["o_orderdate"],
            }
        )
        g = tb.group_by("ck").aggregate(
            [("n", "sum"), ("first_dt", "min"), ("last_dt", "max")]
        )
        return g.rename_columns(["ck", "n", "first_dt", "last_dt"])

    def finish(t: pa.Table) -> pa.Table:
        day_us = 86_400_000_000
        f = (
            t["first_dt"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        last = (
            t["last_dt"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "c_custkey": t["ck"],
                "frequency_x": pa.array(n - 1),
                "recency_days": pa.array((last - f) // day_us),
                "t_days": pa.array((horizon_us - f) // day_us),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("first_dt", alias_name="first_dt"),
            Max("last_dt", alias_name="last_dt"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


CUSTOMER_BTYD_FEATURES_SQL = """
WITH h AS (SELECT MAX(o_orderdate) AS horizon FROM orders),
c AS (SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n,
             MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
      FROM orders GROUP BY 1)
SELECT ck AS c_custkey,
       CAST(n - 1 AS BIGINT) AS frequency_x,
       CAST((epoch_us(l) - epoch_us(f)) // 86400000000 AS BIGINT) AS recency_days,
       CAST((epoch_us(h.horizon) - epoch_us(f)) // 86400000000 AS BIGINT) AS t_days
FROM c, h
"""


def embeddings_norm_histogram(sf_dir: str):
    """Embedding-norm sanity histogram: squared µ-unit norms bucketed by
    decile-of-range value thresholds… simpler and exact: fixed-width buckets
    of ‖q‖²·10 // max‖q‖² (0..9, max lands in 9) — degenerate-vector and
    scale-drift detection for an embedding column.  One block-local norm
    pass + a global max + a tiny bucket groupby."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def norms(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        q = np.floor(_vecs(t, "embedding") * 1_000_000 + 0.5).astype(np.int64)
        return pa.table({"nsq": pa.array((q * q).sum(axis=1))})

    n2 = ds.map_batches(norms, batch_format="pyarrow")
    mx = int(n2.max("nsq"))

    def bucketize(t: pa.Table) -> pa.Table:
        v = t["nsq"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(v * 10 // mx, 9)
        tb = pa.table(
            {
                "bucket": pa.array(b),
                "n_vectors": pa.array(np.ones(len(v), np.int64)),
                "min_nsq": pa.array(v),
                "max_nsq": pa.array(v),
            }
        )
        g = tb.group_by("bucket").aggregate(
            [("n_vectors", "sum"), ("min_nsq", "min"), ("max_nsq", "max")]
        )
        return g.rename_columns(["bucket", "n_vectors", "min_nsq", "max_nsq"])

    return (
        n2.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n_vectors", alias_name="n_vectors"),
            Min("min_nsq", alias_name="min_nsq"),
            Max("max_nsq", alias_name="max_nsq"),
        )
    )


EMBEDDINGS_NORM_HISTOGRAM_SQL = """
WITH ex AS (
  SELECT vec_id,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5) AS BIGINT) AS q
  FROM embeddings),
n AS (SELECT vec_id, CAST(SUM(q*q) AS BIGINT) AS nsq FROM ex GROUP BY 1),
m AS (SELECT MAX(nsq) AS mx FROM n)
SELECT LEAST(nsq * 10 // m.mx, 9) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(MIN(nsq) AS BIGINT) AS min_nsq,
       CAST(MAX(nsq) AS BIGINT) AS max_nsq
FROM n, m GROUP BY 1
"""


def embeddings_dim_variance_topk(sf_dir: str):
    """Per-dimension variance ranking (feature selection): exact µ-unit
    sufficient stats (n, Σq, Σq²) per dimension from ONE combiner pass, the
    biased variance·n² as an exact integer (n·Σq² − (Σq)², dodging division
    entirely), top-10 dims by (var DESC, dim ASC)."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        q = np.floor(_vecs(t, "embedding") * 1_000_000 + 0.5).astype(np.int64)
        d = q.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "n": pa.array(np.full(d, q.shape[0], np.int64)),
                "s": pa.array(q.sum(axis=0)),
                "ss": pa.array((q * q).sum(axis=0)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("ss", alias_name="ss")
        )
        .to_pandas()
    )
    n = agg["n"].astype(object)
    var_n2 = (n * agg["ss"].astype(object) - agg["s"].astype(object) ** 2).astype(object)
    agg["var_n2"] = [int(v) for v in var_n2]
    agg = agg.sort_values(["var_n2", "dim"], ascending=[False, True], kind="mergesort").head(10)
    return pa.table(
        {
            "dim": pa.array(agg["dim"].to_numpy(np.int64)),
            "n_vectors": pa.array(agg["n"].to_numpy(np.int64)),
            "var_n2": pa.array([int(v) for v in agg["var_n2"]], pa.int64()),
        }
    )


EMBEDDINGS_DIM_VARIANCE_TOPK_SQL = """
WITH ex AS (
  SELECT CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5) AS BIGINT) AS q
  FROM embeddings),
v AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS HUGEINT) AS s, CAST(SUM(q*q) AS HUGEINT) AS ss
      FROM ex GROUP BY 1)
SELECT dim, n AS n_vectors,
       CAST(n*ss - s*s AS BIGINT) AS var_n2
FROM v ORDER BY var_n2 DESC, dim LIMIT 10
"""


def orders_daily_revenue_sax(sf_dir: str):
    """SAX-style time-series symbolization with EXACT rank breakpoints:
    each day's revenue maps to a quartile letter a–d (quantile_disc value
    thresholds, ties never straddle), then days concatenate into per-month
    symbol words — the shape-indexing primitive for motif/anomaly search
    over long series.  Daily revenue is a cents partial; symbolization +
    word assembly are a driver walk over ≤|days| rows."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "d": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
                "rev": _cents(t["o_totalprice"]),
            }
        )
        g = tb.group_by("d").aggregate([("rev", "sum")])
        return g.rename_columns(["d", "rev"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("d", kind="mergesort")
    )
    rev = agg["rev"].to_numpy(np.int64)
    srt = np.sort(rev)
    n = len(srt)
    cuts = [int(srt[-(-k * n // 4) - 1]) for k in (1, 2, 3)]
    sym = np.searchsorted(np.asarray(cuts, np.int64), rev, side="left")
    letters = np.array(["a", "b", "c", "d"])[sym]
    month = agg["d"].str.slice(0, 7)
    import pandas as pd

    words = (
        pd.DataFrame({"month": month.to_numpy(), "ch": letters})
        .groupby("month", sort=True)["ch"]
        .apply("".join)
    )
    return pa.table(
        {
            "month": pa.array(words.index.to_numpy(), pa.string()),
            "sax_word": pa.array(words.to_numpy(), pa.string()),
            "n_days": pa.array([len(w) for w in words], pa.int64()),
        }
    )


ORDERS_DAILY_REVENUE_SAX_SQL = """
WITH d AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
q AS (SELECT unnest(quantile_disc(rev, [0.25, 0.5, 0.75])) AS cut FROM d),
s AS (
  SELECT d.d,
         CASE (SELECT COUNT(*) FROM q WHERE q.cut < d.rev)
           WHEN 0 THEN 'a' WHEN 1 THEN 'b' WHEN 2 THEN 'c' ELSE 'd' END AS ch
  FROM d)
SELECT substring(d, 1, 7) AS month,
       string_agg(ch, '' ORDER BY d) AS sax_word,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM s GROUP BY 1
"""


def party_name_key_audit(sf_dir: str):
    """Schema-convention audit across TWO dimension tables: do
    'Customer#NNNNNNNNN' / 'Supplier#NNNNNNNNN' names actually encode their
    own keys?  The union-of-heterogeneous-reads shape with a vectorized
    regex parse per block; per-table (n, n_match, min/max parsed key)."""
    def make(table: str, name_col: str, key_col: str, prefix: str):
        def partial(t: pa.Table) -> pa.Table:
            parsed = pc.cast(
                pc.replace_substring_regex(
                    t[name_col], pattern=rf"^{prefix}#", replacement=""
                ),
                pa.int64(),
            )
            ok = pc.cast(pc.equal(parsed, pc.cast(t[key_col], pa.int64())), pa.int64())
            return pa.table(
                {
                    "tbl": pa.array([prefix.lower()] * 1, pa.string()),
                    "n": pa.array([t.num_rows], pa.int64()),
                    "n_match": pa.array([pc.sum(ok).as_py() or 0], pa.int64()),
                    "min_key": pa.array([pc.min(parsed).as_py()], pa.int64()),
                    "max_key": pa.array([pc.max(parsed).as_py()], pa.int64()),
                }
            )

        return rd.read_parquet(_t(sf_dir, table), columns=[name_col, key_col]).map_batches(
            partial, batch_format="pyarrow"
        )

    cu = make("customer", "c_name", "c_custkey", "Customer")
    su = make("supplier", "s_name", "s_suppkey", "Supplier")
    return (
        cu.union(su)
        .groupby("tbl")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_match", alias_name="n_match"),
            Min("min_key", alias_name="min_key"),
            Max("max_key", alias_name="max_key"),
        )
    )


PARTY_NAME_KEY_AUDIT_SQL = """
SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN CAST(regexp_replace(c_name, '^Customer#', '')
                           AS BIGINT) = c_custkey THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(MIN(CAST(regexp_replace(c_name, '^Customer#', '') AS BIGINT))
            AS BIGINT) AS min_key,
       CAST(MAX(CAST(regexp_replace(c_name, '^Customer#', '') AS BIGINT))
            AS BIGINT) AS max_key
FROM customer
UNION ALL
SELECT 'supplier', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN CAST(regexp_replace(s_name, '^Supplier#', '')
                           AS BIGINT) = s_suppkey THEN 1 ELSE 0 END) AS BIGINT),
       CAST(MIN(CAST(regexp_replace(s_name, '^Supplier#', '') AS BIGINT)) AS BIGINT),
       CAST(MAX(CAST(regexp_replace(s_name, '^Supplier#', '') AS BIGINT)) AS BIGINT)
FROM supplier
"""


def brand_realized_vs_list_margin(sf_dir: str):
    """Realized-vs-list pricing: per brand, the exact ppm ratio of realized
    lineitem revenue to list price (retailprice × quantity) — discount
    leakage by product line.  The part dimension broadcasts as TWO parallel
    numpy arrays (sorted partkey + payload); the fact pass is one
    block-local partial, so no shuffle ever carries part attributes."""
    part = rd.read_parquet(
        _t(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_retailprice"]
    ).to_pandas()
    part = part.sort_values("p_partkey", kind="mergesort")
    pk = part["p_partkey"].to_numpy(np.int64)
    brand = part["p_brand"].to_numpy()
    retail_c = (
        np.floor(part["p_retailprice"].to_numpy(np.float64) * 100 + 0.5)
    ).astype(np.int64)
    dim_ref = ray.put((pk, brand, retail_c))

    def partial(t: pa.Table) -> pa.Table:
        keys, br, rc = ray.get(dim_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys, lp)
        q = _cents(t["l_quantity"]).to_numpy(zero_copy_only=False)
        realized = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        # list value in cents: retail_cents · qty_centi // 100 per line (exact:
        # qty is whole centi-units in this corpus; mirrored by SQL)
        lst = rc[idx] * q // 100
        tb = pa.table(
            {
                "brand": pa.array(br[idx], pa.string()),
                "realized_cents": pa.array(realized),
                "list_cents": pa.array(lst),
            }
        )
        g = tb.group_by("brand").aggregate(
            [("realized_cents", "sum"), ("list_cents", "sum")]
        )
        return g.rename_columns(["brand", "realized_cents", "list_cents"])

    def finish(t: pa.Table) -> pa.Table:
        r = t["realized_cents"].to_numpy(zero_copy_only=False).astype(object)
        l = t["list_cents"].to_numpy(zero_copy_only=False).astype(object)
        ratio = np.array([int(a) * 1_000_000 // int(b) for a, b in zip(r, l)], np.int64)
        return t.append_column("realized_ppm", pa.array(ratio))

    return (
        rd.read_parquet(
            _t(sf_dir, "lineitem"),
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("brand")
        .aggregate(
            Sum("realized_cents", alias_name="realized_cents"),
            Sum("list_cents", alias_name="list_cents"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


BRAND_REALIZED_VS_LIST_MARGIN_SQL = """
SELECT p_brand AS brand,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS realized_cents,
       CAST(SUM(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)
              * CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) // 100) AS BIGINT)
         AS list_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS HUGEINT)) * 1000000
            // SUM(CAST(FLOOR(p_retailprice*100 + 0.5) AS HUGEINT)
                 * CAST(FLOOR(l_quantity*100 + 0.5) AS HUGEINT) // 100)
            AS BIGINT) AS realized_ppm
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def part_size_price_gamma(sf_dir: str):
    """Goodman–Kruskal gamma: ordinal association between part size and
    retail-price quartile, computed EXACTLY on the bounded (size × quartile)
    contingency grid — concordant/discordant pair counts come from 2-D
    cumulative sums over ≤50×4 cells, never from row pairs.  Output keeps
    P, Q as exact ints plus gamma in signed ppm (explicit SIGN·ABS//)."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_size", "p_retailprice"])

    def grid(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "p": _cents(t["p_retailprice"]),
                "cnt": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by("p").aggregate([("cnt", "sum")]).rename_columns(["p", "cnt"])

    pagg = (
        ds.map_batches(grid, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("p", kind="mergesort")
    )
    vals = pagg["p"].to_numpy(np.int64)
    cum = pagg["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    cuts = np.asarray(
        [int(vals[np.searchsorted(cum, -(-k * n // 4), side="left")]) for k in (1, 2, 3)],
        np.int64,
    )

    def cells(t: pa.Table) -> pa.Table:
        qt = np.searchsorted(cuts, _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False), side="left")
        tb = pa.table(
            {
                "sz": pc.cast(t["p_size"], pa.int64()),
                "qt": pa.array(qt.astype(np.int64)),
                "cnt": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["sz", "qt"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["sz", "qt", "cnt"])

    cell = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["sz", "qt"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    sizes = np.sort(cell["sz"].unique())
    m = np.zeros((len(sizes), 4), np.int64)
    si = {int(s): i for i, s in enumerate(sizes)}
    for _, row in cell.iterrows():
        m[si[int(row["sz"])], int(row["qt"])] = int(row["cnt"])
    # concordant: pair strictly greater in both dims; discordant: strictly
    # opposite — each unordered pair counted once from its smaller-size cell
    R, C = m.shape
    pref = np.zeros((R + 1, C + 1), np.int64)
    pref[1:, 1:] = m.cumsum(0).cumsum(1)
    total = int(m.sum())
    P = 0
    Q = 0
    for i in range(R):
        for j in range(C):
            c_ij = int(m[i, j])
            if not c_ij:
                continue
            gt = (
                total
                - int(pref[R, j + 1])
                - int(pref[i + 1, C])
                + int(pref[i + 1, j + 1])
            )  # rows > i AND cols > j
            low = int(pref[R, j]) - int(pref[i + 1, j])  # rows > i AND cols < j
            P += c_ij * gt
            Q += c_ij * low
    num = P - Q
    den = P + Q
    gamma_ppm = (1 if num >= 0 else -1) * (abs(num) * 1_000_000 // den)
    return pa.table(
        {
            "n_parts": pa.array([total], pa.int64()),
            "concordant": pa.array([P], pa.int64()),
            "discordant": pa.array([Q], pa.int64()),
            "gamma_ppm": pa.array([gamma_ppm], pa.int64()),
        }
    )


PART_SIZE_PRICE_GAMMA_SQL = """
WITH v AS (SELECT p_size AS sz,
                  CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT) AS p
           FROM part),
q AS (SELECT unnest(quantile_disc(p, [0.25, 0.5, 0.75])) AS cut FROM v),
b AS (SELECT sz, (SELECT COUNT(*) FROM q WHERE q.cut < v.p) AS qt FROM v),
pr AS (
  SELECT CAST(SUM(CASE WHEN b2.sz > b1.sz AND b2.qt > b1.qt THEN 1 ELSE 0 END)
         AS BIGINT) AS conc,
         CAST(SUM(CASE WHEN b2.sz > b1.sz AND b2.qt < b1.qt THEN 1 ELSE 0 END)
         AS BIGINT) AS disc
  FROM b b1 JOIN b b2 ON TRUE),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
SELECT t.n AS n_parts, pr.conc AS concordant, pr.disc AS discordant,
       CAST(SIGN(pr.conc - pr.disc) AS BIGINT)
         * (ABS(pr.conc - pr.disc) * 1000000 // (pr.conc + pr.disc)) AS gamma_ppm
FROM pr, t
"""


def orders_key_delta_varint_bytes(sf_dir: str):
    """Storage-cost estimator: exact total LEB128/varint bytes to
    delta-encode the sorted orderkey column (the index-size planning number
    for a sorted key layout).  Ray plan: one global sort, then per-block
    partials sum intra-block gap bytes and carry (first, last) so the
    driver stitches the O(blocks) boundary gaps; varint width is the exact
    integer 1 + Σ_j [gap ≥ 2^(7j)] — no log floats anywhere."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey"]).sort(
        "o_orderkey"
    )
    # j = 1..8 — a positive int64 gap is < 2^63, so 9 bytes is the max width
    TH = (2 ** (7 * np.arange(1, 9, dtype=np.int64))).astype(np.int64)

    def vbytes(g: np.ndarray) -> np.ndarray:
        return 1 + (g[:, None] >= TH[None, :]).sum(axis=1)

    def partial(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        gaps = np.diff(k)
        return pa.table(
            {
                "first": pa.array([int(k[0])], pa.int64()),
                "last": pa.array([int(k[-1])], pa.int64()),
                "n": pa.array([len(k)], pa.int64()),
                "bytes_intra": pa.array([int(vbytes(gaps).sum()) if len(gaps) else 0], pa.int64()),
            }
        )

    blocks = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    blocks = blocks.sort_values("first", kind="mergesort")
    n = int(blocks["n"].sum())
    total = int(blocks["bytes_intra"].sum())
    firsts = blocks["first"].to_numpy(np.int64)
    lasts = blocks["last"].to_numpy(np.int64)
    # boundary gaps between consecutive blocks + the leading sentinel delta
    boundary = np.r_[firsts[0] + 1, firsts[1:] - lasts[:-1]]
    total += int(vbytes(boundary).sum())
    return pa.table(
        {
            "n_keys": pa.array([n], pa.int64()),
            "varint_bytes": pa.array([total], pa.int64()),
            "bytes_per_key_milli": pa.array([total * 1000 // n], pa.int64()),
        }
    )


ORDERS_KEY_DELTA_VARINT_BYTES_SQL = """
WITH k AS (
  SELECT CAST(COALESCE(o_orderkey - LAG(o_orderkey) OVER (ORDER BY o_orderkey),
                       o_orderkey + 1) AS BIGINT) AS gap
  FROM orders),
b AS (
  SELECT 1
       + CASE WHEN gap >= 128 THEN 1 ELSE 0 END
       + CASE WHEN gap >= 16384 THEN 1 ELSE 0 END
       + CASE WHEN gap >= 2097152 THEN 1 ELSE 0 END
       + CASE WHEN gap >= 268435456 THEN 1 ELSE 0 END
       + CASE WHEN gap >= 34359738368 THEN 1 ELSE 0 END
       + CASE WHEN gap >= 4398046511104 THEN 1 ELSE 0 END
       + CASE WHEN gap >= 562949953421312 THEN 1 ELSE 0 END
       + CASE WHEN gap >= 72057594037927936 THEN 1 ELSE 0 END
         AS vb
  FROM k)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(vb) AS BIGINT) AS varint_bytes,
       CAST(SUM(vb) * 1000 // COUNT(*) AS BIGINT) AS bytes_per_key_milli
FROM b
"""


def customer_spend_magnitude_hist(sf_dir: str):
    """Order-of-magnitude histogram of customer lifetime spend: decimal
    digit count of the exact cents total (searchsorted on powers of ten ≙
    LENGTH(CAST(.. AS VARCHAR)) — no log float).  Fact-side cents combiner →
    one custkey groupby → tiny digit census."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    P10 = (10 ** np.arange(1, 19, dtype=np.int64)).astype(np.int64)

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
    )

    def census(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        digits = np.searchsorted(P10, s, side="right") + 1
        tb = pa.table(
            {
                "digits": pa.array(digits.astype(np.int64)),
                "n_customers": pa.array(np.ones(len(s), np.int64)),
                "min_cents": pa.array(s),
                "max_cents": pa.array(s),
            }
        )
        g = tb.group_by("digits").aggregate(
            [("n_customers", "sum"), ("min_cents", "min"), ("max_cents", "max")]
        )
        return g.rename_columns(["digits", "n_customers", "min_cents", "max_cents"])

    return (
        spend.map_batches(census, batch_format="pyarrow")
        .groupby("digits")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Min("min_cents", alias_name="min_cents"),
            Max("max_cents", alias_name="max_cents"),
        )
    )


CUSTOMER_SPEND_MAGNITUDE_HIST_SQL = """
WITH sp AS (
  SELECT CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM orders GROUP BY o_custkey)
SELECT CAST(LENGTH(CAST(s AS VARCHAR)) AS BIGINT) AS digits,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(MIN(s) AS BIGINT) AS min_cents,
       CAST(MAX(s) AS BIGINT) AS max_cents
FROM sp GROUP BY 1
"""


def orders_file_bin_packing(sf_dir: str):
    """Compaction planning: assign per-month partitions (in key order) to
    output bins of ≤50k rows via the exact running-total rule
    bin = cum_rows_before // 50000 — the deterministic small-file-merge
    plan a lakehouse table service would emit.  Month counts are cheap
    partials; the plan itself is a window walk over ≤|months| rows."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "rows": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("month").aggregate([("rows", "sum")])
        return g.rename_columns(["month", "rows"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("rows", alias_name="rows"))
        .to_pandas()
        .sort_values("month", kind="mergesort")
    )
    rows = agg["rows"].to_numpy(np.int64)
    before = np.r_[0, rows.cumsum()[:-1]]
    bins = before // 50_000
    import pandas as pd

    plan = (
        pd.DataFrame({"bin": bins, "month": agg["month"].to_numpy(), "rows": rows})
        .groupby("bin", sort=True)
        .agg(
            n_partitions=("month", "size"),
            rows=("rows", "sum"),
            first_month=("month", "min"),
            last_month=("month", "max"),
        )
        .reset_index()
    )
    return pa.table(
        {
            "bin": pa.array(plan["bin"].to_numpy(np.int64)),
            "n_partitions": pa.array(plan["n_partitions"].to_numpy(np.int64)),
            "rows": pa.array(plan["rows"].to_numpy(np.int64)),
            "first_month": pa.array(plan["first_month"], pa.string()),
            "last_month": pa.array(plan["last_month"], pa.string()),
        }
    )


ORDERS_FILE_BIN_PACKING_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(COUNT(*) AS BIGINT) AS rows
  FROM orders GROUP BY 1),
w AS (
  SELECT month, rows,
         CAST(COALESCE(SUM(rows) OVER (ORDER BY month
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 50000
           AS BIGINT) AS bin
  FROM m)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_partitions,
       CAST(SUM(rows) AS BIGINT) AS rows,
       MIN(month) AS first_month, MAX(month) AS last_month
FROM w GROUP BY 1
"""


def embeddings_kfold_balance(sf_dir: str):
    """Deterministic k-fold assignment (fold = vec_id mod 5 — reproducible
    without RNG) plus the label-balance audit every CV split needs: per
    (fold, label) counts and the label's within-fold share in exact ppm."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "label"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "fold": pa.array(
                    t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 5
                ),
                "label": pc.cast(t["label"], pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["fold", "label"]).aggregate([("n", "sum")])
        return g.rename_columns(["fold", "label", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["fold", "label"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    fold_tot = agg.groupby("fold")["n"].sum()
    agg["share_ppm"] = [
        int(r["n"]) * 1_000_000 // int(fold_tot[r["fold"]]) for _, r in agg.iterrows()
    ]
    return pa.table(
        {
            "fold": pa.array(agg["fold"].to_numpy(np.int64)),
            "label": pa.array(agg["label"].to_numpy(np.int64)),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "share_ppm": pa.array(agg["share_ppm"].to_numpy(np.int64)),
        }
    )


EMBEDDINGS_KFOLD_BALANCE_SQL = """
WITH a AS (
  SELECT CAST(vec_id % 5 AS BIGINT) AS fold, CAST(label AS BIGINT) AS label,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings GROUP BY 1, 2)
SELECT fold, label, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY fold) AS BIGINT)
         AS share_ppm
FROM a
"""


def orders_zchart_we_rules(sf_dir: str):
    """Western-Electric control-chart rules over monthly revenue: rule 1
    (point beyond 3σ) and rule 2 (2 of 3 consecutive beyond 2σ on the same
    side).  µ and σ come from exact cents ints through the usual fixed
    √ expression, so every z and every rule comparison evaluates on
    bit-identical doubles in both engines — window logic on floats is safe
    exactly because the floats themselves can't drift."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "rev": _cents(t["o_totalprice"]),
            }
        )
        g = tb.group_by("month").aggregate([("rev", "sum")])
        return g.rename_columns(["month", "rev"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("month", kind="mergesort")
    )
    rev = [int(x) for x in agg["rev"]]
    n = len(rev)
    s = sum(rev)
    q = sum(r * r for r in rev)
    mu = float(s) / float(n)
    sigma = np.sqrt((float(q) - float(s) * float(s) / float(n)) / float(n - 1))
    z = (np.array([float(r) for r in rev]) - mu) / sigma
    rule1 = (np.abs(z) > 3.0).astype(np.int64)
    above = (z > 2.0).astype(np.int64)
    below = (z < -2.0).astype(np.int64)
    rule2 = np.zeros(n, np.int64)
    for i in range(2, n):
        if above[i - 2 : i + 1].sum() >= 2 or below[i - 2 : i + 1].sum() >= 2:
            rule2[i] = 1
    return pa.table(
        {
            "month": pa.array(agg["month"].to_numpy(), pa.string()),
            "rev_cents": pa.array(rev, pa.int64()),
            "z": pa.array(z, pa.float64()),
            "rule1": pa.array(rule1),
            "rule2": pa.array(rule2),
        }
    )


ORDERS_ZCHART_WE_RULES_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev) AS BIGINT) AS s,
             SUM(CAST(rev AS HUGEINT)*rev) AS q
      FROM m),
z AS (
  SELECT month, rev,
         (CAST(rev AS DOUBLE) - CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
           / sqrt((CAST(q AS DOUBLE)
                   - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                  / CAST(n-1 AS DOUBLE)) AS z
  FROM m, t),
f AS (
  SELECT month, rev, z,
         CASE WHEN ABS(z) > 3e0 THEN 1 ELSE 0 END AS rule1,
         CASE WHEN z > 2e0 THEN 1 ELSE 0 END AS ab,
         CASE WHEN z < -2e0 THEN 1 ELSE 0 END AS be
  FROM z),
w AS (
  SELECT month, rev, z, rule1,
         CASE WHEN ROW_NUMBER() OVER (ORDER BY month) >= 3
                   AND (SUM(ab) OVER (ORDER BY month
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2
                     OR SUM(be) OVER (ORDER BY month
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2)
              THEN 1 ELSE 0 END AS rule2
  FROM f)
SELECT month, CAST(rev AS BIGINT) AS rev_cents, z,
       CAST(rule1 AS BIGINT) AS rule1, CAST(rule2 AS BIGINT) AS rule2
FROM w
"""


def part_attr_saturation(sf_dir: str):
    """Data-profiling saturation: how much of the (brand × type × size)
    attribute cube is actually populated — |distinct triples| vs the product
    of per-column cardinalities, in exact ppm.  Block-local DISTINCT
    combiners (pa group_by with no aggregate) keep the shuffle at
    O(populated cells)."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_brand", "p_type", "p_size"])

    triples = (
        ds.map_batches(
            lambda t: t.group_by(["p_brand", "p_type", "p_size"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Count(alias_name="m"))
        .to_pandas()
    )
    n_triples = len(triples)
    nb = triples["p_brand"].nunique()
    nt = triples["p_type"].nunique()
    ns = triples["p_size"].nunique()
    return pa.table(
        {
            "n_brands": pa.array([nb], pa.int64()),
            "n_types": pa.array([nt], pa.int64()),
            "n_sizes": pa.array([ns], pa.int64()),
            "n_triples": pa.array([n_triples], pa.int64()),
            "saturation_ppm": pa.array(
                [n_triples * 1_000_000 // (nb * nt * ns)], pa.int64()
            ),
        }
    )


PART_ATTR_SATURATION_SQL = """
WITH tr AS (SELECT DISTINCT p_brand, p_type, p_size FROM part),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triples,
             CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS nb,
             CAST(COUNT(DISTINCT p_type) AS BIGINT) AS nt,
             CAST(COUNT(DISTINCT p_size) AS BIGINT) AS ns
      FROM tr)
SELECT nb AS n_brands, nt AS n_types, ns AS n_sizes, n_triples,
       CAST(n_triples * 1000000 // (nb*nt*ns) AS BIGINT) AS saturation_ppm
FROM t
"""


def lineitem_discount_jonckheere(sf_dir: str):
    """Jonckheere–Terpstra ordered-alternative trend test: does quantity
    rise across ordered discount bands LOW(≤3 %) < MID(4–6 %) < HIGH(≥7 %)?
    J = Σ_{g<h} U_gh, each pairwise Mann–Whitney term computed EXACTLY on
    the shared per-value quantity grid with the doubled-U midrank identity
    2·U_gh = Σ_v c_h(v)·(2·cum_g(<v) + c_g(v)) — three grid convolutions,
    zero row pairs."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_discount", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        pct = _cents(t["l_discount"])  # discount in whole percent ×... centi
        q = _cents(t["l_quantity"])
        p = pct.to_numpy(zero_copy_only=False)
        lo = (p <= 3).astype(np.int64)
        mid = ((p >= 4) & (p <= 6)).astype(np.int64)
        hi = (p >= 7).astype(np.int64)
        tb = pa.table(
            {
                "q": q,
                "lo": pa.array(lo),
                "mid": pa.array(mid),
                "hi": pa.array(hi),
            }
        )
        g = tb.group_by("q").aggregate([("lo", "sum"), ("mid", "sum"), ("hi", "sum")])
        return g.rename_columns(["q", "lo", "mid", "hi"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("q")
        .aggregate(
            Sum("lo", alias_name="lo"),
            Sum("mid", alias_name="mid"),
            Sum("hi", alias_name="hi"),
        )
        .to_pandas()
        .sort_values("q", kind="mergesort")
    )
    lo = agg["lo"].to_numpy(np.int64)
    mid = agg["mid"].to_numpy(np.int64)
    hi = agg["hi"].to_numpy(np.int64)
    clo = lo.cumsum() - lo
    cmid = mid.cumsum() - mid
    j2 = int(
        (mid * (2 * clo + lo)).sum()
        + (hi * (2 * clo + lo)).sum()
        + (hi * (2 * cmid + mid)).sum()
    )
    return pa.table(
        {
            "n_low": pa.array([int(lo.sum())], pa.int64()),
            "n_mid": pa.array([int(mid.sum())], pa.int64()),
            "n_high": pa.array([int(hi.sum())], pa.int64()),
            "j2": pa.array([j2], pa.int64()),
        }
    )


LINEITEM_DISCOUNT_JONCKHEERE_SQL = """
WITH v AS (
  SELECT CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS q,
         CASE WHEN CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) <= 3
              THEN 1 ELSE 0 END AS lo,
         CASE WHEN CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) BETWEEN 4 AND 6
              THEN 1 ELSE 0 END AS mid,
         CASE WHEN CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) >= 7
              THEN 1 ELSE 0 END AS hi
  FROM lineitem),
c AS (SELECT q, CAST(SUM(lo) AS BIGINT) AS lo, CAST(SUM(mid) AS BIGINT) AS mid,
             CAST(SUM(hi) AS BIGINT) AS hi
      FROM v GROUP BY 1),
w AS (SELECT lo, mid, hi,
             CAST(SUM(lo) OVER (ORDER BY q) AS BIGINT) - lo AS clo,
             CAST(SUM(mid) OVER (ORDER BY q) AS BIGINT) - mid AS cmid
      FROM c)
SELECT CAST(SUM(lo) AS BIGINT) AS n_low,
       CAST(SUM(mid) AS BIGINT) AS n_mid,
       CAST(SUM(hi) AS BIGINT) AS n_high,
       CAST(SUM(mid*(2*clo + lo) + hi*(2*clo + lo) + hi*(2*cmid + mid)) AS BIGINT)
         AS j2
FROM w
"""


def docs_lang_berger_parker(sf_dir: str):
    """Berger–Parker dominance index — the log-free diversity number: the
    single most common language's share of the corpus in exact ppm
    ((count DESC, lang ASC) tie-break).  One tiny lang census."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": t["lang"], "n": pa.array(np.ones(t.num_rows, np.int64))})
            .group_by("lang")
            .aggregate([("n", "sum")])
        )
        return g.rename_columns(["lang", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "lang"], ascending=[False, True], kind="mergesort")
    )
    total = int(agg["n"].sum())
    top = agg.iloc[0]
    return pa.table(
        {
            "n_docs": pa.array([total], pa.int64()),
            "top_lang": pa.array([top["lang"]], pa.string()),
            "top_n": pa.array([int(top["n"])], pa.int64()),
            "bp_ppm": pa.array([int(top["n"]) * 1_000_000 // total], pa.int64()),
        }
    )


DOCS_LANG_BERGER_PARKER_SQL = """
WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT t.total AS n_docs, c.lang AS top_lang, c.n AS top_n,
       CAST(c.n * 1000000 // t.total AS BIGINT) AS bp_ppm
FROM c, t ORDER BY c.n DESC, c.lang LIMIT 1
"""


def events_user_coverage_union(sf_dir: str):
    """Interval-UNION length per user: each event opens a 300-second
    activity window; overlaps merge (the classic sweep
    Σ min(next−cur, W) + W on the sorted timestamps — exact µs integers),
    giving covered seconds vs raw span — the airtime/utilization shape.
    Groups co-partition by user; the sweep is a vectorized diff per group."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    W = 300_000_000  # 300 s in µs

    def sweep(g: pa.Table) -> pa.Table:
        ts = np.sort(
            g["ts"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        gaps = np.diff(ts)
        covered = int(np.minimum(gaps, W).sum()) + W
        return pa.table(
            {
                "user_id": pc.cast(g["user_id"].slice(0, 1), pa.int64()),
                "n_events": pa.array([len(ts)], pa.int64()),
                "covered_seconds": pa.array([covered // 1_000_000], pa.int64()),
                "span_seconds": pa.array(
                    [int(ts[-1] - ts[0]) // 1_000_000], pa.int64()
                ),
            }
        )

    return ds.groupby("user_id").map_groups(sweep, batch_format="pyarrow")


EVENTS_USER_COVERAGE_UNION_SQL = """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
  FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST((SUM(CASE WHEN nxt IS NULL THEN 300000000
                      ELSE LEAST(nxt - t, 300000000) END)) // 1000000 AS BIGINT)
         AS covered_seconds,
       CAST((MAX(t) - MIN(t)) // 1000000 AS BIGINT) AS span_seconds
FROM s GROUP BY 1
"""


def unused_dimension_census(sf_dir: str):
    """Reverse referential audit: dimension rows NO fact ever references —
    parts and suppliers unused by lineitem, customers without orders.
    Fact-side DISTINCT-key combiners shrink each scan to its key set; the
    dim side contributes only its count, so the census never joins full
    tables."""
    def used_count(table: str, col: str) -> int:
        return (
            rd.read_parquet(_t(sf_dir, table), columns=[col])
            .map_batches(
                lambda t, c=col: t.group_by([c]).aggregate([]),
                batch_format="pyarrow",
            )
            .groupby(col)
            .aggregate(Count(alias_name="m"))
            .count()
        )

    def dim_count(table: str) -> int:
        return rd.read_parquet(_t(sf_dir, table)).count()

    rows = []
    for dim, dim_table, fact_table, fk in (
        ("part", "part", "lineitem", "l_partkey"),
        ("supplier", "supplier", "lineitem", "l_suppkey"),
        ("customer", "customer", "orders", "o_custkey"),
    ):
        n_dim = dim_count(dim_table)
        n_used = used_count(fact_table, fk)
        rows.append((dim, n_dim, n_used, n_dim - n_used))
    return pa.table(
        {
            "dim": pa.array([r[0] for r in rows], pa.string()),
            "n_total": pa.array([r[1] for r in rows], pa.int64()),
            "n_used": pa.array([r[2] for r in rows], pa.int64()),
            "n_unused": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


UNUSED_DIMENSION_CENSUS_SQL = """
SELECT 'part' AS dim,
       CAST((SELECT COUNT(*) FROM part) AS BIGINT) AS n_total,
       CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS n_used,
       CAST((SELECT COUNT(*) FROM part)
          - (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS BIGINT) AS n_unused
UNION ALL
SELECT 'supplier',
       CAST((SELECT COUNT(*) FROM supplier) AS BIGINT),
       CAST((SELECT COUNT(DISTINCT l_suppkey) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM supplier)
          - (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem) AS BIGINT)
UNION ALL
SELECT 'customer',
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
       CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM customer)
          - (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT)
"""


def embeddings_centroid_confusion(sf_dir: str):
    """Nearest-centroid classifier CONFUSION MATRIX with exact integer
    geometry: per-label µ-unit sums → truncated integer centroids
    (explicit SIGN·(ABS//n), matching DuckDB `//` on negative sums), then
    every vector's squared distance to all centroids is pure int64 and the
    argmin (distance, label) tie-break is total — so the (true, pred, n)
    matrix is bit-stable at any parallelism AND in SQL.  The centroid
    matrix broadcasts; scoring is one vectorized pass."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"))

    def stats_partial(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lab) == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sv": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        q = np.floor(_vecs(t, "embedding") * 1_000_000 + 0.5).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "sv": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    st = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sv", alias_name="sv"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["label", "dim"], kind="mergesort")
    )
    labels = np.sort(st["label"].unique()).astype(np.int64)
    d = int(st["dim"].max()) + 1
    sv = st["sv"].to_numpy(np.int64).reshape(len(labels), d)
    n_c = st.groupby("label")["n"].first().loc[labels].to_numpy(np.int64)
    cent = np.sign(sv) * (np.abs(sv) // n_c[:, None])
    cent_ref = ray.put((labels, cent))

    def score(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        labs, cm = ray.get(cent_ref)
        q = np.floor(_vecs(t, "embedding") * 1_000_000 + 0.5).astype(np.int64)
        # dist[i, c] = Σ_dim (q_i − cent_c)², exact int64
        dist = (
            (q * q).sum(axis=1)[:, None]
            - 2 * (q @ cm.T)
            + (cm * cm).sum(axis=1)[None, :]
        )
        pred = labs[np.argmin(dist, axis=1)]  # argmin takes FIRST min → label asc
        tb = pa.table(
            {
                "true_label": pc.cast(t["label"], pa.int64()),
                "pred_label": pa.array(pred.astype(np.int64)),
                "n": pa.array(np.ones(len(pred), np.int64)),
            }
        )
        g = tb.group_by(["true_label", "pred_label"]).aggregate([("n", "sum")])
        return g.rename_columns(["true_label", "pred_label", "n"])

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby(["true_label", "pred_label"])
        .aggregate(Sum("n", alias_name="n"))
    )


EMBEDDINGS_CENTROID_CONFUSION_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5) AS BIGINT) AS q,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim
  FROM embeddings),
ls AS (SELECT label, dim, CAST(SUM(q) AS BIGINT) AS sv,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM ex GROUP BY 1, 2),
cent AS (SELECT label, dim,
                CAST(SIGN(sv) AS BIGINT) * (ABS(sv) // n) AS c
         FROM ls),
dist AS (
  SELECT ex.vec_id, cent.label AS clabel,
         CAST(SUM((ex.q - cent.c)*(ex.q - cent.c)) AS BIGINT) AS d2
  FROM ex JOIN cent ON ex.dim = cent.dim
  GROUP BY 1, 2),
pred AS (
  SELECT vec_id, clabel AS pred_label,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
  FROM dist),
tl AS (SELECT DISTINCT vec_id, CAST(label AS BIGINT) AS true_label FROM embeddings)
SELECT tl.true_label, pred.pred_label, CAST(COUNT(*) AS BIGINT) AS n
FROM tl JOIN pred ON tl.vec_id = pred.vec_id AND pred.rn = 1
GROUP BY 1, 2
"""


def docs_dedup_token_counts(sf_dir: str):
    """Dedup-aware corpus accounting — the number every data card reports:
    token totals BEFORE vs AFTER exact-text dedup (winner = min doc_id per
    distinct text).  One pass computes per-block (text-hash → min_id,
    token_count, n) partials keyed by a 16-byte content digest, so the
    shuffle never carries text; winners keep one token count each."""
    import hashlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t["text"].to_pylist()
        toks = np.array([len(s.split()) if s else 0 for s in txt], np.int64)
        digest = [hashlib.md5((s or "").encode()).hexdigest() for s in txt]
        tb = pa.table(
            {
                "h": pa.array(digest, pa.string()),
                "min_id": t["doc_id"],
                "toks": pa.array(toks),
                "n": pa.array(np.ones(len(txt), np.int64)),
            }
        )
        g = tb.group_by("h").aggregate(
            [("min_id", "min"), ("toks", "min"), ("n", "sum")]
        )
        return g.rename_columns(["h", "min_id", "toks", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(
            Min("min_id", alias_name="min_id"),
            Min("toks", alias_name="toks"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    n_docs = int(agg["n"].sum())
    n_unique = len(agg)
    toks_unique = int(agg["toks"].sum())
    toks_total = int((agg["toks"] * agg["n"]).sum())
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_unique_docs": pa.array([n_unique], pa.int64()),
            "tokens_total": pa.array([toks_total], pa.int64()),
            "tokens_after_dedup": pa.array([toks_unique], pa.int64()),
            "kept_ppm": pa.array(
                [toks_unique * 1_000_000 // toks_total], pa.int64()
            ),
        }
    )


DOCS_DEDUP_TOKEN_COUNTS_SQL = """
WITH d AS (
  SELECT text,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
           AS toks
  FROM documents),
g AS (SELECT text, CAST(MIN(toks) AS BIGINT) AS toks,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY 1)
SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_unique_docs,
       CAST(SUM(toks*n) AS BIGINT) AS tokens_total,
       CAST(SUM(toks) AS BIGINT) AS tokens_after_dedup,
       CAST(SUM(toks) * 1000000 // SUM(toks*n) AS BIGINT) AS kept_ppm
FROM g
"""


def nation_rank_footrule_yoy(sf_dir: str):
    """Rank-stability audit: Spearman's FOOTRULE distance Σ|rank_t −
    rank_{t+1}| between nation revenue rankings of consecutive years —
    league-table churn, one exact int per year pair.  Revenue partials
    route suppkey→nation through the broadcast dim map; ranking the ≤25
    nations per year and the pairwise walk are driver work."""
    sup = rd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nat = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    s2n = {int(k): nmap[int(v)] for k, v in zip(sup["s_suppkey"], sup["s_nationkey"])}
    s2n_ref = ray.put(s2n)

    def partial(t: pa.Table) -> pa.Table:
        smap = ray.get(s2n_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        tb = pa.table(
            {
                "nation": pa.array([smap[int(k)] for k in sk], pa.string()),
                "yr": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "rev": _cents(t["l_extendedprice"]),
            }
        )
        g = tb.group_by(["nation", "yr"]).aggregate([("rev", "sum")])
        return g.rename_columns(["nation", "yr", "rev"])

    agg = (
        rd.read_parquet(
            _t(sf_dir, "lineitem"),
            columns=["l_suppkey", "l_shipdate", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["nation", "yr"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    years = sorted(agg["yr"].unique())
    ranks = {}
    for yr in years:
        g = agg[agg["yr"] == yr].sort_values(
            ["rev", "nation"], ascending=[False, True], kind="mergesort"
        )
        ranks[yr] = {nm: i + 1 for i, nm in enumerate(g["nation"])}
    rows = []
    for y0, y1 in zip(years, years[1:]):
        common = sorted(set(ranks[y0]) & set(ranks[y1]))
        fr = sum(abs(ranks[y0][nm] - ranks[y1][nm]) for nm in common)
        rows.append((y0, y1, len(common), fr))
    return pa.table(
        {
            "yr_from": pa.array([r[0] for r in rows], pa.int64()),
            "yr_to": pa.array([r[1] for r in rows], pa.int64()),
            "n_common": pa.array([r[2] for r in rows], pa.int64()),
            "footrule": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


NATION_RANK_FOOTRULE_YOY_SQL = """
WITH rev AS (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2),
r AS (
  SELECT nation, yr,
         ROW_NUMBER() OVER (PARTITION BY yr ORDER BY rev DESC, nation) AS rk
  FROM rev)
SELECT a.yr AS yr_from, b.yr AS yr_to,
       CAST(COUNT(*) AS BIGINT) AS n_common,
       CAST(SUM(ABS(a.rk - b.rk)) AS BIGINT) AS footrule
FROM r a JOIN r b ON a.nation = b.nation AND b.yr = a.yr + 1
GROUP BY 1, 2
"""


def docs_vocab_source_venn(sf_dir: str):
    """Three-set Venn decomposition of the vocabulary by source: every term
    gets a presence BITMASK over the three sources; the census over the 7
    nonempty regions is exact — the containment picture two pairwise
    Jaccards can't show.  Per-block (term, source) distinct combiners →
    one vocab-sized groupby → a 7-row mask census."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])
    srcs = ["src0", "src1", "src2"]

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["source"], value_set=pa.array(srcs, pa.string())))
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), reps)
        tb = pa.table({"term": flat, "source": pa.array(src, pa.string())})
        tb = tb.filter(pc.not_equal(tb["term"], ""))
        return tb.group_by(["term", "source"]).aggregate([])

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["term", "source"])
        .aggregate(Count(alias_name="m"))
        .to_pandas()[["term", "source"]]
    )
    bit = {s: 1 << i for i, s in enumerate(srcs)}
    pairs["b"] = pairs["source"].map(bit)
    masks = pairs.groupby("term")["b"].sum()
    import pandas as pd

    census = masks.value_counts().sort_index()
    labels = {
        1: "src0_only", 2: "src1_only", 4: "src2_only",
        3: "src0_src1", 5: "src0_src2", 6: "src1_src2",
        7: "all_three",
    }
    return pa.table(
        {
            "region": pa.array([labels[int(m)] for m in census.index], pa.string()),
            "mask": pa.array([int(m) for m in census.index], pa.int64()),
            "n_terms": pa.array([int(v) for v in census.to_numpy()], pa.int64()),
        }
    )


DOCS_VOCAB_SOURCE_VENN_SQL = """
WITH toks AS (
  SELECT DISTINCT source,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
m AS (
  SELECT term,
         CAST(SUM(CASE source WHEN 'src0' THEN 1 WHEN 'src1' THEN 2
                  WHEN 'src2' THEN 4 ELSE 0 END) AS BIGINT) AS mask
  FROM toks WHERE term <> '' GROUP BY 1)
SELECT CASE mask WHEN 1 THEN 'src0_only' WHEN 2 THEN 'src1_only'
                 WHEN 4 THEN 'src2_only' WHEN 3 THEN 'src0_src1'
                 WHEN 5 THEN 'src0_src2' WHEN 6 THEN 'src1_src2'
                 ELSE 'all_three' END AS region,
       mask, CAST(COUNT(*) AS BIGINT) AS n_terms
FROM m GROUP BY mask
"""


def orders_daily_updown_runs(sf_dir: str):
    """Wald–Wolfowitz runs ON THE DERIVATIVE: sign changes of daily revenue
    diffs (zero diffs dropped, the standard convention), with the classic
    expected runs (2n−1)/3 and variance (16n−29)/90 feeding one fixed-IEEE
    z — randomness-of-direction for the revenue series.  Daily revenue is a
    cents partial; the run walk is a driver pass."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "d": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
                "rev": _cents(t["o_totalprice"]),
            }
        )
        g = tb.group_by("d").aggregate([("rev", "sum")])
        return g.rename_columns(["d", "rev"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("d", kind="mergesort")
    )
    rev = agg["rev"].to_numpy(np.int64)
    sgn = np.sign(np.diff(rev))
    sgn = sgn[sgn != 0]
    n = len(sgn)
    runs = 1 + int((sgn[1:] != sgn[:-1]).sum())
    z = (float(runs) - (2.0 * float(n) - 1.0) / 3.0) / np.sqrt(
        (16.0 * float(n) - 29.0) / 90.0
    )
    return pa.table(
        {
            "n_diffs": pa.array([n], pa.int64()),
            "n_runs": pa.array([runs], pa.int64()),
            "z": pa.array([z], pa.float64()),
        }
    )


ORDERS_DAILY_UPDOWN_RUNS_SQL = """
WITH d AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
s AS (
  SELECT d, CAST(SIGN(rev - LAG(rev) OVER (ORDER BY d)) AS BIGINT) AS sg
  FROM d QUALIFY sg IS NOT NULL AND sg <> 0),
r AS (
  SELECT sg, LAG(sg) OVER (ORDER BY d) AS prev
  FROM s),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND sg <> prev
                          THEN 1 ELSE 0 END) AS BIGINT) AS runs
      FROM r)
SELECT n AS n_diffs, runs AS n_runs,
       (CAST(runs AS DOUBLE) - (2e0*CAST(n AS DOUBLE) - 1e0)/3e0)
         / sqrt((16e0*CAST(n AS DOUBLE) - 29e0)/90e0) AS z
FROM t
"""


def events_user_lifetime_km(sf_dir: str):
    """Kaplan–Meier survival with RIGHT CENSORING and integer-truncated
    products: user lifetime = whole days first→last event; users whose last
    event falls within 3 days of the corpus horizon are censored (still
    alive).  The survival curve is the recursive integer statistic
    S_k = S_{k−1}·(n_k − d_k) // n_k in ppm — truncation at every step makes
    it bit-reproducible, and the oracle replays the identical recursion via
    WITH RECURSIVE.  Per-user (min, max) partials → one small census; the
    ≤|distinct lifetimes| recursion runs on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    day_us = 86_400_000_000
    horizon = ds.aggregate(Max("ts"))["max(ts)"]
    h_us = int(np.datetime64(horizon, "us").astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {"u": t["user_id"], "first_ts": t["ts"], "last_ts": t["ts"]}
        )
        g = tb.group_by("u").aggregate([("first_ts", "min"), ("last_ts", "max")])
        return g.rename_columns(["u", "first_ts", "last_ts"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Min("first_ts", alias_name="first_ts"), Max("last_ts", alias_name="last_ts"))
        .to_pandas()
    )
    f = agg["first_ts"].to_numpy("datetime64[us]").astype(np.int64)
    l = agg["last_ts"].to_numpy("datetime64[us]").astype(np.int64)
    life = (l - f) // day_us
    censored = (h_us - l) < 3 * day_us
    import pandas as pd

    df = pd.DataFrame({"t": life, "c": censored.astype(np.int64)})
    grid = (
        df.groupby("t", sort=True)
        .agg(d=("c", lambda s: int((1 - s).sum())), cens=("c", "sum"))
        .reset_index()
    )
    at_risk = int(len(df))
    s_ppm = 1_000_000
    rows = []
    for _, r in grid.iterrows():
        t_k, d_k, c_k = int(r["t"]), int(r["d"]), int(r["cens"])
        if d_k > 0:
            s_ppm = s_ppm * (at_risk - d_k) // at_risk
        rows.append((t_k, at_risk, d_k, c_k, s_ppm))
        at_risk -= d_k + c_k
    return pa.table(
        {
            "t_days": pa.array([r[0] for r in rows], pa.int64()),
            "n_risk": pa.array([r[1] for r in rows], pa.int64()),
            "d_churn": pa.array([r[2] for r in rows], pa.int64()),
            "n_censored": pa.array([r[3] for r in rows], pa.int64()),
            "km_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


EVENTS_USER_LIFETIME_KM_SQL = """
WITH RECURSIVE u AS (
  SELECT user_id, MIN(ts) AS f, MAX(ts) AS l FROM events GROUP BY 1),
h AS (SELECT MAX(ts) AS horizon FROM events),
lf AS (
  SELECT CAST((epoch_us(l) - epoch_us(f)) // 86400000000 AS BIGINT) AS t,
         CASE WHEN epoch_us(h.horizon) - epoch_us(l) < 3*86400000000
              THEN 1 ELSE 0 END AS c
  FROM u, h),
grid AS (
  SELECT t, CAST(SUM(1-c) AS BIGINT) AS d, CAST(SUM(c) AS BIGINT) AS cens,
         ROW_NUMBER() OVER (ORDER BY t) AS rn
  FROM lf GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lf),
rec AS (
  SELECT g.rn, g.t, tot.n AS n_risk, g.d, g.cens,
         CASE WHEN g.d > 0 THEN 1000000 * (tot.n - g.d) // tot.n
              ELSE CAST(1000000 AS BIGINT) END AS s_ppm
  FROM grid g, tot WHERE g.rn = 1
  UNION ALL
  SELECT g.rn, g.t, r.n_risk - r.d - r.cens AS n_risk, g.d, g.cens,
         CASE WHEN g.d > 0
              THEN r.s_ppm * (r.n_risk - r.d - r.cens - g.d)
                     // (r.n_risk - r.d - r.cens)
              ELSE r.s_ppm END AS s_ppm
  FROM grid g JOIN rec r ON g.rn = r.rn + 1)
SELECT t AS t_days, n_risk, d AS d_churn, cens AS n_censored,
       CAST(s_ppm AS BIGINT) AS km_ppm
FROM rec
"""


def orders_monthly_urgent_eb_shrinkage(sf_dir: str):
    """Empirical-Bayes shrinkage: each month's URGENT share pulled toward the
    global rate with prior strength k=100 — the small-sample-rate smoothing
    every dashboard needs, kept exact by clearing denominators:
    smoothed_ppm = (u·N + 100·U)·10⁶ // (N·(n+100)) with all five factors
    exact ints (arbitrary precision on the driver, HUGEINT in DuckDB)."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderdate", "o_orderpriority"]
    )

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "u": pc.cast(pc.equal(t["o_orderpriority"], "1-URGENT"), pa.int64()),
            }
        )
        g = tb.group_by("month").aggregate([("n", "sum"), ("u", "sum")])
        return g.rename_columns(["month", "n", "u"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("n", alias_name="n"), Sum("u", alias_name="u"))
        .to_pandas()
    )
    N = int(agg["n"].sum())
    U = int(agg["u"].sum())
    raw = [int(u) * 1_000_000 // int(n) for n, u in zip(agg["n"], agg["u"])]
    smooth = [
        (int(u) * N + 100 * U) * 1_000_000 // (N * (int(n) + 100))
        for n, u in zip(agg["n"], agg["u"])
    ]
    return pa.table(
        {
            "month": pa.array(agg["month"], pa.string()),
            "n_orders": pa.array(agg["n"].to_numpy(np.int64)),
            "n_urgent": pa.array(agg["u"].to_numpy(np.int64)),
            "raw_ppm": pa.array(raw, pa.int64()),
            "smoothed_ppm": pa.array(smooth, pa.int64()),
        }
    )


ORDERS_MONTHLY_URGENT_EB_SHRINKAGE_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS HUGEINT) AS u
  FROM orders GROUP BY 1),
t AS (SELECT SUM(n) AS tn, SUM(u) AS tu FROM m)
SELECT month, CAST(n AS BIGINT) AS n_orders, CAST(u AS BIGINT) AS n_urgent,
       CAST(u * 1000000 // n AS BIGINT) AS raw_ppm,
       CAST((u*t.tn + 100*t.tu) * 1000000 // (t.tn*(n + 100)) AS BIGINT)
         AS smoothed_ppm
FROM m, t
"""


def events_capture_recapture_users(sf_dir: str):
    """Lincoln–Petersen capture–recapture: estimate the user population from
    two deterministic 'captures' (active in days 1–10 vs days 11–20 of the
    month) and compare with the true distinct count — the mark-recapture
    estimator N̂ = n₁·n₂ // m.  Per-user presence bitmasks OR-merge in one
    groupby; every output number is an exact integer."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.day(t["ts"]).to_numpy(zero_copy_only=False).astype(np.int64)
        a = ((day >= 1) & (day <= 10)).astype(np.int64)
        b = ((day >= 11) & (day <= 20)).astype(np.int64)
        tb = pa.table(
            {"u": t["user_id"], "a": pa.array(a), "b": pa.array(b)}
        )
        g = tb.group_by("u").aggregate([("a", "max"), ("b", "max")])
        return g.rename_columns(["u", "a", "b"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Max("a", alias_name="a"), Max("b", alias_name="b"))
        .to_pandas()
    )
    n1 = int(agg["a"].sum())
    n2 = int(agg["b"].sum())
    m = int(((agg["a"] == 1) & (agg["b"] == 1)).sum())
    n_true = len(agg)
    n_hat = n1 * n2 // m
    return pa.table(
        {
            "n_sample1": pa.array([n1], pa.int64()),
            "n_sample2": pa.array([n2], pa.int64()),
            "n_marked": pa.array([m], pa.int64()),
            "n_hat": pa.array([n_hat], pa.int64()),
            "n_true": pa.array([n_true], pa.int64()),
            "err_ppm": pa.array(
                [abs(n_hat - n_true) * 1_000_000 // n_true], pa.int64()
            ),
        }
    )


EVENTS_CAPTURE_RECAPTURE_USERS_SQL = """
WITH p AS (
  SELECT user_id,
         CAST(MAX(CASE WHEN EXTRACT(day FROM ts) BETWEEN 1 AND 10
                  THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(MAX(CASE WHEN EXTRACT(day FROM ts) BETWEEN 11 AND 20
                  THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM events GROUP BY 1),
t AS (SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2,
             CAST(SUM(a*b) AS BIGINT) AS m, CAST(COUNT(*) AS BIGINT) AS n_true
      FROM p)
SELECT n1 AS n_sample1, n2 AS n_sample2, m AS n_marked,
       CAST(n1*n2 // m AS BIGINT) AS n_hat, n_true,
       CAST(ABS(n1*n2 // m - n_true) * 1000000 // n_true AS BIGINT) AS err_ppm
FROM t
"""


def orders_german_tank_estimate(sf_dir: str):
    """German-tank (serial-number) estimation: from only the orderkeys seen
    in the FIRST order year, estimate the whole keyspace with the MVU
    estimator N̂ = m(1 + 1/k) − 1 on 1-based serials, integer-truncated the
    same way on both engines — sampling-theory inference as a data op, with
    the true keyspace alongside."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    yr_min = int(
        np.datetime64(ds.aggregate(Min("o_orderdate"))["min(o_orderdate)"], "us")
        .astype("datetime64[Y]")
        .astype(int)
    ) + 1970

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"])
        sub = t.filter(pc.equal(yr, yr_min))
        mx_s = pc.max(sub["o_orderkey"]).as_py() if sub.num_rows else None
        return pa.table(
            {
                "k": pa.array([sub.num_rows], pa.int64()),
                "mx": pa.array([-1 if mx_s is None else int(mx_s)], pa.int64()),
                "gmx": pa.array([int(pc.max(t["o_orderkey"]).as_py())], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    k = int(agg["k"].sum())
    m1 = int(agg["mx"].max()) + 1  # 1-based max serial in the sample
    n_true = int(agg["gmx"].max()) + 1
    n_hat = m1 + m1 // k - 1
    return pa.table(
        {
            "sample_year": pa.array([yr_min], pa.int64()),
            "k_seen": pa.array([k], pa.int64()),
            "max_serial": pa.array([m1], pa.int64()),
            "n_hat": pa.array([n_hat], pa.int64()),
            "n_true": pa.array([n_true], pa.int64()),
            "err_ppm": pa.array(
                [abs(n_hat - n_true) * 1_000_000 // n_true], pa.int64()
            ),
        }
    )


ORDERS_GERMAN_TANK_ESTIMATE_SQL = """
WITH y AS (SELECT CAST(EXTRACT(year FROM MIN(o_orderdate)) AS BIGINT) AS yr
           FROM orders),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(MAX(o_orderkey) + 1 AS BIGINT) AS m1
      FROM orders, y WHERE EXTRACT(year FROM o_orderdate) = y.yr),
t AS (SELECT CAST(MAX(o_orderkey) + 1 AS BIGINT) AS n_true FROM orders)
SELECT y.yr AS sample_year, s.k AS k_seen, s.m1 AS max_serial,
       CAST(s.m1 + s.m1 // s.k - 1 AS BIGINT) AS n_hat, t.n_true,
       CAST(ABS(s.m1 + s.m1 // s.k - 1 - t.n_true) * 1000000 // t.n_true
            AS BIGINT) AS err_ppm
FROM s, t, y
"""


def docs_hash_truncation_collisions(sf_dir: str):
    """Hash-infrastructure audit: collisions when content digests truncate
    to 16 bits — observed (over DISTINCT texts, so content dups don't count)
    vs the birthday-bound expectation n(n−1)·1000 // (2·65536) in exact
    milli.  Block partials carry (hash16, min-full-digest) so text never
    shuffles; both engines compute the identical md5."""
    import hashlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        digests = sorted({hashlib.md5((s or "").encode()).hexdigest() for s in t["text"].to_pylist()})
        return pa.table({"h": pa.array(digests, pa.string())})

    uniq = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="m"))
        .to_pandas()
    )
    n = len(uniq)
    h16 = uniq["h"].str.slice(0, 4).nunique()
    collisions = n - int(h16)
    expected_milli = n * (n - 1) * 1000 // (2 * 65536)
    return pa.table(
        {
            "n_unique_texts": pa.array([n], pa.int64()),
            "n_distinct_h16": pa.array([int(h16)], pa.int64()),
            "collisions": pa.array([collisions], pa.int64()),
            "expected_milli": pa.array([expected_milli], pa.int64()),
        }
    )


DOCS_HASH_TRUNCATION_COLLISIONS_SQL = """
WITH u AS (SELECT DISTINCT md5(text) AS h FROM documents),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT substring(h, 1, 4)) AS BIGINT) AS h16
      FROM u)
SELECT n AS n_unique_texts, h16 AS n_distinct_h16,
       CAST(n - h16 AS BIGINT) AS collisions,
       CAST(n*(n-1)*1000 // (2*65536) AS BIGINT) AS expected_milli
FROM t
"""


def orders_benford_mad_score(sf_dir: str):
    """Benford conformity as ONE number: mean absolute deviation between the
    observed first-digit shares (of exact cents) and the Benford law
    expectation — with log₁₀(1+1/d) hardcoded as the same nine integer ppm
    constants on both engines, the MAD is pure integer arithmetic
    (Nigrini's conformity bands apply to mad_ppm/1e6)."""
    BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])
    P10 = (10 ** np.arange(1, 19, dtype=np.int64)).astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        v = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        digits = np.searchsorted(P10, v, side="right")  # #digits - 1
        first = v // P10[digits - 1]
        first = np.where(digits == 0, v, first)
        tb = pa.table(
            {
                "d": pa.array(first.astype(np.int64)),
                "n": pa.array(np.ones(len(v), np.int64)),
            }
        )
        g = tb.group_by("d").aggregate([("n", "sum")])
        return g.rename_columns(["d", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .set_index("d")["n"]
    )
    total = int(agg.sum())
    mad = 0
    for d in range(1, 10):
        obs = int(agg.get(d, 0)) * 1_000_000 // total
        mad += abs(obs - BENFORD_PPM[d - 1])
    return pa.table(
        {
            "n_orders": pa.array([total], pa.int64()),
            "mad_sum_ppm": pa.array([mad], pa.int64()),
            "mad_ppm": pa.array([mad // 9], pa.int64()),
        }
    )


ORDERS_BENFORD_MAD_SCORE_SQL = """
WITH v AS (
  SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                             AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders),
c AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
                            (5, 79181), (6, 66947), (7, 57992), (8, 51153),
                            (9, 45757)) AS b(d, exp_ppm)),
j AS (SELECT e.d, CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
             CAST(COALESCE(c.n, 0) * 1000000 // t.total AS BIGINT) AS obs_ppm
      FROM e LEFT JOIN c ON e.d = c.d CROSS JOIN t)
SELECT (SELECT total FROM t) AS n_orders,
       CAST(SUM(ABS(obs_ppm - exp_ppm)) AS BIGINT) AS mad_sum_ppm,
       CAST(SUM(ABS(obs_ppm - exp_ppm)) // 9 AS BIGINT) AS mad_ppm
FROM j
"""


def embeddings_cluster_scatter_matrix(sf_dir: str):
    """Cluster-quality raw material (the exact-integer core of
    Davies–Bouldin): per-label within-cluster scatter Σ‖q − cent‖² on the
    diagonal, squared distances between truncated integer centroids off it —
    every value an exact int64, so downstream quality indices can be formed
    without re-touching the data.  One stats pass (broadcast) + one scoring
    pass; the ≤|labels|² matrix assembles on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"))

    def stats_partial(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lab) == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sv": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        q = np.floor(_vecs(t, "embedding") * 1_000_000 + 0.5).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        d = q.shape[1]
        sums = np.zeros((len(uniq), d), np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "sv": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    st = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sv", alias_name="sv"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["label", "dim"], kind="mergesort")
    )
    labels = np.sort(st["label"].unique()).astype(np.int64)
    d = int(st["dim"].max()) + 1
    sv = st["sv"].to_numpy(np.int64).reshape(len(labels), d)
    n_c = st.groupby("label")["n"].first().loc[labels].to_numpy(np.int64)
    cent = np.sign(sv) * (np.abs(sv) // n_c[:, None])
    cent_ref = ray.put((labels, cent))

    def scatter(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        labs, cm = ray.get(cent_ref)
        q = np.floor(_vecs(t, "embedding") * 1_000_000 + 0.5).astype(np.int64)
        own = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(labs, own)
        diff = q - cm[idx]
        tb = pa.table(
            {
                "label": pa.array(own),
                "s": pa.array((diff * diff).sum(axis=1)),
            }
        )
        g = tb.group_by("label").aggregate([("s", "sum")])
        return g.rename_columns(["label", "s"])

    sc = (
        ds.map_batches(scatter, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()
        .set_index("label")["s"]
    )
    la, lb, val = [], [], []
    for i, li in enumerate(labels):
        for j, lj in enumerate(labels):
            if j < i:
                continue
            la.append(int(li))
            lb.append(int(lj))
            if i == j:
                val.append(int(sc[li]))
            else:
                dd = cent[i] - cent[j]
                val.append(int((dd * dd).sum()))
    return pa.table(
        {
            "label_a": pa.array(la, pa.int64()),
            "label_b": pa.array(lb, pa.int64()),
            "value": pa.array(val, pa.int64()),
        }
    )


EMBEDDINGS_CLUSTER_SCATTER_MATRIX_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5) AS BIGINT) AS q,
         CAST(unnest(range(len(embedding))) AS BIGINT) AS dim
  FROM embeddings),
ls AS (SELECT label, dim, CAST(SUM(q) AS BIGINT) AS sv,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM ex GROUP BY 1, 2),
cent AS (SELECT label, dim,
                CAST(SIGN(sv) AS BIGINT) * (ABS(sv) // n) AS c
         FROM ls),
scat AS (
  SELECT ex.label AS label,
         CAST(SUM((ex.q - cent.c)*(ex.q - cent.c)) AS BIGINT) AS s
  FROM ex JOIN cent ON ex.label = cent.label AND ex.dim = cent.dim
  GROUP BY 1),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(SUM((a.c - b.c)*(a.c - b.c)) AS BIGINT) AS value
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2)
SELECT label AS label_a, label AS label_b, s AS value FROM scat
UNION ALL
SELECT label_a, label_b, value FROM pairs
"""


def docs_coverage_knee(sf_dir: str):
    """Kneedle-style KNEE of the vocabulary coverage curve with exact
    integer geometry: over the 20-point (k, coverage_ppm) curve, the knee
    maximizes the cross-product distance |(K−1)(y_k−y₁) − (y_K−y₁)(k−1)|
    to the first-last chord — argmax with a smallest-k tie-break, no floats.
    Reuses the O(vocab) term-count combiner."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def term_counts(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        )
        toks = pc.drop_null(toks)
        toks = toks.filter(pc.not_equal(toks, ""))
        g = (
            pa.Table.from_arrays([toks], names=["term"])
            .group_by("term")
            .aggregate([("term", "count")])
        )
        return g.rename_columns(["term", "n"])

    agg = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
    )
    total = int(agg["n"].sum())
    cum = agg["n"].to_numpy(np.int64).cumsum()
    kk = min(20, len(cum))
    y = (cum[:kk] * 1_000_000 // total).astype(np.int64)
    k = np.arange(1, kk + 1, dtype=np.int64)
    cross = np.abs((kk - 1) * (y - y[0]) - (int(y[kk - 1]) - int(y[0])) * (k - 1))
    knee = int(k[int(np.argmax(cross))])  # argmax takes first max → smallest k
    return pa.table(
        {
            "knee_k": pa.array([knee], pa.int64()),
            "knee_term": pa.array(
                [agg["term"].to_numpy()[knee - 1]], pa.string()
            ),
            "knee_coverage_ppm": pa.array([int(y[knee - 1])], pa.int64()),
            "max_cross": pa.array([int(cross.max())], pa.int64()),
        }
    )


DOCS_COVERAGE_KNEE_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks WHERE term <> ''
      GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
r AS (SELECT term,
             ROW_NUMBER() OVER (ORDER BY n DESC, term) AS k,
             CAST(SUM(n) OVER (ORDER BY n DESC, term
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * 1000000 // t.total AS BIGINT) AS y
      FROM c, t),
curve AS (SELECT * FROM r WHERE k <= 20),
ends AS (SELECT CAST(MAX(k) AS BIGINT) AS kk,
                CAST(MIN(CASE WHEN k = 1 THEN y END) AS BIGINT) AS y1,
                CAST(MIN(CASE WHEN k = (SELECT MAX(k) FROM curve) THEN y END)
                     AS BIGINT) AS yk
         FROM curve),
d AS (SELECT curve.k, curve.term, curve.y,
             ABS((ends.kk - 1)*(curve.y - ends.y1)
                 - (ends.yk - ends.y1)*(curve.k - 1)) AS cross_v
      FROM curve, ends)
SELECT k AS knee_k, term AS knee_term, y AS knee_coverage_ppm,
       CAST(cross_v AS BIGINT) AS max_cross
FROM d ORDER BY cross_v DESC, k LIMIT 1
"""


def lineitem_return_trend_cochran_armitage(sf_dir: str):
    """Cochran–Armitage TREND IN PROPORTIONS: does the return rate rise
    monotonically across price deciles?  Deciles come from quantile_disc
    value thresholds; the statistic keeps exact integers as long as
    possible — T_N = N·Σwr − R·Σwn — and z is one fixed IEEE expression
    T_N / √(R(N−R)(NΣw²n − (Σwn)²)/N) on those exact ints."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_extendedprice", "l_returnflag"]
    )

    def grid(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "p": _cents(t["l_extendedprice"]),
                "cnt": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by("p").aggregate([("cnt", "sum")]).rename_columns(["p", "cnt"])

    pagg = (
        ds.map_batches(grid, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("p", kind="mergesort")
    )
    vals = pagg["p"].to_numpy(np.int64)
    cum = pagg["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    cuts = np.asarray(
        [
            int(vals[np.searchsorted(cum, -(-k * n // 10), side="left")])
            for k in range(1, 10)
        ],
        np.int64,
    )

    def cells(t: pa.Table) -> pa.Table:
        p = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        dec = np.searchsorted(cuts, p, side="left") + 1
        ret = pc.equal(t["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        tb = pa.table(
            {
                "dec": pa.array(dec.astype(np.int64)),
                "n": pa.array(np.ones(len(p), np.int64)),
                "r": pa.array(ret.astype(np.int64)),
            }
        )
        g = tb.group_by("dec").aggregate([("n", "sum"), ("r", "sum")])
        return g.rename_columns(["dec", "n", "r"])

    agg = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("dec")
        .aggregate(Sum("n", alias_name="n"), Sum("r", alias_name="r"))
        .to_pandas()
        .sort_values("dec", kind="mergesort")
    )
    w = agg["dec"].to_numpy(np.int64)
    nn = agg["n"].to_numpy(np.int64)
    rr = agg["r"].to_numpy(np.int64)
    N = int(nn.sum())
    R = int(rr.sum())
    swr = int((w * rr).sum())
    swn = int((w * nn).sum())
    sw2n = int((w * w * nn).sum())
    t_n = N * swr - R * swn
    z = float(t_n) / np.sqrt(
        float(R) * float(N - R) * float(N * sw2n - swn * swn) / float(N)
    )
    return pa.table(
        {
            "n_total": pa.array([N], pa.int64()),
            "n_returned": pa.array([R], pa.int64()),
            "t_n": pa.array([t_n], pa.int64()),
            "ca_z": pa.array([z], pa.float64()),
        }
    )


LINEITEM_RETURN_TREND_COCHRAN_ARMITAGE_SQL = """
WITH v AS (
  SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS p,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem),
q AS (SELECT unnest(quantile_disc(p, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]))
        AS cut FROM v),
b AS (SELECT (SELECT COUNT(*) FROM q WHERE q.cut < v.p) + 1 AS dec, r FROM v),
c AS (SELECT CAST(dec AS BIGINT) AS w, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r) AS BIGINT) AS r
      FROM b GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt,
             CAST(SUM(w*r) AS BIGINT) AS swr, CAST(SUM(w*n) AS BIGINT) AS swn,
             CAST(SUM(w*w*n) AS BIGINT) AS sw2n
      FROM c)
SELECT nt AS n_total, rt AS n_returned,
       CAST(nt*swr - rt*swn AS BIGINT) AS t_n,
       CAST(nt*swr - rt*swn AS DOUBLE)
         / sqrt(CAST(rt AS DOUBLE) * CAST(nt - rt AS DOUBLE)
                * CAST(nt*sw2n - swn*swn AS DOUBLE) / CAST(nt AS DOUBLE))
         AS ca_z
FROM t
"""


def orders_rle_run_audit(sf_dir: str):
    """Storage-layout audit: run-length-encoding run counts for the two
    low-cardinality order columns in natural (orderkey) order — the number
    that decides whether RLE pays off.  Global sort, per-block run partials
    plus (first, last) edge values, O(blocks) boundary stitching on the
    driver — the same stitch discipline as the varint estimator."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority"],
    ).sort("o_orderkey")

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for col in ("o_orderstatus", "o_orderpriority"):
            v = t[col].to_numpy(zero_copy_only=False)
            runs = 1 + int((v[1:] != v[:-1]).sum()) if len(v) else 0
            rows.append(
                {
                    "col": col,
                    "first_key": int(t["o_orderkey"][0].as_py()),
                    "n": t.num_rows,
                    "runs": runs,
                    "first_val": str(v[0]),
                    "last_val": str(v[-1]),
                }
            )
        import pandas as pd

        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    blocks = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for col, grp in blocks.groupby("col", sort=True):
        grp = grp.sort_values("first_key", kind="mergesort")
        n = int(grp["n"].sum())
        runs = int(grp["runs"].sum())
        # merge boundaries: consecutive blocks whose edge values match share a run
        lv = grp["last_val"].to_numpy()
        fv = grp["first_val"].to_numpy()
        runs -= int((lv[:-1] == fv[1:]).sum())
        out.append((col, n, runs, n * 1000 // runs))
    return pa.table(
        {
            "col": pa.array([r[0] for r in out], pa.string()),
            "n_rows": pa.array([r[1] for r in out], pa.int64()),
            "n_runs": pa.array([r[2] for r in out], pa.int64()),
            "avg_run_milli": pa.array([r[3] for r in out], pa.int64()),
        }
    )


ORDERS_RLE_RUN_AUDIT_SQL = """
WITH s AS (
  SELECT o_orderstatus AS st, o_orderpriority AS pri,
         LAG(o_orderstatus) OVER (ORDER BY o_orderkey) AS pst,
         LAG(o_orderpriority) OVER (ORDER BY o_orderkey) AS ppri
  FROM orders)
SELECT 'o_orderpriority' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN ppri IS NULL OR pri <> ppri THEN 1 ELSE 0 END)
            AS BIGINT) AS n_runs,
       CAST(COUNT(*) * 1000
            // SUM(CASE WHEN ppri IS NULL OR pri <> ppri THEN 1 ELSE 0 END)
            AS BIGINT) AS avg_run_milli
FROM s
UNION ALL
SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN pst IS NULL OR st <> pst THEN 1 ELSE 0 END) AS BIGINT),
       CAST(COUNT(*) * 1000
            // SUM(CASE WHEN pst IS NULL OR st <> pst THEN 1 ELSE 0 END)
            AS BIGINT)
FROM s
"""


def nation_trade_reciprocity(sf_dir: str):
    """Trade-flow reciprocity: for every unordered nation pair with flow in
    BOTH directions, the asymmetry |a−b|·10⁶//(a+b) between supplier→
    customer revenue i→j and j→i.  Directed flows reuse the star collapse
    (supplier map broadcast, 8-partition orders join, customer nation via
    broadcast dim); the transpose join runs on the ≤25² pair table."""
    sup = rd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nat = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    s2n = {int(k): nmap[int(v)] for k, v in zip(sup["s_suppkey"], sup["s_nationkey"])}
    c2n = {int(k): nmap[int(v)] for k, v in zip(cust["c_custkey"], cust["c_nationkey"])}
    s2n_ref, c2n_ref = ray.put(s2n), ray.put(c2n)

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_extendedprice"]
    )

    def lpartial(t: pa.Table) -> pa.Table:
        smap = ray.get(s2n_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        tb = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "sn": pa.array([smap[int(k)] for k in sk], pa.string()),
                "rev": _cents(t["l_extendedprice"]),
            }
        )
        g = tb.group_by(["l_orderkey", "sn"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "sn", "rev"])

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])

    def cpartial(t: pa.Table) -> pa.Table:
        cmap = ray.get(c2n_ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        tb = pa.table(
            {
                "sn": t["sn"],
                "cn": pa.array([cmap[int(k)] for k in ck], pa.string()),
                "rev": t["rev"],
            }
        )
        g = tb.group_by(["sn", "cn"]).aggregate([("rev", "sum")])
        return g.rename_columns(["sn", "cn", "rev"])

    flows = (
        li.map_batches(lpartial, batch_format="pyarrow")
        .join(
            orders,
            join_type="inner",
            num_partitions=8,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .map_batches(cpartial, batch_format="pyarrow")
        .groupby(["sn", "cn"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    fmap = {(r["sn"], r["cn"]): int(r["rev"]) for _, r in flows.iterrows()}
    rows = []
    for (i, j), a in sorted(fmap.items()):
        if i >= j:
            continue
        b = fmap.get((j, i))
        if b is None:
            continue
        rows.append((i, j, a, b, abs(a - b) * 1_000_000 // (a + b)))
    return pa.table(
        {
            "nation_a": pa.array([r[0] for r in rows], pa.string()),
            "nation_b": pa.array([r[1] for r in rows], pa.string()),
            "rev_ab_cents": pa.array([r[2] for r in rows], pa.int64()),
            "rev_ba_cents": pa.array([r[3] for r in rows], pa.int64()),
            "asym_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


NATION_TRADE_RECIPROCITY_SQL = """
WITH f AS (
  SELECT ns.n_name AS sn, nc.n_name AS cn,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  GROUP BY 1, 2)
SELECT a.sn AS nation_a, a.cn AS nation_b,
       a.rev AS rev_ab_cents, b.rev AS rev_ba_cents,
       CAST(ABS(a.rev - b.rev) * 1000000 // (a.rev + b.rev) AS BIGINT)
         AS asym_ppm
FROM f a JOIN f b ON a.sn = b.cn AND a.cn = b.sn AND a.sn < a.cn
"""


def events_session_type_pairs(sf_dir: str):
    """Market-basket over SESSIONS: which event-type pairs co-occur inside
    the same 30-minute-gap session — sessionization and pair expansion fused
    in one per-user map_groups (sessions never materialize), then a tiny
    pair groupby.  Pair rows are (type_a < type_b, #sessions containing
    both)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_type"])
    GAP = 1_800_000_000  # 30 min in µs

    def pairs(g: pa.Table) -> pa.Table:
        from itertools import combinations

        idx = pc.sort_indices(g, sort_keys=[("ts", "ascending")])
        s = g.take(idx)
        ts = (
            s["ts"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        et = s["event_type"].to_numpy(zero_copy_only=False)
        sess = np.r_[0, (np.diff(ts) > GAP).cumsum()]
        out_a, out_b = [], []
        for sid in np.unique(sess):
            types = sorted(set(et[sess == sid]))
            for a, b in combinations(types, 2):
                out_a.append(a)
                out_b.append(b)
        return pa.table(
            {
                "type_a": pa.array(out_a, pa.string()),
                "type_b": pa.array(out_b, pa.string()),
                "n_sessions": pa.array(np.ones(len(out_a), np.int64)),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_sessions", alias_name="n_sessions"))
    )


EVENTS_SESSION_TYPE_PAIRS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         SUM(CASE WHEN prev IS NULL
                       OR epoch_us(ts) - prev > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM (SELECT user_id, ts, event_type,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events)),
d AS (SELECT DISTINCT user_id, sess, event_type FROM s)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.sess = b.sess
 AND a.event_type < b.event_type
GROUP BY 1, 2
"""


def orders_daily_allan_variance(sf_dir: str):
    """Allan variance — multiscale stability analysis of the daily revenue
    series: block sums at scales k ∈ {1,2,4,8} consecutive (present) days,
    exact integer Σ(B_{i+1}−B_i)² (arbitrary precision / HUGEINT), and the
    Allan variance of the per-day average as ONE fixed expression
    diff2/(2(m−1)k²).  Daily revenue is a cents partial; the scale walk runs
    on the driver over ≤|days| rows."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "d": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
                "rev": _cents(t["o_totalprice"]),
            }
        )
        g = tb.group_by("d").aggregate([("rev", "sum")])
        return g.rename_columns(["d", "rev"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("d", kind="mergesort")
    )
    rev = [int(x) for x in agg["rev"]]
    rows = []
    for k in (1, 2, 4, 8):
        m = len(rev) // k
        blocks = [sum(rev[i * k : (i + 1) * k]) for i in range(m)]
        # diff2 can pass int64 (block sums ~1e10 cents squared) — it stays an
        # arbitrary-precision Python int until the single float conversion
        diff2 = sum((b - a) * (b - a) for a, b in zip(blocks, blocks[1:]))
        avar = float(diff2) / (2.0 * float(m - 1) * float(k) * float(k))
        rows.append((k, m, avar))
    return pa.table(
        {
            "scale_k": pa.array([r[0] for r in rows], pa.int64()),
            "n_blocks": pa.array([r[1] for r in rows], pa.int64()),
            "allan_var": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


ORDERS_DAILY_ALLAN_VARIANCE_SQL = """
WITH d AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev,
         ROW_NUMBER() OVER (ORDER BY strftime(o_orderdate, '%Y-%m-%d')) AS rn
  FROM orders GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
b AS (
  SELECT s.k, CAST((d.rn - 1) // s.k AS BIGINT) AS blk,
         SUM(CAST(d.rev AS HUGEINT)) AS bsum
  FROM d CROSS JOIN (VALUES (1), (2), (4), (8)) AS s(k), t
  WHERE d.rn <= (t.n // s.k) * s.k
  GROUP BY 1, 2),
w AS (
  SELECT k, bsum - LAG(bsum) OVER (PARTITION BY k ORDER BY blk) AS df
  FROM b)
SELECT CAST(k AS BIGINT) AS scale_k,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_blocks,
       CAST(SUM(df*df) AS DOUBLE)
         / (2e0 * CAST(COUNT(*) AS DOUBLE)
            * CAST(k AS DOUBLE) * CAST(k AS DOUBLE)) AS allan_var
FROM w WHERE df IS NOT NULL GROUP BY k
"""
