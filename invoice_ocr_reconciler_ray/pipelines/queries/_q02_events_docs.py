"""Query-registry family module 2/9 (dominant family: events_docs; split from the monolithic queries.py)."""

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
from ._q01_events_orders import _flagship_materialized



def docs_mean_token_rarity(sf_dir: str):
    """Language-model-free quality proxy: each document's mean corpus-
    rarity RANK over its token occurrences (rank 1 = most common term by
    document frequency, ties broken lexically — a total order, so every
    number here is an exact integer) plus its single rarest term.  Two
    phases: global DF by term (distinct (doc,term) block partials → a
    groupby whose key domain is the VOCABULARY, not the corpus), ranks
    built once on the driver and broadcast as a rank-ordered term array so
    the per-block rank lookup is one ``index_in``; a document is one row,
    so all per-doc aggregates stay block-local."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def doc_terms(t: pa.Table):
        lst = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()), pattern=r"[^a-z0-9]+"
        )
        terms = lst.flatten()
        ids = t["doc_id"].combine_chunks().take(lst.value_parent_indices())
        tb = pa.table({"doc_id": ids, "term": terms})
        return tb.filter(pc.not_equal(tb["term"], ""))

    def df_partial(t: pa.Table) -> pa.Table:
        tb = doc_terms(t)
        distinct = tb.group_by(["doc_id", "term"]).aggregate([])
        g = pa.table(
            {
                "term": distinct["term"],
                "one": pa.array(np.ones(distinct.num_rows, np.int64)),
            }
        ).group_by("term").aggregate([("one", "sum")])
        return g.rename_columns(["term", "df"])

    df = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
        .sort_values(["df", "term"], ascending=[False, True], kind="mergesort")
    )
    ordered_terms = pa.array(df["term"].tolist(), pa.string())
    terms_ref = ray.put(ordered_terms)

    def score(t: pa.Table) -> pa.Table:
        by_rank = ray.get(terms_ref)
        tb = doc_terms(t)
        rank = pc.add(pc.cast(pc.index_in(tb["term"], value_set=by_rank), pa.int64()), 1)
        stats = (
            pa.table({"doc_id": tb["doc_id"], "r": rank})
            .group_by("doc_id")
            .aggregate([("r", "sum"), ("r", "count"), ("r", "max")])
            .rename_columns(["doc_id", "rank_sum", "n_tokens", "max_rank"])
        )
        rs = pc.cast(stats["rank_sum"], pa.int64())
        nt = pc.cast(stats["n_tokens"], pa.int64())
        rarest = pc.take(by_rank, pc.subtract(pc.cast(stats["max_rank"], pa.int64()), 1))
        return pa.table(
            {
                "doc_id": stats["doc_id"],
                "n_tokens": nt,
                "rank_sum": rs,
                "mean_rarity_ppm": pc.divide(
                    pc.multiply(rs, pa.scalar(1_000_000, pa.int64())), nt
                ),
                "rarest_term": rarest,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort(["doc_id"])


DOCS_MEAN_TOKEN_RARITY_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
rk AS (SELECT term, row_number() OVER (ORDER BY df DESC, term) AS r FROM df)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(r) AS BIGINT) AS rank_sum,
       CAST(SUM(r) * 1000000 // COUNT(*) AS BIGINT) AS mean_rarity_ppm,
       arg_max(term, r) AS rarest_term
FROM tok JOIN rk USING (term)
GROUP BY 1 ORDER BY doc_id
"""


def corpus_curation_report(sf_dir: str):
    """Composed curation report: the corpus partitioned by (source,
    duplicate?, passes-length?) in one table — dedup semantics IDENTICAL to
    ``dedup_flag_documents`` (winner = min doc_id per (lang, n_chars)
    content key; is_dup ⟺ doc_id ≠ winner).  The winner map comes from
    (key → min doc_id) block partials merged through a groupby whose
    cardinality is the distinct-content-key count, broadcast once; gates
    and the final 3-key count are vectorized block work.  At 10¹²-key scale
    the same report runs per hash-partition of the content key
    (pipelines/runner.py discipline)."""
    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "lang", "source", "n_chars"]
    )

    def win_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": t["lang"], "n_chars": t["n_chars"], "d": t["doc_id"]})
            .group_by(["lang", "n_chars"])
            .aggregate([("d", "min")])
        )
        return g.rename_columns(["lang", "n_chars", "d"])

    winners = (
        ds.map_batches(win_partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Min("d", alias_name="win"))
        .to_pandas()
    )
    wmap = {
        (r["lang"], int(r["n_chars"])): int(r["win"]) for _, r in winners.iterrows()
    }
    wref = ray.put(wmap)

    def report(t: pa.Table) -> pa.Table:
        wm = ray.get(wref)
        langs = t["lang"].to_pylist()
        ncs = t["n_chars"].to_numpy()
        dids = t["doc_id"].to_numpy()
        wins = np.fromiter(
            (wm[(lg, int(nc))] for lg, nc in zip(langs, ncs)), np.int64, len(langs)
        )
        tb = pa.table(
            {
                "source": t["source"],
                "is_dup": pa.array(dids != wins),
                "passes_len": pa.array(ncs >= 200),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["source", "is_dup", "passes_len"]).aggregate([("one", "sum")])
        return g.rename_columns(["source", "is_dup", "passes_len", "n_docs"])

    return (
        ds.map_batches(report, batch_format="pyarrow")
        .groupby(["source", "is_dup", "passes_len"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .sort(["source", "is_dup", "passes_len"])
    )


CORPUS_CURATION_REPORT_SQL = """
WITH f AS (
  SELECT source, n_chars,
         (row_number() OVER (PARTITION BY lang, n_chars ORDER BY doc_id)) > 1
           AS is_dup
  FROM documents)
SELECT source, is_dup, n_chars >= 200 AS passes_len, COUNT(*) AS n_docs
FROM f GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def events_hourly_top_type(sf_dir: str):
    """Argmax per time window: each hour's most frequent event type (count
    desc, type asc — a total tie order).  The fact collapses to (hour,
    type) cells via block partials + one tiny groupby; the per-hour argmax
    runs on the driver over that cell table (O(hours·types))."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.add(
            pc.multiply(
                pc.cast(pc.cast(pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.date32()), pa.int32()), pa.int64()),
                24,
            ),
            pc.cast(pc.hour(t["ts"]), pa.int64()),
        )
        tb = pa.table(
            {
                "h": hour,
                "typ": t["event_type"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["h", "typ"]).aggregate([("one", "sum")])
        return g.rename_columns(["h", "typ", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["h", "typ"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["h", "n", "typ"], ascending=[True, False, True], kind="mergesort")
    )
    top = cells.groupby("h", sort=True).head(1)
    return pa.table(
        {
            "hour_idx": pa.array(top["h"].to_numpy().astype(np.int64)),
            "top_type": pa.array(top["typ"].tolist(), pa.string()),
            "n": pa.array(top["n"].to_numpy().astype(np.int64)),
        }
    )


EVENTS_HOURLY_TOP_TYPE_SQL = """
WITH c AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) * 24
           + CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_idx,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
r AS (SELECT hour_idx, event_type, n,
             row_number() OVER (PARTITION BY hour_idx
                                ORDER BY n DESC, event_type) AS rk
      FROM c)
SELECT hour_idx, event_type AS top_type, CAST(n AS BIGINT) AS n
FROM r WHERE rk = 1 ORDER BY hour_idx
"""


def orders_monthly_yoy(sf_dir: str):
    """Year-over-year comparison: each month's revenue against the SAME
    month one year earlier, delta as exact signed integer ppm
    ``trunc((cur − prev)·10⁶ / prev)`` — truncation toward zero, matching
    DuckDB's BIGINT ``//`` (which truncates; Python ``//`` floors, so the
    Ray side divides magnitudes and restores sign).  The fact collapses
    to an O(months)
    series; the 12-month shift is a driver-side dict lookup on the ym key
    (year·100+month), so December/January needs no calendar case."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(t["o_orderdate"]), pa.int64()), 100),
            pc.cast(pc.month(t["o_orderdate"]), pa.int64()),
        )
        tb = pa.table({"ym": ym, "c": _cents(t["o_totalprice"])})
        g = tb.group_by("ym").aggregate([("c", "sum")])
        return g.rename_columns(["ym", "c"])

    monthly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("c", alias_name="rev_cents"))
        .to_pandas()
        .sort_values("ym", kind="mergesort")
    )
    rev = dict(zip(monthly["ym"].astype(int), monthly["rev_cents"].astype(int)))

    def _ppm(cur: int, prev: int) -> int:
        num = (cur - prev) * 1_000_000
        q = abs(num) // prev  # prev > 0 (sum of positive cents)
        return q if num >= 0 else -q

    rows = [
        (ym, r, rev[ym - 100], _ppm(r, rev[ym - 100]))
        for ym, r in rev.items()
        if ym - 100 in rev
    ]
    rows.sort()
    return pa.table(
        {
            "ym": pa.array([r[0] for r in rows], pa.int64()),
            "rev_cents": pa.array([r[1] for r in rows], pa.int64()),
            "prev_year_cents": pa.array([r[2] for r in rows], pa.int64()),
            "yoy_delta_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


ORDERS_MONTHLY_YOY_SQL = """
WITH m AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate)*100
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1)
SELECT a.ym, a.rev_cents,
       b.rev_cents AS prev_year_cents,
       CAST((a.rev_cents - b.rev_cents) * 1000000 // b.rev_cents AS BIGINT)
         AS yoy_delta_ppm
FROM m a JOIN m b ON a.ym = b.ym + 100
ORDER BY a.ym
"""


def events_value_cusum_alarm(sf_dir: str):
    """CUSUM drift detector per user: the classic sequential statistic
    S_i = max(0, S_{i−1} + (x_i − target)) computed VECTORIZED via the
    identity S_i = C_i − min_{j≤i} C_j with C = cumsum(x − target) — an
    inherently sequential-looking recurrence turned into cumsum +
    running-min (both one-pass array kernels), exact in integer cents
    against a fixed target of $250.  Output per user: max CUSUM and the
    1-based index where it peaks (first peak on ties)."""
    target = 25_000  # cents
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])

    def kernel(g: pa.Table) -> pa.Table:
        ts = g["ts"].combine_chunks().to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        x = _cents(g["value"]).to_numpy()
        order = np.lexsort((eid, ts))
        c = (x[order] - target).cumsum()
        run_min = np.minimum.accumulate(np.minimum(c, 0))
        s = c - run_min
        peak = int(s.max())
        at = int(s.argmax()) + 1
        uid = int(g["user_id"][0].as_py())
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_events": pa.array([len(x)], pa.int64()),
                "max_cusum_cents": pa.array([peak], pa.int64()),
                "peak_at": pa.array([at], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow").sort(["user_id"])


EVENTS_VALUE_CUSUM_ALARM_SQL = """
WITH s AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         row_number() OVER w AS i,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT) - 25000)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
m AS (
  SELECT user_id, i,
         c - LEAST(MIN(c) OVER (PARTITION BY user_id ORDER BY i
                                ROWS UNBOUNDED PRECEDING), 0) AS cusum
  FROM s),
r AS (
  SELECT user_id, i, cusum,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cusum DESC, i) AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM m)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(cusum AS BIGINT) AS max_cusum_cents,
       CAST(i AS BIGINT) AS peak_at
FROM r WHERE rk = 1 ORDER BY user_id
"""


def orders_benford_profile(sf_dir: str):
    """Benford's-law first-digit profile of order totals.  The first digit
    is taken from the DECIMAL STRING of integer cents (never a float
    log10, whose boundary error at exact powers of ten would misbin) —
    one vectorized cast→slice→cast per block, 9-row partials, tiny
    groupby, exact ppm shares."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"])
        d = pc.cast(pc.utf8_slice_codeunits(pc.cast(c, pa.string()), 0, 1), pa.int64())
        tb = pa.table({"digit": d, "one": pa.array(np.ones(len(d), np.int64))})
        return tb.group_by("digit").aggregate([("one", "sum")]).rename_columns(["digit", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("digit", kind="mergesort")
    )
    total = int(cells["n"].sum())
    digits = cells["digit"].to_numpy().astype(np.int64)
    n = cells["n"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "digit": pa.array(digits),
            "n": pa.array(n),
            "share_ppm": pa.array([int(v) * 1_000_000 // total for v in n], pa.int64()),
        }
    )


ORDERS_BENFORD_PROFILE_SQL = """
WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c FROM orders),
d AS (SELECT CAST(SUBSTR(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             COUNT(*) AS n
      FROM c GROUP BY 1)
SELECT digit, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // (SELECT SUM(n) FROM d) AS BIGINT) AS share_ppm
FROM d ORDER BY digit
"""


def customers_every_year(sf_dir: str):
    """Relational division: customers with at least one order in EVERY
    distinct order-year present in the table.  Block-local (cust, year)
    distinct partials keep the shuffle at distinct-pair cardinality
    (customers × ≤7 years); the divisor (distinct-year count) and the
    per-customer year tally finish on the collected pair table —
    O(customers) driver rows here; at 10¹² customers the finish is a
    second groupby over the same pair cells."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "c": t["o_custkey"],
                "y": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )
        return tb.group_by(["c", "y"]).aggregate([])

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c", "y"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    n_years = int(pairs["y"].nunique())
    per = pairs.groupby("c").size()
    keep = sorted(int(c) for c, k in per.items() if int(k) == n_years)
    return pa.table(
        {
            "c_custkey": pa.array(keep, pa.int64()),
            "n_years": pa.array([n_years] * len(keep), pa.int64()),
        }
    )


CUSTOMERS_EVERY_YEAR_SQL = """
WITH p AS (SELECT DISTINCT o_custkey AS c,
                  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y
           FROM orders),
t AS (SELECT COUNT(DISTINCT y) AS ny FROM p)
SELECT CAST(c AS BIGINT) AS c_custkey, CAST(ny AS BIGINT) AS n_years
FROM p, t GROUP BY 1, ny HAVING COUNT(*) = ny ORDER BY 1
"""


def docs_lang_apportion(sf_dir: str):
    """Hamilton largest-remainder apportionment: allocate a fixed budget
    of 10 000 sampling units across languages proportional to doc counts.
    Pure integer arithmetic — base = n·S // N, leftover units go to the
    largest remainders (rem desc, lang asc total tie order) — so the
    allocation is exactly reproducible in SQL.  Counts come from 1-row-
    per-lang block partials; the apportionment itself is O(langs)."""
    S = 10_000
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {"lang": t["lang"], "one": pa.array(np.ones(t.num_rows, np.int64))}
        )
        return tb.group_by("lang").aggregate([("one", "sum")]).rename_columns(["lang", "docs"])

    cnt = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("docs", alias_name="docs"))
        .to_pandas()
    )
    langs = cnt["lang"].tolist()
    docs = [int(v) for v in cnt["docs"]]
    total = sum(docs)
    base = [n * S // total for n in docs]
    rem = [n * S % total for n in docs]
    leftover = S - sum(base)
    order = sorted(range(len(langs)), key=lambda i: (-rem[i], langs[i]))
    seats = list(base)
    for i in order[:leftover]:
        seats[i] += 1
    rows = sorted(zip(langs, docs, seats))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "docs": pa.array([r[1] for r in rows], pa.int64()),
            "seats": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


DOCS_LANG_APPORTION_SQL = """
WITH c AS (SELECT lang, COUNT(*) AS docs FROM documents GROUP BY 1),
t AS (SELECT SUM(docs) AS n FROM c),
b AS (SELECT lang, docs,
             CAST(docs*10000 // n AS BIGINT) AS base,
             CAST(docs*10000 % n AS BIGINT) AS rem
      FROM c, t),
l AS (SELECT CAST(10000 - SUM(base) AS BIGINT) AS leftover FROM b),
r AS (SELECT lang, docs, base,
             row_number() OVER (ORDER BY rem DESC, lang) AS rk
      FROM b)
SELECT lang, CAST(docs AS BIGINT) AS docs,
       CAST(base + CASE WHEN rk <= (SELECT leftover FROM l) THEN 1 ELSE 0 END
            AS BIGINT) AS seats
FROM r ORDER BY lang
"""


def nation_revenue_concentration(sf_dir: str):
    """Prefix-cover (80/20) concentration: per nation, the minimum number
    of customers whose summed revenue reaches ⌈80 %⌉ of the nation's
    total, plus that prefix's exact share in ppm.  Per-customer revenue
    collapses via block partials + one groupby at customer cardinality;
    the nation key arrives through a hash join (8 partitions — the
    measured optimum at this scale); the prefix scan is a per-nation
    Arrow kernel (one lexsort + cumsum + searchsorted, no row loop).
    Threshold ⌈0.8·T⌉ = (4T+4)//5 — the same integer expression on both
    engines, so the crossing index can't drift."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"c": t["o_custkey"], "r": _cents(t["o_totalprice"])})
        return tb.group_by("c").aggregate([("r", "sum")]).rename_columns(["c", "r"])

    rev = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("r", alias_name="r"))
    )
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    joined = rev.join(
        cust, join_type="inner", num_partitions=8, on=("c",), right_on=("c_custkey",)
    )

    def kernel(g: pa.Table) -> pa.Table:
        r = g["r"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ck = g["c"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ck, -r))
        cum = r[order].cumsum()
        total = int(cum[-1])
        thr = (4 * total + 4) // 5
        k = int(np.searchsorted(cum, thr, side="left")) + 1
        share_ppm = int(cum[k - 1]) * 1_000_000 // total
        nation = int(g["c_nationkey"][0].as_py())
        return pa.table(
            {
                "c_nationkey": pa.array([nation], pa.int64()),
                "n_customers": pa.array([len(r)], pa.int64()),
                "k_for_80pct": pa.array([k], pa.int64()),
                "top_share_ppm": pa.array([share_ppm], pa.int64()),
            }
        )

    return (
        joined.groupby("c_nationkey")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["c_nationkey"])
    )


NATION_REVENUE_CONCENTRATION_SQL = """
WITH rev AS (
  SELECT o_custkey AS c,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1),
j AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c, r
      FROM rev JOIN customer ON c = c_custkey),
w AS (SELECT c_nationkey, r,
             SUM(r) OVER (PARTITION BY c_nationkey ORDER BY r DESC, c
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(r) OVER (PARTITION BY c_nationkey) AS total,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS n
      FROM j)
SELECT c_nationkey,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(COUNT(*) FILTER (WHERE cum < (4*total + 4) // 5) + 1 AS BIGINT)
         AS k_for_80pct,
       CAST(MIN(CASE WHEN cum >= (4*total + 4) // 5 THEN cum END) * 1000000
            // MAX(total) AS BIGINT) AS top_share_ppm
FROM w GROUP BY 1 ORDER BY 1
"""


def events_user_type_gini(sf_dir: str):
    """Per-user event-type diversity as GINI IMPURITY — 1 − Σ(nᵢ/N)² =
    (N² − Σnᵢ²)/N² — which unlike Shannon entropy is a ratio of exact
    integers, so it hash-matches SQL without any float-order caveat.
    (user, type) cells via block partials + one groupby; the impurity is
    two integer reductions over O(users·types) cells."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "u": t["user_id"],
                "typ": t["event_type"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["u", "typ"]).aggregate([("one", "sum")]).rename_columns(["u", "typ", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["u", "typ"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    g = cells.groupby("u")["n"]
    agg = g.agg([("n_events", "sum"), ("s", lambda v: int((v.astype(np.int64) ** 2).sum()))])
    agg = agg.sort_index()
    users = agg.index.to_numpy().astype(np.int64)
    N = agg["n_events"].to_numpy().astype(np.int64)
    s = agg["s"].to_numpy().astype(np.int64)
    gini = [(int(a) * int(a) - int(b)) * 1_000_000 // (int(a) * int(a)) for a, b in zip(N, s)]
    return pa.table(
        {
            "user_id": pa.array(users),
            "n_events": pa.array(N),
            "gini_ppm": pa.array(gini, pa.int64()),
        }
    )


EVENTS_USER_TYPE_GINI_SQL = """
WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
g AS (SELECT CAST(user_id AS BIGINT) AS user_id,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(SUM(n*n) AS BIGINT) AS s
      FROM c GROUP BY 1)
SELECT user_id, n_events,
       CAST((n_events*n_events - s) * 1000000 // (n_events*n_events) AS BIGINT)
         AS gini_ppm
FROM g ORDER BY user_id
"""


def orders_yearly_customer_hhi(sf_dir: str):
    """Herfindahl–Hirschman concentration of customer revenue shares per
    order-year, in ppm: HHI = Σrᵢ²·10⁶ // (Σrᵢ)².  Σrᵢ² exceeds int64 at
    real revenue magnitudes, so the reduction runs in PYTHON BIG INTS on
    the O(years·customers) cell table (the SQL side mirrors it in
    HUGEINT) — the distributed part is the (year, cust) revenue groupby;
    the concentration math is O(cells)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "y": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "c": t["o_custkey"],
                "r": _cents(t["o_totalprice"]),
            }
        )
        return tb.group_by(["y", "c"]).aggregate([("r", "sum")]).rename_columns(["y", "c", "r"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["y", "c"])
        .aggregate(Sum("r", alias_name="r"))
        .to_pandas()
    )
    out = []
    for y, grp in cells.groupby("y"):
        rs = [int(v) for v in grp["r"]]
        T = sum(rs)
        out.append((int(y), len(rs), sum(v * v for v in rs) * 1_000_000 // (T * T)))
    out.sort()
    return pa.table(
        {
            "order_year": pa.array([r[0] for r in out], pa.int64()),
            "n_customers": pa.array([r[1] for r in out], pa.int64()),
            "hhi_ppm": pa.array([r[2] for r in out], pa.int64()),
        }
    )


ORDERS_YEARLY_CUSTOMER_HHI_SQL = """
WITH rc AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
         o_custkey AS c,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1, 2)
SELECT y AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(r AS HUGEINT) * r) * 1000000
            // (CAST(SUM(r) AS HUGEINT) * SUM(r)) AS BIGINT) AS hhi_ppm
FROM rc GROUP BY 1 ORDER BY 1
"""


def events_interarrival_median(sf_dir: str):
    """Per-user inter-arrival median — the window-then-quantile composition
    (lag() deltas feeding quantile_disc): co-partition by user, per-group
    kernel sorts once, diffs, and picks the 1-based-rank-ceil(n/2) element
    exactly; single-event users drop (no gaps), matching the SQL NULL-gap
    filter."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def kernel(g: pa.Table) -> pa.Table:
        ts = np.sort(
            g["ts"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        if len(ts) < 2:
            return pa.table(
                {
                    "user_id": g["user_id"].slice(0, 0),
                    "n_gaps": pa.array([], pa.int64()),
                    "median_gap_us": pa.array([], pa.int64()),
                }
            )
        gaps = np.sort(np.diff(ts))
        m = gaps[int(np.ceil(0.5 * len(gaps))) - 1]
        return pa.table(
            {
                "user_id": g["user_id"].slice(0, 1),
                "n_gaps": pa.array([len(gaps)], pa.int64()),
                "median_gap_us": pa.array([int(m)], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow")


EVENTS_INTERARRIVAL_MEDIAN_SQL = """
WITH g AS (
  SELECT user_id,
         CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts)) AS BIGINT)
           AS gap_us
  FROM events)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap_us, 0.5) AS BIGINT) AS median_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY 1
"""


# ------------------------------------------- outer join / pivot / group top-k

def customer_order_counts(sf_dir: str):
    """LEFT-OUTER aggregate (customers with zero orders kept): per-block
    partial order counts merged O(|custkeys|) on the driver, broadcast once,
    probed from the customer side — the shuffle-free left-join shape for a
    fact-side pre-aggregation."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])

    def part(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return g.rename_columns(["o_custkey", "n"])

    parts = list(
        orders.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    if parts:
        merged = pa.concat_tables(parts).group_by("o_custkey").aggregate([("n", "sum")])
        cref = ray.put(
            {
                "keys": merged.column("o_custkey").combine_chunks(),
                "n": merged.column("n_sum").combine_chunks(),
            }
        )
    else:
        cref = ray.put({"keys": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})

    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"])

    def probe(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        idx = pc.index_in(t["c_custkey"], value_set=c["keys"])
        n = pc.fill_null(pc.take(c["n"], idx), 0)
        return pa.Table.from_arrays(
            [t["c_custkey"], pc.cast(n, pa.int64())], names=["c_custkey", "n_orders"]
        )

    return cust.map_batches(probe, batch_format="pyarrow")


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c.c_custkey, COUNT(o.o_custkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_types(sf_dir: str):
    """Pivot / cross-tab: user-bucket × event-type counts as one wide row
    per bucket.  Block-local vectorized pivot partials (pyarrow group_by)
    then a 5-column Sum merge — the shuffle carries |buckets| rows."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        bucket = pa.array(
            t["user_id"].to_numpy(zero_copy_only=False) % 10, pa.int64()
        )
        base = pa.Table.from_arrays([bucket, t["event_type"]], names=["bucket", "et"])
        g = base.group_by(["bucket", "et"]).aggregate([("et", "count")])
        buckets = g.column("bucket")
        ets = g.column("et").to_pylist()
        counts = g.column("et_count").to_pylist()
        rows: dict[int, dict[str, int]] = {}
        for b, e, n in zip(buckets.to_pylist(), ets, counts):
            rows.setdefault(int(b), {})[e] = int(n)
        bs = sorted(rows)
        arrays = [pa.array(bs, pa.int64())] + [
            pa.array([rows[b].get(e, 0) for b in bs], pa.int64()) for e in _EVENT_TYPES
        ]
        return pa.Table.from_arrays(
            arrays, names=["bucket"] + [f"n_{e}" for e in _EVENT_TYPES]
        )

    aggs = [Sum(f"n_{e}", alias_name=f"n_{e}") for e in _EVENT_TYPES]
    return ds.map_batches(part, batch_format="pyarrow").groupby("bucket").aggregate(*aggs)


EVENTS_PIVOT_TYPES_SQL = """
SELECT user_id % 10 AS bucket,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events GROUP BY 1
"""


def docs_per_lang_longest(sf_dir: str):
    """Top-3 per group by VALUE (longest docs per language, doc_id
    tiebreak) — the window-function `row_number() OVER (PARTITION BY ...)`
    shape as groupby().map_groups with a block-local pre-prune: each block
    keeps only its own per-lang top-3 before the shuffle, so the exchange
    carries ≤ 3·|langs| rows per block regardless of block size."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])

    def prune(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["lang", "n_chars", "doc_id"], ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("lang").head(3), preserve_index=False)

    def topk(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
            )
        ).slice(0, 3)
        return s.append_column("rk", pa.array(range(1, s.num_rows + 1), pa.int64()))

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(topk, batch_format="pyarrow")
    )


DOCS_PER_LANG_LONGEST_SQL = """
WITH r AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents)
SELECT doc_id, lang, n_chars, rk FROM r WHERE rk <= 3
"""


# --------------------------------------------------------------- bucketed join

def orders_customer_bucketed_join(sf_dir: str):
    """Shuffle-free co-located join over hash-bucketed storage
    (stages/bucketing.py): both tables are written once as
    ``bucket=<h(key) % N>`` parquet layouts (cache fingerprinted on the
    source files), then one Ray task per bucket joins its two co-located
    slices with a local pyarrow hash join — the 100 TB pattern for a join
    key reused across many runs.  Oracle: the plain SQL join."""
    import os

    from ...functions.hashing import stable_hash64
    from ...stages.bucketing import bucketed_join, write_bucketed

    n_buckets = 8
    sts = [os.stat(_t(sf_dir, t)) for t in ("orders", "customer")]
    fp = stable_hash64(
        "|".join(f"{s.st_size}:{s.st_mtime_ns}" for s in sts) + f"|{sf_dir}|b{n_buckets}"
    )
    root = f"/tmp/iocr_buckets_{fp:016x}"
    if not os.path.exists(os.path.join(root, "_DONE")):
        write_bucketed(
            rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]),
            key_col="o_custkey",
            n_buckets=n_buckets,
            out_dir=os.path.join(root, "orders"),
        )
        write_bucketed(
            rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name"]),
            key_col="c_custkey",
            n_buckets=n_buckets,
            out_dir=os.path.join(root, "customer"),
        )
        open(os.path.join(root, "_DONE"), "w").close()
    return bucketed_join(
        os.path.join(root, "orders"),
        os.path.join(root, "customer"),
        n_buckets=n_buckets,
        key_left="o_custkey",
        key_right="c_custkey",
    ).select_columns(["o_orderkey", "c_name"])


ORDERS_CUSTOMER_BUCKETED_JOIN_SQL = """
SELECT o.o_orderkey, c.c_name
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
"""


# ------------------------------------------------------------------ sketches

def events_hll_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT user_id) over events — a
    mergeable per-block sketch with a commutative max-merge, so the estimate
    is bit-deterministic at any parallelism (rows-only; the ±1.6 % error
    bound vs exact is asserted in pytest)."""
    from ...stages.sketch_stats import approx_distinct

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    return approx_distinct(ds, "user_id")


def orders_price_quantile_sketch(sf_dir: str):
    """One-scan approximate quantiles from the KMV bottom-k uniform row
    sample (stages/sketch_stats.py:approx_quantiles_kmv) — mergeable and
    bit-deterministic at any layout, unlike KLL/t-digest whose structure is
    merge-order-dependent.  Rows-only: the estimate is approximate by
    design; the ±O(1/sqrt(k)) rank-error bound, the merge law, and the
    k≥n-exactness degradation are asserted in pytest."""
    from ...stages.sketch_stats import approx_quantiles_kmv

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    cents = ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["o_orderkey"], _cents(t["o_totalprice"])],
            names=["o_orderkey", "price_cents"],
        ),
        batch_format="pyarrow",
    )
    return approx_quantiles_kmv(
        cents, id_col="o_orderkey", val_col="price_cents", qs=[0.25, 0.5, 0.75, 0.95]
    )


def events_user_type_hll(sf_dir: str):
    """Grouped HLL: approximate COUNT(DISTINCT event_type) PER USER — the
    grouped composition of the mergeable sketch (block-local per-key
    register partials, one groupby shuffle carrying registers not rows).
    Rows-only; pytest bounds the estimates against the exact per-user
    distinct counts."""
    from ...stages.sketch_stats import grouped_approx_distinct

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    return grouped_approx_distinct(ds, key_col="user_id", val_col="event_type")


def heavy_hitter_terms(sf_dir: str):
    """Misra-Gries heavy-hitter terms over documents (k=20) — per-block MG
    summaries + the mergeable-summaries driver merge.  Counts are lower
    bounds and depend on block boundaries, so the read pins a fixed block
    count for run-to-run determinism; the superset guarantee (every term
    with frequency > n/(k+1) surfaces) holds at any parallelism (pytest)."""
    from ...stages.sketch_stats import heavy_hitter_terms as hh

    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["text"], override_num_blocks=8
    )
    return hh(ds, k=20)


# -------------------------------------------------- web-prep / training ops


_REDACT_PAT = r"\b(spark|hash)\b"  # stand-in for a PII pattern (email/phone)
_CONTAM_NEEDLES = (  # stand-in benchmark strings for decontamination
    "key order sort",
    "slow join sort",
    "window window dup",
)
_CHUNK_W = 200  # training-window width, characters


def docs_regex_redact(sf_dir: str):
    """PII-style regex scrub over the corpus: every match of a compiled
    pattern is replaced and counted, flag-don't-drop style (the pattern here
    is a deterministic stand-in — swap in email/phone/SSN regexes for a real
    scrub; both pyarrow and DuckDB run RE2, so ``\\b`` semantics agree).
    Fully vectorized: one `replace_substring_regex` + one
    `count_substring_regex` kernel per batch, no row loop."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        hits = pc.cast(pc.count_substring_regex(t["text"], _REDACT_PAT), pa.int64())
        red = pc.replace_substring_regex(t["text"], _REDACT_PAT, "[REDACTED]")
        return pa.table({"doc_id": t["doc_id"], "redacted": red, "n_hits": hits})

    return ds.map_batches(scrub, batch_format="pyarrow")


DOCS_REGEX_REDACT_SQL = r"""
SELECT doc_id,
       regexp_replace(text, '\b(spark|hash)\b', '[REDACTED]', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '\b(spark|hash)\b')) AS BIGINT) AS n_hits
FROM documents
"""


def docs_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag documents containing any of a small
    broadcast set of eval-set strings (the training-data hygiene step every
    LLM pipeline runs before training).  The needle set is tiny and ships
    with the task; each needle is one vectorized `match_substring` kernel —
    at a real eval-suite's needle count you'd swap in an Aho-Corasick
    automaton built once per actor, same plan shape."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def flag(t: pa.Table) -> pa.Table:
        hits = None
        for nd in _CONTAM_NEEDLES:
            m = pc.cast(pc.match_substring(t["text"], nd), pa.int64())
            hits = m if hits is None else pc.add(hits, m)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hits": hits,
                "contaminated": pc.greater(hits, 0),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


DOCS_DECONTAMINATE_SQL = """
SELECT doc_id,
       CAST(contains(text, 'key order sort') AS BIGINT)
     + CAST(contains(text, 'slow join sort') AS BIGINT)
     + CAST(contains(text, 'window window dup') AS BIGINT) AS n_hits,
       (contains(text, 'key order sort')
     OR contains(text, 'slow join sort')
     OR contains(text, 'window window dup')) AS contaminated
FROM documents
"""


def docs_char_chunks(sf_dir: str):
    """Fixed-window training-chunk explosion: each document becomes
    ceil(len/W) rows of W-character chunks with a chunk index — the shape a
    tokenize-and-pack stage consumes.  Vectorized as one `utf8_slice
    codeunits` kernel per WINDOW INDEX (not per row): the loop runs
    max_len/W times per batch, each iteration slicing the whole column."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        doc_ids = t["doc_id"].combine_chunks()
        lens = pc.utf8_length(txt)
        max_len = pc.max(lens).as_py() or 0
        parts = []
        k = 0
        while k * _CHUNK_W < max_len:
            keep = pc.greater(lens, k * _CHUNK_W)
            sl = pc.utf8_slice_codeunits(txt, k * _CHUNK_W, (k + 1) * _CHUNK_W).filter(
                keep
            )
            ids = doc_ids.filter(keep)
            parts.append(
                pa.table(
                    {
                        "doc_id": ids,
                        "chunk_idx": pa.array([k] * len(ids), pa.int64()),
                        "chunk_text": sl,
                        "chunk_len": pc.cast(pc.utf8_length(sl), pa.int64()),
                    }
                )
            )
            k += 1
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                    "chunk_len": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(parts)

    return ds.map_batches(chunk, batch_format="pyarrow")


DOCS_CHAR_CHUNKS_SQL = """
SELECT doc_id,
       unnest(range(len(cs))) AS chunk_idx,
       unnest(cs) AS chunk_text,
       CAST(length(unnest(cs)) AS BIGINT) AS chunk_len
FROM (SELECT doc_id, regexp_extract_all(text, '.{1,200}', 0, 's') AS cs
      FROM documents)
"""


def register_best_match(sf_dir: str):
    """Exact fuzzy best-match with an integer-exact oracle: for every
    customer name, the supplier whose normalized name has minimum
    Levenshtein distance (tie -> lowest s_suppkey).  The register side is
    broadcast once (`ray.put` of the Myers bit-parallel pack —
    functions/similarity.py); each probe scores the WHOLE register in one
    `myers_distance_many` call.  Distances are integers, so this is the
    fuzzy-lookup kernel (stages/fuzzy.py J1) under a full value-exact DuckDB
    `levenshtein()` oracle — the demo pipeline's float scoring stays
    rows-only, the kernel itself is oracle-proven here."""
    from ...functions.similarity import (
        levenshtein_many,
        myers_distance_many,
        pack_myers,
        pack_strings,
    )

    reg = (
        rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    names = [str(n).strip().lower() for n in reg["s_name"]]
    keys = np.asarray(reg["s_suppkey"], dtype=np.int64)
    my = pack_myers(names)  # None iff a register name exceeds 64 chars
    packed = {
        "myers": my,
        "dp": pack_strings(names) if my is None else None,
        "keys": keys,
    }
    ref = ray.put(packed)

    def best(t: pa.Table) -> pa.Table:
        p = ray.get(ref)
        out_k, out_d = [], []
        for nm in t["c_name"].to_pylist():
            q = str(nm or "").strip().lower()
            if p["myers"] is not None:
                d = myers_distance_many(q, p["myers"])
            else:  # register names exceed the 64-bit Myers lane: DP rows
                mat, lens = p["dp"]
                d = levenshtein_many(q, mat, lens)
            m = int(d.min())
            out_k.append(int(p["keys"][d == m].min()))
            out_d.append(m)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "best_suppkey": pa.array(out_k, pa.int64()),
                "distance": pa.array(out_d, pa.int64()),
            }
        )

    probes = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    return probes.map_batches(best, batch_format="pyarrow")


REGISTER_BEST_MATCH_SQL = """
WITH scored AS (
    SELECT c.c_custkey, s.s_suppkey,
           levenshtein(lower(trim(c.c_name)), lower(trim(s.s_name))) AS d
    FROM customer c CROSS JOIN supplier s
)
SELECT c_custkey, s_suppkey AS best_suppkey, CAST(d AS BIGINT) AS distance
FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY d, s_suppkey) AS rn
      FROM scored)
WHERE rn = 1
"""


def docs_global_shuffle_rank(sf_dir: str):
    """Deterministic training-order global shuffle (stages/rank.py): every
    row's exact global position under ORDER BY (md5(id), id), computed with
    one narrow hash pass + 256 driver-side bucket counters + one
    bucket-grouped shuffle — no global sort, no driver collect."""
    from ...stages.rank import global_rank

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    return global_rank(ds, id_col="doc_id")


DOCS_GLOBAL_SHUFFLE_RANK_SQL = """
SELECT doc_id,
       row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
           AS pos
FROM documents
"""


def term_postings(sf_dir: str):
    """Inverted-index build — the retrieval/decontamination index shape:
    tokenize per block, reduce to DISTINCT (term, doc_id) pairs block-locally
    (the combiner — the shuffle carries the doc-term incidence, never raw
    token occurrences), one ``groupby(term)`` shuffle, then each group emits
    its sorted posting list.  Output (term, n_docs, postings) is the exact
    index segment, verified against DuckDB ``string_agg``.  At 100 TB the
    posting lists for stopword-grade terms are the skew risk — cap or
    tier them (doc-frequency cutoff) exactly like `_cap_bucket` in the LSH
    stage; the synthetic vocabulary here is small enough to keep whole."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()), pattern=r"[^a-z0-9]+"
        )
        terms = lst.flatten()
        ids = t["doc_id"].combine_chunks().take(lst.value_parent_indices())
        tbl = pa.table({"term": terms, "doc_id": ids})
        tbl = tbl.filter(pc.not_equal(tbl["term"], ""))
        return tbl.group_by(["term", "doc_id"]).aggregate([])

    def plist(g: pa.Table) -> pa.Table:
        ids = sorted(g["doc_id"].to_pylist())
        return pa.table(
            {
                "term": pa.array([g["term"][0].as_py()], pa.string()),
                "n_docs": pa.array([len(ids)], pa.int64()),
                "postings": pa.array([",".join(map(str, ids))], pa.string()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("term")
        .map_groups(plist, batch_format="pyarrow")
    )


TERM_POSTINGS_SQL = """
WITH pairs AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term, doc_id
    FROM documents)
  WHERE term <> '')
SELECT term, CAST(COUNT(*) AS BIGINT) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY term
"""


def dedup_incremental_bloom(sf_dir: str):
    """Bloom-prefiltered incremental dedup with EXACT output (the production
    scale path for `dedup_incremental`): the standing corpus's fingerprints
    fold into a fixed-size Bloom bitset (per-block partial ORs, broadcast
    once — `stages/dedup.py:bloom_flag_seen`); bloom-NEGATIVE rows are
    definitely new (no false negatives) and bypass verification entirely;
    only the maybe-seen sliver (dup rate + ~1e-5 FP) is exact-verified
    against the prior key set.  Output therefore equals the EXISTS
    semantics — same oracle as `dedup_incremental` — while the exact-verify
    input shrinks to the sliver (at 100 TB: verify via a hash-partitioned
    join on that sliver instead of this broadcast key set)."""
    from ...stages.dedup import bloom_flag_seen, flag_seen_before
    from ...stages.text_analysis import fingerprint_stage

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    fps = fingerprint_stage(docs).select_columns(["doc_id", "fp_md5"])
    prior = fps.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 250)), batch_format="pyarrow"
    )
    new = fps.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], 250)), batch_format="pyarrow"
    )
    prior = prior.materialize()  # consumed twice: bloom build + sliver verify
    maybe = bloom_flag_seen(new, prior, key_col="fp_md5")
    sliver = maybe.map_batches(
        lambda t: t.filter(t["maybe_seen"].combine_chunks()), batch_format="pyarrow"
    )
    verified = flag_seen_before(sliver, prior, key_col="fp_md5")

    def negatives(t: pa.Table) -> pa.Table:
        neg = t.filter(pc.invert(t["maybe_seen"].combine_chunks()))
        return pa.table(
            {
                "doc_id": neg["doc_id"],
                "seen_before": pa.array([False] * neg.num_rows, pa.bool_()),
            }
        )

    return maybe.map_batches(negatives, batch_format="pyarrow").union(
        verified.select_columns(["doc_id", "seen_before"])
    )


DEDUP_INCREMENTAL_BLOOM_SQL = """
SELECT d.doc_id,
       EXISTS (SELECT 1 FROM documents p
               WHERE p.doc_id < 250 AND md5(p.text) = md5(d.text)) AS seen_before
FROM documents d WHERE d.doc_id >= 250
"""


def embeddings_kmeans(sf_dir: str):
    """Distributed Lloyd k-means over the embedding column
    (stages/cluster.py): deterministic hash seeding, one shuffle-free pass
    per iteration emitting fixed-point integer partial sums (bit-identical
    centroids at any parallelism), broadcast centroid matrix.  Rows-only
    (iterative — not SQL-expressible); the planted-label recovery and
    cross-parallelism determinism are pytest-proven."""
    from ...stages.cluster import kmeans

    ds = rd.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    ).materialize()
    return kmeans(ds, k=8, iters=8)


def orders_csv_export(sf_dir: str):
    """S6 CSV report through a REAL write→read roundtrip (stages/report.py:
    export_csv ≙ server.js:577-602): the top-20 orders page is written to a
    CSV report directory and read back via ``read_csv`` — the oracle checks
    the roundtripped values, so header mapping and number formatting are in
    the verified surface (previously pytest-only; VERDICT r2 'minor')."""
    import os

    from ...functions.hashing import stable_hash64
    from ...stages.report import export_csv, paginated

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    page = paginated(
        ds,
        sort_keys=["o_totalprice", "o_orderkey"],
        descending=[True, False],
        limit=20,
        offset=0,
    )
    st = os.stat(f"{sf_dir.rstrip('/')}/orders.parquet")
    key = stable_hash64(f"{sf_dir}|orders_csv|v1|{st.st_size}|{st.st_mtime_ns}")
    out = f"/tmp/iocr_csv_export_{key:016x}"
    if not os.path.isdir(out):
        export_csv(rd.from_arrow(page), out + ".tmp", ["o_orderkey", "o_totalprice"])
        os.rename(out + ".tmp", out)
    return rd.read_csv(out)


ORDERS_CSV_EXPORT_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def run_history_top20(sf_dir: str):
    """T3 session history through the manifest surface (state/manifest.py
    ≙ the reference's top-20 reconciliation-session listing): a
    deterministic 30-run manifest derived from the orders table is written
    once, then the 20 most recent completed runs are listed newest-first.
    Rows-only: the result is manifest state, not a table scan."""
    import os

    from ...functions.hashing import stable_hash64
    from ...state.manifest import RunManifest

    counts = (
        rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey"])
        .count()
    )
    key = stable_hash64(f"{sf_dir}|history|v1|{counts}")
    d = f"/tmp/iocr_history_{key:016x}"
    m = RunManifest(d)
    if not m.entries():
        for i in range(30):
            m.record(
                {
                    "part_id": f"run-{i:02d}",
                    "status": "done" if i % 5 else "failed",
                    "seq": i,
                    "rows_in": counts,
                    "matched": (i * 37) % counts,
                }
            )
    rows = m.recent(20)
    return pa.table(
        {
            "part_id": pa.array([r["part_id"] for r in rows], pa.string()),
            "seq": pa.array([int(r["seq"]) for r in rows], pa.int64()),
            "matched": pa.array([int(r["matched"]) for r in rows], pa.int64()),
        }
    )


def docs_token_diversity(sf_dir: str):
    """Gopher-style repetition signal: per-document token count, distinct
    token count, and the repeated-token fraction (µ-scaled integer so the
    DuckDB comparison is exact).  Because a document's text lives in ONE
    row, the whole computation is BLOCK-LOCAL — explode + pyarrow
    ``group_by(doc_id)`` inside the batch, zero shuffle — the property that
    makes per-document quality signals free at 100 TB while per-corpus ones
    (`top_terms`) need a combiner."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()), pattern=r"[^a-z0-9]+"
        )
        terms = lst.flatten()
        ids = t["doc_id"].combine_chunks().take(lst.value_parent_indices())
        pairs = pa.table({"doc_id": ids, "term": terms}).filter(
            pc.not_equal(terms, "")
        )
        g = pairs.group_by("doc_id").aggregate(
            [("term", "count"), ("term", "count_distinct")]
        )
        n = pc.cast(g["term_count"], pa.int64())
        d = pc.cast(g["term_count_distinct"], pa.int64())
        # repeated fraction in exact millionths: floor((n-d)*1e6 / n)
        rep = pc.divide(pc.multiply(pc.subtract(n, d), pa.scalar(1_000_000, pa.int64())), n)
        return pa.table(
            {"doc_id": g["doc_id"], "n_tokens": n, "n_distinct": d, "rep_ppm": rep}
        )

    return ds.map_batches(stats, batch_format="pyarrow")


DOCS_TOKEN_DIVERSITY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT term) AS BIGINT) AS n_distinct,
       CAST((COUNT(*) - COUNT(DISTINCT term)) * 1000000 // COUNT(*) AS BIGINT)
           AS rep_ppm
FROM toks WHERE term <> '' GROUP BY doc_id
"""


def embeddings_label_centroids(sf_dir: str):
    """Distributed vector aggregation — the partial-sum kernel under
    k-means (stages/cluster.py), exposed as its own ORACLE-CHECKED op:
    per-label embedding sums in fixed-point µ-units (int64) plus counts.
    Each block emits at most |labels|·d combiner rows regardless of block
    size; the merge is one small groupby Sum.  Integer addition is exactly
    associative, so the result is bit-identical at any parallelism AND to
    DuckDB (the float32 source is widened to float64 BEFORE scaling on
    both sides — widening after the multiply loses ulps)."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lab) == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "sum_uv": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        vecs = _vecs(t, "embedding")
        fixed = np.floor(vecs * 1_000_000 + 0.5).astype(np.int64)
        uniq, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(uniq), vecs.shape[1]), np.int64)
        np.add.at(sums, inv, fixed)
        counts = np.bincount(inv).astype(np.int64)
        d = vecs.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "sum_uv": pa.array(sums.ravel(), pa.int64()),
                "n": pa.array(np.repeat(counts, d), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_uv", alias_name="sum_uv"), Sum("n", alias_name="n"))
    )


EMBEDDINGS_LABEL_CENTROIDS_SQL = """
WITH ex AS (
  SELECT label,
         unnest(embedding) AS v,
         unnest(range(len(embedding))) AS dim
  FROM embeddings)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE)*1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_uv,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ex GROUP BY 1, 2
"""


def orders_rollup_revenue(sf_dir: str):
    """OLAP ROLLUP / grouping-sets aggregate: revenue by (year, priority)
    plus per-year subtotals plus the grand total, one row set (≙ the
    reference dashboard's stacked year/priority charts, server.js:244-267,
    generalized to multi-level).  Distributed part: block-local cents
    partials merged by one small groupby on the finest key — the rollup
    expansion runs over the already-aggregated |years|×|priorities| table
    (a few dozen rows), never over row data, so the super-levels cost
    O(groups) and are exact by int64 re-summation.  NULL rollup keys are
    materialized as sentinels (yr=-1, prio='ALL') on BOTH sides so the
    hash compare never sees nullable-int coercion; lvl is the standard
    GROUPING() bitmask (0 finest, 1 year subtotal, 3 grand total)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                t["o_orderpriority"],
                _cents(t["o_totalprice"]),
            ],
            names=["yr", "prio", "total_c"],
        )

    finest = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["yr", "prio"])
        .aggregate(Sum("total_c", alias_name="sum_total_cents"), Count(alias_name="n"))
        .to_pandas()  # |years|×|priorities| rows — the small-result exception
    )
    import pandas as pd

    finest["lvl"] = np.int64(0)
    per_year = (
        finest.groupby("yr", as_index=False)[["sum_total_cents", "n"]].sum().assign(prio="ALL", lvl=np.int64(1))
    )
    grand = pd.DataFrame(
        {
            "yr": [np.int64(-1)],
            "prio": ["ALL"],
            "sum_total_cents": [finest["sum_total_cents"].sum()],
            "n": [finest["n"].sum()],
            "lvl": [np.int64(3)],
        }
    )
    cols = ["yr", "prio", "sum_total_cents", "n", "lvl"]
    out = pd.concat([finest[cols], per_year[cols], grand[cols]], ignore_index=True)
    for c in ("yr", "sum_total_cents", "n", "lvl"):
        out[c] = out[c].astype("int64")
    return out


ORDERS_ROLLUP_REVENUE_SQL = """
WITH f AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderpriority AS prio,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_c
  FROM orders)
SELECT COALESCE(yr, -1) AS yr, COALESCE(prio, 'ALL') AS prio,
       CAST(SUM(total_c) AS BIGINT) AS sum_total_cents,
       COUNT(*) AS n,
       CAST(GROUPING(yr) * 2 + GROUPING(prio) AS BIGINT) AS lvl
FROM f GROUP BY ROLLUP (yr, prio)
"""


def lineitem_moment_stats(sf_dir: str):
    """Mergeable sufficient statistics (distributed second moments): per
    return-flag n, Σq, Σprice_c, Σq·price_c, Σq² — the exact inputs to a
    least-squares price~quantity fit, kept in int64 so block partials merge
    associatively and match DuckDB bit-for-bit.  Bounds: q ≤ 50 (integral
    in the data, floor(+0.5) guards ties), price_c ≤ ~1.05e7, so Σq·price_c
    grows ~5e8/row — int64 holds to ~1.7e10 rows per GROUP; at 100 TB
    partition the merge per shard or widen the merge side to decimal128."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.floor(pc.add(pc.cast(t["l_quantity"], pa.float64()), 0.5)), pa.int64())
        p = _cents(t["l_extendedprice"])
        return pa.Table.from_arrays(
            [
                t["l_returnflag"],
                q,
                p,
                pc.multiply(q, p),
                pc.multiply(q, q),
            ],
            names=["l_returnflag", "q", "p_c", "qp_c", "q2"],
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n"),
            Sum("q", alias_name="sum_q"),
            Sum("p_c", alias_name="sum_price_cents"),
            Sum("qp_c", alias_name="sum_qprice_cents"),
            Sum("q2", alias_name="sum_q2"),
        )
    )


LINEITEM_MOMENT_STATS_SQL = """
WITH f AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS p_c
  FROM lineitem)
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       CAST(SUM(p_c) AS BIGINT) AS sum_price_cents,
       CAST(SUM(q*p_c) AS BIGINT) AS sum_qprice_cents,
       CAST(SUM(q*q) AS BIGINT) AS sum_q2
FROM f GROUP BY 1
"""


def events_type_setops(sf_dir: str):
    """Distinct set operations (INTERSECT / EXCEPT) over two scoped views
    of one table: event types seen for even vs odd user ids.  One scan;
    each block emits its DISTINCT (type, side-bit) pairs — O(|types|) per
    block regardless of block size — and the merge is a tiny groupby Max
    per side, classified into common / even_only / odd_only.  The shuffle
    therefore carries the type dictionary, never event rows."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        even = pc.equal(pc.bit_wise_and(t["user_id"], 1), 0)
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "in_even": pc.cast(even, pa.int64()),
                    "in_odd": pc.cast(pc.invert(even), pa.int64()),
                }
            )
            .group_by("event_type")
            .aggregate([("in_even", "max"), ("in_odd", "max")])
        )
        return g.rename_columns(["event_type", "in_even", "in_odd"])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Max("in_even", alias_name="in_even"), Max("in_odd", alias_name="in_odd"))
        .to_pandas()  # |event types| rows
    )
    both = (merged["in_even"] == 1) & (merged["in_odd"] == 1)
    merged["setop"] = np.where(both, "common", np.where(merged["in_even"] == 1, "even_only", "odd_only"))
    return merged[["event_type", "setop"]]


EVENTS_TYPE_SETOPS_SQL = """
WITH a AS (SELECT DISTINCT event_type FROM events WHERE user_id % 2 = 0),
     b AS (SELECT DISTINCT event_type FROM events WHERE user_id % 2 = 1)
SELECT event_type, 'common' AS setop FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
UNION ALL
SELECT event_type, 'even_only' FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
UNION ALL
SELECT event_type, 'odd_only' FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
"""


def orders_asof_next_event(sf_dir: str):
    """Forward as-of join (stages/asof.py direction='forward'): every order
    is matched to the customer's FIRST event at-or-after the order date
    (smallest ts ≥ o_orderdate, ties → min event_id — the mirror of the
    backward rule).  Same co-partition layout; the direction costs one
    extra searchsorted, not a second shuffle."""
    from ...stages.asof import asof_join

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "user_id", "o_orderdate"]),
        batch_format="pyarrow",
    )
    events = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    out = asof_join(
        orders,
        events,
        key="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        left_cols=["o_orderkey"],
        right_cols=["event_id"],
        tiebreak="event_id",
        direction="forward",
    )
    return out.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "next_event_id"]),
        batch_format="pyarrow",
    )


ORDERS_ASOF_NEXT_EVENT_SQL = """
WITH m AS (
  SELECT o.o_orderkey, e.event_id,
         row_number() OVER (PARTITION BY o.o_orderkey
                            ORDER BY e.ts ASC, e.event_id ASC) AS rn
  FROM orders o JOIN events e
    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
SELECT o_orderkey, event_id AS next_event_id FROM m WHERE rn = 1
"""


def events_asof_nearest_checkpoint(sf_dir: str):
    """Nearest as-of join (direction='nearest') with candidates on BOTH
    sides: every non-checkpoint event finds the time-closest checkpoint
    event (event_id % 5 == 0) of the same user.  An exact distance tie
    prefers the backward (at-or-before) candidate; within a side, backward
    ties take the max checkpoint id, forward ties the min."""
    from ...stages.asof import asof_join

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def _mod5(t: pa.Table):
        return pc.subtract(
            t["event_id"], pc.multiply(pc.divide(t["event_id"], 5), 5)
        )

    left = ev.map_batches(
        lambda t: t.filter(pc.not_equal(_mod5(t), 0)), batch_format="pyarrow"
    )
    right = ev.map_batches(
        lambda t: t.filter(pc.equal(_mod5(t), 0)).rename_columns(
            ["checkpoint_id", "user_id", "cts"]
        ),
        batch_format="pyarrow",
    )
    out = asof_join(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="cts",
        left_cols=["event_id"],
        right_cols=["checkpoint_id"],
        tiebreak="checkpoint_id",
        direction="nearest",
    )
    return out


EVENTS_ASOF_NEAREST_CHECKPOINT_SQL = """
WITH cp AS (SELECT event_id AS checkpoint_id, user_id, ts AS cts
            FROM events WHERE event_id % 5 = 0),
m AS (
  SELECT e.event_id, c.checkpoint_id,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY abs(epoch_us(c.cts) - epoch_us(e.ts)),
                                     (c.cts > e.ts),
                                     CASE WHEN c.cts > e.ts
                                          THEN c.checkpoint_id
                                          ELSE -c.checkpoint_id END) AS rn
  FROM events e JOIN cp c ON c.user_id = e.user_id
  WHERE e.event_id % 5 <> 0)
SELECT event_id, checkpoint_id FROM m WHERE rn = 1
"""


def orders_quantiles_by_priority(sf_dir: str):
    """PER-GROUP exact quantiles (stages/quantiles.exact_group_quantiles):
    p25/p50/p75/p90 of o_totalprice within each priority, via per-(key,bin)
    sparse histogram partials — no group ever has to fit in one task, unlike
    a map_groups sort.  Selected values reported in integer cents."""
    from ...stages.quantiles import exact_group_quantiles

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"])
    qs = [0.25, 0.5, 0.75, 0.9]
    t = exact_group_quantiles(ds, "o_orderpriority", "o_totalprice", qs)
    return pa.table(
        {
            "prio": t["key"],
            "q_pct": pc.cast(
                pc.floor(pc.add(pc.multiply(t["q"], 100.0), 0.5)), pa.int64()
            ),
            "value_cents": _cents(t["value"]),
        }
    )


ORDERS_QUANTILES_BY_PRIORITY_SQL = """
WITH s AS (
  SELECT o_orderpriority AS prio,
         quantile_disc(o_totalprice, [0.25, 0.5, 0.75, 0.9]) AS v
  FROM orders GROUP BY 1)
SELECT prio, CAST(z[1]*100 AS BIGINT) AS q_pct,
       CAST(FLOOR(CAST(z[2] AS DOUBLE)*100 + 0.5) AS BIGINT) AS value_cents
FROM (SELECT prio, unnest(list_zip([0.25, 0.5, 0.75, 0.9], v)) AS z FROM s)
"""


def events_mode_user(sf_dir: str):
    """Per-group MODE with deterministic tie-break: for each event type the
    user with the most events (ties → smallest user id).  Block-local
    (type, user) count partials bound the shuffle to the pair dictionary;
    the final argmax runs over the merged O(|pairs|) aggregate."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "user_id"])

    def part(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"event_type": t["event_type"], "user_id": t["user_id"]})
            .group_by(["event_type", "user_id"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "user_id", "n"])

    merged = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |types|x|users| pair counts — small vs row data
    )
    merged = merged.sort_values(
        ["event_type", "n", "user_id"], ascending=[True, False, True]
    )
    top = merged.groupby("event_type", as_index=False).first()
    top = top.rename(columns={"user_id": "mode_user_id", "n": "n_events"})
    for c in ("mode_user_id", "n_events"):
        top[c] = top[c].astype("int64")
    return top[["event_type", "mode_user_id", "n_events"]]


EVENTS_MODE_USER_SQL = """
WITH c AS (SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2),
r AS (SELECT event_type, user_id, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, user_id ASC) AS rn
      FROM c)
SELECT event_type, CAST(user_id AS BIGINT) AS mode_user_id,
       CAST(n AS BIGINT) AS n_events
FROM r WHERE rn = 1
"""


def orders_diff_demo(sf_dir: str):
    """Keyed table diff (stages/cdc.py:diff_by_key): classify keys across
    two dataset versions into added / removed / changed; identical keys emit
    nothing.  The 'new' version here is a deterministic perturbation of
    orders (drop key%13, re-prioritize key%7, clone key%97 under key+1e9) so
    the oracle can reconstruct the exact expected classification."""
    from ...stages.cdc import diff_by_key

    cols = ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]
    base = rd.read_parquet(_t(sf_dir, "orders"), columns=cols)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderstatus": t["o_orderstatus"],
                "o_orderpriority": t["o_orderpriority"],
                "total_c": _cents(t["o_totalprice"]),
            }
        )

    def _mod(arr, m: int):
        return pc.subtract(arr, pc.multiply(pc.divide(arr, m), m))

    def perturb(t: pa.Table) -> pa.Table:
        t = shape(t)
        t = t.filter(pc.not_equal(_mod(t["o_orderkey"], 13), 0))
        prio = pc.if_else(
            pc.equal(_mod(t["o_orderkey"], 7), 0), pa.scalar("X-DIFF"), t["o_orderpriority"]
        )
        t = t.set_column(2, "o_orderpriority", prio)
        clones = t.filter(pc.equal(_mod(t["o_orderkey"], 97), 0))
        clones = clones.set_column(
            0, "o_orderkey", pc.add(clones["o_orderkey"], 1_000_000_000)
        )
        return pa.concat_tables([t, clones])

    base_s = base.map_batches(shape, batch_format="pyarrow")
    new_s = base.map_batches(perturb, batch_format="pyarrow")
    return diff_by_key(
        base_s,
        new_s,
        key="o_orderkey",
        value_cols=["o_orderstatus", "o_orderpriority", "total_c"],
    )


ORDERS_DIFF_DEMO_SQL = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, 'removed' AS diff
FROM orders WHERE o_orderkey % 13 = 0
UNION ALL
SELECT o_orderkey, 'changed' FROM orders
WHERE o_orderkey % 13 <> 0 AND o_orderkey % 7 = 0
UNION ALL
SELECT o_orderkey + 1000000000, 'added' FROM orders
WHERE o_orderkey % 13 <> 0 AND o_orderkey % 97 = 0
"""


def events_latest_per_user(sf_dir: str):
    """CDC log compaction (stages/cdc.py:latest_per_key): per user, the
    single most recent event row (max ts, ties → max event_id).  Block
    partials keep one row per user per block, so the shuffle is bounded by
    the user dictionary per block — the upsert-resolution shape."""
    from ...stages.cdc import latest_per_key

    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "event_id", "ts", "value"]
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "last_event_id": t["event_id"],
                "last_ts_us": pc.cast(t["ts"], pa.int64()),
                "last_value_cents": _cents(t["value"]),
            }
        )

    return latest_per_key(
        ds.map_batches(shape, batch_format="pyarrow"),
        key="user_id",
        order_col="last_ts_us",
        tiebreak="last_event_id",
    )


EVENTS_LATEST_PER_USER_SQL = """
WITH r AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS last_event_id,
       CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
       CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS last_value_cents
FROM r WHERE rn = 1
"""


def events_multi_window_features(sf_dir: str):
    """Multi-horizon activity features (stages/asof.py:range_join_multi_count):
    for every event, the same user's event counts in the trailing 1 h / 6 h /
    24 h (inclusive of the event itself).  One co-partition shuffle and one
    sorted timestamp array per user serve ALL horizons — each extra window
    is one more vectorized searchsorted, never another join."""
    from ...stages.asof import range_join_multi_count

    left = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    right = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    h = 3_600_000_000  # one hour in µs
    return range_join_multi_count(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_cols=["event_id"],
        windows_us={"n_1h": h, "n_6h": 6 * h, "n_24h": 24 * h},
    )


EVENTS_MULTI_WINDOW_FEATURES_SQL = """
SELECT e.event_id,
       CAST(COUNT(*) FILTER (WHERE e2.ts > e.ts - INTERVAL 1 HOUR) AS BIGINT) AS n_1h,
       CAST(COUNT(*) FILTER (WHERE e2.ts > e.ts - INTERVAL 6 HOUR) AS BIGINT) AS n_6h,
       CAST(COUNT(*) AS BIGINT) AS n_24h
FROM events e JOIN events e2
  ON e2.user_id = e.user_id AND e2.ts <= e.ts
 AND e2.ts > e.ts - INTERVAL 24 HOUR
GROUP BY e.event_id
"""


def web_training_export_demo(sf_dir: str):
    """The NORTH-STAR end-to-end composition: synthetic web pages → the
    real flagship extraction engine (magic-bytes routing, boilerplate
    strip, XY-cut, dedup, reconcile) → quality gate → fixed-window chunking
    → reproducible global shuffle → sharded parquet + resume manifest
    (pipelines/training_export.py:export_web_training_set).  Returns the
    per-shard chunk counts read back from the written output (rows-only —
    gate/reassembly/resume contracts are pytest-proven)."""
    import os

    from ...functions.hashing import stable_hash64
    from ..training_export import export_web_training_set

    st = os.stat(f"{sf_dir.rstrip('/')}/documents.parquet")
    fp = f"{sf_dir}|webexport|v1|{st.st_size}|{st.st_mtime_ns}"
    out = f"/tmp/iocr_webexport_{stable_hash64(fp):016x}"
    export_web_training_set(_flagship_materialized(sf_dir), out, fingerprint=fp)
    shards = rd.read_parquet(os.path.join(out, "data"))
    counts = shards.groupby("shard").count()
    return counts.rename_columns({"count()": "n_chunks"})


def training_export_demo(sf_dir: str):
    """The composed end-to-end training-set export
    (pipelines/training_export.py): curate → decontaminate → chunk →
    deterministic global shuffle → sharded parquet + resume manifest.
    Returns the per-shard row counts read back from the written output
    (rows-only — the pipeline's own determinism/resume contracts are
    pytest-proven)."""
    import os

    from ...functions.hashing import stable_hash64
    from ..training_export import export_training_set

    st = os.stat(f"{sf_dir.rstrip('/')}/documents.parquet")
    key = stable_hash64(f"{sf_dir}|export_demo|v1|{st.st_size}|{st.st_mtime_ns}")
    out = f"/tmp/iocr_export_{key:016x}"
    export_training_set(sf_dir, out)
    shards = rd.read_parquet(os.path.join(out, "data"))
    counts = shards.groupby("shard").count()
    return counts.rename_columns({"count()": "n_chunks"})


def embeddings_gram_matrix(sf_dir: str):
    """Distributed Gram / second-moment matrix of the embedding corpus — the
    sufficient statistic under PCA, covariance whitening, and linear probes
    (first moments are `embeddings_label_centroids`; together they give the
    covariance).  Each block contributes ONE d×d int64 matmul
    (``fixed.T @ fixed``) regardless of row count, so the shuffle carries
    O(d²) combiner rows per block and the merge is a tiny groupby Sum —
    integer addition keeps the result bit-identical at any parallelism and
    to DuckDB.  Fixed-point: each component is scaled ×1000 BEFORE the
    product (products are ~1e6-scaled; int64 safely sums ~10^12 unit-norm
    vectors — document the bound, don't guess).  Only the upper triangle
    (i ≤ j) ships; the matrix is symmetric."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        empty = pa.table(
            {
                "i": pa.array([], pa.int64()),
                "j": pa.array([], pa.int64()),
                "sum_ij": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        vecs = _vecs(t, "embedding")
        fixed = np.floor(vecs * 1000.0 + 0.5).astype(np.int64)
        gram = fixed.T @ fixed
        d = fixed.shape[1]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "sum_ij": pa.array(gram[iu, ju]),
                "n": pa.array(np.full(len(iu), t.num_rows, np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("sum_ij", alias_name="sum_ij"), Sum("n", alias_name="n"))
    )


EMBEDDINGS_GRAM_MATRIX_SQL = """
WITH ex AS (
  SELECT vec_id,
         CAST(FLOOR(CAST(v AS DOUBLE)*1000 + 0.5) AS BIGINT) AS f,
         CAST(dim AS BIGINT) AS dim
  FROM (SELECT vec_id, unnest(embedding) AS v,
               unnest(range(len(embedding))) AS dim
        FROM embeddings))
SELECT a.dim AS i, b.dim AS j,
       CAST(SUM(a.f * b.f) AS BIGINT) AS sum_ij,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY 1, 2
"""


def events_gapfill_hourly(sf_dir: str):
    """Time-series resample with GAP FILL: hourly (event_type, bucket)
    counts + value cents where every hour between the corpus min and max
    appears for every type, zero-filled — the densification step feeding
    any windowed model or monitoring rollup (absent buckets are silent
    data-loss bugs otherwise).  Block-local (type, hour) partials make the
    shuffle O(types·hours); the dense grid is built on the DRIVER from the
    already-aggregated table (documented bound: O(types·hours) rows — the
    grid IS the output, so nothing smaller exists)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type", "value"])
    HOUR_US = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        bucket = pc.multiply(pc.divide(us, HOUR_US), pa.scalar(3600, pa.int64()))
        p = pa.table(
            {"event_type": t["event_type"], "bucket_s": bucket, "_c": _cents(t["value"])}
        )
        g = p.group_by(["event_type", "bucket_s"]).aggregate(
            [("_c", "sum"), ("_c", "count")]
        )
        return g.rename_columns(["event_type", "bucket_s", "_c", "_n"])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bucket_s"])
        .aggregate(Sum("_c", alias_name="_c"), Sum("_n", alias_name="_n"))
    )
    t = pa.concat_tables(list(merged.iter_batches(batch_format="pyarrow")))
    lo = pc.min(t["bucket_s"]).as_py()
    hi = pc.max(t["bucket_s"]).as_py()
    hours = np.arange(lo, hi + 3600, 3600, dtype=np.int64)
    types = pc.unique(t["event_type"].combine_chunks()).sort()
    grid = pa.table(
        {
            "event_type": pc.take(
                types, pa.array(np.repeat(np.arange(len(types)), len(hours)))
            ),
            "bucket_s": pa.array(np.tile(hours, len(types))),
        }
    )
    full = grid.join(
        t, keys=["event_type", "bucket_s"], join_type="left outer"
    )
    out = pa.table(
        {
            "event_type": full["event_type"],
            "bucket_s": full["bucket_s"],
            "n_events": pc.fill_null(pc.cast(full["_n"], pa.int64()), 0),
            "sum_value_cents": pc.fill_null(pc.cast(full["_c"], pa.int64()), 0),
        }
    )
    return rd.from_arrow(out)


EVENTS_GAPFILL_HOURLY_SQL = """
WITH h AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket_s,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events),
bounds AS (SELECT MIN(bucket_s) AS lo, MAX(bucket_s) AS hi FROM h),
grid AS (
  SELECT t.event_type, g.bucket_s
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN (SELECT unnest(range(lo, hi + 3600, 3600)) AS bucket_s
              FROM bounds) g),
agg AS (SELECT event_type, bucket_s, COUNT(*) AS n, SUM(cents) AS c
        FROM h GROUP BY 1, 2)
SELECT grid.event_type, grid.bucket_s,
       CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(agg.c, 0) AS BIGINT) AS sum_value_cents
FROM grid LEFT JOIN agg USING (event_type, bucket_s)
"""


def lineitem_salted_join_revenue(sf_dir: str):
    """Skew-tolerant distributed JOIN (stages/skew.py:salted_join): revenue
    by order priority through a lineitem⋈orders hash join where keys above
    a row-count threshold get their dim rows replicated across 4 salts and
    their fact rows spread round-robin — no shuffle partition ever receives
    a whole hot key.  EXACT by construction (every plain-join output row
    appears exactly once), verified against the unsalted SQL join.  The
    hot-key detector is itself a block-partial count → O(distinct) merge."""
    from ...stages.skew import hot_join_keys, salted_join

    fact = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice"]
    ).map_batches(
        lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"], "price_cents": _cents(t["l_extendedprice"])}
        ),
        batch_format="pyarrow",
    )
    dim = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    hot = hot_join_keys(
        rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey"]),
        key_col="l_orderkey",
        threshold=6,
    )
    joined = salted_join(
        fact,
        dim,
        fact_key="l_orderkey",
        dim_key="o_orderkey",
        hot_keys=hot,
        buckets=4,
        num_partitions=8,
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate(
            [("price_cents", "sum"), ("price_cents", "count")]
        )
        return g.rename_columns(["o_orderpriority", "_s", "_n"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("_s", alias_name="revenue_cents"), Sum("_n", alias_name="n_items")
        )
    )


LINEITEM_SALTED_JOIN_REVENUE_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def docs_split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment — the step between
    curation and export in every training pipeline.  Content-stable md5
    bucketing (80/10/10), NEVER seed- or partitioning-dependent sampling:
    any engine, any re-run, any shard layout produces the identical split,
    and a document can never migrate between splits when the corpus grows
    (the property random splits lack).  Zero shuffle."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def assign(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t["doc_id"].to_pylist()
        b = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 for i in ids]
        split = ["train" if x < 80 else ("val" if x < 90 else "test") for x in b]
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


DOCS_SPLIT_ASSIGN_SQL = """
SELECT doc_id, lang,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END
           AS split
FROM (SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                 % 100 AS b
      FROM documents)
"""


def orders_profile(sf_dir: str):
    """One-shot dataset PROFILING (the describe()/data-quality-audit shape:
    per-column row count, null count, exact distinct count, min, max) over
    five orders columns.  Two streaming passes: (1) block-local typed
    min/max/n/n_null partials merged on the driver (O(cols·blocks) rows);
    (2) block-local DISTINCT (col, value) pairs so the count-distinct
    shuffle carries O(Σ per-col distinct), not O(rows) — the exact path;
    the approximate path at higher cardinality is the HLL machinery
    (`events_hll_users`).  Values are canonicalized to integer-exact
    strings (cents / epoch seconds) so min/max hash identically to SQL."""
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=cols)

    def canon_columns(t: pa.Table) -> dict[str, pa.Array]:
        return {
            "o_orderkey": pc.cast(t["o_orderkey"], pa.string()),
            "o_custkey": pc.cast(t["o_custkey"], pa.string()),
            "o_totalprice": pc.cast(_cents(t["o_totalprice"]), pa.string()),
            "o_orderstatus": t["o_orderstatus"].combine_chunks(),
            "o_orderpriority": t["o_orderpriority"].combine_chunks(),
        }

    def stats_partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        canon = canon_columns(t)
        for c in cols:
            arr = t[c]
            names.append(c)
            ns.append(t.num_rows)
            nulls.append(arr.null_count)
            cn = canon[c]
            # canonical strings of fixed-width integers / categories compare
            # correctly lexicographically ONLY per column type; keep the
            # typed min/max by computing over the original where numeric
            if pa.types.is_string(arr.type):
                mm = pc.min_max(cn)
                mins.append(mm["min"].as_py())
                maxs.append(mm["max"].as_py())
            else:
                base = _cents(arr) if c == "o_totalprice" else pc.cast(arr, pa.int64())
                mm = pc.min_max(base)
                mins.append(str(mm["min"].as_py()) if mm["min"].is_valid else None)
                maxs.append(str(mm["max"].as_py()) if mm["max"].is_valid else None)
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_v": pa.array(mins, pa.string()),
                "max_v": pa.array(maxs, pa.string()),
            }
        )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        canon = canon_columns(t)
        parts = []
        for c in cols:
            u = pc.unique(pc.drop_null(canon[c]))
            parts.append(
                pa.table(
                    {
                        "col": pa.array([c] * len(u), pa.string()),
                        "v": pc.cast(u, pa.string()),
                    }
                )
            )
        return pa.concat_tables(parts)

    stats = pa.concat_tables(
        list(
            ds.map_batches(stats_partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    nd = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["col", "v"])
        .count()
        .groupby("col")
        .count()
        .to_pandas()
    )
    nd_map = dict(zip(nd["col"], nd["count()"]))
    import pandas as pd

    sdf = stats.to_pandas()
    numeric = {"o_orderkey", "o_custkey", "o_totalprice"}
    rows = []
    for c in cols:
        part = sdf[sdf["col"] == c]
        mins = part["min_v"].dropna()
        maxs = part["max_v"].dropna()
        # cross-block merge must honor the column's TYPE: "100" < "99"
        # lexicographically, so numeric partials are parsed before min/max
        if c in numeric:
            mn = str(min(int(v) for v in mins)) if len(mins) else None
            mx = str(max(int(v) for v in maxs)) if len(maxs) else None
        else:
            mn = min(mins) if len(mins) else None
            mx = max(maxs) if len(maxs) else None
        rows.append(
            {
                "col": c,
                "n": int(part["n"].sum()),
                "n_null": int(part["n_null"].sum()),
                "n_distinct": int(nd_map[c]),
                "min_v": mn,
                "max_v": mx,
            }
        )
    df = pd.DataFrame(rows)
    df["n"] = df["n"].astype("int64")
    df["n_null"] = df["n_null"].astype("int64")
    df["n_distinct"] = df["n_distinct"].astype("int64")
    return df[["col", "n", "n_null", "n_distinct", "min_v", "max_v"]]


ORDERS_PROFILE_SQL = """
SELECT 'o_orderkey' AS col, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_orderkey) AS VARCHAR) AS min_v,
       CAST(MAX(o_orderkey) AS VARCHAR) AS max_v FROM orders
UNION ALL
SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
       CAST(COUNT(DISTINCT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT),
       CAST(MIN(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS VARCHAR),
       CAST(MAX(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
       MIN(o_orderstatus), MAX(o_orderstatus) FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       MIN(o_orderpriority), MAX(o_orderpriority) FROM orders
"""


def customer_name_simjoin(sf_dir: str):
    """Similarity SELF-JOIN with deletion-neighborhood blocking (the FastSS
    scheme, Bocek et al. 2007): every pair of customer names within
    Levenshtein distance ≤ 1.  Each name emits itself plus its |name|
    single-deletion variants as bucket keys — two strings within distance 1
    provably share a variant — so candidate generation is a (hash, id,
    name) shuffle of O(rows·len) SHORT keys, never the O(n²) cross join the
    oracle runs; each bucket verifies its tiny candidate set exactly with
    the Myers bit-parallel kernel.  A pair can surface in several buckets:
    a final O(|pairs|) groupby dedups (pair output is result-sized by
    definition)."""
    from ...functions.similarity import myers_distance_many, pack_myers

    ds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name"])

    def variants(t: pa.Table) -> pa.Table:
        import hashlib

        ids, names, hs = [], [], []
        for i, nm in zip(t["c_custkey"].to_pylist(), t["c_name"].to_pylist()):
            s = str(nm or "")
            vs = {s} | {s[:p] + s[p + 1 :] for p in range(len(s))}
            for v in vs:
                ids.append(i)
                names.append(s)
                hs.append(
                    int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "big") >> 1
                )
        return pa.table(
            {
                "bucket": pa.array(hs, pa.int64()),
                "id": pa.array(ids, pa.int64()),
                "name": pa.array(names, pa.string()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id1": pa.array([], pa.int64()),
                "id2": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        ids = group["id"].to_pylist()
        names = group["name"].to_pylist()
        packed = pack_myers(names)
        if packed is None:  # a name exceeds the 64-bit Myers lane
            from ...functions.similarity import levenshtein_many, pack_strings

            mat, lens = pack_strings(names)
        o1, o2, od = [], [], []
        for i in range(len(ids)):
            if packed is not None:
                d = myers_distance_many(names[i], packed)
            else:
                d = levenshtein_many(names[i], mat, lens)
            for j in np.nonzero(d <= 1)[0]:
                if ids[i] < ids[j]:
                    o1.append(ids[i])
                    o2.append(int(ids[j]))
                    od.append(int(d[j]))
        if not o1:
            return empty
        return pa.table(
            {
                "id1": pa.array(o1, pa.int64()),
                "id2": pa.array(o2, pa.int64()),
                "dist": pa.array(od, pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(variants, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pyarrow")
    )
    return (
        pairs.groupby(["id1", "id2"])
        .aggregate(Min("dist", alias_name="dist"))
    )


CUSTOMER_NAME_SIMJOIN_SQL = """
SELECT a.c_custkey AS id1, b.c_custkey AS id2,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 1
"""


def events_burst_dedup(sf_dir: str):
    """Streaming idempotency dedup: flag an event that repeats the same
    (user, type) within 6 h of its predecessor — the at-least-once
    delivery / double-click / retry-storm cleaner every event pipeline
    needs (flag-don't-drop, like every dedup in this engine).  One
    co-partition on user; inside a group the (type, ts, id) sort makes each
    (user, type) run contiguous, so the window test is one vectorized diff
    — never a per-row loop, never a self-join."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )
    WINDOW_US = 21_600_000_000

    def flag(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g,
                sort_keys=[
                    ("event_type", "ascending"),
                    ("ts", "ascending"),
                    ("event_id", "ascending"),
                ],
            )
        )
        us = s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = np.asarray(s["event_type"].to_pylist(), dtype=object)
        dup = np.zeros(len(us), dtype=bool)
        if len(us) > 1:
            dup[1:] = (types[1:] == types[:-1]) & (us[1:] - us[:-1] <= WINDOW_US)
        return pa.Table.from_arrays(
            [s["event_id"], pa.array(dup, pa.bool_())],
            names=["event_id", "is_burst"],
        )

    return ds.groupby("user_id").map_groups(flag, batch_format="pyarrow")


EVENTS_BURST_DEDUP_SQL = """
SELECT event_id,
       COALESCE(epoch_us(ts) - lag(epoch_us(ts))
                  OVER (PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) <= 21600000000,
                FALSE) AS is_burst
FROM events
"""


def embeddings_quantize_int8(sf_dir: str):
    """Symmetric int8 vector QUANTIZATION (the storage/serving compression
    step of every embedding index): per-vector scale = max|x|, components
    mapped to round(x·127/scale).  Pure per-row numpy — zero shuffle, and
    the float64 op order (widen → ×127 → ÷scale → floor(+0.5)) is written
    identically in the oracle so both engines walk the same IEEE path.
    Output is unnested (vec_id, dim, qval, scale_ppm) — integer-exact."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def quant(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "qval": pa.array([], pa.int64()),
                "scale_ppm": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        vecs = _vecs(t, "embedding")
        n, d = vecs.shape
        mx = np.abs(vecs).max(axis=1)
        safe = np.where(mx == 0.0, 1.0, mx)
        q = np.floor(vecs * 127.0 / safe[:, None] + 0.5).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
                "qval": pa.array(q.ravel()),
                "scale_ppm": pa.array(
                    np.repeat(np.floor(mx * 1_000_000 + 0.5).astype(np.int64), d)
                ),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


EMBEDDINGS_QUANTIZE_INT8_SQL = """
WITH ex AS (
  SELECT vec_id,
         unnest(embedding) AS v,
         unnest(range(len(embedding))) AS dim,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
  FROM embeddings)
SELECT vec_id, CAST(dim AS BIGINT) AS dim,
       CAST(FLOOR(CAST(v AS DOUBLE) * 127.0
                  / (CASE WHEN mx = 0 THEN 1.0 ELSE mx END) + 0.5) AS BIGINT)
           AS qval,
       CAST(FLOOR(mx * 1000000 + 0.5) AS BIGINT) AS scale_ppm
FROM ex
"""


def user_order_event_cogroup(sf_dir: str):
    """The generic COGROUP primitive (stages/cogroup.py) demonstrated
    oracle-checkably: per key, event count/value-cents from the events side
    and order count/price-cents from the orders side, INCLUDING keys
    present on only one side (zeros for the absent side) — the per-key
    both-sides shape that join+aggregate pipelines hand-fuse (fuzzy award
    J4, CDC diff); here it's one reusable operator.  One union + one
    groupby(key) shuffle."""
    from ...stages.cogroup import cogroup

    events = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "value"]
    ).map_batches(
        lambda t: pa.table({"k": t["user_id"], "cents": _cents(t["value"])}),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table({"k": t["o_custkey"], "cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow",
    )
    out_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("n_events", pa.int64()),
            ("event_cents", pa.int64()),
            ("n_orders", pa.int64()),
            ("order_cents", pa.int64()),
        ]
    )

    def stats(key, left: pa.Table, right: pa.Table) -> pa.Table:
        le = pc.sum(left["cents"]).as_py() or 0
        ro = pc.sum(right["cents"]).as_py() or 0
        return pa.table(
            {
                "key": pa.array([key.as_py()], pa.int64()),
                "n_events": pa.array([left.num_rows], pa.int64()),
                "event_cents": pa.array([le], pa.int64()),
                "n_orders": pa.array([right.num_rows], pa.int64()),
                "order_cents": pa.array([ro], pa.int64()),
            }
        )

    return cogroup(
        events,
        orders,
        key="k",
        left_cols=["cents"],
        right_cols=["cents"],
        fn=stats,
        out_schema=out_schema,
    )


USER_ORDER_EVENT_COGROUP_SQL = """
WITH e AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events,
                  CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT)
                      AS event_cents
           FROM events GROUP BY 1),
o AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS order_cents
      FROM orders GROUP BY 1)
SELECT COALESCE(e.k, o.k) AS key,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(event_cents, 0) AS event_cents,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(order_cents, 0) AS order_cents
FROM e FULL OUTER JOIN o ON e.k = o.k
"""


def lineitem_group_moments(sf_dir: str):
    """Per-GROUP regression sufficient statistics (the grouped form of
    `lineitem_moment_stats`): per return flag, n, Σq, Σp, Σq·p, Σq² in
    exact integers (quantity unit-scaled, price in cents) — enough for a
    per-group least-squares slope/intercept or covariance without a second
    pass.  Block-local int64 partials keyed by flag make the shuffle
    O(|flags|·blocks).  Overflow bound: Σq·p per flag ≤ rows·50·10⁷ —
    int64-safe to ~2·10¹⁰ rows per flag; beyond that, re-scale or widen to
    per-bucket partials."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(pc.floor(pc.add(pc.multiply(pc.cast(t["l_quantity"], pa.float64()), 1.0), 0.5)), pa.int64())
        p = _cents(t["l_extendedprice"])
        base = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "_n": pa.array(np.ones(t.num_rows, np.int64)),
                "_sq": q,
                "_sp": p,
                "_sqp": pc.multiply(q, p),
                "_sq2": pc.multiply(q, q),
            }
        )
        g = base.group_by("l_returnflag").aggregate(
            [("_n", "sum"), ("_sq", "sum"), ("_sp", "sum"), ("_sqp", "sum"), ("_sq2", "sum")]
        )
        return g.rename_columns(["l_returnflag", "_n", "_sq", "_sp", "_sqp", "_sq2"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("_n", alias_name="n"),
            Sum("_sq", alias_name="sum_qty"),
            Sum("_sp", alias_name="sum_price_cents"),
            Sum("_sqp", alias_name="sum_qty_price"),
            Sum("_sq2", alias_name="sum_qty_sq"),
        )
    )


def docs_validate_constraints(sf_dir: str):
    """Declarative data-contract validation (stages/validate.py — the
    deequ/Great-Expectations shape): three row-local rules checked in one
    vectorized pass plus a corpus-wide key-uniqueness rule via the dedup
    partial-count layout.  `chars_match_text` passes everywhere and
    `unique_doc_id` has no dups in this corpus — a contract that can only
    fire is a contract nobody trusts; the zero-violation rules prove the
    clean path too (pytest plants real violations for both)."""
    from ...stages.validate import validate_constraints

    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "lang", "text", "n_chars"]
    )
    rules = {
        "min_length": lambda t: pc.greater_equal(t["n_chars"], 120),
        "known_lang": lambda t: pc.is_in(
            t["lang"], value_set=pa.array(["en", "de", "fr"])
        ),
        "chars_match_text": lambda t: pc.equal(
            t["n_chars"], pc.cast(pc.utf8_length(t["text"]), pa.int64())
        ),
    }
    return validate_constraints(ds, key_col="doc_id", rules=rules, unique_key=True)


DOCS_VALIDATE_CONSTRAINTS_SQL = """
SELECT doc_id, 'min_length' AS rule FROM documents WHERE NOT (n_chars >= 120)
UNION ALL
SELECT doc_id, 'known_lang' FROM documents WHERE lang NOT IN ('en','de','fr')
UNION ALL
SELECT doc_id, 'chars_match_text' FROM documents WHERE n_chars <> length(text)
UNION ALL
SELECT doc_id, 'unique_doc_id'
FROM (SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY doc_id) AS rn
      FROM documents)
WHERE rn > 1
"""


def docs_compression_ratio(sf_dir: str):
    """Gopher-style COMPRESSION-RATIO quality signal: zlib level-6 bytes
    over raw bytes in exact ppm — highly repetitive (template/spam) text
    compresses far below prose, making this the cheapest content-diversity
    gate there is.  Block-local (the compressor is the kernel, like the
    extract stage), zero shuffle.  Rows-only: DuckDB has no zlib — the
    pytest recomputes ratios directly and pins the discrimination property
    (repeated-token text ≪ diverse text)."""
    import zlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def ratio(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ppm = []
        for s in texts:
            raw = (s or "").encode()
            ppm.append(
                len(zlib.compress(raw, 6)) * 1_000_000 // len(raw) if raw else 0
            )
        arr = pa.array(ppm, pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "comp_ppm": arr,
                "low_diversity": pc.less(arr, 100_000),
            }
        )

    return ds.map_batches(ratio, batch_format="pyarrow")


LINEITEM_GROUP_MOMENTS_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_cents,
       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                * CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty_price,
       CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty_sq
FROM lineitem GROUP BY l_returnflag
"""


def orders_cube_revenue(sf_dir: str):
    """GROUP BY CUBE over (status, priority) — all four grouping sets from
    one pass (≙ the reference dashboard's status×priority matrix,
    server.js:244-267, generalized).  Same scale shape as
    ``orders_rollup_revenue``: block-local cents partials merged by ONE
    small groupby on the finest (status, prio) key; every super-level is an
    exact int64 re-summation over that |statuses|×|priorities| table —
    O(groups) driver work, never a second scan.  Sentinel 'ALL' keys and
    the GROUPING() bitmask (0 finest, 1 prio-rolled, 2 status-rolled,
    3 grand) match the oracle exactly."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "status": t["o_orderstatus"],
                "prio": t["o_orderpriority"],
                "total_c": _cents(t["o_totalprice"]),
            }
        )

    finest = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["status", "prio"])
        .aggregate(Sum("total_c", alias_name="sum_total_cents"), Count(alias_name="n"))
        .to_pandas()  # |statuses|×|priorities| rows — the small-result exception
    )
    import pandas as pd

    finest["lvl"] = np.int64(0)
    by_status = (
        finest.groupby("status", as_index=False)[["sum_total_cents", "n"]]
        .sum()
        .assign(prio="ALL", lvl=np.int64(1))
    )
    by_prio = (
        finest.groupby("prio", as_index=False)[["sum_total_cents", "n"]]
        .sum()
        .assign(status="ALL", lvl=np.int64(2))
    )
    grand = pd.DataFrame(
        {
            "status": ["ALL"],
            "prio": ["ALL"],
            "sum_total_cents": [finest["sum_total_cents"].sum()],
            "n": [finest["n"].sum()],
            "lvl": [np.int64(3)],
        }
    )
    cols = ["status", "prio", "sum_total_cents", "n", "lvl"]
    out = pd.concat(
        [finest[cols], by_status[cols], by_prio[cols], grand[cols]], ignore_index=True
    )
    for c in ("sum_total_cents", "n", "lvl"):
        out[c] = out[c].astype("int64")
    return out


ORDERS_CUBE_REVENUE_SQL = """
WITH f AS (
  SELECT o_orderstatus AS status, o_orderpriority AS prio,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_c
  FROM orders)
SELECT COALESCE(status, 'ALL') AS status, COALESCE(prio, 'ALL') AS prio,
       CAST(SUM(total_c) AS BIGINT) AS sum_total_cents,
       COUNT(*) AS n,
       CAST(GROUPING(status) * 2 + GROUPING(prio) AS BIGINT) AS lvl
FROM f GROUP BY CUBE (status, prio)
"""


def events_rolling_sum5(sf_dir: str):
    """Moving-window aggregate — SUM OVER (... ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW) per user: the trailing-feature shape (last-5-events spend)
    every event pipeline computes.  One groupby(user) co-partition; inside a
    group the window is cumsum minus its 5-lagged self — O(n) and exact in
    integer cents (completing the window family: cumsum, lag, rolling)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def roll(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        cents = np.floor(
            s["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        cs = np.cumsum(cents)
        out = cs.copy()
        out[5:] = cs[5:] - cs[:-5]
        return pa.table(
            {
                "event_id": s["event_id"],
                "user_id": s["user_id"],
                "win5_cents": pa.array(out, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(roll, batch_format="pyarrow")


EVENTS_ROLLING_SUM5_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS win5_cents
FROM events
"""


def events_scd2_intervals(sf_dir: str):
    """SCD Type-2 interval construction — compress each user's event-type
    stream into change rows with [valid_from, valid_to) validity (the
    slowly-changing-dimension build every warehouse runs; valid_to of the
    current state is NULL).  Co-partition by user + per-group sort, then a
    vectorized neighbor-compare picks change points and a shift closes each
    interval with the next one's start.  ``event_id`` (the change-anchoring
    event) rides along so rows are unique and the closing order is
    deterministic even when two changes share a timestamp."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    _scd_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("valid_from_us", pa.int64()),
            ("valid_to_us", pa.int64()),
        ]
    )

    def scd(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _scd_schema.empty_table()
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        types = np.asarray(s["event_type"].to_pylist(), dtype=object)
        change = np.ones(len(types), dtype=bool)
        if len(types) > 1:
            change[1:] = types[1:] != types[:-1]
        ts_us = s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eids = s["event_id"].to_numpy(zero_copy_only=False)
        starts = ts_us[change]
        valid_to = [int(x) for x in starts[1:]] + [None]
        uid = s["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(int(change.sum()), uid, dtype=np.int64), pa.int64()
                ),
                "event_id": pa.array(eids[change], pa.int64()),
                "event_type": pa.array(list(types[change]), pa.string()),
                "valid_from_us": pa.array(starts, pa.int64()),
                "valid_to_us": pa.array(valid_to, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(scd, batch_format="pyarrow")


EVENTS_SCD2_INTERVALS_SQL = """
WITH s AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
c AS (
  SELECT user_id, event_id, event_type, ts_us AS valid_from_us
  FROM s WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_id, event_type, valid_from_us,
       lead(valid_from_us)
         OVER (PARTITION BY user_id ORDER BY valid_from_us, event_id)
         AS valid_to_us
FROM c
"""


def docs_simjoin_jaccard(sf_dir: str):
    """Exact set-similarity self-join: every document pair with token-set
    Jaccard >= 0.95 (near-identical template detection), found by prefix
    filtering under a global rarity order (AllPairs/PPJoin shape — see
    ``stages/ssjoin.py`` for the 100 TB scale notes).  Unlike the LSH
    near-dup family this is EXACT — completeness is guaranteed by the
    prefix-filter theorem, so the O(n²) DuckDB cross-join oracle must match
    pair-for-pair; the integer (inter_n, union_n) output makes the
    threshold test engine-independent.  tau = 19/20: the synthetic corpus
    is template-heavy (7–31-token sets from a small vocabulary), so lower
    bars match a third of all pairs — the high bar keeps the result the
    "same template, ≤1 token apart" set."""
    from ...stages.ssjoin import jaccard_self_join

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return jaccard_self_join(ds, tau_num=19, tau_den=20)


DOCS_SIMJOIN_JACCARD_SQL = """
WITH t AS (
  SELECT doc_id,
         list_distinct(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS toks
  FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter_n,
       CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
            AS BIGINT) AS union_n
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.toks, b.toks)) > 0
  AND 20 * len(list_intersect(a.toks, b.toks))
      >= 19 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
"""


def events_graph_components(sf_dir: str):
    """Generic connected components, ORACLE-checked — the entry that
    upgrades the distributed min-label-propagation machinery (shared with
    ``neardup_clusters``) from rows-only to value-verified.  The graph is
    derived deterministically from events (md5-hashed ids onto 397 nodes;
    two-level forest edges u→u%97→%13 — 13 irregular components, diameter
    ~3 so propagation converges in 3 rounds); DuckDB recomputes the same
    components via a recursive transitive-closure CTE.  Edges are
    block-local distinct before the broadcast (the documented O(|edges|)
    bound of stages/graph.py)."""
    from ...stages.graph import connected_components

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        import hashlib

        us = sorted(
            {
                int(hashlib.md5(str(e).encode()).hexdigest()[:8], 16) % 397
                for e in t["event_id"].to_pylist()
            }
        )
        ea: list[int] = []
        eb: list[int] = []
        for u in us:
            m = u % 97
            if u != m:
                ea.append(u)
                eb.append(m)
            r = m % 13
            if m != r:
                ea.append(m)
                eb.append(r)
        tb = pa.table(
            {"src": pa.array(ea, pa.int64()), "dst": pa.array(eb, pa.int64())}
        )
        return tb.group_by(["src", "dst"]).aggregate([])

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    nodes = edges.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                )
            }
        ),
        batch_format="pyarrow",
    )
    return connected_components(nodes, edges, max_rounds=8)


EVENTS_GRAPH_COMPONENTS_SQL = """
WITH RECURSIVE u AS (
  SELECT DISTINCT
    CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT)
         % 397 AS BIGINT) AS u
  FROM events),
edges AS (
  SELECT u, u % 97 AS v FROM u WHERE u <> u % 97
  UNION
  SELECT u % 97, (u % 97) % 13 FROM u WHERE u % 97 <> (u % 97) % 13),
nodes AS (
  SELECT DISTINCT n FROM (SELECT u AS n FROM edges UNION SELECT v FROM edges)),
sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
reach AS (
  SELECT n AS node, n AS r FROM nodes
  UNION
  SELECT re.node, s.v AS r FROM reach re JOIN sym s ON re.r = s.u)
SELECT node, CAST(MIN(r) AS BIGINT) AS component FROM reach GROUP BY node
"""


def orders_price_band_join(sf_dir: str):
    """Non-equi BAND join (dimension banding): map every order to a price
    tier by range lookup — a join shape (`ON c >= lo AND c < hi`) Ray Data
    has no native operator for.  The tier table is tiny and static, so the
    right design is broadcast + vectorized ``np.searchsorted`` against the
    sorted boundaries inside ``map_batches``: zero shuffle, O(log k) per
    row, streaming-safe at any corpus size (the same pattern as the
    broadcast dim joins in J7)."""
    bounds = np.array(
        [0, 5_000_000, 10_000_000, 20_000_000, 40_000_000], dtype=np.int64
    )
    names = ["T0", "T1", "T2", "T3", "T4"]
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def band(t: pa.Table) -> pa.Table:
        c = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        tier_idx = np.searchsorted(bounds, c, side="right") - 1
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "price_cents": pa.array(c, pa.int64()),
                "tier": pa.array([names[i] for i in tier_idx], pa.string()),
            }
        )

    return ds.map_batches(band, batch_format="pyarrow")


ORDERS_PRICE_BAND_JOIN_SQL = """
WITH tiers(tier, lo, hi) AS (VALUES
  ('T0', 0,        5000000),
  ('T1', 5000000,  10000000),
  ('T2', 10000000, 20000000),
  ('T3', 20000000, 40000000),
  ('T4', 40000000, 4611686018427387904)),
o AS (SELECT o_orderkey,
             CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
      FROM orders)
SELECT o.o_orderkey, o.price_cents, t.tier
FROM o JOIN tiers t ON o.price_cents >= t.lo AND o.price_cents < t.hi
"""


def docs_lang_top_terms(sf_dir: str):
    """Per-GROUP top terms (per-language vocabulary heads) — the two-level
    combiner shape: block-local (lang, term) counts shrink the first
    shuffle to O(langs·block vocab); the merged table is O(langs·vocab)
    rows, so the per-lang top-5 runs over an already-tiny aggregate (one
    more groupby, deterministic (n DESC, term) order with a rank column)."""
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
        g = tb.group_by(["lang", "term"]).aggregate([("term", "count")])
        return g.rename_columns(["lang", "term", "n"])

    merged = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("n", "descending"), ("term", "ascending")]
            )
        ).slice(0, 5)
        return s.append_column(
            "rn", pa.array(np.arange(1, s.num_rows + 1), pa.int64())
        )

    return merged.groupby("lang").map_groups(topk, batch_format="pyarrow")


DOCS_LANG_TOP_TERMS_SQL = """
WITH toks AS (
  SELECT lang,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
tc AS (
  SELECT lang, term, COUNT(*) AS n FROM toks WHERE term <> ''
  GROUP BY lang, term),
r AS (
  SELECT lang, term, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rn
  FROM tc)
SELECT lang, term, CAST(n AS BIGINT) AS n, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 5
"""


def orders_price_winsorized(sf_dir: str):
    """Quantile winsorization (robust feature clipping): clamp price cents
    to the exact [p05, p95] — outlier handling every feature pipeline runs
    before normalization.  The two boundaries come from the exact
    distributed quantile machinery (histogram-partition + refinement, no
    global sort — stages/quantiles.py) and are broadcast as two scalars;
    the clip itself is one vectorized pass, zero shuffle."""
    from ...stages.quantiles import exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "cents": _cents(t["o_totalprice"])}
        )

    cds = ds.map_batches(prep, batch_format="pyarrow")
    qt = exact_quantiles(cds, "cents", [0.05, 0.95])
    lo, hi = (int(v) for v in qt["value"].to_pylist())

    def clip(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "price_cents": t["cents"],
                "winsorized_cents": pa.array(np.clip(c, lo, hi), pa.int64()),
            }
        )

    return cds.map_batches(clip, batch_format="pyarrow")


ORDERS_PRICE_WINSORIZED_SQL = """
WITH c AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
  FROM orders),
b AS (
  SELECT quantile_disc(price_cents, 0.05) AS lo,
         quantile_disc(price_cents, 0.95) AS hi
  FROM c)
SELECT c.o_orderkey, c.price_cents,
       CAST(LEAST(GREATEST(c.price_cents, b.lo), b.hi) AS BIGINT)
         AS winsorized_cents
FROM c, b
"""


def orders_agg_ivm(sf_dir: str):
    """Incremental view maintenance: a standing aggregate (orders before a
    cutoff date) is updated with a DELTA batch (orders on/after it) by
    merging int64 partials — never recomputing from the full table.  Both
    sides are predicate-pushdown reads; the merge is an O(groups) re-sum of
    the two aggregate tables (the IVM contract: agg(old ∪ delta) =
    merge(agg(old), agg(delta)), which holds for the sum/count partials all
    this repo's aggregates use).  The oracle recomputes from scratch — the
    check IS the maintenance invariant."""
    import pandas as pd

    cutoff = np.datetime64("1996-01-01", "us")

    def agg_side(flt) -> "pd.DataFrame":
        ds = rd.read_parquet(
            _t(sf_dir, "orders"),
            columns=["o_orderstatus", "o_totalprice", "o_orderdate"],
            filter=flt,
        )

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderstatus": t["o_orderstatus"],
                    "total_c": _cents(t["o_totalprice"]),
                }
            )

        return (
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby("o_orderstatus")
            .aggregate(Sum("total_c", alias_name="sum_total_cents"), Count(alias_name="n"))
            .to_pandas()  # O(statuses) — the small-result exception
        )

    standing = agg_side(pc.field("o_orderdate") < cutoff)
    delta = agg_side(pc.field("o_orderdate") >= cutoff)
    merged = (
        pd.concat([standing, delta], ignore_index=True)
        .groupby("o_orderstatus", as_index=False)[["sum_total_cents", "n"]]
        .sum()
    )
    for c in ("sum_total_cents", "n"):
        merged[c] = merged[c].astype("int64")
    return merged


ORDERS_AGG_IVM_SQL = """
SELECT o_orderstatus,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_total_cents,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
"""


def docs_term_counts_cms(sf_dir: str):
    """Count-Min point-frequency estimates for a fixed probe vocabulary —
    the fourth mergeable sketch (HLL distinct / MG hitters / KMV quantiles
    / CMS frequencies).  Add-merge is associative and layout-independent,
    so the merged sketch is BIT-identical at any parallelism (pytest pins
    this plus the never-undercount bound vs exact counts); rows-only —
    the estimate is approximate by design."""
    from ...stages.sketch_stats import approx_term_counts_cms

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])
    probes = ["the", "invoice", "total", "amount", "data", "nonexistentterm"]
    return approx_term_counts_cms(ds, probes)


def docs_lang_heavy_hitters(sf_dir: str):
    """Per-GROUP Misra-Gries heavy hitters (top terms per language with a
    FIXED counter budget) — the sketch-path counterpart of the exact
    ``docs_lang_top_terms``: when the per-group vocabulary won't fit, MG
    keeps k counters per key and still guarantees every term above
    n_g/(k+1) surfaces.  Block count pinned for run-to-run determinism
    (MG counts are boundary-dependent); rows-only with the guarantee
    asserted in pytest."""
    from ...stages.sketch_stats import grouped_heavy_hitters

    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["lang", "text"], override_num_blocks=8
    )
    return grouped_heavy_hitters(ds, key_col="lang", k=10)


def lineitem_star_denorm(sf_dir: str):
    """Star-schema denormalization — the flatten-before-training-export
    step: lineitem (fact) widened with orders, customer and nation
    attributes in ONE pass over the fact table.  Join strategy follows the
    size hierarchy: fact↔fact (lineitem–orders) is the proven
    ``Dataset.join`` hash shuffle at 8 partitions (BASELINE.md sweep);
    the two DIMENSION hops (customer, nation) are broadcast maps applied
    via vectorized ``index_in``/``take`` probes inside the SAME map pass —
    dims ship once per node, the fact table never reshuffles for them.
    Pruned to the filtered year to keep the demo driver-budget-friendly."""
    lo = np.datetime64("1995-01-01", "us")
    hi = np.datetime64("1996-01-01", "us")
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    )
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderpriority"]
    )

    def prep_li(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int64()),
                "price_cents": _cents(t["l_extendedprice"]),
            }
        )

    fact = li.map_batches(prep_li, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    cust = pa.concat_tables(
        [
            b
            for b in rd.read_parquet(
                _t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_nationkey"]
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    nation = pa.concat_tables(
        [
            b
            for b in rd.read_parquet(
                _t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    from ...stages.broadcast import guard_broadcast_bytes, table_nbytes

    guard_broadcast_bytes(
        table_nbytes(cust) + table_nbytes(nation),
        label="lineitem_star_denorm dimension hops",
        alternative="promote the oversized dim hop to a Dataset.join hash "
        "shuffle (the lineitem-orders leg of this same plan)",
    )
    cust_ref = ray.put(cust)
    nation_ref = ray.put(nation)

    def widen(t: pa.Table) -> pa.Table:
        c = ray.get(cust_ref)
        n = ray.get(nation_ref)
        ci = pc.index_in(t["o_custkey"], value_set=c["c_custkey"].combine_chunks())
        c_name = pc.take(c["c_name"].combine_chunks(), ci)
        c_nat = pc.take(c["c_nationkey"].combine_chunks(), ci)
        ni = pc.index_in(c_nat, value_set=n["n_nationkey"].combine_chunks())
        n_name = pc.take(n["n_name"].combine_chunks(), ni)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "price_cents": t["price_cents"],
                "o_orderpriority": t["o_orderpriority"],
                "c_name": c_name,
                "n_name": n_name,
            }
        )

    return fact.map_batches(widen, batch_format="pyarrow")


LINEITEM_STAR_DENORM_SQL = """
SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
       CAST(FLOOR(l.l_extendedprice*100 + 0.5) AS BIGINT) AS price_cents,
       o.o_orderpriority, c.c_name, n.n_name
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate < TIMESTAMP '1996-01-01'
"""


def docs_source_label_encode(sf_dir: str):
    """Label encoding (dictionary/categorical compaction): map each source
    string to a dense integer code under the deterministic sorted-vocabulary
    order — the preprocessing step every ML featurizer runs.  Two-phase
    broadcast shape: distinct values via block partials + one tiny driver
    sort (O(cardinality)), then the code map rides ``ray.put`` and the
    encode pass is a vectorized ``index_in`` — zero shuffle over the data."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source"])

    def distinct_part(t: pa.Table) -> pa.Table:
        return pa.table({"source": t["source"].unique()})

    vals = set()
    for b in (
        ds.map_batches(distinct_part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ):
        vals.update(b["source"].to_pylist())
    vocab = pa.array(sorted(vals), pa.string())
    vocab_ref = ray.put(vocab)

    def encode(t: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "source_code": pc.cast(pc.index_in(t["source"], value_set=v), pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


DOCS_SOURCE_LABEL_ENCODE_SQL = """
WITH v AS (
  SELECT source AS s,
         CAST(row_number() OVER (ORDER BY source) - 1 AS BIGINT) AS code
  FROM (SELECT DISTINCT source FROM documents))
SELECT d.doc_id, d.source, v.code AS source_code
FROM documents d JOIN v ON d.source = v.s
"""


def docs_feature_hashing(sf_dir: str):
    """The hashing trick (Weinberger et al. 2009): featurize each document
    as sparse (feature_index, count) pairs with feature_index = stable hash
    of the token mod D — fixed dimensionality with NO vocabulary pass, the
    feature map every streaming featurizer uses when the vocab won't fit.
    Block-local: tokenize, hash, aggregate (doc, index) counts inside the
    batch — zero shuffle; D=64 keeps the oracle's md5 arithmetic cheap."""
    D = 64
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def feats(t: pa.Table) -> pa.Table:
        import hashlib

        toks_col = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).to_pylist()
        ids = t["doc_id"].to_pylist()
        o_id: list[int] = []
        o_ix: list[int] = []
        o_n: list[int] = []
        cache: dict[str, int] = {}
        for i, lst in zip(ids, toks_col):
            counts: dict[int, int] = {}
            for w in lst:
                if not w:
                    continue
                ix = cache.get(w)
                if ix is None:
                    ix = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % D
                    cache[w] = ix
                counts[ix] = counts.get(ix, 0) + 1
            for ix in sorted(counts):
                o_id.append(i)
                o_ix.append(ix)
                o_n.append(counts[ix])
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "feat_ix": pa.array(o_ix, pa.int64()),
                "n": pa.array(o_n, pa.int64()),
            }
        )

    return ds.map_batches(feats, batch_format="pyarrow")


DOCS_FEATURE_HASHING_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents)
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5(term), 1, 8)) AS UBIGINT) % 64 AS BIGINT)
         AS feat_ix,
       COUNT(*) AS n
FROM toks WHERE term <> ''
GROUP BY doc_id, feat_ix
"""


def events_hourly_distinct_users(sf_dir: str):
    """Windowed COUNT(DISTINCT): distinct active users per tumbling hour —
    the window × distinct composition (dashboards, rate limiting).  Block-
    local distinct (hour, user) pairs are the combiner (the shuffle carries
    O(hours·users) pairs, never event rows), then one groupby counts per
    hour — the same two-level shape as ``events_user_type_diversity``
    rotated onto a time key."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        hour = pc.multiply(
            pc.divide(pc.cast(t["ts"], pa.int64()), 3_600_000_000), 3_600_000_000
        )
        return (
            pa.table({"hour_us": hour, "user_id": t["user_id"]})
            .group_by(["hour_us", "user_id"])
            .aggregate([])
        )

    def count_users(g: pa.Table) -> pa.Table:
        uniq = len(set(g["user_id"].to_pylist()))
        return pa.table(
            {
                "hour_us": g["hour_us"].slice(0, 1),
                "n_users": pa.array([uniq], pa.int64()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("hour_us")
        .map_groups(count_users, batch_format="pyarrow")
    )


EVENTS_HOURLY_DISTINCT_USERS_SQL = """
SELECT CAST(epoch_us(ts) // 3600000000 * 3600000000 AS BIGINT) AS hour_us,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY hour_us
"""


def events_user_cohorts(sf_dir: str):
    """Cohort retention matrix: users bucketed by first-seen day, counted
    per (cohort_day, activity_day) — the retention triangle every product
    pipeline computes.  Join-free two-shuffle design: block-local distinct
    (user, day) pairs (the combiner — the first shuffle carries at most
    |users|·|distinct days| pairs per block, never event rows), then ONE
    ``groupby(user)`` where each user's group computes its own first-seen
    min and emits (cohort_day, activity_day) rows — a user's group is
    bounded by its distinct DAYS, not its events, so no hot-user blowup —
    and a final count over the O(days²/2) triangle.  Day keys in integer
    epoch-days so both engines bucket identically."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def day_pairs(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "day": pc.divide(pc.cast(t["ts"], pa.int64()), 86_400_000_000),
                }
            )
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    def cohortize(g: pa.Table) -> pa.Table:
        d = np.unique(g["day"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "cohort_day": pa.array(np.full(len(d), d.min()), pa.int64()),
                "activity_day": pa.array(d, pa.int64()),
            }
        )

    triples = (
        ds.map_batches(day_pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(cohortize, batch_format="pyarrow")
    )
    return (
        triples.groupby(["cohort_day", "activity_day"])
        .aggregate(Count(alias_name="n_users"))
    )


EVENTS_USER_COHORTS_SQL = """
WITH d AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events),
f AS (
  SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
SELECT f.cohort_day, d.day AS activity_day,
       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
FROM d JOIN f ON d.user_id = f.user_id
GROUP BY f.cohort_day, d.day
"""


def orders_range_layout_query(sf_dir: str):
    """Range-partitioned storage + file-pruned range query
    (stages/bucketing.py:write_range_partitioned/read_range_pruned — the
    layout complement of hash buckets: neighbors co-locate, so a price-band
    predicate opens only the partitions whose span intersects the band,
    computed driver-side with zero I/O).  Layout written once per source
    fingerprint; the read prunes to the [$60k, $200k) band's partitions,
    applies the EXACT row predicate (pruning is file-level, correctness
    row-level), and aggregates per status.  Oracle: plain WHERE + GROUP BY
    over the original table — parity proves no rows were lost or duplicated
    by the layout."""
    import os

    from ...functions.hashing import stable_hash64
    from ...stages.bucketing import read_range_pruned, write_range_partitioned

    # quartile-ish price boundaries in cents (the partition contract)
    bounds = [6_000_000.0, 12_000_000.0, 20_000_000.0, 30_000_000.0]
    st = os.stat(_t(sf_dir, "orders"))
    fp = stable_hash64(f"{st.st_size}:{st.st_mtime_ns}|{sf_dir}|range4")
    root = f"/tmp/iocr_rangeparts_{fp:016x}"
    if not os.path.exists(os.path.join(root, "_DONE")):
        src = rd.read_parquet(
            _t(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
        )

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_orderstatus": t["o_orderstatus"],
                    "price_cents": _cents(t["o_totalprice"]),
                }
            )

        write_range_partitioned(
            src.map_batches(prep, batch_format="pyarrow"),
            key_col="price_cents",
            boundaries=bounds,
            out_dir=os.path.join(root, "orders"),
        )
        open(os.path.join(root, "_DONE"), "w").write("ok")

    lo, hi = 6_000_000.0, 20_000_000.0  # [$60k, $200k)
    pruned = read_range_pruned(
        os.path.join(root, "orders"), boundaries=bounds, lo=lo, hi=hi
    )

    def agg(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["price_cents"], int(lo)),
            pc.less(t["price_cents"], int(hi)),
        )
        return t.filter(keep)

    return (
        pruned.map_batches(agg, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Count(alias_name="n"), Sum("price_cents", alias_name="sum_price_cents"))
    )


ORDERS_RANGE_LAYOUT_QUERY_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_price_cents
FROM orders
WHERE CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) >= 6000000
  AND CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) < 20000000
GROUP BY o_orderstatus
"""


def docs_term_cooccurrence(sf_dir: str):
    """Term co-occurrence counts (market-basket / PMI numerator): for every
    unordered pair of distinct tokens appearing in the same document, the
    number of documents containing both — plus each term's document
    frequency, the exact integer sufficient statistics for PMI/lift
    (the log itself is left to the consumer so the output stays
    engine-exact).  Block-local pair counting is the combiner (the shuffle
    carries O(pair-vocab) rows per block, never documents); top-30 pairs by
    (count DESC, pair ASC) keep the result bounded."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def pair_counts(t: pa.Table) -> pa.Table:
        toks_col = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).to_pylist()
        counts: dict[tuple[str, str], int] = {}
        for lst in toks_col:
            s = sorted({x for x in lst if x})
            for x in range(len(s)):
                for y in range(x + 1, len(s)):
                    k = (s[x], s[y])
                    counts[k] = counts.get(k, 0) + 1
        ks = sorted(counts)
        return pa.table(
            {
                "term_a": pa.array([a for a, _ in ks], pa.string()),
                "term_b": pa.array([b for _, b in ks], pa.string()),
                "n_both": pa.array([counts[k] for k in ks], pa.int64()),
            }
        )

    merged = (
        ds.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n_both", alias_name="n_both"))
    )
    return merged.sort(
        ["n_both", "term_a", "term_b"], descending=[True, False, False]
    ).limit(30)


DOCS_TERM_COOCCURRENCE_SQL = """
WITH t AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')))
           AS term
  FROM documents)
SELECT a.term AS term_a, b.term AS term_b, COUNT(*) AS n_both
FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
GROUP BY a.term, b.term
ORDER BY n_both DESC, term_a, term_b LIMIT 30
"""


def events_triangle_counts(sf_dir: str):
    """Per-node TRIANGLE counts — the third graph op (after PageRank and
    connected components), the clustering-coefficient numerator.  The graph
    is a deterministic triad generator (every 7th event hashes to three
    nodes on a 211-node space and contributes the 3-cycle between them —
    guaranteed triangles plus emergent ones where triads overlap); DuckDB
    recomputes per-node counts with the oriented three-way self-join.
    Edges broadcast once as a sorted-neighbor adjacency; nodes stream
    through a vectorized intersect kernel (stages/graph.py)."""
    from ...stages.graph import triangle_count_per_node

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id"])

    def mk_edges(t: pa.Table) -> pa.Table:
        import hashlib

        def h(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 211

        ea: list[int] = []
        eb: list[int] = []
        for e in t["event_id"].to_pylist():
            if e % 7 != 0:
                continue
            a, b, c = h(str(e)), h(str(e) + "x"), h(str(e) + "y")
            ea.extend([a, b, c])
            eb.extend([b, c, a])
        tb = pa.table(
            {"src": pa.array(ea, pa.int64()), "dst": pa.array(eb, pa.int64())}
        )
        return tb.group_by(["src", "dst"]).aggregate([])

    edges = ds.map_batches(mk_edges, batch_format="pyarrow")
    nodes = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                    ).unique()
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table({"node": t["node"]}), batch_format="pyarrow"
        )
    )
    return triangle_count_per_node(nodes, edges)


EVENTS_TRIANGLE_COUNTS_SQL = """
WITH gen AS (
  SELECT CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
              AS UBIGINT) % 211 AS BIGINT) AS a,
         CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'x'), 1, 8))
              AS UBIGINT) % 211 AS BIGINT) AS b,
         CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'y'), 1, 8))
              AS UBIGINT) % 211 AS BIGINT) AS c
  FROM events WHERE event_id % 7 = 0),
e0 AS (
  SELECT a AS u, b AS v FROM gen UNION
  SELECT b, c FROM gen UNION
  SELECT c, a FROM gen),
edges AS (SELECT u, v FROM e0 WHERE u <> v),
sym AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
tri AS (
  SELECT a.u AS n1, a.v AS n2, b.v AS n3
  FROM sym a
  JOIN sym b ON a.v = b.u
  JOIN sym c ON b.v = c.u AND c.v = a.u
  WHERE a.u < a.v AND a.v < b.v),
members AS (
  SELECT n1 AS n FROM tri UNION ALL
  SELECT n2 FROM tri UNION ALL
  SELECT n3 FROM tri),
nodes AS (SELECT DISTINCT u AS n FROM sym)
SELECT nodes.n AS node,
       CAST(COUNT(members.n) AS BIGINT) AS n_triangles
FROM nodes LEFT JOIN members ON nodes.n = members.n
GROUP BY nodes.n
"""


def events_user_transitions(sf_dir: str):
    """Markov transition-count matrix over each user's time-ordered event
    stream: for every consecutive pair of a user's events, count
    (from_type, to_type) corpus-wide — the sufficient statistics for a
    first-order behavioral model.  Same co-partition + per-group sort shape
    as ``events_time_deltas`` (one shuffle on user_id); each group emits its
    tiny local pair-count table, merged by an O(|types|²) groupby — the
    second shuffle carries at most types² rows per user, never events."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def pairs(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        et = s["event_type"].to_pylist()
        counts: dict[tuple[str, str], int] = {}
        for a, b in zip(et, et[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        ks = sorted(counts)
        return pa.table(
            {
                "from_type": pa.array([a for a, _ in ks], pa.string()),
                "to_type": pa.array([b for _, b in ks], pa.string()),
                "n_trans": pa.array([counts[k] for k in ks], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n_trans", alias_name="n_trans"))
    )


EVENTS_USER_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events)
SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n_trans
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


def lineitem_unpivot_measures(sf_dir: str):
    """UNPIVOT / melt — the wide (quantity, extendedprice, discount)
    columns become long (measure, value) rows.  The reshape itself is a
    pure block-local projection (3× rows out, zero shuffle); the long table
    is immediately re-aggregated per (l_returnflag, measure) by a
    block-local pyarrow combiner, so the one shuffle carries
    O(|flags|×3) rows per block.  Integer cents keep the oracle exact."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for col in ("l_quantity", "l_extendedprice", "l_discount"):
            parts.append(
                pa.table(
                    {
                        "l_returnflag": t["l_returnflag"],
                        "measure": pa.array([col] * t.num_rows, pa.string()),
                        "cents": _cents(t[col]),
                    }
                )
            )
        long = pa.concat_tables(parts)
        g = long.group_by(["l_returnflag", "measure"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(["l_returnflag", "measure", "value_cents", "n_values"])

    return (
        ds.map_batches(melt, batch_format="pyarrow")
        .groupby(["l_returnflag", "measure"])
        .aggregate(
            Sum("value_cents", alias_name="value_cents"),
            Sum("n_values", alias_name="n_values"),
        )
    )


LINEITEM_UNPIVOT_MEASURES_SQL = """
WITH long AS (
  SELECT l_returnflag, measure,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount
        FROM lineitem)
  UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount)))
SELECT l_returnflag, measure,
       CAST(SUM(cents) AS BIGINT) AS value_cents,
       COUNT(*) AS n_values
FROM long GROUP BY l_returnflag, measure
"""


def parts_above_brand_avg(sf_dir: str):
    """Group-relative filter (the correlated-scalar-subquery shape: rows
    priced strictly above their own group's mean).  Two streaming passes:
    (1) per-block (brand, Σcents, n) partials → tiny brand map merged by
    one O(|brands|) groupby, collected and broadcast once via ``ray.put``;
    (2) a block-local vectorized filter evaluating
    ``cents·n_brand > Σcents`` — an integer cross-multiplication, so the
    comparison is exact (a float mean would tie-break differently at the
    ulp).  No shuffle ever touches the fact rows."""
    stats_ds = rd.read_parquet(
        _t(sf_dir, "part"), columns=["p_brand", "p_retailprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"p_brand": t["p_brand"], "cents": _cents(t["p_retailprice"])})
        g = tb.group_by("p_brand").aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["p_brand", "s", "n"])

    rows = (
        stats_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .take_all()
    )
    stats_ref = ray.put({r["p_brand"]: (r["s"], r["n"]) for r in rows})

    ds = rd.read_parquet(
        _t(sf_dir, "part"),
        columns=["p_partkey", "p_name", "p_brand", "p_retailprice"],
    )

    def filt(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        brands = t["p_brand"].to_pylist()
        cents = _cents(t["p_retailprice"]).combine_chunks().to_numpy()
        s = np.array([st[b][0] for b in brands], dtype=np.int64)
        n = np.array([st[b][1] for b in brands], dtype=np.int64)
        kept = t.filter(pa.array(cents * n > s))
        return pa.table(
            {
                "p_partkey": kept["p_partkey"],
                "p_name": kept["p_name"],
                "p_brand": kept["p_brand"],
                "price_cents": _cents(kept["p_retailprice"]),
            }
        )

    return ds.map_batches(filt, batch_format="pyarrow")


PARTS_ABOVE_BRAND_AVG_SQL = """
WITH b AS (
  SELECT p_brand,
         CAST(SUM(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         COUNT(*) AS n
  FROM part GROUP BY p_brand)
SELECT p.p_partkey, p.p_name, p.p_brand,
       CAST(FLOOR(p.p_retailprice*100 + 0.5) AS BIGINT) AS price_cents
FROM part p JOIN b ON p.p_brand = b.p_brand
WHERE CAST(FLOOR(p.p_retailprice*100 + 0.5) AS BIGINT) * b.n > b.s
"""


def _promo_revenue_share_shuffle(sf_dir: str, fact):
    """Oversized-dim fallback for ``promo_revenue_share``: Bloom-prefilter
    the fact side (fixed-size bitset broadcast regardless of dim key count),
    then a hash-shuffle ``Dataset.join`` against the (p_partkey, is_promo)
    dim — no driver materialization of the dim anywhere."""
    from ...stages.dedup import bloom_flag_seen

    dim = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t["p_partkey"],
                "is_promo": pc.equal(t["p_type"], "PROMO"),
            }
        ),
        batch_format="pyarrow",
    )

    def pre(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(t["l_shipdate"]), pa.int64()), 100),
            pc.cast(pc.month(t["l_shipdate"]), pa.int64()),
        )
        return pa.table({"l_partkey": t["l_partkey"], "ym": ym, "rev_c": rev})

    keyed_dim = dim.map_batches(
        lambda t: pa.table({"l_partkey": t["p_partkey"]}), batch_format="pyarrow"
    )
    flagged = bloom_flag_seen(
        fact.map_batches(pre, batch_format="pyarrow"), keyed_dim, key_col="l_partkey"
    )
    survivors = flagged.map_batches(
        lambda t: t.filter(t["maybe_seen"]).drop_columns(["maybe_seen"]),
        batch_format="pyarrow",
    )
    joined = survivors.join(
        dim,
        join_type="inner",
        num_partitions=8,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = t["rev_c"].combine_chunks().to_numpy()
        promo_np = (
            t["is_promo"].combine_chunks().to_numpy(zero_copy_only=False)
        )
        tb = pa.table(
            {
                "ym": t["ym"],
                "promo_cents": pa.array(np.where(promo_np, rev, 0), pa.int64()),
                "total_cents": pa.array(rev, pa.int64()),
            }
        )
        g = tb.group_by("ym").aggregate(
            [("promo_cents", "sum"), ("total_cents", "sum")]
        )
        return g.rename_columns(["ym", "promo_cents", "total_cents"])

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )


def promo_revenue_share(sf_dir: str):
    """Conditional-aggregate ratio (TPC-H Q14 shape): per ship-month, the
    promo-part revenue alongside total revenue — numerator and denominator
    as exact integer cents (the division is the consumer's, so the result
    stays engine-exact).  The part dimension reduces to a broadcast
    promo-key set (``ray.put`` once, ``pc.is_in`` probe per block — no
    shuffle join); rows whose partkey is absent from ``part`` drop, matching
    the oracle's inner join.  Block-local partials keep the one shuffle at
    O(|months|) rows per block.

    Broadcast-size guard (VERDICT r3 #1/#3): the dim's broadcastability is
    decided from parquet METADATA before loading a row; an oversized dim
    reroutes to the Bloom-prefiltered shuffle join
    (``lineitem_bloom_join_revenue`` machinery) instead of materializing on
    the driver.  The dim load itself is pure Arrow — no per-row Python."""
    from ...stages.broadcast import dim_is_broadcastable

    part_path = _t(sf_dir, "part")
    dim_cols = ["p_partkey", "p_type"]

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    if not dim_is_broadcastable(part_path, dim_cols):
        return _promo_revenue_share_shuffle(sf_dir, ds)

    import pyarrow.parquet as pq

    pt = pq.read_table(part_path, columns=dim_cols)
    all_ref = ray.put(pt["p_partkey"].combine_chunks())
    promo_ref = ray.put(
        pt.filter(pc.equal(pt["p_type"], "PROMO"))["p_partkey"].combine_chunks()
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"], value_set=ray.get(all_ref)))
        rev = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        ).combine_chunks().to_numpy()
        promo = pc.is_in(t["l_partkey"], value_set=ray.get(promo_ref))
        promo_np = promo.combine_chunks().to_numpy(zero_copy_only=False)
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(t["l_shipdate"]), pa.int64()), 100),
            pc.cast(pc.month(t["l_shipdate"]), pa.int64()),
        )
        tb = pa.table(
            {
                "ym": ym,
                "promo_cents": pa.array(np.where(promo_np, rev, 0), pa.int64()),
                "total_cents": pa.array(rev, pa.int64()),
            }
        )
        g = tb.group_by("ym").aggregate(
            [("promo_cents", "sum"), ("total_cents", "sum")]
        )
        return g.rename_columns(["ym", "promo_cents", "total_cents"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )


PROMO_REVENUE_SHARE_SQL = """
SELECT CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ym,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                               AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS total_cents
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY ym
"""


def orders_rank_ties_topk(sf_dir: str):
    """Per-group top-k with RANK() tie semantics (ties at the boundary are
    KEPT, so groups may emit more than k rows) — distinct from the
    row_number() shape of ``docs_per_lang_longest``.  Block-local lossless
    prune first: a row with ≥ k strictly-greater prices inside its own
    block already has global rank > k, so each block forwards at most the
    k-th-largest-and-above slice per priority; the one shuffle then carries
    O(k + ties) rows per (block, priority), and the per-group kernel
    computes exact ranks with one searchsorted."""
    K = 5
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def prune(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        )
        pri = np.asarray(tb["o_orderpriority"].to_pylist(), dtype=object)
        cents = tb["price_cents"].combine_chunks().to_numpy()
        mask = np.zeros(len(cents), dtype=bool)
        for p in np.unique(pri):
            m = pri == p
            c = cents[m]
            if len(c) <= K:
                mask[m] = True
            else:
                mask[m] = c >= np.partition(c, -K)[-K]
        return tb.filter(pa.array(mask))

    def rank_filter(g: pa.Table) -> pa.Table:
        c = g["price_cents"].combine_chunks().to_numpy()
        c_asc = np.sort(c)
        rnk = (len(c) - np.searchsorted(c_asc, c, side="right")) + 1
        keep = rnk <= K
        out = g.filter(pa.array(keep))
        return out.append_column("rnk", pa.array(rnk[keep], pa.int64()))

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(rank_filter, batch_format="pyarrow")
    )


ORDERS_RANK_TIES_TOPK_SQL = """
SELECT o_orderpriority, o_orderkey,
       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents,
       CAST(RANK() OVER (PARTITION BY o_orderpriority
                         ORDER BY FLOOR(o_totalprice*100 + 0.5) DESC)
            AS BIGINT) AS rnk
FROM orders
QUALIFY rnk <= 5
"""


def events_dow_hour_profile(sf_dir: str):
    """Day-of-week × hour-of-day activity heatmap (date-part aggregate at a
    granularity the monthly/hourly family doesn't cover).  ISO dow on both
    engines: pyarrow ``day_of_week`` counts 0=Monday, so +1 equals DuckDB's
    ``isodow``.  Block-local partials → one O(168)-row shuffle."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "dow": pc.cast(pc.add(pc.day_of_week(t["ts"]), 1), pa.int64()),
                "hour": pc.cast(pc.hour(t["ts"]), pa.int64()),
                "value_cents": _cents(t["value"]),
                "n_events": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["dow", "hour"]).aggregate(
            [("value_cents", "sum"), ("n_events", "sum")]
        )
        return g.rename_columns(["dow", "hour", "value_cents", "n_events"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "hour"])
        .aggregate(
            Sum("value_cents", alias_name="value_cents"),
            Sum("n_events", alias_name="n_events"),
        )
    )


EVENTS_DOW_HOUR_PROFILE_SQL = """
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       COUNT(*) AS n_events
FROM events GROUP BY dow, hour
"""


def docs_bigram_counts(sf_dir: str):
    """Corpus ADJACENT-bigram counts (the first-order LM-pretraining
    statistic — distinct from ``docs_term_cooccurrence``'s unordered
    doc-level pairs).  Fully vectorized: tokens flatten once per block with
    ``list_flatten``/``list_parent_indices``; adjacency is a numpy shift
    compare on the parent ids, so no Python loop ever touches a token.
    Block-local pair counts are the combiner (shuffle is O(bigram-vocab)
    per block); top-50 by (n DESC, a, b) bounds the result."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).to_numpy(zero_copy_only=False)
        p = parents.filter(keep).to_numpy(zero_copy_only=False)
        if len(f) < 2:
            return pa.table(
                {
                    "term_a": pa.array([], pa.string()),
                    "term_b": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        adj = p[1:] == p[:-1]
        tb = pa.table(
            {
                "term_a": pa.array(f[:-1][adj], pa.string()),
                "term_b": pa.array(f[1:][adj], pa.string()),
                "n": pa.array(np.ones(int(adj.sum()), np.int64)),
            }
        )
        g = tb.group_by(["term_a", "term_b"]).aggregate([("n", "sum")])
        return g.rename_columns(["term_a", "term_b", "n"])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return merged.sort(
        ["n", "term_a", "term_b"], descending=[True, False, False]
    ).limit(50)


DOCS_BIGRAM_COUNTS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
t AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS pos
      FROM d),
b AS (SELECT doc_id, term AS term_a,
             lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS term_b
      FROM t)
SELECT term_a, term_b, COUNT(*) AS n
FROM b WHERE term_b IS NOT NULL
GROUP BY term_a, term_b
ORDER BY n DESC, term_a, term_b LIMIT 50
"""


def events_user_streaks(sf_dir: str):
    """Gaps-and-islands: consecutive runs of the SAME event_type inside each
    user's time-ordered stream (change-point segmentation — distinct from
    the gap-threshold sessionizer).  Per (user, type): the longest run and
    the number of runs.  Co-partition by user + per-group sort; run
    boundaries are one numpy shift compare, run lengths one ``bincount``."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def streaks(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        et = np.asarray(s["event_type"].to_pylist(), dtype=object)
        change = np.ones(len(et), dtype=bool)
        change[1:] = et[1:] != et[:-1]
        run_len = np.bincount(np.cumsum(change) - 1)
        run_type = et[change]
        agg: dict[str, list[int]] = {}
        for ty, ln in zip(run_type, run_len):
            cur = agg.setdefault(ty, [0, 0])
            cur[0] = max(cur[0], int(ln))
            cur[1] += 1
        ks = sorted(agg)
        uid = s["user_id"][0].as_py()
        return pa.table(
            {
                "user_id": pa.array([uid] * len(ks), pa.int64()),
                "event_type": pa.array(ks, pa.string()),
                "max_streak": pa.array([agg[k][0] for k in ks], pa.int64()),
                "n_runs": pa.array([agg[k][1] for k in ks], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(streaks, batch_format="pyarrow")


EVENTS_USER_STREAKS_SQL = """
WITH s AS (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS r1,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS r2
  FROM events),
runs AS (
  SELECT user_id, event_type, r1 - r2 AS grp, COUNT(*) AS n_run
  FROM s GROUP BY user_id, event_type, grp)
SELECT user_id, event_type,
       CAST(MAX(n_run) AS BIGINT) AS max_streak,
       COUNT(*) AS n_runs
FROM runs GROUP BY user_id, event_type
"""


def docs_lang_vocab(sf_dir: str):
    """Per-language vocabulary statistics (the Heaps'-law numbers a corpus
    report leads with): distinct-term count and total token count per lang.
    Block-local (lang, term, n) partials make the shuffle O(vocab) per
    block; the per-lang merge counts distinct terms over the pre-deduped
    partials, so no task ever sees raw tokens twice."""
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
        return g.rename_columns(["lang", "term", "n_tokens"])

    def merge(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": g["lang"].slice(0, 1),
                "n_vocab": pa.array([len(set(g["term"].to_pylist()))], pa.int64()),
                "n_tokens": pa.array(
                    [pc.sum(g["n_tokens"]).as_py()], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(merge, batch_format="pyarrow")
    )


DOCS_LANG_VOCAB_SQL = """
WITH t AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents)
SELECT lang, COUNT(DISTINCT term) AS n_vocab, COUNT(*) AS n_tokens
FROM t GROUP BY lang
"""


def events_user_count_quantiles(sf_dir: str):
    """Skew profile — quantiles of the per-key group-size distribution (the
    number a partitioning decision actually needs: is user_id hashable or
    does a hot key need salting?).  Aggregate-of-aggregate: a distributed
    per-user count feeds the histogram-refine exact-quantile selection
    (stages/quantiles.py) — the counts Dataset is never collected."""
    from ...stages.quantiles import exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    counts = ds.groupby("user_id").aggregate(Count(alias_name="n"))
    return exact_quantiles(counts, "n", [0.0, 0.25, 0.5, 0.75, 1.0])


EVENTS_USER_COUNT_QUANTILES_SQL = """
WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
s AS (SELECT quantile_disc(n, [0.0, 0.25, 0.5, 0.75, 1.0]) AS v FROM c)
SELECT CAST(z[1] AS DOUBLE) AS q, CAST(z[2] AS DOUBLE) AS value
FROM (SELECT unnest(list_zip([0.0, 0.25, 0.5, 0.75, 1.0], v)) AS z FROM s)
"""


def events_trailing_value_sum(sf_dir: str):
    """RANGE-frame windowed measure (``SUM(value) OVER (... RANGE w
    PRECEDING)``): for every event, the same user's total value (integer
    cents) over the trailing 1 h and 6 h — the *sum* companion of
    ``events_multi_window_features`` (stages/asof.py:range_join_multi_sum).
    One co-partition shuffle, one prefix-sum per user; each horizon is two
    searchsorted probes, never another join."""
    from ...stages.asof import range_join_multi_sum

    left = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    right = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "value"]
    ).map_batches(
        lambda t: pa.table(
            {"user_id": t["user_id"], "ts": t["ts"], "v_c": _cents(t["value"])}
        ),
        batch_format="pyarrow",
    )
    h = 3_600_000_000  # one hour in µs
    return range_join_multi_sum(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_cols=["event_id"],
        measure="v_c",
        windows_us={"sum_1h": h, "sum_6h": 6 * h},
    )


EVENTS_TRAILING_VALUE_SUM_SQL = """
SELECT e.event_id,
       CAST(SUM(CAST(FLOOR(e2.value*100 + 0.5) AS BIGINT))
              FILTER (WHERE e2.ts > e.ts - INTERVAL 1 HOUR) AS BIGINT) AS sum_1h,
       CAST(SUM(CAST(FLOOR(e2.value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_6h
FROM events e JOIN events e2
  ON e2.user_id = e.user_id AND e2.ts <= e.ts
 AND e2.ts > e.ts - INTERVAL 6 HOUR
GROUP BY e.event_id
"""


def events_user_time_weighted_value(sf_dir: str):
    """Time-weighted value integral per user (the TWA numerator/denominator
    — how long each observed value LEVEL persisted, the metering/billing
    aggregate a plain AVG gets wrong): Σ cents·Δµs over consecutive same-user
    events, plus the total observed span.  Exact integer output (the
    division is the consumer's).  Co-partition + per-group sort; the
    integral is one numpy diff-dot product.  Overflow bound documented:
    cents ≲ 1e6 × span ≲ 1e13 µs stays far inside int64 per term; the Σ is
    int64 too because terms alternate in sign only via value, not time."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def integral(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        us = s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = _cents(s["value"]).combine_chunks().to_numpy()
        d = np.diff(us)
        num = int(np.dot(cents[:-1], d)) if len(us) > 1 else 0
        return pa.table(
            {
                "user_id": s["user_id"].slice(0, 1),
                "weighted_cents_us": pa.array([num], pa.int64()),
                "span_us": pa.array([int(us[-1] - us[0])], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(integral, batch_format="pyarrow")


EVENTS_USER_TIME_WEIGHTED_VALUE_SQL = """
WITH s AS (
  SELECT user_id,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS t_next
  FROM events)
SELECT user_id,
       CAST(COALESCE(SUM(cents * (t_next - t)), 0) AS BIGINT)
         AS weighted_cents_us,
       CAST(MAX(t) - MIN(t) AS BIGINT) AS span_us
FROM s GROUP BY user_id
"""


def events_union_by_name(sf_dir: str):
    """Schema-evolution UNION BY NAME: two inputs with overlapping but
    different columns (an old feed without ``value``, a new feed without
    ``event_type``) harmonize into one stream — missing columns null-filled
    with their TYPED Arrow nulls before ``Dataset.union``, so downstream
    schemas never degrade to object/float (the classic evolution bug the
    as-of joins hit in round 2).  Block-local, zero shuffle; the aggregate
    keeps the oracle bounded."""
    old_feed = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type"]
    )
    new_feed = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "value"])

    def pad_old(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["event_id"], 1), 0))
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_cents": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def pad_new(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["event_id"], 1), 1))
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": pa.nulls(t.num_rows, pa.string()),
                "value_cents": _cents(t["value"]),
            }
        )

    unioned = old_feed.map_batches(pad_old, batch_format="pyarrow").union(
        new_feed.map_batches(pad_new, batch_format="pyarrow")
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "event_type": pc.fill_null(t["event_type"], "(none)"),
                    "v": pc.fill_null(t["value_cents"], 0),
                    "has_v": pc.cast(
                        pc.is_valid(t["value_cents"]), pa.int64()
                    ),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by("event_type")
            .aggregate([("v", "sum"), ("has_v", "sum"), ("n", "sum")])
        )
        return g.rename_columns(["event_type", "value_cents", "n_with_value", "n_rows"])

    return (
        unioned.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("value_cents", alias_name="value_cents"),
            Sum("n_with_value", alias_name="n_with_value"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )


EVENTS_UNION_BY_NAME_SQL = """
WITH u AS (
  SELECT event_id, event_type, NULL::BIGINT AS value_cents
  FROM events WHERE event_id % 2 = 0
  UNION ALL BY NAME
  SELECT event_id, NULL::VARCHAR AS event_type,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_cents
  FROM events WHERE event_id % 2 <> 0)
SELECT COALESCE(event_type, '(none)') AS event_type,
       CAST(COALESCE(SUM(value_cents), 0) AS BIGINT) AS value_cents,
       CAST(COUNT(value_cents) AS BIGINT) AS n_with_value,
       COUNT(*) AS n_rows
FROM u GROUP BY event_type
"""


def _returnflag_topk_kernel(g: pa.Table) -> pa.Table:
    idx = pc.sort_indices(
        g,
        sort_keys=[("revenue_cents", "descending"), ("p_brand", "ascending")],
    )
    out = g.take(idx.slice(0, 3))
    return out.append_column(
        "rn", pa.array(np.arange(1, out.num_rows + 1, dtype=np.int64))
    )


def _returnflag_top_brands_shuffle(sf_dir: str, fact):
    """Oversized-dim fallback for ``returnflag_top_brands``: Bloom-prefilter
    + hash-shuffle join against (p_partkey, p_brand); the aggregate and rank
    steps are identical to the broadcast path."""
    from ...stages.dedup import bloom_flag_seen

    dim = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])

    def pre(t: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "l_returnflag": t["l_returnflag"],
                "revenue_cents": rev,
            }
        )

    keyed_dim = dim.map_batches(
        lambda t: pa.table({"l_partkey": t["p_partkey"]}), batch_format="pyarrow"
    )
    flagged = bloom_flag_seen(
        fact.map_batches(pre, batch_format="pyarrow"), keyed_dim, key_col="l_partkey"
    )
    survivors = flagged.map_batches(
        lambda t: t.filter(t["maybe_seen"]).drop_columns(["maybe_seen"]),
        batch_format="pyarrow",
    )
    joined = survivors.join(
        dim,
        join_type="inner",
        num_partitions=8,
        on=("l_partkey",),
        right_on=("p_partkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_returnflag", "p_brand", "revenue_cents"])
            .group_by(["l_returnflag", "p_brand"])
            .aggregate([("revenue_cents", "sum")])
        )
        return g.rename_columns(["l_returnflag", "p_brand", "revenue_cents"])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "p_brand"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )
    return agg.groupby("l_returnflag").map_groups(
        _returnflag_topk_kernel, batch_format="pyarrow"
    )


def returnflag_top_brands(sf_dir: str):
    """Aggregate-then-rank reporting (the `GROUP BY … QUALIFY row_number()`
    shape): revenue per (returnflag, brand) — part dim broadcast once as a
    partkey→brand map, block-local conditional partials — then the top-3
    brands per flag.  After the first aggregate the data is O(flags×brands),
    so the rank step is a trivial per-group kernel; ties break on brand ASC
    in both engines.

    Broadcast-size guard (VERDICT r3 #1/#3): dim broadcastability decided
    from parquet metadata; oversized dims reroute to the Bloom-prefiltered
    shuffle join.  The dim load is pure Arrow/numpy — no take_all() row
    loop."""
    from ...stages.broadcast import dim_is_broadcastable

    part_path = _t(sf_dir, "part")
    dim_cols = ["p_partkey", "p_brand"]

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    if not dim_is_broadcastable(part_path, dim_cols):
        return _returnflag_top_brands_shuffle(sf_dir, ds)

    import pyarrow.parquet as pq

    pt = pq.read_table(part_path, columns=dim_cols)
    pt = pt.take(pc.sort_indices(pt, sort_keys=[("p_partkey", "ascending")]))
    keys_ref = ray.put(pt["p_partkey"].combine_chunks().to_numpy())
    brands_ref = ray.put(
        pt["p_brand"].combine_chunks().to_numpy(zero_copy_only=False)
    )

    def partial(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        brands = ray.get(brands_ref)
        lp = t["l_partkey"].combine_chunks().to_numpy()
        idx = np.searchsorted(keys, lp)
        idx = np.clip(idx, 0, len(keys) - 1)
        valid = keys[idx] == lp
        rev = _cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        ).combine_chunks().to_numpy()
        tb = pa.table(
            {
                "l_returnflag": t["l_returnflag"].combine_chunks().filter(
                    pa.array(valid)
                ),
                "p_brand": pa.array(brands[idx[valid]], pa.string()),
                "revenue_cents": pa.array(rev[valid], pa.int64()),
            }
        )
        g = tb.group_by(["l_returnflag", "p_brand"]).aggregate(
            [("revenue_cents", "sum")]
        )
        return g.rename_columns(["l_returnflag", "p_brand", "revenue_cents"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "p_brand"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )

    return agg.groupby("l_returnflag").map_groups(
        _returnflag_topk_kernel, batch_format="pyarrow"
    )


RETURNFLAG_TOP_BRANDS_SQL = """
WITH a AS (
  SELECT l_returnflag, p_brand,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY l_returnflag, p_brand)
SELECT l_returnflag, p_brand, revenue_cents,
       CAST(row_number() OVER (PARTITION BY l_returnflag
                               ORDER BY revenue_cents DESC, p_brand)
            AS BIGINT) AS rn
FROM a
QUALIFY rn <= 3
"""


def events_trailing_type_diversity(sf_dir: str):
    """Windowed COUNT(DISTINCT): for every event, how many distinct event
    types the same user produced in the trailing 1 h (inclusive) — the
    engagement-breadth feature.  Distinct counts don't prefix-sum, but the
    type dictionary is small: per (user, type) one sorted timestamp array,
    and the distinct count is Σ over types of a two-searchsorted emptiness
    test — O(|types| · log n) per event, all vectorized, one co-partition
    shuffle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    w = 3_600_000_000  # 1 h in µs

    def diversity(g: pa.Table) -> pa.Table:
        us = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = np.asarray(g["event_type"].to_pylist(), dtype=object)
        n = len(us)
        total = np.zeros(n, dtype=np.int64)
        for ty in np.unique(types):
            tts = np.sort(us[types == ty])
            hi = np.searchsorted(tts, us, side="right")
            lo = np.searchsorted(tts, us - w, side="right")
            total += (hi > lo).astype(np.int64)
        return pa.table(
            {
                "event_id": g["event_id"],
                "n_types_1h": pa.array(total, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(diversity, batch_format="pyarrow")


EVENTS_TRAILING_TYPE_DIVERSITY_SQL = """
SELECT e.event_id,
       CAST(COUNT(DISTINCT e2.event_type) AS BIGINT) AS n_types_1h
FROM events e JOIN events e2
  ON e2.user_id = e.user_id AND e2.ts <= e.ts
 AND e2.ts > e.ts - INTERVAL 1 HOUR
GROUP BY e.event_id
"""


def events_late_arrivals(sf_dir: str):
    """Event-time WATERMARK / late-arrival detection (the streaming-system
    shape): processing order is event_id; the watermark after each arrival
    is the running MAX event-time seen so far; an event is LATE when its
    own timestamp is more than 30 min behind that watermark.  The running
    max is a sequential dependency — parallelized with the two-phase
    range-bucket prefix scan (stages/scan.py:running_max: per-bucket
    partials → O(B) driver fold → seeded local scans)."""
    from ...stages.scan import running_max

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t["event_id"], "t_us": t["ts"].cast(pa.int64())}
        )

    scanned = running_max(
        ds.map_batches(proj, batch_format="pyarrow"),
        order_col="event_id",
        value_col="t_us",
        out_col="wm_us",
    )
    lateness = 1_800_000_000  # 30 min in µs

    def flag(t: pa.Table) -> pa.Table:
        late = pc.less(t["t_us"], pc.subtract(t["wm_us"], lateness))
        return pa.table({"event_id": t["event_id"], "is_late": late})

    return scanned.map_batches(flag, batch_format="pyarrow")


EVENTS_LATE_ARRIVALS_SQL = """
WITH s AS (
  SELECT event_id, epoch_us(ts) AS t,
         MAX(epoch_us(ts)) OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS wm
  FROM events)
SELECT event_id, t < wm - 1800000000 AS is_late
FROM s
"""


def orders_cumulative_revenue(sf_dir: str):
    """GLOBAL cumulative aggregate (``SUM() OVER (ORDER BY k)`` with no
    partition — the shape a per-key cumsum can't cover): running total of
    order value in ingestion sequence, via the two-phase prefix scan
    (stages/scan.py:running_sum).  Integer cents keep bucket-order addition
    bit-exact."""
    from ...stages.scan import running_sum

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "price_cents": _cents(t["o_totalprice"])}
        )

    return running_sum(
        ds.map_batches(proj, batch_format="pyarrow"),
        order_col="o_orderkey",
        value_col="price_cents",
        out_col="cum_cents",
    )


ORDERS_CUMULATIVE_REVENUE_SQL = """
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
              OVER (ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_cents
FROM orders
"""


def docs_extract_numbers(sf_dir: str):
    """Regex extract-all (``regexp_extract_all`` parity): every digit run in
    each document, summed and counted per doc — the vectorized form uses the
    same split-flatten-parent machinery as the tokenizers (split on
    ``[^0-9]+`` → digit runs), so no Python regex loop touches a row.  Runs
    longer than 18 digits are excluded on BOTH engines (int64 bound)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def extract(t: pa.Table) -> pa.Table:
        runs = pc.split_pattern_regex(t["text"], pattern="[^0-9]+").combine_chunks()
        flat = pc.list_flatten(runs)
        parents = pc.list_parent_indices(runs)
        ln = pc.utf8_length(flat)
        keep = pc.and_(pc.greater(ln, 0), pc.less_equal(ln, 18))
        flat = flat.filter(keep)
        par = parents.filter(keep).to_numpy(zero_copy_only=False)
        vals = flat.cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = t.num_rows
        sums = np.zeros(n, dtype=np.int64)
        cnts = np.zeros(n, dtype=np.int64)
        np.add.at(sums, par, vals)
        np.add.at(cnts, par, 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_numbers": pa.array(cnts, pa.int64()),
                "sum_numbers": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(extract, batch_format="pyarrow")


DOCS_EXTRACT_NUMBERS_SQL = """
WITH r AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(text, '[0-9]+'),
                     x -> length(x) <= 18) AS runs
  FROM documents)
SELECT doc_id,
       CAST(len(runs) AS BIGINT) AS n_numbers,
       CAST(COALESCE(list_sum(list_transform(runs, x -> CAST(x AS BIGINT))), 0)
            AS BIGINT) AS sum_numbers
FROM r
"""


def events_user_type_sequence(sf_dir: str):
    """Ordered collect-list — the behavior-sequence training export: each
    user's first 20 event types as one '>'-joined string (deterministic
    (ts, event_id) order, capped so a hot user can't blow up a row).  One
    co-partition shuffle; the per-group kernel is a sort + a slice + a
    join."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def seq(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        types = s["event_type"].to_pylist()[:20]
        return pa.table(
            {
                "user_id": s["user_id"].slice(0, 1),
                "type_seq": pa.array([">".join(types)], pa.string()),
                "n_events": pa.array([g.num_rows], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(seq, batch_format="pyarrow")


EVENTS_USER_TYPE_SEQUENCE_SQL = """
WITH r AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events)
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS type_seq,
       CAST(MIN(n_events) AS BIGINT) AS n_events
FROM r WHERE rn <= 20
GROUP BY user_id
"""


def orders_price_ntile(sf_dir: str):
    """Global value-ordered row_number + SQL-exact NTILE(4) — the window
    family's last gap (``docs_global_shuffle_rank`` orders by hash; this
    orders by VALUE) via stages/rank.py:global_value_rank: value-range
    buckets + O(B) prefix offsets, no global sort, no driver collect."""
    from ...stages.rank import global_value_rank

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "price_cents": _cents(t["o_totalprice"])}
        )

    return global_value_rank(
        ds.map_batches(proj, batch_format="pyarrow"),
        value_col="price_cents",
        id_col="o_orderkey",
        out_col="rnk",
        ntile_k=4,
    )


ORDERS_PRICE_NTILE_SQL = """
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents,
       CAST(row_number() OVER (ORDER BY FLOOR(o_totalprice*100 + 0.5),
                               o_orderkey) AS BIGINT) AS rnk,
       CAST(ntile(4) OVER (ORDER BY FLOOR(o_totalprice*100 + 0.5),
                           o_orderkey) AS BIGINT) AS tile
FROM orders
"""


def customer_tree_roots(sf_dir: str):
    """WITH RECURSIVE parity — hierarchy flattening: customers form a
    deterministic parent-pointer tree (``parent = custkey // 3``, keys < 3
    are self-looped roots); every node resolves to (root, depth) via
    pointer doubling (stages/hierarchy.py:resolve_roots — O(log depth)
    distributed joins, never a driver walk)."""
    from ...stages.hierarchy import resolve_roots

    ds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"])

    def mk_parent(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        parent = np.where(k >= 3, k // 3, k).astype(np.int64)
        return pa.table(
            {"c_custkey": t["c_custkey"], "parent": pa.array(parent)}
        )

    mx = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"]).aggregate(
        Max("c_custkey")
    )["max(c_custkey)"]
    import math

    depth_bound = int(math.log(max(int(mx), 3), 3)) + 2
    out = resolve_roots(
        ds.map_batches(mk_parent, batch_format="pyarrow"),
        node_col="c_custkey",
        parent_col="parent",
        max_depth=depth_bound,
    )
    return out.map_batches(
        lambda t: pa.table(
            {"c_custkey": t["node"], "root": t["root"], "depth": t["depth"]}
        ),
        batch_format="pyarrow",
    )


CUSTOMER_TREE_ROOTS_SQL = """
WITH RECURSIVE up AS (
  SELECT c_custkey AS node, c_custkey AS cur, CAST(0 AS BIGINT) AS depth
  FROM customer
  UNION ALL
  SELECT node, cur // 3, depth + 1 FROM up WHERE cur >= 3)
SELECT node AS c_custkey, CAST(cur AS BIGINT) AS root, depth
FROM up
QUALIFY row_number() OVER (PARTITION BY node ORDER BY depth DESC) = 1
"""


def customer_supplier_linkage(sf_dir: str):
    """Blocked fuzzy record LINKAGE as an oracle-checked distributed join:
    every (customer, supplier) pair in the same nation whose 9-digit name
    suffixes are within Levenshtein 2 (stages/linkage.py — small side
    broadcast once, big side streams through one shuffle-free map_batches
    probing a Myers bit-parallel pack per block).  The first fuzzy-join op
    with an EXACT DuckDB oracle (``levenshtein()`` join predicate) — the
    reconciliation fuzzy ops are rows-only because greedy 1:1 assignment
    isn't SQL."""
    import pyarrow.parquet as pq

    from ...stages.linkage import blocked_fuzzy_join

    small = pq.read_table(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    small_rows = [
        (b, i, n[9:])
        for b, i, n in zip(
            small["s_nationkey"].to_pylist(),
            small["s_suppkey"].to_pylist(),
            small["s_name"].to_pylist(),
        )
    ]
    big = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_nationkey"]
    )

    def add_key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": t["c_nationkey"],
                "_key": pc.utf8_slice_codeunits(
                    t["c_name"], start=9, stop=2**31 - 1
                ),
            }
        )

    return blocked_fuzzy_join(
        big.map_batches(add_key, batch_format="pyarrow"),
        small_rows,
        big_id="c_custkey",
        big_block="c_nationkey",
        big_key="_key",
        threshold=2,
        out_big="c_custkey",
        out_small="s_suppkey",
        out_block="c_nationkey",
        out_dist="lev_dist",
    )


CUSTOMER_SUPPLIER_LINKAGE_SQL = """
SELECT c.c_custkey AS c_custkey,
       s.s_suppkey AS s_suppkey,
       c.c_nationkey AS c_nationkey,
       CAST(levenshtein(substr(c.c_name, 10), substr(s.s_name, 10)) AS BIGINT)
         AS lev_dist
FROM customer c JOIN supplier s
  ON c.c_nationkey = s.s_nationkey
 AND levenshtein(substr(c.c_name, 10), substr(s.s_name, 10)) <= 2
"""


def docs_sequence_pack(sf_dir: str):
    """Training-sequence PACKING: assign every document a global token
    offset (exclusive prefix sum of token counts in doc_id order) and a
    fixed-capacity training block id (offset // 256) — the deterministic
    "concat the corpus, cut every B tokens" layout every LLM pretraining
    loader needs.  The global prefix sum is the two-phase range-bucket scan
    (stages/scan.py:running_sum), so the plan has no all-to-all shuffle."""
    from ...stages.scan import running_sum
    from ...stages.text_analysis import token_count_stage

    ds = token_count_stage(
        rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    )
    cum = running_sum(
        ds, order_col="doc_id", value_col="n_tokens", out_col="_cum"
    )

    def finish(t: pa.Table) -> pa.Table:
        c = t["_cum"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        off = c - n.astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "token_offset": pa.array(off, pa.int64()),
                "block_id": pa.array(off // 256, pa.int64()),
            }
        )

    return cum.map_batches(finish, batch_format="pyarrow")


DOCS_SEQUENCE_PACK_SQL = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens,
       CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            - n_tokens AS BIGINT) AS token_offset,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            - n_tokens) // 256 AS BIGINT) AS block_id
FROM toks
"""


def docs_skipgram_pairs(sf_dir: str):
    """Skip-gram co-occurrence (window ≤ 2): ordered token pairs (w_i,
    w_{i+d}) for d ∈ {1, 2} — the word2vec-style positional statistic
    (distinct from ``docs_bigram_counts``'s adjacency-only and
    ``docs_term_cooccurrence``'s unordered doc-level pairs).  Same fully
    vectorized shape as the bigram op: one ``list_flatten`` per block, the
    d-shift adjacency is a numpy compare on parent ids, block-local pair
    counts are the combiner so the shuffle carries O(pair-vocab) rows."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).to_numpy(zero_copy_only=False)
        p = parents.filter(keep).to_numpy(zero_copy_only=False)
        a_parts, b_parts = [], []
        for d in (1, 2):
            if len(f) <= d:
                continue
            adj = p[d:] == p[:-d]
            a_parts.append(f[:-d][adj])
            b_parts.append(f[d:][adj])
        if not a_parts:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        tb = pa.table(
            {
                "w1": pa.array(a, pa.string()),
                "w2": pa.array(b, pa.string()),
                "n_pairs": pa.array(np.ones(len(a), np.int64)),
            }
        )
        g = tb.group_by(["w1", "w2"]).aggregate([("n_pairs", "sum")])
        return g.rename_columns(["w1", "w2", "n_pairs"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
    )


DOCS_SKIPGRAM_PAIRS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
t AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS pos
      FROM d),
p AS (
  SELECT doc_id, term AS w1,
         lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM t
  UNION ALL
  SELECT doc_id, term,
         lead(term, 2) OVER (PARTITION BY doc_id ORDER BY pos)
  FROM t)
SELECT w1, w2, COUNT(*) AS n_pairs
FROM p WHERE w2 IS NOT NULL
GROUP BY w1, w2
"""


def lineitem_ols_by_flag(sf_dir: str):
    """Per-group linear regression (price-vs-quantity by return flag) via
    exact integer sufficient statistics (stages/regression.py): the five
    sums are order-independent int64 (quantity is integral, price in
    cents), and slope/intercept are ONE fixed IEEE double expression over
    them — bit-identical to the SQL oracle evaluating the same formula."""
    from ...stages.regression import grouped_ols

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "price_cents": _cents(t["l_extendedprice"]),
            }
        )

    return grouped_ols(
        ds.map_batches(proj, batch_format="pyarrow"),
        group_col="l_returnflag",
        x_col="qty",
        y_col="price_cents",
    )


LINEITEM_OLS_BY_FLAG_SQL = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_x,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_y,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
           AS BIGINT) AS sum_xx,
         CAST(SUM(CAST(l_quantity AS BIGINT)
                  * CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT))
           AS BIGINT) AS sum_xy
  FROM lineitem GROUP BY l_returnflag),
f AS (
  SELECT *,
         (CAST(n_rows AS DOUBLE)*CAST(sum_xy AS DOUBLE)
          - CAST(sum_x AS DOUBLE)*CAST(sum_y AS DOUBLE))
         / (CAST(n_rows AS DOUBLE)*CAST(sum_xx AS DOUBLE)
            - CAST(sum_x AS DOUBLE)*CAST(sum_x AS DOUBLE)) AS slope
  FROM s)
SELECT l_returnflag, n_rows, sum_x, sum_y, sum_xx, sum_xy, slope,
       (CAST(sum_y AS DOUBLE) - slope*CAST(sum_x AS DOUBLE))
         / CAST(n_rows AS DOUBLE) AS intercept
FROM f
"""


def events_ohlc_hourly(sf_dir: str):
    """Hourly OHLC bars over the event stream — the arg_min/arg_max
    selection-aggregate family (stages/timeseries.py: per-block numpy
    lexsort+reduceat partials, driver merge of buckets×blocks rows, zero
    shuffle).  Ties on ts break by event_id so open/close are
    deterministic."""
    from ...stages.timeseries import ohlc_bars

    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "ts", "value"]
    )
    return ohlc_bars(ds, ts_col="ts", id_col="event_id", value_col="value")


EVENTS_OHLC_HOURLY_SQL = """
WITH e AS (
  SELECT CAST(epoch_us(ts) // 3600000000 * 3600000000 AS BIGINT) AS hour_us,
         ts, event_id, value
  FROM events),
w AS (
  SELECT hour_us, value,
         row_number() OVER (PARTITION BY hour_us
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY hour_us
                            ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM e)
SELECT hour_us,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_z = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM w GROUP BY hour_us
"""


def docs_weighted_sample(sf_dir: str):
    """Weighted (probability-proportional-to-size) SYSTEMATIC sample of 50
    docs: lay the corpus on a weight line (weight = n_tokens + 1) in doc_id
    order via the global prefix scan, then select the doc covering each of
    50 evenly-spaced integer anchors (2i+1)·W / 100 — classic systematic
    PPS sampling with deterministic anchors, so every selection is exact
    integer arithmetic (no float sort keys to hash-mismatch on).  Anchors
    broadcast to a shuffle-free probe; heavy docs may legitimately cover
    several anchors (one output row per anchor)."""
    from ...stages.scan import running_sum
    from ...stages.text_analysis import token_count_stage

    k = 50
    ds = token_count_stage(
        rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    )

    def wproj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "weight": pc.add(pc.cast(t["n_tokens"], pa.int64()), 1),
            }
        )

    wds = ds.map_batches(wproj, batch_format="pyarrow")
    total = int(wds.aggregate(Sum("weight"))["sum(weight)"])
    anchors = np.array(
        [(2 * i + 1) * total // (2 * k) for i in range(k)], np.int64
    )
    cum = running_sum(wds, order_col="doc_id", value_col="weight", out_col="_cum")

    def probe(t: pa.Table) -> pa.Table:
        c = t["_cum"].combine_chunks().to_numpy(zero_copy_only=False)
        w = t["weight"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = c - w
        hit_t, hit_r = np.nonzero(
            (anchors[:, None] >= lo[None, :]) & (anchors[:, None] < c[None, :])
        )
        return pa.table(
            {
                "sample_idx": pa.array(hit_t.astype(np.int64)),
                "doc_id": pa.array(ids[hit_r].astype(np.int64)),
                "weight": pa.array(w[hit_r].astype(np.int64)),
            }
        )

    return cum.map_batches(probe, batch_format="pyarrow")


DOCS_WEIGHTED_SAMPLE_SQL = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END + 1
           AS weight
  FROM documents),
c AS (
  SELECT doc_id, weight,
         SUM(weight) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_w
  FROM toks),
tot AS (SELECT SUM(weight) AS wtot FROM toks),
tg AS (
  SELECT CAST(r.range AS BIGINT) AS sample_idx,
         (2*r.range + 1) * wtot // 100 AS pos
  FROM range(50) r, tot)
SELECT tg.sample_idx, c.doc_id, CAST(c.weight AS BIGINT) AS weight
FROM c JOIN tg ON tg.pos >= c.cum_w - c.weight AND tg.pos < c.cum_w
"""
