"""Query-registry family module 1/9 (dominant family: events_orders; split from the monolithic queries.py)."""

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
    _MEMO,
    _cents,
    _t,
)



def _fingerprint(path: str) -> str:
    import os

    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def _flagship_materialized(sf_dir: str):
    from ..flagship import run_flagship

    key = ("flagship", sf_dir, _fingerprint(_t(sf_dir.rstrip("/"), "documents")))
    if key not in _MEMO:
        _MEMO[key] = run_flagship(sf_dir).materialize()
    return _MEMO[key]


# ---------------------------------------------------------------- aggregates

def pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary (≙ A2/A3 run-summary aggregates).
    Pre-aggregation is Ray-native (partial per block, final after a tiny
    shuffle on the 2-value key pair)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.Table.from_arrays(
            [
                t["l_returnflag"],
                t["l_linestatus"],
                _cents(t["l_quantity"]),
                _cents(t["l_extendedprice"]),
                _cents(rev),
            ],
            names=["l_returnflag", "l_linestatus", "qty_c", "price_c", "rev_c"],
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_cents"),
            Sum("price_c", alias_name="sum_base_cents"),
            Sum("rev_c", alias_name="sum_rev_cents"),
            Count(alias_name="n"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_rev_cents,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def monthly_orders(sf_dir: str):
    """Monthly order buckets (≙ A4, server.js:260-267)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.strftime(t["o_orderdate"], format="%Y-%m"), _cents(t["o_totalprice"])],
            names=["month", "total_c"],
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n"), Sum("total_c", alias_name="sum_total_cents"))
    )


MONTHLY_ORDERS_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_total_cents
FROM orders GROUP BY 1
"""


def monthly_events(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.strftime(t["ts"], format="%Y-%m"), _cents(t["value"])],
            names=["month", "value_c"],
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="sum_value_cents"))
    )


MONTHLY_EVENTS_SQL = """
SELECT strftime(ts, '%Y-%m') AS month, COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1
"""


def events_global_stats(sf_dir: str):
    """Single-row dashboard stats (≙ A3, server.js:244-257) in one pass +
    one tiny distinct-count pass."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "value", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["user_id"], _cents(t["value"]), pc.cast(t["ts"], pa.int64())],
            names=["user_id", "value_c", "ts_us"],
        )

    base = ds.map_batches(prep, batch_format="pyarrow")
    row = base.aggregate(
        Count(alias_name="n_events"),
        Sum("value_c", alias_name="sum_value_cents"),
        Min("ts_us", alias_name="min_ts_us"),
        Max("ts_us", alias_name="max_ts_us"),
    )
    n_users = base.groupby("user_id").aggregate(Count(alias_name="c")).count()
    import pandas as pd

    return pd.DataFrame(
        [
            {
                "n_events": row["n_events"],
                "n_users": n_users,
                "sum_value_cents": row["sum_value_cents"],
                "min_ts_us": row["min_ts_us"],
                "max_ts_us": row["max_ts_us"],
            }
        ]
    )


EVENTS_GLOBAL_STATS_SQL = """
SELECT COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS min_ts_us,
       CAST(epoch_us(MAX(ts)) AS BIGINT) AS max_ts_us
FROM events
"""


# ------------------------------------------------------------ filters / sorts

def order_status_counts(sf_dir: str):
    """Status filter + priority counts (≙ F4, server.js:356).  The predicate
    is pushed INTO the parquet read (row-group pruning: filtered rows never
    leave storage — SURVEY 'prune at the read')."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderstatus", "o_orderpriority"],
        filter=pc.field("o_orderstatus") == "F",
    )
    return ds.groupby("o_orderpriority").aggregate(Count(alias_name="n"))


ORDER_STATUS_COUNTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n FROM orders WHERE o_orderstatus = 'F'
GROUP BY 1
"""


def run_summary_report(sf_dir: str):
    """S7 summary-report writer (≙ reconciliationEngine.js:201-210 rendered
    via the pdfkit endpoint server.js:605-657, re-expressed as a plain-text
    artifact): per-status counts + money totals over orders, distributed
    pre-aggregation, then the O(|statuses|)-row render on the driver
    (stages/report.py:summary_report_lines).  The oracle reproduces the
    EXACT formatted lines in SQL, so the report format itself is
    hash-checked."""
    from ...stages.report import summary_report_lines

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderstatus", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s": t["o_orderstatus"], "cents": _cents(t["o_totalprice"])}
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Sum("cents", alias_name="cents"), Count(alias_name="n"))
    )
    tiny = pa.Table.from_pylist(agg.take_all())
    return summary_report_lines(tiny, status_col="s", n_col="n", cents_col="cents")


RUN_SUMMARY_REPORT_SQL = """
WITH a AS (
  SELECT o_orderstatus AS s, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS c FROM a),
lines AS (
  SELECT CAST(0 AS BIGINT) AS line_no, 'RUN SUMMARY' AS line
  UNION ALL
  SELECT CAST(row_number() OVER (ORDER BY s) AS BIGINT),
         'status=' || s || ' n=' || CAST(n AS VARCHAR) ||
         ' total=$' || CAST(c // 100 AS VARCHAR) || '.' ||
         lpad(CAST(c % 100 AS VARCHAR), 2, '0')
  FROM a
  UNION ALL
  SELECT CAST((SELECT COUNT(*) FROM a) + 1 AS BIGINT),
         'TOTAL n=' || CAST(n AS VARCHAR) ||
         ' total=$' || CAST(c // 100 AS VARCHAR) || '.' ||
         lpad(CAST(c % 100 AS VARCHAR), 2, '0')
  FROM t)
SELECT line_no, line FROM lines
"""


def search_parts(sf_dir: str):
    """Substring search (≙ F6 LIKE %q%, server.js:357-360)."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_name"])
    return ds.map_batches(
        lambda t: t.filter(pc.match_substring(t["p_name"], "red")), batch_format="pyarrow"
    )


SEARCH_PARTS_SQL = "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%red%'"


def events_type_filter(sf_dir: str):
    """IN-set filter (≙ F5 status IN (...), server.js:521)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"),
        columns=["event_type"],
        filter=pc.field("event_type").isin(["click", "purchase"]),
    )
    return ds.groupby("event_type").aggregate(Count(alias_name="n"))


EVENTS_TYPE_FILTER_SQL = """
SELECT event_type, COUNT(*) AS n FROM events
WHERE event_type IN ('click','purchase') GROUP BY 1
"""


def top_customers(sf_dir: str):
    """Top-10 spenders (≙ T1/T2 ORDER BY + LIMIT, server.js:363-367)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["o_custkey"], _cents(t["o_totalprice"])], names=["o_custkey", "total_c"]
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("total_c", alias_name="sum_spent_cents"))
    )
    return agg.sort(["sum_spent_cents", "o_custkey"], descending=[True, False]).limit(10)


TOP_CUSTOMERS_SQL = """
SELECT o_custkey, CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_spent_cents
FROM orders GROUP BY 1 ORDER BY sum_spent_cents DESC, o_custkey LIMIT 10
"""


def top_lineitems(sf_dir: str):
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber", "l_extendedprice"]
    )
    return ds.sort(
        ["l_extendedprice", "l_orderkey", "l_linenumber"], descending=[True, False, False]
    ).limit(20)


TOP_LINEITEMS_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20
"""


# ---------------------------------------------------------------------- joins

def customers_without_early_orders(sf_dir: str):
    """Anti-join (≙ J5 missing-records, reconciliationEngine.js:199):
    broadcast the early-orderer key set, filter customers against it."""
    early = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_custkey"],
        filter=pc.field("o_orderdate") < np.datetime64("1996-01-01", "us"),
    )
    keys_ref = ray.put(pa.array(sorted(early.unique("o_custkey")), pa.int64()))
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name"])

    def anti(t: pa.Table) -> pa.Table:
        # vectorized set-membership probe — no per-row Python
        ks = ray.get(keys_ref)
        return t.filter(pc.invert(pc.is_in(t["c_custkey"], value_set=ks)))

    return cust.map_batches(anti, batch_format="pyarrow")


CUSTOMERS_WITHOUT_EARLY_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01')
"""


def revenue_by_priority(sf_dir: str):
    """Large-large hash join (≙ J7 SQL enrichment joins, server.js:583-588):
    ``Dataset.join`` hash-partitioned on the order key, then a tiny groupby."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.Table.from_arrays([t["l_orderkey"], _cents(rev)], names=["l_orderkey", "rev_c"])

    li = li.map_batches(prep, batch_format="pyarrow")
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    return joined.groupby("o_orderpriority").aggregate(
        Sum("rev_c", alias_name="sum_rev_cents"), Count(alias_name="n_items")
    )


REVENUE_BY_PRIORITY_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_rev_cents,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def revenue_by_nation(sf_dir: str):
    """Broadcast small-side join (≙ J1 register lookup): supplier+nation dims
    are ray.put ONCE and probed per batch — no shuffle on the fact table."""
    import pandas as pd

    sup = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = rd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]).to_pandas()
    dim = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    # broadcast as parallel key/value ARRAYS: the probe is a vectorized
    # dictionary lookup (index_in + take), not a per-row dict.get
    lookup_ref = ray.put(
        {
            "keys": pa.array(dim.s_suppkey.to_numpy(), pa.int64()),
            "names": pa.array(dim.n_name.tolist(), pa.string()),
        }
    )

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        idx = pc.index_in(t["l_suppkey"], value_set=lk["keys"])
        names = pc.take(lk["names"], idx)  # null index → null name, ≡ dict.get miss
        return pa.Table.from_arrays([names, _cents(rev)], names=["n_name", "rev_c"])

    return (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_c", alias_name="sum_rev_cents"), Count(alias_name="n_items"))
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_rev_cents,
       COUNT(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1
"""


# ------------------------------------------------------------- dedup / text

def dedup_flag_documents(sf_dir: str):
    """Keyed exact dedup, flag-don't-drop, first-wins by doc_id (≙ A1,
    reconciliationEngine.js:43-51) on key (lang, n_chars)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])
    firsts = ds.groupby(["lang", "n_chars"]).aggregate(
        Min("doc_id", alias_name="first_id"), Count(alias_name="n")
    )
    # broadcast ONLY duplicated keys (a key absent from the map is unique →
    # not a duplicate) — keeps the object O(|dup keys|), not O(|keys|).
    # Keys ship as a parallel (composite-key, first_id) array pair so the
    # probe is a vectorized index_in lookup, not a per-row dict probe.
    fdf = firsts.to_pandas()
    fdf = fdf[fdf["n"] > 1]
    comp = fdf["lang"].astype(str) + "|" + fdf["n_chars"].astype(str)
    fref = ray.put(
        {
            "keys": pa.array(comp.tolist(), pa.string()),
            "first": pa.array(fdf["first_id"].to_numpy(), pa.int64()),
        }
    )

    def flag(t: pa.Table) -> pa.Table:
        fm = ray.get(fref)
        comp = pc.binary_join_element_wise(
            t["lang"], pc.cast(t["n_chars"], pa.string()), "|"
        )
        idx = pc.index_in(comp, value_set=fm["keys"])
        first = pc.take(fm["first"], idx)
        dup = pc.and_kleene(pc.is_valid(idx), pc.not_equal(first, t["doc_id"]))
        dup = pc.fill_null(dup, False)
        return pa.Table.from_arrays(
            [t["doc_id"], pc.cast(dup, pa.bool_())], names=["doc_id", "is_duplicate"]
        )

    return ds.map_batches(flag, batch_format="pyarrow")


DEDUP_FLAG_DOCUMENTS_SQL = """
SELECT doc_id,
       (row_number() OVER (PARTITION BY lang, n_chars ORDER BY doc_id)) > 1 AS is_duplicate
FROM documents
"""


def flagship_extract_oracle(sf_dir: str):
    """Driver-visible oracle for the flagship extractor (M1-M8 + M4 spans,
    ≙ reference invoiceParser.js:88-128): build oracle-mode pages whose
    ground truth is a FIXED pure function of documents.text (title = first
    5 words, one or two body paragraphs at a fixed split — no hash-gated
    mutations), wrap them in the full boilerplate battery (nav/aside link
    farms, ad stub, high-link-density related div, footer, script/style,
    inline em/strong), run the REAL production extractor over the bytes,
    and emit per-doc (extracted_text, extracted_len, n_spans, confidence,
    content_type).  The DuckDB oracle reconstructs every column — including
    the extracted text byte-for-byte — from documents.text with list
    slicing, so a hash match here IS the byte-identical-text-per-url
    invariant, checked end-to-end through tokenizer, block classifier,
    charset sniff and span builder."""
    from ...sources.pages import oracle_pages_batch
    from ...stages.extract import extract_pages

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    pages = ds.map_batches(oracle_pages_batch, batch_format="pyarrow")
    ext = extract_pages(pages)

    def proj(t: pa.Table) -> pa.Table:
        txt = pc.cast(t["extracted_text"], pa.string())
        n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "extracted_text": txt,
                "extracted_len": n_chars,
                "n_spans": pc.cast(pc.list_value_length(t["spans"]), pa.int64()),
                "confidence": pc.cast(t["confidence"], pa.int64()),
                "content_type": t["content_type"],
            }
        )

    return ext.map_batches(proj, batch_format="pyarrow")


# Expected text reconstructed in SQL from the fixed oracle-mode layout
# (sources/pages.py oracle_blocks): title = words 1-5, then words 6-35 and
# 36.. as two paragraphs when the doc has >= 43 words, else words 6.. as one.
# Confidence mirrors functions/html.py:extract_html — four signals, of which
# text-nonempty, <article> seen and h1-extracted always hold here, so it is
# 75 or 100 by the 100-char body-length signal alone.
FLAGSHIP_EXTRACT_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''),
f AS (SELECT doc_id, w, len(w) AS nw FROM d WHERE len(w) >= 16),
e AS (
  SELECT doc_id,
         array_to_string(w[1:5], ' ') || chr(10) ||
         CASE WHEN nw >= 43
              THEN array_to_string(w[6:35], ' ') || chr(10) ||
                   array_to_string(w[36:nw], ' ')
              ELSE array_to_string(w[6:nw], ' ') END AS extracted_text,
         CASE WHEN nw >= 43 THEN 3 ELSE 2 END AS n_spans
  FROM f)
SELECT doc_id, extracted_text,
       CAST(length(extracted_text) AS BIGINT) AS extracted_len,
       CAST(n_spans AS BIGINT) AS n_spans,
       CAST(CASE WHEN length(extracted_text) >= 100 THEN 100 ELSE 75 END
            AS BIGINT) AS confidence,
       'html' AS content_type
FROM e
"""


def flagship_pdf_oracle(sf_dir: str):
    """Driver-visible oracle for the PDF leg of the flagship (F1 routing +
    XY-cut reading order + real Flate container decode): documents.text laid
    out as fixed 10-word lines in a spec-valid compressed PDF (two columns
    with the right column emitted FIRST for long docs, so reading order is
    proven to come from XY-cut), extracted by the real `%PDF-` sniff path.
    The oracle reconstructs the line layout in SQL, so the hash match is the
    byte-identical invariant for the PDF path."""
    from ...sources.pages import oracle_pdf_pages_batch
    from ...stages.extract import extract_pages

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    pages = ds.map_batches(oracle_pdf_pages_batch, batch_format="pyarrow")
    ext = extract_pages(pages)

    def proj(t: pa.Table) -> pa.Table:
        txt = pc.cast(t["extracted_text"], pa.string())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "extracted_text": txt,
                "extracted_len": pc.cast(pc.utf8_length(txt), pa.int64()),
                "n_spans": pc.cast(pc.list_value_length(t["spans"]), pa.int64()),
                "confidence": pc.cast(t["confidence"], pa.int64()),
                "content_type": t["content_type"],
            }
        )

    return ext.map_batches(proj, batch_format="pyarrow")


# 10-word lines rebuilt with corpus-bounded anchors (range table function
# only takes constants → scalar range + unnest, same idiom as
# DOCS_TOKEN_CHUNKS_SQL).  Confidence ≙ functions/pdf.py:extract_pdf — any
# text, >1 line and clean-parse always hold at >= 16 words, so only the
# 100-char signal varies.
FLAGSHIP_PDF_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''),
f AS (SELECT doc_id, w, len(w) AS nw FROM d WHERE len(w) >= 16),
b AS (SELECT CAST(COALESCE(MAX(nw), 0) / 10 + 2 AS BIGINT) AS hi FROM f),
r AS (SELECT CAST(unnest(range(0, hi)) AS BIGINT) AS i FROM b),
l AS (
  SELECT doc_id, i, nw,
         array_to_string(w[10*i + 1 : 10*i + 10], ' ') AS line
  FROM f JOIN r ON 10 * i < nw),
e AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY i) AS extracted_text,
         COUNT(*) AS n_lines
  FROM l GROUP BY doc_id)
SELECT doc_id, extracted_text,
       CAST(length(extracted_text) AS BIGINT) AS extracted_len,
       CAST(n_lines AS BIGINT) AS n_spans,
       CAST(CASE WHEN length(extracted_text) >= 100 THEN 100 ELSE 75 END
            AS BIGINT) AS confidence,
       'pdf' AS content_type
FROM e
"""


def flagship_mixed_oracle(sf_dir: str):
    """Heterogeneous-payload routing oracle (F1): one pipeline over a page
    table that mixes HTML and Flate-compressed PDF payloads (kind chosen by
    the SQL-expressible ``doc_id % 5`` rule), extracted by the real
    magic-bytes-sniffing extractor — per-row content_type AND byte-identical
    text both come out of the oracle, so mis-routing any single row
    hash-mismatches."""
    from ...sources.pages import oracle_mixed_pages_batch
    from ...stages.extract import extract_pages

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    pages = ds.map_batches(oracle_mixed_pages_batch, batch_format="pyarrow")
    ext = extract_pages(pages)

    def proj(t: pa.Table) -> pa.Table:
        txt = pc.cast(t["extracted_text"], pa.string())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "extracted_text": txt,
                "n_spans": pc.cast(pc.list_value_length(t["spans"]), pa.int64()),
                "content_type": t["content_type"],
            }
        )

    return ext.map_batches(proj, batch_format="pyarrow")


FLAGSHIP_MIXED_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''),
f AS (SELECT doc_id, w, len(w) AS nw FROM d WHERE len(w) >= 16),
h AS (
  SELECT doc_id,
         array_to_string(w[1:5], ' ') || chr(10) ||
         CASE WHEN nw >= 43
              THEN array_to_string(w[6:35], ' ') || chr(10) ||
                   array_to_string(w[36:nw], ' ')
              ELSE array_to_string(w[6:nw], ' ') END AS extracted_text,
         CAST(CASE WHEN nw >= 43 THEN 3 ELSE 2 END AS BIGINT) AS n_spans,
         'html' AS content_type
  FROM f WHERE doc_id % 5 <> 0),
b AS (SELECT CAST(COALESCE(MAX(nw), 0) / 10 + 2 AS BIGINT) AS hi FROM f),
r AS (SELECT CAST(unnest(range(0, hi)) AS BIGINT) AS i FROM b),
l AS (
  SELECT doc_id, i, array_to_string(w[10*i + 1 : 10*i + 10], ' ') AS line
  FROM f JOIN r ON 10 * i < nw
  WHERE doc_id % 5 = 0),
p AS (
  SELECT doc_id,
         string_agg(line, chr(10) ORDER BY i) AS extracted_text,
         CAST(COUNT(*) AS BIGINT) AS n_spans,
         'pdf' AS content_type
  FROM l GROUP BY doc_id)
SELECT * FROM h UNION ALL SELECT * FROM p
"""


def flagship_charset_oracle(sf_dir: str):
    """Charset-path oracle (M6): every page declares iso-8859-1 and is
    latin-1 encoded with a fixed accented title, extracted by the real
    sniff + strict-decode path — the oracle reconstructs the decoded text
    byte-for-byte (code-point lengths on both sides), so a wrong decode of
    any single byte hash-mismatches."""
    from ...sources.pages import oracle_latin1_pages_batch
    from ...stages.extract import extract_pages

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    pages = ds.map_batches(oracle_latin1_pages_batch, batch_format="pyarrow")
    ext = extract_pages(pages)

    def proj(t: pa.Table) -> pa.Table:
        txt = pc.cast(t["extracted_text"], pa.string())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "extracted_text": txt,
                "extracted_len": pc.cast(pc.utf8_length(txt), pa.int64()),
                "n_spans": pc.cast(pc.list_value_length(t["spans"]), pa.int64()),
                "error": pc.fill_null(pc.cast(t["error"], pa.string()), ""),
            }
        )

    return ext.map_batches(proj, batch_format="pyarrow")


FLAGSHIP_CHARSET_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''),
f AS (SELECT doc_id, w FROM d WHERE len(w) >= 16),
e AS (
  SELECT doc_id,
         'Résumé café naïve exposé' || chr(10) || array_to_string(w, ' ')
           AS extracted_text
  FROM f)
SELECT doc_id, extracted_text,
       CAST(length(extracted_text) AS BIGINT) AS extracted_len,
       CAST(2 AS BIGINT) AS n_spans,
       '' AS error
FROM e
"""


def flagship_giant_oracle(sf_dir: str):
    """Giant-page oracle (the skew fixture, byte-exact): every qualifying
    doc becomes a multi-KB page whose body is the word list repeated 8x as
    ONE paragraph; DuckDB rebuilds the repeated text with repeat(), so
    big-row handling through the whole engine is hash-checked."""
    from ...sources.pages import oracle_giant_pages_batch
    from ...stages.extract import extract_pages

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    ext = extract_pages(ds.map_batches(oracle_giant_pages_batch, batch_format="pyarrow"))

    def proj(t: pa.Table) -> pa.Table:
        txt = pc.cast(t["extracted_text"], pa.string())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "extracted_text": txt,
                "extracted_len": pc.cast(pc.utf8_length(txt), pa.int64()),
                "n_spans": pc.cast(pc.list_value_length(t["spans"]), pa.int64()),
            }
        )

    return ext.map_batches(proj, batch_format="pyarrow")


FLAGSHIP_GIANT_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''),
f AS (SELECT doc_id, w FROM d WHERE len(w) >= 16),
e AS (
  SELECT doc_id,
         array_to_string(w[1:5], ' ') || chr(10) ||
         rtrim(repeat(array_to_string(w, ' ') || ' ', 8)) AS extracted_text
  FROM f)
SELECT doc_id, extracted_text,
       CAST(length(extracted_text) AS BIGINT) AS extracted_len,
       CAST(2 AS BIGINT) AS n_spans
FROM e
"""


def flagship_poison_oracle(sf_dir: str):
    """Row-level error-isolation oracle: one pipeline over a table where
    every third row is corrupted bytes (strict decode raises) mixed with
    clean pages — errors MUST become row-level error values, never task
    failures, and the corruption rule (doc_id % 3) is SQL-expressible, so
    the isolation contract itself is hash-checked per row (≙ reference
    server.js:334-339)."""
    from ...sources.pages import oracle_poison_pages_batch
    from ...stages.extract import extract_pages

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    ext = extract_pages(
        ds.map_batches(oracle_poison_pages_batch, batch_format="pyarrow")
    )

    def proj(t: pa.Table) -> pa.Table:
        txt = pc.cast(t["extracted_text"], pa.string())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "ok": pc.is_null(t["error"]),
                "extracted_len": pc.cast(pc.utf8_length(txt), pa.int64()),
                "confidence": pc.cast(t["confidence"], pa.int64()),
            }
        )

    return ext.map_batches(proj, batch_format="pyarrow")


FLAGSHIP_POISON_ORACLE_SQL = """
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE trim(text) <> ''),
f AS (SELECT doc_id, w, len(w) AS nw FROM d WHERE len(w) >= 16),
e AS (
  SELECT doc_id,
         array_to_string(w[1:5], ' ') || chr(10) ||
         CASE WHEN nw >= 43
              THEN array_to_string(w[6:35], ' ') || chr(10) ||
                   array_to_string(w[36:nw], ' ')
              ELSE array_to_string(w[6:nw], ' ') END AS full_text
  FROM f)
SELECT doc_id,
       doc_id % 3 <> 0 AS ok,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                 ELSE length(full_text) END AS BIGINT) AS extracted_len,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                 WHEN length(full_text) >= 100 THEN 100
                 ELSE 75 END AS BIGINT) AS confidence
FROM e
"""


def doc_fingerprints(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return fingerprint_stage(ds).select_columns(["doc_id", "fp_md5"])


DOC_FINGERPRINTS_SQL = "SELECT doc_id, md5(text) AS fp_md5 FROM documents"


def token_counts(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return token_count_stage(ds)


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


def text_quality(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return quality_stage(ds)


TEXT_QUALITY_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
       length(regexp_replace(text, '[^!?.,;:]', '', 'g')) AS n_punct,
       length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
FROM documents
"""


# ------------------------------------------------------------------ ANN

def _query_vectors(sf_dir: str, n: int = 5):
    q = (
        rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
        .map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], n)), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    return q.vec_id.tolist(), np.asarray(q.embedding.tolist(), dtype=np.float64)


def ann_cosine_topk(sf_dir: str):
    """Exact brute-force cosine top-10 for 5 query vectors — the ANN
    baseline (broadcast query matrix; per-batch partial top-k)."""
    qids, qmat = _query_vectors(sf_dir)
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return brute_force_topk(ds, qids, qmat, k=10)


ANN_COSINE_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim_raw
      FROM q CROSS JOIN embeddings e),
r AS (SELECT query_id, vec_id, sim_raw,
             row_number() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, vec_id) AS rank
      FROM s)
SELECT query_id, vec_id, ROUND(sim_raw, 6) AS sim, rank FROM r WHERE rank <= 10
"""


def ann_ivf_topk(sf_dir: str):
    """IVF-bucketed approximate variant (rows-only check; recall vs the
    exact baseline is asserted in pytest)."""
    qids, qmat = _query_vectors(sf_dir)
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ivf_topk(ds, qids, qmat, k=10)


def ann_ivf_exact_fullprobe(sf_dir: str):
    """Partial ORACLE for the IVF pipeline (VERDICT r2 #7): with ``nprobe =
    n_centroids`` every centroid is probed, so the pruning filter provably
    passes every row and IVF must equal exact brute force — DuckDB's exact
    top-k SQL checks the ENTIRE IVF machinery (centroid sample, per-row
    assignment, probe-set pruning, partial top-k, final rank).  Recall at
    nprobe < n_centroids remains the documented approximation, asserted in
    pytest."""
    qids, qmat = _query_vectors(sf_dir)
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ivf_topk(ds, qids, qmat, k=10, n_centroids=16, nprobe=16)


ANN_IVF_EXACT_FULLPROBE_SQL = ANN_COSINE_TOPK_SQL


def ann_lsh_topk(sf_dir: str):
    """Random-hyperplane LSH ANN (third family member next to brute force
    and IVF — the data-independent scale path: no training sample, no index
    build; signatures computed inline).  Multi-probe at Hamming radius 1
    over 4 planes (5/16 of the bucket space — a probe fraction comparable
    to the IVF entry's nprobe=4/16; more planes only pay off when true
    neighbors are genuinely close, which synthetic gaussian embeddings are
    not); rows-only — planted-neighbor recall is asserted in pytest."""
    from ...stages.ann import lsh_topk

    qids, qmat = _query_vectors(sf_dir)
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return lsh_topk(ds, qids, qmat, k=10, n_planes=4, max_hamming=1)


def ann_lsh_exact_fullprobe(sf_dir: str):
    """Partial ORACLE for the LSH pipeline (the ivf_fullprobe trick): with
    ``max_hamming = n_planes`` every bucket is allowed, the filter provably
    passes every row, and LSH must equal exact brute force — DuckDB's exact
    top-k SQL checks the whole machinery (projection, bucketing, pruning,
    partial top-k, final rank).  Recall at radius 1 stays the documented
    approximation, asserted in pytest."""
    from ...stages.ann import lsh_topk

    qids, qmat = _query_vectors(sf_dir)
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return lsh_topk(ds, qids, qmat, k=10, n_planes=8, max_hamming=8)


ANN_LSH_EXACT_FULLPROBE_SQL = ANN_COSINE_TOPK_SQL


def embeddings_knn_join(sf_dir: str):
    """Embedding kNN JOIN (similarity-search family): every probe vector
    (vec_id % 7 = 3) joined to its 3 nearest build vectors (the rest) by
    cosine.  Build side broadcast once via ``ray.put``; probe side streams —
    zero shuffle (stages/ann.py:knn_join).  Exact oracle: DuckDB CROSS JOIN
    + row_number window with the identical (sim DESC, build_id) tiebreak."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def _side(want_probe: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = (t["vec_id"].to_numpy(zero_copy_only=False) % 7) == 3
            return t.filter(pa.array(mask if want_probe else ~mask))

        return ds.map_batches(f, batch_format="pyarrow")

    return knn_join(_side(True), _side(False), k=3)


EMBEDDINGS_KNN_JOIN_SQL = """
WITH p AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pe
           FROM embeddings WHERE vec_id % 7 = 3),
b AS (SELECT vec_id AS build_id, CAST(embedding AS DOUBLE[]) AS be
      FROM embeddings WHERE vec_id % 7 <> 3),
s AS (SELECT p.probe_id, b.build_id,
             list_cosine_similarity(pe, be) AS sim_raw
      FROM p CROSS JOIN b),
r AS (SELECT probe_id, build_id, sim_raw,
             row_number() OVER (PARTITION BY probe_id ORDER BY sim_raw DESC, build_id) AS rank
      FROM s)
SELECT probe_id, build_id, ROUND(sim_raw, 6) AS sim, rank FROM r WHERE rank <= 3
"""


def orders_customer_full_outer(sf_dir: str):
    """FULL OUTER join through Ray Data's native hash-shuffle ``Dataset.join``
    (completes the join-type family next to the inner `top_building_orders`,
    semi/anti `customers_without_early_orders`, and the co-located
    `orders_customer_bucketed_join`).  Big orders (>3500.00×100 cents) ⟗
    high-balance customers: big orders whose customer is not high-balance
    surface left-only; high-balance customers with no big order surface
    right-only (both classes non-empty at every sf).  Every nullable column is
    COALESCEd to a sentinel on BOTH engines so the int64 schema survives
    pandas' NaN upcast (the r2 as-of join lesson — never hand the oracle a
    null-tainted int column)."""
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["o_orderkey"], t["o_custkey"], _cents(t["o_totalprice"])],
            names=["o_orderkey", "o_custkey", "o_total_cents"],
        ).filter(pc.greater(t["o_totalprice"], 350000.0)),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_acctbal"]
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["c_custkey"], t["c_name"], _cents(t["c_acctbal"])],
            names=["c_custkey", "c_name", "c_acctbal_cents"],
        ).filter(pc.greater(t["c_acctbal"], 5000.0)),
        batch_format="pyarrow",
    )
    joined = orders.join(
        cust,
        join_type="full_outer",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer join merges the two key columns into the left
        # name, already COALESCEd — only the non-key columns can be null
        neg1 = pa.scalar(-1, pa.int64())
        cust_key = pc.cast(t["o_custkey"], pa.int64())
        return pa.Table.from_arrays(
            [
                cust_key,
                pc.coalesce(pc.cast(t["o_orderkey"], pa.int64()), neg1),
                pc.coalesce(pc.cast(t["o_total_cents"], pa.int64()), neg1),
                pc.coalesce(pc.cast(t["c_name"], pa.string()), pa.scalar("", pa.string())),
                pc.coalesce(pc.cast(t["c_acctbal_cents"], pa.int64()), neg1),
            ],
            names=["cust_key", "o_orderkey", "o_total_cents", "c_name", "c_acctbal_cents"],
        )

    return joined.map_batches(finish, batch_format="pyarrow")


ORDERS_CUSTOMER_FULL_OUTER_SQL = """
WITH o AS (SELECT o_orderkey, o_custkey,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS o_total_cents
           FROM orders WHERE o_totalprice > 350000),
c AS (SELECT c_custkey, c_name,
             CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS c_acctbal_cents
      FROM customer WHERE c_acctbal > 5000)
SELECT COALESCE(o.o_custkey, c.c_custkey) AS cust_key,
       COALESCE(o.o_orderkey, -1) AS o_orderkey,
       COALESCE(o.o_total_cents, -1) AS o_total_cents,
       COALESCE(c.c_name, '') AS c_name,
       COALESCE(c.c_acctbal_cents, -1) AS c_acctbal_cents
FROM o FULL OUTER JOIN c ON o.o_custkey = c.c_custkey
"""


def docs_jsonl_export(sf_dir: str):
    """JSONL sink + source roundtrip (the training-data interchange format,
    next to the S6 CSV roundtrip): the documents metadata projection is
    written as JSONL shards via ``write_json`` and read back via
    ``read_json`` — the oracle checks the ROUNDTRIPPED values, so JSON
    escaping and numeric fidelity are in the verified surface.  Cached per
    source fingerprint like the CSV/register exports (never serves stale
    data after a testdata regen)."""
    import os

    from ...functions.hashing import stable_hash64

    st = os.stat(f"{sf_dir.rstrip('/')}/documents.parquet")
    key = stable_hash64(f"{sf_dir}|docs_jsonl|v1|{st.st_size}|{st.st_mtime_ns}")
    out = f"/tmp/iocr_jsonl_export_{key:016x}"
    if not os.path.isdir(out):
        ds = rd.read_parquet(
            _t(sf_dir, "documents"), columns=["doc_id", "lang", "source", "n_chars"]
        ).map_batches(
            lambda t: t.filter(pc.less(t["doc_id"], 2000)), batch_format="pyarrow"
        )
        tmp = out + ".tmp"
        ds.write_json(tmp)
        os.rename(tmp, out)
    return rd.read_json(out).select_columns(["doc_id", "lang", "source", "n_chars"])


DOCS_JSONL_EXPORT_SQL = """
SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id < 2000
"""


def corpus_mix_weighted(sf_dir: str):
    """Weighted corpus MIXING — the 'data recipe' step of every large-scale
    training pipeline: each source contributes at its own rate, selected by
    a content-stable hash (never seed/partitioning-dependent sampling), so
    the mixture is reproducible by any engine and any re-run.  Per-source
    rate here derives from the source id (``(n % 5 + 1) × 150`` permille);
    one streaming pass, zero shuffle.  The kept row carries its source rate
    so downstream loss-weighting can invert the sampling bias."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang", "source"])

    def pick(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        rates = [((int(s[3:]) % 5) + 1) * 150 for s in srcs]
        keep = [
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000 < r
            for i, r in zip(ids, rates)
        ]
        t = t.append_column("rate_permille", pa.array(rates, pa.int64()))
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(pick, batch_format="pyarrow")


CORPUS_MIX_WEIGHTED_SQL = """
SELECT doc_id, lang, source,
       ((CAST(substr(source, 4) AS BIGINT) % 5) + 1) * 150 AS rate_permille
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000
      < ((CAST(substr(source, 4) AS BIGINT) % 5) + 1) * 150
"""


def docs_epoch_repeat(sf_dir: str):
    """Deterministic epoch UPSAMPLING — the other half of the data recipe:
    high-value sources repeat for multiple epochs (weight ``n % 3 + 1``),
    each copy tagged with its epoch number so shuffling/sharding downstream
    can interleave epochs.  Pure vectorized ``np.repeat`` inside one
    map_batches — output is w× the input rows with zero shuffle (the
    flat_map shape, done columnar)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source"])

    def rep(t: pa.Table) -> pa.Table:
        srcs = t["source"].to_pylist()
        w = np.asarray([(int(s[3:]) % 3) + 1 for s in srcs], dtype=np.int64)
        idx = np.repeat(np.arange(len(w)), w)
        out = t.take(pa.array(idx, pa.int64()))
        # epoch = 1..w per source row: global arange minus each row's start
        starts = np.concatenate(([0], np.cumsum(w)[:-1]))
        epoch = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, w) + 1
        return out.append_column("epoch", pa.array(epoch, pa.int64()))

    return ds.map_batches(rep, batch_format="pyarrow")


DOCS_EPOCH_REPEAT_SQL = """
SELECT doc_id, source, CAST(t.epoch AS BIGINT) AS epoch
FROM documents,
     LATERAL unnest(generate_series(1, (CAST(substr(source, 4) AS BIGINT) % 3) + 1))
         AS t(epoch)
"""


def orders_price_cdf(sf_dir: str):
    """Exact cumulative distribution over a value column (the CUME_DIST /
    percent-rank shape without a global sort): block-local value counts →
    one O(distinct-values) groupby → driver prefix-sum over the aggregate.
    Documented bound: the DRIVER holds O(distinct values) rows (a money
    column has a bounded cent domain even at 100 TB); rows never sort
    globally and never leave their blocks.  Integer-exact output
    (value, count, cumulative count) — CUME_DIST is cum_cnt/n downstream."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        g = (
            pa.Table.from_arrays([_cents(t["o_totalprice"])], names=["price_cents"])
            .group_by("price_cents")
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["price_cents", "cnt"])

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("price_cents")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("price_cents")
        .reset_index(drop=True)
    )
    agg["cum_cnt"] = agg["cnt"].cumsum().astype(np.int64)
    agg["cnt"] = agg["cnt"].astype(np.int64)
    return agg


ORDERS_PRICE_CDF_SQL = """
WITH v AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
           FROM orders),
g AS (SELECT price_cents, COUNT(*) AS cnt FROM v GROUP BY price_cents)
SELECT price_cents, CAST(cnt AS BIGINT) AS cnt,
       CAST(SUM(cnt) OVER (ORDER BY price_cents) AS BIGINT) AS cum_cnt
FROM g
"""


def window_dedup_docs(sf_dir: str):
    """Exact substring-level duplication (Lee et al. 2022 shape): hop-1
    rolling 8-word windows; a window seen in an earlier doc counts as
    duplicated AT ANY ALIGNMENT (stages/corpus_stats.py:window_dedup_stats
    — the rolling complement of the chunk_dedup_docs fixed-chunk pass)."""
    from ...stages.corpus_stats import window_dedup_stats

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return window_dedup_stats(ds, window_words=8)


WINDOW_DEDUP_DOCS_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
                     w -> w <> '') AS words
  FROM documents),
wins AS (
  SELECT doc_id, array_to_string(words[s.s : s.s + 7], ' ') AS win
  FROM toks, LATERAL unnest(generate_series(1, len(words) - 7)) AS s(s)),
owner AS (SELECT win, MIN(doc_id) AS first_doc FROM wins GROUP BY 1),
have AS (
  SELECT w.doc_id, COUNT(*) AS n_windows,
         COUNT(*) FILTER (WHERE o.first_doc < w.doc_id) AS n_dup_windows
  FROM wins w JOIN owner o USING (win) GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(h.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(h.n_dup_windows, 0) AS BIGINT) AS n_dup_windows
FROM documents d LEFT JOIN have h USING (doc_id)
"""


def _synth_link_edges(sf_dir: str):
    """Deterministic synthetic link graph over the corpus: doc i links to up
    to 3 targets ``md5(i:j) % N`` (j = 0..2), self-loops dropped, duplicate
    targets collapsed — reproducible by any engine from the table alone."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(_t(sf_dir, "documents")).num_rows
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        import hashlib

        srcs: list[int] = []
        dsts: list[int] = []
        for i in t["doc_id"].to_pylist():
            tg = set()
            for j in range(3):
                d = int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16) % n
                if d != i:
                    tg.add(d)
            for d in sorted(tg):
                srcs.append(int(i))
                dsts.append(d)
        return pa.Table.from_arrays(
            [pa.array(srcs, pa.int64()), pa.array(dsts, pa.int64())],
            names=["src", "dst"],
        )

    return ds.map_batches(edges, batch_format="pyarrow"), n


def docs_pagerank(sf_dir: str):
    """Iterative distributed PageRank (stages/pagerank.py) over the
    deterministic synthetic link graph — 5 power iterations in int64
    fixed-point, so even this ITERATIVE algorithm has an exact SQL oracle
    (the same floor arithmetic unrolled as 5 chained CTEs)."""
    from ...stages.pagerank import pagerank

    edges, n = _synth_link_edges(sf_dir)
    return pagerank(edges.materialize(), n, iters=5)


def _pagerank_sql(iters: int = 5) -> str:
    sql = """WITH nodes AS (SELECT doc_id AS node FROM documents),
edges_raw AS (
  SELECT doc_id AS src,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)), 1, 8)) AS UBIGINT)
              % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
  FROM documents, LATERAL unnest(generate_series(0, 2)) AS j(j)),
edges AS (SELECT DISTINCT src, dst FROM edges_raw WHERE dst <> src),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes)"""
    for i in range(1, iters + 1):
        sql += f""",
acc{i} AS (SELECT e.dst AS node, SUM(r.r // dg.d) AS s
           FROM edges e
           JOIN deg dg ON e.src = dg.src
           JOIN r{i - 1} r ON r.node = e.src
           GROUP BY 1),
r{i} AS (SELECT n.node,
                CAST(150000000 + (85 * COALESCE(a.s, 0)) // 100 AS BIGINT) AS r
         FROM nodes n LEFT JOIN acc{i} a USING (node))"""
    return sql + f"\nSELECT node, r AS rank_fx FROM r{iters}"


DOCS_PAGERANK_SQL = _pagerank_sql(5)


def docs_ngram_decontaminate(sf_dir: str):
    """N-gram-overlap decontamination: training docs (doc_id ≥ 20) flagged
    if any rolling 8-word window collides with the benchmark set (doc_id
    < 20) — partial-overlap hygiene the substring-needle pass can't see
    (stages/corpus_stats.py:ngram_contamination)."""
    from ...stages.corpus_stats import ngram_contamination

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    bench = docs.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 20)), batch_format="pyarrow"
    )
    train = docs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], 20)), batch_format="pyarrow"
    )
    return ngram_contamination(train, bench, window_words=8)


DOCS_NGRAM_DECONTAMINATE_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'),
                     w -> w <> '') AS words
  FROM documents),
bwins AS (
  SELECT DISTINCT array_to_string(words[s.s : s.s + 7], ' ') AS win
  FROM toks, LATERAL unnest(generate_series(1, len(words) - 7)) AS s(s)
  WHERE doc_id < 20),
twins AS (
  SELECT doc_id, array_to_string(words[s.s : s.s + 7], ' ') AS win
  FROM toks, LATERAL unnest(generate_series(1, len(words) - 7)) AS s(s)
  WHERE doc_id >= 20),
hits AS (
  SELECT doc_id, COUNT(*) AS n FROM twins
  WHERE win IN (SELECT win FROM bwins) GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contam_windows,
       COALESCE(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id >= 20
"""


def orders_equidepth_buckets(sf_dir: str):
    """Equi-depth (quartile) feature binning: boundaries from the exact
    distributed quantile machinery (stages/quantiles.py, quantile_disc
    semantics — histogram partition + refinement, no global sort), then one
    streaming pass assigns each row its bucket by value.  The
    feature-engineering shape: bucket ids are stable under re-partitioning
    because they derive from VALUES, not row positions (unlike NTILE)."""
    from ...stages.quantiles import exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    cents = ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["o_orderkey"], _cents(t["o_totalprice"])],
            names=["o_orderkey", "price_cents"],
        ),
        batch_format="pyarrow",
    )
    qt = exact_quantiles(cents, "price_cents", [0.25, 0.5, 0.75])
    bounds = np.asarray(qt["value"].to_pylist(), dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        v = t["price_cents"].to_numpy(zero_copy_only=False)
        bucket = 1 + (v[:, None] > bounds[None, :]).sum(axis=1)
        return t.append_column("bucket", pa.array(bucket.astype(np.int64), pa.int64()))

    return cents.map_batches(assign, batch_format="pyarrow")


ORDERS_EQUIDEPTH_BUCKETS_SQL = """
WITH v AS (SELECT o_orderkey,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
           FROM orders),
q AS (SELECT quantile_disc(price_cents, 0.25) AS q1,
             quantile_disc(price_cents, 0.50) AS q2,
             quantile_disc(price_cents, 0.75) AS q3 FROM v)
SELECT o_orderkey, price_cents,
       CAST(1 + CAST(price_cents > q1 AS INT) + CAST(price_cents > q2 AS INT)
              + CAST(price_cents > q3 AS INT) AS BIGINT) AS bucket
FROM v, q
"""


def lineitem_bloom_join_revenue(sf_dir: str):
    """BLOOM-PREFILTERED distributed join (the classic 'Bloom join' shuffle
    reduction, composed from existing stages): urgent orders' keys fold into
    a fixed-size Bloom bitset (stages/dedup.py:bloom_flag_seen — the
    broadcast is n_bits/8 bytes REGARDLESS of dim-key count), the lineitem
    fact side drops ~80% of its rows BEFORE the hash-shuffle join, and the
    join then runs exactly on the survivors.  No false negatives → the
    result is exact; Bloom false positives are eliminated by the join
    itself.  At 100 TB this is the difference between shuffling the whole
    fact table and shuffling only the matching fraction."""
    from ...stages.dedup import bloom_flag_seen

    dim = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))["o_orderkey"]],
            names=["o_orderkey"],
        ),
        batch_format="pyarrow",
    )
    fact = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t["l_orderkey"],
                t["l_returnflag"],
                _cents(pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))),
            ],
            names=["l_orderkey", "l_returnflag", "rev_c"],
        ),
        batch_format="pyarrow",
    )
    dim_keyed = dim.map_batches(
        lambda t: t.rename_columns(["l_orderkey"]), batch_format="pyarrow"
    )
    flagged = bloom_flag_seen(fact, dim_keyed, key_col="l_orderkey")

    def keep_maybe(t: pa.Table) -> pa.Table:
        return t.filter(t["maybe_seen"]).drop_columns(["maybe_seen"])

    survivors = flagged.map_batches(keep_maybe, batch_format="pyarrow")
    joined = survivors.join(
        dim,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return (
        joined.groupby("l_returnflag")
        .aggregate(Sum("rev_c", alias_name="rev_cents"), Count(alias_name="n_items"))
    )


LINEITEM_BLOOM_JOIN_REVENUE_SQL = """
WITH d AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
       COUNT(*) AS n_items
FROM lineitem JOIN d ON l_orderkey = d.o_orderkey
GROUP BY 1
"""


def docs_domain_cap(sf_dir: str):
    """Per-DOMAIN contribution cap (web-pipeline domain balancing): keep at
    most 3 docs per source, chosen by content-stable md5 order (never
    first-N-in-scan-order, which is layout-dependent).  Same lossless
    block-local pre-prune shape as `docs_per_lang_longest`: each block
    forwards ≤3 rows per source, so the final per-group selection sees
    O(3 × sources × blocks) rows — no full shuffle of the corpus."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source"])

    def local_prune(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t["doc_id"].to_pylist()
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        t = t.append_column("h", pa.array(h, pa.string()))
        out = []
        # block-local bottom-3 per source (lossless: the global bottom-3
        # of a source is a subset of every block's bottom-3 union)
        for src in pc.unique(t["source"]).to_pylist():
            sub = t.filter(pc.equal(t["source"], src))
            order = pc.sort_indices(
                sub, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
            )
            out.append(sub.take(order[:3]))
        return pa.concat_tables(out)

    pruned = ds.map_batches(local_prune, batch_format="pyarrow")

    def final_group(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
        )
        return g.take(order[:3]).select(["doc_id", "source"])

    return pruned.groupby("source").map_groups(final_group, batch_format="pyarrow")


DOCS_DOMAIN_CAP_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= 3
"""


def orders_price_outliers(sf_dir: str):
    """Robust outlier flagging via median/MAD (the data-quality gate shape:
    quantile-based, so one corrupted value can't shift the threshold the
    way a mean/stddev gate would).  Median and MAD both come from the
    exact distributed quantile machinery (two histogram-refine passes, no
    global sort); the flag pass streams.  Integer cents end-to-end — the
    oracle reproduces the exact same MEDIAN/MAD in SQL."""
    from ...stages.quantiles import exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    cents = ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["o_orderkey"], _cents(t["o_totalprice"])],
            names=["o_orderkey", "price_cents"],
        ),
        batch_format="pyarrow",
    )
    med = int(exact_quantiles(cents, "price_cents", [0.5])["value"][0].as_py())
    dev = cents.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["o_orderkey"], pc.abs(pc.subtract(t["price_cents"], med))],
            names=["o_orderkey", "adev"],
        ),
        batch_format="pyarrow",
    )
    mad = int(exact_quantiles(dev, "adev", [0.5])["value"][0].as_py())

    def flag(t: pa.Table) -> pa.Table:
        # threshold 1.9×MAD as the integer comparison 10·dev > 19·MAD (the
        # classic 3×MAD never fires on a uniform-ish distribution, whose
        # max deviation is 2×MAD — 1.9 flags the ~5% tails)
        d = pc.abs(pc.subtract(t["price_cents"], med))
        return pa.Table.from_arrays(
            [
                t["o_orderkey"],
                t["price_cents"],
                pc.greater(pc.multiply(d, 10), 19 * mad),
            ],
            names=["o_orderkey", "price_cents", "is_outlier"],
        )

    return cents.map_batches(flag, batch_format="pyarrow")


ORDERS_PRICE_OUTLIERS_SQL = """
WITH v AS (SELECT o_orderkey,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
           FROM orders),
m AS (SELECT quantile_disc(price_cents, 0.5) AS med FROM v),
d AS (SELECT quantile_disc(abs(price_cents - m.med), 0.5) AS mad FROM v, m)
SELECT v.o_orderkey, v.price_cents,
       abs(v.price_cents - m.med) * 10 > 19 * d.mad AS is_outlier
FROM v, m, d
"""


def events_funnel_stages(sf_dir: str):
    """Ordered-sequence FUNNEL per user (signup → view → purchase, each
    step strictly after the previous step's first completion and within a
    48-hour conversion window) — the MATCH_RECOGNIZE-ish event-sequence
    class.  Co-partition by user (one groupby shuffle), then a fully
    vectorized per-group three-step min-scan over value comparisons — no
    sort needed, so same-timestamp ties cannot make the result
    order-dependent."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_type"])
    window_us = 48 * 3600 * 1_000_000

    def per_user(g: pa.Table) -> pa.Table:
        uid = g["user_id"][0].as_py()
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        et = np.asarray(g["event_type"].to_pylist())
        stage = 0
        t_prev = None
        for step_type in ("signup", "view", "purchase"):
            mask = et == step_type
            if t_prev is not None:
                mask &= (ts > t_prev) & (ts <= t_prev + window_us)
            if not mask.any():
                break
            t_prev = ts[mask].min()
            stage += 1
        return pa.Table.from_arrays(
            [pa.array([uid], pa.int64()), pa.array([stage], pa.int64())],
            names=["user_id", "funnel_stage"],
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def events_interval_overlap(sf_dir: str):
    """INTERVAL-OVERLAP self-join (the range×range join class, beyond the
    point-in-window range join): each event spans [ts, ts + (event_id %
    120 + 10) minutes]; count, per event, how many other intervals of the
    SAME user overlap it.  Co-partition by user (one groupby shuffle), then
    the classic O(n log n) per-group kernel — two sorted arrays + two
    vectorized searchsorteds: |{j : s_j ≤ e_i}| − |{j : e_j < s_i}| − 1 —
    never the O(n²) pair materialization the SQL oracle uses."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    minute_us = 60 * 1_000_000

    def per_user(g: pa.Table) -> pa.Table:
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        s = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        e = s + (eid % 120 + 10) * minute_us
        ss = np.sort(s)
        es = np.sort(e)
        n = np.searchsorted(ss, e, side="right") - np.searchsorted(es, s, side="left") - 1
        return pa.Table.from_arrays(
            [pa.array(eid, pa.int64()), pa.array(n.astype(np.int64), pa.int64())],
            names=["event_id", "n_overlaps"],
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


EVENTS_INTERVAL_OVERLAP_SQL = """
WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
                   epoch_us(ts) + (event_id % 120 + 10) * 60 * 1000000 AS e
            FROM events)
SELECT a.event_id, CAST(COUNT(b.event_id) AS BIGINT) AS n_overlaps
FROM iv a LEFT JOIN iv b
  ON a.user_id = b.user_id AND a.event_id <> b.event_id
 AND b.s <= a.e AND b.e >= a.s
GROUP BY 1
"""


EVENTS_FUNNEL_STAGES_SQL = """
WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
v AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts > s.t1
        AND e.ts <= s.t1 + INTERVAL '48 hours' GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t2
        AND e.ts <= v.t2 + INTERVAL '48 hours' GROUP BY 1),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN v.user_id IS NOT NULL THEN 2
                 WHEN s.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage
FROM u
LEFT JOIN s ON u.user_id = s.user_id
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""


# -------------------------------------------------- near-dup suite (rows-only)

def _docs_with_neardups(sf_dir: str):
    """documents ∪ deterministic mutated copies (5% of docs, doc_id+1_000_000)
    — plants verifiable near-dup pairs so the suite's output is non-empty and
    analytically checkable."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def mutate(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_i, out_t = list(ids), [x or "" for x in texts]
        for i, x in zip(ids, texts):
            if i % 20 == 0:  # every 20th doc gets a near-dup twin
                out_i.append(i + 1_000_000)
                out_t.append(_twin_text(x))
        return pa.Table.from_arrays(
            [pa.array(out_i, pa.int64()), pa.array(out_t, pa.string())],
            names=["doc_id", "text"],
        )

    return ds.map_batches(mutate, batch_format="pyarrow")


def _twin_text(x: str | None) -> str:
    """The deterministic near-dup twin of a document (shared between the
    corpus derivation and the pushdown candidate fetch)."""
    words = (x or "").split()
    if len(words) > 10:
        words[5] = "mutated"
    return " ".join(words)


def _neardup_fetch_fn(sf_dir: str):
    """Predicate-pushdown candidate-text fetch for the derived twin corpus:
    point-reads ONLY the candidate ids' base rows from documents.parquet
    (row-group pruning via ``pc.field(...).isin``) and regenerates twin text
    with :func:`_twin_text` — never a second full corpus scan (VERDICT r2
    #6; same pattern as curation.py's fetch_candidate_texts)."""
    path = _t(sf_dir, "documents")

    def fetch(ids):
        import pyarrow.dataset as pads

        base = sorted({i - 1_000_000 if i >= 1_000_000 else int(i) for i in ids})
        tbl = pads.dataset(path, format="parquet").to_table(
            columns=["doc_id", "text"],
            filter=pc.field("doc_id").isin(base),
        )
        m = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
        return {
            int(i): (_twin_text(m.get(int(i) - 1_000_000))
                     if i >= 1_000_000 else (m.get(int(i)) or ""))
            for i in ids
        }

    return fetch


def minhash_neardup(sf_dir: str):
    return neardup.minhash_neardup_pairs(
        _docs_with_neardups(sf_dir), threshold=0.8, fetch_fn=_neardup_fetch_fn(sf_dir)
    )


def simhash_neardup(sf_dir: str):
    return neardup.simhash_neardup_pairs(_docs_with_neardups(sf_dir), max_hamming=3)


def ngram_jaccard_neardup(sf_dir: str):
    return neardup.ngram_jaccard_pairs(
        _docs_with_neardups(sf_dir), threshold=0.5, fetch_fn=_neardup_fetch_fn(sf_dir)
    )


def embedding_neardup(sf_dir: str):
    """embeddings ∪ perturbed twins → cosine ≥ 0.98 pairs."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def perturb(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_pylist()
        embs = t["embedding"].to_pylist()
        out_i = [int(i) for i in ids]
        out_e = [list(map(float, e)) for e in embs]
        for i, e in zip(ids, embs):
            if int(i) % 20 == 0:
                v = np.asarray(e, dtype=np.float64)
                v = v + 0.001 * np.sin(np.arange(len(v)) + int(i))  # deterministic nudge
                out_i.append(int(i) + 1_000_000)
                out_e.append([float(x) for x in v])
        return pa.Table.from_arrays(
            [pa.array(out_i, pa.int64()), pa.array(out_e, pa.list_(pa.float64()))],
            names=["vec_id", "embedding"],
        )

    return neardup.embedding_neardup_pairs(
        ds.map_batches(perturb, batch_format="pyarrow"), threshold=0.98
    )


def _planted_ids(sf_dir: str, *, min_long_words: int | None = None) -> pa.Array:
    """doc_ids of the planted-twin originals (≡ 0 mod 20), optionally
    restricted to docs whose exact twin-Jaccard is provably/robustly above
    the LSH threshold: n_words ≤ 10 (twin is byte-identical after whitespace
    collapse → signatures equal → always banded together, J = 1) or
    n_words ≥ ``min_long_words`` (one changed word in a long doc keeps the
    shingle Jaccard comfortably over the threshold)."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sel = ids % 20 == 0
        if min_long_words is not None:
            nw = np.array(
                [len((x or "").split()) for x in t["text"].to_pylist()], dtype=np.int64
            )
            sel &= (nw <= 10) | (nw >= min_long_words)
        return pa.Table.from_arrays([pa.array(ids[sel], pa.int64())], names=["doc_id"])

    out = []
    for b in docs.map_batches(pick, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out.extend(b.column("doc_id").to_pylist())
    return pa.array(sorted(out), pa.int64())


def _planted_subset(pairs_ds, eligible: pa.Array):
    """Near-dup pairs → just the planted-twin rows (id_b = id_a + 1e6 with
    id_a in the eligible planted set), as (id_a, id_b) — the SQL-checkable
    projection of an otherwise non-SQL-expressible LSH output."""
    ref = ray.put(eligible)

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_in(t["id_a"], value_set=ray.get(ref)),
            pc.equal(pc.subtract(t["id_b"], t["id_a"]), 1_000_000),
        )
        return t.filter(m).select(["id_a", "id_b"])

    return pairs_ds.map_batches(f, batch_format="pyarrow")


def minhash_planted_neardup(sf_dir: str):
    """Partial ORACLE for the MinHash LSH pipeline: the planted twins whose
    exact Jaccard provably clears the 0.8 threshold (byte-identical short
    docs, or ≥50-word docs where one mutated word moves J by only a few
    percent) must ALL surface — DuckDB reproduces that subset exactly.
    The full pair list stays rows-only (LSH is not SQL-expressible)."""
    pairs = neardup.minhash_neardup_pairs(
        _docs_with_neardups(sf_dir), threshold=0.8, fetch_fn=_neardup_fetch_fn(sf_dir)
    )
    return _planted_subset(pairs, _planted_ids(sf_dir, min_long_words=50))


MINHASH_PLANTED_NEARDUP_SQL = """
SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
FROM documents
WHERE doc_id % 20 = 0
  AND ((CASE WHEN trim(text) = '' THEN 0
             ELSE len(string_split_regex(trim(text), '\\s+')) END) <= 10
    OR (CASE WHEN trim(text) = '' THEN 0
             ELSE len(string_split_regex(trim(text), '\\s+')) END) >= 50)
"""


def ngram_planted_neardup(sf_dir: str):
    """Partial oracle for the word-n-gram Jaccard pipeline: with n=3 and
    threshold 0.5, EVERY planted twin is ≥ threshold by construction
    (w ≤ 10 → identical; w ≥ 11 → J = (w-5)/(w+1) ≥ 0.5), so the oracle is
    the full planted set."""
    pairs = neardup.ngram_jaccard_pairs(
        _docs_with_neardups(sf_dir), threshold=0.5, fetch_fn=_neardup_fetch_fn(sf_dir)
    )
    return _planted_subset(pairs, _planted_ids(sf_dir))


NGRAM_PLANTED_NEARDUP_SQL = """
SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
FROM documents WHERE doc_id % 20 = 0
"""


def neardup_clusters(sf_dir: str):
    """LSH pairs → connected components → per-doc cluster id (rows-only;
    planted twins must share a cluster — asserted in pytest)."""
    docs = _docs_with_neardups(sf_dir)
    pairs = neardup.minhash_neardup_pairs(
        docs, threshold=0.8, fetch_fn=_neardup_fetch_fn(sf_dir)
    )
    return neardup.cluster_pairs(docs, pairs)


def curate_corpus(sf_dir: str):
    """Composed training-data curation pipeline (rows-only): quality gates +
    language ID + exact dedup + MinHash near-dup, flag-don't-drop."""
    from ..curation import curate_documents

    return curate_documents(sf_dir)


def lang_id_documents(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return lang_id_stage(ds)


def fuzzy_reconcile_demo(sf_dir: str):
    """Generic fuzzy reconcile (J1/J2/J4/J6) over a register deterministically
    perturbed from the customer table: every 10th customer is missing from
    the register; every 7th has a perturbed amount (→ mismatch).  Memoized
    (materialized) per source fingerprint: reconcile_manual_link overlays
    the SAME verdicts, so the sweep runs the fuzzy pipeline once."""
    key = ("fuzzy_demo", sf_dir, _fingerprint(_t(sf_dir.rstrip("/"), "customer")))
    if key in _MEMO:
        return _MEMO[key]
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_acctbal"])
    pdf = cust.to_pandas()
    # vectorized register derivation (small side, but keep the idiom clean)
    k = pdf.c_custkey.astype(int)
    pdf = pdf[k % 10 != 0]
    k = pdf.c_custkey.astype(int)
    amt = pdf.c_acctbal.astype(float).abs()
    amt = amt.where(k % 7 != 0, amt * 1.5 + 10)
    register = [
        {"id": f"reg-{ki}", "vendor_name": f"{n} Inc.", "expected_amount": a}
        for ki, n, a in zip(k, pdf.c_name, amt)
    ]

    def shape(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(t["c_custkey"], pa.string()),
                t["c_name"],
                pc.abs(pc.cast(t["c_acctbal"], pa.float64())),
            ],
            names=["id", "vendor_name", "total_amount"],
        )

    invoices = cust.map_batches(shape, batch_format="pyarrow")
    _MEMO[key] = fuzzy_reconcile(invoices, register).materialize()
    return _MEMO[key]


# --------------------------------------------------- skew / paging / register

def docs_by_lang_salted(sf_dir: str):
    """Hot-key-safe groupby (≙ §4.3.1 salted keys): ``lang`` has ~5 distinct
    values over all rows — the canonical hot-key shape.  Two-level salted
    aggregation; result provably equals the plain groupby (oracle)."""
    from ...stages.skew import salted_sum_count

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "n_chars"])
    return salted_sum_count(
        ds,
        key_col="lang",
        sum_cols={"n_chars": "sum_chars"},
        count_alias="n",
        buckets=16,
    )


DOCS_BY_LANG_SALTED_SQL = """
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1
"""


def orders_page(sf_dir: str):
    """OFFSET pagination (≙ T1, server.js:363-367): page 2 of orders by
    descending total price, 20/page, deterministic tiebreak on key."""
    from ...stages.report import paginated

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    return paginated(
        ds,
        sort_keys=["o_totalprice", "o_orderkey"],
        descending=[True, False],
        limit=20,
        offset=20,
    )


ORDERS_PAGE_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 20
"""


def register_csv_normalize(sf_dir: str):
    """Lenient CSV register ingest (≙ S2, server.js:136-159): a messy CSV
    (synonym headers, '$1,234.50' amounts) deterministically derived from
    the customer table is read back through read_csv + the normalizing
    projection; the oracle recomputes the same rows straight from customer."""
    import os

    from ...functions.hashing import stable_hash64
    from ...sources.register import read_register_csv

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_acctbal"]
    ).to_pandas()
    key = stable_hash64(f"{sf_dir}|register_csv|v1")
    path = f"/tmp/iocr_register_{key:016x}.csv"
    if not os.path.exists(path):
        lines = ["Vendor,Amount,Due,Ref"]
        for _, r in cust.sort_values("c_custkey").iterrows():
            k = int(r.c_custkey)
            amt = f"${abs(float(r.c_acctbal)):,.2f}"
            lines.append(
                f'"{r.c_name}","{amt}",2024-{1 + k % 12:02d}-15,INV-{k}'
            )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
    return read_register_csv(path).select_columns(
        ["vendor_name", "expected_amount", "due_date", "reference_number", "status"]
    )


REGISTER_CSV_NORMALIZE_SQL = """
SELECT c_name AS vendor_name,
       abs(c_acctbal) AS expected_amount,
       printf('2024-%02d-15', 1 + c_custkey % 12) AS due_date,
       'INV-' || CAST(c_custkey AS VARCHAR) AS reference_number,
       'unpaid' AS status
FROM customer
"""


def media_image_features(sf_dir: str):
    """Multimodal decode plumbing (rows-only): synthetic media column →
    actor-pool ImageFeatures stage (codec stubbed, Ray plumbing real)."""
    from ...stages.multimodal import ImageFeatures, media_table_from_documents

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    media = docs.map_batches(media_table_from_documents, batch_format="pyarrow")
    images = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    return images.map_batches(
        ImageFeatures, concurrency=(1, 4), batch_size=64, batch_format="pyarrow"
    )


def media_frame_sample(sf_dir: str):
    """Video frame sampling (rows-only): 1 row per sampled frame."""
    from ...stages.multimodal import FrameSampler, media_table_from_documents

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    media = docs.map_batches(media_table_from_documents, batch_format="pyarrow")
    videos = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "video")), batch_format="pyarrow"
    )
    return videos.map_batches(
        FrameSampler, concurrency=(1, 4), batch_size=32, batch_format="pyarrow"
    )


def media_audio_features(sf_dir: str):
    from ...stages.multimodal import AudioFeatures, media_table_from_documents

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    media = docs.map_batches(media_table_from_documents, batch_format="pyarrow")
    audio = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")), batch_format="pyarrow"
    )
    return audio.map_batches(
        AudioFeatures, concurrency=(1, 4), batch_size=64, batch_format="pyarrow"
    )


def top_building_orders(sf_dir: str):
    """TPC-H-Q3-style 3-way join: BUILDING-segment customers (broadcast key
    set — semi-join, no shuffle) × date-filtered orders ⋈ lineitem (hash
    join on the order key) → revenue per order → top 10.  Composes the
    engine's two join strategies in one plan."""
    cutoff = np.datetime64("1995-06-15", "us")
    cust = rd.read_parquet(
        _t(sf_dir, "customer"),
        columns=["c_custkey"],
        filter=pc.field("c_mktsegment") == "BUILDING",
    )
    ckeys_ref = ray.put(pa.array(sorted(cust.unique("c_custkey")), pa.int64()))

    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < cutoff,
    )

    def semi(t: pa.Table) -> pa.Table:
        ks = ray.get(ckeys_ref)
        kept = t.filter(pc.is_in(t["o_custkey"], value_set=ks))
        return kept.select(["o_orderkey", "o_orderdate"])

    orders = orders.map_batches(semi, batch_format="pyarrow")

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > cutoff,
    )

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.Table.from_arrays([t["l_orderkey"], _cents(r)], names=["l_orderkey", "rev_c"])

    li = li.map_batches(rev, batch_format="pyarrow")
    joined = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    agg = joined.groupby("l_orderkey").aggregate(Sum("rev_c", alias_name="revenue_cents"))
    return agg.sort(["revenue_cents", "l_orderkey"], descending=[True, False]).limit(10)


TOP_BUILDING_ORDERS_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-06-15'
  AND l_shipdate  > TIMESTAMP '1995-06-15'
GROUP BY 1 ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
"""


def events_props_extract(sf_dir: str):
    """Semi-structured projection: pull a field out of the JSON ``props``
    column with a VECTORIZED regex kernel (``pc.extract_regex`` — no per-row
    json.loads) and aggregate it per event type."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "props"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.Table.from_arrays([t["event_type"], k], names=["event_type", "k"])

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
    )


EVENTS_PROPS_EXTRACT_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1
"""


# -------------------------------------------------- union / distinct / window

def events_union_halves(sf_dir: str):
    """``Dataset.union`` (set-op surface): two disjoint filtered reads of the
    same table unioned back, then counted — result must equal the single-scan
    count per type (oracle: UNION ALL)."""
    clicks = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_type"],
        filter=pc.field("event_type") == "click",
    )
    purchases = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_type"],
        filter=pc.field("event_type") == "purchase",
    )
    return clicks.union(purchases).groupby("event_type").aggregate(Count(alias_name="n"))


EVENTS_UNION_HALVES_SQL = """
SELECT event_type, COUNT(*) AS n FROM (
  SELECT event_type FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_type FROM events WHERE event_type = 'purchase'
) GROUP BY 1
"""


def distinct_langs(sf_dir: str):
    """``Dataset.unique`` (distinct shuffle) on a single column."""
    import pandas as pd

    vals = sorted(rd.read_parquet(_t(sf_dir, "documents"), columns=["lang"]).unique("lang"))
    return pd.DataFrame({"lang": vals})


DISTINCT_LANGS_SQL = "SELECT DISTINCT lang FROM documents"


def events_tumbling_window(sf_dir: str):
    """Windowed aggregate (custom operator class, SURVEY §2.9 note): tumbling
    7-day event-time windows per user — window id derived in ``map_batches``,
    then a composite-key groupby.  No event-time framework needed: windows
    over batch data ARE a keyed aggregation on floor(ts/size)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])
    week_us = 7 * 86400 * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        win = pc.cast(pc.floor(pc.divide(pc.cast(ts_us, pa.float64()), week_us)), pa.int64())
        return pa.Table.from_arrays(
            [t["user_id"], win, _cents(t["value"])], names=["user_id", "win", "value_c"]
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["user_id", "win"])
        .aggregate(Count(alias_name="n"), Sum("value_c", alias_name="sum_value_cents"))
    )


EVENTS_TUMBLING_WINDOW_SQL = """
SELECT user_id,
       CAST(FLOOR(epoch_us(ts) / (7*86400*1000000.0)) AS BIGINT) AS win,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


def flagship_summary(sf_dir: str):
    """Run-summary aggregate over flagship verdicts (≙ A2/A3, the reference's
    session summary reconciliationEngine.js:201-210 + dashboard
    server.js:244-257) as one row.  Rows-only (depends on extraction)."""
    import pandas as pd

    from ...stages.aggregates import dashboard_stats

    return pd.DataFrame([dashboard_stats(_flagship_materialized(sf_dir))])


def events_sessionize(sf_dir: str):
    """Gap-based session windows (the streaming-shaped op class, SURVEY §2.9
    / ray_guide streaming section): per user, sort by event time and split on
    >30-min gaps — ``groupby(user).map_groups`` with pandas windowing inside
    the sorted group.  The shuffle key is the user id; ordering is an
    explicit per-group sort, never an assumption about arrival order.
    Arrow-native per-group kernel (VERDICT r3 #5 — the asof/timeseries
    discipline): numpy diff/cumsum over the sorted int64 timestamps, user
    dtype preserved via take from the input column, never a pandas frame."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000

    def sessionize(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        ts = np.sort(ts, kind="stable")
        # session id = running count of >gap jumps; session boundaries
        brk = np.r_[True, np.diff(ts) > gap_us]
        starts = np.nonzero(brk)[0]
        ends = np.r_[starts[1:], len(ts)]
        n = len(starts)
        # take(0…0) keeps the exact input dtype for the group key
        user = g["user_id"].combine_chunks().take(pa.array(np.zeros(n, np.int64)))
        return pa.table(
            {
                "user_id": user,
                "session_idx": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends - 1], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(sessionize, batch_format="pyarrow")


EVENTS_SESSIONIZE_SQL = """
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
y AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM x)
SELECT user_id, CAST(sess AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS start_us,
       CAST(epoch_us(MAX(ts)) AS BIGINT) AS end_us
FROM y GROUP BY 1, 2
"""


def spans_exploded(sf_dir: str):
    """``flat_map``-style explode of the nested spans column (≙ M4 list<struct>
    realized flat, invoiceParser.js:69-86): one output row per span, counted
    per block kind.  Rows-only (span extraction is not SQL-expressible)."""
    v = _flagship_materialized(sf_dir).select_columns(["url", "spans"])

    def explode(t: pa.Table) -> pa.Table:
        # vectorized list explode: flatten the list<struct> column and project
        # the struct field — no per-row Python loop
        flat = pc.list_flatten(t.column("spans"))
        kinds = pc.struct_field(flat, "kind")
        return pa.Table.from_arrays([pc.cast(kinds, pa.string())], names=["kind"])

    return v.map_batches(explode, batch_format="pyarrow").groupby("kind").aggregate(
        Count(alias_name="n_spans")
    )


# ------------------------------------------- overlay / scoping / json register

def orders_patch_overlay(sf_dir: str):
    """Idempotent patch-Dataset overlay (≙ the reference's mutation surface:
    UPDATE server.js:371-427, DELETE :476-501, manual link :471-505): a small
    broadcast patch table rewrites fields / tombstones rows on read.  Every
    o_orderkey ≡ 0 (mod 97) gets status 'X' and +10 on the total; every key
    ≡ 0 (mod 251) is deleted.  The overlay is derived distributed (filter in
    map_batches), collected (it is the small side by definition — human
    corrections), then applied via stages/overlay.apply_overlay."""
    from ...stages.overlay import apply_overlay

    base = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
    )

    def mk_patches(t: pa.Table) -> pa.Table:
        ids = t["o_orderkey"].to_numpy()
        m97 = ids % 97 == 0
        m251 = ids % 251 == 0
        sel = m97 | m251
        sub = ids[sel]
        s97 = m97[sel]
        s251 = m251[sel]
        tp = t["o_totalprice"].to_numpy()[sel]
        return pa.Table.from_pydict(
            {
                "o_orderkey": pa.array(sub, pa.int64()),
                "o_orderstatus": pa.array(
                    ["X" if a and not b else None for a, b in zip(s97, s251)], pa.string()
                ),
                "o_totalprice": pa.array(
                    [v + 10.0 if a and not b else None for v, a, b in zip(tp, s97, s251)],
                    pa.float64(),
                ),
                "deleted": pa.array([bool(b) for b in s251], pa.bool_()),
            }
        )

    patch_batches = list(
        base.map_batches(mk_patches, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    overlay = pa.concat_tables(patch_batches)
    return apply_overlay(base, overlay, key_col="o_orderkey", deleted_col="deleted")


ORDERS_PATCH_OVERLAY_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 97 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 10 ELSE o_totalprice END AS o_totalprice
FROM orders WHERE o_orderkey % 251 <> 0
"""


def reconcile_manual_link(sf_dir: str):
    """Manual reconciliation links over the fuzzy verdicts (≙ manual link,
    server.js:471-505): a human corrects 'missing' verdicts by linking the
    invoice to a register record; the overlay sets match_status='matched',
    flag_reason='Manually reconciled', confidence 100.  Idempotent —
    re-applying the same links is a no-op (pytest).  Rows-only (the base
    fuzzy verdict is not SQL-expressible)."""
    from ...stages.overlay import apply_overlay, manual_link_overlay

    verdicts = fuzzy_reconcile_demo(sf_dir)
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"])
    keys = sorted(int(k) for k in cust.to_pandas().c_custkey if int(k) % 30 == 0)
    links = [{"key": str(k), "record_id": f"reg-manual-{k}"} for k in keys]
    overlay = manual_link_overlay(links, key_col="invoice_id", record_col="proposed_record_id")
    return apply_overlay(verdicts, overlay, key_col="invoice_id")


def events_user_scope(sf_dir: str):
    """Tenant scoping (≙ F7: every reference query carries ``user_id = ?``,
    e.g. server.js:356): the tenant predicate is pushed INTO the parquet
    read so other tenants' rows never leave storage."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"),
        columns=["user_id", "event_type"],
        filter=pc.field("user_id") == 7,
    )
    return ds.groupby("event_type").aggregate(Count(alias_name="n"))


EVENTS_USER_SCOPE_SQL = """
SELECT event_type, COUNT(*) AS n FROM events WHERE user_id = 7 GROUP BY 1
"""


def register_json_normalize(sf_dir: str):
    """Lenient JSON register ingest (≙ S3, server.js:455-461): synonym keys
    (company/total/due/invoice_number) in line-delimited JSON, read through
    read_json + the same normalizing projection as the CSV path; the oracle
    recomputes the rows straight from customer."""
    import json
    import os

    from ...functions.hashing import stable_hash64
    from ...sources.register import read_register_json

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_acctbal"]
    ).to_pandas()
    # cache key includes a fingerprint of the source parquet (size+mtime) so
    # regenerating testdata in place can never feed a stale cached register
    src = _t(sf_dir, "customer")
    st = os.stat(src)
    key = stable_hash64(f"{sf_dir}|register_json|v1|{st.st_size}|{st.st_mtime_ns}")
    path = f"/tmp/iocr_register_{key:016x}.json"
    if not os.path.exists(path):
        lines = []
        for _, r in cust.sort_values("c_custkey").iterrows():
            k = int(r.c_custkey)
            lines.append(
                json.dumps(
                    {
                        "company": str(r.c_name),
                        "total": abs(float(r.c_acctbal)),
                        "due": f"2024-{1 + k % 12:02d}-15",
                        "invoice_number": f"INV-{k}",
                    }
                )
            )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
    return read_register_json(path).select_columns(
        ["vendor_name", "expected_amount", "due_date", "reference_number", "status"]
    )


REGISTER_JSON_NORMALIZE_SQL = """
SELECT c_name AS vendor_name,
       abs(c_acctbal) AS expected_amount,
       printf('2024-%02d-15', 1 + c_custkey % 12) AS due_date,
       'INV-' || CAST(c_custkey AS VARCHAR) AS reference_number,
       'unpaid' AS status
FROM customer
"""


def events_asof_orders(sf_dir: str):
    """Backward as-of join (custom operator, stages/asof.py): every event is
    enriched with the customer's most recent order AT event time (greatest
    o_orderdate ≤ ts, ties → max o_orderkey).  Co-partition by key via one
    union + groupby shuffle, per-group sorted merge_asof.  Oracle: the
    row_number() formulation of the same join in DuckDB."""
    from ...stages.asof import asof_join_backward

    events = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.rename_columns(["o_orderkey", "user_id", "o_orderdate"]),
        batch_format="pyarrow",
    )
    out = asof_join_backward(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        left_cols=["event_id"],
        right_cols=["o_orderkey"],
        tiebreak="o_orderkey",
    )
    return out.map_batches(
        lambda t: t.rename_columns(["event_id", "asof_orderkey"]), batch_format="pyarrow"
    )


def orders_priority_quantile_kmv(sf_dir: str):
    """Per-GROUP approximate quantiles from a mergeable KMV bottom-k sample
    (stages/sketch_stats.py:grouped_approx_quantiles_kmv): quartiles of
    order price cents per priority.  k=4096 exceeds every group's row count
    at oracle scale, so the sketch degrades gracefully to EXACT
    quantile_disc there (full value parity, the ann_ivf_exact_fullprobe
    trick); at 100 TB the same op is a fixed O(keys·k) budget with
    ±O(1/√k) rank error.  Values stay integer cents (exactly representable
    in the float64 sample)."""
    from ...stages.sketch_stats import grouped_approx_quantiles_kmv

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderkey": t["o_orderkey"],
                "cents": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    out = grouped_approx_quantiles_kmv(
        ds,
        key_col="o_orderpriority",
        id_col="o_orderkey",
        val_col="cents",
        qs=[0.25, 0.5, 0.75],
        k=4096,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "q": t["q"],
                "value_est": pc.cast(t["value_est"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


ORDERS_PRIORITY_QUANTILE_KMV_SQL = """
WITH c AS (SELECT o_orderpriority,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders)
SELECT o_orderpriority, CAST(0.25 AS DOUBLE) AS q,
       CAST(quantile_disc(cents, 0.25) AS BIGINT) AS value_est
FROM c GROUP BY 1
UNION ALL
SELECT o_orderpriority, CAST(0.5 AS DOUBLE),
       CAST(quantile_disc(cents, 0.5) AS BIGINT) FROM c GROUP BY 1
UNION ALL
SELECT o_orderpriority, CAST(0.75 AS DOUBLE),
       CAST(quantile_disc(cents, 0.75) AS BIGINT) FROM c GROUP BY 1
"""


def events_asof_big_orders_left(sf_dir: str):
    """LEFT-outer backward as-of join (completes the as-of family's join
    types): every event keeps its row even when the customer has NO
    qualifying big order (> $450k) at event time — unmatched rows carry a
    typed NULL that both engines COALESCE to -1 (the r2 null-padding lesson
    applied to the OUTER side).  Same one-shuffle co-partition layout."""
    from ...stages.asof import asof_join

    events = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "user_id": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
            }
        ).filter(pc.greater(t["o_totalprice"], 450000.0)),
        batch_format="pyarrow",
    )
    out = asof_join(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        left_cols=["event_id"],
        right_cols=["o_orderkey"],
        tiebreak="o_orderkey",
        how="left",
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "asof_orderkey": pc.coalesce(
                    pc.cast(t["o_orderkey"], pa.int64()), pa.scalar(-1, pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_ASOF_BIG_ORDERS_LEFT_SQL = """
WITH f AS (SELECT * FROM orders WHERE o_totalprice > 450000),
m AS (
  SELECT e.event_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN f o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
SELECT e.event_id, COALESCE(m.o_orderkey, -1) AS asof_orderkey
FROM events e
LEFT JOIN (SELECT event_id, o_orderkey FROM m WHERE rn = 1) m USING (event_id)
"""


EVENTS_ASOF_ORDERS_SQL = """
WITH m AS (
  SELECT e.event_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
SELECT event_id, o_orderkey AS asof_orderkey FROM m WHERE rn = 1
"""


def events_range_join_orders(sf_dir: str):
    """Trailing-window range join (custom operator, stages/asof.py): per
    event, the number of the customer's orders in the 30 days up to the
    event (exclusive-open lower bound, inclusive upper).  Co-partition by
    key + two vectorized searchsorted probes per group — never the O(l·r)
    interval blow-up.  Oracle: correlated COUNT in DuckDB."""
    from ...stages.asof import range_join_count

    events = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.rename_columns(["user_id", "o_orderdate"]), batch_format="pyarrow"
    )
    return range_join_count(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        left_cols=["event_id"],
        window_us=30 * 86400 * 1_000_000,
        out_col="n_orders_30d",
    )


EVENTS_RANGE_JOIN_ORDERS_SQL = """
SELECT e.event_id,
       (SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey = e.user_id
          AND o.o_orderdate > e.ts - INTERVAL 30 DAY
          AND o.o_orderdate <= e.ts) AS n_orders_30d
FROM events e
"""


# --------------------------------------------------- corpus stats / sampling

def top_terms(sf_dir: str):
    """Corpus vocabulary stats — the explode-then-count shape every
    pretraining pipeline runs (token frequency tables): tokenize in
    map_batches (vectorized split), PRE-AGGREGATE per block with pyarrow
    ``group_by`` (the combiner — block output is |block vocab| rows, not
    |tokens|), then one small groupby merge and top-50.  The pre-aggregation
    is what keeps the shuffle O(vocab), not O(corpus tokens), at 100 TB."""
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
    )
    return agg.sort(["n", "term"], descending=[True, False]).limit(50)


TOP_TERMS_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents)
SELECT term, COUNT(*) AS n FROM toks WHERE term <> ''
GROUP BY 1 ORDER BY n DESC, term LIMIT 50
"""


def docs_hash_sample(sf_dir: str):
    """Deterministic corpus subsampling — keep rows whose stable content-key
    hash lands under the rate (≙ the reproducible train/eval split every
    data pipeline needs; never ``random_sample``, which is seed/partitioning
    dependent).  Hash = md5 of the doc id decimal string, first 8 hex digits
    mod 100 < 10 → a 10% sample ANY engine can reproduce."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def pick(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t["doc_id"].to_pylist()
        keep = [
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 < 10
            for i in ids
        ]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(pick, batch_format="pyarrow")


DOCS_HASH_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 < 10
"""


def dedup_incremental(sf_dir: str):
    """Incremental-ingest dedup (stages/dedup.flag_seen_before): the 'new
    batch' (doc_id ≥ 250) is flagged against the standing corpus's content
    fingerprints (doc_id < 250) — prior keys reduced to a distinct set via
    per-block partials, broadcast once, probed vectorized.  The shape every
    continuously-crawled corpus needs: dedup new data against what's already
    ingested without re-processing the corpus."""
    from ...stages.dedup import flag_seen_before
    from ...stages.text_analysis import fingerprint_stage

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    fps = fingerprint_stage(docs).select_columns(["doc_id", "fp_md5"])
    prior = fps.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], 250)), batch_format="pyarrow"
    )
    new = fps.map_batches(
        lambda t: t.filter(pc.greater_equal(t["doc_id"], 250)), batch_format="pyarrow"
    )
    out = flag_seen_before(new, prior, key_col="fp_md5")
    return out.select_columns(["doc_id", "seen_before"])


DEDUP_INCREMENTAL_SQL = """
SELECT d.doc_id,
       EXISTS (SELECT 1 FROM documents p
               WHERE p.doc_id < 250 AND md5(p.text) = md5(d.text)) AS seen_before
FROM documents d WHERE d.doc_id >= 250
"""


def docs_stratified_sample(sf_dir: str):
    """Stratified deterministic sampling — k docs PER LANGUAGE, ordered by a
    content-stable hash (≙ the balanced eval-split / per-domain quota shape;
    per-group top-k is T4's distributed form: groupby(lang) + in-group sort
    + slice, one shuffle on the strata key)."""
    import hashlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def add_h(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(str(i).encode()).hexdigest() for i in t["doc_id"].to_pylist()
        ]
        return t.append_column("h", pa.array(hs, pa.string()))

    def topk(g: pa.Table) -> pa.Table:
        return g.sort_by([("h", "ascending")]).slice(0, 5).select(["doc_id", "lang"])

    return (
        ds.map_batches(add_h, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(topk, batch_format="pyarrow")
    )


DOCS_STRATIFIED_SAMPLE_SQL = """
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rn
  FROM documents)
SELECT doc_id, lang FROM r WHERE rn <= 5
"""


# ------------------------------------------------------------------ registry

# ---------------------------------------------- corpus stats / quality gates

def quality_flags_c4(sf_dir: str):
    """C4/Gopher-style quality gates over documents (flag-don't-drop):
    µ-scaled integer ratios so the DuckDB oracle is bit-exact."""
    from ...stages.text_analysis import quality_flags_stage

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return quality_flags_stage(ds)


QUALITY_FLAGS_C4_SQL = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
         length(regexp_replace(text, '\\s', '', 'g')) AS wc,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
             x -> x IN ('the','a','an','of','to','in','and','is','on','for'))) AS n_stop,
         len(list_distinct(list_filter(
             string_split_regex(lower(trim(text)), '\\s+'), x -> x <> ''))) AS n_distinct
  FROM documents),
m AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words = 0 THEN 0
              ELSE CAST(FLOOR(wc * 1000000.0 / n_words) AS BIGINT) END AS mwl_u,
         CASE WHEN n_words = 0 THEN 0
              ELSE CAST(FLOOR(n_stop * 1000000.0 / n_words) AS BIGINT) END AS stop_u,
         CASE WHEN n_words = 0 THEN 0
              ELSE CAST(FLOOR((n_words - n_distinct) * 1000000.0 / n_words) AS BIGINT)
              END AS dupword_u
  FROM b)
SELECT doc_id, n_words, mwl_u, stop_u, dupword_u,
       (n_words >= 20 AND n_words <= 100000
        AND mwl_u BETWEEN 2000000 AND 12000000
        AND stop_u >= 10000 AND dupword_u <= 900000) AS kept
FROM m
"""


def chunk_dedup_docs(sf_dir: str):
    """Paragraph-granularity exact dedup (CCNet/C4 shape) on 10-word chunks:
    per doc, how many chunks already appeared in an earlier doc.  Winner map
    over chunk fingerprints (per-block partials + broadcast, shuffle-free —
    stages/corpus_stats.py)."""
    from ...stages.corpus_stats import chunk_dedup_stats

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return chunk_dedup_stats(ds, chunk_words=10)


CHUNK_DEDUP_DOCS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '[^a-z0-9]+') AS l
  FROM documents),
pos AS (
  SELECT doc_id, unnest(list_zip(l, generate_series(1, len(l)))) AS z FROM toks),
pos1 AS (SELECT doc_id, z[1] AS w, CAST(z[2] AS BIGINT) AS i FROM pos),
pos2 AS (
  SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
  FROM pos1 WHERE w <> ''),
chunks AS (
  SELECT doc_id, (j-1)//10 AS chunk_id, string_agg(w, ' ' ORDER BY j) AS chunk
  FROM pos2 GROUP BY 1, 2),
owner AS (SELECT chunk, min(doc_id) AS first_doc FROM chunks GROUP BY 1),
have AS (
  SELECT c.doc_id, COUNT(*) AS n_chunks,
         COUNT(*) FILTER (WHERE o.first_doc < c.doc_id) AS n_dup_chunks
  FROM chunks c JOIN owner o USING (chunk) GROUP BY 1)
SELECT d.doc_id, COALESCE(h.n_chunks, 0) AS n_chunks,
       COALESCE(h.n_dup_chunks, 0) AS n_dup_chunks
FROM documents d LEFT JOIN have h USING (doc_id)
"""


def doc_tfidf_top3(sf_dir: str):
    """Per-document top-3 TF-IDF terms (two-pass: block-partial document
    frequencies merged + broadcast, then per-doc scoring — O(vocab) driver
    bound documented in stages/corpus_stats.py).  Score is µ-scaled int so
    the SQL oracle is bit-exact; ties break term ASC."""
    from ...stages.corpus_stats import tfidf_topk

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return tfidf_topk(ds, k=3)


DOC_TFIDF_TOP3_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '[^a-z0-9]+')) AS w
  FROM documents),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok WHERE w <> '' GROUP BY 1, 2),
df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok WHERE w <> '' GROUP BY 1),
nd AS (SELECT COUNT(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.w AS term,
             CAST(FLOOR(tf.tf * (ln((nd.n + 1.0) / (df.df + 1.0)) + 1.0)
                        * 1000000.0) AS BIGINT) AS score_u
      FROM tf JOIN df USING (w) CROSS JOIN nd),
r AS (SELECT doc_id, term, score_u,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_u DESC, term) AS rk
      FROM s)
SELECT doc_id, term, score_u, rk FROM r WHERE rk <= 3
"""


def orders_price_quantiles(sf_dir: str):
    """Exact discrete quantiles of o_totalprice via the histogram-partition
    + targeted-refinement selection (three streaming passes, no shuffle, no
    global sort — stages/quantiles.py).  quantile_disc semantics."""
    from ...stages.quantiles import exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])
    return exact_quantiles(ds, "o_totalprice", [0.25, 0.5, 0.75, 0.9, 0.99])


ORDERS_PRICE_QUANTILES_SQL = """
WITH s AS (SELECT quantile_disc(o_totalprice, [0.25, 0.5, 0.75, 0.9, 0.99]) AS v
           FROM orders)
SELECT CAST(z[1] AS DOUBLE) AS q, CAST(z[2] AS DOUBLE) AS value
FROM (SELECT unnest(list_zip([0.25, 0.5, 0.75, 0.9, 0.99], v)) AS z FROM s)
"""


def events_sliding_window(sf_dir: str):
    """Sliding windows (30 min length, 10 min hop): each event lands in
    exactly 3 windows — flat per-block expansion with a block-local combiner
    (pre-aggregated (window, n) partials), then one small groupby merge.
    Complements the tumbling and session windows."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def expand(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // 1_000_000) // 600 * 600
        wins = np.concatenate([base, base - 600, base - 1200])
        uniq, counts = np.unique(wins, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(uniq, pa.int64()), pa.array(counts, pa.int64())],
            names=["w_start", "n"],
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("w_start")
        .aggregate(Sum("n", alias_name="n"))
    )


EVENTS_SLIDING_WINDOW_SQL = """
SELECT CAST(floor(epoch(e.ts) / 600) * 600 - i.off AS BIGINT) AS w_start,
       COUNT(*) AS n
FROM events e CROSS JOIN (VALUES (0), (600), (1200)) i(off)
GROUP BY 1
"""



# --------------------------------------------------- per-key window functions

def events_user_cumsum(sf_dir: str):
    """Running total per key (SUM OVER PARTITION BY … ORDER BY …): one
    groupby(key) co-partition, per-group sort + vectorized cumsum.  Money is
    integer cents (half-up) so the running sum is integer-exact and
    order-stable on both sides (CLAUDE.md money-oracle discipline)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def cum(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        cents = np.floor(
            s["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.Table.from_arrays(
            [
                s["event_id"],
                s["user_id"],
                pa.array(np.cumsum(cents), pa.int64()),
            ],
            names=["event_id", "user_id", "cum_cents"],
        )

    return ds.groupby("user_id").map_groups(cum, batch_format="pyarrow")


EVENTS_USER_CUMSUM_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS cum_cents
FROM events
"""


def events_time_deltas(sf_dir: str):
    """lag() — time since the previous event of the same user (µs; first
    event per user → NULL).  Same co-partition + per-group sort shape."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def delta(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        us = s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = np.empty(len(us), dtype=np.float64)
        d[0] = np.nan
        d[1:] = (us[1:] - us[:-1]).astype(np.float64)
        return pa.Table.from_arrays(
            [
                s["event_id"],
                s["user_id"],
                pa.array(d, from_pandas=True).cast(pa.int64()),  # NaN → null
            ],
            names=["event_id", "user_id", "delta_us"],
        )

    return ds.groupby("user_id").map_groups(delta, batch_format="pyarrow")


EVENTS_TIME_DELTAS_SQL = """
SELECT event_id, user_id,
       CAST(epoch_us(ts) - lag(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS delta_us
FROM events
"""


def events_user_type_diversity(sf_dir: str):
    """COUNT(DISTINCT …) per group: block-local (user, type) dedup partials
    (pyarrow group_by) shrink the shuffle to |user×type| rows, then one
    groupby counts distinct types per user."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return (
            pa.Table.from_arrays(
                [t["user_id"], t["event_type"]], names=["user_id", "event_type"]
            )
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )

    def count_types(g: pa.Table) -> pa.Table:
        n = len(set(g["event_type"].to_pylist()))
        return pa.Table.from_arrays(
            [g["user_id"].slice(0, 1), pa.array([n], pa.int64())],
            names=["user_id", "n_types"],
        )

    return (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(count_types, batch_format="pyarrow")
    )


EVENTS_USER_TYPE_DIVERSITY_SQL = """
SELECT user_id, COUNT(DISTINCT event_type) AS n_types FROM events GROUP BY 1
"""


def orders_median_by_priority(sf_dir: str):
    """Per-group exact median (quantile_disc 0.5 semantics: the element at
    1-based rank ceil(n/2) of the sorted group).  Groups here are few and
    bounded (5 priorities) so a per-group sort in map_groups is the right
    shape; an unbounded group would use stages/quantiles.exact_quantiles
    per partition instead."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"]
    )

    def med(g: pa.Table) -> pa.Table:
        v = np.sort(g["o_totalprice"].to_numpy(zero_copy_only=False))
        m = v[int(np.ceil(0.5 * len(v))) - 1]
        return pa.Table.from_arrays(
            [g["o_orderpriority"].slice(0, 1), pa.array([float(m)], pa.float64())],
            names=["o_orderpriority", "median_price"],
        )

    return ds.groupby("o_orderpriority").map_groups(med, batch_format="pyarrow")


ORDERS_MEDIAN_BY_PRIORITY_SQL = """
SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5) AS median_price
FROM orders GROUP BY 1
"""


def _skyline_2d(price: "np.ndarray", day: "np.ndarray") -> "np.ndarray":
    """Boolean keep-mask for the maximize-both 2-D skyline: a point survives
    iff no OTHER point is >= on both axes and > on at least one.  O(n log n):
    sort by (price desc, day desc); a point is dominated iff some
    strictly-higher-price point has day >= its day, OR an equal-price point
    has day > its day (equal-price groups share the same running max from
    prior groups, computed per group)."""
    n = len(price)
    keep = np.ones(n, dtype=bool)
    order = np.lexsort((-day, -price))
    p, d = price[order], day[order]
    best_day_before = -np.inf  # max day among strictly-higher-price points
    i = 0
    while i < n:
        j = i
        while j < n and p[j] == p[i]:
            j += 1
        grp_d = d[i:j]
        grp_max = grp_d.max()
        # dominated by a higher-price point with day >= mine,
        # or by an equal-price point with day > mine
        dominated = (grp_d <= best_day_before) | (grp_d < grp_max)
        keep[order[i:j]] = ~dominated
        best_day_before = max(best_day_before, grp_max)
        i = j
    return keep


def orders_skyline(sf_dir: str):
    """2-D SKYLINE / Pareto front (maximize price AND recency over finished
    orders) — the dominance-query family.  The distributed shape exploits
    skyline algebra: skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B), so a
    block-local skyline prune is LOSSLESS; survivors (tiny — the front of a
    random 2-D set is ~O(log n)) merge on the driver with the same kernel.
    Per-block kernel is O(n log n) lexsort, no Python loop over rows beyond
    the equal-price group walk."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"],
        filter=pc.field("o_orderstatus") == "F",
    )

    def prep_and_prune(t: pa.Table) -> pa.Table:
        price = _cents(t["o_totalprice"]).combine_chunks().to_numpy()
        day = (
            pc.cast(pc.cast(t["o_orderdate"], pa.date32()), pa.int32())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        tb = pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "price_cents": pa.array(price, pa.int64()),
                "epoch_day": pa.array(day, pa.int64()),
            }
        )
        if tb.num_rows == 0:
            return tb
        return tb.filter(pa.array(_skyline_2d(price, day)))

    survivors = pa.concat_tables(
        list(
            ds.map_batches(prep_and_prune, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    if survivors.num_rows == 0:
        return survivors
    keep = _skyline_2d(
        survivors["price_cents"].combine_chunks().to_numpy(),
        survivors["epoch_day"].combine_chunks().to_numpy(),
    )
    return survivors.filter(pa.array(keep)).sort_by(
        [("price_cents", "descending"), ("o_orderkey", "ascending")]
    )


ORDERS_SKYLINE_SQL = """
WITH f AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS epoch_day
  FROM orders WHERE o_orderstatus = 'F')
SELECT o_orderkey, price_cents, epoch_day
FROM f o1
WHERE NOT EXISTS (
  SELECT 1 FROM f o2
  WHERE o2.price_cents >= o1.price_cents AND o2.epoch_day >= o1.epoch_day
    AND (o2.price_cents > o1.price_cents OR o2.epoch_day > o1.epoch_day))
ORDER BY price_cents DESC, o_orderkey
"""


def orders_decile_report(sf_dir: str):
    """Decile table (rank-then-aggregate reporting): exact global ntile(10)
    over order price (stages/rank.py value-range buckets — no global sort),
    then per-tile min/max/sum/count in exact cents via one tiny groupby."""
    from ...stages.rank import global_value_rank

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"], "price_cents": _cents(t["o_totalprice"])}
        ),
        batch_format="pyarrow",
    )
    tiled = global_value_rank(
        ds, value_col="price_cents", id_col="o_orderkey", ntile_k=10
    )

    def part(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "tile": t["tile"],
                "cents": t["price_cents"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("tile").aggregate(
            [("cents", "min"), ("cents", "max"), ("cents", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["tile", "lo", "hi", "s", "n"])

    return (
        tiled.map_batches(part, batch_format="pyarrow")
        .groupby("tile")
        .aggregate(
            Min("lo", alias_name="min_cents"),
            Max("hi", alias_name="max_cents"),
            Sum("s", alias_name="sum_cents"),
            Sum("n", alias_name="n_orders"),
        )
        .sort(["tile"])
    )


ORDERS_DECILE_REPORT_SQL = """
WITH p AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
  FROM orders),
t AS (
  SELECT price_cents,
         CAST(ntile(10) OVER (ORDER BY price_cents, o_orderkey) AS BIGINT)
           AS tile
  FROM p)
SELECT tile,
       CAST(MIN(price_cents) AS BIGINT) AS min_cents,
       CAST(MAX(price_cents) AS BIGINT) AS max_cents,
       CAST(SUM(price_cents) AS BIGINT) AS sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM t GROUP BY 1 ORDER BY 1
"""


def docs_phrase_search(sf_dir: str):
    """Word-boundary PHRASE search over the corpus (F6 substring search
    extended to full-text semantics): docs containing the exact two-word
    phrase, found by one vectorized match on the space-padded normalized
    text — no tokenization pass, no index; the postings-list path
    (``term_postings``) is the repeated-query alternative."""
    phrase = "the fast"
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def hit(t: pa.Table) -> pa.Table:
        txt = pc.binary_join_element_wise(
            " ", pc.cast(t["text"], pa.string()), " ", ""
        )
        m = pc.match_substring(txt, f" {phrase} ")
        out = pa.table({"doc_id": t["doc_id"], "m": m})
        return out.filter(out["m"]).select(["doc_id"])

    return ds.map_batches(hit, batch_format="pyarrow").sort(["doc_id"])


DOCS_PHRASE_SEARCH_SQL = """
SELECT doc_id FROM documents
WHERE ' ' || text || ' ' LIKE '% the fast %'
ORDER BY doc_id
"""


def nation_pair_trade_volume(sf_dir: str):
    """TPC-H Q7-shape nation-PAIR trade flow: revenue between every
    (supplier nation, customer nation) pair per ship-year, cross-border
    only.  Ray plan: supplier→nation collapses to one broadcast array pair
    (``index_in`` probe); customer nation reaches the fact through the two
    hash joins the plan genuinely needs (orders⨝customer on custkey, then
    lineitem⨝that on orderkey — both ``Dataset.join`` at the measured-
    optimal 8 partitions); the pair inequality is a vectorized post-join
    mask and the final (25·24·years)-row aggregate is tiny."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nat_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    sup = pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    lookup_ref = ray.put(
        {
            "keys": pc.cast(sup["s_suppkey"], pa.int64()).combine_chunks(),
            "nats": pc.cast(sup["s_nationkey"], pa.int64()).combine_chunks(),
        }
    )

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {"c_custkey": t["c_custkey"], "c_nat": pc.cast(t["c_nationkey"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    oc = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]).join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def lprep(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        idx = pc.index_in(t["l_suppkey"], value_set=lk["keys"])
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "s_nat": pc.take(lk["nats"], idx),
                "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "rev_c": _cents(rev),
            }
        )

    joined = li.map_batches(lprep, batch_format="pyarrow").join(
        oc,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def cross_border(t: pa.Table) -> pa.Table:
        out = t.filter(pc.not_equal(t["s_nat"], t["c_nat"]))
        return out.select(["s_nat", "c_nat", "l_year", "rev_c"])

    agg = (
        joined.map_batches(cross_border, batch_format="pyarrow")
        .groupby(["s_nat", "c_nat", "l_year"])
        .aggregate(Sum("rev_c", alias_name="rev_cents"), Count(alias_name="n_items"))
        .to_pandas()
    )
    agg["supp_nation"] = agg["s_nat"].map(lambda k: nat_name[int(k)])
    agg["cust_nation"] = agg["c_nat"].map(lambda k: nat_name[int(k)])
    agg = agg.sort_values(["supp_nation", "cust_nation", "l_year"], kind="mergesort")
    return pa.table(
        {
            "supp_nation": pa.array(agg["supp_nation"].tolist(), pa.string()),
            "cust_nation": pa.array(agg["cust_nation"].tolist(), pa.string()),
            "l_year": pa.array(agg["l_year"].to_numpy().astype(np.int64)),
            "rev_cents": pa.array(agg["rev_cents"].to_numpy().astype(np.int64)),
            "n_items": pa.array(agg["n_items"].to_numpy().astype(np.int64)),
        }
    )


NATION_PAIR_TRADE_VOLUME_SQL = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS rev_cents,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_nationkey <> nc.n_nationkey
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def market_share_by_year(sf_dir: str):
    """TPC-H Q8-shape market share: within orders of ASIA-region customers,
    the yearly revenue share supplied by one target nation.  Numerator and
    denominator stay exact integer cents end-to-end; the published share is
    ONE IEEE double division on each side (the fixed-expression policy that
    keeps ratio oracles hashable).  Customer is pre-FILTERED to region
    nations before its hash join (semi-join pushdown); the target-supplier
    flag rides the broadcast probe so no third join is needed."""
    import pyarrow.parquet as pq

    nat = pq.read_table(_t(sf_dir, "nation")).to_pandas()
    reg = pq.read_table(_t(sf_dir, "region")).to_pandas()
    asia = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"]
    asia_set = pa.array(sorted(int(k) for k in asia["n_nationkey"]), pa.int64())
    target_key = int(nat[nat["n_name"] == "NATION_2"]["n_nationkey"].iloc[0])

    sup = pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    lookup_ref = ray.put(
        {
            "keys": pc.cast(sup["s_suppkey"], pa.int64()).combine_chunks(),
            "is_t": pc.cast(
                pc.equal(pc.cast(sup["s_nationkey"], pa.int64()), target_key), pa.int64()
            ).combine_chunks(),
        }
    )

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int64()), value_set=asia_set)
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    oc = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def lprep(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        idx = pc.index_in(t["l_suppkey"], value_set=lk["keys"])
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "is_t": pc.take(lk["is_t"], idx),
                "rev_c": _cents(rev),
            }
        )

    joined = li.map_batches(lprep, batch_format="pyarrow").join(
        oc,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def part(t: pa.Table) -> pa.Table:
        num = pc.multiply(t["is_t"], t["rev_c"])
        return pa.table({"o_year": t["o_year"], "num_c": num, "den_c": t["rev_c"]})

    agg = (
        joined.map_batches(part, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("num_c", alias_name="num_cents"), Sum("den_c", alias_name="den_cents"))
        .sort(["o_year"])
        .to_pandas()
    )
    num = agg["num_cents"].to_numpy().astype(np.int64)
    den = agg["den_cents"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "o_year": pa.array(agg["o_year"].to_numpy().astype(np.int64)),
            "num_cents": pa.array(num),
            "den_cents": pa.array(den),
            "mkt_share": pa.array(num.astype(np.float64) / den.astype(np.float64)),
        }
    )


MARKET_SHARE_BY_YEAR_SQL = """
WITH f AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT) AS rev_c,
         CASE WHEN ns.n_name = 'NATION_2' THEN 1 ELSE 0 END AS is_t
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer c ON o_custkey = c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r  ON nc.n_regionkey = r.r_regionkey
  JOIN supplier s ON l_suppkey = s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE r.r_name = 'ASIA')
SELECT o_year,
       CAST(SUM(is_t * rev_c) AS BIGINT) AS num_cents,
       CAST(SUM(rev_c) AS BIGINT) AS den_cents,
       CAST(CAST(SUM(is_t * rev_c) AS BIGINT) AS DOUBLE)
         / CAST(CAST(SUM(rev_c) AS BIGINT) AS DOUBLE) AS mkt_share
FROM f GROUP BY 1 ORDER BY 1
"""


def top_revenue_suppliers(sf_dir: str):
    """TPC-H Q15-shape argmax-vs-max: supplier(s) whose total revenue equals
    the GLOBAL maximum (ALL ties returned — the filter-by-global-scalar
    pattern, not a top-1 sort-limit which would drop ties).  Block-local
    per-supplier partials → one small groupby, materialized NARROW so the
    max pass and the equality filter re-read it without re-scanning the
    fact; winner names arrive by a point-filtered dimension read."""
    import pyarrow.parquet as pq

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_suppkey", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        tb = pa.table({"l_suppkey": t["l_suppkey"], "c": _cents(rev)})
        g = tb.group_by("l_suppkey").aggregate([("c", "sum")])
        return g.rename_columns(["l_suppkey", "c"])

    revs = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("c", alias_name="total_rev_cents"))
        .materialize()
    )
    mx = int(revs.max("total_rev_cents"))
    win = revs.map_batches(
        lambda t: t.filter(pc.equal(t["total_rev_cents"], mx)),
        batch_format="pyarrow",
    ).to_pandas()

    sup = pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    keys = pa.array(win["l_suppkey"].to_numpy().astype(np.int64))
    sup = sup.filter(pc.is_in(pc.cast(sup["s_suppkey"], pa.int64()), value_set=keys))
    out = (
        sup.to_pandas()
        .merge(win, left_on="s_suppkey", right_on="l_suppkey")
        .sort_values("s_suppkey", kind="mergesort")
    )
    return pa.table(
        {
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy().astype(np.int64)),
            "s_name": pa.array(out["s_name"].tolist(), pa.string()),
            "total_rev_cents": pa.array(out["total_rev_cents"].to_numpy().astype(np.int64)),
        }
    )


TOP_REVENUE_SUPPLIERS_SQL = """
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_rev_cents
  FROM lineitem GROUP BY 1)
SELECT s_suppkey, s_name, total_rev_cents
FROM supplier JOIN r ON s_suppkey = l_suppkey
WHERE total_rev_cents = (SELECT MAX(total_rev_cents) FROM r)
ORDER BY s_suppkey
"""


def small_quantity_revenue(sf_dir: str):
    """TPC-H Q17-shape correlated per-key mean gate: lineitems with
    l_quantity strictly below 0.2× their own PART's mean quantity, reduced
    to (count, Σprice).  The per-part mean never exists as a float — the
    gate is the integer cross-multiplication ``5·q·n < Σq`` (quantities in
    exact hundredths), so Ray and DuckDB agree bit-for-bit at the boundary.
    Per-part stats come from block partials + one keyed groupby; the gate
    applies after a partkey-co-partitioned ``Dataset.join`` (the per-KEY
    domain scales with |part|, so no broadcast — unlike the small
    brand-domain sibling ``parts_above_brand_avg``)."""
    li_stats = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "pk": t["l_partkey"],
                "qc": _cents(t["l_quantity"]),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("pk").aggregate([("qc", "sum"), ("one", "sum")])
        return g.rename_columns(["pk", "s", "n"])

    pstats = (
        li_stats.map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("s", alias_name="sum_qc"), Sum("n", alias_name="n_li"))
    )

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "qc": _cents(t["l_quantity"]),
                "price_c": _cents(t["l_extendedprice"]),
            }
        ),
        batch_format="pyarrow",
    )

    joined = li.join(
        pstats,
        join_type="inner",
        num_partitions=8,
        on=("l_partkey",),
        right_on=("pk",),
    )

    def gate(t: pa.Table) -> pa.Table:
        lhs = pc.multiply(pc.multiply(t["qc"], pa.scalar(5, pa.int64())), t["n_li"])
        out = t.filter(pc.less(lhs, t["sum_qc"]))
        return pa.table(
            {
                "one": pa.array(np.ones(out.num_rows, np.int64)),
                "price_c": out["price_c"],
            }
        )

    agg = joined.map_batches(gate, batch_format="pyarrow").aggregate(
        Sum("one", alias_name="n_small"), Sum("price_c", alias_name="sum_price_cents")
    )
    return pa.table(
        {
            "n_small": pa.array([int(agg["n_small"] or 0)]),
            "sum_price_cents": pa.array([int(agg["sum_price_cents"] or 0)]),
        }
    )


SMALL_QUANTITY_REVENUE_SQL = """
WITH q AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qc,
         COUNT(*) AS n_li
  FROM lineitem GROUP BY 1)
SELECT COUNT(*) AS n_small,
       CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)), 0) AS BIGINT)
         AS sum_price_cents
FROM lineitem JOIN q USING (l_partkey)
WHERE 5 * CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) * n_li < sum_qc
"""


def docs_top_bigram_fraction(sf_dir: str):
    """Gopher-style top-2-gram repetition signal: per document, the share of
    bigram occurrences taken by that document's MOST FREQUENT bigram
    (µ-scaled integer ppm so the oracle comparison is exact).  A document is
    one row, so the whole signal — tokenize, within-doc adjacency pairing,
    per-(doc,bigram) count, per-doc max/total — is BLOCK-LOCAL with zero
    shuffle; the adjacency pairing is two array slices + one boundary mask
    (no per-row loop).  Complements ``docs_token_diversity`` (unigram
    repetition) as the Gopher repetition-filter pair."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()), pattern=r"[^a-z0-9]+"
        )
        terms = lst.flatten()
        ids = t["doc_id"].combine_chunks().take(lst.value_parent_indices())
        tb = pa.table({"doc_id": ids, "term": terms}).filter(pc.not_equal(terms, ""))
        ids_np = tb["doc_id"].to_numpy()
        terms_c = tb["term"].combine_chunks()
        n = len(terms_c)
        if n < 2:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "top_count": pa.array([], pa.int64()),
                    "top_ppm": pa.array([], pa.int64()),
                }
            )
        # adjacent (i, i+1) pairs that stay inside one document
        mask = pa.array(ids_np[:-1] == ids_np[1:])
        big = pc.binary_join_element_wise(
            terms_c.slice(0, n - 1), terms_c.slice(1), " "
        )
        pairs = pa.table(
            {"doc_id": pa.array(ids_np[:-1]), "bg": big}
        ).filter(mask)
        c = pairs.group_by(["doc_id", "bg"]).aggregate([("bg", "count")])
        c = c.rename_columns(["doc_id", "bg", "n"])
        g = c.group_by("doc_id").aggregate([("n", "sum"), ("n", "max")])
        g = g.rename_columns(["doc_id", "n_bigrams", "top_count"])
        nb = pc.cast(g["n_bigrams"], pa.int64())
        top = pc.cast(g["top_count"], pa.int64())
        ppm = pc.divide(pc.multiply(top, pa.scalar(1_000_000, pa.int64())), nb)
        return pa.table(
            {"doc_id": g["doc_id"], "n_bigrams": nb, "top_count": top, "top_ppm": ppm}
        )

    return ds.map_batches(stats, batch_format="pyarrow").sort(["doc_id"])


DOCS_TOP_BIGRAM_FRACTION_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
t AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS pos
      FROM d),
b AS (SELECT doc_id, term,
             lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM t),
c AS (SELECT doc_id, term || ' ' || nxt AS bg, COUNT(*) AS n
      FROM b WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_bigrams,
       CAST(MAX(n) AS BIGINT) AS top_count,
       CAST(MAX(n) * 1000000 // SUM(n) AS BIGINT) AS top_ppm
FROM c GROUP BY 1 ORDER BY doc_id
"""


def lineitem_ks_returnflag(sf_dir: str):
    """Exact two-sample Kolmogorov–Smirnov distance between the
    extendedprice distributions of returnflag R vs N — the distribution-
    drift test a data-quality monitor runs between corpus slices.  The
    statistic is computed WITHOUT floats until the very last step:
    D = max|c_R(x)·n_N − c_N(x)·n_R| / (n_R·n_N) where the max runs over the
    pooled sorted support; numerator and both counts are exact int64, so the
    published ``ks_d`` is ONE IEEE division on both sides.  Ray plan:
    per-block (price_cents → R-count, N-count) partials, one keyed groupby
    at O(|distinct prices|) rows, and a driver cumsum over that small
    per-value table (bounded by the price-grid cardinality, not row count;
    the two-phase prefix scan in ``stages/scan.py`` is the path if the value
    domain itself ever exceeds driver memory)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_extendedprice", "l_returnflag"]
    )
    flags = pa.array(["R", "N"], pa.string())

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_returnflag"], value_set=flags))
        tb = pa.table(
            {
                "p": _cents(t["l_extendedprice"]),
                "r": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64()),
                "nn": pc.cast(pc.equal(t["l_returnflag"], "N"), pa.int64()),
            }
        )
        g = tb.group_by("p").aggregate([("r", "sum"), ("nn", "sum")])
        return g.rename_columns(["p", "r", "nn"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("r", alias_name="r"), Sum("nn", alias_name="nn"))
        .to_pandas()
    )
    agg = agg.sort_values("p", kind="mergesort")
    cr = agg["r"].to_numpy().astype(np.int64).cumsum()
    cn = agg["nn"].to_numpy().astype(np.int64).cumsum()
    n_r, n_n = int(cr[-1]), int(cn[-1])
    d_num = int(np.abs(cr * n_n - cn * n_r).max())
    return pa.table(
        {
            "n_r": pa.array([n_r]),
            "n_n": pa.array([n_n]),
            "d_num": pa.array([d_num]),
            "ks_d": pa.array([d_num / (n_r * n_n)], pa.float64()),
        }
    )


LINEITEM_KS_RETURNFLAG_SQL = """
WITH v AS (
  SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS p,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r,
         CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS nn
  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
c AS (SELECT p, CAST(SUM(r) AS BIGINT) AS r, CAST(SUM(nn) AS BIGINT) AS nn
      FROM v GROUP BY 1),
s AS (SELECT CAST(SUM(r) OVER (ORDER BY p) AS BIGINT) AS cr,
             CAST(SUM(nn) OVER (ORDER BY p) AS BIGINT) AS cn
      FROM c),
t AS (SELECT CAST(SUM(r) AS BIGINT) AS n_r, CAST(SUM(nn) AS BIGINT) AS n_n
      FROM v)
SELECT n_r, n_n,
       CAST(MAX(ABS(cr*n_n - cn*n_r)) AS BIGINT) AS d_num,
       CAST(MAX(ABS(cr*n_n - cn*n_r)) AS DOUBLE) / CAST(n_r*n_n AS DOUBLE) AS ks_d
FROM s, t GROUP BY n_r, n_n
"""


def part_copurchase_pairs(sf_dir: str):
    """Market-basket co-occurrence: the 20 part pairs most often appearing
    in the SAME order (count desc, then pair for a total tie order — the
    limit boundary is deterministic).  The fact×fact self-join is the real
    shape here: distinct (order, part) pairs first (block-local Arrow
    DISTINCT partials collapse duplicates before the shuffle), then an
    8-partition ``Dataset.join`` on orderkey — pair blow-up is bounded by
    per-order basket size (~7 items), never |lineitem|².  The p1<p2 mask
    runs post-join vectorized; the pair groupby output is O(observed pairs),
    then one small sort+limit."""
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
    a = d.map_batches(
        lambda t: t.select(["ok", "pk"]).rename_columns(["ok", "p1"]),
        batch_format="pyarrow",
    )
    b = d.map_batches(
        lambda t: t.select(["ok", "pk"]).rename_columns(["ok2", "p2"]),
        batch_format="pyarrow",
    )
    j = a.join(b, join_type="inner", num_partitions=8, on=("ok",), right_on=("ok2",))

    def upper_pairs(t: pa.Table) -> pa.Table:
        out = t.filter(pc.less(t["p1"], t["p2"]))
        return out.select(["p1", "p2"])

    return (
        j.map_batches(upper_pairs, batch_format="pyarrow")
        .groupby(["p1", "p2"])
        .aggregate(Count(alias_name="n_orders"))
        .sort(["n_orders", "p1", "p2"], descending=[True, False, False])
        .limit(20)
    )


PART_COPURCHASE_PAIRS_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS n_orders
FROM d a JOIN d b ON a.ok = b.ok AND a.pk < b.pk
GROUP BY 1, 2
ORDER BY n_orders DESC, p1, p2
LIMIT 20
"""


def disjunctive_predicate_revenue(sf_dir: str):
    """TPC-H Q19-shape disjunctive multi-predicate join: revenue from
    lineitems whose PART satisfies any of three (brand, size-range,
    qty-range) conjunctions — the pattern where predicate pushdown can't
    help because the filter needs columns from BOTH sides.  The part dim
    ships once as aligned (key, brand-class, size) arrays behind the
    parquet-metadata broadcast guard; each batch probes via ``index_in`` and
    evaluates the whole disjunction as vectorized Arrow boolean algebra —
    rows with no part match carry null through the comparisons and drop,
    matching the oracle's inner join.  Oversized dims reroute to the
    8-partition shuffle join with the same post-join mask."""
    from ...stages.broadcast import dim_is_broadcastable

    part_path = _t(sf_dir, "part")
    dim_cols = ["p_partkey", "p_brand", "p_size"]
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def clause_mask(brand, size, qty):
        def c(bname, smax, qlo, qhi):
            return pc.and_(
                pc.and_(pc.equal(brand, bname), pc.less_equal(size, smax)),
                pc.and_(pc.greater_equal(qty, float(qlo)), pc.less_equal(qty, float(qhi))),
            )

        return pc.or_(pc.or_(c("Brand#1", 15, 1, 11), c("Brand#2", 25, 5, 20)),
                      c("Brand#3", 35, 10, 30))

    if dim_is_broadcastable(part_path, dim_cols):
        import pyarrow.parquet as pq

        pt = pq.read_table(part_path, columns=dim_cols)
        dim_ref = ray.put(
            {
                "keys": pc.cast(pt["p_partkey"], pa.int64()).combine_chunks(),
                "brand": pt["p_brand"].combine_chunks(),
                "size": pc.cast(pt["p_size"], pa.int64()).combine_chunks(),
            }
        )

        def gate(t: pa.Table) -> pa.Table:
            dim = ray.get(dim_ref)
            idx = pc.index_in(t["l_partkey"], value_set=dim["keys"])
            mask = clause_mask(
                pc.take(dim["brand"], idx), pc.take(dim["size"], idx), t["l_quantity"]
            )
            out = t.filter(pc.fill_null(mask, False))
            rev = pc.multiply(out["l_extendedprice"], pc.subtract(1.0, out["l_discount"]))
            return pa.table(
                {
                    "one": pa.array(np.ones(out.num_rows, np.int64)),
                    "rev_c": _cents(rev),
                }
            )

        gated = li.map_batches(gate, batch_format="pyarrow")
    else:
        dim = rd.read_parquet(part_path, columns=dim_cols)
        j = li.join(
            dim, join_type="inner", num_partitions=8,
            on=("l_partkey",), right_on=("p_partkey",),
        )

        def gate_joined(t: pa.Table) -> pa.Table:
            mask = clause_mask(
                t["p_brand"], pc.cast(t["p_size"], pa.int64()), t["l_quantity"]
            )
            out = t.filter(pc.fill_null(mask, False))
            rev = pc.multiply(out["l_extendedprice"], pc.subtract(1.0, out["l_discount"]))
            return pa.table(
                {
                    "one": pa.array(np.ones(out.num_rows, np.int64)),
                    "rev_c": _cents(rev),
                }
            )

        gated = j.map_batches(gate_joined, batch_format="pyarrow")

    agg = gated.aggregate(Sum("one", alias_name="n_items"), Sum("rev_c", alias_name="rev_cents"))
    return pa.table(
        {
            "n_items": pa.array([int(agg["n_items"] or 0)]),
            "rev_cents": pa.array([int(agg["rev_cents"] or 0)]),
        }
    )


DISJUNCTIVE_PREDICATE_REVENUE_SQL = """
SELECT COUNT(*) AS n_items,
       CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                              AS BIGINT)), 0) AS BIGINT) AS rev_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size <= 25 AND l_quantity BETWEEN 5 AND 20)
   OR (p_brand = 'Brand#3' AND p_size <= 35 AND l_quantity BETWEEN 10 AND 30)
"""


def widget_revenue_by_nation_year(sf_dir: str):
    """TPC-H Q9-shape product-line profit drilldown: revenue by SUPPLIER
    nation × ship-year, restricted to parts whose name matches a pattern
    (''widget'' line).  Two dims collapse to broadcasts — the widget partkey
    SET (filtered on the driver with one vectorized ``match_substring``) and
    the supplier→nationkey probe arrays; the fact streams once with zero
    shuffle before the tiny (nations × years) groupby.  Names attach on the
    driver from the 25-row nation dim."""
    import pyarrow.parquet as pq

    nat = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]).to_pandas()
    nat_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    pt = pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_name"])
    widget = pt.filter(pc.match_substring(pt["p_name"], "widget"))
    widget_ref = ray.put(pc.cast(widget["p_partkey"], pa.int64()).combine_chunks())

    sup = pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    sup_ref = ray.put(
        {
            "keys": pc.cast(sup["s_suppkey"], pa.int64()).combine_chunks(),
            "nats": pc.cast(sup["s_nationkey"], pa.int64()).combine_chunks(),
        }
    )

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"], value_set=ray.get(widget_ref)))
        lk = ray.get(sup_ref)
        idx = pc.index_in(t["l_suppkey"], value_set=lk["keys"])
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        tb = pa.table(
            {
                "s_nat": pc.take(lk["nats"], idx),
                "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "rev_c": _cents(rev),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["s_nat", "l_year"]).aggregate([("rev_c", "sum"), ("one", "sum")])
        return g.rename_columns(["s_nat", "l_year", "rev_c", "one"])

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["s_nat", "l_year"])
        .aggregate(Sum("rev_c", alias_name="rev_cents"), Sum("one", alias_name="n_items"))
        .to_pandas()
    )
    agg["nation"] = agg["s_nat"].map(lambda k: nat_name[int(k)])
    agg = agg.sort_values(["nation", "l_year"], kind="mergesort")
    return pa.table(
        {
            "nation": pa.array(agg["nation"].tolist(), pa.string()),
            "l_year": pa.array(agg["l_year"].to_numpy().astype(np.int64)),
            "rev_cents": pa.array(agg["rev_cents"].to_numpy().astype(np.int64)),
            "n_items": pa.array(agg["n_items"].to_numpy().astype(np.int64)),
        }
    )


WIDGET_REVENUE_BY_NATION_YEAR_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
         AS BIGINT) AS rev_cents,
       COUNT(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def customer_retention_by_month(sf_dir: str):
    """Month-over-month retention: for each calendar month, how many
    distinct customers ordered in BOTH that month and the previous one —
    the cohort-retention primitive.  Distinct (customer, month) pairs come
    from block-local Arrow DISTINCT partials + one keyed groupby; adjacency
    is then an equi-join of the pair set against itself SHIFTED by one month
    (join keys (ck, m) = (ck, m+1)) — no per-customer month-list
    materialization, no window sort; the month index is year·12+month so
    December→January adjacency needs no calendar case."""
    o = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def monthly(t: pa.Table) -> pa.Table:
        m = pc.add(
            pc.multiply(pc.cast(pc.year(t["o_orderdate"]), pa.int64()), 12),
            pc.subtract(pc.cast(pc.month(t["o_orderdate"]), pa.int64()), 1),
        )
        return (
            pa.table({"ck": pc.cast(t["o_custkey"], pa.int64()), "m": m})
            .group_by(["ck", "m"])
            .aggregate([])
        )

    d = (
        o.map_batches(monthly, batch_format="pyarrow")
        .groupby(["ck", "m"])
        .aggregate(Count(alias_name="_c"))
    )
    a = d.map_batches(lambda t: t.select(["ck", "m"]), batch_format="pyarrow")
    b = d.map_batches(
        lambda t: pa.table({"ck2": t["ck"], "m_next": pc.add(t["m"], 1)}),
        batch_format="pyarrow",
    )
    j = a.join(
        b, join_type="inner", num_partitions=8,
        on=("ck", "m"), right_on=("ck2", "m_next"),
    )
    return (
        j.groupby("m")
        .aggregate(Count(alias_name="retained"))
        .map_batches(
            lambda t: pa.table({"month_idx": t["m"], "retained": t["retained"]}),
            batch_format="pyarrow",
        )
        .sort(["month_idx"])
    )


CUSTOMER_RETENTION_BY_MONTH_SQL = """
WITH d AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS ck,
         CAST(EXTRACT(year FROM o_orderdate)*12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m
  FROM orders)
SELECT a.m AS month_idx, COUNT(*) AS retained
FROM d a JOIN d b ON a.ck = b.ck AND a.m = b.m + 1
GROUP BY 1 ORDER BY 1
"""


def docs_dup_trigram_fraction(sf_dir: str):
    """Gopher duplicate-n-gram repetition signal (n=3): per document, the
    fraction of trigram OCCURRENCES that are repeats of an earlier identical
    trigram — reported as exact integer ppm of (total − distinct)/total.
    Completes the repetition-filter trio with ``docs_token_diversity``
    (unigrams) and ``docs_top_bigram_fraction`` (top-bigram share).  A
    document is one row, so the whole computation is BLOCK-LOCAL zero-
    shuffle: trigrams via three aligned array slices joined element-wise,
    doc boundaries as one vectorized mask, per-(doc,trigram) counts through
    Arrow ``group_by``."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_trigrams": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "dup_ppm": pa.array([], pa.int64()),
            }
        )
        lst = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()), pattern=r"[^a-z0-9]+"
        )
        terms = lst.flatten()
        ids = t["doc_id"].combine_chunks().take(lst.value_parent_indices())
        tb = pa.table({"doc_id": ids, "term": terms}).filter(pc.not_equal(terms, ""))
        ids_np = tb["doc_id"].to_numpy()
        terms_c = tb["term"].combine_chunks()
        n = len(terms_c)
        if n < 3:
            return empty
        mask = pa.array((ids_np[:-2] == ids_np[1:-1]) & (ids_np[1:-1] == ids_np[2:]))
        tg = pc.binary_join_element_wise(
            terms_c.slice(0, n - 2), terms_c.slice(1, n - 2), terms_c.slice(2), " "
        )
        trips = pa.table({"doc_id": pa.array(ids_np[:-2]), "tg": tg}).filter(mask)
        if trips.num_rows == 0:
            return empty
        c = trips.group_by(["doc_id", "tg"]).aggregate([("tg", "count")])
        c = c.rename_columns(["doc_id", "tg", "n"])
        g = c.group_by("doc_id").aggregate([("n", "sum"), ("n", "count")])
        g = g.rename_columns(["doc_id", "n_trigrams", "n_distinct"])
        tot = pc.cast(g["n_trigrams"], pa.int64())
        dis = pc.cast(g["n_distinct"], pa.int64())
        ppm = pc.divide(
            pc.multiply(pc.subtract(tot, dis), pa.scalar(1_000_000, pa.int64())), tot
        )
        return pa.table(
            {"doc_id": g["doc_id"], "n_trigrams": tot, "n_distinct": dis, "dup_ppm": ppm}
        )

    return ds.map_batches(stats, batch_format="pyarrow").sort(["doc_id"])


DOCS_DUP_TRIGRAM_FRACTION_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
t AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS pos
      FROM d),
g AS (SELECT doc_id,
             term || ' ' || lead(term) OVER w || ' ' || lead(term, 2) OVER w AS tg,
             lead(term, 2) OVER w AS ok
      FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
c AS (SELECT doc_id, tg, COUNT(*) AS n FROM g WHERE ok IS NOT NULL GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_trigrams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST((SUM(n) - COUNT(*)) * 1000000 // SUM(n) AS BIGINT) AS dup_ppm
FROM c GROUP BY 1 ORDER BY doc_id
"""


def lineitem_mannwhitney_returnflag(sf_dir: str):
    """Exact Mann–Whitney rank-sum statistic between the extendedprice
    distributions of returnflag R vs N — the nonparametric sibling of
    ``lineitem_ks_returnflag``, sharing its per-value partial layout.  Tied
    values take midranks; because a tie group occupying 1-based ranks
    [C+1, C+c] has midrank (2C+c+1)/2, the DOUBLED statistic
    u2 = 2·U = Σ_v r_v·(2C_v + c_v + 1) − n_R·(n_R+1) is an exact integer —
    no float ever enters.  Driver pass is over the per-value table (bounded
    by price-grid cardinality)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_extendedprice", "l_returnflag"]
    )
    flags = pa.array(["R", "N"], pa.string())

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_returnflag"], value_set=flags))
        tb = pa.table(
            {
                "p": _cents(t["l_extendedprice"]),
                "r": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64()),
                "nn": pc.cast(pc.equal(t["l_returnflag"], "N"), pa.int64()),
            }
        )
        g = tb.group_by("p").aggregate([("r", "sum"), ("nn", "sum")])
        return g.rename_columns(["p", "r", "nn"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("r", alias_name="r"), Sum("nn", alias_name="nn"))
        .to_pandas()
    )
    agg = agg.sort_values("p", kind="mergesort")
    r = agg["r"].to_numpy().astype(np.int64)
    c_v = r + agg["nn"].to_numpy().astype(np.int64)
    cum = c_v.cumsum()
    c_before = cum - c_v
    n_r = int(r.sum())
    n_n = int(cum[-1]) - n_r
    u2 = int((r * (2 * c_before + c_v + 1)).sum()) - n_r * (n_r + 1)
    return pa.table(
        {"n_r": pa.array([n_r]), "n_n": pa.array([n_n]), "u2": pa.array([u2])}
    )


LINEITEM_MANNWHITNEY_RETURNFLAG_SQL = """
WITH v AS (
  SELECT CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS p,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r,
         CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS nn
  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
c AS (SELECT p, CAST(SUM(r) AS BIGINT) AS r, CAST(SUM(r+nn) AS BIGINT) AS c_v
      FROM v GROUP BY 1),
s AS (SELECT r, c_v,
             CAST(SUM(c_v) OVER (ORDER BY p) AS BIGINT) - c_v AS c_before
      FROM c),
t AS (SELECT CAST(SUM(r) AS BIGINT) AS n_r, CAST(SUM(nn) AS BIGINT) AS n_n
      FROM v)
SELECT n_r, n_n,
       CAST(SUM(r*(2*c_before + c_v + 1)) - n_r*(n_r+1) AS BIGINT) AS u2
FROM s, t GROUP BY n_r, n_n
"""


def returned_item_top_customers(sf_dir: str):
    """TPC-H Q10-shape returned-item ranking: the 20 customers who lost the
    most revenue to RETURNED lineitems in one quarter, enriched with name
    and nation.  Ray plan: lineitem R-filter + block-local per-orderkey
    partials (shrinks the join input without a global orderkey groupby),
    8-partition join against the date-windowed orders projection, one small
    custkey groupby, then sort+limit; names attach via POINT-FILTERED dim
    reads for just the 20 winners."""
    import pyarrow.parquet as pq
    import datetime as _dt

    lo, hi = _dt.datetime(1997, 1, 1), _dt.datetime(1997, 4, 1)

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def rpartial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        tb = pa.table({"l_orderkey": t["l_orderkey"], "rev_c": _cents(rev)})
        g = tb.group_by("l_orderkey").aggregate([("rev_c", "sum")])
        return g.rename_columns(["l_orderkey", "rev_c"])

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    top = (
        li.map_batches(rpartial, batch_format="pyarrow")
        .join(
            orders,
            join_type="inner",
            num_partitions=8,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        .groupby("o_custkey")
        .aggregate(Sum("rev_c", alias_name="rev_cents"))
        .sort(["rev_cents", "o_custkey"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )

    nat = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]).to_pandas()
    nat_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    # pushdown point-read: customer is fact-scaled, so the 20-key filter
    # goes INTO the read (row-group pruning) instead of after a full driver
    # materialization (VERDICT r4 #3)
    key_list = [int(k) for k in top["o_custkey"].to_numpy()]
    cust = pq.read_table(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", key_list)],
    )
    out = top.merge(cust.to_pandas(), left_on="o_custkey", right_on="c_custkey")
    out["nation"] = out["c_nationkey"].map(lambda k: nat_name[int(k)])
    out = out.sort_values(["rev_cents", "o_custkey"], ascending=[False, True], kind="mergesort")
    return pa.table(
        {
            "c_custkey": pa.array(out["o_custkey"].to_numpy().astype(np.int64)),
            "c_name": pa.array(out["c_name"].tolist(), pa.string()),
            "nation": pa.array(out["nation"].tolist(), pa.string()),
            "rev_cents": pa.array(out["rev_cents"].to_numpy().astype(np.int64)),
        }
    )


RETURNED_ITEM_TOP_CUSTOMERS_SQL = """
WITH r AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
           AS BIGINT) AS rev_cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
  GROUP BY 1)
SELECT c_custkey, c_name, n_name AS nation, rev_cents
FROM r JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY rev_cents DESC, c_custkey
LIMIT 20
"""


def orders_price_mad_by_priority(sf_dir: str):
    """Median absolute deviation per priority — the robust-dispersion
    companion to ``orders_median_by_priority``.  Both medians are the
    LOWER-median convention (1-based rank ⌈n/2⌉, = DuckDB quantile_disc
    0.5).  ONE distributed pass builds the per-(priority, price-cents)
    count table; both the median AND the deviation median then come from
    that same small table on the driver (deviations of a counted value are
    |v − med| with the same count — no second scan).  Driver bound is
    O(groups × distinct values); the histogram-refine selection in
    ``stages/quantiles`` is the path past that."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "pr": t["o_orderpriority"],
                "v": _cents(t["o_totalprice"]),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["pr", "v"]).aggregate([("one", "sum")])
        return g.rename_columns(["pr", "v", "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pr", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )

    def _lower_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        order = np.argsort(vals, kind="mergesort")
        vals, cnts = vals[order], cnts[order]
        cum = cnts.cumsum()
        rank = (cum[-1] + 1) // 2  # 1-based ceil(n/2)
        return int(vals[np.searchsorted(cum, rank)])

    rows = []
    for pr, grp in counts.groupby("pr", sort=True):
        vals = grp["v"].to_numpy().astype(np.int64)
        cnts = grp["n"].to_numpy().astype(np.int64)
        med = _lower_median(vals, cnts)
        mad = _lower_median(np.abs(vals - med), cnts)
        rows.append((pr, med, mad))
    return pa.table(
        {
            "o_orderpriority": pa.array([r[0] for r in rows], pa.string()),
            "median_cents": pa.array([r[1] for r in rows], pa.int64()),
            "mad_cents": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


ORDERS_PRICE_MAD_BY_PRIORITY_SQL = """
WITH m AS (
  SELECT o_orderpriority AS pr,
         CAST(quantile_disc(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT), 0.5)
           AS BIGINT) AS med
  FROM orders GROUP BY 1)
SELECT pr AS o_orderpriority, med AS median_cents,
       CAST(quantile_disc(ABS(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) - med),
                          0.5) AS BIGINT) AS mad_cents
FROM orders JOIN m ON o_orderpriority = pr
GROUP BY 1, 2 ORDER BY 1
"""


def orders_daily_revenue_drops(sf_dir: str):
    """Change-point flag over the daily revenue series: days whose revenue
    fell below 70 % of the PREVIOUS observed day — the drop gate is the
    integer cross-multiply ``rev·10 < prev·7`` so the threshold never exists
    as a float.  The fact collapses to an O(days) series via block partials
    + one keyed groupby; the lag itself is a driver shift over that tiny
    series (the two-phase prefix scan in ``stages/scan.py`` is the path if
    the key domain were ever fact-scale)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"d": t["o_orderdate"], "c": _cents(t["o_totalprice"])})
        g = tb.group_by("d").aggregate([("c", "sum")])
        return g.rename_columns(["d", "c"])

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("c", alias_name="rev_cents"))
        .to_pandas()
        .sort_values("d", kind="mergesort")
    )
    rev = daily["rev_cents"].to_numpy().astype(np.int64)
    prev = np.roll(rev, 1)
    mask = np.zeros(len(rev), bool)
    mask[1:] = rev[1:] * 10 < prev[1:] * 7
    out = daily[mask]
    return pa.table(
        {
            "o_orderdate": pa.array(
                out["d"].to_numpy().astype("datetime64[us]"), pa.timestamp("us")
            ),
            "rev_cents": pa.array(out["rev_cents"].to_numpy().astype(np.int64)),
            "prev_cents": pa.array(prev[mask].astype(np.int64)),
        }
    )


ORDERS_DAILY_REVENUE_DROPS_SQL = """
WITH d AS (
  SELECT o_orderdate,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1),
s AS (SELECT o_orderdate, rev_cents,
             lag(rev_cents) OVER (ORDER BY o_orderdate) AS prev_cents
      FROM d)
SELECT o_orderdate, rev_cents, CAST(prev_cents AS BIGINT) AS prev_cents
FROM s WHERE prev_cents IS NOT NULL AND rev_cents * 10 < prev_cents * 7
ORDER BY o_orderdate
"""


def orders_weekly_revenue(sf_dir: str):
    """ISO-week calendar aggregation: revenue per (ISO year, ISO week) —
    the calendar bucketing where naive year/week math goes wrong at year
    boundaries (Jan 1 can belong to week 52/53 of the PREVIOUS ISO year).
    Arrow's ``iso_year``/``iso_week`` and DuckDB's ``isoyear``/``week`` both
    implement ISO 8601, verified in parity.  Standard partial-aggregate
    shape: block-local (week-key, Σcents) then one tiny groupby."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        wk = pc.add(
            pc.multiply(pc.cast(pc.iso_year(t["o_orderdate"]), pa.int64()), 100),
            pc.cast(pc.iso_week(t["o_orderdate"]), pa.int64()),
        )
        tb = pa.table(
            {
                "iso_yw": wk,
                "c": _cents(t["o_totalprice"]),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("iso_yw").aggregate([("c", "sum"), ("one", "sum")])
        return g.rename_columns(["iso_yw", "c", "one"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("iso_yw")
        .aggregate(Sum("c", alias_name="rev_cents"), Sum("one", alias_name="n_orders"))
        .sort(["iso_yw"])
    )


ORDERS_WEEKLY_REVENUE_SQL = """
SELECT CAST(EXTRACT(isoyear FROM o_orderdate)*100
            + EXTRACT(week FROM o_orderdate) AS BIGINT) AS iso_yw,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY 1
"""


def docs_lang_source_lift(sf_dir: str):
    """Data-mixing audit: for every (source, lang) cell, the LIFT of that
    language within the source over its global share — the table a corpus
    curator reads to spot a crawl slice leaning into one language.  Lift is
    published as exact integer ppm via cross-multiplication
    ``(n_sl · N · 10⁶) // (n_s · n_l)`` — no intermediate share ever exists
    as a float.  ONE distributed pass builds the (source, lang) counts; the
    three marginals all derive from that tiny table on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "source": t["source"],
                "lang": t["lang"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["source", "lang"]).aggregate([("one", "sum")])
        return g.rename_columns(["source", "lang", "n_sl"])

    cell = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n_sl", alias_name="n_sl"))
        .to_pandas()
    )
    n_s = cell.groupby("source")["n_sl"].transform("sum").to_numpy().astype(np.int64)
    n_l = cell.groupby("lang")["n_sl"].transform("sum").to_numpy().astype(np.int64)
    n_sl = cell["n_sl"].to_numpy().astype(np.int64)
    total = int(n_sl.sum())
    lift = (n_sl * total * 1_000_000) // (n_s * n_l)
    cell = cell.assign(n_source=n_s, n_lang=n_l, lift_ppm=lift).sort_values(
        ["source", "lang"], kind="mergesort"
    )
    return pa.table(
        {
            "source": pa.array(cell["source"].tolist(), pa.string()),
            "lang": pa.array(cell["lang"].tolist(), pa.string()),
            "n_sl": pa.array(cell["n_sl"].to_numpy().astype(np.int64)),
            "n_source": pa.array(cell["n_source"].to_numpy().astype(np.int64)),
            "n_lang": pa.array(cell["n_lang"].to_numpy().astype(np.int64)),
            "lift_ppm": pa.array(cell["lift_ppm"].to_numpy().astype(np.int64)),
        }
    )


DOCS_LANG_SOURCE_LIFT_SQL = """
WITH c AS (SELECT source, lang, COUNT(*) AS n_sl FROM documents GROUP BY 1, 2),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents)
SELECT source, lang, CAST(n_sl AS BIGINT) AS n_sl,
       CAST(SUM(n_sl) OVER (PARTITION BY source) AS BIGINT) AS n_source,
       CAST(SUM(n_sl) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
       CAST(n_sl * total * 1000000
            // (SUM(n_sl) OVER (PARTITION BY source)
                * SUM(n_sl) OVER (PARTITION BY lang)) AS BIGINT) AS lift_ppm
FROM c, t ORDER BY source, lang
"""


def orders_lineitem_balance_audit(sf_dir: str):
    """Cross-table reconciliation audit (the reference engine's core move,
    run table-vs-table): per order, compare o_totalprice against the sum of
    its lineitems' extendedprice — report how many orders have lines, match
    exactly in cents, or drift beyond 1 %.  The drift gate is the integer
    cross-multiply ``|diff|·100 > total`` so the tolerance never exists as a
    float.  Ray plan: per-orderkey block partials on lineitem, 8-partition
    join against the orders projection, then a three-counter fold."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice"])

    def lpartial(t: pa.Table) -> pa.Table:
        tb = pa.table({"l_orderkey": t["l_orderkey"], "c": _cents(t["l_extendedprice"])})
        g = tb.group_by("l_orderkey").aggregate([("c", "sum")])
        return g.rename_columns(["l_orderkey", "c"])

    lsum = (
        li.map_batches(lpartial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("c", alias_name="line_cents"))
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"], "total_cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow",
    )
    j = orders.join(
        lsum, join_type="inner", num_partitions=8,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def fold(t: pa.Table) -> pa.Table:
        diff = pc.subtract(t["line_cents"], t["total_cents"])
        absd = pc.abs(diff)
        exact = pc.cast(pc.equal(diff, 0), pa.int64())
        drift = pc.cast(
            pc.greater(pc.multiply(absd, pa.scalar(100, pa.int64())), t["total_cents"]),
            pa.int64(),
        )
        return pa.table(
            {
                "one": pa.array(np.ones(t.num_rows, np.int64)),
                "exact": exact,
                "drift": drift,
                "abs_diff": absd,
            }
        )

    agg = j.map_batches(fold, batch_format="pyarrow").aggregate(
        Sum("one", alias_name="n_with_lines"),
        Sum("exact", alias_name="n_exact"),
        Sum("drift", alias_name="n_drift_gt_1pct"),
        Sum("abs_diff", alias_name="sum_abs_diff_cents"),
    )
    return pa.table(
        {
            "n_with_lines": pa.array([int(agg["n_with_lines"] or 0)]),
            "n_exact": pa.array([int(agg["n_exact"] or 0)]),
            "n_drift_gt_1pct": pa.array([int(agg["n_drift_gt_1pct"] or 0)]),
            "sum_abs_diff_cents": pa.array([int(agg["sum_abs_diff_cents"] or 0)]),
        }
    )


ORDERS_LINEITEM_BALANCE_AUDIT_SQL = """
WITH l AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS line_cents
  FROM lineitem GROUP BY 1),
j AS (
  SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS total_cents, line_cents
  FROM orders JOIN l ON o_orderkey = l_orderkey)
SELECT COUNT(*) AS n_with_lines,
       CAST(SUM(CASE WHEN line_cents = total_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
       CAST(SUM(CASE WHEN ABS(line_cents - total_cents) * 100 > total_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_drift_gt_1pct,
       CAST(SUM(ABS(line_cents - total_cents)) AS BIGINT) AS sum_abs_diff_cents
FROM j
"""


def brand_supplier_counts(sf_dir: str):
    """TPC-H Q16-shape grouped COUNT DISTINCT with an exclusion set: per
    (brand, size), how many DISTINCT suppliers ship that combination —
    excluding a complaint list of suppliers (name suffix match), using
    lineitem as the part↔supplier link.  Part attributes ride a guarded
    broadcast probe; the excluded-supplier keyset is a second tiny
    broadcast; distinct (brand, size, supplier) triples come from
    block-local Arrow DISTINCT partials, one keyed groupby, then the
    per-(brand,size) count is a second groupby over already-unique rows."""
    import pyarrow.parquet as pq

    pt = pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"])
    dim_ref = ray.put(
        {
            "keys": pc.cast(pt["p_partkey"], pa.int64()).combine_chunks(),
            "brand": pt["p_brand"].combine_chunks(),
            "size": pc.cast(pt["p_size"], pa.int64()).combine_chunks(),
        }
    )
    sup = pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    excluded = sup.filter(pc.match_substring(sup["s_name"], "7"))
    excl_ref = ray.put(pc.cast(excluded["s_suppkey"], pa.int64()).combine_chunks())

    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"])

    def partial(t: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)
        t = t.filter(
            pc.invert(pc.is_in(t["l_suppkey"], value_set=ray.get(excl_ref)))
        )
        idx = pc.index_in(t["l_partkey"], value_set=dim["keys"])
        brand = pc.take(dim["brand"], idx)
        tb = pa.table(
            {
                "p_brand": brand,
                "p_size": pc.take(dim["size"], idx),
                "sk": pc.cast(t["l_suppkey"], pa.int64()),
            }
        ).filter(pc.is_valid(brand))
        return tb.group_by(["p_brand", "p_size", "sk"]).aggregate([])

    triples = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["p_brand", "p_size", "sk"])
        .aggregate(Count(alias_name="_c"))
    )
    return (
        triples.map_batches(
            lambda t: pa.table(
                {
                    "p_brand": t["p_brand"],
                    "p_size": t["p_size"],
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["p_brand", "p_size"])
        .aggregate(Sum("one", alias_name="supplier_cnt"))
        .sort(["p_brand", "p_size"])
    )


BRAND_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_priority_share_by_year(sf_dir: str):
    """Ratio-to-report window: each (year, priority) cell's share of its
    YEAR's total revenue, as exact integer ppm ``rev·10⁶ // year_total`` —
    the SUM() OVER (PARTITION BY year) shape.  One distributed pass builds
    the (year, priority) cells; the per-year totals derive from that tiny
    table on the driver, so the window never touches the fact."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "pr": t["o_orderpriority"],
                "c": _cents(t["o_totalprice"]),
            }
        )
        g = tb.group_by(["o_year", "pr"]).aggregate([("c", "sum")])
        return g.rename_columns(["o_year", "pr", "c"])

    cell = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_year", "pr"])
        .aggregate(Sum("c", alias_name="rev_cents"))
        .to_pandas()
    )
    ytot = cell.groupby("o_year")["rev_cents"].transform("sum").to_numpy().astype(np.int64)
    rev = cell["rev_cents"].to_numpy().astype(np.int64)
    cell = cell.assign(
        year_cents=ytot, share_ppm=(rev * 1_000_000) // ytot
    ).sort_values(["o_year", "pr"], kind="mergesort")
    return pa.table(
        {
            "o_year": pa.array(cell["o_year"].to_numpy().astype(np.int64)),
            "o_orderpriority": pa.array(cell["pr"].tolist(), pa.string()),
            "rev_cents": pa.array(cell["rev_cents"].to_numpy().astype(np.int64)),
            "year_cents": pa.array(cell["year_cents"].to_numpy().astype(np.int64)),
            "share_ppm": pa.array(cell["share_ppm"].to_numpy().astype(np.int64)),
        }
    )


ORDERS_PRIORITY_SHARE_BY_YEAR_SQL = """
WITH c AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         o_orderpriority,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2)
SELECT o_year, o_orderpriority, rev_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY o_year) AS BIGINT) AS year_cents,
       CAST(rev_cents * 1000000
            // SUM(rev_cents) OVER (PARTITION BY o_year) AS BIGINT) AS share_ppm
FROM c ORDER BY o_year, o_orderpriority
"""


def orders_price_rank_band(sf_dir: str):
    """Per-group rank BAND (window offsets 3–5): within each priority, the
    orders ranked 3rd–5th by price (row_number, ties broken by orderkey —
    a total order, so the band is deterministic).  The distributed move is
    the LOSSLESS per-block prune: each block keeps only its own top-5 per
    priority (the global top-5 is necessarily a subset of the union of
    block top-5s), so the driver merge sees O(blocks·groups·5) rows, never
    the fact."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def block_top(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "pr": t["o_orderpriority"],
                "ok": pc.cast(t["o_orderkey"], pa.int64()),
                "c": _cents(t["o_totalprice"]),
            }
        )
        df = tb.to_pandas()
        df = df.sort_values(["pr", "c", "ok"], ascending=[True, False, True], kind="mergesort")
        df = df.groupby("pr", sort=False).head(5)
        return pa.table(
            {
                "pr": pa.array(df["pr"].tolist(), pa.string()),
                "ok": pa.array(df["ok"].to_numpy().astype(np.int64)),
                "c": pa.array(df["c"].to_numpy().astype(np.int64)),
            }
        )

    cand = ds.map_batches(block_top, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["pr", "c", "ok"], ascending=[True, False, True], kind="mergesort")
    cand["rk"] = cand.groupby("pr", sort=False).cumcount() + 1
    band = cand[(cand["rk"] >= 3) & (cand["rk"] <= 5)]
    return pa.table(
        {
            "o_orderpriority": pa.array(band["pr"].tolist(), pa.string()),
            "rk": pa.array(band["rk"].to_numpy().astype(np.int64)),
            "o_orderkey": pa.array(band["ok"].to_numpy().astype(np.int64)),
            "price_cents": pa.array(band["c"].to_numpy().astype(np.int64)),
        }
    )


ORDERS_PRICE_RANK_BAND_SQL = """
WITH r AS (
  SELECT o_orderpriority, CAST(o_orderkey AS BIGINT) AS o_orderkey,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY FLOOR(o_totalprice*100 + 0.5) DESC,
                                     o_orderkey) AS rk
  FROM orders)
SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk, o_orderkey, price_cents
FROM r WHERE rk BETWEEN 3 AND 5
ORDER BY o_orderpriority, rk
"""


def embeddings_pca_project(sf_dir: str):
    """PCA projection of the embedding corpus onto its top-2 principal
    components — the dimensionality-reduction / visualization step of an
    embedding-quality audit.  Rows-only (eigendecomposition is not
    SQL-expressible); exactness comes from the SUFFICIENT STATISTICS: one
    distributed pass accumulates Σx and Σxxᵀ as ×1000 fixed-point int64
    (the ``embeddings_gram_matrix`` discipline — bit-identical at any
    parallelism), the d×d eigenproblem runs once on the driver, and each
    component's sign is fixed by making its largest-|entry| coordinate
    positive so the output is deterministic.  The component matrix then
    broadcasts for a zero-shuffle projection pass."""
    from ...stages.cluster import _vecs

    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "g": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        fixed = np.floor(_vecs(t, "embedding") * 1000.0 + 0.5).astype(np.int64)
        d = fixed.shape[1]
        gram = fixed.T @ fixed
        sums = fixed.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "g": pa.array(gram[iu, ju]),
                "s": pa.array(np.where(iu == ju, sums[iu], 0)),
                "n": pa.array(np.where((iu == 0) & (ju == 0), t.num_rows, 0).astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(stats, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("g", alias_name="g"), Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    d = int(agg["j"].max()) + 1
    G = np.zeros((d, d), np.int64)
    S = np.zeros(d, np.int64)
    for _, r in agg.iterrows():
        i, jj = int(r["i"]), int(r["j"])
        G[i, jj] = G[jj, i] = int(r["g"])
        if i == jj:
            S[i] = int(r["s"])
    n = int(agg.loc[(agg["i"] == 0) & (agg["j"] == 0), "n"].iloc[0])
    mean = S.astype(np.float64) / n
    cov = G.astype(np.float64) / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :2]  # eigh is ascending; take the top-2
    for k in range(comps.shape[1]):
        jmax = int(np.abs(comps[:, k]).argmax())
        if comps[jmax, k] < 0:
            comps[:, k] = -comps[:, k]
    proj_ref = ray.put({"mean": mean, "comps": comps})

    def project(t: pa.Table) -> pa.Table:
        pr = ray.get(proj_ref)
        fixed = np.floor(_vecs(t, "embedding") * 1000.0 + 0.5)
        xy = (fixed - pr["mean"]) @ pr["comps"]
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "pc1": pa.array(xy[:, 0], pa.float64()),
                "pc2": pa.array(xy[:, 1], pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow").sort(["vec_id"])


def customer_cohort_matrix(sf_dir: str):
    """Cohort-retention matrix: customers bucketed by FIRST-order month
    (the cohort), counted at every months-since-cohort offset k where they
    ordered again — the triangle table behind every retention curve.
    Distinct (customer, month) pairs and the per-customer min month are two
    small keyed groupbys over block partials; one 8-partition join brings
    the cohort month back to the pair set and the final (cohort, k) cell
    count is tiny."""
    o = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def monthly(t: pa.Table) -> pa.Table:
        m = pc.add(
            pc.multiply(pc.cast(pc.year(t["o_orderdate"]), pa.int64()), 12),
            pc.subtract(pc.cast(pc.month(t["o_orderdate"]), pa.int64()), 1),
        )
        return (
            pa.table({"ck": pc.cast(t["o_custkey"], pa.int64()), "m": m})
            .group_by(["ck", "m"])
            .aggregate([])
        )

    d = (
        o.map_batches(monthly, batch_format="pyarrow")
        .groupby(["ck", "m"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda t: t.select(["ck", "m"]), batch_format="pyarrow")
    )
    cohort = d.groupby("ck").aggregate(Min("m", alias_name="cm")).map_batches(
        lambda t: pa.table({"ck2": t["ck"], "cm": t["cm"]}), batch_format="pyarrow"
    )
    j = d.join(cohort, join_type="inner", num_partitions=8, on=("ck",), right_on=("ck2",))

    def cell(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_month": t["cm"],
                "k": pc.subtract(t["m"], t["cm"]),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    return (
        j.map_batches(cell, batch_format="pyarrow")
        .groupby(["cohort_month", "k"])
        .aggregate(Sum("one", alias_name="n_customers"))
        .sort(["cohort_month", "k"])
    )


CUSTOMER_COHORT_MATRIX_SQL = """
WITH d AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS ck,
         CAST(EXTRACT(year FROM o_orderdate)*12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m
  FROM orders),
c AS (SELECT ck, MIN(m) AS cm FROM d GROUP BY 1)
SELECT cm AS cohort_month, CAST(m - cm AS BIGINT) AS k, COUNT(*) AS n_customers
FROM d JOIN c USING (ck)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def customer_activity_islands(sf_dir: str):
    """Gaps-and-islands WITHOUT the row_number trick: a customer's island
    count (maximal runs of consecutive active months) equals
    #active-months − #adjacent-month-pairs, so the whole computation is two
    keyed aggregates plus the month-shift self-join already proven in
    ``customer_retention_by_month`` — no per-customer ordered scan, no
    window sort anywhere.  Published as the histogram island-count →
    customers.  Customers with no adjacent pair fall out of the join and
    take n_adj = 0 through the LEFT OUTER fill."""
    o = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def monthly(t: pa.Table) -> pa.Table:
        m = pc.add(
            pc.multiply(pc.cast(pc.year(t["o_orderdate"]), pa.int64()), 12),
            pc.subtract(pc.cast(pc.month(t["o_orderdate"]), pa.int64()), 1),
        )
        return (
            pa.table({"ck": pc.cast(t["o_custkey"], pa.int64()), "m": m})
            .group_by(["ck", "m"])
            .aggregate([])
        )

    d = (
        o.map_batches(monthly, batch_format="pyarrow")
        .groupby(["ck", "m"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda t: t.select(["ck", "m"]), batch_format="pyarrow")
        .materialize()
    )
    per = d.groupby("ck").aggregate(Count(alias_name="n_m"))
    b = d.map_batches(
        lambda t: pa.table({"ck2": t["ck"], "m_next": pc.add(t["m"], 1)}),
        batch_format="pyarrow",
    )
    adj = (
        d.join(b, join_type="inner", num_partitions=8, on=("ck", "m"), right_on=("ck2", "m_next"))
        .groupby("ck")
        .aggregate(Count(alias_name="n_adj"))
        .map_batches(
            lambda t: pa.table({"ck3": t["ck"], "n_adj": t["n_adj"]}),
            batch_format="pyarrow",
        )
    )
    j = per.join(adj, join_type="left_outer", num_partitions=8, on=("ck",), right_on=("ck3",))

    def islands(t: pa.Table) -> pa.Table:
        n_adj = pc.fill_null(t["n_adj"], 0)
        return pa.table(
            {
                "n_islands": pc.subtract(pc.cast(t["n_m"], pa.int64()), pc.cast(n_adj, pa.int64())),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    return (
        j.map_batches(islands, batch_format="pyarrow")
        .groupby("n_islands")
        .aggregate(Sum("one", alias_name="n_customers"))
        .sort(["n_islands"])
    )


CUSTOMER_ACTIVITY_ISLANDS_SQL = """
WITH d AS (
  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS ck,
         CAST(EXTRACT(year FROM o_orderdate)*12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m
  FROM orders),
adj AS (SELECT a.ck, COUNT(*) AS n_adj
        FROM d a JOIN d b ON a.ck = b.ck AND a.m = b.m + 1 GROUP BY 1),
per AS (SELECT ck, COUNT(*) AS n_m FROM d GROUP BY 1)
SELECT CAST(n_m - COALESCE(n_adj, 0) AS BIGINT) AS n_islands,
       COUNT(*) AS n_customers
FROM per LEFT JOIN adj USING (ck)
GROUP BY 1 ORDER BY 1
"""


def events_value_lag1_autocorr(sf_dir: str):
    """Per-user lag-1 autocorrelation of the value series (ordered by ts,
    event_id tie-break) — the serial-dependence screen of a telemetry
    audit.  All six sufficient statistics (pair count, ΣX, ΣY, ΣXY, ΣX²,
    ΣY² over consecutive pairs) are exact int64 on cents; ``r`` is ONE
    fixed IEEE expression evaluated identically by Ray and DuckDB, and
    degenerate users (constant head or tail series) are filtered by the
    INTEGER variance terms, never by a float epsilon.  Co-partition by
    user, per-group Arrow/numpy kernel — the asof-stage discipline."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])

    def kernel(g: pa.Table) -> pa.Table:
        ts = g["ts"].combine_chunks().to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        x_all = _cents(g["value"]).to_numpy()
        order = np.lexsort((eid, ts))
        x = x_all[order]
        if len(x) < 2:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                    "sxy": pa.array([], pa.int64()),
                    "r": pa.array([], pa.float64()),
                }
            )
        h, t2 = x[:-1], x[1:]
        npair = len(h)
        sh, st = int(h.sum()), int(t2.sum())
        sxy = int((h * t2).sum())
        shh, stt = int((h * h).sum()), int((t2 * t2).sum())
        var_h = npair * shh - sh * sh
        var_t = npair * stt - st * st
        uid = int(g["user_id"][0].as_py())
        if var_h <= 0 or var_t <= 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                    "sxy": pa.array([], pa.int64()),
                    "r": pa.array([], pa.float64()),
                }
            )
        import math

        r = float(npair * sxy - sh * st) / math.sqrt(float(var_h) * float(var_t))
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_pairs": pa.array([npair], pa.int64()),
                "sxy": pa.array([sxy], pa.int64()),
                "r": pa.array([r], pa.float64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["user_id"])
    )


EVENTS_VALUE_LAG1_AUTOCORR_SQL = """
WITH s AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS x,
         lead(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
  FROM events),
p AS (SELECT user_id, x, y FROM s WHERE y IS NOT NULL),
a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(x) AS BIGINT) AS sh, CAST(SUM(y) AS BIGINT) AS st,
             CAST(SUM(x*y) AS BIGINT) AS sxy,
             CAST(SUM(x*x) AS BIGINT) AS shh, CAST(SUM(y*y) AS BIGINT) AS stt
      FROM p GROUP BY 1)
SELECT user_id, np AS n_pairs, sxy,
       CAST(np*sxy - sh*st AS DOUBLE)
         / sqrt(CAST(np*shh - sh*sh AS DOUBLE) * CAST(np*stt - st*st AS DOUBLE)) AS r
FROM a
WHERE np*shh - sh*sh > 0 AND np*stt - st*st > 0
ORDER BY user_id
"""


def events_groups_frame_sum(sf_dir: str):
    """GROUPS-mode window frame: per user ordered by ts, the running sum of
    value-cents over the current tie-GROUP and the 2 preceding GROUPS —
    the frame mode where ROWS is wrong under timestamp ties (every row of a
    tie group must see the SAME frame total).  Per-group Arrow/numpy
    kernel: collapse to unique timestamps with per-tie-group sums, a
    3-window sliding sum over that collapsed series, then broadcast back to
    rows via the group index."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])

    def kernel(g: pa.Table) -> pa.Table:
        ts = g["ts"].combine_chunks().to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        x = _cents(g["value"]).to_numpy()
        order = np.lexsort((eid, ts))
        ts, eid, x = ts[order], eid[order], x[order]
        # collapse ties: group index per row, per-group sums
        new = np.r_[True, ts[1:] != ts[:-1]]
        gidx = np.cumsum(new) - 1
        gsums = np.zeros(int(gidx[-1]) + 1, np.int64)
        np.add.at(gsums, gidx, x)
        pre = np.concatenate([[0], gsums.cumsum()])
        lo = np.maximum(gidx - 2, 0)
        frame = pre[gidx + 1] - pre[lo]
        uid = int(g["user_id"][0].as_py())
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(np.full(len(eid), uid, np.int64)),
                "g3_sum_cents": pa.array(frame.astype(np.int64)),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["event_id"])
    )


EVENTS_GROUPS_FRAME_SUM_SQL = """
-- GROUPS frame emulated (this DuckDB lacks GROUPS mode): collapse each
-- (user, ts) tie group to its sum, run a ROWS frame over the collapsed
-- series — identical semantics — and join the totals back to rows.
WITH g AS (
  SELECT user_id, ts,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS gs
  FROM events GROUP BY 1, 2),
w AS (
  SELECT user_id, ts,
         CAST(SUM(gs) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           AS BIGINT) AS g3
  FROM g)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(e.user_id AS BIGINT) AS user_id,
       g3 AS g3_sum_cents
FROM events e JOIN w ON e.user_id = w.user_id AND e.ts = w.ts
ORDER BY event_id
"""


def lineitem_priority_case_counts(sf_dir: str):
    """TPC-H Q12-shape conditional counting across a fact-fact join: per
    linestatus, how many lineitems belong to HIGH-priority orders
    (1-URGENT/2-HIGH) vs all others — the CASE-inside-SUM pattern.  Both
    sides are fact-scale so neither broadcasts: lineitem pre-aggregates to
    (orderkey, linestatus, n) block partials (shrinking the shuffle input
    to ≤ one row per order-status pair per block), orders ships only
    (orderkey, is_high), and the counts fold after the 8-partition join."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linestatus"])

    def lpartial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ls": t["l_linestatus"],
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["l_orderkey", "ls"]).aggregate([("one", "sum")])
        return g.rename_columns(["l_orderkey", "ls", "n"])

    hi = pa.array(["1-URGENT", "2-HIGH"], pa.string())
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "is_high": pc.cast(pc.is_in(t["o_orderpriority"], value_set=hi), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j = li.map_batches(lpartial, batch_format="pyarrow").join(
        orders, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_linestatus": t["ls"],
                "high_count": pc.multiply(t["is_high"], t["n"]),
                "low_count": pc.multiply(pc.subtract(1, t["is_high"]), t["n"]),
            }
        )

    return (
        j.map_batches(fold, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(Sum("high_count", alias_name="high_count"), Sum("low_count", alias_name="low_count"))
        .sort(["l_linestatus"])
    )


LINEITEM_PRIORITY_CASE_COUNTS_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def events_daily_audience_overlap(sf_dir: str):
    """Day-over-day audience overlap: for every ordered day pair, the
    common / union user counts and their Jaccard as exact integer ppm
    ``common\u00b710\u2076 // (n\u2081 + n\u2082 \u2212 common)`` \u2014 the DAU-retention heatmap.
    JOIN-FREE plan (a user self-join here hits Ray's tiny-key-domain
    empty-aggregator hazard AND moves O(users\u00b7days) rows twice): the day
    span packs into ONE int64 bitmask per user via a keyed Sum over
    distinct (user, day) bits; every ordered pair count is then a
    vectorized bit test in block-local partials \u2014 work scales with
    |users|\u00b7|day-pairs| and nothing shuffles but the masks.  Spans past 62
    days shard the mask into one int64 per 62-day window (guarded)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()), pa.int64())
        return (
            pa.table({"u": pc.cast(t["user_id"], pa.int64()), "d": day})
            .group_by(["u", "d"])
            .aggregate([])
        )

    d = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["u", "d"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda t: t.select(["u", "d"]), batch_format="pyarrow")
        .materialize()
    )
    per_day = {
        int(r["d"]): int(r["n"])
        for r in d.groupby("d").aggregate(Count(alias_name="n")).to_pandas().to_dict("records")
    }
    days = sorted(per_day)
    d0 = days[0]
    if days[-1] - d0 > 62:
        raise ValueError("day span exceeds one int64 bitmask; shard the mask")

    masks = (
        d.map_batches(
            lambda t: pa.table(
                {
                    "u": t["u"],
                    "bit": pc.shift_left(pa.scalar(1, pa.int64()), pc.subtract(t["d"], d0)),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("u")
        .aggregate(Sum("bit", alias_name="mask"))
    )

    pair_list = [(a, b) for i, a in enumerate(days) for b in days[i + 1 :]]

    def count_pairs(t: pa.Table) -> pa.Table:
        m = t["mask"].to_numpy()
        d1s, d2s, cnts = [], [], []
        for a, b in pair_list:
            both = (1 << (a - d0)) | (1 << (b - d0))
            d1s.append(a)
            d2s.append(b)
            cnts.append(int(((m & both) == both).sum()))
        return pa.table(
            {
                "d1": pa.array(d1s, pa.int64()),
                "d2": pa.array(d2s, pa.int64()),
                "n": pa.array(cnts, pa.int64()),
            }
        )

    common = (
        masks.map_batches(count_pairs, batch_format="pyarrow")
        .groupby(["d1", "d2"])
        .aggregate(Sum("n", alias_name="n_common"))
        .to_pandas()
        .sort_values(["d1", "d2"], kind="mergesort")
    )
    common = common[common["n_common"] > 0]
    d1 = common["d1"].to_numpy().astype(np.int64)
    d2 = common["d2"].to_numpy().astype(np.int64)
    nc = common["n_common"].to_numpy().astype(np.int64)
    n1 = np.array([per_day[int(a)] for a in d1], np.int64)
    n2 = np.array([per_day[int(a)] for a in d2], np.int64)
    union = n1 + n2 - nc
    return pa.table(
        {
            "d1": pa.array(d1),
            "d2": pa.array(d2),
            "n_common": pa.array(nc),
            "n_union": pa.array(union),
            "jaccard_ppm": pa.array((nc * 1_000_000) // union),
        }
    )


EVENTS_DAILY_AUDIENCE_OVERLAP_SQL = """
WITH d AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
  FROM events),
per AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
c AS (SELECT a.d AS d1, b.d AS d2, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM d a JOIN d b ON a.u = b.u AND a.d < b.d GROUP BY 1, 2)
SELECT d1, d2, n_common,
       CAST(p1.n + p2.n - n_common AS BIGINT) AS n_union,
       CAST(n_common * 1000000 // (p1.n + p2.n - n_common) AS BIGINT) AS jaccard_ppm
FROM c JOIN per p1 ON c.d1 = p1.d JOIN per p2 ON c.d2 = p2.d
ORDER BY d1, d2
"""


def docs_token_fertility_by_lang(sf_dir: str):
    """Tokenizer fertility audit per language: alnum-token count over
    whitespace-word count as exact integer ppm — the number a tokenizer
    team watches per language before committing a vocab.  Both counts are
    ONE vectorized ``count_substring_regex`` call per batch (no list
    materialization, no per-row loop); per-lang partials fold through a
    5-row groupby."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        words = pc.count_substring_regex(t["text"], pattern=r"\S+")
        toks = pc.count_substring_regex(pc.utf8_lower(t["text"]), pattern=r"[a-z0-9]+")
        tb = pa.table(
            {
                "lang": t["lang"],
                "w": pc.cast(words, pa.int64()),
                "k": pc.cast(toks, pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("lang").aggregate([("w", "sum"), ("k", "sum"), ("one", "sum")])
        return g.rename_columns(["lang", "w", "k", "one"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("w", alias_name="n_words"),
            Sum("k", alias_name="n_tokens"),
            Sum("one", alias_name="n_docs"),
        )
        .to_pandas()
        .sort_values("lang", kind="mergesort")
    )
    w = agg["n_words"].to_numpy().astype(np.int64)
    k = agg["n_tokens"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "lang": pa.array(agg["lang"].tolist(), pa.string()),
            "n_docs": pa.array(agg["n_docs"].to_numpy().astype(np.int64)),
            "n_words": pa.array(w),
            "n_tokens": pa.array(k),
            "fertility_ppm": pa.array((k * 1_000_000) // w),
        }
    )


DOCS_TOKEN_FERTILITY_BY_LANG_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n_words,
       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
         AS n_tokens,
       CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) * 1000000
            // SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT)
         AS fertility_ppm
FROM documents GROUP BY 1 ORDER BY 1
"""


def customers_all_orders_above(sf_dir: str):
    """Universal quantifier via HAVING MIN (relational-division lite):
    repeat customers (≥ 2 orders) whose EVERY order exceeds $500 — the
    ∀-condition expressed as an aggregate gate, no anti-join needed.
    Block-local (custkey → min, count) partials, one keyed groupby, then a
    vectorized filter; threshold compared in exact cents."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    threshold = 50_000  # cents

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "ck": pc.cast(t["o_custkey"], pa.int64()),
                "c": _cents(t["o_totalprice"]),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("ck").aggregate([("c", "min"), ("one", "sum")])
        return g.rename_columns(["ck", "mn", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Min("mn", alias_name="min_cents"), Sum("n", alias_name="n_orders"))
        .map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": t["ck"],
                    "n_orders": t["n_orders"],
                    "min_cents": t["min_cents"],
                }
            ).filter(
                pc.and_(
                    pc.greater_equal(t["min_cents"], threshold),
                    pc.greater_equal(t["n_orders"], 2),
                )
            ),
            batch_format="pyarrow",
        )
        .sort(["c_custkey"])
    )


CUSTOMERS_ALL_ORDERS_ABOVE_SQL = """
SELECT CAST(o_custkey AS BIGINT) AS c_custkey,
       COUNT(*) AS n_orders,
       CAST(MIN(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents
FROM orders
GROUP BY 1
HAVING MIN(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) >= 50000 AND COUNT(*) >= 2
ORDER BY 1
"""


def events_first_touch_value(sf_dir: str):
    """First-touch attribution per (user, day): the day's FIRST event type
    (ts order, event_id tie-break) is credited with the whole day's value —
    the marketing-attribution primitive.  Co-partition by user; the
    per-group kernel sorts once, derives day boundaries by vectorized
    comparison, and reduces first-index/sum/count per day with
    ``np.add.at`` — no per-day Python loop."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type", "value"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        ts = g["ts"].combine_chunks().to_numpy(zero_copy_only=False).astype("datetime64[us]")
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        typ = g["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        c = _cents(g["value"]).to_numpy()
        order = np.lexsort((eid, ts.astype(np.int64)))
        ts, typ, c = ts[order], typ[order], c[order]
        day = ts.astype("datetime64[D]").astype(np.int64)
        new = np.r_[True, day[1:] != day[:-1]]
        gidx = np.cumsum(new) - 1
        ngroups = int(gidx[-1]) + 1
        sums = np.zeros(ngroups, np.int64)
        cnts = np.zeros(ngroups, np.int64)
        np.add.at(sums, gidx, c)
        np.add.at(cnts, gidx, 1)
        first_idx = np.flatnonzero(new)
        uid = int(g["user_id"][0].as_py())
        return pa.table(
            {
                "user_id": pa.array(np.full(ngroups, uid, np.int64)),
                "day": pa.array(day[first_idx]),
                "first_type": pa.array(typ[first_idx].tolist(), pa.string()),
                "day_total_cents": pa.array(sums),
                "n_events": pa.array(cnts),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["user_id", "day"])
    )


EVENTS_FIRST_TOUCH_VALUE_SQL = """
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         ts, event_id, event_type,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c
  FROM events),
f AS (SELECT user_id, day, event_type,
             row_number() OVER (PARTITION BY user_id, day
                                ORDER BY ts, event_id) AS rn
      FROM e),
s AS (SELECT user_id, day, CAST(SUM(c) AS BIGINT) AS day_total_cents,
             COUNT(*) AS n_events
      FROM e GROUP BY 1, 2)
SELECT s.user_id, s.day, f.event_type AS first_type, day_total_cents, n_events
FROM s JOIN f ON s.user_id = f.user_id AND s.day = f.day AND f.rn = 1
ORDER BY s.user_id, s.day
"""


_PROFILE_TABLES: dict[str, list[str]] = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


def tables_null_profile(sf_dir: str):
    """Whole-warehouse null profile: one (table, column) row with row and
    null counts for EVERY column of every table — the first screen of any
    data-quality audit.  Each table is one streamed pass; per-block null
    counts come straight from Arrow validity-bitmap metadata
    (``Array.null_count`` — O(1) per chunk, no value scan), folded through
    a tiny aggregate.  Tables profile sequentially; at fleet scale each
    would be its own job over its own partition set."""
    rows = []
    for tbl, cols in _PROFILE_TABLES.items():
        ds = rd.read_parquet(_t(sf_dir, tbl))

        def partial(t: pa.Table, cols=cols) -> pa.Table:
            return pa.table(
                {
                    "col": pa.array(cols, pa.string()),
                    "n_rows": pa.array(np.full(len(cols), t.num_rows, np.int64)),
                    "n_nulls": pa.array(
                        [t[c].null_count for c in cols], pa.int64()
                    ),
                }
            )

        agg = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("col")
            .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("n_nulls", alias_name="n_nulls"))
            .to_pandas()
        )
        for _, r in agg.iterrows():
            rows.append((tbl, r["col"], int(r["n_rows"]), int(r["n_nulls"])))
    rows.sort()
    return pa.table(
        {
            "tbl": pa.array([r[0] for r in rows], pa.string()),
            "col": pa.array([r[1] for r in rows], pa.string()),
            "n_rows": pa.array([r[2] for r in rows], pa.int64()),
            "n_nulls": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


TABLES_NULL_PROFILE_SQL = "\nUNION ALL\n".join(
    f"SELECT '{tbl}' AS tbl, '{col}' AS col, COUNT(*) AS n_rows,\n"
    f"       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls\n"
    f"FROM {tbl}"
    for tbl, cols in _PROFILE_TABLES.items()
    for col in cols
) + "\nORDER BY tbl, col"
