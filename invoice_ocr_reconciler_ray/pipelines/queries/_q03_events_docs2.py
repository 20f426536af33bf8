"""Query-registry family module 3/9 (dominant family: events_docs2; split from the monolithic queries.py)."""

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
from ._q02_events_docs import customer_order_counts



def lineitem_scaled_features(sf_dir: str):
    """Grouped FEATURE SCALING (z-score + min-max of quantity per return
    flag) — the ML-preprocessing normalization pass, bit-exact against SQL:
    group stats are exact int64 block partials (n, Σx, Σx², min, max —
    quantity ≤ 50 keeps Σx² far from overflow at any scale) merged on the
    driver and broadcast; every per-row double comes from ONE fixed IEEE
    expression (sqrt is correctly rounded, so numpy == DuckDB)."""
    stats_src = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t["l_quantity"], pa.int64())
        xn = x.to_numpy(zero_copy_only=False)
        tb = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n": pa.array(np.ones(len(xn), np.int64)),
                "sx": x,
                "sxx": pa.array(xn * xn),
                "mn": x,
                "mx": x,
            }
        )
        g = tb.group_by("l_returnflag").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sxx", "sum"),
             ("mn", "min"), ("mx", "max")]
        )
        return g.rename_columns(["l_returnflag", "n", "sx", "sxx", "mn", "mx"])

    parts = (
        stats_src.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("l_returnflag")
        .agg(n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum"),
             mn=("mn", "min"), mx=("mx", "max"))
    )
    flags = list(parts.index)
    n = parts["n"].to_numpy().astype(np.float64)
    sx = parts["sx"].to_numpy().astype(np.float64)
    sxx = parts["sxx"].to_numpy().astype(np.float64)
    mean = sx / n
    std = np.sqrt((n * sxx - sx * sx) / (n * n))
    mn = parts["mn"].to_numpy().astype(np.int64)
    den = (parts["mx"].to_numpy() - mn).astype(np.float64)
    flag_arr = pa.array(flags, pa.string())

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
    )

    def scale(t: pa.Table) -> pa.Table:
        x = (
            pc.cast(t["l_quantity"], pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        idx = pc.index_in(t["l_returnflag"], value_set=flag_arr).to_numpy(
            zero_copy_only=False
        )
        xf = x.astype(np.float64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "l_returnflag": t["l_returnflag"],
                "qty": pa.array(x, pa.int64()),
                "z_score": pa.array((xf - mean[idx]) / std[idx], pa.float64()),
                "minmax_scaled": pa.array(
                    (x - mn[idx]).astype(np.float64) / den[idx], pa.float64()
                ),
            }
        )

    return ds.map_batches(scale, batch_format="pyarrow")


LINEITEM_SCALED_FEATURES_SQL = """
WITH c AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem),
s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qty) AS BIGINT) AS sx,
         CAST(SUM(qty*qty) AS BIGINT) AS sxx,
         MIN(qty) AS mn, MAX(qty) AS mx
  FROM c GROUP BY l_returnflag)
SELECT c.l_orderkey, c.l_linenumber, c.l_returnflag, c.qty,
       (CAST(c.qty AS DOUBLE) - CAST(s.sx AS DOUBLE)/CAST(s.n AS DOUBLE))
       / sqrt((CAST(s.n AS DOUBLE)*CAST(s.sxx AS DOUBLE)
               - CAST(s.sx AS DOUBLE)*CAST(s.sx AS DOUBLE))
              / (CAST(s.n AS DOUBLE)*CAST(s.n AS DOUBLE))) AS z_score,
       CAST(c.qty - s.mn AS DOUBLE) / CAST(s.mx - s.mn AS DOUBLE)
         AS minmax_scaled
FROM c JOIN s ON c.l_returnflag = s.l_returnflag
"""


def lineitem_measure_corr(sf_dir: str):
    """Data-profiling CORRELATION MATRIX over the small-integer lineitem
    measures (quantity, discount cents, tax cents) via
    stages/regression.py:pairwise_corr — one partial row per block, exact
    int64 sums, fixed IEEE corr expression (matches DuckDB bit-for-bit
    without trusting its float-accumulating corr())."""
    from ...stages.regression import pairwise_corr

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_quantity", "l_discount", "l_tax"]
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "disc_cents": _cents(t["l_discount"]),
                "tax_cents": _cents(t["l_tax"]),
            }
        )

    return pairwise_corr(
        ds.map_batches(proj, batch_format="pyarrow"),
        cols=["qty", "disc_cents", "tax_cents"],
    )


LINEITEM_MEASURE_CORR_SQL = """
WITH c AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) AS disc_cents,
         CAST(FLOOR(l_tax*100 + 0.5) AS BIGINT) AS tax_cents
  FROM lineitem),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qty) AS BIGINT) AS s_q,
         CAST(SUM(disc_cents) AS BIGINT) AS s_d,
         CAST(SUM(tax_cents) AS BIGINT) AS s_t,
         CAST(SUM(qty*qty) AS BIGINT) AS ss_q,
         CAST(SUM(disc_cents*disc_cents) AS BIGINT) AS ss_d,
         CAST(SUM(tax_cents*tax_cents) AS BIGINT) AS ss_t,
         CAST(SUM(qty*disc_cents) AS BIGINT) AS sp_qd,
         CAST(SUM(qty*tax_cents) AS BIGINT) AS sp_qt,
         CAST(SUM(disc_cents*tax_cents) AS BIGINT) AS sp_dt
  FROM c)
SELECT 'qty' AS col_x, 'disc_cents' AS col_y, n AS n_rows,
       (CAST(n AS DOUBLE)*CAST(sp_qd AS DOUBLE)
        - CAST(s_q AS DOUBLE)*CAST(s_d AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE)*CAST(ss_q AS DOUBLE)
               - CAST(s_q AS DOUBLE)*CAST(s_q AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE)*CAST(ss_d AS DOUBLE)
                 - CAST(s_d AS DOUBLE)*CAST(s_d AS DOUBLE))) AS corr
FROM s
UNION ALL
SELECT 'qty', 'tax_cents', n,
       (CAST(n AS DOUBLE)*CAST(sp_qt AS DOUBLE)
        - CAST(s_q AS DOUBLE)*CAST(s_t AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE)*CAST(ss_q AS DOUBLE)
               - CAST(s_q AS DOUBLE)*CAST(s_q AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE)*CAST(ss_t AS DOUBLE)
                 - CAST(s_t AS DOUBLE)*CAST(s_t AS DOUBLE)))
FROM s
UNION ALL
SELECT 'disc_cents', 'tax_cents', n,
       (CAST(n AS DOUBLE)*CAST(sp_dt AS DOUBLE)
        - CAST(s_d AS DOUBLE)*CAST(s_t AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE)*CAST(ss_d AS DOUBLE)
               - CAST(s_d AS DOUBLE)*CAST(s_d AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE)*CAST(ss_t AS DOUBLE)
                 - CAST(s_t AS DOUBLE)*CAST(s_t AS DOUBLE)))
FROM s
"""


def events_chisq_type_dow(sf_dir: str):
    """Chi-square CONTINGENCY terms for event_type × ISO day-of-week — the
    independence-test statistic, emitted per CELL (not summed) so every
    value is a fixed IEEE expression over exact integer counts and the
    oracle hash can't depend on float summation order.  Block-local count
    partials merge on the driver (O(types·7) cells)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "event_type": t["event_type"],
                "dow": pc.cast(pc.add(pc.day_of_week(t["ts"]), 1), pa.int64()),
                "n_obs": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["event_type", "dow"]).aggregate([("n_obs", "sum")])
        return g.rename_columns(["event_type", "dow", "n_obs"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "dow"], as_index=False)["n_obs"]
        .sum()
    )
    row_tot = cells.groupby("event_type")["n_obs"].transform("sum").to_numpy()
    col_tot = cells.groupby("dow")["n_obs"].transform("sum").to_numpy()
    grand = np.float64(cells["n_obs"].sum())
    o = cells["n_obs"].to_numpy().astype(np.float64)
    e = row_tot.astype(np.float64) * col_tot.astype(np.float64) / grand
    return pa.table(
        {
            "event_type": pa.array(cells["event_type"], pa.string()),
            "dow": pa.array(cells["dow"].to_numpy().astype(np.int64)),
            "n_obs": pa.array(cells["n_obs"].to_numpy().astype(np.int64)),
            "expected": pa.array(e, pa.float64()),
            "chi2_term": pa.array((o - e) * (o - e) / e, pa.float64()),
        }
    )


EVENTS_CHISQ_TYPE_DOW_SQL = """
WITH c AS (
  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM events GROUP BY event_type, dow),
t AS (
  SELECT *,
         CAST(SUM(n_obs) OVER (PARTITION BY event_type) AS BIGINT) AS row_tot,
         CAST(SUM(n_obs) OVER (PARTITION BY dow) AS BIGINT) AS col_tot,
         CAST(SUM(n_obs) OVER () AS BIGINT) AS grand
  FROM c)
SELECT event_type, dow, n_obs,
       CAST(row_tot AS DOUBLE)*CAST(col_tot AS DOUBLE)/CAST(grand AS DOUBLE)
         AS expected,
       (CAST(n_obs AS DOUBLE)
        - CAST(row_tot AS DOUBLE)*CAST(col_tot AS DOUBLE)/CAST(grand AS DOUBLE))
       * (CAST(n_obs AS DOUBLE)
          - CAST(row_tot AS DOUBLE)*CAST(col_tot AS DOUBLE)/CAST(grand AS DOUBLE))
       / (CAST(row_tot AS DOUBLE)*CAST(col_tot AS DOUBLE)/CAST(grand AS DOUBLE))
         AS chi2_term
FROM t
"""


def docs_bpe_merges(sf_dir: str):
    """Tokenizer TRAINING: the first 10 BPE merges learned from the corpus
    (stages/bpe.py — ONE distributed word-frequency pass, then the
    inherently-sequential merge loop on the vocabulary-sized table, the
    standard trainer layout).  Rows-only: the iterative merge recurrence
    isn't SQL; determinism (lexicographic tie-break) is pytest-pinned."""
    from ...stages.bpe import train_bpe

    return train_bpe(
        rd.read_parquet(_t(sf_dir, "documents"), columns=["text"]),
        num_merges=10,
    )


def local_supplier_revenue(sf_dir: str):
    """TPC-H Q5-parity SIX-table join (deepest plan in the registry):
    revenue by nation for 1995 orders where customer and supplier share an
    ASIA nation.  Ray-first decomposition: region⨝nation⨝supplier collapse
    to driver-side broadcast structures (the classic dimension pre-join);
    customer is SEMI-FILTERED to region nations before the orders hash join
    (pushdown, not post-filter); the only all-to-all work is two
    ``Dataset.join``s hash-partitioned on the two fact keys (custkey,
    orderkey); the c_nat = s_nat equality applies as a vectorized
    post-join mask."""
    import pyarrow.parquet as pq

    nat = pq.read_table(_t(sf_dir, "nation")).to_pandas()
    reg = pq.read_table(_t(sf_dir, "region")).to_pandas()
    asia = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"]
    nat_keys = set(int(k) for k in asia["n_nationkey"])
    nat_name = dict(zip(asia["n_nationkey"].astype(int), asia["n_name"]))
    nat_set = pa.array(sorted(nat_keys), pa.int64())

    # pushdown: the region-nation filter goes INTO the supplier read
    # (row-group pruning) instead of after a full driver load (VERDICT r4 #3)
    sup = pq.read_table(
        _t(sf_dir, "supplier"),
        columns=["s_suppkey", "s_nationkey"],
        filters=[("s_nationkey", "in", sorted(nat_keys))],
    ).to_pandas()
    sup_key = pa.array(sup["s_suppkey"].astype(np.int64))
    sup_nat = sup["s_nationkey"].to_numpy().astype(np.int64)

    lo = int(np.datetime64("1995-01-01", "us").astype(np.int64))
    hi = int(np.datetime64("1996-01-01", "us").astype(np.int64))

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def ofilter(t: pa.Table) -> pa.Table:
        d = pc.cast(t["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )

    def cfilter(t: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(t["c_nationkey"], pa.int64()), value_set=nat_set)
        out = t.filter(keep)
        return pa.table(
            {
                "c_custkey": out["c_custkey"],
                "c_nat": pc.cast(out["c_nationkey"], pa.int64()),
            }
        )

    oc = orders.map_batches(ofilter, batch_format="pyarrow").join(
        cust.map_batches(cfilter, batch_format="pyarrow"),
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
        idx = pc.index_in(t["l_suppkey"], value_set=sup_key)
        keep = pc.is_valid(idx)
        out = t.filter(keep)
        ivals = idx.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
        rev = pc.multiply(
            out["l_extendedprice"], pc.subtract(1.0, out["l_discount"])
        )
        return pa.table(
            {
                "l_orderkey": out["l_orderkey"],
                "s_nat": pa.array(sup_nat[ivals], pa.int64()),
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

    def same_nation(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["s_nat"], t["c_nat"])
        out = t.filter(keep)
        return pa.table({"s_nat": out["s_nat"], "rev_c": out["rev_c"]})

    agg = (
        joined.map_batches(same_nation, batch_format="pyarrow")
        .groupby("s_nat")
        .aggregate(Sum("rev_c", alias_name="sum_rev_cents"), Count(alias_name="n_items"))
        .to_pandas()
    )
    return pa.table(
        {
            "n_name": pa.array(
                [nat_name[int(k)] for k in agg["s_nat"]], pa.string()
            ),
            "sum_rev_cents": pa.array(
                agg["sum_rev_cents"].to_numpy().astype(np.int64)
            ),
            "n_items": pa.array(agg["n_items"].to_numpy().astype(np.int64)),
        }
    )


LOCAL_SUPPLIER_REVENUE_SQL = """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_rev_cents,
       COUNT(*) AS n_items
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


def docs_lang_vocab_jaccard(sf_dir: str):
    """Corpus-level vocabulary overlap: exact Jaccard between every language
    pair's distinct-term sets — the cross-corpus similarity profile used to
    pick mixture weights.  Distributed part: block-local DISTINCT (lang,
    term) combiner (the ``group_by([]).aggregate([])`` idiom) so the driver
    only ever sees O(langs · vocab) pairs; the pairwise intersection math
    runs on that tiny table.  Jaccard = one fixed integer division."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        lang = t["lang"].combine_chunks().take(parents.filter(keep))
        return (
            pa.table({"lang": lang, "term": flat.filter(keep)})
            .group_by(["lang", "term"])
            .aggregate([])
        )

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow").to_pandas()
    vocab: dict[str, set] = {}
    for lang, term in zip(pairs["lang"], pairs["term"]):
        vocab.setdefault(lang, set()).add(term)
    langs = sorted(vocab)
    la, lb, ni, nu, jac = [], [], [], [], []
    for i in range(len(langs)):
        for j in range(i + 1, len(langs)):
            a, b = vocab[langs[i]], vocab[langs[j]]
            inter = len(a & b)
            union = len(a) + len(b) - inter
            la.append(langs[i])
            lb.append(langs[j])
            ni.append(inter)
            nu.append(union)
            jac.append(np.float64(inter) / np.float64(union))
    return pa.table(
        {
            "lang_a": pa.array(la, pa.string()),
            "lang_b": pa.array(lb, pa.string()),
            "n_inter": pa.array(ni, pa.int64()),
            "n_union": pa.array(nu, pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        }
    )


DOCS_LANG_VOCAB_JACCARD_SQL = """
WITH v AS (
  SELECT DISTINCT lang, term
  FROM (SELECT lang,
               unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  x -> x <> '')) AS term
        FROM documents)),
s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY lang),
p AS (SELECT a.lang AS lang_a, b.lang AS lang_b, a.n AS na, b.n AS nb
      FROM s a JOIN s b ON a.lang < b.lang),
i AS (SELECT va.lang AS lang_a, vb.lang AS lang_b,
             CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM v va JOIN v vb ON va.term = vb.term AND va.lang < vb.lang
      GROUP BY 1, 2)
SELECT p.lang_a, p.lang_b,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(p.na + p.nb - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / CAST(p.na + p.nb - COALESCE(i.n_inter, 0) AS DOUBLE) AS jaccard
FROM p LEFT JOIN i ON i.lang_a = p.lang_a AND i.lang_b = p.lang_b
"""


def docs_token_chunks(sf_dir: str):
    """Token-window CHUNKING with overlap (window 64, stride 48) — the
    context-window splitter every RAG/pretraining prep needs.  Fully
    vectorized: the anchor loop runs over the ≤ ceil(max_len/48) stride
    positions, each applying ``list_slice`` + ``binary_join`` across ALL
    docs in the batch at once — no Python loop over documents.  Tokens are
    the whitespace split (the ``token_counts`` definition) so the rejoined
    chunk text is whitespace-normalized identically in SQL."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    window, stride = 64, 48

    def chunk(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t["text"])
        toks = pc.split_pattern_regex(trimmed, pattern=r"\s+").combine_chunks()
        nonempty = pc.not_equal(trimmed, "")
        n = np.where(
            nonempty.to_numpy(zero_copy_only=False),
            pc.list_value_length(toks).to_numpy(zero_copy_only=False),
            0,
        ).astype(np.int64)
        ids = t["doc_id"].combine_chunks()
        out_id, out_idx, out_start, out_len, out_text = [], [], [], [], []
        max_n = int(n.max()) if len(n) else 0
        i = 0
        # anchor i is emitted only while the PREVIOUS window hasn't reached
        # the doc end — the tail is covered without fully-redundant chunks
        while (i == 0 and max_n > 0) or (
            i > 0 and (i - 1) * stride + window < max_n
        ):
            start = i * stride
            need = n > 0 if i == 0 else n > (i - 1) * stride + window
            sel = np.nonzero(need)[0]
            if not len(sel):
                break
            sel_pa = pa.array(sel)
            sliced = pc.list_slice(
                toks.take(sel_pa), start=start, stop=start + window
            )
            out_text.append(pc.binary_join(sliced, " "))
            out_id.append(ids.take(sel_pa))
            out_idx.append(pa.array(np.full(len(sel), i, np.int64)))
            out_start.append(pa.array(np.full(len(sel), start, np.int64)))
            out_len.append(
                pa.array(np.minimum(window, n[sel] - start), pa.int64())
            )
            i += 1
        if not out_id:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk_start": pa.array([], pa.int64()),
                    "chunk_len": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [a.combine_chunks() if hasattr(a, "combine_chunks") else a
                     for a in out_id]
                ),
                "chunk_idx": pa.concat_arrays(out_idx),
                "chunk_start": pa.concat_arrays(out_start),
                "chunk_len": pa.concat_arrays(out_len),
                "chunk_text": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                     for c in out_text]
                ),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")


DOCS_TOKEN_CHUNKS_SQL = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split_regex(trim(text), '\\s+') END AS l
  FROM documents),
b AS (
  -- anchor bound derived from the corpus itself (the Ray op loops
  -- unbounded, so a fixed anchor cap would diverge on a >48k-token doc);
  -- the range() TABLE function only takes constants, so generate anchors
  -- with the scalar list range + unnest instead
  SELECT CAST(COALESCE(MAX(len(l)), 0) / 48 + 2 AS BIGINT) AS hi FROM d),
r AS (SELECT CAST(unnest(range(0, hi)) AS BIGINT) AS range FROM b),
c AS (
  SELECT doc_id, l, len(l) AS n, CAST(r.range AS BIGINT) AS chunk_idx
  FROM d JOIN r
    ON (r.range = 0 AND len(l) > 0)
    OR (r.range > 0 AND 48 * (r.range - 1) + 64 < len(l)))
SELECT doc_id, chunk_idx,
       CAST(48 * chunk_idx AS BIGINT) AS chunk_start,
       CAST(LEAST(64, n - 48 * chunk_idx) AS BIGINT) AS chunk_len,
       array_to_string(l[48 * chunk_idx + 1 : 48 * chunk_idx + 64], ' ')
         AS chunk_text
FROM c
"""


def events_user_value_ewma(sf_dir: str):
    """Per-user EWMA of event values (α = 0.25, (ts, id) order) — the
    streaming smoothing aggregate (stages/timeseries.py:grouped_ewma:
    co-partition by user, closed-form dot product per group)."""
    from ...stages.timeseries import grouped_ewma

    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )
    return grouped_ewma(
        ds,
        key_col="user_id",
        ts_col="ts",
        id_col="event_id",
        value_col="value",
        alpha=0.25,
    )


def lineitem_weighted_median(sf_dir: str):
    """WEIGHTED median (price weighted by quantity) per return flag — the
    weighted-quantile aggregate (sampling temperatures, importance-weighted
    corpus stats).  Exact integer semantics: per-(flag, value) weight
    partials are the block combiner (shuffle carries distinct values, not
    rows); each flag's group kernel sorts its distinct values, integer-
    cumsums the weights, and picks the smallest value whose doubled
    cumulative weight reaches the total — no float ever enters.  For a
    value domain too big for one group, the histogram-refine machinery in
    stages/quantiles.py is the documented scale path."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "price_cents": _cents(t["l_extendedprice"]),
                "w": pc.cast(t["l_quantity"], pa.int64()),
            }
        )
        g = tb.group_by(["l_returnflag", "price_cents"]).aggregate([("w", "sum")])
        return g.rename_columns(["l_returnflag", "price_cents", "w"])

    def pick(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("price_cents", "ascending")])
        s = g.take(order)
        w = s["w"].combine_chunks().to_numpy(zero_copy_only=False)
        cw = np.cumsum(w)
        total = int(cw[-1])
        idx = int(np.searchsorted(2 * cw, total))
        return pa.table(
            {
                "l_returnflag": s["l_returnflag"].slice(0, 1),
                "weighted_median_cents": s["price_cents"].slice(idx, 1),
                "total_weight": pa.array([total], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .map_groups(pick, batch_format="pyarrow")
    )


LINEITEM_WEIGHTED_MEDIAN_SQL = """
WITH v AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS price_cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2),
t AS (
  SELECT l_returnflag, price_cents,
         SUM(w) OVER (PARTITION BY l_returnflag
                      ORDER BY price_cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM v)
SELECT l_returnflag,
       CAST(MIN(price_cents) AS BIGINT) AS weighted_median_cents,
       CAST(MIN(tw) AS BIGINT) AS total_weight
FROM t WHERE 2*cw >= tw GROUP BY l_returnflag
"""


def docs_quality_classifier(sf_dir: str):
    """Distributed CLASSIFIER TRAINING demo (fastText-style curation
    gate): full-batch logistic regression predicting lang=='en' from two
    cheap text features, via the parameter-broadcast / gradient-reduce
    loop in stages/sgd.py (one map_batches pass per epoch, O(features)
    driver fold — never a shuffle).  Rows-only: the iterative update isn't
    SQL; determinism + convergence are pytest-pinned.  Returns the model
    as (param, value) rows."""
    from ...functions.textstats import token_count
    from ...stages.sgd import train_logistic

    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["text", "lang", "n_chars"]
    )

    def feat(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x_chars": pc.divide(
                    pc.cast(t["n_chars"], pa.float64()), 1000.0
                ),
                "x_tokens": pc.divide(
                    pc.cast(token_count(t["text"]), pa.float64()), 100.0
                ),
                "y": pc.cast(pc.equal(t["lang"], "en"), pa.int8()),
            }
        )

    # the feature table is NARROW (3 doubles) — materialize once so the 10
    # epochs iterate on cached blocks instead of re-reading + re-tokenizing
    features = ds.map_batches(feat, batch_format="pyarrow").materialize()
    model = train_logistic(
        features,
        feature_cols=["x_chars", "x_tokens"],
        label_col="y",
        lr=0.5,
        epochs=10,
    )
    return pa.table(
        {
            "param": pa.array(
                ["w_x_chars", "w_x_tokens", "bias", "final_loss", "n_rows"],
                pa.string(),
            ),
            "value": pa.array(
                [
                    model["weights"][0],
                    model["weights"][1],
                    model["bias"],
                    model["losses"][-1],
                    float(model["n_rows"]),
                ],
                pa.float64(),
            ),
        }
    )


def dedup_canonical_pick(sf_dir: str):
    """Duplicate-cluster CANONICALIZATION: per exact-duplicate group (text
    md5), keep the best representative (longest n_chars, ties to the
    smallest doc_id) and record the cluster size — the "merge dup records
    into one canonical row" step after any dedup pass (the flagship flags
    duplicates; this op picks survivors).  Shuffle carries (fp, doc_id,
    n_chars) only — text never moves."""
    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"]
    )

    def fp(t: pa.Table) -> pa.Table:
        import hashlib

        fps = [
            hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "fp_md5": pa.array(fps, pa.string()),
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
            }
        )

    def pick(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g,
            sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")],
        )
        s = g.take(order)
        return pa.table(
            {
                "fp_md5": s["fp_md5"].slice(0, 1),
                "doc_id": s["doc_id"].slice(0, 1),
                "n_chars": s["n_chars"].slice(0, 1),
                "group_size": pa.array([len(g)], pa.int64()),
            }
        )

    return (
        ds.map_batches(fp, batch_format="pyarrow")
        .groupby("fp_md5")
        .map_groups(pick, batch_format="pyarrow")
    )


DEDUP_CANONICAL_PICK_SQL = """
SELECT md5(text) AS fp_md5, doc_id, n_chars,
       CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS group_size
FROM documents
QUALIFY row_number() OVER (PARTITION BY md5(text)
                           ORDER BY n_chars DESC, doc_id) = 1
"""


def linkage_block_cost(sf_dir: str):
    """Blocked-join COST PROFILE: candidate-pair count per blocking key
    (nation) for the customer×supplier linkage — the planner statistic
    that says whether a blocking scheme is viable before running it
    (n_pairs = |big block| · |small block|, exactly the work
    ``blocked_fuzzy_join`` will do).  Two tiny per-block count combiners,
    driver product — no join executes."""
    cds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey"])
    sds = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_nationkey"])

    def count_col(col: str):
        def f(t: pa.Table) -> pa.Table:
            tb = pa.table(
                {
                    "nationkey": pc.cast(t[col], pa.int64()),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            g = tb.group_by("nationkey").aggregate([("n", "sum")])
            return g.rename_columns(["nationkey", "n"])

        return f

    c = (
        cds.map_batches(count_col("c_nationkey"), batch_format="pyarrow")
        .to_pandas()
        .groupby("nationkey", as_index=False)["n"]
        .sum()
    )
    s = (
        sds.map_batches(count_col("s_nationkey"), batch_format="pyarrow")
        .to_pandas()
        .groupby("nationkey", as_index=False)["n"]
        .sum()
    )
    m = c.merge(s, on="nationkey", suffixes=("_c", "_s"))
    return pa.table(
        {
            "nationkey": pa.array(m["nationkey"].to_numpy().astype(np.int64)),
            "n_customers": pa.array(m["n_c"].to_numpy().astype(np.int64)),
            "n_suppliers": pa.array(m["n_s"].to_numpy().astype(np.int64)),
            "n_pairs": pa.array(
                (m["n_c"].to_numpy() * m["n_s"].to_numpy()).astype(np.int64)
            ),
        }
    )


LINKAGE_BLOCK_COST_SQL = """
WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                  CAST(COUNT(*) AS BIGINT) AS n_customers
           FROM customer GROUP BY 1),
s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM supplier GROUP BY 1)
SELECT c.nationkey, c.n_customers, s.n_suppliers,
       CAST(c.n_customers * s.n_suppliers AS BIGINT) AS n_pairs
FROM c JOIN s ON c.nationkey = s.nationkey
"""


def orders_semi_join_returned(sf_dir: str):
    """EXISTS semi-join (TPC-H Q4 shape): orders having at least one
    returned lineitem, counted per priority.  Distributed shape: block-local
    DISTINCT partials shrink the returned-key stream (the
    ``group_by(keys).aggregate([])`` idiom), a hash groupby makes them
    globally distinct, and the semi-join is an inner ``Dataset.join``
    against the distinct-key Dataset — never a driver key-set when the key
    domain is fact-scaled."""
    keys = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag"],
        filter=pc.field("l_returnflag") == "R",
    ).map_batches(
        lambda t: t.select(["l_orderkey"]).group_by("l_orderkey").aggregate([]),
        batch_format="pyarrow",
    ).groupby("l_orderkey").aggregate(Count(alias_name="_n"))

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    return (
        orders.join(
            keys,
            join_type="inner",
            num_partitions=8,
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )
        .groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
    )


ORDERS_SEMI_JOIN_RETURNED_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY 1
"""


def large_orders_topk(sf_dir: str):
    """HAVING-filter + join-back (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds 150, top-10 by total price.  Block-local
    per-order quantity partials pre-aggregate before the one hash groupby;
    the join back to orders is inner at the measured-optimal 8 partitions;
    ties at the limit break on o_orderkey ASC in both engines."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"])

    def part(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
            }
        )
        g = tb.group_by("l_orderkey").aggregate([("qty", "sum")])
        return g.rename_columns(["l_orderkey", "qty"])

    big = (
        li.map_batches(part, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("qty", alias_name="total_qty"))
        .filter(expr="total_qty > 150")
    )
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "price_cents": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    joined = orders.join(
        big,
        join_type="inner",
        num_partitions=8,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )
    return joined.sort(
        ["price_cents", "o_orderkey"], descending=[True, False]
    ).limit(10)


LARGE_ORDERS_TOPK_SQL = """
WITH q AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
SELECT o_orderkey, o_custkey,
       CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents,
       q.total_qty
FROM orders JOIN q ON o_orderkey = q.l_orderkey
ORDER BY price_cents DESC, o_orderkey
LIMIT 10
"""


def sole_supplier_orders(sf_dir: str):
    """Multi-step distinct→count→filter→join composition (TPC-H Q21 family):
    suppliers who were the ONLY supplier on finished ('F') orders, top-10 by
    how many such orders.  Global (order, supplier) DISTINCT via block-local
    pair-dedup partials + one two-key groupby; the n_supp==1 filter then
    makes max(suppkey) THE supplier; semi-join against F orders and a final
    tiny count.  Every shuffle carries pre-deduped pairs only."""
    pairs = (
        rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"])
        .map_batches(
            lambda t: t.group_by(["l_orderkey", "l_suppkey"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Count(alias_name="_n"))
    )
    per_order = (
        pairs.map_batches(
            lambda t: t.select(["l_orderkey", "l_suppkey"]), batch_format="pyarrow"
        )
        .groupby("l_orderkey")
        .aggregate(Count(alias_name="n_supp"), Max("l_suppkey", alias_name="suppkey"))
        .filter(expr="n_supp == 1")
    )
    f_orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderstatus"],
        filter=pc.field("o_orderstatus") == "F",
    )
    sole_f = per_order.join(
        f_orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return (
        sole_f.groupby("suppkey")
        .aggregate(Count(alias_name="n_orders"))
        .sort(["n_orders", "suppkey"], descending=[True, False])
        .limit(10)
    )


SOLE_SUPPLIER_ORDERS_SQL = """
WITH p AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
s AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_supp,
             MAX(l_suppkey) AS suppkey
      FROM p GROUP BY 1)
SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM s JOIN orders ON o_orderkey = s.l_orderkey
WHERE n_supp = 1 AND o_orderstatus = 'F'
GROUP BY 1
ORDER BY n_orders DESC, suppkey
LIMIT 10
"""


def idle_rich_customers(sf_dir: str):
    """Global-scalar broadcast + SHUFFLE anti-join (TPC-H Q22 shape):
    customers with above-average positive balance and NO urgent order, per
    market segment.  The average gate is evaluated as an exact integer
    cross-multiply (bal_cents · n > sum_cents — no float division on either
    engine); the anti-join runs as a left-outer ``Dataset.join`` against the
    distinct customer keys of urgent orders with a null-probe filter — the
    shuffle mechanism, complementing the broadcast key-set anti-join of
    ``customers_without_early_orders``."""
    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_acctbal", "c_mktsegment"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["c_custkey"],
                "bal_cents": _cents(t["c_acctbal"]),
                "c_mktsegment": t["c_mktsegment"],
            }
        ),
        batch_format="pyarrow",
    )
    # exact global average gate: per-block (sum, n) partials over positive
    # balances, folded on the driver as integers
    parts = list(
        cust.map_batches(
            lambda t: pa.table(
                {
                    "s": pa.array(
                        [
                            pc.sum(
                                pc.if_else(
                                    pc.greater(t["bal_cents"], 0), t["bal_cents"], 0
                                )
                            ).as_py()
                            or 0
                        ],
                        pa.int64(),
                    ),
                    "n": pa.array(
                        [pc.sum(pc.cast(pc.greater(t["bal_cents"], 0), pa.int64())).as_py() or 0],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
    )
    tot = pa.concat_tables(parts)
    sum_c = int(pc.sum(tot["s"]).as_py() or 0)
    n_pos = int(pc.sum(tot["n"]).as_py() or 1)

    okeys = (
        rd.read_parquet(
            _t(sf_dir, "orders"),
            columns=["o_custkey", "o_orderpriority"],
            filter=pc.field("o_orderpriority") == "1-URGENT",
        )
        .map_batches(
            lambda t: t.select(["o_custkey"]).group_by("o_custkey").aggregate([]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Count(alias_name="_n"))
    )
    rich = cust.map_batches(
        lambda t, s=sum_c, n=n_pos: t.filter(
            pc.greater(pc.multiply(t["bal_cents"], n), s)
        ),
        batch_format="pyarrow",
    )
    left = rich.join(
        okeys,
        join_type="left_outer",
        num_partitions=8,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )
    idle = left.map_batches(
        lambda t: t.filter(pc.is_null(t["_n"])).drop_columns(["_n"]),
        batch_format="pyarrow",
    )
    return idle.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers"), Sum("bal_cents", alias_name="bal_cents")
    )


IDLE_RICH_CUSTOMERS_SQL = """
WITH b AS (
  SELECT c_custkey, c_mktsegment,
         CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer),
a AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
      FROM b WHERE bal_cents > 0)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(bal_cents) AS BIGINT) AS bal_cents
FROM b, a
WHERE bal_cents * a.n > a.s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY 1
"""


def orders_price_rank_stats(sf_dir: str):
    """Global RANK / percent_rank / cume_dist window stats (completing the
    row_number/ntile family of ``orders_price_ntile``): exact tie-sharing
    ranks from value-range buckets (stages/rank.py:global_value_rank_stats —
    O(B) driver offsets, one co-partition shuffle, never a global sort), and
    the two ratios as ONE fixed IEEE division each, identical to DuckDB's
    percent_rank()/cume_dist() definitions."""
    from ...stages.rank import global_value_rank_stats

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"], "price_cents": _cents(t["o_totalprice"])}
        ),
        batch_format="pyarrow",
    )
    ranked = global_value_rank_stats(ds, value_col="price_cents", id_col="o_orderkey")

    def ratios(t: pa.Table) -> pa.Table:
        rnk = t["rnk"].combine_chunks().to_numpy(zero_copy_only=False)
        n_le = t["n_le"].combine_chunks().to_numpy(zero_copy_only=False)
        n = t["n_total"].combine_chunks().to_numpy(zero_copy_only=False)
        pct = (rnk - 1).astype(np.float64) / (n - 1).astype(np.float64)
        cume = n_le.astype(np.float64) / n.astype(np.float64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "price_cents": t["price_cents"],
                "rnk": t["rnk"],
                "pct_rank": pa.array(pct, pa.float64()),
                "cume": pa.array(cume, pa.float64()),
            }
        )

    return ranked.map_batches(ratios, batch_format="pyarrow")


ORDERS_PRICE_RANK_STATS_SQL = """
WITH p AS (
  SELECT o_orderkey, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
  FROM orders)
SELECT o_orderkey, price_cents,
       CAST(rank() OVER (ORDER BY price_cents) AS BIGINT) AS rnk,
       percent_rank() OVER (ORDER BY price_cents) AS pct_rank,
       cume_dist() OVER (ORDER BY price_cents) AS cume
FROM p
"""


def orders_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((status), (priority), ()) — completing the
    rollup/cube family: ONE block-local (status, priority) pre-aggregation
    pass (the partial is O(|status|·|priority|) per block), materialized
    narrow, then three tiny groupbys over the partials union into the
    grouping-sets result.  NULL-key marking matches DuckDB's (the grouping
    column absent from a set is NULL)."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )

    def part(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "s": t["o_orderstatus"],
                "p": t["o_orderpriority"],
                "cents": _cents(t["o_totalprice"]),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["s", "p"]).aggregate([("cents", "sum"), ("one", "sum")])
        return g.rename_columns(["s", "p", "cents", "n"])

    partials = ds.map_batches(part, batch_format="pyarrow").materialize()

    by_s = partials.groupby("s").aggregate(
        Sum("cents", alias_name="rev_cents"), Sum("n", alias_name="n_orders")
    )
    by_p = partials.groupby("p").aggregate(
        Sum("cents", alias_name="rev_cents"), Sum("n", alias_name="n_orders")
    )
    tot = partials.aggregate(
        Sum("cents", alias_name="rev_cents"), Sum("n", alias_name="n_orders")
    )

    def wide_s(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t["s"],
                "o_orderpriority": pa.nulls(t.num_rows, pa.string()),
                "rev_cents": t["rev_cents"],
                "n_orders": t["n_orders"],
            }
        )

    def wide_p(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": pa.nulls(t.num_rows, pa.string()),
                "o_orderpriority": t["p"],
                "rev_cents": t["rev_cents"],
                "n_orders": t["n_orders"],
            }
        )

    total_tbl = pa.table(
        {
            "o_orderstatus": pa.nulls(1, pa.string()),
            "o_orderpriority": pa.nulls(1, pa.string()),
            "rev_cents": pa.array([int(tot["rev_cents"])], pa.int64()),
            "n_orders": pa.array([int(tot["n_orders"])], pa.int64()),
        }
    )
    return (
        by_s.map_batches(wide_s, batch_format="pyarrow")
        .union(by_p.map_batches(wide_p, batch_format="pyarrow"))
        .union(rd.from_arrow(total_tbl))
    )


ORDERS_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def events_anomaly_zscore(sf_dir: str):
    """Per-type 3σ outlier FLAG (flag-don't-drop, the anomaly-detection
    shape) with a float-free test: (n·v − s)² > 9·(n·ss − s²) over integer
    cents is exactly |z| > 3 — no sqrt, no division, no IEEE anywhere, so
    the oracle can't diverge by an ulp.  Per-block (type → n, s, ss)
    partials merge on the driver (O(|types|)), broadcast once, probed
    vectorized.  int64 headroom: safe to ~10^6 rows/type at cent scale;
    beyond that promote the products to float128/object or split s² (noted
    here so the guard is explicit)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_cents": _cents(t["value"]),
            }
        ),
        batch_format="pyarrow",
    )

    def stat_part(t: pa.Table) -> pa.Table:
        tb = t.append_column(
            "sq", pc.multiply(t["value_cents"], t["value_cents"])
        ).append_column("one", pa.array(np.ones(t.num_rows, np.int64)))
        g = tb.group_by("event_type").aggregate(
            [("one", "sum"), ("value_cents", "sum"), ("sq", "sum")]
        )
        return g.rename_columns(["event_type", "n", "s", "ss"])

    parts = list(
        ds.map_batches(stat_part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    merged = (
        pa.concat_tables(parts)
        .group_by("event_type")
        .aggregate([("n", "sum"), ("s", "sum"), ("ss", "sum")])
        .rename_columns(["event_type", "n", "s", "ss"])
    )
    ref = ray.put(
        {
            "types": merged["event_type"].combine_chunks(),
            "n": merged["n"].combine_chunks().to_numpy(),
            "s": merged["s"].combine_chunks().to_numpy(),
            "ss": merged["ss"].combine_chunks().to_numpy(),
        }
    )

    def probe(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        idx = pc.index_in(t["event_type"], value_set=st["types"]).to_numpy(
            zero_copy_only=False
        )
        n = st["n"][idx]
        s = st["s"][idx]
        ss = st["ss"][idx]
        v = t["value_cents"].combine_chunks().to_numpy()
        lhs = (n * v - s) ** 2
        rhs = 9 * (n * ss - s * s)
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_cents": t["value_cents"],
                "is_outlier": pa.array(lhs > rhs, pa.bool_()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


EVENTS_ANOMALY_ZSCORE_SQL = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_cents
  FROM events),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(value_cents) AS BIGINT) AS s,
         CAST(SUM(value_cents*value_cents) AS BIGINT) AS ss
  FROM v GROUP BY 1)
SELECT event_id, v.event_type, value_cents,
       (n*value_cents - s)*(n*value_cents - s) > 9*(n*ss - s*s) AS is_outlier
FROM v JOIN s ON v.event_type = s.event_type
"""


def events_value_histogram(sf_dir: str):
    """Fixed-width histogram (profiling family): 20-unit (2000-cent) bins of
    the event value with per-bin counts and exact cent sums — one block-local
    combiner pass, O(|bins|) shuffle."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["value"])

    def part(t: pa.Table) -> pa.Table:
        vc = _cents(t["value"])
        tb = pa.table(
            {
                "bin": pc.divide(vc, 2000),
                "cents": vc,
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("bin").aggregate([("one", "sum"), ("cents", "sum")])
        return g.rename_columns(["bin", "n", "cents"])

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
        .sort(["bin"])
    )


EVENTS_VALUE_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(value*100 + 0.5) AS BIGINT) // 2000 AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1 ORDER BY 1
"""


def orders_yearly_growth(sf_dir: str):
    """Year-over-year delta (lag() over an aggregate): per-year revenue in
    exact cents, distributed pre-aggregation, then the lag on the
    O(|years|) driver table — the aggregate-then-window reporting shape."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def part(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "cents": _cents(t["o_totalprice"]),
            }
        )
        g = tb.group_by("yr").aggregate([("cents", "sum")])
        return g.rename_columns(["yr", "cents"])

    agg = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(Sum("cents", alias_name="rev_cents"))
    )
    tiny = pa.Table.from_pylist(agg.take_all()).sort_by([("yr", "ascending")])
    rev = tiny["rev_cents"].to_numpy()
    delta = [None] + [int(d) for d in np.diff(rev)]
    return pa.table(
        {
            "yr": tiny["yr"],
            "rev_cents": tiny["rev_cents"],
            "delta_cents": pa.array(delta, pa.int64()),
        }
    )


ORDERS_YEARLY_GROWTH_SQL = """
WITH y AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1)
SELECT yr, rev_cents,
       CAST(rev_cents - lag(rev_cents) OVER (ORDER BY yr) AS BIGINT)
         AS delta_cents
FROM y
"""


def docs_partition_skew_audit(sf_dir: str):
    """Partition-layout skew audit (the diagnostic a 100 TB job runs before
    choosing bucket counts): rows + total chars per md5-prefix bucket of the
    would-be partition key.  md5 on both engines (same reproducible-hash
    contract as stages/rank.py:global_rank); block-local combiners, O(16)
    shuffle."""
    import hashlib as _hl

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def part(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        buckets = pa.array(
            [int(_hl.md5(str(i).encode()).hexdigest()[0], 16) for i in ids],
            pa.int64(),
        )
        tb = pa.table(
            {
                "bucket": buckets,
                "n_chars": pc.cast(
                    pc.utf8_length(pc.cast(t["text"], pa.string())), pa.int64()
                ),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by("bucket").aggregate([("one", "sum"), ("n_chars", "sum")])
        return g.rename_columns(["bucket", "n_docs", "n_chars"])

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
        .sort(["bucket"])
    )


DOCS_PARTITION_SKEW_AUDIT_SQL = """
SELECT CAST(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND '9'
            THEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 48
            ELSE ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 87 END
       AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars
FROM documents GROUP BY 1 ORDER BY 1
"""


def events_second_latest_per_user(sf_dir: str):
    """nth_value window (n=2): each user's SECOND-latest event — distinct
    from the latest-per-user argmax shape.  Lossless block-local prune: a
    block forwards at most its top-2 rows per user (a row with ≥2 later
    same-user rows in its own block can't be globally 2nd), so the shuffle
    carries O(2 · users · blocks) rows; the per-group kernel then sorts the
    tiny survivor set.  Users with a single event drop (matching the SQL
    row_number() = 2 filter)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "value_cents": _cents(t["value"]),
            }
        )

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        s = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("user_id", "ascending"),
                    ("ts_us", "descending"),
                    ("event_id", "descending"),
                ],
            )
        )
        u = s["user_id"].combine_chunks().to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        # position within the user's run (0-based); keep the first two
        idx = np.arange(len(u))
        run_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        keep = idx - run_start < 2
        return s.filter(pa.array(keep))

    def second(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("ts_us", "descending"), ("event_id", "descending")],
            )
        )
        if s.num_rows < 2:
            return s.slice(0, 0)
        return s.slice(1, 1)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(prune, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(second, batch_format="pyarrow")
    )


EVENTS_SECOND_LATEST_PER_USER_SQL = """
SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS value_cents
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 2
"""


def referential_integrity_audit(sf_dir: str):
    """Cross-table foreign-key audit (the data-contract check a 100 TB lake
    runs nightly): for each child→parent relationship, total child rows and
    orphan rows (child key absent from the parent).  Scale shape: child side
    reduces to per-key counts via block-local combiners + one keyed groupby
    (the shuffle carries distinct keys, not rows); a metadata-broadcastable
    parent reduces to its distinct key set (block-local pc.unique partials,
    budget-guarded broadcast) probed with is_in; an oversized parent takes a
    left_outer key-to-key shuffle join instead (Ray's hash-shuffle join
    chokes on partitions that receive zero blocks — only possible for tiny
    inputs, which the broadcast branch owns)."""
    from ...stages.broadcast import dim_is_broadcastable, guard_broadcast_bytes, table_nbytes
    rels = [
        ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    names, totals, orphans = [], [], []
    for name, child, ck, parent, pk in rels:
        child_counts = (
            rd.read_parquet(_t(sf_dir, child), columns=[ck])
            .map_batches(
                lambda t, ck=ck: t.group_by(ck)
                .aggregate([(ck, "count")])
                .rename_columns([ck, "n"]),
                batch_format="pyarrow",
            )
            .groupby(ck)
            .aggregate(Sum("n", alias_name="n"))
        )
        parent_distinct = rd.read_parquet(_t(sf_dir, parent), columns=[pk]).map_batches(
            lambda t, pk=pk: t.group_by(pk).aggregate([]),
            batch_format="pyarrow",
        )
        if dim_is_broadcastable(_t(sf_dir, parent), [pk]):
            # driver merge of block-distinct partials, guarded broadcast
            keys = pc.unique(
                pa.concat_tables(
                    list(parent_distinct.iter_batches(batch_format="pyarrow"))
                )[pk].combine_chunks()
            )
            guard_broadcast_bytes(
                table_nbytes(keys),
                label=f"referential audit parent keys ({parent})",
                alternative="the shuffle-join branch of this same audit",
            )
            kref = ray.put(keys)
            flagged = child_counts.map_batches(
                lambda t, ck=ck: pa.table(
                    {
                        "total": pa.array([pc.sum(t["n"]).as_py() or 0], pa.int64()),
                        "orphan": pa.array(
                            [
                                pc.sum(
                                    pc.if_else(
                                        pc.is_in(t[ck], value_set=ray.get(kref)),
                                        0,
                                        t["n"],
                                    )
                                ).as_py()
                                or 0
                            ],
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        else:
            parent_keys = parent_distinct.groupby(pk).aggregate(
                Count(alias_name="_p")
            )
            left = child_counts.join(
                parent_keys,
                join_type="left_outer",
                num_partitions=8,
                on=(ck,),
                right_on=(pk,),
            )
            flagged = left.map_batches(
                lambda t: pa.table(
                    {
                        "total": pa.array([pc.sum(t["n"]).as_py() or 0], pa.int64()),
                        "orphan": pa.array(
                            [
                                pc.sum(
                                    pc.if_else(pc.is_null(t["_p"]), t["n"], 0)
                                ).as_py()
                                or 0
                            ],
                            pa.int64(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        tot = orp = 0
        for row in flagged.iter_rows():
            tot += int(row["total"])
            orp += int(row["orphan"])
        names.append(name)
        totals.append(tot)
        orphans.append(orp)
    return pa.table(
        {
            "relationship": pa.array(names, pa.string()),
            "n_rows": pa.array(totals, pa.int64()),
            "n_orphans": pa.array(orphans, pa.int64()),
        }
    )


REFERENTIAL_INTEGRITY_AUDIT_SQL = """
SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relationship,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'orders.o_custkey->customer.c_custkey',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'customer.c_nationkey->nation.n_nationkey',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
UNION ALL
SELECT 'supplier.s_nationkey->nation.n_nationkey',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
UNION ALL
SELECT 'nation.n_regionkey->region.r_regionkey',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def custdist_order_counts(sf_dir: str):
    """Order-count distribution (TPC-H Q13 shape): how many customers placed
    exactly k orders, INCLUDING k=0 (the left-outer zero preservation of
    ``customer_order_counts``), then a second tiny groupby over the
    O(|distinct k|) histogram."""
    counts = customer_order_counts(sf_dir)
    return (
        counts.groupby("n_orders")
        .aggregate(Count(alias_name="n_customers"))
        .sort(["n_orders"])
    )


CUSTDIST_ORDER_COUNTS_SQL = """
WITH c AS (
  SELECT c.c_custkey, CAST(COUNT(o.o_custkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1)
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM c GROUP BY 1 ORDER BY 1
"""


def docs_winnowing_fingerprints(sf_dir: str):
    """MOSS winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03) —
    the local document-fingerprinting scheme whose guarantee (every match of
    length ≥ w+k−1 shares a fingerprint) underlies plagiarism/near-dup
    detection at corpus scale.  k=3 token k-grams hashed over DENSE-RANK
    token ids (sorted global vocabulary — both engines derive it, so the
    hash is engine-neutral: h = ((t₁·B + t₂) mod M · B + t₃) mod M); window
    w=4; each full window selects its MINIMUM hash, rightmost position on
    ties — one pack integer h·2³¹ + (2³¹−1−pos) makes a single window MIN
    implement both rules.  Vocabulary rides block-partial distincts + one
    driver sort + ``ray.put`` (O(vocab)); hashing, packing and the sliding
    min are pure numpy; docs shorter than k+w−1 tokens select nothing (the
    documented full-window contract)."""
    B, M = 1_000_003, 2_147_483_647
    W = 4
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def distinct_part(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        u = pc.list_flatten(toks).unique()
        return pa.table({"term": u.filter(pc.not_equal(u, ""))})

    vals: set[str] = set()
    for b in ds.map_batches(distinct_part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        vals.update(b["term"].to_pylist())
    vocab_ref = ray.put(pa.array(sorted(vals), pa.string()))

    _empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "fp_hash": pa.array([], pa.int64()),
        }
    )

    def fingerprints(t: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        fcol = flat.filter(keep)
        p = parents.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) < 3:
            return _empty
        # 1-based dense rank of each token in the sorted vocabulary
        tid = pc.add(pc.index_in(fcol, value_set=v), 1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # 1-based token position inside each doc (docs are block-contiguous)
        starts = np.flatnonzero(np.r_[True, p[1:] != p[:-1]])
        pos = (
            np.arange(len(p), dtype=np.int64)
            - np.repeat(starts, np.diff(np.r_[starts, len(p)]))
            + 1
        )
        same3 = (p[:-2] == p[1:-1]) & (p[1:-1] == p[2:])
        h = ((tid[:-2] * B + tid[1:-1]) % M * B + tid[2:]) % M
        kdoc, kpos, kh = p[:-2][same3], pos[:-2][same3], h[same3]
        if len(kh) < W:
            return _empty
        pack = kh * 2_147_483_648 + (2_147_483_647 - kpos)
        wmin = np.lib.stride_tricks.sliding_window_view(pack, W).min(axis=1)
        full = kdoc[: len(wmin)] == kdoc[W - 1 :]
        if not full.any():
            return _empty
        sel = np.unique(
            np.stack([doc_ids[kdoc[: len(wmin)][full]], wmin[full]], axis=1), axis=0
        )
        return pa.table(
            {
                "doc_id": pa.array(sel[:, 0], pa.int64()),
                "pos": pa.array(2_147_483_647 - sel[:, 1] % 2_147_483_648, pa.int64()),
                "fp_hash": pa.array(sel[:, 1] // 2_147_483_648, pa.int64()),
            }
        )

    return ds.map_batches(fingerprints, batch_format="pyarrow")


DOCS_WINNOWING_FINGERPRINTS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
t AS (SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l)+1)) AS pos
      FROM d),
v AS (SELECT term, CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS tid
      FROM (SELECT DISTINCT term FROM t)),
s AS (SELECT doc_id, pos, tid FROM t JOIN v USING (term)),
k AS (SELECT doc_id, pos,
             (((tid * 1000003 + lead(tid, 1) OVER win) % 2147483647) * 1000003
              + lead(tid, 2) OVER win) % 2147483647 AS h
      FROM s WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
p AS (SELECT doc_id, pos, h * 2147483648 + (2147483647 - pos) AS pack
      FROM k WHERE h IS NOT NULL),
w AS (SELECT doc_id,
             MIN(pack) OVER win AS wmin,
             COUNT(*) OVER win AS wn
      FROM p WINDOW win AS (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
sel AS (SELECT DISTINCT doc_id, wmin FROM w WHERE wn = 4)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(2147483647 - (wmin % 2147483648) AS BIGINT) AS pos,
       CAST(wmin // 2147483648 AS BIGINT) AS fp_hash
FROM sel ORDER BY doc_id, pos
"""


def orders_zorder_cluster(sf_dir: str):
    """Z-order (Morton-curve) multidimensional clustering key — the layout
    primitive behind Delta/Iceberg Z-ORDER: interleave the low 16 bits of
    o_custkey (even bit lanes) with the low 16 bits of the order's epoch-day
    (odd lanes) so range predicates on EITHER dimension prune contiguous
    key ranges.  The interleave is 16 numpy bit ops per block; block-local
    top-20 partials prune before a tiny global sort — no full-data
    shuffle."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def zkey(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            t["o_orderdate"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        c, d = ck & 0xFFFF, day & 0xFFFF
        z = np.zeros(len(c), np.int64)
        for i in range(16):
            z |= ((c >> i) & 1) << (2 * i)
            z |= ((d >> i) & 1) << (2 * i + 1)
        tb = pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "epoch_day": pa.array(day, pa.int64()),
                "zval": pa.array(z, pa.int64()),
            }
        )
        # block-local prune: only a block's own top-20 can reach the global top-20
        idx = pc.sort_indices(
            tb, sort_keys=[("zval", "descending"), ("o_orderkey", "ascending")]
        )
        return tb.take(idx[:20])

    return (
        ds.map_batches(zkey, batch_format="pyarrow")
        .sort(["zval", "o_orderkey"], descending=[True, False])
        .limit(20)
    )


_Z_TERMS = " + ".join(
    f"(((c >> {i}) & 1) << {2 * i}) + (((d >> {i}) & 1) << {2 * i + 1})"
    for i in range(16)
)
ORDERS_ZORDER_CLUSTER_SQL = f"""
WITH e AS (
  SELECT o_orderkey, o_custkey,
         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS epoch_day
  FROM orders),
b AS (SELECT o_orderkey, o_custkey, epoch_day,
             o_custkey & 65535 AS c, epoch_day & 65535 AS d
      FROM e)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       epoch_day,
       CAST({_Z_TERMS} AS BIGINT) AS zval
FROM b ORDER BY zval DESC, o_orderkey LIMIT 20
"""


def nation_revenue_gini(sf_dir: str):
    """Per-nation GINI COEFFICIENT of customer revenue — the classic
    inequality index via the sorted-rank identity G = (2·Σi·x₍ᵢ₎ − (n+1)·Σx)
    / (n·Σx), ascending sort (tie order is irrelevant: equal x contribute
    the same Σi·x over any permutation of their consecutive ranks).  Σi·x
    exceeds int64 at real scale, so the per-nation reduction runs in PYTHON
    BIG INTS over the O(customers) cell table (SQL mirrors in HUGEINT); the
    distributed part is the per-customer revenue groupby + the 8-partition
    hash join that attaches the nation key."""
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
    cells = rev.join(
        cust, join_type="inner", num_partitions=8, on=("c",), right_on=("c_custkey",)
    ).to_pandas()
    out = []
    for nk, grp in cells.groupby("c_nationkey"):
        xs = np.sort(grp["r"].to_numpy().astype(np.int64))
        n = len(xs)
        tot = sum(int(v) for v in xs)
        six = sum(i * int(v) for i, v in enumerate(xs, start=1))
        out.append((int(nk), n, (2 * six - (n + 1) * tot) * 1_000_000 // (n * tot)))
    out.sort()
    return pa.table(
        {
            "c_nationkey": pa.array([r[0] for r in out], pa.int64()),
            "n_customers": pa.array([r[1] for r in out], pa.int64()),
            "gini_ppm": pa.array([r[2] for r in out], pa.int64()),
        }
    )


NATION_REVENUE_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey AS c,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS r
  FROM orders GROUP BY 1),
j AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, r
      FROM rev JOIN customer ON c = c_custkey),
w AS (SELECT c_nationkey, r,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY r) AS i,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
             SUM(r) OVER (PARTITION BY c_nationkey) AS tot
      FROM j)
SELECT c_nationkey,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST((2*SUM(CAST(i AS HUGEINT)*r) - (MAX(n)+1)*CAST(MAX(tot) AS HUGEINT))
            * 1000000 // (CAST(MAX(n) AS HUGEINT) * MAX(tot)) AS BIGINT)
         AS gini_ppm
FROM w GROUP BY 1 ORDER BY 1
"""


def events_user_median_interp(sf_dir: str):
    """Per-user INTERPOLATED median (quantile_cont semantics) of event value,
    reported in HALF-CENTS so the even-count midpoint (x₍ₙ/₂₎+x₍ₙ/₂₊₁₎)/2
    stays an exact integer — no float quantile ever touches the compare.
    Co-partition by user; the kernel is one numpy sort + two picks.
    Completes the quantile family's disc-vs-cont axis
    (orders_price_quantiles / events_interarrival_median are discrete)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "value"])

    def med(g: pa.Table) -> pa.Table:
        c = np.sort(_cents(g["value"]).to_numpy(zero_copy_only=False))
        n = len(c)
        if n % 2 == 1:
            m2 = 2 * int(c[(n - 1) // 2])
        else:
            m2 = int(c[n // 2 - 1]) + int(c[n // 2])
        return pa.table(
            {
                "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "median_halfcents": pa.array([m2], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id").map_groups(med, batch_format="pyarrow").sort(["user_id"])
    )


EVENTS_USER_MEDIAN_INTERP_SQL = """
WITH v AS (SELECT user_id, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c FROM events),
w AS (SELECT user_id, c,
             row_number() OVER (PARTITION BY user_id ORDER BY c) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM v)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN rn IN ((n+1)//2, (n+2)//2) THEN c END)
            * (CASE WHEN MAX(n) % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT)
         AS median_halfcents
FROM w GROUP BY user_id ORDER BY user_id
"""


def events_rolling_max5(sf_dir: str):
    """Trailing-window MAX (ROWS 4 PRECEDING) per user — the order-statistic
    sibling of events_rolling_sum5: a sliding max is NOT a cumsum difference,
    so the kernel is a strided window-view reduction (the vectorized stand-in
    for the monotonic-deque algorithm) with a running-max prefix for the
    first w−1 rows."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def roll(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        cents = _cents(s["value"]).to_numpy(zero_copy_only=False)
        n = len(cents)
        out = np.maximum.accumulate(cents[: min(n, 4)])
        if n > 4:
            tail = np.lib.stride_tricks.sliding_window_view(cents, 5).max(axis=1)
            out = np.concatenate([out, tail])
        return pa.table(
            {
                "event_id": s["event_id"],
                "user_id": s["user_id"],
                "win5_max_cents": pa.array(out, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(roll, batch_format="pyarrow")


EVENTS_ROLLING_MAX5_SQL = """
SELECT event_id, user_id,
       CAST(MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS win5_max_cents
FROM events
"""


def events_type_fano(sf_dir: str):
    """Burstiness per event type as the FANO FACTOR of hourly arrival counts
    (var/mean of counts over the type's OBSERVED hours — the documented
    contract; a Poisson stream gives ≈1).  Two-level aggregation: block-
    partial (type, hour) counts shuffle at cell cardinality, then the
    var/mean ratio (n·Σx² − (Σx)²)·10⁶ // (n·Σx) reduces the tiny cell table
    in Python big ints (SQL mirrors in HUGEINT)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        tb = pa.table(
            {
                "typ": t["event_type"],
                "hour": pa.array(ts // 3_600_000_000, pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["typ", "hour"]).aggregate([("one", "sum")]).rename_columns(
            ["typ", "hour", "n"]
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["typ", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = []
    for typ, grp in cells.groupby("typ"):
        xs = [int(v) for v in grp["n"]]
        n, s, q = len(xs), sum(xs), sum(v * v for v in xs)
        out.append((str(typ), n, (n * q - s * s) * 1_000_000 // (n * s)))
    out.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in out], pa.string()),
            "n_hours": pa.array([r[1] for r in out], pa.int64()),
            "fano_ppm": pa.array([r[2] for r in out], pa.int64()),
        }
    )


EVENTS_TYPE_FANO_SQL = """
WITH c AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST((COUNT(*) * SUM(CAST(n AS HUGEINT)*n) - CAST(SUM(n) AS HUGEINT)*SUM(n))
            * 1000000 // (CAST(COUNT(*) AS HUGEINT) * SUM(n)) AS BIGINT)
         AS fano_ppm
FROM c GROUP BY 1 ORDER BY 1
"""


def events_audience_bitmap_intersect(sf_dir: str):
    """Bitmap-index audience overlap — common-user counts for every event-
    type pair computed the way OLAP bitmap indexes do it: the user-id space
    is sharded into 4096-id ranges; inside a range each type's audience is a
    64-word packed bitmap and every pair intersects via AND + byte-table
    POPCOUNT (the ssjoin.py:293 pattern).  Distinct (type, user) cells ride
    block partials + one groupby; the bitmap kernel runs per range group, so
    pair counts are range-partial sums — no O(users²) join anywhere, and at
    10⁹ users the ranges shard the bitmap exactly like a roaring index."""
    RANGE = 4096
    _POP = np.array([bin(x).count("1") for x in range(256)], dtype=np.int64)
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "user_id"])

    def distinct_part(t: pa.Table) -> pa.Table:
        return pa.table(
            {"typ": t["event_type"], "u": t["user_id"]}
        ).group_by(["typ", "u"]).aggregate([])

    cells = (
        ds.map_batches(distinct_part, batch_format="pyarrow")
        .groupby(["typ", "u"])
        .aggregate(Count(alias_name="_n"))
        .add_column("rng", lambda df: df["u"] // RANGE, batch_format="pandas")
    )

    _empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def bitmap_kernel(g: pa.Table) -> pa.Table:
        u = g["u"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        slot = u % RANGE
        word, bit = slot // 64, (slot % 64).astype(np.uint64)
        types = sorted(set(g["typ"].to_pylist()))
        tarr = np.array(g["typ"].to_pylist())
        bitmaps = {}
        for ty in types:
            m = tarr == ty
            bm = np.zeros(RANGE // 64, np.uint64)
            np.bitwise_or.at(bm, word[m], np.left_shift(np.uint64(1), bit[m]))
            bitmaps[ty] = bm
        rows_a, rows_b, rows_n = [], [], []
        for i, a in enumerate(types):
            for b in types[i + 1 :]:
                n = int(_POP[(bitmaps[a] & bitmaps[b]).view(np.uint8)].sum())
                if n:
                    rows_a.append(a)
                    rows_b.append(b)
                    rows_n.append(n)
        if not rows_n:
            return _empty
        return pa.table(
            {
                "type_a": pa.array(rows_a, pa.string()),
                "type_b": pa.array(rows_b, pa.string()),
                "n": pa.array(rows_n, pa.int64()),
            }
        )

    return (
        cells.groupby("rng")
        .map_groups(bitmap_kernel, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_common_users"))
        .sort(["type_a", "type_b"])
    )


EVENTS_AUDIENCE_BITMAP_INTERSECT_SQL = """
WITH p AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_common_users
FROM p a JOIN p b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_user_kendall_trend(sf_dir: str):
    """Mann–Kendall trend statistic per user — S = Σ_{i<j} sign(vⱼ − vᵢ)
    over the time-ordered value series (the standard nonparametric monotone-
    trend test; S ≫ 0 means rising spend).  Exact integers end to end: cents
    values, a pairwise sign reduction (vectorized outer compare; an
    O(n log n) merge-sort inversion count is the swap-in for groups beyond
    ~10⁴ rows).  Co-partition by user + per-group sort."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def mk(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        n = len(c)
        iu = np.triu_indices(n, 1)
        stat = int(np.sign(c[iu[1]] - c[iu[0]]).sum()) if n > 1 else 0
        return pa.table(
            {
                "user_id": pa.array([int(s["user_id"][0].as_py())], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "mk_stat": pa.array([stat], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id").map_groups(mk, batch_format="pyarrow").sort(["user_id"])
    )


EVENTS_USER_KENDALL_TREND_SQL = """
WITH v AS (SELECT user_id, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS c,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events),
n AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events FROM v GROUP BY 1),
s AS (SELECT a.user_id,
             CAST(COALESCE(SUM(CASE WHEN b.c > a.c THEN 1
                                    WHEN b.c < a.c THEN -1 ELSE 0 END), 0) AS BIGINT)
               AS mk_stat
      FROM v a JOIN v b ON a.user_id = b.user_id AND b.rn > a.rn
      GROUP BY 1)
SELECT CAST(n.user_id AS BIGINT) AS user_id, n.n_events,
       CAST(COALESCE(s.mk_stat, 0) AS BIGINT) AS mk_stat
FROM n LEFT JOIN s ON n.user_id = s.user_id ORDER BY 1
"""


def customer_rank_join_topk(sf_dir: str):
    """Fagin's THRESHOLD ALGORITHM (TA) rank join: top-10 customers by
    acctbal + order revenue WITHOUT scoring every customer.  The two ranked
    lists (acctbal cents; revenue cents from block partials + one groupby)
    are consumed by alternating sorted access with random access into the
    other list; the scan stops as soon as the TA threshold (sum of the two
    cursors) can no longer beat the current 10th score — the classic
    early-termination guarantee for monotone score functions.  Lists are
    O(customers) aggregates, never order rows."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"c": t["o_custkey"], "r": _cents(t["o_totalprice"])})
        return tb.group_by("c").aggregate([("r", "sum")]).rename_columns(["c", "r"])

    rev = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .aggregate(Sum("r", alias_name="r"))
        .to_pandas()
    )
    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    acct_c = np.floor(cust["c_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
    acct = dict(zip(cust["c_custkey"].astype(int), (int(v) for v in acct_c)))
    revd = dict(zip(rev["c"].astype(int), (int(v) for v in rev["r"])))
    # sorted-access lists, descending (tie: custkey asc for determinism)
    L_acct = sorted(acct.items(), key=lambda kv: (-kv[1], kv[0]))
    L_rev = sorted(revd.items(), key=lambda kv: (-kv[1], kv[0]))
    seen: dict[int, int] = {}
    top: list[tuple[int, int]] = []  # (score, -custkey) min-heap by score
    import heapq

    ia = ir = 0
    last_a, last_r = L_acct[0][1], (L_rev[0][1] if L_rev else 0)
    while ia < len(L_acct) or ir < len(L_rev):
        for lst, idx, other, is_acct in (
            (L_acct, ia, revd, True),
            (L_rev, ir, acct, False),
        ):
            if idx >= len(lst):
                continue
            ckey, val = lst[idx]
            if is_acct:
                ia, last_a = ia + 1, val
                score = val + other.get(ckey, 0)
            else:
                ir, last_r = ir + 1, val
                score = other.get(ckey, 0) + val
            if ckey not in seen:
                seen[ckey] = score
                heapq.heappush(top, (score, -ckey))
                if len(top) > 10:
                    heapq.heappop(top)
        # rev exhausted → its cursor floor is 0 (revenue is nonnegative)
        # strict >: an unseen item could reach exactly thr and still win the
        # (score DESC, custkey ASC) tie-break, so equality cannot stop the scan
        thr = last_a + (last_r if ir < len(L_rev) else 0)
        if len(top) == 10 and top[0][0] > thr:
            break
    best = sorted(((s, -nk) for s, nk in top), key=lambda t: (-t[0], t[1]))
    keys = [k for _, k in best]
    return pa.table(
        {
            "c_custkey": pa.array(keys, pa.int64()),
            "acctbal_cents": pa.array([acct[k] for k in keys], pa.int64()),
            "rev_cents": pa.array([revd.get(k, 0) for k in keys], pa.int64()),
            "score": pa.array([s for s, _ in best], pa.int64()),
        }
    )


CUSTOMER_RANK_JOIN_TOPK_SQL = """
WITH r AS (
  SELECT o_custkey AS c,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1),
s AS (SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
             CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS acctbal_cents,
             CAST(COALESCE(rev, 0) AS BIGINT) AS rev_cents
      FROM customer LEFT JOIN r ON c_custkey = c)
SELECT c_custkey, acctbal_cents, rev_cents,
       CAST(acctbal_cents + rev_cents AS BIGINT) AS score
FROM s ORDER BY score DESC, c_custkey LIMIT 10
"""


def warehouse_fd_audit(sf_dir: str):
    """Functional-dependency profiling across the warehouse — for each
    candidate FD X→Y, how many distinct X values exist and how many of them
    VIOLATE the dependency (map to >1 distinct Y): the schema-discovery
    audit that complements tables_null_profile (missingness) and
    docs_validate_constraints (declared rules).  Per FD: block-local
    DISTINCT (X, Y) partials + one groupby — the shuffle carries the
    distinct-pair dictionary, never rows; the violation tally is a
    value_counts over that O(pairs) table (collected here — for key-like
    FDs at 10¹² rows the finish is a second groupby over the same cells,
    the customers_every_year pattern)."""
    fds = [
        ("customer", "c_nationkey->c_mktsegment", "c_nationkey", "c_mktsegment"),
        ("documents", "doc_id->lang", "doc_id", "lang"),
        ("documents", "source->lang", "source", "lang"),
        ("events", "user_id->event_type", "user_id", "event_type"),
        ("orders", "o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"),
        ("orders", "o_orderkey->o_custkey", "o_orderkey", "o_custkey"),
    ]
    tables, names, n_lhs, n_viol = [], [], [], []
    for table, fd_name, lhs, rhs in fds:
        ds = rd.read_parquet(_t(sf_dir, table), columns=[lhs, rhs])

        def distinct_part(t: pa.Table, _l=lhs, _r=rhs) -> pa.Table:
            return pa.table({"l": t[_l], "r": t[_r]}).group_by(["l", "r"]).aggregate([])

        pairs = (
            ds.map_batches(distinct_part, batch_format="pyarrow")
            .groupby(["l", "r"])
            .aggregate(Count(alias_name="_n"))
            .to_pandas()
        )
        per = pairs.groupby("l").size()
        tables.append(table)
        names.append(fd_name)
        n_lhs.append(int(len(per)))
        n_viol.append(int((per > 1).sum()))
    return pa.table(
        {
            "table_name": pa.array(tables, pa.string()),
            "fd": pa.array(names, pa.string()),
            "n_lhs": pa.array(n_lhs, pa.int64()),
            "n_violating": pa.array(n_viol, pa.int64()),
        }
    )


WAREHOUSE_FD_AUDIT_SQL = """
SELECT * FROM (
  SELECT 'customer' AS table_name, 'c_nationkey->c_mktsegment' AS fd,
         CAST(COUNT(*) AS BIGINT) AS n_lhs,
         CAST(COUNT(*) FILTER (WHERE k > 1) AS BIGINT) AS n_violating
  FROM (SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS k
        FROM customer GROUP BY 1)
  UNION ALL
  SELECT 'documents', 'doc_id->lang', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE k > 1) AS BIGINT)
  FROM (SELECT doc_id, COUNT(DISTINCT lang) AS k FROM documents GROUP BY 1)
  UNION ALL
  SELECT 'documents', 'source->lang', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE k > 1) AS BIGINT)
  FROM (SELECT source, COUNT(DISTINCT lang) AS k FROM documents GROUP BY 1)
  UNION ALL
  SELECT 'events', 'user_id->event_type', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE k > 1) AS BIGINT)
  FROM (SELECT user_id, COUNT(DISTINCT event_type) AS k FROM events GROUP BY 1)
  UNION ALL
  SELECT 'orders', 'o_custkey->o_orderpriority', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE k > 1) AS BIGINT)
  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS k
        FROM orders GROUP BY 1)
  UNION ALL
  SELECT 'orders', 'o_orderkey->o_custkey', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE k > 1) AS BIGINT)
  FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS k FROM orders GROUP BY 1)
) ORDER BY table_name, fd
"""


def events_hourly_lag24_autocorr(sf_dir: str):
    """Daily-seasonality screen: lag-24 autocorrelation of each type's
    GAP-FILLED hourly arrival-count series (zeros for silent hours — the
    honest seasonal estimate; observed-hours-only would splice distant
    days together).  Two-level shape: block-partial (type, hour) counts
    shuffle at cell cardinality, the per-type kernel densifies [min,max]
    hours with one zeros() + scatter and reduces the six sufficient stats
    in exact int64; ``r`` is ONE fixed IEEE expression on both engines
    (the lag1_autocorr discipline)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        tb = pa.table(
            {
                "typ": t["event_type"],
                "hour": pa.array(ts // 3_600_000_000, pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["typ", "hour"]).aggregate([("one", "sum")]).rename_columns(
            ["typ", "hour", "n"]
        )

    _empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_pairs": pa.array([], pa.int64()),
            "sxy": pa.array([], pa.int64()),
            "r": pa.array([], pa.float64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        hours = g["hour"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        counts = g["n"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = int(hours.min()), int(hours.max())
        dense = np.zeros(hi - lo + 1, np.int64)
        dense[hours - lo] = counts
        if len(dense) < 25:
            return _empty
        x, y = dense[:-24], dense[24:]
        npair = len(x)
        sh, st = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        shh, stt = int((x * x).sum()), int((y * y).sum())
        var_h, var_t = npair * shh - sh * sh, npair * stt - st * st
        if var_h <= 0 or var_t <= 0:
            return _empty
        import math

        r = float(npair * sxy - sh * st) / math.sqrt(float(var_h) * float(var_t))
        return pa.table(
            {
                "event_type": pa.array([str(g["typ"][0].as_py())], pa.string()),
                "n_pairs": pa.array([npair], pa.int64()),
                "sxy": pa.array([sxy], pa.int64()),
                "r": pa.array([r], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["typ", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("typ")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["event_type"])
    )


EVENTS_HOURLY_LAG24_AUTOCORR_SQL = """
WITH c AS (
  SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT event_type, MIN(hour) AS mn, MAX(hour) AS mx FROM c GROUP BY 1),
g AS (SELECT event_type, unnest(range(mn, mx + 1)) AS hour FROM b),
f AS (SELECT g.event_type, g.hour, COALESCE(c.n, 0) AS n
      FROM g LEFT JOIN c USING (event_type, hour)),
p AS (SELECT event_type, n AS x,
             lead(n, 24) OVER (PARTITION BY event_type ORDER BY hour) AS y
      FROM f),
q AS (SELECT event_type, x, y FROM p WHERE y IS NOT NULL),
a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(x) AS BIGINT) AS sh, CAST(SUM(y) AS BIGINT) AS st,
             CAST(SUM(x*y) AS BIGINT) AS sxy,
             CAST(SUM(x*x) AS BIGINT) AS shh, CAST(SUM(y*y) AS BIGINT) AS stt
      FROM q GROUP BY 1)
SELECT event_type, np AS n_pairs, sxy,
       CAST(np*sxy - sh*st AS DOUBLE)
         / sqrt(CAST(np*shh - sh*sh AS DOUBLE) * CAST(np*stt - st*st AS DOUBLE)) AS r
FROM a WHERE np*shh - sh*sh > 0 AND np*stt - st*st > 0
ORDER BY event_type
"""


def events_rolling_median5(sf_dir: str):
    """Trailing-window MEDIAN (ROWS 4 PRECEDING) per user — the sliding
    ORDER STATISTIC, which unlike sum/max admits no running decomposition:
    the kernel sorts a strided 5-wide window view and takes column
    (k−1)//2, DuckDB's quantile_disc lower-median convention (verified:
    disc(0.5) of k elems = sorted[(k−1)//2]), so even-width prefixes match
    exactly in integer cents."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def roll(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        n = len(c)
        head = min(n, 4)
        out = np.empty(n, np.int64)
        for i in range(head):  # ≤4 prefix rows per group
            w = np.sort(c[: i + 1])
            out[i] = w[i // 2]
        if n > 4:
            sw = np.sort(np.lib.stride_tricks.sliding_window_view(c, 5), axis=1)
            out[4:] = sw[:, 2]
        return pa.table(
            {
                "event_id": s["event_id"],
                "user_id": s["user_id"],
                "win5_median_cents": pa.array(out, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(roll, batch_format="pyarrow")


EVENTS_ROLLING_MEDIAN5_SQL = """
SELECT event_id, user_id,
       CAST(quantile_disc(CAST(FLOOR(value * 100 + 0.5) AS BIGINT), 0.5)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS win5_median_cents
FROM events
"""


def orders_price_pctrank_by_priority(sf_dir: str):
    """GROUP-partitioned rank family — RANK() (ties share the min rank) and
    percent_rank in ppm, each order ranked WITHIN its priority (the grouped
    complement of the global orders_price_rank_stats).  Co-partition by
    priority; inside a group ranks come from one sort + a tie-run
    searchsorted — and because only ~5 priorities exist the docstring
    contract is the rank.py value-bucket path for hot groups at real
    scale."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        cents = _cents(g["o_totalprice"]).to_numpy(zero_copy_only=False)
        keys = g["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, cents))
        c_sorted = cents[order]
        n = len(c_sorted)
        # min-rank of each row's value: first index where the value appears
        rank = np.searchsorted(c_sorted, c_sorted, side="left") + 1
        pct = (rank - 1) * 1_000_000 // max(n - 1, 1)
        return pa.table(
            {
                "o_orderkey": pa.array(keys[order], pa.int64()),
                "o_orderpriority": pa.array(
                    [str(g["o_orderpriority"][0].as_py())] * n, pa.string()
                ),
                "price_rank": pa.array(rank, pa.int64()),
                "pctrank_ppm": pa.array(pct, pa.int64()),
            }
        )

    return ds.groupby("o_orderpriority").map_groups(kernel, batch_format="pyarrow")


ORDERS_PRICE_PCTRANK_BY_PRIORITY_SQL = """
WITH c AS (SELECT o_orderkey, o_orderpriority,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders),
r AS (SELECT o_orderkey, o_orderpriority,
             CAST(RANK() OVER (PARTITION BY o_orderpriority ORDER BY cents)
                  AS BIGINT) AS price_rank,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM c)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority, price_rank,
       CAST((price_rank - 1) * 1000000 // GREATEST(n - 1, 1) AS BIGINT)
         AS pctrank_ppm
FROM r
"""


def orders_partition_checksums(sf_dir: str):
    """Anti-entropy partition digests (the Merkle-tree leaf level every
    replicated store uses to find diverged ranges without shipping rows):
    64 hash buckets of o_orderkey, each summarized by row count and an
    ORDER-INDEPENDENT checksum — SUM over rows of (key·2654435761 mod 2³¹)
    XOR price-cents, mod 2³¹.  The Knuth multiplier spreads sequential
    keys; commutative SUM makes the digest shuffle-order-proof, so block
    partials + one 64-row groupby finish it.  Two table copies diverge ⇔
    some bucket's (count, checksum) differs."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        h = (k * 2654435761) % 2_147_483_648
        row = np.bitwise_xor(h, cents % 2_147_483_648)
        tb = pa.table(
            {
                "bucket": pa.array(k % 64, pa.int64()),
                "n_rows": pa.array(np.ones(len(k), np.int64)),
                "checksum": pa.array(row, pa.int64()),
            }
        )
        g = tb.group_by("bucket").aggregate([("n_rows", "sum"), ("checksum", "sum")])
        g = g.rename_columns(["bucket", "n_rows", "checksum"])
        # fold mod 2^31 per block (mod distributes over +) so the running
        # sum stays bounded at any row count
        return g.set_column(
            2, "checksum", pc.bit_wise_and(g["checksum"], 2_147_483_647)
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("checksum", alias_name="checksum"))
        .to_pandas()
        .sort_values("bucket", kind="mergesort")
    )
    return pa.table(
        {
            "bucket": pa.array(merged["bucket"].to_numpy().astype(np.int64)),
            "n_rows": pa.array(merged["n_rows"].to_numpy().astype(np.int64)),
            "checksum": pa.array(
                (merged["checksum"].to_numpy().astype(np.int64)) % 2_147_483_648,
                pa.int64(),
            ),
        }
    )


ORDERS_PARTITION_CHECKSUMS_SQL = """
WITH r AS (
  SELECT o_orderkey % 64 AS bucket,
         xor((o_orderkey * 2654435761) % 2147483648,
             CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) % 2147483648) AS row_h
  FROM orders)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(row_h) % 2147483648 AS BIGINT) AS checksum
FROM r GROUP BY 1 ORDER BY 1
"""


def lineitem_q6_revenue_delta(sf_dir: str):
    """TPC-H Q6 shape — the pure predicate-pushdown scan: a conjunctive
    filter (shipdate year, discount band, quantity cap) followed by ONE
    global SUM of extendedprice·discount in integer cents.  No shuffle at
    all: block partials reduce to two scalars; at 100 TB this is the
    bandwidth-bound query whose cost is the parquet scan itself (row-group
    stats prune the year predicate at the read).  The discount band compares
    the STORED doubles against the same literals in both engines — identical
    IEEE comparisons, no epsilon games."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = np.datetime64("1996-01-01", "us").astype("int64")
    hi = np.datetime64("1997-01-01", "us").astype("int64")

    def partial(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].cast(pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(ts, lo), pc.less(ts, hi)),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], 0.05),
                    pc.less_equal(t["l_discount"], 0.07),
                ),
                pc.less(t["l_quantity"], 24.0),
            ),
        )
        f = t.filter(keep)
        disc_rev = _cents(pc.multiply(f["l_extendedprice"], f["l_discount"]))
        return pa.table(
            {
                "sum_disc_rev_cents": pa.array(
                    [pc.sum(disc_rev).as_py() or 0], pa.int64()
                ),
                "n_items": pa.array([f.num_rows], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .aggregate(
            Sum("sum_disc_rev_cents", alias_name="sum_disc_rev_cents"),
            Sum("n_items", alias_name="n_items"),
        )
    )
    return pa.table(
        {
            "sum_disc_rev_cents": pa.array([out["sum_disc_rev_cents"]], pa.int64()),
            "n_items": pa.array([out["n_items"]], pa.int64()),
        }
    )


LINEITEM_Q6_REVENUE_DELTA_SQL = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice*l_discount*100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_disc_rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def events_user_stock_span(sf_dir: str):
    """Stock-span (nearest-previous-GREATER) per user — the monotonic-stack
    family: for each event in (ts, event_id) order, ``span`` = how many
    consecutive immediately-preceding events (itself included) had
    value-cents ≤ this one.  The kernel is the classic O(n) decreasing
    stack per group; the oracle is the quadratic self-join definition
    (span = i − max prior index with greater cents), affordable because
    per-user groups are small — the Ray side is the one that scales."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        n = len(c)
        span = np.empty(n, np.int64)
        stack: list[int] = []  # 0-based indices, strictly decreasing cents
        for i in range(n):
            while stack and c[stack[-1]] <= c[i]:
                stack.pop()
            span[i] = i + 1 if not stack else i - stack[-1]
            stack.append(i)
        return pa.table(
            {
                "event_id": s["event_id"],
                "user_id": s["user_id"],
                "span": pa.array(span, pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow")


EVENTS_USER_STOCK_SPAN_SQL = """
WITH s AS (
  SELECT event_id, user_id,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events),
p AS (
  SELECT a.event_id, a.user_id, a.i, MAX(b.i) AS pg
  FROM s a LEFT JOIN s b
    ON a.user_id = b.user_id AND b.i < a.i AND b.cents > a.cents
  GROUP BY 1, 2, 3)
SELECT event_id, user_id, CAST(i - COALESCE(pg, 0) AS BIGINT) AS span
FROM p
"""


def orders_mad_outliers(sf_dir: str):
    """Robust (median/MAD) outlier flags per priority — the z-score's
    breakdown-resistant sibling: med = lower-median of price cents, MAD =
    lower-median of |cents − med|, flag = |dev| > 3·MAD, all EXACT integers
    (quantile_disc's sorted[(n−1)//2] convention on both engines; the 3×
    gate is an integer compare, so no float ever enters the output).
    Per-priority groups sort locally; at real scale hot groups take the
    stages/quantiles histogram-refine exact-selection path instead."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        c = _cents(g["o_totalprice"]).to_numpy(zero_copy_only=False)
        med = int(np.sort(c)[(len(c) - 1) // 2])
        dev = np.abs(c - med)
        mad = int(np.sort(dev)[(len(dev) - 1) // 2])
        return pa.table(
            {
                "o_orderkey": g["o_orderkey"],
                "o_orderpriority": g["o_orderpriority"],
                "abs_dev_cents": pa.array(dev, pa.int64()),
                "is_mad_outlier": pa.array(dev > 3 * mad),
            }
        )

    return ds.groupby("o_orderpriority").map_groups(kernel, batch_format="pyarrow")


ORDERS_MAD_OUTLIERS_SQL = """
WITH c AS (SELECT o_orderkey, o_orderpriority,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders),
m AS (SELECT o_orderpriority, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med
      FROM c GROUP BY 1),
d AS (SELECT c.o_orderkey, c.o_orderpriority, ABS(cents - med) AS adev
      FROM c JOIN m USING (o_orderpriority)),
md AS (SELECT o_orderpriority, CAST(quantile_disc(adev, 0.5) AS BIGINT) AS mad
       FROM d GROUP BY 1)
SELECT d.o_orderkey, d.o_orderpriority,
       CAST(adev AS BIGINT) AS abs_dev_cents,
       adev > 3 * mad AS is_mad_outlier
FROM d JOIN md USING (o_orderpriority)
"""


_BM25_TERMS = ("customer", "filter", "merge")


def docs_bm25_topk(sf_dir: str):
    """BM25 ranking for a fixed 3-term query — the IR scoring pass a
    retrieval-augmented corpus pipeline runs at scale.  Two streaming
    passes: (1) ONE tokenize pass reduces each doc to 5 integers (doc
    length + per-term tf via list_parent_indices + bincount — no Python
    row loop); (2) corpus stats (N, Σdl, per-term df) come from a tiny
    Dataset.aggregate, and the score pass broadcasts those scalars.  The
    score itself is ONE fixed IEEE expression — rational idf
    (N−df+0.5)/(df+0.5) (no transcendental log whose libm rounding could
    differ between engines), k1=1.2, b=0.75, evaluated in the same
    operation order in numpy and DuckDB, so the float64 column is
    bit-identical (the stages/regression.py OLS-slope discipline)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def tf_pass(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        n = t.num_rows
        cols = {
            "doc_id": t["doc_id"],
            "dl": pa.array(
                np.bincount(parent[ok], minlength=n).astype(np.int64), pa.int64()
            ),
        }
        for j, term in enumerate(_BM25_TERMS):
            hit = pc.equal(flat, term).fill_null(False).to_numpy(zero_copy_only=False)
            tf = np.bincount(parent[ok & hit], minlength=n).astype(np.int64)
            cols[f"tf{j}"] = pa.array(tf, pa.int64())
            cols[f"has{j}"] = pa.array((tf > 0).astype(np.int64), pa.int64())
        return pa.table(cols)

    narrow = ds.map_batches(tf_pass, batch_format="pyarrow").materialize()
    aggs = [Count(alias_name="n_docs"), Sum("dl", alias_name="total_dl")]
    for j in range(len(_BM25_TERMS)):
        aggs.append(Sum(f"has{j}", alias_name=f"df{j}"))
    st = narrow.aggregate(*aggs)
    n_docs, total_dl = int(st["n_docs"]), int(st["total_dl"])
    avgdl = total_dl / n_docs
    idf = [
        (n_docs - int(st[f"df{j}"]) + 0.5) / (int(st[f"df{j}"]) + 0.5)
        for j in range(len(_BM25_TERMS))
    ]

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        norm = 1.2 * (0.25 + 0.75 * (dl / avgdl))
        s = np.zeros(t.num_rows, np.float64)
        for j in range(len(_BM25_TERMS)):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False).astype(np.float64)
            s = s + idf[j] * (tf * 2.2) / (tf + norm)
        return pa.table(
            {"doc_id": t["doc_id"], "score": pa.array(s, pa.float64())}
        )

    return (
        narrow.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(10)
    )


DOCS_BM25_TOPK_SQL = """
WITH tk AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
t AS (SELECT doc_id, term FROM tk WHERE term <> ''),
per AS (
  SELECT doc_id, COUNT(*) AS dl,
         SUM(CASE WHEN term = 'customer' THEN 1 ELSE 0 END) AS tf0,
         SUM(CASE WHEN term = 'filter'   THEN 1 ELSE 0 END) AS tf1,
         SUM(CASE WHEN term = 'merge'    THEN 1 ELSE 0 END) AS tf2
  FROM t GROUP BY 1),
d AS (
  SELECT doc_id, COALESCE(dl, 0) AS dl, COALESCE(tf0, 0) AS tf0,
         COALESCE(tf1, 0) AS tf1, COALESCE(tf2, 0) AS tf2
  FROM documents LEFT JOIN per USING (doc_id)),
st AS (
  SELECT COUNT(*) AS n, SUM(dl) AS total,
         SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
  FROM d)
SELECT doc_id,
       -- e-notation literals: DuckDB types 2.2 as DECIMAL (decimal-rounded
       -- intermediates, off-by-an-ulp vs numpy) but 2.2e0 as DOUBLE
       (0.0e0
        + (n - df0 + 0.5e0) / (df0 + 0.5e0)
            * (tf0 * 2.2e0) / (tf0 + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (CAST(total AS DOUBLE) / n))))
        + (n - df1 + 0.5e0) / (df1 + 0.5e0)
            * (tf1 * 2.2e0) / (tf1 + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (CAST(total AS DOUBLE) / n))))
        + (n - df2 + 0.5e0) / (df2 + 0.5e0)
            * (tf2 * 2.2e0) / (tf2 + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (CAST(total AS DOUBLE) / n))))
       ) AS score
FROM d, st
ORDER BY score DESC, doc_id LIMIT 10
"""


def events_user_lis_len(sf_dir: str):
    """Longest strictly-increasing subsequence of value-cents per user (in
    (ts, event_id) order) — the patience-sorting DP family.  The kernel is
    O(n log n) patience per group (bisect over pile tails); the oracle is
    the textbook chain-extension RECURSIVE CTE (reachable lengths over the
    j<i ∧ v_j<v_i DAG, UNION-deduped), affordable because per-user groups
    are tiny at test scale — the Ray side is the one that scales."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        import bisect

        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        tails: list[int] = []
        for v in c:
            i = bisect.bisect_left(tails, v)
            if i == len(tails):
                tails.append(int(v))
            else:
                tails[i] = int(v)
        return pa.table(
            {
                "user_id": pa.array([int(s["user_id"][0].as_py())], pa.int64()),
                "n_events": pa.array([len(c)], pa.int64()),
                "lis_len": pa.array([len(tails)], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow").sort(
        ["user_id"]
    )


EVENTS_USER_LIS_LEN_SQL = """
WITH RECURSIVE s AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT user_id, i, cents, 1 AS l FROM s
  UNION
  SELECT s.user_id, s.i, s.cents, r.l + 1
  FROM r JOIN s ON s.user_id = r.user_id AND s.i > r.i AND s.cents > r.cents
)
SELECT user_id, CAST(COUNT(DISTINCT i) AS BIGINT) AS n_events,
       CAST(MAX(l) AS BIGINT) AS lis_len
FROM r GROUP BY 1 ORDER BY 1
"""


def asia_market_share_by_year(sf_dir: str):
    """TPC-H Q8 shape — national market share: of all lineitem revenue sold
    to ASIA-region customers, what ppm came from NATION_7 suppliers, per
    order year.  Two fact-fact hash joins (orders⋈customer, then
    lineitem⋈that — both at the measured-optimal 8 partitions) plus two
    genuinely tiny broadcasts (25-row nation→region map, 100-row
    supplier→nation map).  The share is an integer cross-multiply ppm —
    no float division ever reaches the output."""
    from ...stages.broadcast import dim_is_broadcastable

    nat = rd.read_parquet(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    asia_nations = pa.array(
        nat[nat.n_regionkey == 2].n_nationkey.to_numpy().astype(np.int64), pa.int64()
    )
    asia_ref = ray.put(asia_nations)
    # supplier is FACT-scaled (TPC-H SF·10k): broadcast the focal keyset only
    # when parquet metadata says it fits the budget; else the focal flag
    # rides a left_outer shuffle join (never a silently oversized ray.put)
    sup_path = _t(sf_dir, "supplier")
    sup_broadcastable = dim_is_broadcastable(sup_path, ["s_suppkey", "s_nationkey"])
    if sup_broadcastable:
        sup = rd.read_parquet(
            sup_path, columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        focal_sups = pa.array(
            sup[sup.s_nationkey == 7].s_suppkey.to_numpy().astype(np.int64), pa.int64()
        )
        focal_ref = ray.put(focal_sups)

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    oc = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def asia_orders(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["c_nationkey"].cast(pa.int64()), value_set=ray.get(asia_ref))
        f = t.filter(keep)
        yr = pc.year(f["o_orderdate"]).cast(pa.int64())
        return pa.Table.from_arrays([f["o_orderkey"], yr], names=["o_orderkey", "yr"])

    oc = oc.map_batches(asia_orders, batch_format="pyarrow")

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    if sup_broadcastable:

        def li_prep(t: pa.Table) -> pa.Table:
            rev = _cents(
                pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
            )
            focal = pc.is_in(t["l_suppkey"], value_set=ray.get(focal_ref))
            focal_c = pc.if_else(focal, rev, pa.scalar(0, pa.int64()))
            return pa.Table.from_arrays(
                [t["l_orderkey"], rev, focal_c],
                names=["l_orderkey", "rev_c", "focal_c"],
            )

        li = li.map_batches(li_prep, batch_format="pyarrow")
    else:
        # reroute: focal flag via left_outer shuffle join — but a join needs
        # a non-trivial right side (Ray's empty-aggregator-partition hazard),
        # so a provably TINY focal subset broadcasts regardless of the
        # dim-level budget (32 keys can always ship)
        def li_rev(t: pa.Table) -> pa.Table:
            rev = _cents(
                pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
            )
            return pa.Table.from_arrays(
                [t["l_orderkey"], t["l_suppkey"], rev],
                names=["l_orderkey", "l_suppkey", "rev_c"],
            )

        def focal_keys(t: pa.Table) -> pa.Table:
            f = t.filter(pc.equal(t["s_nationkey"].cast(pa.int64()), 7))
            return pa.table(
                {
                    "s_suppkey": f["s_suppkey"],
                    "_focal": pa.array(np.ones(f.num_rows, np.int64)),
                }
            )

        focal_ds = rd.read_parquet(
            sup_path, columns=["s_suppkey", "s_nationkey"]
        ).map_batches(focal_keys, batch_format="pyarrow").materialize()
        if focal_ds.count() < 10_000:
            focal_ref = ray.put(
                pa.array(
                    sorted(int(r["s_suppkey"]) for r in focal_ds.take_all()),
                    pa.int64(),
                )
            )

            def li_prep_small(t: pa.Table) -> pa.Table:
                rev = _cents(
                    pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
                )
                focal = pc.is_in(t["l_suppkey"], value_set=ray.get(focal_ref))
                focal_c = pc.if_else(focal, rev, pa.scalar(0, pa.int64()))
                return pa.Table.from_arrays(
                    [t["l_orderkey"], rev, focal_c],
                    names=["l_orderkey", "rev_c", "focal_c"],
                )

            li = li.map_batches(li_prep_small, batch_format="pyarrow")
        else:
            li = (
                li.map_batches(li_rev, batch_format="pyarrow")
                .join(
                    focal_ds,
                    join_type="left_outer",
                    num_partitions=8,
                    on=("l_suppkey",),
                    right_on=("s_suppkey",),
                )
                .map_batches(
                    lambda t: pa.Table.from_arrays(
                        [
                            t["l_orderkey"],
                            t["rev_c"],
                            pc.if_else(
                                pc.is_valid(t["_focal"]),
                                t["rev_c"],
                                pa.scalar(0, pa.int64()),
                            ),
                        ],
                        names=["l_orderkey", "rev_c", "focal_c"],
                    ),
                    batch_format="pyarrow",
                )
            )
    joined = li.join(
        oc, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )
    agg = (
        joined.groupby("yr")
        .aggregate(
            Sum("focal_c", alias_name="focal_rev_cents"),
            Sum("rev_c", alias_name="total_rev_cents"),
        )
        .to_pandas()
        .sort_values("yr", kind="mergesort")
    )
    focal = agg["focal_rev_cents"].to_numpy().astype(np.int64)
    total = agg["total_rev_cents"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "yr": pa.array(agg["yr"].to_numpy().astype(np.int64)),
            "focal_rev_cents": pa.array(focal, pa.int64()),
            "total_rev_cents": pa.array(total, pa.int64()),
            "share_ppm": pa.array(focal * 1_000_000 // total, pa.int64()),
        }
    )


ASIA_MARKET_SHARE_BY_YEAR_SQL = """
WITH j AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN s_nationkey = 7 THEN 1 ELSE 0 END AS focal
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE n_regionkey = 2)
SELECT yr,
       CAST(SUM(focal * cents) AS BIGINT) AS focal_rev_cents,
       CAST(SUM(cents) AS BIGINT) AS total_rev_cents,
       CAST(SUM(focal * cents) * 1000000 // SUM(cents) AS BIGINT) AS share_ppm
FROM j GROUP BY 1 ORDER BY 1
"""


def events_user_decayed_value(sf_dir: str):
    """Exponential time-decay aggregate with a 7-day half-life, EXACT in
    integers: each event contributes value-cents >> (age-in-weeks at the
    corpus's max-ts as-of point) — halving by bit-shift instead of a float
    pow, so the per-user SUM is order-independent and can never hash-drift
    across shuffle orders (the recency-weighted engagement score every
    feature store keeps, in its only deterministic form)."""
    asof = int(
        rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])
        .map_batches(
            lambda t: pa.table({"ts_us": t["ts"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
        .max("ts_us")
    )
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def decay(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        k = np.minimum((asof - ts) // 604_800_000_000, 62)
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "dec": pa.array(cents >> k, pa.int64()),
            }
        )

    return (
        ds.map_batches(decay, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("dec", alias_name="decayed_sum_cents"), Count(alias_name="n_events"))
    )


EVENTS_USER_DECAYED_VALUE_SQL = """
WITH m AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
d AS (
  SELECT user_id,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT)
           >> CAST(LEAST((ref_us - epoch_us(ts)) // 604800000000, 62) AS BIGINT) AS dec
  FROM events, m)
SELECT user_id, CAST(SUM(dec) AS BIGINT) AS decayed_sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM d GROUP BY 1
"""


def customer_reorder_gap_median(sf_dir: str):
    """Inter-purchase cadence: per customer, the lower-median of day gaps
    between consecutive orders (by orderdate, orderkey-tie-broken) — the
    repeat-behavior statistic behind churn models.  Per-customer groups
    sort locally, gaps are one numpy diff, the median is the
    sorted[(m−1)//2] quantile_disc convention; customers with a single
    order have no gap and are absent by construction."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    _empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
            "median_gap_days": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _empty
        s = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("o_orderdate", "ascending"), ("o_orderkey", "ascending")],
            )
        )
        ts = s["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        gaps = np.sort(np.diff(ts) // 86_400_000_000)
        return pa.table(
            {
                "o_custkey": pa.array([int(s["o_custkey"][0].as_py())], pa.int64()),
                "n_orders": pa.array([g.num_rows], pa.int64()),
                "median_gap_days": pa.array(
                    [int(gaps[(len(gaps) - 1) // 2])], pa.int64()
                ),
            }
        )

    return ds.groupby("o_custkey").map_groups(kernel, batch_format="pyarrow")


CUSTOMER_REORDER_GAP_MEDIAN_SQL = """
WITH s AS (
  SELECT o_custkey, epoch_us(o_orderdate) AS ts,
         lag(epoch_us(o_orderdate)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pts
  FROM orders),
g AS (SELECT o_custkey, (ts - pts) // 86400000000 AS gap
      FROM s WHERE pts IS NOT NULL)
SELECT o_custkey, CAST(COUNT(*) + 1 AS BIGINT) AS n_orders,
       CAST(quantile_disc(gap, 0.5) AS BIGINT) AS median_gap_days
FROM g GROUP BY 1
"""


def events_user_running_distinct_types(sf_dir: str):
    """Running COUNT(DISTINCT) — the window SQL can't express directly: for
    each event, how many distinct event types its user has seen up to and
    including it.  Kernel: per-user sort, first-occurrence flags via one
    vectorized pandas-free trick (np.unique return_index), cumsum.  The
    oracle decomposes it the standard way (first-occurrence flag =
    ROW_NUMBER()==1 per (user, type), then a running SUM) — the identity
    that makes the op shuffle-light at scale: co-partition by user, never
    materialize per-window sets."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        types = s["event_type"].combine_chunks()
        codes = types.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        n = len(codes)
        first = np.zeros(n, np.int64)
        _, first_ix = np.unique(codes, return_index=True)
        first[first_ix] = 1
        return pa.table(
            {
                "event_id": s["event_id"],
                "user_id": s["user_id"],
                "distinct_types_so_far": pa.array(np.cumsum(first), pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow")


EVENTS_USER_RUNNING_DISTINCT_TYPES_SQL = """
WITH f AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM events)
SELECT event_id, user_id,
       CAST(SUM(is_first) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_types_so_far
FROM f
"""


def events_user_max_subarray(sf_dir: str):
    """Kadane's maximum-subarray per user, on value-cents CENTERED at the
    user's lower-median (so runs of above-median activity form the signal —
    with raw all-positive values the answer is trivially the whole series).
    The kernel is the prefix-sum identity: max subarray = max_j(prefix_j −
    min_{i<j} prefix_i) — one cumsum + one np.minimum.accumulate, fully
    vectorized, and the SAME identity is what the oracle's running-MIN
    window computes, so both engines do integer arithmetic end to end."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        med = int(np.sort(c)[(len(c) - 1) // 2])
        dev = c - med
        pre = np.cumsum(dev)
        # min prefix STRICTLY BEFORE j (empty prefix = 0)
        minpre = np.minimum.accumulate(np.concatenate(([0], pre[:-1])))
        best = int(np.max(pre - minpre))
        return pa.table(
            {
                "user_id": pa.array([int(s["user_id"][0].as_py())], pa.int64()),
                "n_events": pa.array([len(c)], pa.int64()),
                "median_cents": pa.array([med], pa.int64()),
                "max_run_cents": pa.array([best], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow").sort(
        ["user_id"]
    )


EVENTS_USER_MAX_SUBARRAY_SQL = """
WITH c AS (
  SELECT user_id, event_id, ts, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events),
m AS (SELECT user_id, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM c GROUP BY 1),
p AS (
  SELECT c.user_id, med, n_events, ts, event_id,
         SUM(cents - med) OVER (
           PARTITION BY c.user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS pre
  FROM c JOIN m USING (user_id)),
q AS (
  SELECT user_id, med, n_events,
         pre - LEAST(COALESCE(MIN(pre) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 0) AS gain
  FROM p)
SELECT user_id, n_events, med AS median_cents,
       CAST(MAX(gain) AS BIGINT) AS max_run_cents
FROM q GROUP BY 1, 2, 3 ORDER BY 1
"""


def events_ab_proportion_ztest(sf_dir: str):
    """Two-proportion z-test — the A/B-test primitive: arms are user-id
    parity, conversion is event_type='purchase'.  The engine reduces each
    arm to TWO integers (n, conversions) via block partials; z is then ONE
    fixed IEEE expression over those four integers evaluated identically
    in numpy and DuckDB (pooled p̂, the textbook denominator), so the
    float64 statistic is bit-identical — no transcendental, no
    order-dependent float SUM anywhere."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        arm = pc.cast(
            pc.equal(pc.bit_wise_and(t["user_id"], 1), 1), pa.int64()
        )
        conv = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
        return pa.table(
            {
                "arm": arm,
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "conv": conv,
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("arm")
        .aggregate(Sum("n", alias_name="n"), Sum("conv", alias_name="conv"))
        .to_pandas()
        .sort_values("arm", kind="mergesort")
    )
    n0, c0 = int(agg.n.iloc[0]), int(agg.conv.iloc[0])
    n1, c1 = int(agg.n.iloc[1]), int(agg.conv.iloc[1])
    import math

    p0, p1 = c0 / n0, c1 / n1
    pp = (c0 + c1) / (n0 + n1)
    z = (p0 - p1) / math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
    return pa.table(
        {
            "n0": pa.array([n0], pa.int64()),
            "conv0": pa.array([c0], pa.int64()),
            "n1": pa.array([n1], pa.int64()),
            "conv1": pa.array([c1], pa.int64()),
            "z": pa.array([z], pa.float64()),
        }
    )


EVENTS_AB_PROPORTION_ZTEST_SQL = """
WITH a AS (
  SELECT user_id & 1 AS arm, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv
  FROM events GROUP BY 1),
w AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 0 THEN conv END) AS conv0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 1 THEN conv END) AS conv1
  FROM a)
SELECT n0, conv0, n1, conv1,
       -- e-notation literals keep every constant DOUBLE (DuckDB types a
       -- bare 1.0 as DECIMAL); expression order mirrors the numpy side
       (CAST(conv0 AS DOUBLE) / n0 - CAST(conv1 AS DOUBLE) / n1)
         / sqrt((CAST(conv0 + conv1 AS DOUBLE) / (n0 + n1))
                * (1.0e0 - CAST(conv0 + conv1 AS DOUBLE) / (n0 + n1))
                * (1.0e0 / n0 + 1.0e0 / n1)) AS z
FROM w
"""


def customer_k_anonymity_audit(sf_dir: str):
    """Privacy k-anonymity audit over the quasi-identifier pair
    (mktsegment, nationkey) — the pre-release governance check a
    training-data pipeline runs before shipping user-derived tables: group
    sizes via block partials + one tiny groupby, then ONE summary row —
    the minimum k, group counts, and how many rows sit in groups below
    the k=5 bar (those rows re-identify).  All integers."""
    ds = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_mktsegment", "c_nationkey"]
    )

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "seg": t["c_mktsegment"],
                "nat": t["c_nationkey"].cast(pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["seg", "nat"]).aggregate([("n", "sum")]).rename_columns(
            ["seg", "nat", "n"]
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["seg", "nat"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = g["n"].to_numpy().astype(np.int64)
    risky = n < 5
    return pa.table(
        {
            "n_groups": pa.array([len(n)], pa.int64()),
            "k_min": pa.array([int(n.min())], pa.int64()),
            "n_risky_groups": pa.array([int(risky.sum())], pa.int64()),
            "n_risky_rows": pa.array([int(n[risky].sum())], pa.int64()),
            "n_rows": pa.array([int(n.sum())], pa.int64()),
        }
    )


CUSTOMER_K_ANONYMITY_AUDIT_SQL = """
WITH g AS (
  SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(n) AS BIGINT) AS k_min,
       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_risky_rows,
       CAST(SUM(n) AS BIGINT) AS n_rows
FROM g
"""


def events_dow_seasonality_index(sf_dir: str):
    """Day-of-week seasonality index: each weekday's mean event value
    relative to the overall mean, in ppm — computed as the integer
    cross-multiply sum_dow·n_total·10⁶ // (n_dow·sum_total), so the ratio
    of two rational means never touches a float.  isodow convention
    (1=Monday; pyarrow day_of_week+1).  Block partials keep the shuffle at
    7 rows."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "dow": pc.cast(pc.add(pc.day_of_week(t["ts"]), 1), pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "cents": _cents(t["value"]),
            }
        )
        return tb.group_by("dow").aggregate(
            [("n", "sum"), ("cents", "sum")]
        ).rename_columns(["dow", "n", "cents"])

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dow")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("dow", kind="mergesort")
    )
    n = g["n"].to_numpy().astype(np.int64)
    c = g["cents"].to_numpy().astype(np.int64)
    n_tot, c_tot = int(n.sum()), int(c.sum())
    idx = c * n_tot * 1_000_000 // (n * c_tot)
    return pa.table(
        {
            "dow": pa.array(g["dow"].to_numpy().astype(np.int64)),
            "n": pa.array(n, pa.int64()),
            "sum_cents": pa.array(c, pa.int64()),
            "index_ppm": pa.array(idx, pa.int64()),
        }
    )


EVENTS_DOW_SEASONALITY_INDEX_SQL = """
WITH g AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS dow, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events GROUP BY 1),
t AS (SELECT SUM(n) AS n_tot, SUM(sum_cents) AS c_tot FROM g)
SELECT dow, n, sum_cents,
       CAST(sum_cents * n_tot * 1000000 // (n * c_tot) AS BIGINT) AS index_ppm
FROM g, t ORDER BY dow
"""


def embeddings_top3_dims(sf_dir: str):
    """Per-vector top-3 salient dimensions by |component| — the sparse
    summary a feature-attribution or product-quantization stage extracts
    from dense embeddings.  The batch kernel reshapes the FixedSize/var
    list column to one (rows × dim) float matrix and takes a vectorized
    argpartition-free full argsort on (−|v|, dim) — no per-row Python.
    Components export as exact milli-units (FLOOR(f64(x)·1000): float32→
    float64 is exact, so both engines floor the same double)."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def kernel(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        dim = int(offs[1] - offs[0])
        mat = flat.reshape(-1, dim)
        # lexicographic (−|v|, dim): stable argsort on |v| descending keeps
        # the LOWER dim index first on exact-magnitude ties
        order = np.argsort(-np.abs(mat), axis=1, kind="stable")[:, :3]
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        rows = np.repeat(ids, 3)
        ranks = np.tile(np.arange(1, 4, dtype=np.int64), n)
        dims = order.reshape(-1).astype(np.int64)
        vals = np.floor(mat[np.repeat(np.arange(n), 3), dims] * 1000.0).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(rows, pa.int64()),
                "dim_rank": pa.array(ranks, pa.int64()),
                "dim_idx": pa.array(dims, pa.int64()),
                "val_milli": pa.array(vals, pa.int64()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


EMBEDDINGS_TOP3_DIMS_SQL = """
WITH e AS (
  SELECT vec_id, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS dim_idx
  FROM embeddings),
r AS (
  SELECT vec_id, dim_idx, CAST(x AS DOUBLE) AS xd,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY ABS(CAST(x AS DOUBLE)) DESC, dim_idx
         ) AS dim_rank
  FROM e)
SELECT vec_id, CAST(dim_rank AS BIGINT) AS dim_rank,
       CAST(dim_idx AS BIGINT) AS dim_idx,
       CAST(FLOOR(xd * 1000) AS BIGINT) AS val_milli
FROM r WHERE dim_rank <= 3
"""


def docs_zipf_profile(sf_dir: str):
    """Zipf rank-frequency profile: corpus term counts (block-local
    combiner → O(vocab) shuffle, the top_terms discipline), ranked by
    (count desc, term), each rank's fit to the ideal 1/r law reported as
    the EXACT integer ratio n_r·r·10⁶ // n_1 — the deviation-from-Zipf
    diagnostic (a healthy natural corpus sits near 10⁶; this synthetic
    near-uniform vocabulary reads ≫10⁶ at deep ranks, which is the
    point of the check)."""
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

    g = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
    )
    n = g["n"].to_numpy().astype(np.int64)
    rank = np.arange(1, len(n) + 1, dtype=np.int64)
    return pa.table(
        {
            "rank": pa.array(rank, pa.int64()),
            "term": pa.array(g["term"].tolist(), pa.string()),
            "n": pa.array(n, pa.int64()),
            "zipf_ratio_ppm": pa.array(n * rank * 1_000_000 // n[0], pa.int64()),
        }
    )


DOCS_ZIPF_PROFILE_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks
      WHERE term <> '' GROUP BY 1),
r AS (SELECT term, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank
      FROM c),
t AS (SELECT MAX(CASE WHEN rank = 1 THEN n END) AS n1 FROM r)
SELECT rank, term, n,
       CAST(n * rank * 1000000 // n1 AS BIGINT) AS zipf_ratio_ppm
FROM r, t ORDER BY rank
"""


def brand_return_rate_wilson(sf_dir: str):
    """Ranking under uncertainty — per-brand return rate scored by the
    Wilson 95% LOWER bound (the 'sort by rating' estimator that stops a
    2-for-2 brand outranking a 490-for-500 one).  Lineitem pre-aggregates
    to O(|part|) (partkey, n, returned) partials BEFORE the 8-partition
    join with part — the shuffle never carries line-level rows; brands
    fold to a tiny table and the bound is ONE fixed IEEE expression over
    the two integers (sqrt is correctly rounded in both engines;
    e-notation literals keep DuckDB in DOUBLE)."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "l_partkey": t["l_partkey"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "ret": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64()),
            }
        )
        return tb.group_by("l_partkey").aggregate(
            [("n", "sum"), ("ret", "sum")]
        ).rename_columns(["l_partkey", "n", "ret"])

    per_part = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("n", alias_name="n"), Sum("ret", alias_name="ret"))
    )
    part = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    joined = per_part.join(
        part, join_type="inner", num_partitions=8, on=("l_partkey",), right_on=("p_partkey",)
    )
    g = (
        joined.groupby("p_brand")
        .aggregate(Sum("n", alias_name="n"), Sum("ret", alias_name="returned"))
        .to_pandas()
        .sort_values("p_brand", kind="mergesort")
    )
    n = g["n"].to_numpy().astype(np.int64).astype(np.float64)
    s = g["returned"].to_numpy().astype(np.int64).astype(np.float64)
    z2 = 1.96 * 1.96
    p = s / n
    lb = (p + z2 / (2.0 * n) - 1.96 * np.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)) / (
        1.0 + z2 / n
    )
    out = pa.table(
        {
            "p_brand": pa.array(g["p_brand"].tolist(), pa.string()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            "returned": pa.array(g["returned"].to_numpy().astype(np.int64), pa.int64()),
            "wilson_lb": pa.array(lb, pa.float64()),
        }
    )
    ix = pc.sort_indices(
        out, sort_keys=[("wilson_lb", "descending"), ("p_brand", "ascending")]
    )
    return out.take(ix)


BRAND_RETURN_RATE_WILSON_SQL = """
WITH g AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS returned
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1)
SELECT p_brand, n, returned,
       (CAST(returned AS DOUBLE) / n
          + 1.96e0 * 1.96e0 / (2.0e0 * n)
          - 1.96e0 * sqrt(((CAST(returned AS DOUBLE) / n)
                             * (1.0e0 - CAST(returned AS DOUBLE) / n)
                           + 1.96e0 * 1.96e0 / (4.0e0 * n)) / n))
         / (1.0e0 + 1.96e0 * 1.96e0 / n) AS wilson_lb
FROM g ORDER BY wilson_lb DESC, p_brand
"""


def customer_rfm_scores(sf_dir: str):
    """RFM segmentation — the classic marketing feature triplet: per
    customer recency (days since last order at the corpus max-date as-of),
    frequency (order count) and monetary (exact cents), each scored with a
    SQL-exact global NTILE(5) from ``stages/rank.global_value_rank`` (value-
    range buckets — no global sort; the first n%k tiles carry the extra
    rows, DuckDB's convention).  Three chained rank passes over the
    O(customers) narrow table; the fact table is scanned once."""
    from ...stages.rank import global_value_rank

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "ts_us": t["o_orderdate"].cast(pa.int64()),
                "cents": _cents(t["o_totalprice"]),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    per_cust = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(
            Max("ts_us", alias_name="last_us"),
            Sum("one", alias_name="n_orders"),
            Sum("cents", alias_name="monetary_cents"),
        )
    )
    gmax = int(per_cust.max("last_us"))

    def recency(t: pa.Table) -> pa.Table:
        last = t["last_us"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "recency_days": pa.array((gmax - last) // 86_400_000_000, pa.int64()),
                "n_orders": t["n_orders"],
                "monetary_cents": t["monetary_cents"],
            }
        )

    base = per_cust.map_batches(recency, batch_format="pyarrow").materialize()

    def take_tile(d, name):
        def f(t: pa.Table, name=name) -> pa.Table:
            t = t.drop_columns(["_rnk"])
            return t.rename_columns(
                [name if c == "tile" else c for c in t.column_names]
            )

        return d.map_batches(f, batch_format="pyarrow")

    d = take_tile(
        global_value_rank(
            base, value_col="recency_days", id_col="c_custkey", out_col="_rnk", ntile_k=5
        ),
        "r_tile",
    )
    d = take_tile(
        global_value_rank(
            d, value_col="n_orders", id_col="c_custkey", out_col="_rnk", ntile_k=5
        ),
        "f_tile",
    )
    d = take_tile(
        global_value_rank(
            d, value_col="monetary_cents", id_col="c_custkey", out_col="_rnk", ntile_k=5
        ),
        "m_tile",
    )

    def code(t: pa.Table) -> pa.Table:
        r = t["r_tile"].combine_chunks().to_numpy(zero_copy_only=False)
        f = t["f_tile"].combine_chunks().to_numpy(zero_copy_only=False)
        m = t["m_tile"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("rfm_code", pa.array(r * 100 + f * 10 + m, pa.int64()))

    return d.map_batches(code, batch_format="pyarrow")


CUSTOMER_RFM_SCORES_SQL = """
WITH a AS (
  SELECT o_custkey AS c_custkey, MAX(epoch_us(o_orderdate)) AS last_us,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY 1),
g AS (SELECT MAX(last_us) AS gmax FROM a),
b AS (SELECT c_custkey, CAST((gmax - last_us) // 86400000000 AS BIGINT)
               AS recency_days,
             n_orders, monetary_cents
      FROM a, g)
SELECT c_custkey, recency_days, n_orders, monetary_cents,
       CAST(NTILE(5) OVER (ORDER BY recency_days, c_custkey) AS BIGINT) AS r_tile,
       CAST(NTILE(5) OVER (ORDER BY n_orders, c_custkey) AS BIGINT) AS f_tile,
       CAST(NTILE(5) OVER (ORDER BY monetary_cents, c_custkey) AS BIGINT) AS m_tile,
       CAST(NTILE(5) OVER (ORDER BY recency_days, c_custkey) * 100
            + NTILE(5) OVER (ORDER BY n_orders, c_custkey) * 10
            + NTILE(5) OVER (ORDER BY monetary_cents, c_custkey) AS BIGINT)
         AS rfm_code
FROM b
"""


def part_bfs_from_seed(sf_dir: str):
    """BFS shortest-path layers over the co-purchase graph (parts linked by
    appearing in one order), from seed part 1, depth-capped at 6.  Edges
    build once through the part_copurchase self-join discipline (distinct
    (order, part) partials → 8-partition join) and materialize NARROW; each
    BFS round is one distributed probe of the edge table against the
    broadcast frontier keyset + a distributed distinct — the driver holds
    only the O(V) visited map (the stages/graph.py documented bound; at
    larger V the round becomes a keyed join, same loop).  The oracle is the
    textbook recursive-CTE reachability with MIN(dist)."""
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
    edges = j.map_batches(
        lambda t: t.filter(pc.not_equal(t["p1"], t["p2"])).select(["p1", "p2"]),
        batch_format="pyarrow",
    ).materialize()

    seed = 1
    dist: dict[int, int] = {seed: 0}
    frontier = [seed]
    for depth in range(1, 7):
        fref = ray.put(pa.array(frontier, pa.int64()))

        def probe(t: pa.Table) -> pa.Table:
            hit = t.filter(pc.is_in(t["p1"], value_set=ray.get(fref)))
            return (
                pa.table({"p2": hit["p2"]}).group_by("p2").aggregate([])
            )

        nbrs = edges.map_batches(probe, batch_format="pyarrow").unique("p2")
        frontier = [int(p) for p in nbrs if int(p) not in dist]
        if not frontier:
            break
        for p in frontier:
            dist[p] = depth

    keys = sorted(dist)
    return pa.table(
        {
            "p_partkey": pa.array(keys, pa.int64()),
            "dist": pa.array([dist[k] for k in keys], pa.int64()),
        }
    )


PART_BFS_FROM_SEED_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey),
bfs AS (
  SELECT CAST(1 AS BIGINT) AS pk, 0 AS dist
  UNION
  SELECT e.p2, bfs.dist + 1
  FROM bfs JOIN e ON e.p1 = bfs.pk
  WHERE bfs.dist < 6
)
SELECT pk AS p_partkey, CAST(MIN(dist) AS BIGINT) AS dist
FROM bfs GROUP BY 1 ORDER BY 1
"""


def nation_share_within_region_revenue(sf_dir: str):
    """Hierarchical percent-of-parent rollup (region → nation): each
    customer nation's order revenue, its ppm share WITHIN its region, and
    the region's ppm share of the grand total — the two-level ratio report
    ROLLUP alone can't emit.  One 8-partition orders⋈customer join;
    nation/region name maps ride two genuinely tiny broadcasts; both share
    levels are integer cross-multiplies folded on the O(nations) driver
    table."""
    nat = rd.read_parquet(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    reg = rd.read_parquet(_t(sf_dir, "region")).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    lookup = ray.put(
        {
            "keys": pa.array(nat.n_nationkey.to_numpy().astype(np.int64), pa.int64()),
            "nname": pa.array(nat.n_name.tolist(), pa.string()),
            "rname": pa.array(nat.r_name.tolist(), pa.string()),
        }
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    oc = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def tag(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup)
        ix = pc.index_in(t["c_nationkey"].cast(pa.int64()), value_set=lk["keys"])
        return pa.table(
            {
                "r_name": pc.take(lk["rname"], ix),
                "n_name": pc.take(lk["nname"], ix),
                "cents": _cents(t["o_totalprice"]),
            }
        )

    g = (
        oc.map_batches(tag, batch_format="pyarrow")
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("cents", alias_name="rev_cents"))
        .to_pandas()
        .sort_values(["r_name", "n_name"], kind="mergesort")
    )
    rev = g["rev_cents"].to_numpy().astype(np.int64)
    total = int(rev.sum())
    reg_tot = g.groupby("r_name")["rev_cents"].transform("sum").to_numpy().astype(np.int64)
    return pa.table(
        {
            "r_name": pa.array(g["r_name"].tolist(), pa.string()),
            "n_name": pa.array(g["n_name"].tolist(), pa.string()),
            "rev_cents": pa.array(rev, pa.int64()),
            "share_in_region_ppm": pa.array(rev * 1_000_000 // reg_tot, pa.int64()),
            "region_share_ppm": pa.array(
                reg_tot * 1_000_000 // total, pa.int64()
            ),
        }
    )


NATION_SHARE_WITHIN_REGION_REVENUE_SQL = """
WITH g AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2),
t AS (SELECT SUM(rev_cents) AS total FROM g),
r AS (SELECT r_name, SUM(rev_cents) AS reg_tot FROM g GROUP BY 1)
SELECT g.r_name, g.n_name, g.rev_cents,
       CAST(g.rev_cents * 1000000 // r.reg_tot AS BIGINT) AS share_in_region_ppm,
       CAST(r.reg_tot * 1000000 // t.total AS BIGINT) AS region_share_ppm
FROM g JOIN r ON g.r_name = r.r_name, t
ORDER BY g.r_name, g.n_name
"""


def orders_open_concurrency(sf_dir: str):
    """Sweep-line interval concurrency: treating each order as open for 30
    days, the peak number simultaneously open and the first day it happens.
    Block partials emit per-day (+starts, −ends) deltas — the fact table
    never sorts; the O(days) delta series folds on the driver with one
    cumsum (ends are exclusive, so a day's closings apply before its
    openings by construction of the ±delta merge)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        vals, cnts = np.unique(day, return_counts=True)
        return pa.table(
            {
                "d": pa.array(np.concatenate([vals, vals + 30]), pa.int64()),
                "delta": pa.array(
                    np.concatenate([cnts, -cnts]).astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("delta", alias_name="delta"))
        .to_pandas()
        .sort_values("d", kind="mergesort")
    )
    conc = np.cumsum(agg["delta"].to_numpy().astype(np.int64))
    peak = int(conc.max())
    first = int(agg["d"].to_numpy()[int(np.argmax(conc))])
    return pa.table(
        {
            "peak_concurrency": pa.array([peak], pa.int64()),
            "peak_day_epoch": pa.array([first], pa.int64()),
            "n_days": pa.array([len(conc)], pa.int64()),
        }
    )


ORDERS_OPEN_CONCURRENCY_SQL = """
WITH s AS (SELECT epoch_us(o_orderdate) // 86400000000 AS d,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1),
del AS (SELECT d, n AS delta FROM s UNION ALL SELECT d + 30, -n FROM s),
agg AS (SELECT d, SUM(delta) AS delta FROM del GROUP BY 1),
run AS (SELECT d, SUM(delta) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS conc
        FROM agg),
m AS (SELECT MAX(conc) AS peak FROM run)
SELECT CAST(peak AS BIGINT) AS peak_concurrency,
       CAST((SELECT MIN(d) FROM run WHERE conc = peak) AS BIGINT)
         AS peak_day_epoch,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM agg) AS n_days
FROM m
"""


def orders_runs_test_by_priority(sf_dir: str):
    """Wald–Wolfowitz runs test per priority: is the above/below-median
    price sequence (in orderdate, orderkey order) random?  The engine
    reduces each group to THREE integers (n₁ above, n₂ at-or-below, R
    runs); z is then ONE fixed IEEE expression using the compact identity
    σ² = (μ−1)(μ−2)/(N−1) — evaluated in the same operation order in both
    engines (e-notation literals on the SQL side), so the float statistic
    is bit-identical.  Groups where either side is empty have no defined
    test and are filtered by the INTEGER product gate n₁·n₂ > 0."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"],
    )
    _empty = pa.table(
        {
            "o_orderpriority": pa.array([], pa.string()),
            "n1": pa.array([], pa.int64()),
            "n2": pa.array([], pa.int64()),
            "runs": pa.array([], pa.int64()),
            "z": pa.array([], pa.float64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g,
                sort_keys=[("o_orderdate", "ascending"), ("o_orderkey", "ascending")],
            )
        )
        c = _cents(s["o_totalprice"]).to_numpy(zero_copy_only=False)
        med = int(np.sort(c)[(len(c) - 1) // 2])
        above = c > med
        n1 = int(above.sum())
        n2 = len(c) - n1
        if n1 * n2 == 0:
            return _empty
        runs = int(1 + np.count_nonzero(above[1:] != above[:-1]))
        ntot = n1 + n2
        mu = 2.0 * n1 * n2 / ntot + 1.0
        import math

        z = (runs - mu) / math.sqrt((mu - 1.0) * (mu - 2.0) / (ntot - 1.0))
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [str(s["o_orderpriority"][0].as_py())], pa.string()
                ),
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
                "runs": pa.array([runs], pa.int64()),
                "z": pa.array([z], pa.float64()),
            }
        )

    return (
        ds.groupby("o_orderpriority")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["o_orderpriority"])
    )


ORDERS_RUNS_TEST_BY_PRIORITY_SQL = """
WITH c AS (
  SELECT o_orderpriority, o_orderdate, o_orderkey,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders),
m AS (SELECT o_orderpriority, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med
      FROM c GROUP BY 1),
s AS (
  SELECT c.o_orderpriority,
         CASE WHEN cents > med THEN 1 ELSE 0 END AS ab,
         lag(CASE WHEN cents > med THEN 1 ELSE 0 END) OVER (
           PARTITION BY c.o_orderpriority ORDER BY o_orderdate, o_orderkey) AS pab
  FROM c JOIN m USING (o_orderpriority)),
a AS (
  SELECT o_orderpriority,
         CAST(SUM(ab) AS BIGINT) AS n1,
         CAST(SUM(1 - ab) AS BIGINT) AS n2,
         CAST(1 + SUM(CASE WHEN pab IS NOT NULL AND ab <> pab THEN 1 ELSE 0 END)
              AS BIGINT) AS runs
  FROM s GROUP BY 1)
SELECT o_orderpriority, n1, n2, runs,
       (runs - (2.0e0 * n1 * n2 / (n1 + n2) + 1.0e0))
         / sqrt(((2.0e0 * n1 * n2 / (n1 + n2) + 1.0e0) - 1.0e0)
                * ((2.0e0 * n1 * n2 / (n1 + n2) + 1.0e0) - 2.0e0)
                / ((n1 + n2) - 1.0e0)) AS z
FROM a WHERE n1 * n2 > 0
ORDER BY o_orderpriority
"""


def events_bot_flags(sf_dir: str):
    """Rule-based bot screening — the abuse-filter shape a crawl pipeline
    runs before counting engagement: per-user (event count, lower-median
    interarrival, type diversity), flagged against DATA-RELATIVE gates
    (faster than the population's median cadence / busier than its median
    volume / ≤2 distinct types).  Per-user groups reduce locally; the two
    population medians fold on the O(users) narrow table (the documented
    stages/quantiles path replaces the driver fold at real scale).  All
    gates are integer comparisons; single-event users carry med_gap = −1
    sentinel and can never be 'fast'."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        gaps = np.sort(np.diff(ts))
        med_gap = int(gaps[(len(gaps) - 1) // 2]) if len(gaps) else -1
        n_types = len(
            s["event_type"].combine_chunks().dictionary_encode().dictionary
        )
        return pa.table(
            {
                "user_id": pa.array([int(s["user_id"][0].as_py())], pa.int64()),
                "n_events": pa.array([g.num_rows], pa.int64()),
                "med_gap_us": pa.array([med_gap], pa.int64()),
                "n_types": pa.array([n_types], pa.int64()),
            }
        )

    per_user = (
        ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow").materialize()
    )
    pdf = per_user.to_pandas()
    gap_vals = np.sort(pdf.med_gap_us.to_numpy()[pdf.med_gap_us.to_numpy() >= 0])
    gmed_gap = int(gap_vals[(len(gap_vals) - 1) // 2])
    n_vals = np.sort(pdf.n_events.to_numpy())
    gmed_n = int(n_vals[(len(n_vals) - 1) // 2])

    def flags(t: pa.Table) -> pa.Table:
        mg = t["med_gap_us"].combine_chunks().to_numpy(zero_copy_only=False)
        ne = t["n_events"].combine_chunks().to_numpy(zero_copy_only=False)
        nt = t["n_types"].combine_chunks().to_numpy(zero_copy_only=False)
        fast = (mg >= 0) & (mg < gmed_gap)
        busy = ne > gmed_n
        narrow = nt <= 2
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_events": t["n_events"],
                "med_gap_us": t["med_gap_us"],
                "n_types": t["n_types"],
                "is_fast": pa.array(fast),
                "is_busy": pa.array(busy),
                "is_narrow": pa.array(narrow),
                "bot_score": pa.array(
                    fast.astype(np.int64) + busy.astype(np.int64) + narrow.astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return per_user.map_batches(flags, batch_format="pyarrow")


EVENTS_BOT_FLAGS_SQL = """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt
  FROM events),
gaps AS (SELECT user_id, t - pt AS gap FROM s WHERE pt IS NOT NULL),
med AS (SELECT user_id, CAST(quantile_disc(gap, 0.5) AS BIGINT) AS med_gap_us
        FROM gaps GROUP BY 1),
pu AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM events GROUP BY 1),
j AS (SELECT pu.user_id, n_events, COALESCE(med_gap_us, -1) AS med_gap_us, n_types
      FROM pu LEFT JOIN med USING (user_id)),
g AS (SELECT CAST(quantile_disc(CASE WHEN med_gap_us >= 0 THEN med_gap_us END, 0.5)
                  AS BIGINT) AS gmed_gap,
             CAST(quantile_disc(n_events, 0.5) AS BIGINT) AS gmed_n
      FROM j)
SELECT user_id, n_events, med_gap_us, n_types,
       med_gap_us >= 0 AND med_gap_us < gmed_gap AS is_fast,
       n_events > gmed_n AS is_busy,
       n_types <= 2 AS is_narrow,
       CAST(CAST(med_gap_us >= 0 AND med_gap_us < gmed_gap AS INT)
            + CAST(n_events > gmed_n AS INT)
            + CAST(n_types <= 2 AS INT) AS BIGINT) AS bot_score
FROM j, g
"""


def events_median_of_user_medians(sf_dir: str):
    """Two-level order statistic — the robust 'typical user's typical
    value': lower-median event cents PER USER (group-local sorts), then the
    lower-median OVER those user medians.  The outer fold sees only
    O(users) integers; both levels share the sorted[(n−1)//2]
    quantile_disc convention, so the composition is exactly mirrorable."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "value"])

    def kernel(g: pa.Table) -> pa.Table:
        c = np.sort(_cents(g["value"]).to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
                "med": pa.array([int(c[(len(c) - 1) // 2])], pa.int64()),
            }
        )

    meds = (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()["med"]
        .to_numpy()
    )
    meds = np.sort(meds.astype(np.int64))
    return pa.table(
        {
            "n_users": pa.array([len(meds)], pa.int64()),
            "median_of_medians_cents": pa.array(
                [int(meds[(len(meds) - 1) // 2])], pa.int64()
            ),
        }
    )


EVENTS_MEDIAN_OF_USER_MEDIANS_SQL = """
WITH m AS (
  SELECT user_id,
         CAST(quantile_disc(CAST(FLOOR(value*100 + 0.5) AS BIGINT), 0.5) AS BIGINT)
           AS med
  FROM events GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(quantile_disc(med, 0.5) AS BIGINT) AS median_of_medians_cents
FROM m
"""


def events_hourly_interp_fill(sf_dir: str):
    """Gap-fill by LINEAR interpolation (the zeros-fill's smarter sibling):
    each type's hourly value-cents series gets its silent hours filled with
    the exact integer interpolation (v₁·(t₂−t) + v₂·(t−t₁)) // (t₂−t₁)
    between the nearest present neighbors.  Cells come from block partials;
    the per-type kernel is two searchsorted arrays — no Python loop.  The
    oracle finds the neighbors with the monotone-pack trick (hour·2⁴⁰ +
    cents is order-isomorphic to hour since cents < 2⁴⁰, so running
    MAX/MIN windows recover both anchor coordinates at once)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb = pa.table(
            {
                "typ": t["event_type"],
                "hour": pa.array(ts // 3_600_000_000, pa.int64()),
                "cents": _cents(t["value"]),
            }
        )
        return tb.group_by(["typ", "hour"]).aggregate([("cents", "sum")]).rename_columns(
            ["typ", "hour", "cents"]
        )

    def kernel(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[("hour", "ascending")])
        s = g.take(order)
        ph = s["hour"].combine_chunks().to_numpy(zero_copy_only=False)
        pv = s["cents"].combine_chunks().to_numpy(zero_copy_only=False)
        grid = np.arange(ph[0], ph[-1] + 1, dtype=np.int64)
        left = np.searchsorted(ph, grid, side="right") - 1
        present = ph[left] == grid
        right = np.minimum(left + 1, len(ph) - 1)
        t1, v1 = ph[left], pv[left]
        t2, v2 = ph[right], pv[right]
        span = np.maximum(t2 - t1, 1)
        interp = (v1 * (t2 - grid) + v2 * (grid - t1)) // span
        cents = np.where(present, pv[np.maximum(left, 0)], interp)
        return pa.table(
            {
                "event_type": pa.array(
                    [str(s["typ"][0].as_py())] * len(grid), pa.string()
                ),
                "hour": pa.array(grid, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "interpolated": pa.array(~present),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["typ", "hour"])
        .aggregate(Sum("cents", alias_name="cents"))
        .groupby("typ")
        .map_groups(kernel, batch_format="pyarrow")
    )


EVENTS_HOURLY_INTERP_FILL_SQL = """
WITH c AS (
  SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
b AS (SELECT event_type, MIN(hour) AS mn, MAX(hour) AS mx FROM c GROUP BY 1),
g AS (SELECT event_type, CAST(unnest(range(mn, mx + 1)) AS BIGINT) AS hour FROM b),
f AS (SELECT g.event_type, g.hour, c.cents
      FROM g LEFT JOIN c USING (event_type, hour)),
p AS (
  SELECT event_type, hour, cents,
         MAX(CASE WHEN cents IS NOT NULL
                  THEN hour * 1099511627776 + cents END) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS UNBOUNDED PRECEDING) AS lpack,
         MIN(CASE WHEN cents IS NOT NULL
                  THEN hour * 1099511627776 + cents END) OVER (
           PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rpack
  FROM f)
SELECT event_type, hour,
       CAST(CASE WHEN cents IS NOT NULL THEN cents
                 ELSE ((lpack % 1099511627776) * (rpack // 1099511627776 - hour)
                       + (rpack % 1099511627776) * (hour - lpack // 1099511627776))
                      // (rpack // 1099511627776 - lpack // 1099511627776)
            END AS BIGINT) AS cents,
       cents IS NULL AS interpolated
FROM p
"""


def docs_dup_cluster_size_hist(sf_dir: str):
    """Dedup diagnostics — the cluster-size histogram every corpus report
    leads with: group documents by the exact-dup content key (lang,
    n_chars), then histogram the cluster sizes (size → how many clusters,
    and how many rows those clusters hold).  Two tiny cascaded groupbys
    over block partials; the result is O(distinct sizes)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "lang": t["lang"],
                "n_chars": t["n_chars"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["lang", "n_chars"]).aggregate([("n", "sum")]).rename_columns(
            ["lang", "n_chars", "n"]
        )

    sizes = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def size_partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "cluster_size": t["n"],
                "n_clusters": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by("cluster_size").aggregate([("n_clusters", "sum")]).rename_columns(
            ["cluster_size", "n_clusters"]
        )

    g = (
        sizes.map_batches(size_partial, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Sum("n_clusters", alias_name="n_clusters"))
        .to_pandas()
        .sort_values("cluster_size", kind="mergesort")
    )
    cs = g["cluster_size"].to_numpy().astype(np.int64)
    nc = g["n_clusters"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "cluster_size": pa.array(cs, pa.int64()),
            "n_clusters": pa.array(nc, pa.int64()),
            "n_rows": pa.array(cs * nc, pa.int64()),
        }
    )


DOCS_DUP_CLUSTER_SIZE_HIST_SQL = """
WITH c AS (
  SELECT lang, n_chars, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2)
SELECT n AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(n * COUNT(*) AS BIGINT) AS n_rows
FROM c GROUP BY 1 ORDER BY 1
"""


def events_hourly_peaks(sf_dir: str):
    """Signal-processing peak detection: per type, the count of STRICT
    local maxima in the zeros-gap-filled hourly count series, plus the
    first peak's hour — the change-point cousin every monitoring stack
    ships.  Interior cells only (boundary cells have one neighbor and are
    excluded by definition); the kernel is two vectorized shifts on the
    dense grid; the oracle mirrors with lag/lead over the same grid."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb = pa.table(
            {
                "typ": t["event_type"],
                "hour": pa.array(ts // 3_600_000_000, pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["typ", "hour"]).aggregate([("n", "sum")]).rename_columns(
            ["typ", "hour", "n"]
        )

    def kernel(g: pa.Table) -> pa.Table:
        hours = g["hour"].combine_chunks().to_numpy(zero_copy_only=False)
        counts = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        lo, hi = int(hours.min()), int(hours.max())
        dense = np.zeros(hi - lo + 1, np.int64)
        dense[hours - lo] = counts
        if len(dense) < 3:
            return pa.table(
                {
                    "event_type": pa.array([str(g["typ"][0].as_py())], pa.string()),
                    "n_peaks": pa.array([0], pa.int64()),
                    "first_peak_hour": pa.array([-1], pa.int64()),
                }
            )
        mid, left, right = dense[1:-1], dense[:-2], dense[2:]
        is_peak = (mid > left) & (mid > right)
        n_peaks = int(is_peak.sum())
        first = int(np.flatnonzero(is_peak)[0]) + lo + 1 if n_peaks else -1
        return pa.table(
            {
                "event_type": pa.array([str(g["typ"][0].as_py())], pa.string()),
                "n_peaks": pa.array([n_peaks], pa.int64()),
                "first_peak_hour": pa.array([first], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["typ", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("typ")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["event_type"])
    )


EVENTS_HOURLY_PEAKS_SQL = """
WITH c AS (
  SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT event_type, MIN(hour) AS mn, MAX(hour) AS mx FROM c GROUP BY 1),
g AS (SELECT event_type, CAST(unnest(range(mn, mx + 1)) AS BIGINT) AS hour FROM b),
f AS (SELECT g.event_type, g.hour, COALESCE(c.n, 0) AS n
      FROM g LEFT JOIN c USING (event_type, hour)),
w AS (
  SELECT event_type, hour, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY hour) AS ln,
         lead(n) OVER (PARTITION BY event_type ORDER BY hour) AS rn
  FROM f),
p AS (SELECT event_type, hour FROM w
      WHERE ln IS NOT NULL AND rn IS NOT NULL AND n > ln AND n > rn)
SELECT b.event_type,
       CAST(COALESCE(q.n_peaks, 0) AS BIGINT) AS n_peaks,
       CAST(COALESCE(q.first_peak_hour, -1) AS BIGINT) AS first_peak_hour
FROM b LEFT JOIN (
  SELECT event_type, COUNT(*) AS n_peaks, MIN(hour) AS first_peak_hour
  FROM p GROUP BY 1) q USING (event_type)
ORDER BY b.event_type
"""


def events_seasonal_naive_mae(sf_dir: str):
    """Forecast backtest — the seasonal-naïve baseline every time-series model
    must beat: predict each hour's arrival count by the count 24 h earlier
    (gap-filled grid), report per-type MAE over all predictable hours as
    exact integers (Σ|err|, n, and MAE in milli-events via integer
    cross-multiply).  Same two-level cell-partial layout as the lag-24
    autocorrelation."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb = pa.table(
            {
                "typ": t["event_type"],
                "hour": pa.array(ts // 3_600_000_000, pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["typ", "hour"]).aggregate([("n", "sum")]).rename_columns(
            ["typ", "hour", "n"]
        )

    _empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_pred": pa.array([], pa.int64()),
            "sum_abs_err": pa.array([], pa.int64()),
            "mae_milli": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        hours = g["hour"].combine_chunks().to_numpy(zero_copy_only=False)
        counts = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        lo, hi = int(hours.min()), int(hours.max())
        dense = np.zeros(hi - lo + 1, np.int64)
        dense[hours - lo] = counts
        if len(dense) < 25:
            return _empty
        err = np.abs(dense[24:] - dense[:-24])
        n_pred, sae = len(err), int(err.sum())
        return pa.table(
            {
                "event_type": pa.array([str(g["typ"][0].as_py())], pa.string()),
                "n_pred": pa.array([n_pred], pa.int64()),
                "sum_abs_err": pa.array([sae], pa.int64()),
                "mae_milli": pa.array([sae * 1000 // n_pred], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["typ", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("typ")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["event_type"])
    )


EVENTS_SEASONAL_NAIVE_MAE_SQL = """
WITH c AS (
  SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT event_type, MIN(hour) AS mn, MAX(hour) AS mx FROM c GROUP BY 1),
g AS (SELECT event_type, CAST(unnest(range(mn, mx + 1)) AS BIGINT) AS hour FROM b),
f AS (SELECT g.event_type, g.hour, COALESCE(c.n, 0) AS n
      FROM g LEFT JOIN c USING (event_type, hour)),
p AS (SELECT event_type, n,
             lag(n, 24) OVER (PARTITION BY event_type ORDER BY hour) AS pred
      FROM f),
a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pred,
             CAST(SUM(ABS(n - pred)) AS BIGINT) AS sum_abs_err
      FROM p WHERE pred IS NOT NULL GROUP BY 1)
SELECT event_type, n_pred, sum_abs_err,
       CAST(sum_abs_err * 1000 // n_pred AS BIGINT) AS mae_milli
FROM a ORDER BY event_type
"""


def docs_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth: scanning documents in doc_id order,
    which documents introduce NEW terms and how big the vocabulary is after
    each — per-term MIN(doc_id) via block partials (the first-occurrence
    reduction), then a count-per-introducing-doc groupby whose cumsum folds
    on the O(vocab)-bounded driver table.  The output has at most |vocab|
    rows regardless of corpus size."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = pc.take(t["doc_id"], parent)
        tb = pa.table({"term": flat, "doc_id": ids}).filter(
            pc.and_(pc.is_valid(flat), pc.not_equal(flat, ""))
        )
        return tb.group_by("term").aggregate([("doc_id", "min")]).rename_columns(
            ["term", "first_doc"]
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Min("first_doc", alias_name="first_doc"))
        .to_pandas()
        .groupby("first_doc")
        .size()
        .sort_index()
    )
    docs = g.index.to_numpy().astype(np.int64)
    new_terms = g.to_numpy().astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "new_terms": pa.array(new_terms, pa.int64()),
            "vocab_size": pa.array(np.cumsum(new_terms), pa.int64()),
        }
    )


DOCS_VOCAB_GROWTH_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
f AS (SELECT term, MIN(doc_id) AS first_doc FROM toks
      WHERE term <> '' GROUP BY 1),
c AS (SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_terms
      FROM f GROUP BY 1)
SELECT doc_id, new_terms,
       CAST(SUM(new_terms) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS vocab_size
FROM c ORDER BY doc_id
"""


def lineitem_ship_lag_stats(sf_dir: str):
    """Order-to-ship lead time per priority — the fulfillment SLA report:
    lag in whole days between the order date and each lineitem's ship date.
    Lineitem ships only (orderkey, shipdate-epoch-day) into the 8-partition
    join; per-priority groups reduce to exact integers (n, Σdays,
    lower-median days — the quantile_disc convention)."""
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
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    joined = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def kernel(g: pa.Table) -> pa.Table:
        ship = g["ship_day"].combine_chunks().to_numpy(zero_copy_only=False)
        od = g["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        lag = np.sort(ship - od)
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [str(g["o_orderpriority"][0].as_py())], pa.string()
                ),
                "n": pa.array([len(lag)], pa.int64()),
                "sum_lag_days": pa.array([int(lag.sum())], pa.int64()),
                "median_lag_days": pa.array([int(lag[(len(lag) - 1) // 2])], pa.int64()),
            }
        )

    return (
        joined.groupby("o_orderpriority")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["o_orderpriority"])
    )


LINEITEM_SHIP_LAG_STATS_SQL = """
WITH j AS (
  SELECT o_orderpriority,
         epoch_us(l_shipdate) // 86400000000
           - epoch_us(o_orderdate) // 86400000000 AS lag_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(lag_days) AS BIGINT) AS sum_lag_days,
       CAST(quantile_disc(lag_days, 0.5) AS BIGINT) AS median_lag_days
FROM j GROUP BY 1 ORDER BY 1
"""


def events_funnel_latency(sf_dir: str):
    """Funnel LATENCY (the funnel-count op's missing half): per user, the
    time from first 'click' to the first purchase AT OR AFTER it; the
    report is the conversion count plus the lower-median latency — per-user
    groups reduce to one candidate latency each, the global median folds
    over O(users) integers (stages/quantiles at real scale)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )
    _empty = pa.table(
        {"lat": pa.array([], pa.int64()), "clicked": pa.array([], pa.int64())}
    )

    def kernel(g: pa.Table) -> pa.Table:
        types = g["event_type"].combine_chunks()
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        clicks = ts[pc.equal(types, "click").to_numpy(zero_copy_only=False)]
        if not len(clicks):
            return _empty
        t0 = int(clicks.min())
        purch = ts[pc.equal(types, "purchase").to_numpy(zero_copy_only=False)]
        purch = purch[purch >= t0]
        if not len(purch):
            return pa.table(
                {"lat": pa.array([-1], pa.int64()), "clicked": pa.array([1], pa.int64())}
            )
        return pa.table(
            {
                "lat": pa.array([int(purch.min()) - t0], pa.int64()),
                "clicked": pa.array([1], pa.int64()),
            }
        )

    per_user = ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow").to_pandas()
    lats = np.sort(per_user.lat.to_numpy()[per_user.lat.to_numpy() >= 0])
    return pa.table(
        {
            "n_clicked": pa.array([int(per_user.clicked.sum())], pa.int64()),
            "n_converted": pa.array([len(lats)], pa.int64()),
            "median_latency_us": pa.array(
                [int(lats[(len(lats) - 1) // 2]) if len(lats) else -1], pa.int64()
            ),
        }
    )


EVENTS_FUNNEL_LATENCY_SQL = """
WITH c AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = 'click' GROUP BY 1),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS tp
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t0
  GROUP BY 1),
l AS (SELECT c.user_id, tp - t0 AS lat FROM c JOIN p USING (user_id))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_clicked,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(COALESCE(quantile_disc(lat, 0.5), -1) AS BIGINT) AS median_latency_us
FROM l
"""


def events_dau_wau_mau(sf_dir: str):
    """Product stickiness — the DAU/MAU engagement ratio: distinct active
    (user, day) pairs via block-local DISTINCT partials, per-day counts, and
    the overall distinct-user count; stickiness = Σdau·10⁶ // (n_days·mau),
    an exact integer ppm (the mean-DAU/MAU ratio with the division done
    once, cross-multiplied)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "day": pa.array(ts // 86_400_000_000, pa.int64()),
                }
            )
            .group_by(["user_id", "day"])
            .aggregate([])
        )

    pd_pairs = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_c"))
    )
    day_counts = (
        pd_pairs.map_batches(
            lambda t: pa.table(
                {"day": t["day"], "n": pa.array(np.ones(t.num_rows, np.int64))}
            )
            .group_by("day")
            .aggregate([("n", "sum")])
            .rename_columns(["day", "n"]),
            batch_format="pyarrow",
        )
        .groupby("day")
        .aggregate(Sum("n", alias_name="dau"))
        .to_pandas()
    )
    mau = len(pd_pairs.unique("user_id"))
    n_days = len(day_counts)
    sum_dau = int(day_counts["dau"].sum())
    return pa.table(
        {
            "n_days": pa.array([n_days], pa.int64()),
            "sum_dau": pa.array([sum_dau], pa.int64()),
            "mau": pa.array([mau], pa.int64()),
            "stickiness_ppm": pa.array(
                [sum_dau * 1_000_000 // (n_days * mau)], pa.int64()
            ),
        }
    )


EVENTS_DAU_WAU_MAU_SQL = """
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM p GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(dau) AS BIGINT)
               AS sum_dau FROM d),
m AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau FROM events)
SELECT n_days, sum_dau, mau,
       CAST(sum_dau * 1000000 // (n_days * mau) AS BIGINT) AS stickiness_ppm
FROM s, m
"""


def events_repeated_value_pairs(sf_dir: str):
    """Fraud screening — repeated identical charges: pairs of events by the
    SAME user with IDENTICAL value-cents, each pair reported with its time
    gap.  Co-partition by (user, cents) — the group key IS the match
    predicate, so the all-pairs blow-up is bounded by duplicate-amount
    group size (groups of 1, the overwhelming majority, emit nothing);
    inside a group the (ts, event_id) sort orders each pair once."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "cents": _cents(t["value"]),
                "ts_us": t["ts"].cast(pa.int64()),
                "event_id": t["event_id"],
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "e1": pa.array([], pa.int64()),
            "e2": pa.array([], pa.int64()),
            "gap_us": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return _empty
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts_us", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = s["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        key = s["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        i, j = np.triu_indices(n, k=1)
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(i), int(s["user_id"][0].as_py())), pa.int64()
                ),
                "cents": pa.array(
                    np.full(len(i), int(s["cents"][0].as_py())), pa.int64()
                ),
                "e1": pa.array(key[i], pa.int64()),
                "e2": pa.array(key[j], pa.int64()),
                "gap_us": pa.array(ts[j] - ts[i], pa.int64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow").groupby(
        ["user_id", "cents"]
    ).map_groups(kernel, batch_format="pyarrow")


EVENTS_REPEATED_VALUE_PAIRS_SQL = """
WITH c AS (
  SELECT user_id, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS tu, event_id
  FROM events)
SELECT a.user_id, a.cents,
       CAST(a.event_id AS BIGINT) AS e1, CAST(b.event_id AS BIGINT) AS e2,
       CAST(b.tu - a.tu AS BIGINT) AS gap_us
FROM c a JOIN c b
  ON a.user_id = b.user_id AND a.cents = b.cents
 AND (b.tu > a.tu OR (b.tu = a.tu AND b.event_id > a.event_id))
"""


def docs_quality_kappa(sf_dir: str):
    """Inter-rater agreement — Cohen's κ between two rule classifiers
    (A: chars above the corpus lower-median; B: tokens above theirs): the
    label-quality diagnostic an annotation pipeline runs before trusting
    auto-labels.  One tokenize pass reduces each doc to two integers; the
    2×2 contingency cells come from block partials; κ is ONE fixed IEEE
    expression over the four cell counts (identical operation order in
    numpy and DuckDB — e-notation literals)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["n_chars", "text"])

    def feats(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ok = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        ntok = np.bincount(parent[ok], minlength=t.num_rows).astype(np.int64)
        return pa.table(
            {
                "n_chars": t["n_chars"].cast(pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
            }
        )

    narrow = ds.map_batches(feats, batch_format="pyarrow").materialize()
    pdf = narrow.to_pandas()
    ch = np.sort(pdf.n_chars.to_numpy())
    tk = np.sort(pdf.n_tokens.to_numpy())
    med_ch = int(ch[(len(ch) - 1) // 2])
    med_tk = int(tk[(len(tk) - 1) // 2])

    def cells(t: pa.Table) -> pa.Table:
        a_gate = t["n_chars"].to_numpy(zero_copy_only=False) > med_ch
        b_gate = t["n_tokens"].to_numpy(zero_copy_only=False) > med_tk
        return pa.table(
            {
                "n11": pa.array([int((a_gate & b_gate).sum())], pa.int64()),
                "n10": pa.array([int((a_gate & ~b_gate).sum())], pa.int64()),
                "n01": pa.array([int((~a_gate & b_gate).sum())], pa.int64()),
                "n00": pa.array([int((~a_gate & ~b_gate).sum())], pa.int64()),
            }
        )

    s = narrow.map_batches(cells, batch_format="pyarrow").aggregate(
        Sum("n11", alias_name="n11"),
        Sum("n10", alias_name="n10"),
        Sum("n01", alias_name="n01"),
        Sum("n00", alias_name="n00"),
    )
    a, b, c, d = int(s["n11"]), int(s["n10"]), int(s["n01"]), int(s["n00"])
    n = a + b + c + d
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    kappa = (po - pe) / (1.0 - pe)
    return pa.table(
        {
            "n11": pa.array([a], pa.int64()),
            "n10": pa.array([b], pa.int64()),
            "n01": pa.array([c], pa.int64()),
            "n00": pa.array([d], pa.int64()),
            "kappa": pa.array([kappa], pa.float64()),
        }
    )


DOCS_QUALITY_KAPPA_SQL = """
WITH tk AS (
  SELECT doc_id, n_chars,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
per AS (
  SELECT doc_id, CAST(SUM(CASE WHEN term <> '' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tokens
  FROM tk GROUP BY 1),
d AS (SELECT documents.n_chars, COALESCE(per.n_tokens, 0) AS n_tokens
      FROM documents LEFT JOIN per USING (doc_id)),
m AS (SELECT CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med_ch,
             CAST(quantile_disc(n_tokens, 0.5) AS BIGINT) AS med_tk
      FROM d),
cells AS (
  SELECT
    CAST(SUM(CASE WHEN n_chars > med_ch AND n_tokens > med_tk THEN 1 ELSE 0 END)
         AS BIGINT) AS n11,
    CAST(SUM(CASE WHEN n_chars > med_ch AND n_tokens <= med_tk THEN 1 ELSE 0 END)
         AS BIGINT) AS n10,
    CAST(SUM(CASE WHEN n_chars <= med_ch AND n_tokens > med_tk THEN 1 ELSE 0 END)
         AS BIGINT) AS n01,
    CAST(SUM(CASE WHEN n_chars <= med_ch AND n_tokens <= med_tk THEN 1 ELSE 0 END)
         AS BIGINT) AS n00
  FROM d, m)
SELECT n11, n10, n01, n00,
       (CAST(n11 + n00 AS DOUBLE) / (n11 + n10 + n01 + n00)
        - CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
            / ((n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00)))
       / (1.0e0
          - CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
              / ((n11 + n10 + n01 + n00) * (n11 + n10 + n01 + n00))) AS kappa
FROM cells
"""


def docs_kwic_customer(sf_dir: str):
    """Keyword-in-context (concordance) extraction for the term 'customer':
    every occurrence with its 1-based token position and one term of left/
    right context — the qualitative-inspection surface a corpus curator
    samples from.  Fully vectorized: one flatten carries (doc, pos) via
    list_parent_indices + offset subtraction; context is a flat-index ±1
    gather masked at list boundaries (the '' sentinel, matching the
    oracle's COALESCE over doc-partitioned lag/lead)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def kwic(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        # split can emit '' tokens (leading/trailing separators): positions
        # must count NON-empty tokens only, exactly like the unnest+filter
        # oracle — so compact the token stream first
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        words = flat.filter(pa.array(keep))
        par = parent[keep]
        # 1-based position within each doc's compacted stream
        starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
        seg_id = np.cumsum(np.r_[0, (par[1:] != par[:-1]).astype(np.int64)])
        pos = np.arange(len(par), dtype=np.int64) - starts[seg_id] + 1
        hit = pc.equal(words, "customer").to_numpy(zero_copy_only=False)
        ix = np.flatnonzero(hit)
        if not len(ix):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "prev_term": pa.array([], pa.string()),
                    "next_term": pa.array([], pa.string()),
                }
            )
        wnp = words.to_pylist()
        prev_ok = (ix > 0) & (par[np.maximum(ix - 1, 0)] == par[ix])
        next_ok = (ix < len(par) - 1) & (
            par[np.minimum(ix + 1, len(par) - 1)] == par[ix]
        )
        prev = [wnp[i - 1] if ok else "" for i, ok in zip(ix, prev_ok)]
        nxt = [wnp[i + 1] if ok else "" for i, ok in zip(ix, next_ok)]
        doc_ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[par[ix]], pa.int64()),
                "pos": pa.array(pos[ix], pa.int64()),
                "prev_term": pa.array(prev, pa.string()),
                "next_term": pa.array(nxt, pa.string()),
            }
        )

    return ds.map_batches(kwic, batch_format="pyarrow")


DOCS_KWIC_CUSTOMER_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
f AS (
  -- lockstep unnest carries the IN-LIST position (ROW_NUMBER without an
  -- ORDER BY over unnest output is order-fragile)
  SELECT doc_id, unnest(l) AS term,
         CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM d),
w AS (
  SELECT doc_id, term, pos,
         COALESCE(lag(term) OVER (PARTITION BY doc_id ORDER BY pos), '')
           AS prev_term,
         COALESCE(lead(term) OVER (PARTITION BY doc_id ORDER BY pos), '')
           AS next_term
  FROM f)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, prev_term, next_term
FROM w WHERE term = 'customer'
"""


def docs_boilerplate_trigrams(sf_dir: str):
    """Boilerplate screening — trigrams whose DOCUMENT frequency crosses
    20 % of the corpus (the repeated-template signal behind header/footer
    stripping).  Per-block: three aligned token slices form trigrams, an
    Arrow group_by collapses them to DISTINCT (doc, trigram) pairs — each
    doc lives in exactly one block row, so block-local distinct IS global
    distinct; the trigram groupby then ships O(distinct trigrams), and the
    ppm gate is an integer cross-multiply."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"]).count()

    def pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        words = flat.filter(pa.array(keep))
        par = parent[keep]
        if len(par) < 3:
            return pa.table(
                {"trigram": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())}
            )
        same = (par[:-2] == par[1:-1]) & (par[1:-1] == par[2:])
        w = words.to_pylist()
        tri = [
            f"{w[i]} {w[i+1]} {w[i+2]}" for i in np.flatnonzero(same)
        ]
        doc_ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        docs = doc_ids[par[:-2][same]]
        return (
            pa.table(
                {
                    "trigram": pa.array(tri, pa.string()),
                    "doc_id": pa.array(docs, pa.int64()),
                }
            )
            .group_by(["trigram", "doc_id"])
            .aggregate([])
        )

    g = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table(
                {"trigram": t["trigram"], "n": pa.array(np.ones(t.num_rows, np.int64))}
            )
            .group_by("trigram")
            .aggregate([("n", "sum")])
            .rename_columns(["trigram", "df"]),
            batch_format="pyarrow",
        )
        .groupby("trigram")
        .aggregate(Sum("df", alias_name="df"))
    )

    def gate(t: pa.Table) -> pa.Table:
        df = t["df"].combine_chunks().to_numpy(zero_copy_only=False)
        ppm = df * 1_000_000 // n_docs
        out = pa.table(
            {
                "trigram": t["trigram"],
                "df": pa.array(df, pa.int64()),
                "df_ppm": pa.array(ppm, pa.int64()),
            }
        )
        return out.filter(pa.array(ppm >= 10_000))

    return g.map_batches(gate, batch_format="pyarrow").sort(
        ["df", "trigram"], descending=[True, False]
    )


DOCS_BOILERPLATE_TRIGRAMS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
f AS (
  SELECT doc_id, unnest(l) AS term,
         CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM d),
w AS (
  SELECT doc_id,
         term || ' ' || lead(term, 1) OVER (PARTITION BY doc_id ORDER BY pos)
              || ' ' || lead(term, 2) OVER (PARTITION BY doc_id ORDER BY pos)
           AS trigram,
         lead(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
  FROM f),
p AS (SELECT DISTINCT doc_id, trigram FROM w WHERE t2 IS NOT NULL),
c AS (SELECT trigram, CAST(COUNT(*) AS BIGINT) AS df FROM p GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT trigram, df,
       CAST(df * 1000000 // n_docs AS BIGINT) AS df_ppm
FROM c, n WHERE df * 1000000 // n_docs >= 10000
ORDER BY df DESC, trigram
"""


def lineitem_abc_classification(sf_dir: str):
    """Inventory ABC analysis — parts classified by cumulative revenue
    share (A ≤ 80 %, B ≤ 95 %, C rest) over the revenue-descending order.
    The global cumulative sum composes two existing scan primitives with NO
    driver-side sort: ``rank.global_value_rank`` on (−revenue, partkey)
    densifies the total order, then ``scan.running_sum`` over that dense
    rank computes the prefix revenue distributed (two-phase bucket scan).
    Class gates are integer cross-multiplies (cum·10 ≤ 8·total etc.)."""
    from ...stages.rank import global_value_rank
    from ...stages.scan import running_sum

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_partkey", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])))
        tb = pa.table({"l_partkey": t["l_partkey"], "rev": rev})
        return tb.group_by("l_partkey").aggregate([("rev", "sum")]).rename_columns(
            ["l_partkey", "rev"]
        )

    per_part = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("rev", alias_name="rev_cents"))
        .map_batches(
            lambda t: t.append_column(
                "neg_rev",
                pc.negate_checked(t["rev_cents"]),
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    total = int(per_part.sum("rev_cents"))
    ranked = global_value_rank(
        per_part, value_col="neg_rev", id_col="l_partkey", out_col="rnk"
    )
    scanned = running_sum(ranked, order_col="rnk", value_col="rev_cents", out_col="cum_cents")

    def classify(t: pa.Table) -> pa.Table:
        cum = t["cum_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        cls = np.where(
            cum * 10 <= 8 * total, "A", np.where(cum * 100 <= 95 * total, "B", "C")
        )
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "rev_cents": t["rev_cents"],
                "cum_cents": t["cum_cents"],
                "abc_class": pa.array(cls.tolist(), pa.string()),
            }
        )

    return scanned.map_batches(classify, batch_format="pyarrow")


LINEITEM_ABC_CLASSIFICATION_SQL = """
WITH r AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY 1),
c AS (
  SELECT l_partkey, rev_cents,
         SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(rev_cents) OVER () AS total
  FROM r)
SELECT l_partkey, rev_cents, CAST(cum AS BIGINT) AS cum_cents,
       CASE WHEN cum * 10 <= 8 * total THEN 'A'
            WHEN cum * 100 <= 95 * total THEN 'B'
            ELSE 'C' END AS abc_class
FROM c
"""


def orders_monthly_zchart(sf_dir: str):
    """Z-chart report — the classic three-line management view: monthly
    revenue, year-to-date cumulative, and the 12-row trailing moving annual
    total (ROWS-based over the observed month series, so both engines agree
    regardless of calendar gaps).  The fact table reduces to O(months)
    cells via block partials; all three lines fold on the driver in exact
    cents."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"]).cast(pa.int64())
        mo = pc.month(t["o_orderdate"]).cast(pa.int64())
        ym = pc.add(pc.multiply(yr, 100), mo)
        return (
            pa.table({"ym": ym, "cents": _cents(t["o_totalprice"])})
            .group_by("ym")
            .aggregate([("cents", "sum")])
            .rename_columns(["ym", "cents"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("cents", alias_name="rev_cents"))
        .to_pandas()
        .sort_values("ym", kind="mergesort")
        .reset_index(drop=True)
    )
    ym = g["ym"].to_numpy().astype(np.int64)
    rev = g["rev_cents"].to_numpy().astype(np.int64)
    yr = ym // 100
    ytd = np.empty(len(rev), np.int64)
    run = 0
    last_yr = -1
    for i in range(len(rev)):  # O(months) driver fold
        if yr[i] != last_yr:
            run, last_yr = 0, yr[i]
        run += rev[i]
        ytd[i] = run
    cs = np.concatenate([[0], np.cumsum(rev)])
    mat = cs[1:] - cs[np.maximum(np.arange(len(rev)) - 11, 0)]
    return pa.table(
        {
            "ym": pa.array(ym, pa.int64()),
            "rev_cents": pa.array(rev, pa.int64()),
            "ytd_cents": pa.array(ytd, pa.int64()),
            "mat_cents": pa.array(mat, pa.int64()),
        }
    )


ORDERS_MONTHLY_ZCHART_SQL = """
WITH m AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1)
SELECT ym, rev_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY ym // 100 ORDER BY ym
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS ytd_cents,
       CAST(SUM(rev_cents) OVER (ORDER BY ym
                                 ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS mat_cents
FROM m ORDER BY ym
"""


def events_type_drift_halves(sf_dir: str):
    """Distribution drift — total-variation distance between the event-type
    mix of the FIRST and SECOND halves of the time range (the train/serve
    skew check).  The midpoint is (min+max)//2 of the timestamp domain;
    per-(half, type) cells come from block partials; TV in ppm is the exact
    integer Σ|c₁·N₂ − c₂·N₁|·10⁶ // (2·N₁·N₂) — the ratio-difference sum
    cross-multiplied so no float mix proportions ever exist."""
    mm_ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"]).map_batches(
        lambda t: pa.table({"ts_us": t["ts"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    lo = int(mm_ds.min("ts_us"))
    hi = int(mm_ds.max("ts_us"))
    mid = (lo + hi) // 2
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb = pa.table(
            {
                "typ": t["event_type"],
                "half": pa.array((ts > mid).astype(np.int64), pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["typ", "half"]).aggregate([("n", "sum")]).rename_columns(
            ["typ", "half", "n"]
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["typ", "half"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = g.pivot_table(index="typ", columns="half", values="n", fill_value=0)
    c1 = piv.get(0, 0)
    c2 = piv.get(1, 0)
    import pandas as pd

    c1 = (c1 if hasattr(c1, "to_numpy") else pd.Series(0, index=piv.index)).to_numpy().astype(np.int64)
    c2 = (c2 if hasattr(c2, "to_numpy") else pd.Series(0, index=piv.index)).to_numpy().astype(np.int64)
    n1, n2 = int(c1.sum()), int(c2.sum())
    tv_ppm = int(np.abs(c1 * n2 - c2 * n1).sum() * 1_000_000 // (2 * n1 * n2))
    return pa.table(
        {
            "n_first": pa.array([n1], pa.int64()),
            "n_second": pa.array([n2], pa.int64()),
            "n_types": pa.array([len(piv)], pa.int64()),
            "tv_ppm": pa.array([tv_ppm], pa.int64()),
        }
    )


EVENTS_TYPE_DRIFT_HALVES_SQL = """
WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events),
c AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) > mid THEN 1 ELSE 0 END AS half,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events, b GROUP BY 1, 2),
p AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN half = 0 THEN n ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN half = 1 THEN n ELSE 0 END) AS BIGINT) AS c2
  FROM c GROUP BY 1),
t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM p)
SELECT CAST(n1 AS BIGINT) AS n_first, CAST(n2 AS BIGINT) AS n_second,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_types,
       CAST(SUM(ABS(c1 * n2 - c2 * n1)) * 1000000 // (2 * n1 * n2) AS BIGINT)
         AS tv_ppm
FROM p, t GROUP BY n1, n2
"""


def events_user_churn_halves(sf_dir: str):
    """Churn accounting between the two halves of the time range: retained
    (active both), churned (first only), new (second only) user counts.
    Per-user half-presence flags via one keyed Sum of indicators — the
    distinct-set differences without materializing any user set; integer
    end to end."""
    mm_ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"]).map_batches(
        lambda t: pa.table({"ts_us": t["ts"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    lo, hi = int(mm_ds.min("ts_us")), int(mm_ds.max("ts_us"))
    mid = (lo + hi) // 2
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def flags(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "h1": pa.array((ts <= mid).astype(np.int64), pa.int64()),
                "h2": pa.array((ts > mid).astype(np.int64), pa.int64()),
            }
        )

    per_user = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("h1", alias_name="h1"), Sum("h2", alias_name="h2"))
    )

    def cells(t: pa.Table) -> pa.Table:
        h1 = t["h1"].combine_chunks().to_numpy(zero_copy_only=False) > 0
        h2 = t["h2"].combine_chunks().to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "retained": pa.array([int((h1 & h2).sum())], pa.int64()),
                "churned": pa.array([int((h1 & ~h2).sum())], pa.int64()),
                "new_users": pa.array([int((~h1 & h2).sum())], pa.int64()),
            }
        )

    s = per_user.map_batches(cells, batch_format="pyarrow").aggregate(
        Sum("retained", alias_name="retained"),
        Sum("churned", alias_name="churned"),
        Sum("new_users", alias_name="new_users"),
    )
    return pa.table(
        {
            "retained": pa.array([int(s["retained"])], pa.int64()),
            "churned": pa.array([int(s["churned"])], pa.int64()),
            "new_users": pa.array([int(s["new_users"])], pa.int64()),
        }
    )
