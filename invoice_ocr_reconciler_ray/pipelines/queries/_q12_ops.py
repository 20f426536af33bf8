"""Query-registry family module 12: accounts-payable controls + lexical /
agreement / estimator ops (round-5 continuation, wave B).

The first two ops re-plant this engine's REFERENCE DOMAIN (invoice
reconciliation, reconciliationEngine.js) at corpus scale:

* `orders_double_payment_audit` — the classic AP duplicate-payment
  control: same customer, amounts within 5 %, dates within 30 days;
* `orders_three_way_match_census` — PO ↔ receipt ↔ invoice three-way
  match with a deterministic invoice perturbation and integer ratio bands;
* `register_invoice_number_collisions` — invoice-reference normalization
  collision census (case/zero-pad/punctuation folds).

Plus engine-side analytics with no prior coverage in the 773-entry
registry (checked against the full key list):

* `docs_rake_keyword_scores` — RAKE keyword extraction with
  corpus-derived stopwords and the gaps-and-islands phrase split;
* `docs_gate_fleiss_kappa` — Fleiss' κ agreement across three heuristic
  quality raters, exact cross-multiplied ppm;
* `customer_ltv_by_tenure` — cohort LTV curve by months-since-first-order;
* `orders_monthly_theil_sen_slope` — Theil-Sen median slope selected
  under a deterministic exact-integer ordering;
* `docs_source_weighted_jaccard_matrix` — weighted (multiset) Jaccard
  between source term-frequency profiles via the Σmax = tot₁+tot₂−Σmin
  identity;
* `events_retry_backoff_census` — retry-chain gap-monotonicity census;
* `lineitem_abc_xyz_matrix` — the joint ABC×XYZ inventory-planning
  matrix composing the two existing per-part classifications.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t

_DAY_US = 86_400_000_000


def orders_double_payment_audit(sf_dir: str):
    """Duplicate-payment audit (the reference's own failure domain — a
    vendor invoice paid twice): ordered pairs of one customer's orders
    whose amounts agree within 5 % (integer cross-multiply, no floats)
    and whose dates are ≤ 30 days apart.  Co-partition by customer; each
    group runs one vectorized pair mask (orders-per-customer is small so
    the group quadratic is bounded); survivors are rare, so the pair list
    itself is the audit artifact."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    _empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "okey_a": pa.array([], pa.int64()),
            "okey_b": pa.array([], pa.int64()),
            "cents_a": pa.array([], pa.int64()),
            "cents_b": pa.array([], pa.int64()),
            "gap_days": pa.array([], pa.int64()),
        }
    )

    def pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _empty
        ok = g["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        d = (
            g["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            // _DAY_US
        )
        cents = np.floor(
            g["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        lo = ok[:, None] < ok[None, :]
        close_amt = (
            np.abs(cents[:, None] - cents[None, :]) * 100
            <= 5 * np.minimum(cents[:, None], cents[None, :])
        )
        close_day = np.abs(d[:, None] - d[None, :]) <= 30
        ia, ib = np.nonzero(lo & close_amt & close_day)
        if len(ia) == 0:
            return _empty
        return pa.table(
            {
                "o_custkey": pa.array(
                    np.full(len(ia), g["o_custkey"][0].as_py(), np.int64), pa.int64()
                ),
                "okey_a": pa.array(ok[ia], pa.int64()),
                "okey_b": pa.array(ok[ib], pa.int64()),
                "cents_a": pa.array(cents[ia], pa.int64()),
                "cents_b": pa.array(cents[ib], pa.int64()),
                "gap_days": pa.array(np.abs(d[ia] - d[ib]), pa.int64()),
            }
        )

    t = pa.concat_tables(
        list(
            ds.groupby("o_custkey")
            .map_groups(pairs, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("o_custkey", "ascending"), ("okey_a", "ascending"), ("okey_b", "ascending")]
        )
    )


ORDERS_DOUBLE_PAYMENT_AUDIT_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(o_orderdate) // 86400000000 AS d
  FROM orders
)
SELECT a.o_custkey,
       a.o_orderkey AS okey_a, b.o_orderkey AS okey_b,
       a.cents AS cents_a, b.cents AS cents_b,
       CAST(ABS(a.d - b.d) AS BIGINT) AS gap_days
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
WHERE ABS(a.cents - b.cents) * 100 <= 5 * LEAST(a.cents, b.cents)
  AND ABS(a.d - b.d) <= 30
ORDER BY a.o_custkey, okey_a, okey_b
"""


def orders_three_way_match_census(sf_dir: str):
    """Three-way match (PO ↔ goods receipt ↔ vendor invoice — the AP
    control the reference's reconcile endpoint approximates pairwise):
    the receipt leg is the exact integer lineitem net total per order,
    classified against the PO amount into cross-multiplied ratio bands;
    the invoice leg is the PO plus a deterministic perturbation (orders
    with key % 97 == 0 get a (key % 500) − 250 cent error — the synthetic
    rule is mirrored verbatim in SQL).  Census over the status matrix
    with the total absolute invoice variance per cell."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"]
    )

    def li_prep(t: pa.Table) -> pa.Table:
        net = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(
                            pc.multiply(
                                pc.cast(t["l_extendedprice"], pa.float64()),
                                pc.subtract(1.0, pc.cast(t["l_discount"], pa.float64())),
                            ),
                            pc.add(1.0, pc.cast(t["l_tax"], pa.float64())),
                        ),
                        100.0,
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        )
        return (
            pa.table({"l_orderkey": t["l_orderkey"], "rc": net})
            .group_by("l_orderkey")
            .aggregate([("rc", "sum")])
            .rename_columns(["l_orderkey", "rc"])
        )

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    joined = li.map_batches(li_prep, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def order_partial(t: pa.Table) -> pa.Table:
        po = pa.array(
            np.floor(
                t["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0
                + 0.5
            ).astype(np.int64),
            pa.int64(),
        )
        return (
            pa.table({"l_orderkey": t["l_orderkey"], "rc": t["rc"], "po": po})
            .group_by("l_orderkey")
            .aggregate([("rc", "sum"), ("po", "min")])
            .rename_columns(["l_orderkey", "rc", "po"])
        )

    from ray.data.aggregate import Min

    per_order = (
        joined.map_batches(order_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rc", alias_name="rc"), Min("po", alias_name="po"))
    )

    def census(t: pa.Table) -> pa.Table:
        ku = t["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        rc = t["rc"].combine_chunks().to_numpy(zero_copy_only=False)
        po_u = t["po"].combine_chunks().to_numpy(zero_copy_only=False)
        delta = np.where(ku % 97 == 0, ku % 500 - 250, 0)
        inv_status = np.where(delta == 0, "inv_exact", "inv_variance")
        rec_status = np.select(
            [rc * 2 < po_u, rc <= po_u, rc <= 2 * po_u],
            ["under_half", "under", "over"],
            default="over_double",
        )
        return (
            pa.table(
                {
                    "invoice_status": pa.array(inv_status.astype(object), pa.string()),
                    "receipt_status": pa.array(rec_status.astype(object), pa.string()),
                    "n": pa.array(np.ones(len(ku), np.int64)),
                    "abs_delta": pa.array(np.abs(delta).astype(np.int64), pa.int64()),
                }
            )
            .group_by(["invoice_status", "receipt_status"])
            .aggregate([("n", "sum"), ("abs_delta", "sum")])
            .rename_columns(["invoice_status", "receipt_status", "n", "abs_delta"])
        )

    g = (
        per_order.map_batches(census, batch_format="pyarrow")
        .groupby(["invoice_status", "receipt_status"])
        .aggregate(
            Sum("n", alias_name="n_orders"),
            Sum("abs_delta", alias_name="sum_abs_invoice_delta_cents"),
        )
        .to_pandas()
        .sort_values(["invoice_status", "receipt_status"], kind="mergesort")
    )
    return pa.table(
        {
            "invoice_status": pa.array([str(x) for x in g["invoice_status"]], pa.string()),
            "receipt_status": pa.array([str(x) for x in g["receipt_status"]], pa.string()),
            "n_orders": pa.array(g["n_orders"].to_numpy().astype(np.int64), pa.int64()),
            "sum_abs_invoice_delta_cents": pa.array(
                g["sum_abs_invoice_delta_cents"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


ORDERS_THREE_WAY_MATCH_CENSUS_SQL = """
WITH rec AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                             * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rc
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o_orderkey AS k, rc,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS po
  FROM orders JOIN rec ON o_orderkey = l_orderkey
), cls AS (
  SELECT CASE WHEN k % 97 = 0 THEN k % 500 - 250 ELSE 0 END AS delta,
         CASE WHEN k % 97 = 0 AND k % 500 - 250 <> 0
              THEN 'inv_variance' ELSE 'inv_exact' END AS invoice_status,
         CASE WHEN rc * 2 < po THEN 'under_half'
              WHEN rc <= po THEN 'under'
              WHEN rc <= 2 * po THEN 'over'
              ELSE 'over_double' END AS receipt_status
  FROM j
)
SELECT invoice_status, receipt_status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(ABS(delta)) AS BIGINT) AS sum_abs_invoice_delta_cents
FROM cls
GROUP BY invoice_status, receipt_status
ORDER BY invoice_status, receipt_status
"""


def register_invoice_number_collisions(sf_dir: str):
    """Invoice-reference normalization collision census — the register-
    side dedup hazard (two dirty spellings of one invoice number slip past
    exact matching; invoiceParser.js normalizes before compare).  Dirty
    references are derived deterministically from the customer table
    (zero-padded / lower-case / space / mixed-case variants of a shared
    base id, so collisions exist by construction); normalization is
    upper-case → strip non-alphanumerics → drop leading zeros after the
    INV prefix, mirrored glyph-for-glyph in SQL.  Output: collision-group
    size histogram over normalized references."""
    ds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"])

    def norm_partial(t: pa.Table) -> pa.Table:
        ks = t["c_custkey"].to_numpy(zero_copy_only=False)
        refs = []
        for k in ks:
            b = (int(k) + 1) // 2
            v = int(k) % 4
            if v == 0:
                refs.append(f"INV-{b:07d}")
            elif v == 1:
                refs.append(f"inv-{b}")
            elif v == 2:
                refs.append(f"INV {b}")
            else:
                refs.append(f"Inv-{b}")
        norm = [re.sub(r"^INV0*", "INV", re.sub(r"[^A-Z0-9]", "", r.upper())) for r in refs]
        return (
            pa.table({"norm": pa.array(norm, pa.string())})
            .group_by("norm")
            .aggregate([("norm", "count")])
            .rename_columns(["norm", "n"])
        )

    g = (
        ds.map_batches(norm_partial, batch_format="pyarrow")
        .groupby("norm")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    from collections import Counter

    hist = Counter(int(v) for v in g["n"])
    sizes = sorted(hist)
    return pa.table(
        {
            "group_size": pa.array(sizes, pa.int64()),
            "n_groups": pa.array([hist[s] for s in sizes], pa.int64()),
        }
    )


REGISTER_INVOICE_NUMBER_COLLISIONS_SQL = """
WITH refs AS (
  SELECT CASE c_custkey % 4
           WHEN 0 THEN 'INV-' || lpad(CAST((c_custkey + 1) // 2 AS VARCHAR), 7, '0')
           WHEN 1 THEN 'inv-' || CAST((c_custkey + 1) // 2 AS VARCHAR)
           WHEN 2 THEN 'INV ' || CAST((c_custkey + 1) // 2 AS VARCHAR)
           ELSE 'Inv-' || CAST((c_custkey + 1) // 2 AS VARCHAR)
         END AS ref
  FROM customer
), n AS (
  SELECT regexp_replace(regexp_replace(upper(ref), '[^A-Z0-9]', '', 'g'),
                        '^INV0*', 'INV') AS norm
  FROM refs
), g AS (
  SELECT norm, CAST(COUNT(*) AS BIGINT) AS n FROM n GROUP BY norm
)
SELECT n AS group_size, CAST(COUNT(*) AS BIGINT) AS n_groups
FROM g GROUP BY n ORDER BY n
"""


def docs_rake_keyword_scores(sf_dir: str):
    """RAKE keyword extraction (Rapid Automatic Keyword Extraction) with
    corpus-derived stopwords: the five globally most frequent terms
    (count desc, term asc tie-break) are the stopword set; candidate
    phrases are the maximal stopword-free token runs; each word scores
    degree/frequency where degree accumulates the length of every phrase
    the word occurs in.  Two passes: a distributed term count elects the
    stopwords, then a per-doc phrase pass emits (word, freq, degree)
    partials — both vocabulary-bounded.  Scores are exact integer ppm."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, ""))
        return (
            pa.table({"term": flat.filter(keep)})
            .group_by("term")
            .aggregate([("term", "count")])
            .rename_columns(["term", "n"])
        )

    tc = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tc = tc.sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
    stop = set(tc["term"].head(5))

    def phrase_partial(t: pa.Table) -> pa.Table:
        freq: dict = {}
        deg: dict = {}
        for s in t["text"].to_pylist():
            toks = [w for w in re.split(r"[^a-z0-9]+", (s or "").lower()) if w]
            run: list = []
            for w in toks + [None]:
                if w is None or w in stop:
                    if run:
                        plen = len(run)
                        for x in run:
                            freq[x] = freq.get(x, 0) + 1
                            deg[x] = deg.get(x, 0) + plen
                        run = []
                else:
                    run.append(w)
        ks = sorted(freq)
        return pa.table(
            {
                "word": pa.array(ks, pa.string()),
                "freq": pa.array([freq[k] for k in ks], pa.int64()),
                "degree": pa.array([deg[k] for k in ks], pa.int64()),
            }
        )

    g = (
        ds.map_batches(phrase_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"), Sum("degree", alias_name="degree"))
        .to_pandas()
        .sort_values("word", kind="mergesort")
    )
    f = g["freq"].to_numpy().astype(np.int64)
    d = g["degree"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "word": pa.array([str(w) for w in g["word"]], pa.string()),
            "freq": pa.array(f, pa.int64()),
            "degree": pa.array(d, pa.int64()),
            "score_ppm": pa.array(d * 1_000_000 // f, pa.int64()),
        }
    )


DOCS_RAKE_KEYWORD_SCORES_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
), f AS (
  SELECT doc_id, unnest(l) AS term,
         CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM d
), tc AS (
  SELECT term, COUNT(*) AS n FROM f GROUP BY term
), stop AS (
  SELECT term FROM tc ORDER BY n DESC, term LIMIT 5
), nonstop AS (
  SELECT doc_id, term, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM f WHERE term NOT IN (SELECT term FROM stop)
), ph AS (
  SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS plen
  FROM nonstop GROUP BY doc_id, grp
), w AS (
  SELECT ns.term, ph.plen
  FROM nonstop ns JOIN ph ON ns.doc_id = ph.doc_id AND ns.grp = ph.grp
)
SELECT term AS word,
       CAST(COUNT(*) AS BIGINT) AS freq,
       CAST(SUM(plen) AS BIGINT) AS degree,
       CAST(SUM(plen) * 1000000 // COUNT(*) AS BIGINT) AS score_ppm
FROM w GROUP BY term ORDER BY term
"""


def docs_gate_fleiss_kappa(sf_dir: str):
    """Fleiss' κ inter-rater agreement across THREE heuristic quality
    raters (char-length ≥ 200, token count ≥ 40, distinct-token count
    ≥ 15) — the calibration number for an ensemble quality gate: κ ≈ 0
    means the gates fire independently, κ → 1 means they are redundant.
    With the per-doc positive-vote count, κ reduces to the exact rational
    (3·A·N − 2·B) / (2·(9·N² − B)) where A = Σᵢ Σⱼ nᵢⱼ(nᵢⱼ−1) and
    B = Σⱼ cⱼ² — emitted as sign-abs floored ppm (DuckDB // truncates
    toward zero; Python floors — the sign-abs form is written on BOTH
    sides).  One distributed pass emits (A, c_pos) partials."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        a_sum = 0
        c_pos = 0
        n_docs = 0
        for s in t["text"].to_pylist():
            s = s or ""
            toks = [w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]
            pos = int(len(s) >= 200) + int(len(toks) >= 40) + int(len(set(toks)) >= 15)
            neg = 3 - pos
            a_sum += pos * (pos - 1) + neg * (neg - 1)
            c_pos += pos
            n_docs += 1
        return pa.table(
            {
                "a_sum": pa.array([a_sum], pa.int64()),
                "c_pos": pa.array([c_pos], pa.int64()),
                "n_docs": pa.array([n_docs], pa.int64()),
            }
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .sum(["a_sum", "c_pos", "n_docs"])
    )
    a, cp, n = int(g["sum(a_sum)"]), int(g["sum(c_pos)"]), int(g["sum(n_docs)"])
    cn = 3 * n - cp
    b = cp * cp + cn * cn
    num = (3 * a * n - 2 * b) * 1_000_000
    den = 2 * (9 * n * n - b)
    if den == 0:
        kappa_ppm = 0
    elif num >= 0:
        kappa_ppm = num // den
    else:
        kappa_ppm = -((-num) // den)
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "a_pairs": pa.array([a], pa.int64()),
            "b_sq": pa.array([b], pa.int64()),
            "kappa_ppm": pa.array([kappa_ppm], pa.int64()),
        }
    )


DOCS_GATE_FLEISS_KAPPA_SQL = """
WITH v AS (
  SELECT (CASE WHEN strlen(text) >= 200 THEN 1 ELSE 0 END
          + CASE WHEN len(list_filter(string_split_regex(lower(text),
                  '[^a-z0-9]+'), x -> x <> '')) >= 40 THEN 1 ELSE 0 END
          + CASE WHEN len(list_distinct(list_filter(string_split_regex(
                  lower(text), '[^a-z0-9]+'), x -> x <> ''))) >= 15
                 THEN 1 ELSE 0 END) AS pos
  FROM documents
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pos * (pos - 1) + (3 - pos) * (2 - pos)) AS BIGINT) AS a,
         CAST(SUM(pos) AS BIGINT) AS cp
  FROM v
), k AS (
  SELECT n, a, cp, 3 * n - cp AS cn,
         cp * cp + (3 * n - cp) * (3 * n - cp) AS b
  FROM s
)
SELECT n AS n_docs, a AS a_pairs, b AS b_sq,
       CAST(CASE WHEN 2 * (9 * n * n - b) = 0 THEN 0
                 WHEN (3 * a * n - 2 * b) >= 0
                 THEN (3 * a * n - 2 * b) * 1000000 // (2 * (9 * n * n - b))
                 ELSE -((-(3 * a * n - 2 * b)) * 1000000
                        // (2 * (9 * n * n - b)))
            END AS BIGINT) AS kappa_ppm
FROM k
"""


def customer_ltv_by_tenure(sf_dir: str):
    """Cohort LTV curve — revenue by customer TENURE month (months since
    the customer's first order): the curve marketing payback models read
    off.  Per-customer sequencing runs in co-partitioned groups (first
    month is a group-local min — no groupby-output join); the global fold
    is a tiny tenure-keyed groupby in exact cents."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    _empty = pa.table(
        {
            "tenure_m": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
    )

    def per_cust(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        ymi = (
            pc.multiply(pc.year(g["o_orderdate"]).cast(pa.int64()), 12)
            .to_numpy(zero_copy_only=False)
            + pc.month(g["o_orderdate"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        ten = ymi - ymi.min()
        cents = np.floor(
            g["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return (
            pa.table(
                {
                    "tenure_m": pa.array(ten, pa.int64()),
                    "n": pa.array(np.ones(len(ten), np.int64)),
                    "cents": pa.array(cents, pa.int64()),
                }
            )
            .group_by("tenure_m")
            .aggregate([("n", "sum"), ("cents", "sum")])
            .rename_columns(["tenure_m", "n", "cents"])
        )

    g = (
        ds.groupby("o_custkey")
        .map_groups(per_cust, batch_format="pyarrow")
        .groupby("tenure_m")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("cents", alias_name="revenue_cents"))
        .to_pandas()
        .sort_values("tenure_m", kind="mergesort")
    )
    return pa.table(
        {
            "tenure_m": pa.array(g["tenure_m"].to_numpy().astype(np.int64), pa.int64()),
            "n_orders": pa.array(g["n_orders"].to_numpy().astype(np.int64), pa.int64()),
            "revenue_cents": pa.array(
                g["revenue_cents"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


CUSTOMER_LTV_BY_TENURE_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS ymi,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), t AS (
  SELECT ymi - MIN(ymi) OVER (PARTITION BY o_custkey) AS tenure_m, cents
  FROM o
)
SELECT CAST(tenure_m AS BIGINT) AS tenure_m,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM t GROUP BY tenure_m ORDER BY tenure_m
"""


def orders_monthly_theil_sen_slope(sf_dir: str):
    """Theil-Sen trend estimator over monthly revenue — the median of all
    pairwise slopes, robust to outlier months.  Exactness discipline: the
    median element is selected under the DETERMINISTIC total order
    (q, dy, dx) where q is the sign-abs truncated ppm slope (identical
    integer expression both sides), so no float ever orders the
    selection; the chosen pair's exact (dy, dx) is reported alongside.
    Monthly totals are the usual block partials; the O(M²)≈3.5k pair fold
    runs on the driver / in one SQL self-join."""
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
    m = len(y)
    i, j = np.triu_indices(m, k=1)
    dy = y[j] - y[i]
    dx = (j - i).astype(np.int64)
    q = np.where(dy >= 0, dy * 1_000_000 // dx, -((-dy) * 1_000_000 // dx))
    order = np.lexsort((dx, dy, q))
    mid = order[(len(order) - 1) // 2]
    return pa.table(
        {
            "n_pairs": pa.array([len(q)], pa.int64()),
            "slope_ppm_per_month": pa.array([int(q[mid])], pa.int64()),
            "med_dy_cents": pa.array([int(dy[mid])], pa.int64()),
            "med_dx_months": pa.array([int(dx[mid])], pa.int64()),
        }
    )


ORDERS_MONTHLY_THEIL_SEN_SLOPE_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS y
  FROM orders GROUP BY ym
), idx AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY ym) AS i FROM m
), p AS (
  SELECT b.y - a.y AS dy, CAST(b.i - a.i AS BIGINT) AS dx,
         CASE WHEN b.y - a.y >= 0
              THEN (b.y - a.y) * 1000000 // (b.i - a.i)
              ELSE -((a.y - b.y) * 1000000 // (b.i - a.i))
         END AS q
  FROM idx a JOIN idx b ON a.i < b.i
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM p),
sel AS (
  SELECT q, dy, dx FROM p ORDER BY q, dy, dx
  LIMIT 1 OFFSET (SELECT (n_pairs - 1) // 2 FROM tot)
)
SELECT n_pairs, CAST(q AS BIGINT) AS slope_ppm_per_month,
       dy AS med_dy_cents, dx AS med_dx_months
FROM tot, sel
"""


def docs_source_weighted_jaccard_matrix(sf_dir: str):
    """Weighted (multiset) Jaccard between every pair of source
    term-frequency profiles — Σₜ min(f₁,f₂) / Σₜ max(f₁,f₂), the
    duplication-aware counterpart of the set-Jaccard vocab overlaps
    already in the registry.  The max side never needs an outer join:
    Σmax = tot₁ + tot₂ − Σmin.  One distributed (source, term) count
    partial; the 20×20 pair fold is driver-tiny.  Exact integer ppm."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        src = t["source"].combine_chunks().take(pa.array(parent[keep]))
        return (
            pa.table({"source": src, "term": flat.filter(pa.array(keep))})
            .group_by(["source", "term"])
            .aggregate([("term", "count")])
            .rename_columns(["source", "term", "n"])
        )

    g = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    prof: dict = {}
    for s, t_, n in zip(g["source"], g["term"], g["n"].astype(int)):
        prof.setdefault(str(s), {})[str(t_)] = int(n)
    tots = {s: sum(d.values()) for s, d in prof.items()}
    srcs = sorted(prof)
    rows = []
    for a_ix in range(len(srcs)):
        for b_ix in range(a_ix + 1, len(srcs)):
            sa, sb = srcs[a_ix], srcs[b_ix]
            da, db = prof[sa], prof[sb]
            smin = sum(min(c, db[t_]) for t_, c in da.items() if t_ in db)
            smax = tots[sa] + tots[sb] - smin
            rows.append((sa, sb, smin * 1_000_000 // smax if smax else 0))
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "wj_ppm": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


DOCS_SOURCE_WEIGHTED_JACCARD_MATRIX_SQL = """
WITH f AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
  FROM documents
), c AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n
  FROM f GROUP BY source, term
), tot AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY source
), mins AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(SUM(LEAST(a.n, b.n)) AS BIGINT) AS smin
  FROM c a JOIN c b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT ta.source AS source_a, tb.source AS source_b,
       CAST(COALESCE(m.smin, 0) * 1000000
            // (ta.t + tb.t - COALESCE(m.smin, 0)) AS BIGINT) AS wj_ppm
FROM tot ta JOIN tot tb ON ta.source < tb.source
LEFT JOIN mins m ON m.sa = ta.source AND m.sb = tb.source
ORDER BY source_a, source_b
"""


def events_retry_backoff_census(sf_dir: str):
    """Retry-backoff conformance census: for every (user, event-type)
    chain with ≥ 3 events, is the inter-attempt gap sequence
    non-decreasing (a well-behaved backoff) or not?  Per event type:
    chain count and the monotone share — the stream-health number a
    rate-limiter owner watches.  Co-partition by user; each group folds
    all its type-chains with sorted numpy diffs; exact integers."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    _empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_chains": pa.array([], pa.int64()),
            "n_monotone": pa.array([], pa.int64()),
        }
    )

    def per_user(g: pa.Table) -> pa.Table:
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
        types = s["event_type"].to_pylist()
        ts = s["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        out: dict = {}
        i = 0
        n = len(types)
        while i < n:
            j = i
            while j < n and types[j] == types[i]:
                j += 1
            if j - i >= 3:
                gaps = np.diff(ts[i:j])
                mono = int(bool(np.all(np.diff(gaps) >= 0)))
                c = out.setdefault(types[i], [0, 0])
                c[0] += 1
                c[1] += mono
            i = j
        if not out:
            return _empty
        ks = sorted(out)
        return pa.table(
            {
                "event_type": pa.array(ks, pa.string()),
                "n_chains": pa.array([out[k][0] for k in ks], pa.int64()),
                "n_monotone": pa.array([out[k][1] for k in ks], pa.int64()),
            }
        )

    g = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_chains", alias_name="n_chains"),
            Sum("n_monotone", alias_name="n_monotone"),
        )
        .to_pandas()
        .sort_values("event_type", kind="mergesort")
    )
    return pa.table(
        {
            "event_type": pa.array([str(x) for x in g["event_type"]], pa.string()),
            "n_chains": pa.array(g["n_chains"].to_numpy().astype(np.int64), pa.int64()),
            "n_monotone": pa.array(
                g["n_monotone"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


EVENTS_RETRY_BACKOFF_CENSUS_SQL = """
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER w AS pt
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
), gaps AS (
  SELECT user_id, event_type, t - pt AS gp,
         lag(t - pt) OVER (PARTITION BY user_id, event_type
                           ORDER BY t, event_id) AS pg
  FROM e WHERE pt IS NOT NULL
), ch AS (
  SELECT user_id, event_type,
         COUNT(*) AS n_gaps,
         CAST(SUM(CASE WHEN pg IS NOT NULL AND gp < pg THEN 1 ELSE 0 END)
              AS BIGINT) AS n_decreases
  FROM gaps GROUP BY user_id, event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(SUM(CASE WHEN n_decreases = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_monotone
FROM ch WHERE n_gaps >= 2
GROUP BY event_type ORDER BY event_type
"""


def lineitem_abc_xyz_matrix(sf_dir: str):
    """The joint ABC×XYZ inventory-planning matrix — the 12-cell grid a
    supply planner actually works from, composing the registry's two
    per-part classifications: ABC by cumulative revenue share (A ≤ 80 %,
    B ≤ 95 %) and XYZ by demand-variability cv bands (X < 0.095,
    Y < 0.11, N for single-observation parts).  ABC reuses the
    distributed two-phase scan pipeline verbatim
    (`lineitem_abc_classification`); the XYZ leg folds per-part exact
    (n, Σx, Σx²); the join and census are part-bounded driver work."""
    import math

    from ._q03_events_docs2 import lineitem_abc_classification

    abc_t = pa.concat_tables(
        list(
            lineitem_abc_classification(sf_dir)
            .select_columns(["l_partkey", "abc_class"])
            .iter_batches(batch_format="pyarrow")
        )
    )
    abc = dict(
        zip(abc_t["l_partkey"].to_pylist(), abc_t["abc_class"].to_pylist())
    )

    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        q = pc.cast(t.column("l_quantity"), pa.int64()).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(pk, return_inverse=True)
        n = np.zeros(len(uk), np.int64)
        sx = np.zeros(len(uk), np.int64)
        sxx = np.zeros(len(uk), np.int64)
        np.add.at(n, inv, 1)
        np.add.at(sx, inv, q)
        np.add.at(sxx, inv, q * q)
        return pa.table(
            {
                "pk": pa.array(uk, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "sx": pa.array(sx, pa.int64()),
                "sxx": pa.array(sxx, pa.int64()),
            }
        )

    m = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
    )
    from collections import Counter

    cnt: Counter = Counter()
    for pk, n, sx, sxx in zip(
        m["pk"].astype(int), m["n"].astype(int), m["sx"].astype(int), m["sxx"].astype(int)
    ):
        if n < 2 or sx == 0:
            xyz = "N"
        else:
            cv_u = math.floor(
                1_000_000.0
                * math.sqrt(float(n * sxx - sx * sx))
                / (math.sqrt(float(n)) * float(sx))
            )
            xyz = "X" if cv_u < 95_000 else ("Y" if cv_u < 110_000 else "Z")
        cnt[(abc[pk], xyz)] += 1
    ks = sorted(cnt)
    return pa.table(
        {
            "abc_class": pa.array([k[0] for k in ks], pa.string()),
            "xyz_class": pa.array([k[1] for k in ks], pa.string()),
            "n_parts": pa.array([cnt[k] for k in ks], pa.int64()),
        }
    )


LINEITEM_ABC_XYZ_MATRIX_SQL = """
WITH r AS (
  SELECT l_partkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS sxx
  FROM lineitem GROUP BY 1
), c AS (
  SELECT l_partkey, n, sx, sxx,
         SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(rev_cents) OVER () AS total
  FROM r
), cls AS (
  SELECT CASE WHEN cum * 10 <= 8 * total THEN 'A'
              WHEN cum * 100 <= 95 * total THEN 'B'
              ELSE 'C' END AS abc_class,
         CASE
           WHEN n < 2 OR sx = 0 THEN 'N'
           WHEN FLOOR(1000000.0 * sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      / (sqrt(CAST(n AS DOUBLE)) * CAST(sx AS DOUBLE)))
                < 95000 THEN 'X'
           WHEN FLOOR(1000000.0 * sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      / (sqrt(CAST(n AS DOUBLE)) * CAST(sx AS DOUBLE)))
                < 110000 THEN 'Y'
           ELSE 'Z'
         END AS xyz_class
  FROM c
)
SELECT abc_class, xyz_class, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM cls GROUP BY abc_class, xyz_class ORDER BY abc_class, xyz_class
"""
