"""Query-registry family module 4/9 (dominant family: events_docs3; split from the monolithic queries.py)."""

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
from ._q01_events_orders import register_csv_normalize
from ._q02_events_docs import embeddings_label_centroids



EVENTS_USER_CHURN_HALVES_SQL = """
WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events),
u AS (
  SELECT user_id,
         MAX(CASE WHEN epoch_us(ts) <= mid THEN 1 ELSE 0 END) AS h1,
         MAX(CASE WHEN epoch_us(ts) > mid THEN 1 ELSE 0 END) AS h2
  FROM events, b GROUP BY 1)
SELECT CAST(SUM(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS retained,
       CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS churned,
       CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users
FROM u
"""


def embeddings_centroid_distances(sf_dir: str):
    """Pairwise label-centroid separation — the cluster-quality matrix: for
    every label pair, the exact squared distance between µ-unit fixed-point
    centroids, computed as the RATIONAL Σ((sa·nb − sb·na)² // (na²·nb²))
    with arbitrary-precision Python ints on the O(labels·dim) driver table
    (the oracle uses HUGEINT for the same 10²⁴-scale numerators).  The
    distributed part is the embeddings_label_centroids partial-sum kernel;
    no float centroid ever exists."""
    cells = embeddings_label_centroids(sf_dir).to_pandas()
    labels = sorted(cells.label.unique())
    by_label: dict[int, tuple[list[int], int]] = {}
    for lab in labels:
        sub = cells[cells.label == lab].sort_values("dim")
        by_label[int(lab)] = (
            [int(v) for v in sub.sum_uv.tolist()],
            int(sub.n.iloc[0]),
        )
    la, lb, d2 = [], [], []
    for i, a in enumerate(labels):
        sa, na = by_label[int(a)]
        for b in labels[i + 1 :]:
            sb, nb = by_label[int(b)]
            acc = 0
            for va, vb in zip(sa, sb):
                num = va * nb - vb * na
                acc += (num * num) // (na * na * nb * nb)
            la.append(int(a))
            lb.append(int(b))
            d2.append(acc)
    return pa.table(
        {
            "label_a": pa.array(la, pa.int64()),
            "label_b": pa.array(lb, pa.int64()),
            "d2_mu2": pa.array(d2, pa.int64()),
        }
    )


EMBEDDINGS_CENTROID_DISTANCES_SQL = """
WITH e AS (
  SELECT label, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings),
c AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
         CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_uv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(SUM((CAST(a.sum_uv AS HUGEINT) * b.n - CAST(b.sum_uv AS HUGEINT) * a.n)
                * (CAST(a.sum_uv AS HUGEINT) * b.n - CAST(b.sum_uv AS HUGEINT) * a.n)
                // (CAST(a.n AS HUGEINT) * a.n * b.n * b.n)) AS BIGINT) AS d2_mu2
FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_charclass_profile(sf_dir: str):
    """Corpus character-class census — the encoding-health screen (a corpus
    suddenly heavy in 'other' bytes signals mojibake upstream): letters,
    digits, plain spaces and everything-else counted across all documents.
    Single-char regex classes make count_substring_regex a per-char counter;
    block partials reduce to four scalars."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = t["text"]
        letters = int(pc.sum(pc.count_substring_regex(txt, "[A-Za-z]")).as_py() or 0)
        digits = int(pc.sum(pc.count_substring_regex(txt, "[0-9]")).as_py() or 0)
        spaces = int(pc.sum(pc.count_substring_regex(txt, "[ ]")).as_py() or 0)
        total = int(pc.sum(pc.utf8_length(txt)).as_py() or 0)
        return pa.table(
            {
                "letters": pa.array([letters], pa.int64()),
                "digits": pa.array([digits], pa.int64()),
                "spaces": pa.array([spaces], pa.int64()),
                "other": pa.array([total - letters - digits - spaces], pa.int64()),
            }
        )

    s = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("letters", alias_name="letters"),
        Sum("digits", alias_name="digits"),
        Sum("spaces", alias_name="spaces"),
        Sum("other", alias_name="other"),
    )
    return pa.table(
        {
            "letters": pa.array([int(s["letters"])], pa.int64()),
            "digits": pa.array([int(s["digits"])], pa.int64()),
            "spaces": pa.array([int(s["spaces"])], pa.int64()),
            "other": pa.array([int(s["other"])], pa.int64()),
        }
    )


DOCS_CHARCLASS_PROFILE_SQL = """
SELECT
  CAST(SUM(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))) AS BIGINT)
    AS letters,
  CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g'))) AS BIGINT)
    AS digits,
  CAST(SUM(length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS spaces,
  CAST(SUM(length(text)
           - length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
           - length(regexp_replace(text, '[^0-9]', '', 'g'))
           - (length(text) - length(replace(text, ' ', '')))) AS BIGINT) AS other
FROM documents
"""


def docs_bigram_lift(sf_dir: str):
    """Collocation mining — bigram LIFT (observed adjacency over the
    independence expectation): c_ab·N_u²·10⁶ // (c_a·c_b·N_b), exact via
    arbitrary-precision ints on the O(vocab²)-bounded driver fold (HUGEINT
    on the SQL side — the 10¹⁷-scale numerator is why).  Bigram and unigram
    counts are two block-partial groupbys; support floor 20, top-20 by
    (lift desc, bigram)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        words = flat.filter(pa.array(keep))
        par = parent[keep]
        w = words.to_pylist()
        uni = pa.table({"g": words, "kind": pa.array([0] * len(w), pa.int64())})
        same = par[:-1] == par[1:] if len(par) > 1 else np.array([], bool)
        bi = [f"{w[i]} {w[i+1]}" for i in np.flatnonzero(same)]
        big = pa.table(
            {"g": pa.array(bi, pa.string()), "kind": pa.array([1] * len(bi), pa.int64())}
        )
        both = pa.concat_tables([uni, big])
        return (
            both.group_by(["g", "kind"])
            .aggregate([("g", "count")])
            .rename_columns(["g", "kind", "n"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "kind"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    uni = dict(zip(g[g.kind == 0].g, g[g.kind == 0].n.astype(int)))
    bi = g[g.kind == 1]
    n_u = sum(uni.values())
    n_b = int(bi.n.sum())
    rows = []
    for gram, c_ab in zip(bi.g, bi.n.astype(int)):
        if c_ab < 20:
            continue
        a, b = gram.split(" ", 1)
        lift = c_ab * n_u * n_u * 1_000_000 // (uni[a] * uni[b] * n_b)
        rows.append((gram, c_ab, lift))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:20]
    return pa.table(
        {
            "bigram": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "lift_ppm": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


DOCS_BIGRAM_LIFT_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
f AS (
  SELECT doc_id, unnest(l) AS term,
         CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM d),
u AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY 1),
nu AS (SELECT SUM(c) AS n_u FROM u),
w AS (
  SELECT doc_id, term AS a,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM f),
bg AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM w
       WHERE b IS NOT NULL GROUP BY 1, 2),
nb AS (SELECT SUM(c_ab) AS n_b FROM bg)
SELECT bg.a || ' ' || bg.b AS bigram, c_ab AS n,
       CAST(CAST(c_ab AS HUGEINT) * n_u * n_u * 1000000
            // (CAST(ua.c AS HUGEINT) * ub.c * n_b) AS BIGINT) AS lift_ppm
FROM bg JOIN u ua ON bg.a = ua.term
        JOIN u ub ON bg.b = ub.term, nu, nb
WHERE c_ab >= 20
ORDER BY lift_ppm DESC, bigram LIMIT 20
"""


def events_pattern_ccp(sf_dir: str):
    """Complex-event pattern matching (MATCH_RECOGNIZE-lite): count, per
    user, the CONSECUTIVE click→click→purchase triples in (ts, event_id)
    order — the sequence-motif primitive behind conversion-path analytics.
    The kernel is two shifted boolean masks on the per-user sorted type
    codes (no row loop); users with zero matches are absent by
    construction, mirroring the oracle's HAVING."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    _empty = pa.table(
        {"user_id": pa.array([], pa.int64()), "n_matches": pa.array([], pa.int64())}
    )

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows < 3:
            return _empty
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        is_c = pc.equal(s["event_type"], "click").to_numpy(zero_copy_only=False)
        is_p = pc.equal(s["event_type"], "purchase").to_numpy(zero_copy_only=False)
        hits = int((is_c[:-2] & is_c[1:-1] & is_p[2:]).sum())
        if not hits:
            return _empty
        return pa.table(
            {
                "user_id": pa.array([int(s["user_id"][0].as_py())], pa.int64()),
                "n_matches": pa.array([hits], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow").sort(
        ["user_id"]
    )


EVENTS_PATTERN_CCP_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS t1,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS t2
  FROM events)
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' AND t1 = 'click'
                      AND t2 = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matches
FROM s GROUP BY 1
HAVING SUM(CASE WHEN event_type = 'click' AND t1 = 'click'
                 AND t2 = 'purchase' THEN 1 ELSE 0 END) > 0
ORDER BY 1
"""


def orders_sla_attainment(sf_dir: str):
    """Fulfillment SLA attainment by order month: an order is on-time when
    its FIRST shipment leaves within 30 days.  Lineitem pre-aggregates to
    per-order MIN ship-day BEFORE the 8-partition join (the shuffle carries
    one row per order, not per line); month cells and the ppm attainment
    rate are exact integers."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "ship_day": pa.array(
                        t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                        // 86_400_000_000,
                        pa.int64(),
                    ),
                }
            )
            .group_by("l_orderkey")
            .aggregate([("ship_day", "min")])
            .rename_columns(["l_orderkey", "first_ship_day"])
        )

    per_order = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Min("first_ship_day", alias_name="first_ship_day"))
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    joined = per_order.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def cells(t: pa.Table) -> pa.Table:
        od_us = t["o_orderdate"].cast(pa.int64())
        od = od_us.to_numpy(zero_copy_only=False) // 86_400_000_000
        fs = t["first_ship_day"].combine_chunks().to_numpy(zero_copy_only=False)
        yr = pc.year(t["o_orderdate"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        mo = pc.month(t["o_orderdate"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "ym": pa.array(yr * 100 + mo, pa.int64()),
                    "n": pa.array(np.ones(len(od), np.int64)),
                    "on_time": pa.array((fs - od <= 30).astype(np.int64), pa.int64()),
                }
            )
            .group_by("ym")
            .aggregate([("n", "sum"), ("on_time", "sum")])
            .rename_columns(["ym", "n", "on_time"])
        )

    g = (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("on_time", alias_name="n_on_time"))
        .to_pandas()
        .sort_values("ym", kind="mergesort")
    )
    n = g["n_orders"].to_numpy().astype(np.int64)
    ot = g["n_on_time"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "ym": pa.array(g["ym"].to_numpy().astype(np.int64)),
            "n_orders": pa.array(n, pa.int64()),
            "n_on_time": pa.array(ot, pa.int64()),
            "attainment_ppm": pa.array(ot * 1_000_000 // n, pa.int64()),
        }
    )


ORDERS_SLA_ATTAINMENT_SQL = """
WITH fo AS (
  SELECT l_orderkey,
         MIN(epoch_us(l_shipdate) // 86400000000) AS first_ship_day
  FROM lineitem GROUP BY 1),
j AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
         CASE WHEN first_ship_day - epoch_us(o_orderdate) // 86400000000 <= 30
              THEN 1 ELSE 0 END AS on_time
  FROM fo JOIN orders ON l_orderkey = o_orderkey)
SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(on_time) AS BIGINT) AS n_on_time,
       CAST(SUM(on_time) * 1000000 // COUNT(*) AS BIGINT) AS attainment_ppm
FROM j GROUP BY 1 ORDER BY 1
"""


def supplier_scorecard(sf_dir: str):
    """Composed supplier scorecard — the multi-metric entity report: per
    supplier, lineitem count, exact revenue cents, return-rate ppm, and the
    dense revenue rank (ties share a rank).  One fact pass builds all three
    partial metrics; the rank folds on the O(suppliers) driver table
    (suppliers are dim-scaled here; rank.global_value_rank is the documented
    path when they aren't)."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])))
        tb = pa.table(
            {
                "s_suppkey": t["l_suppkey"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "rev": rev,
                "ret": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64()),
            }
        )
        return tb.group_by("s_suppkey").aggregate(
            [("n", "sum"), ("rev", "sum"), ("ret", "sum")]
        ).rename_columns(["s_suppkey", "n", "rev", "ret"])

    g = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(
            Sum("n", alias_name="n_items"),
            Sum("rev", alias_name="rev_cents"),
            Sum("ret", alias_name="n_returned"),
        )
        .to_pandas()
        .sort_values("s_suppkey", kind="mergesort")
    )
    n = g["n_items"].to_numpy().astype(np.int64)
    rev = g["rev_cents"].to_numpy().astype(np.int64)
    ret = g["n_returned"].to_numpy().astype(np.int64)
    # dense rank by revenue desc: rank = 1 + number of DISTINCT revenues above
    uniq = np.unique(rev)[::-1]
    dense = np.searchsorted(-uniq, -rev) + 1
    return pa.table(
        {
            "s_suppkey": pa.array(g["s_suppkey"].to_numpy().astype(np.int64)),
            "n_items": pa.array(n, pa.int64()),
            "rev_cents": pa.array(rev, pa.int64()),
            "return_ppm": pa.array(ret * 1_000_000 // n, pa.int64()),
            "rev_dense_rank": pa.array(dense, pa.int64()),
        }
    )


SUPPLIER_SCORECARD_SQL = """
WITH g AS (
  SELECT l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned
  FROM lineitem GROUP BY 1)
SELECT s_suppkey, n_items, rev_cents,
       CAST(n_returned * 1000000 // n_items AS BIGINT) AS return_ppm,
       CAST(DENSE_RANK() OVER (ORDER BY rev_cents DESC) AS BIGINT)
         AS rev_dense_rank
FROM g ORDER BY s_suppkey
"""


def events_type_value_quartiles(sf_dir: str):
    """Per-type value quartiles (p25/p50/p75) — the distribution card every
    metrics dashboard shows.  Groups sort locally; the index convention is
    DuckDB's quantile_disc = sorted[ceil(q·n) − 1] (verified empirically
    across n=3..10 and all three quarters; q·n is exact in binary for
    quarter fractions, so the ceil never wobbles)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])

    def kernel(g: pa.Table) -> pa.Table:
        c = np.sort(_cents(g["value"]).to_numpy(zero_copy_only=False))
        n = len(c)

        def disc(q: float) -> int:
            # DuckDB quantile_disc: element at ceil(q*n) - 1 (1-based rank)
            import math

            ix = max(int(math.ceil(q * n)) - 1, 0)
            return int(c[ix])

        return pa.table(
            {
                "event_type": pa.array(
                    [str(g["event_type"][0].as_py())], pa.string()
                ),
                "n": pa.array([n], pa.int64()),
                "p25_cents": pa.array([disc(0.25)], pa.int64()),
                "p50_cents": pa.array([disc(0.5)], pa.int64()),
                "p75_cents": pa.array([disc(0.75)], pa.int64()),
            }
        )

    return (
        ds.groupby("event_type")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["event_type"])
    )


EVENTS_TYPE_VALUE_QUARTILES_SQL = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(quantile_disc(cents, 0.25) AS BIGINT) AS p25_cents,
       CAST(quantile_disc(cents, 0.50) AS BIGINT) AS p50_cents,
       CAST(quantile_disc(cents, 0.75) AS BIGINT) AS p75_cents
FROM c GROUP BY 1 ORDER BY 1
"""


def orders_single_day_ship_share(sf_dir: str):
    """All-equal aggregate gate (the MIN=MAX idiom): share of orders whose
    EVERY lineitem shipped on one calendar day, by order year.  Lineitem
    reduces to per-order (min, max) ship-day partials — two keyed extrema,
    no per-order lists; the gate is an integer equality and the share an
    exact ppm."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        day = pa.array(
            t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000,
            pa.int64(),
        )
        tb = pa.table({"l_orderkey": t["l_orderkey"], "d1": day, "d2": day})
        return tb.group_by("l_orderkey").aggregate(
            [("d1", "min"), ("d2", "max")]
        ).rename_columns(["l_orderkey", "dmin", "dmax"])

    per_order = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Min("dmin", alias_name="dmin"), Max("dmax", alias_name="dmax"))
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    joined = per_order.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def cells(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"]).cast(pa.int64())
        single = pc.cast(pc.equal(t["dmin"], t["dmax"]), pa.int64())
        return (
            pa.table(
                {
                    "yr": yr,
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "single": single,
                }
            )
            .group_by("yr")
            .aggregate([("n", "sum"), ("single", "sum")])
            .rename_columns(["yr", "n", "single"])
        )

    g = (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("single", alias_name="n_single"))
        .to_pandas()
        .sort_values("yr", kind="mergesort")
    )
    n = g["n_orders"].to_numpy().astype(np.int64)
    sd = g["n_single"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "yr": pa.array(g["yr"].to_numpy().astype(np.int64)),
            "n_orders": pa.array(n, pa.int64()),
            "n_single_day": pa.array(sd, pa.int64()),
            "share_ppm": pa.array(sd * 1_000_000 // n, pa.int64()),
        }
    )


ORDERS_SINGLE_DAY_SHIP_SHARE_SQL = """
WITH po AS (
  SELECT l_orderkey,
         MIN(epoch_us(l_shipdate) // 86400000000) AS dmin,
         MAX(epoch_us(l_shipdate) // 86400000000) AS dmax
  FROM lineitem GROUP BY 1),
j AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CASE WHEN dmin = dmax THEN 1 ELSE 0 END AS single
  FROM po JOIN orders ON l_orderkey = o_orderkey)
SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(single) AS BIGINT) AS n_single_day,
       CAST(SUM(single) * 1000000 // COUNT(*) AS BIGINT) AS share_ppm
FROM j GROUP BY 1 ORDER BY 1
"""


def events_top_sessions(sf_dir: str):
    """Composition showcase — sessionize (30-min gap) → per-session value
    sum → global top-10 by value: the 'best sessions' report every product
    team asks for, built from the same per-user sorted kernel as
    events_sessionize with a value cumsum-by-boundary reduceat.  Tie order
    (value desc, user, session) makes the limit boundary deterministic."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])
    gap_us = 30 * 60 * 1_000_000

    def kernel(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        cents = _cents(g["value"]).to_numpy(zero_copy_only=False)[order]
        brk = np.r_[True, np.diff(ts) > gap_us]
        starts = np.nonzero(brk)[0]
        sums = np.add.reduceat(cents, starts)
        ends = np.r_[starts[1:], len(ts)]
        n = len(starts)
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(n, int(g["user_id"][0].as_py())), pa.int64()
                ),
                "session_idx": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "session_cents": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["session_cents", "user_id", "session_idx"], descending=[True, False, False])
        .limit(10)
    )


EVENTS_TOP_SESSIONS_SQL = """
WITH x AS (
  SELECT user_id, ts, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
y AS (
  SELECT user_id, cents,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM x)
SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS session_cents
FROM y GROUP BY 1, 2
ORDER BY session_cents DESC, user_id, session_idx LIMIT 10
"""


def lineitem_simpson_check(sf_dir: str):
    """Simpson's-paradox audit: does the bulk-vs-small return-rate gap
    (quantity > 25 as the predictor, returnflag = 'R' as the outcome) flip
    sign between the aggregate and any linestatus stratum?  Each stratum
    reduces to FOUR integers; the rate comparison is the integer
    cross-multiply sign(ret_b·n_s − ret_s·n_b), so no rate ever exists as
    a float; the reversal flag compares each stratum's sign to 'ALL'."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_linestatus", "l_quantity", "l_returnflag"]
    )

    def partial(t: pa.Table) -> pa.Table:
        bulk = pc.cast(pc.greater(t["l_quantity"], 25.0), pa.int64())
        ret = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        tb = pa.table(
            {
                "stratum": t["l_linestatus"],
                "n_bulk": bulk,
                "ret_bulk": pc.multiply(bulk, ret),
                "n_small": pc.subtract(1, bulk),
                "ret_small": pc.multiply(pc.subtract(1, bulk), ret),
            }
        )
        return tb.group_by("stratum").aggregate(
            [("n_bulk", "sum"), ("ret_bulk", "sum"), ("n_small", "sum"), ("ret_small", "sum")]
        ).rename_columns(["stratum", "n_bulk", "ret_bulk", "n_small", "ret_small"])

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("stratum")
        .aggregate(
            Sum("n_bulk", alias_name="n_bulk"),
            Sum("ret_bulk", alias_name="ret_bulk"),
            Sum("n_small", alias_name="n_small"),
            Sum("ret_small", alias_name="ret_small"),
        )
        .to_pandas()
        .sort_values("stratum", kind="mergesort")
    )
    nb = g["n_bulk"].to_numpy().astype(np.int64)
    rb = g["ret_bulk"].to_numpy().astype(np.int64)
    ns = g["n_small"].to_numpy().astype(np.int64)
    rs = g["ret_small"].to_numpy().astype(np.int64)
    all_sign = int(np.sign(int(rb.sum()) * int(ns.sum()) - int(rs.sum()) * int(nb.sum())))
    strata = ["ALL"] + g["stratum"].tolist()
    nb_o = np.concatenate([[nb.sum()], nb])
    rb_o = np.concatenate([[rb.sum()], rb])
    ns_o = np.concatenate([[ns.sum()], ns])
    rs_o = np.concatenate([[rs.sum()], rs])
    signs = np.sign(rb_o * ns_o - rs_o * nb_o).astype(np.int64)
    return pa.table(
        {
            "stratum": pa.array(strata, pa.string()),
            "n_bulk": pa.array(nb_o.astype(np.int64), pa.int64()),
            "ret_bulk": pa.array(rb_o.astype(np.int64), pa.int64()),
            "n_small": pa.array(ns_o.astype(np.int64), pa.int64()),
            "ret_small": pa.array(rs_o.astype(np.int64), pa.int64()),
            "gap_sign": pa.array(signs, pa.int64()),
            "simpson_reversal": pa.array(
                [bool(s != all_sign and s != 0 and all_sign != 0) for s in signs]
            ),
        }
    )


LINEITEM_SIMPSON_CHECK_SQL = """
WITH c AS (
  SELECT l_linestatus AS stratum,
         CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS bulk,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem),
s AS (
  SELECT stratum,
         CAST(SUM(bulk) AS BIGINT) AS n_bulk,
         CAST(SUM(bulk * ret) AS BIGINT) AS ret_bulk,
         CAST(SUM(1 - bulk) AS BIGINT) AS n_small,
         CAST(SUM((1 - bulk) * ret) AS BIGINT) AS ret_small
  FROM c GROUP BY 1),
a AS (
  SELECT 'ALL' AS stratum, SUM(n_bulk) AS n_bulk, SUM(ret_bulk) AS ret_bulk,
         SUM(n_small) AS n_small, SUM(ret_small) AS ret_small
  FROM s),
u AS (SELECT * FROM a UNION ALL SELECT * FROM s),
g AS (
  SELECT stratum, n_bulk, ret_bulk, n_small, ret_small,
         CAST(sign(ret_bulk * n_small - ret_small * n_bulk) AS BIGINT)
           AS gap_sign
  FROM u),
asn AS (SELECT gap_sign AS all_sign FROM g WHERE stratum = 'ALL')
SELECT stratum, CAST(n_bulk AS BIGINT) AS n_bulk,
       CAST(ret_bulk AS BIGINT) AS ret_bulk,
       CAST(n_small AS BIGINT) AS n_small,
       CAST(ret_small AS BIGINT) AS ret_small, gap_sign,
       gap_sign <> all_sign AND gap_sign <> 0 AND all_sign <> 0
         AS simpson_reversal
FROM g, asn ORDER BY stratum
"""


def events_user_max_drawdown(sf_dir: str):
    """Peak-to-trough drawdown per user — the risk statistic: max over time
    of (running max of value − current value), on the (ts, event_id)-ordered
    cents series.  One np.maximum.accumulate per group; the oracle is the
    same identity as a running-MAX window minus the row.  Exact integers."""
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
        dd = int((np.maximum.accumulate(c) - c).max())
        return pa.table(
            {
                "user_id": pa.array([int(s["user_id"][0].as_py())], pa.int64()),
                "n_events": pa.array([len(c)], pa.int64()),
                "max_drawdown_cents": pa.array([dd], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow").sort(
        ["user_id"]
    )


EVENTS_USER_MAX_DRAWDOWN_SQL = """
WITH c AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT user_id,
         MAX(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - cents AS dd
  FROM c)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents
FROM r GROUP BY 1 ORDER BY 1
"""


def orders_interquartile_mean(sf_dir: str):
    """Robust central tendency — the interquartile (25–75 trimmed) mean per
    priority, reported as exact integers (count and sum of the mid values,
    mean in floor cents): keep values v with p25 ≤ v ≤ p75 under the
    quantile_disc sorted[ceil(q·n)−1] convention, so both engines trim the
    IDENTICAL multiset."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderpriority", "o_totalprice"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        import math

        c = np.sort(_cents(g["o_totalprice"]).to_numpy(zero_copy_only=False))
        n = len(c)
        p25 = int(c[max(int(math.ceil(0.25 * n)) - 1, 0)])
        p75 = int(c[max(int(math.ceil(0.75 * n)) - 1, 0)])
        mid = c[(c >= p25) & (c <= p75)]
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [str(g["o_orderpriority"][0].as_py())], pa.string()
                ),
                "n_mid": pa.array([len(mid)], pa.int64()),
                "sum_mid_cents": pa.array([int(mid.sum())], pa.int64()),
                "iq_mean_cents": pa.array([int(mid.sum()) // len(mid)], pa.int64()),
            }
        )

    return (
        ds.groupby("o_orderpriority")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["o_orderpriority"])
    )


ORDERS_INTERQUARTILE_MEAN_SQL = """
WITH c AS (
  SELECT o_orderpriority, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders),
q AS (SELECT o_orderpriority,
             CAST(quantile_disc(cents, 0.25) AS BIGINT) AS p25,
             CAST(quantile_disc(cents, 0.75) AS BIGINT) AS p75
      FROM c GROUP BY 1)
SELECT c.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_mid,
       CAST(SUM(cents) AS BIGINT) AS sum_mid_cents,
       CAST(SUM(cents) // COUNT(*) AS BIGINT) AS iq_mean_cents
FROM c JOIN q USING (o_orderpriority)
WHERE cents >= p25 AND cents <= p75
GROUP BY 1 ORDER BY 1
"""


def lineitem_discount_monotonicity(sf_dir: str):
    """Pricing-curve audit: mean quantity per discount level (0–10 %) and
    whether each level BREAKS the expected deeper-discount → more-quantity
    monotonicity vs the previous level — the comparison is the integer
    cross-multiply sum₍d₎·n₍d₋₁₎ > sum₍d₋₁₎·n₍d₎, so adjacent-mean ordering
    never touches a float.  O(11) cells from block partials."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_discount", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        lvl = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_discount"], 100.0), 0.5)), pa.int64()
        )
        q = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64())
        tb = pa.table(
            {"disc_pct": lvl, "n": pa.array(np.ones(t.num_rows, np.int64)), "q": q}
        )
        return tb.group_by("disc_pct").aggregate(
            [("n", "sum"), ("q", "sum")]
        ).rename_columns(["disc_pct", "n", "q"])

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("disc_pct")
        .aggregate(Sum("n", alias_name="n"), Sum("q", alias_name="sum_qty"))
        .to_pandas()
        .sort_values("disc_pct", kind="mergesort")
    )
    n = g["n"].to_numpy().astype(np.int64)
    sq = g["sum_qty"].to_numpy().astype(np.int64)
    dec = np.zeros(len(n), bool)
    dec[1:] = sq[1:] * n[:-1] < sq[:-1] * n[1:]
    return pa.table(
        {
            "disc_pct": pa.array(g["disc_pct"].to_numpy().astype(np.int64)),
            "n": pa.array(n, pa.int64()),
            "sum_qty": pa.array(sq, pa.int64()),
            "mean_qty_milli": pa.array(sq * 1000 // n, pa.int64()),
            "decreasing_vs_prev": pa.array(dec),
        }
    )


LINEITEM_DISCOUNT_MONOTONICITY_SQL = """
WITH c AS (
  SELECT CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) AS disc_pct,
         CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS q
  FROM lineitem),
g AS (SELECT disc_pct, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sum_qty
      FROM c GROUP BY 1),
w AS (
  SELECT disc_pct, n, sum_qty,
         lag(n) OVER (ORDER BY disc_pct) AS pn,
         lag(sum_qty) OVER (ORDER BY disc_pct) AS ps
  FROM g)
SELECT disc_pct, n, sum_qty,
       CAST(sum_qty * 1000 // n AS BIGINT) AS mean_qty_milli,
       COALESCE(sum_qty * pn < ps * n, FALSE) AS decreasing_vs_prev
FROM w ORDER BY disc_pct
"""


def events_type_cross_correlation(sf_dir: str):
    """Cross-type Pearson correlation matrix of hourly arrival series over
    the GLOBAL hour grid (zeros where a type is silent — the common-clock
    alignment cross-correlation requires): the co-movement screen behind
    metric-causality hunting.  Cells reduce to O(types·hours) block
    partials; all pair sums are exact int64 and r is ONE fixed IEEE
    expression per pair (the lag-24 autocorrelation discipline)."""
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

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["typ", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    lo, hi = int(cells.hour.min()), int(cells.hour.max())
    H = hi - lo + 1
    types = sorted(cells.typ.unique())
    series = {}
    for tname in types:
        sub = cells[cells.typ == tname]
        dense = np.zeros(H, np.int64)
        dense[sub.hour.to_numpy() - lo] = sub.n.to_numpy()
        series[tname] = dense
    import math

    ta, tb_, rs = [], [], []
    for i, a in enumerate(types):
        x = series[a]
        sx, sxx = int(x.sum()), int((x * x).sum())
        for b in types[i + 1 :]:
            y = series[b]
            sy, syy = int(y.sum()), int((y * y).sum())
            sxy = int((x * y).sum())
            vx, vy = H * sxx - sx * sx, H * syy - sy * sy
            if vx <= 0 or vy <= 0:
                continue
            r = float(H * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))
            ta.append(a)
            tb_.append(b)
            rs.append(r)
    return pa.table(
        {
            "type_a": pa.array(ta, pa.string()),
            "type_b": pa.array(tb_, pa.string()),
            "n_hours": pa.array([H] * len(rs), pa.int64()),
            "r": pa.array(rs, pa.float64()),
        }
    )


EVENTS_TYPE_CROSS_CORRELATION_SQL = """
WITH c AS (
  SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT MIN(hour) AS mn, MAX(hour) AS mx FROM c),
ty AS (SELECT DISTINCT event_type FROM c),
g AS (SELECT event_type, CAST(unnest(range(mn, mx + 1)) AS BIGINT) AS hour
      FROM ty, b),
f AS (SELECT g.event_type, g.hour, COALESCE(c.n, 0) AS n
      FROM g LEFT JOIN c USING (event_type, hour)),
p AS (
  SELECT a.event_type AS type_a, x.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS h,
         CAST(SUM(a.n) AS BIGINT) AS sx, CAST(SUM(x.n) AS BIGINT) AS sy,
         CAST(SUM(a.n * x.n) AS BIGINT) AS sxy,
         CAST(SUM(a.n * a.n) AS BIGINT) AS sxx,
         CAST(SUM(x.n * x.n) AS BIGINT) AS syy
  FROM f a JOIN f x ON a.hour = x.hour AND a.event_type < x.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, h AS n_hours,
       CAST(h*sxy - sx*sy AS DOUBLE)
         / sqrt(CAST(h*sxx - sx*sx AS DOUBLE) * CAST(h*syy - sy*sy AS DOUBLE))
         AS r
FROM p WHERE h*sxx - sx*sx > 0 AND h*syy - sy*sy > 0
ORDER BY type_a, type_b
"""


def events_transition_latency(sf_dir: str):
    """Transition TIMING (the transition-count matrix's missing half): for
    every adjacent type pair in each user's (ts, event_id) stream, the gap;
    reported per (from, to) as count and lower-median microseconds.  Pairs
    explode in per-user kernels (two shifted takes), then co-partition by
    the pair for the median — the shuffle carries (pair, gap) only."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    _empty = pa.table(
        {
            "from_type": pa.array([], pa.string()),
            "to_type": pa.array([], pa.string()),
            "gap_us": pa.array([], pa.int64()),
        }
    )

    def explode(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return _empty
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = s["event_type"].combine_chunks()
        n = len(ts)
        return pa.table(
            {
                "from_type": types.slice(0, n - 1),
                "to_type": types.slice(1, n - 1),
                "gap_us": pa.array(np.diff(ts), pa.int64()),
            }
        )

    pairs = ds.groupby("user_id").map_groups(explode, batch_format="pyarrow")

    def med(g: pa.Table) -> pa.Table:
        gaps = np.sort(g["gap_us"].combine_chunks().to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "from_type": pa.array([str(g["from_type"][0].as_py())], pa.string()),
                "to_type": pa.array([str(g["to_type"][0].as_py())], pa.string()),
                "n": pa.array([len(gaps)], pa.int64()),
                "median_gap_us": pa.array(
                    [int(gaps[(len(gaps) - 1) // 2])], pa.int64()
                ),
            }
        )

    return (
        pairs.groupby(["from_type", "to_type"])
        .map_groups(med, batch_format="pyarrow")
        .sort(["from_type", "to_type"])
    )


EVENTS_TRANSITION_LATENCY_SQL = """
WITH s AS (
  SELECT user_id, event_type AS from_type, epoch_us(ts) AS t,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nt
  FROM events)
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(quantile_disc(nt - t, 0.5) AS BIGINT) AS median_gap_us
FROM s WHERE to_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_new_vs_returning_dau(sf_dir: str):
    """New-vs-returning daily actives — the growth-accounting curve: per
    day, how many active users saw their FIRST-ever activity that day vs
    returned.  Distinct (user, day) pairs and per-user first days are two
    keyed reductions; the day cells fold exactly in integers."""
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
        .materialize()
    )
    firsts = (
        pd_pairs.groupby("user_id")
        .aggregate(Min("day", alias_name="first_day"))
        .to_pandas()
    )
    first_map = dict(zip(firsts.user_id.astype(int), firsts.first_day.astype(int)))
    fref = ray.put(first_map)

    def cells(t: pa.Table) -> pa.Table:
        fm = ray.get(fref)
        uid = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        day = t["day"].combine_chunks().to_numpy(zero_copy_only=False)
        fd = np.array([fm[int(u)] for u in uid], np.int64)
        is_new = (day == fd).astype(np.int64)
        return (
            pa.table(
                {
                    "day": pa.array(day, pa.int64()),
                    "new_users": pa.array(is_new, pa.int64()),
                    "returning": pa.array(1 - is_new, pa.int64()),
                }
            )
            .group_by("day")
            .aggregate([("new_users", "sum"), ("returning", "sum")])
            .rename_columns(["day", "new_users", "returning"])
        )

    g = (
        pd_pairs.map_batches(cells, batch_format="pyarrow")
        .groupby("day")
        .aggregate(
            Sum("new_users", alias_name="new_users"),
            Sum("returning", alias_name="returning"),
        )
        .to_pandas()
        .sort_values("day", kind="mergesort")
    )
    return pa.table(
        {
            "day": pa.array(g["day"].to_numpy().astype(np.int64)),
            "new_users": pa.array(g["new_users"].to_numpy().astype(np.int64)),
            "returning": pa.array(g["returning"].to_numpy().astype(np.int64)),
        }
    )


EVENTS_NEW_VS_RETURNING_DAU_SQL = """
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
f AS (SELECT user_id, MIN(day) AS first_day FROM p GROUP BY 1)
SELECT CAST(day AS BIGINT) AS day,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(SUM(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning
FROM p JOIN f USING (user_id)
GROUP BY 1 ORDER BY 1
"""


def docs_source_tf_cosine(sf_dir: str):
    """Corpus-slice similarity — cosine between the term-frequency vectors
    of every source pair (the mixture-collapse check before blending data
    sources): per-(source, term) counts via block partials; the dot/norm
    sums are exact int64 over the O(vocab)-bounded vectors, and cosine =
    sxy / sqrt(sxx·syy) is ONE fixed IEEE expression per pair."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col)
        src = pc.take(t["source"], parent)
        tb = pa.table({"source": src, "term": flat}).filter(
            pc.and_(pc.is_valid(flat), pc.not_equal(flat, ""))
        )
        return tb.group_by(["source", "term"]).aggregate([("term", "count")]).rename_columns(
            ["source", "term", "n"]
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    sources = sorted(cells.source.unique())
    terms = sorted(cells.term.unique())
    tix = {t: i for i, t in enumerate(terms)}
    vecs = {}
    for s in sources:
        v = np.zeros(len(terms), np.int64)
        sub = cells[cells.source == s]
        v[[tix[t] for t in sub.term]] = sub.n.to_numpy()
        vecs[s] = v
    import math

    sa, sb, cos = [], [], []
    for i, a in enumerate(sources):
        x = vecs[a]
        sxx = int((x * x).sum())
        for b in sources[i + 1 :]:
            y = vecs[b]
            syy = int((y * y).sum())
            sxy = int((x * y).sum())
            # sxy == 0 ⟺ no shared term — the oracle's inner join drops
            # such pairs, so the engine does too
            if sxx == 0 or syy == 0 or sxy == 0:
                continue
            sa.append(a)
            sb.append(b)
            cos.append(float(sxy) / math.sqrt(float(sxx) * float(syy)))
    return pa.table(
        {
            "source_a": pa.array(sa, pa.string()),
            "source_b": pa.array(sb, pa.string()),
            "cosine": pa.array(cos, pa.float64()),
        }
    )


DOCS_SOURCE_TF_COSINE_SQL = """
WITH tk AS (
  SELECT source,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n
      FROM tk WHERE term <> '' GROUP BY 1, 2),
p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(SUM(a.n * b.n) AS BIGINT) AS sxy
  FROM c a JOIN c b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2),
nrm AS (SELECT source, CAST(SUM(n * n) AS BIGINT) AS ss FROM c GROUP BY 1)
SELECT source_a, source_b,
       CAST(sxy AS DOUBLE) / sqrt(CAST(na.ss AS DOUBLE) * CAST(nb.ss AS DOUBLE))
         AS cosine
FROM p JOIN nrm na ON p.source_a = na.source
       JOIN nrm nb ON p.source_b = nb.source
WHERE na.ss > 0 AND nb.ss > 0
ORDER BY source_a, source_b
"""


def customer_ltv_matrix(sf_dir: str):
    """Cohort LTV triangle — the revenue companion of the retention matrix:
    customers cohorted by FIRST-order year; each cohort's revenue at
    order-age offset k (years since first order), plus the running
    cumulative within the cohort.  Per-customer first year via a keyed Min,
    one 8-partition join back to orders, O(cohorts·offsets) cells, exact
    cents; the cumulative folds on the tiny driver table."""
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ck": t["o_custkey"],
                "yr": pc.year(t["o_orderdate"]).cast(pa.int64()),
                "cents": _cents(t["o_totalprice"]),
            }
        )

    o = orders.map_batches(prep, batch_format="pyarrow").materialize()
    firsts = o.groupby("ck").aggregate(Min("yr", alias_name="cohort_yr"))
    joined = o.join(
        firsts, join_type="inner", num_partitions=8, on=("ck",), right_on=("ck",)
    )

    def cells(t: pa.Table) -> pa.Table:
        yr = t["yr"].combine_chunks().to_numpy(zero_copy_only=False)
        cy = t["cohort_yr"].combine_chunks().to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "cohort_yr": pa.array(cy, pa.int64()),
                    "k": pa.array(yr - cy, pa.int64()),
                    "cents": t["cents"],
                }
            )
            .group_by(["cohort_yr", "k"])
            .aggregate([("cents", "sum")])
            .rename_columns(["cohort_yr", "k", "cents"])
        )

    g = (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby(["cohort_yr", "k"])
        .aggregate(Sum("cents", alias_name="rev_cents"))
        .to_pandas()
        .sort_values(["cohort_yr", "k"], kind="mergesort")
        .reset_index(drop=True)
    )
    rev = g["rev_cents"].to_numpy().astype(np.int64)
    cum = np.empty(len(rev), np.int64)
    run, last = 0, None
    for i in range(len(rev)):  # O(cohorts·offsets) driver fold
        c = int(g["cohort_yr"].iloc[i])
        if c != last:
            run, last = 0, c
        run += rev[i]
        cum[i] = run
    return pa.table(
        {
            "cohort_yr": pa.array(g["cohort_yr"].to_numpy().astype(np.int64)),
            "k": pa.array(g["k"].to_numpy().astype(np.int64)),
            "rev_cents": pa.array(rev, pa.int64()),
            "cum_rev_cents": pa.array(cum, pa.int64()),
        }
    )


CUSTOMER_LTV_MATRIX_SQL = """
WITH o AS (
  SELECT o_custkey AS ck, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders),
f AS (SELECT ck, MIN(yr) AS cohort_yr FROM o GROUP BY 1),
c AS (
  SELECT cohort_yr, yr - cohort_yr AS k,
         CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM o JOIN f USING (ck) GROUP BY 1, 2)
SELECT cohort_yr, CAST(k AS BIGINT) AS k, rev_cents,
       CAST(SUM(rev_cents) OVER (PARTITION BY cohort_yr ORDER BY k
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_rev_cents
FROM c ORDER BY cohort_yr, k
"""


def events_multigrain_counts(sf_dir: str):
    """Multi-granularity rollup — day, ISO-week and month counts UNIONed
    into one grain-tagged table (the time-hierarchy pre-aggregation a
    dashboard layer reads instead of re-scanning facts).  Three block-
    partial groupbys over ONE pass each; bucket encodings are integers
    (epoch-day / isoyear·100+week / year·100+month)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"]
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        iso = (
            pc.iso_year(ts).cast(pa.int64()).to_numpy(zero_copy_only=False) * 100
            + pc.iso_week(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        ym = (
            pc.year(ts).cast(pa.int64()).to_numpy(zero_copy_only=False) * 100
            + pc.month(ts).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        n = t.num_rows
        tb = pa.table(
            {
                "grain": pa.array(
                    ["day"] * n + ["week"] * n + ["month"] * n, pa.string()
                ),
                "bucket": pa.array(np.concatenate([day, iso, ym]), pa.int64()),
                "n": pa.array(np.ones(3 * n, np.int64)),
            }
        )
        return tb.group_by(["grain", "bucket"]).aggregate([("n", "sum")]).rename_columns(
            ["grain", "bucket", "n"]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["grain", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["grain", "bucket"])
    )


EVENTS_MULTIGRAIN_COUNTS_SQL = """
SELECT 'day' AS grain, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 2
UNION ALL
SELECT 'week', CAST(isoyear(ts) * 100 + week(ts) AS BIGINT), CAST(COUNT(*) AS BIGINT)
FROM events GROUP BY 2
UNION ALL
SELECT 'month', CAST(EXTRACT(year FROM ts) * 100 + EXTRACT(month FROM ts) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM events GROUP BY 2
ORDER BY grain, bucket
"""


def docs_source_lang_purity(sf_dir: str):
    """Slice purity — per source, the dominant language and its ppm share
    (the mixture-collapse guard before treating a source as monolingual):
    (source, lang) cells via block partials; the per-source argmax (count
    desc, lang asc tie order) and integer share fold on the tiny driver
    table."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "source": t["source"],
                "lang": t["lang"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["source", "lang"]).aggregate([("n", "sum")]).rename_columns(
            ["source", "lang", "n"]
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["source", "n", "lang"], ascending=[True, False, True], kind="mergesort")
    )
    rows = []
    for src, sub in g.groupby("source", sort=True):
        total = int(sub.n.sum())
        top = sub.iloc[0]
        rows.append((src, total, str(top.lang), int(top.n) * 1_000_000 // total))
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "top_lang": pa.array([r[2] for r in rows], pa.string()),
            "purity_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


DOCS_SOURCE_LANG_PURITY_SQL = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
t AS (SELECT source, SUM(n) AS n_docs FROM c GROUP BY 1),
r AS (
  SELECT source, lang, n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rk
  FROM c)
SELECT r.source, CAST(t.n_docs AS BIGINT) AS n_docs, r.lang AS top_lang,
       CAST(r.n * 1000000 // t.n_docs AS BIGINT) AS purity_ppm
FROM r JOIN t USING (source) WHERE rk = 1
ORDER BY r.source
"""


def docs_top_term_per_doc(sf_dir: str):
    """Per-document dominant term — the row-level argmax (count desc, term
    asc) with its ppm share of the doc's tokens: the keyword-label a naive
    tagger assigns.  All inside ONE block pass: per-(doc, term) Arrow
    group_by, then a lexsort argmax per doc — documents never straddle
    blocks, so block-local argmax IS global; zero shuffle."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def kernel(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col)
        ids = pc.take(t["doc_id"], parent)
        tb = pa.table({"doc_id": ids, "term": flat}).filter(
            pc.and_(pc.is_valid(flat), pc.not_equal(flat, ""))
        )
        g = tb.group_by(["doc_id", "term"]).aggregate([("term", "count")]).rename_columns(
            ["doc_id", "term", "n"]
        )
        did = g["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        terms = g["term"].combine_chunks()
        codes = terms.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        # rank within doc: sort (doc, -n, term) and take first per doc —
        # term tie order needs the STRING order, so sort by encoded term's
        # lexical rank: build it from the dictionary
        dic = terms.dictionary_encode().dictionary.to_pylist()
        lex = np.argsort(np.argsort(np.array(dic, dtype=object)))
        order = np.lexsort((lex[codes], -n, did))
        sdid = did[order]
        first = np.r_[True, sdid[1:] != sdid[:-1]]
        sel = order[first]
        totals = np.bincount(did[np.arange(len(did))], weights=n).astype(np.int64)
        top_n = n[sel]
        docs = did[sel]
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "top_term": terms.take(pa.array(sel)),
                "n": pa.array(top_n, pa.int64()),
                "share_ppm": pa.array(
                    top_n * 1_000_000 // totals[docs], pa.int64()
                ),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


DOCS_TOP_TERM_PER_DOC_SQL = """
WITH tk AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
c AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n
      FROM tk WHERE term <> '' GROUP BY 1, 2),
t AS (SELECT doc_id, SUM(n) AS total FROM c GROUP BY 1),
r AS (SELECT doc_id, term, n,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, term) AS rk
      FROM c)
SELECT r.doc_id, r.term AS top_term, r.n,
       CAST(r.n * 1000000 // t.total AS BIGINT) AS share_ppm
FROM r JOIN t USING (doc_id) WHERE rk = 1
"""


def events_value_histogram_by_type(sf_dir: str):
    """Faceted histogram — 10 equal-width bins with GLOBAL [min, max] edges
    shared across all types (facets are only comparable when the bins are):
    edge math is the integer (v − lo)·10 // span clamped to bin 9, cells
    are block partials, and the zero-filled (type × bin) grid comes from a
    driver cross of the two tiny domains."""
    mm_ds = rd.read_parquet(_t(sf_dir, "events"), columns=["value"]).map_batches(
        lambda t: pa.table({"cents": _cents(t["value"])}), batch_format="pyarrow"
    )
    lo, hi = int(mm_ds.min("cents")), int(mm_ds.max("cents"))
    span = max(hi - lo + 1, 1)
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        b = np.minimum((c - lo) * 10 // span, 9)
        tb = pa.table(
            {
                "event_type": t["event_type"],
                "bin": pa.array(b, pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["event_type", "bin"]).aggregate([("n", "sum")]).rename_columns(
            ["event_type", "bin", "n"]
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    types = sorted(g.event_type.unique())
    have = {(r.event_type, int(r.bin)): int(r.n) for r in g.itertuples()}
    et, bn, nn = [], [], []
    for tname in types:
        for b in range(10):
            et.append(tname)
            bn.append(b)
            nn.append(have.get((tname, b), 0))
    return pa.table(
        {
            "event_type": pa.array(et, pa.string()),
            "bin": pa.array(bn, pa.int64()),
            "n": pa.array(nn, pa.int64()),
        }
    )


EVENTS_VALUE_HISTOGRAM_BY_TYPE_SQL = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events),
b AS (SELECT MIN(cents) AS lo,
             GREATEST(MAX(cents) - MIN(cents) + 1, 1) AS span FROM c),
h AS (
  SELECT event_type, LEAST((cents - lo) * 10 // span, 9) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM c, b GROUP BY 1, 2),
ty AS (SELECT DISTINCT event_type FROM c),
grid AS (SELECT event_type, CAST(unnest(range(0, 10)) AS BIGINT) AS bin FROM ty)
SELECT grid.event_type, grid.bin, CAST(COALESCE(h.n, 0) AS BIGINT) AS n
FROM grid LEFT JOIN h USING (event_type, bin)
ORDER BY grid.event_type, grid.bin
"""


def orders_top_prices_with_ties(sf_dir: str):
    """FETCH FIRST … WITH TIES semantics — the top-5 DISTINCT price levels
    keep every order at those levels (RANK() ≤ 5, not row_number): per-block
    top-5-distinct-value partials are a LOSSLESS prune (global top-5 values
    ⊆ union of block top-5s), the 5 winning levels broadcast back, and the
    membership filter streams.  Unlike LIMIT, the result size is
    data-dependent — that's the point of WITH TIES."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def block_top(t: pa.Table) -> pa.Table:
        c = np.unique(_cents(t["o_totalprice"]).to_numpy(zero_copy_only=False))
        return pa.table({"cents": pa.array(c[-5:][::-1].copy(), pa.int64())})

    tops = (
        ds.map_batches(block_top, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    top5 = np.sort(tops["cents"].to_numpy().astype(np.int64))[-5:]
    tref = ray.put(pa.array(top5, pa.int64()))

    def keep(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"])
        f = t.filter(pc.is_in(c, value_set=ray.get(tref)))
        cf = _cents(f["o_totalprice"]).to_numpy(zero_copy_only=False)
        lv = np.sort(np.asarray(ray.get(tref)))[::-1]
        rank = np.searchsorted(-lv, -cf) + 1
        return pa.table(
            {
                "o_orderkey": f["o_orderkey"],
                "price_cents": pa.array(cf, pa.int64()),
                "price_rank": pa.array(rank, pa.int64()),
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow")


ORDERS_TOP_PRICES_WITH_TIES_SQL = """
WITH c AS (
  SELECT o_orderkey, CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS price_cents
  FROM orders),
r AS (SELECT o_orderkey, price_cents,
             CAST(DENSE_RANK() OVER (ORDER BY price_cents DESC) AS BIGINT)
               AS price_rank
      FROM c)
SELECT o_orderkey, price_cents, price_rank
FROM r WHERE price_rank <= 5
"""


def events_peak_4h_window(sf_dir: str):
    """Circular sliding window — the wrap-around best 4-hour-of-day band
    (23:00–03:00 is a real window; a linear frame can't see it): hour-of-day
    counts reduce to 24 cells, the 24 wrapped 4-sums fold on the driver,
    ties resolve to the smallest start hour.  The oracle mirrors the wrap
    with a modulo join."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hod = (us // 3_600_000_000) % 24
        return pa.table(
            {
                "hod": pa.array(hod, pa.int64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ).group_by("hod").aggregate([("n", "sum")]).rename_columns(["hod", "n"])

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hod")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = np.zeros(24, np.int64)
    counts[g["hod"].to_numpy().astype(int)] = g["n"].to_numpy().astype(np.int64)
    wrapped = np.concatenate([counts, counts[:3]])
    sums = np.array(
        [int(wrapped[s : s + 4].sum()) for s in range(24)], np.int64
    )
    best = int(np.argmax(sums))
    return pa.table(
        {
            "start_hod": pa.array([best], pa.int64()),
            "window_n": pa.array([int(sums[best])], pa.int64()),
            "total_n": pa.array([int(counts.sum())], pa.int64()),
        }
    )


EVENTS_PEAK_4H_WINDOW_SQL = """
WITH h AS (
  SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
grid AS (SELECT CAST(unnest(range(0, 24)) AS BIGINT) AS hod),
f AS (SELECT grid.hod, COALESCE(h.n, 0) AS n FROM grid LEFT JOIN h USING (hod)),
w AS (
  SELECT s.hod AS start_hod, SUM(f.n) AS window_n
  FROM grid s JOIN f ON f.hod IN ((s.hod) % 24, (s.hod + 1) % 24,
                                  (s.hod + 2) % 24, (s.hod + 3) % 24)
  GROUP BY 1)
SELECT CAST((SELECT start_hod FROM w ORDER BY window_n DESC, start_hod LIMIT 1)
            AS BIGINT) AS start_hod,
       CAST((SELECT window_n FROM w ORDER BY window_n DESC, start_hod LIMIT 1)
            AS BIGINT) AS window_n,
       (SELECT CAST(SUM(n) AS BIGINT) FROM f) AS total_n
"""


def customer_winback_by_year(sf_dir: str):
    """Win-back detection — reactivations after ≥2 years of silence: per
    order year, how many orders arrived ≥730 days after the same customer's
    previous order.  Per-customer sorted diffs in the group kernel; the
    year cells fold exactly."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    _empty = pa.table({"yr": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})

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
        day = ts // 86_400_000_000
        gap = np.diff(day)
        hit = np.flatnonzero(gap >= 730) + 1
        if not len(hit):
            return _empty
        yr = pc.year(s["o_orderdate"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(yr[hit], return_counts=True)
        return pa.table(
            {
                "yr": pa.array(vals, pa.int64()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.groupby("o_custkey")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(Sum("n", alias_name="n_winbacks"))
        .sort(["yr"])
    )


CUSTOMER_WINBACK_BY_YEAR_SQL = """
WITH s AS (
  SELECT o_custkey, o_orderdate,
         epoch_us(o_orderdate) // 86400000000 AS dy,
         lag(epoch_us(o_orderdate) // 86400000000) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS pdy
  FROM orders)
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_winbacks
FROM s WHERE pdy IS NOT NULL AND dy - pdy >= 730
GROUP BY 1 ORDER BY 1
"""


def orders_supplier_fanout_hist(sf_dir: str):
    """Order coordination cost — the distinct-suppliers-per-order histogram
    (how many orders need k suppliers): block-local DISTINCT (order,
    supplier) partials → per-order distinct count → O(distinct fanouts)
    histogram.  Two cascaded tiny groupbys after the distinct reduction."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"ok": t["l_orderkey"], "sk": t["l_suppkey"]})
            .group_by(["ok", "sk"])
            .aggregate([])
        )

    per_order = (
        li.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["ok", "sk"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: pa.table(
                {"ok": t["ok"], "n": pa.array(np.ones(t.num_rows, np.int64))}
            )
            .group_by("ok")
            .aggregate([("n", "sum")])
            .rename_columns(["ok", "n"]),
            batch_format="pyarrow",
        )
        .groupby("ok")
        .aggregate(Sum("n", alias_name="n_suppliers"))
    )

    return (
        per_order.map_batches(
            lambda t: pa.table(
                {
                    "n_suppliers": t["n_suppliers"],
                    "c": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by("n_suppliers")
            .aggregate([("c", "sum")])
            .rename_columns(["n_suppliers", "c"]),
            batch_format="pyarrow",
        )
        .groupby("n_suppliers")
        .aggregate(Sum("c", alias_name="n_orders"))
        .sort(["n_suppliers"])
    )


ORDERS_SUPPLIER_FANOUT_HIST_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
p AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM d GROUP BY 1)
SELECT n_suppliers, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM p GROUP BY 1 ORDER BY 1
"""


def events_round_value_bias(sf_dir: str):
    """Numeric forensics (the Benford profile's modular sibling): how often
    values land on round cents — whole dollars, half dollars, dimes — vs
    the uniform-modulus expectation; fabricated numbers over-index on round
    figures.  Four scalar partials, shares in exact ppm."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["value"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(c)], pa.int64()),
                "whole": pa.array([int((c % 100 == 0).sum())], pa.int64()),
                "half": pa.array([int((c % 50 == 0).sum())], pa.int64()),
                "dime": pa.array([int((c % 10 == 0).sum())], pa.int64()),
            }
        )

    s = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("whole", alias_name="whole"),
        Sum("half", alias_name="half"),
        Sum("dime", alias_name="dime"),
    )
    n, wh, hf, dm = int(s["n"]), int(s["whole"]), int(s["half"]), int(s["dime"])
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "whole_dollar_ppm": pa.array([wh * 1_000_000 // n], pa.int64()),
            "half_dollar_ppm": pa.array([hf * 1_000_000 // n], pa.int64()),
            "dime_ppm": pa.array([dm * 1_000_000 // n], pa.int64()),
        }
    )


EVENTS_ROUND_VALUE_BIAS_SQL = """
WITH c AS (SELECT CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents FROM events)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS whole_dollar_ppm,
       CAST(SUM(CASE WHEN cents % 50 = 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS half_dollar_ppm,
       CAST(SUM(CASE WHEN cents % 10 = 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS dime_ppm
FROM c
"""


def corpus_health_report(sf_dir: str):
    """One-row warehouse health capstone — the cross-table morning report:
    corpus size and language spread, exact-dup burden (rows beyond each
    (lang, n_chars) cluster's first), total token volume, event/user
    activity, and order/lineitem revenue — each number a block-partial
    reduction over its own table, composed into a single row.  The shape a
    scheduler runs first every day; all integers."""
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "n_chars", "text"])

    def doc_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        n_tok = int(
            pc.sum(
                pc.cast(
                    pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")), pa.int64()
                )
            ).as_py()
            or 0
        )
        key = pa.table({"lang": t["lang"], "n_chars": t["n_chars"]})
        g = key.group_by(["lang", "n_chars"]).aggregate([("lang", "count")])
        return pa.table(
            {
                "lang": g["lang"],
                "n_chars": g["n_chars"],
                "n": g["lang_count"],
                "tok": pa.array([n_tok] + [0] * (g.num_rows - 1), pa.int64())
                if g.num_rows
                else pa.array([], pa.int64()),
            }
        )

    dg = (
        docs.map_batches(doc_partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("n", alias_name="n"), Sum("tok", alias_name="tok"))
        .to_pandas()
    )
    n_docs = int(dg.n.sum())
    n_langs = int(dg.lang.nunique())
    dup_rows = int((dg.n - 1).clip(lower=0).sum())
    total_tokens = int(dg.tok.sum())

    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    n_events = ev.count()
    n_users = len(ev.unique("user_id"))

    n_orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey"]).count()
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_extendedprice", "l_discount"]
    )

    def rev_partial(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])))
        return pa.table(
            {"rev": pa.array([int(pc.sum(rev).as_py() or 0)], pa.int64())}
        )

    rev_cents = int(
        li.map_batches(rev_partial, batch_format="pyarrow").sum("rev")
    )
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_langs": pa.array([n_langs], pa.int64()),
            "exact_dup_rows": pa.array([dup_rows], pa.int64()),
            "total_tokens": pa.array([total_tokens], pa.int64()),
            "n_events": pa.array([n_events], pa.int64()),
            "n_users": pa.array([n_users], pa.int64()),
            "n_orders": pa.array([n_orders], pa.int64()),
            "lineitem_rev_cents": pa.array([rev_cents], pa.int64()),
        }
    )


CORPUS_HEALTH_REPORT_SQL = """
WITH dk AS (
  SELECT lang, n_chars, COUNT(*) AS n FROM documents GROUP BY 1, 2),
toks AS (
  SELECT COUNT(*) AS total_tokens
  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        FROM documents)
  WHERE term <> '')
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
       (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents) AS n_langs,
       (SELECT CAST(SUM(n - 1) AS BIGINT) FROM dk) AS exact_dup_rows,
       (SELECT CAST(total_tokens AS BIGINT) FROM toks) AS total_tokens,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events,
       (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
       (SELECT CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5)
                             AS BIGINT)) AS BIGINT) FROM lineitem)
         AS lineitem_rev_cents
"""


def events_session_duration_quartiles(sf_dir: str):
    """Session-duration distribution — sessionize (30-min gap) composed
    with the exact quartile card: every session's span (last−first event,
    zero for singletons) pooled globally, p25/50/75 under the
    sorted[ceil(q·n)−1] quantile_disc convention.  Spans fold over the
    O(sessions) narrow table."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000

    def kernel(g: pa.Table) -> pa.Table:
        ts = np.sort(g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        brk = np.r_[True, np.diff(ts) > gap_us]
        starts = np.nonzero(brk)[0]
        ends = np.r_[starts[1:], len(ts)]
        return pa.table(
            {"span_us": pa.array(ts[ends - 1] - ts[starts], pa.int64())}
        )

    spans = np.sort(
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()["span_us"]
        .to_numpy()
        .astype(np.int64)
    )
    import math

    n = len(spans)

    def disc(q: float) -> int:
        return int(spans[max(int(math.ceil(q * n)) - 1, 0)])

    return pa.table(
        {
            "n_sessions": pa.array([n], pa.int64()),
            "p25_us": pa.array([disc(0.25)], pa.int64()),
            "p50_us": pa.array([disc(0.5)], pa.int64()),
            "p75_us": pa.array([disc(0.75)], pa.int64()),
        }
    )


EVENTS_SESSION_DURATION_QUARTILES_SQL = """
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
y AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM x),
s AS (
  SELECT epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us
  FROM y GROUP BY user_id, sess)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(quantile_disc(span_us, 0.25) AS BIGINT) AS p25_us,
       CAST(quantile_disc(span_us, 0.50) AS BIGINT) AS p50_us,
       CAST(quantile_disc(span_us, 0.75) AS BIGINT) AS p75_us
FROM s
"""


def segment_price_cqv(sf_dir: str):
    """Coefficient of quartile variation per market segment — the robust
    relative-dispersion metric (Q₃−Q₁)·10⁶ // (Q₃+Q₁) over order prices,
    segment resolved through one 8-partition orders⋈customer join.
    Quartiles use the sorted[ceil(q·n)−1] convention; the CQV is an
    integer cross-ratio."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def kernel(g: pa.Table) -> pa.Table:
        import math

        c = np.sort(_cents(g["o_totalprice"]).to_numpy(zero_copy_only=False))
        n = len(c)
        q1 = int(c[max(int(math.ceil(0.25 * n)) - 1, 0)])
        q3 = int(c[max(int(math.ceil(0.75 * n)) - 1, 0)])
        return pa.table(
            {
                "c_mktsegment": pa.array(
                    [str(g["c_mktsegment"][0].as_py())], pa.string()
                ),
                "n": pa.array([n], pa.int64()),
                "q1_cents": pa.array([q1], pa.int64()),
                "q3_cents": pa.array([q3], pa.int64()),
                "cqv_ppm": pa.array([(q3 - q1) * 1_000_000 // (q3 + q1)], pa.int64()),
            }
        )

    return (
        joined.groupby("c_mktsegment")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["c_mktsegment"])
    )


SEGMENT_PRICE_CQV_SQL = """
WITH j AS (
  SELECT c_mktsegment,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey),
q AS (
  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(quantile_disc(cents, 0.25) AS BIGINT) AS q1_cents,
         CAST(quantile_disc(cents, 0.75) AS BIGINT) AS q3_cents
  FROM j GROUP BY 1)
SELECT c_mktsegment, n, q1_cents, q3_cents,
       CAST((q3_cents - q1_cents) * 1000000 // (q3_cents + q1_cents) AS BIGINT)
         AS cqv_ppm
FROM q ORDER BY 1
"""


def orders_keyspace_density(sf_dir: str):
    """Key-space integrity audit — are order keys densely allocated or full
    of holes (dropped writes / purges / sharded allocators)?  min, max,
    distinct count and the missing-key count (span − distinct), plus
    density ppm — four scalars from block partials; distinct == count is
    itself asserted (keys are unique here, and the audit would EXPOSE a
    violation as a negative missing count)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "mn": pa.array([int(k.min())], pa.int64()),
                "mx": pa.array([int(k.max())], pa.int64()),
                "n": pa.array([len(np.unique(k))], pa.int64()),
            }
        )

    # block-local unique is NOT global distinct in general, but orderkeys
    # are globally unique (the audit's premise) — cross-checked by the
    # oracle's true COUNT(DISTINCT); a dup key would mismatch loudly here
    s = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Min("mn", alias_name="mn"), Max("mx", alias_name="mx"), Sum("n", alias_name="n")
    )
    mn, mx, n = int(s["mn"]), int(s["mx"]), int(s["n"])
    span = mx - mn + 1
    return pa.table(
        {
            "min_key": pa.array([mn], pa.int64()),
            "max_key": pa.array([mx], pa.int64()),
            "n_distinct": pa.array([n], pa.int64()),
            "missing_keys": pa.array([span - n], pa.int64()),
            "density_ppm": pa.array([n * 1_000_000 // span], pa.int64()),
        }
    )


ORDERS_KEYSPACE_DENSITY_SQL = """
SELECT CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(MAX(o_orderkey) - MIN(o_orderkey) + 1 - COUNT(DISTINCT o_orderkey)
            AS BIGINT) AS missing_keys,
       CAST(COUNT(DISTINCT o_orderkey) * 1000000
            // (MAX(o_orderkey) - MIN(o_orderkey) + 1) AS BIGINT) AS density_ppm
FROM orders
"""


def supplier_share_movers(sf_dir: str):
    """Share-of-market movers — each supplier's revenue share (ppm) in the
    FIRST and LAST order years and the signed delta, top-10 by |delta| (tie
    order |delta| desc, supplier asc): the competitive-dynamics report.
    (supplier, year) cells from one fact pass; the two year slices and the
    ranking fold on the O(suppliers) driver table — integers throughout."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])))
        yr = pc.year(t["l_shipdate"]).cast(pa.int64())
        return (
            pa.table({"sk": t["l_suppkey"], "yr": yr, "rev": rev})
            .group_by(["sk", "yr"])
            .aggregate([("rev", "sum")])
            .rename_columns(["sk", "yr", "rev"])
        )

    g = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["sk", "yr"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    y0, y1 = int(g.yr.min()), int(g.yr.max())
    first = g[g.yr == y0].set_index("sk").rev
    last = g[g.yr == y1].set_index("sk").rev
    t0, t1 = int(first.sum()), int(last.sum())
    sks = sorted(set(first.index) | set(last.index))
    rows = []
    for sk in sks:
        s0 = int(first.get(sk, 0)) * 1_000_000 // t0
        s1 = int(last.get(sk, 0)) * 1_000_000 // t1
        rows.append((int(sk), s0, s1, s1 - s0))
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    rows = rows[:10]
    return pa.table(
        {
            "s_suppkey": pa.array([r[0] for r in rows], pa.int64()),
            "first_share_ppm": pa.array([r[1] for r in rows], pa.int64()),
            "last_share_ppm": pa.array([r[2] for r in rows], pa.int64()),
            "delta_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


SUPPLIER_SHARE_MOVERS_SQL = """
WITH c AS (
  SELECT l_suppkey AS sk, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY 1, 2),
b AS (SELECT MIN(yr) AS y0, MAX(yr) AS y1 FROM c),
f AS (SELECT sk, rev FROM c, b WHERE yr = y0),
l AS (SELECT sk, rev FROM c, b WHERE yr = y1),
tf AS (SELECT SUM(rev) AS t0 FROM f),
tl AS (SELECT SUM(rev) AS t1 FROM l),
u AS (SELECT sk FROM f UNION SELECT sk FROM l),
s AS (
  SELECT u.sk,
         CAST(COALESCE(f.rev, 0) * 1000000 // t0 AS BIGINT) AS first_share_ppm,
         CAST(COALESCE(l.rev, 0) * 1000000 // t1 AS BIGINT) AS last_share_ppm
  FROM u LEFT JOIN f ON u.sk = f.sk LEFT JOIN l ON u.sk = l.sk, tf, tl)
SELECT CAST(sk AS BIGINT) AS s_suppkey, first_share_ppm, last_share_ppm,
       CAST(last_share_ppm - first_share_ppm AS BIGINT) AS delta_ppm
FROM s
ORDER BY ABS(last_share_ppm - first_share_ppm) DESC, sk LIMIT 10
"""


def events_user_gap_regularity(sf_dir: str):
    """Cadence regularity per user — the squared-CV dispersion index of
    interarrival gaps, EXACT in integers: disp_ppm = n·Σg²·10⁶ // (Σg)²
    (=10⁶ for a perfectly regular clock, ≈2·10⁶ for Poisson arrivals,
    larger = burstier).  Gaps in whole seconds keep Σg² inside int64;
    the oracle casts through HUGEINT for the same headroom.  Users with
    fewer than 2 gaps have no defined index and are absent."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "disp_ppm": pa.array([], pa.int64()),
        }
    )

    def kernel(g: pa.Table) -> pa.Table:
        ts = np.sort(g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        gaps = np.diff(ts) // 1_000_000
        if len(gaps) < 2:
            return _empty
        sg = int(gaps.sum())
        if sg == 0:
            return _empty
        sg2 = int((gaps * gaps).sum())
        disp = len(gaps) * sg2 * 1_000_000 // (sg * sg)
        return pa.table(
            {
                "user_id": pa.array([int(g["user_id"][0].as_py())], pa.int64()),
                "n_gaps": pa.array([len(gaps)], pa.int64()),
                "disp_ppm": pa.array([disp], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(kernel, batch_format="pyarrow").sort(
        ["user_id"]
    )


EVENTS_USER_GAP_REGULARITY_SQL = """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS pt
  FROM events),
g AS (SELECT user_id, (t - pt) // 1000000 AS gap FROM s WHERE pt IS NOT NULL),
a AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap) AS BIGINT) AS sg,
         CAST(SUM(gap * gap) AS BIGINT) AS sg2
  FROM g GROUP BY 1)
SELECT user_id, n_gaps,
       CAST(CAST(n_gaps AS HUGEINT) * sg2 * 1000000
            // (CAST(sg AS HUGEINT) * sg) AS BIGINT) AS disp_ppm
FROM a WHERE n_gaps >= 2 AND sg > 0
ORDER BY user_id
"""


def docs_stutter_rate(sf_dir: str):
    """Token-stutter artifact rate — the 'the the' detector: fraction of
    adjacent token pairs that are EQUAL, in ppm, plus the most common
    stuttered token (count desc, token asc).  Adjacent equality is two
    aligned slices per block; the per-token stutter counts ship through
    one tiny groupby."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        words = flat.filter(pa.array(keep))
        par = parent[keep]
        if len(par) < 2:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    "n_stutter": pa.array([], pa.int64()),
                }
            )
        n_tok = len(par)
        same_doc = par[:-1] == par[1:]
        left = words.slice(0, n_tok - 1)
        eq = (
            pc.equal(left, words.slice(1, n_tok - 1)).to_numpy(zero_copy_only=False)
            & same_doc
        )
        n_pairs = int(same_doc.sum())
        terms = left.filter(pa.array(eq)).to_pylist()
        tb = pa.table(
            {
                "term": pa.array(terms + ["\x00total"], pa.string()),
                "n_pairs": pa.array([0] * len(terms) + [n_pairs], pa.int64()),
                "n_stutter": pa.array([1] * len(terms) + [0], pa.int64()),
            }
        )
        return tb.group_by("term").aggregate(
            [("n_pairs", "sum"), ("n_stutter", "sum")]
        ).rename_columns(["term", "n_pairs", "n_stutter"])

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"), Sum("n_stutter", alias_name="n_stutter"))
        .to_pandas()
    )
    total_pairs = int(g.n_pairs.sum())
    st = g[g.term != "\x00total"].copy()
    n_stutter = int(st.n_stutter.sum())
    if len(st) and n_stutter:
        st = st.sort_values(["n_stutter", "term"], ascending=[False, True], kind="mergesort")
        top_term, top_n = str(st.term.iloc[0]), int(st.n_stutter.iloc[0])
    else:
        top_term, top_n = "", 0
    return pa.table(
        {
            "n_pairs": pa.array([total_pairs], pa.int64()),
            "n_stutter": pa.array([n_stutter], pa.int64()),
            "stutter_ppm": pa.array(
                [n_stutter * 1_000_000 // max(total_pairs, 1)], pa.int64()
            ),
            "top_stutter_term": pa.array([top_term], pa.string()),
            "top_stutter_n": pa.array([top_n], pa.int64()),
        }
    )


DOCS_STUTTER_RATE_SQL = """
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
  SELECT term,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM f),
p AS (SELECT term, nxt FROM w WHERE nxt IS NOT NULL),
st AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM p
       WHERE term = nxt GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN term = nxt THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_stutter
        FROM p)
SELECT n_pairs, n_stutter,
       CAST(n_stutter * 1000000 // GREATEST(n_pairs, 1) AS BIGINT)
         AS stutter_ppm,
       COALESCE((SELECT term FROM st ORDER BY n DESC, term LIMIT 1), '')
         AS top_stutter_term,
       COALESCE((SELECT n FROM st ORDER BY n DESC, term LIMIT 1), 0)
         AS top_stutter_n
FROM tot
"""


def register_aging_report(sf_dir: str):
    """Accounts-receivable AGING — the invoice-domain report the reference's
    users actually print (≙ the register's due dates, server.js register
    ingest): unpaid register rows bucketed by days past due at the fixed
    as-of 2024-07-01 (current / 1–30 / 31–60 / 61–90 / 90+), counts and
    exact expected-amount cents per bucket.  Composes the S2 CSV-ingest
    pipeline (register_csv_normalize) with a vectorized date-diff bucket
    map; the oracle reconstructs the same rows straight from customer."""
    reg = register_csv_normalize(sf_dir)
    as_of = int(np.datetime64("2024-07-01", "D").astype(np.int64))
    labels = ["0-current", "1-30", "31-60", "61-90", "90+"]

    def bucketize(t: pa.Table) -> pa.Table:
        due = np.array(t["due_date"].to_pylist(), "datetime64[D]").astype(np.int64)
        age = as_of - due
        ix = np.select(
            [age <= 0, age <= 30, age <= 60, age <= 90],
            [0, 1, 2, 3],
            default=4,
        )
        cents = _cents(t["expected_amount"])
        return (
            pa.table(
                {
                    "bucket_ix": pa.array(ix.astype(np.int64), pa.int64()),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "cents": cents,
                }
            )
            .group_by("bucket_ix")
            .aggregate([("n", "sum"), ("cents", "sum")])
            .rename_columns(["bucket_ix", "n", "cents"])
        )

    g = (
        reg.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket_ix")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="amount_cents"))
        .to_pandas()
        .sort_values("bucket_ix", kind="mergesort")
    )
    return pa.table(
        {
            "bucket": pa.array(
                [labels[int(i)] for i in g["bucket_ix"]], pa.string()
            ),
            "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            "amount_cents": pa.array(
                g["amount_cents"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


REGISTER_AGING_REPORT_SQL = """
WITH reg AS (
  SELECT abs(c_acctbal) AS expected_amount,
         CAST(printf('2024-%02d-15', 1 + c_custkey % 12) AS DATE) AS due
  FROM customer),
b AS (
  SELECT CASE WHEN DATE '2024-07-01' - due <= 0 THEN '0-current'
              WHEN DATE '2024-07-01' - due <= 30 THEN '1-30'
              WHEN DATE '2024-07-01' - due <= 60 THEN '31-60'
              WHEN DATE '2024-07-01' - due <= 90 THEN '61-90'
              ELSE '90+' END AS bucket,
         CAST(FLOOR(expected_amount*100 + 0.5) AS BIGINT) AS cents
  FROM reg)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS amount_cents
FROM b GROUP BY 1 ORDER BY 1
"""


def orders_quarter_close_spike(sf_dir: str):
    """Quarter-close spike — the revenue-pull-forward audit: per (year,
    quarter), the ppm of revenue booked in the quarter's LAST 7 days.
    Quarter-end arithmetic is pure month-index math on int64 (no string
    dates, leap-safe via datetime64[M]→[D]); cells fold exactly."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (us // 86_400_000_000).astype("datetime64[D]")
        mon = day.astype("datetime64[M]")
        mi = mon.astype(np.int64)
        q_start_mi = mi // 3 * 3
        next_q_first = (q_start_mi + 3).astype("datetime64[M]").astype("datetime64[D]")
        q_end = next_q_first - np.timedelta64(1, "D")
        in_last7 = (q_end - day) <= np.timedelta64(6, "D")
        yr = 1970 + q_start_mi // 12
        q = q_start_mi % 12 // 3 + 1
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "yr": pa.array(yr, pa.int64()),
                    "q": pa.array(q, pa.int64()),
                    "total": pa.array(cents, pa.int64()),
                    "last7": pa.array(
                        np.where(in_last7, cents, 0).astype(np.int64), pa.int64()
                    ),
                }
            )
            .group_by(["yr", "q"])
            .aggregate([("total", "sum"), ("last7", "sum")])
            .rename_columns(["yr", "q", "total", "last7"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["yr", "q"])
        .aggregate(Sum("total", alias_name="total_cents"), Sum("last7", alias_name="last7_cents"))
        .to_pandas()
        .sort_values(["yr", "q"], kind="mergesort")
    )
    tot = g["total_cents"].to_numpy().astype(np.int64)
    l7 = g["last7_cents"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "yr": pa.array(g["yr"].to_numpy().astype(np.int64)),
            "q": pa.array(g["q"].to_numpy().astype(np.int64)),
            "total_cents": pa.array(tot, pa.int64()),
            "last7_cents": pa.array(l7, pa.int64()),
            "spike_ppm": pa.array(l7 * 1_000_000 // tot, pa.int64()),
        }
    )


ORDERS_QUARTER_CLOSE_SPIKE_SQL = """
WITH c AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST((EXTRACT(month FROM o_orderdate) - 1) // 3 + 1 AS BIGINT) AS q,
         CASE WHEN CAST(date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH
                        - INTERVAL 1 DAY AS DATE)
                   - CAST(o_orderdate AS DATE) <= 6
              THEN 1 ELSE 0 END AS last7,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
  FROM orders)
SELECT yr, q, CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(last7 * cents) AS BIGINT) AS last7_cents,
       CAST(SUM(last7 * cents) * 1000000 // SUM(cents) AS BIGINT) AS spike_ppm
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""


def lineitem_linenumber_audit(sf_dir: str):
    """Line-number contiguity audit — per order, linenumbers must be exactly
    1..n (the write-path invariant a lost or doubled line breaks): per-order
    (count, min, max, sum) partials make the check three integer equalities
    — n == max, min == 1, Σ == n(n+1)/2 (the sum catches duplicates that
    min/max alone miss).  One row: orders checked, violations."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber"])

    def partial(t: pa.Table) -> pa.Table:
        ln = t["l_linenumber"].cast(pa.int64())
        tb = pa.table(
            {
                "ok": t["l_orderkey"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "mn": ln,
                "mx": ln,
                "sm": ln,
            }
        )
        return tb.group_by("ok").aggregate(
            [("n", "sum"), ("mn", "min"), ("mx", "max"), ("sm", "sum")]
        ).rename_columns(["ok", "n", "mn", "mx", "sm"])

    g = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("ok")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
            Sum("sm", alias_name="sm"),
        )
    )

    def check(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        mn = t["mn"].combine_chunks().to_numpy(zero_copy_only=False)
        mx = t["mx"].combine_chunks().to_numpy(zero_copy_only=False)
        sm = t["sm"].combine_chunks().to_numpy(zero_copy_only=False)
        bad = (mn != 1) | (mx != n) | (sm != n * (n + 1) // 2)
        return pa.table(
            {
                "orders": pa.array([len(n)], pa.int64()),
                "violations": pa.array([int(bad.sum())], pa.int64()),
            }
        )

    s = g.map_batches(check, batch_format="pyarrow").aggregate(
        Sum("orders", alias_name="orders"), Sum("violations", alias_name="violations")
    )
    return pa.table(
        {
            "orders": pa.array([int(s["orders"])], pa.int64()),
            "violations": pa.array([int(s["violations"])], pa.int64()),
        }
    )


LINEITEM_LINENUMBER_AUDIT_SQL = """
WITH p AS (
  SELECT l_orderkey, COUNT(*) AS n, MIN(l_linenumber) AS mn,
         MAX(l_linenumber) AS mx, SUM(l_linenumber) AS sm
  FROM lineitem GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS orders,
       CAST(SUM(CASE WHEN mn <> 1 OR mx <> n OR sm <> n*(n+1)//2
                     THEN 1 ELSE 0 END) AS BIGINT) AS violations
FROM p
"""


def events_type_value_drift(sf_dir: str):
    """Per-type VALUE drift between the time-range halves (the mean-shift
    companion of the count-mix TV drift): each type reduces to four
    integers (n, Σcents per half); the mean delta is the signed
    cross-multiplied ppm (s₂·n₁ − s₁·n₂)·10⁶ / (s₁·n₂), TRUNCATED toward
    zero — DuckDB's BIGINT // convention (the orders_monthly_yoy
    discipline), matched with sign·(|num| // |den|) on the numpy side."""
    mm_ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"]).map_batches(
        lambda t: pa.table({"ts_us": t["ts"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    lo, hi = int(mm_ds.min("ts_us")), int(mm_ds.max("ts_us"))
    mid = (lo + hi) // 2
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = _cents(t["value"]).to_numpy(zero_copy_only=False)
        h2 = (ts > mid).astype(np.int64)
        return (
            pa.table(
                {
                    "typ": t["event_type"],
                    "n1": pa.array(1 - h2, pa.int64()),
                    "s1": pa.array(np.where(h2 == 0, cents, 0), pa.int64()),
                    "n2": pa.array(h2, pa.int64()),
                    "s2": pa.array(np.where(h2 == 1, cents, 0), pa.int64()),
                }
            )
            .group_by("typ")
            .aggregate([("n1", "sum"), ("s1", "sum"), ("n2", "sum"), ("s2", "sum")])
            .rename_columns(["typ", "n1", "s1", "n2", "s2"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("typ")
        .aggregate(
            Sum("n1", alias_name="n1"),
            Sum("s1", alias_name="s1"),
            Sum("n2", alias_name="n2"),
            Sum("s2", alias_name="s2"),
        )
        .to_pandas()
        .sort_values("typ", kind="mergesort")
    )
    g = g[(g.n1 > 0) & (g.n2 > 0) & (g.s1 > 0)]
    n1 = g["n1"].to_numpy().astype(np.int64)
    s1 = g["s1"].to_numpy().astype(np.int64)
    n2 = g["n2"].to_numpy().astype(np.int64)
    s2 = g["s2"].to_numpy().astype(np.int64)
    num = (s2 * n1 - s1 * n2) * 1_000_000
    den = s1 * n2
    delta = np.sign(num) * (np.abs(num) // den)
    return pa.table(
        {
            "event_type": pa.array(g["typ"].tolist(), pa.string()),
            "n_first": pa.array(n1, pa.int64()),
            "n_second": pa.array(n2, pa.int64()),
            "mean_delta_ppm": pa.array(delta.astype(np.int64), pa.int64()),
        }
    )


EVENTS_TYPE_VALUE_DRIFT_SQL = """
WITH b AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events),
c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN epoch_us(ts) <= mid THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN epoch_us(ts) <= mid
                        THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN epoch_us(ts) > mid THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN epoch_us(ts) > mid
                        THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS s2
  FROM events, b GROUP BY 1)
SELECT event_type, n1 AS n_first, n2 AS n_second,
       CAST((s2 * n1 - s1 * n2) * 1000000 // (s1 * n2) AS BIGINT)
         AS mean_delta_ppm
FROM c WHERE n1 > 0 AND n2 > 0 AND s1 > 0
ORDER BY event_type
"""


def customer_acquisition_curve(sf_dir: str):
    """Customer-acquisition curve — new customers by first-order year and
    the running cumulative base: the growth chart behind every board deck.
    Per-customer MIN(year) via keyed partials; the O(years) cumulative
    folds on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "ck": t["o_custkey"],
                    "yr": pc.year(t["o_orderdate"]).cast(pa.int64()),
                }
            )
            .group_by("ck")
            .aggregate([("yr", "min")])
            .rename_columns(["ck", "yr"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Min("yr", alias_name="first_yr"))
        .map_batches(
            lambda t: pa.table(
                {
                    "yr": t["first_yr"],
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by("yr")
            .aggregate([("n", "sum")])
            .rename_columns(["yr", "n"]),
            batch_format="pyarrow",
        )
        .groupby("yr")
        .aggregate(Sum("n", alias_name="new_customers"))
        .to_pandas()
        .sort_values("yr", kind="mergesort")
    )
    new = g["new_customers"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "yr": pa.array(g["yr"].to_numpy().astype(np.int64)),
            "new_customers": pa.array(new, pa.int64()),
            "cum_customers": pa.array(np.cumsum(new), pa.int64()),
        }
    )


CUSTOMER_ACQUISITION_CURVE_SQL = """
WITH f AS (
  SELECT o_custkey, CAST(MIN(EXTRACT(year FROM o_orderdate)) AS BIGINT) AS yr
  FROM orders GROUP BY 1),
c AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS new_customers FROM f GROUP BY 1)
SELECT yr, new_customers,
       CAST(SUM(new_customers) OVER (ORDER BY yr ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_customers
FROM c ORDER BY yr
"""


def part_charm_pricing(sf_dir: str):
    """Charm-pricing census — the .99-ending share of retail prices per
    brand (the psychological-pricing fingerprint; a supplier feed that
    never charm-prices stands out).  One modular test per row, brand cells
    from block partials, exact ppm."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "p_brand": t["p_brand"],
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "c99": pa.array((c % 100 == 99).astype(np.int64), pa.int64()),
                }
            )
            .group_by("p_brand")
            .aggregate([("n", "sum"), ("c99", "sum")])
            .rename_columns(["p_brand", "n", "c99"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("n", alias_name="n"), Sum("c99", alias_name="n_charm"))
        .to_pandas()
        .sort_values("p_brand", kind="mergesort")
    )
    n = g["n"].to_numpy().astype(np.int64)
    ch = g["n_charm"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "p_brand": pa.array(g["p_brand"].tolist(), pa.string()),
            "n": pa.array(n, pa.int64()),
            "n_charm": pa.array(ch, pa.int64()),
            "charm_ppm": pa.array(ch * 1_000_000 // n, pa.int64()),
        }
    )


PART_CHARM_PRICING_SQL = """
WITH c AS (
  SELECT p_brand, CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT) AS cents
  FROM part)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN cents % 100 = 99 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_charm,
       CAST(SUM(CASE WHEN cents % 100 = 99 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS charm_ppm
FROM c GROUP BY 1 ORDER BY 1
"""


def events_onboarding_session_stats(sf_dir: str):
    """Onboarding depth — is the FIRST session bigger than later ones?
    sessionize (30-min gap) composed into per-user (first-session events,
    later-session events/counts); one row of exact sums plus the
    first-vs-rest mean ratio as the cross-multiplied ppm
    Σfirst·n_rest·10⁶ // (Σrest·n_users)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000

    def kernel(g: pa.Table) -> pa.Table:
        ts = np.sort(g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        brk = np.r_[True, np.diff(ts) > gap_us]
        starts = np.nonzero(brk)[0]
        ends = np.r_[starts[1:], len(ts)]
        sizes = ends - starts
        return pa.table(
            {
                "first_events": pa.array([int(sizes[0])], pa.int64()),
                "rest_events": pa.array([int(sizes[1:].sum())], pa.int64()),
                "rest_sessions": pa.array([len(sizes) - 1], pa.int64()),
                "users": pa.array([1], pa.int64()),
            }
        )

    s = (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .aggregate(
            Sum("first_events", alias_name="first_events"),
            Sum("rest_events", alias_name="rest_events"),
            Sum("rest_sessions", alias_name="rest_sessions"),
            Sum("users", alias_name="users"),
        )
    )
    fe, re_ = int(s["first_events"]), int(s["rest_events"])
    rs, us = int(s["rest_sessions"]), int(s["users"])
    ratio = fe * rs * 1_000_000 // (re_ * us) if re_ > 0 else -1
    return pa.table(
        {
            "n_users": pa.array([us], pa.int64()),
            "first_events": pa.array([fe], pa.int64()),
            "rest_events": pa.array([re_], pa.int64()),
            "rest_sessions": pa.array([rs], pa.int64()),
            "first_vs_rest_mean_ppm": pa.array([ratio], pa.int64()),
        }
    )


EVENTS_ONBOARDING_SESSION_STATS_SQL = """
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
s AS (SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS n
      FROM y GROUP BY 1, 2),
a AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN sess = 0 THEN n ELSE 0 END) AS BIGINT)
           AS first_events,
         CAST(SUM(CASE WHEN sess > 0 THEN n ELSE 0 END) AS BIGINT)
           AS rest_events,
         CAST(SUM(CASE WHEN sess > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS rest_sessions
  FROM s)
SELECT n_users, first_events, rest_events, rest_sessions,
       CASE WHEN rest_events > 0
            THEN CAST(first_events * rest_sessions * 1000000
                      // (rest_events * n_users) AS BIGINT)
            ELSE -1 END AS first_vs_rest_mean_ppm
FROM a
"""


def lineitem_policy_audit(sf_dir: str):
    """Business-policy gate audit — one pass counts violations of four
    written policies (discount cap 10 %, tax cap 8 %, quantity cap 50,
    discount-implies-volume: discount > 5 % requires quantity ≥ 10): the
    deequ-style constraint report on the fact table, exact integers, with
    the policy ids stable for alerting."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_discount", "l_tax", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        x = t["l_tax"].to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "disc_cap": pa.array([int((d > 0.10).sum())], pa.int64()),
                "tax_cap": pa.array([int((x > 0.08).sum())], pa.int64()),
                "qty_cap": pa.array([int((q > 50.0).sum())], pa.int64()),
                "disc_vol": pa.array(
                    [int(((d > 0.05) & (q < 10.0)).sum())], pa.int64()
                ),
            }
        )

    s = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("disc_cap", alias_name="disc_cap"),
        Sum("tax_cap", alias_name="tax_cap"),
        Sum("qty_cap", alias_name="qty_cap"),
        Sum("disc_vol", alias_name="disc_vol"),
    )
    names = ["disc_cap", "tax_cap", "qty_cap", "disc_vol"]
    return pa.table(
        {
            "policy": pa.array(names, pa.string()),
            "n_rows": pa.array([int(s["n"])] * 4, pa.int64()),
            "violations": pa.array([int(s[k]) for k in names], pa.int64()),
        }
    )


LINEITEM_POLICY_AUDIT_SQL = """
WITH a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_discount > 0.10 THEN 1 ELSE 0 END) AS BIGINT)
           AS disc_cap,
         CAST(SUM(CASE WHEN l_tax > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS tax_cap,
         CAST(SUM(CASE WHEN l_quantity > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
           AS qty_cap,
         CAST(SUM(CASE WHEN l_discount > 0.05 AND l_quantity < 10.0
                       THEN 1 ELSE 0 END) AS BIGINT) AS disc_vol
  FROM lineitem)
SELECT p.policy, a.n AS n_rows,
       CASE p.policy WHEN 'disc_cap' THEN disc_cap WHEN 'tax_cap' THEN tax_cap
                     WHEN 'qty_cap' THEN qty_cap ELSE disc_vol END AS violations
FROM a, (SELECT unnest(['disc_cap', 'tax_cap', 'qty_cap', 'disc_vol'])
           AS policy) p
ORDER BY CASE p.policy WHEN 'disc_cap' THEN 0 WHEN 'tax_cap' THEN 1
                       WHEN 'qty_cap' THEN 2 ELSE 3 END
"""


def docs_hapax_stats(sf_dir: str):
    """Lexical richness — hapax/dis legomena shares: how much of the
    vocabulary occurs exactly once / twice (a natural corpus runs ~50 %
    hapax; this synthetic 31-term soup runs ~0, which is the diagnostic).
    Term DF through the O(vocab) shuffle, one summary row."""
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

    g = (
        ds.map_batches(term_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = g["n"].to_numpy().astype(np.int64)
    vocab = len(n)
    hapax = int((n == 1).sum())
    dis = int((n == 2).sum())
    return pa.table(
        {
            "vocab": pa.array([vocab], pa.int64()),
            "total_tokens": pa.array([int(n.sum())], pa.int64()),
            "hapax": pa.array([hapax], pa.int64()),
            "dis": pa.array([dis], pa.int64()),
            "hapax_ppm": pa.array([hapax * 1_000_000 // vocab], pa.int64()),
        }
    )


DOCS_HAPAX_STATS_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks
      WHERE term <> '' GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS hapax_ppm
FROM c
"""


def events_entry_exit_matrix(sf_dir: str):
    """Entry/exit analysis — each user's FIRST and LAST event types paired
    into the (entry, exit) matrix (the landing-vs-leaving view session
    analytics draws as a chord diagram).  Per-user first/last via the
    sorted group kernel; the matrix is O(types²) cells."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        types = s["event_type"]
        return pa.table(
            {
                "entry_type": pa.array([str(types[0].as_py())], pa.string()),
                "exit_type": pa.array(
                    [str(types[s.num_rows - 1].as_py())], pa.string()
                ),
                "n": pa.array([1], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby(["entry_type", "exit_type"])
        .aggregate(Sum("n", alias_name="n_users"))
        .sort(["entry_type", "exit_type"])
    )


EVENTS_ENTRY_EXIT_MATRIX_SQL = """
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS cnt
  FROM events),
fe AS (SELECT user_id, event_type AS entry_type FROM s WHERE rn = 1),
le AS (SELECT user_id, event_type AS exit_type FROM s WHERE rn = cnt)
SELECT entry_type, exit_type, CAST(COUNT(*) AS BIGINT) AS n_users
FROM fe JOIN le USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_positional_length_profile(sf_dir: str):
    """Positional profile — mean token length by position decile within
    each document (template-generated text drifts by position; natural text
    doesn't): decile = (pos−1)·10 // len, cells from block partials, mean
    in exact milli-chars."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        words = flat.filter(pa.array(keep))
        par = parent[keep]
        if not len(par):
            return pa.table(
                {
                    "decile": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_len": pa.array([], pa.int64()),
                }
            )
        starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
        seg_id = np.cumsum(np.r_[0, (par[1:] != par[:-1]).astype(np.int64)])
        pos0 = np.arange(len(par), dtype=np.int64) - starts[seg_id]
        seg_len = np.bincount(seg_id).astype(np.int64)
        dec = pos0 * 10 // seg_len[seg_id]
        ln = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        return (
            pa.table(
                {
                    "decile": pa.array(dec, pa.int64()),
                    "n": pa.array(np.ones(len(dec), np.int64)),
                    "sum_len": pa.array(ln, pa.int64()),
                }
            )
            .group_by("decile")
            .aggregate([("n", "sum"), ("sum_len", "sum")])
            .rename_columns(["decile", "n", "sum_len"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_len", alias_name="sum_len"))
        .to_pandas()
        .sort_values("decile", kind="mergesort")
    )
    n = g["n"].to_numpy().astype(np.int64)
    sl = g["sum_len"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "decile": pa.array(g["decile"].to_numpy().astype(np.int64)),
            "n": pa.array(n, pa.int64()),
            "sum_len": pa.array(sl, pa.int64()),
            "mean_len_milli": pa.array(sl * 1000 // n, pa.int64()),
        }
    )


DOCS_POSITIONAL_LENGTH_PROFILE_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
f AS (
  SELECT unnest(l) AS term,
         CAST(unnest(range(0, len(l))) AS BIGINT) AS pos0,
         CAST(len(l) AS BIGINT) AS n_tok
  FROM d WHERE len(l) > 0),
c AS (SELECT pos0 * 10 // n_tok AS decile, length(term) AS ln FROM f)
SELECT CAST(decile AS BIGINT) AS decile, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ln) AS BIGINT) AS sum_len,
       CAST(SUM(ln) * 1000 // COUNT(*) AS BIGINT) AS mean_len_milli
FROM c GROUP BY 1 ORDER BY 1
"""


def events_midnight_sessions_ppm(sf_dir: str):
    """Day-boundary spillover — the share of sessions that CROSS midnight
    (whose daily-rollup double-counting a day-partitioned aggregate must
    handle): sessionize (30-min gap), session start/end epoch-days
    compared, one ppm row."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000

    def kernel(g: pa.Table) -> pa.Table:
        ts = np.sort(g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        brk = np.r_[True, np.diff(ts) > gap_us]
        starts = np.nonzero(brk)[0]
        ends = np.r_[starts[1:], len(ts)]
        d0 = ts[starts] // 86_400_000_000
        d1 = ts[ends - 1] // 86_400_000_000
        return pa.table(
            {
                "n_sessions": pa.array([len(starts)], pa.int64()),
                "crossing": pa.array([int((d0 != d1).sum())], pa.int64()),
            }
        )

    s = (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .aggregate(
            Sum("n_sessions", alias_name="n_sessions"),
            Sum("crossing", alias_name="crossing"),
        )
    )
    n, c = int(s["n_sessions"]), int(s["crossing"])
    return pa.table(
        {
            "n_sessions": pa.array([n], pa.int64()),
            "crossing": pa.array([c], pa.int64()),
            "crossing_ppm": pa.array([c * 1_000_000 // n], pa.int64()),
        }
    )


EVENTS_MIDNIGHT_SESSIONS_PPM_SQL = """
WITH x AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
y AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM x),
s AS (
  SELECT CASE WHEN epoch_us(MIN(ts)) // 86400000000
                   <> epoch_us(MAX(ts)) // 86400000000 THEN 1 ELSE 0 END AS x
  FROM y GROUP BY user_id, sess)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(x) AS BIGINT) AS crossing,
       CAST(SUM(x) * 1000000 // COUNT(*) AS BIGINT) AS crossing_ppm
FROM s
"""


def part_unit_price_dispersion(sf_dir: str):
    """Unit-price dispersion per part — the same SKU sold at wildly varying
    per-unit prices is a pricing-integrity smell: unit price in exact
    milli-cents via FLOOR((ext/qty)·1000 + 0.5) (one correctly-rounded
    double division, floored identically in both engines), per-part
    min/max through keyed extrema partials, top-20 by (spread desc,
    partkey)."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_partkey", "l_extendedprice", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        unit = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.divide(t["l_extendedprice"], t["l_quantity"]), 1000.0
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        )
        tb = pa.table(
            {
                "l_partkey": t["l_partkey"],
                "mn": unit,
                "mx": unit,
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by("l_partkey").aggregate(
            [("mn", "min"), ("mx", "max"), ("n", "sum")]
        ).rename_columns(["l_partkey", "mn", "mx", "n"])

    g = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(
            Min("mn", alias_name="min_unit_milli"),
            Max("mx", alias_name="max_unit_milli"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    g["spread_milli"] = g["max_unit_milli"] - g["min_unit_milli"]
    g = g.sort_values(
        ["spread_milli", "l_partkey"], ascending=[False, True], kind="mergesort"
    ).head(20)
    return pa.table(
        {
            "l_partkey": pa.array(g["l_partkey"].to_numpy().astype(np.int64)),
            "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            "min_unit_milli": pa.array(
                g["min_unit_milli"].to_numpy().astype(np.int64)
            ),
            "max_unit_milli": pa.array(
                g["max_unit_milli"].to_numpy().astype(np.int64)
            ),
            "spread_milli": pa.array(g["spread_milli"].to_numpy().astype(np.int64)),
        }
    )


PART_UNIT_PRICE_DISPERSION_SQL = """
WITH u AS (
  SELECT l_partkey,
         CAST(FLOOR(l_extendedprice / l_quantity * 1000 + 0.5) AS BIGINT)
           AS unit_milli
  FROM lineitem),
g AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(unit_milli) AS BIGINT) AS min_unit_milli,
         CAST(MAX(unit_milli) AS BIGINT) AS max_unit_milli
  FROM u GROUP BY 1)
SELECT l_partkey, n, min_unit_milli, max_unit_milli,
       CAST(max_unit_milli - min_unit_milli AS BIGINT) AS spread_milli
FROM g ORDER BY spread_milli DESC, l_partkey LIMIT 20
"""


def docs_gate_attrition(sf_dir: str):
    """Curation-funnel attrition — how many documents survive each
    SUCCESSIVE quality gate (length ≥ 200 chars → ≥ 30 tokens →
    distinct-token ratio ≥ 30 %): the staged-loss report a pipeline owner
    reads before tuning thresholds.  ONE tokenize pass computes all three
    signals; the funnel is four integers."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["n_chars", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        par = parent[keep]
        n_rows = t.num_rows
        n_tok = np.bincount(par, minlength=n_rows).astype(np.int64)
        # distinct tokens per doc: sort (doc, term-code) pairs and count runs
        words = flat.filter(pa.array(keep))
        codes = words.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((codes, par))
        sp, sc = par[order], codes[order]
        new_run = np.r_[True, (sp[1:] != sp[:-1]) | (sc[1:] != sc[:-1])]
        n_dist = np.bincount(sp[new_run], minlength=n_rows).astype(np.int64)
        chars = t["n_chars"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        g1 = chars >= 200
        g2 = g1 & (n_tok >= 30)
        g3 = g2 & (n_dist * 1_000_000 >= 300_000 * np.maximum(n_tok, 1))
        return pa.table(
            {
                "n0": pa.array([n_rows], pa.int64()),
                "n1": pa.array([int(g1.sum())], pa.int64()),
                "n2": pa.array([int(g2.sum())], pa.int64()),
                "n3": pa.array([int(g3.sum())], pa.int64()),
            }
        )

    s = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n0", alias_name="n0"),
        Sum("n1", alias_name="n1"),
        Sum("n2", alias_name="n2"),
        Sum("n3", alias_name="n3"),
    )
    stages = ["0-input", "1-min-chars", "2-min-tokens", "3-distinct-ratio"]
    vals = [int(s["n0"]), int(s["n1"]), int(s["n2"]), int(s["n3"])]
    return pa.table(
        {
            "stage": pa.array(stages, pa.string()),
            "n_surviving": pa.array(vals, pa.int64()),
        }
    )


DOCS_GATE_ATTRITION_SQL = """
WITH d AS (
  SELECT n_chars,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
m AS (
  SELECT n_chars, len(l) AS n_tok,
         len(list_distinct(l)) AS n_dist
  FROM d),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN n_chars >= 200 AND n_tok >= 30
                       THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN n_chars >= 200 AND n_tok >= 30
                        AND n_dist * 1000000 >= 300000 * GREATEST(n_tok, 1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM m)
SELECT p.stage,
       CASE p.stage WHEN '0-input' THEN n0 WHEN '1-min-chars' THEN n1
                    WHEN '2-min-tokens' THEN n2 ELSE n3 END AS n_surviving
FROM a, (SELECT unnest(['0-input', '1-min-chars', '2-min-tokens',
                        '3-distinct-ratio']) AS stage) p
ORDER BY p.stage
"""


def part_dual_sourcing_ppm(sf_dir: str):
    """Supply-chain resilience — what share of parts has ≥2 distinct
    suppliers on record (single-sourced parts are the risk register):
    block-local DISTINCT (part, supplier) partials → per-part distinct
    counts → one ppm row."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"pk": t["l_partkey"], "sk": t["l_suppkey"]})
            .group_by(["pk", "sk"])
            .aggregate([])
        )

    per_part = (
        li.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["pk", "sk"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: pa.table(
                {"pk": t["pk"], "n": pa.array(np.ones(t.num_rows, np.int64))}
            )
            .group_by("pk")
            .aggregate([("n", "sum")])
            .rename_columns(["pk", "n"]),
            batch_format="pyarrow",
        )
        .groupby("pk")
        .aggregate(Sum("n", alias_name="n_suppliers"))
    )

    def cells(t: pa.Table) -> pa.Table:
        n = t["n_suppliers"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_parts": pa.array([len(n)], pa.int64()),
                "multi": pa.array([int((n >= 2).sum())], pa.int64()),
            }
        )

    s = per_part.map_batches(cells, batch_format="pyarrow").aggregate(
        Sum("n_parts", alias_name="n_parts"), Sum("multi", alias_name="multi")
    )
    n, m = int(s["n_parts"]), int(s["multi"])
    return pa.table(
        {
            "n_parts": pa.array([n], pa.int64()),
            "multi_sourced": pa.array([m], pa.int64()),
            "multi_ppm": pa.array([m * 1_000_000 // n], pa.int64()),
        }
    )


PART_DUAL_SOURCING_PPM_SQL = """
WITH d AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
p AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS multi_sourced,
       CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS multi_ppm
FROM p
"""


def events_type_loyalty_ppm(sf_dir: str):
    """Type loyalty — share of users whose MODAL event type covers at least
    half their events (the habit-formation metric): per-user (max type
    count, total) from one keyed reduction over (user, type) cells; the
    gate is the integer 2·max ≥ total."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "user_id": t["user_id"],
                "typ": t["event_type"],
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return tb.group_by(["user_id", "typ"]).aggregate([("n", "sum")]).rename_columns(
            ["user_id", "typ", "n"]
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "typ"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def per_user(g: pa.Table) -> pa.Table:
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "users": pa.array([1], pa.int64()),
                "loyal": pa.array([int(2 * int(n.max()) >= int(n.sum()))], pa.int64()),
            }
        )

    s = (
        cells.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .aggregate(Sum("users", alias_name="users"), Sum("loyal", alias_name="loyal"))
    )
    u, l = int(s["users"]), int(s["loyal"])
    return pa.table(
        {
            "n_users": pa.array([u], pa.int64()),
            "loyal_users": pa.array([l], pa.int64()),
            "loyal_ppm": pa.array([l * 1_000_000 // u], pa.int64()),
        }
    )


EVENTS_TYPE_LOYALTY_PPM_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
u AS (
  SELECT user_id,
         CASE WHEN 2 * MAX(n) >= SUM(n) THEN 1 ELSE 0 END AS loyal
  FROM c GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(loyal) AS BIGINT) AS loyal_users,
       CAST(SUM(loyal) * 1000000 // COUNT(*) AS BIGINT) AS loyal_ppm
FROM u
"""


def orders_freshness_panel(sf_dir: str):
    """Data-freshness SLO panel — the staleness card an ingestion monitor
    shows: the newest order's epoch-day plus row counts in the trailing 30
    and 90 days relative to it.  Max via partials, then one pruned counting
    pass; all integers."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])
    mx = int(
        ds.map_batches(
            lambda t: pa.table({"d": t["o_orderdate"].cast(pa.int64())}),
            batch_format="pyarrow",
        ).max("d")
    )
    max_day = mx // 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        return pa.table(
            {
                "n30": pa.array([int((day > max_day - 30).sum())], pa.int64()),
                "n90": pa.array([int((day > max_day - 90).sum())], pa.int64()),
                "n": pa.array([len(day)], pa.int64()),
            }
        )

    s = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n30", alias_name="n30"),
        Sum("n90", alias_name="n90"),
        Sum("n", alias_name="n"),
    )
    return pa.table(
        {
            "max_day_epoch": pa.array([max_day], pa.int64()),
            "n_total": pa.array([int(s["n"])], pa.int64()),
            "n_last30": pa.array([int(s["n30"])], pa.int64()),
            "n_last90": pa.array([int(s["n90"])], pa.int64()),
        }
    )


ORDERS_FRESHNESS_PANEL_SQL = """
WITH m AS (SELECT MAX(epoch_us(o_orderdate)) // 86400000000 AS max_day FROM orders)
SELECT CAST(max_day AS BIGINT) AS max_day_epoch,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN epoch_us(o_orderdate) // 86400000000 > max_day - 30
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_last30,
       CAST(SUM(CASE WHEN epoch_us(o_orderdate) // 86400000000 > max_day - 90
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_last90
FROM orders, m GROUP BY max_day
"""


def docs_source_exclusive_vocab(sf_dir: str):
    """Vocabulary ownership — per source, how many terms appear in THAT
    source and NOWHERE else (the exclusive-content signal source weighting
    keys on): distinct (source, term) pairs via block partials; terms with
    source-degree 1 attribute to their sole owner.  Sources with zero
    exclusive terms still report (the common case in this shared-vocab
    corpus — that IS the finding)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col)
        src = pc.take(t["source"], parent)
        tb = pa.table({"source": src, "term": flat}).filter(
            pc.and_(pc.is_valid(flat), pc.not_equal(flat, ""))
        )
        return tb.group_by(["source", "term"]).aggregate([])

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    deg = pairs.groupby("term")["source"].nunique()
    exclusive_terms = set(deg[deg == 1].index)
    own = (
        pairs[pairs.term.isin(exclusive_terms)]
        .groupby("source")
        .size()
        .to_dict()
    )
    sources = sorted(pairs.source.unique())
    return pa.table(
        {
            "source": pa.array(sources, pa.string()),
            "n_exclusive_terms": pa.array(
                [int(own.get(s, 0)) for s in sources], pa.int64()
            ),
        }
    )


DOCS_SOURCE_EXCLUSIVE_VOCAB_SQL = """
WITH p AS (
  SELECT DISTINCT source, term
  FROM (SELECT source,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        FROM documents)
  WHERE term <> ''),
d AS (SELECT term, COUNT(*) AS deg FROM p GROUP BY 1),
e AS (SELECT p.source, COUNT(*) AS n FROM p JOIN d USING (term)
      WHERE deg = 1 GROUP BY 1),
s AS (SELECT DISTINCT source FROM p)
SELECT s.source, CAST(COALESCE(e.n, 0) AS BIGINT) AS n_exclusive_terms
FROM s LEFT JOIN e USING (source)
ORDER BY s.source
"""


def orders_backlog_by_month(sf_dir: str):
    """Shipping backlog timeline — end-of-month open orders: cumulative
    orders placed minus cumulative orders FIRST-shipped, on the union month
    grid.  Two independent O(months) cell reductions (order months; per-
    order MIN-ship months via keyed extrema) folded on the driver — the
    running-difference inventory identity, exact integers."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def ord_cells(t: pa.Table) -> pa.Table:
        ym = pc.add(
            pc.multiply(pc.year(t["o_orderdate"]).cast(pa.int64()), 100),
            pc.month(t["o_orderdate"]).cast(pa.int64()),
        )
        return (
            pa.table({"ym": ym, "n": pa.array(np.ones(t.num_rows, np.int64))})
            .group_by("ym")
            .aggregate([("n", "sum")])
            .rename_columns(["ym", "n"])
        )

    placed = (
        orders.map_batches(ord_cells, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("n", alias_name="n_placed"))
        .to_pandas()
    )

    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])

    def first_ship(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "ok": t["l_orderkey"],
                    "d": t["l_shipdate"].cast(pa.int64()),
                }
            )
            .group_by("ok")
            .aggregate([("d", "min")])
            .rename_columns(["ok", "d"])
        )

    def ship_cells(t: pa.Table) -> pa.Table:
        us = t["first_us"].combine_chunks().to_numpy(zero_copy_only=False)
        mi = (us // 86_400_000_000).astype("datetime64[D]").astype(
            "datetime64[M]"
        ).astype(np.int64)
        ym = (1970 + mi // 12) * 100 + (mi % 12 + 1)
        return (
            pa.table(
                {
                    "ym": pa.array(ym, pa.int64()),
                    "n": pa.array(np.ones(len(ym), np.int64)),
                }
            )
            .group_by("ym")
            .aggregate([("n", "sum")])
            .rename_columns(["ym", "n"])
        )

    shipped = (
        li.map_batches(first_ship, batch_format="pyarrow")
        .groupby("ok")
        .aggregate(Min("d", alias_name="first_us"))
        .map_batches(ship_cells, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("n", alias_name="n_shipped"))
        .to_pandas()
    )

    import pandas as pd

    grid = sorted(set(placed.ym.astype(int)) | set(shipped.ym.astype(int)))
    pl = dict(zip(placed.ym.astype(int), placed.n_placed.astype(int)))
    sh = dict(zip(shipped.ym.astype(int), shipped.n_shipped.astype(int)))
    cp = cs = 0
    rows = []
    for ym in grid:
        cp += pl.get(ym, 0)
        cs += sh.get(ym, 0)
        rows.append((ym, cp, cs, cp - cs))
    return pa.table(
        {
            "ym": pa.array([r[0] for r in rows], pa.int64()),
            "cum_placed": pa.array([r[1] for r in rows], pa.int64()),
            "cum_shipped": pa.array([r[2] for r in rows], pa.int64()),
            "backlog": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


ORDERS_BACKLOG_BY_MONTH_SQL = """
WITH p AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
         CAST(COUNT(*) AS BIGINT) AS n_placed
  FROM orders GROUP BY 1),
fs AS (
  SELECT l_orderkey, MIN(l_shipdate) AS d FROM lineitem GROUP BY 1),
s AS (
  SELECT CAST(EXTRACT(year FROM d) * 100 + EXTRACT(month FROM d) AS BIGINT) AS ym,
         CAST(COUNT(*) AS BIGINT) AS n_shipped
  FROM fs GROUP BY 1),
g AS (SELECT ym FROM p UNION SELECT ym FROM s),
j AS (
  SELECT g.ym, COALESCE(p.n_placed, 0) AS np, COALESCE(s.n_shipped, 0) AS ns
  FROM g LEFT JOIN p USING (ym) LEFT JOIN s USING (ym))
SELECT ym,
       CAST(SUM(np) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_placed,
       CAST(SUM(ns) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_shipped,
       CAST(SUM(np) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING)
            - SUM(ns) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS backlog
FROM j ORDER BY ym
"""


def orders_price_mode_exact(sf_dir: str):
    """Distributed EXACT mode of a high-cardinality column — the shape that
    defeats per-block top-1 shortcuts (a block's mode is NOT a candidate
    set for the global mode): full (value, count) cells at value
    cardinality, then the global max count via a second aggregate pass and
    an equality filter with the min-value tie rule — the mode never touches
    the driver until it is one row."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"])
        return (
            pa.table({"cents": c, "n": pa.array(np.ones(t.num_rows, np.int64))})
            .group_by("cents")
            .aggregate([("n", "sum")])
            .rename_columns(["cents", "n"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    top = int(cells.max("n"))
    n_distinct = cells.count()
    mode = int(
        cells.map_batches(
            lambda t: t.filter(pc.equal(t["n"], top)), batch_format="pyarrow"
        ).min("cents")
    )
    return pa.table(
        {
            "mode_cents": pa.array([mode], pa.int64()),
            "mode_count": pa.array([top], pa.int64()),
            "n_distinct": pa.array([n_distinct], pa.int64()),
        }
    )


ORDERS_PRICE_MODE_EXACT_SQL = """
WITH c AS (
  SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1),
m AS (SELECT MAX(n) AS top FROM c)
SELECT CAST((SELECT MIN(cents) FROM c, m WHERE n = top) AS BIGINT) AS mode_cents,
       CAST((SELECT top FROM m) AS BIGINT) AS mode_count,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_distinct
"""


def events_value_gmd(sf_dir: str):
    """Gini mean difference per type — the mean |pairwise difference|
    dispersion (more robust than variance, more efficient than MAD),
    computed WITHOUT the quadratic pair sum via the sorted identity
    Σ_{i<j}(x_j − x_i) = Σ_i (2i − n + 1)·x_(i) (0-based): one group sort,
    one dot product, all exact int64; gmd_milli = 2000·Σ // (n·(n−1))."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])

    def kernel(g: pa.Table) -> pa.Table:
        c = np.sort(_cents(g["value"]).to_numpy(zero_copy_only=False))
        n = len(c)
        if n < 2:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sum_absdiff_cents": pa.array([], pa.int64()),
                    "gmd_milli": pa.array([], pa.int64()),
                }
            )
        i = np.arange(n, dtype=np.int64)
        total = int(((2 * i - n + 1) * c).sum())
        return pa.table(
            {
                "event_type": pa.array([str(g["event_type"][0].as_py())], pa.string()),
                "n": pa.array([n], pa.int64()),
                "sum_absdiff_cents": pa.array([total], pa.int64()),
                "gmd_milli": pa.array(
                    [total * 2000 // (n * (n - 1))], pa.int64()
                ),
            }
        )

    return (
        ds.groupby("event_type")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["event_type"])
    )


EVENTS_VALUE_GMD_SQL = """
WITH c AS (
  SELECT event_type, CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c),
a AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM((2 * (rn - 1) - n + 1) * cents) AS BIGINT)
           AS sum_absdiff_cents
  FROM r GROUP BY 1)
SELECT event_type, n, sum_absdiff_cents,
       CAST(sum_absdiff_cents * 2000 // (n * (n - 1)) AS BIGINT) AS gmd_milli
FROM a WHERE n >= 2 ORDER BY event_type
"""


def events_type_hot_streak(sf_dir: str):
    """Hot-streak length per type — the longest run of consecutive
    above-type-median values in (ts, event_id) order: the momentum
    statistic a monitoring rule keys on.  Per-type group kernel: one sort,
    a boolean run-length via the cumsum-of-breaks trick, exact integers."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "ts", "value"]
    )

    def kernel(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        c = _cents(s["value"]).to_numpy(zero_copy_only=False)
        med = int(np.sort(c)[(len(c) - 1) // 2])
        hot = c > med
        # run ids: cumsum of value changes; max run among hot runs
        run_id = np.cumsum(np.r_[0, hot[1:] != hot[:-1]])
        lengths = np.bincount(run_id[hot]) if hot.any() else np.array([0])
        return pa.table(
            {
                "event_type": pa.array([str(s["event_type"][0].as_py())], pa.string()),
                "n": pa.array([len(c)], pa.int64()),
                "median_cents": pa.array([med], pa.int64()),
                "max_hot_streak": pa.array([int(lengths.max())], pa.int64()),
            }
        )

    return (
        ds.groupby("event_type")
        .map_groups(kernel, batch_format="pyarrow")
        .sort(["event_type"])
    )


EVENTS_TYPE_HOT_STREAK_SQL = """
WITH c AS (
  SELECT event_type, event_id, ts,
         CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cents
  FROM events),
m AS (SELECT event_type, CAST(quantile_disc(cents, 0.5) AS BIGINT) AS med,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM c GROUP BY 1),
h AS (
  SELECT c.event_type, med, n, ts, event_id,
         CASE WHEN cents > med THEN 1 ELSE 0 END AS hot,
         CASE WHEN (cents > med) <> COALESCE(
                lag(cents > med) OVER (
                  PARTITION BY c.event_type ORDER BY ts, event_id),
                NOT (cents > med))
              THEN 1 ELSE 0 END AS brk
  FROM c JOIN m USING (event_type)),
r AS (
  SELECT event_type, med, n, hot,
         SUM(brk) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM h),
runs AS (SELECT event_type, med, n, run_id, COUNT(*) AS len
         FROM r WHERE hot = 1 GROUP BY 1, 2, 3, 4)
SELECT m.event_type, m.n, m.med AS median_cents,
       CAST(COALESCE(x.mx, 0) AS BIGINT) AS max_hot_streak
FROM m LEFT JOIN (SELECT event_type, MAX(len) AS mx FROM runs GROUP BY 1) x
       USING (event_type)
ORDER BY m.event_type
"""


def customer_value_activity_quadrants(sf_dir: str):
    """Quadrant segmentation — customers split by (median account balance ×
    median order count) into the classic 2×2: the 'high-value dormant'
    cell is the campaign target.  Order counts via keyed partials joined
    to the customer dim (8 partitions); both medians are lower-convention
    over the O(customers) narrow table; quadrant counts exact."""
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_acctbal"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])

    def cnt(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {"ck": t["o_custkey"], "n": pa.array(np.ones(t.num_rows, np.int64))}
            )
            .group_by("ck")
            .aggregate([("n", "sum")])
            .rename_columns(["ck", "n"])
        )

    per_cust = (
        orders.map_batches(cnt, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("n", alias_name="n_orders"))
    )
    joined = cust.join(
        per_cust, join_type="left_outer", num_partitions=8, on=("c_custkey",), right_on=("ck",)
    ).map_batches(
        lambda t: pa.table(
            {
                "bal": _cents(t["c_acctbal"]),
                "n_orders": pc.coalesce(t["n_orders"], pa.scalar(0, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    pdf = joined.to_pandas()
    bal = np.sort(pdf.bal.to_numpy())
    cnt_v = np.sort(pdf.n_orders.to_numpy())
    med_bal = int(bal[(len(bal) - 1) // 2])
    med_cnt = int(cnt_v[(len(cnt_v) - 1) // 2])
    hb = pdf.bal.to_numpy() > med_bal
    ha = pdf.n_orders.to_numpy() > med_cnt
    labels = ["hi_bal_hi_act", "hi_bal_lo_act", "lo_bal_hi_act", "lo_bal_lo_act"]
    counts = [
        int((hb & ha).sum()),
        int((hb & ~ha).sum()),
        int((~hb & ha).sum()),
        int((~hb & ~ha).sum()),
    ]
    return pa.table(
        {
            "quadrant": pa.array(labels, pa.string()),
            "n_customers": pa.array(counts, pa.int64()),
        }
    )


CUSTOMER_VALUE_ACTIVITY_QUADRANTS_SQL = """
WITH oc AS (SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1),
j AS (
  SELECT CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS bal,
         COALESCE(oc.n_orders, 0) AS n_orders
  FROM customer LEFT JOIN oc ON c_custkey = oc.ck),
m AS (SELECT CAST(quantile_disc(bal, 0.5) AS BIGINT) AS med_bal,
             CAST(quantile_disc(n_orders, 0.5) AS BIGINT) AS med_cnt
      FROM j),
q AS (
  SELECT CASE WHEN bal > med_bal AND n_orders > med_cnt THEN 'hi_bal_hi_act'
              WHEN bal > med_bal THEN 'hi_bal_lo_act'
              WHEN n_orders > med_cnt THEN 'lo_bal_hi_act'
              ELSE 'lo_bal_lo_act' END AS quadrant
  FROM j, m)
SELECT g.quadrant, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_customers
FROM (SELECT unnest(['hi_bal_hi_act', 'hi_bal_lo_act', 'lo_bal_hi_act',
                     'lo_bal_lo_act']) AS quadrant) g
LEFT JOIN (SELECT quadrant, COUNT(*) AS n FROM q GROUP BY 1) c
       USING (quadrant)
ORDER BY g.quadrant
"""


def events_coldstart_share(sf_dir: str):
    """Cold-start exposure — the share of traffic coming from users still
    in their first 5 events (the personalization-can't-help-yet slice):
    per-user (ts, event_id)-order ranks from the group sort; two integers
    out, ppm exact."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def kernel(g: pa.Table) -> pa.Table:
        n = g.num_rows
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "cold": pa.array([min(n, 5)], pa.int64()),
            }
        )

    s = (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .aggregate(Sum("n", alias_name="n"), Sum("cold", alias_name="cold"))
    )
    n, c = int(s["n"]), int(s["cold"])
    return pa.table(
        {
            "n_events": pa.array([n], pa.int64()),
            "coldstart_events": pa.array([c], pa.int64()),
            "coldstart_ppm": pa.array([c * 1_000_000 // n], pa.int64()),
        }
    )


EVENTS_COLDSTART_SHARE_SQL = """
WITH r AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS coldstart_events,
       CAST(SUM(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS coldstart_ppm
FROM r
"""


def orders_total_reconstruction_audit(sf_dir: str):
    """Invoice-total reconstruction — the reference's own reconciliation
    shape (≙ amount-tolerance matching, reconciliationEngine.js): rebuild
    each order's total as Σ FLOOR(extprice·(1+tax)·(1−discount)·100+0.5)
    over its lines and band the deviation from o_totalprice (exact / within
    a dollar / beyond).  Per-order line sums ship through the 8-partition
    join; every comparison is integer cents (both engines evaluate the
    identical float formula before the one floor)."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_tax", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        line = _cents(
            pc.multiply(
                pc.multiply(t["l_extendedprice"], pc.add(1.0, t["l_tax"])),
                pc.subtract(1.0, t["l_discount"]),
            )
        )
        return (
            pa.table({"l_orderkey": t["l_orderkey"], "c": line})
            .group_by("l_orderkey")
            .aggregate([("c", "sum")])
            .rename_columns(["l_orderkey", "c"])
        )

    per_order = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("c", alias_name="recon_cents"))
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])
    joined = per_order.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def bands(t: pa.Table) -> pa.Table:
        rec = t["recon_cents"].combine_chunks().to_numpy(zero_copy_only=False)
        tot = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        dev = np.abs(rec - tot)
        return pa.table(
            {
                "n": pa.array([len(dev)], pa.int64()),
                "exact": pa.array([int((dev == 0).sum())], pa.int64()),
                "within_dollar": pa.array(
                    [int(((dev > 0) & (dev <= 100)).sum())], pa.int64()
                ),
                "beyond": pa.array([int((dev > 100).sum())], pa.int64()),
            }
        )

    s = joined.map_batches(bands, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Sum("exact", alias_name="exact"),
        Sum("within_dollar", alias_name="within_dollar"),
        Sum("beyond", alias_name="beyond"),
    )
    return pa.table(
        {
            "n_orders": pa.array([int(s["n"])], pa.int64()),
            "exact": pa.array([int(s["exact"])], pa.int64()),
            "within_dollar": pa.array([int(s["within_dollar"])], pa.int64()),
            "beyond": pa.array([int(s["beyond"])], pa.int64()),
        }
    )


ORDERS_TOTAL_RECONSTRUCTION_AUDIT_SQL = """
WITH p AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(FLOOR(l_extendedprice*(1+l_tax)*(1-l_discount)*100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS recon_cents
  FROM lineitem GROUP BY 1),
j AS (
  SELECT ABS(recon_cents - CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS dev
  FROM p JOIN orders ON l_orderkey = o_orderkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN dev = 0 THEN 1 ELSE 0 END) AS BIGINT) AS exact,
       CAST(SUM(CASE WHEN dev > 0 AND dev <= 100 THEN 1 ELSE 0 END) AS BIGINT)
         AS within_dollar,
       CAST(SUM(CASE WHEN dev > 100 THEN 1 ELSE 0 END) AS BIGINT) AS beyond
FROM j
"""


def docs_positional_mode(sf_dir: str):
    """Template-skeleton extraction — the MODAL token at each of the first
    10 positions across all documents (boilerplate headers surface as
    high-share positional modes): (position, term) cells from the lockstep
    parent/offset arithmetic, per-position argmax (count desc, term asc)
    with its ppm share of documents long enough to have that position."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
            zero_copy_only=False
        )
        words = flat.filter(pa.array(keep))
        par = parent[keep]
        if not len(par):
            return pa.table(
                {
                    "pos": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        starts = np.flatnonzero(np.r_[True, par[1:] != par[:-1]])
        seg_id = np.cumsum(np.r_[0, (par[1:] != par[:-1]).astype(np.int64)])
        pos = np.arange(len(par), dtype=np.int64) - starts[seg_id] + 1
        sel = pos <= 10
        return (
            pa.table(
                {
                    "pos": pa.array(pos[sel], pa.int64()),
                    "term": words.filter(pa.array(sel)),
                    "n": pa.array(np.ones(int(sel.sum()), np.int64)),
                }
            )
            .group_by(["pos", "term"])
            .aggregate([("n", "sum")])
            .rename_columns(["pos", "term", "n"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pos", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for pos, sub in g.groupby("pos", sort=True):
        total = int(sub.n.sum())
        sub = sub.sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
        top = sub.iloc[0]
        rows.append((int(pos), str(top.term), int(top.n), int(top.n) * 1_000_000 // total))
    return pa.table(
        {
            "pos": pa.array([r[0] for r in rows], pa.int64()),
            "top_term": pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
            "share_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


DOCS_POSITIONAL_MODE_SQL = """
WITH d AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
f AS (
  SELECT unnest(l) AS term,
         CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM d),
c AS (SELECT pos, term, CAST(COUNT(*) AS BIGINT) AS n
      FROM f WHERE pos <= 10 GROUP BY 1, 2),
t AS (SELECT pos, SUM(n) AS total FROM c GROUP BY 1),
r AS (SELECT pos, term, n,
             ROW_NUMBER() OVER (PARTITION BY pos ORDER BY n DESC, term) AS rk
      FROM c)
SELECT r.pos, r.term AS top_term, r.n,
       CAST(r.n * 1000000 // t.total AS BIGINT) AS share_ppm
FROM r JOIN t USING (pos) WHERE rk = 1
ORDER BY r.pos
"""


def events_lifecycle_stages(sf_dir: str):
    """User lifecycle segmentation at the corpus max-ts as-of: new (first
    event within 7 days), active (last event within 7 days, not new),
    at-risk (idle 7–14 days), churned (idle > 14 days) — the four-stage
    funnel a growth team tracks weekly.  Per-user first/last from keyed
    extrema; stage gates are integer day comparisons."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    mx = int(
        ds.map_batches(
            lambda t: pa.table({"d": t["ts"].cast(pa.int64())}),
            batch_format="pyarrow",
        ).max("d")
    )
    max_day = mx // 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        d = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        return (
            pa.table(
                {"user_id": t["user_id"], "f": pa.array(d, pa.int64()), "l": pa.array(d, pa.int64())}
            )
            .group_by("user_id")
            .aggregate([("f", "min"), ("l", "max")])
            .rename_columns(["user_id", "f", "l"])
        )

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("f", alias_name="first_day"), Max("l", alias_name="last_day"))
        .to_pandas()
    )
    f = per_user.first_day.to_numpy().astype(np.int64)
    l = per_user.last_day.to_numpy().astype(np.int64)
    new = max_day - f <= 7
    active = (~new) & (max_day - l <= 7)
    at_risk = (~new) & (~active) & (max_day - l <= 14)
    churned = (~new) & (~active) & (~at_risk)
    return pa.table(
        {
            "stage": pa.array(["1-new", "2-active", "3-at-risk", "4-churned"], pa.string()),
            "n_users": pa.array(
                [int(new.sum()), int(active.sum()), int(at_risk.sum()), int(churned.sum())],
                pa.int64(),
            ),
        }
    )


EVENTS_LIFECYCLE_STAGES_SQL = """
WITH m AS (SELECT MAX(epoch_us(ts)) // 86400000000 AS max_day FROM events),
u AS (
  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS f,
         MAX(epoch_us(ts) // 86400000000) AS l
  FROM events GROUP BY 1),
s AS (
  SELECT CASE WHEN max_day - f <= 7 THEN '1-new'
              WHEN max_day - l <= 7 THEN '2-active'
              WHEN max_day - l <= 14 THEN '3-at-risk'
              ELSE '4-churned' END AS stage
  FROM u, m)
SELECT g.stage, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_users
FROM (SELECT unnest(['1-new', '2-active', '3-at-risk', '4-churned']) AS stage) g
LEFT JOIN (SELECT stage, COUNT(*) AS n FROM s GROUP BY 1) c USING (stage)
ORDER BY g.stage
"""


def customer_years_active_hist(sf_dir: str):
    """Loyalty-tier histogram — distinct ORDER years per customer bucketed
    into tiers (how many customers bought in 1, 2, … N distinct years):
    block-local DISTINCT (customer, year) partials → per-customer distinct
    counts → O(max years) histogram."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def pairs(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "ck": t["o_custkey"],
                    "yr": pc.year(t["o_orderdate"]).cast(pa.int64()),
                }
            )
            .group_by(["ck", "yr"])
            .aggregate([])
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["ck", "yr"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda t: pa.table(
                {"ck": t["ck"], "n": pa.array(np.ones(t.num_rows, np.int64))}
            )
            .group_by("ck")
            .aggregate([("n", "sum")])
            .rename_columns(["ck", "n"]),
            batch_format="pyarrow",
        )
        .groupby("ck")
        .aggregate(Sum("n", alias_name="years_active"))
        .map_batches(
            lambda t: pa.table(
                {
                    "years_active": t["years_active"],
                    "c": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by("years_active")
            .aggregate([("c", "sum")])
            .rename_columns(["years_active", "c"]),
            batch_format="pyarrow",
        )
        .groupby("years_active")
        .aggregate(Sum("c", alias_name="n_customers"))
        .sort(["years_active"])
    )


CUSTOMER_YEARS_ACTIVE_HIST_SQL = """
WITH p AS (
  SELECT DISTINCT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr
  FROM orders),
c AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS years_active
      FROM p GROUP BY 1)
SELECT years_active, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM c GROUP BY 1 ORDER BY 1
"""


def customer_same_day_multi_orders(sf_dir: str):
    """Burst-purchase screen — (customer, day) cells with ≥2 orders, per
    year: the split-shipment / double-submit smell.  Cells via block
    partials; the multi-cell filter and year rollup fold exactly."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        return (
            pa.table(
                {
                    "ck": t["o_custkey"],
                    "day": pa.array(d, pa.int64()),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by(["ck", "day"])
            .aggregate([("n", "sum")])
            .rename_columns(["ck", "day", "n"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["ck", "day"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def year_cells(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater_equal(t["n"], 2))
        day = f["day"].combine_chunks().to_numpy(zero_copy_only=False)
        yr = (
            1970
            + day.astype("datetime64[D]").astype("datetime64[Y]").astype(np.int64)
        )
        n = f["n"].combine_chunks().to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "yr": pa.array(yr, pa.int64()),
                    "cells": pa.array(np.ones(len(yr), np.int64)),
                    "orders": pa.array(n, pa.int64()),
                }
            )
            .group_by("yr")
            .aggregate([("cells", "sum"), ("orders", "sum")])
            .rename_columns(["yr", "cells", "orders"])
        )

    return (
        cells.map_batches(year_cells, batch_format="pyarrow")
        .groupby("yr")
        .aggregate(
            Sum("cells", alias_name="multi_day_cells"),
            Sum("orders", alias_name="orders_involved"),
        )
        .sort(["yr"])
    )


CUSTOMER_SAME_DAY_MULTI_ORDERS_SQL = """
WITH c AS (
  SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS dy,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2, 3)
SELECT yr, CAST(COUNT(*) AS BIGINT) AS multi_day_cells,
       CAST(SUM(n) AS BIGINT) AS orders_involved
FROM c WHERE n >= 2 GROUP BY 1 ORDER BY 1
"""


def docs_numeric_token_share(sf_dir: str):
    """Numeric contamination per source — the ppm of tokens that are PURE
    digit strings (tables/ids leaking into prose corrupt LM training):
    one regex-class test over the flattened token stream, per-source
    cells, exact ppm."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col)
        src = pc.take(t["source"], parent)
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, ""))
        words = flat.filter(keep)
        srcs = src.filter(keep)
        numeric = pc.cast(
            pc.match_substring_regex(words, r"^[0-9]+$"), pa.int64()
        )
        return (
            pa.table(
                {
                    "source": srcs,
                    "n": pa.array(np.ones(len(words), np.int64)),
                    "num": numeric,
                }
            )
            .group_by("source")
            .aggregate([("n", "sum"), ("num", "sum")])
            .rename_columns(["source", "n", "num"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_tokens"), Sum("num", alias_name="numeric_tokens"))
        .to_pandas()
        .sort_values("source", kind="mergesort")
    )
    n = g["n_tokens"].to_numpy().astype(np.int64)
    m = g["numeric_tokens"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "source": pa.array(g["source"].tolist(), pa.string()),
            "n_tokens": pa.array(n, pa.int64()),
            "numeric_tokens": pa.array(m, pa.int64()),
            "numeric_ppm": pa.array(m * 1_000_000 // n, pa.int64()),
        }
    )


DOCS_NUMERIC_TOKEN_SHARE_SQL = """
WITH tk AS (
  SELECT source,
         unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
f AS (SELECT source, term FROM tk WHERE term <> '')
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN regexp_matches(term, '^[0-9]+$') THEN 1 ELSE 0 END)
            AS BIGINT) AS numeric_tokens,
       CAST(SUM(CASE WHEN regexp_matches(term, '^[0-9]+$') THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS numeric_ppm
FROM f GROUP BY 1 ORDER BY 1
"""


def embeddings_label_nearest(sf_dir: str):
    """Cluster-confusion candidates — each label's NEAREST other label by
    exact centroid distance (the pair a taxonomist reviews first):
    composes the rational-arithmetic centroid-distance matrix
    (embeddings_centroid_distances) with a per-label argmin (d² asc,
    neighbor asc) on the O(labels²) table."""
    dist = embeddings_centroid_distances(sf_dir).to_pandas()
    both = np.concatenate(
        [
            dist[["label_a", "label_b", "d2_mu2"]].to_numpy(),
            dist[["label_b", "label_a", "d2_mu2"]].to_numpy(),
        ]
    )
    rows = {}
    for a, b, d2 in both:
        a, b, d2 = int(a), int(b), int(d2)
        cur = rows.get(a)
        if cur is None or (d2, b) < cur:
            rows[a] = (d2, b)
    labels = sorted(rows)
    return pa.table(
        {
            "label": pa.array(labels, pa.int64()),
            "nearest_label": pa.array([rows[k][1] for k in labels], pa.int64()),
            "d2_mu2": pa.array([rows[k][0] for k in labels], pa.int64()),
        }
    )


EMBEDDINGS_LABEL_NEAREST_SQL = """
WITH e AS (
  SELECT label, unnest(embedding) AS x,
         unnest(range(0, len(embedding))) AS dim
  FROM embeddings),
c AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
         CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_uv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY 1, 2),
p AS (
  SELECT a.label AS la, b.label AS lb,
         CAST(SUM((CAST(a.sum_uv AS HUGEINT) * b.n - CAST(b.sum_uv AS HUGEINT) * a.n)
                  * (CAST(a.sum_uv AS HUGEINT) * b.n - CAST(b.sum_uv AS HUGEINT) * a.n)
                  // (CAST(a.n AS HUGEINT) * a.n * b.n * b.n)) AS BIGINT) AS d2
  FROM c a JOIN c b ON a.dim = b.dim AND a.label <> b.label
  GROUP BY 1, 2),
r AS (SELECT la, lb, d2,
             ROW_NUMBER() OVER (PARTITION BY la ORDER BY d2, lb) AS rk
      FROM p)
SELECT la AS label, lb AS nearest_label, d2 AS d2_mu2
FROM r WHERE rk = 1 ORDER BY la
"""


def lineitem_returns_by_ship_lag(sf_dir: str):
    """Does late shipping drive returns?  Return rate by order-to-ship lag
    bucket (≤30 / 31–60 / 61+ days): per-line lag through the 8-partition
    join, three-bucket cells, exact ppm — the causal-screening crosstab a
    fulfillment postmortem starts from."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate", "l_returnflag"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ship_day": pa.array(
                    t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                    // 86_400_000_000,
                    pa.int64(),
                ),
                "ret": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64()),
            }
        )

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    joined = li.map_batches(prep, batch_format="pyarrow").join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def cells(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        lag = t["ship_day"].combine_chunks().to_numpy(zero_copy_only=False) - od
        bucket = np.select([lag <= 30, lag <= 60], [0, 1], default=2)
        ret = t["ret"].combine_chunks().to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "bucket_ix": pa.array(bucket.astype(np.int64), pa.int64()),
                    "n": pa.array(np.ones(len(lag), np.int64)),
                    "ret": pa.array(ret, pa.int64()),
                }
            )
            .group_by("bucket_ix")
            .aggregate([("n", "sum"), ("ret", "sum")])
            .rename_columns(["bucket_ix", "n", "ret"])
        )

    g = (
        joined.map_batches(cells, batch_format="pyarrow")
        .groupby("bucket_ix")
        .aggregate(Sum("n", alias_name="n_lines"), Sum("ret", alias_name="n_returned"))
        .to_pandas()
        .sort_values("bucket_ix", kind="mergesort")
    )
    labels = {0: "0-30d", 1: "31-60d", 2: "61d+"}
    n = g["n_lines"].to_numpy().astype(np.int64)
    r = g["n_returned"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "lag_bucket": pa.array(
                [labels[int(i)] for i in g["bucket_ix"]], pa.string()
            ),
            "n_lines": pa.array(n, pa.int64()),
            "n_returned": pa.array(r, pa.int64()),
            "return_ppm": pa.array(r * 1_000_000 // n, pa.int64()),
        }
    )


LINEITEM_RETURNS_BY_SHIP_LAG_SQL = """
WITH j AS (
  SELECT CASE
           WHEN epoch_us(l_shipdate) // 86400000000
                - epoch_us(o_orderdate) // 86400000000 <= 30 THEN '0-30d'
           WHEN epoch_us(l_shipdate) // 86400000000
                - epoch_us(o_orderdate) // 86400000000 <= 60 THEN '31-60d'
           ELSE '61d+' END AS lag_bucket,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT lag_bucket, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(ret) AS BIGINT) AS n_returned,
       CAST(SUM(ret) * 1000000 // COUNT(*) AS BIGINT) AS return_ppm
FROM j GROUP BY 1 ORDER BY 1
"""


def orders_seasonal_amplitude(sf_dir: str):
    """Seasonality amplitude per year — (best month − worst month) / best
    in ppm over monthly revenue (how peaky is the business): O(months)
    cells, per-year extrema on the driver fold, exact integers."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.year(t["o_orderdate"]).cast(pa.int64())
        mo = pc.month(t["o_orderdate"]).cast(pa.int64())
        return (
            pa.table(
                {
                    "yr": yr,
                    "mo": mo,
                    "cents": _cents(t["o_totalprice"]),
                }
            )
            .group_by(["yr", "mo"])
            .aggregate([("cents", "sum")])
            .rename_columns(["yr", "mo", "cents"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["yr", "mo"])
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    rows = []
    for yr, sub in g.groupby("yr", sort=True):
        mx, mn = int(sub.cents.max()), int(sub.cents.min())
        rows.append((int(yr), len(sub), mx, mn, (mx - mn) * 1_000_000 // mx))
    return pa.table(
        {
            "yr": pa.array([r[0] for r in rows], pa.int64()),
            "n_months": pa.array([r[1] for r in rows], pa.int64()),
            "best_month_cents": pa.array([r[2] for r in rows], pa.int64()),
            "worst_month_cents": pa.array([r[3] for r in rows], pa.int64()),
            "amplitude_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


ORDERS_SEASONAL_AMPLITUDE_SQL = """
WITH m AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2)
SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_months,
       CAST(MAX(cents) AS BIGINT) AS best_month_cents,
       CAST(MIN(cents) AS BIGINT) AS worst_month_cents,
       CAST((MAX(cents) - MIN(cents)) * 1000000 // MAX(cents) AS BIGINT)
         AS amplitude_ppm
FROM m GROUP BY 1 ORDER BY 1
"""


def orders_mixed_discount_ppm(sf_dir: str):
    """Discount-consistency audit — orders whose lines carry DIFFERENT
    discount levels (a pricing-engine smell when discounts are meant to be
    order-scoped): the MIN=MAX all-equal gate on the per-order discount
    percent, one ppm row."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        lvl = pc.cast(
            pc.floor(pc.add(pc.multiply(t["l_discount"], 100.0), 0.5)), pa.int64()
        )
        return (
            pa.table({"ok": t["l_orderkey"], "mn": lvl, "mx": lvl})
            .group_by("ok")
            .aggregate([("mn", "min"), ("mx", "max")])
            .rename_columns(["ok", "mn", "mx"])
        )

    g = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("ok")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
    )

    def cells(t: pa.Table) -> pa.Table:
        mixed = pc.cast(pc.not_equal(t["mn"], t["mx"]), pa.int64())
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "mixed": pa.array([int(pc.sum(mixed).as_py() or 0)], pa.int64()),
            }
        )

    s = g.map_batches(cells, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("mixed", alias_name="mixed")
    )
    n, m = int(s["n"]), int(s["mixed"])
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "mixed_orders": pa.array([m], pa.int64()),
            "mixed_ppm": pa.array([m * 1_000_000 // n], pa.int64()),
        }
    )


ORDERS_MIXED_DISCOUNT_PPM_SQL = """
WITH p AS (
  SELECT l_orderkey,
         MIN(CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT)) AS mn,
         MAX(CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT)) AS mx
  FROM lineitem GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN mn <> mx THEN 1 ELSE 0 END) AS BIGINT) AS mixed_orders,
       CAST(SUM(CASE WHEN mn <> mx THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS mixed_ppm
FROM p
"""


def docs_lang_tv_from_global(sf_dir: str):
    """Per-language divergence from the corpus — total-variation distance
    between each language's unigram mix and the GLOBAL mix, exact ppm via
    Σ|c_l·N − c_g·N_l|·10⁶ // (2·N_l·N): the slice-skew ranking that says
    which language needs its own tokenizer.  (lang, term) cells from block
    partials; the per-lang fold is O(vocab) on the driver (HUGEINT-scale
    products stay in Python ints)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        parent = pc.list_parent_indices(col)
        lang = pc.take(t["lang"], parent)
        tb = pa.table({"lang": lang, "term": flat}).filter(
            pc.and_(pc.is_valid(flat), pc.not_equal(flat, ""))
        )
        return tb.group_by(["lang", "term"]).aggregate([("term", "count")]).rename_columns(
            ["lang", "term", "n"]
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    glob = cells.groupby("term")["n"].sum()
    n_glob = int(glob.sum())
    rows = []
    for lang, sub in cells.groupby("lang", sort=True):
        ln = dict(zip(sub.term, sub.n.astype(int)))
        n_l = sum(ln.values())
        acc = 0
        for term, cg in glob.items():
            cl = ln.get(term, 0)
            acc += abs(cl * n_glob - int(cg) * n_l)
        tv = acc * 1_000_000 // (2 * n_l * n_glob)
        rows.append((str(lang), n_l, tv))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
            "tv_ppm": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


DOCS_LANG_TV_FROM_GLOBAL_SQL = """
WITH tk AS (
  SELECT lang, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
c AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS n
      FROM tk WHERE term <> '' GROUP BY 1, 2),
g AS (SELECT term, SUM(n) AS cg FROM c GROUP BY 1),
t AS (SELECT SUM(n) AS n_glob FROM c),
l AS (SELECT lang, SUM(n) AS n_l FROM c GROUP BY 1),
grid AS (SELECT l.lang, g.term, g.cg, l.n_l FROM l, g),
d AS (
  SELECT grid.lang, grid.n_l,
         ABS(COALESCE(c.n, 0) * t.n_glob - grid.cg * grid.n_l) AS term_dev
  FROM grid LEFT JOIN c ON grid.lang = c.lang AND grid.term = c.term, t)
SELECT lang, CAST(MAX(n_l) AS BIGINT) AS n_tokens,
       CAST(SUM(term_dev) * 1000000
            // (2 * MAX(n_l) * (SELECT n_glob FROM t)) AS BIGINT) AS tv_ppm
FROM d GROUP BY 1 ORDER BY 1
"""


def brand_size_coverage(sf_dir: str):
    """Assortment coverage — per brand, how much of the GLOBAL size range
    it stocks (distinct sizes / global distinct sizes, ppm): the catalog
    breadth signal.  Two distinct-count reductions, tiny cells."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_brand", "p_size"])

    def pairs(t: pa.Table) -> pa.Table:
        return (
            pa.table({"p_brand": t["p_brand"], "p_size": t["p_size"].cast(pa.int64())})
            .group_by(["p_brand", "p_size"])
            .aggregate([])
        )

    cells = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["p_brand", "p_size"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    n_global = int(cells.p_size.nunique())
    per_brand = cells.groupby("p_brand").size().sort_index()
    n = per_brand.to_numpy().astype(np.int64)
    return pa.table(
        {
            "p_brand": pa.array(per_brand.index.tolist(), pa.string()),
            "n_sizes": pa.array(n, pa.int64()),
            "coverage_ppm": pa.array(n * 1_000_000 // n_global, pa.int64()),
        }
    )


BRAND_SIZE_COVERAGE_SQL = """
WITH p AS (SELECT DISTINCT p_brand, p_size FROM part),
g AS (SELECT CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_global FROM part)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_sizes,
       CAST(COUNT(*) * 1000000 // n_global AS BIGINT) AS coverage_ppm
FROM p, g GROUP BY 1, n_global ORDER BY 1
"""


def supplier_lag_trend(sf_dir: str):
    """Fulfillment-lag trend per supplier — median order-to-ship days in
    the FIRST vs LAST ship year and the signed delta (who is getting
    slower): per-(supplier, year) groups reduce to lower-medians after the
    8-partition orderdate join; the two year slices align on the
    O(suppliers) driver table."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "sk": t["l_suppkey"],
                "ship_day": pa.array(
                    t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                    // 86_400_000_000,
                    pa.int64(),
                ),
                "ship_yr": pc.year(t["l_shipdate"]).cast(pa.int64()),
            }
        )

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    joined = li.map_batches(prep, batch_format="pyarrow").join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def kernel(g: pa.Table) -> pa.Table:
        od = g["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        lag = np.sort(
            g["ship_day"].combine_chunks().to_numpy(zero_copy_only=False) - od
        )
        return pa.table(
            {
                "sk": pa.array([int(g["sk"][0].as_py())], pa.int64()),
                "yr": pa.array([int(g["ship_yr"][0].as_py())], pa.int64()),
                "med": pa.array([int(lag[(len(lag) - 1) // 2])], pa.int64()),
            }
        )

    cells = (
        joined.groupby(["sk", "ship_yr"])
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()
    )
    y0, y1 = int(cells.yr.min()), int(cells.yr.max())
    first = cells[cells.yr == y0].set_index("sk").med
    last = cells[cells.yr == y1].set_index("sk").med
    sks = sorted(set(first.index) & set(last.index))
    return pa.table(
        {
            "s_suppkey": pa.array([int(s) for s in sks], pa.int64()),
            "first_median_days": pa.array([int(first[s]) for s in sks], pa.int64()),
            "last_median_days": pa.array([int(last[s]) for s in sks], pa.int64()),
            "delta_days": pa.array(
                [int(last[s]) - int(first[s]) for s in sks], pa.int64()
            ),
        }
    )


SUPPLIER_LAG_TREND_SQL = """
WITH j AS (
  SELECT l_suppkey AS sk,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
         epoch_us(l_shipdate) // 86400000000
           - epoch_us(o_orderdate) // 86400000000 AS lag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
b AS (SELECT MIN(yr) AS y0, MAX(yr) AS y1 FROM j),
m AS (SELECT sk, yr, CAST(quantile_disc(lag, 0.5) AS BIGINT) AS med
      FROM j GROUP BY 1, 2)
SELECT f.sk AS s_suppkey,
       f.med AS first_median_days, l.med AS last_median_days,
       CAST(l.med - f.med AS BIGINT) AS delta_days
FROM m f JOIN m l ON f.sk = l.sk, b
WHERE f.yr = y0 AND l.yr = y1
ORDER BY f.sk
"""


def events_zombie_users(sf_dir: str):
    """Zombie-user pattern — active in the FIRST and LAST thirds of the
    time range but silent in the middle (the re-engagement-mystery cohort):
    per-user presence flags over three windows via one keyed Max-of-
    indicator reduction; integer boundaries (range thirds)."""
    mm_ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"]).map_batches(
        lambda t: pa.table({"ts_us": t["ts"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    lo, hi = int(mm_ds.min("ts_us")), int(mm_ds.max("ts_us"))
    b1 = lo + (hi - lo) // 3
    b2 = lo + 2 * (hi - lo) // 3
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def flags(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "w1": pa.array((ts <= b1).astype(np.int64), pa.int64()),
                "w2": pa.array(((ts > b1) & (ts <= b2)).astype(np.int64), pa.int64()),
                "w3": pa.array((ts > b2).astype(np.int64), pa.int64()),
            }
        )

    per_user = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("w1", alias_name="w1"),
            Max("w2", alias_name="w2"),
            Max("w3", alias_name="w3"),
        )
    )

    def cells(t: pa.Table) -> pa.Table:
        w1 = t["w1"].combine_chunks().to_numpy(zero_copy_only=False) > 0
        w2 = t["w2"].combine_chunks().to_numpy(zero_copy_only=False) > 0
        w3 = t["w3"].combine_chunks().to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "users": pa.array([len(w1)], pa.int64()),
                "zombies": pa.array([int((w1 & ~w2 & w3).sum())], pa.int64()),
            }
        )

    s = per_user.map_batches(cells, batch_format="pyarrow").aggregate(
        Sum("users", alias_name="users"), Sum("zombies", alias_name="zombies")
    )
    u, z = int(s["users"]), int(s["zombies"])
    return pa.table(
        {
            "n_users": pa.array([u], pa.int64()),
            "zombie_users": pa.array([z], pa.int64()),
            "zombie_ppm": pa.array([z * 1_000_000 // u], pa.int64()),
        }
    )


EVENTS_ZOMBIE_USERS_SQL = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo,
         MIN(epoch_us(ts)) + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 3 AS b1,
         MIN(epoch_us(ts)) + 2 * (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 3 AS b2
  FROM events),
u AS (
  SELECT user_id,
         MAX(CASE WHEN epoch_us(ts) <= b1 THEN 1 ELSE 0 END) AS w1,
         MAX(CASE WHEN epoch_us(ts) > b1 AND epoch_us(ts) <= b2
                  THEN 1 ELSE 0 END) AS w2,
         MAX(CASE WHEN epoch_us(ts) > b2 THEN 1 ELSE 0 END) AS w3
  FROM events, b GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN w1 = 1 AND w2 = 0 AND w3 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS zombie_users,
       CAST(SUM(CASE WHEN w1 = 1 AND w2 = 0 AND w3 = 1 THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS zombie_ppm
FROM u
"""


def events_user_preferred_hour_hist(sf_dir: str):
    """Chronotype census — each user's MODAL hour-of-day (count desc, hour
    asc tie rule), histogrammed: the audience-scheduling view.  (user, hod)
    cells from block partials; per-user argmax in the group kernel; the
    0-filled 24-row histogram folds on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hod = (us // 3_600_000_000) % 24
        return (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "hod": pa.array(hod, pa.int64()),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by(["user_id", "hod"])
            .aggregate([("n", "sum")])
            .rename_columns(["user_id", "hod", "n"])
        )

    def argmax(g: pa.Table) -> pa.Table:
        hod = g["hod"].combine_chunks().to_numpy(zero_copy_only=False)
        n = g["n"].combine_chunks().to_numpy(zero_copy_only=False)
        ix = np.lexsort((hod, -n))[0]
        return pa.table(
            {
                "pref_hod": pa.array([int(hod[ix])], pa.int64()),
                "c": pa.array([1], pa.int64()),
            }
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "hod"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("user_id")
        .map_groups(argmax, batch_format="pyarrow")
        .groupby("pref_hod")
        .aggregate(Sum("c", alias_name="n_users"))
        .to_pandas()
    )
    have = dict(zip(g["pref_hod"].astype(int), g["n_users"].astype(int)))
    return pa.table(
        {
            "pref_hod": pa.array(list(range(24)), pa.int64()),
            "n_users": pa.array([have.get(h, 0) for h in range(24)], pa.int64()),
        }
    )


EVENTS_USER_PREFERRED_HOUR_HIST_SQL = """
WITH c AS (
  SELECT user_id, CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (SELECT user_id, hod,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, hod) AS rk
      FROM c),
p AS (SELECT hod AS pref_hod, COUNT(*) AS n FROM r WHERE rk = 1 GROUP BY 1),
grid AS (SELECT CAST(unnest(range(0, 24)) AS BIGINT) AS pref_hod)
SELECT grid.pref_hod, CAST(COALESCE(p.n, 0) AS BIGINT) AS n_users
FROM grid LEFT JOIN p USING (pref_hod)
ORDER BY grid.pref_hod
"""


def docs_token_length_hist(sf_dir: str):
    """Token-length histogram — the length spectrum of the vocabulary IN
    USE (token instances, not types): a tokenizer-budget input.  Lengths
    from one utf8_length over the flattened stream; O(max length) cells."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        )
        toks = pc.drop_null(toks)
        toks = toks.filter(pc.not_equal(toks, ""))
        ln = pc.utf8_length(toks)
        return (
            pa.table(
                {"token_len": ln.cast(pa.int64()), "n": pa.array(np.ones(len(ln), np.int64))}
            )
            .group_by("token_len")
            .aggregate([("n", "sum")])
            .rename_columns(["token_len", "n"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token_len")
        .aggregate(Sum("n", alias_name="n_tokens"))
        .sort(["token_len"])
    )


DOCS_TOKEN_LENGTH_HIST_SQL = """
WITH toks AS (
  SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
  FROM documents)
SELECT CAST(length(term) AS BIGINT) AS token_len,
       CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM toks WHERE term <> ''
GROUP BY 1 ORDER BY 1
"""


def orders_priority_persistence(sf_dir: str):
    """Priority persistence — do customers reorder at the SAME priority?
    Adjacent order pairs per customer ((date, key) order), the same-priority
    share in exact ppm: the stickiness prior a priority-prediction model
    must beat.  Per-customer shifted compare, two integers out."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    )
    _empty = pa.table(
        {"pairs": pa.array([], pa.int64()), "same": pa.array([], pa.int64())}
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
        pr = s["o_orderpriority"].combine_chunks()
        n = s.num_rows
        same = pc.sum(
            pc.cast(pc.equal(pr.slice(0, n - 1), pr.slice(1, n - 1)), pa.int64())
        ).as_py()
        return pa.table(
            {
                "pairs": pa.array([n - 1], pa.int64()),
                "same": pa.array([int(same or 0)], pa.int64()),
            }
        )

    s = (
        ds.groupby("o_custkey")
        .map_groups(kernel, batch_format="pyarrow")
        .aggregate(Sum("pairs", alias_name="pairs"), Sum("same", alias_name="same"))
    )
    p, sm = int(s["pairs"]), int(s["same"])
    return pa.table(
        {
            "n_pairs": pa.array([p], pa.int64()),
            "same_priority": pa.array([sm], pa.int64()),
            "persistence_ppm": pa.array([sm * 1_000_000 // p], pa.int64()),
        }
    )


ORDERS_PRIORITY_PERSISTENCE_SQL = """
WITH s AS (
  SELECT o_custkey, o_orderpriority,
         lead(o_orderpriority) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM orders),
p AS (SELECT o_orderpriority = nxt AS same FROM s WHERE nxt IS NOT NULL)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN same THEN 1 ELSE 0 END) AS BIGINT) AS same_priority,
       CAST(SUM(CASE WHEN same THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS persistence_ppm
FROM p
"""


def events_sessions_per_user_hist(sf_dir: str):
    """Engagement-depth histogram — users bucketed by how many sessions
    (30-min gap) they generated: the frequency layer of RFM for event
    streams.  Per-user session counts from the boundary kernel; O(distinct
    counts) histogram."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000

    def kernel(g: pa.Table) -> pa.Table:
        ts = np.sort(g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        n_sessions = int(np.r_[True, np.diff(ts) > gap_us].sum())
        return pa.table(
            {
                "n_sessions": pa.array([n_sessions], pa.int64()),
                "c": pa.array([1], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("n_sessions")
        .aggregate(Sum("c", alias_name="n_users"))
        .sort(["n_sessions"])
    )


EVENTS_SESSIONS_PER_USER_HIST_SQL = """
WITH x AS (
  SELECT user_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events),
u AS (SELECT user_id, CAST(SUM(brk) + 1 AS BIGINT) AS n_sessions
      FROM x GROUP BY 1)
SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users
FROM u GROUP BY 1 ORDER BY 1
"""


def part_name_noun_profile(sf_dir: str):
    """String-derived dimension rollup — the NOUN of each part name
    ('cold widget' → 'widget') becomes a product family: per family,
    count, mean retail price (exact milli-cents) and distinct brand
    count.  One vectorized split per block; family cells are tiny."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_name", "p_brand", "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["p_name"], pattern=" ")
        col = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        noun = pc.list_element(col, 1)
        return (
            pa.table(
                {
                    "noun": noun,
                    "p_brand": t["p_brand"],
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "cents": _cents(t["p_retailprice"]),
                }
            )
            .group_by(["noun", "p_brand"])
            .aggregate([("n", "sum"), ("cents", "sum")])
            .rename_columns(["noun", "p_brand", "n", "cents"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["noun", "p_brand"])
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    rows = []
    for noun, sub in g.groupby("noun", sort=True):
        n = int(sub.n.sum())
        cents = int(sub.cents.sum())
        rows.append((str(noun), n, cents * 1000 // n, int(sub.p_brand.nunique())))
    return pa.table(
        {
            "noun": pa.array([r[0] for r in rows], pa.string()),
            "n_parts": pa.array([r[1] for r in rows], pa.int64()),
            "mean_price_milli": pa.array([r[2] for r in rows], pa.int64()),
            "n_brands": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


PART_NAME_NOUN_PROFILE_SQL = """
WITH p AS (
  SELECT string_split(p_name, ' ')[2] AS noun, p_brand,
         CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT) AS cents
  FROM part)
SELECT noun, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cents) * 1000 // COUNT(*) AS BIGINT) AS mean_price_milli,
       CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands
FROM p GROUP BY 1 ORDER BY 1
"""


def events_user_value_pareto(sf_dir: str):
    """Whale concentration — the value share of the top quintile of users
    (k = ⌈n/5⌉ by total cents, ties broken by user id): the
    revenue-at-risk number.  Per-user sums via one keyed reduction; the
    quintile boundary and share fold on the O(users) table (rank machinery
    is the documented path past driver scale); exact ppm."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"user_id": t["user_id"], "cents": _cents(t["value"])})
            .group_by("user_id")
            .aggregate([("cents", "sum")])
            .rename_columns(["user_id", "cents"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values(["cents", "user_id"], ascending=[False, True], kind="mergesort")
    )
    c = g["cents"].to_numpy().astype(np.int64)
    n = len(c)
    k = (n + 4) // 5
    total = int(c.sum())
    top = int(c[:k].sum())
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "k_top": pa.array([k], pa.int64()),
            "top_cents": pa.array([top], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
            "top_share_ppm": pa.array([top * 1_000_000 // total], pa.int64()),
        }
    )


EVENTS_USER_VALUE_PARETO_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1),
r AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, user_id) AS rk,
         COUNT(*) OVER () AS n
  FROM u)
SELECT CAST(MAX(n) AS BIGINT) AS n_users,
       CAST((MAX(n) + 4) // 5 AS BIGINT) AS k_top,
       CAST(SUM(CASE WHEN rk <= (n + 4) // 5 THEN cents ELSE 0 END) AS BIGINT)
         AS top_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN rk <= (n + 4) // 5 THEN cents ELSE 0 END) * 1000000
            // SUM(cents) AS BIGINT) AS top_share_ppm
FROM r
"""


def lineitem_spearman_by_flag(sf_dir: str):
    """SPEARMAN rank correlation between quantity and extended price per
    return flag — the nonparametric complement to ``lineitem_measure_corr``
    (Pearson).  Exactness trick: average ranks with ties are half-integers,
    so we work with CENTERED DOUBLED ranks e_i = (minrank + maxrank) − (n+1),
    which are exact int64 and sum to zero; then
    ρ = Sxy / (√Sxx · √Syy) is ONE fixed IEEE expression both sides (sqrt is
    correctly rounded in numpy and DuckDB).  Σe² ≤ 4n³ bounds int64 safety to
    n ≤ ~1.3e6 rows per flag (fine through sf0.1; beyond that scale the
    doubled ranks down by the documented group size).  Ranks need the whole
    group → groupby(flag).map_groups with vectorized unique/cumsum ranking."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def _centered_doubled_ranks(v: np.ndarray) -> np.ndarray:
        n = len(v)
        uniq, inv, cnt = np.unique(v, return_inverse=True, return_counts=True)
        minrank = np.r_[0, np.cumsum(cnt)[:-1]] + 1  # 1-based min rank per unique
        doubled = 2 * minrank + cnt - 1  # = minrank + maxrank
        return doubled[inv] - (n + 1)

    def spearman(g: pa.Table) -> pa.Table:
        q = _cents(g["l_quantity"]).to_numpy(zero_copy_only=False)
        p = _cents(g["l_extendedprice"]).to_numpy(zero_copy_only=False)
        ex = _centered_doubled_ranks(q)
        ey = _centered_doubled_ranks(p)
        sxy = int(np.sum(ex * ey))
        sxx = int(np.sum(ex * ex))
        syy = int(np.sum(ey * ey))
        rho = float(sxy) / (np.sqrt(float(sxx)) * np.sqrt(float(syy)))
        return pa.table(
            {
                "l_returnflag": pa.array([g["l_returnflag"][0].as_py()], pa.string()),
                "n": pa.array([len(ex)], pa.int64()),
                "spearman_rho": pa.array([rho], pa.float64()),
            }
        )

    return (
        ds.groupby("l_returnflag")
        .map_groups(spearman, batch_format="pyarrow")
        .sort(["l_returnflag"])
    )


LINEITEM_SPEARMAN_BY_FLAG_SQL = """
WITH v AS (
  SELECT l_returnflag AS f,
         CAST(FLOOR(l_quantity*100 + 0.5) AS BIGINT) AS q,
         CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS p
  FROM lineitem),
r AS (
  SELECT f,
         2*RANK() OVER (PARTITION BY f ORDER BY q)
           + COUNT(*) OVER (PARTITION BY f, q) - 1
           - (COUNT(*) OVER (PARTITION BY f) + 1) AS ex,
         2*RANK() OVER (PARTITION BY f ORDER BY p)
           + COUNT(*) OVER (PARTITION BY f, p) - 1
           - (COUNT(*) OVER (PARTITION BY f) + 1) AS ey
  FROM v)
SELECT f AS l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ex*ey) AS DOUBLE)
         / (sqrt(CAST(SUM(ex*ex) AS DOUBLE)) * sqrt(CAST(SUM(ey*ey) AS DOUBLE)))
         AS spearman_rho
FROM r GROUP BY 1 ORDER BY 1
"""


def customer_month_coverage_hist(sf_dir: str):
    """Calendar-month coverage census: for each customer, the number of
    DISTINCT order months (1–12, any year), rolled into a histogram
    n_months → n_customers.  Shuffle-light relational-division shape: each
    block emits per-customer MONTH BITMASKS (bit m−1 set), one groupby ORs
    them (Sum over disjoint-bit masks would double-count, so the merge is a
    map_groups bitwise-OR), and popcount gives the coverage — months never
    travel as rows.  Full coverage (=12) is the classic division result."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        # per-block OR-combine of month bitmasks keyed by customer
        m = pc.month(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["o_custkey"].to_numpy(zero_copy_only=False)
        mask = np.left_shift(np.int64(1), m - 1)
        order = np.argsort(c, kind="stable")
        cs, ms = c[order], mask[order]
        starts = np.r_[True, cs[1:] != cs[:-1]] if len(cs) else np.array([], bool)
        idx = np.nonzero(starts)[0]
        grp = np.cumsum(starts) - 1
        out = np.zeros(len(idx), np.int64)
        np.bitwise_or.at(out, grp, ms)
        return pa.table(
            {"c": pa.array(cs[idx]), "mask": pa.array(out)}
        )

    def merge(g: pa.Table) -> pa.Table:
        m = g["mask"].to_numpy(zero_copy_only=False)
        acc = np.int64(np.bitwise_or.reduce(m))
        nm = int(bin(int(acc)).count("1"))
        return pa.table(
            {
                "n_months": pa.array([nm], pa.int64()),
                "one": pa.array([1], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c")
        .map_groups(merge, batch_format="pyarrow")
        .groupby("n_months")
        .aggregate(Sum("one", alias_name="n_customers"))
        .sort(["n_months"])
    )


CUSTOMER_MONTH_COVERAGE_HIST_SQL = """
WITH m AS (
  SELECT o_custkey, CAST(COUNT(DISTINCT month(o_orderdate)) AS BIGINT) AS n_months
  FROM orders GROUP BY 1)
SELECT n_months, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM m GROUP BY 1 ORDER BY 1
"""


def events_user_burstiness(sf_dir: str):
    """Goh–Barabási BURSTINESS index per user over interarrival gaps:
    B = (σ − μ)/(σ + μ) ∈ [−1, 1) — −1 for a perfectly periodic stream, →1
    for heavy-tailed bursts.  Gaps are whole SECONDS (int64, truncating µs
    division — both engines truncate identically on non-negatives), so the
    sufficient statistics (n, Σg, Σg²) are exact integers, and with
    population σ = √(nΣg²−(Σg)²)/n the index telescopes to the single fixed
    IEEE expression B = (√D − Σg)/(√D + Σg), D = nΣg² − (Σg)² — sqrt is
    correctly rounded in both engines, so bit parity holds.  int64 bound:
    nΣg² ≤ n·span² (30-day span ⇒ safe to ~10⁶ gaps/user; document rescale
    to minutes beyond).  Users with Σg = 0 (all-duplicate timestamps) are
    excluded rather than emitting 0/0."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts"]
    )

    def burst(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        t = (
            s["ts"]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        gaps = np.diff(t) // 1_000_000
        n = len(gaps)
        s1 = int(gaps.sum())
        if n < 2 or s1 <= 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "sum_gap_s": pa.array([], pa.int64()),
                    "burstiness": pa.array([], pa.float64()),
                }
            )
        sq = int(np.sum(gaps * gaps))
        d = float(n * sq - s1 * s1)
        b = (np.sqrt(d) - float(s1)) / (np.sqrt(d) + float(s1))
        return pa.table(
            {
                "user_id": pa.array([int(s["user_id"][0].as_py())], pa.int64()),
                "n_gaps": pa.array([n], pa.int64()),
                "sum_gap_s": pa.array([s1], pa.int64()),
                "burstiness": pa.array([float(b)], pa.float64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(burst, batch_format="pyarrow")
        .sort(["user_id"])
    )


EVENTS_USER_BURSTINESS_SQL = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt
  FROM events),
g AS (SELECT user_id, (t - pt) // 1000000 AS gap FROM o WHERE pt IS NOT NULL),
s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS s1, CAST(SUM(gap*gap) AS BIGINT) AS sq
      FROM g GROUP BY 1)
SELECT CAST(user_id AS BIGINT) AS user_id, n AS n_gaps, s1 AS sum_gap_s,
       (sqrt(CAST(n*sq - s1*s1 AS DOUBLE)) - CAST(s1 AS DOUBLE))
         / (sqrt(CAST(n*sq - s1*s1 AS DOUBLE)) + CAST(s1 AS DOUBLE)) AS burstiness
FROM s WHERE n >= 2 AND s1 > 0 ORDER BY user_id
"""
