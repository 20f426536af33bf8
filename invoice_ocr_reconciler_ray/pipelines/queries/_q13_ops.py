"""Query-registry family module 13: stylometry / class-migration /
path-motif / timezone / co-movement / attribution / proximity ops
(round-5 continuation, wave C — every name verified absent from the
783-entry registry before being added):

* `docs_stylometric_delta_matrix` — Burrows-Delta-style authorship
  distance between sources over the top-10 function words, kept exact by
  comparing integer ppm frequency profiles (Manhattan distance);
* `lineitem_abc_migration_matrix` — ABC revenue-class migration between
  the first and second half of the shipping horizon (the assortment-drift
  report a planner reviews quarterly);
* `events_type_trigram_census` — consecutive event-type path motifs of
  length 3 per user (the Markov-order-2 evidence the bigram transition
  matrix can't show);
* `events_tz_normalization_audit` — synthetic per-user timezone offsets;
  counts events whose LOCAL calendar day differs from the UTC day, per
  offset — the classic silent-bug class in cross-region rollups;
* `nation_revenue_comovement_matrix` — sign-agreement of month-over-month
  revenue deltas for every nation pair (co-movement without a single
  float correlation);
* `events_first_last_touch_matrix` — first-touch × last-touch attribution
  census over pre-purchase event types ('direct' when the purchase opens
  the history);
* `docs_proximity_search` — positional proximity search ('join' within 3
  tokens of 'merge'): per-doc pair counts and minimum distance, the
  positional-index primitive behind phrase-ish retrieval.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


def docs_stylometric_delta_matrix(sf_dir: str):
    """Stylometric (Burrows-Delta-flavored) source distance: each source's
    usage profile over the corpus's top-10 terms (count desc, term asc),
    as exact integer ppm of the source's total tokens; the pairwise
    distance is the Manhattan sum |ppm₁ − ppm₂| over the ten profile
    coordinates — no float z-scores, same ranking behavior on a shared
    vocabulary.  One distributed (source, term) count; the 20×20 fold is
    driver-tiny."""
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
    tot_term: dict = {}
    prof: dict = {}
    tots: dict = {}
    for s, t_, n in zip(g["source"], g["term"], g["n"].astype(int)):
        s, t_, n = str(s), str(t_), int(n)
        tot_term[t_] = tot_term.get(t_, 0) + n
        prof.setdefault(s, {})[t_] = n
        tots[s] = tots.get(s, 0) + n
    top10 = sorted(tot_term, key=lambda w: (-tot_term[w], w))[:10]
    ppm = {
        s: {w: prof[s].get(w, 0) * 1_000_000 // tots[s] for w in top10} for s in prof
    }
    srcs = sorted(prof)
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            d = sum(abs(ppm[a][w] - ppm[b][w]) for w in top10)
            rows.append((a, b, d))
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "delta_ppm": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


DOCS_STYLOMETRIC_DELTA_MATRIX_SQL = """
WITH f AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
  FROM documents
), c AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n
  FROM f GROUP BY source, term
), top10 AS (
  SELECT term FROM c GROUP BY term
  ORDER BY SUM(n) DESC, term LIMIT 10
), tot AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS t FROM c GROUP BY source
), p AS (
  SELECT tot.source, top10.term,
         COALESCE(c.n, 0) * 1000000 // tot.t AS ppm
  FROM tot CROSS JOIN top10
  LEFT JOIN c ON c.source = tot.source AND c.term = top10.term
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(ABS(a.ppm - b.ppm)) AS BIGINT) AS delta_ppm
FROM p a JOIN p b ON a.term = b.term AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
"""


def lineitem_abc_migration_matrix(sf_dir: str):
    """ABC class MIGRATION between the first and second half of the
    shipping horizon: each part is classified by cumulative revenue share
    (A ≤ 80 %, B ≤ 95 %) independently within each half (rev desc,
    partkey tie-break), and the census counts every (first-half class →
    second-half class) cell, with '-' for parts absent from a half — the
    assortment-drift diagnosis behind reorder-point reviews.  The halves
    split at ⌊(min+max)/2⌋ of the ship day, read from the parquet
    ROW-GROUP STATISTICS (no data scan decides the cut).  Per-half
    revenue folds are block partials + one groupby over (part, half) —
    driver work stays part-bounded."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(_t(sf_dir, "lineitem")).metadata
    ci = md.schema.to_arrow_schema().get_field_index("l_shipdate")
    los, his = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        los.append(st.min)
        his.append(st.max)
    from datetime import datetime

    def to_day(d):
        # stats come back as naive datetimes; .timestamp() would apply the
        # host TZ — anchor to the epoch explicitly instead
        delta = d - datetime(1970, 1, 1)
        return (delta.days * 86_400 + delta.seconds) // 86_400

    half = (to_day(min(los)) + to_day(max(his))) // 2

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        day = (
            t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False) // _DAY_US
        )
        rev = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(
                            pc.cast(t["l_extendedprice"], pa.float64()),
                            pc.subtract(1.0, pc.cast(t["l_discount"], pa.float64())),
                        ),
                        100.0,
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        first = day <= half
        return (
            pa.table(
                {
                    "pk": t["l_partkey"],
                    "rev1": pa.array(np.where(first, rev, 0), pa.int64()),
                    "rev2": pa.array(np.where(first, 0, rev), pa.int64()),
                }
            )
            .group_by("pk")
            .aggregate([("rev1", "sum"), ("rev2", "sum")])
            .rename_columns(["pk", "rev1", "rev2"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("rev1", alias_name="rev1"), Sum("rev2", alias_name="rev2"))
        .to_pandas()
    )

    def classify(sub) -> dict:
        sub = sub.sort_values(["rev", "pk"], ascending=[False, True], kind="mergesort")
        rev = sub["rev"].to_numpy().astype(np.int64)
        cum = rev.cumsum()
        total = int(rev.sum())
        cls = np.where(cum * 10 <= 8 * total, "A", np.where(cum * 100 <= 95 * total, "B", "C"))
        return dict(zip(sub["pk"].astype(int), cls))

    h1 = classify(g[g["rev1"] > 0].rename(columns={"rev1": "rev"})[["pk", "rev"]])
    h2 = classify(g[g["rev2"] > 0].rename(columns={"rev2": "rev"})[["pk", "rev"]])
    from collections import Counter

    cnt: Counter = Counter()
    for pk in set(h1) | set(h2):
        cnt[(h1.get(pk, "-"), h2.get(pk, "-"))] += 1
    ks = sorted(cnt)
    return pa.table(
        {
            "class_h1": pa.array([k[0] for k in ks], pa.string()),
            "class_h2": pa.array([k[1] for k in ks], pa.string()),
            "n_parts": pa.array([cnt[k] for k in ks], pa.int64()),
        }
    )


LINEITEM_ABC_MIGRATION_MATRIX_SQL = """
WITH d AS (
  SELECT l_partkey AS pk,
         epoch_us(l_shipdate) // 86400000000 AS day,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
           AS rev
  FROM lineitem
), bounds AS (
  SELECT (MIN(day) + MAX(day)) // 2 AS half FROM d
), r1 AS (
  SELECT pk, CAST(SUM(rev) AS BIGINT) AS rev
  FROM d, bounds WHERE day <= half GROUP BY pk
  HAVING SUM(rev) > 0
), c1 AS (
  SELECT pk,
         CASE WHEN SUM(rev) OVER (ORDER BY rev DESC, pk
                                  ROWS UNBOUNDED PRECEDING) * 10
                   <= 8 * SUM(rev) OVER () THEN 'A'
              WHEN SUM(rev) OVER (ORDER BY rev DESC, pk
                                  ROWS UNBOUNDED PRECEDING) * 100
                   <= 95 * SUM(rev) OVER () THEN 'B'
              ELSE 'C' END AS cls
  FROM r1
), r2 AS (
  SELECT pk, CAST(SUM(rev) AS BIGINT) AS rev
  FROM d, bounds WHERE day > half GROUP BY pk
  HAVING SUM(rev) > 0
), c2 AS (
  SELECT pk,
         CASE WHEN SUM(rev) OVER (ORDER BY rev DESC, pk
                                  ROWS UNBOUNDED PRECEDING) * 10
                   <= 8 * SUM(rev) OVER () THEN 'A'
              WHEN SUM(rev) OVER (ORDER BY rev DESC, pk
                                  ROWS UNBOUNDED PRECEDING) * 100
                   <= 95 * SUM(rev) OVER () THEN 'B'
              ELSE 'C' END AS cls
  FROM r2
)
SELECT COALESCE(c1.cls, '-') AS class_h1,
       COALESCE(c2.cls, '-') AS class_h2,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM c1 FULL OUTER JOIN c2 ON c1.pk = c2.pk
GROUP BY class_h1, class_h2
ORDER BY class_h1, class_h2
"""


def events_type_trigram_census(sf_dir: str):
    """Event-type PATH MOTIFS of length three — consecutive per-user
    (t₁→t₂→t₃) triples in (ts, event_id) order, censused corpus-wide: the
    order-2 sequential evidence a first-order transition matrix cannot
    express (does click→click→purchase outnumber click→view→purchase?).
    Co-partition by user; two shifted takes per group; type-cube-bounded
    census partials."""
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

    def per_user(g: pa.Table) -> pa.Table:
        if g.num_rows < 3:
            return _empty
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        types = s["event_type"].to_pylist()
        from collections import Counter

        cnt = Counter(zip(types[:-2], types[1:-1], types[2:]))
        ks = sorted(cnt)
        return pa.table(
            {
                "t1": pa.array([k[0] for k in ks], pa.string()),
                "t2": pa.array([k[1] for k in ks], pa.string()),
                "t3": pa.array([k[2] for k in ks], pa.string()),
                "n": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    g = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["t1", "t2", "t3"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["t1", "t2", "t3"], kind="mergesort")
    )
    return pa.table(
        {
            "t1": pa.array([str(x) for x in g["t1"]], pa.string()),
            "t2": pa.array([str(x) for x in g["t2"]], pa.string()),
            "t3": pa.array([str(x) for x in g["t3"]], pa.string()),
            "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


EVENTS_TYPE_TRIGRAM_CENSUS_SQL = """
WITH s AS (
  SELECT user_id, event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY t1, t2, t3
"""


def events_tz_normalization_audit(sf_dir: str):
    """Timezone-normalization audit — the silent-bug class behind
    cross-region daily rollups: each user gets a deterministic UTC offset
    (user_id % 24 − 12 hours); the audit counts, per offset, how many
    events land on a DIFFERENT local calendar day than their UTC day.
    Pure int64 epoch arithmetic in one vectorized pass (floor division
    handles the pre-1970-negative case identically in numpy and DuckDB's
    sign-corrected expression — offsets here keep timestamps positive)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        off = uid % 24 - 12
        utc_day = us // _DAY_US
        local_day = (us + off * _HOUR_US) // _DAY_US
        return (
            pa.table(
                {
                    "offset_h": pa.array(off.astype(np.int64), pa.int64()),
                    "n": pa.array(np.ones(len(off), np.int64)),
                    "shifted": pa.array((local_day != utc_day).astype(np.int64), pa.int64()),
                }
            )
            .group_by("offset_h")
            .aggregate([("n", "sum"), ("shifted", "sum")])
            .rename_columns(["offset_h", "n", "shifted"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("offset_h")
        .aggregate(Sum("n", alias_name="n_events"), Sum("shifted", alias_name="n_day_shifted"))
        .to_pandas()
        .sort_values("offset_h", kind="mergesort")
    )
    return pa.table(
        {
            "offset_h": pa.array(g["offset_h"].to_numpy().astype(np.int64), pa.int64()),
            "n_events": pa.array(g["n_events"].to_numpy().astype(np.int64), pa.int64()),
            "n_day_shifted": pa.array(
                g["n_day_shifted"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


EVENTS_TZ_NORMALIZATION_AUDIT_SQL = """
WITH e AS (
  SELECT user_id % 24 - 12 AS offset_h,
         epoch_us(ts) // 86400000000 AS utc_day,
         (epoch_us(ts) + (user_id % 24 - 12) * 3600000000) // 86400000000
           AS local_day
  FROM events
)
SELECT CAST(offset_h AS BIGINT) AS offset_h,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN local_day <> utc_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_day_shifted
FROM e GROUP BY offset_h ORDER BY offset_h
"""


def nation_revenue_comovement_matrix(sf_dir: str):
    """Revenue CO-MOVEMENT between nations — for every nation pair, the
    count of months whose month-over-month revenue deltas share a sign vs
    oppose (zero-filled over the global month scaffold, so a quiet month
    is a real zero, not a gap) — correlation-flavored evidence without a
    single float.  The orders⋈customer join runs 8-way hash-partitioned;
    monthly cells fold via block partials; the 25-nation pair matrix is
    driver work."""
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(
                pc.add(pc.multiply(pc.cast(t["o_totalprice"], pa.float64()), 100.0), 0.5)
            ),
            pa.int64(),
        )
        ym = pc.strftime(t["o_orderdate"], format="%Y-%m")
        return (
            pa.table(
                {
                    "nk": pc.cast(t["c_nationkey"], pa.int64()),
                    "ym": ym,
                    "y": cents,
                }
            )
            .group_by(["nk", "ym"])
            .aggregate([("y", "sum")])
            .rename_columns(["nk", "ym", "y"])
        )

    g = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["nk", "ym"])
        .aggregate(Sum("y", alias_name="y"))
        .to_pandas()
    )
    months = sorted(g["ym"].unique())
    m_ix = {m: i for i, m in enumerate(months)}
    nations = sorted(int(n) for n in g["nk"].unique())
    series = {n: np.zeros(len(months), np.int64) for n in nations}
    for nk, ym, y in zip(g["nk"].astype(int), g["ym"], g["y"].astype(int)):
        series[nk][m_ix[ym]] = y
    signs = {n: np.sign(np.diff(series[n])) for n in nations}
    rows = []
    for i in range(len(nations)):
        for j in range(i + 1, len(nations)):
            a, b = nations[i], nations[j]
            prod = signs[a] * signs[b]
            rows.append((a, b, int((prod > 0).sum()), int((prod < 0).sum())))
    return pa.table(
        {
            "nation_a": pa.array([r[0] for r in rows], pa.int64()),
            "nation_b": pa.array([r[1] for r in rows], pa.int64()),
            "n_agree": pa.array([r[2] for r in rows], pa.int64()),
            "n_oppose": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


NATION_REVENUE_COMOVEMENT_MATRIX_SQL = """
WITH cell AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk,
         strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY nk, ym
), scaffold AS (
  SELECT nk, ym
  FROM (SELECT DISTINCT nk FROM cell)
  CROSS JOIN (SELECT DISTINCT ym FROM cell)
), filled AS (
  SELECT s.nk, s.ym, COALESCE(c.y, 0) AS y
  FROM scaffold s LEFT JOIN cell c ON s.nk = c.nk AND s.ym = c.ym
), d AS (
  SELECT nk, ym,
         sign(y - lag(y) OVER (PARTITION BY nk ORDER BY ym)) AS sg
  FROM filled
), sd AS (
  SELECT nk, ym, sg FROM d WHERE sg IS NOT NULL
)
SELECT a.nk AS nation_a, b.nk AS nation_b,
       CAST(SUM(CASE WHEN a.sg * b.sg > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree,
       CAST(SUM(CASE WHEN a.sg * b.sg < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oppose
FROM sd a JOIN sd b ON a.ym = b.ym AND a.nk < b.nk
GROUP BY a.nk, b.nk
ORDER BY nation_a, nation_b
"""


def events_first_last_touch_matrix(sf_dir: str):
    """First-touch × last-touch attribution census: for every user whose
    history contains a purchase, the types of the FIRST and LAST events
    strictly before the first purchase ('direct' × 'direct' when the
    purchase opens the history) — the two-endpoint attribution picture
    the linear model in the registry averages away.  Co-partition by
    user; per-group argmin scans; type²-bounded census."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    _empty = pa.table(
        {
            "first_touch": pa.array([], pa.string()),
            "last_touch": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def per_user(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        types = s["event_type"].to_pylist()
        try:
            p = types.index("purchase")
        except ValueError:
            return _empty
        first = types[0] if p > 0 else "direct"
        last = types[p - 1] if p > 0 else "direct"
        return pa.table(
            {
                "first_touch": pa.array([first], pa.string()),
                "last_touch": pa.array([last], pa.string()),
                "n": pa.array([1], pa.int64()),
            }
        )

    g = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["first_touch", "last_touch"])
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
        .sort_values(["first_touch", "last_touch"], kind="mergesort")
    )
    return pa.table(
        {
            "first_touch": pa.array([str(x) for x in g["first_touch"]], pa.string()),
            "last_touch": pa.array([str(x) for x in g["last_touch"]], pa.string()),
            "n_users": pa.array(g["n_users"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


EVENTS_FIRST_LAST_TOUCH_MATRIX_SQL = """
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), p AS (
  SELECT user_id, MIN(rn) AS prn
  FROM s WHERE event_type = 'purchase' GROUP BY user_id
), ft AS (
  SELECT p.user_id,
         CASE WHEN p.prn = 1 THEN 'direct'
              ELSE (SELECT event_type FROM s
                    WHERE s.user_id = p.user_id AND s.rn = 1) END AS first_touch,
         CASE WHEN p.prn = 1 THEN 'direct'
              ELSE (SELECT event_type FROM s
                    WHERE s.user_id = p.user_id AND s.rn = p.prn - 1)
         END AS last_touch
  FROM p
)
SELECT first_touch, last_touch, CAST(COUNT(*) AS BIGINT) AS n_users
FROM ft GROUP BY first_touch, last_touch
ORDER BY first_touch, last_touch
"""


def docs_proximity_search(sf_dir: str):
    """Positional proximity search — docs where 'join' occurs within three
    token positions of 'merge': per matching doc, the number of qualifying
    position pairs and the minimum absolute distance.  The positional-
    index retrieval primitive (phrase search with slop); positions come
    from the one tokenizer pass, the pair test is a tiny vectorized
    broadcast per doc."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    _empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_pairs": pa.array([], pa.int64()),
            "min_dist": pa.array([], pa.int64()),
        }
    )

    def probe(t: pa.Table) -> pa.Table:
        import re

        ids, np_, md = [], [], []
        for doc_id, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = [w for w in re.split(r"[^a-z0-9]+", (s or "").lower()) if w]
            pa_ = np.array(
                [i for i, w in enumerate(toks) if w == "join"], np.int64
            )
            pb = np.array(
                [i for i, w in enumerate(toks) if w == "merge"], np.int64
            )
            if len(pa_) == 0 or len(pb) == 0:
                continue
            dist = np.abs(pa_[:, None] - pb[None, :])
            hits = int((dist <= 3).sum())
            if hits == 0:
                continue
            ids.append(doc_id)
            np_.append(hits)
            md.append(int(dist.min()))
        if not ids:
            return _empty
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_pairs": pa.array(np_, pa.int64()),
                "min_dist": pa.array(md, pa.int64()),
            }
        )

    t = pa.concat_tables(
        list(ds.map_batches(probe, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))


DOCS_PROXIMITY_SEARCH_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
), f AS (
  SELECT doc_id, unnest(l) AS term,
         CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM d
), pj AS (SELECT doc_id, pos FROM f WHERE term = 'join'),
pm AS (SELECT doc_id, pos FROM f WHERE term = 'merge')
SELECT pj.doc_id,
       CAST(SUM(CASE WHEN ABS(pj.pos - pm.pos) <= 3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pairs,
       CAST(MIN(ABS(pj.pos - pm.pos)) AS BIGINT) AS min_dist
FROM pj JOIN pm ON pj.doc_id = pm.doc_id
GROUP BY pj.doc_id
HAVING SUM(CASE WHEN ABS(pj.pos - pm.pos) <= 3 THEN 1 ELSE 0 END) > 0
ORDER BY pj.doc_id
"""
