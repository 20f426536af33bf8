"""Query-registry family module 14: retrieval models / sequence-integrity
/ novelty / concentration / dictionary-layout ops (round-5 continuation,
wave D — names verified absent from the 790-entry registry):

* `docs_query_likelihood_topk` — Dirichlet-smoothed query-likelihood
  retrieval (the language-model IR counterpart of the registry's BM25),
  bit-identical floats via the scalar-libm ln discipline;
* `docs_rrf_fusion_topk` — reciprocal-rank fusion of two exact rankers
  with integer-scaled RRF scores (no float in the fusion);
* `events_id_gap_audit` — event-id sequence integrity: missing-id count
  and the largest gap, computed distributed via id-bucket partials
  stitched on the driver (the exactly-once accounting primitive);
* `docs_bigram_novelty_curve` — when does the corpus stop producing new
  bigrams?  First-seen doc-id deciles (decile cut from parquet metadata);
* `part_supplier_hhi_census` — per-part supplier concentration
  (Herfindahl, exact ppm via Σq²·10⁶ // Q²) bucketed corpus-wide;
* `docs_term_dict_frontcoding_audit` — front-coding savings over the
  sorted term dictionary (Σ LCP with the predecessor), the dictionary-
  page layout number an index builder budgets with.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ._common import _t

_QL_TERMS = ("join", "merge", "scan")
_QL_MU = 100


def docs_query_likelihood_topk(sf_dir: str):
    """Dirichlet-smoothed query likelihood: score(d) = Σ_w ln((c(w,d)·|C|
    + μ·cf(w)) / ((|d|+μ)·|C|)) for the fixed query (join, merge, scan),
    μ = 100.  Every product stays exact int64; each term is ONE division
    + ONE scalar-libm ln, summed in fixed query order — the identical
    IEEE tree DuckDB's LN evaluates, so the float scores (and therefore
    the top-20 ordering with doc_id tie-break) hash-match bit-for-bit.
    One distributed pass collects per-doc term counts and lengths; the
    collection-frequency fold and scoring run on the corpus-bounded
    driver table."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        import re

        ids, dls, c0, c1, c2 = [], [], [], [], []
        for doc_id, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = [w for w in re.split(r"[^a-z0-9]+", (s or "").lower()) if w]
            ids.append(doc_id)
            dls.append(len(toks))
            c0.append(toks.count(_QL_TERMS[0]))
            c1.append(toks.count(_QL_TERMS[1]))
            c2.append(toks.count(_QL_TERMS[2]))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
                "c0": pa.array(c0, pa.int64()),
                "c1": pa.array(c1, pa.int64()),
                "c2": pa.array(c2, pa.int64()),
            }
        )

    g = pa.concat_tables(
        list(
            ds.map_batches(counts, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    big_c = int(pc.sum(g["dl"]).as_py())
    cfs = [int(pc.sum(g[c]).as_py()) for c in ("c0", "c1", "c2")]
    rows = []
    for doc_id, dl, a, b, c in zip(
        g["doc_id"].to_pylist(),
        g["dl"].to_pylist(),
        g["c0"].to_pylist(),
        g["c1"].to_pylist(),
        g["c2"].to_pylist(),
    ):
        score = 0.0
        for cwd, cf in zip((a, b, c), cfs):
            num = cwd * big_c + _QL_MU * cf
            den = (dl + _QL_MU) * big_c
            score += math.log(num / den)
        rows.append((doc_id, dl, score))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:20]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "dl": pa.array([r[1] for r in rows], pa.int64()),
            "ql_score": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


DOCS_QUERY_LIKELIHOOD_TOPK_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
), st AS (
  SELECT doc_id,
         CAST(len(l) AS BIGINT) AS dl,
         CAST(len(list_filter(l, x -> x = 'join')) AS BIGINT) AS c0,
         CAST(len(list_filter(l, x -> x = 'merge')) AS BIGINT) AS c1,
         CAST(len(list_filter(l, x -> x = 'scan')) AS BIGINT) AS c2
  FROM d
), tot AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS big_c,
         CAST(SUM(c0) AS BIGINT) AS cf0,
         CAST(SUM(c1) AS BIGINT) AS cf1,
         CAST(SUM(c2) AS BIGINT) AS cf2
  FROM st
)
SELECT doc_id, dl,
       LN(CAST(c0 * big_c + 100 * cf0 AS DOUBLE)
          / CAST((dl + 100) * big_c AS DOUBLE))
       + LN(CAST(c1 * big_c + 100 * cf1 AS DOUBLE)
            / CAST((dl + 100) * big_c AS DOUBLE))
       + LN(CAST(c2 * big_c + 100 * cf2 AS DOUBLE)
            / CAST((dl + 100) * big_c AS DOUBLE)) AS ql_score
FROM st, tot
ORDER BY ql_score DESC, doc_id
LIMIT 20
"""


def docs_rrf_fusion_topk(sf_dir: str):
    """Reciprocal-rank fusion of two exact rankers — (a) frequency of
    'join' (desc) and (b) document token length (desc), both doc_id
    tie-broken — with the integer-scaled score 10⁹//(60+rank_a) +
    10⁹//(60+rank_b): rank fusion without a float anywhere, the ensemble
    primitive of hybrid retrieval.  Ranks are dense ROW_NUMBER positions
    over the corpus-bounded driver table (the distributed pass only
    collects per-doc counts); top-20 by fused score, doc_id."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        import re

        ids, dls, cj = [], [], []
        for doc_id, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = [w for w in re.split(r"[^a-z0-9]+", (s or "").lower()) if w]
            ids.append(doc_id)
            dls.append(len(toks))
            cj.append(toks.count("join"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "dl": pa.array(dls, pa.int64()),
                "cj": pa.array(cj, pa.int64()),
            }
        )

    g = (
        pa.concat_tables(
            list(
                ds.map_batches(counts, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        .to_pandas()
    )
    ra = g.sort_values(["cj", "doc_id"], ascending=[False, True], kind="mergesort")
    rank_a = dict(zip(ra["doc_id"].astype(int), range(1, len(ra) + 1)))
    rb = g.sort_values(["dl", "doc_id"], ascending=[False, True], kind="mergesort")
    rank_b = dict(zip(rb["doc_id"].astype(int), range(1, len(rb) + 1)))
    rows = []
    for doc_id in g["doc_id"].astype(int):
        s = 1_000_000_000 // (60 + rank_a[doc_id]) + 1_000_000_000 // (60 + rank_b[doc_id])
        rows.append((doc_id, rank_a[doc_id], rank_b[doc_id], s))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:20]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank_tf": pa.array([r[1] for r in rows], pa.int64()),
            "rank_len": pa.array([r[2] for r in rows], pa.int64()),
            "rrf_score": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


DOCS_RRF_FUSION_TOPK_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
), st AS (
  SELECT doc_id,
         CAST(len(l) AS BIGINT) AS dl,
         CAST(len(list_filter(l, x -> x = 'join')) AS BIGINT) AS cj
  FROM d
), r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cj DESC, doc_id) AS rank_tf,
         ROW_NUMBER() OVER (ORDER BY dl DESC, doc_id) AS rank_len
  FROM st
)
SELECT doc_id,
       CAST(rank_tf AS BIGINT) AS rank_tf,
       CAST(rank_len AS BIGINT) AS rank_len,
       CAST(1000000000 // (60 + rank_tf)
            + 1000000000 // (60 + rank_len) AS BIGINT) AS rrf_score
FROM r
ORDER BY rrf_score DESC, doc_id
LIMIT 20
"""


def events_id_gap_audit(sf_dir: str):
    """Event-id sequence-integrity audit (the exactly-once accounting
    primitive): total ids, span, missing count, and the LARGEST adjacent
    gap with its start id (smallest start on ties).  Distributed shape:
    ids hash into //1024 buckets; each bucket group reports its count,
    min, max, internal max gap and that gap's start; the driver stitches
    bucket-boundary gaps from the bucket min/max list — no global sort,
    no driver id list."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id"])

    def bucketize(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(ids // 1024, pa.int64()),
                "event_id": pa.array(ids, pa.int64()),
            }
        )

    _empty = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "lo": pa.array([], pa.int64()),
            "hi": pa.array([], pa.int64()),
            "max_gap": pa.array([], pa.int64()),
            "gap_start": pa.array([], pa.int64()),
        }
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        ids = np.sort(g["event_id"].combine_chunks().to_numpy(zero_copy_only=False))
        if len(ids) == 0:
            return _empty
        if len(ids) > 1:
            d = np.diff(ids)
            k = int(np.argmax(d))  # first (= smallest start) max on ties
            mg, gs = int(d[k]), int(ids[k])
        else:
            mg, gs = 0, int(ids[0])
        return pa.table(
            {
                "bucket": pa.array([int(ids[0]) // 1024], pa.int64()),
                "n": pa.array([len(ids)], pa.int64()),
                "lo": pa.array([int(ids[0])], pa.int64()),
                "hi": pa.array([int(ids[-1])], pa.int64()),
                "max_gap": pa.array([mg], pa.int64()),
                "gap_start": pa.array([gs], pa.int64()),
            }
        )

    g = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .to_pandas()
        .sort_values("bucket", kind="mergesort")
    )
    n = int(g["n"].sum())
    lo, hi = int(g["lo"].min()), int(g["hi"].max())
    best_gap, best_start = 0, lo
    prev_hi = None
    for _, r in g.iterrows():
        if prev_hi is not None:
            d = int(r["lo"]) - prev_hi
            if d > best_gap:
                best_gap, best_start = d, prev_hi
        if int(r["max_gap"]) > best_gap:
            best_gap, best_start = int(r["max_gap"]), int(r["gap_start"])
        prev_hi = int(r["hi"])
    return pa.table(
        {
            "n_ids": pa.array([n], pa.int64()),
            "min_id": pa.array([lo], pa.int64()),
            "max_id": pa.array([hi], pa.int64()),
            "n_missing": pa.array([hi - lo + 1 - n], pa.int64()),
            "max_gap": pa.array([best_gap], pa.int64()),
            "gap_start": pa.array([best_start], pa.int64()),
        }
    )


EVENTS_ID_GAP_AUDIT_SQL = """
WITH s AS (
  SELECT event_id,
         lag(event_id) OVER (ORDER BY event_id) AS prev
  FROM events
), gaps AS (
  SELECT event_id - prev AS d, prev
  FROM s WHERE prev IS NOT NULL
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_ids,
         CAST(MIN(event_id) AS BIGINT) AS min_id,
         CAST(MAX(event_id) AS BIGINT) AS max_id
  FROM events
), best AS (
  SELECT CAST(COALESCE(MAX(d), 0) AS BIGINT) AS max_gap FROM gaps
), pick AS (
  SELECT CAST(COALESCE(
           (SELECT MIN(prev) FROM gaps WHERE d = (SELECT max_gap FROM best)),
           (SELECT min_id FROM agg)) AS BIGINT) AS gap_start
)
SELECT n_ids, min_id, max_id,
       CAST(max_id - min_id + 1 - n_ids AS BIGINT) AS n_missing,
       max_gap, gap_start
FROM agg, best, pick
"""


def docs_bigram_novelty_curve(sf_dir: str):
    """Bigram novelty curve — in which doc-id DECILE is each distinct
    bigram first seen?  The saturating counterpart of the Heaps vocab
    growth already tracked at the unigram level: a flat tail means new
    data stops paying.  The decile cut uses the max doc_id from parquet
    row-group statistics (metadata, no scan); first-seen is a distributed
    min-doc_id per bigram; the decile census is vocabulary²-bounded."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(_t(sf_dir, "documents")).metadata
    ci = md.schema.to_arrow_schema().get_field_index("doc_id")
    max_id = max(
        md.row_group(rg).column(ci).statistics.max for rg in range(md.num_row_groups)
    )

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import re

        rows: dict = {}
        for doc_id, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = [w for w in re.split(r"[^a-z0-9]+", (s or "").lower()) if w]
            for a, b in zip(toks[:-1], toks[1:]):
                k = f"{a} {b}"
                if k not in rows or doc_id < rows[k]:
                    rows[k] = doc_id
        ks = sorted(rows)
        return pa.table(
            {
                "bigram": pa.array(ks, pa.string()),
                "first_id": pa.array([rows[k] for k in ks], pa.int64()),
            }
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Min("first_id", alias_name="first_id"))
        .to_pandas()
    )
    dec = np.minimum(
        9, g["first_id"].to_numpy().astype(np.int64) * 10 // (int(max_id) + 1)
    )
    from collections import Counter

    cnt = Counter(dec.tolist())
    ks = sorted(cnt)
    return pa.table(
        {
            "decile": pa.array(ks, pa.int64()),
            "n_new_bigrams": pa.array([cnt[k] for k in ks], pa.int64()),
        }
    )


DOCS_BIGRAM_NOVELTY_CURVE_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
), f AS (
  SELECT doc_id, unnest(l) AS term,
         CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM d
), w AS (
  SELECT doc_id, term AS a,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM f
), fs AS (
  SELECT a, b, CAST(MIN(doc_id) AS BIGINT) AS first_id
  FROM w WHERE b IS NOT NULL GROUP BY a, b
), mx AS (SELECT MAX(doc_id) AS max_id FROM documents)
SELECT CAST(LEAST(9, first_id * 10 // (max_id + 1)) AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_new_bigrams
FROM fs, mx
GROUP BY decile ORDER BY decile
"""


def part_supplier_hhi_census(sf_dir: str):
    """Per-part supplier CONCENTRATION (Herfindahl index over each part's
    supplier quantity shares, exact ppm via Σq²·10⁶ // Q²) censused into
    ten 0.1-wide buckets — the sourcing-risk histogram behind dual-source
    policies.  One block partial folds (part, supplier) quantities; the
    HHI and census fold over the part×supplier-bounded table."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "pk": t["l_partkey"],
                    "sk": t["l_suppkey"],
                    "q": pc.cast(t["l_quantity"], pa.int64()),
                }
            )
            .group_by(["pk", "sk"])
            .aggregate([("q", "sum")])
            .rename_columns(["pk", "sk", "q"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pk", "sk"])
        .aggregate(Sum("q", alias_name="q"))
        .to_pandas()
    )
    from collections import Counter

    cnt: Counter = Counter()
    for pk, sub in g.groupby("pk", sort=False):
        q = sub["q"].to_numpy().astype(np.int64)
        tot = int(q.sum())
        hhi = int((q.astype(object) ** 2).sum()) * 1_000_000 // (tot * tot)
        cnt[min(9, hhi // 100_000)] += 1
    ks = sorted(cnt)
    return pa.table(
        {
            "hhi_bucket": pa.array(ks, pa.int64()),
            "n_parts": pa.array([cnt[k] for k in ks], pa.int64()),
        }
    )


PART_SUPPLIER_HHI_CENSUS_SQL = """
WITH c AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY pk, sk
), h AS (
  SELECT pk,
         SUM(CAST(q AS HUGEINT) * q) * 1000000
           // (CAST(SUM(q) AS HUGEINT) * SUM(q)) AS hhi
  FROM c GROUP BY pk
)
SELECT CAST(LEAST(9, hhi // 100000) AS BIGINT) AS hhi_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM h GROUP BY hhi_bucket ORDER BY hhi_bucket
"""


def docs_term_dict_frontcoding_audit(sf_dir: str):
    """Front-coding audit over the sorted term dictionary: the bytes a
    prefix-compressed dictionary page saves are Σ LCP(termᵢ, termᵢ₋₁)
    over the sort order — the layout number an index builder budgets
    with.  Term collection is the usual distributed count (also reported
    per term so the page layout is reproducible); the LCP fold is
    vocabulary-bounded."""
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

    g = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("term", kind="mergesort")
    )
    terms = [str(t) for t in g["term"]]

    def lcp(a: str, b: str) -> int:
        i = 0
        while i < min(len(a), len(b)) and a[i] == b[i]:
            i += 1
        return i

    lcps = [0] + [lcp(terms[i - 1], terms[i]) for i in range(1, len(terms))]
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "term_bytes": pa.array([len(t) for t in terms], pa.int64()),
            "lcp_prev": pa.array(lcps, pa.int64()),
        }
    )


DOCS_TERM_DICT_FRONTCODING_AUDIT_SQL = """
WITH f AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
  FROM documents
), tc AS (
  SELECT term FROM f GROUP BY term
), s AS (
  SELECT term, lag(term) OVER (ORDER BY term) AS prev FROM tc
)
SELECT term,
       CAST(strlen(term) AS BIGINT) AS term_bytes,
       CAST(COALESCE(
         len(list_filter(range(1, LEAST(strlen(term), strlen(prev)) + 1),
                         p -> substr(term, 1, p) = substr(prev, 1, p))),
         0) AS BIGINT) AS lcp_prev
FROM s
ORDER BY term
"""
