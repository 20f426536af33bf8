"""Query-registry family module 21: clustering evaluation / learned
index / cache replay (round-5 continuation, wave K):

* `docs_dedup_bcubed_terms` — B-CUBED sufficient statistics for
  evaluating the (lang, n_chars) dedup clustering against exact-text
  truth clusters: the census of (predicted-cluster size, truth-cluster
  size, intersection size) triples from which B³ precision/recall
  averages follow — all exact integers (the per-item fractions are the
  reader's);
* `orders_learned_index_error_audit` — a level-0 learned index (OLS of
  sorted position on the key) evaluated EXACTLY: slope/intercept kept
  as integer rationals, per-key error via cross-multiplied HUGEINT
  arithmetic, reporting max error and the count beyond a 64-row page —
  the error-bound number an RMI build must know;
* `events_user_lru_hit_census` — order-sensitive LRU(2) cache replay
  over each user's event-type stream (hit when the type is one of the
  two most recently used), censused per event type — the
  state-machine-per-key pattern with a recursive-CTE oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Max, Sum

from ._common import _t


def docs_dedup_bcubed_terms(sf_dir: str):
    """B-CUBED evaluation terms for the registry's exact-dedup key
    (lang, n_chars) against md5(text) truth: for every document, its
    predicted-cluster size c, truth-cluster size t and the overlap o
    (docs sharing BOTH its key and its text); the op censuses the
    (c, t, o) triples so Σ o/c (precision mass) and Σ o/t (recall mass)
    follow exactly.  Two groupby passes over (key, sig) cells — the
    overlap o of a doc IS its (key, sig) cell size, c and t the cell's
    marginals."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "n_chars", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import hashlib

        sigs = [hashlib.md5((s or "").encode()).hexdigest() for s in t["text"].to_pylist()]
        return (
            pa.table(
                {
                    "lang": t["lang"],
                    "n_chars": t["n_chars"],
                    "sig": pa.array(sigs, pa.string()),
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by(["lang", "n_chars", "sig"])
            .aggregate([("n", "sum")])
            .rename_columns(["lang", "n_chars", "sig", "n"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars", "sig"])
        .aggregate(Sum("n", alias_name="o"))
        .to_pandas()
    )
    g["key"] = g["lang"].astype(str) + "|" + g["n_chars"].astype(str)
    c_size = g.groupby("key")["o"].transform("sum")
    t_size = g.groupby("sig")["o"].transform("sum")
    from collections import Counter

    cnt: Counter = Counter()
    for c, t_, o in zip(c_size.astype(int), t_size.astype(int), g["o"].astype(int)):
        cnt[(int(c), int(t_), int(o))] += int(o)  # o docs share this triple
    ks = sorted(cnt)
    return pa.table(
        {
            "pred_size": pa.array([k[0] for k in ks], pa.int64()),
            "truth_size": pa.array([k[1] for k in ks], pa.int64()),
            "overlap": pa.array([k[2] for k in ks], pa.int64()),
            "n_docs": pa.array([cnt[k] for k in ks], pa.int64()),
        }
    )


DOCS_DEDUP_BCUBED_TERMS_SQL = """
WITH cell AS (
  SELECT lang || '|' || CAST(n_chars AS VARCHAR) AS key,
         md5(text) AS sig,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY key, sig
), m AS (
  SELECT cell.key, cell.sig, cell.o,
         SUM(cell.o) OVER (PARTITION BY cell.key) AS c_size,
         SUM(cell.o) OVER (PARTITION BY cell.sig) AS t_size
  FROM cell
)
SELECT CAST(c_size AS BIGINT) AS pred_size,
       CAST(t_size AS BIGINT) AS truth_size,
       o AS overlap,
       CAST(SUM(o) AS BIGINT) AS n_docs
FROM m GROUP BY c_size, t_size, o
ORDER BY pred_size, truth_size, overlap
"""


def orders_learned_index_error_audit(sf_dir: str):
    """Learned-index (RMI level-0) error bound, computed EXACTLY: sorted
    order keys get positions 1..n; OLS of position on the scaled key
    k' = key // 256 keeps every moment inside HUGEINT range at scale;
    the per-key prediction error is evaluated with the slope/intercept
    as INTEGER RATIONALS — err·(n·den) = |pos·n·den − (n·a·k' + Σp·den
    − a·Σk')| — so max error and the beyond-one-page (64 rows) count
    carry no float anywhere.  Fully distributed: positions come from the
    two-phase rank machinery (no global sort), moments from block
    partials, and the error pass re-streams the ranked keys with the
    exact rationals closed over."""
    from ...stages.rank import global_value_rank

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey"])

    def prep(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "kp": pa.array(k // 256, pa.int64()),
            }
        )

    ranked = global_value_rank(
        ds.map_batches(prep, batch_format="pyarrow"),
        value_col="kp",
        id_col="o_orderkey",
        out_col="pos",
    ).materialize()

    def moments(t: pa.Table) -> pa.Table:
        kp = t["kp"].combine_chunks().to_numpy(zero_copy_only=False)
        pos = t["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(kp)], pa.int64()),
                "sk": pa.array([int(kp.sum())], pa.int64()),
                "sp": pa.array([int(pos.sum())], pa.int64()),
                "skk": pa.array([int((kp * kp).sum())], pa.int64()),
                "skp": pa.array([int((kp * pos).sum())], pa.int64()),
            }
        )

    m = ranked.map_batches(moments, batch_format="pyarrow").sum(
        ["n", "sk", "sp", "skk", "skp"]
    )
    n = int(m["sum(n)"])
    sk, sp = int(m["sum(sk)"]), int(m["sum(sp)"])
    skk, skp = int(m["sum(skk)"]), int(m["sum(skp)"])
    den = n * skk - sk * sk
    a = n * skp - sk * sp
    const = sp * den - a * sk
    nden = n * den

    def err_partial(t: pa.Table) -> pa.Table:
        kp = t["kp"].to_pylist()
        pos = t["pos"].to_pylist()
        mx = 0
        beyond = 0
        for p, x in zip(pos, kp):
            err = abs(int(p) * nden - (n * a * int(x) + const)) // nden
            if err > mx:
                mx = err
            if err > 64:
                beyond += 1
        return pa.table(
            {
                "mx": pa.array([int(mx)], pa.int64()),
                "beyond": pa.array([beyond], pa.int64()),
            }
        )

    e = ranked.map_batches(err_partial, batch_format="pyarrow")
    agg = e.aggregate(Max("mx"), Sum("beyond"))
    return pa.table(
        {
            "n_keys": pa.array([n], pa.int64()),
            "max_abs_err_rows": pa.array([int(agg["max(mx)"])], pa.int64()),
            "n_beyond_64": pa.array([int(agg["sum(beyond)"])], pa.int64()),
        }
    )


ORDERS_LEARNED_INDEX_ERROR_AUDIT_SQL = """
WITH r AS (
  SELECT o_orderkey // 256 AS kp,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS pos
  FROM orders
), s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(kp) AS HUGEINT) AS sk,
         CAST(SUM(pos) AS HUGEINT) AS sp,
         CAST(SUM(CAST(kp AS HUGEINT) * kp) AS HUGEINT) AS skk,
         CAST(SUM(CAST(kp AS HUGEINT) * pos) AS HUGEINT) AS skp
  FROM r
), c AS (
  SELECT n, sk, sp,
         n * skk - sk * sk AS den,
         n * skp - sk * sp AS a
  FROM s
), e AS (
  SELECT ABS(CAST(pos AS HUGEINT) * n * den
             - (n * a * kp + sp * den - a * sk)) // (n * den) AS err
  FROM r, c
)
SELECT CAST((SELECT n FROM c) AS BIGINT) AS n_keys,
       CAST(MAX(err) AS BIGINT) AS max_abs_err_rows,
       CAST(SUM(CASE WHEN err > 64 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_beyond_64
FROM e
"""


def events_user_lru_hit_census(sf_dir: str):
    """LRU(2) cache replay per user over the event-type stream: an access
    HITS when its type is one of the two most recently used types, else
    it misses and evicts the colder entry.  Order matters, so this is the
    per-key-state-machine shape (sessionize, token bucket): one sorted
    group kernel per user, censused per event type; the oracle replays
    the same recurrence with a recursive CTE carrying the two-slot
    state."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )
    _empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_accesses": pa.array([], pa.int64()),
            "n_hits": pa.array([], pa.int64()),
        }
    )

    def per_user(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        types = s["event_type"].to_pylist()
        mru, lru = None, None
        acc: dict = {}
        hit: dict = {}
        for t_ in types:
            acc[t_] = acc.get(t_, 0) + 1
            if t_ == mru:
                hit[t_] = hit.get(t_, 0) + 1
            elif t_ == lru:
                hit[t_] = hit.get(t_, 0) + 1
                mru, lru = t_, mru
            else:
                mru, lru = t_, mru
        ks = sorted(acc)
        return pa.table(
            {
                "event_type": pa.array(ks, pa.string()),
                "n_accesses": pa.array([acc[k] for k in ks], pa.int64()),
                "n_hits": pa.array([hit.get(k, 0) for k in ks], pa.int64()),
            }
        )

    g = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_accesses", alias_name="n_accesses"),
            Sum("n_hits", alias_name="n_hits"),
        )
        .to_pandas()
        .sort_values("event_type", kind="mergesort")
    )
    n = g["n_accesses"].to_numpy().astype(np.int64)
    h = g["n_hits"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "event_type": pa.array([str(x) for x in g["event_type"]], pa.string()),
            "n_accesses": pa.array(n, pa.int64()),
            "n_hits": pa.array(h, pa.int64()),
            "hit_ppm": pa.array(h * 1_000_000 // n, pa.int64()),
        }
    )


EVENTS_USER_LRU_HIT_CENSUS_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events
), r AS (
  SELECT user_id, i, event_type,
         CAST(0 AS BIGINT) AS hit,
         event_type AS mru, CAST(NULL AS VARCHAR) AS lru
  FROM e WHERE i = 1
  UNION ALL
  SELECT e.user_id, e.i, e.event_type,
         CASE WHEN e.event_type = r.mru OR e.event_type = r.lru
              THEN 1 ELSE 0 END,
         CASE WHEN e.event_type = r.mru THEN r.mru ELSE e.event_type END,
         CASE WHEN e.event_type = r.mru THEN r.lru ELSE r.mru END
  FROM r JOIN e ON e.user_id = r.user_id AND e.i = r.i + 1
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_accesses,
       CAST(SUM(hit) AS BIGINT) AS n_hits,
       CAST(SUM(hit) * 1000000 // COUNT(*) AS BIGINT) AS hit_ppm
FROM r GROUP BY event_type ORDER BY event_type
"""
