"""Query-registry family module 18: imputation / calibration /
experimentation ops (round-5 continuation, wave H — three families the
805-entry registry did not yet cover):

* `events_user_value_locf_daily` — last-observation-carried-forward
  imputation sampled at weekly probe days inside each user's activity
  span (the gap-fill primitive of feature stores), deterministic
  tie-break by reducing ties to the max event id per timestamp;
* `docs_bigram_lm_reliability_bins` — CALIBRATION of the bigram language
  model: train on even doc_ids, evaluate the modal-continuation
  prediction on odd doc_ids, and bucket contexts by predicted
  probability decile — predicted-ppm vs realized accuracy per bin, all
  exact integers;
* `events_cuped_adjustment_terms` — CUPED variance-reduction sufficient
  statistics: per-user pre/post value sums around the metadata midpoint
  day, folded to exact global Σpre, Σpost, Σpre², Σpre·post (the θ
  regression inputs) without a float anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t

_DAY_US = 86_400_000_000


def events_user_value_locf_daily(sf_dir: str):
    """LOCF gap-fill: for every user and every 7th day of their activity
    span (first-event day + 0, 7, 14, …), the value (cents) of the most
    recent event at or before that day.  Events sharing a timestamp are
    first reduced to the max-event-id row so the carried value is
    deterministic.  Co-partition by user; one sorted searchsorted kernel
    per group; output is span-bounded (|span|/7 rows per user)."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "day": pa.array([], pa.int64()),
            "locf_cents": pa.array([], pa.int64()),
        }
    )

    def per_user(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        ts = s["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            s["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        # reduce duplicate timestamps to the LAST row (max event_id)
        keep = np.ones(len(ts), bool)
        keep[:-1] = ts[:-1] != ts[1:]
        ts, cents = ts[keep], cents[keep]
        d0 = int(ts[0] // _DAY_US)
        d1 = int(ts[-1] // _DAY_US)
        probes = np.arange(d0, d1 + 1, 7, dtype=np.int64)
        # last event at or before the END of the probe day
        idx = np.searchsorted(ts, (probes + 1) * _DAY_US, side="left") - 1
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(probes), s["user_id"][0].as_py(), np.int64), pa.int64()
                ),
                "day": pa.array(probes, pa.int64()),
                "locf_cents": pa.array(cents[idx], pa.int64()),
            }
        )

    t = pa.concat_tables(
        list(
            ds.groupby("user_id")
            .map_groups(per_user, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
        or [_empty]
    )
    return t.take(
        pc.sort_indices(t, sort_keys=[("user_id", "ascending"), ("day", "ascending")])
    )


EVENTS_USER_VALUE_LOCF_DAILY_SQL = """
WITH dedup AS (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events
), e AS (
  SELECT user_id, epoch_us(ts) AS tus,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM dedup WHERE rn = 1
), span AS (
  SELECT user_id,
         MIN(tus) // 86400000000 AS d0,
         MAX(tus) // 86400000000 AS d1
  FROM e GROUP BY user_id
), probes AS (
  SELECT user_id,
         CAST(unnest(range(d0, d1 + 1, 7)) AS BIGINT) AS day
  FROM span
)
SELECT p.user_id, p.day,
       (SELECT cents FROM e
        WHERE e.user_id = p.user_id AND e.tus < (p.day + 1) * 86400000000
        ORDER BY e.tus DESC LIMIT 1) AS locf_cents
FROM probes p
ORDER BY p.user_id, p.day
"""


def docs_bigram_lm_reliability_bins(sf_dir: str):
    """Bigram-LM CALIBRATION: train the modal-continuation model on even
    doc_ids, evaluate on odd doc_ids, and bucket every context by the
    TRAIN-predicted probability decile (ppm // 100 000).  Per bin:
    contexts, test bigrams, correct predictions — predicted-ppm mass vs
    realized accuracy is the reliability diagram, in exact integers.
    Ties in the modal continuation break to the lexicographically
    smallest next token on both sides."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        import re

        rows: dict = {}
        for doc_id, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = [w for w in re.split(r"[^a-z0-9]+", (s or "").lower()) if w]
            split = int(doc_id) % 2  # 0 = train, 1 = test
            for a, b in zip(toks[:-1], toks[1:]):
                k = (split, a, b)
                rows[k] = rows.get(k, 0) + 1
        ks = sorted(rows)
        return pa.table(
            {
                "split": pa.array([k[0] for k in ks], pa.int64()),
                "a": pa.array([k[1] for k in ks], pa.string()),
                "b": pa.array([k[2] for k in ks], pa.string()),
                "n": pa.array([rows[k] for k in ks], pa.int64()),
            }
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["split", "a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    train = g[g["split"] == 0]
    test = g[g["split"] == 1]
    ctx_tot: dict = {}
    modal: dict = {}
    for a, b, n in zip(train["a"], train["b"], train["n"].astype(int)):
        a, b = str(a), str(b)
        ctx_tot[a] = ctx_tot.get(a, 0) + n
        cur = modal.get(a)
        if cur is None or n > cur[1] or (n == cur[1] and b < cur[0]):
            modal[a] = (b, n)
    from collections import defaultdict

    bins = defaultdict(lambda: [0, 0, 0])  # contexts, test bigrams, correct
    seen_ctx = set()
    for a in modal:
        ppm = modal[a][1] * 1_000_000 // ctx_tot[a]
        bins[min(9, ppm // 100_000)][0] += 1
        seen_ctx.add(a)
    for a, b, n in zip(test["a"], test["b"], test["n"].astype(int)):
        a, b = str(a), str(b)
        if a not in modal:
            continue
        ppm = modal[a][1] * 1_000_000 // ctx_tot[a]
        bx = min(9, ppm // 100_000)
        bins[bx][1] += n
        if b == modal[a][0]:
            bins[bx][2] += n
    ks = sorted(bins)
    return pa.table(
        {
            "bin": pa.array(ks, pa.int64()),
            "n_contexts": pa.array([bins[k][0] for k in ks], pa.int64()),
            "n_test_bigrams": pa.array([bins[k][1] for k in ks], pa.int64()),
            "n_correct": pa.array([bins[k][2] for k in ks], pa.int64()),
        }
    )


DOCS_BIGRAM_LM_RELIABILITY_BINS_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 2 AS split,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents
), f AS (
  SELECT doc_id, split, unnest(l) AS term,
         CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM d
), w AS (
  SELECT split, term AS a,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM f
), bg AS (
  SELECT split, a, b, CAST(COUNT(*) AS BIGINT) AS n
  FROM w WHERE b IS NOT NULL GROUP BY split, a, b
), tr AS (SELECT a, b, n FROM bg WHERE split = 0),
ctx AS (SELECT a, CAST(SUM(n) AS BIGINT) AS tot FROM tr GROUP BY a),
modal AS (
  SELECT a, b AS bstar, n AS nstar FROM (
    SELECT a, b, n,
           ROW_NUMBER() OVER (PARTITION BY a ORDER BY n DESC, b) AS rn
    FROM tr) WHERE rn = 1
), pred AS (
  SELECT modal.a, bstar,
         LEAST(9, nstar * 1000000 // tot // 100000) AS bin
  FROM modal JOIN ctx ON modal.a = ctx.a
), te AS (SELECT a, b, n FROM bg WHERE split = 1),
hits AS (
  SELECT pred.bin,
         CAST(SUM(te.n) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN te.b = pred.bstar THEN te.n ELSE 0 END) AS BIGINT)
           AS n_correct
  FROM te JOIN pred ON te.a = pred.a
  GROUP BY pred.bin
), cxs AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_contexts FROM pred GROUP BY bin
)
SELECT cxs.bin,
       n_contexts,
       CAST(COALESCE(hits.n_test, 0) AS BIGINT) AS n_test_bigrams,
       CAST(COALESCE(hits.n_correct, 0) AS BIGINT) AS n_correct
FROM cxs LEFT JOIN hits ON cxs.bin = hits.bin
ORDER BY cxs.bin
"""


def events_cuped_adjustment_terms(sf_dir: str):
    """CUPED variance-reduction sufficient statistics: the event horizon
    splits at the metadata midpoint day; per user, pre- and post-period
    value sums (exact cents, zero when inactive in a period); the global
    fold emits n_users, Σpre, Σpost, Σpre², Σpre·post — everything the
    θ = Cov(pre,post)/Var(pre) adjustment needs, as exact integers (the
    one float division is the reader's).  Per-user partials + one user
    groupby + one scalar fold."""
    import pyarrow.parquet as pq
    from datetime import datetime

    md = pq.ParquetFile(_t(sf_dir, "events")).metadata
    ci = md.schema.to_arrow_schema().get_field_index("ts")
    los, his = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        los.append(st.min)
        his.append(st.max)

    def to_day(d):
        delta = d - datetime(1970, 1, 1)
        return (delta.days * 86_400 + delta.seconds) // 86_400

    half = (to_day(min(los)) + to_day(max(his))) // 2

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False) // _DAY_US
        cents = np.floor(
            t["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        pre = np.where(day <= half, cents, 0)
        post = np.where(day > half, cents, 0)
        return (
            pa.table(
                {
                    "user_id": t["user_id"],
                    "pre": pa.array(pre, pa.int64()),
                    "post": pa.array(post, pa.int64()),
                }
            )
            .group_by("user_id")
            .aggregate([("pre", "sum"), ("post", "sum")])
            .rename_columns(["user_id", "pre", "post"])
        )

    per_user = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("pre", alias_name="pre"), Sum("post", alias_name="post"))
    )

    def fold(t: pa.Table) -> pa.Table:
        pre = t["pre"].combine_chunks().to_numpy(zero_copy_only=False)
        post = t["post"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_users": pa.array([len(pre)], pa.int64()),
                "sum_pre": pa.array([int(pre.sum())], pa.int64()),
                "sum_post": pa.array([int(post.sum())], pa.int64()),
                "sum_pre_sq": pa.array([int((pre * pre).sum())], pa.int64()),
                "sum_pre_post": pa.array([int((pre * post).sum())], pa.int64()),
            }
        )

    g = (
        per_user.map_batches(fold, batch_format="pyarrow")
        .sum(["n_users", "sum_pre", "sum_post", "sum_pre_sq", "sum_pre_post"])
    )
    return pa.table(
        {
            "n_users": pa.array([int(g["sum(n_users)"])], pa.int64()),
            "sum_pre": pa.array([int(g["sum(sum_pre)"])], pa.int64()),
            "sum_post": pa.array([int(g["sum(sum_post)"])], pa.int64()),
            "sum_pre_sq": pa.array([int(g["sum(sum_pre_sq)"])], pa.int64()),
            "sum_pre_post": pa.array([int(g["sum(sum_pre_post)"])], pa.int64()),
        }
    )


EVENTS_CUPED_ADJUSTMENT_TERMS_SQL = """
WITH b AS (
  SELECT (MIN(epoch_us(ts) // 86400000000)
          + MAX(epoch_us(ts) // 86400000000)) // 2 AS half
  FROM events
), u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN epoch_us(ts) // 86400000000 <= half
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS pre,
         CAST(SUM(CASE WHEN epoch_us(ts) // 86400000000 > half
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS post
  FROM events, b GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(pre) AS BIGINT) AS sum_pre,
       CAST(SUM(post) AS BIGINT) AS sum_post,
       CAST(SUM(pre * pre) AS BIGINT) AS sum_pre_sq,
       CAST(SUM(pre * post) AS BIGINT) AS sum_pre_post
FROM u
"""
