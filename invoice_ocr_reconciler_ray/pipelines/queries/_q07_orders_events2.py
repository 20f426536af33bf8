"""Query-registry family module 7/9 (dominant family: orders_events2; split from the monolithic queries.py)."""

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



def events_type_hourly_profile_l1_matrix(sf_dir: str):
    """Pairwise TOTAL-VARIATION distance between event types' hour-of-day
    profiles, cross-multiplied to exact integers: tv_x = Σ_h |c₁ₕ·N₂ −
    c₂ₕ·N₁| and tv_ppm = tv_x·10⁶ // (2·N₁·N₂) — the which-types-share-a-
    daily-rhythm matrix with zero float smear.  (type, hour) partials
    reduce distributed; the 10-pair fold runs over a 5×24 table on the
    driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        h = pc.hour(t["ts"])
        return (
            pa.table({"ty": t["event_type"], "h": h})
            .group_by(["ty", "h"])
            .aggregate([("ty", "count")])
            .rename_columns(["ty", "h", "n"])
        )

    c = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["ty", "h"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = c.pivot_table(index="h", columns="ty", values="n", fill_value=0)
    piv = piv.reindex(range(24), fill_value=0)
    types = sorted(piv.columns)
    rows = []
    for i, t1 in enumerate(types):
        for t2 in types[i + 1 :]:
            h1 = piv[t1].to_numpy(dtype=np.int64)
            h2 = piv[t2].to_numpy(dtype=np.int64)
            n1, n2 = int(h1.sum()), int(h2.sum())
            tv = int(np.abs(h1 * n2 - h2 * n1).sum())
            rows.append((t1, t2, n1, n2, tv, tv * 1_000_000 // (2 * n1 * n2)))
    return pa.table(
        {
            "type1": pa.array([r[0] for r in rows], pa.string()),
            "type2": pa.array([r[1] for r in rows], pa.string()),
            "n1": pa.array([r[2] for r in rows], pa.int64()),
            "n2": pa.array([r[3] for r in rows], pa.int64()),
            "tv_x": pa.array([r[4] for r in rows], pa.int64()),
            "tv_ppm": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


EVENTS_TYPE_HOURLY_PROFILE_L1_MATRIX_SQL = """
WITH c AS (SELECT event_type AS ty, CAST(hour(ts) AS BIGINT) AS h,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
t AS (SELECT ty, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1),
hrs AS (SELECT unnest(range(0, 24)) AS h),
pairs AS (SELECT t1.ty AS ty1, t1.tot AS n1, t2.ty AS ty2, t2.tot AS n2
          FROM t t1 JOIN t t2 ON t1.ty < t2.ty),
g AS (SELECT p.ty1, p.ty2, p.n1, p.n2,
             ABS(COALESCE(c1.n, 0)*p.n2 - COALESCE(c2.n, 0)*p.n1) AS d
      FROM pairs p CROSS JOIN hrs
      LEFT JOIN c c1 ON c1.ty = p.ty1 AND c1.h = hrs.h
      LEFT JOIN c c2 ON c2.ty = p.ty2 AND c2.h = hrs.h)
SELECT ty1 AS type1, ty2 AS type2, MAX(n1) AS n1, MAX(n2) AS n2,
       CAST(SUM(d) AS BIGINT) AS tv_x,
       CAST(SUM(d) * 1000000 // (2*MAX(n1)*MAX(n2)) AS BIGINT) AS tv_ppm
FROM g GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_props_value_corr_stats(sf_dir: str):
    """Pearson-correlation sufficient statistics between the JSON props
    payload (k, digit-extracted) and the event value in cents: n, Σk, Σv,
    Σkv, Σk², Σv² plus the cross-multiplied numerator n·Σkv − Σk·Σv and
    variance pieces — every downstream r, slope or t-test folds from
    these without the pipeline ever touching a float.  One-row block
    partials combine on the driver in arbitrary-precision Python ints."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["props", "value"])

    def partial(t: pa.Table) -> pa.Table:
        k = pc.cast(
            pc.replace_substring_regex(t["props"], pattern=r"[^0-9]", replacement=""),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(k)], pa.int64()),
                "sk": pa.array([int(k.sum())], pa.int64()),
                "sv": pa.array([int(v.sum())], pa.int64()),
                "skv": pa.array([int((k * v).sum())], pa.int64()),
                "sk2": pa.array([int((k * k).sum())], pa.int64()),
                "sv2": pa.array([int((v * v).sum())], pa.int64()),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    sk = int(p["sk"].sum())
    sv = int(p["sv"].sum())
    skv = int(p["skv"].sum())
    sk2 = int(p["sk2"].sum())
    sv2 = int(p["sv2"].sum())
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_k": pa.array([sk], pa.int64()),
            "sum_v": pa.array([sv], pa.int64()),
            "sum_kv": pa.array([skv], pa.int64()),
            "sum_k2": pa.array([sk2], pa.int64()),
            "sum_v2": pa.array([sv2], pa.int64()),
            "corr_num": pa.array([n * skv - sk * sv], pa.int64()),
            "var_k_x": pa.array([n * sk2 - sk * sk], pa.int64()),
            "var_v_x": pa.array([n * sv2 - sv * sv], pa.int64()),
        }
    )


EVENTS_PROPS_VALUE_CORR_STATS_SQL = """
WITH kv AS (SELECT CAST(regexp_replace(props, '[^0-9]', '', 'g') AS BIGINT)
                       AS k,
                   CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v
            FROM events),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
             CAST(SUM(v) AS BIGINT) AS sum_v,
             CAST(SUM(k*v) AS BIGINT) AS sum_kv,
             CAST(SUM(k*k) AS BIGINT) AS sum_k2,
             CAST(SUM(v*v) AS BIGINT) AS sum_v2
      FROM kv)
SELECT n, sum_k, sum_v, sum_kv, sum_k2, sum_v2,
       CAST(n*sum_kv - sum_k*sum_v AS BIGINT) AS corr_num,
       CAST(n*sum_k2 - sum_k*sum_k AS BIGINT) AS var_k_x,
       CAST(n*sum_v2 - sum_v*sum_v AS BIGINT) AS var_v_x
FROM s
"""


def embeddings_lead_orthant_census(sf_dir: str):
    """Joint sign structure of the leading 4 embedding dimensions: each
    vector maps to one of 16 orthants (bit i set ⇔ dim i+1 positive) and
    the census counts occupancy — a uniformity check on the head of the
    space (PCA-rotated embeddings should spread; a collapsed head piles
    into few orthants).  Pure block-local bit packing; the shuffle moves
    16-row partials."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False))[:, :4]
        code = ((m > 0).astype(np.int64) * np.array([1, 2, 4, 8])).sum(axis=1)
        vals, counts = np.unique(code, return_counts=True)
        return pa.table(
            {
                "orthant": pa.array(vals.astype(np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("orthant")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["orthant"])
    )


EMBEDDINGS_LEAD_ORTHANT_CENSUS_SQL = """
SELECT CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
            + 2*(CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END)
            + 4*(CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END)
            + 8*(CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS orthant,
       CAST(COUNT(*) AS BIGINT) AS n
FROM embeddings GROUP BY 1 ORDER BY 1
"""


def events_value_spike_census(sf_dir: str):
    """Neighbor-relative SPIKE census: an interior event is a spike when
    its value (cents) more than doubles BOTH temporal neighbors within the
    same user's stream — the point-anomaly complement to the global
    z-score detector (local context, zero distribution assumptions).
    Exact integers: per type, interior count and spike count + ppm.
    Per-user streams sort inside map_groups; only per-type counters
    shuffle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type", "value"]
    )

    def per_user(g: pa.Table) -> pa.Table:
        s = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        v = _cents(s["value"]).to_numpy(zero_copy_only=False)
        ty = s["event_type"].to_numpy(zero_copy_only=False)
        if len(v) < 3:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_interior": pa.array([], pa.int64()),
                    "n_spikes": pa.array([], pa.int64()),
                }
            )
        mid = v[1:-1]
        spike = (mid > 2 * v[:-2]) & (mid > 2 * v[2:])
        import pandas as pd

        df = pd.DataFrame({"event_type": ty[1:-1], "spike": spike})
        agg = df.groupby("event_type")["spike"].agg(["size", "sum"]).reset_index()
        return pa.table(
            {
                "event_type": pa.array(agg["event_type"].to_numpy(), pa.string()),
                "n_interior": pa.array(agg["size"].to_numpy(dtype=np.int64)),
                "n_spikes": pa.array(agg["sum"].to_numpy(dtype=np.int64)),
            }
        )

    agg = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_interior", alias_name="n_interior"),
            Sum("n_spikes", alias_name="n_spikes"),
        )
        .to_pandas()
        .sort_values("event_type")
    )
    ni = agg["n_interior"].to_numpy(dtype=np.int64)
    ns = agg["n_spikes"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"].to_numpy(), pa.string()),
            "n_interior": pa.array(ni),
            "n_spikes": pa.array(ns),
            "spike_ppm": pa.array(ns * 1_000_000 // ni),
        }
    )


EVENTS_VALUE_SPIKE_CENSUS_SQL = """
WITH s AS (SELECT event_type,
                  CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS v,
                  lag(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER w AS pv,
                  lead(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) OVER w AS nv
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
i AS (SELECT event_type,
             CASE WHEN v > 2*pv AND v > 2*nv THEN 1 ELSE 0 END AS spike
      FROM s WHERE pv IS NOT NULL AND nv IS NOT NULL)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_interior,
       CAST(SUM(spike) AS BIGINT) AS n_spikes,
       CAST(SUM(spike) * 1000000 // COUNT(*) AS BIGINT) AS spike_ppm
FROM i GROUP BY 1 ORDER BY 1
"""


def orders_hash_sample_ht_audit(sf_dir: str):
    """Horvitz-Thompson estimator ACCURACY audit: a deterministic 10%
    key-modulo sample of orders, the ×10 HT revenue estimate, the true
    total from the full scan, and the signed error — the is-sampling-safe-
    here evidence every sampled dashboard needs.  Both the sample partials
    and the truth partials fold in the same single pass over each block."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        m = k % 10 == 0
        return pa.table(
            {
                "n_total": pa.array([len(k)], pa.int64()),
                "sum_total": pa.array([int(c.sum())], pa.int64()),
                "n_sample": pa.array([int(m.sum())], pa.int64()),
                "sum_sample": pa.array([int(c[m].sum())], pa.int64()),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n_total = int(p["n_total"].sum())
    sum_total = int(p["sum_total"].sum())
    n_sample = int(p["n_sample"].sum())
    sum_sample = int(p["sum_sample"].sum())
    est = 10 * sum_sample
    return pa.table(
        {
            "n_total": pa.array([n_total], pa.int64()),
            "n_sample": pa.array([n_sample], pa.int64()),
            "true_cents": pa.array([sum_total], pa.int64()),
            "ht_estimate_cents": pa.array([est], pa.int64()),
            "error_cents": pa.array([est - sum_total], pa.int64()),
        }
    )


ORDERS_HASH_SAMPLE_HT_AUDIT_SQL = """
WITH c AS (SELECT o_orderkey AS k,
                  CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN k % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sample,
       CAST(SUM(cents) AS BIGINT) AS true_cents,
       CAST(10 * SUM(CASE WHEN k % 10 = 0 THEN cents ELSE 0 END)
            AS BIGINT) AS ht_estimate_cents,
       CAST(10 * SUM(CASE WHEN k % 10 = 0 THEN cents ELSE 0 END)
            - SUM(cents) AS BIGINT) AS error_cents
FROM c
"""


def orders_mean_excess_ladder(sf_dir: str):
    """Mean-excess function on a threshold LADDER — the peaks-over-
    threshold / GPD tail diagnostic: for thresholds $100k…$500k, the
    exceedance count, total excess (cents) and mean excess in whole cents
    (floor), exact integers end to end (a linearly rising mean excess
    reads as a heavy Pareto tail).  One pass: each block folds to a
    5-row partial."""
    thresholds = np.array(
        [10_000_000, 20_000_000, 30_000_000, 40_000_000, 50_000_000], dtype=np.int64
    )
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        ex = np.maximum(c[:, None] - thresholds[None, :], 0)
        return pa.table(
            {
                "threshold_cents": pa.array(thresholds),
                "n_exceed": pa.array((ex > 0).sum(axis=0).astype(np.int64)),
                "sum_excess": pa.array(ex.sum(axis=0).astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("threshold_cents")
        .aggregate(
            Sum("n_exceed", alias_name="n_exceed"),
            Sum("sum_excess", alias_name="sum_excess"),
        )
        .to_pandas()
        .sort_values("threshold_cents")
    )
    ne = agg["n_exceed"].to_numpy(dtype=np.int64)
    se = agg["sum_excess"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "threshold_cents": pa.array(agg["threshold_cents"].to_numpy(dtype=np.int64)),
            "n_exceed": pa.array(ne),
            "sum_excess_cents": pa.array(se),
            "mean_excess_cents": pa.array(
                np.where(ne > 0, se // np.maximum(ne, 1), 0)
            ),
        }
    )


ORDERS_MEAN_EXCESS_LADDER_SQL = """
WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS cents
           FROM orders),
t AS (SELECT CAST(unnest([10000000, 20000000, 30000000, 40000000, 50000000])
             AS BIGINT) AS threshold_cents)
SELECT t.threshold_cents,
       CAST(SUM(CASE WHEN c.cents > t.threshold_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exceed,
       CAST(SUM(CASE WHEN c.cents > t.threshold_cents
                     THEN c.cents - t.threshold_cents ELSE 0 END)
            AS BIGINT) AS sum_excess_cents,
       CAST(CASE WHEN SUM(CASE WHEN c.cents > t.threshold_cents
                               THEN 1 ELSE 0 END) > 0
                 THEN SUM(CASE WHEN c.cents > t.threshold_cents
                               THEN c.cents - t.threshold_cents ELSE 0 END)
                      // SUM(CASE WHEN c.cents > t.threshold_cents
                                  THEN 1 ELSE 0 END)
                 ELSE 0 END AS BIGINT) AS mean_excess_cents
FROM t, c GROUP BY 1 ORDER BY 1
"""


def docs_dedup_length_bias(sf_dir: str):
    """Does exact dedup BIAS the corpus by length?  Keeps = min doc_id per
    text; the audit emits kept/dropped counts and total lengths plus the
    cross-multiplied mean comparison (sum_kept·n_drop vs sum_drop·n_kept)
    — sign > 0 means survivors run longer.  The shuffle carries (text
    hash → min id, n, len sums) combiners, never the text bodies."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"text": t["text"], "doc_id": t["doc_id"], "n_chars": t["n_chars"]}
            )
            .group_by("text")
            .aggregate([("doc_id", "min"), ("doc_id", "count"), ("n_chars", "sum")])
        )
        return g.rename_columns(["text", "min_id", "n", "len_sum"])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("text")
        .aggregate(
            Min("min_id", alias_name="min_id"),
            Sum("n", alias_name="n"),
            Sum("len_sum", alias_name="len_sum"),
        )
    )

    def fold(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        ls = t["len_sum"].to_numpy(zero_copy_only=False)
        # kept = one per distinct text; its length = len_sum / n (all copies equal)
        kept_len = ls // np.maximum(n, 1)
        return pa.table(
            {
                "n_kept": pa.array([len(n)], pa.int64()),
                "len_kept": pa.array([int(kept_len.sum())], pa.int64()),
                "n_drop": pa.array([int((n - 1).sum())], pa.int64()),
                "len_drop": pa.array([int((ls - kept_len).sum())], pa.int64()),
            }
        )

    p = merged.map_batches(fold, batch_format="pyarrow").to_pandas()
    n_kept = int(p["n_kept"].sum())
    len_kept = int(p["len_kept"].sum())
    n_drop = int(p["n_drop"].sum())
    len_drop = int(p["len_drop"].sum())
    diff = len_kept * max(n_drop, 1) - len_drop * n_kept
    return pa.table(
        {
            "n_kept": pa.array([n_kept], pa.int64()),
            "len_kept": pa.array([len_kept], pa.int64()),
            "n_drop": pa.array([n_drop], pa.int64()),
            "len_drop": pa.array([len_drop], pa.int64()),
            "mean_diff_sign": pa.array(
                [0 if n_drop == 0 else (1 if diff > 0 else (-1 if diff < 0 else 0))],
                pa.int64(),
            ),
        }
    )


DOCS_DEDUP_LENGTH_BIAS_SQL = """
WITH g AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(n_chars) AS BIGINT) AS len_sum,
                  CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS kept_len
           FROM documents GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(SUM(kept_len) AS BIGINT) AS len_kept,
             CAST(SUM(n - 1) AS BIGINT) AS n_drop,
             CAST(SUM(len_sum - kept_len) AS BIGINT) AS len_drop
      FROM g)
SELECT n_kept, len_kept, n_drop, len_drop,
       CAST(CASE WHEN n_drop = 0 THEN 0
                 WHEN len_kept * n_drop > len_drop * n_kept THEN 1
                 WHEN len_kept * n_drop < len_drop * n_kept THEN -1
                 ELSE 0 END AS BIGINT) AS mean_diff_sign
FROM s
"""


def orders_page_checksum_merkle(sf_dir: str):
    """Two-level MERKLE integrity tree over the order keyspace: 4096-key
    pages each fold to an order-free XOR checksum of h(key, cents), plus a
    root row (page = −1) XOR-folding the page level — the incremental-sync
    primitive (two replicas diff the root, then only mismatched pages).
    XOR is associative and commutative, so block partials merge exactly
    regardless of execution order; h keeps every product < 2⁵² so BIGINT
    arithmetic is identical in both engines."""
    P = 2147483647
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        h = ((k % P) * 1000003 + c % P) % P
        df = pd.DataFrame({"page": k // 4096, "h": h})
        agg = df.groupby("page")["h"].agg(
            [("checksum", lambda s: int(np.bitwise_xor.reduce(s.to_numpy()))),
             ("n_rows", "size")]
        ).reset_index()
        return pa.table(
            {
                "page": pa.array(agg["page"].to_numpy(dtype=np.int64)),
                "checksum": pa.array(agg["checksum"].to_numpy(dtype=np.int64)),
                "n_rows": pa.array(agg["n_rows"].to_numpy(dtype=np.int64)),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    pages = (
        p.groupby("page")
        .agg(
            checksum=("checksum", lambda s: int(np.bitwise_xor.reduce(s.to_numpy()))),
            n_rows=("n_rows", "sum"),
        )
        .reset_index()
        .sort_values("page")
    )
    root = int(np.bitwise_xor.reduce(pages["checksum"].to_numpy(dtype=np.int64)))
    out_page = np.concatenate([[-1], pages["page"].to_numpy(dtype=np.int64)])
    out_sum = np.concatenate([[root], pages["checksum"].to_numpy(dtype=np.int64)])
    out_n = np.concatenate(
        [[len(pages)], pages["n_rows"].to_numpy(dtype=np.int64)]
    )
    return pa.table(
        {
            "page": pa.array(out_page.astype(np.int64)),
            "checksum": pa.array(out_sum.astype(np.int64)),
            "n_rows": pa.array(out_n.astype(np.int64)),
        }
    )


ORDERS_PAGE_CHECKSUM_MERKLE_SQL = """
WITH h AS (SELECT o_orderkey // 4096 AS page,
                  ((o_orderkey % 2147483647) * 1000003
                   + CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                     % 2147483647) % 2147483647 AS hv
           FROM orders),
pages AS (SELECT CAST(page AS BIGINT) AS page,
                 CAST(bit_xor(hv) AS BIGINT) AS checksum,
                 CAST(COUNT(*) AS BIGINT) AS n_rows
          FROM h GROUP BY 1)
SELECT * FROM (
  SELECT CAST(-1 AS BIGINT) AS page,
         CAST(bit_xor(checksum) AS BIGINT) AS checksum,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM pages
  UNION ALL
  SELECT page, checksum, n_rows FROM pages
) ORDER BY page
"""


def events_ts_resolution_census(sf_dir: str):
    """Timestamp RESOLUTION forensics: how many event timestamps carry
    true microsecond precision vs being quantized to ms / s / minute
    boundaries — the tell for an upstream clock, a lossy serialization, or
    synthetic backfill (real traffic is µs-ragged; a spike at s-aligned
    means somebody round-tripped through epoch seconds).  One pass,
    4-row block partials."""
    labels = ["us", "ms", "s", "min"]
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ms_al = us % 1000 == 0
        s_al = us % 1_000_000 == 0
        min_al = us % 60_000_000 == 0
        counts = np.array(
            [
                int((~ms_al).sum()),
                int((ms_al & ~s_al).sum()),
                int((s_al & ~min_al).sum()),
                int(min_al.sum()),
            ],
            dtype=np.int64,
        )
        return pa.table(
            {"resolution": pa.array(labels, pa.string()), "n": pa.array(counts)}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("resolution")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["resolution"])
    )


EVENTS_TS_RESOLUTION_CENSUS_SQL = """
WITH c AS (SELECT epoch_us(ts) AS us FROM events),
l AS (SELECT CASE WHEN us % 1000 <> 0 THEN 'us'
                  WHEN us % 1000000 <> 0 THEN 'ms'
                  WHEN us % 60000000 <> 0 THEN 's'
                  ELSE 'min' END AS resolution
      FROM c),
lab AS (SELECT unnest(['min', 'ms', 's', 'us']) AS resolution),
cnt AS (SELECT resolution, CAST(COUNT(*) AS BIGINT) AS n
        FROM l GROUP BY 1)
SELECT lab.resolution, COALESCE(cnt.n, 0) AS n
FROM lab LEFT JOIN cnt USING (resolution) ORDER BY 1
"""


def orders_quarterly_trend_contrast(sf_dir: str):
    """Orthogonal polynomial CONTRASTS over quarters: per year the linear
    (−3,−1,+1,+3) and quadratic (+1,−1,−1,+1) contrasts of quarterly
    revenue — integer-weighted combinations, so within-year growth shape
    (ramping? U-shaped?) is read off exactly without fitting anything.
    (year, quarter) partials reduce distributed; the contrast fold is a
    4-vector dot product per year on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        q = pc.quarter(t["o_orderdate"])
        return (
            pa.table({"y": y, "q": q, "rev": _cents(t["o_totalprice"])})
            .group_by(["y", "q"])
            .aggregate([("rev", "sum")])
            .rename_columns(["y", "q", "rev"])
        )

    yq = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["y", "q"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    piv = yq.pivot_table(index="y", columns="q", values="rev", fill_value=0)
    piv = piv.reindex(columns=[1, 2, 3, 4], fill_value=0).sort_index()
    qs = [piv[i].to_numpy(dtype=np.int64) for i in (1, 2, 3, 4)]
    lin = -3 * qs[0] - qs[1] + qs[2] + 3 * qs[3]
    quad = qs[0] - qs[1] - qs[2] + qs[3]
    return pa.table(
        {
            "year": pa.array(piv.index.to_numpy(dtype=np.int64)),
            "q1": pa.array(qs[0]),
            "q2": pa.array(qs[1]),
            "q3": pa.array(qs[2]),
            "q4": pa.array(qs[3]),
            "lin_contrast": pa.array(lin),
            "quad_contrast": pa.array(quad),
        }
    )


ORDERS_QUARTERLY_TREND_CONTRAST_SQL = """
WITH q AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
                  quarter(o_orderdate) AS qq,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1, 2),
p AS (SELECT year,
             CAST(COALESCE(SUM(CASE WHEN qq = 1 THEN rev END), 0) AS BIGINT) AS q1,
             CAST(COALESCE(SUM(CASE WHEN qq = 2 THEN rev END), 0) AS BIGINT) AS q2,
             CAST(COALESCE(SUM(CASE WHEN qq = 3 THEN rev END), 0) AS BIGINT) AS q3,
             CAST(COALESCE(SUM(CASE WHEN qq = 4 THEN rev END), 0) AS BIGINT) AS q4
      FROM q GROUP BY 1)
SELECT year, q1, q2, q3, q4,
       CAST(-3*q1 - q2 + q3 + 3*q4 AS BIGINT) AS lin_contrast,
       CAST(q1 - q2 - q3 + q4 AS BIGINT) AS quad_contrast
FROM p ORDER BY year
"""


def nation_revenue_borda_ranking(sf_dir: str):
    """Rank AGGREGATION across years by Borda count: each year ranks the
    nations by exact revenue (competition ranking), a nation scores
    (#ranked − rank) points, and the cross-year sum is the consensus
    league table — robust to a single anomalous year in a way the raw
    total is not.  Revenue reduces through an 8-partition join; the
    per-year rank fold runs over the ≤ years×25 table on the driver."""
    import pandas as pd

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "ck": t["o_custkey"],
                    "y": pc.year(t["o_orderdate"]),
                    "rev": _cents(t["o_totalprice"]),
                }
            )
            .group_by(["ck", "y"])
            .aggregate([("rev", "sum")])
            .rename_columns(["ck", "y", "rev"])
        )

    j = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["ck", "y"])
        .aggregate(Sum("rev", alias_name="rev"))
        .join(
            cust,
            join_type="inner",
            num_partitions=8,
            on=("ck",),
            right_on=("c_custkey",),
        )
    )
    ny = (
        j.groupby(["c_nationkey", "y"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    nation = rd.read_parquet(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    pts: dict = {}
    yrs: dict = {}
    for _, g in ny.groupby("y"):
        rev = g["rev"].to_numpy(dtype=np.int64)
        nk = g["c_nationkey"].to_numpy()
        k = len(rev)
        rank = (rev[:, None] < rev[None, :]).sum(axis=1) + 1
        for key, r in zip(nk, rank):
            pts[key] = pts.get(key, 0) + (k - int(r))
            yrs[key] = yrs.get(key, 0) + 1
    keys = sorted(pts, key=lambda x: names[x])
    return pa.table(
        {
            "n_name": pa.array([names[x] for x in keys], pa.string()),
            "borda_points": pa.array([pts[x] for x in keys], pa.int64()),
            "n_years": pa.array([yrs[x] for x in keys], pa.int64()),
        }
    )


NATION_REVENUE_BORDA_RANKING_SQL = """
WITH r AS (SELECT year(o_orderdate) AS y, n.n_name,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1, 2),
b AS (SELECT y, n_name,
             COUNT(*) OVER (PARTITION BY y)
               - RANK() OVER (PARTITION BY y ORDER BY rev DESC) AS pts
      FROM r)
SELECT n_name, CAST(SUM(pts) AS BIGINT) AS borda_points,
       CAST(COUNT(*) AS BIGINT) AS n_years
FROM b GROUP BY 1 ORDER BY 1
"""


def orders_yoy_month_sign_test(sf_dir: str):
    """Paired SIGN TEST of monthly revenue against the same month one year
    earlier: per year, how many months beat / trail / tie their YoY pair
    plus the binomial deviation |up − down| — the distribution-free
    is-this-year-really-better answer (the magnitude-blind complement to
    the YoY growth table).  Monthly totals reduce distributed; the pairing
    folds over the ≤ 84-row month table on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "y": pc.year(t["o_orderdate"]),
                    "m": pc.month(t["o_orderdate"]),
                    "rev": _cents(t["o_totalprice"]),
                }
            )
            .group_by(["y", "m"])
            .aggregate([("rev", "sum")])
            .rename_columns(["y", "m", "rev"])
        )

    ym = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["y", "m"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    cur = ym.merge(
        ym.rename(columns={"y": "py", "rev": "prev_rev"}).assign(y=lambda d: d["py"] + 1),
        on=["y", "m"],
    )
    rows = []
    for y, g in cur.groupby("y"):
        up = int((g["rev"] > g["prev_rev"]).sum())
        down = int((g["rev"] < g["prev_rev"]).sum())
        tie = int((g["rev"] == g["prev_rev"]).sum())
        rows.append((int(y), up, down, tie, abs(up - down)))
    rows.sort()
    return pa.table(
        {
            "year": pa.array([r[0] for r in rows], pa.int64()),
            "n_up": pa.array([r[1] for r in rows], pa.int64()),
            "n_down": pa.array([r[2] for r in rows], pa.int64()),
            "n_tie": pa.array([r[3] for r in rows], pa.int64()),
            "sign_dev": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


ORDERS_YOY_MONTH_SIGN_TEST_SQL = """
WITH ym AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                   month(o_orderdate) AS m,
                   CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1, 2),
p AS (SELECT a.y AS year,
             CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END AS up,
             CASE WHEN a.rev < b.rev THEN 1 ELSE 0 END AS down,
             CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END AS tie
      FROM ym a JOIN ym b ON a.m = b.m AND a.y = b.y + 1)
SELECT year, CAST(SUM(up) AS BIGINT) AS n_up,
       CAST(SUM(down) AS BIGINT) AS n_down,
       CAST(SUM(tie) AS BIGINT) AS n_tie,
       CAST(ABS(SUM(up) - SUM(down)) AS BIGINT) AS sign_dev
FROM p GROUP BY 1 ORDER BY 1
"""


def docs_lang_length_brown_forsythe_stats(sf_dir: str):
    """Brown-Forsythe variance-homogeneity SUFFICIENT STATISTICS: per
    language, the count, the exact lower median of n_chars, and the sum
    and sum-of-squares of |x − median| — the robust Levene inputs, all
    integers (medians are discrete picks, deviations are integer
    distances), so the homogeneity F folds downstream bit-stably.
    (lang, n_chars) count partials reduce distributed; the weighted-median
    walk runs over the tiny value table on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"lang": t["lang"], "x": pc.cast(t["n_chars"], pa.int64())})
            .group_by(["lang", "x"])
            .aggregate([("x", "count")])
            .rename_columns(["lang", "x", "n"])
        )

    vc = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "x"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for lang, g in vc.groupby("lang"):
        g = g.sort_values("x")
        x = g["x"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        total = int(n.sum())
        med_pos = (total - 1) // 2  # lower median index (0-based)
        med = int(x[np.searchsorted(np.cumsum(n) - 1, med_pos)])
        ad = np.abs(x - med)
        rows.append(
            (
                lang,
                total,
                med,
                int((ad * n).sum()),
                int((ad * ad * n).sum()),
            )
        )
    rows.sort()
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "med": pa.array([r[2] for r in rows], pa.int64()),
            "sum_absdev": pa.array([r[3] for r in rows], pa.int64()),
            "sum_absdev_sq": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


DOCS_LANG_LENGTH_BROWN_FORSYTHE_STATS_SQL = """
WITH m AS (SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med
           FROM documents GROUP BY 1),
d AS (SELECT doc.lang, m.med,
             ABS(CAST(doc.n_chars AS BIGINT) - m.med) AS ad
      FROM documents doc JOIN m ON doc.lang = m.lang)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, MAX(med) AS med,
       CAST(SUM(ad) AS BIGINT) AS sum_absdev,
       CAST(SUM(ad*ad) AS BIGINT) AS sum_absdev_sq
FROM d GROUP BY 1 ORDER BY 1
"""


def orders_monthly_count_value_rank_divergence(sf_dir: str):
    """Volume-value DECOUPLING: months ranked twice — by order count and
    by revenue — and the per-month absolute rank gap (a big gap = the
    month's traffic and its money disagree; the Spearman-footrule
    between the two metrics).  Ranks are made tie-free by the (metric
    DESC, month) lexicographic order on BOTH sides.  Monthly partials
    reduce distributed; ranking folds over ≤ 84 rows on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "rev": _cents(t["o_totalprice"]),
                }
            )
            .group_by("month")
            .aggregate([("n", "sum"), ("rev", "sum")])
            .rename_columns(["month", "n", "rev"])
        )

    m = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("n", alias_name="n"), Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    order_n = m.sort_values(["n", "month"], ascending=[False, True]).index
    order_r = m.sort_values(["rev", "month"], ascending=[False, True]).index
    rank_n = pd.Series(np.arange(1, len(m) + 1, dtype=np.int64), index=order_n)
    rank_r = pd.Series(np.arange(1, len(m) + 1, dtype=np.int64), index=order_r)
    m["rank_n"] = rank_n.sort_index().to_numpy()
    m["rank_rev"] = rank_r.sort_index().to_numpy()
    return pa.table(
        {
            "month": pa.array(m["month"].to_numpy(), pa.string()),
            "n": pa.array(m["n"].to_numpy(dtype=np.int64)),
            "rev": pa.array(m["rev"].to_numpy(dtype=np.int64)),
            "rank_n": pa.array(m["rank_n"].to_numpy(dtype=np.int64)),
            "rank_rev": pa.array(m["rank_rev"].to_numpy(dtype=np.int64)),
            "rank_gap": pa.array(
                np.abs(m["rank_n"].to_numpy() - m["rank_rev"].to_numpy()).astype(
                    np.int64
                )
            ),
        }
    )


ORDERS_MONTHLY_COUNT_VALUE_RANK_DIVERGENCE_SQL = """
WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM orders GROUP BY 1),
r AS (SELECT month, n, rev,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, month) AS BIGINT)
                 AS rank_n,
             CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, month) AS BIGINT)
                 AS rank_rev
      FROM m)
SELECT month, n, rev, rank_n, rank_rev,
       CAST(ABS(rank_n - rank_rev) AS BIGINT) AS rank_gap
FROM r ORDER BY month
"""


def nation_trade_colocation_lift(sf_dir: str):
    """Does trade COLOCATE within nations beyond what the market shares
    predict?  Observed local (supplier-nation = customer-nation) revenue
    vs the independence expectation Σₙ Sₙ·Cₙ / T, compared exactly by
    cross-multiplication (L·T vs Σ Sₙ·Cₙ in arbitrary-precision driver
    ints; lift in ppm).  One 8-partition join threads order → customer;
    the supplier→nation and customer→nation maps are tiny broadcast
    lookups inside map_batches — no second shuffle."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_extendedprice"]
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    sup = rd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    snat_ref = ray.put(dict(zip(sup["s_suppkey"], sup["s_nationkey"])))
    cnat_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_nationkey"])))

    j = li.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def grid(t: pa.Table) -> pa.Table:
        import pandas as pd

        snat = ray.get(snat_ref)
        cnat = ray.get(cnat_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        c = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "sn": pd.Series(sk).map(snat).to_numpy(),
                "cn": pd.Series(ck).map(cnat).to_numpy(),
                "rev": c,
            }
        )
        g = df.groupby(["sn", "cn"], as_index=False)["rev"].sum()
        return pa.table(
            {
                "sn": pa.array(g["sn"].to_numpy(dtype=np.int64)),
                "cn": pa.array(g["cn"].to_numpy(dtype=np.int64)),
                "rev": pa.array(g["rev"].to_numpy(dtype=np.int64)),
            }
        )

    g = (
        j.map_batches(grid, batch_format="pyarrow")
        .groupby(["sn", "cn"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    total = int(g["rev"].sum())
    local = int(g.loc[g["sn"] == g["cn"], "rev"].sum())
    s_n = g.groupby("sn")["rev"].sum()
    c_n = g.groupby("cn")["rev"].sum()
    nats = sorted(set(s_n.index) | set(c_n.index))
    cross = sum(int(s_n.get(n, 0)) * int(c_n.get(n, 0)) for n in nats)
    lift_ppm = local * total * 1_000_000 // cross
    return pa.table(
        {
            "total_cents": pa.array([total], pa.int64()),
            "local_cents": pa.array([local], pa.int64()),
            "lift_ppm": pa.array([int(lift_ppm)], pa.int64()),
            "lift_sign": pa.array(
                [1 if local * total > cross else (-1 if local * total < cross else 0)],
                pa.int64(),
            ),
        }
    )


NATION_TRADE_COLOCATION_LIFT_SQL = """
WITH f AS (SELECT s.s_nationkey AS sn, c.c_nationkey AS cn,
                  CAST(SUM(CAST(FLOOR(l.l_extendedprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS rev
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           GROUP BY 1, 2),
t AS (SELECT CAST(SUM(rev) AS BIGINT) AS total,
             CAST(SUM(CASE WHEN sn = cn THEN rev ELSE 0 END) AS BIGINT)
                 AS local_
      FROM f),
sx AS (SELECT sn AS n, SUM(rev) AS s FROM f GROUP BY 1),
cx AS (SELECT cn AS n, SUM(rev) AS c FROM f GROUP BY 1),
cr AS (SELECT SUM(CAST(sx.s AS HUGEINT) * CAST(cx.c AS HUGEINT)) AS cross_
      FROM sx JOIN cx ON sx.n = cx.n)
SELECT t.total AS total_cents, t.local_ AS local_cents,
       CAST(CAST(t.local_ AS HUGEINT) * t.total * 1000000 // cr.cross_
            AS BIGINT) AS lift_ppm,
       CAST(CASE WHEN CAST(t.local_ AS HUGEINT) * t.total > cr.cross_ THEN 1
                 WHEN CAST(t.local_ AS HUGEINT) * t.total < cr.cross_ THEN -1
                 ELSE 0 END AS BIGINT) AS lift_sign
FROM t, cr
"""


def docs_dedup_lang_rebalance_report(sf_dir: str):
    """Pipeline-effect report for dedup → language REBALANCE: per language
    the pre-dedup count, the post-dedup count (keeper = min doc_id per
    text), and the up/down-sampling weight that would restore a uniform
    language mix (weight_ppm = total·10⁶ // (k·n_after)) — the mix-control
    artifact a multilingual training-data pipeline feeds its sampler.
    (text, lang) min-id partials shrink block-locally; the keeper argmin
    folds over the distinct-text table on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"text": t["text"], "lang": t["lang"], "doc_id": t["doc_id"]})
            .group_by(["text", "lang"])
            .aggregate([("doc_id", "min"), ("doc_id", "count")])
            .rename_columns(["text", "lang", "min_id", "n"])
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["text", "lang"])
        .aggregate(Min("min_id", alias_name="min_id"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    before = merged.groupby("lang")["n"].sum()
    keepers = merged.loc[merged.groupby("text")["min_id"].idxmin()]
    after = keepers.groupby("lang").size()
    langs = sorted(before.index)
    k = len(langs)
    tot_after = int(after.sum())
    rows = []
    for lang in langs:
        na = int(after.get(lang, 0))
        rows.append(
            (
                lang,
                int(before[lang]),
                na,
                tot_after * 1_000_000 // (k * na) if na else 0,
            )
        )
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "n_before": pa.array([r[1] for r in rows], pa.int64()),
            "n_after": pa.array([r[2] for r in rows], pa.int64()),
            "weight_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


DOCS_DEDUP_LANG_REBALANCE_REPORT_SQL = """
WITH k AS (SELECT text, MIN(doc_id) AS kid FROM documents GROUP BY 1),
a AS (SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_after
      FROM documents d JOIN k ON d.doc_id = k.kid GROUP BY 1),
b AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before
      FROM documents GROUP BY 1),
t AS (SELECT CAST(SUM(n_after) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS k FROM a)
SELECT b.lang, b.n_before, COALESCE(a.n_after, 0) AS n_after,
       CAST(CASE WHEN COALESCE(a.n_after, 0) = 0 THEN 0
                 ELSE t.tot * 1000000 // (t.k * a.n_after) END AS BIGINT)
           AS weight_ppm
FROM b LEFT JOIN a ON b.lang = a.lang, t ORDER BY b.lang
"""


def purchase_graph_butterfly_count(sf_dir: str):
    """Bipartite BUTTERFLY count (4-cycles: two customers sharing two
    suppliers) on the purchase graph — the bipartite clustering primitive
    behind community cohesion and fraud-ring scoring.  Counted from the
    small side: Σ over supplier pairs of C(co-customers, 2), so the
    matrix fold is suppliers² × customers, never customers².  Distinct
    edges shrink block-locally behind one 8-partition join; the matmul
    fold runs on the driver over the compact edge list."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    j = li.join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def distinct_edges(t: pa.Table) -> pa.Table:
        return (
            pa.table({"c": t["o_custkey"], "s": t["l_suppkey"]})
            .group_by(["c", "s"])
            .aggregate([])
        )

    edges = (
        j.map_batches(distinct_edges, batch_format="pyarrow")
        .groupby(["c", "s"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    c_ids, c_idx = np.unique(edges["c"].to_numpy(), return_inverse=True)
    s_ids, s_idx = np.unique(edges["s"].to_numpy(), return_inverse=True)
    a = np.zeros((len(s_ids), len(c_ids)), dtype=np.float64)
    a[s_idx, c_idx] = 1.0
    m = a @ a.T  # co-customer counts per supplier pair (exact: counts < 2^53)
    iu = np.triu_indices(len(s_ids), k=1)
    shared = m[iu].astype(np.int64)
    butterflies = int((shared * (shared - 1) // 2).sum())
    return pa.table(
        {
            "n_edges": pa.array([len(edges)], pa.int64()),
            "n_customers": pa.array([len(c_ids)], pa.int64()),
            "n_suppliers": pa.array([len(s_ids)], pa.int64()),
            "n_butterflies": pa.array([butterflies], pa.int64()),
        }
    )


PURCHASE_GRAPH_BUTTERFLY_COUNT_SQL = """
WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
p AS (SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS m
      FROM e a JOIN e b ON a.c = b.c AND a.s < b.s GROUP BY 1, 2)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) FROM e) AS n_customers,
       (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM e) AS n_suppliers,
       CAST(COALESCE(SUM(m*(m-1)//2), 0) AS BIGINT) AS n_butterflies
FROM p
"""


def lineitem_retail_premium_census(sf_dir: str):
    """Price-integrity AUDIT through a broadcast lookup: every lineitem's
    realized price (extendedprice cents) compared exactly against the
    catalog benchmark retail·quantity (cross-multiplied, no unit-price
    division), censused per brand as above / below / at catalog — the
    are-we-discounting-off-list forensic.  The part map ships once via
    ray.put; lineitem never shuffles."""
    part = rd.read_parquet(
        _t(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_retailprice"]
    ).to_pandas()
    retail_cents = dict(
        zip(
            part["p_partkey"],
            np.floor(part["p_retailprice"].to_numpy() * 100.0 + 0.5).astype(np.int64),
        )
    )
    brand_of = dict(zip(part["p_partkey"], part["p_brand"]))
    retail_ref = ray.put(retail_cents)
    brand_ref = ray.put(brand_of)
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def census(t: pa.Table) -> pa.Table:
        import pandas as pd

        retail = ray.get(retail_ref)
        brands = ray.get(brand_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        q = pc.cast(t["l_quantity"], pa.int64()).to_numpy(zero_copy_only=False)
        ext = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        bench = pd.Series(pk).map(retail).to_numpy(dtype=np.int64) * q
        brand = pd.Series(pk).map(brands).to_numpy()
        df = pd.DataFrame(
            {
                "brand": brand,
                "above": (ext > bench).astype(np.int64),
                "below": (ext < bench).astype(np.int64),
                "at": (ext == bench).astype(np.int64),
            }
        )
        g = df.groupby("brand", as_index=False).sum()
        return pa.table(
            {
                "brand": pa.array(g["brand"].to_numpy(), pa.string()),
                "n_above": pa.array(g["above"].to_numpy(dtype=np.int64)),
                "n_below": pa.array(g["below"].to_numpy(dtype=np.int64)),
                "n_at": pa.array(g["at"].to_numpy(dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(census, batch_format="pyarrow")
        .groupby("brand")
        .aggregate(
            Sum("n_above", alias_name="n_above"),
            Sum("n_below", alias_name="n_below"),
            Sum("n_at", alias_name="n_at"),
        )
        .sort(["brand"])
    )


LINEITEM_RETAIL_PREMIUM_CENSUS_SQL = """
SELECT p.p_brand AS brand,
       CAST(SUM(CASE WHEN CAST(FLOOR(l.l_extendedprice*100 + 0.5) AS BIGINT)
                          > CAST(FLOOR(p.p_retailprice*100 + 0.5) AS BIGINT)
                            * CAST(l.l_quantity AS BIGINT)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       CAST(SUM(CASE WHEN CAST(FLOOR(l.l_extendedprice*100 + 0.5) AS BIGINT)
                          < CAST(FLOOR(p.p_retailprice*100 + 0.5) AS BIGINT)
                            * CAST(l.l_quantity AS BIGINT)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       CAST(SUM(CASE WHEN CAST(FLOOR(l.l_extendedprice*100 + 0.5) AS BIGINT)
                          = CAST(FLOOR(p.p_retailprice*100 + 0.5) AS BIGINT)
                            * CAST(l.l_quantity AS BIGINT)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_at
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1 ORDER BY 1
"""


def events_dow_hour_median_polish(sf_dir: str):
    """Tukey MEDIAN POLISH (one row sweep + one column sweep) of the
    weekday×hour activity matrix — the robust additive decomposition into
    row effects, column effects and residuals, exact end to end because
    lower medians of integer counts are integers.  (dow, hour) partials
    reduce distributed; the 7×24 polish folds on the driver with the
    quantile_disc lower-median convention on both sides."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(t["ts"]), 1)
        h = pc.hour(t["ts"])
        return (
            pa.table({"dow": dow, "h": h})
            .group_by(["dow", "h"])
            .aggregate([("dow", "count")])
            .rename_columns(["dow", "h", "n"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "h"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    grid = np.zeros((7, 24), dtype=np.int64)
    grid[g["dow"].to_numpy() - 1, g["h"].to_numpy()] = g["n"].to_numpy()

    def lower_median(a: np.ndarray, axis: int) -> np.ndarray:
        s = np.sort(a, axis=axis)
        idx = (a.shape[axis] - 1) // 2
        return np.take(s, idx, axis=axis)

    row_eff = lower_median(grid, axis=1)
    r1 = grid - row_eff[:, None]
    col_eff = lower_median(r1, axis=0)
    resid = r1 - col_eff[None, :]
    dows = np.repeat(np.arange(1, 8, dtype=np.int64), 24)
    hours = np.tile(np.arange(24, dtype=np.int64), 7)
    return pa.table(
        {
            "dow": pa.array(dows),
            "hour": pa.array(hours),
            "n": pa.array(grid.ravel()),
            "row_eff": pa.array(np.repeat(row_eff, 24)),
            "col_eff": pa.array(np.tile(col_eff, 7)),
            "residual": pa.array(resid.ravel()),
        }
    )


EVENTS_DOW_HOUR_MEDIAN_POLISH_SQL = """
WITH c AS (SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                  CAST(hour(ts) AS BIGINT) AS h,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
dows AS (SELECT unnest(range(1, 8)) AS dow),
hrs AS (SELECT unnest(range(0, 24)) AS h),
grid AS (SELECT CAST(dows.dow AS BIGINT) AS dow, CAST(hrs.h AS BIGINT) AS h,
                COALESCE(c.n, 0) AS n
         FROM dows CROSS JOIN hrs
         LEFT JOIN c ON c.dow = dows.dow AND c.h = hrs.h),
r AS (SELECT dow, CAST(quantile_disc(n, 0.5) AS BIGINT) AS row_eff
      FROM grid GROUP BY 1),
r1 AS (SELECT grid.dow, grid.h, grid.n, r.row_eff,
              grid.n - r.row_eff AS res1
       FROM grid JOIN r USING (dow)),
cc AS (SELECT h, CAST(quantile_disc(res1, 0.5) AS BIGINT) AS col_eff
       FROM r1 GROUP BY 1)
SELECT r1.dow, r1.h AS hour, r1.n, r1.row_eff, cc.col_eff,
       CAST(r1.res1 - cc.col_eff AS BIGINT) AS residual
FROM r1 JOIN cc USING (h) ORDER BY r1.dow, r1.h
"""


def docs_training_funnel_by_source(sf_dir: str):
    """End-to-end training-data FUNNEL with per-source attrition: raw →
    length gate (100 ≤ n_chars ≤ 5000) → exact-dedup keeper (min doc_id
    per text, among gate survivors) → stutter decontamination (no
    immediately repeated token) — the one-table answer to "where does my
    corpus go?".  All three gates evaluate block-locally; only the dedup
    keeper map needs a (text → min id) reduce."""
    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "text", "n_chars", "source"]
    )

    def partial(t: pa.Table) -> pa.Table:
        nc = pc.cast(t["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        gate = (nc >= 100) & (nc <= 5000)
        texts = t["text"].to_numpy(zero_copy_only=False)
        stutter = np.array(
            [
                any(a == b for a, b in zip(s.split(" "), s.split(" ")[1:]))
                for s in texts
            ],
            dtype=bool,
        )
        return pa.table(
            {
                "source": t["source"],
                "doc_id": t["doc_id"],
                "text": t["text"],
                "gate": pa.array(gate),
                "stutter": pa.array(stutter),
            }
        )

    flagged = ds.map_batches(partial, batch_format="pyarrow")

    # global keeper map must span blocks: reduce (text -> min id) globally
    gated = flagged.map_batches(
        lambda t: t.filter(t["gate"]), batch_format="pyarrow"
    )
    winners = (
        gated.groupby("text")
        .aggregate(Min("doc_id", alias_name="min_id"))
        .to_pandas()
    )
    win = dict(zip(winners["text"], winners["min_id"]))
    win_ref = ray.put(win)

    def census(t: pa.Table) -> pa.Table:
        import pandas as pd

        w = ray.get(win_ref)
        df = t.to_pandas()
        df["keeper"] = df["gate"] & (
            df["text"].map(w).fillna(-1).astype(np.int64) == df["doc_id"]
        )
        df["clean"] = df["keeper"] & ~df["stutter"]
        g = (
            df.groupby("source")
            .agg(
                n_raw=("doc_id", "size"),
                n_gated=("gate", "sum"),
                n_deduped=("keeper", "sum"),
                n_clean=("clean", "sum"),
            )
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"].to_numpy(), pa.string()),
                "n_raw": pa.array(g["n_raw"].to_numpy(dtype=np.int64)),
                "n_gated": pa.array(g["n_gated"].to_numpy(dtype=np.int64)),
                "n_deduped": pa.array(g["n_deduped"].to_numpy(dtype=np.int64)),
                "n_clean": pa.array(g["n_clean"].to_numpy(dtype=np.int64)),
            }
        )

    return (
        flagged.map_batches(census, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_raw", alias_name="n_raw"),
            Sum("n_gated", alias_name="n_gated"),
            Sum("n_deduped", alias_name="n_deduped"),
            Sum("n_clean", alias_name="n_clean"),
        )
        .sort(["source"])
    )


DOCS_TRAINING_FUNNEL_BY_SOURCE_SQL = """
WITH toks AS (SELECT doc_id,
                     unnest(string_split(text, ' ')) AS tok,
                     unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
              FROM documents),
st AS (SELECT doc_id, tok,
              lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS ntok
       FROM toks),
std AS (SELECT doc_id,
               MAX(CASE WHEN tok = ntok THEN 1 ELSE 0 END) = 1 AS stutter
        FROM st GROUP BY 1),
f AS (SELECT d.doc_id, d.text, d.source,
             (d.n_chars >= 100 AND d.n_chars <= 5000) AS gate,
             std.stutter
      FROM documents d JOIN std ON d.doc_id = std.doc_id),
w AS (SELECT text, MIN(doc_id) AS min_id FROM f WHERE gate GROUP BY 1),
j AS (SELECT f.source, f.gate, f.stutter,
             (f.gate AND f.doc_id = w.min_id) AS keeper
      FROM f LEFT JOIN w ON f.text = w.text)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw,
       CAST(SUM(CASE WHEN gate THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
       CAST(SUM(CASE WHEN keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_deduped,
       CAST(SUM(CASE WHEN keeper AND NOT stutter THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clean
FROM j GROUP BY 1 ORDER BY 1
"""


def orders_quarterly_cronbach_alpha_stats(sf_dir: str):
    """Cronbach's ALPHA sufficient statistics with quarters as items and
    years as cases — the internal-consistency view of seasonality (do the
    four quarters "measure" the same yearly prosperity?).  Emits exact
    integer variance pieces in $1000 units: per-item variance numerators
    n·Σx²−(Σx)² summed over items, and the total-score variance numerator
    — α = k/(k−1)·(1 − Σvarᵢ/var_total) folds downstream.  Quarterly
    totals reduce distributed; the moment fold is a 4×years table."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "y": pc.year(t["o_orderdate"]),
                    "q": pc.quarter(t["o_orderdate"]),
                    "rev": _cents(t["o_totalprice"]),
                }
            )
            .group_by(["y", "q"])
            .aggregate([("rev", "sum")])
            .rename_columns(["y", "q", "rev"])
        )

    yq = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["y", "q"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    piv = yq.pivot_table(index="y", columns="q", values="rev", fill_value=0)
    piv = piv.reindex(columns=[1, 2, 3, 4], fill_value=0).sort_index()
    x = piv.to_numpy(dtype=np.int64) // 100_000  # $1000 units
    n = x.shape[0]
    item_var_x = int(
        sum(n * int((x[:, j] ** 2).sum()) - int(x[:, j].sum()) ** 2 for j in range(4))
    )
    tot = x.sum(axis=1)
    total_var_x = n * int((tot**2).sum()) - int(tot.sum()) ** 2
    return pa.table(
        {
            "k_items": pa.array([4], pa.int64()),
            "n_years": pa.array([n], pa.int64()),
            "sum_item_var_x": pa.array([item_var_x], pa.int64()),
            "total_var_x": pa.array([total_var_x], pa.int64()),
        }
    )


ORDERS_QUARTERLY_CRONBACH_ALPHA_STATS_SQL = """
WITH q AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                  quarter(o_orderdate) AS qq,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       // 100000 AS BIGINT) AS rev
           FROM orders GROUP BY 1, 2),
p AS (SELECT y,
             COALESCE(SUM(CASE WHEN qq = 1 THEN rev END), 0) AS q1,
             COALESCE(SUM(CASE WHEN qq = 2 THEN rev END), 0) AS q2,
             COALESCE(SUM(CASE WHEN qq = 3 THEN rev END), 0) AS q3,
             COALESCE(SUM(CASE WHEN qq = 4 THEN rev END), 0) AS q4
      FROM q GROUP BY 1),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(q1) AS s1, SUM(q1*q1) AS ss1,
             SUM(q2) AS s2, SUM(q2*q2) AS ss2,
             SUM(q3) AS s3, SUM(q3*q3) AS ss3,
             SUM(q4) AS s4, SUM(q4*q4) AS ss4,
             SUM(q1+q2+q3+q4) AS st,
             SUM((q1+q2+q3+q4)*(q1+q2+q3+q4)) AS sst
      FROM p)
SELECT CAST(4 AS BIGINT) AS k_items, n AS n_years,
       CAST((n*ss1 - s1*s1) + (n*ss2 - s2*s2)
            + (n*ss3 - s3*s3) + (n*ss4 - s4*s4) AS BIGINT)
           AS sum_item_var_x,
       CAST(n*sst - st*st AS BIGINT) AS total_var_x
FROM m
"""


def orders_monthly_von_neumann_ratio(sf_dir: str):
    """Von Neumann RATIO (mean-square successive difference vs variance)
    of the monthly revenue series in $1000 units — the classic serial-
    correlation diagnostic (≈2 for white noise, <2 for trend/persistence),
    cross-multiplied to exact integers with the big products folded in
    arbitrary-precision driver ints and the ratio emitted in ppm.
    Monthly totals reduce distributed; the successive-difference walk
    runs over the ≤ 84-row series on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                    "rev": _cents(t["o_totalprice"]),
                }
            )
            .group_by("month")
            .aggregate([("rev", "sum")])
            .rename_columns(["month", "rev"])
        )

    m = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("month")
    )
    x = (m["rev"].to_numpy(dtype=np.int64) // 100_000).astype(np.int64)
    n = len(x)
    ssd = int((np.diff(x).astype(object) ** 2).sum())
    sx = int(x.sum())
    sxx = int((x.astype(object) ** 2).sum())
    var_x = n * sxx - sx * sx
    # VN = [ssd/(n-1)] / [var_x/n²]  →  ppm = ssd·n²·10⁶ // ((n-1)·var_x)
    vn_ppm = ssd * n * n * 1_000_000 // ((n - 1) * var_x)
    return pa.table(
        {
            "n_months": pa.array([n], pa.int64()),
            "sum_sq_diff": pa.array([ssd], pa.int64()),
            "var_x": pa.array([var_x], pa.int64()),
            "vn_ppm": pa.array([int(vn_ppm)], pa.int64()),
        }
    )


ORDERS_MONTHLY_VON_NEUMANN_RATIO_SQL = """
WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       // 100000 AS BIGINT) AS rev
           FROM orders GROUP BY 1),
d AS (SELECT rev, rev - lag(rev) OVER (ORDER BY month) AS df FROM m),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN df IS NOT NULL
                           THEN CAST(df AS HUGEINT)*df ELSE 0 END)
                  AS HUGEINT) AS ssd,
             CAST(SUM(rev) AS HUGEINT) AS sx,
             CAST(SUM(CAST(rev AS HUGEINT)*rev) AS HUGEINT) AS sxx
      FROM d)
SELECT n AS n_months, CAST(ssd AS BIGINT) AS sum_sq_diff,
       CAST(n*sxx - sx*sx AS BIGINT) AS var_x,
       CAST(ssd * n * n * 1000000 // ((n-1) * (n*sxx - sx*sx)) AS BIGINT)
           AS vn_ppm
FROM s
"""


def customer_first_dow_loyalty(sf_dir: str):
    """First-anchor LOYALTY: does a customer's first order weekday predict
    their later order weekdays?  Counts repeat orders landing on the
    anchor weekday vs the uniform-1/7 baseline, compared exactly by
    cross-multiplication (7·n_same vs n_repeat) with the rate in ppm.
    Per-customer streams fold inside map_groups; only two counters
    shuffle."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def per_customer(g: pa.Table) -> pa.Table:
        s = g.sort_by([("o_orderdate", "ascending"), ("o_orderkey", "ascending")])
        dow = pc.add(pc.day_of_week(s["o_orderdate"]), 1).to_numpy(
            zero_copy_only=False
        )
        if len(dow) < 2:
            return pa.table(
                {
                    "n_repeat": pa.array([0], pa.int64()),
                    "n_same": pa.array([0], pa.int64()),
                }
            )
        return pa.table(
            {
                "n_repeat": pa.array([len(dow) - 1], pa.int64()),
                "n_same": pa.array([int((dow[1:] == dow[0]).sum())], pa.int64()),
            }
        )

    p = (
        ds.groupby("o_custkey")
        .map_groups(per_customer, batch_format="pyarrow")
        .to_pandas()
    )
    n_repeat = int(p["n_repeat"].sum())
    n_same = int(p["n_same"].sum())
    return pa.table(
        {
            "n_repeat": pa.array([n_repeat], pa.int64()),
            "n_same": pa.array([n_same], pa.int64()),
            "loyalty_ppm": pa.array([n_same * 1_000_000 // n_repeat], pa.int64()),
            "excess_sign": pa.array(
                [
                    1
                    if 7 * n_same > n_repeat
                    else (-1 if 7 * n_same < n_repeat else 0)
                ],
                pa.int64(),
            ),
        }
    )


CUSTOMER_FIRST_DOW_LOYALTY_SQL = """
WITH o AS (SELECT o_custkey,
                  CAST(isodow(o_orderdate) AS BIGINT) AS dow,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn,
                  first_value(CAST(isodow(o_orderdate) AS BIGINT)) OVER
                      (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS first_dow
           FROM orders),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_repeat,
             CAST(SUM(CASE WHEN dow = first_dow THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_same
      FROM o WHERE rn > 1)
SELECT n_repeat, n_same,
       CAST(n_same * 1000000 // n_repeat AS BIGINT) AS loyalty_ppm,
       CAST(CASE WHEN 7*n_same > n_repeat THEN 1
                 WHEN 7*n_same < n_repeat THEN -1 ELSE 0 END AS BIGINT)
           AS excess_sign
FROM s
"""


def events_hourly_time_reversal_stat(sf_dir: str):
    """TIME-REVERSAL asymmetry of the hourly arrival series: Σd³ over
    successive-count differences (zero for any time-reversible process;
    a signed excess means ramps and crashes are shaped differently) plus
    the Σd² normalizer — cubes of integer diffs, so the nonlinearity
    diagnostic is exact.  Hour-bucket counts reduce distributed; the
    difference walk runs over the observed-hour series on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        hb = pc.divide(t["ts"].cast(pa.int64()), 3_600_000_000)
        return (
            pa.table({"hb": hb})
            .group_by("hb")
            .aggregate([("hb", "count")])
            .rename_columns(["hb", "n"])
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hb")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("hb")
    )
    d = np.diff(h["n"].to_numpy(dtype=np.int64)).astype(object)
    sum_d2 = int((d**2).sum())
    sum_d3 = int((d**3).sum())
    return pa.table(
        {
            "n_hours": pa.array([len(h)], pa.int64()),
            "sum_d2": pa.array([sum_d2], pa.int64()),
            "sum_d3": pa.array([sum_d3], pa.int64()),
            "trev_sign": pa.array(
                [1 if sum_d3 > 0 else (-1 if sum_d3 < 0 else 0)], pa.int64()
            ),
        }
    )


EVENTS_HOURLY_TIME_REVERSAL_STAT_SQL = """
WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hb,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
d AS (SELECT n - lag(n) OVER (ORDER BY hb) AS df FROM h),
s AS (SELECT CAST((SELECT COUNT(*) FROM h) AS BIGINT) AS n_hours,
             CAST(SUM(df*df) AS BIGINT) AS sum_d2,
             CAST(SUM(df*df*df) AS BIGINT) AS sum_d3
      FROM d WHERE df IS NOT NULL)
SELECT n_hours, sum_d2, sum_d3,
       CAST(CASE WHEN sum_d3 > 0 THEN 1 WHEN sum_d3 < 0 THEN -1
                 ELSE 0 END AS BIGINT) AS trev_sign
FROM s
"""


def orders_seasonal_peak_shift_census(sf_dir: str):
    """Seasonal PEAK drift: each year's top revenue month (earliest month
    wins ties) compared with the next year's on the 12-month CIRCLE —
    min(|Δ|, 12−|Δ|) — so a December→January move reads as 1, not 11.
    Monthly totals reduce distributed; the argmax-and-wrap fold runs
    over the tiny year×month table on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "y": pc.year(t["o_orderdate"]),
                    "m": pc.month(t["o_orderdate"]),
                    "rev": _cents(t["o_totalprice"]),
                }
            )
            .group_by(["y", "m"])
            .aggregate([("rev", "sum")])
            .rename_columns(["y", "m", "rev"])
        )

    ym = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["y", "m"])
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    peaks = {}
    for y, g in ym.groupby("y"):
        g = g.sort_values(["rev", "m"], ascending=[False, True])
        peaks[int(y)] = int(g.iloc[0]["m"])
    years = sorted(peaks)
    rows = []
    for y1, y2 in zip(years, years[1:]):
        d = abs(peaks[y2] - peaks[y1])
        rows.append((y1, y2, peaks[y1], peaks[y2], min(d, 12 - d)))
    return pa.table(
        {
            "year1": pa.array([r[0] for r in rows], pa.int64()),
            "year2": pa.array([r[1] for r in rows], pa.int64()),
            "peak1": pa.array([r[2] for r in rows], pa.int64()),
            "peak2": pa.array([r[3] for r in rows], pa.int64()),
            "circ_shift": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


ORDERS_SEASONAL_PEAK_SHIFT_CENSUS_SQL = """
WITH ym AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                   CAST(month(o_orderdate) AS BIGINT) AS m,
                   CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev
            FROM orders GROUP BY 1, 2),
p AS (SELECT y, m AS peak FROM (
        SELECT y, m, ROW_NUMBER() OVER
               (PARTITION BY y ORDER BY rev DESC, m) AS rn FROM ym)
      WHERE rn = 1)
SELECT a.y AS year1, b.y AS year2, a.peak AS peak1, b.peak AS peak2,
       CAST(LEAST(ABS(b.peak - a.peak), 12 - ABS(b.peak - a.peak))
            AS BIGINT) AS circ_shift
FROM p a JOIN p b ON b.y = a.y + 1 ORDER BY year1
"""


def events_daily_exceedance_cluster_census(sf_dir: str):
    """EXTREMAL-INDEX front end by runs declustering: days whose event
    count strictly exceeds the P90 of daily counts, grouped into clusters
    of consecutive days — θ ≈ clusters/exceedances in ppm (θ≪1 means
    extremes arrive in storms, not in isolation).  Daily counts reduce
    distributed; the threshold pick (exact discrete quantile) and the
    run walk fold over the day table on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), 86_400_000_000)
        return (
            pa.table({"day": day})
            .group_by("day")
            .aggregate([("day", "count")])
            .rename_columns(["day", "n"])
        )

    d = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("day")
    )
    n = d["n"].to_numpy(dtype=np.int64)
    days = d["day"].to_numpy(dtype=np.int64)
    srt = np.sort(n)
    total = len(srt)
    thr = int(srt[int(np.ceil(0.9 * total)) - 1])  # quantile_disc convention
    exd = days[n > thr]
    n_exceed = len(exd)
    n_clusters = 0 if n_exceed == 0 else 1 + int((np.diff(exd) > 1).sum())
    return pa.table(
        {
            "n_days": pa.array([total], pa.int64()),
            "threshold": pa.array([thr], pa.int64()),
            "n_exceed": pa.array([n_exceed], pa.int64()),
            "n_clusters": pa.array([n_clusters], pa.int64()),
            "theta_ppm": pa.array(
                [n_clusters * 1_000_000 // n_exceed if n_exceed else 0], pa.int64()
            ),
        }
    )


EVENTS_DAILY_EXCEEDANCE_CLUSTER_CENSUS_SQL = """
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day_,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
t AS (SELECT CAST(quantile_disc(n, 0.9) AS BIGINT) AS thr,
             CAST(COUNT(*) AS BIGINT) AS n_days FROM d),
e AS (SELECT day_, day_ - lag(day_) OVER (ORDER BY day_) AS gap
      FROM d, t WHERE d.n > t.thr),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exceed,
             CAST(SUM(CASE WHEN gap IS NULL OR gap > 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clusters
      FROM e)
SELECT t.n_days, t.thr AS threshold, s.n_exceed, s.n_clusters,
       CAST(CASE WHEN s.n_exceed > 0
                 THEN s.n_clusters * 1000000 // s.n_exceed
                 ELSE 0 END AS BIGINT) AS theta_ppm
FROM t, s
"""


def lineitem_within_order_qty_ordering_census(sf_dir: str):
    """Within-order MICRO-ORDERING census: across all line pairs inside
    the same order (by line number), do later lines carry larger
    quantities?  Global concordant / discordant / tied pair counts — the
    aggregated micro-Kendall answer to "is there an entry-order effect",
    exact integers.  An 8-partition self-join co-locates each order; the
    pair classification is vectorized post-join."""
    a = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )

    def prep_b(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k2": t["l_orderkey"],
                "ln2": t["l_linenumber"],
                "q2": pc.cast(t["l_quantity"], pa.int64()),
            }
        )

    b = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber", "l_quantity"]
    ).map_batches(prep_b, batch_format="pyarrow")
    j = a.join(
        b,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("k2",),
    )

    def classify(t: pa.Table) -> pa.Table:
        ln1 = t["l_linenumber"].to_numpy(zero_copy_only=False)
        ln2 = t["ln2"].to_numpy(zero_copy_only=False)
        q1 = pc.cast(t["l_quantity"], pa.int64()).to_numpy(zero_copy_only=False)
        q2 = t["q2"].to_numpy(zero_copy_only=False)
        m = ln2 > ln1
        inc = int(((q2 > q1) & m).sum())
        dec = int(((q2 < q1) & m).sum())
        tie = int(((q2 == q1) & m).sum())
        return pa.table(
            {
                "n_inc": pa.array([inc], pa.int64()),
                "n_dec": pa.array([dec], pa.int64()),
                "n_tie": pa.array([tie], pa.int64()),
            }
        )

    p = j.map_batches(classify, batch_format="pyarrow").to_pandas()
    inc = int(p["n_inc"].sum())
    dec = int(p["n_dec"].sum())
    tie = int(p["n_tie"].sum())
    return pa.table(
        {
            "n_pairs": pa.array([inc + dec + tie], pa.int64()),
            "n_inc": pa.array([inc], pa.int64()),
            "n_dec": pa.array([dec], pa.int64()),
            "n_tie": pa.array([tie], pa.int64()),
        }
    )


LINEITEM_WITHIN_ORDER_QTY_ORDERING_CENSUS_SQL = """
WITH p AS (SELECT CASE WHEN b.l_quantity > a.l_quantity THEN 1 ELSE 0 END
               AS inc,
           CASE WHEN b.l_quantity < a.l_quantity THEN 1 ELSE 0 END AS dec_,
           CASE WHEN b.l_quantity = a.l_quantity THEN 1 ELSE 0 END AS tie
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND b.l_linenumber > a.l_linenumber)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(inc) AS BIGINT) AS n_inc,
       CAST(SUM(dec_) AS BIGINT) AS n_dec,
       CAST(SUM(tie) AS BIGINT) AS n_tie
FROM p
"""


def events_type_daily_count_cov_matrix(sf_dir: str):
    """Pairwise COVARIANCE structure of type arrival series: for each type
    pair, the cross-multiplied covariance numerator n·Σxy − Σx·Σy and both
    variance numerators over the dense daily-count grid (absent days count
    0) — which demand streams move together, exact integers end to end.
    (type, day) partials reduce distributed; the 10-pair fold runs over a
    5×days grid on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(t["ts"].cast(pa.int64()), 86_400_000_000)
        return (
            pa.table({"ty": t["event_type"], "day": day})
            .group_by(["ty", "day"])
            .aggregate([("ty", "count")])
            .rename_columns(["ty", "day", "n"])
        )

    c = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["ty", "day"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    lo, hi = int(c["day"].min()), int(c["day"].max())
    piv = c.pivot_table(index="day", columns="ty", values="n", fill_value=0)
    piv = piv.reindex(range(lo, hi + 1), fill_value=0)
    types = sorted(piv.columns)
    n = len(piv)
    rows = []
    for i, t1 in enumerate(types):
        x = piv[t1].to_numpy(dtype=np.int64)
        for t2 in types[i + 1 :]:
            y = piv[t2].to_numpy(dtype=np.int64)
            rows.append(
                (
                    t1,
                    t2,
                    n,
                    n * int((x * y).sum()) - int(x.sum()) * int(y.sum()),
                    n * int((x * x).sum()) - int(x.sum()) ** 2,
                    n * int((y * y).sum()) - int(y.sum()) ** 2,
                )
            )
    return pa.table(
        {
            "type1": pa.array([r[0] for r in rows], pa.string()),
            "type2": pa.array([r[1] for r in rows], pa.string()),
            "n_days": pa.array([r[2] for r in rows], pa.int64()),
            "cov_num": pa.array([r[3] for r in rows], pa.int64()),
            "var1_num": pa.array([r[4] for r in rows], pa.int64()),
            "var2_num": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


EVENTS_TYPE_DAILY_COUNT_COV_MATRIX_SQL = """
WITH c AS (SELECT event_type AS ty, epoch_us(ts) // 86400000000 AS day_,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
b AS (SELECT MIN(day_) AS lo, MAX(day_) AS hi FROM c),
days AS (SELECT unnest(range(0, CAST(b.hi - b.lo + 1 AS BIGINT))) + b.lo
             AS day_ FROM b),
types AS (SELECT DISTINCT ty FROM c),
grid AS (SELECT t.ty, d.day_, COALESCE(c.n, 0) AS n
         FROM types t CROSS JOIN days d
         LEFT JOIN c ON c.ty = t.ty AND c.day_ = d.day_),
pairs AS (SELECT a.ty AS type1, b.ty AS type2
          FROM types a JOIN types b ON a.ty < b.ty),
j AS (SELECT p.type1, p.type2, g1.n AS x, g2.n AS y
      FROM pairs p
      JOIN grid g1 ON g1.ty = p.type1
      JOIN grid g2 ON g2.ty = p.type2 AND g2.day_ = g1.day_)
SELECT type1, type2, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COUNT(*)*SUM(x*y) - SUM(x)*SUM(y) AS BIGINT) AS cov_num,
       CAST(COUNT(*)*SUM(x*x) - SUM(x)*SUM(x) AS BIGINT) AS var1_num,
       CAST(COUNT(*)*SUM(y*y) - SUM(y)*SUM(y) AS BIGINT) AS var2_num
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


def lineitem_volume_discount_curve(sf_dir: str):
    """VOLUME-DISCOUNT curve: for each order quantity, the exact mean unit
    price in whole cents (Σ extendedprice // (q·n), no per-row division
    ever happens) — a falling curve is bulk pricing, flat is linear
    pricing.  One pass of (quantity → n, Σcents) partials."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        q = pc.cast(t["l_quantity"], pa.int64())
        return (
            pa.table({"quantity": q, "ext": _cents(t["l_extendedprice"])})
            .group_by("quantity")
            .aggregate([("ext", "sum"), ("ext", "count")])
            .rename_columns(["quantity", "sum_ext", "n"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("quantity")
        .aggregate(Sum("sum_ext", alias_name="sum_ext"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("quantity")
    )
    q = agg["quantity"].to_numpy(dtype=np.int64)
    s = agg["sum_ext"].to_numpy(dtype=np.int64)
    n = agg["n"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "quantity": pa.array(q),
            "n": pa.array(n),
            "sum_ext_cents": pa.array(s),
            "mean_unit_cents": pa.array(s // (q * n)),
        }
    )


LINEITEM_VOLUME_DISCOUNT_CURVE_SQL = """
SELECT CAST(l_quantity AS BIGINT) AS quantity,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_ext_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT))
            // (CAST(l_quantity AS BIGINT) * COUNT(*)) AS BIGINT)
           AS mean_unit_cents
FROM lineitem GROUP BY 1 ORDER BY 1
"""


def part_price_otsu_split(sf_dir: str):
    """OTSU-optimal price threshold: the exact two-cluster split of the
    part price distribution (whole-dollar grid) maximizing between-class
    separation S₁²/n₁ + S₂²/n₂, chosen by EXACT fraction comparison —
    cross-multiplied in arbitrary-precision driver ints (and HUGEINT
    anti-join in the oracle), smallest split wins ties.  The canonical
    1-D segmentation / histogram-thresholding primitive.  (dollar, count)
    partials reduce distributed; the candidate scan folds over the tiny
    distinct-value table."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        d = pc.divide(_cents(t["p_retailprice"]), 100)
        return (
            pa.table({"dollar": d})
            .group_by("dollar")
            .aggregate([("dollar", "count")])
            .rename_columns(["dollar", "n"])
        )

    vc = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dollar")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("dollar")
        .reset_index(drop=True)
    )
    v = vc["dollar"].to_numpy(dtype=np.int64)
    w = vc["n"].to_numpy(dtype=np.int64)
    cn = np.cumsum(w)
    cs = np.cumsum(v * w)
    n_tot, s_tot = int(cn[-1]), int(cs[-1])
    best = None
    for i in range(len(v) - 1):  # split: cluster1 = values <= v[i]
        n1, s1 = int(cn[i]), int(cs[i])
        n2, s2 = n_tot - n1, s_tot - s1
        num = s1 * s1 * n2 + s2 * s2 * n1
        den = n1 * n2
        if best is None or num * best[2] > best[1] * den:
            best = (int(v[i]), num, den, n1, n2, s1, s2)
    split, num, den, n1, n2, s1, s2 = best
    return pa.table(
        {
            "split_dollar": pa.array([split], pa.int64()),
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "sum1_dollars": pa.array([s1], pa.int64()),
            "sum2_dollars": pa.array([s2], pa.int64()),
        }
    )


PART_PRICE_OTSU_SPLIT_SQL = """
WITH vc AS (SELECT CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT) // 100
                AS dollar, CAST(COUNT(*) AS BIGINT) AS n
            FROM part GROUP BY 1),
pre AS (SELECT dollar,
               CAST(SUM(n) OVER (ORDER BY dollar) AS BIGINT) AS cn,
               CAST(SUM(n*dollar) OVER (ORDER BY dollar) AS BIGINT) AS cs
        FROM vc),
tot AS (SELECT MAX(cn) AS n_tot, MAX(cs) AS s_tot FROM pre),
cand AS (SELECT p.dollar AS split_dollar, p.cn AS n1, t.n_tot - p.cn AS n2,
                p.cs AS s1, t.s_tot - p.cs AS s2,
                CAST(p.cs AS HUGEINT)*p.cs*(t.n_tot - p.cn)
                  + CAST(t.s_tot - p.cs AS HUGEINT)*(t.s_tot - p.cs)*p.cn
                    AS num,
                CAST(p.cn AS HUGEINT)*(t.n_tot - p.cn) AS den
         FROM pre p, tot t
         WHERE p.cn < t.n_tot)
SELECT c.split_dollar, c.n1, c.n2,
       c.s1 AS sum1_dollars, c.s2 AS sum2_dollars
FROM cand c
WHERE NOT EXISTS (SELECT 1 FROM cand o
                  WHERE o.num*c.den > c.num*o.den
                     OR (o.num*c.den = c.num*o.den
                         AND o.split_dollar < c.split_dollar))
"""


def media_image_resize(sf_dir: str):
    """Multimodal resize plumbing (rows-only): synthetic media column →
    actor-pool ImageResize stage (nearest-neighbor on the deterministic
    fake decode; Ray actor plumbing, schema and batch sizing real)."""
    from ...stages.multimodal import ImageResize, media_table_from_documents

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    media = docs.map_batches(media_table_from_documents, batch_format="pyarrow")
    images = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    return images.map_batches(
        ImageResize, concurrency=(1, 4), batch_size=64, batch_format="pyarrow"
    )


def events_hourly_regime_transition_counts(sf_dir: str):
    """Two-state REGIME dynamics of the arrival process: hours binarized
    at the exact median hourly count (hi = strictly above), and the 2×2
    transition census over consecutive observed hours — sticky regimes
    (hh/ll heavy) vs flickering load, with zero distributional
    assumptions.  Hour-bucket counts reduce distributed; the threshold
    pick and the transition walk fold on the driver."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        hb = pc.divide(t["ts"].cast(pa.int64()), 3_600_000_000)
        return (
            pa.table({"hb": hb})
            .group_by("hb")
            .aggregate([("hb", "count")])
            .rename_columns(["hb", "n"])
        )

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hb")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("hb")
    )
    n = h["n"].to_numpy(dtype=np.int64)
    srt = np.sort(n)
    thr = int(srt[(len(srt) - 1) // 2])  # lower median (quantile_disc 0.5)
    hi = n > thr
    a, b = hi[:-1], hi[1:]
    return pa.table(
        {
            "threshold": pa.array([thr], pa.int64()),
            "n_ll": pa.array([int((~a & ~b).sum())], pa.int64()),
            "n_lh": pa.array([int((~a & b).sum())], pa.int64()),
            "n_hl": pa.array([int((a & ~b).sum())], pa.int64()),
            "n_hh": pa.array([int((a & b).sum())], pa.int64()),
        }
    )


EVENTS_HOURLY_REGIME_TRANSITION_COUNTS_SQL = """
WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hb,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
t AS (SELECT CAST(quantile_disc(n, 0.5) AS BIGINT) AS thr FROM h),
s AS (SELECT (n > t.thr) AS hi,
             lag(n > t.thr) OVER (ORDER BY hb) AS phi
      FROM h, t)
SELECT (SELECT thr FROM t) AS threshold,
       CAST(SUM(CASE WHEN NOT phi AND NOT hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ll,
       CAST(SUM(CASE WHEN NOT phi AND hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lh,
       CAST(SUM(CASE WHEN phi AND NOT hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hl,
       CAST(SUM(CASE WHEN phi AND hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hh
FROM s WHERE phi IS NOT NULL
"""


def events_session_gap_contrast(sf_dir: str):
    """Sessionization VALIDATION by gap contrast: per-user consecutive
    inter-event gaps split at the 1800 s session threshold — counts,
    exact µs totals and floor-mean of within- vs between-session gaps.
    A healthy threshold shows means separated by orders of magnitude;
    overlap means the cut is arbitrary.  Per-user streams fold inside
    map_groups to four counters."""
    T_US = 1_800_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])

    def per_user(g: pa.Table) -> pa.Table:
        s = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        us = s["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        gaps = np.diff(us)
        w = gaps[gaps <= T_US]
        b = gaps[gaps > T_US]
        return pa.table(
            {
                "n_within": pa.array([len(w)], pa.int64()),
                "sum_within_us": pa.array([int(w.sum())], pa.int64()),
                "n_between": pa.array([len(b)], pa.int64()),
                "sum_between_us": pa.array([int(b.sum())], pa.int64()),
            }
        )

    p = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .to_pandas()
    )
    nw = int(p["n_within"].sum())
    sw = int(p["sum_within_us"].sum())
    nb = int(p["n_between"].sum())
    sb = int(p["sum_between_us"].sum())
    return pa.table(
        {
            "n_within": pa.array([nw], pa.int64()),
            "sum_within_us": pa.array([sw], pa.int64()),
            "mean_within_us": pa.array([sw // nw if nw else 0], pa.int64()),
            "n_between": pa.array([nb], pa.int64()),
            "sum_between_us": pa.array([sb], pa.int64()),
            "mean_between_us": pa.array([sb // nb if nb else 0], pa.int64()),
        }
    )


EVENTS_SESSION_GAP_CONTRAST_SQL = """
WITH g AS (SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events),
s AS (SELECT CAST(SUM(CASE WHEN gap <= 1800000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_within,
             CAST(SUM(CASE WHEN gap <= 1800000000 THEN gap ELSE 0 END)
                  AS BIGINT) AS sum_within_us,
             CAST(SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_between,
             CAST(SUM(CASE WHEN gap > 1800000000 THEN gap ELSE 0 END)
                  AS BIGINT) AS sum_between_us
      FROM g WHERE gap IS NOT NULL)
SELECT n_within, sum_within_us,
       CAST(CASE WHEN n_within > 0 THEN sum_within_us // n_within
                 ELSE 0 END AS BIGINT) AS mean_within_us,
       n_between, sum_between_us,
       CAST(CASE WHEN n_between > 0 THEN sum_between_us // n_between
                 ELSE 0 END AS BIGINT) AS mean_between_us
FROM s
"""


def docs_dup_cluster_source_spread_hist(sf_dir: str):
    """Near-duplicate-cluster PROVENANCE spread: documents sharing a
    40-char text prefix (the template-cluster key) grouped into clusters;
    among multi-document clusters, how many distinct sources each spans,
    histogrammed — clusters confined to one source are re-crawls, wide
    clusters are syndication (the dedup-policy question: collapse across
    sources or not?).  Distinct (prefix, source) partials shrink before
    the shuffle; only cluster-level counters leave."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(t["text"], start=0, stop=40)
        return (
            pa.table({"pref": pref, "source": t["source"]})
            .group_by(["pref", "source"])
            .aggregate([("source", "count")])
            .rename_columns(["pref", "source", "n"])
        )

    ts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["pref", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    g = ts.groupby("pref").agg(total=("n", "sum"), n_sources=("source", "nunique"))
    dup = g[g["total"] > 1]
    hist = dup.groupby("n_sources").size().sort_index()
    return pa.table(
        {
            "n_sources": pa.array(hist.index.to_numpy(dtype=np.int64)),
            "n_clusters": pa.array(hist.to_numpy(dtype=np.int64)),
        }
    )


DOCS_DUP_CLUSTER_SOURCE_SPREAD_HIST_SQL = """
WITH c AS (SELECT substr(text, 1, 40) AS pref,
                  CAST(COUNT(*) AS BIGINT) AS total,
                  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
           FROM documents GROUP BY 1)
SELECT n_sources, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM c WHERE total > 1 GROUP BY 1 ORDER BY 1
"""


def events_hourly_rollup_export_manifest(sf_dir: str):
    """Materialized-view EXPORT with a verifiable manifest: the hourly
    (date, hour → count, value cents) rollup is written as parquet
    partitioned by date under /tmp (resumable layout: one directory per
    day), and the op returns the per-date manifest — hours present, event
    total, cents total and an integer checksum Σ(hour+1)·(n + cents) mod
    1000003 — so a consumer can verify every partition without reading
    the data files.  The oracle reproduces the manifest from the raw
    table."""
    import hashlib
    import os

    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        d = pc.strftime(t["ts"], format="%Y-%m-%d")
        h = pc.hour(t["ts"])
        return (
            pa.table({"date_": d, "hour": h, "n": pa.array(np.ones(t.num_rows, dtype=np.int64)), "cents": _cents(t["value"])})
            .group_by(["date_", "hour"])
            .aggregate([("n", "sum"), ("cents", "sum")])
            .rename_columns(["date_", "hour", "n", "cents"])
        )

    rollup = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["date_", "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    )
    tag = hashlib.blake2b(
        f"{sf_dir}:{os.stat(_t(sf_dir, 'events')).st_mtime_ns}".encode(),
        digest_size=8,
    ).hexdigest()
    out_dir = f"/tmp/iocr_hourly_mv_{tag}"
    rollup.write_parquet(out_dir, partition_cols=["date_"])
    mv = rollup.to_pandas()
    m = (
        mv.assign(chk=(mv["hour"] + 1) * (mv["n"] + mv["cents"]))
        .groupby("date_")
        .agg(
            n_hours=("hour", "size"),
            n_events=("n", "sum"),
            sum_cents=("cents", "sum"),
            checksum=("chk", lambda s: int(s.sum()) % 1000003),
        )
        .reset_index()
        .sort_values("date_")
    )
    return pa.table(
        {
            "date_": pa.array(m["date_"].to_numpy(), pa.string()),
            "n_hours": pa.array(m["n_hours"].to_numpy(dtype=np.int64)),
            "n_events": pa.array(m["n_events"].to_numpy(dtype=np.int64)),
            "sum_cents": pa.array(m["sum_cents"].to_numpy(dtype=np.int64)),
            "checksum": pa.array(m["checksum"].to_numpy(dtype=np.int64)),
        }
    )


EVENTS_HOURLY_ROLLUP_EXPORT_MANIFEST_SQL = """
WITH r AS (SELECT strftime(ts, '%Y-%m-%d') AS date_,
                  CAST(hour(ts) AS BIGINT) AS hour,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS cents
           FROM events GROUP BY 1, 2)
SELECT date_, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM((hour + 1) * (n + cents)) % 1000003 AS BIGINT) AS checksum
FROM r GROUP BY 1 ORDER BY 1
"""


def supplier_q15_top_quarter(sf_dir: str):
    """TPC-H Q15 shape: top supplier(s) by discounted revenue over the
    1996-Q1 ship window, ALL ties kept (the view + max + equality join of
    the original, collapsed into one plan).  Revenue is exact e-6 units
    (cents × (10000 − discount bp)); the per-supplier reduce is
    distributed and only the argmax fold runs on the driver.
    Cites reference test parity: SURVEY §2 SQL-family ledger."""
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1996-04-01", "us")
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    )

    def partial(t: pa.Table) -> pa.Table:
        ext = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        bp = (
            pc.cast(
                pc.floor(
                    pc.add(
                        pc.multiply(pc.cast(t["l_discount"], pa.float64()), 10000.0),
                        0.5,
                    )
                ),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        rev = ext * (10000 - bp)
        return (
            pa.table(
                {"sk": t["l_suppkey"], "rev": pa.array(rev, pa.int64())}
            )
            .group_by("sk")
            .aggregate([("rev", "sum")])
            .rename_columns(["sk", "rev"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
    )
    mx = int(agg["rev"].max())
    top = agg[agg["rev"] == mx].sort_values("sk")
    sup = rd.read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"]).to_pandas()
    names = dict(zip(sup["s_suppkey"], sup["s_name"]))
    return pa.table(
        {
            "s_suppkey": pa.array(top["sk"].to_numpy(dtype=np.int64)),
            "s_name": pa.array([names[k] for k in top["sk"]], pa.string()),
            "total_revenue_e6": pa.array(top["rev"].to_numpy(dtype=np.int64)),
        }
    )


SUPPLIER_Q15_TOP_QUARTER_SQL = """
WITH r AS (SELECT l_suppkey AS sk,
                  CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)
                           * (10000 - CAST(FLOOR(l_discount*10000 + 0.5)
                                           AS BIGINT))) AS BIGINT) AS rev
           FROM lineitem
           WHERE l_shipdate >= DATE '1996-01-01'
             AND l_shipdate < DATE '1996-04-01'
           GROUP BY 1),
m AS (SELECT MAX(rev) AS mx FROM r)
SELECT r.sk AS s_suppkey, s.s_name, r.rev AS total_revenue_e6
FROM r JOIN m ON r.rev = m.mx
JOIN supplier s ON s.s_suppkey = r.sk
ORDER BY s_suppkey
"""


def orders_month_half_contrast(sf_dir: str):
    """PAYCYCLE contrast: order counts and revenue for the first half of
    the month (day ≤ 15) vs the rest, with the mean-order-value
    comparison cross-multiplied (rev₁·n₂ vs rev₂·n₁) — the is-spend-
    front-loaded diagnostic behind billing-cycle capacity planning.
    One pass, two-counter block partials."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.day(t["o_orderdate"]).to_numpy(zero_copy_only=False)
        c = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        first = day <= 15
        return pa.table(
            {
                "n1": pa.array([int(first.sum())], pa.int64()),
                "rev1": pa.array([int(c[first].sum())], pa.int64()),
                "n2": pa.array([int((~first).sum())], pa.int64()),
                "rev2": pa.array([int(c[~first].sum())], pa.int64()),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n1, rev1 = int(p["n1"].sum()), int(p["rev1"].sum())
    n2, rev2 = int(p["n2"].sum()), int(p["rev2"].sum())
    lhs, rhs = rev1 * n2, rev2 * n1
    return pa.table(
        {
            "n_first_half": pa.array([n1], pa.int64()),
            "rev_first_half": pa.array([rev1], pa.int64()),
            "n_second_half": pa.array([n2], pa.int64()),
            "rev_second_half": pa.array([rev2], pa.int64()),
            "mean_diff_sign": pa.array(
                [1 if lhs > rhs else (-1 if lhs < rhs else 0)], pa.int64()
            ),
        }
    )


ORDERS_MONTH_HALF_CONTRAST_SQL = """
WITH s AS (SELECT
    CAST(SUM(CASE WHEN day(o_orderdate) <= 15 THEN 1 ELSE 0 END) AS BIGINT)
        AS n1,
    CAST(SUM(CASE WHEN day(o_orderdate) <= 15
                  THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS rev1,
    CAST(SUM(CASE WHEN day(o_orderdate) > 15 THEN 1 ELSE 0 END) AS BIGINT)
        AS n2,
    CAST(SUM(CASE WHEN day(o_orderdate) > 15
                  THEN CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS rev2
  FROM orders)
SELECT n1 AS n_first_half, rev1 AS rev_first_half,
       n2 AS n_second_half, rev2 AS rev_second_half,
       CAST(CASE WHEN rev1*n2 > rev2*n1 THEN 1
                 WHEN rev1*n2 < rev2*n1 THEN -1 ELSE 0 END AS BIGINT)
           AS mean_diff_sign
FROM s
"""


def lineitem_flag_mix_max_deviation(sf_dir: str):
    """Mix-stability MAX-DEVIATION with witness: for each return flag, the
    month where its share deviates most from the overall mix — deviation
    kept exact by cross-multiplication (|c·N − C·n|), earliest month wins
    ties.  The drill-down companion to a drift alarm: not just "the mix
    moved" but WHEN and for WHICH class.  (month, flag) partials reduce
    distributed; the witness argmax folds over the tiny mix table."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_shipdate", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        ym = pc.strftime(t["l_shipdate"], format="%Y-%m")
        return (
            pa.table({"month": ym, "flag": t["l_returnflag"]})
            .group_by(["month", "flag"])
            .aggregate([("flag", "count")])
            .rename_columns(["month", "flag", "n"])
        )

    mf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["month", "flag"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = int(mf["n"].sum())
    flag_tot = mf.groupby("flag")["n"].sum()
    month_tot = mf.groupby("month")["n"].sum()
    piv = mf.pivot_table(index="month", columns="flag", values="n", fill_value=0)
    rows = []
    for flag in sorted(flag_tot.index):
        c_f = int(flag_tot[flag])
        dev = np.abs(
            piv[flag].to_numpy(dtype=np.int64) * total
            - c_f * month_tot.reindex(piv.index).to_numpy(dtype=np.int64)
        )
        i = int(dev.argmax())  # argmax returns first (earliest month) on ties
        rows.append((flag, c_f, int(dev[i]), str(piv.index[i])))
    return pa.table(
        {
            "flag": pa.array([r[0] for r in rows], pa.string()),
            "flag_total": pa.array([r[1] for r in rows], pa.int64()),
            "max_dev_x": pa.array([r[2] for r in rows], pa.int64()),
            "witness_month": pa.array([r[3] for r in rows], pa.string()),
        }
    )


LINEITEM_FLAG_MIX_MAX_DEVIATION_SQL = """
WITH mf AS (SELECT strftime(l_shipdate, '%Y-%m') AS month, l_returnflag AS flag,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1, 2),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM mf),
ft AS (SELECT flag, CAST(SUM(n) AS BIGINT) AS c_f FROM mf GROUP BY 1),
mt AS (SELECT month, CAST(SUM(n) AS BIGINT) AS n_m FROM mf GROUP BY 1),
grid AS (SELECT ft.flag, ft.c_f, mt.month, mt.n_m,
                COALESCE(mf.n, 0) AS c_fm
         FROM ft CROSS JOIN mt
         LEFT JOIN mf ON mf.flag = ft.flag AND mf.month = mt.month),
dev AS (SELECT flag, c_f, month,
               ABS(c_fm * t.total - c_f * n_m) AS d
        FROM grid, t),
w AS (SELECT flag, c_f, month, d,
             ROW_NUMBER() OVER (PARTITION BY flag ORDER BY d DESC, month)
                 AS rn
      FROM dev)
SELECT flag, c_f AS flag_total, CAST(d AS BIGINT) AS max_dev_x,
       month AS witness_month
FROM w WHERE rn = 1 ORDER BY flag
"""


def events_weekly_user_flux(sf_dir: str):
    """Weekly user FLUX table: per ISO week (Monday start) the active user
    count, the users whose FIRST-ever event lands there (gained) and
    whose LAST-ever event lands there (lost, as of the data horizon) —
    the growth-accounting triplet behind every retention dashboard.
    Per-user first/last reduce distributed; distinct (week, user)
    partials shrink block-locally for the active count."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def fl_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"u": t["user_id"], "ts": t["ts"]})
            .group_by("u")
            .aggregate([("ts", "min"), ("ts", "max")])
            .rename_columns(["u", "first_ts", "last_ts"])
        )

    fl = (
        ds.map_batches(fl_partial, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Min("first_ts", alias_name="first_ts"), Max("last_ts", alias_name="last_ts"))
        .to_pandas()
    )

    def week_of(s: "pd.Series") -> "pd.Series":
        import pandas as pd

        dt = pd.to_datetime(s)
        monday = dt - pd.to_timedelta(dt.dt.weekday, unit="D")
        return monday.dt.strftime("%Y-%m-%d")

    new_w = week_of(fl["first_ts"]).value_counts()
    last_w = week_of(fl["last_ts"]).value_counts()

    def act_partial(t: pa.Table) -> pa.Table:
        wk = pc.strftime(
            pc.floor_temporal(t["ts"], unit="week"), format="%Y-%m-%d"
        )
        return (
            pa.table({"week_start": wk, "u": t["user_id"]})
            .group_by(["week_start", "u"])
            .aggregate([])
        )

    act = (
        ds.map_batches(act_partial, batch_format="pyarrow")
        .groupby(["week_start", "u"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
        .groupby("week_start")
        .size()
        .sort_index()
    )
    weeks = act.index.to_numpy()
    return pa.table(
        {
            "week_start": pa.array(weeks, pa.string()),
            "n_active": pa.array(act.to_numpy(dtype=np.int64)),
            "n_new": pa.array(
                np.array([int(new_w.get(w, 0)) for w in weeks], dtype=np.int64)
            ),
            "n_last": pa.array(
                np.array([int(last_w.get(w, 0)) for w in weeks], dtype=np.int64)
            ),
        }
    )


EVENTS_WEEKLY_USER_FLUX_SQL = """
WITH a AS (SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week_start,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
           FROM events GROUP BY 1),
fl AS (SELECT user_id,
              strftime(date_trunc('week', MIN(ts)), '%Y-%m-%d') AS fw,
              strftime(date_trunc('week', MAX(ts)), '%Y-%m-%d') AS lw
       FROM events GROUP BY 1),
nw AS (SELECT fw AS week_start, CAST(COUNT(*) AS BIGINT) AS n_new
       FROM fl GROUP BY 1),
lw AS (SELECT lw AS week_start, CAST(COUNT(*) AS BIGINT) AS n_last
       FROM fl GROUP BY 1)
SELECT a.week_start, a.n_active,
       COALESCE(nw.n_new, 0) AS n_new,
       COALESCE(lw.n_last, 0) AS n_last
FROM a LEFT JOIN nw USING (week_start) LEFT JOIN lw USING (week_start)
ORDER BY a.week_start
"""


def embeddings_lead_dim_sign_agreement(sf_dir: str):
    """JOINT sign structure of the leading 8 dimensions: for every dim
    pair, how many vectors agree in sign (both positive or both
    non-positive) — the pairwise complement to the marginal sign census
    (correlated signs reveal un-whitened axes).  Pure block-local bit
    compare; 28-row partials shuffle."""
    dims = 8
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])
    pairs = [(i, j) for i in range(dims) for j in range(i + 1, dims)]

    def partial(t: pa.Table) -> pa.Table:
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False))[:, :dims] > 0
        agree = np.array(
            [int((m[:, i] == m[:, j]).sum()) for i, j in pairs], dtype=np.int64
        )
        return pa.table(
            {
                "dim1": pa.array([i + 1 for i, _ in pairs], pa.int64()),
                "dim2": pa.array([j + 1 for _, j in pairs], pa.int64()),
                "n_agree": pa.array(agree),
                "n_total": pa.array(np.full(len(pairs), m.shape[0], dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dim1", "dim2"])
        .aggregate(
            Sum("n_agree", alias_name="n_agree"),
            Sum("n_total", alias_name="n_total"),
        )
        .sort(["dim1", "dim2"])
    )


EMBEDDINGS_LEAD_DIM_SIGN_AGREEMENT_SQL = """
WITH d1 AS (SELECT unnest(range(1, 9)) AS dim1),
d2 AS (SELECT unnest(range(1, 9)) AS dim2),
p AS (SELECT CAST(d1.dim1 AS BIGINT) AS dim1, CAST(d2.dim2 AS BIGINT) AS dim2
      FROM d1 JOIN d2 ON d1.dim1 < d2.dim2)
SELECT p.dim1, p.dim2,
       CAST(SUM(CASE WHEN (e.embedding[p.dim1] > 0)
                          = (e.embedding[p.dim2] > 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM p, embeddings e GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_id_time_order_audit(sf_dir: str):
    """Were event IDs assigned CHRONOLOGICALLY?  IDs and timestamps are
    range-bucketed into 16 bands each, and the full pair space is
    classified concordant / discordant / bucket-tied from the 16×16 grid
    (outer products — the N² pairs never materialize).  High discordance
    means the ID sequence is not a time sequence (sharded generators,
    backfill).  Two-phase: a global min/max aggregate, then one grid
    pass."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts"])

    def minmax(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        return pa.table(
            {
                "min_id": pa.array([pc.min(t["event_id"]).as_py()], pa.int64()),
                "max_id": pa.array([pc.max(t["event_id"]).as_py()], pa.int64()),
                "min_ts": pa.array([pc.min(us).as_py()], pa.int64()),
                "max_ts": pa.array([pc.max(us).as_py()], pa.int64()),
            }
        )

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    lo_i, hi_i = int(mm["min_id"].min()), int(mm["max_id"].max())
    lo_t, hi_t = int(mm["min_ts"].min()), int(mm["max_ts"].max())

    def grid(t: pa.Table) -> pa.Table:
        import pandas as pd

        i = t["event_id"].to_numpy(zero_copy_only=False)
        u = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bi = (i - lo_i) * 16 // (hi_i - lo_i + 1)
        bt = (u - lo_t) * 16 // (hi_t - lo_t + 1)
        df = pd.DataFrame({"bi": bi, "bt": bt})
        g = df.groupby(["bi", "bt"]).size().reset_index(name="n")
        return pa.table(
            {
                "bi": pa.array(g["bi"].to_numpy(dtype=np.int64)),
                "bt": pa.array(g["bt"].to_numpy(dtype=np.int64)),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64)),
            }
        )

    g = (
        ds.map_batches(grid, batch_format="pyarrow")
        .groupby(["bi", "bt"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    bi = g["bi"].to_numpy(dtype=np.int64)
    bt = g["bt"].to_numpy(dtype=np.int64)
    n = g["n"].to_numpy(dtype=np.int64)
    outer = n[:, None] * n[None, :]
    ig = bi[:, None] < bi[None, :]
    conc = int(outer[ig & (bt[:, None] < bt[None, :])].sum())
    disc = int(outer[ig & (bt[:, None] > bt[None, :])].sum())
    total = int(n.sum())
    n_pairs = total * (total - 1) // 2
    return pa.table(
        {
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "n_conc": pa.array([conc], pa.int64()),
            "n_disc": pa.array([disc], pa.int64()),
            "n_tie": pa.array([n_pairs - conc - disc], pa.int64()),
        }
    )


EVENTS_ID_TIME_ORDER_AUDIT_SQL = """
WITH b AS (SELECT MIN(event_id) AS lo_i, MAX(event_id) AS hi_i,
                  MIN(epoch_us(ts)) AS lo_t, MAX(epoch_us(ts)) AS hi_t
           FROM events),
g AS (SELECT (e.event_id - b.lo_i) * 16 // (b.hi_i - b.lo_i + 1) AS bi,
             (epoch_us(e.ts) - b.lo_t) * 16 // (b.hi_t - b.lo_t + 1) AS bt,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events e, b GROUP BY 1, 2),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g),
c AS (SELECT
        CAST((SELECT COALESCE(SUM(a.n*o.n), 0) FROM g a JOIN g o
              ON o.bi > a.bi AND o.bt > a.bt) AS BIGINT) AS n_conc,
        CAST((SELECT COALESCE(SUM(a.n*o.n), 0) FROM g a JOIN g o
              ON o.bi > a.bi AND o.bt < a.bt) AS BIGINT) AS n_disc)
SELECT CAST(t.total * (t.total - 1) // 2 AS BIGINT) AS n_pairs,
       c.n_conc, c.n_disc,
       CAST(t.total * (t.total - 1) // 2 - c.n_conc - c.n_disc AS BIGINT)
           AS n_tie
FROM t, c
"""


def customer_value_band_final_year_retention(sf_dir: str):
    """RETENTION differential across VALUE bands: customers split at the
    exact spend quartiles (quantile_disc picks; band = 1 + #thresholds
    strictly exceeded) and, per band, the share still ordering in the
    data's final year — do high-value customers actually stick?
    Per-customer (spend, last year) reduce distributed; the quartile
    pick and band census fold on the driver."""
    import pandas as pd

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "ck": t["o_custkey"],
                    "spend": _cents(t["o_totalprice"]),
                    "y": pc.year(t["o_orderdate"]),
                }
            )
            .group_by("ck")
            .aggregate([("spend", "sum"), ("y", "max")])
            .rename_columns(["ck", "spend", "last_y"])
        )

    cust = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("spend", alias_name="spend"), Max("last_y", alias_name="last_y"))
        .to_pandas()
    )
    s = np.sort(cust["spend"].to_numpy(dtype=np.int64))
    n = len(s)
    q = [int(s[int(np.ceil(p * n)) - 1]) for p in (0.25, 0.5, 0.75)]
    spend = cust["spend"].to_numpy(dtype=np.int64)
    band = 1 + (spend > q[0]).astype(np.int64) + (spend > q[1]) + (spend > q[2])
    final_y = int(cust["last_y"].max())
    retained = (cust["last_y"].to_numpy(dtype=np.int64) == final_y).astype(np.int64)
    df = pd.DataFrame({"band": band, "ret": retained})
    g = df.groupby("band").agg(n_customers=("ret", "size"), n_retained=("ret", "sum"))
    g = g.reindex([1, 2, 3, 4], fill_value=0)
    nc = g["n_customers"].to_numpy(dtype=np.int64)
    nr = g["n_retained"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "band": pa.array(np.arange(1, 5, dtype=np.int64)),
            "n_customers": pa.array(nc),
            "n_retained": pa.array(nr),
            "retention_ppm": pa.array(
                np.where(nc > 0, nr * 1_000_000 // np.maximum(nc, 1), 0)
            ),
        }
    )


CUSTOMER_VALUE_BAND_FINAL_YEAR_RETENTION_SQL = """
WITH c AS (SELECT o_custkey,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS spend,
                  CAST(MAX(year(o_orderdate)) AS BIGINT) AS last_y
           FROM orders GROUP BY 1),
q AS (SELECT CAST(quantile_disc(spend, 0.25) AS BIGINT) AS q1,
             CAST(quantile_disc(spend, 0.5) AS BIGINT) AS q2,
             CAST(quantile_disc(spend, 0.75) AS BIGINT) AS q3,
             CAST(MAX(last_y) AS BIGINT) AS final_y
      FROM c),
b AS (SELECT 1 + CASE WHEN c.spend > q.q1 THEN 1 ELSE 0 END
              + CASE WHEN c.spend > q.q2 THEN 1 ELSE 0 END
              + CASE WHEN c.spend > q.q3 THEN 1 ELSE 0 END AS band,
             CASE WHEN c.last_y = q.final_y THEN 1 ELSE 0 END AS ret
      FROM c, q),
bands AS (SELECT unnest(range(1, 5)) AS band)
SELECT CAST(bands.band AS BIGINT) AS band,
       CAST(COALESCE(g.n_customers, 0) AS BIGINT) AS n_customers,
       CAST(COALESCE(g.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(CASE WHEN COALESCE(g.n_customers, 0) > 0
                 THEN g.n_retained * 1000000 // g.n_customers
                 ELSE 0 END AS BIGINT) AS retention_ppm
FROM bands LEFT JOIN (SELECT band, COUNT(*) AS n_customers,
                             SUM(ret) AS n_retained FROM b GROUP BY 1) g
  ON g.band = bands.band
ORDER BY band
"""


def orders_monthly_chow_break_stats(sf_dir: str):
    """CHOW structural-break sufficient statistics: the monthly revenue
    series ($1000 units) regressed on its time index — exact integer
    moment rows (n, Σt, Σy, Σt², Σty, Σy²) for the pooled series and each
    half, from which the Chow F folds downstream without a float in the
    pipeline.  Monthly totals reduce distributed; the split fold runs
    over the ≤ 84-row series on the driver."""
    import pandas as pd

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
                    "rev": _cents(t["o_totalprice"]),
                }
            )
            .group_by("month")
            .aggregate([("rev", "sum")])
            .rename_columns(["month", "rev"])
        )

    m = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    y = (m["rev"].to_numpy(dtype=np.int64) // 100_000).astype(np.int64)
    t = np.arange(len(y), dtype=np.int64)
    half = len(y) // 2
    segs = [("h1", t[:half], y[:half]), ("h2", t[half:], y[half:]), ("pooled", t, y)]
    rows = []
    for name, ts_, ys_ in segs:
        rows.append(
            (
                name,
                len(ts_),
                int(ts_.sum()),
                int(ys_.sum()),
                int((ts_ * ts_).sum()),
                int((ts_ * ys_).sum()),
                int((ys_.astype(object) ** 2).sum()),
            )
        )
    return pa.table(
        {
            "segment": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "sum_t": pa.array([r[2] for r in rows], pa.int64()),
            "sum_y": pa.array([r[3] for r in rows], pa.int64()),
            "sum_tt": pa.array([r[4] for r in rows], pa.int64()),
            "sum_ty": pa.array([r[5] for r in rows], pa.int64()),
            "sum_yy": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


ORDERS_MONTHLY_CHOW_BREAK_STATS_SQL = """
WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
                  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT))
                       // 100000 AS BIGINT) AS y
           FROM orders GROUP BY 1),
s AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY month) - 1 AS BIGINT) AS t, y
      FROM m),
k AS (SELECT CAST(COUNT(*) // 2 AS BIGINT) AS half FROM s),
seg AS (SELECT 'pooled' AS segment, t, y FROM s
        UNION ALL
        SELECT 'h1', t, y FROM s, k WHERE t < k.half
        UNION ALL
        SELECT 'h2', t, y FROM s, k WHERE t >= k.half)
SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(t) AS BIGINT) AS sum_t, CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(t*t) AS BIGINT) AS sum_tt,
       CAST(SUM(t*y) AS BIGINT) AS sum_ty,
       CAST(SUM(y*y) AS BIGINT) AS sum_yy
FROM seg GROUP BY 1 ORDER BY 1
"""


def nation_customer_rank_slice(sf_dir: str):
    """PER-GROUP pagination — the 'page 2 of the leaderboard' shape: within
    every nation, the customers ranked 4–6 by lifetime spend (global top-k
    and OFFSET pagination exist; this is the partitioned slice in between).
    Spend partials pre-aggregate per block, one groupby + one 8-partition
    join thread custkey → nation, and the slice itself is a per-group Arrow
    kernel — each group sorts only its own O(customers-per-nation) rows."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"o_custkey": t["o_custkey"], "spend_cents": _cents(t["o_totalprice"])})
        g = tb.group_by("o_custkey").aggregate([("spend_cents", "sum")])
        return g.rename_columns(["o_custkey", "spend_cents"])

    spend = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("spend_cents", alias_name="spend_cents"))
    )
    j = spend.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def add_name(t: pa.Table) -> pa.Table:
        names = pa.array([name_of[k] for k in t["c_nationkey"].to_pylist()], pa.string())
        return pa.table(
            {
                "n_name": names,
                "c_custkey": t["o_custkey"].cast(pa.int64()),
                "spend_cents": t["spend_cents"].cast(pa.int64()),
            }
        )

    def rank_slice(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("spend_cents", "descending"), ("c_custkey", "ascending")]
        )
        take = order.slice(3, 3)  # ranks 4..6
        out = g.take(take)
        return pa.table(
            {
                "n_name": out["n_name"],
                "spend_rank": pa.array(range(4, 4 + out.num_rows), pa.int64()),
                "c_custkey": out["c_custkey"],
                "spend_cents": out["spend_cents"],
            }
        )

    return (
        j.map_batches(add_name, batch_format="pyarrow")
        .groupby("n_name")
        .map_groups(rank_slice, batch_format="pyarrow")
        .sort(["n_name", "spend_rank"])
    )


NATION_CUSTOMER_RANK_SLICE_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS spend_cents
  FROM orders GROUP BY 1),
r AS (
  SELECT n.n_name, c.c_custkey, s.spend_cents,
         ROW_NUMBER() OVER (
             PARTITION BY n.n_name
             ORDER BY s.spend_cents DESC, c.c_custkey) AS spend_rank
  FROM spend s
  JOIN customer c ON c.c_custkey = s.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey)
SELECT n_name, CAST(spend_rank AS BIGINT) AS spend_rank, c_custkey, spend_cents
FROM r WHERE spend_rank BETWEEN 4 AND 6 ORDER BY n_name, spend_rank
"""


def purchase_graph_kcore_peel(sf_dir: str):
    """Bipartite k-CORE peel trace (k=24) on the customer–part co-purchase
    graph: three rounds of simultaneously deleting every node with degree
    < 24 on either side, reporting nodes/edges remaining after each round —
    the standard dense-subgraph prefilter before community detection (k is
    set just below the graph's median degree so the peel cascades without
    emptying).  Distinct edges shrink block-locally behind one 8-partition
    join and materialize NARROW once; each peel round is two
    O(degree-table) groupbys plus a broadcast keep-set filter,
    re-materialized per round (a lazy chain of iterative joins would stack
    shuffle fleets — the stages/hierarchy.py lesson).  Driver holds only
    the O(V) keep sets."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    j = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def distinct_edges(t: pa.Table) -> pa.Table:
        return (
            pa.table({"c": t["o_custkey"], "s": t["l_partkey"]}).group_by(["c", "s"]).aggregate([])
        )

    edges = (
        j.map_batches(distinct_edges, batch_format="pyarrow")
        .groupby(["c", "s"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )

    def side_counts(ds_edges):
        cs = ds_edges.groupby("c").aggregate(Count(alias_name="d")).to_pandas()
        ss = ds_edges.groupby("s").aggregate(Count(alias_name="d")).to_pandas()
        return cs, ss

    rows = []
    cs, ss = side_counts(edges)
    rows.append((0, len(cs), len(ss), edges.count()))
    for rnd in (1, 2, 3):
        keep_c = ray.put(pa.array(cs.loc[cs["d"] >= 24, "c"].to_numpy(dtype=np.int64)))
        keep_s = ray.put(pa.array(ss.loc[ss["d"] >= 24, "s"].to_numpy(dtype=np.int64)))

        def keep(t: pa.Table, kc=keep_c, ks=keep_s) -> pa.Table:
            mc = pc.is_in(t["c"], value_set=ray.get(kc))
            ms = pc.is_in(t["s"], value_set=ray.get(ks))
            return t.filter(pc.and_(mc, ms))

        edges = edges.map_batches(keep, batch_format="pyarrow").materialize()
        cs, ss = side_counts(edges)
        rows.append((rnd, len(cs), len(ss), edges.count()))
    return pa.table(
        {
            "peel_round": pa.array([r[0] for r in rows], pa.int64()),
            "n_customers": pa.array([r[1] for r in rows], pa.int64()),
            "n_parts": pa.array([r[2] for r in rows], pa.int64()),
            "n_edges": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


PURCHASE_GRAPH_KCORE_PEEL_SQL = """
WITH e0 AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS s
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
kc0 AS (SELECT c FROM e0 GROUP BY c HAVING COUNT(*) >= 24),
ks0 AS (SELECT s FROM e0 GROUP BY s HAVING COUNT(*) >= 24),
e1 AS (SELECT e0.c, e0.s FROM e0
       JOIN kc0 ON e0.c = kc0.c JOIN ks0 ON e0.s = ks0.s),
kc1 AS (SELECT c FROM e1 GROUP BY c HAVING COUNT(*) >= 24),
ks1 AS (SELECT s FROM e1 GROUP BY s HAVING COUNT(*) >= 24),
e2 AS (SELECT e1.c, e1.s FROM e1
       JOIN kc1 ON e1.c = kc1.c JOIN ks1 ON e1.s = ks1.s),
kc2 AS (SELECT c FROM e2 GROUP BY c HAVING COUNT(*) >= 24),
ks2 AS (SELECT s FROM e2 GROUP BY s HAVING COUNT(*) >= 24),
e3 AS (SELECT e2.c, e2.s FROM e2
       JOIN kc2 ON e2.c = kc2.c JOIN ks2 ON e2.s = ks2.s)
SELECT CAST(0 AS BIGINT) AS peel_round,
       (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) FROM e0) AS n_customers,
       (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM e0) AS n_parts,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges
UNION ALL SELECT CAST(1 AS BIGINT),
       (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) FROM e1),
       (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM e1),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e1)
UNION ALL SELECT CAST(2 AS BIGINT),
       (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) FROM e2),
       (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM e2),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e2)
UNION ALL SELECT CAST(3 AS BIGINT),
       (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) FROM e3),
       (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM e3),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e3)
ORDER BY 1
"""

def orders_dict_encoding_audit(sf_dir: str):
    """Storage-layout planner — exact dictionary-encoding benefit per orders
    column: raw bytes vs (dict values + bit-packed codes), the number that
    decides which columns get DICT encoding in a columnar rewrite.  ONE scan
    builds per-block (column, value, n) partials; the (column, value)
    groupby is the inherent O(distinct) cost of exact NDV; a second tiny
    groupby folds per-column sums and the 5-row bit-width math runs on the
    driver.  code_bits is the integer bit-length of (NDV-1) — no log floats."""
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    width = {"o_orderkey": 8, "o_custkey": 8, "o_orderdate": 4}
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        outs = []
        for c in cols:
            vals = pc.cast(t[c], pa.string())
            g = pa.table({"val": vals}).group_by("val").aggregate([("val", "count")])
            g = g.rename_columns(["val", "n"])
            outs.append(
                pa.table(
                    {
                        "column_name": pa.array([c] * g.num_rows, pa.string()),
                        "val": g["val"],
                        "n": g["n"].cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    grouped = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["column_name", "val"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def fold(t: pa.Table) -> pa.Table:
        lenv = pc.cast(pc.binary_length(t["val"]), pa.int64())
        tb = pa.table(
            {
                "column_name": t["column_name"],
                "n": t["n"],
                "str_bytes": pc.multiply(lenv, t["n"]),
                "dict_str_bytes": lenv,
            }
        )
        g = tb.group_by("column_name").aggregate(
            [("n", "sum"), ("n", "count"), ("str_bytes", "sum"), ("dict_str_bytes", "sum")]
        )
        return g.rename_columns(
            ["column_name", "n_rows", "n_distinct", "str_bytes", "dict_str_bytes"]
        )

    f = (
        grouped.map_batches(fold, batch_format="pyarrow")
        .groupby("column_name")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_distinct", alias_name="n_distinct"),
            Sum("str_bytes", alias_name="str_bytes"),
            Sum("dict_str_bytes", alias_name="dict_str_bytes"),
        )
        .to_pandas()
        .sort_values("column_name")
    )
    rows = []
    for _, r in f.iterrows():
        c, n, nd = r["column_name"], int(r["n_rows"]), int(r["n_distinct"])
        bits = max(1, (nd - 1).bit_length())
        w = width.get(c)
        raw = w * n if w is not None else int(r["str_bytes"])
        dict_vals = w * nd if w is not None else int(r["dict_str_bytes"])
        rows.append((c, n, nd, bits, raw, dict_vals + (n * bits + 7) // 8))
    return pa.table(
        {
            "column_name": pa.array([r[0] for r in rows], pa.string()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
            "code_bits": pa.array([r[3] for r in rows], pa.int64()),
            "raw_bytes": pa.array([r[4] for r in rows], pa.int64()),
            "dict_bytes": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


ORDERS_DICT_ENCODING_AUDIT_SQL = """
WITH u AS (
  SELECT 'o_orderkey' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
         CAST(8 * COUNT(*) AS BIGINT) AS raw_bytes,
         CAST(8 * COUNT(DISTINCT o_orderkey) AS BIGINT) AS dict_val_bytes
  FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
         CAST(8 * COUNT(*) AS BIGINT),
         CAST(8 * COUNT(DISTINCT o_custkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
         CAST(4 * COUNT(*) AS BIGINT),
         CAST(4 * COUNT(DISTINCT o_orderdate) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
         CAST(SUM(octet_length(encode(o_orderstatus))) AS BIGINT),
         (SELECT CAST(SUM(octet_length(encode(v))) AS BIGINT)
          FROM (SELECT DISTINCT o_orderstatus AS v FROM orders))
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
         CAST(SUM(octet_length(encode(o_orderpriority))) AS BIGINT),
         (SELECT CAST(SUM(octet_length(encode(v))) AS BIGINT)
          FROM (SELECT DISTINCT o_orderpriority AS v FROM orders))
  FROM orders),
b AS (SELECT column_name, n_rows, n_distinct,
             CAST(GREATEST(1, length(ltrim(bin(n_distinct - 1), '0'))) AS BIGINT)
                 AS code_bits,
             raw_bytes, dict_val_bytes
      FROM u)
SELECT column_name, n_rows, n_distinct, code_bits, raw_bytes,
       CAST(dict_val_bytes + (n_rows * code_bits + 7) // 8 AS BIGINT) AS dict_bytes
FROM b ORDER BY column_name
"""


def docs_token_df_cf_census(sf_dir: str):
    """Term DISPERSION census — per token: document frequency, collection
    frequency, and the max within-document count (df ≪ cf flags 'bursty'
    terms that TF-IDF treats very differently from evenly-spread ones; the
    per-token complement to the corpus-level hapax summary).  A document is
    one row, so per-(doc, token) counts are block-local exact; the shuffle
    carries O(block vocab) partial rows and the merge is Sum/Sum/Max."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        tb = pa.table({"doc": parents.filter(keep), "term": flat.filter(keep)})
        per_doc = tb.group_by(["doc", "term"]).aggregate([("term", "count")])
        per_doc = per_doc.rename_columns(["doc", "term", "tf"])
        g = per_doc.group_by("term").aggregate(
            [("tf", "count"), ("tf", "sum"), ("tf", "max")]
        )
        g = g.rename_columns(["term", "df", "cf", "max_tf"])
        return pa.table(
            {
                "term": g["term"],
                "df": g["df"].cast(pa.int64()),
                "cf": g["cf"].cast(pa.int64()),
                "max_tf": g["max_tf"].cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("cf", alias_name="cf"),
            Max("max_tf", alias_name="max_tf"),
        )
        .sort("term")
    )


DOCS_TOKEN_DF_CF_CENSUS_SQL = """
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents),
d AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
       CAST(MAX(tf) AS BIGINT) AS max_tf
FROM d GROUP BY 1 ORDER BY 1
"""


def events_ts_gorilla_dod_census(sf_dir: str):
    """Gorilla-style timestamp compression plan — census of second-grain
    delta-of-delta values over each user's event stream, classified into
    the Gorilla paper's variable-length bit buckets ('zero' / 7 / 9 / 12 /
    32 bits).  The bucket mix IS the compressed size estimate for a
    time-series store.  Integer-exact end to end: µs → s by integer
    division, two np.diff passes per group, counts only.  Per-user streams
    shuffle once (groupby.map_groups) but each group emits ≤5 partial
    rows, so the second fold groupby moves O(users × 5) tiny rows."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])

    def per_user(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        t = g.take(idx)
        sec = pc.divide(t["ts"].cast(pa.int64()), 1_000_000).to_numpy()
        empty = pa.table({"bucket": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        if len(sec) < 3:
            return empty
        dod = np.diff(np.diff(sec))
        zero = dod == 0
        b7 = (dod >= -63) & (dod <= 64) & ~zero
        b9 = (dod >= -255) & (dod <= 256) & ~(zero | b7)
        b12 = (dod >= -2047) & (dod <= 2048) & ~(zero | b7 | b9)
        b32 = ~(zero | b7 | b9 | b12)
        names = ["zero", "bits7", "bits9", "bits12", "bits32"]
        counts = [int(zero.sum()), int(b7.sum()), int(b9.sum()), int(b12.sum()), int(b32.sum())]
        keep = [i for i, c in enumerate(counts) if c > 0]
        if not keep:
            return empty
        return pa.table(
            {
                "bucket": pa.array([names[i] for i in keep], pa.string()),
                "n": pa.array([counts[i] for i in keep], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .sort("bucket")
    )


EVENTS_TS_GORILLA_DOD_CENSUS_SQL = """
WITH s AS (SELECT user_id, ts, event_id,
                  epoch_us(ts) // 1000000 AS sec FROM events),
d1 AS (SELECT user_id, ts, event_id,
              sec - LAG(sec) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS d
       FROM s),
d2 AS (SELECT d - LAG(d) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS dod
       FROM d1 WHERE d IS NOT NULL),
b AS (SELECT CASE WHEN dod = 0 THEN 'zero'
                  WHEN dod BETWEEN -63 AND 64 THEN 'bits7'
                  WHEN dod BETWEEN -255 AND 256 THEN 'bits9'
                  WHEN dod BETWEEN -2047 AND 2048 THEN 'bits12'
                  ELSE 'bits32' END AS bucket
      FROM d2 WHERE dod IS NOT NULL)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1 ORDER BY 1
"""


def lineitem_qty_price_mi_census(sf_dir: str):
    """Pointwise MUTUAL-INFORMATION census between quantity decades and
    $10k price bands — the feature-selection table behind 'does quantity
    predict price bracket'.  All counts are exact integers from ONE scan of
    block-local partials + a tiny (bins × bands) groupby; the pMI term is
    computed per CELL in one fixed IEEE expression from four integers
    (never a float aggregate), so parity with the oracle is bit-exact.
    Driver holds only the O(bins × bands) contingency table."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        qb = pc.divide(_cents(t["l_quantity"]), 1000)
        pb = pc.divide(_cents(t["l_extendedprice"]), 1_000_000)
        g = pa.table({"qty_bin": qb, "price_band": pb}).group_by(
            ["qty_bin", "price_band"]
        ).aggregate([("qty_bin", "count")])
        g = g.rename_columns(["qty_bin", "price_band", "n"])
        return pa.table(
            {"qty_bin": g["qty_bin"], "price_band": g["price_band"], "n": g["n"].cast(pa.int64())}
        )

    cells = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["qty_bin", "price_band"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    cells = cells.sort_values(["qty_bin", "price_band"]).reset_index(drop=True)
    n_qty = cells.groupby("qty_bin")["n"].transform("sum").to_numpy(dtype=np.int64)
    n_price = cells.groupby("price_band")["n"].transform("sum").to_numpy(dtype=np.int64)
    big_n = float(int(cells["n"].sum()))
    nf = cells["n"].to_numpy(dtype=np.float64)
    # scalar math.log = platform libm = DuckDB's LN; numpy's SIMD log can
    # differ by 1 ulp (measured) — the table is O(bins × bands), so scalar
    # is free
    import math

    ratio = (nf * big_n) / (n_qty.astype(np.float64) * n_price.astype(np.float64))
    mi_term = (nf / big_n) * np.array([math.log(x) for x in ratio], dtype=np.float64)
    return pa.table(
        {
            "qty_bin": pa.array(cells["qty_bin"].to_numpy(dtype=np.int64), pa.int64()),
            "price_band": pa.array(cells["price_band"].to_numpy(dtype=np.int64), pa.int64()),
            "n": pa.array(cells["n"].to_numpy(dtype=np.int64), pa.int64()),
            "n_qty": pa.array(n_qty, pa.int64()),
            "n_price": pa.array(n_price, pa.int64()),
            "mi_term": pa.array(mi_term, pa.float64()),
        }
    )


LINEITEM_QTY_PRICE_MI_CENSUS_SQL = """
WITH base AS (
  SELECT CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) // 1000 AS qty_bin,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) // 1000000
             AS price_band
  FROM lineitem),
c AS (SELECT qty_bin, price_band, CAST(COUNT(*) AS BIGINT) AS n
      FROM base GROUP BY 1, 2),
m AS (SELECT qty_bin, price_band, n,
             CAST(SUM(n) OVER (PARTITION BY qty_bin) AS BIGINT) AS n_qty,
             CAST(SUM(n) OVER (PARTITION BY price_band) AS BIGINT) AS n_price,
             CAST((SELECT SUM(n) FROM c) AS BIGINT) AS big_n
      FROM c)
SELECT qty_bin, price_band, n, n_qty, n_price,
       (CAST(n AS DOUBLE) / big_n)
           * LN((CAST(n AS DOUBLE) * big_n)
                / (CAST(n_qty AS DOUBLE) * n_price)) AS mi_term
FROM m ORDER BY qty_bin, price_band
"""


def orders_status_bitmap_container_census(sf_dir: str):
    """Roaring-style BITMAP-INDEX cost plan for o_orderstatus: the orderkey
    space is chunked (4096 keys per container, the spec's 2^16 scaled to
    the test keyspace), each (status, chunk) posting set picks the cheaper
    container (sorted-array ≤256 entries at 2 B/entry, else a fixed 512 B
    bitmap), and the per-status rollup is the index's exact byte cost —
    the number a query planner compares against a dict-encoded scan.  Two
    shuffles of tiny aggregates only; block partials shrink the first."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        chunk = pc.divide(t["o_orderkey"], 4096)
        g = pa.table({"o_orderstatus": t["o_orderstatus"], "chunk": chunk}).group_by(
            ["o_orderstatus", "chunk"]
        ).aggregate([("chunk", "count")])
        g = g.rename_columns(["o_orderstatus", "chunk", "n"])
        return pa.table(
            {"o_orderstatus": g["o_orderstatus"], "chunk": g["chunk"], "n": g["n"].cast(pa.int64())}
        )

    containers = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "chunk"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def cost(t: pa.Table) -> pa.Table:
        n = t["n"]
        is_array = pc.less_equal(n, 256)
        arr_flag = pc.cast(is_array, pa.int64())
        bytes_ = pc.if_else(is_array, pc.multiply(n, 2), pa.scalar(512, pa.int64()))
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "n": n,
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64), pa.int64()),
                "is_array": arr_flag,
                "bytes": bytes_,
            }
        )

    out = (
        containers.map_batches(cost, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(
            Sum("n", alias_name="n_rows"),
            Sum("one", alias_name="n_containers"),
            Sum("is_array", alias_name="n_array"),
            Sum("bytes", alias_name="total_bytes"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "n_rows": t["n_rows"].cast(pa.int64()),
                "n_containers": t["n_containers"].cast(pa.int64()),
                "n_array": t["n_array"].cast(pa.int64()),
                "n_bitmap": pc.subtract(
                    t["n_containers"].cast(pa.int64()), t["n_array"].cast(pa.int64())
                ),
                "total_bytes": t["total_bytes"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("o_orderstatus")


ORDERS_STATUS_BITMAP_CONTAINER_CENSUS_SQL = """
WITH c AS (SELECT o_orderstatus, o_orderkey // 4096 AS chunk,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1, 2),
b AS (SELECT o_orderstatus, n,
             CASE WHEN n <= 256 THEN 1 ELSE 0 END AS is_array,
             CASE WHEN n <= 256 THEN 2 * n ELSE 512 END AS bytes
      FROM c)
SELECT o_orderstatus, CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_containers,
       CAST(SUM(is_array) AS BIGINT) AS n_array,
       CAST(SUM(1 - is_array) AS BIGINT) AS n_bitmap,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes
FROM b GROUP BY 1 ORDER BY 1
"""


def docs_yule_k_by_lang(sf_dir: str):
    """Yule's K vocabulary-richness characteristic per language — the
    classic repeat-rate statistic K = 10^4·(Σ m²·V_m − N)/N², where V_m is
    the number of types occurring exactly m times.  All three moments are
    exact int64 (block token-count partials → global (lang, term) counts →
    frequency-of-frequencies), and K itself is ONE fixed IEEE expression
    per lang, so the float column is bit-identical to the oracle.  The
    shuffles carry only vocab-sized aggregates, never text."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        langs = t["lang"].take(parents)
        keep = pc.not_equal(flat, "")
        tb = pa.table({"lang": langs.filter(keep), "term": flat.filter(keep)})
        g = tb.group_by(["lang", "term"]).aggregate([("term", "count")])
        g = g.rename_columns(["lang", "term", "m"])
        return pa.table({"lang": g["lang"], "term": g["term"], "m": g["m"].cast(pa.int64())})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("m", alias_name="m"))
    )

    def freq_of_freq(t: pa.Table) -> pa.Table:
        g = pa.table({"lang": t["lang"], "m": t["m"]}).group_by(["lang", "m"]).aggregate(
            [("m", "count")]
        )
        g = g.rename_columns(["lang", "m", "v"])
        m = g["m"].cast(pa.int64())
        v = g["v"].cast(pa.int64())
        return pa.table(
            {
                "lang": g["lang"],
                "n_tokens": pc.multiply(m, v),
                "n_types": v,
                "sum_m2_vm": pc.multiply(pc.multiply(m, m), v),
            }
        )

    folded = (
        counts.map_batches(freq_of_freq, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_types", alias_name="n_types"),
            Sum("sum_m2_vm", alias_name="sum_m2_vm"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].cast(pa.int64()).to_numpy().astype(np.float64)
        s = t["sum_m2_vm"].cast(pa.int64()).to_numpy().astype(np.float64)
        k = 1e4 * (s - n) / (n * n)
        return pa.table(
            {
                "lang": t["lang"],
                "n_tokens": t["n_tokens"].cast(pa.int64()),
                "n_types": t["n_types"].cast(pa.int64()),
                "sum_m2_vm": t["sum_m2_vm"].cast(pa.int64()),
                "yule_k": pa.array(k, pa.float64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort("lang")


DOCS_YULE_K_BY_LANG_SQL = """
WITH t AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents),
tc AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS m FROM t GROUP BY 1, 2),
vm AS (SELECT lang, m, CAST(COUNT(*) AS BIGINT) AS v FROM tc GROUP BY 1, 2),
s AS (SELECT lang, CAST(SUM(m * v) AS BIGINT) AS n_tokens,
             CAST(SUM(v) AS BIGINT) AS n_types,
             CAST(SUM(m * m * v) AS BIGINT) AS sum_m2_vm
      FROM vm GROUP BY 1)
SELECT lang, n_tokens, n_types, sum_m2_vm,
       1e4 * (CAST(sum_m2_vm AS DOUBLE) - n_tokens)
           / (CAST(n_tokens AS DOUBLE) * n_tokens) AS yule_k
FROM s ORDER BY lang
"""


def orders_rowgroup_zonemap_audit(sf_dir: str):
    """Zone-map (min/max) PRUNING audit — the Parquet-row-group planner
    question: with orders laid out in insertion (orderkey) order in
    256-row groups, which groups can a $100k–$150k price predicate skip
    without reading?  Global row numbers come from
    stages/rank.py:global_value_rank (value-range buckets, no full sort);
    per-group min/max/count fold from block partials, and the prunable
    flag is pure integer compare.  Driver holds only O(row groups)."""
    from ...stages.rank import global_value_rank

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "cents": _cents(t["o_totalprice"])}
        )

    ranked = global_value_rank(
        ds.map_batches(pre, batch_format="pyarrow"),
        value_col="o_orderkey",
        id_col="o_orderkey",
        out_col="rnk",
    )

    def partial(t: pa.Table) -> pa.Table:
        rg = pc.divide(pc.subtract(t["rnk"], 1), 256)
        g = pa.table({"rg": rg, "cents": t["cents"]}).group_by("rg").aggregate(
            [("cents", "min"), ("cents", "max"), ("cents", "count")]
        )
        g = g.rename_columns(["rg", "min_cents", "max_cents", "n_rows"])
        return pa.table(
            {
                "rg": g["rg"],
                "min_cents": g["min_cents"].cast(pa.int64()),
                "max_cents": g["max_cents"].cast(pa.int64()),
                "n_rows": g["n_rows"].cast(pa.int64()),
            }
        )

    folded = (
        ranked.map_batches(partial, batch_format="pyarrow")
        .groupby("rg")
        .aggregate(
            Min("min_cents", alias_name="min_cents"),
            Max("max_cents", alias_name="max_cents"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )

    LO, HI = 10_000_000, 15_000_000  # $100k ≤ price < $150k, in cents

    def finish(t: pa.Table) -> pa.Table:
        prunable = pc.or_(
            pc.less(t["max_cents"], LO), pc.greater_equal(t["min_cents"], HI)
        )
        return pa.table(
            {
                "rg": t["rg"].cast(pa.int64()),
                "n_rows": t["n_rows"].cast(pa.int64()),
                "min_cents": t["min_cents"],
                "max_cents": t["max_cents"],
                "prunable": pc.cast(prunable, pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort("rg")


ORDERS_ROWGROUP_ZONEMAP_AUDIT_SQL = """
WITH r AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 256 AS rg
  FROM orders),
g AS (SELECT rg, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(cents) AS BIGINT) AS min_cents,
             CAST(MAX(cents) AS BIGINT) AS max_cents
      FROM r GROUP BY 1)
SELECT CAST(rg AS BIGINT) AS rg, n_rows, min_cents, max_cents,
       CAST(CASE WHEN max_cents < 10000000 OR min_cents >= 15000000
                 THEN 1 ELSE 0 END AS BIGINT) AS prunable
FROM g ORDER BY rg
"""


def orders_iso_week_year_mismatch_census(sf_dir: str):
    """Calendar-dimension correctness audit: ISO week-numbering year vs
    calendar year per order date.  The (cal_year ≠ iso_year) rows are the
    early-January / late-December dates every weekly-reporting pipeline
    silently misfiles when it groups by year(date) but labels by ISO week.
    Pure integer census — pc.year / pc.iso_year per block, one tiny
    groupby."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        y = pc.year(t["o_orderdate"])
        iy = pc.iso_year(t["o_orderdate"])
        g = pa.table(
            {"cal_year": y.cast(pa.int64()), "iso_year": iy.cast(pa.int64())}
        ).group_by(["cal_year", "iso_year"]).aggregate([("cal_year", "count")])
        g = g.rename_columns(["cal_year", "iso_year", "n"])
        return pa.table(
            {"cal_year": g["cal_year"], "iso_year": g["iso_year"], "n": g["n"].cast(pa.int64())}
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cal_year", "iso_year"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cal_year": t["cal_year"],
                "iso_year": t["iso_year"],
                "n": t["n"].cast(pa.int64()),
                "mismatch": pc.cast(
                    pc.not_equal(t["cal_year"], t["iso_year"]), pa.int64()
                ),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort(
        ["cal_year", "iso_year"]
    )


ORDERS_ISO_WEEK_YEAR_MISMATCH_CENSUS_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS cal_year,
       CAST(isoyear(o_orderdate) AS BIGINT) AS iso_year,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CASE WHEN year(o_orderdate) <> isoyear(o_orderdate)
                 THEN 1 ELSE 0 END AS BIGINT) AS mismatch
FROM orders GROUP BY 1, 2, 4 ORDER BY 1, 2
"""


def events_type_recurrence_median(sf_dir: str):
    """Per-TYPE recurrence time — median gap between consecutive
    occurrences of the SAME event type within a user's stream (the 'how
    often does a user come back and do X again' number; distinct from the
    all-events inter-arrival median).  Stage 1 co-partitions by user and
    emits (type, gap_µs) rows from one lexsort per group; stage 2
    co-partitions the gap rows by type and picks the exact
    quantile_disc(0.5) element.  Gaps are int64 µs throughout."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"])

    def per_user(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        typ = np.asarray(g["event_type"].combine_chunks().to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts, typ))  # group by type, time order within
        typ_s, ts_s = typ[order], ts[order]
        if len(ts_s) < 2:
            return pa.table(
                {"event_type": pa.array([], pa.string()), "gap_us": pa.array([], pa.int64())}
            )
        same = typ_s[1:] == typ_s[:-1]
        gaps = np.diff(ts_s)[same]
        return pa.table(
            {
                "event_type": pa.array(typ_s[1:][same], pa.string()),
                "gap_us": pa.array(gaps, pa.int64()),
            }
        )

    gaps = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")

    def per_type(g: pa.Table) -> pa.Table:
        v = np.sort(g["gap_us"].combine_chunks().to_numpy(zero_copy_only=False))
        m = v[int(np.ceil(0.5 * len(v))) - 1]
        return pa.table(
            {
                "event_type": g["event_type"].slice(0, 1),
                "n_gaps": pa.array([len(v)], pa.int64()),
                "median_gap_us": pa.array([int(m)], pa.int64()),
            }
        )

    return (
        gaps.groupby("event_type").map_groups(per_type, batch_format="pyarrow").sort("event_type")
    )


EVENTS_TYPE_RECURRENCE_MEDIAN_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(epoch_us(ts)
              - epoch_us(LAG(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id)) AS BIGINT)
             AS gap_us
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(quantile_disc(gap_us, 0.5) AS BIGINT) AS median_gap_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def docs_tar_roundtrip_census(sf_dir: str):
    """Archive-container ingest path: each block of documents is serialized
    into a REAL ustar archive (functions/tar.py — octal fields, checksum,
    512-byte framing; stdlib-tarfile-interoperable) and immediately parsed
    back by our own header-walking parser, proving the container format
    end-to-end in-pipeline.  The census reports per-member byte size and
    occupied data blocks; the oracle reconstructs both from octet_length,
    so any framing bug (padding, octal width, checksum) hash-mismatches.
    Archives are built per block — the pattern for reading tar shards of
    a web crawl where members never cross block boundaries."""
    from ...functions.tar import build_tar, parse_tar

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def roundtrip(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        buf = build_tar(
            [(f"doc_{i:012d}.txt", s.encode("utf-8")) for i, s in zip(ids, texts)]
        )
        members = parse_tar(buf)
        if len(members) != len(ids):
            raise ValueError("tar roundtrip lost members")
        out_ids, sizes, blocks = [], [], []
        for name, payload in members:
            out_ids.append(int(name[4:16]))
            sizes.append(len(payload))
            blocks.append((len(payload) + 511) // 512)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "member_bytes": pa.array(sizes, pa.int64()),
                "data_blocks": pa.array(blocks, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow").sort("doc_id")


DOCS_TAR_ROUNDTRIP_CENSUS_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS member_bytes,
       CAST((octet_length(encode(text)) + 511) // 512 AS BIGINT) AS data_blocks
FROM documents ORDER BY doc_id
"""


def customer_acctbal_grubbs_by_nation(sf_dir: str):
    """Grubbs' outlier statistic per nation over customer balances — the
    classic single-outlier test, made shuffle-exact by the INTEGER argmax
    trick: max|x − mean| = max|n·x − Σx| / n, so the deviation argmax is
    found in pure int64 cents (no float compare anywhere), and G itself is
    one fixed IEEE tree from four integer sufficient statistics.  Two
    passes: (n, Σx, Σx²) fold from block partials; the tiny per-nation
    stats broadcast back for the deviation max.  Nations with n < 3 drop
    (G undefined), matching the SQL HAVING."""
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_nationkey", "c_acctbal"])
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def stats_partial(t: pa.Table) -> pa.Table:
        c = _cents(t["c_acctbal"])
        tb = pa.table(
            {
                "k": t["c_nationkey"].cast(pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "sx": c,
                "sxx": pc.multiply(c, c),
            }
        )
        g = tb.group_by("k").aggregate([("one", "sum"), ("sx", "sum"), ("sxx", "sum")])
        return g.rename_columns(["k", "n", "sx", "sxx"])

    stats = (
        cust.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"), Sum("sxx", alias_name="sxx")
        )
        .to_pandas()
    )
    stats = stats[stats["n"] >= 3].reset_index(drop=True)
    n_of = dict(zip(stats["k"], stats["n"]))
    sx_of = dict(zip(stats["k"], stats["sx"]))
    n_ref = ray.put((n_of, sx_of))

    def dev_partial(t: pa.Table) -> pa.Table:
        n_map, sx_map = ray.get(n_ref)
        k = t["c_nationkey"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = _cents(t["c_acctbal"]).to_numpy()
        keep = np.isin(k, list(n_map))
        k, c = k[keep], c[keep]
        nn = np.array([n_map[x] for x in k], dtype=np.int64)
        sx = np.array([sx_map[x] for x in k], dtype=np.int64)
        dev = np.abs(nn * c - sx)
        g = pa.table({"k": pa.array(k), "dev": pa.array(dev)}).group_by("k").aggregate(
            [("dev", "max")]
        )
        return g.rename_columns(["k", "max_dev_scaled"])

    devs = (
        cust.map_batches(dev_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Max("max_dev_scaled", alias_name="max_dev_scaled"))
        .to_pandas()
    )
    merged = stats.merge(devs, on="k")
    n = merged["n"].to_numpy(dtype=np.float64)
    num = (
        merged["n"].to_numpy(dtype=np.int64) * merged["sxx"].to_numpy(dtype=np.int64)
        - merged["sx"].to_numpy(dtype=np.int64) * merged["sx"].to_numpy(dtype=np.int64)
    ).astype(np.float64)
    den = (merged["n"].to_numpy(dtype=np.int64) * (merged["n"].to_numpy(dtype=np.int64) - 1)).astype(
        np.float64
    )
    g_stat = merged["max_dev_scaled"].to_numpy(dtype=np.float64) / n / np.sqrt(num / den)
    out = pa.table(
        {
            "n_name": pa.array([name_of[k] for k in merged["k"]], pa.string()),
            "n": pa.array(merged["n"].to_numpy(dtype=np.int64), pa.int64()),
            "max_dev_scaled": pa.array(
                merged["max_dev_scaled"].to_numpy(dtype=np.int64), pa.int64()
            ),
            "grubbs_g": pa.array(g_stat, pa.float64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("n_name", "ascending")]))


CUSTOMER_ACCTBAL_GRUBBS_BY_NATION_SQL = """
WITH c AS (SELECT c_nationkey,
                  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
           FROM customer),
s AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sx,
             CAST(SUM(cents * cents) AS BIGINT) AS sxx
      FROM c GROUP BY 1 HAVING COUNT(*) >= 3),
d AS (SELECT c.c_nationkey,
             CAST(MAX(abs(s.n * c.cents - s.sx)) AS BIGINT) AS max_dev_scaled
      FROM c JOIN s ON c.c_nationkey = s.c_nationkey GROUP BY 1)
SELECT n.n_name, s.n, d.max_dev_scaled,
       CAST(d.max_dev_scaled AS DOUBLE) / s.n
           / SQRT(CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE)
                  / CAST(s.n * (s.n - 1) AS DOUBLE)) AS grubbs_g
FROM s JOIN d ON s.c_nationkey = d.c_nationkey
JOIN nation n ON n.n_nationkey = s.c_nationkey
ORDER BY n.n_name
"""


def customer_priority_mix_cosine(sf_dir: str):
    """Per-customer order-priority MIX similarity to the global profile —
    cosine between the customer's 5-bucket priority count vector and the
    corpus-wide vector.  The 5 priorities are a FIXED dimension, so the
    dot product is written as an explicit 5-term integer sum (identical
    order both engines) and the only float ops are two sqrt's and one
    divide — bit-exact parity.  Block-local pivot partials make the
    shuffle one row per (block, customer); the global vector folds from
    the same table."""
    PRIS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"])

    def pivot_partial(t: pa.Table) -> pa.Table:
        cols = {"c_custkey": t["o_custkey"]}
        for i, p in enumerate(PRIS):
            cols[f"a{i + 1}"] = pc.cast(pc.equal(t["o_orderpriority"], p), pa.int64())
        g = pa.table(cols).group_by("c_custkey").aggregate(
            [(f"a{i + 1}", "sum") for i in range(5)]
        )
        return g.rename_columns(["c_custkey"] + [f"a{i + 1}" for i in range(5)])

    per_cust = (
        ds.map_batches(pivot_partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(*[Sum(f"a{i + 1}", alias_name=f"a{i + 1}") for i in range(5)])
    )
    totals = per_cust.aggregate(*[Sum(f"a{i + 1}", alias_name=f"g{i + 1}") for i in range(5)])
    g_vec = np.array([int(totals[f"g{i + 1}"]) for i in range(5)], dtype=np.int64)
    sbb = int((g_vec * g_vec).sum())
    g_ref = ray.put(g_vec)

    def finish(t: pa.Table) -> pa.Table:
        gv = ray.get(g_ref)
        a = np.stack(
            [t[f"a{i + 1}"].cast(pa.int64()).to_numpy(zero_copy_only=False) for i in range(5)],
            axis=1,
        )
        sab = (a * gv).sum(axis=1)
        saa = (a * a).sum(axis=1)
        n_orders = a.sum(axis=1)
        cos = sab.astype(np.float64) / (
            np.sqrt(saa.astype(np.float64)) * np.sqrt(np.float64(sbb))
        )
        return pa.table(
            {
                "c_custkey": t["c_custkey"].cast(pa.int64()),
                "n_orders": pa.array(n_orders, pa.int64()),
                "cos_mix": pa.array(cos, pa.float64()),
            }
        )

    return per_cust.map_batches(finish, batch_format="pyarrow").sort("c_custkey")


CUSTOMER_PRIORITY_MIX_COSINE_SQL = """
WITH a AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS a1,
         CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
              AS BIGINT) AS a2,
         CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)
              AS BIGINT) AS a3,
         CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0
              END) AS BIGINT) AS a4,
         CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
              AS BIGINT) AS a5
  FROM orders GROUP BY 1),
g AS (SELECT CAST(SUM(a1) AS BIGINT) AS g1, CAST(SUM(a2) AS BIGINT) AS g2,
             CAST(SUM(a3) AS BIGINT) AS g3, CAST(SUM(a4) AS BIGINT) AS g4,
             CAST(SUM(a5) AS BIGINT) AS g5
      FROM a)
SELECT a.c_custkey,
       CAST(a1 + a2 + a3 + a4 + a5 AS BIGINT) AS n_orders,
       CAST(a1 * g1 + a2 * g2 + a3 * g3 + a4 * g4 + a5 * g5 AS DOUBLE)
           / (SQRT(CAST(a1 * a1 + a2 * a2 + a3 * a3 + a4 * a4 + a5 * a5
                        AS DOUBLE))
              * SQRT(CAST(g1 * g1 + g2 * g2 + g3 * g3 + g4 * g4 + g5 * g5
                          AS DOUBLE))) AS cos_mix
FROM a, g ORDER BY a.c_custkey
"""


def part_copurchase_jaccard_topk(sf_dir: str):
    """Co-purchase SIMILARITY (not just co-count): Jaccard of the two
    parts' order sets, J = co / (d_a + d_b − co), for every part pair
    sharing an order — normalizing away popularity, which raw co-counts
    can't.  J is integer ppm (co·10⁶ // union), so the top-20 boundary is
    a total integer order.  Pairs expand per order group (bounded by
    order width²), counts fold from partials, and the O(parts) degree map
    broadcasts once — the big side never reshuffles for the degree join."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def distinct_edges(t: pa.Table) -> pa.Table:
        return (
            pa.table({"o": t["l_orderkey"], "p": t["l_partkey"]})
            .group_by(["o", "p"])
            .aggregate([])
        )

    edges = (
        li.map_batches(distinct_edges, batch_format="pyarrow")
        .groupby(["o", "p"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )
    degrees = edges.groupby("p").aggregate(Count(alias_name="d")).to_pandas()
    deg_of = dict(zip(degrees["p"], degrees["d"]))
    deg_ref = ray.put(deg_of)

    def pairs(g: pa.Table) -> pa.Table:
        p = np.sort(g["p"].combine_chunks().to_numpy(zero_copy_only=False))
        if len(p) < 2:
            return pa.table({"p_a": pa.array([], pa.int64()), "p_b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(p), k=1)
        return pa.table({"p_a": pa.array(p[ia], pa.int64()), "p_b": pa.array(p[ib], pa.int64())})

    def pair_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_a", "p_b"]).aggregate([("p_a", "count")])
        g = g.rename_columns(["p_a", "p_b", "co"])
        return pa.table({"p_a": g["p_a"], "p_b": g["p_b"], "co": g["co"].cast(pa.int64())})

    co = (
        edges.groupby("o")
        .map_groups(pairs, batch_format="pyarrow")
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["p_a", "p_b"])
        .aggregate(Sum("co", alias_name="co"))
    )

    def score(t: pa.Table) -> pa.Table:
        d = ray.get(deg_ref)
        pa_ = t["p_a"].to_numpy(zero_copy_only=False)
        pb_ = t["p_b"].to_numpy(zero_copy_only=False)
        cov = t["co"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        da = np.array([d[x] for x in pa_], dtype=np.int64)
        db = np.array([d[x] for x in pb_], dtype=np.int64)
        jac = cov * 1_000_000 // (da + db - cov)
        return pa.table(
            {
                "p_a": t["p_a"].cast(pa.int64()),
                "p_b": t["p_b"].cast(pa.int64()),
                "co": pa.array(cov, pa.int64()),
                "d_a": pa.array(da, pa.int64()),
                "d_b": pa.array(db, pa.int64()),
                "jaccard_ppm": pa.array(jac, pa.int64()),
            }
        )

    return (
        co.map_batches(score, batch_format="pyarrow")
        .sort(["jaccard_ppm", "p_a", "p_b"], descending=[True, False, False])
        .limit(20)
    )


PART_COPURCHASE_JACCARD_TOPK_SQL = """
WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
d AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS dp FROM e GROUP BY 1),
pr AS (SELECT a.p AS p_a, b.p AS p_b, CAST(COUNT(*) AS BIGINT) AS co
       FROM e a JOIN e b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)
SELECT pr.p_a, pr.p_b, pr.co, da.dp AS d_a, db.dp AS d_b,
       CAST(pr.co * 1000000 // (da.dp + db.dp - pr.co) AS BIGINT)
           AS jaccard_ppm
FROM pr JOIN d da ON pr.p_a = da.p JOIN d db ON pr.p_b = db.p
ORDER BY jaccard_ppm DESC, pr.p_a, pr.p_b LIMIT 20
"""


def orders_join_ivm_delta(sf_dir: str):
    """JOIN-delta incremental view maintenance: a standing
    lineitem⋈orders revenue-by-priority view is advanced by a DELTA batch
    of orders (the final year) WITHOUT re-joining the base — base runs
    the normal partitioned join on the < cutoff predicate-pushdown read,
    while the delta join is a broadcast probe (Δorders is small by
    construction — that asymmetry is the whole point of ΔA⋈B
    maintenance).  Output exposes base / delta / total per priority, so
    the oracle checks the decomposition itself, not just the end state."""
    CUTOFF = "2001-01-01"
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice"])

    def base_orders():
        import pyarrow.dataset as pads

        return rd.read_parquet(
            _t(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
            filter=pads.field("o_orderdate") < pa.scalar(np.datetime64(CUTOFF, "us")),
        )

    def delta_orders():
        import pyarrow.dataset as pads

        return rd.read_parquet(
            _t(sf_dir, "orders"),
            columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
            filter=pads.field("o_orderdate") >= pa.scalar(np.datetime64(CUTOFF, "us")),
        )

    def li_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"l_orderkey": t["l_orderkey"], "cents": _cents(t["l_extendedprice"])}
        ).group_by("l_orderkey").aggregate([("cents", "sum")])
        return g.rename_columns(["l_orderkey", "cents"])

    li_by_order = li.map_batches(li_partial, batch_format="pyarrow")

    # base: partitioned join (the standing view's original build)
    base = li_by_order.join(
        base_orders(), join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def agg_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"o_orderpriority": t["o_orderpriority"], "cents": t["cents"]}
        ).group_by("o_orderpriority").aggregate([("cents", "sum")])
        return g.rename_columns(["o_orderpriority", "cents"])

    base_agg = {
        r["o_orderpriority"]: int(r["cents"])
        for r in base.map_batches(agg_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()
    }

    # delta: broadcast probe — Δorders is one year, small by construction
    delta = delta_orders().to_pandas()
    delta_keys = delta["o_orderkey"].to_numpy(dtype=np.int64)
    pri_of = dict(zip(delta["o_orderkey"], delta["o_orderpriority"]))
    pri_ref = ray.put((delta_keys, pri_of))

    def delta_partial(t: pa.Table) -> pa.Table:
        dk, m = ray.get(pri_ref)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        mask = np.isin(keys, dk)
        pris = [m[k] for k in keys[mask]]
        g = pa.table(
            {"o_orderpriority": pa.array(pris, pa.string()), "cents": pa.array(cents[mask])}
        ).group_by("o_orderpriority").aggregate([("cents", "sum")])
        return g.rename_columns(["o_orderpriority", "cents"])

    delta_agg = {
        r["o_orderpriority"]: int(r["cents"])
        for r in li_by_order.map_batches(delta_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()
    }

    pris = sorted(set(base_agg) | set(delta_agg))
    b = [base_agg.get(p, 0) for p in pris]
    d = [delta_agg.get(p, 0) for p in pris]
    return pa.table(
        {
            "o_orderpriority": pa.array(pris, pa.string()),
            "base_cents": pa.array(b, pa.int64()),
            "delta_cents": pa.array(d, pa.int64()),
            "total_cents": pa.array([x + y for x, y in zip(b, d)], pa.int64()),
        }
    )


ORDERS_JOIN_IVM_DELTA_SQL = """
WITH j AS (
  SELECT o.o_orderpriority, o.o_orderdate,
         CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderdate < DATE '2001-01-01' THEN cents ELSE 0
                END) AS BIGINT) AS base_cents,
       CAST(SUM(CASE WHEN o_orderdate >= DATE '2001-01-01' THEN cents ELSE 0
                END) AS BIGINT) AS delta_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM j GROUP BY 1 ORDER BY 1
"""


def media_bmp_pixelsum_oracle(sf_dir: str):
    """First VALUE-ORACLE-checked image-codec op: a deterministic 16×16
    grayscale gradient is synthesized per doc_id (pixel = (13·id + 31x +
    7y) mod 256), pushed through the REAL BMP encoder AND decoder
    (functions/bmp.py — file header, BITMAPINFOHEADER, bottom-up padded
    BGR scanlines), and the decoded channel sum is compared against the
    closed-form SQL reconstruction — so any byte-order / padding / stride
    bug in the codec hash-mismatches instead of hiding behind a rows-only
    check.  Per-row encode/decode loop is inherent to media payloads
    (multimodal.py precedent); the batch stays vectorized around it."""
    from ...functions.bmp import decode_bmp, encode_bmp

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    x = np.arange(16, dtype=np.int64)[None, :]
    y = np.arange(16, dtype=np.int64)[:, None]

    def work(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sums = np.empty(len(ids), dtype=np.int64)
        for j, i in enumerate(ids):
            v = ((13 * int(i) + 31 * x + 7 * y) % 256).astype(np.uint8)
            img = np.stack([v, v, v], axis=2)
            back = decode_bmp(encode_bmp(img))
            if back.shape != (16, 16, 3) or not np.array_equal(back[:, :, 0], v):
                raise ValueError("BMP round-trip mismatch")
            sums[j] = int(back[:, :, 0].astype(np.int64).sum())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_pixels": pa.array(np.full(len(ids), 256, dtype=np.int64)),
                "pixel_sum": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(work, batch_format="pyarrow").sort("doc_id")


MEDIA_BMP_PIXELSUM_ORACLE_SQL = """
WITH xs AS (SELECT unnest(range(0, 16)) AS x),
ys AS (SELECT unnest(range(0, 16)) AS y),
px AS (SELECT d.doc_id, (13 * d.doc_id + 31 * xs.x + 7 * ys.y) % 256 AS v
       FROM documents d, xs, ys)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pixels,
       CAST(SUM(v) AS BIGINT) AS pixel_sum
FROM px GROUP BY 1 ORDER BY 1
"""


def docs_cdc_chunk_census(sf_dir: str):
    """Content-defined chunking (CDC) census — the rolling-hash boundary
    rule behind dedup-friendly storage (LBFS/restic style): a 4-byte
    window hash h = a₀ + 3a₁ + 9a₂ + 27a₃ cuts where h ≡ 15 (mod 16), so
    chunk boundaries survive insertions (unlike fixed-size chunks, whose
    boundaries all shift).  Census per doc: chars, cuts, chunks.  The
    hash is a vectorized 4-term numpy stencil per doc; the oracle
    recomputes it positionally via the lockstep unnest(range) idiom —
    byte-exact because the corpus is ASCII."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def census(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        n_chars = np.empty(len(ids), dtype=np.int64)
        n_cuts = np.empty(len(ids), dtype=np.int64)
        for j, s in enumerate(texts):
            a = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(np.int64)
            n_chars[j] = len(a)
            if len(a) < 4:
                n_cuts[j] = 0
                continue
            h = a[:-3] + 3 * a[1:-2] + 9 * a[2:-1] + 27 * a[3:]
            n_cuts[j] = int((h % 16 == 15).sum())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_cuts": pa.array(n_cuts, pa.int64()),
                "n_chunks": pa.array(n_cuts + 1, pa.int64()),
            }
        )

    return ds.map_batches(census, batch_format="pyarrow").sort("doc_id")


DOCS_CDC_CHUNK_CENSUS_SQL = """
WITH pos AS (
  SELECT doc_id, unnest(range(1, length(text) - 2)) AS i, text
  FROM documents),
h AS (SELECT doc_id,
             (ascii(substr(text, CAST(i AS INT), 1))
              + 3 * ascii(substr(text, CAST(i AS INT) + 1, 1))
              + 9 * ascii(substr(text, CAST(i AS INT) + 2, 1))
              + 27 * ascii(substr(text, CAST(i AS INT) + 3, 1))) % 16 AS hv
      FROM pos),
c AS (SELECT doc_id,
             CAST(SUM(CASE WHEN hv = 15 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cuts
      FROM h GROUP BY 1)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(COALESCE(c.n_cuts, 0) AS BIGINT) AS n_cuts,
       CAST(COALESCE(c.n_cuts, 0) + 1 AS BIGINT) AS n_chunks
FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
ORDER BY d.doc_id
"""


def supplier_region_coverage_census(sf_dir: str):
    """Relational DIVISION over a five-table chain: which suppliers have
    shipped to customers in ALL five regions?  The fact×fact hop
    (lineitem→orders) runs as a partitioned join after block-local
    DISTINCT shrink; the customer hop is a second partitioned join; the
    nation→region map (tiny, fixed) broadcasts.  Distinct (supplier,
    region) pairs collapse block-locally before the final count — the
    division is a count-distinct-equals-|divisor| at O(suppliers)
    output."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_suppkey", "l_orderkey"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    region_of = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))

    def dedup_so(t: pa.Table) -> pa.Table:
        return (
            pa.table({"s": t["l_suppkey"], "o": t["l_orderkey"]}).group_by(["s", "o"]).aggregate([])
        )

    so = li.map_batches(dedup_so, batch_format="pyarrow")
    j1 = so.join(orders, join_type="inner", num_partitions=8, on=("o",), right_on=("o_orderkey",))

    def dedup_sc(t: pa.Table) -> pa.Table:
        return (
            pa.table({"s": t["s"], "c": t["o_custkey"]}).group_by(["s", "c"]).aggregate([])
        )

    sc = j1.map_batches(dedup_sc, batch_format="pyarrow")
    j2 = sc.join(cust, join_type="inner", num_partitions=8, on=("c",), right_on=("c_custkey",))

    def to_region(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        rk = np.array([region_of[k] for k in nk], dtype=np.int64)
        return (
            pa.table({"s": t["s"], "r": pa.array(rk)}).group_by(["s", "r"]).aggregate([])
        )

    pairs = (
        j2.map_batches(to_region, batch_format="pyarrow")
        .groupby(["s", "r"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    out = pairs.groupby("s").aggregate(Count(alias_name="n_regions"))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_regions"].cast(pa.int64())
        return pa.table(
            {
                "s_suppkey": t["s"].cast(pa.int64()),
                "n_regions": n,
                "covers_all": pc.cast(pc.equal(n, 5), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("s_suppkey")


SUPPLIER_REGION_COVERAGE_CENSUS_SQL = """
WITH sr AS (
  SELECT DISTINCT l.l_suppkey AS s, n.n_regionkey AS r
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey)
SELECT s AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_regions,
       CAST(CASE WHEN COUNT(*) = 5 THEN 1 ELSE 0 END AS BIGINT) AS covers_all
FROM sr GROUP BY 1 ORDER BY 1
"""


def nation_revenue_theil_decomposition(sf_dir: str):
    """BETWEEN-GROUP Theil inequality decomposition of order revenue
    across customer nations — per nation the additive term
    (sᵢ/S)·ln((sᵢ/S)/(nᵢ/N)), whose sum is the between-nation Theil T'
    (the third inequality lens next to the repo's Gini and Hoover: Theil
    is the only one that decomposes additively).  Revenue/order counts
    fold as exact int64; the term is computed driver-side on the
    O(nations) table with scalar libm log, mirroring LN bit-for-bit."""
    import math

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def pre(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": _cents(t["o_totalprice"]),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ).group_by("o_custkey").aggregate([("cents", "sum"), ("one", "sum")])
        return g.rename_columns(["o_custkey", "cents", "n"])

    per_cust = orders.map_batches(pre, batch_format="pyarrow")
    j = per_cust.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def by_nation(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"k": t["c_nationkey"].cast(pa.int64()), "cents": t["cents"], "n": t["n"]}
        ).group_by("k").aggregate([("cents", "sum"), ("n", "sum")])
        return g.rename_columns(["k", "rev_cents", "n_orders"])

    per_nation = (
        j.map_batches(by_nation, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("rev_cents", alias_name="rev_cents"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    s = per_nation["rev_cents"].to_numpy(dtype=np.int64)
    n = per_nation["n_orders"].to_numpy(dtype=np.int64)
    big_s, big_n = float(int(s.sum())), float(int(n.sum()))
    a = s.astype(np.float64) / big_s
    b = n.astype(np.float64) / big_n
    term = a * np.array([math.log(v) for v in a / b], dtype=np.float64)
    out = pa.table(
        {
            "n_name": pa.array([name_of[k] for k in per_nation["k"]], pa.string()),
            "rev_cents": pa.array(s, pa.int64()),
            "n_orders": pa.array(n, pa.int64()),
            "theil_term": pa.array(term, pa.float64()),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("n_name", "ascending")]))


NATION_REVENUE_THEIL_DECOMPOSITION_SQL = """
WITH r AS (
  SELECT n.n_name,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1),
tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS big_s,
               CAST(SUM(n_orders) AS BIGINT) AS big_n
        FROM r)
SELECT r.n_name, r.rev_cents, r.n_orders,
       (CAST(r.rev_cents AS DOUBLE) / tot.big_s)
           * LN((CAST(r.rev_cents AS DOUBLE) / tot.big_s)
                / (CAST(r.n_orders AS DOUBLE) / tot.big_n)) AS theil_term
FROM r, tot ORDER BY r.n_name
"""


def customer_l_diversity_audit(sf_dir: str):
    """l-DIVERSITY audit — the privacy check k-anonymity misses: within
    every quasi-identifier group (nation × market segment), how many
    DISTINCT sensitive values ($1000 balance bands) appear?  A group can
    be k-large yet l=1 (everyone shares the sensitive value — disclosure
    by membership alone).  One chain: block-local (QI, band) count
    partials → cell groupby → per-QI fold of (Σn = k, #cells = l).
    Output is O(QI groups); nothing wide shuffles."""
    ds = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    )

    def partial(t: pa.Table) -> pa.Table:
        band = pc.divide(_cents(t["c_acctbal"]), 100_000)
        g = pa.table(
            {
                "c_nationkey": t["c_nationkey"].cast(pa.int64()),
                "c_mktsegment": t["c_mktsegment"],
                "band": band,
            }
        ).group_by(["c_nationkey", "c_mktsegment", "band"]).aggregate([("band", "count")])
        g = g.rename_columns(["c_nationkey", "c_mktsegment", "band", "n"])
        return pa.table(
            {
                "c_nationkey": g["c_nationkey"],
                "c_mktsegment": g["c_mktsegment"],
                "band": g["band"],
                "n": g["n"].cast(pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment", "band"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": t["c_nationkey"],
                "c_mktsegment": t["c_mktsegment"],
                "n": t["n"].cast(pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    out = (
        cells.map_batches(fold, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Sum("n", alias_name="k_size"), Sum("one", alias_name="l_distinct"))
    )

    def finish(t: pa.Table) -> pa.Table:
        l = t["l_distinct"].cast(pa.int64())
        return pa.table(
            {
                "c_nationkey": t["c_nationkey"],
                "c_mktsegment": t["c_mktsegment"],
                "k_size": t["k_size"].cast(pa.int64()),
                "l_distinct": l,
                "meets_l3": pc.cast(pc.greater_equal(l, 3), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort(
        ["c_nationkey", "c_mktsegment"]
    )


CUSTOMER_L_DIVERSITY_AUDIT_SQL = """
WITH b AS (
  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS band,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2, 3)
SELECT c_nationkey, c_mktsegment, CAST(SUM(n) AS BIGINT) AS k_size,
       CAST(COUNT(*) AS BIGINT) AS l_distinct,
       CAST(CASE WHEN COUNT(*) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS meets_l3
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""


def part_fd_g3_census(sf_dir: str):
    """Approximate functional-dependency DISCOVERY census — the g3 metric
    (minimum rows to delete for the FD to hold exactly: n − Σ_lhs
    max-agreeing-rhs) for four candidate FDs over part attributes.  g3 is
    the standard TANE/FDEP quality measure; exact integers end to end.
    Per FD: block (lhs, rhs) count partials → cell groupby → per-lhs max
    fold; the per-lhs table is O(distinct lhs), tiny."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_brand", "p_type", "p_size"])

    FDS = [
        ("p_brand->p_type", "p_brand", "p_type"),
        ("p_type->p_brand", "p_type", "p_brand"),
        ("p_size->p_brand", "p_size", "p_brand"),
        ("p_brand->p_size", "p_brand", "p_size"),
    ]
    rows = []
    for fd_name, lhs, rhs in FDS:

        def partial(t: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            g = pa.table(
                {"l": pc.cast(t[lhs], pa.string()), "r": pc.cast(t[rhs], pa.string())}
            ).group_by(["l", "r"]).aggregate([("r", "count")])
            g = g.rename_columns(["l", "r", "n"])
            return pa.table({"l": g["l"], "r": g["r"], "n": g["n"].cast(pa.int64())})

        per_lhs = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["l", "r"])
            .aggregate(Sum("n", alias_name="n"))
            .groupby("l")
            .aggregate(Max("n", alias_name="mx"), Sum("n", alias_name="tot"))
            .to_pandas()
        )
        n_rows = int(per_lhs["tot"].sum())
        n_lhs = len(per_lhs)
        viol = n_rows - int(per_lhs["mx"].sum())
        rows.append((fd_name, n_rows, n_lhs, viol, 1 if viol == 0 else 0))

    return pa.table(
        {
            "fd": pa.array([r[0] for r in rows], pa.string()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "n_lhs": pa.array([r[2] for r in rows], pa.int64()),
            "g3_violations": pa.array([r[3] for r in rows], pa.int64()),
            "holds_exactly": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


PART_FD_G3_CENSUS_SQL = """
WITH
c1 AS (SELECT CAST(p_brand AS VARCHAR) AS l, CAST(p_type AS VARCHAR) AS r,
              CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1, 2),
m1 AS (SELECT l, MAX(n) AS mx, SUM(n) AS tot FROM c1 GROUP BY 1),
c2 AS (SELECT CAST(p_type AS VARCHAR) AS l, CAST(p_brand AS VARCHAR) AS r,
              CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1, 2),
m2 AS (SELECT l, MAX(n) AS mx, SUM(n) AS tot FROM c2 GROUP BY 1),
c3 AS (SELECT CAST(p_size AS VARCHAR) AS l, CAST(p_brand AS VARCHAR) AS r,
              CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1, 2),
m3 AS (SELECT l, MAX(n) AS mx, SUM(n) AS tot FROM c3 GROUP BY 1),
c4 AS (SELECT CAST(p_brand AS VARCHAR) AS l, CAST(p_size AS VARCHAR) AS r,
              CAST(COUNT(*) AS BIGINT) AS n FROM part GROUP BY 1, 2),
m4 AS (SELECT l, MAX(n) AS mx, SUM(n) AS tot FROM c4 GROUP BY 1),
u AS (
  SELECT 'p_brand->p_type' AS fd, CAST(SUM(tot) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_lhs,
         CAST(SUM(tot) - SUM(mx) AS BIGINT) AS g3_violations FROM m1
  UNION ALL
  SELECT 'p_type->p_brand', CAST(SUM(tot) AS BIGINT),
         CAST(COUNT(*) AS BIGINT), CAST(SUM(tot) - SUM(mx) AS BIGINT) FROM m2
  UNION ALL
  SELECT 'p_size->p_brand', CAST(SUM(tot) AS BIGINT),
         CAST(COUNT(*) AS BIGINT), CAST(SUM(tot) - SUM(mx) AS BIGINT) FROM m3
  UNION ALL
  SELECT 'p_brand->p_size', CAST(SUM(tot) AS BIGINT),
         CAST(COUNT(*) AS BIGINT), CAST(SUM(tot) - SUM(mx) AS BIGINT) FROM m4)
SELECT fd, n_rows, n_lhs, g3_violations,
       CAST(CASE WHEN g3_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS holds_exactly
FROM u
"""


def orders_for_encoding_audit(sf_dir: str):
    """Frame-of-reference (FOR) encoding cost per 256-row insertion-order
    group — the fourth leg of the repo's storage-encoding audits (dict /
    RLE / delta-varint / FOR): each group stores min(cents) as an 8-byte
    reference plus (max−min).bit_length()-bit packed offsets.  Group
    numbering reuses the value-range-bucket global rank (no full sort);
    min/max/count fold from block partials; the bit math is integer."""
    from ...stages.rank import global_value_rank

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"], "cents": _cents(t["o_totalprice"])})

    ranked = global_value_rank(
        ds.map_batches(pre, batch_format="pyarrow"),
        value_col="o_orderkey",
        id_col="o_orderkey",
        out_col="rnk",
    )

    def partial(t: pa.Table) -> pa.Table:
        rg = pc.divide(pc.subtract(t["rnk"], 1), 256)
        g = pa.table({"rg": rg, "cents": t["cents"]}).group_by("rg").aggregate(
            [("cents", "min"), ("cents", "max"), ("cents", "count")]
        )
        g = g.rename_columns(["rg", "min_cents", "max_cents", "n_rows"])
        return pa.table(
            {
                "rg": g["rg"],
                "min_cents": g["min_cents"].cast(pa.int64()),
                "max_cents": g["max_cents"].cast(pa.int64()),
                "n_rows": g["n_rows"].cast(pa.int64()),
            }
        )

    folded = (
        ranked.map_batches(partial, batch_format="pyarrow")
        .groupby("rg")
        .aggregate(
            Min("min_cents", alias_name="min_cents"),
            Max("max_cents", alias_name="max_cents"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        delta = pc.subtract(t["max_cents"], t["min_cents"]).to_numpy()
        n = t["n_rows"].cast(pa.int64()).to_numpy()
        bits = np.array([int(d).bit_length() for d in delta], dtype=np.int64)
        for_bytes = 8 + (n * bits + 7) // 8
        return pa.table(
            {
                "rg": t["rg"].cast(pa.int64()),
                "n_rows": pa.array(n, pa.int64()),
                "delta": pa.array(delta, pa.int64()),
                "bits": pa.array(bits, pa.int64()),
                "for_bytes": pa.array(for_bytes, pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort("rg")


ORDERS_FOR_ENCODING_AUDIT_SQL = """
WITH r AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 256 AS rg
  FROM orders),
g AS (SELECT rg, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MAX(cents) - MIN(cents) AS BIGINT) AS delta
      FROM r GROUP BY 1),
b AS (SELECT rg, n_rows, delta,
             CAST(length(ltrim(bin(delta), '0')) AS BIGINT) AS bits
      FROM g)
SELECT CAST(rg AS BIGINT) AS rg, n_rows, delta, bits,
       CAST(8 + (n_rows * bits + 7) // 8 AS BIGINT) AS for_bytes
FROM b ORDER BY rg
"""


def orders_hill_tail_terms(sf_dir: str):
    """Hill tail-index terms — the third extreme-value lens next to the
    repo's block-maxima return periods and mean-excess ladder: for the
    top k=20 order prices x₁≥…≥x₂₀ and pivot x₂₁, each row carries
    ln(xᵢ/x₂₁); their mean is the Hill estimator 1/α̂.  Emitting per-RANK
    terms keeps every float a single fixed IEEE expression (no float
    aggregation to order-drift).  Top-21 extraction is sort+limit with a
    total (cents desc, key asc) tie order; everything after runs on 21
    driver rows with scalar libm log."""
    import math

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"], "cents": _cents(t["o_totalprice"])})

    top = (
        ds.map_batches(pre, batch_format="pyarrow")
        .sort(["cents", "o_orderkey"], descending=[True, False])
        .limit(21)
        .take_all()
    )
    cents = [int(r["cents"]) for r in top]
    pivot = cents[20]
    terms = [math.log(float(c) / pivot) for c in cents[:20]]
    return pa.table(
        {
            "tail_rank": pa.array(range(1, 21), pa.int64()),
            "cents": pa.array(cents[:20], pa.int64()),
            "hill_term": pa.array(terms, pa.float64()),
        }
    )


ORDERS_HILL_TAIL_TERMS_SQL = """
WITH r AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (ORDER BY FLOOR(o_totalprice * 100 + 0.5) DESC,
                            o_orderkey) AS tail_rank
  FROM orders),
p AS (SELECT cents AS pivot FROM r WHERE tail_rank = 21)
SELECT CAST(r.tail_rank AS BIGINT) AS tail_rank, r.cents,
       LN(CAST(r.cents AS DOUBLE) / p.pivot) AS hill_term
FROM r, p WHERE r.tail_rank <= 20 ORDER BY r.tail_rank
"""


def orders_distinct_customer_rollup(sf_dir: str):
    """NON-ADDITIVE rollup: distinct active customers at month, quarter
    and year grains.  COUNT DISTINCT cannot be summed up a hierarchy (a
    customer active in two months of a quarter must count once), so each
    grain re-folds the (period, customer) DISTINCT cells of the finer one
    — the cascade (y,m,c) → (y,q,c) → (y,c) is exact and each fold only
    shuffles already-deduplicated cells, never raw orders."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def month_cells(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {
                    "y": pc.year(t["o_orderdate"]).cast(pa.int64()),
                    "m": pc.month(t["o_orderdate"]).cast(pa.int64()),
                    "c": t["o_custkey"],
                }
            )
            .group_by(["y", "m", "c"])
            .aggregate([])
        )

    ym = (
        ds.map_batches(month_cells, batch_format="pyarrow")
        .groupby(["y", "m", "c"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )

    def to_quarter(t: pa.Table) -> pa.Table:
        q = pc.add(pc.divide(pc.subtract(t["m"], 1), 3), 1)
        return pa.table({"y": t["y"], "q": q, "c": t["c"]}).group_by(["y", "q", "c"]).aggregate([])

    yq = (
        ym.map_batches(to_quarter, batch_format="pyarrow")
        .groupby(["y", "q", "c"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def to_year(t: pa.Table) -> pa.Table:
        return pa.table({"y": t["y"], "c": t["c"]}).group_by(["y", "c"]).aggregate([])

    yy = (
        ym.map_batches(to_year, batch_format="pyarrow")
        .groupby(["y", "c"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    m_counts = ym.groupby(["y", "m"]).aggregate(Count(alias_name="n")).to_pandas()
    q_counts = yq.groupby(["y", "q"]).aggregate(Count(alias_name="n")).to_pandas()
    y_counts = yy.groupby("y").aggregate(Count(alias_name="n")).to_pandas()

    rows = []
    for r in m_counts.itertuples():
        rows.append(("month", f"{int(r.y):04d}-{int(r.m):02d}", int(r.n)))
    for r in q_counts.itertuples():
        rows.append(("quarter", f"{int(r.y):04d}-Q{int(r.q)}", int(r.n)))
    for r in y_counts.itertuples():
        rows.append(("year", f"{int(r.y):04d}", int(r.n)))
    rows.sort()
    return pa.table(
        {
            "grain": pa.array([r[0] for r in rows], pa.string()),
            "period": pa.array([r[1] for r in rows], pa.string()),
            "n_distinct_customers": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


ORDERS_DISTINCT_CUSTOMER_ROLLUP_SQL = """
WITH u AS (
  SELECT 'month' AS grain, strftime(o_orderdate, '%Y-%m') AS period,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct_customers
  FROM orders GROUP BY 2
  UNION ALL
  SELECT 'quarter',
         strftime(o_orderdate, '%Y') || '-Q'
             || CAST(quarter(o_orderdate) AS VARCHAR),
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
  FROM orders GROUP BY 2
  UNION ALL
  SELECT 'year', strftime(o_orderdate, '%Y'),
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
  FROM orders GROUP BY 2)
SELECT grain, period, n_distinct_customers FROM u ORDER BY grain, period
"""


def lineitem_progressive_bracket_tax(sf_dir: str):
    """Progressive (marginal-bracket) levy simulation per return flag —
    the piecewise-linear integral shape every tax/tariff/fee schedule
    needs: 0% below $20k, 10% on $20k–$50k, 25% above $50k of each
    line's extended price.  All math is integer cents with ONE deferred
    division per line (scaled percent sums divided once), so partials
    commute and the fold is exact at any parallelism.  The effective
    rate is integer ppm via cross-multiplication."""
    B1, B2 = 2_000_000, 5_000_000  # bracket edges in cents
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_returnflag", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"]).to_numpy()
        mid = np.clip(c - B1, 0, B2 - B1)
        top = np.clip(c - B2, 0, None)
        tax = (mid * 10 + top * 25) // 100
        g = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "one": pa.array(np.ones(len(c), dtype=np.int64)),
                "base_cents": pa.array(c),
                "tax_cents": pa.array(tax),
            }
        ).group_by("l_returnflag").aggregate(
            [("one", "sum"), ("base_cents", "sum"), ("tax_cents", "sum")]
        )
        return g.rename_columns(["l_returnflag", "n", "base_cents", "tax_cents"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("base_cents", alias_name="base_cents"),
            Sum("tax_cents", alias_name="tax_cents"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        base = t["base_cents"].cast(pa.int64()).to_numpy()
        tax = t["tax_cents"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n": t["n"].cast(pa.int64()),
                "base_cents": pa.array(base, pa.int64()),
                "tax_cents": pa.array(tax, pa.int64()),
                "effective_ppm": pa.array(tax * 1_000_000 // base, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("l_returnflag")


LINEITEM_PROGRESSIVE_BRACKET_TAX_SQL = """
WITH t AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem),
x AS (SELECT l_returnflag, c,
             (LEAST(GREATEST(c - 2000000, 0), 3000000) * 10
              + GREATEST(c - 5000000, 0) * 25) // 100 AS tax
      FROM t),
s AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS base_cents,
             CAST(SUM(tax) AS BIGINT) AS tax_cents
      FROM x GROUP BY 1)
SELECT l_returnflag, n, base_cents, tax_cents,
       CAST(tax_cents * 1000000 // base_cents AS BIGINT) AS effective_ppm
FROM s ORDER BY l_returnflag
"""


def docs_adler32_census(sf_dir: str):
    """REAL Adler-32 checksums per document — computed with zlib's actual
    implementation (the same rolling checksum inside every zlib stream
    the PDF path inflates), then split into its (A, B) components, which
    the oracle reconstructs arithmetically: A = (1 + Σaᵢ) mod 65521 and
    B = (n + Σ(n−i+1)·aᵢ) mod 65521 over the ASCII bytes.  A hash match
    is therefore a cross-engine proof of the checksum definition itself.
    Vectorized per block; the weighted sums are O(bytes)."""
    import zlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def census(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        adlers = np.array([zlib.adler32(s.encode("ascii")) for s in texts], dtype=np.int64)
        a = adlers & 0xFFFF
        b = adlers >> 16
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "adler_a": pa.array(a, pa.int64()),
                "adler_b": pa.array(b, pa.int64()),
                "adler32": pa.array(b * 65536 + a, pa.int64()),
            }
        )

    return ds.map_batches(census, batch_format="pyarrow").sort("doc_id")


DOCS_ADLER32_CENSUS_SQL = """
WITH pos AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
         unnest(range(1, length(text) + 1)) AS i, text
  FROM documents),
s AS (SELECT doc_id, any_value(n) AS n,
             CAST(SUM(ascii(substr(text, CAST(i AS INT), 1))) AS BIGINT)
                 AS sa,
             CAST(SUM((n - i + 1)
                      * ascii(substr(text, CAST(i AS INT), 1))) AS BIGINT)
                 AS sw
      FROM pos GROUP BY doc_id)
SELECT doc_id, CAST((1 + sa) % 65521 AS BIGINT) AS adler_a,
       CAST((n + sw) % 65521 AS BIGINT) AS adler_b,
       CAST(((n + sw) % 65521) * 65536 + (1 + sa) % 65521 AS BIGINT)
           AS adler32
FROM s ORDER BY doc_id
"""


def events_type_first_precedence_matrix(sf_dir: str):
    """Adoption-ORDER census: for every ordered type pair (a, b), how
    many users' FIRST a strictly precedes their first b (lexicographic
    (ts, event_id) — total and tie-free since event ids are unique).
    Complements the time-based adoption-latency op with the pure
    ordering structure ('do users discover a before b?').  One
    co-partition by user emits O(types²) pair rows per user; the global
    fold is a tiny pair groupby."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"])

    def per_user(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        typ = np.asarray(g["event_type"].combine_chunks().to_numpy(zero_copy_only=False))
        first: dict[str, tuple] = {}
        order = np.lexsort((eid, ts))
        for i in order:
            t_ = typ[i]
            if t_ not in first:
                first[t_] = (int(ts[i]), int(eid[i]))
        types = sorted(first)
        pa_, pb_ = [], []
        for a in types:
            for b in types:
                if a != b and first[a] < first[b]:
                    pa_.append(a)
                    pb_.append(b)
        return pa.table(
            {
                "type_a": pa.array(pa_, pa.string()),
                "type_b": pa.array(pb_, pa.string()),
                "n_users": pa.array(np.ones(len(pa_), dtype=np.int64)),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .sort(["type_a", "type_b"])
    )


EVENTS_TYPE_FIRST_PRECEDENCE_MATRIX_SQL = """
WITH r AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
f AS (SELECT user_id, event_type, ts, event_id FROM r WHERE rn = 1),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM f a JOIN f b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
       AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id)))
SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY 1, 2 ORDER BY 1, 2
"""


def ann_int8_exact_topk(sf_dir: str):
    """QUANTIZED ANN with an EXACT oracle: embeddings are quantized to
    int8 codes with a fixed power-of-two scale (⌊128x + 0.5⌋ — ×128 is
    exact in IEEE double, so both engines produce identical codes), and
    similarity is the INTEGER dot product of codes — the int8-dot path
    real vector stores run on SIMD — making the top-5-per-query boundary
    a total integer order the SQL oracle reproduces verbatim.  Query
    codes broadcast once; each block computes an int64 matmul and prunes
    to its local top-5 per query before the tiny final fold."""
    import pyarrow.dataset as pads

    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    qrows = sorted(
        rd.read_parquet(
            _t(sf_dir, "embeddings"),
            columns=["vec_id", "embedding"],
            filter=pads.field("vec_id") < 3,
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    qcodes = np.stack(
        [
            np.floor(np.asarray(r["embedding"], dtype=np.float64) * 128.0 + 0.5).astype(np.int64)
            for r in qrows
        ]
    )
    qids = np.array([int(r["vec_id"]) for r in qrows], dtype=np.int64)
    q_ref = ray.put((qids, qcodes))

    def block_topk(t: pa.Table) -> pa.Table:
        qi, qc = ray.get(q_ref)
        emb = np.stack(
            [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
        )
        codes = np.floor(emb * 128.0 + 0.5).astype(np.int64)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        dots = codes @ qc.T  # (n, 3)
        out_q, out_v, out_d = [], [], []
        for j in range(len(qi)):
            col = dots[:, j]
            order = np.lexsort((vids, -col))[: min(5, len(vids))]
            out_q.extend([qi[j]] * len(order))
            out_v.extend(vids[order])
            out_d.extend(col[order])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(np.array(out_v, dtype=np.int64)),
                "dot": pa.array(np.array(out_d, dtype=np.int64)),
            }
        )

    cand = ds.map_batches(block_topk, batch_format="pyarrow")

    def final_topk(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("dot", "descending"), ("vec_id", "ascending")]
        ).slice(0, 5)
        s = g.take(order)
        return pa.table(
            {
                "query_id": s["query_id"],
                "rnk": pa.array(range(1, s.num_rows + 1), pa.int64()),
                "vec_id": s["vec_id"],
                "dot": s["dot"],
            }
        )

    return (
        cand.groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
        .sort(["query_id", "rnk"])
    )


ANN_INT8_EXACT_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < 3),
u AS (SELECT q.query_id, e.vec_id,
             unnest(q.qe) AS a, unnest(e.embedding) AS b
      FROM q, embeddings e),
d AS (SELECT query_id, vec_id,
             CAST(SUM(CAST(FLOOR(CAST(a AS DOUBLE) * 128 + 0.5) AS BIGINT)
                      * CAST(FLOOR(CAST(b AS DOUBLE) * 128 + 0.5) AS BIGINT))
                  AS BIGINT) AS dot
      FROM u GROUP BY 1, 2),
r AS (SELECT query_id, vec_id, dot,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot DESC, vec_id) AS rnk
      FROM d)
SELECT query_id, CAST(rnk AS BIGINT) AS rnk, vec_id, dot
FROM r WHERE rnk <= 5 ORDER BY query_id, rnk
"""


def orders_price_sortedness_audit(sf_dir: str):
    """Storage SORTEDNESS audit — how sorted is o_totalprice in insertion
    (orderkey) order?  Counts strictly-descending adjacent steps and the
    resulting non-decreasing run count: the number that predicts zone-map
    effectiveness (few runs → tight min/max per row group) and merge-sort
    cost.  Adjacency across distributed blocks comes from the value-range
    global rank + an 8-partition self-join of rank r onto r+1 — no
    driver-side sequence walk."""
    from ...stages.rank import global_value_rank

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"], "cents": _cents(t["o_totalprice"])})

    ranked = global_value_rank(
        ds.map_batches(pre, batch_format="pyarrow"),
        value_col="o_orderkey",
        id_col="o_orderkey",
        out_col="rnk",
    ).materialize()
    n_rows = ranked.count()

    left = ranked.map_batches(
        lambda t: pa.table({"rnk": t["rnk"], "cents_l": t["cents"]}),
        batch_format="pyarrow",
    )
    right = ranked.map_batches(
        lambda t: pa.table(
            {"prev_rnk": pc.subtract(t["rnk"], 1), "cents_r": t["cents"]}
        ),
        batch_format="pyarrow",
    )
    pairs = left.join(
        right, join_type="inner", num_partitions=8, on=("rnk",), right_on=("prev_rnk",)
    )

    def count_desc(t: pa.Table) -> pa.Table:
        desc = pc.sum(pc.cast(pc.greater(t["cents_l"], t["cents_r"]), pa.int64())).as_py() or 0
        return pa.table(
            {
                "n_pairs": pa.array([t.num_rows], pa.int64()),
                "n_desc_steps": pa.array([desc], pa.int64()),
            }
        )

    folded = (
        pairs.map_batches(count_desc, batch_format="pyarrow")
        .aggregate(Sum("n_pairs"), Sum("n_desc_steps"))
    )
    n_pairs = int(folded["sum(n_pairs)"])
    n_desc = int(folded["sum(n_desc_steps)"])
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "n_desc_steps": pa.array([n_desc], pa.int64()),
            "n_runs": pa.array([n_desc + 1], pa.int64()),
        }
    )


ORDERS_PRICE_SORTEDNESS_AUDIT_SQL = """
WITH r AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         LAG(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
             OVER (ORDER BY o_orderkey) AS prev
  FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(prev) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN prev > cents THEN 1 ELSE 0 END) AS BIGINT)
           AS n_desc_steps,
       CAST(SUM(CASE WHEN prev > cents THEN 1 ELSE 0 END) + 1 AS BIGINT)
           AS n_runs
FROM r
"""


def orders_rapid_reorder_pairs(sf_dir: str):
    """BAND self-join on the fact table: ordered pairs of a customer's
    orders 1–7 days apart, censused by gap — the rapid-reorder signal
    (and the canonical 'temporal self-join with a band predicate' shape;
    the events×orders range join is cross-table, this is the self
    variant).  Co-partition by customer; each group counts pairwise gaps
    with one vectorized upper-triangle mask (orders-per-customer is
    small, so the group quadratic is bounded); the global fold is a
    7-row groupby."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate"])

    def per_cust(g: pa.Table) -> pa.Table:
        d = np.sort(
            g["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(np.int64)
        )
        if len(d) < 2:
            return pa.table(
                {"gap_days": pa.array([], pa.int64()), "n_pairs": pa.array([], pa.int64())}
            )
        diffs = d[None, :] - d[:, None]
        mask = (diffs >= 1) & (diffs <= 7)
        vals = diffs[np.triu(mask)]
        if len(vals) == 0:
            return pa.table(
                {"gap_days": pa.array([], pa.int64()), "n_pairs": pa.array([], pa.int64())}
            )
        counts = np.bincount(vals, minlength=8)[1:8]
        keep = np.nonzero(counts)[0]
        return pa.table(
            {
                "gap_days": pa.array(keep + 1, pa.int64()),
                "n_pairs": pa.array(counts[keep], pa.int64()),
            }
        )

    return (
        ds.groupby("o_custkey")
        .map_groups(per_cust, batch_format="pyarrow")
        .groupby("gap_days")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        .sort("gap_days")
    )


ORDERS_RAPID_REORDER_PAIRS_SQL = """
WITH p AS (
  SELECT date_diff('day', a.o_orderdate, b.o_orderdate) AS gap_days
  FROM orders a JOIN orders b
    ON a.o_custkey = b.o_custkey
   AND b.o_orderdate > a.o_orderdate
   AND date_diff('day', a.o_orderdate, b.o_orderdate) <= 7)
SELECT CAST(gap_days AS BIGINT) AS gap_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM p GROUP BY 1 ORDER BY 1
"""


def docs_token_first_position_census(sf_dir: str):
    """Per-token FIRST-OCCURRENCE position census — where in a document
    does each vocabulary term first appear (min and sum of 1-based first
    positions, plus df)?  Header/boilerplate terms show tiny first
    positions; topical terms drift deep — the positional complement of
    the per-position modal-token op.  Positions index the FILTERED token
    sequence; block partials carry one row per (block, term) after the
    per-(doc, term) min collapses block-locally."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        terms = np.asarray(flat.to_numpy(zero_copy_only=False))[keep]
        par = parents[keep]
        # 1-based position within the filtered sequence of each doc
        starts = np.searchsorted(par, np.unique(par))
        first_of = np.zeros(par.max() + 1 if len(par) else 0, dtype=np.int64)
        if len(par):
            first_of[np.unique(par)] = starts
        pos = np.arange(len(par), dtype=np.int64) - first_of[par] + 1
        import pandas as pd

        df = pd.DataFrame({"doc": par, "term": terms, "pos": pos})
        fp = df.groupby(["doc", "term"], sort=False)["pos"].min().reset_index()
        g = fp.groupby("term", sort=False)["pos"].agg(["count", "min", "sum"]).reset_index()
        return pa.table(
            {
                "term": pa.array(g["term"], pa.string()),
                "df": pa.array(g["count"].to_numpy(dtype=np.int64)),
                "min_first_pos": pa.array(g["min"].to_numpy(dtype=np.int64)),
                "sum_first_pos": pa.array(g["sum"].to_numpy(dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Min("min_first_pos", alias_name="min_first_pos"),
            Sum("sum_first_pos", alias_name="sum_first_pos"),
        )
        .sort("term")
    )


DOCS_TOKEN_FIRST_POSITION_CENSUS_SQL = """
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term,
         unnest(range(1, len(list_filter(string_split_regex(lower(text),
                            '[^a-z0-9]+'), x -> x <> '')) + 1)) AS i
  FROM documents),
f AS (SELECT doc_id, term, CAST(MIN(i) AS BIGINT) AS fp
      FROM t GROUP BY 1, 2)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       CAST(MIN(fp) AS BIGINT) AS min_first_pos,
       CAST(SUM(fp) AS BIGINT) AS sum_first_pos
FROM f GROUP BY 1 ORDER BY 1
"""
