"""Query-registry family module 23: clustering agreement + per-entity
control charts (round-5 continuation, wave M):

* `docs_linkgraph_lang_rand_index` — RAND INDEX between the link-graph
  connected components (the registry's exact 16-round CC oracle, reused
  verbatim as a subquery) and the language partition: the
  clustering-agreement number behind "do communities follow language?",
  with every pair count an exact integer and the index an exact ppm;
* `events_user_cusum_alarm_census` — Page's CUSUM run per USER over
  their value stream (reference k = the user's own integer mean,
  alarm at S > 2k), censused by event count bucket — the per-key
  state-machine control chart at corpus scale, recursive-CTE oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t
from ._q10_web import DOCS_LINKGRAPH_COMPONENTS_SQL, docs_linkgraph_components


def docs_linkgraph_lang_rand_index(sf_dir: str):
    """Rand index between link-graph components and languages: with the
    contingency cells n_cl (docs in component c and lang l), same-pair
    counts are exact integer folds — agreements = C(N,2) − Σ_c C(n_c,2)
    − Σ_l C(n_l,2) + 2·Σ_cl C(n_cl,2) … assembled from the four pair
    sums, emitted alongside the exact ppm index.  The component
    assignment reuses the registry's distributed CC pipeline; cells are
    component×lang-bounded."""
    comp = docs_linkgraph_components(sf_dir)
    comp_t = (
        comp
        if isinstance(comp, pa.Table)
        else pa.concat_tables(list(comp.iter_batches(batch_format="pyarrow")))
    )
    comp_cols = set(comp_t.column_names)
    id_col = "doc_id" if "doc_id" in comp_cols else comp_t.column_names[0]
    lab_col = [c for c in comp_t.column_names if c != id_col][0]
    labels = dict(
        zip(comp_t[id_col].to_pylist(), comp_t[lab_col].to_pylist())
    )

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])
    docs = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    from collections import Counter

    cells: Counter = Counter()
    for doc_id, lang in zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist()):
        cells[(labels[doc_id], str(lang))] += 1
    n = sum(cells.values())
    row: Counter = Counter()
    col: Counter = Counter()
    s_cell = 0
    for (c, l), m in cells.items():
        row[c] += m
        col[l] += m
        s_cell += m * (m - 1) // 2
    s_row = sum(v * (v - 1) // 2 for v in row.values())
    s_col = sum(v * (v - 1) // 2 for v in col.values())
    total = n * (n - 1) // 2
    agreements = total - s_row - s_col + 2 * s_cell
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "pairs_total": pa.array([total], pa.int64()),
            "pairs_same_comp": pa.array([s_row], pa.int64()),
            "pairs_same_lang": pa.array([s_col], pa.int64()),
            "pairs_same_both": pa.array([s_cell], pa.int64()),
            "rand_ppm": pa.array([agreements * 1_000_000 // total], pa.int64()),
        }
    )


DOCS_LINKGRAPH_LANG_RAND_INDEX_SQL = f"""
WITH cc AS MATERIALIZED ({DOCS_LINKGRAPH_COMPONENTS_SQL}),
cells AS (
  SELECT cc.cluster_id, d.lang, CAST(COUNT(*) AS BIGINT) AS m
  FROM cc JOIN documents d ON cc.doc_id = d.doc_id
  GROUP BY cc.cluster_id, d.lang
), sums AS (
  SELECT CAST(SUM(m) AS BIGINT) AS n,
         CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS s_cell
  FROM cells
), rows_ AS (
  SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS s_row
  FROM (SELECT SUM(m) AS t FROM cells GROUP BY cluster_id)
), cols_ AS (
  SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS s_col
  FROM (SELECT SUM(m) AS t FROM cells GROUP BY lang)
)
SELECT n AS n_docs,
       CAST(n * (n - 1) // 2 AS BIGINT) AS pairs_total,
       s_row AS pairs_same_comp,
       s_col AS pairs_same_lang,
       s_cell AS pairs_same_both,
       CAST((n * (n - 1) // 2 - s_row - s_col + 2 * s_cell) * 1000000
            // (n * (n - 1) // 2) AS BIGINT) AS rand_ppm
FROM sums, rows_, cols_
"""


def events_user_cusum_alarm_census(sf_dir: str):
    """Per-user CUSUM control chart: each user's value stream (cents, in
    (ts, event_id) order) runs S_t = max(0, S_{t−1} + x_t − k) with
    k = ⌊Σx/n⌋ (the user's own mean) and alarms when S_t > 2k; the
    census buckets users by whether they ever alarm and their event
    count (1–9 / 10–49 / 50+).  Order-sensitive per-key recurrence —
    the sessionize/token-bucket shape — with a recursive-CTE oracle."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    _empty = pa.table(
        {
            "size_bucket": pa.array([], pa.string()),
            "n_users": pa.array([], pa.int64()),
            "n_alarmed": pa.array([], pa.int64()),
        }
    )

    def per_user(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
            )
        )
        cents = np.floor(
            s["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        n = len(cents)
        k = int(cents.sum()) // n
        sv = 0
        alarmed = 0
        for x in cents:
            sv = max(0, sv + int(x) - k)
            if sv > 2 * k:
                alarmed = 1
                break
        bucket = "1-9" if n < 10 else ("10-49" if n < 50 else "50+")
        return pa.table(
            {
                "size_bucket": pa.array([bucket], pa.string()),
                "n_users": pa.array([1], pa.int64()),
                "n_alarmed": pa.array([alarmed], pa.int64()),
            }
        )

    g = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("size_bucket")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_alarmed", alias_name="n_alarmed"),
        )
        .to_pandas()
        .sort_values("size_bucket", kind="mergesort")
    )
    return pa.table(
        {
            "size_bucket": pa.array([str(x) for x in g["size_bucket"]], pa.string()),
            "n_users": pa.array(g["n_users"].to_numpy().astype(np.int64), pa.int64()),
            "n_alarmed": pa.array(
                g["n_alarmed"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


EVENTS_USER_CUSUM_ALARM_CENSUS_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i
  FROM events
), kk AS MATERIALIZED (
  SELECT user_id, CAST(SUM(x) // COUNT(*) AS BIGINT) AS k,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY user_id
), r AS (
  SELECT e.user_id, e.i,
         GREATEST(CAST(0 AS BIGINT), e.x - kk.k) AS s,
         CASE WHEN GREATEST(CAST(0 AS BIGINT), e.x - kk.k) > 2 * kk.k
              THEN 1 ELSE 0 END AS alarmed
  FROM e JOIN kk ON e.user_id = kk.user_id WHERE e.i = 1
  UNION ALL
  SELECT e.user_id, e.i,
         GREATEST(CAST(0 AS BIGINT), r.s + e.x - kk.k),
         CASE WHEN r.alarmed = 1
                   OR GREATEST(CAST(0 AS BIGINT), r.s + e.x - kk.k) > 2 * kk.k
              THEN 1 ELSE 0 END
  FROM r
  JOIN e ON e.user_id = r.user_id AND e.i = r.i + 1
  JOIN kk ON e.user_id = kk.user_id
), fin AS (
  SELECT user_id, MAX(alarmed) AS alarmed FROM r GROUP BY user_id
), lab AS (
  SELECT fin.user_id, fin.alarmed,
         CASE WHEN kk.n < 10 THEN '1-9'
              WHEN kk.n < 50 THEN '10-49'
              ELSE '50+' END AS size_bucket
  FROM fin JOIN kk ON fin.user_id = kk.user_id
)
SELECT size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(alarmed) AS BIGINT) AS n_alarmed
FROM lab GROUP BY size_bucket ORDER BY size_bucket
"""
