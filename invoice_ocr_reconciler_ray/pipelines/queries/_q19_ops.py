"""Query-registry family module 19: replication consistency / split
leakage / l-diversity (round-5 continuation, wave I):

* `orders_quorum_staleness_audit` — R/W-quorum read staleness under
  deterministic replica lag (the md5 bridge decides which replicas lag a
  version), censused per order priority — the eventual-consistency
  number a storage SLA quotes;
* `docs_split_leakage_audit` — train/val/test fold assignment by hash;
  counts exact-duplicate text pairs that STRADDLE folds (the
  contamination every leaderboard regrets) vs stay within a fold;
* `customer_l_diversity_census` — l-diversity over quasi-identifier
  groups (nation × segment) with the balance sign as the sensitive
  attribute: groups where every member shares one value leak it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t


def orders_quorum_staleness_audit(sf_dir: str):
    """Quorum-read staleness: each order key has latest version
    k % 5 + 1 on N = 3 replicas; replica r lags ONE version when
    md5(k:r)'s bridge value ≡ 0 (mod 4) (a deterministic 25 % lag rate).
    A read contacts replicas k % 3 and (k+1) % 3 (R = 2) and returns the
    max version seen; the audit counts stale reads per order priority —
    exact, replayable, and identical in hashlib and DuckDB md5().
    One vectorized pass; priority-bounded census."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)

        def lag(k: int, r: int) -> int:
            return int(
                int(hashlib.md5(f"{k}:{r}".encode()).hexdigest()[:8], 16) % 4 == 0
            )

        stale = np.fromiter(
            (
                int(
                    max(
                        (int(k) % 5 + 1) - lag(int(k), int(k) % 3),
                        (int(k) % 5 + 1) - lag(int(k), (int(k) + 1) % 3),
                    )
                    < int(k) % 5 + 1
                )
                for k in keys
            ),
            np.int64,
            len(keys),
        )
        return (
            pa.table(
                {
                    "priority": t["o_orderpriority"],
                    "n": pa.array(np.ones(len(keys), np.int64)),
                    "stale": pa.array(stale, pa.int64()),
                }
            )
            .group_by("priority")
            .aggregate([("n", "sum"), ("stale", "sum")])
            .rename_columns(["priority", "n", "stale"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("priority")
        .aggregate(Sum("n", alias_name="n_keys"), Sum("stale", alias_name="n_stale"))
        .to_pandas()
        .sort_values("priority", kind="mergesort")
    )
    n = g["n_keys"].to_numpy().astype(np.int64)
    s = g["n_stale"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "priority": pa.array([str(p) for p in g["priority"]], pa.string()),
            "n_keys": pa.array(n, pa.int64()),
            "n_stale": pa.array(s, pa.int64()),
            "stale_ppm": pa.array(s * 1_000_000 // n, pa.int64()),
        }
    )


ORDERS_QUORUM_STALENESS_AUDIT_SQL = """
WITH k AS (
  SELECT o_orderpriority AS priority, o_orderkey AS key,
         o_orderkey % 5 + 1 AS latest,
         CASE WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
              || CAST(o_orderkey % 3 AS VARCHAR)), 1, 8)) AS UBIGINT) % 4 = 0
              THEN 1 ELSE 0 END AS lag_a,
         CASE WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
              || CAST((o_orderkey + 1) % 3 AS VARCHAR)), 1, 8)) AS UBIGINT)
              % 4 = 0 THEN 1 ELSE 0 END AS lag_b
  FROM orders
), r AS (
  SELECT priority,
         CASE WHEN GREATEST(latest - lag_a, latest - lag_b) < latest
              THEN 1 ELSE 0 END AS stale
  FROM k
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(stale) AS BIGINT) AS n_stale,
       CAST(SUM(stale) * 1000000 // COUNT(*) AS BIGINT) AS stale_ppm
FROM r GROUP BY priority ORDER BY priority
"""


def docs_split_leakage_audit(sf_dir: str):
    """Train/val/test contamination: docs are assigned to five folds by
    the md5 bridge of their id; exact-duplicate texts (equal md5) that
    land in DIFFERENT folds are leakage pairs.  Per duplicate group of
    size m with fold multiset {m_f}: total pairs C(m,2), within-fold
    Σ C(m_f,2), cross-fold the difference — summed corpus-wide, exact.
    The dup-group fold rides the existing signature groupby shape."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        sigs = [
            hashlib.md5((s or "").encode()).hexdigest()
            for s in t["text"].to_pylist()
        ]
        folds = [
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 5 for i in ids
        ]
        return (
            pa.table(
                {
                    "sig": pa.array(sigs, pa.string()),
                    "fold": pa.array(folds, pa.int64()),
                    "n": pa.array(np.ones(len(ids), np.int64)),
                }
            )
            .group_by(["sig", "fold"])
            .aggregate([("n", "sum")])
            .rename_columns(["sig", "fold", "n"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["sig", "fold"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tot_pairs = 0
    within = 0
    for _, sub in g.groupby("sig", sort=False):
        m = int(sub["n"].sum())
        if m < 2:
            continue
        tot_pairs += m * (m - 1) // 2
        within += int(sum(int(x) * (int(x) - 1) // 2 for x in sub["n"]))
    cross = tot_pairs - within
    return pa.table(
        {
            "n_dup_pairs": pa.array([tot_pairs], pa.int64()),
            "n_within_fold": pa.array([within], pa.int64()),
            "n_cross_fold": pa.array([cross], pa.int64()),
            "leakage_ppm": pa.array(
                [cross * 1_000_000 // tot_pairs if tot_pairs else 0], pa.int64()
            ),
        }
    )


DOCS_SPLIT_LEAKAGE_AUDIT_SQL = """
WITH d AS (
  SELECT md5(text) AS sig,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
           % 5 AS fold
  FROM documents
), gf AS (
  SELECT sig, fold, CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY sig, fold
), gs AS (
  SELECT sig, CAST(SUM(n) AS BIGINT) AS m,
         CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS within
  FROM gf GROUP BY sig HAVING SUM(n) >= 2
), agg AS (
  SELECT CAST(COALESCE(SUM(m * (m - 1) // 2), 0) AS BIGINT) AS n_dup_pairs,
         CAST(COALESCE(SUM(within), 0) AS BIGINT) AS n_within_fold
  FROM gs
)
SELECT n_dup_pairs, n_within_fold,
       CAST(n_dup_pairs - n_within_fold AS BIGINT) AS n_cross_fold,
       CAST(CASE WHEN n_dup_pairs > 0
                 THEN (n_dup_pairs - n_within_fold) * 1000000 // n_dup_pairs
                 ELSE 0 END AS BIGINT) AS leakage_ppm
FROM agg
"""


def customer_l_diversity_census(sf_dir: str):
    """l-diversity over the quasi-identifier (nation, segment): the
    sensitive attribute is the account-balance SIGN; a QI group whose
    members all share one sign reveals it to anyone who can place a
    customer in the group.  Census: for l = 1 and l = 2, how many groups
    and customers — the privacy complement of the k-anonymity audit
    already in the registry.  One (QI, sign) groupby; group-bounded
    fold."""
    ds = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    )

    def partial(t: pa.Table) -> pa.Table:
        neg = pc.cast(pc.less(t["c_acctbal"], 0.0), pa.int64())
        return (
            pa.table(
                {
                    "nk": pc.cast(t["c_nationkey"], pa.int64()),
                    "seg": t["c_mktsegment"],
                    "neg": neg,
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by(["nk", "seg", "neg"])
            .aggregate([("n", "sum")])
            .rename_columns(["nk", "seg", "neg", "n"])
        )

    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["nk", "seg", "neg"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    from collections import Counter

    groups: Counter = Counter()
    custs: Counter = Counter()
    for (_, _), sub in g.groupby(["nk", "seg"], sort=False):
        l = len(sub)
        groups[l] += 1
        custs[l] += int(sub["n"].sum())
    ls = sorted(groups)
    return pa.table(
        {
            "l_distinct": pa.array(ls, pa.int64()),
            "n_groups": pa.array([groups[l] for l in ls], pa.int64()),
            "n_customers": pa.array([custs[l] for l in ls], pa.int64()),
        }
    )


CUSTOMER_L_DIVERSITY_CENSUS_SQL = """
WITH c AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
         CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS neg
  FROM customer
), qi AS (
  SELECT nk, seg,
         CAST(COUNT(DISTINCT neg) AS BIGINT) AS l_distinct,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM c GROUP BY nk, seg
)
SELECT l_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(n) AS BIGINT) AS n_customers
FROM qi GROUP BY l_distinct ORDER BY l_distinct
"""
