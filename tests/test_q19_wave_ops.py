"""Edge-case unit tests for the wave-I registry ops (_q19_ops)."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def _lag(k, r):
    return int(int(hashlib.md5(f"{k}:{r}".encode()).hexdigest()[:8], 16) % 4 == 0)


def test_quorum_staleness_replay(tmp_path):
    keys = list(range(1, 41))
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_orderpriority": pa.array(["P"] * 40, pa.string()),
        },
    )
    out = Q.orders_quorum_staleness_audit(str(tmp_path)).to_pandas().iloc[0]
    exp = sum(
        int(max((k % 5 + 1) - _lag(k, k % 3), (k % 5 + 1) - _lag(k, (k + 1) % 3))
            < k % 5 + 1)
        for k in keys
    )
    assert out.n_keys == 40 and out.n_stale == exp


def test_split_leakage_pairs(tmp_path):
    # ids whose hash-folds differ: find two ids in different folds + one pair
    # within a fold by brute force over small ids
    folds = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 5
        for i in range(1, 30)
    }
    same = [(a, b) for a in folds for b in folds if a < b and folds[a] == folds[b]][0]
    diff = [(a, b) for a in folds for b in folds if a < b and folds[a] != folds[b]][0]
    ids = [same[0], same[1], diff[0], diff[1]]
    texts = ["dup1", "dup1", "dup2", "dup2"]
    # the 'diff' pair may collide with the 'same' pair ids; dedupe scenario:
    if len(set(ids)) < 4:
        ids = [same[0], same[1], 1000, 1001]
        texts = ["dup1", "dup1", "solo_a", "solo_b"]
    _write(
        tmp_path,
        "documents",
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        },
    )
    out = Q.docs_split_leakage_audit(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_dup_pairs == out.n_within_fold + out.n_cross_fold
    assert out.n_within_fold >= 1  # the engineered same-fold dup pair


def test_l_diversity_census(tmp_path):
    _write(
        tmp_path,
        "customer",
        {
            "c_nationkey": pa.array([0, 0, 1, 1], pa.int32()),
            "c_mktsegment": pa.array(["A", "A", "A", "A"], pa.string()),
            # group (0,A): both positive -> l=1; group (1,A): mixed -> l=2
            "c_acctbal": pa.array([5.0, 7.0, -1.0, 3.0], pa.float64()),
        },
    )
    out = Q.customer_l_diversity_census(str(tmp_path)).to_pandas().set_index("l_distinct")
    assert out.loc[1, "n_groups"] == 1 and out.loc[1, "n_customers"] == 2
    assert out.loc[2, "n_groups"] == 1 and out.loc[2, "n_customers"] == 2


def test_wave_i_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in [
        "orders_quorum_staleness_audit",
        "docs_split_leakage_audit",
        "customer_l_diversity_census",
    ]:
        assert k in reg and k in osql
