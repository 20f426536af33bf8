"""Train/val/test split assignment, dataset profiling, similarity self-join."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_split_assign_is_content_stable_and_partitions(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_split_assign

    out = docs_split_assign(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert len(out) == len(docs)
    assert set(out.split) <= {"train", "val", "test"}

    def want(i: int) -> str:
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    got = dict(zip(out.doc_id, out.split))
    assert all(got[i] == want(i) for i in docs.doc_id)
    # all three splits are non-empty at 500 docs
    assert out.split.nunique() == 3


def test_orders_profile_matches_pandas(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_profile

    out = orders_profile(SF).set_index("col")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.floor(o.o_totalprice.to_numpy() * 100 + 0.5).astype(np.int64)
    assert (out.n == len(o)).all()
    assert (out.n_null == 0).all()
    assert out.loc["o_orderkey", "n_distinct"] == o.o_orderkey.nunique()
    assert out.loc["o_totalprice", "n_distinct"] == len(np.unique(cents))
    assert out.loc["o_totalprice", "min_v"] == str(cents.min())
    assert out.loc["o_totalprice", "max_v"] == str(cents.max())
    assert out.loc["o_orderstatus", "min_v"] == o.o_orderstatus.min()
    assert out.loc["o_orderpriority", "max_v"] == o.o_orderpriority.max()
    assert str(out.n_distinct.dtype) == "int64"


def test_simjoin_matches_bruteforce_dp(ray_session):
    from invoice_ocr_reconciler_ray.functions.similarity import _edit_distance
    from invoice_ocr_reconciler_ray.pipelines.queries import customer_name_simjoin

    out = (
        customer_name_simjoin(SF)
        .to_pandas()
        .sort_values(["id1", "id2"])
        .reset_index(drop=True)
    )
    c = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])
    names = dict(zip(c.c_custkey, c.c_name))
    keys = sorted(names)
    want = []
    for a in range(len(keys)):
        for b in range(a + 1, len(keys)):
            d = _edit_distance(names[keys[a]], names[keys[b]])
            if d <= 1:
                want.append((keys[a], keys[b], d))
    got = list(map(tuple, out[["id1", "id2", "dist"]].itertuples(index=False)))
    assert got == sorted(want)


def test_simjoin_long_names_use_dp_fallback(ray_session, tmp_path):
    """Names beyond the 64-char Myers lane go through levenshtein_many and
    still produce the exact pair set."""
    from invoice_ocr_reconciler_ray.pipelines.queries import customer_name_simjoin

    base = "x" * 70
    names = [base, base[:-1] + "y", base + "z", "short"]
    t = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_name": pa.array(names, pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "customer.parquet"))
    out = customer_name_simjoin(str(tmp_path)).to_pandas()
    got = set(map(tuple, out[["id1", "id2", "dist"]].itertuples(index=False)))
    # (1,2): one substitution; (1,3): one insertion; (2,3): two edits — out
    assert got == {(1, 2, 1), (1, 3, 1)}
