"""Brute-force checks for the drift statistics (KS, Mann-Whitney), the
retention self-shift join, and the market-basket pair ranking — independent
numpy/pandas recomputation on sf0.001 (the DuckDB oracles are the driver's
gate; these pin the math itself)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from invoice_ocr_reconciler_ray.pipelines import queries as Q

SF = "/root/testdata/sf0.001"


def _cents_np(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


@pytest.fixture(scope="module")
def li():
    return pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice"],
    ).to_pandas()


def test_ks_matches_bruteforce(ray_session, li):
    got = Q.lineitem_ks_returnflag(SF).to_pandas().iloc[0]
    r = np.sort(_cents_np(li[li.l_returnflag == "R"].l_extendedprice.to_numpy()))
    n = np.sort(_cents_np(li[li.l_returnflag == "N"].l_extendedprice.to_numpy()))
    support = np.unique(np.concatenate([r, n]))
    cr = np.searchsorted(r, support, side="right")
    cn = np.searchsorted(n, support, side="right")
    d_num = int(np.abs(cr * len(n) - cn * len(r)).max())
    assert int(got.n_r) == len(r) and int(got.n_n) == len(n)
    assert int(got.d_num) == d_num
    assert got.ks_d == d_num / (len(r) * len(n))


def test_mannwhitney_matches_midrank_bruteforce(ray_session, li):
    got = Q.lineitem_mannwhitney_returnflag(SF).to_pandas().iloc[0]
    r = _cents_np(li[li.l_returnflag == "R"].l_extendedprice.to_numpy())
    n = _cents_np(li[li.l_returnflag == "N"].l_extendedprice.to_numpy())
    pooled = np.concatenate([r, n])
    # midranks via average of 1-based positional ranks within tie groups
    order = np.argsort(pooled, kind="mergesort")
    ranks2 = np.empty(len(pooled), np.int64)  # 2x midrank, exact integer
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks2[order[i:j]] = (i + 1) + j  # (lo + hi) with 1-based lo=i+1, hi=j
        i = j
    u2 = int(ranks2[: len(r)].sum()) - len(r) * (len(r) + 1)
    assert int(got.u2) == u2
    assert int(got.n_r) == len(r) and int(got.n_n) == len(n)


def test_retention_matches_pandas(ray_session):
    got = Q.customer_retention_by_month(SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"]).to_pandas()
    m = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month - 1
    d = pd.DataFrame({"ck": o.o_custkey, "m": m}).drop_duplicates()
    merged = d.merge(d.assign(m=d.m + 1), on=["ck", "m"])
    exp = merged.groupby("m").size().sort_index()
    assert list(got.month_idx) == list(exp.index)
    assert list(got.retained) == list(exp.values)


def test_copurchase_matches_pandas(ray_session, li):
    got = Q.part_copurchase_pairs(SF).to_pandas()
    d = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    j = d.merge(d, on="l_orderkey")
    j = j[j.l_partkey_x < j.l_partkey_y]
    exp = (
        j.groupby(["l_partkey_x", "l_partkey_y"])
        .size()
        .reset_index(name="n_orders")
        .sort_values(
            ["n_orders", "l_partkey_x", "l_partkey_y"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        .head(20)
        .reset_index(drop=True)
    )
    assert list(got.p1) == list(exp.l_partkey_x)
    assert list(got.p2) == list(exp.l_partkey_y)
    assert list(got.n_orders) == list(exp.n_orders)


def test_mad_is_lower_median_of_deviations(ray_session):
    got = Q.orders_price_mad_by_priority(SF).to_pandas()
    o = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).to_pandas()
    o["v"] = _cents_np(o.o_totalprice.to_numpy())

    def lower_median(a: np.ndarray) -> int:
        a = np.sort(a)
        return int(a[(len(a) + 1) // 2 - 1])

    for _, row in got.iterrows():
        vals = o[o.o_orderpriority == row.o_orderpriority].v.to_numpy()
        med = lower_median(vals)
        assert int(row.median_cents) == med
        assert int(row.mad_cents) == lower_median(np.abs(vals - med))
