"""Per-domain cap sampling and robust median/MAD outlier flagging."""

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_domain_cap_keeps_hash_bottom3_per_source(ray_session):
    """Exactly ≤3 docs per source survive, and they are the md5-smallest —
    a pure function of content, independent of scan order."""
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_domain_cap

    out = docs_domain_cap(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    docs["h"] = docs.doc_id.map(lambda i: hashlib.md5(str(i).encode()).hexdigest())
    want = (
        docs.sort_values(["h", "doc_id"])
        .groupby("source")
        .head(3)[["doc_id", "source"]]
    )
    assert len(out) == len(want)
    got = set(map(tuple, out[["doc_id", "source"]].itertuples(index=False)))
    assert got == set(map(tuple, want.itertuples(index=False)))
    assert out.groupby("source").size().max() <= 3


def test_outliers_match_numpy_median_mad(ray_session):
    """Flag equals |v - median| > 3·MAD with quantile_disc median/MAD
    recomputed in numpy."""
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_price_outliers

    out = orders_price_outliers(SF).to_pandas().sort_values("o_orderkey")
    cents = np.floor(
        pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
        .o_totalprice.to_numpy() * 100 + 0.5
    ).astype(np.int64)

    def qdisc(a, q):
        s = np.sort(a)
        return s[max(1, int(np.ceil(q * len(s)))) - 1]

    med = qdisc(cents, 0.5)
    mad = qdisc(np.abs(cents - med), 0.5)
    keys = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"]).o_orderkey
    want = pd.DataFrame(
        {"k": keys, "f": np.abs(cents - med) * 10 > 19 * mad}
    ).sort_values("k")
    assert out.is_outlier.tolist() == want.f.tolist()
    # MAD gate is meaningful on this data: some but not all rows flagged
    assert 0 < out.is_outlier.sum() < len(out)


def test_bloom_join_prefilter_is_exact_and_prunes(ray_session):
    """The Bloom-prefiltered join returns exactly the pandas join result
    (no false negatives by the Bloom contract, FPs killed by the join),
    and the prefilter genuinely prunes non-matching fact rows."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.pipelines.queries import (
        lineitem_bloom_join_revenue,
    )

    out = (
        lineitem_bloom_join_revenue(SF)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    keys = set(od[od.o_orderpriority == "1-URGENT"].o_orderkey)
    m = li[li.l_orderkey.isin(keys)].copy()
    m["rev_c"] = np.floor(
        m.l_extendedprice.to_numpy() * (1 - m.l_discount.to_numpy()) * 100 + 0.5
    ).astype(np.int64)
    want = (
        m.groupby("l_returnflag")
        .agg(rev_cents=("rev_c", "sum"), n_items=("rev_c", "size"))
        .reset_index()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    assert out.l_returnflag.tolist() == want.l_returnflag.tolist()
    assert out.rev_cents.tolist() == want.rev_cents.tolist()
    assert out.n_items.tolist() == want.n_items.tolist()
    # the urgent subset is a real minority — the Bloom filter has real work
    assert len(m) < len(li) * 0.5
