"""Weighted corpus mixing, epoch upsampling, and the exact value CDF."""

import hashlib

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_corpus_mix_is_content_stable_and_rate_correct(ray_session):
    """The mixture equals a pandas recomputation of the same hash rule
    (content-stable — independent of block layout or run), and each kept
    row carries its source's rate."""
    from invoice_ocr_reconciler_ray.pipelines.queries import corpus_mix_weighted

    out = corpus_mix_weighted(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang", "source"])
    rates = docs.source.map(lambda s: ((int(s[3:]) % 5) + 1) * 150)
    h = docs.doc_id.map(
        lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000
    )
    want = docs[h < rates].sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == want.doc_id.tolist()
    assert (out.rate_permille == want.source.map(lambda s: ((int(s[3:]) % 5) + 1) * 150).to_numpy()).all()
    # rerun is bit-identical (no seed, no partitioning dependence)
    again = corpus_mix_weighted(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert again.doc_id.tolist() == out.doc_id.tolist()


def test_epoch_repeat_counts_and_epochs(ray_session):
    """Every doc appears exactly weight(source) times with epochs 1..w."""
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_epoch_repeat

    out = docs_epoch_repeat(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    w = docs.set_index("doc_id").source.map(lambda s: (int(s[3:]) % 3) + 1)
    counts = out.groupby("doc_id").epoch.agg(["count", "min", "max"])
    assert (counts["count"] == w.loc[counts.index]).all()
    assert (counts["min"] == 1).all()
    assert (counts["max"] == w.loc[counts.index]).all()
    # no duplicate (doc_id, epoch) pair
    assert not out.duplicated(["doc_id", "epoch"]).any()


def test_price_cdf_matches_numpy(ray_session):
    """CDF is integer-exact vs a numpy recomputation; cumulative counts are
    strictly increasing and end at n."""
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_price_cdf

    out = orders_price_cdf(SF)
    prices = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"]).o_totalprice
    cents = np.floor(prices.to_numpy() * 100 + 0.5).astype(np.int64)
    vals, cnts = np.unique(cents, return_counts=True)
    assert out.price_cents.tolist() == vals.tolist()
    assert out.cnt.tolist() == cnts.tolist()
    assert out.cum_cnt.tolist() == np.cumsum(cnts).tolist()
    assert out.cum_cnt.iloc[-1] == len(cents)
    assert [str(t) for t in out.dtypes] == ["int64", "int64", "int64"]
