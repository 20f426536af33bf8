"""Hand-check tests: band join boundaries, per-lang top terms order/rank,
winsorize clipping, and the IVM merge invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_band_join_boundary_cases(ray_session, tmp_path):
    """Band edges are [lo, hi): a price exactly on a boundary lands in the
    upper tier; the open top tier catches everything else."""
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_totalprice": pa.array(
                [0.0, 49_999.99, 50_000.00, 399_999.99, 400_000.00], pa.float64()
            ),
        }
    )
    pq.write_table(orders, tmp_path / "orders.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_price_band_join

    out = (
        orders_price_band_join(str(tmp_path)).to_pandas().set_index("o_orderkey")
    )
    assert out.tier.to_dict() == {1: "T0", 2: "T0", 3: "T1", 4: "T3", 5: "T4"}
    assert str(out.price_cents.dtype) == "int64"


def test_lang_top_terms_rank_and_ties(ray_session, tmp_path):
    """Counts merge across docs of the same lang; rank order is (n DESC,
    term ASC) with ties broken lexically; at most 5 rows per lang."""
    docs = pa.table(
        {
            "lang": ["en", "en", "de"],
            "text": [
                "apple apple banana cherry",
                "apple banana banana date egg fig grape",
                "zwei zwei eins",
            ],
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_lang_top_terms

    out = docs_lang_top_terms(str(tmp_path)).to_pandas()
    en = out[out.lang == "en"].sort_values("rn")
    # apple 3, banana 3 (tie -> apple first), cherry/date/egg 1 each
    assert en.term.tolist() == ["apple", "banana", "cherry", "date", "egg"]
    assert en.n.tolist() == [3, 3, 1, 1, 1]
    assert en.rn.tolist() == [1, 2, 3, 4, 5]
    de = out[out.lang == "de"].sort_values("rn")
    assert de.term.tolist() == ["zwei", "eins"]
    assert str(out.n.dtype) == "int64" and str(out.rn.dtype) == "int64"


def test_winsorize_clips_to_exact_quantiles(ray_session, tmp_path):
    """lo/hi are quantile_disc(0.05/0.95) of the cents distribution; values
    outside clamp, values inside pass through untouched."""
    vals = [float(i) for i in range(1, 101)]  # $1..$100
    orders = pa.table(
        {
            "o_orderkey": pa.array(list(range(1, 101)), pa.int64()),
            "o_totalprice": pa.array(vals, pa.float64()),
        }
    )
    pq.write_table(orders, tmp_path / "orders.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_price_winsorized

    out = (
        orders_price_winsorized(str(tmp_path)).to_pandas().set_index("o_orderkey")
    )
    # quantile_disc with n=100: rank ceil(0.05*100)=5 -> $5; ceil(0.95*100)=95 -> $95
    assert out.loc[1].winsorized_cents == 500
    assert out.loc[4].winsorized_cents == 500
    assert out.loc[5].winsorized_cents == 500
    assert out.loc[50].winsorized_cents == 5000
    assert out.loc[95].winsorized_cents == 9500
    assert out.loc[100].winsorized_cents == 9500
    assert str(out.winsorized_cents.dtype) == "int64"


def test_ivm_merge_equals_full_recompute(ray_session, tmp_path):
    """merge(agg(standing), agg(delta)) == agg(full) — the IVM invariant,
    with the cutoff splitting the data non-trivially."""
    dates = [pd.Timestamp("1995-06-01")] * 3 + [pd.Timestamp("1996-07-01")] * 2
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_orderstatus": ["O", "F", "O", "O", "F"],
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0, 50.0], pa.float64()),
            "o_orderdate": pa.array(dates),
        }
    )
    pq.write_table(orders, tmp_path / "orders.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_agg_ivm

    out = orders_agg_ivm(str(tmp_path)).set_index("o_orderstatus")
    assert out.loc["O"].sum_total_cents == 8000 and out.loc["O"].n == 3
    assert out.loc["F"].sum_total_cents == 7000 and out.loc["F"].n == 2
    assert str(out.sum_total_cents.dtype) == "int64"
