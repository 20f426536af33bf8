"""Blocked fuzzy linkage, grouped OLS, OHLC bars, sequence packing,
skip-gram pairs, weighted systematic sampling — analytic tests pinning what
the driver hash can miss: block isolation in the fuzzy join, tie-breaking in
arg-min/arg-max selection, exact offsets at block boundaries, window-2 pairs
never crossing documents, heavy rows covering several sample anchors.  Every
test also asserts output DTYPES (the r2 asof bug survived value-only
asserts)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_blocked_fuzzy_join_blocks_and_threshold(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.linkage import blocked_fuzzy_join

    big = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "block": pa.array([0, 0, 1, 1], pa.int32()),
                "key": pa.array(["abcd", "zzzz", "abcd", "abce"]),
            }
        )
    )
    # small side: block 0 has "abce" (dist 1 to abcd, 4 to zzzz);
    # block 1 has "qqqq" (no hit) — "abcd" in block 1 must NOT match block 0
    out = blocked_fuzzy_join(
        big,
        [(0, 10, "abce"), (1, 11, "qqqq")],
        big_id="id",
        big_block="block",
        big_key="key",
        threshold=1,
    ).to_pandas()
    assert sorted(zip(out.big_id, out.small_id, out.lev_dist)) == [(1, 10, 1)]
    assert str(out["big_id"].dtype) == "int64"
    assert str(out["block"].dtype) == "int32"
    assert str(out["lev_dist"].dtype) == "int64"


def test_blocked_fuzzy_join_rejects_long_keys(ray_session):
    from invoice_ocr_reconciler_ray.stages.linkage import _group_small_side

    with pytest.raises(ValueError, match="64-char bound"):
        _group_small_side([(0, 1, "x" * 65)])


def test_grouped_ols_closed_form(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.regression import grouped_ols

    # group a: y = 3x + 7 exactly; group b: y = -2x + 100 exactly
    xa = np.array([1, 2, 3, 4, 5], np.int64)
    xb = np.array([10, 20, 30], np.int64)
    t = pa.table(
        {
            "g": pa.array(["a"] * 5 + ["b"] * 3),
            "x": pa.array(np.r_[xa, xb]),
            "y": pa.array(np.r_[3 * xa + 7, -2 * xb + 100]),
        }
    )
    out = (
        grouped_ols(rd.from_arrow(t), group_col="g", x_col="x", y_col="y")
        .to_pandas()
        .set_index("g")
    )
    assert out.loc["a", "slope"] == 3.0 and out.loc["a", "intercept"] == 7.0
    assert out.loc["b", "slope"] == -2.0 and out.loc["b", "intercept"] == 100.0
    assert out.loc["a", "n_rows"] == 5 and out.loc["b", "sum_x"] == 60
    for c in ("n_rows", "sum_x", "sum_y", "sum_xx", "sum_xy"):
        assert str(out[c].dtype) == "int64", c
    assert str(out["slope"].dtype) == "float64"


def test_ohlc_ties_break_by_id(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.timeseries import ohlc_bars

    ts = pa.array(
        np.array(
            ["2024-01-01T00:00:05"] * 2 + ["2024-01-01T00:59:59"] * 2,
            "datetime64[us]",
        )
    )
    # two rows share the earliest ts (ids 2,1) and two the latest (ids 3,4):
    # open must be id 1's value, close id 4's
    t = pa.table(
        {
            "event_id": pa.array([2, 1, 3, 4], pa.int64()),
            "ts": ts,
            "value": pa.array([20.0, 10.0, 30.0, 40.0]),
        }
    )
    out = ohlc_bars(
        rd.from_arrow(t), ts_col="ts", id_col="event_id", value_col="value"
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["n_events"]) == (
        10.0,
        40.0,
        10.0,
        40.0,
        4,
    )
    assert str(out["hour_us"].dtype) == "int64"
    assert str(out["n_events"].dtype) == "int64"


def test_ohlc_merges_across_blocks(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.timeseries import ohlc_bars

    # 2000 rows in one hour, shuffled ids, forced through many blocks:
    # the driver merge must still pick the global min/max-id endpoints
    rng = np.random.default_rng(7)
    ids = rng.permutation(2000).astype(np.int64)
    base = np.datetime64("2024-03-01T12:00:00", "us")
    t = pa.table(
        {
            "event_id": pa.array(ids),
            "ts": pa.array(base + (ids % 3600).astype("timedelta64[s]")),
            "value": pa.array(ids.astype(np.float64)),
        }
    )
    out = ohlc_bars(
        rd.from_arrow(t).repartition(16),
        ts_col="ts",
        id_col="event_id",
        value_col="value",
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["open"] == 0.0 and r["low"] == 0.0
    assert r["high"] == 1999.0 and r["n_events"] == 2000
    # close = largest (ts mod) then largest id: ts key is id%3600=id here,
    # so close is id 1999's value too
    assert r["close"] == 1999.0


def test_sequence_pack_offsets(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["w " * 200, "", "x " * 100, "y"]
            ),  # 200, 0, 100, 1 tokens
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_sequence_pack

    out = (
        docs_sequence_pack(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["token_offset"]) == [0, 200, 200, 300]
    assert list(out["block_id"]) == [0, 0, 0, 1]  # 300 // 256 == 1
    assert str(out["token_offset"].dtype) == "int64"


def test_skipgram_window2_doc_boundaries(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta gamma", "gamma delta"]),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_skipgram_pairs

    out = docs_skipgram_pairs(str(tmp_path)).to_pandas()
    got = {(r.w1, r.w2): r.n_pairs for r in out.itertuples(index=False)}
    # doc 1: d1 (alpha,beta),(beta,gamma); d2 (alpha,gamma)
    # doc 2: d1 (gamma,delta) — crucially NOT (gamma,gamma) or (beta,delta)
    assert got == {
        ("alpha", "beta"): 1,
        ("beta", "gamma"): 1,
        ("alpha", "gamma"): 1,
        ("gamma", "delta"): 1,
    }


def test_weighted_sample_heavy_doc_covers_multiple_anchors(
    ray_session, tmp_path
):
    # one doc holds ~96% of the weight → most of the 50 anchors land on it
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["t " * 5000, "u u u", "v"]),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_weighted_sample

    out = docs_weighted_sample(str(tmp_path)).to_pandas()
    assert len(out) == 50  # one row per anchor, always
    assert sorted(out["sample_idx"]) == list(range(50))
    counts = out.groupby("doc_id").size()
    assert counts.get(1, 0) >= 45
    # exact systematic-PPS check: anchor i hits doc 1 iff (2i+1)*W//100 < 5001
    w = {1: 5001, 2: 4, 3: 2}
    total = sum(w.values())
    expect_doc1 = sum(1 for i in range(50) if (2 * i + 1) * total // 100 < 5001)
    assert counts.get(1, 0) == expect_doc1
