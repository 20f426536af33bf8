"""Round-3 additions: as-of join directions (forward/nearest), CDC-shaped
operators (keyed diff, latest-per-key compaction), and per-group exact
quantiles — analytic invariants the sf0.01 oracle hash can miss (tie
determinism, block-layout invariance, ground-truth rank semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _asof_fixture():
    ts = lambda s: pd.Timestamp(s)
    left = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 1, 2, 3],
                "lts": [ts("2024-01-05"), ts("2024-01-10"), ts("2024-01-01"),
                        ts("2024-01-05"), ts("2024-01-05")],
                "eid": [10, 11, 12, 20, 30],
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 1, 1, 2],
                "rts": [ts("2024-01-03"), ts("2024-01-07"), ts("2024-01-07"),
                        ts("2024-01-09"), ts("2024-01-06")],
                "rid": [100, 101, 102, 103, 200],
            }
        )
    )
    return left, right


def test_asof_join_forward(ray_session):
    """Forward: smallest right_ts >= left_ts; equal-ts ties take the MIN
    tiebreak (mirror of backward); left rows after the last right row drop."""
    from invoice_ocr_reconciler_ray.stages.asof import asof_join

    left, right = _asof_fixture()
    out = (
        asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            left_cols=["eid"], right_cols=["rid"], tiebreak="rid",
            direction="forward",
        )
        .to_pandas()
        .set_index("eid")["rid"]
    )
    assert out[10] == 101  # first rts >= Jan 5 is Jan 7; tie 101 vs 102 → min
    assert 11 not in out.index  # nothing at/after Jan 10
    assert out[12] == 100
    assert out[20] == 200
    assert 30 not in out.index


def test_asof_join_nearest_prefers_backward_on_tie(ray_session):
    from invoice_ocr_reconciler_ray.stages.asof import asof_join

    ts = lambda s: pd.Timestamp(s)
    left = rd.from_arrow(
        pa.table({"k": [1, 1, 1], "lts": [ts("2024-01-05"), ts("2024-01-02"),
                                          ts("2024-01-09")], "eid": [1, 2, 3]})
    )
    # backward candidate Jan 3 (d=2) and forward Jan 7 (d=2) tie for eid 1
    right = rd.from_arrow(
        pa.table({"k": [1, 1], "rts": [ts("2024-01-03"), ts("2024-01-07")],
                  "rid": [100, 101]})
    )
    out = (
        asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            left_cols=["eid"], right_cols=["rid"], tiebreak="rid",
            direction="nearest",
        )
        .to_pandas()
        .set_index("eid")["rid"]
    )
    assert out[1] == 100  # exact distance tie → backward
    assert out[2] == 100  # only forward side closer/date before all? Jan 3 d=1 wins
    assert out[3] == 101


def test_diff_by_key_classification(ray_session):
    from invoice_ocr_reconciler_ray.stages.cdc import diff_by_key

    base = rd.from_arrow(
        pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": ["a", "b", "c", "d"]})
    ).repartition(3)
    new = rd.from_arrow(
        pa.table({"id": pa.array([1, 2, 5], pa.int64()),
                  "v": ["a", "B", "e"]})
    ).repartition(2)
    out = (
        diff_by_key(base, new, key="id", value_cols=["v"])
        .to_pandas()
        .set_index("id")["diff"]
        .sort_index()
    )
    # id 1 identical → absent; 2 changed; 3,4 removed; 5 added
    assert 1 not in out.index
    assert out.to_dict() == {2: "changed", 3: "removed", 4: "removed", 5: "added"}


def test_latest_per_key_block_invariant(ray_session):
    from invoice_ocr_reconciler_ray.stages.cdc import latest_per_key

    rng = np.random.RandomState(11)
    n = 2000
    tbl = pa.table(
        {
            "k": pa.array(rng.randint(0, 37, n), pa.int64()),
            "o": pa.array(rng.randint(0, 50, n), pa.int64()),
            "tb": pa.array(np.arange(n), pa.int64()),
            "payload": pa.array(rng.randint(0, 10**6, n), pa.int64()),
        }
    )
    want = (
        tbl.to_pandas()
        .sort_values(["k", "o", "tb"])
        .groupby("k")
        .last()
        .reset_index()
    )
    for nparts in (1, 7):
        got = (
            latest_per_key(
                rd.from_arrow(tbl).repartition(nparts),
                key="k", order_col="o", tiebreak="tb",
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got[["k", "o", "tb", "payload"]].equals(want[["k", "o", "tb", "payload"]])
        assert {str(t) for t in got.dtypes} == {"int64"}


def test_group_quantiles_match_rank_semantics(ray_session):
    """Per-group exact quantiles vs a numpy ground truth applying the
    quantile_disc rule (value at 1-based rank ceil(q*n)) per group."""
    from invoice_ocr_reconciler_ray.stages.quantiles import exact_group_quantiles

    rng = np.random.RandomState(5)
    n = 6000
    keys = rng.choice(["a", "b", "c"], n, p=[0.6, 0.3, 0.1])
    vals = np.round(rng.uniform(0, 1000, n), 2)
    vals[keys == "c"] = 42.0  # degenerate group: all equal
    tbl = pa.table({"g": pa.array(keys), "v": pa.array(vals)})
    qs = [0.1, 0.5, 0.9]
    out = (
        exact_group_quantiles(rd.from_arrow(tbl).repartition(9), "g", "v", qs, nbins=64)
        .to_pandas()
        .set_index(["key", "q"])["value"]
    )
    for g in "abc":
        sv = np.sort(vals[keys == g])
        for q in qs:
            want = sv[max(1, int(np.ceil(q * len(sv)))) - 1]
            assert out[(g, q)] == want, (g, q)


def test_multi_window_counts_match_bruteforce(ray_session):
    """All horizons from one sorted layout must equal per-row brute force
    over a random keyed layout (windows inclusive-upper, exclusive-lower)."""
    from invoice_ocr_reconciler_ray.stages.asof import range_join_multi_count

    rng = np.random.RandomState(23)
    n = 1500
    keys = rng.randint(0, 20, n).astype(np.int64)
    ts = rng.randint(0, 10**6, n).astype(np.int64)
    tbl = pa.table(
        {"k": pa.array(keys), "t": pa.array(ts), "rid": pa.array(np.arange(n, dtype=np.int64))}
    )
    windows = {"w_small": 10_000, "w_big": 200_000}
    out = (
        range_join_multi_count(
            rd.from_arrow(tbl).repartition(5),
            rd.from_arrow(tbl.select(["k", "t"])).repartition(3),
            key="k", left_ts="t", right_ts="t",
            left_cols=["rid"], windows_us=windows,
        )
        .to_pandas()
        .set_index("rid")
        .sort_index()
    )
    assert len(out) == n
    for rid in rng.choice(n, 60, replace=False):
        same = keys == keys[rid]
        for w, width in windows.items():
            want = int(((ts[same] > ts[rid] - width) & (ts[same] <= ts[rid])).sum())
            assert out.loc[rid, w] == want, (rid, w)


def test_asof_join_left_outer_keeps_unmatched_with_typed_nulls(ray_session):
    """how='left': every left row survives — no-match-before rows and
    whole keys with zero right rows carry NULL rid; dtype stays int64
    (nullable), never float64."""
    from invoice_ocr_reconciler_ray.stages.asof import asof_join

    left, right = _asof_fixture()
    out = (
        asof_join(
            left,
            right,
            key="k",
            left_ts="lts",
            right_ts="rts",
            left_cols=["eid"],
            right_cols=["rid"],
            tiebreak="rid",
            how="left",
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    assert out.eid.tolist() == [10, 11, 12, 20, 30]
    got = {e: (None if pd.isna(r) else int(r)) for e, r in zip(out.eid, out.rid)}
    # eid 12 precedes all right rows for k=1; eid 20 precedes k=2's row;
    # k=3 has no right rows at all
    assert got == {10: 100, 11: 103, 12: None, 20: None, 30: None}
    assert str(out.rid.dtype) in ("Int64", "int64", "object") or out.rid.isna().any()
    # Arrow-side dtype discipline: re-run keeping the Arrow schema
    tbl = pa.concat_tables(
        asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            left_cols=["eid"], right_cols=["rid"], tiebreak="rid", how="left",
        ).iter_batches(batch_format="pyarrow")
    )
    assert tbl.schema.field("rid").type == pa.int64()


def test_multi_window_sums_match_bruteforce(ray_session):
    """RANGE-frame windowed SUM: the prefix-sum kernel must equal per-row
    brute force (negative measures included — prefix differences must not
    assume monotone sums), with the same (t-w, t] frame as the count op."""
    from invoice_ocr_reconciler_ray.stages.asof import range_join_multi_sum

    rng = np.random.RandomState(31)
    n = 1200
    keys = rng.randint(0, 15, n).astype(np.int64)
    ts = rng.randint(0, 10**6, n).astype(np.int64)
    m = rng.randint(-500, 500, n).astype(np.int64)
    left = pa.table(
        {"k": pa.array(keys), "t": pa.array(ts), "rid": pa.array(np.arange(n, dtype=np.int64))}
    )
    right = pa.table({"k": pa.array(keys), "t": pa.array(ts), "m": pa.array(m)})
    windows = {"w_small": 10_000, "w_big": 200_000}
    out = (
        range_join_multi_sum(
            rd.from_arrow(left).repartition(5),
            rd.from_arrow(right).repartition(3),
            key="k", left_ts="t", right_ts="t",
            left_cols=["rid"], measure="m", windows_us=windows,
        )
        .to_pandas()
        .set_index("rid")
        .sort_index()
    )
    assert len(out) == n
    assert str(out.w_small.dtype) == "int64"
    for rid in rng.choice(n, 60, replace=False):
        same = keys == keys[rid]
        for w, width in windows.items():
            sel = same & (ts > ts[rid] - width) & (ts <= ts[rid])
            assert out.loc[rid, w] == int(m[sel].sum()), (rid, w)
