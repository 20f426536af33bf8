"""Hand-check tests for the CUBE aggregate, rolling-window sum, and SCD
Type-2 interval operators (values AND dtypes — the round-2 asof lesson)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_cube_levels_are_consistent(ray_session, tmp_path):
    """Every CUBE super-level must re-sum exactly from the finest level, and
    the grand total appears once with lvl 3."""
    orders = pa.table(
        {
            "o_orderstatus": ["O", "O", "F", "F", "O"],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT", "2-HIGH", "1-URGENT"],
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0, 5.5], pa.float64()),
        }
    )
    pq.write_table(orders, tmp_path / "orders.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_cube_revenue

    out = orders_cube_revenue(str(tmp_path))
    assert {c: str(out[c].dtype) for c in out.columns} == {
        "status": "object",
        "prio": "object",
        "sum_total_cents": "int64",
        "n": "int64",
        "lvl": "int64",
    }
    finest = out[out.lvl == 0]
    assert len(finest) == 4  # (O,1) (O,2) (F,1) (F,2)
    assert finest.sum_total_cents.sum() == 10550

    by_status = out[out.lvl == 1].set_index("status")
    assert (by_status.prio == "ALL").all()
    assert by_status.loc["O"].sum_total_cents == 3550
    assert by_status.loc["F"].sum_total_cents == 7000

    by_prio = out[out.lvl == 2].set_index("prio")
    assert (by_prio.status == "ALL").all()
    assert by_prio.loc["1-URGENT"].sum_total_cents == 4550
    assert by_prio.loc["2-HIGH"].sum_total_cents == 6000

    grand = out[out.lvl == 3]
    assert len(grand) == 1
    assert grand.iloc[0].sum_total_cents == 10550 and grand.iloc[0].n == 5


def test_rolling_sum5_window_matches_pandas(ray_session, tmp_path):
    """win5 = trailing 5-row sum per user in (ts, event_id) order, exact
    cents; first 4 rows are partial windows (shorter sums, not nulls)."""
    t0 = pd.Timestamp("2024-01-01")
    n = 9
    events = pa.table(
        {
            "event_id": pa.array(list(range(1, n + 1)), pa.int64()),
            "user_id": pa.array([7] * 7 + [8] * 2, pa.int64()),
            "ts": pa.array([t0 + pd.Timedelta(seconds=i) for i in range(n)]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 10.0, 0.5]),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_rolling_sum5

    out = events_rolling_sum5(str(tmp_path)).to_pandas().set_index("event_id")
    assert str(out.win5_cents.dtype) == "int64"
    df = events.to_pandas().sort_values(["ts", "event_id"])
    df["cents"] = (df.value * 100 + 0.5).apply(int)
    for uid, g in df.groupby("user_id"):
        cents = g.cents.tolist()
        for i, eid in enumerate(g.event_id.tolist()):
            assert out.loc[eid].win5_cents == sum(cents[max(0, i - 4) : i + 1]), eid
    # user 8 restarts its window
    assert out.loc[8].win5_cents == 1000 and out.loc[9].win5_cents == 1050


def test_scd2_intervals_compress_and_close(ray_session, tmp_path):
    """Consecutive same-type events collapse; each interval closes at the
    next change's start; the live state has a NULL valid_to."""
    t0 = pd.Timestamp("2024-01-01")
    sec = pd.Timedelta(seconds=1)
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
            "ts": pa.array([t0, t0 + sec, t0 + 2 * sec, t0 + 3 * sec, t0, t0 + sec]),
            "event_type": ["view", "view", "click", "view", "signup", "signup"],
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_scd2_intervals

    out = (
        events_scd2_intervals(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "valid_from_us"])
        .reset_index(drop=True)
    )
    # user 7: view[t0,t0+2) click[t0+2,t0+3) view[t0+3,NULL); user 8: signup[t0,NULL)
    assert out.event_type.tolist() == ["view", "click", "view", "signup"]
    assert out.event_id.tolist() == [1, 3, 4, 5]
    base = t0.value // 1000
    assert out.valid_from_us.tolist() == [
        base,
        base + 2_000_000,
        base + 3_000_000,
        base,
    ]
    assert out.valid_to_us[0] == base + 2_000_000
    assert out.valid_to_us[1] == base + 3_000_000
    assert pd.isna(out.valid_to_us[2]) and pd.isna(out.valid_to_us[3])
    # dtype discipline: int64 (nullable ok) for every microsecond column
    assert str(out.valid_from_us.dtype) == "int64"
    assert str(out.valid_to_us.dtype) in ("Int64", "float64", "object")
    non_null = out.valid_to_us.dropna()
    assert all(float(x).is_integer() for x in non_null)
