"""Time-weighted value integral and schema-evolution union — analytic tests:
the TWA integral against a hand-computed piecewise-constant area (incl. the
single-event degenerate), and union-by-name's typed null-fill (the int64
column must never degrade to float64 through the padded union)."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq


def test_time_weighted_value_hand_area(ray_session, tmp_path):
    # user 1: value 2.00 for 10 s, then 4.00 for 5 s, then last point (no
    # duration) → numerator = 200*10e6 + 400*5e6 ; span 15e6 µs.
    # user 2: single event → 0 / 0.
    t0 = dt.datetime(2026, 1, 1)
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [
                    t0,
                    t0 + dt.timedelta(seconds=10),
                    t0 + dt.timedelta(seconds=15),
                    t0,
                ],
                pa.timestamp("us"),
            ),
            "value": pa.array([2.00, 4.00, 9.99, 5.0]),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        events_user_time_weighted_value,
    )

    out = events_user_time_weighted_value(str(tmp_path)).to_pandas()
    got = {
        r.user_id: (r.weighted_cents_us, r.span_us)
        for r in out.itertuples(index=False)
    }
    assert got == {
        1: (200 * 10_000_000 + 400 * 5_000_000, 15_000_000),
        2: (0, 0),
    }
    assert str(out.weighted_cents_us.dtype) == "int64"


def test_union_by_name_keeps_int64_through_null_fill(ray_session, tmp_path):
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "event_type": pa.array(["a", "b", "a", "b"]),
            "value": pa.array([1.50, 2.00, 3.25, 4.00]),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_union_by_name

    ds = events_union_by_name(str(tmp_path))
    # typed schema must survive the padded union end-to-end
    sch = dict(zip(ds.schema().names, [str(t) for t in ds.schema().types]))
    assert sch["value_cents"] == "int64"
    out = ds.to_pandas()
    got = {
        r.event_type: (r.value_cents, r.n_with_value, r.n_rows)
        for r in out.itertuples(index=False)
    }
    # odd event_ids (1, 3) feed the value side under the "(none)" sentinel;
    # even ids (2, 4) — both type "b" — carry only their type.
    assert got == {
        "(none)": (150 + 325, 2, 2),
        "b": (0, 0, 2),
    }
