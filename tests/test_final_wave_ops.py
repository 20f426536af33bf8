"""Edge-case unit tests for the round-4 final-wave registry ops — crafted
micro-fixtures exercising the kernel branches the synthetic-table oracles
never hit (single-row groups, constant series, interpolation interiors,
all-equal pair explosions).  The full-scale correctness gate is the DuckDB
oracle sweep; these pin the algorithmic corner behavior."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from invoice_ocr_reconciler_ray.pipelines import queries as Q


def _write_events(tmp, *, event_id, ts_us, user_id, event_type=None, value=None):
    cols = {
        "event_id": pa.array(event_id, pa.int64()),
        "ts": pa.array(np.array(ts_us, "int64"), pa.timestamp("us")),
        "user_id": pa.array(user_id, pa.int64()),
    }
    if event_type is not None:
        cols["event_type"] = pa.array(event_type, pa.string())
    if value is not None:
        cols["value"] = pa.array(value, pa.float64())
    pq.write_table(pa.table(cols), str(tmp / "events.parquet"))
    return str(tmp)


HOUR = 3_600_000_000
DAY = 86_400_000_000


def test_stock_span_crafted(tmp_path):
    sf = _write_events(
        tmp_path,
        event_id=[1, 2, 3, 4, 5],
        ts_us=[10, 20, 30, 40, 50],
        user_id=[7] * 5,
        value=[5.0, 3.0, 4.0, 6.0, 1.0],
    )
    out = Q.events_user_stock_span(sf).to_pandas().sort_values("event_id")
    assert out.span.tolist() == [1, 1, 2, 4, 1]


def test_lis_crafted_and_singleton(tmp_path):
    sf = _write_events(
        tmp_path,
        event_id=[1, 2, 3, 4, 5, 6],
        ts_us=[10, 20, 30, 40, 50, 10],
        user_id=[7, 7, 7, 7, 7, 9],
        value=[3.0, 1.0, 2.0, 5.0, 4.0, 1.0],
    )
    out = Q.events_user_lis_len(sf).to_pandas().set_index("user_id")
    assert out.loc[7, "lis_len"] == 3  # 1,2,5 (or 1,2,4)
    assert out.loc[9, "lis_len"] == 1  # single event


def test_kadane_constant_series_is_zero(tmp_path):
    sf = _write_events(
        tmp_path,
        event_id=[1, 2, 3],
        ts_us=[10, 20, 30],
        user_id=[7] * 3,
        value=[10.0, 10.0, 10.0],
    )
    out = Q.events_user_max_subarray(sf).to_pandas()
    assert out.max_run_cents.tolist() == [0]  # all deviations are zero


def test_running_distinct_types_crafted(tmp_path):
    sf = _write_events(
        tmp_path,
        event_id=[1, 2, 3, 4],
        ts_us=[10, 20, 30, 40],
        user_id=[7] * 4,
        event_type=["a", "b", "a", "c"],
    )
    out = (
        Q.events_user_running_distinct_types(sf).to_pandas().sort_values("event_id")
    )
    assert out.distinct_types_so_far.tolist() == [1, 2, 2, 3]


def test_interp_fill_linear_interior(tmp_path):
    # one event at hour 0 (value 3.00) and one at hour 3 (value 6.00):
    # hours 1 and 2 must interpolate to 400 / 500 cents exactly
    sf = _write_events(
        tmp_path,
        event_id=[1, 2],
        ts_us=[0, 3 * HOUR],
        user_id=[7, 7],
        event_type=["click", "click"],
        value=[3.0, 6.0],
    )
    out = Q.events_hourly_interp_fill(sf).to_pandas().sort_values("hour")
    assert out.cents.tolist() == [300, 400, 500, 600]
    assert out.interpolated.tolist() == [False, True, True, False]


def test_decayed_value_integer_halving(tmp_path):
    # event B is exactly 2 weeks older than the max-ts event A:
    # A contributes cents>>0, B cents>>2
    sf = _write_events(
        tmp_path,
        event_id=[1, 2],
        ts_us=[14 * DAY, 0],
        user_id=[7, 7],
        value=[4.0, 4.0],
    )
    out = Q.events_user_decayed_value(sf).to_pandas()
    assert out.decayed_sum_cents.tolist() == [400 + 100]


def test_repeated_value_pairs_triple(tmp_path):
    # three identical-cents events for one user → all three ordered pairs
    sf = _write_events(
        tmp_path,
        event_id=[1, 2, 3, 4],
        ts_us=[10, 20, 30, 40],
        user_id=[7, 7, 7, 7],
        value=[2.0, 2.0, 2.0, 9.0],
    )
    out = Q.events_repeated_value_pairs(sf).to_pandas()
    pairs = sorted(map(tuple, out[["e1", "e2"]].to_numpy().tolist()))
    assert pairs == [(1, 2), (1, 3), (2, 3)]
    assert sorted(out.gap_us.tolist()) == [10, 10, 20]


def test_hourly_peaks_strictness(tmp_path):
    # plateau (2,2) must NOT count as a peak; isolated spike must
    counts = {0: 1, 1: 2, 2: 2, 3: 1, 4: 5, 5: 1}
    eid, ts, uid, typ = [], [], [], []
    k = 1
    for h, n in counts.items():
        for _ in range(n):
            eid.append(k)
            ts.append(h * HOUR + k)
            uid.append(1)
            typ.append("x")
            k += 1
    sf = _write_events(tmp_path, event_id=eid, ts_us=ts, user_id=uid, event_type=typ)
    out = Q.events_hourly_peaks(sf).to_pandas()
    assert out.n_peaks.tolist() == [1]
    assert out.first_peak_hour.tolist() == [4]


def test_rfm_tiles_distinct_values(tmp_path):
    # five customers, strictly increasing recency/frequency/monetary →
    # each dimension's NTILE(5) is a permutation of 1..5
    n = 5
    rows = []
    for c in range(1, n + 1):
        # customer c has c orders; latest order day = 100 + c; price 100*c
        for k in range(c):
            rows.append((c, (100 + c - k) * DAY, 100.0 * c))
    okeys = list(range(1, len(rows) + 1))
    tbl = pa.table(
        {
            "o_orderkey": pa.array(okeys, pa.int64()),
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderdate": pa.array(
                np.array([r[1] for r in rows], "int64"), pa.timestamp("us")
            ),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    out = Q.customer_rfm_scores(str(tmp_path)).to_pandas().sort_values("c_custkey")
    assert sorted(out.r_tile.tolist()) == [1, 2, 3, 4, 5]
    assert sorted(out.f_tile.tolist()) == [1, 2, 3, 4, 5]
    assert sorted(out.m_tile.tolist()) == [1, 2, 3, 4, 5]
    # more orders (higher f) pairs with larger monetary by construction
    assert out.f_tile.tolist() == out.m_tile.tolist()


def test_open_concurrency_triangle(tmp_path):
    # three orders on days 0, 10, 50 with 30-day spans: days 10–29 hold two
    # open orders (peak 2 at first overlap day 10)
    tbl = pa.table(
        {
            "o_orderdate": pa.array(
                np.array([0, 10 * DAY, 50 * DAY], "int64"), pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    out = Q.orders_open_concurrency(str(tmp_path)).to_pandas()
    assert out.peak_concurrency.tolist() == [2]
    assert out.peak_day_epoch.tolist() == [10]
