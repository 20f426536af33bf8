"""Edge-case unit tests for the round-4 continuation-3 registry ops —
crafted micro-fixtures pinning kernel corner behavior (bucket boundaries,
tie orders, window-edge inclusivity) that the synthetic-table oracles never
isolate.  Full-scale correctness is the DuckDB oracle sweep."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

SEC = 1_000_000
DAY_US = 86_400_000_000


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


def _rows(res):
    return res.to_pylist() if isinstance(res, pa.Table) else res.take_all()


def test_gorilla_dod_bucket_boundaries(tmp_path):
    # seconds chosen so DoD hits exactly: 0 (zero), 64 (bits7 upper), -63
    # (bits7 lower), 65 (bits9), 2049 (bits32 lower escape)
    sec = [0, 10, 20, 30, 104, 115, 191, 332, 473, 5000]
    # d:  10 10 10 74  11  76 141 141 4527 → dod: 0, 0, 64, -63, 65, 65, 0, 4386
    sf = _write_events(
        tmp_path,
        event_id=list(range(len(sec))),
        ts_us=[s * SEC for s in sec],
        user_id=[1] * len(sec),
    )
    got = {r["bucket"]: r["n"] for r in _rows(Q.events_ts_gorilla_dod_census(sf))}
    d = np.diff(sec)
    dod = np.diff(d)
    assert got.get("zero", 0) == int((dod == 0).sum())
    assert got.get("bits7", 0) == int(((dod != 0) & (dod >= -63) & (dod <= 64)).sum())
    assert sum(got.values()) == len(sec) - 2


def test_cdc_chunk_census_short_doc(tmp_path):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["abc", "the quick brown fox jumps over it"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r["doc_id"]: r for r in _rows(Q.docs_cdc_chunk_census(str(tmp_path)))}
    assert rows[1]["n_cuts"] == 0 and rows[1]["n_chunks"] == 1  # len < 4
    # reference recompute of the stencil
    a = np.frombuffer(b"the quick brown fox jumps over it", dtype=np.uint8).astype(np.int64)
    h = a[:-3] + 3 * a[1:-2] + 9 * a[2:-1] + 27 * a[3:]
    assert rows[2]["n_cuts"] == int((h % 16 == 15).sum())


def test_hindex_kernel(tmp_path):
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                "o_totalprice": pa.array([100.0, 200.0, 300.0, 50.0], pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    got = {r["h"]: r["n_customers"] for r in _rows(Q.customer_order_hindex_census(str(tmp_path)))}
    # cust 1: hundreds [3,2,1] → h=2; cust 2: hundreds [0] → h=0
    assert got == {2: 1, 0: 1}


def test_type_recurrence_median_same_ts_tiebreak(tmp_path):
    # two 'a' events at identical ts → gap 0 via event_id order
    sf = _write_events(
        tmp_path,
        event_id=[1, 2, 3],
        ts_us=[100 * SEC, 100 * SEC, 400 * SEC],
        user_id=[5, 5, 5],
        event_type=["a", "a", "a"],
    )
    rows = _rows(Q.events_type_recurrence_median(sf))
    assert rows == [{"event_type": "a", "n_gaps": 2, "median_gap_us": 0}]


def test_rapid_reorder_window_edges(tmp_path):
    base = 10_000 * DAY_US
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 1], pa.int64()),
                "o_orderdate": pa.array(
                    np.array([base, base + 7 * DAY_US, base + 8 * DAY_US, base + 30 * DAY_US], "int64"),
                    pa.timestamp("us"),
                ),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    got = {r["gap_days"]: r["n_pairs"] for r in _rows(Q.orders_rapid_reorder_pairs(str(tmp_path)))}
    # pairs: (d0,d7)=7 in; (d7,d8)=1 in; (d0,d8)=8 out; rest out
    assert got == {7: 1, 1: 1}


def test_skip2_matrix_kernel(tmp_path):
    sf = _write_events(
        tmp_path,
        event_id=[1, 2, 3, 4],
        ts_us=[10, 20, 30, 40],
        user_id=[1] * 4,
        event_type=["a", "b", "a", "c"],
    )
    got = {(r["type_a"], r["type_c"]): r["n"] for r in _rows(Q.events_type_skip2_matrix(sf))}
    assert got == {("a", "a"): 1, ("b", "c"): 1}


def test_first_precedence_equal_ts_uses_event_id(tmp_path):
    sf = _write_events(
        tmp_path,
        event_id=[2, 1],
        ts_us=[50, 50],
        user_id=[9, 9],
        event_type=["x", "y"],
    )
    rows = _rows(Q.events_type_first_precedence_matrix(sf))
    # event_id 1 is 'y' → y strictly precedes x at equal ts
    assert rows == [{"type_a": "y", "type_b": "x", "n_users": 1}]


def test_funnel_sweep_boundary_inclusive(tmp_path):
    # purchase exactly 3600 s after signup counts for the 1 h window
    sf = _write_events(
        tmp_path,
        event_id=[1, 2],
        ts_us=[0, 3600 * SEC],
        user_id=[1, 1],
        event_type=["signup", "purchase"],
    )
    rows = {r["window_sec"]: r for r in _rows(Q.events_funnel_timeout_sweep(sf))}
    assert rows[3600]["n_converted"] == 1
    assert rows[3600]["n_signup_users"] == 1


def test_reshard_movement_range_beats_mod(tmp_path):
    pq.write_table(
        pa.table({"doc_id": pa.array(list(range(600)), pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    got = {r["scheme"]: r for r in _rows(Q.docs_reshard_movement_audit(str(tmp_path)))}
    assert got["mod"]["n_moved"] > got["range"]["n_moved"]
    assert got["mod"]["n_docs"] == 600


def test_float_cents_drift_detects_representation(tmp_path):
    # 0.29 * 100 = 28.999999... in IEEE → trunc 28 vs floor+0.5 29
    pq.write_table(
        pa.table(
            {
                "o_orderstatus": pa.array(["O", "O"], pa.string()),
                "o_totalprice": pa.array([0.29, 2.0], pa.float64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    rows = _rows(Q.orders_float_cents_drift_audit(str(tmp_path)))
    assert rows[0]["n_rows"] == 2 and rows[0]["n_drift"] == 1
