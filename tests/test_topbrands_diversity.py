"""Aggregate-then-rank and windowed COUNT(DISTINCT) — analytic tests: the
broadcast brand probe must drop unknown partkeys (inner-join parity), rank
ties break on brand ASC, and the per-type searchsorted diversity must equal
per-row brute force."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_top_brands_rank_and_unknown_partkey_drop(ray_session, tmp_path):
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_brand": pa.array(["B1", "B2", "B3"]),
        }
    )
    # flag A: B1=300, B2=300 (tie → brand ASC), B3=100; partkey 9 unknown.
    li = pa.table(
        {
            "l_partkey": pa.array([1, 2, 3, 9], pa.int64()),
            "l_returnflag": pa.array(["A", "A", "A", "A"]),
            "l_extendedprice": pa.array([3.0, 3.0, 1.0, 99.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        }
    )
    pq.write_table(part, tmp_path / "part.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import returnflag_top_brands

    out = returnflag_top_brands(str(tmp_path)).to_pandas().sort_values("rn")
    assert list(zip(out.p_brand, out.revenue_cents, out.rn)) == [
        ("B1", 300, 1),
        ("B2", 300, 2),
        ("B3", 100, 3),
    ]


def test_trailing_type_diversity_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    n = 400
    t0 = dt.datetime(2026, 1, 1)
    users = rng.randint(0, 6, n)
    offs = rng.randint(0, 10**7, n)  # spread over ~2.8 h in seconds
    types = rng.choice(["a", "b", "c"], n)
    events = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(users.astype(np.int64)),
            "ts": pa.array(
                [t0 + dt.timedelta(seconds=int(o)) for o in offs], pa.timestamp("us")
            ),
            "event_type": pa.array(types),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        events_trailing_type_diversity,
    )

    out = (
        events_trailing_type_diversity(str(tmp_path))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert len(out) == n
    w = 3600
    for rid in rng.choice(n, 50, replace=False):
        sel = (users == users[rid]) & (offs <= offs[rid]) & (offs > offs[rid] - w)
        assert out.loc[rid, "n_types_1h"] == len(set(types[sel])), rid
