"""LSH ANN (recall + full-probe exactness), hourly distinct users, and the
cohort retention matrix."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from invoice_ocr_reconciler_ray.stages.ann import brute_force_topk, lsh_topk


def test_lsh_topk_recall_on_planted_neighbors(ray_session):
    """LSH recall is meaningful when true neighbors are actually CLOSE (the
    collision probability is 1 - theta/pi per plane): plant 10 small
    perturbations of each query among gaussian noise — radius-1 multi-probe
    over 8 planes must recover most of them.  On pure gaussian data the
    'top-10' are near-orthogonal strangers and ANY bucketed method degrades
    — that regime is covered by the full-probe exactness test instead."""
    rng = np.random.RandomState(17)
    noise = rng.standard_normal((300, 16))
    qs = rng.standard_normal((3, 16))
    rows = []
    vid = 0
    planted: dict[int, set] = {0: set(), 1: set(), 2: set()}
    for qi in range(3):
        for _ in range(10):
            v = qs[qi] + 0.08 * rng.standard_normal(16)  # cos ~ 0.97
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            planted[qi].add(vid)
            vid += 1
    for n in noise:
        rows.append({"vec_id": vid, "embedding": n.tolist()})
        vid += 1
    ds = rd.from_items(rows)
    approx = lsh_topk(
        ds, [0, 1, 2], qs, k=10, n_planes=8, max_hamming=1
    ).to_pandas()
    for qi in range(3):
        got = set(approx[approx.query_id == qi].vec_id)
        assert len(got & planted[qi]) / 10 >= 0.6, qi


def test_lsh_fullprobe_equals_bruteforce(ray_session):
    """max_hamming = n_planes ⇒ every bucket allowed ⇒ LSH must reproduce
    exact brute force bit-for-bit — the analytic basis of the
    ann_lsh_exact_fullprobe oracle."""
    rng = np.random.RandomState(23)
    emb = rng.standard_normal((250, 16))
    ds = rd.from_items(
        [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(250)]
    )
    q = emb[:3]
    exact = (
        brute_force_topk(ds, [0, 1, 2], q, k=10)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    full = (
        lsh_topk(ds, [0, 1, 2], q, k=10, n_planes=8, max_hamming=8)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert full.equals(exact)


def test_hourly_distinct_users(ray_session, tmp_path):
    t0 = pd.Timestamp("2024-01-01 10:00:00")
    h = pd.Timedelta(hours=1)
    m = pd.Timedelta(minutes=10)
    events = pa.table(
        {
            "event_id": pa.array(list(range(6)), pa.int64()),
            "user_id": pa.array([1, 1, 2, 3, 1, 1], pa.int64()),
            "ts": pa.array([t0, t0 + m, t0 + 2 * m, t0 + h, t0 + h + m, t0 + h + 2 * m]),
            "event_type": ["a"] * 6,
            "value": pa.array([0.0] * 6),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        events_hourly_distinct_users,
    )

    out = (
        events_hourly_distinct_users(str(tmp_path))
        .to_pandas()
        .set_index("hour_us")
        .sort_index()
    )
    hour0 = (t0.value // 1000) // 3_600_000_000 * 3_600_000_000
    assert out.loc[hour0].n_users == 2  # users 1, 2 (1 deduped)
    assert out.loc[hour0 + 3_600_000_000].n_users == 2  # users 3, 1
    assert str(out.n_users.dtype) == "int64"


def test_user_cohorts_matrix(ray_session, tmp_path):
    d0 = pd.Timestamp("2024-01-01")
    day = pd.Timedelta(days=1)
    # user 1 first seen day0, active day0+day2; user 2 first seen day0;
    # user 3 first seen day2, active day2 only
    events = pa.table(
        {
            "event_id": pa.array(list(range(5)), pa.int64()),
            "user_id": pa.array([1, 2, 1, 3, 1], pa.int64()),
            "ts": pa.array([d0, d0, d0 + 2 * day, d0 + 2 * day, d0 + 2 * day]),
            "event_type": ["a"] * 5,
            "value": pa.array([0.0] * 5),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_user_cohorts

    out = events_user_cohorts(str(tmp_path)).to_pandas()
    day0 = (d0.value // 1000) // 86_400_000_000
    got = {
        (r.cohort_day, r.activity_day): r.n_users for r in out.itertuples()
    }
    assert got == {
        (day0, day0): 2,  # users 1, 2 on their cohort day
        (day0, day0 + 2): 1,  # user 1 retained (dup event deduped)
        (day0 + 2, day0 + 2): 1,  # user 3's own cohort
    }
    assert str(out.n_users.dtype) == "int64"
