"""Distributed prefix scan (stages/scan.py) — the running max over a total
order must equal the sequential numpy scan regardless of block layout, and
every bucket boundary must carry the prefix seed across."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def test_running_max_prefix_scan_matches_numpy(ray_session):
    from invoice_ocr_reconciler_ray.stages.scan import running_max

    rng = np.random.RandomState(11)
    n = 3000
    ids = rng.choice(10**6, n, replace=False).astype(np.int64)
    vals = rng.randint(-10**6, 10**6, n).astype(np.int64)
    tbl = pa.table({"oid": pa.array(ids), "v": pa.array(vals)})
    out = (
        running_max(
            rd.from_arrow(tbl).repartition(9),
            order_col="oid",
            value_col="v",
            out_col="rm",
            n_buckets=16,
        )
        .to_pandas()
        .sort_values("oid")
    )
    order = np.argsort(ids)
    want = np.maximum.accumulate(vals[order])
    assert out.rm.tolist() == want.tolist()
    assert out.v.tolist() == vals[order].tolist()  # pass-through column
    assert str(out.rm.dtype) == "int64"


def test_running_max_descending_values_stay_pinned(ray_session):
    """A strictly decreasing series: the running max is the first value
    everywhere — the prefix seed must dominate every later bucket."""
    from invoice_ocr_reconciler_ray.stages.scan import running_max

    n = 500
    tbl = pa.table(
        {
            "oid": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.arange(n, 0, -1, dtype=np.int64)),
        }
    )
    out = (
        running_max(
            rd.from_arrow(tbl).repartition(5),
            order_col="oid",
            value_col="v",
            out_col="rm",
            n_buckets=8,
        )
        .to_pandas()
    )
    assert set(out.rm) == {n}


def test_running_sum_matches_numpy_with_negatives(ray_session):
    from invoice_ocr_reconciler_ray.stages.scan import running_sum

    rng = np.random.RandomState(13)
    n = 2500
    ids = rng.choice(10**6, n, replace=False).astype(np.int64)
    vals = rng.randint(-1000, 1000, n).astype(np.int64)
    tbl = pa.table({"oid": pa.array(ids), "v": pa.array(vals)})
    out = (
        running_sum(
            rd.from_arrow(tbl).repartition(7),
            order_col="oid",
            value_col="v",
            out_col="rs",
            n_buckets=16,
        )
        .to_pandas()
        .sort_values("oid")
    )
    order = np.argsort(ids)
    assert out.rs.tolist() == np.cumsum(vals[order]).tolist()


def test_global_value_rank_and_ntile_match_sequential(ray_session):
    """Value-ordered rank across scattered blocks must equal the sequential
    argsort, and NTILE must follow SQL's first-tiles-get-extras split —
    including heavy ties on the value column (ties → id order)."""
    from invoice_ocr_reconciler_ray.stages.rank import global_value_rank

    rng = np.random.RandomState(17)
    n = 1001  # deliberately not divisible by k
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.randint(0, 50, n).astype(np.int64)  # heavy ties
    tbl = pa.table({"oid": pa.array(ids), "v": pa.array(vals)})
    out = (
        global_value_rank(
            rd.from_arrow(tbl).repartition(7),
            value_col="v",
            id_col="oid",
            out_col="rnk",
            ntile_k=4,
            n_buckets=32,
        )
        .to_pandas()
        .sort_values("rnk")
    )
    order = np.lexsort((ids, vals))
    assert out.oid.tolist() == ids[order].tolist()
    assert out.rnk.tolist() == list(range(1, n + 1))
    # SQL ntile(4) over 1001 rows: tile sizes 251, 250, 250, 250
    sizes = out.tile.value_counts().sort_index().tolist()
    assert sizes == [251, 250, 250, 250]
    # tiles are contiguous in rank order
    assert out.tile.is_monotonic_increasing
