"""Range-partitioned layout: routing correctness, empty-partition schema
markers, file-level pruning, and exact-row reassembly."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from invoice_ocr_reconciler_ray.stages.bucketing import (
    read_range_pruned,
    write_range_partitioned,
)


def test_range_write_routes_and_prunes(ray_session, tmp_path):
    bounds = [10.0, 20.0, 30.0]
    vals = list(range(40))  # 0..39 -> partitions 0:[0,10) 1:[10,20) 2:[20,30) 3:[30,)
    tbl = pa.table(
        {
            "k": pa.array(vals, pa.int64()),
            "v": pa.array([f"r{v}" for v in vals], pa.string()),
        }
    )
    out = str(tmp_path / "layout")
    write_range_partitioned(
        rd.from_arrow(tbl).repartition(4), key_col="k", boundaries=bounds, out_dir=out
    )
    # all 4 partition dirs exist and carry parquet
    for r in range(4):
        d = os.path.join(out, f"range={r}")
        assert os.path.isdir(d) and os.listdir(d), r
    # partition routing: range=1 holds exactly 10..19
    got = set()
    d = os.path.join(out, f"range=1")
    for f in os.listdir(d):
        got.update(pq.read_table(os.path.join(d, f))["k"].to_pylist())
    assert got == set(range(10, 20))

    # pruned read for [12, 27): only partitions 1 and 2 touched
    ds = read_range_pruned(out, boundaries=bounds, lo=12, hi=27)
    files = set(ds.input_files())
    assert all("range=1" in f or "range=2" in f for f in files), files
    rows = sorted(ds.to_pandas().k.tolist())
    assert rows == list(range(10, 30))  # file-level superset of [12, 27)


def test_range_layout_empty_partition_has_schema(ray_session, tmp_path):
    bounds = [10.0, 20.0]
    tbl = pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": ["a", "b", "c"]})
    out = str(tmp_path / "layout")
    write_range_partitioned(
        rd.from_arrow(tbl), key_col="k", boundaries=bounds, out_dir=out
    )
    # partitions 1 and 2 are empty but readable with the right schema
    # (ds.schema() — Ray's to_pandas() drops columns on fully-empty
    # datasets, a harness quirk, so assert on the Dataset schema)
    ds = read_range_pruned(out, boundaries=bounds, lo=15, hi=25)
    assert ds.count() == 0
    # hive-style dirs surface the partition id as a free column
    assert ds.schema().names == ["k", "v", "range"]
