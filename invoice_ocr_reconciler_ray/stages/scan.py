"""Distributed prefix scan — running aggregates over a TOTAL ORDER.

A running max/min over ``ORDER BY k ROWS UNBOUNDED PRECEDING`` has a
sequential dependency a per-block map can't express and a groupby can't
order.  The classic two-phase scan parallelizes it exactly:

1. range-bucket the order key (dense int64 ids → ``B`` contiguous ranges,
   so bucket order IS key order),
2. per-bucket partial aggregates (one narrow map + an O(B) collect),
3. the driver folds the B partials into per-bucket PREFIX seeds
   (aggregate of all earlier buckets) and broadcasts them once,
4. each bucket computes its local running aggregate seeded by its prefix —
   embarrassingly parallel again.

The shuffle carries (bucket, order, value) only; driver memory is O(B).
This mirrors ``stages/rank.py:global_rank`` (prefix COUNT offsets); here the
folded quantity is an extremum, which is what event-time WATERMARKS are:
``wm_i = max(ts_j : arrival_j <= arrival_i)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Max, Min


def running_max(
    ds,
    *,
    order_col: str,
    value_col: str,
    out_col: str = "running_max",
    n_buckets: int = 64,
):
    """Dataset → Dataset with ``out_col`` = max of ``value_col`` over all
    rows whose ``order_col`` ≤ this row's (current row INCLUDED — the
    ``ROWS UNBOUNDED PRECEDING AND CURRENT ROW`` frame).  Both columns must
    be int64-like and non-null; ``order_col`` values must be unique (a
    dense id).  Other columns pass through unchanged."""
    mm = ds.aggregate(Min(order_col), Max(order_col))
    lo = int(mm[f"min({order_col})"])
    hi = int(mm[f"max({order_col})"])
    span = max(1, hi - lo + 1)

    def tag(t: pa.Table) -> pa.Table:
        oc = t[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (oc.astype(np.int64) - lo) * n_buckets // span
        return t.append_column("_b", pa.array(b.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def bucket_max(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"_b": t["_b"], "v": t[value_col]})
            .group_by("_b")
            .aggregate([("v", "max")])
        )
        return g.rename_columns(["_b", "vmax"])

    parts = (
        tagged.map_batches(bucket_max, batch_format="pyarrow")
        .groupby("_b")
        .aggregate(Max("vmax", alias_name="vmax"))
        .take_all()
    )
    bmax = {int(r["_b"]): int(r["vmax"]) for r in parts}
    prefix: dict[int, int | None] = {}
    cur: int | None = None
    for b in range(n_buckets):
        prefix[b] = cur
        if b in bmax:
            cur = bmax[b] if cur is None else max(cur, bmax[b])
    pref_ref = ray.put(prefix)

    def scan_group(g: pa.Table) -> pa.Table:
        b = g["_b"][0].as_py()
        s = g.take(pc.sort_indices(g, sort_keys=[(order_col, "ascending")]))
        v = s[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        rm = np.maximum.accumulate(v.astype(np.int64))
        seed = ray.get(pref_ref)[b]
        if seed is not None:
            rm = np.maximum(rm, seed)
        out = s.drop_columns(["_b"])
        return out.append_column(out_col, pa.array(rm, pa.int64()))

    return tagged.groupby("_b").map_groups(scan_group, batch_format="pyarrow")


def running_sum(
    ds,
    *,
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    n_buckets: int = 64,
):
    """Dataset → Dataset with ``out_col`` = Σ of ``value_col`` over all rows
    whose ``order_col`` ≤ this row's (current row included) — the global
    CUMULATIVE aggregate (``SUM() OVER (ORDER BY k ROWS UNBOUNDED
    PRECEDING)``), same two-phase scan as :func:`running_max` with the
    bucket fold being addition.  ``value_col`` must be exact int64 (cents /
    counts) so bucket-order addition is bit-exact."""
    mm = ds.aggregate(Min(order_col), Max(order_col))
    lo = int(mm[f"min({order_col})"])
    hi = int(mm[f"max({order_col})"])
    span = max(1, hi - lo + 1)

    def tag(t: pa.Table) -> pa.Table:
        oc = t[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (oc.astype(np.int64) - lo) * n_buckets // span
        return t.append_column("_b", pa.array(b.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def bucket_sum(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"_b": t["_b"], "v": t[value_col]})
            .group_by("_b")
            .aggregate([("v", "sum")])
        )
        return g.rename_columns(["_b", "vsum"])

    from ray.data.aggregate import Sum as _Sum

    parts = (
        tagged.map_batches(bucket_sum, batch_format="pyarrow")
        .groupby("_b")
        .aggregate(_Sum("vsum", alias_name="vsum"))
        .take_all()
    )
    bsum = {int(r["_b"]): int(r["vsum"]) for r in parts}
    prefix: dict[int, int] = {}
    cur = 0
    for b in range(n_buckets):
        prefix[b] = cur
        cur += bsum.get(b, 0)
    pref_ref = ray.put(prefix)

    def scan_group(g: pa.Table) -> pa.Table:
        b = g["_b"][0].as_py()
        s = g.take(pc.sort_indices(g, sort_keys=[(order_col, "ascending")]))
        v = s[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        rs = np.cumsum(v.astype(np.int64)) + ray.get(pref_ref)[b]
        out = s.drop_columns(["_b"])
        return out.append_column(out_col, pa.array(rs, pa.int64()))

    return tagged.groupby("_b").map_groups(scan_group, batch_format="pyarrow")
