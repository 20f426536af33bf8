"""As-of join — a custom operator the Dataset API lacks (SURVEY §2.9 class).

Semantics: for every left row, the single right row with the same key and
the greatest ``right_ts`` ≤ ``left_ts`` (backward as-of; ties on the
timestamp broken by the largest tiebreak column — deterministic).  This is
the canonical event-enrichment shape (event → most recent state/order/price
at event time).

Scale shape: both sides are CO-PARTITIONED BY KEY with one union +
``groupby(key)`` shuffle — the standard distributed as-of layout — then a
per-group sorted ``pandas.merge_asof`` (the group is one key's rows on both
sides; ordering is an explicit in-group sort, never an arrival-order
assumption).  Partitioning assumption (documented contract): a single key's
rows fit in one group, i.e. keys are user/customer-grained, not global.
Inner semantics: left rows with no matching right row are dropped (keeps
the output schema null-free and oracle-exact)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def asof_join_backward(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    tiebreak: str,
):
    """left(key, left_ts, left_cols) ⋈asof right(key, right_ts, right_cols).

    Returns Dataset(left_cols + right_cols) — one row per matched left row.
    ``tiebreak`` must be one of ``right_cols``; among right rows sharing the
    as-of timestamp the largest tiebreak value wins.  ``key`` names the join
    key column on BOTH sides (project/rename upstream if they differ).
    """
    ltypes = dict(zip(left_ds.schema().names, left_ds.schema().types))
    rtypes = dict(zip(right_ds.schema().names, right_ds.schema().types))

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t[key], t[left_ts], pa.array([0] * n, pa.int8())]
        names = ["_k", "_t", "_side"]
        for c in left_cols:
            arrays.append(t[c])
            names.append(c)
        for c in right_cols:
            arrays.append(pa.nulls(n, rtypes[c]))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t[key], t[right_ts], pa.array([1] * n, pa.int8())]
        names = ["_k", "_t", "_side"]
        for c in left_cols:
            arrays.append(pa.nulls(n, ltypes[c]))
            names.append(c)
        for c in right_cols:
            arrays.append(t[c])
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def join_group(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df._side == 0].sort_values("_t", kind="mergesort")
        right = df[df._side == 1].sort_values(["_t", tiebreak], kind="mergesort")
        if left.empty or right.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype=df[c].dtype) for c in left_cols + right_cols}
            )
        merged = pd.merge_asof(
            left[["_t"] + left_cols],
            right[["_t"] + right_cols],
            on="_t",
            direction="backward",  # greatest right_ts <= left_ts; among equal
            # timestamps merge_asof keeps the LAST right row, which the sort
            # above makes the max-tiebreak one — deterministic
        )
        merged = merged.dropna(subset=[right_cols[0]])  # inner semantics
        for c in right_cols:  # undo merge_asof's NaN-driven float upcast
            merged[c] = merged[c].astype(right[c].dtype)
        return merged[left_cols + right_cols]

    return both.groupby("_k").map_groups(join_group, batch_format="pandas")


def range_join_count(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    window_us: int,
    out_col: str = "n_in_window",
):
    """Trailing-window range join, reduced to a count: for every left row,
    how many right rows share its key with ``left_ts - window < right_ts <=
    left_ts``.  The canonical activity-feature shape (events ⋈ orders in the
    last N days).

    Same co-partition layout as :func:`asof_join_backward` (one union +
    ``groupby(key)`` shuffle); inside each group the count is TWO vectorized
    ``searchsorted`` probes over the sorted right timestamps — O((l+r) log r)
    per key, never the O(l·r) interval blow-up.  Every left row is kept
    (count 0 when no right rows match)."""
    import numpy as np

    ltypes = dict(zip(left_ds.schema().names, left_ds.schema().types))

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t[key], t[left_ts], pa.array([0] * n, pa.int8())]
        names = ["_k", "_t", "_side"]
        for c in left_cols:
            arrays.append(t[c])
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t[key], t[right_ts], pa.array([1] * n, pa.int8())]
        names = ["_k", "_t", "_side"]
        for c in left_cols:
            arrays.append(pa.nulls(n, ltypes[c]))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def count_group(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df._side == 0]
        if left.empty:
            return pd.DataFrame(
                {**{c: pd.Series(dtype=df[c].dtype) for c in left_cols},
                 out_col: pd.Series(dtype="int64")}
            )
        rts = np.sort(df[df._side == 1]["_t"].to_numpy().astype("datetime64[us]").astype("int64"))
        lts = left["_t"].to_numpy().astype("datetime64[us]").astype("int64")
        hi = np.searchsorted(rts, lts, side="right")
        lo = np.searchsorted(rts, lts - window_us, side="right")
        out = left[left_cols].copy()
        out[out_col] = (hi - lo).astype("int64")
        return out

    return both.groupby("_k").map_groups(count_group, batch_format="pandas")
