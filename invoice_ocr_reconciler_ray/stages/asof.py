"""As-of join — a custom operator the Dataset API lacks (SURVEY §2.9 class).

Semantics: for every left row, the single right row with the same key and
the greatest ``right_ts`` ≤ ``left_ts`` (backward as-of; ties on the
timestamp broken by the largest tiebreak column — deterministic).  This is
the canonical event-enrichment shape (event → most recent state/order/price
at event time).

Scale shape: both sides are CO-PARTITIONED BY KEY with one union +
``groupby(key)`` shuffle — the standard distributed as-of layout — then a
per-group vectorized searchsorted match over the sorted right timestamps
(O((l+r) log r) per key, pure Arrow/numpy, no pandas).  Partitioning
assumption (documented contract): a single key's rows fit in one group,
i.e. keys are user/customer-grained, not global.  A group larger than
``hot_key_warn_rows`` logs a loud warning (skew diagnostics) but still
completes — the kernel is O(n log n) time / O(n) memory, so degradation is
gradual, not an OOM cliff.  Inner semantics: left rows with no matching
right row are dropped — matches are decided by searchsorted INDEX, never by
null-ness of a carried value, so a legitimately-null right column value
survives (round-2 advisory fix).

Dtype discipline (round-2 verdict fix): every per-group kernel builds its
output as a ``pa.Table`` against a schema captured from the INPUT datasets'
Arrow schemas — the null padding used to co-locate the two sides in one
groupby can never leak an int64→float64 upcast into the output.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

#: groups larger than this log a skew warning (see module docstring)
HOT_KEY_WARN_ROWS = 2_000_000


def _ts_to_i64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp-or-integer column → int64 numpy (µs for timestamps)."""
    np_arr = arr.to_numpy(zero_copy_only=False)
    if np_arr.dtype.kind == "M":
        np_arr = np_arr.astype("datetime64[us]")
    return np_arr.astype("int64")


def _warn_hot_key(n: int, op: str, warn_rows: int) -> None:
    if n > warn_rows:
        logger.warning(
            "%s: hot key group with %d rows (> %d) — a single join key "
            "dominates; consider salting or pre-filtering that key",
            op, n, warn_rows,
        )


def asof_join(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    tiebreak: str,
    direction: str = "backward",
    how: str = "inner",
    hot_key_warn_rows: int = HOT_KEY_WARN_ROWS,
):
    """left(key, left_ts, left_cols) ⋈asof right(key, right_ts, right_cols).

    Returns Dataset(left_cols + right_cols) — one row per matched left row.
    ``key`` names the join key column on BOTH sides (project/rename upstream
    if they differ).  ``direction``:

    - ``"backward"`` — greatest ``right_ts`` ≤ ``left_ts``; equal-timestamp
      ties go to the LARGEST ``tiebreak`` value;
    - ``"forward"`` — smallest ``right_ts`` ≥ ``left_ts``; ties go to the
      SMALLEST ``tiebreak`` (the mirror-image deterministic rule);
    - ``"nearest"`` — whichever of the two candidates is closer in time;
      an exact distance tie prefers the backward row.

    All three share one sorted-right layout per group, so the added
    directions cost one extra ``searchsorted`` — never a second shuffle.

    ``how``: ``"inner"`` drops left rows with no match; ``"left"`` keeps
    them with typed NULL right columns (built directly against the captured
    Arrow schema, so the padding can never upcast — the r2 lesson).
    """
    ltypes = dict(zip(left_ds.schema().names, left_ds.schema().types))
    rtypes = dict(zip(right_ds.schema().names, right_ds.schema().types))
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in left_cols] + [(c, rtypes[c]) for c in right_cols]
    )

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

    def join_group(t: pa.Table) -> pa.Table:
        _warn_hot_key(t.num_rows, f"asof_join[{direction}]", hot_key_warn_rows)
        lmask = pc.equal(t["_side"], 0)
        lt = t.filter(lmask)
        rt = t.filter(pc.invert(lmask))
        if lt.num_rows == 0:
            return out_schema.empty_table()
        if rt.num_rows == 0:
            if how != "left":
                return out_schema.empty_table()
            arrays = [lt[c] for c in left_cols] + [
                pa.nulls(lt.num_rows, rtypes[c]) for c in right_cols
            ]
            return pa.Table.from_arrays(arrays, schema=out_schema)
        # sort right by (_t, tiebreak) ascending: searchsorted side='right'-1
        # lands on the max-tiebreak row among equal timestamps (backward),
        # side='left' on the min-tiebreak row (forward)
        rt = rt.take(
            pc.sort_indices(
                rt, sort_keys=[("_t", "ascending"), (tiebreak, "ascending")]
            )
        )
        rts = _ts_to_i64(rt["_t"])
        lts = _ts_to_i64(lt["_t"])
        back = np.searchsorted(rts, lts, side="right") - 1  # greatest ts <= l
        fwd = np.searchsorted(rts, lts, side="left")  # smallest ts >= l
        if direction == "backward":
            idx, matched = back, back >= 0
        elif direction == "forward":
            matched = fwd < len(rts)
            idx = np.minimum(fwd, len(rts) - 1)
        elif direction == "nearest":
            has_b, has_f = back >= 0, fwd < len(rts)
            db = np.where(has_b, lts - rts[np.maximum(back, 0)], np.iinfo(np.int64).max)
            df = np.where(
                has_f, rts[np.minimum(fwd, len(rts) - 1)] - lts, np.iinfo(np.int64).max
            )
            use_b = np.where(has_b & has_f, db <= df, has_b)  # distance tie → backward
            idx = np.where(use_b, np.maximum(back, 0), np.minimum(fwd, len(rts) - 1))
            matched = has_b | has_f
        else:
            raise ValueError(f"unknown as-of direction: {direction!r}")
        if how == "left":
            # null take-indices yield typed nulls for unmatched left rows
            ridx = pa.array(np.where(matched, idx, 0), mask=~matched)
            arrays = [lt[c] for c in left_cols] + [
                rt[c].take(ridx) for c in right_cols
            ]
            return pa.Table.from_arrays(arrays, schema=out_schema)
        lt = lt.filter(pa.array(matched))
        ridx = pa.array(idx[matched])
        arrays = [lt[c] for c in left_cols] + [rt[c].take(ridx) for c in right_cols]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return both.groupby("_k").map_groups(join_group, batch_format="pyarrow")


def asof_join_backward(left_ds, right_ds, **kw):
    """Back-compat alias for the original backward-only entry point."""
    return asof_join(left_ds, right_ds, direction="backward", **kw)


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
    hot_key_warn_rows: int = HOT_KEY_WARN_ROWS,
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
    ltypes = dict(zip(left_ds.schema().names, left_ds.schema().types))
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in left_cols] + [(out_col, pa.int64())]
    )

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

    def count_group(t: pa.Table) -> pa.Table:
        _warn_hot_key(t.num_rows, "range_join_count", hot_key_warn_rows)
        lmask = pc.equal(t["_side"], 0)
        lt = t.filter(lmask)
        if lt.num_rows == 0:
            return out_schema.empty_table()
        rts = np.sort(_ts_to_i64(t.filter(pc.invert(lmask))["_t"]))
        lts = _ts_to_i64(lt["_t"])
        hi = np.searchsorted(rts, lts, side="right")
        lo = np.searchsorted(rts, lts - window_us, side="right")
        arrays = [lt[c] for c in left_cols] + [pa.array((hi - lo).astype("int64"))]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return both.groupby("_k").map_groups(count_group, batch_format="pyarrow")


def range_join_multi_count(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    windows_us: dict[str, int],
    hot_key_warn_rows: int = HOT_KEY_WARN_ROWS,
):
    """Multi-horizon trailing-window counts — the feature-generation form of
    :func:`range_join_count`: for every left row, one int64 column per named
    window with the number of same-key right rows in ``(left_ts - w,
    left_ts]``.

    All horizons share ONE co-partition shuffle and ONE sorted right
    timestamp array per group; each extra window costs exactly one more
    vectorized ``searchsorted`` (the upper bound is computed once).  This is
    how activity features at 7/30/90-day horizons should be produced — never
    as three separate range joins."""
    ltypes = dict(zip(left_ds.schema().names, left_ds.schema().types))
    wnames = list(windows_us)
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in left_cols] + [(w, pa.int64()) for w in wnames]
    )

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

    def count_group(t: pa.Table) -> pa.Table:
        _warn_hot_key(t.num_rows, "range_join_multi_count", hot_key_warn_rows)
        lmask = pc.equal(t["_side"], 0)
        lt = t.filter(lmask)
        if lt.num_rows == 0:
            return out_schema.empty_table()
        rts = np.sort(_ts_to_i64(t.filter(pc.invert(lmask))["_t"]))
        lts = _ts_to_i64(lt["_t"])
        hi = np.searchsorted(rts, lts, side="right")
        arrays = [lt[c] for c in left_cols]
        for w in wnames:
            lo = np.searchsorted(rts, lts - windows_us[w], side="right")
            arrays.append(pa.array((hi - lo).astype("int64")))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return both.groupby("_k").map_groups(count_group, batch_format="pyarrow")


def range_join_multi_sum(
    left_ds,
    right_ds,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    measure: str,
    windows_us: dict[str, int],
    hot_key_warn_rows: int = HOT_KEY_WARN_ROWS,
):
    """Trailing-window SUM of an int64 right-side ``measure`` — the
    RANGE-frame *value* companion of :func:`range_join_multi_count` (``SUM(x)
    OVER (PARTITION BY key ORDER BY ts RANGE w PRECEDING)`` semantics: the
    window is ``(left_ts - w, left_ts]``, timestamp peers included).

    Same single co-partition layout: one sorted right timestamp array AND one
    prefix-sum of the time-ordered measure per group; every window's sum is
    two ``searchsorted`` probes and a prefix difference — adding a horizon
    never adds a join.  The measure must already be an exact integer (cents /
    counts); float measures would make the prefix sums order-dependent."""
    ltypes = dict(zip(left_ds.schema().names, left_ds.schema().types))
    wnames = list(windows_us)
    out_schema = pa.schema(
        [(c, ltypes[c]) for c in left_cols] + [(w, pa.int64()) for w in wnames]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t[key], t[left_ts], pa.array([0] * n, pa.int8()),
                  pa.nulls(n, pa.int64())]
        names = ["_k", "_t", "_side", "_m"]
        for c in left_cols:
            arrays.append(t[c])
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [t[key], t[right_ts], pa.array([1] * n, pa.int8()),
                  pc.cast(t[measure], pa.int64())]
        names = ["_k", "_t", "_side", "_m"]
        for c in left_cols:
            arrays.append(pa.nulls(n, ltypes[c]))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )

    def sum_group(t: pa.Table) -> pa.Table:
        _warn_hot_key(t.num_rows, "range_join_multi_sum", hot_key_warn_rows)
        lmask = pc.equal(t["_side"], 0)
        lt = t.filter(lmask)
        if lt.num_rows == 0:
            return out_schema.empty_table()
        rt = t.filter(pc.invert(lmask))
        rts = _ts_to_i64(rt["_t"])
        order = np.argsort(rts, kind="stable")
        rts = rts[order]
        m = rt["_m"].combine_chunks().to_numpy(zero_copy_only=False)[order]
        prefix = np.concatenate([[0], np.cumsum(m, dtype=np.int64)])
        lts = _ts_to_i64(lt["_t"])
        hi = np.searchsorted(rts, lts, side="right")
        arrays = [lt[c] for c in left_cols]
        for w in wnames:
            lo = np.searchsorted(rts, lts - windows_us[w], side="right")
            arrays.append(pa.array(prefix[hi] - prefix[lo]))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return both.groupby("_k").map_groups(sum_group, batch_format="pyarrow")
