"""OHLC time-bucket bars — arg-min/arg-max aggregation over a time series.

The classic financial "candlestick" reduction (open = value at the earliest
timestamp in the bucket, close = at the latest, high/low = extremes) is the
canonical *selection* aggregate: unlike a SUM it never adds floats, so the
result is bit-exact under any reduction order.  Ray-first layout: each block
reduces to at most one partial row per bucket it touches (a numpy
lexsort + ``reduceat`` kernel — no Python loop over rows), and the tiny
partial table (buckets × blocks rows) merges on the driver, so the plan is
ONE shuffle-free ``map_batches`` — the same partial/driver-merge shape as
``stages/dedup.compute_winner_map``.  Ties on the timestamp are broken by
``id_col`` so open/close are deterministic under duplicate timestamps.

Reference parity: the reference's dashboard computes per-period order
aggregates (reference/backend/server.js:516-560, stats endpoint); this
stage generalizes that to the first/last-by-ordering aggregate family
(DuckDB ``arg_min``/``arg_max``).

Scale notes: partial size is O(buckets · blocks) regardless of row count —
hourly bars over a year of 100 TB of events is ~8.8k buckets; the driver
merge is trivially small.  If the bucket domain itself were huge (per-second
bars over years) the same partial feeds a ``groupby(bucket)`` merge instead;
the per-block kernel is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _block_ohlc(
    t: pa.Table, *, ts_col: str, id_col: str, value_col: str, bucket_us: int
) -> pa.Table:
    """One partial row per bucket present in the block: the bucket's
    (open_ts, open_id, open), (close_ts, close_id, close), high, low, n."""
    if t.num_rows == 0:
        # zero-row block: starts=[0] would index past the empty arrays below
        return pa.table(
            {
                "bucket_us": pa.array([], pa.int64()),
                "open_ts": pa.array([], pa.int64()),
                "open_id": pa.array([], pa.int64()),
                "open": pa.array([], pa.float64()),
                "close_ts": pa.array([], pa.int64()),
                "close_id": pa.array([], pa.int64()),
                "close": pa.array([], pa.float64()),
                "high": pa.array([], pa.float64()),
                "low": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            }
        )
    ts = t[ts_col].combine_chunks().to_numpy(zero_copy_only=False)
    ts_us = ts.astype("datetime64[us]").astype(np.int64)
    ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    vals = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
    bucket = ts_us // bucket_us * bucket_us
    order = np.lexsort((ids, ts_us, bucket))
    bucket, ts_us, ids, vals = bucket[order], ts_us[order], ids[order], vals[order]
    # group boundaries over the sorted bucket column
    starts = np.nonzero(np.r_[True, bucket[1:] != bucket[:-1]])[0]
    ends = np.r_[starts[1:], len(bucket)] - 1
    return pa.table(
        {
            "bucket_us": pa.array(bucket[starts], pa.int64()),
            "open_ts": pa.array(ts_us[starts], pa.int64()),
            "open_id": pa.array(ids[starts], pa.int64()),
            "open": pa.array(vals[starts], pa.float64()),
            "close_ts": pa.array(ts_us[ends], pa.int64()),
            "close_id": pa.array(ids[ends], pa.int64()),
            "close": pa.array(vals[ends], pa.float64()),
            "high": pa.array(np.maximum.reduceat(vals, starts), pa.float64()),
            "low": pa.array(np.minimum.reduceat(vals, starts), pa.float64()),
            "n": pa.array(np.diff(np.r_[starts, len(bucket)]), pa.int64()),
        }
    )


def grouped_ewma(
    ds,
    *,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    alpha: float = 0.25,
):
    """Per-key exponentially-weighted moving average of ``value_col`` in
    (ts, id) order — the streaming smoother (s_t = α·x_t + (1−α)·s_{t−1},
    seeded s_1 = x_1); returns one row per key: (key, n_events, ewma).
    The recurrence is order-dependent, so the Ray layout co-partitions by
    key (one groupby) and each group kernel evaluates the CLOSED FORM in
    one vectorized dot product — (1−α)^{n−1}·x_1 + α·Σ(1−α)^{n−1−t}·x_t —
    never a Python loop over rows.  Weights underflow to exactly 0 for
    entries older than ~√precision, which is the correct limit.  Rows-only
    op (the recurrence isn't ANSI SQL); pytest pins it against the serial
    definition."""

    def kernel(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g,
                sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
            )
        )
        x = s[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        n = len(x)
        w = np.power(1.0 - alpha, np.arange(n - 1, -1, -1, dtype=np.float64))
        ewma = w[0] * x[0] + alpha * float(np.dot(w[1:], x[1:]))
        return pa.table(
            {
                key_col: s[key_col].slice(0, 1),
                "n_events": pa.array([n], pa.int64()),
                "ewma": pa.array([ewma], pa.float64()),
            }
        )

    return ds.groupby(key_col).map_groups(kernel, batch_format="pyarrow")


def ohlc_bars(
    ds,
    *,
    ts_col: str,
    id_col: str,
    value_col: str,
    bucket_us: int = 3_600_000_000,
    out_bucket: str = "hour_us",
) -> pa.Table:
    """Dataset → driver pyarrow Table of per-bucket OHLC bars
    ``(out_bucket, open, high, low, close, n_events)``; ``out_bucket`` is
    epoch-microseconds truncated to ``bucket_us``.  Exactly DuckDB's
    ``arg_min(value, (ts, id))`` / ``arg_max`` / ``max`` / ``min`` per
    ``date_trunc`` bucket."""
    parts = ds.map_batches(
        _block_ohlc,
        batch_format="pyarrow",
        fn_kwargs=dict(
            ts_col=ts_col, id_col=id_col, value_col=value_col, bucket_us=bucket_us
        ),
    ).to_pandas()
    # driver merge of the tiny partial table: re-apply the same selection
    a = parts.sort_values(["bucket_us", "open_ts", "open_id"], kind="mergesort")
    z = parts.sort_values(["bucket_us", "close_ts", "close_id"], kind="mergesort")
    g = parts.groupby("bucket_us", sort=True)
    merged = pd.DataFrame(
        {
            out_bucket: np.asarray(sorted(parts["bucket_us"].unique()), np.int64),
            "open": a.groupby("bucket_us", sort=True)["open"].first().to_numpy(),
            "high": g["high"].max().to_numpy(),
            "low": g["low"].min().to_numpy(),
            "close": z.groupby("bucket_us", sort=True)["close"].last().to_numpy(),
            "n_events": g["n"].sum().to_numpy().astype(np.int64),
        }
    )
    return pa.Table.from_pandas(merged, preserve_index=False)
