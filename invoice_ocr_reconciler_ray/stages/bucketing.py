"""Hash-bucketed storage layout + co-located (shuffle-free) join.

The 100 TB play for repeated joins on one key: pay ONE hash-partitioned
write per table (`write_bucketed`), then every subsequent join on that key
is embarrassingly parallel — task b joins `left/bucket=b` against
`right/bucket=b` with no network exchange (`bucketed_join`), because equal
keys land in equal buckets by construction (same hash, same modulus).
This is the classic bucketed-table join (Hive/Spark bucketing, implemented
here from the general published technique on Ray tasks + pyarrow).

Layout: ``out_dir/bucket=<b>/part-<uuid>.parquet`` — multiple writer tasks
may contribute files to one bucket; readers glob the bucket directory.
Bucket assignment uses the engine's ``stable_hash64`` (content-stable,
process-independent), never Python's salted ``hash()``.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import stable_hash64

_H63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def bucket_of(keys, n_buckets: int) -> np.ndarray:
    """Vectorized bucket id for an int64 key array (splitmix-style mix via
    stable_hash64 of the decimal string would be row-wise; integer keys mix
    with a fixed odd multiplier + xorshift — deterministic everywhere)."""
    k = np.asarray(keys, dtype=np.uint64)
    k = k * np.uint64(0x9E3779B97F4A7C15)
    k ^= k >> np.uint64(29)
    k = k * np.uint64(0xBF58476D1CE4E5B9)
    k ^= k >> np.uint64(32)
    return ((k & _H63) % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds, *, key_col: str, n_buckets: int, out_dir: str) -> None:
    """Write ``ds`` as ``out_dir/bucket=<b>/part-*.parquet`` hash-bucketed
    on ``key_col``.  Each map task splits its block by bucket and appends
    one file per non-empty bucket — no shuffle; bucket fan-in happens on
    the filesystem."""
    for b in range(n_buckets):
        os.makedirs(os.path.join(out_dir, f"bucket={b}"), exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows:
            buckets = bucket_of(t[key_col].to_numpy(zero_copy_only=False), n_buckets)
            order = np.argsort(buckets, kind="stable")
            sorted_t = t.take(pa.array(order))
            sb = buckets[order]
            bounds = np.searchsorted(sb, np.arange(n_buckets + 1))
            for b in range(n_buckets):
                lo, hi = bounds[b], bounds[b + 1]
                if hi > lo:
                    pq.write_table(
                        sorted_t.slice(lo, hi - lo),
                        os.path.join(
                            out_dir, f"bucket={b}", f"part-{uuid.uuid4().hex}.parquet"
                        ),
                    )
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    schema = pa.schema(list(zip(ds.schema().names, ds.schema().types)))
    # consume the plan; the tiny count table is the only object traffic
    ds.map_batches(write_block, batch_format="pyarrow").count()
    # every bucket dir carries the schema even when empty, so readers and
    # the co-located join never see a schemaless directory
    for b in range(n_buckets):
        bdir = os.path.join(out_dir, f"bucket={b}")
        if not os.listdir(bdir):
            pq.write_table(schema.empty_table(), os.path.join(bdir, "part-empty.parquet"))


def bucketed_join(
    left_dir: str,
    right_dir: str,
    *,
    n_buckets: int,
    key_left: str,
    key_right: str,
    columns_left: list[str] | None = None,
    columns_right: list[str] | None = None,
):
    """Inner join of two IDENTICALLY-bucketed layouts (same n_buckets, same
    key hashing) — one Ray Data task per bucket, each doing a local pyarrow
    hash join; zero network shuffle.  Returns a Dataset of the joined rows.

    Partitioning contract (documented): both inputs were written by
    :func:`write_bucketed` with the same ``n_buckets``; a mismatch joins
    unrelated buckets and is the caller's bug."""
    import ray.data as rd

    def join_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        out = []
        if not batch.num_rows:  # empty block → 0-row result, schema intact
            lt0 = pads.dataset(
                os.path.join(left_dir, "bucket=0"), format="parquet"
            ).to_table(columns=columns_left).slice(0, 0)
            rt0 = pads.dataset(
                os.path.join(right_dir, "bucket=0"), format="parquet"
            ).to_table(columns=columns_right).slice(0, 0)
            out.append(lt0.join(rt0, keys=key_left, right_keys=key_right, join_type="inner"))
        for b in batch.column("bucket").to_pylist():
            lt = pads.dataset(
                os.path.join(left_dir, f"bucket={b}"), format="parquet"
            ).to_table(columns=columns_left)
            rt = pads.dataset(
                os.path.join(right_dir, f"bucket={b}"), format="parquet"
            ).to_table(columns=columns_right)
            out.append(lt.join(rt, keys=key_left, right_keys=key_right, join_type="inner"))
        return pa.concat_tables(out, promote_options="default")

    buckets = rd.from_arrow(
        pa.table({"bucket": pa.array(list(range(n_buckets)), pa.int64())})
    ).repartition(n_buckets)
    return buckets.map_batches(join_bucket, batch_format="pyarrow")


# ------------------------------------------------------ range partitioning


def write_range_partitioned(
    ds, *, key_col: str, boundaries: list, out_dir: str
) -> None:
    """Write ``ds`` as ``out_dir/range=<r>/part-*.parquet`` partitioned by
    VALUE RANGE: row → partition ``searchsorted(boundaries, key, 'right')``
    (partition r holds boundaries[r-1] <= key < boundaries[r]).

    The second classic layout next to hash bucketing: hash buckets co-locate
    equal keys (join play); range partitions co-locate NEIGHBORING keys, so
    a range predicate (``key BETWEEN a AND b``) touches only the partitions
    whose span intersects [a, b] — at 100 TB the read plan opens a handful
    of directories instead of every file (`read_range_pruned` computes that
    set driver-side from the same boundaries, zero I/O).  Boundaries come
    from the exact-quantile machinery (equi-depth) or domain knowledge
    (dates); they are the partition CONTRACT and must be identical between
    writer and reader, like n_buckets for hash buckets."""
    bounds = np.asarray(sorted(boundaries), dtype=np.float64)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"written": pa.array([], pa.int64())})
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.float64)
        parts = np.searchsorted(bounds, keys, side="right")
        written = []
        for r in np.unique(parts):
            sub = t.filter(pa.array(parts == r))
            d = os.path.join(out_dir, f"range={int(r)}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(sub, os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"))
            written.append(int(r))
        return pa.table({"written": pa.array(written, pa.int64())})

    schema = pa.schema(list(zip(ds.schema().names, ds.schema().types)))
    # consume the write plan (count() drives execution; tiny result)
    ds.map_batches(write_block, batch_format="pyarrow").count()
    # every partition dir carries the schema even when empty — readers of a
    # pruned range never see a schemaless directory (same contract as
    # write_bucketed)
    for r in range(len(bounds) + 1):
        d = os.path.join(out_dir, f"range={r}")
        os.makedirs(d, exist_ok=True)
        if not os.listdir(d):
            pq.write_table(schema.empty_table(), os.path.join(d, "part-empty.parquet"))


def read_range_pruned(
    out_dir: str, *, boundaries: list, lo: float, hi: float, **read_kwargs
):
    """Read only the partitions whose span intersects [lo, hi) — the
    driver-side pruning that makes the layout pay: partition r spans
    [boundaries[r-1], boundaries[r]), so the qualifying set is one
    searchsorted interval, computed without touching storage.  Returns a
    Dataset over just those files (callers still apply the exact row
    predicate — pruning is file-level, correctness stays row-level).  The
    hive-style ``range=<r>`` directory names mean readers also get the
    partition id as a free ``range`` column (standard hive-partitioning
    behavior)."""
    import ray.data as rd

    bounds = np.asarray(sorted(boundaries), dtype=np.float64)
    r_lo = int(np.searchsorted(bounds, lo, side="right"))
    r_hi = int(np.searchsorted(bounds, hi, side="left"))
    paths = []
    for r in range(r_lo, r_hi + 1):
        d = os.path.join(out_dir, f"range={r}")
        if os.path.isdir(d):
            files = [os.path.join(d, f) for f in sorted(os.listdir(d))]
            paths.extend(f for f in files if f.endswith(".parquet"))
    if not paths:
        raise FileNotFoundError(f"no parquet files for [{lo}, {hi}) under {out_dir}")
    return rd.read_parquet(paths, **read_kwargs)
