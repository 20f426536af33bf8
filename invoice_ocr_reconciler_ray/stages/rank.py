"""Distributed global rank / deterministic training-order shuffle.

Training pipelines need a *reproducible* global shuffle: every engine, at any
parallelism, must emit the same example order (the reference app has no such
op — this is a graft-mandated scale extension; cf. the deterministic sampling
family in ``pipelines/queries.py:docs_hash_sample``).  ``random_shuffle()``
is seed- and partitioning-dependent, so instead we order by a content-stable
hash (md5 of the id's decimal string — reproducible in any engine, incl. the
DuckDB oracle) and compute each row's exact global position WITHOUT a global
sort or a driver-side collect:

1. one narrow pass assigns ``h = md5(id)`` and a bucket = first byte of the
   hash (256 hash-prefix ranges, so bucket order == hash order);
2. per-block bucket counts are merged on the driver (256 ints per block) into
   prefix offsets — O(buckets), never O(rows);
3. one ``groupby(bucket).map_groups`` shuffle sorts each bucket locally by
   (h, id) and adds its prefix offset: ``pos`` is the exact global
   ``row_number() OVER (ORDER BY h, id) - 1``.

At 100 TB the same plan holds: the shuffle moves only (id, h) pairs
(~48 B/row), buckets are uniform by construction (md5), and the driver state
is 256 counters.  Raise ``n_buckets`` to 65 536 (two hash bytes) when a
single bucket (~corpus/256) would exceed a worker's heap.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_SCHEMA_TAIL = [("h", pa.string()), ("bucket", pa.int64())]


def _hash_block(t: pa.Table, id_col: str, n_buckets: int) -> pa.Table:
    ids = t[id_col].to_pylist()
    hs = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    # bucket = the hash-PREFIX range (first 16 bits ÷ range width), so
    # bucket order == hash order for any power-of-two n_buckets ≤ 65536
    width = 65536 // n_buckets
    buckets = [int(h[:4], 16) // width for h in hs]
    return pa.table(
        {
            id_col: t[id_col],
            "h": pa.array(hs, pa.string()),
            "bucket": pa.array(buckets, pa.int64()),
        }
    )


def global_rank(
    ds: rd.Dataset, id_col: str = "doc_id", n_buckets: int = 256
) -> rd.Dataset:
    """(id_col, pos): pos = global row_number ordered by (md5(id), id).

    ``n_buckets`` (power of two ≤ 65536) is the scale knob: a bucket holds
    ~N/n_buckets rows and must fit one group task's heap."""
    if n_buckets & (n_buckets - 1) or not 0 < n_buckets <= 65536:
        raise ValueError("n_buckets must be a power of two in (0, 65536]")
    hashed = ds.map_batches(
        lambda t: _hash_block(t, id_col, n_buckets), batch_format="pyarrow"
    ).materialize()  # narrow (id, h, bucket) table; consumed twice below

    # per-block bucket histograms -> driver merge (n_buckets ints per block)
    def counts(t: pa.Table):
        g = t.group_by("bucket").aggregate([("bucket", "count")])
        return {
            "bucket": g["bucket"].to_numpy(zero_copy_only=False),
            "n": g["bucket_count"].to_numpy(zero_copy_only=False),
        }

    totals = [0] * n_buckets
    for part in hashed.map_batches(counts, batch_format="pyarrow").iter_rows():
        totals[part["bucket"]] += int(part["n"])
    offsets = [0] * n_buckets
    run = 0
    for b in range(n_buckets):
        offsets[b] = run
        run += totals[b]

    def rank_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "pos": pa.array([], pa.int64())})
        order = pc.sort_indices(
            g, sort_keys=[("h", "ascending"), (id_col, "ascending")]
        )
        base = offsets[int(g["bucket"][0].as_py())]
        pos = pa.array(range(base, base + g.num_rows), pa.int64())
        return pa.table({id_col: g[id_col].take(order), "pos": pos})

    return hashed.groupby("bucket").map_groups(rank_group, batch_format="pyarrow")


def global_value_rank(
    ds: rd.Dataset,
    *,
    value_col: str,
    id_col: str,
    out_col: str = "rnk",
    ntile_k: int | None = None,
    n_buckets: int = 256,
) -> rd.Dataset:
    """Exact global ``row_number() OVER (ORDER BY value, id)`` — and,
    optionally, SQL-exact ``ntile(k)`` over the same order — WITHOUT a
    global sort: value-RANGE buckets (bucket order == value order), per-block
    bucket-count partials folded into O(B) driver prefix offsets, then one
    groupby(bucket) shuffle where each bucket sorts locally and adds its
    offset.  ``value_col`` must be int64-like and non-null; ``id_col`` breaks
    ties (must be unique).  Unlike :func:`global_rank`'s md5 buckets, VALUE
    buckets inherit the data's skew — a single hot value lands in one bucket;
    raise ``n_buckets`` (or pre-shift to a finer key) when a bucket would
    exceed a group task's heap, same contract as exact_group_quantiles."""
    import numpy as np
    import ray
    from ray.data.aggregate import Max, Min, Sum

    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo = int(mm[f"min({value_col})"])
    hi = int(mm[f"max({value_col})"])
    span = max(1, hi - lo + 1)

    def tag(t: pa.Table) -> pa.Table:
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (v.astype(np.int64) - lo) * n_buckets // span
        return t.append_column("_b", pa.array(b.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def bucket_count(t: pa.Table) -> pa.Table:
        b = t["_b"].combine_chunks().to_numpy(zero_copy_only=False)
        c = np.bincount(b, minlength=n_buckets)
        return pa.table(
            {
                "_b": pa.array(np.arange(n_buckets), pa.int64()),
                "c": pa.array(c, pa.int64()),
            }
        )

    parts = (
        tagged.map_batches(bucket_count, batch_format="pyarrow")
        .groupby("_b")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    counts = np.zeros(n_buckets, dtype=np.int64)
    for r in parts:
        counts[int(r["_b"])] = int(r["c"])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_total = int(counts.sum())
    off_ref = ray.put(offsets)

    if ntile_k is not None:
        q, rem = divmod(n_total, ntile_k)
        boundary = rem * (q + 1)

    def rank_group(g: pa.Table) -> pa.Table:
        b = g["_b"][0].as_py()
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[(value_col, "ascending"), (id_col, "ascending")]
            )
        )
        rnk = ray.get(off_ref)[b] + np.arange(1, s.num_rows + 1, dtype=np.int64)
        out = s.drop_columns(["_b"]).append_column(out_col, pa.array(rnk))
        if ntile_k is not None:
            # SQL NTILE: first (n % k) tiles get one extra row
            tile = np.where(
                rnk <= boundary,
                (rnk - 1) // (q + 1) + 1,
                rem + (rnk - 1 - boundary) // max(q, 1) + 1,
            ).astype(np.int64)
            out = out.append_column("tile", pa.array(tile))
        return out

    return tagged.groupby("_b").map_groups(rank_group, batch_format="pyarrow")


def global_value_rank_stats(
    ds: rd.Dataset,
    *,
    value_col: str,
    id_col: str,
    n_buckets: int = 256,
) -> rd.Dataset:
    """Exact global ``RANK()`` (ties share the first row number) and
    ``n_le`` (count of rows with value ≤ this row's — the cume_dist
    numerator) over ``ORDER BY value`` — same value-range-bucket layout as
    :func:`global_value_rank`.  Equal values always land in ONE bucket
    (buckets partition the value domain), so tie groups never straddle an
    offset boundary and two searchsorted calls per bucket give exact global
    ranks.  percent_rank/cume_dist are then ONE fixed IEEE division each,
    computed by the caller so the ratio expression is identical to SQL's."""
    import numpy as np
    import ray
    from ray.data.aggregate import Max, Min, Sum

    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo = int(mm[f"min({value_col})"])
    hi = int(mm[f"max({value_col})"])
    span = max(1, hi - lo + 1)

    def tag(t: pa.Table) -> pa.Table:
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (v.astype("int64") - lo) * n_buckets // span
        return t.append_column("_b", pa.array(b.astype("int64")))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def bucket_count(t: pa.Table) -> pa.Table:
        b = t["_b"].combine_chunks().to_numpy(zero_copy_only=False)
        c = np.bincount(b, minlength=n_buckets)
        return pa.table(
            {
                "_b": pa.array(np.arange(n_buckets), pa.int64()),
                "c": pa.array(c, pa.int64()),
            }
        )

    parts = (
        tagged.map_batches(bucket_count, batch_format="pyarrow")
        .groupby("_b")
        .aggregate(Sum("c", alias_name="c"))
        .take_all()
    )
    counts = np.zeros(n_buckets, dtype=np.int64)
    for r in parts:
        counts[int(r["_b"])] = int(r["c"])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_total = int(counts.sum())
    off_ref = ray.put(offsets)

    def rank_group(g: pa.Table) -> pa.Table:
        b = g["_b"][0].as_py()
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[(value_col, "ascending"), (id_col, "ascending")]
            )
        )
        v = s[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        base = int(ray.get(off_ref)[b])
        rnk = base + np.searchsorted(v, v, side="left") + 1
        n_le = base + np.searchsorted(v, v, side="right")
        out = s.drop_columns(["_b"])
        out = out.append_column("rnk", pa.array(rnk.astype("int64")))
        out = out.append_column("n_le", pa.array(n_le.astype("int64")))
        return out.append_column(
            "n_total", pa.array(np.full(s.num_rows, n_total, dtype="int64"))
        )

    return tagged.groupby("_b").map_groups(rank_group, batch_format="pyarrow")
