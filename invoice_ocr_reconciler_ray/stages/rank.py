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
