"""Skew handling — salted keys and byte-budgeted batching (SURVEY §4.3.1).

The reference has no analogue (its scale cap was 20 MB/file,
``server.js:90``); at 10^12 pages two skew modes dominate:

* **Hot keys** — a handful of domains (or a low-cardinality column like
  ``lang``) own a huge share of rows, so a naive ``groupby(domain)`` sends
  one reducer most of the data.  Fix: two-level aggregation over a **salted
  key** ``(key, hash(row) % S)`` — S-way partial aggregates shuffle evenly,
  then a second, tiny groupby on the bare key merges the S partials.  The
  second shuffle moves |keys|·S rows, not |rows|.
* **Giant rows** — multi-MB ``html`` values make row-count batching
  meaningless (100× size variance).  Fix: re-slice incoming Arrow batches on
  a byte budget so no kernel invocation sees more than ``target_bytes`` of
  payload, while tiny rows still batch up for vectorization.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Sum


# --------------------------------------------------------------- salted agg


def add_salt(batch: pa.Table, *, key_col: str, salt_col: str, buckets: int) -> pa.Table:
    """Append ``salt_col`` = row position % buckets (vectorized round-robin).

    Never wall-clock / random (SURVEY §7.4) — position round-robin is
    deterministic, disperses a hot key perfectly evenly within a block, and
    costs one numpy op instead of a per-row hash; the salt itself may vary
    with block layout, but the merged level-2 result is invariant to it."""
    import numpy as np

    salt = pa.array(
        (np.arange(batch.num_rows, dtype=np.int64) % buckets).astype(np.int32),
        pa.int32(),
    )
    return batch.append_column(salt_col, salt)


def salted_sum_count(
    ds,
    *,
    key_col: str,
    sum_cols: dict[str, str],
    count_alias: str = "n",
    buckets: int = 16,
):
    """``SELECT key, COUNT(*), SUM(v)... GROUP BY key`` resistant to hot keys.

    ``sum_cols`` maps input column → output alias.  Level 1 partials are
    computed **block-locally** (vectorized ``pyarrow`` ``group_by`` on
    ``(key, salt)`` inside ``map_batches`` — no shuffle, no hot reducer; the
    salt keeps partial groups bounded even if one block is all one key);
    level 2 merges the ≤ |keys|·buckets tiny partial rows with ONE Ray
    groupby whose input no longer carries row-count-scale data.
    """
    salt = "_salt"

    def partial(t: pa.Table) -> pa.Table:
        cols = [t.column(key_col)] + [t.column(c) for c in sum_cols]
        names = [key_col] + list(sum_cols)
        out = add_salt(
            pa.Table.from_arrays(cols, names=names),
            key_col=key_col,
            salt_col=salt,
            buckets=buckets,
        )
        aggs = [(c, "sum") for c in sum_cols] + [(key_col, "count")]
        g = out.group_by([key_col, salt]).aggregate(aggs)
        return g.rename_columns(
            [key_col, salt] + [f"_s_{c}" for c in sum_cols] + ["_n"]
        ).drop_columns([salt])

    lvl1 = ds.map_batches(partial, batch_format="pyarrow")
    lvl2_aggs = [Sum(f"_s_{c}", alias_name=alias) for c, alias in sum_cols.items()]
    return lvl1.groupby(key_col).aggregate(Sum("_n", alias_name=count_alias), *lvl2_aggs)


# -------------------------------------------------------- byte-budget batching


def slice_by_bytes(
    batch: pa.Table, *, payload_col: str, target_bytes: int
) -> Iterator[pa.Table]:
    """Yield zero-copy slices of ``batch`` whose ``payload_col`` bytes sum to
    ≤ ``target_bytes`` each (a single over-budget row still goes alone —
    giant pages can't be split below one row)."""
    sizes = pc.binary_length(
        pc.cast(batch.column(payload_col), pa.large_binary())
    ).to_pylist()
    start, acc = 0, 0
    for i, s in enumerate(sizes):
        s = s or 0
        if i > start and acc + s > target_bytes:
            yield batch.slice(start, i - start)
            start, acc = i, 0
        acc += s
    if start < batch.num_rows:
        yield batch.slice(start)


def rebatch_by_bytes(ds, *, payload_col: str = "html", target_bytes: int = 8 << 20):
    """Dataset-level wrapper: downstream stages see byte-bounded batches.

    Use upstream of extraction so ``batch_size`` (rows) never multiplies a
    100× html size variance into an OOM; pairs with
    ``DataContext.target_max_block_size`` for the block level.
    """

    def split(batch: pa.Table) -> Iterator[pa.Table]:
        yield from slice_by_bytes(batch, payload_col=payload_col, target_bytes=target_bytes)

    return ds.map_batches(split, batch_format="pyarrow")


# ------------------------------------------------------------- salted join


def hot_join_keys(ds, *, key_col: str, threshold: int, k: int = 256) -> pa.Array:
    """Keys hot enough to overload one join partition, detected WITHOUT a
    shuffle: each block emits ≤ ``k`` (key, count) rows from a one-pass
    Misra-Gries summary (any key with in-block frequency > n/(k+1) is
    guaranteed present); the driver sums the O(k·blocks) rows and keeps
    keys reaching ``threshold // 2`` — the margin absorbs MG's bounded
    undercount.  Detection is a HEURISTIC: a missed or extra key only
    changes partition balance; :func:`salted_join`'s output is exact for
    any hot set, including the empty one."""
    from ..functions.sketches import mg_summarize

    def partial(t: pa.Table) -> pa.Table:
        summ = mg_summarize(t[key_col].to_pylist(), k)
        keys = list(summ)
        return pa.table(
            {
                key_col: pa.array(keys, t[key_col].type),
                "_c": pa.array([summ[x] for x in keys], pa.int64()),
            }
        )

    batches = list(
        ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    # empty-input fallback assumes an integer key — pass string keys pre-listed
    t = pa.concat_tables(batches or [pa.table({key_col: pa.array([], pa.int64()), "_c": pa.array([], pa.int64())})])
    g = t.group_by(key_col).aggregate([("_c", "sum")])
    hot = g.filter(pc.greater_equal(g["_c_sum"], max(1, int(threshold) // 2)))
    return hot.column(key_col).combine_chunks()


def salted_join(
    fact,
    dim,
    *,
    fact_key: str,
    dim_key: str,
    hot_keys: pa.Array,
    buckets: int = 8,
    num_partitions: int = 8,
):
    """Skew-tolerant distributed hash join (the JOIN counterpart of
    :func:`salted_sum_count`): a hot key would send all its fact rows to one
    shuffle partition, so hot-key DIM rows are REPLICATED across all
    ``buckets`` salts while hot-key FACT rows spread round-robin over them;
    cold keys ride salt 0 untouched.  The join runs on the composite
    ``(key, salt)`` — every output row of the plain join appears exactly
    once, so the result is EXACT, and no partition receives more than
    ~1/buckets of a hot key's fact rows.  Shuffle overhead: |hot|·buckets
    extra dim rows, one int32 column per side."""
    hot_ref = ray.put(hot_keys)
    salt_f, salt_d = "_salt", "_dsalt"

    def salt_fact(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        if len(hot) == 0:
            salt = np.zeros(t.num_rows, np.int32)
        else:
            is_hot = pc.is_in(t.column(fact_key), value_set=hot).to_numpy(
                zero_copy_only=False
            )
            salt = np.where(
                is_hot, np.arange(t.num_rows, dtype=np.int64) % buckets, 0
            ).astype(np.int32)
        return t.append_column(salt_f, pa.array(salt, pa.int32()))

    def replicate_dim(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        zero = t.append_column(salt_d, pa.array(np.zeros(t.num_rows, np.int32)))
        if len(hot) == 0:
            return zero
        mask = pc.is_in(t.column(dim_key), value_set=hot)
        hot_rows = t.filter(mask)
        if hot_rows.num_rows == 0:
            return zero
        reps = []
        for s in range(1, buckets):
            reps.append(
                hot_rows.append_column(
                    salt_d, pa.array(np.full(hot_rows.num_rows, s, np.int32))
                )
            )
        return pa.concat_tables([zero, *reps])

    f = fact.map_batches(salt_fact, batch_format="pyarrow")
    d = dim.map_batches(replicate_dim, batch_format="pyarrow")
    joined = f.join(
        d,
        join_type="inner",
        num_partitions=num_partitions,
        on=(fact_key, salt_f),
        right_on=(dim_key, salt_d),
    )
    return joined.drop_columns([salt_f])
