"""Change-data-capture-shaped operators: keyed table diff and
latest-per-key compaction.

Both are staples of incremental corpus maintenance (re-crawl vs standing
corpus, upsert log → current state) that the Dataset API has no primitive
for.  Scale shape for both: block-local partials first, so the shuffle
carries one row per (key[, side]) per block — never the raw rows — then a
small keyed merge.

``diff_by_key``  — classify keys across two dataset versions into
``added`` / ``removed`` / ``changed`` (identical keys are omitted; emitting
them would make the output as large as the input).  Each side is reduced
block-locally to (key, fingerprint) pairs; the merge is one groupby on the
key carrying two int64 hashes per key.  The fingerprint is a 63-bit
blake2b over the selected value columns' canonical string form — collisions
(~2⁻⁶³) would misreport a changed key as identical, the standard
content-hash trade every diff/rsync-style tool makes.

``latest_per_key`` — per key, the full row with the greatest (order_col,
tiebreak) — CDC log compaction.  Block partial keeps at most one row per
key per block (vectorized sort + last-of-group), the merge re-applies the
same selection per key group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash64


def _row_fingerprints(t: pa.Table, cols: list[str]) -> np.ndarray:
    """63-bit content hash per row over ``cols`` (canonical string form —
    dtype-stable across sides as long as both sides carry equal types)."""
    joined = None
    for c in cols:
        s = pc.cast(t[c], pa.string())
        s = pc.fill_null(s, "\x00null")
        joined = s if joined is None else pc.binary_join_element_wise(joined, s, "\x1f")
    out = np.empty(t.num_rows, np.int64)
    for i, v in enumerate(joined.to_pylist()):
        out[i] = stable_hash64(v, salt="rowdiff") & ((1 << 63) - 1)
    return out


def diff_by_key(base_ds, new_ds, *, key: str, value_cols: list[str]):
    """Dataset(key, diff) with diff ∈ {'added','removed','changed'}.

    ``key`` must be unique per side (a keyed table, not a log).  Identical
    keys produce NO row.  One groupby shuffle over (key, fp, side) partial
    rows; the classification is a vectorized projection of the merged
    per-key (fp_base, fp_new) pair.
    """

    def tag(side: str):
        def part(t: pa.Table) -> pa.Table:
            fp = _row_fingerprints(t, value_cols)
            n = t.num_rows
            return pa.table(
                {
                    key: t[key],
                    "fp_base": pa.array(fp if side == "base" else np.zeros(n, np.int64)),
                    "fp_new": pa.array(fp if side == "new" else np.zeros(n, np.int64)),
                    "in_base": pa.array(
                        np.ones(n, np.int64) if side == "base" else np.zeros(n, np.int64)
                    ),
                    "in_new": pa.array(
                        np.ones(n, np.int64) if side == "new" else np.zeros(n, np.int64)
                    ),
                }
            )

        return part

    from ray.data.aggregate import Max, Sum

    both = base_ds.map_batches(tag("base"), batch_format="pyarrow").union(
        new_ds.map_batches(tag("new"), batch_format="pyarrow")
    )
    merged = both.groupby(key).aggregate(
        Max("fp_base", alias_name="fp_base"),
        Max("fp_new", alias_name="fp_new"),
        Sum("in_base", alias_name="in_base"),
        Sum("in_new", alias_name="in_new"),
    )

    def classify(t: pa.Table) -> pa.Table:
        in_b = pc.greater(t["in_base"], 0)
        in_n = pc.greater(t["in_new"], 0)
        changed = pc.and_(pc.and_(in_b, in_n), pc.not_equal(t["fp_base"], t["fp_new"]))
        status = pc.if_else(
            changed,
            pa.scalar("changed"),
            pc.if_else(
                pc.and_(in_b, pc.invert(in_n)),
                pa.scalar("removed"),
                pc.if_else(
                    pc.and_(in_n, pc.invert(in_b)),
                    pa.scalar("added"),
                    pa.scalar(None, pa.string()),
                ),
            ),
        )
        out = pa.table({key: t[key], "diff": status})
        return out.filter(pc.is_valid(out["diff"]))

    return merged.map_batches(classify, batch_format="pyarrow")


def latest_per_key(ds, *, key: str, order_col: str, tiebreak: str):
    """Per ``key``, the single full row with the greatest
    (``order_col``, ``tiebreak``) — log compaction / upsert resolution.

    Block partial: vectorized sort + take-last-per-key keeps ≤ |keys(block)|
    rows per block; the keyed merge re-applies the identical selection, so
    the result is associative and layout-independent.  The shuffle carries
    at most one row per key per block.
    """
    schema = ds.schema()
    out_schema = pa.schema(list(zip(schema.names, schema.types)))

    def best_per_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    (key, "ascending"),
                    (order_col, "ascending"),
                    (tiebreak, "ascending"),
                ],
            )
        )
        k = t[key].to_numpy(zero_copy_only=False)
        last = np.nonzero(np.r_[k[1:] != k[:-1], True])[0]
        return t.take(pa.array(last))

    partial = ds.map_batches(best_per_key, batch_format="pyarrow")
    return partial.groupby(key).map_groups(best_per_key, batch_format="pyarrow")
