"""Blocked fuzzy record linkage — an oracle-checkable distributed fuzzy join.

Entity resolution at corpus scale is "block, then score": a cheap exact
blocking key bounds the candidate pairs (nation here; domain / LSH bucket /
sorted-neighborhood in the wild), then an exact string distance scores only
within-block pairs.  Ray-first layout: the SMALL side is grouped by block
key and broadcast ONCE via ``ray.put``; the big side streams through
``map_batches``, packs each batch's key strings into ONE Myers bit-parallel
matrix per block present (``functions/similarity.pack_myers``), and probes
every small-side row of that block against the whole packed batch in a
single vectorized call (``myers_distance_many`` — ~14 word ops per probe
character over the batch axis).  No shuffle at all; the only Python-level
loop is over the SMALL side's rows per block, which is the documented
contract of a broadcast join.

Reference parity: the reference scores OCR'd vendor strings against a
register with the same edit-distance family
(reference/backend/reconciliationEngine.js:34-61, levenshteinDistance);
this stage generalizes that broadcast-probe shape into a general-purpose
two-table "equi-block + edit-distance" join whose DuckDB oracle is
``JOIN ... ON block AND levenshtein(a, b) <= k``.

Scale notes: per-block small-side packs are built once on the driver
(O(|small|)); each probe row costs O(len(probe)) numpy word-ops over the
batch, so a batch of B rows against S small rows is O(S · L · B / 64)
machine words — at 100 TB the big side streams and the small side must fit
in a worker heap (the same bound as every broadcast join in this repo).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.similarity import myers_distance_many, pack_myers


def _group_small_side(
    rows: list[tuple], *, max_len: int = 64
) -> dict[int, list[tuple[int, str]]]:
    """(block, id, key_string) rows → {block: [(id, key), ...]}; keys longer
    than the Myers 64-char word bound raise (callers pick bounded keys)."""
    by_block: dict[int, list[tuple[int, str]]] = {}
    for block, rid, key in rows:
        if len(key) > max_len:
            raise ValueError(
                f"linkage key {key!r} exceeds the Myers {max_len}-char bound"
            )
        by_block.setdefault(int(block), []).append((int(rid), key))
    return by_block


class _ProbeBatch:
    """map_batches callable: score every small-side row of each block present
    in the batch against the batch's packed key strings."""

    def __init__(
        self,
        small_ref,
        *,
        big_id: str,
        big_block: str,
        big_key: str,
        out_big: str,
        out_small: str,
        out_block: str,
        out_dist: str,
        threshold: int,
        block_type: pa.DataType,
    ):
        self.small = ray.get(small_ref) if not isinstance(small_ref, dict) else small_ref
        self.big_id = big_id
        self.big_block = big_block
        self.big_key = big_key
        self.out_big = out_big
        self.out_small = out_small
        self.out_block = out_block
        self.out_dist = out_dist
        self.threshold = threshold
        self.block_type = block_type

    def __call__(self, t: pa.Table) -> pa.Table:
        blocks = t[self.big_block].combine_chunks().to_numpy(zero_copy_only=False)
        ids = t[self.big_id].combine_chunks().to_numpy(zero_copy_only=False)
        keys = t[self.big_key].to_pylist()
        out_big: list[int] = []
        out_small: list[int] = []
        out_block: list[int] = []
        out_dist: list[int] = []
        for block in np.unique(blocks):
            small_rows = self.small.get(int(block))
            if not small_rows:
                continue
            sel = np.nonzero(blocks == block)[0]
            packed = pack_myers([keys[i] for i in sel])
            if packed is None:
                raise ValueError(
                    "linkage big-side key exceeds the Myers 64-char bound"
                )
            for sid, skey in small_rows:
                dist = myers_distance_many(skey, packed)
                hit = np.nonzero(dist <= self.threshold)[0]
                if len(hit):
                    out_big.extend(int(ids[sel[i]]) for i in hit)
                    out_small.extend([sid] * len(hit))
                    out_block.extend([int(block)] * len(hit))
                    out_dist.extend(int(dist[i]) for i in hit)
        return pa.table(
            {
                self.out_big: pa.array(out_big, pa.int64()),
                self.out_small: pa.array(out_small, pa.int64()),
                self.out_block: pa.array(out_block, self.block_type),
                self.out_dist: pa.array(out_dist, pa.int64()),
            }
        )


def blocked_fuzzy_join(
    big,
    small_rows: list[tuple],
    *,
    big_id: str,
    big_block: str,
    big_key: str,
    threshold: int,
    out_big: str = "big_id",
    out_small: str = "small_id",
    out_block: str = "block",
    out_dist: str = "lev_dist",
    block_type: pa.DataType | None = None,
):
    """Fuzzy join ``big`` (a Dataset with id/block/key columns) against
    ``small_rows`` = [(block, id, key_string), ...], emitting one row per
    pair with equal block and exact Levenshtein(key_big, key_small) ≤
    ``threshold``.  The small side is broadcast once; the plan is a single
    shuffle-free map_batches."""
    if block_type is None:
        sch = big.schema()
        sch = getattr(sch, "base_schema", sch)
        block_type = sch.field(big_block).type
    grouped = _group_small_side(small_rows)
    from .broadcast import guard_broadcast_bytes

    guard_broadcast_bytes(
        sum(len(k) + 16 for _, _, k in small_rows),
        label="blocked_fuzzy_join small side",
        alternative="pre-partition BOTH sides by block key (the bucketed "
        "layout, stages/bucketing.py) and run per-partition joins",
    )
    small_ref = ray.put(grouped)
    return big.map_batches(
        _ProbeBatch,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs=dict(
            small_ref=small_ref,
            big_id=big_id,
            big_block=big_block,
            big_key=big_key,
            out_big=out_big,
            out_small=out_small,
            out_block=out_block,
            out_dist=out_dist,
            threshold=threshold,
            block_type=block_type,
        ),
    )
