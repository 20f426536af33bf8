"""Exact dedup — flag-don't-drop, first-wins (≙ reconciliationEngine.js:43-51).

The reference flags the 2nd..nth occurrence of an invoice number as
``duplicate`` while the FIRST keeps flowing — duplicates are never dropped.
The graft flags repeat ``url`` rows (and, in the content-hash variant,
repeat extracted-text rows).

The reference's "first" is scan order — non-deterministic under parallel
execution — so this engine fixes a deterministic priority (SURVEY §7.4):
**first = smallest (warc_ts, blake2b(extracted_text)) per key**, encoded as a
single sortable composite string so it survives both strategies below.

Two physical strategies, same logical result:

* ``broadcast`` (default): ``groupby(key).aggregate(Min(composite), Count)``
  — a vectorized partial+final aggregation — then keep only keys with
  count > 1 (at a ~3% dup rate this is a small fraction of keys), collect
  that winner map on the driver, ``ray.put`` it ONCE, and flag inside a
  stateless ``map_batches`` probe.  One shuffle of tiny (key, composite)
  pairs instead of a shuffle of full rows.
* ``shuffle``: ``groupby(key).map_groups`` first-wins — the fully general
  form for when the duplicate-key set itself is too large to broadcast
  (e.g. 3% of 10^12 urls).  Pick per deployment; both are tested equal.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Min

from ..functions.hashing import stable_hash64

_COMPOSITE = "_dedup_pri"


def _add_composite(batch: pa.Table, key_col: str, ts_col: str, content_col: str) -> pa.Table:
    ts_us = pc.cast(batch.column(ts_col), pa.int64()).to_pylist()
    texts = batch.column(content_col).to_pylist()
    comp = [f"{t:020d}:{stable_hash64(x or ''):016x}" for t, x in zip(ts_us, texts)]
    return batch.append_column(_COMPOSITE, pa.array(comp, pa.string()))


def flag_duplicates(
    ds,
    *,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "extracted_text",
    strategy: str = "broadcast",
    out_col: str = "is_duplicate",
):
    """Append ``out_col`` (bool): True for every non-first row per key."""
    with_pri = ds.map_batches(
        lambda b: _add_composite(b, key_col, ts_col, content_col), batch_format="pyarrow"
    )
    if strategy == "broadcast":
        agg = with_pri.groupby(key_col).aggregate(
            Min(_COMPOSITE, alias_name="first_pri"), Count(alias_name="n")
        )
        dup_tbl = agg.map_batches(
            lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
        ).to_pandas()
        # an input with no duplicates yields an empty, column-less frame
        winners = (
            dict(zip(dup_tbl[key_col], dup_tbl["first_pri"])) if len(dup_tbl) else {}
        )
        winners_ref = ray.put(winners)

        def probe(batch: pa.Table) -> pa.Table:
            w = ray.get(winners_ref)
            keys = batch.column(key_col).to_pylist()
            pris = batch.column(_COMPOSITE).to_pylist()
            flags = [k in w and p != w[k] for k, p in zip(keys, pris)]
            return batch.drop_columns([_COMPOSITE]).append_column(
                out_col, pa.array(flags, pa.bool_())
            )

        return with_pri.map_batches(probe, batch_format="pyarrow")

    if strategy == "shuffle":

        def first_wins(group: pa.Table) -> pa.Table:
            g = group.sort_by([(_COMPOSITE, "ascending")])
            flags = [False] + [True] * (g.num_rows - 1)
            return g.drop_columns([_COMPOSITE]).append_column(
                out_col, pa.array(flags, pa.bool_())
            )

        return with_pri.groupby(key_col).map_groups(first_wins, batch_format="pyarrow")

    raise ValueError(f"unknown dedup strategy: {strategy}")


def flag_content_duplicates(ds, *, content_col: str = "extracted_text", **kw):
    """Content-hash variant: identical extracted text under DIFFERENT urls is
    also a duplicate (the scalable analogue of A1 keyed on content)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [f"{stable_hash64(t or ''):016x}" for t in batch.column(content_col).to_pylist()]
        return batch.append_column("_content_key", pa.array(hs, pa.string()))

    flagged = flag_duplicates(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        key_col="_content_key",
        content_col=content_col,
        out_col=kw.pop("out_col", "is_content_duplicate"),
        **kw,
    )
    return flagged.drop_columns(["_content_key"])
