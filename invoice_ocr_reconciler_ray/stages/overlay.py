"""Patch-Dataset overlay — the reference's mutation surface as an engine op.

The reference mutates rows in place: manual reconciliation links
(``server.js:471-505``: set record_id, match_status='matched', discrepancy,
flag_reason='Manually reconciled', confidence_score=100), field-wise record
updates (``server.js:371-427``: UPDATE invoices SET ... in a transaction)
and deletes (``server.js:476-501``).  A distributed engine over immutable
parquet expresses the same surface as an **idempotent overlay**: a small
patch table keyed by row id is broadcast ONCE (``ray.put``) and applied on
read — the base Dataset is never rewritten, applying the same overlay twice
is a no-op, and a resumed/replayed run converges to the same state.

Overlay contract (one row per patched key; later rows win — the reference's
last-write-wins UPDATE order):

* ``key_col``            — join key into the base Dataset.
* any subset of base columns — non-null values overwrite the base row;
  NULL means "leave this field unchanged" (a sparse PATCH, like the
  reference's per-field UPDATE payload).
* optional bool ``deleted_col`` — True marks a tombstone: the row is
  dropped on read (≙ DELETE).

Scale shape: the overlay is by definition the SMALL side (human
corrections); the probe is a vectorized ``index_in``/``take``/``if_else``
per batch — no shuffle, no join, streaming-safe.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray


def _last_wins(overlay: pa.Table, key_col: str) -> pa.Table:
    """Keep the LAST row per key (reference UPDATEs apply in order)."""
    idx_of: dict = {}
    for i, k in enumerate(overlay.column(key_col).to_pylist()):
        idx_of[k] = i  # later occurrence overwrites
    keep = sorted(idx_of.values())
    return overlay.take(pa.array(keep, pa.int64()))


def apply_overlay(base_ds, overlay: pa.Table, *, key_col: str, deleted_col: str = "deleted"):
    """Apply a patch table to a Dataset (broadcast, vectorized, idempotent).

    ``overlay``: pa.Table with ``key_col``, optionally ``deleted_col``
    (bool tombstones), and any subset of base columns to patch (null =
    leave unchanged).  Returns the patched Dataset: tombstoned keys are
    dropped, patched fields overwritten, everything else passes through
    unchanged (schema is preserved).
    """
    overlay = _last_wins(overlay, key_col)
    if deleted_col in overlay.column_names:
        dmask = pc.fill_null(overlay.column(deleted_col), False)
        tombstones = overlay.filter(dmask).column(key_col).combine_chunks()
        patches = overlay.filter(pc.invert(dmask)).drop_columns([deleted_col])
    else:
        tombstones = pa.array([], overlay.column(key_col).type)
        patches = overlay
    patch_cols = [c for c in patches.column_names if c != key_col]
    bref = ray.put(
        {
            "keys": patches.column(key_col).combine_chunks(),
            "cols": {c: patches.column(c).combine_chunks() for c in patch_cols},
            "tombstones": tombstones,
        }
    )

    def probe(t: pa.Table) -> pa.Table:
        o = ray.get(bref)
        if len(o["tombstones"]):
            t = t.filter(pc.invert(pc.is_in(t[key_col], value_set=o["tombstones"])))
        if len(o["keys"]) and t.num_rows:
            idx = pc.index_in(t[key_col], value_set=o["keys"])
            for c, vals in o["cols"].items():
                if c not in t.column_names:
                    continue
                patched = pc.take(vals, idx)  # null where no patch / field unset
                merged = pc.if_else(
                    pc.is_valid(patched),
                    pc.cast(patched, t.column(c).type),
                    t.column(c),
                )
                t = t.set_column(t.column_names.index(c), c, merged)
        return t

    return base_ds.map_batches(probe, batch_format="pyarrow")


def manual_link_overlay(
    links: list[dict],
    *,
    key_col: str = "invoice_id",
    record_col: str = "proposed_record_id",
) -> pa.Table:
    """Build the manual-reconciliation patch table (≙ server.js:471-505).

    ``links``: [{key, record_id, discrepancy?}] — each becomes a patch row
    setting match_status='matched', flag_reason='Manually reconciled',
    confidence_score=100 and the linked record id; discrepancy defaults to 0
    (the reference's default req.body value)."""
    return pa.Table.from_pydict(
        {
            key_col: pa.array([str(l["key"]) for l in links], pa.string()),
            record_col: pa.array([str(l["record_id"]) for l in links], pa.string()),
            "match_status": pa.array(["matched"] * len(links), pa.string()),
            "discrepancy": pa.array(
                [float(l.get("discrepancy", 0.0)) for l in links], pa.float64()
            ),
            "flag_reason": pa.array(["Manually reconciled"] * len(links), pa.string()),
            "confidence_score": pa.array([100.0] * len(links), pa.float64()),
        }
    )
