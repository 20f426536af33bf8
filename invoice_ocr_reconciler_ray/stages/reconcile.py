"""Reconciliation stage — per-row alignment of extracted vs reference text.

Graft of the reference's reconcile() (reconciliationEngine.js:37-213).  Its
fuzzy register lookup (Fuse index over the small side, :53-67) degenerates
here to a same-row comparison: the expected text IS the row's ``text``
column, so the stage is a pure stateless ``map_batches`` with NO shuffle
(SURVEY §2.4 J1).  Verdict statuses keep the reference's vocabulary and
partition-of-input invariant (:201-207):

* ``duplicate`` — flagged by the dedup stage, checked FIRST (≙ :70-81)
* ``missing``  — extraction failed / produced nothing (≙ no-candidates
  branch :89-105; discrepancy = full reference length ≙ invoiceAmount :100)
* ``matched``  — byte-identical extracted text (the graft invariant uses
  EXACT equality; the reference's 1% tolerance, :25-35, survives as the
  diagnostic ``length_match`` gate only)
* ``mismatch`` — extracted but differs; flag_reason mirrors the reference's
  two-part message (:173-179), confidence from the combined
  0.6·edit + 0.4·token distance (:122), good-match gate 0.3 (:160).

Vectorization: exact equality is a pyarrow kernel over the whole batch; only
the (rare) non-equal rows enter the Python similarity loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_RECONCILE, ReconcileConfig
from ..functions.similarity import (
    levenshtein_ratio,
    rel_tolerance_match,
    token_set_ratio,
)

VERDICT_FIELDS = [
    ("match_status", pa.string()),
    ("discrepancy", pa.float64()),
    ("flag_reason", pa.string()),
    ("confidence_score", pa.float64()),
]


def make_reconcile_fn(cfg: ReconcileConfig = DEFAULT_RECONCILE):
    def reconcile_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ext = batch.column("extracted_text")
        ref = batch.column("text")
        err = batch.column("error")
        isdup = (
            batch.column("is_duplicate")
            if "is_duplicate" in batch.column_names
            else pa.chunked_array([pa.array([False] * n, pa.bool_())])
        )
        equal = pc.equal(pc.cast(ext, pa.large_string()), pc.cast(ref, pa.large_string()))

        status: list[str] = [""] * n
        disc: list[float] = [0.0] * n
        reason: list[str | None] = [None] * n
        conf: list[float] = [0.0] * n

        eq_l = equal.to_pylist()
        dup_l = isdup.to_pylist()
        err_l = err.to_pylist()
        # only materialize the heavy strings lazily for the slow path
        ext_l = None
        ref_l = None
        for i in range(n):
            if dup_l[i]:
                status[i] = "duplicate"
                conf[i] = 100.0
                reason[i] = "Duplicate url"
                continue
            if err_l[i] is not None:
                status[i] = "missing"
                if ref_l is None:
                    ref_l = ref.to_pylist()
                disc[i] = float(len(ref_l[i] or ""))
                reason[i] = f"No extraction produced: {err_l[i]}"
                continue
            if eq_l[i]:
                status[i] = "matched"
                conf[i] = 100.0
                continue
            if ext_l is None:
                ext_l = ext.to_pylist()
            if ref_l is None:
                ref_l = ref.to_pylist()
            a, b = ext_l[i] or "", ref_l[i] or ""
            if not a:
                status[i] = "missing"
                disc[i] = float(len(b))
                reason[i] = "No extraction produced: empty result"
                continue
            edit_sim = levenshtein_ratio(a, b, cfg.max_edit_chars)
            tok_sim = token_set_ratio(a, b)
            combined = cfg.w_edit * (1.0 - edit_sim) + cfg.w_token * (1.0 - tok_sim)
            len_ok, len_disc, len_pct = rel_tolerance_match(
                float(len(a)), float(len(b)), cfg.tolerance
            )
            status[i] = "mismatch"
            disc[i] = (1.0 - edit_sim) * max(len(a), len(b))
            conf[i] = round((1.0 - combined) * 100.0, 2)
            parts = []
            if not len_ok:
                parts.append(
                    f"Length mismatch: extracted {len(a)} vs expected {len(b)} ({len_pct}% difference)"
                )
            if combined >= cfg.good_match_gate:
                parts.append(f"Alignment confidence: {round((1 - combined) * 100)}%")
            if not parts:
                parts.append(f"Content differs (alignment {round((1 - combined) * 100)}%)")
            reason[i] = "; ".join(parts)

        out = batch
        for (name, typ), vals in zip(VERDICT_FIELDS, (status, disc, reason, conf)):
            out = out.append_column(name, pa.array(vals, typ))
        return out

    return reconcile_batch


def reconcile_pages(ds, cfg: ReconcileConfig = DEFAULT_RECONCILE):
    """Extraction Dataset (+ is_duplicate) → verdict Dataset (same rows)."""
    return ds.map_batches(make_reconcile_fn(cfg), batch_format="pyarrow")
