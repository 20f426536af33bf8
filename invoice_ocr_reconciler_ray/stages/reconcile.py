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
    levenshtein_ratio,  # noqa: F401  (re-exported; scalar reference kernel)
    levenshtein_ratio_many,
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
        import numpy as np

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

        # vectorized class masks, same precedence as the reference
        # (duplicate > error-missing > matched > slow path) — the ~97% fast
        # rows never enter Python; only the mismatch/empty tail loops
        dup_m = pc.fill_null(isdup, False).to_numpy(zero_copy_only=False)
        err_m = (~dup_m) & pc.is_valid(err).to_numpy(zero_copy_only=False)
        eq_m = (
            (~dup_m)
            & (~err_m)
            & pc.fill_null(equal, False).to_numpy(zero_copy_only=False)
        )
        slow_m = ~(dup_m | err_m | eq_m)

        status = np.empty(n, dtype=object)
        disc = np.zeros(n, dtype=np.float64)
        reason = np.full(n, None, dtype=object)
        conf = np.zeros(n, dtype=np.float64)

        status[dup_m] = "duplicate"
        conf[dup_m] = 100.0
        reason[dup_m] = "Duplicate url"
        status[eq_m] = "matched"
        conf[eq_m] = 100.0

        if err_m.any():
            status[err_m] = "missing"
            ref_len = pc.utf8_length(pc.fill_null(ref, "")).to_numpy(
                zero_copy_only=False
            )
            disc[err_m] = ref_len[err_m].astype(np.float64)
            eidx = np.nonzero(err_m)[0]
            errs = pc.take(err, pa.array(eidx)).to_pylist()
            reason[eidx] = [f"No extraction produced: {e}" for e in errs]

        sidx = np.nonzero(slow_m)[0]
        if len(sidx):
            take = pa.array(sidx)
            ext_l = [s or "" for s in pc.take(ext, take).to_pylist()]
            ref_l = [s or "" for s in pc.take(ref, take).to_pylist()]
            # one batched DP for the whole mismatch tail (pair-axis
            # vectorized; bit-identical to the scalar kernel)
            edit_sims = levenshtein_ratio_many(ext_l, ref_l, cfg.max_edit_chars)
            for j, i in enumerate(sidx):
                a, b = ext_l[j], ref_l[j]
                if not a:
                    status[i] = "missing"
                    disc[i] = float(len(b))
                    reason[i] = "No extraction produced: empty result"
                    continue
                edit_sim = float(edit_sims[j])
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
            out = out.append_column(name, pa.array(vals.tolist(), typ))
        return out

    return reconcile_batch


def reconcile_pages(ds, cfg: ReconcileConfig = DEFAULT_RECONCILE):
    """Extraction Dataset (+ is_duplicate) → verdict Dataset (same rows)."""
    return ds.map_batches(make_reconcile_fn(cfg), batch_format="pyarrow")
