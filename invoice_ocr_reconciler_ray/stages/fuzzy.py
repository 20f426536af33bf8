"""Generic fuzzy reconciliation — the reference's engine as a reusable op.

≙ reconcile() (reconciliationEngine.js:37-213) for the general case where the
"expected" side is a separate small table (the payment register):

* J1 broadcast fuzzy lookup: the register is ``ray.put`` ONCE; every task
  probes it per row (the reference builds a Fuse index over the whole
  register in memory, :53-67 — it is by construction the small side).
* J2 candidate re-scoring: top-10 candidates, combined = 0.6·vendor +
  0.4·amount (:113, :122).
* J3 amount tolerance 1% with the both-zero edge (:25-35).
* J4 greedy 1:1 assignment: the reference's scan-order greediness is
  order-sensitive and does NOT parallelize; the engine's documented semantic
  (SURVEY §7.4) is assignment-by-reduction — every invoice proposes its best
  candidate, then ``groupby(record_id).map_groups`` awards each record to
  the LOWEST (combined_score, invoice_id) proposer; losers fall back to
  ``missing`` with the reference's "already used" flag reason (:146).
  One shuffle, key = proposed record_id.
* J6 amount-based suggestions (limit 3, confidence 50, :91-94).
* A1 duplicate invoice-number flagging, first-wins by invoice_id (:43-51).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..config import DEFAULT_RECONCILE, ReconcileConfig
from ..functions.similarity import (
    levenshtein_many,
    levenshtein_ratio,
    myers_distance_many,
    pack_myers,
    pack_strings,
    rel_tolerance_match,
)


def _norm_vendor(name: str) -> str:
    import re

    s = (name or "").lower()
    s = re.sub(r"\b(ltd|limited|inc|incorporated|llc|corp|corporation|co|company|pvt|private)\b\.?", "", s)
    s = re.sub(r"[^a-z0-9\s]", "", s)
    return re.sub(r"\s+", " ", s).strip()


def _propose_batch(batch: pa.Table, reg_ref, cfg: ReconcileConfig) -> pa.Table:
    """Per-invoice: fuzzy candidates from the broadcast register, best
    proposal + duplicate flag.  Emits one row per invoice."""
    packed = ray.get(reg_ref)  # {"rows": [...], "mat", "lens", "ids", "myers"}
    reg = packed["rows"]  # list of dicts: id, vendor_norm, expected_amount
    regmat, reglens, reg_ids = packed["mat"], packed["lens"], packed["ids"]
    myers = packed["myers"]
    ids = batch.column("id").to_pylist()
    vendors = batch.column("vendor_name").to_pylist()
    amounts = batch.column("total_amount").to_pylist()
    dups = (
        batch.column("is_duplicate").to_pylist()
        if "is_duplicate" in batch.column_names
        else [False] * len(ids)
    )
    out = {
        "invoice_id": [],
        "proposed_record_id": [],
        "combined_score": [],
        "discrepancy": [],
        "amount_ok": [],
        "vendor_score": [],
        "match_status": [],
        "flag_reason": [],
        "confidence_score": [],
        "suggestions": [],
        # hidden carry-through for the award reduction's loser demotion
        # (dropped on output): invoice amount, raw vendor, candidate ids
        "_amount": [],
        "_vendor": [],
        "_cands": [],
    }
    for inv_id, vend, amt, is_dup in zip(ids, vendors, amounts, dups):
        if is_dup:
            _emit(out, inv_id, None, 0.0, 0.0, False, 0.0, "duplicate",
                  "Duplicate invoice number", 100.0, [], 0.0, vend, [])
            continue
        nv = _norm_vendor(vend)
        nv_len = len(nv)
        amt = float(amt or 0.0)
        # batched exact DP: one numpy recurrence scores nv against EVERY
        # register name at once (functions/similarity.levenshtein_many) —
        # R× fewer Python-level DPs than the per-pair loop.  vs = dist /
        # max(len) ≡ 1 - levenshtein_ratio for names under max_edit_chars
        # (vendor names always are; the rare long name falls back below).
        if nv_len <= cfg.max_edit_chars and reg:
            import numpy as np

            # Myers bit-parallel when every register name fits a 64-bit
            # word (always, for vendor names); DP-row batch otherwise —
            # both bit-identical to the scalar DP
            if myers is not None:
                dists = myers_distance_many(nv, myers)
            else:
                dists = levenshtein_many(nv, regmat, reglens)
            denom = np.maximum(np.maximum(reglens, nv_len), 1)
            vs_arr = dists / denom
            # ≙ Fuse threshold 0.4 (reconciliationEngine.js:56); only the
            # top-10 by (vs, id) are ever consumed downstream, so select
            # them vectorized instead of materializing every candidate
            cand = np.nonzero(vs_arr <= 0.4)[0]
            if len(cand):
                order = np.lexsort((reg_ids[cand], vs_arr[cand]))
                scored = [(float(vs_arr[i]), reg[i]) for i in cand[order[:10]]]
            else:
                scored = []
        else:
            scored = []
            for r in reg:
                vs = 1.0 - levenshtein_ratio(nv, r["vendor_norm"], cfg.max_edit_chars)
                if vs <= 0.4:
                    scored.append((vs, r))
            scored.sort(key=lambda t: (t[0], t[1]["id"]))
            scored = scored[:10]
        if not scored:
            sugg = [
                r["id"]
                for r in reg
                if rel_tolerance_match(amt, float(r["expected_amount"]), cfg.tolerance)[0]
            ][:3]  # ≙ amount-based suggestions :91-94
            _emit(out, inv_id, None, 1.0, amt, False, 1.0, "missing",
                  f"No matching vendor found in payment register for: {vend}", 0.0, sugg,
                  amt, vend, [])
            continue
        best = None
        for vs, r in scored[:10]:  # ≙ top-10 re-scoring :113
            ok, disc, pct = rel_tolerance_match(amt, float(r["expected_amount"]), cfg.tolerance)
            amount_score = pct / 100.0
            combined = cfg.w_edit * vs + cfg.w_token * amount_score  # :122
            if best is None or (combined, r["id"]) < (best[0], best[1]["id"]):
                best = (combined, r, ok, disc, vs)
        combined, r, ok, disc, vs = best
        conf = round((1.0 - combined) * 100.0, 2)
        cands = [s[1]["id"] for s in scored[:3]]  # ≙ candidates.slice(0,3) :151
        if ok and vs < cfg.good_match_gate:  # :160
            _emit(out, inv_id, r["id"], combined, disc, True, vs, "matched", None,
                  max(conf, 70.0), [], amt, vend, cands)
        else:
            reasons = []
            if not ok:
                reasons.append(
                    f"Amount mismatch: Invoice ${amt:.2f} vs Expected ${float(r['expected_amount']):.2f}"
                )
            if vs >= cfg.good_match_gate:
                reasons.append(f"Vendor name fuzzy match confidence: {round((1 - vs) * 100)}%")
            _emit(out, inv_id, r["id"], combined, disc, ok, vs, "mismatch",
                  "; ".join(reasons), conf, cands, amt, vend, cands)
    return pa.Table.from_pydict(
        {
            "invoice_id": pa.array(out["invoice_id"], pa.string()),
            "proposed_record_id": pa.array(out["proposed_record_id"], pa.string()),
            "combined_score": pa.array(out["combined_score"], pa.float64()),
            "discrepancy": pa.array(out["discrepancy"], pa.float64()),
            "amount_ok": pa.array(out["amount_ok"], pa.bool_()),
            "vendor_score": pa.array(out["vendor_score"], pa.float64()),
            "match_status": pa.array(out["match_status"], pa.string()),
            "flag_reason": pa.array(out["flag_reason"], pa.string()),
            "confidence_score": pa.array(out["confidence_score"], pa.float64()),
            "suggestions": pa.array(out["suggestions"], pa.list_(pa.string())),
            "_amount": pa.array(out["_amount"], pa.float64()),
            "_vendor": pa.array(out["_vendor"], pa.string()),
            "_cands": pa.array(out["_cands"], pa.list_(pa.string())),
        }
    )


def _emit(out, inv, rec, comb, disc, ok, vs, status, reason, conf, sugg,
          amount, vendor, cands):
    out["invoice_id"].append(str(inv))
    # "" sentinel, not null: the groupby key must be total-orderable in the
    # sort-based shuffle path; restored to null on output
    out["proposed_record_id"].append("" if rec is None else str(rec))
    out["combined_score"].append(comb)
    out["discrepancy"].append(float(disc))
    out["amount_ok"].append(bool(ok))
    out["vendor_score"].append(vs)
    out["match_status"].append(status)
    out["flag_reason"].append(reason)
    out["confidence_score"].append(conf)
    out["suggestions"].append([str(s) for s in sugg])
    out["_amount"].append(float(amount))
    out["_vendor"].append(str(vendor or ""))
    out["_cands"].append([str(c) for c in cands])


def fuzzy_reconcile(invoices_ds, register_rows: list[dict], cfg: ReconcileConfig = DEFAULT_RECONCILE):
    """invoices Dataset(id, vendor_name, total_amount[, is_duplicate]) ×
    small register list({id, vendor_name, expected_amount}) → verdict Dataset.

    Returns one row per invoice with the reference's status vocabulary; the
    1:1 award happens in a ``groupby(proposed_record_id).map_groups``
    reduction (deterministic, parallel-safe)."""
    reg = []
    for r in register_rows:
        vn = _norm_vendor(r.get("vendor_name", ""))
        reg.append(
            {
                "id": str(r["id"]),
                "vendor_norm": vn,
                "vendor_len": len(vn),
                "expected_amount": float(r.get("expected_amount", 0) or 0),
            }
        )
    # pack the register names once for the batched DP (broadcast with rows)
    import numpy as np

    names = [r["vendor_norm"] for r in reg]
    mat, lens = pack_strings(names)
    ids_np = np.array([r["id"] for r in reg])
    from .broadcast import guard_broadcast_bytes, table_nbytes

    guard_broadcast_bytes(
        table_nbytes(mat) + table_nbytes(lens) + table_nbytes(ids_np),
        label="fuzzy_reconcile register broadcast (ST2)",
        alternative="block the register by a coarse key and use "
        "stages/linkage.py:blocked_fuzzy_join per partition",
    )
    reg_ref = ray.put(
        {"rows": reg, "mat": mat, "lens": lens, "ids": ids_np, "myers": pack_myers(names)}
    )
    proposals = invoices_ds.map_batches(
        lambda b: _propose_batch(b, reg_ref, cfg), batch_format="pyarrow"
    )

    def _compact(t: pa.Table) -> pa.Table:
        # rebuild to compact buffers: Ray's zero-copy pickling of sliced list
        # columns trips ArrowIndexError on offset buffers (pyarrow 16), and
        # map_groups hands us slices of the sorted block
        return pa.Table.from_pydict(t.to_pydict(), schema=t.schema)

    def award(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group
        rec = group.column("proposed_record_id")[0].as_py()
        if not rec or group.num_rows == 1:
            return _compact(group)
        g = group.sort_by([("combined_score", "ascending"), ("invoice_id", "ascending")])
        winner = g.slice(0, 1)
        losers = g.slice(1)
        # losers: record already claimed → the reference's full missing-path
        # row (≙ :140-155): discrepancy = invoice amount, amount_ok False,
        # vendor_score 1.0, suggestions = the candidate list, vendor in reason
        n = losers.num_rows
        reasons = pa.array(
            [
                f"All potential matching records already used. Vendor: {v}"
                for v in losers.column("_vendor").to_pylist()
            ],
            pa.string(),
        )
        losers = (
            losers.drop_columns(
                [
                    "match_status", "flag_reason", "proposed_record_id",
                    "confidence_score", "discrepancy", "amount_ok",
                    "vendor_score", "suggestions",
                ]
            )
            .append_column("match_status", pa.array(["missing"] * n, pa.string()))
            .append_column("flag_reason", reasons)
            .append_column("proposed_record_id", pa.array([""] * n, pa.string()))
            .append_column("confidence_score", pa.array([0.0] * n, pa.float64()))
            .append_column("discrepancy", losers.column("_amount"))
            .append_column("amount_ok", pa.array([False] * n, pa.bool_()))
            .append_column("vendor_score", pa.array([1.0] * n, pa.float64()))
            .append_column("suggestions", losers.column("_cands"))
            .select(winner.column_names)
        )
        return _compact(pa.concat_tables([winner, losers]))

    awarded = proposals.groupby("proposed_record_id").map_groups(award, batch_format="pyarrow")

    def restore_null(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_amount", "_vendor", "_cands"])
        col = t.column("proposed_record_id")
        fixed = pa.compute.if_else(
            pa.compute.equal(col, ""), pa.scalar(None, pa.string()), col
        )
        return t.set_column(
            t.column_names.index("proposed_record_id"), "proposed_record_id", fixed
        )

    return awarded.map_batches(restore_null, batch_format="pyarrow")
