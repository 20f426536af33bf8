"""Patch-Dataset overlay (≙ reference mutation surface: manual link
server.js:471-505, update :371-427, delete :476-501) — idempotency, sparse
field semantics, tombstones, last-write-wins."""

import pyarrow as pa
import ray.data as rd

from invoice_ocr_reconciler_ray.stages.overlay import (
    apply_overlay,
    manual_link_overlay,
)

SF = "/root/testdata/sf0.001"


def _base():
    return rd.from_arrow(
        pa.table(
            {
                "id": ["a", "b", "c", "d"],
                "status": ["missing", "matched", "missing", "mismatch"],
                "amount": [10.0, 20.0, 30.0, 40.0],
            }
        )
    )


def _overlay():
    return pa.table(
        {
            "id": ["a", "c", "d"],
            "status": ["matched", None, "matched"],  # null = leave unchanged
            "amount": [None, None, 44.0],
            "deleted": [False, True, False],
        }
    )


def test_overlay_patches_and_tombstones(ray_session):
    out = apply_overlay(_base(), _overlay(), key_col="id").to_pandas().set_index("id")
    assert "c" not in out.index  # tombstoned
    assert out.loc["a"].status == "matched" and out.loc["a"].amount == 10.0
    assert out.loc["b"].status == "matched" and out.loc["b"].amount == 20.0  # untouched
    assert out.loc["d"].status == "matched" and out.loc["d"].amount == 44.0


def test_overlay_idempotent(ray_session):
    once = apply_overlay(_base(), _overlay(), key_col="id")
    twice = apply_overlay(once, _overlay(), key_col="id")
    a = once.to_pandas().sort_values("id").reset_index(drop=True)
    b = twice.to_pandas().sort_values("id").reset_index(drop=True)
    assert a.equals(b)


def test_overlay_last_write_wins(ray_session):
    ov = pa.table(
        {
            "id": ["a", "a"],
            "status": ["mismatch", "matched"],  # second UPDATE wins
            "amount": [None, None],
        }
    )
    out = apply_overlay(_base(), ov, key_col="id").to_pandas().set_index("id")
    assert out.loc["a"].status == "matched"


def test_manual_link_semantics(ray_session):
    """The manual-link overlay writes exactly the reference's patch
    (server.js:489-494): matched / 'Manually reconciled' / confidence 100 /
    discrepancy defaulting to 0."""
    ov = manual_link_overlay(
        [{"key": "i1", "record_id": "r9"}, {"key": "i2", "record_id": "r7", "discrepancy": 5.5}]
    )
    base = rd.from_arrow(
        pa.table(
            {
                "invoice_id": ["i1", "i2", "i3"],
                "proposed_record_id": [None, None, "r1"],
                "match_status": ["missing", "missing", "matched"],
                "discrepancy": [100.0, 50.0, 0.0],
                "flag_reason": ["No matching vendor found", "x", None],
                "confidence_score": [0.0, 0.0, 90.0],
            }
        )
    )
    out = apply_overlay(base, ov, key_col="invoice_id").to_pandas().set_index("invoice_id")
    assert out.loc["i1"].match_status == "matched"
    assert out.loc["i1"].proposed_record_id == "r9"
    assert out.loc["i1"].flag_reason == "Manually reconciled"
    assert out.loc["i1"].confidence_score == 100.0 and out.loc["i1"].discrepancy == 0.0
    assert out.loc["i2"].discrepancy == 5.5
    assert out.loc["i3"].match_status == "matched" and out.loc["i3"].confidence_score == 90.0


def test_reconcile_manual_link_query(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        fuzzy_reconcile_demo,
        reconcile_manual_link,
    )

    before = fuzzy_reconcile_demo(SF).to_pandas().set_index("invoice_id")
    after = reconcile_manual_link(SF).to_pandas().set_index("invoice_id")
    assert len(before) == len(after)
    linked = [k for k in after.index if int(k) % 30 == 0]
    assert linked, "fixture links every 30th customer"
    for k in linked:
        assert after.loc[k].match_status == "matched"
        assert after.loc[k].flag_reason == "Manually reconciled"
        assert after.loc[k].proposed_record_id == f"reg-manual-{k}"
    untouched = [k for k in after.index if int(k) % 30 != 0]
    assert (
        after.loc[untouched].match_status.sort_index()
        .equals(before.loc[untouched].match_status.sort_index())
    )


def test_orders_patch_overlay_query(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_patch_overlay

    out = orders_patch_overlay(SF).to_pandas().set_index("o_orderkey")
    assert not [k for k in out.index if k % 251 == 0]  # tombstones gone
    patched = [k for k in out.index if k % 97 == 0]
    assert patched and (out.loc[patched].o_orderstatus == "X").all()
