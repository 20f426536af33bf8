"""Edge-case tests for the round-5 web-governance / engine-audit ops:
each op runs against a tiny synthetic table exercising a boundary the
sf-scale oracle data never hits (single rows, refill boundaries, bursts,
degenerate groups)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def mini_sf(tmp_path):
    """A minimal sf-dir with documents + events shaped for edge cases."""
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["alpha beta", "beta", "", "alpha beta alpha"]),
            "lang": pa.array(["en", "en", "de", "zh"]),
            "source": pa.array(["s0", "s0", "s1", "s1"]),
            "n_chars": pa.array([10, 4, 0, 16], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    # user 1: burst of 5 events 1s apart (cap 3 -> 2 throttled)
    # user 2: 3 events 700s apart (refill covers: all admitted)
    # user 3: single event
    ts = np.array(
        [base + i * 1_000_000 for i in range(5)]
        + [base + i * 700_000_000 for i in range(3)]
        + [base],
        dtype="datetime64[us]",
    )
    events = pa.table(
        {
            "event_id": pa.array(list(range(9)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 5 + [2] * 3 + [3], pa.int64()),
            "event_type": pa.array(["error"] * 5 + ["view"] * 4),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 1.5, 2.5, 3.5, 9.0]),
            "props": pa.array(["{}"] * 9),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    return str(tmp_path)


def test_rate_limiter_burst_and_refill(ray_session, mini_sf):
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        events_rate_limit_replay,
    )

    df = (
        events_rate_limit_replay(mini_sf)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    # user 1: cap 3, burst of 5 one second apart -> 3 admitted, 2 throttled
    assert df.loc[1, "n_admitted"] == 3 and df.loc[1, "n_throttled"] == 2
    # user 2: 700s gaps exceed the 600s refill -> every event admitted
    assert df.loc[2, "n_admitted"] == 3 and df.loc[2, "n_throttled"] == 0
    # user 3: single event always admitted, level cap-1 remains
    assert df.loc[3, "n_admitted"] == 1 and df.loc[3, "final_level"] == 2


def test_robots_gate_empty_rules_allows_everything(ray_session, mini_sf, monkeypatch):
    from invoice_ocr_reconciler_ray.pipelines.queries import _q10_web

    monkeypatch.setattr(_q10_web, "_ROBOTS_TXT", "User-agent: graftbot\n")
    df = _q10_web.docs_robots_gate(mini_sf).to_pandas()
    assert df["allowed"].all() and (df["rule"] == "").all()


def test_sitemap_audit_counts(ray_session, mini_sf):
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        docs_sitemap_coverage_audit,
    )

    df = (
        docs_sitemap_coverage_audit(mini_sf)
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    # en holds ids {0,1}: 1 listed (id 1), 1 unlisted (id 0 % 3 == 0)
    assert df.loc["en", "n_listed"] == 1 and df.loc["en", "n_unlisted"] == 1
    # de holds id 2 only: listed, empty-text doc still participates
    assert df.loc["de", "n_listed"] == 1 and df.loc["de", "n_corpus"] == 1


def test_haar_single_event_has_zero_energy(ray_session, mini_sf):
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        events_user_haar_energy,
    )

    df = (
        events_user_haar_energy(mini_sf)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert df.loc[3, "l1_energy"] == 0 and df.loc[3, "l2_energy"] == 0
    # user 1 values cents: 100,200,300,400,(500 dropped) -> d1 = -100,-100
    assert df.loc[1, "l1_energy"] == 100 * 100 * 2
    # l2: s1 = 300,700 -> d2 = -400
    assert df.loc[1, "l2_energy"] == 400 * 400


def test_fair_share_on_mini(ray_session, mini_sf):
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        events_fair_share_schedule_audit,
    )

    df = (
        events_fair_share_schedule_audit(mini_sf)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    # queues 5,3,1 in RR: round widths are 3,2,2,1,1 so user3's single
    # task finishes at pos 3, user2's last at 3+2+2=7, user1's at 9
    assert df.loc[3, "last_finish_pos"] == 3
    assert df.loc[2, "last_finish_pos"] == 7
    assert df.loc[1, "last_finish_pos"] == 9


def test_merkle_root_mini_matches_manual(ray_session, mini_sf):
    import hashlib

    from invoice_ocr_reconciler_ray.pipelines.queries import docs_merkle_root

    t = docs_merkle_root(mini_sf)
    texts = ["alpha beta", "beta", "", "alpha beta alpha"]
    leaves = [
        hashlib.md5(f"{i}:{s}".encode()).hexdigest() for i, s in enumerate(texts)
    ]
    l1 = [
        hashlib.md5((leaves[0] + leaves[1]).encode()).hexdigest(),
        hashlib.md5((leaves[2] + leaves[3]).encode()).hexdigest(),
    ]
    root = hashlib.md5((l1[0] + l1[1]).encode()).hexdigest()
    assert t.column("root_md5")[0].as_py() == root
    assert t.column("n_leaves")[0].as_py() == 4
    assert t.column("depth")[0].as_py() == 2


def test_bloom_audit_members_always_hit(ray_session, mini_sf):
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        docs_bloom_membership_audit,
    )

    t = docs_bloom_membership_audit(mini_sf)
    row = {c: t.column(c)[0].as_py() for c in t.column_names}
    assert row["n_probed"] == 4 and row["n_members"] == 1  # only doc_id 0
    assert row["n_hits"] >= row["n_members"]  # no false negatives, ever
    assert row["n_false_pos"] == row["n_hits"] - row["n_members"]
