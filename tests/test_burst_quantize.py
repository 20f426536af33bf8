"""Streaming burst dedup and int8 embedding quantization."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_burst_dedup_matches_pandas_lag(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import events_burst_dedup

    out = events_burst_dedup(SF).to_pandas().sort_values("event_id")
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )
    ev = ev.sort_values(["user_id", "event_type", "ts", "event_id"])
    us = ev.ts.astype("int64")
    prev = us.groupby([ev.user_id, ev.event_type]).shift(1)
    want = ((us - prev) <= 21_600_000_000).fillna(False)
    w = pd.DataFrame({"event_id": ev.event_id, "is_burst": want}).sort_values(
        "event_id"
    )
    assert len(out) == len(w)
    assert out.is_burst.tolist() == w.is_burst.tolist()
    # both classes occur
    assert 0 < out.is_burst.sum() < len(out)


def test_quantize_int8_matches_numpy_and_bounds(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import embeddings_quantize_int8

    out = embeddings_quantize_int8(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    mx = np.abs(vecs).max(axis=1)
    safe = np.where(mx == 0, 1.0, mx)
    q = np.floor(vecs * 127.0 / safe[:, None] + 0.5).astype(np.int64)
    n, d = vecs.shape
    assert len(out) == n * d
    out = out.sort_values(["vec_id", "dim"]).reset_index(drop=True)
    order = np.argsort(emb.vec_id.to_numpy(), kind="stable")
    assert (out.qval.to_numpy() == q[order].ravel()).all()
    assert out.qval.abs().max() <= 127
    # every vector's largest-magnitude component hits ±127 exactly
    peak = out.groupby("vec_id").qval.apply(lambda s: s.abs().max())
    assert (peak == 127).all()
    want_scale = np.floor(mx * 1_000_000 + 0.5).astype(np.int64)
    got_scale = out.groupby("vec_id").scale_ppm.first()
    assert (got_scale.to_numpy() == want_scale[order]).all()
