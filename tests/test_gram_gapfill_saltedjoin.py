"""Gram matrix, hourly gap-fill, and the skew-tolerant salted join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_gram_matrix_matches_numpy(ray_session):
    """Distributed upper-triangle Gram == one-shot numpy int64 matmul,
    including the int64 dtype (the r2 as-of lesson: assert schemas)."""
    from invoice_ocr_reconciler_ray.pipelines.queries import embeddings_gram_matrix

    out = embeddings_gram_matrix(SF).to_pandas()
    assert str(out.sum_ij.dtype) == "int64" and str(out.n.dtype) == "int64"

    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["embedding"])
    vecs = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    fixed = np.floor(vecs * 1000.0 + 0.5).astype(np.int64)
    gram = fixed.T @ fixed
    d = fixed.shape[1]
    assert len(out) == d * (d + 1) // 2
    got = {(r.i, r.j): r.sum_ij for r in out.itertuples()}
    iu, ju = np.triu_indices(d)
    for i, j in zip(iu.tolist(), ju.tolist()):
        assert got[(i, j)] == gram[i, j]
    assert set(out.n) == {len(vecs)}


def test_gapfill_grid_is_dense_with_zero_rows(ray_session):
    """Every (type, hour) bucket between corpus min and max exists exactly
    once; absent buckets carry zeros; present buckets match pandas."""
    from invoice_ocr_reconciler_ray.pipelines.queries import events_gapfill_hourly

    out = events_gapfill_hourly(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    bucket = (ev.ts.astype("int64") // 3_600_000_000) * 3600
    cents = np.floor(ev.value.to_numpy() * 100 + 0.5).astype(np.int64)
    agg = (
        pd.DataFrame({"event_type": ev.event_type, "bucket_s": bucket, "c": cents})
        .groupby(["event_type", "bucket_s"])
        .agg(n_events=("c", "size"), sum_value_cents=("c", "sum"))
        .reset_index()
    )
    n_types = ev.event_type.nunique()
    n_hours = (bucket.max() - bucket.min()) // 3600 + 1
    assert len(out) == n_types * n_hours
    assert not out.duplicated(["event_type", "bucket_s"]).any()
    # zero-filled buckets genuinely occur at this sf
    assert (out.n_events == 0).any()
    m = out.merge(agg, on=["event_type", "bucket_s"], how="left", suffixes=("", "_w"))
    want_n = m.n_events_w.fillna(0).astype(np.int64)
    want_c = m.sum_value_cents_w.fillna(0).astype(np.int64)
    assert (m.n_events.to_numpy() == want_n.to_numpy()).all()
    assert (m.sum_value_cents.to_numpy() == want_c.to_numpy()).all()


def test_salted_join_exact_on_planted_hot_key(ray_session):
    """One key owning half the fact table: the salted join's output equals
    the plain pandas merge row-for-row, and the detector finds the key."""
    from invoice_ocr_reconciler_ray.stages.skew import hot_join_keys, salted_join

    rng = np.random.RandomState(7)
    hot_key = 42
    keys = np.concatenate(
        [np.full(500, hot_key, np.int64), rng.randint(0, 50, 500).astype(np.int64)]
    )
    vals = np.arange(len(keys), dtype=np.int64)
    fact_t = pa.table({"k": keys, "v": vals})
    dim_t = pa.table(
        {"dk": np.arange(60, dtype=np.int64), "name": [f"d{i}" for i in range(60)]}
    )
    fact = rd.from_arrow(fact_t).repartition(6)
    dim = rd.from_arrow(dim_t).repartition(3)

    hot = hot_join_keys(fact, key_col="k", threshold=200)
    assert hot.to_pylist() == [hot_key]

    out = (
        salted_join(
            fact, dim, fact_key="k", dim_key="dk", hot_keys=hot, buckets=4
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": keys, "v": vals})
        .merge(dim_t.to_pandas().rename(columns={"dk": "k"}), on="k")
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert (out.k.to_numpy() == want.k.to_numpy()).all()
    assert (out.v.to_numpy() == want.v.to_numpy()).all()
    assert out.name.tolist() == want.name.tolist()


def test_salted_join_no_hot_keys_degenerates_to_plain(ray_session):
    """Empty hot set: nothing replicated, join still exact."""
    from invoice_ocr_reconciler_ray.stages.skew import salted_join

    fact = rd.from_arrow(
        pa.table({"k": np.arange(20, dtype=np.int64), "v": np.arange(20, dtype=np.int64)})
    )
    dim = rd.from_arrow(
        pa.table({"dk": np.arange(0, 40, 2, dtype=np.int64), "w": np.arange(20, dtype=np.int64)})
    )
    out = (
        salted_join(
            fact,
            dim,
            fact_key="k",
            dim_key="dk",
            hot_keys=pa.array([], pa.int64()),
            buckets=4,
        )
        .to_pandas()
        .sort_values("k")
    )
    assert out.k.tolist() == list(range(0, 20, 2))
