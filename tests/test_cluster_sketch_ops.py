"""Bloom-filter incremental dedup and distributed k-means: no-false-negative
and merge laws, exact-output equivalence of the bloom-prefiltered path, and
bit-identical k-means centroids across block layouts (the fixed-point
partial-sum determinism contract)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _planted_vectors(n_per: int = 40, k: int = 5, d: int = 16):
    """Well-separated deterministic clusters: center c at 10*e_c plus a small
    deterministic jitter — nearest-true-center purity is 100% by construction."""
    rng = np.random.RandomState(7)
    vecs, labels = [], []
    for c in range(k):
        center = np.zeros(d)
        center[c] = 10.0
        for _ in range(n_per):
            vecs.append(center + rng.uniform(-0.5, 0.5, size=d))
            labels.append(c)
    ids = np.arange(len(vecs), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    return tbl, np.array(labels)


def test_bloom_no_false_negatives_and_fp_bound():
    from invoice_ocr_reconciler_ray.functions.sketches import (
        bloom_add_hashes,
        bloom_contains_hashes,
        bloom_empty,
        bloom_hash_keys,
        bloom_merge,
    )

    keys = np.arange(5000, dtype=np.int64)
    bits = bloom_empty(1 << 17)  # ~26 bits/key
    bloom_add_hashes(bits, bloom_hash_keys(keys))
    assert bloom_contains_hashes(bits, bloom_hash_keys(keys)).all()  # no FN, ever
    fresh = np.arange(1_000_000, 1_020_000, dtype=np.int64)
    fp = bloom_contains_hashes(bits, bloom_hash_keys(fresh)).mean()
    assert fp < 0.001
    # partial blooms over subsets OR-merge to the exact union bitset
    b1, b2 = bloom_empty(1 << 17), bloom_empty(1 << 17)
    bloom_add_hashes(b1, bloom_hash_keys(keys[:2500]))
    bloom_add_hashes(b2, bloom_hash_keys(keys[2500:]))
    assert (bloom_merge(b1, b2) == bits).all()
    # string keys route through blake2b and stay deterministic
    a = bloom_hash_keys(["x", "y", None])
    assert (a == bloom_hash_keys(["x", "y", None])).all()


def test_bloom_stage_flags_superset_of_truth(ray_session):
    from invoice_ocr_reconciler_ray.stages.dedup import bloom_flag_seen, flag_seen_before

    prior = rd.from_arrow(
        pa.table({"k": pa.array([f"key-{i}" for i in range(200)], pa.string())})
    )
    new = rd.from_arrow(
        pa.table(
            {"k": pa.array([f"key-{i}" for i in range(100, 400)], pa.string())}
        )
    )
    got = (
        bloom_flag_seen(new, prior, key_col="k")
        .to_pandas()
        .set_index("k")["maybe_seen"]
    )
    want = (
        flag_seen_before(new, prior, key_col="k")
        .to_pandas()
        .set_index("k")["seen_before"]
    )
    # every truly-seen key is flagged (no false negatives) ...
    assert got[want[want].index].all()
    # ... and at 2^20 bits / 200 keys the FP count is zero in practice
    assert (got == want).all()


def test_dedup_incremental_bloom_equals_exact(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        dedup_incremental,
        dedup_incremental_bloom,
    )

    exact = (
        dedup_incremental(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    bloom = (
        dedup_incremental_bloom(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert exact.equals(bloom)
    assert dict(bloom.dtypes.astype(str)) == {"doc_id": "int64", "seen_before": "bool"}


def test_kmeans_recovers_planted_clusters(ray_session):
    from invoice_ocr_reconciler_ray.stages.cluster import kmeans, kmeans_fit

    tbl, labels = _planted_vectors()
    ds = rd.from_arrow(tbl)
    out = kmeans(ds, k=5, iters=10).to_pandas().sort_values("vec_id")
    assert len(out) == len(labels)
    # each k-means cluster maps 1:1 onto one planted label (pure clusters)
    got = out["cluster_id"].to_numpy()
    for c in np.unique(got):
        assert len(np.unique(labels[got == c])) == 1
    assert len(np.unique(got)) == 5
    cents = kmeans_fit(ds, k=5, iters=10)
    assert cents.shape == (5, 16)
    # centroids sit at the planted centers (one spike ~10 per centroid)
    assert (np.sort(cents.max(axis=1)) > 9.0).all()


def test_kmeans_bit_identical_across_block_layouts(ray_session):
    from invoice_ocr_reconciler_ray.stages.cluster import kmeans_fit

    tbl, _ = _planted_vectors()
    a = kmeans_fit(rd.from_arrow(tbl).repartition(1), k=5, iters=6)
    b = kmeans_fit(rd.from_arrow(tbl).repartition(13), k=5, iters=6)
    assert np.array_equal(a, b)  # bit-identical, not just close


def test_term_postings_lists_are_sorted_and_counted(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import term_postings

    out = term_postings(SF).to_pandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        ids = [int(x) for x in r["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == len(set(ids)) == r["n_docs"]


def test_label_centroid_partials_bit_identical_and_schema(ray_session):
    """The exposed vector-aggregation op: fixed-point int64 sums are exactly
    associative, so any block layout yields the same bytes; schema stays
    all-int64 (the dtype class the r2 asof bug lived in)."""
    from invoice_ocr_reconciler_ray.pipelines.queries import embeddings_label_centroids

    out = embeddings_label_centroids(SF).to_pandas().sort_values(["label", "dim"])
    assert {str(t) for t in out.dtypes} == {"int64"}
    n_labels = out["label"].nunique()
    d = out["dim"].nunique()
    assert len(out) == n_labels * d
    # per-label count is constant across dims (every vector has every dim)
    assert (out.groupby("label")["n"].nunique() == 1).all()
