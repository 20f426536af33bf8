"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The clustering counterpart of the ANN family (``stages/ann.py`` builds
IVF coarse centroids from a seeded sample; this is the full iterative fit
— corpus clustering / semantic bucketing for training-data curation).

Scale + determinism design (the two properties a 100 TB fit needs):

- **Deterministic seeding**: the k rows with the smallest
  ``splitmix64(id)`` are the initial centroids — found via per-block
  partial top-k-smallest + an O(k) driver merge, so the seed set is a pure
  function of the DATA, independent of partitioning or parallelism.
- **One pass per Lloyd iteration**, shuffle-free: every ``map_batches``
  task assigns its rows to the nearest centroid (one numpy matmul) and
  emits a (k × d) partial SUM + k counts.  Sums are accumulated in
  **fixed-point int64** (``round(v * 2^20)``): integer addition is exactly
  associative/commutative, so the merged centroids are BIT-IDENTICAL at
  any parallelism / block layout — float partial sums would drift with
  the block boundaries and break the cross-cluster-size output-identity
  invariant.  (Range: |v| ≤ 100 float32 inputs overflow int64 only beyond
  ~8·10^13 rows per cluster.)
- Empty clusters keep their previous centroid; ties go to the lowest
  centroid index (numpy argmin), matching the assignment stage.
- Driver state is O(k·d) ints; the broadcast per iteration is the k×d
  centroid matrix via ``ray.put``.

The reference app has no clustering op — this is a graft-mandated scale
extension alongside near-dup clustering (``stages/neardup.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.sketches import splitmix64

SCALE = 1 << 20


def _vecs(t: pa.Table, vec_col: str) -> np.ndarray:
    col = t[vec_col].combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, flat.size // n)


def _nearest(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # argmin_c |x-c|^2 = argmin_c (|c|^2 - 2 x.c); ties -> lowest index
    scores = (cents * cents).sum(axis=1)[None, :] - 2.0 * (vecs @ cents.T)
    return np.argmin(scores, axis=1)


def kmeans_fit(
    ds,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 10,
) -> np.ndarray:
    """Fit k centroids; returns float64 (k, d).  ``ds`` is executed
    ``iters + 1`` times — pass a materialized narrow (id, vec) dataset when
    it fits the object store, or the lazy parquet read when it doesn't
    (each Lloyd pass then re-reads column-pruned parquet, the 100 TB mode).
    """

    def seed_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {"h": pa.array([], pa.uint64()), id_col: pa.array([], pa.int64()),
                 "vec": pa.array([], pa.list_(pa.float64()))}
            )
        h = splitmix64(ids)
        take = np.argsort(h, kind="stable")[:k]
        vecs = _vecs(t, vec_col)[take]
        return pa.table(
            {
                "h": pa.array(h[take], pa.uint64()),
                id_col: pa.array(ids[take], pa.int64()),
                "vec": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )

    cand: list[tuple[int, int, np.ndarray]] = []
    for b in ds.map_batches(seed_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for h, i, v in zip(
            b["h"].to_pylist(), b[id_col].to_pylist(), b["vec"].to_pylist()
        ):
            cand.append((int(h), int(i), np.asarray(v, dtype=np.float64)))
    cand.sort(key=lambda t: (t[0], t[1]))
    cents = np.stack([v for _, _, v in cand[:k]])
    k_eff = len(cents)

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            vecs = _vecs(t, vec_col)
            sums = np.zeros((k_eff, c.shape[1]), dtype=np.int64)
            counts = np.zeros(k_eff, dtype=np.int64)
            if len(vecs):
                lab = _nearest(vecs, c)
                fixed = np.rint(vecs * SCALE).astype(np.int64)
                np.add.at(sums, lab, fixed)
                np.add.at(counts, lab, 1)
            return pa.table(
                {
                    "sums": pa.array([sums.tobytes()], pa.binary()),
                    "counts": pa.array([counts.tobytes()], pa.binary()),
                }
            )

        tot_s = np.zeros((k_eff, cents.shape[1]), dtype=np.int64)
        tot_n = np.zeros(k_eff, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for sraw, nraw in zip(b["sums"].to_pylist(), b["counts"].to_pylist()):
                tot_s += np.frombuffer(sraw, dtype=np.int64).reshape(tot_s.shape)
                tot_n += np.frombuffer(nraw, dtype=np.int64)
        nonempty = tot_n > 0
        new = cents.copy()
        new[nonempty] = tot_s[nonempty] / (SCALE * tot_n[nonempty, None])
        if np.array_equal(new, cents):
            break
        cents = new
    return cents


def kmeans_assign(
    ds, centroids: np.ndarray, *, vec_col: str = "embedding", id_col: str = "vec_id"
):
    """(id_col, cluster_id) Dataset — one broadcast + one vectorized pass."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        vecs = _vecs(t, vec_col)
        lab = _nearest(vecs, c) if len(vecs) else np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster_id": pa.array(lab.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans(ds, *, vec_col: str = "embedding", id_col: str = "vec_id", k: int = 8,
           iters: int = 10):
    """Fit + assign. The input plan is executed iters+2 times — materialize
    the narrow (id, vec) projection upstream when it fits the store."""
    cents = kmeans_fit(ds, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    return kmeans_assign(ds, cents, vec_col=vec_col, id_col=id_col)
