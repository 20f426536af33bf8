"""Approximate-nearest-neighbour search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE via
``ray.put`` (never re-shipped per batch); each ``map_batches`` task computes
a numpy matmul against its batch and emits only its LOCAL top-k per query
(per-batch partial top-k), so the final per-query reduction sees
k × num_batches candidate rows instead of N×Q.

Scale path: ``ivf_topk`` — coarse k-means-style centroids (deterministically
seeded sample), assign each row to its nearest centroid inside map_batches,
probe only the ``nprobe`` closest centroids per query.  Same broadcast
pattern; the recall/latency trade is the standard IVF one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _topk_partial(batch: pa.Table, qref, k: int, emb_col: str, id_col: str) -> pa.Table:
    q = ray.get(qref)  # dict: query_ids (int64[Q]), matrix (float64[Q, D]) unit-norm
    ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
    emb = np.asarray(batch.column(emb_col).to_pylist(), dtype=np.float64)
    if len(ids) == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
            names=["query_id", "vec_id", "sim"],
        )
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    unit = emb / norms[:, None]
    sims = q["matrix"] @ unit.T  # (Q, B)
    out_q, out_v, out_s = [], [], []
    kk = min(k, sims.shape[1])
    for qi in range(sims.shape[0]):
        row = sims[qi]
        # tie-safe partial top-k: keep EVERY candidate tying the kk-th
        # similarity, then order by (sim DESC, vec_id ASC) — the final-stage
        # (and oracle) tiebreak — so a smaller vec_id the oracle would keep
        # can never be dropped at the partial stage
        thresh = np.partition(row, len(row) - kk)[len(row) - kk]
        cand = np.nonzero(row >= thresh)[0]
        order = np.lexsort((ids[cand], -row[cand]))[:kk]
        idx = cand[order]
        for j in idx:
            out_q.append(int(q["query_ids"][qi]))
            out_v.append(int(ids[j]))
            out_s.append(float(row[j]))
    return pa.Table.from_arrays(
        [
            pa.array(out_q, pa.int64()),
            pa.array(out_v, pa.int64()),
            pa.array(out_s, pa.float64()),
        ],
        names=["query_id", "vec_id", "sim"],
    )


def brute_force_topk(ds, query_ids: list[int], query_matrix: np.ndarray, k: int = 10, *, emb_col: str = "embedding", id_col: str = "vec_id"):
    """Dataset(embeddings) → Dataset(query_id, vec_id, sim, rank) exact top-k.

    Deterministic order: sim DESC then vec_id ASC (ties fixed).  ``sim`` is
    rounded to 6 dp AFTER ranking (ranking uses full precision)."""
    qn = np.linalg.norm(query_matrix, axis=1)
    qn[qn == 0] = 1.0
    qref = ray.put(
        {"query_ids": np.asarray(query_ids, dtype=np.int64), "matrix": query_matrix / qn[:, None]}
    )
    partial = ds.map_batches(
        lambda b: _topk_partial(b, qref, k, emb_col, id_col), batch_format="pyarrow"
    )

    def final_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        vids = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
        sims = np.asarray(group.column("sim").to_pylist(), dtype=np.float64)
        order = np.lexsort((vids, -sims))[:k]
        return pa.Table.from_arrays(
            [
                pa.array([qid] * len(order), pa.int64()),
                pa.array(vids[order], pa.int64()),
                pa.array(np.round(sims[order], 6), pa.float64()),
                pa.array(np.arange(1, len(order) + 1), pa.int64()),
            ],
            names=["query_id", "vec_id", "sim", "rank"],
        )

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def ivf_topk(
    ds,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 424242,
):
    """IVF-style ANN: deterministic centroid sample → per-row nearest
    centroid filter inside map_batches → brute force only over rows whose
    centroid is among each query's ``nprobe`` closest.  Returns the same
    schema as :func:`brute_force_topk` (approximate results)."""
    sample = ds.limit(max(256, n_centroids * 16)).to_pandas()
    emb = np.asarray(sample[emb_col].tolist(), dtype=np.float64)
    rng = np.random.RandomState(seed)
    cent = emb[rng.choice(len(emb), size=min(n_centroids, len(emb)), replace=False)]
    cn = np.linalg.norm(cent, axis=1)
    cn[cn == 0] = 1.0
    cent = cent / cn[:, None]

    qn = np.linalg.norm(query_matrix, axis=1)
    qn[qn == 0] = 1.0
    qunit = query_matrix / qn[:, None]
    probe_sets = np.argsort(-(qunit @ cent.T), axis=1)[:, :nprobe]
    allowed = sorted({int(c) for row in probe_sets for c in row})
    bref = ray.put({"cent": cent, "allowed": np.asarray(allowed, dtype=np.int64)})

    def filter_batch(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        emb_b = np.asarray(batch.column(emb_col).to_pylist(), dtype=np.float64)
        if len(emb_b) == 0:
            return batch
        nb = np.linalg.norm(emb_b, axis=1)
        nb[nb == 0] = 1.0
        assign = np.argmax((emb_b / nb[:, None]) @ b["cent"].T, axis=1)
        mask = np.isin(assign, b["allowed"])
        return batch.filter(pa.array(mask))

    pruned = ds.map_batches(filter_batch, batch_format="pyarrow")
    return brute_force_topk(pruned, query_ids, query_matrix, k, emb_col=emb_col, id_col=id_col)
