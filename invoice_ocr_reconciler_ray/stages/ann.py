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


def knn_join(
    probe_ds,
    build_ds,
    k: int = 3,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_name: str = "probe_id",
    build_id_name: str = "build_id",
):
    """Embedding kNN *join*: every probe row is joined to its ``k`` nearest
    build rows by cosine similarity (the vector analogue of a broadcast hash
    join — a core similarity-search primitive for near-dup mining and
    retrieval labelling over training corpora).

    Plan: the build side is collected, unit-normalised and ``ray.put``
    ONCE; the probe side STREAMS through ``map_batches`` with one matmul
    per batch and a vectorised per-row tie-safe top-k.  Zero shuffle, no
    groupby — unlike :func:`brute_force_topk` (which broadcasts the
    queries and reduces partials), here each probe row's answer completes
    inside its own batch, so the probe side can be arbitrarily large.

    Documented bound: the BUILD side must fit in a worker's heap
    (N_build × D × 8 bytes + ids).  Beyond that, flip the sides (if the
    probe side is the small one), fall back to ``brute_force_topk``'s
    partial-top-k + groupby shape, or prune with :func:`ivf_topk`.

    Deterministic output order per probe row: sim DESC, build id ASC
    (ties fixed); ``sim`` rounded to 6 dp AFTER ranking.
    """
    build = build_ds.select_columns([id_col, emb_col]).to_pandas()  # small side
    bids = np.asarray(build[id_col].to_numpy(), dtype=np.int64)
    bmat = np.asarray(build[emb_col].tolist(), dtype=np.float64)
    bn = np.linalg.norm(bmat, axis=1)
    bn[bn == 0] = 1.0
    bref = ray.put({"ids": bids, "matrix": (bmat / bn[:, None]).T})  # (D, NB)

    def probe_batch(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        nb = b["ids"].shape[0]
        kk = min(k, nb)
        out_p, out_b, out_s, out_r = [], [], [], []
        if t.num_rows and nb:
            pids = np.asarray(t.column(id_col).to_pylist(), dtype=np.int64)
            pmat = np.asarray(t.column(emb_col).to_pylist(), dtype=np.float64)
            pn = np.linalg.norm(pmat, axis=1)
            pn[pn == 0] = 1.0
            sims = (pmat / pn[:, None]) @ b["matrix"]  # (P, NB)
            # vectorised kth-largest per row; per-row candidate sets are ~k
            thresh = np.partition(sims, nb - kk, axis=1)[:, nb - kk]
            for i in range(sims.shape[0]):
                cand = np.nonzero(sims[i] >= thresh[i])[0]
                order = np.lexsort((b["ids"][cand], -sims[i, cand]))[:kk]
                idx = cand[order]
                out_p.extend([int(pids[i])] * len(idx))
                out_b.extend(int(b["ids"][j]) for j in idx)
                out_s.extend(float(sims[i, j]) for j in idx)
                out_r.extend(range(1, len(idx) + 1))
        return pa.Table.from_arrays(
            [
                pa.array(out_p, pa.int64()),
                pa.array(out_b, pa.int64()),
                pa.array(np.round(np.asarray(out_s, dtype=np.float64), 6), pa.float64()),
                pa.array(out_r, pa.int64()),
            ],
            names=[probe_id_name, build_id_name, "sim", "rank"],
        )

    return probe_ds.map_batches(probe_batch, batch_format="pyarrow")


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


def lsh_topk(
    ds,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    max_hamming: int = 1,
    seed: int = 31337,
):
    """Random-hyperplane LSH ANN (Charikar 2002 SimHash buckets) — the
    third family member (brute force = exact baseline, IVF = learned
    coarse buckets, LSH = data-independent buckets): sign of ``n_planes``
    fixed random projections is a bucket key; each query probes every
    bucket within ``max_hamming`` bit flips of its own signature (multi-
    probe LSH), then brute-forces only those rows.

    Same broadcast-and-prune shape as :func:`ivf_topk`: the plane matrix
    and allowed-bucket set ride ONE ``ray.put``; the corpus filter is a
    vectorized sign-projection inside ``map_batches`` (zero shuffle, no
    index build, no training sample — the property that distinguishes LSH
    from IVF at ingest time).  Approximate: recall bounds come from the
    collision probability 1 - theta/pi per plane."""
    rng = np.random.RandomState(seed)
    d = query_matrix.shape[1]
    planes = rng.standard_normal((n_planes, d))

    qn = np.linalg.norm(query_matrix, axis=1)
    qn[qn == 0] = 1.0
    qunit = query_matrix / qn[:, None]
    qsig = ((qunit @ planes.T) >= 0).astype(np.int64)
    weights = (1 << np.arange(n_planes, dtype=np.int64))[::-1]
    qkeys = qsig @ weights

    allowed: set[int] = set()
    if max_hamming >= n_planes:
        # full probe: every bucket allowed — the filter provably passes all
        # rows, so LSH must equal exact brute force (the oracle hook, same
        # trick as ivf_topk with nprobe = n_centroids)
        allowed = set(range(1 << n_planes))
    else:
        for key in qkeys:
            allowed.add(int(key))
            if max_hamming >= 1:
                for b in range(n_planes):
                    allowed.add(int(key) ^ int(weights[b]))
            if max_hamming >= 2:
                for b1 in range(n_planes):
                    for b2 in range(b1 + 1, n_planes):
                        allowed.add(int(key) ^ int(weights[b1]) ^ int(weights[b2]))
    bref = ray.put(
        {"planes": planes, "allowed": np.asarray(sorted(allowed), dtype=np.int64), "w": weights}
    )

    def filter_batch(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        emb_b = np.asarray(batch.column(emb_col).to_pylist(), dtype=np.float64)
        if len(emb_b) == 0:
            return batch
        sig = ((emb_b @ b["planes"].T) >= 0).astype(np.int64)
        keys = sig @ b["w"]
        mask = np.isin(keys, b["allowed"])
        return batch.filter(pa.array(mask))

    pruned = ds.map_batches(filter_batch, batch_format="pyarrow")
    return brute_force_topk(pruned, query_ids, query_matrix, k, emb_col=emb_col, id_col=id_col)
