"""Distributed PageRank over an edge list, in exact integer fixed-point.

The iterative-graph-algorithm member of the operator family (next to the
near-dup connected components in ``stages/neardup.py`` and the Lloyd
k-means in ``stages/cluster.py``): link-graph centrality is a standard
web-corpus curation signal (quality weighting / crawl prioritisation).

Determinism + scale design (same discipline as ``stages/cluster.py``):

- **All arithmetic is int64 fixed-point** (ranks scaled by 1e9, damping as
  the integer pair 85/100, per-edge contribution ``rank // out_degree``):
  integer addition is exactly associative/commutative, so the result is
  BIT-IDENTICAL at any parallelism or block layout, and a SQL engine
  running the same floor arithmetic reproduces it exactly — which is what
  makes an ORACLE possible for an iterative float-ish algorithm.
- **Edges stay distributed**; each iteration is ONE shuffle-free pass:
  every ``map_batches`` task scatter-adds its edges' contributions into an
  O(N) int64 partial vector (``np.add.at``), emitted as packed bytes and
  merged on the driver.  Driver/broadcast state is O(N) ints (the rank
  vector) — the documented bound, exactly like the k-means centroid state.
  For N beyond driver memory, keep ranks as a Dataset keyed by node and
  turn the scatter into a (dst)-keyed groupby per iteration (one shuffle
  per iteration), leaving the per-edge kernel unchanged.
- **Dangling nodes** (out-degree 0) contribute nothing — the deterministic
  "leaky" variant; both engines drop the same mass.
- Overflow bound: ``85 × total_mass`` must fit int64 → N < ~10^8 nodes at
  SCALE=1e9; shrink SCALE for bigger graphs.

Nodes are assumed to be labelled 0..N-1 (the synthetic corpus guarantees
it; assert-checked in the query wrapper).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

SCALE = 1_000_000_000
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(edges_ds, n_nodes: int, *, iters: int = 5) -> pa.Table:
    """Dataset(src:int64, dst:int64) → pa.Table(node, rank_fx) after
    ``iters`` synchronous power iterations from a uniform start of SCALE
    per node.  ``edges_ds`` is executed ``iters + 1`` times — pass it
    materialized when it fits the object store."""

    def deg_partial(t: pa.Table) -> pa.Table:
        d = np.zeros(n_nodes, dtype=np.int64)
        src = t["src"].to_numpy(zero_copy_only=False)
        if len(src):
            np.add.at(d, src, 1)
        return pa.table({"deg": pa.array([d.tobytes()], pa.binary())})

    deg = np.zeros(n_nodes, dtype=np.int64)
    for b in edges_ds.map_batches(deg_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b["deg"].to_pylist():
            deg += np.frombuffer(raw, dtype=np.int64)

    ranks = np.full(n_nodes, SCALE, dtype=np.int64)
    safe_deg = np.maximum(deg, 1)  # dangling nodes never index contrib anyway
    from .broadcast import guard_broadcast_bytes

    guard_broadcast_bytes(
        int(ranks.nbytes + safe_deg.nbytes),
        label="pagerank rank/degree state",
        alternative="partition the node space and exchange rank contributions "
        "via a per-iteration groupby(dst) shuffle instead of a broadcast "
        "dense state vector",
    )
    for _ in range(iters):
        state = ray.put({"ranks": ranks, "deg": safe_deg})

        def acc_partial(t: pa.Table) -> pa.Table:
            s = ray.get(state)
            acc = np.zeros(n_nodes, dtype=np.int64)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            if len(src):
                contrib = s["ranks"][src] // s["deg"][src]
                np.add.at(acc, dst, contrib)
            return pa.table({"acc": pa.array([acc.tobytes()], pa.binary())})

        acc = np.zeros(n_nodes, dtype=np.int64)
        for b in edges_ds.map_batches(acc_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            for raw in b["acc"].to_pylist():
                acc += np.frombuffer(raw, dtype=np.int64)
        ranks = (DAMP_DEN - DAMP_NUM) * SCALE // DAMP_DEN + (DAMP_NUM * acc) // DAMP_DEN

    return pa.Table.from_arrays(
        [
            pa.array(np.arange(n_nodes, dtype=np.int64), pa.int64()),
            pa.array(ranks, pa.int64()),
        ],
        names=["node", "rank_fx"],
    )


def _propagate(edges_ds, vec: np.ndarray, n_nodes: int, *, reverse: bool) -> np.ndarray:
    """One HITS half-step: out[v] = Σ_{(u,v)∈E} vec[u] (reverse=False,
    authority update) or out[u] = Σ_{(u,v)∈E} vec[v] (reverse=True, hub
    update) — same scatter-add-partials / driver-merge shape as the
    PageRank iteration, pure int64."""
    state = ray.put(vec)

    def part(t: pa.Table) -> pa.Table:
        v = ray.get(state)
        acc = np.zeros(n_nodes, dtype=np.int64)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        if len(src):
            if reverse:
                np.add.at(acc, src, v[dst])
            else:
                np.add.at(acc, dst, v[src])
        return pa.table({"acc": pa.array([acc.tobytes()], pa.binary())})

    out = np.zeros(n_nodes, dtype=np.int64)
    for b in edges_ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b["acc"].to_pylist():
            out += np.frombuffer(raw, dtype=np.int64)
    return out


def hits(edges_ds, n_nodes: int, *, rounds: int = 2) -> pa.Table:
    """Kleinberg HITS (JACM'99) in exact unnormalized int64: from h₀ = 1,
    each round is a = Aᵀh then h = A·a — ``rounds`` synchronous rounds,
    four edge passes at rounds=2, every value an exact small integer (no
    normalization ⇒ scale-free and SQL-reproducible).  Same distributed
    scatter-add discipline and O(N) driver state as :func:`pagerank`."""
    h = np.ones(n_nodes, dtype=np.int64)
    a = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(rounds):
        a = _propagate(edges_ds, h, n_nodes, reverse=False)
        h = _propagate(edges_ds, a, n_nodes, reverse=True)
    return pa.Table.from_arrays(
        [
            pa.array(np.arange(n_nodes, dtype=np.int64), pa.int64()),
            pa.array(a, pa.int64()),
            pa.array(h, pa.int64()),
        ],
        names=["node", "auth", "hub"],
    )
