"""Sketch-based corpus statistics — approximate distinct counts and heavy
hitters as mergeable per-block partials (functions/sketches.py).

Shape: ``map_batches`` builds one small sketch per block (HLL register
array / Misra-Gries counter dict serialized to an Arrow row), the driver
merges — no shuffle, O(sketch) driver memory, single scan.  HLL's max-merge
is commutative so its estimate is bit-deterministic at ANY parallelism;
Misra-Gries merged counts depend on block boundaries (the decrements are
stream-order-dependent), so callers that need run-to-run determinism pin
the block count — the HITTER-SUPERSET guarantee (every term with true
frequency > n/(k+1) present) holds regardless.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.sketches import (
    HLL_P,
    hll_add_hashes,
    hll_empty,
    hll_estimate,
    hll_hash_strings,
    hll_merge,
    mg_merge,
    mg_summarize,
)


def approx_distinct(ds, col: str, *, p: int = HLL_P) -> pa.Table:
    """→ pa.Table(column, approx_distinct int64): HyperLogLog estimate of
    ``COUNT(DISTINCT col)`` (~1.6 % standard error at the default p=12)."""

    def part(b: pa.Table) -> pa.Table:
        reg = hll_add_hashes(hll_empty(p), hll_hash_strings(b.column(col).to_pylist()))
        return pa.Table.from_arrays(
            [pa.array([reg.tobytes()], pa.binary())], names=["reg"]
        )

    merged = hll_empty(p)
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b.column("reg").to_pylist():
            merged = hll_merge(merged, np.frombuffer(raw, dtype=np.uint8))
    return pa.table(
        {
            "column": pa.array([col], pa.string()),
            "approx_distinct": pa.array([int(round(hll_estimate(merged)))], pa.int64()),
        }
    )


def heavy_hitter_terms(
    ds, *, text_col: str = "text", k: int = 20
) -> pa.Table:
    """→ pa.Table(term, min_count int64) sorted (min_count DESC, term ASC):
    Misra-Gries heavy hitters over whitespace-lowered tokens.  ``min_count``
    is the merged LOWER BOUND on the term's true frequency; every term whose
    true frequency exceeds n/(k+1) is guaranteed present."""

    def part(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in b.column(text_col).to_pylist():
            toks.extend(w for w in (t or "").lower().split() if w)
        s = mg_summarize(toks, k)
        terms = sorted(s)
        return pa.Table.from_arrays(
            [
                pa.array(terms, pa.string()),
                pa.array([s[t] for t in terms], pa.int64()),
            ],
            names=["term", "c"],
        )

    summaries = []
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        summaries.append(dict(zip(b.column("term").to_pylist(), b.column("c").to_pylist())))
    merged = mg_merge(summaries, k)
    order = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table(
        {
            "term": pa.array([t for t, _ in order], pa.string()),
            "min_count": pa.array([n for _, n in order], pa.int64()),
        }
    )
