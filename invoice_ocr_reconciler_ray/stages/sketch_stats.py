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


def approx_quantiles_kmv(
    ds, *, id_col: str, val_col: str, qs: list[float], k: int = 1024
) -> pa.Table:
    """pa.Table(q, value_est): approximate quantiles from a KMV bottom-k
    uniform row sample (functions/sketches.py:kmv_*) — ONE scan, no
    shuffle, O(k) block partials and driver state.

    The third member of the quantile family: `stages/quantiles.py` is
    exact in 3 scans (histogram + refine); this is 1-scan ±O(1/sqrt(k))
    rank error with a sample that is MERGEABLE and bit-deterministic at
    any parallelism (hash-of-id bottom-k is order- and layout-independent
    — unlike KLL/t-digest, whose structure depends on merge order).  When
    k ≥ n it degrades gracefully to exact."""
    from ..functions.sketches import kmv_merge, kmv_partial, kmv_quantiles

    def part(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        vals = b[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h, i, v = kmv_partial(ids, vals, k)
        return pa.table(
            {
                "h": pa.array([h.tobytes()], pa.binary()),
                "i": pa.array([i.tobytes()], pa.binary()),
                "v": pa.array([v.tobytes()], pa.binary()),
            }
        )

    parts = []
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for hr, ir, vr in zip(b["h"].to_pylist(), b["i"].to_pylist(), b["v"].to_pylist()):
            parts.append(
                (
                    np.frombuffer(hr, dtype=np.uint64),
                    np.frombuffer(ir, dtype=np.int64),
                    np.frombuffer(vr, dtype=np.float64),
                )
            )
    _, _, sample = kmv_merge(parts, k)
    est = kmv_quantiles(sample, qs)
    return pa.table(
        {"q": pa.array(qs, pa.float64()), "value_est": pa.array(est, pa.float64())}
    )


def grouped_approx_distinct(
    ds, *, key_col: str, val_col: str, p: int = HLL_P
):
    """Dataset(key, hll_estimate): approximate COUNT(DISTINCT val) PER KEY —
    the grouped composition of the HLL sketch: block-local per-key register
    partials, one groupby shuffle carrying O(keys × 2^p) register payloads
    (not rows), max-merge per key.  The scale shape for per-domain /
    per-user distinct counts where the exact distinct set would not fit."""

    def part(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        vals = b[val_col].to_pylist()
        regs: dict[int, np.ndarray] = {}
        order = np.argsort(keys, kind="stable")
        skeys = keys[order]
        svals = [vals[j] for j in order]
        bounds = np.searchsorted(skeys, np.unique(skeys))
        uniq = np.unique(skeys)
        for gi, kv in enumerate(uniq):
            lo = bounds[gi]
            hi = bounds[gi + 1] if gi + 1 < len(bounds) else len(skeys)
            reg = hll_empty(p)
            hll_add_hashes(reg, hll_hash_strings([str(x) for x in svals[lo:hi]]))
            regs[int(kv)] = reg
        return pa.table(
            {
                key_col: pa.array(list(regs), pa.int64()),
                "reg": pa.array([r.tobytes() for r in regs.values()], pa.binary()),
            }
        )

    def merge_group(g: pa.Table) -> pa.Table:
        key = g[key_col][0].as_py()
        reg = hll_empty(p)
        for raw in g["reg"].to_pylist():
            reg = hll_merge(reg, np.frombuffer(raw, dtype=np.uint8).copy())
        return pa.table(
            {
                key_col: pa.array([key], pa.int64()),
                "approx_distinct": pa.array([float(hll_estimate(reg))], pa.float64()),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pyarrow")
    )


def grouped_approx_quantiles_kmv(
    ds, *, key_col: str, id_col: str, val_col: str, qs: list[float], k: int = 1024
):
    """Dataset(key, q, value_est): approximate quantiles PER KEY — the
    grouped composition of the KMV bottom-k sample (the per-key counterpart
    of :func:`approx_quantiles_kmv`, like :func:`grouped_approx_distinct`
    is for HLL).  Block-local per-key bottom-k partials; the ONE groupby
    shuffle carries O(keys · k) sample triples, never rows; per-key merge
    is the mergeable bottom-k law, so the estimate is bit-deterministic at
    any parallelism.  When k ≥ a key's row count the sample IS that group
    and the quantiles are EXACT (quantile_disc semantics) — which is what
    makes the registry entry oracle-checkable at driver scale while staying
    a fixed-budget sketch at 100 TB."""
    from ..functions.sketches import kmv_merge, kmv_partial, kmv_quantiles

    def part(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        vals = b[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(keys, kind="stable")
        skeys, sids, svals = keys[order], ids[order], vals[order]
        uniq, starts = np.unique(skeys, return_index=True)
        out_k, out_h, out_i, out_v = [], [], [], []
        for gi, kv in enumerate(uniq):
            lo = starts[gi]
            hi = starts[gi + 1] if gi + 1 < len(uniq) else len(skeys)
            h, i, v = kmv_partial(sids[lo:hi], svals[lo:hi], k)
            out_k.append(kv)
            out_h.append(h.tobytes())
            out_i.append(i.tobytes())
            out_v.append(v.tobytes())
        return pa.table(
            {
                key_col: pa.array(out_k, b[key_col].type),
                "h": pa.array(out_h, pa.binary()),
                "i": pa.array(out_i, pa.binary()),
                "v": pa.array(out_v, pa.binary()),
            }
        )

    def merge_group(g: pa.Table) -> pa.Table:
        parts = [
            (
                np.frombuffer(hr, dtype=np.uint64),
                np.frombuffer(ir, dtype=np.int64),
                np.frombuffer(vr, dtype=np.float64),
            )
            for hr, ir, vr in zip(
                g["h"].to_pylist(), g["i"].to_pylist(), g["v"].to_pylist()
            )
        ]
        _, _, sample = kmv_merge(parts, k)
        est = kmv_quantiles(sample, qs)
        n = len(qs)
        return pa.table(
            {
                key_col: pa.array([g[key_col][0].as_py()] * n, g[key_col].type),
                "q": pa.array(list(qs), pa.float64()),
                "value_est": pa.array(est, pa.float64()),
            }
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pyarrow")
    )


def approx_term_counts_cms(
    ds,
    query_terms: list[str],
    *,
    text_col: str = "text",
    depth: int = 4,
    width: int = 2048,
) -> pa.Table:
    """→ pa.Table(term, est_count int64): Count-Min point-frequency
    estimates for ``query_terms`` over the corpus token stream.

    The fourth member of the sketch family (HLL distinct / Misra-Gries
    hitters / KMV quantiles / CMS frequencies): per-block CMS partials
    (functions/sketches.py:cms_*) merged by elementwise ADD on the driver —
    one scan, no shuffle, O(depth·width) state.  Because add-merge is
    associative AND the sketch of a concatenated stream equals the sum of
    its parts' sketches, the merged CMS is BIT-IDENTICAL at any block
    layout or parallelism (stronger than MG, whose counters are
    order-dependent).  Estimates never undercount; overcount <= (e/width)·N
    with probability >= 1 - e^-depth."""
    from ..functions.sketches import (
        cms_add_hashes,
        cms_empty,
        cms_hash_strings,
        cms_merge,
        cms_query_hashes,
    )

    def part(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in b.column(text_col).to_pylist():
            toks.extend(w for w in (t or "").lower().split() if w)
        cms = cms_empty(depth, width)
        if toks:
            cms_add_hashes(cms, cms_hash_strings(toks))
        return pa.table({"cms": pa.array([cms.tobytes()], pa.binary())})

    merged = cms_empty(depth, width)
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b.column("cms").to_pylist():
            merged = cms_merge(
                merged, np.frombuffer(raw, dtype=np.int64).reshape(depth, width)
            )
    ests = cms_query_hashes(merged, cms_hash_strings(query_terms))
    return pa.table(
        {
            "term": pa.array(query_terms, pa.string()),
            "est_count": pa.array(ests, pa.int64()),
        }
    )


def grouped_heavy_hitters(
    ds, *, key_col: str, text_col: str = "text", k: int = 10
) -> pa.Table:
    """→ pa.Table(key, term, min_count) — per-GROUP Misra-Gries heavy
    hitters: block-local per-key summaries, merged per key on the driver.
    Targets CATEGORICAL keys (lang, source, status): driver state is
    O(|keys|·k), the same documented bound as the grouped HLL/KMV stages.
    Per group, every term with true in-group frequency > n_g/(k+1) is
    guaranteed present; min_count is the merged lower bound."""

    def part(b: pa.Table) -> pa.Table:
        per_key: dict[str, list[str]] = {}
        for key, t in zip(
            b.column(key_col).to_pylist(), b.column(text_col).to_pylist()
        ):
            per_key.setdefault(key, []).extend(
                w for w in (t or "").lower().split() if w
            )
        keys: list[str] = []
        terms: list[str] = []
        counts: list[int] = []
        for key, toks in per_key.items():
            s = mg_summarize(toks, k)
            for t in sorted(s):
                keys.append(key)
                terms.append(t)
                counts.append(s[t])
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "term": pa.array(terms, pa.string()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    per_key_summaries: dict[str, list[dict[str, int]]] = {}
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        # one partial dict per (block, key): rows for a key within one
        # iter_batches batch may span chunk boundaries, so accumulate per
        # batch then close
        block_acc: dict[str, dict[str, int]] = {}
        for key, t, c in zip(
            b.column("key").to_pylist(),
            b.column("term").to_pylist(),
            b.column("c").to_pylist(),
        ):
            block_acc.setdefault(key, {})[t] = c
        for key, s in block_acc.items():
            per_key_summaries.setdefault(key, []).append(s)
    out_k: list[str] = []
    out_t: list[str] = []
    out_c: list[int] = []
    for key in sorted(per_key_summaries):
        merged = mg_merge(per_key_summaries[key], k)
        for t, n in sorted(merged.items(), key=lambda kv: (-kv[1], kv[0])):
            out_k.append(key)
            out_t.append(t)
            out_c.append(n)
    return pa.table(
        {
            "key": pa.array(out_k, pa.string()),
            "term": pa.array(out_t, pa.string()),
            "min_count": pa.array(out_c, pa.int64()),
        }
    )
