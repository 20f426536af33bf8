"""Exact distributed quantiles — histogram partition + targeted refinement.

Three cheap passes, no shuffle, no driver-side sort of the data:

1. per-block (min, max, count) partials → driver merge (one scan);
2. per-block fixed-width histogram over [min, max] → driver merge → locate,
   for each requested quantile rank, the bin that contains it (one scan);
3. fetch ONLY the values falling in those bins (a filter pass whose output
   is ~N/nbins per quantile), sort that small set on the driver, index out
   the exact ranks.

This is the Greenwald-free exact variant of the approxQuantile refinement
pattern: all heavy passes stream, driver memory is O(nbins + hit-bin
values).  Rank semantics match DuckDB's ``quantile_disc``: the value whose
1-based cumulative position equals ``ceil(q * N)`` in sorted order (verified
empirically against DuckDB across n, q).  Degenerate bins (all values
equal) short-circuit without pass 3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _minmax_count(ds, col: str) -> tuple[float, float, int]:
    def part(b: pa.Table) -> pa.Table:
        v = b.column(col)
        return pa.Table.from_arrays(
            [
                pa.array([pc.min(v).as_py()], pa.float64()),
                pa.array([pc.max(v).as_py()], pa.float64()),
                pa.array([len(v) - v.null_count], pa.int64()),
            ],
            names=["mn", "mx", "n"],
        )

    parts = list(
        ds.map_batches(part, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    if not parts:
        return 0.0, 0.0, 0
    t = pa.concat_tables(parts)
    n = int(pc.sum(t.column("n")).as_py() or 0)
    if n == 0:
        return 0.0, 0.0, 0
    return pc.min(t.column("mn")).as_py(), pc.max(t.column("mx")).as_py(), n


def exact_quantiles(ds, col: str, qs: list[float], *, nbins: int = 4096):
    """Dataset → pa.Table(q float64, value float64) with EXACT discrete
    quantiles of ``col`` (no interpolation — a value present in the data)."""
    mn, mx, n = _minmax_count(ds, col)
    if n == 0:
        return pa.table({"q": pa.array([], pa.float64()), "value": pa.array([], pa.float64())})
    # 1-based target positions, quantile_disc semantics
    ranks = [max(1, int(np.ceil(q * n))) for q in qs]
    if mx == mn:
        return pa.table(
            {"q": pa.array(qs, pa.float64()), "value": pa.array([mn] * len(qs), pa.float64())}
        )
    width = (mx - mn) / nbins

    def hist_part(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        bins = np.minimum(((v - mn) / width).astype(np.int64), nbins - 1)
        counts = np.bincount(bins, minlength=nbins)
        return pa.Table.from_arrays(
            [pa.array(np.arange(nbins), pa.int64()), pa.array(counts, pa.int64())],
            names=["bin", "c"],
        )

    ht = pa.concat_tables(
        list(
            ds.map_batches(hist_part, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    hist = np.zeros(nbins, dtype=np.int64)
    np.add.at(
        hist,
        ht.column("bin").to_numpy(zero_copy_only=False),
        ht.column("c").to_numpy(zero_copy_only=False),
    )
    cum = np.cumsum(hist)  # cum[b] = rows in bins <= b

    # rank r lives in the first bin with cum >= r; within the bin it is the
    # (r - cum[before])-th smallest value
    need: dict[int, list[tuple[int, int]]] = {}  # bin -> [(q_index, offset)]
    for qi, r in enumerate(ranks):
        b = int(np.searchsorted(cum, r))
        before = int(cum[b - 1]) if b else 0
        need.setdefault(b, []).append((qi, r - before))

    blist = sorted(need)

    def fetch(bt: pa.Table) -> pa.Table:
        v = bt.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        bins = np.minimum(((v - mn) / width).astype(np.int64), nbins - 1)
        mask = np.isin(bins, np.asarray(blist, dtype=np.int64))
        return pa.Table.from_arrays(
            [pa.array(v[mask], pa.float64()), pa.array(bins[mask], pa.int64())],
            names=["v", "bin"],
        )

    got = pa.concat_tables(
        list(ds.map_batches(fetch, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    vals = got.column("v").to_numpy(zero_copy_only=False)
    gbins = got.column("bin").to_numpy(zero_copy_only=False)
    out = np.zeros(len(qs), dtype=np.float64)
    for b, wants in need.items():
        inb = np.sort(vals[gbins == b])
        for qi, off in wants:
            out[qi] = inb[off - 1]
    return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.array(out, pa.float64())})


def exact_group_quantiles(
    ds, key_col: str, col: str, qs: list[float], *, nbins: int = 1024
):
    """Per-GROUP exact discrete quantiles: pa.Table(key, q, value) with
    ``quantile_disc`` semantics within each key group.

    Same three streaming passes as :func:`exact_quantiles`, run for all
    groups simultaneously — each block emits per-(key, bin) sparse
    histogram rows, so no group ever has to fit in one task (unlike a
    ``groupby().map_groups`` sort, which holds an entire group in memory).
    Driver memory is O(|keys| * nbins): this targets CATEGORICAL group keys
    (priority, language, status...), not high-cardinality ids — for those,
    bucket by key hash and run per bucket.
    """
    empty = pa.table(
        {
            "key": pa.array([], pa.string()),
            "q": pa.array([], pa.float64()),
            "value": pa.array([], pa.float64()),
        }
    )

    def mm_part(b: pa.Table) -> pa.Table:
        g = (
            pa.table({"key": pc.cast(b[key_col], pa.string()), "v": b[col]})
            .group_by("key")
            .aggregate([("v", "min"), ("v", "max"), ("v", "count")])
        )
        return g.rename_columns(["key", "mn", "mx", "n"])

    parts = list(
        ds.map_batches(mm_part, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    if not parts:
        return empty
    mm = (
        pa.concat_tables(parts)
        .group_by("key")
        .aggregate([("mn", "min"), ("mx", "max"), ("n", "sum")])
        .rename_columns(["key", "mn", "mx", "n"])
    )
    keys = mm.column("key").to_pylist()
    mns = mm.column("mn").to_numpy(zero_copy_only=False).astype(np.float64)
    mxs = mm.column("mx").to_numpy(zero_copy_only=False).astype(np.float64)
    ns = mm.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    params: dict[str, tuple[float, float]] = {}  # key -> (mn, width); live keys only
    out_rows: list[tuple[str, float, float]] = []
    ranks: dict[str, list[int]] = {}
    for k, mn, mx, n in zip(keys, mns, mxs, ns):
        if n == 0:
            continue
        if mx == mn:
            out_rows.extend((k, q, mn) for q in qs)
            continue
        params[k] = (mn, (mx - mn) / nbins)
        ranks[k] = [max(1, int(np.ceil(q * n))) for q in qs]

    if params:

        def hist_part(b: pa.Table) -> pa.Table:
            karr = pc.cast(b[key_col], pa.string()).to_numpy(zero_copy_only=False)
            v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~np.isnan(v)
            ks, bs, cs = [], [], []
            for k, (mn, width) in params.items():
                m = ok & (karr == k)
                if not m.any():
                    continue
                bins = np.minimum(((v[m] - mn) / width).astype(np.int64), nbins - 1)
                counts = np.bincount(bins, minlength=nbins)
                nz = np.nonzero(counts)[0]
                ks.extend([k] * len(nz))
                bs.append(nz)
                cs.append(counts[nz])
            if not ks:
                return pa.table(
                    {
                        "key": pa.array([], pa.string()),
                        "bin": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "key": pa.array(ks, pa.string()),
                    "bin": pa.array(np.concatenate(bs), pa.int64()),
                    "c": pa.array(np.concatenate(cs), pa.int64()),
                }
            )

        ht = pa.concat_tables(
            list(
                ds.map_batches(hist_part, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        hists = {k: np.zeros(nbins, np.int64) for k in params}
        hk = ht.column("key").to_pylist()
        hb = ht.column("bin").to_numpy(zero_copy_only=False)
        hc = ht.column("c").to_numpy(zero_copy_only=False)
        for k, b, c in zip(hk, hb, hc):
            hists[k][b] += c

        # per key: locate each rank's bin and in-bin offset
        need: dict[tuple[str, int], list[tuple[int, int]]] = {}
        for k, rs in ranks.items():
            cum = np.cumsum(hists[k])
            for qi, r in enumerate(rs):
                b = int(np.searchsorted(cum, r))
                before = int(cum[b - 1]) if b else 0
                need.setdefault((k, b), []).append((qi, r - before))
        hit_bins = {k: np.asarray(sorted(b for kk, b in need if kk == k)) for k in params}

        def fetch(bt: pa.Table) -> pa.Table:
            karr = pc.cast(bt[key_col], pa.string()).to_numpy(zero_copy_only=False)
            v = bt.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~np.isnan(v)
            ks, bs, vs = [], [], []
            for k, (mn, width) in params.items():
                hb_k = hit_bins[k]
                if len(hb_k) == 0:
                    continue
                m = ok & (karr == k)
                if not m.any():
                    continue
                vv = v[m]
                bins = np.minimum(((vv - mn) / width).astype(np.int64), nbins - 1)
                sel = np.isin(bins, hb_k)
                ks.extend([k] * int(sel.sum()))
                bs.append(bins[sel])
                vs.append(vv[sel])
            if not ks:
                return pa.table(
                    {
                        "key": pa.array([], pa.string()),
                        "bin": pa.array([], pa.int64()),
                        "v": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "key": pa.array(ks, pa.string()),
                    "bin": pa.array(np.concatenate(bs), pa.int64()),
                    "v": pa.array(np.concatenate(vs), pa.float64()),
                }
            )

        got = pa.concat_tables(
            list(
                ds.map_batches(fetch, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        gk = np.asarray(got.column("key").to_pylist(), dtype=object)
        gb = got.column("bin").to_numpy(zero_copy_only=False)
        gv = got.column("v").to_numpy(zero_copy_only=False)
        for (k, b), wants in need.items():
            inb = np.sort(gv[(gk == k) & (gb == b)])
            for qi, off in wants:
                out_rows.append((k, qs[qi], float(inb[off - 1])))

    out_rows.sort()
    return pa.table(
        {
            "key": pa.array([r[0] for r in out_rows], pa.string()),
            "q": pa.array([r[1] for r in out_rows], pa.float64()),
            "value": pa.array([r[2] for r in out_rows], pa.float64()),
        }
    )
