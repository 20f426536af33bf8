"""Grouped ordinary-least-squares via exact integer sufficient statistics.

Distributed regression is a sum of five per-row terms — n, Σx, Σy, Σx²,
Σxy — and nothing else: the slope/intercept are pure functions of those
sums, so the distributed part is an embarrassingly-parallel partial
aggregate and the "regression" happens on five numbers per group.  To make
the result bit-exact under any block order (the oracle-parity requirement
this repo applies to every SUM), x and y must be EXACT int64 on entry
(counts / integer cents — callers convert, same policy as the cents kernel
in pipelines/queries.py); the sums are then order-independent integers and
the final float arithmetic is one fixed IEEE expression evaluated
identically here and in SQL.

Ray-first layout: per-block pyarrow ``group_by`` partials (one row per
group per block), merged on the driver — groups × blocks rows, no shuffle.
For a huge group domain the identical partial feeds ``groupby(group)``
instead; the kernel is unchanged.

Reference parity: the reference computes per-status aggregate statistics
over reconciled invoices (reference/backend/server.js:516-560); this stage
extends that per-group aggregate family to the sufficient-statistic form
(DuckDB ``regr_slope``/``regr_intercept`` over exact integer inputs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _block_stats(t: pa.Table, *, group_col: str, x_col: str, y_col: str) -> pa.Table:
    x = t[x_col].combine_chunks()
    y = t[y_col].combine_chunks()
    tb = pa.table(
        {
            group_col: t[group_col],
            "n_rows": pa.array(np.ones(len(t), np.int64)),
            "sum_x": x,
            "sum_y": y,
            "sum_xx": pa.array(
                x.to_numpy(zero_copy_only=False) * x.to_numpy(zero_copy_only=False)
            ),
            "sum_xy": pa.array(
                x.to_numpy(zero_copy_only=False) * y.to_numpy(zero_copy_only=False)
            ),
        }
    )
    g = tb.group_by(group_col).aggregate(
        [("n_rows", "sum"), ("sum_x", "sum"), ("sum_y", "sum"),
         ("sum_xx", "sum"), ("sum_xy", "sum")]
    )
    return g.rename_columns(
        [group_col, "n_rows", "sum_x", "sum_y", "sum_xx", "sum_xy"]
    )


def pairwise_corr(ds, *, cols: list[str]) -> pa.Table:
    """Pearson correlation for every column pair — the data-profiling
    correlation matrix, from the same exact-int64 sufficient statistics as
    :func:`grouped_ols`: each block reduces to ONE partial row of sums
    (n, Σc, Σc² per column, Σab per pair), the driver adds them, and
    ``corr = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²))`` is a
    fixed IEEE expression (sqrt is correctly rounded per IEEE 754, so the
    doubles match the SQL oracle bit-for-bit).  ``cols`` MUST be exact
    int64.  Output: one row per (col_x, col_y) pair, x before y in ``cols``
    order."""
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]

    def block_sums(t: pa.Table) -> pa.Table:
        arrs = {
            c: t[c].combine_chunks().to_numpy(zero_copy_only=False) for c in cols
        }
        row: dict[str, list] = {"n": [np.int64(len(t))]}
        for c in cols:
            row[f"s_{c}"] = [arrs[c].sum(dtype=np.int64)]
            row[f"ss_{c}"] = [(arrs[c] * arrs[c]).sum(dtype=np.int64)]
        for a, b in pairs:
            row[f"sp_{a}_{b}"] = [(arrs[a] * arrs[b]).sum(dtype=np.int64)]
        return pa.table({k: pa.array(v, pa.int64()) for k, v in row.items()})

    parts = ds.map_batches(block_sums, batch_format="pyarrow").to_pandas()
    tot = parts.sum()
    n = np.float64(tot["n"])
    out_x, out_y, out_n, out_corr = [], [], [], []
    for a, b in pairs:
        sx, sy = np.float64(tot[f"s_{a}"]), np.float64(tot[f"s_{b}"])
        sxx, syy = np.float64(tot[f"ss_{a}"]), np.float64(tot[f"ss_{b}"])
        sxy = np.float64(tot[f"sp_{a}_{b}"])
        corr = (n * sxy - sx * sy) / (
            np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        )
        out_x.append(a)
        out_y.append(b)
        out_n.append(int(tot["n"]))
        out_corr.append(float(corr))
    return pa.table(
        {
            "col_x": pa.array(out_x, pa.string()),
            "col_y": pa.array(out_y, pa.string()),
            "n_rows": pa.array(out_n, pa.int64()),
            "corr": pa.array(out_corr, pa.float64()),
        }
    )


def grouped_ols(ds, *, group_col: str, x_col: str, y_col: str) -> pa.Table:
    """Dataset → driver pyarrow Table ``(group, n_rows, sum_x, sum_y,
    sum_xx, sum_xy, slope, intercept)``.  ``x_col``/``y_col`` MUST be exact
    int64.  slope/intercept are the closed-form OLS solution computed as
    ``(n·Σxy − Σx·Σy) / (n·Σx² − Σx²)`` with every integer CAST to double
    first — the identical expression the SQL oracle evaluates, so the
    doubles match bit-for-bit."""
    parts = ds.map_batches(
        _block_stats,
        batch_format="pyarrow",
        fn_kwargs=dict(group_col=group_col, x_col=x_col, y_col=y_col),
    ).to_pandas()
    g = parts.groupby(group_col, sort=True, as_index=False).sum()
    n = g["n_rows"].to_numpy().astype(np.float64)
    sx = g["sum_x"].to_numpy().astype(np.float64)
    sy = g["sum_y"].to_numpy().astype(np.float64)
    sxx = g["sum_xx"].to_numpy().astype(np.float64)
    sxy = g["sum_xy"].to_numpy().astype(np.float64)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pa.table(
        {
            group_col: pa.array(g[group_col]),
            "n_rows": pa.array(g["n_rows"].to_numpy().astype(np.int64)),
            "sum_x": pa.array(g["sum_x"].to_numpy().astype(np.int64)),
            "sum_y": pa.array(g["sum_y"].to_numpy().astype(np.int64)),
            "sum_xx": pa.array(g["sum_xx"].to_numpy().astype(np.int64)),
            "sum_xy": pa.array(g["sum_xy"].to_numpy().astype(np.int64)),
            "slope": pa.array(slope, pa.float64()),
            "intercept": pa.array(intercept, pa.float64()),
        }
    )
