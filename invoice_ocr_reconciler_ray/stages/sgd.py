"""Distributed full-batch logistic regression — the parameter-broadcast /
gradient-reduce training loop on Ray Data.

The classic data-parallel training shape: the model (a small weight
vector) broadcasts to every block, each block computes its EXACT partial
gradient in one vectorized pass, the driver sums partials and takes a
deterministic full-batch gradient-descent step.  Full batch (not
stochastic) keeps the run bit-reproducible under any block order up to
float addition of the per-block partials — partials are summed in sorted
block order to fix even that.  This is the quality-classifier trainer a
curation pipeline needs (fastText-style label: keep/drop from cheap text
features), kept honest: no SQL oracle can express the iterative update, so
it ships rows-only with convergence/determinism pytest coverage.

Scale notes: per epoch = ONE map_batches pass over the data (the Dataset
is re-executed per epoch — at 100 TB you'd ``materialize()`` the feature
projection once and iterate on that, which the caller controls); driver
work is O(features) per epoch.  The gradient reduce is a tiny driver fold,
never a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def train_logistic(
    ds,
    *,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.1,
    epochs: int = 20,
    l2: float = 0.0,
) -> dict:
    """Train w·x + b by full-batch gradient descent; returns
    ``{"weights": [...], "bias": float, "n_rows": int, "losses": [...]}``
    (losses = mean log-loss per epoch, for convergence tests).  Features
    should be pre-scaled by the caller (see ``lineitem_scaled_features``
    for the exact distributed scaler)."""
    d = len(feature_cols)
    w = np.zeros(d, np.float64)
    b = 0.0
    losses: list[float] = []

    def grad_block(t: pa.Table, *, w_now, b_now) -> pa.Table:
        X = np.column_stack(
            [
                t[c].combine_chunks().to_numpy(zero_copy_only=False)
                for c in feature_cols
            ]
        ).astype(np.float64)
        y = (
            t[label_col]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        z = X @ w_now + b_now
        p = _sigmoid(z)
        err = p - y
        # stable log-loss: -(y·log p + (1-y)·log(1-p)) via logaddexp
        ll = np.logaddexp(0.0, z) - y * z
        return pa.table(
            {
                "gw": pa.array([(X * err[:, None]).sum(axis=0)],
                               pa.list_(pa.float64())),
                "gb": pa.array([float(err.sum())], pa.float64()),
                "loss": pa.array([float(ll.sum())], pa.float64()),
                "n": pa.array([len(y)], pa.int64()),
            }
        )

    n_rows = 0
    for _ in range(epochs):
        parts = ds.map_batches(
            grad_block,
            batch_format="pyarrow",
            fn_kwargs=dict(w_now=w.copy(), b_now=b),
        ).to_pandas()
        # deterministic fold order: lexsort over the FULL partial value
        # (gb, loss, n, every gw component) — a total order up to blocks
        # whose partials are entirely identical, which commute anyway.
        gw_mat = np.stack([np.asarray(g, np.float64) for g in parts["gw"]])
        keys = tuple(gw_mat[:, j] for j in range(gw_mat.shape[1] - 1, -1, -1))
        order = np.lexsort(
            keys
            + (
                parts["n"].to_numpy(np.int64),
                parts["loss"].to_numpy(np.float64),
                parts["gb"].to_numpy(np.float64),
            )
        )
        parts = parts.iloc[order]
        gw = np.add.reduce(list(gw_mat[order]), axis=0)
        gb = float(parts["gb"].sum())
        n_rows = int(parts["n"].sum())
        losses.append(float(parts["loss"].sum()) / n_rows)
        w -= lr * (gw / n_rows + l2 * w)
        b -= lr * (gb / n_rows)
    return {
        "weights": [float(v) for v in w],
        "bias": float(b),
        "n_rows": n_rows,
        "losses": losses,
    }
