"""Property tests (hypothesis): KMV merge laws and window-dedup parity with
a brute-force reference, over arbitrary inputs — no Ray session needed;
these exercise the pure kernels the distributed stages are built from."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_ocr_reconciler_ray.functions.sketches import (
    kmv_merge,
    kmv_partial,
    kmv_quantiles,
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=2, max_value=5),
)
def test_kmv_split_invariance(ids, k, nsplit):
    """bottom-k(whole) == merge(bottom-k of ANY split) — for arbitrary id
    sets, k, and split counts (the mergeable-summaries law the distributed
    stage relies on)."""
    ids_a = np.asarray(ids, dtype=np.int64)
    vals = (ids_a % 997).astype(np.float64)
    whole = kmv_merge([kmv_partial(ids_a, vals, k)], k)
    cuts = np.array_split(np.arange(len(ids_a)), min(nsplit, len(ids_a)))
    parts = [kmv_partial(ids_a[c], vals[c], k) for c in cuts if len(c)]
    merged = kmv_merge(parts, k)
    for a, b in zip(whole, merged):
        assert np.array_equal(a, b)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32), min_size=1, max_size=200))
def test_kmv_exact_when_k_covers_n(vals):
    """k ≥ n ⇒ the sketch quantile IS quantile_disc of the data."""
    vals_a = np.asarray(vals, dtype=np.float64)
    ids = np.arange(len(vals_a), dtype=np.int64)
    _, _, sample = kmv_merge([kmv_partial(ids, vals_a, len(vals_a))], len(vals_a))
    s = np.sort(vals_a)
    for q in (0.1, 0.5, 0.9):
        want = s[max(1, int(np.ceil(q * len(s)))) - 1]
        assert kmv_quantiles(sample, [q])[0] == want


def _brute_window_dup(texts, w):
    """Reference implementation: per doc, count windows whose text occurs
    in an earlier doc (by index)."""
    import re

    def toks(t):
        return [x for x in re.split(r"[^a-z0-9]+", t.lower().strip()) if x]

    wins = []
    for t in texts:
        ws = toks(t)
        wins.append([" ".join(ws[s : s + w]) for s in range(max(0, len(ws) - w + 1))])
    first = {}
    for i, wl in enumerate(wins):
        for x in wl:
            first.setdefault(x, i)
    return [
        (len(wl), sum(1 for x in wl if first[x] < i)) for i, wl in enumerate(wins)
    ]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "x1"]), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_window_rows_kernel_matches_bruteforce(texts, w):
    """The _window_rows emit kernel + first-owner semantics equal the
    brute-force reference for arbitrary tiny corpora (high collision rate
    by construction — a 5-word vocabulary forces shared windows)."""
    from invoice_ocr_reconciler_ray.stages.corpus_stats import _window_rows

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    ids, w_doc, w_fp, n_windows = _window_rows(
        batch, id_col="doc_id", text_col="text", window_words=w
    )
    want = _brute_window_dup(texts, w)
    assert n_windows == [x[0] for x in want]
    # recompute dup counts from the emitted fingerprints (what the stage's
    # winner map + probe does)
    first: dict[str, int] = {}
    for d, f in zip(w_doc, w_fp):
        first.setdefault(f, d)
    dup = [0] * len(texts)
    for d, f in zip(w_doc, w_fp):
        if first[f] < d:
            dup[d] += 1
    assert dup == [x[1] for x in want]
