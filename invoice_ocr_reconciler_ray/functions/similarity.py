"""Similarity / alignment kernels for the reconciliation stage.

The reference reconciles fuzzily (Fuse.js bigram scoring over vendor names,
reconciliationEngine.js:53-67) and gates amounts with a relative tolerance
(``amountMatch`` reconciliationEngine.js:25-35).  The graft reconciles
extracted text against the per-row reference text: exact equality is the
invariant; on mismatch these kernels produce the diagnostic scores
(edit-distance ratio ≙ vendorScore, token-set ratio ≙ amountScore, combined
with the reference's fixed 0.6/0.4 weights, reconciliationEngine.js:122).
"""

from __future__ import annotations


def rel_tolerance_match(a: float, b: float, threshold: float = 0.01) -> tuple[bool, float, int]:
    """≙ amountMatch(reconciliationEngine.js:25-35), incl. the both-zero edge
    (:28): returns (match, discrepancy, percent_diff)."""
    diff = abs(a - b)
    bigger = max(a, b)
    if bigger == 0:
        return True, 0.0, 0
    pct = diff / bigger
    return pct <= threshold, diff, round(pct * 100)


def levenshtein_ratio(a: str, b: str, max_chars: int = 2000) -> float:
    """Normalized edit-distance similarity in [0,1]; 1.0 = identical.

    Banded O(n*m) DP with common prefix/suffix trimming.  Pairs longer than
    ``max_chars`` after trimming fall back to a length-based bound (scale
    guard — at 100 TB a quadratic kernel on multi-MB documents is a DoS on
    ourselves; long mismatches only need a coarse diagnostic score).
    """
    if a == b:
        return 1.0
    # trim common prefix/suffix (cheap, exact)
    i = 0
    n, m = len(a), len(b)
    lim = min(n, m)
    while i < lim and a[i] == b[i]:
        i += 1
    j = 0
    while j < lim - i and a[n - 1 - j] == b[m - 1 - j]:
        j += 1
    a2, b2 = a[i : n - j], b[i : m - j]
    total = max(n, m)
    if not a2 or not b2:
        dist = max(len(a2), len(b2))
        return 1.0 - dist / total
    if len(a2) > max_chars or len(b2) > max_chars:
        # coarse bound: all of the shorter differs
        dist = max(len(a2), len(b2))
        return 1.0 - dist / total
    if len(a2) > len(b2):
        a2, b2 = b2, a2
    return 1.0 - _edit_distance(a2, b2) / total


def _edit_distance(a: str, b: str) -> int:
    """Exact Levenshtein distance.

    Short pairs use the scalar DP; longer pairs use a numpy row recurrence
    where the in-row (deletion) dependency is resolved with the running-min
    identity ``cur[j] = j + min_{k<=j}(u[k] - k)`` (u = [row_index, t...],
    t = min(prev[1:]+1, prev[:-1]+cost)) via ``np.minimum.accumulate`` —
    bit-identical to the scalar DP, ~20× faster on ~1 k-char pairs."""
    import numpy as np

    n, m = len(a), len(b)
    if n * m <= 1024:
        prev = list(range(n + 1))
        for y, cb in enumerate(b, 1):
            cur = [y] + [0] * n
            for x, ca in enumerate(a, 1):
                cur[x] = min(prev[x] + 1, cur[x - 1] + 1, prev[x - 1] + (ca != cb))
            prev = cur
        return prev[-1]

    A = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    B = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(m + 1, dtype=np.int64)
    idx = np.arange(m + 1, dtype=np.int64)
    u = np.empty(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        np.minimum(prev[1:] + 1, prev[:-1] + (B != A[i - 1]), out=u[1:])
        u[0] = i
        prev = np.minimum.accumulate(u - idx) + idx
    return int(prev[m])


def token_set_ratio(a: str, b: str) -> float:
    """Jaccard similarity of whitespace token sets in [0,1]."""
    sa, sb = set(a.split()), set(b.split())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def combined_distance(a: str, b: str, w_edit: float = 0.6, w_token: float = 0.4, max_edit_chars: int = 2000) -> float:
    """Weighted distance in [0,1]; 0 = identical (≙ combinedScore =
    0.6*vendorScore + 0.4*amountScore, reconciliationEngine.js:122)."""
    return w_edit * (1.0 - levenshtein_ratio(a, b, max_edit_chars)) + w_token * (
        1.0 - token_set_ratio(a, b)
    )
