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


def levenshtein_ratio_many(as_: list[str], bs: list[str], max_chars: int = 2000):
    """:func:`levenshtein_ratio` for R independent pairs at once — identical
    per-pair semantics (same trims, same guards, same scalar-DP small case),
    but every pair needing the big DP runs in ONE matrix row recurrence
    vectorized over the PAIR axis.  The per-pair numpy recurrence is
    overhead-bound on ~500-char pages (~6 kernel launches per DP row on a
    500-wide array); batching R pairs turns the same launches into
    (R × width) work — measured ~4× on the bench mismatch tail.  Exactness:
    A-side rows are captured at step i == len(a_r) (the DP row for the full
    string); padded steps beyond a row's length only corrupt rows already
    captured.  Property-tested equal to the scalar path."""
    import numpy as np

    R = len(as_)
    out = np.zeros(R, dtype=np.float64)
    big_i: list[int] = []
    big_a: list[str] = []
    big_b: list[str] = []
    big_total: list[int] = []
    for r in range(R):
        a, b = as_[r], bs[r]
        if a == b:
            out[r] = 1.0
            continue
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
            out[r] = 1.0 - max(len(a2), len(b2)) / total
            continue
        if len(a2) > max_chars or len(b2) > max_chars:
            out[r] = 1.0 - max(len(a2), len(b2)) / total
            continue
        if len(a2) > len(b2):
            a2, b2 = b2, a2
        if len(a2) * len(b2) <= 1024:
            out[r] = 1.0 - _edit_distance(a2, b2) / total
            continue
        big_i.append(r)
        big_a.append(a2)
        big_b.append(b2)
        big_total.append(total)

    if big_i:
        la_all = np.array([len(a) for a in big_a], dtype=np.int64)
        # chunk by sorted a-length so one outlier pair can't force every
        # pair through its step count / width (padding waste ≤ the per-chunk
        # length ratio; lengths of a and b are correlated after the swap)
        order = np.argsort(la_all, kind="stable")
        chunks: list[list[int]] = []
        cur: list[int] = []
        for k in order.tolist():
            if cur and (la_all[k] > 1.3 * la_all[cur[0]] or len(cur) >= 1024):
                chunks.append(cur)
                cur = []
            cur.append(k)
        if cur:
            chunks.append(cur)
        big_total_np = np.array(big_total, dtype=np.float64)
        big_i_np = np.array(big_i)
        for chunk in chunks:
            K = len(chunk)
            la = la_all[chunk]
            lb = np.array([len(big_b[k]) for k in chunk], dtype=np.int64)
            N, M = int(la.max()), int(lb.max())
            # pad with two DISTINCT sentinels no real codepoint equals, so a
            # padded A char never matches a padded B char
            matA = np.full((K, N), 0xFFFFFFFE, dtype=np.uint32)
            matB = np.full((K, M), 0xFFFFFFFF, dtype=np.uint32)
            for r, k in enumerate(chunk):
                a2, b2 = big_a[k], big_b[k]
                matA[r, : len(a2)] = np.frombuffer(
                    a2.encode("utf-32-le"), dtype=np.uint32
                )
                matB[r, : len(b2)] = np.frombuffer(
                    b2.encode("utf-32-le"), dtype=np.uint32
                )
            idx = np.arange(M + 1, dtype=np.int64)
            prev = np.tile(idx, (K, 1))
            u = np.empty((K, M + 1), dtype=np.int64)
            t1 = np.empty((K, M), dtype=np.int64)
            t2 = np.empty((K, M), dtype=np.int64)
            cost = np.empty((K, M), dtype=np.int64)
            dist = np.zeros(K, dtype=np.int64)
            rows = np.arange(K)
            for i in range(1, N + 1):
                np.not_equal(matB, matA[:, i - 1][:, None], out=cost, casting="unsafe")
                np.add(prev[:, 1:], 1, out=t1)
                np.add(prev[:, :-1], cost, out=t2)
                np.minimum(t1, t2, out=u[:, 1:])
                u[:, 0] = i
                np.subtract(u, idx, out=u)
                np.minimum.accumulate(u, axis=1, out=u)
                np.add(u, idx, out=prev)
                done = la == i
                if done.any():
                    dist[done] = prev[rows[done], lb[done]]
            sel = big_i_np[chunk]
            out[sel] = 1.0 - dist / big_total_np[chunk]
    return out


def pack_strings(strings: list[str]):
    """Pack strings into (uint32 codepoint matrix, int64 lengths) for
    :func:`levenshtein_many`.  Padding uses a sentinel no real codepoint
    equals, and padded columns can never affect a row's result — the DP
    reads its answer at column ``lens[r]`` and information only flows
    left→right."""
    import numpy as np

    lens = np.array([len(s) for s in strings], dtype=np.int64)
    m = max(1, int(lens.max()) if len(lens) else 1)
    mat = np.full((len(strings), m), 0xFFFFFFFF, dtype=np.uint32)
    for r, s in enumerate(strings):
        if s:
            mat[r, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return mat, lens


#: per-process workspace buffers for levenshtein_many, keyed by matrix shape
#: (register shapes are few and stable within a task; Ray tasks are
#: single-threaded so no locking is needed)
_LEV_WS: dict = {}


def levenshtein_many(a: str, mat, lens):
    """Exact Levenshtein distance from ``a`` to EVERY packed string at once
    — the row recurrence of :func:`_edit_distance` vectorized over the
    string axis (R×M matrix per DP step instead of R separate Python DPs).
    Bit-identical to per-pair ``_edit_distance``; built for broadcast-lookup
    stages where one probe scores against a whole register.  int32 state +
    reused out= buffers keep the per-step cost memory-bandwidth-bound."""
    import numpy as np

    R, M = mat.shape
    ws = _LEV_WS.get((R, M))
    if ws is None:
        ws = {
            "idx": np.arange(M + 1, dtype=np.int32),
            "prev": np.empty((R, M + 1), np.int32),
            "u": np.empty((R, M + 1), np.int32),
            "t1": np.empty((R, M), np.int32),
            "t2": np.empty((R, M), np.int32),
            "neq": np.empty((R, M), bool),
            "w": np.empty((R, M + 1), np.int32),
        }
        _LEV_WS[(R, M)] = ws
    idx, prev, u = ws["idx"], ws["prev"], ws["u"]
    t1, t2, neq, w = ws["t1"], ws["t2"], ws["neq"], ws["w"]
    prev[:] = idx
    A = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    for i in range(1, len(A) + 1):
        np.add(prev[:, 1:], 1, out=t1)
        np.not_equal(mat, A[i - 1], out=neq)
        np.add(prev[:, :-1], neq, out=t2, casting="unsafe")
        np.minimum(t1, t2, out=u[:, 1:])
        u[:, 0] = i
        np.subtract(u, idx, out=w)
        np.minimum.accumulate(w, axis=1, out=w)
        np.add(w, idx, out=prev)
    return prev[np.arange(R), lens]


def pack_myers(strings: list[str]):
    """Pack strings for :func:`myers_distance_many` (Myers, J. ACM 1999 —
    bit-parallel Levenshtein, implemented from the published algorithm).

    Returns ``None`` when any string exceeds 64 characters (callers fall
    back to :func:`levenshtein_many`); otherwise a dict with the per-
    character position-mask table ``peq[c][r]`` (bit p set ⇔ strings[r][p]
    == c), lengths, and each row's high-bit mask.  Bits at or above a row's
    length never influence lower bits (carries/shifts only propagate
    upward), so one shared 64-bit lane per row is exact for every length."""
    import numpy as np

    R = len(strings)
    lens = np.array([len(s) for s in strings], dtype=np.uint64)
    if R and int(lens.max()) > 64:
        return None
    peq: dict[str, object] = {}
    for r, s in enumerate(strings):
        for p, ch in enumerate(s):
            if ch not in peq:
                peq[ch] = np.zeros(R, dtype=np.uint64)
            peq[ch][r] |= np.uint64(1) << np.uint64(p)
    one = np.uint64(1)
    hibit = np.where(lens > 0, one << (lens - one), np.uint64(0))
    pv0 = np.where(
        lens >= np.uint64(64),
        ~np.uint64(0),
        (one << lens) - one,
    )
    return {"peq": peq, "lens": lens, "hibit": hibit, "pv0": pv0, "R": R}


def myers_distance_many(a: str, packed: dict):
    """Exact Levenshtein distance from ``a`` to every packed string at once
    — one vectorized Myers step per character of ``a`` (~14 word ops over a
    length-R uint64 vector), versus an O(M) DP row per character.  Equal to
    :func:`_edit_distance` bit-for-bit (property-tested)."""
    import numpy as np

    peq, lens, hibit, pv0 = packed["peq"], packed["lens"], packed["hibit"], packed["pv0"]
    R = packed["R"]
    zero = np.zeros(R, dtype=np.uint64)
    one = np.uint64(1)
    Pv = pv0.copy()
    Mv = zero.copy()
    score = lens.astype(np.int64).copy()
    for ch in a:
        Eq = peq.get(ch, zero)
        Xv = Eq | Mv
        Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq
        Ph = Mv | ~(Xh | Pv)
        Mh = Pv & Xh
        score += (Ph & hibit) != 0
        score -= (Mh & hibit) != 0
        Ph = (Ph << one) | one
        Mh = Mh << one
        Pv = Mh | ~(Xv | Ph)
        Mv = Ph & Xv
    score[lens == 0] = len(a)  # empty pattern: distance is |a|
    return score


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


def damerau_levenshtein(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner 1975):
    edits are insert / delete / substitute / transpose-of-adjacent, and a
    transposed pair may be edited again (DL('CA','ABC') = 2, where the
    restricted OSA variant says 3).  Cross-engine contract: DuckDB's
    damerau_levenshtein() implements the same unrestricted recurrence, so
    integer distances from this kernel are oracle-checkable
    (property-tested against DuckDB in tests/test_zip_and_dl.py)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[str, int] = {}
    d = [[maxdist] * (lb + 2) for _ in range(la + 2)]
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(la + 1):
        d[i + 1][1] = i
    for i in range(1, la + 1):
        db = 0
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cb = b[j - 1]
            k = da.get(cb, 0)
            l = db
            if ca == cb:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute / match
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transpose
            )
        da[ca] = i
    return int(d[la + 1][lb + 1])
