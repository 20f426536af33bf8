"""Mergeable sketches — HyperLogLog distinct counting and Misra-Gries
heavy hitters, implemented from their published descriptions (Flajolet et
al. 2007 "HyperLogLog"; Misra & Gries 1982; Agarwal et al. 2012 "Mergeable
Summaries").

Both sketches are COMMUTATIVE-MERGE summaries: per-block partials combine
in any order to the same state, so a Ray pipeline can build them with
``map_batches`` partials and a driver (or tree) merge with no shuffle and
bit-deterministic results at any parallelism — the property the scaling
invariant (identical output across cluster sizes) demands of any sketch
used at 100 TB.

HLL notes: ``p``-bit register index (default p=12 → 4096 registers,
~1.6 % standard error), 64-bit content hashes (``stable_hash64``), the
classic bias-corrected estimator with linear counting below 2.5·m.  The
register array is the merge state (elementwise max).
"""

from __future__ import annotations

import numpy as np

from .hashing import stable_hash64

HLL_P = 12
HLL_M = 1 << HLL_P


def hll_empty(p: int = HLL_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(reg: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold 64-bit hashes into the register array (vectorized).  The top
    ``p`` bits pick the register; the rank is 1 + leading-zero count of the
    remaining 64-p bits (capped at 64-p+1 for the all-zero suffix)."""
    p = int(np.log2(len(reg)))
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | ((np.uint64(1) << np.uint64(p)) - np.uint64(1))
    # exact vectorized leading-zero count by binary descent (rest is never 0:
    # its low p bits are forced to 1)
    v = rest.copy()
    lz = np.zeros(len(v), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v < (np.uint64(1) << np.uint64(64 - s))
        lz[m] += s
        v[m] = v[m] << np.uint64(s)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    m = float(len(reg))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def hll_hash_strings(values: list) -> np.ndarray:
    return np.array(
        [stable_hash64("" if v is None else str(v), salt="hll") for v in values],
        dtype=np.uint64,
    )


# --------------------------------------------------------------- Misra-Gries

def mg_summarize(items: list[str], k: int) -> dict[str, int]:
    """One-pass Misra-Gries summary with at most ``k`` counters: every
    element with true frequency > n/(k+1) is guaranteed present; stored
    counts undercount by at most the total decrement."""
    c: dict[str, int] = {}
    for x in items:
        if x in c:
            c[x] += 1
        elif len(c) < k:
            c[x] = 1
        else:
            dead = [y for y in c if c[y] == 1]
            for y in c:
                c[y] -= 1
            for y in dead:
                del c[y]
    return c


def mg_merge(summaries: list[dict[str, int]], k: int) -> dict[str, int]:
    """Merge MG summaries (Agarwal et al. 2012): add counters, then subtract
    the (k+1)-th largest count from all and drop non-positive — the result
    is a valid MG summary of the concatenated stream (error bounds add)."""
    total: dict[str, int] = {}
    for s in summaries:
        for t, n in s.items():
            total[t] = total.get(t, 0) + n
    if len(total) <= k:
        return total
    cut = sorted(total.values(), reverse=True)[k]
    return {t: n - cut for t, n in total.items() if n - cut > 0}


# ------------------------------------------------------------------- Bloom

BLOOM_BITS = 1 << 20  # 128 KiB default; size ~16 bits/key for <0.05% FP
BLOOM_K = 7


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set) — the
    uint64 avalanche used to turn integer keys into Bloom probe hashes."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def bloom_hash_keys(values, *, salt: str = "bloom") -> np.ndarray:
    """Key column → uint64 probe hashes.  Integer arrays go through the
    vectorized splitmix64; anything else through per-value blake2b."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return splitmix64(arr)
    return np.array(
        [stable_hash64("" if v is None else str(v), salt=salt) for v in values],
        dtype=np.uint64,
    )


def bloom_empty(n_bits: int = BLOOM_BITS) -> np.ndarray:
    """Packed bitset (uint8).  ``n_bits`` must be a multiple of 8 and SHOULD
    be a power of two (the double-hashing step stays full-period)."""
    return np.zeros(n_bits // 8, dtype=np.uint8)


def _bloom_positions(bits_len8: int, hashes: np.ndarray, k: int) -> np.ndarray:
    """(k, n) bit positions via Kirsch-Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m with h2 forced odd (full period for 2^p m)."""
    n_bits = np.uint64(bits_len8 * 8)
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % n_bits).astype(np.int64)


def bloom_add_hashes(bits: np.ndarray, hashes: np.ndarray, k: int = BLOOM_K) -> np.ndarray:
    if len(hashes):
        pos = _bloom_positions(len(bits), hashes, k)
        np.bitwise_or.at(
            bits, pos >> 3, (np.uint8(1) << (pos & 7).astype(np.uint8))
        )
    return bits


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Partial Bloom bitsets over row subsets OR together to the exact
    bitset of the union — the commutative-merge law that makes the sketch
    buildable as map_batches partials with no shuffle."""
    return np.bitwise_or(a, b)


def bloom_contains_hashes(
    bits: np.ndarray, hashes: np.ndarray, k: int = BLOOM_K
) -> np.ndarray:
    """bool[n] — True = maybe present (FP rate (1-e^{-kn/m})^k), False =
    DEFINITELY absent (Bloom filters have no false negatives)."""
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(len(bits), hashes, k)
    hit = (bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
    return hit.all(axis=0)


# ------------------------------------------------------- KMV bottom-k sample

KMV_K = 1024


def kmv_partial(ids: np.ndarray, values: np.ndarray, k: int = KMV_K):
    """(hash, id, value) triples of the k rows with the smallest
    ``splitmix64(id)`` in this subset — a content-stable uniform row sample.
    Deterministic ties: (hash, id) lexicographic."""
    ids = np.asarray(ids, dtype=np.int64)
    h = splitmix64(ids)
    take = np.lexsort((ids, h))[:k]
    return h[take], ids[take], np.asarray(values)[take]


def kmv_merge(parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]], k: int = KMV_K):
    """Union of partial samples → the exact bottom-k of the union.  The
    merge is commutative/associative and idempotent (duplicate ids collapse
    by the (hash, id) sort + unique), so the result is BIT-IDENTICAL under
    any partitioning/merge order — the mergeable-summaries law, same
    discipline as hll_merge/mg_merge."""
    if not parts:
        return (
            np.zeros(0, dtype=np.uint64),
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.float64),
        )
    h = np.concatenate([p[0] for p in parts])
    i = np.concatenate([p[1] for p in parts])
    v = np.concatenate([p[2] for p in parts])
    order = np.lexsort((i, h))
    h, i, v = h[order], i[order], v[order]
    keep = np.ones(len(i), dtype=bool)
    keep[1:] = i[1:] != i[:-1]
    h, i, v = h[keep], i[keep], v[keep]
    return h[:k], i[:k], v[:k]


def kmv_quantiles(sample_values: np.ndarray, qs: list[float]) -> np.ndarray:
    """quantile_disc over the uniform sample: the ceil(q·m)-th smallest
    sample value.  Rank error vs the full data is O(sqrt(q(1-q)/k)) w.h.p.;
    when k ≥ n the sample IS the data and the estimate is exact."""
    s = np.sort(np.asarray(sample_values))
    m = len(s)
    if m == 0:
        return np.full(len(qs), np.nan)
    idx = [max(1, int(np.ceil(q * m))) - 1 for q in qs]
    return s[idx]


# --------------------------------------------------------------- Count-Min

CMS_DEPTH = 4
CMS_WIDTH = 2048


def cms_empty(depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> np.ndarray:
    """Count-Min sketch state (Cormode & Muthukrishnan 2005): a depth×width
    int64 counter matrix.  Merge = elementwise ADD (unlike HLL's max), so
    per-block partials combine associatively and the merged sketch equals
    the single-pass sketch of the concatenated stream — bit-deterministic
    at any parallelism."""
    return np.zeros((depth, width), dtype=np.int64)


def _cms_positions(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """Row positions (depth × n) from one 64-bit hash per item: each row
    re-mixes the base hash with splitmix64 seeded by the row index — the
    standard pairwise-independent-per-row construction."""
    hs = np.asarray(hashes, dtype=np.uint64)
    rows = []
    for d in range(depth):
        salt = np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF)
        rows.append(splitmix64(hs + salt) % np.uint64(width))
    return np.stack(rows).astype(np.int64)


def cms_add_hashes(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Count occurrences: every item increments one counter per row."""
    depth, width = cms.shape
    pos = _cms_positions(hashes, depth, width)
    for d in range(depth):
        np.add.at(cms[d], pos[d], 1)
    return cms


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query_hashes(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates: min over rows.  Guarantees (classic CMS): estimate
    >= true count always (no underestimates), and estimate <= true +
    (e/width)·N with probability >= 1 - exp(-depth), N = stream length."""
    depth, width = cms.shape
    pos = _cms_positions(hashes, depth, width)
    ests = np.stack([cms[d][pos[d]] for d in range(depth)])
    return ests.min(axis=0)


def cms_hash_strings(values: list) -> np.ndarray:
    return np.array(
        [stable_hash64(v if v is not None else "", salt="cms") for v in values],
        dtype=np.uint64,
    )
