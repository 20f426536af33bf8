"""Stable hashing / sketching kernels (dedup + fingerprint suite).

Everything here is content-derived and bit-stable: blake2b with fixed salts
(never Python's salted ``hash()``, never wall-clock — the reference's
``Date.now()`` id fallback at invoiceParser.js:117 and ``uuidv4`` row ids at
server.js:296 are deliberately replaced by content hashes, per SURVEY §4.3.3).

MinHash / SimHash / shingling follow the published constructions (Broder
1997 resemblance sketches; Charikar 2002 simhash) implemented from their
public descriptions with numpy for the vectorizable parts.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def stable_hash64(s: str | bytes, salt: str = "") -> int:
    """Deterministic 64-bit hash (blake2b, fixed 8-byte digest)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = hashlib.blake2b(s, digest_size=8, person=salt.encode("utf-8")[:16].ljust(16, b"\0"))
    return int.from_bytes(h.digest(), "little")


def content_id(s: str | bytes) -> str:
    """Content-derived row id (hex) — the engine's replacement for uuidv4."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return hashlib.blake2b(s, digest_size=16).hexdigest()


def fingerprint64(text: str) -> int:
    """Document fingerprint: 64-bit content hash (rolling-hash analogue)."""
    return stable_hash64(text, salt="docfp")


def char_shingles(text: str, k: int = 5) -> list[str]:
    """Overlapping character k-grams of the whitespace-collapsed text."""
    t = " ".join(text.split())
    if len(t) < k:
        return [t] if t else []
    return [t[i : i + k] for i in range(len(t) - k + 1)]


def word_ngrams(text: str, n: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _perm_params(num_perm: int, seed: int = 12345) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameters for num_perm universal-hash perms."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(text: str, num_perm: int = 64, k: int = 5, seed: int = 12345) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) over char k-shingles (Broder '97).

    Vector math in numpy: one base hash per shingle, then num_perm universal
    hashes min-reduced — O(shingles × perms) as two broadcast ops."""
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    sh = char_shingles(text, k)
    if not sh:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.fromiter(
        (stable_hash64(s, salt="minhash") % _MERSENNE for s in sh),
        dtype=np.uint64,
        count=len(sh),
    )
    # (shingles, 1) * (perms,) mod p — universal hashing, then column min
    with np.errstate(over="ignore"):
        hv = (base[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return hv.min(axis=0)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Split a signature into ``bands`` rows-per-band groups; one stable
    64-bit key per band (band index salted in, so keys never collide across
    bands).  Docs sharing any band key are near-dup candidates."""
    rows = len(sig) // bands
    keys = []
    for bi in range(bands):
        chunk = sig[bi * rows : (bi + 1) * rows].tobytes()
        keys.append(stable_hash64(chunk, salt=f"band{bi}"))
    return keys


def simhash64(text: str, n: int = 3) -> int:
    """64-bit SimHash over word n-grams (Charikar 2002)."""
    grams = word_ngrams(text, n)
    if not grams:
        return 0
    hv = np.fromiter(
        (stable_hash64(g, salt="simhash") for g in grams), dtype=np.uint64, count=len(grams)
    )
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0
