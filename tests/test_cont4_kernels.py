"""Kernel edge cases for the continuation-4 op wave (no Ray needed)."""

import hashlib

import numpy as np
import pyarrow as pa

from invoice_ocr_reconciler_ray.pipelines.queries import (
    _MH_A,
    _MH_B,
    _MH_P,
    _minhash8_block,
)


def test_minhash_block_matches_hand_computation():
    t = pa.table({"doc_id": [7], "text": ["alpha beta alpha"]})
    out = _minhash8_block(t)
    assert out.num_rows == 1
    for j in range(8):
        vals = []
        for w in ("alpha", "beta"):
            hw = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            vals.append((int(_MH_A[j]) * hw + int(_MH_B[j])) % _MH_P)
        assert out[f"m{j}"][0].as_py() == min(vals)


def test_minhash_block_skips_empty_and_whitespace_docs():
    t = pa.table({"doc_id": [1, 2, 3], "text": ["", "   ", "tok"]})
    out = _minhash8_block(t)
    assert out["doc_id"].to_pylist() == [3]


def test_identical_docs_identical_signatures():
    t = pa.table({"doc_id": [1, 2], "text": ["x y z", "z y x x"]})
    out = _minhash8_block(t)
    # same distinct token SET -> identical signature in all 8 perms
    for j in range(8):
        col = out[f"m{j}"].to_pylist()
        assert col[0] == col[1]


def test_snm_prefix_key_matches_sql_constant_arithmetic():
    # the SQL oracle builds the 6-byte big-endian key via explicit
    # 256-power constants; int.from_bytes must agree for short names too
    for name in ("cold widget", "red", "abcdef", "a"):
        k_py = int.from_bytes(name.encode("ascii")[:6].ljust(6, b"\0"), "big")
        padded = [ord(c) for c in name[:6]] + [0] * (6 - min(6, len(name)))
        k_sql = sum(
            padded[i] * 256 ** (5 - i) for i in range(6)
        )
        assert k_py == k_sql


def test_sign_abs_rescale_matches_truncating_division():
    # the power-iteration rescale must agree with DuckDB's toward-zero //
    w = np.array([-7001, 7001, -1, 0, 5000], np.int64)
    m = 7001
    got = np.sign(w) * ((np.abs(w) * 1000) // m)
    assert got.tolist() == [-1000, 1000, 0, 0, 714]


def test_dft_weights_telescoping():
    # the event-level weight trick: sum of per-event phase weights equals
    # the hourly-series DFT term
    hours = np.array([0, 0, 1, 2, 2, 2, 3, 4], np.int64)
    counts = np.bincount(hours, minlength=5)
    c4w = np.array([1, 0, -1, 0], np.int64)
    series_term = int((counts * c4w[np.arange(5) % 4]).sum())
    event_term = int(c4w[hours % 4].sum())
    assert series_term == event_term
