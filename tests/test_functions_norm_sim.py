"""Unit tests: normalization (M9/M10), tolerance predicate (J3), similarity."""

import pyarrow as pa
import pytest

from invoice_ocr_reconciler_ray.functions.similarity import (
    combined_distance,
    levenshtein_ratio,
    rel_tolerance_match,
    token_set_ratio,
)
from invoice_ocr_reconciler_ray.functions.textnorm import (
    normalize_amount,
    normalize_vendor,
    normalize_ws,
    parse_amount,
)


def test_normalize_vendor_reference_semantics():
    # ≙ normalizeVendor reconciliationEngine.js:15-23
    arr = pa.array(
        [
            "ACME Corp.",
            "Acme Corporation",
            "acme, inc!",
            "Globex  Pvt. Private Ltd",
            None,
        ]
    )
    out = normalize_vendor(arr).to_pylist()
    assert out[:4] == ["acme", "acme", "acme", "globex"]
    assert out[4] is None


def test_normalize_amount_dirty_strings():
    # ≙ normalizeAmount reconciliationEngine.js:8-13: invalid → 0
    arr = pa.array(["$1,234.56", " 99 ", "n/a", "", None])
    out = normalize_amount(arr).to_pylist()
    assert out[:3] == [1234.56, 99.0, 0.0]
    assert out[3] == 0.0
    # numeric passthrough
    assert normalize_amount(pa.array([1, 2])).to_pylist() == [1.0, 2.0]


def test_parse_amount_null_preserving():
    # ≙ parseAmount invoiceParser.js:54-59: NaN → null (NOT 0)
    out = parse_amount(pa.array(["1,000.5", "abc", "42"])).to_pylist()
    assert out == [1000.5, None, 42.0]


def test_normalize_ws():
    assert normalize_ws(pa.array(["  a\t b\n c  "])).to_pylist() == ["a b c"]


def test_rel_tolerance_both_zero_edge():
    # ≙ reconciliationEngine.js:28: bigger == 0 → match, discrepancy 0
    assert rel_tolerance_match(0.0, 0.0) == (True, 0.0, 0)


def test_rel_tolerance_threshold():
    ok, disc, pct = rel_tolerance_match(100.0, 100.5)
    assert ok and disc == pytest.approx(0.5)
    ok2, disc2, pct2 = rel_tolerance_match(100.0, 110.0)
    assert not ok2 and disc2 == pytest.approx(10.0) and pct2 == 9


def test_levenshtein_ratio():
    assert levenshtein_ratio("abc", "abc") == 1.0
    assert levenshtein_ratio("abc", "abd") == pytest.approx(2 / 3)
    assert levenshtein_ratio("", "abcd") == 0.0
    # long-pair guard falls back to a coarse bound, still in [0,1]
    r = levenshtein_ratio("x" * 5000, "y" * 5000, max_chars=100)
    assert 0.0 <= r <= 1.0


def test_token_set_ratio():
    assert token_set_ratio("a b c", "c b a") == 1.0
    assert token_set_ratio("a b", "a c") == pytest.approx(1 / 3)
    assert token_set_ratio("", "") == 1.0


def test_combined_distance_weights():
    # identical → 0; weights 0.6/0.4 ≙ reconciliationEngine.js:122
    assert combined_distance("same text", "same text") == 0.0
    d = combined_distance("a b", "a c")
    assert 0.0 < d < 1.0


def test_batched_and_bitparallel_levenshtein_match_scalar_dp():
    """levenshtein_many (vectorized DP rows) and myers_distance_many
    (Myers 1999 bit-parallel) must equal the scalar DP bit-for-bit on
    random strings, including empty strings and the 64-char word edge."""
    import random

    import numpy as np

    from invoice_ocr_reconciler_ray.functions.similarity import (
        _edit_distance,
        levenshtein_many,
        myers_distance_many,
        pack_myers,
        pack_strings,
    )

    rng = random.Random(7)
    for _trial in range(60):
        R = rng.randint(1, 25)
        strs = [
            "".join(rng.choice("abcde") for _ in range(rng.randint(0, 20)))
            for _ in range(R)
        ]
        a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 25)))
        want = np.array(
            [
                max(len(a), len(s))
                if not a or not s
                else _edit_distance(*sorted([a, s], key=len))
                for s in strs
            ]
        )
        mat, lens = pack_strings(strs)
        assert (levenshtein_many(a, mat, lens) == want).all()
        assert (myers_distance_many(a, pack_myers(strs)) == want).all()
    # word-boundary edge + the >64 fallback signal
    p = pack_myers(["x" * 64, "y" * 64, ""])
    assert myers_distance_many("x" * 64, p).tolist() == [0, 64, 64]
    assert pack_myers(["z" * 65]) is None


def test_levenshtein_ratio_many_equals_scalar_ratio():
    """The pair-axis-batched ratio kernel must equal levenshtein_ratio
    bit-for-bit across every branch: identical, prefix/suffix trims, empty
    remainders, the small scalar-DP case, the big batched case (chunked),
    and the >max_chars coarse-bound guard."""
    import random

    import numpy as np

    from invoice_ocr_reconciler_ray.functions.similarity import (
        levenshtein_ratio,
        levenshtein_ratio_many,
    )

    rng = random.Random(11)
    pairs = []
    for _ in range(300):
        n, m = rng.randint(0, 90), rng.randint(0, 90)
        pairs.append(
            (
                "".join(rng.choice("abcd") for _ in range(n)),
                "".join(rng.choice("abcd") for _ in range(m)),
            )
        )
    base = "p" * 250
    pairs += [
        ("same", "same"),
        ("", ""),
        ("", "xyz"),
        ("xyz", ""),
        (base + "aaa" + base, base + "aba" + base),  # big-DP after trim
        ("q" * 80, "q" * 60 + "z" * 40),  # mixed lengths
        ("a" * 3000, "b" * 3000),  # > max_chars coarse bound
    ]
    A = [a for a, _ in pairs]
    B = [b for _, b in pairs]
    for cap in (2000, 100):
        got = levenshtein_ratio_many(A, B, cap)
        want = np.array([levenshtein_ratio(a, b, cap) for a, b in pairs])
        assert (got == want).all()
