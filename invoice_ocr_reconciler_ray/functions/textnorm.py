"""Text/number canonicalization kernels.

Vectorized (pyarrow.compute) ports of the reference's normalizers:
``normalizeVendor`` (reconciliationEngine.js:15-23), ``normalizeAmount``
(reconciliationEngine.js:8-13) and ``parseAmount`` (invoiceParser.js:54-59).
These run inside ``map_batches`` over Arrow arrays — no Python row loops.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ≙ the corporate-suffix list at reconciliationEngine.js:19 (order-free —
# applied as one alternation, semantics identical because suffixes are
# whole words)
_SUFFIX_RE = r"\b(ltd|limited|inc|incorporated|llc|corp|corporation|co|company|pvt|private)\b\.?"


def normalize_vendor(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """lowercase → drop corporate suffixes → strip non-alphanumerics →
    collapse whitespace → trim (≙ normalizeVendor reconciliationEngine.js:15-23).

    Graft role: text canonicalization applied identically to extracted and
    reference text before alignment."""
    x = pc.utf8_lower(arr)
    x = pc.replace_substring_regex(x, _SUFFIX_RE, "")
    x = pc.replace_substring_regex(x, r"[^a-z0-9\s]", "")
    x = pc.replace_substring_regex(x, r"\s+", " ")
    return pc.utf8_trim_whitespace(x)


def normalize_ws(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Whitespace collapse + trim — the alignment-side canonicalizer."""
    return pc.utf8_trim_whitespace(pc.replace_substring_regex(arr, r"\s+", " "))


def normalize_amount(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """String/number → float64; strips ``$ , space``; invalid → 0.0
    (≙ normalizeAmount reconciliationEngine.js:8-13)."""
    if pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type):
        return pc.cast(arr, pa.float64())
    cleaned = pc.replace_substring_regex(arr, r"[$,\s]", "")
    # extract a leading float token; non-numeric → null → 0
    tok = pc.extract_regex(cleaned, r"^(?P<v>-?\d*\.?\d+)")
    v = pc.struct_field(tok, "v")
    f = pc.cast(v, pa.float64())
    return pc.coalesce(f, pa.scalar(0.0, pa.float64()))


def parse_amount(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Strip commas → float; unparseable → null (≙ parseAmount
    invoiceParser.js:54-59 — null-preserving, unlike normalize_amount)."""
    cleaned = pc.utf8_trim_whitespace(pc.replace_substring(arr, ",", ""))
    tok = pc.extract_regex(cleaned, r"^(?P<v>-?\d*\.?\d+)")
    return pc.cast(pc.struct_field(tok, "v"), pa.float64())
