"""Soundex (simple American variant) — the classic phonetic blocking key
for record linkage, implemented identically here and in the SQL oracle.

Variant spec (deterministic, SQL-mirrorable):

1. uppercase; strip non-alpha; empty → ''.
2. code every letter: BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6,
   AEIOUYHW→0 (vowels and H/W both break nothing in this variant —
   they code to 0 and vanish after the run collapse).
3. collapse adjacent equal codes (including the first position).
4. key = first LETTER + first three non-zero codes of the collapsed
   string after dropping its first code, right-padded with '0'.

This is the widely-implemented "simple" soundex (it treats H/W like
vowels); the full NARA variant differs only on H/W-separated repeats.
"""

from __future__ import annotations

import re

_CODE = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "01230120022455012623010202",
)
_ALPHA = re.compile(r"[^A-Za-z]+")
_RUNS = re.compile(r"(.)\1+")


def soundex(name: str | None) -> str:
    """Simple-variant Soundex key ('' for inputs with no letters)."""
    letters = _ALPHA.sub("", name or "").upper()
    if not letters:
        return ""
    codes = letters.translate(_CODE)
    collapsed = _RUNS.sub(r"\1", codes)
    tail = collapsed[1:].replace("0", "")
    return letters[0] + (tail + "000")[:3]
