"""Unit tests for the ZIP container codec and the Damerau-Levenshtein kernel.

Both are cross-validated against an independent implementation: zipfile
(stdlib) for the container framing and DuckDB's damerau_levenshtein() for
the string distance — the same discipline as tests/test_tar_roundtrip.py.
No Ray session needed.
"""

from __future__ import annotations

import io
import random
import zipfile

import duckdb
import pytest

from invoice_ocr_reconciler_ray.functions.similarity import damerau_levenshtein
from invoice_ocr_reconciler_ray.functions.zip import build_zip, parse_zip


def _members(rng: random.Random, n: int) -> list[tuple[str, bytes]]:
    return [
        (
            f"m_{i:06d}.bin",
            bytes(rng.randrange(256) for _ in range(rng.randrange(0, 600))),
        )
        for i in range(n)
    ]


def test_zip_roundtrip_ours():
    rng = random.Random(11)
    members = _members(rng, 25)
    assert parse_zip(build_zip(members)) == members


def test_zip_stdlib_reads_ours():
    rng = random.Random(12)
    members = _members(rng, 10)
    zf = zipfile.ZipFile(io.BytesIO(build_zip(members)))
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == members
    assert zf.testzip() is None  # stdlib CRC sweep


def test_zip_reads_stdlib():
    rng = random.Random(13)
    members = _members(rng, 10)
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_STORED) as z:
        for name, payload in members:
            z.writestr(name, payload)
    assert parse_zip(bio.getvalue()) == members


def test_zip_crc_corruption_detected():
    members = [("a.txt", b"hello world payload")]
    buf = bytearray(build_zip(members))
    # flip one payload byte: local header is 30 + 5 name bytes
    buf[30 + 5 + 3] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        parse_zip(bytes(buf))


def test_zip_empty_archive():
    assert parse_zip(build_zip([])) == []


def test_dl_textbook_cases():
    assert damerau_levenshtein("CA", "ABC") == 2  # unrestricted, not OSA's 3
    assert damerau_levenshtein("abcd", "abdc") == 1  # adjacent transpose
    assert damerau_levenshtein("", "xyz") == 3
    assert damerau_levenshtein("xyz", "") == 3
    assert damerau_levenshtein("same", "same") == 0
    assert damerau_levenshtein("kitten", "sitting") == 3


def test_dl_matches_duckdb_property():
    con = duckdb.connect()
    rng = random.Random(1789)
    for _ in range(400):
        a = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
        ours = damerau_levenshtein(a, b)
        theirs = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert ours == theirs, (a, b, ours, theirs)
