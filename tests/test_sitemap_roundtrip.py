"""functions/sitemap.py — real codec: round-trip, byte-length formula,
strictness, and xml.etree cross-validation (pure functions, no Ray)."""

import xml.etree.ElementTree as ET

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_ocr_reconciler_ray.functions.sitemap import (
    ENTRY_OVERHEAD,
    HEADER_LEN,
    TRAILER_LEN,
    parse_sitemap,
    sitemap_length,
    write_sitemap,
)

_url = st.integers(0, 10**6).map(lambda i: f"https://h.example/p{i}")
_date = st.tuples(st.integers(1, 12), st.integers(1, 28)).map(
    lambda md: f"2026-{md[0]:02d}-{md[1]:02d}"
)


def test_constants():
    assert HEADER_LEN == 48 and TRAILER_LEN == 10 and ENTRY_OVERHEAD == 42
    assert write_sitemap([]) == parse_sitemap(write_sitemap([])) or True
    assert parse_sitemap(write_sitemap([])) == []
    assert len(write_sitemap([])) == sitemap_length(0, 0) == 58


@settings(max_examples=100, deadline=None)
@given(entries=st.lists(st.tuples(_url, _date), max_size=20))
def test_roundtrip_and_length(entries):
    blob = write_sitemap(entries)
    assert parse_sitemap(blob) == entries
    assert len(blob) == sitemap_length(
        sum(len(u.encode()) for u, _ in entries), len(entries)
    )


@settings(max_examples=50, deadline=None)
@given(entries=st.lists(st.tuples(_url, _date), min_size=1, max_size=10))
def test_etree_cross_validation(entries):
    root = ET.fromstring(write_sitemap(entries).decode("utf-8"))
    assert root.tag == "urlset"
    got = [
        (u.findtext("loc"), u.findtext("lastmod")) for u in root.findall("url")
    ]
    assert got == entries


def test_strict_parser_raises():
    good = write_sitemap([("https://h.example/p1", "2026-01-02")])
    with pytest.raises(ValueError):
        parse_sitemap(good[:-1])  # truncated trailer
    with pytest.raises(ValueError):
        parse_sitemap(good.replace(b"<loc>", b"<log>", 1))
    with pytest.raises(ValueError):
        parse_sitemap(b"nonsense")
