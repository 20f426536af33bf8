"""functions/warc.py — real WARC/1.0 framing, length-delimited parse."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_ocr_reconciler_ray.functions.warc import (
    FIXED_OVERHEAD,
    parse_records,
    record_length,
    write_record,
)


def test_roundtrip_basic():
    recs = parse_records(write_record(7, b"hello") + write_record(42, b""))
    assert [(r["doc_id"], r["payload"]) for r in recs] == [
        (7, b"hello"),
        (42, b""),
    ]
    assert recs[0]["uri"] == "https://corpus.example/7"


def test_payload_containing_trailer_sentinel():
    # framing is by Content-Length, NOT by scanning for \r\n\r\n: a payload
    # embedding the header terminator and even a fake header must survive
    evil = b"\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    recs = parse_records(write_record(3, evil) + write_record(4, b"after"))
    assert [r["payload"] for r in recs] == [evil, b"after"]


def test_record_length_formula():
    for doc_id, payload in [(0, b""), (9, b"x"), (123456, b"y" * 987)]:
        assert len(write_record(doc_id, payload)) == record_length(
            doc_id, len(payload)
        )
    assert record_length(0, 0) == FIXED_OVERHEAD + 2 + 1


def test_malformed_raises():
    good = write_record(1, b"abc")
    with pytest.raises(ValueError):
        parse_records(good[:-1])  # clipped trailer
    with pytest.raises(ValueError):
        parse_records(b"WARC/0.9\r\n\r\n")
    with pytest.raises(ValueError):
        parse_records(b"WARC/1.0\r\nnoseparator")


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12), st.binary(max_size=400)
        ),
        max_size=8,
    )
)
def test_roundtrip_property(items):
    buf = b"".join(write_record(i, p) for i, p in items)
    recs = parse_records(buf)
    assert [(r["doc_id"], r["payload"]) for r in recs] == items
    assert [r["record_len"] for r in recs] == [
        record_length(i, len(p)) for i, p in items
    ]
    # offsets reconstruct the exact byte layout
    pos = 0
    for r, (i, p) in zip(recs, items):
        assert buf[pos : pos + r["record_len"]] == write_record(i, p)
        pos += r["record_len"]
    assert pos == len(buf)
