"""functions/tar.py — real ustar framing, cross-validated against stdlib."""

import io
import tarfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_ocr_reconciler_ray.functions.tar import BLOCK, build_tar, parse_tar


def test_roundtrip_basic():
    members = [("a.txt", b"hello"), ("b.txt", b"x" * 1000), ("empty.txt", b"")]
    assert parse_tar(build_tar(members)) == members


def test_stdlib_reads_ours():
    members = [("doc_1.txt", b"hi"), ("doc_2.txt", b"\x00\xff" * 300)]
    tf = tarfile.open(fileobj=io.BytesIO(build_tar(members)))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == members


def test_we_read_stdlib():
    members = [("x.txt", b"payload"), ("y.txt", b"")]
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w", format=tarfile.USTAR_FORMAT) as w:
        for n, p in members:
            ti = tarfile.TarInfo(n)
            ti.size = len(p)
            w.addfile(ti, io.BytesIO(p))
    assert parse_tar(bio.getvalue()) == members


def test_block_alignment():
    buf = build_tar([("a", b"z" * 513)])
    # header + 2 data blocks + 2 end blocks
    assert len(buf) == BLOCK * (1 + 2 + 2)
    assert len(buf) % BLOCK == 0


def test_checksum_corruption_detected():
    buf = bytearray(build_tar([("a.txt", b"data")]))
    buf[5] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(buf))


def test_truncated_member_detected():
    buf = build_tar([("a.txt", b"q" * 600)])
    with pytest.raises(ValueError, match="truncated"):
        parse_tar(buf[: BLOCK + 100])


def test_name_overflow_raises():
    with pytest.raises(ValueError, match="100 bytes"):
        build_tar([("n" * 101, b"")])


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[a-z0-9_]{1,40}\.txt", fullmatch=True),
            st.binary(max_size=2000),
        ),
        max_size=8,
    )
)
def test_roundtrip_property(members):
    assert parse_tar(build_tar(members)) == members
