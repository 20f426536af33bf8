"""Minimal REAL ZIP (PKZIP APPNOTE) writer + parser, stdlib-only.

Third archive container after tar (functions/tar.py) and the media
containers: a block of documents round-trips through genuine ZIP framing —
local file headers, a central directory, the end-of-central-directory
record, and real CRC-32 integrity words (zlib.crc32) — so the shard-ingest
path exercised in pipelines is the true on-disk format.  Scope: method 0
(stored) members with ASCII names, no zip64 — exactly what deterministic
size oracles need (stored size == payload size, SQL-expressible); anything
else raises rather than silently misparsing.  Parity with the stdlib:
``zipfile`` reads our output (CRC-checked on read) and we read
``zipfile``'s stored output (property-tested in tests/test_zip_roundtrip.py).
"""

from __future__ import annotations

import struct
import zlib

_LOCAL_SIG = b"PK\x03\x04"
_CENTRAL_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"


def build_zip(members: list[tuple[str, bytes]]) -> bytes:
    """Serialize (name, payload) members into one stored-method ZIP."""
    out = bytearray()
    central = bytearray()
    for name, payload in members:
        nm = name.encode("ascii")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        size = len(payload)
        if size > 0xFFFFFFFE or len(out) > 0xFFFFFFFE:
            raise ValueError("zip64 not supported")
        offset = len(out)
        # local file header: version 20, no flags, method 0 (stored),
        # deterministic DOS time/date 0 (the tar writer's epoch discipline)
        out += _LOCAL_SIG + struct.pack(
            "<HHHHHIIIHH", 20, 0, 0, 0, 0, crc, size, size, len(nm), 0
        )
        out += nm + payload
        central += _CENTRAL_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII",
            20, 20, 0, 0, 0, 0, crc, size, size, len(nm), 0, 0, 0, 0, 0, offset,
        )
        central += nm
    cd_offset = len(out)
    out += central
    out += _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, len(members), len(members), len(central), cd_offset, 0
    )
    return bytes(out)


def parse_zip(buf: bytes) -> list[tuple[str, bytes]]:
    """Parse a ZIP archive via its central directory, verifying CRC-32.

    Returns (name, payload) in central-directory order; raises ValueError
    on a bad signature, an unsupported method, or a CRC mismatch.
    """
    eocd_at = buf.rfind(_EOCD_SIG)
    if eocd_at < 0 or eocd_at + 22 > len(buf):
        raise ValueError("zip end-of-central-directory record not found")
    (_, _, n_here, n_total, cd_size, cd_offset, comment_len) = struct.unpack(
        "<HHHHIIH", buf[eocd_at + 4 : eocd_at + 22]
    )
    if n_here != n_total:
        raise ValueError("multi-disk zip not supported")
    members: list[tuple[str, bytes]] = []
    off = cd_offset
    for _ in range(n_total):
        if buf[off : off + 4] != _CENTRAL_SIG:
            raise ValueError(f"bad central-directory signature at {off}")
        (
            _ver_made, _ver_need, _flags, method, _t, _d, crc, csize, usize,
            name_len, extra_len, comment_len, _disk, _iattr, _eattr, lho,
        ) = struct.unpack("<HHHHHHIIIHHHHHII", buf[off + 4 : off + 46])
        if method != 0 or csize != usize:
            raise ValueError("only stored (method 0) members supported")
        name = buf[off + 46 : off + 46 + name_len].decode("ascii")
        off += 46 + name_len + extra_len + comment_len
        if buf[lho : lho + 4] != _LOCAL_SIG:
            raise ValueError(f"bad local-header signature at {lho}")
        (lname_len, lextra_len) = struct.unpack("<HH", buf[lho + 26 : lho + 30])
        data_at = lho + 30 + lname_len + lextra_len
        payload = bytes(buf[data_at : data_at + usize])
        if len(payload) != usize:
            raise ValueError("truncated zip member")
        if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
            raise ValueError(f"zip CRC mismatch for member {name!r}")
        members.append((name, payload))
    return members
