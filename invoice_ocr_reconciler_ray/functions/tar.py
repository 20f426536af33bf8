"""Minimal REAL ustar (POSIX.1-1988 tar) writer + parser, stdlib-only.

The engine treats archive containers as just another source format: a block
of documents round-trips through genuine 512-byte ustar framing (octal
size fields, space-initialised checksum, end-of-archive double zero block)
so the parse path exercised in pipelines is the real on-disk format, not a
fake.  Scope: regular files (typeflag '0'), names ≤ 100 bytes — exactly the
subset the synthetic corpus needs; anything else raises rather than
silently misparsing.  Parity with the stdlib: ``tarfile`` reads our output
and we read ``tarfile``'s (property-tested in tests/test_tar_roundtrip.py).
"""

from __future__ import annotations

BLOCK = 512


def _octal(value: int, width: int) -> bytes:
    """NUL-terminated, zero-padded octal field (ustar numeric encoding)."""
    s = format(value, "o").encode("ascii")
    if len(s) > width - 1:
        raise ValueError(f"value {value} overflows {width}-byte octal field")
    return s.rjust(width - 1, b"0") + b"\x00"


def _header(name: bytes, size: int) -> bytes:
    if len(name) > 100:
        raise ValueError("ustar member name longer than 100 bytes")
    h = bytearray(BLOCK)
    h[0 : len(name)] = name
    h[100:108] = _octal(0o644, 8)  # mode
    h[108:116] = _octal(0, 8)  # uid
    h[116:124] = _octal(0, 8)  # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(0, 12)  # mtime (deterministic: epoch)
    h[148:156] = b" " * 8  # checksum is computed over spaces
    h[156] = ord("0")  # typeflag: regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = format(chk, "06o").encode("ascii") + b"\x00 "
    return bytes(h)


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Serialize (name, payload) members into one ustar archive."""
    out = bytearray()
    for name, payload in members:
        out += _header(name.encode("utf-8"), len(payload))
        out += payload
        pad = (-len(payload)) % BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * BLOCK)  # end-of-archive marker
    return bytes(out)


def parse_tar(buf: bytes) -> list[tuple[str, bytes]]:
    """Parse a ustar archive, verifying every header checksum.

    Returns (name, payload) in archive order; raises ValueError on a
    corrupt header or a truncated member.
    """
    members: list[tuple[str, bytes]] = []
    off = 0
    n = len(buf)
    while off + BLOCK <= n:
        h = buf[off : off + BLOCK]
        if h == b"\x00" * BLOCK:  # end-of-archive
            break
        stored = int(h[148:156].rstrip(b"\x00 ").lstrip(b" ") or b"0", 8)
        calc = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
        if stored != calc:
            raise ValueError(f"tar header checksum mismatch at offset {off}")
        name = h[0:100].rstrip(b"\x00").decode("utf-8")
        size = int(h[124:136].rstrip(b"\x00 ") or b"0", 8)
        typeflag = h[156:157]
        if typeflag not in (b"0", b"\x00"):
            raise ValueError(f"unsupported tar typeflag {typeflag!r}")
        data_start = off + BLOCK
        if data_start + size > n:
            raise ValueError("truncated tar member")
        members.append((name, bytes(buf[data_start : data_start + size])))
        off = data_start + size + ((-size) % BLOCK)
    return members
