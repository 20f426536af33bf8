"""Minimal real PNG codec — stdlib ``zlib`` + numpy, no imaging library.

Implemented from the public PNG specification (W3C PNG / RFC 2083): chunk
stream parsing with CRC validation, IHDR, concatenated IDAT inflate, and
per-scanline unfiltering (filter types 0–4 incl. Paeth).  Supported subset:
8-bit depth, greyscale / RGB / RGBA (colour types 0, 2, 6), non-interlaced —
the shape every standard screenshot/thumbnail encoder emits.  This is the
always-available REAL decode path for ``stages/multimodal.ImageFeatures``
(≙ the reference's sharp-style image intake, server.js:110-134 environment);
PIL remains the env-gated fast path for the long tail (palette, 16-bit,
interlaced).

The encoder (filter type 0, one IDAT) exists so tests and fixtures can
produce spec-valid PNGs that any conforming viewer opens.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) or (h, w, channels).

    Raises ``ValueError`` on malformed data or an unsupported variant
    (callers do row-level error isolation)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos, n = 8, len(data)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8 or ctype_ not in _CHANNELS or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} colour={ctype_} "
            f"interlace={interlace}); install PIL for the full dialect"
        )
    ch = _CHANNELS[ctype_]
    stride = w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"IDAT inflate failed: {e}") from e
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            pass
        elif ftype == 2:  # up — vectorized
            row = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # sub/average/Paeth — sequential recurrence
            pr = prev.astype(np.int32)
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                if ftype == 1:
                    row[i] = (row[i] + a) & 0xFF
                elif ftype == 3:
                    row[i] = (row[i] + ((a + pr[i]) >> 1)) & 0xFF
                else:
                    c = pr[i - ch] if i >= ch else 0
                    row[i] = (row[i] + _paeth(int(a), int(pr[i]), int(c))) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        prev = row.astype(np.uint8)
        out[r] = prev
    arr = out.reshape(h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) / (h, w, {1,3,4}) → spec-valid PNG (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    scan = b"".join(b"\x00" + a[r].tobytes() for r in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
