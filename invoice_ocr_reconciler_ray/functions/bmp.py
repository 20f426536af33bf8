"""Real BMP codec (stdlib-only): uncompressed 24/32-bit BITMAPINFOHEADER.

Third REAL image-container path next to the spec-valid PNG codec
(functions/png.py) and the deterministic fake format — BMP is the simplest
widely-used raster container (Windows DIB: 14-byte file header, 40-byte
info header, bottom-up BGR(A) scanlines padded to 4 bytes), so it
exercises the multimodal actor-pool plumbing with a second true on-disk
format at near-zero code risk.  Encode always writes 24-bit; decode
accepts 24- and 32-bit uncompressed (BI_RGB), top-down or bottom-up.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    pixel_bytes = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", BMP_MAGIC, off + pixel_bytes, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    bgr = arr[:, :, ::-1]  # RGB -> BGR
    rows = []
    padding = b"\x00" * pad
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(bgr[y].tobytes() + padding)
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB (alpha dropped for 32-bit)."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP stream")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP variant: bpp={bpp} compression={compression}")
    top_down = h_signed < 0
    h = abs(h_signed)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        y = i if top_down else h - 1 - i
        row = np.frombuffer(data, dtype=np.uint8, count=w * nch, offset=off + i * stride)
        px = row.reshape(w, nch)
        out[y] = px[:, 2::-1][:, :3] if nch == 3 else px[:, [2, 1, 0]]
    return out
