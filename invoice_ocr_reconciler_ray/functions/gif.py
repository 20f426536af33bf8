"""Real GIF87a codec (stdlib-only): palettized raster + true LZW.

Fourth REAL image-container path next to PNG (functions/png.py), BMP
(functions/bmp.py) and the deterministic fake format.  GIF exercises a
genuinely different decode shape: a global color table plus VARIABLE-WIDTH
LZW compression with CLEAR/EOI control codes packed LSB-first into 255-byte
sub-blocks — the same scheme TIFF and Unix compress use, so the decoder here
is a real dictionary coder, not a container shim.

Encode writes a single-frame non-interlaced GIF87a with a global color
table (the image must have ≤ 256 distinct colors — GIF is palettized by
spec); LZW is the real dictionary-building encoder.  Width-change timing is
the subtle part of GIF LZW: the decoder grows the code width after ITS
table add (one read behind the encoder's), so the encoder must grow when
next_code EXCEEDS 1<<width while the decoder grows when it REACHES it —
the classic "early change" pairing used by giflib.  When the table fills
(4096 codes) the encoder emits CLEAR and resets, which every spec decoder
honors.

Decode handles GIF87a/89a headers, skips extension blocks (0x21 …), reads
the first image descriptor, rejects interlaced images (the encoder never
writes them) and local-table-less files without a global table.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF8"  # common prefix of GIF87a / GIF89a

_MAX_WIDTH = 12
_TABLE_CAP = 1 << _MAX_WIDTH


class _BitWriter:
    """LSB-first bit packer (GIF's code packing order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    bw = _BitWriter()
    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bw.write(clear, width)
    buf = bytes([int(indices[0])])
    for k in indices[1:]:
        cand = buf + bytes([int(k)])
        if cand in table:
            buf = cand
            continue
        bw.write(table[buf], width)
        if next_code < _TABLE_CAP:
            table[cand] = next_code
            next_code += 1
            # encoder "early change": grow when next_code EXCEEDS 1<<width
            if next_code > (1 << width) and width < _MAX_WIDTH:
                width += 1
            if next_code == _TABLE_CAP:
                bw.write(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = mcs + 1
        buf = bytes([int(k)])
    bw.write(table[buf], width)
    bw.write(eoi, width)
    return bw.flush()


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW code {code}")
        out += entry
        if prev is not None and len(table) < _TABLE_CAP:
            table.append(prev + entry[:1])
            # decoder grows when next_code REACHES 1<<width
            if len(table) >= (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = entry
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended before the raster was complete")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def encode_gif(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB with ≤256 distinct colors → GIF87a bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    colors, inverse = np.unique(arr.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF is palettized: {len(colors)} > 256 distinct colors")
    field = max(0, int(len(colors) - 1).bit_length() - 1)  # GCT size exponent-1
    pal_n = 1 << (field + 1)
    if pal_n < len(colors):
        field += 1
        pal_n = 1 << (field + 1)
    mcs = max(2, field + 1)
    gct = np.zeros((pal_n, 3), dtype=np.uint8)
    gct[: len(colors)] = colors
    header = b"GIF87a"
    lsd = struct.pack("<HHBBB", w, h, 0x80 | field, 0, 0)
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    lzw = _lzw_encode(inverse.astype(np.uint8), mcs)
    blocks = bytearray()
    blocks.append(mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return header + lsd + gct.tobytes() + img_desc + bytes(blocks) + b"\x3b"


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes (first frame) → (h, w, 3) uint8 RGB."""
    if data[:4] != GIF_MAGIC or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF87a/GIF89a stream")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    _, _, flags, _, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 0x07) + 1)
        gct = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=pos).reshape(
            n, 3
        )
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _, _, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            pal = gct
            if iflags & 0x80:
                n = 1 << ((iflags & 0x07) + 1)
                pal = np.frombuffer(
                    data, dtype=np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image without any color table")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(bytes(lzw), mcs, w * h)
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("palette index out of range")
            return pal[idx].reshape(h, w, 3)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")
