"""Multimodal columns — decode / feature / resize / frame-sample stages.

Media travels **in-table** as an opaque Arrow ``binary`` column plus typed
metadata (same convention as the ``html`` column, SURVEY §1.4), and every
stage is an actor-pool ``map_batches`` (heavy codec state belongs in
``__init__``, ≙ the reference's OCR-worker singleton ``server.js:110-121`` —
one init per actor, not per batch).

The sandbox has no image/audio codecs, so the *decode* innermost step is
gated: real libraries are tried at actor init (``import PIL`` /
``soundfile``), and when absent the actor falls back to a **deterministic
fake decoder** over this module's own synthetic payload format.  Everything
Ray-side — schema, batch sizing, actor signature, output layout — is real
and tested; swapping in a real codec touches only ``_decode_*``.

Synthetic payload format (deterministic, content-derived):
  image: b"FAKEIMG1" + uint16 height + uint16 width + uint8 channels + pixels
         (pixels = blake2b keystream of the media_id, row-major)
  audio: b"FAKEAUD1" + uint32 sample_rate + uint32 n_samples + int16 samples
  video: b"FAKEVID1" + uint16 n_frames + per-frame image payloads
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # free-form typed metadata (JSON)
    ]
)

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"
_VID_MAGIC = b"FAKEVID1"


def _keystream(seed: int, n: int) -> np.ndarray:
    out = bytearray()
    ctr = 0
    while len(out) < n:
        out += hashlib.blake2b(f"{seed}:{ctr}".encode(), digest_size=64).digest()
        ctr += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def fake_image(media_id: int, h: int, w: int, c: int = 3) -> bytes:
    px = _keystream(media_id, h * w * c)
    return _IMG_MAGIC + struct.pack("<HHB", h, w, c) + px.tobytes()


def fake_audio(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    raw = _keystream(media_id * 7 + 1, n_samples * 2)
    return _AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + raw.tobytes()


def fake_video(media_id: int, n_frames: int, h: int, w: int) -> bytes:
    frames = b"".join(
        fake_image(media_id * 1000 + f, h, w) for f in range(n_frames)
    )
    return _VID_MAGIC + struct.pack("<H", n_frames) + frames


def media_table_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministic media rows derived from the documents table (test/bench
    source; at deployment the payload column arrives in the input parquet)."""
    ids = batch.column("doc_id").to_pylist()
    rows_id, rows_kind, rows_payload, rows_meta = [], [], [], []
    for d in ids:
        d = int(d)
        kind = ("image", "audio", "video")[d % 3]
        if kind == "image":
            h, w = 16 + d % 48, 16 + (d * 3) % 48
            if d % 6 == 0:
                # every other image row is a REAL spec-valid PNG of the same
                # deterministic pixels — the pipeline exercises the genuine
                # codec path (functions/png.py) at scale, and features are
                # identical either way (PNG is lossless)
                from ..functions.png import encode_png

                px = _keystream(d, h * w * 3).reshape(h, w, 3)
                payload = encode_png(px)
            elif d % 12 == 3:
                # ...and a quarter of image rows are REAL 24-bit BMPs of the
                # same deterministic pixels (functions/bmp.py) — multiple
                # container formats flow through one decode stage, features
                # identical (both real codecs are lossless)
                from ..functions.bmp import encode_bmp

                px = _keystream(d, h * w * 3).reshape(h, w, 3)
                payload = encode_bmp(px)
            elif d % 24 == 9:
                # ...and half the remaining rows are REAL GIF87a (true LZW,
                # functions/gif.py) — GIF is palettized by spec, so these
                # rows quantize the keystream to a deterministic 64-color
                # palette (levels 0/85/170/255); d%24==21 rows stay
                # fake-format so all four paths run in-pipeline
                from ..functions.gif import encode_gif

                px = (_keystream(d, h * w * 3).reshape(h, w, 3) % 4) * 85
                payload = encode_gif(px.astype(np.uint8))
            else:
                payload = fake_image(d, h, w)
            meta = f'{{"h":{h},"w":{w},"c":3}}'
        elif kind == "audio":
            sr, n = 8000, 1000 + (d % 7) * 500
            if d % 6 == 1:
                # every other audio row is a REAL RIFF/WAVE container with
                # the same deterministic samples — the genuine stdlib codec
                # path (functions/wav.py) runs in-pipeline; PCM16 is
                # lossless so features are identical either way
                from ..functions.wav import encode_wav

                # same keystream as fake_audio → identical samples, so the
                # two container formats are feature-parity-testable
                samples = np.frombuffer(
                    _keystream(d * 7 + 1, n * 2).tobytes(), dtype=np.int16
                )
                payload = encode_wav(samples, sr)
            else:
                payload = fake_audio(d, sr, n)
            meta = f'{{"sample_rate":{sr},"n_samples":{n}}}'
        else:
            nf, h, w = 2 + d % 4, 16, 16
            payload = fake_video(d, nf, h, w)
            meta = f'{{"n_frames":{nf},"h":{h},"w":{w}}}'
        rows_id.append(d)
        rows_kind.append(kind)
        rows_payload.append(payload)
        rows_meta.append(meta)
    return pa.Table.from_arrays(
        [
            pa.array(rows_id, pa.int64()),
            pa.array(rows_kind, pa.string()),
            pa.array(rows_payload, pa.binary()),
            pa.array(rows_meta, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def _decode_fake_image(payload: bytes) -> np.ndarray:
    h, w, c = struct.unpack_from("<HHB", payload, len(_IMG_MAGIC))
    off = len(_IMG_MAGIC) + 5
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * c, offset=off).reshape(
        h, w, c
    )


def _decode_any_image(payload: bytes) -> np.ndarray:
    """Fake-format, real PNG (functions/png.py) or real BMP
    (functions/bmp.py) → uint8 array; always (h, w, c)."""
    if payload[: len(_IMG_MAGIC)] == _IMG_MAGIC:
        return _decode_fake_image(payload)
    from ..functions.png import PNG_MAGIC, decode_png

    if payload[: len(PNG_MAGIC)] == PNG_MAGIC:
        arr = decode_png(payload)
        return arr[:, :, None] if arr.ndim == 2 else arr
    from ..functions.bmp import BMP_MAGIC, decode_bmp

    if payload[: len(BMP_MAGIC)] == BMP_MAGIC:
        return decode_bmp(payload)
    from ..functions.gif import GIF_MAGIC, decode_gif

    if payload[: len(GIF_MAGIC)] == GIF_MAGIC:
        return decode_gif(payload)
    raise ValueError("unknown image payload format")


class ImageFeatures:
    """Actor-pool stage: decode image payloads → shape + channel-mean features.

    Use as ``ds.map_batches(ImageFeatures, concurrency=(2, 8), batch_size=64,
    num_cpus=1)`` — small batches: payloads are large, features are tiny.
    """

    def __init__(self) -> None:
        try:  # real codec path — not present in this sandbox
            from PIL import Image  # noqa: F401

            self._backend = "pil"
        except ImportError:
            self._backend = "fake"

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload[: len(_IMG_MAGIC)] == _IMG_MAGIC:
            return _decode_fake_image(payload)
        from ..functions.png import PNG_MAGIC, decode_png

        if payload[: len(PNG_MAGIC)] == PNG_MAGIC:
            try:  # real stdlib PNG decode (functions/png.py)
                return decode_png(payload)
            except ValueError:
                if self._backend != "pil":  # unsupported variant, no PIL
                    raise
        from ..functions.bmp import BMP_MAGIC, decode_bmp

        if payload[: len(BMP_MAGIC)] == BMP_MAGIC:
            try:  # real stdlib BMP decode (functions/bmp.py)
                return decode_bmp(payload)
            except ValueError:
                if self._backend != "pil":  # unsupported variant, no PIL
                    raise
        from ..functions.gif import GIF_MAGIC, decode_gif

        if payload[: len(GIF_MAGIC)] == GIF_MAGIC:
            try:  # real stdlib GIF decode (functions/gif.py, true LZW)
                return decode_gif(payload)
            except ValueError:
                if self._backend != "pil":  # unsupported variant, no PIL
                    raise
        if self._backend == "pil":
            import io

            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(payload)))
        raise NotImplementedError("real image codecs unavailable in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, heights, widths, chans, means, errors = [], [], [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            ids.append(mid)
            try:
                arr = self._decode(payload)
                heights.append(arr.shape[0])
                widths.append(arr.shape[1])
                chans.append(arr.shape[2] if arr.ndim == 3 else 1)
                means.append([float(x) for x in arr.reshape(-1, arr.shape[-1]).mean(0)])
                errors.append(None)
            except Exception as e:  # row-level isolation (≙ server.js:334-339)
                heights.append(0)
                widths.append(0)
                chans.append(0)
                means.append([])
                errors.append(f"{type(e).__name__}: {e}")
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(heights, pa.int32()),
                pa.array(widths, pa.int32()),
                pa.array(chans, pa.int32()),
                pa.array(means, pa.list_(pa.float64())),
                pa.array(errors, pa.string()),
            ],
            names=["media_id", "height", "width", "channels", "channel_means", "error"],
        )


class ImageResize:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode (fake
    format).  Output stays a binary column so stages compose."""

    def __init__(self, out_h: int = 8, out_w: int = 8) -> None:
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            arr = _decode_any_image(payload)
            ys = (np.arange(self.out_h) * arr.shape[0] // self.out_h).astype(int)
            xs = (np.arange(self.out_w) * arr.shape[1] // self.out_w).astype(int)
            small = arr[np.ix_(ys, xs)]
            ids.append(mid)
            payloads.append(
                _IMG_MAGIC
                + struct.pack("<HHB", self.out_h, self.out_w, small.shape[2])
                + small.tobytes()
            )
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary())],
            names=["media_id", "payload"],
        )


class FrameSampler:
    """Actor-pool stage over video payloads: emit every k-th frame as an image
    row (one input row → n output rows; list column flattened downstream)."""

    def __init__(self, every: int = 2) -> None:
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_payload = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            (n_frames,) = struct.unpack_from("<H", payload, len(_VID_MAGIC))
            off = len(_VID_MAGIC) + 2
            for f in range(n_frames):
                h, w, c = struct.unpack_from("<HHB", payload, off + len(_IMG_MAGIC))
                size = len(_IMG_MAGIC) + 5 + h * w * c
                if f % self.every == 0:
                    out_id.append(mid)
                    out_frame.append(f)
                    out_payload.append(payload[off : off + size])
                off += size
        return pa.Table.from_arrays(
            [
                pa.array(out_id, pa.int64()),
                pa.array(out_frame, pa.int32()),
                pa.array(out_payload, pa.binary()),
            ],
            names=["media_id", "frame_idx", "payload"],
        )


class AudioFeatures:
    """Actor-pool stage: audio payload → duration + RMS energy.

    Routes by container magic like the image stage: real RIFF/WAVE PCM16
    payloads decode through the stdlib codec (functions/wav.py); the
    deterministic fake format remains for payload-free plumbing tests."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.wav import decode_wav, is_wav

        ids, durs, rmss = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            if payload[: len(_AUD_MAGIC)] == _AUD_MAGIC:
                sr, n = struct.unpack_from("<II", payload, len(_AUD_MAGIC))
                samples = np.frombuffer(
                    payload, dtype=np.int16, count=n, offset=len(_AUD_MAGIC) + 8
                ).astype(np.float64)
            elif is_wav(payload):
                frames, sr = decode_wav(payload)
                n = frames.shape[0]
                samples = frames.astype(np.float64).reshape(-1)
            else:
                raise ValueError("unknown audio payload format")
            ids.append(mid)
            durs.append(n / sr)
            rmss.append(float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(durs, pa.float64()),
                pa.array(rmss, pa.float64()),
            ],
            names=["media_id", "duration_sec", "rms"],
        )
