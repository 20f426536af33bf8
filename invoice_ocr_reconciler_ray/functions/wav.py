"""Real WAV (RIFF/PCM) codec on the stdlib ``wave`` module — the audio
counterpart of functions/png.py: the multimodal audio stage decodes REAL
container bytes end-to-end (≙ the reference's decode-real-documents job,
server.js:110-134), not only the deterministic fake format.  PCM16 only —
the dominant interchange encoding; other sample widths raise ValueError so
callers surface a row-level error, never a task failure.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """int16 samples (frames·channels flat, or (frames, channels)) → WAV
    bytes via the stdlib writer."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 2:
        n_channels = arr.shape[1]
        arr = arr.reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def is_wav(payload: bytes) -> bool:
    return payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((frames, channels) int16 array, sample_rate).

    Raises ValueError on a corrupt container or a non-PCM16 encoding."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(f"unsupported sample width {w.getsampwidth()}")
            nch = w.getnchannels()
            sr = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"corrupt WAV container: {e}") from e
    arr = np.frombuffer(raw, dtype=np.int16)
    frames = len(arr) // nch if nch else 0
    return arr[: frames * nch].reshape(frames, nch), sr
