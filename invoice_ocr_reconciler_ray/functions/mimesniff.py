"""Magic-byte MIME sniffer over the repo's real container codecs.

The ingest-routing primitive (≙ the flagship's `%PDF-` sniff, generalized):
classify a binary payload by its leading magic bytes, never by extension.
Covers exactly the containers this engine has REAL codecs for (pdf, png,
bmp, gif, wav) plus html and the octet-stream fallback.
"""

from __future__ import annotations

_MAGIC: list[tuple[bytes, str]] = [
    (b"%PDF-", "pdf"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"BM", "bmp"),
]


def sniff(payload: bytes | None) -> str:
    """Leading-bytes classification; 'octet-stream' when nothing matches."""
    if not payload:
        return "empty"
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    head = payload[:256].lstrip().lower()
    if head.startswith(b"<!doctype html") or head.startswith(b"<html"):
        return "html"
    return "octet-stream"
