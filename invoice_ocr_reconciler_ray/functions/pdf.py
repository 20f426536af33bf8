"""PDF layout parser — pdfminer-style XY-cut segmentation, minimal dialect.

The graft of the reference's heavy per-document OCR stage (Tesseract worker
singleton, reference server.js:110-134): a stateful parser hosted in an actor
pool (see stages/extract.py), here operating on PDF bytes carried in-table as
an Arrow ``binary`` column.

This container has no PDF library (no pdfminer/pypdf — import-gated below),
so the REAL-LIBRARY DECODE IS STUBBED: ``extract_pdf_full`` raises
``NotImplementedError`` unless pdfminer is importable.  What IS real and
tested is everything Ray-side (routing by magic bytes, actor-pool plumbing,
schema, spans, error isolation) plus a genuine XY-cut reading-order
implementation over a minimal uncompressed PDF text-operator dialect
(``BT … Td … (text) Tj … ET``), which the deterministic fixture generator
(sources/pages.py) emits.  The XY-cut itself — recursive cut on the larger
whitespace gap, x then y — is the published algorithm (Nagy et al., 1992),
implemented from its public description.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from .html import Extraction

PDF_MAGIC = b"%PDF-"

_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
_TD_RE = re.compile(rb"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s+Td")
_TJ_RE = re.compile(rb"\((.*?(?<!\\))\)\s*Tj", re.S)
_ESC_RE = re.compile(rb"\\([nrtbf()\\]|[0-7]{1,3})")

_ESC_MAP = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(s: bytes) -> bytes:
    def sub(m: re.Match[bytes]) -> bytes:
        g = m.group(1)
        if g in _ESC_MAP:
            return _ESC_MAP[g]
        return bytes([int(g, 8)])

    return _ESC_RE.sub(sub, s)


class TextLine(NamedTuple):
    x: float
    y: float
    text: str


def parse_text_lines(raw: bytes) -> list[TextLine]:
    """Collect positioned text lines from BT…ET blocks (minimal dialect).

    Each BT block sets an absolute position with ``x y Td`` and shows one or
    more strings with ``(…) Tj``; strings within one block concatenate.
    """
    lines: list[TextLine] = []
    for bt in _BT_RE.finditer(raw):
        body = bt.group(1)
        td = _TD_RE.search(body)
        if not td:
            continue
        x, y = float(td.group(1)), float(td.group(2))
        parts = [_unescape(m.group(1)) for m in _TJ_RE.finditer(body)]
        if not parts:
            continue
        text = b"".join(parts).decode("utf-8", errors="strict")
        lines.append(TextLine(x, y, text))
    return lines


def xy_cut(lines: list[TextLine], min_gap_x: float = 60.0, min_gap_y: float = 30.0) -> list[TextLine]:
    """Recursive XY-cut reading order: split on the largest whitespace gap,
    preferring vertical cuts (columns, left→right) then horizontal (bands,
    top→bottom); leaves are read top→bottom, left→right."""
    if len(lines) <= 1:
        return list(lines)

    def largest_gap(vals: list[float], min_gap: float) -> float | None:
        vs = sorted(set(vals))
        best, best_gap = None, min_gap
        for a, b in zip(vs, vs[1:]):
            if b - a > best_gap:
                best, best_gap = (a + b) / 2.0, b - a
            # strictly-greater keeps ties deterministic (first/lowest wins)
        return best

    cut_x = largest_gap([ln.x for ln in lines], min_gap_x)
    if cut_x is not None:
        left = [ln for ln in lines if ln.x < cut_x]
        right = [ln for ln in lines if ln.x >= cut_x]
        if left and right:
            return xy_cut(left, min_gap_x, min_gap_y) + xy_cut(right, min_gap_x, min_gap_y)
    cut_y = largest_gap([ln.y for ln in lines], min_gap_y)
    if cut_y is not None:
        top = [ln for ln in lines if ln.y >= cut_y]  # PDF y grows upward
        bottom = [ln for ln in lines if ln.y < cut_y]
        if top and bottom:
            return xy_cut(top, min_gap_x, min_gap_y) + xy_cut(bottom, min_gap_x, min_gap_y)
    return sorted(lines, key=lambda ln: (-ln.y, ln.x))


def extract_pdf(raw: bytes, joiner: str = "\n") -> Extraction:
    """PDF bytes → (text, spans, confidence, "pdf") via XY-cut reading order.

    Spans are per-line char offsets into the output text, kind="line"
    (≙ the reference's per-invoice line_items list<struct>,
    invoiceParser.js:69-86)."""
    lines = xy_cut(parse_text_lines(raw))
    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for ln in lines:
        if parts:
            pos += len(joiner)
        start = pos
        parts.append(ln.text)
        pos += len(ln.text)
        spans.append((start, pos, "line"))
    text = joiner.join(parts)
    # confidence signals: any text, >1 line, text >= 100 chars, parse clean
    signals = [bool(text), len(lines) > 1, len(text) >= 100, True]
    return Extraction(text, spans, round(100 * sum(signals) / 4), "pdf")


def extract_pdf_full(raw: bytes) -> Extraction:  # pragma: no cover - env gate
    """Full-fidelity PDF extraction via pdfminer — STUB in this container.

    Kept as the documented integration point: real deployments install
    pdfminer.six and route non-minimal-dialect PDFs here."""
    try:
        from pdfminer.high_level import extract_text  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            "pdfminer.six not available in this environment; only the "
            "minimal BT/Td/Tj dialect is supported (see extract_pdf)"
        ) from e
    text = extract_text(raw)
    return Extraction(text, [(0, len(text), "page")], 100, "pdf")
