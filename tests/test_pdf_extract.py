"""Unit tests for the minimal-dialect PDF XY-cut extractor (functions/pdf.py)."""

import pytest

from invoice_ocr_reconciler_ray.functions.pdf import (
    TextLine,
    extract_pdf,
    extract_pdf_full,
    parse_text_lines,
    xy_cut,
)


def pdf(ops: list[str]) -> bytes:
    return (
        "%PDF-1.4\n1 0 obj << /Type /Page >>\nstream\n"
        + "\n".join(ops)
        + "\nendstream\n%%EOF\n"
    ).encode()


def bt(x: int, y: int, s: str) -> str:
    return f"BT /F1 12 Tf {x} {y} Td ({s}) Tj ET"


def test_single_column_top_down():
    raw = pdf([bt(72, 700, "second line"), bt(72, 720, "first line")])
    assert extract_pdf(raw).text == "first line\nsecond line"


def test_two_columns_left_then_right():
    raw = pdf(
        [
            bt(340, 720, "right one"),
            bt(340, 705, "right two"),
            bt(72, 720, "left one"),
            bt(72, 705, "left two"),
        ]
    )
    assert extract_pdf(raw).text == "left one\nleft two\nright one\nright two"


def test_column_cut_takes_priority():
    # documented semantics: vertical (column) cuts are tried first, so the
    # whole left column reads before the right column even across a y-gap
    raw = pdf(
        [
            bt(340, 720, "top right"),
            bt(72, 400, "bottom left"),
            bt(72, 720, "top left"),
        ]
    )
    lines = xy_cut(parse_text_lines(raw))
    assert [ln.text for ln in lines] == ["top left", "bottom left", "top right"]


def test_horizontal_band_cut_when_no_column_gap():
    # same x everywhere → no column cut; big y gap splits bands top→bottom
    raw = pdf(
        [
            bt(72, 400, "band two"),
            bt(72, 720, "band one"),
        ]
    )
    lines = xy_cut(parse_text_lines(raw))
    assert [ln.text for ln in lines] == ["band one", "band two"]


def test_escapes_unescaped():
    raw = pdf([bt(72, 720, r"paren \( and \) and slash \\ ok")])
    assert extract_pdf(raw).text == "paren ( and ) and slash \\ ok"


def test_spans_tile_text():
    raw = pdf([bt(72, 720, "alpha"), bt(72, 705, "beta")])
    ext = extract_pdf(raw)
    assert ext.spans == [(0, 5, "line"), (6, 10, "line")]
    assert all(k == "line" for *_, k in ext.spans)


def test_empty_pdf():
    ext = extract_pdf(b"%PDF-1.4\n%%EOF\n")
    assert ext.text == "" and ext.spans == []


def test_full_fidelity_path_is_gated():
    with pytest.raises(NotImplementedError):
        extract_pdf_full(b"%PDF-1.4")


def test_xy_cut_deterministic_tie():
    lines = [TextLine(72, 720, "a"), TextLine(72, 720, "a")]
    assert [ln.text for ln in xy_cut(lines)] == ["a", "a"]
