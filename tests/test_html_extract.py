"""Unit tests for the HTML extraction kernel (functions/html.py).

Covers the contracts from SURVEY §2.2: ordered rule table (M2), first-accepted
selection (M3), span list (M4), charset resolution (M6), confidence (M7), and
the deterministic no-wall-clock fallback (M8)."""

import pytest

from invoice_ocr_reconciler_ray.functions.html import (
    classify,
    decode_html,
    extract_html,
    sniff_charset,
    tokenize_blocks,
)

LONG = "word " * 20  # 20 words, passes min_words


def page(body: str, charset: str = "utf-8") -> bytes:
    return (
        f'<!DOCTYPE html><html><head><meta charset="{charset}"></head>'
        f"<body>{body}</body></html>"
    ).encode(charset)


def test_basic_paragraph_extracted():
    ext = extract_html(page(f"<p>{LONG.strip()}</p>"))
    assert ext.text == LONG.strip()
    assert ext.spans == [(0, len(LONG.strip()), "p")]
    assert ext.content_type == "html"


def test_boilerplate_containers_rejected():
    body = (
        f"<nav><ul><li>{LONG}</li></ul></nav>"
        f"<header><div>{LONG}</div></header>"
        f"<p>{LONG.strip()}</p>"
        f"<aside><p>{LONG}</p></aside>"
        f"<footer><p>{LONG}</p></footer>"
    )
    assert extract_html(page(body)).text == LONG.strip()


def test_link_density_rejection():
    links = " ".join(f'<a href="/{i}">link text number {i} here</a>' for i in range(5))
    body = f"<div>{links}</div><p>{LONG.strip()}</p>"
    assert extract_html(page(body)).text == LONG.strip()


def test_short_block_rejected_but_promoted_between_content():
    body = f"<p>{LONG.strip()}</p><p>short note</p><p>{LONG.strip()}</p>"
    ext = extract_html(page(body))
    assert ext.text == f"{LONG.strip()}\nshort note\n{LONG.strip()}"
    # but a short block at the edge is NOT promoted
    body2 = f"<p>short note</p><p>{LONG.strip()}</p>"
    assert extract_html(page(body2)).text == LONG.strip()


def test_heading_accepted_short_heading_kind():
    body = f"<h1>My Great Title</h1><p>{LONG.strip()}</p>"
    ext = extract_html(page(body))
    assert ext.text == f"My Great Title\n{LONG.strip()}"
    assert ext.spans[0] == (0, len("My Great Title"), "h1")


def test_script_style_skipped_entities_unescaped():
    body = (
        "<script>var html = '<p>fake fake fake fake fake fake fake fake</p>';</script>"
        "<style>p{color:red}</style>"
        f"<p>a &amp; b &lt;tag&gt; plus six more words to pass threshold</p>"
    )
    assert (
        extract_html(page(body)).text
        == "a & b <tag> plus six more words to pass threshold"
    )


def test_inline_tags_lossless():
    body = "<p>one two <em>three</em> <strong>four</strong> five six seven eight nine</p>"
    assert extract_html(page(body)).text == "one two three four five six seven eight nine"


def test_charset_sniff_and_latin1():
    s = "café au lait plus more words to pass the threshold rule"
    raw = page(f"<p>{s}</p>", charset="iso-8859-1")
    assert sniff_charset(raw) == "iso-8859-1"
    assert extract_html(raw).text == s


def test_invalid_bytes_raise_for_row_isolation():
    raw = page(f"<p>{LONG.strip()}</p>")[:100] + b"\xff\xfe\xff"
    with pytest.raises(UnicodeDecodeError):
        decode_html(raw)


def test_whitespace_normalized_per_block():
    body = "<p>  lots\n\tof   internal\r\n spacing between these eight little words  </p>"
    assert (
        extract_html(page(body)).text
        == "lots of internal spacing between these eight little words"
    )


def test_empty_page_yields_empty_text_never_wallclock():
    ext = extract_html(page("<div></div>"))
    assert ext.text == ""
    assert ext.spans == []
    assert ext.confidence == 0


def test_confidence_signals():
    body = f"<article><h1>Big Title Here</h1><p>{LONG.strip()}</p></article>"
    assert extract_html(page(body)).confidence == 100


def test_spans_bounds_and_kinds():
    body = f"<h2>Header Words Here</h2><p>{LONG.strip()}</p><p>{LONG.strip()}</p>"
    ext = extract_html(page(body))
    assert [s[2] for s in ext.spans] == ["h2", "p", "p"]
    for start, end, _ in ext.spans:
        assert 0 <= start <= end <= len(ext.text)
    # spans tile the text exactly (joiner between them)
    rebuilt = "\n".join(ext.text[s:e] for s, e, _ in ext.spans)
    assert rebuilt == ext.text


def test_classify_is_pure_and_ordered():
    blocks, _ = tokenize_blocks(
        f"<body><nav><li>{LONG}</li></nav><p>{LONG.strip()}</p></body>"
    )
    assert classify(blocks) == [False, True]


def test_truncated_tag_tolerated():
    raw = f"<p>{LONG.strip()}</p><div class=".encode()
    assert extract_html(raw).text == LONG.strip()
