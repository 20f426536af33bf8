"""Deterministic synthetic Common-Crawl-style page table (FIXTURES.md §1).

Builds the authoritative input shape ``(url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string)`` from the driver's ``documents``
table, entirely content-derived (blake2b on doc_id/url — no wall-clock, no
process-salted hash, no RNG state shared across rows), so the same sf_dir
always yields byte-identical pages on any machine.

Row mix (by stable hash bucket of doc_id, per FIXTURES.md §1):
  * ~5%  PDF payloads (``%PDF-`` magic) — routes to the XY-cut path
  * ~2%  malformed (invalid UTF-8 under a declared utf-8 charset) — exercises
         row-level error isolation (≙ reference server.js:334-339)
  * ~2%  mutated (embedded main content ≠ ``text`` column) — exercises the
         mismatch verdict + similarity scorer
  * ~3%  of urls additionally emit a DUPLICATE row (same url, later warc_ts,
         different html) — exercises flag-don't-drop dedup with first-wins
         (≙ reconciliationEngine.js:43-51)
  * ~0.5% giant pages (content repeated 20×) — skew fixture
  * one hot domain carries ~50% of rows — salted-shuffle fixture

GROUND-TRUTH CONTRACT: ``text`` is exactly what a correct extractor emits —
title + paragraphs joined with "\n" (``ExtractConfig.block_joiner``), each
block whitespace-normalized.  The HTML wraps that content in boilerplate
(nav/aside/footer link farms, ad stubs, high-link-density related blocks)
that the density heuristics must reject; the PDF lays it out in lines (and
sometimes two columns) that XY-cut must re-order correctly.  Tests assert
byte-identity analytically rather than from a recorded golden file.
"""

from __future__ import annotations

import html as _htmlmod
from typing import Any

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_HOT_DOMAIN = "news.hotsite.example"
_COLD_DOMAINS = [f"site{i:02d}.example" for i in range(20)]
_NAV_WORDS = ["Home", "About", "Contact", "Archive", "Topics", "Subscribe", "Login", "Search"]
_EPOCH_2025_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in epoch-us
_YEAR_US = 360 * 24 * 3600 * 1_000_000

# row-kind buckets out of 1000 (disjoint)
_KIND_PDF = 50  # [0, 50)   → pdf
_KIND_ERR = 70  # [50, 70)  → malformed
_KIND_MUT = 90  # [70, 90)  → mutated
_GIANT = 5  # separate hash: [0,5)/1000 giant
_DUP = 30  # separate hash: [0,30)/1000 duplicated url


def row_kind(doc_id: int) -> str:
    h = stable_hash64(str(doc_id), salt="kind") % 1000
    if h < _KIND_PDF:
        return "pdf"
    if h < _KIND_ERR:
        return "error"
    if h < _KIND_MUT:
        return "mutated"
    return "html"


def is_giant(doc_id: int) -> bool:
    return stable_hash64(str(doc_id), salt="giant") % 1000 < _GIANT


def has_duplicate(doc_id: int) -> bool:
    return stable_hash64(str(doc_id), salt="dup") % 1000 < _DUP


def url_for(doc_id: int) -> str:
    hot = stable_hash64(str(doc_id), salt="domain") % 2 == 0
    domain = _HOT_DOMAIN if hot else _COLD_DOMAINS[stable_hash64(str(doc_id), salt="cold") % len(_COLD_DOMAINS)]
    return f"https://{domain}/page-{doc_id}"


def warc_ts_us(doc_id: int) -> int:
    return _EPOCH_2025_US + stable_hash64(str(doc_id), salt="ts") % _YEAR_US


def _content_blocks(doc_id: int, source_text: str) -> list[str]:
    """Title + paragraphs, each a single-spaced stripped string (so the
    extractor's whitespace normalization is the identity on them)."""
    words = source_text.split()
    if not words:
        words = ["empty", "document", "placeholder", "content", "row"]
    h = stable_hash64(str(doc_id), salt="layout")
    n_title = 3 + h % 5
    title = " ".join(words[:n_title])
    rest = words[n_title:]
    if is_giant(doc_id):
        rest = rest * 20
    paras: list[str] = []
    i = 0
    pi = 0
    while i < len(rest):
        size = 20 + stable_hash64(f"{doc_id}:{pi}", salt="psize") % 40
        chunk = rest[i : i + size]
        if len(chunk) < 8 and paras:  # avoid a trailing sub-threshold block
            paras[-1] = paras[-1] + " " + " ".join(chunk)
        else:
            paras.append(" ".join(chunk))
        i += size
        pi += 1
    if paras and len(paras[0].split()) < 8:
        # a lone sub-threshold paragraph would be rejected by rule 3; pad it
        # deterministically so the analytic golden stays exact
        paras[0] += " additional deterministic filler words appended for threshold"
    # exercise the neighbour-promotion rule: insert a 4-word aside between
    # two long paragraphs when the layout hash says so
    if len(paras) >= 3 and h % 3 == 0:
        short = " ".join(rest[:4]) if len(rest) >= 4 else "short note inline here"
        paras.insert(2, short)
    return [title] + paras


def ground_truth(blocks: list[str]) -> str:
    return "\n".join(blocks)


def _nav_html(doc_id: int) -> str:
    links = "".join(f'<li><a href="/{w.lower()}">{w}</a></li>' for w in _NAV_WORDS)
    return f'<nav><ul>{links}</ul></nav>'


def _aside_html(doc_id: int) -> str:
    n = 4 + stable_hash64(str(doc_id), salt="aside") % 5
    links = " ".join(
        f'<a href="/rel-{k}">related story number {k} headline</a>' for k in range(n)
    )
    return f"<aside><h3>Related links</h3><div>{links}</div></aside>"


def _related_div(doc_id: int) -> str:
    # high link density block OUTSIDE a boiler container → rejected by rule 2
    n = 3 + stable_hash64(str(doc_id), salt="rel") % 4
    links = " ".join(f'<a href="/more-{k}">more coverage item {k}</a>' for k in range(n))
    return f'<div class="related">{links}</div>'


def build_html(
    doc_id: int,
    blocks: list[str],
    lang: str,
    *,
    allow_latin: bool = True,
    force_latin: bool = False,
) -> bytes:
    """Boilerplate-wrapped page; main content = ``blocks`` verbatim.
    ``force_latin`` pins the iso-8859-1 charset deterministically (the
    charset-path oracle needs a hash-free choice)."""
    title, paras = blocks[0], blocks[1:]
    esc = _htmlmod.escape
    body_paras = []
    for k, p in enumerate(paras):
        ep = esc(p)
        # sprinkle inline markup the extractor must strip losslessly
        if k % 3 == 1:
            w = ep.split(" ")
            if len(w) > 4:
                w[2] = f"<em>{w[2]}</em>"
                w[4] = f"<strong>{w[4]}</strong>"
                ep = " ".join(w)
        body_paras.append(f"<p>{ep}</p>")
    charset = "utf-8"
    use_latin = allow_latin and stable_hash64(str(doc_id), salt="charset") % 1000 < 30
    doc = (
        "<!DOCTYPE html><html><head>"
        f'<meta charset="{charset}"><title>{esc(title)}</title>'
        "<script>var x = '<p>not content</p>';</script>"
        "<style>.a{color:red}</style>"
        "</head><body>"
        f'<header><div class="brand">Example Site</div>{_nav_html(doc_id)}</header>'
        f"<article><h1>{esc(title)}</h1>{''.join(body_paras)}</article>"
        f"{_aside_html(doc_id)}"
        "<div>Advertisement</div>"
        f"{_related_div(doc_id)}"
        '<footer><a href="/tos">Terms of Service</a> <a href="/privacy">Privacy policy page</a>'
        " © Example Site all rights reserved forever</footer>"
        "</body></html>"
    )
    raw = doc.encode("utf-8")
    if use_latin or force_latin:
        try:
            raw = doc.replace('charset="utf-8"', 'charset="iso-8859-1"').encode("iso-8859-1")
        except UnicodeEncodeError:
            pass  # deterministic: content decides
    return raw


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(doc_id: int, blocks: list[str]) -> tuple[bytes, str]:
    """Minimal-dialect PDF + its XY-cut-reading-order ground truth.

    Lines of ~10 words; ~40% of PDFs are two-column (x=72 and x=340,
    gap > the XY-cut threshold) — ground truth is left column then right.
    """
    words = " ".join(blocks).split()
    lines: list[str] = []
    i = 0
    li = 0
    while i < len(words):
        n = 8 + stable_hash64(f"{doc_id}:{li}", salt="pline") % 5
        lines.append(" ".join(words[i : i + n]))
        i += n
        li += 1
    two_col = stable_hash64(str(doc_id), salt="cols") % 10 < 4 and len(lines) >= 4
    ops = []
    if two_col:
        half = (len(lines) + 1) // 2
        cols = [(72, lines[:half]), (340, lines[half:])]
        truth_lines = lines[:half] + lines[half:]
    else:
        cols = [(72, lines)]
        truth_lines = lines
    # interleave emission order (right col first when two_col) so reading
    # order genuinely comes from XY-cut, not from stream order
    emit = list(reversed(cols)) if two_col else cols
    for x, col_lines in emit:
        y = 720
        for ln in col_lines:
            ops.append(f"BT /F1 12 Tf {x} {y} Td ({_pdf_escape(ln)}) Tj ET")
            y -= 15
    payload = (
        "%PDF-1.4\n1 0 obj << /Type /Page >>\nstream\n"
        + "\n".join(ops)
        + "\nendstream\n%%EOF\n"
    )
    return payload.encode("utf-8"), "\n".join(truth_lines)


def _mutate(blocks: list[str], doc_id: int) -> list[str]:
    """Deterministic content mutation (for `mutated` rows and duplicate rows)."""
    out = list(blocks)
    out[0] = "REVISED " + out[0]
    if len(out) > 1:
        out[1] = out[1] + " trailing edit token"
    return out


def build_page_rows(doc_id: int, source_text: str, lang: str) -> list[dict[str, Any]]:
    """All pages rows for one source document (1 row, or 2 when duplicated)."""
    kind = row_kind(doc_id)
    blocks = _content_blocks(doc_id, source_text)
    url = url_for(doc_id)
    ts = warc_ts_us(doc_id)

    if kind == "pdf":
        html_bytes, truth = build_pdf(doc_id, blocks)
        text = truth
    elif kind == "error":
        # force utf-8 so the appended invalid bytes are guaranteed to raise
        good = build_html(doc_id, blocks, lang, allow_latin=False)
        html_bytes = good[: max(200, len(good) // 2)] + b"\xff\xfe\xff"
        text = ground_truth(blocks)
    elif kind == "mutated":
        html_bytes = build_html(doc_id, _mutate(blocks, doc_id), lang)
        text = ground_truth(blocks)  # reference text ≠ embedded content
    else:
        html_bytes = build_html(doc_id, blocks, lang)
        text = ground_truth(blocks)

    rows = [{"url": url, "warc_ts": ts, "html": html_bytes, "text": text, "lang": lang}]
    if has_duplicate(doc_id):
        dup_html = build_html(doc_id, _mutate(blocks, doc_id), lang)
        rows.append(
            {
                "url": url,
                "warc_ts": ts + 3_600_000_000,  # later → loses first-wins
                "html": dup_html,
                "text": text,
                "lang": lang,
            }
        )
    return rows


def embedded_text(doc_id: int, source_text: str) -> str | None:
    """What a correct extractor emits for the PRIMARY row of doc_id (None for
    malformed rows).  Test helper — the analytic golden."""
    kind = row_kind(doc_id)
    blocks = _content_blocks(doc_id, source_text)
    if kind == "pdf":
        return build_pdf(doc_id, blocks)[1]
    if kind == "error":
        return None
    if kind == "mutated":
        return ground_truth(_mutate(blocks, doc_id))
    return ground_truth(blocks)


# --- oracle-mode pages ------------------------------------------------------
#
# A second, deliberately SQL-mirrorable page layout used by the driver-visible
# flagship-extraction oracle (`flagship_extract_oracle` in pipelines/queries):
# the title/paragraph split is a FIXED pure function of the word list (no
# hash-gated mutations/giants/PDF/error rows), so DuckDB can reconstruct the
# expected extracted text byte-for-byte from documents.text with list slicing
# — while the HTML still carries the full boilerplate battery (nav, aside
# link farm, ad stub, high-link-density related div, footer, script/style,
# inline em/strong markup) that the real extractor must reject/strip.

ORACLE_MIN_WORDS = 16  # docs below this are skipped (SQL filter mirrors it)
ORACLE_TITLE_WORDS = 5
ORACLE_SPLIT_AT = 35  # words[5:35] → para 1, rest → para 2 (when >= 43 words)
ORACLE_TWO_PARA_MIN = 43  # guarantees para 2 has >= 8 words (min_words rule)


def oracle_blocks(words: list[str]) -> list[str] | None:
    """Fixed title/paragraph split — the SQL-expressible ground truth.
    Returns None for documents too short to pass the extractor's
    min-words rules unconditionally."""
    if len(words) < ORACLE_MIN_WORDS:
        return None
    title = " ".join(words[:ORACLE_TITLE_WORDS])
    if len(words) >= ORACLE_TWO_PARA_MIN:
        return [
            title,
            " ".join(words[ORACLE_TITLE_WORDS:ORACLE_SPLIT_AT]),
            " ".join(words[ORACLE_SPLIT_AT:]),
        ]
    return [title, " ".join(words[ORACLE_TITLE_WORDS:])]


def oracle_pages_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang) → oracle-mode pages (keeps doc_id so the
    extraction output joins back to the documents table without a shuffle)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    out_id: list[int] = []
    out: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    for d, t, lg in zip(doc_ids, texts, langs):
        blocks = oracle_blocks((t or "").split())
        if blocks is None:
            continue
        out_id.append(int(d))
        out["url"].append(url_for(int(d)))
        out["warc_ts"].append(warc_ts_us(int(d)))
        out["html"].append(build_html(int(d), blocks, lg or "en"))
        out["text"].append(ground_truth(blocks))
        out["lang"].append(lg or "en")
    return pa.Table.from_arrays(
        [
            pa.array(out_id, pa.int64()),
            pa.array(out["url"], pa.string()),
            pa.array(out["warc_ts"], pa.timestamp("us")),
            pa.array(out["html"], pa.large_binary()),
            pa.array(out["text"], pa.string()),
            pa.array(out["lang"], pa.string()),
        ],
        names=["doc_id", "url", "warc_ts", "html", "text", "lang"],
    )


ORACLE_PDF_LINE_WORDS = 10
ORACLE_PDF_TWO_COL_MIN = 60  # >= 6 lines → two columns (XY-cut must reorder)


def oracle_pdf_pages_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang) → oracle-mode PDF pages: fixed 10-word
    lines through the REAL spec-valid Flate-compressed container
    (functions/pdf.py:write_pdf).  Long docs lay out in two columns with the
    RIGHT column emitted first in the content stream, so correct reading
    order genuinely comes from XY-cut, not stream order.  Ground truth
    (lines in order, joined with \\n) is SQL-reconstructible."""
    from ..functions.pdf import write_pdf

    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    out_id: list[int] = []
    out: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    for d, t, lg in zip(doc_ids, texts, langs):
        words = (t or "").split()
        if len(words) < ORACLE_MIN_WORDS:
            continue
        lines = [
            " ".join(words[i : i + ORACLE_PDF_LINE_WORDS])
            for i in range(0, len(words), ORACLE_PDF_LINE_WORDS)
        ]
        if len(words) >= ORACLE_PDF_TWO_COL_MIN:
            half = (len(lines) + 1) // 2
            cols = [(340.0, lines[half:]), (72.0, lines[:half])]  # right first
        else:
            cols = [(72.0, lines)]
        placed: list[tuple[float, float, str]] = []
        for x, col_lines in cols:
            y = 720.0
            for ln in col_lines:
                placed.append((x, y, ln))
                y -= 15.0
        out_id.append(int(d))
        out["url"].append(url_for(int(d)))
        out["warc_ts"].append(warc_ts_us(int(d)))
        out["html"].append(write_pdf(placed, compress=True))
        out["text"].append("\n".join(lines))
        out["lang"].append(lg or "en")
    return pa.Table.from_arrays(
        [
            pa.array(out_id, pa.int64()),
            pa.array(out["url"], pa.string()),
            pa.array(out["warc_ts"], pa.timestamp("us")),
            pa.array(out["html"], pa.large_binary()),
            pa.array(out["text"], pa.string()),
            pa.array(out["lang"], pa.string()),
        ],
        names=["doc_id", "url", "warc_ts", "html", "text", "lang"],
    )


ORACLE_LATIN1_TITLE = "Résumé café naïve exposé"  # latin-1-encodable title


def oracle_latin1_pages_batch(batch: pa.Table) -> pa.Table:
    """Charset-path oracle pages: every page declares iso-8859-1 and is
    latin-1 ENCODED, with a fixed accented title — so the sniff + strict
    decode path (functions/html.py:sniff_charset/decode_html) is proven
    byte-for-byte, not just exercised.  Body = all words as one paragraph
    (>= 16-word filter keeps it above the min-words rule)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    out_id: list[int] = []
    out: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    for d, t, lg in zip(doc_ids, texts, langs):
        words = (t or "").split()
        if len(words) < ORACLE_MIN_WORDS:
            continue
        blocks = [ORACLE_LATIN1_TITLE, " ".join(words)]
        out_id.append(int(d))
        out["url"].append(url_for(int(d)))
        out["warc_ts"].append(warc_ts_us(int(d)))
        out["html"].append(
            build_html(int(d), blocks, lg or "en", force_latin=True)
        )
        out["text"].append(ground_truth(blocks))
        out["lang"].append(lg or "en")
    return pa.Table.from_arrays(
        [
            pa.array(out_id, pa.int64()),
            pa.array(out["url"], pa.string()),
            pa.array(out["warc_ts"], pa.timestamp("us")),
            pa.array(out["html"], pa.large_binary()),
            pa.array(out["text"], pa.string()),
            pa.array(out["lang"], pa.string()),
        ],
        names=["doc_id", "url", "warc_ts", "html", "text", "lang"],
    )


ORACLE_GIANT_REPEAT = 8  # giant-page body = words repeated 8x, one paragraph


def oracle_giant_pages_batch(batch: pa.Table) -> pa.Table:
    """Giant-page oracle: EVERY qualifying doc becomes a multi-KB page whose
    single body paragraph is the word list repeated 8× — the skew-fixture
    shape (sources/pages.py giant rows), here with a SQL-reconstructible
    ground truth so big-row handling is byte-exact through decode, tokenize,
    classify and span building."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    out_id: list[int] = []
    out: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    for d, t, lg in zip(doc_ids, texts, langs):
        words = (t or "").split()
        if len(words) < ORACLE_MIN_WORDS:
            continue
        title = " ".join(words[:ORACLE_TITLE_WORDS])
        body = " ".join(words * ORACLE_GIANT_REPEAT)
        blocks = [title, body]
        out_id.append(int(d))
        out["url"].append(url_for(int(d)))
        out["warc_ts"].append(warc_ts_us(int(d)))
        out["html"].append(build_html(int(d), blocks, lg or "en"))
        out["text"].append(ground_truth(blocks))
        out["lang"].append(lg or "en")
    return pa.Table.from_arrays(
        [
            pa.array(out_id, pa.int64()),
            pa.array(out["url"], pa.string()),
            pa.array(out["warc_ts"], pa.timestamp("us")),
            pa.array(out["html"], pa.large_binary()),
            pa.array(out["text"], pa.string()),
            pa.array(out["lang"], pa.string()),
        ],
        names=["doc_id", "url", "warc_ts", "html", "text", "lang"],
    )


def oracle_poison_pages_batch(batch: pa.Table) -> pa.Table:
    """Error-isolation oracle: ``doc_id % 3 == 0`` rows are CORRUPTED
    (declared utf-8, invalid bytes appended — the strict decode must raise
    and the engine must convert that to a row-level error, never a task
    failure); the rest are clean oracle-layout HTML.  The corruption rule is
    SQL-expressible, so per-row error isolation itself is oracle-checked."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    out_id: list[int] = []
    out: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    for d, t, lg in zip(doc_ids, texts, langs):
        words = (t or "").split()
        blocks = oracle_blocks(words)
        if blocks is None:
            continue
        raw = build_html(int(d), blocks, lg or "en", allow_latin=False)
        if int(d) % 3 == 0:
            raw = raw[: max(200, len(raw) // 2)] + b"\xff\xfe\xff"
        out_id.append(int(d))
        out["url"].append(url_for(int(d)))
        out["warc_ts"].append(warc_ts_us(int(d)))
        out["html"].append(raw)
        out["text"].append(ground_truth(blocks))
        out["lang"].append(lg or "en")
    return pa.Table.from_arrays(
        [
            pa.array(out_id, pa.int64()),
            pa.array(out["url"], pa.string()),
            pa.array(out["warc_ts"], pa.timestamp("us")),
            pa.array(out["html"], pa.large_binary()),
            pa.array(out["text"], pa.string()),
            pa.array(out["lang"], pa.string()),
        ],
        names=["doc_id", "url", "warc_ts", "html", "text", "lang"],
    )


def oracle_mixed_pages_batch(batch: pa.Table) -> pa.Table:
    """Mixed-routing oracle pages: ``doc_id % 5 == 0`` rows get the PDF
    layout, the rest the HTML layout — a SQL-expressible predicate, so the
    per-row ``%PDF-`` magic-bytes routing (F1) is itself oracle-checked in
    ONE pipeline over heterogeneous payloads."""
    html_part = oracle_pages_batch(batch)
    pdf_part = oracle_pdf_pages_batch(batch)
    ids_h = html_part["doc_id"].to_numpy(zero_copy_only=False)
    ids_p = pdf_part["doc_id"].to_numpy(zero_copy_only=False)
    return pa.concat_tables(
        [
            html_part.filter(pa.array(ids_h % 5 != 0)),
            pdf_part.filter(pa.array(ids_p % 5 == 0)),
        ]
    )


def pages_batch_from_documents(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents(doc_id, text, lang, ...) → pages rows."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    cols: dict[str, list] = {k: [] for k in ("url", "warc_ts", "html", "text", "lang")}
    for d, t, lg in zip(doc_ids, texts, langs):
        for row in build_page_rows(int(d), t or "", lg or "en"):
            for k in cols:
                cols[k].append(row[k])
    return pa.Table.from_arrays(
        [
            pa.array(cols["url"], pa.string()),
            pa.array(cols["warc_ts"], pa.timestamp("us")),
            pa.array(cols["html"], pa.large_binary()),
            pa.array(cols["text"], pa.string()),
            pa.array(cols["lang"], pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def pages_from_documents(sf_dir: str, *, override_num_blocks: int | None = None):
    """documents.parquet → pages Dataset (lazy; generation itself streams
    through map_batches so it scales with the input)."""
    import ray.data as rd

    kwargs: dict[str, Any] = {"columns": ["doc_id", "text", "lang"]}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", **kwargs)
    return docs.map_batches(pages_batch_from_documents, batch_format="pyarrow")
