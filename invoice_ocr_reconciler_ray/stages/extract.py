"""Extraction stage — the flagship per-document transform.

Graft of the reference's upload→OCR→parse pipeline (server.js:285-344 +
invoiceParser.js:88-128) as ONE streaming ``map_batches`` pass over zero-copy
Arrow batches:

* routing by content sniff (``%PDF-`` magic on the ``html`` binary column)
  replaces the extension whitelist (server.js:91-96) — both paths are handled
  inside a single pass so the 100 TB input is scanned ONCE (a filter→two
  stages→union layout would read the html column twice);
* row-level error isolation: any per-row exception becomes an ``error``
  column value, never a task failure (≙ server.js:334-339 — task retries
  alone would re-fail deterministic poison rows);
* the ``html`` column is DROPPED at this stage so the (often multi-MB) raw
  bytes never travel further down the pipeline (SURVEY §7.4 wide-row note).

Stateless-vs-actor: regex state is module-level (compiled at import), so the
default is stateless Ray tasks — they autoscale with available CPUs, which
is also what makes the two-parallelism-level scaling evidence honest.  The
``PdfExtractorPool`` class is the actor-pool variant (≙ the reference's
Tesseract worker singleton, server.js:110-134) for deployments whose PDF
path has genuinely heavy per-worker init (pdfminer/model load); pass
``concurrency=`` to :func:`extract_pages` to use it.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..config import DEFAULT_EXTRACT, ExtractConfig
from ..functions.hashing import stable_hash64 as _hash64
from ..functions.html import extract_html
from ..functions.pdf import PDF_MAGIC, extract_pdf

SPAN_TYPE = pa.list_(
    pa.struct([("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())])
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("text", pa.string()),  # reference text (carried to the reconcile stage)
        ("extracted_text", pa.large_string()),
        ("spans", SPAN_TYPE),
        ("confidence", pa.int32()),
        ("content_type", pa.string()),
        ("content_hash", pa.string()),  # blake2b of raw html (dedup priority)
        ("error", pa.string()),
    ]
)


def content_hash_hex(raw: bytes | None) -> str:
    """Stable hex hash of the raw payload — the dedup priority component.
    Computed here (html in hand) AND in the cheap dedup side-plan; the two
    must agree byte-for-byte (stages/dedup.py)."""
    return f"{_hash64(raw if raw is not None else b'', salt='dedup'):016x}"


def _extract_core(raw: bytes | None, cfg: ExtractConfig = DEFAULT_EXTRACT):
    """One document → Extraction (pure; exceptions propagate)."""
    if raw is None:
        raise ValueError("null html payload")
    if bytes(raw[:5]) == PDF_MAGIC:
        return extract_pdf(bytes(raw), joiner=cfg.block_joiner)
    return extract_html(bytes(raw), cfg)


def extract_record(raw: bytes | None, cfg: ExtractConfig = DEFAULT_EXTRACT) -> dict[str, Any]:
    """One document → extraction record fields (pure; exceptions propagate)."""
    ext = _extract_core(raw, cfg)
    return {
        "extracted_text": ext.text,
        "spans": [{"start": s, "end": e, "kind": k} for s, e, k in ext.spans],
        "confidence": ext.confidence,
        "content_type": ext.content_type,
        "error": None,
    }


def _extract_batch(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    html_col = batch.column("html")
    n = len(html_col)
    texts: list[str] = []
    confs: list[int] = []
    ctypes: list[str] = []
    chashes: list[str] = []
    errors: list[str | None] = []
    # spans built COLUMNAR (flat starts/ends/kinds + offsets → ListArray of
    # StructArray) — per-span Python dicts would dominate batch cost
    sp_starts: list[int] = []
    sp_ends: list[int] = []
    sp_kinds: list[str] = []
    sp_offsets: list[int] = [0]
    # Python loop over rows WITHIN a zero-copy Arrow batch: the parse itself
    # is not vectorizable; regexes are compiled once at import.  Bulk-convert
    # the binary column once (cheaper than n as_py() calls).
    raws = html_col.to_pylist()
    for i in range(n):
        raw = raws[i]
        chashes.append(content_hash_hex(raw))
        try:
            ext = _extract_core(raw, cfg)
            texts.append(ext.text)
            for s, e, k in ext.spans:
                sp_starts.append(s)
                sp_ends.append(e)
                sp_kinds.append(k)
            confs.append(ext.confidence)
            ctypes.append(ext.content_type)
            errors.append(None)
        except Exception as e:  # row-level isolation ≙ server.js:334-339
            texts.append("")
            confs.append(0)
            ctypes.append("unknown")
            errors.append(f"{type(e).__name__}: {e}")
        sp_offsets.append(len(sp_starts))
    span_arr = pa.ListArray.from_arrays(
        pa.array(sp_offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(sp_starts, pa.int64()),
                pa.array(sp_ends, pa.int64()),
                pa.array(sp_kinds, pa.string()),
            ],
            names=["start", "end", "kind"],
        ),
    )
    out = pa.Table.from_arrays(
        [
            batch.column("url"),
            batch.column("warc_ts"),
            batch.column("lang"),
            batch.column("text"),
            pa.array(texts, pa.large_string()),
            span_arr,
            pa.array(confs, pa.int32()),
            pa.array(ctypes, pa.string()),
            pa.array(chashes, pa.string()),
            pa.array(errors, pa.string()),
        ],
        schema=EXTRACTED_SCHEMA,
    )
    # passthrough for any extra columns (lineage counters etc.); `html` is
    # always dropped here so raw bytes never travel past this stage
    for name in batch.column_names:
        if name != "html" and name not in EXTRACTED_SCHEMA.names:
            out = out.append_column(name, batch.column(name))
    return out


def make_extract_fn(cfg: ExtractConfig = DEFAULT_EXTRACT):
    """Stateless task form (closure carries only the tiny frozen config)."""

    def extract_batch(batch: pa.Table) -> pa.Table:
        return _extract_batch(batch, cfg)

    return extract_batch


class PdfExtractorPool:
    """Actor-pool form of the extraction stage (≙ the lazily-created
    Tesseract worker singleton, server.js:110-134; Ray restarts failed actors,
    subsuming the null-and-recreate retry at server.js:131-133).

    ``__init__`` is the once-per-actor heavy-setup hook; in this container it
    only pins the config (the real pdfminer/model load is env-gated, see
    functions/pdf.py), but the plumbing — construction once per actor, work
    per batch — is the real, tested contract."""

    def __init__(self, cfg: ExtractConfig = DEFAULT_EXTRACT):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _extract_batch(batch, self.cfg)


def extract_pages(
    ds,
    cfg: ExtractConfig = DEFAULT_EXTRACT,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
):
    """pages Dataset → extraction Dataset.

    ``batch_size=None`` (default) processes whole size-bounded blocks — the
    right unit for ``html`` payloads with 100×-variance sizes (row-count
    batching is wrong there, SURVEY §4.3.1).  ``concurrency=None`` → stateless
    tasks; an int/tuple → actor pool (``PdfExtractorPool``).
    """
    if concurrency is None:
        return ds.map_batches(
            make_extract_fn(cfg), batch_format="pyarrow", batch_size=batch_size
        )
    return ds.map_batches(
        PdfExtractorPool,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
