"""Text-analysis stages over a documents-shaped Dataset.

Each is a single stateless ``map_batches`` projection — no shuffle.  The
language-ID stage is offered in actor-pool form too (``LangIdStage``), the
canonical home for a real fastText-style model load at deployment time.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.hashing import fingerprint64
from ..functions.textstats import lang_id, quality_columns, token_count


def quality_stage(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_chars, n_words, n_punct, n_upper) — fully vectorized."""

    def f(batch: pa.Table) -> pa.Table:
        cols = quality_columns(batch.column(text_col))
        arrays = [batch.column(id_col)] + list(cols.values())
        return pa.Table.from_arrays(arrays, names=[id_col, *cols.keys()])

    return ds.map_batches(f, batch_format="pyarrow")


def token_count_stage(ds, text_col: str = "text", id_col: str = "doc_id"):
    def f(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch.column(id_col), token_count(batch.column(text_col))],
            names=[id_col, "n_tokens"],
        )

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprint_stage(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, fp_md5, fp64) — md5 hex (oracle-comparable via DuckDB md5()) plus
    the engine's 64-bit content fingerprint."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
        fps = [f"{fingerprint64(t or ''):016x}" for t in texts]
        return pa.Table.from_arrays(
            [batch.column(id_col), pa.array(md5s, pa.string()), pa.array(fps, pa.string())],
            names=[id_col, "fp_md5", "fp64"],
        )

    return ds.map_batches(f, batch_format="pyarrow")


class LangIdStage:
    """Actor-pool language ID (state = compiled regex/stopword tables; swap
    in a real model load here at deployment)."""

    def __init__(self):
        from ..functions import textstats  # force import-time compilation

        self._lang_id = textstats.lang_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _lang_batch(batch, self._lang_id)


def _lang_batch(batch: pa.Table, fn, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    langs, scores = [], []
    for t in texts:
        lg, sc = fn(t or "")
        langs.append(lg)
        scores.append(sc)
    return pa.Table.from_arrays(
        [batch.column(id_col), pa.array(langs, pa.string()), pa.array(scores, pa.float64())],
        names=[id_col, "lang_pred", "lang_score"],
    )


def lang_id_stage(ds, *, concurrency: int | tuple[int, int] | None = None):
    if concurrency is None:
        return ds.map_batches(lambda b: _lang_batch(b, lang_id), batch_format="pyarrow")
    return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=concurrency)
