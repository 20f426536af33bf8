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


#: fixed stopword set for the Gopher-style stop_u ratio (public heuristic:
#: Rae et al. 2021 use a small English function-word list; any fixed set
#: works as the "natural language" signal — this one is frozen for oracles)
STOPWORDS = ("the", "a", "an", "of", "to", "in", "and", "is", "on", "for")


def quality_flags_stage(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mwl_u: int = 2_000_000,
    max_mwl_u: int = 12_000_000,
    min_stop_u: int = 10_000,
    max_dupword_u: int = 900_000,
):
    """C4/Gopher-style document quality gates (Raffel et al. 2020, Rae et
    al. 2021 — implemented from the published rule descriptions), flag-don't-
    drop: every doc gets its metrics plus a ``kept`` verdict.

    All ratios are µ-scaled int64 (``floor(ratio * 1e6)``) so a DuckDB
    oracle reproduces them bit-for-bit (same discipline as the money
    oracles):

    * ``n_words``    — whitespace tokens of trimmed text
    * ``mwl_u``      — mean word length: non-whitespace chars / n_words
    * ``stop_u``     — stopword fraction over :data:`STOPWORDS` (lowercased)
    * ``dupword_u``  — repeated-word fraction: 1 − distinct/total
    * ``kept``       — all gates pass (docs with 0 words always fail)

    Single vectorized ``map_batches`` pass; the only per-doc loop runs over
    the already-split token lists (set/count, no parsing)."""
    import numpy as np
    import pyarrow.compute as pc

    stop = frozenset(STOPWORDS)

    def f(batch: pa.Table) -> pa.Table:
        t = pc.fill_null(
            pc.cast(batch.column(text_col), pa.large_string()), ""
        )  # null text ≡ empty (poison-row discipline)
        nw = token_count(t).to_numpy(zero_copy_only=False)
        wc = pc.utf8_length(
            pc.replace_substring_regex(t, r"\s", "")
        ).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.utf8_trim_whitespace(t)), pattern=r"\s+"
        ).to_pylist()
        n_stop = np.zeros(len(nw), dtype=np.int64)
        n_distinct = np.zeros(len(nw), dtype=np.int64)
        for i, words in enumerate(toks):
            words = [w for w in (words or []) if w]
            n_stop[i] = sum(1 for w in words if w in stop)
            n_distinct[i] = len(set(words))
        nz = np.maximum(nw, 1)  # guard; 0-word rows are masked below
        mwl_u = np.floor(wc * 1e6 / nz).astype(np.int64)
        stop_u = np.floor(n_stop * 1e6 / nz).astype(np.int64)
        dupword_u = np.floor((nw - n_distinct) * 1e6 / nz).astype(np.int64)
        empty = nw == 0
        for arr in (mwl_u, stop_u, dupword_u):
            arr[empty] = 0
        kept = (
            (nw >= min_words) & (nw <= max_words)
            & (mwl_u >= min_mwl_u) & (mwl_u <= max_mwl_u)
            & (stop_u >= min_stop_u) & (dupword_u <= max_dupword_u)
            & ~empty
        )
        out = pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(nw, pa.int64()),
                pa.array(mwl_u, pa.int64()),
                pa.array(stop_u, pa.int64()),
                pa.array(dupword_u, pa.int64()),
                pa.array(kept, pa.bool_()),
            ],
            names=[id_col, "n_words", "mwl_u", "stop_u", "dupword_u", "kept"],
        )
        # pass through any extra input columns (not the text payload) so the
        # stage composes into wider pipelines; callers reading only
        # (doc_id, text) — e.g. the quality_flags_c4 oracle — see the exact
        # historical schema
        for name in batch.column_names:
            if name != id_col and name != text_col and name not in out.column_names:
                out = out.append_column(name, batch.column(name))
        return out

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
