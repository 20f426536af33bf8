"""Corpus-level statistics operators for training-data pipelines.

Two ops that each need GLOBAL corpus state resolved before a per-doc pass —
both use the engine's standard shuffle-free shape (per-block pyarrow
partials → small driver merge → ``ray.put`` broadcast → vectorized probe),
the same pattern as ``stages/dedup.py`` (flagship winner map):

- :func:`chunk_dedup_stats` — paragraph-granularity exact dedup (CCNet/C4
  style) adapted to newline-less corpora: documents are split into
  fixed-size word chunks; a chunk appearing in an earlier document (smaller
  doc_id) counts as duplicated.  The cross-doc state is a first-owner map
  over chunk fingerprints, built with ``compute_winner_map`` (dup-keys-only
  broadcast).
- :func:`tfidf_topk` — per-document top-k TF-IDF terms.  The corpus state
  is the document-frequency table, pre-aggregated per block (per-doc
  DISTINCT terms → block ``group_by`` count) so the driver merge is
  O(vocab), then broadcast once.  At a 100 TB vocabulary the broadcast
  bound is the documented limit — the alternative is a term-keyed shuffle
  join (hash-partition both sides on term), traded off in the docstring
  below.

Graft provenance: the reference keeps no corpus-level state (every upload
is parsed independently, reference server.js:285-344); these are the
prompt-mandated web-scale extensions (SURVEY §2 graft block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import stable_hash64
from .dedup import compute_winner_map

_TOKEN_PATTERN = r"[^a-z0-9]+"


def _tokenize_column(col) -> pa.ChunkedArray:
    """lowercase → split on non-alphanumeric runs → list<string> per doc
    (empties kept; callers filter) — pure pyarrow.compute."""
    return pc.split_pattern_regex(pc.utf8_lower(col), pattern=_TOKEN_PATTERN)


def _chunk_rows(batch: pa.Table, *, id_col: str, text_col: str, chunk_words: int):
    """One batch of docs → (doc_id per chunk, chunk fingerprint, n_chunks per
    doc).  Token split is vectorized; chunk assembly is a per-doc loop over
    the already-split lists (string joins, no parsing)."""
    ids = batch.column(id_col).to_pylist()
    toks = _tokenize_column(batch.column(text_col)).to_pylist()
    ch_doc: list[int] = []
    ch_fp: list[str] = []
    n_chunks: list[int] = []
    for i, words in zip(ids, toks):
        words = [w for w in (words or []) if w]
        k = 0
        for s in range(0, len(words), chunk_words):
            chunk = " ".join(words[s : s + chunk_words])
            ch_doc.append(int(i))
            ch_fp.append(f"{stable_hash64(chunk, salt='chunk'):016x}")
            k += 1
        n_chunks.append(k)
    return ids, ch_doc, ch_fp, n_chunks


def chunk_dedup_stats(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
):
    """Dataset(docs) → Dataset(doc_id, n_chunks, n_dup_chunks): how much of
    each document is made of word-chunks already seen in an earlier doc.

    Chunk identity is a 64-bit content fingerprint (the chunk TEXT never
    leaves its task — the partials/broadcast carry 16-byte hex keys), so the
    winner-map pass and the probe pass are both narrow.  Docs with empty
    token lists report (0, 0)."""

    def chunk_table(batch: pa.Table) -> pa.Table:
        _, ch_doc, ch_fp, _ = _chunk_rows(
            batch, id_col=id_col, text_col=text_col, chunk_words=chunk_words
        )
        return pa.Table.from_arrays(
            [pa.array(ch_doc, pa.int64()), pa.array(ch_fp, pa.string())],
            names=["doc_id_", "ch"],
        )

    owners = compute_winner_map(
        ds.map_batches(chunk_table, batch_format="pyarrow"),
        key_col="ch",
        pri_col="doc_id_",
    )
    ok = sorted(owners)
    oref = ray.put(
        {
            "keys": pa.array(ok, pa.string()),
            "first": pa.array([owners[k] for k in ok], pa.int64()),
        }
    )

    def probe(batch: pa.Table) -> pa.Table:
        o = ray.get(oref)
        ids, ch_doc, ch_fp, n_chunks = _chunk_rows(
            batch, id_col=id_col, text_col=text_col, chunk_words=chunk_words
        )
        if len(o["keys"]) and ch_fp:
            idx = pc.index_in(pa.array(ch_fp, pa.string()), value_set=o["keys"])
            first = pc.take(o["first"], idx)
            dup = pc.fill_null(
                pc.less(first, pa.array(ch_doc, pa.int64())), False
            ).to_numpy(zero_copy_only=False)
        else:
            dup = np.zeros(len(ch_fp), dtype=bool)
        # per-doc reduction within the batch (a doc's chunks never split
        # across batches — they were emitted from its own row)
        per_doc: dict[int, int] = {}
        for d, f in zip(ch_doc, dup):
            if f:
                per_doc[d] = per_doc.get(d, 0) + 1
        return pa.Table.from_arrays(
            [
                pa.array([int(i) for i in ids], pa.int64()),
                pa.array(n_chunks, pa.int64()),
                pa.array([per_doc.get(int(i), 0) for i in ids], pa.int64()),
            ],
            names=["doc_id", "n_chunks", "n_dup_chunks"],
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def tfidf_topk(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
):
    """Dataset(docs) → Dataset(doc_id, term, score_u, rk): the top-``k``
    TF-IDF terms per document.

    ``score_u = floor(tf * (ln((N+1)/(df+1)) + 1) * 1e6)`` as int64 — the
    micro-scaled floor makes the score integer-exact on both the Arrow and
    the DuckDB side (same discipline as the money oracles, CLAUDE.md).
    Ties: score DESC, then term ASC.  ``rk`` is 1-based.

    Pass 1 computes per-block partial document frequencies (per-doc DISTINCT
    terms → block-local ``group_by`` count → O(block vocab) rows), merged on
    the driver and broadcast once.  Pass 2 scores each doc against the
    broadcast DF map.  Driver/broadcast memory is O(vocab) — beyond that,
    hash-partition docs AND the DF table on term and join (one shuffle)."""

    def df_partial(batch: pa.Table) -> pa.Table:
        toks = _tokenize_column(batch.column(text_col)).to_pylist()
        seen: dict[str, int] = {}
        ndocs = 0
        for words in toks:
            ndocs += 1
            for w in set(words or []):
                if w:
                    seen[w] = seen.get(w, 0) + 1
        # sentinel row term="" carries the block's doc count (an empty string
        # can never be a real token — the tokenizer drops empties)
        terms = sorted(seen) + [""]
        return pa.Table.from_arrays(
            [
                pa.array(terms, pa.string()),
                pa.array([seen[t] for t in terms[:-1]] + [0], pa.int64()),
                pa.array([0] * (len(terms) - 1) + [ndocs], pa.int64()),
            ],
            names=["term", "df", "nd"],
        )

    parts = [
        b
        for b in ds.map_batches(df_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    if not parts:
        return rd.from_arrow(
            pa.schema(
                [("doc_id", pa.int64()), ("term", pa.string()),
                 ("score_u", pa.int64()), ("rk", pa.int64())]
            ).empty_table()
        )
    merged = (
        pa.concat_tables(parts).group_by("term").aggregate([("df", "sum"), ("nd", "sum")])
    )
    n_docs = int(pc.sum(merged.column("nd_sum")).as_py())
    merged = merged.filter(pc.not_equal(merged.column("term"), ""))  # drop sentinel
    dref = ray.put(
        {
            "terms": merged.column("term").combine_chunks(),
            "df": merged.column("df_sum").combine_chunks(),
            "n_docs": n_docs,
        }
    )

    def score(batch: pa.Table) -> pa.Table:
        d = ray.get(dref)
        terms_arr, df_arr, n = d["terms"], d["df"], d["n_docs"]
        ids = batch.column(id_col).to_pylist()
        toks = _tokenize_column(batch.column(text_col)).to_pylist()
        out_id: list[int] = []
        out_term: list[str] = []
        out_score: list[int] = []
        out_rk: list[int] = []
        for i, words in zip(ids, toks):
            tf: dict[str, int] = {}
            for w in words or []:
                if w:
                    tf[w] = tf.get(w, 0) + 1
            if not tf:
                continue
            tl = sorted(tf)  # term ASC — the tiebreak order
            idx = pc.index_in(pa.array(tl, pa.string()), value_set=terms_arr)
            dfs = pc.take(df_arr, idx).to_numpy(zero_copy_only=False)
            tfs = np.array([tf[t] for t in tl], dtype=np.float64)
            idf = np.log((n + 1) / (dfs.astype(np.float64) + 1)) + 1.0
            su = np.floor(tfs * idf * 1e6).astype(np.int64)
            top = np.argsort(-su, kind="stable")[:k]  # stable keeps term ASC on ties
            for r, j in enumerate(top, start=1):
                out_id.append(int(i))
                out_term.append(tl[j])
                out_score.append(int(su[j]))
                out_rk.append(r)
        return pa.Table.from_arrays(
            [
                pa.array(out_id, pa.int64()),
                pa.array(out_term, pa.string()),
                pa.array(out_score, pa.int64()),
                pa.array(out_rk, pa.int64()),
            ],
            names=["doc_id", "term", "score_u", "rk"],
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _window_rows(batch: pa.Table, *, id_col: str, text_col: str, window_words: int):
    """One batch of docs → per-window (doc_id, fingerprint) for EVERY
    hop-1 rolling window, plus n_windows per doc.  A doc shorter than the
    window emits nothing."""
    ids = batch.column(id_col).to_pylist()
    toks = _tokenize_column(batch.column(text_col)).to_pylist()
    w_doc: list[int] = []
    w_fp: list[str] = []
    n_windows: list[int] = []
    for i, words in zip(ids, toks):
        words = [w for w in (words or []) if w]
        n = max(0, len(words) - window_words + 1)
        for s in range(n):
            win = " ".join(words[s : s + window_words])
            w_doc.append(int(i))
            w_fp.append(f"{stable_hash64(win, salt='window'):016x}")
        n_windows.append(n)
    return ids, w_doc, w_fp, n_windows


def window_dedup_stats(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_words: int = 8,
):
    """Dataset(docs) → Dataset(doc_id, n_windows, n_dup_windows): exact
    SUBSTRING-level duplication — every hop-1 rolling ``window_words``-word
    window that already appears in an earlier document (smaller doc_id)
    counts as duplicated, AT ANY ALIGNMENT.

    This is the rolling-window complement of :func:`chunk_dedup_stats`
    (fixed non-overlapping chunks): a span copied between documents at a
    different word offset shifts across chunk boundaries and evades the
    chunk pass, but its interior windows are identical and are caught here
    — the published exact-substring-dedup observation (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better") expressed
    in this engine's shuffle-free winner-map shape.

    Cost note: hop-1 windows mean O(total tokens) fingerprints through the
    winner map (vs O(tokens/chunk_words) for chunks) — the driver/broadcast
    bound is O(distinct windows).  At 100 TB run the winner resolution as a
    hash-partitioned groupby on the fingerprint instead (the
    `stages/dedup.py` shuffle strategy) and keep the probe identical; the
    per-block emit/probe kernels are unchanged under either resolution.
    """

    def window_table(batch: pa.Table) -> pa.Table:
        _, w_doc, w_fp, _ = _window_rows(
            batch, id_col=id_col, text_col=text_col, window_words=window_words
        )
        return pa.Table.from_arrays(
            [pa.array(w_doc, pa.int64()), pa.array(w_fp, pa.string())],
            names=["doc_id_", "win"],
        )

    owners = compute_winner_map(
        ds.map_batches(window_table, batch_format="pyarrow"),
        key_col="win",
        pri_col="doc_id_",
    )
    ok = sorted(owners)
    oref = ray.put(
        {
            "keys": pa.array(ok, pa.string()),
            "first": pa.array([owners[k] for k in ok], pa.int64()),
        }
    )

    def probe(batch: pa.Table) -> pa.Table:
        o = ray.get(oref)
        ids, w_doc, w_fp, n_windows = _window_rows(
            batch, id_col=id_col, text_col=text_col, window_words=window_words
        )
        per_doc: dict[int, int] = {}
        if len(o["keys"]) and w_fp:
            idx = pc.index_in(pa.array(w_fp, pa.string()), value_set=o["keys"])
            first = pc.take(o["first"], idx)
            dup = pc.fill_null(
                pc.less(first, pa.array(w_doc, pa.int64())), False
            ).to_numpy(zero_copy_only=False)
            for d, f in zip(w_doc, dup):
                if f:
                    per_doc[d] = per_doc.get(d, 0) + 1
        return pa.Table.from_arrays(
            [
                pa.array([int(i) for i in ids], pa.int64()),
                pa.array(n_windows, pa.int64()),
                pa.array([per_doc.get(int(i), 0) for i in ids], pa.int64()),
            ],
            names=["doc_id", "n_windows", "n_dup_windows"],
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def ngram_contamination(
    train_ds,
    bench_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_words: int = 8,
):
    """Dataset(train docs) × Dataset(benchmark docs) →
    Dataset(doc_id, n_contam_windows, contaminated): n-gram-overlap
    benchmark DECONTAMINATION — a training doc is contaminated if any of
    its hop-1 rolling ``window_words``-word windows appears anywhere in the
    benchmark set (the published n-gram-collision hygiene check, e.g. the
    13-gram rule of GPT-3/PaLM appendix dedup; window size is a parameter).

    Complements the substring-needle pass (`docs_decontaminate`): needles
    catch verbatim whole-prompt inclusion; n-gram windows catch PARTIAL
    overlap at any alignment.  The benchmark side is small by definition —
    its distinct window fingerprints are collected once (O(bench tokens)
    driver bound) and broadcast; the training side streams, zero shuffle.
    """

    def bench_windows(batch: pa.Table) -> pa.Table:
        _, _, w_fp, _ = _window_rows(
            batch, id_col=id_col, text_col=text_col, window_words=window_words
        )
        return pa.Table.from_arrays(
            [pa.array(sorted(set(w_fp)), pa.string())], names=["win"]
        )

    fps: set[str] = set()
    for b in bench_ds.map_batches(bench_windows, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        fps.update(b["win"].to_pylist())
    bref = ray.put(pa.array(sorted(fps), pa.string()))

    def probe(batch: pa.Table) -> pa.Table:
        bench = ray.get(bref)
        ids, w_doc, w_fp, _ = _window_rows(
            batch, id_col=id_col, text_col=text_col, window_words=window_words
        )
        per_doc: dict[int, int] = {}
        if len(bench) and w_fp:
            hit = pc.fill_null(
                pc.is_in(pa.array(w_fp, pa.string()), value_set=bench), False
            ).to_numpy(zero_copy_only=False)
            for d, h in zip(w_doc, hit):
                if h:
                    per_doc[d] = per_doc.get(d, 0) + 1
        n = [per_doc.get(int(i), 0) for i in ids]
        return pa.Table.from_arrays(
            [
                pa.array([int(i) for i in ids], pa.int64()),
                pa.array(n, pa.int64()),
                pa.array([c > 0 for c in n], pa.bool_()),
            ],
            names=["doc_id", "n_contam_windows", "contaminated"],
        )

    return train_ds.map_batches(probe, batch_format="pyarrow")
