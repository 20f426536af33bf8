"""Corpus curation — the composed training-data pipeline.

Chains the engine's text-analysis and dedup stages into the shape a
large-scale pretraining-data pipeline runs over a document corpus:

    read documents
      → ONE fused metrics pass   (quality counters + language ID + content
                                  fingerprint, per-row, no shuffle)
      → exact dedup              (flag_duplicates on the fingerprint —
                                  per-block partials + broadcast winner map,
                                  stages/dedup.py)
      → near-dup flag            (MinHash-LSH pairs → member-set broadcast;
                                  the LSH band groupby is the ONLY shuffle)
      → keep/flag verdict        (flag-don't-drop ≙ reference A1 semantics:
                                  rejected rows stay, with reasons)

Scale notes: the metrics pass streams; exact dedup broadcasts only
duplicated fingerprints (O(|dup keys|) driver memory — the documented
``flag_duplicates`` contract); the near-dup member set is O(|near-dup
rows|).  Combined with ``cluster_pairs`` (stages/neardup.py) the same LSH
pairs yield full dedup groups when group ids are needed instead of flags.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import fingerprint64
from ..functions.textstats import lang_id, quality_columns
from ..stages import neardup
from ..stages.dedup import flag_duplicates


def _metrics_batch(t: pa.Table) -> pa.Table:
    """doc_id, lang, text → + quality counters, lang prediction, fingerprint
    (single pass; ``text`` is retained for the downstream LSH stage)."""
    texts = t.column("text")
    q = quality_columns(texts)
    langs, scores, fps = [], [], []
    for x in texts.to_pylist():
        lg, sc = lang_id(x or "")
        langs.append(lg)
        scores.append(sc)
        fps.append(f"{fingerprint64(x or ''):016x}")
    return pa.Table.from_arrays(
        [
            t.column("doc_id"),
            t.column("lang"),
            t.column("text"),
            q["n_chars"],
            q["n_words"],
            q["n_punct"],
            pa.array(langs, pa.string()),
            pa.array(scores, pa.float64()),
            pa.array(fps, pa.string()),
        ],
        names=[
            "doc_id", "lang", "text", "n_chars", "n_words", "n_punct",
            "lang_pred", "lang_score", "fp",
        ],
    )


def curate_documents(
    sf_dir: str,
    *,
    min_words: int = 30,
    max_punct_ratio: float = 0.2,
    lsh_threshold: float = 0.8,
    min_lang_score: float = 0.15,
):
    """documents.parquet → per-doc curation verdict Dataset.

    Output columns: doc_id, n_words, n_punct, lang, lang_pred, is_duplicate,
    is_near_dup, kept (bool), reject_reason (null when kept).  Rows are never
    dropped — downstream consumers filter on ``kept`` (flag-don't-drop).
    """
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    metrics = docs.map_batches(_metrics_batch, batch_format="pyarrow")

    # exact dedup on the content fingerprint — the canonical op; first =
    # smallest (zero-ts, text-hash) which here reduces to smallest text-hash;
    # tie on identical text broken by the composite equally for all copies,
    # so we pass doc_id-ordering via a synthetic ts column for determinism
    with_ts = metrics.map_batches(
        lambda t: t.append_column(
            "_ts", pa.array(t.column("doc_id").to_pylist(), pa.timestamp("us"))
        ),
        batch_format="pyarrow",
    )
    flagged = flag_duplicates(
        with_ts, key_col="fp", ts_col="_ts", content_col="text", out_col="is_duplicate"
    ).drop_columns(["_ts"])

    # near-dup: MinHash-LSH pairs over the full corpus; flag the larger id of
    # each pair (keep-first) — the pair set is small relative to the corpus
    pairs = neardup.minhash_neardup_pairs(docs, threshold=lsh_threshold).to_pandas()
    near_ids = {max(int(a), int(b)) for a, b in zip(pairs.id_a, pairs.id_b)}
    near_ref = ray.put(near_ids)

    def verdict(t: pa.Table) -> pa.Table:
        near = ray.get(near_ref)
        ids = t.column("doc_id").to_pylist()
        nws = t.column("n_words").to_pylist()
        nps = t.column("n_punct").to_pylist()
        ncs = t.column("n_chars").to_pylist()
        lps = t.column("lang_pred").to_pylist()
        lss = t.column("lang_score").to_pylist()
        lgs = t.column("lang").to_pylist()
        dups = t.column("is_duplicate").to_pylist()
        kept, reasons, isnear = [], [], []
        for d, nw, npunct, nchars, lp, ls, lg, isd in zip(
            ids, nws, nps, ncs, lps, lss, lgs, dups
        ):
            isn = d in near
            reason = None
            if isd:
                reason = "exact duplicate"
            elif isn:
                reason = "near duplicate"
            elif nw < min_words:
                reason = f"too short: {nw} words"
            elif nchars and npunct / max(nchars, 1) > max_punct_ratio:
                reason = "punctuation ratio too high"
            elif lp != (lg or lp) and ls >= min_lang_score:
                # a language-mismatch rejection needs a CONFIDENT prediction;
                # the stopword heuristic is weak off-English, so low scores
                # never override the declared lang
                reason = f"language mismatch: predicted {lp}"
            isnear.append(isn)
            kept.append(reason is None)
            reasons.append(reason)
        return pa.Table.from_arrays(
            [
                t.column("doc_id"),
                t.column("n_words"),
                t.column("n_punct"),
                t.column("lang"),
                t.column("lang_pred"),
                t.column("is_duplicate"),
                pa.array(isnear, pa.bool_()),
                pa.array(kept, pa.bool_()),
                pa.array(reasons, pa.string()),
            ],
            names=[
                "doc_id", "n_words", "n_punct", "lang", "lang_pred",
                "is_duplicate", "is_near_dup", "kept", "reject_reason",
            ],
        )

    return flagged.map_batches(verdict, batch_format="pyarrow")
