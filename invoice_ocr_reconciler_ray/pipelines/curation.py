"""Corpus curation — the composed training-data pipeline.

Chains the engine's text-analysis and dedup stages into the shape a
large-scale pretraining-data pipeline runs over a document corpus:

    read documents                             ← the ONE full corpus scan
      → ONE fused metrics pass   (quality counters + language ID + content
                                  fingerprint + MinHash SIGNATURE, per-row,
                                  no shuffle; text is DROPPED here)
      → materialize              (narrow table: counters + 0.5 KB signature
                                  per doc — blocks stay in the object store,
                                  every downstream consumer reads them
                                  instead of re-executing the scan)
      → exact dedup              (per-block (fp → min doc_id, count)
                                  partials + driver merge; only duplicated
                                  fingerprints are broadcast — stages/dedup
                                  compute_winner_map)
      → near-dup flag            (LSH bands exploded from the ALREADY
                                  COMPUTED signatures — the band groupby is
                                  the only shuffle and carries no text;
                                  exact verification text comes from a
                                  predicate-pushdown point read of just the
                                  candidate ids)
      → keep/flag verdict        (vectorized pyarrow pass; flag-don't-drop
                                  ≙ reference A1 semantics: rejected rows
                                  stay, with reasons)

Scale notes: the corpus is scanned ONCE (the fused metrics pass); the
near-dup stage shuffles signatures only; exact dedup broadcasts only
duplicated fingerprints (O(|dup keys|) driver memory); the candidate text
point-read is O(|candidate ids|) with parquet row-group pruning.  Combined
with ``cluster_pairs`` (stages/neardup.py) the same LSH pairs yield full
dedup groups when group ids are needed instead of flags.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import fingerprint64, minhash_signature
from ..functions.textstats import lang_id, quality_columns
from ..stages.dedup import compute_winner_map
from ..stages.neardup import minhash_pairs_from_signatures

# LSH geometry — must match stages/neardup.py defaults so curation's
# signature-reuse path finds the same pairs as minhash_neardup_pairs
_NUM_PERM = 64
_BANDS = 16
_SHINGLE_K = 5

#: per-process verdict memo — (path, size, mtime_ns, params) → materialized
#: Dataset; the fingerprint key means regenerated inputs always recompute
_MEMO: dict = {}


def _metrics_batch(t: pa.Table) -> pa.Table:
    """doc_id, lang, text → quality counters, lang prediction, fingerprint
    AND MinHash signature in a single pass; ``text`` is dropped so the
    materialized metrics table stays narrow."""
    texts = t.column("text")
    q = quality_columns(texts)
    langs, scores, fps, sigs = [], [], [], []
    for x in texts.to_pylist():
        lg, sc = lang_id(x or "")
        langs.append(lg)
        scores.append(sc)
        fps.append(f"{fingerprint64(x or ''):016x}")
        sigs.append(minhash_signature(x or "", _NUM_PERM, _SHINGLE_K).tobytes())
    return pa.Table.from_arrays(
        [
            t.column("doc_id"),
            t.column("lang"),
            q["n_chars"],
            q["n_words"],
            q["n_punct"],
            pa.array(langs, pa.string()),
            pa.array(scores, pa.float64()),
            pa.array(fps, pa.string()),
            pa.array(sigs, pa.binary()),
        ],
        names=[
            "doc_id", "lang", "n_chars", "n_words", "n_punct",
            "lang_pred", "lang_score", "fp", "sig",
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

    The final (narrow) verdict table is memoized per process, keyed by the
    source parquet fingerprint + parameters: the curation verdicts feed
    several independent consumers (the ``curate_corpus`` registry entry, the
    training-set export, ad-hoc callers) and re-running the metrics+LSH pass
    for each would repeat the corpus scan.
    """
    docs_path = f"{sf_dir}/documents.parquet"
    import os

    st = os.stat(docs_path)
    memo_key = (
        docs_path, st.st_size, st.st_mtime_ns,
        min_words, max_punct_ratio, lsh_threshold, min_lang_score,
    )
    if memo_key in _MEMO:
        return _MEMO[memo_key]
    docs = rd.read_parquet(docs_path, columns=["doc_id", "text", "lang"])
    metrics = docs.map_batches(_metrics_batch, batch_format="pyarrow").materialize()

    # exact dedup on the content fingerprint — first = smallest doc_id
    # (deterministic; doc_id is unique so it totally orders copies)
    winners = compute_winner_map(metrics, key_col="fp", pri_col="doc_id")
    wk = sorted(winners)
    wref = ray.put(
        {
            "keys": pa.array(wk, pa.string()),
            "first": pa.array([winners[k] for k in wk], pa.int64()),
        }
    )

    # near-dup pairs from the signatures already sitting in the metrics
    # table; verification text via a row-group-pruned point read of only the
    # candidate ids (never a second full corpus scan)
    def fetch_candidate_texts(ids):
        import pyarrow.dataset as pads

        tbl = pads.dataset(docs_path, format="parquet").to_table(
            columns=["doc_id", "text"],
            filter=pc.field("doc_id").isin(ids),
        )
        return dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))

    pairs = minhash_pairs_from_signatures(
        metrics.select_columns(["doc_id", "sig"]),
        None,
        num_perm=_NUM_PERM,
        bands=_BANDS,
        shingle_k=_SHINGLE_K,
        threshold=lsh_threshold,
        fetch_fn=fetch_candidate_texts,
    )
    # flag the larger id of each pair (keep-first) — pair set is tiny
    near_ids: set[int] = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        for a, bb in zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist()):
            near_ids.add(max(int(a), int(bb)))
    nref = ray.put(pa.array(sorted(near_ids), pa.int64()))

    def verdict(t: pa.Table) -> pa.Table:
        # fully vectorized: membership probes + an if_else reason cascade
        w = ray.get(wref)
        near = ray.get(nref)
        if len(w["keys"]):
            idx = pc.index_in(t["fp"], value_set=w["keys"])
            first = pc.take(w["first"], idx)
            isd = pc.fill_null(
                pc.and_kleene(pc.is_valid(idx), pc.not_equal(first, t["doc_id"])), False
            )
        else:
            isd = pa.array([False] * t.num_rows, pa.bool_())
        isn = pc.is_in(t["doc_id"], value_set=near)
        too_short = pc.less(t["n_words"], min_words)
        ratio = pc.divide(
            pc.cast(t["n_punct"], pa.float64()),
            pc.cast(pc.max_element_wise(t["n_chars"], 1), pa.float64()),
        )
        high_punct = pc.and_(
            pc.not_equal(t["n_chars"], 0), pc.greater(ratio, max_punct_ratio)
        )
        # a language-mismatch rejection needs a CONFIDENT prediction; the
        # stopword heuristic is weak off-English, so low scores never
        # override the declared lang (null/empty declared lang never mismatches)
        lang_ok = pc.fill_null(pc.not_equal(t["lang"], ""), False)
        mism = pc.and_(
            pc.and_(lang_ok, pc.not_equal(t["lang_pred"], pc.fill_null(t["lang"], ""))),
            pc.greater_equal(t["lang_score"], min_lang_score),
        )
        short_msg = pc.binary_join_element_wise(
            "too short: ", pc.cast(t["n_words"], pa.string()), " words", ""
        )
        mism_msg = pc.binary_join_element_wise(
            "language mismatch: predicted ", t["lang_pred"], ""
        )
        null_s = pa.scalar(None, pa.string())
        reason = pc.if_else(
            isd,
            pa.scalar("exact duplicate"),
            pc.if_else(
                isn,
                pa.scalar("near duplicate"),
                pc.if_else(
                    too_short,
                    short_msg,
                    pc.if_else(
                        high_punct,
                        pa.scalar("punctuation ratio too high"),
                        pc.if_else(mism, mism_msg, null_s),
                    ),
                ),
            ),
        )
        return pa.Table.from_arrays(
            [
                t.column("doc_id"),
                t.column("n_words"),
                t.column("n_punct"),
                t.column("lang"),
                t.column("lang_pred"),
                pc.cast(isd, pa.bool_()),
                pc.cast(isn, pa.bool_()),
                pc.is_null(reason),
                reason,
            ],
            names=[
                "doc_id", "n_words", "n_punct", "lang", "lang_pred",
                "is_duplicate", "is_near_dup", "kept", "reject_reason",
            ],
        )

    _MEMO[memo_key] = metrics.map_batches(verdict, batch_format="pyarrow").materialize()
    return _MEMO[memo_key]
