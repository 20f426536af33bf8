"""Corpus curation — the composed training-data pipeline.

Chains the engine's text-analysis and dedup stages into the shape a
large-scale pretraining-data pipeline runs over a document corpus:

    read documents
      → quality metrics        (vectorized projection, no shuffle)
      → language ID            (stateless map; actor-pool form available)
      → exact dedup            (content fingerprint, broadcast winner map)
      → near-dup flag          (MinHash-LSH pairs → member set broadcast)
      → keep/flag verdict      (flag-don't-drop ≙ reference A1 semantics:
                                rejected rows stay, with reasons)

Scale notes: the only shuffle is the LSH band groupby inside
``minhash_neardup_pairs``; exact dedup uses the per-block-partials broadcast
path; all gates are per-row.  Near-dup flagging keeps the FIRST (smallest
doc_id) member of each pair and flags the other — combined with
``cluster_pairs`` (stages/neardup.py) the same pairs yield full dedup groups
when group ids are needed instead of flags.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..stages import neardup
from ..stages.text_analysis import lang_id_stage, quality_stage


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

    # --- per-row metrics (no shuffle) -----------------------------------
    quality = quality_stage(docs)  # doc_id, n_chars, n_words, n_punct, n_upper
    langs = lang_id_stage(docs)  # doc_id, lang_pred, lang_score

    qt = quality.to_pandas().set_index("doc_id")
    lt = langs.to_pandas().set_index("doc_id")
    # (driver-side frame joins are fine at registry/test scale; at corpus
    # scale these two projections fuse into one map_batches emitting all
    # metric columns — same plan shape, zero extra passes)

    # --- exact dedup: content fingerprint, first-wins -------------------
    def add_fp(t: pa.Table) -> pa.Table:
        from ..functions.hashing import fingerprint64

        fps = [f"{fingerprint64(x or ''):016x}" for x in t.column("text").to_pylist()]
        return pa.Table.from_arrays(
            [t.column("doc_id"), pa.array(fps, pa.string())], names=["doc_id", "fp"]
        )

    fp = docs.map_batches(add_fp, batch_format="pyarrow").to_pandas()
    first_by_fp = fp.groupby("fp")["doc_id"].min()
    counts = fp.groupby("fp")["doc_id"].size()
    dup_fps = set(counts[counts > 1].index)
    fp["is_duplicate"] = fp.apply(
        lambda r: r.fp in dup_fps and r.doc_id != first_by_fp[r.fp], axis=1
    )
    dup_ids = set(fp[fp.is_duplicate].doc_id)

    # --- near-dup: MinHash-LSH pairs, flag the non-first member ---------
    pairs = neardup.minhash_neardup_pairs(docs, threshold=lsh_threshold).to_pandas()
    near_ids = set()
    for a, b in zip(pairs.id_a, pairs.id_b):
        near_ids.add(max(int(a), int(b)))  # keep the smaller id
    near_ref = ray.put(near_ids)
    dup_ref = ray.put(dup_ids)
    q_ref = ray.put(qt[["n_words", "n_punct", "n_chars"]].to_dict("index"))
    l_ref = ray.put(
        {k: (v["lang_pred"], v["lang_score"]) for k, v in lt.to_dict("index").items()}
    )

    def verdict(t: pa.Table) -> pa.Table:
        near = ray.get(near_ref)
        dups = ray.get(dup_ref)
        qmap = ray.get(q_ref)
        lmap = ray.get(l_ref)
        ids = t.column("doc_id").to_pylist()
        langs_in = t.column("lang").to_pylist()
        out = {
            "doc_id": ids,
            "n_words": [],
            "n_punct": [],
            "lang": langs_in,
            "lang_pred": [],
            "is_duplicate": [],
            "is_near_dup": [],
            "kept": [],
            "reject_reason": [],
        }
        for i, d in enumerate(ids):
            q = qmap[d]
            nw, npunct, nchars = q["n_words"], q["n_punct"], q["n_chars"]
            lp, lscore = lmap[d]
            isd = d in dups
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
            elif lp != (langs_in[i] or lp) and lscore >= min_lang_score:
                # a language-mismatch rejection needs a CONFIDENT prediction;
                # the n-gram/stopword heuristic is weak off-English, so low
                # scores never override the declared lang
                reason = f"language mismatch: predicted {lp}"
            out["n_words"].append(nw)
            out["n_punct"].append(npunct)
            out["lang_pred"].append(lp)
            out["is_duplicate"].append(isd)
            out["is_near_dup"].append(isn)
            out["kept"].append(reason is None)
            out["reject_reason"].append(reason)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "n_words": pa.array(out["n_words"], pa.int64()),
                "n_punct": pa.array(out["n_punct"], pa.int64()),
                "lang": pa.array(out["lang"], pa.string()),
                "lang_pred": pa.array(out["lang_pred"], pa.string()),
                "is_duplicate": pa.array(out["is_duplicate"], pa.bool_()),
                "is_near_dup": pa.array(out["is_near_dup"], pa.bool_()),
                "kept": pa.array(out["kept"], pa.bool_()),
                "reject_reason": pa.array(out["reject_reason"], pa.string()),
            }
        )

    return docs.map_batches(verdict, batch_format="pyarrow")
