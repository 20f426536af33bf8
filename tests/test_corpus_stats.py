"""Unit tests for corpus-stats operators (chunk dedup, TF-IDF, exact
quantiles, quality flags) — analytic hand-checks plus randomized
cross-checks against numpy/brute-force references."""

import numpy as np
import pyarrow as pa
import ray.data as rd


def test_chunk_dedup_planted(ray_session):
    from invoice_ocr_reconciler_ray.stages.corpus_stats import chunk_dedup_stats

    w = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": w(20, "a")},          # 2 chunks, original
            {"doc_id": 2, "text": w(20, "a")},          # exact copy → 2 dup chunks
            {"doc_id": 3, "text": w(10, "a") + " " + w(10, "b")},  # first chunk dup
            {"doc_id": 4, "text": ""},                   # empty → (0, 0)
            {"doc_id": 5, "text": "short text only"},    # 1 chunk, unique
        ]
    )
    out = (
        chunk_dedup_stats(docs, chunk_words=10)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[1].tolist() == [2, 0]
    assert out.loc[2].tolist() == [2, 2]
    assert out.loc[3].tolist() == [2, 1]
    assert out.loc[4].tolist() == [0, 0]
    assert out.loc[5].tolist() == [1, 0]
    assert dict(out.dtypes.astype(str)) == {"n_chunks": "int64", "n_dup_chunks": "int64"}


def test_tfidf_topk_hand_check(ray_session):
    """3-doc corpus: a term present in one doc scores above a term present
    everywhere; scores match the closed-form µ-scaled formula."""
    from invoice_ocr_reconciler_ray.stages.corpus_stats import tfidf_topk

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "common rare common"},
            {"doc_id": 2, "text": "common common"},
            {"doc_id": 3, "text": "common other"},
        ]
    )
    out = tfidf_topk(docs, k=2).to_pandas()
    d1 = out[out.doc_id == 1].set_index("term")
    n = 3
    score = lambda tf, df: int(np.floor(tf * (np.log((n + 1) / (df + 1)) + 1) * 1e6))
    assert d1.loc["rare"].score_u == score(1, 1)
    assert d1.loc["common"].score_u == score(2, 3)
    # rare (idf high, tf 1) vs common (tf 2, idf 1.0 since df==n)
    assert d1.loc["common"].rk == 1 and d1.loc["rare"].rk == 2  # 2e6 > 1.69e6
    assert set(out.columns) == {"doc_id", "term", "score_u", "rk"}
    assert (out.groupby("doc_id").rk.max() <= 2).all()


def test_tfidf_ties_break_term_asc(ray_session):
    from invoice_ocr_reconciler_ray.stages.corpus_stats import tfidf_topk

    docs = rd.from_items([{"doc_id": 1, "text": "bb aa"}, {"doc_id": 2, "text": "zz"}])
    out = tfidf_topk(docs, k=2).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("rk")
    assert d1.term.tolist() == ["aa", "bb"]  # equal scores → term ASC


def test_exact_quantiles_random_vs_numpy(ray_session):
    from invoice_ocr_reconciler_ray.stages.quantiles import exact_quantiles

    for seed, n in [(1, 1000), (2, 777), (3, 10)]:
        rng = np.random.RandomState(seed)
        # lognormal → heavy skew; plus duplicates via rounding
        vals = np.round(rng.lognormal(0, 2, n), 2)
        ds = rd.from_items([{"x": float(v)} for v in vals])
        qs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
        out = exact_quantiles(ds, "x", qs, nbins=64).to_pandas()
        sv = np.sort(vals)
        for q, got in zip(out.q, out.value):
            want = sv[max(1, int(np.ceil(q * n))) - 1]  # quantile_disc rank
            assert got == want, (seed, q)


def test_exact_quantiles_degenerate(ray_session):
    from invoice_ocr_reconciler_ray.stages.quantiles import exact_quantiles

    ds = rd.from_items([{"x": 5.0}] * 40)
    out = exact_quantiles(ds, "x", [0.1, 0.9]).to_pandas()
    assert out.value.tolist() == [5.0, 5.0]
    empty = rd.from_items([{"x": 1.0}]).filter(lambda r: False)
    assert exact_quantiles(empty, "x", [0.5]).num_rows == 0


def test_quality_flags_hand_check(ray_session):
    from invoice_ocr_reconciler_ray.stages.text_analysis import quality_flags_stage

    good = " ".join(
        ["the quick brown fox jumps over a lazy dog near the riverbank today"] * 3
    )  # 36 words, stopwords present, mixed vocab
    repeated = " ".join(["word"] * 40)  # dupword_u ≈ 0.975e6 → rejected
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": good},
            {"doc_id": 2, "text": repeated},
            {"doc_id": 3, "text": ""},
            {"doc_id": 4, "text": "tiny doc"},
        ]
    )
    out = quality_flags_stage(docs).to_pandas().set_index("doc_id")
    assert bool(out.loc[1].kept) is True
    assert bool(out.loc[2].kept) is False  # repetition gate
    assert out.loc[2].dupword_u == int(np.floor((40 - 1) * 1e6 / 40))
    assert bool(out.loc[3].kept) is False and out.loc[3].n_words == 0
    assert bool(out.loc[4].kept) is False  # too short
    # doc 1: 13 words × 3 sentences; stopwords 'the' ×2 + 'a' ×1 each = 9/39
    assert out.loc[1].n_words == 39
    assert out.loc[1].stop_u == int(np.floor(9 * 1e6 / 39))


def test_new_text_ops_tolerate_null_text(ray_session):
    """Null/None text rows must flow through (0-metrics), never crash or
    poison dtypes — the poison-row discipline of the extract stage applied
    to the round-3 text operators."""
    import pyarrow as pa

    from invoice_ocr_reconciler_ray.stages.corpus_stats import (
        chunk_dedup_stats,
        tfidf_topk,
    )
    from invoice_ocr_reconciler_ray.stages.text_analysis import quality_flags_stage

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["real words here", None, ""], pa.string()),
            }
        )
    )
    q = quality_flags_stage(docs).to_pandas().set_index("doc_id").sort_index()
    assert q.loc[2].n_words == 0 and not q.loc[2].kept
    assert q.loc[3].n_words == 0 and not q.loc[3].kept
    assert str(q.n_words.dtype) == "int64"

    c = chunk_dedup_stats(docs).to_pandas().set_index("doc_id").sort_index()
    assert c.loc[2].tolist() == [0, 0] and c.loc[3].tolist() == [0, 0]

    t = tfidf_topk(docs, k=2).to_pandas()
    assert set(t.doc_id) == {1}  # only the real doc yields terms
