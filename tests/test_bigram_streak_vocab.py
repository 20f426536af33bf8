"""Bigram counts, streaks (gaps-and-islands), per-lang vocab, and group-size
quantiles — analytic tests pinning what the driver hash can miss: doc
boundaries never produce cross-doc bigrams, empty tokens never join runs,
streak segmentation vs the sessionizer, quantile_disc rank semantics."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq


def test_bigram_counts_respect_doc_boundaries(ray_session, tmp_path):
    docs = pa.table(
        {
            "text": pa.array(
                [
                    "alpha beta alpha beta",  # (alpha,beta)x2 (beta,alpha)x1
                    "beta. Gamma",            # (beta,gamma) — punct split, lowercased
                    "solo",                   # no bigrams
                    "",                       # no tokens at all
                ]
            )
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_bigram_counts

    out = docs_bigram_counts(str(tmp_path)).to_pandas()
    got = {(r.term_a, r.term_b): r.n for r in out.itertuples(index=False)}
    # crucially absent: ("beta", "beta") — the doc-1/doc-2 boundary pair
    assert got == {
        ("alpha", "beta"): 2,
        ("beta", "alpha"): 1,
        ("beta", "gamma"): 1,
    }


def test_user_streaks_split_on_type_change(ray_session, tmp_path):
    # user 1: a a a b a  → a: max 3, 2 runs; b: max 1, 1 run
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([1] * 5, pa.int64()),
            "ts": pa.array(
                [dt.datetime(2026, 1, 1, h) for h in range(5)], pa.timestamp("us")
            ),
            "event_type": pa.array(["a", "a", "a", "b", "a"]),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_user_streaks

    out = events_user_streaks(str(tmp_path)).to_pandas()
    got = {
        (r.user_id, r.event_type): (r.max_streak, r.n_runs)
        for r in out.itertuples(index=False)
    }
    assert got == {(1, "a"): (3, 2), (1, "b"): (1, 1)}


def test_lang_vocab_counts_tokens_and_distinct(ray_session, tmp_path):
    docs = pa.table(
        {
            "lang": pa.array(["en", "en", "fr"]),
            "text": pa.array(["a b a", "b c", "a a a a"]),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_lang_vocab

    out = docs_lang_vocab(str(tmp_path)).to_pandas()
    got = {r.lang: (r.n_vocab, r.n_tokens) for r in out.itertuples(index=False)}
    assert got == {"en": (3, 5), "fr": (1, 4)}


def test_user_count_quantiles_disc_semantics(ray_session, tmp_path):
    # per-user counts: 1, 2, 3, 4 → quantile_disc picks actual values:
    # q=0→1, .25→1, .5→2, .75→3, 1→4
    uids = [1, 2, 2, 3, 3, 3, 4, 4, 4, 4]
    events = pa.table({"user_id": pa.array(uids, pa.int64())})
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        events_user_count_quantiles,
    )

    out = events_user_count_quantiles(str(tmp_path))
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    assert got == {0.0: 1.0, 0.25: 1.0, 0.5: 2.0, 0.75: 3.0, 1.0: 4.0}


def test_extract_numbers_edges(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "pay 120 now, ref 034-7",   # 120 + 34 + 7, three runs
                    "no digits here",            # zero runs
                    "big 1234567890123456789 x 5",  # 19-digit run excluded
                ]
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_extract_numbers

    out = docs_extract_numbers(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1].tolist() == [3, 120 + 34 + 7]
    assert out.loc[2].tolist() == [0, 0]
    assert out.loc[3].tolist() == [1, 5]
