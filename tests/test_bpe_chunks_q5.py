"""BPE merge training, token-window chunking, vocab Jaccard, Q5-parity —
analytic tests: classic BPE corpus merges in the published order with the
lexicographic tie-break, chunk boundaries/overlap exactness, same-nation
mask in the 6-table join."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_bpe_classic_corpus(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.bpe import train_bpe

    # freq: ab x4, abc x3 → pair (a,b) freq 7 wins round 1; then (ab,c) 3
    t = pa.table({"text": pa.array(["ab " * 4 + "abc " * 3])})
    out = train_bpe(rd.from_arrow(t), num_merges=2).to_pandas()
    assert list(out["merged"]) == ["ab", "abc"]
    assert list(out["freq"]) == [7, 3]
    assert list(out["rank"]) == [0, 1]


def test_bpe_tie_breaks_lexicographic(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.bpe import train_bpe

    # "xy" and "ax" both appear twice → pairs (x,y) and (a,x) tie at 2;
    # (a,x) is lexicographically smaller and must win round 1
    t = pa.table({"text": pa.array(["xy xy ax ax"])})
    out = train_bpe(rd.from_arrow(t), num_merges=1).to_pandas()
    assert (out.loc[0, "left"], out.loc[0, "right"]) == ("a", "x")


def test_bpe_stops_when_no_pairs(ray_session):
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.bpe import train_bpe

    # single-char words have no adjacent pairs → zero merges, not a crash
    t = pa.table({"text": pa.array(["a b c a b"])})
    out = train_bpe(rd.from_arrow(t), num_merges=5).to_pandas()
    assert len(out) == 0


def test_token_chunks_boundaries(ray_session, tmp_path):
    # 100 tokens → chunks at 0 (len 64) and 48 (len 52) — NOT a redundant
    # third at 96 (the 48-window already reached the end); 48 tokens → one
    # chunk len 48; empty doc → no chunks
    toks = [f"t{i}" for i in range(100)]
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([" ".join(toks), " ".join(toks[:48]), ""]),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_token_chunks

    out = (
        docs_token_chunks(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 1, 2]
    assert list(out["chunk_start"]) == [0, 48, 0]
    assert list(out["chunk_len"]) == [64, 52, 48]
    # overlap: second chunk of doc 1 starts at token 48 — overlaps 16 tokens
    assert out.loc[1, "chunk_text"].split(" ") == toks[48:100]
    assert out.loc[0, "chunk_text"].split(" ") == toks[0:64]


def test_lang_vocab_jaccard_exact(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": pa.array(["en", "fr", "en"]),
            "text": pa.array(["cat dog", "dog fish bird", "cat mouse"]),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        docs_lang_vocab_jaccard,
    )

    out = docs_lang_vocab_jaccard(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # en = {cat,dog,mouse}, fr = {dog,fish,bird}: inter 1, union 5
    assert (r["lang_a"], r["lang_b"], r["n_inter"], r["n_union"]) == (
        "en",
        "fr",
        1,
        5,
    )
    assert r["jaccard"] == np.float64(1) / np.float64(5)
