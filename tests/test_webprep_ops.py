"""Web-prep / training-order operators: regex redaction, benchmark
decontamination, fixed-window chunking, exact fuzzy best-match, and the
deterministic global shuffle-rank — hand checks plus brute-force
cross-checks (the DuckDB oracles cover the full-table parity)."""

import hashlib

import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_regex_redact_scrubs_every_standalone_token(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_regex_redact

    out = docs_regex_redact(SF).to_pandas()
    assert len(out) == 500
    assert dict(out.dtypes.astype(str)) == {
        "doc_id": "int64",
        "redacted": "object",
        "n_hits": "int64",
    }
    # no standalone 'spark'/'hash' word survives; counts are consistent
    for _, r in out.head(50).iterrows():
        toks = r["redacted"].split()
        assert "spark" not in toks and "hash" not in toks
        assert toks.count("[REDACTED]") == r["n_hits"]


def test_decontaminate_matches_python_substring(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import (
        _CONTAM_NEEDLES,
        docs_decontaminate,
    )

    out = docs_decontaminate(SF).to_pandas().set_index("doc_id")
    texts = (
        rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    assert out["contaminated"].any()  # needles were chosen to hit
    for doc_id, text in texts.items():
        hits = sum(nd in text for nd in _CONTAM_NEEDLES)
        assert out.loc[doc_id, "n_hits"] == hits
        assert bool(out.loc[doc_id, "contaminated"]) == (hits > 0)


def test_char_chunks_reassemble_to_original(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import _CHUNK_W, docs_char_chunks

    out = docs_char_chunks(SF).to_pandas()
    texts = (
        rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    assert (out["chunk_len"] == out["chunk_text"].str.len()).all()
    assert (out["chunk_len"] > 0).all() and (out["chunk_len"] <= _CHUNK_W).all()
    grouped = out.sort_values(["doc_id", "chunk_idx"]).groupby("doc_id")
    seen = 0
    for doc_id, g in grouped:
        assert g["chunk_idx"].tolist() == list(range(len(g)))
        assert "".join(g["chunk_text"]) == texts.loc[doc_id]
        seen += 1
    # every non-empty doc appears
    assert seen == int((texts.str.len() > 0).sum())


def test_register_best_match_equals_bruteforce_dp(ray_session):
    from invoice_ocr_reconciler_ray.functions.similarity import _edit_distance
    from invoice_ocr_reconciler_ray.pipelines.queries import register_best_match

    out = register_best_match(SF).to_pandas().set_index("c_custkey")
    assert dict(out.dtypes.astype(str)) == {
        "best_suppkey": "int64",
        "distance": "int64",
    }
    cust = (
        rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])
        .to_pandas()
        .set_index("c_custkey")["c_name"]
    )
    supp = rd.read_parquet(
        f"{SF}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    reg = [(int(k), str(n).strip().lower()) for k, n in zip(supp.s_suppkey, supp.s_name)]
    for ck in list(cust.index)[:25]:
        q = str(cust.loc[ck]).strip().lower()
        scored = sorted((_edit_distance(q, rn), rk) for rk, rn in reg)
        d, k = scored[0]
        assert out.loc[ck, "distance"] == d
        assert out.loc[ck, "best_suppkey"] == k


def test_global_shuffle_rank_is_md5_order_permutation(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_global_shuffle_rank

    out = docs_global_shuffle_rank(SF).to_pandas()
    n = len(out)
    assert n == 500
    assert sorted(out["pos"]) == list(range(n))  # exact permutation
    expect = sorted(
        out["doc_id"], key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    got = out.sort_values("pos")["doc_id"].tolist()
    assert got == expect
    assert dict(out.dtypes.astype(str)) == {"doc_id": "int64", "pos": "int64"}


def test_global_rank_tiny_and_skewed_buckets(ray_session):
    """Ranks stay a permutation when ids collide into few buckets and when
    the dataset is smaller than the bucket count."""
    from invoice_ocr_reconciler_ray.stages.rank import global_rank

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([7, 3, 11], pa.int64())}))
    out = global_rank(ds).to_pandas()
    assert sorted(out["pos"]) == [0, 1, 2]
    expect = sorted([7, 3, 11], key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert out.sort_values("pos")["doc_id"].tolist() == expect


def test_orders_csv_export_roundtrip_matches_page(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_csv_export
    from invoice_ocr_reconciler_ray.stages.report import paginated

    got = (
        orders_csv_export(SF)
        .to_pandas()
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    want = paginated(
        rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]),
        sort_keys=["o_totalprice", "o_orderkey"],
        descending=[True, False],
        limit=20,
        offset=0,
    ).to_pandas()
    assert len(got) == 20
    assert (got["o_orderkey"].to_numpy() == want["o_orderkey"].to_numpy()).all()
    assert (got["o_totalprice"].to_numpy() == want["o_totalprice"].to_numpy()).all()


def test_run_history_lists_newest_done_first(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import run_history_top20

    out = run_history_top20(SF).to_pandas()
    assert len(out) == 20
    assert out["seq"].tolist() == sorted(out["seq"], reverse=True)
    # failed runs (every 5th) are excluded
    assert all(s % 5 != 0 for s in out["seq"])


def test_global_rank_same_permutation_at_any_bucket_count(ray_session):
    from invoice_ocr_reconciler_ray.stages.rank import global_rank

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(range(0, 400, 3)), pa.int64())})
    )
    base = global_rank(ds, n_buckets=256).to_pandas().sort_values("pos")
    for nb in (1, 16, 4096):
        got = global_rank(ds, n_buckets=nb).to_pandas().sort_values("pos")
        assert got["doc_id"].tolist() == base["doc_id"].tolist()
    import pytest

    with pytest.raises(ValueError):
        global_rank(ds, n_buckets=100)


def test_token_diversity_matches_python_sets(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_token_diversity

    out = docs_token_diversity(SF).to_pandas().set_index("doc_id")
    texts = (
        rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    import re

    for doc_id in list(texts.index)[:50]:
        toks = [w for w in re.split(r"[^a-z0-9]+", str(texts.loc[doc_id]).lower()) if w]
        if not toks:
            assert doc_id not in out.index
            continue
        assert out.loc[doc_id, "n_tokens"] == len(toks)
        assert out.loc[doc_id, "n_distinct"] == len(set(toks))
        assert out.loc[doc_id, "rep_ppm"] == (len(toks) - len(set(toks))) * 1_000_000 // len(toks)
