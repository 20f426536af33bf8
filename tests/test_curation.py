"""Composed curation pipeline: flag-don't-drop, verdicts partition the
corpus, duplicate flags match planted fixtures."""

import pytest


@pytest.fixture(scope="module")
def curated(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.curation import curate_documents

    return curate_documents("/root/testdata/sf0.001").to_pandas()


def test_no_rows_dropped(curated):
    import pyarrow.parquet as pq

    n = pq.read_metadata("/root/testdata/sf0.001/documents.parquet").num_rows
    assert len(curated) == n


def test_kept_iff_no_reason(curated):
    assert (curated.kept == curated.reject_reason.isna()).all()


def test_flags_are_disjoint_reasons(curated):
    dup = curated[curated.is_duplicate]
    assert (dup.reject_reason == "exact duplicate").all()
    near_only = curated[curated.is_near_dup & ~curated.is_duplicate]
    assert (near_only.reject_reason == "near duplicate").all()


def test_some_kept_and_some_rejected(curated):
    assert curated.kept.sum() > 0
    assert (~curated.kept).sum() > 0


def test_neardup_flags_match_standalone_lsh(curated, ray_session):
    """The curation pipeline derives near-dups from signatures computed in
    the fused metrics pass; that path must flag EXACTLY the docs the
    standalone minhash LSH op finds (larger id of each verified pair)."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.neardup import minhash_neardup_pairs

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = minhash_neardup_pairs(docs, threshold=0.8).to_pandas()
    want = {max(int(a), int(b)) for a, b in zip(pairs.id_a, pairs.id_b)}
    got = set(curated[curated.is_near_dup].doc_id)
    assert got == want
