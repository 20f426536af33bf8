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
