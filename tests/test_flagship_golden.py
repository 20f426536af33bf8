"""Golden end-to-end: the flagship pipeline on sf0.001 pages.

The golden is ANALYTIC (FIXTURES.md §3): the generator and the byte-identity
contract pin exactly what a correct extractor emits per url, so we assert
against ``sources.pages.embedded_text`` instead of a recorded file.
"""

import pyarrow.parquet as pq
import pytest

from invoice_ocr_reconciler_ray.pipelines.flagship import run_flagship
from invoice_ocr_reconciler_ray.sources import pages as P
from invoice_ocr_reconciler_ray.stages.aggregates import run_summary
from invoice_ocr_reconciler_ray.stages.extract import extract_pages
from invoice_ocr_reconciler_ray.sources.pages import pages_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    return list(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )


@pytest.fixture(scope="module")
def verdicts(ray_session):
    return run_flagship(SF).to_pandas()


def test_row_count(docs, verdicts):
    expected = sum(1 + P.has_duplicate(int(d)) for d, _, _ in docs)
    assert len(verdicts) == expected


def test_byte_identical_extraction_per_url(docs, verdicts):
    """THE invariant (BASELINE.json: input_hint): byte-identical extracted
    text per url on every successfully-extracted primary row."""
    primary = verdicts[~verdicts.is_duplicate].set_index("url")
    for d, text, _ in docs:
        d = int(d)
        expected = P.embedded_text(d, text or "")
        row = primary.loc[P.url_for(d)]
        if expected is None:  # planted malformed row
            assert row.match_status == "missing"
            assert row.error is not None
        else:
            assert row.extracted_text == expected, f"doc {d} not byte-identical"


def test_statuses_partition_input(verdicts):
    # ≙ summary invariant reconciliationEngine.js:201-207
    counts = verdicts.match_status.value_counts().to_dict()
    assert sum(counts.values()) == len(verdicts)
    assert set(counts) <= {"matched", "mismatch", "missing", "duplicate"}


def test_planted_counts_exact(docs, verdicts):
    kinds = {"pdf": 0, "error": 0, "mutated": 0, "html": 0}
    dups = 0
    for d, _, _ in docs:
        kinds[P.row_kind(int(d))] += 1
        dups += P.has_duplicate(int(d))
    counts = verdicts.match_status.value_counts().to_dict()
    assert counts.get("duplicate", 0) == dups
    assert counts.get("missing", 0) == kinds["error"]
    assert counts.get("mismatch", 0) == kinds["mutated"]
    assert counts.get("matched", 0) == kinds["html"] + kinds["pdf"]


def test_duplicate_first_wins(docs, verdicts):
    """The kept (non-flagged) row per duplicated url is the earliest warc_ts
    one — the engine's documented deterministic priority (SURVEY §7.4)."""
    for d, text, _ in docs:
        d = int(d)
        if not P.has_duplicate(d):
            continue
        grp = verdicts[verdicts.url == P.url_for(d)].sort_values("warc_ts")
        assert len(grp) == 2
        assert not grp.iloc[0].is_duplicate and grp.iloc[1].is_duplicate
        assert grp.iloc[1].match_status == "duplicate"


def test_mismatch_rows_have_diagnostics(verdicts):
    mm = verdicts[verdicts.match_status == "mismatch"]
    assert (mm.discrepancy > 0).all()
    assert mm.flag_reason.notna().all()
    assert ((mm.confidence_score > 0) & (mm.confidence_score < 100)).all()


def test_error_rows_isolated_not_failed(verdicts):
    miss = verdicts[verdicts.match_status == "missing"]
    assert miss.error.str.contains("UnicodeDecodeError").all()


def test_summary_matches_frame(verdicts, ray_session):
    s = run_summary(run_flagship(SF))
    counts = verdicts.match_status.value_counts().to_dict()
    assert s["total_rows"] == len(verdicts)
    assert s["matched"] == counts.get("matched", 0)
    assert s["mismatched"] == counts.get("mismatch", 0)
    assert s["missing"] == counts.get("missing", 0)
    assert s["duplicate"] == counts.get("duplicate", 0)


def test_dedup_strategies_agree(ray_session):
    a = run_flagship(SF, dedup_strategy="broadcast").to_pandas()
    b = run_flagship(SF, dedup_strategy="shuffle").to_pandas()
    a = a.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    b = b.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    assert (a.match_status == b.match_status).all()
    assert (a.is_duplicate == b.is_duplicate).all()


def test_actor_pool_extraction_equals_tasks(ray_session):
    pages = pages_from_documents(SF)
    t = extract_pages(pages).to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    a = (
        extract_pages(pages_from_documents(SF), concurrency=2)
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    assert (t.extracted_text == a.extracted_text).all()
    assert (t.content_type == a.content_type).all()


def test_flagship_with_byte_budget_rebatch(ray_session):
    """rebatch_bytes bounds extraction batches by payload size without
    changing any output row (SURVEY §4.3.1 giant-row handling)."""
    import pandas as pd

    from invoice_ocr_reconciler_ray.config import RunConfig
    from invoice_ocr_reconciler_ray.pipelines.flagship import run_flagship

    base = (
        run_flagship("/root/testdata/sf0.001")
        .to_pandas()[["url", "warc_ts", "extracted_text", "match_status"]]
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    budgeted = (
        run_flagship("/root/testdata/sf0.001", RunConfig(rebatch_bytes=64 * 1024))
        .to_pandas()[["url", "warc_ts", "extracted_text", "match_status"]]
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(base, budgeted)
