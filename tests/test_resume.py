"""Checkpoint/resume invariant (SURVEY §5.4): a run killed mid-stream and
resumed produces BYTE-IDENTICAL output to an uninterrupted run."""

import os

import pandas as pd
import pytest

from invoice_ocr_reconciler_ray.pipelines.runner import (
    read_run_output,
    run_checkpointed,
)
from invoice_ocr_reconciler_ray.state.manifest import RunManifest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.drop(columns=["spans"])  # nested col: compared via extracted_text
    return df.sort_values(["url", "warc_ts"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def runs(ray_session, tmp_path_factory):
    one_shot = str(tmp_path_factory.mktemp("oneshot"))
    resumed = str(tmp_path_factory.mktemp("resumed"))
    t1 = run_checkpointed(SF, one_shot, num_partitions=4)
    # "kill" after 2 partitions, then resume
    t2a = run_checkpointed(SF, resumed, num_partitions=4, stop_after=2)
    t2b = run_checkpointed(SF, resumed, num_partitions=4)
    return one_shot, resumed, t1, t2a, t2b


def test_partial_run_stopped(runs):
    _, _, _, t2a, _ = runs
    assert t2a["partitions_done"] == 2


def test_resume_completes(runs):
    _, _, t1, _, t2b = runs
    assert t2b["partitions_done"] == 4
    for k in ("rows_out", "matched", "mismatched", "missing", "duplicate"):
        assert t2b[k] == t1[k]


def test_resume_output_byte_identical(runs):
    one_shot, resumed, *_ = runs
    a = _canon(read_run_output(one_shot).to_pandas())
    b = _canon(read_run_output(resumed).to_pandas())
    assert a.equals(b)
    # THE invariant, explicitly: extracted bytes identical per url
    assert (a.extracted_text == b.extracted_text).all()


def test_resume_skips_done_partitions(runs):
    _, resumed, *_ = runs
    entries = RunManifest(resumed).entries()
    # 4 partitions → exactly 4 done records, no re-processing duplicates
    assert len(entries) == 4
    assert len({e["part_id"] for e in entries}) == 4


def test_manifest_lineage_fields(runs):
    one_shot, *_ = runs
    for e in RunManifest(one_shot).entries():
        assert e["status"] == "done"
        assert e["rows_out"] > 0
        assert e["bytes_html"] > 0
        assert e["matched"] + e["mismatched"] + e["missing"] + e["duplicate"] == e["rows_out"]
        assert e["session_id"]


def test_atomic_layout(runs):
    one_shot, *_ = runs
    names = sorted(os.listdir(one_shot))
    assert "manifest.jsonl" in names
    parts = [n for n in names if n.startswith("part-")]
    assert len(parts) == 4
    assert not [n for n in names if n.startswith(".tmp-")]


def test_orphaned_final_dir_recovers(ray_session, tmp_path):
    """Crash window between os.rename(tmp, final) and manifest.record(): the
    final dir exists but is NOT in the manifest.  Resume must re-run that
    partition (replacing the orphan) instead of wedging on ENOTEMPTY, and the
    result must equal an uninterrupted run."""
    import shutil

    out = str(tmp_path / "orphan")
    t1 = run_checkpointed(SF, out, num_partitions=4, stop_after=2)
    assert t1["partitions_done"] == 2
    # simulate the orphaned-final crash: part-00002's output lands on disk
    # but its manifest record never did
    done = sorted(RunManifest(out).done_parts())
    shutil.copytree(os.path.join(out, done[0]), os.path.join(out, "part-00002"))
    t2 = run_checkpointed(SF, out, num_partitions=4)
    assert t2["partitions_done"] == 4
    ref_dir = str(tmp_path / "ref")
    ref = run_checkpointed(SF, ref_dir, num_partitions=4)
    for k in ("rows_out", "matched", "mismatched", "missing", "duplicate"):
        assert t2[k] == ref[k]


# ---------------------------------------------------- file-partitioned runner

@pytest.fixture(scope="module")
def file_runs(ray_session, tmp_path_factory):
    from invoice_ocr_reconciler_ray.pipelines.runner import (
        prepare_partitioned_input,
        run_checkpointed_files,
    )

    input_dir = str(tmp_path_factory.mktemp("bucketed_in"))
    out_dir = str(tmp_path_factory.mktemp("bucketed_out"))
    prepare_partitioned_input(SF, input_dir, num_buckets=4)
    ta = run_checkpointed_files(input_dir, out_dir, stop_after=2)
    tb = run_checkpointed_files(input_dir, out_dir)
    return input_dir, out_dir, ta, tb


def test_file_runner_resumes(file_runs):
    _, _, ta, tb = file_runs
    assert ta["partitions_done"] == 2
    assert tb["partitions_done"] == 4


def test_file_runner_matches_direct_flagship(file_runs):
    """Bucketed (deployment-layout) run == one-shot flagship over the same
    pages: identical per-url extracted text and statuses (per-bucket dedup is
    global dedup because the layout co-locates urls)."""
    from invoice_ocr_reconciler_ray.pipelines.flagship import run_flagship

    _, out_dir, _, _ = file_runs
    got = (
        read_run_output(out_dir)
        .to_pandas()[["url", "warc_ts", "extracted_text", "match_status"]]
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    want = (
        run_flagship(SF)
        .to_pandas()[["url", "warc_ts", "extracted_text", "match_status"]]
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_file_runner_concurrent_matches_sequential(file_runs, tmp_path):
    """VERDICT r4 #2: buckets executed CONCURRENTLY (bounded thread pool,
    one Ray Data plan per thread) produce byte-equal rows and identical
    manifest totals vs the sequential run over the same bucketed input."""
    from invoice_ocr_reconciler_ray.pipelines.runner import (
        run_checkpointed_files as rcf,
    )

    input_dir, seq_out, _, seq_tot = file_runs
    conc_out = str(tmp_path / "conc_out")
    conc_tot = rcf(input_dir, conc_out, concurrency=4)
    for k in ("rows_out", "matched", "mismatched", "missing", "duplicate"):
        assert conc_tot[k] == seq_tot[k]
    cols = ["url", "warc_ts", "extracted_text", "match_status", "is_duplicate"]
    got = (
        read_run_output(conc_out).to_pandas()[cols]
        .sort_values(["url", "warc_ts"]).reset_index(drop=True)
    )
    want = (
        read_run_output(seq_out).to_pandas()[cols]
        .sort_values(["url", "warc_ts"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # resume on a concurrent run: drop one partition record → only it re-runs
    m = RunManifest(conc_out)
    entries = [e for e in m.entries() if e["part_id"] != "bucket-0"]
    with open(m.path, "w", encoding="utf-8") as f:
        for e in entries:
            f.write(__import__("json").dumps(e, sort_keys=True) + "\n")
    import shutil as _sh

    _sh.rmtree(os.path.join(conc_out, "bucket-0"))
    tot2 = rcf(input_dir, conc_out, concurrency=4)
    assert tot2["partitions_done"] == 4
    for k in ("rows_out", "matched", "mismatched", "missing", "duplicate"):
        assert tot2[k] == seq_tot[k]
