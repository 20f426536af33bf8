"""Composed training-set export: every kept+clean chunk appears exactly
once across the shards, positions form an exact permutation, the order
fingerprint is stable, and a second invocation resumes (no recompute)."""

import os
import shutil

import pyarrow.dataset as pads
import ray.data as rd

SF = "/root/testdata/sf0.001"
OUT = "/tmp/iocr_export_test"


def test_export_roundtrip_and_resume(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.curation import curate_documents
    from invoice_ocr_reconciler_ray.pipelines.queries import _CONTAM_NEEDLES
    from invoice_ocr_reconciler_ray.pipelines.training_export import (
        export_training_set,
    )

    shutil.rmtree(OUT, ignore_errors=True)
    s1 = export_training_set(SF, OUT)
    assert s1["rows_in"] == 500 and s1["rows_out"] > 0

    data = pads.dataset(os.path.join(OUT, "data"), format="parquet").to_table(
        columns=["doc_id", "chunk_idx", "chunk_text", "pos"]
    )
    df = data.to_pandas()
    assert len(df) == s1["rows_out"]
    # positions are an exact permutation of [0, rows_out)
    assert sorted(df["pos"]) == list(range(s1["rows_out"]))

    # reassembly: the kept & needle-free docs — and ONLY those — are present,
    # each reassembling to its exact text
    kept = (
        curate_documents(SF)
        .to_pandas()
        .set_index("doc_id")["kept"]
    )
    texts = (
        rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    expected = {
        d
        for d in texts.index
        if kept.loc[d]
        and texts.loc[d]
        and not any(nd in texts.loc[d] for nd in _CONTAM_NEEDLES)
    }
    assert set(df["doc_id"]) == expected
    for d, g in df.sort_values("chunk_idx").groupby("doc_id"):
        assert "".join(g["chunk_text"]) == texts.loc[d]

    # resume: same stats, nothing rewritten
    mtimes = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(os.path.join(OUT, "data"))
        for p in fs
    }
    s2 = export_training_set(SF, OUT)
    assert s2 == {k: s1[k] for k in s2}
    after = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(os.path.join(OUT, "data"))
        for p in fs
    }
    assert after == mtimes
