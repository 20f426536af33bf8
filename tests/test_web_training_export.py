"""End-to-end web→training-set export (round 4): pages through the REAL
extraction engine into gated, chunked, globally-shuffled shards."""

import os

import pyarrow.compute as pc
import ray.data as rd

from invoice_ocr_reconciler_ray.pipelines.flagship import run_flagship
from invoice_ocr_reconciler_ray.pipelines.training_export import (
    export_web_training_set,
)

SF = "/root/testdata/sf0.001"
CHUNK_W = 200


def test_web_export_gate_reassembly_resume(ray_session, tmp_path):
    out = str(tmp_path / "webexport")
    verdicts = run_flagship(SF).materialize()
    stats = export_web_training_set(
        verdicts, out, fingerprint="test-v1", chunk_w=CHUNK_W, n_shards=4
    )

    vdf = verdicts.select_columns(
        ["url", "extracted_text", "confidence", "is_duplicate", "error"]
    ).to_pandas()
    kept = vdf[
        (~vdf["is_duplicate"])
        & vdf["error"].isna()
        & (vdf["confidence"] >= 50)
        & (vdf["extracted_text"].str.len() > 0)
    ]
    assert stats["rows_kept"] == len(kept)
    # expected chunk count: ceil(len/200) per kept doc
    exp_chunks = int(((kept["extracted_text"].str.len() + CHUNK_W - 1) // CHUNK_W).sum())
    assert stats["rows_out"] == exp_chunks

    shards = rd.read_parquet(os.path.join(out, "data")).to_pandas()
    assert len(shards) == exp_chunks
    # positions are a permutation of 0..n-1; shards are round-robin on pos
    assert sorted(shards["pos"]) == list(range(exp_chunks))
    # the hive partition column reads back as string
    assert (shards["shard"].astype(int) == shards["pos"] % 4).all()
    # reassembly: chunks of each url concatenate back to its extracted text
    re = (
        shards.sort_values(["url", "chunk_idx"])
        .groupby("url")["chunk_text"]
        .apply("".join)
    )
    truth = kept.set_index("url")["extracted_text"]
    assert len(re) == len(truth)
    for u in truth.index:
        assert re[u] == truth[u], f"reassembly diverged for {u}"
    # every excluded row is absent
    excluded = set(vdf["url"]) - set(kept["url"])
    assert not (set(shards["url"]) & excluded)

    # resume: same fingerprint returns the manifest stats without rewriting
    before = os.stat(os.path.join(out, "manifest.jsonl")).st_mtime_ns
    again = export_web_training_set(
        verdicts, out, fingerprint="test-v1", chunk_w=CHUNK_W, n_shards=4
    )
    assert again == {
        k: stats[k] for k in ("rows_kept", "rows_out", "n_shards", "order_hash")
    }
    assert os.stat(os.path.join(out, "manifest.jsonl")).st_mtime_ns == before
