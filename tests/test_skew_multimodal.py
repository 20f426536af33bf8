"""Skew handling (salted agg, byte-budget batching), multimodal stages,
register readers, report pagination."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from invoice_ocr_reconciler_ray.sources.register import (
    normalize_register_batch,
    read_register_csv,
    read_register_json,
)
from invoice_ocr_reconciler_ray.stages.multimodal import (
    AudioFeatures,
    FrameSampler,
    ImageFeatures,
    ImageResize,
    fake_audio,
    fake_image,
    fake_video,
    media_table_from_documents,
)
from invoice_ocr_reconciler_ray.stages.report import keyset_page, paginated
from invoice_ocr_reconciler_ray.stages.skew import (
    rebatch_by_bytes,
    salted_sum_count,
    slice_by_bytes,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------- skew

def test_salted_sum_count_equals_plain_groupby():
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"])
    got = (
        salted_sum_count(ds, key_col="lang", sum_cols={"n_chars": "sum_chars"}, buckets=7)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    import pandas as pd

    raw = rd.read_parquet(f"{SF}/documents.parquet", columns=["lang", "n_chars"]).to_pandas()
    want = (
        raw.groupby("lang")
        .agg(n=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["lang", "n", "sum_chars"]].astype({"n": "int64", "sum_chars": "int64"}),
        want.astype({"n": "int64", "sum_chars": "int64"}),
    )


def test_salted_sum_count_hot_key_fixture():
    """Skewed fixture (SURVEY §7.2.7): one key owns 50% of rows, plus a long
    tail — salted two-level agg must still be exact."""
    n = 10_000
    keys = ["hot.example.com" if i % 2 == 0 else f"d{i % 97}.example.com" for i in range(n)]
    vals = [(i * 7) % 1000 for i in range(n)]
    t = pa.table({"domain": keys, "bytes": vals})
    got = (
        salted_sum_count(
            rd.from_arrow(t), key_col="domain", sum_cols={"bytes": "sum_bytes"}, buckets=8
        )
        .to_pandas()
        .set_index("domain")
    )
    import pandas as pd

    want = (
        pd.DataFrame({"domain": keys, "bytes": vals})
        .groupby("domain")
        .agg(n=("bytes", "size"), sum_bytes=("bytes", "sum"))
    )
    assert got.loc["hot.example.com", "n"] == n // 2
    for d in want.index:
        assert int(got.loc[d, "n"]) == int(want.loc[d, "n"])
        assert int(got.loc[d, "sum_bytes"]) == int(want.loc[d, "sum_bytes"])


def test_slice_by_bytes_bounds_and_completeness():
    rows = [b"x" * s for s in (100, 200, 5000, 50, 50, 50, 9000, 10)]
    t = pa.table({"html": rows, "i": list(range(len(rows)))})
    slices = list(slice_by_bytes(t, payload_col="html", target_bytes=400))
    # every row appears exactly once, in order
    assert [i for s in slices for i in s.column("i").to_pylist()] == list(range(len(rows)))
    for s in slices:
        sizes = [len(x) for x in s.column("html").to_pylist()]
        # a slice is within budget unless it is a single over-budget row
        assert sum(sizes) <= 400 or s.num_rows == 1


def test_rebatch_by_bytes_dataset_roundtrip():
    t = pa.table({"html": [b"a" * 1000] * 20, "k": list(range(20))})
    out = rebatch_by_bytes(rd.from_arrow(t), payload_col="html", target_bytes=3000)
    assert sorted(r["k"] for r in out.take_all()) == list(range(20))


# -------------------------------------------------------------- multimodal

def test_fake_image_decode_roundtrip():
    feats = ImageFeatures()
    payload = fake_image(42, 10, 12, 3)
    t = pa.table({"media_id": [42], "payload": [payload]})
    out = feats(t)
    assert out.column("height")[0].as_py() == 10
    assert out.column("width")[0].as_py() == 12
    assert out.column("channels")[0].as_py() == 3
    assert len(out.column("channel_means")[0].as_py()) == 3
    assert out.column("error")[0].as_py() is None


def test_image_features_row_level_error_isolation():
    feats = ImageFeatures()
    t = pa.table({"media_id": [1, 2], "payload": [b"not an image", fake_image(2, 4, 4)]})
    out = feats(t)
    errs = out.column("error").to_pylist()
    assert errs[0] is not None and errs[1] is None


def test_image_resize_composes_with_features():
    rs = ImageResize(out_h=8, out_w=8)
    t = pa.table({"media_id": [7], "payload": [fake_image(7, 32, 48)]})
    small = rs(t)
    out = ImageFeatures()(small)
    assert out.column("height")[0].as_py() == 8
    assert out.column("width")[0].as_py() == 8


def test_frame_sampler_counts():
    t = pa.table({"media_id": [5], "payload": [fake_video(5, 5, 8, 8)]})
    out = FrameSampler(every=2)(t)
    assert out.column("frame_idx").to_pylist() == [0, 2, 4]
    # sampled frames decode as images
    f = ImageFeatures()(out.rename_columns(["media_id", "frame_idx", "payload"]))
    assert f.column("error").to_pylist() == [None] * 3


def test_audio_features():
    sr, n = 8000, 4000
    t = pa.table({"media_id": [3], "payload": [fake_audio(3, sr, n)]})
    out = AudioFeatures()(t)
    assert out.column("duration_sec")[0].as_py() == pytest.approx(n / sr)
    assert out.column("rms")[0].as_py() > 0


def test_media_stage_through_actor_pool():
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]).limit(60)
    media = docs.map_batches(media_table_from_documents, batch_format="pyarrow")
    import pyarrow.compute as pc

    images = media.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    out = images.map_batches(
        ImageFeatures, concurrency=(1, 2), batch_size=16, batch_format="pyarrow"
    ).to_pandas()
    assert len(out) == 20  # doc_id % 3 == 0 → image
    assert out["error"].isna().all()


# ---------------------------------------------------------------- register

def test_register_header_synonyms_and_amounts(tmp_path):
    p = tmp_path / "reg.csv"
    p.write_text(
        "Vendor,Amount,Due,Ref\n"
        '"Acme Ltd","$1,234.50",2024-01-31,INV-1\n'
        '"Globex","77",2024-02-15,INV-2\n'
    )
    out = read_register_csv(str(p)).to_pandas()
    assert list(out.columns) == [
        "id", "vendor_name", "expected_amount", "due_date", "reference_number", "status",
    ]
    assert out.expected_amount.tolist() == [1234.5, 77.0]
    assert out.vendor_name.tolist() == ["Acme Ltd", "Globex"]
    assert out.status.tolist() == ["unpaid", "unpaid"]
    # content-derived ids are deterministic across reads
    again = read_register_csv(str(p)).to_pandas()
    assert out.id.tolist() == again.id.tolist()


def test_register_json_and_missing_columns(tmp_path):
    p = tmp_path / "reg.json"
    p.write_text(
        '{"company": "Initech", "total": "$99.00", "invoice_no": "X-1"}\n'
        '{"company": "Hooli", "total": "bad"}\n'
    )
    out = read_register_json(str(p)).to_pandas()
    assert out.vendor_name.tolist() == ["Initech", "Hooli"]
    assert out.expected_amount.tolist() == [99.0, 0.0]  # unparseable → 0
    assert out.reference_number.tolist()[0] == "X-1"
    assert out.due_date.isna().all()


def test_normalize_register_prefers_first_synonym():
    t = pa.table({"vendor_name": ["A"], "vendor": ["B"], "amount": [1.0], "total": [2.0]})
    out = normalize_register_batch(t)
    assert out.column("vendor_name").to_pylist() == ["A"]
    assert out.column("expected_amount").to_pylist() == [1.0]


# ------------------------------------------------------------------ report

def test_paginated_matches_sorted_slice():
    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    page = paginated(
        ds, sort_keys=["o_totalprice", "o_orderkey"], descending=[True, False],
        limit=10, offset=10,
    ).to_pandas()
    want = (
        rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
        .to_pandas()
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .iloc[10:20]
        .reset_index(drop=True)
    )
    assert page.o_orderkey.tolist() == want.o_orderkey.tolist()


def test_export_csv_roundtrip(tmp_path):
    from invoice_ocr_reconciler_ray.stages.report import export_csv

    ds = rd.read_parquet(f"{SF}/orders.parquet")
    out = str(tmp_path / "report")
    export_csv(ds, out, ["o_orderkey", "o_orderstatus", "o_totalprice"])
    back = rd.read_csv(out).to_pandas()
    assert list(back.columns) == ["o_orderkey", "o_orderstatus", "o_totalprice"]
    assert len(back) == ds.count()


def test_keyset_page_walks_without_overlap():
    ds = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    p1 = keyset_page(ds, sort_key="o_orderkey", after=None, limit=5).to_pandas()
    p2 = keyset_page(
        ds, sort_key="o_orderkey", after=int(p1.o_orderkey.iloc[-1]), limit=5
    ).to_pandas()
    assert len(set(p1.o_orderkey) & set(p2.o_orderkey)) == 0
    assert (p2.o_orderkey.min() > p1.o_orderkey.max())
