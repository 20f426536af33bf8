"""Constraint validation stage and compression-ratio quality signal."""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_validate_flags_planted_violations_and_dup_keys(ray_session):
    from invoice_ocr_reconciler_ray.stages.validate import validate_constraints

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 2, 2, 3], pa.int64()),
            "n": pa.array([5, 50, 50, 50, -1], pa.int64()),
        }
    )
    out = (
        validate_constraints(
            rd.from_arrow(t).repartition(3),
            key_col="doc_id",
            rules={"positive_n": lambda b: pc.greater(b["n"], 0)},
            unique_key=True,
        )
        .to_pandas()
        .sort_values(["rule", "doc_id"])
        .reset_index(drop=True)
    )
    got = list(map(tuple, out[["doc_id", "rule"]].itertuples(index=False)))
    # doc 3 fails positive_n; doc 2 appears 3x -> 2 uniqueness violations
    assert got == [(3, "positive_n"), (2, "unique_doc_id"), (2, "unique_doc_id")]
    assert str(out.doc_id.dtype) == "int64"


def test_validate_null_rule_result_counts_as_violation(ray_session):
    from invoice_ocr_reconciler_ray.stages.validate import validate_constraints

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "v": pa.array([None, 3], pa.int64()),
        }
    )
    out = validate_constraints(
        rd.from_arrow(t),
        key_col="doc_id",
        rules={"v_big": lambda b: pc.greater(b["v"], 1)},
    ).to_pandas()
    assert list(out.doc_id) == [1]  # null predicate -> violation, not a pass


def test_registry_validation_matches_duckdb_counts(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_validate_constraints

    out = docs_validate_constraints(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert (out.rule == "min_length").sum() == (docs.n_chars < 120).sum()
    assert (out.rule == "known_lang").sum() == (~docs.lang.isin(["en", "de", "fr"])).sum()
    assert (out.rule == "chars_match_text").sum() == 0
    assert (out.rule == "unique_doc_id").sum() == 0


def test_compression_ratio_discriminates_and_is_exact(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from invoice_ocr_reconciler_ray.pipelines.queries import docs_compression_ratio

    rep = "spam " * 400
    prose = "".join(
        f"word{i} jumps over fence{i * 7 % 13} near river{i % 29}. " for i in range(60)
    )
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([rep, prose, ""], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    out = (
        docs_compression_ratio(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    )
    for i, s in [(1, rep), (2, prose)]:
        raw = s.encode()
        assert out.loc[i, "comp_ppm"] == len(zlib.compress(raw, 6)) * 1_000_000 // len(raw)
    assert out.loc[1, "comp_ppm"] < out.loc[2, "comp_ppm"]
    assert bool(out.loc[1, "low_diversity"]) and not bool(out.loc[2, "low_diversity"])
    assert out.loc[3, "comp_ppm"] == 0
