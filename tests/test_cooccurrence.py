"""Term co-occurrence: document-level distinct pairs, cross-block merge,
deterministic tie order."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_cooccurrence_counts_and_order(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "apple banana apple",  # dup token counts once per doc
                "apple banana cherry",
                "banana cherry",
            ],
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_term_cooccurrence

    out = docs_term_cooccurrence(str(tmp_path)).to_pandas()
    got = {(r.term_a, r.term_b): r.n_both for r in out.itertuples()}
    assert got == {
        ("apple", "banana"): 2,
        ("banana", "cherry"): 2,
        ("apple", "cherry"): 1,
    }
    # deterministic order: count DESC then lexical
    assert list(zip(out.term_a, out.term_b)) == [
        ("apple", "banana"),
        ("banana", "cherry"),
        ("apple", "cherry"),
    ]
    assert str(out.n_both.dtype) == "int64"
