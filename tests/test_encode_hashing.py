"""Label encoding (dense codes under sorted vocab order) and the hashing
trick featurizer (fixed-D sparse counts, collision semantics)."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq


def test_label_encode_sorted_dense_codes(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": ["web", "arxiv", "web", "books"],
            "text": ["x", "y", "z", "w"],
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_source_label_encode

    out = (
        docs_source_label_encode(str(tmp_path)).to_pandas().set_index("doc_id")
    )
    # sorted vocab: arxiv=0, books=1, web=2
    assert out.source_code.to_dict() == {1: 2, 2: 0, 3: 2, 4: 1}
    assert str(out.source_code.dtype) == "int64"


def test_feature_hashing_counts_and_collisions(ray_session, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([7], pa.int64()),
            "source": ["web"],
            "text": ["apple banana apple cherry apple banana"],
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import docs_feature_hashing

    out = docs_feature_hashing(str(tmp_path)).to_pandas()

    def ix(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 64

    expect: dict[int, int] = {}
    for w, n in (("apple", 3), ("banana", 2), ("cherry", 1)):
        expect[ix(w)] = expect.get(ix(w), 0) + n  # collisions sum — by design
    got = dict(zip(out.feat_ix, out.n))
    assert got == expect
    assert out.doc_id.unique().tolist() == [7]
    assert str(out.feat_ix.dtype) == "int64" and str(out.n.dtype) == "int64"
