"""Edge-case unit test for the Huffman code-length op (_q22_ops)."""

import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q


def test_huffman_classic_weights(tmp_path):
    # counts a:1 b:1 c:2 d:4 -> code lengths 3,3,2,1 (textbook case)
    pq.write_table(
        pa.table({"text": pa.array(["a b c c d d d d"], pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    out = Q.docs_vocab_huffman_code_lengths(str(tmp_path)).to_pandas().set_index("term")
    assert out.loc["a", "code_len"] == 3
    assert out.loc["b", "code_len"] == 3
    assert out.loc["c", "code_len"] == 2
    assert out.loc["d", "code_len"] == 1
    # Kraft equality for a full binary code tree
    assert sum(2.0 ** -l for l in out.code_len) == 1.0


def test_huffman_registered_with_oracle():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    assert "docs_vocab_huffman_code_lengths" in reg
    assert "docs_vocab_huffman_code_lengths" in osql
