"""Driver-visible flagship oracles (VERDICT r3 #2): the oracle-mode page
builders are pure functions of documents.text, so the expected extracted
text is computable analytically here — byte-identity through the REAL
extractor (tokenizer, classifier, charset, span builder, PDF XY-cut)."""

import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines.queries import (
    flagship_extract_oracle,
    flagship_pdf_oracle,
)
from invoice_ocr_reconciler_ray.sources.pages import (
    ORACLE_MIN_WORDS,
    ORACLE_PDF_LINE_WORDS,
    ORACLE_PDF_TWO_COL_MIN,
    ORACLE_SPLIT_AT,
    ORACLE_TITLE_WORDS,
    ORACLE_TWO_PARA_MIN,
    oracle_blocks,
)

SF = "/root/testdata/sf0.001"


def _expected_html(words):
    blocks = oracle_blocks(words)
    return None if blocks is None else "\n".join(blocks)


def _expected_pdf(words):
    if len(words) < ORACLE_MIN_WORDS:
        return None
    return "\n".join(
        " ".join(words[i : i + ORACLE_PDF_LINE_WORDS])
        for i in range(0, len(words), ORACLE_PDF_LINE_WORDS)
    )


def _docs_words():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return {
        int(d): (tx or "").split()
        for d, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }


def test_flagship_extract_oracle_byte_identity(ray_session):
    words = _docs_words()
    out = flagship_extract_oracle(SF).to_pandas().set_index("doc_id")
    expected = {d: e for d, w in words.items() if (e := _expected_html(w)) is not None}
    assert set(out.index) == set(expected)
    for d, exp in expected.items():
        row = out.loc[d]
        assert row["extracted_text"] == exp, f"doc {d} text diverged"
        assert row["extracted_len"] == len(exp)
        nw = len(words[d])
        assert row["n_spans"] == (3 if nw >= ORACLE_TWO_PARA_MIN else 2)
        assert row["confidence"] == (100 if len(exp) >= 100 else 75)
        assert row["content_type"] == "html"


def test_flagship_pdf_oracle_byte_identity(ray_session):
    words = _docs_words()
    out = flagship_pdf_oracle(SF).to_pandas().set_index("doc_id")
    expected = {d: e for d, w in words.items() if (e := _expected_pdf(w)) is not None}
    assert set(out.index) == set(expected)
    two_col_seen = 0
    for d, exp in expected.items():
        row = out.loc[d]
        assert row["extracted_text"] == exp, f"doc {d} pdf text diverged"
        assert row["content_type"] == "pdf"
        n_lines = -(-len(words[d]) // ORACLE_PDF_LINE_WORDS)
        assert row["n_spans"] == n_lines
        if len(words[d]) >= ORACLE_PDF_TWO_COL_MIN:
            two_col_seen += 1
    # the XY-cut reorder path (right column emitted first) must be exercised
    assert two_col_seen > 0


def test_oracle_blocks_threshold_rules():
    # below the floor → skipped
    assert oracle_blocks(["w"] * (ORACLE_MIN_WORDS - 1)) is None
    # single-paragraph form
    b = oracle_blocks([f"w{i}" for i in range(ORACLE_MIN_WORDS)])
    assert len(b) == 2 and b[0].count(" ") == ORACLE_TITLE_WORDS - 1
    # two-paragraph form: para 2 always has >= 8 words (min_words rule)
    b = oracle_blocks([f"w{i}" for i in range(ORACLE_TWO_PARA_MIN)])
    assert len(b) == 3
    assert len(b[2].split()) == ORACLE_TWO_PARA_MIN - ORACLE_SPLIT_AT >= 8
