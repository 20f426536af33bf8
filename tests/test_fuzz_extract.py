"""Property tests: the extraction batch kernel never fails a task and is
deterministic, for ARBITRARY byte payloads (row-level error isolation
contract ≙ reference server.js:334-339)."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from invoice_ocr_reconciler_ray.stages.extract import (
    EXTRACTED_SCHEMA,
    make_extract_fn,
)

_extract = make_extract_fn()


def _batch_of(payloads: list[bytes | None]) -> pa.Table:
    n = len(payloads)
    return pa.table(
        {
            "url": pa.array([f"u://{i}" for i in range(n)], pa.string()),
            "warc_ts": pa.array([i for i in range(n)], pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "text": pa.array(["ref"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )


@settings(max_examples=120, deadline=None)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=4096)), min_size=1, max_size=8))
def test_extract_batch_never_raises_and_is_total(payloads):
    out = _extract(_batch_of(payloads))
    assert out.num_rows == len(payloads)
    for f in EXTRACTED_SCHEMA:
        assert f.name in out.column_names
    # rows partition into ok / error; error rows have empty text
    for text, err in zip(
        out.column("extracted_text").to_pylist(), out.column("error").to_pylist()
    ):
        if err is not None:
            assert text == ""


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_batch_deterministic(payload):
    a = _extract(_batch_of([payload]))
    b = _extract(_batch_of([payload]))
    assert a.column("extracted_text").to_pylist() == b.column("extracted_text").to_pylist()
    assert a.column("spans").to_pylist() == b.column("spans").to_pylist()
    assert a.column("content_hash").to_pylist() == b.column("content_hash").to_pylist()
