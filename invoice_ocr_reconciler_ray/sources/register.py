"""Register readers — lenient schema-on-read CSV/JSON ingest (≙ S2/S3).

Reproduces the reference's header handling (``server.js:136-159``): header
names are lower-cased and snake_cased, synonym columns are coalesced
(first present wins, in the reference's order), ``$``/comma-stripped float
amounts, default ``status='unpaid'``, and a **content-derived** id replaces
the reference's ``uuidv4`` (determinism, SURVEY §4.3.3).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import stable_hash64

# synonym order is the semantic (first present wins) — server.js:143-153
SYNONYMS: dict[str, list[str]] = {
    "vendor_name": ["vendor_name", "vendor", "company", "name"],
    "expected_amount": ["expected_amount", "amount", "total"],
    "due_date": ["due_date", "due", "date"],
    "reference_number": ["reference_number", "ref", "invoice_number", "invoice_no"],
}

REGISTER_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("vendor_name", pa.string()),
        ("expected_amount", pa.float64()),
        ("due_date", pa.string()),
        ("reference_number", pa.string()),
        ("status", pa.string()),
    ]
)


def _norm_header(name: str) -> str:
    return re.sub(r"\s+", "_", name.strip().lower())


def _parse_amount(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """'$1,234.50' → 1234.5; unparseable → 0.0 (reference coercion rules).

    Row-tolerant parse (pyarrow's string→float cast aborts on garbage); the
    register is the SMALL side by construction, so per-row cost is fine."""
    s = pc.replace_substring_regex(pc.cast(arr, pa.string()), r"[$,\s]", "")
    vals = []
    for x in s.to_pylist():
        try:
            vals.append(float(x) if x not in (None, "") else 0.0)
        except ValueError:
            vals.append(0.0)
    return pa.array(vals, pa.float64())


def normalize_register_batch(batch: pa.Table) -> pa.Table:
    renamed = batch.rename_columns([_norm_header(c) for c in batch.column_names])

    def coalesce(target: str) -> pa.Array | None:
        for cand in SYNONYMS[target]:
            if cand in renamed.column_names:
                return renamed.column(cand)
        return None

    n = renamed.num_rows
    vendor = coalesce("vendor_name")
    vendor = (
        pc.cast(vendor, pa.string()) if vendor is not None else pa.nulls(n, pa.string())
    )
    amount_raw = coalesce("expected_amount")
    amount = (
        _parse_amount(amount_raw)
        if amount_raw is not None
        else pa.array([0.0] * n, pa.float64())
    )
    due = coalesce("due_date")
    if due is None:
        due = pa.nulls(n, pa.string())
    elif pa.types.is_temporal(due.type):
        # schema-on-read leniency: a reader that type-inferred the date
        # (read_json → timestamp) still normalizes to the ISO day string
        due = pc.strftime(due, format="%Y-%m-%d")
    else:
        due = pc.cast(due, pa.string())
    ref = coalesce("reference_number")
    ref = pc.cast(ref, pa.string()) if ref is not None else pa.nulls(n, pa.string())
    if "status" in renamed.column_names:
        st = pc.cast(renamed.column("status"), pa.string())
        status = pc.if_else(pc.is_null(st), "unpaid", st)
    else:
        status = pa.array(["unpaid"] * n, pa.string())

    # content-derived row id (vendor|amount|due|ref), never uuid/wall-clock
    ids = [
        f"reg-{stable_hash64(f'{v}|{a}|{d}|{r}'):016x}"
        for v, a, d, r in zip(
            vendor.to_pylist(),
            [f"{x:.6f}" for x in amount.to_pylist()],
            due.to_pylist(),
            ref.to_pylist(),
        )
    ]
    return pa.Table.from_arrays(
        [pa.array(ids, pa.string()), vendor, pa.array(amount), due, ref, status],
        schema=REGISTER_SCHEMA,
    )


def read_register_csv(path: str):
    """≙ S2 ``parseCSVRegister`` — ``read_csv`` + normalizing projection."""
    return rd.read_csv(path).map_batches(normalize_register_batch, batch_format="pyarrow")


def read_register_json(path: str):
    """≙ S3 JSON register ingest."""
    return rd.read_json(path).map_batches(normalize_register_batch, batch_format="pyarrow")
