"""Broadcast-size guards — turning the documented "small side must fit a
worker heap" caveat into enforced engine behavior (VERDICT r3 #1).

Every broadcast op in this repo ships a small side once via ``ray.put`` and
probes it inside ``map_batches`` — the scale-correct shape as long as the
small side actually IS small.  This module centralizes the decision:

* :func:`parquet_bytes_estimate` — decide from parquet METADATA (uncompressed
  column-chunk sizes), before loading a single row, whether a dimension is
  broadcastable.  At 100 TB the wrong move is loading the dim to find out.
* :func:`guard_broadcast_bytes` — runtime guard for already-materialized
  objects (winner maps, register packs): raises :class:`BroadcastSizeError`
  with the documented reroute (hash-partitioned runner / shuffle join)
  instead of silently OOM-ing a worker.

The default budget is deliberately conservative: 256 MiB ≈ a few percent of
a typical worker heap, far above every reference-shaped dim (the reference's
register is by-construction small, reconciliationEngine.js:53-67) and far
below anything that should ship per-node.  Callers that have a cheaper
fallback (Bloom-prefiltered shuffle join) pass ``reroute=`` semantics
themselves — see ``pipelines/queries.py:promo_revenue_share``.
"""

from __future__ import annotations

import os

DEFAULT_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def broadcast_budget_bytes() -> int:
    """Env-overridable broadcast budget (bytes)."""
    return int(
        os.environ.get("IOCR_BROADCAST_MAX_BYTES", DEFAULT_BROADCAST_MAX_BYTES)
    )


class BroadcastSizeError(RuntimeError):
    """A small-side broadcast exceeded the budget.  The message names the
    scale-safe alternative so the failure is actionable, not just fatal."""


def parquet_bytes_estimate(path: str, columns: list[str] | None = None) -> int:
    """Uncompressed byte estimate for ``columns`` of a parquet file/dir from
    metadata only (no row reads).  Directories sum their fragments."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(
            parquet_bytes_estimate(os.path.join(path, f), columns)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    md = pq.ParquetFile(path).metadata
    want = set(columns) if columns is not None else None
    total = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            # path_in_schema is dotted for nested cols; match on the root
            root = col.path_in_schema.split(".")[0]
            if want is None or root in want:
                total += col.total_uncompressed_size
    return total


def dim_is_broadcastable(
    path: str, columns: list[str] | None = None, *, max_bytes: int | None = None
) -> bool:
    """Metadata-only broadcastability check for a parquet dimension."""
    budget = broadcast_budget_bytes() if max_bytes is None else max_bytes
    return parquet_bytes_estimate(path, columns) <= budget


def guard_broadcast_bytes(
    n_bytes: int, *, label: str, alternative: str, max_bytes: int | None = None
) -> None:
    """Raise :class:`BroadcastSizeError` when ``n_bytes`` exceeds the budget."""
    budget = broadcast_budget_bytes() if max_bytes is None else max_bytes
    if n_bytes > budget:
        raise BroadcastSizeError(
            f"{label}: broadcast side is ~{n_bytes / 1e6:.1f} MB, over the "
            f"{budget / 1e6:.1f} MB budget (IOCR_BROADCAST_MAX_BYTES). "
            f"Scale-safe alternative: {alternative}"
        )


def table_nbytes(obj) -> int:
    """Best-effort in-memory size of a pyarrow Table/Array/numpy array/dict
    of arrays (the shapes our broadcast sites ship)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(obj, (pa.Table, pa.ChunkedArray, pa.Array, pa.RecordBatch)):
        return obj.nbytes
    if isinstance(obj, np.ndarray):
        if obj.dtype == object:
            # object arrays hide their payload; count the string bytes
            return int(sum(len(str(x)) for x in obj.flat)) + obj.nbytes
        return obj.nbytes
    if isinstance(obj, dict):
        return sum(table_nbytes(v) for v in obj.values())
    if isinstance(obj, (list, tuple)):
        return sum(table_nbytes(v) for v in obj)
    if isinstance(obj, (bytes, bytearray, str)):
        return len(obj)
    return 64  # scalars / refs: negligible
