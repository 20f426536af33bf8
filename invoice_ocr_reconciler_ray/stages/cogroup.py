"""Generic distributed COGROUP — the multi-dataset grouping primitive
(Pig COGROUP / Spark cogroup / FlumeJava CoGroupByKey) the Dataset API
lacks.  The fuzzy award reduction (stages/fuzzy.py J4), the as-of family
(stages/asof.py), and the CDC diff (stages/cdc.py) are all hand-fused
instances of this shape; ``cogroup`` exposes it as a reusable operator for
per-key logic that needs BOTH sides' rows at once (matching, ratio checks,
custom reconciliation) and is not expressible as join + aggregate.

Scale shape: one union + one ``groupby(key)`` shuffle co-locates the two
sides; the per-group callable sees two plain Arrow tables.  Dtype
discipline follows stages/asof.py — each side is null-padded with TYPED
``pa.nulls`` against schemas captured from the inputs, and the group
kernel rebuilds each side by column selection, so no int64→float64 upcast
can leak (the round-2 verdict lesson).  Partitioning contract (documented,
as for asof): one key's rows fit in one group; oversized groups warn via
the shared hot-key guard but still complete.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .asof import HOT_KEY_WARN_ROWS, _warn_hot_key


def cogroup(
    left_ds,
    right_ds,
    *,
    key: str,
    left_cols: list[str],
    right_cols: list[str],
    fn,
    out_schema: pa.Schema,
    hot_key_warn_rows: int = HOT_KEY_WARN_ROWS,
):
    """``fn(key_value, left_rows, right_rows) -> pa.Table`` per key.

    ``key`` names the join key column on BOTH sides (project/rename
    upstream if they differ).  ``left_rows``/``right_rows`` are Arrow
    tables holding exactly ``left_cols``/``right_cols`` with the input
    dtypes; either side may be empty (key present on one side only).
    ``fn``'s output must match ``out_schema`` (enforced by cast)."""
    ltypes = dict(zip(left_ds.schema().names, left_ds.schema().types))
    rtypes = dict(zip(right_ds.schema().names, right_ds.schema().types))
    lpad = [(f"_l_{c}", ltypes[c]) for c in left_cols]
    rpad = [(f"_r_{c}", rtypes[c]) for c in right_cols]

    def tag(cols: list[str], side: int):
        def inner(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays = [t[key], pa.array([side] * n, pa.int8())]
            names = ["_k", "_side"]
            for name, typ in lpad:
                src = name[3:]
                arrays.append(t[src] if side == 0 and src in cols else pa.nulls(n, typ))
                names.append(name)
            for name, typ in rpad:
                src = name[3:]
                arrays.append(t[src] if side == 1 and src in cols else pa.nulls(n, typ))
                names.append(name)
            return pa.Table.from_arrays(arrays, names=names)

        return inner

    both = left_ds.map_batches(tag(left_cols, 0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(right_cols, 1), batch_format="pyarrow")
    )

    def group(t: pa.Table) -> pa.Table:
        _warn_hot_key(t.num_rows, "cogroup", hot_key_warn_rows)
        lmask = pc.equal(t["_side"], 0)
        lt = t.filter(lmask)
        rt = t.filter(pc.invert(lmask))
        left = pa.Table.from_arrays(
            [lt[f"_l_{c}"] for c in left_cols], names=list(left_cols)
        )
        right = pa.Table.from_arrays(
            [rt[f"_r_{c}"] for c in right_cols], names=list(right_cols)
        )
        out = fn(t["_k"][0], left, right)
        return out.cast(out_schema)

    return both.groupby("_k").map_groups(group, batch_format="pyarrow")
