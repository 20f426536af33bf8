"""Data-contract validation — the deequ/Great-Expectations shape as a
streaming stage: declarative per-row constraints checked in one pass,
violations emitted as (key, rule) rows (flag-don't-drop, like every gate in
this engine).  Row-local rules are pure vectorized batch predicates (zero
shuffle); the uniqueness rule reuses the dedup partial-count layout — each
block contributes per-key counts, the driver keeps only keys with total
count > 1 (O(|dup keys|), tiny by the same argument as the winner map,
``stages/dedup.py:compute_winner_map``).

No reference analogue (the reference trusts its uploads); this is the
ingest-side contract check a 100 TB pipeline runs before paying for
extraction.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def validate_constraints(
    ds,
    *,
    key_col: str,
    rules: dict[str, Callable[[pa.Table], pa.Array]],
    unique_key: bool = False,
):
    """One streaming pass → Dataset(key, rule) of violations.

    ``rules`` maps rule name → ``fn(batch) -> BooleanArray`` where True
    means the row PASSES.  ``unique_key=True`` adds a corpus-wide
    ``unique_<key_col>`` rule: a key appearing n > 1 times contributes
    n − 1 violation rows (the multiset SQL's ``row_number() > 1`` emits)."""

    def check(t: pa.Table) -> pa.Table:
        keys, names = [], []
        for rule, fn in rules.items():
            ok = fn(t)
            bad = t.filter(pc.invert(pc.fill_null(ok, False)))
            keys.append(bad[key_col])
            names.append(pa.array([rule] * bad.num_rows, pa.string()))
        if not keys:
            return pa.table(
                {key_col: pa.array([], t[key_col].type), "rule": pa.array([], pa.string())}
            )
        return pa.table(
            {
                key_col: pa.concat_arrays(
                    [k.combine_chunks().cast(t[key_col].type) for k in keys]
                ),
                "rule": pa.concat_arrays([n for n in names]),
            }
        )

    out = ds.map_batches(check, batch_format="pyarrow")
    if not unique_key:
        return out

    def cnt(t: pa.Table) -> pa.Table:
        g = t.select([key_col]).group_by(key_col).aggregate([(key_col, "count")])
        return g.rename_columns([key_col, "_n"])

    parts = list(
        ds.map_batches(cnt, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    )
    if parts:
        merged = pa.concat_tables(parts).group_by(key_col).aggregate([("_n", "sum")])
        dup = merged.filter(pc.greater(merged["_n_sum"], 1))
        ks, extra = [], []
        for k, n in zip(dup[key_col].to_pylist(), dup["_n_sum"].to_pylist()):
            ks.extend([k] * (int(n) - 1))
        if ks:
            extra_t = pa.table(
                {
                    key_col: pa.array(ks, merged[key_col].type),
                    "rule": pa.array([f"unique_{key_col}"] * len(ks), pa.string()),
                }
            )
            out = out.union(rd.from_arrow(extra_t))
    return out
