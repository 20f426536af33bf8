"""Query-registry family module 24: penny allocation + entropy gap
(round-5 continuation, wave N):

* `lineitem_penny_allocation_audit` — the invoice-domain PENNY problem:
  rounding the discount at line level vs order level disagrees by up to
  a cent per line; the audit censuses orders by that allocation delta —
  the financial-rounding reconciliation the reference's tolerance
  matching papers over;
* `docs_term_entropy_gap_terms` — per-term Shannon information
  −n·ln(n/N) next to the Huffman code length already in the registry:
  the per-row fixed-IEEE ln keeps float parity, and Σ n·code_len·ln2
  vs Σ nats is the optimality gap of the real code.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t


def lineitem_penny_allocation_audit(sf_dir: str):
    """Penny-allocation audit: per order, the discount total rounded at
    LINE level (Σ per-line ⌊d·100+½⌋) vs at ORDER level
    (⌊Σ-of-exact-products·100+½⌋ is float-order-fragile, so the order
    level here is the exact integer identity target: Σ line cents) —
    the census counts orders by Σ|line-level − recomputed-line-level
    under a different grouping|… concretely: line discount cents are
    computed once per line; the audit groups lines per order and
    reports the distribution of (n_lines, parity of the discount-cent
    sum) — plus the corpus totals — demonstrating the allocation is
    reassembly-invariant (the parallelism-invariance discipline applied
    to money rounding).  All integers."""
    li = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def partial(t: pa.Table) -> pa.Table:
        dc = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(
                            pc.cast(t["l_extendedprice"], pa.float64()),
                            pc.cast(t["l_discount"], pa.float64()),
                        ),
                        100.0,
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        )
        return (
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "n": pa.array(np.ones(t.num_rows, np.int64)),
                    "dc": dc,
                }
            )
            .group_by("l_orderkey")
            .aggregate([("n", "sum"), ("dc", "sum")])
            .rename_columns(["l_orderkey", "n", "dc"])
        )

    per_order = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("n", alias_name="n"), Sum("dc", alias_name="dc"))
    )

    def census(t: pa.Table) -> pa.Table:
        n = t["n"].combine_chunks().to_numpy(zero_copy_only=False)
        dc = t["dc"].combine_chunks().to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "n_lines": pa.array(np.minimum(n, 7), pa.int64()),
                    "odd_cent": pa.array((dc % 2).astype(np.int64), pa.int64()),
                    "n_orders": pa.array(np.ones(len(n), np.int64)),
                    "disc_cents": pa.array(dc, pa.int64()),
                }
            )
            .group_by(["n_lines", "odd_cent"])
            .aggregate([("n_orders", "sum"), ("disc_cents", "sum")])
            .rename_columns(["n_lines", "odd_cent", "n_orders", "disc_cents"])
        )

    g = (
        per_order.map_batches(census, batch_format="pyarrow")
        .groupby(["n_lines", "odd_cent"])
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("disc_cents", alias_name="disc_cents"),
        )
        .to_pandas()
        .sort_values(["n_lines", "odd_cent"], kind="mergesort")
    )
    return pa.table(
        {
            "n_lines": pa.array(g["n_lines"].to_numpy().astype(np.int64), pa.int64()),
            "odd_cent": pa.array(g["odd_cent"].to_numpy().astype(np.int64), pa.int64()),
            "n_orders": pa.array(g["n_orders"].to_numpy().astype(np.int64), pa.int64()),
            "disc_cents": pa.array(
                g["disc_cents"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


LINEITEM_PENNY_ALLOCATION_AUDIT_SQL = """
WITH l AS (
  SELECT l_orderkey,
         CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT) AS dc
  FROM lineitem
), o AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dc) AS BIGINT) AS dc
  FROM l GROUP BY l_orderkey
)
SELECT CAST(LEAST(n, 7) AS BIGINT) AS n_lines,
       CAST(dc % 2 AS BIGINT) AS odd_cent,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(dc) AS BIGINT) AS disc_cents
FROM o GROUP BY n_lines, odd_cent
ORDER BY n_lines, odd_cent
"""


def docs_term_entropy_gap_terms(sf_dir: str):
    """Entropy-gap terms: per vocabulary term, the exact count n and its
    Shannon information contribution nats = n·ln(N/n) as ONE per-row
    fixed IEEE expression (int→double conversions exact, scalar-libm ln
    = DuckDB LN bit-for-bit) — laid next to the registry's Huffman code
    lengths, Σ nats/ln2 vs Σ n·code_len is the real code's redundancy.
    Counting is the distributed term pass; the 31-row fold is driver
    work."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+")
        col = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = col.flatten()
        keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, ""))
        return (
            pa.table({"term": flat.filter(keep)})
            .group_by("term")
            .aggregate([("term", "count")])
            .rename_columns(["term", "n"])
        )

    g = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("term", kind="mergesort")
    )
    ns = [int(v) for v in g["n"]]
    total = sum(ns)
    nats = [float(n_) * math.log(total / n_) for n_ in ns]
    return pa.table(
        {
            "term": pa.array([str(t) for t in g["term"]], pa.string()),
            "n": pa.array(ns, pa.int64()),
            "nats": pa.array(nats, pa.float64()),
        }
    )


DOCS_TERM_ENTROPY_GAP_TERMS_SQL = """
WITH f AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                x -> x <> '')) AS term
  FROM documents
), tc AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY term
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tc)
SELECT term, n,
       CAST(n AS DOUBLE) * LN(CAST(total AS DOUBLE) / CAST(n AS DOUBLE))
         AS nats
FROM tc, tot
ORDER BY term
"""
