"""Query-registry family module 22: optimal prefix codes (round-5
continuation, wave L).

`docs_vocab_huffman_code_lengths` — REAL Huffman coding over the corpus
vocabulary: the exact optimal prefix-code length per term under the
deterministic merge order (weight asc, node-id asc; merged node keeps
the lexicographically smaller id).  The oracle is the same greedy
algorithm UNROLLED into 63 MATERIALIZED merge-round CTEs (the
connected-components precedent: every round CTE is referenced several
times, and DuckDB inlines CTEs by default — materialization is
mandatory or the plan explodes); rounds beyond vocabulary−1 are guarded
no-ops, so the fixed SQL string is correct for any vocabulary up to 64
terms.  This closes the encoding-planner family with the entropy-
optimal baseline the RLE/dict/bitpack audits compare against."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from ._common import _t


def docs_vocab_huffman_code_lengths(sf_dir: str):
    """Huffman code lengths for every vocabulary term (counts from the
    distributed term-count pass; the ≤64-node greedy merge folds on the
    driver).  Merge order is fully deterministic: always the two nodes
    with the smallest (weight, node-id); the merged node's id is the
    smaller of the two.  Output: term, count, code_len — Σ count·code_len
    is the optimal-prefix-code corpus size the registry's encoding
    audits benchmark against."""
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
    terms = [str(t) for t in g["term"]]
    weights = {t: int(n) for t, n in zip(terms, g["n"])}
    if len(terms) > 64:
        raise ValueError("huffman oracle is unrolled for vocabularies <= 64")
    nodes = {t: weights[t] for t in terms}          # nid -> weight
    members = {t: [t] for t in terms}               # nid -> symbols
    depth = {t: 0 for t in terms}
    while len(nodes) > 1:
        (a, wa), (b, wb) = sorted(nodes.items(), key=lambda kv: (kv[1], kv[0]))[:2]
        na = min(a, b)
        other = b if na == a else a
        for s in members[a] + members[b]:
            depth[s] += 1
        merged = members[a] + members[b]
        del nodes[other], members[other]
        nodes[na] = wa + wb
        members[na] = merged
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "n": pa.array([weights[t] for t in terms], pa.int64()),
            "code_len": pa.array([depth[t] for t in terms], pa.int64()),
        }
    )


def _huffman_sql(rounds: int = 63) -> str:
    parts = [
        "WITH f AS MATERIALIZED (",
        "  SELECT unnest(list_filter(string_split_regex(lower(text),"
        " '[^a-z0-9]+'), x -> x <> '')) AS term",
        "  FROM documents",
        "), tc AS MATERIALIZED (",
        "  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY term",
        "), m0 AS MATERIALIZED (SELECT term AS nid, term AS sym FROM tc),",
        "w0 AS MATERIALIZED (SELECT term AS nid, n AS weight FROM tc),",
        "d0 AS MATERIALIZED (SELECT term AS sym, CAST(0 AS BIGINT) AS depth"
        " FROM tc)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""", pk{r} AS MATERIALIZED (
  SELECT nid, weight FROM w{p} ORDER BY weight, nid LIMIT 2
), c{r} AS MATERIALIZED (SELECT COUNT(*) AS cnt FROM pk{r}),
ab{r} AS MATERIALIZED (
  SELECT MIN(nid) AS na, MAX(nid) AS nb,
         CAST(SUM(weight) AS BIGINT) AS wsum
  FROM pk{r}
), m{r} AS MATERIALIZED (
  SELECT CASE WHEN (SELECT cnt FROM c{r}) = 2
              AND m.nid IN (SELECT nid FROM pk{r})
              THEN (SELECT na FROM ab{r}) ELSE m.nid END AS nid, m.sym
  FROM m{p} m
), w{r} AS MATERIALIZED (
  SELECT nid, weight FROM w{p}
  WHERE (SELECT cnt FROM c{r}) < 2 OR nid NOT IN (SELECT nid FROM pk{r})
  UNION ALL
  SELECT na, wsum FROM ab{r} WHERE (SELECT cnt FROM c{r}) = 2
), d{r} AS MATERIALIZED (
  SELECT d.sym,
         d.depth + CASE WHEN (SELECT cnt FROM c{r}) = 2 AND d.sym IN
              (SELECT sym FROM m{p} WHERE nid IN (SELECT nid FROM pk{r}))
              THEN 1 ELSE 0 END AS depth
  FROM d{p} d
)"""
        )
    parts.append(
        f"""
SELECT tc.term, tc.n, d{rounds}.depth AS code_len
FROM tc JOIN d{rounds} ON tc.term = d{rounds}.sym
ORDER BY tc.term"""
    )
    return "\n".join(parts)


DOCS_VOCAB_HUFFMAN_CODE_LENGTHS_SQL = _huffman_sql()
