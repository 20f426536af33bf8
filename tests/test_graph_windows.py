"""Rolling-window substring dedup and fixed-point PageRank."""

import numpy as np
import pyarrow as pa


def _docs_table(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )


def test_window_dedup_catches_misaligned_copy(ray_session):
    """A span copied at a different word offset evades the fixed-chunk pass
    (chunks shift across boundaries) but is caught by rolling windows — the
    whole point of the Lee-et-al-style op."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.corpus_stats import (
        chunk_dedup_stats,
        window_dedup_stats,
    )

    span = " ".join(f"copy{i}" for i in range(12))  # 12-word plagiarised span
    doc_a = span + " " + " ".join(f"tail{i}" for i in range(8))
    doc_b = "pre1 pre2 pre3 " + span + " " + " ".join(f"end{i}" for i in range(7))
    ds = rd.from_arrow(_docs_table([doc_a, doc_b]))

    chunks = chunk_dedup_stats(ds, chunk_words=10).to_pandas().set_index("doc_id")
    wins = window_dedup_stats(ds, window_words=8).to_pandas().set_index("doc_id")

    # chunk pass: doc_b's 10-word chunks are offset by 3 → none match doc_a
    assert chunks.loc[1, "n_dup_chunks"] == 0
    # window pass: the span's 12-8+1 = 5 interior 8-word windows all match
    assert wins.loc[1, "n_dup_windows"] == 5
    assert wins.loc[0, "n_dup_windows"] == 0
    # window counts: len(words) - 8 + 1
    assert wins.loc[0, "n_windows"] == 20 - 8 + 1
    assert wins.loc[1, "n_windows"] == 22 - 8 + 1


def test_window_dedup_within_doc_repeat_is_not_cross_doc_dup(ray_session):
    """A window repeated only WITHIN one doc keeps first-owner == itself and
    is not flagged (matches the SQL MIN(doc_id) owner semantics)."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.corpus_stats import window_dedup_stats

    rep = " ".join(f"w{i}" for i in range(8))
    doc = rep + " " + rep  # same 8-gram twice in one doc
    out = window_dedup_stats(
        rd.from_arrow(_docs_table([doc])), window_words=8
    ).to_pandas()
    assert out.n_dup_windows.tolist() == [0]


def _pagerank_reference(edges, n, iters=5, scale=1_000_000_000):
    deg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, scale, dtype=np.int64)
    for _ in range(iters):
        acc = np.zeros(n, dtype=np.int64)
        for s, d in edges:
            acc[d] += r[s] // deg[s]
        r = 15 * scale // 100 + (85 * acc) // 100
    return r


def test_pagerank_matches_reference_and_is_layout_invariant(ray_session):
    """Hand graph (hub + chain + dangling node): the distributed fixed-point
    ranks equal a scalar-loop reference bit-for-bit, under two different
    block layouts."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.pagerank import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]  # node 4 dangling, no out-edges
    n = 5
    want = _pagerank_reference(edges, n)
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    for blocks in (1, 3):
        ds = rd.from_arrow(t).repartition(blocks)
        out = pagerank(ds, n, iters=5).to_pandas().sort_values("node")
        assert out.rank_fx.tolist() == want.tolist(), blocks
    # sanity: the sink node (2) outranks the dangling node (4)
    assert want[2] > want[4]
