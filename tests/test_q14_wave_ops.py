"""Edge-case unit tests for the wave-D registry ops (_q14_ops):
query-likelihood formula replay, integer RRF ranks, cross-bucket gap
stitching, novelty deciles, HHI buckets, and LCP front-coding."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_query_likelihood_formula_replay(tmp_path):
    _write(
        tmp_path,
        "documents",
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["join merge scan", "x y z"], pa.string()),
        },
    )
    out = Q.docs_query_likelihood_topk(str(tmp_path)).to_pandas()
    assert out.doc_id.tolist() == [1, 2]  # doc 1 contains every query term
    big_c, cfs = 6, [1, 1, 1]
    exp = sum(math.log((1 * big_c + 100 * cf) / ((3 + 100) * big_c)) for cf in cfs)
    assert out.iloc[0].ql_score == exp


def test_rrf_fusion_ranks(tmp_path):
    _write(
        tmp_path,
        "documents",
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            # doc 1 wins ranker A (tf of 'join'); doc 2 wins ranker B (length)
            "text": pa.array(["join join", "a b c d e"], pa.string()),
        },
    )
    out = Q.docs_rrf_fusion_topk(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[1, "rank_tf"] == 1 and out.loc[1, "rank_len"] == 2
    assert out.loc[2, "rank_tf"] == 2 and out.loc[2, "rank_len"] == 1
    exp = 1_000_000_000 // 61 + 1_000_000_000 // 62
    assert out.loc[1, "rrf_score"] == exp and out.loc[2, "rrf_score"] == exp


def test_id_gap_cross_bucket_stitch(tmp_path):
    ids = [1, 2, 3000, 3001, 10000]  # buckets 0, 2, 9; max gap spans buckets
    _write(tmp_path, "events", {"event_id": pa.array(ids, pa.int64())})
    out = Q.events_id_gap_audit(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_ids == 5 and (out.min_id, out.max_id) == (1, 10000)
    assert out.n_missing == 10000 - 1 + 1 - 5
    assert out.max_gap == 10000 - 3001 and out.gap_start == 3001


def test_id_gap_tie_prefers_smallest_start(tmp_path):
    ids = [10, 20, 30]  # two gaps of 10 -> start 10 wins
    _write(tmp_path, "events", {"event_id": pa.array(ids, pa.int64())})
    out = Q.events_id_gap_audit(str(tmp_path)).to_pandas().iloc[0]
    assert out.max_gap == 10 and out.gap_start == 10


def test_bigram_novelty_deciles(tmp_path):
    _write(
        tmp_path,
        "documents",
        {
            "doc_id": pa.array([0, 9], pa.int64()),
            "text": pa.array(["a b", "a b c d"], pa.string()),
        },
    )
    out = Q.docs_bigram_novelty_curve(str(tmp_path)).to_pandas().set_index("decile")
    # 'a b' first seen at doc 0 -> decile 0; 'b c','c d' at doc 9 -> 9*10//10=9
    assert out.loc[0, "n_new_bigrams"] == 1
    assert out.loc[9, "n_new_bigrams"] == 2


def test_supplier_hhi_buckets(tmp_path):
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 2, 2], pa.int64()),
            "l_suppkey": pa.array([10, 10, 11], pa.int64()),
            "l_quantity": pa.array([5.0, 3.0, 3.0], pa.float64()),
        },
    )
    out = Q.part_supplier_hhi_census(str(tmp_path)).to_pandas().set_index("hhi_bucket")
    # part 1: monopoly hhi=1e6 -> bucket 9; part 2: 50/50 -> 500000 -> bucket 5
    assert out.loc[9, "n_parts"] == 1 and out.loc[5, "n_parts"] == 1


def test_frontcoding_lcp(tmp_path):
    _write(
        tmp_path,
        "documents",
        {"text": pa.array(["scan scanner scout apple"], pa.string())},
    )
    out = Q.docs_term_dict_frontcoding_audit(str(tmp_path)).to_pandas().set_index("term")
    assert out.loc["apple", "lcp_prev"] == 0  # first in sort order
    assert out.loc["scanner", "lcp_prev"] == 4  # vs 'scan'
    assert out.loc["scout", "lcp_prev"] == 2  # vs 'scanner' -> 'sc'


def test_wave_d_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in [
        "docs_query_likelihood_topk",
        "docs_rrf_fusion_topk",
        "events_id_gap_audit",
        "docs_bigram_novelty_curve",
        "part_supplier_hhi_census",
        "docs_term_dict_frontcoding_audit",
    ]:
        assert k in reg and k in osql
