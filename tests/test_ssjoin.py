"""Set-similarity self-join (prefix-filtered AllPairs/PPJoin): completeness
vs a brute-force all-pairs check, and integer-threshold edge cases."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from invoice_ocr_reconciler_ray.stages.ssjoin import (
    _token_set,
    jaccard_self_join,
)


def _brute(docs: dict[int, str], tau_num: int, tau_den: int):
    out = {}
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            sa, sb = _token_set(docs[a]), _token_set(docs[b])
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if inter > 0 and tau_den * inter >= tau_num * union:
                out[(a, b)] = (inter, union)
    return out


def test_ssjoin_matches_bruteforce_all_pairs(ray_session):
    """Prefix filtering must lose NOTHING: result == brute force exactly,
    including intersection/union sizes, across mixed overlap levels."""
    docs = {
        1: "alpha beta gamma delta epsilon",
        2: "alpha beta gamma delta zeta",  # J=4/6 with 1
        3: "alpha beta gamma delta epsilon",  # identical to 1
        4: "totally different words here now",
        5: "alpha beta gamma delta epsilon extra",  # J=5/6 with 1
        6: "",  # empty set never pairs
        7: "alpha",  # tiny set
        8: "alpha",  # identical tiny set -> J=1
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "text": [docs[i] for i in sorted(docs)],
        }
    )
    ds = rd.from_arrow(tbl)
    for tau_num, tau_den in [(1, 2), (4, 5), (19, 20)]:
        got = {}
        out = jaccard_self_join(
            ds, tau_num=tau_num, tau_den=tau_den
        ).to_pandas()
        assert {c: str(out[c].dtype) for c in out.columns} == {
            "id_a": "int64",
            "id_b": "int64",
            "inter_n": "int64",
            "union_n": "int64",
        }
        for r in out.itertuples():
            got[(r.id_a, r.id_b)] = (r.inter_n, r.union_n)
        assert got == _brute(docs, tau_num, tau_den), (tau_num, tau_den)


def test_ssjoin_identical_and_disjoint(ray_session, tmp_path):
    """Through the parquet-backed registry entry shape: identical docs pair
    with J=1, disjoint docs never appear."""
    tbl = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], pa.int64()),
            "text": ["the same exact text", "the same exact text", "nothing shared"],
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    ds = rd.read_parquet(str(tmp_path / "documents.parquet"))
    out = jaccard_self_join(ds, tau_num=19, tau_den=20).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.id_a, r.id_b) == (10, 20)
    assert r.inter_n == r.union_n == 4


def test_ssjoin_empty_and_tokenless_corpus(ray_session):
    """No qualifying tokens anywhere -> empty result with the pair schema
    (the zero-candidate early exit)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["", "!!! ??? ..."],  # tokenless under [a-z0-9]
        }
    )
    out = jaccard_self_join(rd.from_arrow(tbl), tau_num=1, tau_den=2)
    assert out.count() == 0
    assert out.schema().names == ["id_a", "id_b", "inter_n", "union_n"]
