"""Edge-case unit tests for the wave-K registry ops (_q21_ops)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.array(days, "int64") * DAY, pa.timestamp("us"))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_bcubed_terms_split_cluster(tmp_path):
    # pred key (en, 5) holds 3 docs: 2 identical texts + 1 different
    _write(
        tmp_path,
        "documents",
        {
            "lang": pa.array(["en", "en", "en"], pa.string()),
            "n_chars": pa.array([5, 5, 5], pa.int64()),
            "text": pa.array(["same!", "same!", "other"], pa.string()),
        },
    )
    out = Q.docs_dedup_bcubed_terms(str(tmp_path)).to_pandas()
    cells = {
        (r.pred_size, r.truth_size, r.overlap): r.n_docs for r in out.itertuples()
    }
    assert cells == {(3, 2, 2): 2, (3, 1, 1): 1}


def test_learned_index_perfect_fit(tmp_path):
    # keys 256, 512, ..., 256*n -> kp = 1..n, perfectly linear -> max err 0
    n = 50
    _write(
        tmp_path,
        "orders",
        {"o_orderkey": pa.array([256 * (i + 1) for i in range(n)], pa.int64())},
    )
    out = Q.orders_learned_index_error_audit(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_keys == n
    assert out.max_abs_err_rows == 0 and out.n_beyond_64 == 0


def test_lru2_replay(tmp_path):
    # stream a b a c b: a=miss, b=miss, a=hit (in {b,a}), c=miss evicts b,
    # b=miss (cache {c,a})
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": _ts([0, 1, 2, 3, 4]),
            "user_id": pa.array([7] * 5, pa.int64()),
            "event_type": pa.array(["a", "b", "a", "c", "b"], pa.string()),
        },
    )
    out = Q.events_user_lru_hit_census(str(tmp_path)).to_pandas().set_index("event_type")
    assert out.loc["a", "n_hits"] == 1
    assert out.loc["b", "n_hits"] == 0
    assert out.loc["c", "n_hits"] == 0


def test_wave_k_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in [
        "docs_dedup_bcubed_terms",
        "orders_learned_index_error_audit",
        "events_user_lru_hit_census",
    ]:
        assert k in reg and k in osql
