"""Edge-case unit tests for the wave-H registry ops (_q18_ops)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.array(days, "int64") * DAY, pa.timestamp("us"))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_locf_carries_and_ties(tmp_path):
    # user 7: events on days 0 (two ties, max event_id wins -> 2.0) and 10;
    # weekly probes at days 0, 7, 14
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": _ts([0, 0, 10]),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "value": pa.array([1.0, 2.0, 5.0], pa.float64()),
        },
    )
    out = Q.events_user_value_locf_daily(str(tmp_path)).to_pandas()
    assert out.day.tolist() == [0, 7]
    assert out.locf_cents.tolist() == [200, 200]


def test_reliability_bins_split_and_tiebreak(tmp_path):
    # train doc 0: "a b a b a c" -> ctx a: b=2, c=1 -> modal b, ppm 666666
    # test doc 1: "a b a c" -> 2 test bigrams with ctx a, 1 correct
    _write(
        tmp_path,
        "documents",
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b a b a c", "a b a c"], pa.string()),
        },
    )
    out = Q.docs_bigram_lm_reliability_bins(str(tmp_path)).to_pandas().set_index("bin")
    # ctx 'a' ppm 666666 -> bin 6; ctx 'b' (b->a twice) ppm 1e6 -> bin 9 ...
    assert out.loc[6, "n_test_bigrams"] == 2
    assert out.loc[6, "n_correct"] == 1


def test_cuped_terms_split(tmp_path):
    # days 0..10 -> half = 5; user 1: pre 100+200, post 400; user 2: post 300
    _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": _ts([0, 5, 10, 8]),
            "value": pa.array([1.0, 2.0, 4.0, 3.0], pa.float64()),
        },
    )
    out = Q.events_cuped_adjustment_terms(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_users == 2
    assert out.sum_pre == 300 and out.sum_post == 700
    assert out.sum_pre_sq == 300 * 300
    assert out.sum_pre_post == 300 * 400


def test_wave_h_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in [
        "events_user_value_locf_daily",
        "docs_bigram_lm_reliability_bins",
        "events_cuped_adjustment_terms",
    ]:
        assert k in reg and k in osql
