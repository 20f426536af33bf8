"""Edge-case unit tests for the wave-E registry ops (_q15_ops)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.array(days, "int64") * DAY, pa.timestamp("us"))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_residual_vq_exact_codes(tmp_path):
    # x = 1/128 + 1/16384: q1 = 1, q2 = 129 -> residual exactly 1
    x = 1.0 / 128.0 + 1.0 / 16384.0
    _write(
        tmp_path,
        "embeddings",
        {
            "vec_id": pa.array([1], pa.int64()),
            "embedding": pa.array([[x, 0.5]], pa.list_(pa.float32())),
            "label": pa.array([3], pa.int32()),
        },
    )
    out = Q.embeddings_residual_vq_audit(str(tmp_path)).to_pandas().iloc[0]
    # 0.5 encodes exactly at both scales -> residual 0; the crafted x -> 1
    assert out.label == 3 and out.n_components == 2
    assert out.sum_sq_residual == 1 and out.max_abs_residual == 1


def test_pagination_equivalence_holds(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array(list(range(1, 101)), pa.int64()),
            "o_totalprice": pa.array([float(1000 - i) for i in range(100)], pa.float64()),
        },
    )
    out = Q.orders_pagination_equivalence_audit(str(tmp_path)).to_pandas().iloc[0]
    assert out.equivalent == 1 and out.n_offset == 20 and out.n_identical == 20
    # page 3 of the descending listing starts at the 41st order
    assert out.first_key == 41 and out.last_key == 60


def test_moving_median_short_windows(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": _ts([0, 31, 61]),
            "o_totalprice": pa.array([3.0, 1.0, 2.0], pa.float64()),
        },
    )
    out = Q.orders_monthly_moving_median(str(tmp_path)).to_pandas()
    # windows: [300] -> 300; [300,100] -> sorted[ceil(1)-1]=100; [100,200,300] -> 200
    assert out.moving_median_cents.tolist() == [300, 100, 200]


def test_concordance_counts(tmp_path):
    # months: (n, y) = (1,100), (2,300), (3,200):
    # pairs 1-2 concordant, 1-3 concordant, 2-3 discordant
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": _ts([0, 31, 40, 61, 62, 63]),
            "o_totalprice": pa.array([1.0, 1.5, 1.5, 0.5, 0.5, 1.0], pa.float64()),
        },
    )
    out = Q.orders_monthly_count_value_concordance(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_pairs == 3
    assert (out.n_concordant, out.n_discordant, out.n_ties) == (2, 1, 0)


def test_wave_e_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in [
        "embeddings_residual_vq_audit",
        "orders_pagination_equivalence_audit",
        "orders_monthly_moving_median",
        "orders_monthly_count_value_concordance",
    ]:
        assert k in reg and k in osql


def test_median_ci_binomial_known_n(tmp_path):
    # n = 6 months: cum C(6,i) = 1,7,22,42,57,63,64; 40*1=40 <= 64 -> l=1
    # only k=1 passes (40*7 > 64) -> CI = (x_(1), x_(6))
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": _ts([0, 31, 61, 92, 122, 153]),
            "o_totalprice": pa.array([6.0, 1.0, 3.0, 2.0, 5.0, 4.0], pa.float64()),
        },
    )
    out = Q.orders_median_ci_binomial(str(tmp_path)).to_pandas().iloc[0]
    assert (out.n_months, out.l_rank, out.u_rank) == (6, 1, 6)
    assert out.ci_lo_cents == 100 and out.ci_hi_cents == 600
    assert out.median_cents == 300  # sorted[ceil(3)-1] = 3rd value
