"""Edge-case unit tests for the round-5 continuation wave (_q11_ops):
crafted micro-fixtures pinning the kernel branches — KM risk-table
suffix sums with censoring, all eight sorted-order Allen relations, the
Little's-law two-plan identity, the CUSUM reflection at zero, the
quantile_disc median convention on even n, Good-Turing spectrum math,
Simpson diversity degenerate cases, EOQ exact squares, and the Dunning
G² formula replay.  Full-scale correctness is the DuckDB oracle sweep;
these pin corner behavior the synthetic tables never isolate."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.array(days, "int64") * DAY, pa.timestamp("us"))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_km_risk_table_crafted(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": _ts([0, 0]),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
            "l_shipdate": _ts([2, 5, 2, 7]),
            "l_returnflag": pa.array(["N", "R", "R", "N"], pa.string()),
        },
    )
    out = Q.lineitem_km_risk_table(str(tmp_path)).to_pandas().set_index("t_days")
    assert out.loc[2, "n_risk"] == 4 and out.loc[2, "d_events"] == 1
    assert out.loc[2, "c_censored"] == 1
    assert out.loc[5, "n_risk"] == 2 and out.loc[5, "c_censored"] == 1
    assert out.loc[7, "n_risk"] == 1 and out.loc[7, "d_events"] == 1


def test_allen_census_all_eight_relations(tmp_path):
    # consecutive per-customer intervals crafted so each sorted-order
    # Allen relation appears exactly once
    opens = [0, 3, 5, 6, 6, 7, 8, 8, 8]
    closes = [2, 5, 8, 10, 12, 12, 11, 11, 9]
    keys = list(range(1, 10))
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array([7] * 9, pa.int64()),
            "o_orderdate": _ts(opens),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array(keys, pa.int64()),
            "l_shipdate": _ts(closes),
        },
    )
    out = Q.orders_allen_relation_census(str(tmp_path)).to_pandas()
    got = dict(zip(out.rel, out.n))
    assert got == {
        "before": 1,
        "meets": 1,
        "overlaps": 1,
        "starts": 1,
        "finished_by": 1,
        "contains": 1,
        "equals": 1,
        "started_by": 1,
    }


def test_littles_law_identity_crafted(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderdate": _ts([0, 1, 10]),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 2, 3], pa.int64()),
            "l_shipdate": _ts([2, 4, 10]),
        },
    )
    out = Q.orders_littles_law_audit(str(tmp_path)).to_pandas().iloc[0]
    assert out.total_open_days == 8  # 3 + 4 + 1
    assert out.integral_open_days == 8
    assert out.horizon_days == 11
    assert out.identity_ok == 1


def test_cusum_reflects_at_zero(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": _ts([0, 31, 61]),  # Jan, Feb, Mar 1970
            "o_totalprice": pa.array([1.0, 3.0, 2.0], pa.float64()),
        },
    )
    out = Q.orders_monthly_cusum_alarm(str(tmp_path)).to_pandas()
    # k = 600 // 3 = 200 cents
    assert out.s_cents.tolist() == [0, 100, 100]
    assert out.alarm.tolist() == [0, 0, 0]


def test_mase_terms_no_seasonal_window(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": _ts([0, 31, 61]),
            "o_totalprice": pa.array([1.0, 3.0, 2.0], pa.float64()),
        },
    )
    out = Q.orders_naive_forecast_mase_terms(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_months == 3 and out.n_naive_terms == 2
    assert out.sum_naive_abs_cents == 300
    assert out.n_seasonal_terms == 0 and out.mase_ppm == 0


def test_brown_forsythe_even_n_median_convention(tmp_path):
    _write(
        tmp_path,
        "lineitem",
        {
            "l_returnflag": pa.array(["A"] * 4, pa.string()),
            "l_extendedprice": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        },
    )
    out = Q.lineitem_brown_forsythe_terms(str(tmp_path)).to_pandas().iloc[0]
    # quantile_disc convention: sorted[ceil(4/2) - 1] = 200, NOT 250
    assert out.med_cents == 200
    assert out.sum_absdev_cents == 100 + 0 + 100 + 200


def test_good_turing_spectrum(tmp_path):
    _write(
        tmp_path,
        "documents",
        {"text": pa.array(["a b c c d d d"], pa.string())},
    )
    out = Q.docs_good_turing_freqfreq(str(tmp_path)).to_pandas().set_index("r")
    assert out.loc[1, "n_terms"] == 2  # a, b
    assert out.loc[2, "n_terms"] == 1  # c
    assert out.loc[3, "n_terms"] == 1  # d
    assert out.loc[1, "r_star_ppm"] == 2 * 1 * 1_000_000 // 2
    assert out.loc[2, "r_star_ppm"] == 3 * 1 * 1_000_000 // 1
    assert out.loc[3, "r_star_ppm"] == 0


def test_simpson_diversity_degenerate_and_even(tmp_path):
    _write(
        tmp_path,
        "documents",
        {
            "lang": pa.array(["de", "de", "de", "en", "en", "en", "en"], pa.string()),
            "source": pa.array(["s1", "s1", "s1", "s1", "s1", "s2", "s2"], pa.string()),
        },
    )
    out = Q.docs_source_simpson_diversity(str(tmp_path)).to_pandas().set_index("lang")
    assert out.loc["de", "diversity_ppm"] == 0  # single source
    # en: N=4, same-source pairs 2*1+2*1=4, denom 12 -> (12-4)/12
    assert out.loc["en", "diversity_ppm"] == 8 * 1_000_000 // 12


def test_eoq_exact_square(tmp_path):
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([1], pa.int64()),
            "p_brand": pa.array(["B#1"], pa.string()),
            "p_retailprice": pa.array([100.0], pa.float64()),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1], pa.int64()),
            "l_quantity": pa.array([10.0, 10.0], pa.float64()),
        },
    )
    out = Q.part_eoq_census(str(tmp_path)).to_pandas().iloc[0]
    # sqrt(200 * 20 / (0.1 * 100)) = sqrt(400) = 20 exactly
    assert out.n_parts == 1
    assert out.sum_floor_eoq == 20 and out.max_floor_eoq == 20


def test_dunning_g2_formula_replay(tmp_path):
    # one doc of 25 alternating "x y" pairs -> "x y" count 25, "y x" 24
    text = " ".join(["x", "y"] * 25)
    _write(tmp_path, "documents", {"text": pa.array([text], pa.string())})
    out = Q.docs_bigram_dunning_g2(str(tmp_path)).to_pandas().set_index("bigram")
    assert set(out.index) == {"x y", "y x"}
    assert out.loc["x y", "n"] == 25 and out.loc["y x", "n"] == 24
    # replay the fixed IEEE tree for "x y": margins over the bigram table
    n = 49
    rt1, ct1 = 25, 25  # bigrams starting with x / ending with y
    a, b, c, d = 25, 0, 0, 24
    rt2, ct2 = n - rt1, n - ct1

    def term(o, rt, ct):
        return float(o) * math.log((o * n) / (rt * ct)) if o > 0 else 0.0

    exp = 2.0 * (term(a, rt1, ct1) + term(b, rt1, ct2) + term(c, rt2, ct1) + term(d, rt2, ct2))
    assert out.loc["x y", "g2"] == exp


def test_wave_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in [
        "lineitem_km_risk_table",
        "orders_naive_forecast_mase_terms",
        "lineitem_brown_forsythe_terms",
        "orders_littles_law_audit",
        "orders_allen_relation_census",
        "docs_good_turing_freqfreq",
        "docs_source_simpson_diversity",
        "orders_monthly_cusum_alarm",
        "part_eoq_census",
        "docs_bigram_dunning_g2",
    ]:
        assert k in reg and k in osql
