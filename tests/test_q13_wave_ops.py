"""Edge-case unit tests for the wave-C registry ops (_q13_ops):
stylometric delta coordinates, the metadata-driven ABC migration split,
trigram motif counting, the timezone day-shift boundary, sign
co-movement, attribution endpoints, and proximity pair counting."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000
HOUR = 3_600_000_000


def _ts(days):
    return pa.array(np.array(days, "int64") * DAY, pa.timestamp("us"))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_stylometric_delta_two_sources(tmp_path):
    _write(
        tmp_path,
        "documents",
        {
            "source": pa.array(["s1", "s2"], pa.string()),
            "text": pa.array(["a a b b", "a b b b"], pa.string()),
        },
    )
    out = Q.docs_stylometric_delta_matrix(str(tmp_path)).to_pandas().iloc[0]
    # s1: a 500000, b 500000; s2: a 250000, b 750000 -> delta 500000
    assert out.delta_ppm == 500_000


def test_abc_migration_split_and_absent(tmp_path):
    # part 1 sells only in the first half, part 2 only in the second
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 2], pa.int64()),
            "l_extendedprice": pa.array([10.0, 10.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0], pa.float64()),
            "l_shipdate": _ts([0, 100]),
        },
    )
    out = Q.lineitem_abc_migration_matrix(str(tmp_path)).to_pandas()
    cells = {(r.class_h1, r.class_h2): r.n_parts for r in out.itertuples()}
    # sole part in a half carries 100% cumulative share -> class C
    assert cells == {("C", "-"): 1, ("-", "C"): 1}


def test_trigram_census_overlapping(tmp_path):
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": _ts([0, 1, 2, 3]),
            "user_id": pa.array([7] * 4, pa.int64()),
            "event_type": pa.array(["a", "b", "a", "b"], pa.string()),
        },
    )
    out = Q.events_type_trigram_census(str(tmp_path)).to_pandas()
    got = {(r.t1, r.t2, r.t3): r.n for r in out.itertuples()}
    assert got == {("a", "b", "a"): 1, ("b", "a", "b"): 1}


def test_tz_audit_boundary(tmp_path):
    # user 13 -> offset +1h; events at 23:30 UTC shift local day, 12:00 not
    _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([13, 13], pa.int64()),
            "ts": pa.array(
                np.array([23 * HOUR + 30 * 60_000_000, 12 * HOUR], "int64"),
                pa.timestamp("us"),
            ),
        },
    )
    out = Q.events_tz_normalization_audit(str(tmp_path)).to_pandas().iloc[0]
    assert out.offset_h == 1 and out.n_events == 2 and out.n_day_shifted == 1


def test_comovement_signs(tmp_path):
    # nation 0: months 100,200,100 (up,down); nation 1: 100,200,300 (up,up)
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_nationkey": pa.array([0, 1], pa.int32()),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_custkey": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
            "o_orderdate": _ts([0, 31, 61, 0, 31, 61]),
            "o_totalprice": pa.array([1.0, 2.0, 1.0, 1.0, 2.0, 3.0], pa.float64()),
        },
    )
    out = Q.nation_revenue_comovement_matrix(str(tmp_path)).to_pandas().iloc[0]
    assert (out.n_agree, out.n_oppose) == (1, 1)


def test_first_last_touch_direct_and_path(tmp_path):
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": _ts([0, 1, 2, 0]),
            "user_id": pa.array([7, 7, 7, 9], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase", "purchase"], pa.string()),
        },
    )
    out = Q.events_first_last_touch_matrix(str(tmp_path)).to_pandas()
    cells = {(r.first_touch, r.last_touch): r.n_users for r in out.itertuples()}
    assert cells == {("click", "view"): 1, ("direct", "direct"): 1}


def test_proximity_counts_and_min(tmp_path):
    _write(
        tmp_path,
        "documents",
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "join x merge",  # dist 2 -> 1 pair
                    "join x x x x merge",  # dist 5 -> both present, no pair
                    "merge only here",  # one term only
                ],
                pa.string(),
            ),
        },
    )
    out = Q.docs_proximity_search(str(tmp_path)).to_pandas()
    assert out.doc_id.tolist() == [1]
    assert out.iloc[0].n_pairs == 1 and out.iloc[0].min_dist == 2


def test_wave_c_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in [
        "docs_stylometric_delta_matrix",
        "lineitem_abc_migration_matrix",
        "events_type_trigram_census",
        "events_tz_normalization_audit",
        "nation_revenue_comovement_matrix",
        "events_first_last_touch_matrix",
        "docs_proximity_search",
    ]:
        assert k in reg and k in osql
