"""Edge-case unit tests for the round-4 continuation-wave registry ops —
crafted micro-fixtures pinning kernel corner behavior (perfect concordance,
censoring boundaries, varint width ladder, interval-union merge) that the
synthetic-table oracles exercise only statistically.  The full-scale
correctness gate remains the DuckDB oracle sweep."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000
SEC = 1_000_000
# 1995-01-02 was a Monday; anchor weekday math off it
MONDAY_US = int(np.datetime64("1995-01-02T00:00:00", "us").astype(np.int64))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))
    return str(tmp)


def test_kendall_perfect_concordance(tmp_path):
    # spend strictly increases with balance -> tau_b = 1, s_num = n0
    sf = _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "c_acctbal": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
        },
    )
    t = Q.customer_balance_spend_kendall(sf)
    assert t["s_num"][0].as_py() == 6  # C(4,2)
    # tau = 6/(sqrt(6)*sqrt(6)) lands a couple ULP off exact 1.0 — the op's
    # contract is the fixed expression (oracle bit-parity), not algebra
    assert abs(t["kendall_tau_b"][0].as_py() - 1.0) < 1e-12


def test_kendall_inversion_with_tie(tmp_path):
    # bal [1,2,3], spend [10,30,20]: one discordant pair -> S = 3 - 2 = 1
    sf = _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_acctbal": pa.array([1.0, 2.0, 3.0], pa.float64()),
        },
    )
    _write(
        tmp_path,
        "orders",
        {
            "o_custkey": pa.array([1, 2, 3], pa.int64()),
            "o_totalprice": pa.array([10.0, 30.0, 20.0], pa.float64()),
        },
    )
    t = Q.customer_balance_spend_kendall(sf)
    assert t["s_num"][0].as_py() == 1


def test_gamma_perfect_monotone(tmp_path):
    # size tracks price exactly -> zero discordant pairs, gamma = 1e6 ppm
    sf = _write(
        tmp_path,
        "part",
        {
            "p_size": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int32()),
            "p_retailprice": pa.array(
                [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0], pa.float64()
            ),
        },
    )
    t = Q.part_size_price_gamma(sf)
    assert t["discordant"][0].as_py() == 0
    assert t["gamma_ppm"][0].as_py() == 1_000_000


def test_varint_width_ladder(tmp_path):
    # sorted keys 0,127,255,16638 -> sentinel delta 1 plus gaps 127,128,16383
    # -> widths 1,1,2,2 = 6 bytes
    sf = _write(
        tmp_path,
        "orders",
        {"o_orderkey": pa.array([0, 127, 255, 16638], pa.int64())},
    )
    t = Q.orders_key_delta_varint_bytes(sf)
    assert t["varint_bytes"][0].as_py() == 6
    assert t["n_keys"][0].as_py() == 4


def test_km_censoring_boundary(tmp_path):
    # A: life 1 churn; B: life 0 churn; C: life 8 censored (h-l = 2d);
    # D: life 10 censored (h-l = 0)
    ts, uid = [], []
    for u, days in ((1, [0, 1]), (2, [0]), (3, [0, 8]), (4, [0, 10])):
        for d in days:
            uid.append(u)
            ts.append(MONDAY_US + d * DAY)
    sf = _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(np.array(ts, "int64"), pa.timestamp("us")),
        },
    )
    t = Q.events_user_lifetime_km(sf).to_pydict()
    assert t["t_days"] == [0, 1, 8, 10]
    assert t["n_risk"] == [4, 3, 2, 1]
    assert t["d_churn"] == [1, 1, 0, 0]
    assert t["n_censored"] == [0, 0, 1, 1]
    assert t["km_ppm"] == [750000, 500000, 500000, 500000]


def test_jonckheere_perfect_separation(tmp_path):
    # all LOW qty < all MID qty < all HIGH qty ->
    # J2 = 2*(nl*nm + nl*nh + nm*nh) = 2*(4+4+4) = 24
    sf = _write(
        tmp_path,
        "lineitem",
        {
            "l_discount": pa.array(
                [0.01, 0.02, 0.05, 0.06, 0.08, 0.09], pa.float64()
            ),
            "l_quantity": pa.array([1.0, 2.0, 10.0, 11.0, 20.0, 21.0], pa.float64()),
        },
    )
    t = Q.lineitem_discount_jonckheere(sf)
    assert (
        t["n_low"][0].as_py(),
        t["n_mid"][0].as_py(),
        t["n_high"][0].as_py(),
    ) == (2, 2, 2)
    assert t["j2"][0].as_py() == 24


def test_cliffs_delta_total_separation(tmp_path):
    # Saturday values all above Monday values -> delta_ppm = 1e6
    sat = MONDAY_US + 5 * DAY
    sf = _write(
        tmp_path,
        "events",
        {
            "ts": pa.array(
                np.array([MONDAY_US, MONDAY_US + SEC, sat, sat + SEC], "int64"),
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0, 2.0, 10.0, 11.0], pa.float64()),
        },
    )
    t = Q.events_weekend_cliffs_delta(sf)
    assert t["delta_ppm"][0].as_py() == 1_000_000
    assert t["delta_num"][0].as_py() == 4


def test_coverage_union_merges_overlaps(tmp_path):
    # events at t, t+100s, t+1000s: covered = 100 + 300 + 300 = 700 s
    base = MONDAY_US
    sf = _write(
        tmp_path,
        "events",
        {
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": pa.array(
                np.array([base, base + 100 * SEC, base + 1000 * SEC], "int64"),
                pa.timestamp("us"),
            ),
        },
    )
    t = Q.events_user_coverage_union(sf).take_all()
    assert t[0]["covered_seconds"] == 700
    assert t[0]["span_seconds"] == 1000


def test_wasserstein_shifted_point_masses(tmp_path):
    # URGENT all at 10.00, LOW all at 13.50 -> W1 = 350 cents exactly
    sf = _write(
        tmp_path,
        "orders",
        {
            "o_totalprice": pa.array([10.0, 10.0, 13.5, 13.5], pa.float64()),
            "o_orderpriority": pa.array(
                ["1-URGENT", "1-URGENT", "5-LOW", "5-LOW"], pa.string()
            ),
        },
    )
    t = Q.orders_priority_wasserstein(sf)
    assert t["w1_cents"][0].as_py() == 350


def test_silhouette_matches_bruteforce(tmp_path):
    # two tight, well-separated clusters; compare against O(n^2) truth
    rng = np.random.default_rng(7)
    a = rng.normal(0.0, 0.01, (5, 4))
    b = rng.normal(1.0, 0.01, (5, 4))
    vecs = np.vstack([a, b]).astype(np.float32)
    lab = np.array([0] * 5 + [1] * 5, np.int32)
    sf = _write(
        tmp_path,
        "embeddings",
        {
            "vec_id": pa.array(np.arange(10, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(lab, pa.int32()),
        },
    )
    t = (
        Q.embeddings_silhouette(sf)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    q = np.floor(vecs.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    d2 = ((q[:, None, :] - q[None, :, :]) ** 2).sum(axis=2)
    for i in range(10):
        own = lab[i]
        a_i = d2[i][lab == own].sum() / (np.sum(lab == own) - 1)
        b_i = min(
            d2[i][lab == c].sum() / np.sum(lab == c) for c in (0, 1) if c != own
        )
        expect = (b_i - a_i) / max(a_i, b_i)
        assert t["silhouette"][i] == expect
    assert (t["silhouette"] > 0.9).all()
