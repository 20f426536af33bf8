"""Edge-case unit tests for the round-4 continuation-wave-2 registry ops —
crafted micro-fixtures exercising the kernel branches the synthetic-table
oracles never hit (tie-breaking in argmax picks, degenerate splits, empty
duplicate sets, circular wraparound).  The full-scale correctness gate is
the DuckDB oracle sweep; these pin the algorithmic corner behavior."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

HOUR = 3_600_000_000
DAY = 86_400_000_000


def _write_orders(tmp, *, o_orderkey, o_orderdate, o_totalprice, o_custkey=None):
    n = len(o_orderkey)
    cols = {
        "o_orderkey": pa.array(o_orderkey, pa.int64()),
        "o_custkey": pa.array(o_custkey or [1] * n, pa.int64()),
        "o_orderstatus": pa.array(["O"] * n, pa.string()),
        "o_totalprice": pa.array(o_totalprice, pa.float64()),
        "o_orderdate": pa.array(o_orderdate, pa.date32()),
        "o_orderpriority": pa.array(["1-URGENT"] * n, pa.string()),
    }
    pq.write_table(pa.table(cols), str(tmp / "orders.parquet"))
    return str(tmp)


def _write_part(tmp, *, p_retailprice, p_brand=None, p_name=None):
    n = len(p_retailprice)
    cols = {
        "p_partkey": pa.array(list(range(1, n + 1)), pa.int64()),
        "p_name": pa.array(p_name or ["red bolt"] * n, pa.string()),
        "p_brand": pa.array(p_brand or ["Brand#1"] * n, pa.string()),
        "p_type": pa.array(["t"] * n, pa.string()),
        "p_size": pa.array([1] * n, pa.int64()),
        "p_retailprice": pa.array(p_retailprice, pa.float64()),
    }
    pq.write_table(pa.table(cols), str(tmp / "part.parquet"))
    return str(tmp)


import datetime as _dt


def _d(s):
    return _dt.date.fromisoformat(s)


def test_otsu_split_tie_prefers_smallest(tmp_path):
    # mirror-symmetric {0, 5, 10}: splits after 0 and after 5 score
    # identically (225/2); the smallest split value must win.
    sf = _write_part(tmp_path, p_retailprice=[0.0, 5.0, 10.0])
    out = Q.part_price_otsu_split(sf).to_pandas()
    assert out.split_dollar.tolist() == [0]
    assert out.n1.tolist() == [1] and out.n2.tolist() == [2]
    assert out.sum1_dollars.tolist() == [0] and out.sum2_dollars.tolist() == [15]


def test_otsu_split_picks_true_gap(tmp_path):
    sf = _write_part(tmp_path, p_retailprice=[1.0, 2.0, 3.0, 100.0, 101.0])
    out = Q.part_price_otsu_split(sf).to_pandas()
    assert out.split_dollar.tolist() == [3]


def test_seasonal_peak_shift_wraps_circularly(tmp_path):
    # year 2000 peak December, year 2001 peak January → shift 1 not 11.
    sf = _write_orders(
        tmp_path,
        o_orderkey=[1, 2, 3, 4],
        o_orderdate=[_d("2000-12-05"), _d("2000-03-01"), _d("2001-01-09"), _d("2001-06-01")],
        o_totalprice=[100.0, 10.0, 100.0, 10.0],
    )
    out = Q.orders_seasonal_peak_shift_census(sf).to_pandas()
    assert out.peak1.tolist() == [12] and out.peak2.tolist() == [1]
    assert out.circ_shift.tolist() == [1]


def test_merkle_root_is_xor_of_pages(tmp_path):
    sf = _write_orders(
        tmp_path,
        o_orderkey=[1, 2, 4097, 4098],
        o_orderdate=[_d("2000-01-01")] * 4,
        o_totalprice=[1.0, 2.0, 3.0, 4.0],
    )
    out = Q.orders_page_checksum_merkle(sf).to_pandas().sort_values("page")
    root = out[out.page == -1]
    pages = out[out.page >= 0]
    assert int(root.checksum.iloc[0]) == int(
        np.bitwise_xor.reduce(pages.checksum.to_numpy(dtype=np.int64))
    )
    assert int(root.n_rows.iloc[0]) == len(pages)
    assert pages.n_rows.tolist() == [2, 2]


def test_concordance_census_partition_identity(tmp_path):
    rng = np.random.default_rng(7)
    n = 40
    q = rng.integers(1, 6, n)
    d = rng.integers(0, 4, n) / 100.0
    cols = {
        "l_orderkey": pa.array(list(range(n)), pa.int64()),
        "l_partkey": pa.array([1] * n, pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int64()),
        "l_quantity": pa.array(q.astype(float), pa.float64()),
        "l_extendedprice": pa.array([10.0] * n, pa.float64()),
        "l_discount": pa.array(d, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array([_d("2000-01-01")] * n, pa.date32()),
    }
    pq.write_table(pa.table(cols), str(tmp_path / "lineitem.parquet"))
    out = Q.lineitem_qty_discount_concordance_census(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert (
        r.n_conc + r.n_disc + r.n_tie_qty_only + r.n_tie_disc_only + r.n_tie_both
        == r.n_pairs
        == n * (n - 1) // 2
    )


def test_friedman_rank_x2_tie_convention(tmp_path):
    # one complete month, two weekdays tied on revenue: avg rank ×2 of a
    # 2-way tie at the bottom of 7 = 2*1 + 2 - 1 + ... verify directly.
    days = ["2021-03-01", "2021-03-02", "2021-03-03", "2021-03-04",
            "2021-03-05", "2021-03-06", "2021-03-07"]
    # Mon..Sun; Mon and Tue tie lowest, rest strictly increasing
    prices = [1.0, 1.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    sf = _write_orders(
        tmp_path,
        o_orderkey=list(range(1, 8)),
        o_orderdate=[_d(x) for x in days],
        o_totalprice=prices,
    )
    out = Q.orders_weekday_friedman_ranks(sf).to_pandas().sort_values("dow")
    # tie group {Mon,Tue}: avg rank 1.5 → ×2 = 3 each; Wed..Sun ranks 3..7 → ×2
    assert out.rank_sum_x2.tolist() == [3, 3, 6, 8, 10, 12, 14]
    assert out.n_months.unique().tolist() == [1]


def test_median_polish_exact_additive_grid(tmp_path):
    # counts laid out additively: n(dow, hour) = 10*dow + hour exercises a
    # polish whose residuals after one row+col sweep are all zero.
    eid, ts, uid = [], [], []
    k = 0
    base = 4 * DAY  # 1970-01-05 is a Monday → dow alignment deterministic
    for dow in range(7):
        for hour in range(24):
            for _ in range(10 * (dow + 1) + hour + 1):
                k += 1
                eid.append(k)
                ts.append(base + dow * DAY + hour * HOUR + (k % 60))
                uid.append(1)
    cols = {
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(np.array(ts, "int64"), pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["a"] * len(eid), pa.string()),
        "value": pa.array([1.0] * len(eid), pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(eid), pa.string()),
    }
    pq.write_table(pa.table(cols), str(tmp_path / "events.parquet"))
    out = Q.events_dow_hour_median_polish(str(tmp_path)).to_pandas()
    assert (out.residual == 0).all()
    assert len(out) == 168
    # row effects recover the 10*(dow+1) + median-hour structure shift
    assert (out.n == out.row_eff + out.col_eff + out.residual).all()


def test_butterfly_count_two_squares(tmp_path):
    # customers {1,2} each buy from suppliers {1,2} → exactly 1 butterfly;
    # customer 3 buys from supplier 1 only (adds edges, no butterfly).
    li = {
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_partkey": pa.array([1] * 5, pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 1], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 2, 1], pa.int64()),
        "l_quantity": pa.array([1.0] * 5, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 5, pa.float64()),
        "l_discount": pa.array([0.0] * 5, pa.float64()),
        "l_tax": pa.array([0.0] * 5, pa.float64()),
        "l_returnflag": pa.array(["N"] * 5, pa.string()),
        "l_linestatus": pa.array(["O"] * 5, pa.string()),
        "l_shipdate": pa.array([_d("2000-01-01")] * 5, pa.date32()),
    }
    pq.write_table(pa.table(li), str(tmp_path / "lineitem.parquet"))
    _write_orders(
        tmp_path,
        o_orderkey=[1, 2, 3],
        o_orderdate=[_d("2000-01-01")] * 3,
        o_totalprice=[1.0] * 3,
        o_custkey=[1, 2, 3],
    )
    out = Q.purchase_graph_butterfly_count(str(tmp_path)).to_pandas()
    assert out.n_butterflies.tolist() == [1]
    assert out.n_edges.tolist() == [5]
    assert out.n_customers.tolist() == [3] and out.n_suppliers.tolist() == [2]
