"""Edge-case unit tests for the wave-F registry ops (_q16_ops): the
composed AP-close report legs and the deterministic bootstrap weights."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.array(days, "int64") * DAY, pa.timestamp("us"))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_ap_close_composes_three_legs(tmp_path):
    # one variance order (key 97), one duplicate-payment pair, one 90+
    # register row (custkey 2 -> due 2024-03-15, >90 days before 2024-07-01)
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([97, 1, 2], pa.int64()),
            "o_custkey": pa.array([5, 7, 7], pa.int64()),
            "o_orderdate": _ts([0, 10, 15]),
            "o_totalprice": pa.array([2.0, 100.0, 101.0], pa.float64()),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([97, 1, 2], pa.int64()),
            "l_extendedprice": pa.array([2.0, 100.0, 101.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
            "l_tax": pa.array([0.0, 0.0, 0.0], pa.float64()),
        },
    )
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array([2], pa.int64()),
            "c_name": pa.array(["Customer#2"], pa.string()),
            "c_acctbal": pa.array([50.0], pa.float64()),
        },
    )
    out = Q.ap_close_audit_report(str(tmp_path)).to_pandas().set_index("step")
    assert out.loc["three_way_invoice_variance", "n_flagged"] == 1
    assert out.loc["three_way_invoice_variance", "cents_at_risk"] == 153
    assert out.loc["duplicate_payment_pairs", "n_flagged"] == 1
    assert out.loc["duplicate_payment_pairs", "cents_at_risk"] == 10000
    assert out.loc["register_overdue_90plus", "n_flagged"] == 1
    assert out.loc["register_overdue_90plus", "cents_at_risk"] == 5000


def test_bootstrap_weights_replay(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2], pa.int64()),
            "o_totalprice": pa.array([1.0, 2.0], pa.float64()),
        },
    )
    out = Q.orders_hash_bootstrap_replicates(str(tmp_path)).to_pandas()
    assert len(out) == 16
    for b in (0, 7):
        w1 = int(hashlib.md5(f"1:{b}".encode()).hexdigest()[:8], 16) % 8
        w2 = int(hashlib.md5(f"2:{b}".encode()).hexdigest()[:8], 16) % 8
        row = out[out.b == b].iloc[0]
        assert row.n_weight == w1 + w2
        assert row.weighted_cents == w1 * 100 + w2 * 200


def test_wave_f_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in ["ap_close_audit_report", "orders_hash_bootstrap_replicates"]:
        assert k in reg and k in osql
