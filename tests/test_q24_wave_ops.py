"""Edge-case unit tests for the wave-N registry ops (_q24_ops)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_penny_allocation_census(tmp_path):
    # order 1: two lines with 0.005-dollar discounts each -> each rounds to
    # 1 cent (floor(0.5+0.5)=1), sum 2 -> even; order 2: one line 1 cent -> odd
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 1, 2], pa.int64()),
            "l_extendedprice": pa.array([0.1, 0.1, 0.1], pa.float64()),
            "l_discount": pa.array([0.05, 0.05, 0.05], pa.float64()),
        },
    )
    out = Q.lineitem_penny_allocation_audit(str(tmp_path)).to_pandas()
    cells = {(r.n_lines, r.odd_cent): (r.n_orders, r.disc_cents) for r in out.itertuples()}
    assert cells[(2, 0)] == (1, 2)
    assert cells[(1, 1)] == (1, 1)


def test_entropy_terms_formula(tmp_path):
    _write(tmp_path, "documents", {"text": pa.array(["a a b"], pa.string())})
    out = Q.docs_term_entropy_gap_terms(str(tmp_path)).to_pandas().set_index("term")
    assert out.loc["a", "nats"] == 2.0 * math.log(3 / 2)
    assert out.loc["b", "nats"] == 1.0 * math.log(3 / 1)


def test_wave_n_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in ["lineitem_penny_allocation_audit", "docs_term_entropy_gap_terms"]:
        assert k in reg and k in osql
