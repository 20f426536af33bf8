"""Edge-case unit tests for the wave-B registry ops (_q12_ops): AP
controls (duplicate payment, three-way match, reference collisions) and
the lexical/agreement/estimator family.  Crafted micro-fixtures pin the
pair predicates, status gates, κ extremes, the deterministic Theil-Sen
selection, and phrase-splitting corners the synthetic corpus never
isolates."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from invoice_ocr_reconciler_ray.pipelines import queries as Q

DAY = 86_400_000_000


def _ts(days):
    return pa.array(np.array(days, "int64") * DAY, pa.timestamp("us"))


def _write(tmp, name, cols):
    pq.write_table(pa.table(cols), str(tmp / f"{name}.parquet"))


def test_double_payment_pair_predicates(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 9], pa.int64()),
            "o_orderdate": _ts([0, 10, 200, 10]),
            # 1&2: within 5% and 30d -> pair; 3: same amount, 200d away;
            # 4: matches 2 exactly but different customer
            "o_totalprice": pa.array([100.0, 104.0, 100.0, 104.0], pa.float64()),
        },
    )
    out = Q.orders_double_payment_audit(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.okey_a, r.okey_b, r.gap_days) == (1, 2, 10)
    assert (r.cents_a, r.cents_b) == (10000, 10400)


def test_three_way_match_statuses(tmp_path):
    # order 97: invoice perturbation (97 % 500 - 250 = -153); order 1: none.
    # receipt legs: order 97 receipt 50 < po/2 -> under_half;
    # order 1 receipt == po -> under.
    _write(
        tmp_path,
        "orders",
        {
            "o_orderkey": pa.array([1, 97], pa.int64()),
            "o_totalprice": pa.array([2.0, 2.0], pa.float64()),
        },
    )
    _write(
        tmp_path,
        "lineitem",
        {
            "l_orderkey": pa.array([1, 97], pa.int64()),
            "l_extendedprice": pa.array([2.0, 0.5], pa.float64()),
            "l_discount": pa.array([0.0, 0.0], pa.float64()),
            "l_tax": pa.array([0.0, 0.0], pa.float64()),
        },
    )
    out = Q.orders_three_way_match_census(str(tmp_path)).to_pandas()
    cells = {
        (r.invoice_status, r.receipt_status): (r.n_orders, r.sum_abs_invoice_delta_cents)
        for r in out.itertuples()
    }
    assert cells[("inv_exact", "under")] == (1, 0)
    assert cells[("inv_variance", "under_half")] == (1, 153)


def test_register_collisions_histogram(tmp_path):
    # keys 1..4 -> bases 1,1,2,2 with variants that all normalize equal
    _write(tmp_path, "customer", {"c_custkey": pa.array([1, 2, 3, 4], pa.int64())})
    out = Q.register_invoice_number_collisions(str(tmp_path)).to_pandas()
    assert dict(zip(out.group_size, out.n_groups)) == {2: 2}


def test_fleiss_kappa_extremes(tmp_path):
    # degenerate margins: every rater says NO on every doc -> 0/0 -> 0
    _write(tmp_path, "documents", {"text": pa.array(["a b", "c d"], pa.string())})
    out = Q.docs_gate_fleiss_kappa(str(tmp_path)).to_pandas().iloc[0]
    assert out.kappa_ppm == 0 and out.a_pairs == 12

    # perfect agreement WITH margin variance -> kappa = 1 exactly
    long = " ".join(f"w{i}" for i in range(60))  # 60 tokens, >200 chars
    _write(tmp_path, "documents", {"text": pa.array(["a b", long], pa.string())})
    out = Q.docs_gate_fleiss_kappa(str(tmp_path)).to_pandas().iloc[0]
    assert out.kappa_ppm == 1_000_000


def test_theil_sen_linear_series(tmp_path):
    # monthly cents 100, 200, 300 -> every pairwise slope = 100 c/month
    _write(
        tmp_path,
        "orders",
        {
            "o_orderdate": _ts([0, 31, 61]),
            "o_totalprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
        },
    )
    out = Q.orders_monthly_theil_sen_slope(str(tmp_path)).to_pandas().iloc[0]
    assert out.n_pairs == 3
    assert out.slope_ppm_per_month == 100 * 1_000_000


def test_ltv_tenure_offsets(tmp_path):
    _write(
        tmp_path,
        "orders",
        {
            "o_custkey": pa.array([7, 7, 9], pa.int64()),
            "o_orderdate": _ts([0, 62, 31]),  # Jan, Mar (tenure 0,2); Feb (0)
            "o_totalprice": pa.array([1.0, 2.0, 4.0], pa.float64()),
        },
    )
    out = Q.customer_ltv_by_tenure(str(tmp_path)).to_pandas().set_index("tenure_m")
    assert out.loc[0, "n_orders"] == 2 and out.loc[0, "revenue_cents"] == 500
    assert out.loc[2, "n_orders"] == 1 and out.loc[2, "revenue_cents"] == 200


def test_weighted_jaccard_known_profiles(tmp_path):
    _write(
        tmp_path,
        "documents",
        {
            "source": pa.array(["s1", "s2"], pa.string()),
            "text": pa.array(["a a b", "a b b b"], pa.string()),
        },
    )
    out = Q.docs_source_weighted_jaccard_matrix(str(tmp_path)).to_pandas().iloc[0]
    # min: a->1, b->1 = 2; max = 3 + 4 - 2 = 5
    assert out.wj_ppm == 2 * 1_000_000 // 5


def test_retry_backoff_monotone_split(tmp_path):
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "ts": pa.array(
                np.array([0, 10, 30, 0, 20, 25, 99], "int64") * 1_000_000,
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 2, 2, 2, 3], pa.int64()),
            "event_type": pa.array(["r"] * 7, pa.string()),
        },
    )
    out = Q.events_retry_backoff_census(str(tmp_path)).to_pandas().iloc[0]
    # user 1: gaps 10,20 nondecreasing; user 2: gaps 20,5 not; user 3: 1 event
    assert out.n_chains == 2 and out.n_monotone == 1


def test_rake_scores_phrase_split(tmp_path):
    # 'the' dominates -> lands in the top-5 stopword set; crafted so the
    # remaining words form known phrases
    docs = ["the quick fox the lazy dog"] + ["the x1 x2 x3 x4 x5"] * 1
    _write(tmp_path, "documents", {"text": pa.array(docs, pa.string())})
    out = Q.docs_rake_keyword_scores(str(tmp_path)).to_pandas().set_index("word")
    # stopwords = 5 most frequent: 'the' (3) + four ties broken by term asc
    assert "the" not in out.index
    # 'quick fox' is a 2-phrase if neither was elected stopword
    if "fox" in out.index:
        assert out.loc["fox", "degree"] >= out.loc["fox", "freq"]


def test_abc_xyz_matrix_marginal(tmp_path):
    _write(
        tmp_path,
        "lineitem",
        {
            "l_partkey": pa.array([1, 1, 2], pa.int64()),
            "l_quantity": pa.array([10.0, 10.0, 5.0], pa.float64()),
            "l_extendedprice": pa.array([30.0, 30.0, 40.0], pa.float64()),
            "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
        },
    )
    out = Q.lineitem_abc_xyz_matrix(str(tmp_path)).to_pandas()
    assert out.n_parts.sum() == 2
    cells = {(r.abc_class, r.xyz_class) for r in out.itertuples()}
    # part 1: 60% cumulative revenue -> A, constant demand (cv=0) -> X;
    # part 2: 100% cumulative -> C, single observation -> N
    assert ("A", "X") in cells and ("C", "N") in cells


def test_wave_b_registered_with_oracles():
    reg, osql = Q.registry(), Q.ORACLE_SQL
    for k in [
        "orders_double_payment_audit",
        "orders_three_way_match_census",
        "register_invoice_number_collisions",
        "docs_rake_keyword_scores",
        "docs_gate_fleiss_kappa",
        "customer_ltv_by_tenure",
        "orders_monthly_theil_sen_slope",
        "docs_source_weighted_jaccard_matrix",
        "events_retry_backoff_census",
        "lineitem_abc_xyz_matrix",
    ]:
        assert k in reg and k in osql
