"""Left-outer aggregate, pivot, and per-group value top-k — analytic tests
(the sf0.01 oracle comparison is the driver's job; these pin the invariants
a hash-compare can miss: zero preservation, prune safety across blocks)."""

import pyarrow as pa
import ray.data as rd


def test_customer_order_counts_keeps_zeros(ray_session, tmp_path):
    cust = pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())})
    orders = pa.table({"o_custkey": pa.array([1, 1, 3], pa.int64())})
    import pyarrow.parquet as pq

    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import customer_order_counts

    out = (
        customer_order_counts(str(tmp_path))
        .to_pandas().set_index("c_custkey").n_orders.sort_index()
    )
    assert out.tolist() == [2, 0, 1, 0]
    assert str(out.dtype) == "int64"


def test_per_lang_topk_prune_is_lossless(ray_session, tmp_path):
    """The block-local top-3 pre-prune must never drop a global top-3 row —
    each lang's global winners are scattered one-per-file so every input
    block sees only a slice of the truth."""
    import os

    import pyarrow.parquet as pq

    from invoice_ocr_reconciler_ray.pipelines.queries import docs_per_lang_longest

    os.makedirs(tmp_path / "documents.parquet")
    # lang 'a': winners (n_chars 100, 99, 98) placed in 3 different files,
    # decoys beside them; lang 'b': a 3-way tie broken by doc_id
    for blk in range(3):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([blk, 100 + blk, 200 + blk], pa.int64()),
                    "lang": ["a", "a", "b"],
                    "n_chars": pa.array([100 - blk, 10 + blk, 50], pa.int64()),
                }
            ),
            tmp_path / "documents.parquet" / f"part-{blk}.parquet",
        )
    out = docs_per_lang_longest(str(tmp_path)).to_pandas()
    a = out[out.lang == "a"].sort_values("rk")
    assert a.doc_id.tolist() == [0, 1, 2]
    assert a.n_chars.tolist() == [100, 99, 98]
    b = out[out.lang == "b"].sort_values("rk")
    assert b.doc_id.tolist() == [200, 201, 202]  # 3-way tie → doc_id ASC


def test_events_pivot_partial_merge(ray_session, tmp_path):
    import pyarrow.parquet as pq

    events = pa.table(
        {
            "user_id": pa.array([0, 10, 20, 1, 11, 0], pa.int64()),
            "event_type": ["click", "click", "view", "error", "signup", "purchase"],
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_pivot_types

    out = events_pivot_types(str(tmp_path)).to_pandas().set_index("bucket").sort_index()
    assert out.loc[0].tolist() == [2, 0, 1, 0, 1]  # users 0,10,20 fold to bucket 0
    assert out.loc[1].tolist() == [0, 1, 0, 1, 0]
    assert list(out.columns) == ["n_click", "n_error", "n_purchase", "n_signup", "n_view"]


def test_events_user_cumsum_and_deltas(ray_session, tmp_path):
    """Running totals restart per key and follow (ts, event_id) order; lag
    deltas are null on each key's first event — int-exact on both."""
    import pandas as pd
    import pyarrow.parquet as pq

    from invoice_ocr_reconciler_ray.pipelines.queries import (
        events_time_deltas,
        events_user_cumsum,
    )

    t0 = pd.Timestamp("2024-01-01")
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
            "ts": pa.array(
                [t0, t0, t0 + pd.Timedelta(seconds=5), t0, t0 + pd.Timedelta(seconds=2)]
            ),
            "value": pa.array([1.25, 2.0, 3.0, 10.0, 0.004], pa.float64()),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")

    cs = events_user_cumsum(str(tmp_path)).to_pandas().set_index("event_id")
    # 1.25 → 125 cents, then +200, +300; user 8 restarts
    assert cs.loc[1].cum_cents == 125  # tie on ts → event_id order
    assert cs.loc[2].cum_cents == 325
    assert cs.loc[3].cum_cents == 625
    assert cs.loc[4].cum_cents == 1000
    assert cs.loc[5].cum_cents == 1000  # 0.004 → 0 cents
    assert str(cs.cum_cents.dtype) == "int64"

    d = events_time_deltas(str(tmp_path)).to_pandas().set_index("event_id")
    assert pd.isna(d.loc[1].delta_us) and pd.isna(d.loc[4].delta_us)
    assert d.loc[2].delta_us == 0  # same-ts tie, next in event_id order
    assert d.loc[3].delta_us == 5_000_000
    assert d.loc[5].delta_us == 2_000_000


def test_events_user_type_diversity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from invoice_ocr_reconciler_ray.pipelines.queries import events_user_type_diversity

    events = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "event_type": ["click", "click", "view", "error"],
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    out = events_user_type_diversity(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.loc[1].n_types == 2 and out.loc[2].n_types == 1


def test_bucketed_join_colocated(ray_session, tmp_path):
    """write_bucketed + bucketed_join == plain join, including buckets that
    are empty on one or both sides (schema files keep readers alive)."""
    import numpy as np
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.bucketing import (
        bucket_of,
        bucketed_join,
        write_bucketed,
    )

    n_buckets = 16  # >> distinct keys → some buckets provably empty
    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 1, 2, 3], pa.int64()),
                  "lv": pa.array([10, 11, 20, 30], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k2": pa.array([1, 2, 4], pa.int64()),
                  "rv": ["a", "b", "d"]})
    )
    write_bucketed(left, key_col="k", n_buckets=n_buckets, out_dir=str(tmp_path / "L"))
    write_bucketed(right, key_col="k2", n_buckets=n_buckets, out_dir=str(tmp_path / "R"))
    out = bucketed_join(
        str(tmp_path / "L"), str(tmp_path / "R"),
        n_buckets=n_buckets, key_left="k", key_right="k2",
    ).to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    assert out[["k", "lv", "rv"]].values.tolist() == [
        [1, 10, "a"], [1, 11, "a"], [2, 20, "b"]
    ]
    # alignment property: identical keys hash to identical buckets
    ks = np.array([1, 2, 3, 4], dtype=np.int64)
    assert (bucket_of(ks, n_buckets) == bucket_of(ks.copy(), n_buckets)).all()


def test_rollup_levels_are_consistent(ray_session):
    """The finest ROLLUP level must re-sum exactly to the year subtotals
    and the grand total (int64 exactness across levels), and sentinels /
    grouping bitmask must follow the GROUPING() convention."""
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_rollup_revenue

    out = orders_rollup_revenue("/root/testdata/sf0.001")
    fin = out[out.lvl == 0]
    yr = out[out.lvl == 1].set_index("yr")
    assert (out[out.lvl == 1].prio == "ALL").all()
    for y, g in fin.groupby("yr"):
        assert yr.loc[y, "sum_total_cents"] == g.sum_total_cents.sum()
        assert yr.loc[y, "n"] == g.n.sum()
    grand = out[out.lvl == 3]
    assert len(grand) == 1 and int(grand.yr.iloc[0]) == -1
    assert int(grand.sum_total_cents.iloc[0]) == fin.sum_total_cents.sum()
    assert {str(t) for t in out[["yr", "sum_total_cents", "n", "lvl"]].dtypes} == {"int64"}


def test_moment_stats_merge_is_block_invariant(ray_session, tmp_path):
    """Sufficient statistics are associative: one block vs many blocks must
    produce identical int64 sums, and the sums must equal a numpy ground
    truth computed on the raw rows."""
    import numpy as np
    import pyarrow.parquet as pq

    rng = np.random.RandomState(3)
    n = 5000
    tbl = pa.table(
        {
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n)),
            "l_quantity": pa.array(rng.randint(1, 51, n).astype("float64")),
            "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n), 2)),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import lineitem_moment_stats

    out = lineitem_moment_stats(str(tmp_path)).to_pandas().set_index("l_returnflag").sort_index()
    q = np.floor(tbl["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    p = np.floor(tbl["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    flags = tbl["l_returnflag"].to_numpy(zero_copy_only=False)
    for f in "ANR":
        m = flags == f
        assert out.loc[f, "n"] == m.sum()
        assert out.loc[f, "sum_q"] == q[m].sum()
        assert out.loc[f, "sum_qprice_cents"] == (q[m] * p[m]).sum()
        assert out.loc[f, "sum_q2"] == (q[m] * q[m]).sum()
    assert {str(t) for t in out.dtypes} == {"int64"}


def test_type_setops_classification(ray_session, tmp_path):
    """INTERSECT/EXCEPT classification on a hand-built table: type 'a' on
    both sides, 'b' only even users, 'c' only odd."""
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_type": pa.array(["a", "a", "b", "c", "a"]),
            "user_id": pa.array([2, 3, 4, 5, 7], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_type_setops

    out = events_type_setops(str(tmp_path)).set_index("event_type").setop
    assert out["a"] == "common" and out["b"] == "even_only" and out["c"] == "odd_only"
