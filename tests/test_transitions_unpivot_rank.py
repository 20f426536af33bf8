"""Transition matrix, unpivot/melt, group-relative filter, RANK-ties top-k,
promo share, dow×hour profile — analytic tests pinning the invariants the
driver's hash-compare can miss: tie semantics at the rank boundary, prune
safety across blocks, integer-exact mean comparison, inner-join row drops."""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _ts(*args):
    return dt.datetime(*args)


def test_user_transitions_match_bruteforce(ray_session, tmp_path):
    # user 1: a->b->b->c ; user 2: c->a ; user 3: single event (no pairs).
    # event 5's ts ties event 4's — order falls back to event_id.
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
            "ts": pa.array(
                [
                    _ts(2026, 1, 1, 0),
                    _ts(2026, 1, 1, 1),
                    _ts(2026, 1, 1, 2),
                    _ts(2026, 1, 1, 3),
                    _ts(2026, 1, 1, 0),
                    _ts(2026, 1, 1, 0),
                    _ts(2026, 1, 1, 0),
                ],
                pa.timestamp("us"),
            ),
            "event_type": pa.array(["a", "b", "b", "c", "c", "a", "a"]),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_user_transitions

    out = events_user_transitions(str(tmp_path)).to_pandas()
    got = {
        (r.from_type, r.to_type): r.n_trans for r in out.itertuples(index=False)
    }
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "c"): 1, ("c", "a"): 1}
    assert str(out.n_trans.dtype) == "int64"


def test_unpivot_measures_reassemble(ray_session, tmp_path):
    li = pa.table(
        {
            "l_returnflag": pa.array(["A", "A", "R"]),
            "l_quantity": pa.array([1.0, 2.0, 3.0]),
            "l_extendedprice": pa.array([10.50, 20.25, 0.10]),
            "l_discount": pa.array([0.05, 0.0, 0.10]),
        }
    )
    pq.write_table(li, tmp_path / "lineitem.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import lineitem_unpivot_measures

    out = lineitem_unpivot_measures(str(tmp_path)).to_pandas()
    got = {
        (r.l_returnflag, r.measure): (r.value_cents, r.n_values)
        for r in out.itertuples(index=False)
    }
    assert got == {
        ("A", "l_quantity"): (300, 2),
        ("A", "l_extendedprice"): (3075, 2),
        ("A", "l_discount"): (5, 2),
        ("R", "l_quantity"): (300, 1),
        ("R", "l_extendedprice"): (10, 1),
        ("R", "l_discount"): (10, 1),
    }
    # every measure row-count equals the input cardinality of its flag
    assert set(out.n_values) == {2, 1}


def test_parts_above_brand_avg_is_strictly_above(ray_session, tmp_path):
    # brand X: mean is exactly 2.00 — the 2.00 row must NOT pass (strict >);
    # brand Y: all equal — nothing passes.
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "p_name": pa.array(["a", "b", "c", "d", "e"]),
            "p_brand": pa.array(["X", "X", "X", "Y", "Y"]),
            "p_retailprice": pa.array([1.00, 2.00, 3.00, 0.10, 0.10]),
        }
    )
    pq.write_table(part, tmp_path / "part.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import parts_above_brand_avg

    out = parts_above_brand_avg(str(tmp_path)).to_pandas()
    assert out.p_partkey.tolist() == [3]
    assert out.price_cents.tolist() == [300]


def test_rank_ties_topk_keeps_boundary_ties(ray_session, tmp_path):
    # priority 'P': prices 9,8,7,6,5,5,5,1 — rank()<=5 keeps BOTH extra 5s
    # (7 rows out), scattered across three files so the block-local prune
    # must forward every boundary tie it sees.
    os.makedirs(tmp_path / "orders.parquet")
    rows = [
        (1, 9.0), (2, 8.0), (3, 7.0), (4, 6.0),
        (5, 5.0), (6, 5.0), (7, 5.0), (8, 1.0),
    ]
    for blk in range(3):
        chunk = rows[blk::3]
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([k for k, _ in chunk], pa.int64()),
                    "o_orderpriority": pa.array(["P"] * len(chunk)),
                    "o_totalprice": pa.array([p for _, p in chunk]),
                }
            ),
            tmp_path / "orders.parquet" / f"part-{blk}.parquet",
        )
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_rank_ties_topk

    out = (
        orders_rank_ties_topk(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")
    )
    assert out.o_orderkey.tolist() == [1, 2, 3, 4, 5, 6, 7]
    got = dict(zip(out.o_orderkey, out.rnk))
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 5, 7: 5}


def test_promo_share_drops_unknown_partkeys(ray_session, tmp_path):
    part = pa.table(
        {
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_type": pa.array(["PROMO", "LARGE"]),
        }
    )
    li = pa.table(
        {
            # partkey 99 exists in no part row → inner-join drop
            "l_partkey": pa.array([1, 2, 99], pa.int64()),
            "l_extendedprice": pa.array([100.0, 200.0, 500.0]),
            "l_discount": pa.array([0.10, 0.0, 0.0]),
            "l_shipdate": pa.array(
                [_ts(2026, 3, 1), _ts(2026, 3, 2), _ts(2026, 3, 3)],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(part, tmp_path / "part.parquet")
    pq.write_table(li, tmp_path / "lineitem.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import promo_revenue_share

    out = promo_revenue_share(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.ym, r.promo_cents, r.total_cents) == (202603, 9000, 29000)


def test_dow_hour_profile_iso_weekday(ray_session, tmp_path):
    # 2026-08-17 is a Monday → ISO dow 1; 2026-08-23 a Sunday → 7.
    events = pa.table(
        {
            "ts": pa.array(
                [_ts(2026, 8, 17, 13, 5), _ts(2026, 8, 23, 0, 59)],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.25, 2.00]),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_dow_hour_profile

    out = events_dow_hour_profile(str(tmp_path)).to_pandas().sort_values("dow")
    assert list(zip(out.dow, out.hour, out.value_cents, out.n_events)) == [
        (1, 13, 125, 1),
        (7, 0, 200, 1),
    ]


def test_user_type_sequence_order_and_cap(ray_session, tmp_path):
    # 25 events: first 20 by (ts, event_id) make the sequence; n_events = 25.
    n = 25
    events = pa.table(
        {
            "event_id": pa.array(list(range(n)), pa.int64()),
            "user_id": pa.array([1] * n, pa.int64()),
            # all same ts → order falls back to event_id
            "ts": pa.array([_ts(2026, 1, 1)] * n, pa.timestamp("us")),
            "event_type": pa.array([f"t{i}" for i in range(n)]),
        }
    )
    pq.write_table(events, tmp_path / "events.parquet")
    from invoice_ocr_reconciler_ray.pipelines.queries import events_user_type_sequence

    out = events_user_type_sequence(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.type_seq == ">".join(f"t{i}" for i in range(20))
    assert r.n_events == 25
