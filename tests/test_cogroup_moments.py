"""Generic cogroup primitive and per-group moment statistics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_cogroup_sees_both_sides_and_single_side_keys(ray_session):
    from invoice_ocr_reconciler_ray.stages.cogroup import cogroup

    left = rd.from_arrow(
        pa.table(
            {"k": pa.array([1, 1, 2], pa.int64()), "v": pa.array([10, 20, 30], pa.int64())}
        )
    )
    right = rd.from_arrow(
        pa.table(
            {"k": pa.array([2, 3, 3], pa.int64()), "w": pa.array([5, 6, 7], pa.int64())}
        )
    )
    schema = pa.schema(
        [("key", pa.int64()), ("nl", pa.int64()), ("nr", pa.int64()), ("sv", pa.int64())]
    )

    def fn(key, lt: pa.Table, rt: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "key": pa.array([key.as_py()], pa.int64()),
                "nl": pa.array([lt.num_rows], pa.int64()),
                "nr": pa.array([rt.num_rows], pa.int64()),
                "sv": pa.array([pc.sum(lt["v"]).as_py() or 0], pa.int64()),
            }
        )

    out = (
        cogroup(left, right, key="k", left_cols=["v"], right_cols=["w"], fn=fn, out_schema=schema)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert out.key.tolist() == [1, 2, 3]
    assert out.nl.tolist() == [2, 1, 0]  # key 3 is right-only
    assert out.nr.tolist() == [0, 1, 2]  # key 1 is left-only
    assert out.sv.tolist() == [30, 30, 0]
    # dtype discipline: null padding must never upcast
    assert all(str(d) == "int64" for d in out.dtypes)


def test_cogroup_registry_query_matches_pandas(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import user_order_event_cogroup

    out = user_order_event_cogroup(SF).to_pandas().sort_values("key").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "value"])
    od = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    e = ev.assign(c=np.floor(ev.value * 100 + 0.5).astype(np.int64)).groupby("user_id").agg(
        n_events=("c", "size"), event_cents=("c", "sum")
    )
    o = od.assign(c=np.floor(od.o_totalprice * 100 + 0.5).astype(np.int64)).groupby(
        "o_custkey"
    ).agg(n_orders=("c", "size"), order_cents=("c", "sum"))
    want = e.join(o, how="outer").fillna(0).astype(np.int64).sort_index()
    assert out.key.tolist() == list(want.index)
    assert out.n_events.tolist() == want.n_events.tolist()
    assert out.order_cents.tolist() == want.order_cents.tolist()


def test_group_moments_match_pandas(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import lineitem_group_moments

    out = lineitem_group_moments(SF).to_pandas().set_index("l_returnflag").sort_index()
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    q = np.floor(li.l_quantity.to_numpy() + 0.5).astype(np.int64)
    p = np.floor(li.l_extendedprice.to_numpy() * 100 + 0.5).astype(np.int64)
    df = pd.DataFrame({"f": li.l_returnflag, "q": q, "p": p, "qp": q * p, "q2": q * q})
    want = df.groupby("f").agg(
        n=("q", "size"), sum_qty=("q", "sum"), sum_price_cents=("p", "sum"),
        sum_qty_price=("qp", "sum"), sum_qty_sq=("q2", "sum"),
    ).sort_index()
    assert (out.n == want.n).all()
    assert (out.sum_qty == want.sum_qty).all()
    assert (out.sum_qty_price == want.sum_qty_price).all()
    assert (out.sum_qty_sq == want.sum_qty_sq).all()
    assert str(out.sum_qty_price.dtype) == "int64"
