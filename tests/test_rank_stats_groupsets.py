"""global_value_rank_stats tie semantics + GROUPING SETS parity (round 4)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from invoice_ocr_reconciler_ray.stages.rank import global_value_rank_stats


def test_rank_stats_heavy_ties_match_sequential(ray_session):
    # heavy-tie synthetic: values 0..9 repeated, unique ids
    n = 500
    vals = np.arange(n) % 10
    ids = np.arange(n)
    ds = rd.from_arrow(
        pa.table({"v": pa.array(vals, pa.int64()), "id": pa.array(ids, pa.int64())})
    ).repartition(8)
    out = (
        global_value_rank_stats(ds, value_col="v", id_col="id", n_buckets=16)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # sequential RANK(): ties share the first row number of their value
    order = np.lexsort((ids, vals))
    sv = vals[order]
    rank_seq = np.searchsorted(sv, sv, side="left") + 1
    n_le_seq = np.searchsorted(sv, sv, side="right")
    seq = pd.DataFrame({"id": ids[order], "rnk": rank_seq, "n_le": n_le_seq})
    seq = seq.sort_values("id").reset_index(drop=True)
    assert (out["rnk"].to_numpy() == seq["rnk"].to_numpy()).all()
    assert (out["n_le"].to_numpy() == seq["n_le"].to_numpy()).all()
    assert (out["n_total"] == n).all()
    # every row of a tie group shares the rank; group sizes are exact
    g = out.groupby("rnk").size()
    assert (g.index + g.values - 1 == out.groupby("rnk")["n_le"].max()).all()


def test_grouping_sets_matches_pandas(ray_session):
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_grouping_sets

    sf = "/root/testdata/sf0.001"
    out = orders_grouping_sets(sf).to_pandas()
    import pyarrow.parquet as pq

    o = pq.read_table(
        f"{sf}/orders.parquet", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    ).to_pandas()
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")

    by_s = o.groupby("o_orderstatus")["cents"].agg(["sum", "size"])
    by_p = o.groupby("o_orderpriority")["cents"].agg(["sum", "size"])

    s_rows = out[out["o_orderpriority"].isna() & out["o_orderstatus"].notna()]
    p_rows = out[out["o_orderstatus"].isna() & out["o_orderpriority"].notna()]
    t_rows = out[out["o_orderstatus"].isna() & out["o_orderpriority"].isna()]
    assert len(s_rows) == len(by_s) and len(p_rows) == len(by_p) and len(t_rows) == 1
    for st, r in by_s.iterrows():
        row = s_rows[s_rows["o_orderstatus"] == st].iloc[0]
        assert row["rev_cents"] == r["sum"] and row["n_orders"] == r["size"]
    for pr, r in by_p.iterrows():
        row = p_rows[p_rows["o_orderpriority"] == pr].iloc[0]
        assert row["rev_cents"] == r["sum"] and row["n_orders"] == r["size"]
    assert t_rows.iloc[0]["rev_cents"] == o["cents"].sum()
    assert t_rows.iloc[0]["n_orders"] == len(o)
