"""2-D skyline kernel + distributed op (round 4): lossless block prune."""

import numpy as np

from invoice_ocr_reconciler_ray.pipelines.queries import _skyline_2d, orders_skyline

SF = "/root/testdata/sf0.001"


def test_skyline_kernel_matches_brute_force():
    rng = np.random.RandomState(7)
    for _ in range(60):
        n = rng.randint(1, 120)
        p = rng.randint(0, 12, n).astype(np.int64)
        d = rng.randint(0, 12, n).astype(np.int64)
        keep = _skyline_2d(p, d)
        bf = np.ones(n, bool)
        for i in range(n):
            for j in range(n):
                if (
                    p[j] >= p[i]
                    and d[j] >= d[i]
                    and (p[j] > p[i] or d[j] > d[i])
                ):
                    bf[i] = False
                    break
        assert (keep == bf).all()
    # duplicate identical points: neither strictly dominates → both kept
    keep = _skyline_2d(np.array([5, 5], np.int64), np.array([3, 3], np.int64))
    assert keep.all()


def test_orders_skyline_is_undominated_and_maximal(ray_session):
    import pyarrow.parquet as pq

    out = orders_skyline(SF).to_pandas()
    o = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus"],
    ).to_pandas()
    f = o[o["o_orderstatus"] == "F"].copy()
    f["price_cents"] = np.floor(f["o_totalprice"] * 100 + 0.5).astype("int64")
    f["epoch_day"] = (
        f["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
    )
    p = f["price_cents"].to_numpy()
    d = f["epoch_day"].to_numpy()
    bf = _skyline_2d(p, d)
    exp = f[bf].sort_values(["price_cents", "o_orderkey"], ascending=[False, True])
    assert out["o_orderkey"].tolist() == exp["o_orderkey"].tolist()
    assert out["price_cents"].tolist() == exp["price_cents"].tolist()
    assert out["epoch_day"].tolist() == exp["epoch_day"].tolist()
