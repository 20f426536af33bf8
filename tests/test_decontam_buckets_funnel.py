"""N-gram decontamination, equi-depth bucketing, and the event funnel."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_ngram_decontaminate_planted(ray_session):
    """A training doc sharing one 8-word window with the benchmark (at a
    shifted alignment) is flagged with the exact interior-window count; a
    clean doc is not."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.corpus_stats import ngram_contamination

    span = " ".join(f"evalq{i}" for i in range(10))  # 10-word benchmark span
    bench = rd.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["header words here " + span])})
    )
    train = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([100, 101], pa.int64()),
                "text": pa.array(
                    ["x y z " + span + " trailing stuff afterwards",  # contaminated
                     " ".join(f"clean{i}" for i in range(30))],        # clean
                ),
            }
        )
    )
    out = (
        ngram_contamination(train, bench, window_words=8)
        .to_pandas()
        .set_index("doc_id")
    )
    # a 10-word shared span contains 10-8+1 = 3 eight-word windows
    assert out.loc[100, "n_contam_windows"] == 3
    assert bool(out.loc[100, "contaminated"])
    assert out.loc[101, "n_contam_windows"] == 0
    assert not bool(out.loc[101, "contaminated"])


def test_equidepth_buckets_are_quartiles(ray_session):
    """Bucket sizes are n/4 ± ties, boundaries match numpy quantile_disc
    semantics, and bucket is a pure function of the value."""
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_equidepth_buckets

    out = orders_equidepth_buckets(SF).to_pandas()
    cents = np.floor(
        pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
        .o_totalprice.to_numpy() * 100 + 0.5
    ).astype(np.int64)
    n = len(cents)
    srt = np.sort(cents)
    bounds = [srt[int(np.ceil(q * n)) - 1] for q in (0.25, 0.5, 0.75)]
    want_bucket = 1 + (cents[:, None] > np.asarray(bounds)[None, :]).sum(axis=1)
    got = out.sort_values("o_orderkey").bucket.to_numpy()
    want = pd.DataFrame({"k": pd.read_parquet(f"{SF}/orders.parquet").o_orderkey,
                         "b": want_bucket}).sort_values("k").b.to_numpy()
    assert (got == want).all()
    sizes = out.bucket.value_counts()
    assert sizes.min() >= n // 4 - (cents == bounds[0]).sum() - (cents == bounds[1]).sum() - (cents == bounds[2]).sum()


def test_funnel_hand_case(ray_session):
    """Hand-built users: full funnel, window-expired step, out-of-order
    steps, and missing signup."""
    import ray.data as rd

    from invoice_ocr_reconciler_ray.pipelines import queries as Q

    us = 1_000_000
    hour = 3600 * us

    def ev(uid, t_h, typ):
        return {"user_id": uid, "ts": t_h * hour, "event_type": typ}

    rows = [
        # user 1: signup@0, view@1h, purchase@2h -> stage 3
        ev(1, 0, "signup"), ev(1, 1, "view"), ev(1, 2, "purchase"),
        # user 2: signup@0, view@50h (outside 48h window) -> stage 1
        ev(2, 0, "signup"), ev(2, 50, "view"), ev(2, 51, "purchase"),
        # user 3: view BEFORE signup only -> stage 1 (order matters)
        ev(3, 5, "signup"), ev(3, 1, "view"),
        # user 4: no signup -> stage 0
        ev(4, 1, "view"), ev(4, 2, "purchase"),
        # user 5: purchase exactly at view's ts (strict >) -> stage 2
        ev(5, 0, "signup"), ev(5, 1, "view"), ev(5, 1, "purchase"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r["event_type"] for r in rows]),
        }
    )
    import os, tempfile
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="funnel_")
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = Q.events_funnel_stages(d).to_pandas().set_index("user_id").funnel_stage
    assert out.loc[1] == 3
    assert out.loc[2] == 1
    assert out.loc[3] == 1
    assert out.loc[4] == 0
    assert out.loc[5] == 2
