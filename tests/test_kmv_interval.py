"""KMV quantile sketch, grouped HLL, and the interval-overlap join."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_kmv_merge_law_and_layout_invariance():
    """Merging partials over ANY split equals the bottom-k of the whole —
    bit-identical, including duplicate-id idempotence."""
    from invoice_ocr_reconciler_ray.functions.sketches import kmv_merge, kmv_partial

    rng = np.random.RandomState(3)
    ids = rng.permutation(50_000).astype(np.int64)
    vals = rng.randn(50_000)
    whole = kmv_merge([kmv_partial(ids, vals, 256)], 256)
    for nsplit in (3, 7):
        cuts = np.array_split(np.arange(len(ids)), nsplit)
        parts = [kmv_partial(ids[c], vals[c], 256) for c in cuts]
        # feed one partial twice — idempotent merge must collapse it
        merged = kmv_merge(parts + [parts[0]], 256)
        for a, b in zip(whole, merged):
            assert np.array_equal(a, b)


def test_kmv_quantile_rank_error_bound():
    """On 100k uniform values with k=1024 the rank error of each estimated
    quantile is within 5/sqrt(k) (~15.6%% is the loose 5-sigma bound; typical
    is ~1.5%%) — and with k >= n the estimate is EXACT quantile_disc."""
    from invoice_ocr_reconciler_ray.functions.sketches import (
        kmv_merge,
        kmv_partial,
        kmv_quantiles,
    )

    rng = np.random.RandomState(11)
    n = 100_000
    ids = np.arange(n, dtype=np.int64)
    vals = rng.uniform(0, 1, n)
    srt = np.sort(vals)
    _, _, sample = kmv_merge([kmv_partial(ids, vals, 1024)], 1024)
    for q in (0.1, 0.5, 0.9):
        est = kmv_quantiles(sample, [q])[0]
        rank = np.searchsorted(srt, est) / n
        assert abs(rank - q) < 5 / np.sqrt(1024), (q, rank)
    # k >= n → exact
    _, _, full = kmv_merge([kmv_partial(ids[:500], vals[:500], 1024)], 1024)
    s500 = np.sort(vals[:500])
    for q in (0.25, 0.5, 0.75):
        want = s500[max(1, int(np.ceil(q * 500))) - 1]
        assert kmv_quantiles(full, [q])[0] == want


def test_kmv_stage_matches_exact_at_small_n(ray_session):
    """At sf0.001 (1500 orders < k=1024? no — 1500 > 1024) the stage's
    median estimate is within the rank bound of the exact median."""
    from invoice_ocr_reconciler_ray.pipelines.queries import orders_price_quantile_sketch

    out = orders_price_quantile_sketch(SF).to_pandas().set_index("q")
    cents = np.sort(
        np.floor(
            pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
            .o_totalprice.to_numpy() * 100 + 0.5
        ).astype(np.int64)
    )
    n = len(cents)
    for q in (0.25, 0.5, 0.75, 0.95):
        est = out.loc[q, "value_est"]
        rank = np.searchsorted(cents, est) / n
        assert abs(rank - q) < 5 / np.sqrt(1024), (q, rank)


def test_grouped_hll_within_bound(ray_session):
    """Per-user approximate distinct event types: every estimate within
    ±2 of the exact count (tiny cardinalities sit in the linear-counting
    regime), and the key set is exactly the user set."""
    from invoice_ocr_reconciler_ray.pipelines.queries import events_user_type_hll

    out = events_user_type_hll(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    exact = ev.groupby("user_id").event_type.nunique()
    assert sorted(out.index) == sorted(exact.index)
    err = (out.approx_distinct - exact.loc[out.index]).abs()
    assert (err <= 2).all()


def test_interval_overlap_matches_bruteforce(ray_session):
    """The two-searchsorted kernel equals the O(n^2) pairwise check."""
    from invoice_ocr_reconciler_ray.pipelines.queries import events_interval_overlap

    out = events_interval_overlap(SF).to_pandas().set_index("event_id").n_overlaps
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    s = ev.ts.astype("int64").to_numpy()
    e = s + (ev.event_id.to_numpy() % 120 + 10) * 60 * 1_000_000
    uid = ev.user_id.to_numpy()
    eid = ev.event_id.to_numpy()
    for u in np.unique(uid)[:10]:  # brute-force a subset of users
        m = uid == u
        su, eu, idu = s[m], e[m], eid[m]
        for i in range(len(su)):
            n = int(
                ((su <= eu[i]) & (eu >= su[i])).sum() - 1
            )
            assert out.loc[idu[i]] == n


def test_grouped_kmv_exact_when_k_covers_groups_and_bounded_otherwise(ray_session):
    """Per-key KMV quantiles: with k >= group size the result equals
    numpy quantile_disc per group exactly; with a small k every estimate
    stays within a 5-sigma rank bound; both are block-layout-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from invoice_ocr_reconciler_ray.stages.sketch_stats import (
        grouped_approx_quantiles_kmv,
    )

    rng = np.random.RandomState(5)
    n = 3000
    keys = rng.randint(0, 3, n).astype(np.int64)
    vals = rng.randint(0, 100000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"k": keys, "id": ids, "v": vals})
    qs = [0.25, 0.5, 0.75]

    def qdisc(a, q):
        s = np.sort(a)
        return s[max(1, int(np.ceil(q * len(s)))) - 1]

    for parts in (1, 7):
        out = (
            grouped_approx_quantiles_kmv(
                rd.from_arrow(t).repartition(parts),
                key_col="k", id_col="id", val_col="v", qs=qs, k=4096,
            )
            .to_pandas()
            .sort_values(["k", "q"])
            .reset_index(drop=True)
        )
        for row in out.itertuples():
            want = qdisc(vals[keys == row.k], row.q)
            assert row.value_est == want  # k >= group size -> exact

    small = (
        grouped_approx_quantiles_kmv(
            rd.from_arrow(t).repartition(5),
            key_col="k", id_col="id", val_col="v", qs=qs, k=256,
        )
        .to_pandas()
    )
    for row in small.itertuples():
        grp = np.sort(vals[keys == row.k])
        rank = np.searchsorted(grp, row.value_est, side="right") / len(grp)
        sigma = np.sqrt(row.q * (1 - row.q) / 256)
        assert abs(rank - row.q) <= 5 * sigma + 1.0 / 256
