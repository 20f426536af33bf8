"""Sketch operators: HyperLogLog distinct + Misra-Gries heavy hitters —
accuracy bounds, merge laws, and the published guarantees."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from invoice_ocr_reconciler_ray.functions.sketches import (
    hll_add_hashes,
    hll_empty,
    hll_estimate,
    hll_hash_strings,
    hll_merge,
    mg_merge,
    mg_summarize,
)


def test_hll_accuracy_and_merge_commutes():
    for n in (100, 5_000, 100_000):
        vals = [f"item-{i}" for i in range(n)]
        reg = hll_add_hashes(hll_empty(), hll_hash_strings(vals))
        est = hll_estimate(reg)
        assert abs(est - n) / n < 0.05, (n, est)  # 3σ at p=12 is ~4.9%
        # split-merge in either order == whole-stream registers
        a = hll_add_hashes(hll_empty(), hll_hash_strings(vals[: n // 2]))
        b = hll_add_hashes(hll_empty(), hll_hash_strings(vals[n // 2 :]))
        assert (hll_merge(a, b) == reg).all()
        assert (hll_merge(b, a) == reg).all()


def test_hll_duplicates_do_not_inflate():
    vals = [f"x{i % 50}" for i in range(10_000)]
    est = hll_estimate(hll_add_hashes(hll_empty(), hll_hash_strings(vals)))
    assert abs(est - 50) / 50 < 0.05


def test_misra_gries_guarantee_zipf():
    """Every element with frequency > n/(k+1) must be in the summary, and
    stored counts never exceed true counts (lower-bound property) — across
    an arbitrary block split + merge."""
    rng = np.random.RandomState(4)
    items = [f"t{int(z)}" for z in rng.zipf(1.5, 20_000) if z < 1000]
    n, k = len(items), 10
    true = {}
    for x in items:
        true[x] = true.get(x, 0) + 1
    blocks = [items[i : i + 1000] for i in range(0, n, 1000)]
    merged = mg_merge([mg_summarize(b, k) for b in blocks], k)
    assert len(merged) <= k
    for t, c in true.items():
        if c > n // (k + 1):
            assert t in merged, (t, c)
    for t, c in merged.items():
        assert c <= true[t]


def test_sketch_registry_entries(ray_session):
    """events_hll_users within 5% of exact; heavy_hitter_terms is a superset
    of the provable hitters and a subset of the true vocabulary."""
    import duckdb

    from invoice_ocr_reconciler_ray.pipelines.queries import (
        events_hll_users,
        heavy_hitter_terms,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    got = events_hll_users(sf).to_pandas().approx_distinct.iloc[0]
    assert abs(got - exact) / exact < 0.05, (got, exact)

    hh = heavy_hitter_terms(sf).to_pandas()
    tdf = con.execute(
        f"""SELECT w AS term, COUNT(*) AS c FROM (
              SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
              FROM read_parquet('{sf}/documents.parquet'))
            WHERE w <> '' GROUP BY 1"""
    ).fetchdf()
    true = dict(zip(tdf.term, tdf.c))
    n, k = int(tdf.c.sum()), 20
    for t, c in true.items():
        if c > n // (k + 1):
            assert t in set(hh.term), (t, c)
    for t, mc in zip(hh.term, hh.min_count):
        assert t in true and mc <= true[t]
