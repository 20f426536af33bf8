"""Query-registry family module 8/9 (dominant family: docs_orders; split from the monolithic queries.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum
from ...stages import neardup
from ...stages.ann import brute_force_topk, ivf_topk, knn_join
from ...stages.fuzzy import fuzzy_reconcile
from ...stages.text_analysis import (
    fingerprint_stage,
    lang_id_stage,
    quality_stage,
    token_count_stage,
)

from ._common import (
    _cents,
    _t,
)



def media_wav_samplesum_oracle(sf_dir: str):
    """Audio analog of the BMP pixel-sum oracle: a deterministic 64-sample
    int16 PCM tone is synthesized per doc_id (sₖ = ((7·id + 13k) mod
    65536) − 32768), round-tripped through the REAL WAV container
    (functions/wav.py — RIFF header, fmt/data chunks via the stdlib
    writer, our own parser on the way back), and the decoded sample sum /
    extrema are compared against the SQL closed form — value-oracle
    coverage for the audio codec path, not just a rows-only check."""
    from ...functions.wav import decode_wav, encode_wav

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    k = np.arange(64, dtype=np.int64)

    def work(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sums = np.empty(len(ids), dtype=np.int64)
        mins = np.empty(len(ids), dtype=np.int64)
        maxs = np.empty(len(ids), dtype=np.int64)
        for j, i in enumerate(ids):
            s = (((7 * int(i) + 13 * k) % 65536) - 32768).astype(np.int16)
            back, rate = decode_wav(encode_wav(s, 8000))
            back = back.reshape(-1)
            if rate != 8000 or not np.array_equal(back, s):
                raise ValueError("WAV round-trip mismatch")
            b64 = back.astype(np.int64)
            sums[j], mins[j], maxs[j] = int(b64.sum()), int(b64.min()), int(b64.max())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_samples": pa.array(np.full(len(ids), 64, dtype=np.int64)),
                "sample_sum": pa.array(sums, pa.int64()),
                "sample_min": pa.array(mins, pa.int64()),
                "sample_max": pa.array(maxs, pa.int64()),
            }
        )

    return ds.map_batches(work, batch_format="pyarrow").sort("doc_id")


MEDIA_WAV_SAMPLESUM_ORACLE_SQL = """
WITH ks AS (SELECT unnest(range(0, 64)) AS k),
s AS (SELECT d.doc_id, (7 * d.doc_id + 13 * ks.k) % 65536 - 32768 AS v
      FROM documents d, ks)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(v) AS BIGINT) AS sample_sum,
       CAST(MIN(v) AS BIGINT) AS sample_min,
       CAST(MAX(v) AS BIGINT) AS sample_max
FROM s GROUP BY 1 ORDER BY 1
"""


def docs_char_rle_census(sf_dir: str):
    """Character run-length census per document — the RLE compressibility
    signal at byte grain (n_runs → RLE token count; max_run → worst-case
    literal): one vectorized adjacent-diff pass per doc.  The oracle
    rebuilds runs with the classic gaps-and-islands i − ROW_NUMBER trick
    over per-char rows, so the two engines must agree on every run
    boundary."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def census(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        n_chars = np.empty(len(ids), dtype=np.int64)
        n_runs = np.empty(len(ids), dtype=np.int64)
        max_run = np.empty(len(ids), dtype=np.int64)
        for j, s in enumerate(texts):
            b = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
            n_chars[j] = len(b)
            if len(b) == 0:
                n_runs[j] = 0
                max_run[j] = 0
                continue
            bounds = np.flatnonzero(b[1:] != b[:-1])
            lens = np.diff(np.concatenate(([0], bounds + 1, [len(b)])))
            n_runs[j] = len(lens)
            max_run[j] = int(lens.max())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_runs": pa.array(n_runs, pa.int64()),
                "max_run": pa.array(max_run, pa.int64()),
            }
        )

    return ds.map_batches(census, batch_format="pyarrow").sort("doc_id")


DOCS_CHAR_RLE_CENSUS_SQL = """
WITH pos AS (
  SELECT doc_id, unnest(range(1, length(text) + 1)) AS i, text
  FROM documents),
ch AS (SELECT doc_id, i, substr(text, CAST(i AS INT), 1) AS c FROM pos),
r AS (SELECT doc_id, c,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id, c ORDER BY i)
                 AS grp
      FROM ch),
runs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
         FROM r GROUP BY doc_id, c, grp)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(COALESCE(x.n_runs, 0) AS BIGINT) AS n_runs,
       CAST(COALESCE(x.max_run, 0) AS BIGINT) AS max_run
FROM documents d
LEFT JOIN (SELECT doc_id, COUNT(*) AS n_runs, MAX(run_len) AS max_run
           FROM runs GROUP BY 1) x ON d.doc_id = x.doc_id
ORDER BY d.doc_id
"""


def orders_float_cents_drift_audit(sf_dir: str):
    """The engine's own money-kernel rationale, measured as an op: for
    each order price, does naive float TRUNCATION of x·100 disagree with
    the repo's tie-free ⌊x·100 + 0.5⌋ cents kernel?  Every disagreement
    is a row where a float-cast pipeline silently loses a cent (the
    IEEE representation of a 2-decimal literal lands just below the
    integer).  Pure per-row double compares — identical expression trees
    in both engines — folded to a per-status census with ppm."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
        drift = (np.trunc(x) != np.floor(x + 0.5)).astype(np.int64)
        g = pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "one": pa.array(np.ones(len(drift), dtype=np.int64)),
                "drift": pa.array(drift),
            }
        ).group_by("o_orderstatus").aggregate([("one", "sum"), ("drift", "sum")])
        return g.rename_columns(["o_orderstatus", "n_rows", "n_drift"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Sum("n_rows", alias_name="n_rows"), Sum("n_drift", alias_name="n_drift"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_rows"].cast(pa.int64()).to_numpy()
        d = t["n_drift"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "n_rows": pa.array(n, pa.int64()),
                "n_drift": pa.array(d, pa.int64()),
                "drift_ppm": pa.array(d * 1_000_000 // n, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("o_orderstatus")


ORDERS_FLOAT_CENTS_DRIFT_AUDIT_SQL = """
WITH t AS (
  SELECT o_orderstatus,
         CASE WHEN trunc(o_totalprice * 100)
                   <> FLOOR(o_totalprice * 100 + 0.5)
              THEN 1 ELSE 0 END AS drift
  FROM orders),
s AS (SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(drift) AS BIGINT) AS n_drift
      FROM t GROUP BY 1)
SELECT o_orderstatus, n_rows, n_drift,
       CAST(n_drift * 1000000 // n_rows AS BIGINT) AS drift_ppm
FROM s ORDER BY o_orderstatus
"""


def orders_gumbel_moment_fit(sf_dir: str):
    """Parametric EVT: method-of-moments Gumbel fit to monthly revenue —
    β̂ = s·√6/π and μ̂ = x̄ − γ·β̂ (γ = Euler–Mascheroni), the parametric
    complement to the repo's empirical block-maxima return periods.
    Monthly sums fold as int64 WHOLE DOLLARS (cents² × months would
    overflow at sf≥0.1); the moment math runs on the O(months) table in
    Python big ints, and the two float outputs are single fixed IEEE
    trees with identical γ/π literals in both engines."""
    import math

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        ym = pc.add(
            pc.multiply(pc.year(t["o_orderdate"]).cast(pa.int64()), 100),
            pc.month(t["o_orderdate"]).cast(pa.int64()),
        )
        dollars = pc.divide(_cents(t["o_totalprice"]), 100)
        g = pa.table({"ym": ym, "dollars": dollars}).group_by("ym").aggregate(
            [("dollars", "sum")]
        )
        return g.rename_columns(["ym", "dollars"])

    monthly = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("dollars", alias_name="dollars"))
        .to_pandas()
    )
    x = [int(v) for v in monthly["dollars"]]
    n = len(x)
    sx = sum(x)
    sxx = sum(v * v for v in x)  # Python big ints — no overflow
    mean = float(sx) / n
    var = (float(n) * sxx - float(sx) * sx) / (float(n) * (n - 1))
    beta = math.sqrt(var) * math.sqrt(6.0) / 3.141592653589793
    mu = mean - 0.5772156649015329 * beta
    return pa.table(
        {
            "n_months": pa.array([n], pa.int64()),
            "sum_dollars": pa.array([sx], pa.int64()),
            "mean_dollars": pa.array([mean], pa.float64()),
            "gumbel_beta": pa.array([beta], pa.float64()),
            "gumbel_mu": pa.array([mu], pa.float64()),
        }
    )


ORDERS_GUMBEL_MOMENT_FIT_SQL = """
WITH m AS (
  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 100)
              AS BIGINT) AS dollars
  FROM orders GROUP BY 1),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dollars) AS BIGINT) AS sx,
             CAST(SUM(dollars * dollars) AS BIGINT) AS sxx
      FROM m),
f AS (SELECT n, sx,
             CAST(sx AS DOUBLE) / n AS mean_dollars,
             SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  / (CAST(n AS DOUBLE) * (n - 1)))
                 * SQRT(6.0) / 3.141592653589793 AS gumbel_beta
      FROM s)
SELECT n AS n_months, sx AS sum_dollars, mean_dollars, gumbel_beta,
       mean_dollars - 0.5772156649015329 * gumbel_beta AS gumbel_mu
FROM f
"""


def orders_rewrite_equivalence_audit(sf_dir: str):
    """Optimizer-rewrite VALIDATION as an op: revenue-by-nation computed
    through two independent physical plans — (a) fact pre-aggregation +
    broadcast dim lookup (shuffle-free) and (b) an 8-partition hash join
    then aggregate — asserted cell-identical before anything is emitted.
    This is the query-rewrite equivalence harness a distributed engine
    runs on itself; a silent disagreement between the plans raises
    instead of shipping a wrong answer.  Output carries the agreed
    result plus the audit verdict column."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def pre(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"o_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
        ).group_by("o_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["o_custkey", "cents"])

    per_cust = orders.map_batches(pre, batch_format="pyarrow").materialize()

    # plan A: broadcast dim lookup (customer→nation map ships once)
    cust_pd = cust.to_pandas()
    nat_of = dict(zip(cust_pd["c_custkey"], cust_pd["c_nationkey"]))
    nat_ref = ray.put(nat_of)

    def plan_a(t: pa.Table) -> pa.Table:
        m = ray.get(nat_ref)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        nk = np.array([m[k] for k in keys], dtype=np.int64)
        g = pa.table({"k": pa.array(nk), "cents": t["cents"]}).group_by("k").aggregate(
            [("cents", "sum")]
        )
        return g.rename_columns(["k", "cents"])

    a = {
        int(r["k"]): int(r["cents"])
        for r in per_cust.map_batches(plan_a, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()
    }

    # plan B: partitioned hash join then aggregate
    j = per_cust.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def by_nation(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"k": t["c_nationkey"].cast(pa.int64()), "cents": t["cents"]}
        ).group_by("k").aggregate([("cents", "sum")])
        return g.rename_columns(["k", "cents"])

    b = {
        int(r["k"]): int(r["cents"])
        for r in j.map_batches(by_nation, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("cents", alias_name="cents"))
        .take_all()
    }

    if a != b:
        raise ValueError(f"plan rewrite disagreement: {set(a.items()) ^ set(b.items())}")
    keys = sorted(a, key=lambda k: name_of[k])
    return pa.table(
        {
            "n_name": pa.array([name_of[k] for k in keys], pa.string()),
            "revenue_cents": pa.array([a[k] for k in keys], pa.int64()),
            "plans_agree": pa.array([1] * len(keys), pa.int64()),
        }
    )


ORDERS_REWRITE_EQUIVALENCE_AUDIT_SQL = """
SELECT n.n_name,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST(1 AS BIGINT) AS plans_agree
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1
"""


def orders_daily_acf_terms(sf_dir: str):
    """Multi-lag autocorrelation TABLE for daily revenue (lags 1–7), each
    row carrying the exact INTEGER sufficient statistics of the lag-k
    Pearson numerator/denominators (n·Σxy − Σx·Σy etc.) in kilodollar
    units (cents-grain cross-products overflow int64 at sf≥0.01) — the repo's only lag-1/lag-24 autocorrs generalized to an ACF
    you can read seasonality off.  Daily sums fold distributed; the lag
    joins run on the O(days) driver table in Python big ints, so no
    parallelism or float-order effect can shift a digit."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = t["o_orderdate"].cast(pa.int64())  # µs — same day ⇒ same value
        kd = pc.divide(_cents(t["o_totalprice"]), 100_000)  # kilodollar units
        g = pa.table({"day": day, "kd": kd}).group_by("day").aggregate(
            [("kd", "sum")]
        )
        return g.rename_columns(["day", "kd"])

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("kd", alias_name="kd"))
        .to_pandas()
        .sort_values("day")
    )
    # calendar-adjacent pairs only: day keys are µs timestamps
    DAY_US = 86_400_000_000
    day_us = daily["day"].to_numpy(dtype=np.int64)
    val = [int(v) for v in daily["kd"]]
    pos_of = {int(d): i for i, d in enumerate(day_us)}
    rows = []
    for lag in range(1, 8):
        n = sxy = sx = sy = sxx = syy = 0
        for i, d in enumerate(day_us):
            jpos = pos_of.get(int(d) + lag * DAY_US)
            if jpos is None:
                continue
            x, y = val[i], val[jpos]
            n += 1
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x
            syy += y * y
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        rows.append((lag, n, num, denx, deny))
    return pa.table(
        {
            "lag": pa.array([r[0] for r in rows], pa.int64()),
            "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
            "num_scaled": pa.array([r[2] for r in rows], pa.int64()),
            "den_x_scaled": pa.array([r[3] for r in rows], pa.int64()),
            "den_y_scaled": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


ORDERS_DAILY_ACF_TERMS_SQL = """
WITH d AS (
  SELECT o_orderdate AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 100000)
              AS BIGINT) AS v
  FROM orders GROUP BY 1),
lags AS (SELECT unnest(range(1, 8)) AS lag),
p AS (SELECT l.lag, a.v AS x, b.v AS y
      FROM lags l
      JOIN d a ON true
      JOIN d b ON b.day = a.day + l.lag * INTERVAL 1 DAY),
s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM p GROUP BY 1)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       CAST(n_pairs * sxy - sx * sy AS BIGINT) AS num_scaled,
       CAST(n_pairs * sxx - sx * sx AS BIGINT) AS den_x_scaled,
       CAST(n_pairs * syy - sy * sy AS BIGINT) AS den_y_scaled
FROM s ORDER BY lag
"""


def lineitem_flag_signature_census(sf_dir: str):
    """Per-ORDER composition signature: the sorted distinct return-flag
    set of each order collapsed to a string ('A', 'AR', 'ANR', …) and
    censused — the itemset-shape census that says how mixed orders are
    (pure-accept vs mixed-return).  Distinct (order, flag) cells shrink
    block-locally; the per-order fold is a co-partitioned Arrow kernel
    emitting ONE row per order; the final census is a tiny groupby."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_returnflag"])

    def cells(t: pa.Table) -> pa.Table:
        return (
            pa.table({"o": t["l_orderkey"], "f": t["l_returnflag"]})
            .group_by(["o", "f"])
            .aggregate([])
        )

    distinct = (
        li.map_batches(cells, batch_format="pyarrow")
        .groupby(["o", "f"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def sig(g: pa.Table) -> pa.Table:
        flags = sorted(g["f"].to_pylist())
        return pa.table(
            {
                "signature": pa.array(["".join(flags)], pa.string()),
                "n_orders": pa.array([1], pa.int64()),
            }
        )

    def census_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("signature").aggregate([("n_orders", "sum")])
        return g.rename_columns(["signature", "n_orders"])

    return (
        distinct.groupby("o")
        .map_groups(sig, batch_format="pyarrow")
        .map_batches(census_partial, batch_format="pyarrow")
        .groupby("signature")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("signature")
    )


LINEITEM_FLAG_SIGNATURE_CENSUS_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem),
s AS (SELECT l_orderkey,
             array_to_string(list_sort(list(l_returnflag)), '') AS signature
      FROM d GROUP BY 1)
SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM s GROUP BY 1 ORDER BY 1
"""


def docs_embedding_norm_length_corr(sf_dir: str):
    """CROSS-MODAL consistency stat: Pearson sufficient statistics between
    a document's length (n_chars) and its embedding's quantized energy
    (Σ of ×128 int8 code squares) through the doc_id = vec_id join — the
    sanity check that embedding magnitude tracks content size.  The
    embedding side is tiny and broadcasts as an int64 norm² map; the
    document side streams.  All sums are int64; r is one fixed IEEE tree
    (the int64→double conversions round identically in both engines)."""
    import math

    emb = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def norms(t: pa.Table) -> pa.Table:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
        q = np.floor(m * 128.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "norm2": pa.array((q * q).sum(axis=1), pa.int64()),
            }
        )

    nm = emb.map_batches(norms, batch_format="pyarrow").to_pandas()
    norm_of = dict(zip(nm["vec_id"], nm["norm2"]))
    norm_ref = ray.put(norm_of)

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(norm_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        x = t["n_chars"].to_numpy(zero_copy_only=False)
        keep = np.isin(ids, nm["vec_id"].to_numpy())
        ids, x = ids[keep], x[keep].astype(np.int64)
        y = np.array([m[i] for i in ids], dtype=np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    agg = docs.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n"), Sum("sx"), Sum("sy"), Sum("sxy"), Sum("sxx"), Sum("syy")
    )
    n, sx, sy = int(agg["sum(n)"]), int(agg["sum(sx)"]), int(agg["sum(sy)"])
    sxy, sxx, syy = int(agg["sum(sxy)"]), int(agg["sum(sxx)"]), int(agg["sum(syy)"])
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    r = float(num) / (math.sqrt(float(denx)) * math.sqrt(float(deny)))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "num_scaled": pa.array([num], pa.int64()),
            "den_x_scaled": pa.array([denx], pa.int64()),
            "den_y_scaled": pa.array([deny], pa.int64()),
            "pearson_r": pa.array([r], pa.float64()),
        }
    )


DOCS_EMBEDDING_NORM_LENGTH_CORR_SQL = """
WITH u AS (SELECT vec_id, unnest(embedding) AS a FROM embeddings),
q AS (SELECT vec_id,
             CAST(SUM(CAST(FLOOR(CAST(a AS DOUBLE) * 128 + 0.5) AS BIGINT)
                      * CAST(FLOOR(CAST(a AS DOUBLE) * 128 + 0.5) AS BIGINT))
                  AS BIGINT) AS norm2
      FROM u GROUP BY 1),
p AS (SELECT CAST(d.n_chars AS BIGINT) AS x, q.norm2 AS y
      FROM documents d JOIN q ON d.doc_id = q.vec_id),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM p)
SELECT n, CAST(n * sxy - sx * sy AS BIGINT) AS num_scaled,
       CAST(n * sxx - sx * sx AS BIGINT) AS den_x_scaled,
       CAST(n * syy - sy * sy AS BIGINT) AS den_y_scaled,
       CAST(n * sxy - sx * sy AS DOUBLE)
           / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
              * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r
FROM s
"""


def orders_priority_mix_tv_by_year(sf_dir: str):
    """Year-over-year DISTRIBUTION drift of the order-priority mix as
    total-variation distance in integer ppm — TV = ½Σ|pᵢ−qᵢ| computed by
    cross-multiplication (Σ|cᵢ·N₂ − dᵢ·N₁|·10⁶ // (2·N₁·N₂)), so the
    drift metric is exact integer despite the differing year sizes.  The
    (year, priority) contingency folds from block partials; the pair
    arithmetic runs on the O(years × 5) driver table."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "y": pc.year(t["o_orderdate"]).cast(pa.int64()),
                "p": t["o_orderpriority"],
            }
        ).group_by(["y", "p"]).aggregate([("y", "count")])
        g = g.rename_columns(["y", "p", "n"])
        return pa.table({"y": g["y"], "p": g["p"], "n": g["n"].cast(pa.int64())})

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["y", "p"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    pris = sorted(cells["p"].unique())
    years = sorted(cells["y"].unique())
    of = {(int(r.y), r.p): int(r.n) for r in cells.itertuples()}
    tot = {y: sum(of.get((y, p), 0) for p in pris) for y in years}
    rows = []
    for ya, yb in zip(years, years[1:]):
        if yb != ya + 1:
            continue
        n1, n2 = tot[ya], tot[yb]
        s = sum(abs(of.get((ya, p), 0) * n2 - of.get((yb, p), 0) * n1) for p in pris)
        rows.append((ya, yb, n1, n2, s * 1_000_000 // (2 * n1 * n2)))
    return pa.table(
        {
            "year_a": pa.array([r[0] for r in rows], pa.int64()),
            "year_b": pa.array([r[1] for r in rows], pa.int64()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "tv_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


ORDERS_PRIORITY_MIX_TV_BY_YEAR_SQL = """
WITH c AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderpriority AS p,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1, 2),
t AS (SELECT y, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1),
pairs AS (SELECT a.y AS year_a, b.y AS year_b, a.tot AS n_a, b.tot AS n_b
          FROM t a JOIN t b ON b.y = a.y + 1),
pr AS (SELECT DISTINCT o_orderpriority AS p FROM orders),
d AS (SELECT pa.year_a, pa.year_b, pa.n_a, pa.n_b,
             COALESCE(ca.n, 0) AS na_i, COALESCE(cb.n, 0) AS nb_i
      FROM pairs pa CROSS JOIN pr
      LEFT JOIN c ca ON ca.y = pa.year_a AND ca.p = pr.p
      LEFT JOIN c cb ON cb.y = pa.year_b AND cb.p = pr.p)
SELECT year_a, year_b, n_a, n_b,
       CAST(CAST(SUM(ABS(na_i * n_b - nb_i * n_a)) AS BIGINT) * 1000000
            // (2 * n_a * n_b) AS BIGINT) AS tv_ppm
FROM d GROUP BY 1, 2, 3, 4 ORDER BY 1
"""


def embeddings_int8_1nn_loo_accuracy(sf_dir: str):
    """Leave-one-out 1-NN label accuracy over the ×128 int8 codes — the
    embedding-quality scorecard (does nearest-neighbor structure respect
    labels?), exactly reproducible because similarity is the integer code
    dot product and the neighbor argmax uses the total (dot desc, vec_id
    asc) order via a single composite integer key.  The code matrix is
    tiny and broadcasts; each block scores its rows against all codes in
    one int64 matmul.  The oracle replays the O(n²) ranking in SQL —
    quadratic only on the oracle side."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"])
    all_rows = ds.take_all()
    all_rows.sort(key=lambda r: r["vec_id"])
    codes = np.stack(
        [
            np.floor(np.asarray(r["embedding"], dtype=np.float64) * 128.0 + 0.5).astype(np.int64)
            for r in all_rows
        ]
    )
    vids = np.array([int(r["vec_id"]) for r in all_rows], dtype=np.int64)
    labels = np.array([int(r["label"]) for r in all_rows], dtype=np.int64)
    ref = ray.put((codes, vids, labels))

    def score(t: pa.Table) -> pa.Table:
        c_all, v_all, l_all = ray.get(ref)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
        q = np.floor(m * 128.0 + 0.5).astype(np.int64)
        my_v = t["vec_id"].to_numpy(zero_copy_only=False)
        my_l = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        dots = q @ c_all.T  # (b, n)
        # composite key: max dot, then min vec_id — one integer argmax
        key = dots * 10_000_000 - v_all[None, :]
        self_mask = my_v[:, None] == v_all[None, :]
        key[self_mask] = np.iinfo(np.int64).min
        nn = np.argmax(key, axis=1)
        pred = l_all[nn]
        g = pa.table(
            {
                "label": pa.array(my_l),
                "one": pa.array(np.ones(len(my_l), dtype=np.int64)),
                "correct": pa.array((pred == my_l).astype(np.int64)),
            }
        ).group_by("label").aggregate([("one", "sum"), ("correct", "sum")])
        return g.rename_columns(["label", "n", "n_correct"])

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"), Sum("n_correct", alias_name="n_correct"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].cast(pa.int64()).to_numpy()
        c = t["n_correct"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "label": t["label"].cast(pa.int64()),
                "n": pa.array(n, pa.int64()),
                "n_correct": pa.array(c, pa.int64()),
                "acc_ppm": pa.array(c * 1_000_000 // n, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("label")


EMBEDDINGS_INT8_1NN_LOO_ACCURACY_SQL = """
WITH u AS (SELECT vec_id, label, unnest(embedding) AS a,
                  unnest(range(1, len(embedding) + 1)) AS i
           FROM embeddings),
q AS (SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(SUM(CAST(FLOOR(CAST(a.a AS DOUBLE) * 128 + 0.5) AS BIGINT)
                      * CAST(FLOOR(CAST(b.a AS DOUBLE) * 128 + 0.5)
                             AS BIGINT)) AS BIGINT) AS dot
      FROM u a JOIN u b ON a.i = b.i AND a.vec_id <> b.vec_id
      GROUP BY 1, 2),
r AS (SELECT va, vb, ROW_NUMBER() OVER (PARTITION BY va
                                        ORDER BY dot DESC, vb) AS rn
      FROM q),
nn AS (SELECT r.va, e2.label AS pred
       FROM r JOIN embeddings e2 ON r.vb = e2.vec_id
       WHERE r.rn = 1),
j AS (SELECT CAST(e.label AS BIGINT) AS label,
             CASE WHEN nn.pred = e.label THEN 1 ELSE 0 END AS ok
      FROM embeddings e JOIN nn ON e.vec_id = nn.va),
s AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ok) AS BIGINT) AS n_correct
      FROM j GROUP BY 1)
SELECT label, n, n_correct,
       CAST(n_correct * 1000000 // n AS BIGINT) AS acc_ppm
FROM s ORDER BY label
"""


def part_brand_name_medoid(sf_dir: str):
    """Edit-distance MEDOID per brand — the representative part name
    minimizing total Levenshtein distance to its brand's distinct names
    (ties broken lexicographically), the cluster-prototype primitive of
    entity resolution.  Distinct (brand, name) cells shrink block-locally;
    each brand group runs the Myers bit-parallel kernel
    (functions/similarity.py) over its O(k²) name pairs — exact distances,
    and the DuckDB levenshtein() oracle replays them verbatim."""
    from ...functions.similarity import myers_distance_many, pack_myers

    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_brand", "p_name"])

    def cells(t: pa.Table) -> pa.Table:
        return (
            pa.table({"p_brand": t["p_brand"], "p_name": t["p_name"]})
            .group_by(["p_brand", "p_name"])
            .aggregate([])
        )

    distinct = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["p_brand", "p_name"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def medoid(g: pa.Table) -> pa.Table:
        names = sorted(g["p_name"].to_pylist())
        packed = pack_myers(names)
        best_name, best_sum = None, None
        for a in names:
            s = int(myers_distance_many(a, packed).sum())
            if best_sum is None or s < best_sum or (s == best_sum and a < best_name):
                best_name, best_sum = a, s
        return pa.table(
            {
                "p_brand": g["p_brand"].slice(0, 1),
                "medoid_name": pa.array([best_name], pa.string()),
                "n_names": pa.array([len(names)], pa.int64()),
                "sum_dist": pa.array([best_sum], pa.int64()),
            }
        )

    return (
        distinct.groupby("p_brand").map_groups(medoid, batch_format="pyarrow").sort("p_brand")
    )


PART_BRAND_NAME_MEDOID_SQL = """
WITH n AS (SELECT DISTINCT p_brand, p_name FROM part),
d AS (SELECT a.p_brand, a.p_name AS name_a,
             CAST(SUM(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS sum_dist,
             CAST(COUNT(*) AS BIGINT) AS n_names
      FROM n a JOIN n b ON a.p_brand = b.p_brand GROUP BY 1, 2),
r AS (SELECT p_brand, name_a, sum_dist, n_names,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY sum_dist, name_a) AS rn
      FROM d)
SELECT p_brand, name_a AS medoid_name, n_names, sum_dist
FROM r WHERE rn = 1 ORDER BY p_brand
"""


def orders_scan_sharing_report(sf_dir: str):
    """SCAN SHARING as an op: ONE narrow projected pass over orders is
    materialized and fans out to three independent aggregates (status
    counts, priority revenue, ISO-dow histogram) that a naive engine
    would run as three full scans.  The three result families come back
    UNIONed in a tagged long format — the multi-sink shape of a
    dashboard refresh.  ISO dow (Mon=1) is used because Arrow's Monday=0
    and DuckDB's Sunday=0 conventions disagree."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderstatus", "o_orderpriority", "o_orderdate", "o_totalprice"]
    )

    def pre(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "status": t["o_orderstatus"],
                "priority": t["o_orderpriority"],
                "isodow": pc.add(pc.day_of_week(t["o_orderdate"]).cast(pa.int64()), 1),
                "cents": _cents(t["o_totalprice"]),
            }
        )

    narrow = ds.map_batches(pre, batch_format="pyarrow").materialize()

    by_status = narrow.groupby("status").aggregate(Count(alias_name="v")).to_pandas()
    by_pri = narrow.groupby("priority").aggregate(Sum("cents", alias_name="v")).to_pandas()
    by_dow = narrow.groupby("isodow").aggregate(Count(alias_name="v")).to_pandas()

    rows = []
    for r in by_status.itertuples():
        rows.append(("count_by_status", str(r.status), int(r.v)))
    for r in by_pri.itertuples():
        rows.append(("cents_by_priority", str(r.priority), int(r.v)))
    for r in by_dow.itertuples():
        rows.append(("count_by_isodow", str(int(r.isodow)), int(r.v)))
    rows.sort()
    return pa.table(
        {
            "metric": pa.array([r[0] for r in rows], pa.string()),
            "key": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


ORDERS_SCAN_SHARING_REPORT_SQL = """
WITH u AS (
  SELECT 'count_by_status' AS metric, o_orderstatus AS key,
         CAST(COUNT(*) AS BIGINT) AS value
  FROM orders GROUP BY 2
  UNION ALL
  SELECT 'cents_by_priority', o_orderpriority,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
  FROM orders GROUP BY 2
  UNION ALL
  SELECT 'count_by_isodow', CAST(isodow(o_orderdate) AS VARCHAR),
         CAST(COUNT(*) AS BIGINT)
  FROM orders GROUP BY 2)
SELECT metric, key, value FROM u ORDER BY metric, key
"""


def docs_mattr_window_census(sf_dir: str):
    """Moving-Average Type-Token Ratio sufficient statistics — the
    windowed lexical-diversity measure that, unlike raw TTR, doesn't
    shrink with document length: for every 50-token sliding window the
    distinct-type count, reported per doc as (n_windows,
    sum_window_distinct) in exact integers (MATTR = sum/(50·windows)).
    Vectorized per doc via per-type cumulative-count differencing (the
    small-vocab trick); the oracle replays every window with a
    positional range join."""
    W = 50
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def census(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        n_tok = np.zeros(len(ids), dtype=np.int64)
        n_win = np.zeros(len(ids), dtype=np.int64)
        s_dis = np.zeros(len(ids), dtype=np.int64)
        import re

        tok_re = re.compile(r"[a-z0-9]+")
        for j, s in enumerate(texts):
            toks = tok_re.findall(s.lower())
            n = len(toks)
            n_tok[j] = n
            if n < W:
                continue
            _, inv = np.unique(np.asarray(toks), return_inverse=True)
            k = inv.max() + 1
            onehot = np.zeros((n + 1, k), dtype=np.int32)
            onehot[np.arange(1, n + 1), inv] = 1
            cum = np.cumsum(onehot, axis=0)
            # windows [w, w+W) for w = 0..n-W
            present = (cum[W:] - cum[:-W]) > 0
            n_win[j] = n - W + 1
            s_dis[j] = int(present.sum())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_windows": pa.array(n_win, pa.int64()),
                "sum_window_distinct": pa.array(s_dis, pa.int64()),
            }
        )

    return ds.map_batches(census, batch_format="pyarrow").sort("doc_id")


DOCS_MATTR_WINDOW_CENSUS_SQL = """
WITH tk AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term,
         unnest(range(1, len(list_filter(string_split_regex(lower(text),
                            '[^a-z0-9]+'), x -> x <> '')) + 1)) AS i
  FROM documents),
meta AS (SELECT doc_id, CAST(MAX(i) AS BIGINT) AS n FROM tk GROUP BY 1),
w AS (SELECT doc_id, unnest(range(1, n - 48)) AS wpos
      FROM meta WHERE n >= 50),
c AS (SELECT w.doc_id, w.wpos, COUNT(DISTINCT t.term) AS dc
      FROM w JOIN tk t ON t.doc_id = w.doc_id
                      AND t.i BETWEEN w.wpos AND w.wpos + 49
      GROUP BY 1, 2),
s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(dc) AS BIGINT) AS sum_window_distinct
      FROM c GROUP BY 1)
SELECT m.doc_id, m.n AS n_tokens,
       CAST(COALESCE(s.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(s.sum_window_distinct, 0) AS BIGINT)
           AS sum_window_distinct
FROM meta m LEFT JOIN s ON m.doc_id = s.doc_id
ORDER BY m.doc_id
"""


def events_funnel_timeout_sweep(sf_dir: str):
    """Conversion-window SENSITIVITY sweep: signup→purchase conversion
    counted under three attribution windows (1 h / 1 day / 1 week) in one
    pass — the parameter-sweep companion to the fixed-window funnel ops
    (pick the window where the curve knees).  One co-partition by user
    finds first-signup and first-subsequent-purchase; each user emits
    one µs gap, and the sweep is a 3-row integer fold."""
    WINDOWS = [3_600, 86_400, 604_800]  # seconds
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts"])

    def per_user(g: pa.Table) -> pa.Table:
        typ = np.asarray(g["event_type"].combine_chunks().to_numpy(zero_copy_only=False))
        ts = (
            g["ts"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        sign = ts[typ == "signup"]
        if len(sign) == 0:
            return pa.table({"gap_us": pa.array([], pa.int64())})
        fs = int(sign.min())
        purch = ts[(typ == "purchase") & (ts > fs)]
        gap = int(purch.min()) - fs if len(purch) else -1
        return pa.table({"gap_us": pa.array([gap], pa.int64())})

    gaps = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        g = t["gap_us"].to_numpy(zero_copy_only=False)
        rows_w, rows_s, rows_c = [], [], []
        for w in WINDOWS:
            rows_w.append(w)
            rows_s.append(len(g))
            rows_c.append(int(((g > 0) & (g <= w * 1_000_000)).sum()))
        return pa.table(
            {
                "window_sec": pa.array(rows_w, pa.int64()),
                "n_signup_users": pa.array(rows_s, pa.int64()),
                "n_converted": pa.array(rows_c, pa.int64()),
            }
        )

    return (
        gaps.map_batches(partial, batch_format="pyarrow")
        .groupby("window_sec")
        .aggregate(
            Sum("n_signup_users", alias_name="n_signup_users"),
            Sum("n_converted", alias_name="n_converted"),
        )
        .sort("window_sec")
    )


EVENTS_FUNNEL_TIMEOUT_SWEEP_SQL = """
WITH s AS (SELECT user_id, MIN(ts) AS fs FROM events
           WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT s.user_id,
             MIN(epoch_us(e.ts)) - epoch_us(any_value(s.fs)) AS gap_us
      FROM s LEFT JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND e.ts > s.fs
      GROUP BY 1),
w AS (SELECT CAST(unnest([3600, 86400, 604800]) AS BIGINT) AS window_sec)
SELECT CAST(w.window_sec AS BIGINT) AS window_sec,
       CAST(COUNT(*) AS BIGINT) AS n_signup_users,
       CAST(SUM(CASE WHEN p.gap_us IS NOT NULL
                      AND p.gap_us <= w.window_sec * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM w CROSS JOIN p
GROUP BY 1 ORDER BY 1
"""


def docs_tar_shard_export_manifest(sf_dir: str):
    """Training-export through a REAL container: documents are sharded by
    doc_id//100, each shard serialized as a genuine ustar archive
    (functions/tar.py) under /tmp, re-parsed for verification, and the
    MANIFEST (members, payload bytes, exact archive bytes including
    512-byte framing and the end-of-archive marker) is emitted — the
    resumable-shard bookkeeping a crawl exporter needs, with every byte
    count reconstructed arithmetically by the oracle.  Shards build
    independently per group; nothing global but the tiny manifest."""
    import os

    from ...functions.tar import build_tar, parse_tar

    out_dir = "/tmp/iocr_tar_shards"
    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def pre(t: pa.Table) -> pa.Table:
        return t.append_column("shard_id", pc.divide(t["doc_id"], 100))

    def shard(g: pa.Table) -> pa.Table:
        sid = int(g["shard_id"][0].as_py())
        rows = sorted(zip(g["doc_id"].to_pylist(), g["text"].to_pylist()))
        members = [(f"doc_{i:012d}.txt", s.encode("utf-8")) for i, s in rows]
        buf = build_tar(members)
        path = f"{out_dir}/shard-{sid:06d}.tar"
        with open(path, "wb") as f:
            f.write(buf)
        back = parse_tar(open(path, "rb").read())
        if [(n, len(p)) for n, p in back] != [(n, len(p)) for n, p in members]:
            raise ValueError("tar shard verification failed")
        return pa.table(
            {
                "shard_id": pa.array([sid], pa.int64()),
                "n_members": pa.array([len(members)], pa.int64()),
                "payload_bytes": pa.array(
                    [sum(len(p) for _, p in members)], pa.int64()
                ),
                "archive_bytes": pa.array([len(buf)], pa.int64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(shard, batch_format="pyarrow")
        .sort("shard_id")
    )


DOCS_TAR_SHARD_EXPORT_MANIFEST_SQL = """
WITH m AS (
  SELECT doc_id // 100 AS shard_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS sz
  FROM documents)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(sz) AS BIGINT) AS payload_bytes,
       CAST(SUM(512 + ((sz + 511) // 512) * 512) + 1024 AS BIGINT)
           AS archive_bytes
FROM m GROUP BY 1 ORDER BY 1
"""


def events_systematic_sample_census(sf_dir: str):
    """SYSTEMATIC sampling by global time rank — every 100th event in
    (ts, event_id) order — censused per type against the full stream
    (the fixed-rate probe a monitoring pipeline tails off the firehose;
    rank-systematic keeps exactly 1% regardless of skew, unlike
    hash-Bernoulli).  The global rank reuses the value-range-bucket rank
    on epoch µs; the census is a tiny per-type fold."""
    from ...stages.rank import global_value_rank

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "ts_us": t["ts"].cast(pa.int64()),
            }
        )

    ranked = global_value_rank(
        ds.map_batches(pre, batch_format="pyarrow"),
        value_col="ts_us",
        id_col="event_id",
        out_col="rnk",
    )

    def census(t: pa.Table) -> pa.Table:
        rm1 = pc.subtract(t["rnk"], 1)
        sampled = pc.cast(
            pc.equal(pc.multiply(pc.divide(rm1, 100), 100), rm1), pa.int64()
        )
        g = pa.table(
            {
                "event_type": t["event_type"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "sampled": sampled,
            }
        ).group_by("event_type").aggregate([("one", "sum"), ("sampled", "sum")])
        return g.rename_columns(["event_type", "n_total", "n_sampled"])

    return (
        ranked.map_batches(census, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_total", alias_name="n_total"), Sum("n_sampled", alias_name="n_sampled")
        )
        .sort("event_type")
    )


EVENTS_SYSTEMATIC_SAMPLE_CENSUS_SQL = """
WITH r AS (
  SELECT event_type,
         ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rnk
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN (rnk - 1) % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled
FROM r GROUP BY 1 ORDER BY 1
"""


def orders_cardinality_estimate_audit(sf_dir: str):
    """Optimizer CARDINALITY-ESTIMATION audit: a fixed three-stage plan
    (σ status='O' → ⋈ customer → γ nation) scored estimate-vs-actual,
    with the estimates computed by the textbook uniformity rules
    (|σ| ≈ N/NDV(status), FK join preserves cardinality, |γ| ≈
    NDV(nation)) in exact integer arithmetic.  The err_ppm column is the
    planner-quality readout; actuals fold distributed, estimates need
    only the tiny NDV stats."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderstatus"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])

    def status_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"s": t["o_orderstatus"]}).group_by("s").aggregate([("s", "count")])
        g = g.rename_columns(["s", "n"])
        return pa.table({"s": g["s"], "n": g["n"].cast(pa.int64())})

    st = (
        orders.map_batches(status_partial, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n_orders = int(st["n"].sum())
    ndv_status = len(st)
    actual_filter = int(st.loc[st["s"] == "O", "n"].sum())

    filt = orders.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")), batch_format="pyarrow"
    )
    j = filt.join(
        cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def nat_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"k": t["c_nationkey"].cast(pa.int64())}).group_by("k").aggregate(
            [("k", "count")]
        )
        g = g.rename_columns(["k", "n"])
        return pa.table({"k": g["k"], "n": g["n"].cast(pa.int64())})

    groups = (
        j.map_batches(nat_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    actual_join = int(groups["n"].sum())
    actual_group = len(groups)
    ndv_nation = int(cust.map_batches(
        lambda t: pa.table({"k": t["c_nationkey"].cast(pa.int64())}).group_by("k").aggregate([]),
        batch_format="pyarrow",
    ).groupby("k").aggregate(Count(alias_name="_n")).count())

    est_filter = n_orders // ndv_status
    est_join = est_filter  # FK join preserves cardinality under the rule
    est_group = ndv_nation
    rows = [
        ("1_filter_status_O", est_filter, actual_filter),
        ("2_join_customer", est_join, actual_join),
        ("3_group_by_nation", est_group, actual_group),
    ]
    return pa.table(
        {
            "stage": pa.array([r[0] for r in rows], pa.string()),
            "est_rows": pa.array([r[1] for r in rows], pa.int64()),
            "actual_rows": pa.array([r[2] for r in rows], pa.int64()),
            "err_ppm": pa.array(
                [abs(r[1] - r[2]) * 1_000_000 // max(r[2], 1) for r in rows], pa.int64()
            ),
        }
    )


ORDERS_CARDINALITY_ESTIMATE_AUDIT_SQL = """
WITH stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS ndv_status,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
              AS BIGINT) AS actual_filter
  FROM orders),
nat AS (SELECT CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS ndv_nation
        FROM customer),
jn AS (SELECT CAST(COUNT(*) AS BIGINT) AS actual_join,
              CAST(COUNT(DISTINCT c.c_nationkey) AS BIGINT) AS actual_group
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE o.o_orderstatus = 'O'),
u AS (
  SELECT '1_filter_status_O' AS stage,
         s.n_orders // s.ndv_status AS est_rows,
         s.actual_filter AS actual_rows
  FROM stats s
  UNION ALL
  SELECT '2_join_customer', s.n_orders // s.ndv_status, j.actual_join
  FROM stats s, jn j
  UNION ALL
  SELECT '3_group_by_nation', n.ndv_nation, j.actual_group
  FROM nat n, jn j)
SELECT stage, CAST(est_rows AS BIGINT) AS est_rows,
       CAST(actual_rows AS BIGINT) AS actual_rows,
       CAST(ABS(est_rows - actual_rows) * 1000000
            // GREATEST(actual_rows, 1) AS BIGINT) AS err_ppm
FROM u ORDER BY stage
"""


def embeddings_dim_code_agreement_topk(sf_dir: str):
    """Redundant-DIMENSION detector: for every pair of the 64 embedding
    dimensions, how many vectors carry the SAME ×128 int8 code in both —
    the integer proxy for near-duplicate feature columns a
    dimensionality-reduction pass would drop first.  Each block folds
    one 64×64 agreement matrix (a single broadcasted equality reduce);
    matrices Sum across blocks and the top-20 pairs (agree desc, i, j)
    pop out of the tiny final table."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def block_matrix(t: pa.Table) -> pa.Table:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
        q = np.floor(m * 128.0 + 0.5).astype(np.int64)
        agree = (q[:, :, None] == q[:, None, :]).sum(axis=0).astype(np.int64)
        iu, ju = np.triu_indices(q.shape[1], k=1)
        return pa.table(
            {
                "dim_i": pa.array(iu.astype(np.int64)),
                "dim_j": pa.array(ju.astype(np.int64)),
                "agree": pa.array(agree[iu, ju]),
            }
        )

    return (
        ds.map_batches(block_matrix, batch_format="pyarrow")
        .groupby(["dim_i", "dim_j"])
        .aggregate(Sum("agree", alias_name="agree"))
        .sort(["agree", "dim_i", "dim_j"], descending=[True, False, False])
        .limit(20)
    )


EMBEDDINGS_DIM_CODE_AGREEMENT_TOPK_SQL = """
WITH u AS (SELECT vec_id,
                  CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 128 + 0.5)
                       AS BIGINT) AS code,
                  unnest(range(0, len(embedding))) AS i
           FROM embeddings),
p AS (SELECT a.i AS dim_i, b.i AS dim_j,
             CAST(SUM(CASE WHEN a.code = b.code THEN 1 ELSE 0 END)
                  AS BIGINT) AS agree
      FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i < b.i
      GROUP BY 1, 2)
SELECT CAST(dim_i AS BIGINT) AS dim_i, CAST(dim_j AS BIGINT) AS dim_j, agree
FROM p ORDER BY agree DESC, dim_i, dim_j LIMIT 20
"""


def lineitem_ratio_fallacy_audit(sf_dir: str):
    """The RATIO-OF-SUMS vs SUM-OF-RATIOS pitfall, measured: per return
    flag, the aggregate unit price (Σprice/Σqty, the right answer for
    'average realized unit price') next to the per-row-ratio sum that a
    naive AVG(price/qty) would build from — both in exact integer ppm
    (cross-multiplied aggregate; floor-divided per-row ratios summed as
    int64), so the divergence between the two estimators is itself
    oracle-checked."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        price = _cents(t["l_extendedprice"]).to_numpy()
        qty = _cents(t["l_quantity"]).to_numpy()
        row_ppm = price * 1_000_000 // qty
        g = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "one": pa.array(np.ones(len(price), dtype=np.int64)),
                "sum_price_cents": pa.array(price),
                "sum_qty_cents": pa.array(qty),
                "sum_row_ratio_ppm": pa.array(row_ppm),
            }
        ).group_by("l_returnflag").aggregate(
            [
                ("one", "sum"),
                ("sum_price_cents", "sum"),
                ("sum_qty_cents", "sum"),
                ("sum_row_ratio_ppm", "sum"),
            ]
        )
        return g.rename_columns(
            ["l_returnflag", "n", "sum_price_cents", "sum_qty_cents", "sum_row_ratio_ppm"]
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
            Sum("sum_row_ratio_ppm", alias_name="sum_row_ratio_ppm"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        sp = t["sum_price_cents"].cast(pa.int64()).to_numpy()
        sq = t["sum_qty_cents"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n": t["n"].cast(pa.int64()),
                "sum_price_cents": pa.array(sp, pa.int64()),
                "sum_qty_cents": pa.array(sq, pa.int64()),
                "agg_ratio_ppm": pa.array(sp * 1_000_000 // sq, pa.int64()),
                "sum_row_ratio_ppm": t["sum_row_ratio_ppm"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("l_returnflag")


LINEITEM_RATIO_FALLACY_AUDIT_SQL = """
WITH t AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price,
         CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qty
  FROM lineitem),
s AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(price) AS BIGINT) AS sum_price_cents,
             CAST(SUM(qty) AS BIGINT) AS sum_qty_cents,
             CAST(SUM(price * 1000000 // qty) AS BIGINT) AS sum_row_ratio_ppm
      FROM t GROUP BY 1)
SELECT l_returnflag, n, sum_price_cents, sum_qty_cents,
       CAST(sum_price_cents * 1000000 // sum_qty_cents AS BIGINT)
           AS agg_ratio_ppm,
       sum_row_ratio_ppm
FROM s ORDER BY l_returnflag
"""


def customer_order_hindex_census(sf_dir: str):
    """h-INDEX per customer — the citation metric transplanted to spend:
    the largest h such that the customer has ≥ h orders each worth ≥
    h×$100 — one number capturing depth AND breadth of the relationship
    (neither order count nor total spend alone does).  Per-customer
    groups sort their own orders (bounded); h is max(min(rank,
    value_hundreds)); the output is the integer h histogram."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def per_cust(g: pa.Table) -> pa.Table:
        hundreds = (
            pc.divide(_cents(g["o_totalprice"]), 10_000).to_numpy(zero_copy_only=False)
        )
        v = np.sort(hundreds)[::-1]
        rank = np.arange(1, len(v) + 1, dtype=np.int64)
        h = int(np.maximum(0, np.minimum(rank, v)).max()) if len(v) else 0
        return pa.table({"h": pa.array([h], pa.int64()), "one": pa.array([1], pa.int64())})

    return (
        ds.groupby("o_custkey")
        .map_groups(per_cust, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("one", alias_name="n_customers"))
        .sort("h")
    )


CUSTOMER_ORDER_HINDEX_CENSUS_SQL = """
WITH v AS (
  SELECT o_custkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 10000
             AS hundreds,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY FLOOR(o_totalprice * 100 + 0.5) DESC)
             AS rnk
  FROM orders),
h AS (SELECT o_custkey,
             CAST(MAX(LEAST(rnk, hundreds)) AS BIGINT) AS h
      FROM v GROUP BY 1)
SELECT h, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM h GROUP BY 1 ORDER BY 1
"""


def events_value_winsor_impact_sweep(sf_dir: str):
    """Winsorization IMPACT sweep: how much of the value mass do the
    P90 / P99 / P99.9 caps shave off?  The exact cap quantiles come from
    one sorted-order pick (quantile_disc convention), then a single pass
    counts capped rows and the capped sum per cap level — all integer
    cents, three result rows.  The knee of this curve is how you pick a
    winsor level before training on heavy-tailed rewards."""
    QS = [(90, 0.90), (99, 0.99), (999, 0.999)]
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["value"])

    def cents_only(t: pa.Table) -> pa.Table:
        return pa.table({"cents": _cents(t["value"])})

    cents_ds = ds.map_batches(cents_only, batch_format="pyarrow").materialize()
    # exact distributed quantile selection (histogram-refine) — no
    # driver-side sort of the fact column
    from ...stages.quantiles import exact_quantiles

    qt = exact_quantiles(cents_ds, "cents", [q for _, q in QS])
    caps = {tag: int(v) for (tag, _), v in zip(QS, qt["value"].to_pylist())}
    caps_ref = ray.put(caps)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(caps_ref)
        v = t["cents"].to_numpy(zero_copy_only=False)
        tags, capped, sums = [], [], []
        for tag, _ in QS:
            cap = c[tag]
            tags.append(tag)
            capped.append(int((v > cap).sum()))
            sums.append(int(np.minimum(v, cap).sum()))
        return pa.table(
            {
                "q_tag": pa.array(tags, pa.int64()),
                "n_capped": pa.array(capped, pa.int64()),
                "sum_after_cents": pa.array(sums, pa.int64()),
            }
        )

    folded = (
        cents_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("q_tag")
        .aggregate(
            Sum("n_capped", alias_name="n_capped"),
            Sum("sum_after_cents", alias_name="sum_after_cents"),
        )
        .to_pandas()
        .sort_values("q_tag")
    )
    total = int(cents_ds.aggregate(Sum("cents"))["sum(cents)"])
    return pa.table(
        {
            "q_tag": pa.array(folded["q_tag"].to_numpy(dtype=np.int64), pa.int64()),
            "cap_cents": pa.array(
                [caps[int(t)] for t in folded["q_tag"]], pa.int64()
            ),
            "n_capped": pa.array(folded["n_capped"].to_numpy(dtype=np.int64), pa.int64()),
            "sum_before_cents": pa.array([total] * len(folded), pa.int64()),
            "sum_after_cents": pa.array(
                folded["sum_after_cents"].to_numpy(dtype=np.int64), pa.int64()
            ),
        }
    )


EVENTS_VALUE_WINSOR_IMPACT_SWEEP_SQL = """
WITH c AS (SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
q AS (SELECT CAST(quantile_disc(cents, 0.90) AS BIGINT) AS c90,
             CAST(quantile_disc(cents, 0.99) AS BIGINT) AS c99,
             CAST(quantile_disc(cents, 0.999) AS BIGINT) AS c999,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM c),
u AS (
  SELECT 90 AS q_tag, q.c90 AS cap_cents,
         (SELECT CAST(SUM(CASE WHEN cents > q.c90 THEN 1 ELSE 0 END)
                      AS BIGINT) FROM c) AS n_capped,
         q.total AS sum_before_cents,
         (SELECT CAST(SUM(LEAST(cents, q.c90)) AS BIGINT) FROM c)
             AS sum_after_cents
  FROM q
  UNION ALL
  SELECT 99, q.c99,
         (SELECT CAST(SUM(CASE WHEN cents > q.c99 THEN 1 ELSE 0 END)
                      AS BIGINT) FROM c),
         q.total,
         (SELECT CAST(SUM(LEAST(cents, q.c99)) AS BIGINT) FROM c)
  FROM q
  UNION ALL
  SELECT 999, q.c999,
         (SELECT CAST(SUM(CASE WHEN cents > q.c999 THEN 1 ELSE 0 END)
                      AS BIGINT) FROM c),
         q.total,
         (SELECT CAST(SUM(LEAST(cents, q.c999)) AS BIGINT) FROM c)
  FROM q)
SELECT CAST(q_tag AS BIGINT) AS q_tag, cap_cents, n_capped,
       sum_before_cents, sum_after_cents
FROM u ORDER BY q_tag
"""


def docs_reshard_movement_audit(sf_dir: str):
    """RESHARD data-movement audit — the operational cost of growing a
    corpus from 10 to 12 shards under two placement schemes: naive
    modulo (docs move whenever id%10 ≠ id%12 — almost everything) vs
    contiguous range sharding (only boundary spans move).  Exact integer
    placement arithmetic per row, one tiny fold — the measurement that
    motivates consistent hashing before anyone ships a mod-N layout."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    n_total = ds.count()
    span_old = (n_total + 9) // 10
    span_new = (n_total + 11) // 12
    meta = ray.put((span_old, span_new))

    def partial(t: pa.Table) -> pa.Table:
        so, sn = ray.get(meta)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mod_moved = int((ids % 10 != ids % 12).sum())
        range_moved = int((ids // so != ids // sn).sum())
        return pa.table(
            {
                "scheme": pa.array(["mod", "range"], pa.string()),
                "n_docs": pa.array([len(ids)] * 2, pa.int64()),
                "n_moved": pa.array([mod_moved, range_moved], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("scheme")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_moved", alias_name="n_moved"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_docs"].cast(pa.int64()).to_numpy()
        m = t["n_moved"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "scheme": t["scheme"],
                "n_docs": pa.array(n, pa.int64()),
                "n_moved": pa.array(m, pa.int64()),
                "moved_ppm": pa.array(m * 1_000_000 // n, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("scheme")


DOCS_RESHARD_MOVEMENT_AUDIT_SQL = """
WITH meta AS (SELECT (COUNT(*) + 9) // 10 AS so, (COUNT(*) + 11) // 12 AS sn
              FROM documents),
t AS (SELECT d.doc_id, m.so, m.sn FROM documents d, meta m),
u AS (
  SELECT 'mod' AS scheme, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN doc_id % 10 <> doc_id % 12 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_moved
  FROM t
  UNION ALL
  SELECT 'range', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN doc_id // so <> doc_id // sn THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM t)
SELECT scheme, n_docs, n_moved,
       CAST(n_moved * 1000000 // n_docs AS BIGINT) AS moved_ppm
FROM u ORDER BY scheme
"""


def tables_schema_census(sf_dir: str):
    """CATALOG census — zero-data-read schema inventory of every table in
    the corpus: column count and the ordered column-name signature,
    straight from parquet FOOTER metadata (pyarrow reads only the
    footer; no row groups are touched).  The data-contract fingerprint a
    multi-tenant lake checks before accepting a new drop; the oracle
    reads the same answer through information_schema."""
    import pyarrow.parquet as pq

    tables = [
        "customer",
        "documents",
        "embeddings",
        "events",
        "lineitem",
        "nation",
        "orders",
        "part",
        "region",
        "supplier",
    ]
    names, n_cols, sigs = [], [], []
    for t in tables:
        schema = pq.read_schema(_t(sf_dir, t))
        names.append(t)
        n_cols.append(len(schema.names))
        sigs.append(",".join(schema.names))
    return pa.table(
        {
            "table_name": pa.array(names, pa.string()),
            "n_cols": pa.array(n_cols, pa.int64()),
            "col_signature": pa.array(sigs, pa.string()),
        }
    )


TABLES_SCHEMA_CENSUS_SQL = """
SELECT table_name, CAST(COUNT(*) AS BIGINT) AS n_cols,
       string_agg(column_name, ',' ORDER BY ordinal_position)
           AS col_signature
FROM information_schema.columns
WHERE table_name IN ('customer', 'documents', 'embeddings', 'events',
                     'lineitem', 'nation', 'orders', 'part', 'region',
                     'supplier')
GROUP BY 1 ORDER BY 1
"""


def orders_topk_stability_halves(sf_dir: str):
    """SPLIT-HALF stability of a leaderboard — the deterministic
    bootstrap: top-10 customers by spend computed independently on the
    even- and odd-orderkey halves of the fact table.  If the halves
    disagree wildly, the full-data top-10 is noise, not signal.  Spend
    partials fold per half in one pass (the parity tag rides the
    groupby key); each half's top-10 is a tiny sort."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        half = pc.subtract(t["o_orderkey"], pc.multiply(pc.divide(t["o_orderkey"], 2), 2))
        g = pa.table(
            {
                "half": half,
                "c_custkey": t["o_custkey"],
                "spend_cents": _cents(t["o_totalprice"]),
            }
        ).group_by(["half", "c_custkey"]).aggregate([("spend_cents", "sum")])
        return g.rename_columns(["half", "c_custkey", "spend_cents"])

    spend = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["half", "c_custkey"])
        .aggregate(Sum("spend_cents", alias_name="spend_cents"))
    )

    def topk(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("spend_cents", "descending"), ("c_custkey", "ascending")]
        ).slice(0, 10)
        s = g.take(order)
        return pa.table(
            {
                "half": s["half"].cast(pa.int64()),
                "rnk": pa.array(range(1, s.num_rows + 1), pa.int64()),
                "c_custkey": s["c_custkey"].cast(pa.int64()),
                "spend_cents": s["spend_cents"].cast(pa.int64()),
            }
        )

    return (
        spend.groupby("half").map_groups(topk, batch_format="pyarrow").sort(["half", "rnk"])
    )


ORDERS_TOPK_STABILITY_HALVES_SQL = """
WITH s AS (
  SELECT o_orderkey % 2 AS half, o_custkey AS c_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS spend_cents
  FROM orders GROUP BY 1, 2),
r AS (SELECT half, c_custkey, spend_cents,
             ROW_NUMBER() OVER (PARTITION BY half
                                ORDER BY spend_cents DESC, c_custkey) AS rnk
      FROM s)
SELECT CAST(half AS BIGINT) AS half, CAST(rnk AS BIGINT) AS rnk,
       c_custkey, spend_cents
FROM r WHERE rnk <= 10 ORDER BY half, rnk
"""


def lineitem_partition_balance_mod16(sf_dir: str):
    """Partitioning-key BALANCE comparison: row counts per mod-16
    partition under the three candidate keys (orderkey / suppkey /
    partkey), summarized as max/min partition size and imbalance ppm of
    the max over the mean — the pre-flight a 100 TB job runs before
    committing to a bucket key.  One pass builds all three schemes'
    histograms block-locally; the fold is 48 tiny rows."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_partkey"]
    )
    KEYS = ["l_orderkey", "l_suppkey", "l_partkey"]

    def partial(t: pa.Table) -> pa.Table:
        outs = []
        for k in KEYS:
            v = t[k].to_numpy(zero_copy_only=False)
            counts = np.bincount(v % 16, minlength=16)
            outs.append(
                pa.table(
                    {
                        "scheme": pa.array([k] * 16, pa.string()),
                        "part_id": pa.array(np.arange(16, dtype=np.int64)),
                        "n": pa.array(counts.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(outs)

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["scheme", "part_id"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for k in KEYS:
        sub = parts[parts["scheme"] == k]
        n = int(sub["n"].sum())
        mx, mn = int(sub["n"].max()), int(sub["n"].min())
        rows.append((k, n, mx, mn, (mx * 16 - n) * 1_000_000 // n))
    return pa.table(
        {
            "scheme": pa.array([r[0] for r in rows], pa.string()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "max_part": pa.array([r[2] for r in rows], pa.int64()),
            "min_part": pa.array([r[3] for r in rows], pa.int64()),
            "imbalance_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


LINEITEM_PARTITION_BALANCE_MOD16_SQL = """
WITH u AS (
  SELECT 'l_orderkey' AS scheme, l_orderkey % 16 AS part_id FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', l_suppkey % 16 FROM lineitem
  UNION ALL
  SELECT 'l_partkey', l_partkey % 16 FROM lineitem),
c0 AS (SELECT scheme, part_id, CAST(COUNT(*) AS BIGINT) AS n
       FROM u GROUP BY 1, 2),
grid AS (SELECT s.scheme, g.part_id
         FROM (SELECT DISTINCT scheme FROM u) s
         CROSS JOIN (SELECT unnest(range(0, 16)) AS part_id) g),
c AS (SELECT grid.scheme, grid.part_id, COALESCE(c0.n, 0) AS n
      FROM grid LEFT JOIN c0
        ON grid.scheme = c0.scheme AND grid.part_id = c0.part_id),
s AS (SELECT scheme, CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(MAX(n) AS BIGINT) AS max_part,
             CAST(MIN(n) AS BIGINT) AS min_part
      FROM c GROUP BY 1)
SELECT scheme, n_rows, max_part, min_part,
       CAST((max_part * 16 - n_rows) * 1000000 // n_rows AS BIGINT)
           AS imbalance_ppm
FROM s ORDER BY scheme
"""


def events_attribution_last_touch_contrast(sf_dir: str):
    """FIRST- vs LAST-touch attribution CONTRAST per event type: each
    (user, day)'s total value credited once to the day's first event
    type and once to its last, with the per-type delta — the number that
    settles which attribution model flatters which channel.  One
    co-partition by user; the kernel derives day boundaries and both
    endpoint types in a single sorted pass; integer cents end to end."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id", "value"])

    def per_user(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        typ = np.asarray(g["event_type"].combine_chunks().to_numpy(zero_copy_only=False))
        cents = _cents(g["value"]).to_numpy()
        order = np.lexsort((eid, ts))
        ts, typ, cents = ts[order], typ[order], cents[order]
        day = ts // 86_400_000_000
        new_day = np.r_[True, day[1:] != day[:-1]]
        starts = np.flatnonzero(new_day)
        ends = np.r_[starts[1:] - 1, len(day) - 1]
        day_sum = np.add.reduceat(cents, starts)
        first_t = typ[starts]
        last_t = typ[ends]
        out = {}
        for t_, s_ in zip(first_t, day_sum):
            a = out.setdefault(t_, [0, 0])
            a[0] += int(s_)
        for t_, s_ in zip(last_t, day_sum):
            a = out.setdefault(t_, [0, 0])
            a[1] += int(s_)
        keys = sorted(out)
        return pa.table(
            {
                "event_type": pa.array(keys, pa.string()),
                "first_cents": pa.array([out[k][0] for k in keys], pa.int64()),
                "last_cents": pa.array([out[k][1] for k in keys], pa.int64()),
            }
        )

    folded = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("first_cents", alias_name="first_cents"),
            Sum("last_cents", alias_name="last_cents"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        f = t["first_cents"].cast(pa.int64())
        l = t["last_cents"].cast(pa.int64())
        return pa.table(
            {
                "event_type": t["event_type"],
                "first_cents": f,
                "last_cents": l,
                "delta_cents": pc.subtract(l, f),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort("event_type")


EVENTS_ATTRIBUTION_LAST_TOUCH_CONTRAST_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
ranked AS (
  SELECT user_id, d, event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY user_id, d
                            ORDER BY ts, event_id) AS rf,
         ROW_NUMBER() OVER (PARTITION BY user_id, d
                            ORDER BY ts DESC, event_id DESC) AS rl
  FROM e),
day_tot AS (SELECT user_id, d, CAST(SUM(cents) AS BIGINT) AS day_cents
            FROM e GROUP BY 1, 2),
f AS (SELECT r.event_type, CAST(SUM(t.day_cents) AS BIGINT) AS first_cents
      FROM ranked r JOIN day_tot t
        ON r.user_id = t.user_id AND r.d = t.d
      WHERE r.rf = 1 GROUP BY 1),
l AS (SELECT r.event_type, CAST(SUM(t.day_cents) AS BIGINT) AS last_cents
      FROM ranked r JOIN day_tot t
        ON r.user_id = t.user_id AND r.d = t.d
      WHERE r.rl = 1 GROUP BY 1)
SELECT COALESCE(f.event_type, l.event_type) AS event_type,
       CAST(COALESCE(f.first_cents, 0) AS BIGINT) AS first_cents,
       CAST(COALESCE(l.last_cents, 0) AS BIGINT) AS last_cents,
       CAST(COALESCE(l.last_cents, 0) - COALESCE(f.first_cents, 0)
            AS BIGINT) AS delta_cents
FROM f FULL JOIN l ON f.event_type = l.event_type
ORDER BY 1
"""


def docs_dedup_policy_contrast(sf_dir: str):
    """Survivorship-POLICY sensitivity audit: across exact-text duplicate
    families, how often do two reasonable canonical-pick rules (keep
    min doc_id vs keep longest-then-min-id) choose DIFFERENT survivors?
    The number that tells you whether your dedup output is stable under
    policy churn.  Families form by grouping on the text itself
    (SQL-reproducible, unlike hashed families); per-family argmins are
    tiny Arrow kernels after block-local (text, stats) shrink."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"])

    def cells(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"text": t["text"], "doc_id": t["doc_id"], "n_chars": t["n_chars"]}
        ).group_by("text").aggregate([("doc_id", "min"), ("n_chars", "max"), ("doc_id", "count")])
        return g.rename_columns(["text", "min_id", "max_chars", "n"])

    # winner under policy B needs the min doc_id AMONG max-length members;
    # carry (n_chars, doc_id) pairs per family via a second pass keyed the
    # same way — both folds are block-shrunk before the text groupby
    def cells_b(t: pa.Table) -> pa.Table:
        # per (text, n_chars): min doc_id — enough to derive policy B
        g = pa.table(
            {"text": t["text"], "n_chars": t["n_chars"], "doc_id": t["doc_id"]}
        ).group_by(["text", "n_chars"]).aggregate([("doc_id", "min")])
        return g.rename_columns(["text", "n_chars", "min_id_at_len"])

    fam = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("text")
        .aggregate(
            Min("min_id", alias_name="min_id"),
            Max("max_chars", alias_name="max_chars"),
            Sum("n", alias_name="n"),
        )
    )
    by_len = (
        ds.map_batches(cells_b, batch_format="pyarrow")
        .groupby(["text", "n_chars"])
        .aggregate(Min("min_id_at_len", alias_name="min_id_at_len"))
    )
    fam_pd = fam.to_pandas()
    len_pd = by_len.to_pandas()
    merged = len_pd.merge(
        fam_pd[["text", "max_chars"]], on="text", how="inner"
    )
    b_pick = (
        merged[merged["n_chars"] == merged["max_chars"]]
        .groupby("text")["min_id_at_len"]
        .min()
        .rename("b_id")
        .reset_index()
    )
    j = fam_pd.merge(b_pick, on="text")
    n_families = len(j)
    multi = j[j["n"] > 1]
    n_multi = len(multi)
    n_disagree = int((multi["min_id"] != multi["b_id"]).sum())
    return pa.table(
        {
            "n_families": pa.array([n_families], pa.int64()),
            "n_multidoc_families": pa.array([n_multi], pa.int64()),
            "n_policy_disagree": pa.array([n_disagree], pa.int64()),
        }
    )


DOCS_DEDUP_POLICY_CONTRAST_SQL = """
WITH fam AS (
  SELECT text, CAST(MIN(doc_id) AS BIGINT) AS min_id,
         CAST(MAX(n_chars) AS BIGINT) AS max_chars,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1),
b AS (SELECT d.text, CAST(MIN(d.doc_id) AS BIGINT) AS b_id
      FROM documents d JOIN fam f
        ON d.text = f.text AND d.n_chars = f.max_chars
      GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_families,
       CAST(SUM(CASE WHEN fam.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_multidoc_families,
       CAST(SUM(CASE WHEN fam.n > 1 AND fam.min_id <> b.b_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_policy_disagree
FROM fam JOIN b ON fam.text = b.text
"""


def customer_360_panel(sf_dir: str):
    """FEATURE-STORE panel: one wide row per customer fusing the base dim
    with order-side and event-side aggregates (shared id space, FK-
    contained).  JOIN-FREE: each source emits tagged partial rows with
    zeros in the other sides' columns and ONE groupby(custkey) Sum fuses
    the panel — a single shuffle of pre-aggregated rows, immune to the
    tiny-input empty-partition join pitfall and exactly the additive-
    fusion shape that scales (orders/events pre-shrink per block)."""
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_acctbal"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    events = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "value"])

    COLS = ["acctbal_cents", "n_orders", "spend_cents", "n_events", "event_cents"]

    def tagged(k, **vals):
        n = len(k)
        cols = {"c_custkey": k}
        for c in COLS:
            cols[c] = vals.get(c, pa.array(np.zeros(n, dtype=np.int64)))
        return pa.table(cols)

    def c_part(t: pa.Table) -> pa.Table:
        return tagged(t["c_custkey"].cast(pa.int64()), acctbal_cents=_cents(t["c_acctbal"]))

    def o_part(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "k": t["o_custkey"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "cents": _cents(t["o_totalprice"]),
            }
        ).group_by("k").aggregate([("one", "sum"), ("cents", "sum")])
        g = g.rename_columns(["k", "n_orders", "spend_cents"])
        return tagged(
            g["k"].cast(pa.int64()),
            n_orders=g["n_orders"].cast(pa.int64()),
            spend_cents=g["spend_cents"].cast(pa.int64()),
        )

    def e_part(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "k": t["user_id"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "cents": _cents(t["value"]),
            }
        ).group_by("k").aggregate([("one", "sum"), ("cents", "sum")])
        g = g.rename_columns(["k", "n_events", "event_cents"])
        return tagged(
            g["k"].cast(pa.int64()),
            n_events=g["n_events"].cast(pa.int64()),
            event_cents=g["event_cents"].cast(pa.int64()),
        )

    unioned = (
        cust.map_batches(c_part, batch_format="pyarrow")
        .union(orders.map_batches(o_part, batch_format="pyarrow"))
        .union(events.map_batches(e_part, batch_format="pyarrow"))
    )
    out = unioned.groupby("c_custkey").aggregate(
        *[Sum(c, alias_name=c) for c in COLS]
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {"c_custkey": t["c_custkey"].cast(pa.int64())}
        for c in COLS:
            cols[c] = t[c].cast(pa.int64())
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow").sort("c_custkey")


CUSTOMER_360_PANEL_SQL = """
WITH o AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS spend_cents
           FROM orders GROUP BY 1),
e AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                 AS event_cents
      FROM events GROUP BY 1)
SELECT c.c_custkey,
       CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(o.spend_cents, 0) AS BIGINT) AS spend_cents,
       CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(e.event_cents, 0) AS BIGINT) AS event_cents
FROM customer c
LEFT JOIN o ON c.c_custkey = o.k
LEFT JOIN e ON c.c_custkey = e.k
ORDER BY c.c_custkey
"""


def docs_heaps_beta_two_point(sf_dir: str):
    """Heaps'-law exponent from a TWO-CHECKPOINT fit per source: vocabulary
    V grows ≈ K·Nᵝ, so β = ln(V₂/V₁)/ln(N₂/N₁) with checkpoint 1 = the
    lower-doc_id half and checkpoint 2 = the full corpus — the growth-law
    parameter that predicts vocab size at 100× scale from today's corpus.
    Token/type counts are exact integers per checkpoint (block partials →
    (source, term) fold); β is one scalar libm tree per source."""
    import math

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source", "text"])
    mm = ds.aggregate(Min("doc_id"), Max("doc_id"))
    mid = (int(mm["min(doc_id)"]) + int(mm["max(doc_id)"])) // 2

    def partial(t: pa.Table, mid=mid) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        src = t["source"].take(parents)
        ids = t["doc_id"].take(parents)
        keep = pc.not_equal(flat, "")
        even = pc.less_equal(ids, mid)
        tb = pa.table(
            {
                "source": src.filter(keep),
                "term": flat.filter(keep),
                "even": pc.cast(even, pa.int64()).filter(keep),
            }
        )
        g = tb.group_by(["source", "term"]).aggregate([("term", "count"), ("even", "sum")])
        g = g.rename_columns(["source", "term", "n_all", "n_even"])
        return pa.table(
            {
                "source": g["source"],
                "term": g["term"],
                "n_all": g["n_all"].cast(pa.int64()),
                "n_even": g["n_even"].cast(pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(Sum("n_all", alias_name="n_all"), Sum("n_even", alias_name="n_even"))
    )

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t["source"],
                "n2_tokens": t["n_all"].cast(pa.int64()),
                "v2": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "n1_tokens": t["n_even"].cast(pa.int64()),
                "v1": pc.cast(pc.greater(t["n_even"], 0), pa.int64()),
            }
        )

    agg = (
        counts.map_batches(fold, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n2_tokens", alias_name="n2_tokens"),
            Sum("v2", alias_name="v2"),
            Sum("n1_tokens", alias_name="n1_tokens"),
            Sum("v1", alias_name="v1"),
        )
        .to_pandas()
        .sort_values("source")
    )
    agg = agg[
        (agg["v1"] > 0) & (agg["n1_tokens"] > 0) & (agg["n1_tokens"] < agg["n2_tokens"])
    ].reset_index(drop=True)
    beta = [
        math.log(float(v2) / v1) / math.log(float(n2) / n1)
        for v1, v2, n1, n2 in zip(agg["v1"], agg["v2"], agg["n1_tokens"], agg["n2_tokens"])
    ]
    return pa.table(
        {
            "source": pa.array(agg["source"], pa.string()),
            "n1_tokens": pa.array(agg["n1_tokens"].to_numpy(dtype=np.int64), pa.int64()),
            "v1": pa.array(agg["v1"].to_numpy(dtype=np.int64), pa.int64()),
            "n2_tokens": pa.array(agg["n2_tokens"].to_numpy(dtype=np.int64), pa.int64()),
            "v2": pa.array(agg["v2"].to_numpy(dtype=np.int64), pa.int64()),
            "heaps_beta": pa.array(beta, pa.float64()),
        }
    )


DOCS_HEAPS_BETA_TWO_POINT_SQL = """
WITH t AS (
  SELECT source, doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents),
mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
c AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(CASE WHEN doc_id <= (SELECT m FROM mid)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_even
      FROM t GROUP BY 1, 2),
s AS (SELECT source, CAST(SUM(n_all) AS BIGINT) AS n2_tokens,
             CAST(COUNT(*) AS BIGINT) AS v2,
             CAST(SUM(n_even) AS BIGINT) AS n1_tokens,
             CAST(SUM(CASE WHEN n_even > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS v1
      FROM c GROUP BY 1)
SELECT source, n1_tokens, v1, n2_tokens, v2,
       LN(CAST(v2 AS DOUBLE) / v1) / LN(CAST(n2_tokens AS DOUBLE) / n1_tokens)
           AS heaps_beta
FROM s WHERE v1 > 0 AND n1_tokens > 0 AND n1_tokens < n2_tokens
ORDER BY source
"""


def events_type_skip2_matrix(sf_dir: str):
    """Skip-2 transition matrix — (type at t, type at t+2) counts over
    each user's (ts, event_id)-ordered stream: the second-order
    dependence the 1-step matrix can't see (A→?→C regularities survive
    an intervening noise event).  Per-user kernel is one lexsort and a
    shifted pair count; the global fold is a ≤|types|² groupby."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"])

    def per_user(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        typ = np.asarray(g["event_type"].combine_chunks().to_numpy(zero_copy_only=False))
        if len(typ) < 3:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_c": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((eid, ts))
        s = typ[order]
        import pandas as pd

        df = pd.DataFrame({"type_a": s[:-2], "type_c": s[2:]})
        g2 = df.groupby(["type_a", "type_c"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "type_a": pa.array(g2["type_a"], pa.string()),
                "type_c": pa.array(g2["type_c"], pa.string()),
                "n": pa.array(g2["n"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["type_a", "type_c"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["type_a", "type_c"])
    )


EVENTS_TYPE_SKIP2_MATRIX_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS type_c
  FROM events)
SELECT event_type AS type_a, type_c, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE type_c IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def geo_hierarchy_rollup_revenue(sf_dir: str):
    """Geographic-HIERARCHY rollup with subtotal rows: order revenue at
    region, nation and (nation × segment) grain plus the grand total,
    each row tagged with its level — the drill-down cube a BI layer asks
    for in one query.  The finest grain folds once from block partials
    (customer dim broadcasts its three attributes); every coarser level
    re-aggregates the tiny finest table, so the fact scans once."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    ).to_pandas()
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    region = rd.read_parquet(_t(sf_dir, "region")).to_pandas()
    nat_name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    reg_of_nat = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    reg_name = dict(zip(region["r_regionkey"], region["r_name"]))
    nk_of = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    maps = ray.put((nk_of, seg_of))

    def partial(t: pa.Table) -> pa.Table:
        nk_m, seg_m = ray.get(maps)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = _cents(t["o_totalprice"]).to_numpy()
        nk = np.array([nk_m[k] for k in keys], dtype=np.int64)
        seg = [seg_m[k] for k in keys]
        g = pa.table(
            {
                "nk": pa.array(nk),
                "seg": pa.array(seg, pa.string()),
                "cents": pa.array(cents),
                "one": pa.array(np.ones(len(nk), dtype=np.int64)),
            }
        ).group_by(["nk", "seg"]).aggregate([("cents", "sum"), ("one", "sum")])
        return g.rename_columns(["nk", "seg", "cents", "n"])

    fine = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["nk", "seg"])
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for r in fine.itertuples():
        nn = nat_name[r.nk]
        rows.append(
            ("3_nation_segment", reg_name[reg_of_nat[r.nk]], nn + "/" + r.seg, int(r.cents), int(r.n))
        )
    by_nat = fine.groupby("nk").agg(cents=("cents", "sum"), n=("n", "sum")).reset_index()
    for r in by_nat.itertuples():
        rows.append(
            ("2_nation", reg_name[reg_of_nat[r.nk]], nat_name[r.nk], int(r.cents), int(r.n))
        )
    by_nat["rk"] = by_nat["nk"].map(reg_of_nat)
    by_reg = by_nat.groupby("rk").agg(cents=("cents", "sum"), n=("n", "sum")).reset_index()
    for r in by_reg.itertuples():
        rows.append(("1_region", reg_name[r.rk], "", int(r.cents), int(r.n)))
    rows.append(("0_total", "", "", int(fine["cents"].sum()), int(fine["n"].sum())))
    rows.sort()
    return pa.table(
        {
            "level": pa.array([r[0] for r in rows], pa.string()),
            "region": pa.array([r[1] for r in rows], pa.string()),
            "detail": pa.array([r[2] for r in rows], pa.string()),
            "revenue_cents": pa.array([r[3] for r in rows], pa.int64()),
            "n_orders": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


GEO_HIERARCHY_ROLLUP_REVENUE_SQL = """
WITH base AS (
  SELECT r.r_name AS region, n.n_name AS nation, c.c_mktsegment AS seg,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey),
u AS (
  SELECT '3_nation_segment' AS level, region, nation || '/' || seg AS detail,
         CAST(SUM(cents) AS BIGINT) AS revenue_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM base GROUP BY 1, 2, 3
  UNION ALL
  SELECT '2_nation', region, nation, CAST(SUM(cents) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM base GROUP BY 1, 2, 3
  UNION ALL
  SELECT '1_region', region, '', CAST(SUM(cents) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM base GROUP BY 1, 2, 3
  UNION ALL
  SELECT '0_total', '', '', CAST(SUM(cents) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM base)
SELECT level, region, detail, revenue_cents, n_orders
FROM u ORDER BY level, region, detail
"""


def tables_fact_ratio_audit(sf_dir: str):
    """Cross-table VOLUME invariants: the row-count ratios every load
    pipeline asserts before accepting a drop (lineitems per order,
    orders per customer, events per customer) as exact integer ppm —
    drift in these is the first sign of a partial load or duplicated
    feed.  Counts are metadata-cheap scans; the audit itself is O(1)."""
    counts = {}
    for t in ["lineitem", "orders", "customer", "events"]:
        counts[t] = rd.read_parquet(_t(sf_dir, t)).count()
    pairs = [
        ("lineitem/orders", counts["lineitem"], counts["orders"]),
        ("orders/customer", counts["orders"], counts["customer"]),
        ("events/customer", counts["events"], counts["customer"]),
    ]
    return pa.table(
        {
            "ratio": pa.array([p[0] for p in pairs], pa.string()),
            "n_num": pa.array([p[1] for p in pairs], pa.int64()),
            "n_den": pa.array([p[2] for p in pairs], pa.int64()),
            "ratio_ppm": pa.array(
                [p[1] * 1_000_000 // p[2] for p in pairs], pa.int64()
            ),
        }
    )


TABLES_FACT_RATIO_AUDIT_SQL = """
WITH c AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS l,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS o,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS cu,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS e)
SELECT 'lineitem/orders' AS ratio, l AS n_num, o AS n_den,
       CAST(l * 1000000 // o AS BIGINT) AS ratio_ppm FROM c
UNION ALL
SELECT 'orders/customer', o, cu, CAST(o * 1000000 // cu AS BIGINT) FROM c
UNION ALL
SELECT 'events/customer', e, cu, CAST(e * 1000000 // cu AS BIGINT) FROM c
ORDER BY ratio
"""


def orders_join_plan_decision_audit(sf_dir: str):
    """ADAPTIVE join planning as an auditable op: the engine inspects the
    two sides' row counts (parquet metadata, zero data read), picks
    broadcast vs partitioned-shuffle by the same threshold rule
    stages/broadcast.py uses, sizes num_partitions from the fact count,
    THEN executes revenue-by-nation through the chosen plan — emitting
    the decision inputs, the decision, and the executed total as one
    auditable row.  The oracle recomputes both the arithmetic and the
    total."""
    import pyarrow.parquet as pq

    n_fact = pq.read_metadata(_t(sf_dir, "orders")).num_rows
    n_dim = pq.read_metadata(_t(sf_dir, "customer")).num_rows
    decision = "broadcast" if n_dim <= 100_000 else "shuffle"
    num_partitions = min(max(n_fact // 50_000, 2), 32)

    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])

    if decision == "broadcast":
        cm = cust.to_pandas()
        nat_of = dict(zip(cm["c_custkey"], cm["c_nationkey"]))
        ref = ray.put(nat_of)

        def partial(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            keys = t["o_custkey"].to_numpy(zero_copy_only=False)
            nk = np.array([m[k] for k in keys], dtype=np.int64)
            g = pa.table(
                {"nk": pa.array(nk), "cents": _cents(t["o_totalprice"])}
            ).group_by("nk").aggregate([("cents", "sum")])
            return g.rename_columns(["nk", "cents"])

        agg = (
            orders.map_batches(partial, batch_format="pyarrow")
            .groupby("nk")
            .aggregate(Sum("cents", alias_name="cents"))
            .to_pandas()
        )
    else:
        j = orders.map_batches(
            lambda t: pa.table(
                {"o_custkey": t["o_custkey"], "cents": _cents(t["o_totalprice"])}
            ),
            batch_format="pyarrow",
        ).join(
            cust,
            join_type="inner",
            num_partitions=int(num_partitions),
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        agg = (
            j.map_batches(
                lambda t: pa.table(
                    {"nk": t["c_nationkey"].cast(pa.int64()), "cents": t["cents"]}
                ).group_by("nk").aggregate([("cents", "sum")]).rename_columns(["nk", "cents"]),
                batch_format="pyarrow",
            )
            .groupby("nk")
            .aggregate(Sum("cents", alias_name="cents"))
            .to_pandas()
        )
    total = int(agg["cents"].sum())
    n_nations = len(agg)
    return pa.table(
        {
            "n_fact": pa.array([n_fact], pa.int64()),
            "n_dim": pa.array([n_dim], pa.int64()),
            "decision": pa.array([decision], pa.string()),
            "num_partitions": pa.array([int(num_partitions)], pa.int64()),
            "n_nations": pa.array([n_nations], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
        }
    )


ORDERS_JOIN_PLAN_DECISION_AUDIT_SQL = """
WITH c AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_fact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_dim),
j AS (SELECT CAST(COUNT(DISTINCT cu.c_nationkey) AS BIGINT) AS n_nations,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS total_cents
      FROM orders o JOIN customer cu ON o.o_custkey = cu.c_custkey)
SELECT c.n_fact, c.n_dim,
       CASE WHEN c.n_dim <= 100000 THEN 'broadcast' ELSE 'shuffle' END
           AS decision,
       CAST(LEAST(GREATEST(c.n_fact // 50000, 2), 32) AS BIGINT)
           AS num_partitions,
       j.n_nations, j.total_cents
FROM c, j
"""


def docs_length_gate_sweep(sf_dir: str):
    """Quality-GATE threshold sweep: survivors and retained character
    mass at three minimum-length gates (50/100/150 chars) in one pass —
    the curve you read before fixing a corpus filter (too high throws
    away mass, too low lets fragments through).  Pure integer block
    partials, 3-row fold."""
    GATES = [50, 100, 150]
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        n = t["n_chars"].to_numpy(zero_copy_only=False)
        gates, survivors, mass = [], [], []
        for g in GATES:
            gates.append(g)
            keep = n >= g
            survivors.append(int(keep.sum()))
            mass.append(int(n[keep].sum()))
        return pa.table(
            {
                "min_chars": pa.array(gates, pa.int64()),
                "n_survivors": pa.array(survivors, pa.int64()),
                "chars_retained": pa.array(mass, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("min_chars")
        .aggregate(
            Sum("n_survivors", alias_name="n_survivors"),
            Sum("chars_retained", alias_name="chars_retained"),
        )
        .sort("min_chars")
    )


DOCS_LENGTH_GATE_SWEEP_SQL = """
WITH g AS (SELECT CAST(unnest([50, 100, 150]) AS BIGINT) AS min_chars)
SELECT g.min_chars,
       CAST(SUM(CASE WHEN d.n_chars >= g.min_chars THEN 1 ELSE 0 END)
            AS BIGINT) AS n_survivors,
       CAST(SUM(CASE WHEN d.n_chars >= g.min_chars THEN d.n_chars ELSE 0
                END) AS BIGINT) AS chars_retained
FROM g CROSS JOIN documents d
GROUP BY 1 ORDER BY 1
"""


def docs_base64_roundtrip_census(sf_dir: str):
    """Base64 TRANSPORT-ENCODING parity: every document is encoded with
    the stdlib RFC 4648 encoder, decoded back (byte-identity asserted
    in-pipeline), and the census carries the encoded length plus the
    first 16 encoded characters — which the oracle reproduces with
    DuckDB's own base64(), so the two engines' encoders are proven
    byte-compatible, not just length-compatible.  The wire-format check
    an export path needs before shipping blobs through JSON."""
    import base64

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def census(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        lens, prefixes = [], []
        for s in texts:
            raw = s.encode("utf-8")
            b64 = base64.b64encode(raw)
            if base64.b64decode(b64) != raw:
                raise ValueError("base64 round-trip mismatch")
            lens.append(len(b64))
            prefixes.append(b64[:16].decode("ascii"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "b64_len": pa.array(lens, pa.int64()),
                "b64_prefix16": pa.array(prefixes, pa.string()),
            }
        )

    return ds.map_batches(census, batch_format="pyarrow").sort("doc_id")


DOCS_BASE64_ROUNDTRIP_CENSUS_SQL = """
SELECT doc_id,
       CAST(length(base64(encode(text))) AS BIGINT) AS b64_len,
       substr(base64(encode(text)), 1, 16) AS b64_prefix16
FROM documents ORDER BY doc_id
"""


def orders_open_aging_buckets(sf_dir: str):
    """Open-order AGING snapshot: non-final orders bucketed by age
    relative to the corpus watermark (max order date) into the
    0–30 / 31–90 / 91–365 / 365+ day shelves — the receivables-aging
    shape on the order book.  Watermark via one Max fold; bucketing is
    per-row integer day arithmetic; output is O(status × 4)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderstatus", "o_orderdate"])
    mx = ds.aggregate(Max("o_orderdate"))["max(o_orderdate)"]
    wm_day = int(np.datetime64(mx, "us").astype("datetime64[D]").astype(np.int64))
    wm_ref = ray.put(wm_day)

    def partial(t: pa.Table) -> pa.Table:
        wm = ray.get(wm_ref)
        keep = pc.not_equal(t["o_orderstatus"], "F")
        sub = t.filter(keep)
        days = wm - (
            sub["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(np.int64)
        )
        bucket = np.select(
            [days <= 30, days <= 90, days <= 365],
            ["0_030d", "1_090d", "2_365d"],
            default="3_older",
        )
        g = pa.table(
            {
                "o_orderstatus": sub["o_orderstatus"],
                "age_bucket": pa.array(bucket, pa.string()),
                "one": pa.array(np.ones(len(days), dtype=np.int64)),
            }
        ).group_by(["o_orderstatus", "age_bucket"]).aggregate([("one", "sum")])
        return g.rename_columns(["o_orderstatus", "age_bucket", "n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "age_bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["o_orderstatus", "age_bucket"])
    )


ORDERS_OPEN_AGING_BUCKETS_SQL = """
WITH wm AS (SELECT MAX(o_orderdate) AS m FROM orders),
t AS (SELECT o_orderstatus,
             date_diff('day', o_orderdate, (SELECT m FROM wm)) AS age
      FROM orders WHERE o_orderstatus <> 'F'),
b AS (SELECT o_orderstatus,
             CASE WHEN age <= 30 THEN '0_030d'
                  WHEN age <= 90 THEN '1_090d'
                  WHEN age <= 365 THEN '2_365d'
                  ELSE '3_older' END AS age_bucket
      FROM t)
SELECT o_orderstatus, age_bucket, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_nation_hour_matrix(sf_dir: str):
    """Clickstream × GEO dimension: event counts per (customer nation,
    UTC hour) through the shared id space — the 'when is each market
    awake' matrix that needs a cross-domain join (events→customer→
    nation).  The two dim hops broadcast (nation map tiny; the
    custkey→nation map is O(customers), the documented small side);
    block partials shrink to (nation, hour) cells before the fold."""
    events = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = rd.read_parquet(_t(sf_dir, "nation")).to_pandas()
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    nk_of = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    ref = ray.put(nk_of)

    def partial(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        hour = pc.hour(t["ts"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        nk = np.array([m[u] for u in uid], dtype=np.int64)
        g = pa.table(
            {
                "nk": pa.array(nk),
                "hour": pa.array(hour),
                "one": pa.array(np.ones(len(nk), dtype=np.int64)),
            }
        ).group_by(["nk", "hour"]).aggregate([("one", "sum")])
        return g.rename_columns(["nk", "hour", "n"])

    folded = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["nk", "hour"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        nk = t["nk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array([name_of[k] for k in nk], pa.string()),
                "hour": t["hour"].cast(pa.int64()),
                "n": t["n"].cast(pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").sort(["n_name", "hour"])


EVENTS_NATION_HOUR_MATRIX_SQL = """
SELECT n.n_name, CAST(hour(e.ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_rule_dispatch_census(sf_dir: str):
    """FIRST-MATCH rule-table dispatch at corpus scale — the reference's
    M3 selection semantics (an ordered rule list where the first hit
    wins) applied as a routing census: four keyword rules plus a
    fallthrough, each doc credited to exactly one rule.  Vectorized
    pc.match_substring per rule with a priority np.select; the oracle
    replays the CASE ladder — order-sensitivity is exactly what's being
    checked."""
    RULES = [("r1_join", "join"), ("r2_sort", "sort"), ("r3_window", "window"), ("r4_hash", "hash")]
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def dispatch(t: pa.Table) -> pa.Table:
        masks = [
            pc.match_substring(t["text"], pat).to_numpy(zero_copy_only=False)
            for _, pat in RULES
        ]
        rule = np.select(masks, [name for name, _ in RULES], default="r5_none")
        g = pa.table(
            {"rule": pa.array(rule, pa.string()), "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        ).group_by("rule").aggregate([("one", "sum")])
        return g.rename_columns(["rule", "n_docs"])

    return (
        ds.map_batches(dispatch, batch_format="pyarrow")
        .groupby("rule")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .sort("rule")
    )


DOCS_RULE_DISPATCH_CENSUS_SQL = """
WITH d AS (
  SELECT CASE WHEN text LIKE '%join%' THEN 'r1_join'
              WHEN text LIKE '%sort%' THEN 'r2_sort'
              WHEN text LIKE '%window%' THEN 'r3_window'
              WHEN text LIKE '%hash%' THEN 'r4_hash'
              ELSE 'r5_none' END AS rule
  FROM documents)
SELECT rule, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY 1 ORDER BY 1
"""


def purchase_graph_rich_club(sf_dir: str):
    """RICH-CLUB coefficient of the part co-purchase graph: among the 20
    highest-degree parts (ties broken by key), how densely do they
    co-purchase with EACH OTHER?  φ = edges-within / C(20,2), the
    hub-interconnection readout degree distributions alone can't give.
    Distinct edges shrink block-locally; degrees fold once; only the
    O(k²) club subgraph is checked against the broadcast club set."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def edges_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"o": t["l_orderkey"], "p": t["l_partkey"]}).group_by(["o", "p"]).aggregate([])
        )

    op_edges = (
        li.map_batches(edges_partial, batch_format="pyarrow")
        .groupby(["o", "p"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )

    def pairs(g: pa.Table) -> pa.Table:
        p = np.sort(g["p"].combine_chunks().to_numpy(zero_copy_only=False))
        if len(p) < 2:
            return pa.table({"p_a": pa.array([], pa.int64()), "p_b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(p), k=1)
        return pa.table({"p_a": pa.array(p[ia], pa.int64()), "p_b": pa.array(p[ib], pa.int64())})

    pair_edges = (
        op_edges.groupby("o")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["p_a", "p_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )

    deg = pa.concat_tables(
        [
            pair_edges.groupby("p_a").aggregate(Count(alias_name="d")).to_pandas().rename(columns={"p_a": "p"}).pipe(pa.Table.from_pandas),
            pair_edges.groupby("p_b").aggregate(Count(alias_name="d")).to_pandas().rename(columns={"p_b": "p"}).pipe(pa.Table.from_pandas),
        ]
    )
    deg_pd = deg.to_pandas().groupby("p")["d"].sum().reset_index()
    deg_pd = deg_pd.sort_values(["d", "p"], ascending=[False, True]).head(20)
    club = set(int(x) for x in deg_pd["p"])
    club_ref = ray.put(np.array(sorted(club), dtype=np.int64))

    def within(t: pa.Table) -> pa.Table:
        c = ray.get(club_ref)
        a = t["p_a"].to_numpy(zero_copy_only=False)
        b = t["p_b"].to_numpy(zero_copy_only=False)
        m = np.isin(a, c) & np.isin(b, c)
        return pa.table({"n": pa.array([int(m.sum())], pa.int64())})

    inner = int(
        pair_edges.map_batches(within, batch_format="pyarrow").aggregate(Sum("n"))["sum(n)"]
    )
    k = len(club)
    possible = k * (k - 1) // 2
    return pa.table(
        {
            "club_size": pa.array([k], pa.int64()),
            "edges_within": pa.array([inner], pa.int64()),
            "possible_edges": pa.array([possible], pa.int64()),
            "density_ppm": pa.array([inner * 1_000_000 // possible], pa.int64()),
        }
    )


PURCHASE_GRAPH_RICH_CLUB_SQL = """
WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pr AS (SELECT DISTINCT a.p AS p_a, b.p AS p_b
       FROM e a JOIN e b ON a.o = b.o AND a.p < b.p),
deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT p_a AS p FROM pr UNION ALL SELECT p_b FROM pr)
        GROUP BY 1),
club AS (SELECT p FROM deg ORDER BY d DESC, p LIMIT 20),
inner_e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pr
            WHERE p_a IN (SELECT p FROM club)
              AND p_b IN (SELECT p FROM club))
SELECT CAST((SELECT COUNT(*) FROM club) AS BIGINT) AS club_size,
       inner_e.n AS edges_within,
       CAST((SELECT COUNT(*) FROM club)
            * ((SELECT COUNT(*) FROM club) - 1) // 2 AS BIGINT)
           AS possible_edges,
       CAST(inner_e.n * 1000000
            // ((SELECT COUNT(*) FROM club)
                * ((SELECT COUNT(*) FROM club) - 1) // 2) AS BIGINT)
           AS density_ppm
FROM inner_e
"""


def orders_bimodality_coefficient(sf_dir: str):
    """Sarle's BIMODALITY coefficient of the price distribution from the
    first four moments — BC = (g₁² + 1)/g₂′ with the moment sums folded
    as exact int64 in KILODOLLAR units (cents⁴ would overflow) and the
    central-moment algebra done in Python big ints on the driver, so the
    only float ops are the final fixed tree.  BC > 5/9 flags a
    distribution no single-mode summary should describe."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        v = (pc.divide(_cents(t["o_totalprice"]), 100_000)).to_numpy()
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "s1": pa.array([int(v.sum())], pa.int64()),
                "s2": pa.array([int((v * v).sum())], pa.int64()),
                "s3": pa.array([int((v * v * v).sum())], pa.int64()),
                "s4": pa.array([int((v * v * v * v).sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n"), Sum("s1"), Sum("s2"), Sum("s3"), Sum("s4")
    )
    n = int(agg["sum(n)"])
    s1, s2 = int(agg["sum(s1)"]), int(agg["sum(s2)"])
    s3, s4 = int(agg["sum(s3)"]), int(agg["sum(s4)"])
    # central moment numerators scaled by n^k (exact big ints)
    m2n = n * s2 - s1 * s1  # n² · m2
    m3n = n * n * s3 - 3 * n * s2 * s1 + 2 * s1**3  # n³ · m3
    m4n = n**3 * s4 - 4 * n * n * s3 * s1 + 6 * n * s2 * s1 * s1 - 3 * s1**4  # n⁴ · m4
    # m3 = m3n/n³, m2 = m2n/n² ⇒ g1² = m3n² / m2n³ and g2 = m4n / m2n².
    # The squaring happens in DOUBLE space (m3n² overflows even HUGEINT);
    # int→double conversion of the exact big ints rounds identically in
    # both engines, and the multiplication trees below mirror the SQL.
    t3 = float(m3n)
    u = float(m2n)
    g1_sq = (t3 * t3) / (u * u * u)
    g2 = float(m4n) / (u * u)
    bc = (g1_sq + 1.0) / g2
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "g1_sq": pa.array([g1_sq], pa.float64()),
            "g2": pa.array([g2], pa.float64()),
            "bimodality_coeff": pa.array([bc], pa.float64()),
        }
    )


ORDERS_BIMODALITY_COEFFICIENT_SQL = """
WITH v AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 100000
               AS x FROM orders),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS s1,
             CAST(SUM(x * x) AS HUGEINT) AS s2,
             CAST(SUM(x * x * x) AS HUGEINT) AS s3,
             CAST(SUM(x * x * x * x) AS HUGEINT) AS s4
      FROM v),
m AS (SELECT n,
             n * s2 - s1 * s1 AS m2n,
             n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1 AS m3n,
             n * n * n * s4 - 4 * n * n * s3 * s1
                 + 6 * n * s2 * s1 * s1 - 3 * s1 * s1 * s1 * s1 AS m4n
      FROM s)
SELECT n,
       (CAST(m3n AS DOUBLE) * CAST(m3n AS DOUBLE))
           / (CAST(m2n AS DOUBLE) * CAST(m2n AS DOUBLE)
              * CAST(m2n AS DOUBLE)) AS g1_sq,
       CAST(m4n AS DOUBLE)
           / (CAST(m2n AS DOUBLE) * CAST(m2n AS DOUBLE)) AS g2,
       ((CAST(m3n AS DOUBLE) * CAST(m3n AS DOUBLE))
            / (CAST(m2n AS DOUBLE) * CAST(m2n AS DOUBLE)
               * CAST(m2n AS DOUBLE)) + 1.0)
           / (CAST(m4n AS DOUBLE)
              / (CAST(m2n AS DOUBLE) * CAST(m2n AS DOUBLE)))
           AS bimodality_coeff
FROM m
"""


def lineitem_order_price_spread_hist(sf_dir: str):
    """Within-ORDER price dispersion: each order's (max − min) extended
    price, censused into $10k bands — how heterogeneous the lines of one
    order are (uniform carts vs mixed big-ticket/small-ticket).  Per-order
    min/max fold from block partials (order lines may straddle blocks),
    then a per-band integer census; single-line orders land in band 0."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t["l_extendedprice"])
        g = pa.table({"o": t["l_orderkey"], "c": c}).group_by("o").aggregate(
            [("c", "min"), ("c", "max")]
        )
        g = g.rename_columns(["o", "mn", "mx"])
        return pa.table(
            {"o": g["o"], "mn": g["mn"].cast(pa.int64()), "mx": g["mx"].cast(pa.int64())}
        )

    per_order = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("o")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
    )

    def census(t: pa.Table) -> pa.Table:
        spread = pc.subtract(t["mx"], t["mn"]).to_numpy()
        band = spread // 1_000_000  # $10k bands
        g = pa.table(
            {"spread_band": pa.array(band), "one": pa.array(np.ones(len(band), dtype=np.int64))}
        ).group_by("spread_band").aggregate([("one", "sum")])
        return g.rename_columns(["spread_band", "n_orders"])

    return (
        per_order.map_batches(census, batch_format="pyarrow")
        .groupby("spread_band")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
        .sort("spread_band")
    )


LINEITEM_ORDER_PRICE_SPREAD_HIST_SQL = """
WITH s AS (
  SELECT l_orderkey,
         (MAX(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
          - MIN(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)))
             // 1000000 AS spread_band
  FROM lineitem GROUP BY 1)
SELECT CAST(spread_band AS BIGINT) AS spread_band,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM s GROUP BY 1 ORDER BY 1
"""


def events_onboarding_trigram_census(sf_dir: str):
    """ONBOARDING-path census: each user's first three event types (strict
    (ts, event_id) order) concatenated into a path signature ('signup>
    view>click'), censused across users — the funnel-entry distribution
    product teams rank; users with < 3 events form their shorter
    signature.  One co-partition by user, one tiny signature groupby."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id"])

    def per_user(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        typ = np.asarray(g["event_type"].combine_chunks().to_numpy(zero_copy_only=False))
        order = np.lexsort((eid, ts))[:3]
        sig = ">".join(typ[order])
        return pa.table(
            {"signature": pa.array([sig], pa.string()), "one": pa.array([1], pa.int64())}
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("signature")
        .aggregate(Sum("one", alias_name="n_users"))
        .sort("signature")
    )


EVENTS_ONBOARDING_TRIGRAM_CENSUS_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS rn
  FROM events),
s AS (SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS signature
      FROM r WHERE rn <= 3 GROUP BY 1)
SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_users
FROM s GROUP BY 1 ORDER BY 1
"""


def purchase_graph_edge_weight_hist(sf_dir: str):
    """Edge-WEIGHT distribution of the part co-purchase graph: how many
    part pairs co-occur in exactly k orders — the multiplicity histogram
    that separates incidental pairings (k=1 noise) from real product
    affinities (heavy tail).  Pair expansion is bounded per order; pair
    counts fold once, and the histogram is a second tiny fold over
    O(distinct weights)."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def edges_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"o": t["l_orderkey"], "p": t["l_partkey"]}).group_by(["o", "p"]).aggregate([])
        )

    def pairs(g: pa.Table) -> pa.Table:
        p = np.sort(g["p"].combine_chunks().to_numpy(zero_copy_only=False))
        if len(p) < 2:
            return pa.table({"p_a": pa.array([], pa.int64()), "p_b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(p), k=1)
        return pa.table({"p_a": pa.array(p[ia], pa.int64()), "p_b": pa.array(p[ib], pa.int64())})

    def pair_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_a", "p_b"]).aggregate([("p_a", "count")])
        g = g.rename_columns(["p_a", "p_b", "w"])
        return pa.table({"p_a": g["p_a"], "p_b": g["p_b"], "w": g["w"].cast(pa.int64())})

    weights = (
        li.map_batches(edges_partial, batch_format="pyarrow")
        .groupby(["o", "p"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .groupby("o")
        .map_groups(pairs, batch_format="pyarrow")
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["p_a", "p_b"])
        .aggregate(Sum("w", alias_name="w"))
    )

    def hist(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"weight": t["w"].cast(pa.int64()), "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
        ).group_by("weight").aggregate([("one", "sum")])
        return g.rename_columns(["weight", "n_pairs"])

    return (
        weights.map_batches(hist, batch_format="pyarrow")
        .groupby("weight")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        .sort("weight")
    )


PURCHASE_GRAPH_EDGE_WEIGHT_HIST_SQL = """
WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pr AS (SELECT a.p AS p_a, b.p AS p_b, CAST(COUNT(*) AS BIGINT) AS w
       FROM e a JOIN e b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2)
SELECT w AS weight, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pr GROUP BY 1 ORDER BY 1
"""


def orders_new_customer_revenue_share_by_year(sf_dir: str):
    """Revenue DECOMPOSITION by customer tenure: each year's revenue split
    into new-customer (first-ever order that year) vs returning cents,
    with the new share in integer ppm — the growth-quality readout
    (acquisition-driven vs retention-driven revenue).  First-order years
    fold per customer, broadcast as a tiny map; the split is one more
    pass of integer partials."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def first_partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"k": t["o_custkey"], "y": pc.year(t["o_orderdate"]).cast(pa.int64())}
        ).group_by("k").aggregate([("y", "min")])
        return g.rename_columns(["k", "first_y"])

    firsts = (
        ds.map_batches(first_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Min("first_y", alias_name="first_y"))
        .to_pandas()
    )
    first_of = dict(zip(firsts["k"], firsts["first_y"]))
    ref = ray.put(first_of)

    def split_partial(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        y = pc.year(t["o_orderdate"]).cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = _cents(t["o_totalprice"]).to_numpy()
        fy = np.array([m[k] for k in keys], dtype=np.int64)
        is_new = (y == fy).astype(np.int64)
        g = pa.table(
            {
                "year": pa.array(y),
                "new_cents": pa.array(cents * is_new),
                "ret_cents": pa.array(cents * (1 - is_new)),
            }
        ).group_by("year").aggregate([("new_cents", "sum"), ("ret_cents", "sum")])
        return g.rename_columns(["year", "new_cents", "ret_cents"])

    out = (
        ds.map_batches(split_partial, batch_format="pyarrow")
        .groupby("year")
        .aggregate(Sum("new_cents", alias_name="new_cents"), Sum("ret_cents", alias_name="ret_cents"))
    )

    def finish(t: pa.Table) -> pa.Table:
        new = t["new_cents"].cast(pa.int64()).to_numpy()
        ret = t["ret_cents"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "year": t["year"].cast(pa.int64()),
                "new_cents": pa.array(new, pa.int64()),
                "returning_cents": pa.array(ret, pa.int64()),
                "new_share_ppm": pa.array(new * 1_000_000 // (new + ret), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("year")


ORDERS_NEW_CUSTOMER_REVENUE_SHARE_BY_YEAR_SQL = """
WITH f AS (SELECT o_custkey, CAST(MIN(year(o_orderdate)) AS BIGINT)
               AS first_y
           FROM orders GROUP BY 1),
s AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS year,
             CAST(SUM(CASE WHEN year(o.o_orderdate) = f.first_y
                           THEN CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS new_cents,
             CAST(SUM(CASE WHEN year(o.o_orderdate) <> f.first_y
                           THEN CAST(FLOOR(o.o_totalprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS returning_cents
      FROM orders o JOIN f ON o.o_custkey = f.o_custkey
      GROUP BY 1)
SELECT year, new_cents, returning_cents,
       CAST(new_cents * 1000000 // (new_cents + returning_cents) AS BIGINT)
           AS new_share_ppm
FROM s ORDER BY year
"""


def lineitem_return_rate_by_price_band(sf_dir: str):
    """Return-RISK curve over price: per $10k extended-price band the line
    count, returned-line count ('R' flag) and return rate in integer ppm
    — do expensive lines come back more?  One pass of block partials,
    O(bands) fold."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_returnflag", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        band = pc.divide(_cents(t["l_extendedprice"]), 1_000_000)
        ret = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        g = pa.table(
            {
                "price_band": band,
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "ret": ret,
            }
        ).group_by("price_band").aggregate([("one", "sum"), ("ret", "sum")])
        return g.rename_columns(["price_band", "n", "n_returned"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("price_band")
        .aggregate(Sum("n", alias_name="n"), Sum("n_returned", alias_name="n_returned"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].cast(pa.int64()).to_numpy()
        r = t["n_returned"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "price_band": t["price_band"].cast(pa.int64()),
                "n": pa.array(n, pa.int64()),
                "n_returned": pa.array(r, pa.int64()),
                "return_ppm": pa.array(r * 1_000_000 // n, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("price_band")


LINEITEM_RETURN_RATE_BY_PRICE_BAND_SQL = """
WITH t AS (
  SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) // 1000000
             AS price_band,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem),
s AS (SELECT price_band, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ret) AS BIGINT) AS n_returned
      FROM t GROUP BY 1)
SELECT price_band, n, n_returned,
       CAST(n_returned * 1000000 // n AS BIGINT) AS return_ppm
FROM s ORDER BY price_band
"""


def orders_key_date_concordance_by_customer(sf_dir: str):
    """Per-CUSTOMER insertion-order integrity: within each customer's
    orders, are orderkeys assigned in date order?  Summed Kendall-style
    concordant / discordant / date-tied pair counts across customers —
    the entity-scoped complement of the global id-vs-time grid audit
    (a system can be globally concordant yet scrambled within entities).
    Per-group O(k²) on small groups; integer counts only."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def per_cust(g: pa.Table) -> pa.Table:
        k = g["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        d = (
            g["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(np.int64)
        )
        n = len(k)
        if n < 2:
            return pa.table(
                {
                    "concordant": pa.array([0], pa.int64()),
                    "discordant": pa.array([0], pa.int64()),
                    "date_ties": pa.array([0], pa.int64()),
                }
            )
        dk = np.sign(k[None, :] - k[:, None])
        dd = np.sign(d[None, :] - d[:, None])
        iu = np.triu_indices(n, k=1)
        prod = dk[iu] * dd[iu]
        return pa.table(
            {
                "concordant": pa.array([int((prod > 0).sum())], pa.int64()),
                "discordant": pa.array([int((prod < 0).sum())], pa.int64()),
                "date_ties": pa.array([int((dd[iu] == 0).sum())], pa.int64()),
            }
        )

    folded = (
        ds.groupby("o_custkey")
        .map_groups(per_cust, batch_format="pyarrow")
        .aggregate(Sum("concordant"), Sum("discordant"), Sum("date_ties"))
    )
    return pa.table(
        {
            "concordant": pa.array([int(folded["sum(concordant)"])], pa.int64()),
            "discordant": pa.array([int(folded["sum(discordant)"])], pa.int64()),
            "date_ties": pa.array([int(folded["sum(date_ties)"])], pa.int64()),
        }
    )


ORDERS_KEY_DATE_CONCORDANCE_BY_CUSTOMER_SQL = """
WITH p AS (
  SELECT CASE WHEN (a.o_orderkey < b.o_orderkey
                    AND a.o_orderdate < b.o_orderdate)
               OR (a.o_orderkey > b.o_orderkey
                   AND a.o_orderdate > b.o_orderdate) THEN 1 ELSE 0 END
             AS conc,
         CASE WHEN a.o_orderdate = b.o_orderdate THEN 1 ELSE 0 END AS tie
  FROM orders a JOIN orders b
    ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey)
SELECT CAST(SUM(conc) AS BIGINT) AS concordant,
       CAST(SUM(CASE WHEN conc = 0 AND tie = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS discordant,
       CAST(SUM(tie) AS BIGINT) AS date_ties
FROM p
"""


def events_weekend_type_mix_tv(sf_dir: str):
    """Weekend-vs-weekday BEHAVIOR shift in one number: total-variation
    distance between the two event-type mixes, cross-multiplied into
    exact integer ppm (no float shares).  Also carries both sample sizes
    so the reader can judge power.  Block partials → 10-cell fold →
    driver arithmetic."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        isodow = pc.add(pc.day_of_week(t["ts"]).cast(pa.int64()), 1)
        wk = pc.cast(pc.greater_equal(isodow, 6), pa.int64())
        g = pa.table(
            {
                "event_type": t["event_type"],
                "weekend": wk,
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ).group_by(["event_type", "weekend"]).aggregate([("one", "sum")])
        return g.rename_columns(["event_type", "weekend", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "weekend"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    types = sorted(cells["event_type"].unique())
    of = {(r.event_type, int(r.weekend)): int(r.n) for r in cells.itertuples()}
    n_wd = sum(of.get((t_, 0), 0) for t_ in types)
    n_we = sum(of.get((t_, 1), 0) for t_ in types)
    s = sum(
        abs(of.get((t_, 0), 0) * n_we - of.get((t_, 1), 0) * n_wd) for t_ in types
    )
    tv_ppm = s * 1_000_000 // (2 * n_wd * n_we)
    return pa.table(
        {
            "n_weekday": pa.array([n_wd], pa.int64()),
            "n_weekend": pa.array([n_we], pa.int64()),
            "tv_ppm": pa.array([tv_ppm], pa.int64()),
        }
    )


EVENTS_WEEKEND_TYPE_MIX_TV_SQL = """
WITH c AS (
  SELECT event_type,
         CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS weekend,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
t AS (SELECT CAST(SUM(CASE WHEN weekend = 0 THEN n ELSE 0 END) AS BIGINT)
           AS n_wd,
             CAST(SUM(CASE WHEN weekend = 1 THEN n ELSE 0 END) AS BIGINT)
           AS n_we
      FROM c),
d AS (SELECT ty.event_type,
             COALESCE(w0.n, 0) AS nwd_i, COALESCE(w1.n, 0) AS nwe_i
      FROM (SELECT DISTINCT event_type FROM c) ty
      LEFT JOIN c w0 ON w0.event_type = ty.event_type AND w0.weekend = 0
      LEFT JOIN c w1 ON w1.event_type = ty.event_type AND w1.weekend = 1)
SELECT t.n_wd AS n_weekday, t.n_we AS n_weekend,
       CAST(CAST(SUM(ABS(d.nwd_i * t.n_we - d.nwe_i * t.n_wd)) AS BIGINT)
            * 1000000 // (2 * t.n_wd * t.n_we) AS BIGINT) AS tv_ppm
FROM d, t GROUP BY 1, 2
"""


def orders_csv_roundtrip_audit(sf_dir: str):
    """CSV interchange ROUND-TRIP: every block of orders is serialized to
    RFC-4180 CSV and parsed back with pyarrow's reader in-pipeline,
    asserting key/cents identity per row — the lossy-float trap of CSV
    interchange made measurable (cents survive because they're emitted
    as integers, exactly the engine's money discipline).  The audit row
    carries count and total so the oracle certifies the round-trip
    preserved the ledger."""
    import io

    from pyarrow import csv as pacsv

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def roundtrip(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        src = pa.table({"o_orderkey": t["o_orderkey"], "cents": cents})
        buf = io.BytesIO()
        pacsv.write_csv(src, buf)
        back = pacsv.read_csv(io.BytesIO(buf.getvalue()))
        if not back.equals(src):
            raise ValueError("CSV round-trip mismatch")
        return pa.table(
            {
                "n_rows": pa.array([src.num_rows], pa.int64()),
                "sum_cents": pa.array(
                    [int(pc.sum(back["cents"]).as_py())], pa.int64()
                ),
            }
        )

    agg = ds.map_batches(roundtrip, batch_format="pyarrow").aggregate(
        Sum("n_rows"), Sum("sum_cents")
    )
    return pa.table(
        {
            "n_rows": pa.array([int(agg["sum(n_rows)"])], pa.int64()),
            "sum_cents": pa.array([int(agg["sum(sum_cents)"])], pa.int64()),
        }
    )


ORDERS_CSV_ROUNDTRIP_AUDIT_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders
"""


def docs_vocab_saturation_point(sf_dir: str):
    """Vocabulary SATURATION: scanning docs in id order, after which
    doc_id does the corpus stop contributing new terms?  The answer is
    max over terms of (min doc_id containing the term) — a pure
    aggregate, no sequential scan.  Plus the vocab size and the ppm of
    the id range consumed before saturation — the 'how much corpus do
    you need to see the whole vocabulary' readout for curriculum
    schedulers."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        ids = t["doc_id"].take(parents)
        keep = pc.not_equal(flat, "")
        g = pa.table(
            {"term": flat.filter(keep), "doc_id": ids.filter(keep)}
        ).group_by("term").aggregate([("doc_id", "min")])
        return g.rename_columns(["term", "first_doc"])

    firsts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Min("first_doc", alias_name="first_doc"))
        .to_pandas()
    )
    mm = ds.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = int(mm["min(doc_id)"]), int(mm["max(doc_id)"])
    sat = int(firsts["first_doc"].max())
    return pa.table(
        {
            "n_terms": pa.array([len(firsts)], pa.int64()),
            "saturation_doc_id": pa.array([sat], pa.int64()),
            "range_consumed_ppm": pa.array(
                [(sat - lo) * 1_000_000 // max(hi - lo, 1)], pa.int64()
            ),
        }
    )


DOCS_VOCAB_SATURATION_POINT_SQL = """
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents),
f AS (SELECT term, CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM t GROUP BY 1),
r AS (SELECT CAST(MIN(doc_id) AS BIGINT) AS lo,
             CAST(MAX(doc_id) AS BIGINT) AS hi
      FROM documents)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(MAX(first_doc) AS BIGINT) AS saturation_doc_id,
       CAST((MAX(first_doc) - r.lo) * 1000000
            // GREATEST(r.hi - r.lo, 1) AS BIGINT) AS range_consumed_ppm
FROM f, r GROUP BY r.lo, r.hi
"""


def embeddings_label_min_dist2_matrix(sf_dir: str):
    """SINGLE-LINKAGE label separation in the ×128 int8 code space: for
    every label pair the minimum squared code distance over all cross
    pairs (|a|² + |b|² − 2a·b, exact integers) — the margin between
    classes that average-centroid distances overstate.  Codes broadcast
    once; each block computes its rows' cross-label minima via one int64
    matmul; the fold is a 45-row Min groupby.  The oracle replays the
    O(n²) ranking — quadratic on the oracle side only."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"])
    all_rows = ds.take_all()
    codes = np.stack(
        [
            np.floor(np.asarray(r["embedding"], dtype=np.float64) * 128.0 + 0.5).astype(np.int64)
            for r in all_rows
        ]
    )
    labels = np.array([int(r["label"]) for r in all_rows], dtype=np.int64)
    norms = (codes * codes).sum(axis=1)
    ref = ray.put((codes, labels, norms))

    def block_min(t: pa.Table) -> pa.Table:
        c_all, l_all, n_all = ray.get(ref)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
        q = np.floor(m * 128.0 + 0.5).astype(np.int64)
        my_l = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        my_n = (q * q).sum(axis=1)
        d2 = my_n[:, None] + n_all[None, :] - 2 * (q @ c_all.T)
        rows_a, rows_b, rows_d = [], [], []
        for lab in np.unique(l_all):
            mask_rows = my_l != lab
            mask_cols = l_all == lab
            if not mask_rows.any() or not mask_cols.any():
                continue
            sub = d2[np.ix_(mask_rows, mask_cols)]
            sub_l = my_l[mask_rows]
            for la in np.unique(sub_l):
                mn = int(sub[sub_l == la].min())
                a, b = (int(la), int(lab)) if la < lab else (int(lab), int(la))
                rows_a.append(a)
                rows_b.append(b)
                rows_d.append(mn)
        return pa.table(
            {
                "label_a": pa.array(rows_a, pa.int64()),
                "label_b": pa.array(rows_b, pa.int64()),
                "min_d2": pa.array(rows_d, pa.int64()),
            }
        )

    return (
        ds.map_batches(block_min, batch_format="pyarrow")
        .groupby(["label_a", "label_b"])
        .aggregate(Min("min_d2", alias_name="min_d2"))
        .sort(["label_a", "label_b"])
    )


EMBEDDINGS_LABEL_MIN_DIST2_MATRIX_SQL = """
WITH u AS (SELECT vec_id, label, unnest(embedding) AS a,
                  unnest(range(1, len(embedding) + 1)) AS i
           FROM embeddings),
d AS (SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(SUM((CAST(FLOOR(CAST(a.a AS DOUBLE) * 128 + 0.5) AS BIGINT)
                       - CAST(FLOOR(CAST(b.a AS DOUBLE) * 128 + 0.5)
                              AS BIGINT))
                      * (CAST(FLOOR(CAST(a.a AS DOUBLE) * 128 + 0.5)
                              AS BIGINT)
                         - CAST(FLOOR(CAST(b.a AS DOUBLE) * 128 + 0.5)
                                AS BIGINT))) AS BIGINT) AS d2
      FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2),
lp AS (SELECT LEAST(ea.label, eb.label) AS label_a,
              GREATEST(ea.label, eb.label) AS label_b, d.d2
       FROM d JOIN embeddings ea ON d.va = ea.vec_id
       JOIN embeddings eb ON d.vb = eb.vec_id
       WHERE ea.label <> eb.label)
SELECT CAST(label_a AS BIGINT) AS label_a,
       CAST(label_b AS BIGINT) AS label_b,
       CAST(MIN(d2) AS BIGINT) AS min_d2
FROM lp GROUP BY 1, 2 ORDER BY 1, 2
"""


def orders_active_day_streaks(sf_dir: str):
    """Business-CONTINUITY streaks: over the set of calendar days with at
    least one order, the longest run of consecutive days, the number of
    runs, and the active-day count — the uptime-style summary of demand
    coverage.  Distinct days fold to an O(days) table; the gaps-and-
    islands pass runs on the driver (the oracle uses the classic
    date − ROW_NUMBER grouping)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def days_partial(t: pa.Table) -> pa.Table:
        return pa.table({"d": t["o_orderdate"]}).group_by("d").aggregate([])

    days = (
        ds.map_batches(days_partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .to_pandas()
    )
    d = np.sort(days["d"].to_numpy().astype("datetime64[D]").astype(np.int64))
    gaps = np.flatnonzero(np.diff(d) != 1)
    lens = np.diff(np.concatenate(([0], gaps + 1, [len(d)])))
    return pa.table(
        {
            "n_active_days": pa.array([len(d)], pa.int64()),
            "n_streaks": pa.array([len(lens)], pa.int64()),
            "max_streak": pa.array([int(lens.max())], pa.int64()),
        }
    )


ORDERS_ACTIVE_DAY_STREAKS_SQL = """
WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders),
r AS (SELECT day,
             day - CAST(ROW_NUMBER() OVER (ORDER BY day) AS INT) AS grp
      FROM d),
runs AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS len FROM r GROUP BY 1)
SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS max_streak
FROM runs
"""


def lineitem_ship_lag_median_by_year(sf_dir: str):
    """Operational-trend median: per ORDER year, the exact median of
    ship-lag days (l_shipdate − o_orderdate) — is fulfilment getting
    faster?  The fact×fact hop pre-shrinks lineitem to (orderkey,
    shipdate) before an 8-partition join; per-year groups pick the
    quantile_disc element from their own sorted lags."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])
    j = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def lag(t: pa.Table) -> pa.Table:
        ship = (
            t["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(np.int64)
        )
        od = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]").astype(np.int64)
        )
        year = pc.year(t["o_orderdate"]).cast(pa.int64())
        return pa.table({"year": year, "lag_days": pa.array(ship - od, pa.int64())})

    def per_year(g: pa.Table) -> pa.Table:
        v = np.sort(g["lag_days"].combine_chunks().to_numpy(zero_copy_only=False))
        m = v[int(np.ceil(0.5 * len(v))) - 1]
        return pa.table(
            {
                "year": g["year"].slice(0, 1),
                "n": pa.array([len(v)], pa.int64()),
                "median_lag_days": pa.array([int(m)], pa.int64()),
            }
        )

    return (
        j.map_batches(lag, batch_format="pyarrow")
        .groupby("year")
        .map_groups(per_year, batch_format="pyarrow")
        .sort("year")
    )


LINEITEM_SHIP_LAG_MEDIAN_BY_YEAR_SQL = """
WITH l AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS year,
         CAST(date_diff('day', o.o_orderdate, li.l_shipdate) AS BIGINT)
             AS lag_days
  FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey)
SELECT year, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(quantile_disc(lag_days, 0.5) AS BIGINT) AS median_lag_days
FROM l GROUP BY 1 ORDER BY 1
"""


def embeddings_dim_code_profile(sf_dir: str):
    """Per-DIMENSION quantization profile: distinct ×128 int8 codes, the
    modal code and its ppm share — the dead-or-degenerate-feature
    detector (a dim whose modal code dominates carries no information
    after quantization).  Block partials are (dim, code) counts; the
    argmax with (count desc, code asc) ties runs on the O(64 × codes)
    folded table."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
        q = np.floor(m * 128.0 + 0.5).astype(np.int64)
        n, d = q.shape
        dims = np.repeat(np.arange(d, dtype=np.int64), n)
        codes = q.T.reshape(-1)
        g = pa.table(
            {"dim": pa.array(dims), "code": pa.array(codes), "one": pa.array(np.ones(n * d, dtype=np.int64))}
        ).group_by(["dim", "code"]).aggregate([("one", "sum")])
        return g.rename_columns(["dim", "code", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dim", "code"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    for dim, sub in cells.groupby("dim"):
        total = int(sub["n"].sum())
        sub = sub.sort_values(["n", "code"], ascending=[False, True])
        modal_code = int(sub.iloc[0]["code"])
        modal_n = int(sub.iloc[0]["n"])
        rows.append((int(dim), len(sub), modal_code, modal_n * 1_000_000 // total))
    rows.sort()
    return pa.table(
        {
            "dim": pa.array([r[0] for r in rows], pa.int64()),
            "n_distinct_codes": pa.array([r[1] for r in rows], pa.int64()),
            "modal_code": pa.array([r[2] for r in rows], pa.int64()),
            "modal_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


EMBEDDINGS_DIM_CODE_PROFILE_SQL = """
WITH u AS (SELECT CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 128 + 0.5)
                       AS BIGINT) AS code,
                  unnest(range(0, len(embedding))) AS dim
           FROM embeddings),
c AS (SELECT dim, code, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY 1, 2),
t AS (SELECT dim, CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_codes
      FROM c GROUP BY 1),
r AS (SELECT dim, code, n,
             ROW_NUMBER() OVER (PARTITION BY dim ORDER BY n DESC, code)
                 AS rn
      FROM c)
SELECT CAST(r.dim AS BIGINT) AS dim, t.n_distinct_codes,
       r.code AS modal_code,
       CAST(r.n * 1000000 // t.total AS BIGINT) AS modal_ppm
FROM r JOIN t ON r.dim = t.dim
WHERE r.rn = 1 ORDER BY r.dim
"""


def orders_dom_normalized_profile(sf_dir: str):
    """Day-of-MONTH demand profile, properly normalized: raw counts per
    dom are biased because the 31st exists in only 7 months of 12 — so
    each dom's count is divided by the number of calendar months (in the
    data's span) that actually contain that dom, giving a per-month rate
    in integer milli-orders.  Counts and month censuses are both exact
    folds; the normalization is integer cross-division."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "dom": pc.day(t["o_orderdate"]).cast(pa.int64()),
                "ym": pc.add(
                    pc.multiply(pc.year(t["o_orderdate"]).cast(pa.int64()), 100),
                    pc.month(t["o_orderdate"]).cast(pa.int64()),
                ),
            }
        ).group_by(["dom", "ym"]).aggregate([("dom", "count")])
        g = g.rename_columns(["dom", "ym", "n"])
        return pa.table({"dom": g["dom"], "ym": g["ym"], "n": g["n"].cast(pa.int64())})

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dom", "ym"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    months = sorted(cells["ym"].unique())

    def dom_in_month(ym: int, dom: int) -> bool:
        import calendar

        return dom <= calendar.monthrange(ym // 100, ym % 100)[1]

    rows = []
    for dom in sorted(cells["dom"].unique()):
        n = int(cells.loc[cells["dom"] == dom, "n"].sum())
        n_months = sum(1 for ym in months if dom_in_month(int(ym), int(dom)))
        rows.append((int(dom), n, n_months, n * 1000 // n_months))
    return pa.table(
        {
            "dom": pa.array([r[0] for r in rows], pa.int64()),
            "n_orders": pa.array([r[1] for r in rows], pa.int64()),
            "n_months_with_dom": pa.array([r[2] for r in rows], pa.int64()),
            "rate_milli_per_month": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


ORDERS_DOM_NORMALIZED_PROFILE_SQL = """
WITH m AS (SELECT DISTINCT date_trunc('month', o_orderdate) AS mo
           FROM orders),
doms AS (SELECT DISTINCT CAST(day(o_orderdate) AS BIGINT) AS dom
         FROM orders),
mc AS (SELECT d.dom,
              CAST(SUM(CASE WHEN d.dom <= day(last_day(m.mo))
                            THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_months_with_dom
       FROM doms d CROSS JOIN m GROUP BY 1),
c AS (SELECT CAST(day(o_orderdate) AS BIGINT) AS dom,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1)
SELECT c.dom, c.n_orders, mc.n_months_with_dom,
       CAST(c.n_orders * 1000 // mc.n_months_with_dom AS BIGINT)
           AS rate_milli_per_month
FROM c JOIN mc ON c.dom = mc.dom
ORDER BY c.dom
"""


def events_type_peak_hour_offset(sf_dir: str):
    """Per-TYPE peak hour and its CIRCULAR offset from the global peak —
    which behaviors run off-cycle from overall traffic (min(|Δ|, 24−|Δ|)
    respects the clock's wraparound).  Argmaxes use the total (count
    desc, hour asc) tie order; everything is an integer fold over the
    (type, hour) cell table."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "event_type": t["event_type"],
                "hour": pc.hour(t["ts"]).cast(pa.int64()),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ).group_by(["event_type", "hour"]).aggregate([("one", "sum")])
        return g.rename_columns(["event_type", "hour", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    glob = cells.groupby("hour")["n"].sum().reset_index()
    glob = glob.sort_values(["n", "hour"], ascending=[False, True])
    g_peak = int(glob.iloc[0]["hour"])
    rows = []
    for t_, sub in cells.groupby("event_type"):
        sub = sub.sort_values(["n", "hour"], ascending=[False, True])
        peak = int(sub.iloc[0]["hour"])
        d = abs(peak - g_peak)
        rows.append((t_, peak, g_peak, min(d, 24 - d)))
    rows.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "peak_hour": pa.array([r[1] for r in rows], pa.int64()),
            "global_peak_hour": pa.array([r[2] for r in rows], pa.int64()),
            "circ_offset": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


EVENTS_TYPE_PEAK_HOUR_OFFSET_SQL = """
WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
g AS (SELECT hour, SUM(n) AS n FROM c GROUP BY 1),
gp AS (SELECT hour AS g_peak FROM g ORDER BY n DESC, hour LIMIT 1),
tp AS (SELECT event_type, hour AS peak_hour,
              ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY n DESC, hour) AS rn
       FROM c)
SELECT tp.event_type, tp.peak_hour, gp.g_peak AS global_peak_hour,
       CAST(LEAST(ABS(tp.peak_hour - gp.g_peak),
                  24 - ABS(tp.peak_hour - gp.g_peak)) AS BIGINT)
           AS circ_offset
FROM tp, gp WHERE tp.rn = 1 ORDER BY tp.event_type
"""


def events_user_hour_arc_census(sf_dir: str):
    """CIRCULAR coverage per user: the minimal clock arc containing every
    hour the user is ever active — 24 minus the largest circular gap
    between consecutive distinct hours — censused across users.  A
    9-to-5 user has a 9-hour arc; a bot wraps the clock at 24.  Distinct
    (user, hour) cells shrink block-locally; each user's arc is one
    sorted diff with wraparound."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def cells(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {"user_id": t["user_id"], "hour": pc.hour(t["ts"]).cast(pa.int64())}
            )
            .group_by(["user_id", "hour"])
            .aggregate([])
        )

    def per_user(g: pa.Table) -> pa.Table:
        h = np.sort(g["hour"].combine_chunks().to_numpy(zero_copy_only=False))
        if len(h) == 1:
            arc = 1
        else:
            gaps = np.diff(h)
            wrap = h[0] + 24 - h[-1]
            arc = 24 - max(int(gaps.max()), int(wrap)) + 1
        return pa.table(
            {"arc_hours": pa.array([arc], pa.int64()), "one": pa.array([1], pa.int64())}
        )

    return (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("arc_hours")
        .aggregate(Sum("one", alias_name="n_users"))
        .sort("arc_hours")
    )


EVENTS_USER_HOUR_ARC_CENSUS_SQL = """
WITH d AS (SELECT DISTINCT user_id, CAST(hour(ts) AS BIGINT) AS hour
           FROM events),
g AS (SELECT user_id, hour,
             hour - LAG(hour) OVER (PARTITION BY user_id ORDER BY hour)
                 AS gap
      FROM d),
w AS (SELECT user_id,
             CAST(MIN(hour) + 24 - MAX(hour) AS BIGINT) AS wrap,
             CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap,
             CAST(COUNT(*) AS BIGINT) AS n_hours
      FROM g GROUP BY 1),
a AS (SELECT user_id,
             CASE WHEN n_hours = 1 THEN 1
                  ELSE 24 - GREATEST(max_gap, wrap) + 1 END AS arc_hours
      FROM w)
SELECT CAST(arc_hours AS BIGINT) AS arc_hours,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM a GROUP BY 1 ORDER BY 1
"""


def docs_token_set_dup_census(sf_dir: str):
    """Token-SET duplicate detection — the order-insensitive exact-dedup
    grain between byte-identity and shingle similarity: documents with
    the SAME distinct-token set (any order, any repetition) form a
    family.  Census: set families, docs in multi-doc families, and how
    many of those are NOT byte-identical (pure reorderings — the ones
    byte dedup misses).  Signatures are sorted-unique-token strings
    built per doc; families fold on the signature."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def sig_partial(t: pa.Table) -> pa.Table:
        import re

        tok_re = re.compile(r"[a-z0-9]+")
        texts = t["text"].to_pylist()
        sigs = [" ".join(sorted(set(tok_re.findall(s.lower())))) for s in texts]
        g = pa.table(
            {
                "sig": pa.array(sigs, pa.string()),
                "text": t["text"],
            }
        ).group_by(["sig", "text"]).aggregate([("text", "count")])
        g = g.rename_columns(["sig", "text", "n"])
        return pa.table({"sig": g["sig"], "text": g["text"], "n": g["n"].cast(pa.int64())})

    cells = (
        ds.map_batches(sig_partial, batch_format="pyarrow")
        .groupby(["sig", "text"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def fam_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "sig": t["sig"],
                "n_docs": t["n"].cast(pa.int64()),
                "n_texts": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    fams = (
        cells.map_batches(fam_partial, batch_format="pyarrow")
        .groupby("sig")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_texts", alias_name="n_texts"))
        .to_pandas()
    )
    n_families = len(fams)
    multi = fams[fams["n_docs"] > 1]
    n_docs_multi = int(multi["n_docs"].sum())
    n_reorder_fams = int((multi["n_texts"] > 1).sum())
    return pa.table(
        {
            "n_set_families": pa.array([n_families], pa.int64()),
            "n_docs_in_multifams": pa.array([n_docs_multi], pa.int64()),
            "n_reorder_families": pa.array([n_reorder_fams], pa.int64()),
        }
    )


DOCS_TOKEN_SET_DUP_CENSUS_SQL = """
WITH s AS (
  SELECT doc_id, text,
         array_to_string(list_sort(list_distinct(
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> ''))), ' ') AS sig
  FROM documents),
f AS (SELECT sig, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT text) AS BIGINT) AS n_texts
      FROM s GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_set_families,
       CAST(SUM(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END) AS BIGINT)
           AS n_docs_in_multifams,
       CAST(SUM(CASE WHEN n_docs > 1 AND n_texts > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_reorder_families
FROM f
"""


def events_attribution_linear_contrast(sf_dir: str):
    """LINEAR (multi-touch) attribution closing the first/last family:
    each (user, day)'s value is split EQUALLY across the day's events in
    integer milli-cents — quotient to every event, remainder to the
    earliest (deterministic, sum-preserving) — then credited per type.
    The conservation invariant (Σ linear = Σ day totals ×1000) is what
    the integer remainder rule buys; floats would leak milli-cents."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "ts", "event_id", "value"])

    def per_user(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        typ = np.asarray(g["event_type"].combine_chunks().to_numpy(zero_copy_only=False))
        cents = _cents(g["value"]).to_numpy()
        order = np.lexsort((eid, ts))
        ts, typ, cents = ts[order], typ[order], cents[order]
        day = ts // 86_400_000_000
        new_day = np.r_[True, day[1:] != day[:-1]]
        starts = np.flatnonzero(new_day)
        counts = np.diff(np.r_[starts, len(day)])
        day_sum = np.add.reduceat(cents, starts)
        total_milli = day_sum * 1000
        quo = total_milli // counts
        rem = total_milli - quo * counts
        # per-event credit = quo; earliest event additionally gets rem
        credit = np.repeat(quo, counts)
        credit[starts] += rem
        out = {}
        for t_, c_ in zip(typ, credit):
            out[t_] = out.get(t_, 0) + int(c_)
        keys = sorted(out)
        return pa.table(
            {
                "event_type": pa.array(keys, pa.string()),
                "linear_milli_cents": pa.array([out[k] for k in keys], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("linear_milli_cents", alias_name="linear_milli_cents"))
        .sort("event_type")
    )


EVENTS_ATTRIBUTION_LINEAR_CONTRAST_SQL = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
day_agg AS (SELECT user_id, d, CAST(SUM(cents) AS BIGINT) AS day_cents,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM e GROUP BY 1, 2),
r AS (SELECT e.user_id, e.d, e.event_type,
             ROW_NUMBER() OVER (PARTITION BY e.user_id, e.d
                                ORDER BY e.ts, e.event_id) AS rn,
             a.day_cents, a.k
      FROM e JOIN day_agg a ON e.user_id = a.user_id AND e.d = a.d),
c AS (SELECT event_type,
             (day_cents * 1000) // k
                 + CASE WHEN rn = 1
                        THEN day_cents * 1000 - ((day_cents * 1000) // k) * k
                        ELSE 0 END AS credit
      FROM r)
SELECT event_type, CAST(SUM(credit) AS BIGINT) AS linear_milli_cents
FROM c GROUP BY 1 ORDER BY 1
"""


def customer_t_closeness_audit(sf_dir: str):
    """t-CLOSENESS — the third privacy lens after the repo's k-anonymity
    and l-diversity audits: per quasi-identifier group (nation ×
    segment), the total-variation distance between the group's sensitive
    $1000-balance-band distribution and the GLOBAL band distribution,
    in cross-multiplied integer ppm.  A group can be k-large and
    l-diverse yet t-far (its sensitive mix still leaks).  Cells fold
    once; the per-group TV runs on the O(QI × bands) driver table."""
    ds = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    )

    def partial(t: pa.Table) -> pa.Table:
        band = pc.divide(_cents(t["c_acctbal"]), 100_000)
        g = pa.table(
            {
                "nk": t["c_nationkey"].cast(pa.int64()),
                "seg": t["c_mktsegment"],
                "band": band,
            }
        ).group_by(["nk", "seg", "band"]).aggregate([("band", "count")])
        g = g.rename_columns(["nk", "seg", "band", "n"])
        return pa.table(
            {"nk": g["nk"], "seg": g["seg"], "band": g["band"], "n": g["n"].cast(pa.int64())}
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["nk", "seg", "band"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    glob = cells.groupby("band")["n"].sum()
    big_n = int(glob.sum())
    rows = []
    for (nk, seg), sub in cells.groupby(["nk", "seg"]):
        k = int(sub["n"].sum())
        of = dict(zip(sub["band"], sub["n"]))
        s = sum(
            abs(int(of.get(b, 0)) * big_n - int(gn) * k) for b, gn in glob.items()
        )
        rows.append((int(nk), seg, k, s * 1_000_000 // (2 * k * big_n)))
    rows.sort()
    return pa.table(
        {
            "c_nationkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
            "k_size": pa.array([r[2] for r in rows], pa.int64()),
            "tv_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


CUSTOMER_T_CLOSENESS_AUDIT_SQL = """
WITH b AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nk, c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) // 100000 AS band,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2, 3),
g AS (SELECT band, CAST(SUM(n) AS BIGINT) AS gn FROM b GROUP BY 1),
tot AS (SELECT CAST(SUM(gn) AS BIGINT) AS big_n FROM g),
qi AS (SELECT nk, seg, CAST(SUM(n) AS BIGINT) AS k_size
       FROM b GROUP BY 1, 2),
d AS (SELECT qi.nk, qi.seg, qi.k_size, g.band, g.gn,
             COALESCE(b.n, 0) AS n_i
      FROM qi CROSS JOIN g
      LEFT JOIN b ON b.nk = qi.nk AND b.seg = qi.seg AND b.band = g.band)
SELECT d.nk AS c_nationkey, d.seg AS c_mktsegment,
       any_value(d.k_size) AS k_size,
       CAST(CAST(SUM(ABS(d.n_i * tot.big_n - d.gn * d.k_size)) AS BIGINT)
            * 1000000 // (2 * any_value(d.k_size) * tot.big_n) AS BIGINT)
           AS tv_ppm
FROM d, tot GROUP BY 1, 2, tot.big_n ORDER BY 1, 2
"""


def events_time_to_10th_census(sf_dir: str):
    """Engagement VELOCITY: per user with ≥ 10 events, the elapsed time
    from first to tenth event, censused into operational shelves (same
    day / within a week / within a month / slower) — the activation-speed
    distribution growth teams steer by.  One co-partition by user, one
    sorted pick at index 9, integer day arithmetic."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])

    def per_user(g: pa.Table) -> pa.Table:
        ts = (
            g["ts"].combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = g["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        if len(order) < 10:
            return pa.table(
                {"bucket": pa.array([], pa.string()), "one": pa.array([], pa.int64())}
            )
        span_days = (int(ts[order[9]]) - int(ts[order[0]])) // 86_400_000_000
        bucket = (
            "0_same_day"
            if span_days == 0
            else "1_week" if span_days <= 7 else "2_month" if span_days <= 30 else "3_slower"
        )
        return pa.table(
            {"bucket": pa.array([bucket], pa.string()), "one": pa.array([1], pa.int64())}
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("one", alias_name="n_users"))
        .sort("bucket")
    )


EVENTS_TIME_TO_10TH_CENSUS_SQL = """
WITH r AS (
  SELECT user_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS rn
  FROM events),
s AS (SELECT user_id,
             (epoch_us(MAX(CASE WHEN rn = 10 THEN ts END))
              - epoch_us(MAX(CASE WHEN rn = 1 THEN ts END)))
                 // 86400000000 AS span_days
      FROM r WHERE rn IN (1, 10) GROUP BY 1
      HAVING COUNT(*) = 2),
b AS (SELECT CASE WHEN span_days = 0 THEN '0_same_day'
                  WHEN span_days <= 7 THEN '1_week'
                  WHEN span_days <= 30 THEN '2_month'
                  ELSE '3_slower' END AS bucket
      FROM s)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users
FROM b GROUP BY 1 ORDER BY 1
"""


def orders_top_day_concentration_sweep(sf_dir: str):
    """Revenue CONCENTRATION over calendar days: the share captured by the
    top-1 / 5 / 10 / 30 revenue days, in integer ppm — the single-day-
    dependence number a capacity planner reads (and the day-grain cousin
    of the customer Lorenz ops).  Daily sums fold distributed; the sweep
    ranks the O(days) driver table once."""
    KS = [1, 5, 10, 30]
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"d": t["o_orderdate"], "cents": _cents(t["o_totalprice"])}
        ).group_by("d").aggregate([("cents", "sum")])
        return g.rename_columns(["d", "cents"])

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    v = np.sort(daily["cents"].to_numpy(dtype=np.int64))[::-1]
    total = int(v.sum())
    rows = []
    for k in KS:
        top = int(v[: min(k, len(v))].sum())
        rows.append((k, top, total, top * 1_000_000 // total))
    return pa.table(
        {
            "k_days": pa.array([r[0] for r in rows], pa.int64()),
            "topk_cents": pa.array([r[1] for r in rows], pa.int64()),
            "total_cents": pa.array([r[2] for r in rows], pa.int64()),
            "share_ppm": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


ORDERS_TOP_DAY_CONCENTRATION_SWEEP_SQL = """
WITH d AS (SELECT o_orderdate AS day,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT) AS cents
           FROM orders GROUP BY 1),
r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents DESC) AS rnk FROM d),
t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM d),
ks AS (SELECT CAST(unnest([1, 5, 10, 30]) AS BIGINT) AS k_days)
SELECT ks.k_days,
       CAST(SUM(CASE WHEN r.rnk <= ks.k_days THEN r.cents ELSE 0 END)
            AS BIGINT) AS topk_cents,
       t.total AS total_cents,
       CAST(CAST(SUM(CASE WHEN r.rnk <= ks.k_days THEN r.cents ELSE 0 END)
                 AS BIGINT) * 1000000 // t.total AS BIGINT) AS share_ppm
FROM ks CROSS JOIN r CROSS JOIN t
GROUP BY 1, 3 ORDER BY 1
"""


def purchase_graph_expansion_factor(sf_dir: str):
    """Pair-EXPANSION planning numbers for the co-purchase self-join: the
    raw pair volume ΣC(k,2) a naive expansion generates (the shuffle
    cost), the distinct pairs that survive, and the collision ppm — the
    triple that decides whether to pre-aggregate pairs before the
    shuffle.  Both counts are exact integer folds; C(k,2) comes from the
    per-order distinct-part counts."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def edges_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"o": t["l_orderkey"], "p": t["l_partkey"]}).group_by(["o", "p"]).aggregate([])
        )

    edges = (
        li.map_batches(edges_partial, batch_format="pyarrow")
        .groupby(["o", "p"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .materialize()
    )

    # per-order distinct counts need the global edge table; groups are
    # co-partitioned so the count is exact per order
    def per_order(g: pa.Table) -> pa.Table:
        k = g.num_rows
        return pa.table({"kc2": pa.array([k * (k - 1) // 2], pa.int64())})

    raw_pairs = int(
        edges.groupby("o")
        .map_groups(per_order, batch_format="pyarrow")
        .aggregate(Sum("kc2"))["sum(kc2)"]
    )

    def pairs(g: pa.Table) -> pa.Table:
        p = np.sort(g["p"].combine_chunks().to_numpy(zero_copy_only=False))
        if len(p) < 2:
            return pa.table({"p_a": pa.array([], pa.int64()), "p_b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(p), k=1)
        return pa.table({"p_a": pa.array(p[ia], pa.int64()), "p_b": pa.array(p[ib], pa.int64())})

    distinct_pairs = (
        edges.groupby("o")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["p_a", "p_b"])
        .aggregate(Count(alias_name="_n"))
        .count()
    )
    return pa.table(
        {
            "raw_pairs": pa.array([raw_pairs], pa.int64()),
            "distinct_pairs": pa.array([distinct_pairs], pa.int64()),
            "collision_ppm": pa.array(
                [(raw_pairs - distinct_pairs) * 1_000_000 // max(raw_pairs, 1)], pa.int64()
            ),
        }
    )


PURCHASE_GRAPH_EXPANSION_FACTOR_SQL = """
WITH e AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
k AS (SELECT o, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1),
raw AS (SELECT CAST(SUM(k * (k - 1) // 2) AS BIGINT) AS raw_pairs FROM k),
d AS (SELECT CAST(COUNT(*) AS BIGINT) AS distinct_pairs
      FROM (SELECT DISTINCT a.p, b.p AS p2 FROM e a
            JOIN e b ON a.o = b.o AND a.p < b.p))
SELECT raw.raw_pairs, d.distinct_pairs,
       CAST((raw.raw_pairs - d.distinct_pairs) * 1000000
            // GREATEST(raw.raw_pairs, 1) AS BIGINT) AS collision_ppm
FROM raw, d
"""


def orders_sequence_index_value_profile(sf_dir: str):
    """LIFECYCLE value curve: order value by the customer's order
    SEQUENCE index (1st, 2nd, … capped at 10+) — does the nth order grow
    or shrink as the relationship matures?  Sequence ranks come from a
    per-customer sort ((date, key) total order); the profile is an
    integer fold with the mean exposed as milli-cents (sum·1000 // n)."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def per_cust(g: pa.Table) -> pa.Table:
        d = g["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        k = g["o_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = _cents(g["o_totalprice"]).to_numpy()
        order = np.lexsort((k, d))
        idx = np.minimum(np.arange(1, len(order) + 1, dtype=np.int64), 10)
        return pa.table(
            {
                "seq_idx": pa.array(idx, pa.int64()),
                "one": pa.array(np.ones(len(order), dtype=np.int64)),
                "cents": pa.array(cents[order]),
            }
        )

    out = (
        ds.groupby("o_custkey")
        .map_groups(per_cust, batch_format="pyarrow")
        .groupby("seq_idx")
        .aggregate(Sum("one", alias_name="n"), Sum("cents", alias_name="sum_cents"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].cast(pa.int64()).to_numpy()
        s = t["sum_cents"].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "seq_idx": t["seq_idx"].cast(pa.int64()),
                "n": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
                "mean_milli_cents": pa.array(s * 1000 // n, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("seq_idx")


ORDERS_SEQUENCE_INDEX_VALUE_PROFILE_SQL = """
WITH r AS (
  SELECT CAST(LEAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                    10) AS BIGINT) AS seq_idx,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
s AS (SELECT seq_idx, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sum_cents
      FROM r GROUP BY 1)
SELECT seq_idx, n, sum_cents,
       CAST(sum_cents * 1000 // n AS BIGINT) AS mean_milli_cents
FROM s ORDER BY seq_idx
"""


def media_png_pixelsum_oracle(sf_dir: str):
    """PNG-codec value oracle — the BMP oracle's stronger sibling: the
    same deterministic 16×16 gradient (pixel = (13·id + 31x + 7y) mod
    256, grayscale) round-trips through the REAL spec-valid PNG path
    (functions/png.py — IHDR/IDAT/IEND chunks, zlib deflate, CRC-32,
    scanline filters) and the decoded sum must match the SQL closed
    form.  A filter/CRC/inflate bug anywhere in the codec breaks the
    hash, which a rows-only media check would never see."""
    from ...functions.png import decode_png, encode_png

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    x = np.arange(16, dtype=np.int64)[None, :]
    y = np.arange(16, dtype=np.int64)[:, None]

    def work(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sums = np.empty(len(ids), dtype=np.int64)
        for j, i in enumerate(ids):
            v = ((13 * int(i) + 31 * x + 7 * y) % 256).astype(np.uint8)
            back = decode_png(encode_png(v))
            back2 = back[:, :, 0] if back.ndim == 3 else back
            if not np.array_equal(back2, v):
                raise ValueError("PNG round-trip mismatch")
            sums[j] = int(back2.astype(np.int64).sum())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_pixels": pa.array(np.full(len(ids), 256, dtype=np.int64)),
                "pixel_sum": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(work, batch_format="pyarrow").sort("doc_id")


MEDIA_PNG_PIXELSUM_ORACLE_SQL = """
WITH xs AS (SELECT unnest(range(0, 16)) AS x),
ys AS (SELECT unnest(range(0, 16)) AS y),
px AS (SELECT d.doc_id, (13 * d.doc_id + 31 * xs.x + 7 * ys.y) % 256 AS v
       FROM documents d, xs, ys)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pixels,
       CAST(SUM(v) AS BIGINT) AS pixel_sum
FROM px GROUP BY 1 ORDER BY 1
"""


def events_cumulative_user_curve(sf_dir: str):
    """Cumulative DISTINCT-user growth by month — the audience curve: new
    users per month (first-ever event) and the running total, computed
    WITHOUT a cumulative distinct (non-additive) by reducing each user
    to a first-seen month and prefix-summing the tiny month histogram on
    the driver."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def first_partial(t: pa.Table) -> pa.Table:
        ym = pc.add(
            pc.multiply(pc.year(t["ts"]).cast(pa.int64()), 100),
            pc.month(t["ts"]).cast(pa.int64()),
        )
        g = pa.table({"user_id": t["user_id"], "ym": ym}).group_by("user_id").aggregate(
            [("ym", "min")]
        )
        return g.rename_columns(["user_id", "first_ym"])

    firsts = (
        ds.map_batches(first_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("first_ym", alias_name="first_ym"))
    )

    def month_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"ym": t["first_ym"]}).group_by("ym").aggregate([("ym", "count")])
        g = g.rename_columns(["ym", "n"])
        return pa.table({"ym": g["ym"], "n": g["n"].cast(pa.int64())})

    hist = (
        firsts.map_batches(month_partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("ym")
    )
    new = hist["n"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "ym": pa.array(hist["ym"].to_numpy(dtype=np.int64), pa.int64()),
            "new_users": pa.array(new, pa.int64()),
            "cum_users": pa.array(np.cumsum(new), pa.int64()),
        }
    )


EVENTS_CUMULATIVE_USER_CURVE_SQL = """
WITH f AS (SELECT user_id,
                  CAST(MIN(year(ts) * 100 + month(ts)) AS BIGINT)
                      AS first_ym
           FROM events GROUP BY 1),
h AS (SELECT first_ym AS ym, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM f GROUP BY 1)
SELECT ym, new_users,
       CAST(SUM(new_users) OVER (ORDER BY ym) AS BIGINT) AS cum_users
FROM h ORDER BY ym
"""


def docs_unigram_nll(sf_dir: str):
    """Per-document negative log-likelihood under the corpus's own global
    unigram language model — the LM-quality gate a training-data pipeline
    scores documents with (high NLL-per-token = unusual token mix).  Two
    passes: a shuffle-free vocab count (block partials -> tiny groupby)
    whose O(vocab) result becomes a driver-side -ln p table (scalar
    math.log = libm = DuckDB LN), then one distributed pass builds a
    per-doc count matrix and runs an EXPLICIT left fold over vocab in
    sorted-token order — the exact fold order the oracle's
    SUM(... ORDER BY term) uses, so the doubles bit-match.  The matrix is
    O(batch_docs x vocab); the broadcast -ln p table is O(vocab)."""
    import math

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def vocab_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"term": flat}).group_by("term").aggregate([("term", "count")])
        g = g.rename_columns(["term", "c"])
        return pa.table({"term": g["term"], "c": g["c"].cast(pa.int64())})

    voc = (
        ds.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    total = int(voc["c"].sum())
    terms = voc["term"].tolist()
    nlp = np.array([-math.log(int(c) / total) for c in voc["c"]], dtype=np.float64)
    vocab_arr = pa.array(terms, pa.string())
    nv = len(terms)

    def work(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        vid = pc.index_in(flat.filter(keep), value_set=vocab_arr)
        vid = vid.to_numpy(zero_copy_only=False).astype(np.int64)
        par = parents.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.zeros((t.num_rows, nv), dtype=np.int64)
        np.add.at(m, (par, vid), 1)
        n_tok = m.sum(axis=1)
        acc = np.zeros(t.num_rows, dtype=np.float64)
        for j in range(nv):  # explicit left fold, sorted-term order
            acc = acc + m[:, j].astype(np.float64) * nlp[j]
        keep_rows = pa.array(n_tok > 0)
        return pa.table(
            {
                "doc_id": pc.filter(t["doc_id"], keep_rows),
                "n_tokens": pa.array(n_tok[n_tok > 0], pa.int64()),
                "nll": pa.array(acc[n_tok > 0], pa.float64()),
            }
        )

    return ds.map_batches(work, batch_format="pyarrow").sort("doc_id")


DOCS_UNIGRAM_NLL_SQL = """
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents),
g AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
lp AS (SELECT term, -LN(CAST(c AS DOUBLE) / (SELECT n FROM tot)) AS nlp FROM g),
d AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2)
SELECT d.doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       SUM(CAST(tf AS DOUBLE) * lp.nlp ORDER BY d.term) AS nll
FROM d JOIN lp ON d.term = lp.term
GROUP BY 1 ORDER BY 1
"""


def part_name_type_char_jaccard(sf_dir: str):
    """Character-set Jaccard between each part's name and its type string
    — the cheap dirty-data screen for 'name leaked into the wrong column'
    (a high char-set overlap between free-text and enum columns flags
    swapped fields).  Exact float oracle via DuckDB's jaccard(): both
    sides reduce to |A∩B| / |A∪B| of small character sets — one division
    of small ints, bit-exact.  Per-row set build is a dim-table census
    (same budget class as part_name_lcp_histogram); the fact path stays
    vectorized."""
    ds = rd.read_parquet(
        _t(sf_dir, "part"), columns=["p_partkey", "p_name", "p_type"]
    )

    def work(t: pa.Table) -> pa.Table:
        names = pc.utf8_lower(t["p_name"]).to_pylist()
        types = pc.utf8_lower(t["p_type"]).to_pylist()
        n = len(names)
        inter = np.empty(n, dtype=np.int64)
        union = np.empty(n, dtype=np.int64)
        jac = np.empty(n, dtype=np.float64)
        for i in range(n):
            sa, sb = set(names[i]), set(types[i])
            ii, uu = len(sa & sb), len(sa | sb)
            inter[i], union[i] = ii, uu
            jac[i] = ii / uu
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "n_inter": pa.array(inter, pa.int64()),
                "n_union": pa.array(union, pa.int64()),
                "jac": pa.array(jac, pa.float64()),
            }
        )

    return ds.map_batches(work, batch_format="pyarrow").sort("p_partkey")


PART_NAME_TYPE_CHAR_JACCARD_SQL = """
WITH s AS (
  SELECT p_partkey, lower(p_name) AS a, lower(p_type) AS b FROM part),
x AS (
  SELECT p_partkey,
         (SELECT CAST(COUNT(DISTINCT ch) AS BIGINT)
          FROM unnest(string_split(a, '')) u(ch)
          WHERE contains(b, ch)) AS n_inter,
         (SELECT CAST(COUNT(DISTINCT ch) AS BIGINT)
          FROM (SELECT unnest(string_split(a, '')) AS ch
                UNION ALL SELECT unnest(string_split(b, ''))) u) AS n_union,
         jaccard(a, b) AS jac
  FROM s)
SELECT p_partkey, n_inter, n_union, jac FROM x ORDER BY p_partkey
"""


def events_type_shannon_terms(sf_dir: str):
    """Shannon-entropy decomposition of the event-type mix — one row per
    type with its probability and surprisal contribution -p·ln p (the
    rows SUM to the stream's entropy; emitting per-type terms instead of
    the sum keeps every output float a fixed IEEE expression of two
    integers, so the oracle hash is exact — the repo's entropy-family
    discipline).  Counts are shuffle-free block partials; the final table
    is O(types)."""
    import math

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"event_type": t["event_type"]})
            .group_by("event_type")
            .aggregate([("event_type", "count")])
        )
        g = g.rename_columns(["event_type", "n"])
        return pa.table({"event_type": g["event_type"], "n": g["n"].cast(pa.int64())})

    cnt = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    total = int(cnt["n"].sum())
    ns = cnt["n"].to_numpy(dtype=np.int64)
    ps = np.empty(len(ns), dtype=np.float64)
    terms = np.empty(len(ns), dtype=np.float64)
    for i, c in enumerate(ns):
        p = int(c) / total
        ps[i] = p
        terms[i] = -p * math.log(p)
    return pa.table(
        {
            "event_type": pa.array(cnt["event_type"].tolist(), pa.string()),
            "n": pa.array(ns, pa.int64()),
            "p": pa.array(ps, pa.float64()),
            "surprisal": pa.array(terms, pa.float64()),
        }
    )


EVENTS_TYPE_SHANNON_TERMS_SQL = """
WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM g)
SELECT event_type, n,
       CAST(n AS DOUBLE) / (SELECT t FROM tot) AS p,
       -(CAST(n AS DOUBLE) / (SELECT t FROM tot))
           * LN(CAST(n AS DOUBLE) / (SELECT t FROM tot)) AS surprisal
FROM g ORDER BY event_type
"""


def orders_daily_theil_u(sf_dir: str):
    """Theil's U for the naive 'tomorrow = today' forecast on the daily
    order-count series — the standard forecastability scalar (U < 1 means
    even naive forecasting beats white noise).  Integer sufficient stats
    end to end: daily counts via shuffle-free partials, then the squared
    one-step differences and squared levels sum exactly in int64 on the
    O(days) driver table; the only float is one SQRT of a double ratio
    (correctly rounded in both engines)."""
    import math

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        dkey = pc.add(
            pc.add(
                pc.multiply(pc.year(t["o_orderdate"]).cast(pa.int64()), 10000),
                pc.multiply(pc.month(t["o_orderdate"]).cast(pa.int64()), 100),
            ),
            pc.day(t["o_orderdate"]).cast(pa.int64()),
        )
        g = pa.table({"dkey": dkey}).group_by("dkey").aggregate([("dkey", "count")])
        g = g.rename_columns(["dkey", "n"])
        return pa.table({"dkey": g["dkey"], "n": g["n"].cast(pa.int64())})

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dkey")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("dkey")
    )
    c = daily["n"].to_numpy(dtype=np.int64)
    empty = pa.table(
        {
            "n_days": pa.array([], pa.int64()),
            "sse_naive": pa.array([], pa.int64()),
            "ss_actual": pa.array([], pa.int64()),
            "theil_u": pa.array([], pa.float64()),
        }
    )
    if len(c) < 2:
        return empty
    diffs = c[1:] - c[:-1]
    sse = int(np.sum(diffs * diffs))
    ss = int(np.sum(c[1:] * c[1:]))
    if ss == 0:
        return empty
    return pa.table(
        {
            "n_days": pa.array([len(c)], pa.int64()),
            "sse_naive": pa.array([sse], pa.int64()),
            "ss_actual": pa.array([ss], pa.int64()),
            "theil_u": pa.array([math.sqrt(sse / ss)], pa.float64()),
        }
    )


ORDERS_DAILY_THEIL_U_SQL = """
WITH d AS (SELECT CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100
                       + day(o_orderdate) AS BIGINT) AS dkey,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1),
s AS (SELECT dkey, n, lag(n) OVER (ORDER BY dkey) AS pn FROM d)
SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n_days,
       CAST(SUM((n - pn) * (n - pn)) AS BIGINT) AS sse_naive,
       CAST(SUM(n * n) AS BIGINT) AS ss_actual,
       SQRT(CAST(SUM((n - pn) * (n - pn)) AS DOUBLE)
            / CAST(SUM(n * n) AS DOUBLE)) AS theil_u
FROM s WHERE pn IS NOT NULL
HAVING COUNT(*) > 0 AND SUM(n * n) > 0
"""


def docs_zip_roundtrip_census(sf_dir: str):
    """ZIP-container ingest path — the tar census's sibling on the repo's
    THIRD real archive format (functions/zip.py: local headers, central
    directory, EOCD, real CRC-32 words): each block of documents is
    serialized into a genuine stored-method ZIP, parsed back by our own
    central-directory walker (CRC-verified), AND cross-checked against the
    stdlib zipfile reader in-pipeline — a framing or CRC bug anywhere
    fails the task, and the size census hash-mismatches.  Archives are
    built per block, the shard pattern where members never cross block
    boundaries."""
    import io
    import zipfile as _zipfile

    from ...functions.zip import build_zip, parse_zip

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def roundtrip(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        buf = build_zip(
            [(f"doc_{i:012d}.txt", s.encode("utf-8")) for i, s in zip(ids, texts)]
        )
        members = parse_zip(buf)
        zf = _zipfile.ZipFile(io.BytesIO(buf))
        if [(i.filename, zf.read(i)) for i in zf.infolist()] != members:
            raise ValueError("zip stdlib cross-check mismatch")
        out_ids, sizes, locals_, centrals = [], [], [], []
        for name, payload in members:
            out_ids.append(int(name[4:16]))
            sizes.append(len(payload))
            locals_.append(30 + len(name) + len(payload))
            centrals.append(46 + len(name))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "member_bytes": pa.array(sizes, pa.int64()),
                "local_record_bytes": pa.array(locals_, pa.int64()),
                "central_record_bytes": pa.array(centrals, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow").sort("doc_id")


DOCS_ZIP_ROUNDTRIP_CENSUS_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS member_bytes,
       CAST(30 + 20 + octet_length(encode(text)) AS BIGINT)
           AS local_record_bytes,
       CAST(46 + 20 AS BIGINT) AS central_record_bytes
FROM documents ORDER BY doc_id
"""


def docs_char_entropy(sf_dir: str):
    """Per-document character-distribution Shannon entropy (nats) — the
    classic gibberish / binary-spill screen a web-extraction gate runs
    before tokenization (natural text sits near 2.8–3.2 nats; base64 blobs
    and repeated-char padding fall far outside).  Counts are a per-block
    byte-histogram matrix (np.add.at, zero Python in the counting); the
    entropy fold walks each doc's nonzero byte values in ASCENDING order
    with scalar libm logs — exactly the oracle's SUM(-p·ln p ORDER BY ch),
    so the doubles bit-match.  ASCII scope enforced (multi-byte text would
    need char-level counting; the corpus is ASCII by construction)."""
    import math

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def work(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        joined = "".join(texts).encode("ascii")  # raises on non-ASCII: scope guard
        arr = np.frombuffer(joined, dtype=np.uint8)
        lens = np.array([len(s) for s in texts], dtype=np.int64)
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        m = np.zeros((len(texts), 256), dtype=np.int64)
        np.add.at(m, (doc_idx, arr), 1)
        ids, n_chars, n_distinct, ent = [], [], [], []
        id_col = t["doc_id"].to_pylist()
        for i in range(len(texts)):
            n_i = int(lens[i])
            if n_i == 0:
                continue
            nz = np.nonzero(m[i])[0]
            acc = 0.0
            for v in nz.tolist():  # ascending byte order == SQL ORDER BY ch
                p = int(m[i, v]) / n_i
                acc += -p * math.log(p)
            ids.append(id_col[i])
            n_chars.append(n_i)
            n_distinct.append(len(nz))
            ent.append(acc)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_distinct_chars": pa.array(n_distinct, pa.int64()),
                "entropy": pa.array(ent, pa.float64()),
            }
        )

    return ds.map_batches(work, batch_format="pyarrow").sort("doc_id")


DOCS_CHAR_ENTROPY_SQL = """
WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
g AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c FROM c GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM g GROUP BY 1)
SELECT g.doc_id, n.n AS n_chars, CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       SUM(-(CAST(c AS DOUBLE) / n.n) * LN(CAST(c AS DOUBLE) / n.n)
           ORDER BY g.ch) AS entropy
FROM g JOIN n USING (doc_id)
GROUP BY g.doc_id, n.n ORDER BY g.doc_id
"""


def docs_lang_token_js_terms(sf_dir: str):
    """Jensen-Shannon divergence decomposition between each language's
    token distribution and the global corpus distribution — the standard
    'how far does this slice drift from the mix' scalar in corpus curation,
    emitted as per-(lang, token) TERMS over the observed support so every
    output float is one fixed IEEE tree of four integers (c_lang, n_lang,
    c_global, n_global): p·ln(p/m) and q·ln(q/m) with m = (p+q)/2.
    Distributed part: one shuffle-free (lang, token) count; the driver
    table is O(langs × vocab)."""
    import math

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^a-z0-9]+"
        ).combine_chunks()
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        lang = pc.take(t["lang"].combine_chunks(), parents.filter(keep))
        g = (
            pa.table({"lang": lang, "term": flat.filter(keep)})
            .group_by(["lang", "term"])
            .aggregate([("term", "count")])
        )
        g = g.rename_columns(["lang", "term", "c"])
        return pa.table(
            {"lang": g["lang"], "term": g["term"], "c": g["c"].cast(pa.int64())}
        )

    lt = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values(["lang", "term"])
        .reset_index(drop=True)
    )
    n_lang = lt.groupby("lang")["c"].sum().to_dict()
    c_glob = lt.groupby("term")["c"].sum().to_dict()
    n_glob = int(lt["c"].sum())
    term_p = np.empty(len(lt), dtype=np.float64)
    term_q = np.empty(len(lt), dtype=np.float64)
    cl = np.empty(len(lt), dtype=np.int64)
    nl = np.empty(len(lt), dtype=np.int64)
    cg = np.empty(len(lt), dtype=np.int64)
    for i, (lg, tm, c) in enumerate(zip(lt["lang"], lt["term"], lt["c"])):
        p = int(c) / int(n_lang[lg])
        q = int(c_glob[tm]) / n_glob
        m = (p + q) / 2
        term_p[i] = p * math.log(p / m)
        term_q[i] = q * math.log(q / m)
        cl[i], nl[i], cg[i] = int(c), int(n_lang[lg]), int(c_glob[tm])
    return pa.table(
        {
            "lang": pa.array(lt["lang"].tolist(), pa.string()),
            "term": pa.array(lt["term"].tolist(), pa.string()),
            "c_lang": pa.array(cl, pa.int64()),
            "n_lang": pa.array(nl, pa.int64()),
            "c_global": pa.array(cg, pa.int64()),
            "n_global": pa.array(np.full(len(lt), n_glob, dtype=np.int64)),
            "term_p": pa.array(term_p, pa.float64()),
            "term_q": pa.array(term_q, pa.float64()),
        }
    )


DOCS_LANG_TOKEN_JS_TERMS_SQL = """
WITH t AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents),
l AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1, 2),
nl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM l GROUP BY 1),
g AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cg FROM l GROUP BY 1),
ng AS (SELECT CAST(SUM(cg) AS BIGINT) AS n FROM g),
x AS (SELECT l.lang, l.term, l.c, nl.n AS n_lang, g.cg,
             (SELECT n FROM ng) AS n_global,
             CAST(l.c AS DOUBLE) / nl.n AS p,
             CAST(g.cg AS DOUBLE) / (SELECT n FROM ng) AS q
      FROM l JOIN nl USING (lang) JOIN g USING (term))
SELECT lang, term, c AS c_lang, n_lang, cg AS c_global, n_global,
       p * LN(p / ((p + q) / 2e0)) AS term_p,
       q * LN(q / ((p + q) / 2e0)) AS term_q
FROM x ORDER BY lang, term
"""


def part_name_reverse_dl_census(sf_dir: str):
    """Unrestricted Damerau-Levenshtein census: distance from each part
    name to its own reversal — a palindromicity profile that exercises
    every edit class (insert/delete/substitute AND transpose-of-adjacent,
    where transposed pairs may be edited again) of the repo's new
    Lowrance-Wagner kernel (functions/similarity.py:damerau_levenshtein),
    cross-engine-checked against DuckDB's damerau_levenshtein() — an exact
    integer oracle for the hardest string-distance variant (the fuzzy
    family's Levenshtein/Myers kernels already have theirs).  Dim-table
    census budget; O(n·m) per name on ≤ ~25-char names."""
    from ...functions.similarity import damerau_levenshtein

    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_name"])

    def work(t: pa.Table) -> pa.Table:
        names = t["p_name"].to_pylist()
        dl = np.empty(len(names), dtype=np.int64)
        for i, s in enumerate(names):
            dl[i] = damerau_levenshtein(s, s[::-1])
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "name_len": pc.utf8_length(t["p_name"]).cast(pa.int64()),
                "dl_reverse": pa.array(dl, pa.int64()),
            }
        )

    return ds.map_batches(work, batch_format="pyarrow").sort("p_partkey")


PART_NAME_REVERSE_DL_CENSUS_SQL = """
SELECT p_partkey, CAST(length(p_name) AS BIGINT) AS name_len,
       CAST(damerau_levenshtein(p_name, reverse(p_name)) AS BIGINT)
           AS dl_reverse
FROM part ORDER BY p_partkey
"""


def docs_md5_census(sf_dir: str):
    """REAL MD5 digests per document (hashlib / RFC 1321) cross-checked
    against DuckDB's native ``md5()`` — an exact cross-engine proof of the
    full digest over the text bytes, plus the first-nibble bucket a
    hash-partitioned layout would route on.  Per-row hashing of a
    variable-length string is inherent (same budget class as the Adler-32
    census); everything else is block-columnar."""
    import hashlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def census(t: pa.Table) -> pa.Table:
        digs = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "md5_hex": pa.array(digs, pa.string()),
                "bucket": pa.array([d[0] for d in digs], pa.string()),
            }
        )

    return ds.map_batches(census, batch_format="pyarrow").sort("doc_id")


DOCS_MD5_CENSUS_SQL = """
SELECT doc_id, md5(text) AS md5_hex, substr(md5(text), 1, 1) AS bucket
FROM documents ORDER BY doc_id
"""


def docs_warc_roundtrip_census(sf_dir: str):
    """REAL WARC/1.0 round-trip (functions/warc.py): each document is
    framed as a genuine ISO-28500 ``resource`` record, every block's
    records are CONCATENATED into one crawl buffer and re-parsed with the
    strict Content-Length-framed parser (multi-record framing, not just
    per-record), payloads verified byte-equal, then the global archive
    offset of every record is computed with the shuffle-free two-phase
    prefix scan (stages/scan.py:running_sum).  The oracle reconstructs the
    record layout arithmetically — 125 fixed header/trailer bytes + the digit
    widths of the id and the length — so a hash match proves the writer,
    the parser AND the offset scan agree with the format definition."""
    from ...functions.warc import parse_records, record_length, write_record
    from ...stages.scan import running_sum

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def census(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        buf = b"".join(write_record(i, p) for i, p in zip(ids, payloads))
        recs = parse_records(buf)
        if len(recs) != len(ids):
            raise ValueError("WARC round-trip lost records")
        lens = []
        for rec, i, p in zip(recs, ids, payloads):
            if rec["doc_id"] != i or rec["payload"] != p:
                raise ValueError(f"WARC round-trip mismatch for doc {i}")
            if rec["record_len"] != record_length(i, len(p)):
                raise ValueError(f"WARC length formula broken for doc {i}")
            lens.append(rec["record_len"])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
                "record_len": pa.array(lens, pa.int64()),
            }
        )

    framed = ds.map_batches(census, batch_format="pyarrow")
    cum = running_sum(
        framed, order_col="doc_id", value_col="record_len", out_col="cum_len"
    )

    def offset(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload_len": t["payload_len"],
                "record_len": t["record_len"],
                "warc_offset": pc.subtract(t["cum_len"], t["record_len"]),
            }
        )

    return cum.map_batches(offset, batch_format="pyarrow").sort("doc_id")


DOCS_WARC_ROUNDTRIP_CENSUS_SQL = """
WITH r AS (
  SELECT doc_id,
         CAST(strlen(text) AS BIGINT) AS payload_len,
         CAST(125 + 2 * length(CAST(doc_id AS VARCHAR))
              + length(CAST(strlen(text) AS VARCHAR))
              + strlen(text) AS BIGINT) AS record_len
  FROM documents)
SELECT doc_id, payload_len, record_len,
       CAST(SUM(record_len) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - record_len AS BIGINT) AS warc_offset
FROM r ORDER BY doc_id
"""


def orders_daily_count_rs_terms(sf_dir: str):
    """Hurst rescaled-range INTEGER terms per year over the daily
    order-count series: with the n-scaled cumulative deviations
    z_j = n·prefix_j − j·S (exact int64 — the float mean never appears),
    emit the adjusted range max(z,0)−min(z,0) and the scaled variance
    numerator n·Σx²−S².  Counts keep every term far inside int64 at any
    SF.  Daily partials per block; the per-year walk is a driver pass
    over the tiny day table."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "yr": pc.year(t["o_orderdate"]).cast(pa.int64()),
                "d": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        g = tb.group_by(["yr", "d"]).aggregate([("one", "sum")])
        return g.rename_columns(["yr", "d", "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["yr", "d"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values(["yr", "d"], kind="mergesort")
    )
    years, n_days, totals, rs, nssq = [], [], [], [], []
    for yr, grp in agg.groupby("yr", sort=True):
        x = grp["cnt"].to_numpy(np.int64)
        n = len(x)
        s = int(x.sum())
        z = n * np.cumsum(x) - np.arange(1, n + 1, dtype=np.int64) * s
        years.append(int(yr))
        n_days.append(n)
        totals.append(s)
        rs.append(int(max(z.max(), 0) - min(z.min(), 0)))
        nssq.append(int(n * (x * x).sum() - s * s))
    return pa.table(
        {
            "year": pa.array(years, pa.int64()),
            "n_days": pa.array(n_days, pa.int64()),
            "total_orders": pa.array(totals, pa.int64()),
            "rs_range": pa.array(rs, pa.int64()),
            "nssq": pa.array(nssq, pa.int64()),
        }
    )


ORDERS_DAILY_COUNT_RS_TERMS_SQL = """
WITH d AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         strftime(o_orderdate, '%Y-%m-%d') AS dt,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2),
c AS (
  SELECT yr, cnt,
         SUM(cnt) OVER (PARTITION BY yr ORDER BY dt
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS pref,
         ROW_NUMBER() OVER (PARTITION BY yr ORDER BY dt) AS j,
         COUNT(*) OVER (PARTITION BY yr) AS n,
         SUM(cnt) OVER (PARTITION BY yr) AS s
  FROM d),
z AS (SELECT yr, n, s, cnt, n * pref - j * s AS zj FROM c)
SELECT yr AS year,
       CAST(n AS BIGINT) AS n_days,
       CAST(s AS BIGINT) AS total_orders,
       CAST(GREATEST(MAX(zj), 0) - LEAST(MIN(zj), 0) AS BIGINT) AS rs_range,
       CAST(n * SUM(cnt * cnt) - s * s AS BIGINT) AS nssq
FROM z GROUP BY yr, n, s ORDER BY yr
"""


def lineitem_stratified_ratio_estimate(sf_dir: str):
    """Survey-sampling ratio estimator per stratum (returnflag): a
    deterministic systematic sample ((8·orderkey+linenumber) mod 10 = 3)
    estimates total extended-price cents from the FULL quantity total via
    the classic ratio  est = sample_cents · qty_all / qty_sample — all
    inputs exact int64 partials, the estimate ONE fixed IEEE expression
    on both sides.  Complements the Horvitz–Thompson audit with the
    auxiliary-variable estimator."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_quantity",
            "l_extendedprice",
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        key = t["l_orderkey"].to_numpy(zero_copy_only=False) * 8 + t[
            "l_linenumber"
        ].to_numpy(zero_copy_only=False).astype(np.int64)
        samp = (key % 10 == 3).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
        tb = pa.table(
            {
                "returnflag": t["l_returnflag"],
                "n_all": pa.array(np.ones(t.num_rows, np.int64)),
                "n_sample": pa.array(samp),
                "qty_all": pa.array(qty),
                "qty_sample": pa.array(samp * qty),
                "sample_cents": pa.array(samp * cents),
                "actual_cents": pa.array(cents),
            }
        )
        g = tb.group_by("returnflag").aggregate(
            [
                ("n_all", "sum"),
                ("n_sample", "sum"),
                ("qty_all", "sum"),
                ("qty_sample", "sum"),
                ("sample_cents", "sum"),
                ("actual_cents", "sum"),
            ]
        )
        return g.rename_columns(
            [
                "returnflag",
                "n_all",
                "n_sample",
                "qty_all",
                "qty_sample",
                "sample_cents",
                "actual_cents",
            ]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("returnflag")
        .aggregate(
            Sum("n_all", alias_name="n_all"),
            Sum("n_sample", alias_name="n_sample"),
            Sum("qty_all", alias_name="qty_all"),
            Sum("qty_sample", alias_name="qty_sample"),
            Sum("sample_cents", alias_name="sample_cents"),
            Sum("actual_cents", alias_name="actual_cents"),
        )
        .to_pandas()
        .sort_values("returnflag", kind="mergesort")
    )
    est = [
        float(sc) * float(qa) / float(qs)
        for sc, qa, qs in zip(
            agg["sample_cents"], agg["qty_all"], agg["qty_sample"]
        )
    ]
    return pa.table(
        {
            "returnflag": pa.array(agg["returnflag"], pa.string()),
            "n_all": pa.array(agg["n_all"].to_numpy(np.int64)),
            "n_sample": pa.array(agg["n_sample"].to_numpy(np.int64)),
            "qty_all": pa.array(agg["qty_all"].to_numpy(np.int64)),
            "qty_sample": pa.array(agg["qty_sample"].to_numpy(np.int64)),
            "sample_cents": pa.array(agg["sample_cents"].to_numpy(np.int64)),
            "actual_cents": pa.array(agg["actual_cents"].to_numpy(np.int64)),
            "ratio_est_cents": pa.array(est, pa.float64()),
        }
    )


LINEITEM_STRATIFIED_RATIO_ESTIMATE_SQL = """
WITH l AS (
  SELECT l_returnflag AS returnflag,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN (l_orderkey * 8 + l_linenumber) % 10 = 3
              THEN 1 ELSE 0 END AS s
  FROM lineitem),
g AS (
  SELECT returnflag,
         CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(s) AS BIGINT) AS n_sample,
         CAST(SUM(qty) AS BIGINT) AS qty_all,
         CAST(SUM(s * qty) AS BIGINT) AS qty_sample,
         CAST(SUM(s * cents) AS BIGINT) AS sample_cents,
         CAST(SUM(cents) AS BIGINT) AS actual_cents
  FROM l GROUP BY returnflag)
SELECT returnflag, n_all, n_sample, qty_all, qty_sample, sample_cents,
       actual_cents,
       CAST(sample_cents AS DOUBLE) * CAST(qty_all AS DOUBLE)
           / CAST(qty_sample AS DOUBLE) AS ratio_est_cents
FROM g ORDER BY returnflag
"""


def docs_warc_shard_export_manifest(sf_dir: str):
    """Crawl-export through the REAL web-archive container: documents are
    sharded by doc_id//64, each shard serialized as a genuine WARC/1.0
    archive (functions/warc.py) under /tmp, re-parsed with the strict
    Content-Length-framed parser for verification, and the MANIFEST
    (records, payload bytes, exact archive bytes) emitted — with every
    byte count reconstructed arithmetically by the oracle from the
    record-layout formula.  Shards build independently per group; the
    manifest is tiny.  Pairs with docs_tar_shard_export_manifest: the
    same export discipline in the container crawls actually use."""
    import os

    from ...functions.warc import parse_records, write_record

    # namespaced by SF so a concurrent bench/sweep at another SF can't
    # clobber these shard files mid-read (ADVICE r4)
    out_dir = f"/tmp/iocr_warc_shards_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def pre(t: pa.Table) -> pa.Table:
        return t.append_column("shard_id", pc.divide(t["doc_id"], 64))

    def shard(g: pa.Table) -> pa.Table:
        sid = int(g["shard_id"][0].as_py())
        rows = sorted(zip(g["doc_id"].to_pylist(), g["text"].to_pylist()))
        payloads = [(i, s.encode("utf-8")) for i, s in rows]
        buf = b"".join(write_record(i, p) for i, p in payloads)
        path = f"{out_dir}/shard-{sid:06d}.warc"
        with open(path, "wb") as f:
            f.write(buf)
        back = parse_records(open(path, "rb").read())
        if [(r["doc_id"], r["payload"]) for r in back] != payloads:
            raise ValueError("WARC shard verification failed")
        return pa.table(
            {
                "shard_id": pa.array([sid], pa.int64()),
                "n_records": pa.array([len(payloads)], pa.int64()),
                "payload_bytes": pa.array(
                    [sum(len(p) for _, p in payloads)], pa.int64()
                ),
                "archive_bytes": pa.array([len(buf)], pa.int64()),
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(shard, batch_format="pyarrow")
        .sort("shard_id")
    )


DOCS_WARC_SHARD_EXPORT_MANIFEST_SQL = """
WITH m AS (
  SELECT doc_id // 64 AS shard_id,
         CAST(strlen(text) AS BIGINT) AS sz,
         CAST(125 + 2 * length(CAST(doc_id AS VARCHAR))
              + length(CAST(strlen(text) AS VARCHAR))
              + strlen(text) AS BIGINT) AS rl
  FROM documents)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(SUM(sz) AS BIGINT) AS payload_bytes,
       CAST(SUM(rl) AS BIGINT) AS archive_bytes
FROM m GROUP BY 1 ORDER BY 1
"""


def docs_simhash64_census(sf_dir: str):
    """EXACT 64-bit SimHash census (Charikar STOC'02) — the first exact
    oracle for the simhash family (simhash_neardup's recall is
    probabilistic, documented rows-only): per document, every distinct
    token votes its count on each bit of its 64-bit hash (top half of
    md5 — the engine-neutral hash idiom both engines compute), bit b of
    the fingerprint is 1 iff the signed vote total is positive.  Emitted
    as (hi, lo) 32-bit halves plus popcount so nothing touches unsigned
    dtypes.  Token hashing is cached per block (Zipfian vocab); the vote
    fold is one numpy matmul per doc."""
    import hashlib
    from collections import Counter

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    pow32 = (1 << np.arange(32, dtype=np.int64)).astype(np.int64)

    def census(t: pa.Table) -> pa.Table:
        cache: dict[str, int] = {}
        ids, his, los, pops = [], [], [], []
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = s.strip().split()
            if not toks:
                continue
            cnt = Counter(toks)
            hs = np.empty(len(cnt), np.uint64)
            cs = np.empty(len(cnt), np.int64)
            for k, (w, c) in enumerate(cnt.items()):
                h = cache.get(w)
                if h is None:
                    h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16)
                    cache[w] = h
                hs[k] = h
                cs[k] = c
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int64
            )
            acc = ((2 * bits - 1) * cs[:, None]).sum(axis=0)
            bset = (acc > 0).astype(np.int64)
            ids.append(i)
            los.append(int(bset[:32] @ pow32))
            his.append(int(bset[32:] @ pow32))
            pops.append(int(bset.sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash_hi": pa.array(his, pa.int64()),
                "simhash_lo": pa.array(los, pa.int64()),
                "popcount": pa.array(pops, pa.int64()),
            }
        )

    return ds.map_batches(census, batch_format="pyarrow").sort("doc_id")


DOCS_SIMHASH64_CENSUS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''),
tc AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
       FROM tok GROUP BY doc_id, w),
h AS (SELECT doc_id, c,
             CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS hw
      FROM tc),
b AS (SELECT doc_id, c, hw,
             CAST(unnest(range(0, 64)) AS BIGINT) AS bit
      FROM h),
s AS (SELECT doc_id, bit,
             SUM(CASE WHEN (hw >> bit) & 1 = 1 THEN c ELSE -c END) AS acc
      FROM b GROUP BY doc_id, bit)
SELECT doc_id,
       CAST(SUM(CASE WHEN acc > 0 AND bit >= 32
                THEN (CAST(1 AS BIGINT) << CAST(bit - 32 AS INT))
                ELSE 0 END) AS BIGINT) AS simhash_hi,
       CAST(SUM(CASE WHEN acc > 0 AND bit < 32
                THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                ELSE 0 END) AS BIGINT) AS simhash_lo,
       CAST(SUM(CASE WHEN acc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS popcount
FROM s GROUP BY doc_id ORDER BY doc_id
"""


def events_hourly_period4_dft_power(sf_dir: str):
    """EXACT spectral probe: squared DFT magnitude of the hourly event
    count series at periods 4 h and 2 h, per event type.  At N/4 the
    twiddle factors are {±1, 0}, so C = Σₕ xₕ·cos and S = Σₕ xₕ·sin are
    exact int64 — and because Σₕ xₕ·cₕ = Σₑ c_{h(e)}, the hourly series
    never needs materializing: each event contributes its hour-phase
    weight directly to the per-type partial (one pass, no shuffle beyond
    the tiny type fold).  power = C² + S², the diurnal-harmonic energy a
    seasonality monitor thresholds on."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "ts"])
    c4w = np.array([1, 0, -1, 0], np.int64)
    s4w = np.array([0, 1, 0, -1], np.int64)
    c2w = np.array([1, -1], np.int64)

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        j = us // 3_600_000_000
        tb = pa.table(
            {
                "event_type": t["event_type"],
                "n_events": pa.array(np.ones(t.num_rows, np.int64)),
                "c4": pa.array(c4w[j % 4]),
                "s4": pa.array(s4w[j % 4]),
                "c2": pa.array(c2w[j % 2]),
            }
        )
        g = tb.group_by("event_type").aggregate(
            [("n_events", "sum"), ("c4", "sum"), ("s4", "sum"), ("c2", "sum")]
        )
        return g.rename_columns(["event_type", "n_events", "c4", "s4", "c2"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("c4", alias_name="c4"),
            Sum("s4", alias_name="s4"),
            Sum("c2", alias_name="c2"),
        )
        .to_pandas()
        .sort_values("event_type", kind="mergesort")
    )
    c4 = agg["c4"].to_numpy(np.int64)
    s4 = agg["s4"].to_numpy(np.int64)
    c2 = agg["c2"].to_numpy(np.int64)
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"], pa.string()),
            "n_events": pa.array(agg["n_events"].to_numpy(np.int64)),
            "c4": pa.array(c4),
            "s4": pa.array(s4),
            "power4": pa.array(c4 * c4 + s4 * s4),
            "c2": pa.array(c2),
            "power2": pa.array(c2 * c2),
        }
    )


EVENTS_HOURLY_PERIOD4_DFT_POWER_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) % 4 AS j4,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) % 2 AS j2
  FROM events),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN j4 = 0 THEN 1 WHEN j4 = 2 THEN -1 ELSE 0 END)
              AS BIGINT) AS c4,
         CAST(SUM(CASE WHEN j4 = 1 THEN 1 WHEN j4 = 3 THEN -1 ELSE 0 END)
              AS BIGINT) AS s4,
         CAST(SUM(CASE WHEN j2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS c2
  FROM e GROUP BY event_type)
SELECT event_type, n_events, c4, s4,
       CAST(c4 * c4 + s4 * s4 AS BIGINT) AS power4,
       c2, CAST(c2 * c2 AS BIGINT) AS power2
FROM g ORDER BY event_type
"""


_MH_A = np.array([3, 7, 11, 13, 17, 19, 23, 29], np.int64)
_MH_B = np.array([101, 211, 307, 401, 503, 601, 701, 809], np.int64)
_MH_P = 2_147_483_647
