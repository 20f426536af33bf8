"""Query-registry family module 9/9 (dominant family: docs_events; split from the monolithic queries.py)."""

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
from ._q01_events_orders import _synth_link_edges
from ._q08_docs_orders import (
    _MH_A,
    _MH_B,
    _MH_P,
)



def _minhash8_block(t: pa.Table) -> pa.Table:
    """Per-doc EXACT 8-permutation MinHash signature over distinct
    whitespace tokens: h_i(w) = (aᵢ·hw + bᵢ) mod p with hw the 32-bit
    md5-prefix token hash both engines compute — every product stays
    < 2⁴⁰ so the arithmetic is identical int64 on both sides."""
    import hashlib

    cache: dict[str, int] = {}
    ids, sigs = [], []
    for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = set(s.strip().split())
        if not toks:
            continue
        hw = np.empty(len(toks), np.int64)
        for k, w in enumerate(toks):
            h = cache.get(w)
            if h is None:
                h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:8], 16)
                cache[w] = h
            hw[k] = h
        ids.append(i)
        sigs.append(((_MH_A[:, None] * hw[None, :] + _MH_B[:, None]) % _MH_P).min(axis=1))
    mat = np.stack(sigs) if sigs else np.empty((0, 8), np.int64)
    cols = {"doc_id": pa.array(ids, pa.int64())}
    for j in range(8):
        cols[f"m{j}"] = pa.array(mat[:, j], pa.int64())
    return pa.table(cols)


_MINHASH_SIG_SQL_CORE = """
tok AS (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''),
h AS (SELECT doc_id,
             CAST(('0x' || substr(md5(w), 1, 8)) AS UBIGINT) AS hw
      FROM tok),
sig AS (
  SELECT doc_id,
         CAST(MIN((3*hw + 101) % 2147483647) AS BIGINT) AS m0,
         CAST(MIN((7*hw + 211) % 2147483647) AS BIGINT) AS m1,
         CAST(MIN((11*hw + 307) % 2147483647) AS BIGINT) AS m2,
         CAST(MIN((13*hw + 401) % 2147483647) AS BIGINT) AS m3,
         CAST(MIN((17*hw + 503) % 2147483647) AS BIGINT) AS m4,
         CAST(MIN((19*hw + 601) % 2147483647) AS BIGINT) AS m5,
         CAST(MIN((23*hw + 701) % 2147483647) AS BIGINT) AS m6,
         CAST(MIN((29*hw + 809) % 2147483647) AS BIGINT) AS m7
  FROM h GROUP BY doc_id)
"""


def docs_minhash_exact_signatures(sf_dir: str):
    """The minhash family's FULL-SIGNATURE exact oracle (the planted-pair
    ops prove recall on constructed twins; this proves every signature
    value): 8 universal-hash permutations over md5-prefix token hashes,
    reproduced value-for-value by DuckDB.  Per-block token-hash cache
    (Zipfian vocab), one numpy min-fold per doc; signatures are what ride
    any LSH band shuffle — text never would."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(_minhash8_block, batch_format="pyarrow").sort("doc_id")


DOCS_MINHASH_EXACT_SIGNATURES_SQL = (
    "WITH " + _MINHASH_SIG_SQL_CORE + "SELECT * FROM sig ORDER BY doc_id"
)


def docs_minhash_band_collision_census(sf_dir: str):
    """LSH band-bucket size census over the exact signatures: 4 bands × 2
    rows (the b·r layout a real near-dup pass would shuffle on), bucket
    sizes histogrammed per band — the skew diagnostic that predicts both
    candidate-pair volume (Σ C(size,2)) and the degenerate-bucket caps the
    neardup stages log.  Bands ride a (band, k1, k2) groupby — signatures
    only; the final histogram fold is a tiny driver pass over the bucket
    table (O(buckets), census scale)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def bands(t: pa.Table) -> pa.Table:
        s = _minhash8_block(t)
        n = s.num_rows
        parts = []
        for band in range(4):
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(n, band, np.int64)),
                        "k1": s[f"m{2 * band}"],
                        "k2": s[f"m{2 * band + 1}"],
                    }
                )
            )
        return pa.concat_tables(parts)

    buckets = (
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby(["band", "k1", "k2"])
        .aggregate(Count(alias_name="bucket_size"))
        .to_pandas()
    )
    hist = (
        pa.table(
            {
                "band": pa.array(buckets["band"].to_numpy(np.int64)),
                "bucket_size": pa.array(
                    buckets["bucket_size"].to_numpy(np.int64)
                ),
                "one": pa.array(np.ones(len(buckets), np.int64)),
            }
        )
        .group_by(["band", "bucket_size"])
        .aggregate([("one", "count"), ("bucket_size", "sum")])
        .rename_columns(["band", "bucket_size", "n_buckets", "n_docs"])
    )
    return hist.sort_by([("band", "ascending"), ("bucket_size", "ascending")])


DOCS_MINHASH_BAND_COLLISION_CENSUS_SQL = (
    "WITH "
    + _MINHASH_SIG_SQL_CORE
    + """,
b AS (
  SELECT 0 AS band, m0 AS k1, m1 AS k2 FROM sig
  UNION ALL SELECT 1, m2, m3 FROM sig
  UNION ALL SELECT 2, m4, m5 FROM sig
  UNION ALL SELECT 3, m6, m7 FROM sig),
bu AS (SELECT band, k1, k2, CAST(COUNT(*) AS BIGINT) AS bucket_size
       FROM b GROUP BY band, k1, k2)
SELECT CAST(band AS BIGINT) AS band, bucket_size,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(bucket_size) AS BIGINT) AS n_docs
FROM bu GROUP BY band, bucket_size ORDER BY band, bucket_size
"""
)


def supplier_customer_balance_decile_shift(sf_dir: str):
    """Decile SHIFT FUNCTION between the supplier and customer account
    balance distributions: exact discrete deciles of both (integer cents,
    the histogram-refine quantile machinery — no global sort), differenced
    per decile — the distribution-free 'where do the populations differ'
    readout the KS test can't localize.  Two tiny O(nbins) driver folds."""
    from ...stages.quantiles import exact_quantiles

    qs = [round(0.1 * d, 1) for d in range(1, 10)]

    def cents_ds(table: str, col: str):
        ds = rd.read_parquet(_t(sf_dir, table), columns=[col])
        return ds.map_batches(
            lambda t: pa.table({"cents": _cents(t[col])}),
            batch_format="pyarrow",
        )

    cq = exact_quantiles(cents_ds("customer", "c_acctbal"), "cents", qs)
    sq = exact_quantiles(cents_ds("supplier", "s_acctbal"), "cents", qs)
    c = cq["value"].to_numpy().astype(np.int64)
    s = sq["value"].to_numpy().astype(np.int64)
    return pa.table(
        {
            "decile": pa.array(np.arange(1, 10, dtype=np.int64)),
            "customer_cents": pa.array(c),
            "supplier_cents": pa.array(s),
            "shift_cents": pa.array(s - c),
        }
    )


SUPPLIER_CUSTOMER_BALANCE_DECILE_SHIFT_SQL = """
WITH cq AS (
  SELECT quantile_disc(CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT),
                       [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS l
  FROM customer),
sq AS (
  SELECT quantile_disc(CAST(FLOOR(s_acctbal*100 + 0.5) AS BIGINT),
                       [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS l
  FROM supplier),
e AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS decile,
             CAST(unnest(l) AS BIGINT) AS customer_cents FROM cq),
f AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS decile,
             CAST(unnest(l) AS BIGINT) AS supplier_cents FROM sq)
SELECT e.decile AS decile, customer_cents, supplier_cents,
       CAST(supplier_cents - customer_cents AS BIGINT) AS shift_cents
FROM e JOIN f ON e.decile = f.decile ORDER BY decile
"""


def events_microbatch_replay(sf_dir: str):
    """Micro-batch INCREMENTAL-INGEST replay proof: the stream is cut into
    calendar-month batches, folded IN ORDER into a running per-type state
    (count, cents), and an order-SENSITIVE replay checksum Σ_b b·cum_b is
    emitted — so the oracle certifies not just that incremental == batch
    on the final totals, but that the engine's merge sequence walked the
    same batch order.  One distributed (type, month) partial pass; the
    replay fold is a driver walk over the tiny batch table (O(types ×
    months)) — exactly the state a resumable streaming ingester keeps."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_type", "ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "event_type": t["event_type"],
                "m": pc.strftime(t["ts"], format="%Y-%m"),
                "c": pa.array(np.ones(t.num_rows, np.int64)),
                "s": _cents(t["value"]),
            }
        )
        g = tb.group_by(["event_type", "m"]).aggregate(
            [("c", "sum"), ("s", "sum")]
        )
        return g.rename_columns(["event_type", "m", "c", "s"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "m"])
        .aggregate(Sum("c", alias_name="c"), Sum("s", alias_name="s"))
        .to_pandas()
        .sort_values(["event_type", "m"], kind="mergesort")
    )
    types, nb, fc, fs, chk = [], [], [], [], []
    for et, grp in agg.groupby("event_type", sort=True):
        cum = cents = checksum = b = 0
        for c, s in zip(grp["c"], grp["s"]):
            b += 1
            cum += int(c)
            cents += int(s)
            checksum += b * cum
        types.append(et)
        nb.append(b)
        fc.append(cum)
        fs.append(cents)
        chk.append(checksum)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_batches": pa.array(nb, pa.int64()),
            "final_count": pa.array(fc, pa.int64()),
            "final_cents": pa.array(fs, pa.int64()),
            "replay_checksum": pa.array(chk, pa.int64()),
        }
    )


EVENTS_MICROBATCH_REPLAY_SQL = """
WITH e AS (
  SELECT event_type, strftime(ts, '%Y-%m') AS m,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1, 2),
r AS (
  SELECT event_type, c, s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m) AS b,
         SUM(c) OVER (PARTITION BY event_type ORDER BY m
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cumc
  FROM e)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_batches,
       CAST(SUM(c) AS BIGINT) AS final_count,
       CAST(SUM(s) AS BIGINT) AS final_cents,
       CAST(SUM(b * cumc) AS BIGINT) AS replay_checksum
FROM r GROUP BY event_type ORDER BY event_type
"""


def embeddings_mmr_topk(sf_dir: str):
    """Maximal-Marginal-Relevance selection (Carbonell–Goldstein SIGIR'98)
    with EXACT integer arithmetic: query = vector 0, relevance = −d² and
    diversity = min d² to the already-selected set, both on the int8
    quantized grid (scale-128 family) so λ=½ doubles away the fraction:
    2·mmr = min_sel d² − d²(q,·).  Greedy k=3; each step is ONE
    distributed scoring pass (per-block argmax partials, driver picks the
    global winner — the selected set rides the closure, O(k·d)).  Ties
    break to the lowest vec_id in both engines."""
    from ...stages.cluster import _vecs

    ds = rd.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )

    def q8(vecs: np.ndarray) -> np.ndarray:
        mx = np.abs(vecs).max(axis=1)
        safe = np.where(mx == 0.0, 1.0, mx)
        return np.floor(vecs * 127.0 / safe[:, None] + 0.5).astype(np.int64)

    def fetch(vid: int) -> np.ndarray:
        def pick(t: pa.Table) -> pa.Table:
            m = pc.equal(t["vec_id"], vid)
            return t.filter(m)

        row = ds.map_batches(pick, batch_format="pyarrow").take_all()
        return q8(np.asarray([row[0]["embedding"]], np.float64))[0]

    qq = fetch(0)
    selected: list[tuple[int, np.ndarray]] = []
    out = []
    for rank in range(1, 4):
        sel_ids = [i for i, _ in selected]
        sel_mat = np.stack([v for _, v in selected]) if selected else None

        def score(t: pa.Table, _ids=tuple(sel_ids), _mat=sel_mat) -> pa.Table:
            empty = pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "d2q": pa.array([], pa.int64()),
                    "mind": pa.array([], pa.int64()),
                    "mmr2": pa.array([], pa.int64()),
                }
            )
            if t.num_rows == 0:
                return empty
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            q = q8(_vecs(t, "embedding"))
            keep = ids != 0
            for i in _ids:
                keep &= ids != i
            if not keep.any():
                return empty
            ids, q = ids[keep], q[keep]
            d2q = ((q - qq[None, :]) ** 2).sum(axis=1)
            if _mat is None:
                mind = np.zeros(len(ids), np.int64)
                mmr2 = -d2q
            else:
                dd = ((q[:, None, :] - _mat[None, :, :]) ** 2).sum(axis=2)
                mind = dd.min(axis=1)
                mmr2 = mind - d2q
            best = np.lexsort((ids, -mmr2))[0]
            return pa.table(
                {
                    "vec_id": pa.array([ids[best]], pa.int64()),
                    "d2q": pa.array([d2q[best]], pa.int64()),
                    "mind": pa.array([mind[best]], pa.int64()),
                    "mmr2": pa.array([mmr2[best]], pa.int64()),
                }
            )

        parts = ds.map_batches(score, batch_format="pyarrow").take_all()
        win = min(parts, key=lambda r: (-r["mmr2"], r["vec_id"]))
        out.append((rank, win["vec_id"], win["d2q"], win["mind"], win["mmr2"]))
        selected.append((int(win["vec_id"]), fetch(int(win["vec_id"]))))
    return pa.table(
        {
            "rank": pa.array([r for r, *_ in out], pa.int64()),
            "vec_id": pa.array([v for _, v, *_ in out], pa.int64()),
            "d2_query": pa.array([d for _, _, d, *_ in out], pa.int64()),
            "mindsel_d2": pa.array([m for *_, m, _ in out], pa.int64()),
            "mmr2": pa.array([s for *_, s in out], pa.int64()),
        }
    )


EMBEDDINGS_MMR_TOPK_SQL = """
WITH ex AS (
  SELECT vec_id, unnest(embedding) AS v,
         unnest(range(len(embedding))) AS dim,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
             AS mx
  FROM embeddings),
q8 AS (
  SELECT vec_id, CAST(dim AS BIGINT) AS dim,
         CAST(FLOOR(CAST(v AS DOUBLE) * 127.0
                    / (CASE WHEN mx = 0 THEN 1.0 ELSE mx END) + 0.5)
              AS BIGINT) AS q
  FROM ex),
qq AS (SELECT dim, q FROM q8 WHERE vec_id = 0),
dq AS (SELECT a.vec_id, CAST(SUM((a.q - qq.q) * (a.q - qq.q)) AS BIGINT)
           AS d2q
       FROM q8 a JOIN qq USING (dim) WHERE a.vec_id <> 0
       GROUP BY a.vec_id),
s1 AS (SELECT vec_id, d2q FROM dq ORDER BY d2q ASC, vec_id ASC LIMIT 1),
d1 AS (SELECT a.vec_id, CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT)
           AS d2s1
       FROM q8 a JOIN q8 b USING (dim)
       WHERE b.vec_id = (SELECT vec_id FROM s1) AND a.vec_id <> 0
       GROUP BY a.vec_id),
c2 AS (SELECT dq.vec_id, dq.d2q, d1.d2s1 AS mind
       FROM dq JOIN d1 ON dq.vec_id = d1.vec_id
       WHERE dq.vec_id <> (SELECT vec_id FROM s1)),
s2 AS (SELECT vec_id, d2q, mind FROM c2
       ORDER BY (mind - d2q) DESC, vec_id ASC LIMIT 1),
dt AS (SELECT a.vec_id, CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT)
           AS d2s2
       FROM q8 a JOIN q8 b USING (dim)
       WHERE b.vec_id = (SELECT vec_id FROM s2) AND a.vec_id <> 0
       GROUP BY a.vec_id),
c3 AS (SELECT dq.vec_id, dq.d2q, LEAST(d1.d2s1, dt.d2s2) AS mind
       FROM dq JOIN d1 ON dq.vec_id = d1.vec_id
            JOIN dt ON dq.vec_id = dt.vec_id
       WHERE dq.vec_id <> (SELECT vec_id FROM s1)
         AND dq.vec_id <> (SELECT vec_id FROM s2)),
s3 AS (SELECT vec_id, d2q, mind FROM c3
       ORDER BY (mind - d2q) DESC, vec_id ASC LIMIT 1)
SELECT CAST(1 AS BIGINT) AS rank, vec_id, d2q AS d2_query,
       CAST(0 AS BIGINT) AS mindsel_d2, CAST(-d2q AS BIGINT) AS mmr2
FROM s1
UNION ALL
SELECT 2, vec_id, d2q, mind, CAST(mind - d2q AS BIGINT) FROM s2
UNION ALL
SELECT 3, vec_id, d2q, mind, CAST(mind - d2q AS BIGINT) FROM s3
ORDER BY rank
"""


_AC_PATTERNS = [
    "join",
    "hash join",
    "batch batch",
    "table scan",
    "sort",
    "sort merge",
]


def docs_multi_pattern_census(sf_dir: str):
    """Multi-pattern corpus scan through a REAL Aho–Corasick automaton
    (functions/ahocorasick.py): six phrase patterns — including a
    suffix-nested pair ("join" / "hash join") that exercises the output
    links, and a self-overlapping one ("batch batch") — matched in ONE
    linear pass per document, counted with greedy leftmost
    non-overlapping semantics so DuckDB's replace()-arithmetic
    reconstructs every count.  The automaton builds once per block
    (tiny); at scale this is the blocklist/phrase-filter stage scanning
    each page exactly once regardless of pattern count."""
    from ...functions.ahocorasick import AhoCorasick

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    pats = list(_AC_PATTERNS)

    def census(t: pa.Table) -> pa.Table:
        ac = AhoCorasick(pats)
        ids, names, counts = [], [], []
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for p, c in zip(pats, ac.count_nonoverlapping(s)):
                ids.append(i)
                names.append(p)
                counts.append(c)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pattern": pa.array(names, pa.string()),
                "n_matches": pa.array(counts, pa.int64()),
            }
        )

    return (
        ds.map_batches(census, batch_format="pyarrow")
        .sort(["doc_id", "pattern"])
    )


DOCS_MULTI_PATTERN_CENSUS_SQL = """
WITH p AS (
  SELECT unnest(['join', 'hash join', 'batch batch', 'table scan',
                 'sort', 'sort merge']) AS pattern),
m AS (
  SELECT d.doc_id, p.pattern,
         CAST((strlen(d.text) - strlen(replace(d.text, p.pattern, '')))
              // strlen(p.pattern) AS BIGINT) AS n_matches
  FROM documents d CROSS JOIN p)
SELECT doc_id, pattern, n_matches
FROM m ORDER BY doc_id, pattern
"""


def events_watermark_lateness_sweep(sf_dir: str):
    """Allowed-lateness SWEEP over the event-time watermark (the tuning
    curve a streaming job reads before fixing its window GC horizon):
    with the running-max watermark from the two-phase prefix scan, count
    late events and their total excess lateness at 5/15/30/60-minute
    thresholds — one scan, four thresholds folded per block."""
    from ...stages.scan import running_max

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts"])

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_id": t["event_id"], "t_us": t["ts"].cast(pa.int64())}
        )

    scanned = running_max(
        ds.map_batches(proj, batch_format="pyarrow"),
        order_col="event_id",
        value_col="t_us",
        out_col="wm_us",
    )
    mins = np.array([5, 15, 30, 60], np.int64)

    def partial(t: pa.Table) -> pa.Table:
        tt = t["t_us"].to_numpy(zero_copy_only=False)
        wm = t["wm_us"].to_numpy(zero_copy_only=False)
        lag = wm - tt
        rows = {"threshold_min": pa.array(mins)}
        n_late = np.empty(4, np.int64)
        excess = np.empty(4, np.int64)
        for k, m in enumerate(mins):
            lim = int(m) * 60_000_000
            late = lag > lim
            n_late[k] = int(late.sum())
            excess[k] = int((lag[late] - lim).sum())
        rows["n_late"] = pa.array(n_late)
        rows["excess_us"] = pa.array(excess)
        return pa.table(rows)

    return (
        scanned.map_batches(partial, batch_format="pyarrow")
        .groupby("threshold_min")
        .aggregate(
            Sum("n_late", alias_name="n_late"),
            Sum("excess_us", alias_name="excess_us"),
        )
        .sort("threshold_min")
    )


EVENTS_WATERMARK_LATENESS_SWEEP_SQL = """
WITH s AS (
  SELECT epoch_us(ts) AS t,
         MAX(epoch_us(ts)) OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS wm
  FROM events),
th AS (SELECT CAST(unnest([5, 15, 30, 60]) AS BIGINT) AS threshold_min)
SELECT threshold_min,
       CAST(SUM(CASE WHEN wm - t > threshold_min * 60000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN wm - t > threshold_min * 60000000
                THEN wm - t - threshold_min * 60000000
                ELSE 0 END) AS BIGINT) AS excess_us
FROM s CROSS JOIN th
GROUP BY threshold_min ORDER BY threshold_min
"""


def docs_hits_scores(sf_dir: str):
    """Kleinberg HITS hubs/authorities (stages/pagerank.py:hits) over the
    deterministic synthetic link graph — two synchronous rounds in exact
    unnormalized int64 (a = Aᵀh, h = A·a), so the second iterative
    graph-centrality algorithm also gets a value-exact SQL oracle (the
    oracle unrolls the same four propagations as chained join-aggregates).
    Edges stay distributed; driver state is the O(N) score pair."""
    from ...stages.pagerank import hits

    edges, n = _synth_link_edges(sf_dir)
    return hits(edges.materialize(), n, rounds=2)


DOCS_HITS_SCORES_SQL = """
WITH nodes AS (SELECT doc_id AS node FROM documents),
edges_raw AS (
  SELECT doc_id AS src,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                    CAST(j.j AS VARCHAR)), 1, 8)) AS UBIGINT)
              % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
  FROM documents, LATERAL unnest(generate_series(0, 2)) AS j(j)),
edges AS (SELECT DISTINCT src, dst FROM edges_raw WHERE dst <> src),
a1 AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS a
       FROM edges GROUP BY 1),
h1 AS (SELECT e.src AS node, CAST(SUM(a1.a) AS BIGINT) AS h
       FROM edges e JOIN a1 ON e.dst = a1.node GROUP BY 1),
a2 AS (SELECT e.dst AS node, CAST(SUM(h1.h) AS BIGINT) AS a
       FROM edges e JOIN h1 ON e.src = h1.node GROUP BY 1),
h2 AS (SELECT e.src AS node, CAST(SUM(a2.a) AS BIGINT) AS h
       FROM edges e JOIN a2 ON e.dst = a2.node GROUP BY 1)
SELECT n.node, COALESCE(a2.a, 0) AS auth, COALESCE(h2.h, 0) AS hub
FROM nodes n
LEFT JOIN a2 ON n.node = a2.node
LEFT JOIN h2 ON n.node = h2.node
ORDER BY n.node
"""


def events_user_dbscan_1d(sf_dir: str):
    """1-D temporal DBSCAN per user (ε = 10 min, minPts = 3, self
    included): an event is CORE when ≥ 3 events of the same user fall in
    [t−ε, t+ε]; clusters are maximal chains of core events whose
    consecutive gaps are ≤ ε — the density-based burst detector (Ester et
    al. KDD'96 restricted to the time axis, where the ε-neighborhood is
    an interval and the whole algorithm is exact integer arithmetic).
    Co-partition by user; neighbor counts are two searchsorted probes per
    group, the chain walk one vectorized diff — no Python loop over
    events."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    eps = 600_000_000  # 10 min in µs

    def per_user(g: pa.Table) -> pa.Table:
        uid = int(g["user_id"][0].as_py())
        t = np.sort(g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        n = len(t)
        cnt = np.searchsorted(t, t + eps, side="right") - np.searchsorted(
            t, t - eps, side="left"
        )
        core = t[cnt >= 3]
        if len(core) == 0:
            ncl = 0
            mx = 0
        else:
            brk = np.diff(core) > eps
            ncl = 1 + int(brk.sum())
            sizes = np.diff(
                np.r_[0, np.flatnonzero(brk) + 1, len(core)]
            )
            mx = int(sizes.max())
        return pa.table(
            {
                "user_id": pa.array([uid], pa.int64()),
                "n_events": pa.array([n], pa.int64()),
                "n_core": pa.array([len(core)], pa.int64()),
                "n_clusters": pa.array([ncl], pa.int64()),
                "max_cluster_core": pa.array([mx], pa.int64()),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .sort("user_id")
    )


EVENTS_USER_DBSCAN_1D_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 600000000 PRECEDING
                                  AND 600000000 FOLLOWING) AS cnt
  FROM events),
c AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                   > 600000000 OR LAG(t) OVER (PARTITION BY user_id
                                               ORDER BY t) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM e WHERE cnt >= 3),
i AS (
  SELECT user_id, t,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS island
  FROM c),
s AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS sz
      FROM i GROUP BY user_id, island),
core AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_clusters,
                CAST(MAX(sz) AS BIGINT) AS max_cluster_core,
                CAST(SUM(sz) AS BIGINT) AS n_core
         FROM s GROUP BY user_id),
base AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
         FROM events GROUP BY user_id)
SELECT b.user_id, b.n_events,
       COALESCE(core.n_core, 0) AS n_core,
       COALESCE(core.n_clusters, 0) AS n_clusters,
       COALESCE(core.max_cluster_core, 0) AS max_cluster_core
FROM base b LEFT JOIN core ON b.user_id = core.user_id
ORDER BY b.user_id
"""


def media_wav_window_energy_oracle(sf_dir: str):
    """Windowed audio ENERGY through the real WAV container: the same
    deterministic 64-sample int16 tone as the sample-sum oracle, encoded
    and re-parsed via functions/wav.py, then reduced to per-16-sample
    windows of Σv² and max|v| — the frame-energy features a VAD /
    loudness gate computes, with every value an exact integer the SQL
    closed form reproduces.  Extends the multimodal family's
    value-oracle coverage from whole-payload sums to windowed features."""
    from ...functions.wav import decode_wav, encode_wav

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    k = np.arange(64, dtype=np.int64)

    def work(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        rows_id, rows_w, rows_e, rows_p = [], [], [], []
        for i in ids:
            s = (((7 * int(i) + 13 * k) % 65536) - 32768).astype(np.int16)
            back, rate = decode_wav(encode_wav(s, 8000))
            back = back.reshape(-1)
            if rate != 8000 or not np.array_equal(back, s):
                raise ValueError("WAV round-trip mismatch")
            v = back.astype(np.int64).reshape(4, 16)
            rows_id.extend([int(i)] * 4)
            rows_w.extend(range(4))
            rows_e.extend((v * v).sum(axis=1).tolist())
            rows_p.extend(np.abs(v).max(axis=1).tolist())
        return pa.table(
            {
                "doc_id": pa.array(rows_id, pa.int64()),
                "win": pa.array(rows_w, pa.int64()),
                "energy": pa.array(rows_e, pa.int64()),
                "peak": pa.array(rows_p, pa.int64()),
            }
        )

    return ds.map_batches(work, batch_format="pyarrow").sort(
        ["doc_id", "win"]
    )


MEDIA_WAV_WINDOW_ENERGY_ORACLE_SQL = """
WITH ks AS (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS k),
s AS (SELECT d.doc_id, ks.k // 16 AS win,
             (7 * d.doc_id + 13 * ks.k) % 65536 - 32768 AS v
      FROM documents d, ks)
SELECT doc_id, CAST(win AS BIGINT) AS win,
       CAST(SUM(v * v) AS BIGINT) AS energy,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak
FROM s GROUP BY doc_id, win ORDER BY doc_id, win
"""


def orders_lineitem_join_size_estimate_audit(sf_dir: str):
    """Join-cardinality ESTIMATION audit (the planner statistic every
    distributed engine sizes shuffles with): for the non-key date join
    orders.o_orderdate ⋈ lineitem.l_shipdate, compare the textbook
    containment estimate |R|·|S| / max(ndv_R, ndv_S) — one fixed IEEE
    expression — against the EXACT join size Σ_d c_R(d)·c_S(d).  Per-day
    count partials per side (O(days) driver fold), never the join
    itself."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderdate"])
    lineitem = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_shipdate"])

    def day_counts(ds, col):
        def partial(t: pa.Table) -> pa.Table:
            tb = pa.table(
                {
                    "d": pc.strftime(t[col], format="%Y-%m-%d"),
                    "c": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            return (
                tb.group_by("d").aggregate([("c", "sum")]).rename_columns(["d", "c"])
            )

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("d")
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )

    r = day_counts(orders, "o_orderdate")
    s = day_counts(lineitem, "l_shipdate")
    n_r = int(r["c"].sum())
    n_s = int(s["c"].sum())
    ndv_r = len(r)
    ndv_s = len(s)
    joined = r.merge(s, on="d", how="inner", suffixes=("_r", "_s"))
    actual = int((joined["c_r"].to_numpy(np.int64) * joined["c_s"].to_numpy(np.int64)).sum())
    est = float(n_r) * float(n_s) / float(max(ndv_r, ndv_s))
    return pa.table(
        {
            "n_r": pa.array([n_r], pa.int64()),
            "n_s": pa.array([n_s], pa.int64()),
            "ndv_r": pa.array([ndv_r], pa.int64()),
            "ndv_s": pa.array([ndv_s], pa.int64()),
            "est_rows": pa.array([est], pa.float64()),
            "actual_rows": pa.array([actual], pa.int64()),
        }
    )


ORDERS_LINEITEM_JOIN_SIZE_ESTIMATE_AUDIT_SQL = """
WITH r AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM orders GROUP BY 1),
s AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1),
t AS (SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_r,
             CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_s,
             CAST((SELECT COUNT(*) FROM r) AS BIGINT) AS ndv_r,
             CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS ndv_s,
             CAST((SELECT COALESCE(SUM(r.c * s.c), 0)
                   FROM r JOIN s USING (d)) AS BIGINT) AS actual_rows)
SELECT n_r, n_s, ndv_r, ndv_s,
       CAST(n_r AS DOUBLE) * CAST(n_s AS DOUBLE)
           / CAST(GREATEST(ndv_r, ndv_s) AS DOUBLE) AS est_rows,
       actual_rows
FROM t
"""


def embeddings_power_iteration_fx(sf_dir: str):
    """Dominant eigendirection of the corpus second-moment matrix by
    POWER ITERATION in exact integer fixed-point (the iterative
    linear-algebra member next to PageRank/HITS): the Gram matrix
    accumulates distributed as per-block int64 ``fixedᵀ@fixed`` partials
    (milli-scaled, same grid as embeddings_gram_matrix), then three
    driver rounds of w = G·v renormalized by the truncating rescale
    v ← sign(w)·(|w|·1000 ÷ max|w|) — written sign-abs on BOTH sides so
    Python floor-division and DuckDB's truncation agree on negatives.
    Driver state O(d²); the oracle unrolls the same three rounds."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        if t.num_rows == 0:
            return pa.table(
                {
                    "i": pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "g": pa.array([], pa.int64()),
                }
            )
        fixed = np.floor(_vecs(t, "embedding") * 1000.0 + 0.5).astype(np.int64)
        gram = fixed.T @ fixed
        d = gram.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        return pa.table(
            {
                "i": pa.array(ii.ravel().astype(np.int64)),
                "j": pa.array(jj.ravel().astype(np.int64)),
                "g": pa.array(gram.ravel()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("g", alias_name="g"))
        .to_pandas()
    )
    d = int(agg["i"].max()) + 1
    G = np.zeros((d, d), np.int64)
    G[agg["i"].to_numpy(np.int64), agg["j"].to_numpy(np.int64)] = agg[
        "g"
    ].to_numpy(np.int64)
    v = np.full(d, 1000, np.int64)
    for _ in range(3):
        w = G @ v
        m = int(np.abs(w).max())
        v = np.sign(w) * ((np.abs(w) * 1000) // m)
    return pa.table(
        {
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "v_fx": pa.array(v.astype(np.int64)),
        }
    )


EMBEDDINGS_POWER_ITERATION_FX_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
              AS BIGINT) AS fx
  FROM embeddings),
g AS (SELECT a.dim AS i, b.dim AS j,
             CAST(SUM(a.fx * b.fx) AS BIGINT) AS g
      FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
v0 AS (SELECT DISTINCT i AS dim, CAST(1000 AS BIGINT) AS v FROM g),
w1 AS (SELECT g.i AS dim, CAST(SUM(g.g * v.v) AS BIGINT) AS w
       FROM g JOIN v0 v ON g.j = v.dim GROUP BY 1),
v1 AS (SELECT dim,
              CAST(CASE WHEN w >= 0 THEN (w * 1000) // (SELECT MAX(ABS(w)) FROM w1)
                   ELSE -(((-w) * 1000) // (SELECT MAX(ABS(w)) FROM w1))
                   END AS BIGINT) AS v
       FROM w1),
w2 AS (SELECT g.i AS dim, CAST(SUM(g.g * v.v) AS BIGINT) AS w
       FROM g JOIN v1 v ON g.j = v.dim GROUP BY 1),
v2 AS (SELECT dim,
              CAST(CASE WHEN w >= 0 THEN (w * 1000) // (SELECT MAX(ABS(w)) FROM w2)
                   ELSE -(((-w) * 1000) // (SELECT MAX(ABS(w)) FROM w2))
                   END AS BIGINT) AS v
       FROM w2),
w3 AS (SELECT g.i AS dim, CAST(SUM(g.g * v.v) AS BIGINT) AS w
       FROM g JOIN v2 v ON g.j = v.dim GROUP BY 1),
v3 AS (SELECT dim,
              CAST(CASE WHEN w >= 0 THEN (w * 1000) // (SELECT MAX(ABS(w)) FROM w3)
                   ELSE -(((-w) * 1000) // (SELECT MAX(ABS(w)) FROM w3))
                   END AS BIGINT) AS v
       FROM w3)
SELECT dim, v AS v_fx FROM v3 ORDER BY dim
"""


def orders_histogram_selectivity_audit(sf_dir: str):
    """Equi-width HISTOGRAM selectivity audit (the planner's other core
    statistic, next to the join-size estimate): 16 integer-width buckets
    over price cents, probed by 8 half-bucket-shifted one-bucket-wide
    ranges; per (probe, overlapped bucket) the uniform-assumption
    estimate cnt·overlap·1000 ÷ width (exact integer milli-rows) sits
    beside the TRUE count in the overlap — the interpolation error a
    cost model eats on skewed data.  Two vectorized passes (bucket
    counts, probe∩bucket counts); probe table is O(1) driver state."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def cents_tab(t: pa.Table) -> pa.Table:
        return pa.table({"c": _cents(t["o_totalprice"])})

    cds = ds.map_batches(cents_tab, batch_format="pyarrow")
    mm = cds.aggregate(Min("c"), Max("c"))
    lo, hi = int(mm["min(c)"]), int(mm["max(c)"])
    width = (hi - lo) // 16 + 1
    probes = [(lo + p * width + width // 2, lo + p * width + width // 2 + width) for p in range(8)]

    def partial(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        b = (c - lo) // width
        rows = {"bucket": [], "probe": [], "bcnt": [], "pcnt": []}
        for k in range(16):
            rows["bucket"].append(k)
            rows["probe"].append(-1)
            rows["bcnt"].append(int((b == k).sum()))
            rows["pcnt"].append(0)
        for p, (plo, phi) in enumerate(probes):
            for k in range(16):
                olo = max(plo, lo + k * width)
                ohi = min(phi, lo + (k + 1) * width)
                if ohi <= olo:
                    continue
                rows["bucket"].append(k)
                rows["probe"].append(p)
                rows["bcnt"].append(0)
                rows["pcnt"].append(int(((c >= olo) & (c < ohi)).sum()))
        return pa.table(
            {
                "bucket": pa.array(rows["bucket"], pa.int64()),
                "probe": pa.array(rows["probe"], pa.int64()),
                "bcnt": pa.array(rows["bcnt"], pa.int64()),
                "pcnt": pa.array(rows["pcnt"], pa.int64()),
            }
        )

    agg = (
        cds.map_batches(partial, batch_format="pyarrow")
        .groupby(["bucket", "probe"])
        .aggregate(Sum("bcnt", alias_name="bcnt"), Sum("pcnt", alias_name="pcnt"))
        .to_pandas()
    )
    bcounts = {
        int(r["bucket"]): int(r["bcnt"])
        for _, r in agg[agg["probe"] == -1].iterrows()
    }
    out = {"probe": [], "bucket": [], "overlap_len": [], "bucket_count": [], "est_milli": [], "actual": []}
    for _, r in agg[agg["probe"] >= 0].sort_values(["probe", "bucket"]).iterrows():
        p, k = int(r["probe"]), int(r["bucket"])
        plo, phi = probes[p]
        olo = max(plo, lo + k * width)
        ohi = min(phi, lo + (k + 1) * width)
        cnt = bcounts.get(k, 0)
        out["probe"].append(p)
        out["bucket"].append(k)
        out["overlap_len"].append(ohi - olo)
        out["bucket_count"].append(cnt)
        out["est_milli"].append(cnt * (ohi - olo) * 1000 // width)
        out["actual"].append(int(r["pcnt"]))
    return pa.table({k: pa.array(vs, pa.int64()) for k, vs in out.items()})


ORDERS_HISTOGRAM_SELECTIVITY_AUDIT_SQL = """
WITH c AS (SELECT CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c
           FROM orders),
mm AS (SELECT MIN(c) AS lo, (MAX(c) - MIN(c)) // 16 + 1 AS w FROM c),
bc AS (SELECT (c.c - mm.lo) // mm.w AS bucket,
              CAST(COUNT(*) AS BIGINT) AS bucket_count
       FROM c, mm GROUP BY 1),
pr AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS probe),
pb AS (
  SELECT pr.probe, b.b AS bucket,
         GREATEST(mm.lo + pr.probe * mm.w + mm.w // 2,
                  mm.lo + b.b * mm.w) AS olo,
         LEAST(mm.lo + pr.probe * mm.w + mm.w // 2 + mm.w,
               mm.lo + (b.b + 1) * mm.w) AS ohi,
         mm.w AS w
  FROM pr, mm, (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS b) b
  WHERE LEAST(mm.lo + pr.probe * mm.w + mm.w // 2 + mm.w,
              mm.lo + (b.b + 1) * mm.w)
        > GREATEST(mm.lo + pr.probe * mm.w + mm.w // 2,
                   mm.lo + b.b * mm.w)),
act AS (SELECT pb.probe, pb.bucket, CAST(COUNT(c.c) AS BIGINT) AS actual
        FROM pb LEFT JOIN c ON c.c >= pb.olo AND c.c < pb.ohi
        GROUP BY 1, 2)
SELECT pb.probe, pb.bucket,
       CAST(pb.ohi - pb.olo AS BIGINT) AS overlap_len,
       COALESCE(bc.bucket_count, 0) AS bucket_count,
       CAST(COALESCE(bc.bucket_count, 0) * (pb.ohi - pb.olo) * 1000 // pb.w
            AS BIGINT) AS est_milli,
       act.actual
FROM pb
LEFT JOIN bc ON pb.bucket = bc.bucket
JOIN act ON pb.probe = act.probe AND pb.bucket = act.bucket
ORDER BY pb.probe, pb.bucket
"""


def events_type_pair_kmv_jaccard_audit(sf_dir: str):
    """KMV (k-minimum-values, k=64) set-similarity ESTIMATE vs exact
    truth for every audience pair: per type, the 64 smallest md5-prefix
    user hashes (block-local k-min combiners merge losslessly — the KMV
    merge law); per pair, the bottom-k of the union is intersected with
    both lists (membership against a k-min list is exact for union-k-min
    elements) giving the estimate, while the TRUE Jaccard comes from the
    join-free type-bitmask plan of the audience-overlap family.  Both
    sides exact integers + ppm floors, so the sketch's ERROR itself is
    oracle-checked — the accuracy audit every sketch deployment should
    ship with."""
    import hashlib

    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_type", "user_id"]
    )

    def dpart(t: pa.Table) -> pa.Table:
        return (
            pa.table(
                {"ty": t["event_type"], "u": pc.cast(t["user_id"], pa.int64())}
            )
            .group_by(["ty", "u"])
            .aggregate([])
        )

    d = (
        ds.map_batches(dpart, batch_format="pyarrow")
        .groupby(["ty", "u"])
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda t: t.select(["ty", "u"]), batch_format="pyarrow")
        .materialize()
    )
    types = sorted(
        r["ty"]
        for r in d.groupby("ty").aggregate(Count(alias_name="n")).to_pandas().to_dict("records")
    )
    if len(types) > 62:
        raise ValueError("type-bitmask plan shards beyond 62 types")
    ty_id = {t: i for i, t in enumerate(types)}

    K = 64

    def kmin_part(t: pa.Table) -> pa.Table:
        tys, hs = [], []
        tb = t.to_pydict()
        per: dict[str, list[int]] = {}
        for ty, u in zip(tb["ty"], tb["u"]):
            per.setdefault(ty, []).append(
                int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
            )
        for ty, lst in per.items():
            for h in sorted(set(lst))[:K]:
                tys.append(ty)
                hs.append(h)
        return pa.table(
            {"ty": pa.array(tys, pa.string()), "h": pa.array(hs, pa.int64())}
        )

    kparts = d.map_batches(kmin_part, batch_format="pyarrow").to_pandas()
    klists: dict[str, list[int]] = {}
    for ty, grp in kparts.groupby("ty"):
        klists[ty] = sorted(set(grp["h"].tolist()))[:K]

    masks_ds = (
        d.map_batches(
            lambda t: pa.table(
                {
                    "u": t["u"],
                    "bit": pa.array(
                        np.int64(1)
                        << np.array(
                            [ty_id[x] for x in t["ty"].to_pylist()], np.int64
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("u")
        .aggregate(Sum("bit", alias_name="mask"))
    )

    def pair_part(t: pa.Table) -> pa.Table:
        m = t["mask"].to_numpy(zero_copy_only=False)
        ia, ib, cnt = [], [], []
        for i in range(len(types)):
            ia.append(i)
            ib.append(-1)
            cnt.append(int(((m >> i) & 1).sum()))
            for j in range(i + 1, len(types)):
                ia.append(i)
                ib.append(j)
                cnt.append(int((((m >> i) & 1) & ((m >> j) & 1)).sum()))
        return pa.table(
            {
                "i": pa.array(ia, pa.int64()),
                "j": pa.array(ib, pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    agg = (
        masks_ds.map_batches(pair_part, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    sizes = {
        int(r["i"]): int(r["c"]) for _, r in agg[agg["j"] == -1].iterrows()
    }
    out = {
        "type_a": [], "type_b": [], "n_a": [], "n_b": [],
        "exact_inter": [], "exact_ppm": [],
        "kmv_denom": [], "kmv_inter": [], "kmv_ppm": [],
    }
    inter_map = {
        (int(r["i"]), int(r["j"])): int(r["c"])
        for _, r in agg[agg["j"] >= 0].iterrows()
    }
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            inter = inter_map.get((i, j), 0)
            na, nb = sizes[i], sizes[j]
            union = na + nb - inter
            la, lb = set(klists[types[i]]), set(klists[types[j]])
            merged = sorted(la | lb)[:K]
            denom = len(merged)
            kin = sum(1 for h in merged if h in la and h in lb)
            out["type_a"].append(types[i])
            out["type_b"].append(types[j])
            out["n_a"].append(na)
            out["n_b"].append(nb)
            out["exact_inter"].append(inter)
            out["exact_ppm"].append(inter * 1_000_000 // union)
            out["kmv_denom"].append(denom)
            out["kmv_inter"].append(kin)
            out["kmv_ppm"].append(kin * 1_000_000 // denom)
    return pa.table(
        {
            "type_a": pa.array(out["type_a"], pa.string()),
            "type_b": pa.array(out["type_b"], pa.string()),
            "n_a": pa.array(out["n_a"], pa.int64()),
            "n_b": pa.array(out["n_b"], pa.int64()),
            "exact_inter": pa.array(out["exact_inter"], pa.int64()),
            "exact_ppm": pa.array(out["exact_ppm"], pa.int64()),
            "kmv_denom": pa.array(out["kmv_denom"], pa.int64()),
            "kmv_inter": pa.array(out["kmv_inter"], pa.int64()),
            "kmv_ppm": pa.array(out["kmv_ppm"], pa.int64()),
        }
    )


EVENTS_TYPE_PAIR_KMV_JACCARD_AUDIT_SQL = """
WITH du AS (SELECT DISTINCT event_type AS ty, user_id AS u FROM events),
h AS (SELECT ty, u,
             CAST(('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 8)) AS UBIGINT)
                 AS hv
      FROM du),
r AS (SELECT ty, CAST(hv AS BIGINT) AS hv,
             ROW_NUMBER() OVER (PARTITION BY ty ORDER BY hv) AS rn
      FROM (SELECT DISTINCT ty, hv FROM h)),
kl AS (SELECT ty, hv FROM r WHERE rn <= 64),
tp AS (SELECT a.ty AS type_a, b.ty AS type_b
       FROM (SELECT DISTINCT ty FROM du) a
       JOIN (SELECT DISTINCT ty FROM du) b ON a.ty < b.ty),
sz AS (SELECT ty, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY ty),
ex AS (SELECT tp.type_a, tp.type_b, CAST(COUNT(*) AS BIGINT) AS inter
       FROM tp JOIN du x ON x.ty = tp.type_a
               JOIN du y ON y.ty = tp.type_b AND y.u = x.u
       GROUP BY 1, 2),
mg AS (SELECT tp.type_a, tp.type_b, kl.hv,
              ROW_NUMBER() OVER (PARTITION BY tp.type_a, tp.type_b
                                 ORDER BY kl.hv) AS rn
       FROM tp JOIN (SELECT DISTINCT ka.ty, ka.hv FROM kl ka) kl
            ON kl.ty IN (tp.type_a, tp.type_b)
       GROUP BY tp.type_a, tp.type_b, kl.hv),
mk AS (SELECT type_a, type_b, hv FROM mg WHERE rn <= 64),
kv AS (SELECT m.type_a, m.type_b,
              CAST(COUNT(*) AS BIGINT) AS denom,
              CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM kl a
                                         WHERE a.ty = m.type_a
                                           AND a.hv = m.hv)
                             AND EXISTS (SELECT 1 FROM kl b
                                         WHERE b.ty = m.type_b
                                           AND b.hv = m.hv)
                        THEN 1 ELSE 0 END) AS BIGINT) AS kin
       FROM mk m GROUP BY 1, 2)
SELECT tp.type_a, tp.type_b, sa.n AS n_a, sb.n AS n_b,
       COALESCE(ex.inter, 0) AS exact_inter,
       CAST(COALESCE(ex.inter, 0) * 1000000
            // (sa.n + sb.n - COALESCE(ex.inter, 0)) AS BIGINT) AS exact_ppm,
       kv.denom AS kmv_denom, kv.kin AS kmv_inter,
       CAST(kv.kin * 1000000 // kv.denom AS BIGINT) AS kmv_ppm
FROM tp
JOIN sz sa ON sa.ty = tp.type_a
JOIN sz sb ON sb.ty = tp.type_b
LEFT JOIN ex ON ex.type_a = tp.type_a AND ex.type_b = tp.type_b
JOIN kv ON kv.type_a = tp.type_a AND kv.type_b = tp.type_b
ORDER BY tp.type_a, tp.type_b
"""


def docs_minhash_pair_jaccard_audit(sf_dir: str):
    """MinHash ACCURACY audit at pair grain: consecutive doc pairs
    (2i, 2i+1) are co-grouped, the 8-permutation signature match count
    gives the estimate ppm (matches·10⁶ ÷ 8) and the true distinct-token
    Jaccard sits beside it — per-pair sketch error, exact on both sides
    (the set-side companion of the KMV audience audit).  Pairs co-locate
    by doc_id÷2 through one small groupby; signatures reuse the exact
    minhash kernel."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("pair_id", pc.divide(t["doc_id"], 2))

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "sig_matches": pa.array([], pa.int64()),
            "est_ppm": pa.array([], pa.int64()),
            "exact_inter": pa.array([], pa.int64()),
            "exact_union": pa.array([], pa.int64()),
            "exact_ppm": pa.array([], pa.int64()),
        }
    )

    def per_pair(g: pa.Table) -> pa.Table:
        if g.num_rows != 2:
            return empty
        g = g.sort_by("doc_id")
        ta = set(g["text"][0].as_py().strip().split())
        tb = set(g["text"][1].as_py().strip().split())
        if not ta or not tb:
            return empty
        sig = _minhash8_block(g)
        if sig.num_rows != 2:
            return empty
        matches = sum(
            int(sig[f"m{j}"][0].as_py() == sig[f"m{j}"][1].as_py())
            for j in range(8)
        )
        inter = len(ta & tb)
        union = len(ta | tb)
        return pa.table(
            {
                "doc_a": pa.array([int(g["doc_id"][0].as_py())], pa.int64()),
                "doc_b": pa.array([int(g["doc_id"][1].as_py())], pa.int64()),
                "sig_matches": pa.array([matches], pa.int64()),
                "est_ppm": pa.array([matches * 1_000_000 // 8], pa.int64()),
                "exact_inter": pa.array([inter], pa.int64()),
                "exact_union": pa.array([union], pa.int64()),
                "exact_ppm": pa.array([inter * 1_000_000 // union], pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("pair_id")
        .map_groups(per_pair, batch_format="pyarrow")
        .sort("doc_a")
    )


DOCS_MINHASH_PAIR_JACCARD_AUDIT_SQL = (
    "WITH "
    + _MINHASH_SIG_SQL_CORE
    + """,
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1),
iv AS (SELECT x.doc_id AS doc_a, CAST(COUNT(*) AS BIGINT) AS inter
       FROM tok x JOIN tok y ON y.doc_id = x.doc_id + 1 AND x.w = y.w
       WHERE x.doc_id % 2 = 0 GROUP BY 1),
pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST((CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END)
                 + (CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END)
                 + (CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END)
                 + (CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END)
                 + (CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END)
                 + (CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END)
                 + (CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END)
                 + (CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END) AS BIGINT)
                  AS sig_matches
       FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1
       WHERE a.doc_id % 2 = 0)
SELECT pr.doc_a, pr.doc_b, pr.sig_matches,
       CAST(pr.sig_matches * 1000000 // 8 AS BIGINT) AS est_ppm,
       COALESCE(iv.inter, 0) AS exact_inter,
       CAST(sa.n + sb.n - COALESCE(iv.inter, 0) AS BIGINT) AS exact_union,
       CAST(COALESCE(iv.inter, 0) * 1000000
            // (sa.n + sb.n - COALESCE(iv.inter, 0)) AS BIGINT) AS exact_ppm
FROM pr
JOIN sz sa ON sa.doc_id = pr.doc_a
JOIN sz sb ON sb.doc_id = pr.doc_b
LEFT JOIN iv ON iv.doc_a = pr.doc_a
ORDER BY pr.doc_a
"""
)


def events_funnel_exclusion_census(sf_dir: str):
    """Funnel with a NEGATIVE step (the temporal-logic shape plain funnels
    can't express): users whose first *signup* is followed by a later
    *purchase* with NO *error* strictly between the two — per-user
    evaluation in one co-partitioned Arrow kernel (min-over-masks, no
    Python loop over events), folded to the four funnel counters."""
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "ts"]
    )

    def per_user(g: pa.Table) -> pa.Table:
        et = np.asarray(g["event_type"].to_pylist())
        t = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sg = t[et == "signup"]
        has_signup = len(sg) > 0
        converted = blocked = 0
        if has_signup:
            t0 = int(sg.min())
            pu = t[(et == "purchase") & (t > t0)]
            if len(pu):
                converted = 1
                t1 = int(pu.min())
                blocked = int(
                    bool(((et == "error") & (t > t0) & (t < t1)).any())
                )
        return pa.table(
            {
                "has_signup": pa.array([int(has_signup)], pa.int64()),
                "converted": pa.array([converted], pa.int64()),
                "blocked": pa.array([blocked], pa.int64()),
            }
        )

    agg = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .aggregate(
            Sum("has_signup", alias_name="n_signup_users"),
            Sum("converted", alias_name="n_converted"),
            Sum("blocked", alias_name="n_blocked"),
        )
    )
    return pa.table(
        {
            "n_signup_users": pa.array([int(agg["n_signup_users"])], pa.int64()),
            "n_converted": pa.array([int(agg["n_converted"])], pa.int64()),
            "n_clean": pa.array(
                [int(agg["n_converted"]) - int(agg["n_blocked"])], pa.int64()
            ),
            "n_blocked": pa.array([int(agg["n_blocked"])], pa.int64()),
        }
    )


EVENTS_FUNNEL_EXCLUSION_CENSUS_SQL = """
WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'signup' GROUP BY 1),
p AS (SELECT s.user_id, s.t0, MIN(epoch_us(e.ts)) AS t1
      FROM s JOIN events e
        ON e.user_id = s.user_id AND e.event_type = 'purchase'
       AND epoch_us(e.ts) > s.t0
      GROUP BY 1, 2),
x AS (SELECT p.user_id,
             CASE WHEN EXISTS (SELECT 1 FROM events c
                               WHERE c.user_id = p.user_id
                                 AND c.event_type = 'error'
                                 AND epoch_us(c.ts) > p.t0
                                 AND epoch_us(c.ts) < p.t1)
                  THEN 1 ELSE 0 END AS blocked
      FROM p)
SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup_users,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_converted,
       CAST((SELECT COUNT(*) FROM x WHERE blocked = 0) AS BIGINT) AS n_clean,
       CAST((SELECT COUNT(*) FROM x WHERE blocked = 1) AS BIGINT) AS n_blocked
"""


def docs_warc_cdx_point_read_audit(sf_dir: str):
    """CDX-style RANDOM ACCESS into the WARC export: shards are written
    to disk (same layout as the shard-export op), then a second pass
    point-reads every 97th document by its ARITHMETIC offset — seek,
    parse exactly one record with the strict parser, verify id and
    payload length — proving the offset index a crawl store serves
    single-document fetches with (no scan).  The oracle reconstructs the
    in-shard offset as the partitioned prefix sum of the record-length
    formula.  Point reads are grouped per shard so each shard file opens
    once per block."""
    import os

    from ...functions.warc import parse_records, record_length, write_record

    # namespaced by SF so a concurrent bench/sweep at another SF can't
    # clobber these shard files mid-read (ADVICE r4)
    out_dir = f"/tmp/iocr_warc_cdx_{os.path.basename(os.path.normpath(sf_dir))}"
    os.makedirs(out_dir, exist_ok=True)
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def pre(t: pa.Table) -> pa.Table:
        return t.append_column("shard_id", pc.divide(t["doc_id"], 64))

    def write_shard(g: pa.Table) -> pa.Table:
        sid = int(g["shard_id"][0].as_py())
        rows = sorted(zip(g["doc_id"].to_pylist(), g["text"].to_pylist()))
        buf = b"".join(write_record(i, s.encode("utf-8")) for i, s in rows)
        with open(f"{out_dir}/shard-{sid:06d}.warc", "wb") as f:
            f.write(buf)
        return pa.table({"shard_id": pa.array([sid], pa.int64())})

    (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(write_shard, batch_format="pyarrow")
        .materialize()
    )

    def point_read(g: pa.Table) -> pa.Table:
        sid = int(g["shard_id"][0].as_py())
        rows = sorted(zip(g["doc_id"].to_pylist(), g["text"].to_pylist()))
        offsets, lens, ids = {}, {}, []
        pos = 0
        for i, s in rows:
            rl = record_length(i, len(s.encode("utf-8")))
            offsets[i], lens[i] = pos, rl
            pos += rl
        probe = [i for i, _ in rows if i % 97 == 0]
        if not probe:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shard_id": pa.array([], pa.int64()),
                    "offset": pa.array([], pa.int64()),
                    "record_len": pa.array([], pa.int64()),
                    "payload_len": pa.array([], pa.int64()),
                }
            )
        out = {"doc_id": [], "shard_id": [], "offset": [], "record_len": [], "payload_len": []}
        with open(f"{out_dir}/shard-{sid:06d}.warc", "rb") as f:
            for i in probe:
                f.seek(offsets[i])
                rec = parse_records(f.read(lens[i]))
                if len(rec) != 1 or rec[0]["doc_id"] != i:
                    raise ValueError(f"CDX point read failed for doc {i}")
                out["doc_id"].append(i)
                out["shard_id"].append(sid)
                out["offset"].append(offsets[i])
                out["record_len"].append(lens[i])
                out["payload_len"].append(len(rec[0]["payload"]))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(point_read, batch_format="pyarrow")
        .sort("doc_id")
    )


DOCS_WARC_CDX_POINT_READ_AUDIT_SQL = """
WITH r AS (
  SELECT doc_id, doc_id // 64 AS shard_id,
         CAST(strlen(text) AS BIGINT) AS payload_len,
         CAST(125 + 2 * length(CAST(doc_id AS VARCHAR))
              + length(CAST(strlen(text) AS VARCHAR))
              + strlen(text) AS BIGINT) AS record_len
  FROM documents),
o AS (
  SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id, payload_len,
         record_len,
         CAST(SUM(record_len) OVER (PARTITION BY shard_id ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - record_len AS BIGINT) AS "offset"
  FROM r)
SELECT doc_id, shard_id, "offset", record_len, payload_len
FROM o WHERE doc_id % 97 = 0 ORDER BY doc_id
"""


def embeddings_jl_distortion_audit(sf_dir: str):
    """Johnson–Lindenstrauss DISTORTION audit on the integer grid: a
    deterministic ±1 sign matrix (md5 of 'r:j:d' — the engine-neutral
    hash) projects each int8-quantized vector to 8 dims; for consecutive
    pairs (2i, 2i+1) the projected pair distance·10⁶ ÷ (8-dim-normalized
    original distance·64) is the per-pair distortion ppm, exact on both
    sides — the accuracy audit for the random-projection family next to
    the KMV and minhash audits.  Per-block matmul; pair distances ride
    the same ÷2 co-grouping."""
    from ...stages.cluster import _vecs

    ds = rd.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )

    def q8(vecs: np.ndarray) -> np.ndarray:
        mx = np.abs(vecs).max(axis=1)
        safe = np.where(mx == 0.0, 1.0, mx)
        return np.floor(vecs * 127.0 / safe[:, None] + 0.5).astype(np.int64)

    import hashlib

    _sign_cache: dict[int, np.ndarray] = {}

    def signs(d: int) -> np.ndarray:
        m = _sign_cache.get(d)
        if m is None:
            m = np.empty((8, d), np.int64)
            for r in range(8):
                for j in range(d):
                    h = int(
                        hashlib.md5(f"r:{r}:{j}".encode()).hexdigest()[:8], 16
                    )
                    m[r, j] = 1 if h % 2 == 0 else -1
            _sign_cache[d] = m
        return m

    empty = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "d2_orig": pa.array([], pa.int64()),
            "d2_proj": pa.array([], pa.int64()),
            "distortion_ppm": pa.array([], pa.int64()),
        }
    )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("pair_id", pc.divide(t["vec_id"], 2))

    def per_pair(g: pa.Table) -> pa.Table:
        if g.num_rows != 2:
            return empty
        g = g.sort_by("vec_id")
        q = q8(_vecs(g, "embedding"))
        d = q.shape[1]
        s = signs(d)
        p = q @ s.T
        diff = q[0] - q[1]
        d2o = int((diff * diff).sum())
        pd = p[0] - p[1]
        d2p = int((pd * pd).sum())
        if d2o == 0:
            return empty
        dist = d2p * d * 1_000_000 // (d2o * 8)
        return pa.table(
            {
                "vec_a": pa.array([int(g["vec_id"][0].as_py())], pa.int64()),
                "vec_b": pa.array([int(g["vec_id"][1].as_py())], pa.int64()),
                "d2_orig": pa.array([d2o], pa.int64()),
                "d2_proj": pa.array([d2p], pa.int64()),
                "distortion_ppm": pa.array([dist], pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("pair_id")
        .map_groups(per_pair, batch_format="pyarrow")
        .sort("vec_a")
    )


EMBEDDINGS_JL_DISTORTION_AUDIT_SQL = """
WITH ex AS (
  SELECT vec_id, CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
             AS mx
  FROM embeddings),
q8 AS (
  SELECT vec_id, dim,
         CAST(FLOOR(v * 127.0
                    / (CASE WHEN mx = 0 THEN 1.0 ELSE mx END) + 0.5)
              AS BIGINT) AS q
  FROM ex),
dims AS (SELECT MAX(dim) + 1 AS d FROM q8),
sg AS (
  SELECT r.r, dm.dim,
         CASE WHEN CAST(('0x' || substr(md5('r:' || CAST(r.r AS VARCHAR)
                    || ':' || CAST(dm.dim AS VARCHAR)), 1, 8)) AS UBIGINT)
                   % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS r) r,
       (SELECT DISTINCT dim FROM q8) dm),
pj AS (
  SELECT q8.vec_id, sg.r,
         CAST(SUM(sg.s * q8.q) AS BIGINT) AS p
  FROM q8 JOIN sg ON q8.dim = sg.dim
  GROUP BY 1, 2),
po AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(SUM((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS d2_proj
  FROM pj a JOIN pj b ON b.vec_id = a.vec_id + 1 AND a.r = b.r
  WHERE a.vec_id % 2 = 0 GROUP BY 1, 2),
oo AS (
  SELECT a.vec_id AS vec_a,
         CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d2_orig
  FROM q8 a JOIN q8 b ON b.vec_id = a.vec_id + 1 AND a.dim = b.dim
  WHERE a.vec_id % 2 = 0 GROUP BY 1)
SELECT po.vec_a, po.vec_b, oo.d2_orig, po.d2_proj,
       CAST(po.d2_proj * (SELECT d FROM dims) * 1000000
            // (oo.d2_orig * 8) AS BIGINT) AS distortion_ppm
FROM po JOIN oo ON po.vec_a = oo.vec_a
WHERE oo.d2_orig > 0
ORDER BY po.vec_a
"""


def docs_url_canonicalize_census(sf_dir: str):
    """URL CANONICALIZATION census (functions/url.py — the dedup key of
    web crawling): four deterministic aliases per document (shuffled
    query, uppercase scheme/host + explicit :443, dot-segments +
    fragment, and the canonical itself) are normalized by the real RFC
    3986-subset canonicalizer; the op asserts all four COLLAPSE to one
    canonical and emits it — which the oracle constructs directly, so
    any normalization rule the code gets wrong (port, case,
    dot-segment, query order, fragment) breaks the string match."""
    from ...functions.url import canonicalize_url

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def census(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        canon, nvar, ncan = [], [], []
        for d in ids:
            variants = [
                f"https://corpus.example/doc/{d}?b=2&a=1",
                f"HTTPS://CORPUS.EXAMPLE:443/doc/{d}?a=1&b=2",
                f"https://corpus.example/./doc/../doc/{d}?a=1&b=2#frag",
                f"https://corpus.example/doc/{d}?a=1&b=2",
            ]
            normd = {canonicalize_url(v) for v in variants}
            if len(normd) != 1:
                raise ValueError(f"variants did not collapse for doc {d}: {normd}")
            canon.append(next(iter(normd)))
            nvar.append(len(variants))
            ncan.append(len(normd))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "canonical": pa.array(canon, pa.string()),
                "n_variants": pa.array(nvar, pa.int64()),
                "n_canonical": pa.array(ncan, pa.int64()),
            }
        )

    return ds.map_batches(census, batch_format="pyarrow").sort("doc_id")


DOCS_URL_CANONICALIZE_CENSUS_SQL = """
SELECT doc_id,
       'https://corpus.example/doc/' || CAST(doc_id AS VARCHAR)
           || '?a=1&b=2' AS canonical,
       CAST(4 AS BIGINT) AS n_variants,
       CAST(1 AS BIGINT) AS n_canonical
FROM documents ORDER BY doc_id
"""


def orders_patched_topk(sf_dir: str):
    """COMPOSITION proof: the patch overlay (M12 update semantics —
    orderkeys ≡ 0 mod 97 get a 10%-of-cents price cut, keys ≡ 0 mod 401
    tombstoned) applied BEFORE a global top-10 by patched price — ranking
    over mutated state, the read-your-writes shape a dashboard needs the
    instant an operator edits a record.  Overlay rules are arithmetic so
    the oracle replays them in SQL; ties break by orderkey."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    )

    def patch(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        keep = k % 401 != 0
        k, cents = k[keep], cents[keep]
        cut = k % 97 == 0
        cents = np.where(cut, cents - cents // 10, cents)
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "patched_cents": pa.array(cents, pa.int64()),
                "was_patched": pa.array(cut.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(patch, batch_format="pyarrow")
        .sort(["patched_cents", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


ORDERS_PATCHED_TOPK_SQL = """
WITH p AS (
  SELECT o_orderkey,
         CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c
  FROM orders WHERE o_orderkey % 401 <> 0),
q AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN c - c // 10 ELSE c END
             AS patched_cents,
         CAST(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS was_patched
  FROM p)
SELECT o_orderkey, patched_cents, was_patched
FROM q ORDER BY patched_cents DESC, o_orderkey ASC LIMIT 10
"""


def part_name_snm_candidate_pairs(sf_dir: str):
    """Sorted-Neighborhood-Method blocking (Hernández–Stolfo SIGMOD'95 —
    the OTHER classic ER blocking strategy next to the repo's key-block
    linkage): rows ordered by an 8-byte big-endian name-prefix key (exact
    int64, identical arithmetic in SQL), each row paired with its ≤ 3
    rank-successors, pairs kept at Levenshtein ≤ 6.  The global order
    comes from the value-range-bucket rank (no global sort); windows
    cross bucket borders via ghost rows duplicated into the predecessor
    bucket, so no pair is lost at a partition boundary — the distributed
    SNM correctness trap, handled and oracle-proven.  Pair DP budget is
    O(window·n) short-name distances."""
    from ...functions.similarity import _edit_distance
    from ...stages.rank import global_value_rank

    W, B = 3, 64
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_name"])

    def keyed(t: pa.Table) -> pa.Table:
        # 6-byte prefix key: keeps (k - lo)·n_buckets inside int64 for the
        # value-range-bucket rank (an 8-byte key overflows the bucket math)
        ks = [
            int.from_bytes(n.encode("ascii")[:6].ljust(6, b"\0"), "big")
            for n in t["p_name"].to_pylist()
        ]
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_name": t["p_name"],
                "k": pa.array(ks, pa.int64()),
            }
        )

    ranked = global_value_rank(
        ds.map_batches(keyed, batch_format="pyarrow"),
        value_col="k",
        id_col="p_partkey",
        out_col="rnk",
    )

    def spread(t: pa.Table) -> pa.Table:
        rnk = t["rnk"].to_numpy(zero_copy_only=False)
        native_bucket = rnk // B
        parts = [t.append_column("bucket", pa.array(native_bucket, pa.int64()))]
        ghost = rnk % B < W
        if ghost.any():
            g = t.filter(pa.array(ghost))
            parts.append(
                g.append_column(
                    "bucket", pa.array(rnk[ghost] // B - 1, pa.int64())
                )
            )
        return pa.concat_tables(parts)

    def pairs(g: pa.Table) -> pa.Table:
        b = int(g["bucket"][0].as_py())
        g = g.sort_by("rnk")
        rnk = g["rnk"].to_numpy(zero_copy_only=False)
        pk = g["p_partkey"].to_numpy(zero_copy_only=False)
        names = g["p_name"].to_pylist()
        out = {"pk_a": [], "pk_b": [], "rank_gap": [], "dist": []}
        for i in range(len(rnk)):
            if rnk[i] // B != b:
                continue  # ghost row: partner only
            for j in range(i + 1, len(rnk)):
                gap = int(rnk[j] - rnk[i])
                if gap > W:
                    break
                d = _edit_distance(names[i], names[j])
                if d <= 6:
                    out["pk_a"].append(int(pk[i]))
                    out["pk_b"].append(int(pk[j]))
                    out["rank_gap"].append(gap)
                    out["dist"].append(d)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return (
        ranked.map_batches(spread, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pyarrow")
        .sort(["pk_a", "pk_b"])
    )


PART_NAME_SNM_CANDIDATE_PAIRS_SQL = """
WITH k AS (
  SELECT p_partkey, p_name,
         CAST(  (CASE WHEN length(p_name) >= 1
                 THEN ascii(substr(p_name, 1, 1)) ELSE 0 END) * 1099511627776
              + (CASE WHEN length(p_name) >= 2
                 THEN ascii(substr(p_name, 2, 1)) ELSE 0 END) * 4294967296
              + (CASE WHEN length(p_name) >= 3
                 THEN ascii(substr(p_name, 3, 1)) ELSE 0 END) * 16777216
              + (CASE WHEN length(p_name) >= 4
                 THEN ascii(substr(p_name, 4, 1)) ELSE 0 END) * 65536
              + (CASE WHEN length(p_name) >= 5
                 THEN ascii(substr(p_name, 5, 1)) ELSE 0 END) * 256
              + (CASE WHEN length(p_name) >= 6
                 THEN ascii(substr(p_name, 6, 1)) ELSE 0 END) AS BIGINT) AS k
  FROM part),
r AS (SELECT p_partkey, p_name,
             ROW_NUMBER() OVER (ORDER BY k, p_partkey) AS rnk
      FROM k)
SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
       CAST(b.rnk - a.rnk AS BIGINT) AS rank_gap,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 3
WHERE levenshtein(a.p_name, b.p_name) <= 6
ORDER BY pk_a, pk_b
"""


def docs_blocklist_gate(sf_dir: str):
    """Blocklist GATE (flag-don't-drop, the quality-gate discipline of
    the curation family) driven by the Aho–Corasick scanner: one linear
    pass flags documents containing any blocked phrase and records WHICH
    phrase fired first (lowest pattern index among earliest match starts —
    deterministic), keeping the row with a reject reason instead of
    dropping it.  The oracle replays the contains + priority logic with
    position arithmetic."""
    from ...functions.ahocorasick import AhoCorasick

    pats = ["slow query", "error", "dup dup"]
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def gate(t: pa.Table) -> pa.Table:
        ac = AhoCorasick(pats)
        ids = t["doc_id"].to_pylist()
        blocked, reason = [], []
        for s in t["text"].to_pylist():
            hit = None  # (end, idx) smallest
            for end, idx in ac.iter_matches(s):
                start = end - len(pats[idx]) + 1
                key = (start, idx)
                if hit is None or key < hit:
                    hit = key
            blocked.append(int(hit is not None))
            reason.append(pats[hit[1]] if hit else "")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "blocked": pa.array(blocked, pa.int64()),
                "block_reason": pa.array(reason, pa.string()),
            }
        )

    return ds.map_batches(gate, batch_format="pyarrow").sort("doc_id")


DOCS_BLOCKLIST_GATE_SQL = """
WITH p AS (
  SELECT d.doc_id, pr.idx, pr.pat,
         strpos(d.text, pr.pat) AS pos
  FROM documents d
  CROSS JOIN (SELECT 0 AS idx, 'slow query' AS pat
              UNION ALL SELECT 1, 'error'
              UNION ALL SELECT 2, 'dup dup') pr),
firsts AS (
  SELECT doc_id, pat,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY pos ASC, idx ASC) AS rn
  FROM p WHERE pos > 0)
SELECT d.doc_id,
       CAST(CASE WHEN f.pat IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS blocked,
       COALESCE(f.pat, '') AS block_reason
FROM documents d
LEFT JOIN (SELECT doc_id, pat FROM firsts WHERE rn = 1) f
       ON d.doc_id = f.doc_id
ORDER BY d.doc_id
"""
