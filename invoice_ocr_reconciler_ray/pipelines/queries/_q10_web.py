"""Query-registry family module 10: round-5 web-governance + engine-audit ops.

Families in this module (each op oracle-checked at both SFs):

* crawl governance — robots.txt gate (RFC 9309 parser), sitemap coverage
  round-trip, token-bucket rate limiting, anchor-text aggregation, the
  composed per-lang admission pipeline (robots × dedup × quality);
* placement / storage — consistent-hash ring census, zone-map pruning
  audit, encoding planner, delta-bitpack widths, Merkle integrity root;
* accuracy audits — Bloom false-positive count vs truth, Chao1 richness
  vs truth, LSH bands×rows tuning curve, parallelism-invariance self-audit;
* graph — k-core peeling, EXACT-oracle connected components;
* streaming ops — SLO burn-rate alerts, stream-disorder measurement,
  idempotency retry detection, CEP regex cohorts, fair-share scheduling;
* ML eval — bigram-LM next-token accuracy; Haar wavelet energies;
  MIME sniff routing census over real codec bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min

from ._common import _t

# The host's robots.txt, fetched once per host at crawl time.  Parsed by the
# REAL parser (functions/robots.py, RFC 9309 longest-prefix dialect); the
# graftbot group REPLACES the * group per §2.2.1, so the effective rules are
# the eight graftbot lines — the SQL oracle encodes exactly those in a
# VALUES table and replays longest-prefix / allow-on-tie with window rank.
_ROBOTS_TXT = """
# corpus.example crawl policy
User-agent: *
Disallow: /          # default-deny for unknown bots

User-agent: graftbot
Disallow: /en/
Allow: /en/3/
Disallow: /de/5/
Allow: /de/5/p12
Disallow: /zh/
Allow: /zh/1/
Disallow: /es/4/
Allow: /es/4/
"""


def docs_robots_gate(sf_dir: str):
    """Robots.txt admission gate (flag-don't-drop): each document's crawl
    path is tested against the host policy; the verdict and the winning
    rule prefix are recorded so excluded rows stay auditable.

    Path synthesis is deterministic from (lang, doc_id) — the same
    expression the oracle builds in SQL.  Matching is vectorized: one
    ``startswith`` scan per rule (rule sets are tiny), tracking the
    longest-prefix winner with allow-beats-disallow on ties (RFC 9309
    §2.2.2).  Default allow when nothing matches.
    """
    from ...functions.robots import parse_robots

    rules = parse_robots(_ROBOTS_TXT, agent="graftbot")

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def gate(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        paths = np.array(
            [f"/{l}/{i % 7}/p{i}" for l, i in zip(langs, ids)], dtype=object
        )
        best_len = np.full(len(paths), -1, dtype=np.int64)
        best_allow = np.ones(len(paths), dtype=bool)
        best_rule = np.full(len(paths), "", dtype=object)
        spaths = paths.astype(str)
        for is_allow, prefix in rules:
            m = np.char.startswith(spaths, prefix)
            ln = len(prefix)
            upgrade = m & (
                (ln > best_len) | ((ln == best_len) & is_allow & ~best_allow)
            )
            best_len[upgrade] = ln
            best_allow[upgrade] = is_allow
            best_rule[upgrade] = prefix
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "path": pa.array(list(paths), pa.string()),
                "allowed": pa.array(best_allow.tolist(), pa.bool_()),
                "rule": pa.array(best_rule.tolist(), pa.string()),
            }
        )

    return ds.map_batches(gate, batch_format="pyarrow")


def docs_sitemap_coverage_audit(sf_dir: str):
    """Sitemap round-trip + crawl-coverage audit per host (= per lang).

    Each host publishes a sitemap listing the pages it wants indexed —
    deterministically, docs with ``doc_id % 3 != 0``, lastmod derived from
    the id.  The op BUILDS the real sitemap.xml bytes per host
    (functions/sitemap.py), re-PARSES them with the strict parser (any
    framing bug raises), and emits the coverage manifest: listed/unlisted
    counts and the exact archive byte size — which the oracle reconstructs
    arithmetically from the record-layout formula (48+10 header/trailer,
    52 + len(url) per entry).  Same export discipline as the WARC/tar
    manifests; per-host groups build independently."""
    from ...functions.sitemap import parse_sitemap, write_sitemap

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def build(g: pa.Table) -> pa.Table:
        lang = g.column("lang")[0].as_py()
        ids = sorted(g.column("doc_id").to_pylist())
        listed = [i for i in ids if i % 3 != 0]
        entries = [
            (
                f"https://{lang}.corpus.example/p{i}",
                f"2026-01-{i % 28 + 1:02d}",
            )
            for i in listed
        ]
        blob = write_sitemap(entries)
        parsed = parse_sitemap(blob)  # strict round-trip: raises on any bug
        assert [u for u, _ in parsed] == [u for u, _ in entries]
        return pa.table(
            {
                "lang": pa.array([lang], pa.string()),
                "n_corpus": pa.array([len(ids)], pa.int64()),
                "n_listed": pa.array([len(listed)], pa.int64()),
                "n_unlisted": pa.array([len(ids) - len(listed)], pa.int64()),
                "sitemap_bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    return ds.groupby("lang").map_groups(build, batch_format="pyarrow")


DOCS_SITEMAP_COVERAGE_AUDIT_SQL = """
WITH d AS (
  SELECT lang, doc_id,
         doc_id % 3 <> 0 AS listed,
         strlen('https://' || lang || '.corpus.example/p'
                || CAST(doc_id AS VARCHAR)) AS url_len
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_corpus,
       CAST(SUM(CASE WHEN listed THEN 1 ELSE 0 END) AS BIGINT) AS n_listed,
       CAST(SUM(CASE WHEN listed THEN 0 ELSE 1 END) AS BIGINT) AS n_unlisted,
       CAST(58 + SUM(CASE WHEN listed THEN 52 + url_len ELSE 0 END)
            AS BIGINT) AS sitemap_bytes
FROM d
GROUP BY lang
ORDER BY lang
"""


DOCS_ROBOTS_GATE_SQL = """
WITH p AS (
  SELECT doc_id,
         '/' || lang || '/' || CAST(doc_id % 7 AS VARCHAR) || '/p'
             || CAST(doc_id AS VARCHAR) AS path
  FROM documents
), r(is_allow, prefix) AS (
  VALUES (0, '/en/'), (1, '/en/3/'), (0, '/de/5/'), (1, '/de/5/p12'),
         (0, '/zh/'), (1, '/zh/1/'), (0, '/es/4/'), (1, '/es/4/')
), m AS (
  SELECT p.doc_id, r.is_allow, r.prefix,
         ROW_NUMBER() OVER (
           PARTITION BY p.doc_id
           ORDER BY length(r.prefix) DESC, r.is_allow DESC
         ) AS rn
  FROM p JOIN r ON substr(p.path, 1, length(r.prefix)) = r.prefix
)
SELECT p.doc_id, p.path,
       COALESCE(m.is_allow = 1, TRUE) AS allowed,
       COALESCE(m.prefix, '') AS rule
FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON p.doc_id = m.doc_id
ORDER BY p.doc_id
"""


def events_rate_limit_replay(sf_dir: str):
    """Token-bucket rate-limiter REPLAY per user (crawl-politeness /
    API-admission semantics): capacity 3 tokens, one token refilled per
    600 s, integer arithmetic throughout.

    This is an order-sensitive RECURRENCE — each admission decision
    depends on the post-state of the previous event — so it cannot be a
    window function: the Ray side runs an exact sequential fold per user
    group (groups are small by construction; users partition the shuffle),
    and the oracle replays the identical fold with a recursive CTE.
    State transition (microsecond ints, ``//`` floor on positive deltas):

        pre_0 = CAP;  pre_i = min(CAP, post_{i-1} + (t_i - t_{i-1}) // R)
        admit_i = pre_i >= 1;  post_i = pre_i - 1 if admit_i else pre_i
    """
    CAP, REFILL_US = 3, 600_000_000

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def replay(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uid = g.column("user_id")[0].as_py()
        ts = np.sort(
            pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        )
        level = CAP
        admitted = 0
        prev = None
        for t in ts:
            if prev is not None:
                level = min(CAP, level + (int(t) - prev) // REFILL_US)
            if level >= 1:
                admitted += 1
                level -= 1
            prev = int(t)
        n = len(ts)
        return pa.table(
            {
                "user_id": pa.array([uid], g.schema.field("user_id").type),
                "n_events": pa.array([n], pa.int64()),
                "n_admitted": pa.array([admitted], pa.int64()),
                "n_throttled": pa.array([n - admitted], pa.int64()),
                "final_level": pa.array([level], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(replay, batch_format="pyarrow")


EVENTS_RATE_LIMIT_REPLAY_SQL = """
WITH RECURSIVE e AS (
  SELECT user_id, epoch_us(ts) AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM events
), r AS (
  SELECT user_id, rn, t, 1 AS admitted, 2 AS level_post
  FROM e WHERE rn = 1          -- pre = CAP(3) >= 1: first event always admits
  UNION ALL
  SELECT e.user_id, e.rn, e.t,
         CASE WHEN least(3, r.level_post + (e.t - r.t) // 600000000) >= 1
              THEN 1 ELSE 0 END,
         CASE WHEN least(3, r.level_post + (e.t - r.t) // 600000000) >= 1
              THEN least(3, r.level_post + (e.t - r.t) // 600000000) - 1
              ELSE least(3, r.level_post + (e.t - r.t) // 600000000) END
  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(admitted) AS BIGINT) AS n_admitted,
       CAST(COUNT(*) - SUM(admitted) AS BIGINT) AS n_throttled,
       CAST(MAX(CASE WHEN rn = mx THEN level_post END) AS BIGINT) AS final_level
FROM (SELECT r.*, MAX(rn) OVER (PARTITION BY user_id) AS mx FROM r)
GROUP BY user_id
ORDER BY user_id
"""


def docs_consistent_hash_ring(sf_dir: str):
    """Consistent-hash ring placement audit — HOW a 10^12-key corpus maps
    onto storage nodes.  8 nodes × 16 virtual nodes hash onto a 32-bit
    ring via the repo's exact md5 bridge (first 8 hex digits as UBIGINT,
    identical in hashlib and DuckDB); each doc's key hashes the same way
    and is owned by the first vnode clockwise (wrap to the minimum ring
    point).  Output: docs per node + ring vnode count — the balance
    report that tells you whether virtual-node count is high enough
    before you commit a layout.  The ring is tiny and broadcast-free
    (computed in-closure); the doc side streams."""
    nodes = [f"node{i}" for i in range(8)]
    import hashlib

    ring = sorted(
        (
            int(hashlib.md5(f"{n}#v{v}".encode()).hexdigest()[:8], 16),
            n,
        )
        for n in nodes
        for v in range(16)
    )
    ring_pos = np.array([p for p, _ in ring], dtype=np.uint64)
    ring_node = np.array([n for _, n in ring], dtype=object)

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def place(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.array(
            [
                int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                for i in ids
            ],
            dtype=np.uint64,
        )
        idx = np.searchsorted(ring_pos, pos, side="left")
        idx[idx == len(ring_pos)] = 0  # wrap past the last vnode
        owner = ring_node[idx]
        ks, cnts = np.unique(owner.astype(str), return_counts=True)
        return pa.table(
            {
                "node": pa.array(list(ks), pa.string()),
                "n_docs": pa.array(cnts, pa.int64()),
            }
        )

    partials = ds.map_batches(place, batch_format="pyarrow")
    import pyarrow as _pa

    merged = (
        _pa.concat_tables(
            list(partials.iter_batches(batch_format="pyarrow"))
        )
        .group_by("node")
        .aggregate([("n_docs", "sum")])
        .rename_columns(["node", "n_docs"])
    )
    out = merged.append_column(
        "n_vnodes",
        pa.array(
            [int(sum(1 for _, n in ring if n == k.as_py())) for k in merged.column("node")],
            pa.int64(),
        ),
    )
    return out.sort_by("node")


DOCS_CONSISTENT_HASH_RING_SQL = """
WITH v(j) AS (SELECT UNNEST(range(16))),
n(node) AS (SELECT 'node' || CAST(UNNEST(range(8)) AS VARCHAR)),
ring AS (
  SELECT node,
         CAST(('0x' || substr(md5(node || '#v' || CAST(j AS VARCHAR)), 1, 8))
              AS UBIGINT) AS pos
  FROM n CROSS JOIN v
), d AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
           AS pos
  FROM documents
), owned AS (
  SELECT d.doc_id,
         COALESCE(
           (SELECT r.node FROM ring r WHERE r.pos >= d.pos
            ORDER BY r.pos, r.node LIMIT 1),
           (SELECT r.node FROM ring r ORDER BY r.pos, r.node LIMIT 1)
         ) AS node
  FROM d
)
SELECT o.node, COUNT(*) AS n_docs,
       (SELECT COUNT(*) FROM ring r WHERE r.node = o.node) AS n_vnodes
FROM owned o
GROUP BY o.node
ORDER BY o.node
"""


def docs_anchor_text_profile(sf_dir: str):
    """Anchor-text aggregation over the synthetic link graph — the classic
    web-corpus enrichment: what the web SAYS a page is about.  Each link
    (src → dst, the deterministic md5 graph shared with docs_pagerank)
    carries the source page's lead token as anchor text; per TARGET we
    aggregate in-link count, distinct anchor vocabulary, and the modal
    anchor (ties broken lexicographically).

    Scale shape: anchors ride the edge via a hash JOIN on src (the anchor
    map is corpus-sized — a broadcast would break at 10^12 docs), then one
    groupby(dst); both all-to-alls are on narrow (int64, small-string)
    columns only."""
    from ._q01_events_orders import _synth_link_edges

    edges, _n = _synth_link_edges(sf_dir)
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def lead_token(t: pa.Table) -> pa.Table:
        toks = [
            (s.split(" ", 1)[0] if s else "")
            for s in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "anchor": pa.array(toks, pa.string()),
            }
        )

    anchors = docs.map_batches(lead_token, batch_format="pyarrow")
    linked = edges.join(
        anchors,
        join_type="inner",
        num_partitions=8,
        on=("src",),
        right_on=("doc_id",),
    )

    def agg(g: pa.Table) -> pa.Table:
        import collections

        dst = g.column("dst")[0].as_py()
        cnt = collections.Counter(g.column("anchor").to_pylist())
        top, top_n = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        return pa.table(
            {
                "doc_id": pa.array([dst], pa.int64()),
                "n_inlinks": pa.array([g.num_rows], pa.int64()),
                "n_distinct_anchors": pa.array([len(cnt)], pa.int64()),
                "top_anchor": pa.array([top], pa.string()),
                "top_anchor_n": pa.array([top_n], pa.int64()),
            }
        )

    return linked.groupby("dst").map_groups(agg, batch_format="pyarrow")


DOCS_ANCHOR_TEXT_PROFILE_SQL = """
WITH edges_raw AS (
  SELECT doc_id AS src,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || CAST(j.j AS VARCHAR)), 1, 8)) AS UBIGINT)
              % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
  FROM documents, LATERAL unnest(generate_series(0, 2)) AS j(j)
), edges AS (
  SELECT DISTINCT src, dst FROM edges_raw WHERE dst <> src
), linked AS (
  SELECT e.dst, split_part(d.text, ' ', 1) AS anchor
  FROM edges e JOIN documents d ON e.src = d.doc_id
), per_anchor AS (
  SELECT dst, anchor, COUNT(*) AS c
  FROM linked GROUP BY dst, anchor
)
SELECT dst AS doc_id,
       CAST(SUM(c) AS BIGINT) AS n_inlinks,
       COUNT(*) AS n_distinct_anchors,
       MAX(CASE WHEN rn = 1 THEN anchor END) AS top_anchor,
       CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS top_anchor_n
FROM (
  SELECT per_anchor.*,
         ROW_NUMBER() OVER (PARTITION BY dst ORDER BY c DESC, anchor) AS rn
  FROM per_anchor
)
GROUP BY dst
ORDER BY dst
"""


def docs_kcore_membership(sf_dir: str):
    """k-core decomposition (k=3) of the synthetic link graph — the
    standard graph-curation front: keep the densely-linked core of a web
    corpus, peel hubsless fringe.  Deterministic peeling: round r removes
    every node whose UNDIRECTED degree within the surviving set is < k;
    repeat to fixpoint.  The fixpoint arrives within a fixed round budget
    (asserted, not truncated), so the oracle can mirror the EXACT same
    peeling as unrolled SQL rounds — the docs_pagerank discipline applied
    to an iterative-deletion algorithm.

    Output: doc_id, in_core (flag-don't-drop, all docs kept)."""
    K, ROUNDS = 3, 6
    from ._q01_events_orders import _synth_link_edges

    edges_ds, _n = _synth_link_edges(sf_dir)
    # undirected degree: edge list is tiny by construction (≤3 per node) —
    # peeling happens on the narrow (src,dst) projection
    et = pa.concat_tables(
        list(edges_ds.iter_batches(batch_format="pyarrow"))
    )
    src = et.column("src").to_numpy(zero_copy_only=False)
    dst = et.column("dst").to_numpy(zero_copy_only=False)
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    all_ids = np.sort(
        pa.concat_tables(list(docs.iter_batches(batch_format="pyarrow")))
        .column("doc_id")
        .to_numpy(zero_copy_only=False)
    )
    alive = set(all_ids.tolist())
    for _ in range(ROUNDS):
        keep = np.array([a in alive and b in alive for a, b in zip(u, v)])
        deg: dict[int, int] = {}
        for a in u[keep]:
            deg[int(a)] = deg.get(int(a), 0) + 1
        new_alive = {a for a in alive if deg.get(a, 0) >= K}
        if new_alive == alive:
            break
        alive = new_alive
    else:
        # verify the budget truly reached the fixpoint
        keep = np.array([a in alive and b in alive for a, b in zip(u, v)])
        deg = {}
        for a in u[keep]:
            deg[int(a)] = deg.get(int(a), 0) + 1
        assert {a for a in alive if deg.get(a, 0) >= K} == alive, (
            "k-core did not converge within the round budget"
        )

    alive_arr = pa.array(sorted(alive), pa.int64())

    def flag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "in_core": pc.is_in(t.column("doc_id"), value_set=alive_arr),
            }
        )

    return docs.map_batches(flag, batch_format="pyarrow")


def _kcore_sql(k: int = 3, rounds: int = 6) -> str:
    sql = """WITH edges_raw AS (
  SELECT doc_id AS src,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || CAST(j.j AS VARCHAR)), 1, 8)) AS UBIGINT)
              % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
  FROM documents, LATERAL unnest(generate_series(0, 2)) AS j(j)
), edges AS (SELECT DISTINCT src, dst FROM edges_raw WHERE dst <> src),
und AS (SELECT src AS a, dst AS b FROM edges
        UNION ALL SELECT dst, src FROM edges),
r0 AS (SELECT doc_id AS node FROM documents)"""
    for i in range(1, rounds + 1):
        sql += f""",
r{i} AS (
  SELECT a AS node FROM und
  JOIN r{i-1} x ON und.a = x.node
  JOIN r{i-1} y ON und.b = y.node
  GROUP BY a HAVING COUNT(*) >= {k})"""
    return (
        sql
        + f"""
SELECT d.doc_id, r.node IS NOT NULL AS in_core
FROM documents d LEFT JOIN r{rounds} r ON d.doc_id = r.node
ORDER BY d.doc_id"""
    )


DOCS_KCORE_MEMBERSHIP_SQL = _kcore_sql()


def docs_bloom_membership_audit(sf_dir: str):
    """Bloom-filter ACCURACY audit with exact ground truth — the sketch
    family's discipline (KMV/minhash pair audits) applied to the filter
    every ingest dedup front uses.  Members = urls of docs with
    ``doc_id % 4 == 0``; filter = m=4096 bits, j=3 hash functions via the
    exact md5 bridge (bit_i(url) = md5(url + '#' + i) mod m, identical
    hashlib/DuckDB).  Every url is then probed: a non-member whose 3 bits
    are all set is a FALSE POSITIVE.  Output: member count, probe count,
    exact false-positive count, bits set — all integers, all reproducible
    from the table alone by either engine."""
    M, J = 4096, 3
    import hashlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def url_of(i: int) -> str:
        return f"https://corpus.example/p{i}"

    def bits_of(i: int) -> list[int]:
        u = url_of(i)
        return [
            int(hashlib.md5(f"{u}#{j}".encode()).hexdigest()[:8], 16) % M
            for j in range(J)
        ]

    # phase 1: per-block partial bitsets of MEMBER docs (m bits = 512 bytes
    # — the mergeable-sketch shape; partials OR together on the driver)
    def member_bits(t: pa.Table) -> pa.Table:
        bits = np.zeros(M, dtype=bool)
        for i in t.column("doc_id").to_pylist():
            if i % 4 == 0:
                for b in bits_of(i):
                    bits[b] = True
        return pa.table({"bits": pa.array([np.packbits(bits).tobytes()])})

    merged = np.zeros(M, dtype=bool)
    for b in ds.map_batches(member_bits, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for raw in b.column("bits").to_pylist():
            merged |= np.unpackbits(np.frombuffer(raw, np.uint8)).astype(bool)[:M]

    # phase 2: probe every url against the broadcast filter
    import ray

    from ...stages.broadcast import guard_broadcast_bytes

    guard_broadcast_bytes(
        merged.nbytes,
        label="bloom filter bits",
        alternative="shard the filter by bit range and probe via a "
        "hash-partitioned join",
    )
    bits_ref = ray.put(merged)

    def probe(t: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        ids = t.column("doc_id").to_pylist()
        member = [i % 4 == 0 for i in ids]
        hit = [all(bits[b] for b in bits_of(i)) for i in ids]
        fp = [h and not m for h, m in zip(hit, member)]
        return pa.table(
            {
                "n_probed": pa.array([len(ids)], pa.int64()),
                "n_members": pa.array([sum(member)], pa.int64()),
                "n_hits": pa.array([sum(hit)], pa.int64()),
                "n_false_pos": pa.array([sum(fp)], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(ds.map_batches(probe, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ))
    )
    import pyarrow.compute as pc

    return pa.table(
        {
            "n_probed": pa.array([pc.sum(parts["n_probed"]).as_py()], pa.int64()),
            "n_members": pa.array([pc.sum(parts["n_members"]).as_py()], pa.int64()),
            "n_hits": pa.array([pc.sum(parts["n_hits"]).as_py()], pa.int64()),
            "n_false_pos": pa.array(
                [pc.sum(parts["n_false_pos"]).as_py()], pa.int64()
            ),
            "n_bits_set": pa.array([int(merged.sum())], pa.int64()),
        }
    )


DOCS_BLOOM_MEMBERSHIP_AUDIT_SQL = """
WITH u AS (
  SELECT doc_id,
         'https://corpus.example/p' || CAST(doc_id AS VARCHAR) AS url,
         doc_id % 4 = 0 AS member
  FROM documents
), pos AS (
  SELECT u.doc_id, u.member,
         CAST(CAST(('0x' || substr(md5(u.url || '#' || CAST(j.j AS VARCHAR)),
                    1, 8)) AS UBIGINT) % 4096 AS BIGINT) AS bit
  FROM u, LATERAL unnest(generate_series(0, 2)) AS j(j)
), filter_bits AS (
  SELECT DISTINCT bit FROM pos WHERE member
), probe AS (
  SELECT p.doc_id, p.member,
         COUNT(f.bit) = 3 AS hit
  FROM pos p LEFT JOIN filter_bits f ON p.bit = f.bit
  GROUP BY p.doc_id, p.member
)
SELECT COUNT(*) AS n_probed,
       CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       CAST(SUM(CASE WHEN hit AND NOT member THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       (SELECT COUNT(*) FROM filter_bits) AS n_bits_set
FROM probe
"""


def events_slo_burn_alerts(sf_dir: str):
    """Multi-window SLO burn-rate alerting (the SRE-workbook policy) over
    the event stream: per aligned hour, the 1 h and rolling 6 h error
    rates; alert when the short window burns ≥ 2× the 10 % error budget
    AND the long window burns ≥ 1× — all compared by integer
    cross-multiplication (no float rates anywhere).

    Scale shape: per-block vectorized hour bucketing → tiny integer
    partials (≤ 744 hour rows each) merged on the driver — the
    pre-aggregate pattern; the dense hour spine makes the output
    schema-stable even for empty hours."""
    ANCHOR_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
    HOURS = 744  # 31 days
    import pyarrow.compute as pc

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        h = (us - ANCHOR_US) // 3_600_000_000
        err = pc.equal(t.column("event_type"), "error").to_numpy(
            zero_copy_only=False
        )
        tot = np.bincount(h, minlength=HOURS)
        ers = np.bincount(h[err], minlength=HOURS)
        return pa.table(
            {
                "tot": pa.array([tot.astype(np.int64).tobytes()]),
                "err": pa.array([ers.astype(np.int64).tobytes()]),
            }
        )

    tot = np.zeros(HOURS, dtype=np.int64)
    err = np.zeros(HOURS, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for traw, eraw in zip(b.column("tot").to_pylist(), b.column("err").to_pylist()):
            tot += np.frombuffer(traw, np.int64)[:HOURS]
            err += np.frombuffer(eraw, np.int64)[:HOURS]

    ct, ce = np.cumsum(tot), np.cumsum(err)
    tot6 = ct - np.concatenate([[0] * 6, ct[:-6]])
    err6 = ce - np.concatenate([[0] * 6, ce[:-6]])
    alert = (tot > 0) & (err * 10 >= 2 * tot) & (err6 * 10 >= tot6)
    return pa.table(
        {
            "hour_idx": pa.array(np.arange(HOURS), pa.int64()),
            "tot_1h": pa.array(tot, pa.int64()),
            "err_1h": pa.array(err, pa.int64()),
            "tot_6h": pa.array(tot6, pa.int64()),
            "err_6h": pa.array(err6, pa.int64()),
            "alert": pa.array(alert.tolist(), pa.bool_()),
        }
    )


EVENTS_SLO_BURN_ALERTS_SQL = """
WITH spine AS (
  SELECT CAST(UNNEST(range(744)) AS BIGINT) AS h
), ev AS (
  SELECT (epoch_us(ts) - 1704067200000000) // 3600000000 AS h,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS e
  FROM events
), hourly AS (
  SELECT s.h,
         CAST(COUNT(ev.e) AS BIGINT) AS tot,
         CAST(COALESCE(SUM(ev.e), 0) AS BIGINT) AS err
  FROM spine s LEFT JOIN ev ON ev.h = s.h
  GROUP BY s.h
), roll AS (
  SELECT h, tot AS tot_1h, err AS err_1h,
         CAST(SUM(tot) OVER win AS BIGINT) AS tot_6h,
         CAST(SUM(err) OVER win AS BIGINT) AS err_6h
  FROM hourly
  WINDOW win AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT h AS hour_idx, tot_1h, err_1h, tot_6h, err_6h,
       tot_1h > 0 AND err_1h * 10 >= 2 * tot_1h AND err_6h * 10 >= tot_6h
         AS alert
FROM roll
ORDER BY hour_idx
"""


def media_mime_sniff_census(sf_dir: str):
    """Magic-byte MIME routing census over REAL container bytes: each doc
    synthesizes a genuine payload with the repo's actual encoders (PNG /
    BMP / GIF image, WAV audio, PDF header — chosen by ``doc_id % 5``),
    the sniffer (functions/mimesniff.py) classifies it from leading bytes
    alone, and the census counts detected types.  A sniffer or encoder
    regression shows up as a hash mismatch against the oracle's expected
    routing — end-to-end proof that ingest routing and the multimodal
    codecs agree.  Encoders are imported once per worker (module import
    caching = actor-style setup); payloads never leave the task."""
    from ...functions.bmp import encode_bmp
    from ...functions.gif import encode_gif
    from ...functions.mimesniff import sniff
    from ...functions.png import encode_png
    from ...functions.wav import encode_wav

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def census(t: pa.Table) -> pa.Table:
        import collections

        cnt: collections.Counter = collections.Counter()
        for i in t.column("doc_id").to_pylist():
            k = i % 5
            px = np.full((4, 4, 3), (i * 37) % 256, dtype=np.uint8)
            if k == 0:
                payload = encode_png(px)
            elif k == 1:
                payload = encode_bmp(px)
            elif k == 2:
                payload = encode_gif(px)
            elif k == 3:
                payload = encode_wav(
                    np.full(8, (i % 128) - 64, dtype=np.int16), 8000
                )
            else:
                payload = b"%PDF-1.4\n%synthetic\n"
            cnt[sniff(payload)] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "mime": pa.array(ks, pa.string()),
                "n_docs": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(census, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    return (
        parts.group_by("mime")
        .aggregate([("n_docs", "sum")])
        .rename_columns(["mime", "n_docs"])
        .sort_by("mime")
    )


MEDIA_MIME_SNIFF_CENSUS_SQL = """
SELECT CASE doc_id % 5
         WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' WHEN 2 THEN 'gif'
         WHEN 3 THEN 'wav' ELSE 'pdf' END AS mime,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
ORDER BY mime
"""


def orders_encoding_planner(sf_dir: str):
    """Columnar encoding-planner audit — the storage-layout decision a
    100 TB writer makes per column: RLE run count (in o_orderkey order),
    dictionary cardinality, and plain width, reduced to exact integer
    byte estimates (RLE = runs × (8 + 4); DICT = distinct × avg-ish key
    bytes + n × 4; PLAIN = Σ value bytes) and the argmin scheme.

    Exactly computable on both sides: runs via a LAG-style shifted
    compare, bytes via strlen sums — no floats, no sampling.  Per-column
    partials are per-block; the global run count needs block-boundary
    stitching, so the op computes it on the ordered column via one
    vectorized shift on the driver-merged (tiny) projection — documented:
    at deployment scale runs are counted per row-group and boundaries
    stitched per file, same arithmetic."""
    import pyarrow.compute as pc

    cols = ["o_orderstatus", "o_orderpriority"]
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey"] + cols)
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    t = t.sort_by("o_orderkey")

    out_rows = []
    for c in cols:
        vals = np.asarray(t.column(c).to_pylist(), dtype=object).astype(str)
        n = len(vals)
        runs = int(1 + (vals[1:] != vals[:-1]).sum()) if n else 0
        uniq = np.unique(vals)
        plain_bytes = int(sum(len(v.encode()) for v in vals))
        dict_bytes = int(sum(len(v.encode()) for v in uniq)) + 4 * n
        rle_bytes = runs * 12
        best = min(
            [("plain", plain_bytes), ("dict", dict_bytes), ("rle", rle_bytes)],
            key=lambda kv: (kv[1], kv[0]),
        )[0]
        out_rows.append(
            {
                "col": c,
                "n_values": n,
                "n_runs": runs,
                "n_distinct": int(len(uniq)),
                "plain_bytes": plain_bytes,
                "dict_bytes": dict_bytes,
                "rle_bytes": rle_bytes,
                "best_scheme": best,
            }
        )
    cols_t = {k: [r[k] for r in out_rows] for k in out_rows[0]}
    return pa.table(
        {
            "col": pa.array(cols_t["col"], pa.string()),
            "n_values": pa.array(cols_t["n_values"], pa.int64()),
            "n_runs": pa.array(cols_t["n_runs"], pa.int64()),
            "n_distinct": pa.array(cols_t["n_distinct"], pa.int64()),
            "plain_bytes": pa.array(cols_t["plain_bytes"], pa.int64()),
            "dict_bytes": pa.array(cols_t["dict_bytes"], pa.int64()),
            "rle_bytes": pa.array(cols_t["rle_bytes"], pa.int64()),
            "best_scheme": pa.array(cols_t["best_scheme"], pa.string()),
        }
    )


ORDERS_ENCODING_PLANNER_SQL = """
WITH s AS (
  SELECT o_orderkey, o_orderstatus AS v, 'o_orderstatus' AS col FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderpriority, 'o_orderpriority' FROM orders
), runs AS (
  SELECT col, v,
         CASE WHEN v = LAG(v) OVER (PARTITION BY col ORDER BY o_orderkey)
              THEN 0 ELSE 1 END AS new_run
  FROM s
), agg AS (
  SELECT col,
         COUNT(*) AS n_values,
         CAST(SUM(new_run) AS BIGINT) AS n_runs,
         COUNT(DISTINCT v) AS n_distinct,
         CAST(SUM(strlen(v)) AS BIGINT) AS plain_bytes
  FROM runs GROUP BY col
), dictb AS (
  SELECT col, CAST(SUM(strlen(v)) AS BIGINT) AS uniq_bytes
  FROM (SELECT DISTINCT col, v FROM s) GROUP BY col
)
, j AS (
  SELECT a.col, a.n_values, a.n_runs, a.n_distinct, a.plain_bytes,
         d.uniq_bytes + 4 * a.n_values AS dict_bytes,
         a.n_runs * 12 AS rle_bytes
  FROM agg a JOIN dictb d ON a.col = d.col
), best AS (
  SELECT col, scheme FROM (
    SELECT col, scheme, b,
           ROW_NUMBER() OVER (PARTITION BY col ORDER BY b, scheme) AS rn
    FROM (
      SELECT col, 'plain' AS scheme, plain_bytes AS b FROM j
      UNION ALL SELECT col, 'dict', dict_bytes FROM j
      UNION ALL SELECT col, 'rle', rle_bytes FROM j
    )
  ) WHERE rn = 1
)
SELECT j.col, j.n_values, j.n_runs, j.n_distinct, j.plain_bytes,
       j.dict_bytes, j.rle_bytes, best.scheme AS best_scheme
FROM j JOIN best ON j.col = best.col
ORDER BY j.col
"""


def orders_minmax_pruning_audit(sf_dir: str):
    """Min-max zone-map pruning audit — WHY sort keys matter at 100 TB:
    lay orders out in 1000-row groups under two orderings (by
    o_orderdate = the good layout; by o_orderkey = the naive one),
    record per-group min/max of o_totalprice cents, and count how many
    groups a `totalprice > 400000.00` scan could PRUNE under each.  The
    zone-map arithmetic is exact integers (cents), group assignment is
    rank // 1000 — both engines reproduce the identical layout.

    Output: one row per layout with group counts + prunable groups +
    rows actually matching (the selectivity the surviving groups must
    serve)."""
    import pyarrow.compute as pc

    THRESH_C = 40_000_000  # 400000.00 in cents
    GROUP = 1000

    ds = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    price_c = pc.cast(
        pc.floor(pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    okey = t.column("o_orderkey").to_numpy(zero_copy_only=False)
    odate = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
        zero_copy_only=False
    )

    rows = []
    for layout, order in (
        ("by_orderdate", np.lexsort((okey, odate))),
        ("by_orderkey", np.argsort(okey, kind="stable")),
    ):
        p = price_c[order]
        n_groups = (len(p) + GROUP - 1) // GROUP
        gid = np.arange(len(p)) // GROUP
        gmax = np.full(n_groups, np.iinfo(np.int64).min)
        np.maximum.at(gmax, gid, p)
        prunable = int((gmax <= THRESH_C).sum())
        rows.append(
            {
                "layout": layout,
                "n_groups": int(n_groups),
                "n_prunable": prunable,
                "n_matching_rows": int((p > THRESH_C).sum()),
            }
        )
    return pa.table(
        {
            "layout": pa.array([r["layout"] for r in rows], pa.string()),
            "n_groups": pa.array([r["n_groups"] for r in rows], pa.int64()),
            "n_prunable": pa.array([r["n_prunable"] for r in rows], pa.int64()),
            "n_matching_rows": pa.array(
                [r["n_matching_rows"] for r in rows], pa.int64()
            ),
        }
    )


ORDERS_MINMAX_PRUNING_AUDIT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderdate,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM orders
), laid AS (
  SELECT 'by_orderdate' AS layout, price_c,
         (ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) - 1) // 1000
           AS gid
  FROM base
  UNION ALL
  SELECT 'by_orderkey', price_c,
         (ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1) // 1000
  FROM base
), groups AS (
  SELECT layout, gid, MAX(price_c) AS gmax
  FROM laid GROUP BY layout, gid
)
SELECT g.layout,
       COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN gmax <= 40000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_prunable,
       (SELECT CAST(SUM(CASE WHEN price_c > 40000000 THEN 1 ELSE 0 END)
               AS BIGINT) FROM base) AS n_matching_rows
FROM groups g
GROUP BY g.layout
ORDER BY g.layout
"""


def docs_chao1_bigram_richness(sf_dir: str):
    """Chao1 species-richness estimation audit — the estimator corpus
    teams use to answer "how much vocabulary haven't we crawled yet",
    with exact ground truth beside it (the sketch-accuracy-audit
    discipline).  Species = token BIGRAMS per lang; the deterministic
    sample = docs with ``doc_id % 5 == 0``.  Chao1 in exact milli-units
    (floor arithmetic, both engines):

        f2 > 0:  1000·d + (1000·f1·f1) // (2·f2)
        f2 = 0:  1000·d + (1000·f1·(f1-1)) // 2

    Output per lang: true distinct bigrams, sampled distinct, f1, f2,
    chao1_milli.  Counting is per-block partial (bigram, lang, n) →
    small groupby; no text leaves the tokenize stage."""
    import re

    tok_re = re.compile(r"[a-z0-9]+")

    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "lang", "text"]
    )

    def bigram_counts(t: pa.Table) -> pa.Table:
        import collections

        full: collections.Counter = collections.Counter()
        samp: collections.Counter = collections.Counter()
        for i, lang, text in zip(
            t.column("doc_id").to_pylist(),
            t.column("lang").to_pylist(),
            t.column("text").to_pylist(),
        ):
            toks = tok_re.findall((text or "").lower())
            for a, b in zip(toks, toks[1:]):
                key = (lang, f"{a} {b}")
                full[key] += 1
                if i % 5 == 0:
                    samp[key] += 1
        keys = sorted(full)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "bg": pa.array([k[1] for k in keys], pa.string()),
                "n_full": pa.array([full[k] for k in keys], pa.int64()),
                "n_samp": pa.array([samp.get(k, 0) for k in keys], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(bigram_counts, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    merged = (
        parts.group_by(["lang", "bg"])
        .aggregate([("n_full", "sum"), ("n_samp", "sum")])
        .rename_columns(["lang", "bg", "n_full", "n_samp"])
    )
    langs = sorted(set(merged.column("lang").to_pylist()))
    rows = []
    lang_np = np.asarray(merged.column("lang").to_pylist(), dtype=object)
    nf = merged.column("n_full").to_numpy(zero_copy_only=False)
    nsmp = merged.column("n_samp").to_numpy(zero_copy_only=False)
    for lang in langs:
        m = lang_np == lang
        d_true = int(m.sum())
        s = nsmp[m]
        d_samp = int((s > 0).sum())
        f1 = int((s == 1).sum())
        f2 = int((s == 2).sum())
        if f2 > 0:
            chao = 1000 * d_samp + (1000 * f1 * f1) // (2 * f2)
        else:
            chao = 1000 * d_samp + (1000 * f1 * (f1 - 1)) // 2
        rows.append((lang, d_true, d_samp, f1, f2, chao))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "d_true": pa.array([r[1] for r in rows], pa.int64()),
            "d_sample": pa.array([r[2] for r in rows], pa.int64()),
            "f1": pa.array([r[3] for r in rows], pa.int64()),
            "f2": pa.array([r[4] for r in rows], pa.int64()),
            "chao1_milli": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


DOCS_CHAO1_BIGRAM_RICHNESS_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
t AS (SELECT doc_id, lang, unnest(l) AS term,
             unnest(range(1, len(l)+1)) AS pos
      FROM d),
b AS (SELECT doc_id, lang, term,
             lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM t),
c AS (SELECT lang, term || ' ' || nxt AS bg,
             COUNT(*) AS n_full,
             CAST(SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_samp
      FROM b WHERE nxt IS NOT NULL GROUP BY 1, 2),
agg AS (
  SELECT lang,
         COUNT(*) AS d_true,
         CAST(SUM(CASE WHEN n_samp > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS d_sample,
         CAST(SUM(CASE WHEN n_samp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN n_samp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM c GROUP BY lang)
SELECT lang, d_true, d_sample, f1, f2,
       CASE WHEN f2 > 0
            THEN 1000 * d_sample + (1000 * f1 * f1) // (2 * f2)
            ELSE 1000 * d_sample + (1000 * f1 * (f1 - 1)) // 2
       END AS chao1_milli
FROM agg
ORDER BY lang
"""


def docs_minhash_lsh_tuning_curve(sf_dir: str):
    """LSH (bands × rows) TUNING CURVE over the exact 8-value minhash
    signatures: for each layout that factorizes the signature — 2×4
    (high precision), 4×2 (the production layout the band census audits),
    8×1 (high recall) — the exact bucket census and candidate-pair
    volume Σ C(size, 2) per layout.  This is THE parameter decision every
    near-dup deployment makes (pair volume ↔ recall trade), computed
    exactly from bucket sizes alone: signatures ride the groupby, pairs
    are never materialized.

    Output per layout: n_buckets (multi-doc), max_bucket, candidate_pairs."""
    from ._q09_docs_events import _minhash8_block

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    layouts = {
        "b2r4": [(0, 1, 2, 3), (4, 5, 6, 7)],
        "b4r2": [(0, 1), (2, 3), (4, 5), (6, 7)],
        "b8r1": [(0,), (1,), (2,), (3,), (4,), (5,), (6,), (7,)],
    }

    def band_keys(t: pa.Table) -> pa.Table:
        s = _minhash8_block(t)
        cols = {f"m{i}": s[f"m{i}"].to_numpy(zero_copy_only=False) for i in range(8)}
        rows_layout, rows_band, rows_key = [], [], []
        for lay, bandspec in layouts.items():
            for bi, members in enumerate(bandspec):
                key = np.array(
                    [":".join(str(cols[f"m{m}"][r]) for m in members)
                     for r in range(s.num_rows)],
                    dtype=object,
                )
                rows_layout.append(np.full(s.num_rows, lay, dtype=object))
                rows_band.append(np.full(s.num_rows, bi, dtype=np.int64))
                rows_key.append(key)
        return pa.table(
            {
                "layout": pa.array(np.concatenate(rows_layout).tolist(), pa.string()),
                "band": pa.array(np.concatenate(rows_band), pa.int64()),
                "k": pa.array(np.concatenate(rows_key).tolist(), pa.string()),
            }
        )

    buckets = (
        ds.map_batches(band_keys, batch_format="pyarrow")
        .groupby(["layout", "band", "k"])
        .aggregate(Count(alias_name="sz"))
        .to_pandas()
    )
    out = []
    for lay in sorted(layouts):
        sz = buckets.loc[buckets["layout"] == lay, "sz"].to_numpy(np.int64)
        multi = sz[sz > 1]
        out.append(
            (
                lay,
                int(len(multi)),
                int(sz.max()) if len(sz) else 0,
                int((multi * (multi - 1) // 2).sum()),
            )
        )
    return pa.table(
        {
            "layout": pa.array([r[0] for r in out], pa.string()),
            "n_buckets": pa.array([r[1] for r in out], pa.int64()),
            "max_bucket": pa.array([r[2] for r in out], pa.int64()),
            "candidate_pairs": pa.array([r[3] for r in out], pa.int64()),
        }
    )


from ._q09_docs_events import _MINHASH_SIG_SQL_CORE

DOCS_MINHASH_LSH_TUNING_CURVE_SQL = (
    "WITH "
    + _MINHASH_SIG_SQL_CORE
    + """,
b AS (
  SELECT 'b2r4' AS layout, 0 AS band,
         CAST(m0 AS VARCHAR) || ':' || CAST(m1 AS VARCHAR) || ':'
           || CAST(m2 AS VARCHAR) || ':' || CAST(m3 AS VARCHAR) AS k FROM sig
  UNION ALL SELECT 'b2r4', 1,
         CAST(m4 AS VARCHAR) || ':' || CAST(m5 AS VARCHAR) || ':'
           || CAST(m6 AS VARCHAR) || ':' || CAST(m7 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b4r2', 0, CAST(m0 AS VARCHAR) || ':' || CAST(m1 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b4r2', 1, CAST(m2 AS VARCHAR) || ':' || CAST(m3 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b4r2', 2, CAST(m4 AS VARCHAR) || ':' || CAST(m5 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b4r2', 3, CAST(m6 AS VARCHAR) || ':' || CAST(m7 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b8r1', 0, CAST(m0 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b8r1', 1, CAST(m1 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b8r1', 2, CAST(m2 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b8r1', 3, CAST(m3 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b8r1', 4, CAST(m4 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b8r1', 5, CAST(m5 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b8r1', 6, CAST(m6 AS VARCHAR) FROM sig
  UNION ALL SELECT 'b8r1', 7, CAST(m7 AS VARCHAR) FROM sig
), bu AS (
  SELECT layout, band, k, CAST(COUNT(*) AS BIGINT) AS sz
  FROM b GROUP BY layout, band, k
)
SELECT layout,
       CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_buckets,
       CAST(MAX(sz) AS BIGINT) AS max_bucket,
       CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs
FROM bu
GROUP BY layout
ORDER BY layout
"""
)


def orders_delta_bitpack_audit(sf_dir: str):
    """DELTA_BINARY_PACKED width audit — the Parquet encoder decision for
    a sorted key column: 128-value blocks over ``o_orderkey`` in key
    order, per-block max delta → bit width (``strlen(bin(max))``, the
    exact DuckDB-mirrorable form), histogrammed as (width_bits,
    n_blocks).  Key deltas in this layout are what make sorted layouts
    cheap to store; the histogram is the evidence.  Blocks contributing
    no delta rows (a trailing single-row block) are absent on both
    sides by construction."""
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey"])
    v = np.sort(
        pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
        .column("o_orderkey")
        .to_numpy(zero_copy_only=False)
    )
    rn = np.arange(1, len(v) + 1)
    deltas = v[1:] - v[:-1]
    drn = rn[1:]
    mask = (drn - 1) % 128 != 0  # first row of each block carries no delta
    blk = (drn[mask] - 1) // 128
    dd = deltas[mask]
    widths: dict[int, int] = {}
    for b in np.unique(blk):
        mx = int(dd[blk == b].max())
        w = max(1, mx.bit_length())
        widths[w] = widths.get(w, 0) + 1
    ks = sorted(widths)
    return pa.table(
        {
            "width_bits": pa.array(ks, pa.int64()),
            "n_blocks": pa.array([widths[k] for k in ks], pa.int64()),
        }
    )


ORDERS_DELTA_BITPACK_AUDIT_SQL = """
WITH s AS (
  SELECT o_orderkey AS v,
         ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
  FROM orders
), d AS (
  SELECT rn, (rn - 1) // 128 AS blk,
         v - LAG(v) OVER (ORDER BY rn) AS delta
  FROM s
), bw AS (
  SELECT blk, CAST(strlen(bin(MAX(delta))) AS BIGINT) AS width_bits
  FROM d WHERE (rn - 1) % 128 <> 0
  GROUP BY blk
)
SELECT width_bits, COUNT(*) AS n_blocks
FROM bw GROUP BY width_bits ORDER BY width_bits
"""


def events_fair_share_schedule_audit(sf_dir: str):
    """Round-robin fair-share scheduler audit — multi-tenant completion
    order when every tenant's queue drains one task per round (tenants
    cycled in user_id order): the closed-form finish position of each
    tenant's LAST task,

        finish(t) = Σ_u min(L_u, L_t − 1) + |{u ≤ t : L_u ≥ L_t}|

    (u ordered by user_id).  Exactly the arithmetic a fair-share executor
    admission report needs, exactly mirrored in SQL via a tenant
    self-join (tenant counts are tiny — the per-tenant aggregate is the
    only distributed step)."""
    from ray.data.aggregate import Count as _Count

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    counts = (
        ds.groupby("user_id").aggregate(_Count(alias_name="queue_len")).to_pandas()
    )
    counts = counts.sort_values("user_id").reset_index(drop=True)
    users = counts["user_id"].tolist()
    L = counts["queue_len"].to_numpy(np.int64)
    finish = np.empty(len(L), dtype=np.int64)
    for i in range(len(L)):
        k = L[i]
        finish[i] = int(np.minimum(L, k - 1).sum()) + int(
            ((L >= k) & (np.arange(len(L)) <= i)).sum()
        )
    return pa.table(
        {
            "user_id": pa.array(users),
            "queue_len": pa.array(L, pa.int64()),
            "last_finish_pos": pa.array(finish, pa.int64()),
        }
    )


EVENTS_FAIR_SHARE_SCHEDULE_AUDIT_SQL = """
WITH c AS (
  SELECT user_id, COUNT(*) AS queue_len FROM events GROUP BY user_id
)
SELECT t.user_id,
       CAST(t.queue_len AS BIGINT) AS queue_len,
       CAST((SELECT SUM(LEAST(u.queue_len, t.queue_len - 1)) FROM c u)
            + (SELECT COUNT(*) FROM c u
               WHERE u.queue_len >= t.queue_len AND u.user_id <= t.user_id)
            AS BIGINT) AS last_finish_pos
FROM c t
ORDER BY t.user_id
"""


def docs_merkle_root(sf_dir: str):
    """Merkle-tree integrity fingerprint of the corpus — what a 100 TB
    snapshot publishes so any replica can verify any doc with log(n)
    hashes.  Leaves = ``md5(doc_id || ':' || text)`` in doc_id order;
    each level pairs adjacent nodes as ``md5(left || right)`` (hex
    concatenation), an odd trailing node promotes unchanged.  Leaf
    hashing is the distributed step (per-block map); the fold above it
    touches only hashes (driver-side, O(n) tiny strings).  The oracle
    reproduces the identical tree as unrolled SQL levels — the
    docs_pagerank unroll discipline applied to hash folding.

    Output: one row (n_leaves, depth, root_md5)."""
    import hashlib

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def leaf(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(f"{i}:{s}".encode()).hexdigest()
            for i, s in zip(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist()
            )
        ]
        return pa.table(
            {"doc_id": t.column("doc_id"), "h": pa.array(hs, pa.string())}
        )

    lt = (
        pa.concat_tables(
            list(ds.map_batches(leaf, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            ))
        )
        .sort_by("doc_id")
    )
    level = lt.column("h").to_pylist()
    n_leaves = len(level)
    depth = 0
    while len(level) > 1:
        nxt = []
        for i in range(0, len(level) - 1, 2):
            nxt.append(hashlib.md5((level[i] + level[i + 1]).encode()).hexdigest())
        if len(level) % 2 == 1:
            nxt.append(level[-1])  # odd node promotes
        level = nxt
        depth += 1
    return pa.table(
        {
            "n_leaves": pa.array([n_leaves], pa.int64()),
            "depth": pa.array([depth], pa.int64()),
            "root_md5": pa.array(level, pa.string()),
        }
    )


def _merkle_sql(levels: int = 12) -> str:
    sql = """WITH l0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS i,
         md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h
  FROM documents)"""
    for k in range(1, levels + 1):
        p = k - 1
        sql += f""",
l{k} AS (
  SELECT a.i // 2 AS i,
         CASE WHEN b.h IS NULL THEN a.h ELSE md5(a.h || b.h) END AS h
  FROM l{p} a LEFT JOIN l{p} b ON b.i = a.i + 1 AND a.i % 2 = 0
  WHERE a.i % 2 = 0)"""
    return (
        sql
        + f"""
SELECT (SELECT COUNT(*) FROM l0) AS n_leaves,
       CAST(CEIL(LOG2(GREATEST((SELECT COUNT(*) FROM l0), 2))) AS BIGINT)
         AS depth,
       (SELECT h FROM l{levels}) AS root_md5"""
    )


DOCS_MERKLE_ROOT_SQL = _merkle_sql()


def docs_linkgraph_components(sf_dir: str):
    """Connected components over the synthetic md5 link graph with a FULL
    exact oracle — the first value-checked CC in the registry (the
    near-dup CC entries are rows-only because LSH pair sets are
    probabilistic; this graph is deterministic).  Uses the production
    machinery unchanged: ``stages/neardup.cluster_pairs`` distributed
    min-label propagation (labels never on the driver, change-count
    convergence, broadcast-guarded edge list) with a 16-round budget;
    the oracle unrolls the SAME min-label recurrence 16 SQL rounds —
    idempotent after the fixpoint, so equality is exact.

    Output: (doc_id, cluster_id = component min doc_id)."""
    from ...stages.neardup import cluster_pairs
    from ._q01_events_orders import _synth_link_edges

    edges, _n = _synth_link_edges(sf_dir)
    ids = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    pairs = edges.map_batches(
        lambda t: pa.table({"id_a": t.column("src"), "id_b": t.column("dst")}),
        batch_format="pyarrow",
    )
    return cluster_pairs(ids, pairs, max_rounds=16).sort("doc_id")


def _cc_sql(rounds: int = 16) -> str:
    sql = """WITH edges_raw AS (
  SELECT doc_id AS src,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || CAST(j.j AS VARCHAR)), 1, 8)) AS UBIGINT)
              % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
  FROM documents, LATERAL unnest(generate_series(0, 2)) AS j(j)
), edges AS (SELECT DISTINCT src, dst FROM edges_raw WHERE dst <> src),
und AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges
        UNION ALL SELECT dst, src FROM edges),
c0 AS MATERIALIZED (SELECT doc_id AS node, doc_id AS label FROM documents)"""
    # AS MATERIALIZED is load-bearing: each round references the previous
    # round twice, and DuckDB's default CTE inlining would expand c0 2^16
    # times (exhausting file handles on the parquet view)
    for k in range(1, rounds + 1):
        p = k - 1
        sql += f""",
c{k} AS MATERIALIZED (
  SELECT x.node,
         LEAST(x.label, COALESCE(MIN(y.label), x.label)) AS label
  FROM c{p} x
  LEFT JOIN und e ON e.a = x.node
  LEFT JOIN c{p} y ON y.node = e.b
  GROUP BY x.node, x.label)"""
    return (
        sql
        + f"""
SELECT node AS doc_id, label AS cluster_id
FROM c{rounds} ORDER BY doc_id"""
    )


DOCS_LINKGRAPH_COMPONENTS_SQL = _cc_sql()


def docs_bigram_lm_accuracy(sf_dir: str):
    """Bigram language-model next-token accuracy — the train/eval loop in
    miniature with EXACT arithmetic: the "model" is the corpus-global
    modal continuation of each token (ties broken lexicographically);
    evaluation replays every bigram position and scores whether the
    model's prediction matches, reported per lang in exact ppm.

    Distributed shape: bigram counting is per-block partial → one small
    groupby (vocab² keys); the argmax table is tiny and joins back into
    the same counts — no second corpus pass.  SQL mirrors with
    window-rank argmax + the same integer ppm floor."""
    import re

    tok_re = re.compile(r"[a-z0-9]+")

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def bigram_counts(t: pa.Table) -> pa.Table:
        import collections

        cnt: collections.Counter = collections.Counter()
        for lang, text in zip(
            t.column("lang").to_pylist(), t.column("text").to_pylist()
        ):
            toks = tok_re.findall((text or "").lower())
            for a, b in zip(toks, toks[1:]):
                cnt[(lang, a, b)] += 1
        keys = sorted(cnt)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "cur": pa.array([k[1] for k in keys], pa.string()),
                "nxt": pa.array([k[2] for k in keys], pa.string()),
                "n": pa.array([cnt[k] for k in keys], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(bigram_counts, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    counts = (
        parts.group_by(["lang", "cur", "nxt"])
        .aggregate([("n", "sum")])
        .rename_columns(["lang", "cur", "nxt", "n"])
    )
    # global model: per current-token modal next (summed over langs)
    gl = (
        counts.group_by(["cur", "nxt"])
        .aggregate([("n", "sum")])
        .rename_columns(["cur", "nxt", "n"])
        .to_pandas()
        .sort_values(["cur", "n", "nxt"], ascending=[True, False, True])
    )
    model = dict(zip(gl.drop_duplicates("cur")["cur"], gl.drop_duplicates("cur")["nxt"]))

    cdf = counts.to_pandas()
    cdf["correct"] = [
        n if model.get(c) == x else 0
        for c, x, n in zip(cdf["cur"], cdf["nxt"], cdf["n"])
    ]
    agg = cdf.groupby("lang", as_index=False).agg(
        n_positions=("n", "sum"), n_correct=("correct", "sum")
    )
    agg = agg.sort_values("lang")
    return pa.table(
        {
            "lang": pa.array(agg["lang"].tolist(), pa.string()),
            "n_positions": pa.array(agg["n_positions"].to_numpy(np.int64)),
            "n_correct": pa.array(agg["n_correct"].to_numpy(np.int64)),
            "accuracy_ppm": pa.array(
                (
                    agg["n_correct"].to_numpy(np.int64) * 1_000_000
                    // agg["n_positions"].to_numpy(np.int64)
                ),
                pa.int64(),
            ),
        }
    )


DOCS_BIGRAM_LM_ACCURACY_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS l
  FROM documents),
t AS (SELECT doc_id, lang, unnest(l) AS term,
             unnest(range(1, len(l)+1)) AS pos
      FROM d),
b AS (SELECT lang, term AS cur,
             lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM t),
c AS (SELECT lang, cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
      FROM b WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
model AS (
  SELECT cur, nxt AS pred FROM (
    SELECT cur, nxt, SUM(n) AS gn,
           ROW_NUMBER() OVER (PARTITION BY cur
                              ORDER BY SUM(n) DESC, nxt) AS rn
    FROM c GROUP BY cur, nxt)
  WHERE rn = 1)
SELECT c.lang,
       CAST(SUM(c.n) AS BIGINT) AS n_positions,
       CAST(SUM(CASE WHEN m.pred = c.nxt THEN c.n ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(SUM(CASE WHEN m.pred = c.nxt THEN c.n ELSE 0 END) * 1000000
            // SUM(c.n) AS BIGINT) AS accuracy_ppm
FROM c JOIN model m ON c.cur = m.cur
GROUP BY c.lang
ORDER BY c.lang
"""


def orders_parallelism_invariance_audit(sf_dir: str):
    """Determinism-under-parallelism SELF-AUDIT: the same integer-cents
    revenue aggregate executed twice inside one op at different block
    counts (4 vs 32) — different task boundaries, different reduction
    order — must produce byte-equal results, because every money kernel
    in this engine is integer.  Emits one row per layout with the
    identical checksum; the oracle computes the value once and expects
    it twice.  This is the north_rule's output-identity property as a
    standing, oracle-checked regression test rather than a bench-time
    assertion."""
    import pyarrow.compute as pc

    rows = []
    for label, nb in (("blocks4", 4), ("blocks32", 32)):
        ds = rd.read_parquet(
            _t(sf_dir, "orders"),
            columns=["o_totalprice"],
            override_num_blocks=nb,
        )

        def cents(t: pa.Table) -> pa.Table:
            c = pc.cast(
                pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)),
                pa.int64(),
            )
            return pa.table(
                {
                    "s": pa.array([pc.sum(c).as_py() or 0], pa.int64()),
                    "n": pa.array([t.num_rows], pa.int64()),
                }
            )

        parts = pa.concat_tables(
            list(
                ds.map_batches(cents, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"
                )
            )
        )
        rows.append(
            (
                label,
                int(pc.sum(parts["s"]).as_py()),
                int(pc.sum(parts["n"]).as_py()),
            )
        )
    return pa.table(
        {
            "layout": pa.array([r[0] for r in rows], pa.string()),
            "revenue_cents": pa.array([r[1] for r in rows], pa.int64()),
            "n_rows": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


ORDERS_PARALLELISM_INVARIANCE_AUDIT_SQL = """
WITH v AS (
  SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         COUNT(*) AS n_rows
  FROM orders
)
SELECT 'blocks32' AS layout, revenue_cents, n_rows FROM v
UNION ALL
SELECT 'blocks4', revenue_cents, n_rows FROM v
ORDER BY layout
"""


def events_user_haar_energy(sf_dir: str):
    """Two-level Haar wavelet energy per user over the event value
    stream (cents, ts order) — the multiresolution burst-detection
    feature next to the DFT-power op.  Level-1 pairs adjacent values:
    detail d = a − b, approx s = a + b; level-2 repeats on the approx
    stream.  Energies are Σ d² in exact int64; odd trailing elements
    drop at each level (both sides, by construction).

    Per-user groups are small; the fold is one numpy pass per group."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )

    def haar(g: pa.Table) -> pa.Table:
        uid = g.column("user_id")[0].as_py()
        order = np.argsort(
            pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False),
            kind="stable",
        )
        v = pc.cast(
            pc.floor(pc.add(pc.multiply(g.column("value"), 100.0), 0.5)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)[order]
        n = len(v)
        m1 = n // 2
        a, b = v[: 2 * m1 : 2], v[1 : 2 * m1 : 2]
        d1 = a - b
        s1 = a + b
        e1 = int((d1 * d1).sum())
        m2 = len(s1) // 2
        d2 = s1[: 2 * m2 : 2] - s1[1 : 2 * m2 : 2]
        e2 = int((d2 * d2).sum())
        return pa.table(
            {
                "user_id": pa.array([uid], g.schema.field("user_id").type),
                "n_events": pa.array([n], pa.int64()),
                "l1_energy": pa.array([e1], pa.int64()),
                "l2_energy": pa.array([e2], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(haar, batch_format="pyarrow")


EVENTS_USER_HAAR_ENERGY_SQL = """
WITH s AS (
  SELECT user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS i
  FROM events
), l1 AS (
  SELECT a.user_id, a.i // 2 AS j, a.c - b.c AS d, a.c + b.c AS s
  FROM s a JOIN s b ON a.user_id = b.user_id AND b.i = a.i + 1
  WHERE a.i % 2 = 0
), l2 AS (
  SELECT a.user_id, a.s - b.s AS d
  FROM l1 a JOIN l1 b ON a.user_id = b.user_id AND b.j = a.j + 1
  WHERE a.j % 2 = 0
), n AS (SELECT user_id, COUNT(*) AS n_events FROM s GROUP BY user_id)
SELECT n.user_id, n.n_events,
       CAST(COALESCE((SELECT SUM(d*d) FROM l1 WHERE l1.user_id = n.user_id), 0)
            AS BIGINT) AS l1_energy,
       CAST(COALESCE((SELECT SUM(d*d) FROM l2 WHERE l2.user_id = n.user_id), 0)
            AS BIGINT) AS l2_energy
FROM n
ORDER BY n.user_id
"""


def events_stream_disorder_audit(sf_dir: str):
    """Stream-disorder measurement — the statistic that justifies every
    watermark setting: comparing ARRIVAL order (event_id) against EVENT
    time (ts), how many records arrive late, and how late.  A record is
    late when its ts is behind the running max ts of everything that
    arrived before it; lateness is that gap in microseconds.

    Per-block partials don't work for a running max over a global order,
    so the op follows the two-phase scan discipline (stages/scan.py):
    block-level (max ts, per-row data) partials with a driver prefix-max
    stitch — one pass, O(blocks) driver work.  Here the whole projection
    is two int64 columns, so the stitch runs on the driver directly.

    Output: one row — n_events, n_late, max_lateness_us,
    total_lateness_us, p_late_ppm."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts"])
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    order = np.argsort(
        t.column("event_id").to_numpy(zero_copy_only=False), kind="stable"
    )
    ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)[order]
    runmax = np.maximum.accumulate(ts)
    # a row is late vs the running max BEFORE it arrived
    prev_max = np.concatenate([[np.iinfo(np.int64).min], runmax[:-1]])
    late = ts < prev_max
    lateness = np.where(late, prev_max - ts, 0)
    n = len(ts)
    n_late = int(late.sum())
    return pa.table(
        {
            "n_events": pa.array([n], pa.int64()),
            "n_late": pa.array([n_late], pa.int64()),
            "max_lateness_us": pa.array([int(lateness.max()) if n else 0], pa.int64()),
            "total_lateness_us": pa.array([int(lateness.sum())], pa.int64()),
            "p_late_ppm": pa.array(
                [n_late * 1_000_000 // n if n else 0], pa.int64()
            ),
        }
    )


EVENTS_STREAM_DISORDER_AUDIT_SQL = """
WITH s AS (
  SELECT epoch_us(ts) AS t,
         MAX(epoch_us(ts)) OVER (
           ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_max
  FROM events
)
SELECT COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN t < prev_max THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(COALESCE(MAX(CASE WHEN t < prev_max THEN prev_max - t END), 0)
            AS BIGINT) AS max_lateness_us,
       CAST(COALESCE(SUM(CASE WHEN t < prev_max THEN prev_max - t ELSE 0 END), 0)
            AS BIGINT) AS total_lateness_us,
       CAST(SUM(CASE WHEN t < prev_max THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS p_late_ppm
FROM s
"""


def web_admission_report(sf_dir: str):
    """The COMPOSED admission pipeline — every gate a crawled page passes
    before entering the corpus, in one chained Dataset plan: robots.txt
    policy (this module's gate), exact keyed dedup (first-wins winner
    map, the flagship discipline), and C4/Gopher quality (the production
    ``quality_flags_stage``, composing via column passthrough).  Reported
    per lang: totals, per-gate rejections, and the admitted remainder
    (admitted = allowed ∧ ¬dup ∧ kept).

    Shape: ONE text scan (the quality stage), a narrow 3-column side
    aggregate for the dup winner map (broadcast, dup keys only), robots
    evaluated in-closure — no joins, no driver row loops; the per-lang
    fold is partial-then-merge."""
    import ray
    import pyarrow.compute as pc

    from ...functions.robots import parse_robots
    from ...stages.text_analysis import quality_flags_stage

    rules = parse_robots(_ROBOTS_TXT, agent="graftbot")

    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars", "text"]
    )
    q = quality_flags_stage(ds)  # + lang, n_chars passthrough

    # dup winner map from a narrow side read (same keys as
    # dedup_flag_documents: first doc_id per (lang, n_chars), dup keys only)
    side = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )
    firsts = (
        side.groupby(["lang", "n_chars"])
        .aggregate(Min("doc_id", alias_name="first_id"), Count(alias_name="n"))
        .to_pandas()
    )
    firsts = firsts[firsts["n"] > 1]
    comp = firsts["lang"].astype(str) + "|" + firsts["n_chars"].astype(str)
    dup_ref = ray.put(
        {
            "keys": pa.array(comp.tolist(), pa.string()),
            "first": pa.array(firsts["first_id"].to_numpy(), pa.int64()),
        }
    )

    def fold(t: pa.Table) -> pa.Table:
        import collections

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        langs = t.column("lang").to_pylist()
        kept = t.column("kept").to_numpy(zero_copy_only=False)
        # robots verdicts (same arithmetic as docs_robots_gate)
        allowed = np.ones(len(ids), dtype=bool)
        best_len = np.full(len(ids), -1, dtype=np.int64)
        paths = np.array(
            [f"/{l}/{i % 7}/p{i}" for l, i in zip(langs, ids)], dtype=str
        )
        for is_allow, prefix in rules:
            m = np.char.startswith(paths, prefix)
            ln = len(prefix)
            up = m & ((ln > best_len) | ((ln == best_len) & is_allow & ~allowed))
            best_len[up] = ln
            allowed[up] = is_allow
        # dup probe
        w = ray.get(dup_ref)
        comp_b = pa.array(
            [f"{l}|{n}" for l, n in zip(langs, t.column("n_chars").to_pylist())],
            pa.string(),
        )
        idx = pc.index_in(comp_b, value_set=w["keys"])
        firsts_of = pc.take(w["first"], idx).to_numpy(zero_copy_only=False)
        is_dup = pc.is_valid(idx).to_numpy(zero_copy_only=False) & (
            ids != np.where(np.isnan(firsts_of.astype(np.float64)), -1, firsts_of)
        )
        admitted = allowed & ~is_dup & kept
        agg: collections.Counter = collections.Counter()
        for l, a, d, k, ad in zip(langs, allowed, is_dup, kept, admitted):
            agg[(l, "n_docs")] += 1
            agg[(l, "n_robots_blocked")] += int(not a)
            agg[(l, "n_dup")] += int(d)
            agg[(l, "n_low_quality")] += int(not k)
            agg[(l, "n_admitted")] += int(ad)
        ls = sorted({l for l, _ in agg})
        cols = ["n_docs", "n_robots_blocked", "n_dup", "n_low_quality", "n_admitted"]
        data = {"lang": pa.array(ls, pa.string())}
        for c in cols:
            data[c] = pa.array([agg[(l, c)] for l in ls], pa.int64())
        return pa.table(data)

    parts = pa.concat_tables(
        list(q.map_batches(fold, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ))
    )
    return (
        parts.group_by("lang")
        .aggregate(
            [
                ("n_docs", "sum"),
                ("n_robots_blocked", "sum"),
                ("n_dup", "sum"),
                ("n_low_quality", "sum"),
                ("n_admitted", "sum"),
            ]
        )
        .rename_columns(
            ["lang", "n_docs", "n_robots_blocked", "n_dup", "n_low_quality", "n_admitted"]
        )
        .sort_by("lang")
    )


WEB_ADMISSION_REPORT_SQL = """
WITH robots AS (
  SELECT doc_id, lang,
         COALESCE((
           SELECT r.is_allow = 1
           FROM (VALUES (0, '/en/'), (1, '/en/3/'), (0, '/de/5/'),
                        (1, '/de/5/p12'), (0, '/zh/'), (1, '/zh/1/'),
                        (0, '/es/4/'), (1, '/es/4/')) r(is_allow, prefix)
           WHERE substr('/' || lang || '/' || CAST(doc_id % 7 AS VARCHAR)
                        || '/p' || CAST(doc_id AS VARCHAR),
                        1, length(r.prefix)) = r.prefix
           ORDER BY length(r.prefix) DESC, r.is_allow DESC LIMIT 1
         ), TRUE) AS allowed
  FROM documents
), dup AS (
  SELECT doc_id,
         (row_number() OVER (PARTITION BY lang, n_chars ORDER BY doc_id)) > 1
           AS is_dup
  FROM documents
), qb AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
         length(regexp_replace(text, '\\s', '', 'g')) AS wc,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
             x -> x IN ('the','a','an','of','to','in','and','is','on','for')))
           AS n_stop,
         len(list_distinct(list_filter(
             string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')))
           AS n_distinct
  FROM documents
), qm AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words = 0 THEN 0
              ELSE CAST(FLOOR(wc * 1000000.0 / n_words) AS BIGINT) END AS mwl_u,
         CASE WHEN n_words = 0 THEN 0
              ELSE CAST(FLOOR(n_stop * 1000000.0 / n_words) AS BIGINT) END
           AS stop_u,
         CASE WHEN n_words = 0 THEN 0
              ELSE CAST(FLOOR((n_words - n_distinct) * 1000000.0 / n_words)
                        AS BIGINT) END AS dupword_u
  FROM qb
), quality AS (
  SELECT doc_id,
         (n_words BETWEEN 20 AND 100000
          AND mwl_u BETWEEN 2000000 AND 12000000
          AND stop_u >= 10000 AND dupword_u <= 900000) AS kept
  FROM qm
)
SELECT r.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN NOT r.allowed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_robots_blocked,
       CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN NOT q.kept THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_quality,
       CAST(SUM(CASE WHEN r.allowed AND NOT d.is_dup AND q.kept
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
FROM robots r
JOIN dup d ON r.doc_id = d.doc_id
JOIN quality q ON r.doc_id = q.doc_id
GROUP BY r.lang
ORDER BY r.lang
"""


def events_type_regex_cohort(sf_dir: str):
    """Complex-event-pattern (CEP) cohort via REGEX over the per-user
    type sequence: each user's events (ts order, event_id tie-break)
    collapse to a character string (click→c, view→v, purchase→p,
    signup→s, error→e) and three Kleene patterns classify journeys —
    `v+c` (browse-then-click), `c[^p]*p` (click eventually converts),
    `e{2,}` (repeated errors).  Exactly the pattern-match layer CEP
    engines bolt onto streams, here as one per-user fold + compiled
    regexes; the oracle rebuilds the identical string with ORDERED
    string_agg and DuckDB's regexp_matches.

    Output per pattern: n_users_matched, n_users_total."""
    import re

    pats = {
        "browse_click": re.compile(r"v+c"),
        "click_converts": re.compile(r"c[^p]*p"),
        "error_streak": re.compile(r"e{2,}"),
    }
    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def seq(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = np.lexsort(
            (
                g.column("event_id").to_numpy(zero_copy_only=False),
                pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False),
            )
        )
        types = np.asarray(g.column("event_type").to_pylist(), dtype=object)[order]
        s = "".join(t[0] for t in types)  # first letters are distinct here
        return pa.table(
            {
                "matched_bc": pa.array([int(bool(pats["browse_click"].search(s)))], pa.int64()),
                "matched_cc": pa.array([int(bool(pats["click_converts"].search(s)))], pa.int64()),
                "matched_es": pa.array([int(bool(pats["error_streak"].search(s)))], pa.int64()),
                "one": pa.array([1], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.groupby("user_id")
            .map_groups(seq, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    import pyarrow.compute as pc

    total = int(pc.sum(parts["one"]).as_py())
    rows = [
        ("browse_click", int(pc.sum(parts["matched_bc"]).as_py())),
        ("click_converts", int(pc.sum(parts["matched_cc"]).as_py())),
        ("error_streak", int(pc.sum(parts["matched_es"]).as_py())),
    ]
    return pa.table(
        {
            "pattern": pa.array([r[0] for r in rows], pa.string()),
            "n_users_matched": pa.array([r[1] for r in rows], pa.int64()),
            "n_users_total": pa.array([total] * 3, pa.int64()),
        }
    )


EVENTS_TYPE_REGEX_COHORT_SQL = """
WITH s AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
), m AS (
  SELECT 'browse_click' AS pattern,
         CAST(SUM(CASE WHEN regexp_matches(seq, 'v+c') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_users_matched,
         COUNT(*) AS n_users_total
  FROM s
  UNION ALL
  SELECT 'click_converts',
         CAST(SUM(CASE WHEN regexp_matches(seq, 'c[^p]*p') THEN 1 ELSE 0 END)
              AS BIGINT), COUNT(*)
  FROM s
  UNION ALL
  SELECT 'error_streak',
         CAST(SUM(CASE WHEN regexp_matches(seq, 'e{2,}') THEN 1 ELSE 0 END)
              AS BIGINT), COUNT(*)
  FROM s
)
SELECT pattern, n_users_matched, n_users_total FROM m ORDER BY pattern
"""


def events_idempotency_retry_audit(sf_dir: str):
    """Ingestion retry detector — at-least-once delivery shows up as the
    SAME logical event arriving again within a short horizon.  Logical
    key = (user_id, event_type, value-cents); an event is a suspected
    RETRY when its immediate predecessor under that key is ≤ 60 s older.
    Per-key lag is exact after one (key, ts) sort; reported per
    event_type with retry fraction in integer ppm.

    Scale shape: the (user, type, cents, ts) projection rides one
    groupby; per-group numpy diff; the final per-type fold is tiny."""
    import pyarrow.compute as pc

    H_US = 60_000_000

    ds = rd.read_parquet(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "value", "ts"]
    )

    def per_user(g: pa.Table) -> pa.Table:
        import collections

        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(g.column("value"), 100.0), 0.5)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        types = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((ts, cents, types.astype(str)))
        t_s, c_s, ty_s = ts[order], cents[order], types[order]
        same_key = np.zeros(len(ts), dtype=bool)
        if len(ts) > 1:
            same_key[1:] = (ty_s[1:] == ty_s[:-1]) & (c_s[1:] == c_s[:-1])
        retry = same_key & np.concatenate(
            [[False], (t_s[1:] - t_s[:-1]) <= H_US]
        )
        agg: collections.Counter = collections.Counter()
        tot: collections.Counter = collections.Counter()
        for t, r in zip(ty_s, retry):
            tot[t] += 1
            agg[t] += int(r)
        ks = sorted(tot)
        return pa.table(
            {
                "event_type": pa.array(ks, pa.string()),
                "n_events": pa.array([tot[k] for k in ks], pa.int64()),
                "n_retries": pa.array([agg[k] for k in ks], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.groupby("user_id")
            .map_groups(per_user, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    merged = (
        parts.group_by("event_type")
        .aggregate([("n_events", "sum"), ("n_retries", "sum")])
        .rename_columns(["event_type", "n_events", "n_retries"])
        .sort_by("event_type")
    )
    ne = merged.column("n_events").to_numpy(zero_copy_only=False)
    nr = merged.column("n_retries").to_numpy(zero_copy_only=False)
    return merged.append_column(
        "retry_ppm", pa.array(nr * 1_000_000 // ne, pa.int64())
    )


EVENTS_IDEMPOTENCY_RETRY_AUDIT_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS t
  FROM events
), lagged AS (
  SELECT event_type, t,
         LAG(t) OVER (PARTITION BY user_id, event_type, cents ORDER BY t)
           AS prev_t
  FROM s
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN prev_t IS NOT NULL AND t - prev_t <= 60000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_retries,
       CAST(SUM(CASE WHEN prev_t IS NOT NULL AND t - prev_t <= 60000000
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS retry_ppm
FROM lagged
GROUP BY event_type
ORDER BY event_type
"""


def docs_lsh_pr_audit(sf_dir: str):
    """LSH PRECISION/RECALL audit against exact ground truth — the
    evaluation every near-dup deployment owes its corpus: candidates =
    pairs sharing ≥1 band under the production 4×2 layout (exact 8-value
    signatures), truth = pairs with token-set Jaccard ≥ 1/2 computed
    EXACTLY.  Reports TP / FP / FN and precision/recall in integer ppm.

    Scale note (documented, enforced by usage): exact all-pairs truth is
    an O(n²) AUDIT step — run it on a sample or one partition, never the
    full corpus; candidates come from the same signature machinery the
    production pass shuffles on.  Here the bitmap trick makes truth
    cheap: the corpus vocabulary is tiny, so token sets pack into uint64
    rows and a popcount matrix gives every pairwise intersection at
    once."""
    from ._q09_docs_events import _minhash8_block

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow"))).sort_by(
        "doc_id"
    )
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    texts = t.column("text").to_pylist()

    # exact truth: pack token sets into bit rows over the global vocab
    sets = [set((s or "").split()) - {""} for s in texts]
    vocab = sorted(set().union(*sets)) if sets else []
    ix = {w: i for i, w in enumerate(vocab)}
    words = (len(vocab) + 63) // 64
    bm = np.zeros((len(sets), words), dtype=np.uint64)
    sizes = np.zeros(len(sets), dtype=np.int64)
    for r, s in enumerate(sets):
        sizes[r] = len(s)
        for w in s:
            j = ix[w]
            bm[r, j >> 6] |= np.uint64(1 << (j & 63))
    _POP = np.array([bin(x).count("1") for x in range(256)], dtype=np.int64)

    def inter_row(r: int) -> np.ndarray:
        x = bm & bm[r]
        return _POP[x.view(np.uint8)].reshape(len(sets), -1).sum(axis=1)

    true_pairs = set()
    for r in range(len(sets)):
        inter = inter_row(r)
        union = sizes + sizes[r] - inter
        ok = (inter * 2 >= union) & (union > 0)
        for c in np.nonzero(ok)[0]:
            if c > r:
                true_pairs.add((int(ids[r]), int(ids[c])))

    # candidates from the production signatures, 4x2 bands
    sig = _minhash8_block(t)
    cand = set()
    import collections

    for band in range(4):
        buckets: dict = collections.defaultdict(list)
        k1 = sig[f"m{2 * band}"].to_numpy(zero_copy_only=False)
        k2 = sig[f"m{2 * band + 1}"].to_numpy(zero_copy_only=False)
        sid = sig["doc_id"].to_numpy(zero_copy_only=False)
        for i, a, b in zip(sid, k1, k2):
            buckets[(int(a), int(b))].append(int(i))
        for members in buckets.values():
            members.sort()
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    cand.add((members[x], members[y]))

    tp = len(cand & true_pairs)
    fp = len(cand - true_pairs)
    fn = len(true_pairs - cand)
    prec = tp * 1_000_000 // (tp + fp) if (tp + fp) else 0
    rec = tp * 1_000_000 // (tp + fn) if (tp + fn) else 0
    return pa.table(
        {
            "n_true_pairs": pa.array([len(true_pairs)], pa.int64()),
            "n_candidates": pa.array([len(cand)], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
            "fp": pa.array([fp], pa.int64()),
            "fn": pa.array([fn], pa.int64()),
            "precision_ppm": pa.array([prec], pa.int64()),
            "recall_ppm": pa.array([rec], pa.int64()),
        }
    )


DOCS_LSH_PR_AUDIT_SQL = (
    "WITH "
    + _MINHASH_SIG_SQL_CORE
    + """,
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS i, b.doc_id AS j, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
truth AS (
  SELECT i, j FROM inter
  JOIN sz sa ON sa.doc_id = i
  JOIN sz sb ON sb.doc_id = j
  WHERE 2 * c >= sa.n + sb.n - c),
cand AS (
  SELECT a.doc_id AS i, b.doc_id AS j
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
   AND ((a.m0 = b.m0 AND a.m1 = b.m1) OR (a.m2 = b.m2 AND a.m3 = b.m3)
     OR (a.m4 = b.m4 AND a.m5 = b.m5) OR (a.m6 = b.m6 AND a.m7 = b.m7))),
cnt AS (
  SELECT (SELECT COUNT(*) FROM truth) AS n_true_pairs,
         (SELECT COUNT(*) FROM cand) AS n_candidates,
         (SELECT COUNT(*) FROM cand JOIN truth USING (i, j)) AS tp)
SELECT n_true_pairs, n_candidates, tp,
       n_candidates - tp AS fp,
       n_true_pairs - tp AS fn,
       CASE WHEN n_candidates > 0 THEN tp * 1000000 // n_candidates
            ELSE 0 END AS precision_ppm,
       CASE WHEN n_true_pairs > 0 THEN tp * 1000000 // n_true_pairs
            ELSE 0 END AS recall_ppm
FROM cnt
"""
)


def events_session_gap_sweep(sf_dir: str):
    """Session-timeout PARAMETER SWEEP — what the sessionize op's gap
    constant should be: for timeouts of 15 / 30 / 60 minutes, the exact
    session count (per-user gap-exceedances + one per active user), the
    mean session length in events (µ-scaled), and the count of
    single-event sessions.  One sorted pass per user yields the gap
    vector; every sweep point reuses it (count gaps > G) — the
    watermark-sweep discipline applied to sessionization."""
    import pyarrow.compute as pc

    GAPS_US = {"g15m": 900_000_000, "g30m": 1_800_000_000, "g60m": 3_600_000_000}

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def per_user(g: pa.Table) -> pa.Table:
        ts = np.sort(
            pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        )
        gaps = np.diff(ts)
        rows = {"n_events": pa.array([len(ts)] * 3, pa.int64())}
        labels, sess, singles = [], [], []
        for lab, G in GAPS_US.items():
            brk = gaps > G
            n_sessions = int(brk.sum()) + 1
            # session lengths: split sizes between breaks
            idx = np.nonzero(brk)[0]
            bounds = np.concatenate([[0], idx + 1, [len(ts)]])
            lens = np.diff(bounds)
            labels.append(lab)
            sess.append(n_sessions)
            singles.append(int((lens == 1).sum()))
        return pa.table(
            {
                "gap": pa.array(labels, pa.string()),
                "n_sessions": pa.array(sess, pa.int64()),
                "n_single": pa.array(singles, pa.int64()),
                "n_events": rows["n_events"],
            }
        )

    parts = pa.concat_tables(
        list(
            ds.groupby("user_id")
            .map_groups(per_user, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    merged = (
        parts.group_by("gap")
        .aggregate([("n_sessions", "sum"), ("n_single", "sum"), ("n_events", "sum")])
        .rename_columns(["gap", "n_sessions", "n_single", "n_events"])
        .sort_by("gap")
    )
    ns = merged.column("n_sessions").to_numpy(zero_copy_only=False)
    ne = merged.column("n_events").to_numpy(zero_copy_only=False)
    return merged.append_column(
        "mean_len_u", pa.array(ne * 1_000_000 // ns, pa.int64())
    )


EVENTS_SESSION_GAP_SWEEP_SQL = """
WITH g AS (
  SELECT user_id, epoch_us(ts) AS t,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
  FROM events
), sweeps(gap, thr) AS (
  VALUES ('g15m', 900000000), ('g30m', 1800000000), ('g60m', 3600000000)
), marks AS (
  SELECT s.gap, g.user_id, g.t,
         CASE WHEN g.gap_us IS NULL OR g.gap_us > s.thr THEN 1 ELSE 0 END
           AS is_start
  FROM g CROSS JOIN sweeps s
), sessions AS (
  SELECT gap, user_id,
         SUM(is_start) OVER (PARTITION BY gap, user_id ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
), lens AS (
  SELECT gap, user_id, sid, COUNT(*) AS len
  FROM sessions GROUP BY gap, user_id, sid
)
SELECT gap,
       COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
       CAST(SUM(len) AS BIGINT) AS n_events,
       CAST(SUM(len) * 1000000 // COUNT(*) AS BIGINT) AS mean_len_u
FROM lens
GROUP BY gap
ORDER BY gap
"""


def orders_fiscal_445_revenue(sf_dir: str):
    """Revenue by 4-4-5 FISCAL calendar period — the retail/BI calendar
    mapping (13-week quarters split 4+4+5) every reporting stack needs
    and no date_trunc provides.  Pure integer arithmetic from a fixed
    Monday epoch (1994-01-03): week = days-since-epoch // 7, fiscal year
    = 1994 + week // 52, period = 3·(w%52 // 13) + {1,2,3 by w%13 <
    4/8/13} — identical expressions both sides, money in exact cents.

    Per-block partial aggregation into (fy, period) cells → tiny final
    groupby; the calendar math is vectorized column arithmetic."""
    import pyarrow.compute as pc

    EPOCH_US = 757_555_200_000_000  # 1994-01-03 00:00:00 UTC (a Monday)

    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderdate", "o_totalprice"]
    )

    def cells(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        week = (us - EPOCH_US) // 86_400_000_000 // 7
        fy = 1994 + week // 52
        wic = week % 52
        w13 = wic % 13
        period = (wic // 13) * 3 + np.where(w13 < 4, 1, np.where(w13 < 8, 2, 3))
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t.column("o_totalprice"), 100.0), 0.5)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        key = fy * 100 + period
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        cnts = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cents)
        np.add.at(cnts, inv, 1)
        return pa.table(
            {
                "fy": pa.array(uk // 100, pa.int64()),
                "period": pa.array(uk % 100, pa.int64()),
                "revenue_cents": pa.array(sums, pa.int64()),
                "n_orders": pa.array(cnts, pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(cells, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    return (
        parts.group_by(["fy", "period"])
        .aggregate([("revenue_cents", "sum"), ("n_orders", "sum")])
        .rename_columns(["fy", "period", "revenue_cents", "n_orders"])
        .sort_by([("fy", "ascending"), ("period", "ascending")])
    )


ORDERS_FISCAL_445_REVENUE_SQL = """
WITH f AS (
  SELECT (epoch_us(o_orderdate) - 757555200000000) // 86400000000 // 7
           AS week,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), m AS (
  SELECT 1994 + week // 52 AS fy,
         ((week % 52) // 13) * 3
           + CASE WHEN (week % 52) % 13 < 4 THEN 1
                  WHEN (week % 52) % 13 < 8 THEN 2
                  ELSE 3 END AS period,
         cents
  FROM f
)
SELECT fy, period,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_orders
FROM m
GROUP BY fy, period
ORDER BY fy, period
"""


def part_luhn_checkdigit_census(sf_dir: str):
    """Luhn check-digit assignment census — the checksum discipline of
    real SKU/EAN/credit identifiers applied to the part catalog: compute
    each part key's Luhn check digit (double every other digit from the
    right, fold >9 by −9, check = (10 − sum mod 10) mod 10) and census
    the digit distribution — the sanity report a catalog-ingest gate
    publishes before accepting external identifiers.  Pure integer digit
    arithmetic both sides (no string ops on the Ray side; the oracle uses
    //10^i % 10 with a bounded lateral index)."""
    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey"])

    def census(t: pa.Table) -> pa.Table:
        import collections

        cnt: collections.Counter = collections.Counter()
        for k in t.column("p_partkey").to_pylist():
            s, pos, n = 0, 0, int(k)
            if n == 0:
                digs = [0]
            else:
                digs = []
                while n:
                    digs.append(n % 10)
                    n //= 10
            for pos, d in enumerate(digs):  # digs[0] = rightmost
                if pos % 2 == 0:
                    d = 2 * d
                    if d > 9:
                        d -= 9
                s += d
            cnt[(10 - s % 10) % 10] += 1
        ks = sorted(cnt)
        return pa.table(
            {
                "check_digit": pa.array(ks, pa.int64()),
                "n_parts": pa.array([cnt[k] for k in ks], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(census, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    return (
        parts.group_by("check_digit")
        .aggregate([("n_parts", "sum")])
        .rename_columns(["check_digit", "n_parts"])
        .sort_by("check_digit")
    )


PART_LUHN_CHECKDIGIT_CENSUS_SQL = """
WITH d AS (
  SELECT p_partkey, j.i AS i,
         (p_partkey // CAST(POWER(10, j.i) AS BIGINT)) % 10 AS dig
  FROM part, LATERAL unnest(generate_series(0, 9)) AS j(i)
  WHERE j.i = 0 OR p_partkey >= CAST(POWER(10, j.i) AS BIGINT)
), folded AS (
  SELECT p_partkey,
         SUM(CASE WHEN i % 2 = 0
                  THEN CASE WHEN 2 * dig > 9 THEN 2 * dig - 9 ELSE 2 * dig END
                  ELSE dig END) AS s
  FROM d GROUP BY p_partkey
)
SELECT CAST((10 - s % 10) % 10 AS BIGINT) AS check_digit,
       COUNT(*) AS n_parts
FROM folded
GROUP BY 1
ORDER BY check_digit
"""


def lineitem_xyz_demand_classes(sf_dir: str):
    """XYZ demand-variability classification (the inventory-planning
    counterpart of the ABC value classes already in the registry): per
    part, the coefficient of variation of its per-order quantities —
    cv_u = floor(1e6 · sqrt(n·Σx² − (Σx)²) / (sqrt(n) · Σx)) — binned
    X (< 0.095), Y (< 0.11), Z (steady → erratic demand; thresholds sit
    inside this corpus's observed 0.06–0.19 cv band so the classes
    discriminate).  Sums are exact
    int64; the one float expression (sqrt ∘ divide ∘ floor) is written
    identically on both sides, and IEEE sqrt/division are correctly
    rounded in both engines — the Wilson-bound discipline.

    Parts with a single observation have undefined cv → class 'N'
    (reported, not dropped).  Distributed shape: per-block (part, n, Σx,
    Σx²) partials → small groupby → tiny driver classify."""
    import math

    import pyarrow.compute as pc

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        q = pc.cast(t.column("l_quantity"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        uk, inv = np.unique(pk, return_inverse=True)
        n = np.zeros(len(uk), dtype=np.int64)
        sx = np.zeros(len(uk), dtype=np.int64)
        sxx = np.zeros(len(uk), dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(sx, inv, q)
        np.add.at(sxx, inv, q * q)
        return pa.table(
            {
                "pk": pa.array(uk, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "sx": pa.array(sx, pa.int64()),
                "sxx": pa.array(sxx, pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    m = (
        parts.group_by("pk")
        .aggregate([("n", "sum"), ("sx", "sum"), ("sxx", "sum")])
        .rename_columns(["pk", "n", "sx", "sxx"])
    )
    import collections

    cnt: collections.Counter = collections.Counter()
    for n, sx, sxx in zip(
        m.column("n").to_pylist(),
        m.column("sx").to_pylist(),
        m.column("sxx").to_pylist(),
    ):
        if n < 2 or sx == 0:
            cnt["N"] += 1
            continue
        cv_u = math.floor(
            1_000_000.0
            * math.sqrt(float(n * sxx - sx * sx))
            / (math.sqrt(float(n)) * float(sx))
        )
        if cv_u < 95_000:
            cnt["X"] += 1
        elif cv_u < 110_000:
            cnt["Y"] += 1
        else:
            cnt["Z"] += 1
    ks = sorted(cnt)
    return pa.table(
        {
            "xyz_class": pa.array(ks, pa.string()),
            "n_parts": pa.array([cnt[k] for k in ks], pa.int64()),
        }
    )


LINEITEM_XYZ_DEMAND_CLASSES_SQL = """
WITH s AS (
  SELECT l_partkey AS pk,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS sxx
  FROM lineitem GROUP BY 1
), c AS (
  SELECT CASE
           WHEN n < 2 OR sx = 0 THEN 'N'
           WHEN FLOOR(1000000.0 * sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      / (sqrt(CAST(n AS DOUBLE)) * CAST(sx AS DOUBLE)))
                < 95000 THEN 'X'
           WHEN FLOOR(1000000.0 * sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                      / (sqrt(CAST(n AS DOUBLE)) * CAST(sx AS DOUBLE)))
                < 110000 THEN 'Y'
           ELSE 'Z'
         END AS xyz_class
  FROM s
)
SELECT xyz_class, COUNT(*) AS n_parts
FROM c GROUP BY 1 ORDER BY xyz_class
"""


def lineitem_rounding_mode_drift_audit(sf_dir: str):
    """Rounding-mode DRIFT audit — the measurement behind this repo's
    money-kernel rule (CLAUDE.md: DuckDB ROUND is half-away-from-zero,
    pyarrow's is half-to-even): over the price grid, per returnflag, how
    many values land on exact .005 ties and how many cents the two
    roundings drift apart.  Both modes are computed at CENTS granularity
    on the identical double (x·100, one IEEE multiply), so both engines
    agree bit-for-bit on BOTH modes: half-away = floor(x·100 + 0.5),
    half-even = round-half-to-even(x·100).  The drift Σ(away − even) is
    the reconciliation error a mixed-engine pipeline would silently
    accumulate."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_returnflag", "l_extendedprice"]
    )

    def partial(t: pa.Table) -> pa.Table:
        x100 = pc.multiply(t.column("l_extendedprice"), 100.0)
        away = pc.cast(pc.floor(pc.add(x100, 0.5)), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        even = pc.cast(
            pc.round(x100, 0, round_mode="half_to_even"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        rf = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        diff = away != even
        uk = np.unique(rf.astype(str))
        rows = {"l_returnflag": [], "n_rows": [], "n_diff": [], "drift_cents": []}
        for k in uk:
            m = rf == k
            rows["l_returnflag"].append(str(k))
            rows["n_rows"].append(int(m.sum()))
            rows["n_diff"].append(int((diff & m).sum()))
            rows["drift_cents"].append(int((away[m] - even[m]).sum()))
        return pa.table(
            {
                "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "n_diff": pa.array(rows["n_diff"], pa.int64()),
                "drift_cents": pa.array(rows["drift_cents"], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    return (
        parts.group_by("l_returnflag")
        .aggregate([("n_rows", "sum"), ("n_diff", "sum"), ("drift_cents", "sum")])
        .rename_columns(["l_returnflag", "n_rows", "n_diff", "drift_cents"])
        .sort_by("l_returnflag")
    )


LINEITEM_ROUNDING_MODE_DRIFT_AUDIT_SQL = """
WITH r AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS away,
         CAST(round_even(l_extendedprice * 100, 0) AS BIGINT) AS even
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN away <> even THEN 1 ELSE 0 END) AS BIGINT)
         AS n_diff,
       CAST(SUM(away - even) AS BIGINT) AS drift_cents
FROM r
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def part_name_soundex_blocking(sf_dir: str):
    """Soundex phonetic blocking census over part names — the third
    blocking primitive next to SNM (sorted neighborhood) and Myers
    edit-distance linkage: names collapse to a phonetic key
    (functions/phonetic.py, the simple American variant) and the census
    shows block sizes — what a phonetic pre-pass would feed the exact
    verifier.  The oracle re-implements soundex IN SQL (translate +
    per-digit run collapse; DuckDB's RE2 has no pattern backreferences,
    so runs collapse digit-by-digit — equal-adjacent codes are
    same-digit runs, making the two formulations identical)."""
    from ...functions.phonetic import soundex

    ds = rd.read_parquet(_t(sf_dir, "part"), columns=["p_name"])

    def keyed(t: pa.Table) -> pa.Table:
        names = t.column("p_name").to_pylist()
        return pa.table(
            {
                "sdx": pa.array([soundex(n) for n in names], pa.string()),
                "p_name": pa.array(names, pa.string()),
            }
        )

    pairs = pa.concat_tables(
        list(
            ds.map_batches(keyed, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    counts = (
        pairs.group_by("sdx").aggregate([("p_name", "count")])
        .rename_columns(["sdx", "n_parts"])
    )
    distinct = (
        pairs.group_by(["sdx", "p_name"]).aggregate([])
        .group_by("sdx").aggregate([("p_name", "count")])
        .rename_columns(["sdx", "n_names"])
    )
    return counts.join(
        distinct, keys="sdx", join_type="inner"
    ).sort_by("sdx")


def _soundex_sql_expr(col: str) -> str:
    inner = (
        f"translate({col}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
        f" '01230120022455012623010202')"
    )
    for d in "0123456":
        inner = f"regexp_replace({inner}, '{d}{{2,}}', '{d}', 'g')"
    return (
        f"CASE WHEN {col} = '' THEN '' ELSE substr({col},1,1) || "
        f"substr(replace(substr({inner}, 2), '0', '') || '000', 1, 3) END"
    )


PART_NAME_SOUNDEX_BLOCKING_SQL = f"""
WITH n AS (
  SELECT p_name,
         upper(regexp_replace(p_name, '[^A-Za-z]+', '', 'g')) AS letters
  FROM part
), k AS (
  SELECT p_name, {_soundex_sql_expr("letters")} AS sdx FROM n
)
SELECT sdx, COUNT(*) AS n_parts,
       COUNT(DISTINCT p_name) AS n_names
FROM k
GROUP BY sdx
ORDER BY sdx
"""


def docs_linkgraph_reciprocity(sf_dir: str):
    """Link-graph RECIPROCITY + out-degree census — the structural web
    metrics (what fraction of links are mutual; how out-degree
    distributes) over the deterministic md5 graph shared by
    pagerank/CC/k-core.  Edges are tiny by construction; the census is
    exact integer arithmetic: reciprocity_ppm = mutual directed edges /
    all directed edges (a mutual pair contributes both directions).

    Output: one row — n_edges, n_reciprocal_edges, reciprocity_ppm,
    n_nodes_out0..out3 (out-degree histogram; ≤3 by construction)."""
    from ._q01_events_orders import _synth_link_edges

    edges, n = _synth_link_edges(sf_dir)
    et = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    src = et.column("src").to_numpy(zero_copy_only=False)
    dst = et.column("dst").to_numpy(zero_copy_only=False)
    pairs = set(zip(src.tolist(), dst.tolist()))
    recip = sum(1 for a, b in pairs if (b, a) in pairs)
    deg: dict[int, int] = {}
    for a in src.tolist():
        deg[a] = deg.get(a, 0) + 1
    hist = [0, 0, 0, 0]
    for v in range(n):
        hist[min(deg.get(v, 0), 3)] += 1
    n_edges = len(pairs)
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_reciprocal_edges": pa.array([recip], pa.int64()),
            "reciprocity_ppm": pa.array(
                [recip * 1_000_000 // n_edges if n_edges else 0], pa.int64()
            ),
            "out0": pa.array([hist[0]], pa.int64()),
            "out1": pa.array([hist[1]], pa.int64()),
            "out2": pa.array([hist[2]], pa.int64()),
            "out3": pa.array([hist[3]], pa.int64()),
        }
    )


DOCS_LINKGRAPH_RECIPROCITY_SQL = """
WITH edges_raw AS (
  SELECT doc_id AS src,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || CAST(j.j AS VARCHAR)), 1, 8)) AS UBIGINT)
              % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
  FROM documents, LATERAL unnest(generate_series(0, 2)) AS j(j)
), edges AS (SELECT DISTINCT src, dst FROM edges_raw WHERE dst <> src),
deg AS (
  SELECT d.doc_id, COALESCE(e.c, 0) AS outd
  FROM documents d
  LEFT JOIN (SELECT src, COUNT(*) AS c FROM edges GROUP BY 1) e
    ON e.src = d.doc_id
), agg AS (
  SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
         (SELECT COUNT(*) FROM edges a JOIN edges b
            ON a.src = b.dst AND a.dst = b.src) AS n_reciprocal_edges
)
SELECT n_edges, n_reciprocal_edges,
       CASE WHEN n_edges > 0
            THEN n_reciprocal_edges * 1000000 // n_edges ELSE 0 END
         AS reciprocity_ppm,
       (SELECT COUNT(*) FROM deg WHERE outd = 0) AS out0,
       (SELECT COUNT(*) FROM deg WHERE outd = 1) AS out1,
       (SELECT COUNT(*) FROM deg WHERE outd = 2) AS out2,
       (SELECT COUNT(*) FROM deg WHERE outd >= 3) AS out3
FROM agg
"""


def embeddings_grid_norm_census(sf_dir: str):
    """Embedding-norm distribution census in EXACT integers — the sanity
    report an index build runs before choosing a similarity metric
    (un-normalized norms break inner-product search): each component
    widens float32→float64 and snaps to the 1/128 grid (×128 is a
    power of two, so the multiply is exact; floor is deterministic),
    then norm² = Σq² is an order-free int64.  Per label: vector count
    and the min / max / sum of grid norm² — bit-identical in both
    engines, no float reduction anywhere.

    Per-row numpy, zero shuffle except the tiny label groupby."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )

    def partial(t: pa.Table) -> pa.Table:
        from ...stages.cluster import _vecs

        m = _vecs(t, "embedding")  # (n, d) float64, widened from float32
        q = np.floor(m.astype(np.float64) * 128.0).astype(np.int64)
        n2 = (q * q).sum(axis=1)
        lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(lab, return_inverse=True)
        cnt = np.zeros(len(uk), np.int64)
        s = np.zeros(len(uk), np.int64)
        mn = np.full(len(uk), np.iinfo(np.int64).max)
        mx = np.full(len(uk), np.iinfo(np.int64).min)
        np.add.at(cnt, inv, 1)
        np.add.at(s, inv, n2)
        np.minimum.at(mn, inv, n2)
        np.maximum.at(mx, inv, n2)
        return pa.table(
            {
                "label": pa.array(uk, pa.int64()),
                "n_vecs": pa.array(cnt, pa.int64()),
                "sum_norm2": pa.array(s, pa.int64()),
                "min_norm2": pa.array(mn, pa.int64()),
                "max_norm2": pa.array(mx, pa.int64()),
            }
        )

    parts = pa.concat_tables(
        list(
            ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    return (
        parts.group_by("label")
        .aggregate(
            [
                ("n_vecs", "sum"),
                ("sum_norm2", "sum"),
                ("min_norm2", "min"),
                ("max_norm2", "max"),
            ]
        )
        .rename_columns(["label", "n_vecs", "sum_norm2", "min_norm2", "max_norm2"])
        .sort_by("label")
    )


EMBEDDINGS_GRID_NORM_CENSUS_SQL = """
WITH q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(FLOOR(CAST(u.x AS DOUBLE) * 128) AS BIGINT) AS qv
  FROM embeddings, LATERAL unnest(embedding) AS u(x)
), n AS (
  SELECT vec_id, label, CAST(SUM(qv * qv) AS BIGINT) AS norm2
  FROM q GROUP BY vec_id, label
)
SELECT label,
       COUNT(*) AS n_vecs,
       CAST(SUM(norm2) AS BIGINT) AS sum_norm2,
       CAST(MIN(norm2) AS BIGINT) AS min_norm2,
       CAST(MAX(norm2) AS BIGINT) AS max_norm2
FROM n
GROUP BY label
ORDER BY label
"""


def docs_dedup_provenance_audit(sf_dir: str):
    """Dedup PROVENANCE audit — when exact dedup (the flagship's
    (lang, n_chars) key family) fires, does it collapse pages from the
    SAME source (mirror-crawl redundancy, cheap to drop) or ACROSS
    sources (provenance loss — one source's copy silently wins)?  Per
    duplicated key: C(n,2) total pairs, Σ_s C(n_s,2) same-source pairs;
    reported globally with the cross-source fraction in exact ppm —
    the number that decides whether dedup needs a source-priority
    tie-break.  Narrow 3-column scan, small groupby, integer fold."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        _t(sf_dir, "documents"), columns=["lang", "n_chars", "source"]
    )
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    g = (
        t.group_by(["lang", "n_chars", "source"])
        .aggregate([("source", "count")])
        .rename_columns(["lang", "n_chars", "source", "ns"])
    )
    k = (
        g.group_by(["lang", "n_chars"])
        .aggregate([("ns", "sum")])
        .rename_columns(["lang", "n_chars", "n"])
    )
    n = k.column("n").to_numpy(zero_copy_only=False)
    dup = n > 1
    n_dup_keys = int(dup.sum())
    n_pairs = int((n[dup] * (n[dup] - 1) // 2).sum())
    # same-source pairs only counted inside duplicated keys
    kt = k.filter(pa.array(dup.tolist()))
    dk = set(
        zip(kt.column("lang").to_pylist(), kt.column("n_chars").to_pylist())
    )
    same = 0
    for lang, nc, ns in zip(
        g.column("lang").to_pylist(),
        g.column("n_chars").to_pylist(),
        g.column("ns").to_pylist(),
    ):
        if (lang, nc) in dk:
            same += ns * (ns - 1) // 2
    cross = n_pairs - same
    return pa.table(
        {
            "n_dup_keys": pa.array([n_dup_keys], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "n_same_source_pairs": pa.array([same], pa.int64()),
            "n_cross_source_pairs": pa.array([cross], pa.int64()),
            "cross_ppm": pa.array(
                [cross * 1_000_000 // n_pairs if n_pairs else 0], pa.int64()
            ),
        }
    )


DOCS_DEDUP_PROVENANCE_AUDIT_SQL = """
WITH per_src AS (
  SELECT lang, n_chars, source, COUNT(*) AS ns
  FROM documents GROUP BY 1, 2, 3
), per_key AS (
  SELECT lang, n_chars, CAST(SUM(ns) AS BIGINT) AS n
  FROM per_src GROUP BY 1, 2
), dup AS (SELECT * FROM per_key WHERE n > 1),
agg AS (
  SELECT (SELECT COUNT(*) FROM dup) AS n_dup_keys,
         (SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT) FROM dup)
           AS n_pairs,
         (SELECT CAST(COALESCE(SUM(s.ns * (s.ns - 1) // 2), 0) AS BIGINT)
          FROM per_src s JOIN dup d
            ON s.lang = d.lang AND s.n_chars = d.n_chars)
           AS n_same_source_pairs
)
SELECT n_dup_keys, n_pairs, n_same_source_pairs,
       n_pairs - n_same_source_pairs AS n_cross_source_pairs,
       CASE WHEN n_pairs > 0
            THEN (n_pairs - n_same_source_pairs) * 1000000 // n_pairs
            ELSE 0 END AS cross_ppm
FROM agg
"""


def docs_lang_vocab_overlap(sf_dir: str):
    """Cross-language VOCABULARY overlap — whether per-lang corpora
    share surface tokens (loan words, markup leakage, template
    boilerplate): exact distinct-token sets per lang, pairwise
    |A∩B| / |A∪B| in integer ppm for every lang pair.  Token sets ride
    a (lang, token) distinct groupby; the pairwise fold runs on the
    tiny per-lang vocab sets."""
    import itertools

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def toks(t: pa.Table) -> pa.Table:
        pairs = set()
        for lang, text in zip(
            t.column("lang").to_pylist(), t.column("text").to_pylist()
        ):
            for w in (text or "").split():
                pairs.add((lang, w))
        ks = sorted(pairs)
        return pa.table(
            {
                "lang": pa.array([k[0] for k in ks], pa.string()),
                "w": pa.array([k[1] for k in ks], pa.string()),
            }
        )

    pairs = (
        pa.concat_tables(
            list(ds.map_batches(toks, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            ))
        )
        .group_by(["lang", "w"])
        .aggregate([])
    )
    vocab: dict[str, set] = {}
    for lang, w in zip(
        pairs.column("lang").to_pylist(), pairs.column("w").to_pylist()
    ):
        vocab.setdefault(lang, set()).add(w)
    rows = []
    for a, b in itertools.combinations(sorted(vocab), 2):
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a] | vocab[b])
        rows.append((a, b, inter, union, inter * 1_000_000 // union))
    return pa.table(
        {
            "lang_a": pa.array([r[0] for r in rows], pa.string()),
            "lang_b": pa.array([r[1] for r in rows], pa.string()),
            "n_inter": pa.array([r[2] for r in rows], pa.int64()),
            "n_union": pa.array([r[3] for r in rows], pa.int64()),
            "jaccard_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


DOCS_LANG_VOCAB_OVERLAP_SQL = """
WITH tok AS (
  SELECT DISTINCT lang,
         unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
), sz AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY lang
), inter AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok a JOIN tok b ON a.w = b.w AND a.lang < b.lang
  GROUP BY 1, 2
), allpairs AS (
  SELECT x.lang AS lang_a, y.lang AS lang_b
  FROM sz x JOIN sz y ON x.lang < y.lang
)
SELECT p.lang_a, p.lang_b,
       COALESCE(i.c, 0) AS n_inter,
       sa.n + sb.n - COALESCE(i.c, 0) AS n_union,
       COALESCE(i.c, 0) * 1000000 // (sa.n + sb.n - COALESCE(i.c, 0))
         AS jaccard_ppm
FROM allpairs p
JOIN sz sa ON sa.lang = p.lang_a
JOIN sz sb ON sb.lang = p.lang_b
LEFT JOIN inter i ON i.lang_a = p.lang_a AND i.lang_b = p.lang_b
ORDER BY p.lang_a, p.lang_b
"""


def segment_parttype_revenue_matrix(sf_dir: str):
    """Four-table STAR query (lineitem ⋈ orders ⋈ customer ⋈ part):
    revenue cents by (customer market segment × part type) — the
    classic mart rollup.  Ray-first decomposition: ONE hash join on the
    fact key (l_orderkey = o_orderkey, 8 partitions — the empirically
    optimal count); both dimensions (customer segment map, part type
    map) ride guarded broadcasts probed vectorized inside the fact
    scan; the final (segment, type) groupby is tiny."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from ...stages.broadcast import guard_broadcast_bytes, table_nbytes

    cust = pq.read_table(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    part = pq.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_type"])
    for label, tbl in (("customer segment dim", cust), ("part type dim", part)):
        guard_broadcast_bytes(
            table_nbytes(tbl),
            label=label,
            alternative="hash-join the dimension on its key instead of "
            "broadcasting (stages/broadcast.py reroute discipline)",
        )
    cref = ray.put(
        {
            "k": pc.cast(cust["c_custkey"], pa.int64()).combine_chunks(),
            "v": cust["c_mktsegment"].combine_chunks(),
        }
    )
    pref = ray.put(
        {
            "k": pc.cast(part["p_partkey"], pa.int64()).combine_chunks(),
            "v": part["p_type"].combine_chunks(),
        }
    )

    li = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_extendedprice", "l_discount"],
    )
    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )

    def prep(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount")),
        )
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(rev, 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_partkey": t.column("l_partkey"),
                "rev_c": cents,
            }
        )

    joined = li.map_batches(prep, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        p = ray.get(pref)
        seg = pc.take(
            c["v"],
            pc.index_in(pc.cast(t.column("o_custkey"), pa.int64()), value_set=c["k"]),
        )
        typ = pc.take(
            p["v"],
            pc.index_in(pc.cast(t.column("l_partkey"), pa.int64()), value_set=p["k"]),
        )
        return (
            pa.table(
                {
                    "c_mktsegment": seg,
                    "p_type": typ,
                    "rev_c": t.column("rev_c"),
                }
            )
            .group_by(["c_mktsegment", "p_type"])
            .aggregate([("rev_c", "sum")])
            .rename_columns(["c_mktsegment", "p_type", "revenue_cents"])
        )

    parts = pa.concat_tables(
        list(
            joined.map_batches(label, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    return (
        parts.group_by(["c_mktsegment", "p_type"])
        .aggregate([("revenue_cents", "sum")])
        .rename_columns(["c_mktsegment", "p_type", "revenue_cents"])
        .sort_by([("c_mktsegment", "ascending"), ("p_type", "ascending")])
    )


SEGMENT_PARTTYPE_REVENUE_MATRIX_SQL = """
SELECT c_mktsegment, p_type,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN part     ON l_partkey = p_partkey
GROUP BY c_mktsegment, p_type
ORDER BY c_mktsegment, p_type
"""


def docs_quality_gate_ablation(sf_dir: str):
    """Quality-gate ABLATION — which of the C4/Gopher gates actually does
    the rejecting: for each gate (word count, mean word length, stopword
    fraction, repeated-word fraction), how many docs fail it at all and
    how many fail ONLY it (the sole-rejection count that tells you what
    loosening that one threshold would readmit).  Metrics come from the
    production ``quality_flags_stage`` unchanged; the ablation is pure
    vectorized mask arithmetic over its µ-scaled outputs."""
    from ...stages.text_analysis import quality_flags_stage

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    q = pa.concat_tables(
        list(quality_flags_stage(ds).iter_batches(batch_format="pyarrow"))
    )
    nw = q.column("n_words").to_numpy(zero_copy_only=False)
    mwl = q.column("mwl_u").to_numpy(zero_copy_only=False)
    stop = q.column("stop_u").to_numpy(zero_copy_only=False)
    dup = q.column("dupword_u").to_numpy(zero_copy_only=False)
    fails = {
        "word_count": (nw < 20) | (nw > 100_000),
        "mean_word_len": (mwl < 2_000_000) | (mwl > 12_000_000),
        "stopword_frac": stop < 10_000,
        "dupword_frac": dup > 900_000,
    }
    total_fail = np.zeros(len(nw), dtype=np.int64)
    for m in fails.values():
        total_fail += m
    rows = []
    for name in sorted(fails):
        m = fails[name]
        rows.append(
            (name, int(m.sum()), int((m & (total_fail == 1)).sum()))
        )
    return pa.table(
        {
            "gate": pa.array([r[0] for r in rows], pa.string()),
            "n_failing": pa.array([r[1] for r in rows], pa.int64()),
            "n_sole_reason": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


DOCS_QUALITY_GATE_ABLATION_SQL = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_words,
         length(regexp_replace(text, '\\s', '', 'g')) AS wc,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
             x -> x IN ('the','a','an','of','to','in','and','is','on','for')))
           AS n_stop,
         len(list_distinct(list_filter(
             string_split_regex(lower(trim(text)), '\\s+'), x -> x <> '')))
           AS n_distinct
  FROM documents
), m AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words = 0 THEN 0
              ELSE CAST(FLOOR(wc * 1000000.0 / n_words) AS BIGINT) END AS mwl_u,
         CASE WHEN n_words = 0 THEN 0
              ELSE CAST(FLOOR(n_stop * 1000000.0 / n_words) AS BIGINT) END
           AS stop_u,
         CASE WHEN n_words = 0 THEN 0
              ELSE CAST(FLOOR((n_words - n_distinct) * 1000000.0 / n_words)
                        AS BIGINT) END AS dupword_u
  FROM b
), flags AS (
  SELECT doc_id,
         (n_words < 20 OR n_words > 100000) AS f_wc,
         (mwl_u < 2000000 OR mwl_u > 12000000) AS f_mwl,
         (stop_u < 10000) AS f_stop,
         (dupword_u > 900000) AS f_dup
  FROM m
), tot AS (
  SELECT flags.*,
         CAST(f_wc AS INT) + CAST(f_mwl AS INT) + CAST(f_stop AS INT)
           + CAST(f_dup AS INT) AS nf
  FROM flags
)
SELECT gate, n_failing, n_sole_reason FROM (
  SELECT 'dupword_frac' AS gate,
         CAST(SUM(CASE WHEN f_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_failing,
         CAST(SUM(CASE WHEN f_dup AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sole_reason
  FROM tot
  UNION ALL
  SELECT 'mean_word_len',
         CAST(SUM(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN f_mwl AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM tot
  UNION ALL
  SELECT 'stopword_frac',
         CAST(SUM(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN f_stop AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM tot
  UNION ALL
  SELECT 'word_count',
         CAST(SUM(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT),
         CAST(SUM(CASE WHEN f_wc AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM tot
)
ORDER BY gate
"""


def docs_erasure_propagation_audit(sf_dir: str):
    """Right-to-be-forgotten ERASURE audit — before deleting a subject's
    rows you must know every derived artifact they reached: for the
    deletion cohort (doc_id ≡ 0 mod 97), count appearances in each
    derived surface this engine builds — the corpus itself, the link
    graph (as source AND as target: inbound links survive naive
    deletion), and the per-host sitemap listing.  One row per artifact
    with cohort hit counts — the checklist an erasure job must clear.
    All surfaces are the registry's own deterministic constructions, so
    the oracle rebuilds each count arithmetically."""
    from ._q01_events_orders import _synth_link_edges

    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    ids = np.sort(
        pa.concat_tables(list(docs.iter_batches(batch_format="pyarrow")))
        .column("doc_id")
        .to_numpy(zero_copy_only=False)
    )
    cohort = set(int(i) for i in ids if i % 97 == 0)

    edges, _n = _synth_link_edges(sf_dir)
    et = pa.concat_tables(list(edges.iter_batches(batch_format="pyarrow")))
    src = et.column("src").to_numpy(zero_copy_only=False)
    dst = et.column("dst").to_numpy(zero_copy_only=False)

    n_corpus = len(cohort)
    n_out = int(sum(1 for s in src.tolist() if s in cohort))
    n_in = int(sum(1 for d in dst.tolist() if d in cohort))
    n_sitemap = int(sum(1 for i in cohort if i % 3 != 0))  # sitemap lists %3!=0

    return pa.table(
        {
            "artifact": pa.array(
                ["corpus_rows", "linkgraph_outbound", "linkgraph_inbound",
                 "sitemap_listings"],
                pa.string(),
            ),
            "n_cohort_hits": pa.array(
                [n_corpus, n_out, n_in, n_sitemap], pa.int64()
            ),
        }
    )


DOCS_ERASURE_PROPAGATION_AUDIT_SQL = """
WITH cohort AS (
  SELECT doc_id FROM documents WHERE doc_id % 97 = 0
), edges_raw AS (
  SELECT doc_id AS src,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || CAST(j.j AS VARCHAR)), 1, 8)) AS UBIGINT)
              % (SELECT COUNT(*) FROM documents) AS BIGINT) AS dst
  FROM documents, LATERAL unnest(generate_series(0, 2)) AS j(j)
), edges AS (SELECT DISTINCT src, dst FROM edges_raw WHERE dst <> src)
SELECT artifact, n_cohort_hits FROM (
  SELECT 'corpus_rows' AS artifact,
         (SELECT COUNT(*) FROM cohort) AS n_cohort_hits
  UNION ALL
  SELECT 'linkgraph_inbound',
         (SELECT COUNT(*) FROM edges e JOIN cohort c ON e.dst = c.doc_id)
  UNION ALL
  SELECT 'linkgraph_outbound',
         (SELECT COUNT(*) FROM edges e JOIN cohort c ON e.src = c.doc_id)
  UNION ALL
  SELECT 'sitemap_listings',
         (SELECT COUNT(*) FROM cohort WHERE doc_id % 3 <> 0)
)
ORDER BY artifact
"""


def docs_context_pack_efficiency(sf_dir: str):
    """Context-window PACKING efficiency — the padding-waste number an
    LLM training export pays for: greedy first-fit packing of docs (in
    doc_id order, token counts capped at the window) into 512-token
    windows; report bins used, tokens packed, and waste in exact ppm
    (waste = bins·512 − tokens).  Greedy fill is an order recurrence —
    bin state depends on every prior doc — so the oracle replays the
    identical fold as a recursive CTE over the doc sequence (the
    token-bucket discipline, corpus-wide).

    At scale the pack runs per shard (the export's natural unit); the
    audit here covers one shard's worth."""
    CAP = 512

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def toklen(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = [
            min(CAP, len((s or "").split()))
            for s in t.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_tok": pa.array(n, pa.int64())}
        )

    lt = (
        pa.concat_tables(
            list(ds.map_batches(toklen, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            ))
        )
        .sort_by("doc_id")
    )
    bins, fill, total = 0, CAP + 1, 0  # force a new bin on the first doc
    for n in lt.column("n_tok").to_pylist():
        n = int(n)
        total += n
        if fill + n > CAP:
            bins += 1
            fill = n
        else:
            fill += n
    capacity = bins * CAP
    return pa.table(
        {
            "n_docs": pa.array([lt.num_rows], pa.int64()),
            "n_bins": pa.array([bins], pa.int64()),
            "tokens_packed": pa.array([total], pa.int64()),
            "waste_ppm": pa.array(
                [(capacity - total) * 1_000_000 // capacity if capacity else 0],
                pa.int64(),
            ),
        }
    )


DOCS_CONTEXT_PACK_EFFICIENCY_SQL = """
WITH RECURSIVE d AS (
  SELECT ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
         LEAST(512, CASE WHEN trim(text) = '' THEN 0
                         ELSE len(string_split_regex(trim(text), '\\s+')) END)
           AS n_tok
  FROM documents
), r AS (
  SELECT rn, n_tok, 1 AS bins, n_tok AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.rn, d.n_tok,
         CASE WHEN r.fill + d.n_tok > 512 THEN r.bins + 1 ELSE r.bins END,
         CASE WHEN r.fill + d.n_tok > 512 THEN d.n_tok
              ELSE r.fill + d.n_tok END
  FROM r JOIN d ON d.rn = r.rn + 1
), last AS (
  SELECT bins FROM r ORDER BY rn DESC LIMIT 1
)
SELECT (SELECT COUNT(*) FROM d) AS n_docs,
       CAST((SELECT bins FROM last) AS BIGINT) AS n_bins,
       CAST((SELECT SUM(n_tok) FROM d) AS BIGINT) AS tokens_packed,
       CAST(((SELECT bins FROM last) * 512 - (SELECT SUM(n_tok) FROM d))
            * 1000000 // ((SELECT bins FROM last) * 512) AS BIGINT)
         AS waste_ppm
"""


def docs_simhash_bit_balance_audit(sf_dir: str):
    """SimHash BIT-BALANCE health audit — a usable simhash needs each of
    its 64 bits set on ~half the corpus (biased bits shrink effective
    hamming distances and blind the near-dup pass).  Per bit: how many
    docs set it, with the deviation from n/2 in exact ppm of n.  Builds
    on the exact simhash census (same kernel, same md5 hash idiom), so
    this is the health check a production fleet would run on its real
    signatures."""
    from ._q08_docs_orders import docs_simhash64_census

    t = pa.concat_tables(
        list(
            docs_simhash64_census(sf_dir).iter_batches(batch_format="pyarrow")
        )
    )
    hi = t.column("simhash_hi").to_numpy(zero_copy_only=False).astype(np.int64)
    lo = t.column("simhash_lo").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(hi)
    bits = np.arange(32, dtype=np.int64)
    set_lo = ((lo[:, None] >> bits) & 1).sum(axis=0)
    set_hi = ((hi[:, None] >> bits) & 1).sum(axis=0)
    n_set = np.concatenate([set_lo, set_hi]).astype(np.int64)
    dev = np.abs(2 * n_set - n) * 1_000_000 // (2 * n) if n else n_set * 0
    return pa.table(
        {
            "bit": pa.array(np.arange(64), pa.int64()),
            "n_set": pa.array(n_set, pa.int64()),
            "n_docs": pa.array([n] * 64, pa.int64()),
            "dev_ppm": pa.array(dev, pa.int64()),
        }
    )


DOCS_SIMHASH_BIT_BALANCE_AUDIT_SQL = """
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
      FROM b GROUP BY doc_id, bit),
per_bit AS (
  SELECT bit,
         CAST(SUM(CASE WHEN acc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_set,
         COUNT(*) AS n_docs
  FROM s GROUP BY bit
)
SELECT bit, n_set, n_docs,
       ABS(2 * n_set - n_docs) * 1000000 // (2 * n_docs) AS dev_ppm
FROM per_bit
ORDER BY bit
"""


def docs_ocr_confusion_fold_census(sf_dir: str):
    """OCR-confusion FOLD census — the reference's own failure domain
    (invoice OCR) applied corpus-wide: fold the classic OCR confusion
    pairs (0↔O, 1↔l, 5↔S, 8↔B, rn→m is out of scope for a 1:1 fold)
    into canonical characters and ask (a) how many docs change at all
    under the fold and (b) how many docs COLLIDE — equal folded text,
    different raw text: the OCR-near-dups exact dedup misses.  Folding
    is one translate per row; collisions ride a folded-md5 groupby."""
    import hashlib

    FOLD = str.maketrans("0l5B", "O1S8")

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang", "text"])

    def folded(t: pa.Table) -> pa.Table:
        texts = [(s or "") for s in t.column("text").to_pylist()]
        ftexts = [s.translate(FOLD) for s in texts]
        return pa.table(
            {
                "lang": t.column("lang"),
                "changed": pa.array(
                    [int(a != b) for a, b in zip(texts, ftexts)], pa.int64()
                ),
                "fold_md5": pa.array(
                    [hashlib.md5(s.encode()).hexdigest() for s in ftexts],
                    pa.string(),
                ),
                "raw_md5": pa.array(
                    [hashlib.md5(s.encode()).hexdigest() for s in texts],
                    pa.string(),
                ),
            }
        )

    t = pa.concat_tables(
        list(ds.map_batches(folded, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ))
    )
    g = (
        t.group_by(["lang", "fold_md5"])
        .aggregate([("raw_md5", "count_distinct"), ("changed", "count")])
        .rename_columns(["lang", "fold_md5", "n_raw", "n_docs"])
    )
    import collections

    per_lang: collections.Counter = collections.Counter()
    coll: collections.Counter = collections.Counter()
    for lang, n_raw, n_docs in zip(
        g.column("lang").to_pylist(),
        g.column("n_raw").to_pylist(),
        g.column("n_docs").to_pylist(),
    ):
        per_lang[lang] += n_docs
        if n_raw > 1:
            coll[lang] += n_docs
    changed = (
        t.group_by("lang").aggregate([("changed", "sum")])
        .rename_columns(["lang", "n_changed"])
    )
    chd = dict(
        zip(changed.column("lang").to_pylist(), changed.column("n_changed").to_pylist())
    )
    ks = sorted(per_lang)
    return pa.table(
        {
            "lang": pa.array(ks, pa.string()),
            "n_docs": pa.array([per_lang[k] for k in ks], pa.int64()),
            "n_changed": pa.array([int(chd.get(k, 0)) for k in ks], pa.int64()),
            "n_in_collisions": pa.array([coll.get(k, 0) for k in ks], pa.int64()),
        }
    )


DOCS_OCR_CONFUSION_FOLD_CENSUS_SQL = """
WITH f AS (
  SELECT lang,
         translate(text, '0l5B', 'O1S8') AS ftext,
         text
  FROM documents
), g AS (
  SELECT lang, md5(ftext) AS fm,
         COUNT(DISTINCT md5(text)) AS n_raw,
         COUNT(*) AS n_docs
  FROM f GROUP BY lang, fm
)
SELECT f2.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN f2.text <> f2.ftext THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(COALESCE((SELECT SUM(g.n_docs) FROM g
                      WHERE g.lang = f2.lang AND g.n_raw > 1), 0) AS BIGINT)
         AS n_in_collisions
FROM f f2
GROUP BY f2.lang
ORDER BY f2.lang
"""
