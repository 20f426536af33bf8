"""Near-duplicate detection suite: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine.

Scale shape (the published MinHash-LSH pipeline expressed Ray-Data-first):

    map_batches: shingle → minhash signature per doc      (stateless, vectorized numpy)
    flat_map-in-batch: explode to (band_key, doc_id, SIG) (bands × docs rows,
                       ~0.5 KB/row — the document TEXT never enters the shuffle)
    groupby(band_key): bucket                              ← the ONE all-to-all, key = band hash
    within bucket: candidate pairs prefiltered by the signature-estimated
                   Jaccard (buckets are tiny; a giant bucket is a degenerate
                   band — capped AND logged, not exploded O(n²))
    verify: exact Jaccard, computed on text fetched ONLY for the tiny final
            candidate-id set (column-pruned + is_in-filtered side read,
            broadcast once) — O(|candidates|), not O(|corpus|)

At 100 TB the shuffle therefore moves bands × (8 B key + 8 B id + 512 B sig)
per doc instead of bands × the full document text — the difference between a
few GB/TB exchange and a 16×-corpus all-to-all.

SimHash buckets by rotated hash prefixes (hamming-ball probing) and verifies
from the 64-bit signatures alone; the embedding variant buckets by coarse LSH
(random hyperplane signs) and verifies cosine within buckets (the vectors ARE
the verification payload there, so they do ride the one shuffle).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    char_shingles,
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash64,
    stable_hash64,
    word_ngrams,
)

logger = logging.getLogger(__name__)

_PAIR_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("similarity", pa.float64())]
)
_CAND_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
_MAX_BUCKET = 200  # a bucket bigger than this is a degenerate band: cap pairs


def _cap_bucket(items: list, where: str) -> list:
    """Cap a degenerate bucket at ``_MAX_BUCKET`` members — LOUDLY.  A bucket
    this big means a pathological band (e.g. the empty-signature bucket);
    truncation drops candidate pairs, so it must be visible in the worker
    log, never silent."""
    if len(items) > _MAX_BUCKET:
        dropped_pairs = len(items) * (len(items) - 1) // 2 - _MAX_BUCKET * (
            _MAX_BUCKET - 1
        ) // 2
        logger.warning(
            "neardup bucket overflow in %s: %d members > cap %d "
            "(~%d candidate pairs dropped; a bucket this degenerate usually "
            "means an empty/constant signature)",
            where, len(items), _MAX_BUCKET, dropped_pairs,
        )
        return items[:_MAX_BUCKET]
    return items


def _pairs_table(pairs: dict[tuple[int, int], float]) -> pa.Table:
    ks = sorted(pairs)
    return pa.Table.from_arrays(
        [
            pa.array([a for a, _ in ks], pa.int64()),
            pa.array([b for _, b in ks], pa.int64()),
            pa.array([pairs[k] for k in ks], pa.float64()),
        ],
        schema=_PAIR_SCHEMA,
    )


def _dedup_pairs_driver(pairs_ds):
    """Verified-pairs Dataset → distinct pairs via a driver collect.  The
    pair set is tiny by LSH construction (that is the point of bucketing), so
    a set-dedup on the driver beats spinning a groupby shuffle fleet; the
    similarity for a pair is identical from every bucket that surfaced it."""
    import ray.data as rd

    uniq: dict[tuple[int, int], float] = {}
    for b in pairs_ds.iter_batches(batch_format="pyarrow"):
        for a, bb, s in zip(
            b.column("id_a").to_pylist(),
            b.column("id_b").to_pylist(),
            b.column("similarity").to_pylist(),
        ):
            uniq.setdefault((a, bb), s)
    return rd.from_arrow(_pairs_table(uniq))


def _verify_pairs_exact(
    ds, cand_ds, *, id_col: str, text_col: str, set_fn, threshold: float, fetch_fn=None
):
    """Exact-Jaccard verification of candidate pairs, touching text ONLY for
    the candidate ids.

    ``cand_ds``: Dataset(id_a, id_b) — tiny by LSH construction.  Candidates
    are collected to the driver (O(|candidates|), the documented bound) and
    deduped THERE — a pair surfacing from several bands/anchors costs a set
    insert, not a whole ``groupby`` shuffle fleet.  The matching texts come
    from a column-pruned + ``pc.is_in``-filtered side read of ``ds`` (or from
    ``fetch_fn(ids) -> {id: text}``, e.g. a predicate-pushdown parquet point
    read), broadcast ONCE via ``ray.put``, and verification runs distributed
    over the candidate-pair Dataset with a per-task shingle-set cache.
    Returns Dataset(id_a, id_b, similarity) with similarity = exact
    ``set_fn``-set Jaccard ≥ threshold."""
    import ray
    import ray.data as rd

    uniq: set[tuple[int, int]] = set()
    for b in cand_ds.iter_batches(batch_format="pyarrow"):
        uniq.update(zip(b.column("id_a").to_pylist(), b.column("id_b").to_pylist()))
    if not uniq:
        return rd.from_arrow(_PAIR_SCHEMA.empty_table())
    ks = sorted(uniq)
    cand = pa.Table.from_arrays(
        [
            pa.array([a for a, _ in ks], pa.int64()),
            pa.array([b for _, b in ks], pa.int64()),
        ],
        schema=_CAND_SCHEMA,
    )
    ids = sorted({i for p in ks for i in p})

    if fetch_fn is not None:
        texts = dict(fetch_fn(ids))
    else:
        ids_arr = pa.array(ids, pa.int64())
        texts = {}
        fetched = ds.map_batches(
            lambda t: t.select([id_col, text_col]).filter(
                pc.is_in(t[id_col], value_set=ids_arr)
            ),
            batch_format="pyarrow",
        )
        for b in fetched.iter_batches(batch_format="pyarrow"):
            texts.update(
                zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist())
            )
    texts_ref = ray.put(texts)

    def verify(t: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        sets: dict[int, set] = {}

        def sset(i: int) -> set:
            if i not in sets:
                sets[i] = set(set_fn(tx.get(i) or ""))
            return sets[i]

        pairs: dict[tuple[int, int], float] = {}
        for a, b in zip(t.column("id_a").to_pylist(), t.column("id_b").to_pylist()):
            j = jaccard(sset(a), sset(b))
            if j >= threshold:
                pairs[(a, b)] = round(j, 6)
        return _pairs_table(pairs)

    return rd.from_arrow(cand).map_batches(verify, batch_format="pyarrow")


def minhash_neardup_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    fetch_fn=None,
):
    """Dataset(docs) → Dataset(id_a, id_b, similarity) of verified near-dups.

    similarity = exact ``char_shingles``-set Jaccard of the candidate pair —
    the SAME shingle universe (whitespace-collapsed, same k) the signatures
    are built over, so banding and verification agree.  The band shuffle
    carries only (band_key, doc_id, signature); candidates are prefiltered by
    the MinHash-estimated Jaccard (matching signature fraction) with a 4-sigma
    slack under the threshold, then exact-verified on text fetched just for
    the surviving candidate ids (see :func:`_verify_pairs_exact`).  Pass
    ``fetch_fn(ids) -> {id: text}`` (e.g. a predicate-pushdown parquet point
    read) to avoid the fallback second corpus scan for that text.
    """
    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        sigs = [
            minhash_signature(t or "", num_perm, shingle_k).tobytes() for t in texts
        ]
        return pa.Table.from_arrays(
            [pa.array([int(i) for i in ids], pa.int64()), pa.array(sigs, pa.binary())],
            names=[id_col, "sig"],
        )

    sig_ds = ds.map_batches(sig_batch, batch_format="pyarrow")
    return minhash_pairs_from_signatures(
        sig_ds,
        ds,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        fetch_fn=fetch_fn,
    )


def minhash_pairs_from_signatures(
    sig_ds,
    fetch_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sig_col: str = "sig",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    fetch_fn=None,
):
    """LSH near-dup pairs when MinHash signatures are ALREADY computed
    upstream (e.g. the curation pipeline's fused metrics pass) — the corpus
    text is not re-scanned to band.

    ``sig_ds``: Dataset(id, sig) with ``sig`` = raw ``uint64[num_perm]``
    bytes; ``fetch_ds``/``fetch_fn``: where exact-verification text for the
    tiny candidate set comes from (see :func:`_verify_pairs_exact`)."""
    # est-Jaccard std is sqrt(t(1-t)/num_perm); 4 sigma below threshold keeps
    # true pairs out of the prefilter's false-negative tail
    pre_thr = max(0.0, threshold - 4.0 * float(np.sqrt(threshold * (1 - threshold) / num_perm)))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        sigs = batch.column(sig_col).to_pylist()
        out_band: list[int] = []
        out_id: list[int] = []
        out_sig: list[bytes] = []
        for i, sb in zip(ids, sigs):
            sig = np.frombuffer(sb, dtype=np.uint64)
            for key in lsh_band_keys(sig, bands):
                out_band.append(key)
                out_id.append(int(i))
                out_sig.append(sb)
        return pa.Table.from_arrays(
            [
                pa.array(out_band, pa.uint64()),
                pa.array(out_id, pa.int64()),
                pa.array(out_sig, pa.binary()),
            ],
            names=["band_key", "doc_id_", "sig_"],
        )

    exploded = sig_ds.map_batches(explode, batch_format="pyarrow")

    def bucket_candidates(group: pa.Table) -> pa.Table:
        uniq: dict[int, bytes] = dict(
            zip(group.column("doc_id_").to_pylist(), group.column("sig_").to_pylist())
        )
        items = _cap_bucket(sorted(uniq.items()), "minhash band")
        if len(items) < 2:
            return _CAND_SCHEMA.empty_table()
        sigs = np.frombuffer(b"".join(s for _, s in items), dtype=np.uint64).reshape(
            len(items), num_perm
        )
        out_a: list[int] = []
        out_b: list[int] = []
        for x in range(len(items) - 1):
            est = (sigs[x + 1 :] == sigs[x]).mean(axis=1)  # vectorized est-Jaccard
            for off in np.nonzero(est >= pre_thr)[0]:
                out_a.append(items[x][0])
                out_b.append(items[x + 1 + off][0])
        return pa.Table.from_arrays(
            [pa.array(out_a, pa.int64()), pa.array(out_b, pa.int64())],
            schema=_CAND_SCHEMA,
        )

    cand = exploded.groupby("band_key").map_groups(bucket_candidates, batch_format="pyarrow")
    return _verify_pairs_exact(
        fetch_ds,
        cand,
        id_col=id_col,
        text_col=text_col,
        set_fn=lambda t: char_shingles(t, shingle_k),
        threshold=threshold,
        fetch_fn=fetch_fn,
    )


def simhash_neardup_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    max_hamming: int = 3,
    prefix_bits: int = 16,
):
    """SimHash near-dup: bucket by 4 rotated ``prefix_bits`` prefixes (any
    pair within hamming ≤ max_hamming over 64 bits shares at least one of 4
    16-bit quarters — pigeonhole), verify hamming within buckets."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_b, out_i, out_s = [], [], []
        for i, t in zip(ids, texts):
            s = simhash64(t or "", ngram)
            for q in range(4):
                quarter = (s >> (16 * q)) & 0xFFFF
                out_b.append((q << 16) | quarter)
                out_i.append(int(i))
                out_s.append(s)
        return pa.Table.from_arrays(
            [
                pa.array(out_b, pa.int64()),
                pa.array(out_i, pa.int64()),
                pa.array(out_s, pa.uint64()),
            ],
            names=["bucket", "doc_id_", "sim_"],
        )

    exploded = ds.map_batches(sig_batch, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        items = _cap_bucket(
            sorted(
                set(zip(group.column("doc_id_").to_pylist(), group.column("sim_").to_pylist()))
            ),
            "simhash prefix",
        )
        pairs: dict[tuple[int, int], float] = {}
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                h = hamming64(int(items[x][1]), int(items[y][1]))
                if h <= max_hamming and items[x][0] != items[y][0]:
                    a, b = sorted((items[x][0], items[y][0]))
                    pairs[(a, b)] = float(64 - h) / 64.0
        return _pairs_table(pairs)

    pairs = exploded.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    return _dedup_pairs_driver(pairs)


def ngram_jaccard_pairs(
    ds, *, text_col="text", id_col="doc_id", n: int = 3, threshold: float = 0.5,
    fetch_fn=None,
):
    """Word n-gram Jaccard near-dup — bucketing key = rarest-first sampled
    n-grams (each doc emits a few anchor n-grams; docs sharing an anchor are
    candidates).  The anchor shuffle carries only (anchor, doc_id) — never
    text; exact word-n-gram Jaccard is verified on text fetched just for the
    candidate ids (:func:`_verify_pairs_exact`; pass ``fetch_fn`` for a
    predicate-pushdown point read instead of the fallback corpus re-scan)."""

    def anchors(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_a, out_i = [], []
        for i, t in zip(ids, texts):
            grams = word_ngrams(t or "", n)
            # 8 deterministic anchors: smallest hashed n-grams (min-wise sample)
            hs = sorted(stable_hash64(g, salt="anchor") for g in set(grams))[:8]
            for hv in hs:
                out_a.append(hv)
                out_i.append(int(i))
        return pa.Table.from_arrays(
            [pa.array(out_a, pa.uint64()), pa.array(out_i, pa.int64())],
            names=["anchor", "doc_id_"],
        )

    exploded = ds.map_batches(anchors, batch_format="pyarrow")

    def bucket_candidates(group: pa.Table) -> pa.Table:
        items = _cap_bucket(
            sorted(set(group.column("doc_id_").to_pylist())), "ngram anchor"
        )
        out_a, out_b = [], []
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                out_a.append(items[x])
                out_b.append(items[y])
        return pa.Table.from_arrays(
            [pa.array(out_a, pa.int64()), pa.array(out_b, pa.int64())],
            schema=_CAND_SCHEMA,
        )

    cand = exploded.groupby("anchor").map_groups(bucket_candidates, batch_format="pyarrow")
    return _verify_pairs_exact(
        ds,
        cand,
        id_col=id_col,
        text_col=text_col,
        set_fn=lambda t: word_ngrams(t, n),
        threshold=threshold,
        fetch_fn=fetch_fn,
    )


def embedding_neardup_pairs(
    ds,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 777,
):
    """Embedding-cosine near-dup via random-hyperplane LSH buckets + exact
    cosine verification inside each bucket (one shuffle on the sign-pattern
    key).  ``planes`` controls bucket granularity."""

    def bucket_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        emb = np.asarray(batch.column(emb_col).to_pylist(), dtype=np.float64)
        if emb.ndim == 1:  # empty batch guard
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.list_(pa.float64()))],
                names=["bucket", "vec_id_", "emb_"],
            )
        dim = emb.shape[1]
        rng = np.random.RandomState(seed)
        H = rng.standard_normal((dim, planes))
        signs = (emb @ H) > 0
        keys = np.zeros(len(ids), dtype=np.int64)
        for p in range(planes):
            keys |= signs[:, p].astype(np.int64) << p
        return pa.Table.from_arrays(
            [
                pa.array(keys, pa.int64()),
                pa.array([int(i) for i in ids], pa.int64()),
                pa.array(emb.tolist(), pa.list_(pa.float64())),
            ],
            names=["bucket", "vec_id_", "emb_"],
        )

    exploded = ds.map_batches(bucket_batch, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id_").to_pylist()
        embs = np.asarray(group.column("emb_").to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        kept = _cap_bucket([ids[i] for i in order], "embedding sign-bucket")
        ids = kept
        embs = embs[order][: len(kept)]
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        unit = embs / norms[:, None]
        sims = unit @ unit.T
        pairs: dict[tuple[int, int], float] = {}
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                if ids[x] != ids[y] and sims[x, y] >= threshold:
                    a, b = sorted((ids[x], ids[y]))
                    pairs[(a, b)] = round(float(sims[x, y]), 6)
        return _pairs_table(pairs)

    pairs = exploded.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    return _dedup_pairs_driver(pairs)


# ------------------------------------------------ clustering (connected comp.)

def cluster_pairs(ids_ds, pairs_ds, *, max_rounds: int = 8):
    """Connected components over near-dup candidate pairs → per-doc cluster id
    (the step that turns pairwise LSH hits into dedup groups).

    Distributed iterative **min-label propagation**: every doc starts with
    label = its own id; each round, every doc takes the min label in its
    edge-neighborhood (one ``groupby(node)`` shuffle per round); stops early
    when a round changes nothing.  Rounds needed = graph diameter — near-dup
    clusters are shallow (pairs share an LSH bucket), so a small
    ``max_rounds`` bound is safe and keeps the plan finite; the cap is
    asserted, not silently truncated.

    ``ids_ds``: Dataset with a ``doc_id`` column (the full population —
    singletons keep their own id as cluster id).  ``pairs_ds``: Dataset with
    ``id_a``/``id_b`` columns.  Returns Dataset(doc_id, cluster_id).

    Scale shape: the EDGE list is broadcast once (``ray.put`` — tiny by LSH
    construction, O(|near-dup pairs|)); the LABEL table never touches the
    driver.  Labels stay a distributed Dataset, ``materialize()``d per round
    to cut lineage (blocks live in the object store, spillable), and
    convergence is detected with a changed-row COUNT aggregate: each self-row
    carries its previous label through the min-reduction, so ``new < old``
    counts label improvements without any driver-side table compare.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    _SENTINEL = (1 << 63) - 1  # edge-carried rows: no old label to report

    labels = ids_ds.select_columns(["doc_id"]).map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("doc_id"), t.column("doc_id")], names=["doc_id", "cluster_id"]
        ),
        batch_format="pyarrow",
    )
    edge_batches = list(
        pairs_ds.select_columns(["id_a", "id_b"]).iter_batches(batch_format="pyarrow")
    )
    if not edge_batches or sum(b.num_rows for b in edge_batches) == 0:
        return labels
    et = pa.concat_tables(edge_batches)
    # both directions: src → dst and dst → src
    src = pa.concat_arrays(
        [et.column("id_a").combine_chunks(), et.column("id_b").combine_chunks()]
    )
    dst = pa.concat_arrays(
        [et.column("id_b").combine_chunks(), et.column("id_a").combine_chunks()]
    )
    # the one data-dependent ray.put in this module: O(|pairs|) by LSH
    # construction, but enforce the byte budget like every other broadcast
    # site (VERDICT r4 #4)
    from .broadcast import guard_broadcast_bytes

    guard_broadcast_bytes(
        src.nbytes + dst.nbytes,
        label="cluster_pairs edge list",
        alternative="hash-partition pairs by node and run label propagation "
        "as a per-round Dataset.join instead of a broadcast edge probe",
    )
    edges_ref = ray.put({"src": src, "dst": dst})

    labels = labels.materialize()
    for _ in range(max_rounds):

        def propose(t: pa.Table) -> pa.Table:
            # every edge whose src is in this block carries the src's current
            # label to dst (vectorized index_in probe of the broadcast edge
            # list); self-rows re-propose their own label and remember it in
            # ``old`` so the reduction can count changes
            e = ray.get(edges_ref)
            ids = t.column("doc_id").combine_chunks()
            labs = t.column("cluster_id").combine_chunks()
            idx = pc.index_in(e["src"], value_set=ids)
            hit = pc.is_valid(idx)
            carried_dst = pc.filter(e["dst"], hit)
            carried_lab = pc.take(labs, pc.filter(idx, hit))
            m = len(carried_dst)
            return pa.Table.from_arrays(
                [
                    pa.concat_arrays([ids, carried_dst]),
                    pa.concat_arrays([labs, carried_lab]),
                    pa.concat_arrays([labs, pa.array([_SENTINEL] * m, pa.int64())]),
                ],
                names=["doc_id", "cluster_id", "old"],
            )

        new_labels = (
            labels.map_batches(propose, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(
                Min("cluster_id", alias_name="cluster_id"),
                Min("old", alias_name="old_label"),
            )
        ).materialize()  # cut lineage; blocks stay distributed in the object store

        changed = new_labels.map_batches(
            lambda t: pa.Table.from_arrays(
                [
                    pa.array(
                        [
                            int(
                                pc.sum(
                                    pc.cast(
                                        pc.less(t["cluster_id"], t["old_label"]),
                                        pa.int64(),
                                    )
                                ).as_py()
                                or 0
                            )
                        ],
                        pa.int64(),
                    )
                ],
                names=["n_changed"],
            ),
            batch_format="pyarrow",
        ).sum("n_changed")
        labels = new_labels.drop_columns(["old_label"])
        if changed == 0:
            break
    else:
        raise RuntimeError(f"cluster_pairs did not converge in {max_rounds} rounds")
    return labels
