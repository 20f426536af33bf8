"""Near-duplicate detection suite: MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine.

Scale shape (the published MinHash-LSH pipeline expressed Ray-Data-first):

    map_batches: shingle → minhash signature per doc      (stateless, vectorized numpy)
    flat_map-in-batch: explode to (band_key, doc) rows    (bands × docs rows)
    groupby(band_key): bucket                              ← the ONE shuffle, key = band hash
    within bucket: candidate pairs (buckets are tiny; a giant bucket is a
                   degenerate band — capped and logged, not exploded O(n²))
    verify: exact Jaccard on the candidate pairs only

SimHash buckets by rotated hash prefixes (hamming-ball probing); the
embedding variant buckets by coarse LSH (random hyperplane signs) and
verifies cosine within buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import (
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_signature,
    simhash64,
    stable_hash64,
    word_ngrams,
)

_PAIR_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("similarity", pa.float64())]
)
_MAX_BUCKET = 200  # a bucket bigger than this is a degenerate band: cap pairs


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


def minhash_neardup_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
):
    """Dataset(docs) → Dataset(id_a, id_b, similarity) of verified near-dups.

    similarity = exact shingle-set Jaccard of the candidate pair (verified
    after LSH bucketing, so false-positive bands are filtered out).
    """

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_band: list[int] = []
        out_id: list[int] = []
        out_text: list[str] = []
        for i, t in zip(ids, texts):
            sig = minhash_signature(t or "", num_perm, shingle_k)
            for key in lsh_band_keys(sig, bands):
                out_band.append(key)
                out_id.append(int(i))
                out_text.append(t or "")
        return pa.Table.from_arrays(
            [
                pa.array(out_band, pa.int64() if False else pa.uint64()),
                pa.array(out_id, pa.int64()),
                pa.array(out_text, pa.large_string()),
            ],
            names=["band_key", "doc_id_", "text_"],
        )

    exploded = ds.map_batches(sig_batch, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id_").to_pylist()
        texts = group.column("text_").to_pylist()
        uniq: dict[int, str] = {}
        for i, t in zip(ids, texts):
            uniq[i] = t
        items = sorted(uniq.items())[:_MAX_BUCKET]
        pairs: dict[tuple[int, int], float] = {}
        for x in range(len(items)):
            sa = set(
                (items[x][1][i : i + shingle_k])
                for i in range(max(1, len(items[x][1]) - shingle_k + 1))
            )
            for y in range(x + 1, len(items)):
                sb = set(
                    (items[y][1][i : i + shingle_k])
                    for i in range(max(1, len(items[y][1]) - shingle_k + 1))
                )
                j = jaccard(sa, sb)
                if j >= threshold:
                    pairs[(items[x][0], items[y][0])] = round(j, 6)
        return _pairs_table(pairs)

    pairs = exploded.groupby("band_key").map_groups(bucket_pairs, batch_format="pyarrow")
    # same pair can surface from several bands → exact dedup on (id_a, id_b)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
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
        items = sorted(
            set(zip(group.column("doc_id_").to_pylist(), group.column("sim_").to_pylist()))
        )[:_MAX_BUCKET]
        pairs: dict[tuple[int, int], float] = {}
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                h = hamming64(int(items[x][1]), int(items[y][1]))
                if h <= max_hamming and items[x][0] != items[y][0]:
                    a, b = sorted((items[x][0], items[y][0]))
                    pairs[(a, b)] = float(64 - h) / 64.0
        return _pairs_table(pairs)

    pairs = exploded.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def ngram_jaccard_pairs(ds, *, text_col="text", id_col="doc_id", n: int = 3, threshold: float = 0.5):
    """Word n-gram Jaccard near-dup — bucketing key = rarest-first sampled
    n-grams (each doc emits a few anchor n-grams; docs sharing an anchor are
    candidates).  Exact Jaccard verified per candidate pair."""

    def anchors(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_a, out_i, out_t = [], [], []
        for i, t in zip(ids, texts):
            grams = word_ngrams(t or "", n)
            # 8 deterministic anchors: smallest hashed n-grams (min-wise sample)
            hs = sorted((stable_hash64(g, salt="anchor"), g) for g in set(grams))[:8]
            for hv, _ in hs:
                out_a.append(hv)
                out_i.append(int(i))
                out_t.append(t or "")
        return pa.Table.from_arrays(
            [pa.array(out_a, pa.uint64()), pa.array(out_i, pa.int64()), pa.array(out_t, pa.large_string())],
            names=["anchor", "doc_id_", "text_"],
        )

    exploded = ds.map_batches(anchors, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        uniq: dict[int, str] = dict(
            zip(group.column("doc_id_").to_pylist(), group.column("text_").to_pylist())
        )
        items = sorted(uniq.items())[:_MAX_BUCKET]
        sets = {i: set(word_ngrams(t, n)) for i, t in items}
        pairs: dict[tuple[int, int], float] = {}
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                j = jaccard(sets[items[x][0]], sets[items[y][0]])
                if j >= threshold:
                    pairs[(items[x][0], items[y][0])] = round(j, 6)
        return _pairs_table(pairs)

    pairs = exploded.groupby("anchor").map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
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
        ids = [ids[i] for i in order][:_MAX_BUCKET]
        embs = embs[order][:_MAX_BUCKET]
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
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


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

    Scale note: this sandbox implementation pulls the label table to the
    driver per round for the convergence check; at 10^12 docs labels are
    O(|docs|) — keep them distributed and detect convergence with a
    changed-row COUNT aggregate instead (same round structure, one extra
    tiny aggregate per round).
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    # edges both directions, as a plain table (candidate pair sets are tiny
    # relative to the corpus — that is the point of LSH)
    pt = pairs_ds.select_columns(["id_a", "id_b"]).to_pandas()
    labels = ids_ds.select_columns(["doc_id"]).map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("doc_id"), t.column("doc_id")], names=["doc_id", "cluster_id"]
        ),
        batch_format="pyarrow",
    )
    if len(pt) == 0:
        return labels

    import pandas as pd

    edges = pd.concat(
        [
            pt.rename(columns={"id_a": "src", "id_b": "dst"}),
            pt.rename(columns={"id_b": "src", "id_a": "dst"}),
        ]
    )[["src", "dst"]]
    edges_ref = ray.put(edges)

    for _ in range(max_rounds):
        # propose: every edge carries src's current label to dst
        def propose(t: pa.Table) -> pa.Table:
            e = ray.get(edges_ref)
            df = t.to_pandas().merge(e, left_on="doc_id", right_on="src", how="inner")
            out = df[["dst", "cluster_id"]].rename(columns={"dst": "doc_id"})
            return pa.Table.from_pandas(
                pd.concat([t.to_pandas()[["doc_id", "cluster_id"]], out]),
                preserve_index=False,
            )

        new_labels = (
            labels.map_batches(propose, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Min("cluster_id", alias_name="cluster_id"))
        )
        # converged? label tables are tiny (doc_id, int) — safe to pull; the
        # pull also CUTS the lineage so round k+1 doesn't re-execute round k
        old = labels.to_pandas().set_index("doc_id")["cluster_id"].sort_index()
        new_df = new_labels.to_pandas()
        labels = rd.from_pandas(new_df)
        if old.equals(new_df.set_index("doc_id")["cluster_id"].sort_index()):
            break
    else:
        raise RuntimeError(f"cluster_pairs did not converge in {max_rounds} rounds")
    return labels
