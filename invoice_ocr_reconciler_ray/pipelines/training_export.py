"""End-to-end training-set export — the composed pipeline a pretraining
data team actually ships: curate (quality + exact dedup + near-dup) →
decontaminate → fixed-window chunk → deterministic global shuffle →
sharded parquet write with a resume manifest.

Composition of already-verified stages (each oracle- or pytest-proven on
its own): ``pipelines/curation.curate_documents`` (ONE fused corpus pass),
the benchmark-needle scrub from ``pipelines/queries.docs_decontaminate``,
the chunk explosion from ``docs_char_chunks``, and
``stages/rank.global_rank`` for the reproducible training order.

Scale shape:
- keep-verdicts meet the corpus through ONE hash join on doc_id (both
  sides co-partition; at 100 TB pre-bucket both sides with
  ``stages/bucketing`` and the join is per-bucket local);
- the shuffle-rank moves only (chunk_uid, md5) pairs;
- output is ``shard=NN/`` partitioned parquet (round-robin on the global
  position, so shards are size-balanced by construction) — a failed run
  resumes by manifest: the export is atomic-per-directory and re-invoking
  with the same inputs SKIPS completed work (tested).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import stable_hash64
from ..state.manifest import RunManifest

#: chunk_uid = doc_id * 2^20 + chunk_idx — valid while docs stay under
#: 2^20 chunks (= 200 MB of text at the 200-char window); guarded below.
_CHUNK_SHIFT = 20


def export_training_set(
    sf_dir: str,
    out_dir: str,
    *,
    chunk_w: int = 200,
    n_shards: int = 8,
    needles: tuple[str, ...] | None = None,
) -> dict:
    """Run the composed export; returns summary stats.  Idempotent: a
    completed export (manifest status=done for this input fingerprint) is
    never recomputed."""
    from .curation import curate_documents
    from .queries import _CONTAM_NEEDLES
    from ..stages.rank import global_rank

    needles = _CONTAM_NEEDLES if needles is None else needles
    st = os.stat(f"{sf_dir.rstrip('/')}/documents.parquet")
    fingerprint = f"{sf_dir}|{chunk_w}|{n_shards}|{st.st_size}|{st.st_mtime_ns}"
    part_id = f"export-{stable_hash64(fingerprint):016x}"
    manifest = RunManifest(out_dir)
    for e in manifest.entries():
        if e.get("part_id") == part_id and e.get("status") == "done":
            return {k: e[k] for k in ("rows_in", "rows_out", "n_shards", "order_hash")}

    verdicts = curate_documents(sf_dir).select_columns(["doc_id", "kept"])
    docs = rd.read_parquet(
        f"{sf_dir.rstrip('/')}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    # exact row count straight from the parquet footer metadata — a
    # Dataset.count() here would be a whole extra scan of the corpus
    import pyarrow.parquet as pq

    rows_in = pq.ParquetFile(f"{sf_dir.rstrip('/')}/documents.parquet").metadata.num_rows
    # partition count sized to the data: the hash-join actor fleet has a
    # fixed per-partition spin-up cost (CLAUDE.md: 8 partitions was the
    # measured optimum at 600k rows — ~75k rows/partition), so tiny inputs
    # get a minimal fleet and big inputs scale up
    npart = max(2, min(64, rows_in // 75_000))
    joined = docs.join(
        verdicts, join_type="inner", num_partitions=npart, on=("doc_id",)
    )

    def keep_and_chunk(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            t["kept"].combine_chunks(),
            pc.invert(_contaminated(t["text"].combine_chunks(), needles)),
        )
        t = t.filter(keep)
        txt = t["text"].combine_chunks()
        doc_ids = t["doc_id"].combine_chunks()
        langs = t["lang"].combine_chunks()
        lens = pc.utf8_length(txt)
        max_len = pc.max(lens).as_py() or 0
        if max_len >= chunk_w << _CHUNK_SHIFT:
            raise ValueError("document too large for the chunk_uid encoding")
        parts = []
        k = 0
        while k * chunk_w < max_len:
            m = pc.greater(lens, k * chunk_w)
            ids = doc_ids.filter(m)
            parts.append(
                pa.table(
                    {
                        "chunk_uid": pc.add(
                            pc.multiply(ids, pa.scalar(1 << _CHUNK_SHIFT, pa.int64())),
                            pa.scalar(k, pa.int64()),
                        ),
                        "doc_id": ids,
                        "chunk_idx": pa.array([k] * len(ids), pa.int64()),
                        "lang": langs.filter(m),
                        "chunk_text": pc.utf8_slice_codeunits(
                            txt, k * chunk_w, (k + 1) * chunk_w
                        ).filter(m),
                    }
                )
            )
            k += 1
        if not parts:
            return pa.table(
                {
                    "chunk_uid": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(parts)

    chunks = joined.map_batches(keep_and_chunk, batch_format="pyarrow").materialize()
    ranks = global_rank(chunks.select_columns(["chunk_uid"]), id_col="chunk_uid")
    with_pos = chunks.join(ranks, join_type="inner", num_partitions=npart, on=("chunk_uid",))

    def shard_col(t: pa.Table) -> pa.Table:
        return t.append_column(
            "shard",
            pc.cast(
                pc.subtract(
                    t["pos"], pc.multiply(pc.divide(t["pos"], n_shards), n_shards)
                ),
                pa.int64(),
            ),
        )

    final = with_pos.map_batches(shard_col, batch_format="pyarrow")
    data_dir = os.path.join(out_dir, "data")
    final.write_parquet(data_dir, partition_cols=["shard"])

    # order fingerprint: commutative XOR of per-row (pos, chunk_uid) hashes —
    # identical at any parallelism iff the global order is identical.
    # Computed from the WRITTEN shards (a two-column pruned read of the
    # output), never by re-consuming ``final``: a lazy Dataset consumed a
    # second time would re-execute the whole rank+join plan.
    def order_partial(t: pa.Table):
        acc = 0
        for p, u in zip(t["pos"].to_pylist(), t["chunk_uid"].to_pylist()):
            acc ^= stable_hash64(f"{p}:{u}", salt="order")
        return {"acc": [acc & ((1 << 63) - 1)], "n": [t.num_rows]}  # int64-safe

    written = rd.read_parquet(data_dir, columns=["pos", "chunk_uid"])
    acc, rows_out = 0, 0
    for row in written.map_batches(order_partial, batch_format="pyarrow").iter_rows():
        acc ^= int(row["acc"])
        rows_out += int(row["n"])

    stats = {
        "rows_in": rows_in,
        "rows_out": rows_out,
        "n_shards": n_shards,
        "order_hash": f"{acc:016x}",
    }
    manifest.record({"part_id": part_id, "status": "done", "seq": 0, **stats})
    return stats


def export_web_training_set(
    verdicts,
    out_dir: str,
    *,
    fingerprint: str,
    chunk_w: int = 200,
    n_shards: int = 8,
    min_confidence: int = 50,
) -> dict:
    """The NORTH-STAR composition end-to-end: web pages → the real
    extraction engine → quality gate → fixed-window chunking → reproducible
    global shuffle → sharded parquet with a resume manifest.

    ``verdicts`` is the flagship's output Dataset (pages already extracted,
    deduped and reconciled); the gate keeps rows that are not duplicates,
    decoded cleanly (no row-level error), met the confidence floor and
    produced text.  Chunk ids are ``url#k`` strings (urls are unique among
    kept rows — dedup is first-wins per url), ranked by
    ``stages/rank.global_rank`` (md5 order, O(256) driver state), sharded
    round-robin on the exact global position.  Idempotent per
    ``fingerprint``: a completed export is never recomputed."""
    from ..stages.rank import global_rank

    part_id = f"webexport-{stable_hash64(fingerprint):016x}"
    manifest = RunManifest(out_dir)
    for e in manifest.entries():
        if e.get("part_id") == part_id and e.get("status") == "done":
            return {
                k: e[k] for k in ("rows_kept", "rows_out", "n_shards", "order_hash")
            }

    cols = verdicts.select_columns(
        ["url", "lang", "extracted_text", "confidence", "is_duplicate", "error"]
    )

    def gate_and_chunk(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.invert(t["is_duplicate"].combine_chunks()),
                pc.is_null(t["error"].combine_chunks()),
            ),
            pc.greater_equal(t["confidence"].combine_chunks(), min_confidence),
        )
        t = t.filter(keep)
        txt = pc.cast(t["extracted_text"].combine_chunks(), pa.string())
        lens = pc.utf8_length(txt)
        nonempty = pc.greater(lens, 0)
        t = t.filter(nonempty)
        txt = txt.filter(nonempty)
        lens = pc.utf8_length(txt)
        urls = t["url"].combine_chunks()
        langs = t["lang"].combine_chunks()
        max_len = pc.max(lens).as_py() or 0
        parts = []
        k = 0
        while k * chunk_w < max_len:
            m = pc.greater(lens, k * chunk_w)
            u = urls.filter(m)
            parts.append(
                pa.table(
                    {
                        "chunk_uid": pc.binary_join_element_wise(
                            u, pa.array([f"#{k}"] * len(u), pa.string()), ""
                        ),
                        "url": u,
                        "chunk_idx": pa.array([k] * len(u), pa.int64()),
                        "lang": langs.filter(m),
                        "chunk_text": pc.utf8_slice_codeunits(
                            txt, k * chunk_w, (k + 1) * chunk_w
                        ).filter(m),
                        "kept_row": pa.array([k == 0] * len(u), pa.bool_()),
                    }
                )
            )
            k += 1
        if not parts:
            return pa.table(
                {
                    "chunk_uid": pa.array([], pa.string()),
                    "url": pa.array([], pa.string()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "lang": pa.array([], pa.string()),
                    "chunk_text": pa.array([], pa.string()),
                    "kept_row": pa.array([], pa.bool_()),
                }
            )
        return pa.concat_tables(parts)

    chunks = cols.map_batches(gate_and_chunk, batch_format="pyarrow").materialize()
    rows_kept = int(
        chunks.map_batches(
            lambda t: {"n": [pc.sum(pc.cast(t["kept_row"], pa.int64())).as_py() or 0]},
        ).sum("n")
    )
    npart = max(2, min(64, chunks.count() // 75_000))
    ranks = global_rank(chunks.select_columns(["chunk_uid"]), id_col="chunk_uid")
    with_pos = chunks.drop_columns(["kept_row"]).join(
        ranks, join_type="inner", num_partitions=npart, on=("chunk_uid",)
    )

    def shard_col(t: pa.Table) -> pa.Table:
        return t.append_column(
            "shard",
            pc.cast(
                pc.subtract(
                    t["pos"], pc.multiply(pc.divide(t["pos"], n_shards), n_shards)
                ),
                pa.int64(),
            ),
        )

    data_dir = os.path.join(out_dir, "data")
    with_pos.map_batches(shard_col, batch_format="pyarrow").write_parquet(
        data_dir, partition_cols=["shard"]
    )

    def order_partial(t: pa.Table):
        acc = 0
        for p, u in zip(t["pos"].to_pylist(), t["chunk_uid"].to_pylist()):
            acc ^= stable_hash64(f"{p}:{u}", salt="order")
        return {"acc": [acc & ((1 << 63) - 1)], "n": [t.num_rows]}

    written = rd.read_parquet(data_dir, columns=["pos", "chunk_uid"])
    acc, rows_out = 0, 0
    for row in written.map_batches(order_partial, batch_format="pyarrow").iter_rows():
        acc ^= int(row["acc"])
        rows_out += int(row["n"])

    stats = {
        "rows_kept": rows_kept,
        "rows_out": rows_out,
        "n_shards": n_shards,
        "order_hash": f"{acc:016x}",
    }
    manifest.record({"part_id": part_id, "status": "done", "seq": 0, **stats})
    return stats


def _contaminated(txt: pa.Array, needles: tuple[str, ...]) -> pa.Array:
    hit = None
    for nd in needles:
        m = pc.match_substring(txt, nd)
        hit = m if hit is None else pc.or_(hit, m)
    return hit if hit is not None else pa.array([False] * len(txt), pa.bool_())
