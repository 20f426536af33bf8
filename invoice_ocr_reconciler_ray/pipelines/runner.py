"""Checkpointed partition runner — resumable flagship execution.

Partitioning contract: the partition key is ``hash(doc_id) == hash(url
source)`` — the SAME key the dedup stage groups on — so every row of a given
url lands in exactly one partition and per-partition dedup equals global
dedup.  (At deployment scale partitions map to input file groups; the
sandbox's single-file testdata is range-partitioned by ``doc_id % P``
instead, which re-scans the file per partition — acceptable at test scale
and irrelevant once inputs are many files.)

Determinism: ``session_id`` is a content hash of (input, config, P) — never
wall-clock (≙ replacing uuidv4/Date.now(), SURVEY §4.3.3) — so a resumed run
and an uninterrupted run produce byte-identical outputs (tested).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data as rd

from ..config import RunConfig
from ..sources.pages import pages_batch_from_documents
from ..state.manifest import RunManifest
from .flagship import flagship


def _session_id(sf_dir: str, num_partitions: int, cfg: RunConfig) -> str:
    key = json.dumps(
        {"input": sf_dir, "p": num_partitions, "cfg": repr(cfg)}, sort_keys=True
    ).encode()
    return hashlib.blake2b(key, digest_size=8).hexdigest()


def _clear_stale_outputs(tmp: str, final: str) -> None:
    """Remove leftovers from a killed run so the re-run can't wedge.

    Two crash windows exist: (a) mid-write → a half-written ``tmp`` dir;
    (b) between ``os.rename(tmp, final)`` and ``manifest.record()`` → an
    orphaned ``final`` dir that is NOT in the manifest.  Case (b) previously
    made resume fail forever: the partition is re-run (not in done_parts) and
    the rename lands on an existing non-empty dir (ENOTEMPTY).  A final dir
    without a manifest entry is by definition unrecorded work — deleting and
    re-running it is safe (outputs are deterministic) and unwedges the run."""
    import shutil

    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # half-written leftover from a kill
    if os.path.exists(final):
        shutil.rmtree(final)  # orphaned final from a kill before manifest.record


def run_checkpointed(
    sf_dir: str,
    out_dir: str,
    *,
    num_partitions: int = 8,
    stop_after: int | None = None,
    cfg: RunConfig | None = None,
) -> dict[str, Any]:
    """Run the flagship pipeline partition-by-partition with a manifest.

    ``stop_after=k`` stops after k newly-completed partitions (the test's
    stand-in for a mid-run kill).  Re-invoking with the same ``out_dir``
    resumes: done partitions are skipped, their outputs untouched.
    Returns the manifest totals.
    """
    cfg = cfg or RunConfig()
    manifest = RunManifest(out_dir)
    done = manifest.done_parts()
    session = _session_id(sf_dir, num_partitions, cfg)
    completed_now = 0

    for p in range(num_partitions):
        part_id = f"part-{p:05d}"
        if part_id in done:
            continue
        if stop_after is not None and completed_now >= stop_after:
            break

        docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
        pmod = num_partitions

        def select_part(t: pa.Table, p=p, pmod=pmod) -> pa.Table:
            # range partition: doc_id % P == p (deterministic, dedup-key aligned)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % pmod) == p))

        pages = docs.map_batches(select_part, batch_format="pyarrow").map_batches(
            pages_batch_from_documents, batch_format="pyarrow"
        )

        def add_bytes(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_html_bytes", pc.cast(pc.binary_length(t["html"]), pa.int64())
            )

        pages = pages.map_batches(add_bytes, batch_format="pyarrow")
        verdicts = flagship(pages, cfg)

        def finalize(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return t.append_column("session_id", pa.array([session] * n, pa.string()))

        out = verdicts.map_batches(finalize, batch_format="pyarrow")

        tmp = os.path.join(out_dir, f".tmp-{part_id}")
        final = os.path.join(out_dir, part_id)
        _clear_stale_outputs(tmp, final)
        out.write_parquet(tmp)
        os.rename(tmp, final)

        # lineage metrics from the just-written partition (column-pruned read)
        written = pads.dataset(final, format="parquet").to_table(
            columns=["match_status", "_html_bytes"]
        )
        st = written.column("match_status").to_pylist()
        entry = {
            "part_id": part_id,
            "session_id": session,
            "status": "done",
            "rows_out": written.num_rows,
            "rows_in": written.num_rows,
            "bytes_html": int(pc.sum(written.column("_html_bytes")).as_py() or 0),
            "matched": st.count("matched"),
            "mismatched": st.count("mismatch"),
            "missing": st.count("missing"),
            "duplicate": st.count("duplicate"),
        }
        manifest.record(entry)
        completed_now += 1

    totals = manifest.totals()
    totals["session_id"] = session
    totals["partitions_done"] = len(manifest.done_parts())
    totals["num_partitions"] = num_partitions
    return totals


def prepare_partitioned_input(sf_dir: str, input_dir: str, *, num_buckets: int = 8) -> str:
    """Write the pages table in the DEPLOYMENT layout: hive-partitioned
    parquet on ``bucket = hash(url) % B``.  This is the 100 TB contract the
    file-partitioned runner relies on — all rows of a url live in exactly one
    bucket directory, so per-bucket dedup IS global dedup and a run touches
    each input byte once (no per-partition re-scan, no global shuffle)."""
    import shutil

    from ..functions.hashing import stable_hash64

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    pages = docs.map_batches(pages_batch_from_documents, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        buckets = [
            stable_hash64(u, salt="bucket") % num_buckets
            for u in t.column("url").to_pylist()
        ]
        # ingest-time dedup hash: hash payloads ONCE here so per-bucket dedup
        # side scans never re-read html bytes (the 100 TB dedup-index shape)
        hs = np.fromiter(
            (
                stable_hash64(r if r is not None else b"", salt="dedup")
                for r in t.column("html").to_pylist()
            ),
            np.uint64,
            count=t.num_rows,
        )
        return t.append_column(
            "bucket", pa.array(buckets, pa.int32())
        ).append_column("dedup_hash", pa.array(hs, pa.uint64()))

    shutil.rmtree(input_dir, ignore_errors=True)
    pages.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        input_dir, partition_cols=["bucket"], min_rows_per_file=8192
    )
    return input_dir


def _settle_fsspec_http_import() -> None:
    """Make concurrent Ray Data plan construction race-free in this sandbox.

    Ray's path resolution re-runs ``from fsspec.implementations.http import
    HTTPFileSystem`` on every read; with aiohttp absent that import FAILS
    each time, and two bucket threads failing it simultaneously can observe a
    partially-initialized module — surfacing as a plain ImportError that
    Ray's ``except ModuleNotFoundError`` doesn't catch.  Registering a
    sentinel module once makes the import a settled no-op; the sentinel class
    is only ever used in ``isinstance`` checks (local paths never reach it).
    """
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel — aiohttp absent, never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


def _run_one_bucket(
    input_dir: str,
    out_dir: str,
    bucket_dir: str,
    session: str,
    cfg: RunConfig,
    num_blocks: int | None = None,
) -> dict[str, Any]:
    """One bucket end-to-end: read its files → flagship → atomic write.
    Returns the manifest entry (the caller records it — keeps the manifest
    append on the coordinating driver).  Runs either on the driver
    (sequential path) or inside a ``num_cpus=0`` Ray task (concurrent path);
    Ray Data plans launched from within a task execute on the cluster like
    any other.

    Side-scan shape: when the bucketed layout carries the ingest-time
    ``dedup_hash`` column (see :func:`prepare_partitioned_input`), the dedup
    winner map is built from a payload-free (url, warc_ts, dedup_hash)
    projection + a url-only narrow count scan — the bucket's html bytes are
    read exactly ONCE, by the extraction main plan."""
    import glob

    import pyarrow.parquet as pq

    part_id = bucket_dir.replace("=", "-")
    files = sorted(glob.glob(os.path.join(input_dir, bucket_dir, "*.parquet")))
    has_hash = "dedup_hash" in pq.read_schema(files[0]).names
    # right-size this bucket's task count to its CPU share: C concurrent
    # buckets × (cpus/C) blocks ≈ one task per core — sliver-file inputs
    # otherwise fan out into hundreds of per-file tasks of pure overhead
    rkw = {"override_num_blocks": num_blocks} if num_blocks else {}

    def prep(t: pa.Table) -> pa.Table:
        if "dedup_hash" in t.column_names:
            t = t.drop_columns(["dedup_hash"])  # internal ingest column
        return t.append_column(
            "_html_bytes", pc.cast(pc.binary_length(t["html"]), pa.int64())
        )

    pages = rd.read_parquet(files, **rkw).map_batches(prep, batch_format="pyarrow")
    if has_hash:
        side_kw = {
            "side_ds": rd.read_parquet(
                files, columns=["url", "warc_ts", "dedup_hash"], **rkw
            ),
            "side_narrow_ds": rd.read_parquet(files, columns=["url"], **rkw),
            "side_hash_col": "dedup_hash",
        }
    else:  # legacy layout without the ingest hash: hash html in the side scan
        side_kw = {
            "side_ds": rd.read_parquet(
                files, columns=["url", "warc_ts", "html"], **rkw
            ),
            "side_narrow_ds": rd.read_parquet(files, columns=["url"], **rkw),
        }
    verdicts = flagship(pages, cfg, **side_kw)
    out = verdicts.map_batches(
        lambda t: t.append_column(
            "session_id", pa.array([session] * t.num_rows, pa.string())
        ),
        batch_format="pyarrow",
    )

    tmp = os.path.join(out_dir, f".tmp-{part_id}")
    final = os.path.join(out_dir, part_id)
    _clear_stale_outputs(tmp, final)
    out.write_parquet(tmp)
    os.rename(tmp, final)

    written = pads.dataset(final, format="parquet").to_table(
        columns=["match_status", "_html_bytes"]
    )
    st = written.column("match_status").to_pylist()
    return {
        "part_id": part_id,
        "session_id": session,
        "status": "done",
        "rows_out": written.num_rows,
        "rows_in": written.num_rows,
        "bytes_html": int(pc.sum(written.column("_html_bytes")).as_py() or 0),
        "matched": st.count("matched"),
        "mismatched": st.count("mismatch"),
        "missing": st.count("missing"),
        "duplicate": st.count("duplicate"),
    }


def run_checkpointed_files(
    input_dir: str,
    out_dir: str,
    *,
    stop_after: int | None = None,
    cfg: RunConfig | None = None,
    concurrency: int = 1,
) -> dict[str, Any]:
    """File-partitioned checkpointed run over a ``bucket=N`` hive layout
    (see :func:`prepare_partitioned_input`).  One partition = one bucket
    directory: read just those files → flagship → atomic write + manifest
    record.  Unlike :func:`run_checkpointed` (which range-partitions a
    single-file input by key modulo and re-scans), this touches each input
    byte exactly once per completed partition — the shape a 10^12-row job
    actually runs.

    ``concurrency`` > 1 runs that many buckets at once (VERDICT r4 #2) —
    the single-node stand-in for a cluster executing buckets on different
    nodes.  Each bucket runs inside its own ``num_cpus=0`` Ray TASK (its own
    worker process): Ray Data plans launched from within a task execute on
    the cluster normally, and per-process isolation means the concurrent
    streaming executors don't fight over one driver GIL (a thread pool in
    one driver measured ~2× slower at the same concurrency).  The zero-CPU
    reservation is deliberate — the coordinating task only launches plans;
    the plans' own tasks claim the CPUs.  Buckets stay independent —
    distinct output dirs, atomic rename per bucket, manifest recorded by the
    coordinator as each bucket completes — so crash/resume semantics are
    unchanged from the sequential path and the combined output is
    byte-identical to the broadcast flagship (the bench's ``--partitioned``
    hash proves it)."""
    cfg = cfg or RunConfig()
    manifest = RunManifest(out_dir)
    done = manifest.done_parts()
    buckets = sorted(
        d for d in os.listdir(input_dir) if d.startswith("bucket=")
    )
    session = _session_id(input_dir, len(buckets), cfg)

    pending = [b for b in buckets if b.replace("=", "-") not in done]
    if stop_after is not None:
        pending = pending[:stop_after]

    if pending:
        import ray

        try:
            total_cpus = int(ray.cluster_resources().get("CPU", 0)) or None
        except Exception:
            total_cpus = None
        num_blocks = (
            max(4, total_cpus // max(1, concurrency)) if total_cpus else None
        )
        if concurrency <= 1:
            for b in pending:
                manifest.record(
                    _run_one_bucket(
                        input_dir, out_dir, b, session, cfg, num_blocks
                    )
                )
        else:
            _settle_fsspec_http_import()
            run_remote = ray.remote(num_cpus=0)(_run_one_bucket)
            queue = list(pending)
            running: list = []
            while queue or running:
                while queue and len(running) < concurrency:
                    running.append(
                        run_remote.remote(
                            input_dir,
                            out_dir,
                            queue.pop(0),
                            session,
                            cfg,
                            num_blocks,
                        )
                    )
                ready, rest = ray.wait(running, num_returns=1)
                for entry in ray.get(ready):  # propagate the first failure
                    manifest.record(entry)
                running = list(rest)

    totals = manifest.totals()
    totals["session_id"] = session
    totals["partitions_done"] = len(manifest.done_parts())
    totals["num_partitions"] = len(buckets)
    return totals


def read_run_output(out_dir: str):
    """The combined verdict Dataset from all completed partitions."""
    import glob

    manifest = RunManifest(out_dir)
    files = []
    for p in sorted(manifest.done_parts()):
        files.extend(sorted(glob.glob(os.path.join(out_dir, p, "*.parquet"))))
    return rd.read_parquet(files)
