"""`ray job submit` entrypoint — the deployment artifact for fixed-size
multi-node clusters (BASELINE.json north_rule: "run via ray job submit on a
fixed-size multi-node Ray cluster at two cluster sizes").

On a real cluster::

  ray job submit --address http://<head>:8265 \
      --working-dir . \
      -- python scripts/ray_job.py --input <bucketed-pages-dir> --out <out-dir>

The job connects to the EXISTING cluster (``ray.init(address="auto")``), so
the same command measured at N and 4N nodes is the north-rule scaling pair;
in this sandbox ``--local-cpus`` substitutes a local session (that mode is
what bench.py --scaling automates, with same-run CPU controls).

Input layouts:
  * a hive ``bucket=K`` directory (from ``prepare_partitioned_input`` /
    ``bench.ensure_bucketed_cache``) → resumable checkpointed run with
    per-partition lineage + metrics in <out>/manifest.jsonl;
  * any pages parquet dir (``--mode broadcast``) → one streaming flagship
    pass (fastest single-run path; dedup via the broadcast winner map).

Prints ONE JSON line: manifest totals (or row count), wall seconds, and
docs/sec — the metrics a driver at two cluster sizes compares.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `ray job submit --working-dir .` runs this file from scripts/; make the
# repo root importable without an install step
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ray_job")
    p.add_argument("--input", required=True, help="pages parquet dir (bucketed or flat)")
    p.add_argument("--out", required=True)
    p.add_argument(
        "--mode",
        choices=["checkpointed", "broadcast"],
        default="checkpointed",
        help="checkpointed = resumable per-bucket run (needs bucket= layout); "
        "broadcast = one streaming flagship pass",
    )
    p.add_argument(
        "--concurrency",
        type=int,
        default=4,
        help="checkpointed mode: buckets run at once (one num_cpus=0 Ray "
        "task per bucket; on a cluster this spreads buckets across nodes)",
    )
    p.add_argument(
        "--local-cpus",
        type=int,
        default=None,
        help="sandbox substitute: local session with this many CPUs "
        "(omit on a real cluster — the job attaches to it)",
    )
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        if args.local_cpus:
            ray.init(
                address="local",
                num_cpus=args.local_cpus,
                include_dashboard=False,
                logging_level="ERROR",
            )
        else:
            # on a cluster, `ray job submit` has already started the runtime;
            # attach to it
            ray.init(address="auto", logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    if args.mode == "checkpointed":
        from invoice_ocr_reconciler_ray.pipelines.runner import run_checkpointed_files

        totals = run_checkpointed_files(
            args.input, args.out, concurrency=args.concurrency
        )
        wall = time.perf_counter() - t0
        totals.update(
            {
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(totals["rows_out"] / wall, 1) if wall else None,
            }
        )
        print(json.dumps(totals, sort_keys=True))
    else:
        import ray.data as rd

        from invoice_ocr_reconciler_ray.pipelines.flagship import flagship

        verdicts = flagship(
            rd.read_parquet(args.input),
            side_ds=rd.read_parquet(args.input, columns=["url", "warc_ts", "html"]),
            side_narrow_ds=rd.read_parquet(args.input, columns=["url"]),
        )
        verdicts.write_parquet(args.out)
        import pyarrow.dataset as pads

        n = pads.dataset(args.out, format="parquet").count_rows()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "rows_out": n,
                    "wall_sec": round(wall, 3),
                    "docs_per_sec": round(n / wall, 1) if wall else None,
                },
                sort_keys=True,
            )
        )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
