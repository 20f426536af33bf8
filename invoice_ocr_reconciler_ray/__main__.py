"""CLI entry points — the engine's analogue of the reference's HTTP surface
(upload/extract ≙ ``extract``, reconcile+resume ≙ ``run``, stats ≙ ``stats``;
frontend/src/api.js:26-57 maps the reference's full surface).

This is the ONE module (besides bench.py and the pytest fixture) that owns a
Ray session; library code never calls ``ray.init``.

Usage:
  python -m invoice_ocr_reconciler_ray extract --sf-dir /root/testdata/sf0.001 --out /tmp/out
  python -m invoice_ocr_reconciler_ray run --sf-dir ... --out /tmp/ckpt [--partitions 8]
  python -m invoice_ocr_reconciler_ray run-files --input /tmp/bucketed --out /tmp/ckpt
  python -m invoice_ocr_reconciler_ray stats --out /tmp/ckpt
  python -m invoice_ocr_reconciler_ray patch --input /tmp/out --overlay links.json --key url --out /tmp/patched
  python -m invoice_ocr_reconciler_ray report --input /tmp/out
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="invoice_ocr_reconciler_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="flagship extract→dedup→reconcile → parquet")
    pe.add_argument("--sf-dir", required=True)
    pe.add_argument("--out", required=True)

    pr = sub.add_parser("run", help="checkpointed partitioned run (resumable)")
    pr.add_argument("--sf-dir", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--partitions", type=int, default=8)

    pf = sub.add_parser("run-files", help="checkpointed run over bucket= layout")
    pf.add_argument("--input", required=True)
    pf.add_argument("--out", required=True)
    pf.add_argument(
        "--concurrency",
        type=int,
        default=4,
        help="buckets run at once (num_cpus=0 Ray task per bucket)",
    )

    ps = sub.add_parser("stats", help="manifest totals for a checkpointed run")
    ps.add_argument("--out", required=True)

    pp = sub.add_parser(
        "patch",
        help="apply an idempotent overlay (manual link / field update / delete) "
        "to run output (≙ reference PUT/DELETE/link endpoints)",
    )
    pp.add_argument("--input", required=True, help="parquet dir (e.g. extract/run output)")
    pp.add_argument(
        "--overlay",
        required=True,
        help="JSON file: list of patch rows — key column + fields to set "
        "(absent/null = unchanged), optional \"deleted\": true tombstone",
    )
    pp.add_argument("--key", required=True, help="key column name")
    pp.add_argument("--out", required=True)

    pt = sub.add_parser(
        "report",
        help="text run-summary (counts per match_status) from extract/run "
        "output (≙ reference summary/PDF report endpoints)",
    )
    pt.add_argument("--input", required=True, help="verdict parquet dir")
    pt.add_argument("--status-col", default="match_status")

    args = p.parse_args(argv)

    if args.cmd == "stats":  # no Ray needed
        from invoice_ocr_reconciler_ray.state.manifest import RunManifest

        print(json.dumps(RunManifest(args.out).totals(), sort_keys=True))
        return 0

    ray = _ray_session(args.num_cpus)
    try:
        if args.cmd == "extract":
            from invoice_ocr_reconciler_ray.pipelines.flagship import run_flagship

            run_flagship(args.sf_dir).write_parquet(args.out)
            print(json.dumps({"status": "ok", "out": args.out}))
        elif args.cmd == "run":
            from invoice_ocr_reconciler_ray.pipelines.runner import run_checkpointed

            totals = run_checkpointed(args.sf_dir, args.out, num_partitions=args.partitions)
            print(json.dumps(totals, sort_keys=True))
        elif args.cmd == "run-files":
            from invoice_ocr_reconciler_ray.pipelines.runner import run_checkpointed_files

            totals = run_checkpointed_files(
                args.input, args.out, concurrency=args.concurrency
            )
            print(json.dumps(totals, sort_keys=True))
        elif args.cmd == "report":
            import pyarrow as pa
            import ray.data as rd
            from ray.data.aggregate import Count

            from invoice_ocr_reconciler_ray.stages.report import summary_report_lines

            agg = (
                rd.read_parquet(args.input, columns=[args.status_col])
                .groupby(args.status_col)
                .aggregate(Count(alias_name="n"))
            )
            tiny = pa.Table.from_pylist(agg.take_all())
            out = summary_report_lines(tiny, status_col=args.status_col, n_col="n")
            for line in out["line"].to_pylist():
                print(line)
        elif args.cmd == "patch":
            import pyarrow as pa
            import ray.data as rd

            from invoice_ocr_reconciler_ray.stages.overlay import apply_overlay

            with open(args.overlay) as f:
                rows = json.load(f)
            overlay = pa.Table.from_pylist(rows)
            ds = rd.read_parquet(args.input)
            apply_overlay(ds, overlay, key_col=args.key).write_parquet(args.out)
            print(json.dumps({"status": "ok", "patch_rows": len(rows), "out": args.out}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
