"""CLI smoke: extract → parquet, checkpointed run + stats, via subprocess
(each CLI invocation owns its own Ray session)."""

import json
import subprocess
import sys


def _run(args):
    r = subprocess.run(
        [sys.executable, "-m", "invoice_ocr_reconciler_ray", "--num-cpus", "2", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_extract_and_run(tmp_path):
    out = _run(["extract", "--sf-dir", "/root/testdata/sf0.001", "--out", str(tmp_path / "x")])
    assert out["status"] == "ok"

    totals = _run(
        ["run", "--sf-dir", "/root/testdata/sf0.001", "--out", str(tmp_path / "ck"),
         "--partitions", "2"]
    )
    assert totals["partitions_done"] == 2
    stats = _run(["stats", "--out", str(tmp_path / "ck")])
    assert stats["rows_out"] == totals["rows_out"]
