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


def test_cli_patch(tmp_path):
    """patch subcommand: manual-link one url of the extract output, verify
    the patched field and that every other row is untouched."""
    import pyarrow.dataset as pads

    src = str(tmp_path / "x")
    _run(["extract", "--sf-dir", "/root/testdata/sf0.001", "--out", src])
    before = pads.dataset(src, format="parquet").to_table(
        columns=["url", "match_status"]
    )
    url = before.column("url")[0].as_py()
    ov = tmp_path / "ov.json"
    ov.write_text(json.dumps([
        {"url": url, "match_status": "matched", "flag_reason": "Manually reconciled",
         "confidence_score": 100.0}
    ]))
    out = _run(["patch", "--input", src, "--overlay", str(ov), "--key", "url",
                "--out", str(tmp_path / "patched")])
    assert out["status"] == "ok" and out["patch_rows"] == 1
    after = pads.dataset(str(tmp_path / "patched"), format="parquet").to_table(
        columns=["url", "match_status", "flag_reason"]
    )
    got = {u: (s, r) for u, s, r in zip(
        after.column("url").to_pylist(),
        after.column("match_status").to_pylist(),
        after.column("flag_reason").to_pylist(),
    )}
    assert got[url] == ("matched", "Manually reconciled")
    assert after.num_rows == before.num_rows
    want = dict(zip(before.column("url").to_pylist(), before.column("match_status").to_pylist()))
    unchanged = [u for u in want if u != url]
    assert all(got[u][0] == want[u] for u in unchanged)
