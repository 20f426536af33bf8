"""Run manifest — per-partition lineage + metrics, checkpoint/resume.

≙ the reference's ``reconciliation_sessions`` row (db.js:149-159, written at
server.js:542-545) generalized to a batch-pipeline checkpoint (SURVEY §4.3.2):
each completed partition appends one JSONL record with lineage (rows in/out,
bytes) and the reference's summary metrics (matched/mismatched/missing/
duplicate counts ≙ reconciliationEngine.js:201-210).  Resume = read manifest,
skip done partitions (≙ the reconcilable-status filter F5, server.js:521),
process the rest.  Output directories are written atomically (tmp → rename)
so a partition is either fully present or absent — never half-written.
"""

from __future__ import annotations

import json
import os
from typing import Any


class RunManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "manifest.jsonl")

    def entries(self) -> list[dict[str, Any]]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def done_parts(self) -> set[str]:
        return {e["part_id"] for e in self.entries() if e.get("status") == "done"}

    def record(self, entry: dict[str, Any]) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(entry, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def totals(self) -> dict[str, int]:
        """Cross-partition aggregate (≙ the reference's session summary and
        the client-side cross-session totals, Reports.jsx:60-63)."""
        keys = ("rows_in", "rows_out", "matched", "mismatched", "missing", "duplicate")
        tot = dict.fromkeys(keys, 0)
        for e in self.entries():
            if e.get("status") != "done":
                continue
            for k in keys:
                tot[k] += int(e.get(k, 0))
        return tot

    def recent(self, n: int = 20) -> list[dict[str, Any]]:
        """The n most recent completed runs, newest first (≙ T3: the
        reference's session-history listing, server.js top-20 sessions) —
        ordered by the deterministic run sequence number, never wall-clock."""
        done = [e for e in self.entries() if e.get("status") == "done"]
        done.sort(key=lambda e: (e.get("seq", 0), e.get("part_id", "")), reverse=True)
        return done[:n]
