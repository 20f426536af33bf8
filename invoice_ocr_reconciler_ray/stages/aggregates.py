"""Aggregation stages — run summary, dashboard stats, monthly buckets.

≙ the reference's summary object (reconciliationEngine.js:201-210), the
7-query dashboard (server.js:244-257) and the monthly GROUP BY
(server.js:260-267).  All are partial+final aggregations Ray Data handles
natively; the only shuffle is the (tiny) month-key groupby.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _indicator_batch(batch: pa.Table) -> pa.Table:
    """Per-status 0/1 indicator columns so one aggregate pass yields every
    status count (pre-aggregation happens inside Ray's partial+final Sum)."""
    st = batch.column("match_status")
    cols = {
        f"is_{s}": pc.cast(pc.equal(st, s), pa.int64())
        for s in ("matched", "mismatch", "missing", "duplicate")
    }
    out = batch.select(["url"]).append_column(
        "n_chars", pc.cast(pc.utf8_length(pc.cast(batch.column("extracted_text"), pa.large_string())), pa.int64())
    )
    for k, v in cols.items():
        out = out.append_column(k, v)
    out = out.append_column("discrepancy", batch.column("discrepancy"))
    return out


def run_summary(verdicts) -> dict:
    """Global run summary (single distributed aggregate pass → tiny dict).

    ≙ reconciliationEngine.js:201-210: counts per status + totals.  Statuses
    partition the input: sum of the four counts == total rows (tested)."""
    ind = verdicts.map_batches(_indicator_batch, batch_format="pyarrow")
    row = ind.aggregate(
        Count(alias_name="total_rows"),
        Sum("is_matched", alias_name="matched"),
        Sum("is_mismatch", alias_name="mismatched"),
        Sum("is_missing", alias_name="missing"),
        Sum("is_duplicate", alias_name="duplicate"),
        Sum("n_chars", alias_name="total_chars_extracted"),
        Sum("discrepancy", alias_name="total_discrepancy"),
    )
    return dict(row)


def monthly_counts(ds, ts_col: str = "warc_ts", value_col: str | None = None):
    """GROUP BY month(ts) → count (+ optional sum), ≙ server.js:260-267.

    Shuffle key: the derived ``month`` string — at most a few hundred
    distinct values, so the exchange is trivial after per-batch partials."""

    def add_month(batch: pa.Table) -> pa.Table:
        month = pc.strftime(batch.column(ts_col), format="%Y-%m")
        return batch.append_column("month", month)

    keep = [ts_col] + ([value_col] if value_col else [])
    base = ds.select_columns(keep).map_batches(add_month, batch_format="pyarrow")
    aggs = [Count(alias_name="n")]
    if value_col:
        aggs.append(Sum(value_col, alias_name=f"sum_{value_col}"))
    return base.groupby("month").aggregate(*aggs)


def dashboard_stats(verdicts) -> dict:
    """≙ the 7-aggregate dashboard endpoint (server.js:244-257), computed in
    ONE pass instead of seven queries."""
    s = run_summary(verdicts)
    s["flagged"] = s["mismatched"] + s["missing"] + s["duplicate"]
    return s


def status_counts(verdicts):
    """Per-status counts as a Dataset (groupby form, for the oracle check)."""
    return verdicts.groupby("match_status").aggregate(Count(alias_name="n"))


__all__ = [
    "run_summary",
    "monthly_counts",
    "dashboard_stats",
    "status_counts",
    "Count",
    "Sum",
    "Mean",
    "Min",
    "Max",
]
