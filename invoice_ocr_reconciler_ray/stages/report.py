"""Report export + sorted paginated listing (≙ S6 / T1 / T2).

* ``export_csv`` — fixed-column projection → ``write_csv`` (≙ the 8-column
  CSV report ``server.js:577-602``; one file per block, resumable layout).
* ``paginated`` — ``ORDER BY .. LIMIT n OFFSET o`` (≙ ``server.js:363-367``).
  Offset pagination has no efficient distributed analogue (SURVEY §7.4): this
  implementation is exact but fetches ``offset+n`` rows; for deep paging use
  ``keyset_page`` (seek method), which streams and never over-fetches.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def export_csv(ds, out_dir: str, columns: list[str]):
    ds.select_columns(columns).write_csv(out_dir)
    return out_dir


def paginated(ds, *, sort_keys: list[str], descending: list[bool], limit: int, offset: int = 0):
    """Exact OFFSET pagination: global sort, take ``offset+limit``, drop the
    first ``offset`` on the (tiny) collected head."""
    head = ds.sort(sort_keys, descending=descending).limit(offset + limit)
    tbl = pa.Table.from_pylist(head.take_all(), schema=head.schema().base_schema)
    return tbl.slice(offset, limit)


def summary_report_lines(
    tbl: pa.Table,
    *,
    status_col: str,
    n_col: str,
    cents_col: str | None = None,
    title: str = "RUN SUMMARY",
) -> pa.Table:
    """Render a per-status aggregate table as numbered text report lines —
    the S7 summary-report writer (≙ reference reconciliationEngine.js:201-210
    rendered by the pdfkit endpoint server.js:605-657; here the same counts
    + money totals as a plain-text artifact, SQL-reproducible so the format
    itself is oracle-checked).  Money renders from integer cents with pure
    integer math (no float formatting): ``$<dollars>.<cc>``.  Input is the
    already-aggregated tiny table (one row per status), so this is driver
    work on O(|statuses|) rows by construction."""
    t = tbl.sort_by([(status_col, "ascending")])
    statuses = t[status_col].to_pylist()
    ns = t[n_col].to_pylist()
    lines = [title]
    if cents_col is None:
        for s, n in zip(statuses, ns):
            lines.append(f"status={s} n={n}")
        lines.append(f"TOTAL n={sum(ns)}")
    else:
        cents = t[cents_col].to_pylist()
        for s, n, c in zip(statuses, ns, cents):
            lines.append(f"status={s} n={n} total=${c // 100}.{c % 100:02d}")
        tot_n, tot_c = sum(ns), sum(cents)
        lines.append(f"TOTAL n={tot_n} total=${tot_c // 100}.{tot_c % 100:02d}")
    return pa.table(
        {
            "line_no": pa.array(range(len(lines)), pa.int64()),
            "line": pa.array(lines, pa.string()),
        }
    )


def keyset_page(ds, *, sort_key: str, after: object | None, limit: int, descending: bool = False):
    """Seek-method pagination: WHERE sort_key > after ORDER BY sort_key
    LIMIT n — each page is one pruned scan + top-k, no global offset."""
    if after is not None:
        op = pc.less if descending else pc.greater
        ds = ds.map_batches(
            lambda t: t.filter(op(t[sort_key], pa.scalar(after))), batch_format="pyarrow"
        )
    return ds.sort([sort_key], descending=[descending]).limit(limit)
