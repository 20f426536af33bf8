"""Driver-style oracle cross-check: run every queries() entry at a given sf
and compare against oracle_sql() through DuckDB (row count + column names +
order-insensitive values).

Usage: python scripts/oracle_check.py [sf_dir] [--only name1,name2,...]
"""

from __future__ import annotations

import sys
import warnings

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # binary columns (media payloads) are not utf-8: compare as hex
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, bytes) else v)
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("bool"):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    warnings.filterwarnings("ignore")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    import time

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = canon(to_pandas(fn(sf)))
        except Exception as e:
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(
                f"rows-only {name}: {len(got)} rows, cols={list(got.columns)}"
                f" [{time.monotonic() - t0:.1f}s]"
            )
            continue
        try:
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        want2 = want.copy()
        for c in want2.columns:
            if want2[c].dtype == object:
                want2[c] = want2[c].astype(str)
        eq = got.equals(want2)
        if not eq:
            diff_cols = [c for c in got.columns if not got[c].equals(want2[c])]
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                neq = got[c] != want2[c]
                print("  got :", got[c][neq].head(3).tolist())
                print("  want:", want2[c][neq].head(3).tolist())
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows [{time.monotonic() - t0:.1f}s]")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
