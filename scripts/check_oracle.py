"""Dev harness: run queries() vs oracle_sql() like the driver does.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import math
import sys
import time

import duckdb
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entry_mod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result):
    return result if isinstance(result, pd.DataFrame) else result.to_pandas()


def normalize(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wanted = sys.argv[2:]
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = wanted or sorted(qs)
    failures = 0
    for name in names:
        t0 = time.monotonic()
        try:
            ray_df = normalize(to_pandas(qs[name](sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name} (rows-only): {len(ray_df)} rows, {dt:.1f}s")
            continue
        sql_df = normalize(con.sql(oracles[name]).df())
        status = "ok  "
        msg = ""
        if list(ray_df.columns) != list(sql_df.columns):
            status, msg = "FAIL", f"cols {list(ray_df.columns)} vs {list(sql_df.columns)}"
        elif len(ray_df) != len(sql_df):
            status, msg = "FAIL", f"rows {len(ray_df)} vs {len(sql_df)}"
        else:
            for col in ray_df.columns:
                for i, (x, y) in enumerate(zip(ray_df[col], sql_df[col])):
                    if isinstance(x, float) or isinstance(y, float):
                        same = (pd.isna(x) and pd.isna(y)) or (
                            not pd.isna(x) and not pd.isna(y) and math.isclose(x, y, rel_tol=0, abs_tol=0))
                    else:
                        same = x == y
                    if not same:
                        status, msg = "FAIL", f"{col}[{i}] ray={x!r} sql={y!r}"
                        break
                if status == "FAIL":
                    break
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: {len(ray_df)} rows, {dt:.1f}s {msg}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
