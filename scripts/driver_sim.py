"""Simulates the driver: ray.init BEFORE importing __ray_entry__,
smoke entry(), then each query vs oracle at sf0.01."""
import math, sys, time
import duckdb, pandas as pd, ray

ray.data.DataContext.get_current().enable_progress_bars = False
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__ as m

# smoke: entry()
r = m.entry()
df = r.to_pandas() if hasattr(r, "to_pandas") else r
print(f"entry(): {len(df)} rows, schema={sorted(df.columns)[:5]}...")
assert len(df) >= 0

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(d):
    d = d if isinstance(d, pd.DataFrame) else d.to_pandas()
    d = d[sorted(d.columns)].copy()
    return d.sort_values(list(d.columns), kind="mergesort").reset_index(drop=True)

qs, oracles = m.queries(), m.oracle_sql()
fails = 0
for name in sorted(qs):
    t0 = time.monotonic()
    a = norm(qs[name](SF))
    dt = time.monotonic() - t0
    if name not in oracles:
        print(f"rows-only {name}: {len(a)} rows {dt:.1f}s"); continue
    b = norm(con.sql(oracles[name]).df())
    ok = list(a.columns) == list(b.columns) and len(a) == len(b)
    if ok:
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for x, y in zip(av, bv):
                same = (isinstance(x,float) or isinstance(y,float)) and ((pd.isna(x) and pd.isna(y)) or (not pd.isna(x) and not pd.isna(y) and x==y)) or x==y
                if not same: ok=False; print(f"   mismatch {c}: {x!r} vs {y!r}"); break
            if not ok: break
    print(f"{'MATCH' if ok else 'FAIL '} {name}: {len(a)} rows {dt:.1f}s")
    fails += 0 if ok else 1
ray.shutdown()
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
