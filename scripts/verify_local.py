#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify,
then execute each oracle SQL in DuckDB over the same parquet tables and
compare values exactly (columns sorted by name, rows as produced).
Usage: python3 scripts/verify_local.py [sfdir] [outdir] [--skip-verify]
"""
import json, math, os, subprocess, sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(["bash", "scripts/run_class.sh", "graft.Verify", SF, OUT],
                       capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    err = [l for l in r.stderr.splitlines() if "[verify]" in l or "Exception" in l]
    print("\n".join(err[:40]))
    if r.returncode != 0:
        print("VERIFY FAILED rc=", r.returncode)
        print(r.stderr[-5000:])
        sys.exit(1)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# honor the same subset env Verify/Bench use, for targeted re-checks
only = {n for n in os.environ.get("SPARK_GRAFT_ONLY", "").replace(",", " ").split()}
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: duckdb error {str(e)[:200]}"); continue
    try:
        got = pd.read_parquet(f"{OUT}/{name}")
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: spark output missing {str(e)[:120]}"); continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    import datetime
    for df in (exp, got):   # normalize date-like values to pd.Timestamp
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                    lambda v: isinstance(v, datetime.date) or v is None).all()                     and df[c].notna().any():
                df[c] = pd.to_datetime(df[c])
    if list(exp.columns) != list(got.columns):
        fails.append(name); print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); continue
    if len(exp) != len(got):
        fails.append(name); print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); continue
    bad = None
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            ok = (a == b) or (a is None and b is None)
            if not ok:
                try: ok = (isinstance(a, float) and isinstance(b, float)
                           and math.isnan(a) and math.isnan(b))
                except Exception: pass
            if not ok:
                try: ok = pd.isna(a) and pd.isna(b)
                except Exception: pass
            if not ok:
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        fails.append(name)
        print(f"FAIL {name}: col {c} row {i}: spark={b!r} duckdb={a!r} "
              f"(types {type(b).__name__}/{type(a).__name__})")
    else:
        print(f"OK   {name}: {len(got)} rows")

# rows-only queries: report row counts
import os
for d in sorted(os.listdir(OUT)):
    if d not in oracle and os.path.isdir(f"{OUT}/{d}"):
        try: n = len(pd.read_parquet(f"{OUT}/{d}"))
        except Exception: n = -1
        print(f"ROWS {d}: {n}")

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracled queries match; fails: {fails}")
sys.exit(1 if fails else 0)
