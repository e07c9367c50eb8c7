#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify first, then
   compare each spark result parquet against the DuckDB oracle SQL.

   Usage: python3 scripts/check.py [sf_dir] [verify_out]
"""
import sys, json, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracles:
        print(f"  [rows-only] {name}: {len(got)} rows")
        continue
    exp = con.execute(oracles[name]).fetchdf()
    status = []
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        status.append(f"schema mismatch: {list(got.columns)} vs {list(exp.columns)}")
    elif len(got) != len(exp):
        status.append(f"rowcount {len(got)} vs {len(exp)}")
    else:
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        for c in got.columns:
            gc, ec = g[c], e[c]
            try:
                import pandas as pd
                if not gc.equals(ec):
                    # tolerate dtype-only diffs (int32 vs int64)
                    if str(gc.astype(str).tolist()) != str(ec.astype(str).tolist()):
                        bad = (gc.astype(str) != ec.astype(str))
                        i = bad.idxmax()
                        status.append(f"col {c} differs (dtype {gc.dtype} vs {ec.dtype}) e.g. row {i}: {gc[i]!r} vs {ec[i]!r}")
            except Exception as ex:
                status.append(f"col {c} compare error: {ex}")
    if status:
        n_fail += 1
        print(f"  FAIL {name}: " + "; ".join(status))
    else:
        n_pass += 1
        print(f"  ok   {name} ({len(got)} rows)")
missing = set(oracles) - {n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n))}
if missing:
    print("  MISSING results (query failed?):", sorted(missing))
print(f"{n_pass} pass / {n_fail} fail")
sys.exit(1 if (n_fail or missing) else 0)
