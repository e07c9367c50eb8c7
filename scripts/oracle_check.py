#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate: for each query
dumped by graft.Verify, run its oracle SQL in DuckDB over the same
parquet tables and compare row count, column names, and a
column-name-sorted value hash. Usage:
    python3 scripts/oracle_check.py <sfdir> <verify_outdir> [query ...]
"""
import sys, json, glob, hashlib
import duckdb, numpy as np, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            # np.floating covers float32/float64 scalars from parquet,
            # which are NOT Python float instances — without this they
            # fall through to str(v) and hash-mismatch DuckDB's rendering
            if v is None or (isinstance(v, (float, np.floating)) and pd.isna(v)):
                vals.append("NULL")
            elif isinstance(v, (float, np.floating)):
                vals.append(f"{float(v):.9g}")
            elif isinstance(v, (list, np.ndarray)):
                # elements get the same null canon as scalars: None and
                # NaN both render "NULL" (a NaN would otherwise print
                # 'nan' here but 'NULL' as a scalar, and Spark-parquet
                # vs DuckDB list representations would hash-mismatch)
                def elem(x):
                    if x is None or (isinstance(x, (float, np.floating)) and pd.isna(x)):
                        return "NULL"
                    if isinstance(x, (float, np.floating)):
                        return f"{float(x):.9g}"
                    return str(x)
                vals.append("[" + ",".join(elem(x) for x in v) + "]")
            elif hasattr(v, "strftime"):
                vals.append(str(v))
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)

bad = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name:28s} MISSING spark output")
        bad += 1
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in files])
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:28s} ORACLE ERROR: {e}")
        bad += 1
        continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"{name:28s} SCHEMA spark={scols} oracle={ocols}")
        bad += 1
        continue
    sh, sn = canon(sdf)
    oh, on = canon(odf)
    if sn != on:
        print(f"{name:28s} ROWS spark={sn} oracle={on}")
        bad += 1
    elif sh != oh:
        print(f"{name:28s} HASH mismatch ({sn} rows)")
        bad += 1
    else:
        print(f"{name:28s} ok ({sn} rows)")
print(f"\n{'FAIL' if bad else 'ALL GREEN'} ({bad} bad)")
sys.exit(1 if bad else 0)
