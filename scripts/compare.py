#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then compare each query's parquet output against DuckDB
running the oracle SQL over the same test tables.

Usage: python3 scripts/compare.py [sfdir] [outdir] [--skip-verify]
"""
import json, math, os, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify-out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    rc = subprocess.run(["bash", "/root/repo/scripts/run.sh", "graft.Verify", SF, OUT],
                        env=env).returncode
    if rc != 0:
        print(f"VERIFY FAILED rc={rc}")
        sys.exit(1)

import duckdb
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    pdir = f"{OUT}/{name}"
    if not os.path.isdir(pdir):
        fails.append(name); print(f"{name}: MISSING spark output"); continue
    try:
        got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        fails.append(name); print(f"{name}: ORACLE ERROR {e}"); continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        fails.append(name)
        print(f"{name}: SCHEMA MISMATCH spark={gcols} oracle={wcols}"); continue
    if len(got) != len(want):
        fails.append(name)
        print(f"{name}: ROWS MISMATCH spark={len(got)} oracle={len(want)}"); continue
    g = sorted(tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False))
    w = sorted(tuple(norm(v) for v in row) for row in want[wcols].itertuples(index=False))
    if g != w:
        fails.append(name)
        diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
        print(f"{name}: VALUE MISMATCH, first diffs: {diff}")
    else:
        print(f"{name}: OK ({len(got)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
