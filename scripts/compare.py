#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then compare each query's parquet output against DuckDB
running the oracle SQL over the same test tables.

Usage: python3 scripts/compare.py [sfdir] [outdir] [--skip-verify] [--selftest]
"""
import json, math, os, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify-out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Type-faithful: the driver hashes pandas float64 `480.0` differently
        # from int64 `480` (DuckDB HUGEINT widening lands as float64). A bare
        # `%.9g` collapses the two and masks exactly that bug class, so keep
        # the 9-sig-fig rounding for genuine float noise but always render a
        # float with a decimal point / exponent marker.
        s = f"{v:.9g}"
        return s if ("." in s or "e" in s or "E" in s or "inf" in s) else s + ".0"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def selftest():
    """Regression gate for the gate itself: an uncast DuckDB windowed SUM
    (HUGEINT -> pandas float64) must NOT normalize equal to Spark's BIGINT."""
    import duckdb as d
    c = d.connect()
    df = c.sql("SELECT sum(x) OVER (ORDER BY x) AS s "
               "FROM (VALUES (480::BIGINT)) t(x)").df()
    widened = df["s"].iloc[0]          # float64 480.0 via HUGEINT
    # Distinguish "DuckDB changed its HUGEINT->pandas mapping" (this
    # selftest's premise is gone, norm() itself may be fine) from "norm()
    # regressed" (the assertions below) so a failure points at the right
    # component.
    assert df["s"].dtype == "float64", (
        f"duckdb HUGEINT->pandas mapping changed: got dtype {df['s'].dtype} "
        "(not float64) — update selftest's premise; norm() is untested here")
    assert norm(widened) != norm(480), \
        f"norm() collapsed float {widened!r} and int 480 — gate is blind again"
    assert norm(widened) == norm(480.0)
    casted = c.sql("SELECT CAST(sum(x) OVER (ORDER BY x) AS BIGINT) AS s "
                   "FROM (VALUES (480::BIGINT)) t(x)").df()["s"].iloc[0]
    assert norm(casted) == norm(480), f"cast path broke: {casted!r}"
    assert norm(1.5) == "1.5" and norm(float("nan")) == "nan"
    print("compare.py selftest: OK (int/float normalization is type-faithful)")


if "--selftest" in sys.argv:
    selftest()
    sys.exit(0)

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
