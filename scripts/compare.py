#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then compare each query's parquet output against DuckDB
running the oracle SQL over the same test tables.

Usage: python3 scripts/compare.py [sfdir] [outdir] [--skip-verify] [--selftest]
"""
import datetime, decimal, glob, json, math, os, subprocess, sys

import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify-out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # Null canonicalization: pyarrow renders a null bool/string as None where
    # DuckDB's .df() renders it as float nan — same null, different reader.
    # The driver's hash treats them as equal (r20: q107's all-null vbr column
    # was green), so canonicalize every null spelling to "nan".
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "nan"
    # DATE canonicalization: pyarrow renders date32 as datetime.date
    # ("2024-01-01") where DuckDB renders DATE as midnight datetime64
    # ("2024-01-01 00:00:00") — both sides are genuinely DATE; render the
    # date object in the DuckDB spelling so DATE==DATE compares equal (the
    # driver agrees: every date-emitting query was green in r20).
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return f"{v} 00:00:00"
    if isinstance(v, decimal.Decimal):
        # Type-faithful: the driver hashes pandas Decimal('0.0400') (Spark
        # decimal128 read back via pyarrow) differently from float64 0.04.
        # Render decimals distinctly so the gate sees what the driver sees —
        # r20's q130 shipped "136/136" locally while the driver hashed it red,
        # because the Spark side used to be read back through DuckDB, which
        # launders decimal128 -> float64 before norm() ever runs.
        return f"dec:{v}"
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
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def read_spark_parquet(pdir):
    """Read the Spark output the way the driver does: through pyarrow/pandas,
    which preserves DecimalType as decimal.Decimal objects. Reading it back
    through DuckDB (the pre-r21 path) silently widened decimal128 to float64
    and masked dtype mismatches against the oracle."""
    import pandas as pd
    parts = sorted(glob.glob(f"{pdir}/*.parquet"))
    if not parts:
        raise FileNotFoundError(f"no parquet files under {pdir}")
    return pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)


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
    # The r20 q130 miss as a pinned fixture: a decimal128(16,4) column read
    # back from a Spark-written parquet must NOT normalize equal to the
    # oracle's float64, and the Spark-side reader must preserve the Decimal
    # (DuckDB's .df() converts it to float64, which is how the pre-r21 gate
    # published 136/136 while the driver hashed q130 red).
    import tempfile
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as td:
        tbl = pa.table({"drop_frac": pa.array(
            [decimal.Decimal("0.0400")], type=pa.decimal128(16, 4))})
        pq.write_table(tbl, f"{td}/part-0.parquet")
        got = read_spark_parquet(td)["drop_frac"].iloc[0]
        assert isinstance(got, decimal.Decimal), (
            f"spark-side reader widened decimal to {type(got)} — gate is "
            "blind to the q130 bug class again")
        assert norm(got) != norm(0.04), \
            f"norm() collapsed Decimal {got!r} and float 0.04 — gate is blind"
        laundered = c.sql(f"SELECT * FROM '{td}/part-0.parquet'").df()["drop_frac"].iloc[0]
        assert isinstance(laundered, float), (
            "duckdb now preserves decimal128 in .df() — selftest premise "
            "changed; re-check whether the duckdb read path is safe")
    print("compare.py selftest: OK (int/float + decimal normalization is type-faithful)")


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
        got = read_spark_parquet(pdir)
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
