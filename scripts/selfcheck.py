#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query output parquet + its oracle SQL, executes the oracle in
DuckDB over the same tables, sorts columns by name and rows by value, and
compares cell-by-cell. Exact match required for non-floats; floats must be
bit-equal too (queries round on both sides), but we report near-misses
separately to distinguish rounding noise from real bugs.

Usage: python3 scripts/selfcheck.py [sfDir] [outDir]
"""
import json, math, sys, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def fetch_sorted(rel, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(norm_cell(r[i]) for i in order) for r in rel]
    rows.sort(key=lambda row: tuple((x is None, str(type(x)), str(x)) for x in row))
    return [cols[i] for i in order], rows

n_pass = n_fail = 0
fails = []
for name in sorted(oracle):
    qdir = f"{outdir}/{name}"
    if not glob.glob(f"{qdir}/*.parquet"):
        print(f"FAIL {name}: no spark output")
        n_fail += 1; fails.append(name); continue
    try:
        spark_rel = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        scols = [d[0] for d in spark_rel.description]
        scols2, srows = fetch_sorted(spark_rel.fetchall(), scols)
        o_rel = con.execute(oracle[name])
        ocols = [d[0] for d in o_rel.description]
        ocols2, orows = fetch_sorted(o_rel.fetchall(), ocols)
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        n_fail += 1; fails.append(name); continue

    if [c.lower() for c in scols2] != [c.lower() for c in ocols2]:
        print(f"FAIL {name}: column mismatch spark={scols2} oracle={ocols2}")
        n_fail += 1; fails.append(name); continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}")
        n_fail += 1; fails.append(name); continue
    bad = None
    near = 0
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            # classify: float near-miss vs hard mismatch
            is_near = len(a) == len(b) and all(
                (x == y) or (isinstance(x, float) and isinstance(y, float)
                             and abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)))
                for x, y in zip(a, b))
            if is_near:
                near += 1
            else:
                bad = (i, a, b)
                break
    if bad:
        i, a, b = bad
        print(f"FAIL {name}: row {i} spark={a} oracle={b}")
        n_fail += 1; fails.append(name)
    elif near:
        print(f"NEAR {name}: {near} float near-miss rows (would fail a strict hash!)")
        n_fail += 1; fails.append(name)
    else:
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail: {fails}")
sys.exit(1 if n_fail else 0)
