#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only —
the engine itself is pure Scala/Spark; this script just cross-checks
Verify output against DuckDB the same way the driver does).

Usage: python3 tools/check.py [sfDir] [outDir]
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. registers each test parquet as a DuckDB view
  3. runs every oracle_sql.json entry, compares to <outDir>/<name>/ parquet
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# live-guard fixture oracles (the rank-block pair CTEs) materialize
# joins that carry vector payloads; give DuckDB a roomy spill target
# so the check is bounded by time, not by the cwd filesystem
tmp = os.environ.get("GRAFT_DUCKDB_TMP")
if tmp:
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
# memory limit: honored on its own, not only alongside a spill dir
# (a user on a small host capping memory without configuring spill
# must not be silently ignored). No RAM-derived fallback — DuckDB's
# own default is already 80% of physical RAM.
mem = os.environ.get("GRAFT_DUCKDB_MEM")
if mem:
    con.execute(f"SET memory_limit='{mem}'")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver testdata tables are single files; engine-written soak
    # fixtures are Spark directories of part files — accept both so
    # the gate can run on live-guard fixtures too
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

n_pass = n_fail = 0
results = {}
for name in sorted(oracles):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        got = canon(pd.read_parquet(spark_path))
        exp = canon(con.execute(oracles[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    ok_shape = got.shape == exp.shape and list(got.columns) == list(exp.columns)
    ok = ok_shape
    detail = ""
    if ok_shape:
        for c in got.columns:
            g, e = got[c], exp[c]
            if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
                same = np.allclose(g.astype(float), e.astype(float), rtol=0, atol=1e-9, equal_nan=True)
            else:
                same = g.astype(str).equals(e.astype(str))
            if not same:
                ok = False; detail = f"col {c} differs"
                bad = (g.astype(str) != e.astype(str))
                idx = bad[bad].index[:3].tolist()
                detail += f" rows {idx}: got {g.iloc[idx[:1]].tolist()} exp {e.iloc[idx[:1]].tolist()}" if idx else ""
                break
        # strict dtype compare (the driver checks schema)
        if ok:
            for c in got.columns:
                if str(got[c].dtype) != str(exp[c].dtype):
                    detail = f"DTYPE-WARN {c}: spark={got[c].dtype} duck={exp[c].dtype}"
    else:
        detail = f"shape got={got.shape}{list(got.columns)} exp={exp.shape}{list(exp.columns)}"
    status = "PASS" if ok else "FAIL"
    if ok: n_pass += 1
    else: n_fail += 1
    results[name] = status
    print(f"{status} {name} ({got.shape[0] if ok_shape else '?'} rows) {detail}")

print(f"\n{n_pass} passed, {n_fail} failed, {len(oracles)} total")
sys.exit(1 if n_fail else 0)
