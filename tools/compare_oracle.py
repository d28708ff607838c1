#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet, sort
columns by name + rows, and compare values. Dev tool only — the shipped
engine is the Scala code under src/."""
import glob, json, sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def norm(v):
    # EXACT compare — floats must be bit-identical across engines (the
    # driver hashes values; any drift is a mismatch there too).
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    return v

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails += 1
        continue
    files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    exp_c, got_c = canon(exp), canon(got)
    if list(exp_c.columns) != list(got_c.columns):
        print(f"FAIL {name}: columns exp={list(exp_c.columns)} got={list(got_c.columns)}")
        fails += 1
        continue
    if len(exp_c) != len(got_c):
        print(f"FAIL {name}: rows exp={len(exp_c)} got={len(got_c)}")
        fails += 1
        continue
    exp_v = [[norm(v) for v in row] for row in exp_c.itertuples(index=False)]
    got_v = [[norm(v) for v in row] for row in got_c.itertuples(index=False)]
    if exp_v != got_v:
        bad = next(i for i in range(len(exp_v)) if exp_v[i] != got_v[i])
        print(f"FAIL {name}: value mismatch at row {bad}:\n  exp={exp_v[bad]}\n  got={got_v[bad]}")
        fails += 1
        continue
    print(f"OK   {name} ({len(exp_c)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} green")
sys.exit(1 if fails else 0)
