#!/usr/bin/env python3
"""Strong single-node baseline: DuckDB executing the engine's own
oracle SQL (dumped by graft.Verify as oracle_sql.json) over the same
parquet tables. Dev/measurement tool only.

Usage: duckdb_baseline.py <sfDir> <oracle_sql.json> [reps]
"""
import json
import sys
import time

import duckdb

SF = sys.argv[1]
ORACLE = sys.argv[2]
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.execute("SET threads TO 32")
# bounded so a heavy LSH oracle raises OutOfMemoryException instead of
# taking the process down (the sf0.1 all-pairs verifies are near the
# edge); failed queries are reported, not silently dropped
con.execute("SET memory_limit='48GB'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

sql = json.load(open(ORACLE))
times = {}
errors = {}
for name in sorted(sql):
    try:
        con.execute(sql[name]).fetchall()  # warm
        best = min(
            (lambda t0: (con.execute(sql[name]).fetchall(), time.time() - t0)[1])(time.time())
            for _ in range(REPS))
        times[name] = round(best, 4)
    except Exception as e:
        errors[name] = type(e).__name__
print(json.dumps(times))
print("total", round(sum(times.values()), 3), "n_queries", len(times),
      "errors", json.dumps(errors))
