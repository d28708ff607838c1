#!/usr/bin/env python3
"""Strong single-node baseline: DuckDB executing the engine's own
oracle SQL (dumped by graft.Verify as oracle_sql.json) over the same
parquet tables. Dev/measurement tool only.

Handles both single-file tables (driver testdata) and directory
tables (Spark-written amplified corpora from graft.ScaleBench) —
directories are read via a part-file glob. A per-query wall-clock cap
(DUCKDB_QUERY_TIMEOUT_SEC, default 300) interrupts runaway oracles at
amplified scale so one quadratic verify cannot stall the whole sweep;
timed-out queries are reported in errors, not silently dropped.

Usage: duckdb_baseline.py <sfDir> <oracle_sql.json> [reps]
"""
import json
import os
import sys
import threading
import time

import duckdb

SF = sys.argv[1]
ORACLE = sys.argv[2]
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
TIMEOUT = float(os.environ.get("DUCKDB_QUERY_TIMEOUT_SEC", "300"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.execute("SET threads TO 32")
# bounded so a heavy LSH oracle raises OutOfMemoryException instead of
# taking the process down (the sf0.1 all-pairs verifies are near the
# edge); failed queries are reported, not silently dropped
con.execute("SET memory_limit='48GB'")
# amplified events carry parquet TIMESTAMP adjusted-to-UTC (Spark
# session-tz write); base testdata is naive micros. Pin the session tz
# so strftime/epoch_us agree with the Spark side (UTC) in both cases.
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    p = os.path.join(SF, f"{t}.parquet")
    src = f"'{p}/*.parquet'" if os.path.isdir(p) and not os.path.islink(p) \
        else f"'{p}'"
    # symlinks to single files isdir()==False; symlinks to base dirs
    # would also glob fine — resolve to be safe
    if os.path.isdir(os.path.realpath(p)):
        src = f"'{os.path.realpath(p)}/*.parquet'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")


def run_capped(q):
    """Execute under the wall-clock cap; raises on interrupt."""
    timer = threading.Timer(TIMEOUT, con.interrupt)
    timer.start()
    try:
        return con.execute(q).fetchall()
    finally:
        timer.cancel()


sql = json.load(open(ORACLE))
times = {}
errors = {}
for name in sorted(sql):
    try:
        run_capped(sql[name])  # warm
        best = min(
            (lambda t0: (run_capped(sql[name]), time.time() - t0)[1])(time.time())
            for _ in range(REPS))
        times[name] = round(best, 4)
    except Exception as e:
        errors[name] = type(e).__name__
print(json.dumps(times))
print("total", round(sum(times.values()), 3), "n_queries", len(times),
      "errors", json.dumps(errors), file=sys.stderr)
