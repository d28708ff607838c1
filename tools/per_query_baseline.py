#!/usr/bin/env python3
"""Merge a graft.Bench JSON line with duckdb_baseline.py per-query
timings into BASELINE_per_query.json, so every query's Spark/DuckDB
ratio is auditable per round without re-measuring (VERDICT r7 item 5).

Usage: per_query_baseline.py <bench.json> <duckdb_times.json> [out.json]

Only queries PRESENT IN BOTH maps get a ratio (oracle-less rows-only
queries have no DuckDB twin; *_portable twins are not benched).
"""
import json
import sys

bench = json.load(open(sys.argv[1]))
duck = json.load(open(sys.argv[2]))
out_path = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_per_query.json"

spark_q = bench["queries"]
shared = sorted(set(spark_q) & set(duck))
ratios = {q: round(spark_q[q] / duck[q], 2) if duck[q] > 0 else None
          for q in shared}
spark_total = round(sum(spark_q[q] for q in shared), 3)
duck_total = round(sum(duck[q] for q in shared), 3)
out = {
    "sf": bench.get("sf"),
    "probe_drift": bench.get("probe_drift"),
    "attempt_drifts": bench.get("attempt_drifts"),
    "n_shared": len(shared),
    "spark_total_shared_sec": spark_total,
    "duckdb_total_shared_sec": duck_total,
    "ratio_total": round(spark_total / duck_total, 2) if duck_total else None,
    "spark_sec": {q: spark_q[q] for q in sorted(spark_q)},
    "duckdb_sec": {q: duck[q] for q in sorted(duck)},
    "ratio": ratios,
    "worst": sorted(((v, q) for q, v in ratios.items() if v), reverse=True)[:10],
}
json.dump(out, open(out_path, "w"), indent=1)
print(f"{out_path}: {len(shared)} shared queries, "
      f"spark {spark_total}s vs duckdb {duck_total}s "
      f"(ratio {out['ratio_total']}), drift {out['probe_drift']}")
