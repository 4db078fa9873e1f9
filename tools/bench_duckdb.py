#!/usr/bin/env python3
"""DuckDB comparator bench (builder tooling): times every oracle SQL from a
verify dump's oracle_sql.json against the testdata parquet, min-of-N, and
emits ONE JSON line shaped like graft.Bench's — so each round can persist
Spark and DuckDB numbers side by side (BENCH_DUCKDB_r{N}.json) instead of
leaning on PLANS.md prose for the ratio.

Usage:
  python3 tools/bench_duckdb.py <sfDir> <oracleSqlJson> [minOfN=2]
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(n):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    total = round(sum(times.values()), 3)
    ordered = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"metric": "total", "unit": "sec", "engine": "duckdb",
                      "n": n, "queries": ordered, "sf": sf_dir,
                      "value": total}))

main()
