#!/usr/bin/env python3
"""DuckDB comparator bench (builder tooling): times every oracle SQL from a
verify dump's oracle_sql.json against the testdata parquet, min-of-N, and
emits ONE JSON line shaped like graft.Bench's — so each round can persist
Spark and DuckDB numbers side by side (BENCH_DUCKDB_r{N}.json) instead of
leaning on PLANS.md prose for the ratio.

A failing oracle SQL (or a table whose parquet is missing) is recorded in
the output's `errors` map instead of aborting the run — the timings of
every query that already ran always survive to the JSON line.

Usage:
  python3 tools/bench_duckdb.py <sfDir> <oracleSqlJson> [minOfN=2]
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    if len(sys.argv) < 3:
        sys.exit(f"usage: {sys.argv[0]} <sfDir> <oracleSqlJson> [minOfN=2]")
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    errors = {}
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except duckdb.Error as e:
            errors[f"view:{t}"] = str(e).splitlines()[0]
    oracle = json.load(open(oracle_path))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(n):
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except duckdb.Error as e:
                # record the failure but KEEP any timing an earlier rep
                # produced — a transient rep-2 error must not silently
                # shrink the total the Spark/DuckDB ratio is read from
                errors[name] = str(e).splitlines()[0]
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            times[name] = round(best, 3)
    total = round(sum(times.values()), 3)
    ordered = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    out = {"metric": "total", "unit": "sec", "engine": "duckdb",
           "n": n, "timed": len(times), "queries": ordered,
           "sf": sf_dir, "value": total}
    if errors:
        # a non-empty error map means `value` sums FEWER queries than
        # the oracle set — flag it so ratio consumers detect the
        # mismatched query sets instead of comparing unequal totals
        out["errors"] = errors
        out["partial"] = True
    print(json.dumps(out))

main()
