#!/usr/bin/env python3
"""Two-engine scale-slope sweep (builder tooling only, not library code).

Times the ORACLE SQL of the named queries in DuckDB over the replicated
corpora ScaleProbe builds under /tmp/graft_scale_<k> — the DuckDB half of
the round-16 slope evidence (the Spark half comes from
`runMain graft.tools.ScaleProbe <k...>` with SPARK_GRAFT_PROBES set to the
same queries). Emits one JSON line per (k, query).

Usage:
  python3 tools/scale_slope.py <verifyOutDir> <k1,k2,...> <query> [query...]
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir = sys.argv[1]
    ks = [int(k) for k in sys.argv[2].split(",")]
    queries = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    for k in ks:
        d = f"/tmp/graft_scale_{k}"
        con = duckdb.connect()
        for t in TABLES:
            # ScaleProbe writes Spark parquet DIRECTORIES
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet/*.parquet'")
        for name in queries:
            sql = oracle.get(name)
            if sql is None:
                print(json.dumps({"k": k, "query": name,
                                  "error": "no oracle"}))
                continue
            t0 = time.time()
            try:
                n = len(con.execute(sql).fetchall())
                print(json.dumps({"k": k, "query": name, "engine": "duckdb",
                                  "sec": round(time.time() - t0, 2),
                                  "rows": n}), flush=True)
            except Exception as e:
                print(json.dumps({"k": k, "query": name, "engine": "duckdb",
                                  "sec": round(time.time() - t0, 2),
                                  "error": str(e)[:200]}), flush=True)
        con.close()


if __name__ == "__main__":
    main()
