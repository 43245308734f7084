#!/usr/bin/env python3
"""DuckDB timing yardstick for the bench gate (dev/driver tool, not part
of the shipped library — duckdb exists driver-side only). Usage:
    python3 tools/duckbench.py <oracle_sql.json> <sfdir>
Runs every oracle SQL against the sfdir parquet tables and prints ONE JSON
line {"total": sec, "queries": {name: sec}}. graft.Bench shells out to
this (best-effort) so BENCH_r{N}.json carries a duckdb_total_sec field and
the "within 2x of a tuned single-node engine" gate is falsifiable.
"""
import sys, json, time
import duckdb

def main(sql_json, sfdir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(sql_json))
    per = {}
    t0 = time.time()
    for name in sorted(oracles):
        s = time.time()
        try:
            con.execute(oracles[name]).fetchall()
            per[name] = round(time.time() - s, 4)
        except Exception:
            per[name] = -1.0
    print(json.dumps({"total": round(time.time() - t0, 4), "queries": per}))
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
