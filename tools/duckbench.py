#!/usr/bin/env python3
"""DuckDB timing yardstick for the bench gate (dev/driver tool, not part
of the shipped library — duckdb exists driver-side only). Usage:
    python3 tools/duckbench.py <oracle_sql.json> <sfdir> [reps]
Runs every oracle SQL against the sfdir parquet tables `reps` times
(default 3) and prints ONE JSON line
    {"total": sec, "queries": {name: sec}, "reps": n}
where each per-query number is the MEDIAN over reps (same discipline as
graft.Bench, so the Spark:DuckDB ratio compares like with like).
graft.Bench shells out to this (best-effort) so BENCH_r{N}.json carries
duckdb_total_sec / duckdb_queries and the "within 2x of a tuned
single-node engine" gate is falsifiable.
"""
import sys, os, json, time, statistics
import duckdb

def main(sql_json, sfdir, reps=3):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            if os.path.isdir(f"{sfdir}/{t}.parquet"):  # Spark-written dir
                con.execute(f"CREATE VIEW {t} AS SELECT * "
                            f"FROM '{sfdir}/{t}.parquet/*.parquet'")
            else:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
        except Exception:
            pass  # table absent at this SF (e.g. partial scale-up dirs)
    oracles = json.load(open(sql_json))
    runs = {name: [] for name in oracles}
    for _ in range(reps + 1):  # first pass is the untimed warm-up
        for name in sorted(oracles):
            s = time.time()
            try:
                con.execute(oracles[name]).fetchall()
                runs[name].append(time.time() - s)
            except Exception:
                runs[name].append(-1.0)
    per = {}
    for name, ts in runs.items():
        good = [t for t in ts[1:] if t >= 0]  # drop warm-up + failures
        per[name] = round(statistics.median(good), 4) if good else -1.0
    total = round(sum(t for t in per.values() if t >= 0), 4)
    print(json.dumps({"total": total, "queries": per, "reps": reps}))
    return 0

if __name__ == "__main__":
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sys.exit(main(sys.argv[1], sys.argv[2], reps))
