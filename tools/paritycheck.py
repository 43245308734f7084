#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (dev tool only, not
part of the shipped library). Usage:
    python3 tools/paritycheck.py <sfdir> <verify_outdir>
Reads each <outdir>/<name> parquet (Spark result), runs <outdir>/oracle_sql.json
in DuckDB over the sfdir tables, sorts columns by name, compares values.
"""
import sys, json, glob, os, math
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir"); n_fail += 1; continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sdf = con.execute(
            f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: cols oracle={ocols} spark={scols}")
            n_fail += 1; continue
        o = odf[ocols]; s = sdf[scols]
        dt_diff = [(c, str(o[c].dtype), str(s[c].dtype)) for c in ocols
                   if str(o[c].dtype) != str(s[c].dtype)]
        if dt_diff:
            # the driver hashes serialized values, so int64-vs-float64 etc.
            # diverges there even when tuple equality passes here
            print(f"WARN {name}: dtype mismatch (oracle,spark): {dt_diff}")
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
            n_fail += 1; continue
        orec = [tuple(norm(v) for v in r) for r in o.itertuples(index=False)]
        srec = [tuple(norm(v) for v in r) for r in s.itertuples(index=False)]
        if orec != srec:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(orec, srec)) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(o)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
