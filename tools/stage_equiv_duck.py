#!/usr/bin/env python3
"""DuckDB twin of graft.tools.StageEquiv — the stage-equivalent
denominators for the answer-key heavies (q37/q45/q83/q95). Consumes the
SAME exported intermediates (sig37, sig95, edges95, ids95, cells83,
vecs83 parquet under <outDir>) and runs the SAME stage semantics in
natural DuckDB formulations, under the pinned-warm duckbench protocol
(every intermediate byte pre-read; one untimed warm pass; median of
reps). Usage:

    python3 tools/stage_equiv_duck.py <outDir> [reps]

Prints ONE JSON line {"duckdb_stages": {...}, "counts": {...},
"precache_sec": s, "recache_sec": s, "reps": n}. The counts must match
the Spark tool's counts line-for-line before a time is accepted as a
denominator — same result, or the ratio is meaningless.

Stage semantics (mirrors of the Spark operators, verified by count
parity):
  - band_verify_*: 8 bands x 4-wide signature slices; buckets over 500
    rows dropped (the bounded-bucket cap); distinct in-bucket pairs
    id1 < id2; est_jaccard = equal-position fraction over 32; filter;
    order. Grouping is on the raw slice (DuckDB needs no pre-hash; the
    Spark side's xxhash64 bucket key plays the same grouping role).
  - cc_q95: the same hop + pointer-jump label rounds to convergence
    (max 10) over the symmetric edge list, folded onto the full id set.
  - within_cell_q83: the over-cap audit (must pass, as the operator
    enforces), within-cell distinct pairs id1 < id2 (cap 10000),
    cosine >= 0.95 via list_cosine_similarity, greater-id drop,
    survivor anti-join, order.
"""
import sys, os, json, time, statistics
import duckdb


def touch_parquet(d):
    t0 = time.time()
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 22):
                        pass
    return round(time.time() - t0, 3)


def band_verify(con, sig_view, thr):
    """Banding + bounded in-bucket pairs + overlap verify + order."""
    return con.execute(f"""
WITH bandrows AS (
  SELECT doc_id, b, sig[b*4+1 : b*4+4] AS bslice
  FROM {sig_view}, RANGE(8) t(b)),
capped AS (
  SELECT b, bslice FROM bandrows GROUP BY 1, 2
  HAVING COUNT(*) BETWEEN 2 AND 500),
pairs AS (
  SELECT DISTINCT LEAST(x.doc_id, y.doc_id) AS id1,
                  GREATEST(x.doc_id, y.doc_id) AS id2
  FROM bandrows x
  JOIN capped c ON x.b = c.b AND x.bslice = c.bslice
  JOIN bandrows y ON y.b = x.b AND y.bslice = x.bslice
                 AND x.doc_id < y.doc_id)
SELECT id1, id2,
  LEN(LIST_FILTER(RANGE(1, 33), i -> s1.sig[i] = s2.sig[i])) / 32.0
    AS est_jaccard
FROM pairs
JOIN {sig_view} s1 ON s1.doc_id = id1
JOIN {sig_view} s2 ON s2.doc_id = id2
WHERE LEN(LIST_FILTER(RANGE(1, 33), i -> s1.sig[i] = s2.sig[i])) / 32.0
      >= {thr}
ORDER BY id1, id2""").fetchall()


def cc(con):
    """Hop + pointer-jump min-label rounds to convergence (max 10)."""
    con.execute("""CREATE OR REPLACE TEMP TABLE e AS
      SELECT id1 AS src, id2 AS dst FROM edges95
      UNION ALL SELECT id2, id1 FROM edges95""")
    con.execute("""CREATE OR REPLACE TEMP TABLE lbl AS
      SELECT DISTINCT e.src AS id, e.src AS label FROM e
      JOIN ids95 i ON i.doc_id = e.src""")
    for _ in range(10):
        con.execute("""CREATE OR REPLACE TEMP TABLE hopped AS
          SELECT l.id, l.label AS old,
                 LEAST(l.label, COALESCE(nm.nmin, l.label)) AS label
          FROM lbl l LEFT JOIN (
            SELECT e.src AS id, MIN(n.label) AS nmin
            FROM e JOIN lbl n ON n.id = e.dst GROUP BY e.src) nm
          ON nm.id = l.id""")
        con.execute("""CREATE OR REPLACE TEMP TABLE nxt AS
          SELECT h.id, h.old,
                 LEAST(h.label, COALESCE(j.label, h.label)) AS label
          FROM hopped h LEFT JOIN lbl j ON j.id = h.label""")
        changed = con.execute(
            "SELECT COUNT(*) FROM nxt WHERE label <> old").fetchone()[0]
        con.execute("""CREATE OR REPLACE TEMP TABLE lbl AS
          SELECT id, label FROM nxt""")
        if changed == 0:
            break
    return con.execute("""
      SELECT i.doc_id, COALESCE(l.label, i.doc_id) AS canonical_id
      FROM ids95 i LEFT JOIN lbl l ON l.id = i.doc_id
      ORDER BY i.doc_id""").fetchall()


def within_cell(con):
    over = con.execute("""SELECT COUNT(*) FROM (
      SELECT cell FROM cells83 GROUP BY cell
      HAVING COUNT(*) > 10000)""").fetchone()[0]
    assert over == 0, "over-cap cell: the operator would abort loudly"
    return con.execute("""
WITH pairs AS (
  SELECT DISTINCT LEAST(a.vec_id, b.vec_id) AS id1,
                  GREATEST(a.vec_id, b.vec_id) AS id2
  FROM cells83 a JOIN cells83 b
    ON a.cell = b.cell AND a.vec_id < b.vec_id),
dropped AS (
  SELECT DISTINCT p.id2 AS vec_id
  FROM pairs p
  JOIN vecs83 v1 ON v1.vec_id = p.id1
  JOIN vecs83 v2 ON v2.vec_id = p.id2
  WHERE list_cosine_similarity(v1.embedding, v2.embedding) >= 0.95)
SELECT v.vec_id FROM vecs83 v
WHERE v.vec_id NOT IN (SELECT vec_id FROM dropped)
ORDER BY v.vec_id""").fetchall()


def main(outdir, reps=5):
    precache = touch_parquet(outdir)
    recache = touch_parquet(outdir)
    con = duckdb.connect()
    for t in ["sig37", "sig95", "edges95", "ids95", "cells83", "vecs83"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{outdir}/{t}/*.parquet'")
    stages = {
        "band_verify_q37": lambda: band_verify(con, "sig37", 0.99),
        "band_verify_q45q95": lambda: band_verify(con, "sig95", 0.9),
        "cc_q95": lambda: cc(con),
        "within_cell_q83": lambda: within_cell(con),
    }
    counts, runs = {}, {n: [] for n in stages}
    for rep in range(reps + 1):  # first pass = untimed warm-up
        for n, f in stages.items():
            t0 = time.time()
            rows = f()
            dt = time.time() - t0
            if rep == 0:
                counts[n] = len(rows)
            else:
                runs[n].append(dt)
    per = {n: round(statistics.median(ts), 4) for n, ts in runs.items()}
    print(json.dumps({"duckdb_stages": per, "counts": counts,
                      "reps": reps, "precache_sec": precache,
                      "recache_sec": recache}))
    return 0


if __name__ == "__main__":
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sys.exit(main(sys.argv[1], reps))
