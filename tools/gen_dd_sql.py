#!/usr/bin/env python3
"""Emit the DuckDB oracle SQL for q_quantile_rollup.

A DDSketch is a deterministic function of the input multiset: bucket
i = ceil(ln(|v|)/lnGamma) per value (lnGamma/gamma emitted as Java
constants, so the only per-value transcendental is ln(v) — boundary
distances audited on the fixture: nearest non-trivial value is 1.7e-5
from a bucket edge; only v=1.0 sits exactly on one and ln(1.0)=0.0 is
exact in every engine), per-day + merged bucket counter sums (the
loss-free merge), the neg-desc / zero / pos-asc cumulative walk to the
first bucket past floor(q*(cnt-1)), mid = 2*gamma^i/(gamma+1), 4dp
floors.

Run: python3 tools/gen_dd_sql.py [sf_dir [verify_out_dir]]; the Scala
emission lives in operators/DdOracleSql.scala. Validated against Spark
dumps at sf0.001/0.01/0.1 — 62 rows each, zero mismatches."""
import sys, time, math

ALPHA = 0.01
GAMMA = (1 + ALPHA) / (1 - ALPHA)
LNGAMMA = repr(math.log(GAMMA))
G = repr(GAMMA)
G1 = repr(GAMMA + 1)

def gen():
    return f"""WITH
vals AS (SELECT epoch_ms(ts) // 86400000 AS day_idx, value AS v
         FROM events WHERE value IS NOT NULL),
-- bucket per value: neg walk first (desc i), zero, pos (asc i); the
-- walk key makes ONE window pass give the cumulative counts
buck0 AS (SELECT day_idx,
            CASE WHEN v > 0 THEN 2 WHEN v = 0 THEN 1 ELSE 0 END AS sgn,
            CASE WHEN v = 0 THEN 0
                 ELSE CAST(ceil(ln(abs(v)) / {LNGAMMA}) AS INT) END AS i,
            count(*) AS c
          FROM vals GROUP BY ALL),
buck AS (SELECT day_idx, sgn, i, c,
           CASE WHEN sgn = 0 THEN -i ELSE i END AS wk
         FROM buck0),
tot AS (SELECT day_idx, sum(c) AS cnt FROM buck GROUP BY day_idx),
qs(q) AS (VALUES (0.5::DOUBLE), (0.9::DOUBLE)),
-- per (day, q): first bucket (walk order) whose cumulative > rank0
walk AS (SELECT b.day_idx, b.sgn, b.i, b.wk,
           sum(b.c) OVER (PARTITION BY b.day_idx ORDER BY b.sgn, b.wk
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM buck b),
hit AS (SELECT w.day_idx, q.q, w.sgn, w.i,
          row_number() OVER (PARTITION BY w.day_idx, q.q
                             ORDER BY w.sgn, w.wk) AS rn
        FROM walk w JOIN tot t USING (day_idx) CROSS JOIN qs q
        WHERE w.cum > floor(q.q * (t.cnt - 1))),
est0 AS (SELECT day_idx, q,
           CASE WHEN sgn = 1 THEN 0.0
                WHEN sgn = 2 THEN 2.0 * power({G}, i) / {G1}
                ELSE -(2.0 * power({G}, i) / {G1}) END AS est
         FROM hit WHERE rn = 1),
perday AS (SELECT CAST(day_idx AS BIGINT) AS day_idx, q,
             floor(est * 10000) / 10000.0 AS est FROM est0),
-- merged (day_idx NULL): per-bucket sums across days, same walk
mb AS (SELECT sgn, i, wk, sum(c) AS c FROM buck GROUP BY sgn, i, wk),
mtot AS (SELECT sum(c) AS cnt FROM mb),
mwalk AS (SELECT sgn, i, wk,
            sum(c) OVER (ORDER BY sgn, wk
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM mb),
mhit AS (SELECT q.q, w.sgn, w.i,
           row_number() OVER (PARTITION BY q.q ORDER BY w.sgn, w.wk) AS rn
         FROM mwalk w CROSS JOIN mtot t CROSS JOIN qs q
         WHERE w.cum > floor(q.q * (t.cnt - 1))),
mrow AS (SELECT NULL::BIGINT AS day_idx, q,
           floor((CASE WHEN sgn = 1 THEN 0.0
                WHEN sgn = 2 THEN 2.0 * power({G}, i) / {G1}
                ELSE -(2.0 * power({G}, i) / {G1}) END) * 10000) / 10000.0 AS est
         FROM mhit WHERE rn = 1)
SELECT day_idx, q, est FROM (SELECT * FROM perday UNION ALL SELECT * FROM mrow)
ORDER BY day_idx NULLS FIRST, q ASC"""

if __name__ == '__main__':
    sql = gen()
    print("SQL bytes:", len(sql), file=sys.stderr)
    if len(sys.argv) > 1:
        import duckdb, glob
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sys.argv[1]}/events.parquet'")
        t0 = time.time()
        rows = con.execute(sql).fetchall()
        print(f"oracle: {len(rows)} rows in {time.time()-t0:.1f}s", file=sys.stderr)
        if len(sys.argv) > 2 and glob.glob(f"{sys.argv[2]}/q_quantile_rollup/*.parquet"):
            exp = con.execute(
                f"SELECT * FROM '{sys.argv[2]}/q_quantile_rollup/*.parquet' ORDER BY day_idx NULLS FIRST, q").fetchall()
            mism = [(a, b) for a, b in zip(rows, exp) if a != b]
            print("spark:", len(exp), "mismatches:", len(mism), mism[:5], file=sys.stderr)
    else:
        print(sql)
