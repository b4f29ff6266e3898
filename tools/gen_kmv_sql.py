#!/usr/bin/env python3
"""Emit the DuckDB oracle SQL for q_kmv_overlap.

A KMV sketch is a deterministic function of the input set — the k=256
smallest distinct 63-bit xxhash64(seed 42) values per source — so the
"approximate" overlap estimates replay exactly: the gen_minhash_sql.py
XXH64 chain runs over distinct 3-word shingles, the sign bit is cleared
(mod 2^63), row_number keeps each source's 256 minima, and the theta-cut
estimator (theta = min of the 256-th minima, Long.MaxValue when un-full;
est_shared = |inter| * 2^63/theta; jaccard = |inter|/|union|) is plain
arithmetic whose one double division matches IEEE-for-IEEE.

Run: python3 tools/gen_kmv_sql.py [sf_dir [spark_dump_dir]]; the Scala
emission lives in operators/KmvOracleSql.scala. Validated against Spark
dumps at sf0.001/0.01/0.1: 190 pair rows each, zero mismatches."""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_minhash_sql as g

MAXL = "9223372036854775807"          # Long.MaxValue sentinel (unfull theta)
T63 = "9223372036854775808"           # 2^63

def gen():
    g.stages.clear()
    g.counter[0] = 0
    word64 = "(" + " + ".join(
        f"bl[8*k+{j+1}]*{1 << (8 * j)}::HUGEINT" for j in range(8)) + ")"
    word32 = "(" + " + ".join(
        f"bl[(n//8)*8+{j+1}]*{1 << (8 * j)}::HUGEINT" for j in range(4)) + ")"
    P5 = g.P5
    h = g.stage(f"(42::HUGEINT + {P5} + n::HUGEINT)%{g.M64}")
    h = g.word_step(h, "coalesce(w[1], 0::HUGEINT)", "n//8 >= 1")
    h = g.word_step(h, "coalesce(w[2], 0::HUGEINT)", "n//8 >= 2")
    h = g.word_step(h, "coalesce(w[3], 0::HUGEINT)", "n//8 >= 3")
    h = g.four_step(h, f"coalesce({word32}, 0::HUGEINT)", "n%8 >= 4")
    h = g.byte_step(h, "coalesce(bl[n-(n%4)+1], 0::HUGEINT)", "n%4 >= 1")
    h = g.byte_step(h, "coalesce(bl[n-(n%4)+2], 0::HUGEINT)", "n%4 >= 2")
    h = g.byte_step(h, "coalesce(bl[n-(n%4)+3], 0::HUGEINT)", "n%4 >= 3")
    h = g.mul(g.xor(h, g.shr(h, 33)), g.P2)
    h = g.mul(g.xor(h, g.shr(h, 29)), g.P3)
    h = g.xor(h, g.shr(h, 32))
    final = g.stage(
        f"CASE WHEN n >= 32 THEN CAST('xxh64-oracle-token-over-31-bytes' AS HUGEINT)"
        f" ELSE {h} END", carry="tok")
    ctes = ",\n".join(f"{n} AS ({b})" for n, b in g.stages)

    return f"""WITH
sg AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tok
       FROM (SELECT source, string_split(text, ' ') AS t
             FROM documents WHERE text IS NOT NULL AND source IS NOT NULL)
       WHERE len(t) >= 3),
tok0 AS (SELECT DISTINCT tok FROM sg),
tokb AS (SELECT tok, octet_length(encode(tok)) AS n,
           list_transform(range(1, octet_length(encode(tok))+1),
             i -> ((strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i-1, 1))-1)*16
                 + (strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i, 1))-1))::HUGEINT) AS bl
         FROM tok0),
toww AS (SELECT tok, n, bl,
           list_transform(range(0, n//8), k -> {word64}) AS w
         FROM tokb),
{ctes},
hsh AS (SELECT tok, (({final}) % {T63}::HUGEINT)::BIGINT AS v FROM {g.stages[-1][0]}),
sv AS (SELECT DISTINCT s.source, h.v FROM sg s JOIN hsh h USING (tok)),
rk AS (SELECT source, v,
         row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY source) AS cnt
       FROM sv),
sk AS (SELECT source, v, rn, cnt FROM rk WHERE rn <= 256),
th AS (SELECT source,
         CASE WHEN max(cnt) < 256 THEN {MAXL}
              ELSE max(CASE WHEN rn = 256 THEN v END) END AS theta
       FROM sk GROUP BY source),
pr AS (SELECT a.source AS group_a, b.source AS group_b,
         least(a.theta, b.theta) AS th
       FROM th a JOIN th b ON a.source < b.source),
ia AS (SELECT p.group_a, p.group_b, p.th, s.v
       FROM pr p JOIN sk s ON s.source = p.group_a
       WHERE s.v < p.th OR p.th = {MAXL}),
ib AS (SELECT p.group_a, p.group_b, s.v
       FROM pr p JOIN sk s ON s.source = p.group_b
       WHERE s.v < p.th OR p.th = {MAXL}),
cnts AS (SELECT p.group_a, p.group_b, any_value(p.th) AS th,
           (SELECT count(*) FROM ia WHERE ia.group_a = p.group_a AND ia.group_b = p.group_b) AS na,
           (SELECT count(*) FROM ib WHERE ib.group_a = p.group_a AND ib.group_b = p.group_b) AS nb,
           (SELECT count(*) FROM ia JOIN ib ON ia.group_a = ib.group_a
              AND ia.group_b = ib.group_b AND ia.v = ib.v
            WHERE ia.group_a = p.group_a AND ia.group_b = p.group_b) AS i
         FROM pr p GROUP BY p.group_a, p.group_b)
SELECT group_a, group_b,
       round(i * (CASE WHEN th = {MAXL} THEN 1.0
                       ELSE {T63}.0 / CAST(th AS DOUBLE) END), 2) AS est_shared,
       round(CASE WHEN na + nb - i = 0 THEN 0.0
                  ELSE i * 1.0 / (na + nb - i) END, 4) AS jaccard
FROM cnts
ORDER BY group_a, group_b"""

if __name__ == '__main__':
    sql = gen()
    print("SQL bytes:", len(sql), file=sys.stderr)
    if len(sys.argv) > 1:
        import duckdb
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sys.argv[1]}/documents.parquet'")
        t0 = time.time()
        rows = con.execute(sql).fetchall()
        print(f"oracle rows: {len(rows)} in {time.time()-t0:.1f}s", file=sys.stderr)
        for r in rows: print(r, file=sys.stderr)
        if len(sys.argv) > 2:
            exp = con.execute(
                f"SELECT * FROM '{sys.argv[2]}/*.parquet' ORDER BY group_a, group_b").fetchall()
            print("spark rows:", len(exp), file=sys.stderr)
            print("mismatches:", [(a, b) for a, b in zip(rows, exp) if a != b][:6], file=sys.stderr)
    else:
        print(sql)
