#!/usr/bin/env python3
"""Emit the DuckDB oracle SQL for q_dedup_minhash / q_dedup_incremental.

Same XXH64-in-SQL replay as gen_xxh64_sql.py (the q_dedup_simhash
generator), generalized: the seed is a COLUMN (sd in 0..31 — the 32
MinHash functions), inputs are distinct 3-word shingles (fixture max
26 bytes, inside the unrolled <32-byte path), signatures are per-(doc,
seed) SIGNED minima, band keys replay the concat_ws(',', band_id,
sig[4b..4b+3]) tuple, candidates verify with exact Jaccard >= 0.5.
Batch adds the 256-doc hot-bucket cap; incremental is uncapped and
restricted to pairs touching a new doc (doc_id % 7 = 0).

Run: python3 tools/gen_minhash_sql.py [sf_dir [spark_dump_dir]] — with a
testdata dir it executes the batch SQL and (optionally) diffs a Spark
Verify dump; the Scala emission lives in operators/MinhashOracleSql.scala
(regenerate + re-embed if the minhash query semantics ever change).
Validated against Spark dumps at sf0.001/0.01/0.1: 28/25/256 batch rows,
7/9/61 incremental rows, zero mismatches."""
import sys, time

M64 = "18446744073709551616::HUGEINT"
M32 = "4294967296::HUGEINT"
P1 = "11400714785074694791::HUGEINT"
P2 = "14029467366897019727::HUGEINT"
P3 = "1609587929392839161::HUGEINT"
P4 = "9650029242287828579::HUGEINT"
P5 = "2870177450012600261::HUGEINT"

stages = []
counter = [0]

def stage(expr, carry="*"):
    counter[0] += 1
    name = f"s{counter[0]}"
    prev = stages[-1][0] if stages else "toww"
    col = f"x{counter[0]}"
    stages.append((name, f"SELECT {carry}, {expr} AS {col} FROM {prev}"))
    return col

def mul(a, b):
    lo = stage(f"(({a})%{M32})*(({b})%{M32})")
    cross = stage(f"((({a})%{M32})*(({b})//{M32}) + (({a})//{M32})*(({b})%{M32}))%{M32}")
    return stage(f"({lo} + {cross}*{M32})%{M64}")

def rotl(x, r):
    hi = 1 << r
    lo = 1 << (64 - r)
    return stage(f"((({x})*{hi}::HUGEINT)%{M64}) + (({x})//{lo}::HUGEINT)")

def xor(a, b):
    def i64(x):
        return (f"(CASE WHEN ({x}) >= 9223372036854775808::HUGEINT"
                f" THEN ({x}) - {M64} ELSE ({x}) END)::BIGINT")
    r = stage(f"xor({i64(a)}, {i64(b)})")
    return stage(f"CASE WHEN {r} < 0 THEN {r}::HUGEINT + {M64} ELSE {r}::HUGEINT END")

def shr(x, s):
    return stage(f"(({x})//{1 << s}::HUGEINT)")

def addm(a, b):
    return stage(f"(({a}) + ({b}))%{M64}")

def guarded(cond, then_col, else_col):
    return stage(f"CASE WHEN {cond} THEN {then_col} ELSE {else_col} END")

def rnd0(lane):
    return mul(rotl(mul(lane, P2), 31), P1)

def word_step(h, w, cond):
    nh = addm(mul(rotl(xor(h, rnd0(w)), 27), P1), P4)
    return guarded(cond, nh, h)

def four_step(h, w32, cond):
    nh = addm(mul(rotl(xor(h, mul(w32, P1)), 23), P2), P3)
    return guarded(cond, nh, h)

def byte_step(h, b, cond):
    nh = mul(rotl(xor(h, mul(b, P5)), 11), P1)
    return guarded(cond, nh, h)

def gen():
    stages.clear()
    counter[0] = 0
    word64 = "(" + " + ".join(
        f"bl[8*k+{j+1}]*{1 << (8 * j)}::HUGEINT" for j in range(8)) + ")"
    word32 = "(" + " + ".join(
        f"bl[(n//8)*8+{j+1}]*{1 << (8 * j)}::HUGEINT" for j in range(4)) + ")"

    h = stage(f"(sd::HUGEINT + {P5} + n::HUGEINT)%{M64}")
    h = word_step(h, "coalesce(w[1], 0::HUGEINT)", "n//8 >= 1")
    h = word_step(h, "coalesce(w[2], 0::HUGEINT)", "n//8 >= 2")
    h = word_step(h, "coalesce(w[3], 0::HUGEINT)", "n//8 >= 3")
    h = four_step(h, f"coalesce({word32}, 0::HUGEINT)", "n%8 >= 4")
    h = byte_step(h, "coalesce(bl[n-(n%4)+1], 0::HUGEINT)", "n%4 >= 1")
    h = byte_step(h, "coalesce(bl[n-(n%4)+2], 0::HUGEINT)", "n%4 >= 2")
    h = byte_step(h, "coalesce(bl[n-(n%4)+3], 0::HUGEINT)", "n%4 >= 3")
    h = mul(xor(h, shr(h, 33)), P2)
    h = mul(xor(h, shr(h, 29)), P3)
    h = xor(h, shr(h, 32))
    final = stage(
        f"CASE WHEN n >= 32 THEN CAST('xxh64-oracle-token-over-31-bytes' AS HUGEINT)"
        f" ELSE {h} END", carry="tok, sd")

    ctes = ",\n".join(f"{n} AS ({b})" for n, b in stages)

    sql = f"""WITH
dsh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS t
              FROM documents WHERE text IS NOT NULL)
        WHERE len(t) >= 3),
tok0 AS (SELECT DISTINCT tok FROM dsh),
tokb AS (SELECT tok, sd, octet_length(encode(tok)) AS n,
           list_transform(range(1, octet_length(encode(tok))+1),
             i -> ((strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i-1, 1))-1)*16
                 + (strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i, 1))-1))::HUGEINT) AS bl
         FROM tok0 CROSS JOIN (SELECT unnest(range(0, 32)) AS sd) seeds),
toww AS (SELECT tok, sd, n, bl,
           list_transform(range(0, n//8), k -> {word64}) AS w
         FROM tokb),
{ctes},
hsh AS (SELECT tok, sd,
          (CASE WHEN {final} >= 9223372036854775808::HUGEINT
                THEN {final} - {M64} ELSE {final} END)::BIGINT AS h
        FROM {stages[-1][0]}),
mins AS (SELECT d.doc_id, t.sd, min(t.h) AS m
         FROM dsh d JOIN hsh t USING (tok)
         GROUP BY d.doc_id, t.sd),
sig AS (SELECT doc_id, list(m ORDER BY sd) AS sig FROM mins GROUP BY doc_id),
bk AS (SELECT doc_id, b.b AS band_id,
         b.b::VARCHAR || ',' || sig[4*b.b+1]::VARCHAR || ',' || sig[4*b.b+2]::VARCHAR
           || ',' || sig[4*b.b+3]::VARCHAR || ',' || sig[4*b.b+4]::VARCHAR AS key
       FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b) b),
kept AS (SELECT band_id, key FROM bk GROUP BY band_id, key
         HAVING count(*) BETWEEN 2 AND 256),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bk a JOIN kept USING (band_id, key)
         JOIN bk b ON a.band_id = b.band_id AND a.key = b.key
                   AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS nsh FROM dsh GROUP BY doc_id),
inter AS (SELECT c.id_a, c.id_b, count(*) AS i
          FROM cand c JOIN dsh a ON a.doc_id = c.id_a
          JOIN dsh b ON b.doc_id = c.id_b AND b.tok = a.tok
          GROUP BY c.id_a, c.id_b)
SELECT CAST(id_a AS BIGINT) AS doc_a, CAST(id_b AS BIGINT) AS doc_b,
       round(i * 1.0 / (x.nsh + y.nsh - i), 4) AS jaccard
FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b
WHERE i * 1.0 / (x.nsh + y.nsh - i) >= 0.5
ORDER BY doc_a, doc_b"""
    return sql

def gen_incremental():
    """Uncapped index joins, pairs touching a new doc (doc_id % 7 = 0)."""
    return gen().replace(
        """kept AS (SELECT band_id, key FROM bk GROUP BY band_id, key
         HAVING count(*) BETWEEN 2 AND 256),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bk a JOIN kept USING (band_id, key)
         JOIN bk b ON a.band_id = b.band_id AND a.key = b.key
                   AND a.doc_id < b.doc_id),""",
        """cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bk a JOIN bk b ON a.band_id = b.band_id AND a.key = b.key
                   AND a.doc_id < b.doc_id
         WHERE a.doc_id % 7 = 0 OR b.doc_id % 7 = 0),""")


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
        exp = con.execute(
            f"SELECT * FROM '{sys.argv[2]}/*.parquet' ORDER BY doc_a, doc_b").fetchall() \
            if len(sys.argv) > 2 else None
        if exp is not None:
            print("spark rows:", len(exp), file=sys.stderr)
            mism = [(a, b) for a, b in zip(rows, exp) if a != b]
            print("mismatches:", len(mism), mism[:5], file=sys.stderr)
            if len(rows) != len(exp):
                so = set(map(tuple, rows)); se = set(map(tuple, exp))
                print("only-oracle:", list(so - se)[:5], file=sys.stderr)
                print("only-spark:", list(se - so)[:5], file=sys.stderr)
    else:
        print(sql)
