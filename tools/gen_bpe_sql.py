#!/usr/bin/env python3
"""Emit the DuckDB oracle SQL for q_bpe_learn / q_bpe_encode.

BPE is iterative but deterministic (count-desc, pair-asc tiebreak), so
the 12 merge rounds unroll into a MATERIALIZED CTE chain (each round's
vocab is referenced twice — without the hint the chain inlines
exponentially). Symbols are rendered chr(2)||sym||chr(3), which makes
plain replace() exactly the learner's greedy left-to-right fold:
boundary-safe (no pattern can match a symbol's interior) and
overlap-correct (matches share no characters). encode continues from
the final vocab state: parse, explode weighted by word count, top-30.

Run: python3 tools/gen_bpe_sql.py [sf_dir [verify_out_dir]]; the Scala
emission lives in operators/BpeOracleSql.scala. Validated against Spark
dumps at sf0.001/0.01/0.1 — 12 learn + 30 encode rows each, zero
mismatches."""
import sys, time

ROUNDS = 12

def sym_parse(col):
    # symstr -> list of symbols: strip outer sentinels, split on \x03\x02
    return (f"string_split(substr({col}, 2, length({col}) - 2), chr(3) || chr(2))")

def gen():
    ctes = [f"""w0 AS (SELECT w, count(*) AS cnt FROM (
           SELECT unnest(string_split(text, ' ')) AS w FROM documents
           WHERE text IS NOT NULL) WHERE length(w) > 0 GROUP BY w),
v1 AS MATERIALIZED (SELECT list_aggregate(
           list_transform(range(1, length(w) + 1),
             i -> chr(2) || substr(w, i, 1) || chr(3)), 'string_agg', '')
         || chr(2) || '</w>' || chr(3) AS s, cnt
       FROM w0)"""]
    sel = []
    for r in range(1, ROUNDS + 1):
        ctes.append(f"""p{r} AS MATERIALIZED (SELECT pr.a, pr.b, sum(cnt) AS c FROM (
          SELECT unnest(list_transform(range(1, len(sy)),
                   i -> struct_pack(a := sy[i], b := sy[i+1]))) AS pr, cnt
          FROM (SELECT {sym_parse('s')} AS sy, cnt FROM v{r})
          WHERE len(sy) >= 2) AS t(pr, cnt)
        GROUP BY pr.a, pr.b)""")
        ctes.append(f"""m{r} AS MATERIALIZED (SELECT a, b, c FROM p{r}
        ORDER BY c DESC, a ASC, b ASC LIMIT 1)""")
        ctes.append(f"""v{r + 1} AS MATERIALIZED (SELECT replace(v.s,
            chr(2) || m.a || chr(3) || chr(2) || m.b || chr(3),
            chr(2) || m.a || m.b || chr(3)) AS s, v.cnt
        FROM v{r} v CROSS JOIN m{r} m)""")
        sel.append(f"SELECT {r}::BIGINT AS round, a AS left, b AS right, a || b AS merged, CAST(c AS BIGINT) AS cnt FROM m{r}")
    learn = "WITH\n" + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sel) + "\nORDER BY round"
    encode = ("WITH\n" + ",\n".join(ctes) + f""",
subs AS (SELECT unnest({sym_parse('s')}) AS subword, cnt FROM v{ROUNDS + 1})
SELECT subword, CAST(sum(cnt) AS BIGINT) AS cnt FROM subs
GROUP BY subword ORDER BY cnt DESC, subword ASC LIMIT 30""")
    return learn, encode

if __name__ == '__main__':
    learn, encode = gen()
    print("learn bytes:", len(learn), "encode bytes:", len(encode), file=sys.stderr)
    if len(sys.argv) > 1:
        import duckdb
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sys.argv[1]}/documents.parquet'")
        for name, q in [("q_bpe_learn", learn), ("q_bpe_encode", encode)]:
            t0 = time.time()
            rows = con.execute(q).fetchall()
            print(f"{name}: {len(rows)} rows in {time.time()-t0:.1f}s", file=sys.stderr)
            if len(sys.argv) > 2:
                order = "round" if name == "q_bpe_learn" else "cnt DESC, subword"
                exp = con.execute(
                    f"SELECT * FROM '{sys.argv[2]}/{name}/*.parquet' ORDER BY {order}").fetchall()
                mism = [(a, b) for a, b in zip(rows, exp) if a != b]
                print(f"  spark {len(exp)} rows, mismatches: {len(mism)} {mism[:4]}", file=sys.stderr)
    else:
        print(learn)
