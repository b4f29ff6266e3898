#!/usr/bin/env python3
"""Emit the DuckDB oracle SQL for q_approx_distinct.

Spark's approx_count_distinct (HyperLogLog++, rsd 0.02 -> p=12) is an
approximate estimator but a deterministic function of the input set:
XXH64(42)-of-long registers (idx = h >>> 52, rho = nlz((h<<12)|2^11)+1),
zInverse as an exact dyadic double sum, E = alphaM2/zInverse, the K=6
sliding-window bias interpolation over Spark's own RAW_ESTIMATE_DATA /
BIAS_DATA tables, linear counting m*ln(m/V) kept when H <= threshold OR
E <= 2.5m (Spark's second small-range disjunct — easy to miss), and
Math.round = floor(x+0.5).

Reads the tables from /tmp/hll_tables.json — regenerate with the
ExtractHll.java snippet (javac -cp spark-catalyst ExtractHll.java; it
reflects p/alphaM2 and dumps THRESHOLDS/RAW_ESTIMATE_DATA/BIAS_DATA for
the p in use). The Scala emission (operators/HllOracleSql.scala) is the
authoritative one: it reads the tables from the live
HyperLogLogPlusPlusHelper at emission time, so it can never go stale.
Validated against Spark dumps at sf0.001/0.01/0.1 and pinned on the
estimator branches the fixture never reaches by HllOracleSpec."""
import sys, time, json

T = json.load(open('/tmp/hll_tables.json'))
P, ALPHAM2, K = T['p'], T['alphaM2'], T['K']
RAW, BIAS, THRESHOLD = T['raw'], T['bias'], T['threshold']
M = 1 << P
M64 = "18446744073709551616::HUGEINT"
P1 = "11400714785074694791::HUGEINT"
P2 = "14029467366897019727::HUGEINT"
P3 = "1609587929392839161::HUGEINT"
P4 = "9650029242287828579::HUGEINT"
P5 = "2870177450012600261::HUGEINT"

stages = []
counter = [0]

def stage(expr, carry="*"):
    counter[0] += 1
    name = f"h{counter[0]}"
    prev = stages[-1][0] if stages else "vals"
    col = f"z{counter[0]}"
    stages.append((name, f"SELECT {carry}, {expr} AS {col} FROM {prev}"))
    return col

def mul(a, b):
    M32 = "4294967296::HUGEINT"
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

def gen():
    stages.clear(); counter[0] = 0
    # XXH64 of the long's 8 LE bytes: h = seed+P5+8, one word round, avalanche
    h = stage(f"(42::HUGEINT + {P5} + 8::HUGEINT)%{M64}")
    k = mul(rotl(mul("w", P2), 31), P1)
    h = stage(f"(({mul(rotl(xor(h, k), 27), P1)}) + {P4})%{M64}")
    h = mul(xor(h, shr(h, 33)), P2)
    h = mul(xor(h, shr(h, 29)), P3)
    fin = xor(h, shr(h, 32))
    ctes = ",\n".join(f"{n} AS ({b})" for n, b in stages)
    last = stages[-1][0]
    # bit-length CASE chain for rho (w2 >= 2^(P-1) always)
    blen = " ".join(
        f"WHEN w2 >= {1 << b}::HUGEINT THEN {b + 1}" for b in range(63, P - 2, -1))
    raw_sql = ", ".join(f"({i}, {v!r}::DOUBLE)" for i, v in enumerate(RAW))
    bias_sql = ", ".join(f"({i}, {v!r}::DOUBLE)" for i, v in enumerate(BIAS))
    n_raw = len(RAW)

    return f"""WITH
vals AS (SELECT event_type AS g,
           ((CAST(user_id AS HUGEINT) % {M64}) + {M64}) % {M64} AS w
         FROM (SELECT DISTINCT event_type, user_id FROM events
               WHERE user_id IS NOT NULL)),
{ctes},
reg AS (SELECT g,
          ({fin}) // {1 << (64 - P)}::HUGEINT AS idx,
          (({fin}) * {1 << P}::HUGEINT) % {M64} + {1 << (P - 1)}::HUGEINT AS w2
        FROM {last}),
rho AS (SELECT g, idx, 65 - (CASE {blen} END) AS r FROM reg),
regs AS (SELECT g, idx, max(r) AS mr FROM rho GROUP BY g, idx),
-- zInverse = V*2^0 + sum 0.5^M over occupied registers: every term is an
-- exact dyadic double and the register spread keeps the running sum exact
-- (same exactness envelope as Spark's own sequential register loop)
znum AS (SELECT g, ({M} - count(*)) AS v,
           ({M} - count(*))::DOUBLE + sum(power(0.5, mr)) AS zinv
         FROM regs GROUP BY g),
est AS (SELECT g, v, {ALPHAM2!r} / zinv AS e FROM znum),
rawt(i, re) AS (VALUES {raw_sql}),
biast(i, bv) AS (VALUES {bias_sql}),
-- bias window: i0 = insertion point; slide the K-window right while closer
i0 AS (SELECT g, v, e, (SELECT count(*) FROM rawt WHERE re < e) AS ins FROM est),
lo0 AS (SELECT g, v, e, greatest(ins - {K} + 1, 0) AS lo0,
          least(greatest(ins - {K} + 1, 0) + {K}, {n_raw}) AS hi0 FROM i0),
-- shift s chosen greedily: smallest s where the next slide would not improve
shifts AS (SELECT l.g, s.s,
             CASE WHEN l.hi0 + s.s >= {n_raw} THEN false
                  ELSE (SELECT (l.e - re) * (l.e - re) FROM rawt WHERE i = l.hi0 + s.s)
                     < (SELECT (l.e - re) * (l.e - re) FROM rawt WHERE i = l.lo0 + s.s)
             END AS improves
           FROM lo0 l CROSS JOIN (SELECT unnest(range(0, {n_raw} + 1)) AS s) s),
stop AS (SELECT g, min(s) AS s FROM shifts WHERE NOT improves GROUP BY g),
win AS (SELECT l.g, l.v, l.e, l.lo0 + st.s AS lo, l.hi0 + st.s AS hi
        FROM lo0 l JOIN stop st USING (g)),
eb AS (SELECT w.g, w.v, w.e,
         CASE WHEN w.e < {5.0 * M!r}
              THEN w.e - (SELECT sum(bv) FROM biast WHERE i >= w.lo AND i < w.hi) / (w.hi - w.lo)
              ELSE w.e END AS ebias
       FROM win w),
res AS (SELECT g,
          CASE WHEN v > 0 AND ({M}::DOUBLE * ln({M}::DOUBLE / v) <= {THRESHOLD!r}
                               OR e <= {2.5 * M!r})
               THEN {M}::DOUBLE * ln({M}::DOUBLE / v)
               ELSE ebias END AS x
        FROM eb)
SELECT g AS event_type, CAST(floor(x + 0.5) AS BIGINT) AS approx_users
FROM res ORDER BY event_type"""

if __name__ == '__main__':
    sql = gen()
    print("SQL bytes:", len(sql), file=sys.stderr)
    if len(sys.argv) > 1:
        import duckdb
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sys.argv[1]}/events.parquet'")
        t0 = time.time()
        rows = con.execute(sql).fetchall()
        print(f"oracle: {rows} in {time.time()-t0:.1f}s", file=sys.stderr)
        if len(sys.argv) > 2:
            exp = con.execute(
                f"SELECT * FROM '{sys.argv[2]}/*.parquet' ORDER BY event_type").fetchall()
            print("spark:", exp, file=sys.stderr)
            print("match:", rows == exp, file=sys.stderr)
    else:
        print(sql)
