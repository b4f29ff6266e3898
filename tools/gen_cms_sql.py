#!/usr/bin/env python3
"""Emit the DuckDB oracle SQL for q_freq_rollup.

A Count-Min sketch is a deterministic function of the input multiset —
cell (row, floorMod(MurmurHash3.stringHash(x, row), width)) sums the
exact counts of the keys hashing there — so the estimates replay
exactly: Scala's MurmurHash3.stringHash (UTF-16 char pairs (c0<<16)+c1
through the murmur3-32 mix, odd tail via mixLast, h^length + avalanche)
re-implemented in 32-bit SQL over distinct event types UNION the
tracked probes (key-cardinality, never raw rows), probed cells rebuilt
from exact per-(day, type) counts, est = min over rows. Per-day rows
and the merged day_idx-NULL row (per-cell day sums = the loss-free CMS
merge) both replay. Strings >16 chars / non-BMP codepoints fail loudly.

Run: python3 tools/gen_cms_sql.py [sf_dir [spark_dump_dir]]; the Scala
emission lives in operators/CmsOracleSql.scala. Validated against the
Spark dumps at sf0.001/0.01/0.1 — zero mismatches."""
import sys, time

M32 = "4294967296"          # 2^32
C1 = "3432918353"           # 0xcc9e2d51 unsigned
C2 = "461845907"            # 0x1b873593
F1 = "2246822507"           # 0x85ebca6b
F2 = "3266489909"           # 0xc2b2ae35
MIXK = "3864292196"         # 0xe6546b64

stages = []
counter = [0]

def stage(expr, carry="*"):
    counter[0] += 1
    name = f"m{counter[0]}"
    prev = stages[-1][0] if stages else "chars"
    col = f"y{counter[0]}"
    stages.append((name, f"SELECT {carry}, {expr} AS {col} FROM {prev}"))
    return col

def mul32(a, b):
    # (a*b) mod 2^32 via HUGEINT (operands < 2^32 so product < 2^64)
    return stage(f"CAST((CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT)) % {M32} AS BIGINT)")

def rotl32(x, r):
    return stage(f"(({x} * {1 << r}) % {M32}) + ({x} // {1 << (32 - r)})")

def xor32(a, b):
    return stage(f"xor({a}, {b})")  # both < 2^32, fits signed 64

def shr32(x, s):
    return stage(f"({x} // {1 << s})")

def mix_last(h, k):
    k1 = mul32(k, C1)
    k2 = rotl32(k1, 15)
    k3 = mul32(k2, C2)
    return xor32(h, k3)

def mix(h, k):
    h1 = mix_last(h, k)
    h2 = rotl32(h1, 13)
    return stage(f"(({h2} * 5) % {M32} + {MIXK}) % {M32}")

def gen(max_chars=16, depth=5, width=1024, probes=None,
        tracked_sql=None):
    stages.clear(); counter[0] = 0
    # h starts at seed = row index sd
    h = stage("sd")
    # pairs: chars are 1-based; pair p uses chars 2p+1, 2p+2 (0-based p)
    for p in range(max_chars // 2):
        i1, i2 = 2 * p + 1, 2 * p + 2
        data = f"coalesce(cs[{i1}], 0) * 65536 + coalesce(cs[{i2}], 0)"
        d = stage(f"CASE WHEN n >= {i2} THEN {data} ELSE 0 END")
        nh = mix(h, d)
        h = stage(f"CASE WHEN n >= {i2} THEN {nh} ELSE {h} END")
    # odd tail: the last unpaired char
    t = stage("CASE WHEN n % 2 = 1 THEN coalesce(cs[n], 0) ELSE 0 END")
    nh = mix_last(h, t)
    h = stage(f"CASE WHEN n % 2 = 1 THEN {nh} ELSE {h} END")
    # finalize: h ^= length; avalanche
    h = xor32(h, "n")
    h = xor32(h, shr32(h, 16))
    h = mul32(h, F1)
    h = xor32(h, shr32(h, 13))
    h = mul32(h, F2)
    h = xor32(h, shr32(h, 16))
    # signed int32 view, then floorMod width
    s32 = stage(f"CASE WHEN {h} >= 2147483648 THEN {h} - {M32} ELSE {h} END")
    bkt = stage(
        f"CASE WHEN n > {max_chars} OR mx > 65535"
        f" THEN CAST('murmur-oracle-string-unsupported' AS BIGINT)"
        f" ELSE (({s32} % {width}) + {width}) % {width} END",
        carry="tok, sd")
    ctes = ",\n".join(f"{n} AS ({b})" for n, b in stages)
    last = stages[-1][0]
    return f"""WITH
ev AS (SELECT epoch_ms(ts) // 86400000 AS day_idx, event_type AS tok
       FROM events WHERE event_type IS NOT NULL),
cnt AS (SELECT day_idx, tok, count(*) AS c FROM ev GROUP BY day_idx, tok),
probes(tok) AS (VALUES {tracked_sql}),
toks AS (SELECT DISTINCT tok FROM ev UNION SELECT tok FROM probes),
chars AS (SELECT tok, sd, length(tok) AS n,
            coalesce((SELECT max(unicode(c)) FROM unnest(string_split(tok, '')) AS u(c)), 0) AS mx,
            list_transform(string_split(tok, ''), c -> unicode(c)) AS cs
          FROM toks CROSS JOIN (SELECT unnest(range(0, {depth})) AS sd) seeds),
{ctes},
hb AS (SELECT tok, sd, {bkt} AS b FROM {last}),
-- per (day, row, bucket) cell counts from exact type counts
cells AS (SELECT c.day_idx, h.sd, h.b, sum(c.c) AS cell
          FROM cnt c JOIN hb h USING (tok)
          GROUP BY c.day_idx, h.sd, h.b),
days(day_idx) AS (SELECT DISTINCT day_idx FROM ev),
-- probe estimates per day: min over rows of the probed cell (0 if empty)
probe_cells AS (SELECT d.day_idx, p.tok AS key, h.sd,
                  coalesce(ce.cell, 0) AS cell
                FROM days d CROSS JOIN probes p
                JOIN hb h ON h.tok = p.tok
                LEFT JOIN cells ce ON ce.day_idx = d.day_idx
                  AND ce.sd = h.sd AND ce.b = h.b),
per_day AS (SELECT day_idx, key, min(cell) AS est
            FROM probe_cells GROUP BY day_idx, key),
-- merged (day_idx NULL): per-cell sums across days, then the same min
mcells AS (SELECT sd, b, sum(cell) AS cell FROM cells GROUP BY sd, b),
mprobe AS (SELECT p.tok AS key, h.sd, coalesce(mc.cell, 0) AS cell
           FROM probes p JOIN hb h ON h.tok = p.tok
           LEFT JOIN mcells mc ON mc.sd = h.sd AND mc.b = h.b),
merged AS (SELECT NULL::BIGINT AS day_idx, key, min(cell) AS est
           FROM mprobe GROUP BY key)
SELECT CAST(day_idx AS BIGINT) AS day_idx, key, CAST(est AS BIGINT) AS est
FROM (SELECT * FROM per_day UNION ALL SELECT * FROM merged)
ORDER BY day_idx NULLS FIRST, key ASC"""

if __name__ == '__main__':
    tracked = ["click", "error", "purchase", "signup", "view", "absent_key"]
    tracked_sql = ", ".join(f"('{t}')" for t in tracked)
    sql = gen(tracked_sql=tracked_sql)
    print("SQL bytes:", len(sql), file=sys.stderr)
    if len(sys.argv) > 1:
        import duckdb
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sys.argv[1]}/events.parquet'")
        t0 = time.time()
        rows = con.execute(sql).fetchall()
        print(f"oracle rows: {len(rows)} in {time.time()-t0:.1f}s", file=sys.stderr)
        if len(sys.argv) > 2:
            exp = con.execute(
                f"SELECT * FROM '{sys.argv[2]}/*.parquet' ORDER BY day_idx NULLS FIRST, key").fetchall()
            print("spark rows:", len(exp), file=sys.stderr)
            mism = [(a, b) for a, b in zip(rows, exp) if a != b]
            print("mismatches:", len(mism), mism[:6], file=sys.stderr)
    else:
        print(sql)
