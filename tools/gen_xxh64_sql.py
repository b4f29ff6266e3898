#!/usr/bin/env python3
"""Emit the DuckDB oracle SQL for q_dedup_simhash.

DuckDB has no xxhash64, so the oracle replays the PUBLIC XXH64 spec
(seed 42 — the exact hash `graft_simhash` votes with) in pure SQL:
unsigned-64 arithmetic modeled as HUGEINT mod 2^64, the 64×64→64
multiply split into 32-bit halves so no intermediate exceeds 128 bits,
XOR through a signed-BIGINT round trip. Tokens here are WORDS (the
fixture max is 8 bytes), so the <32-byte XXH64 path is fully unrolled
(3 word steps + one 4-byte step + 3 byte steps + the avalanche); a
token ≥32 bytes raises a conversion error on purpose — a fixture
change that grows tokens fails the gate loudly instead of silently
diverging. Each primitive (mul/rotl/xor) gets its own CTE stage so the
emitted SQL stays linear in the number of steps, not exponential in
their nesting depth.

Run: python3 tools/gen_xxh64_sql.py → prints the SQL (embedded in
operators/Dedup.scala as q_dedup_simhash's oracle; regenerate + re-embed
if the simhash query semantics ever change).
"""

M64 = "18446744073709551616::HUGEINT"   # 2^64
M32 = "4294967296::HUGEINT"             # 2^32
P1 = "11400714785074694791::HUGEINT"
P2 = "14029467366897019727::HUGEINT"
P3 = "1609587929392839161::HUGEINT"
P4 = "9650029242287828579::HUGEINT"
P5 = "2870177450012600261::HUGEINT"

stages = []          # (name, select_body) chain over the token frame
counter = [0]


def stage(expr, carry="*"):
    """Append one CTE computing `expr` AS x{i} over the previous stage
    (star-carry so every earlier intermediate stays addressable);
    returns the new column name. Flat chaining keeps the SQL linear."""
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
    """XXH64 round with acc=0: rotl(lane*P2, 31) * P1."""
    return mul(rotl(mul(lane, P2), 31), P1)


def word_step(h, w, cond):
    """h = rotl(h ^ round(0, w), 27) * P1 + P4, if cond else h."""
    nh = addm(mul(rotl(xor(h, rnd0(w)), 27), P1), P4)
    return guarded(cond, nh, h)


def four_step(h, w32, cond):
    """h = rotl(h ^ (w32*P1), 23) * P2 + P3, if cond else h."""
    nh = addm(mul(rotl(xor(h, mul(w32, P1)), 23), P2), P3)
    return guarded(cond, nh, h)


def byte_step(h, b, cond):
    """h = rotl(h ^ (b*P5), 11) * P1, if cond else h."""
    nh = mul(rotl(xor(h, mul(b, P5)), 11), P1)
    return guarded(cond, nh, h)


def gen():
    word64 = "(" + " + ".join(
        f"bl[8*k+{j+1}]*{1 << (8 * j)}::HUGEINT" for j in range(8)) + ")"
    word32 = "(" + " + ".join(
        f"bl[(n//8)*8+{j+1}]*{1 << (8 * j)}::HUGEINT" for j in range(4)) + ")"

    # conditional steps guard with dummy operand 0 when absent (the
    # guarded() CASE discards the result, but lists index NULL past the
    # end — coalesce keeps every arithmetic stage non-NULL)
    h = stage(f"(42::HUGEINT + {P5} + n::HUGEINT)%{M64}")
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
        f" ELSE {h} END", carry="tok")

    ctes = ",\n".join(f"{n} AS ({b})" for n, b in stages)
    bitw = " ".join(f"WHEN {j} THEN {1 << j}::HUGEINT" for j in range(64))

    sql = f"""WITH
tok0 AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE text IS NOT NULL),
tokb AS (SELECT tok, octet_length(encode(tok)) AS n,
           list_transform(range(1, octet_length(encode(tok))+1),
             i -> ((strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i-1, 1))-1)*16
                 + (strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i, 1))-1))::HUGEINT) AS bl
         FROM tok0),
toww AS (SELECT tok, n, bl,
           list_transform(range(0, n//8), k -> {word64}) AS w
         FROM tokb),
{ctes},
hsh AS (SELECT tok, {final} AS h FROM {stages[-1][0]}),
dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE text IS NOT NULL),
votes AS (SELECT d.doc_id, j.j,
            sum(CASE WHEN (t.h // (CASE j.j {bitw} END)) % 2 = 1
                     THEN 1 ELSE -1 END) AS v
          FROM dtok d JOIN hsh t USING (tok)
          CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j
          GROUP BY d.doc_id, j.j),
sig AS (SELECT doc_id,
          sum(CASE WHEN v >= 0 THEN (CASE j {bitw} END) ELSE 0::HUGEINT END) AS u
        FROM votes GROUP BY doc_id),
sigs AS (SELECT doc_id, u,
           (CASE WHEN u >= 9223372036854775808::HUGEINT
                 THEN u - {M64} ELSE u END)::BIGINT AS s
         FROM sig),
blk AS (SELECT doc_id, u, s, k.k,
          (u // (CASE k.k WHEN 0 THEN 1::HUGEINT WHEN 1 THEN 65536::HUGEINT
                 WHEN 2 THEN 4294967296::HUGEINT ELSE 281474976710656::HUGEINT END)) % 65536 AS b
        FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k),
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            bit_count(xor(a.s, b.s)) AS hamming
          FROM blk a JOIN blk b ON a.k = b.k AND a.b = b.b AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
FROM pairs WHERE hamming <= 3
ORDER BY doc_a, doc_b"""
    return sql


if __name__ == '__main__':
    print(gen())
