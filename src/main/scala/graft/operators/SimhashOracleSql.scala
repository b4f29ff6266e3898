package graft.operators

/** DuckDB oracle SQL for `q_dedup_simhash`, built programmatically.
  *
  * DuckDB has no xxhash64, so the oracle replays the PUBLIC XXH64 spec
  * (seed 42 — the exact hash `graft_simhash` votes with) in pure SQL:
  * unsigned-64 arithmetic modeled as HUGEINT mod 2⁶⁴, the 64×64→64
  * multiply split into 32-bit halves so no intermediate exceeds 128
  * bits, XOR through a signed-BIGINT round trip (bit-identical either
  * representation). Tokens are words (fixture max 8 bytes), so the
  * <32-byte XXH64 path is fully unrolled — 3 word steps, one 4-byte
  * step, 3 byte steps, the avalanche; a token ≥32 bytes raises a
  * conversion error ON PURPOSE, so a fixture change that grows tokens
  * fails the gate loudly instead of silently diverging. Each primitive
  * (mul/rotl/xor) gets its own star-carry CTE stage, keeping the
  * emitted SQL linear (~22 KB) in the number of steps rather than
  * exponential in their nesting depth.
  *
  * Validated two ways: `tools/gen_xxh64_sql.py` is the same generator
  * in Python (developed against Spark's own xxhash64 outputs for
  * strings of every tail-length class), and [[graft.SimhashOracleSpec]]
  * pins this Scala emission byte-for-byte against a reference XXH64.
  */
object SimhashOracleSql {
  private val M64 = "18446744073709551616::HUGEINT" // 2^64
  private val M32 = "4294967296::HUGEINT" // 2^32
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private final class Chain {
    val stages = scala.collection.mutable.ArrayBuffer[(String, String)]()
    private var counter = 0

    /** One CTE computing `expr` AS x{i} over the previous stage
      * (star-carry so every earlier intermediate stays addressable). */
    def stage(expr: String, carry: String = "*"): String = {
      counter += 1
      val name = s"s$counter"
      val prev = if (stages.isEmpty) "toww" else stages.last._1
      val col = s"x$counter"
      stages += ((name, s"SELECT $carry, $expr AS $col FROM $prev"))
      col
    }

    /** (a·b) mod 2⁶⁴ via 32-bit half products (each < 2⁹⁶). */
    def mul(a: String, b: String): String = {
      val lo = stage(s"(($a)%$M32)*(($b)%$M32)")
      val cross = stage(s"((($a)%$M32)*(($b)//$M32) + (($a)//$M32)*(($b)%$M32))%$M32")
      stage(s"($lo + $cross*$M32)%$M64")
    }

    def rotl(x: String, r: Int): String = {
      val hi = 1L << r
      val lo = BigInt(1) << (64 - r)
      stage(s"((($x)*$hi::HUGEINT)%$M64) + (($x)//$lo::HUGEINT)")
    }

    def xor(a: String, b: String): String = {
      def i64(x: String) =
        s"(CASE WHEN ($x) >= 9223372036854775808::HUGEINT THEN ($x) - $M64 ELSE ($x) END)::BIGINT"
      val r = stage(s"xor(${i64(a)}, ${i64(b)})")
      stage(s"CASE WHEN $r < 0 THEN $r::HUGEINT + $M64 ELSE $r::HUGEINT END")
    }

    def shr(x: String, s: Int): String =
      stage(s"(($x)//${BigInt(1) << s}::HUGEINT)")

    def addm(a: String, b: String): String = stage(s"(($a) + ($b))%$M64")

    def guarded(cond: String, thenCol: String, elseCol: String): String =
      stage(s"CASE WHEN $cond THEN $thenCol ELSE $elseCol END")

    /** XXH64 round with acc = 0: rotl(lane·P2, 31)·P1. */
    def rnd0(lane: String): String = mul(rotl(mul(lane, P2), 31), P1)

    def wordStep(h: String, w: String, cond: String): String =
      guarded(cond, addm(mul(rotl(xor(h, rnd0(w)), 27), P1), P4), h)

    def fourStep(h: String, w32: String, cond: String): String =
      guarded(cond, addm(mul(rotl(xor(h, mul(w32, P1)), 23), P2), P3), h)

    def byteStep(h: String, b: String, cond: String): String =
      guarded(cond, mul(rotl(xor(h, mul(b, P5)), 11), P1), h)
  }

  lazy val sql: String = {
    val c = new Chain
    import c._
    val word64 = (0 until 8)
      .map(j => s"bl[8*k+${j + 1}]*${BigInt(1) << (8 * j)}::HUGEINT")
      .mkString("(", " + ", ")")
    val word32 = (0 until 4)
      .map(j => s"bl[(n//8)*8+${j + 1}]*${BigInt(1) << (8 * j)}::HUGEINT")
      .mkString("(", " + ", ")")

    // conditional steps pass dummy operand 0 when absent (guarded()
    // discards the result; coalesce keeps every stage non-NULL because
    // list indexing past the end yields NULL)
    var h = stage(s"(42::HUGEINT + $P5 + n::HUGEINT)%$M64")
    h = wordStep(h, "coalesce(w[1], 0::HUGEINT)", "n//8 >= 1")
    h = wordStep(h, "coalesce(w[2], 0::HUGEINT)", "n//8 >= 2")
    h = wordStep(h, "coalesce(w[3], 0::HUGEINT)", "n//8 >= 3")
    h = fourStep(h, s"coalesce($word32, 0::HUGEINT)", "n%8 >= 4")
    h = byteStep(h, "coalesce(bl[n-(n%4)+1], 0::HUGEINT)", "n%4 >= 1")
    h = byteStep(h, "coalesce(bl[n-(n%4)+2], 0::HUGEINT)", "n%4 >= 2")
    h = byteStep(h, "coalesce(bl[n-(n%4)+3], 0::HUGEINT)", "n%4 >= 3")
    h = mul(xor(h, shr(h, 33)), P2)
    h = mul(xor(h, shr(h, 29)), P3)
    h = xor(h, shr(h, 32))
    val fin = stage(
      "CASE WHEN n >= 32 THEN CAST('xxh64-oracle-token-over-31-bytes' AS HUGEINT)" +
        s" ELSE $h END",
      carry = "tok")

    val ctes = stages.map { case (n, b) => s"$n AS ($b)" }.mkString(",\n")
    val bitw = (0 until 64)
      .map(j => s"WHEN $j THEN ${BigInt(1) << j}::HUGEINT")
      .mkString(" ")

    s"""WITH
tok0 AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE text IS NOT NULL),
tokb AS (SELECT tok, octet_length(encode(tok)) AS n,
           list_transform(range(1, octet_length(encode(tok))+1),
             i -> ((strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i-1, 1))-1)*16
                 + (strpos('0123456789ABCDEF', substr(hex(encode(tok)), 2*i, 1))-1))::HUGEINT) AS bl
         FROM tok0),
toww AS (SELECT tok, n, bl,
           list_transform(range(0, n//8), k -> $word64) AS w
         FROM tokb),
$ctes,
hsh AS (SELECT tok, $fin AS h FROM ${stages.last._1}),
dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents WHERE text IS NOT NULL),
votes AS (SELECT d.doc_id, j.j,
            sum(CASE WHEN (t.h // (CASE j.j $bitw END)) % 2 = 1
                     THEN 1 ELSE -1 END) AS v
          FROM dtok d JOIN hsh t USING (tok)
          CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j
          GROUP BY d.doc_id, j.j),
sig AS (SELECT doc_id,
          sum(CASE WHEN v >= 0 THEN (CASE j $bitw END) ELSE 0::HUGEINT END) AS u
        FROM votes GROUP BY doc_id),
sigs AS (SELECT doc_id, u,
           (CASE WHEN u >= 9223372036854775808::HUGEINT
                 THEN u - $M64 ELSE u END)::BIGINT AS s
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
  }
}
