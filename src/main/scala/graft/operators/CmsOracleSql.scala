package graft.operators

/** DuckDB oracle SQL for `q_freq_rollup`, built programmatically.
  *
  * A Count-Min sketch is a DETERMINISTIC function of the input multiset
  * — cell (row, `floorMod(MurmurHash3.stringHash(x, row), width)`) sums
  * the exact counts of the keys that hash there — so the "approximate"
  * estimates replay exactly: the oracle re-implements Scala's
  * MurmurHash3.stringHash (UTF-16 char pairs `(c0<<16)+c1` through the
  * murmur3-32 mix, odd-char tail via mixLast, `h ^ length` + avalanche)
  * in pure 32-bit SQL — BIGINT cells mod 2³², the two 32×32→32
  * multiplies through HUGEINT, xor on the in-range values — over the
  * distinct event types UNION the tracked probes (a KEY-CARDINALITY
  * frame, never raw rows), then rebuilds every probed cell from exact
  * per-(day, type) counts and takes the row-wise min. Per-day rows AND
  * the merged day_idx-NULL row (per-cell sums across days = the
  * loss-free CMS merge) both replay. Strings >16 chars or with
  * non-BMP/astral codepoints fail LOUDLY (CAST error) instead of
  * silently diverging — the [[XxhashSqlChain]] guard discipline.
  *
  * Validated by `tools/gen_cms_sql.py` (the same generator in Python,
  * checked against the Spark dumps at sf0.001/0.01/0.1 — zero
  * mismatches) and by [[graft.SimhashOracleSpec]]'s murmur cross-check.
  */
object CmsOracleSql {
  private val M32 = "4294967296" // 2^32
  private val C1 = "3432918353" // 0xcc9e2d51
  private val C2 = "461845907" // 0x1b873593
  private val F1 = "2246822507" // 0x85ebca6b
  private val F2 = "3266489909" // 0xc2b2ae35
  private val MixK = "3864292196" // 0xe6546b64

  private final class Chain {
    val stages = scala.collection.mutable.ArrayBuffer[(String, String)]()
    private var counter = 0
    def stage(expr: String, carry: String = "*"): String = {
      counter += 1
      val name = s"m$counter"
      val prev = if (stages.isEmpty) "chars" else stages.last._1
      val col = s"y$counter"
      stages += ((name, s"SELECT $carry, $expr AS $col FROM $prev"))
      col
    }
    def mul32(a: String, b: String): String =
      stage(s"CAST((CAST($a AS HUGEINT) * CAST($b AS HUGEINT)) % $M32 AS BIGINT)")
    def rotl32(x: String, r: Int): String =
      stage(s"(($x * ${1 << r}) % $M32) + ($x // ${1 << (32 - r)})")
    def xor32(a: String, b: String): String = stage(s"xor($a, $b)")
    def shr32(x: String, s: Int): String = stage(s"($x // ${1 << s})")
    def mixLast(h: String, k: String): String =
      xor32(h, mul32(rotl32(mul32(k, C1), 15), C2))
    def mix(h: String, k: String): String = {
      val h2 = rotl32(mixLast(h, k), 13)
      stage(s"(($h2 * 5) % $M32 + $MixK) % $M32")
    }
  }

  /** depth/width/tracked mirror q_freq_rollup's parameters exactly. */
  lazy val sql: String = {
    val depth = 5; val width = 1024; val maxChars = 16
    val tracked = Seq("click", "error", "purchase", "signup", "view", "absent_key")
    val c = new Chain
    import c._
    var h = stage("sd")
    for (p <- 0 until maxChars / 2) {
      val (i1, i2) = (2 * p + 1, 2 * p + 2)
      val d = stage(s"CASE WHEN n >= $i2 THEN coalesce(cs[$i1], 0) * 65536 + coalesce(cs[$i2], 0) ELSE 0 END")
      val nh = mix(h, d)
      h = stage(s"CASE WHEN n >= $i2 THEN $nh ELSE $h END")
    }
    val t = stage("CASE WHEN n % 2 = 1 THEN coalesce(cs[n], 0) ELSE 0 END")
    val nh = mixLast(h, t)
    h = stage(s"CASE WHEN n % 2 = 1 THEN $nh ELSE $h END")
    h = xor32(h, "n")
    h = xor32(h, shr32(h, 16))
    h = mul32(h, F1)
    h = xor32(h, shr32(h, 13))
    h = mul32(h, F2)
    h = xor32(h, shr32(h, 16))
    val s32 = stage(s"CASE WHEN $h >= 2147483648 THEN $h - $M32 ELSE $h END")
    val bkt = stage(
      s"CASE WHEN n > $maxChars OR mx > 65535" +
        " THEN CAST('murmur-oracle-string-unsupported' AS BIGINT)" +
        s" ELSE (($s32 % $width) + $width) % $width END",
      carry = "tok, sd")
    val ctes = c.stages.map { case (n, b) => s"$n AS ($b)" }.mkString(",\n")
    val last = c.stages.last._1
    val trackedSql = tracked.map(s => s"('$s')").mkString(", ")

    s"""WITH
ev AS (SELECT epoch_ms(ts) // 86400000 AS day_idx, event_type AS tok
       FROM events WHERE event_type IS NOT NULL),
cnt AS (SELECT day_idx, tok, count(*) AS c FROM ev GROUP BY day_idx, tok),
probes(tok) AS (VALUES $trackedSql),
toks AS (SELECT DISTINCT tok FROM ev UNION SELECT tok FROM probes),
chars AS (SELECT tok, sd, length(tok) AS n,
            coalesce((SELECT max(unicode(ch)) FROM unnest(string_split(tok, '')) AS u(ch)), 0) AS mx,
            list_transform(string_split(tok, ''), ch -> unicode(ch)) AS cs
          FROM toks CROSS JOIN (SELECT unnest(range(0, $depth)) AS sd) seeds),
$ctes,
hb AS (SELECT tok, sd, $bkt AS b FROM $last),
cells AS (SELECT c.day_idx, h.sd, h.b, sum(c.c) AS cell
          FROM cnt c JOIN hb h USING (tok)
          GROUP BY c.day_idx, h.sd, h.b),
days(day_idx) AS (SELECT DISTINCT day_idx FROM ev),
probe_cells AS (SELECT d.day_idx, p.tok AS key, h.sd,
                  coalesce(ce.cell, 0) AS cell
                FROM days d CROSS JOIN probes p
                JOIN hb h ON h.tok = p.tok
                LEFT JOIN cells ce ON ce.day_idx = d.day_idx
                  AND ce.sd = h.sd AND ce.b = h.b),
per_day AS (SELECT day_idx, key, min(cell) AS est
            FROM probe_cells GROUP BY day_idx, key),
mcells AS (SELECT sd, b, sum(cell) AS cell FROM cells GROUP BY sd, b),
mprobe AS (SELECT p.tok AS key, h.sd, coalesce(mc.cell, 0) AS cell
           FROM probes p JOIN hb h ON h.tok = p.tok
           LEFT JOIN mcells mc ON mc.sd = h.sd AND mc.b = h.b),
merged AS (SELECT NULL::BIGINT AS day_idx, key, min(cell) AS est
           FROM mprobe GROUP BY key)
SELECT CAST(day_idx AS BIGINT) AS day_idx, key, CAST(est AS BIGINT) AS est
FROM (SELECT * FROM per_day UNION ALL SELECT * FROM merged)
ORDER BY day_idx NULLS FIRST, key ASC"""
  }
}
