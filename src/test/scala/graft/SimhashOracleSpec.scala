package graft

import org.apache.spark.sql.functions._
import graft.operators.{CmsOracleSql, KmvOracleSql, MinhashOracleSql, SimhashOracleSql}

/** Pins the foundation the q_dedup_simhash DuckDB oracle rests on.
  *
  * The oracle re-implements XXH64(seed 42) in pure SQL, so its
  * correctness splits into (a) "the algorithm we transcribed IS the
  * hash `graft_simhash` votes with" — proven here by comparing a
  * clean-room spec-reference XXH64 against Spark's own `xxhash64`
  * column for strings covering every tail-length class the unrolled
  * SQL handles — and (b) "the SQL transcribes that algorithm" — proven
  * end-to-end by the driver gate (DuckDB replays signature + pairing
  * from `documents` and hash-matches the Spark dump; also
  * `tools/gen_xxh64_sql.py`, the same generator developed against
  * Spark outputs). Structural assertions below keep the emission from
  * drifting silently.
  */
class SimhashOracleSpec extends SparkTestBase {

  // clean-room XXH64 (public spec); the same algorithm the SQL unrolls
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rnd(acc: Long, lane: Long): Long =
    java.lang.Long.rotateLeft(acc + lane * P2, 31) * P1

  private def refXxh64(data: Array[Byte], seed: Long): Long = {
    val n = data.length
    var i = 0
    def word(off: Int, len: Int): Long = {
      var w = 0L; var j = len - 1
      while (j >= 0) { w = (w << 8) | (data(off + j) & 0xffL); j -= 1 }
      w
    }
    var h =
      if (n >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i <= n - 32) {
          v1 = rnd(v1, word(i, 8)); v2 = rnd(v2, word(i + 8, 8))
          v3 = rnd(v3, word(i + 16, 8)); v4 = rnd(v4, word(i + 24, 8))
          i += 32
        }
        var m = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        for (v <- Seq(v1, v2, v3, v4)) m = (m ^ rnd(0L, v)) * P1 + P4
        m
      } else seed + P5
    h += n
    while (i <= n - 8) {
      h = java.lang.Long.rotateLeft(h ^ rnd(0L, word(i, 8)), 27) * P1 + P4
      i += 8
    }
    if (i <= n - 4) {
      h = java.lang.Long.rotateLeft(h ^ (word(i, 4) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < n) {
      h = java.lang.Long.rotateLeft(h ^ ((data(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  test("spec-reference XXH64(42) matches Spark's xxhash64 on every tail-length class") {
    // lengths 0..33 hit: empty, byte-only tails (1-3), the 4-byte step
    // (4-7), word steps ×1..3 (8..31), and the ≥32 stripe path the SQL
    // guards against; plus multi-byte UTF-8
    val cases = (0 to 33).map(k => "abcdefghijklmnopqrstuvwxyz0123456789".take(k)) ++
      Seq("café", "中文token", "naïve-Ω", "x" * 64, "y" * 65)
    val df = spark.createDataFrame(cases.map(Tuple1(_))).toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h"))
    df.collect().foreach { r =>
      val s = r.getString(0)
      val expect = refXxh64(s.getBytes("UTF-8"), 42L)
      assert(r.getLong(1) == expect,
        s"xxhash64 mismatch for '${s.take(12)}' (len ${s.getBytes("UTF-8").length})")
    }
  }

  test("emitted oracle SQL carries the XXH64 constants, loud guard, and total order") {
    val sql = SimhashOracleSql.sql
    // unsigned decimal spellings of the five public primes
    for (p <- Seq("11400714785074694791", "14029467366897019727",
        "1609587929392839161", "9650029242287828579", "2870177450012600261"))
      assert(sql.contains(p), s"prime $p missing from oracle SQL")
    assert(sql.contains("xxh64-oracle-token-over-31-bytes"),
      "≥32-byte loud-fail guard missing")
    assert(sql.contains("ORDER BY doc_a, doc_b"), "total order missing")
    assert(sql.contains("hamming <= 3"), "hamming bound missing")
    // 4 blocks of 16 bits — the pigeonhole-complete bucketing at ≤3
    for (shift <- Seq("65536", "4294967296", "281474976710656"))
      assert(sql.contains(shift), s"block shift $shift missing")
    // stage chain stays linear: well under 100 KB (the naive nested
    // emission was 437 KB and growing exponentially with step depth)
    assert(sql.length < 100000, s"oracle SQL ballooned to ${sql.length} bytes")
  }

  test("minhash signatures are signed minima of xxhash64(seed j): cross-check") {
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val shingles = Seq("alpha beta gamma", "beta gamma delta8ch", "gamma delta8ch x",
      "naïve-Ω café 中文", "aaaaaaaa bbbbbbbb cccccccc") // 26-byte max, multi-byte UTF-8
    val sig = Seq(Tuple1(shingles)).toDF("shs")
      .selectExpr("graft_minhash(shs) AS sig")
      .head().getSeq[Long](0)
    assert(sig.length == 32)
    for (j <- 0 until 32) {
      val expect = shingles.map(s => refXxh64(s.getBytes("UTF-8"), j.toLong)).min
      assert(sig(j) == expect, s"minhash seed $j diverges: got ${sig(j)} want $expect")
    }
  }

  test("emitted minhash oracle SQL carries seeds-as-column, cap, verify, and total order") {
    val sql = MinhashOracleSql.sql
    for (p <- Seq("11400714785074694791", "14029467366897019727",
        "1609587929392839161", "9650029242287828579", "2870177450012600261"))
      assert(sql.contains(p), s"prime $p missing from minhash oracle SQL")
    assert(sql.contains("xxh64-oracle-token-over-31-bytes"),
      "≥32-byte loud-fail guard missing")
    assert(sql.contains("unnest(range(0, 32)) AS sd"), "32-seed column missing")
    assert(sql.contains("BETWEEN 2 AND 256"), "hot-bucket cap missing from batch SQL")
    assert(sql.contains(">= 0.5"), "jaccard threshold missing")
    assert(sql.contains("ORDER BY doc_a, doc_b"), "total order missing")
    assert(sql.length < 100000, s"minhash oracle SQL ballooned to ${sql.length} bytes")
    val inc = MinhashOracleSql.incrementalSql
    assert(!inc.contains("BETWEEN 2 AND 256"), "incremental SQL must be uncapped")
    assert(inc.contains("% 7 = 0"), "new-doc restriction missing from incremental SQL")
    assert(inc.contains("ORDER BY doc_a, doc_b"), "total order missing (incremental)")
  }

  test("emitted kmv oracle SQL carries the 63-bit mask, k=256, theta sentinel, and total order") {
    val sql = KmvOracleSql.sql
    assert(sql.contains("9223372036854775808"), "2^63 mask/scale missing")
    assert(sql.contains("9223372036854775807"), "un-full theta sentinel missing")
    assert(sql.contains("rn <= 256"), "k=256 minima cut missing")
    assert(sql.contains("xxh64-oracle-token-over-31-bytes"), "≥32-byte loud-fail guard missing")
    assert(sql.contains("ORDER BY group_a, group_b"), "total order missing")
    assert(sql.length < 100000, s"kmv oracle SQL ballooned to ${sql.length} bytes")
  }

  test("cms oracle transcribes MurmurHash3.stringHash: clean-room cross-check") {
    // the algorithm the 32-bit SQL unrolls, written independently from
    // the public murmur3 spec — must agree with Scala's own stringHash
    // for every length/parity class the oracle handles (≤16 chars)
    def ref(s: String, seed: Int): Int = {
      def mixLast(h: Int, d: Int): Int = {
        var k = d
        k *= 0xcc9e2d51
        k = Integer.rotateLeft(k, 15)
        k *= 0x1b873593
        h ^ k
      }
      def mix(h: Int, d: Int): Int =
        Integer.rotateLeft(mixLast(h, d), 13) * 5 + 0xe6546b64
      var h = seed
      var i = 0
      while (i + 1 < s.length) {
        h = mix(h, (s.charAt(i) << 16) + s.charAt(i + 1))
        i += 2
      }
      if (i < s.length) h = mixLast(h, s.charAt(i).toInt)
      h ^= s.length
      h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
      h
    }
    val cases = (0 to 16).map(k => "purchaseviewclick".take(k))
    for (s <- cases; seed <- 0 until 5)
      assert(ref(s, seed) == scala.util.hashing.MurmurHash3.stringHash(s, seed),
        s"murmur transcription diverges for '$s' seed $seed")
    // and the bucket mapping is floorMod into width
    assert(graft.api.Sketches.cmsIdx("purchase", 3, 1024) ==
      math.floorMod(ref("purchase", 3), 1024))
  }

  test("emitted cms oracle SQL carries the murmur constants, guards, and total order") {
    val sql = CmsOracleSql.sql
    for (c <- Seq("3432918353", "461845907", "2246822507", "3266489909", "3864292196"))
      assert(sql.contains(c), s"murmur constant $c missing")
    assert(sql.contains("murmur-oracle-string-unsupported"), "loud guard missing")
    assert(sql.contains("range(0, 5)"), "depth-5 seed column missing")
    assert(sql.contains("1024"), "width missing")
    assert(sql.contains("ORDER BY day_idx NULLS FIRST, key ASC"), "total order missing")
    assert(sql.length < 100000, s"cms oracle SQL ballooned to ${sql.length} bytes")
  }

  test("emitted bpe oracle SQL carries the unrolled rounds, sentinels, and total order") {
    val learn = graft.operators.BpeOracleSql.learnSql
    assert(learn.contains("m12 AS MATERIALIZED"), "12th merge round missing")
    assert(!learn.contains("m13 AS"), "round count drifted past 12")
    assert(learn.contains("chr(2)") && learn.contains("chr(3)"), "symbol sentinels missing")
    assert(learn.contains("ORDER BY c DESC, a ASC, b ASC LIMIT 1"), "tiebreak missing")
    assert(learn.contains("ORDER BY round"), "total order missing")
    val enc = graft.operators.BpeOracleSql.encodeSql
    assert(enc.contains("FROM v13"), "encode must read the final vocab state")
    assert(enc.contains("ORDER BY cnt DESC, subword ASC LIMIT 30"), "encode order missing")
  }

  test("emitted ann + ddsketch oracle SQL carries derivations, caps, and total orders") {
    import graft.operators.{AnnOracleSql, DdOracleSql}
    for ((sql, name) <- Seq((AnnOracleSql.joinSql, "join"), (AnnOracleSql.pairsSql, "pairs"),
        (AnnOracleSql.clustersSql, "clusters"), (AnnOracleSql.knnSql, "knn"))) {
      assert(sql.contains("2654435761"), s"planeSign constant missing ($name)")
      assert(sql.contains("256 AS cap"), s"hot-bucket cap missing ($name)")
      assert(sql.contains(java.lang.Double.toString(math.log1p(-0.8))),
        s"banding-curve numerator missing ($name)")
    }
    assert(AnnOracleSql.joinSql.contains("acos(0.4)") &&
      AnnOracleSql.knnSql.contains("acos(0.5)"),
      "derivation operating points must differ (join 0.4, knn 0.5)")
    assert(AnnOracleSql.clustersSql.contains("WITH RECURSIVE"), "CC closure missing")
    assert(AnnOracleSql.lshSql.contains("LIMIT 10"), "lsh top-k missing")
    val dd = DdOracleSql.sql
    assert(dd.contains(java.lang.Double.toString(math.log((1 + 0.01) / (1 - 0.01)))),
      "lnGamma literal missing")
    assert(dd.contains("floor(q.q * (t.cnt - 1))"), "rank walk missing")
    assert(dd.contains("ORDER BY day_idx NULLS FIRST, q ASC"), "total order missing")
  }

  test("simhash signatures vote with xxhash64(42): one-doc fixture cross-check") {
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val toks = Seq("alpha", "beta", "gamma", "delta8ch")
    val sig = Seq(toks.mkString(" ")).toDF("text")
      .selectExpr("graft_simhash(array_distinct(split(text, ' '))) AS sig")
      .head().getLong(0)
    val votes = Array.fill(64)(0)
    toks.foreach { t =>
      val h = refXxh64(t.getBytes("UTF-8"), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var expect = 0L
    for (j <- 0 until 64) if (votes(j) >= 0) expect |= (1L << j)
    assert(sig == expect, f"graft_simhash votes diverge: got $sig%x want $expect%x")
  }
}
