package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import graft.operators.HllOracleSql

/** Pins the q_approx_distinct DuckDB oracle's clean-room HLL++
  * transcription against Spark's REAL helper — critically on the
  * estimator branches the fixture never reaches (distinct counts far
  * below m keep it in the linear-counting regime; the bias-corrected
  * and raw-estimate paths only fire at higher cardinalities).
  */
class HllOracleSpec extends SparkTestBase {

  private val rsd = 0.02
  private val helper = new HyperLogLogPlusPlusHelper(rsd)
  private val p = helper.getClass
    .getField("org$apache$spark$sql$catalyst$util$HyperLogLogPlusPlusHelper$$p")
    .getInt(helper)
  private val m = 1 << p
  private val alphaM2 = {
    val f = helper.getClass.getDeclaredField("alphaM2")
    f.setAccessible(true)
    f.getDouble(helper)
  }

  // ---- clean-room replica of the algorithm the SQL transcribes ----

  private val P1 = 0x9E3779B185EBCA87L; private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L; private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def xxh64Long(l: Long, seed: Long = 42L): Long = {
    var h = seed + P5 + 8L
    val k = java.lang.Long.rotateLeft(l * P2, 31) * P1
    h = java.lang.Long.rotateLeft(h ^ k, 27) * P1 + P4
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  private def estimateBiasRef(e: Double): Double = {
    val estimates = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    val biases = HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)
    val k = HyperLogLogPlusPlusHelper.K
    val n = estimates.length
    val bs = java.util.Arrays.binarySearch(estimates, 0, n, e)
    val nearest = if (bs < 0) -(bs + 1) else bs
    var lo = math.max(nearest - k + 1, 0)
    var hi = math.min(lo + k, n)
    def dist(i: Int) = (e - estimates(i)) * (e - estimates(i))
    while (hi < n && dist(hi) < dist(lo)) { lo += 1; hi += 1 }
    var sum = 0.0; var i = lo
    while (i < hi) { sum += biases(i); i += 1 }
    sum / (hi - lo)
  }

  private def replica(values: Iterable[Long]): Long = {
    val M = new Array[Int](m)
    values.foreach { v =>
      val h = xxh64Long(v)
      val idx = (h >>> (64 - p)).toInt
      val rho = java.lang.Long.numberOfLeadingZeros((h << p) | (1L << (p - 1))) + 1
      if (rho > M(idx)) M(idx) = rho
    }
    var zInv = 0.0; var V = 0.0
    var j = 0
    while (j < m) {
      zInv += math.pow(0.5, M(j))
      if (M(j) == 0) V += 1.0
      j += 1
    }
    val e = alphaM2 / zInv
    def ebias = if (e < 5.0 * m) e - estimateBiasRef(e) else e
    val x =
      if (V > 0) {
        val h = m * math.log(m / V)
        // Spark keeps linear counting when H clears the threshold OR the
        // raw estimate is still in the small range (E <= 2.5m) — the
        // second disjunct is easy to miss and shifts results by ~0.3%
        if ((p < 19 && h <= HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4)) || e <= 2.5 * m) h
        else ebias
      } else ebias
    math.floor(x + 0.5).toLong
  }

  test("estimateBias transcription matches the real helper across the whole table range") {
    // sweep estimates from below the first raw entry past 5m — the
    // binary-search insertion points, window clamps, and the sliding
    // stop condition all get exercised
    var e = 1000.0
    while (e < 5.5 * m) {
      assert(math.abs(estimateBiasRef(e) - helper.estimateBias(e)) == 0.0,
        s"estimateBias diverges at e = $e")
      e += 37.7
    }
  }

  test("full replica matches approx_count_distinct on every estimator branch") {
    import spark.implicits._
    // 100 → linear counting; 3500/5000 → around the threshold switch;
    // 20000 → bias-corrected raw estimate (E <= 5m); 33000 → raw (E > 5m)
    for (n <- Seq(100, 3500, 5000, 20000, 33000)) {
      val vals = (0L until n.toLong).map(_ * 2654435761L + 12345L)
      val spark_ = vals.toDF("v")
        .agg(approx_count_distinct(col("v"), rsd)).head().getLong(0)
      val mine = replica(vals)
      assert(mine == spark_, s"replica diverges at n = $n: $mine vs $spark_")
    }
  }

  test("emitted hll oracle SQL carries the tables, register math, and total order") {
    val sql = HllOracleSql.sql
    assert(sql.contains("power(0.5, mr)"), "dyadic zInverse missing")
    assert(sql.contains(java.lang.Double.toString(alphaM2)), "alphaM2 literal missing")
    assert(sql.contains("floor(x + 0.5)"), "Math.round transcription missing")
    assert(sql.contains("ln("), "linear-counting ln missing")
    val raw = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
    assert(sql.contains(java.lang.Double.toString(raw(0))), "raw-estimate table missing")
    assert(sql.contains("ORDER BY event_type"), "total order missing")
    assert(sql.length < 150000, s"hll oracle SQL ballooned to ${sql.length} bytes")
  }
}
