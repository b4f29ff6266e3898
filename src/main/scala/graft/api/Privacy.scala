package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk profiling over a release candidate — the governance
  * check a corpus owner runs before shipping a slice of a 100 TB corpus
  * to a third party (absent in reference): k-anonymity (how small is the
  * smallest quasi-identifier equivalence class?) and l-diversity (does a
  * class leak its sensitive attribute by being homogeneous in it?).
  *
  * Both reduce to a single hash aggregation over the quasi-identifier
  * tuple — the corpus collapses to its class-count frame (≤ the
  * quasi-tuple cardinality, corpus-size-independent) before anything
  * else touches it, so the 100 TB cost is one shuffle keyed on the
  * quasi columns with map-side partial aggregation. No row-level data
  * survives into the output: only class shapes and counts.
  */
object Privacy {

  /** Equivalence-class profile for k-anonymity: one row per distinct
    * quasi-identifier combination with its class size and whether it
    * breaks the `k` floor (`at_risk = 1` when `class_size < k` — the
    * classes that would re-identify members if released).
    *
    * Output: quasiCols…, `class_size`, `at_risk` (bigint 0/1). The
    * released dataset is k-anonymous iff no row has `at_risk = 1`. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[Column], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", (col("class_size") < k).cast("bigint"))
  }

  /** Distinct l-diversity profile: one row per quasi-identifier class
    * with its size, the number of DISTINCT sensitive values it contains
    * (`n_sensitive`), and whether it falls below the `l` floor
    * (`at_risk = 1` — a class whose members all share few sensitive
    * values leaks that attribute even when k-anonymous).
    *
    * One aggregation: Spark plans `count(distinct)` alongside the plain
    * count as the standard two-phase expand — still a single logical
    * pass over the corpus, keyed on the quasi tuple. */
  def lDiversity(df: DataFrame, quasiCols: Seq[Column], sensitiveCol: Column,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiCols: _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(sensitiveCol).as("n_sensitive"))
      .withColumn("at_risk", (col("n_sensitive") < l).cast("bigint"))
  }

  /** t-closeness profile (Li/Li/Venkatasubramanian, ICDE 2007) for a
    * CATEGORICAL sensitive attribute: one row per quasi-identifier class
    * with the variational distance `t_dist = ½·Σ_s |P(s|class) − P(s)|`
    * between the class's sensitive-value distribution and the corpus-wide
    * one, flagged when it exceeds the `t` ceiling. The check k-anonymity
    * and l-diversity both miss: a large, diverse class still leaks when
    * its sensitive mix is far from background.
    *
    * Shape: the corpus collapses to its (quasi × sensitive) cell-count
    * frame in ONE hash aggregation; the three margins (class sizes,
    * global sensitive counts, total) derive from that frame, and the
    * distance is assembled on the class-spine × sensitive-spine cross —
    * margin-cardinality, corpus-size-independent, the same contingency
    * pattern as [[Drift.chiSquare]]. INTEGER-exact core: the summed term
    * is `|cc·n − g·class_size|` in DECIMAL(38,0) (a common-denominator
    * rewrite of |p−q|, absent cells included via the left join's
    * coalesce-0), so the only float op is the final single division —
    * bit-identical on any IEEE engine, safe to round. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(t > 0 && t < 1, s"t must be in (0,1), got $t")
    val cells = Ckpt(
      df.filter(col(sensitiveCol).isNotNull)
        .groupBy((quasiCols :+ sensitiveCol).map(col): _*)
        .agg(count(lit(1)).as("cc")))
    val cls = cells.groupBy(quasiCols.map(col): _*).agg(sum("cc").as("class_size"))
    val glob = cells.groupBy(col(sensitiveCol).as("s")).agg(sum("cc").as("gc"))
    val tot = cells.agg(sum("cc").as("n"))
    val spine = cls.crossJoin(glob).crossJoin(broadcast(tot))
    val renamed = cells.columns.foldLeft(cells) { (d, c) =>
      d.withColumnRenamed(c, "r_" + c)
    }
    val cond = (quasiCols.map(q => col(q) <=> col("r_" + q)) :+
      (col("s") <=> col("r_" + sensitiveCol))).reduce(_ && _)
    spine.join(renamed, cond, "left")
      .select((quasiCols.map(col) :+ col("class_size") :+ col("n") :+
        abs(coalesce(col("r_cc"), lit(0L)).cast("decimal(38,0)") * col("n") -
          col("gc").cast("decimal(38,0)") * col("class_size")).as("term")): _*)
      .groupBy((quasiCols.map(col) :+ col("class_size") :+ col("n")): _*)
      .agg(sum("term").as("numer"))
      .select((quasiCols.map(col) :+ col("class_size") :+
        round(col("numer").cast("double") /
          (lit(2.0) * col("class_size") * col("n")), 4).as("t_dist")): _*)
      .withColumn("at_risk", (col("t_dist") > t).cast("bigint"))
  }

  /** Differentially-private group counts with DETERMINISTIC Laplace
    * noise: `noisy_n = n + Lap(1/epsilon)` where the Laplace draw is
    * derived per group from `md5(key₁:…:keyₖ:seed)` through the inverse
    * CDF — the standard seeded-noise construction that makes a DP
    * release reproducible (and testable) while keeping the mechanism's
    * shape. Count queries have sensitivity 1, so scale b = 1/epsilon.
    *
    * The uniform comes from the first 8 hex digits of the digest
    * (`u = (v + ½)/16⁸`, v assembled positionally via instr over the
    * hex alphabet — portable integer arithmetic any SQL engine
    * replays), then `noise = −b·sgn(u−½)·ln(1−2|u−½|)`. One hash
    * aggregation to the group frame; noise is computed on
    * group-cardinality rows, never per corpus row. */
  def dpCounts(df: DataFrame, keyCols: Seq[String], epsilon: Double,
      seed: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val b = 1.0 / epsilon
    val keyStr = concat_ws(":",
      (keyCols.map(c => col(c).cast("string")) :+ lit(seed)): _*)
    val vTerms = (1 to 8).map(i =>
      s"(instr('0123456789abcdef', substring(h, $i, 1)) - 1) * ${math.pow(16, i - 1).toLong}L")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("h", md5(keyStr.cast("binary")))
      .withColumn("u",
        (expr(vTerms.mkString(" + ")).cast("double") + lit(0.5)) / lit(4294967296.0))
      .withColumn("noise",
        when(col("u") - 0.5 < 0, lit(b)).otherwise(lit(-b)) *
          log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)))
      .select((keyCols.map(col) :+ col("n") :+
        (floor((col("n") + col("noise")) * 10000) / 10000).as("noisy_n")): _*)
  }
}
