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
}
