package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experiment readouts — the A/B-test statistics an analytics engine is
  * asked for daily, expressed as single-pass aggregation plans.
  *
  * [[twoProportionZ]] is the standard two-proportion z-test (pooled
  * variance, no continuity correction): unit-level conversion per arm,
  * arm rates, absolute lift, and the z statistic. The corpus collapses
  * to its per-UNIT frame in one aggregate (map-side combined), then to
  * ONE row of four exact longs; every reported statistic is a fixed
  * IEEE expression over those agreed integers, floor-truncated 4dp —
  * engine-exact end to end.
  */
object Experiment {

  /** Two-proportion z-test. `unitCol` is the randomization unit (user),
    * `armExpr` must be a deterministic 0/1 function of the unit (the
    * replayable hash-split contract — a rand() split is neither
    * replayable nor oracle-able), `successExpr` is the per-ROW success
    * predicate; a unit converts if ANY of its rows succeeds. Returns one
    * row: n_a, x_a, n_b, x_b, p_a, p_b, lift, z (z = 0 when either arm
    * is empty or the pooled variance degenerates to 0).
    *
    * Plan: one (unit)-keyed aggregate (arm rides as max — constant per
    * unit by contract), one 4-long conditional aggregate to a single
    * row. No join, no window, nothing after the first aggregate is
    * corpus-sized. */
  def twoProportionZ(df: DataFrame, unitCol: String, armExpr: Column,
      successExpr: Column): DataFrame = {
    val units = df
      .filter(col(unitCol).isNotNull)
      .groupBy(col(unitCol).as("u"))
      .agg(max(armExpr.cast("int")).as("arm"),
        max(successExpr.cast("int")).as("conv"))
    val m = units.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0, col("conv").cast("long")).otherwise(0L)).as("x_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1, col("conv").cast("long")).otherwise(0L)).as("x_b"))
    // denominators clamp to ≥1 (ANSI mode throws on /0 even under a
    // when() guard — codegen hoists the shared subexpressions); for any
    // populated arm greatest(n, 1) ≡ n, so the oracle tree is identical
    def safe(n: Column): Column = greatest(n, lit(1L))
    val pa = col("x_a").cast("double") / safe(col("n_a"))
    val pb = col("x_b").cast("double") / safe(col("n_b"))
    val pp = (col("x_a") + col("x_b")).cast("double") /
      safe(col("n_a") + col("n_b"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / safe(col("n_a")) + lit(1.0) / safe(col("n_b"))))
    m.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      (floor(pa * 10000) / 10000).as("p_a"),
      (floor(pb * 10000) / 10000).as("p_b"),
      (floor((pb - pa) * 10000) / 10000).as("lift"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        floor((pb - pa) / se * 10000) / 10000)
        .otherwise(lit(0.0)).as("z"))
  }
}
