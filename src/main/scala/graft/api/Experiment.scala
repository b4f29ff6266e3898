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

  /** Cumulative Poisson(1) CDF thresholds for k = 0..5; a uniform draw
    * maps through them to a bootstrap weight (≥ 6 truncated — P ≈ 6e-5,
    * the standard bounded-weight cut). Full-precision literals so both
    * engines compare against bit-identical constants. */
  private[graft] val poisson1Cdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /** Poisson-bootstrap confidence interval for the mean of `valueCol` —
    * the error bars every reported metric should carry. The multinomial
    * bootstrap is Poissonized (each row enters replicate b with weight
    * ~ Poisson(1)), which is THE distributed form: no resampling pass,
    * no per-replicate shuffle of the corpus — one `explode` fans each
    * row into its B replicate memberships and ONE map-side-combined
    * (replicate)-keyed aggregate reduces to B weighted means; the
    * percentile step runs on the B-row frame. Corpus cost is B× the
    * scan — the published price of the estimator (use BLB beyond that).
    *
    * DETERMINISTIC: the Poisson draw comes from the inverse CDF over a
    * uniform derived from `md5(id:b:seed)` (the [[Privacy.dpCounts]]
    * mechanism), so the release is replayable and the oracle replays
    * the identical weights. Exactness: each row's contribution
    * `w · value` is one IEEE multiply of agreed operands quantized
    * DECIMAL(30,10) before the order-proof sum; replicate means are
    * fixed double expressions; the CI bounds are exact interpolated
    * percentiles over the B means, floor-4dp.
    *
    * Returns one row: `b`, `ci_lo`, `ci_mid`, `ci_hi` (2.5 / 50 /
    * 97.5 percentiles of the replicate means). */
  def bootstrapMeanCi(df: DataFrame, idCol: String, valueCol: String,
      b: Int = 20, seed: String = "graft-boot"): DataFrame = {
    require(b >= 4, s"need ≥4 replicates for a CI, got $b")
    val vTerms = (1 to 8).map(i =>
      s"(instr('0123456789abcdef', substring(__h, $i, 1)) - 1) * ${math.pow(16, i - 1).toLong}L")
    val weight = poisson1Cdf.zipWithIndex
      .foldRight(lit(6): Column) { case ((cut, k), rest) =>
        when(col("__u") < cut, lit(k)).otherwise(rest)
      }
    // spread (guide §2.5): the B× explode and the per-replicate md5
    // draws are the map side of the replicate aggregate — on a
    // single-row-group scan that is B·n md5 evaluations on ONE task
    // (no-op when the scan is already parallel)
    val means = graft.Par.spread(
      df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
        .select(col(idCol).as("__id"), col(valueCol).cast("double").as("__v")),
      col("__id"))
      .select(col("__id"), col("__v"),
        explode(expr(s"sequence(1, $b)")).as("__b"))
      .withColumn("__h", md5(concat_ws(":",
        col("__id").cast("string"), col("__b").cast("string"), lit(seed))
        .cast("binary")))
      .withColumn("__u",
        (expr(vTerms.mkString(" + ")).cast("double") + lit(0.5)) / lit(4294967296.0))
      .withColumn("__w", weight)
      .groupBy("__b")
      .agg(sum((col("__w") * col("__v")).cast("decimal(30,10)")).as("__s"),
        sum(col("__w").cast("long")).as("__n"))
      .filter(col("__n") > 0)
      .select((col("__s").cast("double") / col("__n")).as("__m"))
    means.agg(count(lit(1)).as("b"),
        expr("percentile(__m, array(0.025, 0.5, 0.975))").as("__p"))
      .select(col("b"),
        (floor(col("__p").getItem(0) * 10000) / 10000).as("ci_lo"),
        (floor(col("__p").getItem(1) * 10000) / 10000).as("ci_mid"),
        (floor(col("__p").getItem(2) * 10000) / 10000).as("ci_hi"))
  }

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

  /** Wilson-lower-bound rate ranking: per key, trials/successes counted
    * in one aggregate, then the 95%-style Wilson score interval's lower
    * bound — the "rank by rate without being fooled by tiny
    * denominators" estimator (a 1/1 item must NOT outrank a 95/100
    * item; the Wilson LB prices the sample size in). Returns the top
    * `topK` keys by lower bound. Successes clamp to ≤ trials so p̂ stays
    * a probability even when the two event streams are independent
    * counters (as in a raw event log).
    *
    * Exactness: (n, s) are exact longs from one map-side-combining
    * aggregate; the bound is a single fixed IEEE expression both
    * engines replay, floor-4dp BEFORE the ordering so the rank ties are
    * decided on the agreed quantized value with a key tiebreak.
    *
    * Scale: one hash aggregate (key-cardinality frame) + one TakeOrdered
    * top-k — no window, no broadcast, no join. */
  def wilsonRank(df: DataFrame, keyCol: String, trialExpr: Column,
      successExpr: Column, z: Double = 1.96, topK: Int = 100): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    require(topK >= 1, s"topK must be ≥1, got $topK")
    val agg = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(sum(trialExpr.cast("long")).as("n"),
        sum(successExpr.cast("long")).as("s_raw"))
      .filter(col("n") > 0)
      .withColumn("s", least(col("s_raw"), col("n")))
    val nD = col("n").cast("double")
    val p = col("s").cast("double") / nD
    val zz = lit(z) * lit(z)
    val lb = (p + zz / (lit(2.0) * nD) -
      lit(z) * sqrt((p * (lit(1.0) - p) + zz / (lit(4.0) * nD)) / nD)) /
      (lit(1.0) + zz / nD)
    agg.select(col("key"), col("n"), col("s"),
        (floor(lb * 10000) / 10000).as("wilson_lb"))
      .orderBy(desc("wilson_lb"), asc("key"))
      .limit(topK)
  }
}
