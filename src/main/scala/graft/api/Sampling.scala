package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducible alternative to
  * `df.sample()` for corpus construction. `rand()`-based sampling gives a
  * different corpus every run (and per retry of a failed task!); hashing
  * the CONTENT pins each row's fate: the same document always lands in
  * the same bucket across runs, clusters, and engines, so train/eval
  * splits are stable and any engine that can md5 can reproduce the
  * split (the DuckDB oracle runs the identical formula).
  *
  * The bucket is the first 8 hex chars of md5 (32 bits, uniform) mod
  * 100 — pure map-side, codegen'd, no shuffle.
  */
object Sampling {

  /** Stable bucket in [0, 100) from a column's content. */
  def hashBucket(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long") % 100

  /** Keep rows whose content-hash bucket < pct (≈ pct% deterministic
    * sample). */
  def sample(df: DataFrame, onCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(onCol)) < pct)

  /** Deterministic train/val/test assignment by content-hash bucket —
    * the split every training pipeline needs, with the properties rate
    * sampling by `rand()` cannot give: replayable (same content → same
    * split on any run, any engine), leakage-proof across reshuffles
    * (a duplicated document lands in ONE split), and map-side (no
    * shuffle — the split is a projection). `train` takes buckets
    * [0, trainPct), `val` the next valPct, `test` the rest. */
  def splitByHash(df: DataFrame, onCol: String, trainPct: Int,
      valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 < valPct, trainPct + valPct < 100; " +
        s"got $trainPct/$valPct")
    val b = hashBucket(col(onCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Per-stratum rates (stratum value → pct), `defaultPct` for strata
    * not in the map — e.g. downsample dominant languages, keep all of
    * rare ones. */
  def stratifiedSample(df: DataFrame, onCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame =
    df.filter(hashBucket(col(onCol)) <
      coalesce(element_at(typedLit(rates), col(strataCol)), lit(defaultPct)))

  /** Per-stratum TOKEN-BUDGET mixture: keep, within each stratum, the
    * documents that fill the first `budget` tokens in deterministic
    * content-hash order — the data-MIXING step that turns per-domain
    * weights ("30 B tokens of web, 5 B of code, …") into an actual
    * corpus. Rate-based sampling can't hit a token target when document
    * lengths vary by stratum; the budget form cuts exactly where the
    * running token count crosses it.
    *
    * Selection order is (md5(content), id) — content-deterministic like
    * [[sample]] (same corpus every run/engine/retry) with the id
    * tiebreak making WHICH duplicate of an identical text wins
    * well-defined. Cost: one hash shuffle by stratum + a window running
    * sum; at 100 TB strata are few and large, so this is the same
    * shape as any per-key window (skewed mega-strata: pre-aggregate
    * per-(stratum, hash-prefix) chunks first, then budget over chunks).
    * Returns the kept rows with `cum_tok` (running token count within
    * the stratum, this row included) attached. */
  def tokenBudgetMix(df: DataFrame, onCol: String, idCol: String,
      strataCol: String, tokCol: Column, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(col(onCol).cast("binary")).asc_nulls_first,
        col(idCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tok", sum(tokCol).over(w))
      .filter(col("cum_tok") <=
        coalesce(element_at(typedLit(budgets), col(strataCol)), lit(defaultBudget)))
  }

  /** WEIGHTED deterministic sampling: keep each row with probability
    * equal to its own `rate` column (in [0, 1]) — quality-proportional
    * downsampling (keep high-quality docs more often) with the same
    * content-hash determinism as [[sample]]: the same document with the
    * same rate gets the same fate on every run/engine/retry. Pure
    * map-side filter, no shuffle. Rows with NULL rate are dropped
    * (NULL comparison is false in both engines). */
  def weightedSample(df: DataFrame, onCol: String, rate: Column): DataFrame =
    df.filter(hashBucket(col(onCol)) < rate * 100)

  /** TEMPERATURE-smoothed source mixing: per-stratum keep-rates
    * proportional to weight(share)/share, scaled so the kept corpus is
    * ≈`targetPct`% of the input — the multilingual/multi-source
    * rebalancing step (upsample the tail, downsample the head; the
    * default √share weight is the classic α = 0.5 smoothing). Rates cap
    * at 100% (deterministic sampling can't replicate rows — duplicate a
    * stratum upstream if true upsampling is needed).
    *
    * The rate table derives from a strata-sized count aggregate plus its
    * 1-row normalizer (the sanctioned corpus-constant broadcast); docs
    * then take a broadcast equi-join on the stratum and the same
    * map-side content-hash filter as [[sample]]. Determinism across
    * engines: the per-stratum weights cast to DECIMAL(30,10) before the
    * normalizer sums them (strata-count-sized, but accumulation order
    * still engine-dependent), and the integer pct floors from one fixed
    * double expression — so any engine replaying the formula reproduces
    * the exact corpus. Adds `pct` (the stratum's rate) to the kept rows.
    *
    * NULL-stratum rows are DROPPED (the stratum equi-join can never
    * match them) and are therefore excluded from the normalizer too —
    * they must not dilute the rates of rows that can actually be kept.
    * A tiny stratum whose rate would floor to 0 keeps pct = 1 instead
    * (≈1% kept) — temperature mixing rebalances strata, it should never
    * silently delete one; the cap and the floor bound every stratum's
    * rate into [1, 100]. */
  def temperatureMix(df: DataFrame, onCol: String, strataCol: String,
      targetPct: Int, weight: Column => Column = sqrt): DataFrame = {
    require(targetPct > 0 && targetPct <= 100, s"targetPct must be in (0,100], got $targetPct")
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).as("__stratum"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", weight(col("__n").cast("double")).cast("decimal(30,10)"))
    val z = counts.agg(sum(col("__w")).as("__z"), sum(col("__n")).as("__total"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col("__stratum"),
        greatest(lit(1L), least(lit(100L), floor(
          lit(targetPct.toDouble) * col("__total").cast("double")
            * col("__w").cast("double")
            / (col("__z").cast("double") * col("__n").cast("double")))
          .cast("long"))).as("pct"))
    df.join(broadcast(rates), col(strataCol) === col("__stratum"))
      .drop("__stratum")
      .filter(hashBucket(col(onCol)) < col("pct"))
  }

  /** Exactly-k-per-stratum deterministic sample: the first `k` documents
    * of each stratum in (md5(content), id) order — how a FIXED-SIZE
    * held-out/eval set per language (or per source) is actually built.
    * Rate sampling can't promise a count; this does, deterministically
    * across runs/engines/retries like every graft sampler. Same window
    * shape as [[tokenBudgetMix]] (one hash shuffle by stratum). */
  def headSample(df: DataFrame, onCol: String, idCol: String,
      strataCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(col(onCol).cast("binary")).asc_nulls_first,
        col(idCol).asc_nulls_first)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
