package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine classifier training — the "fit the quality filter on the
  * corpus you're about to filter" step of a training-data pipeline
  * (fastText-style quality scorers, contamination classifiers, language
  * gates) expressed as plain aggregation plans, so the same engine that
  * runs the corpus queries also fits the model that curates it.
  *
  * Batch gradient descent on logistic loss: per iteration ONE
  * map-side-combined aggregation computes the full-batch gradient
  * (k+1 sums + a count), and the weight vector rides between iterations
  * as a 1-row frame crossed in via the sanctioned corpus-constant
  * broadcast (the `Graph.pageRank` N pattern) — no driver round-trip,
  * no collect, plan-unrolled like the other fixed-iteration operators.
  * Work per iteration ∝ corpus scan; at 100 TB the gradient shuffle
  * carries one (k+2)-value buffer per partition.
  *
  * Cross-engine exactness: per-row gradient terms `xⱼ·(σ(w·x) − y)`
  * quantize to DECIMAL(30,10) before summing (order-proof — the
  * q_resample_agg discipline), so each iteration's weight vector derives
  * from exactly-agreed sums through a fixed sequence of IEEE ops; libm
  * ulp divergence (exp) is absorbed by the 10dp quantization except on
  * measure-zero boundary rows.
  */
object Classifier {

  /** Fit `iterations` full-batch GD steps of logistic regression from
    * zero weights; returns ONE row: `n`, `w0` (bias), `w1..wk` (one per
    * feature), and the final mean log-loss `loss` (computed at the
    * returned weights). `label` must be 0/1; features should be
    * roughly unit-scale for a fixed `lr` to behave. */
  def logisticFit(df: DataFrame, label: Column, features: Seq[Column],
      iterations: Int = 3, lr: Double = 0.1): DataFrame = {
    require(features.nonEmpty, "need at least one feature column")
    require(iterations >= 1, s"iterations must be ≥1, got $iterations")
    require(lr > 0, s"lr must be positive, got $lr")
    val k = features.size
    val base = df.select((label.cast("double").as("y") +:
      features.zipWithIndex.map { case (f, i) => f.cast("double").as(s"x$i") }): _*)
    def sigma: Column = {
      val z = col("w0") + (0 until k).map(i => col(s"w${i + 1}") * col(s"x$i"))
        .reduce(_ + _)
      lit(1.0) / (lit(1.0) + exp(-z))
    }
    val spark = df.sparkSession
    var wf: DataFrame = spark.range(1)
      .select((0 to k).map(j => lit(0.0).as(s"w$j")): _*)
    for (_ <- 1 to iterations) {
      val joined = base.crossJoin(broadcast(wf))
      val aggCols =
        (0 to k).map { j =>
          val xj = if (j == 0) lit(1.0) else col(s"x${j - 1}")
          sum((xj * (sigma - col("y"))).cast("decimal(30,10)")).as(s"g$j")
        } ++ (0 to k).map(j => max(col(s"w$j")).as(s"pw$j"))
      val agg = joined.agg(count(lit(1)).as("n"), aggCols: _*)
      wf = agg.select((0 to k).map(j =>
        (col(s"pw$j") - lit(lr) * (col(s"g$j").cast("double") / col("n")))
          .as(s"w$j")): _*)
    }
    val fin = base.crossJoin(broadcast(wf))
    val perRowLoss = -(col("y") * log(sigma) +
      (lit(1.0) - col("y")) * log(lit(1.0) - sigma))
    fin.agg(
      count(lit(1)).as("n"),
      (Seq(sum(perRowLoss.cast("decimal(30,10)")).as("lsum")) ++
        (0 to k).map(j => max(col(s"w$j")).as(s"fw$j"))): _*)
      .select((col("n") +:
        (0 to k).map(j =>
          (floor(col(s"fw$j") * 10000) / 10000).as(s"w$j")) :+
        (floor(col("lsum").cast("double") / col("n") * 10000) / 10000).as("loss")): _*)
  }
}
