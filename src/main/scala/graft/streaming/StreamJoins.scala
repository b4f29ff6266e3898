package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins — the built-in-state streaming
  * primitive the custom-state operators (StatefulOps) don't cover:
  * correlating two live streams (purchases × recent errors, requests ×
  * responses) with join state bounded by watermarks instead of an
  * explicit TTL.
  */
object StreamJoins {

  /** Stream-stream INTERVAL join: per key, pair each left row with the
    * right rows whose event time falls in [leftTs, leftTs + windowMs) —
    * the streaming form of `TimeSeries.intervalJoinAgg`'s bucketed
    * batch join. Both sides get the same `watermark`; with the
    * time-range condition that lets Spark evict buffered rows once they
    * can no longer match anything (state per side ∝ watermark + window
    * of data, never the stream's history — the property that makes a
    * stream-stream join runnable forever at 100 TB/day).
    *
    * `joinType` "inner" (default) or "leftOuter" (unmatched left rows
    * emit with nulls only after their watermark expires — Spark's
    * outer-join contract; downstream sees them late by construction).
    * The two sides keep their own column names via the `l`/`r` aliases
    * — select with `col("l.x")` / `col("r.y")` on the result. */
  def streamingIntervalJoin(left: DataFrame, leftTsCol: String,
      right: DataFrame, rightTsCol: String, keyCol: String,
      windowMs: Long, watermark: String,
      joinType: String = "inner"): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val l = left.withWatermark(leftTsCol, watermark).alias("l")
    val r = right.withWatermark(rightTsCol, watermark).alias("r")
    val win = make_dt_interval(lit(0), lit(0), lit(0), lit(windowMs / 1000.0))
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTsCol") >= col(s"l.$leftTsCol") &&
        col(s"r.$rightTsCol") < col(s"l.$leftTsCol") + win,
      joinType)
  }

  /** Streaming LEFT-OUTER backward AS-OF join — the streaming form of
    * `TimeSeries.asofJoin`'s tolerance variant: for every left row, the
    * single most RECENT right row of the same key with
    * rightTs ∈ (leftTs − tolMs, leftTs], or nulls when the window holds
    * none (quotes-for-trade, last-config-before-event).
    *
    * Two chained stateful operators, both watermark-bounded: (1) a
    * left-outer stream-stream time-interval join (state ∝ tolerance +
    * watermark of data per side — the same eviction contract as
    * [[streamingIntervalJoin]]); (2) a per-left-row streaming aggregation
    * that collapses the candidate set to its max-timestamp row via ONE
    * `max(struct(ts, value))` (lexicographic struct max ⇒ deterministic
    * even on right-timestamp ties — the higher value wins, a documented
    * tiebreak rather than a race). Grouping keys include the left
    * event-time column, so aggregation state also evicts by watermark
    * and each left row emits exactly once, after the watermark passes its
    * timestamp (Spark's append-mode contract for chained stateful ops —
    * unmatched left rows are ALREADY held back that long by the outer
    * join, so the asof adds no extra latency class).
    *
    * `leftIdCol` must uniquely identify left rows (it is the aggregation
    * key). Output: leftIdCol, keyCol, leftTsCol, `asof_ts` (matched right
    * timestamp or null), rightValCol (matched value or null). */
  def streamingAsofJoin(left: DataFrame, leftTsCol: String,
      right: DataFrame, rightTsCol: String, keyCol: String,
      toleranceMs: Long, watermark: String,
      leftIdCol: String, rightValCol: String): DataFrame = {
    require(toleranceMs > 0, s"toleranceMs must be positive, got $toleranceMs")
    val l = left.withWatermark(leftTsCol, watermark).alias("l")
    val r = right.withWatermark(rightTsCol, watermark).alias("r")
    val tol = make_dt_interval(lit(0), lit(0), lit(0), lit(toleranceMs / 1000.0))
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col(s"r.$rightTsCol") <= col(s"l.$leftTsCol") &&
          col(s"r.$rightTsCol") > col(s"l.$leftTsCol") - tol,
        "leftOuter")
      .groupBy(col(s"l.$leftIdCol").as(leftIdCol),
        col(s"l.$keyCol").as(keyCol), col(s"l.$leftTsCol").as(leftTsCol))
      .agg(max(struct(col(s"r.$rightTsCol").as("asof_ts"),
        col(s"r.$rightValCol").as(rightValCol))).as("__m"))
      .select(col(leftIdCol), col(keyCol), col(leftTsCol),
        col(s"__m.asof_ts"), col(s"__m.$rightValCol"))
  }
}
