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
    // an interval LITERAL, not make_dt_interval: StreamingJoinHelper can
    // only derive the outer-join state bound (when the nullable side's
    // eviction watermark comes from the range condition) through literal
    // interval arithmetic — a make_dt_interval call defeats the
    // extraction and fails leftOuter analysis
    val win = expr(s"INTERVAL $windowMs MILLISECOND")
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
    val tol = expr(s"INTERVAL $toleranceMs MILLISECOND") // literal: see streamingIntervalJoin
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

  /** FORWARD streaming as-of — [[streamingAsofJoin]]'s mirror, the
    * batch `TimeSeries.asofJoinForward` on live streams: for every left
    * row, the single EARLIEST right row of the same key with
    * rightTs ∈ [leftTs, leftTs + tolMs), or nulls when none arrives in
    * time (first-response-after-request, next-error-after-deploy).
    * Same two watermark-bounded stateful operators; the collapse is
    * `min(struct(ts, value))`. The unmatched-left null contract rests on
    * group HOMOGENEITY, not null-skipping: an outer-join null pad yields
    * `struct(null, null)` — a NON-null struct that min does not skip —
    * but a left row's group is either all real matches (the pad never
    * appears) or exactly the single pad row, so min returns the
    * struct(null,null) row directly in the unmatched case and the null
    * contract matches the backward form. A left row's answer
    * is complete once the watermark passes leftTs + tolerance; Spark's
    * chained-append contract already waits for the join's state bound,
    * so emission timing is the same class as the backward join. */
  def streamingAsofJoinForward(left: DataFrame, leftTsCol: String,
      right: DataFrame, rightTsCol: String, keyCol: String,
      toleranceMs: Long, watermark: String,
      leftIdCol: String, rightValCol: String): DataFrame = {
    require(toleranceMs > 0, s"toleranceMs must be positive, got $toleranceMs")
    val l = left.withWatermark(leftTsCol, watermark).alias("l")
    val r = right.withWatermark(rightTsCol, watermark).alias("r")
    val tol = expr(s"INTERVAL $toleranceMs MILLISECOND") // literal: see streamingIntervalJoin
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col(s"r.$rightTsCol") >= col(s"l.$leftTsCol") &&
          col(s"r.$rightTsCol") < col(s"l.$leftTsCol") + tol,
        "leftOuter")
      .groupBy(col(s"l.$leftIdCol").as(leftIdCol),
        col(s"l.$keyCol").as(keyCol), col(s"l.$leftTsCol").as(leftTsCol))
      .agg(min(struct(col(s"r.$rightTsCol").as("asof_ts"),
        col(s"r.$rightValCol").as(rightValCol))).as("__m"))
      .select(col(leftIdCol), col(keyCol), col(leftTsCol),
        col(s"__m.asof_ts"), col(s"__m.$rightValCol"))
  }
}
