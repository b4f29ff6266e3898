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
}
