package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The arrivals-to-analytics composition: the reference's file-watch
  * identity (`arrivals` DSv2 source) feeding the engine's stateful
  * streaming surface end-to-end — which top sources are producing the
  * most files per event-time window, with bounded state.
  *
  * The reference stops at delivery (CephFsSource.java hands each file
  * to a Flume channel and renames it); any analytics happen in some
  * downstream system. Here the SAME stream that commits files by
  * rename is also the analytics input: one query, exactly-once, no
  * intermediate hop. Because the arrivals source renames on commit,
  * a watched directory supports exactly ONE consuming query — this
  * composition IS that consumer (fan out AFTER it, not beside it).
  */
object ArrivalsAnalytics {

  /** Tumbling-window top-k file producers over an arrivals stream.
    *
    * `term` is the file-name prefix before the first `_` / `.` / digit
    * — the writer id in the `<source>_<seq>` naming convention the
    * reference's deployments use (CephFSEventReader.java:139-140 sorts
    * on exactly these names). Event time is the file mtime
    * (`last_modified`), the same column the source's consumeOrder
    * sorts by, watermarked with `delay`; windows close (and emit ONCE,
    * append-clean) when the watermark passes their end, late files
    * beyond `delay` are counted by the source but NOT by the closed
    * window — identical semantics to [[StatefulOps.streamingHeavyHitters]],
    * which this merely feeds. State per open window is CAPPED at
    * `capacity` counters regardless of how many distinct producers
    * appear — the bounded-memory property that makes this safe on a
    * directory fed by an unbounded writer fleet.
    */
  def fileHeavyHitters(arrivals: DataFrame, windowMs: Long, delay: String,
      k: Int = 10, capacity: Int = 64): Dataset[StatefulOps.HeavyHitter] = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    implicit val enc = org.apache.spark.sql.Encoders.product[StatefulOps.TermRow]
    val rows = arrivals
      .withWatermark("last_modified", delay)
      .withColumn("tsMs", unix_millis(col("last_modified")))
      .withColumn("term", regexp_extract(col("file_name"), "^([A-Za-z]+)", 1))
      .withColumn("windowStartMs", col("tsMs") - pmod(col("tsMs"), lit(windowMs)))
      .as[StatefulOps.TermRow]
    StatefulOps.streamingHeavyHitters(rows, windowMs, k, capacity)
  }
}
