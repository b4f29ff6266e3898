package graft.streaming

import graft.{SparkTestBase, Tables}
import graft.api.Cdc
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch parity for [[CdcStream.applyChangesStream]]: the streaming
  * changelog materialization must converge — under ANY batch split and
  * arrival order — to the same per-key election as the batch
  * [[Cdc.applyChanges]] over the full feed.
  */
class CdcStreamSpec extends SparkTestBase {
  import spark.implicits._
  import CdcStream._

  private def changeRows(): Seq[Change] =
    Tables.events(spark, sfDir)
      .select((col("user_id") + 1450L).as("key"), col("ts_ms").as("seq"),
        col("event_id").as("seq2"), col("event_type").as("op"), col("value"))
      .as[Change].collect().toSeq

  /** Run the stream over the given chunks; return the LAST emission per
    * key (exactly one emission per touched key per batch, so max
    * batch-id picks it). */
  private def run(chunks: Seq[Seq[Change]]): Map[Long, Upsert] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Change]
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Upsert)]()
    val q = applyChangesStream(mem.toDS(), deleteOp = "error")
      .writeStream.outputMode("append")
      .foreachBatch { (df: Dataset[Upsert], id: Long) =>
        val rows = df.collect()
        buf.synchronized { buf ++= rows.map(u => (id, u)) }
        ()
      }
      .start()
    try chunks.filter(_.nonEmpty).foreach { c => mem.addData(c); q.processAllAvailable() }
    finally q.stop()
    buf.synchronized {
      buf.toSeq.groupBy(_._2.key).map { case (k, rows) => k -> rows.maxBy(_._1)._2 }
    }
  }

  /** The batch election over the same changes (empty base, deletes kept
    * so tombstones are comparable). */
  private def batchElection(rows: Seq[Change]): Map[Long, Upsert] =
    Cdc.applyChanges(Seq.empty[(Long, Double)].toDF("key", "value"),
        rows.toDF(), "key", Seq("seq", "seq2"),
        opCol = "op", deleteOp = "error", payloadCols = Seq("value"),
        keepDeletes = true)
      .select(col("key").cast("long"), col("value"), col("cdc_action"))
      .as[(Long, Double, String)].collect()
      .map { case (k, v, a) =>
        k -> Upsert(k, v, if (a == "deleted") "delete" else "upsert")
      }.toMap

  test("streaming CDC: any batch split / arrival order converges to the batch election") {
    val rows = changeRows()
    val expected = batchElection(rows)
    assert(expected.nonEmpty)
    assert(expected.values.exists(_.cdc_action == "delete"),
      "fixture must exercise the tombstone path")
    val streamed = run(rows.grouped(4000).toSeq)
    assert(streamed == expected)
    val reversed = run(rows.reverse.grouped(700).toSeq)
    assert(reversed == expected)
  }

  test("streaming CDC: exact (seq,seq2) ties fall through to op/payload like the batch struct max") {
    val ties = Seq(
      Change(1L, 10L, 5L, "a_update", 1.0), Change(1L, 10L, 5L, "z_update", 2.0),
      Change(2L, 7L, 7L, "error", 0.0), Change(2L, 7L, 7L, "b_update", 9.0))
    val expected = batchElection(ties)
    // split so each tie pair arrives across DIFFERENT micro-batches
    val streamed = run(Seq(Seq(ties(0), ties(3)), Seq(ties(2), ties(1))))
    assert(streamed == expected)
    // 'z_update' beats 'a_update'; 'error' beats 'b_update' → tombstone
    assert(streamed(1L) == Upsert(1L, 2.0, "upsert"))
    assert(streamed(2L) == Upsert(2L, 0.0, "delete"))
  }
}
