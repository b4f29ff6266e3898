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

  test("bounded-state CDC: state trim + snapshot merge + snapshot-only restart keep batch-election parity") {
    import org.apache.spark.sql.Dataset
    val snapDir = java.nio.file.Files.createTempDirectory("cdc-snap-").toString
    implicit val sqlCtx = spark.sqlContext
    // capture every emission so a stale re-entry is OBSERVABLE (a key
    // whose state was trimmed/lost re-enters empty and emits the loser)
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, SnapRow)]()
    def start(mem: MemoryStream[Change]) =
      applyChangesStreamBounded(mem.toDS(), stateTtlMs = 50L)
        .writeStream.outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("cdc-ckpt-").toString)
        .foreachBatch { (df: Dataset[SnapRow], id: Long) =>
          val rows = df.collect()
          emitted.synchronized { emitted ++= rows.map(r => (id, r)) }
          mergeSnapshot(spark, rows.toSeq.toDF(), snapDir)
          ()
        }
        .start()

    val phase1 = Seq(
      Change(1L, 100L, 1L, "update", 10.0),
      Change(2L, 100L, 1L, "update", 20.0),
      Change(3L, 100L, 1L, "error", 0.0)) // tombstone winner for key 3
    val mem1 = MemoryStream[Change]
    val q1 = start(mem1)
    try { mem1.addData(phase1); q1.processAllAvailable() } finally q1.stop()
    // snapshot committed by phase 1; the raw view keeps the tombstone
    assert(readSnapshotRaw(spark, snapDir).count() == 3)

    // SNAPSHOT-ONLY RESTART: fresh source, fresh checkpoint, EMPTY state
    // (≡ an all-keys trim) — the disaster-recovery mode the snapshot
    // design exists for. MemoryStream cannot recover a checkpoint, so
    // this is also the only restart MemoryStream can drive.
    val mem2 = MemoryStream[Change]
    val q2 = start(mem2)
    try {
      // FIRST batch after the restart: the watermark is still 0, so an
      // OLD change for snapshot-held key 1 (seq 50 < the persisted
      // winner's 100) passes the late filter and meets EMPTY state —
      // the stale-loser window the snapshot merge exists to veto.
      // (Once the watermark advances past a trimmed winner's seq, the
      // late filter itself vetoes sub-watermark arrivals — trim + ttl
      // + watermark conspire so a RUNNING query only leaks stale
      // losers when watermarkDelay exceeds stateTtlMs.)
      mem2.addData(Seq(
        Change(1L, 50L, 1L, "update", 5.0),
        Change(9L, 100L, 1L, "update", 90.0)))
      q2.processAllAvailable() // watermark after this batch: 100
      // seq 200 → watermark 200: the follow-up timeout batch trims
      // key 1 (clamped deadline ∈ [100, 150]) and key 9 (deadline 150)
      mem2.addData(Seq(Change(2L, 200L, 1L, "update", 25.0)))
      q2.processAllAvailable()
      // watermark 300 then trims key 2 (deadline 250); key 10 survives
      mem2.addData(Seq(Change(10L, 300L, 1L, "update", 1.0)))
      q2.processAllAvailable()
      val p = q2.lastProgress
      assert(p.stateOperators(0).numRowsTotal == 1,
        s"expected keys 1, 9, 2 trimmed and key 10 resident, got ${p.stateOperators(0).numRowsTotal}")
    } finally q2.stop()

    // the stale re-entry happened: key 1's LAST emission (buffer order —
    // q2 appends after q1) is the LOSER, which only the merge can veto
    val late = emitted.synchronized {
      emitted.toSeq.filter { case (_, r) => r.key == 1L }.last._2
    }
    assert(late == SnapRow(1L, 50L, 1L, "update", 5.0),
      s"expected the state-less key to re-emit the stale loser, got $late")

    // the SNAPSHOT still equals the batch election over every change
    val all = phase1 ++ Seq(Change(9L, 100L, 1L, "update", 90.0),
      Change(1L, 50L, 1L, "update", 5.0), Change(2L, 200L, 1L, "update", 25.0),
      Change(10L, 300L, 1L, "update", 1.0))
    val expected = batchElection(all)
    val snap = readSnapshotRaw(spark, snapDir)
      .select(col("key"), col("value"), col("op")).as[(Long, Double, String)]
      .collect()
      .map { case (k, v, op) =>
        k -> Upsert(k, v, if (op == "error") "delete" else "upsert")
      }.toMap
    assert(snap == expected)
    // the production view filters the tombstone
    val live = readSnapshot(spark, snapDir, deleteOp = "error")
      .as[(Long, Double)].collect().toMap
    assert(live == Map(1L -> 10.0, 2L -> 25.0, 9L -> 90.0, 10L -> 1.0))
    // and the version GC left at most the previous + current versions
    val versions = new java.io.File(snapDir).listFiles()
      .map(_.getName).filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
    assert(versions.length <= 2, s"stale snapshot versions not pruned: ${versions.toSeq}")
  }
}
