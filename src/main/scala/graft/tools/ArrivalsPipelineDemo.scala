package graft.tools

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end arrivals-at-scale demo — the FULL reference dataflow
  * (directory scan → candidate filter → pick order → project → commit
  * by rename; CephFsSource.java:128-174) fused with the LLM-pipeline
  * ingest operator it was rebuilt to feed: the `arrivals` DSv2 source
  * drives a large file directory straight into
  * [[graft.streaming.StatefulOps.streamingDedup]] (exact content dedup
  * at ingest), with `ReportsSourceMetrics` counters asserted per
  * progress event and the dedup verdicts asserted against the batch
  * keep-min election.
  *
  *   SPARK_GRAFT_CPUS=8 sbt 'runMain graft.tools.ArrivalsPipelineDemo 100000'
  *
  * Layout: `nFiles` small text files named `w_<zero-padded seq>.txt`;
  * every 10th file (seq % 10 == 9) duplicates the previous file's
  * content, so the expected election is PURE: seq%10==9 rows are dups
  * with canonical seq−1, everything else is its own canonical. The
  * zero-padded uniform-prefix names make consumeOrder=OLDEST admission
  * id-ordered (equal-mtime ties break lexicographically —
  * CephFSEventReader.java:139-140), so the smaller id of every dup
  * pair is never admitted after its mate.
  *
  * Asserted invariants (each `require`d, so a regression fails loudly):
  *  - every micro-batch's source progress carries the full metrics map
  *    (pendingFiles / filesOffered / filesRenamed / renameFailures /
  *    listingCalls), and rows flow through more than one trigger
  *    (maxFilesPerTrigger admission + cursored listing exercised);
  *  - Σ numInputRows across progress events == nFiles (exactly-once
  *    offer accounting);
  *  - final counters: filesRenamed == nFiles, renameFailures == 0,
  *    pendingFiles == 0; on disk, exactly nFiles `.COMPLETED` files
  *    remain (commit-by-rename completed for every admitted file);
  *  - the streaming dedup verdicts equal the batch keep-min election
  *    row for row (canonical ids + per-fingerprint totals).
  */
object ArrivalsPipelineDemo {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(100000)
    val dupEvery = 10
    val dir = args.drop(1).headOption.map(new File(_)).getOrElse(
      Files.createTempDirectory("arrivals-e2e-").toFile)
    dir.mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")

    // deterministic corpus: seq%10==9 duplicates seq-1's content
    def content(i: Int): String = {
      val base = if (i % dupEvery == dupEvery - 1) i - 1 else i
      s"doc $base alpha beta gamma ${base * 7 % 997} delta"
    }
    val t0 = System.nanoTime()
    var i = 0
    while (i < nFiles) {
      Files.write(Paths.get(dir.getPath, f"w_$i%08d.txt"),
        content(i).getBytes(StandardCharsets.UTF_8))
      i += 1
    }
    val writeSec = (System.nanoTime() - t0) / 1e9

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t1 = System.nanoTime()
    val rows = spark.readStream.format("arrivals")
      .option("path", dir.getPath)
      .option("maxFilesPerTrigger", "20000") // > 1 trigger at any demo size
      .option("executorRenameThreshold", "5000") // commits fan out to executors
      .load()
      .select(
        md5(col("body")).as("fp"),
        regexp_extract(col("file_name"), "(\\d+)", 1).cast("long").as("id"),
        unix_millis(col("last_modified")).as("tsMs"))
      .as[graft.streaming.StatefulOps.FpDoc]
    val q = graft.streaming.StatefulOps.streamingDedup(rows)
      .writeStream.format("memory").queryName("arrivals_dedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamSec = (System.nanoTime() - t1) / 1e9

    // --- source metrics, per progress event and cumulative ---
    val progresses = q.recentProgress.toSeq.filter(_.sources.nonEmpty)
    val withRows = progresses.filter(_.sources.head.numInputRows > 0)
    require(withRows.size > 1,
      s"expected >1 data trigger at maxFilesPerTrigger=20000, got ${withRows.size}")
    val metricKeys = Seq("pendingFiles", "filesOffered", "filesRenamed",
      "renameFailures", "listingCalls")
    withRows.foreach { p =>
      val m = p.sources.head.metrics
      metricKeys.foreach(k => require(m.containsKey(k),
        s"source progress missing metric '$k': $m"))
    }
    val offered = withRows.map(_.sources.head.numInputRows).sum
    require(offered == nFiles, s"numInputRows sum $offered != $nFiles")
    val lastM = withRows.last.sources.head.metrics
    require(lastM.get("renameFailures").toLong == 0, s"rename failures: $lastM")
    require(lastM.get("filesRenamed").toLong == nFiles,
      s"filesRenamed ${lastM.get("filesRenamed")} != $nFiles")
    require(lastM.get("pendingFiles").toLong == 0, s"backlog not drained: $lastM")
    val completed = dir.listFiles().count(_.getName.endsWith(".COMPLETED"))
    require(completed == nFiles, s"on-disk .COMPLETED $completed != $nFiles")

    // --- dedup verdicts ≡ the batch keep-min election ---
    // fold the per-batch FpUpdate rows to final (canonical, total) per fp
    val got = spark.table("arrivals_dedup")
      .groupBy("fp")
      .agg(min("canonical_id").as("canonical"), sum("batch_docs").as("total"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("canonical"), r.getAs[Long]("total")))).toMap
    val expected = (0 until nFiles)
      .groupBy(content)
      .map { case (c, ids) =>
        val fp = java.security.MessageDigest.getInstance("MD5")
          .digest(c.getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        fp -> ((ids.min.toLong, ids.size.toLong))
      }
    require(got == expected,
      s"stream-batch dedup mismatch: got ${got.size} fps, expected ${expected.size}; " +
        s"sample diff=${expected.filterNot { case (k, v) => got.get(k).contains(v) }.take(3)}")
    val nDup = nFiles / dupEvery
    println(s"""{"demo":"arrivals_e2e","n_files":$nFiles,"triggers":${withRows.size},""" +
      s""""files_offered":$offered,"files_renamed":${lastM.get("filesRenamed")},""" +
      s""""rename_failures":0,"listing_calls":${lastM.get("listingCalls")},""" +
      s""""distinct_docs":${got.size},"dup_docs":$nDup,""" +
      s""""write_sec":${math.round(writeSec * 10) / 10.0},""" +
      s""""stream_sec":${math.round(streamSec * 10) / 10.0},"parity":"exact"}""")
    spark.stop()
    // best-effort cleanup of the demo directory
    dir.listFiles().foreach(_.delete()); dir.delete()
  }
}
