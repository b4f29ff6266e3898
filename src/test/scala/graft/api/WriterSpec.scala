package graft.api

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Output-side operators: compaction sizing/round-trip and clustered
  * layout (file-level min/max disjointness — the property parquet
  * skipping prunes on). */
class WriterSpec extends SparkTestBase {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"writer-$name-")
    d.toFile.deleteOnExit()
    d.resolve("out").toString
  }

  test("compact: many small files → ceil(bytes/target) files, content round-trips exactly") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
    val frag = tmp("frag")
    // simulate a high-parallelism append: 64 tiny files
    docs.repartition(64).write.parquet(frag)
    assert(spark.read.parquet(frag).inputFiles.length == 64)
    val bytes = Writer.dirBytes(spark, frag)
    assert(bytes > 0)
    val target = bytes / 4 // → exactly 4-5 files depending on ceil
    val out = tmp("compacted")
    val (before, after) = Writer.compact(spark, frag, out, target)
    assert(before == 64)
    val expected = math.ceil(bytes.toDouble / target).toInt
    assert(after == expected, s"got $after files, expected $expected")
    // content identical as a multiset
    val a = docs.collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(out).select("doc_id", "text", "source")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b, "compaction changed the data")
  }

  test("compact: target larger than the table collapses to one file") {
    val frag = tmp("frag1")
    Tables.documents(spark, sfDir).select("doc_id").repartition(16).write.parquet(frag)
    val out = tmp("one")
    val (_, after) = Writer.compact(spark, frag, out, targetBytes = 10L << 30)
    assert(after == 1)
  }

  test("writeClustered: per-file key ranges are disjoint (the skipping precondition), round-trip exact") {
    val ev = Tables.events(spark, sfDir).select("event_id", "ts_ms", "user_id")
    val out = tmp("clustered")
    Writer.writeClustered(ev, out, Seq("ts_ms"), nFiles = 8)
    val files = spark.read.parquet(out).inputFiles
    assert(files.length >= 2 && files.length <= 8, files.length.toString)
    // each file covers its own slice: (min, max) intervals must not
    // overlap across files — exactly what range partitioning promises
    // and what parquet min/max stats prune on
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("ts_ms"), max("ts_ms")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file ranges: $aMax > $bMin")
      case _ =>
    }
    // and the rewrite loses nothing
    assert(spark.read.parquet(out).count() == ev.count())
    // the pruning payoff is visible in the plan: a ts_ms range filter
    // reaches the scan as a pushed filter over the clustered layout
    val pruned = spark.read.parquet(out)
      .filter(col("ts_ms") >= 1704067200000L && col("ts_ms") < 1704153600000L)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(ts_ms), GreaterThanOrEqual(ts_ms"), scan)
  }

  test("writeZOrdered: every z column gets narrow per-file spans; single-column clustering doesn't") {
    val ev = Tables.events(spark, sfDir).select("event_id", "ts_ms", "user_id")
    def meanSpan(dir: String, c: String): Double = {
      val g = spark.read.parquet(dir).agg(min(c), max(c)).head()
      val span = (g.getLong(1) - g.getLong(0)).max(1L).toDouble
      val fs = spark.read.parquet(dir).inputFiles.map { f =>
        val r = spark.read.parquet(f).agg(min(c), max(c)).head()
        (r.getLong(1) - r.getLong(0)).toDouble / span
      }
      fs.sum / fs.length
    }
    val zout = tmp("zorder")
    Writer.writeZOrdered(ev, zout, Seq("user_id", "ts_ms"), nFiles = 16, bitsPerCol = 4)
    assert(spark.read.parquet(zout).count() == ev.count())
    val uSpanZ = meanSpan(zout, "user_id")
    val tSpanZ = meanSpan(zout, "ts_ms")
    // the hypercube property: BOTH dimensions narrow per file — this is
    // exactly what parquet min/max skipping prunes on, whichever column
    // the query filters
    assert(uSpanZ < 0.6, s"z-order user_id mean span $uSpanZ")
    assert(tSpanZ < 0.6, s"z-order ts_ms mean span $tSpanZ")
    // contrast: single-column range clustering leaves the OTHER column
    // full-range in every file
    val cout = tmp("zorder_vs_clustered")
    Writer.writeClustered(ev, cout, Seq("ts_ms"), nFiles = 16)
    val uSpanC = meanSpan(cout, "user_id")
    assert(uSpanC > 0.7, s"clustered-by-ts user_id mean span $uSpanC")
    // and both filter columns reach the scan as pushed filters
    val plan = spark.read.parquet(zout)
      .filter(col("user_id") <= 10L && col("ts_ms") <= 1704067200000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(user_id") &&
      plan.contains("LessThanOrEqual(ts_ms"), plan)
  }

  test("writeZOrdered: 4 cols x 8 bits (z bits 0..31) still clusters — the long-key regime") {
    // bit positions reach j*k+i = 7*4+3 = 31: with a 32-bit morton
    // accumulator this exact configuration wrapped into the sign bit
    // and collided distinct hypercubes; the BIGINT key must keep every
    // dimension's per-file span narrow
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts_ms"), col("user_id"),
        (col("event_id") * 37 % 1000).as("salt"))
    val zout = tmp("zorder32")
    Writer.writeZOrdered(ev, zout, Seq("user_id", "ts_ms", "event_id", "salt"),
      nFiles = 16, bitsPerCol = 8)
    assert(spark.read.parquet(zout).count() == ev.count())
    def meanSpan(c: String): Double = {
      val g = spark.read.parquet(zout).agg(min(c), max(c)).head()
      val span = (g.getLong(1) - g.getLong(0)).max(1L).toDouble
      val fs = spark.read.parquet(zout).inputFiles.map { f =>
        val r = spark.read.parquet(f).agg(min(c), max(c)).head()
        (r.getLong(1) - r.getLong(0)).toDouble / span
      }
      fs.sum / fs.length
    }
    // 16 files over 4 interleaved dims = 1 split/dim: each file should
    // cover ~half of every dimension, strictly better than full-range
    Seq("user_id", "ts_ms", "event_id", "salt").foreach { c =>
      val s = meanSpan(c)
      assert(s < 0.85, s"z-order(4x8) $c mean span $s — key corrupted?")
    }
  }

  test("writeZOrdered: configurations past 63 key bits are rejected, not silently wrapped") {
    val ev = Tables.events(spark, sfDir).select("event_id", "ts_ms", "user_id")
    intercept[IllegalArgumentException] {
      Writer.writeZOrdered(ev, tmp("zoverflow"),
        Seq("event_id", "ts_ms", "user_id", "event_id", "ts_ms"),
        nFiles = 4, bitsPerCol = 13) // 5 x 13 = 65 bits
    }
  }

  test("writeBucketed: same-bucket join plans ZERO shuffle Exchange; round-trip exact") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "n_chars")
    val stats = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    Writer.writeBucketed(docs, tmp("bkA"), "bk_docs", Seq("doc_id"), 4, Seq("doc_id"))
    Writer.writeBucketed(stats, tmp("bkB"), "bk_stats", Seq("doc_id"), 4, Seq("doc_id"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force the co-located SMJ path
    try {
      val joined = spark.table("bk_docs")
        .join(spark.table("bk_stats"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      // the whole point of the layout: the join consumes bucket
      // partitioning directly — no shuffle on either side
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
      // and nothing was lost on the way through the bucketed write
      assert(joined.count() == docs.count())
      // bucket pruning on an equality predicate rides the same metadata
      // (a join-free scan gets its bucketed read auto-disabled as
      // "unnecessary" — turn the auto rule off to observe the pruning)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", false)
      val oneKey = spark.table("bk_docs").filter(col("doc_id") === 42L)
      val prunedPlan = oneKey.queryExecution.executedPlan.toString
      assert(prunedPlan.contains("SelectedBucketsCount: 1 out of 4"), prunedPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS bk_docs")
      spark.sql("DROP TABLE IF EXISTS bk_stats")
    }
  }

  test("writePartitioned: directory layout, one file per partition value, planning-time pruning") {
    val out = Files.createTempDirectory("graft-part-").toString + "/events_by_type"
    val ev = Tables.events(spark, sfDir).select("event_id", "event_type", "value")
    Writer.writePartitioned(ev, out, Seq("event_type"))
    // one data file per partition directory (the repartition co-location
    // contract — naive partitionBy would write one file per task per value)
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    assert(dirs.length == ev.select("event_type").distinct().count(),
      dirs.map(_.getName).mkString(","))
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
    // a filtered read prunes at PLANNING time: the scan carries the
    // predicate as a PartitionFilter and reads only the matching dir
    val rd = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val plan = rd.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("purchase"), plan)
    // materialize THIS physical plan (count() would plan its own) so its
    // scan metrics reflect what actually got read
    val qe = rd.queryExecution
    val nRows = qe.executedPlan.execute().count()
    assert(nRows == ev.filter(col("event_type") === "purchase").count())
    // the executed scan touched exactly ONE file: the matching
    // partition's (inputFiles would lie here — it lists the UNPRUNED
    // relation; the scan metric is what actually got read)
    val scan = qe.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value == 1L,
      s"pruned scan read ${scan.metrics("numFiles").value} files")
  }
}
