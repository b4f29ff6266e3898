package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Output-side operators: the write patterns that decide whether the
  * NEXT job over this data is fast. At 100 TB the two killers are
  * small files (a 1000-executor job writing 32 partitions/task leaves
  * millions of KB-sized parquet files; every later scan pays a
  * task-per-file schedule + open cost) and unclustered layout (a file
  * whose min/max spans the whole key range defeats parquet
  * row-group/file skipping, so every filter scans everything).
  *
  * Both operators here are metadata-driven — sizing reads FILE STATUSES
  * (driver-side listing, one RPC per file, the same cost any parquet
  * scan's planning pays), never the data — and express the rewrite as a
  * plain repartition the engine executes distributed.
  */
object Writer {

  /** Total bytes of the parquet part-files under `path` (driver-side
    * metadata listing; no data read). */
  def dirBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else
      fs.listStatus(p).iterator
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(_.getLen).sum
  }

  /** Rewrite a parquet directory into ~`targetBytes`-sized files — the
    * compaction pass every long-lived 100 TB table needs after
    * high-parallelism appends. File count = ceil(currentBytes /
    * targetBytes) measured from the input file statuses (compressed
    * bytes in ≈ compressed bytes out for a same-codec rewrite), so no
    * data-dependent sampling pass. The rewrite itself is one
    * round-robin repartition — no shuffle key, every output file the
    * same size by construction. Returns (filesBefore, filesAfter).
    *
    * Writes to `outPath` (rewriting in place would race readers;
    * atomic swap is the caller's move — rename after success, the
    * arrivals-source commit discipline). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val bytes = dirBytes(spark, inPath)
    val df = spark.read.parquet(inPath)
    val before = df.inputFiles.length
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    df.repartition(nFiles).write.mode("overwrite").parquet(outPath)
    (before, spark.read.parquet(outPath).inputFiles.length)
  }

  /** Write `df` as parquet range-CLUSTERED on `clusterCols`: rows are
    * range-partitioned then sorted within each file, so every file (and
    * row group) covers a narrow, mostly-disjoint slice of the key
    * space — parquet min/max statistics then let any later
    * `WHERE key BETWEEN ...` skip whole files instead of scanning them.
    * This is the layout move that turns a full-corpus scan into a
    * pruned one for time-range and id-range access patterns (the
    * events-table access shape).
    *
    * `nFiles` states the output fan-in explicitly (derive it from
    * [[dirBytes]]/targetBytes when rewriting an existing table); the
    * range exchange samples keys to build balanced bounds — one extra
    * pass Spark runs automatically, the documented price of range
    * layout. */
  def writeClustered(df: DataFrame, outPath: String, clusterCols: Seq[String],
      nFiles: Int): Unit = {
    require(clusterCols.nonEmpty, "need at least one cluster column")
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    df.repartitionByRange(nFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Write `df` as a BUCKETED parquet table: rows hash-partitioned into
    * `nBuckets` files by `bucketCols` and sorted by `sortCols` within
    * each, registered as `table` in the session catalog (bucketing
    * lives in table metadata — a bare parquet path can't carry it).
    *
    * This is the co-located-join layout: two tables bucketed the same
    * way joined on the bucket keys plan ZERO Exchange — at 100 TB that
    * deletes the dominant cost of every recurring fact-to-fact join
    * (the daily events⋈events or corpus⋈index job), paying the shuffle
    * ONCE at write time instead of per query. Sorted buckets
    * additionally let the join sort-merge without sorting. The
    * WriterSpec plan test pins the no-Exchange property; bucket-pruning
    * on equality predicates comes free from the same metadata.
    *
    * Like the other writers this targets a NEW location: `path` is the
    * table's external storage; drop/rename choreography stays with the
    * caller. */
  def writeBucketed(df: DataFrame, path: String, table: String,
      bucketCols: Seq[String], nBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val w = df.write.format("parquet").option("path", path)
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Hive-style DIRECTORY-partitioned write — the canonical 100 TB
    * layout for anything time- or category-sliced (date-partitioned
    * event logs, lang-partitioned corpora): each distinct
    * `partitionCols` value becomes a directory, and any reader whose
    * filter touches those columns prunes whole directories at PLANNING
    * time (`PartitionFilters` on the scan — zero I/O for excluded
    * slices, the cheapest scan optimization that exists). The
    * pre-write `repartition` on the partition columns co-locates each
    * partition's rows so a partition value gets ONE file instead of
    * one-per-task (the small-files failure mode of naive partitionBy:
    * 200 tasks × 365 days = 73k files); pair with [[compact]] when a
    * single partition outgrows one healthy file.
    *
    * Choose LOW-cardinality columns: each distinct value is a
    * directory, and 10⁶ tiny directories is the inverse disease of the
    * one this writer cures. Same new-location contract as the other
    * writers. */
  def writePartitioned(df: DataFrame, outPath: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(outPath)
  }
}
