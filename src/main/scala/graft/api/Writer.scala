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

  /** Z-ORDER (Morton-curve) MULTI-column clustering — the layout that
    * makes file/row-group skipping work on SEVERAL filter columns at
    * once. [[writeClustered]]'s range layout gives its first column
    * disjoint per-file spans but leaves every OTHER column's span
    * full-range per file; interleaving the bits of per-column quantile
    * ranks (bucket via `bitsPerCol`-bit approx-quantile cuts, then the
    * Morton shuffle bit j of column i → position j·k+i) produces a key
    * whose ranges are small HYPERCUBES: each file covers a narrow slice
    * of EVERY z column, so parquet min/max stats prune on whichever
    * column the query filters (the Delta/Iceberg OPTIMIZE ZORDER
    * semantics, expressed as plain Columns).
    *
    * Rank-bucketing (not raw bit-twiddling of values) makes the curve
    * distribution-proof: skewed or arbitrary-magnitude doubles cost one
    * approx-quantile pass (cuts are a 1-row broadcast, the scalar-join
    * pattern) and every bucket carries ≈1/2^bitsPerCol of the rows.
    * Nulls bucket to 0. The z key is synthetic and dropped before
    * write; the write itself is the same repartitionByRange +
    * sortWithinPartitions as writeClustered — fully distributed. */
  def writeZOrdered(df: DataFrame, outPath: String, zCols: Seq[String],
      nFiles: Int, bitsPerCol: Int = 8): Unit = {
    require(zCols.size >= 2,
      "z-ordering needs >=2 columns (use writeClustered for one)")
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    require(bitsPerCol >= 1 && bitsPerCol <= 15,
      s"bitsPerCol must be in [1, 15], got $bitsPerCol")
    val k = zCols.size
    // the z key lives in one signed long: bit j of column i lands at
    // position j*k+i, so the highest used position must stay below 63
    // (past it, shiftleft on BIGINT silently wraps mod 64 and distinct
    // hypercubes collide onto one key — clustering corrupted, no error)
    require(k * bitsPerCol <= 63,
      s"z key overflows a long: $k columns x $bitsPerCol bits/col > 63 bits")
    val nb = 1 << bitsPerCol
    val fracs = (1 until nb).map(i => i.toDouble / nb)
    val cuts = df.agg(
      expr(s"approx_percentile(CAST(`${zCols.head}` AS DOUBLE), " +
        s"array(${fracs.mkString(", ")}), 10000)").as("__cuts0"),
      zCols.tail.zipWithIndex.map { case (c, i) =>
        expr(s"approx_percentile(CAST(`$c` AS DOUBLE), " +
          s"array(${fracs.mkString(", ")}), 10000)").as(s"__cuts${i + 1}")
      }: _*)
    // Each column's quantile rank is one linear scan of its cuts array
    // (an interpreted HOF, 2^bitsPerCol element steps) — accumulated in
    // BIGINT so the later shifts operate on a long, and aliased to a
    // NAMED column so the morton interleave references an attribute,
    // never re-embedding the scan per extracted bit (bitsPerCol
    // embeddings = bitsPerCol re-evaluations per row).
    val bucketed = df.crossJoin(broadcast(cuts)).select(
      col("*") +: zCols.zipWithIndex.map { case (c, i) =>
        coalesce(
          expr(s"""aggregate(__cuts$i, CAST(0 AS BIGINT),
                   (a, x) -> a + CASE WHEN CAST(`$c` AS DOUBLE) > x
                                 THEN CAST(1 AS BIGINT)
                                 ELSE CAST(0 AS BIGINT) END)"""),
          lit(0L)).as(s"__b$i")
      }: _*)
    // bit-interleave: each column's bits spread in ONE pass over the
    // (constant-folded) bit positions, referencing __b$i exactly once
    val morton = zCols.indices.map { i =>
      expr(s"""aggregate(sequence(0, ${bitsPerCol - 1}), CAST(0 AS BIGINT),
               (a, j) -> a + shiftleft(shiftright(__b$i, j) & CAST(1 AS BIGINT),
                                       j * $k + $i))""")
    }.reduce(_ + _)
    bucketed
      .withColumn("__z", morton)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z" +: (zCols.indices.map(i => s"__cuts$i") ++
        zCols.indices.map(i => s"__b$i")): _*)
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
