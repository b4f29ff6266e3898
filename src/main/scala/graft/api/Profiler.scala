package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the corpus-QA pass a pipeline runs before and
  * after every preparation stage (ingest sanity, post-filter drift,
  * dedup effect measurement). One wide aggregate computes every metric
  * in a single pass over the data (count / null-count are plain
  * map-side-combining aggregates; the exact distinct counts expand to
  * one Expand pass — still one scan), then the wide row is unpivoted
  * driver-free with `stack` into (column, metric, value) long form —
  * the data is never re-read.
  */
object Profiler {

  /** Exact per-column profile: (col_name, n_rows, n_nulls, n_distinct),
    * all BIGINT (engine-portable — no float formatting in the output).
    * `cols` defaults to every column of `df`. Internal aliases are
    * index-based and the emitted name is a quoted literal, so arbitrary
    * column names (spaces, dots, quotes) are safe. */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "profile() needs at least one column")
    // one shared row count + per-column (nulls, distinct); aliases are
    // positional so column names never leak into identifiers
    val aggs = count(lit(1)).as("__rows") +: names.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__nulls_$i"),
        count_distinct(col(c)).as(s"__dist_$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // stack takes a FLAT expression list (n rows × 4 values per row);
    // the name becomes a SQL string literal with quotes doubled
    val stacked = names.zipWithIndex.map { case (c, i) =>
      s"'${c.replace("'", "''")}', __rows, __nulls_$i, __dist_$i"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${names.size}, $stacked) AS (col_name, n_rows, n_nulls, n_distinct)"))
  }

  /** Exact equi-width HISTOGRAM of a numeric column: `nBuckets` buckets
    * over the corpus [min, max], EXPLICIT zero rows for empty buckets
    * (the distribution QA view — length/price/score histograms; a plain
    * groupBy hides gaps exactly like an unsampled resample does).
    * Returns (bucket 1..n, lo, hi, cnt) with 4dp bucket bounds.
    *
    * Plan: the [min, max] range is a 1-row broadcast (the sanctioned
    * corpus-constant pattern, same as resampleGapFill's spine); the data
    * crosses ONE map-side bucket projection + one (bucket) hash
    * aggregate of at most nBuckets rows. Bucketing is the explicit
    * `floor((x − lo) / width) + 1` formula — engine-portable (DuckDB
    * has no width_bucket), top value clamped into bucket n. A
    * degenerate all-equal column (lo = hi) lands everything in bucket
    * 1 rather than dividing by zero. */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val vals = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val range = vals.agg(min("__v").as("__lo"), max("__v").as("__hi"))
    val bucketed = vals.crossJoin(broadcast(range))
      .select(when(col("__hi") === col("__lo"), lit(1L))
        .otherwise(least(
          floor((col("__v") - col("__lo")) /
            ((col("__hi") - col("__lo")) / nBuckets)).cast("long") + 1L,
          lit(nBuckets.toLong))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val spine = range.select(
      explode(expr(s"sequence(1L, ${nBuckets}L)")).as("bucket"),
      col("__lo"), col("__hi"))
    spine.join(bucketed, Seq("bucket"), "left")
      .select(col("bucket"),
        round(col("__lo") + (col("bucket") - 1) * (col("__hi") - col("__lo")) / nBuckets, 4).as("lo"),
        round(col("__lo") + col("bucket") * (col("__hi") - col("__lo")) / nBuckets, 4).as("hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }
}
