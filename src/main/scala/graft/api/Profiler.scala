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
}
