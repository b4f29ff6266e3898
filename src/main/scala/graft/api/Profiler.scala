package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the corpus-QA pass a pipeline runs before and
  * after every preparation stage (ingest sanity, post-filter drift,
  * dedup effect measurement). One wide aggregate computes every metric
  * in a single pass over the data (count / null-count are plain
  * map-side-combining aggregates; the exact distinct counts expand to
  * one Expand pass — still one scan), then the wide row is unpivoted
  * driver-free into (column, metric, value) long form: nLabels × nCols
  * rows, data never re-read.
  */
object Profiler {

  /** Exact per-column profile: (col_name, n_rows, n_nulls, n_distinct),
    * all BIGINT (engine-portable — no float formatting in the output).
    * `cols` defaults to every column of `df`. */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = names.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__dist_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // stack takes a FLAT expression list (n rows × 4 values per row)
    val stacked = names.map { c =>
      s"'$c', __rows_$c, __nulls_$c, __dist_$c"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${names.size}, $stacked) AS (col_name, n_rows, n_nulls, n_distinct)"))
  }
}
