package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in graft.operators / graft.functions as `Q` values (Spark
  * impl + optional DuckDB oracle SQL); this object just aggregates them.
  */
object SparkEntry {
  private def registry: Seq[Q] =
    operators.Relational.all ++
      operators.Windows.all ++
      operators.Extras.all ++
      functions.Scalars.all ++
      operators.TextOps.all ++
      operators.Dedup.all ++
      operators.VectorOps.all ++
      operators.Multimodal.all ++
      operators.Governance.all

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (those
    * get a rows-only check + scalatest coverage). */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
