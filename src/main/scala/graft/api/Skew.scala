package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (ARCHITECTURE.md). AQE's skew-join splitting
  * handles join-side skew automatically; aggregation over a hot GROUP BY
  * key still funnels that key's rows into one reducer — salting spreads
  * them across `saltBuckets` partial groups first.
  */
object Skew {

  /** Two-phase salted aggregation: pre-aggregate on (keys, salt), then
    * final-aggregate on keys. The salt is deterministic —
    * `pmod(xxhash64(saltOn), saltBuckets)` — so results are replayable
    * (no rand()). Callers supply both phases because they differ
    * algebraically (count → sum of partial counts, avg → sum/sum, ...).
    *
    * {{{
    * Skew.saltedAggregate(events, Seq("event_type"), 16, col("event_id"))(
    *   partial = Seq(count(lit(1)).as("c"), sum("value").as("s")),
    *   fin     = Seq(sum("c").as("cnt"), round(sum("s"), 4).as("sum_value")))
    * }}}
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
      saltOn: Column)(partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltOn), lit(saltBuckets)))
    val pre = salted.groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    pre.groupBy(keyCols.map(col): _*).agg(fin.head, fin.tail: _*)
  }
}
