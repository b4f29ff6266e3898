package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining over (basket, item) event streams —
  * the classic "users who do A also do B" co-occurrence readout behind
  * recommendation seeds, funnel hypotheses, and feature co-activation
  * audits. One rule row per ORDERED item pair (a → b) with the three
  * standard measures: support P(a∧b), confidence P(b|a), lift
  * P(a∧b)/(P(a)·P(b)).
  *
  * Scale shape: the corpus collapses FIRST to its distinct
  * (basket, item) frame (one map-side-combining aggregate); the pair
  * generation is a self-equi-join on the basket key, so its fan-out is
  * bounded by the per-basket distinct-item count squared — with a
  * bounded item vocabulary (event types, product categories) that is a
  * constant per basket, never corpus². The margins (per-item basket
  * counts, total basket count) are item-cardinality / 1-row frames that
  * cross back via broadcast. Everything up to the final three divisions
  * is exact long arithmetic; each measure is ONE long/long (or
  * long·long / long·long) division floor-truncated at 4dp, so the
  * output is engine-exact.
  */
object Associations {

  /** Mine ordered-pair rules from `df`: `basketCol` groups rows into
    * baskets, `itemCol` is the item. Pairs seen in fewer than
    * `minBaskets` baskets are dropped (the support floor that keeps the
    * rule set spine item²-bounded rather than noise-sized). Output:
    * (item_a, item_b, n_ab, n_a, n_b, n_baskets, support, confidence,
    * lift), ordered by the caller. */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
      minBaskets: Long = 1L): DataFrame = {
    require(minBaskets >= 1, s"minBaskets must be ≥1, got $minBaskets")
    val items = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("b"), col(itemCol).as("item"))
      .distinct()
    val itemCounts = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val nBaskets = items.agg(countDistinct(col("b")).as("n_baskets"))
    val pairs = items.as("x")
      .join(items.as("y"), col("x.b") === col("y.b") &&
        col("x.item") =!= col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minBaskets)
    pairs
      .join(itemCounts.select(col("item").as("item_a"), col("n_item").as("n_a")), "item_a")
      .join(itemCounts.select(col("item").as("item_b"), col("n_item").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"),
        (floor(col("n_ab").cast("double") / col("n_baskets") * 10000) / 10000)
          .as("support"),
        (floor(col("n_ab").cast("double") / col("n_a") * 10000) / 10000)
          .as("confidence"),
        // products as decimal(38,0) BEFORE the double division — long×long
        // silently wraps past ~9.2e18 at 10^10-row scale (the mutualInfo
        // discipline); DuckDB's HUGEINT oracle would diverge otherwise
        (floor((col("n_ab").cast("decimal(38,0)") * col("n_baskets")).cast("double")
          / (col("n_a").cast("decimal(38,0)") * col("n_b")).cast("double")
          * 10000) / 10000).as("lift"))
  }
}
