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

  /** Replicate-salt JOIN: the manual mitigation for a hot join key when
    * the small side can't broadcast (too big for executor memory) and
    * AQE's skew split can't help (it subdivides sort-merge partitions of
    * the BIG side, but every subdivision still probes the one reducer's
    * worth of hot-key rows — and it never fires for shuffled-hash
    * plans it didn't pick). The big side gets a deterministic salt
    * (`pmod(xxhash64(saltOn), saltBuckets)` — no rand(), replayable),
    * the small side is replicated ×saltBuckets via one `explode`, and
    * the join runs on (keys, salt): the hot key's rows now land on
    * `saltBuckets` reducers instead of one, at the price of a
    * saltBuckets× copy of the SMALL side only.
    *
    * `saltOn` MUST have high cardinality WITHIN each join-key value (a
    * row id, an event id — anything that varies across the hot key's
    * rows). Salting on the join key itself is a silent no-op exactly on
    * the skew this exists to fix: `xxhash64(joinKey)` is constant across
    * a hot key's rows, so they all land in ONE salt bucket again. The
    * bare-column misuse is rejected; expressions of the key alone can't
    * be detected — that contract is on the caller.
    *
    * `keyCols` are using-columns (same name both sides — rename before
    * calling). Only `inner` and `left` are meaningful: the big side
    * keeps exactly its own salt per row, so its rows emit once;
    * right/full would count replicated small rows and are rejected.
    * [[keyProfile]]'s `skew_x` on the join key picks `saltBuckets`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      saltBuckets: Int, saltOn: Column, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, s"saltBuckets must be positive, got $saltBuckets")
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left only, got $joinType")
    // col("k").toString == "k": catches the plain-column form of the
    // salt-on-the-join-key misuse at call time
    require(!keyCols.exists(_.equalsIgnoreCase(saltOn.toString)),
      s"saltOn ($saltOn) is a join key: every hot-key row would hash to one " +
        "salt bucket, silently disabling the mitigation — salt on a " +
        "high-cardinality-within-key column (e.g. a row id) instead")
    val bigS = big.withColumn("__salt", pmod(xxhash64(saltOn), lit(saltBuckets.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
    bigS.join(smallS, keyCols :+ "__salt", joinType).drop("__salt")
  }

  /** KEY-SKEW PROFILE: the measurement you run BEFORE choosing a
    * mitigation — the top-N hottest values of a prospective join/groupBy
    * key with, per key: row count, corpus share, and `skew_x` = count ÷
    * the mean rows-per-key (a uniform key profiles at skew_x ≈ 1; a key
    * at skew_x 500 is the reducer that will straggle, and tells you the
    * salt bucket count to reach for). NULL keys profile like any other
    * value — a mostly-NULL join key is the most common skew of all.
    *
    * Plan: one (key) hash aggregate (map-side combining, so the hot key
    * itself doesn't skew the PROFILE — each partition pre-collapses it
    * to one partial row), whose vocab-sized count frame is re-aggregated
    * to a 1-row (total, n_keys) broadcast (the sanctioned
    * corpus-constant crossJoin) and top-N'd — nothing corpus-sized
    * crosses a second exchange. share/skew_x are single IEEE divides on
    * exact longs, floored to 4dp. */
  def keyProfile(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("__total"), count(lit(1)).as("__nkeys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        (floor(col("cnt").cast("double") / col("__total").cast("double") * 1e4) / 1e4)
          .as("share"),
        (floor(col("cnt").cast("double")
          / (col("__total").cast("double") / col("__nkeys").cast("double")) * 1e4) / 1e4)
          .as("skew_x"))
      .orderBy(col("cnt").desc, col("key").asc_nulls_first)
      .limit(topN)
  }
}
