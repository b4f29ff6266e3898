package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture merge (MERGE INTO semantics, absent in
  * reference): fold a changelog into a base snapshot with
  * last-writer-wins conflict resolution — the operation that keeps a
  * 100 TB corpus snapshot current against an upstream feed (re-crawls,
  * takedown deletes, metadata fixes) without rewriting unaffected rows'
  * lineage.
  *
  * Scale design: the keeper election is a partial-aggregatable
  * `max(struct(seq…, payload))` per key — map-side combine collapses
  * each key's changes before the shuffle, so a hot key costs its
  * post-combine partial rows, never a single-task window sort (the
  * q_dedup_spans election pattern). The merge itself is one full-outer
  * equi-join on the key. Streaming form:
  * [[graft.streaming.CdcStream.applyChangesStream]] (same election
  * folded through `flatMapGroupsWithState`; batch parity
  * property-tested).
  */
object Cdc {

  /** Apply `changes` to `base` and return the merged snapshot.
    *
    *   - `keyCol`: the merge key; must exist in BOTH frames. At most one
    *     base row per key (enforced by contract, not scanned).
    *   - `seqCols`: change ordering, compared left-to-right
    *     (e.g. `Seq("ts", "event_id")`); the LARGEST tuple wins the key.
    *     Must be totally ordering within a key (include a unique
    *     tiebreaker) or the election falls through to payload order.
    *   - `opCol` / `deleteOp`: a change row whose `opCol` equals
    *     `deleteOp` deletes the key; anything else upserts.
    *   - `payloadCols`: columns carried by both frames; the winner's
    *     values replace the base values on upsert.
    *
    * Output: `keyCol`, `payloadCols`…, `cdc_action` ∈
    * {kept, updated, inserted} — rows whose winning change is a delete
    * are dropped (emit them with `keepDeletes = true` as
    * `cdc_action = deleted`, payload from the delete row — the
    * changelog-audit form). */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
      seqCols: Seq[String], opCol: String, deleteOp: String,
      payloadCols: Seq[String], keepDeletes: Boolean = false): DataFrame = {
    require(seqCols.nonEmpty, "seqCols must order the changes")
    val winner = changes
      .groupBy(col(keyCol).as("__k"))
      .agg(max(struct(
        (seqCols.map(col) ++ (col(opCol) +: payloadCols.map(col))): _*)).as("__w"))
      .select(col("__k") +: (col(s"__w.$opCol").as("__op") +:
        payloadCols.map(p => col(s"__w.$p").as(s"__new_$p"))): _*)
    val joined = base.join(winner, col(keyCol) === col("__k"), "full_outer")
    val action = when(col("__k").isNull, lit("kept"))
      .when(col("__op") === deleteOp, lit("deleted"))
      .when(col(keyCol).isNull, lit("inserted"))
      .otherwise(lit("updated"))
    val merged = joined.withColumn("cdc_action", action)
    val kept = if (keepDeletes) merged else merged.filter(col("cdc_action") =!= "deleted")
    kept.select(
      coalesce(col(keyCol), col("__k")).as(keyCol) +:
        payloadCols.map(p =>
          when(col("__k").isNotNull && col("cdc_action") =!= "kept",
            col(s"__new_$p")).otherwise(col(p)).as(p)) :+
        col("cdc_action"): _*)
  }

  /** SCD Type-2 history build: turn a changelog into validity-interval
    * versions — the dimension-table form of CDC, where every upsert
    * OPENS a version at its own timestamp and the NEXT change on the
    * same key (upsert or delete, whichever comes first) CLOSES it.
    * Delete changes close their predecessor but emit no version of
    * their own; a key whose latest change is a delete therefore has no
    * open version. The still-open version (`valid_to_ms` null) is the
    * current one.
    *
    *   - `tsMsCol`: the version-open timestamp (epoch ms, long);
    *   - `tieCols`: appended to the per-key ordering so it is total
    *     (e.g. a unique change id) — required, because equal timestamps
    *     would otherwise make the interval chain nondeterministic.
    *
    * Output: `keyCol`, tieCols…, `valid_from_ms`, `valid_to_ms`
    * (null = open), payloadCols…, `is_current` (bigint 0/1).
    *
    * Scale: one `Window.partitionBy(key)` lead — the shuffle is keyed
    * on the dimension key and each task sorts only its keys' change
    * lists (bounded by per-key change counts, never corpus-sized); the
    * delete filter runs after the lead so closes survive the drop. */
  def scd2History(changes: DataFrame, keyCol: String, tsMsCol: String,
      tieCols: Seq[String], opCol: String, deleteOp: String,
      payloadCols: Seq[String]): DataFrame = {
    require(tieCols.nonEmpty,
      "tieCols must make the per-key change order total (e.g. a change id)")
    val w = Window.partitionBy(col(keyCol))
      .orderBy((tsMsCol +: tieCols).map(col): _*)
    changes
      .withColumn("valid_to_ms", lead(col(tsMsCol), 1).over(w))
      .filter(col(opCol) =!= deleteOp)
      .withColumn("is_current", col("valid_to_ms").isNull.cast("bigint"))
      .select(col(keyCol) +: tieCols.map(col) ++:
        (col(tsMsCol).as("valid_from_ms") +: col("valid_to_ms") +:
          payloadCols.map(col) :+ col("is_current")): _*)
  }
}
