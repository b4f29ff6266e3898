package graft.api

import org.apache.spark.sql.DataFrame
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
}
