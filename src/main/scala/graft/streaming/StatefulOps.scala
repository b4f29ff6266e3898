package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operators (`flatMapGroupsWithState`) — the
  * state-store surface the built-in windowed aggregations can't express.
  *
  * [[streamingDedup]] is the streaming form of exact dedup
  * (graft.api.TextDedup.exactSurvivors): documents arrive continuously,
  * each keyed by content fingerprint, and the pipeline must know — at
  * ingest time, across micro-batches — whether a document is the first
  * occurrence (keep) or a duplicate (drop), plus how much duplication
  * each fingerprint accumulates. One row is emitted per (fingerprint ×
  * micro-batch that saw it); state is one (firstId, seen) pair per
  * distinct fingerprint, partitioned by the state store across
  * executors, so memory scales with distinct keys per executor, not
  * stream length.
  *
  * State growth at 100 TB: distinct fingerprints are unbounded, so
  * production sets `ttl` — state carries an event-time timeout stamped
  * `maxEventTimeMs + ttlMs` and is dropped when the WATERMARK passes it
  * (requires `withWatermark` upstream); a fingerprint recurring after
  * expiry is treated as first-seen again (the standard windowed-dedup
  * trade-off, identical to `dropDuplicates` with watermark).
  *
  * TTL wiring note: the watermarked timestamp column must SURVIVE into
  * this operator's child plan — call `.withWatermark(...)` and then
  * `.as[FpDoc]` directly (extra columns are fine for a typed view); a
  * `select` that drops the watermark column fails analysis with
  * "Event-time timeout not supported without watermark".
  */
object StatefulOps {

  /** One incoming document: content fingerprint, document id, event-time
    * millis. */
  final case class FpDoc(fp: String, id: Long, tsMs: Long)

  /** Per-fingerprint state: canonical (first-seen) id, total docs seen,
    * and the max event time observed (the TTL anchor — a running max so
    * an out-of-order batch can never move the expiry backwards).
    *
    * NOTE on evolution: the state-store schema is this case class's
    * encoder — adding/removing fields breaks restart from checkpoints
    * written by the previous shape (Spark validates state schema
    * compatibility). Version any future change (new state type + a
    * migration read), don't edit this class in place. */
  final case class FpState(firstId: Long, seen: Long, maxTsMs: Long)

  /** One output row per (fingerprint, micro-batch): the canonical id,
    * whether this batch saw the FIRST occurrence, how many rows this
    * batch contributed, and the running total. */
  final case class FpUpdate(fp: String, canonical_id: Long, is_new: Boolean,
      batch_docs: Long, total_docs: Long)

  /** Streaming exact-dedup with per-key state. `ttlMs > 0` expires idle
    * state once the watermark passes last-event-time + ttl. */
  def streamingDedup(docs: Dataset[FpDoc], ttlMs: Long = 0L): Dataset[FpUpdate] = {
    implicit val stateEnc = Encoders.product[FpState]
    implicit val outEnc = Encoders.product[FpUpdate]
    implicit val keyEnc = Encoders.STRING
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (fp: String, rows: Iterator[FpDoc], state: GroupState[FpState]) =>
          if (state.hasTimedOut) {
            // watermark passed last-event-time + ttl: drop the key's state
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toVector
            val prev = state.getOption
            // deterministic canonical pick within the first batch: min id
            val first = prev.map(_.firstId).getOrElse(batch.map(_.id).min)
            val total = prev.map(_.seen).getOrElse(0L) + batch.size
            // running max across batches: an out-of-order (but not late)
            // row must never pull the TTL deadline backwards
            val maxTs = math.max(prev.map(_.maxTsMs).getOrElse(Long.MinValue),
              batch.map(_.tsMs).max)
            state.update(FpState(first, total, maxTs))
            if (ttlMs > 0) state.setTimeoutTimestamp(maxTs + ttlMs)
            Iterator.single(FpUpdate(fp, first, prev.isEmpty, batch.size.toLong, total))
          }
      }
  }
}
