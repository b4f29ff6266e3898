package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.api.Cdc]]: fold an unbounded changelog into
  * per-key materialized state at ingest, emitting one upsert/delete
  * record per touched key per micro-batch — the stream a downstream
  * writer applies to the base snapshot incrementally instead of
  * re-running the batch merge over the full feed.
  *
  * State per key is ONE row (the winning change so far) — the minimum
  * any changelog materialization can hold; unlike the dedup/near-dup
  * state this must not expire (a TTL would silently resurrect
  * overwritten versions on re-delivery), so state size = live-key count
  * × a few fields. Late or replayed changes are folded by the same
  * last-writer election as the batch operator, making the stream
  * ORDER-INSENSITIVE: any batch split / interleaving of the same
  * changes converges to the same final emission per key
  * (batch parity property-tested in CdcStreamSpec).
  */
object CdcStream {

  /** One changelog record: `(seq, seq2)` is the writer ordering (e.g.
    * timestamp + unique event id), `op` the change kind, `value` the
    * payload. */
  final case class Change(key: Long, seq: Long, seq2: Long, op: String, value: Double)

  /** The per-key winner retained across batches. NOTE state-store schema:
    * evolving this case class breaks checkpoint compatibility (same
    * contract as StatefulOps.FpState). */
  final case class KeyState(seq: Long, seq2: Long, op: String, value: Double)

  /** Emitted once per touched key per micro-batch: the key's CURRENT
    * materialized row (`cdc_action` = upsert) or its tombstone
    * (`cdc_action` = delete). */
  final case class Upsert(key: Long, value: Double, cdc_action: String)

  /** The same (seq, seq2, op, value) lexicographic election as the batch
    * operator's `max(struct(seq…, op, payload…))` — op/payload only break
    * exact (seq, seq2) ties, where Scala's ASCII string ordering matches
    * Spark's binary struct comparison. */
  private def winner(a: KeyState, b: KeyState): KeyState = {
    val cmp = implicitly[Ordering[(Long, Long, String, Double)]]
      .compare((a.seq, a.seq2, a.op, a.value), (b.seq, b.seq2, b.op, b.value))
    if (cmp >= 0) a else b
  }

  /** Apply the changelog stream: per micro-batch, each touched key folds
    * its arrivals into the retained winner and emits the resulting
    * upsert/delete. The LAST emission per key across the run equals the
    * batch `Cdc.applyChanges` election over all changes seen. */
  def applyChangesStream(changes: Dataset[Change],
      deleteOp: String): Dataset[Upsert] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[Upsert]
    implicit val keyEnc = Encoders.scalaLong
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[Change], state: GroupState[KeyState]) =>
          val arrived = it.map(c => KeyState(c.seq, c.seq2, c.op, c.value))
          val folded = (state.getOption.iterator ++ arrived).reduce(winner)
          state.update(folded)
          val action = if (folded.op == deleteOp) "delete" else "upsert"
          Iterator(Upsert(key, folded.value, action))
      }
  }
}
