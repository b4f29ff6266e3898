package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions => F}

/** `collect_set` with a hard buffer cap: collects distinct longs until
  * the set holds `cap` elements, then stops adding. A group whose true
  * distinct count exceeds `cap` therefore returns EXACTLY `cap` elements
  * (callers detect overflow with `size(...) >= cap`), and a group at or
  * under `cap − 1` returns its complete exact set.
  *
  * Why it exists: the single-shuffle inverted-index dedup groups the
  * (shingle, id) stream by shingle and DROPS hot shingles (df >
  * maxShingleDf) — but a plain `collect_set` would materialize the full
  * posting list of a stop-shingle ("the the the" in 10⁸ documents) in
  * ONE reducer buffer before the size filter could discard it. Capping
  * at maxShingleDf + 1 bounds every aggregation buffer (map-side partial
  * and final merge alike) at cap longs while preserving exactly the
  * information the guard needs:
  *   - true df ≤ maxShingleDf → no partial ever truncates → the merged
  *     set is COMPLETE and exact;
  *   - true df > maxShingleDf → the merged set provably fills to `cap`
  *     (a buffer below cap holds ALL its inputs' values, so merging
  *     sets covering ≥ cap distinct values cannot stall below cap) →
  *     dropped; WHICH ids survived truncation is arbitrary but
  *     irrelevant.
  *
  * The buffer is a flat Array[Long] with linear-scan dedup — O(cap) per
  * element, right for the guard caps this exists for (tens to a few
  * hundred); for huge caps use plain collect_set and accept the memory.
  */
final class CappedSetAgg(cap: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(cap > 0, s"cap must be > 0, got $cap")

  def zero: Array[Long] = Array.emptyLongArray

  private def contains(b: Array[Long], a: Long): Boolean = {
    var i = 0
    while (i < b.length) { if (b(i) == a) return true; i += 1 }
    false
  }

  def reduce(b: Array[Long], a: Long): Array[Long] =
    if (b.length >= cap || contains(b, a)) b else b :+ a

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var b = x
    var i = 0
    while (b.length < cap && i < y.length) {
      if (!contains(b, y(i))) b = b :+ y(i)
      i += 1
    }
    b
  }

  def finish(b: Array[Long]): Seq[Long] = b.toSeq.sorted

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object CappedSetAgg {
  /** Column function: collect up to `cap` distinct longs per group,
    * result pre-sorted ascending. */
  def fn(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    F.udaf(new CappedSetAgg(cap))
}
