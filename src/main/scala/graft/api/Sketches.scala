package graft.api

import scala.collection.mutable
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Sketch aggregations beyond Spark's built-ins (HLL, t-digest approx
  * percentile are covered by `approx_count_distinct` /
  * `percentile_approx`). This adds the Misra-Gries / space-saving
  * heavy-hitters summary as a typed [[Aggregator]]: top-k frequent items
  * in one pass with k counters per partition, mergeable across
  * partitions — the 100 TB alternative to a full groupBy+sort when only
  * the head of the frequency distribution matters.
  *
  * Guarantee (k counters, n items): every item with true count > n/k is
  * in the summary, and each reported count overestimates the true count
  * by at most the eviction floor. Counts are exact when distinct items
  * ≤ k (no evictions).
  */
object Sketches {

  /** Space-saving buffer: item → (count, maxError). */
  type SSBuf = mutable.HashMap[String, (Long, Long)]

  class SpaceSaving(k: Int) extends Aggregator[String, SSBuf, Seq[(String, Long)]] {
    override def zero: SSBuf = mutable.HashMap.empty

    override def reduce(b: SSBuf, x: String): SSBuf = {
      b.get(x) match {
        case Some((c, e)) => b.update(x, (c + 1, e))
        case None if b.size < k => b.update(x, (1L, 0L))
        case None =>
          // evict the minimum-count entry (deterministic: smallest key
          // among minima) and inherit its count as the error floor
          val (mk, (mc, _)) = b.minBy { case (key, (c, _)) => (c, key) }
          b.remove(mk)
          b.update(x, (mc + 1, mc))
      }
      b
    }

    override def merge(a: SSBuf, b: SSBuf): SSBuf = {
      // Standard space-saving merge (Agarwal et al., "Mergeable
      // Summaries"): an item absent from a full buffer may have been
      // evicted there with a count up to that buffer's minimum — charge
      // that floor so merged counts still OVERestimate true counts (the
      // documented guarantee). Without it, eviction-absorbed mass is lost
      // and a genuine heavy hitter can be truncated below a locally
      // overcounted item.
      def floor(buf: SSBuf): Long =
        if (buf.size >= k) buf.valuesIterator.map(_._1).min else 0L
      val fa = floor(a); val fb = floor(b)
      val merged = mutable.HashMap.empty[String, (Long, Long)]
      (a.keysIterator ++ b.keysIterator).foreach { key =>
        if (!merged.contains(key)) {
          val (ca, ea) = a.getOrElse(key, (fa, fa))
          val (cb, eb) = b.getOrElse(key, (fb, fb))
          merged.update(key, (ca + cb, ea + eb))
        }
      }
      // shrink back to k counters, keeping the largest (deterministic
      // tiebreak by key)
      val keep =
        if (merged.size > k)
          merged.toSeq.sortBy { case (key, (c, _)) => (-c, key) }.take(k)
        else merged.toSeq
      a.clear(); keep.foreach { case (key, v) => a.update(key, v) }
      a
    }

    override def finish(b: SSBuf): Seq[(String, Long)] =
      b.toSeq.map { case (key, (c, _)) => (key, c) }
        .sortBy { case (key, c) => (-c, key) }

    override def bufferEncoder: Encoder[SSBuf] = Encoders.kryo[SSBuf]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column form: `heavyHitters(16)(col("token"))` → array<struct<_1,_2>>
    * of (item, approx_count) by count desc. */
  def heavyHitters(k: Int): Column => Column = {
    val fn = udaf(new SpaceSaving(k))
    (c: Column) => fn(c)
  }
}
