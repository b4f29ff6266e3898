package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions => F}

/** Element-wise vector-sum aggregate: sums `array<double>` columns across
  * rows (one buffer per group = one dim-length array). This is the Lloyd
  * mean-update shape for [[graft.api.Similarity.ivfJoin]]: the shuffle
  * carries ONE row per (cell) holding a dim-array, instead of the
  * posexplode form's |corpus| × dim (cell, pos, x) rows — at 100 TB that
  * is the difference between shuffling the corpus once and shuffling it
  * `dim` times per Lloyd round. Partial aggregation applies: executors
  * combine map-side, only nCells × dim doubles cross the wire.
  *
  * Null/empty inputs are ignored (treated as absent, like built-in sum);
  * ragged dims fail loudly rather than mis-sum.
  */
object VecSumAgg extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  def zero: Array[Double] = Array.emptyDoubleArray

  private def add(b: Array[Double], a: Seq[Double]): Array[Double] =
    if (a == null || a.isEmpty) b
    else if (b.isEmpty) a.toArray
    else {
      require(b.length == a.length,
        s"vec_sum_agg: ragged input dims ${b.length} vs ${a.length}")
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }

  def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = add(b, a)
  def merge(x: Array[Double], y: Array[Double]): Array[Double] = add(x, y.toSeq)
  def finish(b: Array[Double]): Seq[Double] = b.toSeq

  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** The column function: `vecSum(col)` with `col: array<double>`. */
  val fn: org.apache.spark.sql.expressions.UserDefinedFunction = F.udaf(this)
}
