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

/** DECIMAL-exact element-wise vector sum: each element is fixed to 10
  * decimal places as a scaled long (`Math.round(x·1e10)` — the exact
  * `floor(x + 1/2)` contract, and `x·1e10 + 0.5` is itself exact below
  * 2^51, so DuckDB's `floor(x*1e10 + 0.5)` replays it bit-for-bit),
  * then summed in EXACT long arithmetic. Long addition is associative
  * and commutative, so the aggregate is partition-order-invariant by
  * VALUE — the property the plain double [[VecSumAgg]] cannot give, and
  * the reason the Lloyd updates in [[graft.api.Similarity.fitIvf]] /
  * [[graft.api.Similarity.pqFit]] were unreplayable in a SQL oracle
  * before r11 (scaled-long discipline: the q_correlation precedent,
  * operators/Extras.scala). Same shuffle shape as [[VecSumAgg]]: one
  * dim-length buffer per group, map-side partial aggregation.
  *
  * Overflow trips `Math.addExact` loudly (|x| ≲ 1e6 holds ~10^2.5 rows
  * per cell per long of headroom; every graft fit is fit-on-a-sample,
  * so cell counts are sample-bounded — and a silent wrap would be a
  * correctness bug worth a crash). Null/empty inputs are ignored;
  * ragged dims fail loudly.
  */
object VecSumDecAgg extends Aggregator[Seq[Double], Array[Long], Seq[Long]] {
  /** The shared fixed-point contract: exact floor(x·1e10 + 1/2). */
  def scaled(x: Double): Long = Math.round(x * 1e10)

  def zero: Array[Long] = Array.emptyLongArray

  private def add(b: Array[Long], a: Seq[Double]): Array[Long] =
    if (a == null || a.isEmpty) b
    else if (b.isEmpty) a.iterator.map(scaled).toArray
    else {
      require(b.length == a.length,
        s"vec_sum_dec_agg: ragged input dims ${b.length} vs ${a.length}")
      var i = 0
      val it = a.iterator
      while (i < b.length) { b(i) = Math.addExact(b(i), scaled(it.next())); i += 1 }
      b
    }

  def reduce(b: Array[Long], a: Seq[Double]): Array[Long] = add(b, a)
  def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (y.isEmpty) x
    else if (x.isEmpty) y
    else {
      require(x.length == y.length,
        s"vec_sum_dec_agg: ragged buffer dims ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) = Math.addExact(x(i), y(i)); i += 1 }
      x
    }
  def finish(b: Array[Long]): Seq[Long] = b.toSeq

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** The column function: scaled-long sums of `col: array<double>`. */
  val fn: org.apache.spark.sql.expressions.UserDefinedFunction = F.udaf(this)

  /** The matching mean: (Σ scaled)/1e10/cnt rounded HALF_UP to 6dp —
    * exact decimal division, so the centroid VALUE depends only on the
    * multiset of inputs. DuckDB replay: sign·((|S|·2 + D) // (2·D))/1e6
    * with D = 10^4·cnt in HUGEINT. */
  def mean6(scaledSum: Long, cnt: Long): Double =
    java.math.BigDecimal.valueOf(scaledSum, 10)
      .divide(java.math.BigDecimal.valueOf(cnt), 6, java.math.RoundingMode.HALF_UP)
      .doubleValue
}
