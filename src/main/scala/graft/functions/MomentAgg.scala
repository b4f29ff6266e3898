package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, functions => F}

/** Second-moment aggregate for PCA: one pass over an `array<double>`
  * column producing the flat frame `[n, Σv (d), Σvvᵀ (d², row-major)]`
  * — the covariance sufficient statistic, in ONE buffer of 1 + d + d²
  * doubles per group.
  *
  * Why a dedicated aggregator: the declarative spelling
  * `VecSumAgg(flatten(transform(v, x -> transform(v, y -> x*y))))`
  * builds the d² outer product through nested higher-order functions,
  * which are CodegenFallback — every element is an interpreted lambda
  * call, measured at ~35 s for 2000 × 64-dim vectors at sf0.1. Here the
  * outer product is a primitive fused multiply-add loop inside the
  * aggregator's object buffer (d² flops per row, no boxing, no
  * per-element lambda), and the buffer serializes only at partial-
  * aggregation boundaries — map-side combine ships d²+d+1 doubles per
  * partition, the 100 TB shape.
  *
  * Null/empty vectors are ignored; ragged dims fail loudly.
  */
object MomentAgg extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  def zero: Array[Double] = Array.emptyDoubleArray

  def reduce(b: Array[Double], a: Seq[Double]): Array[Double] =
    if (a == null || a.isEmpty) b
    else {
      val d = a.length
      val buf = if (b.isEmpty) new Array[Double](1 + d + d * d) else b
      require(buf.length == 1 + d + d * d,
        s"moment_agg: ragged input dim $d vs buffer for dim " +
          s"${math.sqrt(buf.length.toDouble).toInt - 1}")
      val v = a.toArray
      buf(0) += 1.0
      var i = 0
      while (i < d) {
        val ai = v(i)
        buf(1 + i) += ai
        val off = 1 + d + i * d
        var j = 0
        while (j < d) { buf(off + j) += ai * v(j); j += 1 }
        i += 1
      }
      buf
    }

  def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    if (y.isEmpty) x
    else if (x.isEmpty) y
    else {
      require(x.length == y.length,
        s"moment_agg: merging buffers of dims ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  def finish(b: Array[Double]): Seq[Double] = b.toSeq

  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** Column function: `MomentAgg.fn(col)` with `col: array<double>`. */
  val fn: org.apache.spark.sql.expressions.UserDefinedFunction = F.udaf(this)
}

/** DECIMAL-exact second-moment aggregate — [[MomentAgg]] under the
  * [[VecSumDecAgg]] scaled-long discipline: each per-row term (the
  * count's 1, the value vᵢ, the product vᵢ·vⱼ — the product COMPUTED in
  * double first, then fixed) is rounded to 10 decimal places as a
  * scaled long (`Math.round(x·1e10)` ≡ DuckDB `floor(x*1e10 + 0.5)`
  * exactly below 2^51) and summed in EXACT long arithmetic. Long
  * addition is associative/commutative, so the moment frame is
  * partition-order-invariant by VALUE — the property that makes the
  * PCA fit's covariance (and everything the driver-side eigensolver
  * derives from it) replayable in a SQL oracle, exactly as
  * [[VecSumDecAgg]] did for the Lloyd updates in r11.
  *
  * Buffer layout: `[n, Σ⌊vᵢ⌉ (d), Σ⌊vᵢvⱼ⌉ (d², row-major)]` — the
  * count is stored UNSCALED in slot 0 (a plain long, still exact).
  * Overflow trips `Math.addExact` loudly (|v| ≤ 1-ish embeddings give
  * ~2^23 rows of headroom per sum). Null/empty vectors are ignored;
  * ragged dims fail loudly.
  */
object MomentDecAgg extends Aggregator[Seq[Double], Array[Long], Seq[Long]] {
  def zero: Array[Long] = Array.emptyLongArray

  def reduce(b: Array[Long], a: Seq[Double]): Array[Long] =
    if (a == null || a.isEmpty) b
    else {
      val d = a.length
      val buf = if (b.isEmpty) new Array[Long](1 + d + d * d) else b
      require(buf.length == 1 + d + d * d,
        s"moment_dec_agg: ragged input dim $d vs buffer for dim " +
          s"${math.sqrt(buf.length.toDouble).toInt - 1}")
      val v = a.toArray
      buf(0) = Math.addExact(buf(0), 1L)
      var i = 0
      while (i < d) {
        val ai = v(i)
        buf(1 + i) = Math.addExact(buf(1 + i), VecSumDecAgg.scaled(ai))
        val off = 1 + d + i * d
        var j = 0
        while (j < d) {
          buf(off + j) = Math.addExact(buf(off + j), VecSumDecAgg.scaled(ai * v(j)))
          j += 1
        }
        i += 1
      }
      buf
    }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (y.isEmpty) x
    else if (x.isEmpty) y
    else {
      require(x.length == y.length,
        s"moment_dec_agg: merging buffers of dims ${x.length} vs ${y.length}")
      var i = 0
      while (i < x.length) { x(i) = Math.addExact(x(i), y(i)); i += 1 }
      x
    }

  def finish(b: Array[Long]): Seq[Long] = b.toSeq

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** Column function: `MomentDecAgg.fn(col)` with `col: array<double>`. */
  val fn: org.apache.spark.sql.expressions.UserDefinedFunction = F.udaf(this)
}
