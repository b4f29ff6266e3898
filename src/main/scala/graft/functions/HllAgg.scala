package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, Decimal, LongType}
import org.apache.spark.sql.{Encoder, functions => F}
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String, VariantVal}

/** Spark-HLL++-exact MERGEABLE sketches as plain `array<bigint>` values
  * — the persistable form of `approx_count_distinct`'s internal state.
  *
  * `approx_count_distinct` is a one-shot estimator: its register words
  * never leave the aggregation buffer, so daily distinct counts cannot
  * roll up to weekly/monthly ones without rescanning the raw data.
  * These two Aggregators expose the SAME sketch (driven through
  * Spark's own [[HyperLogLogPlusPlusHelper]] — identical XXH64(seed 42)
  * register hash, identical bias-corrected estimator, bit-for-bit the
  * `approx_count_distinct` state) as a first-class column value:
  *
  *  - [[HllSketchAgg]] aggregates raw longs into the register-word
  *    array (one `numWords`-long buffer per group, map-side partials,
  *    element-wise register max on merge — commutative, associative,
  *    idempotent, so partition order can never change a register);
  *  - [[HllMergeEstAgg]] union-merges any set of sketch rows (the same
  *    register max) and finishes with the helper's estimator.
  *
  * Because the registers and estimator are exactly Spark's, the whole
  * rollup replays in the [[graft.operators.HllOracleSql]] register
  * transcription — which is what finally puts `q_hll_rollup` under the
  * DuckDB hash gate (the DataSketches HLL it previously wrapped was in
  * true estimation mode at sf0.1 with a foreign library's HIP estimator
  * as its internals — the documented r11 no-oracle obstruction).
  *
  * 100 TB shape: a sketch is `numWords` longs (rsd 0.02 → p=12 →
  * 4096 6-bit registers in ~410 words, ≈3.3 KB) per group — the
  * (day, sketch) table for a decade of days is megabytes, and any date
  * range's distinct count is one kilobyte-sized merge, never a rescan.
  */
object HllReg {
  /** rsd 0.02 → p=12 — q_approx_distinct's parameterization, so the
    * oracle transcriptions share one register geometry. */
  val Rsd = 0.02

  lazy val helper = new HyperLogLogPlusPlusHelper(Rsd)
  def numWords: Int = helper.numWords

  /** Zero-copy [[InternalRow]] view over a register-word array — the
    * helper reads/writes exclusively via getLong/setLong, so only the
    * long accessors are live; everything else fails loudly. */
  private[functions] final class WordsRow(val words: Array[Long]) extends InternalRow {
    override def numFields: Int = words.length
    override def getLong(i: Int): Long = words(i)
    override def setLong(i: Int, v: Long): Unit = words(i) = v
    override def update(i: Int, v: Any): Unit = words(i) = v.asInstanceOf[Long]
    override def copy(): InternalRow = new WordsRow(words.clone())
    override def isNullAt(i: Int): Boolean = false
    override def setNullAt(i: Int): Unit = unsupported
    override def getBoolean(i: Int): Boolean = unsupported
    override def getByte(i: Int): Byte = unsupported
    override def getShort(i: Int): Short = unsupported
    override def getInt(i: Int): Int = unsupported
    override def getFloat(i: Int): Float = unsupported
    override def getDouble(i: Int): Double = unsupported
    override def getDecimal(i: Int, p: Int, s: Int): Decimal = unsupported
    override def getUTF8String(i: Int): UTF8String = unsupported
    override def getBinary(i: Int): Array[Byte] = unsupported
    override def getInterval(i: Int): CalendarInterval = unsupported
    override def getStruct(i: Int, n: Int): InternalRow = unsupported
    override def getArray(i: Int): org.apache.spark.sql.catalyst.util.ArrayData = unsupported
    override def getMap(i: Int): org.apache.spark.sql.catalyst.util.MapData = unsupported
    override def getVariant(i: Int): VariantVal = unsupported
    override def getGeography(i: Int): org.apache.spark.unsafe.types.GeographyVal = unsupported
    override def getGeometry(i: Int): org.apache.spark.unsafe.types.GeometryVal = unsupported
    override def get(i: Int, dt: DataType): AnyRef = unsupported
    private def unsupported: Nothing =
      throw new UnsupportedOperationException("WordsRow is a long-register view")
  }

  private[functions] def mergeWords(a: Array[Long], b: Array[Long]): Array[Long] =
    if (b.isEmpty) a
    else if (a.isEmpty) b
    else { helper.merge(new WordsRow(a), new WordsRow(b), 0, 0); a }
}

/** Raw longs → HLL++ register-word sketch (`array<bigint>`). Nulls are
  * ignored (absent, like `approx_count_distinct`). */
object HllSketchAgg
    extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
  def zero: Array[Long] = new Array[Long](HllReg.numWords)
  def reduce(b: Array[Long], v: java.lang.Long): Array[Long] = {
    if (v != null)
      HllReg.helper.update(new HllReg.WordsRow(b), 0, v.longValue(), LongType)
    b
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = HllReg.mergeWords(a, b)
  def finish(b: Array[Long]): Seq[Long] = b.toSeq
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  val fn: org.apache.spark.sql.expressions.UserDefinedFunction = F.udaf(this)
}

/** Sketch rows → union-merged estimate (the helper's bias-corrected
  * HLL++ query over the register max). Null/empty sketches are
  * ignored; an all-empty group estimates 0. */
object HllMergeEstAgg
    extends Aggregator[Seq[Long], Array[Long], Long] {
  def zero: Array[Long] = Array.emptyLongArray
  def reduce(b: Array[Long], v: Seq[Long]): Array[Long] =
    if (v == null || v.isEmpty) b
    else HllReg.mergeWords(b, v.toArray)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = HllReg.mergeWords(a, b)
  def finish(b: Array[Long]): Long =
    if (b.isEmpty) 0L
    else HllReg.helper.query(new HllReg.WordsRow(b), 0)
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
  val fn: org.apache.spark.sql.expressions.UserDefinedFunction = F.udaf(this)
}
