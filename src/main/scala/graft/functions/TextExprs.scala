package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst string-similarity expressions (Spark ships only
  * levenshtein; record-linkage blocking needs Jaro-Winkler).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (verified
  * empirically against it, and continuously by the q_fuzzy_join oracle):
  *   - Jaro: match window `max(|a|,|b|)/2 - 1` (floor, min 0),
  *     transpositions = half the out-of-order matched pairs,
  *     `j = (m/|a| + m/|b| + (m-t)/m) / 3`; no matches → 0.0; either
  *     string empty → 0.0 (both-empty included).
  *   - Winkler boost ONLY when j > 0.7: `j + min(prefix,4)·0.1·(1-j)`.
  *
  * Operates on UTF-16 code units of the decoded string (ASCII-safe;
  * supplementary-plane characters count as two units, matching neither
  * byte- nor codepoint-level engines exactly — callers comparing
  * non-BMP text should normalize first).
  */
object TextExprs {

  /** jaro_winkler(a, b) → double in [0, 1]. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler expects two strings, got ${left.dataType} / ${right.dataType}")

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[UTF8String].toString
      val b = r.asInstanceOf[UTF8String].toString
      TextExprs.jaroWinkler(a, b)
    }
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** The scalar kernel (shared by the expression and the scalatest
    * reference checks). */
  def jaroWinkler(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && a.charAt(i) == b.charAt(j)) {
          matchedA(i) = true; matchedB(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the matched chars of each side in order
    var t = 0; var k = 0; i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val halfT = t / 2
    val j = (m.toDouble / la + m.toDouble / lb + (m - halfT).toDouble / m) / 3.0
    if (j > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(la, lb))
      while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }

  def buildJaroWinkler(es: Seq[Expression]): Expression = {
    require(es.length == 2, s"graft_jaro_winkler expects (a, b), got ${es.length} args")
    JaroWinkler(es.head, es(1))
  }
}
