package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a codegen'd native expression — the
  * entity-resolution measure Spark lacks (it ships only levenshtein
  * and soundex). Semantics match DuckDB's `jaro_winkler_similarity`
  * exactly (verified empirically over 6k random string pairs):
  *
  *  - either side empty → 0.0 (INCLUDING both empty — the DuckDB
  *    rule, not the "equal strings → 1" shortcut)
  *  - match window = max(len)/2 − 1, clamped at 0
  *  - transpositions = half the out-of-order matches (integer halve)
  *  - Winkler prefix boost `sj + l·0.1·(1−sj)` (common prefix l ≤ 4)
  *    applied only when the Jaro similarity exceeds 0.7
  *
  * Comparison is per UTF-16 char (≡ DuckDB's per-character compare
  * for the ASCII catalog strings this engine matches on).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects two STRING columns, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0d
    val sj = jaro(s1, s2, l1, l2)
    if (sj <= 0.7) return sj
    var l = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (l < maxPrefix && s1.charAt(l) == s2.charAt(l)) l += 1
    sj + l * 0.1 * (1 - sj)
  }

  private def jaro(s1: String, s2: String, l1: Int, l2: Int): Double = {
    if (s1 == s2) return 1d
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + window + 1)
      var j = math.max(0, i - window)
      var unmatched = true
      while (j < hi && unmatched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0d
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    (matches.toDouble / l1 + matches.toDouble / l2 +
      (matches - tr).toDouble / matches) / 3
  }
}
