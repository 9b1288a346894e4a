package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact word-shingle-set Jaccard similarity of two texts, fused into
  * one compiled call: tokenize both sides, build the distinct shingle
  * sets, |∩| / |∪|. Semantics identical to
  * `size(array_intersect(sh_a, sh_b)) / size(array_union(sh_a, sh_b))`
  * over [[WordShingles]] arrays (set semantics — duplicates collapse),
  * without materializing either array through the join.
  */
case class ShingleJaccard(left: Expression, right: Expression, shingleLen: Int)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_jaccard expects two STRING columns, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "shingle_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ShingleJaccard.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ShingleJaccard$$.MODULE$$.compute($a, $b, $shingleLen)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleJaccard =
    copy(left = newLeft, right = newRight)
}

object ShingleJaccard {

  private def shingleSet(text: UTF8String, n: Int): java.util.HashSet[String] = {
    val arr = WordShingles.compute(text, n)
    val set = new java.util.HashSet[String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      set.add(arr.getUTF8String(i).toString)
      i += 1
    }
    set
  }

  def compute(a: UTF8String, b: UTF8String, shingleLen: Int): Double = {
    val sa = shingleSet(a, shingleLen)
    val sb = shingleSet(b, shingleLen)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size() + sb.size() - inter
    if (union == 0) 0d else inter.toDouble / union
  }
}
