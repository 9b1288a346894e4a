package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingle expression: text → array of
  * space-joined `shingleLen`-grams over the normalized token stream
  * (whole normalized text when shorter) — exactly
  * `TextOps.shingles(TextOps.tokens(text), n)`, compiled (the
  * declarative version interpolates an interpreted `transform` +
  * `concat_ws` per position per row; this is one JVM call).
  */
case class WordShingles(child: Expression, shingleLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a STRING column, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles$$.MODULE$$.compute($c, $shingleLen)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Normalization identical to MinHashSig.compute / TextOps.norm. */
  def normTokens(text: UTF8String, shingleLen: Int): (String, Array[String]) = {
    val lowered = text.toString.toLowerCase(java.util.Locale.ROOT)
    var start = 0
    var end = lowered.length
    while (start < end && lowered.charAt(start) == ' ') start += 1
    while (end > start && lowered.charAt(end - 1) == ' ') end -= 1
    val norm = lowered.substring(start, end).replaceAll("\\s+", " ")
    (norm, norm.split(" ", -1))
  }

  def compute(text: UTF8String, shingleLen: Int): ArrayData = {
    val (norm, toks) = normTokens(text, shingleLen)
    if (toks.length < shingleLen)
      return new GenericArrayData(Array[Any](UTF8String.fromString(norm)))
    val out = new Array[Any](toks.length - shingleLen + 1)
    val sb = new java.lang.StringBuilder
    var s = 0
    while (s <= toks.length - shingleLen) {
      sb.setLength(0)
      var j = 0
      while (j < shingleLen) {
        if (j > 0) sb.append(' ')
        sb.append(toks(s + j))
        j += 1
      }
      out(s) = UTF8String.fromString(sb.toString)
      s += 1
    }
    new GenericArrayData(out)
  }
}
