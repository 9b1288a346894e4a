package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document text statistics as ONE compiled struct-returning
  * expression: `struct<n_tokens int, avg_tok_len double,
  * stop_ratio double>`.
  *
  * Matches the q14 oracle exactly: normalized text (lower, space-trim,
  * whitespace-collapse), whitespace tokens (trailing empties kept),
  * `avg_tok_len = (len(ntext) - n + 1) / n`, `stop_ratio` = fraction
  * of tokens in the stopword set, both rounded half-up to 6 dp (the
  * SQL `round` rule). Replaces a projection that re-expanded the
  * normalization regex per output column and ran an interpreted
  * `filter` lambda per token.
  */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_stats expects a STRING column, got ${child.dataType}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("avg_tok_len", DoubleType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false)))
  override def prettyName: String = "text_stats"

  @transient private lazy val stopSet = stopwords.toSet

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, classOf[Set[String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextStats$$.MODULE$$.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  private def round6(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  def compute(text: UTF8String, stopSet: Set[String]): InternalRow = {
    val (norm, toks) = WordShingles.normTokens(text, 1)
    val n = toks.length
    var stops = 0
    var i = 0
    while (i < n) {
      if (stopSet.contains(toks(i))) stops += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n,
      round6((norm.length - n + 1).toDouble / n),
      round6(stops.toDouble / n)))
  }
}
