package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 32-bit SimHash fingerprint (semantics identical to
  * [[graft.pipeline.NearDup.simhashDeclarative]] and the q19 DuckDB
  * oracle: token hash = first 8 md5 hex chars as uint32, bit b = sign
  * of Σ ±1 votes). One compiled pass per row instead of
  * 32 × |tokens| interpreted lambda steps.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects a STRING column, got ${child.dataType}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String): Long = {
    val (_, toks) = WordShingles.normTokens(text, 1)
    val votes = new Array[Int](32)
    val digest = md5.get()
    var t = 0
    while (t < toks.length) {
      digest.reset()
      val d = digest.digest(toks(t).getBytes(StandardCharsets.UTF_8))
      // first 8 hex chars == first 4 bytes, big-endian, as uint32
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
