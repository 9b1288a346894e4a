package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints: md5 each word shingle, sliding
  * window of `window` consecutive hashes, distinct minima — one
  * compiled call per row with an O(n) monotonic-deque sliding minimum,
  * versus O(n × window) interpreted lambda steps for the declarative
  * `transform(sequence, i -> array_min(slice(...)))` formulation
  * (equivalence unit-tested; the q28 oracle checks the result sets).
  */
case class WinnowFps(child: Expression, shingleLen: Int, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a STRING column, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String], shingleLen, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFps$$.MODULE$$.compute($c, $shingleLen, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hexMd5(digest: MessageDigest, s: String): String = {
    digest.reset()
    val d = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def compute(text: UTF8String, shingleLen: Int, window: Int): ArrayData = {
    val sh = WordShingles.compute(text, shingleLen)
    val n = sh.numElements()
    val digest = md5.get()
    val hs = new Array[String](n)
    var i = 0
    while (i < n) {
      hs(i) = hexMd5(digest, sh.getUTF8String(i).toString)
      i += 1
    }
    val out = new java.util.LinkedHashSet[String]()
    if (n <= window) {
      var min = hs(0)
      i = 1
      while (i < n) { if (hs(i).compareTo(min) < 0) min = hs(i); i += 1 }
      out.add(min)
    } else {
      // monotonic deque of candidate-minimum indices
      val deque = new java.util.ArrayDeque[Int]()
      i = 0
      while (i < n) {
        while (!deque.isEmpty && hs(deque.peekLast()).compareTo(hs(i)) >= 0)
          deque.pollLast()
        deque.addLast(i)
        if (deque.peekFirst() <= i - window) deque.pollFirst()
        if (i >= window - 1) out.add(hs(deque.peekFirst()))
        i += 1
      }
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }
}
