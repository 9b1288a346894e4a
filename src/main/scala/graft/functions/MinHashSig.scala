package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash-signature expression: text → array of `numHashes`
  * hex-digest minima over word `shingleLen`-gram shingles.
  *
  * Semantics are EXACTLY [[graft.pipeline.TextOps]]'s declarative
  * formulation (normalize → tokenize → shingle → per-i
  * `min(md5("i:" + shingle))`), verified equivalent by unit test and
  * by the q17/q18 DuckDB oracles. The point of the native version is
  * the hot path: higher-order lambda functions (`transform` /
  * `array_min`) evaluate interpreted per element — 8 × |shingles|
  * boxed evaluations per row — while this expression runs one compiled
  * JVM function per row inside whole-stage codegen (doGenCode emits a
  * static call, so the surrounding stage stays fused).
  */
case class MinHashSig(child: Expression, numHashes: Int, shingleLen: Int)
    extends UnaryExpression {

  // input must be STRING (checked lazily — the child is unresolved at
  // construction time when built from the function registry)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a STRING column, got ${child.dataType}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], numHashes, shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig$$.MODULE$$.compute($c, $numHashes, $shingleLen)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** One row's signature. Matches the declarative pipeline:
    * `TextOps.norm` (lower/trim/collapse-whitespace), split on single
    * space, word n-grams (whole text when shorter), min md5 per index.
    */
  def compute(text: UTF8String, numHashes: Int, shingleLen: Int): ArrayData = {
    // exact TextOps.norm semantics: SQL trim strips ' ' only (not all
    // whitespace), and SQL split keeps trailing empty tokens
    val lowered = text.toString.toLowerCase(java.util.Locale.ROOT)
    var start = 0
    var end = lowered.length
    while (start < end && lowered.charAt(start) == ' ') start += 1
    while (end > start && lowered.charAt(end - 1) == ' ') end -= 1
    val norm = lowered.substring(start, end).replaceAll("\\s+", " ")
    val toks = norm.split(" ", -1)
    val digest = md5.get()
    val mins = new Array[String](numHashes)

    def consume(shingle: String): Unit = {
      var i = 0
      while (i < numHashes) {
        digest.reset()
        digest.update(String.valueOf(i).getBytes(StandardCharsets.UTF_8))
        digest.update(':'.toByte)
        digest.update(shingle.getBytes(StandardCharsets.UTF_8))
        val h = hex(digest.digest())
        if (mins(i) == null || h.compareTo(mins(i)) < 0) mins(i) = h
        i += 1
      }
    }

    if (toks.length < shingleLen) consume(norm)
    else {
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
        consume(sb.toString)
        s += 1
      }
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }
}
