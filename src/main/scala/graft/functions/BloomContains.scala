package graft.functions

import java.io.ByteArrayInputStream
import java.util.Base64

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains(filterB64, value)` — membership probe of a STRING
  * value against a serialized spark-sketch [[BloomFilter]].
  *
  * The left argument must be a FOLDABLE string: the base64 of
  * `BloomFilter.writeTo` bytes, built once on the small side (e.g. the
  * eval-set shingles of a decontamination pass, q104) and embedded in
  * the plan. The filter is deserialized once per expression instance
  * (lazily, on first eval / codegen reference), then each probe is a
  * handful of hash + bit tests — no join, no shuffle, no per-row
  * allocation beyond the UTF8String→String bridge the sketch API
  * requires.
  *
  * Probe-side semantics match `BloomFilter.putString`, so a filter
  * built with `putString` (or `DataFrame.stat.bloomFilter` over a
  * string column) answers `mightContainString` consistently:
  * guaranteed no false negatives, false positives at the configured
  * fpp. Codegen emits a static reference via `addReferenceObj`, so the
  * probe stays inside whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (STRING, STRING), got " +
          s"(${left.dataType}, ${right.dataType})")
    } else if (!left.foldable) {
      TypeCheckResult.TypeCheckFailure(
        "bloom_contains: the serialized filter must be a foldable string " +
          "(a base64 literal), not a per-row column")
    } else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  // One deserialization per expression instance; the sketch itself is
  // read-only afterwards, so sharing across rows (and, via the codegen
  // reference array, across the generated class) is safe.
  @transient private lazy val filter: BloomFilter = {
    val b64 = left.eval(null)
    require(b64 != null, "bloom_contains: filter literal is null")
    BloomFilter.readFrom(new ByteArrayInputStream(
      Base64.getDecoder.decode(b64.asInstanceOf[UTF8String].toString)))
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    filter.mightContainString(r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, r) =>
      s"${ev.value} = $ref.mightContainString($r.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
