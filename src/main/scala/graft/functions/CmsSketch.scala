package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch aggregate: `cms_sketch(token, depth, width)` folds
  * a string column into a `depth × width` counter grid and returns it
  * as one `array<long>` of `depth * width` cells (row-major). The
  * point estimate for a token is `min_j cells[j * width + h_j(token)]`
  * — never an underestimate, over by at most the collision mass in its
  * lightest cell.
  *
  * This is the frequency twin of the HLL-distinct path (q21): the
  * 100 TB way to ask "how often does each of these tokens appear"
  * without keeping a counter per distinct token. State is a FIXED
  * `depth * width * 8` bytes regardless of input size; partial
  * aggregation merges sketches cell-wise on the executors, so the
  * exchange carries one grid per partition, never token rows.
  *
  * Hash family: `h_j(tok) = int(hex(md5("j:tok"))[0:8], 16) % width` —
  * the same md5-prefix construction the q43/q62/q34 oracles use, so a
  * probe is expressible declaratively (Spark `conv(substring(md5(...`
  * / DuckDB `('0x' || substr(md5(...)`) and the whole sketch is
  * bit-deterministic: updates are commutative (+1 per cell) and merges
  * are cell-wise sums, so any partitioning / merge order yields the
  * identical grid — which is what lets q95 HASH the estimates against
  * a DuckDB reconstruction instead of merely banding them.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth > 0 && width > 0, "cms_sketch: depth and width must be positive")
  require(depth.toLong * width <= (1 << 22),
    "cms_sketch: grid larger than 4M cells — the sketch would dwarf " +
      "an exact per-token aggregate; shrink depth/width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a STRING column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < depth) {
        buf(j * width + CmsSketch.cell(j, tok, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

object CmsSketch {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** `h_j(tok)`: first 8 md5-hex chars of "j:tok" as an unsigned int,
    * mod width — identical to the declarative
    * `conv(substring(md5(concat(j, ':', tok)), 1, 8), 16, 10) % width`.
    */
  def cell(j: Int, tok: String, width: Int): Int = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s"$j:$tok".getBytes(StandardCharsets.UTF_8))
    // first 4 bytes = first 8 hex chars; build the value directly
    var v = 0L
    var i = 0
    while (i < 4) {
      v = (v << 8) | (bytes(i) & 0xffL)
      i += 1
    }
    (v % width).toInt
  }

  /** Hex digest helper kept for tests mirroring the declarative form. */
  def hex8(s: String): String = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](8)
    var i = 0
    while (i < 4) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
