package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary: `misra_gries(token, k)` keeps at
  * most `k` (token, counter) pairs and returns them as a
  * `map<string, long>` of estimates.
  *
  * The deterministic-bound twin of the probabilistic [[CmsSketch]]
  * (q95): instead of a hash grid with collision noise, MG maintains k
  * candidate counters with the classic decrement step — every token
  * whose true frequency exceeds N/(k+1) is GUARANTEED present, and
  * every estimate satisfies `true − N/(k+1) ≤ est ≤ true` (Misra &
  * Gries 1982; the merge preserving that bound across arbitrary merge
  * trees is Agarwal et al., "Mergeable Summaries", PODS'12: sum
  * counters pairwise, then subtract the (k+1)-th largest count and
  * drop non-positives). State is ≤ k counters regardless of input
  * size; partial aggregation merges summaries on the executors, so
  * the exchange carries one ≤k-entry map per partition, never token
  * rows — the 100 TB shape.
  *
  * UNLIKE the CMS grid, the surviving counter SET depends on the
  * partitioning/merge order, so a query must not hash the raw summary
  * — q243 gates the deterministic consequences instead (the theorem's
  * guarantees, checked in-band against exact counts — the q21
  * estimate-in-band pattern).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= 65536,
    "misra_gries: k must be in (0, 65536] — the summary must stay " +
      "broadcast-sized, that is its whole point")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a STRING column, got ${child.dataType}")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      buf.get(tok) match {
        case Some(c) => buf.update(tok, c + 1L)
        case None if buf.size < k => buf.update(tok, 1L)
        case None =>
          // decrement-all: drop one unit from every counter (and the
          // incoming token's implicit 1) — the classic MG step
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1L
            if (c <= 0L) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (tok, c) =>
      buf.update(tok, buf.getOrElse(tok, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest counter from everything and
      // drop non-positives — ≤ k survive, bound telescopes (PODS'12)
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - sub
        if (c <= 0L) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic iteration order (sorted by token) so downstream
    // map_keys/explode see a stable order for the SAME summary
    val sorted = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(sorted.map(_._2)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (tok, c) =>
      val b = tok.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
