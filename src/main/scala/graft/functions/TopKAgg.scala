package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native bounded top-k aggregate: `top_k(score, id, k)` keeps the k
  * best (score DESC, id ASC — fully deterministic, ties never depend
  * on arrival order) `(score, id)` pairs per group and returns them as
  * a sorted `array<struct<score, id>>`.
  *
  * This is the top-k-per-group operator Spark lacks natively (the
  * ClickHouse `topK` / Druid TopN role). The idiomatic alternatives
  * both have a scale flaw: `row_number() OVER (PARTITION BY g)` sorts
  * every group's FULL row set (one skewed source = one giant sorted
  * partition), and `slice(sort_array(collect_list(...)))` buffers
  * unbounded state before truncating. Here state is k pairs — 16·k
  * bytes — at every point: partial aggregation trims on the
  * executors, the exchange carries at most k pairs per (partition,
  * group), and merges are k-way list merges. The skewed-group cost
  * collapses from sort(n) to n·O(log k)-ish insertion over a k-array.
  *
  * Plans under hash aggregation (ObjectHashAggregate) with map-side
  * partials like any built-in; q140 gates it against the window
  * formulation in DuckDB, TopKAggSpec proves arrival/partitioning
  * invariance.
  */
case class TopKAgg(
    left: Expression, // score
    right: Expression, // id
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buf] with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 16),
    s"top_k: k must be in [1, 65536], got $k — beyond that an exact " +
      "sort is the honest plan")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k expects (BIGINT score, BIGINT id), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): TopKAgg.Buf = new TopKAgg.Buf(k)

  override def update(buf: TopKAgg.Buf, input: InternalRow): TopKAgg.Buf = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAgg.Buf, other: TopKAgg.Buf): TopKAgg.Buf = {
    var j = 0
    while (j < other.size) {
      buf.offer(other.score(j), other.id(j))
      j += 1
    }
    buf
  }

  override def eval(buf: TopKAgg.Buf): Any = {
    val rows = new Array[Any](buf.size)
    var j = 0
    while (j < buf.size) {
      rows(j) = new GenericInternalRow(
        Array[Any](buf.score(j), buf.id(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) {
      bb.putLong(buf.score(j)); bb.putLong(buf.id(j))
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buf(k)
    var j = 0
    while (j < n) {
      buf.offer(bb.getLong, bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {

  /** Sorted bounded buffer of (score, id) pairs, best-first under
    * (score DESC, id ASC). Insertion keeps order (O(k) shift — k is
    * small by contract); a candidate worse than the current k-th is
    * rejected in O(log k) without shifting anything.
    */
  final class Buf(k: Int) {
    private val scores = new Array[Long](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n
    def score(j: Int): Long = scores(j)
    def id(j: Int): Long = ids(j)

    private def beats(s: Long, i: Long, j: Int): Boolean =
      s > scores(j) || (s == scores(j) && i < ids(j))

    def offer(s: Long, i: Long): Unit = {
      if (n == k && !beats(s, i, n - 1)) return
      // binary search for the insertion point (first slot this pair beats)
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (beats(s, i, mid)) hi = mid else lo = mid + 1
      }
      val insert = lo
      val last = math.min(n, k - 1)
      var j = last
      while (j > insert) {
        scores(j) = scores(j - 1); ids(j) = ids(j - 1)
        j -= 1
      }
      scores(insert) = s
      ids(insert) = i
      if (n < k) n += 1
    }
  }
}
