package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise mean of fixed-dimension vectors — the custom
  * `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §7.4): partial sums
  * merge associatively across partitions (map-side combine), so
  * averaging a 100 TB embedding column shuffles one (dim+1)-sized
  * buffer per partition per group, not the vectors.
  */
object VectorMean extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val (sum, n) = b
    if (sum.isEmpty) (v.toArray, n + 1)
    else {
      var i = 0
      while (i < sum.length && i < v.length) { sum(i) += v(i); i += 1 }
      (sum, n + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length && i < b._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0L) Seq.empty
    else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
