package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows matched to right rows sharing a
  * key with the right timestamp inside a bounded window after the left
  * timestamp — `r.time ∈ [l.time, l.time + gap)`. The time-series
  * co-occurrence operator (Spark has no native range-join strategy; a
  * naive join on key + BETWEEN plans the time predicate as a post-join
  * filter over the per-key cross product — quadratic in per-key row
  * count, a scale-killer on hot keys).
  *
  * Scale design: time bucketing at the window width. A right row at
  * time r can only match left rows in time buckets `r div gap` and
  * `r div gap - 1` (the window spans at most two buckets), so the
  * right side is replicated into exactly those two buckets and the
  * join runs on (key, bucket) equality with the exact window predicate
  * as a residual filter. Shuffle volume is |L| + 2|R|; per-task work
  * is bucket-local (rows near each other in time), not per-key-global.
  * Each (l, r) pair meets in exactly one bucket — l lives in one
  * bucket and r's two copies land in different buckets — so no
  * post-join dedup is needed.
  */
object RangeJoin {

  /** Inner range join on `keyCol` equality with
    * `rightTime ∈ [leftTime, leftTime + gap)`.
    *
    * Left/right time columns must be the same epoch unit (callers pick
    * it; `gap` is in that unit). Column name collisions are the
    * caller's responsibility — pre-select and alias as needed.
    */
  def inner(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, gap: Long): DataFrame = {
    require(gap > 0, "gap must be positive")
    val lb = left.withColumn("__bkt",
      expr(s"$leftTimeCol div ${gap}L"))
    // right copy in its own bucket and the one before: covers every
    // left bucket whose window [l, l+gap) can contain rightTime
    val rb = right.withColumn("__bkt",
      explode(array(expr(s"$rightTimeCol div ${gap}L"),
        expr(s"$rightTimeCol div ${gap}L - 1"))))
    lb.join(rb, Seq(keyCol, "__bkt"))
      .where(col(rightTimeCol) >= col(leftTimeCol)
        && col(rightTimeCol) < col(leftTimeCol) + gap)
      .drop("__bkt")
  }
}
