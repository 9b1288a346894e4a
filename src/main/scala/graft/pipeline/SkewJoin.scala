package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: when one side concentrates on a few
  * hot key values (power-law corpora: language, source, event type),
  * a plain shuffle join sends every hot-key row to one task. Salting
  * splits each hot key into `saltN` sub-keys: the big side scatters by
  * a deterministic salt, the small-but-too-big-to-broadcast side
  * replicates each row across all `saltN` salts, and the join runs on
  * (key, salt) — per-key work now spreads over `saltN` tasks at the
  * cost of replicating the right side `saltN`×.
  *
  * This is the manual fallback for the cases AQE skew-join handling
  * does not catch (AQE only splits the probe side of sort-merge joins
  * whose partitions exceed the skew thresholds; it never replicates a
  * non-broadcastable build side). Results are identical to the
  * unsalted join — the salt is join-plumbing, not semantics — which is
  * exactly what the DuckDB oracle checks.
  */
object SkewJoin {

  /** Inner equi-join of `left` (big, skewed) with `right` (small per
    * key but not broadcastable) on `keyCol`, salted `saltN` ways.
    *
    * @param saltExpr deterministic per-row salt source on the left
    *                 (e.g. a row id); spread = pmod(saltExpr, saltN).
    *                 Deterministic on purpose: reruns and oracle
    *                 comparisons must see identical physics.
    */
  def saltedInner(left: DataFrame, right: DataFrame, keyCol: String,
      saltExpr: Column, saltN: Int): DataFrame = {
    require(saltN > 0, "saltN must be positive")
    // null salt sources fall into salt 0 instead of producing a null
    // join key that would silently drop the row (the contract is
    // "identical results to the unsalted join", nulls included)
    val lb = left.withColumn("__salt",
      pmod(coalesce(saltExpr.cast("long"), lit(0L)), lit(saltN.toLong)))
    val rb = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltN.toLong - 1))))
    // hint away broadcast: the whole point is exercising the salted
    // shuffle path (a broadcast join would make salting a no-op)
    lb.join(rb.hint("shuffle_hash"), Seq(keyCol, "__salt"))
      .drop("__salt")
  }
}
