package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 build: turn a change stream
  * (key, time, attrs…) into versioned rows with half-open validity
  * intervals `[valid_from, valid_to)` and an `is_current` flag — the
  * dimension-table shape a temporal ("FOR SYSTEM_TIME AS OF") join
  * consumes.
  *
  * Plan shape: one hash shuffle on the key and a `lead()` window per
  * key partition. The per-key sort is bounded by that key's version
  * count (dimension churn, not fact volume), so the window never sees
  * an unbounded stream — the same bounded-per-partition-sort argument
  * the sessionizer (q42) and transition matrix (q113) pin.
  *
  * Change times must be unique per key for the intervals to be well
  * defined; callers with potentially colliding times collapse them
  * first (one partial-agg `groupBy(key, time)` — see q127, which keeps
  * the greatest attr, matching [[AsofJoin.backward]]'s tie-break).
  */
object Scd2 {

  /** @param changes change stream, one row per dimension change
    * @param keyCol  dimension key column name
    * @param timeCol change-time column (numeric; ns-epoch in this repo)
    * @param attrs   attribute columns to carry on each version
    */
  def build(changes: DataFrame, keyCol: String, timeCol: String,
      attrs: Seq[String]): DataFrame = {
    val reserved = Seq("valid_from", "valid_to", "is_current")
    reserved.foreach(r => require(!changes.columns.contains(r),
      s"input already has a column named $r; rename it first — " +
        "the SCD2 build attaches its interval columns under that name"))
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol))
    changes
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol) +: attrs.map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current"): _*)
  }

  /** Temporal (point-in-time) join: attach to each fact row the
    * dimension version valid at the fact's time — Flink's temporal
    * table join (`FOR SYSTEM_TIME AS OF f.t`), the join a star schema
    * needs when dimensions change under the fact stream.
    *
    * NOT planned as an interval join (valid_from <= t < valid_to would
    * range-join every fact against every version of its key): because
    * SCD2 intervals partition each key's timeline, "the version whose
    * interval contains t" IS "the latest change at-or-before t", so
    * this delegates to [[AsofJoin.backward]] — one union, one key
    * shuffle, one carry-forward window, at any scale. q128's oracle
    * verifies the equivalence by computing the interval form in SQL.
    */
  def temporalJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
      factTime: Column, dimTime: Column, attrCol: String): DataFrame =
    AsofJoin.backward(facts, dim, keyCol, factTime, dimTime, attrCol)
}
