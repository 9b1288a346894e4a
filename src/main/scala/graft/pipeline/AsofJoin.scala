package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the payload of the
  * LATEST right row with the same key and time at-or-before the left
  * row's time (the time-series enrichment join Spark has no native
  * operator for).
  *
  * Plan shape (the reason to compose it this way): union both sides,
  * one hash shuffle on the key, and a carry-forward window
  * (`last(payload) IGNORE NULLS`) over (time, side) order. No range
  * join, no per-row subquery, no cross product — cost is one sort per
  * key partition, the same as any windowed aggregation, at any scale.
  * Right-side ties on the timestamp resolve deterministically to the
  * greatest tie-break column value.
  */
object AsofJoin {

  /** @param left       probe side
    * @param right      build side carrying `payloadCol`
    * @param keyCol     equi-join key (same name both sides)
    * @param leftTime   left event-time column (numeric, same unit as right)
    * @param rightTime  right event-time column
    * @param payloadCol right column to attach (null when no right row
    *                   at-or-before the left time)
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: Column, rightTime: Column, payloadCol: String): DataFrame = {
    require(!left.columns.contains(payloadCol),
      s"left side already has a column named $payloadCol; " +
        "rename it first — the as-of join attaches the right payload under that name")
    // the payload rides inside a non-null marker struct so a right row
    // whose payload is genuinely NULL still "wins" as the latest match
    // (a bare `last(payload) IGNORE NULLS` would skip it and attach an
    // older row's payload instead)
    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(1))
    val r = right
      .select(col(keyCol), rightTime.as("__t"),
        struct(col(payloadCol).as("p")).as("__pv"))
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // rights sort before lefts at equal time (side 0 < 1) → inclusive
    // at-or-before; equal-time rights tie-break by greatest payload
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t"), col("__side"), col("__pv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u
      .withColumn("__asof", last(col("__pv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn(payloadCol, col("__asof.p"))
      .drop("__pv", "__asof", "__t", "__side")
  }

  /** Forward as-of join: attach to each left row the payload of the
    * EARLIEST right row with the same key and time at-or-after the
    * left row's time (the label-attachment join — "first conversion
    * after exposure"). Mirror of [[backward]]: same union + one key
    * shuffle, the carry window just looks FORWARD (`first(payload)
    * IGNORE NULLS` over `[current, following]`); lefts sort before
    * rights at equal time → inclusive at-or-after, equal-time right
    * ties resolve deterministically to the SMALLEST payload.
    */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: Column, rightTime: Column, payloadCol: String): DataFrame = {
    require(!left.columns.contains(payloadCol),
      s"left side already has a column named $payloadCol; " +
        "rename it first — the as-of join attaches the right payload under that name")
    val l = left
      .withColumn("__t", leftTime)
      .withColumn("__side", lit(0))
    val r = right
      .select(col(keyCol), rightTime.as("__t"),
        struct(col(payloadCol).as("p")).as("__pv"))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t"), col("__side"), col("__pv"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u
      .withColumn("__asof", first(col("__pv"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .withColumn(payloadCol, col("__asof.p"))
      .drop("__pv", "__asof", "__t", "__side")
  }
}
