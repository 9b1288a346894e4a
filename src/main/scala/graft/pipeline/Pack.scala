package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate the corpus in a
  * deterministic document order and split it into fixed-capacity
  * context windows ("concat-and-chunk"), accounting exactly for
  * documents that straddle a chunk boundary.
  *
  * The hard part at 100 TB is the GLOBAL running offset: a naive
  * `sum().over(Window.orderBy(id))` is an unpartitioned window — every
  * row through one task. Instead [[withGlobalOffset]] runs a
  * two-level prefix sum keyed by fixed-width id blocks:
  *
  *   1. per-block totals: `groupBy(id div B)` — partial-agg shuffle,
  *      output is |corpus|/B rows;
  *   2. block prefix: running sum over the (tiny) block-totals table —
  *      the only ordered window, over |corpus|/B rows, broadcast back;
  *   3. within-block running sum: window PARTITIONED by block —
  *      partition-local, bounded by block width, no global sort.
  *
  * Block boundaries come from the data (id ranges), not from the
  * physical partitioning, so the result is deterministic under any
  * layout — which also makes it oracle-checkable against a plain
  * windowed cumsum in DuckDB.
  *
  * The block-totals branch re-reads the input with columns pruned to
  * (id, value) — a second, much narrower scan. If the input is an
  * expensive derivation rather than a table scan, persist it upstream
  * before calling in here.
  */
object Pack {

  /** Adds `__start` = exclusive prefix sum of `valueCol` in ascending
    * `idCol` order (ids must be unique and non-negative: `div`
    * truncates toward zero, so negative ids would land blocks out of
    * order).
    *
    * The block-prefix table has one row per OCCUPIED id block — for
    * dense ids that is |corpus|/blockWidth; for a sparse id space size
    * blockWidth to the id RANGE (range/blockWidth blocks), since empty
    * blocks cost nothing but the table must stay broadcastable.
    */
  def withGlobalOffset(df: DataFrame, idCol: String, valueCol: String,
      blockWidth: Long = 1000000L): DataFrame = {
    require(blockWidth > 0, "blockWidth must be positive")
    val blk = expr(s"cast($idCol as long) div ${blockWidth}L")
    val withBlk = df.withColumn("__blk", blk)
    val totals = withBlk.groupBy("__blk")
      .agg(sum(col(valueCol).cast("long")).as("__tot"))
    // the one ordered window, over |corpus|/blockWidth rows only
    val wPrefix = Window.orderBy("__blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = totals
      .withColumn("__blkoff", coalesce(sum("__tot").over(wPrefix), lit(0L)))
      .select("__blk", "__blkoff")
    val wLocal = Window.partitionBy("__blk").orderBy(idCol)
    withBlk
      .join(broadcast(prefixes), "__blk")
      .withColumn("__start",
        col("__blkoff")
          + sum(col(valueCol).cast("long")).over(wLocal)
          - col(valueCol).cast("long"))
      .drop("__blk", "__blkoff")
  }

  /** Grouped variant of [[withGlobalOffset]]: adds `__start` = exclusive
    * prefix sum of `valueCol` WITHIN each `groupCol` value, in ascending
    * (`ordCol`, `idCol`) order — the running-budget primitive behind
    * per-source token-budget selection (q93).
    *
    * Same two-level shape, keyed by (group, block): block boundaries cut
    * the `ordCol` VALUE range (`ordCol div blockWidth`), so they are
    * data-determined and layout-independent. The only ordered window
    * runs over the (group × occupied-block) totals — |groups| ·
    * (ordRange/blockWidth) rows, partitioned by group — and the per-row
    * cumsum window is partitioned by (group, block). Nothing is ordered
    * across a whole group, so one giant source can't serialize into a
    * single task the way a plain `PARTITION BY group ORDER BY ord`
    * window would.
    *
    * `ordCol` must be numeric and non-negative (div truncates toward
    * zero — negatives would land blocks out of order); (`ordCol`,
    * `idCol`) must be unique per group for a deterministic order.
    */
  def withGroupedOffset(df: DataFrame, groupCol: String, ordCol: Column,
      idCol: String, valueCol: String, blockWidth: Long): DataFrame = {
    require(blockWidth > 0, "blockWidth must be positive")
    val reserved = Seq("__ord", "__blk", "__blkoff", "__start")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input column $c collides with a reserved working column"))
    val withBlk = df
      .withColumn("__ord", ordCol.cast("long"))
      .withColumn("__blk", expr(s"__ord div ${blockWidth}L"))
    val totals = withBlk.groupBy(groupCol, "__blk")
      .agg(sum(col(valueCol).cast("long")).as("__tot"))
    // the one ordered window: per group over its occupied blocks only
    val wPrefix = Window.partitionBy(groupCol).orderBy("__blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = totals
      .withColumn("__blkoff", coalesce(sum("__tot").over(wPrefix), lit(0L)))
      .select(col(groupCol), col("__blk"), col("__blkoff"))
    val wLocal = Window.partitionBy(groupCol, "__blk")
      .orderBy(col("__ord"), col(idCol))
    withBlk
      .join(broadcast(prefixes), Seq(groupCol, "__blk"))
      .withColumn("__start",
        col("__blkoff")
          + sum(col(valueCol).cast("long")).over(wLocal)
          - col(valueCol).cast("long"))
      .drop("__ord", "__blk", "__blkoff")
  }

  /** Packs documents into fixed-`capacity` token chunks: output one row
    * per (document, chunk) occupancy — `chunk_id` and `n_tok`, the
    * number of this document's tokens landing in that chunk. A document
    * longer than the remaining room straddles into the next chunk(s);
    * Σ n_tok per doc = its token count, Σ n_tok per chunk = capacity
    * (except the final chunk).
    *
    * Chunk expansion is a per-row `sequence` + `explode` — a document
    * spans ceil(len/capacity)+1 chunks at most, so the explode factor
    * is ~1 for any realistic capacity.
    */
  def concatChunks(docs: DataFrame, idCol: String, tokCountCol: String,
      capacity: Long, blockWidth: Long = 1000000L): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val n = col(tokCountCol).cast("long")
    withGlobalOffset(docs, idCol, tokCountCol, blockWidth)
      .withColumn("__end", col("__start") + n)
      .withColumn("__c0", expr(s"__start div ${capacity}L"))
      .withColumn("__c1", expr(s"(__end - 1) div ${capacity}L"))
      .where(n > 0)
      .select(col(idCol), n.as("__n"), col("__start"), col("__end"),
        explode(sequence(col("__c0"), col("__c1"))).as("chunk_id"))
      .withColumn("n_tok",
        least(col("__end"), (col("chunk_id") + 1) * capacity)
          - greatest(col("__start"), col("chunk_id") * capacity))
      .select(col(idCol), col("chunk_id"), col("n_tok"))
  }
}
