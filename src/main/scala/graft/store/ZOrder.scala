package graft.store

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding for multi-column data clustering —
  * the layout half of data skipping: [[FileStats]] records per-file
  * min/max bounds, and sorting a rewrite by the interleaved-bit
  * z-value makes those bounds TIGHT on every clustered column at once,
  * so point/range predicates on any of them prune files instead of
  * scanning the table (Delta OPTIMIZE ZORDER / Iceberg sort-order
  * rewrite analog).
  *
  * Pure column arithmetic (fixed-point normalize, shift, mask, sum) —
  * codegen'd, no UDF, no shuffle of its own.
  */
object ZOrder {

  /** Bits kept per column. 16 bits × up to 3 columns stays safely
    * inside a signed 64-bit z-value. */
  val BitsPerCol = 16

  /** Fixed-point normalization of one column into [0, 2^bits):
    * (v − min) / (max − min) scaled, clamped, nulls at the low end —
    * min/max come from a one-row stats pass over the data being
    * rewritten (driver-bounded: two scalars per column). */
  def normalize(c: Column, mn: Double, mx: Double,
      bits: Int = BitsPerCol): Column = {
    val top = (1L << bits) - 1
    if (mx <= mn) lit(0L)
    else {
      val scaled = floor((c.cast("double") - lit(mn)) / lit(mx - mn) * top)
      when(c.isNull, 0L)
        .otherwise(least(greatest(scaled.cast("long"), lit(0L)), lit(top)))
    }
  }

  /** Interleaved-bit Morton value over the normalized columns: bit b
    * of column i lands at position b·n + i, so all columns contribute
    * equally at every granularity of the curve. */
  def interleave(normalized: Seq[Column], bits: Int = BitsPerCol): Column = {
    val n = normalized.size
    require(n > 0 && n * bits <= 62, s"z-order supports up to ${62 / bits} columns")
    val terms = for {
      b <- 0 until bits
      (c, i) <- normalized.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _)
  }

  /** z-value column for `cols` given their (min, max) stats. */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double]): Column =
    interleave(cols.lazyZip(mins).lazyZip(maxs).map(normalize(_, _, _)).toSeq)
}
