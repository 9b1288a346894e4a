package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact ranking analytics.
  *
  * `NTILE(k) OVER (PARTITION BY segment ORDER BY v)` is a scale trap
  * when the partition key is low-cardinality: Spark plans one window
  * partition per segment, so each segment's ENTIRE history sorts in a
  * single task — at 100 TB with 5 market segments that is five 20 TB
  * sorts. [[ntileExact]] produces the identical answer with the
  * distributed-ranking formulation instead:
  *
  *  1. approximate per-group range boundaries (`approx_percentile`,
  *     a partial agg) — these only BALANCE work; exactness never
  *     depends on them;
  *  2. every row gets a range-bucket scan-side by comparing against
  *     the broadcast boundaries (monotone in the order value, so
  *     bucket b's rows all order before bucket b+1's);
  *  3. per-(group, bucket) counts — a bounded |groups|·|buckets|
  *     collect — turn into exact cumulative offsets on the driver;
  *  4. local `row_number` windows partitioned by (group, bucket) —
  *     parallelism |groups|·|buckets|, each task sorts ~1/|buckets|
  *     of a group — plus the broadcast offset give the exact global
  *     rank, and SQL's NTILE bucket formula assigns the tile
  *     scan-side.
  *
  * Requires bounded group cardinality (the driver holds
  * |groups|·|buckets| longs — the same precondition NTILE's
  * PARTITION BY already implies) and non-null groups (checked
  * loudly). Null order values fall into bucket 0 and sort
  * nulls-first within it — exactly the built-in window's default
  * null placement. `rangeSplits` scales with data volume; the
  * default 32 caps any single sort task at roughly group/32.
  *
  * Determinism contract: steps 3 and 4 are separate jobs over the
  * same input — exactness needs both to see IDENTICAL rows. By
  * default (`reuse=true`) the bucketed frame is persisted
  * (MEMORY_AND_DISK) at the count job and the rank job reads the
  * materialized copy, which guarantees agreement for any input and
  * halves the scans; the cache is LRU-evictable and small relative
  * to a shuffle of the same data. Pass `reuse=false` for one-shot
  * jobs over data too large to materialize — then the input must be
  * DETERMINISTIC (immutable files, no nondeterministic expressions
  * upstream), or the offsets can disagree with the ranked rows and
  * produce silently wrong tiles. (The step-1 boundary probe is
  * exempt either way: boundary drift only skews bucket sizes.)
  */
object Rank {

  /** Exact integer division a/b for non-negative longs (b > 0),
    * expressed so the double intermediate is always an exact
    * multiple — safe for any count below 2^52. */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** @param groupCol NTILE's PARTITION BY key (bounded cardinality)
    * @param valueCol numeric ORDER BY column
    * @param tieCol   unique tie-break column completing the total order
    * @param k        number of tiles
    * @return input columns + `ntile` (1..k), identical to
    *         `ntile(k) OVER (PARTITION BY group ORDER BY value, tie)`
    */
  def ntileExact(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, k: Int, rangeSplits: Int = 32,
      reuse: Boolean = true): DataFrame = {
    require(k > 0 && rangeSplits > 0,
      s"need k>0, rangeSplits>0; got k=$k rangeSplits=$rangeSplits")
    val reserved =
      Seq("__g", "__b", "__lr", "ntile").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"ntileExact: input carries reserved column(s) " +
        s"${reserved.mkString(", ")} — rename them first (withColumn " +
        "would silently overwrite)")
    val g = col(groupCol).cast("string")
    val v = col(valueCol).cast("double")

    // 1. boundary probe: (rangeSplits-1) approximate quantiles per
    //    group. Accuracy only affects balance, never the answer.
    // accuracy 100 on purpose: boundary error only skews bucket SIZES
    // (work balance), never the answer — the cheap sketch beats a
    // tight one that scans-and-merges 100× the state. rangeSplits=1
    // means no boundaries at all (single bucket per group — the
    // degenerate-but-correct case), so the probe job is skipped
    // entirely: empty-input and null-group checking fall through to
    // the step-3 count collect, which enumerates the same groups
    val probs = (1 until rangeSplits).map(i => i.toDouble / rangeSplits)
    val boundsOpt: Option[Map[String, Seq[Double]]] =
      if (probs.isEmpty) None
      else {
        val bRows = df.groupBy(g.as("__g"))
          .agg(expr(s"approx_percentile(cast($valueCol as double), " +
            s"array(${probs.mkString(",")}), 100)").as("__bs"))
          .collect()
        require(bRows.forall(!_.isNullAt(0)),
          s"ntileExact: null $groupCol in input — coalesce to a sentinel first")
        Some(bRows.map { r =>
          // an all-null value column yields a null quantile array;
          // treat as a single bucket (bucket 0 holds the whole group)
          r.getString(0) -> Option(r.getSeq[Double](1)).getOrElse(Seq.empty)
        }.toMap)
      }

    // 2. scan-side bucket: #boundaries <= value (monotone in value,
    //    ties at a boundary all land together); with no boundaries
    //    every row is bucket 0
    val bucket = boundsOpt match {
      case None => lit(0)
      case Some(bounds) => aggregate(element_at(typedlit(bounds), g), lit(0),
        (acc, b) => acc + when(v >= b, 1).otherwise(0))
    }
    val withB0 = df.withColumn("__g", g).withColumn("__b", bucket)
    // materialize once: the count collect below builds the cache, the
    // rank job reads it — identical rows for both (see scaladoc), one
    // input scan instead of two
    val withB = if (reuse)
      withB0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else withB0

    // 3. exact per-bucket counts -> cumulative offsets (driver-side,
    //    bounded by |groups|·|buckets|)
    val cnt = withB.groupBy(col("__g"), col("__b"))
      .agg(count(lit(1)).as("c")).collect()
    if (cnt.isEmpty) {
      if (reuse) withB.unpersist()
      return df.withColumn("ntile", lit(null).cast("long")).where(lit(false))
    }
    require(cnt.forall(!_.isNullAt(0)),
      s"ntileExact: null $groupCol in input — coalesce to a sentinel first")
    val perGroup: Map[String, Seq[Long]] = cnt.groupBy(_.getString(0))
      .map { case (gk, rows) =>
        val byB = rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
        gk -> (0 until rangeSplits).map(b => byB.getOrElse(b, 0L))
      }
    val offMap: Map[String, Seq[Long]] =
      perGroup.map { case (gk, cs) => gk -> cs.scanLeft(0L)(_ + _).dropRight(1) }
    val nMap: Map[String, Long] = perGroup.map { case (gk, cs) => gk -> cs.sum }

    // 4. exact global rank = broadcast offset + local rank, then the
    //    SQL NTILE formula: first (n mod k) tiles hold ceil(n/k) rows.
    //    The rank is materialized as ONE column first so the plan
    //    carries a single row_number window expression, not one per
    //    reference in the tile arithmetic
    val lr = row_number().over(
      Window.partitionBy(col("__g"), col("__b"))
        .orderBy(col(valueCol), col(tieCol)))
    val ranked = withB.withColumn("__lr", lr)
    val r0 = element_at(element_at(typedlit(offMap), col("__g")),
      col("__b") + 1) + col("__lr").cast("long") - 1L // 0-based global rank
    val n = element_at(typedlit(nMap), col("__g"))
    val kL = lit(k.toLong)
    val rem = pmod(n, kL)
    val q = idiv(n - rem, kL)
    val cutoff = rem * (q + 1L)
    // greatest(q,1): when q=0 the otherwise-branch is unreachable
    // (cutoff=n), but its divisor must still be non-zero under ANSI
    val tile = when(r0 < cutoff, idiv(r0, q + 1L) + 1L)
      .otherwise(idiv(r0 - cutoff, greatest(q, lit(1L))) + rem + 1L)

    ranked.withColumn("ntile", tile)
      .drop("__g", "__b", "__lr")
  }
}
