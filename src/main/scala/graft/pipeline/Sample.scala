package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and ordering operators for training-data
  * assembly. Everything keys off md5 of the row id — reproducible
  * across engines (DuckDB oracle recomputes it) and across runs, the
  * property a curation pipeline needs for auditable corpus builds
  * (`rand()` is neither).
  */
object Sample {

  /** Exact per-group top-k sample: the k rows of each group with the
    * smallest md5(salt-prefixed id) — a uniform, reproducible k-row
    * draw per group.
    *
    * Scale design: groups (lang, source, …) are few, so a single
    * `Window.partitionBy(group)` would funnel the whole corpus
    * through |groups| partitions. Instead, two-level top-k: rank
    * within (group, subpartition-of-id) — `splits`-way parallel —
    * keep k each, then rank the ≤ k·splits survivors per group.
    * Identical answer (a group's global top-k is contained in the
    * union of its per-split top-ks), shuffle bounded by k·splits per
    * group after the first (parallel) window.
    *
    * @return groupCol, smp_rank (1..k), idCol
    */
  def stratifiedTopK(df: DataFrame, groupCol: String, idCol: String,
      k: Int, seed: String = "smp", splits: Int = 8): DataFrame = {
    require(k > 0 && splits > 0, s"need k>0, splits>0; got k=$k splits=$splits")
    val hashed = df.select(col(groupCol), col(idCol),
      md5(concat(lit(seed + ":"), col(idCol).cast("string"))).as("__h"))
    // split off the md5 (not the id): type-independent — a string id
    // cast to long would be null for every row, silently collapsing
    // the two-level window back into the bare-group partitioning
    val local = hashed
      .withColumn("__split", pmod(
        expr("cast(conv(substring(__h, 1, 8), 16, 10) as bigint)"),
        lit(splits.toLong)))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(groupCol), col("__split"))
          .orderBy(col("__h"), col(idCol))))
      .where(col("__r") <= k)
    local
      .withColumn("smp_rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("__h"), col(idCol))).cast("long"))
      .where(col("smp_rank") <= k)
      .select(col(groupCol), col("smp_rank"), col(idCol))
  }

  /** Deterministic global shuffle for training order: every row is
    * assigned a shard (stable hash of its id) and a position within
    * the shard (rank of the full hash). Reading shards in order
    * yields a reproducible pseudo-random permutation of the corpus.
    *
    * Scale design: the only exchange is the hash partition by shard;
    * the within-shard sort runs shard-local. Shard count scales with
    * the cluster (corpus-size / target-partition-size), so no single
    * task ever sorts more than one shard.
    *
    * @return idCol, shard (0..shards-1), pos (1..|shard|)
    */
  def globalShuffle(df: DataFrame, idCol: String, shards: Int,
      seed: String = "shuf"): DataFrame = {
    require(shards > 0, s"need shards>0, got $shards")
    df.select(col(idCol),
        md5(concat(lit(seed + ":"), col(idCol).cast("string"))).as("__h"))
      .withColumn("shard", expr(
        s"pmod(cast(conv(substring(__h, 1, 8), 16, 10) as bigint), $shards)"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__h"), col(idCol))).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
