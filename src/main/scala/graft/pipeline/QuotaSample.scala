package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic bottom-k-per-group selection with a PER-GROUP k —
  * the selection engine under quota sampling (q213): each group keeps
  * its `k` smallest documents by (md5(id), id), the seedless uniform
  * draw (q118/q141's idiom).
  *
  * The naive lowering — `row_number() OVER (PARTITION BY group ORDER
  * BY md5, id) <= k` — sorts EVERY group in full: with a handful of
  * giant groups (languages, crawl domains) that is a skewed global
  * sort of the corpus. Instead, q129's histogram prune applied to
  * hash space: (1) one partial-agg pass counts rows per (group,
  * 2-hex-digit md5 prefix) — a ≤ |groups|·256-row aggregate
  * regardless of corpus size; (2) a cumulative sum over that bounded
  * table locates each group's BOUNDARY bucket (the prefix bucket
  * containing the k-th element) and the count before it; (3) rows in
  * earlier buckets are selected by a scan-side broadcast filter —
  * no sort at all; (4) the exact row_number runs only on the boundary
  * bucket's rows, ~1/256 of each group. Selection is identical to the
  * naive window by construction (prefix order is a prefix of full-md5
  * order), which the q213 oracle asserts wholesale and
  * QuotaSampleSpec property-tests on random corpora.
  */
object QuotaSample {

  /** @param df       input rows
    * @param groupCol group key (bounded cardinality)
    * @param idCol    unique id per row within a group
    * @param ks       per-group k as (groupCol, __k) — groups absent
    *                 here are dropped; k may exceed a group's size
    *                 (the whole group is then kept)
    * @return (groupCol, idCol) of the selected rows
    */
  def bottomKByHash(df: DataFrame, groupCol: String, idCol: String,
      ks: DataFrame): DataFrame = {
    val base = df.select(col(groupCol), col(idCol),
      md5(col(idCol).cast("string")).as("__h"))
      .withColumn("__b", substring(col("__h"), 1, 2))
    val hist = base.groupBy(groupCol, "__b").agg(count(lit(1)).as("__c"))
    val wcum = Window.partitionBy(groupCol).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__cum", sum("__c").over(wcum))
      .join(ks, groupCol)
    // the boundary bucket: first prefix whose cumulative count covers
    // k (min over (bucket, prior) pairs — cum is monotone in bucket).
    // A group smaller than its k has no covering bucket; treat its
    // LAST bucket as the boundary (rn <= k - prior keeps the rest).
    val covering = cum.where(col("__cum") >= col("__k"))
      .groupBy(groupCol)
      .agg(min(struct(col("__b"), (col("__cum") - col("__c")).as("__p")))
        .as("__m"))
    val fallback = cum.groupBy(groupCol)
      .agg(max(struct(col("__b"), (col("__cum") - col("__c")).as("__p")))
        .as("__m"))
    val cut = fallback.join(covering
        .select(col(groupCol), col("__m").as("__mc")), Seq(groupCol), "left")
      .select(col(groupCol),
        coalesce(col("__mc.__b"), col("__m.__b")).as("__bstar"),
        coalesce(col("__mc.__p"), col("__m.__p")).as("__prior"))
    val tagged = base
      .join(broadcast(cut), groupCol)
      .join(broadcast(ks), groupCol)
    val before = tagged.where(col("__b") < col("__bstar"))
      .select(col(groupCol), col(idCol))
    val wb = Window.partitionBy(groupCol).orderBy(col("__h"), col(idCol))
    val boundary = tagged.where(col("__b") === col("__bstar"))
      .withColumn("__rn", row_number().over(wb))
      .where(col("__rn") <= col("__k") - col("__prior"))
      .select(col(groupCol), col(idCol))
    before.unionByName(boundary)
  }

  /** FULL per-group rank by (md5(id), id) — `row_number() OVER
    * (PARTITION BY group ORDER BY md5(id), id)` computed two-level:
    * the same ≤ |groups|·256 prefix histogram yields each bucket's
    * EXCLUSIVE offset (cumsum − count); the window then partitions by
    * (group, bucket) — 256× the parallelism of the naive per-group
    * window, so a 4-language corpus ranks on ~1024 balanced sort
    * tasks instead of 4 skewed ones — and the global rank is offset +
    * within-bucket row_number (prefix order is a prefix of full-md5
    * order, so the two levels compose exactly).
    *
    * @return (groupCol, idCol, rank) — rank 1-based within group
    */
  def rankByHash(df: DataFrame, groupCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(idCol),
      md5(col(idCol).cast("string")).as("__h"))
      .withColumn("__b", substring(col("__h"), 1, 2))
    val wcum = Window.partitionBy(groupCol).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = base.groupBy(groupCol, "__b")
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", sum("__c").over(wcum) - col("__c"))
      .select(col(groupCol), col("__b"), col("__off"))
    val wb = Window.partitionBy(groupCol, "__b")
      .orderBy(col("__h"), col(idCol))
    base.join(broadcast(offsets), Seq(groupCol, "__b"))
      .withColumn("rank",
        (col("__off") + row_number().over(wb)).cast("long"))
      .select(col(groupCol), col(idCol), col("rank"))
  }
}
