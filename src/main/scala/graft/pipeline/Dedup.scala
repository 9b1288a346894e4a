package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators over a document corpus.
  *
  * Scale design: every variant is a single hash-shuffle on a
  * fingerprint/bucket key with map-side partial aggregation — never a
  * window over the full corpus, never an all-pairs product. At 100 TB
  * the shuffle volume is O(corpus) and AQE handles skewed buckets.
  */
object Dedup {

  /** Exact dedup: one survivor (smallest id) per normalized-text
    * fingerprint. `groupBy(fp).agg(min(id))` rather than a
    * `row_number` window: partial aggregation halves the shuffle and
    * there is no per-key sort.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", TextOps.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol))

  /** Survivor rows (not just ids): exact dedup keeping the full
    * smallest-id document per fingerprint via max_by-style aggregation
    * (min_by gets partial aggregation before the shuffle, unlike the
    * row_number-window formulation).
    */
  def exactRows(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withFp = docs.withColumn("fp", TextOps.fingerprint(col(textCol)))
    val picked = withFp.groupBy("fp")
      .agg(min_by(struct(docs.columns.toSeq.map(col): _*), col(idCol)).as("doc"))
    picked.select("doc.*")
  }
}
