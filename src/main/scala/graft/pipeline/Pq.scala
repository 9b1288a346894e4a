package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., PAMI'11) — the memory-compression
  * layer of large-scale ANN: each vector splits into `nSub` contiguous
  * subvectors, each subspace trains its own small k-means codebook, and
  * a vector is stored as `nSub` single-byte codes. Search runs as
  * ASYMMETRIC DISTANCE COMPUTATION (ADC): a query computes one
  * (subspace × codeword) distance table against the codebooks, and every
  * corpus vector's distance is a sum of `nSub` table lookups — no float
  * vector is ever touched at query time.
  *
  * Scale design: codebooks are `nSub·k` rows — always broadcast (the
  * [[AnnIvf]] centroid contract); training assignment is a broadcast
  * fanout collapsed by a map-side `min_by` partial agg, so each Lloyd
  * round shuffles one row per (vector, subspace); per-round centroid
  * tables are driver-materialized (bounded by `nSub·k·(dSub+1)` values —
  * the [[AnnIvf.trainCentroids]] precedent) so iterative lineage never
  * compounds. ADC scoring joins the corpus CODES (nSub small ints per
  * vector — the 32× compressed representation) against the broadcast
  * distance table and partial-aggregates the per-vector sums; the
  * original embedding column is read only during encode. Distances are
  * 6-dp-rounded doubles folded to integer micros before the per-vector
  * sum, so accumulation order is irrelevant cross-engine (the q77
  * idiom).
  */
object Pq {

  /** One row per (vector, subspace): `sv` = dims [s·dSub+1, (s+1)·dSub]. */
  def subvectors(e: DataFrame, nSub: Int, dSub: Int,
      idCol: String = "vec_id", vecCol: String = "emb"): DataFrame =
    e.select(col(idCol), explode(array((0 until nSub).map(s0 =>
        struct(lit(s0).as("s"), slice(col(vecCol), s0 * dSub + 1, dSub)
          .as("sv"))): _*)).as("x"))
      .select(col(idCol), col("x.s").as("s"), col("x.sv").as("sv"))

  /** Squared L2 via pinned-order dot products (engine-portable at
    * 6 dp — [[Similarity.dot]]'s sequential accumulation on both
    * sides).
    */
  private def d2(a: String, b: String): Column =
    round(Similarity.dot(col(a), col(a))
      - lit(2d) * Similarity.dot(col(a), col(b))
      + Similarity.dot(col(b), col(b)), 6)

  /** Nearest codeword per (vector, subspace) — broadcast fanout,
    * map-side `min_by` argmin (ties: lowest cid), one shuffled row per
    * (vector, subspace).
    */
  def assign(sub: DataFrame, codebook: DataFrame,
      idCol: String = "vec_id"): DataFrame =
    sub.join(broadcast(codebook), "s")
      .withColumn("__d", d2("sv", "cemb"))
      .groupBy(col(idCol), col("s"))
      .agg(first(col("sv")).as("sv"),
        min_by(col("cid"), struct(col("__d"), col("cid"))).as("cid"))

  /** Lloyd-trained per-subspace codebooks (k codewords each, seeded by
    * the first k vectors' subvectors, centroid coords rounded to 6 dp
    * per round). Returns (s, cid, cemb); empty clusters drop out, the
    * same rule as the oracle replay.
    */
  def train(spark: SparkSession, sub: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.functions.udaf
    val mean = udaf(graft.functions.VectorMean)
    var cb = sub.where(col(idCol) < k)
      .select(col("s"), col(idCol).cast("int").as("cid"), col("sv").as("cemb"))
    for (_ <- 0 until iters) {
      val next = assign(sub, cb, idCol)
        .groupBy(col("s"), col("cid"))
        .agg(transform(mean(col("sv")), x => round(x, 6)).as("cemb"))
      // bounded driver materialization: nSub·k codebook rows
      cb = spark.createDataFrame(
        spark.sparkContext.parallelize(next.collect().toSeq), next.schema)
    }
    cb
  }

  /** ADC top-k: per-query (subspace × codeword) distance table in
    * integer micros, corpus scored by summing `nSub` lookups over its
    * CODES, smallest total distance wins (self excluded, id
    * tie-break).
    */
  def adcTopK(codes: DataFrame, codebook: DataFrame, querySub: DataFrame,
      k: Int, nSub: Int, idCol: String = "vec_id"): DataFrame = {
    val dtab = querySub
      .join(broadcast(codebook), "s")
      .select(col("qid"), col("s"), col("cid"),
        round(d2("qsv", "cemb") * 1000000).cast("long").as("dm"))
    val scores = codes
      .join(broadcast(dtab), Seq("s", "cid"))
      .where(col(idCol) =!= col("qid"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("dm")).as("adc_micro"), count(lit(1)).as("__n"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid")
      .orderBy(col("adc_micro").asc, col(idCol))
    // every subspace must contribute exactly one lookup — true by
    // construction; the filter drops (rather than mis-scores) a
    // partial sum if a codebook row ever went missing
    scores.where(col("__n") === nSub).drop("__n")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }
}
