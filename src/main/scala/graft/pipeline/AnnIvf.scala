package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: the 100 TB scale path for
  * similarity search ([[Similarity.bruteForceTopK]] is the baseline).
  *
  * Index: every corpus vector is assigned to its nearest centroid
  * (the inverted-file bucket). Search: a query probes only the
  * `nprobe` nearest buckets, so scanned volume drops by
  * ~nprobe/numCentroids versus brute force.
  *
  * Scale design: centroids are always broadcast (tiny side), bucket
  * assignment is a map-side fanout of |corpus| × K rows partially
  * aggregated before any exchange, and the probed search shuffles on
  * bucket id — no corpus-sized cross join anywhere. At warehouse scale
  * the assignment is computed once and persisted with the table
  * (`partitionBy(bucket)`), making probes partition-pruned scans.
  */
object AnnIvf {

  private def sim(a: String, b: String) =
    round(Similarity.cosine(col(a), col(b)), 6)

  /** Nearest-centroid bucket per corpus vector (ties: lowest centroid
    * id — same rule as the DuckDB oracle).
    *
    * Shape: `max_by` over the broadcast fanout, NOT a row_number
    * window — the argmax partially aggregates map-side, so the
    * exchange carries at most one row per (partition, vector) instead
    * of |corpus| × K rows. The tie-break struct `(s, -cid)` makes
    * "highest similarity, then lowest centroid id" a plain maximum.
    */
  def assignBuckets(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "emb"): DataFrame = {
    val c = centroids.select(col(idCol).as("cid"), col(vecCol).as("cemb"))
    corpus
      .crossJoin(broadcast(c))
      .withColumn("s", sim(vecCol, "cemb"))
      .groupBy(col(idCol))
      .agg(
        // vec is constant per id: carry it through the agg (one row
        // per vector in the shuffle) instead of re-joining the corpus
        first(col(vecCol)).as(vecCol),
        max_by(col("cid"), struct(col("s"), (-col("cid")).as("nc"))).as("bucket"))
      .select(col(idCol), col(vecCol), col("bucket"))
  }

  /** Like [[assignBuckets]] but also carries the similarity to the
    * assigned centroid — the per-vector signal the embedding-outlier
    * filter (q146) thresholds on. Same max_by partial-agg shape: the
    * broadcast fanout collapses map-side, the exchange carries one
    * (id, bucket, sim) row per vector.
    */
  def assignWithSim(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "emb"): DataFrame = {
    val c = centroids.select(col(idCol).as("cid"), col(vecCol).as("cemb"))
    corpus
      .crossJoin(broadcast(c))
      .withColumn("s", sim(vecCol, "cemb"))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("s"), col("cid")),
        struct(col("s"), (-col("cid")).as("nc"))).as("best"))
      .select(col(idCol), col("best.cid").as("bucket"),
        col("best.s").as("sim"))
  }

  /** Lloyd-iteration centroid training (k-means-lite): seed with the
    * first k vectors by id, then `iters` rounds of assign + per-bucket
    * [[graft.functions.VectorMean]] (a typed Aggregator with
    * map-side partial sums — the vectors themselves never shuffle).
    * Deterministic for a given corpus, so trained indexes are
    * reproducible across retries.
    *
    * @param roundTo round each centroid component to this many decimal
    *                places after every mean step — pins the result
    *                across summation orders (partition merge order vs
    *                a sequential engine), so a trained index can be
    *                oracle-compared bit-for-bit
    */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "emb",
      roundTo: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.functions.udaf
    val mean = udaf(graft.functions.VectorMean)
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol), col(vecCol))
    for (_ <- 0 until iters) {
      val m = mean(col(vecCol))
      val c = roundTo.map(p => transform(m, x => round(x, p))).getOrElse(m)
      val next = assignBuckets(corpus, centroids, idCol, vecCol)
        .groupBy(col("bucket").as(idCol))
        .agg(c.as(vecCol))
      // materialize each round: centroids are k·(dim+1) values (driver
      // collect bounded by k, like the merge path's affected-bucket
      // set), so the iterative lineage never compounds — without this
      // the plan nests one corpus crossJoin per Lloyd round
      val spark = corpus.sparkSession
      centroids = spark.createDataFrame(
        spark.sparkContext.parallelize(next.collect().toSeq), next.schema)
    }
    centroids
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, searched
    * only WITHIN each vector's IVF bucket — near-identical vectors
    * share a nearest centroid, so work is Σ bucket² instead of an
    * all-pairs product (cross-bucket borderline pairs are the accepted
    * recall trade, identical in the oracle).
    */
  def nearDupPairs(corpus: DataFrame, centroids: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "emb"): DataFrame = {
    val assigned = assignBuckets(corpus, centroids, idCol, vecCol)
    val l = assigned.toDF("id_a", "emb_a", "bucket")
    val r = assigned.toDF("id_b", "emb_b", "bucket")
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", round(Similarity.cosine(col("emb_a"), col("emb_b")), 6))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Top-k per query, searching only the `nprobe` buckets nearest to
    * each query vector.
    */
  def topKProbed(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "emb"): DataFrame =
    topKFromAssigned(assignBuckets(corpus, centroids, idCol, vecCol),
      centroids, queries, k, nprobe, idCol, vecCol)

  /** [[topKProbed]]'s search stage over PRE-COMPUTED bucket
    * assignments (`idCol`, `vecCol`, `bucket`) — the entry point when
    * the inverted file is a maintained artifact (persisted with the
    * table, updated incrementally as batches arrive — q244) rather
    * than recomputed per query.
    */
  def topKFromAssigned(assigned: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "emb"): DataFrame = {
    val c = centroids.select(col(idCol).as("cid"), col(vecCol).as("cemb"))
    // top-nprobe buckets per query via collect_list over the K
    // (bounded, broadcast) centroids + sort + slice — partial-agg
    // shape like assignBuckets, no per-query window exchange. Sort
    // desc on (s, -cid, cid) = "s desc, cid asc", the oracle's order.
    val probes = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qemb"))
      .crossJoin(broadcast(c))
      .withColumn("s", sim("qemb", "cemb"))
      .groupBy(col("qid"))
      .agg(
        first(col("qemb")).as("qemb"),
        slice(sort_array(collect_list(
          struct(col("s"), (-col("cid")).as("nc"), col("cid"))), asc = false),
          1, nprobe).as("top"))
      .select(col("qid"), col("qemb"), explode(col("top")).as("t"))
      .select(col("qid"), col("qemb"), col("t.cid").as("bucket"))
    assigned
      .join(broadcast(probes), "bucket")
      .where(col(idCol) =!= col("qid"))
      .withColumn("sim", sim(vecCol, "qemb"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col(idCol))))
      .where(col("rn") <= k)
      .select(col("qid"), col(idCol), col("sim"))
  }
}
