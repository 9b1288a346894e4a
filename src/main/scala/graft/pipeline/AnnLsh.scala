package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH over an embedding column — the training-free
  * alternative ANN scale path next to [[AnnIvf]] (which needs centroids).
  * Vectors whose sign patterns against `nbits` fixed hyperplanes agree
  * land in the same bucket; near-identical vectors always collide on
  * every bit, so bucket blocking finds them without an all-pairs pass.
  *
  * The hyperplanes are derived from md5, not a trained artifact or an
  * RNG: component (j, i) is `md5("<seed>:j:i")`'s first 8 hex chars
  * mapped into [-1, 1). That makes the whole index a pure function of
  * (seed, nbits, dim) — reproducible across engines (the DuckDB oracle
  * recomputes it from the same formula), across runs, and across the
  * retries of a 1000-executor job.
  *
  * Scale design: the hyperplane matrix is nbits × dim literals baked
  * into the plan (broadcast-by-construction); computing a vector's
  * code is pure scan-side lambda arithmetic — zero shuffles. The only
  * exchange in [[nearDupPairs]] is the groupBy on the code, and work
  * inside buckets is Σ bucket², never |corpus|².
  */
object AnnLsh {

  /** Deterministic hyperplane matrix: element (j, i) uniform-ish in
    * [-1, 1) from the integer value of md5("<seed>:j:i")[0,8). */
  def hyperplanes(dim: Int, nbits: Int, seed: String): Seq[Seq[Double]] = {
    require(dim > 0 && nbits > 0 && nbits <= 30,
      s"need 0 < nbits <= 30 and dim > 0, got nbits=$nbits dim=$dim")
    (0 until nbits).map { j =>
      (0 until dim).map { i =>
        val hex = MessageDigest.getInstance("MD5")
          .digest(s"$seed:$j:$i".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 2147483648d - 1d
      }
    }
  }

  /** Sign-pattern bucket code: bit j of the code is set iff
    * dot(vec, plane_j) >= 0 — [[Similarity.dotDeclarative]], the
    * sequential fold bit-matching the oracle's `list_dot_product`.
    * NULL (not bucket 0) when the vector's length doesn't match the
    * hyperplanes, so a mixed-dimension corpus surfaces as filterable
    * null codes instead of silently piling into one giant bucket. */
  def codeColumn(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val raw = planes.zipWithIndex.map { case (p, j) =>
      when(Similarity.dotDeclarative(vec, typedlit(p)) >= 0d, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    when(size(vec) === planes.head.size, raw)
  }

  /** id, vec, and LSH bucket code for every row — the index build.
    * Scan-side only; persist partitioned by `code` to make probes
    * partition-pruned at warehouse scale. The index dimension is the
    * MODAL vector length in the corpus (ties broken toward the
    * smaller length) — a bounded partial-agg over at most
    * #distinct-lengths rows, not a scan-order-dependent limit(1),
    * which would make every bucket code depend on which row happened
    * to be read first on a mixed-dimension corpus. Rows of any other
    * length get a filterable null code; an empty corpus yields an
    * empty index. Callers that know the dimension can skip the probe
    * by passing `dim` explicitly. */
  def codes(df: DataFrame, idCol: String, vecCol: String,
      nbits: Int, seed: String = "lsh", dim: Option[Int] = None): DataFrame =
    dim.orElse {
      df.where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
        .groupBy(size(col(vecCol)).as("__d")).count()
        .orderBy(col("count").desc, col("__d").asc)
        .limit(1).collect()
        .headOption.map(_.getInt(0))
    } match {
      case None => // no usable vectors at all
        df.select(col(idCol), col(vecCol), lit(null).cast("long").as("code"))
      case Some(d) =>
        df.select(col(idCol), col(vecCol),
          codeColumn(col(vecCol), hyperplanes(d, nbits, seed)).as("code"))
    }

  /** Near-duplicate pairs (cosine >= threshold) searched only within
    * same-code buckets. Identical vectors agree on every sign bit, so
    * exact copies are always found; borderline cross-bucket pairs are
    * the accepted recall trade (identical in the oracle). Vectors whose
    * dimension doesn't match the index (null code) never pair.
    *
    * The coded frame feeds both sides of the self-join and is
    * recomputed for each — at warehouse scale, materialize the index
    * once (`codes(...).write.partitionBy("code")`) and self-join the
    * stored table instead. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      nbits: Int, threshold: Double, seed: String = "lsh"): DataFrame = {
    val coded = codes(df, idCol, vecCol, nbits, seed).where(col("code").isNotNull)
    val l = coded.toDF("id_a", "emb_a", "code")
    val r = coded.toDF("id_b", "emb_b", "code")
    l.join(r, Seq("code"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", round(Similarity.cosine(col("emb_a"), col("emb_b")), 6))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
