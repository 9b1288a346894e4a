package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the query side is always the small side and is
  * `broadcast()` — the corpus is never shuffled or collected. The
  * arithmetic is pure `functions` lambdas (`zip_with`/`aggregate`),
  * which Catalyst evaluates inside the scan projection; no UDF.
  */
object Similarity {

  /** Sequential-order dot product of two double arrays — same
    * accumulation order as the DuckDB oracle's `list_dot_product`, so
    * results agree bit-for-bit before rounding. Runs the compiled
    * `dot_f64` expression (GraftExtensions); [[dotDeclarative]] is the
    * built-ins-only reference formulation (unit-tested equal).
    */
  def dot(a: Column, b: Column): Column = call_function("dot_f64", a, b)

  def dotDeclarative(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  def l2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2(a) * l2(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), ranked by similarity rounded to
    * 6 dp (engine-portable) with id tie-break.
    *
    * The plan is BroadcastNestedLoopJoin with the (tiny) query side
    * broadcast — the baseline ANN path. For large query sets use
    * [[graft.pipeline.AnnLsh]]-style bucketing instead.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "emb"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qemb"))
    val sim = round(cosine(col(vecCol), col("qemb")), 6).as("sim")
    val ranked = corpus
      .join(broadcast(q), col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol), sim)
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col(idCol))))
    ranked.where(col("rn") <= k).drop("rn")
  }
}
