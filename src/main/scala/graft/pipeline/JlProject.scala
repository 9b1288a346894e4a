package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection (Achlioptas 2003's
  * database-friendly ±1 variant): embeddings are projected to a lower
  * dimension through a SIGN matrix derived from md5 — the standard
  * pre-ANN dimensionality reduction when the embedding dim outcosts
  * the index (distance distortion bounded by the JL lemma at
  * k = O(ln N / ε²)).
  *
  * The projection matrix is never materialized as data: the ±1 signs
  * are a pure function of (row, col) via md5 parity, so every
  * executor — and the DuckDB oracle — derives the SAME matrix
  * independently (no broadcast, no RNG state, the q118 deterministic-
  * sampling idiom applied to a matrix). It is embedded as a literal
  * in the plan: `outDim × inDim` doubles, a few KB, folded into the
  * scan-side projection.
  *
  * Scale shape: one `transform` + `zip_with`/`aggregate` per row —
  * zero shuffles, the corpus is touched once. Output values are
  * floor-micros of `dot(emb, signs_j) / 4` (outDim = 16 ⇒ the 1/√k
  * normalizer is exactly 4 — a power of two, so the division is FP-
  * exact on both engines).
  */
object JlProject {

  /** md5-parity sign: +1 when the first 32 hash bits of "jl:i:j" are
    * even — engine-portable (DuckDB: `('0x'||substr(md5(…),1,8))::
    * BIGINT % 2`).
    */
  private def sign(i: Int, j: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"jl:$i:$j".getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1d else -1d
  }

  /** The sign matrix as rows j = 0 until outDim of length inDim. */
  def signMatrix(inDim: Int, outDim: Int): Seq[Seq[Double]] =
    (0 until outDim).map(j => (0 until inDim).map(i => sign(i, j)))

  /** Project `vecCol` (array<double>, length `inDim`) to `outDim`
    * floor-micro components. `outDim` must be a perfect square of an
    * FP-exact divisor — enforced power of four here so the 1/√k
    * normalizer divides exactly.
    *
    * @return (idCol, j, v_micro) — one row per output component
    */
  def project(embsDf: DataFrame, idCol: String, vecCol: String,
      inDim: Int, outDim: Int): DataFrame = {
    val norm = math.sqrt(outDim.toDouble)
    require(norm == math.rint(norm) && (outDim & (outDim - 1)) == 0,
      s"outDim must be a power of four for an FP-exact normalizer, got $outDim")
    val proj = typedLit(signMatrix(inDim, outDim))
    embsDf
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(outDim - 1)), j =>
          floor(aggregate(
            zip_with(col(vecCol), element_at(proj, j + 1), _ * _),
            lit(0d), _ + _) / lit(norm) * lit(1000000d)).cast("long"))))
      .select(col(idCol), col("pos").cast("int").as("j"),
        col("col").as("v_micro"))
  }
}
