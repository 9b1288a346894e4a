package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding post-processing: symmetric int8 quantization (the
  * standard 4× shrink before an ANN index or a training shard is
  * written) and L2 stats.
  *
  * Scale design: pure per-row `transform`/`aggregate` lambda
  * arithmetic inside the scan projection — no UDF, no shuffle, no
  * state; at 100 TB this runs at parquet-scan speed. Quantized
  * vectors never leave the row: downstream gets the int8 codes and
  * the per-vector scale, which is all a reader needs to dequantize.
  */
object Quantize {

  /** Symmetric per-vector int8 quantization: q_i = round(x_i·127/amax)
    * with amax = max|x_i| (zero vectors quantize to all-zero, scale 0).
    * Rounding is the explicit floor(x+0.5) form so the DuckDB oracle
    * can reproduce it bit-for-bit (engine `round` half-even/half-up
    * conventions differ).
    *
    * @return idCol, n_dims, scale = round(amax/127, 6),
    *         l2 = round(‖x‖₂, 6), q_md5 = md5 of the comma-joined
    *         int codes (lets the oracle hash-compare the full code
    *         vector without a 100-wide schema)
    */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col("__v")
    val amax = col("__amax")
    val code: Column => Column = x =>
      when(amax === 0d, lit(0L))
        .otherwise(floor(x * 127d / amax + 0.5d).cast("long"))
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__amax", array_max(transform(v, x => abs(x))))
      .select(col(idCol),
        size(v).cast("long").as("n_dims"),
        round(amax / 127d, 6).as("scale"),
        round(sqrt(Similarity.dot(v, v)), 6).as("l2"),
        md5(array_join(transform(v, x => code(x).cast("string")), ","))
          .as("q_md5"))
  }
}
