package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RAG/context-window document chunking: each document's token stream
  * split into fixed-size windows with overlap (stride <= window) — the
  * standard retrieval / training-context builder.
  *
  * Entirely scan-side: tokenization, the chunk-index fan-out
  * (`explode(sequence(...))`) and the per-chunk slice + hash all fuse
  * into the scan stage — no shuffle anywhere, so at 100 TB this runs
  * at parquet-scan speed and parallelism follows the input splits.
  * (Contrast `Pack.concatChunks` (q40), which is corpus-GLOBAL
  * concat-and-chunk and needs the block prefix sum; chunking here is
  * per-document, embarrassingly parallel.)
  */
object Chunk {

  /** One row per (document, window): windows start every `stride`
    * tokens while still inside the document, each `window` tokens
    * long (the trailing ones truncated at the document end).
    *
    * @return idCol, chunk_idx, start_tok, n_tok_chunk, chunk_md5
    *         (md5 of the space-joined chunk tokens — lets downstream
    *         dedup chunks across documents without re-tokenizing)
    */
  def sliding(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .where(col("__n") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), expr(s"(__n - 1) div $stride"))))
      .select(col(idCol),
        col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(window.toLong), col("__n") - col("chunk_idx") * stride)
          .as("n_tok_chunk"),
        md5(array_join(expr(
          s"slice(__toks, cast(chunk_idx * $stride + 1 as int), $window)"),
          " ")).as("chunk_md5"))
  }
}
