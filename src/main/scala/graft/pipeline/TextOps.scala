package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data
  * pipelines (north-star extension surface, SURVEY.md §7.1 step 6).
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * column expressions — no UDFs — so whole-stage codegen fuses the
  * whole per-document computation into the scan stage: at 100 TB these
  * run at parquet-scan speed with zero shuffles.
  */
object TextOps {

  /** Canonical text normalization: lowercase, trim, collapse runs of
    * whitespace. The shared front-end of every dedup/fingerprint op.
    */
  def norm(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact-dup fingerprint: md5 of the normalized text. md5 (not
    * xxhash) on purpose — it is reproducible across engines, so the
    * DuckDB oracle can recompute it byte-for-byte.
    */
  def fingerprint(text: Column): Column = md5(norm(text))

  /** Whitespace tokenizer over normalized text. */
  def tokens(text: Column): Column = split(norm(text), " ")

  /** Word n-gram shingles of the token array: positions i..i+n-1
    * joined by a space. Built with `transform`+`sequence` (codegen'd,
    * per-row, no explode) — the shingle set feeds MinHash/Jaccard.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  /** Marker-word language scorer: how many tokens appear in the
    * marker set. The lang-ID heuristic scores each candidate language
    * and takes the argmax (ties broken by a fixed language order).
    */
  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  /** Candidate languages and their marker words, in tie-break order. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "y"),
    "fr" -> Seq("le", "les", "et", "du"))

  /** Feature-hashing text vectorization (the hashing trick): each
    * token maps to dimension md5(token) % dim; the weight of a
    * dimension is its token share. Model-free text→vector embedding —
    * the classic large-scale shortcut when no learned embedder is in
    * the loop. Output is sparse rows (doc, dim, weight): one explode +
    * one partial-agg groupBy, shuffle volume O(doc × distinct dims).
    */
  def hashingEmbedding(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int): org.apache.spark.sql.DataFrame =
    docs
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")))
      .select(col(idCol), col("__n"), explode(col("__toks")).as("__tk"))
      .withColumn("dim", expr(
        s"pmod(cast(conv(substring(md5(__tk), 1, 8), 16, 10) as bigint), $dim)"))
      .groupBy(col(idCol), col("__n"), col("dim"))
      .agg(count(lit(1)).as("__c"))
      .select(col(idCol), col("dim"),
        round(col("__c") / col("__n").cast("double"), 6).as("weight"))
}
