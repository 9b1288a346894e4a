package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection: MinHash + banded LSH candidate
  * generation, exact n-gram Jaccard verification, and SimHash
  * fingerprints.
  *
  * Scale design (the whole point): candidates come from a self-join on
  * (band, bandKey) — a hash shuffle whose volume is O(corpus × bands),
  * never an all-pairs product. Verification touches only candidate
  * pairs. Signatures are per-row lambda expressions (codegen'd, no
  * explode, no UDF) computed in the scan stage.
  *
  * Hashes are md5-based on purpose: engine-portable, so the DuckDB
  * oracle reproduces every signature byte-for-byte (a seeded xxhash
  * would be faster but unverifiable; swapping it in is a one-line
  * change at deployment).
  */
object NearDup {

  /** Number of MinHash functions in a signature. */
  val NumHashes = 8

  /** Rows per LSH band (NumHashes/BandSize bands). */
  val BandSize = 2

  val NumBands: Int = NumHashes / BandSize

  /** MinHash_i of a shingle array: min over shingles of md5("i:"+s).
    * String-min over hex digests ≡ min over 128-bit hash values.
    * Declarative reference formulation — [[signatures]] runs the
    * compiled [[graft.functions.MinHashSig]] with identical semantics
    * (equivalence is unit-tested).
    */
  def minhash(sh: Column, i: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$i:"), s))))

  /** id + m0..m{n-1} signature columns from (idCol, textCol) docs,
    * via the native minhash_sig expression (one compiled call per row
    * instead of NumHashes × |shingles| interpreted lambda steps).
    * Requires `spark.sql.extensions=graft.GraftExtensions`.
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3): DataFrame = {
    val sig = expr(s"minhash_sig($textCol, $NumHashes, $shingleLen)")
    docs
      .select(col(idCol), sig.as("sig"))
      .select(
        col(idCol) +:
          (0 until NumHashes).map(i => col("sig").getItem(i).as(s"m$i")): _*)
  }

  /** Declarative-only signature path (no session extension needed);
    * kept for environments without GraftExtensions and as the
    * semantic reference for [[signatures]].
    */
  def signaturesDeclarative(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3): DataFrame = {
    val sh = TextOps.shingles(TextOps.tokens(col(textCol)), shingleLen)
    docs.select(
      col(idCol) +:
        (0 until NumHashes).map(i => minhash(sh, i).as(s"m$i")): _*)
  }

  /** (id, band, key) — one row per band; docs sharing (band, key) are
    * LSH candidates.
    */
  def bands(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3): DataFrame = {
    val sig = signatures(docs, idCol, textCol, shingleLen)
    val bandStructs = (0 until NumBands).map { b =>
      val key = md5(concat_ws("|",
        (0 until BandSize).map(r => col(s"m${b * BandSize + r}")): _*))
      struct(lit(b).as("band"), key.as("key"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.key").as("key"))
  }

  /** Distinct candidate pairs (doc_a < doc_b) from banded LSH.
    *
    * One signature pass, one shuffle: group band rows by (band, key),
    * collect the (sorted, bounded-by-bucket) id list, and expand pairs
    * inside each bucket with array lambdas — computing signatures once
    * and shuffling only ids, where a self-join would recompute the
    * whole md5 pipeline for both sides. Still never an all-pairs
    * product: work is Σ bucket², the LSH contract.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3): DataFrame = {
    val bs = bands(docs, idCol, textCol, shingleLen)
    val buckets = bs.groupBy("band", "key")
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .where(size(col("ids")) > 1)
    buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
  }

  /** LSH candidates verified by exact shingle-set Jaccard >= threshold.
    * Joining candidates back to shingle arrays is two hash joins on
    * doc id — cost O(candidates), not O(corpus²).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleLen: Int = 3): DataFrame = {
    val texts = docs.select(col(idCol), col(textCol))
    val cand = candidatePairs(docs, idCol, textCol, shingleLen)
    cand
      .join(texts.toDF("doc_a", "text_a"), "doc_a")
      .join(texts.toDF("doc_b", "text_b"), "doc_b")
      .withColumn("jacc",
        round(expr(s"shingle_jaccard(text_a, text_b, $shingleLen)"), 6))
      .where(col("jacc") >= threshold)
      .select("doc_a", "doc_b", "jacc")
  }

  /** Jaccard verify with built-ins only (the semantic reference for
    * the fused `shingle_jaccard` expression used by [[jaccardPairs]]).
    */
  def jaccardPairsDeclarative(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleLen: Int = 3): DataFrame = {
    val sh = docs.select(
      col(idCol),
      TextOps.shingles(TextOps.tokens(col(textCol)), shingleLen).as("sh"))
    val cand = candidatePairs(docs, idCol, textCol, shingleLen)
    val jacc = round(
      size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
        / size(array_union(col("sh_a"), col("sh_b"))), 6)
    cand
      .join(sh.toDF("doc_a", "sh_a"), "doc_a")
      .join(sh.toDF("doc_b", "sh_b"), "doc_b")
      .withColumn("jacc", jacc)
      .where(col("jacc") >= threshold)
      .select("doc_a", "doc_b", "jacc")
  }

  /** SimHash-banded near-dup pairs: candidates share one of four
    * 8-bit bands of the 32-bit fingerprint (classic simhash blocking —
    * any pair within Hamming distance 3 shares at least one exact
    * band by pigeonhole), verified by `bit_count(fp_a ^ fp_b)`.
    * Bucketed like MinHash LSH: never all-pairs.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fps = docs.select(col(idCol), expr(s"simhash32($textCol)").as("fp"))
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        expr(s"(fp >> ${8 * b}) & 255").as("key"))
    }
    val bands = fps
      .select(col(idCol), col("fp"), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("fp"), col("bs.band").as("band"),
        col("bs.key").as("key"))
    val l = bands.toDF("doc_a", "fp_a", "band", "key")
    val r = bands.toDF("doc_b", "fp_b", "band", "key")
    l.join(r, Seq("band", "key"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "fp_a", "fp_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Winnowing document fingerprints (the MOSS rolling-hash scheme):
    * hash every word shingle, slide a window of `w` consecutive
    * hashes, keep each window's minimum, dedupe. Guarantees any
    * shared run of ≥ w+shingleLen-1 tokens between two documents
    * shares a fingerprint, at ~2/(w+1) the storage of full shingling.
    * Pure scan-side column expressions over the compiled
    * `word_shingles`; matching docs = fingerprint-equality join.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, window: Int = 4): DataFrame =
    docs.select(col(idCol),
      explode(expr(s"winnow_fps($textCol, $shingleLen, $window)")).as("fp"))

  /** Built-ins-only winnowing (the semantic reference for the
    * compiled `winnow_fps`; O(n × window) interpreted, test-scale only).
    */
  def winnowFingerprintsDeclarative(docs: DataFrame, idCol: String,
      textCol: String, shingleLen: Int = 3, window: Int = 4): DataFrame = {
    val hs = transform(expr(s"word_shingles($textCol, $shingleLen)"),
      s => md5(s))
    val wins = when(size(hs) <= window, array(array_min(hs)))
      .otherwise(transform(
        sequence(lit(0), size(hs) - window),
        i => array_min(slice(hs, i + lit(1), lit(window)))))
    docs
      .select(col(idCol), explode(array_distinct(wins)).as("fp"))
  }

  /** 32-bit SimHash fingerprint of the token multiset: token hash =
    * first 8 md5 hex chars; bit b of the fingerprint is the sign of
    * the Σ±1 vote by bit b of each token hash. Equal fingerprints (or
    * small Hamming distance via `bit_count(a ^ b)`) flag near-dups.
    * Runs the compiled `simhash32` expression (GraftExtensions);
    * [[simhashDeclarative]] is the built-ins-only reference.
    */
  def simhash(textColSql: String): Column = expr(s"simhash32($textColSql)")

  def simhashDeclarative(textColSql: String): Column = {
    // expr-string form: the SQL shift functions accept a lambda-bound
    // bit index, which the Scala functions API (literal-only shift
    // amounts) cannot express
    val t = textColSql
    expr(
      "aggregate(sequence(0, 31), 0L, (acc, b) -> acc + IF(" +
        s"aggregate(transform(split(regexp_replace(lower(trim($t)), '\\\\s+', ' '), ' '), " +
        "tk -> cast(conv(substring(md5(tk), 1, 8), 16, 10) as bigint)), " +
        "0, (a2, h) -> a2 + IF((h div shiftleft(1L, b)) % 2 = 1, 1, -1)) > 0, " +
        "shiftleft(1L, b), 0L))")
  }
}
