package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-training step of
  * an LLM data pipeline (Sennrich et al. 2016), trained the way the
  * canonical implementation does: on the WORD-FREQUENCY table, never
  * the raw corpus. The corpus is touched exactly once (the word count
  * the caller aggregates); every merge round then runs over the
  * vocabulary — thousands of rows at 100 TB, not billions.
  *
  * Round shape: symbol sequences live as `·a·b·c` strings (one
  * separator before every symbol); adjacent-pair counts are one
  * partial-agg groupBy over the vocabulary weighted by word count; the
  * argmax pair is a 1-row TakeOrdered collect (bounded driver
  * materialization, the k-means-centroid pattern); applying a merge is
  * a scan-side `replace(seq, '·A·B', '·AB')` — plain left-to-right
  * substring replacement IS the greedy non-overlapping merge order BPE
  * specifies, and the leading separator makes symbol boundaries
  * unambiguous (`·b·c` can never match inside `·ab·c`).
  */
object Bpe {

  val Sep = "·"

  /** A well-formed pair: two non-empty `[a-z0-9]` symbols around one
    * separator — anything else means the vocabulary leaked characters
    * that corrupt symbol boundaries (or would escape a SQL literal). */
  private val SafePair = "[a-z0-9]+·[a-z0-9]+"

  /** Train `steps` merges; returns (step, pair, merged, cnt) — one row
    * per learned merge rule, in order.
    *
    * @param words vocabulary with counts; `wordCol` values must match
    *              `^[a-z0-9]+$` (filter upstream — enforced loudly here
    *              per-rule, since a `·` inside a word would corrupt
    *              symbol boundaries)
    */
  def train(spark: SparkSession, words: DataFrame, wordCol: String,
      cntCol: String, steps: Int): DataFrame = {
    require(steps >= 1, "bpe needs at least one merge step")
    var seqs = words.select(col(cntCol).as("cnt"),
      regexp_replace(col(wordCol), "(.)", s"$Sep$$1").as("seq"))
      .cache()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val syms = split(expr("substring(seq, 2)"), Sep)
      val pairs = when(size(syms) >= 2,
        transform(sequence(lit(0), size(syms) - 2),
          j => concat(element_at(syms, j + 1), lit(Sep),
            element_at(syms, j + 2))))
        .otherwise(array().cast("array<string>"))
      val top = seqs.select(explode(pairs).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) {
        // every word is a single symbol — nothing left to merge; stop
        // early rather than emit degenerate rules
        exhausted = true
      } else {
        val pair = top(0).getString(0)
        val c = top(0).getLong(1)
        require(pair.matches(SafePair),
          s"bpe pair '$pair' outside the safe alphabet — filter the vocabulary " +
            "to ^[a-z0-9]+$ before training")
        val merged = pair.replace(Sep, "")
        merges += ((step, pair, merged, c))
        seqs = seqs.withColumn("seq",
          expr(s"replace(seq, '$Sep$pair', '$Sep$merged')"))
        step += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("step", "pair", "merged", "cnt")
  }

  /** WordPiece-scored merge training (Schuster & Nakajima 2012): the
    * SAME round machinery as [[train]], but the merge chosen each
    * round maximizes the LIKELIHOOD score count(ab)/(count(a)·count(b))
    * instead of the raw pair count — the criterion that makes
    * WordPiece prefer merges that raise corpus likelihood under a
    * unigram symbol model, next to q133's count-greedy BPE and q358's
    * Viterbi unigram-LM (the ##-continuation bookkeeping of full
    * WordPiece is orthogonal to the selection rule exercised here).
    * The score is the floored integer `c·10¹² div (c_a·c_b)` with
    * decimal(38,0) products (symbol counts are corpus-sized at
    * 100 TB), ties to the lexicographically smallest pair — replayed
    * verbatim by the oracle. Per round: ONE pair partial agg + ONE
    * symbol partial agg over the vocabulary table, two broadcast-size
    * joins, a 1-row argmax collect.
    */
  def trainWordPiece(spark: SparkSession, words: DataFrame,
      wordCol: String, cntCol: String, steps: Int): DataFrame = {
    require(steps >= 1, "wordpiece needs at least one merge step")
    var seqs = words.select(col(cntCol).as("cnt"),
      regexp_replace(col(wordCol), "(.)", s"$Sep$$1").as("seq"))
      .cache()
    val merges = Seq.newBuilder[(Int, String, String, Long, Long)]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val syms = split(expr("substring(seq, 2)"), Sep)
      val pairs = when(size(syms) >= 2,
        transform(sequence(lit(0), size(syms) - 2),
          j => concat(element_at(syms, j + 1), lit(Sep),
            element_at(syms, j + 2))))
        .otherwise(array().cast("array<string>"))
      val symCnt = seqs
        .select(explode(split(expr("substring(seq, 2)"), Sep)).as("sym"),
          col("cnt"))
        .groupBy("sym").agg(sum("cnt").as("sc"))
      val top = seqs.select(explode(pairs).as("pair"), col("cnt"))
        .groupBy("pair").agg(sum("cnt").as("c"))
        .withColumn("a", expr(s"split(pair, '$Sep')[0]"))
        .withColumn("b", expr(s"split(pair, '$Sep')[1]"))
        .join(symCnt.toDF("a", "sa"), "a")
        .join(symCnt.toDF("b", "sb"), "b")
        .withColumn("score", expr("cast(cast(c as decimal(38,0)) * " +
          "1000000000000 div (cast(sa as decimal(38,0)) * sb) as bigint)"))
        .orderBy(col("score").desc, col("pair"))
        .select("pair", "c", "score")
        .limit(1).collect()
      if (top.isEmpty) {
        exhausted = true
      } else {
        val pair = top(0).getString(0)
        require(pair.matches(SafePair),
          s"wordpiece pair '$pair' outside the safe alphabet — filter " +
            "the vocabulary to ^[a-z0-9]+$ before training")
        val merged = pair.replace(Sep, "")
        merges += ((step, pair, merged, top(0).getLong(1),
          top(0).getLong(2)))
        seqs = seqs.withColumn("seq",
          expr(s"replace(seq, '$Sep$pair', '$Sep$merged')"))
        step += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("step", "pair", "merged", "cnt", "score_pico")
  }

  /** Scan-side ENCODE: apply trained merge rules (in training order)
    * to a word column, returning the `·`-separated symbol sequence.
    * Pure codegen'd string replaces — the corpus-wide application is
    * one projection, no shuffle, no per-row rule lookup; the rule list
    * is bounded (= the trained step count), embedded as literals like
    * the training rounds embed them.
    */
  def encodeExpr(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(regexp_replace(word, "(.)", s"$Sep$$1")) {
      case (acc, (pair, merged)) =>
        replace(acc, lit(Sep + pair), lit(Sep + merged))
    }
}
