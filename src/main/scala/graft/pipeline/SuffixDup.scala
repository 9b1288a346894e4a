package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Suffix-array substring deduplication (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL'22): find every
  * MAXIMAL span of tokens covered by a substring of length ≥ L that
  * occurs more than once in the corpus — the memorization-removal
  * pass that fixed-n-gram span operators (q86/q101/q130) only
  * approximate, built on the real machinery: Manber–Myers prefix
  * doubling over per-document suffixes.
  *
  * Mechanics: round 0 ranks every position by its token (one global
  * dense enumeration of the VOCABULARY); round k re-ranks by the pair
  * (rank_k[p], rank_k[p + 2^k]) — `lead` over the per-document window,
  * −1 past the end — so after ⌈log₂ L⌉ rounds two positions share a
  * rank iff their length-L windows are equal (−1 sentinels make a
  * truncated suffix unequal to any position with ≥ L tokens left, so
  * filtering to remaining ≥ L keeps the equivalence exact). A position
  * is DUPLICATED iff its final rank is shared; the duplicated-window
  * union collapses to maximal per-document spans by gaps-and-islands.
  *
  * Correctness identity the oracle gates: a position range is covered
  * by a duplicated substring of length ≥ L iff it is covered by a
  * duplicated L-window (any duplicated run [p, p+d), d ≥ L, makes
  * every start in p..p+d−L a duplicated L-window, and their union
  * rebuilds [p, p+d) exactly) — so the DuckDB brute-force L-gram
  * union is value-identical to the suffix-ranking result while
  * sharing none of its plan.
  *
  * Scale: the reason for prefix doubling over brute-force L-gram
  * hashing is payload: hashing windows shuffles N·L tokens (and
  * re-shuffles from scratch for every L a pipeline sweeps); doubling
  * shuffles N fixed-width (rank, rank) longs per round, log₂ L
  * rounds, independent of token width — the standard suffix-array-on-
  * MapReduce bound of O(N log L) small tuples. Rank enumeration is
  * distinct → range-partitioned sort → zipWithIndex (two-pass
  * distributed enumeration, no single-partition window); per-document
  * windows (`lead`, islands) are bounded by document length. No
  * driver-side loop depends on data: the round count is the constant
  * ⌈log₂ L⌉.
  */
object SuffixDup {

  /** Order-preserving dense enumeration of the DISTINCT rows of
    * `df.select(cols)` under their lexicographic order: appends
    * `__rank` (0-based, consecutive). orderBy range-partitions the
    * sort; zipWithIndex adds per-partition offsets in a second pass —
    * the distributed enumeration idiom, never a global window.
    */
  private def denseRanks(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val d = df.select(cols.map(col): _*).distinct()
      .orderBy(cols.map(col): _*)
    val schema = StructType(
      d.schema.fields :+ StructField("__rank", LongType, nullable = false))
    val rdd = d.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  private val wDoc = Window.partitionBy("__id").orderBy("__pos")

  /** (__id, __pos, __tok) — the exploded corpus. */
  private def tokens(docsDf: DataFrame, idCol: String,
      toksCol: Column): DataFrame =
    docsDf.select(col(idCol).as("__id"),
      posexplode(toksCol).as(Seq("__pos", "__tok")))

  /** Manber–Myers rank table truncated at window length `minLen` (a
    * power of two), restricted to FULL-window positions: two rows
    * share `__r` iff their length-minLen token windows are equal.
    * Returns (__id, __pos, __r).
    */
  private def rankedFullPositions(toks: DataFrame, minLen: Int): DataFrame = {
    require(minLen >= 2 && (minLen & (minLen - 1)) == 0,
      s"minLen must be a power of two, got $minLen")
    // round 0: rank = dense vocabulary rank of the token at __pos
    var ranks = toks
      .join(denseRanks(toks, Seq("__tok")), "__tok")
      .select(col("__id"), col("__pos"), col("__rank").as("__r"))
    var span = 1
    while (span < minLen) {
      val paired = ranks
        .withColumn("__r2", lead(col("__r"), span, -1L).over(wDoc))
      ranks = paired
        .join(denseRanks(paired, Seq("__r", "__r2")), Seq("__r", "__r2"))
        .select(col("__id"), col("__pos"), col("__rank").as("__r"))
      span *= 2
    }
    ranks.join(
      toks.groupBy("__id").agg(count(lit(1)).as("__len")), "__id")
      .where(col("__pos") + minLen <= col("__len"))
      .select("__id", "__pos", "__r")
  }

  /** Gaps-and-islands merge of window-start positions (__id, __pos)
    * into maximal `[span_start, span_end)` spans; starts ≤ minLen
    * apart chain.
    */
  private def mergeSpans(dupPos: DataFrame, minLen: Int): DataFrame =
    dupPos
      .withColumn("__brk",
        when(col("__pos") - lag("__pos", 1).over(wDoc) <= minLen, 0)
          .otherwise(1))
      .withColumn("__isl", sum("__brk").over(
        wDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__id"), col("__isl"))
      .agg(min("__pos").cast("long").as("span_start"),
        (max("__pos") + minLen).cast("long").as("span_end"))
      .select(col("__id"), col("span_start"), col("span_end"))

  /** Maximal merged spans `[span_start, span_end)` (token offsets) per
    * document covered by duplicated substrings of length ≥ `minLen`
    * tokens. `minLen` must be a power of two: the final doubling round
    * compares prefixes of exactly that length. Spans whose gap is
    * ≤ minLen merge (overlapping or touching duplicated regions are
    * one region of duplicated text).
    *
    * @param docsDf  one row per document
    * @param idCol   document id column name
    * @param toksCol expression yielding the token array
    * @return (doc_id = idCol value, span_start, span_end) — both longs
    */
  def dupSpans(docsDf: DataFrame, idCol: String, toksCol: Column,
      minLen: Int): DataFrame = {
    val toks = tokens(docsDf, idCol, toksCol)
    val full = rankedFullPositions(toks, minLen)
    // duplicated position = shared final rank (partial-agg count, then
    // a semi-style join — never a corpus-wide window)
    val shared = full.groupBy("__r").agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1).select("__r")
    mergeSpans(full.join(shared, "__r").select("__id", "__pos"), minLen)
  }

  /** Dedup APPLICATION (Lee et al.'s removal step): every duplicated
    * length-minLen window keeps its corpus-FIRST occurrence (min
    * (doc, pos) of the rank group — the deterministic keeper rule);
    * tokens covered by any NON-keeper duplicated window are removed
    * and each document is rebuilt from its surviving tokens in order.
    *
    * The removal geometry reuses the span merge; the rebuild groups
    * tokens per document once (text moves in one shuffle, the q130
    * rebuild contract). Returns one row per INPUT document:
    * (doc_id, n_tokens, n_kept, text_md5 of the space-joined
    * survivors — md5("") when everything was removed or the document
    * was empty).
    */
  def applyDedup(docsDf: DataFrame, idCol: String, toksCol: Column,
      minLen: Int): DataFrame = {
    val toks = tokens(docsDf, idCol, toksCol)
    val full = rankedFullPositions(toks, minLen)
    val groups = full.groupBy("__r").agg(count(lit(1)).as("__n"),
      min(struct(col("__id"), col("__pos"))).as("__keep"))
      .where(col("__n") > 1)
      .select(col("__r"), col("__keep.__id").as("__kid"),
        col("__keep.__pos").as("__kpos"))
    val nonKeeper = full.join(groups, "__r")
      .where(col("__id") =!= col("__kid") || col("__pos") =!= col("__kpos"))
      .select("__id", "__pos")
    val spans = mergeSpans(nonKeeper, minLen)
      .groupBy("__id")
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    val kept = toks.join(spans, Seq("__id"), "left")
      .where(col("__spans").isNull ||
        !exists(col("__spans"), s =>
          col("__pos") >= s.getField("span_start") &&
            col("__pos") < s.getField("span_end")))
      .groupBy("__id")
      .agg(count(lit(1)).as("__nk"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__tok")))),
          x => x.getField("__tok")), " ").as("__t2"))
    docsDf.select(col(idCol).as("__id"))
      .join(toks.groupBy("__id").agg(count(lit(1)).as("n_tokens")), Seq("__id"), "left")
      .join(kept, Seq("__id"), "left")
      .select(col("__id"),
        coalesce(col("n_tokens"), lit(0L)).cast("long").as("n_tokens"),
        coalesce(col("__nk"), lit(0L)).cast("long").as("n_kept"),
        md5(coalesce(col("__t2"), lit(""))).as("text_md5"))
  }

  /** CROSS-corpus contamination spans (suffix-based train/eval
    * decontamination — the substring-match tier above q52/q104's
    * whole-n-gram membership): maximal merged spans of TRAIN
    * documents covered by a length-minLen window that ALSO occurs in
    * an eval document. Shared window ⇔ shared rank, so the rank table
    * over the union corpus answers cross-membership with no window
    * string ever materialized on an exchange.
    *
    * Scale shape: eval benchmark suites are tiny next to a 100 TB
    * train corpus, so the distinct-eval-rank set (bounded by eval
    * token count) broadcast-semi-joins against the train positions —
    * the train side never shuffles beyond the rank rounds it already
    * paid for.
    *
    * @param isEval per-document membership predicate over `docsDf`'s
    *               columns (the eval/train split)
    * @return (__id = TRAIN doc id, span_start, span_end)
    */
  def contaminationSpans(docsDf: DataFrame, idCol: String, toksCol: Column,
      isEval: Column, minLen: Int): DataFrame = {
    val toks = tokens(docsDf, idCol, toksCol)
    val full = rankedFullPositions(toks, minLen)
    val tags = docsDf.select(col(idCol).as("__id"), isEval.as("__ev"))
    val evalRanks = full.join(tags.where(col("__ev")), "__id")
      .select("__r").distinct()
    val trainPos = full.join(tags.where(!col("__ev")), "__id")
      .join(evalRanks, Seq("__r"), "left_semi")
      .select("__id", "__pos")
    mergeSpans(trainPos, minLen)
  }
}
