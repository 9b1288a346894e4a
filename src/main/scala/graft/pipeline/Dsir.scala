package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR — Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by its log importance
  * weight `log p_target(x) − log p_raw(x)` under bag-of-hashed-n-gram
  * models fitted to a TARGET corpus (the distribution you want more
  * of — e.g. the formal/English slice) and the RAW corpus, then keep
  * the top-k. This is the pretraining-mix selection step between
  * dedup and tokenization: heuristic filters (q26) say "good enough",
  * DSIR says "distributed like the data I actually want".
  *
  * Faithful to the paper's estimator: features are hashed unigrams +
  * bigrams (the hashing trick bounds the model at `buckets`
  * parameters no matter the vocabulary); both models are add-one
  * smoothed multinomials over the buckets; a document's weight is the
  * sum of its feature OCCURRENCES' log-ratios. The paper then samples
  * ∝ weight; the deterministic engine surface is the top-k cut (the
  * Gumbel-resampling variant reduces to exactly this under a fixed
  * seed, and top-k is what production selection runs use).
  *
  * Scale shape (the reason this survives 100 TB):
  *   1. ONE explode pass builds BOTH bucket histograms — the target
  *      count is a `sum(when(isTarget,1))` riding the same partial
  *      agg, so the corpus is never scanned separately per model.
  *      The aggregate is bounded at `buckets` rows regardless of
  *      corpus size.
  *   2. The per-bucket log-ratio table (`buckets` rows) broadcasts;
  *      scoring is a scan-side hash + broadcast lookup — the corpus
  *      never shuffles on a feature key (a hot token would serialize
  *      into one partition otherwise, the q77 argument).
  *   3. The only corpus-sized shuffle is the per-doc partial-agg sum;
  *      the final cut is TakeOrdered (heap, no global sort).
  * Per-feature log-ratios are floor(ln·1e6) integer micros BEFORE the
  * per-doc sum, so the aggregate is bit-exact under any accumulation
  * order (q77's cross-engine determinism contract).
  */
object Dsir {

  /** Strict bigram strings `"w_i w_i+1"` of a token array — empty for
    * single-token docs (unlike [[TextOps.shingles]]'s short-doc
    * fallback, which would double-count the lone unigram here).
    */
  private def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "),
          element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** (__id, __t, __b) — one row per hashed unigram/bigram occurrence,
    * `__t` the target-membership flag, `__b` = md5-hash bucket.
    */
  private def featureBuckets(docs: DataFrame, idCol: String,
      textCol: String, isTarget: Column, buckets: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"), isTarget.as("__t"),
      TextOps.tokens(col(textCol)).as("__tk"))
    toks.select(col("__id"), col("__t"),
      explode(concat(col("__tk"), bigrams(col("__tk")))).as("__f"))
      .withColumn("__b", expr("pmod(cast(conv(substring(md5(__f), 1, 8), " +
        s"16, 10) as bigint), $buckets)"))
      .drop("__f")
  }

  /** Per-document importance log-weights: (__id, n_feat, lw_micro)
    * for EVERY input document — lw_micro = Σ_features
    * [floor(ln p̂_target · 1e6) − floor(ln p̂_raw · 1e6)], both models
    * add-one smoothed over `buckets`. Positive ⇒ target-like.
    */
  def logWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, "dsir needs at least two hash buckets")
    val feats = featureBuckets(docs, idCol, textCol, isTarget, buckets)
    val hist = feats.groupBy("__b").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
    val tot = hist.agg(sum("__cr").cast("double").as("__tr"),
      sum("__ct").cast("double").as("__tt"))
    val lr = hist.crossJoin(broadcast(tot)).select(col("__b"),
      (floor(log((col("__ct") + 1d) / (col("__tt") + buckets)) * 1000000d)
        .cast("long")
        - floor(log((col("__cr") + 1d) / (col("__tr") + buckets)) * 1000000d)
          .cast("long")).as("__lrm"))
    feats.join(broadcast(lr), "__b")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_feat"),
        sum("__lrm").cast("long").as("lw_micro"))
  }

  /** The selection: top-`k` documents by (lw_micro DESC, id ASC) —
    * plans as TakeOrderedAndProject, never a global sort.
    */
  def select(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int, k: Int): DataFrame =
    logWeights(docs, idCol, textCol, isTarget, buckets)
      .orderBy(col("lw_micro").desc, col("__id"))
      .limit(k)
}
