package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic lexical relevance scoring over a document corpus — TF-IDF
  * term weighting and BM25 ranked retrieval. The model-free relevance
  * layer of a training-data pipeline (query-focused corpus slicing,
  * retrieval-baseline labelling, term-importance features).
  *
  * Scale design: both operators are explode → partial-agg groupBy
  * chains — token rows combine map-side before any exchange, so the
  * shuffle carries O(doc × distinct-term) rows, never raw tokens. The
  * document-frequency side joins back by term: for BM25 the query's
  * term list is tiny and the join is `broadcast()`; for TF-IDF the
  * df table is vocabulary-sized (bounded, zipf-concentrated — still
  * orders of magnitude under the corpus) and shuffles on term with
  * partial aggregation already applied. Corpus-level scalars (N,
  * avgdl) are one-row aggregates, cross-joined broadcast.
  */
object Relevance {

  /** Per-document top TF-IDF term (smooth idf: ln((N+1)/(df+1))).
    *
    * The per-doc argmax is a `min_by` over (-weight, term) — a real
    * partial aggregation (one candidate row per map partition per
    * doc), NOT a rank window: at 100 TB the window form would sort
    * every (doc, term) pair inside doc-partitions; min_by reduces
    * map-side and shuffles one row per document.
    *
    * @return doc_id, top_term, tfidf (rounded 6 dp; ranking uses the
    *         full-precision weight, term-asc tie-break)
    */
  def topTfidfTerm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("double"))
      .where(col("__n") > 0)
    val tf = toks
      .select(col(idCol), col("__n"), explode(col("__toks")).as("term"))
      .groupBy(col(idCol), col("__n"), col("term"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val dfByTerm = tf.groupBy("term")
      .agg(count(lit(1)).cast("double").as("__df"))
    // N = |docs| over the RAW input: a zero-column count the scan
    // serves from parquet metadata — counting post-tokenize docs
    // instead would re-run the whole tokenize pipeline a third time
    val nDocs = docs.agg(count(lit(1)).cast("double").as("__nd"))
    // df joins BACK by term (broadcast — vocabulary-sized): the
    // window-by-term alternative would re-shuffle tf and serialize
    // every hot term ("the" ≈ every doc) into one partition
    val weighted = tf
      .join(dfByTerm, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("__w",
        col("__c") / col("__n") * log((col("__nd") + 1d) / (col("__df") + 1d)))
    weighted
      .groupBy(col(idCol))
      .agg(min_by(struct(col("term"), col("__w")),
        struct(negate(col("__w")), col("term"))).as("__top"))
      .select(col(idCol),
        col("__top.term").as("top_term"),
        round(col("__top.__w"), 6).as("tfidf"))
  }

  /** Per-document unigram negative log-likelihood — the language-model
    * perplexity quality filter (CCNet-style: score each document
    * against a corpus LM; outliers are boilerplate or noise). The LM
    * is the corpus's own add-one-smoothed unigram distribution:
    * p(t) = (c_t + 1) / (N + V).
    *
    * Scale shape: one explode + partial-agg count builds the
    * (vocabulary-sized, zipf-bounded) LM; scoring joins tokens to it
    * BROADCAST — the corpus never shuffles on token (a hot-token
    * shuffle would serialize "the" into one partition). Per-token
    * −ln p is scaled to integer millionths before the per-doc sum, so
    * the aggregate is bit-exact under ANY accumulation order. (Cross-
    * engine portability additionally rests on ln() agreeing to the
    * floor boundary — libm vs Math.log can differ by an ulp, which
    * floor(x·1e6) would amplify to ±1; astronomically unlikely per
    * token type, but not impossible.)
    *
    * @return doc_id, n_tok, nll_micro (mean −ln p per token in integer
    *         millionths — pure integer arithmetic end-to-end, so no
    *         engine rounding convention can flip a boundary)
    */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("__tk"))
    val counts = toks.groupBy(col("__tk"))
      .agg(count(lit(1)).as("__c"))
    val stats = counts.agg(
      sum(col("__c")).cast("double").as("__nn"),
      count(lit(1)).cast("double").as("__vv"))
    toks
      .join(broadcast(counts), "__tk")
      .crossJoin(broadcast(stats))
      .withColumn("__li",
        floor(negate(log((col("__c") + 1L) / (col("__nn") + col("__vv"))))
          * 1000000d).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"), sum(col("__li")).as("__sli"))
      .select(col(idCol), col("n_tok"),
        expr("__sli div n_tok").as("nll_micro"))
  }

  /** Per-document CONDITIONAL bigram negative log-likelihood — the
    * next-order LM quality filter next to [[unigramNll]] (KenLM-style
    * scoring, truncated to order 2): p(w2|w1) = (c(w1w2) + 1) /
    * (c(w1·) + V), add-one smoothed over the token vocabulary, where
    * c(w1·) is w1's count as a LEFT context (= Σ bigram counts
    * starting with w1) and V the corpus unigram vocabulary size.
    * Repetitive boilerplate scores low (its bigrams dominate their
    * left contexts); token-salad noise scores high.
    *
    * Scale shape mirrors unigramNll: the per-bigram log-probs are
    * precomputed ONCE on the (zipf-bounded) bigram-vocabulary table —
    * c1 derived from c2 by a groupBy on the left token, never a second
    * corpus pass — and joined to the bigram stream broadcast, so the
    * corpus never shuffles on a hot bigram. (If the bigram vocabulary
    * outgrows broadcast range at extreme scale, the same plan with a
    * shuffle join on the bigram key is the fallback; scores are
    * integer micro-units either way, so any accumulation order gives
    * the identical per-doc sum.) Documents shorter than 2 tokens fall
    * back to their whole text as a single pseudo-bigram (the
    * word_shingles contract), so every document scores.
    *
    * @return doc_id, n_bigrams, nll_micro (mean −ln p per bigram in
    *         integer millionths)
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bigrams = docs
      .select(col(idCol), explode(expr(s"word_shingles($textCol, 2)")).as("__bg"))
    val c2 = bigrams.groupBy(col("__bg"))
      .agg(count(lit(1)).as("__c2"))
      .withColumn("__w1", element_at(split(col("__bg"), " "), 1))
    val c1 = c2.groupBy(col("__w1")).agg(sum(col("__c2")).as("__c1"))
    val vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("__tk"))
      .agg(countDistinct(col("__tk")).cast("double").as("__vv"))
    val lm = c2
      .join(broadcast(c1), "__w1")
      .crossJoin(broadcast(vocab))
      .withColumn("__li",
        floor(negate(log((col("__c2") + 1L) / (col("__c1") + col("__vv"))))
          * 1000000d).cast("long"))
      .select("__bg", "__li")
    bigrams
      .join(broadcast(lm), "__bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__li")).as("__sli"))
      .select(col(idCol), col("n_bigrams"),
        expr("__sli div n_bigrams").as("nll_micro"))
  }

  /** Per-document INTERPOLATED KNESER-NEY bigram negative
    * log-likelihood — the state-of-the-art n-gram smoothing (Kneser &
    * Ney 1995; Chen & Goodman 1999) above [[bigramNll]]'s add-one:
    * instead of backing off to raw unigram frequency, the lower-order
    * weight is the CONTINUATION probability — how many distinct
    * contexts a word follows ("francisco" is frequent but nearly
    * always after "san", so it gets almost no backoff mass). With
    * discount D = ¾ the whole model is ONE exact rational per bigram:
    *
    *   p(w₂|w₁) = [max(4·c(w₁w₂) − 3, 0)·B + 3·N1+(w₁·)·N1+(·w₂)]
    *              / (4·c(w₁·)·B)
    *
    * where N1+(w₁·)/N1+(·w₂) are distinct right/left continuation
    * counts and B the number of bigram types — so −ln p is a
    * difference of micro-logs of exact integers (the q77/q103 idiom)
    * and every per-doc sum is order-independent.
    *
    * Scale shape mirrors [[bigramNll]]: all model tables (c2, the
    * left/right continuation counts, B) derive from the ONE bigram-
    * vocabulary table — never a second corpus pass; per-bigram scores
    * are precomputed on that zipf-bounded table and joined to the
    * bigram stream broadcast, so the corpus never shuffles on a hot
    * bigram.
    *
    * @return doc_id, n_bigrams, nll_micro (mean −ln p per bigram in
    *         integer millionths)
    */
  def kneserNeyNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bigrams = docs
      .select(col(idCol), explode(expr(s"word_shingles($textCol, 2)")).as("__bg"))
    val c2 = bigrams.groupBy(col("__bg"))
      .agg(count(lit(1)).as("__c2"))
      .withColumn("__w1", element_at(split(col("__bg"), " "), 1))
      // single-token fallback docs yield a one-word "bigram": score it
      // as (w, w) so the model stays total over the document domain
      .withColumn("__w2", coalesce(element_at(split(col("__bg"), " "), 2),
        element_at(split(col("__bg"), " "), 1)))
    val leftC = c2.groupBy("__w1")
      .agg(sum("__c2").as("__c1"), count(lit(1)).as("__n1r"))
    val rightC = c2.groupBy("__w2").agg(count(lit(1)).as("__n1l"))
    val btypes = c2.agg(count(lit(1)).as("__bt"))
    val lm = c2
      .join(broadcast(leftC), "__w1")
      .join(broadcast(rightC), "__w2")
      .crossJoin(broadcast(btypes))
      .withColumn("__num",
        greatest(lit(0L), col("__c2") * 4 - 3) * col("__bt")
          + lit(3L) * col("__n1r") * col("__n1l"))
      .withColumn("__den", lit(4L) * col("__c1") * col("__bt"))
      .withColumn("__li",
        floor(log(col("__den").cast("double")) * 1000000d).cast("long")
          - floor(log(col("__num").cast("double")) * 1000000d).cast("long"))
      .select("__bg", "__li")
    bigrams
      .join(broadcast(lm), "__bg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__li")).as("__sli"))
      .select(col(idCol), col("n_bigrams"),
        expr("__sli div n_bigrams").as("nll_micro"))
  }

  /** BM25 constants (the standard Robertson defaults). */
  val K1 = 1.2d
  val B = 0.75d

  /** BM25 top-k retrieval for a fixed bag of query terms.
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term score
    * tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl)), summed over query
    * terms present in the document. Only tokens matching the query
    * set survive the explode (scan-side filter), so the groupBy
    * carries ≤ |terms| rows per document; df/avgdl/N stats are
    * broadcast. Final top-k is a TakeOrdered, not a full sort.
    *
    * @return doc_id, score (rounded 6 dp), ranked by (score desc,
    *         doc_id) — full-precision ordering, k rows
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__len", size(col("__toks")).cast("double"))
      .where(col("__len") > 0)
    val stats = toks.agg(
      count(lit(1)).cast("double").as("__nd"),
      avg(col("__len")).as("__avgdl"))
    val tf = toks
      .select(col(idCol), col("__len"), explode(col("__toks")).as("term"))
      .where(col("term").isin(terms.map(lit): _*))
      .groupBy(col(idCol), col("__len"), col("term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfByTerm = tf.groupBy("term")
      .agg(count(lit(1)).cast("double").as("__df"))
    tf
      .join(broadcast(dfByTerm), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1d) + (col("__nd") - col("__df") + 0.5d) / (col("__df") + 0.5d)))
      .withColumn("__s",
        col("__idf") * (col("__tf") * lit(K1 + 1d)) /
          (col("__tf") + lit(K1) * (lit(1d - B) + lit(B) * col("__len") / col("__avgdl"))))
      // ordered fold, not sum(): per-doc term rows arrive in partition
      // order, and FP addition is not associative — sorting the ≤|terms|
      // pairs by term first makes the score bit-deterministic (and
      // DuckDB-reproducible)
      .groupBy(col(idCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("__s")))),
        lit(0d), (acc, x) => acc + x.getField("__s")).as("__score"))
      .orderBy(col("__score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("__score"), 6).as("score"))
  }
}
