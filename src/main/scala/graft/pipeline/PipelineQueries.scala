package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** LLM-training-data pipeline queries over the `documents` and
  * `embeddings` testdata tables, with DuckDB oracles (driver t2 gate).
  *
  * The reference pipeline feeds a lakehouse; these are the operations
  * a 100 TB training-data curation run needs on top of it: dedup,
  * similarity search, text analysis. Oracle portability rules: only
  * engine-agnostic primitives (md5, arithmetic, regex, CASE), doubles
  * rounded to 6 dp, every query totally ordered.
  */
object PipelineQueries {

  // The documents table arrives as one parquet file at test scale —
  // a single input split. Rebalance before the md5/signature-heavy
  // per-row work so it uses every core; at warehouse scale the corpus
  // arrives in thousands of splits and this repartition is a cheap
  // guard against small/skewed file layouts.
  private[pipeline] def docs(s: SparkSession, d: String) =
    Tables.load(s, d, "documents").repartition(s.sparkContext.defaultParallelism)
  private[pipeline] def embs(s: SparkSession, d: String) = Tables.load(s, d, "embeddings")

  /** documents ∪ (documents with shifted ids): the testdata has no
    * natural duplicates, so dedup queries run on a corpus where every
    * text provably appears twice — the dedup must remove exactly half.
    */
  private def docsWithDups(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    base.unionByName(base.select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** The documents corpus re-cast as binary media rows (payload =
    * UTF-8 text bytes, duration = n_chars ms) — the shared fixture for
    * the oracle-gated multimodal queries (q48/q49).
    */
  private def docsAsMedia(s: SparkSession, d: String,
      kind: String): org.apache.spark.sql.Dataset[Multimodal.Media] = {
    import s.implicits._
    docs(s, d).select(
      col("doc_id").as("media_id"), lit(kind).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(0).as("width"), lit(0).as("height"), lit(0).as("sample_rate"),
      col("n_chars").cast("long").as("duration_ms"),
      lit("utf8").as("format")).as[Multimodal.Media]
  }

  /** The repeat-co-purchase part graph: undirected (lo, hi) edges
    * between parts that appear together in ≥ 2 order baskets. Pair
    * generation is a WITHIN-ORDER self join — cost Σ C(basket, 2),
    * basket ≤ ~13 lines, LINEAR in orders — and the w ≥ 2 threshold
    * drops the chance-co-occurrence noise floor (at sf0.01: 116 k raw
    * pairs → 3.4 k repeat edges), which is what makes the downstream
    * graph operators (k-core q273, Adamic–Adar q274) run on a sparse
    * signal graph instead of a dense accident graph.
    */
  private def repeatCoEdges(s: SparkSession, d: String): DataFrame = {
    val items = Tables.load(s, d, "lineitem")
      .select(col("l_orderkey").cast("long").as("oid"),
        col("l_partkey").cast("long").as("item"))
      .distinct()
    items.toDF("oid", "a").join(items.toDF("oid", "b"), "oid")
      .where(col("a") < col("b"))
      .groupBy(col("a").as("lo"), col("b").as("hi"))
      .agg(count(lit(1)).as("w"))
      .where(col("w") >= 2L)
      .select("lo", "hi")
  }

  // duckdb fragment mirroring repeatCoEdges
  private val coEdgeCte =
    "SELECT a.item AS lo, b.item AS hi FROM it a JOIN it b " +
      "ON a.oid = b.oid AND a.item < b.item GROUP BY 1, 2 " +
      "HAVING COUNT(*) >= 2"
  private val itemsCte =
    "SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS oid, " +
      "CAST(l_partkey AS BIGINT) AS item FROM lineitem"

  // duckdb fragment mirroring docsWithDups
  private val dupCte =
    "SELECT doc_id, text FROM documents " +
      "UNION ALL SELECT doc_id + 100000, text FROM documents"

  // duckdb fragment mirroring SetSimJoin's DISTINCT shingle sets
  // exploded to (doc_id, t) rows + per-doc set sizes, over a CTE
  // named `d` (the dup corpus). A def, not a val: it interpolates
  // duckNorm, which is declared further down — a val here would
  // capture null at object-init time.
  private def duckShingleSetCtes =
    s"nn AS (SELECT doc_id, $duckNorm AS ntext FROM d), " +
      "tkk AS (SELECT doc_id, string_split(ntext, ' ') AS toks FROM nn), " +
      "sh0 AS (SELECT doc_id, CASE WHEN len(toks) < 3 " +
      "THEN [array_to_string(toks, ' ')] " +
      "ELSE list_transform(range(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh " +
      "FROM tkk), " +
      "e AS (SELECT doc_id, unnest(list_distinct(sh)) AS t FROM sh0), " +
      "sz AS (SELECT doc_id, count(*) AS sz FROM e GROUP BY 1)"
  // duckdb fragment mirroring TextOps.norm
  private[pipeline] val duckNorm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** q377's pinned RBO weight ladder: w_d = (1−p)·p^(d−1) at p = 0.9
    * in floored micros, d = 1..10 — computed once here and
    * interpolated into BOTH engines (the q317 convention), so no
    * runtime pow crosses the gate.
    */
  private val RboWeights: Seq[Long] = (1 to 10).map(dd =>
    math.floor(0.1 * math.pow(0.9, dd - 1) * 1e6).toLong)

  /** q235's planted boilerplate: an 18-token repetitive sales banner
    * (6 distinct tokens) prepended to every third document — crushes
    * type-token ratio and stopword share, shifts mean token length.
    */
  private val SpamBanner = Seq.fill(3)("free offer click now buy cheap")
    .mkString(" ")

  /** q247's blocklist: the spam-banner vocabulary plus a decoy
    * ('winner') that never occurs — its pinned zero count proves
    * absent patterns report 0, not null.
    */
  private val BlockPatterns =
    Seq("free", "offer", "click", "now", "buy", "cheap", "winner")

  /** q240's DCG gain ladder: gain(i) = 10¹² div ⌊log2(i+1)·10⁶⌋ for
    * ranks 1..10, computed ONCE here and interpolated into both the
    * Spark plan and the DuckDB oracle as integer literals — the gate
    * never depends on two engines' log() agreeing.
    */
  private val DcgGains: Seq[Long] = (1 to 10).map { i =>
    1000000000000L / math.floor(math.log(i + 1d) / math.log(2d) * 1e6).toLong
  }
  private val IdcgAt10: Long = DcgGains.sum

  /** q321's pinned Bloom sizing factor ⌊−ln(0.01)/(ln 2)²·10⁶⌋ —
    * bits-per-key for a 1 % target fpp, interpolated into both
    * engines (ln 2 micros = 693147 rides next to it for the hash
    * count).
    */
  private val BloomBitsFactorMicro: Long =
    math.floor(-math.log(0.01) / (math.log(2d) * math.log(2d)) * 1e6).toLong

  /** q307's pinned A-Res uniform denominator ⌊ln(10⁶+1)·10⁶⌋ —
    * constant, so it is interpolated into BOTH engines as a literal
    * (only ln(num) over the ≤10⁶ integer domain stays runtime, under
    * MicroLogBoundarySpec's ≥16-ulp audit).
    */
  private val AresLnDen: Long = math.floor(math.log(1000001d) * 1e6).toLong

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q235 — TRAINABLE QUALITY CLASSIFIER: the GPT-3/CCNet recipe — a
    // linear model over cheap surface features, trained to separate
    // clean documents from boilerplate/spam, then used to score and
    // filter the corpus. The testdata has no spam, so the harness
    // PLANTS it (the q130/docsWithDups pattern): every third document
    // gets a repetitive 18-token sales banner prepended and is labeled
    // 0; the model must recover the plant from GENERIC surface
    // features only — periodic-repetition ratio (tokens equal to the
    // token six positions back — the q56-family repetition signal; no
    // banner-keyword feature), type-token ratio, stopword ratio. The
    // model is logistic-shaped with a HARD sigmoid (clamp(z/4+½, 0,
    // 1)) so every engine's arithmetic is identical — no exp()
    // crosses engines; the gate replays ALL 12 training rounds.
    // Training is synchronous full-batch gradient descent in integer
    // micros: z = Σwⱼxⱼ div 10⁶, err = hardσ(z) − y·10⁶, Δwⱼ =
    // (η·Σ err·xⱼ) div (n·10⁶) with η=4 and truncating division
    // everywhere. Features are rescaled to a common ~10⁶ range and
    // MEAN-CENTERED (one extra partial-agg pass; integer micro means)
    // — uncentered, the bias direction dominates every gradient and
    // full-batch GD oscillates without separating; centered, the same
    // 12 rounds climb monotonically from the 336/500 base rate to
    // 496/500. Scale shape: features are scan-side (tokenize +
    // distinct/shift-compare counts) cached ONCE; each round is ONE
    // partial-agg job whose shuffle carries a single 4-cell gradient
    // row — only the weight vector crosses the driver (the
    // bounded-by-design q224 contract), the corpus never moves.
    // Gradient sums are rows·10¹² so they run in decimal(38) (HUGEINT
    // in the oracle) and collapse to int64 after the η/n division.
    // Per-round train accuracy (predict z ≥ 0) makes convergence
    // itself part of the gated output.
    "q235_quality_classifier" -> ((s, d) => {
      val base = docs(s, d).select(
        when(col("doc_id") % 3 === 0, 0L).otherwise(1L).as("y"),
        TextOps.tokens(when(col("doc_id") % 3 === 0,
          concat(lit(SpamBanner + " "), col("text")))
          .otherwise(col("text"))).as("toks"))
      val raw = base.select(col("y"),
          size(col("toks")).cast("long").as("nt"),
          size(array_distinct(col("toks"))).cast("long").as("nd"),
          expr("case when size(toks) > 6 then cast(size(filter(" +
            "sequence(1, size(toks) - 6), " +
            "i -> element_at(toks, i) = element_at(toks, i + 6))) " +
            "as bigint) else 0L end").as("r6"),
          TextOps.markerScore(col("toks"),
            Seq("the", "a", "and", "of")).cast("long").as("m"))
        .select(col("y"),
          expr("r6 * 4000000 div nt").as("f1"),
          expr("nd * 1000000 div nt").as("f2"),
          expr("m * 4000000 div nt").as("f3"))
      val mu = raw.agg(expr("sum(f1) div count(1)").as("mu1"),
        expr("sum(f2) div count(1)").as("mu2"),
        expr("sum(f3) div count(1)").as("mu3")).head()
      val feats = raw.select(col("y"), lit(1000000L).as("x0"),
          (col("f1") - mu.getLong(0)).as("x1"),
          (col("f2") - mu.getLong(1)).as("x2"),
          (col("f3") - mu.getLong(2)).as("x3"))
        .persist()
      def zSql(w: Seq[Long]): String =
        "(" + w.zipWithIndex.map { case (wi, j) => s"${wi}L * x$j" }
          .mkString(" + ") + ") div 1000000"
      var w: Seq[Long] = Seq.fill(4)(0L)
      val out = (1 to 12).map { r =>
        val errSql =
          s"least(greatest((${zSql(w)}) div 4 + 500000, 0), 1000000) " +
            "- y * 1000000"
        val gradExprs = (0 to 3).map(j => expr(
          s"cast((4 * sum(cast(($errSql) as decimal(38,0)) * x$j)) div " +
            s"(count(1) * 1000000) as bigint)").as(s"d$j"))
        val g = feats.agg(gradExprs.head, gradExprs.tail: _*).head()
        w = w.zipWithIndex.map { case (wi, j) => wi - g.getLong(j) }
        val acc = feats.agg(count(lit(1)).as("n"),
          sum(expr(s"case when ((${zSql(w)}) >= 0) = (y = 1) " +
            "then 1L else 0L end")).as("nc")).head()
        (r.toLong, w(0), w(1), w(2), w(3), acc.getLong(1), acc.getLong(0))
      }
      feats.unpersist()
      s.createDataFrame(out)
        .toDF("step", "w0", "w1", "w2", "w3", "n_correct", "n")
        .orderBy("step")
    }),

    // q225 — LATE-INTERACTION (MaxSim) RETRIEVAL: ColBERT's scoring
    // rule — score(q, d) = Σ_{query token} max_{doc token} cos — over
    // multi-vector documents (here: 8 consecutive embedding rows per
    // pseudo-doc, vec_id div 8). The multi-vector tier above q16's
    // single-vector cosine: a query token matches its BEST counterpart
    // per document, so partial phrase overlap scores where a pooled
    // single vector washes out. Per-token maxima round to 6 dp and
    // fold to integer micros BEFORE the per-doc sum (order-exact
    // cross-engine; the q77 idiom), top-5 docs per query. Plan: the
    // ≤24-row query-token side is broadcast; the corpus token table
    // is scanned ONCE, the (qtoken × doc) maxima and per-doc sums are
    // both partial-agg groupBys — no shuffle ever carries raw
    // embeddings, and at 100 TB the corpus side behaves exactly like
    // q16's scan (ANN-bucket the corpus first to cut the candidate
    // set; this is the exact-scoring stage).
    "q225_maxsim_rerank" -> ((s, d) => {
      val tok = embs(s, d).select(expr("vec_id div 8").as("did"),
        col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val qt = tok.where(col("did") < 3)
        .select(col("did").as("qdid"), col("vec_id").as("qvid"),
          col("emb").as("qemb"))
      val best = tok.join(broadcast(qt), col("did") =!= col("qdid"))
        .select(col("qdid"), col("qvid"), col("did"),
          round(Similarity.cosine(col("emb"), col("qemb")), 6).as("c"))
        .groupBy("qdid", "qvid", "did")
        .agg(max(col("c")).as("mx"))
        .select(col("qdid"), col("did"),
          round(col("mx") * 1000000).cast("long").as("mxm"))
      val scores = best.groupBy("qdid", "did")
        .agg(sum("mxm").as("score_micro"))
      val wf = Window.partitionBy("qdid")
        .orderBy(col("score_micro").desc, col("did"))
      scores.withColumn("rn", row_number().over(wf))
        .where(col("rn") <= 5)
        .select("qdid", "did", "score_micro")
        .orderBy("qdid", "did")
    }),

    // q226 — RECIPROCAL RANK FUSION: the standard hybrid-retrieval
    // combiner (Cormack et al. 2009) — fuse two rankings of the same
    // candidates by Σ 1/(60+rank), rank-only so incomparable scores
    // (lexical vs dense, cosine vs distance) need no calibration.
    // Here the two legs rank the q16 corpus for the same queries by
    // cosine (angle) and by L2 distance (magnitude-sensitive — the
    // legs genuinely disagree on unnormalized vectors). Ranks come
    // from row_number over 6-dp-rounded scores with vec_id
    // tie-break; RRF contributions are integer micros (10⁶ div
    // (60+rank)), summed exactly. Both rank windows partition by the
    // (broadcast) query id — the brute-force tier, same contract as
    // q16: at scale each leg is an ANN list (q22/q63) and the fusion
    // runs on the short candidate union instead.
    "q226_rrf_fusion" -> ((s, d) => {
      val e = embs(s, d).select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("emb").as("qemb"))
      val sims = e.join(broadcast(q), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(Similarity.cosine(col("emb"), col("qemb")), 6).as("cosv"),
          round(Similarity.dot(col("emb"), col("emb"))
            - lit(2d) * Similarity.dot(col("emb"), col("qemb"))
            + Similarity.dot(col("qemb"), col("qemb")), 6).as("d2"))
      val wc = Window.partitionBy("qid")
        .orderBy(col("cosv").desc, col("vec_id"))
      val wl = Window.partitionBy("qid")
        .orderBy(col("d2").asc, col("vec_id"))
      val ranked = sims
        .withColumn("rank_cos", row_number().over(wc).cast("long"))
        .withColumn("rank_l2", row_number().over(wl).cast("long"))
        .withColumn("rrf_micro", expr(
          "1000000 div (60 + rank_cos) + 1000000 div (60 + rank_l2)"))
      val wf = Window.partitionBy("qid")
        .orderBy(col("rrf_micro").desc, col("vec_id"))
      ranked.withColumn("rn", row_number().over(wf))
        .where(col("rn") <= 10)
        .select("qid", "vec_id", "rank_cos", "rank_l2", "rrf_micro")
        .orderBy("qid", "vec_id")
    }),

    // q234 — LSH RECALL/PRECISION AUDIT: q230's meta-evaluation
    // pattern turned on the DEDUP family — how many true near-dup
    // pairs (exact shingle-set Jaccard ≥ 0.8 over ALL pairs sharing a
    // shingle) does the banded MinHash path (q17 candidates → q18
    // verify) actually recover, and how selective are the raw
    // candidates? The verified set is a subset of the truth by
    // construction, so recall = |verified|/|exact| and precision =
    // |verified|/|candidates| in integer micros. The exact leg's pair
    // generator is the shared-shingle join (bounded by Σ df², the
    // q117 candidate argument) — never a corpus cross join — and the
    // whole audit runs on a DOC SAMPLE (doc_id % 4, dup plants kept):
    // the exact leg is inherently Σdf²-quadratic, which is the point
    // of the measurement and exactly why production audits a sample
    // and extrapolates (the q246 contract; unsampled this was 43 s at
    // sf0.1 — 16× the sampled cost for the same estimate).
    "q234_lsh_recall" -> ((s, d) => {
      val base = {
        val b = docs(s, d).where(col("doc_id") % 4 === 0)
          .select(col("doc_id"), col("text"))
        b.unionByName(b.select((col("doc_id") + 100000).as("doc_id"),
          col("text")))
      }
      val texts = base.select(col("doc_id"), col("text"))
      val sh = base.select(col("doc_id"),
        explode(array_distinct(expr("word_shingles(text, 3)"))).as("t"))
      val allPairs = sh.toDF("doc_a", "t")
        .join(sh.toDF("doc_b", "t"), "t")
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val exact = allPairs
        .join(texts.toDF("doc_a", "text_a"), "doc_a")
        .join(texts.toDF("doc_b", "text_b"), "doc_b")
        .where(round(expr("shingle_jaccard(text_a, text_b, 3)"), 6) >= 0.8)
        .select("doc_a", "doc_b")
      val cand = NearDup.candidatePairs(base, "doc_id", "text")
      val ver = NearDup.jaccardPairs(base, "doc_id", "text", threshold = 0.8)
        .select("doc_a", "doc_b")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
        .crossJoin(ver.agg(count(lit(1)).as("n_verified")))
        .select(col("n_exact"), col("n_candidates"), col("n_verified"),
          expr("n_verified * 1000000 div n_exact").as("recall_micro"),
          expr("n_verified * 1000000 div n_candidates").as("precision_micro"))
    }),

    // q232 — LSH BAND-LEVEL AUDIT (fills the numbering gap, in its
    // audit-family neighborhood): per-BAND candidate volume and
    // verify precision of the MinHash blocking — the tuning signal
    // behind the (bands × rows) trade every LSH deployment makes
    // (more bands ⇒ recall up, per-band precision down; a band whose
    // precision collapses is wasted candidate budget). Distinct pairs
    // per band (the same bucket-expansion shape as candidatePairs,
    // keeping the band id), verified at the q17/q18 threshold. Work
    // is Σ bucket² per band — the LSH contract — plus one bounded
    // per-band fold.
    "q232_lsh_band_audit" -> ((s, d) => {
      val base = docsWithDups(s, d)
      val texts = base.select(col("doc_id"), col("text"))
      val cand = NearDup.bands(base, "doc_id", "text")
        .groupBy("band", "key")
        .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")) > 1)
        .select(col("band"), explode(expr(
          "flatten(transform(ids, (x, i) -> " +
            "transform(slice(ids, i + 2, size(ids)), " +
            "y -> struct(x as doc_a, y as doc_b))))")).as("p"))
        .select(col("band"), col("p.doc_a"), col("p.doc_b"))
        .distinct()
      cand
        .join(texts.toDF("doc_a", "text_a"), "doc_a")
        .join(texts.toDF("doc_b", "text_b"), "doc_b")
        .withColumn("ok",
          when(round(expr("shingle_jaccard(text_a, text_b, 3)"), 6) >= 0.8,
            1L).otherwise(0L))
        .groupBy("band")
        .agg(count(lit(1)).as("n_candidates"), sum("ok").as("n_verified"))
        .select(col("band").cast("long").as("band"), col("n_candidates"),
          col("n_verified"),
          expr("n_verified * 1000000 div n_candidates")
            .as("precision_micro"))
        .orderBy("band")
    }),

    // q229 — LEAKAGE-SAFE CV FOLD SPLIT: the evaluation-hygiene twin
    // of q126's per-document split. A near-duplicate pair scattered
    // across train/eval folds leaks the answer (the Lee et al./
    // decontamination failure mode INSIDE one corpus), so folds must
    // be assigned per near-dup CLUSTER, not per document. Composes
    // the q38 cluster machinery (LSH candidates → verified pairs →
    // min-label connected components) with the q126 md5 assignment,
    // hashed on the CLUSTER representative — every member lands in
    // the same fold by construction, stable under corpus growth. The
    // output reports, per cluster, how many folds the naive per-doc
    // hash would have scattered it across (n_folds_naive > 1 = the
    // leaks prevented). Scale: adds one bounded groupBy on top of the
    // measured q38 pipeline (α 0.37).
    "q229_leakage_safe_split" -> ((s, d) => {
      val base = docsWithDups(s, d)
      val pairs = NearDup.jaccardPairs(base, "doc_id", "text", threshold = 0.8)
      val lab = Cluster.connectedComponents(
        base.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b")
      def fold(c: Column) = conv(substring(md5(concat(lit("cvf:"),
        c.cast("string"))), 1, 8), 16, 10).cast("long") % 10
      lab.groupBy("cluster")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(fold(col("doc_id"))).as("n_folds_naive"))
        .select(col("cluster"), col("n_docs"), col("n_folds_naive"),
          fold(col("cluster")).as("fold_safe"))
        .orderBy("cluster")
    }),

    // q270 — ASSOCIATION RULES (Apriori on order baskets): the
    // market-basket classic — pair support from a WITHIN-ORDER self
    // join (cost Σ C(basket,2), basket ≤ ~13 lines ⇒ LINEAR in
    // orders, never |parts|²), repeat-co-occurrence pairs (supp ≥ 2)
    // kept, both rule directions scored: confidence = supp(A∪B)/
    // supp(A) and lift = N·supp(A∪B)/(supp(A)·supp(B)) in integer
    // micros (lift through decimal(38) — N·supp products overflow
    // int64 at warehouse scale). Top-20 by lift is TakeOrdered with a
    // full (lift, ante, cons) tie order — the candidate space never
    // sorts globally.
    "q270_assoc_rules" -> ((s, d) => {
      val items = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").cast("long").as("oid"),
          col("l_partkey").cast("long").as("item"))
        .distinct()
      val nOrd = items.agg(countDistinct("oid").as("n_orders"))
      val supp1 = items.groupBy("item").agg(count(lit(1)).as("supp"))
      val ia = items.toDF("oid", "item_a")
      val ib = items.toDF("oid", "item_b")
      val pairs = ia.join(ib, "oid")
        .where(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b").agg(count(lit(1)).as("supp_ab"))
        .where(col("supp_ab") >= 2L)
      val rules = pairs
        .select(col("item_a").as("ante"), col("item_b").as("cons"),
          col("supp_ab"))
        .unionByName(pairs.select(col("item_b").as("ante"),
          col("item_a").as("cons"), col("supp_ab")))
      rules
        .join(supp1.toDF("ante", "supp_ante"), "ante")
        .join(supp1.toDF("cons", "supp_cons"), "cons")
        .crossJoin(broadcast(nOrd))
        .select(col("ante"), col("cons"), col("supp_ab"),
          expr("supp_ab * 1000000 div supp_ante").as("conf_micro"),
          expr("cast(supp_ab as decimal(38,0)) * n_orders * 1000000 " +
            "div (cast(supp_ante as decimal(38,0)) * supp_cons)")
            .cast("long").as("lift_micro"))
        .orderBy(desc("lift_micro"), col("ante"), col("cons"))
        .limit(20)
    }),

    // q273 — K-CORE DECOMPOSITION (the dense-nucleus extractor): the
    // 3-core of the repeat-co-purchase graph — the maximal subgraph
    // where every part keeps ≥ 3 repeat partners. See [[KCore]] for
    // the synchronous-peel model (per-round partial-agg degrees + two
    // node-keyed semi-joins, checkpointed lineage, exact edge-count
    // convergence, loud failure on a round budget) and
    // [[repeatCoEdges]] for why the w ≥ 2 threshold makes the graph
    // sparse enough to mean something. Oracle: the peel unrolled as a
    // MATERIALIZED CTE chain long enough to reach the fixpoint
    // (idempotent after convergence, so extra rounds are no-ops).
    // Data note: at sf0.01 the 3-core is 935 parts; at sf0.1 it is
    // legitimately EMPTY — TPC-H picks parts uniformly, so repeat
    // co-purchase density falls as orders/|parts|² and the peel
    // (correctly) dissolves everything. A Zipfian real-world catalog
    // keeps its core; the operator reports what the data supports.
    "q273_kcore" -> ((s, d) =>
      KCore.core(repeatCoEdges(s, d), k = 3, "lo", "hi")
        .select(col("node").as("item"), col("core_deg"))
        .orderBy("item")),

    // q274 — ADAMIC-ADAR LINK PREDICTION (hub-capped): the classic
    // common-neighbor score Σ_w 1/ln(deg w) over wedges of the
    // repeat-co-purchase graph — rare shared partners count more than
    // promiscuous ones. Every wedge center has deg ≥ 2 by
    // construction (it touches both endpoints), so ln(deg) ≥ ln 2 and
    // the per-center weight is the exact integer 10¹² div ml(deg)
    // (ml = floor(ln·10⁶), the q77 micro-log idiom). Wedge centers
    // are CAPPED at deg ≤ 64 — the standard AA deployment cut: a hub
    // neighbor contributes ≤ 1/ln 65 ≈ 0.24 per wedge but deg² wedge
    // COST, so the cap drops the lowest-information terms and bounds
    // enumeration at 64·|E| (measured: uncapped α_tail was 2.64 on
    // the ×4 densified graph, 80.8 s — the cap is load-bearing, and
    // the oracle applies the identical cut). Existing edges are
    // anti-joined away; top-20 is TakeOrdered under a full
    // (score, u, v) tie order.
    "q274_adamic_adar" -> ((s, d) => {
      // three consumers (two sym legs + the known-edge anti-join) —
      // materialize once, the q285 rationale
      val e0 = repeatCoEdges(s, d)
      val e = if (s.sparkContext.getCheckpointDir.isDefined)
        e0.checkpoint(eager = true) else e0.localCheckpoint(true)
      val sym = e.select(col("lo").as("src"), col("hi").as("dst"))
        .unionByName(e.select(col("hi").as("src"), col("lo").as("dst")))
      val deg = sym.groupBy(col("src").as("w")).agg(count(lit(1)).as("degw"))
      // the cap joins BEFORE the pair blow-up: only non-hub adjacency
      // rows enter the self-join, so the explosion is structurally
      // bounded at 64·|E| rather than relying on optimizer reordering
      val adj = sym.toDF("w", "u").join(deg.where(col("degw") <= 64L), "w")
      val wedges = adj.join(sym.toDF("w", "v"), "w")
        .where(col("u") < col("v"))
        .withColumn("aa_term", expr("1000000000000 div " +
          "cast(floor(ln(cast(degw as double)) * 1000000) as bigint)"))
      wedges.groupBy("u", "v")
        .agg(count(lit(1)).as("common_n"), sum("aa_term").as("aa_nano"))
        .join(e.toDF("u", "v"), Seq("u", "v"), "left_anti")
        .orderBy(desc("aa_nano"), col("u"), col("v"))
        .limit(20)
    }),

    // q275 — LOCAL CLUSTERING COEFFICIENT (hub-capped): per-node
    // triangle density cc(v) = 2·T(v)/(k_v·(k_v−1)) on the
    // repeat-co-purchase graph — the node-level refinement of q136's
    // global triangle count, and the standard "is this neighborhood a
    // community or a star" signal. SEMANTICS (the q274 deployment
    // cut, part of the operator contract): each node's neighborhood
    // is the deterministic bottom-32-by-md5 SAMPLE of its neighbors —
    // k_v = min(deg v, 32) — so cc is EXACT for every deg ≤ 32 node
    // and a fixed-size uniform-sample density estimate for hubs.
    // Unlike q274 (whose per-center cost is LINEAR in its cap), cc
    // pays C(K,2) pairs per node, so the cap sits at 32: the pair
    // stage is ≤ 496·|V| and the adjacency stages ≤ 2·|E| (the
    // uncapped exact closure measured α_tail 1.50 on the ×4 densified
    // stress graph — a 222-degree node there costs 24,531 exact wedges
    // vs 496 sampled ones).
    // Plan: the per-node sample is a MERGEABLE bounded partial agg
    // (top_k on the md5 rank — a hub's adjacency combines map-side,
    // never concentrating in one task), then sampled-neighbor pairs
    // close against the edge set with one hash join. cc lands in
    // exact integer micros (2·T·10⁶ div k_v·(k_v−1)); deg < 2 nodes
    // report null. Oracle: identical md5 sample via row_number, naive
    // pair closure — the sampling contract itself is gated.
    "q275_clustering_coeff" -> ((s, d) => {
      val K = 32
      // two consumers (adjacency build + pair closure) — materialize
      // once, the q285 rationale
      val u0 = repeatCoEdges(s, d)
      val und = if (s.sparkContext.getCheckpointDir.isDefined)
        u0.checkpoint(eager = true) else u0.localCheckpoint(true)
      val sym = und.select(col("lo").as("v"), col("hi").as("u"))
        .unionByName(und.select(col("hi").as("v"), col("lo").as("u")))
      val agg0 = sym
        .withColumn("h", expr("cast(conv(substring(" +
          "md5(concat('cc:', v, ':', u)), 1, 15), 16, 10) as bigint)"))
        .groupBy("v")
        .agg(count(lit(1)).as("dg"), expr(s"top_k(-h, u, $K)").as("tk"))
      // two consumers (sample explode + per-node degree report)
      val agg = if (s.sparkContext.getCheckpointDir.isDefined)
        agg0.checkpoint(eager = true) else agg0.localCheckpoint(true)
      val samp = agg.select(col("v"),
        explode(expr("transform(tk, x -> x.id)")).as("u"))
      val triS = samp.toDF("v", "a").join(samp.toDF("v", "b"), "v")
        .where(col("a") < col("b"))
        .join(und.toDF("a", "b"), Seq("a", "b"))
        .groupBy("v").agg(count(lit(1)).as("tri_s"))
      agg.select("v", "dg").join(triS, Seq("v"), "left")
        .withColumn("triangles", coalesce(col("tri_s"), lit(0L)))
        .select(col("v").as("item"), col("dg").as("deg"), col("triangles"),
          when(col("dg") >= 2L,
            expr(s"2 * triangles * 1000000 div " +
              s"(least(dg, ${K}L) * (least(dg, ${K}L) - 1))"))
            .as("cc_micro"))
        .orderBy("item")
    }),

    // q329 — PERSONALIZED PAGERANK (random walk with restart): "items
    // near THESE items" on the repeat-co-purchase graph — the
    // graph-native similar-item retrieval next to q274's one-hop
    // Adamic-Adar (PPR aggregates ALL paths with decay, the standard
    // co-occurrence recommender score). Seeds = the Brand#11 catalog
    // slice; all reset mass returns uniformly to the seeds
    // ([[PageRank.personalizedRanks]] — q115's integer fixed point
    // with a seed-flag reset, 5 rounds, broadcast rank vector). Top
    // 20 by rank under a full (r, node) tie order; oracle replays all
    // 5 integer rounds.
    "q329_personalized_pagerank" -> ((s, d) => {
      // the rank loop consumes the edge table EVERY round — without
      // materialization the whole co-purchase pair-gen re-runs 5×
      // (measured 10.0 s → the edges are the dominant cost, not the
      // bounded integer iteration); the q285/q274 rationale
      val u0 = repeatCoEdges(s, d)
      val und = if (s.sparkContext.getCheckpointDir.isDefined)
        u0.checkpoint(eager = true) else u0.localCheckpoint(true)
      val e = und.select(col("lo").as("src"), col("hi").as("dst"),
        lit(1L).as("w"))
        .unionByName(und.select(col("hi").as("src"), col("lo").as("dst"),
          lit(1L).as("w")))
      val seeds = Tables.load(s, d, "part")
        .where(col("p_brand") === "Brand#11")
        .select(col("p_partkey").cast("long").as("node"))
      PageRank.personalizedRanks(e, seeds, iters = 5)
        .orderBy(desc("r"), col("node"))
        .limit(20)
    }),

    // q334 — LABEL PROPAGATION COMMUNITIES (Raghavan et al.): the
    // lightweight community detector beside q38's connected components
    // (LPA splits a connected graph into dense regions; CC only finds
    // disconnected ones) and the input role q285's modularity can
    // score. Synchronous update, 4 fixed rounds: every node adopts
    // the most frequent label among its neighbors, ties to the
    // SMALLEST label (fully deterministic — no arrival-order
    // dependence). Per round: one neighbor-label join + two partial
    // aggs (count, then max_by mode), lineage truncated per round;
    // work is O(|E|) per round, rounds fixed. Oracle replays all 4
    // rounds as a MATERIALIZED CTE chain with row_number ties.
    "q334_label_propagation" -> ((s, d) => {
      def mat(df: DataFrame): DataFrame =
        if (s.sparkContext.getCheckpointDir.isDefined)
          df.checkpoint(eager = true) else df.localCheckpoint(true)
      val und = repeatCoEdges(s, d)
      val sym = mat(und.select(col("lo").as("v"), col("hi").as("u"))
        .unionByName(und.select(col("hi").as("v"), col("lo").as("u"))))
      var lab = sym.select(col("v").as("node")).distinct()
        .withColumn("label", col("node"))
      for (_ <- 1 to 4) {
        lab = mat(sym
          .join(lab.select(col("node").as("u"), col("label").as("nl")), "u")
          .groupBy(col("v"), col("nl")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("v").as("node"))
          .agg(max_by(col("nl"),
            struct(col("cnt"), (-col("nl")).as("neg"))).as("label")))
      }
      lab.select(col("node").as("item"), col("label").as("community"))
        .orderBy("item")
    }),

    // q335 — ROUGE-N OVERLAP EVAL: clipped n-gram recall of candidate
    // documents against a fixed 5-document reference set — the
    // summarization/paraphrase evaluation metric, run corpus-wide the
    // way a distillation pipeline scores generations against
    // references. ROUGE-N = Σ_g min(tf_ref, tf_cand) / Σ_g tf_ref in
    // integer micros for N = 1, 2. Plan: the reference n-gram table
    // is 5 docs (BROADCAST); candidates explode once and join on the
    // gram — the corpus never self-pairs. Top-3 candidates per
    // reference via the composite-score top_k partial agg
    // (rouge2·2·10⁶ + rouge1 — both < 2·10⁶, so order = (rouge2,
    // rouge1, doc_id asc) exactly), never a per-ref sort window.
    "q335_rouge_eval" -> ((s, d) => {
      def grams(df: DataFrame): DataFrame = {
        val toks = df.select(col("doc_id"),
          TextOps.tokens(col("text")).as("toks"))
        toks.select(col("doc_id"), explode(col("toks")).as("g"))
          .where(col("g") =!= "").withColumn("kind", lit(1L))
          .unionByName(toks.where(size(col("toks")) >= 2)
            .select(col("doc_id"),
              explode(TextOps.shingles(col("toks"), 2)).as("g"))
            .withColumn("kind", lit(2L)))
          .groupBy("doc_id", "g", "kind").agg(count(lit(1)).as("tf"))
      }
      val refs = grams(docs(s, d).where(col("doc_id") < 5))
        .toDF("ref_id", "g", "kind", "rtf")
      val refTot = refs.groupBy("ref_id", "kind").agg(sum("rtf").as("rtot"))
      val clips = grams(docs(s, d).where(col("doc_id") >= 5))
        .join(broadcast(refs), Seq("g", "kind"))
        .groupBy("ref_id", "doc_id", "kind")
        .agg(sum(least(col("tf"), col("rtf"))).as("clip"))
      val scored = clips
        .join(broadcast(refTot), Seq("ref_id", "kind"))
        .groupBy("ref_id", "doc_id")
        .agg(sum(when(col("kind") === 1L,
          expr("clip * 1000000 div rtot")).otherwise(0L)).as("r1"),
          sum(when(col("kind") === 2L,
            expr("clip * 1000000 div rtot")).otherwise(0L)).as("r2"))
      scored
        .groupBy("ref_id")
        .agg(expr("top_k(r2 * 2000000 + r1, doc_id, 3)").as("tk"))
        .select(col("ref_id"), posexplode(col("tk")))
        .select(col("ref_id"), (col("pos") + 1L).as("rank"),
          col("col.id").as("doc_id"),
          (col("col.score") % 2000000L).as("rouge1_micro"),
          expr("col.score div 2000000").as("rouge2_micro"))
        .orderBy("ref_id", "rank")
    }),

    // q368 — CHARACTER ERROR RATE (CER): the Levenshtein-based
    // transcription metric (the ASR/OCR complement to q335's n-gram
    // ROUGE and q342's BLEU — those reward overlap, this charges
    // every INSERTION/DELETION/SUBSTITUTION at character level).
    // Hypotheses are deterministic md5-corrupted twins of each
    // reference (position-keyed: p = 1/16 token drop, p = 2/16
    // substitution — the corruption IS part of the gate, replayed
    // verbatim), texts are capped at the first 30 tokens so the
    // per-row DP is bounded (~O(200²) — the documented contract; an
    // uncapped 100 TB corpus would pay len² per doc). Both engines
    // run their NATIVE levenshtein (unit costs, the textbook DP) on
    // identical strings, so the distance is exact; CER lands as one
    // floored micro division. Plan: everything is scan-side per-row
    // expression work (one bounded lambda per doc — no shuffle at
    // all until the gate's orderBy); at 100 TB this runs at
    // parquet-scan speed.
    "q368_cer_eval" -> ((s, d) => {
      def key(iExpr: String) =
        s"md5(concat('cer:', cast(doc_id as string), ':', " +
          s"cast($iExpr as string), ':', t))"
      docs(s, d)
        .withColumn("toks30", slice(TextOps.tokens(col("text")), 1, 30))
        .where(size(col("toks30")) > 0)
        .withColumn("ref", array_join(col("toks30"), " "))
        .withColumn("hyp", expr(
          "array_join(filter(transform(toks30, (t, i) -> " +
            s"case when substring(${key("i")}, 1, 1) = '0' " +
            "then cast(null as string) " +
            s"when substring(${key("i")}, 1, 1) in ('1', '2') " +
            "then 'zzz' else t end), x -> x is not null), ' ')"))
        .select(col("doc_id"),
          length(col("ref")).cast("long").as("ref_chars"),
          levenshtein(col("ref"), col("hyp")).cast("long").as("dist"),
          expr("cast(cast(levenshtein(ref, hyp) as bigint) * 1000000 " +
            "div length(ref) as bigint)").as("cer_micro"))
        .orderBy("doc_id")
    }),

    // q330 — DIRICHLET QUERY LIKELIHOOD (Zhai & Lafferty): the
    // language-model retrieval tier next to q59's BM25 — score(q,d) =
    // Σ_t ln((tf + μ·cf_t/C)/(|d| + μ)), the Bayesian-smoothed
    // unigram LM that never zeroes out on a missing term. The query
    // is the corpus's own top-3-df terms (deterministic, replayed by
    // the oracle). EXACT integer form: each term contributes
    // ml(tf·C + μ·cf_t) − ml((|d|+μ)·C) with ml the floor micro-log
    // of an exact integer product (the q77 idiom) and μ = 2000
    // pinned — split as a present-terms inverted-index leg + a
    // doc-only length term + a query constant, so every doc is scored
    // (absent terms included) while the join only touches postings of
    // the 3 query terms. Top-10 under (score desc, doc_id).
    "q330_dirichlet_ql" -> ((s, d) => {
      val mu = 2000L
      def ml(x: String) = s"cast(floor(ln($x) * 1000000) as bigint)"
      val tf = docs(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
        .where(col("t") =!= "")
        .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val lens = tf.groupBy("doc_id").agg(sum("tf").as("len"))
      val cTot = lens.agg(sum("len").as("c"))
      val cf = tf.groupBy("t")
        .agg(sum("tf").as("cf"), count(lit(1)).as("df"))
      val q = cf.orderBy(desc("df"), col("t")).limit(3).select("t", "cf")
      val qBase = q.agg(sum(expr(ml(s"$mu * cf"))).as("qbase"))
      val pres = tf.join(broadcast(q), "t").crossJoin(broadcast(cTot))
        .select(col("doc_id"),
          (expr(ml(s"tf * c + $mu * cf")) - expr(ml(s"$mu * cf")))
            .as("dlt"))
        .groupBy("doc_id").agg(sum("dlt").as("presum"))
      lens.crossJoin(broadcast(cTot)).crossJoin(broadcast(qBase))
        .join(pres, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (coalesce(col("presum"), lit(0L)) + col("qbase")
            - lit(3L) * expr(ml(s"(len + $mu) * c"))).as("score_micro"))
        .orderBy(desc("score_micro"), col("doc_id"))
        .limit(10)
    }),

    // q331 — CHAO1 VOCABULARY RICHNESS: how much vocabulary has the
    // corpus NOT yet seen? The capture-recapture estimator every
    // corpus-growth decision leans on (is another crawl worth it?) —
    // bias-corrected Chao1 = D + f₁(f₁−1)/(2(f₂+1)) per language from
    // the frequency-of-frequencies table (f₁ = singleton tokens, f₂ =
    // doubletons). Plan: token counts (one shuffle), counts-of-counts
    // (bounded second agg), closed form in exact integer micros with
    // decimal(38) products — no estimator iteration, no pairing.
    "q331_chao1_vocab" -> ((s, d) => {
      val cnt = docs(s, d)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("t"))
        .where(col("t") =!= "")
        .groupBy("lang", "t").agg(count(lit(1)).as("n"))
      cnt.groupBy("lang")
        .agg(count(lit(1)).as("d_vocab"),
          sum(when(col("n") === 1L, 1L).otherwise(0L)).as("f1"),
          sum(when(col("n") === 2L, 1L).otherwise(0L)).as("f2"))
        .select(col("lang"), col("d_vocab"), col("f1"), col("f2"),
          expr("cast(d_vocab as decimal(38,0)) * 1000000 + " +
            "cast(f1 as decimal(38,0)) * (f1 - 1) * 1000000 div " +
            "(2 * (f2 + 1))").cast("long").as("chao1_micro"))
        .orderBy("lang")
    }),

    // q282 — TEXTRANK KEYWORDS (Mihalcea & Tarau): corpus keywords as
    // PageRank over the word-adjacency graph — the graph-centrality
    // alternative to q58's TF-IDF and q123's PMI (PMI scores PAIRS,
    // TextRank scores WORDS by recursive importance). Candidate
    // tokens ≥ 4 chars (the deterministic content-word proxy),
    // adjacent-pair edges with count ≥ 3 (the q125 noise floor),
    // symmetrized and fed to [[PageRank]]'s integer-exact 5-round
    // fixed point. Words map to 60-bit md5 node ids — identical in
    // both engines, and a collision (≈0 at any vocabulary) would
    // merge the same pair on both sides. Edge build is one scan-side
    // shingle pass + one pair groupBy; the rank iteration runs on the
    // bounded vocabulary graph (q115's broadcast-rank shape). Oracle
    // replays all 5 integer rounds — the iteration arithmetic itself
    // is gated.
    "q282_textrank" -> ((s, d) => {
      val base = docs(s, d).select(TextOps.tokens(col("text")).as("toks"))
      val pairs = base.where(size(col("toks")) >= 2)
        .select(explode(TextOps.shingles(col("toks"), 2)).as("bg"))
        .select(split(col("bg"), " ").as("a2"))
        .select(element_at(col("a2"), 1).as("w1"),
          element_at(col("a2"), 2).as("w2"))
        .where(length(col("w1")) >= 4 && length(col("w2")) >= 4 &&
          col("w1") =!= col("w2"))
        .select(least(col("w1"), col("w2")).as("wa"),
          greatest(col("w1"), col("w2")).as("wb"))
        .groupBy("wa", "wb").agg(count(lit(1)).as("c"))
        .where(col("c") >= 3L)
      def wid(c: Column) =
        conv(substring(md5(concat(lit("tr:"), c)), 1, 15), 16, 10)
          .cast("long")
      val vocab = pairs.select(col("wa").as("word"))
        .unionByName(pairs.select(col("wb").as("word")))
        .distinct()
        .select(col("word"), wid(col("word")).as("node"))
      val edges = pairs
        .select(wid(col("wa")).as("src"), wid(col("wb")).as("dst"),
          col("c").as("w"))
        .unionByName(pairs.select(wid(col("wb")).as("src"),
          wid(col("wa")).as("dst"), col("c").as("w")))
      PageRank.ranks(edges, iters = 5)
        .join(vocab, "node")
        .select(col("word"), col("r"))
        .orderBy(desc("r"), col("word"))
        .limit(20)
    }),

    // q283 — MATRYOSHKA TRUNCATION AUDIT: how much retrieval quality
    // survives using only the first 16/32 of 64 embedding dims — the
    // measurement behind MRL-style tiered retrieval (coarse search on
    // a prefix, rerank on the full vector; the dimension analogue of
    // q228's PQ compression tier). For each q16 query: overlap@10
    // between full-dim cosine top-10 and prefix-dim top-10, dims
    // exploded from a literal array, missing overlaps reported as an
    // explicit 0 (the left join keeps the failure visible). Both
    // rankings are the measured q16 brute-force contract (6-dp sims,
    // id tie-break); at corpus scale each leg becomes an ANN
    // candidate list — the audit shape is unchanged.
    "q283_mrl_truncation" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val q = e.where(col("vec_id") < 5)
      val full = Similarity.bruteForceTopK(e, q, k = 10)
        .select(col("qid"), col("vec_id"))
      val overlaps = Seq(16, 32, 64).map { dd =>
        val t = e.select(col("vec_id"), slice(col("emb"), 1, dd).as("emb"))
        val tq = q.select(col("vec_id"), slice(col("emb"), 1, dd).as("emb"))
        Similarity.bruteForceTopK(t, tq, k = 10)
          .select(col("qid"), col("vec_id"))
          .join(full, Seq("qid", "vec_id"))
          .groupBy("qid").agg(count(lit(1)).as("overlap10"))
          .select(col("qid"), lit(dd.toLong).as("dim"), col("overlap10"))
      }.reduce(_ unionByName _)
      q.select(col("vec_id").as("qid"))
        .withColumn("dim", explode(array(lit(16L), lit(32L), lit(64L))))
        .join(overlaps, Seq("qid", "dim"), "left")
        .select(col("qid"), col("dim"),
          coalesce(col("overlap10"), lit(0L)).as("overlap10"))
        .orderBy("qid", "dim")
    }),

    // q299 — HELD-OUT OOV RATE: what fraction of eval-split tokens
    // the train-split vocabulary has never seen — the coverage number
    // that decides whether a vocab/tokenizer generalizes (reported
    // per source, because OOV concentrating in one source means that
    // source is under-represented in train, not that the vocab is
    // small). Splits are q126's md5 contract (deterministic, stable
    // under growth); the train vocabulary is a distinct-token set the
    // eval stream LEFT-ANTI probes (token-keyed join — at scale a
    // Bloom of the vocab serves the probe, the q104 path). Exact
    // counts, one trailing micro division.
    "q299_oov_rate" -> ((s, d) => {
      val split = (conv(substring(md5(concat(lit("split:"),
        col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 100)
      val base = docs(s, d)
        .withColumn("b", split)
        .withColumn("is_train", col("b") < 80)
        .where(col("b") < 80 || col("b") >= 90) // train + test only
      val toks = base.select(col("source"), col("is_train"),
        explode(TextOps.tokens(col("text"))).as("t"))
      val vocab = toks.where(col("is_train")).select("t").distinct()
      val ev = toks.where(!col("is_train"))
      val oov = ev.join(vocab, Seq("t"), "left_anti")
        .groupBy("source").agg(count(lit(1)).as("oov_tokens"))
      ev.groupBy("source").agg(count(lit(1)).as("eval_tokens"))
        .join(oov, Seq("source"), "left")
        .select(col("source"), col("eval_tokens"),
          coalesce(col("oov_tokens"), lit(0L)).as("oov_tokens"),
          expr("coalesce(oov_tokens, 0L) * 1000000 div eval_tokens")
            .as("oov_micro"))
        .orderBy("source")
    }),

    // q297 — TOKEN BURSTINESS (Church & Gale): variance-to-mean ratio
    // of per-document token counts — a CONTENT word clusters in the
    // few documents about its topic (D ≫ 1) while a function word
    // spreads Poisson-like (D ≈ 1); the corpus-statistics keyword
    // signal beside q282's graph-based TextRank. Zero-count documents
    // are in the denominator by closed form, not by materializing the
    // vocab×docs grid: over N docs, N²·Var = N·Σc² − (Σc)² with c
    // summed only where present, and D_micro = (N·Σc² − (Σc)²)·10⁶
    // div (N·Σc) — decimal(38) products, one division. Tokens with
    // corpus count ≥ 50 rank (rarity inflates D estimates); top-20 by
    // (D desc, token) is TakeOrdered.
    "q297_burstiness" -> ((s, d) => {
      val nd = docs(s, d).agg(count(lit(1)).as("nn"))
      docs(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
        .groupBy("t")
        .agg(count(lit(1)).as("n_docs"), sum("c").as("sc"),
          sum(expr("cast(c as decimal(38,0)) * c")).as("sc2"))
        .where(col("sc") >= 50L)
        .crossJoin(broadcast(nd))
        .select(col("t").as("token"), col("n_docs"), col("sc")
          .as("corpus_count"),
          expr("cast((nn * sc2 - cast(sc as decimal(38,0)) * sc) " +
            "* 1000000 div (cast(nn as decimal(38,0)) * sc) as bigint)")
            .as("burstiness_micro"))
        .orderBy(desc("burstiness_micro"), col("token"))
        .limit(20)
    }),

    // q291 — JENSEN-SHANNON SOURCE SIMILARITY: pairwise JSD between
    // the sources' unigram distributions — the mixing diagnostic that
    // says WHICH corpus components are near-duplicates in
    // distribution (q43/q268 decide rates; this says which rates are
    // redundant). Exact-integer end-to-end by the decomposition
    // JSD·2Na = Σ_shared ca·[ml(2·ca·Nb) − ml(ca·Nb + cb·Na)] +
    // (Na − sharedA)·ml(2): tokens EXCLUSIVE to one source contribute
    // exactly ln 2, so the pair join is INNER on token (no outer
    // scaffold over vocab×pairs), and every ln reads an exact integer
    // (the q77 micro-log idiom; cb = 0 would reduce to the same ln 2
    // term the closed form adds). Per-term products ride decimal(38).
    // Cost: one token-keyed self-join, Σ_t df_t² with df ≤ |sources|.
    "q291_jsd_sources" -> ((s, d) => {
      val ML2 = 693147L // floor(ln(2)·10⁶)
      val tok = docs(s, d)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("t"))
        .groupBy("source", "t").agg(count(lit(1)).as("c"))
      val tot = tok.groupBy("source").agg(sum("c").as("n"))
      val a = tok.toDF("src_a", "t", "ca")
        .join(tot.toDF("src_a", "na"), "src_a")
      val b = tok.toDF("src_b", "t", "cb")
        .join(tot.toDF("src_b", "nb"), "src_b")
      val ml = (x: String) =>
        s"cast(floor(ln(cast(($x) as double)) * 1000000) as bigint)"
      a.join(b, "t").where(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b", "na", "nb")
        .agg(count(lit(1)).as("shared_tokens"),
          sum("ca").as("sha"), sum("cb").as("shb"),
          sum(expr("cast(ca as decimal(38,0)) * (" +
            ml("2 * ca * nb") + " - " + ml("ca * nb + cb * na") + ")"))
            .as("ja"),
          sum(expr("cast(cb as decimal(38,0)) * (" +
            ml("2 * cb * na") + " - " + ml("ca * nb + cb * na") + ")"))
            .as("jb"))
        .select(col("src_a"), col("src_b"), col("shared_tokens"),
          expr(s"cast((ja + cast(na - sha as decimal(38,0)) * $ML2) " +
            "div (2 * cast(na as decimal(38,0))) + " +
            s"(jb + cast(nb - shb as decimal(38,0)) * $ML2) " +
            "div (2 * cast(nb as decimal(38,0))) as bigint)")
            .as("jsd_micro"))
        .orderBy("src_a", "src_b")
    }),

    // q285 — MODULARITY SCORE: how community-like is the connected-
    // component partition of the repeat-co-purchase graph? Newman's
    // Q = Σ_c [e_c/m − (d_c/2m)²] folded to ONE exact division:
    // Q_micro = Σ_c (4·m·e_c − d_c²)·10⁶ div (4·m²) with decimal(38)
    // products — no per-community floats. e_c counts intra-community
    // edges (both endpoints labeled c), d_c sums degrees; the
    // partition comes from the measured q38-style min-label CC
    // ([[Cluster.connectedComponents]]). m enters as a bounded driver
    // scalar (an edge COUNT, not edges). The edge table is
    // materialized once (checkpoint/localCheckpoint, the Cluster
    // recipe) because FOUR consumers read it — the count, the CC
    // seed, the intra-edge join, and the degree fold — and recomputing
    // the fact-sized pair groupBy per consumer measured 10.7 s at
    // sf0.1. The oracle replays the components via DuckDB's recursive
    // min-label fixpoint — independent machinery, same labels.
    "q285_modularity" -> ((s, d) => {
      val e0 = repeatCoEdges(s, d)
      val e = if (s.sparkContext.getCheckpointDir.isDefined)
        e0.checkpoint(eager = true) else e0.localCheckpoint(true)
      val lab = Cluster.connectedComponents(
        e.select(col("lo").as("n")).unionByName(e.select(col("hi").as("n")))
          .distinct(),
        e, "n", "lo", "hi")
      val m = e.count()
      val intra = e
        .join(lab.toDF("lo", "ca"), "lo")
        .join(lab.toDF("hi", "cb"), "hi")
        .where(col("ca") === col("cb"))
        .groupBy(col("ca").as("cluster")).agg(count(lit(1)).as("e_c"))
      val degs = e.select(col("lo").as("n")).unionByName(
        e.select(col("hi").as("n")))
        .join(lab.toDF("n", "cluster"), "n")
        .groupBy("cluster").agg(count(lit(1)).as("d_c"))
      degs.join(intra, Seq("cluster"), "left")
        .select((lit(4L) * lit(m) * coalesce(col("e_c"), lit(0L))
          - col("d_c") * col("d_c")).as("num"))
        .agg(sum(expr("cast(num as decimal(38,0))")).as("nsum"))
        .select(lit(m).as("m_edges"),
          expr(s"cast(nsum * 1000000 div (4 * cast(${m}L as decimal(38,0)) " +
            s"* ${m}L) as bigint)").as("q_micro"))
    }),

    // q268 — DOREMI-STYLE MIXTURE REWEIGHTING: one multiplicative-
    // weights round of the domain-reweighting recipe (Xie et al.
    // DoReMi, linearized): sources whose documents score WORSE than
    // the corpus under the corpus's own LM (excess unigram NLL > 0)
    // get up-weighted — they are the domains the current mixture
    // under-serves — and the weights renormalize to Σ = |sources|·10⁶
    // (q224's overflow-proof discipline). exp(η·excess) is replaced
    // by the documented linearization clamp(10⁶ + η·excess, ≥1)
    // (η = 2), keeping every step exact-integer; excess is the
    // per-source mean of q77's per-doc micro NLL minus the corpus
    // mean, so the whole round rides ONE measured LM scan. Outputs
    // pin the per-source NLL, the excess, and the final weight.
    "q268_doremi_reweight" -> ((s, d) => {
      val nll = Relevance.unigramNll(docs(s, d), "doc_id", "text")
      val bySource = nll
        .join(docs(s, d).select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(nll_micro) div count(1)").as("nll_micro"))
      val ref = nll.agg(expr("sum(nll_micro) div count(1)").as("ref_micro"))
      val raws = bySource.crossJoin(broadcast(ref))
        .withColumn("excess_micro", col("nll_micro") - col("ref_micro"))
        .withColumn("raw",
          greatest(lit(1L), lit(1000000L) + lit(2L) * col("excess_micro")))
      // renorm totals via a broadcast cross-join of the 1-row agg, not
      // an unpartitioned window — same value, no single-partition sort
      val tot = raws.agg(count(lit(1)).as("n_src"), sum("raw").as("raw_sum"))
      raws.crossJoin(broadcast(tot))
        .withColumn("weight_micro",
          expr("greatest(raw * (n_src * 1000000) div raw_sum, 1)"))
        .select(col("source"), col("n_docs"), col("nll_micro"),
          col("excess_micro"), col("weight_micro"))
        .orderBy("source")
    }),

    // q249 — TOKEN-DROPOUT AUGMENTATION (the EDA random-deletion
    // recipe, made seedless): drop each token with probability 1/8 by
    // an md5 coin on (doc_id, position) — every executor AND the
    // oracle derive the same mask with no RNG state or broadcast (the
    // q218/q126 coin contract), so augmented corpora are reproducible
    // across reruns and engines. The rebuilt text is pinned by md5
    // (the q130 one-shuffle rebuild: per-doc collect of (pos, tok)
    // structs, sorted in-array — bounded by document length). Output
    // stays narrow: original/kept token counts + the augmented text's
    // fingerprint, never the text itself.
    "q249_token_dropout" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks"))
      val kept = base
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_orig"),
          posexplode(col("toks")).as(Seq("pos", "tok")))
        .where(conv(substring(md5(concat(lit("aug:"),
          col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 8 =!= 0)
      kept.groupBy("doc_id")
        .agg(max("n_orig").as("n_orig"), count(lit(1)).as("n_kept"),
          md5(concat_ws(" ",
            transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
              x => x.getField("tok")))).as("aug_md5"))
        .select("doc_id", "n_orig", "n_kept", "aug_md5")
        .orderBy("doc_id")
    }),

    // q247 — AHO-CORASICK BLOCKLIST FILTER: screen every document
    // against a banned-phrase list in ONE text pass — the native
    // `multi_match` expression ([[graft.functions.MultiMatch]]) walks
    // an Aho–Corasick automaton, so scan cost is O(len + matches)
    // however long the blocklist (per-pattern regex passes re-scan
    // the corpus per pattern; an alternation NFA backtracks). The
    // harness reuses q235's planted corpus: every third document
    // carries the spam banner, the blocklist is the banner vocabulary
    // plus a never-present decoy ('winner' — pinning zero counts),
    // and a document is flagged at ≥4 total hits. The per-pattern
    // count map is gated in full via the replace-length identity
    // (exact for non-self-overlapping words; MultiMatchSpec covers
    // the overlapping cases SQL can't express). Scan-side codegen,
    // zero shuffles.
    "q247_blocklist_filter" -> ((s, d) => {
      val pats = BlockPatterns.mkString(",")
      docs(s, d)
        .withColumn("txt", when(col("doc_id") % 3 === 0,
          concat(lit(SpamBanner + " "), col("text"))).otherwise(col("text")))
        .select(col("doc_id"),
          expr("multi_match(regexp_replace(lower(trim(txt)), " +
            s"'\\\\s+', ' '), '$pats')").as("mm"))
        .select(col("doc_id") +: BlockPatterns.map(p =>
          expr(s"element_at(mm, '$p')").as(s"c_$p")): _*)
        .withColumn("n_hits",
          BlockPatterns.map(p => col(s"c_$p")).reduce(_ + _))
        .withColumn("n_patterns",
          BlockPatterns.map(p =>
            when(col(s"c_$p") > 0, 1L).otherwise(0L)).reduce(_ + _))
        .withColumn("flagged", col("n_hits") >= 4)
        .orderBy("doc_id")
    }),

    // q243 — MISRA-GRIES HEAVY HITTERS: the deterministic-bound
    // frequency summary beside q95's CMS — ≤k counters total (not a
    // hash grid), with the THEOREM guarantees: every token with true
    // count > N/(k+1) is present, and every estimate is within
    // [true − N/(k+1), true], under ANY partitioning/merge order
    // (Agarwal et al. PODS'12 mergeable form — see
    // [[graft.functions.MisraGries]]). Because the surviving counter
    // SET is merge-order-dependent, the gate hashes the deterministic
    // consequences, not the summary (the q21 pattern): for each TRUE
    // heavy hitter (exact count·17 > N, the exact rational form of
    // > N/(k+1) at k=16) the output pins its exact count plus two
    // theorem booleans — present-in-summary and
    // estimate-within-bounds — that only flip if the sketch is
    // broken; MisraGriesSpec property-tests the same bounds under
    // adversarial splits. The corpus vocabulary is near-uniform (max
    // token share 3.5%), so the harness PLANTS skew (the q46 move):
    // three hot tokens at ~10%/6%/5% appended per document — above
    // the k=24 threshold N/25 while every organic token stays below
    // it, and the 30+-token organic vocabulary keeps the ≤24-counter
    // summary under constant decrement pressure (estimates land
    // strictly inside the bound, not at est = cnt). Plan: the summary
    // is ONE partial aggregation whose exchange carries a ≤24-entry
    // map per partition; the exact side (needed only by the audit) is
    // the standard count groupBy.
    "q243_misra_gries_hh" -> ((s, d) => {
      val planted = Seq.fill(8)("hot0") ++ Seq.fill(5)("hot1") ++
        Seq.fill(4)("hot2")
      val toks = docs(s, d)
        .select(explode(concat(TextOps.tokens(col("text")),
          array(planted.map(lit): _*))).as("tok"))
      val sk = toks.agg(expr("misra_gries(tok, 24)").as("mg"))
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val tot = toks.agg(count(lit(1)).as("n"))
      exact.crossJoin(broadcast(tot))
        .where(expr("cnt * 25 > n"))
        .crossJoin(broadcast(sk))
        .select(col("tok"), col("cnt"), col("n"),
          expr("element_at(mg, tok) is not null").as("in_sketch"),
          expr("case when element_at(mg, tok) is null then false " +
            "else element_at(mg, tok) <= cnt and " +
            "(cnt - element_at(mg, tok)) * 25 <= n end").as("bounds_ok"))
        .orderBy("tok")
    }),

    // q239 — BITEXT MARGIN MINING (Artetxe & Schwenk margin scoring,
    // the LASER/CCMatrix parallel-corpus recipe): align two corpora
    // (here: even vs odd vec_id halves — the harness stand-in for two
    // languages' embedding spaces) by RATIO-margin rather than raw
    // cosine — margin(x,y) = cos(x,y) / ((avgK(x) + avgK(y))/2), with
    // avgK the mean cosine of each point's k=4 nearest cross-corpus
    // neighbors. The margin cancels hubness: a y that is "close to
    // everything" inflates its own neighborhood mean and stops
    // winning every x. All arithmetic integer micros: 6-dp cosines →
    // micro, neighborhood means by truncating div 4, the margin one
    // ratio at the end; pairs keep x's best y (margin desc, y tie) at
    // margin ≥ 1.02 — above the own-neighborhood average. This is the
    // brute-force tier under the q16 contract: at 100 TB both
    // neighbor sets and the candidate pairs come from the ANN path
    // (q22/q63) and the margin scoring runs on the short candidate
    // lists; the windows here partition by point id over ≤|x|·|y|
    // scored rows.
    "q239_bitext_mining" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val x = e.where(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("x_id"), col("emb").as("xemb"))
      val y = e.where(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("y_id"), col("emb").as("yemb"))
      val sims = x.crossJoin(broadcast(y))
        .select(col("x_id"), col("y_id"),
          round(round(Similarity.cosine(col("xemb"), col("yemb")), 6)
            * 1000000).cast("long").as("cm"))
      val wx = Window.partitionBy("x_id").orderBy(col("cm").desc, col("y_id"))
      val wy = Window.partitionBy("y_id").orderBy(col("cm").desc, col("x_id"))
      val ax = sims.withColumn("rn", row_number().over(wx))
        .where(col("rn") <= 4).groupBy("x_id")
        .agg(expr("sum(cm) div 4").as("ax"))
      val ay = sims.withColumn("rn", row_number().over(wy))
        .where(col("rn") <= 4).groupBy("y_id")
        .agg(expr("sum(cm) div 4").as("ay"))
      val wbest = Window.partitionBy("x_id")
        .orderBy(col("margin_micro").desc, col("y_id"))
      sims.join(ax, "x_id").join(ay, "y_id")
        .where(col("ax") + col("ay") > 0)
        .withColumn("margin_micro",
          expr("cm * 1000000 div ((ax + ay) div 2)"))
        .withColumn("rn", row_number().over(wbest))
        .where(col("rn") === 1 && col("margin_micro") >= 1020000L)
        .select(col("x_id"), col("y_id"), col("margin_micro"))
        .orderBy("x_id")
    }),

    // q300 — ANN-TIER BITEXT MINING: q239's PRODUCTION form under the
    // q16 contract — the margin scoring runs on IVF candidate lists
    // instead of the all-pairs cross join, closing the one measured
    // quadratic tail (q239 α_tail 1.3-1.4 across rounds; THIS query
    // measures α_tail 0.72 on the same corpus triple, and is 1.4×
    // cheaper in wall-clock at sf0.1 — see SCALE_CURVE.md).
    // Both directions' neighbor lists come from
    // [[AnnIvf.topKFromAssigned]] over k ≈ √N first-k centroids
    // (q36's scale rule: Σ bucket² ≈ N·√N), so the avgK neighborhood
    // means and the candidate pairs are all bucket-local — total work
    // ~ N^1.5, never N². Margin semantics are exactly q239's: ratio
    // margin over the mean of each side's top-4 neighbor cosines,
    // integer micros throughout, best y per x at margin ≥ 1.02.
    // RECALL IS GATED IN-BAND: a FIXED audit set (x_id < 256 —
    // constant size as the corpus grows, the q230/q240 fixed-query
    // contract) recomputes exact brute-force margins (audit sample ×
    // full y, BROADCAST ON THE 128-ROW SAMPLE side — the big y leg
    // only scans) and every audited row carries `hit` = the ANN-mined
    // pair equals the exact-mined pair (0 covers wrong-y, ANN-missed,
    // and ANN-spurious alike). Two documented noise sources keep the
    // hit rate below ANN candidate recall, both measured at sf0.01:
    // (a) the exact leg's ay normalizes hubness over the audit basis
    // (128 x's, not all x — full-basis ay would be the N² this query
    // exists to avoid), which alone moves 28/123 argmax pairs; (b)
    // IVF recall on these UNSTRUCTURED synthetic embeddings — at
    // nprobe 8 of √N≈23 buckets (~35 % corpus scanned) the miner
    // recovers 135/215 = 63 % of full-basis exact pairs (nprobe 4:
    // 39 %; nprobe 12: 77 % at half the corpus — diminishing, because
    // random vectors have no cluster structure for IVF to exploit).
    // Production tunes nprobe against exactly this audit; the gate
    // pins the measurement machinery, not a recall SLO.
    "q300_bitext_ann" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val x = e.where(col("vec_id") % 2 === 0)
      val y = e.where(col("vec_id") % 2 === 1)
      val kc = math.ceil(math.sqrt(e.count().toDouble)).toLong
      val cents = e.where(col("vec_id") < kc)
      def micro(c: Column) = round(c * 1000000).cast("long")
      val xcand = AnnIvf.topKFromAssigned(AnnIvf.assignBuckets(y, cents),
          cents, x, k = 8, nprobe = 8)
        .select(col("qid").as("x_id"), col("vec_id").as("y_id"),
          micro(col("sim")).as("cm"))
      val ycand = AnnIvf.topKFromAssigned(AnnIvf.assignBuckets(x, cents),
          cents, y, k = 8, nprobe = 8)
        .select(col("qid").as("y_id"), col("vec_id").as("x_id"),
          micro(col("sim")).as("cm"))
      val wx = Window.partitionBy("x_id").orderBy(col("cm").desc, col("y_id"))
      val wy = Window.partitionBy("y_id").orderBy(col("cm").desc, col("x_id"))
      val ax = xcand.withColumn("rn", row_number().over(wx))
        .where(col("rn") <= 4).groupBy("x_id")
        .agg(expr("sum(cm) div 4").as("ax"))
      val ay = ycand.withColumn("rn", row_number().over(wy))
        .where(col("rn") <= 4).groupBy("y_id")
        .agg(expr("sum(cm) div 4").as("ay"))
      val wbest = Window.partitionBy("x_id")
        .orderBy(col("margin_micro").desc, col("y_id"))
      val ann = xcand.join(ax, "x_id").join(ay, "y_id")
        .where(col("ax") + col("ay") > 0)
        .withColumn("margin_micro",
          expr("cm * 1000000 div ((ax + ay) div 2)"))
        .withColumn("rn", row_number().over(wbest))
        .where(col("rn") === 1 && col("margin_micro") >= 1020000L)
        .select(col("x_id"), col("y_id").as("y_ann"),
          col("margin_micro").as("margin_ann_micro"))
      // fixed-size exact audit leg: q239's brute-force semantics on
      // the x_id < 256 sample — 128 queries broadcast, y side scanned
      val xs = x.where(col("vec_id") < 256)
        .select(col("vec_id").as("x_id"), col("emb").as("xemb"))
      val simsEx = y.select(col("vec_id").as("y_id"), col("emb").as("yemb"))
        .crossJoin(broadcast(xs))
        .select(col("x_id"), col("y_id"),
          micro(round(Similarity.cosine(col("xemb"), col("yemb")), 6))
            .as("cm"))
      val axe = simsEx.withColumn("rn", row_number().over(wx))
        .where(col("rn") <= 4).groupBy("x_id")
        .agg(expr("sum(cm) div 4").as("ax"))
      val aye = simsEx.withColumn("rn", row_number().over(wy))
        .where(col("rn") <= 4).groupBy("y_id")
        .agg(expr("sum(cm) div 4").as("ay"))
      val exact = simsEx.join(axe, "x_id").join(aye, "y_id")
        .where(col("ax") + col("ay") > 0)
        .withColumn("margin_micro",
          expr("cm * 1000000 div ((ax + ay) div 2)"))
        .withColumn("rn", row_number().over(wbest))
        .where(col("rn") === 1 && col("margin_micro") >= 1020000L)
        .select(col("x_id"), col("y_id").as("y_exact"))
      // hit: 1 = ANN pair equals the exact pair, 0 = any audited
      // mismatch (wrong y, ANN-missed, ANN-spurious), -1 = row outside
      // the audit sample (a 3-valued long, not a nullable boolean —
      // NULL booleans don't round-trip the cross-engine compare)
      ann.join(exact, Seq("x_id"), "full_outer")
        .select(col("x_id"), col("y_ann"), col("margin_ann_micro"),
          (col("x_id") < 256).as("audited"), col("y_exact"),
          when(col("x_id") < 256,
            coalesce((col("y_ann") === col("y_exact")).cast("long"), lit(0L)))
            .otherwise(lit(-1L)).as("hit"))
        .orderBy("x_id")
    }),

    // q240 — RANKING METRICS (NDCG@10 + MRR): the retrieval-eval
    // complement of q230's recall — WHERE in the ANN list the true
    // neighbors land, not just whether they appear. Relevance is
    // binary (membership in the exact cosine top-10, the q16
    // contract); DCG discounts by 1/log2(rank+1) using PINNED integer
    // gain literals (10¹² div ⌊log2(i+1)·10⁶⌋, computed once and
    // interpolated into BOTH engines — no runtime log crosses the
    // gate); IDCG@10 is their prefix sum, so ndcg_micro = dcg·10⁶ div
    // IDCG. MRR is 10⁶ div first-relevant-rank (0 when the list has
    // no true neighbor). Plan rides the measured q22/q16 machinery;
    // the metric fold is one ≤10-row-per-query groupBy.
    "q240_ranking_metrics" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(e, q, k = 10)
        .select(col("qid"), col("vec_id"), lit(1L).as("rel"))
      val wr = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      val approx = AnnIvf.topKProbed(
          corpus = e, centroids = e.where(col("vec_id") < 16),
          queries = q, k = 10, nprobe = 4)
        .withColumn("rank", row_number().over(wr).cast("long"))
      val gainArr = array(DcgGains.map(lit): _*)
      approx.join(exact, Seq("qid", "vec_id"), "left")
        .withColumn("g", when(col("rel").isNotNull,
          element_at(gainArr, col("rank").cast("int"))).otherwise(0L))
        .groupBy("qid")
        .agg(sum(when(col("rel").isNotNull, 1L).otherwise(0L)).as("n_rel"),
          sum("g").as("dcg"),
          min(when(col("rel").isNotNull, col("rank"))).as("minr"))
        .select(col("qid"), col("n_rel"),
          expr(s"dcg * 1000000 div ${IdcgAt10}L").as("ndcg_micro"),
          coalesce(expr("1000000 div minr"), lit(0L)).as("mrr_micro"))
        .orderBy("qid")
    }),

    // q230 — ANN RECALL AUDIT: the index-quality monitor every
    // production ANN deployment runs — recall@10 of the IVF index
    // (q22's exact configuration) against brute-force ground truth
    // (q16), per query, as integer micros. The meta-evaluation
    // operator: the two rankings come from the library's own scale
    // path and baseline, so a regression in either (bucketing, probe
    // count, tie-breaks) moves a gated number. Cost is one brute-force
    // pass over the query set (the audit is run on a sampled query
    // set in production — the corpus side is the same scan both
    // legs share).
    "q230_ann_recall" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val q = e.where(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(e, q, k = 10)
        .select(col("qid"), col("vec_id"))
      val approx = AnnIvf.topKProbed(
          corpus = e, centroids = e.where(col("vec_id") < 16),
          queries = q, k = 10, nprobe = 4)
        .select(col("qid"), col("vec_id"))
      val inter = exact.join(approx, Seq("qid", "vec_id"))
        .groupBy("qid").agg(count(lit(1)).as("inter"))
      exact.groupBy("qid").agg(count(lit(1)).as("n_exact"))
        .join(approx.groupBy("qid").agg(count(lit(1)).as("n_approx")),
          Seq("qid"))
        .join(inter, Seq("qid"), "left")
        .select(col("qid"), col("n_exact"), col("n_approx"),
          coalesce(col("inter"), lit(0L)).as("inter"))
        .withColumn("recall_micro", expr("inter * 1000000 div n_exact"))
        .orderBy("qid")
    }),

    // q228 — PRODUCT QUANTIZATION + ADC search: the memory-compression
    // tier of the ANN family (q16 exact → q22/q36/q63 bucketed →
    // THIS: vectors stored as 8 one-byte codes, 32× smaller, searched
    // without touching a float). 8 subspaces × 8 dims, k=16 codewords
    // per subspace, 2 Lloyd rounds (seeded by the first 16 vectors —
    // the q36 contract); queries score the corpus by summing 8
    // integer-micro table lookups. See [[Pq]] for the broadcast/
    // partial-agg scale shape. The ORACLE replays the entire training
    // (both Lloyd rounds per subspace), the encoding, and the ADC
    // ranking — the compression pipeline itself is gate-checked, not
    // just the final ranks.
    "q228_pq_adc" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val sub = Pq.subvectors(e, nSub = 8, dSub = 8)
      val cb = Pq.train(s, sub, k = 16, iters = 2)
      val codes = Pq.assign(sub, cb).select("vec_id", "s", "cid")
      val qsub = sub.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("s"), col("sv").as("qsv"))
      Pq.adcTopK(codes, cb, qsub, k = 10, nSub = 8)
        .orderBy("qid", "vec_id")
    }),

    // q13 — exact dedup: keep smallest doc_id per normalized-text md5
    // (single hash-shuffle with partial agg; no window, no all-pairs)
    "q13_dedup_exact" -> ((s, d) =>
      Dedup.exact(docsWithDups(s, d), "doc_id", "text")
        .select("doc_id", "fp")
        .orderBy("doc_id")),

    // q14 — per-document text statistics (token count, average token
    // length, stopword ratio) — ONE compiled struct expression per row
    // (graft.functions.TextStats; declarative formulation covered by
    // the equivalence unit test)
    "q14_text_stats" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), expr("text_stats(text, 'the', 'a')").as("st"))
        .select(col("doc_id"), col("st.n_tokens"), col("st.avg_tok_len"),
          col("st.stop_ratio"))
        .orderBy("doc_id")),

    // q15 — marker-word language ID: score each candidate language,
    // argmax with fixed tie-break order en > de > es > fr
    "q15_lang_id" -> ((s, d) => {
      val toks = TextOps.tokens(col("text"))
      val scored = TextOps.langMarkers.foldLeft(docs(s, d)) {
        case (df, (lang, markers)) =>
          df.withColumn(s"s_$lang", TextOps.markerScore(toks, markers))
      }
      val pred =
        when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr"))
          && col("s_en") > 0, "en")
          .when(col("s_de") >= greatest(col("s_es"), col("s_fr"))
            && col("s_de") > 0, "de")
          .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
          .when(col("s_fr") > 0, "fr")
          .otherwise("und")
      scored
        .withColumn("lang_pred", pred)
        .select("doc_id", "lang_pred", "s_en", "s_de", "s_es", "s_fr")
        .orderBy("doc_id")
    }),

    // q16 — similarity search: brute-force cosine top-10 for query
    // vectors vec_id < 5; query side broadcast, corpus never shuffled
    "q16_cosine_topk" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), k = 10)
        .orderBy("qid", "vec_id")
    }),

    // q17 — MinHash + banded LSH near-dup candidates: bucketed
    // self-join on (band, bandKey), never all-pairs
    "q17_minhash_neardup" -> ((s, d) =>
      NearDup.candidatePairs(docsWithDups(s, d), "doc_id", "text")
        .orderBy("doc_a", "doc_b")),

    // q18 — LSH candidates verified by exact shingle-set Jaccard
    "q18_jaccard_neardup" -> ((s, d) =>
      NearDup.jaccardPairs(docsWithDups(s, d), "doc_id", "text", threshold = 0.8)
        .orderBy("doc_a", "doc_b")),

    // q19 — SimHash document fingerprints (one codegen'd expression)
    "q19_simhash" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), NearDup.simhash("text").as("simhash"))
        .orderBy("doc_id")),

    // q27 — SimHash-banded near-dup pairs: 8-bit band blocking
    // (pigeonhole-complete for Hamming <= 3), bit_count verify
    "q27_simhash_neardup" -> ((s, d) =>
      NearDup.simhashPairs(docsWithDups(s, d), "doc_id", "text", maxHamming = 3)
        .orderBy("doc_a", "doc_b")),

    // q28 — winnowing (rolling-hash) document fingerprints
    "q28_winnow_fingerprint" -> ((s, d) =>
      NearDup.winnowFingerprints(docs(s, d), "doc_id", "text")
        .orderBy("doc_id", "fp")),

    // q86 — duplicated-SPAN mining (the memorization-risk diagnostic
    // next to q17/q27's pair finding): every 3-gram span appearing in
    // >= 2 distinct documents, ranked by document frequency then
    // total occurrences. Explode is scan-side; COUNT(DISTINCT doc_id)
    // plans as the two-level hash aggregate — a partial count keyed on
    // (span, doc) before the first exchange, so the shuffle carries
    // deduplicated (span, doc) pairs, never text rows; the top-100 is
    // a TakeOrdered, no global sort.
    "q86_dup_spans" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("sh"))
        .groupBy("sh")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"))
        .where(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("sh"))
        .limit(100)),

    // q22 — IVF-bucketed ANN: centroids = vec_id < 16, probe the 4
    // nearest buckets per query — the scale path next to q16's
    // brute-force baseline; deterministic, so fully oracle-checked
    "q22_ann_ivf" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      AnnIvf.topKProbed(
        corpus = e,
        centroids = e.where(col("vec_id") < 16),
        queries = e.where(col("vec_id") < 5),
        k = 10, nprobe = 4)
        .orderBy("qid", "vec_id")
    }),

    // q25 — embedding-cosine near-dup: corpus ∪ planted exact copies
    // (the embeddings have no natural near-dups), pairs found only
    // within IVF buckets — never all-pairs
    "q25_embedding_neardup" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val withDups = e.unionByName(
        e.select((col("vec_id") + 100000).as("vec_id"), col("emb")))
      AnnIvf.nearDupPairs(withDups, e.where(col("vec_id") < 16),
        threshold = 0.999)
        .orderBy("id_a", "id_b")
    }),

    // q176 — kNN-GRAPH CONSTRUCTION: every vector's top-3 in-bucket
    // neighbors — the preprocessing pass graph-based ANN indexes
    // (HNSW/NN-descent) and graph-clustering pipelines start from,
    // distinct from q16/q22's few-queries-vs-corpus search: here the
    // QUERY SET IS THE CORPUS, so the skew-safe per-node truncation
    // matters. Candidates come only from IVF buckets with k ≈ √N
    // anchors (q36's scale rule — Σ bucket² ≈ N·√N stays
    // subquadratic as the corpus grows; a fixed k would drift to n²;
    // measured in SCALE_CURVE.md); per-node top-3 runs through the bounded
    // `top_k` aggregate (q140), so the exchange carries ≤3 pairs per
    // node instead of a per-node window sorting every candidate
    // list. Scores are micro-cosine longs; top_k's (score DESC, id
    // ASC) tie rule is exactly the oracle's row_number order.
    "q176_knn_graph" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val k = math.ceil(math.sqrt(e.count().toDouble)).toLong
      val assigned = AnnIvf.assignBuckets(e, e.where(col("vec_id") < k))
      val l = assigned.toDF("id_a", "emb_a", "bucket")
      val r = assigned.toDF("id_b", "emb_b", "bucket")
      l.join(r, Seq("bucket"))
        .where(col("id_a") =!= col("id_b"))
        .withColumn("sm",
          round(Similarity.cosine(col("emb_a"), col("emb_b")) * 1000000)
            .cast("long"))
        .groupBy("id_a")
        .agg(expr("top_k(sm, id_b, 3)").as("tk"))
        .select(col("id_a"), posexplode(col("tk")))
        .select(col("id_a").as("vec_id"),
          (col("pos") + 1).cast("long").as("rk"),
          col("col.id").as("nn_id"), col("col.score").as("sim_micro"))
        .orderBy("vec_id", "rk")
    }),

    // q36 — IVF probe search over a TRAINED index at k≈√N: the scale
    // rule exercised end-to-end. With k ~ √N the in-bucket work
    // Σ bucket² ≈ N·√N stays subquadratic as the corpus grows (q22's
    // fixed-k variant is the small-corpus twin). Two Lloyd rounds,
    // deterministic first-k seed, centroids rounded to 6 dp so the
    // trained index is bit-identical across engines.
    "q36_ann_trained" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val k = math.ceil(math.sqrt(e.count().toDouble)).toInt
      val centroids = AnnIvf.trainCentroids(e, k, iters = 2, roundTo = Some(6))
      AnnIvf.topKProbed(
        corpus = e, centroids = centroids,
        queries = e.where(col("vec_id") < 5),
        k = 10, nprobe = 4)
        .orderBy("qid", "vec_id")
    }),

    // q26 — corpus curation filter: the end-to-end training-data
    // selection shape — quality stats + language ID + exact-dedup
    // survivorship composed into one pass over the corpus
    "q26_corpus_filter" -> ((s, d) => {
      val base = docsWithDups(s, d)
      val survivors = Dedup.exact(base, "doc_id", "text").select("doc_id")
      val toks = TextOps.tokens(col("text"))
      base
        .join(survivors, "doc_id") // dedup survivorship
        .withColumn("st", expr("text_stats(text, 'the', 'a')"))
        .withColumn("s_en", TextOps.markerScore(toks,
          TextOps.langMarkers.toMap.apply("en")))
        .where(col("st.n_tokens").between(20, 400)
          && col("st.stop_ratio") >= 0.05 && col("s_en") > 0)
        .select(col("doc_id"), col("st.n_tokens").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // q33 — corpus vocabulary: top-20 tokens by frequency (explode →
    // partial-agg count → TakeOrdered; the shuffle carries one row per
    // (partition, token), not one per occurrence)
    "q33_vocab_topk" -> ((s, d) =>
      docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)),

    // q34 — feature-hashing text vectorization: tokens → md5 % 64
    // dimensions with token-share weights (model-free text→vector)
    "q34_hashing_embed" -> ((s, d) =>
      TextOps.hashingEmbedding(docs(s, d), "doc_id", "text", dim = 64)
        .orderBy("doc_id", "dim")),

    // q38 — near-dup CLUSTERING: connected components over the
    // verified LSH pair graph (transitive closure of q18's pairs) —
    // iterative min-label propagation, one partial-agg shuffle per
    // round, rounds = cluster diameter
    "q38_neardup_clusters" -> ((s, d) => {
      val base = docsWithDups(s, d)
      val pairs = NearDup.jaccardPairs(base, "doc_id", "text", threshold = 0.8)
      Cluster.connectedComponents(
        base.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b")
        .orderBy("doc_id")
    }),

    // q289 — DEDUP ROI REPORT: what a dedup pass is WORTH, per source
    // — the number a data lead reads before green-lighting the
    // compute: token totals before/after q38's near-dup clustering
    // (min-id survivor per cluster, the q88 keeper rule), docs and
    // tokens kept, savings in exact micros. Rides the measured q38
    // pipeline (α 0.24) plus one scan-side token count and two
    // bounded groupBys — the report costs nothing beyond the dedup it
    // evaluates.
    "q289_dedup_savings" -> ((s, d) => {
      val base = docsWithDups(s, d)
      val pairs = NearDup.jaccardPairs(base, "doc_id", "text", threshold = 0.8)
      val lab = Cluster.connectedComponents(
        base.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b")
      val toks = base.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("ntok"),
        (col("doc_id") % 100000L).as("orig"))
      val src = docs(s, d).select(col("doc_id").as("orig"), col("source"))
      val m = lab.join(toks, "doc_id").join(src, "orig")
      val keep = m.groupBy("cluster").agg(min("doc_id").as("keeper"))
      m.join(keep, "cluster")
        .groupBy("source")
        .agg(count(lit(1)).as("docs_total"),
          sum(when(col("doc_id") === col("keeper"), 1L).otherwise(0L))
            .as("docs_kept"),
          sum("ntok").as("tokens_total"),
          sum(when(col("doc_id") === col("keeper"), col("ntok"))
            .otherwise(0L)).as("tokens_kept"))
        .withColumn("savings_micro",
          expr("(tokens_total - tokens_kept) * 1000000 div tokens_total"))
        .orderBy("source")
    }),

    // q88 — near-dup corpus PRUNING (the dedup pipeline's end
    // product): the q38 clusters reduced to one surviving
    // representative each — min doc_id — with the member count it
    // stands for. One partial-agg'd groupBy over the (doc, cluster)
    // labels; the keeper set is what a 100 TB dedup pass actually
    // ships to training.
    "q88_neardup_prune" -> ((s, d) => {
      val base = docsWithDups(s, d)
      val pairs = NearDup.jaccardPairs(base, "doc_id", "text", threshold = 0.8)
      Cluster.connectedComponents(
        base.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b")
        .groupBy("cluster")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_members"))
        .select("keep_id", "n_members")
        .orderBy("keep_id")
    }),

    // q39 — BPE-ish token counting + symbol/digit quality signals over
    // the structured `events.props` JSON text (where a sub-word regex
    // tokenizer — letters-run | digit | symbol — genuinely differs from
    // whitespace splitting; the documents corpus is plain prose and is
    // counted by q14). All scan-side, codegen'd, zero shuffles.
    "q39_token_quality" -> ((s, d) =>
      Tables.load(s, d, "events").select(
        col("event_id"),
        size(regexp_extract_all(col("props"),
          lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe_tok"),
        size(split(trim(col("props")), "\\s+")).as("n_ws_tok"),
        round(size(regexp_extract_all(col("props"), lit("[0-9]"), lit(0)))
          .cast("double") / length(col("props")), 6).as("digit_ratio"),
        round(size(regexp_extract_all(col("props"), lit("[^A-Za-z0-9\\s]"), lit(0)))
          .cast("double") / length(col("props")), 6).as("sym_ratio"))
        .orderBy("event_id")),

    // q40 — sequence packing (concat-and-chunk): documents in doc_id
    // order concatenated and split into 512-token context windows;
    // global offsets via the two-level block prefix sum (no
    // unpartitioned window anywhere). blockWidth=100 so the block
    // machinery is genuinely exercised at test scale.
    "q40_pack_chunks" -> ((s, d) => {
      val withTok = docs(s, d).select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("n_tok_doc"))
      Pack.concatChunks(withTok, "doc_id", "n_tok_doc",
        capacity = 512, blockWidth = 100)
        .orderBy("doc_id", "chunk_id")
    }),

    // q43 — weighted corpus mixing: per-source deterministic sampling
    // rates (derived from the source id, 10%..100%) via md5-bucket
    // hashing — the training-mix builder; scan-side filter, no shuffle
    "q43_corpus_mix" -> ((s, d) =>
      docs(s, d)
        .withColumn("rate",
          expr("10 * (1 + (cast(substring(source, 4, 10) as int) % 10))"))
        .withColumn("bucket", expr(
          "pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint), 100)"))
        .where(col("bucket") < col("rate"))
        .select("doc_id", "source", "rate")
        .orderBy("doc_id")),

    // q45 — interval (range) join: per-user event co-occurrence within
    // a 12 h window — time-bucketed at the window width so the shuffle
    // is |L| + 2|R| and work is bucket-local, never the per-key cross
    // product a naive key+BETWEEN join plans
    "q45_range_join" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_id"), expr("ts div 1000").as("t"))
      val l = ev.toDF("user_id", "event_a", "t_a")
      val r = ev.toDF("user_id", "event_b", "t_b")
      RangeJoin.inner(l, r, "user_id", "t_a", "t_b", gap = 43200000000L)
        .where(col("event_a") =!= col("event_b"))
        .select("event_a", "event_b")
        .orderBy("event_a", "event_b")
    }),

    // q46 — salted skew join: events (hot keys: 5 event types carry
    // the whole table) joined to per-type stats through a 16-way
    // salted shuffle join — same answer as the plain join (the oracle
    // proves it), hot-key work spread over 16 tasks.
    // Relation to AQE: on a real cluster the FIRST answer to this
    // distribution is AQE's native skew-join split (runtime
    // partition-byte measurement, splits only what is actually
    // skewed). AqeSkewJoinSpec pins BOTH facts: the split fires on
    // this distribution when the build side is a materialized
    // relation ("skewed" AQEShuffleRead, plan-pinned), and — found
    // empirically via the rule's debug trace — it does NOT fire on
    // q46's literal shape, because the aggregate-fed build side plans
    // as Sort→HashAggregate→stage and OptimizeSkewedJoin only matches
    // (Sort over) bare shuffle stages. Salting is retained as the
    // operator for exactly those cases: aggregate-fed builds, skewed
    // aggregations, parents re-requiring the join key's partitioning,
    // and AQE-off modes — same answer either way (the oracle and the
    // spec both prove it).
    "q46_skew_join" -> ((s, d) => {
      val ev = Tables.load(s, d, "events")
      val stats = ev.groupBy("event_type")
        .agg(count(lit(1)).as("type_n"), round(avg("value"), 6).as("type_avg"))
      SkewJoin.saltedInner(ev.select("event_id", "event_type"), stats,
        "event_type", col("event_id"), saltN = 16)
        .select("event_id", "event_type", "type_n", "type_avg")
        .orderBy("event_id")
    }),

    // q48 — multimodal metadata/integrity pass under the oracle: the
    // documents corpus re-cast as binary media payloads (UTF-8 bytes),
    // size + md5 fixity extracted through the REAL batched
    // mapPartitions path (Multimodal.metadata) — proving the
    // binary-column plumbing end-to-end; only the codec itself stays
    // stubbed (no media libs in this container)
    "q48_multimodal_meta" -> ((s, d) =>
      Multimodal.metadata(docsAsMedia(s, d, kind = "image"))
        .toDF().orderBy("media_id")),

    // q49 — video frame sampling fan-out under the oracle: documents
    // as fake videos (duration = n_chars ms), one frame per 100 ms via
    // Multimodal.frameSample — the per-row explosion (indices,
    // timestamps, batching) is real and hash-checked; frame payloads
    // (stub codec output) are deliberately excluded from the result
    "q49_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(docsAsMedia(s, d, kind = "video"), everyMs = 100L)
        .toDF()
        .select("media_id", "frame_idx", "ts_ms")
        .orderBy("media_id", "frame_idx")),

    // q78 — REAL image decode under the oracle: a deterministic PNG
    // is encoded per doc_id (closed-form pixel polynomial -> real
    // javax.imageio PNG writer), then ImageCodec decodes it back
    // (real javax.imageio reader), nearest-neighbor-resizes to 8x8,
    // and reduces to integer pixel sums. PNG is lossless and the
    // pixel function is closed-form, so DuckDB recomputes every
    // output from arithmetic alone — a decode failure, colorspace
    // drift, or resize bug cannot hash-match. Same batched
    // mapPartitions shape as q48/q49; payload bytes never shuffle.
    "q78_image_decode" -> ((s, d) => {
      import s.implicits._
      val nBuckets = 8
      val media = docs(s, d).where(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => Multimodal.Media(
          id, "image", Multimodal.synthImagePng(id), 0, 0, 0, 0L, "png")))
      media.mapPartitions { it =>
        it.grouped(Multimodal.DefaultBatchSize).flatMap(_.flatMap { m =>
          val raw = Multimodal.ImageCodec.decode(m.payload, m.format)
          val (w, h) = Multimodal.ImageCodec.rawDims(raw)
          val small = Multimodal.ImageCodec.resize(raw, 8, 8)
          var rsum = 0L
          var p = 0
          while (p < 64) {
            val o = 8 + p * 3
            rsum += (small(o) & 0xff) + (small(o + 1) & 0xff) + (small(o + 2) & 0xff)
            p += 1
          }
          val sums = new Array[Long](nBuckets)
          p = 0
          while (p < w * h) {
            val o = 8 + p * 3
            sums(p % nBuckets) +=
              (raw(o) & 0xff) + (raw(o + 1) & 0xff) + (raw(o + 2) & 0xff)
            p += 1
          }
          (0 until nBuckets).map(b =>
            (m.media_id, w.toLong, h.toLong, b.toLong, sums(b), rsum))
        })
      }.toDF("media_id", "width", "height", "bucket", "psum", "rsum")
        .orderBy("media_id", "bucket")
    }),

    // q79 — REAL audio decode under the oracle, the WAV twin of q78:
    // deterministic PCM clips are encoded with the real
    // javax.sound.sampled WAV writer, decoded back through
    // AudioCodec, nearest-neighbor-resampled, and reduced to integer
    // sample sums that DuckDB recomputes from the closed-form
    // generator. The decoded sample rate in the output proves the
    // real header parse.
    "q79_audio_decode" -> ((s, d) => {
      import s.implicits._
      val nBuckets = 4
      val media = docs(s, d).where(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => Multimodal.Media(
          id, "audio", Multimodal.synthWav(id), 0, 0, 0, 0L, "wav")))
      media.mapPartitions { it =>
        it.grouped(Multimodal.DefaultBatchSize).flatMap(_.flatMap { m =>
          val raw = Multimodal.AudioCodec.decode(m.payload, m.format)
          val (rate, n) = Multimodal.AudioCodec.rawDims(raw)
          val small = Multimodal.AudioCodec.resize(raw, 256, 0)
          var rsum = 0L
          var i = 0
          while (i < 256) {
            rsum += Multimodal.AudioCodec.rawSample(small, i)
            i += 1
          }
          val sums = new Array[Long](nBuckets)
          i = 0
          while (i < n) {
            sums(i % nBuckets) += Multimodal.AudioCodec.rawSample(raw, i)
            i += 1
          }
          (0 until nBuckets).map(b => (m.media_id, rate.toLong, n.toLong,
            b.toLong, sums(b), rsum))
        })
      }.toDF("media_id", "sample_rate", "n_samples", "bucket", "ssum", "rsum")
        .orderBy("media_id", "bucket")
    }),

    // q302 — COMPRESSED audio decode under the oracle: G.711 µ-law
    // (WAVE format tag 7 — the telephony 2:1 companded encoding, the
    // JDK's one built-in compressed audio codec) joins PCM/ORC/CSV at
    // rest and MJPEG/GIF on the video side. The harness authors REAL
    // µ-law WAVE containers (JDK writer) whose companded byte i is a
    // fixed polynomial; the engine expands them through the REAL JDK
    // ULAW→PCM converter (AudioCodec.decode); the oracle recomputes
    // every decoded sample as UlawDecodeTable[(id·131+i·7) mod 256]
    // with the table interpolated as SQL LITERALS — UlawCodecSpec
    // pins the JDK converter ≡ that closed form on all 256 bytes, so
    // the gate never rests on two codecs agreeing implicitly. Same
    // batched mapPartitions plan shape as q79 (scan-side, one bounded
    // aggregate per clip).
    "q302_ulaw_decode" -> ((s, d) => {
      import s.implicits._
      val nBuckets = 4
      val media = docs(s, d).where(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => Multimodal.Media(
          id, "audio", Multimodal.synthUlawWav(id), 0, 0, 0, 0L, "wav")))
      media.mapPartitions { it =>
        it.grouped(Multimodal.DefaultBatchSize).flatMap(_.flatMap { m =>
          val raw = Multimodal.AudioCodec.decode(m.payload, m.format)
          val (rate, n) = Multimodal.AudioCodec.rawDims(raw)
          val sums = new Array[Long](nBuckets)
          val peaks = new Array[Long](nBuckets)
          var i = 0
          while (i < n) {
            val v = Multimodal.AudioCodec.rawSample(raw, i)
            sums(i % nBuckets) += v
            if (math.abs(v) > peaks(i % nBuckets))
              peaks(i % nBuckets) = math.abs(v)
            i += 1
          }
          (0 until nBuckets).map(b => (m.media_id, rate.toLong, n.toLong,
            b.toLong, sums(b), peaks(b)))
        })
      }.toDF("media_id", "sample_rate", "n_samples", "bucket", "ssum", "peak")
        .orderBy("media_id", "bucket")
    }),

    // q326 — G.711 A-LAW decode under the oracle: the second
    // companded telephony encoding (WAVE format tag 6) through the
    // exact q302 contract — real A-law WAVE containers authored by
    // the JDK writer, expanded by the REAL JDK ALAW→PCM converter,
    // oracle recomputing every decoded sample as
    // AlawDecodeTable[(id·131+i·7) mod 256] with the table as SQL
    // literals; AlawCodecSpec pins JDK ≡ closed form on all 256
    // bytes. Same batched mapPartitions scan-side plan as q302.
    "q326_alaw_decode" -> ((s, d) => {
      import s.implicits._
      val nBuckets = 4
      val media = docs(s, d).where(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => Multimodal.Media(
          id, "audio", Multimodal.synthAlawWav(id), 0, 0, 0, 0L, "wav")))
      media.mapPartitions { it =>
        it.grouped(Multimodal.DefaultBatchSize).flatMap(_.flatMap { m =>
          val raw = Multimodal.AudioCodec.decode(m.payload, m.format)
          val (rate, n) = Multimodal.AudioCodec.rawDims(raw)
          val sums = new Array[Long](nBuckets)
          val peaks = new Array[Long](nBuckets)
          var i = 0
          while (i < n) {
            val v = Multimodal.AudioCodec.rawSample(raw, i)
            sums(i % nBuckets) += v
            if (math.abs(v) > peaks(i % nBuckets))
              peaks(i % nBuckets) = math.abs(v)
            i += 1
          }
          (0 until nBuckets).map(b => (m.media_id, rate.toLong, n.toLong,
            b.toLong, sums(b), peaks(b)))
        })
      }.toDF("media_id", "sample_rate", "n_samples", "bucket", "ssum", "peak")
        .orderBy("media_id", "bucket")
    }),

    // q80 — REAL video decode under the oracle: deterministic
    // uncompressed-DIB AVI containers (a real RIFF mux) run through
    // the REAL frameSample operator with VideoCodec (RIFF demux +
    // bottom-up BGR -> RGB frame decode), and every sampled frame
    // reduces to an integer pixel sum DuckDB recomputes from the
    // closed-form generator. Container parse, frame sampling, and
    // pixel decode all sit under the hash gate.
    "q80_video_decode" -> ((s, d) => {
      import s.implicits._
      val media = docs(s, d).where(col("doc_id") < 150)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = 2 + (id % 4)
          Multimodal.Media(id, "video", Multimodal.synthAvi(id),
            0, 0, 0, n * 40L, "avi")
        })
      Multimodal
        .frameSample(media, everyMs = 40L, codec = Multimodal.VideoCodec)
        .mapPartitions(_.map { fr =>
          val bb = java.nio.ByteBuffer.wrap(fr.payload)
          val (w, h) = (bb.getInt(0), bb.getInt(4))
          var sum = 0L
          var p = 0
          while (p < w * h) {
            val o = 8 + p * 3
            sum += (fr.payload(o) & 0xff) + (fr.payload(o + 1) & 0xff) +
              (fr.payload(o + 2) & 0xff)
            p += 1
          }
          (fr.media_id, fr.frame_idx.toLong, fr.ts_ms, w.toLong, h.toLong, sum)
        })
        .toDF("media_id", "frame_idx", "ts_ms", "width", "height", "fsum")
        .orderBy("media_id", "frame_idx")
    }),

    // q201 — MOTION-JPEG DECODE (the first COMPRESSED format through
    // the codec seam): real RIFF/AVI containers whose movi chunks are
    // complete baseline JPEGs (biCompression = 'MJPG'), demuxed by the
    // same RIFF walk as q80 and decoded per frame by javax.imageio.
    // JPEG is lossy, so per-pixel equality is not an honest gate —
    // frames are SMOOTH linear ramps (DCT reproduces low-frequency
    // content almost exactly at 1.0 quality) and the gate is the
    // q21/q171 in-band rule: every decoded pixel must land within ±8
    // of the closed-form ramp, asserted as a boolean the oracle pins
    // to TRUE, with container metadata (dims, frame enumeration,
    // timestamps) exact-matched. MultimodalSpec pins the observed
    // error tighter (≤6; measured ±5) against regression.
    "q201_mjpeg_decode" -> ((s, d) => {
      import s.implicits._
      val media = docs(s, d).where(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = 2 + (id % 4)
          Multimodal.Media(id, "video", Multimodal.synthMjpegAvi(id),
            0, 0, 0, n * 40L, "avi")
        })
      Multimodal
        .frameSample(media, everyMs = 40L, codec = Multimodal.VideoCodec)
        .mapPartitions(_.map { fr =>
          val bb = java.nio.ByteBuffer.wrap(fr.payload)
          val (w, h) = (bb.getInt(0), bb.getInt(4))
          var maxErr = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val o = 8 + (y * w + x) * 3
              val (er, eg, eb) =
                Multimodal.mjpegPixel(fr.media_id, fr.frame_idx, x, y)
              maxErr = math.max(maxErr, math.max(
                math.abs((fr.payload(o) & 0xff) - er), math.max(
                  math.abs((fr.payload(o + 1) & 0xff) - eg),
                  math.abs((fr.payload(o + 2) & 0xff) - eb))))
              x += 1
            }
            y += 1
          }
          (fr.media_id, fr.frame_idx.toLong, fr.ts_ms,
            w.toLong, h.toLong, maxErr <= 8)
        })
        .toDF("media_id", "frame_idx", "ts_ms", "width", "height", "band_ok")
        .orderBy("media_id", "frame_idx")
    }),

    // q209 — GIF DECODE (the second COMPRESSED format, and the first
    // LOSSLESS one): grayscale ramps GIF-encoded by the real
    // javax.imageio writer (LZW + 256-entry palette), decoded back
    // through the SAME ImageCodec path as q78 (ImageIO auto-detects
    // the container; getRGB canonicalizes indexed → sRGB). Because a
    // ≤256-value grayscale source fits the palette exactly, the gate
    // is EXACT integer bucket sums against the closed-form polynomial
    // — no tolerance band — plus the in-band container signature
    // (first three payload bytes = "GIF") so a silent fallback to
    // another format cannot pass. Same mapPartitions batch shape and
    // bucket reduction as q78; payloads never shuffle.
    "q209_gif_decode" -> ((s, d) => {
      import s.implicits._
      val nBuckets = 8
      val media = docs(s, d).where(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => Multimodal.Media(
          id, "image", Multimodal.synthGif(id), 0, 0, 0, 0L, "gif")))
      media.mapPartitions { it =>
        it.grouped(Multimodal.DefaultBatchSize).flatMap(_.flatMap { m =>
          val magic = new String(m.payload.take(3), "US-ASCII")
          val raw = Multimodal.ImageCodec.decode(m.payload, m.format)
          val (w, h) = Multimodal.ImageCodec.rawDims(raw)
          val sums = new Array[Long](nBuckets)
          var p = 0
          while (p < w * h) {
            val o = 8 + p * 3
            sums(p % nBuckets) +=
              (raw(o) & 0xff) + (raw(o + 1) & 0xff) + (raw(o + 2) & 0xff)
            p += 1
          }
          (0 until nBuckets).map(b =>
            (m.media_id, w.toLong, h.toLong, b.toLong, sums(b), magic))
        })
      }.toDF("media_id", "width", "height", "bucket", "psum", "magic")
        .orderBy("media_id", "bucket")
    }),

    // q177 — VIDEO SCENE-CUT DETECTION: the first real PROCESSING op
    // on top of the real video codec (q80 proves decode; this uses
    // it) — per-frame luminance-proxy sums from the RIFF demux, then
    // a frame-to-frame difference per media with a per-pixel-scaled
    // threshold marks the cuts, reduced to per-clip segment counts.
    // The diff window is partitioned by media (frame counts bounded
    // per clip); payloads never shuffle — only (media, frame, fsum)
    // rows leave the decode stage. The oracle recomputes every frame
    // sum from the closed-form pixel polynomial and applies the same
    // lag rule, so demux, sampling, decode, AND the cut logic all sit
    // under the hash.
    "q177_scene_cuts" -> ((s, d) => {
      import s.implicits._
      val media = docs(s, d).where(col("doc_id") < 150)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val n = 2 + (id % 4)
          Multimodal.Media(id, "video", Multimodal.synthAvi(id),
            0, 0, 0, n * 40L, "avi")
        })
      val frames = Multimodal
        .frameSample(media, everyMs = 40L, codec = Multimodal.VideoCodec)
        .mapPartitions(_.map { fr =>
          val bb = java.nio.ByteBuffer.wrap(fr.payload)
          val (w, h) = (bb.getInt(0), bb.getInt(4))
          var sum = 0L
          var p = 0
          while (p < w * h) {
            val o = 8 + p * 3
            sum += (fr.payload(o) & 0xff) + (fr.payload(o + 1) & 0xff) +
              (fr.payload(o + 2) & 0xff)
            p += 1
          }
          (fr.media_id, fr.frame_idx.toLong, w.toLong, h.toLong, sum)
        })
        .toDF("media_id", "frame_idx", "width", "height", "fsum")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("media_id").orderBy("frame_idx")
      frames
        .withColumn("pd", abs(col("fsum") - lag(col("fsum"), 1).over(w)))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("pd") > col("width") * col("height") * 30, 1L)
            .otherwise(0L)).as("n_cuts"))
        .orderBy("media_id")
    }),

    // q178 — AUDIO ENERGY / VAD WINDOWS: the first real processing op
    // on top of the real WAV codec (q79 proves decode) — decoded PCM
    // split into 20 ms (160-sample) windows, per-window absolute
    // energy in exact integer arithmetic, voiced-activity flag at the
    // uniform-noise midpoint threshold. The silence-trimming /
    // speech-segmentation pass an audio training pipeline runs before
    // transcription. Clip lengths are whole multiples of the window
    // (the generator guarantees it), so the window grid is exact;
    // only (media, window, energy) rows leave the decode stage.
    "q178_audio_vad" -> ((s, d) => {
      import s.implicits._
      val media = docs(s, d).where(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => Multimodal.Media(
          id, "audio", Multimodal.synthWav(id), 0, 0, 0, 0L, "wav")))
      media.mapPartitions { it =>
        it.grouped(Multimodal.DefaultBatchSize).flatMap(_.flatMap { m =>
          val raw = Multimodal.AudioCodec.decode(m.payload, m.format)
          val (_, n) = Multimodal.AudioCodec.rawDims(raw)
          (0 until n / 160).map { wi =>
            var sum = 0L
            var i = wi * 160
            while (i < (wi + 1) * 160) {
              sum += math.abs(Multimodal.AudioCodec.rawSample(raw, i).toLong)
              i += 1
            }
            (m.media_id, wi.toLong, sum, sum > 160L * 16384L)
          }
        })
      }.toDF("media_id", "win_idx", "energy", "voiced")
        .orderBy("media_id", "win_idx")
    }),

    // q369 — FRAME AUTOCORRELATION / PITCH CUE: per-frame
    // autocorrelation at pinned lags over the REAL WAV codec — the
    // periodicity feature a speech pipeline computes right after
    // q178's VAD energy (YIN/autocorr pitch detectors start exactly
    // here), and unlike a DFT it needs NO transcendental
    // coefficients, so the gate stays EXACT INTEGERS: R(ℓ) =
    // Σ_n x[n]·x[n+ℓ] over each 160-sample frame (zero-padded tail,
    // n ≤ 159−ℓ), ℓ ∈ {20, 40} (200/400 Hz at 8 kHz), R(0) = frame
    // energy, periodicity = max(R20, R40)·10⁶ div R0 — products
    // ≤ 2¹⁵·2¹⁵·160 fit comfortably in BIGINT, R0 = 0 cannot occur
    // (the sample polynomial never zeroes a whole frame) but guards
    // to −1 anyway. The oracle recomputes every sample from the
    // closed-form PCM polynomial (the q79 contract) — codec drift,
    // frame misalignment, or an off-by-one lag all hash-mismatch.
    // Plan: mapPartitions ONLY for the codec (payloads never
    // shuffle); the ≤ 9 frame rows per clip are the only exchange.
    "q369_audio_autocorr" -> ((s, d) => {
      import s.implicits._
      val ids = docs(s, d).where(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.flatMap { id =>
          val raw = Multimodal.AudioCodec.decode(
            Multimodal.synthWav(id), "wav")
          val (_, n) = Multimodal.AudioCodec.rawDims(raw)
          (0 until n / 160).map { wi =>
            def r(lag: Int): Long = {
              var acc = 0L
              var i = wi * 160
              while (i < (wi + 1) * 160 - lag) {
                acc += Multimodal.AudioCodec.rawSample(raw, i).toLong *
                  Multimodal.AudioCodec.rawSample(raw, i + lag).toLong
                i += 1
              }
              acc
            }
            val (r0, r20, r40) = (r(0), r(20), r(40))
            (id, wi.toLong, r0, r20, r40,
              if (r0 > 0L) math.max(r20, r40) * 1000000L / r0 else -1L)
          }
        }
      }.toDF("media_id", "win_idx", "r0", "r20", "r40", "period_micro")
        .orderBy("media_id", "win_idx")
    }),

    // q370 — SOBEL EDGE ENERGY over the REAL image codec: the
    // gradient-magnitude statistic (|Gx|+|Gy| over interior pixels of
    // the r+g+b luminance) — the blur/sharpness quality filter a
    // vision-data pipeline runs beside q131's pHash (similarity) and
    // q357's box downsample (resize); low edge energy = blurry or
    // flat asset, a standard curation drop rule. EXACT integers: the
    // 3×3 kernels are integer, luminance is an integer sum, the
    // per-image mean is one floored micro division. The oracle
    // rebuilds every pixel from the closed-form polynomial and
    // applies the SAME kernels via an 8-offset scatter-sum — decoder
    // drift, a flipped kernel, or a boundary off-by-one all
    // hash-mismatch. Plan: mapPartitions only for the codec; one
    // bounded row per image leaves the scan.
    "q370_sobel_energy" -> ((s, d) => {
      import s.implicits._
      val ids = docs(s, d).where(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.map { id =>
          val raw = Multimodal.ImageCodec.decode(
            Multimodal.synthImagePng(id), "png")
          val (w, h) = Multimodal.ImageCodec.rawDims(raw)
          def lum(x: Int, y: Int): Long = {
            val o = 8 + (y * w + x) * 3
            (raw(o) & 0xff).toLong + (raw(o + 1) & 0xff) +
              (raw(o + 2) & 0xff)
          }
          var sum = 0L
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val gx = lum(x + 1, y - 1) + 2 * lum(x + 1, y) +
                lum(x + 1, y + 1) - lum(x - 1, y - 1) -
                2 * lum(x - 1, y) - lum(x - 1, y + 1)
              val gy = lum(x - 1, y + 1) + 2 * lum(x, y + 1) +
                lum(x + 1, y + 1) - lum(x - 1, y - 1) -
                2 * lum(x, y - 1) - lum(x + 1, y - 1)
              sum += math.abs(gx) + math.abs(gy)
              x += 1
            }
            y += 1
          }
          (id, w.toLong, h.toLong, sum,
            sum * 1000000L / ((w - 2).toLong * (h - 2)))
        }
      }.toDF("media_id", "w", "h", "edge_sum", "mean_edge_micro")
        .orderBy("media_id")
    }),

    // q52 — eval-set DECONTAMINATION: training documents sharing any
    // 4-gram shingle with the (small) eval set — the pre-training
    // hygiene pass that keeps benchmark text out of the corpus. Eval
    // shingles broadcast; the train side is one scan-side explode +
    // broadcast hash join, no shuffle of the corpus. (For very long
    // shared runs, the winnowed-fingerprint variant (q28) does the
    // same join at ~2/(w+1) the shingle density.)
    "q52_decontaminate" -> ((s, d) => {
      val sh = docs(s, d).select(col("doc_id"),
        explode(expr("word_shingles(text, 4)")).as("sh"))
      val ev = sh.where(col("doc_id") < 50).toDF("eval_id", "sh")
      val tr = sh.where(col("doc_id") >= 50).toDF("train_id", "sh")
      tr.join(broadcast(ev), "sh")
        .select("train_id", "eval_id").distinct()
        .orderBy("train_id", "eval_id")
    }),

    // q104 — BLOOM-FILTER decontamination: the zero-join form of q52.
    // The eval-set shingles fold into ONE Bloom filter (fpp 1%) whose
    // size depends only on the eval set — never the corpus — and the
    // 100 TB corpus side is a pure scan-side membership probe
    // (bloom_contains, a native codegen'd expression): no shuffle, no
    // broadcast hash table of raw shingle strings, just bits. Bloom
    // prefilter → exact confirm against the (small) eval side, so the
    // output pairs are EXACTLY q52's — the sketch's no-false-negative
    // guarantee makes the prefilter lossless — and they hash-gate.
    // The sketch's two probabilistic properties ride along in-band
    // (q21/q95 pattern): fn_free (every exact hit passed the bloom —
    // guaranteed, asserted anyway) and fp_in_band (observed
    // false-positive rate over non-member probes ≤ 4× configured fpp;
    // deterministic for a given dataset, so stable run-to-run).
    "q104_bloom_decontaminate" -> ((s, d) => {
      import s.implicits._
      val sh = docs(s, d).select(col("doc_id"),
        explode(expr("word_shingles(text, 4)")).as("sh"))
      val ev = sh.where(col("doc_id") < 50).toDF("eval_id", "sh")
      val tr = sh.where(col("doc_id") >= 50).toDF("train_id", "sh")
      // Driver-side build over the EVAL side only — bounded by the
      // eval set, which is small by the premise of decontamination
      // (same bound as q52's broadcast side). For a multi-GB blocklist
      // swap in DataFrame.stat.bloomFilter's distributed treeAggregate
      // build; the probe side below is unchanged either way.
      val evalShingles = ev.select("sh").distinct().as[String].collect()
      val bf = org.apache.spark.util.sketch.BloomFilter
        .create(math.max(evalShingles.length, 1), 0.01)
      evalShingles.foreach(bf.putString)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val b64 = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
      val probe = expr(s"bloom_contains('$b64', sh)")
      // in-band sketch audit over the distinct train shingles
      val evalSet = ev.select("sh").distinct().withColumn("__ev", lit(true))
      val audit = tr.select("sh").distinct()
        .withColumn("__hit", probe)
        .join(broadcast(evalSet), Seq("sh"), "left")
        .agg(
          sum(when(col("__hit") && col("__ev").isNull, 1L).otherwise(0L))
            .as("__fp"),
          sum(when(col("__ev").isNull, 1L).otherwise(0L)).as("__nonmember"),
          sum(when(col("__ev").isNotNull && !col("__hit"), 1L).otherwise(0L))
            .as("__fn"))
        .select((col("__fn") === 0L).as("fn_free"),
          (col("__fp") <= greatest(col("__nonmember") * 0.04, lit(1.0)))
            .as("fp_in_band"))
      tr.where(probe)                       // scan-side bloom prefilter
        .join(broadcast(ev), "sh")          // exact confirm, eval side only
        .select("train_id", "eval_id").distinct()
        .crossJoin(broadcast(audit))        // one-row global flags
        .orderBy("train_id", "eval_id")
    }),

    // q105 — INVERTED-INDEX build with bounded posting heads: distinct
    // (token, doc) postings [one partial-agg'd shuffle], then per-term
    // document frequency plus only the FIRST 32 doc ids per term ever
    // materialize into a list — a stopword's multi-billion-row posting
    // never concentrates in one aggregation buffer at 100 TB (the full
    // list, when needed, ships sharded by the rn/32 block instead).
    // Both window functions share one (token) partitioning → a single
    // exchange serves the row_number and the count.
    "q105_inverted_index" -> ((s, d) => {
      val postings = docs(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .distinct()
      val byTok = Window.partitionBy("token")
      postings
        .withColumn("rn", row_number().over(byTok.orderBy("doc_id")))
        .withColumn("df", count(lit(1)).over(byTok))
        .where(col("rn") <= 32)
        .groupBy("token", "df")
        .agg(sort_array(collect_list(col("doc_id"))).as("__ids"))
        .select(col("token"), col("df"),
          array_join(expr("transform(__ids, x -> cast(x AS string))"), ",")
            .as("head"))
        .orderBy("token")
    }),

    // q106 — EDIT-DISTANCE near-dup pairs (the character-level member
    // of the dedup family: q17 set-overlap, q19 bit-distance, q106
    // string-distance): candidate pairs only WITHIN catalog blocks
    // (brand, type) further cut by the |len(a)-len(b)| ≤ t length
    // bound — a necessary condition for levenshtein ≤ t, so the block
    // join is lossless — then the threshold form levenshtein(a, b, 2)
    // which abandons each DP row early once the band exceeds t. No
    // all-pairs product exists; at 100 TB the fixed-cardinality
    // catalog block would be replaced by content-derived keys
    // (deletion-neighborhood / PASS-JOIN segments — q108 is exactly
    // that scalable successor), keeping per-block cardinality flat.
    "q106_editdist_pairs" -> ((s, d) => {
      val p = Tables.load(s, d, "part")
        .select("p_partkey", "p_name", "p_brand", "p_type")
      val a = p.toDF("a_key", "a_name", "brand", "ptype")
      val b = p.toDF("b_key", "b_name", "brand", "ptype")
      a.join(b, Seq("brand", "ptype"))
        .where(col("a_key") < col("b_key") &&
          abs(length(col("a_name")) - length(col("b_name"))) <= 2)
        .withColumn("dist", levenshtein(col("a_name"), col("b_name"), 2))
        .where(col("dist") >= 0)
        .select(col("a_key"), col("b_key"), col("dist").cast("long").as("dist"))
        .orderBy("a_key", "b_key")
    }),

    // q108 — PASS-JOIN edit-distance similarity join (the scalable
    // successor to q106): ALL near-dup pairs across the whole corpus,
    // no catalog blocking, via pigeonhole segment keys — see
    // [[EditDistJoin]] for the algorithm and its linearity argument.
    // Fixture: 30-char normalized-prefix fingerprints of every
    // document plus a planted 1-char mutant per document (the testdata
    // has no natural near-dups at the character level; the mutation
    // position doc_id%15+3 is deterministic and replayed verbatim in
    // the oracle), distinct'd. Every surviving (prefix, mutant) pair
    // is within distance 1 and must be found.
    "q108_passjoin_editdist" -> ((s, d) => {
      val p = docs(s, d)
        .select(col("doc_id"), substring(TextOps.norm(col("text")), 1, 30).as("s"))
      val m = p.select(
        when(length(col("s")) >= col("doc_id") % 15 + 3,
          expr("concat(substr(s, 1, doc_id % 15 + 2), 'q', " +
            "substr(s, doc_id % 15 + 4))"))
          .otherwise(col("s")).as("s"))
      val u = p.select("s").unionByName(m)
      EditDistJoin.pairs(u, "s", tau = 2)
        .orderBy("a_s", "b_s")
    }),

    // q114 — per-source KL DIVERGENCE from the corpus distribution:
    // the domain-drift detector a corpus-mixing run consults before
    // setting q43/q99's rates (a source whose unigram distribution
    // diverges from the pool gets inspected, not blindly sampled).
    // KL(P_src‖Q) = Σ p·ln(p/q) over the source's tokens, computed as
    // integer micro-units: term = c · floor(1e6·(ln c + ln T − ln C −
    // ln T_s)) — the log of each EXACT count taken separately (every
    // operand stays well inside double's 2^53 integer range, where
    // the product form c·T would overflow int64 at a few billion
    // corpus tokens), summed in a fixed order so both engines feed
    // ln identical doubles and the integer sums stay order-exact
    // (the q77 trick). One corpus tokenization; the (source, token)
    // groupBy is the only corpus-sized shuffle; token totals derive
    // from THAT aggregate (never a second pass) and join back on the
    // token key — the planner broadcasts while the vocabulary fits
    // and falls back to a shuffle join beyond (no forced-broadcast
    // OOM at extreme vocabularies); the bounded |sources|-row and
    // 1-row stats ARE forced broadcast. Output is the raw integer
    // sum (no final division — keeps negatives-safe integral
    // semantics engine-agnostic).
    "q114_kl_divergence" -> ((s, d) => {
      val toks = docs(s, d).select(col("source"),
        explode(TextOps.tokens(col("text"))).as("tk"))
      val st = toks.groupBy("source", "tk").agg(count(lit(1)).as("c"))
      val ct = st.groupBy("tk").agg(sum("c").as("cc"))
      val srcTot = st.groupBy("source").agg(sum("c").as("ts"))
      val tot = srcTot.agg(sum("ts").as("tt"))
      st.join(ct, "tk")
        .join(broadcast(srcTot), "source")
        .crossJoin(broadcast(tot))
        .withColumn("term", col("c") *
          floor((log(col("c")) + log(col("tt")) - log(col("cc")) -
            log(col("ts"))) * 1000000d).cast("long"))
        .groupBy("source")
        .agg(max("ts").as("n_tokens"), sum("term").as("kl_sum_micro"))
        .orderBy("source")
    }),

    // q115 — PAGERANK over the nation-level trade graph (supplier
    // nation → customer nation per lineitem, weight = shipment
    // count): see [[PageRank]] for the integer-arithmetic model and
    // the broadcast-rank iteration shape. The edge build joins the
    // fact table against two broadcast dims and partial-aggregates to
    // |nations|² edges — the only fact-sized work; five fixed
    // iterations then run on the tiny aggregate.
    "q115_pagerank" -> ((s, d) => {
      val l = Tables.load(s, d, "lineitem").select("l_orderkey", "l_suppkey")
      val o = Tables.load(s, d, "orders").select("o_orderkey", "o_custkey")
      val c = Tables.load(s, d, "customer").select("c_custkey", "c_nationkey")
      val su = Tables.load(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val edges = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("s_nationkey").cast("long").as("src"),
          col("c_nationkey").cast("long").as("dst"))
        .agg(count(lit(1)).as("w"))
      PageRank.ranks(edges, iters = 5).orderBy("node")
    }),

    // q117 — PPJOIN-style EXACT Jaccard similarity join over each
    // document's distinct 3-shingle set — see [[SetSimJoin]] for the
    // prefix-filter mechanics, the losslessness lemma, and the
    // Σ prefix-df² scale argument (property-tested equivalent to
    // brute force in SetSimJoinPropertySpec, measured in
    // SCALE_CURVE.md). Contrast q17/q18 (MinHash: probabilistic
    // recall) — this is the exact-recall member of the dedup family.
    "q117_ppjoin_jaccard" -> ((s, d) =>
      // shingle sets via the NATIVE word_shingles expression (one
      // codegen'd JVM call per row): the declarative transform-lambda
      // form re-evaluates the regex tokenize per array position
      // (higher-order functions don't codegen, so no subexpression
      // elimination inside the lambda) — measured ~10 s of pure
      // set-construction at sf0.1 before the swap
      SetSimJoin.jaccardPairs(docsWithDups(s, d), "doc_id",
          array_distinct(expr("word_shingles(text, 3)")),
          tau = 0.8)
        .select(col("a_id"), col("b_id"), col("inter"),
          round(col("jacc"), 6).as("jacc"))
        .orderBy("a_id", "b_id")),

    // q123 — PMI COLLOCATIONS: the top adjacent-token bigrams scored
    // by pointwise mutual information ln(p(w1w2)/(p(w1)p(w2))) — the
    // phrase-mining statistic that separates real collocations from
    // chance adjacency of frequent words. PMI lands in integer micro
    // units from per-count logs summed in a fixed order — ln of each
    // EXACT count separately (the q114 shape; the product form
    // c12·T² would overflow int64 at a few billion corpus tokens),
    // so both engines feed ln identical doubles. Unigram and bigram
    // vocabularies come from ONE corpus pass each (partial-agg
    // groupBys); the per-bigram scoring joins on the word key — the
    // planner broadcasts while the vocabulary fits, shuffle join
    // beyond (the 1-row totals ARE forced broadcast) — and the
    // top-20 is TakeOrdered, so the corpus never re-shuffles and the
    // bigram space never sorts globally.
    "q123_pmi_collocations" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"),
        TextOps.tokens(col("text")).as("toks"))
      val uni = base.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c1"))
      val bi = base.where(size(col("toks")) >= 2)
        .select(explode(TextOps.shingles(col("toks"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("c12"))
      val tt = uni.agg(sum("c1").as("t"))
      val bb = bi.agg(sum("c12").as("b"))
      bi
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
        .join(uni.toDF("w1", "ca"), "w1")
        .join(uni.toDF("w2", "cb"), "w2")
        .crossJoin(broadcast(tt)).crossJoin(broadcast(bb))
        .withColumn("pmi_micro",
          floor((log(col("c12")) + lit(2d) * log(col("t")) - log(col("b")) -
            log(col("ca")) - log(col("cb"))) * 1000000d).cast("long"))
        .select(col("bigram"), col("c12"), col("pmi_micro"))
        .orderBy(col("c12").desc, col("bigram"))
        .limit(20)
    }),

    // q125 — CO-OCCURRENCE mining (market-basket over documents):
    // token pairs appearing together in ≥ minSup documents, ranked by
    // document co-frequency — q123's PMI scores ADJACENT pairs, this
    // finds topical association at document scope. The Apriori
    // property does the pruning: a pair can reach support s only if
    // BOTH tokens have df ≥ s, so the within-doc self-join runs over
    // the support-filtered token stream (31 tokens here, never the
    // raw vocabulary) and the pair space is C(frequent-per-doc, 2),
    // not C(doc-length, 2). df comes from one partial-agg pass and
    // gates scan-side; the pair rollup is the only pair-sized
    // shuffle; top-30 is TakeOrdered.
    "q125_cooccurrence" -> ((s, d) => {
      val minSup = 10
      val tk = docs(s, d).select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("t"))
      val dfc = tk.groupBy("t").agg(count(lit(1)).as("df"))
      val f = tk.join(dfc.where(col("df") >= minSup), "t")
        .select("doc_id", "t")
      f.toDF("doc_id", "t1")
        .join(f.toDF("doc_id", "t2"), "doc_id")
        .where(col("t1") < col("t2"))
        .groupBy("t1", "t2")
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= minSup)
        .orderBy(col("n").desc, col("t1"), col("t2"))
        .limit(30)
    }),

    // q126 — deterministic STRATIFIED train/val/test SPLIT: every
    // document assigned to train/val/test by an md5-derived bucket
    // (80/10/10) — the reproducible split a training run needs, with
    // no RNG state, stable under corpus growth (a document's split
    // never changes when others are added), and uniform within every
    // source (the hash ignores source). Pure scan-side expression:
    // zero shuffles beyond the output ordering.
    "q126_train_split" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), col("source"),
          (conv(substring(md5(concat(lit("split:"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 100).as("b"))
        .select(col("doc_id"), col("source"),
          when(col("b") < 80, "train")
            .when(col("b") < 90, "val")
            .otherwise("test").as("split"))
        .orderBy("doc_id")),

    // q121 — CONTAINMENT join (asymmetric set-similarity):
    // |A∩B|/|A| ≥ τ finds documents SUBSUMED by others — quoted
    // passages, boilerplate wrappers, subset shards — which symmetric
    // Jaccard (q117) misses when |B| ≫ |A|. See
    // [[SetSimJoin.containmentPairs]] for the asymmetric prefix
    // filter (probe side only — lossless for containment) and the
    // scale argument. Directional output (a ⊂ b and b ⊂ a both
    // appear for identical sets).
    "q121_containment_join" -> ((s, d) =>
      SetSimJoin.containmentPairs(docsWithDups(s, d), "doc_id",
          array_distinct(expr("word_shingles(text, 3)")), // see q117
          tau = 0.9)
        .select(col("a_id"), col("b_id"), col("inter"),
          round(col("containment"), 6).as("containment"))
        .orderBy("a_id", "b_id")),

    // q118 — WEIGHTED sample without replacement (Efraimidis-
    // Spirakis A-ES): rank every document by −ln(u)/w where u is a
    // hash-derived uniform and w its weight (n_chars); the k smallest
    // keys are a weight-proportional sample. Like q116 this plans as
    // TakeOrderedAndProject — per-partition heaps, k rows moved, no
    // RNG state and no global sort — but the inclusion probability is
    // now proportional to weight, the cut a corpus-mixing run wants
    // when long documents should carry their token share. Keys are
    // identical doubles in both engines (hash→uniform→ln, the q77
    // libm-parity precedent); output pins the key in integer pico
    // units.
    "q118_weighted_sample" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), col("n_chars"),
          ((conv(substring(md5(concat(lit("ws:"), col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("long") + 1L) / 4294967297d).as("u"))
        .withColumn("k", negate(log(col("u"))) / col("n_chars"))
        .orderBy("k", "doc_id")
        .limit(50)
        .select(col("doc_id"), col("n_chars"),
          floor(col("k") * 1e12).cast("long").as("key_pico"))
        .orderBy("doc_id")),

    // q116 — deterministic BOTTOM-K global sample: the k smallest
    // md5(key) values ARE a uniform k-sample of the corpus, and
    // orderBy+limit plans as TakeOrderedAndProject — per-partition
    // top-k heaps merged at the driver, k rows moved, NO global sort
    // or shuffle of the corpus (contrast q62, which pays one full
    // exchange because it must ORDER the whole output). The same
    // hash-order trick underlies q61/q93's per-group cuts; this is
    // the global form, and it composes: re-running with a larger k
    // extends the same sample (hash order is stable).
    "q116_bottomk_sample" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          md5(concat(lit("bk:"), col("doc_id").cast("string"))).as("h"))
        .orderBy("h")
        .limit(50)
        .orderBy("doc_id")),

    // q55 — RAG/context-window chunking: 32-token windows every 24
    // tokens (8-token overlap) per document — fully scan-side fan-out
    // (explode of a per-row sequence), zero shuffles; the per-chunk
    // md5 lets downstream chunk-level dedup run without re-tokenizing
    "q55_doc_chunks" -> ((s, d) =>
      Chunk.sliding(docs(s, d), "doc_id", "text", window = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx")),

    // q56 — repetition-based quality signals (Gopher-style filters):
    // duplicate-token fraction, duplicate-2-gram fraction, and the
    // most-frequent-token share, all per document. Scan-side array
    // ops on the token list — the top-token count is O(distinct·n)
    // per row, the right trade for bounded-length documents (for
    // book-length rows, switch to the explode + two-level-agg shape
    // of q33/q34 instead).
    "q56_repetition" -> ((s, d) => {
      val toks = col("__toks")
      docs(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
        .withColumn("__grams", TextOps.shingles(toks, 2))
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tok"),
          round(lit(1d) - size(array_distinct(toks)).cast("double")
            / size(toks), 6).as("dup_tok_ratio"),
          round(lit(1d) - size(array_distinct(col("__grams"))).cast("double")
            / size(col("__grams")), 6).as("dup_2gram_ratio"),
          round(expr("array_max(transform(array_distinct(__toks), " +
            "t -> size(filter(__toks, x -> x = t))))").cast("double")
            / size(toks), 6).as("top_tok_ratio"))
        .orderBy("doc_id")
    }),

    // q57 — PII-style redaction scrub: emails first, then digit runs,
    // replaced by placeholder tokens, with per-document redaction
    // counts. The corpus text has no PII, so a deterministic synthetic
    // contact suffix is appended per row (same expression in the
    // oracle) — the regexes and the two-pass replace order are the
    // real operator. Scan-side regexp_replace, zero shuffles.
    "q57_pii_redact" -> ((s, d) => {
      val email = "[a-z0-9.]+@[a-z0-9.]+"
      docs(s, d)
        .withColumn("__raw", concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@mail.example ph +1-"),
          (col("doc_id") * 7).cast("string")))
        .withColumn("n_emails",
          size(regexp_extract_all(col("__raw"), lit(email), lit(0)))
            .cast("long"))
        .withColumn("__e1", regexp_replace(col("__raw"), email, "<EMAIL>"))
        .select(col("doc_id"), col("n_emails"),
          size(regexp_extract_all(col("__e1"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_nums"),
          md5(regexp_replace(col("__e1"), "[0-9]+", "<NUM>"))
            .as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // q21 — HLL-style approximate distinct (HyperLogLog++ partial agg:
    // sketch merge across partitions). Hash-gated WITHOUT hashing the
    // engine-specific estimate: the output columns are the exact
    // distinct count plus `est_in_band`, the in-gate range assertion
    // that the sketch landed within 3×rsd of truth (rsd is a STANDARD
    // DEVIATION, not a bound — at the default rsd=0.05 the 3σ band is
    // 15%, making a false red a ~0.3% event even if a Spark upgrade
    // reshuffles the sketch internals; Spark's sketch is deterministic
    // for a given dataset, so the flag is stable run-to-run). The
    // oracle emits TRUE — a red q21 therefore means the estimate left
    // the 3σ band: likely sketch drift after an engine change, worth a
    // look but not necessarily a correctness bug. ApproxDistinctSpec
    // additionally bounds the raw error.
    "q21_approx_distinct" -> ((s, d) =>
      graft.Tables.load(s, d, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("__approx"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__approx") - col("exact_users"))
            <= col("exact_users") * (3 * 0.05d)).as("est_in_band"))
        .orderBy("event_type")),

    // q58 — per-document top TF-IDF term: explode → partial-agg tf,
    // vocab-sized df join, per-doc argmax as min_by partial agg (no
    // rank window over (doc, term) pairs)
    "q58_tfidf_top_term" -> ((s, d) =>
      Relevance.topTfidfTerm(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // q59 — BM25 ranked retrieval for a fixed 4-term query: scan-side
    // term filter (≤4 surviving rows per doc), broadcast df/avgdl
    // stats, TakeOrdered top-20
    "q59_bm25_topk" -> ((s, d) =>
      Relevance.bm25TopK(docs(s, d), "doc_id", "text",
        terms = Seq("join", "hash", "vector", "stream"), k = 20)
        .orderBy("doc_id")),

    // q60 — symmetric int8 embedding quantization: per-row lambda
    // arithmetic in the scan projection, zero shuffles; codes verified
    // via md5 of the joined int vector
    "q60_embed_quantize" -> ((s, d) =>
      Quantize.int8(embs(s, d), "vec_id", "embedding")
        .orderBy("vec_id")),

    // q61 — deterministic stratified sample: exact per-language top-5
    // by md5 order, computed two-level (per-(lang,split) top-k then
    // per-lang top-k) so no window ever partitions by the
    // low-cardinality group alone
    "q61_stratified_sample" -> ((s, d) =>
      Sample.stratifiedTopK(docs(s, d), "lang", "doc_id", k = 5)
        .orderBy("lang", "smp_rank")),

    // q62 — deterministic global shuffle for training order: stable
    // hash shard + within-shard rank; the only exchange is the 32-way
    // shard partition, sorts stay shard-local
    "q62_global_shuffle" -> ((s, d) =>
      Sample.globalShuffle(docs(s, d), "doc_id", shards = 32)
        .orderBy("shard", "pos")),

    // q63 — random-hyperplane LSH near-dup: the training-free ANN
    // blocking path next to q25's IVF (md5-derived hyperplanes baked
    // into the plan as literals; code computation is scan-side, the
    // only exchange is the bucket groupBy)
    "q63_ann_lsh" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val withDups = e.unionByName(
        e.select((col("vec_id") + 100000).as("vec_id"), col("emb")))
      AnnLsh.nearDupPairs(withDups, "vec_id", "emb",
        nbits = 8, threshold = 0.999)
        .orderBy("id_a", "id_b")
    }),

    // q64 — column profiling (per-column null/distinct/min/max): the
    // warehouse data-quality pass. One narrow pruned scan per profiled
    // column, exact distinct via partial-agg groupBy semantics
    "q64_profile" -> ((s, d) => {
      val ev = graft.Tables.load(s, d, "events")
      def prof(c: String, isNum: Boolean) = {
        val agged = ev.agg(
          count(col(c)).as("n_nonnull"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"),
          (if (isNum) round(min(col(c)).cast("double"), 6)
           else lit(null).cast("double")).as("min_num"),
          (if (isNum) round(max(col(c)).cast("double"), 6)
           else lit(null).cast("double")).as("max_num"))
        agged.select(lit(c).as("col_name"), col("n_nonnull"), col("n_null"),
          col("n_distinct"), col("min_num"), col("max_num"))
      }
      prof("user_id", isNum = true)
        .unionByName(prof("event_type", isNum = false))
        .unionByName(prof("value", isNum = true))
        .orderBy("col_name")
    }),

    // q65 — incremental dedup: a new batch (the planted copies) is
    // first deduped within itself (min-id per fingerprint, partial
    // agg), then anti-joined by fingerprint against the existing
    // corpus — the steady-state ingestion-time dedup, one hash
    // shuffle + one hash anti-join on 32-char keys, never text
    "q65_incremental_dedup" -> ((s, d) => {
      val fp = TextOps.fingerprint(col("text"))
      val existing = docs(s, d).where(col("doc_id") < 250)
        .select(fp.as("fp")).distinct()
      val fresh = docs(s, d)
        .select((col("doc_id") + 100000).as("doc_id"), fp.as("fp"))
      fresh.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .join(existing, Seq("fp"), "left_anti")
        .select("doc_id", "fp")
        .orderBy("doc_id")
    }),

    // q67 — time-series gap fill: per-user daily event counts with
    // every missing day in the user's own [first, last] span
    // zero-filled — the resample/densify step before any training on
    // regular time grids. The day scaffold is a per-user
    // `explode(sequence(d0, d1))` (span-bounded, no calendar table
    // shuffle); the fill join is on (user, day) — all work partitioned
    // by user, nothing global.
    "q67_gapfill" -> ((s, d) => {
      val ev = graft.Tables.load(s, d, "events")
        .where(col("user_id") < 30)
        .withColumn("day", expr("ts div 86400000000000"))
      val daily = ev.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sv"))
      val span = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val scaffold = span.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      scaffold.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sv"), lit(0d)).as("sv"))
        .orderBy("user_id", "day")
    }),

    // q77 — unigram-LM perplexity scoring (CCNet-style quality
    // filter): each document's mean -ln p(token) under the corpus's
    // own add-one unigram LM. LM broadcast; integer-scaled log-probs
    // make the per-doc sums order-exact
    "q77_unigram_nll" -> ((s, d) =>
      Relevance.unigramNll(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // q103 — conditional bigram-LM scoring: the order-2 twin of q77's
    // unigram filter (see Relevance.bigramNll for the model and the
    // broadcast-LM scale shape)
    "q103_bigram_nll" -> ((s, d) =>
      Relevance.bigramNll(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // q245 — interpolated Kneser-Ney bigram NLL: the
    // continuation-probability smoothing tier above q103's add-one
    // (see [[Relevance.kneserNeyNll]] for the exact-rational D=¾
    // form); same zipf-bounded LM-table plan, corpus never shuffles
    // on a bigram key
    "q245_kneser_ney_nll" -> ((s, d) =>
      Relevance.kneserNeyNll(docs(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // q68 — pivot (wide aggregation): per-user event counts spread
    // over the five known event types as columns. Explicit pivot
    // values keep it a single partial-agg pass (no values-discovery
    // job); at 100 TB this is one groupBy shuffle of 5-slot rows.
    "q68_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      graft.Tables.load(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
        .orderBy("user_id")
    }),

    // q93 — per-source TOKEN-BUDGET selection: each source contributes
    // documents in a deterministic md5-shuffled order until its char
    // budget (4000) fills; a doc is kept only if it fits entirely. This
    // is the "give me N tokens per domain" cut a corpus-mixing run
    // makes after q43's rate mixing — a running budget, not a count or
    // rate, so it needs the per-group prefix sum. Pack.withGroupedOffset
    // runs it as a two-level block prefix sum keyed by (source, ord
    // block): no window is ever ordered across a whole source, so one
    // giant domain can't serialize into a single task at 100 TB.
    "q93_token_budget" -> ((s, d) => {
      // uniform deterministic order key: first 8 md5 hex chars of the
      // doc id — same construction q43/q62 use, so blocks stay balanced
      val ord = expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as long)")
      Pack.withGroupedOffset(
        docs(s, d).select("doc_id", "source", "n_chars"),
        "source", ord, "doc_id", "n_chars", blockWidth = 1L << 26)
        .where(col("__start") + col("n_chars") <= 4000)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("__start").as("start_chars"))
        .orderBy("doc_id")
    }),

    // q95 — count-min-sketch heavy hitters: the corpus token stream
    // folded into ONE fixed-size 4×256 counter grid (native
    // TypedImperativeAggregate, merged cell-wise under partial agg — the
    // exchange carries one 8 KiB grid per partition, never token rows),
    // then the exact top-20 tokens probed against it. The sketch is
    // bit-deterministic (md5 hash family, commutative counts), so the
    // ESTIMATES are hashed against a DuckDB cell-grid reconstruction —
    // not just banded — and the CMS guarantee est >= exact rides along
    // as an in-band boolean. This is the frequency member of the sketch
    // family: q21 HLL (distinct), q95 CMS (counts), q97 GK (ranks).
    "q95_cms_heavy_hitters" -> ((s, d) => {
      val toks = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val sketch = toks.agg(expr("cms_sketch(token, 4, 256)").as("cells"))
      val exact = toks.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
      // declarative probe: min_j cells[j*width + h_j(token)], the same
      // md5-prefix hash family the sketch uses internally
      val probe = expr(
        "array_min(transform(sequence(0, 3), j -> element_at(cells, " +
          "cast(j * 256 + cast(conv(substring(md5(concat(" +
          "cast(j as string), ':', token)), 1, 8), 16, 10) as bigint) % 256 " +
          "+ 1 as int))))")
      exact.crossJoin(broadcast(sketch))
        .withColumn("est", probe)
        .select(col("token"), col("n"), col("est"),
          (col("est") >= col("n")).as("never_under"))
        .orderBy(col("n").desc, col("token"))
    }),

    // q96 — SEMANTIC dedup end-to-end (the embedding-space analog of
    // q88's text pruning, the SemDeDup recipe): corpus ∪ planted exact
    // copies bucketed by nearest centroid, near-dup pairs found only
    // WITHIN buckets (cosine >= 0.999, never all-pairs), transitive
    // closure by the same diameter-bounded min-label propagation as
    // q38, one surviving representative (min vec_id) + member count per
    // semantic cluster. Every stage is the already-proven operator —
    // IVF assignment (broadcast centroids), in-bucket pairing, CC, a
    // partial-agg'd prune — composed into the pipeline a 100 TB
    // embedding-dedup pass actually ships.
    "q96_semantic_dedup" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val withDups = e.unionByName(
        e.select((col("vec_id") + 100000).as("vec_id"), col("emb")))
      val pairs = AnnIvf.nearDupPairs(withDups, e.where(col("vec_id") < 16),
        threshold = 0.999)
      Cluster.connectedComponents(
        withDups.select("vec_id"), pairs, "vec_id", "id_a", "id_b")
        .groupBy("cluster")
        .agg(min(col("vec_id")).as("keep_id"), count(lit(1)).as("n_members"))
        .select("keep_id", "n_members")
        .orderBy("keep_id")
    }),

    // q99 — TEMPERATURE-scaled corpus mixing (the multilingual-LM
    // alpha-sampling recipe, next to q43's fixed rates and q93's hard
    // budgets): per-source sampling rates derived from the data's own
    // mass distribution, p_s ∝ mass_s^0.5, targeting ~200 docs total.
    // The stats pass is one partial-agg groupBy over |sources| rows;
    // rates broadcast back; the keep decision is the same scan-side
    // md5-bucket test as q43 — the corpus itself never shuffles.
    // Cross-engine float determinism: the sqrt weights are floored to
    // integer MICRO-units before the normalizer sums them, so the only
    // order-sensitive reduction is an exact integer sum; the remaining
    // double arithmetic is the identical left-associated expression on
    // both engines (each step IEEE-rounded from identical inputs).
    "q99_temperature_mix" -> ((s, d) => {
      val stats = docs(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("double").as("mass"))
        .withColumn("wm",
          floor(sqrt(col("mass")) * lit(1000000.0)).cast("long"))
      val z = stats.agg(sum("wm").as("z"))
      val rates = stats.crossJoin(broadcast(z))
        .select(col("source"),
          floor(lit(1000000.0) * lit(200.0) * col("wm")
            / col("z").cast("double") / col("n_docs"))
            .cast("long").as("ppm"))
      docs(s, d)
        .join(broadcast(rates), "source")
        .where(expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), " +
          "16, 10) as bigint) % 1000000") < col("ppm"))
        .select("doc_id", "source", "ppm")
        .orderBy("doc_id")
    }),

    // q101 — per-document duplicated-span ratio (the boilerplate /
    // memorization-contamination score next to q86's global span
    // mining): for each doc, the fraction of its 3-gram span
    // OCCURRENCES that also appear in at least one other document —
    // the per-row signal a curation pass thresholds on, where q86
    // ranks the spans themselves. Shape: the exploded stream is
    // pre-aggregated to per-(doc, span) occurrence counts right after
    // the scan, so BOTH consumers — the doc-frequency agg (now a
    // plain count over deduplicated pairs, no two-level distinct) and
    // the join probe side — shuffle one row per (doc, span), never
    // one per occurrence; final per-doc partial-agg groupBy over
    // sums of the carried counts. Text never shuffles.
    "q101_span_novelty" -> ((s, d) => {
      val pairs = docs(s, d)
        .select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("sh"))
        .groupBy("doc_id", "sh")
        .agg(count(lit(1)).as("occ"))
      val counts = pairs.groupBy("sh").agg(count(lit(1)).as("n_docs"))
      pairs.join(counts, "sh")
        .groupBy("doc_id")
        .agg(sum(col("occ")).as("n_spans"),
          sum(when(col("n_docs") >= 2, col("occ")).otherwise(0L))
            .as("n_dup_spans"))
        .withColumn("dup_ratio",
          round(col("n_dup_spans") / col("n_spans").cast("double"), 6))
        .orderBy("doc_id")
    }),

    // q303 — KMV (BOTTOM-K) DISTINCT SKETCH + SET-OPERATION ESTIMATES:
    // the k-minimum-values sketch (Bar-Yossef et al. / the theta-
    // sketch core) beside q21's HLL — KMV's edge is SET ALGEBRA: two
    // sources' vocabulary overlap is estimated from their merged
    // bottom-64 alone, without re-touching the corpus. Values are
    // distinct 3-gram shingle HASHES (md5 top-32-bits + 1, identical
    // in both engines, so the sketch itself is deterministic and the
    // gate hashes estimates directly — no tolerance bands). Per pair:
    // θ = 64th-smallest of the merged sketch, est_union =
    // 63·2³² div θ (exact count when the merge holds < 64 — the KMV
    // exact-below-k rule), est_inter = ρ·est_union div 64 with ρ the
    // bottom-64 values present in BOTH sketches. The exact audit legs
    // ride the same distinct-(source,h) table. Plan: one distinct
    // shuffle, one 20-row-per-source bounded top_k partial agg; the
    // pair stage crosses the ≤|sources| sketch TABLE (fixed-
    // cardinality domain — 20 here; the corpus is never re-paired),
    // arrays ≤128 long in-row.
    "q303_kmv_sketch" -> ((s, d) => {
      val sh = docs(s, d)
        .select(col("source"),
          explode(array_distinct(expr("word_shingles(text, 3)"))).as("t"))
        .select(col("source"),
          (expr("cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)")
            + 1).as("h"))
        .distinct()
      val skt = sh.groupBy("source")
        .agg(expr("top_k(-h, h, 64)").as("tk"), count(lit(1)).as("n_h"))
        .select(col("source"), col("n_h"),
          expr("transform(tk, x -> x.id)").as("vals"))
      val estP = skt.toDF("src_a", "n_a", "va")
        .crossJoin(broadcast(skt.toDF("src_b", "n_b", "vb")))
        .where(col("src_a") < col("src_b"))
        .withColumn("u", array_sort(array_union(col("va"), col("vb"))))
        .withColumn("nu", size(col("u")).cast("long"))
        .withColumn("theta",
          element_at(col("u"), least(col("nu"), lit(64L)).cast("int")))
        .withColumn("bottom",
          slice(col("u"), lit(1), least(col("nu"), lit(64L)).cast("int")))
        .withColumn("rho", size(array_intersect(col("bottom"),
          array_intersect(col("va"), col("vb")))).cast("long"))
        .withColumn("est_union", when(col("nu") >= 64,
          expr("270582939648 div theta")).otherwise(col("nu")))
        .withColumn("est_inter", when(col("nu") >= 64,
          expr("rho * est_union div 64")).otherwise(col("rho")))
        .select("src_a", "src_b", "est_union", "est_inter")
      val exN = sh.groupBy("source").agg(count(lit(1)).as("nx"))
      val exI = sh.toDF("src_a", "h").join(sh.toDF("src_b", "h"), Seq("h"))
        .where(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("exact_inter"))
      estP
        .join(broadcast(exN.toDF("src_a", "na")), "src_a")
        .join(broadcast(exN.toDF("src_b", "nb")), "src_b")
        .join(exI, Seq("src_a", "src_b"), "left")
        .select(col("src_a"), col("src_b"), col("est_union"),
          col("est_inter"),
          (col("na") + col("nb")
            - coalesce(col("exact_inter"), lit(0L))).as("exact_union"),
          coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
        .orderBy("src_a", "src_b")
    }),

    // q304 — FEATURE HASHING (the hashing-trick vectorizer,
    // Weinberger et al. / Vowpal Wabbit): tokens projected into D=64
    // signed buckets — bucket = md5 mod D, sign = the next hash bit —
    // the fixed-width featurization that needs NO vocabulary build,
    // which is the whole point at 100 TB (no vocab table to shuffle,
    // no OOV). The signed sum makes collisions unbiased (E[dot] is
    // preserved — the hashing-trick theorem). Gate: per-doc nnz, L2²
    // and L1 of the hashed vector in exact integers. Plan: scan-side
    // hashing, one (doc, bucket) partial agg, one per-doc fold —
    // bounded by docs × D, text never shuffles.
    "q304_feature_hashing" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .withColumn("h", expr(
          "cast(conv(substring(md5(concat('fh:', tok)), 1, 8), 16, 10) " +
            "as bigint)"))
        .withColumn("bucket", col("h") % 64)
        .withColumn("sign",
          when(expr("h div 64 % 2") === 0, 1L).otherwise(-1L))
        .groupBy("doc_id", "bucket").agg(sum("sign").as("v"))
        .where(col("v") =!= 0)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nnz"),
          sum(expr("v * v")).as("l2sq"),
          sum(abs(col("v"))).as("l1"))
        .orderBy("doc_id")
    }),

    // q305 — INT8 SCALAR QUANTIZATION + RECONSTRUCTION ERROR: the
    // simplest embedding-compression tier (4× over float32) beside
    // q228's PQ — per-DIMENSION min/max calibration over the corpus,
    // values quantized to the 0..255 grid, and the thing a deployment
    // actually gates on: reconstruction error per vector. All exact
    // integers: 6-dp micros in, q = (x−min)·255 div (max−min),
    // dequant back on the same grid, squared error summed per vector
    // (≤ (range/255)²·dims — bigint-safe by construction). Plan: one
    // per-dim bounded agg (64 rows) broadcast back over the scan, one
    // per-vector fold; the corpus shuffles once on nothing wider than
    // (vec_id, dim, micro).
    "q305_int8_quant" -> ((s, d) => {
      val x = embs(s, d)
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("dim", "xv")))
        .withColumn("xm", round(round(col("xv"), 6) * 1000000).cast("long"))
      val stats = x.groupBy("dim").agg(min("xm").as("mn"), max("xm").as("mx"))
      x.join(broadcast(stats), "dim")
        .withColumn("q", when(col("mx") > col("mn"),
          expr("(xm - mn) * 255 div (mx - mn)")).otherwise(0L))
        .withColumn("err", col("xm") - expr("mn + q * (mx - mn) div 255"))
        .groupBy("vec_id")
        .agg(sum(expr("err * err")).as("err_sq_sum"),
          max(abs(col("err"))).as("max_abs_err"))
        .orderBy("vec_id")
    }),

    // q306 — INCREMENTAL CONNECTED-COMPONENTS MAINTENANCE: the
    // cluster-maintenance member of the incremental family (q143
    // dedup index, q244 ANN postings, q76 views) — a new document
    // batch arrives and near-dup cluster labels are UPDATED without
    // re-pairing the old corpus. Old-corpus connectivity is carried
    // as (doc → label) edges from the previous assignment (sound
    // because labels summarize exactly the old-old pairs, and LSH
    // band signatures are per-doc — a bucket's old members paired
    // before). New candidates come only from band buckets a NEW doc
    // touches, pairs restricted to new-touching, verified at the q38
    // threshold. The gate is the STRONG claim: incremental labels ≡
    // the full q38 recompute (the oracle IS the full recompute) —
    // min-label CC over labels0-edges ∪ new pairs converges to the
    // same representatives. Cost: probe ∝ new batch × bucket density,
    // CC rounds ∝ diameter, never old-corpus re-pairing.
    "q306_incremental_cc" -> ((s, d) => {
      val base = docsWithDups(s, d)
      val isNew = col("doc_id") % 5 === 4
      val oldD = base.where(!isNew)
      val labels0 = Cluster.connectedComponents(
        oldD.select("doc_id"),
        NearDup.jaccardPairs(oldD, "doc_id", "text", threshold = 0.8),
        "doc_id", "doc_a", "doc_b")
      val bs = NearDup.bands(base, "doc_id", "text")
      val hot = bs.where(isNew).select("band", "key").distinct()
      val cand = bs.join(hot, Seq("band", "key"))
        .groupBy("band", "key")
        .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")) > 1)
        .select(explode(expr(
          "flatten(transform(ids, (x, i) -> " +
            "transform(slice(ids, i + 2, size(ids)), " +
            "y -> struct(x as doc_a, y as doc_b))))")).as("p"))
        .select(col("p.doc_a"), col("p.doc_b")).distinct()
        .where(col("doc_a") % 5 === 4 || col("doc_b") % 5 === 4)
      val texts = base.select(col("doc_id"), col("text"))
      val pairsNew = cand
        .join(texts.toDF("doc_a", "text_a"), "doc_a")
        .join(texts.toDF("doc_b", "text_b"), "doc_b")
        .where(round(expr("shingle_jaccard(text_a, text_b, 3)"), 6) >= 0.8)
        .select("doc_a", "doc_b")
      val edges = labels0.select(col("doc_id").as("doc_a"),
          col("cluster").as("doc_b"))
        .unionByName(pairsNew)
      Cluster.connectedComponents(base.select("doc_id"), edges,
        "doc_id", "doc_a", "doc_b")
        .orderBy("doc_id")
    }),

    // q321 — BLOOM FILTER CAPACITY PLANNER: the sizing arithmetic
    // behind every bloom this engine ships (per-file lookup blooms,
    // q104's decontamination filter) — optimal bits
    // m = ⌈−n·ln p / (ln 2)²⌉ and hash count k = round(m/n·ln 2) for
    // a 1 % target fpp, per source. BOTH transcendental factors are
    // pinned micro literals (−ln 0.01/(ln 2)² and ln 2, computed once
    // in Scala, interpolated into both engines); the ceil/round land
    // as exact integer divisions. One bounded per-source count — the
    // planner costs nothing, which is the point of running it before
    // a 100 TB build instead of after.
    "q321_bloom_planner" -> ((s, d) => {
      docs(s, d).groupBy("source").agg(count(lit(1)).as("n_docs"))
        .select(col("source"), col("n_docs"),
          expr(s"(n_docs * ${BloomBitsFactorMicro}L + 999999) div 1000000")
            .as("m_bits"))
        .withColumn("k_hashes",
          expr("(m_bits * 693147 + n_docs * 500000) div (n_docs * 1000000)"))
        .withColumn("bytes", expr("(m_bits + 7) div 8"))
        .orderBy("source")
    }),

    // q318 — RENDEZVOUS (HRW) SHARD REBALANCING AUDIT: the sharding
    // math a 1000-executor deployment lives on — each doc's shard is
    // the argmax of md5(doc, shard) over the shard set (highest
    // random weight), and the audit measures what GROWING 8 → 9
    // shards moves. HRW's guarantee is the gate's shape: a doc either
    // stays put or moves TO THE NEW shard (consistent-hashing's
    // minimal-disruption property — every (old ≠ new) row must have
    // new = 8, and ~1/9 of docs move). All integer md5 arithmetic,
    // scan-side fan-out of 9 hash rows per doc collapsed by max_by
    // partial aggs.
    "q318_rendezvous_shards" -> ((s, d) => {
      val hsh = docs(s, d)
        .select(col("doc_id"),
          explode(sequence(lit(0L), lit(8L))).as("shard"))
        .withColumn("h", expr(
          "cast(conv(substring(md5(concat('hrw:', " +
            "cast(doc_id as string), ':', cast(shard as string))), " +
            "1, 15), 16, 10) as bigint)"))
      def owner(df: DataFrame, out: String) = df.groupBy("doc_id")
        .agg(max_by(col("shard"), struct(col("h"),
          (-col("shard")).as("ns"))).as(out))
      owner(hsh.where(col("shard") < 8), "old_shard")
        .join(owner(hsh, "new_shard"), "doc_id")
        .groupBy("old_shard", "new_shard")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("moved", col("old_shard") =!= col("new_shard"))
        .orderBy("old_shard", "new_shard")
    }),

    // q313 — TF-IDF SPARSE kNN (nearest document by weighted term
    // overlap): the lexical similarity-search tier between exact
    // shingle Jaccard (q18) and dense ANN (q22) — classic sparse
    // retrieval over an inverted index with DF-CUT candidate
    // blocking: only terms with 2 ≤ df ≤ 20 generate candidate pairs
    // (Σ df² bounded by the cut; pairs sharing ONLY common terms are
    // the accepted miss — the df-cut is the sparse analog of q117's
    // prefix filter, stated and replayed in the oracle). Weights are
    // exact integers: w = tf·(⌊ln N·100⌋ − ⌊ln df·100⌋) — CENTI-logs,
    // not micros, so the Σ w_a·w_b·10⁶ fold stays in bigint (micro
    // idf would overflow the dice numerator; at centi scale the floor
    // boundaries are 10⁴× coarser than the audited micro domain).
    // Score = weighted Dice 2·num·10⁶ div (na+nb) — sqrt-free, so no
    // float crosses the gate; best neighbor per doc at ≥ 1%.
    "q313_tfidf_knn" -> ((s, d) => {
      val terms = docs(s, d)
        .select(col("doc_id"), explode(expr("word_shingles(text, 3)")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
      val dfT = terms.groupBy("t").agg(count(lit(1)).as("df"))
        .where(col("df").between(2, 20))
      val nDocs = docs(s, d).count()
      val w = terms.join(dfT, "t")
        .withColumn("w", col("tf") *
          (lit(math.floor(math.log(nDocs.toDouble) * 100).toLong)
            - expr("cast(floor(ln(cast(df as double)) * 100) as bigint)")))
      val norms = w.groupBy("doc_id").agg(sum(expr("w * w")).as("nrm"))
      val wv = w.select("doc_id", "t", "w")
      val num = wv.toDF("doc_a", "t", "w_a")
        .join(wv.toDF("doc_b", "t", "w_b"), Seq("t"))
        .where(col("doc_a") =!= col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(expr("w_a * w_b")).as("num"))
      val wbest = Window.partitionBy("doc_a")
        .orderBy(col("dice_micro").desc, col("doc_b"))
      num
        .join(norms.toDF("doc_a", "na"), "doc_a")
        .join(norms.toDF("doc_b", "nb"), "doc_b")
        .withColumn("dice_micro", expr("2 * num * 1000000 div (na + nb)"))
        .withColumn("rn", row_number().over(wbest))
        .where(col("rn") === 1 && col("dice_micro") >= 10000L)
        .select(col("doc_a").as("doc_id"), col("doc_b").as("nn_doc"),
          col("dice_micro"))
        .orderBy("doc_id")
    }),

    // q308 — CLUSTER PURITY vs GROUND-TRUTH LABELS: the first of the
    // embedding-EVALUATION family (the `label` column is the held-out
    // truth) — how label-homogeneous are the IVF buckets the ANN/
    // semantic-dedup path actually searches? Per bucket: size, the
    // majority label (ties → smallest label) and purity in integer
    // micros. Plan: the q22 assignment (√N first-k centroids,
    // broadcast) + two bounded partial aggs — buckets × labels is a
    // fixed small grid, the corpus shuffles once on (bucket, label).
    "q308_cluster_purity" -> ((s, d) => {
      val e = embs(s, d).select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"), col("label"))
      val kc = math.ceil(math.sqrt(e.count().toDouble)).toLong
      val assigned = AnnIvf.assignBuckets(
        e.select("vec_id", "emb"), e.where(col("vec_id") < kc))
      assigned.join(e.select("vec_id", "label"), "vec_id")
        .groupBy("bucket", "label").agg(count(lit(1)).as("nbl"))
        .groupBy("bucket")
        .agg(sum("nbl").as("n"),
          max_by(col("label"), struct(col("nbl"),
            (-col("label")).as("nl"))).as("top_label"),
          max_by(col("nbl"), struct(col("nbl"),
            (-col("label")).as("nl"))).as("top_n"))
        .select(col("bucket"), col("n"), col("top_label"),
          expr("top_n * 1000000 div n").as("purity_micro"))
        .orderBy("bucket")
    }),

    // q309 — NORMALIZED MUTUAL INFORMATION of buckets vs labels: the
    // scale-free companion to q308's purity (purity inflates with
    // bucket count; NMI does not). ALL-INTEGER information theory:
    // every log is a micro-log of an EXACT INTEGER RATIO —
    // I_scaled = Σ n_ij·(⌊ln(N·n_ij)·10⁶⌋ − ⌊ln(n_i·n_j)·10⁶⌋), the
    // entropies likewise, and NMI = 2I/(H_b+H_l) leaves integers only
    // in the final division (the common N scale cancels). Log
    // arguments stay ≤ N² ≤ 4·10⁶ at gate scales — inside
    // MicroLogBoundarySpec's audited ≥16-ulp domain. One grid-bounded
    // agg over the q308 assignment.
    "q309_cluster_nmi" -> ((s, d) => {
      val e = embs(s, d).select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"), col("label"))
      val kc = math.ceil(math.sqrt(e.count().toDouble)).toLong
      val grid = AnnIvf.assignBuckets(
          e.select("vec_id", "emb"), e.where(col("vec_id") < kc))
        .join(e.select("vec_id", "label"), "vec_id")
        .groupBy("bucket", "label").agg(count(lit(1)).as("nij"))
      val nb = grid.groupBy("bucket").agg(sum("nij").as("ni"))
      val nl = grid.groupBy("label").agg(sum("nij").as("nj"))
      val tot = grid.agg(sum("nij").as("n"))
      def ml(x: String) = s"cast(floor(ln(cast(($x) as double)) * 1000000) as bigint)"
      val iS = grid.join(nb, "bucket").join(nl, "label")
        .crossJoin(broadcast(tot))
        .agg(sum(expr(
          s"nij * (${ml("n * nij")} - ${ml("ni * nj")})")).as("i_scaled"))
      val hb = nb.crossJoin(broadcast(tot))
        .agg(sum(expr(s"ni * (${ml("n")} - ${ml("ni")})")).as("h_bucket"))
      val hl = nl.crossJoin(broadcast(tot))
        .agg(sum(expr(s"nj * (${ml("n")} - ${ml("nj")})")).as("h_label"))
      tot.crossJoin(broadcast(iS)).crossJoin(broadcast(hb))
        .crossJoin(broadcast(hl))
        .select(col("n"), col("i_scaled"), col("h_bucket"), col("h_label"),
          expr("2 * i_scaled * 1000000 div (h_bucket + h_label)")
            .as("nmi_micro"))
    }),

    // q310 — AVERAGE PRECISION of label retrieval: the
    // order-sensitive eval between q230's recall and q240's NDCG —
    // rank the corpus by cosine to each of 5 query vectors, relevance
    // = shares the query's LABEL, AP = mean of precision@k over the
    // relevant ranks (exact integers: prec@k = cum·10⁶ div k, AP =
    // Σ div n_pos; a query with ZERO relevant docs reports AP 0 — the
    // standard convention, guarded in both engines where DuckDB's //
    // would otherwise error on the 0 denominator). P@10 rides along. The per-query ranking window
    // partitions by qid (5 bounded partitions — an EVAL over a fixed
    // query set, the q230/q240 contract; corpus side scans once).
    "q310_avg_precision" -> ((s, d) => {
      val e = embs(s, d).select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"), col("label"))
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("emb").as("qemb"),
          col("label").as("qlabel"))
      val scored = e.where(col("vec_id") >= 5).crossJoin(broadcast(q))
        .select(col("qid"), col("vec_id"),
          round(round(Similarity.cosine(col("emb"), col("qemb")), 6)
            * 1000000).cast("long").as("cm"),
          (col("label") === col("qlabel")).cast("long").as("rel"))
      val wr = Window.partitionBy("qid").orderBy(col("cm").desc, col("vec_id"))
      val ranked = scored
        .withColumn("rank", row_number().over(wr).cast("long"))
        .withColumn("cum", sum("rel").over(
          wr.rowsBetween(Window.unboundedPreceding, 0)))
      ranked.groupBy("qid")
        .agg(sum("rel").as("n_pos"),
          sum(when(col("rel") === 1,
            expr("cum * 1000000 div rank")).otherwise(0L)).as("ap_num"),
          sum(when(col("rank") <= 10, col("rel")).otherwise(0L)).as("rel10"))
        .select(col("qid"), col("n_pos"),
          expr("case when n_pos > 0 then ap_num div n_pos else 0 end")
            .as("ap_micro"),
          expr("rel10 * 1000000 div 10").as("p10_micro"))
        .orderBy("qid")
    }),

    // q311 — kNN LABEL ACCURACY: the classifier-free embedding-
    // quality benchmark (can neighbors predict the label?) — each
    // vector's top-3 in-bucket neighbors (q176's measured kNN-graph
    // machinery, √N buckets, bounded top_k) vote; majority with ties
    // → smallest label; accuracy per true label in integer micros.
    // Vectors whose bucket holds no neighbor are excluded (stated
    // rule, replayed in the oracle). Adds two bounded partial aggs to
    // the measured q176 plan.
    "q311_knn_label_acc" -> ((s, d) => {
      val e = embs(s, d).select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"), col("label"))
      val kc = math.ceil(math.sqrt(e.count().toDouble)).toLong
      val assigned = AnnIvf.assignBuckets(
        e.select("vec_id", "emb"), e.where(col("vec_id") < kc))
      val l = assigned.toDF("id_a", "emb_a", "bucket")
      val r = assigned.toDF("id_b", "emb_b", "bucket")
      val knn = l.join(r, Seq("bucket"))
        .where(col("id_a") =!= col("id_b"))
        .withColumn("sm",
          round(Similarity.cosine(col("emb_a"), col("emb_b")) * 1000000)
            .cast("long"))
        .groupBy("id_a")
        .agg(expr("top_k(sm, id_b, 3)").as("tk"))
        .select(col("id_a"), explode(expr("transform(tk, x -> x.id)"))
          .as("nn_id"))
      val pred = knn
        .join(e.select(col("vec_id").as("nn_id"),
          col("label").as("nn_label")), "nn_id")
        .groupBy("id_a", "nn_label").agg(count(lit(1)).as("c"))
        .groupBy("id_a")
        .agg(max_by(col("nn_label"), struct(col("c"),
          (-col("nn_label")).as("nl"))).as("pred"))
      pred.join(e.select(col("vec_id").as("id_a"), col("label")), "id_a")
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") === col("label"), 1L).otherwise(0L))
            .as("n_correct"))
        .select(col("label"), col("n"), col("n_correct"),
          expr("n_correct * 1000000 div n").as("acc_micro"))
        .orderBy("label")
    }),

    // q307 — WEIGHTED RESERVOIR SAMPLE (Efraimidis–Spirakis A-Res):
    // THE distributed weighted-sampling-without-replacement primitive
    // — per source, keep the k=8 docs with the largest u^(1/w)
    // (w = n_chars), equivalently the largest ln(u)/w, so long docs
    // are proportionally likelier without ever sorting the corpus.
    // Deterministic u from md5 (seedless, engine-exact); ln(u) as a
    // micro-log DIFFERENCE: runtime ⌊ln(num)·10⁶⌋ over num ≤ 10⁶
    // (inside MicroLogBoundarySpec's audited ≥16-ulp domain) minus
    // the PINNED literal ⌊ln(10⁶+1)·10⁶⌋; the division by w is exact
    // integer (both engines truncate toward zero). Plan: scan-side
    // keys, ONE bounded top_k partial agg per source — the exchange
    // carries ≤8 rows per source, never a per-source sort.
    "q307_weighted_reservoir" -> ((s, d) => {
      docs(s, d).select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("num", expr(
          "cast(conv(substring(md5(concat('ares:', " +
            "cast(doc_id as string))), 1, 8), 16, 10) as bigint) " +
            "% 1000000 + 1"))
        .withColumn("key", expr(
          "(cast(floor(ln(cast(num as double)) * 1000000) as bigint) " +
            s"- ${AresLnDen}L) div n_chars"))
        .groupBy("source")
        .agg(expr("top_k(key, doc_id, 8)").as("tk"))
        .select(col("source"), posexplode(col("tk")).as(Seq("pos", "x")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
          col("x.id").as("doc_id"), col("x.score").as("key_micro"))
        .orderBy("source", "rank")
    }),

    // q342 — BLEU OVERLAP EVAL: the precision-side complement to
    // q335's ROUGE recall — clipped n-gram PRECISION (N = 1, 2) plus
    // the brevity penalty, the generation-eval metric a distillation
    // pipeline reads next to ROUGE. Scored in EXACT integers as
    // 2·log BLEU micros: score = 2·bp + (ml(clip1) − ml(tot1)) +
    // (ml(clip2') − ml(tot2)) with ml the audited ⌊ln(int)·10⁶⌋
    // idiom (MicroLogBoundarySpec), bp = 0 when c ≥ r else
    // −((r−c)·10⁶ div c) (positive division, sign reattached — both
    // engines truncate identically), and clip2' = greatest(clip2, 1)
    // (smoothing-1: a shared unigram implies clip1 ≥ 1, bigrams may
    // still miss). Docs under 2 tokens are excluded (tot2 ≥ 1 by
    // construction). Plan mirrors q335: the 5-doc reference n-gram
    // table broadcasts, candidates explode once and join on the gram
    // — the corpus never self-pairs; top-3 per reference via the
    // bounded top_k partial agg (score DESC, doc_id ASC), never a
    // per-ref sort.
    "q342_bleu_eval" -> ((s, d) => {
      def grams(df: DataFrame): DataFrame = {
        val toks = df.select(col("doc_id"),
          TextOps.tokens(col("text")).as("toks"))
          .where(size(col("toks")) >= 2)
        toks.select(col("doc_id"), explode(col("toks")).as("g"))
          .where(col("g") =!= "").withColumn("kind", lit(1L))
          .unionByName(toks
            .select(col("doc_id"),
              explode(TextOps.shingles(col("toks"), 2)).as("g"))
            .withColumn("kind", lit(2L)))
          .groupBy("doc_id", "g", "kind").agg(count(lit(1)).as("tf"))
      }
      def ml(x: String) = s"cast(floor(ln($x) * 1000000) as bigint)"
      val refs = grams(docs(s, d).where(col("doc_id") < 5))
        .toDF("ref_id", "g", "kind", "rtf")
      val refLen = refs.where(col("kind") === 1L)
        .groupBy("ref_id").agg(sum("rtf").as("rlen"))
      val cand = grams(docs(s, d).where(col("doc_id") >= 5))
      val candTot = cand.groupBy("doc_id", "kind").agg(sum("tf").as("tot"))
        .groupBy("doc_id")
        .agg(max(when(col("kind") === 1L, col("tot"))).as("tot1"),
          max(when(col("kind") === 2L, col("tot"))).as("tot2"))
      val clips = cand.join(broadcast(refs), Seq("g", "kind"))
        .groupBy("ref_id", "doc_id")
        .agg(sum(when(col("kind") === 1L, least(col("tf"), col("rtf")))
            .otherwise(0L)).as("clip1"),
          sum(when(col("kind") === 2L, least(col("tf"), col("rtf")))
            .otherwise(0L)).as("clip2"))
      clips
        .join(candTot, "doc_id")
        .join(broadcast(refLen), "ref_id")
        .withColumn("clip2s", greatest(col("clip2"), lit(1L)))
        .withColumn("bp", when(col("tot1") >= col("rlen"), 0L)
          .otherwise(-expr("(rlen - tot1) * 1000000 div tot1")))
        .withColumn("s2x", col("bp") * 2L
          + (expr(ml("clip1")) - expr(ml("tot1")))
          + (expr(ml("clip2s")) - expr(ml("tot2"))))
        .groupBy("ref_id")
        .agg(expr("top_k(s2x, doc_id, 3)").as("tk"))
        .select(col("ref_id"), posexplode(col("tk")).as(Seq("pos", "x")))
        .select(col("ref_id"), (col("pos") + 1).cast("long").as("rank"),
          col("x.id").as("doc_id"), col("x.score").as("bleu2x_micro"))
        .orderBy("ref_id", "rank")
    }),

    // q343 — GRID-BLOCKED DBSCAN: density-based clustering over the
    // embedding table's first two coordinates (mill-scale integers) —
    // the noise-aware clustering the near-dup family lacks (CC needs
    // an edge rule, k-means needs k; DBSCAN discovers both cluster
    // count and outliers). eps = 15, minPts = 4 neighbors (self
    // excluded). THE SCALE DESIGN: cell size = eps, so every ≤ eps
    // pair lands in adjacent cells — the left side explodes to its
    // 9-cell neighborhood and the pairing is a pure EQUI-join on the
    // cell key (shuffle-partitionable, never a coordinate range
    // join); candidates are distance²-verified in integers.
    // Coordinates are shifted +10⁵ before the cell division so
    // truncation equals floor (|coord| ≤ 10³ by the embedding
    // contract). Core = deg ≥ minPts; clusters = min-label connected
    // components over core-core edges (Cluster.connectedComponents,
    // the audited q38 fixpoint); border points adopt the min
    // neighboring core label; noise reports cluster −1.
    "q343_dbscan_grid" -> ((s, d) => {
      val p = embs(s, d).select(col("vec_id"),
        expr("cast(round(cast(element_at(embedding, 1) as double) * 1000) " +
          "as bigint)").as("x"),
        expr("cast(round(cast(element_at(embedding, 2) as double) * 1000) " +
          "as bigint)").as("y"))
      Dbscan.cluster(p, "vec_id", "x", "y", eps = 15L, minPts = 4)
        .orderBy("vec_id")
    }),

    // q353 — RM3 PSEUDO-RELEVANCE FEEDBACK: the query-expansion tier
    // above q59's fixed-query BM25 — retrieve top-10 feedback docs,
    // mine their 8 strongest expansion terms (Σ tf over the feedback
    // set, original terms excluded, (weight desc, term) determinism),
    // rescore the corpus with the weighted union query (originals at
    // 1.0, expansions at 0.5·w/max_w) using the exact q59 BM25 form.
    // Fully distributed — the expansion set is a broadcast DataFrame,
    // never a driver collect. Plan: the token explode feeds (a) the
    // 10-doc feedback tf (semi-join, tiny) and (b) the final scoring
    // leg, which joins the BROADCAST ≤ 12-term query table BEFORE any
    // tf groupBy — only matching postings ever shuffle. Scores use
    // q59's bit-determinism contract (per-doc term contributions
    // folded in term order, round 6).
    "q353_rm3_expansion" -> ((s, d) => {
      import s.implicits._
      val origTerms = Seq("join", "hash", "vector", "stream")
      val toks = docs(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .withColumn("dl", size(col("toks")).cast("double"))
        .where(col("dl") > 0)
      val stats = toks.agg(count(lit(1)).cast("double").as("nd"),
        avg("dl").as("avgdl"))
      val tokExpl = toks
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .where(col("term") =!= "")
      val fb = Relevance.bm25TopK(docs(s, d), "doc_id", "text",
        origTerms, k = 10).select("doc_id")
      val exp = tokExpl.join(broadcast(fb), "doc_id")
        .where(!col("term").isin(origTerms.map(lit): _*))
        .groupBy("term").agg(count(lit(1)).as("w"))
        .orderBy(desc("w"), col("term")).limit(8)
      val maxw = exp.agg(max("w").as("maxw"))
      val qterms = exp.crossJoin(broadcast(maxw))
        .select(col("term"),
          (lit(0.5d) * col("w").cast("double") / col("maxw").cast("double"))
            .as("qw"))
        .unionByName(origTerms.toDF("term").withColumn("qw", lit(1.0d)))
      val tfQ = tokExpl.join(broadcast(qterms), "term")
        .groupBy("doc_id", "dl", "term", "qw")
        .agg(count(lit(1)).cast("double").as("tfc"))
      val dfByTerm = tfQ.groupBy("term")
        .agg(count(lit(1)).cast("double").as("dfc"))
      tfQ.join(broadcast(dfByTerm), "term")
        .crossJoin(broadcast(stats))
        .withColumn("sterm", col("qw") *
          log(lit(1d) + (col("nd") - col("dfc") + 0.5d)
            / (col("dfc") + 0.5d)) *
          (col("tfc") * lit(Relevance.K1 + 1d)) /
          (col("tfc") + lit(Relevance.K1) * (lit(1d - Relevance.B)
            + lit(Relevance.B) * col("dl") / col("avgdl"))))
        .groupBy("doc_id")
        .agg(aggregate(
          array_sort(collect_list(struct(col("term"), col("sterm")))),
          lit(0d), (acc, x) => acc + x.getField("sterm")).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("doc_id")
    }),

    // q355 — CAPPED 2-HOP REACH + HARMONIC-2 CENTRALITY: how much of
    // the repeat-co-purchase graph each part reaches in ≤ 2 steps —
    // the node-level spread signal beside q172's single-source BFS
    // and q274's pairwise wedge scores. SEMANTICS (the q274
    // deployment cut, part of the contract): second steps route only
    // through centers of deg ≤ 64, so enumeration is bounded at
    // 64·|E| (the uncapped wedge closure is the measured α 1.5–2.6
    // failure mode) and the oracle applies the identical cut. n2
    // counts DISTINCT 2-step endpoints that are not the node itself
    // and not direct neighbors; h2 = n1 + n2/2 in exact micros. Plan:
    // degree partial agg, hub filter BEFORE the hop join (the blow-up
    // is structurally bounded, not optimizer-dependent), per-source
    // distinct bounded by 64·deg.
    "q355_reach_2hop" -> ((s, d) => {
      val e0 = repeatCoEdges(s, d)
      val e = if (s.sparkContext.getCheckpointDir.isDefined)
        e0.checkpoint(eager = true) else e0.localCheckpoint(true)
      val sym = e.select(col("lo").as("src"), col("hi").as("dst"))
        .unionByName(e.select(col("hi").as("src"), col("lo").as("dst")))
      val deg = sym.groupBy("src").agg(count(lit(1)).as("n1"))
      val nonHub = deg.where(col("n1") <= 64L).select(col("src").as("m"))
      val adjCapped = sym.toDF("m", "w").join(nonHub, "m")
      val hop2 = sym.toDF("src", "m").join(adjCapped, "m")
        .where(col("w") =!= col("src"))
        .select("src", "w").distinct()
        .join(sym.toDF("src", "w"), Seq("src", "w"), "left_anti")
        .groupBy("src").agg(count(lit(1)).as("n2"))
      deg.join(hop2, Seq("src"), "left")
        .select(col("src").as("item"), col("n1"),
          coalesce(col("n2"), lit(0L)).as("n2"))
        .withColumn("h2_micro",
          col("n1") * 1000000L + col("n2") * 500000L)
        .orderBy("item")
    }),

    // q361 — DEGREE ASSORTATIVITY (Newman's r): do hub parts
    // co-purchase with other hubs (r > 0) or with the long tail
    // (r < 0)? The one-number mixing summary next to q275's local
    // clustering and q274's link prediction. Computed over DIRECTED
    // EDGE STUBS (each undirected edge contributes both
    // orientations — the standard convention): with symmetric
    // marginals Σx = Σy and Σx² = Σy², Pearson's r collapses to the
    // EXACT RATIONAL (M·Σxy − Σx·Σy)/(M·Σx² − (Σx)²) — no sqrt ever
    // enters, so the gate is pure integers end-to-end. Every product
    // is decimal(38,0) (HUGEINT in the oracle — M·Σxy is stubs ×
    // stubs·deg² and wraps 64 bits long before petabyte graphs); a
    // zero denominator (all degrees equal) reports the documented 0
    // sentinel in both engines. Plan: degree table = one partial agg
    // over 2|E| stubs, two node-keyed hash joins attach endpoint
    // degrees (shuffle on node id, AQE-skewable), ONE scalar fold —
    // never a pair blow-up.
    "q361_degree_assortativity" -> ((s, d) => {
      val e = repeatCoEdges(s, d)
      val sym = e.select(col("lo").as("src"), col("hi").as("dst"))
        .unionByName(e.select(col("hi").as("src"), col("lo").as("dst")))
      val deg = sym.groupBy("src").agg(count(lit(1)).as("dgr"))
      sym
        .join(deg.toDF("src", "dx"), "src")
        .join(deg.toDF("dst", "dy"), "dst")
        .agg(count(lit(1)).as("m"),
          sum(expr("cast(dx as decimal(38,0))")).as("sx"),
          sum(expr("cast(dx as decimal(38,0)) * dx")).as("sxx"),
          sum(expr("cast(dx as decimal(38,0)) * dy")).as("sxy"))
        .select(col("m").as("m_stubs"),
          expr("cast(sx as bigint)").as("sum_deg"),
          expr("cast(cast(m as decimal(38,0)) * sxy - sx * sx as bigint)")
            .as("num"),
          expr("cast(cast(m as decimal(38,0)) * sxx - sx * sx as bigint)")
            .as("den"),
          expr("cast(case when cast(m as decimal(38,0)) * sxx - sx * sx " +
            "> 0 then (cast(m as decimal(38,0)) * sxy - sx * sx) " +
            "* 1000000 div (cast(m as decimal(38,0)) * sxx - sx * sx) " +
            "else 0 end as bigint)").as("assort_micro"))
    }),

    // q374 — PCA TOP COMPONENT (integer power iteration): the
    // principal direction of the embedding cloud — the
    // dimensionality-reduction / drift-explanation primitive beside
    // q146's outlier distance and q283's MRL truncation (WHICH
    // direction carries the variance, not just how much). EXACT
    // integers end-to-end: mill-int vectors, the CENTERED scatter
    // matrix in its common-denominator form C = N·Σxxᵀ − ssᵀ (every
    // product decimal(38,0)/HUGEINT — N·M is rows²·mill² at scale),
    // and 8 unrolled power-iteration rounds w ← ⌊C·w·10⁶ / max|C·w|⌋
    // from the all-ones start — the max-abs renormalization keeps
    // every weight in [−10⁶, 10⁶] so the iteration is pure bounded
    // integers, and the final sign is pinned (first nonzero
    // coordinate positive). The oracle replays every round as
    // MATERIALIZED CTEs. Plan: ONE scan accumulates the upper
    // triangle (dim²/2 = 2080 cells per row, the classic covariance
    // partial agg — bounded by dim, not rows); each round is a join
    // against the 64-row weight vector with lineage truncated (the
    // q358 mat idiom).
    "q374_pca_power" -> ((s, d) => {
      def mat(df: DataFrame): DataFrame =
        if (s.sparkContext.getCheckpointDir.isDefined)
          df.checkpoint(eager = true) else df.localCheckpoint(true)
      val p = embs(s, d).select(
        expr("transform(embedding, x -> " +
          "cast(round(cast(x as double) * 1000) as bigint))").as("v"))
      val cells = p.select(explode(expr(
          "flatten(transform(sequence(1, 64), i -> " +
            "transform(sequence(i, 64), j -> " +
            "struct(i, j, v[i-1] * v[j-1] as pr))))")).as("c"))
        .select(col("c.i"), col("c.j"), col("c.pr"))
        .groupBy("i", "j")
        .agg(sum(expr("cast(pr as decimal(38,0))")).as("m"))
      val sums = p.select(posexplode(col("v")).as(Seq("p0", "x")))
        .select((col("p0") + 1).as("i"), col("x"))
        .groupBy("i").agg(sum("x").as("si"))
      val n = p.agg(count(lit(1)).as("n"))
      val cFull = mat(cells
        .unionByName(cells.where(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("m")))
        .join(sums.toDF("i", "si"), "i")
        .join(sums.toDF("j", "sj"), "j")
        .crossJoin(broadcast(n))
        .select(col("i"), col("j"),
          expr("cast(n as decimal(38,0)) * m - " +
            "cast(si as decimal(38,0)) * sj").as("cij")))
      var w = mat(s.range(1, 65).select(col("id").as("j"),
        lit(1000000L).as("wj")))
      for (_ <- 1 to 8) {
        val cw = cFull.join(broadcast(w), "j")
          .groupBy(col("i")).agg(sum(expr("cij * wj")).as("cw"))
        val mx = cw.agg(max(abs(col("cw"))).as("mx"))
        w = mat(cw.crossJoin(broadcast(mx))
          .select(col("i").as("j"),
            expr("cast(cw * 1000000 div mx as bigint)").as("wj")))
      }
      val sgn = w.where(col("wj") =!= 0).orderBy("j").limit(1)
        .select(expr("case when wj >= 0 then 1L else -1L end").as("sg"))
      w.crossJoin(broadcast(sgn))
        .select(col("j").cast("long").as("dim"),
          (col("wj") * col("sg")).as("w_micro"))
        .orderBy("dim")
    }),

    // q377 — RANK-BIASED OVERLAP (Webber et al.): how much does the
    // production ranker (q59's BM25 — idf + length normalization)
    // reorder the cheap first-stage ranker (raw query-term frequency)?
    // The top-weighted ranking-agreement measure the eval family
    // lacked — q240's NDCG/MAP score ONE ranking against relevance,
    // q226's RRF fuses; RBO compares two rankings to each other with
    // geometric top-weighting, the number behind "can we serve the
    // cheap ranker for the first cut". RBO@10 = Σ_d w_d·|A_d ∩ B_d|/d
    // with w_d = (1−p)p^(d−1) at p = 0.9 PINNED as micro literals in
    // both engines (the q317 ladder convention); per-depth overlap is
    // exact integers over the two bounded top-10 tables; the total
    // row (depth −1) is the documented sum of floored contributions.
    // Plan: both rankings are corpus-scan partial aggs + a bounded
    // top-k; everything after runs on ≤ 10-row tables.
    "q377_rbo_rankers" -> ((s, d) => {
      val terms = Seq("join", "hash", "vector", "stream")
      val W = Window.orderBy(col("__s").desc, col("doc_id"))
      val a = Relevance.bm25TopK(docs(s, d), "doc_id", "text", terms, 10)
        .withColumn("__s", col("score"))
        .withColumn("ra", row_number().over(W).cast("long"))
        .select("doc_id", "ra")
      val b = docs(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
        .where(col("t").isin(terms.map(lit): _*))
        .groupBy("doc_id").agg(count(lit(1)).as("__s"))
        .orderBy(col("__s").desc, col("doc_id")).limit(10)
        .withColumn("rb", row_number().over(W).cast("long"))
        .select("doc_id", "rb")
      val joined = a.join(b, "doc_id")
      val wArr = RboWeights.map(w => s"${w}L").mkString("array(", ", ", ")")
      val perDepth = s.range(1, 11).select(col("id").as("depth"))
        .join(joined.crossJoin(s.range(1, 11).select(col("id").as("depth")))
          .where(col("ra") <= col("depth") && col("rb") <= col("depth"))
          .groupBy("depth").agg(count(lit(1)).as("cum_overlap")),
          Seq("depth"), "left")
        .na.fill(0L, Seq("cum_overlap"))
        .select(col("depth"), col("cum_overlap"),
          expr(s"element_at($wArr, cast(depth as int)) * cum_overlap " +
            "div depth").as("contrib_micro"))
      perDepth.unionByName(
        perDepth.agg(max("cum_overlap").as("cum_overlap"),
            sum("contrib_micro").as("contrib_micro"))
          .select(lit(-1L).as("depth"), col("cum_overlap"),
            col("contrib_micro")))
        .orderBy("depth")
    }),

    // q376 — BIPARTITENESS AUDIT via the DOUBLE COVER: is each
    // co-purchase component two-colorable (complementary-product
    // structure) or does it carry an odd cycle (community structure —
    // the q136/q275 triangle signal seen the other way)? The classic
    // reduction avoids any odd-cycle search: a component is bipartite
    // IFF its bipartite double cover (u→u⁰/u¹, every edge wired
    // across sides) splits into TWO components — i.e. u⁰ and u¹ get
    // different labels for every node — so the whole test is just the
    // audited min-label CC fixpoint run TWICE (original + 2·|V|-node
    // cover), both diameter-bounded partial-agg propagations; no new
    // machinery, no pairing. The oracle reruns both CCs as recursive
    // CTEs (the q38 chain) and the same cover-label comparison.
    "q376_bipartite_check" -> ((s, d) => {
      val e0 = repeatCoEdges(s, d)
      val e = if (s.sparkContext.getCheckpointDir.isDefined)
        e0.checkpoint(eager = true) else e0.localCheckpoint(true)
      val nodes = e.select(col("lo").as("vid"))
        .unionByName(e.select(col("hi").as("vid"))).distinct()
      val base = Cluster.connectedComponents(nodes,
        e.toDF("a", "b"), "vid", "a", "b")
      val cover = Cluster.connectedComponents(
        nodes.select((col("vid") * 2).as("vid"))
          .unionByName(nodes.select((col("vid") * 2 + 1).as("vid"))),
        e.select((col("lo") * 2).as("a"), (col("hi") * 2 + 1).as("b"))
          .unionByName(
            e.select((col("lo") * 2 + 1).as("a"), (col("hi") * 2).as("b"))),
        "vid", "a", "b")
      val l0 = cover.where(pmod(col("vid"), lit(2L)) === 0)
        .select(expr("vid div 2").as("vid"), col("cluster").as("l0"))
      val l1 = cover.where(pmod(col("vid"), lit(2L)) === 1)
        .select(expr("vid div 2").as("vid"), col("cluster").as("l1"))
      val edgeComp = e.join(base.toDF("lo", "comp"), "lo")
        .groupBy("comp").agg(count(lit(1)).as("n_edges"))
      base.join(l0, "vid").join(l1, "vid")
        .groupBy(col("cluster").as("component"))
        .agg(count(lit(1)).as("n_nodes"),
          min((col("l0") =!= col("l1")).cast("long")).as("bip"))
        .join(edgeComp.toDF("component", "n_edges"), Seq("component"))
        .select(col("component"), col("n_nodes"), col("n_edges"),
          (col("bip") === 1L).as("bipartite"))
        .orderBy("component")
    }),

    // q362 — MMD EMBEDDING SHIFT (linear kernel): the
    // distribution-shift test for EMBEDDING columns, next to the
    // scalar drift family (q223 PSI, q238/q328 KS, q231 streamed) —
    // "did the corpus's representation distribution move between two
    // sources?" With the linear kernel, MMD² collapses CLOSED-FORM to
    // ‖μ_A − μ_B‖² — two mean vectors, NO pair enumeration (the
    // kernel trick that makes the metric O(N·dim) where the generic
    // estimator is O(N²)·dim — the only form that survives 100 TB).
    // EXACT integers: mill-int vectors (the q360 convention), per-dim
    // difference numerator SxA·Nb − SxB·Na over the common
    // denominator Na·Nb, squared contribution in value²-micros
    // (mill² ≡ value²·10⁻⁶, so the integer IS the micro), every
    // product decimal(38,0)/HUGEINT. The scalar MMD² row (dim −1) is
    // the SUM OF FLOORED per-dim contributions — the documented
    // convention, replayed identically by the oracle. Plan: one
    // posexplode scan → ONE (dim)-keyed partial agg (64 groups), the
    // two counts ride a broadcast 1-row fold; nothing ever pairs.
    "q362_mmd_shift" -> ((s, d) => {
      val p = embs(s, d).select(col("vec_id"),
        pmod(col("vec_id"), lit(2L)).as("side"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("side"), (col("pos") + 1).as("dim"),
          round(col("x").cast("double") * 1000).cast("long").as("mv"))
      val n = embs(s, d).agg(
        sum(when(pmod(col("vec_id"), lit(2L)) === 0, 1L).otherwise(0L))
          .as("na"),
        sum(when(pmod(col("vec_id"), lit(2L)) === 1, 1L).otherwise(0L))
          .as("nb"))
      val perDim = p.groupBy("dim")
        .agg(sum(when(col("side") === 0, col("mv")).otherwise(0L)).as("sa"),
          sum(when(col("side") === 1, col("mv")).otherwise(0L)).as("sb"))
        .crossJoin(broadcast(n))
        .select(col("dim").cast("long").as("dim"), col("na"), col("nb"),
          expr("cast(cast(sa as decimal(38,0)) * nb - " +
            "cast(sb as decimal(38,0)) * na as bigint)").as("diff_num"),
          expr("cast(cast(cast(sa as decimal(38,0)) * nb - " +
            "cast(sb as decimal(38,0)) * na as decimal(38,0)) * 1000 " +
            "div (cast(na as decimal(38,0)) * nb) as bigint)")
            .as("mean_diff_micro"),
          expr("cast(cast(cast(sa as decimal(38,0)) * nb - " +
            "cast(sb as decimal(38,0)) * na as decimal(38,0)) * " +
            "cast(cast(sa as decimal(38,0)) * nb - " +
            "cast(sb as decimal(38,0)) * na as decimal(38,0)) " +
            "div (cast(na as decimal(38,0)) * nb * na * nb) as bigint)")
            .as("contrib_micro"))
      perDim.unionByName(
        perDim.groupBy(col("na"), col("nb"))
          .agg(sum("contrib_micro").as("contrib_micro"))
          .select(lit(-1L).as("dim"), col("na"), col("nb"),
            lit(0L).as("diff_num"), lit(0L).as("mean_diff_micro"),
            col("contrib_micro")))
        .orderBy("dim")
    }),

    // q356 — PASS@K ESTIMATOR: the unbiased code-eval metric
    // (Chen et al., HumanEval) pass@k = 1 − C(n−c, k)/C(n, k) over
    // n = 10 md5-deterministic attempts per task — the number an eval
    // pipeline reports per problem before aggregating a model's
    // solve rate. EXACT integers: the binomial ratio collapses to a
    // falling-factorial product Π_{i<k}(n−c−i) / Π_{i<k}(n−i) (n
    // pinned, so the denominator is a literal), one micro division,
    // c > n−k short-circuits to 10⁶ before any factor can go
    // negative. Plan: scan-side attempt explode (10 rows/task), ONE
    // task-keyed partial agg, pass@{1,5,10} computed on the bounded
    // per-task table.
    "q356_pass_at_k" -> ((s, d) => {
      def passK(k: Int): String = {
        val num = (0 until k).map(i => s"(10 - c - $i)").mkString(" * ")
        val den = (0 until k).map(i => 10L - i).product
        s"cast(case when c > ${10 - k} then 1000000 " +
          s"else 1000000 - ($num * 1000000) div $den end as bigint)"
      }
      docs(s, d).where(col("doc_id") < 50)
        .select(col("doc_id").as("task_id"),
          explode(sequence(lit(0), lit(9))).as("j"))
        .withColumn("ok", (conv(substring(md5(concat(lit("pk:"),
          col("task_id").cast("string"), lit(":"),
          col("j").cast("string"))), 1, 8), 16, 10).cast("long") % 4 === 0)
          .cast("long"))
        .groupBy("task_id").agg(sum("ok").as("c"))
        .select(col("task_id"), col("c"),
          expr(passK(1)).as("pass1_micro"),
          expr(passK(5)).as("pass5_micro"),
          expr(passK(10)).as("pass10_micro"))
        .orderBy("task_id")
    }),

    // q360 — K-CENTER GREEDY SEEDING (Gonzalez farthest-point, the
    // 2-approximation): the coreset / diverse-subset primitive a
    // data-pruning or active-learning pass runs over the embedding
    // table — start at the min vec_id, repeatedly add the point
    // farthest from the chosen set, report each pick and the exact
    // coverage radius² it certifies. EXACT integers end to end:
    // vectors as mill-scaled 64-d int arrays, d² = Σ(aᵢ−bᵢ)² via
    // zip_with (≤ 6.4·10⁷ per pair — no float ever), argmax under
    // (d² desc, vec_id) fully deterministic. Plan per round: ONE
    // broadcast of the single new seed row, a scan-side d² update of
    // the min-distance state (the classic O(kN) form — never a k×N
    // cross join), a 1-row TakeOrdered argmax; state lineage
    // truncated per round. The oracle replays all 8 rounds as
    // materialized CTEs.
    "q360_kcenter_seeds" -> ((s, d) => {
      def mat(df: DataFrame): DataFrame =
        if (s.sparkContext.getCheckpointDir.isDefined)
          df.checkpoint(eager = true) else df.localCheckpoint(true)
      val pts = mat(embs(s, d).select(col("vec_id"),
        expr("transform(embedding, x -> " +
          "cast(round(cast(x as double) * 1000) as bigint))").as("v")))
      val d2 = "aggregate(zip_with(v, sv, (x, y) -> (x - y) * (x - y)), " +
        "0L, (acc, e) -> acc + e)"
      val seed0 = pts.orderBy("vec_id").limit(1)
        .select(col("vec_id").as("sid"), col("v").as("sv"))
      var state = mat(pts.crossJoin(broadcast(seed0))
        .select(col("vec_id"), col("v"), expr(d2).as("d2min")))
      val rounds = (1 to 8).map { r =>
        val pick = state.orderBy(desc("d2min"), col("vec_id")).limit(1)
          .select(col("vec_id").as("sid"), col("v").as("sv"),
            col("d2min").as("radius2"))
        state = mat(state.crossJoin(broadcast(pick.drop("radius2")))
          .select(col("vec_id"), col("v"),
            least(col("d2min"), expr(d2)).as("d2min")))
        pick.select(lit(r.toLong).as("round"), col("sid").as("seed_id"),
          col("radius2"))
      }
      rounds.reduce(_ unionByName _).orderBy("round")
    })
  )

  // shared DuckDB CTE chain: normalize -> tokenize -> 3-gram shingles ->
  // 8 md5 minhashes -> 4 banded keys (mirrors NearDup exactly)
  private[pipeline] def duckShingleCtes(source: String): String =
    s"n AS (SELECT doc_id, $duckNorm AS ntext FROM $source), " +
      "tk AS (SELECT doc_id, string_split(ntext, ' ') AS toks FROM n), " +
      "sh AS (SELECT doc_id, CASE WHEN len(toks) < 3 " +
      "THEN [array_to_string(toks, ' ')] " +
      "ELSE list_transform(range(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh FROM tk)"

  // shared recursive connected-components chain over the banded
  // candidates: Jaccard-verified edges (threshold mirrors q38/q88's
  // Spark side), symmetric closure, min-label fixpoint — used by both
  // the clustering (q38) and pruning (q88) oracles so the threshold
  // and label construction can never silently diverge
  private val duckClusterCtes: String =
    "ver AS (SELECT doc_a, doc_b FROM (SELECT c.doc_a, c.doc_b, " +
      "round(len(list_intersect(sa.sh, sb.sh)) / " +
      "CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 6) AS jacc " +
      "FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a " +
      "JOIN sh sb ON sb.doc_id = c.doc_b) WHERE jacc >= 0.8), " +
      "edges AS (SELECT doc_a AS src, doc_b AS dst FROM ver " +
      "UNION SELECT doc_b, doc_a FROM ver), " +
      "cc(id, lbl) AS (SELECT doc_id, doc_id FROM all_docs " +
      "UNION SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.id)"

  // sig + bands only (no candidate pairing) — shared with the
  // incremental-dedup oracle (q143), whose candidate join is
  // index-side × batch-side instead of the all-docs a < b rule
  private[pipeline] val duckSigBandCtes: String =
    "sig AS (SELECT doc_id, " +
      (0 until NearDup.NumHashes).map(i =>
        s"list_min(list_transform(sh, s -> md5('$i:' || s))) AS m$i")
        .mkString(", ") +
      " FROM sh), " +
      "bands AS (" +
      (0 until NearDup.NumBands).map(b =>
        s"SELECT doc_id, $b AS band, md5(m${2 * b} || '|' || m${2 * b + 1}) AS bkey FROM sig")
        .mkString(" UNION ALL ") + ")"

  private val duckSigBands: String =
    duckSigBandCtes + ", " +
      "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
      "FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey " +
      "AND a.doc_id < b.doc_id)"

  val oracleSql: Map[String, String] = Map(
    // q38's full cluster replay + the same md5 fold hashes per doc
    // (naive scatter count) and per cluster (the safe assignment)
    "q229_leakage_safe_split" ->
      (s"WITH RECURSIVE all_docs AS ($dupCte), ${duckShingleCtes("all_docs")}, " +
        s"$duckSigBands, $duckClusterCtes, " +
        "lab AS (SELECT id AS doc_id, min(lbl) AS cluster FROM cc " +
        "GROUP BY id) " +
        "SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT ('0x' || substr(md5('cvf:' || " +
        "CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10) AS BIGINT) " +
        "AS n_folds_naive, " +
        "('0x' || substr(md5('cvf:' || CAST(cluster AS VARCHAR)), 1, 8))" +
        "::BIGINT % 10 AS fold_safe " +
        "FROM lab GROUP BY cluster ORDER BY cluster"),
    // exact truth via the shared-shingle join + list-formula verify,
    // LSH legs via the q17/q18 chains — all three counts replayed
    "q234_lsh_recall" -> {
      // the same doc_id % 4 sample with its dup plants, both legs
      val sampCte = "SELECT doc_id, text FROM documents " +
        "WHERE doc_id % 4 = 0 UNION ALL " +
        "SELECT doc_id + 100000, text FROM documents WHERE doc_id % 4 = 0"
      s"WITH all_docs AS ($sampCte), d AS ($sampCte), " +
        s"${duckShingleCtes("all_docs")}, $duckSigBands, " +
        s"$duckShingleSetCtes, " +
        "jall AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM e a JOIN e b ON a.t = b.t AND a.doc_id < b.doc_id), " +
        "exv AS (SELECT doc_a, doc_b FROM (SELECT j.doc_a, j.doc_b, " +
        "round(len(list_intersect(sa.sh, sb.sh)) / " +
        "CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 6) AS jacc " +
        "FROM jall j JOIN sh sa ON sa.doc_id = j.doc_a " +
        "JOIN sh sb ON sb.doc_id = j.doc_b) WHERE jacc >= 0.8), " +
        "verr AS (SELECT doc_a, doc_b FROM (SELECT c.doc_a, c.doc_b, " +
        "round(len(list_intersect(sa.sh, sb.sh)) / " +
        "CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 6) AS jacc " +
        "FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a " +
        "JOIN sh sb ON sb.doc_id = c.doc_b) WHERE jacc >= 0.8) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM exv) AS n_exact, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM verr) AS n_verified, " +
        "(SELECT count(*) FROM verr) * 1000000 // " +
        "(SELECT count(*) FROM exv) AS recall_micro, " +
        "(SELECT count(*) FROM verr) * 1000000 // " +
        "(SELECT count(*) FROM cand) AS precision_micro"
    },
    // both rankings replayed (q16 + q22 oracle chains), intersected
    // q126's md5 split, same train-vocab anti-probe, exact counts
    "q299_oov_rate" ->
      (s"WITH b AS (SELECT doc_id, source, text, " +
        "('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), " +
        "1, 8))::BIGINT % 100 AS b FROM documents), " +
        s"f AS (SELECT source, b < 80 AS is_train, " +
        s"unnest(string_split($duckNorm, ' ')) AS t FROM b " +
        "WHERE b < 80 OR b >= 90), " +
        "v AS (SELECT DISTINCT t FROM f WHERE is_train), " +
        "e AS (SELECT source, t FROM f WHERE NOT is_train), " +
        "o AS (SELECT source, COUNT(*) AS oov_tokens FROM e " +
        "WHERE t NOT IN (SELECT t FROM v) GROUP BY 1), " +
        "a AS (SELECT source, COUNT(*) AS eval_tokens FROM e " +
        "GROUP BY 1) " +
        "SELECT a.source, CAST(eval_tokens AS BIGINT) AS eval_tokens, " +
        "CAST(COALESCE(oov_tokens, 0) AS BIGINT) AS oov_tokens, " +
        "CAST(COALESCE(oov_tokens, 0) * 1000000 // eval_tokens " +
        "AS BIGINT) AS oov_micro FROM a LEFT JOIN o " +
        "ON a.source = o.source ORDER BY a.source"),

    // same zero-inclusive closed form over present-only counts,
    // HUGEINT products, same ≥50 floor and top-20 order
    "q297_burstiness" ->
      (s"WITH nd AS (SELECT COUNT(*) AS nn FROM documents), " +
        s"tc AS (SELECT doc_id, t, COUNT(*) AS c FROM " +
        s"(SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS t " +
        "FROM documents) GROUP BY 1, 2), " +
        "ag AS (SELECT t, COUNT(*) AS n_docs, " +
        "CAST(SUM(c) AS BIGINT) AS sc, " +
        "SUM(CAST(c AS HUGEINT) * c) AS sc2 FROM tc GROUP BY 1) " +
        "SELECT t AS token, CAST(n_docs AS BIGINT) AS n_docs, " +
        "sc AS corpus_count, " +
        "CAST((nn * sc2 - CAST(sc AS HUGEINT) * sc) * 1000000 " +
        "// (CAST(nn AS HUGEINT) * sc) AS BIGINT) AS burstiness_micro " +
        "FROM ag CROSS JOIN nd WHERE sc >= 50 " +
        "ORDER BY burstiness_micro DESC, token LIMIT 20"),

    // same shared-token inner join + exclusive-mass ln 2 closed form,
    // identical micro-log terms, HUGEINT sums
    "q291_jsd_sources" ->
      (s"WITH tk AS (SELECT source, unnest(string_split($duckNorm, ' ')) " +
        "AS t FROM documents), " +
        "tc AS (SELECT source, t, COUNT(*) AS c FROM tk GROUP BY 1, 2), " +
        "tt AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tc " +
        "GROUP BY 1), " +
        "pr AS (SELECT a.source AS src_a, b.source AS src_b, " +
        "a.c AS ca, b.c AS cb, ta.n AS na, tb.n AS nb FROM tc a " +
        "JOIN tc b ON a.t = b.t AND a.source < b.source " +
        "JOIN tt ta ON ta.source = a.source " +
        "JOIN tt tb ON tb.source = b.source), " +
        "ag AS (SELECT src_a, src_b, na, nb, COUNT(*) AS shared_tokens, " +
        "CAST(SUM(ca) AS BIGINT) AS sha, CAST(SUM(cb) AS BIGINT) AS shb, " +
        "SUM(CAST(ca AS HUGEINT) * (" +
        "CAST(FLOOR(ln(CAST(2 * ca * nb AS DOUBLE)) * 1000000) AS BIGINT) " +
        "- CAST(FLOOR(ln(CAST(ca * nb + cb * na AS DOUBLE)) * 1000000) " +
        "AS BIGINT))) AS ja, " +
        "SUM(CAST(cb AS HUGEINT) * (" +
        "CAST(FLOOR(ln(CAST(2 * cb * na AS DOUBLE)) * 1000000) AS BIGINT) " +
        "- CAST(FLOOR(ln(CAST(ca * nb + cb * na AS DOUBLE)) * 1000000) " +
        "AS BIGINT))) AS jb " +
        "FROM pr GROUP BY 1, 2, 3, 4) " +
        "SELECT src_a, src_b, shared_tokens, " +
        "CAST((ja + CAST(na - sha AS HUGEINT) * 693147) " +
        "// (2 * CAST(na AS HUGEINT)) + " +
        "(jb + CAST(nb - shb AS HUGEINT) * 693147) " +
        "// (2 * CAST(nb AS HUGEINT)) AS BIGINT) AS jsd_micro " +
        "FROM ag ORDER BY src_a, src_b"),

    // recursive min-label CC (independent of Spark's loop), identical
    // exact-rational fold to one HUGEINT division
    "q285_modularity" ->
      (s"WITH RECURSIVE it AS MATERIALIZED ($itemsCte), " +
        s"ed AS MATERIALIZED ($coEdgeCte), " +
        "sym AS MATERIALIZED (SELECT lo AS src, hi AS dst FROM ed " +
        "UNION SELECT hi, lo FROM ed), " +
        "nd AS (SELECT src AS node FROM sym UNION SELECT dst FROM sym), " +
        "cc(id, lbl) AS (SELECT node, node FROM nd " +
        "UNION SELECT e.dst, c.lbl FROM cc c JOIN sym e ON e.src = c.id), " +
        "lab AS MATERIALIZED (SELECT id, MIN(lbl) AS cluster FROM cc " +
        "GROUP BY id), " +
        "mm AS (SELECT COUNT(*) AS m FROM ed), " +
        "intra AS (SELECT la.cluster, COUNT(*) AS e_c FROM ed " +
        "JOIN lab la ON ed.lo = la.id JOIN lab lb ON ed.hi = lb.id " +
        "WHERE la.cluster = lb.cluster GROUP BY 1), " +
        "degs AS (SELECT lab.cluster, COUNT(*) AS d_c FROM " +
        "(SELECT src AS n FROM sym) s JOIN lab ON s.n = lab.id " +
        "GROUP BY 1), " +
        "ns AS (SELECT SUM(CAST(4 AS HUGEINT) * m * COALESCE(e_c, 0) " +
        "- CAST(d_c AS HUGEINT) * d_c) AS nsum FROM degs " +
        "LEFT JOIN intra USING (cluster) CROSS JOIN mm) " +
        "SELECT CAST(m AS BIGINT) AS m_edges, " +
        "CAST(nsum * 1000000 // (4 * CAST(m AS HUGEINT) * m) AS BIGINT) " +
        "AS q_micro FROM mm CROSS JOIN ns"),

    // the naive a<b<c triple join, credited per vertex — the
    // orientation-free ground truth
    // same md5 bottom-32 neighbor sample (row_number replay), same
    // pair closure and k_v·(k_v−1) denominator — the hub-cap sampling
    // CONTRACT is gated, not just the arithmetic
    "q275_clustering_coeff" ->
      (s"WITH it AS MATERIALIZED ($itemsCte), " +
        s"ed AS MATERIALIZED ($coEdgeCte), " +
        "sym AS (SELECT lo AS v, hi AS u FROM ed " +
        "UNION ALL SELECT hi, lo FROM ed), " +
        "dg AS (SELECT v, COUNT(*) AS dg FROM sym GROUP BY 1), " +
        "samp AS MATERIALIZED (SELECT v, u FROM (SELECT v, u, " +
        "row_number() OVER (PARTITION BY v ORDER BY " +
        "('0x' || substr(md5('cc:' || v || ':' || u), 1, 15))::BIGINT" +
        ") AS rn FROM sym) WHERE rn <= 32), " +
        "tc AS (SELECT a.v, COUNT(*) AS tri FROM samp a " +
        "JOIN samp b ON a.v = b.v AND a.u < b.u " +
        "JOIN ed ON ed.lo = a.u AND ed.hi = b.u GROUP BY 1) " +
        "SELECT dg.v AS item, dg.dg AS deg, " +
        "COALESCE(tc.tri, 0) AS triangles, " +
        "CASE WHEN dg.dg >= 2 THEN 2 * COALESCE(tc.tri, 0) * 1000000 " +
        "// (least(dg.dg, 32) * (least(dg.dg, 32) - 1)) END AS cc_micro " +
        "FROM dg LEFT JOIN tc ON dg.v = tc.v ORDER BY item"),

    // same seed slice, all 5 seed-reset integer rounds replayed
    // (the q115 chain with restart mass on the seeds)
    "q329_personalized_pagerank" -> {
      val base =
        s"WITH it AS MATERIALIZED ($itemsCte), " +
          s"ed AS MATERIALIZED ($coEdgeCte), " +
          "e AS MATERIALIZED (SELECT lo AS src, hi AS dst, 1 AS w FROM ed " +
          "UNION ALL SELECT hi, lo, 1 FROM ed), " +
          "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
          "sd AS (SELECT DISTINCT nodes.node FROM nodes JOIN " +
          "(SELECT DISTINCT CAST(p_partkey AS BIGINT) AS node FROM part " +
          "WHERE p_brand = 'Brand#11') s ON nodes.node = s.node), " +
          "ns AS (SELECT COUNT(*) AS nsd FROM sd), " +
          "ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw " +
          "FROM e GROUP BY 1), " +
          "r0 AS (SELECT nodes.node, CASE WHEN sd.node IS NOT NULL " +
          "THEN CAST(1000000000000 // nsd AS BIGINT) ELSE 0 END AS r " +
          "FROM nodes LEFT JOIN sd ON nodes.node = sd.node CROSS JOIN ns)"
      val iters = (1 to 5).map { i =>
        s"r$i AS MATERIALIZED (SELECT nodes.node, " +
          "CAST((CASE WHEN sd.node IS NOT NULL THEN 150000000000 // nsd " +
          "ELSE 0 END) + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r " +
          "FROM nodes LEFT JOIN sd ON nodes.node = sd.node CROSS JOIN ns " +
          s"LEFT JOIN (SELECT e.dst, SUM((p.r // ow.outw) * e.w) AS s " +
          s"FROM r${i - 1} p JOIN e ON p.node = e.src " +
          "JOIN ow ON e.src = ow.src GROUP BY e.dst) c " +
          "ON nodes.node = c.dst)"
      }.mkString(", ")
      s"$base, $iters SELECT node, r FROM r5 ORDER BY r DESC, node LIMIT 20"
    },

    // all 4 synchronous min-tie mode rounds replayed as a
    // MATERIALIZED CTE chain
    "q334_label_propagation" -> {
      val base =
        s"WITH it AS MATERIALIZED ($itemsCte), " +
          s"ed AS MATERIALIZED ($coEdgeCte), " +
          "sym AS MATERIALIZED (SELECT lo AS v, hi AS u FROM ed " +
          "UNION ALL SELECT hi, lo FROM ed), " +
          "l0 AS (SELECT DISTINCT v AS node, v AS label FROM sym)"
      val iters = (1 to 4).map { i =>
        s"l$i AS MATERIALIZED (SELECT v AS node, label FROM (" +
          "SELECT s.v, p.label, COUNT(*) AS cnt, row_number() OVER (" +
          "PARTITION BY s.v ORDER BY COUNT(*) DESC, p.label) AS rn " +
          s"FROM sym s JOIN l${i - 1} p ON s.u = p.node " +
          "GROUP BY s.v, p.label) WHERE rn = 1)"
      }.mkString(", ")
      s"$base, $iters SELECT node AS item, label AS community " +
        "FROM l4 ORDER BY item"
    },

    // same clipped-count recall arithmetic, same (rouge2, rouge1,
    // doc_id) top-3 order via row_number
    "q335_rouge_eval" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "g1 AS (SELECT doc_id, unnest(toks) AS g, 1 AS kind FROM tk), " +
        "g2 AS (SELECT doc_id, unnest(list_transform(" +
        "range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS g, " +
        "2 AS kind FROM tk WHERE len(toks) >= 2), " +
        "gr AS (SELECT doc_id, g, kind, COUNT(*) AS tf FROM " +
        "(SELECT * FROM g1 UNION ALL SELECT * FROM g2) " +
        "WHERE g <> '' GROUP BY 1, 2, 3), " +
        "refs AS (SELECT doc_id AS ref_id, g, kind, tf AS rtf FROM gr " +
        "WHERE doc_id < 5), " +
        "rt AS (SELECT ref_id, kind, CAST(SUM(rtf) AS BIGINT) AS rtot " +
        "FROM refs GROUP BY 1, 2), " +
        "cl AS (SELECT r.ref_id, c.doc_id, r.kind, " +
        "SUM(least(c.tf, r.rtf)) AS clip FROM gr c " +
        "JOIN refs r ON c.g = r.g AND c.kind = r.kind " +
        "WHERE c.doc_id >= 5 GROUP BY 1, 2, 3), " +
        "sc AS (SELECT ref_id, doc_id, " +
        "CAST(SUM(CASE WHEN kind = 1 THEN clip * 1000000 // rtot " +
        "ELSE 0 END) AS BIGINT) AS r1, " +
        "CAST(SUM(CASE WHEN kind = 2 THEN clip * 1000000 // rtot " +
        "ELSE 0 END) AS BIGINT) AS r2 " +
        "FROM cl JOIN rt USING (ref_id, kind) GROUP BY 1, 2), " +
        "rk AS (SELECT *, row_number() OVER (PARTITION BY ref_id " +
        "ORDER BY r2 DESC, r1 DESC, doc_id) AS rnk FROM sc) " +
        "SELECT ref_id, CAST(rnk AS BIGINT) AS rank, doc_id, " +
        "r1 AS rouge1_micro, r2 AS rouge2_micro " +
        "FROM rk WHERE rnk <= 3 ORDER BY ref_id, rank"),

    // same top-3-df query, same μ = 2000 and exact-product micro-logs
    "q330_dirichlet_ql" -> {
      def ml(x: String) = s"CAST(FLOOR(ln($x) * 1000000) AS BIGINT)"
      s"WITH tk AS (SELECT doc_id, unnest(string_split($duckNorm, ' ')) " +
        "AS t FROM documents), " +
        "tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tk WHERE t <> '' " +
        "GROUP BY 1, 2), " +
        "lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len " +
        "FROM tf GROUP BY 1), " +
        "ct AS (SELECT CAST(SUM(len) AS BIGINT) AS c FROM lens), " +
        "cf AS (SELECT t, CAST(SUM(tf) AS BIGINT) AS cf, COUNT(*) AS df " +
        "FROM tf GROUP BY 1), " +
        "q AS (SELECT t, cf FROM cf ORDER BY df DESC, t LIMIT 3), " +
        s"qb AS (SELECT CAST(SUM(${ml("2000 * cf")}) AS BIGINT) AS qbase " +
        "FROM q), " +
        "pres AS (SELECT doc_id, " +
        s"CAST(SUM(${ml("tf * c + 2000 * cf")} - ${ml("2000 * cf")}) " +
        "AS BIGINT) AS presum " +
        "FROM tf JOIN q USING (t) CROSS JOIN ct GROUP BY 1) " +
        "SELECT doc_id, CAST(COALESCE(presum, 0) + qbase - " +
        s"3 * ${ml("(len + 2000) * c")} AS BIGINT) AS score_micro " +
        "FROM lens CROSS JOIN ct CROSS JOIN qb " +
        "LEFT JOIN pres USING (doc_id) " +
        "ORDER BY score_micro DESC, doc_id LIMIT 10"
    },

    // same frequency-of-frequencies closed form, HUGEINT products
    "q331_chao1_vocab" ->
      (s"WITH tk AS (SELECT lang, unnest(string_split($duckNorm, ' ')) " +
        "AS t FROM documents), " +
        "cnt AS (SELECT lang, t, COUNT(*) AS n FROM tk WHERE t <> '' " +
        "GROUP BY 1, 2), " +
        "g AS (SELECT lang, COUNT(*) AS d_vocab, " +
        "SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1, " +
        "SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2 FROM cnt " +
        "GROUP BY 1) " +
        "SELECT lang, CAST(d_vocab AS BIGINT) AS d_vocab, " +
        "CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2, " +
        "CAST(d_vocab::HUGEINT * 1000000 + " +
        "f1::HUGEINT * (f1 - 1) * 1000000 // (2 * (f2 + 1)) AS BIGINT) " +
        "AS chao1_micro FROM g ORDER BY lang"),

    // same ≥4-char/≥3-count word graph, same md5 node ids, all 5
    // integer PageRank rounds replayed (the q115 chain)
    "q282_textrank" -> {
      val base =
        s"WITH dd AS (SELECT string_split($duckNorm, ' ') AS toks " +
          "FROM documents), " +
          "bg AS (SELECT unnest(list_transform(range(1, len(toks)), " +
          "i -> toks[i] || ' ' || toks[i+1])) AS bigram " +
          "FROM dd WHERE len(toks) >= 2), " +
          "pw AS (SELECT string_split(bigram, ' ')[1] AS w1, " +
          "string_split(bigram, ' ')[2] AS w2 FROM bg), " +
          "pf AS MATERIALIZED (SELECT least(w1, w2) AS wa, " +
          "greatest(w1, w2) AS wb, count(*) AS c FROM pw " +
          "WHERE len(w1) >= 4 AND len(w2) >= 4 AND w1 <> w2 " +
          "GROUP BY 1, 2 HAVING count(*) >= 3), " +
          "vocab AS MATERIALIZED (SELECT word, " +
          "('0x' || substr(md5('tr:' || word), 1, 15))::BIGINT AS node " +
          "FROM (SELECT wa AS word FROM pf UNION SELECT wb FROM pf)), " +
          "e AS MATERIALIZED (SELECT va.node AS src, vb.node AS dst, " +
          "CAST(c AS BIGINT) AS w FROM pf " +
          "JOIN vocab va ON pf.wa = va.word " +
          "JOIN vocab vb ON pf.wb = vb.word " +
          "UNION ALL SELECT vb.node, va.node, CAST(c AS BIGINT) FROM pf " +
          "JOIN vocab va ON pf.wa = va.word " +
          "JOIN vocab vb ON pf.wb = vb.word), " +
          "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
          "nn AS (SELECT count(*) AS n FROM nodes), " +
          "ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw " +
          "FROM e GROUP BY 1), " +
          "r0 AS (SELECT node, CAST(1000000000000 // n AS BIGINT) AS r " +
          "FROM nodes CROSS JOIN nn)"
      val iters = (1 to 5).map { i =>
        s"r$i AS MATERIALIZED (SELECT nodes.node, " +
          "CAST((150000000000 // n) + (85 * COALESCE(c.s, 0)) // 100 " +
          "AS BIGINT) AS r " +
          "FROM nodes CROSS JOIN nn LEFT JOIN " +
          s"(SELECT e.dst, sum((p.r // ow.outw) * e.w) AS s " +
          s"FROM r${i - 1} p JOIN e ON p.node = e.src " +
          "JOIN ow ON e.src = ow.src GROUP BY e.dst) c " +
          "ON nodes.node = c.dst)"
      }.mkString(", ")
      s"$base, $iters SELECT word, r FROM r5 JOIN vocab USING (node) " +
        "ORDER BY r DESC, word LIMIT 20"
    },

    // both rankings the q16 contract on prefix slices; LEFT JOIN
    // keeps zero-overlap cells visible
    "q283_mrl_truncation" -> {
      def leg(dd: Int, name: String): String =
        s"$name AS (SELECT qid, vec_id FROM (SELECT q.qid, e.vec_id, " +
          s"row_number() OVER (PARTITION BY q.qid ORDER BY " +
          s"round(list_dot_product(e.emb[1:$dd], q.qemb[1:$dd]) / " +
          s"(sqrt(list_dot_product(e.emb[1:$dd], e.emb[1:$dd])) * " +
          s"sqrt(list_dot_product(q.qemb[1:$dd], q.qemb[1:$dd]))), 6) " +
          s"DESC, e.vec_id) AS rn " +
          "FROM e, q WHERE e.vec_id <> q.qid) WHERE rn <= 10)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb " +
        "FROM embeddings), " +
        "q AS MATERIALIZED (SELECT vec_id AS qid, emb AS qemb FROM e " +
        "WHERE vec_id < 5), " +
        leg(64, "fl") + ", " + leg(16, "t16") + ", " +
        leg(32, "t32") + ", " + leg(64, "t64") + ", " +
        "ov AS (SELECT qid, 16 AS dim, count(*) AS o FROM t16 " +
        "JOIN fl USING (qid, vec_id) GROUP BY 1 " +
        "UNION ALL SELECT qid, 32, count(*) FROM t32 " +
        "JOIN fl USING (qid, vec_id) GROUP BY 1 " +
        "UNION ALL SELECT qid, 64, count(*) FROM t64 " +
        "JOIN fl USING (qid, vec_id) GROUP BY 1), " +
        "qd AS (SELECT qid, unnest([16, 32, 64]) AS dim FROM q) " +
        "SELECT qd.qid, CAST(qd.dim AS BIGINT) AS dim, " +
        "CAST(COALESCE(o, 0) AS BIGINT) AS overlap10 FROM qd " +
        "LEFT JOIN ov ON qd.qid = ov.qid AND qd.dim = ov.dim " +
        "ORDER BY qd.qid, qd.dim"
    },

    // the synchronous peel unrolled: 24 MATERIALIZED rounds (no-ops
    // past the fixpoint; Spark's loop fails loudly if true
    // convergence ever needed more)
    "q273_kcore" -> {
      val rounds = 24
      val sb = new StringBuilder
      sb.append(s"WITH it AS MATERIALIZED ($itemsCte), ")
      sb.append(s"ed AS MATERIALIZED ($coEdgeCte), ")
      sb.append("e0 AS MATERIALIZED (SELECT lo AS src, hi AS dst FROM ed " +
        "UNION ALL SELECT hi, lo FROM ed)")
      for (r <- 1 to rounds) {
        sb.append(s", k$r AS MATERIALIZED (SELECT src FROM e${r - 1} " +
          "GROUP BY src HAVING COUNT(*) >= 3)")
        sb.append(s", e$r AS MATERIALIZED (SELECT src, dst FROM e${r - 1} " +
          s"WHERE src IN (SELECT src FROM k$r) " +
          s"AND dst IN (SELECT src FROM k$r))")
      }
      sb.append(s" SELECT src AS item, COUNT(*) AS core_deg " +
        s"FROM e$rounds GROUP BY 1 ORDER BY 1")
      sb.toString
    },

    // same wedge enumeration, identical micro-log term, NOT EXISTS
    // mirrors the anti-join, same (score, u, v) top-20 order
    "q274_adamic_adar" ->
      (s"WITH it AS MATERIALIZED ($itemsCte), " +
        s"ed AS MATERIALIZED ($coEdgeCte), " +
        "sym AS MATERIALIZED (SELECT lo AS src, hi AS dst FROM ed " +
        "UNION ALL SELECT hi, lo FROM ed), " +
        "dg AS (SELECT src AS w, COUNT(*) AS degw FROM sym GROUP BY 1 " +
        "HAVING COUNT(*) <= 64), " +
        "wg AS (SELECT n1.dst AS u, n2.dst AS v, dg.degw " +
        "FROM sym n1 JOIN sym n2 ON n1.src = n2.src AND n1.dst < n2.dst " +
        "JOIN dg ON dg.w = n1.src), " +
        "sc AS (SELECT u, v, COUNT(*) AS common_n, " +
        "SUM(1000000000000 // CAST(FLOOR(ln(CAST(degw AS DOUBLE)) " +
        "* 1000000) AS BIGINT)) AS aa_nano FROM wg GROUP BY 1, 2) " +
        "SELECT u, v, common_n, CAST(aa_nano AS BIGINT) AS aa_nano " +
        "FROM sc WHERE NOT EXISTS (SELECT 1 FROM ed " +
        "WHERE ed.lo = sc.u AND ed.hi = sc.v) " +
        "ORDER BY aa_nano DESC, u, v LIMIT 20"),

    // same within-order pair gen, supp >= 2 gate, HUGEINT lift, same
    // (lift, ante, cons) top-20 order
    "q270_assoc_rules" ->
      ("WITH it AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS oid, " +
        "CAST(l_partkey AS BIGINT) AS item FROM lineitem), " +
        "no AS (SELECT COUNT(DISTINCT oid) AS n_orders FROM it), " +
        "s1 AS (SELECT item, COUNT(*) AS supp FROM it GROUP BY 1), " +
        "pr AS (SELECT a.item AS item_a, b.item AS item_b, " +
        "COUNT(*) AS supp_ab FROM it a JOIN it b ON a.oid = b.oid " +
        "AND a.item < b.item GROUP BY 1, 2 HAVING COUNT(*) >= 2), " +
        "ru AS (SELECT item_a AS ante, item_b AS cons, supp_ab FROM pr " +
        "UNION ALL SELECT item_b, item_a, supp_ab FROM pr) " +
        "SELECT ante, cons, supp_ab, " +
        "supp_ab * 1000000 // sa.supp AS conf_micro, " +
        "CAST(CAST(supp_ab AS HUGEINT) * n_orders * 1000000 " +
        "// (CAST(sa.supp AS HUGEINT) * sc.supp) AS BIGINT) " +
        "AS lift_micro " +
        "FROM ru JOIN s1 sa ON ru.ante = sa.item " +
        "JOIN s1 sc ON ru.cons = sc.item CROSS JOIN no " +
        "ORDER BY lift_micro DESC, ante, cons LIMIT 20"),

    // q77's LM replay extended with the source rollup, linearized MW
    // clamp, and the q224 renorm
    "q268_doremi_reweight" ->
      (s"WITH tk AS (SELECT doc_id, unnest(string_split($duckNorm, ' ')) " +
        "AS t FROM documents), " +
        "c AS (SELECT t, count(*) AS c FROM tk GROUP BY t), " +
        "st AS (SELECT CAST(sum(c) AS DOUBLE) AS nn, " +
        "CAST(count(*) AS DOUBLE) AS vv FROM c), " +
        "li AS (SELECT tk.doc_id, " +
        "CAST(FLOOR(-ln((c.c + 1) / (st.nn + st.vv)) * 1000000) AS BIGINT) " +
        "AS li FROM tk JOIN c USING (t) CROSS JOIN st), " +
        "dn AS (SELECT doc_id, CAST(sum(li) // count(*) AS BIGINT) " +
        "AS nll FROM li GROUP BY doc_id), " +
        "bs AS (SELECT d.source, COUNT(*) AS n_docs, " +
        "CAST(SUM(dn.nll) // COUNT(*) AS BIGINT) AS nll_micro " +
        "FROM dn JOIN documents d USING (doc_id) GROUP BY 1), " +
        "rf AS (SELECT CAST(SUM(nll) // COUNT(*) AS BIGINT) AS ref_micro " +
        "FROM dn), " +
        "rw AS MATERIALIZED (SELECT source, n_docs, nll_micro, " +
        "nll_micro - rf.ref_micro AS excess_micro, " +
        "GREATEST(1, 1000000 + 2 * (nll_micro - rf.ref_micro)) AS raw " +
        "FROM bs CROSS JOIN rf) " +
        "SELECT source, n_docs, nll_micro, " +
        "CAST(excess_micro AS BIGINT) AS excess_micro, " +
        "CAST(GREATEST(raw * ((SELECT COUNT(*) FROM rw) * 1000000) " +
        "// (SELECT SUM(raw) FROM rw), 1) AS BIGINT) AS weight_micro " +
        "FROM rw ORDER BY source"),

    // identical md5 coin on (doc_id, 0-based position), identical
    // space-joined rebuild under the md5
    "q249_token_dropout" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "t AS (SELECT doc_id, len(toks) AS n_orig, unnest(toks) AS tok, " +
        "generate_subscripts(toks, 1) AS pos1 FROM tk), " +
        "k AS (SELECT doc_id, n_orig, pos1, tok FROM t WHERE " +
        "('0x' || substr(md5('aug:' || doc_id || ':' || (pos1 - 1)), " +
        "1, 8))::BIGINT % 8 <> 0) " +
        "SELECT doc_id, CAST(MAX(n_orig) AS BIGINT) AS n_orig, " +
        "COUNT(*) AS n_kept, " +
        "md5(array_to_string(list(tok ORDER BY pos1), ' ')) AS aug_md5 " +
        "FROM k GROUP BY doc_id ORDER BY doc_id"),

    // replace-length identity per pattern (exact: no blocklist word
    // has a proper border, so all-positions = non-overlapping)
    "q247_blocklist_filter" -> {
      val cCols = BlockPatterns.map(p =>
        s"CAST((len(nt) - len(replace(nt, '$p', ''))) // ${p.length} " +
          s"AS BIGINT) AS c_$p").mkString(", ")
      val hitSum = BlockPatterns.map(p => s"c_$p").mkString(" + ")
      val patSum = BlockPatterns.map(p =>
        s"(CASE WHEN c_$p > 0 THEN 1 ELSE 0 END)").mkString(" + ")
      s"WITH d AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 " +
        s"THEN '$SpamBanner ' || text ELSE text END AS t0 " +
        "FROM documents), " +
        "n AS (SELECT doc_id, " +
        "regexp_replace(lower(trim(t0)), '\\s+', ' ', 'g') AS nt FROM d), " +
        s"c AS (SELECT doc_id, $cCols FROM n) " +
        s"SELECT doc_id, ${BlockPatterns.map(p => s"c_$p").mkString(", ")}, " +
        s"CAST($hitSum AS BIGINT) AS n_hits, " +
        s"CAST($patSum AS BIGINT) AS n_patterns, " +
        s"($hitSum >= 4) AS flagged FROM c ORDER BY doc_id"
    },

    // exact counts reproduce the heavy-hitter rows; the theorem
    // booleans are TRUE literals — they only diverge if the sketch
    // violates its guarantees
    "q243_misra_gries_hh" -> {
      val plantedList = (Seq.fill(8)("hot0") ++ Seq.fill(5)("hot1") ++
        Seq.fill(4)("hot2")).map(t => s"'$t'").mkString("[", ", ", "]")
      s"WITH t AS (SELECT unnest(list_concat(" +
        s"string_split($duckNorm, ' '), $plantedList)) AS tok " +
        "FROM documents), " +
        "e AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY 1), " +
        "nn AS (SELECT COUNT(*) AS n FROM t) " +
        "SELECT tok, CAST(cnt AS BIGINT) AS cnt, CAST(n AS BIGINT) AS n, " +
        "TRUE AS in_sketch, TRUE AS bounds_ok " +
        "FROM e CROSS JOIN nn WHERE cnt * 25 > n ORDER BY tok"
    },

    // same 6-dp→micro cosines, truncating top-4 means, ratio margin,
    // best-per-x pick and 1.02 floor
    "q239_bitext_mining" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb " +
        "FROM embeddings), " +
        "x AS (SELECT vec_id AS x_id, emb AS xemb FROM e " +
        "WHERE vec_id % 2 = 0), " +
        "y AS (SELECT vec_id AS y_id, emb AS yemb FROM e " +
        "WHERE vec_id % 2 = 1), " +
        "s AS MATERIALIZED (SELECT x_id, y_id, " +
        s"CAST(round(${cos("xemb", "yemb")} * 1000000) AS BIGINT) AS cm " +
        "FROM x, y), " +
        "ax AS (SELECT x_id, SUM(cm) // 4 AS ax FROM (" +
        "SELECT x_id, cm, row_number() OVER (PARTITION BY x_id " +
        "ORDER BY cm DESC, y_id) AS rn FROM s) WHERE rn <= 4 " +
        "GROUP BY 1), " +
        "ay AS (SELECT y_id, SUM(cm) // 4 AS ay FROM (" +
        "SELECT y_id, cm, row_number() OVER (PARTITION BY y_id " +
        "ORDER BY cm DESC, x_id) AS rn FROM s) WHERE rn <= 4 " +
        "GROUP BY 1), " +
        "m AS (SELECT s.x_id, s.y_id, " +
        "CAST(s.cm * 1000000 // ((ax.ax + ay.ay) // 2) AS BIGINT) " +
        "AS margin_micro FROM s " +
        "JOIN ax ON ax.x_id = s.x_id JOIN ay ON ay.y_id = s.y_id " +
        "WHERE ax.ax + ay.ay > 0), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY x_id " +
        "ORDER BY margin_micro DESC, y_id) AS rn FROM m) " +
        "SELECT x_id, y_id, margin_micro FROM r " +
        "WHERE rn = 1 AND margin_micro >= 1020000 ORDER BY x_id"
    },
    // full IVF replay of BOTH candidate directions (√N centroids,
    // nprobe 8, top-8 lists), q239's margin arithmetic on the lists,
    // plus the fixed-sample exact leg and the full-outer audit join
    "q300_bitext_ann" -> {
      val cosR = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      val cm = (a: String, b: String) =>
        s"CAST(round(${cosR(a, b)} * 1000000) AS BIGINT)"
      // nearest-centroid assignment / top-4 probes, q230's replay shape
      val assign = (src: String) =>
        s"SELECT vec_id, emb, cid AS bucket FROM (" +
          s"SELECT t.vec_id, t.emb, c.cid, row_number() OVER (" +
          s"PARTITION BY t.vec_id ORDER BY ${cosR("t.emb", "c.cemb")} DESC, " +
          s"c.cid) AS rn FROM $src t, c) WHERE rn = 1"
      val probes = (src: String) =>
        s"SELECT qid, qemb, cid AS bucket FROM (" +
          s"SELECT t.vec_id AS qid, t.emb AS qemb, c.cid, row_number() OVER (" +
          s"PARTITION BY t.vec_id ORDER BY ${cosR("t.emb", "c.cemb")} DESC, " +
          s"c.cid) AS rn FROM $src t, c) WHERE rn <= 8"
      val avg4 = (src: String, idc: String, oc: String) =>
        s"SELECT $idc, SUM(cm) // 4 AS a FROM (SELECT $idc, cm, " +
          s"row_number() OVER (PARTITION BY $idc ORDER BY cm DESC, $oc) " +
          s"AS rn FROM $src) WHERE rn <= 4 GROUP BY 1"
      val mine = (src: String, axc: String, ayc: String) =>
        s"SELECT x_id, y_id, margin_micro FROM (SELECT x_id, y_id, " +
          s"margin_micro, row_number() OVER (PARTITION BY x_id " +
          s"ORDER BY margin_micro DESC, y_id) AS rn FROM (" +
          s"SELECT s.x_id, s.y_id, " +
          s"CAST(s.cm * 1000000 // (($axc.a + $ayc.a) // 2) AS BIGINT) " +
          s"AS margin_micro " +
          s"FROM $src s JOIN $axc ON $axc.x_id = s.x_id " +
          s"JOIN $ayc ON $ayc.y_id = s.y_id WHERE $axc.a + $ayc.a > 0)) " +
          s"WHERE rn = 1 AND margin_micro >= 1020000"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb " +
        "FROM embeddings), " +
        "x AS (SELECT vec_id, emb FROM e WHERE vec_id % 2 = 0), " +
        "y AS (SELECT vec_id, emb FROM e WHERE vec_id % 2 = 1), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < " +
        "CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)), " +
        s"ya AS MATERIALIZED (${assign("y")}), " +
        s"xa AS MATERIALIZED (${assign("x")}), " +
        s"xp AS (${probes("x")}), " +
        s"yp AS (${probes("y")}), " +
        "xc AS MATERIALIZED (SELECT qid AS x_id, vec_id AS y_id, cm FROM (" +
        s"SELECT p.qid, a.vec_id, ${cm("a.emb", "p.qemb")} AS cm, " +
        s"row_number() OVER (PARTITION BY p.qid ORDER BY " +
        s"${cm("a.emb", "p.qemb")} DESC, a.vec_id) AS rn " +
        "FROM ya a JOIN xp p ON a.bucket = p.bucket) WHERE rn <= 8), " +
        "yc AS MATERIALIZED (SELECT qid AS y_id, vec_id AS x_id, cm FROM (" +
        s"SELECT p.qid, a.vec_id, ${cm("a.emb", "p.qemb")} AS cm, " +
        s"row_number() OVER (PARTITION BY p.qid ORDER BY " +
        s"${cm("a.emb", "p.qemb")} DESC, a.vec_id) AS rn " +
        "FROM xa a JOIN yp p ON a.bucket = p.bucket) WHERE rn <= 8), " +
        s"ax AS (${avg4("xc", "x_id", "y_id")}), " +
        s"ay AS (${avg4("yc", "y_id", "x_id")}), " +
        s"ann AS (${mine("xc", "ax", "ay")}), " +
        "xs AS (SELECT vec_id AS x_id, emb AS xemb FROM x " +
        "WHERE vec_id < 256), " +
        "se AS MATERIALIZED (SELECT xs.x_id, y.vec_id AS y_id, " +
        s"${cm("xs.xemb", "y.emb")} AS cm FROM xs, y), " +
        s"axe AS (${avg4("se", "x_id", "y_id")}), " +
        s"aye AS (${avg4("se", "y_id", "x_id")}), " +
        s"ex AS (SELECT x_id, y_id AS y_exact FROM (${mine("se", "axe", "aye")})) " +
        "SELECT COALESCE(a.x_id, ex.x_id) AS x_id, a.y_id AS y_ann, " +
        "a.margin_micro AS margin_ann_micro, " +
        "COALESCE(a.x_id, ex.x_id) < 256 AS audited, ex.y_exact, " +
        "CASE WHEN COALESCE(a.x_id, ex.x_id) < 256 " +
        "THEN COALESCE(CAST(a.y_id = ex.y_exact AS BIGINT), 0) " +
        "ELSE -1 END AS hit " +
        "FROM ann a FULL OUTER JOIN ex ON ex.x_id = a.x_id ORDER BY x_id"
    },

    // q230's exact + IVF legs replayed with ranks kept; pinned gain
    // literals (identical to the Spark plan's), IDCG prefix sum
    "q240_ranking_metrics" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      val gainsList = DcgGains.mkString("[", ", ", "]")
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 5), " +
        "ex AS (SELECT qid, vec_id FROM (SELECT q.qid, e.vec_id, " +
        s"row_number() OVER (PARTITION BY q.qid ORDER BY " +
        s"${cos("e.emb", "q.qemb")} DESC, e.vec_id) AS rn " +
        "FROM e, q WHERE e.vec_id <> q.qid) WHERE rn <= 10), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16), " +
        "assign AS (SELECT vec_id, emb, cid AS bucket FROM (" +
        "SELECT e.vec_id, e.emb, c.cid, row_number() OVER (PARTITION BY " +
        s"e.vec_id ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn " +
        "FROM e, c) WHERE rn = 1), " +
        "probes AS (SELECT qid, qemb, cid AS bucket FROM (" +
        "SELECT q.qid, q.qemb, c.cid, row_number() OVER (PARTITION BY " +
        s"q.qid ORDER BY ${cos("q.qemb", "c.cemb")} DESC, c.cid) AS rn " +
        "FROM q, c) WHERE rn <= 4), " +
        "ap AS (SELECT qid, vec_id, CAST(rn AS BIGINT) AS rank " +
        "FROM (SELECT p.qid, a.vec_id, " +
        s"row_number() OVER (PARTITION BY p.qid ORDER BY " +
        s"${cos("a.emb", "p.qemb")} DESC, a.vec_id) AS rn " +
        "FROM assign a JOIN probes p ON a.bucket = p.bucket " +
        "WHERE a.vec_id <> p.qid) WHERE rn <= 10), " +
        "j AS (SELECT ap.qid, ap.rank, " +
        "CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel " +
        "FROM ap LEFT JOIN ex ON ex.qid = ap.qid " +
        "AND ex.vec_id = ap.vec_id) " +
        "SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_rel, " +
        s"CAST(SUM(CASE WHEN rel = 1 THEN ($gainsList)[rank] ELSE 0 END) " +
        s"* 1000000 // $IdcgAt10 AS BIGINT) AS ndcg_micro, " +
        "CAST(COALESCE(1000000 // MIN(CASE WHEN rel = 1 THEN rank END), " +
        "0) AS BIGINT) AS mrr_micro " +
        "FROM j GROUP BY 1 ORDER BY qid"
    },
    "q230_ann_recall" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 5), " +
        "ex AS (SELECT qid, vec_id FROM (SELECT q.qid, e.vec_id, " +
        s"row_number() OVER (PARTITION BY q.qid ORDER BY " +
        s"${cos("e.emb", "q.qemb")} DESC, e.vec_id) AS rn " +
        "FROM e, q WHERE e.vec_id <> q.qid) WHERE rn <= 10), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16), " +
        "assign AS (SELECT vec_id, emb, cid AS bucket FROM (" +
        "SELECT e.vec_id, e.emb, c.cid, row_number() OVER (PARTITION BY " +
        s"e.vec_id ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn " +
        "FROM e, c) WHERE rn = 1), " +
        "probes AS (SELECT qid, qemb, cid AS bucket FROM (" +
        "SELECT q.qid, q.qemb, c.cid, row_number() OVER (PARTITION BY " +
        s"q.qid ORDER BY ${cos("q.qemb", "c.cemb")} DESC, c.cid) AS rn " +
        "FROM q, c) WHERE rn <= 4), " +
        "ap AS (SELECT qid, vec_id FROM (SELECT p.qid, a.vec_id, " +
        s"row_number() OVER (PARTITION BY p.qid ORDER BY " +
        s"${cos("a.emb", "p.qemb")} DESC, a.vec_id) AS rn " +
        "FROM assign a JOIN probes p ON a.bucket = p.bucket " +
        "WHERE a.vec_id <> p.qid) WHERE rn <= 10), " +
        "i AS (SELECT ex.qid, count(*) AS inter FROM ex " +
        "JOIN ap ON ap.qid = ex.qid AND ap.vec_id = ex.vec_id " +
        "GROUP BY 1) " +
        "SELECT ne.qid, ne.n_exact, na.n_approx, " +
        "CAST(coalesce(i.inter, 0) AS BIGINT) AS inter, " +
        "CAST(coalesce(i.inter, 0) AS BIGINT) * 1000000 // ne.n_exact " +
        "AS recall_micro FROM " +
        "(SELECT qid, CAST(count(*) AS BIGINT) AS n_exact FROM ex " +
        "GROUP BY 1) ne " +
        "JOIN (SELECT qid, CAST(count(*) AS BIGINT) AS n_approx FROM ap " +
        "GROUP BY 1) na ON na.qid = ne.qid " +
        "LEFT JOIN i ON i.qid = ne.qid ORDER BY ne.qid"
    },
    // full PQ replay: subvector split, both Lloyd rounds per subspace
    // (6-dp centroid rounding, lowest-cid ties), encode, integer-micro
    // ADC table sum, top-10 — MATERIALIZED CTEs keep the iteration
    // chain from re-expanding through DuckDB's CTE inlining
    "q228_pq_adc" -> {
      val dd2 = (a: String, b: String) =>
        s"round(list_dot_product($a, $a) - 2 * list_dot_product($a, $b) " +
          s"+ list_dot_product($b, $b), 6)"
      val assignCte = (src: String, cb: String) =>
        s"SELECT vec_id, s, sv, cid FROM (" +
          s"SELECT t.vec_id, t.s, t.sv, c.cid, row_number() OVER (" +
          s"PARTITION BY t.vec_id, t.s " +
          s"ORDER BY ${dd2("t.sv", "c.cemb")} ASC, c.cid) AS rn " +
          s"FROM $src t JOIN $cb c ON c.s = t.s) WHERE rn = 1"
      val meanCte = (src: String) =>
        s"SELECT s, cid, list(round(m, 6) ORDER BY i) AS cemb FROM (" +
          s"SELECT s, cid, i, avg(v) AS m FROM (" +
          s"SELECT s, cid, unnest(sv) AS v, generate_subscripts(sv, 1) AS i " +
          s"FROM $src) GROUP BY 1, 2, 3) GROUP BY 1, 2"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "sub AS MATERIALIZED (SELECT vec_id, s, " +
        "emb[s * 8 + 1 : s * 8 + 8] AS sv " +
        "FROM e CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS s)), " +
        "cb0 AS MATERIALIZED (SELECT s, CAST(vec_id AS INT) AS cid, " +
        "sv AS cemb FROM sub WHERE vec_id < 16), " +
        s"a1 AS MATERIALIZED (${assignCte("sub", "cb0")}), " +
        s"cb1 AS MATERIALIZED (${meanCte("a1")}), " +
        s"a2 AS MATERIALIZED (${assignCte("sub", "cb1")}), " +
        s"cb2 AS MATERIALIZED (${meanCte("a2")}), " +
        s"codes AS MATERIALIZED (SELECT vec_id, s, cid FROM " +
        s"(${assignCte("sub", "cb2")})), " +
        "qsub AS (SELECT vec_id AS qid, s, sv AS qsv FROM sub " +
        "WHERE vec_id < 5), " +
        "dtab AS MATERIALIZED (SELECT q.qid, q.s, c.cid, " +
        s"CAST(round(${dd2("q.qsv", "c.cemb")} * 1000000) AS BIGINT) AS dm " +
        "FROM qsub q JOIN cb2 c ON c.s = q.s), " +
        "sc AS (SELECT d.qid, k.vec_id, CAST(sum(d.dm) AS BIGINT) " +
        "AS adc_micro, count(*) AS n " +
        "FROM codes k JOIN dtab d ON d.s = k.s AND d.cid = k.cid " +
        "WHERE k.vec_id <> d.qid GROUP BY 1, 2), " +
        "r AS (SELECT qid, vec_id, adc_micro, row_number() OVER (" +
        "PARTITION BY qid ORDER BY adc_micro ASC, vec_id) AS rn " +
        "FROM sc WHERE n = 8) " +
        "SELECT qid, vec_id, adc_micro FROM r WHERE rn <= 10 " +
        "ORDER BY qid, vec_id"
    },
    // full 12-round replay: identical features, hard-sigmoid chain,
    // HUGEINT gradient sums, truncating divisions; w/feats CTEs are
    // MATERIALIZED (each is referenced twice per round — DuckDB's CTE
    // inlining would otherwise expand the chain 2^12 ways)
    "q235_quality_classifier" -> {
      def zDuck = (0 to 3).map(j => s"w.w$j * f.x$j").mkString(" + ")
      val rounds = (1 to 12).map { r =>
        val p = r - 1
        s"g$r AS MATERIALIZED (SELECT " +
          (0 to 3).map(j =>
            s"(4 * SUM(err * x$j)) // (COUNT(*) * 1000000) AS d$j")
            .mkString(", ") +
          s" FROM (SELECT ${(0 to 3).map(j => s"f.x$j").mkString(", ")}, " +
          s"LEAST(GREATEST((($zDuck) // 1000000) // 4 + 500000, 0), " +
          s"1000000) - f.y * 1000000 AS err " +
          s"FROM feats f CROSS JOIN w$p w)), " +
          s"w$r AS MATERIALIZED (SELECT " +
          (0 to 3).map(j => s"w.w$j - g.d$j AS w$j").mkString(", ") +
          s" FROM w$p w CROSS JOIN g$r g), " +
          s"a$r AS (SELECT COUNT(*) AS n, SUM(CASE WHEN " +
          s"((($zDuck) // 1000000) >= 0) = (f.y = 1) THEN 1 ELSE 0 END) " +
          s"AS nc FROM feats f CROSS JOIN w$r w)"
      }.mkString(", ")
      val unions = (1 to 12).map { r =>
        s"SELECT CAST($r AS BIGINT) AS step, " +
          (0 to 3).map(j => s"CAST(w.w$j AS BIGINT) AS w$j").mkString(", ") +
          s", CAST(a.nc AS BIGINT) AS n_correct, CAST(a.n AS BIGINT) AS n " +
          s"FROM w$r w CROSS JOIN a$r a"
      }.mkString(" UNION ALL ")
      val spamText = "CASE WHEN doc_id % 3 = 0 THEN " +
        s"'$SpamBanner ' || text ELSE text END"
      val normSpam =
        s"regexp_replace(lower(trim($spamText)), '\\s+', ' ', 'g')"
      s"WITH t0 AS (SELECT CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END " +
        s"AS y, string_split($normSpam, ' ') AS toks FROM documents), " +
        "t1 AS (SELECT y, len(toks) AS nt, " +
        "len(list_distinct(toks)) AS nd, " +
        "CASE WHEN len(toks) > 6 THEN len(list_filter(" +
        "range(1, len(toks) - 5), i -> toks[i] = toks[i + 6])) " +
        "ELSE 0 END AS r6, " +
        "len(list_filter(toks, t -> t IN ('the', 'a', 'and', 'of'))) " +
        "AS m FROM t0), " +
        "t2 AS MATERIALIZED (SELECT y, " +
        "r6::HUGEINT * 4000000 // nt AS f1, " +
        "nd::HUGEINT * 1000000 // nt AS f2, " +
        "m::HUGEINT * 4000000 // nt AS f3 FROM t1), " +
        "muc AS (SELECT SUM(f1) // COUNT(*) AS mu1, " +
        "SUM(f2) // COUNT(*) AS mu2, SUM(f3) // COUNT(*) AS mu3 " +
        "FROM t2), " +
        "feats AS MATERIALIZED (SELECT y, 1000000::HUGEINT AS x0, " +
        "f1 - m.mu1 AS x1, f2 - m.mu2 AS x2, f3 - m.mu3 AS x3 " +
        "FROM t2 CROSS JOIN muc m), " +
        "w0 AS MATERIALIZED (SELECT " +
        (0 to 3).map(j => s"0::HUGEINT AS w$j").mkString(", ") + "), " +
        rounds + " " +
        s"SELECT * FROM ($unions) ORDER BY step"
    },

    // same pseudo-doc grouping, per-token maxima (6 dp → micro before
    // the sum), top-5 — list_dot_product matches dot_f64's
    // sequential accumulation (the q16-proven pairing)
    "q225_maxsim_rerank" ->
      ("WITH e AS (SELECT vec_id // 8 AS did, vec_id, " +
        "embedding::DOUBLE[] AS emb FROM embeddings), " +
        "q AS (SELECT did AS qdid, vec_id AS qvid, emb AS qemb " +
        "FROM e WHERE did < 3), " +
        "s1 AS (SELECT q.qdid, q.qvid, e.did, " +
        "max(round(list_dot_product(e.emb, q.qemb) / " +
        "(sqrt(list_dot_product(e.emb, e.emb)) * " +
        "sqrt(list_dot_product(q.qemb, q.qemb))), 6)) AS mx " +
        "FROM e JOIN q ON e.did <> q.qdid GROUP BY 1, 2, 3), " +
        "s2 AS (SELECT qdid, did, " +
        "CAST(sum(CAST(round(mx * 1000000) AS BIGINT)) AS BIGINT) " +
        "AS score_micro FROM s1 GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY qdid " +
        "ORDER BY score_micro DESC, did) AS rn FROM s2) " +
        "SELECT qdid, did, score_micro FROM r WHERE rn <= 5 " +
        "ORDER BY qdid, did"),
    // identical 6-dp leg scores, identical rank tie-breaks, integer
    // micro RRF contributions — // matches Spark div
    "q226_rrf_fusion" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb " +
        "FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, emb AS qemb FROM e " +
        "WHERE vec_id < 5), " +
        "s AS (SELECT q.qid, e.vec_id, " +
        "round(list_dot_product(e.emb, q.qemb) / " +
        "(sqrt(list_dot_product(e.emb, e.emb)) * " +
        "sqrt(list_dot_product(q.qemb, q.qemb))), 6) AS cosv, " +
        "round(list_dot_product(e.emb, e.emb) " +
        "- 2 * list_dot_product(e.emb, q.qemb) " +
        "+ list_dot_product(q.qemb, q.qemb), 6) AS d2 " +
        "FROM e JOIN q ON e.vec_id <> q.qid), " +
        "rk AS (SELECT qid, vec_id, " +
        "CAST(row_number() OVER (PARTITION BY qid " +
        "ORDER BY cosv DESC, vec_id) AS BIGINT) AS rank_cos, " +
        "CAST(row_number() OVER (PARTITION BY qid " +
        "ORDER BY d2 ASC, vec_id) AS BIGINT) AS rank_l2 FROM s), " +
        "f AS (SELECT *, 1000000 // (60 + rank_cos) + " +
        "1000000 // (60 + rank_l2) AS rrf_micro FROM rk), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY qid " +
        "ORDER BY rrf_micro DESC, vec_id) AS rn FROM f) " +
        "SELECT qid, vec_id, rank_cos, rank_l2, rrf_micro FROM r " +
        "WHERE rn <= 10 ORDER BY qid, vec_id"),
    // the estimate itself is engine-specific so it is asserted (3×rsd
    // band -> boolean), not hashed; the exact count IS hashed
    "q21_approx_distinct" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, " +
        "TRUE AS est_in_band FROM events " +
        "GROUP BY event_type ORDER BY event_type"),
    // mirrors synthImagePng's pixel polynomial + ImageCodec's
    // nearest-neighbor index arithmetic — the Spark side must get the
    // identical numbers through a REAL PNG encode/decode round-trip
    "q78_image_decode" ->
      ("WITH dims AS (SELECT doc_id AS id, 16 + doc_id % 16 AS w, " +
        "16 + doc_id % 8 AS h FROM documents WHERE doc_id < 200), " +
        "ys AS (SELECT id, w, h, unnest(generate_series(0, h - 1)) AS y " +
        "FROM dims), " +
        "px AS (SELECT id, w, h, y, unnest(generate_series(0, w - 1)) AS x " +
        "FROM ys), " +
        "v AS (SELECT id, w, h, (y * w + x) % 8 AS bucket, " +
        "(id*31 + x*7 + y*13) % 256 + (id + x*3 + y*5) % 256 " +
        "+ (id*17 + x + y*2) % 256 AS s FROM px), " +
        "ps AS (SELECT id, w, h, bucket, CAST(SUM(s) AS BIGINT) AS psum " +
        "FROM v GROUP BY id, w, h, bucket), " +
        "y8s AS (SELECT id, w, h, unnest(generate_series(0, 7)) AS y8 " +
        "FROM dims), " +
        "p8 AS (SELECT id, w, h, y8, unnest(generate_series(0, 7)) AS x8 " +
        "FROM y8s), " +
        "rs AS (SELECT id, (x8 * w) // 8 AS x, (y8 * h) // 8 AS y " +
        "FROM p8), " +
        "r AS (SELECT id, CAST(SUM((id*31 + x*7 + y*13) % 256 " +
        "+ (id + x*3 + y*5) % 256 + (id*17 + x + y*2) % 256) AS BIGINT) " +
        "AS rsum FROM rs GROUP BY id) " +
        "SELECT ps.id AS media_id, ps.w AS width, ps.h AS height, " +
        "ps.bucket, ps.psum, r.rsum FROM ps JOIN r USING (id) " +
        "ORDER BY media_id, bucket"),
    // grayscale ⇒ every channel equals the red-channel polynomial, so
    // the per-pixel sum is exactly 3·v — no band, no palette model
    "q209_gif_decode" ->
      ("WITH dims AS (SELECT doc_id AS id, 16 + doc_id % 16 AS w, " +
        "16 + doc_id % 8 AS h FROM documents WHERE doc_id < 200), " +
        "ys AS (SELECT id, w, h, unnest(generate_series(0, h - 1)) AS y " +
        "FROM dims), " +
        "px AS (SELECT id, w, h, y, unnest(generate_series(0, w - 1)) AS x " +
        "FROM ys), " +
        "v AS (SELECT id, w, h, (y * w + x) % 8 AS bucket, " +
        "3 * ((id*31 + x*7 + y*13) % 256) AS s FROM px) " +
        "SELECT id AS media_id, w AS width, h AS height, bucket, " +
        "CAST(SUM(s) AS BIGINT) AS psum, 'GIF' AS magic " +
        "FROM v GROUP BY id, w, h, bucket ORDER BY media_id, bucket"),

    // mirrors synthWav's sample polynomial + AudioCodec's resample
    // index arithmetic; the 8000 literal is the real decoded header
    "q79_audio_decode" ->
      ("WITH dims AS (SELECT doc_id AS id, 800 + (doc_id % 5) * 160 AS n " +
        "FROM documents WHERE doc_id < 200), " +
        "sm AS (SELECT id, n, unnest(generate_series(0, n - 1)) AS i " +
        "FROM dims), " +
        "v AS (SELECT id, n, i % 4 AS bucket, " +
        "(id*7919 + i*31) % 65536 - 32768 AS s FROM sm), " +
        "ps AS (SELECT id, n, bucket, CAST(SUM(s) AS BIGINT) AS ssum " +
        "FROM v GROUP BY id, n, bucket), " +
        "r256 AS (SELECT id, n, unnest(generate_series(0, 255)) AS i8 " +
        "FROM dims), " +
        "rs AS (SELECT id, (i8 * n) // 256 AS i FROM r256), " +
        "r AS (SELECT id, CAST(SUM((id*7919 + i*31) % 65536 - 32768) " +
        "AS BIGINT) AS rsum FROM rs GROUP BY id) " +
        "SELECT ps.id AS media_id, CAST(8000 AS BIGINT) AS sample_rate, " +
        "CAST(ps.n AS BIGINT) AS n_samples, ps.bucket, ps.ssum, r.rsum " +
        "FROM ps JOIN r USING (id) ORDER BY media_id, bucket"),
    // decoded sample = the G.711 table literal at the companded-byte
    // polynomial — the engine must reach these through the REAL
    // JDK ULAW->PCM converter over real WAVE containers
    "q302_ulaw_decode" -> {
      val tbl = graft.pipeline.Multimodal.UlawDecodeTable
        .mkString("[", ", ", "]")
      "WITH dims AS (SELECT doc_id AS id, 800 + (doc_id % 5) * 160 AS n " +
        "FROM documents WHERE doc_id < 200), " +
        "sm AS (SELECT id, n, unnest(generate_series(0, n - 1)) AS i " +
        "FROM dims), " +
        s"v AS (SELECT id, n, i % 4 AS bucket, ($tbl)[" +
        "CAST((id * 131 + i * 7) % 256 AS INT) + 1] AS s FROM sm) " +
        "SELECT id AS media_id, CAST(8000 AS BIGINT) AS sample_rate, " +
        "CAST(n AS BIGINT) AS n_samples, bucket, " +
        "CAST(SUM(s) AS BIGINT) AS ssum, " +
        "CAST(MAX(abs(s)) AS BIGINT) AS peak " +
        "FROM v GROUP BY id, n, bucket ORDER BY media_id, bucket"
    },

    // decoded sample = the G.711 A-law table literal at the
    // companded-byte polynomial — the engine must reach these through
    // the REAL JDK ALAW->PCM converter over real WAVE containers
    "q326_alaw_decode" -> {
      val tbl = graft.pipeline.Multimodal.AlawDecodeTable
        .mkString("[", ", ", "]")
      "WITH dims AS (SELECT doc_id AS id, 800 + (doc_id % 5) * 160 AS n " +
        "FROM documents WHERE doc_id < 200), " +
        "sm AS (SELECT id, n, unnest(generate_series(0, n - 1)) AS i " +
        "FROM dims), " +
        s"v AS (SELECT id, n, i % 4 AS bucket, ($tbl)[" +
        "CAST((id * 131 + i * 7) % 256 AS INT) + 1] AS s FROM sm) " +
        "SELECT id AS media_id, CAST(8000 AS BIGINT) AS sample_rate, " +
        "CAST(n AS BIGINT) AS n_samples, bucket, " +
        "CAST(SUM(s) AS BIGINT) AS ssum, " +
        "CAST(MAX(abs(s)) AS BIGINT) AS peak " +
        "FROM v GROUP BY id, n, bucket ORDER BY media_id, bucket"
    },

    // same pixel polynomial, same lag rule — the engine must reach
    // these numbers through the REAL demux/decode
    "q177_scene_cuts" ->
      ("WITH dims AS (SELECT doc_id AS id, 8 + doc_id % 8 AS w, " +
        "8 + doc_id % 4 AS h, 2 + doc_id % 4 AS n " +
        "FROM documents WHERE doc_id < 150), " +
        "fs AS (SELECT id, w, h, unnest(generate_series(0, n - 1)) AS f " +
        "FROM dims), " +
        "ys AS (SELECT id, w, h, f, unnest(generate_series(0, h - 1)) AS y " +
        "FROM fs), " +
        "px AS (SELECT id, w, h, f, y, unnest(generate_series(0, w - 1)) AS x " +
        "FROM ys), " +
        "v AS (SELECT id, w, h, f, " +
        "(id*31 + f*11 + x*7 + y*13) % 256 + (id + f*19 + x*3 + y*5) % 256 " +
        "+ (id*17 + f*7 + x + y*2) % 256 AS s FROM px), " +
        "fr AS (SELECT id, f, w, h, CAST(SUM(s) AS BIGINT) AS fsum " +
        "FROM v GROUP BY id, f, w, h), " +
        "dd AS (SELECT id, f, w, h, abs(fsum - lag(fsum) OVER " +
        "(PARTITION BY id ORDER BY f)) AS pd FROM fr) " +
        "SELECT id AS media_id, count(*) AS n_frames, " +
        "CAST(sum(CASE WHEN pd > w * h * 30 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_cuts FROM dd GROUP BY id ORDER BY media_id"),

    // same PCM polynomial, same exact 160-sample energy grid
    "q178_audio_vad" ->
      ("WITH dims AS (SELECT doc_id AS id, 800 + (doc_id % 5) * 160 AS n " +
        "FROM documents WHERE doc_id < 200), " +
        "sm AS (SELECT id, n, unnest(generate_series(0, n - 1)) AS i " +
        "FROM dims), " +
        "w AS (SELECT id, i // 160 AS win_idx, " +
        "abs((id*7919 + i*31) % 65536 - 32768) AS a FROM sm) " +
        "SELECT id AS media_id, win_idx, CAST(sum(a) AS BIGINT) AS energy, " +
        "CAST(sum(a) AS BIGINT) > 160 * 16384 AS voiced " +
        "FROM w GROUP BY id, win_idx ORDER BY media_id, win_idx"),

    // mirrors synthAvi's per-frame pixel polynomial; the Spark side
    // must reach the same numbers through a real RIFF demux +
    // frameSample over the real container
    "q80_video_decode" ->
      ("WITH dims AS (SELECT doc_id AS id, 8 + doc_id % 8 AS w, " +
        "8 + doc_id % 4 AS h, 2 + doc_id % 4 AS n " +
        "FROM documents WHERE doc_id < 150), " +
        "fs AS (SELECT id, w, h, unnest(generate_series(0, n - 1)) AS f " +
        "FROM dims), " +
        "ys AS (SELECT id, w, h, f, unnest(generate_series(0, h - 1)) AS y " +
        "FROM fs), " +
        "px AS (SELECT id, w, h, f, y, unnest(generate_series(0, w - 1)) AS x " +
        "FROM ys), " +
        "v AS (SELECT id, w, h, f, " +
        "(id*31 + f*11 + x*7 + y*13) % 256 + (id + f*19 + x*3 + y*5) % 256 " +
        "+ (id*17 + f*7 + x + y*2) % 256 AS s FROM px) " +
        "SELECT id AS media_id, f AS frame_idx, f * 40 AS ts_ms, " +
        "CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "CAST(SUM(s) AS BIGINT) AS fsum " +
        "FROM v GROUP BY id, f, w, h ORDER BY media_id, frame_idx"),

    // the container metadata and frame enumeration are exact; the
    // lossy pixel content is gated in-band — band_ok literal TRUE, so
    // one out-of-band decoded pixel anywhere hash-mismatches
    "q201_mjpeg_decode" ->
      ("WITH dims AS (SELECT doc_id AS id, 8 + doc_id % 8 AS w, " +
        "8 + doc_id % 4 AS h, 2 + doc_id % 4 AS n " +
        "FROM documents WHERE doc_id < 100) " +
        "SELECT id AS media_id, unnest(generate_series(0, n - 1)) " +
        "AS frame_idx, unnest(generate_series(0, n - 1)) * 40 AS ts_ms, " +
        "CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "TRUE AS band_ok FROM dims ORDER BY media_id, frame_idx"),

    "q55_doc_chunks" ->
      (s"WITH n0 AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "x AS (SELECT doc_id, toks, len(toks) AS n FROM n0 WHERE len(toks) > 0), " +
        "y AS (SELECT doc_id, toks, n, " +
        "unnest(generate_series(0, (n - 1) // 24)) AS chunk_idx FROM x) " +
        "SELECT doc_id, chunk_idx, chunk_idx * 24 AS start_tok, " +
        "least(CAST(32 AS BIGINT), n - chunk_idx * 24) AS n_tok_chunk, " +
        "md5(array_to_string(toks[(chunk_idx * 24 + 1):(chunk_idx * 24 + 32)], ' ')) " +
        "AS chunk_md5 FROM y ORDER BY doc_id, chunk_idx"),
    "q56_repetition" ->
      (s"WITH n0 AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "g AS (SELECT doc_id, toks, CASE WHEN len(toks) < 2 " +
        "THEN [array_to_string(toks, ' ')] " +
        "ELSE list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) " +
        "END AS grams FROM n0) " +
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok, " +
        "round(1 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE), 6) " +
        "AS dup_tok_ratio, " +
        "round(1 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 6) " +
        "AS dup_2gram_ratio, " +
        "round(list_max(list_transform(list_distinct(toks), " +
        "t -> len(list_filter(toks, x -> x = t)))) / CAST(len(toks) AS DOUBLE), 6) " +
        "AS top_tok_ratio FROM g ORDER BY doc_id"),
    "q57_pii_redact" ->
      ("WITH r AS (SELECT doc_id, text || ' contact user' || " +
        "CAST(doc_id AS VARCHAR) || '@mail.example ph +1-' || " +
        "CAST(doc_id * 7 AS VARCHAR) AS raw FROM documents), " +
        "e AS (SELECT doc_id, " +
        "len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails, " +
        "regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g') AS e1 FROM r) " +
        "SELECT doc_id, n_emails, " +
        "len(regexp_extract_all(e1, '[0-9]+')) AS n_nums, " +
        "md5(regexp_replace(e1, '[0-9]+', '<NUM>', 'g')) AS redacted_md5 " +
        "FROM e ORDER BY doc_id"),
    "q38_neardup_clusters" ->
      (s"WITH RECURSIVE all_docs AS ($dupCte), ${duckShingleCtes("all_docs")}, " +
        s"$duckSigBands, $duckClusterCtes " +
        "SELECT id AS doc_id, min(lbl) AS cluster FROM cc " +
        "GROUP BY id ORDER BY doc_id"),

    // the incremental maintenance path must reach EXACTLY the full
    // q38 recompute — the oracle IS that recompute, verbatim
    "q306_incremental_cc" ->
      (s"WITH RECURSIVE all_docs AS ($dupCte), ${duckShingleCtes("all_docs")}, " +
        s"$duckSigBands, $duckClusterCtes " +
        "SELECT id AS doc_id, min(lbl) AS cluster FROM cc " +
        "GROUP BY id ORDER BY doc_id"),

    // same md5-hashed distinct shingles, same bottom-64 merge
    // arithmetic (list slices over sorted distinct lists), same exact
    // audit joins
    "q303_kmv_sketch" ->
      (s"WITH n AS (SELECT doc_id, source, $duckNorm AS ntext " +
        "FROM documents), " +
        "tk AS (SELECT doc_id, source, string_split(ntext, ' ') AS toks " +
        "FROM n), " +
        "sh0 AS (SELECT doc_id, source, CASE WHEN len(toks) < 3 " +
        "THEN [array_to_string(toks, ' ')] " +
        "ELSE list_transform(range(1, len(toks) - 1), " +
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS sh " +
        "FROM tk), " +
        "shd AS (SELECT DISTINCT source, " +
        "('0x' || substr(md5(t), 1, 8))::BIGINT + 1 AS h FROM " +
        "(SELECT source, unnest(list_distinct(sh)) AS t FROM sh0)), " +
        "skt AS (SELECT source, count(*) AS n_h, " +
        "list_sort(list(h))[1:64] AS vals FROM shd GROUP BY 1), " +
        "pr AS (SELECT a.source AS src_a, b.source AS src_b, " +
        "list_sort(list_distinct(a.vals || b.vals)) AS u, " +
        "a.vals AS va, b.vals AS vb " +
        "FROM skt a JOIN skt b ON a.source < b.source), " +
        "est AS (SELECT src_a, src_b, len(u) AS nu, " +
        "u[least(len(u), 64)] AS theta, " +
        "len(list_intersect(u[1:least(len(u), 64)], " +
        "list_intersect(va, vb))) AS rho FROM pr), " +
        "estv AS (SELECT src_a, src_b, " +
        "CASE WHEN nu >= 64 THEN 270582939648 // theta " +
        "ELSE nu END AS est_union, rho, nu FROM est), " +
        "ex AS (SELECT a.source AS src_a, b.source AS src_b, " +
        "count(*) AS exact_inter FROM shd a JOIN shd b " +
        "ON b.h = a.h AND a.source < b.source GROUP BY 1, 2), " +
        "nx AS (SELECT source, count(*) AS n FROM shd GROUP BY 1) " +
        "SELECT e.src_a, e.src_b, CAST(e.est_union AS BIGINT) AS est_union, " +
        "CAST(CASE WHEN e.nu >= 64 THEN e.rho * e.est_union // 64 " +
        "ELSE e.rho END AS BIGINT) AS est_inter, " +
        "CAST(na.n + nb.n - COALESCE(ex.exact_inter, 0) AS BIGINT) " +
        "AS exact_union, " +
        "CAST(COALESCE(ex.exact_inter, 0) AS BIGINT) AS exact_inter " +
        "FROM estv e " +
        "JOIN nx na ON na.source = e.src_a " +
        "JOIN nx nb ON nb.source = e.src_b " +
        "LEFT JOIN ex ON ex.src_a = e.src_a AND ex.src_b = e.src_b " +
        "ORDER BY e.src_a, e.src_b"),

    // same md5 bucket/sign split, same signed-count fold
    "q304_feature_hashing" ->
      (s"WITH n0 AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "t AS (SELECT doc_id, unnest(toks) AS tok FROM n0), " +
        "hh AS (SELECT doc_id, " +
        "('0x' || substr(md5('fh:' || tok), 1, 8))::BIGINT AS h FROM t), " +
        "bv AS (SELECT doc_id, h % 64 AS bucket, " +
        "SUM(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) AS v " +
        "FROM hh GROUP BY 1, 2), " +
        "nz AS (SELECT * FROM bv WHERE v <> 0) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS nnz, " +
        "CAST(SUM(v * v) AS BIGINT) AS l2sq, " +
        "CAST(SUM(abs(v)) AS BIGINT) AS l1 " +
        "FROM nz GROUP BY 1 ORDER BY doc_id"),

    // same per-dim min/max micros, same integer quantize/dequant grid
    "q305_int8_quant" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb " +
        "FROM embeddings), " +
        "x AS (SELECT vec_id, generate_subscripts(emb, 1) AS dim, " +
        "CAST(round(round(unnest(emb), 6) * 1000000) AS BIGINT) AS xm " +
        "FROM e), " +
        "st AS (SELECT dim, min(xm) AS mn, max(xm) AS mx FROM x " +
        "GROUP BY 1), " +
        "j AS (SELECT vec_id, xm, mn, mx, CASE WHEN mx > mn " +
        "THEN (xm - mn) * 255 // (mx - mn) ELSE 0 END AS q " +
        "FROM x JOIN st USING (dim)), " +
        "d2 AS (SELECT vec_id, xm - (mn + q * (mx - mn) // 255) AS err " +
        "FROM j) " +
        "SELECT vec_id, CAST(SUM(err * err) AS BIGINT) AS err_sq_sum, " +
        "CAST(MAX(abs(err)) AS BIGINT) AS max_abs_err " +
        "FROM d2 GROUP BY 1 ORDER BY vec_id"),

    // same per-band distinct pairing, same jaccard threshold
    "q232_lsh_band_audit" ->
      (s"WITH RECURSIVE all_docs AS ($dupCte), " +
        s"${duckShingleCtes("all_docs")}, $duckSigBandCtes, " +
        "cand AS (SELECT DISTINCT a.band, a.doc_id AS doc_a, " +
        "b.doc_id AS doc_b FROM bands a JOIN bands b " +
        "ON a.band = b.band AND a.bkey = b.bkey " +
        "AND a.doc_id < b.doc_id), " +
        "v AS (SELECT c.band, CASE WHEN " +
        "round(len(list_intersect(sa.sh, sb.sh)) / " +
        "CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 6) >= 0.8 " +
        "THEN 1 ELSE 0 END AS ok FROM cand c " +
        "JOIN sh sa ON sa.doc_id = c.doc_a " +
        "JOIN sh sb ON sb.doc_id = c.doc_b) " +
        "SELECT CAST(band AS BIGINT) AS band, " +
        "CAST(count(*) AS BIGINT) AS n_candidates, " +
        "CAST(SUM(ok) AS BIGINT) AS n_verified, " +
        "CAST(SUM(ok) * 1000000 // count(*) AS BIGINT) AS precision_micro " +
        "FROM v GROUP BY band ORDER BY band"),

    // same pinned sizing factors, same exact integer ceil/round
    "q321_bloom_planner" ->
      (s"WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs " +
        "FROM documents GROUP BY 1), " +
        s"m AS (SELECT source, n_docs, (n_docs * $BloomBitsFactorMicro " +
        "+ 999999) // 1000000 AS m_bits FROM g) " +
        "SELECT source, n_docs, CAST(m_bits AS BIGINT) AS m_bits, " +
        "CAST((m_bits * 693147 + n_docs * 500000) // " +
        "(n_docs * 1000000) AS BIGINT) AS k_hashes, " +
        "CAST((m_bits + 7) // 8 AS BIGINT) AS bytes " +
        "FROM m ORDER BY source"),

    // same HRW argmax (h DESC, shard ASC) over both shard sets
    "q318_rendezvous_shards" ->
      ("WITH g AS (SELECT doc_id, unnest(generate_series(0, 8)) AS shard " +
        "FROM documents), " +
        "h AS (SELECT doc_id, shard, ('0x' || substr(md5('hrw:' || " +
        "CAST(doc_id AS VARCHAR) || ':' || CAST(shard AS VARCHAR)), " +
        "1, 15))::BIGINT AS h FROM g), " +
        "o8 AS (SELECT doc_id, shard AS old_shard FROM (" +
        "SELECT doc_id, shard, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY h DESC, shard) AS rn FROM h WHERE shard < 8) " +
        "WHERE rn = 1), " +
        "o9 AS (SELECT doc_id, shard AS new_shard FROM (" +
        "SELECT doc_id, shard, row_number() OVER (PARTITION BY doc_id " +
        "ORDER BY h DESC, shard) AS rn FROM h) WHERE rn = 1) " +
        "SELECT old_shard, new_shard, CAST(count(*) AS BIGINT) AS n_docs, " +
        "old_shard <> new_shard AS moved " +
        "FROM o8 JOIN o9 USING (doc_id) " +
        "GROUP BY 1, 2, 4 ORDER BY old_shard, new_shard"),

    // same shingle tf, same df cut, same centi-log weights, same
    // sqrt-free Dice fold and best-neighbor rule
    "q313_tfidf_knn" ->
      (s"WITH ${duckShingleCtes("documents")}, " +
        "tm AS (SELECT doc_id, t, count(*) AS tf FROM (" +
        "SELECT doc_id, unnest(sh) AS t FROM sh) GROUP BY 1, 2), " +
        "dfb AS (SELECT t, count(*) AS df FROM tm GROUP BY 1 " +
        "HAVING count(*) BETWEEN 2 AND 20), " +
        "w AS (SELECT tm.doc_id, tm.t, tm.tf * (" +
        "CAST(floor(ln((SELECT count(*) FROM documents)) * 100) AS BIGINT) " +
        "- CAST(floor(ln(dfb.df) * 100) AS BIGINT)) AS w " +
        "FROM tm JOIN dfb USING (t)), " +
        "nr AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS nrm FROM w " +
        "GROUP BY 1), " +
        "nm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(SUM(a.w * b.w) AS BIGINT) AS num FROM w a " +
        "JOIN w b ON b.t = a.t AND a.doc_id <> b.doc_id GROUP BY 1, 2), " +
        "sc AS (SELECT doc_a, doc_b, CAST(2 * num * 1000000 // " +
        "(na.nrm + nb.nrm) AS BIGINT) AS dice_micro FROM nm " +
        "JOIN nr na ON na.doc_id = nm.doc_a " +
        "JOIN nr nb ON nb.doc_id = nm.doc_b), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_a " +
        "ORDER BY dice_micro DESC, doc_b) AS rn FROM sc) " +
        "SELECT doc_a AS doc_id, doc_b AS nn_doc, dice_micro FROM r " +
        "WHERE rn = 1 AND dice_micro >= 10000 ORDER BY doc_id"),

    // IVF assignment replayed (√N first-k centroids, lowest-cid
    // ties), per-bucket majority by (count DESC, label ASC)
    "q308_cluster_purity" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label " +
        "FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < " +
        "CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)), " +
        "assign AS (SELECT vec_id, cid AS bucket FROM (" +
        "SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn " +
        "FROM e, c) WHERE rn = 1), " +
        "g AS (SELECT a.bucket, e.label, count(*) AS nbl FROM assign a " +
        "JOIN e ON e.vec_id = a.vec_id GROUP BY 1, 2), " +
        "r AS (SELECT bucket, label, nbl, row_number() OVER (" +
        "PARTITION BY bucket ORDER BY nbl DESC, label) AS rn, " +
        "SUM(nbl) OVER (PARTITION BY bucket) AS n FROM g) " +
        "SELECT bucket, CAST(n AS BIGINT) AS n, label AS top_label, " +
        "CAST(nbl * 1000000 // n AS BIGINT) AS purity_micro " +
        "FROM r WHERE rn = 1 ORDER BY bucket"
    },

    // same grid counts, same micro-log-of-exact-ratio arithmetic
    "q309_cluster_nmi" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      val ml = (x: String) =>
        s"CAST(floor(ln($x) * 1000000) AS BIGINT)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label " +
        "FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < " +
        "CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)), " +
        "assign AS (SELECT vec_id, cid AS bucket FROM (" +
        "SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn " +
        "FROM e, c) WHERE rn = 1), " +
        "grid AS (SELECT a.bucket, e.label, count(*) AS nij FROM assign a " +
        "JOIN e ON e.vec_id = a.vec_id GROUP BY 1, 2), " +
        "nb AS (SELECT bucket, CAST(SUM(nij) AS BIGINT) AS ni FROM grid " +
        "GROUP BY 1), " +
        "nl AS (SELECT label, CAST(SUM(nij) AS BIGINT) AS nj FROM grid " +
        "GROUP BY 1), " +
        "tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM grid), " +
        "i_s AS (SELECT CAST(SUM(g.nij * " +
        s"(${ml("t.n * g.nij")} - ${ml("nb.ni * nl.nj")})) AS BIGINT) " +
        "AS i_scaled FROM grid g JOIN nb USING (bucket) " +
        "JOIN nl USING (label) CROSS JOIN tot t), " +
        s"hb AS (SELECT CAST(SUM(ni * (${ml("t.n")} - ${ml("ni")})) " +
        "AS BIGINT) AS h_bucket FROM nb CROSS JOIN tot t), " +
        s"hl AS (SELECT CAST(SUM(nj * (${ml("t.n")} - ${ml("nj")})) " +
        "AS BIGINT) AS h_label FROM nl CROSS JOIN tot t) " +
        "SELECT t.n, i_s.i_scaled, hb.h_bucket, hl.h_label, " +
        "CAST(2 * i_s.i_scaled * 1000000 // (hb.h_bucket + hl.h_label) " +
        "AS BIGINT) AS nmi_micro " +
        "FROM tot t CROSS JOIN i_s CROSS JOIN hb CROSS JOIN hl"
    },

    // same 5-query ranking, same exact prec@k folds
    "q310_avg_precision" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label " +
        "FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, emb AS qemb, label AS qlabel FROM e " +
        "WHERE vec_id < 5), " +
        "s AS (SELECT q.qid, e.vec_id, " +
        s"CAST(round(${cos("e.emb", "q.qemb")} * 1000000) AS BIGINT) AS cm, " +
        "CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel " +
        "FROM e, q WHERE e.vec_id >= 5), " +
        "r AS (SELECT qid, rel, row_number() OVER (PARTITION BY qid " +
        "ORDER BY cm DESC, vec_id) AS rank, " +
        "SUM(rel) OVER (PARTITION BY qid ORDER BY cm DESC, vec_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM s) " +
        "SELECT qid, CAST(SUM(rel) AS BIGINT) AS n_pos, " +
        "CAST(CASE WHEN SUM(rel) > 0 THEN " +
        "CAST(SUM(CASE WHEN rel = 1 THEN cum * 1000000 // rank " +
        "ELSE 0 END) AS BIGINT) // SUM(rel) ELSE 0 END AS BIGINT) " +
        "AS ap_micro, " +
        "CAST(SUM(CASE WHEN rank <= 10 THEN rel ELSE 0 END) * 1000000 " +
        "// 10 AS BIGINT) AS p10_micro " +
        "FROM r GROUP BY 1 ORDER BY qid"
    },

    // q176's in-bucket top-3 replay + majority vote by
    // (count DESC, label ASC), per-true-label accuracy
    "q311_knn_label_acc" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb, label " +
        "FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < " +
        "CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)), " +
        "assign AS (SELECT vec_id, emb, cid AS bucket FROM (" +
        "SELECT e.vec_id, e.emb, c.cid, row_number() OVER (PARTITION BY " +
        s"e.vec_id ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn " +
        "FROM e, c) WHERE rn = 1), " +
        "knn AS (SELECT id_a, id_b FROM (SELECT a.vec_id AS id_a, " +
        "b.vec_id AS id_b, row_number() OVER (PARTITION BY a.vec_id " +
        s"ORDER BY CAST(round(${cos("a.emb", "b.emb")} * 1000000) " +
        "AS BIGINT) DESC, b.vec_id) AS rk " +
        "FROM assign a JOIN assign b ON a.bucket = b.bucket " +
        "AND a.vec_id <> b.vec_id) WHERE rk <= 3), " +
        "votes AS (SELECT k.id_a, e.label AS nn_label, count(*) AS cnt " +
        "FROM knn k JOIN e ON e.vec_id = k.id_b GROUP BY 1, 2), " +
        "pred AS (SELECT id_a, nn_label AS pred FROM (SELECT id_a, " +
        "nn_label, row_number() OVER (PARTITION BY id_a " +
        "ORDER BY cnt DESC, nn_label) AS rn FROM votes) WHERE rn = 1) " +
        "SELECT e.label, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(SUM(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_correct, " +
        "CAST(SUM(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) " +
        "* 1000000 // count(*) AS BIGINT) AS acc_micro " +
        "FROM pred p JOIN e ON e.vec_id = p.id_a " +
        "GROUP BY 1 ORDER BY e.label"
    },

    // same md5 uniform, same micro-log difference with the pinned
    // denominator literal, same truncating division by weight
    "q307_weighted_reservoir" ->
      ("WITH sc AS (SELECT doc_id, source, n_chars, " +
        "('0x' || substr(md5('ares:' || CAST(doc_id AS VARCHAR)), 1, 8))" +
        "::BIGINT % 1000000 + 1 AS num FROM documents), " +
        "k AS (SELECT source, doc_id, " +
        s"(CAST(floor(ln(num) * 1000000) AS BIGINT) - $AresLnDen) " +
        "// n_chars AS key FROM sc), " +
        "r AS (SELECT source, doc_id, key, row_number() OVER (" +
        "PARTITION BY source ORDER BY key DESC, doc_id) AS rank FROM k) " +
        "SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, " +
        "key AS key_micro FROM r WHERE rank <= 8 ORDER BY source, rank"),
    "q88_neardup_prune" ->
      (s"WITH RECURSIVE all_docs AS ($dupCte), ${duckShingleCtes("all_docs")}, " +
        s"$duckSigBands, $duckClusterCtes, " +
        "lab AS (SELECT id, min(lbl) AS cluster FROM cc GROUP BY id) " +
        "SELECT min(id) AS keep_id, COUNT(*) AS n_members FROM lab " +
        "GROUP BY cluster ORDER BY keep_id"),
    // q38's cluster chain + the q88 keeper rule, token counts on the
    // identical normalizer, same per-source fold
    "q289_dedup_savings" ->
      (s"WITH RECURSIVE all_docs AS ($dupCte), ${duckShingleCtes("all_docs")}, " +
        s"$duckSigBands, $duckClusterCtes, " +
        "lab AS (SELECT id AS doc_id, min(lbl) AS cluster FROM cc " +
        "GROUP BY id), " +
        "nt AS (SELECT doc_id, CAST(len(string_split(" +
        "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) " +
        "AS BIGINT) AS ntok, doc_id % 100000 AS orig FROM all_docs), " +
        "sr AS (SELECT doc_id AS orig, source FROM documents), " +
        "kp AS (SELECT cluster, MIN(doc_id) AS keeper FROM lab " +
        "GROUP BY 1), " +
        "m AS (SELECT lab.doc_id, lab.cluster, nt.ntok, sr.source, " +
        "kp.keeper FROM lab JOIN nt USING (doc_id) " +
        "JOIN sr USING (orig) JOIN kp USING (cluster)) " +
        "SELECT source, COUNT(*) AS docs_total, " +
        "CAST(SUM(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS docs_kept, " +
        "CAST(SUM(ntok) AS BIGINT) AS tokens_total, " +
        "CAST(SUM(CASE WHEN doc_id = keeper THEN ntok ELSE 0 END) " +
        "AS BIGINT) AS tokens_kept, " +
        "CAST((SUM(ntok) - SUM(CASE WHEN doc_id = keeper THEN ntok " +
        "ELSE 0 END)) * 1000000 // SUM(ntok) AS BIGINT) " +
        "AS savings_micro FROM m GROUP BY source ORDER BY source"),
    "q39_token_quality" ->
      ("SELECT event_id, " +
        "len(regexp_extract_all(props, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) " +
        "AS n_bpe_tok, " +
        "len(regexp_split_to_array(trim(props), '\\s+')) AS n_ws_tok, " +
        "round(len(regexp_extract_all(props, '[0-9]')) / " +
        "CAST(length(props) AS DOUBLE), 6) AS digit_ratio, " +
        "round(len(regexp_extract_all(props, '[^A-Za-z0-9\\s]')) / " +
        "CAST(length(props) AS DOUBLE), 6) AS sym_ratio " +
        "FROM events ORDER BY event_id"),
    "q40_pack_chunks" ->
      (s"WITH n AS (SELECT doc_id, len(string_split($duckNorm, ' ')) AS ntok " +
        "FROM documents), " +
        "cum AS (SELECT doc_id, ntok, CAST(sum(ntok) OVER (ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS BIGINT) " +
        "AS strt FROM n), " +
        "x AS (SELECT doc_id, strt, strt + ntok AS fin, strt // 512 AS c0, " +
        "(strt + ntok - 1) // 512 AS c1 FROM cum WHERE ntok > 0), " +
        "y AS (SELECT doc_id, strt, fin, " +
        "unnest(generate_series(c0, c1)) AS chunk_id FROM x) " +
        "SELECT doc_id, chunk_id, " +
        "CAST(least(fin, (chunk_id + 1) * 512) - greatest(strt, chunk_id * 512) " +
        "AS BIGINT) AS n_tok FROM y ORDER BY doc_id, chunk_id"),
    "q43_corpus_mix" ->
      ("WITH t AS (SELECT doc_id, source, " +
        "10 * (1 + (CAST(substr(source, 4) AS INT) % 10)) AS rate, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 " +
        "AS bucket FROM documents) " +
        "SELECT doc_id, source, rate FROM t WHERE bucket < rate ORDER BY doc_id"),
    "q86_dup_spans" ->
      (s"WITH nn AS (SELECT doc_id, $duckNorm AS ntext FROM documents), " +
        "tk AS (SELECT doc_id, string_split(ntext, ' ') AS toks FROM nn), " +
        "g AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 3 " +
        "THEN [array_to_string(toks, ' ')] " +
        "ELSE list_transform(range(1, len(toks) - 1), " +
        "i -> array_to_string(toks[i:i+2], ' ')) END) AS sh FROM tk) " +
        "SELECT sh, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ " +
        "FROM g GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2 " +
        "ORDER BY n_docs DESC, n_occ DESC, sh LIMIT 100"),
    "q52_decontaminate" ->
      (s"WITH nn AS (SELECT doc_id, $duckNorm AS ntext FROM documents), " +
        "tk AS (SELECT doc_id, string_split(ntext, ' ') AS toks FROM nn), " +
        "sh AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 4 " +
        "THEN [array_to_string(toks, ' ')] " +
        "ELSE list_transform(range(1, len(toks) - 2), " +
        "i -> array_to_string(toks[i:i+3], ' ')) END) AS s FROM tk), " +
        "ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id < 50), " +
        "tr AS (SELECT doc_id AS train_id, s FROM sh WHERE doc_id >= 50) " +
        "SELECT DISTINCT train_id, eval_id FROM tr JOIN ev USING (s) " +
        "ORDER BY train_id, eval_id"),
    // bloom prefilter is lossless (no false negatives), so the pairs
    // are q52's exactly; the sketch audit booleans are TRUE by design
    "q104_bloom_decontaminate" ->
      (s"WITH nn AS (SELECT doc_id, $duckNorm AS ntext FROM documents), " +
        "tk AS (SELECT doc_id, string_split(ntext, ' ') AS toks FROM nn), " +
        "sh AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 4 " +
        "THEN [array_to_string(toks, ' ')] " +
        "ELSE list_transform(range(1, len(toks) - 2), " +
        "i -> array_to_string(toks[i:i+3], ' ')) END) AS s FROM tk), " +
        "ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id < 50), " +
        "tr AS (SELECT doc_id AS train_id, s FROM sh WHERE doc_id >= 50) " +
        "SELECT DISTINCT train_id, eval_id, TRUE AS fn_free, " +
        "TRUE AS fp_in_band FROM tr JOIN ev USING (s) " +
        "ORDER BY train_id, eval_id"),
    "q105_inverted_index" ->
      (s"WITH nn AS (SELECT doc_id, $duckNorm AS ntext FROM documents), " +
        "t AS (SELECT DISTINCT doc_id, unnest(string_split(ntext, ' ')) " +
        "AS token FROM nn), " +
        "w AS (SELECT token, doc_id, " +
        "row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY token) AS df FROM t) " +
        "SELECT token, df, " +
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS head " +
        "FROM w WHERE rn <= 32 GROUP BY token, df ORDER BY token"),
    // brute-force length-banded verify join — algorithm-independent
    // ground truth for the Pass-Join candidate generation
    "q108_passjoin_editdist" ->
      (s"WITH p AS (SELECT doc_id, substr($duckNorm, 1, 30) AS s " +
        "FROM documents), " +
        "m AS (SELECT CASE WHEN length(s) >= doc_id % 15 + 3 " +
        "THEN substr(s, 1, doc_id % 15 + 2) || 'q' || " +
        "substr(s, doc_id % 15 + 4) ELSE s END AS s FROM p), " +
        "u AS (SELECT DISTINCT s FROM " +
        "(SELECT s FROM p UNION ALL SELECT s FROM m)) " +
        "SELECT a.s AS a_s, b.s AS b_s, " +
        "CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist " +
        "FROM u a JOIN u b ON a.s < b.s " +
        "AND abs(length(a.s) - length(b.s)) <= 2 " +
        "WHERE levenshtein(a.s, b.s) <= 2 ORDER BY a_s, b_s"),
    "q106_editdist_pairs" ->
      ("SELECT a.p_partkey AS a_key, b.p_partkey AS b_key, " +
        "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist " +
        "FROM part a JOIN part b ON a.p_brand = b.p_brand " +
        "AND a.p_type = b.p_type " +
        "AND a.p_partkey < b.p_partkey " +
        "AND abs(length(a.p_name) - length(b.p_name)) <= 2 " +
        "WHERE levenshtein(a.p_name, b.p_name) <= 2 " +
        "ORDER BY a_key, b_key"),
    "q114_kl_divergence" ->
      (s"WITH tk AS (SELECT source, unnest(string_split($duckNorm, ' ')) AS t " +
        "FROM documents), " +
        "st AS (SELECT source, t, count(*) AS c FROM tk GROUP BY 1, 2), " +
        "ct AS (SELECT t, CAST(sum(c) AS BIGINT) AS cc FROM st GROUP BY 1), " +
        "srct AS (SELECT source, CAST(sum(c) AS BIGINT) AS ts " +
        "FROM st GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(ts) AS BIGINT) AS tt FROM srct), " +
        "term AS (SELECT st.source, srct.ts, st.c * " +
        "CAST(FLOOR((ln(st.c) + ln(tot.tt) - ln(ct.cc) - ln(srct.ts)) " +
        "* 1000000) AS BIGINT) AS term " +
        "FROM st JOIN ct USING (t) JOIN srct USING (source) CROSS JOIN tot) " +
        "SELECT source, max(ts) AS n_tokens, " +
        "CAST(sum(term) AS BIGINT) AS kl_sum_micro " +
        "FROM term GROUP BY source ORDER BY source"),
    "q115_pagerank" -> {
      val base =
        "WITH e AS (SELECT CAST(s.s_nationkey AS BIGINT) AS src, " +
          "CAST(c.c_nationkey AS BIGINT) AS dst, count(*) AS w " +
          "FROM lineitem l " +
          "JOIN orders o ON l.l_orderkey = o.o_orderkey " +
          "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
          "JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY 1, 2), " +
          "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
          "nn AS (SELECT count(*) AS n FROM nodes), " +
          "ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw " +
          "FROM e GROUP BY 1), " +
          "r0 AS (SELECT node, CAST(1000000000000 // n AS BIGINT) AS r " +
          "FROM nodes CROSS JOIN nn)"
      val iters = (1 to 5).map { i =>
        s"r$i AS (SELECT nodes.node, " +
          "CAST((150000000000 // n) + (85 * COALESCE(c.s, 0)) // 100 " +
          "AS BIGINT) AS r " +
          "FROM nodes CROSS JOIN nn LEFT JOIN " +
          s"(SELECT e.dst, sum((p.r // ow.outw) * e.w) AS s " +
          s"FROM r${i - 1} p JOIN e ON p.node = e.src " +
          "JOIN ow ON e.src = ow.src GROUP BY e.dst) c " +
          "ON nodes.node = c.dst)"
      }.mkString(", ")
      s"$base, $iters SELECT node, r FROM r5 ORDER BY node"
    },
    "q116_bottomk_sample" ->
      ("SELECT doc_id, h FROM (SELECT doc_id, " +
        "md5('bk:' || CAST(doc_id AS VARCHAR)) AS h FROM documents " +
        "ORDER BY h LIMIT 50) ORDER BY doc_id"),
    // naive all-pairs over shared shingles: the prefix filter is
    // lossless, so the oracle need not replicate it — exact Jaccard
    // over distinct shingle sets IS the full answer
    "q117_ppjoin_jaccard" ->
      (s"WITH d AS ($dupCte), $duckShingleSetCtes, " +
        "j AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
        "FROM e a JOIN e b ON a.t = b.t AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "f AS (SELECT a_id, b_id, inter, " +
        "inter / (sa.sz + sb.sz - inter) AS jr FROM j " +
        "JOIN sz sa ON j.a_id = sa.doc_id JOIN sz sb ON j.b_id = sb.doc_id) " +
        "SELECT a_id, b_id, CAST(inter AS BIGINT) AS inter, " +
        "round(jr, 6) AS jacc FROM f WHERE jr >= 0.8 ORDER BY a_id, b_id"),
    // naive all-ordered-pairs oracle: the asymmetric prefix filter is
    // lossless, so exact containment over shared shingles IS the answer
    "q121_containment_join" ->
      (s"WITH d AS ($dupCte), $duckShingleSetCtes, " +
        "j AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter " +
        "FROM e a JOIN e b ON a.t = b.t AND a.doc_id <> b.doc_id GROUP BY 1, 2), " +
        "f AS (SELECT a_id, b_id, inter, inter / sa.sz AS cr FROM j " +
        "JOIN sz sa ON j.a_id = sa.doc_id) " +
        "SELECT a_id, b_id, CAST(inter AS BIGINT) AS inter, " +
        "round(cr, 6) AS containment FROM f WHERE cr >= 0.9 " +
        "ORDER BY a_id, b_id"),
    "q123_pmi_collocations" ->
      (s"WITH dd AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "uni AS (SELECT w, count(*) AS c1 FROM " +
        "(SELECT unnest(toks) AS w FROM dd) GROUP BY 1), " +
        "bi AS (SELECT bigram, count(*) AS c12 FROM " +
        "(SELECT unnest(list_transform(range(1, len(toks)), " +
        "i -> toks[i] || ' ' || toks[i+1])) AS bigram " +
        "FROM dd WHERE len(toks) >= 2) GROUP BY 1), " +
        "tt AS (SELECT CAST(sum(c1) AS BIGINT) AS t FROM uni), " +
        "bb AS (SELECT CAST(sum(c12) AS BIGINT) AS b FROM bi) " +
        "SELECT bigram, c12, " +
        "CAST(FLOOR((ln(c12) + 2 * ln(t) - ln(b) - ln(ca.c1) - ln(cb.c1)) " +
        "* 1000000) AS BIGINT) AS pmi_micro " +
        "FROM bi JOIN uni ca ON string_split(bigram, ' ')[1] = ca.w " +
        "JOIN uni cb ON string_split(bigram, ' ')[2] = cb.w " +
        "CROSS JOIN tt CROSS JOIN bb " +
        "ORDER BY c12 DESC, bigram LIMIT 20"),
    "q125_cooccurrence" ->
      (s"WITH tk AS (SELECT doc_id, unnest(list_distinct(" +
        s"string_split($duckNorm, ' '))) AS t FROM documents), " +
        "dfc AS (SELECT t, count(*) AS df FROM tk GROUP BY 1), " +
        "f AS (SELECT tk.doc_id, tk.t FROM tk JOIN dfc USING (t) " +
        "WHERE dfc.df >= 10), " +
        "p AS (SELECT a.t AS t1, b.t AS t2, count(*) AS n " +
        "FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.t < b.t " +
        "GROUP BY 1, 2) " +
        "SELECT t1, t2, n FROM p WHERE n >= 10 " +
        "ORDER BY n DESC, t1, t2 LIMIT 30"),
    "q126_train_split" ->
      ("SELECT doc_id, source, CASE WHEN b < 80 THEN 'train' " +
        "WHEN b < 90 THEN 'val' ELSE 'test' END AS split FROM " +
        "(SELECT doc_id, source, " +
        "('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))" +
        "::BIGINT % 100 AS b FROM documents) ORDER BY doc_id"),
    "q118_weighted_sample" ->
      ("SELECT doc_id, n_chars, " +
        "CAST(floor(k * 1e12) AS BIGINT) AS key_pico FROM " +
        "(SELECT doc_id, n_chars, -ln(u) / n_chars AS k FROM " +
        "(SELECT doc_id, n_chars, " +
        "(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT " +
        "+ 1) / 4294967297.0 AS u FROM documents) " +
        "ORDER BY k, doc_id LIMIT 50) ORDER BY doc_id"),
    "q48_multimodal_meta" ->
      ("SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes, " +
        "md5(text) AS payload_md5 FROM documents ORDER BY media_id"),
    "q49_frame_sample" ->
      ("WITH v AS (SELECT doc_id AS media_id, " +
        "greatest(1, n_chars // 100) AS n_frames FROM documents), " +
        "f AS (SELECT media_id, " +
        "unnest(generate_series(0, n_frames - 1)) AS frame_idx FROM v) " +
        "SELECT media_id, CAST(frame_idx AS INT) AS frame_idx, " +
        "frame_idx * 100 AS ts_ms FROM f ORDER BY media_id, frame_idx"),
    "q45_range_join" ->
      ("WITH o AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t " +
        "FROM events) " +
        "SELECT a.event_id AS event_a, b.event_id AS event_b " +
        "FROM o a JOIN o b ON a.user_id = b.user_id " +
        "AND b.t >= a.t AND b.t < a.t + 43200000000 " +
        "AND a.event_id <> b.event_id ORDER BY event_a, event_b"),
    "q46_skew_join" ->
      ("WITH st AS (SELECT event_type, COUNT(*) AS type_n, " +
        "ROUND(AVG(value), 6) AS type_avg FROM events GROUP BY event_type) " +
        "SELECT e.event_id, e.event_type, st.type_n, st.type_avg " +
        "FROM events e JOIN st USING (event_type) ORDER BY event_id"),
    "q13_dedup_exact" ->
      (s"WITH all_docs AS ($dupCte), " +
        s"f AS (SELECT doc_id, md5($duckNorm) AS fp FROM all_docs) " +
        "SELECT min(doc_id) AS doc_id, fp FROM f GROUP BY fp ORDER BY doc_id"),
    "q14_text_stats" ->
      (s"WITH n AS (SELECT doc_id, $duckNorm AS ntext FROM documents), " +
        "t AS (SELECT doc_id, ntext, len(string_split(ntext, ' ')) AS n_tokens, " +
        "len(list_filter(string_split(ntext, ' '), " +
        "t -> list_contains(['the','a'], t))) AS n_stop FROM n) " +
        "SELECT doc_id, n_tokens, " +
        "round((length(ntext) - n_tokens + 1) / CAST(n_tokens AS DOUBLE), 6) " +
        "AS avg_tok_len, " +
        "round(n_stop / CAST(n_tokens AS DOUBLE), 6) AS stop_ratio " +
        "FROM t ORDER BY doc_id"),
    "q15_lang_id" ->
      (s"WITH t AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "sc AS (SELECT doc_id, " +
        "len(list_filter(toks, t -> list_contains(['the','a','and','of'], t))) AS s_en, " +
        "len(list_filter(toks, t -> list_contains(['der','die','das','und'], t))) AS s_de, " +
        "len(list_filter(toks, t -> list_contains(['el','los','las','y'], t))) AS s_es, " +
        "len(list_filter(toks, t -> list_contains(['le','les','et','du'], t))) AS s_fr " +
        "FROM t) " +
        "SELECT doc_id, CASE " +
        "WHEN s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0 THEN 'en' " +
        "WHEN s_de >= greatest(s_es, s_fr) AND s_de > 0 THEN 'de' " +
        "WHEN s_es >= s_fr AND s_es > 0 THEN 'es' " +
        "WHEN s_fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred, " +
        "s_en, s_de, s_es, s_fr FROM sc ORDER BY doc_id"),
    "q16_cosine_topk" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 5), " +
        "sims AS (SELECT q.qid, e.vec_id, " +
        "round(list_dot_product(e.emb, q.qemb) / " +
        "(sqrt(list_dot_product(e.emb, e.emb)) * sqrt(list_dot_product(q.qemb, q.qemb))), 6) AS sim " +
        "FROM e, q WHERE e.vec_id <> q.qid), " +
        "ranked AS (SELECT *, row_number() OVER " +
        "(PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn FROM sims) " +
        "SELECT qid, vec_id, sim FROM ranked WHERE rn <= 10 ORDER BY qid, vec_id"),
    "q17_minhash_neardup" ->
      (s"WITH all_docs AS ($dupCte), ${duckShingleCtes("all_docs")}, " +
        s"$duckSigBands " +
        "SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b"),
    "q18_jaccard_neardup" ->
      (s"WITH all_docs AS ($dupCte), ${duckShingleCtes("all_docs")}, " +
        s"$duckSigBands " +
        "SELECT * FROM (SELECT c.doc_a, c.doc_b, " +
        "round(len(list_intersect(sa.sh, sb.sh)) / " +
        "CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 6) AS jacc " +
        "FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a " +
        "JOIN sh sb ON sb.doc_id = c.doc_b) " +
        "WHERE jacc >= 0.8 ORDER BY doc_a, doc_b"),
    "q22_ann_ivf" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16), " +
        "assign AS (SELECT vec_id, emb, cid AS bucket FROM (" +
        s"SELECT e.vec_id, e.emb, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn FROM e, c) WHERE rn = 1), " +
        "q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 5), " +
        "probes AS (SELECT qid, qemb, cid AS bucket FROM (" +
        s"SELECT q.qid, q.qemb, c.cid, row_number() OVER (PARTITION BY q.qid " +
        s"ORDER BY ${cos("q.qemb", "c.cemb")} DESC, c.cid) AS rn FROM q, c) WHERE rn <= 4), " +
        s"cand AS (SELECT p.qid, a.vec_id, ${cos("a.emb", "p.qemb")} AS sim " +
        "FROM assign a JOIN probes p ON a.bucket = p.bucket WHERE a.vec_id <> p.qid), " +
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY qid " +
        "ORDER BY sim DESC, vec_id) AS rn FROM cand) " +
        "SELECT qid, vec_id, sim FROM ranked WHERE rn <= 10 ORDER BY qid, vec_id"
    },
    "q36_ann_trained" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      // assign each vector to its nearest centroid (ties: lowest cid)
      val assign = (src: String, cent: String) =>
        s"SELECT vec_id, emb, cid AS bucket FROM (" +
          s"SELECT e.vec_id, e.emb, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
          s"ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn " +
          s"FROM $src e, $cent c) WHERE rn = 1"
      // element-wise bucket mean, rounded to 6 dp (VectorMean mirror)
      val meanc = (src: String) =>
        s"SELECT bucket AS cid, list(round(m, 6) ORDER BY i) AS cemb FROM (" +
          s"SELECT bucket, i, avg(v) AS m FROM (" +
          s"SELECT bucket, unnest(emb) AS v, generate_subscripts(emb, 1) AS i " +
          s"FROM $src) GROUP BY bucket, i) GROUP BY bucket"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "seed AS (SELECT vec_id AS cid, emb AS cemb FROM (" +
        "SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM e) " +
        "WHERE rn <= (SELECT CAST(ceil(sqrt(count(*))) AS INT) FROM e)), " +
        s"a1 AS (${assign("e", "seed")}), c1 AS (${meanc("a1")}), " +
        s"a2 AS (${assign("e", "c1")}), c2 AS (${meanc("a2")}), " +
        s"assign AS (${assign("e", "c2")}), " +
        "q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 5), " +
        "probes AS (SELECT qid, qemb, cid AS bucket FROM (" +
        "SELECT q.qid, q.qemb, c.cid, row_number() OVER (PARTITION BY q.qid " +
        s"ORDER BY ${cos("q.qemb", "c.cemb")} DESC, c.cid) AS rn FROM q, c2 c) " +
        "WHERE rn <= 4), " +
        s"cand AS (SELECT p.qid, a.vec_id, ${cos("a.emb", "p.qemb")} AS sim " +
        "FROM assign a JOIN probes p ON a.bucket = p.bucket WHERE a.vec_id <> p.qid), " +
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY qid " +
        "ORDER BY sim DESC, vec_id) AS rn FROM cand) " +
        "SELECT qid, vec_id, sim FROM ranked WHERE rn <= 10 ORDER BY qid, vec_id"
    },
    "q34_hashing_embed" ->
      (s"WITH n0 AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "t AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS tk FROM n0), " +
        "d AS (SELECT doc_id, n, " +
        "('0x' || substr(md5(tk), 1, 8))::BIGINT % 64 AS dim FROM t) " +
        "SELECT doc_id, dim, round(COUNT(*) / CAST(n AS DOUBLE), 6) AS weight " +
        "FROM d GROUP BY doc_id, n, dim ORDER BY doc_id, dim"),
    "q33_vocab_topk" ->
      (s"WITH n AS (SELECT doc_id, $duckNorm AS ntext FROM documents), " +
        "t AS (SELECT unnest(string_split(ntext, ' ')) AS token FROM n) " +
        "SELECT token, COUNT(*) AS n FROM t GROUP BY token " +
        "ORDER BY n DESC, token LIMIT 20"),
    "q26_corpus_filter" ->
      (s"WITH all_docs AS ($dupCte), " +
        s"surv AS (SELECT min(doc_id) AS doc_id FROM (" +
        s"SELECT doc_id, md5($duckNorm) AS fp FROM all_docs) GROUP BY fp), " +
        s"n AS (SELECT d.doc_id, d.text, $duckNorm AS ntext FROM all_docs d " +
        "JOIN surv USING (doc_id)), " +
        "st AS (SELECT doc_id, ntext, len(string_split(ntext, ' ')) AS n_tokens, " +
        "len(list_filter(string_split(ntext, ' '), " +
        "t -> list_contains(['the','a'], t))) AS n_stop, " +
        "len(list_filter(string_split(ntext, ' '), " +
        "t -> list_contains(['the','a','and','of'], t))) AS s_en FROM n) " +
        "SELECT doc_id, n_tokens FROM st " +
        "WHERE n_tokens BETWEEN 20 AND 400 " +
        "AND round(n_stop / CAST(n_tokens AS DOUBLE), 6) >= 0.05 " +
        "AND s_en > 0 ORDER BY doc_id"),
    // same IVF assignment, same in-bucket candidates, row_number's
    // (sim DESC, id ASC) ≡ top_k's tie rule
    "q176_knn_graph" -> {
      val cos = (a: String, b: String) =>
        s"CAST(round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) " +
          "* 1000000) AS BIGINT)"
      val cosRaw = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < " +
        "CAST(ceil(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)), " +
        "assign AS (SELECT vec_id, emb, cid AS bucket FROM (" +
        "SELECT e.vec_id, e.emb, c.cid, row_number() OVER " +
        "(PARTITION BY e.vec_id " +
        s"ORDER BY ${cosRaw("e.emb", "c.cemb")} DESC, c.cid) AS rn " +
        "FROM e, c) WHERE rn = 1), " +
        "cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        s"${cos("a.emb", "b.emb")} AS sm " +
        "FROM assign a JOIN assign b ON a.bucket = b.bucket " +
        "AND a.vec_id <> b.vec_id), " +
        "r AS (SELECT id_a, id_b, sm, row_number() OVER " +
        "(PARTITION BY id_a ORDER BY sm DESC, id_b) AS rk FROM cand) " +
        "SELECT id_a AS vec_id, CAST(rk AS BIGINT) AS rk, id_b AS nn_id, " +
        "sm AS sim_micro FROM r WHERE rk <= 3 ORDER BY vec_id, rk"
    },

    "q25_embedding_neardup" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "e AS (SELECT * FROM e0 UNION ALL SELECT vec_id + 100000, emb FROM e0), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e0 WHERE vec_id < 16), " +
        "assign AS (SELECT vec_id, emb, cid AS bucket FROM (" +
        s"SELECT e.vec_id, e.emb, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn FROM e, c) WHERE rn = 1) " +
        "SELECT * FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        s"${cos("a.emb", "b.emb")} AS sim " +
        "FROM assign a JOIN assign b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) " +
        "WHERE sim >= 0.999 ORDER BY id_a, id_b"
    },
    "q19_simhash" ->
      (s"WITH n AS (SELECT doc_id, $duckNorm AS ntext FROM documents), " +
        "tok AS (SELECT doc_id, unnest(string_split(ntext, ' ')) AS tk FROM n), " +
        "h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 8))::BIGINT AS hv FROM tok), " +
        "bits AS (SELECT doc_id, b, CASE WHEN " +
        "sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0 " +
        "THEN (1::BIGINT << b) ELSE 0::BIGINT END AS bitval " +
        "FROM h, (SELECT unnest(range(0, 32)) AS b) bs GROUP BY doc_id, b) " +
        "SELECT doc_id, sum(bitval)::BIGINT AS simhash FROM bits " +
        "GROUP BY doc_id ORDER BY doc_id"),
    "q28_winnow_fingerprint" ->
      (s"WITH ${duckShingleCtes("documents")}, " +
        "hs AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM sh), " +
        "wins AS (SELECT doc_id, CASE WHEN len(hs) <= 4 THEN [list_min(hs)] " +
        "ELSE list_transform(range(1, len(hs) - 2), i -> list_min(hs[i:i+3])) " +
        "END AS wins FROM hs) " +
        "SELECT doc_id, unnest(list_distinct(wins)) AS fp FROM wins " +
        "ORDER BY doc_id, fp"),
    "q27_simhash_neardup" ->
      (s"WITH all_docs AS ($dupCte), " +
        s"n AS (SELECT doc_id, $duckNorm AS ntext FROM all_docs), " +
        "tok AS (SELECT doc_id, unnest(string_split(ntext, ' ')) AS tk FROM n), " +
        "h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 8))::BIGINT AS hv FROM tok), " +
        "bits AS (SELECT doc_id, b, CASE WHEN " +
        "sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0 " +
        "THEN (1::BIGINT << b) ELSE 0::BIGINT END AS bitval " +
        "FROM h, (SELECT unnest(range(0, 32)) AS b) bs GROUP BY doc_id, b), " +
        "fp AS (SELECT doc_id, sum(bitval)::BIGINT AS fp FROM bits GROUP BY doc_id), " +
        "bands AS (" +
        (0 until 4).map(b =>
          s"SELECT doc_id, fp, $b AS band, (fp >> ${8 * b}) & 255 AS bkey FROM fp")
          .mkString(" UNION ALL ") + "), " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "a.fp AS fp_a, b.fp AS fp_b FROM bands a JOIN bands b " +
        "ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id) " +
        "SELECT doc_a, doc_b, bit_count(xor(fp_a, fp_b))::INT AS hamming " +
        "FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 3 ORDER BY doc_a, doc_b"),
    "q58_tfidf_top_term" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "x AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS n FROM tk " +
        "WHERE len(toks) > 0), " +
        "t AS (SELECT doc_id, n, unnest(toks) AS term FROM x), " +
        "tf AS (SELECT doc_id, n, term, CAST(count(*) AS DOUBLE) AS c " +
        "FROM t GROUP BY doc_id, n, term), " +
        "dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfc FROM tf GROUP BY term), " +
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents), " +
        "w AS (SELECT tf.doc_id, tf.term, " +
        "tf.c / tf.n * ln((nn.nd + 1) / (dft.dfc + 1)) AS wt " +
        "FROM tf JOIN dft USING (term) CROSS JOIN nn), " +
        "r AS (SELECT doc_id, term, wt, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY wt DESC, term) AS rn FROM w) " +
        "SELECT doc_id, term AS top_term, round(wt, 6) AS tfidf " +
        "FROM r WHERE rn = 1 ORDER BY doc_id"),
    "q59_bm25_topk" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "x AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl FROM tk " +
        "WHERE len(toks) > 0), " +
        "st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl FROM x), " +
        "t AS (SELECT doc_id, dl, unnest(toks) AS term FROM x), " +
        "tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tfc " +
        "FROM t WHERE term IN ('join', 'hash', 'vector', 'stream') " +
        "GROUP BY doc_id, dl, term), " +
        "dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfc FROM tf GROUP BY term), " +
        "sc AS (SELECT tf.doc_id, tf.term, " +
        s"ln(1 + (st.nd - dft.dfc + 0.5) / (dft.dfc + 0.5)) * " +
        s"(tf.tfc * ${Relevance.K1 + 1d}) / " +
        s"(tf.tfc + ${Relevance.K1} * (${1d - Relevance.B} + " +
        s"${Relevance.B} * tf.dl / st.avgdl)) AS s " +
        "FROM tf JOIN dft USING (term) CROSS JOIN st), " +
        "agg AS (SELECT doc_id, " +
        "list_reduce(list(s ORDER BY term), (a, b) -> a + b) AS score " +
        "FROM sc GROUP BY doc_id), " +
        "top AS (SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id " +
        "LIMIT 20) " +
        "SELECT doc_id, round(score, 6) AS score FROM top ORDER BY doc_id"),
    "q60_embed_quantize" ->
      ("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "a AS (SELECT vec_id, v, " +
        "list_max(list_transform(v, x -> abs(x))) AS amax FROM v) " +
        "SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims, " +
        "round(amax / 127, 6) AS scale, " +
        "round(sqrt(list_dot_product(v, v)), 6) AS l2, " +
        "md5(array_to_string(list_transform(v, x -> " +
        "CAST(CASE WHEN amax = 0 THEN 0 " +
        "ELSE CAST(floor(x * 127 / amax + 0.5) AS BIGINT) END AS VARCHAR)), ',')) " +
        "AS q_md5 FROM a ORDER BY vec_id"),
    "q61_stratified_sample" ->
      ("WITH h AS (SELECT lang, doc_id, " +
        "md5('smp:' || CAST(doc_id AS VARCHAR)) AS hv FROM documents), " +
        "r AS (SELECT lang, doc_id, row_number() OVER " +
        "(PARTITION BY lang ORDER BY hv, doc_id) AS smp_rank FROM h) " +
        "SELECT lang, smp_rank, doc_id FROM r WHERE smp_rank <= 5 " +
        "ORDER BY lang, smp_rank"),
    "q62_global_shuffle" ->
      ("WITH h AS (SELECT doc_id, " +
        "md5('shuf:' || CAST(doc_id AS VARCHAR)) AS hv FROM documents), " +
        "s AS (SELECT doc_id, hv, " +
        "('0x' || substr(hv, 1, 8))::BIGINT % 32 AS shard FROM h) " +
        "SELECT doc_id, shard, row_number() OVER " +
        "(PARTITION BY shard ORDER BY hv, doc_id) AS pos FROM s " +
        "ORDER BY shard, pos"),
    "q63_ann_lsh" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      // hyperplane j as a list literal-from-formula; bit j of the code
      // mirrors AnnLsh.codeColumn exactly (same md5 seed scheme)
      def plane(j: Int) =
        s"list_transform(range(0, len(v)), i -> " +
          s"('0x' || substr(md5('lsh:$j:' || CAST(i AS VARCHAR)), 1, 8))::BIGINT " +
          "/ 2147483648.0 - 1.0)"
      val codeExpr = (0 until 8).map(j =>
        s"(CASE WHEN list_dot_product(v, ${plane(j)}) >= 0 " +
          s"THEN ${1L << j} ELSE 0 END)").mkString(" + ")
      "WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
        "e AS (SELECT * FROM e0 UNION ALL SELECT vec_id + 100000, v FROM e0), " +
        s"c AS (SELECT vec_id, v, $codeExpr AS code FROM e) " +
        "SELECT * FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        s"${cos("a.v", "b.v")} AS sim " +
        "FROM c a JOIN c b ON a.code = b.code AND a.vec_id < b.vec_id) " +
        "WHERE sim >= 0.999 ORDER BY id_a, id_b"
    },
    "q64_profile" -> {
      def prof(c: String, isNum: Boolean) = {
        val mn = if (isNum) s"round(CAST(min($c) AS DOUBLE), 6)" else "CAST(NULL AS DOUBLE)"
        val mx = if (isNum) s"round(CAST(max($c) AS DOUBLE), 6)" else "CAST(NULL AS DOUBLE)"
        s"SELECT '$c' AS col_name, count($c) AS n_nonnull, " +
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, " +
          s"count(DISTINCT $c) AS n_distinct, $mn AS min_num, $mx AS max_num " +
          "FROM events"
      }
      prof("user_id", isNum = true) + " UNION ALL " +
        prof("event_type", isNum = false) + " UNION ALL " +
        prof("value", isNum = true) + " ORDER BY col_name"
    },
    "q65_incremental_dedup" ->
      (s"WITH f AS (SELECT doc_id, md5($duckNorm) AS fp FROM documents), " +
        "existing AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250), " +
        "fresh AS (SELECT min(doc_id + 100000) AS doc_id, fp FROM f GROUP BY fp) " +
        "SELECT doc_id, fp FROM fresh " +
        "WHERE fp NOT IN (SELECT fp FROM existing) ORDER BY doc_id"),
    "q77_unigram_nll" ->
      (s"WITH tk AS (SELECT doc_id, unnest(string_split($duckNorm, ' ')) AS t " +
        "FROM documents), " +
        "c AS (SELECT t, count(*) AS c FROM tk GROUP BY t), " +
        "st AS (SELECT CAST(sum(c) AS DOUBLE) AS nn, " +
        "CAST(count(*) AS DOUBLE) AS vv FROM c), " +
        "li AS (SELECT tk.doc_id, " +
        "CAST(FLOOR(-ln((c.c + 1) / (st.nn + st.vv)) * 1000000) AS BIGINT) " +
        "AS li FROM tk JOIN c USING (t) CROSS JOIN st) " +
        "SELECT doc_id, count(*) AS n_tok, " +
        // DuckDB SUM(BIGINT) is HUGEINT (read back float64); cast the
        // quotient back to BIGINT to match Spark's int64
        "CAST(sum(li) // count(*) AS BIGINT) AS nll_micro " +
        "FROM li GROUP BY doc_id ORDER BY doc_id"),
    "q67_gapfill" ->
      ("WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, " +
        "value FROM events WHERE user_id < 30), " +
        "daily AS (SELECT user_id, day, COUNT(*) AS n, " +
        "ROUND(SUM(value), 6) AS sv FROM ev GROUP BY user_id, day), " +
        "span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 " +
        "FROM daily GROUP BY user_id), " +
        "scaffold AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day " +
        "FROM span) " +
        "SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n, " +
        "COALESCE(d.sv, 0) AS sv FROM scaffold s " +
        "LEFT JOIN daily d USING (user_id, day) ORDER BY user_id, day"),
    "q68_pivot" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      "SELECT user_id, " +
        types.map(t =>
          s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) " +
            s"AS n_$t").mkString(", ") +
        " FROM events GROUP BY user_id ORDER BY user_id"
    },
    // plain per-source windowed cumsum — the two-level block prefix sum
    // must agree with it exactly (same invariant PipelineSpec pins for
    // withGlobalOffset vs the naive global window)
    "q93_token_budget" ->
      ("WITH o AS (SELECT doc_id, source, n_chars, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS ord " +
        "FROM documents), " +
        "c AS (SELECT *, CAST(SUM(n_chars) OVER (PARTITION BY source " +
        "ORDER BY ord, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "- n_chars AS BIGINT) AS start_chars FROM o) " +
        "SELECT doc_id, source, n_chars, start_chars FROM c " +
        "WHERE start_chars + n_chars <= 4000 ORDER BY doc_id"),
    // cell-grid reconstruction: the sketch is deterministic (md5 hash
    // family, commutative cell sums), so the estimates hash-match a
    // group-by rebuild of the same 4×256 grid
    "q95_cms_heavy_hitters" ->
      (s"WITH nn AS (SELECT doc_id, $duckNorm AS ntext FROM documents), " +
        "t AS (SELECT unnest(string_split(ntext, ' ')) AS token FROM nn), " +
        "js AS (SELECT unnest(range(0, 4)) AS j), " +
        "cells AS (SELECT j, ('0x' || substr(md5(CAST(j AS VARCHAR) " +
        "|| ':' || token), 1, 8))::BIGINT % 256 AS cell, COUNT(*) AS c " +
        "FROM t, js GROUP BY 1, 2), " +
        "exact AS (SELECT token, COUNT(*) AS n FROM t GROUP BY token " +
        "ORDER BY n DESC, token LIMIT 20), " +
        "ph AS (SELECT e.token, e.n, js.j, ('0x' || substr(md5(" +
        "CAST(js.j AS VARCHAR) || ':' || e.token), 1, 8))::BIGINT % 256 " +
        "AS cell FROM exact e, js) " +
        "SELECT ph.token, ph.n, CAST(MIN(c.c) AS BIGINT) AS est, " +
        "TRUE AS never_under FROM ph JOIN cells c USING (j, cell) " +
        "GROUP BY ph.token, ph.n ORDER BY ph.n DESC, ph.token"),
    // q25's IVF-bucketed pair chain + the q38/q88 recursive min-label
    // closure, grouped to one representative per semantic cluster
    "q96_semantic_dedup" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH RECURSIVE " +
        "e0 AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "e AS (SELECT * FROM e0 UNION ALL SELECT vec_id + 100000, emb FROM e0), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e0 WHERE vec_id < 16), " +
        "assign AS (SELECT vec_id, emb, cid AS bucket FROM (" +
        s"SELECT e.vec_id, e.emb, c.cid, row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn FROM e, c) WHERE rn = 1), " +
        "ver AS (SELECT id_a, id_b FROM (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        s"${cos("a.emb", "b.emb")} AS sim " +
        "FROM assign a JOIN assign b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) " +
        "WHERE sim >= 0.999), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM ver " +
        "UNION SELECT id_b, id_a FROM ver), " +
        "cc(id, lbl) AS (SELECT vec_id, vec_id FROM e " +
        "UNION SELECT ed.dst, c2.lbl FROM cc c2 JOIN edges ed ON ed.src = c2.id), " +
        "lab AS (SELECT id, min(lbl) AS cluster FROM cc GROUP BY id) " +
        "SELECT min(id) AS keep_id, COUNT(*) AS n_members FROM lab " +
        "GROUP BY cluster ORDER BY keep_id"
    },
    // identical left-associated double expression; the normalizer z is
    // an exact integer sum of micro-unit weights (order-independent)
    "q99_temperature_mix" ->
      ("WITH st AS (SELECT source, COUNT(*) AS n_docs, " +
        "CAST(SUM(n_chars) AS DOUBLE) AS mass FROM documents GROUP BY source), " +
        "w AS (SELECT source, n_docs, " +
        "CAST(FLOOR(sqrt(mass) * 1000000.0) AS BIGINT) AS wm FROM st), " +
        "z AS (SELECT CAST(SUM(wm) AS BIGINT) AS z FROM w), " +
        "r AS (SELECT source, CAST(FLOOR(1000000.0 * 200.0 * wm " +
        "/ CAST(z AS DOUBLE) / n_docs) AS BIGINT) AS ppm FROM w, z) " +
        "SELECT d.doc_id, d.source, r.ppm FROM documents d JOIN r USING (source) " +
        "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT " +
        "% 1000000 < ppm ORDER BY doc_id"),
    // same 3-gram span construction as the q86 oracle, joined back to
    // the span stream for the per-document occurrence ratio
    "q101_span_novelty" ->
      (s"WITH nn AS (SELECT doc_id, $duckNorm AS ntext FROM documents), " +
        "tk AS (SELECT doc_id, string_split(ntext, ' ') AS toks FROM nn), " +
        "g AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 3 " +
        "THEN [array_to_string(toks, ' ')] " +
        "ELSE list_transform(range(1, len(toks) - 1), " +
        "i -> array_to_string(toks[i:i+2], ' ')) END) AS sh FROM tk), " +
        "c AS (SELECT sh, COUNT(DISTINCT doc_id) AS n_docs FROM g GROUP BY sh) " +
        "SELECT g.doc_id, COUNT(*) AS n_spans, " +
        "CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_dup_spans, " +
        "ROUND(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) " +
        "/ CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio " +
        "FROM g JOIN c USING (sh) GROUP BY g.doc_id ORDER BY doc_id"),
    // conditional bigram LM: p(w2|w1) = (c2+1)/(c1+V), c1 = left-
    // context totals derived from the bigram counts, V = unigram
    // vocabulary; integer-millionth log-probs as in q77
    // identical rational: [max(4c2−3,0)·B + 3·N1r·N1l] / (4·c1·B),
    // micro-log difference of exact bigints, same (w,w) fallback
    "q245_kneser_ney_nll" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 " +
        "THEN [array_to_string(toks, ' ')] " +
        "ELSE list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) " +
        "END) AS b FROM tk), " +
        "c2 AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c2, " +
        "string_split(b, ' ')[1] AS w1, " +
        "COALESCE(string_split(b, ' ')[2], string_split(b, ' ')[1]) AS w2 " +
        "FROM bg GROUP BY b), " +
        "l AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1, " +
        "CAST(COUNT(*) AS BIGINT) AS n1r FROM c2 GROUP BY 1), " +
        "r AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1l FROM c2 " +
        "GROUP BY 1), " +
        "bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS bt FROM c2), " +
        "lm AS (SELECT c2.b, " +
        "CAST(FLOOR(ln(4 * l.c1 * bt.bt) * 1000000) AS BIGINT) - " +
        "CAST(FLOOR(ln(GREATEST(0, c2.c2 * 4 - 3) * bt.bt " +
        "+ 3 * l.n1r * r.n1l) * 1000000) AS BIGINT) AS li " +
        "FROM c2 JOIN l ON l.w1 = c2.w1 JOIN r ON r.w2 = c2.w2 " +
        "CROSS JOIN bt) " +
        "SELECT bg.doc_id, COUNT(*) AS n_bigrams, " +
        "CAST(SUM(lm.li) // COUNT(*) AS BIGINT) AS nll_micro " +
        "FROM bg JOIN lm USING (b) GROUP BY bg.doc_id ORDER BY doc_id"),
    "q103_bigram_nll" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 " +
        "THEN [array_to_string(toks, ' ')] " +
        "ELSE list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) " +
        "END) AS b FROM tk), " +
        "c2 AS (SELECT b, COUNT(*) AS c2 FROM bg GROUP BY b), " +
        "c1 AS (SELECT string_split(b, ' ')[1] AS w1, " +
        "CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1), " +
        "vv AS (SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS vv FROM (" +
        s"SELECT unnest(string_split($duckNorm, ' ')) AS t FROM documents)), " +
        "lm AS (SELECT c2.b, CAST(FLOOR(-ln((c2.c2 + 1) / (c1.c1 + vv.vv)) " +
        "* 1000000) AS BIGINT) AS li FROM c2 " +
        "JOIN c1 ON string_split(c2.b, ' ')[1] = c1.w1 CROSS JOIN vv) " +
        "SELECT bg.doc_id, COUNT(*) AS n_bigrams, " +
        "CAST(SUM(lm.li) // COUNT(*) AS BIGINT) AS nll_micro " +
        "FROM bg JOIN lm USING (b) GROUP BY bg.doc_id ORDER BY doc_id"),

    // same clipped-precision grams as the Spark side (kind-filtered
    // union mirrors q335), same 2·log-BLEU micro score: brevity term
    // via positive truncating division with the sign reattached, the
    // same audited ⌊ln(int)·10⁶⌋ idiom, clip2 smoothed to ≥ 1
    "q342_bleu_eval" -> {
      def ml(x: String) = s"CAST(FLOOR(ln($x) * 1000000) AS BIGINT)"
      s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "tk2 AS (SELECT * FROM tk WHERE len(toks) >= 2), " +
        "g1 AS (SELECT doc_id, unnest(toks) AS g, 1 AS kind FROM tk2), " +
        "g2 AS (SELECT doc_id, unnest(list_transform(" +
        "range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS g, " +
        "2 AS kind FROM tk2), " +
        "gr AS (SELECT doc_id, g, kind, COUNT(*) AS tf FROM " +
        "(SELECT * FROM g1 UNION ALL SELECT * FROM g2) " +
        "WHERE g <> '' GROUP BY 1, 2, 3), " +
        "refs AS (SELECT doc_id AS ref_id, g, kind, tf AS rtf FROM gr " +
        "WHERE doc_id < 5), " +
        "rl AS (SELECT ref_id, CAST(SUM(rtf) AS BIGINT) AS rlen " +
        "FROM refs WHERE kind = 1 GROUP BY 1), " +
        "ct AS (SELECT doc_id, " +
        "MAX(CASE WHEN kind = 1 THEN tot END) AS tot1, " +
        "MAX(CASE WHEN kind = 2 THEN tot END) AS tot2 FROM " +
        "(SELECT doc_id, kind, SUM(tf) AS tot FROM gr WHERE doc_id >= 5 " +
        "GROUP BY 1, 2) GROUP BY 1), " +
        "cl AS (SELECT r.ref_id, c.doc_id, " +
        "SUM(CASE WHEN c.kind = 1 THEN LEAST(c.tf, r.rtf) ELSE 0 END) " +
        "AS clip1, " +
        "SUM(CASE WHEN c.kind = 2 THEN LEAST(c.tf, r.rtf) ELSE 0 END) " +
        "AS clip2 FROM gr c JOIN refs r ON c.g = r.g AND c.kind = r.kind " +
        "WHERE c.doc_id >= 5 GROUP BY 1, 2), " +
        "sc AS (SELECT ref_id, cl.doc_id, " +
        "(CASE WHEN tot1 >= rlen THEN 0 " +
        "ELSE -((rlen - tot1) * 1000000 // tot1) END) * 2 " +
        s"+ (${ml("clip1")} - ${ml("tot1")}) " +
        s"+ (${ml("greatest(clip2, 1)")} - ${ml("tot2")}) AS s2x " +
        "FROM cl JOIN ct ON ct.doc_id = cl.doc_id " +
        "JOIN rl USING (ref_id)), " +
        "rk AS (SELECT *, row_number() OVER (PARTITION BY ref_id " +
        "ORDER BY s2x DESC, doc_id) AS rnk FROM sc) " +
        "SELECT ref_id, CAST(rnk AS BIGINT) AS rank, doc_id, " +
        "CAST(s2x AS BIGINT) AS bleu2x_micro " +
        "FROM rk WHERE rnk <= 3 ORDER BY ref_id, rank"
    },

    // same mill-scale coordinates and eps/minPts; the oracle pairs
    // directly on distance² (the grid is a lossless candidate
    // superset — cell size = eps), recursive min-label closure over
    // core-core edges, min-core-neighbor border adoption
    "q343_dbscan_grid" ->
      ("WITH RECURSIVE p AS (SELECT vec_id, " +
        "CAST(round(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS x, " +
        "CAST(round(CAST(embedding[2] AS DOUBLE) * 1000) AS BIGINT) AS y " +
        "FROM embeddings), " +
        "nb AS (SELECT a.vec_id AS a, b.vec_id AS b FROM p a JOIN p b " +
        "ON a.vec_id <> b.vec_id AND " +
        "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 225), " +
        "core AS (SELECT a AS vec_id FROM nb GROUP BY a " +
        "HAVING COUNT(*) >= 4), " +
        "ce AS (SELECT n.a, n.b FROM nb n " +
        "JOIN core ca ON ca.vec_id = n.a " +
        "JOIN core cb ON cb.vec_id = n.b), " +
        "cc(id, lbl) AS (SELECT vec_id, vec_id FROM core " +
        "UNION SELECT e.b, c.lbl FROM cc c JOIN ce e ON e.a = c.id), " +
        "lab AS (SELECT id AS vec_id, MIN(lbl) AS cluster FROM cc " +
        "GROUP BY 1), " +
        "bc AS (SELECT n.a AS vec_id, MIN(l.cluster) AS bcl FROM nb n " +
        "JOIN lab l ON l.vec_id = n.b GROUP BY 1) " +
        "SELECT p.vec_id, " +
        "CAST(CASE WHEN lab.cluster IS NOT NULL THEN 2 " +
        "WHEN bc.bcl IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS role, " +
        "CAST(COALESCE(lab.cluster, bc.bcl, -1) AS BIGINT) AS cluster " +
        "FROM p LEFT JOIN lab ON lab.vec_id = p.vec_id " +
        "LEFT JOIN bc ON bc.vec_id = p.vec_id " +
        "ORDER BY p.vec_id"),

    // the full RM3 replay: q59's feedback retrieval verbatim, the
    // same (Σ tf desc, term) top-8 expansion, the same weighted-query
    // rescore with term-ordered folds and one closing round
    "q353_rm3_expansion" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "x AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl " +
        "FROM tk WHERE len(toks) > 0), " +
        "st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl " +
        "FROM x), " +
        "t AS (SELECT doc_id, dl, unnest(toks) AS term FROM x), " +
        "tnz AS (SELECT * FROM t WHERE term <> ''), " +
        "tf0 AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tfc " +
        "FROM tnz WHERE term IN ('join', 'hash', 'vector', 'stream') " +
        "GROUP BY 1, 2, 3), " +
        "df0 AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfc FROM tf0 " +
        "GROUP BY 1), " +
        "sc0 AS (SELECT tf0.doc_id, tf0.term, " +
        s"ln(1 + (st.nd - df0.dfc + 0.5) / (df0.dfc + 0.5)) * " +
        s"(tf0.tfc * ${Relevance.K1 + 1d}) / " +
        s"(tf0.tfc + ${Relevance.K1} * (${1d - Relevance.B} + " +
        s"${Relevance.B} * tf0.dl / st.avgdl)) AS s " +
        "FROM tf0 JOIN df0 USING (term) CROSS JOIN st), " +
        "ag0 AS (SELECT doc_id, " +
        "list_reduce(list(s ORDER BY term), (a, b) -> a + b) AS score " +
        "FROM sc0 GROUP BY 1), " +
        "fb AS (SELECT doc_id FROM ag0 ORDER BY score DESC, doc_id " +
        "LIMIT 10), " +
        "expt AS (SELECT term, COUNT(*) AS w FROM tnz JOIN fb " +
        "USING (doc_id) WHERE term NOT IN " +
        "('join', 'hash', 'vector', 'stream') " +
        "GROUP BY 1 ORDER BY w DESC, term LIMIT 8), " +
        "mx AS (SELECT MAX(w) AS maxw FROM expt), " +
        "qt AS (SELECT term, 0.5 * w / maxw AS qw FROM expt CROSS JOIN mx " +
        "UNION ALL SELECT unnest(['join', 'hash', 'vector', 'stream']), " +
        "1.0), " +
        "tfq AS (SELECT doc_id, dl, tnz.term, qw, " +
        "CAST(count(*) AS DOUBLE) AS tfc FROM tnz " +
        "JOIN qt ON qt.term = tnz.term GROUP BY 1, 2, 3, 4), " +
        "dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfc FROM tfq " +
        "GROUP BY 1), " +
        "scq AS (SELECT tfq.doc_id, tfq.term, qw * " +
        s"ln(1 + (st.nd - dfq.dfc + 0.5) / (dfq.dfc + 0.5)) * " +
        s"(tfq.tfc * ${Relevance.K1 + 1d}) / " +
        s"(tfq.tfc + ${Relevance.K1} * (${1d - Relevance.B} + " +
        s"${Relevance.B} * tfq.dl / st.avgdl)) AS s " +
        "FROM tfq JOIN dfq USING (term) CROSS JOIN st), " +
        "agq AS (SELECT doc_id, " +
        "list_reduce(list(s ORDER BY term), (a, b) -> a + b) AS score " +
        "FROM scq GROUP BY 1), " +
        "top AS (SELECT doc_id, score FROM agq ORDER BY score DESC, " +
        "doc_id LIMIT 10) " +
        "SELECT doc_id, round(score, 6) AS score FROM top " +
        "ORDER BY doc_id"),

    // same deg ≤ 64 center cut, same distinct-endpoint / anti-join
    // accounting, same micro weights
    "q355_reach_2hop" ->
      (s"WITH it AS MATERIALIZED ($itemsCte), " +
        s"ed AS MATERIALIZED ($coEdgeCte), " +
        "sym AS MATERIALIZED (SELECT lo AS src, hi AS dst FROM ed " +
        "UNION ALL SELECT hi, lo FROM ed), " +
        "dg AS (SELECT src, COUNT(*) AS n1 FROM sym GROUP BY 1), " +
        "nh AS (SELECT src AS m FROM dg WHERE n1 <= 64), " +
        "h2 AS (SELECT DISTINCT s1.src, s2.dst AS w FROM sym s1 " +
        "JOIN nh ON nh.m = s1.dst " +
        "JOIN sym s2 ON s2.src = s1.dst WHERE s2.dst <> s1.src), " +
        "h2x AS (SELECT h2.src, h2.w FROM h2 WHERE NOT EXISTS " +
        "(SELECT 1 FROM sym WHERE sym.src = h2.src AND sym.dst = h2.w)), " +
        "n2t AS (SELECT src, COUNT(*) AS n2 FROM h2x GROUP BY 1) " +
        "SELECT dg.src AS item, CAST(dg.n1 AS BIGINT) AS n1, " +
        "CAST(COALESCE(n2t.n2, 0) AS BIGINT) AS n2, " +
        "CAST(dg.n1 * 1000000 + COALESCE(n2t.n2, 0) * 500000 AS BIGINT) " +
        "AS h2_micro " +
        "FROM dg LEFT JOIN n2t ON n2t.src = dg.src ORDER BY item"),

    // every sample recomputed from the closed-form PCM polynomial
    // (the q79 contract), same frame/lag accounting, same floors
    "q369_audio_autocorr" ->
      ("WITH ids AS (SELECT doc_id AS media_id, " +
        "800 + (doc_id % 5) * 160 AS n FROM documents " +
        "WHERE doc_id < 200), " +
        "fr AS (SELECT media_id, " +
        "unnest(range(0, n // 160)) AS wi FROM ids), " +
        "sm AS (SELECT media_id, wi, " +
        "unnest(range(wi * 160, wi * 160 + 160)) AS i FROM fr), " +
        "sx AS (SELECT media_id, wi, i, " +
        "((media_id * 7919 + i * 31) % 65536) - 32768 AS x FROM sm), " +
        "rr AS (SELECT a.media_id, a.wi, " +
        "SUM(a.x * a.x) AS r0, " +
        "SUM(CASE WHEN b20.x IS NULL THEN 0 ELSE a.x * b20.x END) " +
        "AS r20, " +
        "SUM(CASE WHEN b40.x IS NULL THEN 0 ELSE a.x * b40.x END) " +
        "AS r40 " +
        "FROM sx a " +
        "LEFT JOIN sx b20 ON b20.media_id = a.media_id " +
        "AND b20.wi = a.wi AND b20.i = a.i + 20 " +
        "LEFT JOIN sx b40 ON b40.media_id = a.media_id " +
        "AND b40.wi = a.wi AND b40.i = a.i + 40 " +
        "GROUP BY 1, 2) " +
        "SELECT media_id, CAST(wi AS BIGINT) AS win_idx, " +
        "CAST(r0 AS BIGINT) AS r0, CAST(r20 AS BIGINT) AS r20, " +
        "CAST(r40 AS BIGINT) AS r40, " +
        "CAST(CASE WHEN r0 > 0 THEN " +
        "greatest(r20, r40) * 1000000 // r0 ELSE -1 END AS BIGINT) " +
        "AS period_micro " +
        "FROM rr ORDER BY media_id, win_idx"),

    // the same 3×3 kernels applied as an 8-offset scatter-sum over
    // pixels rebuilt from the closed-form polynomial; interior-only
    // centers, same |Gx|+|Gy| fold and floored micro mean
    "q370_sobel_energy" ->
      ("WITH ids AS (SELECT doc_id AS media_id, " +
        "16 + (doc_id % 16) AS w, 16 + (doc_id % 8) AS h " +
        "FROM documents WHERE doc_id < 200), " +
        "xs AS (SELECT media_id, w, h, unnest(range(0, w)) AS x " +
        "FROM ids), " +
        "ys AS (SELECT media_id, w, h, x, unnest(range(0, h)) AS y " +
        "FROM xs), " +
        "pl AS (SELECT media_id, w, h, x, y, " +
        "((media_id * 31 + x * 7 + y * 13) % 256) + " +
        "((media_id + x * 3 + y * 5) % 256) + " +
        "((media_id * 17 + x + y * 2) % 256) AS lum FROM ys), " +
        "off AS (SELECT * FROM (VALUES " +
        "(-1, -1, -1, -1), (0, -1, 0, -2), (1, -1, 1, -1), " +
        "(-1, 0, -2, 0), (1, 0, 2, 0), " +
        "(-1, 1, -1, 1), (0, 1, 0, 2), (1, 1, 1, 1)) " +
        "o(dx, dy, kx, ky)), " +
        "g AS (SELECT media_id, w, h, x - dx AS cx, y - dy AS cy, " +
        "SUM(lum * kx) AS gx, SUM(lum * ky) AS gy " +
        "FROM pl CROSS JOIN off GROUP BY 1, 2, 3, 4, 5), " +
        "e AS (SELECT media_id, w, h, " +
        "SUM(abs(gx) + abs(gy)) AS edge_sum FROM g " +
        "WHERE cx >= 1 AND cx < w - 1 AND cy >= 1 AND cy < h - 1 " +
        "GROUP BY 1, 2, 3) " +
        "SELECT media_id, CAST(w AS BIGINT) AS w, " +
        "CAST(h AS BIGINT) AS h, CAST(edge_sum AS BIGINT) AS edge_sum, " +
        "CAST(edge_sum * 1000000 // ((w - 2) * (h - 2)) AS BIGINT) " +
        "AS mean_edge_micro " +
        "FROM e ORDER BY media_id"),

    // DuckDB's native levenshtein on the identical md5-corrupted
    // twin strings (1-based list positions shifted to the Spark
    // lambda's 0-based index), same 30-token cap and floored micro
    "q368_cer_eval" ->
      (s"WITH tk AS (SELECT doc_id, " +
        s"string_split($duckNorm, ' ')[1:30] AS toks FROM documents), " +
        "h AS (SELECT doc_id, array_to_string(toks, ' ') AS ref, " +
        "array_to_string(list_filter(list_transform(" +
        "range(1, len(toks) + 1), i -> " +
        "CASE WHEN substr(md5('cer:' || CAST(doc_id AS VARCHAR) || " +
        "':' || CAST(i - 1 AS VARCHAR) || ':' || toks[CAST(i AS INT)])" +
        ", 1, 1) = '0' THEN NULL " +
        "WHEN substr(md5('cer:' || CAST(doc_id AS VARCHAR) || ':' || " +
        "CAST(i - 1 AS VARCHAR) || ':' || toks[CAST(i AS INT)]), 1, 1) " +
        "IN ('1', '2') THEN 'zzz' ELSE toks[CAST(i AS INT)] END), " +
        "x -> x IS NOT NULL), ' ') AS hyp " +
        "FROM tk WHERE len(toks) > 0) " +
        "SELECT doc_id, CAST(length(ref) AS BIGINT) AS ref_chars, " +
        "CAST(levenshtein(ref, hyp) AS BIGINT) AS dist, " +
        "CAST(levenshtein(ref, hyp)::BIGINT * 1000000 // length(ref) " +
        "AS BIGINT) AS cer_micro " +
        "FROM h ORDER BY doc_id"),

    // same directed-stub fold, HUGEINT products mirroring the
    // decimal(38,0) casts, same 0 sentinel on a flat degree sequence
    "q361_degree_assortativity" ->
      (s"WITH it AS MATERIALIZED ($itemsCte), " +
        s"ed AS MATERIALIZED ($coEdgeCte), " +
        "sym AS MATERIALIZED (SELECT lo AS src, hi AS dst FROM ed " +
        "UNION ALL SELECT hi, lo FROM ed), " +
        "dg AS (SELECT src, COUNT(*) AS dgr FROM sym GROUP BY 1), " +
        "st AS (SELECT a.dgr::HUGEINT AS dx, b.dgr::HUGEINT AS dy " +
        "FROM sym s JOIN dg a ON s.src = a.src " +
        "JOIN dg b ON s.dst = b.src), " +
        "f AS (SELECT COUNT(*)::HUGEINT AS m, SUM(dx) AS sx, " +
        "SUM(dx * dx) AS sxx, SUM(dx * dy) AS sxy FROM st) " +
        "SELECT CAST(m AS BIGINT) AS m_stubs, CAST(sx AS BIGINT) " +
        "AS sum_deg, CAST(m * sxy - sx * sx AS BIGINT) AS num, " +
        "CAST(m * sxx - sx * sx AS BIGINT) AS den, " +
        "CAST(CASE WHEN m * sxx - sx * sx > 0 THEN " +
        "(m * sxy - sx * sx) * 1000000 // (m * sxx - sx * sx) " +
        "ELSE 0 END AS BIGINT) AS assort_micro FROM f"),

    // same two rankings (BM25 replayed from the q59 chain, exact tf
    // counts), same rounded-score rank order, same pinned weight
    // ladder and floored contributions
    "q377_rbo_rankers" -> {
      val wVals = RboWeights.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
      s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks " +
        "FROM documents), " +
        "x AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl " +
        "FROM tk WHERE len(toks) > 0), " +
        "st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl " +
        "FROM x), " +
        "t AS (SELECT doc_id, dl, unnest(toks) AS term FROM x), " +
        "tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tfc " +
        "FROM t WHERE term IN ('join', 'hash', 'vector', 'stream') " +
        "GROUP BY doc_id, dl, term), " +
        "dft AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfc " +
        "FROM tf GROUP BY term), " +
        "sc AS (SELECT tf.doc_id, tf.term, " +
        s"ln(1 + (st.nd - dft.dfc + 0.5) / (dft.dfc + 0.5)) * " +
        s"(tf.tfc * ${Relevance.K1 + 1d}) / " +
        s"(tf.tfc + ${Relevance.K1} * (${1d - Relevance.B} + " +
        s"${Relevance.B} * tf.dl / st.avgdl)) AS s " +
        "FROM tf JOIN dft USING (term) CROSS JOIN st), " +
        "agg AS (SELECT doc_id, " +
        "list_reduce(list(s ORDER BY term), (a, b) -> a + b) AS score " +
        "FROM sc GROUP BY doc_id), " +
        "atop AS (SELECT doc_id, round(score, 6) AS rs FROM agg " +
        "ORDER BY score DESC, doc_id LIMIT 10), " +
        "ra AS (SELECT doc_id, " +
        "row_number() OVER (ORDER BY rs DESC, doc_id) AS ra FROM atop), " +
        "btf AS (SELECT doc_id, COUNT(*) AS c FROM t " +
        "WHERE term IN ('join', 'hash', 'vector', 'stream') GROUP BY 1), " +
        "btop AS (SELECT doc_id, c FROM btf " +
        "ORDER BY c DESC, doc_id LIMIT 10), " +
        "rb AS (SELECT doc_id, " +
        "row_number() OVER (ORDER BY c DESC, doc_id) AS rb FROM btop), " +
        "j AS (SELECT ra.ra, rb.rb FROM ra JOIN rb USING (doc_id)), " +
        "dep AS (SELECT unnest(range(1, 11)) AS depth), " +
        "ov AS (SELECT depth, (SELECT COUNT(*) FROM j " +
        "WHERE j.ra <= depth AND j.rb <= depth) AS cum FROM dep), " +
        s"w AS (SELECT * FROM (VALUES $wVals) t(depth, wm)), " +
        "pd AS (SELECT ov.depth, cum AS cum_overlap, " +
        "wm * cum // ov.depth AS contrib_micro " +
        "FROM ov JOIN w ON w.depth = ov.depth) " +
        "SELECT * FROM (SELECT CAST(depth AS BIGINT) AS depth, " +
        "CAST(cum_overlap AS BIGINT) AS cum_overlap, " +
        "CAST(contrib_micro AS BIGINT) AS contrib_micro FROM pd " +
        "UNION ALL SELECT -1, " +
        "(SELECT CAST(MAX(cum_overlap) AS BIGINT) FROM pd), " +
        "(SELECT CAST(SUM(contrib_micro) AS BIGINT) FROM pd)) " +
        "ORDER BY depth"
    },

    // both min-label fixpoints as recursive CTEs (the q38 chain) over
    // the original graph and its double cover, same label comparison
    "q376_bipartite_check" ->
      (s"WITH RECURSIVE it AS MATERIALIZED ($itemsCte), " +
        s"ed AS MATERIALIZED ($coEdgeCte), " +
        "sym AS MATERIALIZED (SELECT lo AS src, hi AS dst FROM ed " +
        "UNION ALL SELECT hi, lo FROM ed), " +
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM sym), " +
        "cc(id, lbl) AS (SELECT v, v FROM nodes " +
        "UNION SELECT e.dst, c.lbl FROM cc c JOIN sym e ON e.src = c.id), " +
        "basecc AS MATERIALIZED (SELECT id, MIN(lbl) AS comp " +
        "FROM cc GROUP BY 1), " +
        "cov AS MATERIALIZED (SELECT src * 2 AS src, dst * 2 + 1 AS dst " +
        "FROM sym UNION ALL SELECT src * 2 + 1, dst * 2 FROM sym), " +
        "covnodes AS (SELECT v * 2 AS cv FROM nodes " +
        "UNION ALL SELECT v * 2 + 1 FROM nodes), " +
        "cc2(id, lbl) AS (SELECT cv, cv FROM covnodes " +
        "UNION SELECT e.dst, c.lbl FROM cc2 c JOIN cov e ON e.src = c.id), " +
        "covcc AS MATERIALIZED (SELECT id, MIN(lbl) AS comp " +
        "FROM cc2 GROUP BY 1), " +
        "ec AS (SELECT b.comp, COUNT(*) AS n_edges FROM ed " +
        "JOIN basecc b ON b.id = ed.lo GROUP BY 1), " +
        "j AS (SELECT n.v, b.comp, c0.comp AS l0, c1.comp AS l1 " +
        "FROM nodes n JOIN basecc b ON b.id = n.v " +
        "JOIN covcc c0 ON c0.id = n.v * 2 " +
        "JOIN covcc c1 ON c1.id = n.v * 2 + 1) " +
        "SELECT j.comp AS component, COUNT(*) AS n_nodes, " +
        "CAST(MAX(ec.n_edges) AS BIGINT) AS n_edges, " +
        "BOOL_AND(j.l0 <> j.l1) AS bipartite " +
        "FROM j JOIN ec ON ec.comp = j.comp " +
        "GROUP BY 1 ORDER BY 1"),

    // the identical 8 unrolled power-iteration rounds as MATERIALIZED
    // CTEs: same scatter matrix common-denominator form, HUGEINT
    // products, same max-abs floored renormalization and pinned sign
    "q374_pca_power" -> {
      val sb = new StringBuilder
      sb ++= "WITH p AS MATERIALIZED (SELECT list_transform(embedding, " +
        "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v " +
        "FROM embeddings), " +
        "xs AS MATERIALIZED (SELECT v, unnest(range(1, 65)) AS i FROM p), " +
        "cell AS MATERIALIZED (SELECT v, i, unnest(range(i, 65)) AS j " +
        "FROM xs), " +
        "m AS MATERIALIZED (SELECT i, j, " +
        "SUM(v[CAST(i AS INT)]::HUGEINT * v[CAST(j AS INT)]) AS m " +
        "FROM cell GROUP BY 1, 2), " +
        "si AS MATERIALIZED (SELECT i, " +
        "CAST(SUM(v[CAST(i AS INT)]) AS HUGEINT) AS si " +
        "FROM xs GROUP BY 1), " +
        "nn AS (SELECT COUNT(*)::HUGEINT AS n FROM p), " +
        "cf AS MATERIALIZED (SELECT i, j, m FROM m " +
        "UNION ALL SELECT j, i, m FROM m WHERE i <> j), " +
        "c AS MATERIALIZED (SELECT cf.i, cf.j, " +
        "nn.n * cf.m - a.si * b.si AS cij " +
        "FROM cf JOIN si a ON a.i = cf.i JOIN si b ON b.i = cf.j " +
        "CROSS JOIN nn), " +
        "w0 AS MATERIALIZED (SELECT unnest(range(1, 65)) AS j, " +
        "1000000::HUGEINT AS wj)"
      for (r <- 1 to 8) {
        sb ++= s", cw$r AS MATERIALIZED (SELECT c.i, " +
          s"SUM(cij * wj) AS cw FROM c JOIN w${r - 1} " +
          s"ON w${r - 1}.j = c.j GROUP BY 1)"
        sb ++= s", mx$r AS (SELECT MAX(abs(cw)) AS mx FROM cw$r)"
        sb ++= s", w$r AS MATERIALIZED (SELECT i AS j, " +
          s"cw * 1000000 // mx AS wj FROM cw$r CROSS JOIN mx$r)"
      }
      sb ++= ", sg AS (SELECT CASE WHEN wj >= 0 THEN 1 ELSE -1 END " +
        "AS sg FROM w8 WHERE wj <> 0 ORDER BY j LIMIT 1) " +
        "SELECT CAST(j AS BIGINT) AS dim, CAST(wj * sg AS BIGINT) " +
        "AS w_micro FROM w8 CROSS JOIN sg ORDER BY dim"
      sb.toString
    },

    // same mill-int vectors, same common-denominator difference
    // numerators, HUGEINT squares, same sum-of-floored-contribs
    // total row at dim = -1
    "q362_mmd_shift" ->
      ("WITH p AS (SELECT vec_id, vec_id % 2 AS s, " +
        "list_transform(embedding, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v " +
        "FROM embeddings), " +
        "n AS (SELECT CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) " +
        "AS HUGEINT) AS na, CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 " +
        "END) AS HUGEINT) AS nb FROM p), " +
        "x AS (SELECT s, i AS dim, v[CAST(i AS INT)] AS mv " +
        "FROM p, range(1, 65) t(i)), " +
        "g AS (SELECT dim, CAST(SUM(CASE WHEN s = 0 THEN mv ELSE 0 " +
        "END) AS HUGEINT) AS sa, CAST(SUM(CASE WHEN s = 1 THEN mv " +
        "ELSE 0 END) AS HUGEINT) AS sb FROM x GROUP BY 1), " +
        "pd AS (SELECT dim, na, nb, sa * nb - sb * na AS dn " +
        "FROM g CROSS JOIN n) " +
        "SELECT CAST(dim AS BIGINT) AS dim, CAST(na AS BIGINT) AS na, " +
        "CAST(nb AS BIGINT) AS nb, CAST(dn AS BIGINT) AS diff_num, " +
        "CAST(dn * 1000 // (na * nb) AS BIGINT) AS mean_diff_micro, " +
        "CAST(dn * dn // (na * nb * na * nb) AS BIGINT) AS contrib_micro " +
        "FROM pd " +
        "UNION ALL SELECT -1, CAST(na AS BIGINT), CAST(nb AS BIGINT), " +
        "0, 0, CAST(SUM(dn * dn // (na * nb * na * nb)) AS BIGINT) " +
        "FROM pd GROUP BY na, nb ORDER BY dim"),

    // the identical 8-round farthest-point replay as materialized
    // CTEs: same mill-int vectors, same exact d², same (d² desc,
    // vec_id) argmax
    "q360_kcenter_seeds" -> {
      val d2 = (a: String, b: String) =>
        s"list_sum(list_transform(range(1, 65), i -> " +
          s"($a[i] - $b[i]) * ($a[i] - $b[i])))"
      val sb = new StringBuilder
      sb ++= "WITH p AS MATERIALIZED (SELECT vec_id, " +
        "list_transform(embedding, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v " +
        "FROM embeddings), " +
        "s0 AS MATERIALIZED (SELECT vec_id AS sid, v AS sv FROM p " +
        "ORDER BY vec_id LIMIT 1), " +
        "st0 AS MATERIALIZED (SELECT p.vec_id, p.v, " +
        s"${d2("p.v", "s.sv")} AS d2min FROM p CROSS JOIN s0 s)"
      for (r <- 1 to 8) {
        sb ++= s", pk$r AS MATERIALIZED (SELECT vec_id AS sid, v AS sv, " +
          s"d2min AS radius2 FROM st${r - 1} " +
          "ORDER BY d2min DESC, vec_id LIMIT 1)"
        if (r < 8)
          sb ++= s", st$r AS MATERIALIZED (SELECT t.vec_id, t.v, " +
            s"LEAST(t.d2min, ${d2("t.v", "k.sv")}) AS d2min " +
            s"FROM st${r - 1} t CROSS JOIN pk$r k)"
      }
      sb ++= " SELECT * FROM (" +
        (1 to 8).map(r => s"SELECT CAST($r AS BIGINT) AS round, " +
          s"sid AS seed_id, CAST(radius2 AS BIGINT) AS radius2 FROM pk$r")
          .mkString(" UNION ALL ") +
        ") ORDER BY round"
      sb.toString
    },

    // same md5 attempts, same falling-factorial binomial ratio and
    // c > n−k short-circuit
    "q356_pass_at_k" -> {
      def passK(k: Int): String = {
        val num = (0 until k).map(i => s"(10 - c - $i)").mkString(" * ")
        val den = (0 until k).map(i => 10L - i).product
        s"CAST(CASE WHEN c > ${10 - k} THEN 1000000 " +
          s"ELSE 1000000 - ($num * 1000000) // $den END AS BIGINT)"
      }
      "WITH a AS (SELECT doc_id AS task_id, " +
        "unnest(generate_series(0, 9)) AS j FROM documents " +
        "WHERE doc_id < 50), " +
        "o AS (SELECT task_id, CASE WHEN ('0x' || " +
        "substr(md5('pk:' || task_id || ':' || j), 1, 8))::BIGINT % 4 = 0 " +
        "THEN 1 ELSE 0 END AS ok FROM a), " +
        "t AS (SELECT task_id, CAST(SUM(ok) AS BIGINT) AS c FROM o " +
        "GROUP BY 1) " +
        "SELECT task_id, c, " +
        s"${passK(1)} AS pass1_micro, " +
        s"${passK(5)} AS pass5_micro, " +
        s"${passK(10)} AS pass10_micro " +
        "FROM t ORDER BY task_id"
    }
  )
}
