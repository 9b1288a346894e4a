package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 corpus-curation operators: per-domain caps, C4-style
  * repeated-block removal, and perceptual-hash image dedup over the
  * REAL image codec.
  *
  * Same contract as [[PipelineQueries]]: DuckDB oracle per query,
  * identical column names and total ordering, integer arithmetic
  * wherever a sum crosses engines.
  */
object CurationQueries {

  import PipelineQueries.{docs, duckNorm, embs, duckShingleCtes, duckSigBandCtes}

  private def events(s: SparkSession, dir: String) =
    graft.Tables.load(s, dir, "events")

  /** q131/q220's image near-dup pairs: aHash (8×8 mean threshold)
    * over the REAL PNG codec for the asset set (originals
    * doc_id < 100, brightened twins at +100), 8-bit band blocking
    * (pigeonhole-complete for Hamming ≤ 7), bit_count verify —
    * (a_id, b_id, hamming), never all-pairs.
    */
  private def phashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = docs(s, d).where(col("doc_id") < 100)
      .select(col("doc_id")).as[Long]
    val hashed = ids.mapPartitions { it =>
      it.flatMap { bid =>
        Seq(
          (bid, Multimodal.synthImagePng(bid)),
          (bid + 100, Multimodal.synthImagePngTwin(bid))
        ).map { case (id, png) =>
          val raw = Multimodal.ImageCodec.decode(png, "png")
          val small = Multimodal.ImageCodec.resize(raw, 8, 8)
          val v = new Array[Long](64)
          var s64 = 0L
          var p = 0
          while (p < 64) {
            val o = 8 + p * 3
            v(p) = (small(o) & 0xff) + (small(o + 1) & 0xff) +
              (small(o + 2) & 0xff)
            s64 += v(p)
            p += 1
          }
          var hash = 0L
          p = 0
          while (p < 64) {
            if (64L * v(p) > s64) hash |= (1L << p)
            p += 1
          }
          (id, hash)
        }
      }
    }.toDF("id", "hash")
    val banded = hashed.select(col("id"), col("hash"),
        explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("bv", expr("shiftright(hash, band * 8) & 255"))
    banded.select(col("id").as("a_id"), col("hash").as("a_hash"),
        col("band"), col("bv"))
      .join(banded.select(col("id").as("b_id"), col("hash").as("b_hash"),
        col("band"), col("bv")), Seq("band", "bv"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_hash ^ b_hash)").cast("long").as("hamming"))
      .where(col("hamming") <= 7)
      .distinct()
  }

  /** q224/q263's deterministic preference tournament: each md5
    * bucket's two lowest-ord documents face off, longer document wins
    * (doc_id tie-break) — the harness stand-in for human preference
    * labels. Pair generation is one bucket-key shuffle with bounded
    * per-bucket windows; returns (winner, loser) source rows.
    */
  private def tournamentOutcomes(s: SparkSession, d: String): DataFrame = {
    val d0 = docs(s, d).select(col("doc_id"), col("source"), col("n_chars"),
      (conv(substring(md5(concat(lit("bt:"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 300).as("bkt"),
      conv(substring(md5(concat(lit("ord:"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long").as("ord"))
    val wb = Window.partitionBy("bkt").orderBy(col("ord"), col("doc_id"))
    val top2 = d0.withColumn("rn", row_number().over(wb))
      .where(col("rn") <= 2)
    val duel = top2.groupBy("bkt")
      .agg(max(when(col("rn") === 1,
          struct(col("source"), col("n_chars"), col("doc_id")))).as("x"),
        max(when(col("rn") === 2,
          struct(col("source"), col("n_chars"), col("doc_id")))).as("y"))
      .where(col("y").isNotNull && col("x.source") =!= col("y.source"))
    duel.select(
      when(col("x.n_chars") > col("y.n_chars") ||
          (col("x.n_chars") === col("y.n_chars") &&
            col("x.doc_id") < col("y.doc_id")),
        struct(col("x.source").as("w"), col("y.source").as("l")))
        .otherwise(struct(col("y.source").as("w"), col("x.source").as("l")))
        .as("p"))
      .select(col("p.w").as("winner"), col("p.l").as("loser"))
  }

  /** q130's injected boilerplate: exactly one 5-token block, prepended
    * to every third document, already in normalized form so the Spark
    * and DuckDB normalizations agree on the concatenation.
    */
  private val Banner = "begin legal banner text here"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q261 — FELLEGI-SUNTER PROBABILISTIC LINKAGE: the statistical
    // tier above q151's thresholded Jaro-Winkler — per-feature
    // agreement weights LEARNED FROM THE DATA (ln(m/u): how much more
    // often matches agree on a feature than non-matches do), summed
    // into a pair score with a 0-log-odds decision. The harness
    // plants truth the estimator must recover (the docsWithDups
    // move): 20% of parts get a mutated twin (first name char → 'z',
    // brand/size/type kept), truth = (id_b − id_a = 10⁷). Features:
    // JW ≥ 0.9, 4-char name prefix, type equality. m/u rates are
    // Laplace-smoothed integer counts; weights are micro-log
    // DIFFERENCES of exact integer products (the q77 idiom — no
    // float division before the log).
    // Scale design (the round-9 fix — enumerating every blocked pair
    // TWICE and sorting them all measured α_tail 1.05): both
    // estimation legs are LINEAR — m-rates from the labeled truth via
    // its keyed equi-join (id, id+10⁷), u-rates from the classic
    // random-pairing estimator (each record paired once with its
    // md5-ring neighbor inside 256 bounded shards — one window pass,
    // N/2 pairs, the textbook "u = agreement among random pairs"
    // form, truth-diff pairs excluded) — and the q151 measured
    // blocked enumeration then runs ONCE, pipelined straight into the
    // ≥ 0 log-odds DECISION: the operator emits the match set (what a
    // linkage deployment keeps), never a sorted all-candidates dump.
    "q261_fellegi_sunter" -> ((s, d) => {
      val p0 = graft.Tables.load(s, d, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"),
          col("p_brand").as("brand"), col("p_size").as("size"),
          col("p_type").as("ptype"))
      val twins = p0.where(col("id") % 5 === 0)
        .select((col("id") + 10000000L).as("id"),
          concat(lit("z"), expr("substring(name, 2)")).as("name"),
          col("brand"), col("size"), col("ptype"))
      val u = p0.unionByName(twins)
      val gcols = Seq(
        (round(expr("jaro_winkler(name_a, name_b)"), 6) >= 0.9).as("g1"),
        (expr("substring(name_a, 1, 4)") ===
          expr("substring(name_b, 1, 4)")).as("g2"),
        (col("type_a") === col("type_b")).as("g3"))
      // m-rates: the planted truth is a KEYED join — linear, never
      // rediscovered through block enumeration
      val mp = p0.where(col("id") % 5 === 0)
        .select(col("id").as("id_a"), col("name").as("name_a"),
          col("ptype").as("type_a"))
        .join(twins.select(col("id").as("id_b"), col("name").as("name_b"),
          col("ptype").as("type_b")),
          col("id_b") === col("id_a") + 10000000L)
        .select(gcols: _*)
      val mEst = mp.agg(count(lit(1)).as("mden"),
        sum(when(col("g1"), 1L).otherwise(0L)).as("m1"),
        sum(when(col("g2"), 1L).otherwise(0L)).as("m2"),
        sum(when(col("g3"), 1L).otherwise(0L)).as("m3"))
      // u-rates: md5-ring random pairing (deterministic, shard-bounded
      // windows — no global sort), accidental truth pairs excluded
      val wRing = Window.partitionBy("shard").orderBy("h", "id")
      val ring = u
        .withColumn("h", expr("cast(conv(substring(" +
          "md5(concat('fs:', id)), 1, 15), 16, 10) as bigint)"))
        .withColumn("shard", pmod(col("h"), lit(256L)))
        .withColumn("rn", row_number().over(wRing))
      val ra = ring.where(col("rn") % 2 === 1)
        .select(col("shard"), expr("(rn + 1) div 2").as("k"),
          col("id").as("id_a"), col("name").as("name_a"),
          col("ptype").as("type_a"))
      val rb = ring.where(col("rn") % 2 === 0)
        .select(col("shard"), expr("rn div 2").as("k"),
          col("id").as("id_b"), col("name").as("name_b"),
          col("ptype").as("type_b"))
      val rp = ra.join(rb, Seq("shard", "k"))
        .where(abs(col("id_a") - col("id_b")) =!= 10000000L)
        .select(gcols: _*)
      val uEst = rp.agg(count(lit(1)).as("uden"),
        sum(when(col("g1"), 1L).otherwise(0L)).as("u1"),
        sum(when(col("g2"), 1L).otherwise(0L)).as("u2"),
        sum(when(col("g3"), 1L).otherwise(0L)).as("u3"))
      // scoring leg: q151's measured blocking, ONE pass, decision cut
      val a = u.toDF("id_a", "name_a", "brand", "size", "type_a")
      val b = u.toDF("id_b", "name_b", "brand", "size", "type_b")
      val pairs = a.join(b, Seq("brand", "size"))
        .where(col("id_a") < col("id_b"))
        .where(greatest(length(col("name_a")), length(col("name_b"))) <=
          least(length(col("name_a")), length(col("name_b"))) * 4)
        .select(Seq(col("id_a"), col("id_b"),
          (col("id_b") - col("id_a") === 10000000L).as("is_true")) ++
          gcols: _*)
      def ml(x: String) = s"floor(ln($x) * 1000000)"
      def wa(f: Int) = s"(${ml(s"(m$f + 1) * (uden + 2)")} " +
        s"- ${ml(s"(u$f + 1) * (mden + 2)")})"
      def wd(f: Int) = s"(${ml(s"(mden + 1 - m$f) * (uden + 2)")} " +
        s"- ${ml(s"(uden + 1 - u$f) * (mden + 2)")})"
      val score = (1 to 3).map(f =>
        s"(case when g$f then ${wa(f)} else ${wd(f)} end)").mkString(" + ")
      pairs.crossJoin(broadcast(mEst)).crossJoin(broadcast(uEst))
        .select(col("id_a"), col("id_b"), col("is_true"),
          expr(s"cast($score as bigint)").as("score_micro"))
        .where(col("score_micro") >= 0L)
        .orderBy("id_a", "id_b")
    }),

    // q246 — BLOCKING-QUALITY AUDIT: the meta-evaluation of q151/
    // q170's entity-matching blocking (the q234/q230 audit family,
    // turned on record linkage): PAIR COMPLETENESS = what fraction of
    // true matches (Jaro-Winkler ≥ 0.85, blocking-free) the
    // (brand,size)+length-band blocking retains, and REDUCTION RATIO
    // = what fraction of the quadratic pair space it prunes.
    // Scale split (the round-9 fix — a 10% key sample still grows
    // with the corpus, so its all-pairs truth leg measured α_tail
    // 1.31): RR needs NO pair enumeration at all — candidate counts
    // come exactly from the (brand, size, name-length) histogram
    // (Σ c_i·c_j over band-compatible length cells + C(c,2) on the
    // diagonal; the length domain is a few dozen cells per block),
    // and the full pair space is C(N,2) in closed form over
    // decimal(38) — both EXACT on the whole corpus at any scale. PC
    // keeps the inherently quadratic truth leg but on a FIXED-SIZE
    // deterministic sample (the 1024 md5-lowest ids — the q234
    // sampled-audit contract, constant cost at any corpus size):
    // n_true/n_found/pc_micro are the sample's estimate of the same
    // corpus ratio. Both ratios in integer micros; zero-truth edge
    // total by a CASE.
    "q246_blocking_audit" -> ((s, d) => {
      val p = graft.Tables.load(s, d, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"),
          col("p_brand").as("brand"), col("p_size").as("size"))
      val nTot = p.agg(count(lit(1)).as("n"))
      val hist = p.groupBy(col("brand"), col("size"),
        length(col("name")).as("len")).agg(count(lit(1)).as("c"))
      val candCnt = hist.toDF("brand", "size", "len_a", "ca")
        .join(hist.toDF("brand", "size", "len_b", "cb"),
          Seq("brand", "size"))
        .where(col("len_a") <= col("len_b") &&
          col("len_b") <= col("len_a") * 4)
        .agg(coalesce(sum(when(col("len_a") < col("len_b"),
          col("ca") * col("cb"))
          .otherwise(expr("ca * (ca - 1) div 2"))), lit(0L)).as("n_cand"))
      val samp = p
        .withColumn("h", expr("cast(conv(substring(" +
          "md5(concat('aud:', id)), 1, 15), 16, 10) as bigint)"))
        .orderBy("h").limit(1024)
        .select("id", "name", "brand", "size")
      val a = samp.toDF("id_a", "name_a", "brand_a", "size_a")
      val b = samp.toDF("id_b", "name_b", "brand_b", "size_b")
      val truth = a.join(b, col("id_a") < col("id_b"))
        .withColumn("is_true",
          round(expr("jaro_winkler(name_a, name_b)"), 6) >= 0.85)
        .withColumn("is_cand", col("brand_a") === col("brand_b") &&
          col("size_a") === col("size_b") &&
          greatest(length(col("name_a")), length(col("name_b"))) <=
            least(length(col("name_a")), length(col("name_b"))) * 4)
        .agg(sum(when(col("is_true"), 1L).otherwise(0L)).as("n_true"),
          sum(when(col("is_true") && col("is_cand"), 1L).otherwise(0L))
            .as("n_found"))
      nTot.crossJoin(broadcast(candCnt)).crossJoin(broadcast(truth))
        .select(
          expr("cast(cast(n as decimal(38,0)) * (n - 1) div 2 as bigint)")
            .as("n_all_pairs"),
          col("n_true"), col("n_cand"), col("n_found"),
          expr("case when n_true = 0 then 1000000 " +
            "else n_found * 1000000 div n_true end").as("pc_micro"),
          expr("cast((cast(n as decimal(38,0)) * (n - 1) div 2 - n_cand) " +
            "* 1000000 div (cast(n as decimal(38,0)) * (n - 1) div 2) " +
            "as bigint)").as("rr_micro"))
    }),

    // q242 — WATER-FILLING TOKEN BUDGET: the fair-share allocator a
    // mixture designer runs when a training budget T must be split
    // across sources "as equally as the caps allow" (the max-min-
    // fairness dual of q43's fixed-rate caps and q213's quota
    // apportionment): every source gets min(cap, λ) where the water
    // level λ makes the allocations sum to T. Exact integer solution,
    // NO iteration: sort sources by cap asc; source i is fully
    // consumed (capped) iff cap_i·(n−i+1) + prefix_{i−1} ≤ T — a
    // DIVISION-FREE predicate, monotone along the sort, so k =
    // #capped and λ = (T − prefix_k) div (n−k); the integer remainder
    // goes one unit each to the first (T − prefix_k) mod (n−k)
    // uncapped sources in sort order (uncapped ⇒ cap ≥ λ+1, so the
    // bonus never breaches a cap; Σalloc = T exactly). Plan: one
    // partial-agg groupBy builds the |sources|-row cap table; every
    // window runs on that bounded table — leaderboard-sized at any
    // corpus scale (the q224 contract). Here cap = source's total
    // chars and T = 90% of the corpus (high enough that small sources saturate, so both branches are exercised).
    "q242_waterfill_budget" -> ((s, d) => {
      val wOrd = Window.orderBy(col("cap"), col("source"))
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      docs(s, d).groupBy("source")
        .agg(sum("n_chars").as("cap"))
        .withColumn("i", row_number().over(wOrd).cast("long"))
        .withColumn("prefix", sum("cap").over(wCum))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("tbudget", expr("(sum(cap) over ()) * 9 div 10"))
        .withColumn("capped",
          expr("cap * (n - i + 1) + (prefix - cap) <= tbudget"))
        .withColumn("k",
          sum(when(col("capped"), 1L).otherwise(0L)).over(wAll))
        .withColumn("pk",
          sum(when(col("capped"), col("cap")).otherwise(0L)).over(wAll))
        .withColumn("lam", expr("(tbudget - pk) div (n - k)"))
        .withColumn("rem", expr("(tbudget - pk) % (n - k)"))
        .select(col("source"), col("cap").as("cap_chars"),
          col("tbudget").as("budget_chars"),
          when(col("capped"), col("cap"))
            .otherwise(expr("lam + (case when i - k <= rem then 1 " +
              "else 0 end)")).as("alloc_chars"))
        .orderBy("source")
    }),

    // q263 — PREFERENCE-TRANSITIVITY AUDIT: the consistency check an
    // RLHF/eval-data pipeline runs on its pairwise labels BEFORE
    // fitting q224's Bradley-Terry — if i beats j beats k beats i,
    // the preference signal is noise on that triple, and a high
    // cyclic-triad share means the tournament (or the annotators)
    // cannot support a total order. Net orientation: i→j iff
    // wins(i,j) > wins(j,i) (strict; ties unoriented); cyclic triads
    // counted once via the "a is the minimum node" join condition.
    // Everything after the measured q224 pair generator runs on the
    // ≤|sources|² bounded matrix (the q224 contract); the oracle
    // replays tournament, orientation, and triad join.
    "q263_preference_cycles" -> ((s, d) => {
      val net = tournamentOutcomes(s, d).groupBy("winner", "loser")
        .agg(count(lit(1)).as("nw"))
      val fwd = net.select(col("winner").as("a"), col("loser").as("b"),
        col("nw"))
      val rev = net.select(col("loser").as("a"), col("winner").as("b"),
        col("nw").as("nw_rev"))
      val ed = fwd.join(rev, Seq("a", "b"), "left")
        .where(col("nw") > coalesce(col("nw_rev"), lit(0L)))
        .select("a", "b")
      val cyc = ed.toDF("a", "b")
        .join(ed.toDF("b", "c"), "b")
        .join(ed.toDF("c", "a2"), "c")
        .where(col("a2") === col("a") && col("a") < col("b") &&
          col("a") < col("c"))
      val srcs = net.select(col("winner").as("s"))
        .unionByName(net.select(col("loser").as("s"))).distinct()
      srcs.agg(count(lit(1)).as("n_sources"))
        .crossJoin(ed.agg(count(lit(1)).as("n_edges")))
        .crossJoin(cyc.agg(count(lit(1)).as("n_cyclic_triads")))
    }),

    // q224 — BRADLEY-TERRY PREFERENCE RANKING: the RLHF/eval-data
    // primitive — fit per-player strengths from pairwise win/loss
    // records (the model behind Chatbot-Arena-style leaderboards and
    // preference-data quality audits). Here the "players" are the 20
    // corpus sources and the comparisons are a deterministic
    // tournament: each md5 bucket's two lowest-ord documents face
    // off, longer document wins (doc_id tie-break) — the harness
    // stand-in for human preference labels. Fit is the classic MM
    // fixed point p_i ← W_i / Σ_j n_ij/(p_i+p_j) (Hunter 2004), 15
    // synchronous rounds in integer micros (n·10¹² div (p_i+p_j),
    // then W·10¹² div D — truncating division both engines), ratings
    // normalized to micro shares at the end. Scale shape: pair
    // generation is one bucket-key shuffle (top-2 via bounded
    // row_number inside ≤N/300-row buckets) and the win matrix is a
    // partial-agg groupBy; the fixed point itself runs on the
    // collected |sources|² ≤ 400-cell matrix — bounded by design
    // (players are domains/models, not documents; the matrix is
    // leaderboard-sized at any corpus scale). The ORACLE replays the
    // identical 15 rounds as an unrolled CTE chain, so the gate
    // proves the iteration arithmetic, not just the pair counts.
    "q224_bradley_terry" -> ((s, d) => {
      import s.implicits._
      val base = tournamentOutcomes(s, d).groupBy("winner", "loser")
        .agg(count(lit(1)).as("nw"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // bounded by design: |sources|² cells (leaderboard-sized)
      val players = base.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      val wins = players.map(p =>
        p -> base.filter(_._1 == p).map(_._3).sum).toMap
      val nMat = base.groupBy(t => if (t._1 < t._2) (t._1, t._2)
          else (t._2, t._1))
        .map { case (k, v) => k -> v.map(_._3).sum }
      def n(i: String, j: String): Long =
        nMat.getOrElse(if (i < j) (i, j) else (j, i), 0L)
      // renormalize to Σp = |players|·10⁶ each round: BT strengths are
      // scale-free, and the clamp keeps every intermediate well inside
      // int64 (p ≤ Σp, so p·10¹² never overflows) — the oracle applies
      // the identical renorm CTE per round
      val targetSum = players.length * 1000000L
      var p = players.map(_ -> 1000000L).toMap
      for (_ <- 1 to 15) {
        val raw = players.map { i =>
          val den = players.filter(j => j != i && n(i, j) > 0)
            .map(j => n(i, j) * 1000000000000L / (p(i) + p(j))).sum
          i -> math.max(if (den == 0) 1000000L
            else wins(i) * 1000000000000L / den, 1L)
        }.toMap
        val rawSum = players.map(raw(_)).sum
        p = players.map(i =>
          i -> math.max(raw(i) * targetSum / rawSum, 1L)).toMap
      }
      val tot = players.map(p(_)).sum
      val rows = players.map { src =>
        (src, wins(src), players.filter(j => j != src).map(n(src, _)).sum,
          p(src) * 1000000L / tot)
      }
      s.createDataFrame(rows).toDF("source", "n_wins", "n_matches",
          "rating_micro")
        .orderBy("source")
    }),

    // q227 — READABILITY SCORES (Flesch Reading Ease + Flesch-Kincaid
    // grade): the classic document-quality features a heuristic
    // corpus filter thresholds on next to q14's surface stats and
    // q77's LM scores. Counts are plain regex totals (sentences =
    // [.!?]+ runs, syllables = vowel-group runs over the lowered
    // text — the standard approximation, identical on both engines),
    // clamped ≥ 1 so the ratios are total; both scores come out in
    // integer micros via truncating division (1.015·w/s ≡
    // 1015000·w div s). Entirely scan-side — zero shuffles beyond
    // the output order; at 100 TB this is a parquet-scan-speed
    // projection.
    "q227_readability" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          greatest(size(split(regexp_replace(lower(trim(col("text"))),
            "\\s+", " "), " ")), lit(1)).cast("long").as("n_words"),
          greatest(size(regexp_extract_all(col("text"),
            lit("[.!?]+"), lit(0))), lit(1)).cast("long").as("n_sentences"),
          greatest(size(regexp_extract_all(lower(col("text")),
            lit("[aeiouy]+"), lit(0))), lit(1)).cast("long").as("n_syllables"))
        .select(col("doc_id"), col("n_words"), col("n_sentences"),
          col("n_syllables"),
          expr("206835000 - (1015000 * n_words) div n_sentences - " +
            "(84600000 * n_syllables) div n_words").as("fre_micro"),
          expr("(390000 * n_words) div n_sentences + " +
            "(11800000 * n_syllables) div n_words - 15590000")
            .as("fk_grade_micro"))
        .orderBy("doc_id")),

    // q129 — PER-DOMAIN CAP (top-k per source by length): the corpus
    // balancing step that stops one crawl domain from dominating the
    // mix. The naive shape — row_number() OVER (PARTITION BY source)
    // on the raw corpus — sorts every source's full document set; at
    // 100 TB with a handful of huge sources that is a skewed global
    // sort. Instead: (1) one partial-agg pass builds the per-source
    // VALUE HISTOGRAM (|source|×|distinct lengths| rows); (2) the
    // exact k-th threshold per source falls out of a cumulative sum
    // over that bounded aggregate (cum - cnt < k keeps every value
    // whose rank range intersects the top k — lossless by
    // construction); (3) thresholds broadcast back as a scan-side
    // filter; (4) the exact row_number runs only on the ~k survivors
    // per source. The ORACLE is the naive window formulation, so the
    // gate proves the histogram pre-prune drops nothing.
    "q129_domain_cap" -> ((s, d) => {
      val k = 10
      val dcs = docs(s, d).select(col("source"), col("doc_id"), col("n_chars"))
      val hist = dcs.groupBy("source", "n_chars").agg(count(lit(1)).as("cnt"))
      val wh = Window.partitionBy("source").orderBy(col("n_chars").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = hist
        .withColumn("cum", sum("cnt").over(wh))
        .where(col("cum") - col("cnt") < k)
        .groupBy("source").agg(min("n_chars").as("thr"))
      val wr = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
      dcs.join(broadcast(thr), "source")
        .where(col("n_chars") >= col("thr"))
        .withColumn("rk", row_number().over(wr))
        .where(col("rk") <= k)
        .select(col("source"), col("doc_id"), col("n_chars"), col("rk"))
        .orderBy("source", "doc_id")
    }),

    // q130 — REPEATED-BLOCK REMOVAL (the C4/CCNet line-dedup rule in
    // block form): any 5-token block appearing in >= 3 DISTINCT
    // documents is boilerplate; documents are rebuilt from their
    // surviving blocks in order. A deterministic banner on every
    // third document plants the boilerplate the rule must find. Scale
    // shape: blocks are non-overlapping (corpus token count total,
    // not xN like shingles), the df count is one partial-agg groupBy
    // over block HASHES' text (never full documents), and the rebuild
    // groups by doc_id — text shuffles once, in blocks. Output keeps
    // md5(new_text) (not the text) so result rows stay narrow.
    "q130_block_dedup" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"),
        TextOps.tokens(
          when(col("doc_id") % 3 === 0, concat(lit(Banner + " "), col("text")))
            .otherwise(col("text"))).as("toks"))
        .withColumn("n_blocks", expr("(size(toks) + 4) div 5").cast("long"))
      val blocks = base.select(col("doc_id"), col("n_blocks"),
          posexplode(transform(
            sequence(lit(0), col("n_blocks").cast("int") - 1),
            i => array_join(slice(col("toks"), i * 5 + 1, lit(5)), " "))))
        .withColumnRenamed("pos", "i").withColumnRenamed("col", "b")
        // both the df rollup and the join back key on the 32-char md5
        // fingerprint, never the block text — the block-sized shuffles
        // carry fixed-width keys (the q65 incremental-dedup rule)
        .withColumn("bh", md5(col("b")))
      val dfc = blocks.groupBy("bh")
        .agg(countDistinct("doc_id").as("df"))
      val kept = blocks.join(dfc, "bh").where(col("df") < 3)
      val rebuilt = kept.groupBy("doc_id").agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("i"), col("b")))),
          x => x.getField("b")), " ").as("t2"))
      base.select(col("doc_id"), col("n_blocks"))
        .join(rebuilt, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_blocks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          md5(coalesce(col("t2"), lit(""))).as("text_md5"))
        .orderBy("doc_id")
    }),

    // q133 — BPE MERGE TRAINING: five byte-pair-encoding merges
    // learned from the corpus's own word-frequency table — the
    // tokenizer-training step of an LLM pipeline, trained the way the
    // canonical implementation does (on the vocabulary, weighted by
    // word count — see [[Bpe.train]] for the round shape and the
    // 1-row argmax collect). The ORACLE replays all five rounds in
    // SQL: pair counting, argmax with the same tie-break, and the
    // left-to-right merge application via plain `replace` — so a
    // wrong pair count, a tie broken differently, or an overlapping
    // merge application diverges immediately and every later round
    // amplifies the difference.
    "q133_bpe_train" -> ((s, d) => {
      val words = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .where(col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      Bpe.train(s, words, "w", "cnt", steps = 5).orderBy("step")
    }),

    // q373 — WORDPIECE MERGE TRAINING: the likelihood-scored merge
    // rule (Schuster & Nakajima — count(ab)/(count(a)·count(b)))
    // completing the tokenizer-training trio next to q133's
    // count-greedy BPE and q358's Viterbi unigram-LM; BPE and
    // WordPiece genuinely diverge on this corpus (a frequent pair of
    // two very frequent symbols loses to a rarer but more
    // "surprising" pair), and the gate pins the learned rules AND
    // their floored pico scores. Same round shape as q133: the
    // corpus is touched once for word counts; each round is two
    // vocabulary-sized partial aggs + a 1-row argmax collect; the
    // oracle replays all 5 rounds as CTEs with HUGEINT score
    // products.
    "q373_wordpiece_train" -> ((s, d) => {
      val words = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .where(col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      Bpe.trainWordPiece(s, words, "w", "cnt", steps = 5).orderBy("step")
    }),

    // q202 — BPE ENCODE (tokenizer APPLICATION, q133's pair): the
    // trained merges applied to every word occurrence in the corpus,
    // reduced to per-document BPE token counts — the "how many tokens
    // is my corpus" question every training-data budget starts from,
    // answered with the corpus's OWN tokenizer. The rule list is the
    // bounded training output (5 rows — the q133 argmax-collect
    // pattern); application is [[Bpe.encodeExpr]]'s scan-side replace
    // chain (no shuffle, no per-row lookup), and the only aggregation
    // is one per-doc partial-agg groupBy. The ORACLE replays training
    // AND applies the same 5 replaces to every word per document, so
    // a drifted rule, a wrong application order, or an off-by-one in
    // the symbol count diverges the hash.
    "q202_bpe_encode" -> ((s, d) => {
      val words = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .where(col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      val merges = Bpe.train(s, words, "w", "cnt", steps = 5)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      docs(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        .where(col("w").rlike("^[a-z0-9]+$"))
        .select(col("doc_id"),
          (size(split(Bpe.encodeExpr(col("w"), merges), Bpe.Sep)) - 1)
            .cast("long").as("toks"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum("toks").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // q140 — NATIVE TOP-K AGGREGATE: q129's per-domain cap computed
    // by the custom `top_k` TypedImperativeAggregate instead of the
    // histogram-threshold + window composition — bounded 16·k-byte
    // state per group at every point, partial-trimmed on the
    // executors, at most k pairs per group on the exchange (see
    // [[graft.functions.TopKAgg]] for why both idiomatic
    // formulations — partition window, collect_list+slice — break on
    // a skewed source). Same oracle shape as q129 at k=3, so the
    // native aggregate is held to the exact window semantics
    // including ties.
    "q140_topk_agg" -> ((s, d) =>
      docs(s, d)
        // (score, id) = (n_chars, doc_id): top_k keeps score DESC,
        // id ASC — exactly row_number's (n_chars DESC, doc_id) order
        .groupBy("source")
        .agg(expr("top_k(n_chars, doc_id, 3)").as("tk"))
        .select(col("source"), posexplode(col("tk")))
        .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
          col("col.id").as("doc_id"), col("col.score").as("n_chars"))
        .orderBy("source", "rk")),

    // q141 — PER-GROUP DETERMINISTIC k-SAMPLE: exactly k uniform
    // documents per source — the fixed-size-per-stratum draw q61's
    // RATE sampling and q116's GLOBAL bottom-k both miss. Same
    // RNG-free md5-key construction as those two, per-group bottom-k
    // by running the negated key through the `top_k` aggregate —
    // bounded state per group, no per-source window, no global sort;
    // adding documents displaces at most one winner per source.
    "q141_group_sample" -> ((s, d) =>
      docs(s, d)
        .select(col("source"), col("doc_id"),
          conv(substring(md5(concat(lit("gs:"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long").as("h"))
        .groupBy("source")
        // k smallest hash keys == top_k of the negated key
        .agg(expr("top_k(-h, doc_id, 5)").as("tk"))
        .select(col("source"), posexplode(col("tk")))
        .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
          col("col.id").as("doc_id"), (-col("col.score")).as("h"))
        .orderBy("source", "rk")),

    // q165 — ZIPF POWER-LAW FIT (distributed closed-form OLS): the
    // corpus-health diagnostic a tokenizer/mix pass reads before
    // training — fit ln(freq) = slope·ln(rank) + intercept over the
    // vocabulary and report the exponent (healthy natural text sits
    // near slope ≈ −1). Shape: one explode + partial-agg count builds
    // the vocabulary; the head is CUT FIRST by orderBy+limit —
    // TakeOrderedAndProject, per-partition heaps, so no single node
    // ever ranks the full vocabulary — and only then ranked by a
    // window over the ≤1000 surviving rows (the head is where Zipf
    // lives); ln values floor to
    // integer micro (the q77 convention) so Σx, Σy, Σxy, Σx² are
    // exact integer sums; the OLS closed form runs on decimal(38)
    // cross-products (k·Σxy overflows a long) cast to double in a
    // pinned order. The regression itself never sees row volume —
    // it is four sums over ≤1000 points.
    "q165_zipf_fit" -> ((s, d) => {
      val wv = Window.orderBy(col("n").desc, col("token"))
      val pts = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(1000)
        .withColumn("rk", row_number().over(wv))
        .select(
          floor(log(col("rk").cast("double")) * 1000000).cast("long").as("x"),
          floor(log(col("n").cast("double")) * 1000000).cast("long").as("y"))
      pts
        .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope_raw",
          (col("k").cast("decimal(38,0)") * col("sxy") -
            col("sx").cast("decimal(38,0)") * col("sy")).cast("double") /
            (col("k").cast("decimal(38,0)") * col("sxx") -
              col("sx").cast("decimal(38,0)") * col("sx")).cast("double"))
        .select(col("k"), col("sx"), col("sy"),
          round(col("slope_raw"), 6).as("slope"),
          round((col("sy").cast("double") -
            col("slope_raw") * col("sx").cast("double")) /
            (col("k").cast("double") * 1000000.0), 6).as("intercept"))
    }),

    // q166 — NAIVE-BAYES LANGUAGE CLASSIFIER (train + infer at
    // scale): the supervised twin of q15's marker heuristic — a
    // multinomial NB model TRAINED on the corpus's own labels, then
    // applied back, reported as a confusion matrix. Everything is
    // counting: class-token counts and class totals are partial-agg
    // groupBys; the model is a |vocab|×|langs| grid (bounded — vocab
    // is top-K-able, langs is small) whose add-one log-likelihoods
    // floor to integer micro (q103's convention) so per-doc score
    // sums are order-exact; scoring joins the token stream to the
    // model ON TOKEN (the one volume-bearing shuffle — token-keyed,
    // the classifier's natural partitioning), fans ×|langs|, and
    // argmax is max-score + min-lang tie-break, both engine-portable.
    // The corpus text never moves: only (doc, token) pairs shuffle.
    "q166_nb_classify" -> ((s, d) => {
      val dd = docs(s, d)
      val tok = dd.select(col("doc_id"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("token"))
      val clt = tok.groupBy("lang", "token").agg(count(lit(1)).as("c"))
      val cls = clt.groupBy("lang").agg(sum("c").as("tl"))
      val pri = dd.groupBy("lang").agg(count(lit(1)).as("nd"))
        .crossJoin(dd.agg(count(lit(1)).as("ntot")))
        .select(col("lang"),
          floor((log(col("nd").cast("double")) -
            log(col("ntot").cast("double"))) * 1000000)
            .cast("long").as("prior"))
      val vocabV = tok.agg(countDistinct("token").as("v"))
      val model = clt.select("token").distinct()
        .crossJoin(broadcast(cls.crossJoin(vocabV)))
        .join(clt, Seq("lang", "token"), "left")
        .select(col("lang"), col("token"),
          floor((log(coalesce(col("c"), lit(0L)).cast("double") + 1.0) -
            log((col("tl") + col("v")).cast("double"))) * 1000000)
            .cast("long").as("ll"))
      val sc = tok.join(model.withColumnRenamed("lang", "cand"), "token")
        .groupBy("doc_id", "cand").agg(sum("ll").as("sll"))
        .join(broadcast(pri.withColumnRenamed("lang", "cand")), "cand")
        .select(col("doc_id"), col("cand"),
          (col("sll") + col("prior")).as("score"))
      val best = sc.groupBy("doc_id").agg(max("score").as("b"))
      val pred = sc.join(best, "doc_id")
        .where(col("score") === col("b"))
        .groupBy("doc_id").agg(min("cand").as("lang_pred"))
      pred.join(dd.select(col("doc_id"), col("lang").as("lang_true")), "doc_id")
        .groupBy("lang_true", "lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang_true", "lang_pred")
    }),

    // q170 — GOLDEN-RECORD SURVIVORSHIP (master-data management):
    // the end product of entity resolution — q151's Jaro-Winkler
    // match pairs closed into entities by connected components, then
    // ONE merged record per entity: mode-per-attribute survivorship
    // (most frequent value; deterministic min tie-break) and a max
    // price. The pipeline a warehouse runs to collapse duplicate
    // catalog rows. Scale: pair generation is composite-blocked on
    // (brand, size) with q151's lossless length-ratio cut, the
    // closure is the diameter-bounded label propagation (q38), and
    // every survivorship rule is a partial-agg groupBy on cluster
    // keys — mode is counts + max-count filter, never a sort of the
    // cluster's rows.
    "q170_golden_record" -> ((s, d) => {
      val p = graft.Tables.load(s, d, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"),
          col("p_brand").as("brand"), col("p_type").as("ptype"),
          col("p_size").as("size"),
          round(col("p_retailprice") * 100).cast("long").as("cents"))
      val a = p.select(col("id").as("id_a"), col("name").as("name_a"),
        col("brand"), col("size"))
      val b = p.select(col("id").as("id_b"), col("name").as("name_b"),
        col("brand"), col("size"))
      val pairs = a.join(b, Seq("brand", "size"))
        .where(col("id_a") < col("id_b"))
        .where(greatest(length(col("name_a")), length(col("name_b"))) <=
          least(length(col("name_a")), length(col("name_b"))) * 4)
        .where(round(expr("jaro_winkler(name_a, name_b)"), 6) >= 0.85)
        .select("id_a", "id_b")
      val labels = Cluster.connectedComponents(
        p.select("id"), pairs, "id", "id_a", "id_b")
      val m = p.join(labels, "id")
      def goldenMode(attr: String): DataFrame = {
        val c = m.groupBy("cluster", attr).agg(count(lit(1)).as("cnt"))
        val mx = c.groupBy("cluster").agg(max("cnt").as("mx"))
        c.join(mx, "cluster").where(col("cnt") === col("mx"))
          .groupBy("cluster").agg(min(attr).as(s"golden_$attr"))
      }
      m.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"), max("cents").as("max_cents"))
        .join(goldenMode("brand"), "cluster")
        .join(goldenMode("ptype"), "cluster")
        .select(col("cluster").as("entity_id"), col("n_members"),
          col("golden_brand"), col("golden_ptype"), col("max_cents"))
        .orderBy("entity_id")
    }),

    // q171 — RE-AGGREGABLE SKETCH ROLLING DISTINCT: q132's weekly-
    // active metric re-planned the way a 100 TB stream actually ships
    // it — per-day DataSketches HLL sketches built in ONE pass
    // (`hll_sketch_agg`), then the 7-day windows merge SKETCHES
    // (`hll_union_agg`), not user ids: the ×7 fan-out moves |days|
    // fixed-size sketch blobs where q132's exact form moves every
    // distinct (user, day) pair. This is the sketch family's fourth
    // member (q21 HLL distinct, q95 CMS counts, q97 GK ranks) and the
    // first REAGGREGATED one. Gate: the exact dau7 is hashed; each
    // window's sketch estimate is asserted in-band (q21/q137's rule —
    // wide multiple of the configured accuracy, so red = sketch
    // drift, not noise).
    "q171_hll_rolling_distinct" -> ((s, d) => {
      val ev = graft.Tables.load(s, d, "events")
      val ud = ev.select(col("user_id"),
        expr("ts div 86400000000000").as("day"))
      val days = ud.select("day").distinct()
      val exact = ud.distinct()
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("day"))
        .join(broadcast(days), "day")
        .groupBy("day").agg(countDistinct("user_id").as("dau7"))
      val daily = ud.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      val est = daily
        .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
          col("sk"))
        .join(broadcast(days), "day")
        .groupBy("day")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      exact.join(est, "day")
        .select(col("day"), col("dau7"),
          (abs(col("est") - col("dau7")) <= col("dau7") * 0.15 + 1)
            .as("est_ok"))
        .orderBy("day")
    }),

    // q182 — TOKEN-ENTROPY LEXICAL DIVERSITY: per-document Shannon
    // entropy of the token distribution — the vocabulary-richness
    // quality signal next to q56's repetition ratios (repetition
    // catches local loops; entropy catches globally degenerate text).
    // Exact-integer form: H·n = Σ c_t·(ln n − ln c_t) with
    // micro-floored logs of exact integers (q77's rule), summed as
    // longs, ONE integer division at the end — order-exact across
    // engines. Per-(doc, token) counts are one partial-agg pass; the
    // per-doc reduce is another; text never shuffles.
    "q182_token_entropy" -> ((s, d) => {
      val tc = docs(s, d)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
      tc.groupBy("doc_id")
        .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"),
          sum(col("c") * floor(log(col("c").cast("double")) * 1000000)
            .cast("long")).as("sclnc"))
        .withColumn("lnn",
          floor(log(col("n").cast("double")) * 1000000).cast("long"))
        .select(col("doc_id"), col("n"), col("n_distinct"),
          expr("(n * lnn - sclnc) div n").as("entropy_micro"))
        .orderBy("doc_id")
    }),

    // q183 — NEGATIVE SAMPLING (contrastive-training pair
    // generation): k=4 deterministic pseudo-random negatives per
    // document — md5-derived indices into the corpus id space (the
    // RNG-free q61/q118 rule: reproducible across engines, retries,
    // and corpus growth by id), self-pairs dropped, each negative
    // resolved to its document's text fingerprint through an id-keyed
    // join (the only volume shuffle; the corpus never fans out). The
    // id-space modulus comes from a 1-row count broadcast, and the
    // existence semi-check rides the resolving join itself — sparse
    // id spaces simply yield fewer pairs, never wrong ones.
    "q183_negative_sample" -> ((s, d) => {
      val dd = docs(s, d)
      val base = dd.select(col("doc_id"))
        .crossJoin(broadcast(dd.agg(count(lit(1)).as("cnt"))))
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(3))).as("t"), col("cnt"))
        .select(col("doc_id"), col("t"),
          (conv(substring(md5(concat(lit("neg:"), col("doc_id"),
            lit(":"), col("t"))), 1, 8), 16, 10)
            .cast("long") % col("cnt")).as("neg_id"))
        .where(col("neg_id") =!= col("doc_id"))
      base.join(dd.select(col("doc_id").as("neg_id"),
          md5(col("text")).as("neg_md5")), "neg_id")
        .select("doc_id", "t", "neg_id", "neg_md5")
        .orderBy("doc_id", "t")
    }),

    // q184 — PSEUDONYMIZATION + K-ANONYMITY REPORT: the privacy pass
    // next to q57's redaction — user ids replaced by a salted keyed
    // hash (deterministic, join-preserving, irreversible without the
    // salt), then the quasi-identifier audit: per (event_type, day)
    // cell, how many distinct pseudonyms — cells below k=3 are
    // re-identification risks a release gate must count. One
    // partial-agg cascade; the pseudonym map is injective on this
    // corpus and that claim is ASSERTED in-band (distinct pseudonyms
    // == distinct users), not assumed.
    "q184_k_anonymity" -> ((s, d) => {
      val ev = graft.Tables.load(s, d, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          substring(md5(concat(lit("salt1:"), col("user_id"))), 1, 16)
            .as("pseud"), col("user_id"))
      val inj = ev.agg((countDistinct(col("pseud")) ===
        countDistinct(col("user_id"))).as("injective"))
      val cells = ev.groupBy("event_type", "day")
        .agg(countDistinct("pseud").as("k_cell"))
      cells.groupBy("event_type")
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("k_cell") < 3, 1L).otherwise(0L)).as("n_risky"),
          min("k_cell").as("min_k"))
        .crossJoin(broadcast(inj))
        .orderBy("event_type")
    }),

    // q193 — SOURCE-OVERLAP MATRIX: pairwise vocabulary Jaccard
    // between sources — the corpus-level similarity report a mix
    // designer reads before weighting (doc-level near-dup says two
    // DOCUMENTS collide; this says two SOURCES cover the same
    // language). Distinct (source, token) pairs are one partial-agg
    // pass; the matrix is a token-keyed self-join of that bounded
    // table (|sources|·|vocab| rows, never documents), intersections
    // roll up to |sources|² cells, unions by inclusion-exclusion
    // from broadcast per-source sizes.
    "q193_source_overlap" -> ((s, d) => {
      val st = docs(s, d)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
        .distinct()
      val sizes = st.groupBy("source").agg(count(lit(1)).as("sz"))
      val inter = st.toDF("src_a", "token")
        .join(st.toDF("src_b", "token"), "token")
        .where(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes.toDF("src_a", "sz_a")), "src_a")
        .join(broadcast(sizes.toDF("src_b", "sz_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("inter"),
          expr("inter * 1000000 div (sz_a + sz_b - inter)")
            .as("jaccard_micro"))
        .orderBy("src_a", "src_b")
    }),

    // q142 — DATA-QUALITY GATE REPORT (the dbt-test / expectation-
    // suite role): per-rule checked/failed counts over the corpus in
    // ONE pass — empty docs, unknown language, length-metadata drift,
    // null source, duplicate ids (exact NDV vs row count). Rule
    // violations are conditional sums in a single aggregate; the
    // per-rule melt rides ABOVE the aggregate as an explode (the
    // q138 lesson — a union melt re-plans as five scans). The zh/
    // short-doc rows make the report prove it can fail, not just
    // pass.
    "q142_quality_report" -> ((s, d) => {
      val dd = docs(s, d)
      val one = dd.agg(
        count(lit(1)).as("n"),
        sum(when(col("n_chars") <= 0, 1L).otherwise(0L)).as("f_empty"),
        sum(when(!col("lang").isin("en", "de", "es", "fr"), 1L)
          .otherwise(0L)).as("f_lang"),
        sum(when(length(col("text")) =!= col("n_chars"), 1L)
          .otherwise(0L)).as("f_len"),
        sum(when(col("source").isNull, 1L).otherwise(0L)).as("f_src"),
        (count(lit(1)) - countDistinct(col("doc_id"))).as("f_dup"))
      val rules = Seq("doc_nonempty" -> "f_empty", "lang_known" -> "f_lang",
        "len_matches_meta" -> "f_len", "source_present" -> "f_src",
        "doc_id_unique" -> "f_dup")
      one.select(explode(array(rules.map { case (rn, fc) =>
          struct(lit(rn).as("rule"), col("n").as("n_checked"),
            col(fc).as("n_failed"))
        }: _*)).as("r"))
        .select("r.*").orderBy("rule")
    }),

    // q131 — PERCEPTUAL-HASH IMAGE DEDUP over the REAL codec: each
    // synthetic PNG (100 bases + 100 brightness-perturbed twins, see
    // Multimodal.synthImagePngTwin) is decoded by the real
    // javax.imageio reader, nearest-neighbor-reduced to 8×8, and
    // hashed with aHash (bit j = 64·gray_j > Σgray — integer-only, no
    // division); near-dups are pairs within Hamming distance 7,
    // found via 8×8-bit band blocking (pigeonhole-complete for <= 7,
    // the q19 SimHash argument at 64 bits) — never an all-pairs
    // scan. The ORACLE recomputes decode → resize → hash → ALL-pairs
    // Hamming from the closed-form pixel polynomial, so codec drift,
    // resize-index drift, a hash bit off, or a band-recall loss all
    // hash-mismatch.
    "q131_image_phash" -> ((s, d) =>
      phashPairs(s, d).orderBy("a_id", "b_id")),

    // q143 — INCREMENTAL NEAR-DUP DEDUP (new batch vs indexed
    // corpus): the shape a continuously-ingested corpus actually
    // runs — q17/q38 dedup the corpus against itself; here an
    // incoming batch (half exact dups of indexed docs, half fresh)
    // is checked against the EXISTING index without ever re-pairing
    // the index with itself. The index side's banded LSH buckets are
    // write-once in production (a stored table keyed by (band,key));
    // per-batch cost is |batch| signatures + a bucket equi-join +
    // Jaccard verification on candidates only — index text is
    // touched only for candidate rows, and index-index pairs are
    // never generated. Survivors (kept=true) are the batch's novel
    // documents; n_index_matches counts verified near-dup partners.
    "q143_incr_neardup" -> ((s, d) => {
      val index = docs(s, d).select(col("doc_id"), col("text"))
      val batch = docs(s, d).select(
        (col("doc_id") + 100000).as("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(concat(lit("fresh "), col("doc_id").cast("string"),
            lit(" standalone document content"))).as("text"))
      val idxBuckets = NearDup.bands(index, "doc_id", "text")
        .toDF("doc_a", "band", "key")
      val newBuckets = NearDup.bands(batch, "doc_id", "text")
        .toDF("doc_b", "band", "key")
      val cand = newBuckets.join(idxBuckets, Seq("band", "key"))
        .select("doc_a", "doc_b").distinct()
      val matched = cand
        .join(index.toDF("doc_a", "text_a"), "doc_a")
        .join(batch.toDF("doc_b", "text_b"), "doc_b")
        .withColumn("jacc",
          round(expr("shingle_jaccard(text_a, text_b, 3)"), 6))
        .where(col("jacc") >= 0.8)
        .groupBy("doc_b").agg(countDistinct(col("doc_a")).as("nm"))
      batch.join(matched, batch("doc_id") === matched("doc_b"), "left")
        .select(col("doc_id"),
          coalesce(col("nm"), lit(0L)).as("n_index_matches"),
          col("nm").isNull.as("kept"))
        .orderBy("doc_id")
    }),

    // q144 — URL CANONICALIZATION + DEDUP (the Common-Crawl-style
    // first-stage dedup that runs BEFORE any text is fetched or
    // compared): scheme/case/www/query-string/trailing-slash variants
    // of the same resource collapse to one canonical key. The URL
    // variants are synthesized deterministically from (source,
    // doc_id) so the rule has real work to do; canonicalization is a
    // chain of anchored regexp_replace calls — pure scan-side
    // codegen, zero shuffles before the one partial-agg groupBy on
    // the canonical key (which carries only the canonical string,
    // never documents). keeper_id = min(doc_id) is the
    // first-crawled-wins survivorship rule.
    "q144_url_dedup" -> ((s, d) => {
      val raw = docs(s, d).select(col("doc_id"),
        concat(
          when(col("doc_id") % 4 === 0, lit("HTTPS://WWW."))
            .otherwise(lit("https://")),
          col("source"), lit(".example.com/articles/"),
          // path repeats every 40 ids — aligned with the 20-source
          // cycle, so ~|corpus|/40 raw URLs collapse per canonical
          // key; the %3/%7 decorations vary WITHIN each key, giving
          // the canonicalizer real variants to strip
          (col("doc_id") % 40).cast("string"),
          when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("?utm_source=feed&ref=home"))
            .otherwise(lit(""))).as("url"))
      raw
        .withColumn("curl",
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            lower(col("url")),
            "^https?://", ""), "^www\\.", ""), "[?#].*$", ""), "/$", ""))
        .groupBy("curl")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper_id"))
        .orderBy("curl")
    }),

    // q146 — EMBEDDING OUTLIER REMOVAL (per-cluster isolation
    // filter): the embedding-space cleaning pass that drops vectors
    // far from their own cluster's mass — mislabeled/garbage points
    // SemDeDup-style dense-dup mining (q96) cannot see. Every vector
    // is IVF-assigned (broadcast centroids, max_by partial agg — the
    // q22 shape), its centroid similarity floored to integer
    // microunits, and flagged iff sim < mean − z·σ of its OWN
    // bucket. The mean/σ test is evaluated in EXACT integer
    // arithmetic — (Σs − n·s) > 0 AND (Σs − n·s)² > z²(nΣs² − (Σs)²)
    // — because float stddev accumulation differs across engines
    // (the q119 rule); decimal(38) keeps the squared terms exact at
    // any corpus size. z = 1 here: assignment sims are max-over-16-
    // centroids statistics, whose distribution is compressed from
    // below (the max of 16 near-independent cosines rarely sits 2σ
    // under its bucket mean on this corpus), so z=1 exercises a real
    // non-empty tail — production tightens z without changing the
    // plan. Per-bucket stats are a |centroids|-row aggregate
    // broadcast back; nothing but (id, bucket, smicro) shuffles.
    "q146_embed_outlier" -> ((s, d) => {
      val e0 = embs(s, d).select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      val assigned = AnnIvf
        .assignWithSim(e0, e0.where(col("vec_id") < 16))
        .withColumn("smicro", floor(col("sim") * 1e6).cast("long"))
      val dec = "decimal(38,0)"
      val stats = assigned.groupBy("bucket").agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("smicro").cast(dec)).as("s1"),
        sum((col("smicro") * col("smicro")).cast(dec)).as("s2"))
      val dev = col("s1") - col("n") * col("smicro").cast(dec)
      assigned.join(broadcast(stats), "bucket")
        .select(col("vec_id"), col("bucket"), col("smicro"),
          (dev > 0 && dev * dev >
            col("n") * col("s2") - col("s1") * col("s1"))
            .as("is_outlier"))
        .orderBy("vec_id")
    }),

    // q199 — SUFFIX-ARRAY SUBSTRING DEDUP (Lee et al. ACL'22): every
    // maximal per-document span covered by a duplicated substring of
    // ≥ 8 tokens, via genuine Manber–Myers prefix doubling — see
    // [[SuffixDup]] for the machinery, the N·log L payload argument
    // vs brute-force window hashing, and the covered-iff-covered-by-
    // a-duplicated-L-window identity. The ORACLE is the brute-force
    // 8-gram union (enumerate windows, keep those occurring ≥ 2×,
    // merge to maximal islands), so the gate proves the suffix
    // ranking finds exactly the true duplicated regions — real
    // duplicates (every reported token is inside a repeated window)
    // AND maximal (the hash match kills any under- or over-extension)
    // — while the two plans share nothing.
    "q199_suffix_dup_spans" -> ((s, d) =>
      SuffixDup.dupSpans(docs(s, d), "doc_id",
          TextOps.tokens(col("text")), 8)
        .withColumnRenamed("__id", "doc_id")
        .orderBy("doc_id", "span_start")),

    // q203 — SUFFIX DEDUP APPLICATION (q199's removal step — what Lee
    // et al. actually do to the corpus): every duplicated ≥8-token
    // window keeps its corpus-first occurrence (min (doc, pos) of the
    // rank group); tokens covered by any NON-keeper duplicated window
    // are cut and each document is rebuilt from the survivors. Output
    // is (n_tokens, n_kept, md5 of the rebuilt text) per document, so
    // the gate pins the exact surviving BYTES, not just counts. The
    // ORACLE replays keeper selection and removal over brute-force
    // windows (row_number per window group), plan-disjoint from the
    // rank tables.
    "q203_suffix_dedup_apply" -> ((s, d) =>
      SuffixDup.applyDedup(docs(s, d), "doc_id",
          TextOps.tokens(col("text")), 8)
        .withColumnRenamed("__id", "doc_id")
        .orderBy("doc_id")),

    // q222 — TOKENIZER FERTILITY BY LANGUAGE (tokens-per-word, the
    // multilingual-fairness metric tokenizer reports lead with: a
    // BPE trained on a mixed corpus splits under-represented
    // languages into more pieces, inflating their compute cost).
    // The corpus's own 5-merge tokenizer (q133/q202's training — the
    // bounded argmax-collect rounds) applied per word occurrence,
    // reduced to per-LANGUAGE token/word totals with the ratio in
    // integer micros. Scan-side replace chain + one partial agg per
    // language; the ORACLE replays training AND per-language
    // application through the shared BPE CTE chain.
    "q222_tokenizer_fertility" -> ((s, d) => {
      val words = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .where(col("w").rlike("^[a-z0-9]+$"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      val merges = Bpe.train(s, words, "w", "cnt", steps = 5)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      docs(s, d)
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("w"))
        .where(col("w").rlike("^[a-z0-9]+$"))
        .select(col("lang"),
          (size(split(Bpe.encodeExpr(col("w"), merges), Bpe.Sep)) - 1)
            .cast("long").as("toks"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"), sum("toks").as("n_tokens"))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          expr("n_tokens * 1000000 div n_words").as("fertility_micro"))
        .orderBy("lang")
    }),

    // q221 — DIFFERENTIAL-PRIVACY COUNT RELEASE (Dwork et al.'s
    // Laplace mechanism, ε = 0.1): per-event-type counts released
    // with Laplace(Δf/ε = 10) noise — the third governance tier next
    // to q184's k-anonymity and pseudonymization (suppress / mask /
    // perturb). The noise draw is the inverse-CDF transform of an
    // md5-derived uniform (u = (h + ½)/2³², the half-offset keeping
    // ln's argument strictly positive at both extremes) — seedless
    // and engine-replayable like every other draw here, with the
    // magnitude floored to integer micros BEFORE the sign flip (the
    // q77 contract; DP-THEORETIC caveat stated plainly: a hash of a
    // public group key is a FIXED draw, so this demonstrates the
    // mechanism's shape and calibration — production ε-DP needs a
    // secret seed). Scan-side: one partial-agg count, five rows of
    // noise arithmetic.
    "q221_dp_count_release" -> ((s, d) =>
      events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("__h", expr("cast(conv(substring(md5(concat(" +
          "event_type, ':dp')), 1, 8), 16, 10) as bigint)"))
        .withColumn("__t", expr(
          "(cast(__h as double) + 0.5D) / 4294967296.0D - 0.5D"))
        .withColumn("__mag", expr(
          "cast(floor(-10.0D * ln(1.0D - 2.0D * abs(__t)) * 1000000D) " +
            "as bigint)"))
        .select(col("event_type"),
          expr("n * 1000000 + (CASE WHEN __t < 0 THEN -__mag " +
            "ELSE __mag END)").as("noisy_micro"),
          lit(10L).as("scale"))
        .orderBy("event_type")),

    // q220 — CROSS-MODAL DEDUP: assets dedup on the UNION of
    // modality pair graphs — text near-dup pairs (MinHash LSH +
    // exact-Jaccard verify over assets whose twin text drifts by an
    // appended marker) and image near-dup pairs (aHash banding over
    // the REAL PNG codec, twins brightened) feed ONE connected-
    // components pass. The cross-modal point: a twin whose text
    // drifted below the Jaccard threshold is still captured by its
    // image evidence, and vice versa — the re-encoded/re-captioned
    // asset case single-modality dedup misses. Both pair generators
    // are the bucketed (never all-pairs) operators measured in
    // SCALE_CURVE; CC is the q38 min-label loop. The ORACLE composes
    // the shingle/band CTEs, the px-prefixed pHash CTEs, and the
    // recursive-CC fixpoint over the unioned symmetric edge set.
    "q220_crossmodal_dedup" -> ((s, d) => {
      val base = docs(s, d).where(col("doc_id") < 100)
        .select(col("doc_id"), col("text"))
      val assets = base.unionByName(base.select(
        (col("doc_id") + 100).as("doc_id"),
        concat(col("text"), lit(" cmx twin marker")).as("text")))
      val textPairs = NearDup
        .jaccardPairs(assets, "doc_id", "text", threshold = 0.8)
        .select("doc_a", "doc_b")
      val imgPairs = phashPairs(s, d)
        .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"))
      val pairs = textPairs.unionByName(imgPairs).distinct()
      Cluster.connectedComponents(
          assets.select("doc_id"), pairs, "doc_id", "doc_a", "doc_b")
        .orderBy("doc_id")
    }),

    // q219 — HARD-NEGATIVE MINING (contrastive-training data prep,
    // the DPR/SBERT recipe): for each query, the ANN candidates
    // ranked just BELOW the positives band — similar enough to be
    // informative, excluded if so similar they're probably unlabeled
    // positives (the false-negative guard at sim > 0.95). Rank
    // 6..20 of the q16 broadcast top-k, so the corpus is scanned
    // once and never shuffled; thresholds compare the same
    // round-6dp sims the gate hashes.
    "q219_hard_negatives" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val top = Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), k = 20)
      top
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))))
        .where(col("rank") >= 6 && col("sim") <= 0.95)
        .select(col("qid"), col("rank").cast("long").as("rank"),
          col("vec_id"), col("sim"))
        .orderBy("qid", "rank")
    }),

    // q218 — SPAN CORRUPTION (the T5/UL2 denoising-objective data
    // prep, Raffel et al. 2020): ~1/7 of each document's 3-token
    // blocks are masked; the INPUT replaces each masked block with
    // its ordinal sentinel <extra_id_k>, the TARGET concatenates
    // sentinel + original tokens — the (input, target) pair a
    // denoising pretrain consumes, both pinned byte-exact by md5.
    // Mask choice is md5(doc:block) parity — seedless, reproducible
    // on any executor and by the oracle (the q118 idiom); the
    // sentinel ordinal k is an exclusive prefix sum over a PER-DOC
    // window (bounded by document length, the q42 contract), and the
    // rebuild groups each document once (text moves in one shuffle —
    // the q130/q203 rebuild contract). Ragged tail blocks (<3
    // tokens) are never masked, so masks never straddle the end.
    "q218_span_corruption" -> ((s, d) => {
      val toks = docs(s, d).select(col("doc_id"),
        TextOps.tokens(col("text")).as("__tk"))
        .withColumn("__n", size(col("__tk")))
      val blocks = toks
        .select(col("doc_id"), col("__n"), posexplode(expr(
          "transform(sequence(0, (__n + 2) div 3 - 1), " +
            "j -> slice(__tk, 3 * j + 1, 3))")))
        .withColumnRenamed("pos", "j").withColumnRenamed("col", "__bt")
        .withColumn("__masked", (size(col("__bt")) === 3) &&
          expr("pmod(cast(conv(substring(md5(concat(" +
            "cast(doc_id as string), ':', cast(j as string))), 1, 8), " +
            "16, 10) as bigint), 7) = 0"))
      val wk = Window.partitionBy("doc_id").orderBy("j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val parts = blocks
        .withColumn("__k",
          sum(col("__masked").cast("long")).over(wk) -
            col("__masked").cast("long"))
        .withColumn("__bs", array_join(col("__bt"), " "))
        .withColumn("__in", when(col("__masked"),
          concat(lit("<extra_id_"), col("__k"), lit(">")))
          .otherwise(col("__bs")))
        .withColumn("__tg", when(col("__masked"),
          concat(lit("<extra_id_"), col("__k"), lit("> "), col("__bs"))))
      parts.groupBy("doc_id", "__n")
        .agg(
          sum(when(col("__masked"), 3L).otherwise(0L)).as("n_masked"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("j"), col("__in")))),
            x => x.getField("__in")), " ")).as("input_md5"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("__masked"),
              struct(col("j"), col("__tg"))))),
            x => x.getField("__tg")), " ")).as("target_md5"))
        .select(col("doc_id"), col("__n").cast("long").as("n_tokens"),
          col("n_masked"), col("input_md5"), col("target_md5"))
        .orderBy("doc_id")
    }),

    // q217 — WINSORIZED MEAN (robust aggregate): per-event-type mean
    // cents with the tails clamped at the EXACT p05/p95 order
    // statistics — the outlier-robust metric an experimentation stack
    // reports next to q161's z-test (one whale purchase should not
    // move the mean). Exact quantiles come from the value HISTOGRAM
    // (per-(type,cents) partial agg, cumsum over that BOUNDED table —
    // q129's pattern; the corpus never sorts); rank k = ⌈p·n⌉ via
    // pure integer (p·n+99) div 100; the clamp + mean is one more
    // scan-side pass with an integer-micro division. ORACLE replays
    // the same histogram ranks in SQL.
    "q217_winsorized_mean" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        .withColumn("k05", expr("(5 * n + 99) div 100"))
        .withColumn("k95", expr("(95 * n + 99) div 100"))
      val hist = ev.groupBy("event_type", "cents")
        .agg(count(lit(1)).as("c"))
      val wcum = Window.partitionBy("event_type").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum("c").over(wcum))
        .join(broadcast(n), "event_type")
      val thr = cum.groupBy("event_type").agg(
        min(when(col("cum") >= col("k05"), col("cents"))).as("lo_cents"),
        min(when(col("cum") >= col("k95"), col("cents"))).as("hi_cents"))
      ev.join(broadcast(thr), "event_type")
        .join(broadcast(n.select("event_type", "n")), "event_type")
        .groupBy(col("event_type"), col("n"),
          col("lo_cents"), col("hi_cents"))
        .agg(sum(greatest(col("lo_cents"),
          least(col("hi_cents"), col("cents")))).as("ws"))
        .select(col("event_type"), col("n"), col("lo_cents"),
          col("hi_cents"), expr("ws * 1000000 div n").as("wmean_micro"))
        .orderBy("event_type")
    }),

    // q216 — LINEAR-INTERPOLATION GAP FILL (q67's scaffold, upgraded
    // from zero-fill to the time-series repair a metrics pipeline
    // actually wants): missing days take the integer lerp between the
    // nearest observed neighbors — carried by two per-user windows
    // (last-observed-before via last(…, ignoreNulls) over the
    // preceding frame, first-observed-after over the following one;
    // both bounded per user, never corpus-wide). The lerp is pure
    // integer cents arithmetic with truncating div — Spark `div` and
    // DuckDB `//` agree on negatives (both truncate toward zero), so
    // falling series interpolate identically. Scaffold spans each
    // user's observed range, so every gap has both neighbors.
    "q216_linear_interpolate" -> ((s, d) => {
      val ev = events(s, d).where(col("user_id") < 30)
        .withColumn("day", expr("ts div 86400000000000"))
      val daily = ev.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("sc"))
      val span = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val scaffold = span.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      val g = scaffold.join(daily, Seq("user_id", "day"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      val wPrev = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      g.withColumn("pd", last(when(col("n") > 0, col("day")),
          ignoreNulls = true).over(wPrev))
        .withColumn("pv", last(when(col("n") > 0, col("sc")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nd", first(when(col("n") > 0, col("day")),
          ignoreNulls = true).over(wNext))
        .withColumn("nv", first(when(col("n") > 0, col("sc")),
          ignoreNulls = true).over(wNext))
        .select(col("user_id"), col("day"),
          (col("n") > 0).as("observed"),
          when(col("n") > 0, col("sc"))
            .otherwise(col("pv") + expr(
              "(nv - pv) * (day - pd) div (nd - pd)"))
            .as("v_cents"))
        .orderBy("user_id", "day")
    }),

    // q215 — CONTENT-DEFINED CHUNKING (the restic/borgbackup dedup
    // primitive, Muthitacharoen et al. LBFS SOSP'01): each document
    // splits at positions where the hash of the local 8-char window
    // lands in a 1/64 target band, so chunk boundaries follow CONTENT
    // — an insertion shifts one chunk, not every fixed-size block
    // after it. Per-chunk md5 + corpus-wide copy counts turn it into
    // the blob-level dedup report (pipeline text dedup is q13/q17;
    // this is the storage tier those pipelines sit on). Boundary
    // detection + chunk slicing are HOFs fused into the scan (the
    // only shuffle is the copy-count partial agg on chunk_md5); the
    // window guard keeps Spark's descending-sequence footgun out
    // (sequence(2, len-7) only when len ≥ 9). ORACLE: brute-force
    // boundary scan + row_number pairing, plan-disjoint.
    "q215_content_chunks" -> ((s, d) => {
      val chunks = docs(s, d)
        .withColumn("__nt", expr(
          "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"))
        .withColumn("__bp", expr(
          "CASE WHEN length(__nt) >= 9 THEN " +
            "filter(sequence(2, length(__nt) - 7), i -> " +
            "pmod(cast(conv(substring(md5(substring(__nt, i, 8)), 1, 8), " +
            "16, 10) as bigint), 64) = 0) " +
            "ELSE array() END"))
        .withColumn("__cuts", expr(
          "concat(array(1), __bp, array(length(__nt) + 1))"))
        .select(col("doc_id"), col("__nt"), posexplode(expr(
          "transform(sequence(1, size(__cuts) - 1), j -> struct(" +
            "element_at(__cuts, j) AS off, " +
            "element_at(__cuts, j + 1) - element_at(__cuts, j) AS len))")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_idx"),
          col("col.off").cast("long").as("off"),
          col("col.len").cast("long").as("len"),
          expr("md5(substring(__nt, col.off, col.len))").as("chunk_md5"))
      val copies = chunks.groupBy("chunk_md5")
        .agg(count(lit(1)).as("n_copies"))
      chunks.join(copies, "chunk_md5")
        .select(col("doc_id"), col("chunk_idx"), col("off"), col("len"),
          col("chunk_md5"), col("n_copies"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // q214 — DATASET PROFILER: the per-column data-quality report
    // (row/null/exact-distinct counts + canonical min/max) every
    // ingest run files before training sees the data — in ONE scan.
    // All six columns' aggregates ride a single groupBy-less agg
    // (Spark plans the multi-distinct with one Expand over one scan,
    // partial-aggregated; never six passes), then unpivot to the
    // report shape via stack. Cross-engine canonicalization: numerics
    // summarize as exact integers (ids verbatim, ts as epoch-ns,
    // value as cents), strings as lexicographic min/max — no double→
    // string formatting ever crosses an engine boundary. The ORACLE
    // is six plan-disjoint single-column SELECTs unioned.
    "q214_data_profile" -> ((s, d) => {
      val ev = events(s, d).withColumn("cents",
        round(col("value") * 100).cast("long"))
      val agg = ev.agg(
        count(lit(1)).as("n"),
        // event_id
        sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("nn0"),
        countDistinct(col("event_id")).as("nd0"),
        min("event_id").as("mi0"), max("event_id").as("ma0"),
        // ts (epoch ns long via Tables.load)
        sum(when(col("ts").isNull, 1L).otherwise(0L)).as("nn1"),
        countDistinct(col("ts")).as("nd1"),
        min("ts").as("mi1"), max("ts").as("ma1"),
        // user_id
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("nn2"),
        countDistinct(col("user_id")).as("nd2"),
        min("user_id").as("mi2"), max("user_id").as("ma2"),
        // value as cents
        sum(when(col("cents").isNull, 1L).otherwise(0L)).as("nn3"),
        countDistinct(col("cents")).as("nd3"),
        min("cents").as("mi3"), max("cents").as("ma3"),
        // event_type (string)
        sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("nn4"),
        countDistinct(col("event_type")).as("nd4"),
        min("event_type").as("ms4"), max("event_type").as("mx4"),
        // props (string)
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("nn5"),
        countDistinct(col("props")).as("nd5"),
        min("props").as("ms5"), max("props").as("mx5"))
      agg.select(expr(
        "stack(6, " +
          "'event_id', n, nn0, nd0, mi0, ma0, " +
          "CAST(NULL AS STRING), CAST(NULL AS STRING), " +
          "'ts', n, nn1, nd1, mi1, ma1, " +
          "CAST(NULL AS STRING), CAST(NULL AS STRING), " +
          "'user_id', n, nn2, nd2, mi2, ma2, " +
          "CAST(NULL AS STRING), CAST(NULL AS STRING), " +
          "'value_cents', n, nn3, nd3, mi3, ma3, " +
          "CAST(NULL AS STRING), CAST(NULL AS STRING), " +
          "'event_type', n, nn4, nd4, CAST(NULL AS BIGINT), " +
          "CAST(NULL AS BIGINT), ms4, mx4, " +
          "'props', n, nn5, nd5, CAST(NULL AS BIGINT), " +
          "CAST(NULL AS BIGINT), ms5, mx5) " +
          "AS (column, n_rows, n_null, n_distinct, min_i, max_i, " +
          "min_s, max_s)"))
        .orderBy("column")
    }),

    // q213 — BALANCED QUOTA SAMPLING with largest-remainder
    // redistribution: draw 300 documents to a TARGET language mix
    // (en 10% / de 40% / es 20% / fr 20% / zh 10%); languages short
    // of their quota (de here — the fixture plants the shortfall)
    // surrender the unfilled seats, redistributed to languages with
    // remaining documents by the exact largest-remainder method
    // (floor shares + the Σfr8=R·S identity assigns the R leftover
    // seats to the largest fractional remainders — pure integer
    // arithmetic on a |langs|-row table, no float apportionment).
    // Per-language draws are seedless md5 bottom-k via
    // [[QuotaSample.bottomKByHash]]'s histogram prune — no full
    // per-group sort. The ORACLE replays the apportionment and the
    // NAIVE window selection, so the prune must match it row-for-row.
    "q213_balanced_quota" -> ((s, d) => {
      import s.implicits._
      val budget = 300L
      val targets = Seq(("en", 30L), ("de", 120L), ("es", 60L),
        ("fr", 60L), ("zh", 30L)).toDF("lang", "q")
      val n = docs(s, d).groupBy("lang").agg(count(lit(1)).as("n"))
      val a = targets.join(n, "lang")
        .withColumn("take1", least(col("q"), col("n")))
        .withColumn("rem", col("n") - col("take1"))
      val sAgg = a.agg((lit(budget) - sum("take1")).as("ell"),
        sum("rem").as("ss"))
      val e = a.crossJoin(broadcast(sAgg))
        .withColumn("extra", when(col("ss") === 0, 0L)
          .otherwise(expr("ell * rem div ss")))
        .withColumn("fr8", when(col("ss") === 0, 0L)
          .otherwise(col("ell") * col("rem") % col("ss")))
      val rAgg = e.agg(sum("extra").as("se"), first("ell").as("ell2"))
      val ks = e.crossJoin(broadcast(rAgg))
        .withColumn("win",
          (row_number().over(Window.orderBy(col("fr8").desc, col("lang")))
            <= col("ell2") - col("se")).cast("long"))
        .select(col("lang"),
          (col("take1") + col("extra") + col("win")).as("__k"))
      QuotaSample.bottomKByHash(
          docs(s, d).select("lang", "doc_id"), "lang", "doc_id", ks)
        .orderBy("lang", "doc_id")
    }),

    // q212 — PMI COLLOCATION MINING (Church & Hanks 1990): the top-50
    // adjacent-token collocations by pointwise mutual information
    // with a min-support cut — the phrase-vocabulary step (wordpiece
    // seeding, stop-phrase lists) a corpus pipeline runs after token
    // counting. One explode pass feeds BOTH count tables (unigrams
    // via a second bounded aggregate over the bigram table's left/
    // right margins — the corpus is scanned once); PMI is computed on
    // the zipf-bounded bigram vocabulary only, as floor-micro
    // ln(p(ab)) − ln(p(a)) − ln(p(b)) (the q77 determinism contract,
    // same ulp caveat); the cut is TakeOrdered. The ORACLE recounts
    // both margins independently and replays the identical ln form.
    "q212_pmi_collocations" -> ((s, d) => {
      val toks = docs(s, d)
        .select(TextOps.tokens(col("text")).as("__tk"))
      val bi = toks
        .select(explode(when(size(col("__tk")) >= 2,
          transform(sequence(lit(0), size(col("__tk")) - 2),
            i => struct(element_at(col("__tk"), i + 1).as("w1"),
              element_at(col("__tk"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
      val tot = bi.agg(sum("cab").cast("double").as("tt"))
      // margins from the bigram table: c(a,·) and c(·,b) — the LM
      // normalizers, derived without a second corpus pass
      val left = bi.groupBy("w1").agg(sum("cab").as("ca"))
      val right = bi.groupBy("w2").agg(sum("cab").as("cb"))
      bi.where(col("cab") >= 5)
        .join(left, "w1").join(right, "w2")
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("cab"),
          floor((log(col("cab") / col("tt"))
            - log(col("ca") / col("tt"))
            - log(col("cb") / col("tt"))) * 1000000d)
            .cast("long").as("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
        .limit(50)
    }),

    // q211 — CURRICULUM ORDERING: the corpus laid out in the order a
    // curriculum-trained run consumes it — 4 difficulty phases by
    // unigram-LM NLL (typical text first, rare/hard text last; the
    // q77 scoring reused verbatim), each phase internally
    // pseudo-shuffled by md5 (deterministic, seedless — the q118
    // idiom; adjacent-document correlation broken without RNG state).
    // Phase assignment is [[Rank.ntileExact]] — histogram thresholds,
    // NO corpus-wide ntile window; the only total order produced is
    // the per-phase sequence, which IS the output contract (a
    // training order is a total order — the range sort that emits it
    // is the deliverable, not overhead). ORACLE: q77's NLL CTEs + the
    // window-ntile lowering ntileExact is gate-proven equal to (q74).
    "q211_curriculum_order" -> ((s, d) => {
      val nll = Relevance.unigramNll(docs(s, d), "doc_id", "text")
      val phased = Rank.ntileExact(nll.withColumn("__corpus", lit("all")),
          "__corpus", "nll_micro", "doc_id", k = 4)
        .select(col("doc_id"), col("ntile").cast("int").as("phase"))
      // per-phase sequence via the two-level hash rank — 256× the
      // parallelism of a 4-partition row_number window (QuotaSample
      // .rankByHash), identical numbering by the prefix-compose proof
      QuotaSample.rankByHash(phased, "phase", "doc_id")
        .select(col("doc_id"), col("phase"), col("rank").as("seq"))
        .orderBy("phase", "seq")
    }),

    // q208 — CORRUPT-RECORD QUARANTINE (schema-on-read ingest
    // hygiene): a JSON-lines feed (synthesized deterministically from
    // events; every 13th record truncated) parsed with Spark's
    // PERMISSIVE from_json + columnNameOfCorruptRecord — the
    // idiomatic Spark route-don't-fail ingest: valid records surface
    // typed columns, corrupt ones carry NULL fields and an md5
    // quarantine receipt of the raw payload (the dead-letter feed).
    // Scan-side end to end — the parse, the routing predicate, and
    // both projections fuse into one codegen stage, zero shuffles.
    // The ORACLE replays validity via DuckDB's json_valid + TRY-style
    // extraction over the identically synthesized feed.
    "q208_json_quarantine" -> ((s, d) => {
      val cents = round(col("value") * 100).cast("long")
      val raw = concat(lit("{\"uid\":"), col("user_id").cast("string"),
        lit(",\"et\":\""), col("event_type"),
        lit("\",\"cents\":"), cents.cast("string"), lit("}"))
      val fed = events(s, d)
        .select(col("event_id"), raw.as("pl0"))
        .withColumn("pl", when(col("event_id") % 13 === 0,
          expr("substring(pl0, 1, length(pl0) - 2)")).otherwise(col("pl0")))
      val parsed = from_json(col("pl"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "uid BIGINT, et STRING, cents BIGINT, _corrupt STRING"),
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt"))
      fed.select(col("event_id"), parsed.as("r"), col("pl"))
        .select(col("event_id"),
          col("r._corrupt").isNull.as("ok"),
          col("r.uid").as("uid"), col("r.et").as("et"),
          col("r.cents").as("cents"),
          when(col("r._corrupt").isNotNull, md5(col("pl")))
            .as("quarantine_md5"))
        .orderBy("event_id")
    }),

    // q207 — JL RANDOM PROJECTION (Achlioptas ±1 variant): 64-dim
    // embeddings down to 16 through an md5-parity sign matrix — the
    // pre-ANN dimensionality reduction. The matrix is a pure function
    // of (i, j), derived identically by every executor and by the
    // ORACLE (which rebuilds it in SQL from the same md5 parity and
    // replays the projection via ordered list dot products) — no RNG
    // state, no broadcast, zero shuffles; see [[JlProject]].
    "q207_jl_project" -> ((s, d) =>
      JlProject.project(
        embs(s, d).select(col("vec_id"),
          col("embedding").cast("array<double>").as("emb")),
        "vec_id", "emb", inDim = 64, outDim = 16)
        .orderBy("vec_id", "j")),

    // q206 — MMR DIVERSIFIED RE-RANKING (Carbonell & Goldstein
    // SIGIR'98): retrieval's top-20 per query re-ranked to the 5 most
    // relevant-AND-mutually-novel — the RAG step between ANN and
    // context assembly (near-dup passages waste the window). The
    // greedy argmax is the native `mmr_select` expression over the
    // BOUNDED candidate array (retrieval fan-in caps it at 20; the
    // O(k·N) sims never touch the corpus); candidates arrive by the
    // q16 broadcast brute-force path; scores are pure long arithmetic
    // 7·rel − 3·maxSim over floor-micro cosines, ties by id. The
    // ORACLE unrolls the 5 greedy steps as SQL CTEs (argmax per step,
    // correlated max over the picks so far) — plan-disjoint from the
    // expression's loop.
    "q206_mmr_rerank" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val top = Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5), k = 20)
      top.join(e, "vec_id")
        .select(col("qid"), struct(
          col("vec_id").cast("long").as("id"),
          floor(col("sim") * 1000000d).cast("long").as("rel_micro"),
          col("emb")).as("c"))
        .groupBy("qid")
        .agg(collect_list("c").as("cs"))
        .select(col("qid"), posexplode(expr("mmr_select(cs, 5, 7)")))
        .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
          col("col.id").as("vec_id"), col("col.score_micro").as("score_micro"))
        .orderBy("qid", "rank")
    }),

    // q205 — SUFFIX DECONTAMINATION (the substring tier of train/eval
    // hygiene): maximal spans of TRAIN documents covered by an
    // 8-token window that also occurs in the EVAL slice (doc_id % 17
    // == 0 — the deterministic holdout). q52/q104 test whole-n-gram
    // MEMBERSHIP; this finds the contaminated REGION, so the fix can
    // be surgical (cut the span) instead of dropping the document.
    // Shared window ⇔ shared rank over the union corpus — see
    // [[SuffixDup.contaminationSpans]] for why the eval rank set
    // broadcast-semi-joins and the train side never reshuffles. The
    // ORACLE is the brute-force window semi-join (train windows ∩
    // eval window strings, merged to islands), plan-disjoint from the
    // rank tables.
    "q205_suffix_decontaminate" -> ((s, d) =>
      SuffixDup.contaminationSpans(docs(s, d), "doc_id",
          TextOps.tokens(col("text")), col("doc_id") % 17 === 0, 8)
        .withColumnRenamed("__id", "doc_id")
        .orderBy("doc_id", "span_start")),

    // q204 — DSIR IMPORTANCE SELECTION (Xie et al. 2023): the top-50
    // corpus documents by log importance weight under hashed-n-gram
    // models of the English slice (target) vs the whole corpus (raw)
    // — the distribution-matching selection step a pretraining mix
    // runs after dedup. One explode pass builds BOTH 1024-bucket
    // histograms (target count rides the raw partial agg); the
    // log-ratio table broadcasts; scoring is scan-side; the cut is
    // TakeOrdered. The ORACLE refits both smoothed models and replays
    // the per-occurrence micro log-ratios independently, so a hashing
    // drift, a smoothing mismatch, or a wrong model total flips the
    // hash. See [[Dsir]] for the 100 TB argument.
    "q204_dsir_select" -> ((s, d) =>
      Dsir.select(docs(s, d), "doc_id", "text", col("lang") === "en",
          buckets = 1024, k = 50)
        .withColumnRenamed("__id", "doc_id")),

    // q151 — ENTITY RESOLUTION with Jaro-Winkler (the fuzzy-match
    // measure Spark lacks natively — q106/q108's edit-distance family
    // covers typos by count; JW weights shared prefixes, the rule
    // record-linkage actually uses for names/brands/titles).
    // `jaro_winkler` is a codegen'd native expression whose semantics
    // are pinned to DuckDB's builtin (including the both-empty → 0
    // and boost-threshold-0.7 edge rules), so the oracle compares the
    // IMPLEMENTATION, not just the query. Scale shape: classic
    // composite blocking — candidate pairs only within (brand, size)
    // blocks (one equi-join shuffle, Σblock² ≈ N²/(|brands|·|sizes|)
    // work, never all-pairs — the q106 pattern with a similarity the
    // engine had to be taught), further cut by a LOSSLESS length
    // ratio: JW = J + ℓp(1−J) with ℓ ≤ 4, p = 0.1 gives
    // JW ≤ 0.4 + 0.6J, and matches m ≤ min(|a|,|b|) bounds
    // J ≤ (2 + min/max)/3, so JW ≥ 0.85 forces min·4 ≥ max — pairs
    // failing it cannot clear the threshold (integer lengths leave
    // ≥ 9e-4 of margin over the 6-dp rounding). Production adds more
    // blocking attributes as cardinality grows, which only tightens
    // the same plan.
    "q151_jw_entity_match" -> ((s, d) => {
      val p = graft.Tables.load(s, d, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"),
          col("p_brand").as("brand"), col("p_size").as("size"))
      val a = p.select(col("id").as("id_a"), col("name").as("name_a"),
        col("brand"), col("size"))
      val b = p.select(col("id").as("id_b"), col("name").as("name_b"),
        col("brand"), col("size"))
      a.join(b, Seq("brand", "size"))
        .where(col("id_a") < col("id_b"))
        .where(greatest(length(col("name_a")), length(col("name_b"))) <=
          least(length(col("name_a")), length(col("name_b"))) * 4)
        .withColumn("sim", round(expr("jaro_winkler(name_a, name_b)"), 6))
        .where(col("sim") >= 0.85)
        .select("id_a", "id_b", "sim")
        .orderBy("id_a", "id_b")
    }),

    // q367 — SORTED-NEIGHBORHOOD entity blocking (Hernández–Stolfo
    // SNM): the THIRD blocking scheme in the matching family —
    // q151's attribute blocks miss pairs whose brand/size disagree,
    // q108/q117's content signatures need token overlap; SNM instead
    // sorts the whole catalog by name and pairs every record with its
    // w−1 = 7 sort neighbors, catching prefix-similar records across
    // any attribute disagreement. THE SCALE DESIGN: the global sort
    // POSITION is the q40 two-level prefix sum (per-prefix-block
    // totals → tiny ordered window over the bounded block table →
    // block-partitioned row_number) — never an unpartitioned
    // window — and the neighbor pairing is a pos-div-w BAND JOIN
    // (left row explodes to exactly 2 bucket keys, each (a,b) pair
    // lands in exactly one bucket), so candidates are w·N with one
    // equi-join shuffle. Verification is the family's jaro_winkler
    // ≥ 0.85 (native codegen expr, DuckDB twin pinned by q151).
    "q367_sorted_neighborhood" -> ((s, d) => {
      val W = 8
      val p = graft.Tables.load(s, d, "part")
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
        .withColumn("blkk", substring(col("name"), 1, 2))
      val totals = p.groupBy("blkk").agg(count(lit(1)).as("tot"))
      // the one ordered window runs over the bounded prefix-block
      // table (≤ |alphabet|² rows), the Pack.withGlobalOffset shape
      val wPrefix = Window.orderBy("blkk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefixes = totals
        .withColumn("off", coalesce(sum("tot").over(wPrefix), lit(0L)))
        .select("blkk", "off")
      val wLocal = Window.partitionBy("blkk").orderBy("name", "id")
      val pos = p.join(broadcast(prefixes), "blkk")
        .withColumn("pos", col("off") + row_number().over(wLocal))
        .select("id", "name", "pos")
      val a = pos.select(col("id").as("id_a"), col("name").as("name_a"),
        col("pos").as("pos_a"),
        explode(array(expr(s"pos div $W"), expr(s"pos div $W + 1")))
          .as("jb"))
      val b = pos.select(col("id").as("id_b"), col("name").as("name_b"),
        col("pos").as("pos_b"), expr(s"pos div $W").as("jb"))
      a.join(b, "jb")
        .where(expr(s"pos_b - pos_a between 1 and ${W - 1}"))
        .withColumn("sim", round(expr("jaro_winkler(name_a, name_b)"), 6))
        .where(col("sim") >= 0.85)
        .select(col("id_a"), col("id_b"),
          (col("pos_b") - col("pos_a")).as("gap"), col("sim"))
        .orderBy("id_a", "id_b")
    }),

    // q357 — BOX-FILTER IMAGE DOWNSAMPLE over the REAL codec: each
    // synthetic PNG decodes through javax.imageio and 2×2
    // box-averages to floor-half dimensions (truncating integer mean
    // per channel — ImageCodec.boxDownsample), the antialiasing
    // resize a vision pipeline runs before feature extraction (q131's
    // nearest-neighbor decimation aliases; the box filter is the
    // production default). Gated per image on output dims + exact
    // per-channel pixel sums; the ORACLE recomputes decode →
    // box-average from the closed-form pixel polynomial, so codec
    // drift, an off-by-one block index, or rounding-mode drift all
    // hash-mismatch. Plan: mapPartitions only for the binary codec
    // (the documented seam); everything after is a scan-side
    // projection of bounded per-image rows.
    "q357_image_downsample" -> ((s, d) => {
      import s.implicits._
      val ids = docs(s, d).where(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.map { id =>
          val raw = Multimodal.ImageCodec.decode(
            Multimodal.synthImagePng(id), "png")
          val small = Multimodal.ImageCodec.boxDownsample(raw)
          val (w2, h2) = Multimodal.ImageCodec.rawDims(small)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var p = 0
          while (p < w2 * h2) {
            val o = 8 + p * 3
            sr += small(o) & 0xff
            sg += small(o + 1) & 0xff
            sb += small(o + 2) & 0xff
            p += 1
          }
          (id, w2.toLong, h2.toLong, sr, sg, sb)
        }
      }.toDF("img_id", "out_w", "out_h", "sum_r", "sum_g", "sum_b")
        .orderBy("img_id")
    }),

    // q358 — UNIGRAM-LM TOKENIZER (SentencePiece role): the
    // likelihood-based subword model NEXT TO q133's merge-based BPE —
    // vocabulary = every character plus the top-20 weighted 2..4-gram
    // substrings, piece price = −ln p(piece) in exact micros (the
    // audited ⌊ln(int)·10⁶⌋ idiom as ml(tot) − ml(cnt)), and each
    // word's OPTIMAL segmentation found by Viterbi DP over its
    // positions. Determinism without path extraction: the DP runs on
    // the combined integer cost2 = 32·Σprice + n_pieces, so the
    // minimum is a single integer whose quotient/remainder decompose
    // into (cost_micro, n_pieces) — equal-likelihood ties resolve to
    // the fewest pieces, and no ambiguous path is ever needed.
    // Bounds are part of the contract: words ≤ 12 chars (the DP
    // unrolls 12 fixed rounds — the oracle replays the identical
    // unroll), pieces ≤ 4 chars. Plan: the DP iterates on the
    // DISTINCT-WORD table (vocabulary-sized, never the corpus), 4
    // broadcast-vocab joins per round, lineage truncated per round
    // (the q334 mat idiom); the corpus is touched exactly once to
    // build word counts.
    "q358_unigram_tokenizer" -> ((s, d) => {
      def mat(df: DataFrame): DataFrame =
        if (s.sparkContext.getCheckpointDir.isDefined)
          df.checkpoint(eager = true) else df.localCheckpoint(true)
      def ml(x: String) = s"cast(floor(ln($x) * 1000000) as bigint)"
      val wv = mat(docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .where(col("w").rlike("^[a-z0-9]+$") && length(col("w")) <= 12)
        .groupBy("w").agg(count(lit(1)).as("cnt")))
      val occ = wv
        .select(col("w"), col("cnt"),
          explode(sequence(lit(1), length(col("w")))).as("st"))
        .select(col("w"), col("cnt"), col("st"),
          explode(sequence(lit(1), lit(4))).as("k"))
        .where(col("st") + col("k") - 1 <= length(col("w")))
        .select(expr("substring(w, st, k)").as("piece"), col("cnt"))
      val pcnt = occ.groupBy("piece").agg(sum("cnt").as("pc"))
      val vocab = pcnt.where(length(col("piece")) === 1)
        .unionByName(pcnt.where(length(col("piece")) >= 2)
          .orderBy(desc("pc"), col("piece")).limit(20))
      val tot = vocab.agg(sum("pc").as("tot"))
      val priced = mat(vocab.crossJoin(broadcast(tot))
        .select(col("piece"),
          ((expr(ml("tot")) - expr(ml("pc"))) * 32L + 1L).as("price2")))
      val base = wv.select(col("w"), col("cnt"),
        length(col("w")).cast("long").as("l"))
      // layers(p) = min cost2 to segment the first p chars
      val layers = scala.collection.mutable.Map(
        0 -> base.withColumn("best2", lit(0L)))
      for (p <- 1 to 12) {
        val cand = (1 to math.min(4, p)).map { k =>
          layers(p - k).where(col("l") >= p)
            .join(broadcast(priced),
              expr(s"substring(w, ${p - k + 1}, $k)") === col("piece"))
            .select(col("w"), col("cnt"), col("l"),
              (col("best2") + col("price2")).as("b2"))
        }.reduce(_ unionByName _)
        layers(p) = mat(cand.groupBy("w", "cnt", "l")
          .agg(min("b2").as("best2")))
      }
      (1 to 12).map(p => layers(p).where(col("l") === p))
        .reduce(_ unionByName _)
        .select(col("w").as("word"), col("cnt"),
          (col("best2") % 32L).as("n_pieces"),
          expr("best2 div 32").as("cost_micro"))
        .orderBy("word")
    }),

    // q354 — L-DIVERSITY AUDIT: the release gate BESIDE q184's
    // k-anonymity — a cell can clear k (enough distinct people) and
    // still leak (everyone in it shares the sensitive value).
    // Sensitive attribute = spend band (cents div 10000, the
    // hundreds), quasi-identifiers = q184's (event_type, day) cells;
    // per cell: distinct sensitive values; per type: cells failing
    // l = 2 and l = 3, min l. Same one-partial-agg-cascade plan as
    // q184, no new corpus pass.
    "q354_l_diversity" -> ((s, d) => {
      val cells = graft.Tables.load(s, d, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          expr("cast(round(value * 100) as bigint) div 10000").as("band"))
        .groupBy("event_type", "day")
        .agg(countDistinct("band").as("l_cell"))
      cells.groupBy("event_type")
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("l_cell") < 2, 1L).otherwise(0L)).as("n_fail_l2"),
          sum(when(col("l_cell") < 3, 1L).otherwise(0L)).as("n_fail_l3"),
          min("l_cell").as("min_l"))
        .orderBy("event_type")
    }),

    // q366 — AMS F2 SKETCH (tug-of-war): Alon–Matias–Szegedy's
    // second-moment estimator — F2 = Σf² of the token-frequency
    // vector (the self-join size / repeat-rate statistic behind skew
    // planning) from NINE ±1 projections instead of the frequency
    // table: X_r = Σ_t s_r(t)·f(t), E[X²] = F2, answer = median of
    // the 9 squares. Completes the sketch shelf (q21 HLL counts
    // distinct ≈ F0, q95 CMS point counts, q97 GK ranks — F2 is the
    // moment none of them gives). Signs are md5-parity derived
    // (engine-reproducible, 4-wise-independence stand-in), so the
    // gate is EXACT integers end-to-end: the X_r accumulate in
    // BIGINT (|X| ≤ corpus tokens), squares and F2 in
    // decimal(38,0)/HUGEINT, the in-band boolean [F2/4, 3·F2] is the
    // estimator's documented tolerance (median-of-9 over a
    // Var ≤ 2F2² estimator — and md5-deterministic besides). The
    // exact leg exists only because the harness can afford truth.
    // Plan: ONE corpus scan → token-frequency partial agg; the
    // 9-way sign explode runs on the VOCABULARY table (9 rows per
    // distinct term, never per corpus token), folding to 9 rows.
    "q366_ams_f2" -> ((s, d) => {
      val tf = docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("f"))
      val exact = tf.agg(
        sum(expr("cast(f as decimal(38,0)) * f")).as("f2"),
        count(lit(1)).as("n_terms"))
      val est = tf
        .select(col("w"), col("f"),
          explode(sequence(lit(0), lit(8))).as("r"))
        .withColumn("sgn", when(substring(md5(concat(lit("ams"),
            col("r").cast("string"), lit(":"), col("w"))), 1, 1)
          .isin("1", "3", "5", "7", "9", "b", "d", "f"), -1L)
          .otherwise(1L))
        .groupBy("r").agg(sum(col("sgn") * col("f")).as("x"))
        .select(expr("cast(x as decimal(38,0)) * x").as("e"))
      val med = est.orderBy("e").limit(5).agg(max("e").as("f2e"))
      exact.crossJoin(broadcast(med))
        .select(col("n_terms"),
          expr("cast(f2 as bigint)").as("f2_exact"),
          expr("cast(f2e as bigint)").as("f2_est"),
          (col("f2e") <= col("f2") * 3 && col("f2e") * 4 >= col("f2"))
            .as("est_in_band"))
    }))

  // q130's corpus CTEs: banner-injected normalized text, token lists,
  // and non-overlapping 5-token blocks with their in-doc index
  private def duckBlockCtes =
    ("d AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 " +
      s"THEN '$Banner ' || text ELSE text END AS text FROM documents), " +
      s"tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS l FROM d), " +
      "tot AS (SELECT doc_id, (len(l) + 4) // 5 AS n_blocks FROM tk), " +
      "bl AS (SELECT doc_id, i, " +
      "array_to_string(l[(i * 5 + 1):(i * 5 + 5)], ' ') AS b " +
      "FROM (SELECT doc_id, l, " +
      "unnest(generate_series(0, CAST((len(l) + 4) // 5 AS INT) - 1)) AS i " +
      "FROM tk))")

  // q131's closed-form twin of decode→resize→aHash: pixel polynomial
  // (+ the twin's clamped red shift on source columns x < 2), NN
  // resize index arithmetic, integer aHash bits, all-pairs Hamming
  /** pHash oracle CTE chain with px-prefixed names so it composes
    * next to the shingle/band CTEs (q220) without collisions; yields
    * `pxhm(a_id, b_id, hamming)` over the asset set (originals
    * doc_id < 100, brightened twins at +100).
    */
  private def duckPhashCtes: String = {
    val x = "((x8 * w) // 8)"
    val y = "((y8 * h) // 8)"
    val r0 = s"(bid * 31 + $x * 7 + $y * 13) % 256"
    val v = s"(CASE WHEN tw AND $x < 2 THEN least($r0 + 8, 255) ELSE $r0 END) " +
      s"+ (bid + $x * 3 + $y * 5) % 256 + (bid * 17 + $x + $y * 2) % 256"
    "pxids AS (SELECT doc_id AS id, doc_id AS bid, FALSE AS tw " +
      "FROM documents WHERE doc_id < 100 " +
      "UNION ALL SELECT doc_id + 100, doc_id, TRUE " +
      "FROM documents WHERE doc_id < 100), " +
      "pxdims AS (SELECT id, bid, tw, 16 + bid % 16 AS w, 16 + bid % 8 AS h " +
      "FROM pxids), " +
      "pxg8 AS (SELECT id, bid, tw, w, h, " +
      "unnest(generate_series(0, 7)) AS y8 FROM pxdims), " +
      "pxp8 AS (SELECT id, bid, tw, w, h, y8, " +
      "unnest(generate_series(0, 7)) AS x8 FROM pxg8), " +
      s"pxpv AS (SELECT id, y8 * 8 + x8 AS j, $v AS v FROM pxp8), " +
      "pxs AS (SELECT id, sum(v) AS s64 FROM pxpv GROUP BY 1), " +
      "pxbits AS (SELECT pxpv.id, j, " +
      "CASE WHEN 64 * pxpv.v > pxs.s64 THEN 1 ELSE 0 END AS bit " +
      "FROM pxpv JOIN pxs ON pxpv.id = pxs.id), " +
      "pxhm AS (SELECT a.id AS a_id, b.id AS b_id, " +
      "sum(abs(a.bit - b.bit)) AS hamming FROM pxbits a " +
      "JOIN pxbits b ON a.j = b.j AND a.id < b.id GROUP BY 1, 2)"
  }

  private def duckPhashSql =
    "WITH " + duckPhashCtes +
      " SELECT a_id, b_id, CAST(hamming AS BIGINT) AS hamming FROM pxhm " +
      "WHERE hamming <= 7 ORDER BY a_id, b_id"

  // q133's five-round BPE replay: s0 holds the char-split sequences;
  // each round i extracts adjacent pairs (e_i), picks the argmax with
  // the engine's exact tie-break (t_i), and applies the merge with the
  // same boundary-safe replace the Spark side uses (s_i)
  /** The shared training replay: word-frequency vocabulary, symbol
    * sequences, and `steps` rounds of (pair count, argmax, replace) —
    * the WITH-body both BPE oracles start from.
    */
  private def duckBpeCtes(steps: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH wv AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM " +
      s"(SELECT unnest(string_split($duckNorm, ' ')) AS w FROM documents) "
    sb ++= "WHERE regexp_matches(w, '^[a-z0-9]+"
    sb ++= "$') GROUP BY 1), "
    sb ++= "s0 AS (SELECT cnt, regexp_replace(w, '(.)', '·\\1', 'g') AS seq FROM wv)"
    for (i <- 1 to steps) {
      sb ++= s", e$i AS (SELECT cnt, unnest(list_transform(range(1, len(sy)), " +
        "j -> sy[j] || '·' || sy[j+1])) AS pair FROM " +
        s"(SELECT cnt, string_split(seq, '·')[2:] AS sy FROM s${i - 1}))"
      sb ++= s", t$i AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c FROM e$i " +
        "GROUP BY 1 ORDER BY c DESC, pair LIMIT 1)"
      sb ++= s", s$i AS (SELECT cnt, replace(seq, '·' || (SELECT pair FROM t$i), " +
        s"'·' || (SELECT replace(pair, '·', '') FROM t$i)) AS seq FROM s${i - 1})"
    }
    sb.toString
  }

  private def duckBpeSql: String = {
    val steps = 5
    duckBpeCtes(steps) + " SELECT * FROM (" +
      (1 to steps).map(i =>
        s"SELECT $i AS step, pair, replace(pair, '·', '') AS merged, " +
          s"c AS cnt FROM t$i").mkString(" UNION ALL ") +
      ") ORDER BY step"
  }

  /** q373's twin: the q133 round chain with the WordPiece likelihood
    * argmax — per round a symbol-count CTE joins the pair counts and
    * the winner maximizes c·10¹²//(c_a·c_b) (HUGEINT products, ties
    * to the smallest pair), mirroring Bpe.trainWordPiece exactly.
    */
  private def duckWordPieceSql: String = {
    val steps = 5
    val sb = new StringBuilder
    sb ++= "WITH wv AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM " +
      s"(SELECT unnest(string_split($duckNorm, ' ')) AS w FROM documents) "
    sb ++= "WHERE regexp_matches(w, '^[a-z0-9]+"
    sb ++= "$') GROUP BY 1), "
    sb ++= "s0 AS MATERIALIZED (SELECT cnt, " +
      "regexp_replace(w, '(.)', '·\\1', 'g') AS seq FROM wv)"
    // every per-round CTE is MATERIALIZED: each round references the
    // previous sequence table three times (pair explode, symbol
    // counts, the replace) and the winner twice — inlined, the chain
    // re-evaluates ~5× per round (5⁵ at five steps; measured: the
    // inlined form ran minutes where this runs in seconds)
    for (i <- 1 to steps) {
      sb ++= s", e$i AS MATERIALIZED (SELECT cnt, " +
        "unnest(list_transform(range(1, len(sy)), " +
        "j -> sy[j] || '·' || sy[j+1])) AS pair FROM " +
        s"(SELECT cnt, string_split(seq, '·')[2:] AS sy FROM s${i - 1}))"
      sb ++= s", y$i AS MATERIALIZED (SELECT sym, " +
        "CAST(SUM(cnt) AS BIGINT) AS sc FROM " +
        "(SELECT cnt, unnest(string_split(seq, '·')[2:]) AS sym " +
        s"FROM s${i - 1}) GROUP BY 1)"
      sb ++= s", p$i AS MATERIALIZED (SELECT pair, " +
        s"CAST(sum(cnt) AS BIGINT) AS c FROM e$i GROUP BY 1)"
      sb ++= s", t$i AS MATERIALIZED (SELECT p$i.pair, c, " +
        "CAST(c::HUGEINT * 1000000000000 // (a.sc::HUGEINT * b.sc) " +
        "AS BIGINT) AS score " +
        s"FROM p$i JOIN y$i a ON a.sym = string_split(p$i.pair, '·')[1] " +
        s"JOIN y$i b ON b.sym = string_split(p$i.pair, '·')[2] " +
        "ORDER BY score DESC, pair LIMIT 1)"
      sb ++= s", s$i AS MATERIALIZED (SELECT cnt, replace(seq, " +
        s"'·' || (SELECT pair FROM t$i), " +
        s"'·' || (SELECT replace(pair, '·', '') FROM t$i)) AS seq " +
        s"FROM s${i - 1})"
    }
    sb ++= " SELECT * FROM (" +
      (1 to steps).map(i =>
        s"SELECT $i AS step, pair, replace(pair, '·', '') AS merged, " +
          s"c AS cnt, score AS score_pico FROM t$i").mkString(" UNION ALL ") +
      ") ORDER BY step"
    sb.toString
  }

  /** q202's twin: the SAME training rounds, then the five learned
    * replaces applied to every word occurrence per document, symbols
    * counted as separators.
    */
  private def duckBpeEncodeSql: String = {
    val steps = 5
    val sb = new StringBuilder
    sb ++= duckBpeCtes(steps)
    sb ++= s", dw AS (SELECT doc_id, unnest(string_split($duckNorm, ' ')) " +
      "AS w FROM documents)"
    sb ++= ", dq0 AS (SELECT doc_id, regexp_replace(w, '(.)', '·\\1', 'g') " +
      "AS seq FROM dw WHERE regexp_matches(w, '^[a-z0-9]+"
    sb ++= "$'))"
    for (i <- 1 to steps) {
      sb ++= s", dq$i AS (SELECT doc_id, replace(seq, " +
        s"'·' || (SELECT pair FROM t$i), " +
        s"'·' || (SELECT replace(pair, '·', '') FROM t$i)) AS seq " +
        s"FROM dq${i - 1})"
    }
    sb ++= s" SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, " +
      "CAST(sum(len(string_split(seq, '·')) - 1) AS BIGINT) AS n_tokens " +
      s"FROM dq$steps GROUP BY doc_id ORDER BY doc_id"
    sb.toString
  }

  /** q224's replay: identical tournament, win matrix, and 15 unrolled
    * MM rounds (update + renormalize per round) in pure integer
    * arithmetic — the CTE chain is the oracle twin of the driver-side
    * fixed point, so every division and clamp is gate-checked.
    */
  /** The shared tournament prefix (documents → md5 buckets → duels →
    * per-(winner, loser) win counts in `base`) — consumed by the q224
    * Bradley-Terry chain and the q263 transitivity audit.
    */
  private def duckTournamentCtes: String =
    "WITH d0 AS (SELECT doc_id, source, n_chars, " +
      "('0x' || substr(md5('bt:' || CAST(doc_id AS VARCHAR)), 1, 8))" +
      "::BIGINT % 300 AS bkt, " +
      "('0x' || substr(md5('ord:' || CAST(doc_id AS VARCHAR)), 1, 8))" +
      "::BIGINT AS ord FROM documents), " +
      "r AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY bkt " +
      "ORDER BY ord, doc_id) AS rn FROM d0), " +
      "pr AS MATERIALIZED (SELECT CASE WHEN a.n_chars > b.n_chars OR " +
      "(a.n_chars = b.n_chars AND a.doc_id < b.doc_id) " +
      "THEN a.source ELSE b.source END AS winner, " +
      "CASE WHEN a.n_chars > b.n_chars OR " +
      "(a.n_chars = b.n_chars AND a.doc_id < b.doc_id) " +
      "THEN b.source ELSE a.source END AS loser " +
      "FROM r a JOIN r b ON a.bkt = b.bkt AND a.rn = 1 AND b.rn = 2 " +
      "WHERE a.source <> b.source), " +
      "base AS MATERIALIZED (SELECT winner, loser, CAST(count(*) AS BIGINT) AS nw " +
      "FROM pr GROUP BY 1, 2)"

  private def duckBradleyTerrySql: String = {
    val rounds = 15
    val sb = new StringBuilder
    sb ++= duckTournamentCtes + ", " +
      "m AS MATERIALIZED (SELECT a, b, CAST(sum(nn) AS BIGINT) AS n FROM (" +
      "SELECT winner AS a, loser AS b, nw AS nn FROM base " +
      "UNION ALL SELECT loser, winner, nw FROM base) GROUP BY 1, 2), " +
      "pl AS MATERIALIZED (SELECT DISTINCT a AS src FROM m), " +
      "w AS MATERIALIZED (SELECT pl.src, CAST(coalesce((SELECT sum(nw) FROM base " +
      "WHERE winner = pl.src), 0) AS BIGINT) AS wins FROM pl), " +
      "ts AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) * 1000000 AS t FROM pl), " +
      "it0 AS MATERIALIZED (SELECT src, CAST(1000000 AS BIGINT) AS p FROM pl)"
    for (k <- 1 to rounds) {
      sb ++= s", dd$k AS MATERIALIZED (SELECT m.a AS src, " +
        "CAST(sum(m.n * 1000000000000 // (pa.p + pb.p)) AS BIGINT) AS den " +
        s"FROM m JOIN it${k - 1} pa ON pa.src = m.a " +
        s"JOIN it${k - 1} pb ON pb.src = m.b GROUP BY m.a)"
      sb ++= s", x$k AS MATERIALIZED (SELECT w.src, greatest(CASE WHEN d.den = 0 " +
        "THEN 1000000 ELSE w.wins * 1000000000000 // d.den END, 1) AS p " +
        s"FROM w JOIN dd$k d ON d.src = w.src)"
      sb ++= s", it$k AS MATERIALIZED (SELECT x.src, CAST(greatest(" +
        "x.p * (SELECT t FROM ts) // " +
        s"(SELECT CAST(sum(p) AS BIGINT) FROM x$k), 1) AS BIGINT) AS p " +
        s"FROM x$k x)"
    }
    sb ++= " SELECT w.src AS source, w.wins AS n_wins, " +
      "CAST((SELECT sum(n) FROM m WHERE m.a = w.src) AS BIGINT) " +
      "AS n_matches, " +
      s"CAST(it.p * 1000000 // (SELECT CAST(sum(p) AS BIGINT) " +
      s"FROM it$rounds) AS BIGINT) AS rating_micro " +
      s"FROM w JOIN it$rounds it ON it.src = w.src ORDER BY source"
    sb.toString
  }

  val oracleSql: Map[String, String] = Map(
    "q224_bradley_terry" -> duckBradleyTerrySql,

    // same tournament, strict-majority orientation, min-node triad join
    "q263_preference_cycles" ->
      (duckTournamentCtes + ", " +
        "net AS (SELECT winner AS a, loser AS b, nw FROM base), " +
        "ed AS MATERIALIZED (SELECT n1.a, n1.b FROM net n1 " +
        "LEFT JOIN net n2 ON n2.a = n1.b AND n2.b = n1.a " +
        "WHERE n1.nw > COALESCE(n2.nw, 0)), " +
        "srcs AS (SELECT DISTINCT s FROM (SELECT winner AS s FROM base " +
        "UNION ALL SELECT loser FROM base)), " +
        "cy AS (SELECT count(*) AS c FROM ed x " +
        "JOIN ed y ON y.a = x.b JOIN ed z ON z.a = y.b AND z.b = x.a " +
        "WHERE x.a < x.b AND x.a < y.b) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM srcs) AS n_sources, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM ed) AS n_edges, " +
        "(SELECT CAST(c AS BIGINT) FROM cy) AS n_cyclic_triads"),

    // identical planted twins, keyed-truth m-leg, md5-ring random-
    // pairing u-leg (row_number replay), blocking and micro-log
    // weight arithmetic on exact products, same ≥ 0 decision cut
    "q261_fellegi_sunter" -> {
      def ml(x: String) = s"CAST(FLOOR(ln($x) * 1000000) AS BIGINT)"
      def wa(f: Int) = s"(${ml(s"(m$f + 1) * (uden + 2)")} " +
        s"- ${ml(s"(u$f + 1) * (mden + 2)")})"
      def wd(f: Int) = s"(${ml(s"(mden + 1 - m$f) * (uden + 2)")} " +
        s"- ${ml(s"(uden + 1 - u$f) * (mden + 2)")})"
      val score = (1 to 3).map(f =>
        s"(CASE WHEN g$f THEN ${wa(f)} ELSE ${wd(f)} END)").mkString(" + ")
      "WITH p0 AS (SELECT p_partkey AS id, p_name AS name, " +
        "p_brand AS brand, p_size AS size, p_type AS ptype FROM part), " +
        "tw AS (SELECT id + 10000000 AS id, " +
        "'z' || substr(name, 2) AS name, brand, size, ptype " +
        "FROM p0 WHERE id % 5 = 0), " +
        "u AS (SELECT * FROM p0 UNION ALL SELECT * FROM tw), " +
        "mp AS (SELECT " +
        "(round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.9) AS g1, " +
        "(substr(a.name, 1, 4) = substr(b.name, 1, 4)) AS g2, " +
        "(a.ptype = b.ptype) AS g3 " +
        "FROM p0 a JOIN tw b ON b.id = a.id + 10000000 " +
        "WHERE a.id % 5 = 0), " +
        "mest AS (SELECT COUNT(*) AS mden, " +
        "SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS m1, " +
        "SUM(CASE WHEN g2 THEN 1 ELSE 0 END) AS m2, " +
        "SUM(CASE WHEN g3 THEN 1 ELSE 0 END) AS m3 FROM mp), " +
        "rg AS (SELECT id, name, ptype, " +
        "('0x' || substr(md5('fs:' || id), 1, 15))::BIGINT AS h FROM u), " +
        "sh AS (SELECT *, h % 256 AS shard, row_number() OVER (" +
        "PARTITION BY h % 256 ORDER BY h, id) AS rn FROM rg), " +
        "rp AS (SELECT " +
        "(round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.9) AS g1, " +
        "(substr(a.name, 1, 4) = substr(b.name, 1, 4)) AS g2, " +
        "(a.ptype = b.ptype) AS g3 " +
        "FROM sh a JOIN sh b ON a.shard = b.shard AND b.rn = a.rn + 1 " +
        "WHERE a.rn % 2 = 1 AND abs(a.id - b.id) <> 10000000), " +
        "uest AS (SELECT COUNT(*) AS uden, " +
        "SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS u1, " +
        "SUM(CASE WHEN g2 THEN 1 ELSE 0 END) AS u2, " +
        "SUM(CASE WHEN g3 THEN 1 ELSE 0 END) AS u3 FROM rp), " +
        "pr AS (SELECT a.id AS id_a, b.id AS id_b, " +
        "(b.id - a.id = 10000000) AS is_true, " +
        "(round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.9) " +
        "AS g1, " +
        "(substr(a.name, 1, 4) = substr(b.name, 1, 4)) AS g2, " +
        "(a.ptype = b.ptype) AS g3 " +
        "FROM u a JOIN u b ON a.brand = b.brand AND a.size = b.size " +
        "AND a.id < b.id " +
        "AND greatest(length(a.name), length(b.name)) <= " +
        "least(length(a.name), length(b.name)) * 4) " +
        "SELECT id_a, id_b, is_true, " +
        s"CAST($score AS BIGINT) AS score_micro " +
        "FROM pr CROSS JOIN mest CROSS JOIN uest " +
        s"WHERE ($score) >= 0 ORDER BY id_a, id_b"
    },

    // same closed-form C(N,2) + histogram candidate count, same
    // md5-lowest-1024 truth sample, same match rule
    // (jaro_winkler_similarity ≡ the native jaro_winkler — the
    // q151-proven pairing), same blocking predicate
    "q246_blocking_audit" ->
      ("WITH p AS (SELECT p_partkey AS id, p_name AS name, " +
        "p_brand AS brand, p_size AS size FROM part), " +
        "nn AS (SELECT COUNT(*) AS n FROM p), " +
        "hist AS (SELECT brand, size, length(name) AS len, " +
        "COUNT(*) AS c FROM p GROUP BY 1, 2, 3), " +
        "cand AS (SELECT COALESCE(CAST(SUM(CASE WHEN a.len = b.len " +
        "THEN a.c * (a.c - 1) // 2 ELSE a.c * b.c END) AS BIGINT), 0) " +
        "AS n_cand FROM hist a JOIN hist b " +
        "ON a.brand = b.brand AND a.size = b.size " +
        "AND a.len <= b.len AND b.len <= a.len * 4), " +
        "samp AS (SELECT id, name, brand, size FROM (SELECT *, " +
        "('0x' || substr(md5('aud:' || id), 1, 15))::BIGINT AS h " +
        "FROM p) ORDER BY h LIMIT 1024), " +
        "pr AS (SELECT " +
        "(round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.85) " +
        "AS is_true, " +
        "(a.brand = b.brand AND a.size = b.size AND " +
        "greatest(length(a.name), length(b.name)) <= " +
        "least(length(a.name), length(b.name)) * 4) AS is_cand " +
        "FROM samp a JOIN samp b ON a.id < b.id) " +
        "SELECT " +
        "CAST(n::HUGEINT * (n - 1) // 2 AS BIGINT) AS n_all_pairs, " +
        "CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_true, " +
        "n_cand, " +
        "CAST(SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_found, " +
        "CAST(CASE WHEN SUM(CASE WHEN is_true THEN 1 ELSE 0 END) = 0 " +
        "THEN 1000000 ELSE " +
        "SUM(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END) * 1000000 " +
        "// SUM(CASE WHEN is_true THEN 1 ELSE 0 END) END AS BIGINT) " +
        "AS pc_micro, " +
        "CAST((n::HUGEINT * (n - 1) // 2 - n_cand) * 1000000 " +
        "// (n::HUGEINT * (n - 1) // 2) AS BIGINT) AS rr_micro " +
        "FROM pr CROSS JOIN nn CROSS JOIN cand " +
        "GROUP BY n, n_cand"),

    // identical sort order, division-free capped predicate, truncating
    // λ and largest-prefix remainder bonus
    "q242_waterfill_budget" ->
      ("WITH caps AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) " +
        "AS cap FROM documents GROUP BY 1), " +
        "o AS (SELECT source, cap, " +
        "CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS i, " +
        "SUM(cap) OVER (ORDER BY cap, source ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS prefix, " +
        "COUNT(*) OVER () AS n, " +
        "(SUM(cap) OVER ()) * 9 // 10 AS tbudget FROM caps), " +
        "f AS (SELECT *, " +
        "(cap * (n - i + 1) + (prefix - cap) <= tbudget) AS capped " +
        "FROM o), " +
        "g AS (SELECT *, " +
        "SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS k, " +
        "SUM(CASE WHEN capped THEN cap ELSE 0 END) OVER () AS pk " +
        "FROM f) " +
        "SELECT source, CAST(cap AS BIGINT) AS cap_chars, " +
        "CAST(tbudget AS BIGINT) AS budget_chars, " +
        "CAST(CASE WHEN capped THEN cap ELSE " +
        "(tbudget - pk) // (n - k) + (CASE WHEN i - k <= " +
        "(tbudget - pk) % (n - k) THEN 1 ELSE 0 END) END AS BIGINT) " +
        "AS alloc_chars FROM g ORDER BY source"),

    // same regex totals, same ≥1 clamps, same truncating micro math
    "q227_readability" ->
      ("WITH c AS (SELECT doc_id, " +
        "greatest(len(string_split(regexp_replace(lower(trim(text)), " +
        "'\\s+', ' ', 'g'), ' ')), 1) AS n_words, " +
        "greatest(len(regexp_extract_all(text, '[.!?]+')), 1) " +
        "AS n_sentences, " +
        "greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) " +
        "AS n_syllables FROM documents) " +
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, " +
        "CAST(n_sentences AS BIGINT) AS n_sentences, " +
        "CAST(n_syllables AS BIGINT) AS n_syllables, " +
        "206835000 - (1015000 * n_words) // n_sentences - " +
        "(84600000 * n_syllables) // n_words AS fre_micro, " +
        "(390000 * n_words) // n_sentences + " +
        "(11800000 * n_syllables) // n_words - 15590000 AS fk_grade_micro " +
        "FROM c ORDER BY doc_id"),

    // same distinct pair table, same inclusion-exclusion micro shares
    "q193_source_overlap" ->
      (s"WITH st AS (SELECT DISTINCT source, " +
        s"unnest(string_split($duckNorm, ' ')) AS token FROM documents), " +
        "sz AS (SELECT source, count(*) AS sz FROM st GROUP BY 1), " +
        "i AS (SELECT a.source AS src_a, b.source AS src_b, " +
        "count(*) AS inter FROM st a JOIN st b ON a.token = b.token " +
        "AND a.source < b.source GROUP BY 1, 2) " +
        "SELECT src_a, src_b, inter, " +
        "inter * 1000000 // (za.sz + zb.sz - inter) AS jaccard_micro " +
        "FROM i JOIN sz za ON za.source = src_a " +
        "JOIN sz zb ON zb.source = src_b ORDER BY src_a, src_b"),

    // same md5 index derivation, same self-pair drop, same resolve
    "q183_negative_sample" ->
      ("WITH cnt AS (SELECT count(*) AS c FROM documents), " +
        "pairs AS (SELECT d.doc_id, t.t, " +
        "('0x' || substr(md5('neg:' || CAST(d.doc_id AS VARCHAR) || ':' " +
        "|| CAST(t.t AS VARCHAR)), 1, 8))::BIGINT % (SELECT c FROM cnt) " +
        "AS neg_id FROM documents d, " +
        "(SELECT unnest(generate_series(0, 3)) AS t) t) " +
        "SELECT p.doc_id, p.t, p.neg_id, md5(n.text) AS neg_md5 " +
        "FROM pairs p JOIN documents n ON n.doc_id = p.neg_id " +
        "WHERE p.neg_id <> p.doc_id ORDER BY p.doc_id, p.t"),

    // same salted hash, same cell audit, injectivity recomputed
    "q184_k_anonymity" ->
      ("WITH e AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "substr(md5('salt1:' || CAST(user_id AS VARCHAR)), 1, 16) AS pseud, " +
        "user_id FROM events), " +
        "inj AS (SELECT count(DISTINCT pseud) = count(DISTINCT user_id) " +
        "AS injective FROM e), " +
        "cells AS (SELECT event_type, day, count(DISTINCT pseud) AS k_cell " +
        "FROM e GROUP BY 1, 2) " +
        "SELECT event_type, count(*) AS n_cells, " +
        "CAST(sum(CASE WHEN k_cell < 3 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_risky, min(k_cell) AS min_k, " +
        "(SELECT injective FROM inj) AS injective " +
        "FROM cells GROUP BY event_type ORDER BY event_type"),

    // same micro logs, same single trailing integer division
    "q182_token_entropy" ->
      (s"WITH t AS (SELECT doc_id, unnest(string_split($duckNorm, ' ')) " +
        "AS token FROM documents), " +
        "tc AS (SELECT doc_id, token, count(*) AS c FROM t GROUP BY 1, 2), " +
        "a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, " +
        "count(*) AS n_distinct, " +
        "CAST(sum(c * CAST(floor(ln(c) * 1000000) AS BIGINT)) AS BIGINT) " +
        "AS sclnc FROM tc GROUP BY 1) " +
        "SELECT doc_id, n, n_distinct, " +
        "(n * CAST(floor(ln(n) * 1000000) AS BIGINT) - sclnc) // n " +
        "AS entropy_micro FROM a ORDER BY doc_id"),

    // the same match rule, recursive closure, and two-phase mode
    // survivorship
    "q170_golden_record" ->
      ("WITH RECURSIVE p AS (SELECT p_partkey AS id, p_name AS name, " +
        "p_brand AS brand, p_type AS ptype, p_size AS size, " +
        "CAST(round(p_retailprice * 100) AS BIGINT) AS cents FROM part), " +
        "pr AS (SELECT a.id AS ia, b.id AS ib FROM p a " +
        "JOIN p b ON a.brand = b.brand AND a.size = b.size " +
        "AND a.id < b.id " +
        "AND greatest(length(a.name), length(b.name)) <= " +
        "least(length(a.name), length(b.name)) * 4 " +
        "WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= 0.85), " +
        "edges AS (SELECT ia AS src, ib AS dst FROM pr " +
        "UNION SELECT ib, ia FROM pr), " +
        "cc(id, lbl) AS (SELECT id, id FROM p " +
        "UNION SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.id), " +
        "lab AS (SELECT id, min(lbl) AS cluster FROM cc GROUP BY id), " +
        "m AS (SELECT p.*, lab.cluster FROM p JOIN lab USING (id)), " +
        "nm AS (SELECT cluster, count(*) AS n_members, " +
        "max(cents) AS max_cents FROM m GROUP BY cluster), " +
        "bc AS (SELECT cluster, brand, count(*) AS cnt FROM m GROUP BY 1, 2), " +
        "bmx AS (SELECT cluster, max(cnt) AS mx FROM bc GROUP BY 1), " +
        "gb AS (SELECT bc.cluster, min(brand) AS golden_brand FROM bc " +
        "JOIN bmx ON bc.cluster = bmx.cluster AND bc.cnt = bmx.mx " +
        "GROUP BY 1), " +
        "tc AS (SELECT cluster, ptype, count(*) AS cnt FROM m GROUP BY 1, 2), " +
        "tmx AS (SELECT cluster, max(cnt) AS mx FROM tc GROUP BY 1), " +
        "gt AS (SELECT tc.cluster, min(ptype) AS golden_ptype FROM tc " +
        "JOIN tmx ON tc.cluster = tmx.cluster AND tc.cnt = tmx.mx " +
        "GROUP BY 1) " +
        "SELECT nm.cluster AS entity_id, n_members, golden_brand, " +
        "golden_ptype, max_cents FROM nm " +
        "JOIN gb ON gb.cluster = nm.cluster " +
        "JOIN gt ON gt.cluster = nm.cluster ORDER BY entity_id"),

    // the exact interval-join dau7 (q132's oracle); est_ok is literal
    // TRUE — the Spark side must land its merged-sketch estimates
    // inside the band
    "q171_hll_rolling_distinct" ->
      ("WITH ud AS (SELECT DISTINCT user_id, " +
        "epoch_ns(ts) // 86400000000000 AS day FROM events), " +
        "days AS (SELECT DISTINCT day FROM ud) " +
        "SELECT d.day, count(DISTINCT u.user_id) AS dau7, TRUE AS est_ok " +
        "FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day " +
        "GROUP BY d.day ORDER BY d.day"),

    // same micro-floored ln points, same HUGEINT-safe closed form,
    // same pinned double order
    "q165_zipf_fit" ->
      (s"WITH t AS (SELECT unnest(string_split($duckNorm, ' ')) AS token " +
        "FROM documents), " +
        "v AS (SELECT token, count(*) AS n FROM t GROUP BY token), " +
        "r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk " +
        "FROM v), " +
        "p AS (SELECT CAST(floor(ln(rk) * 1000000) AS BIGINT) AS x, " +
        "CAST(floor(ln(n) * 1000000) AS BIGINT) AS y FROM r WHERE rk <= 1000), " +
        "s AS (SELECT count(*) AS k, CAST(sum(x) AS BIGINT) AS sx, " +
        "CAST(sum(y) AS BIGINT) AS sy, sum(CAST(x AS HUGEINT) * y) AS sxy, " +
        "sum(CAST(x AS HUGEINT) * x) AS sxx FROM p), " +
        "f AS (SELECT k, sx, sy, " +
        "CAST(CAST(k AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) " +
        "/ CAST(CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) " +
        "AS slope_raw FROM s) " +
        "SELECT k, sx, sy, round(slope_raw, 6) AS slope, " +
        "round((CAST(sy AS DOUBLE) - slope_raw * CAST(sx AS DOUBLE)) / " +
        "(CAST(k AS DOUBLE) * 1000000.0), 6) AS intercept FROM f"),

    // the same counting model end-to-end: add-one micro log-liks,
    // micro log priors, max-score/min-lang argmax
    "q166_nb_classify" ->
      (s"WITH nd AS (SELECT doc_id, lang, $duckNorm AS ntext FROM documents), " +
        "tok AS (SELECT doc_id, lang, unnest(string_split(ntext, ' ')) " +
        "AS token FROM nd), " +
        "clt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY 1, 2), " +
        "cls AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tl FROM clt " +
        "GROUP BY 1), " +
        "tot AS (SELECT count(DISTINCT token) AS v FROM tok), " +
        "pri AS (SELECT d.lang, CAST(floor((ln(count(*)) - " +
        "ln((SELECT count(*) FROM documents))) * 1000000) AS BIGINT) " +
        "AS prior FROM documents d GROUP BY 1), " +
        "vocab AS (SELECT DISTINCT token FROM clt), " +
        "model AS (SELECT g.lang, g.token, " +
        "CAST(floor((ln(COALESCE(c.c, 0) + 1) - ln(g.tl + g.v)) * 1000000) " +
        "AS BIGINT) AS ll FROM " +
        "(SELECT l.lang, l.tl, t.v, vb.token FROM cls l " +
        "CROSS JOIN tot t CROSS JOIN vocab vb) g " +
        "LEFT JOIN clt c ON c.lang = g.lang AND c.token = g.token), " +
        "sc AS (SELECT t.doc_id, m.lang AS cand, " +
        "CAST(sum(m.ll) AS BIGINT) + min(p.prior) AS score " +
        "FROM tok t JOIN model m ON m.token = t.token " +
        "JOIN pri p ON p.lang = m.lang GROUP BY 1, 2), " +
        "best AS (SELECT doc_id, max(score) AS b FROM sc GROUP BY 1), " +
        "pred AS (SELECT s.doc_id, min(s.cand) AS lang_pred FROM sc s " +
        "JOIN best ON s.doc_id = best.doc_id AND s.score = best.b " +
        "GROUP BY 1) " +
        "SELECT d.lang AS lang_true, p.lang_pred, count(*) AS n " +
        "FROM pred p JOIN documents d ON d.doc_id = p.doc_id " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q133_bpe_train" -> duckBpeSql,
    "q373_wordpiece_train" -> duckWordPieceSql,
    "q202_bpe_encode" -> duckBpeEncodeSql,
    // the window formulation the native aggregate must reproduce
    "q140_topk_agg" ->
      ("WITH r AS (SELECT source, doc_id, n_chars, row_number() OVER " +
        "(PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk " +
        "FROM documents) " +
        "SELECT source, rk, doc_id, n_chars FROM r WHERE rk <= 3 " +
        "ORDER BY source, rk"),
    // the window formulation again — per-group bottom-k must match it
    "q141_group_sample" ->
      ("WITH hx AS (SELECT source, doc_id, " +
        "('0x' || substr(md5('gs:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT " +
        "AS h FROM documents), " +
        "r AS (SELECT source, doc_id, h, row_number() OVER " +
        "(PARTITION BY source ORDER BY h, doc_id) AS rk FROM hx) " +
        "SELECT source, rk, doc_id, h FROM r WHERE rk <= 5 " +
        "ORDER BY source, rk"),
    "q142_quality_report" ->
      ("WITH a AS (SELECT count(*) AS n, " +
        "CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS f_empty, " +
        "CAST(sum(CASE WHEN lang NOT IN ('en', 'de', 'es', 'fr') " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS f_lang, " +
        "CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS f_len, " +
        "CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS f_src, " +
        "count(*) - count(DISTINCT doc_id) AS f_dup FROM documents) " +
        "SELECT * FROM (" +
        "SELECT 'doc_nonempty' AS rule, n AS n_checked, f_empty AS n_failed FROM a " +
        "UNION ALL SELECT 'lang_known', n, f_lang FROM a " +
        "UNION ALL SELECT 'len_matches_meta', n, f_len FROM a " +
        "UNION ALL SELECT 'source_present', n, f_src FROM a " +
        "UNION ALL SELECT 'doc_id_unique', n, f_dup FROM a) ORDER BY rule"),

    // the NAIVE full-window formulation — proves the histogram
    // threshold pre-prune is lossless
    "q129_domain_cap" ->
      ("WITH r AS (SELECT source, doc_id, n_chars, row_number() OVER " +
        "(PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk " +
        "FROM documents) " +
        "SELECT source, doc_id, n_chars, rk FROM r WHERE rk <= 10 " +
        "ORDER BY source, doc_id"),
    "q130_block_dedup" ->
      (s"WITH $duckBlockCtes, " +
        "dfc AS (SELECT b, count(DISTINCT doc_id) AS df FROM bl GROUP BY 1), " +
        "kept AS (SELECT doc_id, i, bl.b FROM bl JOIN dfc USING (b) " +
        "WHERE df < 3), " +
        "agg AS (SELECT doc_id, count(*) AS n_kept, " +
        "string_agg(b, ' ' ORDER BY i) AS t2 FROM kept GROUP BY 1) " +
        "SELECT tot.doc_id, CAST(tot.n_blocks AS BIGINT) AS n_blocks, " +
        "COALESCE(agg.n_kept, 0) AS n_kept, " +
        "md5(COALESCE(agg.t2, '')) AS text_md5 " +
        "FROM tot LEFT JOIN agg USING (doc_id) ORDER BY doc_id"),
    "q131_image_phash" -> duckPhashSql,

    // mirrors the Spark batch synthesis, then pairs ONLY index-side ×
    // batch-side bucket collisions (never index-index), verifies with
    // the exact q18 Jaccard form, and left-joins the verified-match
    // counts back onto the batch
    "q143_incr_neardup" ->
      ("WITH all_docs AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 100000, " +
        "CASE WHEN doc_id % 2 = 0 THEN text " +
        "ELSE 'fresh ' || CAST(doc_id AS VARCHAR) || " +
        "' standalone document content' END FROM documents), " +
        s"${duckShingleCtes("all_docs")}, $duckSigBandCtes, " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey " +
        "WHERE a.doc_id < 100000 AND b.doc_id >= 100000), " +
        "ver AS (SELECT doc_b, count(DISTINCT doc_a) AS nm FROM (" +
        "SELECT c.doc_a, c.doc_b, " +
        "round(len(list_intersect(sa.sh, sb.sh)) / " +
        "CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 6) AS jacc " +
        "FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a " +
        "JOIN sh sb ON sb.doc_id = c.doc_b) " +
        "WHERE jacc >= 0.8 GROUP BY doc_b) " +
        "SELECT d.doc_id, COALESCE(v.nm, 0) AS n_index_matches, " +
        "v.doc_b IS NULL AS kept " +
        "FROM all_docs d LEFT JOIN ver v ON v.doc_b = d.doc_id " +
        "WHERE d.doc_id >= 100000 ORDER BY doc_id"),

    // the same synthesis + canonicalization regex chain; anchored
    // patterns, so first-match (DuckDB) == all-match (Spark)
    "q144_url_dedup" ->
      ("WITH raw AS (SELECT doc_id, " +
        "(CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://WWW.' " +
        "ELSE 'https://' END) || source || '.example.com/articles/' || " +
        "CAST(doc_id % 40 AS VARCHAR) || " +
        "(CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) || " +
        "(CASE WHEN doc_id % 7 = 0 THEN '?utm_source=feed&ref=home' " +
        "ELSE '' END) AS url FROM documents), " +
        "c AS (SELECT doc_id, " +
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
        "lower(url), '^https?://', ''), '^www\\.', ''), " +
        "'[?#].*$', ''), '/$', '') AS curl FROM raw) " +
        "SELECT curl, count(*) AS n_docs, min(doc_id) AS keeper_id " +
        "FROM c GROUP BY curl ORDER BY curl"),

    // the brute-force twin: all 8-token windows, keep those occurring
    // twice anywhere in the corpus, merge covered positions into
    // maximal islands (starts ≤ 8 apart chain) — value-identical to
    // the suffix-ranking result by the covering identity, plan-
    // disjoint from it
    "q199_suffix_dup_spans" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS l " +
        "FROM documents), " +
        "pos AS (SELECT doc_id, i, array_to_string(l[i+1:i+8], ' ') AS w " +
        "FROM tk, unnest(generate_series(0, CAST(len(l) AS INT) - 8)) " +
        "AS u(i)), " +
        "dup AS (SELECT w FROM pos GROUP BY w HAVING count(*) >= 2), " +
        "dp AS (SELECT doc_id, i FROM pos JOIN dup USING (w)), " +
        "mk AS (SELECT doc_id, i, CASE WHEN i - lag(i) OVER " +
        "(PARTITION BY doc_id ORDER BY i) <= 8 THEN 0 ELSE 1 END AS brk " +
        "FROM dp), " +
        "isl AS (SELECT doc_id, i, sum(brk) OVER " +
        "(PARTITION BY doc_id ORDER BY i) AS g FROM mk) " +
        "SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start, " +
        "CAST(max(i) + 8 AS BIGINT) AS span_end FROM isl " +
        "GROUP BY doc_id, g ORDER BY doc_id, span_start"),

    // keeper = first (doc, pos) per duplicated window (row_number);
    // non-keeper starts merge to spans; survivors rebuild the text
    "q203_suffix_dedup_apply" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS l " +
        "FROM documents), " +
        "pos AS (SELECT doc_id, i, array_to_string(l[i+1:i+8], ' ') AS w " +
        "FROM tk, unnest(generate_series(0, CAST(len(l) AS INT) - 8)) " +
        "AS u(i)), " +
        "dp AS (SELECT doc_id, i FROM (SELECT doc_id, i, " +
        "row_number() OVER (PARTITION BY w ORDER BY doc_id, i) AS rn, " +
        "count(*) OVER (PARTITION BY w) AS c FROM pos) " +
        "WHERE c >= 2 AND rn > 1), " +
        "mk AS (SELECT doc_id, i, CASE WHEN i - lag(i) OVER " +
        "(PARTITION BY doc_id ORDER BY i) <= 8 THEN 0 ELSE 1 END AS brk " +
        "FROM dp), " +
        "isl AS (SELECT doc_id, i, sum(brk) OVER " +
        "(PARTITION BY doc_id ORDER BY i) AS g FROM mk), " +
        "spans AS (SELECT doc_id, min(i) AS s, max(i) + 8 AS e FROM isl " +
        "GROUP BY doc_id, g), " +
        "tok AS (SELECT doc_id, i - 1 AS p, l[i] AS t FROM tk, " +
        "unnest(generate_series(1, CAST(len(l) AS INT))) AS v(i)), " +
        "kept AS (SELECT tok.doc_id, p, t FROM tok WHERE NOT EXISTS (" +
        "SELECT 1 FROM spans s WHERE s.doc_id = tok.doc_id " +
        "AND tok.p >= s.s AND tok.p < s.e)), " +
        "rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept, " +
        "md5(string_agg(t, ' ' ORDER BY p)) AS m FROM kept GROUP BY 1), " +
        "nt AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens FROM tk) " +
        "SELECT nt.doc_id, nt.n_tokens, " +
        "coalesce(rb.n_kept, 0) AS n_kept, " +
        "coalesce(rb.m, md5('')) AS text_md5 " +
        "FROM nt LEFT JOIN rb ON rb.doc_id = nt.doc_id " +
        "ORDER BY nt.doc_id"),

    // the shared BPE training CTEs, per-word application carried with
    // lang, the same integer-micro ratio
    "q222_tokenizer_fertility" -> {
      val steps = 5
      val sb = new StringBuilder
      sb ++= duckBpeCtes(steps)
      sb ++= s", dw AS (SELECT lang, unnest(string_split($duckNorm, ' ')) " +
        "AS w FROM documents)"
      sb ++= ", dq0 AS (SELECT lang, regexp_replace(w, '(.)', '·\\1', 'g') " +
        "AS seq FROM dw WHERE regexp_matches(w, '^[a-z0-9]+"
      sb ++= "$'))"
      for (i <- 1 to steps) {
        sb ++= s", dq$i AS (SELECT lang, replace(seq, " +
          s"'·' || (SELECT pair FROM t$i), " +
          s"'·' || (SELECT replace(pair, '·', '') FROM t$i)) AS seq " +
          s"FROM dq${i - 1})"
      }
      sb ++= s" SELECT lang, CAST(count(*) AS BIGINT) AS n_words, " +
        "CAST(sum(len(string_split(seq, '·')) - 1) AS BIGINT) AS n_tokens, " +
        "CAST(sum(len(string_split(seq, '·')) - 1) * 1000000 " +
        s"// count(*) AS BIGINT) AS fertility_micro " +
        s"FROM dq$steps GROUP BY lang ORDER BY lang"
      sb.toString
    },

    // same half-offset uniform, same inverse-CDF magnitude floored
    // to micros before the sign, same Δf/ε = 10 calibration
    "q221_dp_count_release" ->
      ("WITH c AS (SELECT event_type, count(*) AS n FROM events " +
        "GROUP BY 1), " +
        "h AS (SELECT event_type, n, " +
        "('0x' || substr(md5(event_type || ':dp'), 1, 8))::BIGINT AS hv " +
        "FROM c), " +
        "t AS (SELECT event_type, n, " +
        "(CAST(hv AS DOUBLE) + 0.5) / 4294967296.0 - 0.5 AS tt FROM h), " +
        "m AS (SELECT event_type, n, tt, " +
        "CAST(floor(-10.0 * ln(1.0 - 2.0 * abs(tt)) * 1000000) AS BIGINT) " +
        "AS mag FROM t) " +
        "SELECT event_type, " +
        "n * 1000000 + (CASE WHEN tt < 0 THEN -mag ELSE mag END) " +
        "AS noisy_micro, CAST(10 AS BIGINT) AS scale FROM m " +
        "ORDER BY event_type"),

    // shingle/band CTEs + px-prefixed pHash CTEs + recursive CC over
    // the unioned symmetric edges — the q38 fixpoint, two modalities
    "q220_crossmodal_dedup" ->
      ("WITH RECURSIVE all_docs AS (" +
        "SELECT doc_id, text FROM documents WHERE doc_id < 100 " +
        "UNION ALL SELECT doc_id + 100, text || ' cmx twin marker' " +
        "FROM documents WHERE doc_id < 100), " +
        s"${duckShingleCtes("all_docs")}, $duckSigBandCtes, " +
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM bands a JOIN bands b ON a.band = b.band " +
        "AND a.bkey = b.bkey AND a.doc_id < b.doc_id), " +
        "ver AS (SELECT doc_a, doc_b FROM (SELECT c.doc_a, c.doc_b, " +
        "round(len(list_intersect(sa.sh, sb.sh)) / " +
        "CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 6) AS jacc " +
        "FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a " +
        "JOIN sh sb ON sb.doc_id = c.doc_b) WHERE jacc >= 0.8), " +
        duckPhashCtes + ", " +
        "imgp AS (SELECT a_id AS doc_a, b_id AS doc_b FROM pxhm " +
        "WHERE hamming <= 7), " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM ver " +
        "UNION SELECT doc_b, doc_a FROM ver " +
        "UNION SELECT doc_a, doc_b FROM imgp " +
        "UNION SELECT doc_b, doc_a FROM imgp), " +
        "cc(id, lbl) AS (SELECT doc_id, doc_id FROM all_docs " +
        "UNION SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.id) " +
        "SELECT id AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster " +
        "FROM cc GROUP BY id ORDER BY doc_id"),

    // q16's sim table, the same (sim DESC, id) rank, the same
    // positives-band exclusion
    "q219_hard_negatives" ->
      ("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb " +
        "FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 5), " +
        "sims AS (SELECT q.qid, e.vec_id, " +
        "round(list_dot_product(e.emb, q.qemb) / " +
        "(sqrt(list_dot_product(e.emb, e.emb)) * " +
        "sqrt(list_dot_product(q.qemb, q.qemb))), 6) AS sim " +
        "FROM e, q WHERE e.vec_id <> q.qid), " +
        "rk AS (SELECT *, row_number() OVER (PARTITION BY qid " +
        "ORDER BY sim DESC, vec_id) AS rank FROM sims) " +
        "SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, sim FROM rk " +
        "WHERE rank BETWEEN 6 AND 20 AND sim <= 0.95 " +
        "ORDER BY qid, rank"),

    // same md5(doc:block) % 7 mask, same exclusive-prefix sentinel
    // ordinals, same space-joined rebuild under the md5s
    "q218_span_corruption" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS l " +
        "FROM documents), " +
        "bl AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n, j, " +
        "l[3*j+1 : 3*j+3] AS bt FROM tk, " +
        "unnest(generate_series(0, (CAST(len(l) AS INT) + 2) // 3 - 1)) " +
        "AS u(j)), " +
        "mk AS (SELECT doc_id, n, j, array_to_string(bt, ' ') AS bs, " +
        "len(bt) = 3 AND ('0x' || substr(md5(doc_id || ':' || j), 1, 8))" +
        "::BIGINT % 7 = 0 AS masked FROM bl), " +
        "pk AS (SELECT *, sum(CASE WHEN masked THEN 1 ELSE 0 END) OVER " +
        "(PARTITION BY doc_id ORDER BY j ROWS UNBOUNDED PRECEDING) " +
        "- CASE WHEN masked THEN 1 ELSE 0 END AS k FROM mk), " +
        "parts AS (SELECT doc_id, n, j, masked, " +
        "CASE WHEN masked THEN '<extra_id_' || k || '>' ELSE bs END " +
        "AS ip, CASE WHEN masked THEN '<extra_id_' || k || '> ' || bs " +
        "END AS tg FROM pk) " +
        "SELECT doc_id, min(n) AS n_tokens, " +
        "CAST(sum(CASE WHEN masked THEN 3 ELSE 0 END) AS BIGINT) " +
        "AS n_masked, " +
        "md5(string_agg(ip, ' ' ORDER BY j)) AS input_md5, " +
        "md5(coalesce(string_agg(tg, ' ' ORDER BY j), '')) AS target_md5 " +
        "FROM parts GROUP BY doc_id ORDER BY doc_id"),

    // same histogram ranks (⌈p·n⌉ by integer arithmetic), same clamp,
    // same integer-micro mean
    "q217_winsorized_mean" ->
      ("WITH ev AS (SELECT event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "n AS (SELECT event_type, count(*) AS n, " +
        "(5 * count(*) + 99) // 100 AS k05, " +
        "(95 * count(*) + 99) // 100 AS k95 FROM ev GROUP BY 1), " +
        "h AS (SELECT event_type, cents, count(*) AS c FROM ev " +
        "GROUP BY 1, 2), " +
        "cm AS (SELECT h.*, sum(c) OVER (PARTITION BY event_type " +
        "ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum FROM h), " +
        "thr AS (SELECT cm.event_type, " +
        "min(CASE WHEN cum >= k05 THEN cents END) AS lo_cents, " +
        "min(CASE WHEN cum >= k95 THEN cents END) AS hi_cents " +
        "FROM cm JOIN n USING (event_type) GROUP BY 1) " +
        "SELECT ev.event_type, n, lo_cents, hi_cents, " +
        "CAST(sum(greatest(lo_cents, least(hi_cents, cents))) " +
        "* 1000000 // n AS BIGINT) AS wmean_micro " +
        "FROM ev JOIN thr USING (event_type) JOIN n USING (event_type) " +
        "GROUP BY 1, 2, 3, 4 ORDER BY event_type"),

    // same scaffold, same IGNORE NULLS neighbor windows, same
    // truncating integer lerp
    "q216_linear_interpolate" ->
      ("WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events " +
        "WHERE user_id < 30), " +
        "daily AS (SELECT user_id, day, count(*) AS n, " +
        "CAST(sum(cents) AS BIGINT) AS sc FROM ev GROUP BY 1, 2), " +
        "span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 " +
        "FROM daily GROUP BY 1), " +
        "sc AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day " +
        "FROM span), " +
        "g AS (SELECT sc.user_id, sc.day, coalesce(d.n, 0) AS n, d.sc " +
        "FROM sc LEFT JOIN daily d USING (user_id, day)), " +
        "w AS (SELECT *, " +
        "last_value(CASE WHEN n > 0 THEN day END IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY day " +
        "ROWS UNBOUNDED PRECEDING) AS pd, " +
        "last_value(CASE WHEN n > 0 THEN sc END IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY day " +
        "ROWS UNBOUNDED PRECEDING) AS pv, " +
        "first_value(CASE WHEN n > 0 THEN day END IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY day " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd, " +
        "first_value(CASE WHEN n > 0 THEN sc END IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY day " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv " +
        "FROM g) " +
        "SELECT user_id, day, n > 0 AS observed, " +
        "CASE WHEN n > 0 THEN sc " +
        "ELSE pv + (nv - pv) * (day - pd) // (nd - pd) END AS v_cents " +
        "FROM w ORDER BY user_id, day"),

    // brute-force boundary scan (same 1/64 hash band, same skip of a
    // cut at position 1), row_number pairing of adjacent cuts
    "q215_content_chunks" ->
      (s"WITH n0 AS (SELECT doc_id, $duckNorm AS nt FROM documents), " +
        "bp AS (SELECT doc_id, i FROM n0, " +
        "unnest(generate_series(2, CAST(len(nt) AS INT) - 7)) AS u(i) " +
        "WHERE ('0x' || substr(md5(substr(nt, i, 8)), 1, 8))::BIGINT " +
        "% 64 = 0), " +
        "cuts AS (SELECT doc_id, 1 AS c FROM n0 " +
        "UNION ALL SELECT doc_id, i FROM bp " +
        "UNION ALL SELECT doc_id, CAST(len(nt) AS INT) + 1 FROM n0), " +
        "oc AS (SELECT doc_id, c, row_number() OVER " +
        "(PARTITION BY doc_id ORDER BY c) AS j FROM cuts), " +
        "ch AS (SELECT a.doc_id, CAST(a.j AS BIGINT) AS chunk_idx, " +
        "CAST(a.c AS BIGINT) AS off, CAST(b.c - a.c AS BIGINT) AS len " +
        "FROM oc a JOIN oc b ON a.doc_id = b.doc_id AND b.j = a.j + 1), " +
        "cm AS (SELECT ch.*, md5(substr(n0.nt, CAST(ch.off AS INT), " +
        "CAST(ch.len AS INT))) AS chunk_md5 FROM ch JOIN n0 USING (doc_id)), " +
        "cnt AS (SELECT chunk_md5, count(*) AS n_copies FROM cm GROUP BY 1) " +
        "SELECT doc_id, chunk_idx, off, len, cm.chunk_md5, n_copies " +
        "FROM cm JOIN cnt USING (chunk_md5) ORDER BY doc_id, chunk_idx"),

    // six plan-disjoint single-column profiles unioned — the one-scan
    // Expand plan must agree with the per-column truths
    "q214_data_profile" ->
      ("WITH e AS (SELECT *, CAST(round(value * 100) AS BIGINT) AS cents, " +
        "epoch_ns(ts) AS tsn FROM events) " +
        "SELECT * FROM (" +
        "SELECT 'event_id' AS \"column\", count(*) AS n_rows, " +
        "count(*) - count(event_id) AS n_null, " +
        "count(DISTINCT event_id) AS n_distinct, " +
        "min(event_id) AS min_i, max(event_id) AS max_i, " +
        "CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s " +
        "FROM e UNION ALL " +
        "SELECT 'ts', count(*), count(*) - count(tsn), " +
        "count(DISTINCT tsn), min(tsn), max(tsn), NULL, NULL FROM e " +
        "UNION ALL " +
        "SELECT 'user_id', count(*), count(*) - count(user_id), " +
        "count(DISTINCT user_id), min(user_id), max(user_id), NULL, NULL " +
        "FROM e UNION ALL " +
        "SELECT 'value_cents', count(*), count(*) - count(cents), " +
        "count(DISTINCT cents), min(cents), max(cents), NULL, NULL " +
        "FROM e UNION ALL " +
        "SELECT 'event_type', count(*), count(*) - count(event_type), " +
        "count(DISTINCT event_type), NULL, NULL, " +
        "min(event_type), max(event_type) FROM e UNION ALL " +
        "SELECT 'props', count(*), count(*) - count(props), " +
        "count(DISTINCT props), NULL, NULL, min(props), max(props) FROM e" +
        ") ORDER BY \"column\""),

    // the same integer apportionment, then the NAIVE per-lang window
    // selection the histogram prune must reproduce row-for-row
    "q213_balanced_quota" ->
      ("WITH t(lang, q) AS (VALUES ('en', 30), ('de', 120), ('es', 60), " +
        "('fr', 60), ('zh', 30)), " +
        "n AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1), " +
        "a AS (SELECT t.lang, q, n, least(q, n) AS take1, " +
        "n - least(q, n) AS rem FROM t JOIN n USING (lang)), " +
        "s AS (SELECT 300 - sum(take1) AS ell, sum(rem) AS ss FROM a), " +
        "e AS (SELECT lang, take1, rem, " +
        "CASE WHEN ss = 0 THEN 0 ELSE ell * rem // ss END AS extra, " +
        "CASE WHEN ss = 0 THEN 0 ELSE ell * rem % ss END AS fr8 " +
        "FROM a, s), " +
        "r AS (SELECT sum(extra) AS se, (SELECT ell FROM s) AS ell2 FROM e), " +
        "w AS (SELECT lang, take1 + extra + CASE WHEN " +
        "row_number() OVER (ORDER BY fr8 DESC, lang) <= ell2 - se " +
        "THEN 1 ELSE 0 END AS k FROM e, r), " +
        "d AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn " +
        "FROM documents) " +
        "SELECT d.lang, d.doc_id FROM d JOIN w USING (lang) " +
        "WHERE rn <= k ORDER BY lang, doc_id"),

    // independent margin recount, identical ln(p(ab))−ln(p(a))−ln(p(b))
    // floor-micro form, same min-support and tie order
    "q212_pmi_collocations" ->
      (s"WITH tk AS (SELECT string_split($duckNorm, ' ') AS l " +
        "FROM documents), " +
        "bi AS (SELECT l[i] AS w1, l[i+1] AS w2 FROM tk, " +
        "unnest(generate_series(1, CAST(len(l) AS INT) - 1)) AS u(i)), " +
        "cb2 AS (SELECT w1, w2, count(*) AS cab FROM bi GROUP BY 1, 2), " +
        "tt AS (SELECT CAST(sum(cab) AS DOUBLE) AS t FROM cb2), " +
        "lm AS (SELECT w1, CAST(sum(cab) AS BIGINT) AS ca FROM cb2 " +
        "GROUP BY 1), " +
        "rm AS (SELECT w2, CAST(sum(cab) AS BIGINT) AS cb FROM cb2 " +
        "GROUP BY 1) " +
        "SELECT w1, w2, cab, " +
        "CAST(floor((ln(cab / t) - ln(ca / t) - ln(cb / t)) * 1000000) " +
        "AS BIGINT) AS pmi_micro " +
        "FROM cb2 JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tt " +
        "WHERE cab >= 5 " +
        "ORDER BY pmi_micro DESC, w1, w2 LIMIT 50"),

    // q77's NLL scoring verbatim, then window ntile (ntileExact's
    // proven-equal lowering) and the same md5 intra-phase order
    "q211_curriculum_order" ->
      (s"WITH tk AS (SELECT doc_id, unnest(string_split($duckNorm, ' ')) " +
        "AS t FROM documents), " +
        "c AS (SELECT t, count(*) AS c FROM tk GROUP BY t), " +
        "st AS (SELECT CAST(sum(c) AS DOUBLE) AS nn, " +
        "CAST(count(*) AS DOUBLE) AS vv FROM c), " +
        "li AS (SELECT tk.doc_id, " +
        "CAST(FLOOR(-ln((c.c + 1) / (st.nn + st.vv)) * 1000000) AS BIGINT) " +
        "AS li FROM tk JOIN c USING (t) CROSS JOIN st), " +
        "nll AS (SELECT doc_id, " +
        "CAST(sum(li) // count(*) AS BIGINT) AS nll_micro " +
        "FROM li GROUP BY doc_id), " +
        "ph AS (SELECT doc_id, " +
        "ntile(4) OVER (ORDER BY nll_micro, doc_id) AS phase FROM nll) " +
        "SELECT doc_id, CAST(phase AS INT) AS phase, " +
        "CAST(row_number() OVER (PARTITION BY phase " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS seq " +
        "FROM ph ORDER BY phase, seq"),

    // identically synthesized feed; validity by json_valid, typed
    // extraction only on valid rows, md5 receipt only on corrupt ones
    "q208_json_quarantine" ->
      ("WITH p AS (SELECT event_id, '{\"uid\":' || user_id || " +
        "',\"et\":\"' || event_type || '\",\"cents\":' || " +
        "CAST(round(value * 100) AS BIGINT) || '}' AS pl0 FROM events), " +
        "c AS (SELECT event_id, CASE WHEN event_id % 13 = 0 " +
        "THEN substr(pl0, 1, len(pl0) - 2) ELSE pl0 END AS pl FROM p) " +
        "SELECT event_id, json_valid(pl) AS ok, " +
        "CASE WHEN json_valid(pl) THEN " +
        "CAST(json_extract_string(pl, '$.uid') AS BIGINT) END AS uid, " +
        "CASE WHEN json_valid(pl) THEN " +
        "json_extract_string(pl, '$.et') END AS et, " +
        "CASE WHEN json_valid(pl) THEN " +
        "CAST(json_extract_string(pl, '$.cents') AS BIGINT) END AS cents, " +
        "CASE WHEN NOT json_valid(pl) THEN md5(pl) END AS quarantine_md5 " +
        "FROM c ORDER BY event_id"),

    // same md5-parity sign matrix rebuilt in SQL, same ordered dot,
    // same exact /4 normalizer, same floor micros
    "q207_jl_project" ->
      ("WITH p AS (SELECT j, i, CASE WHEN " +
        "('0x' || substr(md5('jl:' || i || ':' || j), 1, 8))::BIGINT " +
        "% 2 = 0 THEN 1.0 ELSE -1.0 END AS s " +
        "FROM generate_series(0, 15) t(j), generate_series(0, 63) u(i)), " +
        "pr AS (SELECT j, list(s ORDER BY i) AS pv FROM p GROUP BY j), " +
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) " +
        "SELECT vec_id, CAST(j AS INT) AS j, " +
        "CAST(floor(list_dot_product(emb, pv) / 4 * 1000000) AS BIGINT) " +
        "AS v_micro FROM e CROSS JOIN pr ORDER BY vec_id, j"),

    // the 5 greedy MMR steps unrolled as CTEs: each pick is the argmax
    // of 7·rel − 3·max-sim-to-picks-so-far (floor-micro cosine, ties
    // by id), exactly the native expression's long arithmetic
    "q206_mmr_rerank" -> {
      // floor-micro cosine between two cand rows aliased a and b
      val simM = (a: String, b: String) =>
        s"CAST(floor(list_dot_product($a.emb, $b.emb) / " +
          s"(sqrt(list_dot_product($a.emb, $a.emb)) * " +
          s"sqrt(list_dot_product($b.emb, $b.emb))) * 1000000) AS BIGINT)"
      val steps = (2 to 5).map { i =>
        s"sc$i AS (SELECT c.qid, c.vec_id, 7 * c.rel_micro - 3 * " +
          s"(SELECT max(${simM("c", "s2")}) FROM cand s2 " +
          s"JOIN sel${i - 1} p ON p.qid = s2.qid AND p.vec_id = s2.vec_id " +
          "WHERE s2.qid = c.qid) AS score FROM cand c " +
          s"WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} p " +
          "WHERE p.qid = c.qid AND p.vec_id = c.vec_id)), " +
          s"pk$i AS (SELECT qid, vec_id, score FROM (SELECT sc$i.*, " +
          "row_number() OVER (PARTITION BY qid " +
          s"ORDER BY score DESC, vec_id) AS rn FROM sc$i) WHERE rn = 1), " +
          s"sel$i AS (SELECT * FROM sel${i - 1} UNION ALL " +
          s"SELECT qid, vec_id, score, $i AS rank FROM pk$i)"
      }.mkString(", ")
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "q AS (SELECT vec_id AS qid, emb AS qemb FROM e WHERE vec_id < 5), " +
        "sims AS (SELECT q.qid, e.vec_id, " +
        "round(list_dot_product(e.emb, q.qemb) / " +
        "(sqrt(list_dot_product(e.emb, e.emb)) * " +
        "sqrt(list_dot_product(q.qemb, q.qemb))), 6) AS sim " +
        "FROM e, q WHERE e.vec_id <> q.qid), " +
        "cand AS (SELECT qid, vec_id, " +
        "CAST(floor(sim * 1000000) AS BIGINT) AS rel_micro, emb " +
        "FROM (SELECT s.qid, s.vec_id, s.sim, e.emb, " +
        "row_number() OVER (PARTITION BY s.qid " +
        "ORDER BY s.sim DESC, s.vec_id) AS rn " +
        "FROM sims s JOIN e USING (vec_id)) WHERE rn <= 20), " +
        "sc1 AS (SELECT qid, vec_id, 7 * rel_micro AS score FROM cand), " +
        "pk1 AS (SELECT qid, vec_id, score FROM (SELECT sc1.*, " +
        "row_number() OVER (PARTITION BY qid " +
        "ORDER BY score DESC, vec_id) AS rn FROM sc1) WHERE rn = 1), " +
        "sel1 AS (SELECT qid, vec_id, score, 1 AS rank FROM pk1), " +
        steps + " " +
        "SELECT qid, CAST(rank AS INT) AS rank, vec_id, " +
        "CAST(score AS BIGINT) AS score_micro FROM sel5 " +
        "ORDER BY qid, rank"
    },

    // the brute-force twin: train windows whose string occurs among
    // eval windows, merged to maximal islands — q199's oracle with
    // the dup test replaced by an eval semi-join
    "q205_suffix_decontaminate" ->
      (s"WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS l " +
        "FROM documents), " +
        "pos AS (SELECT doc_id, i, array_to_string(l[i+1:i+8], ' ') AS w " +
        "FROM tk, unnest(generate_series(0, CAST(len(l) AS INT) - 8)) " +
        "AS u(i)), " +
        "ev AS (SELECT DISTINCT w FROM pos WHERE doc_id % 17 = 0), " +
        "dp AS (SELECT doc_id, i FROM pos " +
        "WHERE doc_id % 17 <> 0 AND w IN (SELECT w FROM ev)), " +
        "mk AS (SELECT doc_id, i, CASE WHEN i - lag(i) OVER " +
        "(PARTITION BY doc_id ORDER BY i) <= 8 THEN 0 ELSE 1 END AS brk " +
        "FROM dp), " +
        "isl AS (SELECT doc_id, i, sum(brk) OVER " +
        "(PARTITION BY doc_id ORDER BY i) AS g FROM mk) " +
        "SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start, " +
        "CAST(max(i) + 8 AS BIGINT) AS span_end FROM isl " +
        "GROUP BY doc_id, g ORDER BY doc_id, span_start"),

    // same hashed unigram+bigram buckets, same add-one smoothing, same
    // per-occurrence floor(ln·1e6) micro log-ratios, same top-50 cut
    "q204_dsir_select" ->
      (s"WITH tk AS (SELECT doc_id, lang, string_split($duckNorm, ' ') AS l " +
        "FROM documents), " +
        "uni AS (SELECT doc_id, lang, unnest(l) AS f FROM tk), " +
        "big AS (SELECT doc_id, lang, l[i] || ' ' || l[i+1] AS f " +
        "FROM tk, unnest(generate_series(1, CAST(len(l) AS INT) - 1)) " +
        "AS u(i)), " +
        "ft AS (SELECT doc_id, lang, " +
        "('0x' || substr(md5(f), 1, 8))::BIGINT % 1024 AS b " +
        "FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)), " +
        "h AS (SELECT b, count(*) AS cr, " +
        "count(*) FILTER (lang = 'en') AS ct FROM ft GROUP BY b), " +
        "tot AS (SELECT CAST(sum(cr) AS DOUBLE) AS tr, " +
        "CAST(sum(ct) AS DOUBLE) AS tt FROM h), " +
        "lr AS (SELECT b, " +
        "CAST(floor(ln((ct + 1) / (tt + 1024)) * 1000000) AS BIGINT) - " +
        "CAST(floor(ln((cr + 1) / (tr + 1024)) * 1000000) AS BIGINT) " +
        "AS lrm FROM h CROSS JOIN tot) " +
        "SELECT doc_id, count(*) AS n_feat, " +
        "CAST(sum(lrm) AS BIGINT) AS lw_micro " +
        "FROM ft JOIN lr USING (b) GROUP BY doc_id " +
        "ORDER BY lw_micro DESC, doc_id LIMIT 50"),

    // DuckDB's own jaro_winkler_similarity — the native expression
    // must reproduce it value-for-value on every surviving pair
    "q151_jw_entity_match" ->
      ("WITH p AS (SELECT p_partkey AS id, p_name AS name, " +
        "p_brand AS brand, p_size AS size FROM part) " +
        "SELECT id_a, id_b, sim FROM (" +
        "SELECT a.id AS id_a, b.id AS id_b, " +
        "round(jaro_winkler_similarity(a.name, b.name), 6) AS sim " +
        "FROM p a JOIN p b ON a.brand = b.brand AND a.size = b.size " +
        "AND a.id < b.id " +
        "AND greatest(length(a.name), length(b.name)) <= " +
        "least(length(a.name), length(b.name)) * 4) " +
        "WHERE sim >= 0.85 ORDER BY id_a, id_b"),

    // replays assignment (row_number twin of max_by), integer-micro
    // flooring, and the exact-integer outlier inequality; HUGEINT
    // sums keep every squared term exact, mirroring decimal(38)
    "q146_embed_outlier" -> {
      val cos = (a: String, b: String) =>
        s"round(list_dot_product($a, $b) / " +
          s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
      "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16), " +
        "assign AS (SELECT vec_id, bucket, s FROM (" +
        s"SELECT e.vec_id, c.cid AS bucket, ${cos("e.emb", "c.cemb")} AS s, " +
        "row_number() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${cos("e.emb", "c.cemb")} DESC, c.cid) AS rn FROM e, c) " +
        "WHERE rn = 1), " +
        "m AS (SELECT vec_id, bucket, " +
        "CAST(floor(s * 1000000) AS BIGINT) AS smicro FROM assign), " +
        "st AS (SELECT bucket, count(*) AS n, sum(smicro) AS s1, " +
        "sum(smicro * smicro) AS s2 FROM m GROUP BY bucket) " +
        "SELECT m.vec_id, m.bucket, m.smicro, " +
        "(st.s1 - st.n * m.smicro) > 0 AND " +
        "(st.s1 - st.n * m.smicro) * (st.s1 - st.n * m.smicro) > " +
        "st.n * st.s2 - st.s1 * st.s1 AS is_outlier " +
        "FROM m JOIN st USING (bucket) ORDER BY vec_id"
    },

    // the downsample recomputed from the closed-form pixel
    // polynomial: 2×2 blocks via a dx/dy grid, truncating per-channel
    // means, exact sums
    "q357_image_downsample" ->
      ("WITH ids AS (SELECT doc_id AS id FROM documents " +
        "WHERE doc_id < 100), " +
        "dims AS (SELECT id, 16 + id % 16 AS w, 16 + id % 8 AS h " +
        "FROM ids), " +
        "gy AS (SELECT id, w, h, " +
        "unnest(generate_series(0, h // 2 - 1)) AS y2 FROM dims), " +
        "gx AS (SELECT id, w, h, y2, " +
        "unnest(generate_series(0, w // 2 - 1)) AS x2 FROM gy), " +
        "dd AS (SELECT unnest([0, 1]) AS dx), " +
        "ee AS (SELECT unnest([0, 1]) AS dy), " +
        "px AS (SELECT id, x2, y2, " +
        "(id * 31 + (2 * x2 + dx) * 7 + (2 * y2 + dy) * 13) % 256 AS r, " +
        "(id + (2 * x2 + dx) * 3 + (2 * y2 + dy) * 5) % 256 AS g, " +
        "(id * 17 + (2 * x2 + dx) + (2 * y2 + dy) * 2) % 256 AS b " +
        "FROM gx CROSS JOIN dd CROSS JOIN ee), " +
        "o AS (SELECT id, x2, y2, SUM(r) // 4 AS r, SUM(g) // 4 AS g, " +
        "SUM(b) // 4 AS b FROM px GROUP BY 1, 2, 3) " +
        "SELECT o.id AS img_id, " +
        "CAST(MAX(dims.w // 2) AS BIGINT) AS out_w, " +
        "CAST(MAX(dims.h // 2) AS BIGINT) AS out_h, " +
        "CAST(SUM(o.r) AS BIGINT) AS sum_r, " +
        "CAST(SUM(o.g) AS BIGINT) AS sum_g, " +
        "CAST(SUM(o.b) AS BIGINT) AS sum_b " +
        "FROM o JOIN dims ON dims.id = o.id " +
        "GROUP BY o.id ORDER BY img_id"),

    // the identical 12-round Viterbi unroll: same vocabulary cut,
    // same ml-difference prices, same combined cost2 integer
    "q358_unigram_tokenizer" -> {
      def ml(x: String) = s"CAST(FLOOR(ln($x) * 1000000) AS BIGINT)"
      val sb = new StringBuilder
      sb ++= s"WITH wv AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS cnt " +
        s"FROM (SELECT unnest(string_split($duckNorm, ' ')) AS w " +
        "FROM documents) WHERE regexp_matches(w, '^[a-z0-9]+"
      sb ++= "$') AND len(w) <= 12 GROUP BY 1), " +
        "stp AS (SELECT w, cnt, unnest(generate_series(1, len(w))) AS s " +
        "FROM wv), " +
        "kk AS (SELECT unnest(generate_series(1, 4)) AS k), " +
        "occ AS (SELECT substr(w, CAST(s AS INT), CAST(k AS INT)) " +
        "AS piece, cnt FROM stp CROSS JOIN kk WHERE s + k - 1 <= len(w)), " +
        "pc AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS pc FROM occ " +
        "GROUP BY 1), " +
        "vocab AS (SELECT piece, pc FROM pc WHERE len(piece) = 1 " +
        "UNION ALL SELECT piece, pc FROM " +
        "(SELECT piece, pc FROM pc WHERE len(piece) >= 2 " +
        "ORDER BY pc DESC, piece LIMIT 20)), " +
        "tt AS (SELECT CAST(SUM(pc) AS BIGINT) AS tot FROM vocab), " +
        s"pr AS MATERIALIZED (SELECT piece, (${ml("tot")} - ${ml("pc")}) * 32 + 1 " +
        "AS price2 FROM vocab CROSS JOIN tt), " +
        "d0 AS MATERIALIZED (SELECT w, cnt, len(w) AS l, " +
        "CAST(0 AS BIGINT) AS best2 FROM wv)"
      for (p <- 1 to 12) {
        val legs = (1 to math.min(4, p)).map { k =>
          s"SELECT d.w, d.cnt, d.l, d.best2 + pr.price2 AS b2 " +
            s"FROM d${p - k} d JOIN pr ON pr.piece = " +
            s"substr(d.w, ${p - k + 1}, $k) WHERE d.l >= $p"
        }.mkString(" UNION ALL ")
        sb ++= s", d$p AS MATERIALIZED (SELECT w, cnt, l, MIN(b2) AS best2 FROM " +
          s"($legs) GROUP BY 1, 2, 3)"
      }
      sb ++= " SELECT w AS word, cnt, best2 % 32 AS n_pieces, " +
        "best2 // 32 AS cost_micro FROM (" +
        (1 to 12).map(p => s"SELECT * FROM d$p WHERE l = $p")
          .mkString(" UNION ALL ") +
        ") ORDER BY word"
      sb.toString
    },

    // same q184 QI cells, same spend band and fail thresholds
    "q354_l_diversity" ->
      ("WITH c AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "count(DISTINCT CAST(round(value * 100) AS BIGINT) // 10000) " +
        "AS l_cell FROM events GROUP BY 1, 2) " +
        "SELECT event_type, count(*) AS n_cells, " +
        "CAST(sum(CASE WHEN l_cell < 2 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_fail_l2, " +
        "CAST(sum(CASE WHEN l_cell < 3 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_fail_l3, min(l_cell) AS min_l " +
        "FROM c GROUP BY event_type ORDER BY event_type"),

    // the plain global-window twin of the two-level prefix sum, same
    // (name, id) total order, same w = 8 neighborhood and jw gate
    "q367_sorted_neighborhood" ->
      ("WITH p AS (SELECT p_partkey AS id, p_name AS name FROM part), " +
        "pos AS (SELECT id, name, " +
        "row_number() OVER (ORDER BY name, id) AS pos FROM p), " +
        "c AS (SELECT a.id AS id_a, b.id AS id_b, " +
        "b.pos - a.pos AS gap, " +
        "round(jaro_winkler_similarity(a.name, b.name), 6) AS sim " +
        "FROM pos a JOIN pos b ON b.pos > a.pos AND b.pos < a.pos + 8) " +
        "SELECT id_a, id_b, gap, sim FROM c WHERE sim >= 0.85 " +
        "ORDER BY id_a, id_b"),

    // identical md5-parity signs over the same vocabulary, HUGEINT
    // squares, same median-of-9 (max of the bottom five) and band
    "q366_ams_f2" ->
      (s"WITH tk AS (SELECT unnest(string_split($duckNorm, ' ')) AS w " +
        "FROM documents), " +
        "tf AS (SELECT w, COUNT(*) AS f FROM tk WHERE w <> '' " +
        "GROUP BY 1), " +
        "ex AS (SELECT CAST(SUM(f::HUGEINT * f) AS HUGEINT) AS f2, " +
        "COUNT(*) AS n_terms FROM tf), " +
        "es AS (SELECT r, SUM(CASE WHEN substr(md5('ams' || " +
        "CAST(r AS VARCHAR) || ':' || w), 1, 1) IN " +
        "('1','3','5','7','9','b','d','f') THEN -f ELSE f END) AS x " +
        "FROM tf, range(0, 9) t(r) GROUP BY 1), " +
        "e2 AS (SELECT x::HUGEINT * x AS e FROM es), " +
        "med AS (SELECT MAX(e) AS f2e FROM " +
        "(SELECT e FROM e2 ORDER BY e LIMIT 5)) " +
        "SELECT n_terms, CAST(f2 AS BIGINT) AS f2_exact, " +
        "CAST(f2e AS BIGINT) AS f2_est, " +
        "f2e <= f2 * 3 AND f2e * 4 >= f2 AS est_in_band " +
        "FROM ex CROSS JOIN med"))
}
