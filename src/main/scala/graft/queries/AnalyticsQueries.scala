package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables
import graft.pipeline.Scd2

/** Round-8 event/relational analytics: SCD2 dimension versioning + the
  * temporal (point-in-time) join (Flink's `FOR SYSTEM_TIME AS OF`),
  * sliding distinct counts, dead-letter routing of corrupt records,
  * and key-skew diagnostics.
  *
  * Same contract as [[ReferenceQueries]]: every query has a DuckDB
  * oracle with identical column names and total ordering; timestamps
  * stay ns-epoch longs (`Tables.load` normalization); doubles fold to
  * integer micro/cents before any cross-engine sum.
  */
object AnalyticsQueries {

  private def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  /** q256's pinned SPRT literals (micro log-likelihood ratios for
    * H₀ p=0.5 vs H₁ p=0.6, and the symmetric ln 19 boundary for
    * α=β=0.05) — computed once here and interpolated into BOTH the
    * Spark plan and the DuckDB oracle, so no runtime log crosses the
    * gate.
    */
  private val SprtLlrPosL: Long = math.floor(math.log(0.6 / 0.5) * 1e6).toLong
  private val SprtLlrNegL: Long = math.floor(math.log(0.4 / 0.5) * 1e6).toLong
  private val SprtBound: Long = math.floor(math.log(19d) * 1e6).toLong
  private def SprtLlrPos = lit(SprtLlrPosL)
  private def SprtLlrNeg = lit(SprtLlrNegL)

  /** q320's pinned power-analysis z factor: (z_{α/2} + z_β)² at
    * α = 0.05 two-sided / power 0.8 — (1.959964 + 0.841621)² in
    * micro² — squared ONCE here and interpolated into both engines.
    */
  private val PowerZ2: Long = {
    val z = 1959964L + 841621L
    z * z
  }

  /** q317's pinned SES weight ladders (α = 0.3, nano scale, indexed
    * by lag k = 0..39): smooth term ⌊α·(1−α)^k·10⁹⌋ and init term
    * ⌊(1−α)^k·10⁹⌋ — computed once, interpolated into BOTH engines,
    * so no runtime pow crosses the gate. 40 lags covers the 30-day
    * event span with margin.
    */
  private val SesSmoothW: Seq[Long] = (0 until 40).map { k =>
    math.floor(0.3 * math.pow(0.7, k) * 1e9).toLong
  }
  private val SesInitW: Seq[Long] = (0 until 40).map { k =>
    math.floor(math.pow(0.7, k) * 1e9).toLong
  }

  /** q198's pinned Benford expectations ⌊log10(1+1/d)·10⁶⌋ for digits
    * 1..9 — computed once here and interpolated into BOTH engines as
    * integer literals (the SPRT/DCG convention above; no runtime
    * transcendental crosses the gate).
    */
  private val BenfordMicro: Seq[Long] = (1 to 9).map { d =>
    math.floor(math.log10(1d + 1d / d) * 1e6).toLong
  }

  /** q127/q128's dimension-change stream: signup events as profile
    * updates. Times are collapsed per (user, ts) first (greatest value
    * wins — [[graft.pipeline.AsofJoin]]'s tie-break) so the SCD2
    * intervals are well defined even if two changes share an exact ns
    * timestamp.
    */
  private def dimChanges(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("attr"))

  /** The nation trade graph (q115's edge build, undirected, distinct):
    * fact table joined to two broadcast dims, collapsed to ≤|nations|²
    * (lo, hi) edges — shared by triangle counting (q136) and BFS
    * (q172).
    */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val l = Tables.load(s, d, "lineitem").select("l_orderkey", "l_suppkey")
    val o = Tables.load(s, d, "orders").select("o_orderkey", "o_custkey")
    val c = Tables.load(s, d, "customer").select("c_custkey", "c_nationkey")
    val su = Tables.load(s, d, "supplier").select("s_suppkey", "s_nationkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .where(col("s_nationkey") =!= col("c_nationkey"))
      .select(
        least(col("s_nationkey"), col("c_nationkey")).cast("long").as("lo"),
        greatest(col("s_nationkey"), col("c_nationkey")).cast("long").as("hi"))
      .distinct()
  }

  /** q259's confusion cells (the EXACT q15 scorer/tie-break folded to
    * the ≤|langs|² predicted×actual table) — shared by the confusion
    * matrix (q259) and Cohen's kappa (q286).
    */
  private def langConfusionCells(s: SparkSession, d: String): DataFrame = {
    val toks = graft.pipeline.TextOps.tokens(col("text"))
    val scored = graft.pipeline.TextOps.langMarkers
      .foldLeft(Tables.load(s, d, "documents")) { case (df, (lang, ms)) =>
        df.withColumn(s"s_$lang",
          graft.pipeline.TextOps.markerScore(toks, ms))
      }
    val pred =
      when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr"))
        && col("s_en") > 0, "en")
        .when(col("s_de") >= greatest(col("s_es"), col("s_fr"))
          && col("s_de") > 0, "de")
        .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
        .when(col("s_fr") > 0, "fr")
        .otherwise("und")
    scored.withColumn("predicted", pred)
      .groupBy(col("lang").as("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .withColumn("correct", col("actual") === col("predicted"))
  }

  /** q259's oracle body (no trailing ORDER BY) — shared with q286's
    * kappa fold, so both gates replay the identical scorer text.
    */
  private val langConfusionSql: String =
    "WITH t0 AS (SELECT lang, string_split(" +
      "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') " +
      "AS toks FROM documents), " +
      "sc AS (SELECT lang, " +
      "len(list_filter(toks, t -> t IN ('the', 'a', 'and', 'of'))) " +
      "AS s_en, " +
      "len(list_filter(toks, t -> t IN ('der', 'die', 'das', 'und'))) " +
      "AS s_de, " +
      "len(list_filter(toks, t -> t IN ('el', 'los', 'las', 'y'))) " +
      "AS s_es, " +
      "len(list_filter(toks, t -> t IN ('le', 'les', 'et', 'du'))) " +
      "AS s_fr FROM t0), " +
      "p AS (SELECT lang AS actual, CASE " +
      "WHEN s_en >= greatest(s_de, s_es, s_fr) AND s_en > 0 THEN 'en' " +
      "WHEN s_de >= greatest(s_es, s_fr) AND s_de > 0 THEN 'de' " +
      "WHEN s_es >= s_fr AND s_es > 0 THEN 'es' " +
      "WHEN s_fr > 0 THEN 'fr' ELSE 'und' END AS predicted FROM sc) " +
      "SELECT actual, predicted, COUNT(*) AS n, " +
      "(actual = predicted) AS correct FROM p GROUP BY 1, 2"

  /** q290's pinned O'Brien-Fleming boundary micros for K = 4 looks
    * (two-sided α = 0.05): z_k = 2.024428·√(K/k) — the textbook OBF
    * spending shape, final-look bound ≈ the fixed-horizon 1.96 paid
    * up front with near-unspendable early bounds. Computed once here
    * and interpolated into BOTH engines, so no runtime sqrt crosses
    * the gate.
    */
  private val ObfBoundMicro: Map[Int, Long] = (1 to 4).map { k =>
    k -> math.floor(2.024428 * math.sqrt(4.0 / k) * 1e6).toLong
  }.toMap

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q148 — SINGLE-PASS PIPELINE OBSERVABILITY (`df.observe` /
    // CollectMetrics): audit counters computed ON THE SAME SCAN that
    // feeds the real query. At 100 TB a separate "profile the input"
    // pass is a second full read of the corpus; observe rides the
    // existing one — the metrics accumulate in the tasks as rows flow
    // through, cost ~zero. The observation sits BEFORE the filter, so
    // it audits everything the scan saw while the main aggregation
    // consumes only its slice — the input-vs-output accounting a
    // production pipeline alerts on. Integer cents keep every metric
    // engine-exact; the gate hashes the metrics row itself.
    "q148_observed_metrics" -> ((s, d) => {
      val obs = org.apache.spark.sql.Observation()
      val observed = events(s, d)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .observe(obs,
          count(lit(1)).as("n_rows"),
          sum(when(col("cents") > 10000, 1L).otherwise(0L)).as("n_large"),
          min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))
      // the main query the audited scan feeds; its result is
      // discarded here — the gate is the metrics row
      observed.where(col("event_type") === "click")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long], m("n_large").asInstanceOf[Long],
        m("min_cents").asInstanceOf[Long], m("max_cents").asInstanceOf[Long]))
        .toDF("n_rows", "n_large", "min_cents", "max_cents")
    }),

    // q158 — FORWARD-FILL IMPUTATION (`last_value ... IGNORE NULLS`):
    // the missing-data repair step a feature pipeline runs before
    // training — gaps carry the last observed value forward within
    // each entity's timeline. A deterministic null mask (event_id %
    // 3 = 0) plants the gaps; the window is PARTITIONED BY user (the
    // q42 rule: bounded per-partition sort, never a global order).
    // Cents keep the filled values engine-exact; rows before a
    // user's first observation legitimately stay NULL and the oracle
    // must agree on those too.
    "q158_fill_forward" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_id") % 3 === 0, lit(null))
            .otherwise(round(col("value") * 100).cast("long")).as("cents"))
        .withColumn("filled", last(col("cents"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"), col("cents"), col("filled"))
        .orderBy("user_id", "event_id")
    }),

    // q159 — RELATIVE-RANK ANALYTICS (percent_rank + cume_dist): the
    // normalized-position signals curation thresholds use ("drop the
    // bottom 5% by quality score" is a cume_dist cut). Grouped by
    // event_type so every window is key-partitioned; value ties are
    // real (2-decimal cents collide) and both functions' tie rules
    // must match the oracle's exactly. Rounded to 6 dp — a ratio of
    // small integers, identical in both engines.
    "q159_rank_analytics" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("cents")
      events(s, d)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .orderBy("event_type", "event_id")
        .select("event_type", "event_id", "cents", "pr", "cd")
    }),

    // q160 — LINEAR INTERPOLATION (q158's forward-fill upgraded to
    // the two-sided repair): gaps take the value linearly implied by
    // the surrounding observations, time-weighted by the ns
    // timestamps. Two frames per user — backward last-non-null and
    // forward first-non-null (both value and observation time via
    // IGNORE NULLS) — then one scan-side formula. The fractional
    // term is evaluated in double ON EXACT INTEGER INPUTS in the
    // same expression order both engines use (ns deltas < 2^53 stay
    // exactly representable), then floored back to integer cents, so
    // the hash compare is safe. Head/tail gaps (no neighbor on one
    // side) stay NULL — the honest contract; equal-timestamp
    // neighbors fall back to the previous observation.
    "q160_interpolate" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val wb = W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
      val wf = W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(0, W.unboundedFollowing)
      val obsT = when(col("cents").isNotNull, col("ts"))
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_id") % 3 === 0, lit(null))
            .otherwise(round(col("value") * 100).cast("long")).as("cents"))
        .withColumn("pc", last(col("cents"), ignoreNulls = true).over(wb))
        .withColumn("pt", last(obsT, ignoreNulls = true).over(wb))
        .withColumn("nc", first(col("cents"), ignoreNulls = true).over(wf))
        .withColumn("nt", first(obsT, ignoreNulls = true).over(wf))
        .withColumn("interp",
          when(col("cents").isNotNull, col("cents"))
            .when(col("pc").isNull || col("nc").isNull, lit(null))
            .when(col("nt") === col("pt"), col("pc"))
            .otherwise(col("pc") + floor(
              (col("nc") - col("pc")).cast("double") *
                (col("ts") - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double")).cast("long")))
        .select(col("user_id"), col("event_id"), col("cents"), col("interp"))
        .orderBy("user_id", "event_id")
    }),

    // q161 — TWO-PROPORTION Z-TEST (experiment analysis): success =
    // a purchase event, variants split by user hash. Shape: one
    // partial-agg pass collapses the event stream to two (n, c) arm
    // rows, folded to a single row by conditional sums — the z
    // statistic is double math over exact integer counts in a pinned
    // expression order, rounded to 6 dp (the q154-cents argument
    // applied to a statistic). Per-user collapse is deliberately NOT
    // used: with ~60 events per user every user "converts", which
    // saturates p at 1 and zeroes the variance.
    "q161_ab_ztest" -> ((s, d) => {
      val one = events(s, d)
        .select((col("user_id") % 2).as("variant"),
          (col("event_type") === "purchase").cast("long").as("conv"))
        .groupBy("variant")
        .agg(count(lit(1)).as("n"), sum("conv").as("c"))
        .agg(
          sum(when(col("variant") === 0, col("n"))).as("n0"),
          sum(when(col("variant") === 0, col("c"))).as("c0"),
          sum(when(col("variant") === 1, col("n"))).as("n1"),
          sum(when(col("variant") === 1, col("c"))).as("c1"))
      val p0 = col("c0").cast("double") / col("n0").cast("double")
      val p1 = col("c1").cast("double") / col("n1").cast("double")
      val pp = (col("c0") + col("c1")).cast("double") /
        (col("n0") + col("n1")).cast("double")
      one.select(col("n0"), col("c0"), col("n1"), col("c1"),
        round((p0 - p1) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n0").cast("double") +
            lit(1.0) / col("n1").cast("double"))), 6).as("z"))
    }),

    // q293 — KENDALL TAU-B: the pair-concordance companion to q272's
    // Spearman (Spearman squares rank gaps; tau counts inversions —
    // less sensitive to a single large displacement) with FULL tie
    // correction: C, D, and the three tie classes are exact integer
    // pair counts over the bounded daily table (the q267/q269 day-pair
    // join), and only τ_b = (C−D)/√((n0−n1)(n0−n2)) leaves integers
    // (pinned √·√ order, 6 dp, null when a margin is all ties).
    "q293_kendall_tau" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("xc"),
          count(lit(1)).as("yc"))
      val a = daily.toDF("event_type", "day_a", "x_a", "y_a")
      val b = daily.toDF("event_type", "day_b", "x_b", "y_b")
      a.join(b, Seq("event_type"))
        .where(col("day_a") < col("day_b"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n0"),
          sum(expr("case when (x_b > x_a and y_b > y_a) or " +
            "(x_b < x_a and y_b < y_a) then 1L else 0L end")).as("c"),
          sum(expr("case when (x_b > x_a and y_b < y_a) or " +
            "(x_b < x_a and y_b > y_a) then 1L else 0L end")).as("dd"),
          sum(expr("case when x_b = x_a then 1L else 0L end")).as("tx"),
          sum(expr("case when y_b = y_a then 1L else 0L end")).as("ty"))
        .select(col("event_type"), col("n0"), col("c"), col("dd"),
          when(col("n0") > col("tx") && col("n0") > col("ty"),
            round((col("c") - col("dd")).cast("double") /
              (sqrt((col("n0") - col("tx")).cast("double")) *
                sqrt((col("n0") - col("ty")).cast("double"))), 6))
            .as("tau_b"))
        .orderBy("event_type")
    }),

    // q294 — HERFINDAHL-HIRSCHMAN CONCENTRATION: per event type, how
    // concentrated is volume across users — the market-concentration
    // twin of q260's Gini (HHI weights the BIG shares quadratically;
    // a regulator reads both). HHI = Σ_u share_u² folded to one exact
    // division: Σ c_u²·10⁶ div C², decimal(38) squares; the 10⁶/n
    // uniform floor rides along so the reader sees distance from
    // uniform. One user-keyed partial agg, one bounded fold.
    "q294_hhi_concentration" -> ((s, d) => {
      events(s, d)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("cu"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"), sum("cu").as("n_events"),
          sum(expr("cast(cu as decimal(38,0)) * cu")).as("sq"))
        .select(col("event_type"), col("n_users"), col("n_events"),
          expr("cast(sq * 1000000 div (cast(n_events as decimal(38,0)) " +
            "* n_events) as bigint)").as("hhi_micro"),
          expr("1000000 div n_users").as("uniform_micro"))
        .orderBy("event_type")
    }),

    // q298 — INDEX OF DISPERSION (overdispersion screen): per type,
    // the variance-to-mean ratio of DAILY counts — the one number
    // that says whether a Poisson traffic model is even admissible
    // (D ≈ 10⁶ micro ⇔ Poisson; D ≫ 10⁶ ⇔ clumped/negative-binomial,
    // and every rate-based alert threshold downstream needs widening).
    // Exact: D_micro = (n·Σx² − (Σx)²)·10⁶ div ((n−1)·Σx), decimal(38)
    // products over the bounded daily table, one trailing division.
    "q298_dispersion_index" -> ((s, d) => {
      events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("x").as("n_events"),
          sum(expr("cast(x as decimal(38,0)) * x")).as("sx2"))
        .where(col("n_days") > 1L && col("n_events") > 0L)
        .select(col("event_type"), col("n_days"), col("n_events"),
          expr("cast((n_days * sx2 - cast(n_events as decimal(38,0)) " +
            "* n_events) * 1000000 div ((n_days - 1) * " +
            "cast(n_events as decimal(38,0))) as bigint)")
            .as("dispersion_micro"))
        .orderBy("event_type")
    }),

    // q295 — SEASONAL-STRENGTH METRICS (Hyndman & Athanasopoulos):
    // one row per type summarizing q277's decomposition — F_trend =
    // max(0, 1 − Var(R)/Var(T+R)) and F_seasonal = max(0, 1 −
    // Var(R)/Var(S+R)) — the numbers a forecaster reads to decide if
    // the series WARRANTS a seasonal model. Variances stay exact by
    // the n-scaling trick (q278): for a component c over n full-
    // window days, n²·Var = n·Σ(c·n − Σc... folded as n·Σc² − (Σc)²,
    // all decimal(38); each F is ONE quantized division of two exact
    // integers (10⁶ − Var_R·10⁶ div Var_X, clamped at 0). Runs on
    // q277's bounded daily table.
    "q295_seasonal_strength" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
          .as("x"))
      val w7 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-3, 3)
      val t = daily
        .withColumn("trend",
          when(count(lit(1)).over(w7) === 7L &&
            max("day").over(w7) - min("day").over(w7) === 6L,
            expr("sum(x) over (partition by event_type order by day " +
              "rows between 3 preceding and 3 following) div 7")))
        .withColumn("dow", expr("day % 7"))
        .withColumn("det", col("x") - col("trend"))
      val seas = t.where(col("det").isNotNull)
        .groupBy("event_type", "dow")
        .agg(expr("sum(det) div count(1)").as("seasonal"))
      val full = t.join(seas, Seq("event_type", "dow"))
        .where(col("trend").isNotNull)
        .withColumn("r", col("x") - col("trend") - col("seasonal"))
        .withColumn("tr", col("trend") + col("r"))
        .withColumn("sr", col("seasonal") + col("r"))
      def nvar(c: String) = // n·Σc² − (Σc)² — n²·Var, exact
        expr(s"count(1) * sum(cast($c as decimal(38,0)) * $c) " +
          s"- sum(cast($c as decimal(38,0))) * sum($c)")
      full.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          nvar("r").as("vr"), nvar("tr").as("vtr"), nvar("sr").as("vsr"))
        .select(col("event_type"), col("n_days"),
          when(col("vtr") > 0, greatest(lit(0L),
            lit(1000000L) - expr("cast(vr * 1000000 div vtr as bigint)")))
            .as("f_trend_micro"),
          when(col("vsr") > 0, greatest(lit(0L),
            lit(1000000L) - expr("cast(vr * 1000000 div vsr as bigint)")))
            .as("f_seasonal_micro"))
        .orderBy("event_type")
    }),

    // q296 — BINARY-SEGMENTATION CHANGEPOINT ESTIMATE: WHERE did the
    // level shift happen — the estimation companion to q266's CUSUM
    // detection. The best single split maximizes the two-segment fit
    // Σ_l²/n_l + Σ_r²/n_r (equivalently minimizes SSE; the Σx² term
    // is split-invariant and drops); the gain is quantized to
    // g_micro = (Σ_l²·n_r + Σ_r²·n_l)·10⁶ div (n_l·n_r) — decimal(38)
    // products of exact prefix sums — and the argmax is exact with a
    // min-day tie-break. Candidate splits are the ≤|days| prefix
    // boundaries; everything runs on the bounded daily table (prefix
    // sums via per-type windows, argmax a max_by fold).
    "q296_binary_segmentation" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
          .as("x"))
      val wOrd = Window.partitionBy("event_type").orderBy("day")
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      daily
        .withColumn("k", row_number().over(wOrd).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("sl", sum("x").over(wCum))
        .withColumn("st", sum("x").over(wAll))
        .where(col("k") < col("n")) // split AFTER day k
        .withColumn("g", expr(
          "cast((cast(sl as decimal(38,0)) * sl * (n - k) " +
            "+ cast(st - sl as decimal(38,0)) * (st - sl) * k) " +
            "* 1000000 div (cast(k as decimal(38,0)) * (n - k)) " +
            "as decimal(38,0))"))
        .groupBy("event_type")
        .agg(max_by(struct(col("day"), col("k"), col("g")),
          struct(col("g"), -col("day"))).as("m"),
          max("n").as("n_days"))
        .select(col("event_type"), col("n_days"),
          col("m.day").as("split_after_day"),
          col("m.k").as("left_days"),
          col("m.g").cast("long").as("gain_quantized"))
        .orderBy("event_type")
    }),

    // q292 — 1-D WASSERSTEIN (EARTH-MOVER) DISTANCE: how far apart
    // are the two arms' purchase-value distributions IN CENTS — the
    // magnitude-aware companion to q238's KS (KS caps at the largest
    // CDF gap; W₁ integrates every gap, so a fat tail moves it). In
    // 1-D, W₁ = ∫|F_A − F_B| dx = Σ_i |cumA_i·N_B − cumB_i·N_A| ·
    // (v_{i+1} − v_i) / (N_A·N_B) over the sorted distinct values —
    // EXACT integers throughout: cross-multiplied CDF gaps (no
    // per-row division), decimal(38) products, one trailing division
    // to micro-cents. Plan: one partial-agg groupBy to the bounded
    // cents histogram; the cum/lead windows run on that table (the
    // q265 bounded-domain window shape).
    "q292_wasserstein" -> ((s, d) => {
      val h = events(s, d)
        .where(col("event_type") === "purchase")
        .select((col("user_id") % 2 === 0).as("arm_a"),
          expr("cast(round(value * 100) as bigint)").as("v"))
        .groupBy("v")
        .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("a"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("b"))
      val tot = h.agg(sum("a").as("na"), sum("b").as("nb"))
      val wv = Window.orderBy("v")
      val wc = wv.rowsBetween(Window.unboundedPreceding, 0)
      h
        .withColumn("cuma", sum("a").over(wc))
        .withColumn("cumb", sum("b").over(wc))
        .withColumn("nextv", lead("v", 1).over(wv))
        .where(col("nextv").isNotNull)
        .crossJoin(broadcast(tot))
        .select(expr("abs(cast(cuma as decimal(38,0)) * nb - " +
          "cast(cumb as decimal(38,0)) * na) * (nextv - v)").as("seg"),
          col("na"), col("nb"))
        .groupBy("na", "nb")
        .agg(sum("seg").as("segsum"))
        .select(col("na").as("n_a"), col("nb").as("n_b"),
          expr("cast(segsum * 1000000 div (cast(na as decimal(38,0)) " +
            "* nb) as bigint)").as("w1_micro_cents"))
    }),

    // q290 — GROUP-SEQUENTIAL MONITOR (O'Brien-Fleming): the interim-
    // analysis discipline between q161's fixed-horizon z and q256's
    // per-event SPRT — peek at the experiment 4 times (day-rank
    // quartiles) WITHOUT inflating α, because each look pays the
    // pinned OBF boundary z·√(K/k) (ObfBoundMicro — no runtime sqrt
    // in the boundary). Each look's z is q161's pooled-proportion
    // formula over the CUMULATIVE counts (pinned-order double, 6 dp);
    // everything before it is exact integers on the bounded
    // (day, variant) cell table — the 4-look fan-out happens AFTER
    // the per-day aggregation, never on event volume. Output: one row
    // per look with the boundary and the crossing verdict.
    "q290_obrien_fleming" -> ((s, d) => {
      val cells = events(s, d)
        .select(expr("ts div 86400000000000").as("day"),
          (col("user_id") % 2).as("variant"),
          (col("event_type") === "purchase").cast("long").as("conv"))
        .groupBy("day", "variant")
        .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      val wd = Window.orderBy("day")
      val ranked = cells
        .join(cells.select("day").distinct()
          .withColumn("rk", row_number().over(wd).cast("long"))
          .crossJoin(broadcast(cells.select("day").distinct()
            .agg(count(lit(1)).as("nd")))), "day")
      val looks = ranked
        .withColumn("look", explode(array(lit(1L), lit(2L), lit(3L),
          lit(4L))))
        .where(col("rk") <= expr("(look * nd + 3) div 4"))
        .groupBy("look")
        .agg(countDistinct("day").as("n_days"),
          sum(when(col("variant") === 0, col("n"))).as("n0"),
          sum(when(col("variant") === 0, col("c"))).as("c0"),
          sum(when(col("variant") === 1, col("n"))).as("n1"),
          sum(when(col("variant") === 1, col("c"))).as("c1"))
      val p0 = col("c0").cast("double") / col("n0").cast("double")
      val p1 = col("c1").cast("double") / col("n1").cast("double")
      val pp = (col("c0") + col("c1")).cast("double") /
        (col("n0") + col("n1")).cast("double")
      val bound = expr("case look" +
        (1 to 4).map(k => s" when ${k}L then ${ObfBoundMicro(k)}L")
          .mkString + " end")
      looks
        .withColumn("z", round((p0 - p1) / sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n0").cast("double") +
            lit(1.0) / col("n1").cast("double"))), 6))
        .withColumn("bound_micro", bound)
        .select(col("look"), col("n_days"), col("n0"), col("c0"),
          col("n1"), col("c1"), col("z"), col("bound_micro"),
          (abs(col("z")) * 1000000d > col("bound_micro").cast("double"))
            .as("crossed"))
        .orderBy("look")
    }),

    // q162 — CEP PATTERN MATCH (Flink MATCH_RECOGNIZE role): detect
    // `click{2,} purchase` per user — two-or-more CONSECUTIVE clicks
    // immediately followed by a purchase within 24 h of the last
    // click. The pattern compiles away to run-length encoding (the
    // standard MATCH_RECOGNIZE lowering for patterns over maximal
    // greedy runs): lag() marks run starts, a running sum assigns run
    // ids, runs aggregate to (type, len, start, end), and lead() over
    // the RUN stream pairs each click-run with its successor. Every
    // window is PARTITIONED BY user (the q42 rule — bounded
    // per-partition sorts, never a global order); the run aggregate
    // is a partial-agg groupBy on (user, run); the run-level window
    // sees per-user RUN counts, already collapsed below event volume.
    // Matches carry (first/last click, click count, purchase time) —
    // exactly MATCH_RECOGNIZE's MEASURES clause. `error`/`view` rows
    // between clicks break the run, as consecutive-pattern semantics
    // require.
    "q162_cep_pattern" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val we = W.partitionBy("user_id").orderBy("ts", "event_id")
      val wr = W.partitionBy("user_id").orderBy("run_id")
      val runs = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("nr",
          when(lag(col("event_type"), 1).over(we).isNull ||
            lag(col("event_type"), 1).over(we) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum(col("nr")).over(we))
        .groupBy("user_id", "run_id")
        .agg(max(col("event_type")).as("etype"), count(lit(1)).as("len"),
          min(col("ts")).as("run_start"), max(col("ts")).as("run_end"))
      runs
        .withColumn("next_type", lead(col("etype"), 1).over(wr))
        .withColumn("next_start", lead(col("run_start"), 1).over(wr))
        .where(col("etype") === "click" && col("len") >= 2 &&
          col("next_type") === "purchase" &&
          col("next_start") - col("run_end") <= 86400000000000L)
        .select(col("user_id"), col("run_start").as("first_click_ts"),
          col("run_end").as("last_click_ts"), col("len").as("n_clicks"),
          col("next_start").as("purchase_ts"))
        .orderBy("user_id", "first_click_ts")
    }),

    // q163 — TABLE FINGERPRINT (anti-entropy checksum): the
    // order-independent content digest replication validation runs on
    // both sides of a 100 TB copy — per shard: row count, a
    // commutative SUM of 48-bit row digests (accumulated in
    // decimal(38) so 10^12 rows cannot overflow; the GATE hashes its
    // 60-bit residue — both engines' pandas/parquet bridges flatten a
    // 38-digit decimal lossily, the residue is exact), and their
    // bitwise XOR. One partial-agg pass, no sort, no row movement
    // beyond the 8-row aggregate; a single flipped byte anywhere
    // flips both accumulators. Row canonicalization pins column order
    // and folds the double to cents; concat_ws null-skipping matches
    // across engines.
    "q163_fingerprint" -> ((s, d) => {
      val rowStr = concat_ws("|",
        col("event_id"), col("user_id"), col("event_type"), col("ts"),
        round(col("value") * 100).cast("long"), col("props"))
      events(s, d)
        .select((col("user_id") % 8).as("shard"),
          conv(substring(md5(rowStr), 1, 12), 16, 10)
            .cast("long").as("h"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n"),
          expr("cast(sum(cast(h as decimal(38,0))) % 1152921504606846976 " +
            "as long)").as("fp_sum"),
          expr("bit_xor(h)").as("fp_xor"))
        .orderBy("shard")
    }),

    // q164 — WINSORIZED MEAN (outlier-clamped statistics): per-type
    // value sums with the tails clamped to the exact p05/p95 — the
    // robust aggregate a feature pipeline uses where a plain mean
    // would let one corrupt row dominate. Thresholds come from one
    // exact-percentile pass over the |types| groups (the q135
    // floor-to-micro convention keeps the interpolated cut
    // engine-exact), broadcast back, and the clamp + sum is
    // all-integer micro arithmetic — partial-agg, order-free.
    "q164_winsorize" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val th = ev.groupBy("event_type").agg(
        floor(expr("percentile(cents, 0.05)") * 1000000).cast("long").as("lo"),
        floor(expr("percentile(cents, 0.95)") * 1000000).cast("long").as("hi"))
      ev.join(broadcast(th), "event_type")
        .withColumn("wm",
          greatest(col("lo"), least(col("hi"), col("cents") * 1000000L)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min(col("lo")).as("p05_micro"),
          min(col("hi")).as("p95_micro"), sum(col("wm")).as("wsum_micro"))
        .orderBy("event_type")
    }),

    // q168 — MAD ROBUST OUTLIERS: the median-absolute-deviation
    // flagging pass — q119's z-score with the mean/stddev swapped for
    // median/MAD, so a heavy tail cannot drag its own threshold (the
    // robust-statistics cell of the quality family). Two bounded
    // percentile passes over per-type groups (the q41 exact-quantile
    // contract: low-cardinality groups; the sketch path is q97),
    // thresholds broadcast back both times, and the flag itself is
    // exact integer arithmetic: |x−med|·10⁴ > 3·1.4826·10⁴·MAD —
    // no float stddev accumulation anywhere.
    "q168_mad_outliers" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val med = ev.groupBy("event_type").agg(
        floor(expr("percentile(cents, 0.5)") * 1000000)
          .cast("long").as("med_micro"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adm",
          abs(col("cents") * 1000000L - col("med_micro")))
      val mad = dev.groupBy("event_type").agg(
        min(col("med_micro")).as("med_micro"),
        floor(expr("percentile(adm, 0.5)")).cast("long").as("mad_micro"))
      dev.drop("med_micro").join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min(col("med_micro")).as("med_micro"),
          min(col("mad_micro")).as("mad_micro"),
          sum(when(col("adm") * 10000L > lit(44478L) * col("mad_micro"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    }),

    // q169 — CUMULATE WINDOW (Flink's third window TVF, closing the
    // family: TUMBLE = q44, HOP = q94): expanding daily windows that
    // fire every 6 h — [day, 06:00), [day, 12:00), [day, 18:00),
    // [day, 24:00) — the "today so far, refreshed periodically"
    // dashboard aggregate. Lowered the HOP way: each event fans
    // scan-side into the ≤4 cumulate steps whose expanding window
    // contains it (`explode(sequence(first_step, 4))`), then one
    // partial-agg groupBy on (day, step). Fan-out is bounded by
    // day/step = 4, not by data; integer cents keep sums exact.
    "q169_cumulate_window" -> ((s, d) => {
      val dayNs = 86400000000000L
      val stepNs = dayNs / 4
      events(s, d)
        .select(expr(s"ts div $dayNs").as("day"),
          (expr(s"(ts % $dayNs) div $stepNs") + 1).as("first_step"),
          round(col("value") * 100).cast("long").as("cents"))
        .select(col("day"),
          explode(sequence(col("first_step"), lit(4L))).as("step"),
          col("cents"))
        .groupBy("day", "step")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy("day", "step")
    }),

    // q172 — BFS HOP DISTANCE (single-source shortest paths,
    // unweighted): the reachability primitive completing the graph
    // family — q115 ranks (PageRank), q136 counts local structure
    // (triangles), q38/q96 partition (components); this measures
    // DISTANCE. Same propagation engine as connectedComponents: one
    // bounded edge⋈label shuffle + partial-agg min per round, rounds
    // = the source's eccentricity, monotone-sum convergence, fail-
    // loud round cap. Nations absent from the trade graph surface as
    // hop = NULL (unreachable) — the honest contract, gated too.
    "q172_bfs_hops" -> ((s, d) => {
      val nodes = Tables.load(s, d, "nation")
        .select(col("n_nationkey").cast("long").as("nation"))
      graft.pipeline.Cluster
        .bfsHops(nodes, tradeEdges(s, d), "nation", "lo", "hi", sourceId = 0L)
        .orderBy("nation")
    }),

    // q174 — EMA SMOOTHING (recursive per-entity fold): the
    // exponential moving average ema_i = 0.2·x_i + 0.8·ema_{i−1} —
    // a true RECURRENCE, inexpressible as any window frame, so it
    // runs as a bounded per-user ordered fold: collect the user's
    // series (sorted by the (ts, event_id) total order — per-entity
    // state, the q122 bounded-collect rule), seed at the first
    // observation, fold in INTEGER hundredth-cents with truncating
    // division so every intermediate is engine-exact (positive
    // domain, so trunc ≡ floor). One groupBy shuffle, fold runs
    // scan-side on the aggregated row.
    "q174_ema_smoothing" -> ((s, d) => {
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("cents")))).as("seq"))
        .select(col("user_id"), size(col("seq")).cast("long").as("n"),
          expr("aggregate(" +
            "slice(transform(seq, s -> s.cents * 100), 2, size(seq) - 1), " +
            "element_at(seq, 1).cents * 100, " +
            "(acc, x) -> (2 * x + 8 * acc) div 10)").as("ema_c100"))
        .orderBy("user_id")
    }),

    // q175 — CUPED VARIANCE REDUCTION (the experimentation-platform
    // companion to q161's z-test): adjust the experiment metric with
    // the PRE-period covariate — y_adj = y − θ(x − x̄), θ =
    // cov(x,y)/var(x) pooled — so pre-existing user differences stop
    // inflating variance. Per-user pre/post sums are one partial-agg
    // pass; θ and the per-variant adjusted means are closed forms
    // over EXACT integer sums (Σx, Σy, Σxy, Σx² in decimal(38) —
    // q165's overflow rule), evaluated in one pinned double order.
    "q175_cuped" -> ((s, d) => {
      val ev = events(s, d)
      val bounds = ev.agg(min(col("ts")), max(col("ts"))).head()
      val cut = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2
      val per = ev
        .select(col("user_id"), (col("user_id") % 2).as("variant"),
          when(col("ts") < cut, round(col("value") * 100).cast("long"))
            .otherwise(0L).as("xc"),
          when(col("ts") >= cut, round(col("value") * 100).cast("long"))
            .otherwise(0L).as("yc"))
        .groupBy(col("user_id"), col("variant"))
        .agg(sum("xc").as("x"), sum("yc").as("y"))
      val d38 = "decimal(38,0)"
      val sums = per.agg(
        count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x").cast(d38) * col("y")).as("sxy"),
        sum(col("x").cast(d38) * col("x")).as("sxx"),
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 0, col("x"))).as("x0"),
        sum(when(col("variant") === 0, col("y"))).as("y0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1, col("x"))).as("x1"),
        sum(when(col("variant") === 1, col("y"))).as("y1"))
      val theta =
        (col("k").cast(d38) * col("sxy") -
          col("sx").cast(d38) * col("sy")).cast("double") /
          (col("k").cast(d38) * col("sxx") -
            col("sx").cast(d38) * col("sx")).cast("double")
      val xbar = col("sx").cast("double") / col("k").cast("double")
      def adjMean(n: Column, sxv: Column, syv: Column): Column =
        (syv.cast("double") - col("__theta") *
          (sxv.cast("double") - n.cast("double") * col("__xbar"))) /
          n.cast("double")
      sums
        .withColumn("__theta", theta)
        .withColumn("__xbar", xbar)
        .select(col("n0"), col("n1"), col("y0"), col("y1"),
          round(col("__theta"), 6).as("theta"),
          round(adjMean(col("n1"), col("x1"), col("y1")) -
            adjMean(col("n0"), col("x0"), col("y0")), 6).as("adj_lift"))
    }),

    // q181 — PER-GROUP TREND REGRESSION (segmented OLS): a daily-
    // count slope per event type — the drift detector that flags
    // growing/shrinking segments without a forecasting stack. q165's
    // closed form GROUPED: daily counts are one partial-agg pass
    // (|types|×|days| rows), the five OLS sums another, slope in
    // decimal(38)-safe pinned double per group. The regression never
    // sees event volume — only the bounded daily aggregate.
    "q181_trend_slopes" -> ((s, d) => {
      val d38 = "decimal(38,0)"
      val daily = events(s, d)
        .select(col("event_type"), expr("ts div 86400000000000").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      daily
        .groupBy("event_type")
        .agg(count(lit(1)).as("k"), sum("day").as("sx"), sum("y").as("sy"),
          sum(col("day").cast(d38) * col("y")).as("sxy"),
          sum(col("day").cast(d38) * col("day")).as("sxx"))
        .withColumn("slope_raw",
          (col("k").cast(d38) * col("sxy") -
            col("sx").cast(d38) * col("sy")).cast("double") /
            (col("k").cast(d38) * col("sxx") -
              col("sx").cast(d38) * col("sx")).cast("double"))
        .select(col("event_type"), col("k"), col("sy"),
          round(col("slope_raw"), 6).as("slope"),
          (col("slope_raw") > 0).as("growing"))
        .orderBy("event_type")
    }),

    // q185 — POINT-IN-TIME FEATURE ASSEMBLY (the feature-store read
    // path): a training row per purchase with every feature AS OF
    // purchase time — no leakage from the future: running activity
    // counts/spend from a per-user window ending at 1 PRECEDING, the
    // profile attribute through the SCD2 temporal join (q128's as-of
    // rewrite), and a calendar feature. This is the join Feast/Tecton
    // call "point-in-time correct": label at t, features strictly
    // before t. All windows user-partitioned; the dim join is the one
    // union + key shuffle of the as-of plan.
    "q185_feature_assembly" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
      val facts = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("prior_n", count(lit(1)).over(w))
        .withColumn("prior_cents",
          coalesce(sum(col("cents")).over(w), lit(0L)))
        .where(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "cents", "prior_n",
          "prior_cents")
      Scd2.temporalJoin(facts, dimChanges(s, d), "user_id",
          col("ts"), col("ts"), "attr")
        .select(col("event_id"), col("user_id"),
          col("cents").as("label_cents"), col("prior_n"),
          col("prior_cents"), round(col("attr"), 6).as("profile_attr"),
          ((expr("ts div 86400000000000") + 4) % 7).as("dow"))
        .orderBy("event_id")
    }),

    // q186 — LARGEST-REMAINDER ALLOCATION: distribute each order's
    // total price across its line items proportionally to quantity,
    // with the financial-exactness contract a float split cannot give
    // — per-order allocations are INTEGERS that sum EXACTLY to the
    // order total (Hamilton's method: integer base shares, the
    // remainder distributed +1 to the largest fractional parts in a
    // deterministic order). All integer arithmetic; every window is
    // partitioned by order (≤7 lines — bounded), so the whole
    // computation is one key shuffle.
    "q186_allocation" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val wo = W.partitionBy("l_orderkey")
      val wr = W.partitionBy("l_orderkey")
        .orderBy(col("frac").desc, col("l_linenumber"))
      Tables.load(s, d, "lineitem")
        // collapse to the (order, line) grain first: the synthetic
        // lineitem repeats line numbers, and allocation needs a
        // unique deterministic line identity
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
        .join(Tables.load(s, d, "orders")
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 100).cast("long").as("total_cents")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("qsum", sum("qty").over(wo))
        .withColumn("base", expr("total_cents * qty div qsum"))
        .withColumn("frac", expr("(total_cents * qty) % qsum"))
        .withColumn("rk", row_number().over(wr))
        .withColumn("rem", col("total_cents") - sum("base").over(wo))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("base") + when(col("rk") <= col("rem"), 1L).otherwise(0L))
            .as("alloc_cents"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // q187 — LAST-TOUCH ATTRIBUTION: each purchase's revenue credited
    // to the user's most recent click at-or-before it (24 h lookback;
    // outside the window → the unattributed bucket) — the marketing-
    // analytics join, planned as the carry-forward as-of rewrite (one
    // union + one key shuffle, q35's operator — never a per-purchase
    // range join), then rolled up to revenue by click hour-of-day.
    // The ORACLE computes the naive greatest-(t, id)-click-per-
    // purchase form, so the as-of rewrite's tie rules sit under the
    // hash.
    "q187_attribution" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          struct(col("event_id").as("id"), col("ts").as("t")).as("touch"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "cents")
      graft.pipeline.AsofJoin
        .backward(purchases, clicks, "user_id", col("ts"), col("ts"), "touch")
        .select(
          when(col("touch").isNotNull &&
            col("ts") - col("touch.t") <= 86400000000000L,
            expr("(touch.t % 86400000000000) div 3600000000000"))
            .otherwise(-1L).as("click_hour"),
          col("cents"))
        .groupBy("click_hour")
        .agg(count(lit(1)).as("n"), sum("cents").as("rev_cents"))
        .orderBy("click_hour")
    }),

    // q189 — CLAMPED BALANCE FOLD: the NON-LINEAR recurrence next to
    // q174's EMA — bal' = max(0, bal + δ), the no-negative-stock /
    // prepaid-balance rule. Clamping destroys the prefix-sum
    // decomposition (no window can express it), so it runs as the
    // same bounded per-entity ordered fold: purchases debit, other
    // events credit, all integer cents. One groupBy shuffle; the
    // fold is scan-side on the aggregated row.
    "q189_clamped_balance" -> ((s, d) => {
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "purchase",
            -round(col("value") * 100).cast("long"))
            .otherwise(round(col("value") * 100).cast("long")).as("delta"))
        .groupBy("user_id")
        .agg(sort_array(collect_list(
          struct(col("ts"), col("event_id"), col("delta")))).as("seq"))
        .select(col("user_id"), size(col("seq")).cast("long").as("n"),
          expr("aggregate(transform(seq, s -> s.delta), 0L, " +
            "(acc, x) -> greatest(0L, acc + x))").as("final_bal"))
        .orderBy("user_id")
    }),

    // q191 — FUNNEL LATENCY (time-to-convert distribution): for every
    // converting user, minutes from first view to the first purchase
    // STRICTLY after it — the latency percentiles growth teams read
    // next to q112's conversion counts. Two user-keyed partial-agg
    // passes (first-view, then conditional first-purchase — never a
    // window over the event stream); the distribution reduces over
    // |users| values (the q41 bounded-percentile contract), deltas in
    // exact integer minutes.
    "q191_funnel_latency" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
      val tv = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("tv"))
      val conv = ev.where(col("event_type") === "purchase")
        .join(tv, "user_id")
        .where(col("ts") > col("tv"))
        .groupBy("user_id").agg(min(col("ts") - col("tv")).as("delta_ns"))
        .select(expr("delta_ns div 60000000000").as("delta_min"))
      conv.agg(count(lit(1)).as("n_conv"),
        expr("sum(delta_min) div count(1)").as("mean_min"),
        floor(expr("percentile(delta_min, 0.5)") * 1000000)
          .cast("long").as("p50_micro"),
        floor(expr("percentile(delta_min, 0.9)") * 1000000)
          .cast("long").as("p90_micro"))
    }),

    // q192 — SHARE-OF-PARENT HIERARCHY ROLLUP: revenue shares along
    // region → nation → total (the drill-down report every BI layer
    // ships): leaf revenue is one partial-agg pass over the fact
    // join; parent totals aggregate the BOUNDED leaf table; shares
    // are exact integer micro via div. Dims broadcast; nothing but
    // the leaf aggregate shuffles twice.
    "q192_share_of_parent" -> ((s, d) => {
      val leaf = Tables.load(s, d, "orders")
        .select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .join(broadcast(Tables.load(s, d, "customer")
          .select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, d, "nation")
          .select("n_nationkey", "n_name", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")
          .select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum("cents").as("rev_cents"))
      val byRegion = leaf.groupBy("r_name")
        .agg(sum("rev_cents").as("region_cents"))
      val total = leaf.agg(sum("rev_cents").as("total_cents"))
      leaf.join(broadcast(byRegion), "r_name")
        .crossJoin(broadcast(total))
        .select(col("r_name"), col("n_name"), col("rev_cents"),
          expr("rev_cents * 1000000 div region_cents")
            .as("share_of_region_micro"),
          expr("region_cents * 1000000 div total_cents")
            .as("region_share_micro"))
        .orderBy("r_name", "n_name")
    }),

    // q194 — SAMPLE-RATIO-MISMATCH CHECK (experiment hygiene,
    // completing the family: q161 z-test, q175 CUPED): a broken
    // bucketing function silently biases every experiment, so the
    // platform's first gate is the chi-square of observed variant
    // counts against the expected 50/50 — per-USER counts (the
    // randomization unit), one partial-agg pass, the statistic a
    // pinned double over exact integers.
    "q194_srm_check" -> ((s, d) => {
      val one = events(s, d)
        .select(col("user_id")).distinct()
        .select((col("user_id") % 2).as("variant"))
        .groupBy("variant").agg(count(lit(1)).as("n"))
        .agg(sum(when(col("variant") === 0, col("n"))).as("n0"),
          sum(when(col("variant") === 1, col("n"))).as("n1"))
      val e = (col("n0") + col("n1")).cast("double") / 2.0
      one.select(col("n0"), col("n1"),
        round((col("n0").cast("double") - e) * (col("n0").cast("double") - e)
          / e +
          (col("n1").cast("double") - e) * (col("n1").cast("double") - e)
            / e, 6).as("chi2"),
        // chi2(1dof) > 3.841 ⇔ p < 0.05: the ship/no-ship flag
        (((col("n0").cast("double") - e) * (col("n0").cast("double") - e)
          / e +
          (col("n1").cast("double") - e) * (col("n1").cast("double") - e)
            / e) > 3.841).as("srm_flag"))
    }),

    // q195 — MUTUAL INFORMATION (dependency mining / feature
    // selection): MI(event_type; day-of-week) from the contingency
    // table — does behavior depend on weekday? Joint and marginal
    // counts are one partial-agg pass; each cell's term
    // c·(ln(c·N) − ln(r·s)) is exact-integer micro-log arithmetic
    // (the q114 KL machinery pointed at a different statistic), the
    // only division a single trailing integer div by N.
    "q195_mutual_info" -> ((s, d) => {
      val cells = events(s, d)
        .select(col("event_type"),
          ((expr("ts div 86400000000000") + 4) % 7).as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("c"))
      val rows = cells.groupBy("event_type").agg(sum("c").as("r"))
      val cols_ = cells.groupBy("dow").agg(sum("c").as("s"))
      val tot = cells.agg(sum("c").as("nn"))
      cells
        .join(broadcast(rows), "event_type")
        .join(broadcast(cols_), "dow")
        .crossJoin(broadcast(tot))
        .select((col("c") *
          (floor((log(col("c").cast("double")) +
            log(col("nn").cast("double"))) * 1000000).cast("long") -
            floor((log(col("r").cast("double")) +
              log(col("s").cast("double"))) * 1000000).cast("long")))
          .as("term"), col("nn"))
        .agg(expr("sum(term) div min(nn)").as("mi_micro"),
          count(lit(1)).as("n_cells"))
    }),

    // q196 — DAY-OVER-DAY BURN-RATE ALERTS: per-type daily volumes
    // with the previous day's ratio in exact integer micro and a
    // ±30% alert flag — the ops-monitoring sweep a pipeline runs on
    // its own outputs. Windows touch only the bounded (type, day)
    // aggregate; first days honestly carry NULL ratios.
    "q196_burn_rate" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("event_type").orderBy("day")
      events(s, d)
        .select(col("event_type"), expr("ts div 86400000000000").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        .withColumn("prev", lag(col("n"), 1).over(w))
        .select(col("event_type"), col("day"), col("n"),
          expr("n * 1000000 div prev").as("ratio_micro"),
          (col("prev").isNotNull &&
            (expr("n * 1000000 div prev") > 1300000L ||
              expr("n * 1000000 div prev") < 700000L)).as("alert"))
        .orderBy("event_type", "day")
    }),

    // q314 — PIVOT → UNPIVOT (melt) ROUND TRIP: the wide↔long
    // reshaping surface (Spark's native `Dataset.unpivot`, the SQL
    // UNPIVOT/pandas-melt role) under the gate — per-user event-type
    // counts pivoted to a wide matrix, melted back, zero-fill rows
    // dropped; the oracle is the DIRECT long-form aggregate, so any
    // column/value misalignment in either reshape hash-mismatches.
    // Plan: one partial-agg shuffle for the pivot (Spark folds the
    // pivot into the aggregate — values list is declared, no second
    // pass to discover it), melt is a scan-side explode.
    "q314_unpivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      events(s, d).groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .unpivot(Array(col("user_id")), types.map(col).toArray,
          "event_type", "n")
        .where(col("n") > 0)
        .orderBy("user_id", "event_type")
    }),

    // q315 — TIME-RANGE WINDOW FRAME: rolling 1-hour per-user volume
    // via a RANGE BETWEEN frame on the event-time axis (interval
    // frames, not row frames — the window form row counting can't
    // express; peers at the exact same timestamp are IN the frame by
    // SQL semantics, identical in both engines). Exact integer cents;
    // partitions bounded per user.
    "q315_range_frame" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy("user_id").orderBy(col("ts"))
        .rangeBetween(-3600L * 1000000000L, 0L)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h_cents", sum("cents").over(w))
        .select("user_id", "event_id", "n_1h", "sum_1h_cents")
        .orderBy("user_id", "event_id")
    }),

    // q324 — ACTIVITY STREAKS (gaps-and-islands): each user's longest
    // run of CONSECUTIVE active days — the classic islands idiom
    // (day − row_number is constant within an island), the
    // engagement metric behind every retention dashboard and distinct
    // from q92's gap sessions (calendar days, not event-time gaps).
    // One distinct (user, day) shuffle, windows bounded by ≤ 30 days
    // per user, ties broken to the EARLIEST streak.
    "q324_activity_streaks" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val days = events(s, d)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      days
        .withColumn("grp",
          col("day") - row_number().over(
            W.partitionBy("user_id").orderBy("day")))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
        .groupBy("user_id")
        .agg(max_by(struct(col("len"), col("start_day")),
          struct(col("len"), (-col("start_day")).as("ns"))).as("best"))
        .select(col("user_id"), col("best.len").as("streak_len"),
          col("best.start_day").as("streak_start_day"))
        .orderBy("user_id")
    }),

    // q319 — SIMPSON'S PARADOX AUDIT: does the per-segment winner
    // disagree with the aggregate winner? The classic confounding
    // screen run before trusting any A/B readout (q161's z-test says
    // "significant", this says "sliced by segment the sign FLIPS").
    // Success = cents ≥ 5000, variant = user_id % 2 (q194's
    // assignment), segments = event types. All comparisons are
    // cross-multiplied exact integers (a·n_b vs b·n_a — no rate
    // division decides anything; the micro rates are reporting
    // columns only). One partial-agg pass; segment grid bounded.
    // Degenerate-group guard: a segment missing one variant pivots to
    // n=0 (explicit otherwise(0), not NULL) so the winner comparisons
    // stay deterministic booleans, and a 0-denominator rate reports
    // the documented -1 sentinel — mirrored in the oracle, where
    // DuckDB would otherwise hard-error on the division.
    "q319_simpson_audit" -> ((s, d) => {
      val base = events(s, d)
        .select(col("event_type"), (col("user_id") % 2).as("variant"),
          when(round(col("value") * 100).cast("long") >= 5000L, 1L)
            .otherwise(0L).as("succ"))
      val seg = base.groupBy("event_type", "variant")
        .agg(count(lit(1)).as("n"), sum("succ").as("s"))
        .groupBy("event_type")
        .agg(sum(when(col("variant") === 0, col("n")).otherwise(0L)).as("n0"),
          sum(when(col("variant") === 0, col("s")).otherwise(0L)).as("s0"),
          sum(when(col("variant") === 1, col("n")).otherwise(0L)).as("n1"),
          sum(when(col("variant") === 1, col("s")).otherwise(0L)).as("s1"))
      val tot = seg.agg(sum("n0").as("tn0"), sum("s0").as("ts0"),
        sum("n1").as("tn1"), sum("s1").as("ts1"))
      // every product is decimal(38,0) (HUGEINT in the oracle): the
      // cross-multiplied winner tests are counts × counts — 64-bit
      // products wrap silently past ~3·10⁹ rows per cell, exactly the
      // petabyte regime the cross-multiplication exists for
      seg.crossJoin(broadcast(tot))
        .select(col("event_type"),
          expr("case when n0 > 0 then " +
            "cast(cast(s0 as decimal(38,0)) * 1000000 div n0 as bigint) " +
            "else -1 end").as("rate0_micro"),
          expr("case when n1 > 0 then " +
            "cast(cast(s1 as decimal(38,0)) * 1000000 div n1 as bigint) " +
            "else -1 end").as("rate1_micro"),
          expr("cast(s1 as decimal(38,0)) * n0 > " +
            "cast(s0 as decimal(38,0)) * n1").as("seg_v1_wins"),
          expr("cast(ts1 as decimal(38,0)) * tn0 > " +
            "cast(ts0 as decimal(38,0)) * tn1").as("overall_v1_wins"),
          expr("(cast(s1 as decimal(38,0)) * n0 > " +
            "cast(s0 as decimal(38,0)) * n1) != " +
            "(cast(ts1 as decimal(38,0)) * tn0 > " +
            "cast(ts0 as decimal(38,0)) * tn1)").as("reversed"))
        .orderBy("event_type")
    }),

    // q320 — A/B POWER ANALYSIS (required sample size): the question
    // every experiment starts with — how many observations per arm to
    // detect a 5.00 lift at α = 0.05 (two-sided) and power 0.8?
    // n = 2(z_α/2 + z_β)²·σ²/δ², computed EXACTLY: the z factor is
    // the pinned integer literal (1.959964 + 0.841621 in micros,
    // squared once in Scala), σ² stays the exact rational
    // (nΣx² − (Σx)²)/(n(n−1)) — n, Σx, Σx² are cast to decimal(38,0)
    // BEFORE every multiplication (the oracle mirrors with HUGEINT),
    // so no 64-bit product can silently wrap where DuckDB would error:
    // both engines share the same exact 38-digit integer domain. One
    // bounded per-type aggregate.
    "q320_power_analysis" -> ((s, d) => {
      // the ACCUMULATORS are decimal too, not just the closing
      // products: sum(c·c) in BIGINT wraps once n·c̄² crosses 2⁶³ —
      // with $1000 events (c² = 10¹⁰) that is ~10⁹ rows per type,
      // i.e. ~100 GB, far below the design point. decimal(38,0)
      // partial aggs merge exactly; the oracle accumulates
      // SUM(c::HUGEINT · c) in lockstep
      events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(c as decimal(38,0))")).as("sx"),
          sum(expr("cast(c as decimal(38,0)) * c")).as("sxx"))
        .withColumn("nD", expr("cast(n as decimal(38,0))"))
        .withColumn("num",
          expr("nD * cast(sxx as decimal(38,0)) - " +
            "cast(sx as decimal(38,0)) * cast(sx as decimal(38,0))"))
        .withColumn("den", expr("nD * cast(n - 1 as decimal(38,0))"))
        .select(col("event_type"), col("n"),
          expr("cast(sx div n as bigint)").as("mean_cents_floor"),
          expr("cast(num div den as bigint)").as("var_floor"),
          // ceil( 2·Z²·num / (den·δ²·10¹²) ), δ = 500 cents
          expr(s"cast((2 * cast(${PowerZ2}L as decimal(38,0)) * num + " +
            "den * 250000 * cast(1000000000000 as decimal(38,0)) - 1) div " +
            "(den * 250000 * cast(1000000000000 as decimal(38,0))) " +
            "as bigint)").as("n_required"))
        .orderBy("event_type")
    }),

    // q327 — MANN-WHITNEY U (rank-sum test): the nonparametric
    // two-sample comparison next to q161's z-test — does variant 1's
    // value DISTRIBUTION stochastically dominate variant 0's, without
    // any normality assumption? Computed scale-correctly on the
    // (type, cents) VALUE-DOMAIN histogram (the q316 move — a per-row
    // rank window would sort whole types; here one row per distinct
    // cents value, bounded windows): doubled midranks 2·below+ties+1
    // keep tie-averaged ranks in exact integers, U₁ reported as
    // 2U₁ = ΣR₁ₓ₂ − n₁(n₁+1), and the rank-biserial effect size is
    // the exact AUC = U₁/(n₀·n₁) in integer micros. decimal(38)
    // products (the q320 contract) so nothing wraps at corpus scale.
    "q327_mann_whitney" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val hist = events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          (col("user_id") % 2).as("v"))
        .groupBy("event_type", "cents")
        .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("v") === 1, 1L).otherwise(0L)).as("c1"))
      val wb = W.partitionBy("event_type").orderBy("cents")
        .rowsBetween(W.unboundedPreceding, -1)
      hist
        .withColumn("below", coalesce(sum(col("c0") + col("c1")).over(wb),
          lit(0L)))
        .withColumn("mr2", lit(2L) * col("below") + col("c0") + col("c1")
          + 1L)
        .groupBy("event_type")
        .agg(sum("c0").as("n0"), sum("c1").as("n1"),
          sum(expr("c1 * cast(mr2 as decimal(38,0))")).as("r1d"))
        .select(col("event_type"), col("n0"), col("n1"),
          expr("cast(r1d - cast(n1 as decimal(38,0)) * (n1 + 1) " +
            "as bigint)").as("u1_x2"),
          expr("cast(case when n0 > 0 and n1 > 0 then " +
            "(r1d - cast(n1 as decimal(38,0)) * (n1 + 1)) * 1000000 div " +
            "(2 * cast(n0 as decimal(38,0)) * n1) else -1 end as bigint)")
            .as("auc_micro"))
        .orderBy("event_type")
    }),

    // q328 — KOLMOGOROV-SMIRNOV TWO-SAMPLE STATISTIC: the
    // distribution-equality screen next to q327's location test — the
    // max ECDF gap between the two variants, per event type. Same
    // value-domain histogram plan; the gap is the CROSS-MULTIPLIED
    // integer |cum₀·n₁ − cum₁·n₀| (no rate division decides anything),
    // D in integer micros = max·10⁶ div (n₀·n₁), and the location of
    // the max (smallest cents achieving it — a deterministic argmax)
    // rides along. decimal(38) products throughout.
    "q328_ks_two_sample" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val hist = events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          (col("user_id") % 2).as("v"))
        .groupBy("event_type", "cents")
        .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("v") === 1, 1L).otherwise(0L)).as("c1"))
      val wc = W.partitionBy("event_type").orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
      val wt = W.partitionBy("event_type")
      val gaps = hist
        .withColumn("cum0", sum("c0").over(wc))
        .withColumn("cum1", sum("c1").over(wc))
        .withColumn("n0", sum("c0").over(wt))
        .withColumn("n1", sum("c1").over(wt))
        .withColumn("gap", abs(expr("cum0 * cast(n1 as decimal(38,0)) " +
          "- cum1 * cast(n0 as decimal(38,0))")))
      gaps.withColumn("mx", max("gap").over(wt))
        .groupBy("event_type")
        .agg(max("n0").as("n0"), max("n1").as("n1"),
          max("gap").as("dnum"),
          min(when(col("gap") === col("mx"), col("cents")))
            .as("ks_at_cents"))
        .select(col("event_type"), col("n0"), col("n1"),
          expr("cast(case when n0 > 0 and n1 > 0 then dnum * 1000000 div " +
            "(cast(n0 as decimal(38,0)) * n1) else -1 end as bigint)")
            .as("d_micro"),
          col("ks_at_cents"))
        .orderBy("event_type")
    }),

    // q336 — QQ SHIFT TABLE (quantile treatment effects): WHERE in
    // the distribution does variant 1 differ from variant 0 — the
    // per-percentile complement to q328's single KS number and q327's
    // single location test (a tail-only lift is invisible to a mean
    // test and unlocated by KS). Lower weighted percentiles at the
    // 5%..95% grid from the (type, variant, cents) histogram: q_k =
    // min cents with 20·cum ≥ k·tot (division-free, exact integers),
    // computed for all 19 cuts in ONE pass by joining the cumulative
    // cells against the broadcast 19-row grid — bounded-domain
    // windows, never a per-row sort.
    "q336_qq_shift" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val hist = events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          (col("user_id") % 2).as("v"))
        .groupBy("event_type", "v", "cents").agg(count(lit(1)).as("w"))
      val wc = W.partitionBy("event_type", "v").orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
      val wt = W.partitionBy("event_type", "v")
      val cum = hist
        .withColumn("cum", sum("w").over(wc))
        .withColumn("tot", sum("w").over(wt))
      val ks = s.range(1, 20).select(col("id").as("k"))
      val qs = cum.join(broadcast(ks), expr("cum * 20 >= k * tot"))
        .groupBy("event_type", "v", "k").agg(min("cents").as("q"))
      qs.groupBy("event_type", "k")
        .agg(max(when(col("v") === 0, col("q"))).as("q0_cents"),
          max(when(col("v") === 1, col("q"))).as("q1_cents"))
        .select(col("event_type"), (col("k") * 5).as("pct"),
          col("q0_cents"), col("q1_cents"),
          (col("q1_cents") - col("q0_cents")).as("shift_cents"))
        .orderBy("event_type", "pct")
    }),

    // q316 — ECDF / RANK TABLE: per-type empirical CDF and
    // percent-rank over the VALUE DOMAIN, not the row stream — the
    // scale-correct form of cume_dist/percent_rank (a per-row window
    // would sort whole types; the histogram form shuffles one row per
    // (type, cents) and cums over the bounded distinct-value domain).
    // Exact integers: cume = cum·10⁶ div n, percent_rank =
    // (rank_min−1)·10⁶ div (n−1) with rank_min = 1 + count-below —
    // SQL window semantics reproduced on the weighted domain. The
    // n−1 denominator is greatest(n−1, 1): a single-row type reports
    // percent_rank 0 (the SQL convention) instead of Spark-NULL vs
    // DuckDB-error divergence.
    "q316_ecdf_ranks" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val hist = events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "cents").agg(count(lit(1)).as("w"))
      val wc = W.partitionBy("event_type").orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
      val wt = W.partitionBy("event_type")
      hist
        .withColumn("cum", sum("w").over(wc))
        .withColumn("n", sum("w").over(wt))
        .select(col("event_type"), col("cents"), col("w"),
          expr("cum * 1000000 div n").as("cume_micro"),
          expr("(cum - w) * 1000000 div greatest(n - 1, 1)")
            .as("prank_micro"))
        .orderBy("event_type", "cents")
    }),

    // q317 — SIMPLE EXPONENTIAL SMOOTHING (the forecasting fold under
    // q276's MASE eval): per-type daily revenue smoothed at α = 0.3 —
    // s₁ = x₁, s_t = α·x_t + (1−α)·s_{t−1}, unrolled to the exact
    // weighted sum s_t = x₁·0.7^(t−1) + Σ α·0.7^(t−i)·x_i. BOTH
    // weight ladders are PINNED nano-scale integer literals
    // interpolated into both engines (⌊0.3·0.7^k·10⁹⌋ / ⌊0.7^k·10⁹⌋ —
    // no runtime pow crosses the gate); the fold is an exact integer
    // triangular join over the BOUNDED per-type day table (≤ 30² rows
    // per type — the corpus aggregates once, the recurrence never
    // sees event rows). Series indexed by observed-day rank, the
    // standard irregular-series convention.
    "q317_exp_smoothing" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val daily = events(s, d)
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "day").agg(sum("cents").as("x"))
        .withColumn("idx", row_number().over(
          W.partitionBy("event_type").orderBy("day")))
      val wSm = array(SesSmoothW.map(lit): _*)
      val wIn = array(SesInitW.map(lit): _*)
      val l = daily.toDF("event_type", "day", "x", "idx")
      val r = daily.select(col("event_type"), col("x").as("xi"),
        col("idx").as("i"))
      l.join(r, Seq("event_type"))
        .where(col("i") <= col("idx"))
        .withColumn("term", when(col("i") === 1,
          col("xi") * element_at(wIn, (col("idx") - col("i") + 1).cast("int")))
          .otherwise(
            col("xi") * element_at(wSm, (col("idx") - col("i") + 1).cast("int"))))
        .groupBy("event_type", "day", "x")
        .agg(expr("sum(term) div 1000").as("ses_micro"))
        .orderBy("event_type", "day")
    }),

    // q197 — WEIGHTED MEDIAN: the robust weighted center (median
    // where each row counts `weight` times) Spark has no built-in
    // for — lower weighted median = the smallest value whose running
    // weight reaches half the total. Per-type value rollup first
    // (the only event-volume shuffle), then cumulative weights over
    // the BOUNDED per-type value domain; all-integer comparisons
    // (2·cum ≥ tot avoids the halving division).
    "q197_weighted_median" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val vals = events(s, d)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("event_type", "cents").agg(count(lit(1)).as("wt"))
      val wc = W.partitionBy("event_type").orderBy("cents")
        .rowsBetween(W.unboundedPreceding, 0)
      val wt = W.partitionBy("event_type")
      vals
        .withColumn("cum", sum("wt").over(wc))
        .withColumn("tot", sum("wt").over(wt))
        .where(col("cum") * 2 >= col("tot"))
        .groupBy("event_type")
        .agg(min("cents").as("wmedian_cents"), min("tot").as("total_wt"))
        .orderBy("event_type")
    }),

    // q198 — BENFORD FIRST-DIGIT AUDIT: the fraud/synthetic-data
    // screen — observed first-significant-digit shares of the value
    // column against Benford's log10(1+1/d) expectation, deviations
    // in exact integer micro, the max-deviation digit called out.
    // One digit-extraction scan (string form of |cents| — abs first,
    // so negative values contribute their significant digit instead
    // of a sign character that Spark would NULL-cast and DuckDB would
    // reject), a 9-row aggregate, broadcast total. The nine Benford
    // expectations ⌊log10(1+1/d)·10⁶⌋ are PINNED literals interpolated
    // into both engines (the q240/q256 convention) — `Math.log` is not
    // correctly-rounded, so a runtime log crossing the gate is a
    // latent cross-platform hash break even when both engines' libm
    // agree today.
    "q198_benford_audit" -> ((s, d) => {
      val digits = events(s, d)
        .select(substring(abs(round(col("value") * 100).cast("long"))
          .cast("string"), 1, 1).cast("long").as("digit"))
        .where(col("digit") >= 1)
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum("n").as("tot"))
      val benford = array(BenfordMicro.map(lit): _*)
      digits.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("n * 1000000 div tot").as("share_micro"),
          element_at(benford, col("digit").cast("int")).as("benford_micro"))
        .withColumn("dev_micro",
          abs(col("share_micro") - col("benford_micro")))
        .orderBy("digit")
    }),

    // q127 — SCD2 BUILD: the signup change stream versioned into
    // half-open validity intervals per user (the warehouse
    // dimension-table shape; Iceberg/Delta users materialize exactly
    // this from CDC feeds before point-in-time joins). One key
    // shuffle + a lead() window bounded by per-user version count —
    // see Scd2.build for the scale argument. `attr` rounds at 6 dp
    // (single stored double, no arithmetic accumulation).
    "q127_scd2_build" -> ((s, d) =>
      Scd2.build(dimChanges(s, d), "user_id", "ts", Seq("attr"))
        .select(col("user_id"), round(col("attr"), 6).as("attr"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy("user_id", "valid_from")),

    // q128 — TEMPORAL JOIN (point-in-time): every purchase enriched
    // with the profile version valid at purchase time. Planned as
    // union + carry-forward (ONE key shuffle, no interval range
    // join — Scd2.temporalJoin documents why that is safe); the
    // ORACLE deliberately computes the INTERVAL form (valid_from <=
    // t < valid_to over the SQL-built SCD2) so the gate proves the
    // as-of rewrite ≡ interval semantics, purchases before any
    // version keeping NULL attrs.
    "q128_temporal_join" -> ((s, d) => {
      val facts = events(s, d)
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Scd2.temporalJoin(facts, dimChanges(s, d), "user_id",
          col("ts"), col("ts"), "attr")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("attr"), 6).as("attr"))
        .orderBy("event_id")
    }),

    // q132 — ROLLING 7-DAY DISTINCT USERS (sliding-window distinct):
    // the weekly-active metric. Distinct-over-a-sliding-frame has no
    // partial aggregate, so the scalable shape is: collapse to
    // distinct (user, day) FIRST (one partial-agg shuffle — the only
    // one that sees event volume), then fan each row out to the <= 7
    // window days it contributes to (bounded ×7, the q44 sliding
    // expansion in batch), then count-distinct per window day. The
    // observed-days filter broadcasts (|days| rows). The oracle is
    // the direct interval-join formulation — independent of the
    // fan-out trick.
    "q132_rolling_distinct" -> ((s, d) => {
      val ud = events(s, d)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      val days = ud.select(col("day")).distinct()
      ud.select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("day"))
        .join(broadcast(days), "day")
        .groupBy("day")
        .agg(countDistinct("user_id").as("dau7"))
        .orderBy("day")
    }),

    // q134 — DEAD-LETTER ROUTING: malformed records diverted, never
    // dropped silently, never failing the job — the ingest contract
    // every production pipeline needs (Flink side outputs / Kafka
    // Connect DLQ topics). A deterministic corruption (event_id % 7
    // == 3 prepends garbage) makes the fixture self-describing: the
    // REAL `from_json` PERMISSIVE parse with
    // columnNameOfCorruptRecord must route exactly the constructed-
    // bad lines to 'dlq' and parse every other line — the oracle
    // recomputes the routing from the construction rule alone, so a
    // parser that accepts a malformed line (or rejects a valid one)
    // hash-mismatches. Pure scan-side; one bounded 2-row rollup.
    "q134_dlq_routing" -> ((s, d) => {
      val raw = events(s, d).select(
        col("event_id"),
        when(col("event_id") % 7 === 3,
          concat(lit("{bad"), col("props")))
          .otherwise(to_json(struct(col("event_id"),
            expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"))))
          .as("line"))
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("k", IntegerType),
        StructField("_corrupt", StringType)))
      val opts = Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt")
      raw
        .select(from_json(col("line"), schema, opts).as("r"))
        .select(
          when(col("r._corrupt").isNotNull, "dlq").otherwise("ok").as("route"),
          col("r.k").as("k"))
        .groupBy("route")
        .agg(count(lit(1)).as("n"), sum("k").as("k_sum"))
        .orderBy("route")
    }),

    // q135 — KEY-SKEW DIAGNOSTIC: the distribution report that decides
    // salting/AQE-skew settings before a big shuffle — per-key counts
    // reduced to max/min/percentiles and a max-vs-mean skew ratio.
    // Per-key counts are one partial-agg pass; every statistic runs on
    // the |keys|-row aggregate. All-integer arithmetic (ratio in
    // micro units via exact integer division; percentiles hit exact
    // ranks on |keys| values) keeps both engines bit-identical.
    "q135_skew_stats" -> ((s, d) => {
      val cnt = events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
      cnt.agg(
          count(lit(1)).as("n_keys"),
          sum("c").as("total"),
          max("c").as("max_c"),
          min("c").as("min_c"),
          floor(expr("percentile(c, 0.5)") * 1000000).cast("long").as("p50_micro"),
          floor(expr("percentile(c, 0.9)") * 1000000).cast("long").as("p90_micro"))
        .withColumn("skew_micro",
          expr("(max_c * n_keys * 1000000) div total"))
    }),

    // q136 — TRIANGLE COUNTING on the nation trade graph (q115's
    // edge build, undirected): the clustering-coefficient/community
    // primitive PageRank doesn't cover. Counted by DEGREE-ORIENTED
    // wedge closure (the standard distributed algorithm): orient
    // every edge from its (degree, id)-smaller endpoint, pair
    // out-edges per source into wedges — Σ d_out² bounded by m^1.5
    // under this orientation, never the naive Σ d² a hub would
    // explode — and close each wedge with one hash join back against
    // the canonical edge set. Each triangle counts exactly once (its
    // order-smallest vertex owns it). The fact-table work is the same
    // broadcast-dim join q115 pins; everything after aggregates
    // |nations|²-bounded edges. The ORACLE is the naive a<b<c triple
    // self-join — proving the orientation trick loses/double-counts
    // nothing.
    "q136_triangle_count" -> ((s, d) => {
      val und = tradeEdges(s, d)
      val deg = und.select(col("lo").as("n"))
        .unionByName(und.select(col("hi").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val loFirst = // lo precedes hi in the (degree, id) total order
        und.join(broadcast(deg.toDF("lo", "dlo")), "lo")
          .join(broadcast(deg.toDF("hi", "dhi")), "hi")
          .withColumn("lo_first",
            col("dlo") < col("dhi") ||
              (col("dlo") === col("dhi") && col("lo") < col("hi")))
      val oriented = loFirst.select(
        when(col("lo_first"), col("lo")).otherwise(col("hi")).as("src"),
        when(col("lo_first"), col("hi")).otherwise(col("lo")).as("dst"))
      val wedges = oriented.toDF("src", "b")
        .join(oriented.toDF("src", "c"), "src")
        .where(col("b") < col("c"))
      wedges.join(und.toDF("b", "c"), Seq("b", "c"))
        .agg(count(lit(1)).as("triangles"))
    }),

    // q137 — SKETCH SET ALGEBRA: exact user-set sizes for two event
    // cohorts plus union and (inclusion-exclusion) intersection,
    // hashed; the HLL++ estimates of the same four quantities
    // asserted in-band as gated booleans (the q21 pattern — per
    // round-6 advice the bands are deliberately wide multiples of the
    // configured rsd, so a red flag means sketch DRIFT, not noise:
    // union/singles at 3·rsd, the differenced intersection at
    // 3·rsd·(|A|+|B|+|A∪B|) since subtraction compounds the three
    // absolute errors). One pass over the fact table; conditional
    // countDistinct plans as the standard two-level distinct
    // aggregate.
    "q137_hll_set_ops" -> ((s, d) => {
      val isA = col("event_type") === "view"
      val isB = col("event_type") === "purchase"
      val u = col("user_id")
      events(s, d)
        .agg(
          countDistinct(when(isA, u)).as("ua"),
          countDistinct(when(isB, u)).as("ub"),
          countDistinct(when(isA || isB, u)).as("uu"),
          approx_count_distinct(when(isA, u)).as("ea"),
          approx_count_distinct(when(isB, u)).as("eb"),
          approx_count_distinct(when(isA || isB, u)).as("eu"))
        .withColumn("ui", col("ua") + col("ub") - col("uu"))
        .withColumn("ei", col("ea") + col("eb") - col("eu"))
        .select(col("ua"), col("ub"), col("uu"), col("ui"),
          (abs(col("ea") - col("ua")) <= col("ua") * 0.15 + 1).as("est_ok_a"),
          (abs(col("eb") - col("ub")) <= col("ub") * 0.15 + 1).as("est_ok_b"),
          (abs(col("eu") - col("uu")) <= col("uu") * 0.15 + 1).as("est_ok_u"),
          (abs(col("ei") - col("ui")) <=
            (col("ua") + col("ub") + col("uu")) * 0.15 + 1).as("est_ok_i"))
    }),

    // q138 — ANALYZE-style COLUMN STATISTICS: per-column row/null/NDV
    // counts and min/max in ONE pass over the table — the stats a
    // cost-based optimizer (and a data-quality monitor) needs.
    // Multiple exact NDVs in one aggregation plan via Spark's Expand
    // (one fact-table scan fans into the per-column distinct domains
    // — the q109 grouping-sets machinery reused by multi-distinct
    // aggregation); the 1-row result then melts to one row per
    // column scan-side. Doubles fold to integer micro before min/max
    // so the stringified extremes are engine-exact.
    "q138_analyze_stats" -> ((s, d) => {
      val ev = events(s, d)
        .withColumn("vm", floor(col("value") * 1000000).cast("long"))
      val cols = Seq("event_id", "user_id", "event_type", "ts", "vm", "props")
      val aggs = cols.flatMap { cn =>
        Seq(
          sum(when(col(cn).isNull, 1L).otherwise(0L)).as(s"nn_$cn"),
          countDistinct(col(cn)).as(s"ndv_$cn"),
          min(col(cn)).cast("string").as(s"min_$cn"),
          max(col(cn)).cast("string").as(s"max_$cn"))
      }
      val one = ev.agg(count(lit(1)).as("n"), aggs: _*)
      // melt via explode ABOVE the aggregate — a union of per-column
      // selects gets pushed through it and plans as six independent
      // aggregates, i.e. six scans of the fact table
      one.select(explode(array(cols.map { cn =>
          struct(lit(cn).as("col_name"), col("n"),
            col(s"nn_$cn").as("n_null"), col(s"ndv_$cn").as("ndv"),
            col(s"min_$cn").as("min_s"), col(s"max_$cn").as("max_s"))
        }: _*)).as("r"))
        .select("r.*").orderBy("col_name")
    }),

    // q233 — POISSON BOOTSTRAP confidence intervals: THE resampling
    // method that actually works on distributed data (per-row
    // independent Poisson(1) weights ≈ multinomial resampling without
    // coordinating a global draw — the streaming/Spark bootstrap
    // standard). 32 replicas materialize scan-side (sequence explode,
    // a fixed ×32 fan-out collapsed by the partial agg); each row's
    // replica weight is the Poisson(1) inverse CDF applied to an
    // md5-uniform — the CDF thresholds are pinned 2³²-scale integer
    // literals, so the draw is seedless, executor-reproducible, and
    // engine-exact (weights capped at 8; P(>8) < 1e-6, documented).
    // Per-type replica means in integer cents (truncating div), CI =
    // the 2nd and (n−1)th order statistics of the 32 means — a ~94%
    // interval — picked by rank over the 32-row-per-type table
    // (bounded window). At petabyte row counts sum(w·cents) wants
    // decimal(38); at the harness scale int64 has 7 digits of
    // headroom.
    "q233_poisson_bootstrap" -> ((s, d) => {
      val thresholds = Seq(1580030168L, 3160060337L, 3950075421L,
        4213413783L, 4279248373L, 4292415291L, 4294609777L, 4294923276L)
      val ev = events(s, d).select(col("event_type"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      val rep = ev
        .select(col("event_type"), col("cents"), col("event_id"),
          explode(sequence(lit(0), lit(31))).as("r"))
        .withColumn("u", conv(substring(md5(concat(lit("bs:"),
          col("event_id").cast("string"), lit(":"),
          col("r").cast("string"))), 1, 8), 16, 10).cast("long"))
        .withColumn("w", thresholds.foldLeft(lit(0L)) { (acc, th) =>
          acc + when(col("u") >= th, 1L).otherwise(0L) })
      val means = rep.groupBy("event_type", "r")
        .agg(sum(col("w") * col("cents")).as("swc"), sum("w").as("sw"))
        .where(col("sw") > 0)
        .select(col("event_type"), col("r"), expr("swc div sw").as("m"))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("m"), col("r"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val base = ev.groupBy("event_type")
        .agg(expr("sum(cents) div count(1)").as("mean_cents"))
      means
        .withColumn("rk", row_number().over(wr))
        .withColumn("nr", count(lit(1)).over(wn))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_reps"),
          max(when(col("rk") === 2, col("m"))).as("lo_cents"),
          max(when(col("rk") === col("nr") - 1, col("m"))).as("hi_cents"))
        .join(base, "event_type")
        .select(col("event_type"), col("n_reps"), col("mean_cents"),
          col("lo_cents"), col("hi_cents"))
        .orderBy("event_type")
    }),

    // q236 — EXACT AUC (Mann–Whitney): the classifier-evaluation
    // primitive — does the value score separate purchases from
    // clicks? AUC computed exactly from the rank-sum identity with
    // the standard tie correction: over distinct scores,
    // 2U = Σ_c n_pos(c)·(2·n_neg(<c) + n_neg(=c)), AUC = 2U/(2·P·N).
    // Everything is integer: the only division is the final
    // truncating micro div, so no float ranking/averaging crosses
    // engines. Plan: ONE partial-agg groupBy builds the per-cents
    // histogram (bounded by the VALUE DOMAIN — ≤ ~50k cells here,
    // ≤ |domain| always — never row count), the cumulative-negatives
    // window and the closing fold run on that bounded table. Products
    // n_pos·n_neg_below reach (rows)² at petabyte counts, so the sum
    // runs in decimal(38) (HUGEINT in the oracle); only the final
    // micro ratio is emitted as int64.
    "q236_exact_auc" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
      events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select(expr("cast(round(value * 100) as bigint)").as("cents"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("cents")
        .agg(sum("y").as("np"), sum(lit(1L) - col("y")).as("nn"))
        .withColumn("cum_nn", coalesce(sum("nn").over(w), lit(0L)))
        .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
          sum(expr("cast(np as decimal(38,0)) * (2 * cum_nn + nn)"))
            .as("two_u"))
        .select(col("n_pos"), col("n_neg"),
          expr("cast(two_u * 1000000 div (2 * cast(n_pos as decimal(38,0)) " +
            "* n_neg) as bigint)").as("auc_micro"))
    }),

    // q237 — CALIBRATION CURVE + BRIER SCORE: reliability diagnostics
    // for a probabilistic scorer (here: a fixed logistic-shaped
    // propensity p = hardσ((cents − 25000)/20000) in integer micros —
    // hardσ(z) = clamp(z/4 + ½, 0, 1), the piecewise-linear sigmoid
    // that keeps every engine's arithmetic identical; q235 trains
    // weights for the same link). Ten equal-width probability bins;
    // per bin: n, mean predicted p, observed positive rate, and the
    // bin's Brier contribution Σ(p − y)² — all integer micros with
    // truncating div last. Plan: scan-side projection, ONE partial-agg
    // shuffle of ≤ 10 cells; the squared-error sum runs in
    // decimal(38) (micro² per row ≈ 1e12) and collapses to int64
    // after the per-bin division.
    "q237_calibration_brier" -> ((s, d) => {
      events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select(expr("cast(round(value * 100) as bigint)").as("cents"),
          when(col("event_type") === "purchase", 1000000L)
            .otherwise(0L).as("ym"))
        .withColumn("p_micro",
          least(greatest(expr("(cents - 25000) * 1000000 div 20000 div 4 " +
            "+ 500000"), lit(0L)), lit(1000000L)))
        .withColumn("bin", least(expr("p_micro div 100000"), lit(9L)))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          expr("sum(p_micro) div count(1)").as("mean_p_micro"),
          expr("sum(ym) div count(1)").as("pos_rate_micro"),
          expr("cast(sum(cast(p_micro - ym as decimal(38,0)) " +
            "* (p_micro - ym)) div (count(1) * 1000000) as bigint)")
            .as("brier_micro"))
        .orderBy("bin")
    }),

    // q238 — TWO-SAMPLE KOLMOGOROV–SMIRNOV: the rank-based drift test
    // beside q223's binned PSI — D = max_x |F_purchase(x) − F_click(x)|
    // needs no binning choice and catches shape changes PSI's fixed
    // bins wash out. Exact rational arithmetic: D's numerator is
    // max |cum1·n2 − cum2·n1| over distinct cents (products in
    // decimal(38) — cum·n is rows² at scale), the micro ratio divides
    // once at the end; at_cents reports the smallest cents achieving
    // the max (deterministic argmax tie-break). Same bounded-histogram
    // plan as q236: one partial-agg groupBy, windows and the closing
    // fold on the ≤|domain| cell table.
    "q238_ks_test" -> ((s, d) => {
      val wCum = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select(expr("cast(round(value * 100) as bigint)").as("cents"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("cents")
        .agg(sum("y").as("c1"), sum(lit(1L) - col("y")).as("c2"))
        .withColumn("cum1", sum("c1").over(wCum))
        .withColumn("cum2", sum("c2").over(wCum))
        .withColumn("n1", sum("c1").over(wAll))
        .withColumn("n2", sum("c2").over(wAll))
        .withColumn("diffn", expr("abs(cast(cum1 as decimal(38,0)) * n2 " +
          "- cast(cum2 as decimal(38,0)) * n1)"))
        .withColumn("dmax", max("diffn").over(wAll))
        .agg(max("n1").as("n1"), max("n2").as("n2"),
          expr("cast(max(dmax) * 1000000 div " +
            "(cast(max(n1) as decimal(38,0)) * max(n2)) as bigint)")
            .as("ks_micro"),
          min(when(col("diffn") === col("dmax"), col("cents")))
            .as("at_cents"))
        .select("n1", "n2", "ks_micro", "at_cents")
    }),

    // q251 — WEIGHTED HITS HUBS & AUTHORITIES (Kleinberg): the
    // directed-graph centrality pair beside q115's PageRank — on the
    // supplier→customer nation trade graph with lineitem-count edge
    // weights, a good HUB ships heavily to good authorities and a
    // good AUTHORITY receives heavily from good hubs (the mutual-
    // reinforcement fixed point PageRank's single score cannot
    // express; weights matter because the unweighted nation graph is
    // near-complete and would converge to the uniform fixed point).
    // 4 synchronous rounds in integer micros with q224's
    // renormalize-each-round discipline (raw·n·10⁶ div rawSum via
    // BigInt/HUGEINT — raw·target reaches ~10²² — then ≥1 clamps);
    // the edge build is the measured q115/q136 shape (fact scan + two
    // broadcast dims, partial-agg to ≤|nations|² weighted cells) and
    // the fixed point runs on that bounded matrix (the q224 contract
    // — nodes are nations/domains, leaderboard-sized at any corpus
    // scale). The oracle replays all 4 rounds as an unrolled
    // MATERIALIZED CTE chain, so the iteration arithmetic itself is
    // gated.
    "q251_hits_scores" -> ((s, d) => {
      val l = Tables.load(s, d, "lineitem").select("l_orderkey", "l_suppkey")
      val o = Tables.load(s, d, "orders").select("o_orderkey", "o_custkey")
      val c = Tables.load(s, d, "customer").select("c_custkey", "c_nationkey")
      val su = Tables.load(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val edges = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .where(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").cast("long").as("src"),
          col("c_nationkey").cast("long").as("dst"))
        .agg(count(lit(1)).as("w"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // bounded by design: ≤|nations|² weighted edges
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val n = nodes.length.toLong
      val target = n * 1000000L
      def renorm(raw: Map[Long, Long]): Map[Long, Long] = {
        val s0 = raw.values.map(BigInt(_)).sum
        raw.map { case (k, v) =>
          k -> math.max((BigInt(v) * target / s0).toLong, 1L)
        }
      }
      var h = nodes.map(_ -> 1000000L).toMap
      var a = Map.empty[Long, Long]
      for (_ <- 1 to 4) {
        a = renorm(nodes.map(k => k -> math.max(
          edges.filter(_._2 == k).map(e => e._3 * h(e._1)).sum, 1L)).toMap)
        h = renorm(nodes.map(k => k -> math.max(
          edges.filter(_._1 == k).map(e => e._3 * a(e._2)).sum, 1L)).toMap)
      }
      import s.implicits._
      nodes.map(k => (k, h(k), a(k))).toSeq
        .toDF("n_key", "hub_micro", "auth_micro")
        .orderBy("n_key")
    }),

    // q252 — LEAVE-ONE-OUT TARGET ENCODING: the leakage-safe
    // categorical feature encoder (the Kaggle/CTR standard): encode
    // each event's type by the mean target of the OTHER members of
    // its category — (Σ_type − own) div (n_type − 1) — so a row never
    // sees its own label (naive mean encoding leaks the target into
    // the feature; q229's hygiene argument at the feature level).
    // Singleton categories fall back to the leave-one-out GLOBAL
    // mean, keeping the encoder total. Exact integer cents with
    // truncating division; plan is one |types|-row partial agg
    // broadcast back over the scan plus a 1-row global aggregate —
    // the corpus is touched once and never shuffles on the category.
    "q252_target_encoding" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_id"), col("event_type"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      val stats = ev.groupBy("event_type")
        .agg(sum("cents").as("tsum"), count(lit(1)).as("tn"))
      val g = ev.agg(sum("cents").as("gsum"), count(lit(1)).as("gn"))
      ev.join(broadcast(stats), "event_type")
        .crossJoin(broadcast(g))
        .select(col("event_id"), col("event_type"), col("cents"),
          expr("case when tn = 1 then (gsum - cents) div (gn - 1) " +
            "else (tsum - cents) div (tn - 1) end").as("loo_cents"),
          expr("tsum div tn").as("naive_cents"))
        .orderBy("event_id")
    }),

    // q253 — PROPENSITY-SCORE CALIPER MATCHING: the causal-inference
    // design step beside q161's z-test and q175's CUPED — pair each
    // treated unit (purchase) with its nearest control (click) in
    // propensity space, but ONLY within a caliper (|Δp| ≤ 0.01),
    // discarding treatments with no comparable control instead of
    // forcing a bad match. Matching is WITH replacement (the standard
    // deterministic variant — greedy without-replacement is
    // sequential by construction); the scorer is q237's hard-sigmoid
    // propensity. Plan: 1-D nearest-neighbor as the SORTED form, not
    // pair enumeration — controls reduce losslessly to one row per
    // distinct (bucket, p) (winner is min over (|Δp|, c_id), so among
    // equal-p controls only the min c_id can win), replicate into the
    // 3 adjacent caliper buckets (pigeonhole: every control within
    // the caliper of a treatment lands in the treatment's bucket),
    // and ONE carry-forward window per direction finds each
    // treatment's nearest control below and above — the AsofJoin
    // shape, cost one per-bucket sort of |T_b| + 3·|C'_b| rows. The
    // first cut (bucket pair enumeration) measured 50.3 s at sf0.1
    // because the propensity mass concentrates in ~25 buckets
    // (Σ|T_b|·|C_b| ≈ 90 M candidate structs); the sorted form is
    // O(n log n) and the result is bit-identical (oracle unchanged).
    "q253_caliper_matching" -> ((s, d) => {
      val scored = events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select(col("event_id"),
          (col("event_type") === "purchase").as("treated"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
        .withColumn("p_micro",
          least(greatest(expr("(cents - 25000) * 1000000 div 20000 div 4 " +
            "+ 500000"), lit(0L)), lit(1000000L)))
      val ctrl = scored.where(!col("treated"))
        .groupBy(expr("p_micro div 10000").as("bkt0"),
          col("p_micro").as("p_c"))
        .agg(min("event_id").as("c_id"))
        .withColumn("bkt", explode(array(col("bkt0") - 1L, col("bkt0"),
          col("bkt0") + 1L)))
      val u = scored.where(col("treated"))
        .select(expr("p_micro div 10000").as("bkt"),
          col("p_micro").as("p"), col("event_id").as("t_id"),
          lit(null).cast("long").as("p_c"),
          lit(null).cast("long").as("c_id"), lit(1).as("side"))
        .unionByName(ctrl.select(col("bkt"), col("p_c").as("p"),
          lit(null).cast("long").as("t_id"), col("p_c"), col("c_id"),
          lit(0).as("side")))
      val cstruct = when(col("side") === 0,
        struct(col("p_c"), col("c_id")))
      val wB = Window.partitionBy("bkt").orderBy(col("p"), col("side"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wA = Window.partitionBy("bkt")
        .orderBy(col("p").desc, col("side"))
        .rowsBetween(Window.unboundedPreceding, 0)
      u
        .withColumn("below", last(cstruct, ignoreNulls = true).over(wB))
        .withColumn("above", last(cstruct, ignoreNulls = true).over(wA))
        .where(col("side") === 1)
        .withColumn("cb", when(col("p") - col("below.p_c") <= 10000L,
          struct((col("p") - col("below.p_c")).as("dist"),
            col("below.c_id").as("c_id"), col("below.p_c").as("p_c"))))
        .withColumn("ca", when(col("above.p_c") - col("p") <= 10000L,
          struct((col("above.p_c") - col("p")).as("dist"),
            col("above.c_id").as("c_id"), col("above.p_c").as("p_c"))))
        .withColumn("m", least(col("cb"), col("ca")))
        .where(col("m").isNotNull)
        .select(col("t_id"), col("m.c_id").as("c_id"),
          col("p").as("p_t"), col("m.p_c").as("p_c"))
        .orderBy("t_id")
    }),

    // q266 — CUSUM CHANGEPOINT MONITOR: the sequential mean-shift
    // detector beside q119's per-day z-scores and q196's burn-rate
    // band — CUSUM accumulates SMALL persistent drifts a per-day
    // threshold never sees. The textbook recursion s_t = max(0,
    // s_{t−1} + x_t − μ₀ − k) is NOT a window sum, but its closed
    // form is: s_t = P_t − min(0, min_{j<t} P_j) over the prefix sums
    // of the drift series — two windows over the bounded per-day
    // table, exact integers, no sequential fold. μ₀ is the first-half
    // baseline per type (integer mean), slack k = 100 cents, alarm
    // threshold h = 1500 cents; the output pins the maximum CUSUM
    // excursion and the FIRST alarm day (null when a stationary
    // series never alarms — the honest outcome on this data). Plan:
    // one partial-agg groupBy to (type, day) cells; all windows run
    // on that bounded table.
    "q266_cusum_changepoint" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
          .as("x"))
      val wOrd = Window.partitionBy("event_type").orderBy("day")
      val wAll = Window.partitionBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
      val wPrevMin = wOrd.rowsBetween(Window.unboundedPreceding, -1)
      daily
        .withColumn("rk", row_number().over(wOrd).cast("long"))
        .withColumn("nd", count(lit(1)).over(wAll))
        .withColumn("mu0",
          expr("(sum(case when rk <= nd div 2 then x else 0 end) over " +
            "(partition by event_type)) div (nd div 2)"))
        .withColumn("dft", col("x") - col("mu0") - 100L)
        .withColumn("p", sum("dft").over(wCum))
        .withColumn("pmin",
          least(lit(0L), coalesce(min("p").over(wPrevMin), lit(0L))))
        .withColumn("s", greatest(lit(0L), col("p") - col("pmin")))
        .groupBy("event_type")
        .agg(max("nd").as("n_days"), max("mu0").as("mu0_cents"),
          max("s").as("max_cusum_cents"),
          min(when(col("s") > 1500L, col("day"))).as("alarm_day"))
        .orderBy("event_type")
    }),

    // q267 — THEIL-SEN ROBUST TREND: the median-of-slopes regression
    // beside q181's OLS — a single corrupted day moves OLS
    // arbitrarily but shifts the pairwise-slope MEDIAN by one rank.
    // All C(n_days, 2) pairwise slopes land as truncating integer
    // micros (Δcents·10⁶ div Δday) on the bounded per-day table —
    // pairs of DAYS, never of rows — and the lower median is an
    // exact rank pick ((n+1) div 2 with (slope, day-pair) tie
    // order). Plan: one partial-agg groupBy to daily cells, the pair
    // join and rank window on the ≤C(days,2)-row table.
    "q267_theil_sen" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
          .as("x"))
      val a = daily.toDF("event_type", "day_a", "x_a")
      val b = daily.toDF("event_type", "day_b", "x_b")
      val slopes = a.join(b, Seq("event_type"))
        .where(col("day_a") < col("day_b"))
        .select(col("event_type"), col("day_a"), col("day_b"),
          expr("(x_b - x_a) * 1000000 div (day_b - day_a)").as("sl"))
      val wr = Window.partitionBy("event_type")
        .orderBy(col("sl"), col("day_a"), col("day_b"))
      val wn = Window.partitionBy("event_type")
      slopes
        .withColumn("rk", row_number().over(wr).cast("long"))
        .withColumn("np", count(lit(1)).over(wn))
        .groupBy("event_type")
        .agg(max(expr("(np + 1) div 2")).as("median_rank"),
          max("np").as("n_pairs"),
          max(when(col("rk") === expr("(np + 1) div 2"), col("sl")))
            .as("theil_slope_micro"))
        .select(col("event_type"), col("n_pairs"),
          col("theil_slope_micro"))
        .orderBy("event_type")
    }),

    // q269 — MANN-KENDALL TREND TEST: the nonparametric significance
    // companion to q267's Theil-Sen slope (same bounded daily table;
    // Theil-Sen says HOW MUCH, Mann-Kendall says WHETHER): S =
    // Σ_{i<j} sign(x_j − x_i) over day pairs — exact integer — with
    // the tie-corrected variance 18·Var(S) = n(n−1)(2n+5) −
    // Σ_t t(t−1)(2t+5) kept as the exact integer var18, and only the
    // final continuity-corrected z = (S∓1)/√(var18/18) leaving
    // integers (pinned-order double, 6 dp). Plan: one partial-agg
    // groupBy to daily cells; the pair join and tie histogram run on
    // the ≤|types|·|days| table.
    "q269_mann_kendall" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
          .as("x"))
      val a = daily.toDF("event_type", "day_a", "x_a")
      val b = daily.toDF("event_type", "day_b", "x_b")
      val sStat = a.join(b, Seq("event_type"))
        .where(col("day_a") < col("day_b"))
        .groupBy("event_type")
        .agg(sum(expr("case when x_b > x_a then 1L " +
          "when x_b < x_a then -1L else 0L end")).as("s_stat"))
      val nd = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy("event_type", "x")
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie18"))
      nd.join(sStat, "event_type").join(ties, "event_type")
        .withColumn("var18",
          expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie18"))
        .withColumn("z", when(col("var18") <= 0, lit(0d)).otherwise(
          round((col("s_stat") - expr("case when s_stat > 0 then 1L " +
            "when s_stat < 0 then -1L else 0L end")).cast("double")
            / sqrt(col("var18").cast("double") / lit(18d)), 6)))
        .select(col("event_type"), col("n_days"), col("s_stat"),
          col("var18"), col("z"))
        .orderBy("event_type")
    }),

    // q271 — BENJAMINI-HOCHBERG FDR SCREEN: multiplicity control for
    // the anomaly family — one drift test per (type, day) cell is
    // |types|·|days| hypotheses, and at α=0.05 an uncorrected screen
    // fires ~7 false alarms per 150 cells BY DESIGN. Family: per-cell
    // 2-dof chi-square of the day's user-bucket split (user_id % 3)
    // against the type's overall split — the q194 SRM test taken
    // per-day. 2 dof is chosen deliberately: its survival function is
    // EXACTLY exp(−χ²/2), so p needs no incomplete-gamma — p_micro =
    // floor(exp(−χ²/2)·10⁶) with χ² a pinned-order double over exact
    // integer counts. BH step-up runs entirely in integers: reject
    // ranks ≤ k* = max{i : p_i·m ≤ 50000·i} (α·10⁶ = 50000, BH on the
    // micro-quantized p — both engines quantize identically). The
    // rank is a strictly-ordered (p, type, day) JOIN COUNT on the
    // bounded cell table — no global window, no single-partition
    // sort. Plan: one partial-agg groupBy to cells; everything after
    // runs on ≤|types|·|days| rows.
    "q271_bh_fdr" -> ((s, d) => {
      val cells = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          expr("user_id % 3").as("b"))
        .agg(count(lit(1)).as("c"))
      val byDay = cells.groupBy("event_type", "day")
        .agg(sum(when(col("b") === 0L, col("c")).otherwise(0L)).as("o0"),
          sum(when(col("b") === 1L, col("c")).otherwise(0L)).as("o1"),
          sum(when(col("b") === 2L, col("c")).otherwise(0L)).as("o2"))
        .withColumn("n_day", col("o0") + col("o1") + col("o2"))
      val byType = byDay.groupBy("event_type")
        .agg(sum("o0").as("c0"), sum("o1").as("c1"), sum("o2").as("c2"),
          sum("n_day").as("n_type"))
      val term = (o: String, c: String) =>
        s"(case when $c = 0 then 0.0D else " +
          s"pow(cast($o as double) - cast(n_day as double) * $c / n_type, 2) " +
          s"/ (cast(n_day as double) * $c / n_type) end)"
      val p = byDay.join(byType, "event_type")
        .withColumn("chi2", expr(
          term("o0", "c0") + " + " + term("o1", "c1") + " + " +
            term("o2", "c2")))
        .select(col("event_type"), col("day"), col("n_day"),
          expr("cast(floor(exp(-chi2 / 2.0D) * 1000000) as bigint)")
            .as("p_micro"))
      val o = p.toDF("et2", "day2", "nd2", "pm2")
      val ranked = p.join(o,
          col("pm2") < col("p_micro") ||
            (col("pm2") === col("p_micro") && (col("et2") < col("event_type") ||
              (col("et2") === col("event_type") && col("day2") < col("day")))),
          "left")
        .groupBy("event_type", "day", "n_day", "p_micro")
        .agg((count(col("et2")) + 1L).as("rk"))
      val m = ranked.agg(count(lit(1)).as("m"))
      val flagged = ranked.crossJoin(broadcast(m))
        .withColumn("bh_ok", col("p_micro") * col("m") <= lit(50000L) * col("rk"))
      val kstar = flagged
        .agg(coalesce(max(when(col("bh_ok"), col("rk"))), lit(0L)).as("kstar"))
      flagged.crossJoin(broadcast(kstar))
        .select(col("event_type"), col("day"), col("n_day"),
          col("p_micro"), col("rk"), (col("rk") <= col("kstar")).as("rejected"))
        .orderBy("event_type", "day")
    }),

    // q333 — HOLM STEP-DOWN (FWER control): the conservative sibling
    // of q271's BH-FDR screen over the SAME per-(type, day) uniformity
    // cells and the same exact 2-dof p = exp(−χ²/2) closed form —
    // Holm rejects the k smallest p's while EVERY j ≤ k satisfies
    // p₍ⱼ₎·(m−j+1) ≤ α (the running max makes the step-down monotone,
    // so no rejection gap can reopen). Identical deterministic tie
    // order to q271; the rank and running-max legs are self-joins
    // over the BOUNDED cell grid (|types|·|days|), never a global
    // window over event rows.
    "q333_holm_stepdown" -> ((s, d) => {
      val cells = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          expr("user_id % 3").as("b"))
        .agg(count(lit(1)).as("c"))
      val byDay = cells.groupBy("event_type", "day")
        .agg(sum(when(col("b") === 0L, col("c")).otherwise(0L)).as("o0"),
          sum(when(col("b") === 1L, col("c")).otherwise(0L)).as("o1"),
          sum(when(col("b") === 2L, col("c")).otherwise(0L)).as("o2"))
        .withColumn("n_day", col("o0") + col("o1") + col("o2"))
      val byType = byDay.groupBy("event_type")
        .agg(sum("o0").as("c0"), sum("o1").as("c1"), sum("o2").as("c2"),
          sum("n_day").as("n_type"))
      val term = (o: String, c: String) =>
        s"(case when $c = 0 then 0.0D else " +
          s"pow(cast($o as double) - cast(n_day as double) * $c / n_type, 2) " +
          s"/ (cast(n_day as double) * $c / n_type) end)"
      val p = byDay.join(byType, "event_type")
        .withColumn("chi2", expr(
          term("o0", "c0") + " + " + term("o1", "c1") + " + " +
            term("o2", "c2")))
        .select(col("event_type"), col("day"), col("n_day"),
          expr("cast(floor(exp(-chi2 / 2.0D) * 1000000) as bigint)")
            .as("p_micro"))
      val o = p.toDF("et2", "day2", "nd2", "pm2")
      val ranked = p.join(o,
          col("pm2") < col("p_micro") ||
            (col("pm2") === col("p_micro") && (col("et2") < col("event_type") ||
              (col("et2") === col("event_type") && col("day2") < col("day")))),
          "left")
        .groupBy("event_type", "day", "n_day", "p_micro")
        .agg((count(col("et2")) + 1L).as("rk"))
      val m = ranked.agg(count(lit(1)).as("m"))
      val terms = ranked.crossJoin(broadcast(m))
        .withColumn("hterm", col("p_micro") * (col("m") - col("rk") + 1L))
      val t2 = terms.select(col("rk").as("rk2"), col("hterm").as("hterm2"))
      // broadcast the (rk, hterm) side: the bounded cell grid rides a
      // BroadcastNestedLoopJoin (the q271 rank-leg shape), never a
      // CartesianProduct exchange
      terms.join(broadcast(t2), col("rk2") <= col("rk"))
        .groupBy("event_type", "day", "n_day", "p_micro", "rk")
        .agg(max("hterm2").as("hmax"))
        .select(col("event_type"), col("day"), col("n_day"),
          col("p_micro"), col("rk"),
          (col("hmax") <= 50000L).as("rejected_holm"))
        .orderBy("event_type", "day")
    }),

    // q272 — SPEARMAN RANK CORRELATION: does daily spend CO-MOVE with
    // daily traffic per type? Rank-based so one outlier day cannot
    // fabricate correlation (the q267/q269 robustness family applied
    // to ASSOCIATION). Average ranks stay exact integers by the
    // doubling trick r2 = 2·min_rank + (t−1) (doubling cancels in the
    // Pearson ratio); all five moment sums are exact int64 on the
    // bounded daily table (ranks ≤ 2·days, Σr² ≤ days³ ≪ 2⁶³), and
    // only the final ρ = (nΣxy−ΣxΣy)/(√a·√b) leaves integers
    // (pinned-order double, 6 dp, null on a constant series). Plan:
    // one partial-agg groupBy; rank windows partition per type.
    "q272_spearman_corr" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("xc"),
          count(lit(1)).as("yc"))
      val wx = Window.partitionBy("event_type").orderBy("xc")
      val wy = Window.partitionBy("event_type").orderBy("yc")
      val wxv = Window.partitionBy("event_type", "xc")
      val wyv = Window.partitionBy("event_type", "yc")
      daily
        .withColumn("rx",
          lit(2L) * rank().over(wx) + count(lit(1)).over(wxv) - 1L)
        .withColumn("ry",
          lit(2L) * rank().over(wy) + count(lit(1)).over(wyv) - 1L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("rx").as("sx"), sum("ry").as("sy"),
          sum(col("rx") * col("ry")).as("sxy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"))
        .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("da", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("db", col("n") * col("syy") - col("sy") * col("sy"))
        .select(col("event_type"), col("n").as("n_days"),
          when(col("da") === 0L || col("db") === 0L, lit(null))
            .otherwise(round(col("num").cast("double") /
              (sqrt(col("da").cast("double")) *
                sqrt(col("db").cast("double"))), 6)).as("rho"))
        .orderBy("event_type")
    }),

    // q276 — MASE FORECAST EVALUATION: the scale-free forecast-error
    // metric (Hyndman & Koehler) for the seasonal-naive baseline
    // x̂_t = x_{t−7} — the number every real forecaster must beat
    // before shipping a model. Days split 21 train / rest test per
    // type; the lag join is on day arithmetic (gaps excluded
    // honestly, not papered over by row offsets). MASE = MAE_test /
    // MAE_train as one exact decimal(38) cross ratio in micros —
    // no per-row division, no floats. Plan: one partial-agg groupBy
    // to daily cells; lag join + split on the bounded table.
    "q276_mase_eval" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
          .as("x"))
      val lag7 = daily.select(col("event_type"),
        (col("day") + 7L).as("day"), col("x").as("px"))
      val d0 = daily.groupBy("event_type").agg(min("day").as("d0"))
      val err = daily.join(lag7, Seq("event_type", "day"))
        .join(d0, "event_type")
        .withColumn("e", abs(col("x") - col("px")))
        .withColumn("is_test", col("day") >= col("d0") + 21L)
      err.groupBy("event_type")
        .agg(sum(when(!col("is_test"), col("e"))).as("se_tr"),
          count(when(!col("is_test"), lit(1))).as("n_tr"),
          sum(when(col("is_test"), col("e"))).as("se_te"),
          count(when(col("is_test"), lit(1))).as("n_te"))
        .select(col("event_type"), col("n_tr"), col("n_te"),
          expr("se_tr div n_tr").as("mae_train_cents"),
          expr("se_te div n_te").as("mae_test_cents"),
          when(col("se_tr") > 0L && col("n_te") > 0L,
            expr("cast(se_te as decimal(38,0)) * n_tr * 1000000 " +
              "div (cast(se_tr as decimal(38,0)) * n_te)").cast("long"))
            .as("mase_micro"))
        .orderBy("event_type")
    }),

    // q277 — STL-LITE SEASONAL DECOMPOSITION: x = trend + seasonal +
    // remainder on the daily series — trend a CENTERED 7-day moving
    // average (defined only where the window holds 7 CONSECUTIVE
    // days: both count=7 and day-span=6 are checked, so a gap yields
    // null instead of a silently-shifted average), seasonal the
    // per-(type, day-of-week) integer mean of the detrended values,
    // remainder what's left. Everything exact cents with truncating
    // div (Spark div ≡ DuckDB // on negatives). Plan: windows and
    // groupBys all partition per type on the bounded daily table.
    "q277_stl_decompose" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
          .as("x"))
      val w7 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-3, 3)
      val t = daily
        .withColumn("trend",
          when(count(lit(1)).over(w7) === 7L &&
            max("day").over(w7) - min("day").over(w7) === 6L,
            expr("sum(x) over (partition by event_type order by day " +
              "rows between 3 preceding and 3 following) div 7")))
        .withColumn("dow", expr("day % 7"))
        .withColumn("det", col("x") - col("trend"))
      val seas = t.where(col("det").isNotNull)
        .groupBy("event_type", "dow")
        .agg(expr("sum(det) div count(1)").as("seasonal"))
      t.join(seas, Seq("event_type", "dow"), "left")
        .select(col("event_type"), col("day"), col("x"), col("trend"),
          when(col("trend").isNotNull, col("seasonal")).as("seasonal"),
          when(col("trend").isNotNull,
            col("x") - col("trend") - col("seasonal")).as("remainder"))
        .orderBy("event_type", "day")
    }),

    // q278 — AUTOCORRELATION FUNCTION (lags 1, 2, 3, 7): serial
    // dependence of the daily series, the diagnostic under q266/
    // q267/q277. Centering stays EXACT by scaling: d_t = x_t·n − Σx
    // (n× the centered value — the factor cancels in the ratio), so
    // both numerator Σ d_t·d_{t+k} and denominator Σ d_t² are exact
    // integers (decimal(38) products — d is cents·n), and acf_micro
    // is one trailing truncating division. Lag pairing joins on day
    // ARITHMETIC (gaps pair honestly), lags exploded from a literal
    // array. Plan: everything after the daily groupBy runs on
    // ≤|types|·|days|·4 rows.
    "q278_acf" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("ts div 86400000000000").as("day"))
        .agg(expr("sum(cast(round(value * 100) as bigint)) div count(1)")
          .as("x"))
      val st = daily.groupBy("event_type")
        .agg(sum("x").as("sx"), count(lit(1)).as("n"))
      val cent = daily.join(st, "event_type")
        .select(col("event_type"), col("day"),
          (col("x") * col("n") - col("sx")).as("dv"))
      val den = cent.groupBy("event_type")
        .agg(sum(expr("cast(dv as decimal(38,0)) * dv")).as("den"))
      val probe = cent
        .withColumn("lag", explode(array(lit(1L), lit(2L), lit(3L), lit(7L))))
        .select(col("event_type"), (col("day") + col("lag")).as("day"),
          col("lag"), col("dv").as("dv0"))
      probe.join(cent, Seq("event_type", "day"))
        .groupBy("event_type", "lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("cast(dv0 as decimal(38,0)) * dv")).as("num"))
        .join(den, "event_type")
        .select(col("event_type"), col("lag"), col("n_pairs"),
          when(col("den") > 0,
            expr("num * 1000000 div den").cast("long")).as("acf_micro"))
        .orderBy("event_type", "lag")
    }),

    // q262 — CHAT-TRANSCRIPT VALIDATION: SFT-data hygiene — before a
    // conversation corpus reaches training, every transcript is
    // checked for role-structure invariants (strict user/assistant
    // alternation, user-first, assistant-final). The events stream
    // stands in as synthesized transcripts (one per user, roles from
    // the event type, (ts, event_id) order); the output is the
    // per-conversation audit a curation run filters on, with the
    // violation COUNT kept (not just a flag) so partially-salvageable
    // transcripts can be triaged. One user-keyed window pass + one
    // partial-agg groupBy; at 100 TB this shuffles each conversation
    // once on its key.
    "q262_chat_validate" -> ((s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type").isin("purchase", "signup"), "assistant")
            .otherwise("user").as("role"))
        .withColumn("prev_role", lag("role", 1).over(wOrd))
        .withColumn("rn", row_number().over(wOrd))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_turns"),
          sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
            .as("n_alternation_violations"),
          max(when(col("rn") === 1, col("role"))).as("first_role"),
          max_by(col("role"), struct(col("ts"), col("event_id")))
            .as("last_role"))
        .select(col("user_id"), col("n_turns"),
          col("n_alternation_violations"),
          (col("first_role") === "user").as("starts_user"),
          (col("last_role") === "assistant").as("ends_assistant"),
          (col("n_alternation_violations") === 0L &&
            col("first_role") === "user" &&
            col("last_role") === "assistant").as("valid"))
        .orderBy("user_id")
    }),

    // q264 — HILL TAIL-INDEX ESTIMATOR: is the value distribution
    // heavy-tailed, and how heavy? — the quantitative answer behind
    // q198's Benford screen and q135's skew stats. 1/α̂ = mean of
    // ln(x_(i)/x_(k)) over the top k=100 order statistics, computed
    // as micro-log DIFFERENCES of exact integer cents (the q77
    // idiom), so the only divisions are trailing truncations. The
    // top-k cut is a TakeOrdered (heap, never a full sort) with
    // (cents desc, event_id) determinism; everything after runs on
    // the 100-row table.
    "q264_hill_tail_index" -> ((s, d) => {
      val k = 100
      val top = events(s, d)
        .select(expr("cast(round(value * 100) as bigint)").as("cents"),
          col("event_id"))
        .where(col("cents") > 0)
        .orderBy(col("cents").desc, col("event_id"))
        .limit(k)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      top
        .withColumn("ml", floor(log(col("cents").cast("double")) * 1000000)
          .cast("long"))
        .withColumn("mlk", min("ml").over(wAll))
        .withColumn("xk", min("cents").over(wAll))
        .agg(count(lit(1)).as("k"), max("xk").as("xk_cents"),
          expr("sum(ml - mlk) div (count(1) - 1)").as("hill_inv_micro"))
        .select(col("k"), col("xk_cents"), col("hill_inv_micro"),
          expr("case when hill_inv_micro > 0 " +
            "then 1000000000000 div hill_inv_micro else 0 end")
            .as("alpha_micro"))
    }),

    // q265 — KAPLAN-MEIER SURVIVAL (log space): time-to-conversion
    // with honest CENSORING — users who clicked but never purchased
    // contribute exactly their observed exposure instead of being
    // dropped (the bias every naive q191-style latency percentile
    // carries). Durations in whole minutes from first click to first
    // later purchase; censored at the stream horizon. The product-
    // limit estimator stays in LOG SPACE so it is exact-integer:
    // ln S(t) = Σ_{t_j ≤ t} [ml(n_j − d_j) − ml(n_j)] over micro-logs
    // of exact counts — no float product ever forms; S(t) itself is
    // e^(µ/10⁶) for the reader. Rows emit only at event times; a
    // final-time risk set that fully converts would hit ln 0 and is
    // clamped to the documented −10¹² sentinel (S = 0). Plan: one
    // user-keyed conditional-min pass builds the |users|-bounded
    // duration table, the risk-set windows run on the distinct-minute
    // histogram (bounded by the time domain).
    "q265_kaplan_meier" -> ((s, d) => {
      val ev = events(s, d)
      val horizon = ev.agg(max("ts").as("tmax"))
      val perUser = ev
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tpAny"))
        .where(col("tc").isNotNull)
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          when(col("tpAny") > col("tc"),
            expr("(tpAny - tc) div 60000000000")).as("durEvent"),
          expr("(tmax - tc) div 60000000000").as("durCensor"))
        .select(col("user_id"),
          coalesce(col("durEvent"), col("durCensor")).as("dur"),
          col("durEvent").isNotNull.as("converted"))
      val hist = perUser.groupBy("dur")
        .agg(sum(when(col("converted"), 1L).otherwise(0L)).as("d"),
          count(lit(1)).as("c"))
      val wGe = Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wCum = Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, 0)
      hist
        .withColumn("n_risk", sum("c").over(wGe))
        .where(col("d") > 0)
        .withColumn("term",
          when(col("n_risk") > col("d"),
            floor(log((col("n_risk") - col("d")).cast("double")) * 1000000)
              .cast("long")
              - floor(log(col("n_risk").cast("double")) * 1000000)
                .cast("long"))
            .otherwise(lit(-1000000000000L)))
        .withColumn("log_surv_micro", sum("term").over(wCum))
        .select(col("dur").as("duration_min"), col("n_risk"),
          col("d").as("n_events"), col("log_surv_micro"))
        .orderBy("duration_min")
    }),

    // q279 — LOG-RANK TEST: does arm A convert SLOWER than arm B? The
    // standard two-group survival comparison over q265's duration
    // table (same click→purchase durations, same censoring at the
    // horizon), arms split user_id % 2 (the q194 A/B frame). The
    // classic statistic needs per-time rationals d·n₁/n — summed as
    // floats that would be order-sensitive, so each term is QUANTIZED
    // to exact integers first: e_term = d·n₁·10⁶ div n and v_term =
    // d·n₁·n₂·(n−d)·10⁶ div (n²·(n−1)) (decimal(38) products), then
    // summed order-free; only the final z = (O₁·10⁶ − E₁)/√(V·10⁶)
    // is a pinned double (6 dp). This is the micro-quantized log-rank
    // — both engines quantize identically, and the quantization error
    // is ≤ #times·10⁻⁶ in E₁. Plan: one user-keyed pass to durations,
    // everything after on the bounded minute histogram (q265's
    // window shape).
    "q279_logrank" -> ((s, d) => {
      val ev = events(s, d)
      val horizon = ev.agg(max("ts").as("tmax"))
      val perUser = ev
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tpAny"))
        .where(col("tc").isNotNull)
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          when(col("tpAny") > col("tc"),
            expr("(tpAny - tc) div 60000000000")).as("durEvent"),
          expr("(tmax - tc) div 60000000000").as("durCensor"))
        .select((col("user_id") % 2 === 0).as("arm_a"),
          coalesce(col("durEvent"), col("durCensor")).as("dur"),
          col("durEvent").isNotNull.as("converted"))
      val hist = perUser.groupBy("dur")
        .agg(sum(when(col("converted") && col("arm_a"), 1L).otherwise(0L))
          .as("d1"),
          sum(when(col("converted") && !col("arm_a"), 1L).otherwise(0L))
            .as("d2"),
          sum(when(col("arm_a"), 1L).otherwise(0L)).as("c1"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("c2"))
      val wGe = Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      hist
        .withColumn("n1", sum("c1").over(wGe))
        .withColumn("n2", sum("c2").over(wGe))
        .withColumn("n", col("n1") + col("n2"))
        .withColumn("dd", col("d1") + col("d2"))
        .where(col("dd") > 0)
        .withColumn("e_term", expr("dd * n1 * 1000000 div n"))
        .withColumn("v_term",
          when(col("n") > 1L, expr(
            "cast(cast(dd as decimal(38,0)) * n1 * n2 * (n - dd) " +
              "* 1000000 div (cast(n as decimal(38,0)) * n * (n - 1)) " +
              "as bigint)")).otherwise(0L))
        .agg(sum("d1").as("o1"), sum("d2").as("o2"),
          sum("e_term").as("e1_micro"), sum("v_term").as("v_micro"))
        .select(col("o1"), col("o2"), col("e1_micro"), col("v_micro"),
          when(col("v_micro") > 0L,
            round((col("o1") * 1000000L - col("e1_micro")).cast("double")
              / sqrt(col("v_micro").cast("double") * 1000000d), 6))
            .as("z"))
    }),

    // q280 — REFERENTIAL-INTEGRITY AUDIT: the constraint suite a
    // warehouse runs before trusting joins — every declared FK
    // checked by one anti-join (child rows whose key misses the
    // parent), reporting orphan ROWS and orphan KEYS per constraint.
    // Includes the cross-domain edge the clean TPC-H FKs won't show:
    // events.user_id→customer and embeddings.doc_id→documents, where
    // orphans are a REAL finding, not a zero. Anti-joins broadcast
    // the small parent key sets; the child side is one scan each —
    // no constraint costs more than its child's size.
    "q280_ref_integrity" -> ((s, d) => {
      def audit(name: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String): DataFrame = {
        val orphans = child.select(col(key).as("k"))
          .where(col("k").isNotNull)
          .join(parent.select(col(pkey).as("k")).distinct(), Seq("k"),
            "left_anti")
        child.agg(count(col(key)).as("n_child"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphan_rows"),
            countDistinct(col("k")).as("n_orphan_keys")))
          .select(lit(name).as("fk"), col("n_child"),
            col("n_orphan_rows"), col("n_orphan_keys"))
      }
      val li = Tables.load(s, d, "lineitem")
      val o = Tables.load(s, d, "orders")
      val c = Tables.load(s, d, "customer")
      val su = Tables.load(s, d, "supplier")
      val n = Tables.load(s, d, "nation")
      val r = Tables.load(s, d, "region")
      val ev = events(s, d)
      val doc = Tables.load(s, d, "documents")
      val emb = Tables.load(s, d, "embeddings")
      Seq(
        audit("customer.nation->nation", c, "c_nationkey", n, "n_nationkey"),
        audit("embeddings.vec->documents", emb, "vec_id", doc, "doc_id"),
        audit("events.user->customer", ev, "user_id", c, "c_custkey"),
        audit("lineitem.order->orders", li, "l_orderkey", o, "o_orderkey"),
        audit("lineitem.supp->supplier", li, "l_suppkey", su, "s_suppkey"),
        audit("nation.region->region", n, "n_regionkey", r, "r_regionkey"),
        audit("orders.cust->customer", o, "o_custkey", c, "c_custkey"),
        audit("supplier.nation->nation", su, "s_nationkey", n, "n_nationkey"))
        .reduce(_ unionByName _)
        .orderBy("fk")
    }),

    // q258 — SHAPLEY ATTRIBUTION: the game-theoretic upgrade of
    // q187's last-touch — credit conversions to channels by each
    // channel's average marginal contribution over all coalition
    // orderings (the only attribution satisfying efficiency/symmetry/
    // dummy). Channels are the 4 non-purchase event types, a user's
    // coalition is the SET of channels they touched, v(T) = observed
    // conversion rate of users with exactly coalition T (the
    // data-driven characteristic function; unobserved coalitions
    // contribute 0 — stated, not hidden). With n=4 the factorial
    // weights |T|!(n−|T|−1)!/n! are the exact rationals
    // {6,2,2,6}/24, so shapley_micro = Σ w'·(r(T∪c) − r(T)) div 24
    // in pure integers over truncated micro rates. Plan: ONE groupBy
    // to the ≤16-coalition table (bitmask partial agg), the Shapley
    // fold runs on that bounded table crossed with the 4-channel
    // list — corpus touched once, every later join bounded.
    "q258_shapley_attribution" -> ((s, d) => {
      val ev = events(s, d)
      val users = ev.groupBy("user_id")
        .agg(
          (max(when(col("event_type") === "click", 1L).otherwise(0L))
            + max(when(col("event_type") === "view", 2L).otherwise(0L))
            + max(when(col("event_type") === "signup", 4L).otherwise(0L))
            + max(when(col("event_type") === "error", 8L).otherwise(0L)))
            .as("mask"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      val coal = users.groupBy("mask")
        .agg(count(lit(1)).as("n"), sum("conv").as("nc"))
      val allMasks = ev.sparkSession.range(16).toDF("mask")
        .join(coal, Seq("mask"), "left")
        .select(col("mask"),
          coalesce(expr("nc * 1000000 div n"), lit(0L)).as("r"))
      val channels = ev.sparkSession.range(4).toDF("ch")
      // T ranges over coalitions WITHOUT channel ch; weights by |T|
      channels.crossJoin(broadcast(allMasks.toDF("t_mask", "r_t")))
        .where(expr("shiftright(t_mask, cast(ch as int)) & 1 = 0"))
        .join(broadcast(allMasks.toDF("u_mask", "r_tc")),
          expr("u_mask = t_mask + shiftleft(1, cast(ch as int))"))
        .withColumn("sz", expr("bit_count(t_mask)").cast("long"))
        .withColumn("w", expr("case when sz = 0 or sz = 3 then 6L " +
          "else 2L end"))
        .groupBy("ch")
        .agg(expr("sum(w * (r_tc - r_t)) div 24").as("shapley_micro"))
        .select(
          expr("case ch when 0 then 'click' when 1 then 'view' " +
            "when 2 then 'signup' else 'error' end").as("channel"),
          col("shapley_micro"))
        .orderBy("channel")
    }),

    // q259 — LANG-ID CONFUSION MATRIX: the audit tier for q15's
    // marker-word classifier — predicted vs labeled language counts,
    // the artifact a pipeline reviews before trusting a heuristic
    // filter (and the honest place to LEARN the classifier is weak on
    // this synthetic corpus: the text is language-independent word
    // salad, so the matrix shows exactly how the en-biased tie-break
    // distributes predictions across true labels). One scan through
    // the EXACT q15 scorer/tie-break, one partial-agg groupBy to the
    // ≤|langs|² cell table; correctness lands in-band per cell.
    "q259_langid_confusion" -> ((s, d) =>
      langConfusionCells(s, d).orderBy("actual", "predicted")),

    // q284 — IPW AVERAGE TREATMENT EFFECT: the weighting estimator
    // beside q253's matching — treatment = the user ENTERED via a
    // click (first event by (ts, id)), outcome = total purchase
    // cents, confounder = activity volume (count-div-20 strata,
    // capped at 10; on this data users have ~67 events each, so a
    // user-level "has X" flag saturates — entry channel is the
    // treatment with real within-stratum variation). The propensity
    // is STRATIFIED (empirical treatment rate per stratum) so it is
    // exact-integer by construction: p_micro = t_b·10⁶ div n_b — no
    // model, no floats. Hájek-normalized IPW: weights 10¹² div
    // p_micro (treated) and 10¹² div (10⁶ − p_micro) (control), both
    // weighted means one decimal(38) ratio each. Strata without
    // overlap (p = 0 or 1) are EXCLUDED and COUNTED — at sf0.01 one
    // stratum genuinely violates positivity (no click-entry users)
    // and lands in n_no_overlap instead of silently skewing the
    // estimate. Plan: one user groupBy, one bounded stratum groupBy
    // broadcast back, one final fold.
    "q284_ipw_ate" -> ((s, d) => {
      val users = events(s, d).groupBy("user_id")
        .agg(least(expr("count(1) div 20"), lit(10L)).as("stratum"),
          when(min_by(col("event_type"), struct(col("ts"), col("event_id")))
            === "click", 1L).otherwise(0L).as("treated"),
          sum(when(col("event_type") === "purchase",
            expr("cast(round(value * 100) as bigint)")).otherwise(0L))
            .as("y"))
      val prop = users.groupBy("stratum")
        .agg(sum("treated").as("t_b"), count(lit(1)).as("n_b"))
        .select(col("stratum"),
          expr("t_b * 1000000 div n_b").as("p_micro"))
      val w = users.join(prop, "stratum")
        .withColumn("overlap",
          col("p_micro") > 0L && col("p_micro") < 1000000L)
        .withColumn("wt", when(!col("overlap"), lit(0L))
          .when(col("treated") === 1L,
            expr("1000000000000 div p_micro"))
          .otherwise(expr("1000000000000 div (1000000 - p_micro)")))
      w.agg(
        sum(when(col("overlap") && col("treated") === 1L, 1L)
          .otherwise(0L)).as("n_treated"),
        sum(when(col("overlap") && col("treated") === 0L, 1L)
          .otherwise(0L)).as("n_control"),
        sum(when(!col("overlap"), 1L).otherwise(0L)).as("n_no_overlap"),
        sum(when(col("treated") === 1L,
          expr("cast(wt as decimal(38,0)) * y")).otherwise(lit(0)
          .cast("decimal(38,0)"))).as("swy_t"),
        sum(when(col("treated") === 1L, col("wt")).otherwise(0L))
          .as("sw_t"),
        sum(when(col("treated") === 0L,
          expr("cast(wt as decimal(38,0)) * y")).otherwise(lit(0)
          .cast("decimal(38,0)"))).as("swy_c"),
        sum(when(col("treated") === 0L, col("wt")).otherwise(0L))
          .as("sw_c"))
        .select(col("n_treated"), col("n_control"), col("n_no_overlap"),
          expr("cast(swy_t div sw_t as bigint)").as("mean_t_cents"),
          expr("cast(swy_c div sw_c as bigint)").as("mean_c_cents"),
          expr("cast(swy_t div sw_t - swy_c div sw_c as bigint)")
            .as("ate_cents"))
    }),

    // q286 — COHEN'S KAPPA: chance-corrected agreement between q15's
    // lang-id predictions and the labels, folded from q259's
    // confusion cells — the one-number companion to the full matrix
    // (raw accuracy flatters a classifier when one class dominates;
    // kappa subtracts the marginal-product chance rate). Exact
    // integers end-to-end: kappa_micro = (n·diag − Σ r_i·c_i)·10⁶
    // div (n² − Σ r_i·c_i) with decimal(38) products. Runs on the
    // ≤|langs|² cell table.
    "q286_cohens_kappa" -> ((s, d) => {
      val cm = langConfusionCells(s, d)
      val t = cm.agg(sum("n").as("nn"),
        sum(when(col("correct"), col("n")).otherwise(0L)).as("dg"))
      val rc = cm.groupBy(col("actual").as("l")).agg(sum("n").as("rt"))
        .join(cm.groupBy(col("predicted").as("l")).agg(sum("n").as("ct")),
          "l")
        .agg(sum(expr("cast(rt as decimal(38,0)) * ct")).as("src"))
      t.crossJoin(broadcast(rc))
        .select(col("nn").as("n_docs"),
          expr("dg * 1000000 div nn").as("po_micro"),
          expr("cast(src * 1000000 div (cast(nn as decimal(38,0)) * nn) " +
            "as bigint)").as("pe_micro"),
          expr("cast((cast(nn as decimal(38,0)) * dg - src) * 1000000 " +
            "div (cast(nn as decimal(38,0)) * nn - src) as bigint)")
            .as("kappa_micro"))
    }),

    // q287 — RFM SEGMENTATION: the classic customer-value cube —
    // Recency (days since last purchase), Frequency (purchase count),
    // Monetary (total cents) each coded into quintiles, one 3-digit
    // RFM code per user. Quintile thresholds come from BOUNDED
    // histograms, not a global ntile sort: R and F live on naturally
    // bounded domains (days, counts) and M is bucketed to whole
    // dollars first (threshold resolution $1 — documented, the q217
    // histogram-order-statistic idiom), so each threshold is "min
    // value with cumulative count ≥ ⌈k·N/5⌉" over a table bounded by
    // the value domain, then applied scan-side. R is reverse-coded
    // (recent = 5) per the standard convention. Plan: one user
    // groupBy, three bounded histogram folds broadcast back.
    "q287_rfm_segments" -> ((s, d) => {
      val horizon = events(s, d).agg(max(expr("ts div 86400000000000"))
        .as("dmax"))
      val u = events(s, d)
        .where(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(max(expr("ts div 86400000000000")).as("lastp"),
          count(lit(1)).as("f"),
          sum(expr("cast(round(value * 100) as bigint)")).as("m_cents"))
        .crossJoin(broadcast(horizon))
        .select(col("user_id"), (col("dmax") - col("lastp")).as("r"),
          col("f"), expr("m_cents div 100").as("m_dollars"),
          col("m_cents"))
      val nU = u.agg(count(lit(1)).as("n"))
      // threshold k (k=1..4) for a metric column: min v with
      // cum ≥ ceil(k·n/5) over the bounded value histogram
      def thresholds(metric: String): DataFrame = {
        val hist = u.groupBy(col(metric).as("v")).agg(count(lit(1)).as("c"))
        val wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        hist.withColumn("cum", sum("c").over(wv))
          .crossJoin(broadcast(nU))
          .withColumn("k", explode(array(lit(1L), lit(2L), lit(3L), lit(4L))))
          .where(col("cum") >= expr("(k * n + 4) div 5"))
          .groupBy("k").agg(min("v").as("thr"))
          .groupBy().pivot("k", Seq(1L, 2L, 3L, 4L)).agg(first("thr"))
          .toDF(s"${metric}_t1", s"${metric}_t2", s"${metric}_t3",
            s"${metric}_t4")
      }
      def code(metric: String): Column =
        (lit(1L) + when(col(metric) > col(s"${metric}_t1"), 1L).otherwise(0L)
          + when(col(metric) > col(s"${metric}_t2"), 1L).otherwise(0L)
          + when(col(metric) > col(s"${metric}_t3"), 1L).otherwise(0L)
          + when(col(metric) > col(s"${metric}_t4"), 1L).otherwise(0L))
      u.crossJoin(broadcast(thresholds("r")))
        .crossJoin(broadcast(thresholds("f")))
        .crossJoin(broadcast(thresholds("m_dollars")))
        .select(col("user_id"), col("r"), col("f"), col("m_cents"),
          (lit(6L) - code("r")).as("r_code"), // recent = 5
          code("f").as("f_code"), code("m_dollars").as("m_code"))
        .withColumn("rfm",
          col("r_code") * 100L + col("f_code") * 10L + col("m_code"))
        .orderBy("user_id")
    }),

    // q288 — MARKOV NEXT-EVENT ACCURACY: does q113's transition
    // matrix actually PREDICT? Leakage-safe evaluation: the model
    // (argmax next-type per from-type, min-to tie-break) trains on
    // each user's FIRST-HALF transitions and is scored on the second
    // half — per-from accuracy in exact micros. All counting: one
    // user-keyed window pass splits, two bounded groupBys build and
    // score, nothing global.
    "q288_markov_accuracy" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wAll = Window.partitionBy("user_id")
      val tr = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("nu", count(lit(1)).over(wAll))
        .where(col("next_type").isNotNull)
        .withColumn("is_eval", col("rn") * 2L > col("nu"))
      // argmax the portable way (max count, then min to_type) — a
      // max_by with a composed string tie-break would not mirror
      // cleanly in the oracle
      val cnt = tr.where(!col("is_eval"))
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("c"))
      val best = cnt.groupBy("from_type").agg(max("c").as("mc"))
      val pred = cnt.join(best, "from_type")
        .where(col("c") === col("mc"))
        .groupBy("from_type").agg(min("to_type").as("pred"))
      tr.where(col("is_eval"))
        .select(col("event_type").as("from_type"), col("next_type"))
        .join(pred, "from_type")
        .groupBy("from_type")
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("next_type") === col("pred"), 1L).otherwise(0L))
            .as("n_correct"),
          min("pred").as("predicted"))
        .select(col("from_type"), col("predicted"), col("n_eval"),
          col("n_correct"),
          expr("n_correct * 1000000 div n_eval").as("acc_micro"))
        .orderBy("from_type")
    }),

    // q260 — GINI CONCENTRATION: how skewed is event volume across
    // users? — the inequality metric an ops review reads next to
    // q135's per-key skew stats (Gini 0 = uniform load, → 1 = one
    // hot user). Exact integers end-to-end via the sorted-cumsum
    // identity G = Σ(2i − n − 1)·x_i / (n·Σx) over per-user counts:
    // one partial-agg groupBy to the per-user table, the rank window
    // runs on |users| rows (bounded by the entity domain, the q197
    // argument), products in decimal(38) (rows² at petabyte scale),
    // one truncating division last.
    "q260_gini_concentration" -> ((s, d) => {
      val perUser = events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("x"))
      val w = Window.orderBy(col("x"), col("user_id"))
      perUser
        .withColumn("i", row_number().over(w).cast("long"))
        .agg(count(lit(1)).as("n_users"), sum("x").as("n_events"),
          sum(expr("cast(2 * i as decimal(38,0)) * x")).as("s2ix"))
        .select(col("n_users"), col("n_events"),
          expr("cast((s2ix - cast(n_users + 1 as decimal(38,0)) " +
            "* n_events) * 1000000 div " +
            "(cast(n_users as decimal(38,0)) * n_events) as bigint)")
            .as("gini_micro"))
    }),

    // q254 — ISOTONIC RECALIBRATION (pool-adjacent-violators by the
    // minimax identity): q237 diagnoses miscalibration, this FIXES it
    // — the classic distribution-free recalibrator. Instead of the
    // sequential PAV merge loop, the fit uses the closed form
    // iso_i = max_{j≤i} min_{k≥i} avg(j..k) (they're provably equal),
    // which is three bounded joins over the 10-bin reliability table
    // — no driver loop, no sequential state, and monotonicity holds
    // for ANY per-(j,k) rounding, so the truncating integer-micro
    // averages stay engine-exact. Per-bin output pins the raw rate,
    // the isotonic fit, and the recalibrated Brier contribution
    // (pos·(iso−10⁶)² + (n−pos)·iso², decimal(38) then one division).
    // Plan: ONE partial-agg shuffle builds the ≤10-cell table;
    // everything else runs on it.
    "q254_isotonic_calibration" -> ((s, d) => {
      val wCum = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
      val bins = events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select(expr("cast(round(value * 100) as bigint)").as("cents"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .withColumn("p_micro",
          least(greatest(expr("(cents - 25000) * 1000000 div 20000 div 4 " +
            "+ 500000"), lit(0L)), lit(1000000L)))
        .withColumn("bin", least(expr("p_micro div 100000"), lit(9L)))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
        .withColumn("cpos", sum("pos").over(wCum))
        .withColumn("cn", sum("n").over(wCum))
      val i = bins.select(col("bin").as("ib"), col("n"), col("pos"))
      val j = bins.select(col("bin").as("jb"),
        (col("cpos") - col("pos")).as("ppos"), (col("cn") - col("n")).as("pn"))
      val k = bins.select(col("bin").as("kb"),
        col("cpos").as("kpos"), col("cn").as("kn"))
      val iso = i.join(j, col("jb") <= col("ib"))
        .join(k, col("kb") >= col("ib"))
        .withColumn("a",
          expr("(kpos - ppos) * 1000000 div (kn - pn)"))
        .groupBy("ib", "jb").agg(max("n").as("n"), max("pos").as("pos"),
          min("a").as("mn"))
        .groupBy("ib").agg(max("n").as("n"), max("pos").as("pos"),
          max("mn").as("iso_micro"))
      iso.select(col("ib").as("bin"), col("n"),
          expr("pos * 1000000 div n").as("raw_micro"), col("iso_micro"),
          expr("cast((cast(pos as decimal(38,0)) " +
            "* (iso_micro - 1000000) * (iso_micro - 1000000) " +
            "+ cast(n - pos as decimal(38,0)) * iso_micro * iso_micro) " +
            "div (n * 1000000) as bigint)").as("brier_iso_micro"))
        .orderBy("bin")
    }),

    // q255 — QUANTILE NORMALIZATION TABLE: the batch-effect corrector
    // (microarray heritage, now feature alignment): map one
    // distribution onto another rank-for-rank. The operator emits the
    // 256-point mapping table — for each quantile q, the click-value
    // and purchase-value order statistics at rank ⌈(q+1)·n/256⌉ —
    // which downstream joins apply as a broadcast lookup. Exact
    // integers end-to-end: ranks by integer ceil division, order
    // statistics as min-cents-with-cum≥rank over the bounded value-
    // domain histograms (the q236/q238 shape); the 256×histogram
    // probe is a broadcast nested-loop over bounded cells, never a
    // row-level sort.
    "q255_quantile_normalize" -> ((s, d) => {
      val wCum = Window.partitionBy("side").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
      val hist = events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select(col("event_type").as("side"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
        .groupBy("side", "cents").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("n", sum("c").over(Window.partitionBy("side")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val q = events(s, d).sparkSession.range(256).toDF("quantile")
      def side(name: String, out: String) =
        q.crossJoin(broadcast(hist.where(col("side") === name)))
          .where(expr("cum * 256 >= (quantile + 1) * n"))
          .groupBy("quantile").agg(min("cents").as(out))
      side("click", "click_cents")
        .join(side("purchase", "purchase_cents"), "quantile")
        .orderBy("quantile")
    }),

    // q256 — SPRT SEQUENTIAL TEST (Wald): the always-valid
    // experimentation monitor beside q161's fixed-horizon z-test —
    // watch a Bernoulli stream and STOP the moment the evidence
    // crosses a boundary, with α/β guaranteed at any stopping time.
    // H₀: p=0.5 vs H₁: p=0.6 on "value above 180.00" per event type,
    // α=β=0.05. Every quantity is a pinned integer-micro literal
    // computed once and shared by both engines (ln(0.6/0.5),
    // ln(0.4/0.5), ±ln 19) — no runtime log touches data; the LLR
    // path is a cumulative window in (ts, event_id) order and the
    // verdict is the FIRST boundary crossing (min-struct over the
    // crossing rows — order-exact). State at 100 TB: the per-type
    // cumulative sum is a bounded-key window; in production this runs
    // as the q231-style streaming aggregation.
    "q256_sprt_sequential" -> ((s, d) => {
      val wCum = Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val path = events(s, d)
        .select(col("event_type"), col("ts"), col("event_id"),
          when(expr("cast(round(value * 100) as bigint)") > 18000L,
            SprtLlrPos).otherwise(SprtLlrNeg).as("step"))
        .withColumn("llr", sum("step").over(wCum))
        .withColumn("n_obs", count(lit(1)).over(wCum))
      path
        .where(col("llr") >= SprtBound || col("llr") <= -SprtBound)
        .groupBy("event_type")
        .agg(min(struct(col("n_obs"), col("llr"))).as("f"))
        .select(col("event_type"), col("f.n_obs").as("n_at_decision"),
          col("f.llr").as("llr_micro"),
          when(col("f.llr") >= SprtBound, "accept_h1")
            .otherwise("accept_h0").as("decision"))
        .orderBy("event_type")
    }),

    // q257 — WALK-FORWARD BACKTEST: time-series cross-validation done
    // right (q229 guards leakage across near-dups; this guards it
    // across TIME): 4 expanding-window folds on fixed quarter cuts of
    // the observed time span — train on everything before the fold,
    // predict the train mean, score MAE on the fold. Folds that
    // random CV would contaminate (future→past) are structurally
    // impossible here. Exact integer cents: the train side derives
    // from ONE per-(type, fold) partial agg by a prefix sum over the
    // 4-row-per-type fold table, and the MAE pass is one more row
    // scan with the 12-row prediction table broadcast — two corpus
    // scans total, never one per fold.
    "q257_walk_forward" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_type"), col("ts"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      val b = ev.agg(min("ts").as("t0"), max("ts").as("t1")).head()
      val (t0, t1) = (b.getLong(0), b.getLong(1))
      val span = t1 - t0 + 1
      val folds = ev
        .withColumn("fold", least(expr(s"(ts - ${t0}L) * 4 div ${span}L"),
          lit(3L)))
        .groupBy("event_type", "fold")
        .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      val wPre = Window.partitionBy("event_type").orderBy("fold")
        .rowsBetween(Window.unboundedPreceding, -1)
      val withTrain = folds
        .withColumn("n_train", sum("n").over(wPre))
        .withColumn("s_train", sum("s").over(wPre))
        .where(col("fold") > 0)
        .withColumn("pred_cents", expr("s_train div n_train"))
      val mae = ev
        .withColumn("fold", least(expr(s"(ts - ${t0}L) * 4 div ${span}L"),
          lit(3L)))
        .join(broadcast(withTrain.select("event_type", "fold", "pred_cents")),
          Seq("event_type", "fold"))
        .groupBy("event_type", "fold")
        .agg(expr("sum(abs(cents - pred_cents)) div count(1)")
          .as("mae_cents"))
      withTrain.select("event_type", "fold", "n_train", "n", "pred_cents")
        .withColumnRenamed("n", "n_test")
        .join(mae, Seq("event_type", "fold"))
        .orderBy("event_type", "fold")
    }),

    // q248 — SUBJECT-ACCESS-REQUEST EXPORT (GDPR Art. 15): the
    // governance tier between q190's erasure and q184's k-anonymity —
    // "give me everything you hold about me". One pass over the
    // events stream gathers each requesting subject's complete
    // record: event count, activity interval, value total, type
    // breadth, and an INTEGRITY MANIFEST (md5 over the sorted event-id
    // list) the subject can later use to prove the export was
    // complete and to verify q190's erasure actually removed rows.
    // Requests arrive in batches (here: the user_id % 100 = 7
    // cohort); the whole export is one partial-agg groupBy — the
    // manifest's collect_list is bounded by the subject's own row
    // count, never corpus-sized.
    "q248_sar_export" -> ((s, d) =>
      events(s, d)
        .where(col("user_id") % 100 === 7)
        .withColumn("cents", expr("cast(round(value * 100) as bigint)"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("first_ts"), max("ts").as("last_ts"),
          sum("cents").as("total_cents"),
          countDistinct("event_type").as("n_types"),
          md5(concat_ws(",",
            transform(array_sort(collect_list(col("event_id"))),
              x => x.cast("string")))).as("manifest_md5"))
        .orderBy("user_id")),

    // q241 — SPLIT-CONFORMAL COVERAGE: the distribution-free
    // uncertainty wrapper for any scorer — calibrate a nonconformity
    // threshold q̂ = the ⌈(n+1)(1−α)⌉-th smallest calibration score,
    // then the set {s ≤ q̂} covers fresh points with probability
    // ≥ 1−α (exchangeability only; no model assumptions). Here the
    // scorer is q237's hard-sigmoid propensity, nonconformity is
    // |p − y|, the calibration/test split is the even/odd event_id
    // coin, α = 0.1 (exact-integer ceil: k = ((n+1)·9 + 9) div 10).
    // The order statistic comes from a cumsum over the bounded
    // nonconformity histogram (≤10⁶+1 cells — never a corpus sort),
    // the coverage check is one broadcast of the 1-row threshold to
    // the test side. The gated output pins the threshold AND the
    // realized test coverage — which must land ≥ ~1−α for the
    // implementation to be honest.
    "q241_conformal_coverage" -> ((s, d) => {
      val wCum = Window.orderBy("sc")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val scored = events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select(col("event_id"),
          expr("cast(round(value * 100) as bigint)").as("cents"),
          when(col("event_type") === "purchase", 1000000L)
            .otherwise(0L).as("ym"))
        .withColumn("p_micro",
          least(greatest(expr("(cents - 25000) * 1000000 div 20000 div 4 " +
            "+ 500000"), lit(0L)), lit(1000000L)))
        .select((col("event_id") % 2).as("side"),
          abs(col("p_micro") - col("ym")).as("sc"))
      val thr = scored.where(col("side") === 0)
        .groupBy("sc").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(wCum))
        .withColumn("ncal", sum("c").over(wAll))
        .agg(max("ncal").as("n_cal"),
          max(expr("((ncal + 1) * 9 + 9) div 10")).as("k"),
          min(when(expr("cum >= ((ncal + 1) * 9 + 9) div 10"),
            col("sc"))).as("qhat"))
      scored.where(col("side") === 1)
        .crossJoin(broadcast(thr))
        .agg(max("n_cal").as("n_cal"), max("k").as("k"),
          max("qhat").as("qhat"), count(lit(1)).as("n_test"),
          sum(when(col("sc") <= col("qhat"), 1L).otherwise(0L))
            .as("n_covered"))
        .select(col("n_cal"), col("k"), col("qhat"), col("n_test"),
          col("n_covered"),
          expr("n_covered * 1000000 div n_test").as("coverage_micro"))
    }),

    // q223 — POPULATION STABILITY INDEX drift monitor: the standard
    // train-vs-serve (or window-vs-window) distribution-shift metric,
    // PSI = Σ_bins (p−q)·ln(p/q), computed per event_type over fixed
    // $5 value bins. Here the reference/current split is an md5 coin
    // on event_id (deterministic harness stand-in for the production
    // contract: reference window vs current window). All arithmetic
    // is exact-integer: p−q as the exact rational (a·B − b·A)/(A·B),
    // ln(p/q) as a difference of micro-logs of exact bigints (the
    // q77 idiom), cross products in decimal(38) (HUGEINT in the
    // oracle), truncating integer division last. Bins empty on either
    // side are excluded (the ε-free contract; n_bins reports how many
    // contributed). Plan: one scan-side projection (md5 + clamp), ONE
    // partial-agg shuffle of (type, bin) cells — the per-type totals
    // and PSI fold over the ≤ |types|·20-row cell table, broadcast
    // back. At 100 TB this is a single map-combined aggregation.
    "q223_psi_drift" -> ((s, d) => {
      val binned = events(s, d)
        .select(col("event_type"),
          (conv(substring(md5(concat(lit("psi:"),
            col("event_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 2).as("side"),
          least(greatest(expr("cast(round(value * 100) as bigint) div 500"),
            lit(0L)), lit(19L)).as("bin"))
      val cells = binned.groupBy("event_type", "bin")
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("a"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("b"))
      val totals = cells.groupBy("event_type")
        .agg(sum("a").as("ta"), sum("b").as("tb"))
      // double/decimal-first products: a·B etc. stay exact (< 2⁵³ per
      // factor) without ever forming an int64 product that overflows
      // at petabyte row counts
      cells.join(broadcast(totals), "event_type")
        .where(col("a") > 0 && col("b") > 0)
        .select(col("event_type"),
          (floor(log(col("a").cast("double") * col("tb")) * 1000000)
            .cast("long") -
            floor(log(col("b").cast("double") * col("ta")) * 1000000)
              .cast("long")).as("l"),
          col("a"), col("b"), col("ta"), col("tb"))
        .select(col("event_type"),
          expr("(cast(a as decimal(38,0)) * tb - cast(b as decimal(38,0)) " +
            "* ta) * l div (cast(ta as decimal(38,0)) * tb)")
            .as("term"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_bins"), sum("term").as("psi_micro"))
        .orderBy("event_type")
    }),

    // q337 — CHI-SQUARE INDEPENDENCE + CRAMÉR'S V: is event_type
    // independent of the user cohort (user_id % 4) — the categorical
    // association test beside q238's continuous KS and q195's mutual
    // information. χ² = Σ_cells (O·N − r·c)²·10⁶ div (N·r·c), the
    // per-cell floored-micro sum BOTH engines compute identically
    // (products in decimal(38): O·N is rows² — 10¹⁹-safe to ~3·10⁹
    // rows, the per-partition cell count at 100 TB after the
    // partial agg). ZERO cells matter (they contribute r·c·10⁶/N), so
    // the full type × cohort grid is built by crossing the two
    // BOUNDED margin tables and left-joining observed counts.
    // V² = χ²/(N·(min(rows,cols)−1)) in the same micros. Plan: one
    // partial-agg shuffle of ≤ |types|·|cohorts| cells; margins and
    // the grid are broadcast-sized.
    "q337_chisq_cramers" -> ((s, d) => {
      val cell = events(s, d)
        .select(col("event_type").as("t"), (col("user_id") % 4).as("b"))
        .groupBy("t", "b").agg(count(lit(1)).as("o"))
      val rows = cell.groupBy("t").agg(sum("o").as("r"))
      val cols = cell.groupBy("b").agg(sum("o").as("c"))
      val tot = cell.agg(sum("o").as("n"))
      rows.crossJoin(broadcast(cols))
        .join(cell, Seq("t", "b"), "left")
        .crossJoin(broadcast(tot))
        .select(col("t"), col("b"), col("r"), col("c"), col("n"),
          coalesce(col("o"), lit(0L)).as("o"))
        .select(col("t"), col("b"), col("n"),
          expr("cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c")
            .as("dlt"), col("r"), col("c"))
        .select(col("t"), col("b"), col("n"),
          expr("dlt * dlt * 1000000 div (cast(n as decimal(38,0)) * r * c)")
            .as("term"))
        .agg(max("n").as("nn"), countDistinct("t").as("nt"),
          countDistinct("b").as("nb"), sum("term").as("chi2"))
        .select(col("nn").as("n"),
          ((col("nt") - 1) * (col("nb") - 1)).as("dof"),
          col("chi2").cast("long").as("chi2_micro"),
          expr("cast(chi2 div (nn * (least(nt, nb) - 1)) as bigint)")
            .as("v2_micro"))
    }),

    // q338 — EXPECTED CALIBRATION ERROR: the one-number summary of
    // q237's reliability diagram — ECE = Σ_b n_b·|pos_rate_b −
    // mean_p_b| div N and MCE = max_b of the same gap, over the SAME
    // ten equal-width bins, the same hardσ propensity, the same
    // integer micros (per-bin rates are the floored micro divisions
    // q237 gates, so the two queries can never disagree about a bin).
    // Plan: identical to q237 — scan-side projection, one ≤ 10-cell
    // partial agg, then a driver-free single-row fold of the cells.
    "q338_ece_calibration" -> ((s, d) => {
      events(s, d)
        .where(col("event_type").isin("purchase", "click"))
        .select(expr("cast(round(value * 100) as bigint)").as("cents"),
          when(col("event_type") === "purchase", 1000000L)
            .otherwise(0L).as("ym"))
        .withColumn("p_micro",
          least(greatest(expr("(cents - 25000) * 1000000 div 20000 div 4 " +
            "+ 500000"), lit(0L)), lit(1000000L)))
        .withColumn("bin", least(expr("p_micro div 100000"), lit(9L)))
        .groupBy("bin")
        .agg(count(lit(1)).as("nb"),
          expr("sum(p_micro) div count(1)").as("mp"),
          expr("sum(ym) div count(1)").as("pr"))
        .agg(sum("nb").as("n"),
          expr("sum(nb * abs(pr - mp)) div sum(nb)").as("ece_micro"),
          max(expr("abs(pr - mp)")).as("mce_micro"))
    }),

    // q339 — FLEISS' KAPPA: multi-rater agreement per language — the
    // R > 2 generalization of q286's Cohen's kappa, the number an
    // annotation pipeline reads before trusting its label pool. Three
    // deterministic raters assign one of four categories per document
    // (md5("fk:r:doc_id") — seedless, engine-exact). EXACT rational
    // arithmetic with every division last: with A = Σ_i Σ_j n_ij² −
    // nR (so P̄ = A/D1, D1 = nR(R−1)) and B = Σ_j C_j² (so P̄_e =
    // B/D2, D2 = (nR)²), κ = (A·D2 − B·D1)/(D1·(D2 − B)) — integer
    // numerator and denominator in decimal(38), one sign-aware micro
    // division at the end (both engines truncate toward zero, so the
    // κ < 0 worse-than-chance case crosses the gate exactly). The
    // all-agree B = D2 edge reports κ = 10⁶. Plan: per-(doc, cat)
    // counts partial-agg to per-doc ssq, then per-lang single-row
    // folds — the rating table is the only corpus-sized stage.
    "q339_fleiss_kappa" -> ((s, d) => {
      val ratings = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(0), lit(2))).as("r"))
        .withColumn("cat",
          conv(substring(md5(concat(lit("fk:"), col("r").cast("string"),
            lit(":"), col("doc_id").cast("string"))), 1, 4), 16, 10)
            .cast("long") % 4)
      val perDoc = ratings.groupBy("lang", "doc_id", "cat")
        .agg(count(lit(1)).as("nij"))
      val aLeg = perDoc.groupBy("lang")
        .agg(sum(expr("nij * nij")).as("ssq"),
          countDistinct("doc_id").as("n_items"))
        .select(col("lang"), col("n_items"),
          (col("ssq") - col("n_items") * 3L).as("a"))
      val bLeg = perDoc.groupBy("lang", "cat")
        .agg(sum("nij").as("cj"))
        .groupBy("lang")
        .agg(sum(expr("cast(cj as decimal(38,0)) * cj")).as("b"))
      aLeg.join(bLeg, "lang")
        .select(col("lang"), col("n_items"),
          expr("cast(n_items * 3 as decimal(38,0))").as("nr"), col("a"),
          col("b"))
        .select(col("lang"), col("n_items"),
          expr("cast(a as decimal(38,0)) * (nr * nr) - b * (nr * 2)")
            .as("num"),
          expr("(nr * 2) * (nr * nr - b)").as("den"))
        .select(col("lang"), col("n_items"),
          expr("cast(case when den = 0 then 1000000 " +
            "when num >= 0 then (num * 1000000) div den " +
            "else -((-num * 1000000) div den) end as bigint)")
            .as("kappa_micro"))
        .orderBy("lang")
    }),

    // q340 — ONE-WAY ANOVA F: does mean value differ across the five
    // event types — the k-group generalization of q161's two-sample
    // z-test, on the same cents domain. Sums-of-squares via the exact
    // integer identities SST·N = N·Q − S² and SSW·n_g = n_g·Q_g −
    // S_g² (squares in decimal(38): Q is rows·cents² — 10¹⁹-safe well
    // past the bench scale, and the per-group products stay bounded
    // because the corpus collapses to k = |types| cells first).
    // Floored cents² units (micro precision is noise at this
    // magnitude); ssb = greatest(sst − ssw, 0) so the floor residue
    // can never push a zero-effect F negative; F_micro =
    // ssb·(N−k)·10⁶ div (ssw·(k−1)). Plan: ONE partial-agg shuffle to
    // k cells, then a single-row fold.
    "q340_anova_f" -> ((s, d) => {
      events(s, d)
        .select(col("event_type").as("g"),
          expr("cast(round(value * 100) as bigint)").as("x"))
        .groupBy("g")
        .agg(count(lit(1)).as("ng"), sum("x").as("sg"),
          sum(expr("cast(x as decimal(38,0)) * x")).as("qg"))
        .select(col("ng"), col("sg"), col("qg"),
          expr("(qg * ng - cast(sg as decimal(38,0)) * sg) div ng")
            .as("sswg"))
        .agg(sum("ng").as("n"), count(lit(1)).as("k"),
          sum("sg").as("st"), sum("qg").as("qt"), sum("sswg").as("ssw"))
        .select(col("n"), col("k"), col("ssw"),
          expr("(qt * n - cast(st as decimal(38,0)) * st) div n").as("sst"))
        .select(col("n"), col("k"),
          col("ssw").cast("long").as("ssw_c2"),
          expr("cast(greatest(sst - ssw, 0) as bigint)").as("ssb_c2"))
        .select(col("n"), col("k"), col("ssw_c2"), col("ssb_c2"),
          expr("cast(cast(ssb_c2 as decimal(38,0)) * (n - k) * 1000000 " +
            "div (greatest(ssw_c2, 1) * (k - 1)) as bigint)").as("f_micro"))
    }),

    // q341 — DIFFERENCE-IN-DIFFERENCES: the panel-data causal
    // estimator next to q175's CUPED and q284's IPW — treatment =
    // user_id % 2, post-period = day ≥ 19738 (Jan 16, the window
    // midpoint, pinned), outcome = mean cents per (type, period,
    // arm). DiD = (post_t − pre_t) − (post_c − pre_c) over the four
    // floored micro-cent means (subtraction only — no division ever
    // sees a negative). Plan: one partial-agg shuffle to 4 cells per
    // type, then a bounded pivot fold; the day and arm keys are
    // scan-side integer arithmetic.
    "q341_diff_in_diff" -> ((s, d) => {
      events(s, d)
        .select(col("event_type"),
          (expr("ts div 86400000000000") >= 19738L).cast("long").as("post"),
          (col("user_id") % 2).as("treat"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
        .groupBy("event_type", "post", "treat")
        .agg(sum("cents").as("sc"), count(lit(1)).as("nc"))
        .withColumn("m", expr("sc * 1000000 div nc"))
        .groupBy("event_type")
        .agg(max(when(col("post") === 0 && col("treat") === 0, col("m")))
            .as("m_pre_ctl"),
          max(when(col("post") === 1 && col("treat") === 0, col("m")))
            .as("m_post_ctl"),
          max(when(col("post") === 0 && col("treat") === 1, col("m")))
            .as("m_pre_trt"),
          max(when(col("post") === 1 && col("treat") === 1, col("m")))
            .as("m_post_trt"))
        .select(col("event_type"), col("m_pre_ctl"), col("m_post_ctl"),
          col("m_pre_trt"), col("m_post_trt"),
          ((col("m_post_trt") - col("m_pre_trt"))
            - (col("m_post_ctl") - col("m_pre_ctl"))).as("did_micro"))
        .orderBy("event_type")
    }),

    // q344 — FUNCTIONAL-DEPENDENCY AUDIT: does LHS determine RHS —
    // the schema-discovery profiling pass beside q280's referential
    // integrity and q214's column profile, over three candidate FDs
    // a warehouse would actually check. Per FD: LHS group count,
    // groups violating (> 1 distinct RHS), and the classic g₃ error
    // (minimum rows to delete for the FD to hold = Σ_g (n_g −
    // max-RHS-count_g)). Plan: one partial-agg shuffle to (lhs, rhs)
    // cells per table, a second bounded one to lhs groups, then a
    // 3-row union — never a distinct over raw rows.
    "q344_fd_audit" -> ((s, d) => {
      def fd(df: DataFrame, lhs: String, rhs: String, name: String)
      : DataFrame =
        df.groupBy(col(lhs).as("l"), col(rhs).cast("string").as("rv"))
          .agg(count(lit(1)).as("c"))
          .groupBy("l").agg(sum("c").as("tot"), max("c").as("mx"),
            count(lit(1)).as("ndv"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("ndv") > 1, 1L).otherwise(0L)).as("viol_groups"),
            sum(col("tot") - col("mx")).as("g3_rows"))
          .select(lit(name).as("fd"), col("n_groups"), col("viol_groups"),
            col("g3_rows"))
      fd(Tables.load(s, d, "documents"), "source", "lang",
        "documents:source->lang")
        .unionByName(fd(Tables.load(s, d, "orders"), "o_custkey",
          "o_orderstatus", "orders:o_custkey->o_orderstatus"))
        .unionByName(fd(Tables.load(s, d, "lineitem"), "l_orderkey",
          "l_returnflag", "lineitem:l_orderkey->l_returnflag"))
        .orderBy("fd")
    }),

    // q345 — McNEMAR PAIRED TEST: did the same users' purchase
    // behavior change across q341's day-19738 pivot — the
    // within-subject complement to the between-arm z-test (q161):
    // only the DISCORDANT pairs carry signal. Per user: purchased in
    // pre / in post as two binaries (one partial-agg shuffle on
    // user_id); b = pre-only, c = post-only; χ² = (b−c)²·10⁶ div
    // greatest(b+c, 1) — exact integers, the square in decimal(38)
    // for petabyte-user counts. Single-row fold over the four bounded
    // concordance cells.
    "q345_mcnemar" -> ((s, d) => {
      events(s, d)
        .select(col("user_id"),
          (expr("ts div 86400000000000") >= 19738L).cast("long").as("post"),
          (col("event_type") === "purchase").cast("long").as("p"))
        .groupBy("user_id")
        .agg(max(when(col("post") === 0, col("p")).otherwise(0L)).as("pre"),
          max(when(col("post") === 1, col("p")).otherwise(0L)).as("pst"))
        .agg(count(lit(1)).as("n_users"),
          sum(expr("case when pre = 1 and pst = 1 then 1 else 0 end"))
            .as("n_both"),
          sum(expr("case when pre = 1 and pst = 0 then 1 else 0 end"))
            .as("b_pre_only"),
          sum(expr("case when pre = 0 and pst = 1 then 1 else 0 end"))
            .as("c_post_only"))
        .select(col("n_users"), col("n_both"), col("b_pre_only"),
          col("c_post_only"),
          expr("cast(cast(b_pre_only - c_post_only as decimal(38,0)) " +
            "* (b_pre_only - c_post_only) * 1000000 " +
            "div greatest(b_pre_only + c_post_only, 1) as bigint)")
            .as("mcnemar_micro"))
    }),

    // q346 — SEQUENTIAL 2-PATTERN MINING: frequent "a … then b within
    // the next 3 events" patterns with support counted in DISTINCT
    // USERS — the PrefixSpan first level, distinct from q113's
    // contiguous Markov transitions (gap-tolerant) and q270's
    // unordered basket rules (ordered). Plan: ONE user-keyed shuffle;
    // three lead() offsets over the per-user event order (ts,
    // event_id — fully deterministic ties) generate gap-1..3
    // occurrences scan-side, per-user pattern de-dup is a partial-agg
    // distinct on (user, a, b), and the support table is bounded by
    // |types|² — the corpus never self-joins.
    "q346_seq2_mining" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val led = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("a"))
        .withColumn("n1", lead("a", 1).over(w))
        .withColumn("n2", lead("a", 2).over(w))
        .withColumn("n3", lead("a", 3).over(w))
      Seq("n1", "n2", "n3")
        .map(c => led.where(col(c).isNotNull)
          .select(col("user_id"), col("a"), col(c).as("b")))
        .reduce(_ unionByName _)
        .distinct()
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
        .orderBy("a", "b")
    }),

    // q350 — MANTEL–HAENSZEL POOLED ODDS RATIO: the stratified 2×2
    // estimator that answers the confounding q319's Simpson audit
    // flags — exposure = user arm, outcome = value ≥ 100, strata =
    // event_type. OR_MH = Σ(a_i·d_i/n_i) / Σ(b_i·c_i/n_i) with each
    // stratum term a floored micro (products in decimal(38) — rows²
    // per stratum at scale), the closing ratio one more truncating
    // division; a zero pooled denominator reports −1 in both engines.
    // Plan: ONE partial-agg shuffle to 4 cells per stratum, bounded
    // folds after.
    "q350_mantel_haenszel" -> ((s, d) => {
      events(s, d)
        .select(col("event_type"), (col("user_id") % 2).as("t"),
          (col("value") >= 100.0).cast("long").as("y"))
        .groupBy("event_type")
        .agg(sum(expr("case when t = 1 and y = 1 then 1 else 0 end"))
            .as("a"),
          sum(expr("case when t = 1 and y = 0 then 1 else 0 end")).as("b"),
          sum(expr("case when t = 0 and y = 1 then 1 else 0 end")).as("c"),
          sum(expr("case when t = 0 and y = 0 then 1 else 0 end")).as("dd"),
          count(lit(1)).as("n"))
        .select(
          expr("cast(a as decimal(38,0)) * dd * 1000000 div n").as("tn"),
          expr("cast(b as decimal(38,0)) * c * 1000000 div n").as("td"))
        .agg(count(lit(1)).as("n_strata"),
          sum("tn").as("num"), sum("td").as("den"))
        .select(col("n_strata"),
          col("num").cast("long").as("num_micro"),
          col("den").cast("long").as("den_micro"),
          expr("cast(case when den = 0 then -1 " +
            "else num * 1000000 div den end as bigint)").as("ormh_micro"))
    }),

    // q351 — BROWN–FORSYTHE VARIANCE EQUALITY: do the event types
    // share a SPREAD (q340 asks about means) — the robust Levene
    // variant: per-type lower MEDIAN from the bounded cents histogram
    // (2·cum ≥ n, division-free), then q340's exact integer ANOVA
    // identities on z = |x − med_g|. Two partial-agg shuffles (the
    // histogram, then the z cells) and bounded folds — the corpus is
    // never sorted per group.
    "q351_levene_bf" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val wc = W.partitionBy("g").orderBy("x")
        .rowsBetween(W.unboundedPreceding, 0)
      val wt = W.partitionBy("g")
      val ev = events(s, d).select(col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("x"))
      val med = ev.groupBy("g", "x").agg(count(lit(1)).as("w"))
        .withColumn("cum", sum("w").over(wc))
        .withColumn("n", sum("w").over(wt))
        .where(expr("cum * 2 >= n"))
        .groupBy("g").agg(min("x").as("med"))
      ev.join(broadcast(med), "g")
        .select(col("g"), abs(col("x") - col("med")).as("z"))
        .groupBy("g")
        .agg(count(lit(1)).as("ng"), sum("z").as("sg"),
          sum(expr("cast(z as decimal(38,0)) * z")).as("qg"))
        .select(col("ng"), col("sg"), col("qg"),
          expr("(qg * ng - cast(sg as decimal(38,0)) * sg) div ng")
            .as("sswg"))
        .agg(sum("ng").as("n"), count(lit(1)).as("k"),
          sum("sg").as("st"), sum("qg").as("qt"), sum("sswg").as("ssw"))
        .select(col("n"), col("k"), col("ssw"),
          expr("(qt * n - cast(st as decimal(38,0)) * st) div n").as("sst"))
        .select(col("n"), col("k"),
          col("ssw").cast("long").as("ssw_c2"),
          expr("cast(greatest(sst - ssw, 0) as bigint)").as("ssb_c2"))
        .select(col("n"), col("k"), col("ssw_c2"), col("ssb_c2"),
          expr("cast(cast(ssb_c2 as decimal(38,0)) * (n - k) * 1000000 " +
            "div (greatest(ssw_c2, 1) * (k - 1)) as bigint)").as("f_micro"))
    }),

    // q352 — COCHRAN'S Q: did the same users' purchase behavior
    // change across THREE ten-day windows — the k > 2 generalization
    // of q345's McNemar (which it reduces to at k = 2), on correlated
    // binaries. The division-free identity Q = (k−1)(k·ΣC_j² − N²) /
    // (k·N − ΣR_i²) keeps everything integer until one micro
    // division (k = 3 pinned; C_j = per-window positives, R_i =
    // per-user positives, N = ΣR). ONE user-keyed partial agg to
    // (user, 3 binaries), bounded folds after; a degenerate
    // denominator (every user all-or-nothing) reports −1.
    "q352_cochran_q" -> ((s, d) => {
      events(s, d)
        .select(col("user_id"),
          least(expr("(ts div 86400000000000 - 19723) div 10"), lit(2L))
            .as("win"),
          (col("event_type") === "purchase").cast("long").as("p"))
        .groupBy("user_id")
        .agg(max(when(col("win") === 0, col("p")).otherwise(0L)).as("x1"),
          max(when(col("win") === 1, col("p")).otherwise(0L)).as("x2"),
          max(when(col("win") === 2, col("p")).otherwise(0L)).as("x3"))
        .agg(count(lit(1)).as("n_users"),
          sum("x1").as("c1"), sum("x2").as("c2"), sum("x3").as("c3"),
          sum(expr("(x1 + x2 + x3) * (x1 + x2 + x3)")).as("r2"))
        .select(col("n_users"), col("c1"), col("c2"), col("c3"),
          expr("cast(case when 3 * (c1 + c2 + c3) - r2 = 0 then -1 else " +
            "2 * (3 * (cast(c1 as decimal(38,0)) * c1 " +
            "+ cast(c2 as decimal(38,0)) * c2 " +
            "+ cast(c3 as decimal(38,0)) * c3) " +
            "- cast(c1 + c2 + c3 as decimal(38,0)) * (c1 + c2 + c3)) " +
            "* 1000000 div (3 * (c1 + c2 + c3) - r2) end as bigint)")
            .as("q_micro"))
    }),

    // q359 — LAST-DIGIT UNIFORMITY AUDIT: the fraud screen NEXT TO
    // q198's Benford first-digit test — genuine measurement noise
    // makes the LAST digit of cents uniform, and a fabricator's
    // round-number habit breaks exactly that. Per type: χ² against
    // uniform over the 10-digit domain, per-cell floored micros
    // ((10·O − N)²·10⁶ div (10·N), the q337 defined metric with
    // E = N/10), ZERO digits included via the broadcast 10-row digit
    // grid. One ≤ |types|·10-cell partial agg.
    "q359_last_digit_audit" -> ((s, d) => {
      val obs = events(s, d)
        .select(col("event_type"),
          expr("cast(round(value * 100) as bigint) % 10").as("dig"))
        .groupBy("event_type", "dig").agg(count(lit(1)).as("o"))
      val tot = obs.groupBy("event_type").agg(sum("o").as("n"))
      val digs = s.range(0, 10).select(col("id").as("dig"))
      tot.crossJoin(broadcast(digs))
        .join(obs, Seq("event_type", "dig"), "left")
        .select(col("event_type"), col("n"),
          coalesce(col("o"), lit(0L)).as("o"))
        .select(col("event_type"), col("n"),
          expr("cast((cast(o as decimal(38,0)) * 10 - n) " +
            "* (cast(o as decimal(38,0)) * 10 - n) * 1000000 " +
            "div (cast(n as decimal(38,0)) * 10) as bigint)").as("term"))
        .groupBy("event_type")
        .agg(max("n").as("n"), sum("term").as("chi2"))
        .select(col("event_type"), col("n"),
          col("chi2").cast("long").as("chi2_micro"), lit(9L).as("dof"))
        .orderBy("event_type")
    }),

    // q363 — T-CLOSENESS AUDIT: the third rung of the release-gate
    // ladder (q184 k-anonymity → q354 l-diversity → here): a cell can
    // have enough people AND diverse sensitive values and still leak
    // when its DISTRIBUTION skews far from the table's — t-closeness
    // bounds the Earth-Mover's Distance between cell and global
    // distributions over the ORDERED sensitive attribute (spend band,
    // q354's cents div 10⁴). For ordered categories EMD is the exact
    // rational Σ_k |cum_cell − cum_glob| / (B−1) — computed with the
    // common-denominator integer form |cumc·Ng − cumg·Nc| (every
    // product decimal(38,0)/HUGEINT; cum × table-rows is rows² at
    // petabyte scale), one floored micro division per cell, B < 2
    // reporting the −1 sentinel in both engines. Plan: the cell×band
    // GRID is bounded (cells × global band domain, both
    // fixed-cardinality) and built from TWO partial-agg passes over
    // the corpus; the cum window partitions BY CELL (bounded rows
    // per partition = |bands|), never globally.
    "q363_t_closeness" -> ((s, d) => {
      val b = events(s, d).select(col("event_type"),
        expr("ts div 86400000000000").as("day"),
        expr("cast(round(value * 100) as bigint) div 10000").as("band"))
      val cellBand = b.groupBy("event_type", "day", "band")
        .agg(count(lit(1)).as("o"))
      val glob = b.groupBy("band").agg(count(lit(1)).as("gb"))
      val tot = glob.agg(sum("gb").as("ng"), count(lit(1)).as("nbq"))
      val cells = b.groupBy("event_type", "day").agg(count(lit(1)).as("nc"))
      val wc = Window.partitionBy("event_type", "day").orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
      val perCell = cells.crossJoin(broadcast(glob))
        .join(cellBand, Seq("event_type", "day", "band"), "left")
        .na.fill(0L, Seq("o"))
        .withColumn("cumc", sum("o").over(wc))
        .withColumn("cumg", sum("gb").over(wc))
        .crossJoin(broadcast(tot))
        .withColumn("term", expr("abs(cast(cumc as decimal(38,0)) * ng " +
          "- cast(cumg as decimal(38,0)) * nc)"))
        .groupBy("event_type", "day")
        .agg(max("nc").as("nc"), max("ng").as("ngx"),
          max("nbq").as("nb"), sum("term").as("emd_num"))
        .select(col("event_type"), col("day"),
          expr("cast(case when nb >= 2 then emd_num * 1000000 div " +
            "(cast(nb - 1 as decimal(38,0)) * nc * ngx) " +
            "else -1 end as bigint)").as("emd_micro"))
      perCell.groupBy("event_type")
        .agg(count(lit(1)).as("n_cells"),
          max("emd_micro").as("max_emd_micro"),
          sum(when(col("emd_micro") > 150000L, 1L).otherwise(0L))
            .as("n_fail_t15"))
        .orderBy("event_type")
    }),

    // q364 — JACKKNIFE VARIANCE (delete-one-day): the deterministic
    // resampling estimator NEXT TO q233's hash-seeded Poisson
    // bootstrap — leave-one-group-out is canonical when the data has
    // natural blocks (days) and needs NO randomness, so the gate is
    // exact end-to-end. Metric: the q319 conversion rate
    // (cents ≥ 5000) per type; θ_(i) = (S−s_i)·10⁶ div (N−n_i) on
    // the FLOORED-MICRO scale (the gate contract — both engines
    // replay identical floors), var_jk = (g−1)·(g·Σθ² − (Σθ)²) div g²
    // in micro², spread = max−min θ. A single-day type (g = 1, no
    // leave-one-out possible) reports the −1 sentinels. Every product
    // decimal(38,0)/HUGEINT. Plan: ONE (type, day)-keyed partial agg
    // over the corpus; everything after runs on the bounded
    // type×day table.
    "q364_jackknife_day" -> ((s, d) => {
      val perDay = events(s, d).select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          when(expr("cast(round(value * 100) as bigint)") >= 5000L, 1L)
            .otherwise(0L).as("succ"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).as("ni"), sum("succ").as("si"))
      val totals = perDay.groupBy("event_type")
        .agg(sum("ni").as("n"), sum("si").as("st"), count(lit(1)).as("g"))
      val loo = perDay.join(totals, "event_type")
        .where(col("n") > col("ni"))
        .select(col("event_type"),
          expr("cast(st - si as decimal(38,0)) * 1000000 div (n - ni)")
            .as("theta"))
      val jk = loo.groupBy("event_type")
        .agg(count(lit(1)).as("gj"), sum("theta").as("sth"),
          sum(expr("cast(theta as decimal(38,0)) * theta")).as("sth2"),
          max("theta").as("thmax"), min("theta").as("thmin"))
      totals.join(jk, Seq("event_type"), "left")
        .select(col("event_type"), col("g").as("g_days"),
          expr("cast(cast(st as decimal(38,0)) * 1000000 div n as bigint)")
            .as("theta_micro"),
          expr("cast(case when gj >= 2 then (gj - 1) * " +
            "(cast(gj as decimal(38,0)) * sth2 - " +
            "cast(sth as decimal(38,0)) * sth) div " +
            "(cast(gj as decimal(38,0)) * gj) " +
            "else -1 end as bigint)").as("jk_var_micro2"),
          expr("cast(case when gj >= 2 then thmax - thmin " +
            "else -1 end as bigint)").as("jk_spread_micro"))
        .orderBy("event_type")
    }),

    // q365 — IPF RAKING (iterative proportional fitting): the survey
    // statistician's reweighting workhorse, here as the dataset
    // BALANCER a training-data mix needs — per-cell weights over the
    // (event_type × day-of-week) grid raked so BOTH weighted
    // marginals approach uniform targets, without touching the joint
    // structure (each round scales whole rows/columns — the
    // max-entropy fit to the marginal constraints). EXACT integers:
    // micro-scale weights, fixed targets T_k = ⌊M·10⁶/K⌋ computed
    // once, each round w′ = ⌊w·T_k / marg_k⌋ with every product
    // decimal(38,0)/HUGEINT, three rounds (row, col, row) unrolled in
    // BOTH engines — floors replayed, so the gate is exact despite
    // the iteration. Plan: ONE corpus-keyed partial agg builds the
    // bounded grid (|types|·7 cells); every round after is a
    // grid-sized groupBy + join with lineage truncated per round (the
    // q358 mat idiom). The corpus is touched exactly once.
    "q365_ipf_raking" -> ((s, d) => {
      def mat(df: DataFrame): DataFrame =
        if (s.sparkContext.getCheckpointDir.isDefined)
          df.checkpoint(eager = true) else df.localCheckpoint(true)
      val g0 = events(s, d).select(col("event_type"),
          expr("(ts div 86400000000000) % 7").as("dow"))
        .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
      val tot = g0.agg(sum("n").as("ntot"),
        countDistinct("event_type").as("nr"), countDistinct("dow").as("nc"))
      def step(df: DataFrame, key: String, nK: String): DataFrame = {
        val m = df.groupBy(key)
          .agg(sum(expr("cast(n as decimal(38,0)) * w")).as("marg"))
        mat(df.join(m, Seq(key))
          .withColumn("w", expr("cast(cast(w as decimal(38,0)) * " +
            s"(cast(ntot as decimal(38,0)) * 1000000 div $nK) " +
            "div marg as bigint)"))
          .drop("marg"))
      }
      val w0 = mat(g0.crossJoin(broadcast(tot))
        .withColumn("w", lit(1000000L)))
      val w3 = step(step(step(w0, "event_type", "nr"), "dow", "nc"),
        "event_type", "nr")
      w3.select(col("event_type"), col("dow"), col("n"),
          col("w").as("w_micro"),
          expr("cast(cast(n as decimal(38,0)) * w div 1000000 as bigint)")
            .as("fitted_mass"))
        .orderBy("event_type", "dow")
    }))

  val oracleSql: Map[String, String] = Map(
    // rank-sum identity over the cents histogram; HUGEINT products
    // mirror the decimal(38) sums, // truncates like Spark div
    "q236_exact_auc" ->
      ("WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y " +
        "FROM events WHERE event_type IN ('purchase', 'click')), " +
        "h AS (SELECT cents, SUM(y) AS np, SUM(1 - y) AS nn " +
        "FROM b GROUP BY 1), " +
        "c AS (SELECT cents, np, nn, COALESCE(SUM(nn) OVER (" +
        "ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING" +
        "), 0) AS cum_nn FROM h) " +
        "SELECT CAST(SUM(np) AS BIGINT) AS n_pos, " +
        "CAST(SUM(nn) AS BIGINT) AS n_neg, " +
        "CAST(SUM(np::HUGEINT * (2 * cum_nn + nn)) * 1000000 " +
        "// (2 * SUM(np)::HUGEINT * SUM(nn)) AS BIGINT) AS auc_micro " +
        "FROM c"),
    // identical hard-sigmoid chain (chained // matches chained div),
    // HUGEINT squared-error sum
    "q237_calibration_brier" ->
      ("WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents, " +
        "CASE WHEN event_type = 'purchase' THEN 1000000 ELSE 0 END AS ym " +
        "FROM events WHERE event_type IN ('purchase', 'click')), " +
        "p AS (SELECT ym, LEAST(GREATEST(" +
        "(cents - 25000) * 1000000 // 20000 // 4 + 500000, 0), 1000000" +
        ") AS p_micro FROM b), " +
        "g AS (SELECT LEAST(p_micro // 100000, 9) AS bin, ym, p_micro " +
        "FROM p) " +
        "SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n, " +
        "CAST(SUM(p_micro) // COUNT(*) AS BIGINT) AS mean_p_micro, " +
        "CAST(SUM(ym) // COUNT(*) AS BIGINT) AS pos_rate_micro, " +
        "CAST(SUM((p_micro - ym)::HUGEINT * (p_micro - ym)) " +
        "// (COUNT(*) * 1000000) AS BIGINT) AS brier_micro " +
        "FROM g GROUP BY 1 ORDER BY 1"),
    // exact rational CDF gap over the shared histogram; at_cents =
    // smallest cents achieving the max
    "q238_ks_test" ->
      ("WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y " +
        "FROM events WHERE event_type IN ('purchase', 'click')), " +
        "h AS (SELECT cents, SUM(y) AS c1, SUM(1 - y) AS c2 " +
        "FROM b GROUP BY 1), " +
        "c AS (SELECT cents, " +
        "SUM(c1) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING " +
        "AND CURRENT ROW) AS cum1, " +
        "SUM(c2) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING " +
        "AND CURRENT ROW) AS cum2, " +
        "SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2 FROM h), " +
        "dd AS (SELECT cents, n1, n2, " +
        "abs(cum1::HUGEINT * n2 - cum2::HUGEINT * n1) AS diffn FROM c), " +
        "m AS (SELECT cents, n1, n2, diffn, MAX(diffn) OVER () AS dmax " +
        "FROM dd) " +
        "SELECT CAST(MAX(n1) AS BIGINT) AS n1, " +
        "CAST(MAX(n2) AS BIGINT) AS n2, " +
        "CAST(MAX(dmax) * 1000000 // (MAX(n1)::HUGEINT * MAX(n2)) " +
        "AS BIGINT) AS ks_micro, " +
        "CAST(MIN(CASE WHEN diffn = dmax THEN cents END) AS BIGINT) " +
        "AS at_cents FROM m"),
    // same daily cells, first-half baseline, prefix-sum CUSUM closed
    // form, first-alarm pick
    "q266_cusum_changepoint" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) // COUNT(*) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "r AS (SELECT event_type, day, x, " +
        "CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) " +
        "AS BIGINT) AS rk, " +
        "COUNT(*) OVER (PARTITION BY event_type) AS nd FROM dl), " +
        "m AS (SELECT event_type, day, x, rk, nd, " +
        "(SUM(CASE WHEN rk <= nd // 2 THEN x ELSE 0 END) OVER " +
        "(PARTITION BY event_type)) // (nd // 2) AS mu0 FROM r), " +
        "p0 AS (SELECT event_type, day, nd, mu0, x - mu0 - 100 AS dft " +
        "FROM m), " +
        "p1 AS (SELECT event_type, day, nd, mu0, " +
        "SUM(dft) OVER (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp " +
        "FROM p0), " +
        "p2 AS (SELECT event_type, day, nd, mu0, pp, " +
        "COALESCE(MIN(pp) OVER (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
        "AS pmin0 FROM p1), " +
        "s AS (SELECT event_type, day, nd, mu0, " +
        "GREATEST(0, pp - LEAST(0, pmin0)) AS s FROM p2) " +
        "SELECT event_type, CAST(MAX(nd) AS BIGINT) AS n_days, " +
        "CAST(MAX(mu0) AS BIGINT) AS mu0_cents, " +
        "CAST(MAX(s) AS BIGINT) AS max_cusum_cents, " +
        "CAST(MIN(CASE WHEN s > 1500 THEN day END) AS BIGINT) " +
        "AS alarm_day FROM s GROUP BY 1 ORDER BY event_type"),
    // same pairwise micro slopes on the daily table, lower-median
    // rank with (slope, day-pair) tie order
    "q267_theil_sen" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) // COUNT(*) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "sl AS (SELECT a.event_type, a.day AS day_a, b.day AS day_b, " +
        "(b.x - a.x) * 1000000 // (b.day - a.day) AS sl " +
        "FROM dl a JOIN dl b ON a.event_type = b.event_type " +
        "AND a.day < b.day), " +
        "r AS (SELECT event_type, sl, " +
        "CAST(row_number() OVER (PARTITION BY event_type " +
        "ORDER BY sl, day_a, day_b) AS BIGINT) AS rk, " +
        "COUNT(*) OVER (PARTITION BY event_type) AS np FROM sl) " +
        "SELECT event_type, CAST(MAX(np) AS BIGINT) AS n_pairs, " +
        "CAST(MAX(CASE WHEN rk = (np + 1) // 2 THEN sl END) AS BIGINT) " +
        "AS theil_slope_micro FROM r GROUP BY 1 ORDER BY event_type"),
    // same day-arithmetic lag join, 21-day split, HUGEINT cross ratio
    "q276_mase_eval" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) // COUNT(*) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "lg AS (SELECT event_type, day + 7 AS day, x AS px FROM dl), " +
        "d0 AS (SELECT event_type, MIN(day) AS d0 FROM dl GROUP BY 1), " +
        "er AS (SELECT event_type, day, abs(x - px) AS e, " +
        "day >= d0 + 21 AS is_test FROM dl " +
        "JOIN lg USING (event_type, day) JOIN d0 USING (event_type)), " +
        "ag AS (SELECT event_type, " +
        "SUM(CASE WHEN NOT is_test THEN e END) AS se_tr, " +
        "COUNT(CASE WHEN NOT is_test THEN 1 END) AS n_tr, " +
        "SUM(CASE WHEN is_test THEN e END) AS se_te, " +
        "COUNT(CASE WHEN is_test THEN 1 END) AS n_te " +
        "FROM er GROUP BY 1) " +
        "SELECT event_type, CAST(n_tr AS BIGINT) AS n_tr, " +
        "CAST(n_te AS BIGINT) AS n_te, " +
        "CAST(se_tr // n_tr AS BIGINT) AS mae_train_cents, " +
        "CAST(se_te // n_te AS BIGINT) AS mae_test_cents, " +
        "CASE WHEN se_tr > 0 AND n_te > 0 THEN " +
        "CAST(CAST(se_te AS HUGEINT) * n_tr * 1000000 " +
        "// (CAST(se_tr AS HUGEINT) * n_te) AS BIGINT) END " +
        "AS mase_micro FROM ag ORDER BY event_type"),
    // same consecutive-7 guard on the centered window, same per-dow
    // integer mean, same null gating
    "q277_stl_decompose" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) // COUNT(*) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "t AS (SELECT event_type, day, x, " +
        "CASE WHEN COUNT(*) OVER w = 7 " +
        "AND MAX(day) OVER w - MIN(day) OVER w = 6 " +
        "THEN CAST(SUM(x) OVER w // 7 AS BIGINT) END AS trend, " +
        "day % 7 AS dow FROM dl WINDOW w AS " +
        "(PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
        "t2 AS (SELECT *, x - trend AS det FROM t), " +
        "se AS (SELECT event_type, dow, " +
        "CAST(SUM(det) // COUNT(*) AS BIGINT) AS seasonal " +
        "FROM t2 WHERE det IS NOT NULL GROUP BY 1, 2) " +
        "SELECT t2.event_type, t2.day, CAST(t2.x AS BIGINT) AS x, " +
        "t2.trend, " +
        "CASE WHEN trend IS NOT NULL THEN seasonal END AS seasonal, " +
        "CAST(CASE WHEN trend IS NOT NULL THEN x - trend - seasonal " +
        "END AS BIGINT) AS remainder FROM t2 LEFT JOIN se " +
        "ON t2.event_type = se.event_type AND t2.dow = se.dow " +
        "ORDER BY t2.event_type, t2.day"),
    // same n-scaled exact centering, HUGEINT moment products, same
    // day-arithmetic lag pairing
    "q278_acf" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) // COUNT(*) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "st AS (SELECT event_type, CAST(SUM(x) AS BIGINT) AS sx, " +
        "COUNT(*) AS n FROM dl GROUP BY 1), " +
        "ce AS (SELECT event_type, day, x * n - sx AS dv " +
        "FROM dl JOIN st USING (event_type)), " +
        "de AS (SELECT event_type, SUM(CAST(dv AS HUGEINT) * dv) " +
        "AS den FROM ce GROUP BY 1), " +
        "pr AS (SELECT event_type, day + lag AS day, lag, dv AS dv0 " +
        "FROM ce CROSS JOIN (SELECT UNNEST([1, 2, 3, 7]) AS lag)), " +
        "nu AS (SELECT event_type, lag, COUNT(*) AS n_pairs, " +
        "SUM(CAST(dv0 AS HUGEINT) * dv) AS num FROM pr " +
        "JOIN ce USING (event_type, day) GROUP BY 1, 2) " +
        "SELECT event_type, CAST(lag AS BIGINT) AS lag, " +
        "CAST(n_pairs AS BIGINT) AS n_pairs, " +
        "CASE WHEN den > 0 THEN CAST(num * 1000000 // den AS BIGINT) " +
        "END AS acf_micro FROM nu JOIN de USING (event_type) " +
        "ORDER BY event_type, lag"),
    // same user-bucket cells, identical pinned-order chi2/exp text;
    // the oracle's row_number equals the join-count rank because the
    // (p, type, day) order is total
    "q271_bh_fdr" ->
      ("WITH ce AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, user_id % 3 AS b, " +
        "COUNT(*) AS c FROM events GROUP BY 1, 2, 3), " +
        "bd AS (SELECT event_type, day, " +
        "SUM(CASE WHEN b = 0 THEN c ELSE 0 END) AS o0, " +
        "SUM(CASE WHEN b = 1 THEN c ELSE 0 END) AS o1, " +
        "SUM(CASE WHEN b = 2 THEN c ELSE 0 END) AS o2 " +
        "FROM ce GROUP BY 1, 2), " +
        "bd2 AS (SELECT *, o0 + o1 + o2 AS n_day FROM bd), " +
        "bt AS (SELECT event_type, SUM(o0) AS c0, SUM(o1) AS c1, " +
        "SUM(o2) AS c2, SUM(n_day) AS n_type FROM bd2 GROUP BY 1), " +
        "p AS (SELECT bd2.event_type, day, n_day, " +
        "CAST(FLOOR(exp(-(" +
        "(CASE WHEN c0 = 0 THEN 0.0 ELSE " +
        "pow(CAST(o0 AS DOUBLE) - CAST(n_day AS DOUBLE) * c0 / n_type, 2) " +
        "/ (CAST(n_day AS DOUBLE) * c0 / n_type) END) + " +
        "(CASE WHEN c1 = 0 THEN 0.0 ELSE " +
        "pow(CAST(o1 AS DOUBLE) - CAST(n_day AS DOUBLE) * c1 / n_type, 2) " +
        "/ (CAST(n_day AS DOUBLE) * c1 / n_type) END) + " +
        "(CASE WHEN c2 = 0 THEN 0.0 ELSE " +
        "pow(CAST(o2 AS DOUBLE) - CAST(n_day AS DOUBLE) * c2 / n_type, 2) " +
        "/ (CAST(n_day AS DOUBLE) * c2 / n_type) END)" +
        ") / 2.0) * 1000000) AS BIGINT) AS p_micro " +
        "FROM bd2 JOIN bt USING (event_type)), " +
        "r AS (SELECT event_type, day, n_day, p_micro, " +
        "CAST(row_number() OVER (ORDER BY p_micro, event_type, day) " +
        "AS BIGINT) AS rk FROM p), " +
        "mm AS (SELECT COUNT(*) AS m FROM r), " +
        "ks AS (SELECT COALESCE(MAX(CASE WHEN p_micro * m <= " +
        "50000 * rk THEN rk END), 0) AS kstar " +
        "FROM r CROSS JOIN mm) " +
        "SELECT event_type, day, CAST(n_day AS BIGINT) AS n_day, " +
        "p_micro, rk, rk <= kstar AS rejected FROM r CROSS JOIN ks " +
        "ORDER BY event_type, day"),
    // q271's exact p chain verbatim + the Holm running-max step-down
    "q333_holm_stepdown" ->
      ("WITH ce AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, user_id % 3 AS b, " +
        "COUNT(*) AS c FROM events GROUP BY 1, 2, 3), " +
        "bd AS (SELECT event_type, day, " +
        "SUM(CASE WHEN b = 0 THEN c ELSE 0 END) AS o0, " +
        "SUM(CASE WHEN b = 1 THEN c ELSE 0 END) AS o1, " +
        "SUM(CASE WHEN b = 2 THEN c ELSE 0 END) AS o2 " +
        "FROM ce GROUP BY 1, 2), " +
        "bd2 AS (SELECT *, o0 + o1 + o2 AS n_day FROM bd), " +
        "bt AS (SELECT event_type, SUM(o0) AS c0, SUM(o1) AS c1, " +
        "SUM(o2) AS c2, SUM(n_day) AS n_type FROM bd2 GROUP BY 1), " +
        "p AS (SELECT bd2.event_type, day, n_day, " +
        "CAST(FLOOR(exp(-(" +
        "(CASE WHEN c0 = 0 THEN 0.0 ELSE " +
        "pow(CAST(o0 AS DOUBLE) - CAST(n_day AS DOUBLE) * c0 / n_type, 2) " +
        "/ (CAST(n_day AS DOUBLE) * c0 / n_type) END) + " +
        "(CASE WHEN c1 = 0 THEN 0.0 ELSE " +
        "pow(CAST(o1 AS DOUBLE) - CAST(n_day AS DOUBLE) * c1 / n_type, 2) " +
        "/ (CAST(n_day AS DOUBLE) * c1 / n_type) END) + " +
        "(CASE WHEN c2 = 0 THEN 0.0 ELSE " +
        "pow(CAST(o2 AS DOUBLE) - CAST(n_day AS DOUBLE) * c2 / n_type, 2) " +
        "/ (CAST(n_day AS DOUBLE) * c2 / n_type) END)" +
        ") / 2.0) * 1000000) AS BIGINT) AS p_micro " +
        "FROM bd2 JOIN bt USING (event_type)), " +
        "r AS (SELECT event_type, day, n_day, p_micro, " +
        "CAST(row_number() OVER (ORDER BY p_micro, event_type, day) " +
        "AS BIGINT) AS rk FROM p), " +
        "mm AS (SELECT COUNT(*) AS m FROM r), " +
        "h AS (SELECT r.*, p_micro * (m - rk + 1) AS hterm " +
        "FROM r CROSS JOIN mm), " +
        "hm AS (SELECT a.event_type, a.day, a.n_day, a.p_micro, a.rk, " +
        "MAX(b.hterm) AS hmax FROM h a JOIN h b ON b.rk <= a.rk " +
        "GROUP BY 1, 2, 3, 4, 5) " +
        "SELECT event_type, day, CAST(n_day AS BIGINT) AS n_day, " +
        "p_micro, rk, hmax <= 50000 AS rejected_holm " +
        "FROM hm ORDER BY event_type, day"),

    // same daily cells, exact S and tie-corrected var18, identical
    // continuity-corrected z formula text
    "q269_mann_kendall" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) // COUNT(*) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "ss AS (SELECT a.event_type, " +
        "CAST(SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 " +
        "ELSE 0 END) AS BIGINT) AS s_stat FROM dl a JOIN dl b " +
        "ON a.event_type = b.event_type AND a.day < b.day GROUP BY 1), " +
        "nd AS (SELECT event_type, COUNT(*) AS n_days FROM dl " +
        "GROUP BY 1), " +
        "ti AS (SELECT event_type, " +
        "CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18 FROM " +
        "(SELECT event_type, x, COUNT(*) AS t FROM dl GROUP BY 1, 2) " +
        "GROUP BY 1), " +
        "v AS (SELECT nd.event_type, CAST(n_days AS BIGINT) AS n_days, " +
        "s_stat, n_days * (n_days - 1) * (2 * n_days + 5) - tie18 " +
        "AS var18 FROM nd JOIN ss USING (event_type) " +
        "JOIN ti USING (event_type)) " +
        "SELECT event_type, n_days, s_stat, CAST(var18 AS BIGINT) " +
        "AS var18, CASE WHEN var18 <= 0 THEN 0.0 ELSE " +
        "round(CAST(s_stat - (CASE WHEN s_stat > 0 THEN 1 " +
        "WHEN s_stat < 0 THEN -1 ELSE 0 END) AS DOUBLE) " +
        "/ sqrt(CAST(var18 AS DOUBLE) / 18.0), 6) END AS z " +
        "FROM v ORDER BY event_type"),
    // same doubled average ranks (2·min_rank + t − 1), same five
    // integer moment sums, identical √a·√b ratio text
    "q272_spearman_corr" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) AS xc, " +
        "COUNT(*) AS yc FROM events GROUP BY 1, 2), " +
        "r AS (SELECT event_type, " +
        "2 * rank() OVER (PARTITION BY event_type ORDER BY xc) " +
        "+ COUNT(*) OVER (PARTITION BY event_type, xc) - 1 AS rx, " +
        "2 * rank() OVER (PARTITION BY event_type ORDER BY yc) " +
        "+ COUNT(*) OVER (PARTITION BY event_type, yc) - 1 AS ry " +
        "FROM dl), " +
        "m AS (SELECT event_type, COUNT(*) AS n, " +
        "CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy, " +
        "CAST(SUM(rx * ry) AS BIGINT) AS sxy, " +
        "CAST(SUM(rx * rx) AS BIGINT) AS sxx, " +
        "CAST(SUM(ry * ry) AS BIGINT) AS syy FROM r GROUP BY 1), " +
        "f AS (SELECT event_type, n, n * sxy - sx * sy AS num, " +
        "n * sxx - sx * sx AS da, n * syy - sy * sy AS db FROM m) " +
        "SELECT event_type, CAST(n AS BIGINT) AS n_days, " +
        "CASE WHEN da = 0 OR db = 0 THEN NULL ELSE " +
        "round(CAST(num AS DOUBLE) / (sqrt(CAST(da AS DOUBLE)) * " +
        "sqrt(CAST(db AS DOUBLE))), 6) END AS rho " +
        "FROM f ORDER BY event_type"),
    // identical role mapping, (t, id) order, first/last-role picks
    "q262_chat_validate" ->
      ("WITH p AS (SELECT user_id, epoch_ns(ts) AS t, event_id, " +
        "CASE WHEN event_type IN ('purchase', 'signup') " +
        "THEN 'assistant' ELSE 'user' END AS role FROM events), " +
        "w AS (SELECT user_id, role, " +
        "lag(role) OVER (PARTITION BY user_id ORDER BY t, event_id) " +
        "AS prev_role, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) " +
        "AS rn, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY t DESC, " +
        "event_id DESC) AS rrn FROM p) " +
        "SELECT user_id, COUNT(*) AS n_turns, " +
        "CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_alternation_violations, " +
        "(MAX(CASE WHEN rn = 1 THEN role END) = 'user') AS starts_user, " +
        "(MAX(CASE WHEN rrn = 1 THEN role END) = 'assistant') " +
        "AS ends_assistant, " +
        "(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) = 0 " +
        "AND MAX(CASE WHEN rn = 1 THEN role END) = 'user' " +
        "AND MAX(CASE WHEN rrn = 1 THEN role END) = 'assistant') " +
        "AS valid FROM w GROUP BY user_id ORDER BY user_id"),
    // same top-k cut, micro-logs of exact cents, trailing divisions
    "q264_hill_tail_index" ->
      ("WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents, " +
        "event_id FROM events), " +
        "t AS (SELECT cents FROM b WHERE cents > 0 " +
        "ORDER BY cents DESC, event_id LIMIT 100), " +
        "m AS (SELECT cents, CAST(FLOOR(ln(cents) * 1000000) AS BIGINT) " +
        "AS ml FROM t), " +
        "s AS (SELECT COUNT(*) AS k, MIN(cents) AS xk, MIN(ml) AS mlk, " +
        "CAST(SUM(ml) AS BIGINT) AS sml FROM m) " +
        "SELECT CAST(k AS BIGINT) AS k, CAST(xk AS BIGINT) AS xk_cents, " +
        "CAST((sml - k * mlk) // (k - 1) AS BIGINT) AS hill_inv_micro, " +
        "CAST(CASE WHEN (sml - k * mlk) // (k - 1) > 0 " +
        "THEN 1000000000000 // ((sml - k * mlk) // (k - 1)) ELSE 0 END " +
        "AS BIGINT) AS alpha_micro FROM s"),
    // same censoring rule, minute floors, risk-set windows, and
    // micro-log product-limit terms with the ln-0 sentinel
    "q265_kaplan_meier" ->
      ("WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS t " +
        "FROM events), " +
        "h AS (SELECT MAX(t) AS tmax FROM ev), " +
        "pu AS (SELECT user_id, " +
        "MIN(CASE WHEN event_type = 'click' THEN t END) AS tc, " +
        "MIN(CASE WHEN event_type = 'purchase' THEN t END) AS tp " +
        "FROM ev GROUP BY 1), " +
        "du AS (SELECT CASE WHEN tp > tc " +
        "THEN (tp - tc) // 60000000000 END AS de, " +
        "(h.tmax - tc) // 60000000000 AS dc " +
        "FROM pu CROSS JOIN h WHERE tc IS NOT NULL), " +
        "dd AS (SELECT COALESCE(de, dc) AS dur, de IS NOT NULL AS conv " +
        "FROM du), " +
        "g AS (SELECT dur, SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS d, " +
        "COUNT(*) AS c FROM dd GROUP BY 1), " +
        "r AS (SELECT dur, d, c, SUM(c) OVER (ORDER BY dur DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk " +
        "FROM g), " +
        "e AS (SELECT dur, d, n_risk, CASE WHEN n_risk > d " +
        "THEN CAST(FLOOR(ln(n_risk - d) * 1000000) AS BIGINT) " +
        "- CAST(FLOOR(ln(n_risk) * 1000000) AS BIGINT) " +
        "ELSE -1000000000000 END AS term FROM r WHERE d > 0), " +
        "f AS (SELECT dur, n_risk, d, SUM(term) OVER (ORDER BY dur " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ls " +
        "FROM e) " +
        "SELECT CAST(dur AS BIGINT) AS duration_min, " +
        "CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS n_events, " +
        "CAST(ls AS BIGINT) AS log_surv_micro FROM f " +
        "ORDER BY duration_min"),
    // q265's duration table split user_id % 2, identical per-term
    // integer quantization of E and V, identical final z text
    "q279_logrank" ->
      ("WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS t " +
        "FROM events), " +
        "h AS (SELECT MAX(t) AS tmax FROM ev), " +
        "pu AS (SELECT user_id, " +
        "MIN(CASE WHEN event_type = 'click' THEN t END) AS tc, " +
        "MIN(CASE WHEN event_type = 'purchase' THEN t END) AS tp " +
        "FROM ev GROUP BY 1), " +
        "du AS (SELECT user_id % 2 = 0 AS arm_a, " +
        "CASE WHEN tp > tc THEN (tp - tc) // 60000000000 END AS de, " +
        "(h.tmax - tc) // 60000000000 AS dc " +
        "FROM pu CROSS JOIN h WHERE tc IS NOT NULL), " +
        "dd AS (SELECT arm_a, COALESCE(de, dc) AS dur, " +
        "de IS NOT NULL AS conv FROM du), " +
        "g AS (SELECT dur, " +
        "SUM(CASE WHEN conv AND arm_a THEN 1 ELSE 0 END) AS d1, " +
        "SUM(CASE WHEN conv AND NOT arm_a THEN 1 ELSE 0 END) AS d2, " +
        "SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS c1, " +
        "SUM(CASE WHEN NOT arm_a THEN 1 ELSE 0 END) AS c2 " +
        "FROM dd GROUP BY 1), " +
        "r AS (SELECT dur, d1, d2, " +
        "SUM(c1) OVER (ORDER BY dur DESC ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS n1, " +
        "SUM(c2) OVER (ORDER BY dur DESC ROWS BETWEEN UNBOUNDED " +
        "PRECEDING AND CURRENT ROW) AS n2 FROM g), " +
        "r2 AS (SELECT d1, d2, n1, n2, n1 + n2 AS n, d1 + d2 AS dd " +
        "FROM r WHERE d1 + d2 > 0), " +
        "tm AS (SELECT d1, d2, dd * n1 * 1000000 // n AS e_term, " +
        "CASE WHEN n > 1 THEN CAST(CAST(dd AS HUGEINT) * n1 * n2 " +
        "* (n - dd) * 1000000 // (CAST(n AS HUGEINT) * n * (n - 1)) " +
        "AS BIGINT) ELSE 0 END AS v_term FROM r2), " +
        "ag AS (SELECT CAST(SUM(d1) AS BIGINT) AS o1, " +
        "CAST(SUM(d2) AS BIGINT) AS o2, " +
        "CAST(SUM(e_term) AS BIGINT) AS e1_micro, " +
        "CAST(SUM(v_term) AS BIGINT) AS v_micro FROM tm) " +
        "SELECT o1, o2, e1_micro, v_micro, " +
        "CASE WHEN v_micro > 0 THEN " +
        "round(CAST(o1 * 1000000 - e1_micro AS DOUBLE) " +
        "/ sqrt(CAST(v_micro AS DOUBLE) * 1000000.0), 6) END AS z " +
        "FROM ag"),
    // one anti-join per declared FK, identical constraint labels
    "q280_ref_integrity" -> {
      def one(name: String, child: String, key: String,
          parent: String, pkey: String): String =
        s"SELECT '$name' AS fk, " +
          s"(SELECT COUNT($key) FROM $child) AS n_child, " +
          s"COUNT(*) AS n_orphan_rows, " +
          s"COUNT(DISTINCT k) AS n_orphan_keys FROM " +
          s"(SELECT $key AS k FROM $child WHERE $key IS NOT NULL " +
          s"AND $key NOT IN (SELECT DISTINCT $pkey FROM $parent)) "
      Seq(
        one("customer.nation->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        one("embeddings.vec->documents", "embeddings", "vec_id",
          "documents", "doc_id"),
        one("events.user->customer", "events", "user_id",
          "customer", "c_custkey"),
        one("lineitem.order->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        one("lineitem.supp->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        one("nation.region->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        one("orders.cust->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        one("supplier.nation->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"))
        .mkString("SELECT fk, CAST(n_child AS BIGINT) AS n_child, " +
          "CAST(n_orphan_rows AS BIGINT) AS n_orphan_rows, " +
          "CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys FROM (",
          " UNION ALL ", ") ORDER BY fk")
    },
    // identical coalition bitmask, truncated micro rates, exact
    // {6,2,2,6}/24 factorial weights
    "q258_shapley_attribution" ->
      ("WITH u AS (SELECT user_id, " +
        "MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) " +
        "+ MAX(CASE WHEN event_type = 'view' THEN 2 ELSE 0 END) " +
        "+ MAX(CASE WHEN event_type = 'signup' THEN 4 ELSE 0 END) " +
        "+ MAX(CASE WHEN event_type = 'error' THEN 8 ELSE 0 END) AS mask, " +
        "MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv " +
        "FROM events GROUP BY user_id), " +
        "co AS (SELECT mask, COUNT(*) AS n, SUM(conv) AS nc FROM u " +
        "GROUP BY 1), " +
        "am AS (SELECT m.mask, COALESCE(co.nc * 1000000 // co.n, 0) AS r " +
        "FROM (SELECT unnest(generate_series(0, 15)) AS mask) m " +
        "LEFT JOIN co USING (mask)), " +
        "ch AS (SELECT unnest(generate_series(0, 3)) AS ch), " +
        "t AS (SELECT ch.ch, a.r AS r_t, b.r AS r_tc, " +
        "CASE WHEN bit_count(a.mask) IN (0, 3) THEN 6 ELSE 2 END AS w " +
        "FROM ch CROSS JOIN am a " +
        "JOIN am b ON b.mask = a.mask + (1 << ch.ch) " +
        "WHERE (a.mask >> ch.ch) & 1 = 0) " +
        "SELECT CASE ch WHEN 0 THEN 'click' WHEN 1 THEN 'view' " +
        "WHEN 2 THEN 'signup' ELSE 'error' END AS channel, " +
        "CAST(SUM(w * (r_tc - r_t)) // 24 AS BIGINT) AS shapley_micro " +
        "FROM t GROUP BY 1 ORDER BY channel"),
    // the exact q15 scorer and tie-break, folded to the cell table
    "q259_langid_confusion" ->
      (langConfusionSql + " ORDER BY actual, predicted"),
    // q259's cells wrapped once more: marginal-product chance rate,
    // HUGEINT cross products, one trailing division each
    "q286_cohens_kappa" ->
      (s"WITH cm AS ($langConfusionSql), " +
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, " +
        "CAST(SUM(CASE WHEN correct THEN n ELSE 0 END) AS BIGINT) " +
        "AS dg FROM cm), " +
        "r AS (SELECT actual AS l, SUM(n) AS rt FROM cm GROUP BY 1), " +
        "c AS (SELECT predicted AS l, SUM(n) AS ct FROM cm GROUP BY 1), " +
        "rc AS (SELECT SUM(CAST(rt AS HUGEINT) * ct) AS src " +
        "FROM r JOIN c USING (l)) " +
        "SELECT nn AS n_docs, " +
        "CAST(dg * 1000000 // nn AS BIGINT) AS po_micro, " +
        "CAST(src * 1000000 // (CAST(nn AS HUGEINT) * nn) AS BIGINT) " +
        "AS pe_micro, " +
        "CAST((CAST(nn AS HUGEINT) * dg - src) * 1000000 " +
        "// (CAST(nn AS HUGEINT) * nn - src) AS BIGINT) AS kappa_micro " +
        "FROM t CROSS JOIN rc"),
    // same capped click-count strata, same exact-integer propensity
    // and 10¹²-unit weights, HUGEINT weighted sums, trailing divisions
    "q284_ipw_ate" ->
      ("WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS t, " +
        "event_id, value FROM events), " +
        "fe AS (SELECT user_id, event_type, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY t, event_id) AS rn FROM ev), " +
        "u AS (SELECT ev.user_id, " +
        "LEAST(COUNT(*) // 20, 10) AS stratum, " +
        "MAX(CASE WHEN fe.event_type = 'click' THEN 1 ELSE 0 END) " +
        "AS treated, " +
        "SUM(CASE WHEN ev.event_type = 'purchase' THEN " +
        "CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y " +
        "FROM ev JOIN (SELECT user_id, event_type FROM fe WHERE rn = 1) " +
        "fe USING (user_id) GROUP BY 1), " +
        "pr AS (SELECT stratum, " +
        "SUM(treated) * 1000000 // COUNT(*) AS p_micro " +
        "FROM u GROUP BY 1), " +
        "w AS (SELECT treated, y, " +
        "p_micro > 0 AND p_micro < 1000000 AS overlap, " +
        "CASE WHEN NOT (p_micro > 0 AND p_micro < 1000000) THEN 0 " +
        "WHEN treated = 1 THEN 1000000000000 // p_micro " +
        "ELSE 1000000000000 // (1000000 - p_micro) END AS wt " +
        "FROM u JOIN pr USING (stratum)), " +
        "ag AS (SELECT " +
        "SUM(CASE WHEN overlap AND treated = 1 THEN 1 ELSE 0 END) " +
        "AS n_treated, " +
        "SUM(CASE WHEN overlap AND treated = 0 THEN 1 ELSE 0 END) " +
        "AS n_control, " +
        "SUM(CASE WHEN NOT overlap THEN 1 ELSE 0 END) AS n_no_overlap, " +
        "SUM(CASE WHEN treated = 1 THEN CAST(wt AS HUGEINT) * y " +
        "ELSE 0 END) AS swy_t, " +
        "SUM(CASE WHEN treated = 1 THEN wt ELSE 0 END) AS sw_t, " +
        "SUM(CASE WHEN treated = 0 THEN CAST(wt AS HUGEINT) * y " +
        "ELSE 0 END) AS swy_c, " +
        "SUM(CASE WHEN treated = 0 THEN wt ELSE 0 END) AS sw_c FROM w) " +
        "SELECT CAST(n_treated AS BIGINT) AS n_treated, " +
        "CAST(n_control AS BIGINT) AS n_control, " +
        "CAST(n_no_overlap AS BIGINT) AS n_no_overlap, " +
        "CAST(swy_t // sw_t AS BIGINT) AS mean_t_cents, " +
        "CAST(swy_c // sw_c AS BIGINT) AS mean_c_cents, " +
        "CAST(swy_t // sw_t - swy_c // sw_c AS BIGINT) AS ate_cents " +
        "FROM ag"),
    // same bounded histograms, same ceil-rank thresholds, identical
    // boolean-sum coding and reverse-coded recency
    "q287_rfm_segments" ->
      ("WITH hz AS (SELECT MAX(epoch_ns(ts) // 86400000000000) AS dmax " +
        "FROM events), " +
        "u AS (SELECT user_id, " +
        "CAST(dmax - MAX(epoch_ns(ts) // 86400000000000) AS BIGINT) AS r, " +
        "COUNT(*) AS f, " +
        "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) " +
        "AS m_cents, " +
        "CAST(SUM(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT) " +
        "AS m_dollars FROM events CROSS JOIN hz " +
        "WHERE event_type = 'purchase' GROUP BY user_id, dmax), " +
        "nn AS (SELECT COUNT(*) AS n FROM u), " +
        "ks AS (SELECT UNNEST([1, 2, 3, 4]) AS k), " +
        "rt AS (SELECT MAX(CASE WHEN k = 1 THEN thr END) AS t1, " +
        "MAX(CASE WHEN k = 2 THEN thr END) AS t2, " +
        "MAX(CASE WHEN k = 3 THEN thr END) AS t3, " +
        "MAX(CASE WHEN k = 4 THEN thr END) AS t4 FROM " +
        "(SELECT k, MIN(v) AS thr FROM " +
        "(SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM " +
        "(SELECT r AS v, COUNT(*) AS c FROM u GROUP BY 1)) cc " +
        "CROSS JOIN nn CROSS JOIN ks " +
        "WHERE cum >= (k * n + 4) // 5 GROUP BY k)), " +
        "ft AS (SELECT MAX(CASE WHEN k = 1 THEN thr END) AS t1, " +
        "MAX(CASE WHEN k = 2 THEN thr END) AS t2, " +
        "MAX(CASE WHEN k = 3 THEN thr END) AS t3, " +
        "MAX(CASE WHEN k = 4 THEN thr END) AS t4 FROM " +
        "(SELECT k, MIN(v) AS thr FROM " +
        "(SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM " +
        "(SELECT f AS v, COUNT(*) AS c FROM u GROUP BY 1)) cc " +
        "CROSS JOIN nn CROSS JOIN ks " +
        "WHERE cum >= (k * n + 4) // 5 GROUP BY k)), " +
        "mt AS (SELECT MAX(CASE WHEN k = 1 THEN thr END) AS t1, " +
        "MAX(CASE WHEN k = 2 THEN thr END) AS t2, " +
        "MAX(CASE WHEN k = 3 THEN thr END) AS t3, " +
        "MAX(CASE WHEN k = 4 THEN thr END) AS t4 FROM " +
        "(SELECT k, MIN(v) AS thr FROM " +
        "(SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM " +
        "(SELECT m_dollars AS v, COUNT(*) AS c FROM u GROUP BY 1)) cc " +
        "CROSS JOIN nn CROSS JOIN ks " +
        "WHERE cum >= (k * n + 4) // 5 GROUP BY k)), " +
        "coded AS (SELECT user_id, r, f, m_cents, " +
        "6 - (1 + CAST(r > rt.t1 AS BIGINT) + CAST(r > rt.t2 AS BIGINT) " +
        "+ CAST(r > rt.t3 AS BIGINT) + CAST(r > rt.t4 AS BIGINT)) " +
        "AS r_code, " +
        "1 + CAST(f > ft.t1 AS BIGINT) + CAST(f > ft.t2 AS BIGINT) " +
        "+ CAST(f > ft.t3 AS BIGINT) + CAST(f > ft.t4 AS BIGINT) " +
        "AS f_code, " +
        "1 + CAST(m_dollars > mt.t1 AS BIGINT) " +
        "+ CAST(m_dollars > mt.t2 AS BIGINT) " +
        "+ CAST(m_dollars > mt.t3 AS BIGINT) " +
        "+ CAST(m_dollars > mt.t4 AS BIGINT) AS m_code " +
        "FROM u CROSS JOIN rt CROSS JOIN ft CROSS JOIN mt) " +
        "SELECT user_id, r, CAST(f AS BIGINT) AS f, m_cents, r_code, " +
        "f_code, m_code, r_code * 100 + f_code * 10 + m_code AS rfm " +
        "FROM coded ORDER BY user_id"),
    // same half split by (ts, id) rank, same max-count/min-to argmax
    "q288_markov_accuracy" ->
      ("WITH ev AS (SELECT user_id, event_id, epoch_ns(ts) AS t, " +
        "event_type FROM events), " +
        "w AS (SELECT user_id, event_type, " +
        "lead(event_type) OVER (PARTITION BY user_id " +
        "ORDER BY t, event_id) AS next_type, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) " +
        "AS rn, COUNT(*) OVER (PARTITION BY user_id) AS nu FROM ev), " +
        "tr AS (SELECT event_type AS from_type, next_type, " +
        "rn * 2 > nu AS is_eval FROM w WHERE next_type IS NOT NULL), " +
        "cnt AS (SELECT from_type, next_type AS to_type, COUNT(*) AS c " +
        "FROM tr WHERE NOT is_eval GROUP BY 1, 2), " +
        "best AS (SELECT from_type, MAX(c) AS mc FROM cnt GROUP BY 1), " +
        "pred AS (SELECT cnt.from_type, MIN(to_type) AS pred FROM cnt " +
        "JOIN best USING (from_type) WHERE c = mc GROUP BY 1) " +
        "SELECT from_type, MIN(pred) AS predicted, " +
        "COUNT(*) AS n_eval, " +
        "CAST(SUM(CASE WHEN next_type = pred THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_correct, " +
        "CAST(SUM(CASE WHEN next_type = pred THEN 1 ELSE 0 END) " +
        "* 1000000 // COUNT(*) AS BIGINT) AS acc_micro " +
        "FROM tr JOIN pred USING (from_type) WHERE is_eval " +
        "GROUP BY 1 ORDER BY from_type"),
    // sorted-cumsum Gini identity, HUGEINT products, one division
    "q260_gini_concentration" ->
      ("WITH pu AS (SELECT user_id, COUNT(*) AS x FROM events " +
        "GROUP BY 1), " +
        "r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, user_id) " +
        "AS BIGINT) AS i FROM pu) " +
        "SELECT COUNT(*) AS n_users, CAST(SUM(x) AS BIGINT) AS n_events, " +
        "CAST((SUM(2 * i::HUGEINT * x) - (COUNT(*) + 1)::HUGEINT " +
        "* SUM(x)) * 1000000 // (COUNT(*)::HUGEINT * SUM(x)) AS BIGINT) " +
        "AS gini_micro FROM r"),
    // same minimax triple join over the 10-bin table; HUGEINT Brier
    "q254_isotonic_calibration" ->
      ("WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y " +
        "FROM events WHERE event_type IN ('purchase', 'click')), " +
        "p AS (SELECT y, LEAST(GREATEST(" +
        "(cents - 25000) * 1000000 // 20000 // 4 + 500000, 0), 1000000" +
        ") AS pm FROM b), " +
        "g AS (SELECT LEAST(pm // 100000, 9) AS bin, COUNT(*) AS n, " +
        "SUM(y) AS pos FROM p GROUP BY 1), " +
        "c AS (SELECT bin, n, pos, " +
        "SUM(pos) OVER (ORDER BY bin) AS cpos, " +
        "SUM(n) OVER (ORDER BY bin) AS cn FROM g), " +
        "t AS (SELECT i.bin AS ib, i.n, i.pos, j.bin AS jb, " +
        "(k.cpos - (j.cpos - j.pos)) * 1000000 " +
        "// (k.cn - (j.cn - j.n)) AS a " +
        "FROM c i JOIN c j ON j.bin <= i.bin " +
        "JOIN c k ON k.bin >= i.bin), " +
        "m1 AS (SELECT ib, jb, MAX(n) AS n, MAX(pos) AS pos, " +
        "MIN(a) AS mn FROM t GROUP BY 1, 2), " +
        "m2 AS (SELECT ib, MAX(n) AS n, MAX(pos) AS pos, " +
        "MAX(mn) AS iso FROM m1 GROUP BY 1) " +
        "SELECT CAST(ib AS BIGINT) AS bin, CAST(n AS BIGINT) AS n, " +
        "CAST(pos * 1000000 // n AS BIGINT) AS raw_micro, " +
        "CAST(iso AS BIGINT) AS iso_micro, " +
        "CAST((pos::HUGEINT * (iso - 1000000) * (iso - 1000000) " +
        "+ (n - pos)::HUGEINT * iso * iso) // (n * 1000000) AS BIGINT) " +
        "AS brier_iso_micro FROM m2 ORDER BY bin"),
    // same histograms, same integer-ceil rank rule on both sides
    "q255_quantile_normalize" ->
      ("WITH b AS (SELECT event_type AS side, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events " +
        "WHERE event_type IN ('purchase', 'click')), " +
        "h AS (SELECT side, cents, COUNT(*) AS c FROM b GROUP BY 1, 2), " +
        "c AS (SELECT side, cents, " +
        "SUM(c) OVER (PARTITION BY side ORDER BY cents) AS cum, " +
        "SUM(c) OVER (PARTITION BY side) AS n FROM h), " +
        "q AS (SELECT unnest(generate_series(0, 255)) AS quantile), " +
        "ck AS (SELECT q.quantile, MIN(c.cents) AS click_cents " +
        "FROM q JOIN c ON c.side = 'click' " +
        "AND c.cum * 256 >= (q.quantile + 1) * c.n GROUP BY 1), " +
        "pu AS (SELECT q.quantile, MIN(c.cents) AS purchase_cents " +
        "FROM q JOIN c ON c.side = 'purchase' " +
        "AND c.cum * 256 >= (q.quantile + 1) * c.n GROUP BY 1) " +
        "SELECT CAST(ck.quantile AS BIGINT) AS quantile, ck.click_cents, " +
        "pu.purchase_cents FROM ck JOIN pu USING (quantile) " +
        "ORDER BY quantile"),
    // identical pinned LLR/boundary literals, (t, event_id) order,
    // first-crossing pick
    "q256_sprt_sequential" ->
      (s"WITH p AS (SELECT event_type, epoch_ns(ts) AS t, event_id, " +
        "CASE WHEN CAST(round(value * 100) AS BIGINT) > 18000 " +
        s"THEN $SprtLlrPosL ELSE $SprtLlrNegL END AS step FROM events), " +
        "c AS (SELECT event_type, " +
        "SUM(step) OVER (PARTITION BY event_type ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr, " +
        "COUNT(*) OVER (PARTITION BY event_type ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_obs " +
        "FROM p), " +
        s"x AS (SELECT event_type, n_obs, llr FROM c " +
        s"WHERE llr >= $SprtBound OR llr <= -$SprtBound), " +
        "f AS (SELECT event_type, MIN(n_obs) AS n_at_decision FROM x " +
        "GROUP BY 1) " +
        "SELECT f.event_type, CAST(f.n_at_decision AS BIGINT) " +
        "AS n_at_decision, CAST(x.llr AS BIGINT) AS llr_micro, " +
        s"CASE WHEN x.llr >= $SprtBound THEN 'accept_h1' " +
        "ELSE 'accept_h0' END AS decision " +
        "FROM f JOIN x ON x.event_type = f.event_type " +
        "AND x.n_obs = f.n_at_decision ORDER BY f.event_type"),
    // same quarter cuts from the observed span, prefix-sum train
    // side, truncating MAE
    "q257_walk_forward" ->
      ("WITH ev AS (SELECT event_type, epoch_ns(ts) AS t, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "bb AS (SELECT MIN(t) AS t0, MAX(t) - MIN(t) + 1 AS span " +
        "FROM ev), " +
        "f AS (SELECT event_type, " +
        "LEAST((t - t0) * 4 // span, 3) AS fold, cents " +
        "FROM ev CROSS JOIN bb), " +
        "g AS (SELECT event_type, fold, COUNT(*) AS n, SUM(cents) AS s " +
        "FROM f GROUP BY 1, 2), " +
        "w AS (SELECT event_type, fold, n, " +
        "SUM(n) OVER (PARTITION BY event_type ORDER BY fold " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_train, " +
        "SUM(s) OVER (PARTITION BY event_type ORDER BY fold " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s_train " +
        "FROM g), " +
        "p AS (SELECT event_type, fold, n AS n_test, n_train, " +
        "s_train // n_train AS pred FROM w WHERE fold > 0), " +
        "m AS (SELECT f.event_type, f.fold, " +
        "SUM(abs(f.cents - p.pred)) // COUNT(*) AS mae_cents " +
        "FROM f JOIN p ON p.event_type = f.event_type " +
        "AND p.fold = f.fold GROUP BY 1, 2) " +
        "SELECT p.event_type, CAST(p.fold AS BIGINT) AS fold, " +
        "CAST(p.n_train AS BIGINT) AS n_train, " +
        "CAST(p.n_test AS BIGINT) AS n_test, " +
        "CAST(p.pred AS BIGINT) AS pred_cents, " +
        "CAST(m.mae_cents AS BIGINT) AS mae_cents " +
        "FROM p JOIN m USING (event_type, fold) " +
        "ORDER BY event_type, fold"),
    // all 4 rounds unrolled: LEFT-JOIN raw sums with ≥1 clamps,
    // HUGEINT renorm (raw·target // rawSum), MATERIALIZED per round
    "q251_hits_scores" -> {
      def renormCte(name: String, rawCte: String) =
        s"$name AS MATERIALIZED (SELECT k, GREATEST(raw * " +
          s"(SELECT target FROM cnt) // (SELECT SUM(raw) FROM $rawCte), " +
          s"1) AS v FROM $rawCte)"
      val rounds = (1 to 4).map { r =>
        s"a${r}r AS MATERIALIZED (SELECT n.k, " +
          "GREATEST(COALESCE(SUM(ed.w * h.v), 0), 1) AS raw " +
          s"FROM nodes n LEFT JOIN ed ON ed.dst = n.k " +
          s"LEFT JOIN h${r - 1} h ON h.k = ed.src GROUP BY n.k), " +
          renormCte(s"a$r", s"a${r}r") + ", " +
          s"h${r}r AS MATERIALIZED (SELECT n.k, " +
          "GREATEST(COALESCE(SUM(ed.w * a.v), 0), 1) AS raw " +
          s"FROM nodes n LEFT JOIN ed ON ed.src = n.k " +
          s"LEFT JOIN a$r a ON a.k = ed.dst GROUP BY n.k), " +
          renormCte(s"h$r", s"h${r}r")
      }.mkString(", ")
      "WITH ed AS MATERIALIZED (SELECT " +
        "CAST(s.s_nationkey AS BIGINT) AS src, " +
        "CAST(c.c_nationkey AS BIGINT) AS dst, " +
        "CAST(COUNT(*) AS HUGEINT) AS w " +
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "WHERE s.s_nationkey <> c.c_nationkey GROUP BY 1, 2), " +
        "nodes AS MATERIALIZED (SELECT DISTINCT k FROM (" +
        "SELECT src AS k FROM ed UNION ALL SELECT dst FROM ed)), " +
        "cnt AS (SELECT CAST(COUNT(*) AS HUGEINT) * 1000000 AS target " +
        "FROM nodes), " +
        "h0 AS MATERIALIZED (SELECT k, 1000000::HUGEINT AS v FROM nodes), " +
        rounds + " " +
        "SELECT n.k AS n_key, CAST(h4.v AS BIGINT) AS hub_micro, " +
        "CAST(a4.v AS BIGINT) AS auth_micro FROM nodes n " +
        "JOIN h4 ON h4.k = n.k JOIN a4 ON a4.k = n.k ORDER BY n_key"
    },
    // identical per-category sums, truncating LOO/naive divisions,
    // singleton fallback to the global leave-one-out mean
    "q252_target_encoding" ->
      ("WITH ev AS (SELECT event_id, event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "st AS (SELECT event_type, CAST(SUM(cents) AS BIGINT) AS tsum, " +
        "COUNT(*) AS tn FROM ev GROUP BY 1), " +
        "g AS (SELECT CAST(SUM(cents) AS BIGINT) AS gsum, " +
        "COUNT(*) AS gn FROM ev) " +
        "SELECT event_id, ev.event_type, cents, " +
        "CAST(CASE WHEN tn = 1 THEN (gsum - cents) // (gn - 1) " +
        "ELSE (tsum - cents) // (tn - 1) END AS BIGINT) AS loo_cents, " +
        "CAST(tsum // tn AS BIGINT) AS naive_cents " +
        "FROM ev JOIN st USING (event_type) CROSS JOIN g " +
        "ORDER BY event_id"),
    // same hard-sigmoid scores, caliper and (|Δp|, c_id) best pick
    "q253_caliper_matching" ->
      ("WITH b AS (SELECT event_id, event_type = 'purchase' AS treated, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events " +
        "WHERE event_type IN ('purchase', 'click')), " +
        "p AS (SELECT event_id, treated, LEAST(GREATEST(" +
        "(cents - 25000) * 1000000 // 20000 // 4 + 500000, 0), 1000000" +
        ") AS pm FROM b), " +
        "t AS (SELECT event_id AS t_id, pm AS p_t FROM p WHERE treated), " +
        "c AS (SELECT event_id AS c_id, pm AS p_c FROM p " +
        "WHERE NOT treated), " +
        "m AS (SELECT t_id, c_id, p_t, p_c, row_number() OVER (" +
        "PARTITION BY t_id ORDER BY abs(p_t - p_c), c_id) AS rn " +
        "FROM t JOIN c ON abs(p_t - p_c) <= 10000) " +
        "SELECT t_id, c_id, CAST(p_t AS BIGINT) AS p_t, " +
        "CAST(p_c AS BIGINT) AS p_c FROM m WHERE rn = 1 ORDER BY t_id"),
    // same cohort, ns timestamps, integer cents, and the md5 manifest
    // over the sorted id list
    "q248_sar_export" ->
      ("SELECT user_id, COUNT(*) AS n_events, " +
        "CAST(MIN(epoch_ns(ts)) AS BIGINT) AS first_ts, " +
        "CAST(MAX(epoch_ns(ts)) AS BIGINT) AS last_ts, " +
        "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) " +
        "AS total_cents, " +
        "CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types, " +
        "md5(array_to_string(list_sort(list(event_id)), ',')) " +
        "AS manifest_md5 " +
        "FROM events WHERE user_id % 100 = 7 " +
        "GROUP BY user_id ORDER BY user_id"),

    // identical hard-sigmoid scores, exact-integer ceil rank, and
    // histogram order statistic; coverage replayed on the odd side
    "q241_conformal_coverage" ->
      ("WITH b AS (SELECT event_id, " +
        "CAST(round(value * 100) AS BIGINT) AS cents, " +
        "CASE WHEN event_type = 'purchase' THEN 1000000 ELSE 0 END AS ym " +
        "FROM events WHERE event_type IN ('purchase', 'click')), " +
        "p AS (SELECT event_id % 2 AS side, " +
        "abs(LEAST(GREATEST((cents - 25000) * 1000000 // 20000 // 4 " +
        "+ 500000, 0), 1000000) - ym) AS sc FROM b), " +
        "h AS (SELECT sc, COUNT(*) AS c FROM p WHERE side = 0 " +
        "GROUP BY 1), " +
        "c AS (SELECT sc, SUM(c) OVER (ORDER BY sc ROWS BETWEEN " +
        "UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "SUM(c) OVER () AS ncal FROM h), " +
        "t AS (SELECT MAX(ncal) AS n_cal, " +
        "MAX(((ncal + 1) * 9 + 9) // 10) AS k, " +
        "MIN(CASE WHEN cum >= ((ncal + 1) * 9 + 9) // 10 THEN sc END) " +
        "AS qhat FROM c) " +
        "SELECT CAST(MAX(n_cal) AS BIGINT) AS n_cal, " +
        "CAST(MAX(k) AS BIGINT) AS k, CAST(MAX(qhat) AS BIGINT) AS qhat, " +
        "COUNT(*) AS n_test, " +
        "CAST(SUM(CASE WHEN sc <= qhat THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_covered, " +
        "CAST(SUM(CASE WHEN sc <= qhat THEN 1 ELSE 0 END) * 1000000 " +
        "// COUNT(*) AS BIGINT) AS coverage_micro " +
        "FROM p CROSS JOIN t WHERE side = 1"),
    // identical pinned CDF thresholds, weights, truncating means, and
    // order-statistic picks
    "q233_poisson_bootstrap" -> {
      val ths = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
        4279248373L, 4292415291L, 4294609777L, 4294923276L)
      val wExpr = ths.map(t =>
        s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      "WITH ev AS (SELECT event_type, event_id, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "rep AS (SELECT event_type, cents, r, " +
        "('0x' || substr(md5('bs:' || CAST(event_id AS VARCHAR) || ':' || " +
        "CAST(r AS VARCHAR)), 1, 8))::BIGINT AS u " +
        "FROM ev CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS r)), " +
        s"w AS (SELECT event_type, cents, r, $wExpr AS w FROM rep), " +
        "m AS (SELECT event_type, r, CAST(sum(w * cents) AS BIGINT) // " +
        "CAST(sum(w) AS BIGINT) AS m FROM w GROUP BY 1, 2 " +
        "HAVING sum(w) > 0), " +
        "rk AS (SELECT *, row_number() OVER (PARTITION BY event_type " +
        "ORDER BY m, r) AS rk, count(*) OVER (PARTITION BY event_type) " +
        "AS nr FROM m), " +
        "g AS (SELECT event_type, CAST(max(nr) AS BIGINT) AS n_reps, " +
        "CAST(max(CASE WHEN rk = 2 THEN m END) AS BIGINT) AS lo_cents, " +
        "CAST(max(CASE WHEN rk = nr - 1 THEN m END) AS BIGINT) " +
        "AS hi_cents FROM rk GROUP BY 1), " +
        "base AS (SELECT event_type, CAST(sum(cents) AS BIGINT) // " +
        "count(*) AS mean_cents FROM ev GROUP BY 1) " +
        "SELECT b.event_type, g.n_reps, b.mean_cents, g.lo_cents, " +
        "g.hi_cents FROM base b JOIN g ON g.event_type = b.event_type " +
        "ORDER BY 1"
    },
    // identical binning, md5 coin, micro-log difference, and HUGEINT
    // cross-product division — truncation semantics match Spark div
    "q223_psi_drift" ->
      ("WITH e AS (SELECT event_type, " +
        "('0x' || substr(md5('psi:' || CAST(event_id AS VARCHAR)), 1, 8))" +
        "::BIGINT % 2 AS side, " +
        "least(greatest(CAST(round(value * 100) AS BIGINT) // 500, 0), 19) " +
        "AS bin FROM events), " +
        "c AS (SELECT event_type, bin, " +
        "CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b " +
        "FROM e GROUP BY 1, 2), " +
        "t AS (SELECT event_type, CAST(sum(a) AS BIGINT) AS ta, " +
        "CAST(sum(b) AS BIGINT) AS tb FROM c GROUP BY 1), " +
        "tm AS (SELECT c.event_type, " +
        "((CAST(a AS HUGEINT) * tb - CAST(b AS HUGEINT) * ta) * " +
        "(CAST(floor(ln(CAST(a AS DOUBLE) * tb) * 1000000) AS BIGINT) - " +
        "CAST(floor(ln(CAST(b AS DOUBLE) * ta) * 1000000) AS BIGINT))) " +
        "// (CAST(ta AS HUGEINT) * tb) AS term " +
        "FROM c JOIN t ON t.event_type = c.event_type " +
        "WHERE a > 0 AND b > 0) " +
        "SELECT event_type, count(*) AS n_bins, " +
        "CAST(sum(term) AS BIGINT) AS psi_micro " +
        "FROM tm GROUP BY 1 ORDER BY event_type"),
    // the identical run-length lowering — lag/cumsum/lead over the
    // same (ts, event_id) total order
    "q162_cep_pattern" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS t, event_type " +
        "FROM events), " +
        "r AS (SELECT *, CASE WHEN lag(event_type) OVER w " +
        "IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS nr FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "r2 AS (SELECT *, sum(nr) OVER " +
        "(PARTITION BY user_id ORDER BY t, event_id) AS run_id FROM r), " +
        "ra AS (SELECT user_id, run_id, max(event_type) AS etype, " +
        "count(*) AS len, min(t) AS run_start, max(t) AS run_end " +
        "FROM r2 GROUP BY 1, 2), " +
        "m AS (SELECT *, lead(etype) OVER w2 AS next_type, " +
        "lead(run_start) OVER w2 AS next_start FROM ra " +
        "WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)) " +
        "SELECT user_id, run_start AS first_click_ts, " +
        "run_end AS last_click_ts, len AS n_clicks, " +
        "next_start AS purchase_ts FROM m " +
        "WHERE etype = 'click' AND len >= 2 AND next_type = 'purchase' " +
        "AND next_start - run_end <= 86400000000000 " +
        "ORDER BY user_id, first_click_ts"),

    // same canonical row string, same 48-bit digest; DECIMAL(38,0)
    // keeps the commutative sum dtype-aligned with Spark's decimal
    "q163_fingerprint" ->
      ("WITH h AS (SELECT user_id % 8 AS shard, " +
        "('0x' || substr(md5(concat_ws('|', event_id, user_id, event_type, " +
        "epoch_ns(ts), CAST(round(value * 100) AS BIGINT), props)), " +
        "1, 12))::BIGINT AS h FROM events) " +
        "SELECT shard, count(*) AS n, " +
        "CAST(sum(h) % 1152921504606846976 AS BIGINT) AS fp_sum, " +
        "bit_xor(h) AS fp_xor " +
        "FROM h GROUP BY shard ORDER BY shard"),

    // same bounded daily aggregate, same integer ratio + band
    "q196_burn_rate" ->
      ("WITH dly AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, count(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "r AS (SELECT event_type, day, n, lag(n) OVER " +
        "(PARTITION BY event_type ORDER BY day) AS prev FROM dly) " +
        "SELECT event_type, day, n, " +
        "n * 1000000 // prev AS ratio_micro, " +
        "prev IS NOT NULL AND (n * 1000000 // prev > 1300000 " +
        "OR n * 1000000 // prev < 700000) AS alert " +
        "FROM r ORDER BY event_type, day"),

    // same value rollup, same doubled-cumulative rule
    "q197_weighted_median" ->
      ("WITH v AS (SELECT event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS cents, count(*) AS wt " +
        "FROM events GROUP BY 1, 2), " +
        "c AS (SELECT *, CAST(sum(wt) OVER (PARTITION BY event_type " +
        "ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS BIGINT) AS cum, " +
        "CAST(sum(wt) OVER (PARTITION BY event_type) AS BIGINT) AS tot " +
        "FROM v) " +
        "SELECT event_type, min(cents) AS wmedian_cents, " +
        "min(tot) AS total_wt FROM c WHERE cum * 2 >= tot " +
        "GROUP BY event_type ORDER BY event_type"),

    // same islands arithmetic, same earliest-streak tie rule
    "q324_activity_streaks" ->
      ("WITH dd AS (SELECT DISTINCT user_id, " +
        "epoch_ns(ts) // 86400000000000 AS day FROM events), " +
        "g AS (SELECT user_id, day, day - row_number() OVER (" +
        "PARTITION BY user_id ORDER BY day) AS grp FROM dd), " +
        "st AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len, " +
        "min(day) AS start_day FROM g GROUP BY 1, 2), " +
        "r AS (SELECT user_id, len, start_day, row_number() OVER (" +
        "PARTITION BY user_id ORDER BY len DESC, start_day) AS rn FROM st) " +
        "SELECT user_id, len AS streak_len, " +
        "CAST(start_day AS BIGINT) AS streak_start_day FROM r " +
        "WHERE rn = 1 ORDER BY user_id"),

    // same cross-multiplied winner comparisons, same micro rates,
    // same -1 sentinel on a 0-denominator rate (DuckDB // errors on 0)
    "q319_simpson_audit" ->
      ("WITH b AS (SELECT event_type, user_id % 2 AS variant, " +
        "CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000 " +
        "THEN 1 ELSE 0 END AS succ FROM events), " +
        "g AS (SELECT event_type, " +
        "CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
        "CAST(SUM(CASE WHEN variant = 0 THEN succ ELSE 0 END) AS BIGINT) AS s0, " +
        "CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
        "CAST(SUM(CASE WHEN variant = 1 THEN succ ELSE 0 END) AS BIGINT) AS s1 " +
        "FROM b GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(n0) AS BIGINT) AS tn0, " +
        "CAST(SUM(s0) AS BIGINT) AS ts0, CAST(SUM(n1) AS BIGINT) AS tn1, " +
        "CAST(SUM(s1) AS BIGINT) AS ts1 FROM g) " +
        "SELECT event_type, " +
        "CAST(CASE WHEN n0 > 0 THEN s0::HUGEINT * 1000000 // n0 " +
        "ELSE -1 END AS BIGINT) AS rate0_micro, " +
        "CAST(CASE WHEN n1 > 0 THEN s1::HUGEINT * 1000000 // n1 " +
        "ELSE -1 END AS BIGINT) AS rate1_micro, " +
        "s1::HUGEINT * n0 > s0::HUGEINT * n1 AS seg_v1_wins, " +
        "ts1::HUGEINT * tn0 > ts0::HUGEINT * tn1 AS overall_v1_wins, " +
        "(s1::HUGEINT * n0 > s0::HUGEINT * n1) <> " +
        "(ts1::HUGEINT * tn0 > ts0::HUGEINT * tn1) AS reversed " +
        "FROM g CROSS JOIN t ORDER BY event_type"),

    // same exact rational variance, same pinned z² literal, same
    // HUGEINT ceil-division; n/sx/sxx promoted to HUGEINT BEFORE
    // every product, mirroring the Spark side's decimal(38,0) casts —
    // including the SUM(c·c) ACCUMULATOR's element product (HUGEINT
    // there ↔ decimal(38,0) sum on the Spark side), so neither engine
    // ever rides a 64-bit partial sum
    "q320_power_analysis" ->
      ("WITH a AS (SELECT event_type, count(*) AS n, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) AS sx, " +
        "SUM(CAST(round(value * 100) AS HUGEINT) * " +
        "CAST(round(value * 100) AS BIGINT)) AS sxx " +
        "FROM events GROUP BY 1), " +
        "b AS (SELECT event_type, n, sx, " +
        "n::HUGEINT * sxx::HUGEINT - sx::HUGEINT * sx::HUGEINT AS num, " +
        "n::HUGEINT * (n - 1)::HUGEINT AS den FROM a) " +
        "SELECT event_type, CAST(n AS BIGINT) AS n, " +
        "CAST(sx // n AS BIGINT) AS mean_cents_floor, " +
        "CAST(num // den AS BIGINT) AS var_floor, " +
        s"CAST((2 * ${PowerZ2}::HUGEINT * num + " +
        "den * 250000 * 1000000000000::HUGEINT - 1) // " +
        "(den * 250000 * 1000000000000::HUGEINT) AS BIGINT) " +
        "AS n_required FROM b ORDER BY event_type"),

    // same doubled-midrank arithmetic on the value-domain histogram,
    // same HUGEINT products and -1 degenerate sentinel
    "q327_mann_whitney" ->
      ("WITH b AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) " +
        "AS cents, user_id % 2 AS v FROM events), " +
        "h AS (SELECT event_type, cents, " +
        "SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS c0, " +
        "SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS c1 " +
        "FROM b GROUP BY 1, 2), " +
        "r AS (SELECT event_type, cents, c0, c1, " +
        "COALESCE(SUM(c0 + c1) OVER (PARTITION BY event_type " +
        "ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "1 PRECEDING), 0) AS below FROM h), " +
        "g AS (SELECT event_type, CAST(SUM(c0) AS HUGEINT) AS n0, " +
        "CAST(SUM(c1) AS HUGEINT) AS n1, " +
        "SUM(c1::HUGEINT * (2 * below + c0 + c1 + 1)) AS r1d " +
        "FROM r GROUP BY 1) " +
        "SELECT event_type, CAST(n0 AS BIGINT) AS n0, " +
        "CAST(n1 AS BIGINT) AS n1, " +
        "CAST(r1d - n1 * (n1 + 1) AS BIGINT) AS u1_x2, " +
        "CAST(CASE WHEN n0 > 0 AND n1 > 0 THEN " +
        "(r1d - n1 * (n1 + 1)) * 1000000 // (2 * n0 * n1) " +
        "ELSE -1 END AS BIGINT) AS auc_micro " +
        "FROM g ORDER BY event_type"),

    // same cross-multiplied ECDF gaps, same deterministic argmax
    "q328_ks_two_sample" ->
      ("WITH b AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) " +
        "AS cents, user_id % 2 AS v FROM events), " +
        "h AS (SELECT event_type, cents, " +
        "SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS c0, " +
        "SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS c1 " +
        "FROM b GROUP BY 1, 2), " +
        "g AS (SELECT event_type, cents, " +
        "SUM(c0) OVER (PARTITION BY event_type ORDER BY cents " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0, " +
        "SUM(c1) OVER (PARTITION BY event_type ORDER BY cents " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1, " +
        "SUM(c0) OVER (PARTITION BY event_type) AS n0, " +
        "SUM(c1) OVER (PARTITION BY event_type) AS n1 FROM h), " +
        "gp AS (SELECT event_type, cents, n0, n1, " +
        "abs(cum0::HUGEINT * n1 - cum1::HUGEINT * n0) AS gap FROM g), " +
        "mx AS (SELECT event_type, cents, n0, n1, gap, " +
        "MAX(gap) OVER (PARTITION BY event_type) AS mxg FROM gp) " +
        "SELECT event_type, CAST(MAX(n0) AS BIGINT) AS n0, " +
        "CAST(MAX(n1) AS BIGINT) AS n1, " +
        "CAST(CASE WHEN MAX(n0) > 0 AND MAX(n1) > 0 THEN " +
        "MAX(gap) * 1000000 // (MAX(n0)::HUGEINT * MAX(n1)) " +
        "ELSE -1 END AS BIGINT) AS d_micro, " +
        "CAST(MIN(CASE WHEN gap = mxg THEN cents END) AS BIGINT) " +
        "AS ks_at_cents " +
        "FROM mx GROUP BY event_type ORDER BY event_type"),

    // same division-free 20·cum ≥ k·tot percentile rule on the same
    // histogram cells, same 19-cut grid
    "q336_qq_shift" ->
      ("WITH b AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) " +
        "AS cents, user_id % 2 AS v FROM events), " +
        "h AS (SELECT event_type, v, cents, COUNT(*) AS w " +
        "FROM b GROUP BY 1, 2, 3), " +
        "c AS (SELECT event_type, v, cents, " +
        "SUM(w) OVER (PARTITION BY event_type, v ORDER BY cents " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "SUM(w) OVER (PARTITION BY event_type, v) AS tot FROM h), " +
        "kk AS (SELECT unnest(generate_series(1, 19)) AS k), " +
        "q AS (SELECT event_type, v, k, MIN(cents) AS q " +
        "FROM c CROSS JOIN kk WHERE cum * 20 >= k * tot " +
        "GROUP BY 1, 2, 3) " +
        "SELECT event_type, CAST(k * 5 AS BIGINT) AS pct, " +
        "MAX(CASE WHEN v = 0 THEN q END) AS q0_cents, " +
        "MAX(CASE WHEN v = 1 THEN q END) AS q1_cents, " +
        "MAX(CASE WHEN v = 1 THEN q END) - " +
        "MAX(CASE WHEN v = 0 THEN q END) AS shift_cents " +
        "FROM q GROUP BY 1, 2 ORDER BY event_type, pct"),

    // same weighted-domain cums, same exact rank arithmetic
    "q316_ecdf_ranks" ->
      ("WITH h AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) " +
        "AS cents, count(*) AS w FROM events GROUP BY 1, 2), " +
        "c AS (SELECT event_type, cents, w, SUM(w) OVER (" +
        "PARTITION BY event_type ORDER BY cents " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "SUM(w) OVER (PARTITION BY event_type) AS n FROM h) " +
        "SELECT event_type, cents, CAST(w AS BIGINT) AS w, " +
        "CAST(cum * 1000000 // n AS BIGINT) AS cume_micro, " +
        "CAST((cum - w) * 1000000 // greatest(n - 1, 1) AS BIGINT) " +
        "AS prank_micro " +
        "FROM c ORDER BY event_type, cents"),

    // same daily fold, same PINNED weight-ladder literals
    "q317_exp_smoothing" -> {
      val wSm = SesSmoothW.mkString("[", ", ", "]")
      val wIn = SesInitW.mkString("[", ", ", "]")
      "WITH daily AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "ix AS (SELECT event_type, day, x, row_number() OVER (" +
        "PARTITION BY event_type ORDER BY day) AS idx FROM daily), " +
        "j AS (SELECT a.event_type, a.day, a.x, " +
        s"CASE WHEN b.i = 1 THEN b.xi * ($wIn)[a.idx - b.i + 1] " +
        s"ELSE b.xi * ($wSm)[a.idx - b.i + 1] END AS term " +
        "FROM ix a JOIN (SELECT event_type, x AS xi, idx AS i FROM ix) b " +
        "ON b.event_type = a.event_type AND b.i <= a.idx) " +
        "SELECT event_type, day, x, " +
        "CAST(SUM(term) // 1000 AS BIGINT) AS ses_micro " +
        "FROM j GROUP BY 1, 2, 3 ORDER BY event_type, day"
    },

    // the melt round trip must equal the direct long-form aggregate
    "q314_unpivot" ->
      ("SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n " +
        "FROM events GROUP BY 1, 2 ORDER BY user_id, event_type"),

    // same RANGE frame on the ns event-time axis, same peer rule
    "q315_range_frame" ->
      ("SELECT user_id, event_id, " +
        "CAST(count(*) OVER w AS BIGINT) AS n_1h, " +
        "CAST(SUM(cents) OVER w AS BIGINT) AS sum_1h_cents " +
        "FROM (SELECT user_id, event_id, epoch_ns(ts) AS tsn, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events) " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY tsn " +
        "RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW) " +
        "ORDER BY user_id, event_id"),

    // same string-form digit extraction; the Benford expectations are
    // the SAME pinned literals the Spark plan uses (no runtime log)
    "q198_benford_audit" ->
      ("WITH dg AS (SELECT CAST(substr(CAST(abs(CAST(round(value * 100) " +
        "AS BIGINT)) AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM events), " +
        "c AS (SELECT digit, count(*) AS n FROM dg WHERE digit >= 1 " +
        "GROUP BY 1), " +
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c) " +
        "SELECT digit, n, n * 1000000 // tot AS share_micro, " +
        s"(${BenfordMicro.mkString("[", ", ", "]")})[digit] " +
        "AS benford_micro, " +
        "abs(n * 1000000 // tot - " +
        s"(${BenfordMicro.mkString("[", ", ", "]")})[digit]) " +
        "AS dev_micro FROM c CROSS JOIN t ORDER BY digit"),

    // same per-user counts, same pinned chi-square expression
    "q194_srm_check" ->
      ("WITH u AS (SELECT DISTINCT user_id FROM events), " +
        "v AS (SELECT user_id % 2 AS variant, count(*) AS n FROM u " +
        "GROUP BY 1), " +
        "o AS (SELECT CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) " +
        "AS n0, CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1 " +
        "FROM v), " +
        "t AS (SELECT n0, n1, CAST(n0 + n1 AS DOUBLE) / 2.0 AS e FROM o) " +
        "SELECT n0, n1, " +
        "round((CAST(n0 AS DOUBLE) - e) * (CAST(n0 AS DOUBLE) - e) / e + " +
        "(CAST(n1 AS DOUBLE) - e) * (CAST(n1 AS DOUBLE) - e) / e, 6) " +
        "AS chi2, " +
        "((CAST(n0 AS DOUBLE) - e) * (CAST(n0 AS DOUBLE) - e) / e + " +
        "(CAST(n1 AS DOUBLE) - e) * (CAST(n1 AS DOUBLE) - e) / e) > 3.841 " +
        "AS srm_flag FROM t"),

    // same contingency cells, same single-floor micro-log terms,
    // one trailing integer division
    "q195_mutual_info" ->
      ("WITH cells AS (SELECT event_type, " +
        "(epoch_ns(ts) // 86400000000000 + 4) % 7 AS dow, count(*) AS c " +
        "FROM events GROUP BY 1, 2), " +
        "r AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS r FROM cells " +
        "GROUP BY 1), " +
        "s AS (SELECT dow, CAST(sum(c) AS BIGINT) AS s FROM cells " +
        "GROUP BY 1), " +
        "t AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells), " +
        "terms AS (SELECT c * " +
        "(CAST(floor((ln(c) + ln(nn)) * 1000000) AS BIGINT) - " +
        "CAST(floor((ln(r.r) + ln(s.s)) * 1000000) AS BIGINT)) AS term, nn " +
        "FROM cells JOIN r ON cells.event_type = r.event_type " +
        "JOIN s ON cells.dow = s.dow CROSS JOIN t) " +
        "SELECT CAST(sum(term) // min(nn) AS BIGINT) AS mi_micro, " +
        "count(*) AS n_cells FROM terms"),

    // same two-pass conditional minimum, same bounded percentile
    "q191_funnel_latency" ->
      ("WITH tv AS (SELECT user_id, min(epoch_ns(ts)) AS tv FROM events " +
        "WHERE event_type = 'view' GROUP BY 1), " +
        "c AS (SELECT e.user_id, " +
        "min(epoch_ns(e.ts) - tv.tv) // 60000000000 AS delta_min " +
        "FROM events e JOIN tv ON e.user_id = tv.user_id " +
        "WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > tv.tv " +
        "GROUP BY 1) " +
        "SELECT count(*) AS n_conv, " +
        "CAST(sum(delta_min) // count(*) AS BIGINT) AS mean_min, " +
        "CAST(floor(quantile_cont(delta_min, 0.5) * 1000000) AS BIGINT) " +
        "AS p50_micro, " +
        "CAST(floor(quantile_cont(delta_min, 0.9) * 1000000) AS BIGINT) " +
        "AS p90_micro FROM c"),

    // same leaf aggregate, same integer-micro share arithmetic
    "q192_share_of_parent" ->
      ("WITH leaf AS (SELECT r_name, n_name, " +
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) " +
        "AS rev_cents " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY 1, 2), " +
        "rg AS (SELECT r_name, CAST(sum(rev_cents) AS BIGINT) " +
        "AS region_cents FROM leaf GROUP BY 1), " +
        "tt AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS total_cents " +
        "FROM leaf) " +
        "SELECT leaf.r_name, n_name, rev_cents, " +
        "rev_cents * 1000000 // region_cents AS share_of_region_micro, " +
        "region_cents * 1000000 // total_cents AS region_share_micro " +
        "FROM leaf JOIN rg ON leaf.r_name = rg.r_name CROSS JOIN tt " +
        "ORDER BY leaf.r_name, n_name"),

    // same ordered deltas; list_prepend(0, …) supplies the explicit
    // zero init Spark's aggregate() takes directly
    "q189_clamped_balance" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id, " +
        "CASE WHEN event_type = 'purchase' " +
        "THEN -CAST(round(value * 100) AS BIGINT) " +
        "ELSE CAST(round(value * 100) AS BIGINT) END AS delta " +
        "FROM events), " +
        "a AS (SELECT user_id, count(*) AS n, " +
        "list(delta ORDER BY tns, event_id) AS seq FROM e GROUP BY 1) " +
        "SELECT user_id, n, " +
        "list_reduce(list_prepend(0, seq), " +
        "(acc, x) -> greatest(0, acc + x)) AS final_bal " +
        "FROM a ORDER BY user_id"),

    // same integer Hamilton shares — // and % on the positive domain
    "q186_allocation" ->
      ("WITH li AS (SELECT l_orderkey, l_linenumber, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty " +
        "FROM lineitem GROUP BY 1, 2), " +
        "j AS (SELECT l_orderkey, l_linenumber, qty, " +
        "CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents " +
        "FROM li JOIN orders ON l_orderkey = o_orderkey), " +
        "w AS (SELECT *, CAST(sum(qty) OVER (PARTITION BY l_orderkey) " +
        "AS BIGINT) AS qsum FROM j), " +
        "b AS (SELECT *, total_cents * qty // qsum AS base, " +
        "(total_cents * qty) % qsum AS frac FROM w), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey " +
        "ORDER BY frac DESC, l_linenumber) AS rk, " +
        "total_cents - CAST(sum(base) OVER (PARTITION BY l_orderkey) " +
        "AS BIGINT) AS rem FROM b) " +
        "SELECT l_orderkey, l_linenumber, " +
        "CAST(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT) " +
        "AS alloc_cents FROM r ORDER BY l_orderkey, l_linenumber"),

    // the naive greatest-(t, id)-click-per-purchase form — the as-of
    // rewrite must reproduce its tie rules exactly
    "q187_attribution" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS t, " +
        "event_type, CAST(round(value * 100) AS BIGINT) AS cents " +
        "FROM events), " +
        "p AS (SELECT user_id, event_id, t, cents FROM e " +
        "WHERE event_type = 'purchase'), " +
        "c AS (SELECT user_id, event_id, t FROM e " +
        "WHERE event_type = 'click'), " +
        "j AS (SELECT p.event_id AS pid, p.cents, p.t AS pt, " +
        "c.t AS ct, row_number() OVER (PARTITION BY p.event_id " +
        "ORDER BY c.t DESC, c.event_id DESC) AS rn " +
        "FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.t <= p.t), " +
        "a AS (SELECT pid, cents, " +
        "CASE WHEN ct IS NOT NULL AND pt - ct <= 86400000000000 " +
        "THEN (ct % 86400000000000) // 3600000000000 ELSE -1 END " +
        "AS click_hour FROM j WHERE rn = 1) " +
        "SELECT click_hour, count(*) AS n, " +
        "CAST(sum(cents) AS BIGINT) AS rev_cents FROM a " +
        "GROUP BY 1 ORDER BY 1"),

    // strictly-before windows + the INTERVAL form of the as-of join
    // (q128's rule) — leakage on either side hash-mismatches
    "q185_feature_assembly" ->
      ("WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS t, " +
        "event_type, CAST(round(value * 100) AS BIGINT) AS cents " +
        "FROM events), " +
        "f AS (SELECT *, count(*) OVER wp AS prior_n, " +
        "COALESCE(sum(cents) OVER wp, 0) AS prior_cents FROM e " +
        "WINDOW wp AS (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
        "p AS (SELECT * FROM f WHERE event_type = 'purchase'), " +
        "ch AS (SELECT user_id, epoch_ns(ts) AS t, max(value) AS attr " +
        "FROM events WHERE event_type = 'signup' GROUP BY 1, 2), " +
        "v AS (SELECT user_id, attr, t AS vf, " +
        "lead(t) OVER (PARTITION BY user_id ORDER BY t) AS vt FROM ch) " +
        "SELECT p.event_id, p.user_id, p.cents AS label_cents, " +
        "CAST(p.prior_n AS BIGINT) AS prior_n, " +
        "CAST(p.prior_cents AS BIGINT) AS prior_cents, " +
        "round(v.attr, 6) AS profile_attr, " +
        "(p.t // 86400000000000 + 4) % 7 AS dow " +
        "FROM p LEFT JOIN v ON p.user_id = v.user_id " +
        "AND v.vf <= p.t AND (v.vt IS NULL OR p.t < v.vt) " +
        "ORDER BY p.event_id"),

    // same daily aggregate, same HUGEINT-safe grouped closed form
    "q181_trend_slopes" ->
      ("WITH daily AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, count(*) AS y " +
        "FROM events GROUP BY 1, 2), " +
        "s AS (SELECT event_type, count(*) AS k, " +
        "CAST(sum(day) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
        "sum(CAST(day AS HUGEINT) * y) AS sxy, " +
        "sum(CAST(day AS HUGEINT) * day) AS sxx FROM daily GROUP BY 1), " +
        "f AS (SELECT event_type, k, sy, " +
        "CAST(CAST(k AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) " +
        "/ CAST(CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) " +
        "AS slope_raw FROM s) " +
        "SELECT event_type, k, sy, round(slope_raw, 6) AS slope, " +
        "slope_raw > 0 AS growing FROM f ORDER BY event_type"),

    // hop-bounded recursive exploration, min(hop) per node, LEFT JOIN
    // keeps unreachable nations as NULL
    "q172_bfs_hops" ->
      ("WITH RECURSIVE ed AS (SELECT DISTINCT " +
        "CAST(least(s_nationkey, c_nationkey) AS BIGINT) AS lo, " +
        "CAST(greatest(s_nationkey, c_nationkey) AS BIGINT) AS hi " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE s_nationkey <> c_nationkey), " +
        "edges AS (SELECT lo AS src, hi AS dst FROM ed " +
        "UNION SELECT hi, lo FROM ed), " +
        "bfs(id, hop) AS (SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT) " +
        "UNION SELECT e.dst, b.hop + 1 FROM bfs b " +
        "JOIN edges e ON e.src = b.id WHERE b.hop < 30), " +
        "lab AS (SELECT id, min(hop) AS hop FROM bfs GROUP BY id) " +
        "SELECT CAST(n_nationkey AS BIGINT) AS nation, lab.hop " +
        "FROM nation LEFT JOIN lab ON lab.id = n_nationkey " +
        "ORDER BY nation"),

    // same ordered series, same seeded integer fold (list_reduce
    // seeds at the first element exactly like the Spark aggregate's
    // explicit init; // ≡ div on the positive domain)
    "q174_ema_smoothing" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "a AS (SELECT user_id, count(*) AS n, " +
        "list(cents * 100 ORDER BY tns, event_id) AS seq " +
        "FROM e GROUP BY 1) " +
        "SELECT user_id, n, " +
        "list_reduce(seq, (acc, x) -> (2 * x + 8 * acc) // 10) AS ema_c100 " +
        "FROM a ORDER BY user_id"),

    // same per-user pre/post sums, same HUGEINT-safe θ closed form,
    // same pinned double order for the adjusted means
    "q175_cuped" ->
      ("WITH cut AS (SELECT min(epoch_ns(ts)) + " +
        "(max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2 AS c FROM events), " +
        "per AS (SELECT user_id, user_id % 2 AS variant, " +
        "CAST(sum(CASE WHEN epoch_ns(ts) < (SELECT c FROM cut) " +
        "THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x, " +
        "CAST(sum(CASE WHEN epoch_ns(ts) >= (SELECT c FROM cut) " +
        "THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y " +
        "FROM events GROUP BY 1, 2), " +
        "s AS (SELECT count(*) AS k, CAST(sum(x) AS BIGINT) AS sx, " +
        "CAST(sum(y) AS BIGINT) AS sy, " +
        "sum(CAST(x AS HUGEINT) * y) AS sxy, " +
        "sum(CAST(x AS HUGEINT) * x) AS sxx, " +
        "CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0, " +
        "CAST(sum(CASE WHEN variant = 0 THEN x END) AS BIGINT) AS x0, " +
        "CAST(sum(CASE WHEN variant = 0 THEN y END) AS BIGINT) AS y0, " +
        "CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
        "CAST(sum(CASE WHEN variant = 1 THEN x END) AS BIGINT) AS x1, " +
        "CAST(sum(CASE WHEN variant = 1 THEN y END) AS BIGINT) AS y1 " +
        "FROM per), " +
        "t AS (SELECT *, " +
        "CAST(CAST(k AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) " +
        "/ CAST(CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) " +
        "AS theta_raw, " +
        "CAST(sx AS DOUBLE) / CAST(k AS DOUBLE) AS xbar FROM s) " +
        "SELECT n0, n1, y0, y1, round(theta_raw, 6) AS theta, " +
        "round((CAST(y1 AS DOUBLE) - theta_raw * (CAST(x1 AS DOUBLE) - " +
        "CAST(n1 AS DOUBLE) * xbar)) / CAST(n1 AS DOUBLE) - " +
        "(CAST(y0 AS DOUBLE) - theta_raw * (CAST(x0 AS DOUBLE) - " +
        "CAST(n0 AS DOUBLE) * xbar)) / CAST(n0 AS DOUBLE), 6) AS adj_lift " +
        "FROM t"),

    // same two quantile passes, same exact integer flag rule
    "q168_mad_outliers" ->
      ("WITH e AS (SELECT event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "med AS (SELECT event_type, " +
        "CAST(floor(quantile_cont(cents, 0.5) * 1000000) AS BIGINT) " +
        "AS med_micro FROM e GROUP BY 1), " +
        "dev AS (SELECT e.event_type, med.med_micro, " +
        "abs(cents * 1000000 - med_micro) AS adm FROM e " +
        "JOIN med ON e.event_type = med.event_type), " +
        "mad AS (SELECT event_type, min(med_micro) AS med_micro, " +
        "CAST(floor(quantile_cont(adm, 0.5)) AS BIGINT) AS mad_micro " +
        "FROM dev GROUP BY 1) " +
        "SELECT d.event_type, count(*) AS n, min(m.med_micro) AS med_micro, " +
        "min(m.mad_micro) AS mad_micro, " +
        "CAST(sum(CASE WHEN d.adm * 10000 > 44478 * m.mad_micro " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers " +
        "FROM dev d JOIN mad m ON d.event_type = m.event_type " +
        "GROUP BY d.event_type ORDER BY d.event_type"),

    // the same ≤4-step expanding-window fan-out via generate_series
    "q169_cumulate_window" ->
      ("WITH e AS (SELECT epoch_ns(ts) // 86400000000000 AS day, " +
        "(epoch_ns(ts) % 86400000000000) // 21600000000000 + 1 " +
        "AS first_step, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "x AS (SELECT day, unnest(generate_series(first_step, 4)) AS step, " +
        "cents FROM e) " +
        "SELECT day, step, count(*) AS n, " +
        "CAST(sum(cents) AS BIGINT) AS sum_cents FROM x " +
        "GROUP BY day, step ORDER BY day, step"),

    // same micro-floored interpolated thresholds, same integer clamp
    "q164_winsorize" ->
      ("WITH e AS (SELECT event_type, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "t AS (SELECT event_type, " +
        "CAST(floor(quantile_cont(cents, 0.05) * 1000000) AS BIGINT) AS lo, " +
        "CAST(floor(quantile_cont(cents, 0.95) * 1000000) AS BIGINT) AS hi " +
        "FROM e GROUP BY 1) " +
        "SELECT e.event_type, count(*) AS n, min(lo) AS p05_micro, " +
        "min(hi) AS p95_micro, " +
        "CAST(sum(greatest(lo, least(hi, cents * 1000000))) AS BIGINT) " +
        "AS wsum_micro " +
        "FROM e JOIN t ON e.event_type = t.event_type " +
        "GROUP BY e.event_type ORDER BY e.event_type"),
    // same mask, same two frames, same pinned double expression
    // order; floor back to integer cents before the hash
    "q160_interpolate" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id, " +
        "CASE WHEN event_id % 3 = 0 THEN NULL " +
        "ELSE CAST(round(value * 100) AS BIGINT) END AS cents " +
        "FROM events), " +
        "w AS (SELECT user_id, event_id, tns, cents, " +
        "last_value(cents IGNORE NULLS) OVER wb AS pc, " +
        "last_value(CASE WHEN cents IS NOT NULL THEN tns END IGNORE NULLS) " +
        "OVER wb AS pt, " +
        "first_value(cents IGNORE NULLS) OVER wf AS nc, " +
        "first_value(CASE WHEN cents IS NOT NULL THEN tns END IGNORE NULLS) " +
        "OVER wf AS nt FROM e WINDOW " +
        "wb AS (PARTITION BY user_id ORDER BY tns, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
        "wf AS (PARTITION BY user_id ORDER BY tns, event_id " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
        "SELECT user_id, event_id, cents, " +
        "CASE WHEN cents IS NOT NULL THEN cents " +
        "WHEN pc IS NULL OR nc IS NULL THEN NULL " +
        "WHEN nt = pt THEN pc " +
        "ELSE pc + CAST(floor(CAST(nc - pc AS DOUBLE) * " +
        "CAST(tns - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) AS BIGINT) " +
        "END AS interp FROM w ORDER BY user_id, event_id"),

    // same day-pair concordance counts and tie classes, identical
    // pinned √·√ ratio text
    "q293_kendall_tau" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS xc, " +
        "COUNT(*) AS yc FROM events GROUP BY 1, 2), " +
        "p AS (SELECT a.event_type, COUNT(*) AS n0, " +
        "CAST(SUM(CASE WHEN (b.xc > a.xc AND b.yc > a.yc) OR " +
        "(b.xc < a.xc AND b.yc < a.yc) THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS c, " +
        "CAST(SUM(CASE WHEN (b.xc > a.xc AND b.yc < a.yc) OR " +
        "(b.xc < a.xc AND b.yc > a.yc) THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS dd, " +
        "CAST(SUM(CASE WHEN b.xc = a.xc THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS tx, " +
        "CAST(SUM(CASE WHEN b.yc = a.yc THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS ty FROM dl a JOIN dl b ON a.event_type = b.event_type " +
        "AND a.day < b.day GROUP BY 1) " +
        "SELECT event_type, CAST(n0 AS BIGINT) AS n0, c, dd, " +
        "CASE WHEN n0 > tx AND n0 > ty THEN " +
        "round(CAST(c - dd AS DOUBLE) / " +
        "(sqrt(CAST(n0 - tx AS DOUBLE)) * sqrt(CAST(n0 - ty AS DOUBLE)))" +
        ", 6) END AS tau_b FROM p ORDER BY event_type"),
    // same per-user counts, HUGEINT squares, one division + the
    // uniform floor
    "q294_hhi_concentration" ->
      ("WITH cu AS (SELECT event_type, user_id, COUNT(*) AS cu " +
        "FROM events GROUP BY 1, 2), " +
        "ag AS (SELECT event_type, COUNT(*) AS n_users, " +
        "CAST(SUM(cu) AS BIGINT) AS n_events, " +
        "SUM(CAST(cu AS HUGEINT) * cu) AS sq FROM cu GROUP BY 1) " +
        "SELECT event_type, CAST(n_users AS BIGINT) AS n_users, " +
        "n_events, CAST(sq * 1000000 // (CAST(n_events AS HUGEINT) " +
        "* n_events) AS BIGINT) AS hhi_micro, " +
        "CAST(1000000 // n_users AS BIGINT) AS uniform_micro " +
        "FROM ag ORDER BY event_type"),
    // same daily counts, same exact n²-scaled variance ratio
    "q298_dispersion_index" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, COUNT(*) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "ag AS (SELECT event_type, COUNT(*) AS n_days, " +
        "CAST(SUM(x) AS BIGINT) AS n_events, " +
        "SUM(CAST(x AS HUGEINT) * x) AS sx2 FROM dl GROUP BY 1) " +
        "SELECT event_type, CAST(n_days AS BIGINT) AS n_days, " +
        "n_events, CAST((n_days * sx2 - CAST(n_events AS HUGEINT) " +
        "* n_events) * 1000000 // ((n_days - 1) * " +
        "CAST(n_events AS HUGEINT)) AS BIGINT) AS dispersion_micro " +
        "FROM ag WHERE n_days > 1 AND n_events > 0 " +
        "ORDER BY event_type"),
    // q277's decomposition chain + n²·Var closed form per component,
    // identical quantized F divisions and clamps
    "q295_seasonal_strength" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) // COUNT(*) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "t AS (SELECT event_type, day, x, " +
        "CASE WHEN COUNT(*) OVER w = 7 " +
        "AND MAX(day) OVER w - MIN(day) OVER w = 6 " +
        "THEN CAST(SUM(x) OVER w // 7 AS BIGINT) END AS trend, " +
        "day % 7 AS dow FROM dl WINDOW w AS " +
        "(PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
        "t2 AS (SELECT *, x - trend AS det FROM t), " +
        "se AS (SELECT event_type, dow, " +
        "CAST(SUM(det) // COUNT(*) AS BIGINT) AS seasonal " +
        "FROM t2 WHERE det IS NOT NULL GROUP BY 1, 2), " +
        "fu AS (SELECT t2.event_type, " +
        "CAST(t2.x - t2.trend - se.seasonal AS BIGINT) AS r, " +
        "CAST(t2.trend + (t2.x - t2.trend - se.seasonal) AS BIGINT) " +
        "AS tr, " +
        "CAST(se.seasonal + (t2.x - t2.trend - se.seasonal) AS BIGINT) " +
        "AS sr FROM t2 JOIN se ON t2.event_type = se.event_type " +
        "AND t2.dow = se.dow WHERE t2.trend IS NOT NULL), " +
        "ag AS (SELECT event_type, COUNT(*) AS n_days, " +
        "COUNT(*) * SUM(CAST(r AS HUGEINT) * r) " +
        "- SUM(CAST(r AS HUGEINT)) * SUM(r) AS vr, " +
        "COUNT(*) * SUM(CAST(tr AS HUGEINT) * tr) " +
        "- SUM(CAST(tr AS HUGEINT)) * SUM(tr) AS vtr, " +
        "COUNT(*) * SUM(CAST(sr AS HUGEINT) * sr) " +
        "- SUM(CAST(sr AS HUGEINT)) * SUM(sr) AS vsr " +
        "FROM fu GROUP BY 1) " +
        "SELECT event_type, CAST(n_days AS BIGINT) AS n_days, " +
        "CASE WHEN vtr > 0 THEN GREATEST(0, 1000000 - " +
        "CAST(vr * 1000000 // vtr AS BIGINT)) END AS f_trend_micro, " +
        "CASE WHEN vsr > 0 THEN GREATEST(0, 1000000 - " +
        "CAST(vr * 1000000 // vsr AS BIGINT)) END AS f_seasonal_micro " +
        "FROM ag ORDER BY event_type"),
    // same quantized two-segment gain over exact prefix sums, argmax
    // replayed as max-gain + min-day (k monotone in day)
    "q296_binary_segmentation" ->
      ("WITH dl AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "SUM(CAST(round(value * 100) AS BIGINT)) // COUNT(*) AS x " +
        "FROM events GROUP BY 1, 2), " +
        "r AS (SELECT event_type, day, " +
        "CAST(row_number() OVER (PARTITION BY event_type " +
        "ORDER BY day) AS BIGINT) AS k, " +
        "COUNT(*) OVER (PARTITION BY event_type) AS n, " +
        "CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        "AS sl, " +
        "CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS st " +
        "FROM dl), " +
        "g AS (SELECT event_type, day, k, n, " +
        "(CAST(sl AS HUGEINT) * sl * (n - k) " +
        "+ CAST(st - sl AS HUGEINT) * (st - sl) * k) * 1000000 " +
        "// (CAST(k AS HUGEINT) * (n - k)) AS g " +
        "FROM r WHERE k < n), " +
        "b AS (SELECT event_type, MAX(g) AS mg, MAX(n) AS nd " +
        "FROM g GROUP BY 1), " +
        "f AS (SELECT g.event_type, b.nd, g.day, g.k, g.g FROM g " +
        "JOIN b ON g.event_type = b.event_type AND g.g = b.mg) " +
        "SELECT event_type, CAST(nd AS BIGINT) AS n_days, " +
        "CAST(MIN(day) AS BIGINT) AS split_after_day, " +
        "CAST(MIN(k) AS BIGINT) AS left_days, " +
        "CAST(MIN(g) AS BIGINT) AS gain_quantized " +
        "FROM f GROUP BY 1, 2 ORDER BY event_type"),
    // same cents histogram, same cross-multiplied CDF gaps, HUGEINT
    // segment sums, one trailing division
    "q292_wasserstein" ->
      ("WITH h AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, " +
        "SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS a, " +
        "SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS b " +
        "FROM events WHERE event_type = 'purchase' GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(a) AS BIGINT) AS na, " +
        "CAST(SUM(b) AS BIGINT) AS nb FROM h), " +
        "c AS (SELECT v, SUM(a) OVER w AS cuma, SUM(b) OVER w AS cumb, " +
        "lead(v) OVER (ORDER BY v) AS nextv FROM h WINDOW w AS " +
        "(ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "s AS (SELECT ABS(CAST(cuma AS HUGEINT) * nb - " +
        "CAST(cumb AS HUGEINT) * na) * (nextv - v) AS seg, na, nb " +
        "FROM c CROSS JOIN t WHERE nextv IS NOT NULL) " +
        "SELECT na AS n_a, nb AS n_b, " +
        "CAST(SUM(seg) * 1000000 // (CAST(na AS HUGEINT) * nb) " +
        "AS BIGINT) AS w1_micro_cents FROM s GROUP BY 1, 2"),
    // same day-rank quartile looks, q161's pinned z text per look,
    // identical interpolated OBF boundary literals
    "q290_obrien_fleming" ->
      ("WITH ce AS (SELECT epoch_ns(ts) // 86400000000000 AS day, " +
        "user_id % 2 AS variant, " +
        "CAST(event_type = 'purchase' AS BIGINT) AS conv FROM events), " +
        "cells AS (SELECT day, variant, COUNT(*) AS n, " +
        "CAST(SUM(conv) AS BIGINT) AS c FROM ce GROUP BY 1, 2), " +
        "dr AS (SELECT day, CAST(row_number() OVER (ORDER BY day) " +
        "AS BIGINT) AS rk FROM (SELECT DISTINCT day FROM cells)), " +
        "dn AS (SELECT COUNT(*) AS nd FROM dr), " +
        "lo AS (SELECT look, COUNT(DISTINCT day) AS n_days, " +
        "CAST(SUM(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n0, " +
        "CAST(SUM(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c0, " +
        "CAST(SUM(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1, " +
        "CAST(SUM(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c1 " +
        "FROM cells JOIN dr USING (day) CROSS JOIN dn " +
        "CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS look) ks " +
        "WHERE rk <= (look * nd + 3) // 4 GROUP BY 1), " +
        "z AS (SELECT look, n_days, n0, c0, n1, c1, " +
        "round((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) - " +
        "CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / " +
        "sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) * " +
        "(1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) * " +
        "(1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 6) " +
        "AS z, CASE look" +
        (1 to 4).map(k => s" WHEN $k THEN ${ObfBoundMicro(k)}")
          .mkString +
        " END AS bound_micro FROM lo) " +
        "SELECT CAST(look AS BIGINT) AS look, " +
        "CAST(n_days AS BIGINT) AS n_days, n0, c0, n1, c1, z, " +
        "CAST(bound_micro AS BIGINT) AS bound_micro, " +
        "abs(z) * 1000000 > CAST(bound_micro AS DOUBLE) AS crossed " +
        "FROM z ORDER BY look"),
    // exact integer counts into the pinned z formula
    "q161_ab_ztest" ->
      ("WITH a AS (SELECT user_id % 2 AS variant, count(*) AS n, " +
        "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS c FROM events GROUP BY 1), " +
        "o AS (SELECT " +
        "CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n0, " +
        "CAST(sum(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c0, " +
        "CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1, " +
        "CAST(sum(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c1 " +
        "FROM a) " +
        "SELECT n0, c0, n1, c1, " +
        "round((CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) - " +
        "CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / " +
        "sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) * " +
        "(1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) * " +
        "(1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 6) AS z " +
        "FROM o"),

    // same null mask, same per-user frame; DuckDB spells the option
    // inside the aggregate call
    "q158_fill_forward" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts) AS tns, event_id, " +
        "CASE WHEN event_id % 3 = 0 THEN NULL " +
        "ELSE CAST(round(value * 100) AS BIGINT) END AS cents " +
        "FROM events) " +
        "SELECT user_id, event_id, cents, " +
        "last_value(cents IGNORE NULLS) OVER (PARTITION BY user_id " +
        "ORDER BY tns, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled " +
        "FROM e ORDER BY user_id, event_id"),

    // tie-heavy relative ranks: both engines must agree on the
    // (rank-1)/(n-1) and peers-inclusive definitions
    "q159_rank_analytics" ->
      ("WITH e AS (SELECT event_type, event_id, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events) " +
        "SELECT event_type, event_id, cents, " +
        "round(percent_rank() OVER (PARTITION BY event_type " +
        "ORDER BY cents), 6) AS pr, " +
        "round(cume_dist() OVER (PARTITION BY event_type " +
        "ORDER BY cents), 6) AS cd " +
        "FROM e ORDER BY event_type, event_id"),

    // the full-scan profile the observed metrics must reproduce
    "q148_observed_metrics" ->
      ("SELECT count(*) AS n_rows, " +
        "CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) > 10000 " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_large, " +
        "min(CAST(round(value * 100) AS BIGINT)) AS min_cents, " +
        "max(CAST(round(value * 100) AS BIGINT)) AS max_cents " +
        "FROM events"),
    "q127_scd2_build" ->
      ("WITH ch AS (SELECT user_id, epoch_ns(ts) AS t, max(value) AS attr " +
        "FROM events WHERE event_type = 'signup' GROUP BY 1, 2) " +
        "SELECT user_id, round(attr, 6) AS attr, t AS valid_from, " +
        "lead(t) OVER (PARTITION BY user_id ORDER BY t) AS valid_to, " +
        "lead(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL AS is_current " +
        "FROM ch ORDER BY user_id, valid_from"),
    // the INTERVAL formulation on purpose — proves the engine's as-of
    // rewrite implements point-in-time semantics (see q128's comment)
    "q128_temporal_join" ->
      ("WITH ch AS (SELECT user_id, epoch_ns(ts) AS t, max(value) AS attr " +
        "FROM events WHERE event_type = 'signup' GROUP BY 1, 2), " +
        "v AS (SELECT user_id, attr, t AS vf, " +
        "lead(t) OVER (PARTITION BY user_id ORDER BY t) AS vt FROM ch), " +
        "f AS (SELECT event_id, user_id, epoch_ns(ts) AS t FROM events " +
        "WHERE event_type = 'purchase') " +
        "SELECT f.event_id, f.user_id, f.t AS ts, round(v.attr, 6) AS attr " +
        "FROM f LEFT JOIN v ON f.user_id = v.user_id " +
        "AND v.vf <= f.t AND (v.vt IS NULL OR f.t < v.vt) " +
        "ORDER BY event_id"),
    // direct interval-join formulation, independent of the ×7 fan-out
    "q132_rolling_distinct" ->
      ("WITH ud AS (SELECT DISTINCT user_id, " +
        "epoch_ns(ts) // 86400000000000 AS day FROM events), " +
        "days AS (SELECT DISTINCT day FROM ud) " +
        "SELECT d.day, count(DISTINCT u.user_id) AS dau7 " +
        "FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day " +
        "GROUP BY d.day ORDER BY d.day"),
    // routing recomputed from the corruption rule alone: the gate
    // checks the REAL parser accepts exactly the well-formed lines
    "q134_dlq_routing" ->
      ("SELECT CASE WHEN event_id % 7 = 3 THEN 'dlq' ELSE 'ok' END AS route, " +
        "count(*) AS n, " +
        "sum(CASE WHEN event_id % 7 <> 3 " +
        "THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END) AS k_sum " +
        "FROM events GROUP BY 1 ORDER BY route"),
    "q135_skew_stats" ->
      ("WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1) " +
        "SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS total, " +
        "max(c) AS max_c, min(c) AS min_c, " +
        "CAST(floor(quantile_cont(c, 0.5) * 1000000) AS BIGINT) AS p50_micro, " +
        "CAST(floor(quantile_cont(c, 0.9) * 1000000) AS BIGINT) AS p90_micro, " +
        "CAST(max(c) * count(*) * 1000000 // CAST(sum(c) AS BIGINT) AS BIGINT) " +
        "AS skew_micro FROM c"),
    // the naive a<b<c triple self-join — the orientation trick must
    // reproduce it exactly
    "q136_triangle_count" ->
      ("WITH ed AS (SELECT DISTINCT " +
        "least(s_nationkey, c_nationkey) AS lo, " +
        "greatest(s_nationkey, c_nationkey) AS hi " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE s_nationkey <> c_nationkey) " +
        "SELECT count(*) AS triangles FROM ed e1 " +
        "JOIN ed e2 ON e1.lo = e2.lo AND e1.hi < e2.hi " +
        "JOIN ed e3 ON e3.lo = e1.hi AND e3.hi = e2.hi"),
    // exact sizes recomputed; the est_ok flags are literal TRUE — the
    // Spark side must land its sketch estimates inside the bands
    "q137_hll_set_ops" ->
      ("SELECT count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) " +
        "AS ua, " +
        "count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) " +
        "AS ub, " +
        "count(DISTINCT CASE WHEN event_type IN ('view', 'purchase') " +
        "THEN user_id END) AS uu, " +
        "count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) " +
        "+ count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) " +
        "- count(DISTINCT CASE WHEN event_type IN ('view', 'purchase') " +
        "THEN user_id END) AS ui, " +
        "TRUE AS est_ok_a, TRUE AS est_ok_b, TRUE AS est_ok_u, " +
        "TRUE AS est_ok_i FROM events"),
    "q138_analyze_stats" -> {
      val specs = Seq( // (name, duckdb value expression)
        "event_id" -> "event_id",
        "user_id" -> "user_id",
        "event_type" -> "event_type",
        "ts" -> "epoch_ns(ts)",
        "vm" -> "CAST(floor(value * 1000000) AS BIGINT)",
        "props" -> "props")
      "SELECT * FROM (" + specs.map { case (n, e) =>
        s"SELECT '$n' AS col_name, count(*) AS n, " +
          s"CAST(sum(CASE WHEN $e IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
          s"AS n_null, count(DISTINCT $e) AS ndv, " +
          s"CAST(min($e) AS VARCHAR) AS min_s, " +
          s"CAST(max($e) AS VARCHAR) AS max_s FROM events"
      }.mkString(" UNION ALL ") + ") ORDER BY col_name"
    },

    // same full type × cohort grid (zero cells included), same
    // per-cell floored-micro χ² terms in HUGEINT
    "q337_chisq_cramers" ->
      ("WITH cell AS (SELECT event_type AS t, user_id % 4 AS b, " +
        "COUNT(*) AS o FROM events GROUP BY 1, 2), " +
        "r AS (SELECT t, SUM(o) AS r FROM cell GROUP BY 1), " +
        "c AS (SELECT b, SUM(o) AS c FROM cell GROUP BY 1), " +
        "tot AS (SELECT SUM(o) AS n FROM cell), " +
        "grid AS (SELECT r.t, c.b, r.r, c.c, n, COALESCE(cell.o, 0) AS o " +
        "FROM r CROSS JOIN c CROSS JOIN tot " +
        "LEFT JOIN cell ON cell.t = r.t AND cell.b = c.b), " +
        "terms AS (SELECT t, b, n, " +
        "(o::HUGEINT * n - r::HUGEINT * c) AS dlt, r, c FROM grid), " +
        "f AS (SELECT MAX(n) AS nn, COUNT(DISTINCT t) AS nt, " +
        "COUNT(DISTINCT b) AS nb, " +
        "SUM(dlt * dlt * 1000000 // (n::HUGEINT * r * c)) AS chi2 " +
        "FROM terms) " +
        "SELECT CAST(nn AS BIGINT) AS n, " +
        "CAST((nt - 1) * (nb - 1) AS BIGINT) AS dof, " +
        "CAST(chi2 AS BIGINT) AS chi2_micro, " +
        "CAST(chi2 // (nn * (LEAST(nt, nb) - 1)) AS BIGINT) AS v2_micro " +
        "FROM f"),

    // same ten bins and floored per-bin rates as q237, then the
    // weighted |gap| fold
    "q338_ece_calibration" ->
      ("WITH b AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents, " +
        "CASE WHEN event_type = 'purchase' THEN 1000000 ELSE 0 END AS ym " +
        "FROM events WHERE event_type IN ('purchase', 'click')), " +
        "p AS (SELECT ym, LEAST(GREATEST(" +
        "(cents - 25000) * 1000000 // 20000 // 4 + 500000, 0), 1000000" +
        ") AS p_micro FROM b), " +
        "g AS (SELECT LEAST(p_micro // 100000, 9) AS bin, " +
        "COUNT(*) AS nb, SUM(p_micro) // COUNT(*) AS mp, " +
        "SUM(ym) // COUNT(*) AS pr FROM p GROUP BY 1) " +
        "SELECT CAST(SUM(nb) AS BIGINT) AS n, " +
        "CAST(SUM(nb * abs(pr - mp)) // SUM(nb) AS BIGINT) AS ece_micro, " +
        "CAST(MAX(abs(pr - mp)) AS BIGINT) AS mce_micro FROM g"),

    // same md5 raters and categories, same integer κ rational with
    // the sign-aware truncating division
    "q339_fleiss_kappa" ->
      ("WITH ratings AS (SELECT doc_id, lang, r, " +
        "('0x' || substr(md5('fk:' || r || ':' || doc_id), 1, 4))::BIGINT " +
        "% 4 AS cat FROM documents " +
        "CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS r)), " +
        "pd AS (SELECT lang, doc_id, cat, COUNT(*) AS nij " +
        "FROM ratings GROUP BY 1, 2, 3), " +
        "al AS (SELECT lang, COUNT(DISTINCT doc_id) AS n_items, " +
        "SUM(nij * nij) - COUNT(DISTINCT doc_id) * 3 AS a FROM pd " +
        "GROUP BY 1), " +
        "bl AS (SELECT lang, SUM(cj::HUGEINT * cj) AS b FROM " +
        "(SELECT lang, cat, SUM(nij) AS cj FROM pd GROUP BY 1, 2) " +
        "GROUP BY 1), " +
        "k AS (SELECT al.lang, n_items, " +
        "a::HUGEINT * ((n_items * 3)::HUGEINT * (n_items * 3)) " +
        "- b * ((n_items * 3)::HUGEINT * 2) AS num, " +
        "((n_items * 3)::HUGEINT * 2) * " +
        "((n_items * 3)::HUGEINT * (n_items * 3) - b) AS den " +
        "FROM al JOIN bl ON bl.lang = al.lang) " +
        "SELECT lang, CAST(n_items AS BIGINT) AS n_items, " +
        "CAST(CASE WHEN den = 0 THEN 1000000 " +
        "WHEN num >= 0 THEN (num * 1000000) // den " +
        "ELSE -((-num * 1000000) // den) END AS BIGINT) AS kappa_micro " +
        "FROM k ORDER BY lang"),

    // same exact sums-of-squares identities, same floored cents²
    // units and ssb clamp
    "q340_anova_f" ->
      ("WITH g AS (SELECT event_type AS g, " +
        "CAST(round(value * 100) AS BIGINT) AS x FROM events), " +
        "per AS (SELECT g, COUNT(*) AS ng, SUM(x) AS sg, " +
        "SUM(x::HUGEINT * x) AS qg FROM g GROUP BY 1), " +
        "leg AS (SELECT ng, sg, qg, " +
        "(qg * ng - sg::HUGEINT * sg) // ng AS sswg FROM per), " +
        "f AS (SELECT SUM(ng) AS n, COUNT(*) AS k, SUM(sg) AS st, " +
        "SUM(qg) AS qt, SUM(sswg) AS ssw FROM leg), " +
        "t AS (SELECT n, k, ssw, " +
        "(qt * n - st::HUGEINT * st) // n AS sst FROM f), " +
        "u AS (SELECT n, k, CAST(ssw AS BIGINT) AS ssw_c2, " +
        "CAST(GREATEST(sst - ssw, 0) AS BIGINT) AS ssb_c2 FROM t) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k, " +
        "ssw_c2, ssb_c2, " +
        "CAST(ssb_c2::HUGEINT * (n - k) * 1000000 " +
        "// (GREATEST(ssw_c2, 1)::HUGEINT * (k - 1)) AS BIGINT) " +
        "AS f_micro FROM u"),

    // same pinned day-19738 pivot, same four floored micro-cent means
    "q341_diff_in_diff" ->
      ("WITH b AS (SELECT event_type, " +
        "CASE WHEN epoch_ns(ts) // 86400000000000 >= 19738 " +
        "THEN 1 ELSE 0 END AS post, user_id % 2 AS treat, " +
        "CAST(round(value * 100) AS BIGINT) AS cents FROM events), " +
        "cellm AS (SELECT event_type, post, treat, " +
        "SUM(cents) * 1000000 // COUNT(*) AS m FROM b GROUP BY 1, 2, 3) " +
        "SELECT event_type, " +
        "CAST(MAX(CASE WHEN post = 0 AND treat = 0 THEN m END) AS BIGINT) " +
        "AS m_pre_ctl, " +
        "CAST(MAX(CASE WHEN post = 1 AND treat = 0 THEN m END) AS BIGINT) " +
        "AS m_post_ctl, " +
        "CAST(MAX(CASE WHEN post = 0 AND treat = 1 THEN m END) AS BIGINT) " +
        "AS m_pre_trt, " +
        "CAST(MAX(CASE WHEN post = 1 AND treat = 1 THEN m END) AS BIGINT) " +
        "AS m_post_trt, " +
        "CAST((MAX(CASE WHEN post = 1 AND treat = 1 THEN m END) " +
        "- MAX(CASE WHEN post = 0 AND treat = 1 THEN m END)) " +
        "- (MAX(CASE WHEN post = 1 AND treat = 0 THEN m END) " +
        "- MAX(CASE WHEN post = 0 AND treat = 0 THEN m END)) AS BIGINT) " +
        "AS did_micro " +
        "FROM cellm GROUP BY event_type ORDER BY event_type"),

    // same three candidate FDs, same g₃ = Σ (n_g − max-RHS-count)
    "q344_fd_audit" -> {
      def fd(table: String, lhs: String, rhs: String, name: String) =
        s"SELECT '$name' AS fd, COUNT(*) AS n_groups, " +
          "CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS viol_groups, CAST(SUM(tot - mx) AS BIGINT) AS g3_rows " +
          s"FROM (SELECT l, SUM(c) AS tot, MAX(c) AS mx, COUNT(*) AS ndv " +
          s"FROM (SELECT $lhs AS l, CAST($rhs AS VARCHAR) AS rv, " +
          s"COUNT(*) AS c FROM $table GROUP BY 1, 2) GROUP BY l)"
      "SELECT * FROM (" +
        fd("documents", "source", "lang", "documents:source->lang") +
        " UNION ALL " +
        fd("orders", "o_custkey", "o_orderstatus",
          "orders:o_custkey->o_orderstatus") +
        " UNION ALL " +
        fd("lineitem", "l_orderkey", "l_returnflag",
          "lineitem:l_orderkey->l_returnflag") +
        ") ORDER BY fd"
    },

    // same day-19738 pivot, same discordant-cell χ² with the b+c = 0
    // guard
    "q345_mcnemar" ->
      ("WITH u AS (SELECT user_id, " +
        "MAX(CASE WHEN epoch_ns(ts) // 86400000000000 < 19738 " +
        "AND event_type = 'purchase' THEN 1 ELSE 0 END) AS pre, " +
        "MAX(CASE WHEN epoch_ns(ts) // 86400000000000 >= 19738 " +
        "AND event_type = 'purchase' THEN 1 ELSE 0 END) AS pst " +
        "FROM events GROUP BY 1), " +
        "f AS (SELECT COUNT(*) AS n_users, " +
        "SUM(CASE WHEN pre = 1 AND pst = 1 THEN 1 ELSE 0 END) AS n_both, " +
        "SUM(CASE WHEN pre = 1 AND pst = 0 THEN 1 ELSE 0 END) " +
        "AS b_pre_only, " +
        "SUM(CASE WHEN pre = 0 AND pst = 1 THEN 1 ELSE 0 END) " +
        "AS c_post_only FROM u) " +
        "SELECT CAST(n_users AS BIGINT) AS n_users, " +
        "CAST(n_both AS BIGINT) AS n_both, " +
        "CAST(b_pre_only AS BIGINT) AS b_pre_only, " +
        "CAST(c_post_only AS BIGINT) AS c_post_only, " +
        "CAST((b_pre_only - c_post_only)::HUGEINT " +
        "* (b_pre_only - c_post_only) * 1000000 " +
        "// GREATEST(b_pre_only + c_post_only, 1) AS BIGINT) " +
        "AS mcnemar_micro FROM f"),

    // same (ts, event_id) per-user order, same gap-1..3 leads and
    // distinct-user support
    "q346_seq2_mining" ->
      ("WITH e AS (SELECT user_id, event_type AS a, " +
        "lead(event_type, 1) OVER w AS n1, " +
        "lead(event_type, 2) OVER w AS n2, " +
        "lead(event_type, 3) OVER w AS n3 FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
        "p AS (SELECT DISTINCT user_id, a, b FROM (" +
        "SELECT user_id, a, n1 AS b FROM e WHERE n1 IS NOT NULL " +
        "UNION ALL SELECT user_id, a, n2 FROM e WHERE n2 IS NOT NULL " +
        "UNION ALL SELECT user_id, a, n3 FROM e WHERE n3 IS NOT NULL)) " +
        "SELECT a, b, COUNT(*) AS support FROM p " +
        "GROUP BY 1, 2 ORDER BY a, b"),

    // same per-stratum floored micro terms, same −1 degenerate guard
    "q350_mantel_haenszel" ->
      ("WITH s AS (SELECT event_type, " +
        "SUM(CASE WHEN user_id % 2 = 1 AND value >= 100.0 THEN 1 " +
        "ELSE 0 END) AS a, " +
        "SUM(CASE WHEN user_id % 2 = 1 AND value < 100.0 THEN 1 " +
        "ELSE 0 END) AS b, " +
        "SUM(CASE WHEN user_id % 2 = 0 AND value >= 100.0 THEN 1 " +
        "ELSE 0 END) AS c, " +
        "SUM(CASE WHEN user_id % 2 = 0 AND value < 100.0 THEN 1 " +
        "ELSE 0 END) AS dd, COUNT(*) AS n FROM events GROUP BY 1), " +
        "t AS (SELECT a::HUGEINT * dd * 1000000 // n AS tn, " +
        "b::HUGEINT * c * 1000000 // n AS td FROM s), " +
        "f AS (SELECT COUNT(*) AS n_strata, SUM(tn) AS num, " +
        "SUM(td) AS den FROM t) " +
        "SELECT CAST(n_strata AS BIGINT) AS n_strata, " +
        "CAST(num AS BIGINT) AS num_micro, " +
        "CAST(den AS BIGINT) AS den_micro, " +
        "CAST(CASE WHEN den = 0 THEN -1 " +
        "ELSE num * 1000000 // den END AS BIGINT) AS ormh_micro FROM f"),

    // same histogram lower medians, same exact ANOVA identities on
    // z = |x − med|
    "q351_levene_bf" ->
      ("WITH e AS (SELECT event_type AS g, " +
        "CAST(round(value * 100) AS BIGINT) AS x FROM events), " +
        "h AS (SELECT g, x, COUNT(*) AS w FROM e GROUP BY 1, 2), " +
        "c AS (SELECT g, x, SUM(w) OVER (PARTITION BY g ORDER BY x " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
        "SUM(w) OVER (PARTITION BY g) AS n FROM h), " +
        "med AS (SELECT g, MIN(x) AS med FROM c WHERE cum * 2 >= n " +
        "GROUP BY 1), " +
        "z AS (SELECT e.g, abs(e.x - med.med) AS z FROM e " +
        "JOIN med ON med.g = e.g), " +
        "per AS (SELECT g, COUNT(*) AS ng, SUM(z) AS sg, " +
        "SUM(z::HUGEINT * z) AS qg FROM z GROUP BY 1), " +
        "leg AS (SELECT ng, sg, qg, " +
        "(qg * ng - sg::HUGEINT * sg) // ng AS sswg FROM per), " +
        "f AS (SELECT SUM(ng) AS n, COUNT(*) AS k, SUM(sg) AS st, " +
        "SUM(qg) AS qt, SUM(sswg) AS ssw FROM leg), " +
        "t AS (SELECT n, k, ssw, " +
        "(qt * n - st::HUGEINT * st) // n AS sst FROM f), " +
        "u AS (SELECT n, k, CAST(ssw AS BIGINT) AS ssw_c2, " +
        "CAST(GREATEST(sst - ssw, 0) AS BIGINT) AS ssb_c2 FROM t) " +
        "SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k, " +
        "ssw_c2, ssb_c2, " +
        "CAST(ssb_c2::HUGEINT * (n - k) * 1000000 " +
        "// (GREATEST(ssw_c2, 1)::HUGEINT * (k - 1)) AS BIGINT) " +
        "AS f_micro FROM u"),

    // same three pinned ten-day windows, same division-free Q
    // identity and −1 degenerate guard
    "q352_cochran_q" ->
      ("WITH u AS (SELECT user_id, " +
        "MAX(CASE WHEN LEAST((epoch_ns(ts) // 86400000000000 - 19723) " +
        "// 10, 2) = 0 AND event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS x1, " +
        "MAX(CASE WHEN LEAST((epoch_ns(ts) // 86400000000000 - 19723) " +
        "// 10, 2) = 1 AND event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS x2, " +
        "MAX(CASE WHEN LEAST((epoch_ns(ts) // 86400000000000 - 19723) " +
        "// 10, 2) = 2 AND event_type = 'purchase' THEN 1 ELSE 0 END) " +
        "AS x3 FROM events GROUP BY 1), " +
        "f AS (SELECT COUNT(*) AS n_users, SUM(x1) AS c1, " +
        "SUM(x2) AS c2, SUM(x3) AS c3, " +
        "SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS r2 FROM u) " +
        "SELECT CAST(n_users AS BIGINT) AS n_users, " +
        "CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2, " +
        "CAST(c3 AS BIGINT) AS c3, " +
        "CAST(CASE WHEN 3 * (c1 + c2 + c3) - r2 = 0 THEN -1 ELSE " +
        "2 * (3 * (c1::HUGEINT * c1 + c2::HUGEINT * c2 " +
        "+ c3::HUGEINT * c3) " +
        "- (c1 + c2 + c3)::HUGEINT * (c1 + c2 + c3)) " +
        "* 1000000 // (3 * (c1 + c2 + c3) - r2) END AS BIGINT) " +
        "AS q_micro FROM f"),

    // same zero-inclusive 10-digit grid, same floored-micro cells
    "q359_last_digit_audit" ->
      ("WITH obs AS (SELECT event_type, " +
        "CAST(round(value * 100) AS BIGINT) % 10 AS dig, COUNT(*) AS o " +
        "FROM events GROUP BY 1, 2), " +
        "tot AS (SELECT event_type, SUM(o) AS n FROM obs GROUP BY 1), " +
        "digs AS (SELECT unnest(generate_series(0, 9)) AS dig), " +
        "grid AS (SELECT tot.event_type, tot.n, " +
        "COALESCE(obs.o, 0) AS o FROM tot CROSS JOIN digs " +
        "LEFT JOIN obs ON obs.event_type = tot.event_type " +
        "AND obs.dig = digs.dig), " +
        "t AS (SELECT event_type, n, " +
        "(o::HUGEINT * 10 - n) * (o::HUGEINT * 10 - n) * 1000000 " +
        "// (n::HUGEINT * 10) AS term FROM grid) " +
        "SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, " +
        "CAST(SUM(term) AS BIGINT) AS chi2_micro, " +
        "CAST(9 AS BIGINT) AS dof " +
        "FROM t GROUP BY event_type ORDER BY event_type"),

    // same bounded cell×band grid, same common-denominator cum
    // differences in HUGEINT, same (B−1)-scaled floored micro EMD and
    // −1 sentinel
    "q363_t_closeness" ->
      ("WITH b AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, " +
        "CAST(round(value * 100) AS BIGINT) // 10000 AS band " +
        "FROM events), " +
        "cb AS (SELECT event_type, day, band, COUNT(*) AS o " +
        "FROM b GROUP BY 1, 2, 3), " +
        "gl AS (SELECT band, COUNT(*) AS gb FROM b GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(gb) AS HUGEINT) AS ng, " +
        "COUNT(*) AS nb FROM gl), " +
        "ce AS (SELECT event_type, day, COUNT(*) AS nc " +
        "FROM b GROUP BY 1, 2), " +
        "grid AS (SELECT ce.event_type, ce.day, ce.nc, gl.band, gl.gb, " +
        "COALESCE(cb.o, 0) AS o FROM ce CROSS JOIN gl " +
        "LEFT JOIN cb ON cb.event_type = ce.event_type " +
        "AND cb.day = ce.day AND cb.band = gl.band), " +
        "cum AS (SELECT event_type, day, nc, " +
        "SUM(o) OVER w AS cumc, SUM(gb) OVER w AS cumg FROM grid " +
        "WINDOW w AS (PARTITION BY event_type, day ORDER BY band " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), " +
        "pc AS (SELECT event_type, day, MAX(nc) AS nc, MAX(t.ng) AS ng, " +
        "MAX(t.nb) AS nb, " +
        "SUM(abs(cumc::HUGEINT * t.ng - cumg::HUGEINT * nc)) AS emd_num " +
        "FROM cum CROSS JOIN t GROUP BY 1, 2), " +
        "pe AS (SELECT event_type, CASE WHEN nb >= 2 THEN " +
        "CAST(emd_num * 1000000 // ((nb - 1)::HUGEINT * nc * ng) " +
        "AS BIGINT) ELSE -1 END AS emd_micro FROM pc) " +
        "SELECT event_type, COUNT(*) AS n_cells, " +
        "MAX(emd_micro) AS max_emd_micro, " +
        "CAST(SUM(CASE WHEN emd_micro > 150000 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_fail_t15 " +
        "FROM pe GROUP BY 1 ORDER BY 1"),

    // same floored-micro leave-one-out estimates, HUGEINT squares,
    // same (g−1)·(g·Σθ²−(Σθ)²)//g² variance and −1 single-day
    // sentinels
    "q364_jackknife_day" ->
      ("WITH pd AS (SELECT event_type, " +
        "epoch_ns(ts) // 86400000000000 AS day, COUNT(*) AS ni, " +
        "SUM(CASE WHEN CAST(round(value * 100) AS BIGINT) >= 5000 " +
        "THEN 1 ELSE 0 END) AS si " +
        "FROM events GROUP BY 1, 2), " +
        "tt AS (SELECT event_type, SUM(ni) AS n, SUM(si) AS st, " +
        "COUNT(*) AS g FROM pd GROUP BY 1), " +
        "loo AS (SELECT pd.event_type, " +
        "(tt.st - pd.si)::HUGEINT * 1000000 // (tt.n - pd.ni) AS theta " +
        "FROM pd JOIN tt ON tt.event_type = pd.event_type " +
        "WHERE tt.n > pd.ni), " +
        "jk AS (SELECT event_type, COUNT(*) AS gj, SUM(theta) AS sth, " +
        "SUM(theta * theta) AS sth2, MAX(theta) AS thmax, " +
        "MIN(theta) AS thmin FROM loo GROUP BY 1) " +
        "SELECT tt.event_type, CAST(tt.g AS BIGINT) AS g_days, " +
        "CAST(tt.st::HUGEINT * 1000000 // tt.n AS BIGINT) " +
        "AS theta_micro, " +
        "CAST(CASE WHEN jk.gj >= 2 THEN (jk.gj - 1) * " +
        "(jk.gj::HUGEINT * jk.sth2 - jk.sth::HUGEINT * jk.sth) " +
        "// (jk.gj::HUGEINT * jk.gj) ELSE -1 END AS BIGINT) " +
        "AS jk_var_micro2, " +
        "CAST(CASE WHEN jk.gj >= 2 THEN jk.thmax - jk.thmin " +
        "ELSE -1 END AS BIGINT) AS jk_spread_micro " +
        "FROM tt LEFT JOIN jk ON jk.event_type = tt.event_type " +
        "ORDER BY tt.event_type"),

    // the identical three unrolled raking rounds: same once-computed
    // integer targets, same HUGEINT products, same floors
    "q365_ipf_raking" ->
      ("WITH g0 AS (SELECT event_type, " +
        "(epoch_ns(ts) // 86400000000000) % 7 AS dow, COUNT(*) AS n " +
        "FROM events GROUP BY 1, 2), " +
        "t AS (SELECT CAST(SUM(n) AS HUGEINT) AS ntot, " +
        "COUNT(DISTINCT event_type) AS nr, " +
        "COUNT(DISTINCT dow) AS nc FROM g0), " +
        "w0 AS (SELECT event_type, dow, n, " +
        "CAST(1000000 AS HUGEINT) AS w FROM g0), " +
        "m1 AS (SELECT event_type, SUM(n::HUGEINT * w) AS marg " +
        "FROM w0 GROUP BY 1), " +
        "w1 AS (SELECT w0.event_type, dow, n, " +
        "w * (t.ntot * 1000000 // t.nr) // m1.marg AS w " +
        "FROM w0 JOIN m1 ON m1.event_type = w0.event_type " +
        "CROSS JOIN t), " +
        "m2 AS (SELECT dow, SUM(n::HUGEINT * w) AS marg " +
        "FROM w1 GROUP BY 1), " +
        "w2 AS (SELECT event_type, w1.dow, n, " +
        "w * (t.ntot * 1000000 // t.nc) // m2.marg AS w " +
        "FROM w1 JOIN m2 ON m2.dow = w1.dow CROSS JOIN t), " +
        "m3 AS (SELECT event_type, SUM(n::HUGEINT * w) AS marg " +
        "FROM w2 GROUP BY 1), " +
        "w3 AS (SELECT w2.event_type, dow, n, " +
        "w * (t.ntot * 1000000 // t.nr) // m3.marg AS w " +
        "FROM w2 JOIN m3 ON m3.event_type = w2.event_type " +
        "CROSS JOIN t) " +
        "SELECT event_type, CAST(dow AS BIGINT) AS dow, " +
        "CAST(n AS BIGINT) AS n, CAST(w AS BIGINT) AS w_micro, " +
        "CAST(n::HUGEINT * w // 1000000 AS BIGINT) AS fitted_mass " +
        "FROM w3 ORDER BY 1, 2"))
}
