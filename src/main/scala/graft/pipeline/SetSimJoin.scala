package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prefix-filtered EXACT set-similarity joins (PPJoin family,
  * Chaudhuri et al. / Xiao et al.): the lossless, subquadratic way to
  * find all pairs of sets with Jaccard ≥ τ (symmetric) or containment
  * |A∩B|/|A| ≥ τ (directional) — the exact-recall twins of the
  * MinHash/SimHash probabilistic dedup path (q17/q19).
  *
  * Mechanics: every set is ordered by GLOBAL element frequency
  * (rarest first, element-string tiebreak); only the first
  * |x| − ceil(τ·|x|) + 1 elements — the PREFIX — generate join
  * candidates. The prefix-filter lemma guarantees a qualifying pair
  * shares a prefix element (Jaccard: prefix-to-prefix; containment:
  * probe-prefix-to-anything), so verification over the full sets
  * never misses a pair. Length bounds (τ·|B| ≤ |A| ≤ |B| for
  * Jaccard; |B| ≥ τ·|A| for containment) prune candidates before the
  * pair dedup shuffles them.
  *
  * Scale: candidate cost is Σ_{prefix elements} df(t)² — prefixes
  * hold only RARE elements, so df is small exactly where it is
  * squared; the frequent-element mass (where df² explodes) never
  * joins. The element-frequency pass and per-set ordering are
  * partial-agg groupBys; per-set sorts are bounded by set size.
  *
  * Precondition: `setCol` evaluates to the DISTINCT elements of each
  * set, non-empty (an empty array produces no explode rows and the id
  * silently drops out of the join — callers with possibly-empty sets
  * must filter or sentinel them first).
  *
  * `setCol` is a Column EXPRESSION exploded directly inside the
  * Generate, on purpose: materializing it as a named column first
  * looks equivalent, but Catalyst's infer-filters-from-generate rule
  * then rewrites `explode(sh)` with an inferred `size(sh) > 0` filter
  * that collapses through the projection — the full set-construction
  * expression (tokenize + shingle + array_distinct on every document)
  * gets re-evaluated in the Filter AND the Project, at each of its
  * FOUR appearances in the plan (both prefix sides + both verify
  * sides). Measured 3× wall-clock on q117/q121 at sf0.1. Exploding
  * the expression itself leaves no named column for the rule to
  * duplicate cheaply, and the plan evaluates the construction once
  * per appearance.
  */
object SetSimJoin {

  /** (__id, __toks ordered rarest-first, __sz) per input row. */
  private def ordered(sets: DataFrame, idCol: String, setCol: Column): DataFrame = {
    val el = sets.select(col(idCol).as("__id"), explode(setCol).as("__t"))
    val dfc = el.groupBy("__t").agg(count(lit(1)).as("__df"))
    el.join(dfc, "__t")
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("__df"), col("__t")))).as("__ord"))
      .select(col("__id"),
        expr("transform(__ord, x -> x.__t)").as("__toks"),
        size(col("__ord")).as("__sz"))
  }

  private def withPrefixLen(ord: DataFrame, tau: Double): DataFrame =
    ord.withColumn("__plen",
      expr(s"__sz - cast(ceil($tau * __sz) AS INT) + 1"))

  /** All unordered pairs (a_id < b_id) with Jaccard ≥ τ.
    *
    * Candidates carry their PPJoin positional filter (Xiao et al.,
    * WWW'08 §3.2): a shared prefix element at (1-based) positions
    * (i, j) bounds the overlap by ub = 1 + min(|A|−i, |B|−j), and
    * Jaccard ≥ τ needs overlap ≥ ⌈τ(|A|+|B|)/(1+τ)⌉. Dropping rows
    * with ub below that is LOSSLESS: for a qualifying pair the FIRST
    * common element (which the prefix lemma places inside both
    * prefixes) has no common element before it on either side, so its
    * ub ≥ the true overlap ≥ the threshold — the pair always keeps at
    * least that row. The cut lands BEFORE the distinct and the verify
    * join, which is where full token arrays shuffle — the expensive
    * stage the filter starves. (The 1e-9 slack only loosens the prune
    * at float boundaries; verification re-checks exactly.)
    * @return a_id, b_id, inter (long), jacc (double, unrounded)
    */
  def jaccardPairs(sets: DataFrame, idCol: String, setCol: Column,
      tau: Double): DataFrame = {
    val ord = materialized(withPrefixLen(ordered(sets, idCol, setCol), tau))
    val pre = ord.select(col("__id"), col("__sz"),
      posexplode(expr("slice(__toks, 1, __plen)")).as(Seq("__i", "__p")))
    val cand = pre.toDF("a_id", "a_szp", "a_i", "__p")
      .join(pre.toDF("b_id", "b_szp", "b_i", "__p"), "__p")
      .where(col("a_id") < col("b_id") &&
        col("a_szp") >= lit(tau) * col("b_szp") &&
        col("b_szp") >= lit(tau) * col("a_szp") &&
        least(col("a_szp") - col("a_i"), col("b_szp") - col("b_i")) >=
          ceil(lit(tau) * (col("a_szp") + col("b_szp")) / (1.0 + tau)
            - 1e-9))
      .select("a_id", "b_id").distinct()
    verify(cand, ord)
      .withColumn("jacc",
        col("inter") / (col("a_sz") + col("b_sz") - col("inter")))
      .where(col("jacc") >= tau)
      .select(col("a_id"), col("b_id"),
        col("inter").cast("long").as("inter"), col("jacc"))
  }

  /** All directional pairs (a_id ≠ b_id) with |A∩B|/|A| ≥ τ — A
    * subsumed by B. Prefix filter applies only on the probe side A
    * (containment needs overlap ≥ ceil(τ|A|), so a pair sharing
    * nothing in A's prefix cannot qualify); the indexed side B keeps
    * ALL elements, because a contained A may sit anywhere in B's
    * frequency order.
    * @return a_id, b_id, inter (long), containment (double, unrounded)
    */
  def containmentPairs(sets: DataFrame, idCol: String, setCol: Column,
      tau: Double): DataFrame = {
    val ord = materialized(withPrefixLen(ordered(sets, idCol, setCol), tau))
    // positional filter (the q117 WWW'08 §3.2 cut, adapted to the
    // containment threshold ceil(τ|A|)): a shared element at 0-based
    // positions (i, j) bounds the overlap by min(|A|−i, |B|−j), and a
    // QUALIFYING pair's first common element must sit inside A's
    // prefix (else every prefix element of A misses B and overlap ≤
    // |A| − plen = ceil(τ|A|) − 1), with nothing common before it on
    // either side — so its row survives the cut with ub ≥ the true
    // overlap ≥ ceil(τ|A|). Lossless, and it starves the
    // distinct/verify stages the same way it does for Jaccard: the
    // index side is un-prefix-filtered by necessity (a contained set
    // may sit anywhere in B's frequency order), which made q121's
    // candidate volume ~5× q117's — measured x16→x32 drift 1.70
    // before this cut.
    val pre = ord.select(col("__id").as("a_id"), col("__sz").as("a_szp"),
      posexplode(expr("slice(__toks, 1, __plen)")).as(Seq("a_i", "__t")))
    val idx = ord.select(col("__id").as("b_id"), col("__sz").as("b_szp"),
      posexplode(col("__toks")).as(Seq("b_i", "__t")))
    val cand = pre.join(idx, "__t")
      .where(col("a_id") =!= col("b_id") &&
        col("b_szp") >= lit(tau) * col("a_szp") &&
        least(col("a_szp") - col("a_i"), col("b_szp") - col("b_i")) >=
          ceil(lit(tau) * col("a_szp") - 1e-9))
      .select("a_id", "b_id").distinct()
    verify(cand, ord)
      .withColumn("containment", col("inter") / col("a_sz"))
      .where(col("containment") >= tau)
      .select(col("a_id"), col("b_id"),
        col("inter").cast("long").as("inter"), col("containment"))
  }

  /** The ordered-sets table appears FOUR times in each join's plan
    * (both prefix/index sides + both verify sides). Materializing it
    * once (localCheckpoint, the [[Cluster]] precedent) was MEASURED
    * SLOWER at sf0.1 (q117 5.9 s vs 4.2 s; q121 8.3 vs 6.2): with the
    * codegen'd `word_shingles` set construction the recompute is
    * scan-speed, while the checkpoint pays an eager barrier plus
    * serializing every token array through block storage. So the plan
    * recomputes — the right default whenever set construction is
    * cheap. Re-materialize (block store or scratch parquet) only if a
    * profile shows the ordered pipeline itself dominating, e.g. an
    * expensive normalizer in `setCol`.
    */
  private def materialized(ord: DataFrame): DataFrame = ord

  /** Join candidate id pairs back to full sets, exact intersection. */
  private def verify(cand: DataFrame, ord: DataFrame): DataFrame = {
    val sets = ord.select(col("__id"), col("__toks"), col("__sz"))
    cand
      .join(sets.toDF("a_id", "a_toks", "a_sz"), "a_id")
      .join(sets.toDF("b_id", "b_toks", "b_sz"), "b_id")
      .withColumn("inter", size(array_intersect(col("a_toks"), col("b_toks"))))
  }
}
