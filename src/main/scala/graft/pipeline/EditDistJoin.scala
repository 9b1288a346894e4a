package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity join under EDIT DISTANCE via Pass-Join segment blocking
  * (Li/Deng/Feng, "PASS-JOIN: a partition-based method for similarity
  * joins", PVLDB 2011 — public algorithm, re-derived here for Spark):
  * all unordered pairs of distinct strings within Levenshtein
  * threshold τ, WITHOUT any all-pairs product and without relying on
  * pre-existing catalog blocks (contrast q106, whose brand/type/size
  * blocking is quadratic within a block).
  *
  * Pigeonhole: partition the shorter string b of a pair into τ+1
  * contiguous segments; at most τ edits can destroy at most τ of
  * them, so if dist(a,b) ≤ τ then a contains at least one segment of
  * b VERBATIM, within ±τ of its home position. So:
  *
  *  - index side: each string emits its own τ+1 segments, keyed by
  *    (own length, segment idx, segment text) — τ+1 rows per string;
  *  - probe side: each string a emits, for every candidate shorter
  *    length lb ∈ [len(a)−τ, len(a)] and segment idx, the substrings
  *    of a at the segment's home position ±τ — ≤ (τ+1)²(2τ+1) short
  *    keys per string, all scan-side (sequence/transform/filter, one
  *    explode);
  *  - equi-join on the key, then the threshold form levenshtein(a,b,τ)
  *    verifies the O(n·τ)-candidate superset exactly.
  *
  * Everything is linear in corpus size: keys per string are a constant
  * (45 at τ=2), the exchange carries ≤ ~⌈len/(τ+1)⌉-char segment keys,
  * and candidates stay near-linear as long as segments are selective
  * (measured in SCALE_CURVE.md via q108). Strings shorter than τ+1
  * can't form τ+1 non-empty segments; pairs involving them are closed
  * by a broadcast brute block over the (alphabet-bounded, tiny)
  * strings of length ≤ 2τ — any partner of a ≤τ-length string is ≤ 2τ
  * long, so that block is complete for them.
  */
object EditDistJoin {

  /** All unordered pairs of DISTINCT values of `strCol` within edit
    * distance `tau` (1 ≤ tau ≤ 4): columns (a_s, b_s, dist) with
    * a_s < b_s, dist ∈ [0? — no: distinct input ⇒ dist ≥ 1] .. tau.
    */
  def pairs(strs: DataFrame, strCol: String, tau: Int): DataFrame = {
    require(tau >= 1 && tau <= 4, s"tau out of range: $tau")
    val d = tau + 1 // number of segments
    val s = strs.select(col(strCol).as("s")).where(col("s").isNotNull)
      .distinct()

    // segment geometry for a length-l string: first (l % d) segments
    // are one char longer — any fixed convention works as long as
    // index and probe agree
    def segLen(l: String, i: String) =
      s"(($l) div $d + (CASE WHEN ($i) < ($l) % $d THEN 1 ELSE 0 END))"
    def segStart(l: String, i: String) =
      s"(($i) * (($l) div $d) + least($i, ($l) % $d))"

    val idxKeys =
      s"transform(sequence(0, $tau), i -> named_struct(" +
        s"'kl', length(s), 'ki', i, " +
        s"'kseg', substring(s, ${segStart("length(s)", "i")} + 1, " +
        s"${segLen("length(s)", "i")})))"

    // probe: home position ±tau, clipped to valid substring starts via
    // filter (sequence(-tau, tau) is always ascending — no empty-range
    // sequence pitfall)
    val prbKeys =
      s"flatten(flatten(" +
        s"transform(sequence(greatest($d, length(s) - $tau), length(s)), lb -> " +
        s"transform(sequence(0, $tau), i -> " +
        s"transform(filter(transform(sequence(-$tau, $tau), dq -> " +
        s"${segStart("lb", "i")} + dq), q -> " +
        s"q >= 0 AND q <= length(s) - ${segLen("lb", "i")}), q -> " +
        s"named_struct('kl', lb, 'ki', i, " +
        s"'kseg', substring(s, q + 1, ${segLen("lb", "i")})))))))"

    val long = s.where(length(col("s")) >= d)
    val idx = long
      .select(col("s").as("b"), explode(expr(idxKeys)).as("k"))
      .select(col("b"), col("k.kl").as("kl"), col("k.ki").as("ki"),
        col("k.kseg").as("kseg"))
    val prb = long
      .select(col("s").as("a"), explode(expr(prbKeys)).as("k"))
      .select(col("a"), col("k.kl").as("kl"), col("k.ki").as("ki"),
        col("k.kseg").as("kseg"))
    val main = prb.join(idx, Seq("kl", "ki", "kseg"))
      .select(col("a"), col("b"))

    // pairs whose shorter member is < d chars: the partner is ≤ 2·tau
    // chars, so a brute block over the ≤2τ-length strings (bounded by
    // |alphabet|^{2τ}, i.e. tiny and data-independent) closes them
    val shorts = s.where(length(col("s")) <= 2 * tau)
    val shortPairs = shorts.toDF("a")
      .join(broadcast(shorts.toDF("b")),
        abs(length(col("a")) - length(col("b"))) <= tau)
      .where(length(col("a")) < lit(d) || length(col("b")) < lit(d))
      .select(col("a"), col("b"))

    main.unionByName(shortPairs)
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a_s"),
        greatest(col("a"), col("b")).as("b_s"))
      .distinct() // dedup candidates BEFORE the verify DP
      .withColumn("dist",
        levenshtein(col("a_s"), col("b_s"), tau).cast("long"))
      .where(col("dist") >= 0)
  }
}
