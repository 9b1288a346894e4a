package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pass-Join edit-distance join (q108's engine): exact equivalence
  * with brute force over adversarial random corpora, short-string
  * totality, and the planted-mutant guarantee.
  */
class EditDistJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** reference Levenshtein, driver-side */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def brute(strs: Seq[String], tau: Int): Set[(String, String, Long)] = {
    val u = strs.distinct
    (for {
      a <- u; b <- u if a < b
      d = lev(a, b) if d <= tau
    } yield (a, b, d.toLong)).toSet
  }

  private def viaJoin(strs: Seq[String], tau: Int): Set[(String, String, Long)] =
    EditDistJoin.pairs(strs.toDF("s"), "s", tau).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("equals brute force on a dense small-alphabet corpus (tau=2)") {
    val rnd = new Random(42)
    // 2-letter alphabet, lengths 1..10 — saturated with near pairs,
    // including many length-difference and segment-boundary cases
    val strs = Seq.fill(120)(
      (0 until (1 + rnd.nextInt(10))).map(_ => "ab" (rnd.nextInt(2))).mkString)
    assert(viaJoin(strs, 2) === brute(strs, 2))
  }

  test("equals brute force at tau=1 and tau=3") {
    val rnd = new Random(7)
    val strs = Seq.fill(90)(
      (0 until (1 + rnd.nextInt(8))).map(_ => "abc" (rnd.nextInt(3))).mkString)
    assert(viaJoin(strs, 1) === brute(strs, 1))
    assert(viaJoin(strs, 3) === brute(strs, 3))
  }

  test("short strings (below tau+1 chars) pair through the brute block") {
    val strs = Seq("a", "b", "ab", "ba", "abc", "abcd", "xyz", "")
    assert(viaJoin(strs, 2) === brute(strs, 2))
  }

  test("every planted 1-edit mutant is recovered in q108") {
    val dir = "/root/testdata/sf0.001"
    val found = PipelineQueries
      .queries("q108_passjoin_editdist")(spark, dir)
      .select("a_s", "b_s").as[(String, String)].collect().toSet
    // rebuild the fixture's (prefix, mutant) pairs and demand each
    // distinct-surviving one appears in the join output
    val p = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        substring(TextOps.norm(col("text")), 1, 30).as("s"))
    val planted = p
      .where(length(col("s")) >= col("doc_id") % 15 + 3)
      .select(col("s"),
        expr("concat(substr(s, 1, doc_id % 15 + 2), 'q', " +
          "substr(s, doc_id % 15 + 4))").as("m"))
      .where(col("s") =!= col("m"))
      .as[(String, String)].collect()
    assert(planted.nonEmpty)
    planted.foreach { case (s, m) =>
      val key = if (s < m) (s, m) else (m, s)
      assert(found.contains(key), s"planted mutant pair not found for '$s'")
    }
  }
}
