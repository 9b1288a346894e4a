package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The native jaro_winkler expression: values pinned to DuckDB's
  * builtin (the q151 oracle's reference implementation), edge rules
  * included, and the codegen path proven equal to direct evaluation.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  // expected values captured from DuckDB jaro_winkler_similarity
  private val pinned = Seq(
    ("martha", "marhta", 0.961111111), // one transposition + boost
    ("dixon", "dicksonx", 0.813333333), // length asymmetry + boost
    ("jellyfish", "smellyfish", 0.896296296), // no common prefix
    ("duane", "dwayne", 0.84),
    ("abc", "abc", 1.0),
    ("a", "a", 1.0),
    ("", "x", 0.0), // one side empty
    ("", "", 0.0), // BOTH empty -> 0, the DuckDB rule
    ("ab", "ba", 0.0) // window 0: adjacent swap of len-2 never matches
  )

  test("compute matches DuckDB's jaro_winkler_similarity on pinned cases") {
    pinned.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-9, s"jw($a, $b)")
    }
  }

  test("boost applies only above the 0.7 jaro threshold") {
    // shared 2-char prefix but low jaro: the boost must NOT apply
    val low = jw("abcdefgh", "abzzzzzz")
    assert(low <= 0.7, s"low-sim pair unexpectedly boosted: $low")
  }

  test("sql expression (codegen path) ≡ direct compute") {
    val rows = pinned.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(col("a"), col("b"), expr("jaro_winkler(a, b)").as("sim"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(2) === jw(r.getString(0), r.getString(1)),
        s"codegen drift on (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("null-safe: null input yields null") {
    val out = Seq((Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(expr("jaro_winkler(a, b)"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
