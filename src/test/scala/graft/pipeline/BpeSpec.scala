package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merges follow hand-computed counts; greedy replace keeps boundaries; early stop") {
    // seqs: ·a·a·a·b ×3, ·a·a·b ×2, ·a·b ×1
    // r1: (a,a) = 2·3+1·2 = 8 beats (a,b) = 3+2+1 = 6 -> merge aa
    //     (·a·a·a·b replaces LEFT-TO-RIGHT non-overlapping: ·aa·a·b)
    // r2: (a,b) = 3+1 = 4 beats (aa,a) = 3, (aa,b) = 2 -> merge ab
    // r3: (aa,ab) = 3 beats (aa,b) = 2 -> merge aaab
    // r4: (aa,b) = 2 -> merge aab
    // r5: every word is one symbol -> early stop at 4 rules
    val words = Seq(("aaab", 3L), ("aab", 2L), ("ab", 1L)).toDF("w", "cnt")
    val got = Bpe.train(spark, words, "w", "cnt", steps = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, "a·a", "aa", 8L),
      (2, "a·b", "ab", 4L),
      (3, "aa·ab", "aaab", 3L),
      (4, "aa·b", "aab", 2L)))
  }

  test("count ties break lexicographically on the pair") {
    val words = Seq(("cd", 2L), ("ab", 2L)).toDF("w", "cnt")
    val got = Bpe.train(spark, words, "w", "cnt", steps = 1)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(got.toSeq == Seq(("a·b", 2L)))
  }

  test("vocabulary outside the safe alphabet fails loudly") {
    val words = Seq(("a·b", 5L)).toDF("w", "cnt")
    val e = intercept[IllegalArgumentException](
      Bpe.train(spark, words, "w", "cnt", steps = 1))
    assert(e.getMessage.contains("safe alphabet"))
  }
}
