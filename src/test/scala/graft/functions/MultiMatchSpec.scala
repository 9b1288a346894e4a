package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Aho–Corasick correctness vs brute-force all-positions counting —
  * including the self-overlapping and nested-pattern cases the
  * replace-length SQL identity (q247's oracle) cannot express.
  */
class MultiMatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong

  private def viaSpark(texts: Seq[String], pats: Seq[String]): Seq[Map[String, Long]] = {
    val csv = pats.mkString(",")
    texts.toDF("t").repartition(3)
      .select(col("t"), expr(s"multi_match(t, '$csv')").as("mm"))
      .collect()
      .sortBy(r => texts.indexOf(r.getString(0)))
      .map(_.getMap[String, Long](1).toMap).toSeq
  }

  test("matches brute force on random binary strings with overlapping patterns") {
    val pats = Seq("aa", "aba", "ab", "b", "bbb")
    val rnd = new scala.util.Random(247)
    val texts = (0 until 60).map { i =>
      (0 until 5 + rnd.nextInt(40)).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString + i.toString
    }
    val got = viaSpark(texts, pats)
    texts.zip(got).foreach { case (t, mm) =>
      pats.foreach { p =>
        assert(mm(p) == brute(t, p), s"pattern '$p' on '$t'")
      }
    }
  }

  test("nested patterns all fire at the same end position") {
    // "abcd" ends matches for "abcd", "bcd", "cd", "d" simultaneously
    // — exercises the dictionary-suffix (output-link) closure
    val got = viaSpark(Seq("xabcdy"), Seq("abcd", "bcd", "cd", "d")).head
    assert(got == Map("abcd" -> 1L, "bcd" -> 1L, "cd" -> 1L, "d" -> 1L))
  }

  test("self-overlapping pattern counts every position") {
    val got = viaSpark(Seq("aaaa"), Seq("aa")).head
    assert(got("aa") == 3L) // positions 0, 1, 2 — replace() would say 2
  }

  test("absent patterns report zero, not null") {
    val got = viaSpark(Seq("hello world"), Seq("xyz", "world")).head
    assert(got == Map("xyz" -> 0L, "world" -> 1L))
  }

  test("one pattern prefix of another shares a trie path") {
    val got = viaSpark(Seq("ababab"), Seq("ab", "abab")).head
    assert(got == Map("ab" -> 3L, "abab" -> 2L))
  }
}
