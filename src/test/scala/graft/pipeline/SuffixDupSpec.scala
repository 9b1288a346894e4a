package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[SuffixDup]] against brute force: the prefix-doubling span finder
  * must agree with literal window-counting (enumerate every L-window,
  * keep the duplicated ones, merge islands) on hand fixtures and on
  * random corpora — small vocabularies force heavy collisions, the
  * regime where rank-table bugs (sentinel handling, truncated
  * suffixes, island merging) surface.
  */
class SuffixDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Literal model: duplicated-L-window starts → merged maximal spans. */
  private def brute(docs: Map[Long, Vector[String]],
      l: Int): Set[(Long, Long, Long)] = {
    val windows = for {
      (id, toks) <- docs.toSeq
      i <- 0 to toks.size - l
    } yield (id, i, toks.slice(i, i + l))
    val counts = windows.groupBy(_._3).view.mapValues(_.size).toMap
    val dupStarts = windows.filter(w => counts(w._3) >= 2)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    dupStarts.flatMap { case (id, starts) =>
      val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      var s = starts.head
      var e = starts.head + l
      starts.tail.foreach { p =>
        if (p <= e) e = p + l
        else { spans += ((id, s.toLong, e.toLong)); s = p; e = p + l }
      }
      spans += ((id, s.toLong, e.toLong))
      spans
    }.toSet
  }

  private def run(docs: Map[Long, Vector[String]],
      l: Int): Set[(Long, Long, Long)] = {
    val df = docs.toSeq
      .map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    SuffixDup.dupSpans(df, "doc_id", split(col("text"), " "), l)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("hand fixture: planted duplicate found, maximal, doc-local offsets") {
    // docs 1 and 2 share the 5-token run b c d e f (≥ L=4): doc 1
    // covers [1,6), doc 2 [0,5); doc 3 shares nothing long enough
    val docs = Map(
      1L -> Vector("a", "b", "c", "d", "e", "f", "g"),
      2L -> Vector("b", "c", "d", "e", "f", "x"),
      3L -> Vector("b", "c", "d", "y", "e", "f"))
    assert(run(docs, 4) === Set((1L, 1L, 6L), (2L, 0L, 5L)))
  }

  test("within-document repeat is a duplicate; short docs never crash") {
    val docs = Map(
      1L -> Vector("p", "q", "p", "q", "p", "q"), // pq pq pq: [0,6) at L=2
      2L -> Vector("z"), // shorter than L
      3L -> Vector.empty[String])
    assert(run(docs + (3L -> Vector("lone")), 2) === Set((1L, 0L, 6L)))
  }

  /** Literal cross-corpus model: train window starts whose string
    * occurs among eval windows, merged to islands. */
  private def bruteContam(docs: Map[Long, Vector[String]],
      isEval: Long => Boolean, l: Int): Set[(Long, Long, Long)] = {
    val windows = for {
      (id, toks) <- docs.toSeq
      i <- 0 to toks.size - l
    } yield (id, i, toks.slice(i, i + l))
    val evalW = windows.filter(w => isEval(w._1)).map(_._3).toSet
    val starts = windows
      .filter(w => !isEval(w._1) && evalW(w._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    starts.flatMap { case (id, ss) =>
      ss.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((d, s, e) :: rest, i) if i - (e - l) <= l =>
          (d, s, i + l.toLong) :: rest
        case (acc, i) => (id, i.toLong, i + l.toLong) :: acc
      }
    }.toSet
  }

  test("contaminationSpans ≡ brute-force eval-window semi-join") {
    val genDoc = for {
      n <- Gen.choose(0, 20)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b"))
    } yield toks.toVector
    val genCorpus = for {
      k <- Gen.choose(2, 6)
      ds <- Gen.listOfN(k, genDoc)
    } yield ds.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toMap
    val prop = Prop.forAll(genCorpus, Gen.oneOf(2, 4)) { (docs0, l) =>
      val docs = docs0.filter(_._2.nonEmpty)
      docs.isEmpty || {
        val isEval = (id: Long) => id % 2 == 0
        val df = docs.toSeq
          .map { case (id, toks) => (id, toks.mkString(" ")) }
          .toDF("doc_id", "text")
        val got = SuffixDup
          .contaminationSpans(df, "doc_id", split(col("text"), " "),
            col("doc_id") % 2 === 0, l)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        got == bruteContam(docs, isEval, l)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  /** Literal removal model: non-keeper duplicated-window positions
    * cover tokens; survivors rebuild per doc. */
  private def bruteApply(docs: Map[Long, Vector[String]],
      l: Int): Map[Long, (Long, Long, String)] = {
    val windows = for {
      (id, toks) <- docs.toSeq
      i <- 0 to toks.size - l
    } yield (id, i, toks.slice(i, i + l))
    val byW = windows.groupBy(_._3).filter(_._2.size >= 2)
    val removed = byW.values.flatMap { occ =>
      val keeper = occ.map(o => (o._1, o._2)).min
      occ.map(o => (o._1, o._2)).filterNot(_ == keeper)
        .flatMap { case (id, p) => (p until p + l).map(id -> _) }
    }.toSet
    docs.map { case (id, toks) =>
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !removed(id -> i) => t
      }
      id -> ((toks.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }
  }

  test("applyDedup ≡ brute-force keeper removal on random corpora") {
    val genDoc = for {
      n <- Gen.choose(0, 20)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b"))
    } yield toks.toVector
    val genCorpus = for {
      k <- Gen.choose(1, 5)
      ds <- Gen.listOfN(k, genDoc)
    } yield ds.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toMap
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val prop = Prop.forAll(genCorpus, Gen.oneOf(2, 4)) { (docs0, l) =>
      val docs = docs0.filter(_._2.nonEmpty)
      docs.isEmpty || {
        val df = docs.toSeq
          .map { case (id, toks) => (id, toks.mkString(" ")) }
          .toDF("doc_id", "text")
        val got = SuffixDup
          .applyDedup(df, "doc_id", split(col("text"), " "), l)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
            r.getString(3)))).toMap
        val want = bruteApply(docs, l).map { case (id, (n, k, txt)) =>
          id -> ((n, k, hex(txt)))
        }
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("prefix doubling ≡ brute-force window counting on random corpora") {
    val genDoc = for {
      n <- Gen.choose(0, 24)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield toks.toVector
    val genCorpus = for {
      k <- Gen.choose(1, 6)
      ds <- Gen.listOfN(k, genDoc)
    } yield ds.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toMap
    val prop = Prop.forAll(genCorpus, Gen.oneOf(2, 4, 8)) { (docs, l) =>
      val nonEmpty = docs.filter(_._2.nonEmpty) // split("") yields [""]
      nonEmpty.isEmpty || run(nonEmpty, l) == brute(nonEmpty, l)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
