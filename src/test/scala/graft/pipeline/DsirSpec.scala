package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Dsir]] against a literal reimplementation of the estimator: the
  * one-pass dual-histogram + broadcast-scoring plan must reproduce,
  * feature-occurrence for feature-occurrence, the brute-force hashed
  * unigram+bigram importance weights (same md5 buckets, same add-one
  * smoothing, same floor(ln·1e6) micros). Tiny vocabularies +
  * a small bucket count force collisions, the regime where a
  * histogram or smoothing bug surfaces.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bucket(f: String, buckets: Int): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(f.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  /** Literal model over (id, isTarget, tokens). */
  private def brute(docs: Seq[(Long, Boolean, Vector[String])],
      buckets: Int): Map[Long, (Long, Long)] = {
    val feats = docs.flatMap { case (id, t, toks) =>
      val fs = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      fs.map(f => (id, t, bucket(f, buckets)))
    }
    val cr = feats.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = feats.filter(_._2).groupBy(_._3).view
      .mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val tr = feats.size.toDouble
    val tt = feats.count(_._2).toDouble
    val lrm = cr.map { case (b, c) =>
      b -> (math.floor(math.log((ct(b) + 1d) / (tt + buckets)) * 1e6).toLong
        - math.floor(math.log((c + 1d) / (tr + buckets)) * 1e6).toLong)
    }
    feats.groupBy(_._1).map { case (id, fs) =>
      id -> ((fs.size.toLong, fs.map(f => lrm(f._3)).sum))
    }
  }

  test("logWeights ≡ brute-force DSIR estimator on random corpora") {
    val genDoc = for {
      n <- Gen.choose(1, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd"))
      t <- Gen.oneOf(true, false)
    } yield (t, toks.toVector)
    val genCorpus = for {
      k <- Gen.choose(1, 6)
      ds <- Gen.listOfN(k, genDoc)
    } yield ds.zipWithIndex.map { case ((t, d), i) => (i.toLong, t, d) }
    val prop = Prop.forAll(genCorpus, Gen.oneOf(4, 16)) { (docs, buckets) =>
      val df = docs
        .map { case (id, t, toks) => (id, t, toks.mkString(" ")) }
        .toDF("doc_id", "tgt", "text")
      val got = Dsir
        .logWeights(df, "doc_id", "text", col("tgt"), buckets)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      got == brute(docs, buckets)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("select keeps the k most target-like docs, ties by id") {
    // target docs are pure "x"; two identical raw docs tie on weight
    val df = Seq(
      (1L, true, "x x x x"), (2L, true, "x x x"),
      (3L, false, "y y y y"), (4L, false, "y y y y"),
      (5L, false, "x x y")).toDF("doc_id", "tgt", "text")
    val top = Dsir.select(df, "doc_id", "text", col("tgt"),
      buckets = 64, k = 3).collect().map(_.getLong(0)).toSeq
    // the x-heavy docs outrank the y docs; 3/4 tie broken by id
    assert(top.take(3).toSet.subsetOf(Set(1L, 2L, 5L)))
    val all = Dsir.select(df, "doc_id", "text", col("tgt"),
      buckets = 64, k = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(all(3L) == all(4L), "identical docs must tie exactly")
    val order = Dsir.select(df, "doc_id", "text", col("tgt"),
      buckets = 64, k = 5).collect().map(_.getLong(0)).toSeq
    assert(order.indexOf(3L) < order.indexOf(4L), "ties break by id")
  }
}
