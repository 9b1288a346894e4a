package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again!"),
    (3L, "completely different text with no overlap whatsoever here"),
    (4L, "the quick brown fox jumps over the lazy dog again and again")
  ).toDF("doc_id", "text")

  test("identical docs share full signatures; near-dups share some band") {
    val pairs = NearDup.candidatePairs(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact dup pair must always be a candidate")
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc must not collide")
  }

  test("jaccardPairs verifies candidates with exact shingle Jaccard") {
    val verified = NearDup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = verified.find(t => t._1 == 1L && t._2 == 4L)
    assert(exact.exists(_._3 == 1.0), s"exact dup must verify at 1.0: ${verified.toSeq}")
    assert(verified.forall(_._3 >= 0.8))
  }

  test("simhash: equal for identical text, differing for unrelated text") {
    val fp = corpus.select(col("doc_id"), NearDup.simhash("text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(4L))
    assert(fp(1L) !== fp(3L))
    // near-dup (one extra token) should be within small Hamming distance
    val ham = java.lang.Long.bitCount(fp(1L) ^ fp(2L))
    assert(ham <= 8, s"hamming distance of near-dup too large: $ham")
  }

  test("incremental bucket probe ≡ full pairing restricted to index × batch") {
    // q143's soundness claim: probing the index's banded buckets with
    // only the batch's bands finds exactly the verified index-batch
    // pairs that pairing the whole union would — bucket collision is
    // symmetric, so splitting the sides loses nothing
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batch = docs.select((col("doc_id") + 100000).as("doc_id"),
      when(col("doc_id") % 2 === 0, col("text"))
        .otherwise(concat(lit("fresh "), col("doc_id").cast("string"),
          lit(" standalone document content"))).as("text"))
    val probe = {
      val ib = NearDup.bands(docs, "doc_id", "text").toDF("doc_a", "band", "key")
      val bb = NearDup.bands(batch, "doc_id", "text").toDF("doc_b", "band", "key")
      bb.join(ib, Seq("band", "key")).select("doc_a", "doc_b").distinct()
        .join(docs.toDF("doc_a", "text_a"), "doc_a")
        .join(batch.toDF("doc_b", "text_b"), "doc_b")
        .where(round(expr("shingle_jaccard(text_a, text_b, 3)"), 6) >= 0.8)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val full = NearDup
      .jaccardPairs(docs.unionByName(batch), "doc_id", "text", threshold = 0.8)
      .where(col("doc_a") < 100000 && col("doc_b") >= 100000)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe === full)
    assert(probe.nonEmpty, "the planted exact dups must match their originals")
  }

  test("fused shingle_jaccard ≡ declarative array-ops jaccard") {
    val fast = NearDup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val slow = NearDup.jaccardPairsDeclarative(corpus, "doc_id", "text",
      threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fast === slow && fast.nonEmpty)
  }

  test("simhash-banded pairs find exact dups at hamming 0, skip unrelated") {
    val pairs = NearDup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 4L)).contains(0)) // exact dup: identical fp
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("native winnow_fps ≡ declarative winnowing") {
    val tricky = corpus.union(Seq(
      (40L, ""), (41L, "one two"), (42L, "a b c d e f g h i j k l m"))
      .toDF("doc_id", "text"))
    val fast = NearDup.winnowFingerprints(tricky, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val slow = NearDup.winnowFingerprintsDeclarative(tricky, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fast === slow && fast.nonEmpty)
  }

  test("winnowing: docs sharing a long token run share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (1L, s"unique prefix one $shared unique suffix one"),
      (2L, s"totally different start $shared and another ending"),
      (3L, "no overlap here at all just other words entirely")
    ).toDF("doc_id", "text")
    val fps = NearDup.winnowFingerprints(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "docs sharing a 10-token run must share a winnow fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty)
  }

  test("native word_shingles ≡ declarative shingles on edge cases") {
    import org.apache.spark.sql.functions.{col, expr}
    val tricky = corpus.union(Seq(
      (20L, ""), (21L, "   "), (22L, "one"), (23L, "two words"),
      (24L, "  Tabs\tand\nnewlines   in   HERE  ")
    ).toDF("doc_id", "text"))
    val fast = tricky.select(col("doc_id"), expr("word_shingles(text, 3)"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val slow = tricky.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text")), 3))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast === slow)
  }

  test("native simhash32 ≡ declarative expr formulation") {
    import org.apache.spark.sql.functions.col
    val tricky = corpus.union(Seq(
      (30L, ""), (31L, "one"), (32L, "  Mixed\tWS\nagain  ")
    ).toDF("doc_id", "text"))
    val fast = tricky.select(col("doc_id"), NearDup.simhash("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = tricky.select(col("doc_id"), NearDup.simhashDeclarative("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow)
  }

  test("native minhash_sig expression ≡ declarative lambda formulation") {
    val tricky = corpus.union(Seq(
      (10L, ""), (11L, "   "), (12L, "one"), (13L, "two words"),
      (14L, "  MIXED   Case\tand\nodd   whitespace  "),
      (15L, "a b c d e f g")
    ).toDF("doc_id", "text"))
    val fast = NearDup.signatures(tricky, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val slow = NearDup.signaturesDeclarative(tricky, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(fast === slow)
  }

  test("signatures are per-row expressions: no shuffle before banding") {
    val sig = NearDup.signatures(corpus, "doc_id", "text")
    val plan = sig.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signature computation must not shuffle:\n$plan")
  }
}
