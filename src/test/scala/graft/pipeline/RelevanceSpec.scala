package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RelevanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topTfidfTerm picks the rare term over the ubiquitous one") {
    // "common" appears in every doc (idf ~ 0); each doc's distinctive
    // term appears only there and must win
    val docs = Seq(
      (1L, "common alpha alpha common"),
      (2L, "common beta common beta beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val out = Relevance.topTfidfTerm(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(r => r.getLong(0) -> r.getString(1)).toSeq ===
      Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
    assert(out.forall(_.getDouble(2) > 0d))
  }

  test("topTfidfTerm breaks exact weight ties by term asc") {
    // doc 1: two singleton terms with identical tf and df -> "aa" wins
    val docs = Seq((1L, "aa bb"), (2L, "cc dd")).toDF("doc_id", "text")
    val out = Relevance.topTfidfTerm(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("aa", "cc"))
  }

  test("bm25TopK ranks the doc with more query-term mass first, " +
    "and matches a literal re-computation") {
    val docs = Seq(
      (1L, "join join join filler filler"),
      (2L, "join filler filler filler filler"),
      (3L, "filler filler filler filler filler"),
      (4L, "join hash filler filler filler")).toDF("doc_id", "text")
    val out = Relevance.bm25TopK(docs, "doc_id", "text",
      terms = Seq("join", "hash"), k = 3).collect()
    // doc 3 has no query terms: absent; doc 4 matches two terms
    val ids = out.map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 4L))
    val score = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // literal BM25 with N=4, df(join)=3, df(hash)=1, dl=5, avgdl=5
    def idf(df: Double) = math.log(1d + (4d - df + 0.5) / (df + 0.5))
    def term(tf: Double, df: Double) =
      idf(df) * (tf * (Relevance.K1 + 1d)) /
        (tf + Relevance.K1 * (1d - Relevance.B + Relevance.B * 5d / 5d))
    assert(math.abs(score(1L) - term(3d, 3d)) < 1e-6)
    assert(math.abs(score(4L) - (term(1d, 3d) + term(1d, 1d))) < 1e-6)
    assert(score(4L) > score(2L))
  }

  test("unigramNll scores rare-token documents as less likely") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common rare unique")).toDF("doc_id", "text")
    val out = Relevance.unigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._2).toSeq === Seq(4L, 4L)) // n_tok
    // doc 2 carries two singleton tokens: higher mean NLL
    assert(out(1)._3 > out(0)._3)
    // literal check on doc 1: all tokens 'common', c=6, N=8, V=3,
    // p = (6+1)/(8+3)
    val expect = math.floor(-math.log(7d / 11d) * 1e6).toLong
    assert(out(0)._3 === expect)
  }

  test("bm25TopK applies the k cut after full ranking") {
    val docs = (1L to 10L).map(i => (i, "join doc " + i)).toDF("doc_id", "text")
    val out = Relevance.bm25TopK(docs, "doc_id", "text", Seq("join"), k = 4)
    assert(out.count() === 4)
  }
}
