package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[MmrSelect]] against a literal reimplementation of the greedy MMR
  * rule: argmax of λ·rel − (1−λ)·max-floor-micro-cosine-to-picked,
  * ties by id ascending. Random small candidate sets with colliding
  * relevances and repeated vectors exercise the tie and
  * max-over-picked paths.
  */
class MmrSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def simMicro(a: Vector[Double], b: Vector[Double]): Long = {
    def dot(x: Vector[Double], y: Vector[Double]): Double = {
      var acc = 0d; var i = 0
      while (i < math.min(x.size, y.size)) { acc += x(i) * y(i); i += 1 }
      acc
    }
    val denom = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    val cos = if (denom == 0d) 0d else dot(a, b) / denom
    math.floor(cos * 1000000d).toLong
  }

  private def brute(cands: Seq[(Long, Long, Vector[Double])], k: Int,
      lam: Int): Seq[(Long, Long)] = {
    val picked = collection.mutable.ArrayBuffer.empty[Int]
    val out = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    while (picked.size < math.min(k, cands.size)) {
      val scored = cands.indices.filterNot(picked.contains).map { c =>
        val maxSim =
          if (picked.isEmpty) 0L
          else picked.map(p => simMicro(cands(c)._3, cands(p)._3)).max
        (c, lam * cands(c)._2 - (10 - lam) * maxSim)
      }
      val (best, score) = scored.minBy { case (c, s) => (-s, cands(c)._1) }
      picked += best
      out += ((cands(best)._1, score))
    }
    out.toSeq
  }

  test("mmr_select ≡ brute-force greedy MMR on random candidate sets") {
    val genVec = Gen.listOfN(3, Gen.choose(-2, 2).map(_.toDouble))
      .map(_.toVector)
    val genCands = for {
      n <- Gen.choose(1, 8)
      rels <- Gen.listOfN(n, Gen.choose(0L, 3L).map(_ * 250000))
      vecs <- Gen.listOfN(n, genVec)
    } yield rels.zip(vecs).zipWithIndex.map {
      case ((r, v), i) => (i.toLong, r, v)
    }
    val prop = Prop.forAll(genCands, Gen.oneOf(1, 3, 5),
      Gen.oneOf(0, 5, 7, 10)) { (cands, k, lam) =>
      val df = cands.map { case (id, r, v) => (id, r, v.toArray) }
        .toDF("id", "rel_micro", "emb")
        .agg(collect_list(struct(col("id"), col("rel_micro"),
          col("emb").cast("array<double>").as("emb"))).as("cs"))
      val got = df
        .select(posexplode(expr(s"mmr_select(cs, $k, $lam)")))
        .select(col("col.id"), col("col.score_micro"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      got == brute(cands, k, lam)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("diversification beats pure relevance on a planted near-dup") {
    // two near-identical highly relevant vectors + one distinct
    // moderately relevant: λ=0.7 must pick the distinct one second
    val cands = Seq(
      (10L, 900000L, Array(1d, 0d, 0d)),
      (11L, 890000L, Array(1d, 0.001d, 0d)),
      (12L, 600000L, Array(0d, 1d, 0d)))
    val df = cands.toDF("id", "rel_micro", "emb")
      .agg(collect_list(struct(col("id"), col("rel_micro"),
        col("emb").cast("array<double>").as("emb"))).as("cs"))
    val order = df.select(posexplode(expr("mmr_select(cs, 3, 7)")))
      .select(col("col.id")).collect().map(_.getLong(0)).toSeq
    assert(order == Seq(10L, 12L, 11L),
      s"expected diversity pick, got $order")
  }
}
