package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Misra–Gries theorem guarantees, checked under adversarial
  * partitionings: for a stream of N tokens summarized with k counters,
  * (1) every token with true count > N/(k+1) is present, and (2) every
  * present token's estimate e satisfies true − N/(k+1) ≤ e ≤ true.
  * The mergeable form (Agarwal et al. PODS'12) promises this for ANY
  * merge tree — so each case re-runs with several partition counts,
  * which changes Spark's partial-agg merge order and shapes.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def checkBounds(tokens: Seq[String], k: Int, parts: Int): Unit = {
    val n = tokens.length.toLong
    val exact = tokens.groupBy(identity).map { case (t, ts) => t -> ts.length.toLong }
    val mg = tokens.toDF("tok").repartition(parts)
      .agg(expr(s"misra_gries(tok, $k)").as("mg"))
      .select(explode(col("mg"))).as[(String, Long)]
      .collect().toMap
    assert(mg.size <= k, s"summary exceeded k=$k: ${mg.size}")
    // guarantee (1): true heavy hitters present
    exact.foreach { case (t, c) =>
      if (c * (k + 1) > n)
        assert(mg.contains(t), s"heavy hitter $t (count $c, N=$n, k=$k) " +
          s"missing at parts=$parts")
    }
    // guarantee (2): estimates within [true − N/(k+1), true]
    mg.foreach { case (t, e) =>
      val c = exact.getOrElse(t, 0L)
      assert(e <= c, s"$t overestimated: est $e > true $c at parts=$parts")
      assert((c - e) * (k + 1) <= n,
        s"$t undershot the bound: true $c, est $e, N=$n, k=$k at parts=$parts")
    }
  }

  test("bounds hold on skewed zipf-ish streams under any partitioning") {
    val rnd = new scala.util.Random(243)
    for (trial <- 0 until 5) {
      // zipf-ish: token i drawn with weight ~ 1/(i+1)
      val vocab = 40 + rnd.nextInt(60)
      val weights = (0 until vocab).map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val tokens = (0 until 3000 + rnd.nextInt(2000)).map { _ =>
        val x = rnd.nextDouble() * total
        s"t${cum.indexWhere(x <= _)}"
      }
      val k = 5 + rnd.nextInt(20)
      for (parts <- Seq(1, 3, 17)) checkBounds(tokens, k, parts)
    }
  }

  test("bounds hold when the vocabulary fits in k (exact mode)") {
    val tokens = (0 until 500).map(i => s"t${i % 7}")
    val mg = tokens.toDF("tok").repartition(5)
      .agg(expr("misra_gries(tok, 24)").as("mg"))
      .select(explode(col("mg"))).as[(String, Long)]
      .collect().toMap
    // no decrement ever fires: the summary IS the exact histogram
    val exact = tokens.groupBy(identity).map { case (t, ts) => t -> ts.length.toLong }
    assert(mg == exact)
  }

  test("adversarial rotation: k+1 equal-mass tokens force constant decrements") {
    // k counters, k+1 distinct tokens round-robin — the classic MG
    // worst case; nothing is guaranteed present (no token exceeds
    // N/(k+1)) but bounds must still hold
    val k = 8
    val tokens = (0 until 2700).map(i => s"t${i % (k + 1)}")
    for (parts <- Seq(1, 9)) checkBounds(tokens, k, parts)
  }

  test("merge across disjoint vocabularies keeps the bound") {
    // two halves with disjoint vocab stress the merge's subtract step
    val left = (0 until 1000).map(i => s"l${i % 5}")
    val right = (0 until 1000).map(i => s"r${i % 30}")
    for (parts <- Seq(2, 13)) checkBounds(left ++ right, 6, parts)
  }
}
