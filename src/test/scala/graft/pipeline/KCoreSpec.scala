package graft.pipeline

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KCore must agree with a sequential reference peel on ANY graph, and
  * its output must satisfy the defining properties of THE k-core:
  * minimum internal degree ≥ k, and maximality (no peeled node could
  * rejoin). The distributed formulation (synchronous rounds, edge-count
  * convergence) differs enough from the textbook one-node-at-a-time
  * peel that the equivalence deserves a property, not an example.
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Sequential reference: peel ANY node of degree < k until none. */
  private def refCore(edges: Set[(Long, Long)], k: Int): Map[Long, Int] = {
    var adj = edges.foldLeft(Map.empty[Long, Set[Long]]) {
      case (m, (a, b)) =>
        m.updated(a, m.getOrElse(a, Set.empty) + b)
          .updated(b, m.getOrElse(b, Set.empty) + a)
    }
    var done = false
    while (!done) {
      adj.find { case (_, ns) => ns.size < k } match {
        case Some((n, ns)) =>
          adj = (adj - n).map { case (m, ms) => m -> (ms - n) }
        case None => done = true
      }
    }
    adj.map { case (n, ns) => n -> ns.size }
  }

  private val genEdges: Gen[Set[(Long, Long)]] =
    Gen.listOfN(60, for {
      a <- Gen.choose(0L, 14L)
      b <- Gen.choose(0L, 14L) if a != b
    } yield (math.min(a, b), math.max(a, b))).map(_.toSet)

  test("k-core ≡ sequential reference peel on random graphs, k ∈ {2,3,4}") {
    check(Prop.forAll(genEdges, Gen.oneOf(2, 3, 4)) { (es, k) =>
      val edges = es.toSeq.toDF("lo", "hi")
      val got = KCore.core(edges, k, "lo", "hi")
        .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      val want = refCore(es, k)
      Prop(got == want) :| s"got=$got want=$want k=$k"
    })
  }

  test("core output satisfies min-degree and maximality on a known graph") {
    // K4 plus a pendant path: the 3-core is exactly the K4
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = KCore.core(es.toDF("lo", "hi"), 3, "lo", "hi")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("empty core when k exceeds every degree") {
    val es = Seq((1L, 2L), (2L, 3L))
    assert(KCore.core(es.toDF("lo", "hi"), 5, "lo", "hi").count() === 0L)
  }
}
