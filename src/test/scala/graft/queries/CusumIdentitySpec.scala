package graft.queries

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** q266/q281 rest on a closed form: the CUSUM recursion
  * s_t = max(0, s_{t−1} + d_t) equals
  * s_t = max(0, P_t − min(0, min_{j<t} P_j)) over the prefix sums P of
  * the drift series (equivalently P_t − min_{0≤j≤t} P_j with P_0 = 0 —
  * the outer clamp folds P_t itself into the min). That identity is
  * what lets a sequential fold become two windows — prove it on
  * arbitrary integer series, not just the fixture.
  */
class CusumIdentitySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("prefix-sum closed form ≡ sequential CUSUM recursion on any series") {
    val genSeries = Gen.listOfN(40, Gen.choose(-500L, 500L))
    check(Prop.forAll(genSeries) { ds =>
      // sequential reference: the textbook fold
      val seq = ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
      // closed form: max(0, P_t − min(0, min_{j<t} P_j)) — the outer
      // clamp folds P_t itself into the min (P_0 = 0 convention)
      val prefix = ds.scanLeft(0L)(_ + _).tail
      val closed = prefix.zipWithIndex.map { case (p, i) =>
        val prevMin = if (i == 0) 0L else math.min(0L, prefix.take(i).min)
        math.max(0L, p - prevMin)
      }
      Prop(seq == closed) :| s"seq=$seq closed=$closed"
    })
  }

  test("max excursion and first-alarm day agree with the recursion") {
    val genSeries = Gen.listOfN(30, Gen.choose(-800L, 800L))
    check(Prop.forAll(genSeries, Gen.choose(100L, 2000L)) { (ds, h) =>
      val seq = ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
      val prefix = ds.scanLeft(0L)(_ + _).tail
      val closed = prefix.zipWithIndex.map { case (p, i) =>
        val prevMin = if (i == 0) 0L else math.min(0L, prefix.take(i).min)
        math.max(0L, p - prevMin)
      }
      val sameMax = seq.max == closed.max
      val sameAlarm = seq.indexWhere(_ > h) == closed.indexWhere(_ > h)
      Prop(sameMax && sameAlarm) :| s"h=$h seq=$seq closed=$closed"
    })
  }
}
