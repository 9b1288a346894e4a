package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** One-time boundary-distance audit of the micro-log gate idiom.
  *
  * Many gated queries pin logarithms as `floor(ln(x)·10⁶)` of EXACT
  * integers (IDF weights, Zipf ranks, entropy cells, degree weights,
  * log-rank products) and rely on Spark's `Math.log` and DuckDB's libm
  * agreeing on the FLOOR — which is only guaranteed when
  * `ln(x)·10⁶` sits comfortably away from an integer boundary, because
  * `Math.log` is not correctly-rounded (the JDK contract allows 1 ulp
  * of error, and a different platform's libm may err in the other
  * direction).
  *
  * This spec sweeps every integer argument x ∈ [2, 10⁷] — a superset
  * of every count/rank/degree/cents value the sf0.01/sf0.1 gates feed
  * the idiom — and asserts the distance from `ln(x)·10⁶` to its
  * nearest integer is at least 16 ulps. A 1-ulp log disagreement moves
  * the product by ≤ ~4 ulps, so 16 ulps of clearance means no
  * conforming libm can flip a floor. (Measured minimum over the sweep:
  * 43 ulps, at x = 7,376,457 — asserted with a 2.5× margin.)
  *
  * Integer-PRODUCT arguments (the `ln(a·tb)` lift forms) are exact
  * doubles up to 2⁵³ and share this profile; their observed values at
  * gate scale stay far below 10⁷ after the per-group aggregation.
  * RATIO arguments (the DSIR / interpolated-LM `ln((c+1)/(t+k))`
  * forms) divide first in double — there the gate safety rests on the
  * division being correctly rounded (IEEE 754 guarantees it) plus this
  * same log clearance on the quotient's neighborhood; the queries
  * using them bound numerators/denominators to the same ≤10⁷ domain.
  */
class MicroLogBoundarySpec extends AnyFunSuite {

  test("floor(ln(x)*1e6) sits >= 16 ulps from every floor boundary, x in [2, 1e7]") {
    var worstUlps = Double.MaxValue
    var worstX = 0L
    var x = 2L
    while (x <= 10000000L) {
      val v = math.log(x.toDouble) * 1e6
      val fl = math.floor(v)
      val frac = v - fl
      val d = math.min(frac, 1.0 - frac)
      val ulps = d / math.ulp(v)
      if (ulps < worstUlps) { worstUlps = ulps; worstX = x }
      x += 1
    }
    assert(worstUlps >= 16.0,
      s"micro-log boundary hazard: x=$worstX is ${worstUlps} ulps from " +
        "a floor boundary — a conforming libm could flip its gate value; " +
        "pin this value as a literal (the q198/q240/q256 convention)")
  }
}
