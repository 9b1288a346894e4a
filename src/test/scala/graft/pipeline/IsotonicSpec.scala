package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** q254's load-bearing claim, proven: the minimax closed form
  * iso_i = max_{j≤i} min_{k≥i} avg(j..k) equals sequential weighted
  * pool-adjacent-violators, AND per-(j,k) truncating integer-micro
  * division commutes with the max/min (floor is monotone, so
  * min∘floor = floor∘min and max∘floor = floor∘max over finite sets)
  * — so the three-bounded-joins plan computes exactly
  * floor(10⁶ · PAV_i) with no sequential state.
  */
class IsotonicSpec extends AnyFunSuite {

  /** minimax with per-(j,k) truncating division — the q254 plan. */
  private def minimaxTrunc(pos: Array[Long], n: Array[Long]): Array[Long] = {
    val b = pos.length
    val cpos = pos.scanLeft(0L)(_ + _)
    val cn = n.scanLeft(0L)(_ + _)
    def a(j: Int, k: Int): Long =
      (cpos(k + 1) - cpos(j)) * 1000000L / (cn(k + 1) - cn(j))
    Array.tabulate(b) { i =>
      (0 to i).map(j => (i until b).map(k => a(j, k)).min).max
    }
  }

  /** Sequential weighted PAV with EXACT rational pool means
    * (BigInt cross-multiplication — no rounding inside the fit),
    * floored to micros at the end.
    */
  private def pavExact(pos: Array[Long], n: Array[Long]): Array[Long] = {
    case class Pool(var s: BigInt, var w: BigInt, var len: Int)
    val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
    for (i <- pos.indices) {
      pools += Pool(BigInt(pos(i)), BigInt(n(i)), 1)
      // merge while the last pool's mean < the previous pool's mean
      while (pools.length > 1 && {
        val a = pools(pools.length - 2); val c = pools.last
        c.s * a.w < a.s * c.w
      }) {
        val c = pools.remove(pools.length - 1)
        val a = pools.last
        a.s += c.s; a.w += c.w; a.len += c.len
      }
    }
    pools.flatMap(p =>
      Seq.fill(p.len)((p.s * 1000000 / p.w).toLong)).toArray
  }

  test("minimax with truncating division = floor(1e6 · exact PAV), randomized") {
    val rnd = new scala.util.Random(254)
    for (trial <- 0 until 500) {
      val b = 1 + rnd.nextInt(12)
      val n = Array.fill(b)(1L + rnd.nextInt(1000))
      val pos = n.map(ni => rnd.nextLong(ni + 1))
      val got = minimaxTrunc(pos, n)
      val want = pavExact(pos, n)
      assert(got.toSeq == want.toSeq,
        s"trial $trial: pos=${pos.toSeq} n=${n.toSeq} " +
          s"got=${got.toSeq} want=${want.toSeq}")
      // and the fit is monotone non-decreasing
      assert(got.zip(got.tail).forall { case (x, y) => x <= y })
    }
  }

  test("already-isotonic input is returned unchanged (up to flooring)") {
    val n = Array(10L, 10L, 10L)
    val pos = Array(1L, 5L, 9L)
    assert(minimaxTrunc(pos, n).toSeq == Seq(100000L, 500000L, 900000L))
  }

  test("fully reversed input pools to one global mean") {
    val n = Array(10L, 10L, 10L)
    val pos = Array(9L, 5L, 1L)
    val m = 15L * 1000000L / 30L
    assert(minimaxTrunc(pos, n).toSeq == Seq(m, m, m))
  }
}
