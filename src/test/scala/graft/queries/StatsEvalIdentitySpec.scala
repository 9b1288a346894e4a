package graft.queries

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The round-10 statistics/eval family (q337 χ²+Cramér's V, q339
  * Fleiss' κ, q340 ANOVA F, q342 log-BLEU) rests on exact integer
  * rationals with one floored division at the end. Prove on arbitrary
  * random inputs that each integer form tracks the textbook
  * double-precision statistic to within the floor residue — the
  * identity that lets a single SQL expression carry the test across
  * both engines — and that the boundary conventions (perfect
  * agreement, exact independence, equal means) hit their pinned
  * values EXACTLY.
  */
class StatsEvalIdentitySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- q337: χ² per-cell floored-micro sum vs textbook χ² ----

  private def chi2Micro(cells: Seq[Seq[Long]]): Long = {
    val r = cells.map(_.sum)
    val c = cells.transpose.map(_.sum)
    val n = r.sum
    (for {
      i <- cells.indices; j <- cells(i).indices
      if r(i) > 0 && c(j) > 0
    } yield {
      val dlt = BigInt(cells(i)(j)) * n - BigInt(r(i)) * c(j)
      (dlt * dlt * 1000000 / (BigInt(n) * r(i) * c(j))).toLong
    }).sum
  }

  test("q337 integer χ² tracks the double textbook value; exact independence → 0") {
    val genTable = Gen.listOfN(3,
      Gen.listOfN(4, Gen.choose(1L, 500L)).map(_.toSeq)).map(_.toSeq)
    check(Prop.forAll(genTable) { cells =>
      val r = cells.map(_.sum); val c = cells.transpose.map(_.sum)
      val n = r.sum.toDouble
      val ref = (for { i <- cells.indices; j <- cells(i).indices } yield {
        val e = r(i) * c(j) / n
        val d = cells(i)(j) - e
        d * d / e
      }).sum
      val got = chi2Micro(cells) / 1e6
      // each of the 12 cells floors once → residue < 12 micros
      Prop(math.abs(got - ref) < 12e-6 + ref * 1e-9) :| s"got=$got ref=$ref"
    })
    // O = r·c/N exactly ⇒ every dlt = 0 ⇒ χ² = 0 exactly
    val indep = Seq(Seq(10L, 20L, 30L), Seq(20L, 40L, 60L))
    assert(chi2Micro(indep) === 0L)
  }

  // ---- q339: Fleiss κ integer rational vs textbook doubles ----

  private def kappaMicro(items: Seq[Seq[Int]], cats: Int): Long = {
    val rr = items.head.size
    val n = items.size.toLong
    val nr = BigInt(n * rr)
    val a = BigInt(items.map(it =>
      (0 until cats).map(c => { val k = it.count(_ == c).toLong; k * k }).sum)
      .sum) - nr
    val b = (0 until cats).map { c =>
      val cj = BigInt(items.map(_.count(_ == c)).sum); cj * cj
    }.sum
    val num = a * nr * nr - b * nr * (rr - 1)
    val den = nr * (rr - 1) * (nr * nr - b)
    if (den == 0) 1000000L
    else if (num >= 0) (num * 1000000 / den).toLong
    else -((-num * 1000000 / den).toLong)
  }

  test("q339 integer κ tracks textbook Fleiss; perfect agreement → exactly 10⁶") {
    val genItems = Gen.choose(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(3, Gen.choose(0, 3)).map(_.toSeq))
        .map(_.toSeq))
    check(Prop.forAll(genItems) { items =>
      val rr = 3; val n = items.size
      val pbar = items.map { it =>
        val s = (0 to 3).map(c => { val k = it.count(_ == c); k * k }).sum
        (s - rr).toDouble / (rr * (rr - 1))
      }.sum / n
      val pe = (0 to 3).map { c =>
        val p = items.map(_.count(_ == c)).sum.toDouble / (n * rr); p * p
      }.sum
      val ref = if (pe == 1.0) 1.0 else (pbar - pe) / (1 - pe)
      val got = kappaMicro(items, 4) / 1e6
      Prop(math.abs(got - ref) < 2e-6) :| s"got=$got ref=$ref"
    })
    val agree = (0 until 20).map(i => Seq.fill(3)(i % 4))
    assert(kappaMicro(agree, 4) === 1000000L)
    val oneCat = (0 until 20).map(_ => Seq.fill(3)(2))
    assert(kappaMicro(oneCat, 4) === 1000000L) // B = D2 edge
  }

  // ---- q340: ANOVA F exact sums-of-squares vs textbook doubles ----

  private def anovaF(groups: Seq[Seq[Long]]): (Long, Long, Long) = {
    val per = groups.map(g => (g.size.toLong, g.sum,
      g.map(x => BigInt(x) * x).sum))
    val n = per.map(_._1).sum
    val k = per.size.toLong
    val ssw = per.map { case (ng, sg, qg) =>
      (qg * ng - BigInt(sg) * sg) / ng
    }.sum
    val st = per.map(_._2).sum; val qt = per.map(_._3).sum
    val sst = (qt * n - BigInt(st) * st) / n
    val ssb = (sst - ssw).max(BigInt(0))
    val f = (ssb * (n - k) * 1000000 / (ssw.max(BigInt(1)) * (k - 1))).toLong
    (ssw.toLong, ssb.toLong, f)
  }

  test("q340 integer F tracks the double textbook value on random groups") {
    val genGroups = Gen.listOfN(4,
      Gen.choose(5, 40).flatMap(m =>
        Gen.listOfN(m, Gen.choose(0L, 5000L)).map(_.toSeq))).map(_.toSeq)
    check(Prop.forAll(genGroups) { groups =>
      val n = groups.map(_.size).sum.toDouble
      val k = groups.size.toDouble
      val mean = groups.flatten.sum / n
      val ssb = groups.map(g =>
        g.size * math.pow(g.map(_.toDouble).sum / g.size - mean, 2)).sum
      val ssw = groups.map(g => {
        val m = g.map(_.toDouble).sum / g.size
        g.map(x => (x - m) * (x - m)).sum
      }).sum
      val ref = if (ssw == 0) 0.0 else (ssb / (k - 1)) / (ssw / (n - k))
      val (_, _, fMicro) = anovaF(groups)
      // sums-of-squares floor once per group (≤ 1 cent² each) — the
      // F ratio inherits a relative error ~ k/ssw, negligible here
      Prop(ssw < 1 || math.abs(fMicro / 1e6 - ref) < 0.01 * (1 + ref)) :|
        s"got=${fMicro / 1e6} ref=$ref"
    }, n = 60)
    // equal constant groups: ssw = ssb = 0 → F = 0 exactly
    assert(anovaF(Seq(Seq(7L, 7L, 7L), Seq(7L, 7L, 7L)))._3 === 0L)
  }

  // ---- q342: 2·log-BLEU micro identity on a hand-checked pair ----

  test("q342 score: candidate ≡ reference scores exactly 0; shorter candidate pays bp") {
    def ml(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    def s2x(clip1: Long, tot1: Long, clip2: Long, tot2: Long, rlen: Long)
    : Long = {
      val bp = if (tot1 >= rlen) 0L else -((rlen - tot1) * 1000000L / tot1)
      bp * 2 + (ml(clip1) - ml(tot1)) + (ml(math.max(clip2, 1L)) - ml(tot2))
    }
    // identical 6-token candidate: every clip saturates, bp = 0
    assert(s2x(6, 6, 5, 5, 6) === 0L)
    // half-length candidate with full precision: pure brevity penalty
    // 2·(1 − 6/3)·10⁶ = −2·10⁶
    assert(s2x(3, 3, 2, 2, 6) === -2000000L)
    // precision decay: ln(2/4) + ln(1/3) in micros, bp = 0
    assert(s2x(2, 4, 1, 3, 4) ===
      (ml(2) - ml(4)) + (ml(1) - ml(3)))
  }
}
