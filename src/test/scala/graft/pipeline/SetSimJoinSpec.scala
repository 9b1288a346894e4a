package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.functions.col

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Prefix-filtered set-similarity joins (q117/q121's engine): exact
  * equivalence with brute force over adversarial random set corpora —
  * the losslessness of the prefix filter and both length bounds is
  * PROVEN against every pair, not argued (the EditDistJoinSpec
  * pattern for the set-similarity family).
  */
class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Random corpora over a small alphabet — small universes saturate
    * both filters' boundary cases: many size-equal sets (length
    * bounds at exact equality), many shared rare elements (prefix
    * hits), and duplicate sets (similarity exactly 1).
    */
  private def corpus(seed: Int, n: Int, univ: Int): Seq[(Long, Seq[String])] = {
    val rnd = new Random(seed)
    (1 to n).map { id =>
      val sz = 1 + rnd.nextInt(8)
      val els = Seq.fill(sz)(s"e${rnd.nextInt(univ)}").distinct
      (id.toLong, els)
    }
  }

  private def bruteJacc(c: Seq[(Long, Seq[String])], tau: Double) =
    (for {
      (ia, sa) <- c; (ib, sb) <- c if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= tau
    } yield (ia, ib, inter.toLong)).toSet

  private def bruteCont(c: Seq[(Long, Seq[String])], tau: Double) =
    (for {
      (ia, sa) <- c; (ib, sb) <- c if ia != ib
      inter = sa.toSet.intersect(sb.toSet).size
      cr = inter.toDouble / sa.size if cr >= tau
    } yield (ia, ib, inter.toLong)).toSet

  test("jaccardPairs equals brute force across taus and densities") {
    for {
      (seed, univ) <- Seq((1, 6), (2, 12), (3, 25))
      tau <- Seq(0.5, 0.7, 0.9)
    } {
      val c = corpus(seed, n = 60, univ = univ)
      val df = c.toDF("id", "els")
      val got = SetSimJoin.jaccardPairs(df, "id", col("els"), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === bruteJacc(c, tau),
        s"jaccard mismatch at seed=$seed univ=$univ tau=$tau")
    }
  }

  test("containmentPairs equals brute force across taus and densities") {
    for {
      (seed, univ) <- Seq((4, 6), (5, 12), (6, 25))
      tau <- Seq(0.5, 0.8, 1.0)
    } {
      val c = corpus(seed, n = 60, univ = univ)
      val df = c.toDF("id", "els")
      val got = SetSimJoin.containmentPairs(df, "id", col("els"), tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === bruteCont(c, tau),
        s"containment mismatch at seed=$seed univ=$univ tau=$tau")
    }
  }

  test("identical sets are found at tau = 1 in both directions") {
    val c = Seq((1L, Seq("a", "b", "c")), (2L, Seq("c", "b", "a")),
      (3L, Seq("a", "b")))
    val df = c.toDF("id", "els")
    val j = SetSimJoin.jaccardPairs(df, "id", col("els"), 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(j === Set((1L, 2L)))
    val ct = SetSimJoin.containmentPairs(df, "id", col("els"), 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 3 ⊂ 1 and 3 ⊂ 2 as well: containment is directional
    assert(ct === Set((1L, 2L), (2L, 1L), (3L, 1L), (3L, 2L)))
  }
}
