package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[QuotaSample.bottomKByHash]] against the naive window lowering:
  * the histogram prune must select EXACTLY `row_number() OVER
  * (PARTITION BY group ORDER BY md5(id), id) <= k(group)` — including
  * groups whose k exceeds their size (keep all), k = 0 (keep none),
  * and boundary buckets holding several rows (small corpora force
  * every group into few prefix buckets, the worst case for the
  * boundary arithmetic).
  */
class QuotaSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def h(id: Long): String = MessageDigest.getInstance("MD5")
    .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("histogram prune ≡ naive window selection on random corpora") {
    val genGroup = for {
      n <- Gen.choose(0, 30)
      k <- Gen.choose(0, 35)
    } yield (n, k.toLong)
    val genCorpus = for {
      g <- Gen.choose(1, 4)
      specs <- Gen.listOfN(g, genGroup)
    } yield specs.zipWithIndex.map { case ((n, k), i) => (s"g$i", n, k) }
    val prop = Prop.forAll(genCorpus) { specs =>
      val rows = for {
        (g, n, _) <- specs
        i <- 0 until n
      } yield (g, (g.hashCode.toLong.abs % 97) * 1000 + i)
      rows.isEmpty || {
        val df = rows.toDF("grp", "id")
        val ks = specs.map { case (g, _, k) => (g, k) }.toDF("grp", "__k")
        val got = QuotaSample.bottomKByHash(df, "grp", "id", ks)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        val want = specs.flatMap { case (g, n, k) =>
          rows.filter(_._1 == g).sortBy(r => (h(r._2), r._2))
            .take(math.min(k, n.toLong).toInt)
        }.toSet
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("two-level hash rank ≡ naive per-group row_number") {
    val genCorpus = for {
      g <- Gen.choose(1, 3)
      ns <- Gen.listOfN(g, Gen.choose(1, 40))
    } yield ns.zipWithIndex.flatMap { case (n, i) =>
      (0 until n).map(j => (s"g$i", (i * 1000 + j).toLong))
    }
    val prop = Prop.forAll(genCorpus) { rows =>
      val df = rows.toDF("grp", "id")
      val got = QuotaSample.rankByHash(df, "grp", "id")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map(_._2).sortBy(id => (h(id), id)).zipWithIndex
          .map { case (id, i) => (g, id) -> (i + 1).toLong }
      }
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
