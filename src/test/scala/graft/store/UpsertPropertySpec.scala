package graft.store

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property: replaying ANY changelog (sequence of upsert/delete ops)
  * through UpsertTable.merge in ANY micro-batch split yields exactly
  * the state of a sequentially-applied key->value map — the defining
  * property of the reference's upsert materialization (SURVEY.md §2.3
  * C1/C2: changelog-normalize + CDC apply).
  */
class UpsertPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class Op(key: Int, value: String, op: String)

  private val genOps: Gen[List[Op]] = Gen.listOfN(40, for {
    k <- Gen.choose(0, 7)
    v <- Gen.alphaStr.map(_.take(6))
    op <- Gen.frequency(4 -> Gen.const("u"), 1 -> Gen.const("d"), 1 -> Gen.const("c"))
  } yield Op(k, v, op))

  private val genSplit: Gen[List[Int]] =
    Gen.listOfN(3, Gen.choose(1, 39)).map(_.distinct.sorted)

  test("merge ≡ sequential map apply, for any ops and any batch split") {
    val prop = Prop.forAll(genOps, genSplit) { (ops, split) =>
      val expected = ops.foldLeft(Map.empty[Int, String]) {
        case (m, Op(k, v, o)) => if (o == "d") m - k else m + (k -> v)
      }
      val t = UpsertTable(spark, Files.createTempDirectory("graft-prop").toString)
      val bounds = (0 :: split).distinct.sorted :+ ops.length
      bounds.sliding(2).filter(w => w(1) > w(0)).foreach { w =>
        val slice = ops.slice(w(0), w(1)).zipWithIndex
          .map { case (o, i) => (o.key, o.value, o.op, (w(0) + i).toLong) }
        t.merge(slice.toDF("key", "value", "op", "off"),
          opCol = Some("op"), orderCol = Some("off"),
          autoCreateKeys = Seq("key"))
      }
      val got = t.read().collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
