package graft.cdc

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.UpsertTable

/** Property: ANY sequence of Debezium envelopes (random ops, keys,
  * payload values, any micro-batch split), pushed through the
  * serialized-JSON entry point, materializes exactly the state of a
  * sequentially-applied key→value map — extending the golden test to
  * the whole input space, including the parse/flatten/route layer.
  */
class CdcPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class Ev(key: Int, email: String, op: String)

  private val genEvs: Gen[List[Ev]] = Gen.listOfN(30, for {
    k <- Gen.choose(1, 6)
    v <- Gen.identifier.map(_.take(8))
    op <- Gen.frequency(3 -> "c", 3 -> "u", 2 -> "d", 1 -> "r")
  } yield Ev(k, v, op))

  private val genSplit: Gen[List[Int]] =
    Gen.listOfN(2, Gen.choose(1, 29)).map(_.distinct.sorted)

  private def envelope(e: Ev, lsn: Long): String = {
    val row = s"""{"user_id":${e.key},"email":"${e.email}"}"""
    val (before, after) =
      if (e.op == "d") (row, "null")
      else if (e.op == "u") (row, row)
      else ("null", row)
    s"""{"before":$before,"after":$after,""" +
      s""""source":{"version":"t","connector":"postgresql","name":"cdc",""" +
      s""""ts_ms":1,"snapshot":"false","db":"p","sequence":"[]","ts_us":1,""" +
      s""""ts_ns":1,"schema":"commerce","table":"account","txId":1,""" +
      s""""lsn":$lsn,"xmin":null},"transaction":null,"op":"${e.op}",""" +
      s""""ts_ms":1,"ts_us":1,"ts_ns":1}"""
  }

  test("envelope replay ≡ sequential map apply, any ops and any batch split") {
    val prop = Prop.forAll(genEvs, genSplit) { (evs, split) =>
      val expected = evs.foldLeft(Map.empty[Int, String]) {
        case (m, Ev(k, v, o)) => if (o == "d") m - k else m + (k -> v)
      }
      val wh = Files.createTempDirectory("graft-cdc-prop").toString
      val bounds = (0 :: split).distinct.sorted :+ evs.length
      bounds.sliding(2).filter(w => w(1) > w(0)).zipWithIndex.foreach {
        case (w, batchId) =>
          val lines = evs.slice(w(0), w(1)).zipWithIndex
            .map { case (e, i) => envelope(e, 1000L + w(0) + i) }
          CdcSink.applyBatch(spark, lines.toDF("value"), wh,
            _ => Seq("user_id"), streamId = Some("prop"),
            batchId = Some(batchId.toLong))
      }
      val got = UpsertTable(spark, CdcSink.targetPath(wh, "account")).read()
        .select("user_id", "email").collect()
        .map(r => r.getAs[Number](0).intValue() -> r.getString(1)).toMap
      got == expected
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }
}
