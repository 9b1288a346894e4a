package graft.store

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[IncrementalJoin.refreshLeftJoin]] under random interleaved
  * commit scripts: for ANY sequence of fact batches (inserts /
  * updates / deletes on random keys) and dimension batches (attr
  * churn + row deletions, including dims that facts still reference),
  * refreshing after every script step must land the maintained table
  * on exactly [[IncrementalJoin.fullLeftJoin]] of the two current
  * states — including NULL attrs for facts whose dim row vanished,
  * and removal of deleted facts.
  */
class IncrementalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one step = a fact batch and/or a dim batch (either may be empty);
  // each batch carries at most one row per key (merge's contract)
  private case class Step(
      facts: List[(Long, Long, Long, String)], // event_id, user, cents, op
      dims: List[(Long, Long, String)]) // user, attr, op

  private val genStep: Gen[Step] = for {
    nf <- Gen.choose(0, 6)
    nd <- Gen.choose(0, 3)
    facts <- Gen.listOfN(nf, for {
      id <- Gen.choose(0L, 19L)
      u <- Gen.choose(0L, 6L)
      c <- Gen.choose(0L, 999L)
      op <- Gen.frequency(4 -> Gen.const("u"), 1 -> Gen.const("d"))
    } yield (id, u, c, op))
    dims <- Gen.listOfN(nd, for {
      u <- Gen.choose(0L, 6L)
      at <- Gen.choose(0L, 99L)
      op <- Gen.frequency(3 -> Gen.const("u"), 1 -> Gen.const("d"))
    } yield (u, at, op))
  } yield Step(
    facts.groupBy(_._1).values.map(_.head).toList,
    dims.groupBy(_._1).values.map(_.head).toList)

  private val genScript: Gen[List[Step]] = Gen.listOfN(5, genStep)

  private def result(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "user_id", "cents", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq.sorted

  test("maintained LEFT JOIN ≡ from-scratch join after every random refresh") {
    val prop = Prop.forAll(genScript) { script =>
      val base = Files.createTempDirectory("graft-ijoin-prop")
      val a = UpsertTable(spark, s"$base/a")
      val b = UpsertTable(spark, s"$base/b")
      val m = UpsertTable(spark, s"$base/m")
      a.create(StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("cents", LongType))), keys = Seq("event_id"))
      b.create(StructType(Seq(
        StructField("user_id", LongType), StructField("attr", LongType))),
        keys = Seq("user_id"))
      var lastA = a.currentSnapshot.get.version
      var lastB = b.currentSnapshot.get.version
      script.forall { step =>
        if (step.facts.nonEmpty)
          a.merge(step.facts.toDF("event_id", "user_id", "cents", "op"),
            opCol = Some("op"), delta = true)
        if (step.dims.nonEmpty)
          b.merge(step.dims.toDF("user_id", "attr", "op"),
            opCol = Some("op"), delta = true)
        val (vA, vB) =
          (a.currentSnapshot.get.version, b.currentSnapshot.get.version)
        IncrementalJoin.refreshLeftJoin(spark, a, b, m,
          lastA, vA, lastB, vB, "event_id", "user_id", "user_id")
        lastA = vA; lastB = vB
        val got = result(m.read())
        val want = result(
          IncrementalJoin.fullLeftJoin(a.read(), b.read(), "user_id", "user_id"))
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("catchUp: exactly-once cursor, idempotent replays, one-sided advances") {
    val base = Files.createTempDirectory("graft-ijoin-catchup")
    val a = UpsertTable(spark, s"$base/a")
    val b = UpsertTable(spark, s"$base/b")
    val m = UpsertTable(spark, s"$base/m")
    a.create(StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("cents", LongType))), keys = Seq("event_id"))
    b.create(StructType(Seq(
      StructField("user_id", LongType), StructField("attr", LongType))),
      keys = Seq("user_id"))
    val (bootA, bootB) =
      (a.currentSnapshot.get.version, b.currentSnapshot.get.version)
    def catchUp(): Boolean = IncrementalJoin.catchUpLeftJoin(
      spark, a, b, m, "event_id", "user_id", "user_id", bootA, bootB)
    def assertCaughtUp(): Unit =
      assert(result(m.read()) === result(
        IncrementalJoin.fullLeftJoin(a.read(), b.read(), "user_id", "user_id")))

    a.merge(Seq((1L, 10L, 100L), (2L, 11L, 200L))
      .toDF("event_id", "user_id", "cents"), delta = true)
    b.merge(Seq((10L, 7L)).toDF("user_id", "attr"), delta = true)
    assert(catchUp());
    assertCaughtUp()
    assert(!catchUp(), "second catch-up with no new commits must be a no-op")

    // crash-replay simulation: re-running the SAME refresh (same
    // packed batchId) must be swallowed by the store's replay guard
    val (vA, vB) =
      (a.currentSnapshot.get.version, b.currentSnapshot.get.version)
    IncrementalJoin.refreshLeftJoin(spark, a, b, m,
      bootA, vA, bootB, vB, "event_id", "user_id", "user_id",
      streamId = Some("graft-ijoin"), batchId = Some((vA << 31) | vB))
    assertCaughtUp()

    // one-sided advance: only the dimension moves
    b.merge(Seq((10L, 8L), (11L, 9L)).toDF("user_id", "attr"), delta = true)
    assert(catchUp()); assertCaughtUp()
    // one-sided advance: only the fact side moves (incl. a delete)
    a.merge(Seq((2L, 11L, 250L, "u"), (1L, 10L, 0L, "d"))
      .toDF("event_id", "user_id", "cents", "op"),
      opCol = Some("op"), delta = true)
    assert(catchUp()); assertCaughtUp()
    assert(!catchUp())
  }
}
