package graft.store

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Change-feed contract under ADVERSARIAL commit interleavings.
  *
  * For ANY sequence of delta merges, compactions, schema evolutions,
  * and rollbacks:
  *  - over any feed-servable range `(v1, v2]`, applying the feed's
  *    last-image-per-key onto the v1 state must reproduce the v2
  *    state exactly (the brute-force diff) — layout-only commits
  *    (compact/evolve) contribute nothing and break nothing;
  *  - [[IncrementalAgg.refreshCountSum]] over that range must land a
  *    target bootstrapped at v1 on exactly
  *    [[IncrementalAgg.fullCountSum]] of the v2 state;
  *  - any range containing a rollback commit must fail LOUDLY
  *    (rollback rewinds state without row-level deltas, so a feed
  *    over it would silently lie).
  */
class ChangeFeedPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private sealed trait Cmd
  private case class Delta(rows: List[(Long, String, Long, String)]) extends Cmd
  private case object Compact extends Cmd
  private case object Evolve extends Cmd
  private case class Rollback(pick: Int) extends Cmd

  private val genDelta: Gen[Delta] =
    Gen.listOfN(6, for {
      id <- Gen.choose(0L, 9L)
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 100L)
      op <- Gen.frequency(4 -> Gen.const("u"), 1 -> Gen.const("d"))
    } yield (id, g, v, op))
      .map(rows => Delta(rows.groupBy(_._1).values.map(_.head).toList))

  private val genCmds: Gen[List[Cmd]] =
    Gen.listOfN(8, Gen.frequency(
      5 -> genDelta,
      1 -> Gen.const(Compact),
      1 -> Gen.const(Evolve),
      1 -> Gen.choose(0, 100).map(Rollback)))

  private type State = Map[Long, (String, Long)]

  private def stateOf(df: org.apache.spark.sql.DataFrame): State =
    df.select("id", "g", "v").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("feed diff ≡ state diff; refresh ≡ recompute; rollback ranges fail loudly") {
    var evolveCount = 0
    val prop = Prop.forAll(genCmds) { cmds =>
      val src = UpsertTable(spark,
        Files.createTempDirectory("graft-feedprop").toString)
      src.create(StructType(Seq(
        StructField("id", LongType), StructField("g", StringType),
        StructField("v", LongType))), keys = Seq("id"))
      // replay, tracking the expected state at every REAL version and
      // which versions are rollback commits
      var states = Map(src.currentSnapshot.get.version -> (Map.empty: State))
      var rollbackVs = Set.empty[Long]
      var cur: State = Map.empty
      cmds.foreach { cmd =>
        val before = src.currentSnapshot.get.version
        cmd match {
          case Delta(rows) =>
            src.merge(rows.toDF("id", "g", "v", "op"),
              opCol = Some("op"), delta = true)
            cur = rows.foldLeft(cur) { case (m, (id, g, v, op)) =>
              if (op == "d") m - id else m + (id -> ((g, v)))
            }
          case Compact => src.compact()
          case Evolve =>
            evolveCount += 1
            src.evolveSchema(StructType(src.schema.fields :+
              StructField(s"w$evolveCount", DoubleType)))
          case Rollback(pick) =>
            val targets = states.keys.filter(_ < before).toSeq.sorted
            if (targets.nonEmpty) {
              val t = targets(pick % targets.size)
              src.rollback(t)
              cur = states(t)
            }
        }
        val after = src.currentSnapshot.get.version
        if (after != before) {
          states += (after -> cur)
          cmd match { case Rollback(_) => rollbackVs += after; case _ => () }
        }
      }
      val vs = states.keys.toSeq.sorted
      // sample ranges: widest, first-half, second-half, plus one
      // guaranteed to contain each rollback commit
      val mid = vs(vs.size / 2)
      val sampled = (Seq((vs.head, vs.last), (vs.head, mid), (mid, vs.last)) ++
        rollbackVs.map(rv => (vs.filter(_ < rv).max, rv)))
        .distinct.filter { case (a, b) => a < b }
      sampled.forall { case (v1, v2) =>
        val crossesRollback = rollbackVs.exists(rv => v1 < rv && rv <= v2)
        if (crossesRollback) {
          intercept[IllegalStateException](src.readChanges(v1, v2).collect())
          true
        } else {
          // 1. brute-force: last image per key applied to v1 == v2
          val feed = src.readChanges(v1, v2)
            .select("id", "g", "v", "_change_op", "_commit_version").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
              r.getString(3), r.getLong(4)))
          val applied = feed.groupBy(_._1).values.map(_.maxBy(_._5))
            .foldLeft(states(v1)) { case (m, (id, g, v, op, _)) =>
              if (op == "d") m - id else m + (id -> ((g, v)))
            }
          val want = stateOf(src.readVersion(v2))
          assert(applied === want, s"feed($v1,$v2] diverges from state diff")
          // 2. incremental refresh == full recompute at v2
          val tgt = UpsertTable(spark,
            Files.createTempDirectory("graft-feedprop-tgt").toString)
          tgt.create(StructType(Seq(
            StructField("g", StringType), StructField("n", LongType),
            StructField("sv", DoubleType))), keys = Seq("g"))
          tgt.merge(IncrementalAgg.fullCountSum(
            src.readVersion(v1).select("id", "g", "v"), "g", "v"))
          IncrementalAgg.refreshCountSum(spark, src, tgt, v1, v2, "id", "g", "v")
          val got = tgt.read().collect()
            .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
          val full = IncrementalAgg.fullCountSum(
            src.readVersion(v2).select("id", "g", "v"), "g", "v").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
          assert(got === full, s"refresh($v1,$v2] diverges from recompute")
          true
        }
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(result.passed, result.status.toString)
  }
}
