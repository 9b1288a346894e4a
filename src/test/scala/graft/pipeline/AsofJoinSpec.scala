package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of: at-or-before semantics, ties, and no-match nulls") {
    val quotes = Seq( // key, time, quote_id
      (1L, 10L, 100L), (1L, 20L, 200L), (1L, 20L, 201L), // tie at t=20
      (2L, 50L, 500L)
    ).toDF("k", "qt", "quote_id")
    val trades = Seq( // key, time, trade_id
      (1L, 5L, 1L),   // before any quote -> null
      (1L, 10L, 2L),  // exactly at first quote -> inclusive
      (1L, 25L, 3L),  // after the tie -> greatest tie-break (201)
      (2L, 60L, 4L),  // normal match
      (3L, 99L, 5L)   // key with no quotes -> null
    ).toDF("k", "tt", "trade_id")

    val out = AsofJoin.backward(trades, quotes, "k",
      leftTime = col("tt"), rightTime = col("qt"), payloadCol = "quote_id")
      .select("trade_id", "quote_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap

    assert(out(1L).isEmpty)
    assert(out(2L).contains(100L))
    assert(out(3L).contains(201L))
    assert(out(4L).contains(500L))
    assert(out(5L).isEmpty)
  }

  test("a NULL payload on the latest right row is attached as NULL, not skipped") {
    val quotes = Seq[(Long, Long, Option[Long])](
      (1L, 10L, Some(100L)),
      (1L, 20L, None) // latest match has a genuinely NULL payload
    ).toDF("k", "qt", "quote_id")
    val trades = Seq((1L, 30L, 1L)).toDF("k", "tt", "trade_id")
    val out = AsofJoin.backward(trades, quotes, "k",
      leftTime = col("tt"), rightTime = col("qt"), payloadCol = "quote_id")
      .select("quote_id").head()
    // the t=20 row wins even though its payload is NULL; the stale 100
    // from t=10 must NOT leak through
    assert(out.isNullAt(0))
  }

  test("left side already owning the payload column is rejected, not clobbered") {
    val quotes = Seq((1L, 10L, 100L)).toDF("k", "qt", "pid")
    val trades = Seq((1L, 30L, 7L)).toDF("k", "tt", "pid") // pid collides
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backward(trades, quotes, "k", col("tt"), col("qt"), "pid")
    }
    assert(e.getMessage.contains("pid"))
  }

  test("as-of plan is a single key shuffle, no range join or cross product") {
    val l = (1 to 100).map(i => (i.toLong % 5, i.toLong, i.toLong)).toDF("k", "tt", "id")
    val r = (1 to 50).map(i => (i.toLong % 5, i.toLong * 2, i.toLong)).toDF("k", "qt", "pid")
    val out = AsofJoin.backward(l, r, "k", col("tt"), col("qt"), "pid")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    assert(plan.contains("Window"))
  }
}
