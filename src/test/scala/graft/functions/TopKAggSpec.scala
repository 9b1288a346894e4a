package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equals the window formulation on randomized skewed data, any partitioning") {
    val rnd = new scala.util.Random(140)
    // skewed: group 0 holds half the rows; scores collide often so
    // ties exercise the id ASC tie-break
    val rows = (0 until 2000).map { i =>
      val g = if (rnd.nextBoolean()) 0L else rnd.nextLong(20)
      (g, rnd.nextLong(50), i.toLong)
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "score", "id").repartition(parts)
      val got = df.groupBy("g").agg(expr("top_k(score, id, 5)").as("tk"))
        .select(col("g"), posexplode(col("tk")))
        .select(col("g"), col("pos"), col("col.score"), col("col.id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.map(r => (r._2, r._3)).sortBy { case (s, i) => (-s, i) }
          .take(5).zipWithIndex
          .map { case ((s, i), p) => (g, p, s, i) }
      }.toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("groups smaller than k return all rows, still sorted") {
    val df = Seq((1L, 10L, 100L), (1L, 30L, 101L)).toDF("g", "score", "id")
    val got = df.groupBy("g").agg(expr("top_k(score, id, 5)").as("tk"))
      .select(explode(col("tk")).as("r")).select("r.score", "r.id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((30L, 101L), (10L, 100L)))
  }

  test("nulls are skipped, not ranked") {
    val df = Seq((1L, Some(10L), 100L), (1L, None, 101L))
      .toDF("g", "score", "id")
    val got = df.groupBy("g").agg(expr("top_k(score, id, 5)").as("tk"))
      .select(size(col("tk"))).head().getInt(0)
    assert(got == 1)
  }

  test("non-bigint inputs are rejected at analysis") {
    val df = Seq((1, "x")).toDF("score", "id")
    val e = intercept[Exception](
      df.agg(expr("top_k(score, id, 3)")).collect())
    assert(e.getMessage.toLowerCase.contains("top_k") ||
      e.getMessage.contains("BIGINT"))
  }
}
