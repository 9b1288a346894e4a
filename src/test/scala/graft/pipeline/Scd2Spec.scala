package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("build: intervals partition each key's timeline, one current row per key") {
    val changes = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      (2L, 5L, "x")
    ).toDF("k", "t", "attr")
    val v = Scd2.build(changes, "k", "t", Seq("attr"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .sortBy(x => (x._1, x._3))

    assert(v.toSeq == Seq(
      (1L, "a", 10L, Some(20L), false),
      (1L, "b", 20L, Some(30L), false),
      (1L, "c", 30L, None, true),
      (2L, "x", 5L, None, true)))
    // exactly one current version per key; valid_to chains to the next
    // valid_from with no gaps or overlaps
    assert(v.count(_._5) == 2)
  }

  test("build: rejects inputs already carrying interval column names") {
    val bad = Seq((1L, 10L, true)).toDF("k", "t", "is_current")
    val e = intercept[IllegalArgumentException](
      Scd2.build(bad, "k", "t", Seq("is_current")))
    assert(e.getMessage.contains("is_current"))
  }

  test("temporalJoin equals the brute-force interval join on randomized data") {
    val rnd = new scala.util.Random(8128)
    // colliding-ish times on purpose: small time domain forces
    // fact-at-version-boundary cases; dim times unique per key
    val dim = (for {
      k <- 0L until 8L
      t <- rnd.shuffle((0L until 50L).toList).take(rnd.nextInt(6))
    } yield (k, t * 10, s"v$k-$t")).toDF("k", "t", "attr")
    val facts = (0 until 300).map { i =>
      (i.toLong, rnd.nextLong(10), rnd.nextLong(500))
    }.toDF("fid", "k", "t")

    val got = Scd2.temporalJoin(facts, dim, "k", col("t"), col("t"), "attr")
      .select("fid", "attr").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    // oracle: SCD2 intervals + explicit containment predicate
    val v = Scd2.build(dim, "k", "t", Seq("attr"))
    val want = facts.as("f")
      .join(v.as("v"),
        col("f.k") === col("v.k") &&
          col("v.valid_from") <= col("f.t") &&
          (col("v.valid_to").isNull || col("f.t") < col("v.valid_to")),
        "left")
      .select(col("f.fid"), col("v.attr")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap

    assert(got.size == 300 && want.size == 300)
    assert(got == want)
  }
}
