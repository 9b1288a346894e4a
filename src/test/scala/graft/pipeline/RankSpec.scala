package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Rank.ntileExact]] must equal the built-in `ntile()` window on
  * every input — it exists purely as the scale-safe physical plan for
  * the same logical answer. */
class RankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("want", ntile(k).over(
      Window.partitionBy("g").orderBy(col("v"), col("id"))).cast("long"))

  private def check(rows: Seq[(String, Double, Long)], k: Int,
      splits: Int = 8): Unit = {
    val df = rows.toDF("g", "v", "id").repartition(7)
    val got = Rank.ntileExact(df, "g", "v", "id", k, splits)
      .select(col("g"), col("id"), col("ntile"))
    val want = builtin(df, k).select(col("g"), col("id"), col("want"))
    val diff = got.join(want, Seq("g", "id"))
      .where(col("ntile") =!= col("want"))
    assert(diff.count() === 0,
      s"ntileExact diverges from ntile():\n${diff.limit(20).collect().mkString("\n")}")
    assert(got.count() === rows.size)
  }

  test("matches ntile() on uneven groups with heavy ties") {
    val rows =
      (1L to 500L).map(i => ("a", (i % 13).toDouble, i)) ++ // many ties
      (1L to 97L).map(i => ("b", math.sin(i * 3.7) * 100, i)) ++
      (1L to 7L).map(i => ("c", 1.0, i)) ++                 // group < k
      Seq(("d", 5.0, 1L))                                   // singleton
    check(rows, k = 10)
  }

  test("matches ntile() when every value is identical (one giant tie)") {
    check((1L to 60L).map(i => ("t", 42.0, i)), k = 4)
  }

  test("matches ntile() with k larger than any group") {
    check((1L to 5L).map(i => ("s", i.toDouble, i)), k = 100, splits = 4)
  }

  test("matches ntile() in the degenerate single-bucket case (splits=1)") {
    check((1L to 40L).map(i => ("g", ((i * 13) % 7).toDouble, i)),
      k = 4, splits = 1)
  }

  test("result is scan-order independent") {
    val rows = (1L to 300L).map(i => ("x", ((i * 31) % 50).toDouble, i))
    val a = Rank.ntileExact(rows.toDF("g", "v", "id"), "g", "v", "id", 10)
      .select("id", "ntile").as[(Long, Long)].collect().toMap
    val b = Rank.ntileExact(rows.reverse.toDF("g", "v", "id")
        .repartition(13), "g", "v", "id", 10)
      .select("id", "ntile").as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("null order values take the first tiles, like the built-in") {
    val df = Seq(("n", Some(3.0), 1L), ("n", None, 2L), ("n", Some(1.0), 3L),
      ("n", None, 4L), ("n", Some(2.0), 5L), ("n", Some(9.0), 6L))
      .toDF("g", "v", "id")
    val got = Rank.ntileExact(df, "g", "v", "id", 3)
      .select(col("id"), col("ntile"))
    val want = builtin(df, 3).select(col("id"), col("want"))
    val diff = got.join(want, Seq("id")).where(col("ntile") =!= col("want"))
    assert(diff.count() === 0)
  }

  test("empty input yields an empty, schema-complete result") {
    val empty = Seq.empty[(String, Double, Long)].toDF("g", "v", "id")
    val out = Rank.ntileExact(empty, "g", "v", "id", 10)
    assert(out.columns.contains("ntile") && out.count() === 0)
  }

  test("reserved column names are rejected, not silently overwritten") {
    for (bad <- Seq("__g", "__b", "__lr", "ntile")) {
      val df = Seq(("a", 1.0, 1L, 9)).toDF("g", "v", "id", bad)
      val e = intercept[IllegalArgumentException] {
        Rank.ntileExact(df, "g", "v", "id", 2)
      }
      assert(e.getMessage.contains(bad))
    }
  }

  test("reuse=false still ranks correctly on deterministic input") {
    val df = (1 to 100).map(i => (s"g${i % 3}", (i * 37 % 101).toDouble, i.toLong))
      .toDF("g", "v", "id")
    val a = Rank.ntileExact(df, "g", "v", "id", 4)
      .select("g", "id", "ntile").collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Rank.ntileExact(df, "g", "v", "id", 4, reuse = false)
      .select("g", "id", "ntile").collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a === b)
  }

  test("null group keys fail loudly") {
    val df = Seq((Option.empty[String], 1.0, 1L)).toDF("g", "v", "id")
    val e = intercept[IllegalArgumentException] {
      Rank.ntileExact(df, "g", "v", "id", 2)
    }
    assert(e.getMessage.contains("null"))
  }

  test("splits=1 keeps the empty-input and null-group guards (no probe job)") {
    // the degenerate path skips the boundary probe, so both checks
    // must fall through to the count collect instead
    val empty = Seq.empty[(String, Double, Long)].toDF("g", "v", "id")
    val out = Rank.ntileExact(empty, "g", "v", "id", 10, rangeSplits = 1)
    assert(out.columns.contains("ntile") && out.count() === 0)
    val nullG = Seq((Option.empty[String], 1.0, 1L)).toDF("g", "v", "id")
    val e = intercept[IllegalArgumentException] {
      Rank.ntileExact(nullG, "g", "v", "id", 2, rangeSplits = 1)
    }
    assert(e.getMessage.contains("null"))
  }
}
