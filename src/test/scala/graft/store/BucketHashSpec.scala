package graft.store

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The bucket-pruning contract: the driver-side literal hash
  * (UpsertTable.bucketFor) MUST equal the executor-side column hash
  * (UpsertTable.bucketExpr) for every key type — a divergence would
  * make point lookups silently scan the wrong bucket and return
  * nothing. Checked across int/long/string/timestamp keys and a
  * composite key.
  */
class BucketHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sparkSideBuckets(df: org.apache.spark.sql.DataFrame,
      keys: Seq[String], n: Int): Map[Seq[Any], Int] =
    df.withColumn("__b", UpsertTable.bucketExpr(keys, n))
      .collect()
      .map(r => keys.map(k => r.get(r.fieldIndex(k))) -> r.getAs[Int]("__b"))
      .toMap

  test("driver-side bucketFor equals Spark-side bucketExpr: int keys") {
    val t = UpsertTable(spark, Files.createTempDirectory("bh").toString)
    t.create(StructType(Seq(StructField("k", IntegerType))), Seq("k"), 64)
    val vals = (-50 to 50) ++ Seq(Int.MaxValue, Int.MinValue)
    val expected = sparkSideBuckets(vals.toDF("k"), Seq("k"), 64)
    vals.foreach { v =>
      assert(t.bucketFor(Map("k" -> v)).contains(expected(Seq(v))), s"key $v")
    }
  }

  test("driver-side bucketFor equals Spark-side bucketExpr: long keys") {
    val t = UpsertTable(spark, Files.createTempDirectory("bh").toString)
    t.create(StructType(Seq(StructField("k", LongType))), Seq("k"), 256)
    val vals = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 1234567890123L)
    val expected = sparkSideBuckets(vals.toDF("k"), Seq("k"), 256)
    vals.foreach { v =>
      assert(t.bucketFor(Map("k" -> v)).contains(expected(Seq(v))), s"key $v")
    }
  }

  test("driver-side bucketFor equals Spark-side bucketExpr: string keys") {
    val t = UpsertTable(spark, Files.createTempDirectory("bh").toString)
    t.create(StructType(Seq(StructField("k", StringType))), Seq("k"), 64)
    val vals = Seq("", "a", "alice@example.com", "ünïcødé-键", "x" * 300)
    val expected = sparkSideBuckets(vals.toDF("k"), Seq("k"), 64)
    vals.foreach { v =>
      assert(t.bucketFor(Map("k" -> v)).contains(expected(Seq(v))), s"key $v")
    }
  }

  test("driver-side bucketFor equals Spark-side bucketExpr: composite key") {
    val t = UpsertTable(spark, Files.createTempDirectory("bh").toString)
    t.create(StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType))), Seq("a", "b"), 32)
    val vals = Seq((1, "x"), (2, "y"), (-7, ""), (0, "long-key-value"))
    val expected = sparkSideBuckets(vals.toDF("a", "b"), Seq("a", "b"), 32)
    vals.foreach { case (a, b) =>
      assert(t.bucketFor(Map("a" -> a, "b" -> b))
        .contains(expected(Seq(a, b))), s"key ($a,$b)")
    }
  }
}
