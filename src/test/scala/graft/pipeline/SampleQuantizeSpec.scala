package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SampleQuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (1L to 200L)
    .map(i => (i, s"lang${i % 3}")).toDF("doc_id", "grp")

  test("stratifiedTopK two-level result equals the single-window answer") {
    val got = Sample.stratifiedTopK(docs, "grp", "doc_id", k = 7)
      .orderBy("grp", "smp_rank").collect()
    val h = md5(concat(lit("smp:"), col("doc_id").cast("string")))
    val want = docs.select(col("grp"), col("doc_id"), h.as("h"))
      .withColumn("smp_rank", row_number().over(
        Window.partitionBy("grp").orderBy(col("h"), col("doc_id"))).cast("long"))
      .where(col("smp_rank") <= 7)
      .select("grp", "smp_rank", "doc_id")
      .orderBy("grp", "smp_rank").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("stratifiedTopK returns exactly k rows per group, ranks 1..k") {
    val out = Sample.stratifiedTopK(docs, "grp", "doc_id", k = 5)
      .groupBy("grp").agg(count(lit(1)).as("n"),
        sort_array(collect_list("smp_rank")).as("ranks"))
      .collect()
    assert(out.length === 3)
    assert(out.forall(_.getLong(1) === 5L))
    assert(out.forall(_.getSeq[Long](2) === Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("globalShuffle is a permutation: every row exactly once, " +
    "positions contiguous from 1 within each shard") {
    val out = Sample.globalShuffle(docs, "doc_id", shards = 8)
    assert(out.select("doc_id").distinct().count() === 200)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .collect()
    assert(perShard.forall(r => r.getLong(2) === r.getLong(1))) // max == count
    assert(perShard.forall(_.getLong(3) === 1L))
    assert(perShard.map(_.getLong(1)).sum === 200L)
  }

  test("globalShuffle is deterministic across runs") {
    val a = Sample.globalShuffle(docs, "doc_id", shards = 8)
      .orderBy("shard", "pos").collect()
    val b = Sample.globalShuffle(docs, "doc_id", shards = 8)
      .orderBy("shard", "pos").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("int8 quantization round-trips within half a step, zero vector safe") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Quantize.int8(df, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(out.length === 2)
    // amax=1.0 -> scale=1/127; codes md5 over "64,-127,32"
    val r1 = out(0)
    assert(r1.getLong(1) === 3L)
    // scale is emitted rounded to 6 dp
    assert(math.abs(r1.getDouble(2) - 1d / 127d) < 5e-7)
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("64,-127,32".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r1.getString(4) === expectMd5)
    val r2 = out(1)
    assert(r2.getDouble(2) === 0d) // zero vector: scale 0
    assert(r2.getDouble(3) === 0d)
  }
}
