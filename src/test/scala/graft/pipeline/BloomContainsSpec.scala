package graft.pipeline

import java.io.ByteArrayOutputStream
import java.util.Base64

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The bloom_contains native probe (q104's engine): no false
  * negatives, bounded false positives, codegen/interpreted parity, and
  * the bloom-prefilter decontamination equals the exact join.
  */
class BloomContainsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def b64Of(items: Seq[String], fpp: Double = 0.01): String = {
    val bf = BloomFilter.create(math.max(items.size, 1), fpp)
    items.foreach(bf.putString)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  test("no false negatives: every inserted member probes true") {
    val members = (0 until 2000).map(i => s"member-$i")
    val b64 = b64Of(members)
    val hits = members.toDF("s")
      .where(expr(s"bloom_contains('$b64', s)")).count()
    assert(hits === members.size)
  }

  test("false-positive rate over non-members stays near configured fpp") {
    val members = (0 until 5000).map(i => s"member-$i")
    val b64 = b64Of(members, fpp = 0.01)
    val nonMembers = (0 until 20000).map(i => s"other-$i")
    val fp = nonMembers.toDF("s")
      .where(expr(s"bloom_contains('$b64', s)")).count()
    // E[fp] ~ 200 at fpp=0.01; 4x headroom makes a false red a
    // many-sigma event while still catching a broken hash path
    assert(fp <= 20000 * 0.04, s"fp=$fp out of band")
  }

  test("codegen and interpreted paths agree") {
    val b64 = b64Of(Seq("alpha", "beta", "gamma"))
    val probes = Seq("alpha", "beta", "gamma", "delta", "epsilon").toDF("s")
    val viaExpr = probes.select(col("s"),
      expr(s"bloom_contains('$b64', s)").as("hit")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // interpreted: direct eval outside codegen
    val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(
      Base64.getDecoder.decode(b64)))
    probes.collect().map(_.getString(0)).foreach { s =>
      assert(viaExpr(s) === bf.mightContainString(s),
        s"codegen/interpreted disagree on '$s'")
    }
    assert(Seq("alpha", "beta", "gamma").forall(viaExpr))
  }

  test("non-foldable filter argument is rejected at analysis") {
    val df = Seq(("abc", "abc")).toDF("f", "s")
    val e = intercept[Exception] {
      df.select(expr("bloom_contains(f, s)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.toLowerCase.contains("literal"))
  }

  test("q104 bloom prefilter is lossless: pairs equal the exact q52 join") {
    val dir = "/root/testdata/sf0.001"
    val bloomPairs = PipelineQueries
      .queries("q104_bloom_decontaminate")(spark, dir)
      .select("train_id", "eval_id")
    val exactPairs = PipelineQueries
      .queries("q52_decontaminate")(spark, dir)
    assert(bloomPairs.exceptAll(exactPairs).count() === 0)
    assert(exactPairs.exceptAll(bloomPairs).count() === 0)
    // and the in-band audit flags are green
    val flags = PipelineQueries
      .queries("q104_bloom_decontaminate")(spark, dir)
      .select("fn_free", "fp_in_band").distinct().collect()
    assert(flags.length === 1 && flags(0).getBoolean(0) && flags(0).getBoolean(1))
  }
}
