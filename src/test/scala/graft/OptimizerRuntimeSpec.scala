package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-filter demonstrations: the Catalyst machinery a 100 TB
  * deployment leans on when layouts alone can't prune.
  *
  * The bloom-filter runtime join filter ships a compact dim-side
  * sketch to the fact side of a SHUFFLED join, dropping non-matching
  * fact rows at the scan instead of carrying them through the
  * exchange — the AQE-era answer to semi-join pushdown. Local
  * thresholds are lowered only because the sandbox fact side is far
  * below the 10 GB production default; the injected plan shape is
  * identical at scale.
  */
class OptimizerRuntimeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("runtime bloom filter prunes the shuffled fact side of a selective join") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force a shuffle join (a broadcast join prunes inherently and
      // suppresses the bloom filter) and let the tiny local fact side
      // qualify as an application side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables.load(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = Tables.load(spark, sf, "orders")
        .where(col("o_orderkey") < 100).select(col("o_orderkey"))
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      j.write.format("noop").mode("overwrite").save()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"no bloom filter injected on the fact side:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"join did not shuffle (bloom demo needs a shuffled join):\n$p")
      // and the filtered join still answers correctly
      val n = j.count()
      val want = li.join(broadcast(ord),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n === want)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
