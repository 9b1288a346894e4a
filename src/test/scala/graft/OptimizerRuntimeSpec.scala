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

  test("AQE splits a discovered skewed join partition at runtime") {
    import spark.implicits._
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // q46 handles PLANNED skew by salting; this is the runtime
      // complement — AQE discovering the hot key from shuffle stats
      // and splitting its partition. Thresholds shrink to sandbox
      // sizes (production defaults are 256 MB); the mechanism is the
      // same at 100 TB.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // one hot key dominating the left side; uniform right side
      val left = ((1 to 200000).map(i => (0L, i.toLong)) ++
        (1 to 100).flatMap(k => (1 to 10).map(i => (k.toLong, i.toLong))))
        .toDF("k", "v").repartition(8)
      val right = (0 to 100).map(k => (k.toLong, s"dim-$k")).toDF("k", "name")
      val j = left.join(right, "k")
      // drive THIS df's own adaptive plan to its final form (a write
      // or count would finalize a separate QueryExecution and never
      // mark this one)
      val n = j.queryExecution.toRdd.count()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$p")
      assert(n === 200000L + 100L * 10L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
