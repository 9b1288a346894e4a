package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q46's skew distribution through AQE's NATIVE skew-join split — the
  * production default on a real cluster — pinned next to the manual
  * salting the gated operator ships, with the MEASURED structural
  * boundary between them.
  *
  * Found empirically while pinning this (debug-logged rule trace):
  * `OptimizeSkewedJoin` matches ONLY `SortMergeJoin/ShuffledHashJoin`
  * whose children are (Sort over) a bare shuffle stage. q46's LITERAL
  * shape — probe joined to `events.groupBy(type).agg(...)` — plans
  * the build side as Sort→HashAggregate→ShuffleQueryStage, and the
  * aggregate between the sort and the stage fails the pattern: AQE
  * leaves the hot partition whole no matter the thresholds. The split
  * fires only when the build side is a materialized relation (its own
  * scan/exchange), as pinned below. Salting is therefore retained as
  * the operator for exactly these shapes: aggregate-fed build sides,
  * skewed aggregations themselves, parents that re-require the join
  * key's hash partitioning (splitting would break them — AQE
  * honestly refuses), and engine modes with AQE off.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val confs = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // byte thresholds scaled to test-data size (defaults 256 MB /
    // factor 5 — a real cluster keeps them)
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.shuffle.partitions" -> "8")

  private def withConfs[A](body: => A): A = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // q46's distribution made extreme: one key carries ~95% of rows;
  // `pad` keeps the hot partition's BYTES above the scaled thresholds
  private def probe = spark.range(0, 40000)
    .select(col("id").as("event_id"),
      when(col("id") % 20 =!= 0, "hot").otherwise(
        concat(lit("cold"), (col("id") % 7).cast("string")))
        .as("event_type"),
      md5(col("id").cast("string")).as("pad"))

  test("AQE splits the hot partition when the build side is materialized") {
    withConfs {
      // materialized build side (what a real dim table is): both join
      // children are bare shuffle stages — the rule's required shape
      val buildRows = probe.groupBy("event_type")
        .agg(count(lit(1)).as("type_n")).collect().toSeq
      val build = spark.createDataFrame(
        spark.sparkContext.parallelize(buildRows, 2),
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type STRING, type_n BIGINT"))
      val joined = probe.join(build, "event_type")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("pad_len"),
          sum("type_n").as("sum_tn"))
      val row = joined.collect().head

      // correctness: identical to the salted operator's answer
      val srow = SkewJoin.saltedInner(probe,
          probe.groupBy("event_type").agg(count(lit(1)).as("type_n")),
          "event_type", col("event_id"), saltN = 16)
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("pad_len"),
          sum("type_n").as("sum_tn"))
        .collect().head
      assert((row.getLong(0), row.getLong(1), row.getLong(2)) ===
        (srow.getLong(0), srow.getLong(1), srow.getLong(2)))
      assert(row.getLong(0) === 40000L)

      // plan pin: the adaptive plan really split the hot partition
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skewed"),
        s"AQE did not mark a skewed shuffle read:\n$plan")
    }
  }

  test("AQE leaves q46's literal aggregate-fed shape unsplit — why salting stays") {
    withConfs {
      // the build side is the aggregate itself (q46's exact shape):
      // Sort→HashAggregate→stage fails OptimizeSkewedJoin's pattern
      val build = probe.groupBy("event_type").agg(count(lit(1)).as("type_n"))
      val joined = probe.join(build, "event_type")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("pad_len"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("skewed"),
        s"pattern changed: AQE now splits aggregate-fed builds — " +
          s"revisit whether q46's salt is still needed:\n$plan")
    }
  }
}
