package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[OverAgg]] crash/restart proof: the per-key running totals live in
  * state — a restart must CONTINUE the counts from the checkpoint,
  * not restart them at zero (the failure mode that silently corrupts
  * every per-row rank after recovery).
  */
class OverAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hourUs = 3600L * 1000000L

  private def overQuery(topic: String, cp: String, out: String): Unit = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, event_id BIGINT, t_us BIGINT, cents BIGINT")
    val running = OverAgg.running(
      Topic.stream(spark, topic, maxFilesPerTrigger = Some(1))
        .select(from_json(col("value"), schema).as("j"))
        .select(col("j.user_id").as("user_id"),
          col("j.event_id").as("event_id"), col("j.t_us").as("t_us"),
          timestamp_micros(col("j.t_us")).as("ts"),
          col("j.cents").as("cents"))
        .as[OverEvent])
    val q = running.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(out)
      }
      .start()
    q.awaitTermination()
  }

  private def rows(out: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("running totals continue across a kill/restart") {
    val base = Files.createTempDirectory("graft-over-restart")
    val D = 24L * hourUs // keep synthetic times off the epoch-0 watermark
    // user 1: 4 events across the cut; user 2: 2 events before it
    val all = Seq(
      (1L, 10L, D, 5L), (1L, 11L, D + hourUs, 7L),
      (2L, 20L, D, 11L), (2L, 21L, D + hourUs, 13L),
      (1L, 12L, D + 3 * hourUs, 17L), (1L, 13L, D + 4 * hourUs, 19L))
    val df = all.toDF("user_id", "event_id", "t_us", "cents")
    val cut = D + 2 * hourUs
    val expected = Seq(
      (1L, 10L, 1L, 5L), (1L, 11L, 2L, 12L),
      (1L, 12L, 3L, 29L), (1L, 13L, 4L, 48L),
      (2L, 20L, 1L, 11L), (2L, 21L, 2L, 24L))

    val topic = s"$base/topic"
    Topic.produce(df.where(col("t_us") < cut).coalesce(1), topic)
    overQuery(topic, s"$base/cp", s"$base/out") // phase 1, then die
    assert(rows(s"$base/out") === expected.filter(_._3 <= 2).filterNot(
      t => t._1 == 1L && t._3 > 2), "phase 1 emits the first two per user")
    Topic.produce(df.where(col("t_us") >= cut).coalesce(1), topic)
    overQuery(topic, s"$base/cp", s"$base/out") // restart, same cp
    assert(rows(s"$base/out") === expected,
      "restart must continue counts from state, not reset to rank 1")
  }
}
