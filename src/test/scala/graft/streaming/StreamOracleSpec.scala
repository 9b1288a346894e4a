package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}
import graft.store.UpsertTable

/** End-to-end: the real `events` table produced to a topic in
  * changelog order, streamed through IngestJob into the store — the
  * materialized state must equal the oracle-verified q5 answer
  * (last event per user). Ties the streaming path to the same
  * correctness gate as the batch queries.
  */
class StreamOracleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streamed events materialize the q5 (changelog-normalize) answer") {
    val base = Files.createTempDirectory("graft-so")
    // produce in changelog order: one part file, globally sorted
    val events = Tables.load(spark, sf, "events")
      .orderBy(col("ts"), col("event_id"))
      .select("event_id", "user_id", "event_type")
      .coalesce(1)
    Topic.produce(events, s"$base/topic")

    val job = IngestJob(
      topicDir = s"$base/topic",
      tablePath = s"$base/table",
      keyField = "user_id",
      fields = Seq(JsonField("user_id", "BIGINT"),
        JsonField("event_id", "BIGINT"), JsonField("event_type", "STRING")),
      checkpointDir = s"$base/cp",
      trigger = Trigger.AvailableNow())
    val q = job.start(spark)
    q.awaitTermination()

    val got = UpsertTable(spark, job.tablePath).read()
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oracle = SparkEntry.queries("q5_upsert_latest")(spark, sf)
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === oracle)
  }
}
