package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Crash/restart proof for the two round-6 stateful stream shapes
  * (q87 stream-stream LEFT OUTER join, q90 chained day→week aggs):
  * the happy AvailableNow path is oracle-gated, but a real deployment
  * dies mid-stream — so kill after the first phase's batches, restart
  * from the checkpoint with the remaining files (including the
  * watermark-bump sentinels), and the final output must equal the
  * uninterrupted run bit-for-bit. The interesting state spans the
  * kill on purpose: join buffers holding left rows whose matches (or
  * evictions) only arrive after the restart, and open day/week
  * windows that only close after the restart.
  */
class StreamRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hourUs = 3600L * 1000000L
  private val dayUs = 24L * hourUs

  private def withShufflePartitions[A](n: Int)(run: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try run finally spark.conf.set(key, prev)
  }

  // ---- q87 shape: stream-stream left-outer join over two topics ----

  // left: users 0..7, one event per (user, hour h<6); right: even
  // users only, events at h+1 — odd users never match and surface as
  // watermark-evicted null rows
  private def leftRows: Seq[(Long, Long, Long)] =
    for (u <- 0L until 8L; h <- 0L until 6L)
      yield (u, u * 100 + h, h * hourUs)
  private def rightRows: Seq[(Long, Long, Long)] =
    for (u <- 0L until 8L by 2; h <- 0L until 6L)
      yield (u, 1000 + u * 100 + h, (h + 1) * hourUs)

  private def joinQuery(ta: String, tb: String, cp: String,
      out: String): Unit = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, event_id BIGINT, t_us BIGINT")
    def side(dir: String, uid: String, eid: String, t: String) =
      Topic.stream(spark, dir, maxFilesPerTrigger = Some(1))
        .select(from_json(col("value"), schema).as("j"))
        .select(col("j.user_id").as(uid), col("j.event_id").as(eid),
          timestamp_micros(col("j.t_us")).as(t))
    val l = side(ta, "ua", "event_a", "t_a").withWatermark("t_a", "1 hour")
    val r = side(tb, "ub", "event_b", "t_b").withWatermark("t_b", "1 hour")
    val joined = l.join(r,
      col("ua") === col("ub")
        && col("t_b") >= col("t_a")
        && col("t_b") < col("t_a") + expr("INTERVAL 12 HOURS")
        && col("event_a") =!= col("event_b"), "leftOuter")
      .select("ua", "event_a", "event_b")
    val q = withShufflePartitions(4) {
      joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .start()
    }
    q.awaitTermination()
  }

  private def joinResult(out: String): Seq[(Long, Option[Long])] =
    spark.read.parquet(out).where(col("ua") >= 0)
      .select("event_a", "event_b").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq.sorted

  test("stream-stream left-outer join: kill mid-stream, restart, same answer") {
    val base = Files.createTempDirectory("graft-restart-join")
    val maxUs = 6 * hourUs
    def produce(df: DataFrame, dir: String): Unit =
      Topic.produce(df.coalesce(1), dir)
    def sentinels(dir: String): Unit = (48 to 49).foreach { h =>
      Topic.produce(Seq((-1L, -1L, maxUs + h * hourUs))
        .toDF("user_id", "event_id", "t_us"), dir)
    }

    // uninterrupted twin: all files present, one run
    locally {
      val (ta, tb) = (s"$base/full/ta", s"$base/full/tb")
      val lr = leftRows.toDF("user_id", "event_id", "t_us")
      val rr = rightRows.toDF("user_id", "event_id", "t_us")
      produce(lr.where(col("t_us") < 3 * hourUs), ta)
      produce(rr.where(col("t_us") < 3 * hourUs), tb)
      produce(lr.where(col("t_us") >= 3 * hourUs), ta)
      produce(rr.where(col("t_us") >= 3 * hourUs), tb)
      sentinels(ta); sentinels(tb)
      joinQuery(ta, tb, s"$base/full/cp", s"$base/full/out")
    }
    val expected = joinResult(s"$base/full/out")
    assert(expected.nonEmpty && expected.exists(_._2.isEmpty),
      "test data must produce both matches and evicted null rows")

    // kill/restart run: phase 1 sees only the early files — matches
    // for them cannot complete (right rows at h+1 may be in phase 2)
    // and NO sentinel has arrived, so unmatched left rows are still
    // buffered in state when the query dies
    val (ta, tb) = (s"$base/kr/ta", s"$base/kr/tb")
    val lr = leftRows.toDF("user_id", "event_id", "t_us")
    val rr = rightRows.toDF("user_id", "event_id", "t_us")
    produce(lr.where(col("t_us") < 3 * hourUs), ta)
    produce(rr.where(col("t_us") < 3 * hourUs), tb)
    joinQuery(ta, tb, s"$base/kr/cp", s"$base/kr/out") // phase 1, then die
    val afterPhase1 = joinResult(s"$base/kr/out")
    assert(afterPhase1.size < expected.size,
      "the kill must land while results are still pending")
    // while down: the rest of the story arrives
    produce(lr.where(col("t_us") >= 3 * hourUs), ta)
    produce(rr.where(col("t_us") >= 3 * hourUs), tb)
    sentinels(ta); sentinels(tb)
    joinQuery(ta, tb, s"$base/kr/cp", s"$base/kr/out") // restart, same cp
    assert(joinResult(s"$base/kr/out") === expected,
      "restarted run must reload join state + watermark from the checkpoint")
  }

  // ---- q90 shape: chained day → week stateful aggregations ----

  private def chainQuery(topic: String, cp: String, out: String): Unit = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, t_us BIGINT, event_type STRING, vi BIGINT")
    val parsed = Topic.stream(spark, topic, maxFilesPerTrigger = Some(1))
      .select(from_json(col("value"), schema).as("j"))
      .select("j.*")
      .withColumn("t", timestamp_micros(col("t_us")))
      .withWatermark("t", "1 hour")
    val daily = parsed
      .groupBy(window(col("t"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("vi")).as("sv"))
    val weekly = daily
      .groupBy(window(window_time(col("window")), "7 days"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))
      .select(unix_micros(col("window.start")).as("w_start"),
        col("event_type"), col("n"), col("sv"))
    val q = withShufflePartitions(4) {
      weekly.writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .start()
    }
    q.awaitTermination()
  }

  private def chainResult(out: String): Seq[(Long, String, Long, Long)] =
    spark.read.parquet(out).where(col("event_type") =!= "x")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("chained day->week aggregation: kill mid-stream, restart, same answer") {
    val base = Files.createTempDirectory("graft-restart-chain")
    // 3 weeks of data, 4 rows/day across 2 event types
    val rows = for (d <- 0L until 21L; i <- 0L until 4L)
      yield (i, d * dayUs + i * hourUs,
        if (i % 2 == 0) "a" else "b", d * 10 + i)
    val maxUs = 21L * dayUs
    def sentinels(topic: String): Unit = (0 until 3).foreach { i =>
      Topic.produce(Seq((-1L, maxUs + 16 * dayUs + i * 1000000L, "x", 0L))
        .toDF("user_id", "t_us", "event_type", "vi"), topic)
    }
    val df = rows.toDF("user_id", "t_us", "event_type", "vi")
    val cutUs = 10L * dayUs

    locally { // uninterrupted twin
      val topic = s"$base/full/topic"
      Topic.produce(df.where(col("t_us") < cutUs).coalesce(1), topic)
      Topic.produce(df.where(col("t_us") >= cutUs).coalesce(1), topic)
      sentinels(topic)
      chainQuery(topic, s"$base/full/cp", s"$base/full/out")
    }
    val expected = chainResult(s"$base/full/out")
    assert(expected.size === 6, "three weeks x two event types must close")

    // kill/restart: die with week 2 half-open in BOTH stateful layers
    val topic = s"$base/kr/topic"
    Topic.produce(df.where(col("t_us") < cutUs).coalesce(1), topic)
    chainQuery(topic, s"$base/kr/cp", s"$base/kr/out") // phase 1, then die
    assert(chainResult(s"$base/kr/out").size < expected.size)
    Topic.produce(df.where(col("t_us") >= cutUs).coalesce(1), topic)
    sentinels(topic)
    chainQuery(topic, s"$base/kr/cp", s"$base/kr/out") // restart, same cp
    assert(chainResult(s"$base/kr/out") === expected,
      "restarted run must reload both aggregation layers' state + watermark")
  }

  // ---- q98 shape: native session-window aggregation (MERGING state) ----

  private def sessionQuery(topic: String, cp: String, out: String): Unit = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, t_us BIGINT")
    val parsed = Topic.stream(spark, topic, maxFilesPerTrigger = Some(1))
      .select(from_json(col("value"), schema).as("j"))
      .select("j.*")
      .withColumn("t", timestamp_micros(col("t_us")))
    val sess = parsed
      .groupBy(session_window(col("t"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s0"),
        unix_micros(col("session_window.end")).as("s1"), col("n"))
    val q = withShufflePartitions(4) {
      sess.writeStream
        .outputMode("complete")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(out)
        }
        .start()
    }
    q.awaitTermination()
  }

  private def sessResult(out: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("native session windows: kill with sessions open, restart merges into restored state") {
    val base = Files.createTempDirectory("graft-restart-session")
    // users 0..3: a 3-event session (0,1,2 h) and a later 2-event
    // session (10,11 h — the 8 h gap splits); user 9: two events
    // EXACTLY 6 h apart — the boundary rule says they merge
    val rows = (for (u <- 0L until 4L; h <- Seq(0L, 1L, 2L, 10L, 11L))
      yield (u, h * hourUs)) ++ Seq((9L, 0L), (9L, 6L * hourUs))
    val df = rows.toDF("user_id", "t_us")
    // the cut lands INSIDE the first session: its 2 h event (and user
    // 9's boundary event) only arrive after the restart, so they must
    // merge into sessions reloaded from the checkpointed state
    val cutUs = 2L * hourUs

    locally { // uninterrupted twin
      val topic = s"$base/full/topic"
      Topic.produce(df.where(col("t_us") < cutUs).coalesce(1), topic)
      Topic.produce(df.where(col("t_us") >= cutUs).coalesce(1), topic)
      sessionQuery(topic, s"$base/full/cp", s"$base/full/out")
    }
    val expected = sessResult(s"$base/full/out")
    assert(expected.size === 9, "4 users x 2 sessions + user 9's merged one")
    assert(expected.filter(_._1 == 9L) ===
      Seq((9L, 0L, 12L * hourUs, 2L)),
      "an exactly-6h gap must MERGE (split is strictly greater only)")

    val topic = s"$base/kr/topic"
    Topic.produce(df.where(col("t_us") < cutUs).coalesce(1), topic)
    sessionQuery(topic, s"$base/kr/cp", s"$base/kr/out") // phase 1, then die
    assert(sessResult(s"$base/kr/out") !== expected,
      "the kill must land while sessions are still open")
    Topic.produce(df.where(col("t_us") >= cutUs).coalesce(1), topic)
    sessionQuery(topic, s"$base/kr/cp", s"$base/kr/out") // restart, same cp
    assert(sessResult(s"$base/kr/out") === expected,
      "restarted run must merge new events into the restored session state")
  }
}
