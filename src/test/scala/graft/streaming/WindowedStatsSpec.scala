package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WindowedStatsSpec extends AnyFunSuite {

  test("session fold: backward merge extends start; far-early straggler closes alone") {
    import java.sql.Timestamp
    // live session [10s, 10s], gap 2s; batch carries (ascending):
    // 3s (more than gap before start -> own closed session),
    // 9s (within gap before start -> merges, start moves back),
    // 11s (within gap after end -> merges forward)
    val sorted = Seq(3000L, 9000L, 11000L)
      .map(t => SessionEvent(1L, new Timestamp(t)))
    val (closed, acc) =
      Sessionize.fold(1L, SessionAcc(10000L, 10000L, 1), sorted, gapMs = 2000L)
    assert(closed.map(c => (c.session_start.getTime, c.session_end.getTime,
      c.events)) === Seq((3000L, 3000L, 1)))
    assert(acc === SessionAcc(9000L, 11000L, 3))
  }

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val eventSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType)))

  private def parsed(topic: String) =
    Topic.stream(spark, topic)
      .select(from_json(col("value"), eventSchema).as("e"))
      .select("e.user_id", "e.ts")

  private def line(uid: Long, ts: String): String =
    s"""{"user_id":$uid,"ts":"$ts"}"""

  test("tumbling window counts close exactly once as the watermark advances") {
    val base = Files.createTempDirectory("graft-win")
    val topic = s"$base/topic"
    Files.createDirectories(java.nio.file.Paths.get(topic))
    val counts = WindowedStats.tumblingCounts(
      parsed(topic), "ts", "1 minute", "10 seconds", Seq("user_id"))
    val q = counts.writeStream
      .format("memory").queryName("win_counts").outputMode("append")
      .option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // three events in window [00:00,00:01), one in [00:01,00:02)
      Topic.appendLines(topic, Seq(
        line(1, "2026-01-01 00:00:05"), line(1, "2026-01-01 00:00:20"),
        line(2, "2026-01-01 00:00:40"), line(1, "2026-01-01 00:01:10")))
      q.processAllAvailable()
      // watermark is still at batch-1 max (00:01:10) - 10s: first
      // window not emitted yet in append mode until watermark passes
      // its end; advance it well beyond
      Topic.appendLines(topic, Seq(line(9, "2026-01-01 00:10:00")))
      q.processAllAvailable()
      // one more batch so the new watermark takes effect
      Topic.appendLines(topic, Seq(line(9, "2026-01-01 00:11:00")))
      q.processAllAvailable()

      val rows = spark.sql(
        "SELECT window_start, user_id, n FROM win_counts ORDER BY window_start, user_id")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      assert(rows.contains(("2026-01-01 00:00:00.0", 1L, 2L)))
      assert(rows.contains(("2026-01-01 00:00:00.0", 2L, 1L)))
      assert(rows.contains(("2026-01-01 00:01:00.0", 1L, 1L)))
      // late-beyond-watermark data is dropped, not recounted
      Topic.appendLines(topic, Seq(line(1, "2026-01-01 00:00:30"),
        line(9, "2026-01-01 00:12:00")))
      q.processAllAvailable()
      val after = spark.sql("SELECT n FROM win_counts WHERE user_id = 1 " +
        "AND window_start = '2026-01-01 00:00:00'").collect().map(_.getLong(0))
      assert(after.toSeq === Seq(2L))
    } finally q.stop()
  }

  test("streaming dedup suppresses duplicates within the watermark") {
    val base = Files.createTempDirectory("graft-sdedup")
    val topic = s"$base/topic"
    Files.createDirectories(java.nio.file.Paths.get(topic))
    val deduped = StreamingDedup.dedup(
      parsed(topic).withColumn("event_key", col("user_id")),
      Seq("event_key"), "ts", "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("sdedup").outputMode("append")
      .option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      Topic.appendLines(topic, Seq(
        line(1, "2026-01-01 00:00:00"), line(1, "2026-01-01 00:00:05"),
        line(2, "2026-01-01 00:00:10")))
      q.processAllAvailable()
      // duplicate of key 1 in a LATER batch, still inside the watermark
      Topic.appendLines(topic, Seq(
        line(1, "2026-01-01 00:01:00"), line(3, "2026-01-01 00:01:30")))
      q.processAllAvailable()
      val keys = spark.sql("SELECT event_key FROM sdedup")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(keys === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionization: gap-based sessions close via event-time timeout") {
    val base = Files.createTempDirectory("graft-sess")
    val topic = s"$base/topic"
    Files.createDirectories(java.nio.file.Paths.get(topic))
    val sessions = Sessionize.sessions(
      parsed(topic).as[SessionEvent], gapMs = 30000L, watermarkDelay = "5 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("append")
      .option("checkpointLocation", s"$base/cp")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // user 1: two events 10s apart (one session), then 2min later a
      // third event (a new session); user 2: one event
      Topic.appendLines(topic, Seq(
        line(1, "2026-01-01 00:00:00"), line(1, "2026-01-01 00:00:10"),
        line(2, "2026-01-01 00:00:15")))
      q.processAllAvailable()
      Topic.appendLines(topic, Seq(line(1, "2026-01-01 00:02:00")))
      q.processAllAvailable()
      // push the watermark far past every session end + gap
      Topic.appendLines(topic, Seq(line(9, "2026-01-01 00:30:00")))
      q.processAllAvailable()
      Topic.appendLines(topic, Seq(line(9, "2026-01-01 00:31:00")))
      q.processAllAvailable()

      val rows = spark.sql(
        "SELECT user_id, session_start, session_end, events FROM sessions " +
          "WHERE user_id IN (1, 2) ORDER BY user_id, session_start")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getInt(3)))
      assert(rows.contains(
        (1L, "2026-01-01 00:00:00.0", "2026-01-01 00:00:10.0", 2)))
      assert(rows.contains(
        (1L, "2026-01-01 00:02:00.0", "2026-01-01 00:02:00.0", 1)))
      assert(rows.contains(
        (2L, "2026-01-01 00:00:15.0", "2026-01-01 00:00:15.0", 1)))
    } finally q.stop()
  }

  test("transformWithState sessions match the flatMapGroupsWithState ones") {
    val base = Files.createTempDirectory("graft-sess-tws")
    val topic = s"$base/topic"
    Files.createDirectories(java.nio.file.Paths.get(topic))
    // transformWithState requires the RocksDB state store provider
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sessions = SessionizeTws.sessions(
        parsed(topic).as[SessionEvent], gapMs = 30000L,
        watermarkDelay = "5 seconds")
      val q = sessions.writeStream
        .format("memory").queryName("sessions_tws").outputMode("append")
        .option("checkpointLocation", s"$base/cp")
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      try {
        // identical script to the flatMapGroupsWithState test: same
        // sessions must come out of the new-API processor
        Topic.appendLines(topic, Seq(
          line(1, "2026-01-01 00:00:00"), line(1, "2026-01-01 00:00:10"),
          line(2, "2026-01-01 00:00:15")))
        q.processAllAvailable()
        Topic.appendLines(topic, Seq(line(1, "2026-01-01 00:02:00")))
        q.processAllAvailable()
        Topic.appendLines(topic, Seq(line(9, "2026-01-01 00:30:00")))
        q.processAllAvailable()
        Topic.appendLines(topic, Seq(line(9, "2026-01-01 00:31:00")))
        q.processAllAvailable()

        val rows = spark.sql(
          "SELECT user_id, session_start, session_end, events " +
            "FROM sessions_tws WHERE user_id IN (1, 2) " +
            "ORDER BY user_id, session_start")
          .collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).toString,
            r.getTimestamp(2).toString, r.getInt(3)))
        assert(rows.contains(
          (1L, "2026-01-01 00:00:00.0", "2026-01-01 00:00:10.0", 2)))
        assert(rows.contains(
          (1L, "2026-01-01 00:02:00.0", "2026-01-01 00:02:00.0", 1)))
        assert(rows.contains(
          (2L, "2026-01-01 00:00:15.0", "2026-01-01 00:00:15.0", 1)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }
}
