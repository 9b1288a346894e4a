package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.UpsertTable

/** End-to-end streaming ingest (SURVEY.md §7.1 step 3, VERDICT r1 #1):
  * topic appends mid-stream, a kill + restart through the same
  * checkpoint, and a final state equal to batch replay — the
  * exactly-once contract of the reference's 10 s checkpoint/commit
  * cycle (flink_json_to_iceberg.py:95-147, flink-conf.yaml).
  */
class IngestJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val accountFields =
    Seq(JsonField("user_id", "INT"), JsonField("email", "STRING"))

  private def mkJob(trigger: Trigger = Trigger.ProcessingTime("100 milliseconds"),
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        identity): IngestJob = {
    val base = Files.createTempDirectory("graft-ingest")
    IngestJob(
      topicDir = s"$base/topic",
      tablePath = s"$base/table",
      keyField = "user_id",
      fields = accountFields,
      checkpointDir = s"$base/checkpoint",
      trigger = trigger,
      transform = transform)
  }

  private def state(job: IngestJob): Set[(Int, String)] =
    UpsertTable(spark, job.tablePath).read()
      .select("user_id", "email").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet

  test("stream -> kill -> append while down -> restart == batch replay (exactly-once)") {
    val job = mkJob()
    val t0 = new Timestamp(System.currentTimeMillis() - 1000)

    // seed: 3 good records + malformed JSON + non-numeric key (both dropped, P6)
    Topic.appendLines(job.topicDir, Seq(
      """{"user_id": 1, "email": "alice@example.com"}""",
      """{"user_id": 2, "email": "bob@example.com"}""",
      """{"user_id": 3, "email": "carol@example.com"}""",
      """not json at all""",
      """{"user_id": "oops", "email": "bad@example.com"}"""))

    val q1 = job.start(spark)
    q1.processAllAvailable()
    assert(state(job) === Set(1 -> "alice@example.com", 2 -> "bob@example.com",
      3 -> "carol@example.com"))

    // mid-stream append: update user 1, insert user 4
    Topic.appendLines(job.topicDir, Seq(
      """{"user_id": 1, "email": "alice+new@example.com"}""",
      """{"user_id": 4, "email": "derek@example.com"}"""))
    q1.processAllAvailable()
    assert(state(job)(1 -> "alice+new@example.com") && state(job).size === 4)

    q1.stop() // the kill

    // appends while the query is down
    Topic.appendLines(job.topicDir, Seq(
      """{"user_id": 2, "email": "bob+v2@example.com"}""",
      """{"user_id": 5, "email": "emily@example.com"}"""))

    val q2 = job.start(spark) // restart from the same checkpoint
    q2.processAllAvailable()
    q2.stop()

    val expected = Set(
      1 -> "alice+new@example.com", 2 -> "bob+v2@example.com",
      3 -> "carol@example.com", 4 -> "derek@example.com",
      5 -> "emily@example.com")
    assert(state(job) === expected)

    // equal to batch replay of the same topic through the same pipeline
    val replay = job.replayBatch(spark)
      .select("user_id", "email").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(replay === expected)

    // P4: ingestion-time stamps fall inside the run's wall-clock window
    val t1 = new Timestamp(System.currentTimeMillis() + 1000)
    val tsVals = UpsertTable(spark, job.tablePath).read()
      .select("ts").collect().map(_.getTimestamp(0))
    assert(tsVals.forall(ts => !ts.before(t0) && !ts.after(t1)))
  }

  test("last-wins inside a single batch for a duplicated key") {
    val job = mkJob(trigger = Trigger.AvailableNow())
    Topic.appendLines(job.topicDir, Seq(
      """{"user_id": 7, "email": "v1@example.com"}""",
      """{"user_id": 7, "email": "v2@example.com"}"""))
    Topic.appendLines(job.topicDir, Seq(
      """{"user_id": 7, "email": "v3@example.com"}"""))
    val q = job.start(spark)
    q.awaitTermination()
    assert(state(job) === Set(7 -> "v3@example.com"))
  }

  test("DDL constraints: VARCHAR(255)-style length and NOT NULL drop rows") {
    val base = Files.createTempDirectory("graft-constr")
    val job = IngestJob(
      topicDir = s"$base/topic", tablePath = s"$base/table",
      keyField = "user_id",
      fields = Seq(JsonField("user_id", "INT"),
        JsonField("email", "STRING", maxLength = Some(20), required = true)),
      checkpointDir = s"$base/cp", trigger = Trigger.AvailableNow())
    Topic.appendLines(job.topicDir, Seq(
      """{"user_id": 1, "email": "ok@example.com"}""",
      """{"user_id": 2, "email": "this-address-is-far-too-long@example.com"}""",
      """{"user_id": 3}"""))
    val q = job.start(spark)
    q.awaitTermination()
    assert(state(job) === Set(1 -> "ok@example.com"))
  }

  test("account + product pipelines run concurrently (the reference's dual job)") {
    // flink_json_to_iceberg.py drives raw_json_account AND
    // raw_json_product as two standing INSERTs in one job — here two
    // StreamingQueries in one session, fully independent state
    val base = Files.createTempDirectory("graft-dual")
    val accountJob = IngestJob(s"$base/t_acc", s"$base/tbl_acc", "user_id",
      accountFields, s"$base/cp_acc",
      trigger = Trigger.ProcessingTime("100 milliseconds"))
    val productJob = IngestJob(s"$base/t_prod", s"$base/tbl_prod", "product_id",
      Seq(JsonField("product_id", "INT"), JsonField("product_name", "STRING")),
      s"$base/cp_prod", trigger = Trigger.ProcessingTime("100 milliseconds"))
    Topic.appendLines(accountJob.topicDir, Seq(
      """{"user_id": 1, "email": "alice@example.com"}"""))
    Topic.appendLines(productJob.topicDir, Seq(
      """{"product_id": 1, "product_name": "Live Edge Dining Table"}""",
      """{"product_id": 2, "product_name": "Simple Teak Dining Chair"}"""))
    val q1 = accountJob.start(spark)
    val q2 = productJob.start(spark)
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(state(accountJob) === Set(1 -> "alice@example.com"))
      val products = UpsertTable(spark, productJob.tablePath).read()
        .select("product_id", "product_name").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      assert(products === Set(1 -> "Live Edge Dining Table",
        2 -> "Simple Teak Dining Chair"))
    } finally { q1.stop(); q2.stop() }
  }

  test("restart policy retries a failing query until it succeeds (C5)") {
    val attempts = new AtomicInteger(0)
    val job0 = mkJob(trigger = Trigger.AvailableNow())
    val job = job0.copy(transform = df => {
      if (attempts.incrementAndGet() == 1)
        throw new RuntimeException("injected transient failure")
      df
    })
    Topic.appendLines(job.topicDir, Seq(
      """{"user_id": 1, "email": "a@example.com"}"""))
    job.runWithRestarts(spark, maxAttempts = 5, delayMs = 50L)
    assert(attempts.get() >= 2)
    assert(state(job) === Set(1 -> "a@example.com"))
  }

  test("heartbeat listener observes progress (C7)") {
    val listener = new HeartbeatListener
    spark.streams.addListener(listener)
    try {
      val job = mkJob()
      Topic.appendLines(job.topicDir, Seq(
        """{"user_id": 1, "email": "a@example.com"}"""))
      val q = job.start(spark)
      q.processAllAvailable()
      // progress events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (listener.progressCount == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      q.stop()
      assert(listener.progressCount > 0)
      assert(listener.last.nonEmpty)
    } finally spark.streams.removeListener(listener)
  }

  test("producer sink round-trip: to_json produce -> stream ingest (S4/P8)") {
    import spark.implicits._
    val job = mkJob(trigger = Trigger.AvailableNow())
    val df = Seq((10, "x@example.com"), (11, "y@example.com"))
      .toDF("user_id", "email")
    Topic.produce(df, job.topicDir)
    val q = job.start(spark)
    q.awaitTermination()
    assert(state(job) === Set(10 -> "x@example.com", 11 -> "y@example.com"))
  }

  test("producing a single value STRING column passes records through raw") {
    import spark.implicits._
    val job = mkJob(trigger = Trigger.AvailableNow())
    // already-serialized records (the Kafka-producer contract): no
    // second {"value":"..."} wrapping
    val df = Seq("""{"user_id":20,"email":"a@b.c"}""",
      """{"user_id":21,"email":"d@e.f"}""").toDF("value")
    Topic.produce(df, job.topicDir)
    val q = job.start(spark)
    q.awaitTermination()
    assert(state(job) === Set(20 -> "a@b.c", 21 -> "d@e.f"))
  }
}
