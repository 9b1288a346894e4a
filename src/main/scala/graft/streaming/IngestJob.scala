package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

import graft.store.UpsertTable

/** One parsed field of the raw JSON payload: extract `$.name`, cast to
  * `sqlType` with NULL-on-error (reference JSON_VALUE + CAST,
  * flink_json_to_iceberg.py:113-114).
  *
  * @param maxLength source-DDL length constraint (`VARCHAR(255)`,
  *                  000_init.sql:5,11): longer values are dropped by
  *                  the ingest validation
  * @param required  source-DDL `NOT NULL`: rows with a NULL value are
  *                  dropped (the key field is always required)
  */
case class JsonField(name: String, sqlType: String,
    maxLength: Option[Int] = None, required: Boolean = false)

/** The streaming-ingest pipeline of the reference's Flink job
  * (flink_json_to_iceberg.py:95-147), Spark-native: a file-backed
  * topic streamed through extract/cast/filter/stamp into an
  * [[UpsertTable]] via `foreachBatch`, with 10 s processing-time
  * trigger, checkpointed offsets, idempotent batchId commits (C4) and
  * a fixed-delay restart policy (C5, flink-conf.yaml:6-13).
  *
  * @param topicDir       source topic directory (S1)
  * @param tablePath      target upsert table location (S5)
  * @param keyField       primary key; rows with NULL key are dropped
  *                       (P6, py:117)
  * @param fields         JSON fields to extract (P2/P3)
  * @param checkpointDir  offset WAL (exactly-once with the store's
  *                       batchId guard)
  * @param transform      hook applied to each micro-batch before the
  *                       merge (the SMT slot; also lets tests inject
  *                       failures to exercise the restart policy)
  * @param deltaMerges    commit micro-batches as merge-on-read DELTA
  *                       files (O(batch) per 10 s trigger — at 100 TB
  *                       a random-key stream must not rewrite every
  *                       touched bucket each commit) instead of
  *                       merge-on-write bucket rewrites
  * @param compactEvery   with `deltaMerges`, fold deltas back into
  *                       base every N micro-batches (0 = never; run
  *                       [[graft.store.Maintenance.compactAll]]
  *                       instead). Compaction is idempotent, so a
  *                       crash between merge and compact is safe.
  */
case class IngestJob(
    topicDir: String,
    tablePath: String,
    keyField: String,
    fields: Seq[JsonField],
    checkpointDir: String,
    trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
    transform: DataFrame => DataFrame = identity,
    deltaMerges: Boolean = false,
    compactEvery: Int = 0) {

  /** The P1-P4+P6 projection/filter over a raw `value STRING` frame —
    * shared verbatim by the streaming path and batch replay, so the
    * two provably compute the same function of the topic contents.
    */
  def parse(raw: DataFrame): DataFrame = {
    val extracted = fields.map { f =>
      expr(s"try_cast(get_json_object(value, '$$.${f.name}') AS ${f.sqlType})")
        .as(f.name)
    }
    val constraints = fields.flatMap { f =>
      // NULL passes a length constraint (it's the NOT-NULL check's job)
      f.maxLength.map(n =>
        col(f.name).isNull || length(col(f.name)) <= n).toSeq ++
        (if (f.required) Seq(col(f.name).isNotNull) else Nil)
    }
    constraints.foldLeft(
      raw
        .select(extracted :+ col("__file"): _*)
        .withColumn("ts", current_timestamp()) // P4 ingestion stamp
        .where(col(keyField).isNotNull)
    )((df, c) => df.where(c))
  }

  private def mergeBatch(spark: SparkSession, batch: DataFrame, batchId: Long): Unit = {
    // Arrival order inside the micro-batch ≙ Kafka offset: file
    // sequence first (producer-assigned), then block offset within the
    // file (splits of one large file are packed into partitions in
    // size order, not offset order), then the monotonic id (increasing
    // in row order inside each split).
    // __ord is stamped BEFORE the user transform: a transform that
    // shuffles/repartitions would otherwise scatter rows so the
    // monotonic id no longer reflects arrival order within a split,
    // silently making last-wins nondeterministic for duplicate keys
    val ordered = transform(batch
      .withColumn("__ord", struct(col("__file"), monotonically_increasing_id())))
      .drop("__file")
    val table = UpsertTable(spark, tablePath)
    table.merge(
      ordered,
      orderCol = Some("__ord"),
      streamId = Some(checkpointDir),
      batchId = Some(batchId),
      autoCreateKeys = Seq(keyField),
      delta = deltaMerges)
    if (deltaMerges && compactEvery > 0 && batchId > 0 &&
        batchId % compactEvery == 0) {
      table.compact()
    }
  }

  /** Start the standing INSERT INTO (py:119): one continuous
    * StreamingQuery committing a store snapshot per micro-batch.
    */
  def start(spark: SparkSession): StreamingQuery =
    parse(Topic.stream(spark, topicDir)).writeStream
      .queryName(s"ingest:$topicDir")
      .foreachBatch { (b: DataFrame, id: Long) => mergeBatch(spark, b, id) }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Batch replay of the same pipeline (the q9 shape): the oracle the
    * streaming result must equal, minus the wall-clock `ts` column.
    */
  def replayBatch(spark: SparkSession): DataFrame = {
    // same stamping-then-transform order as the streaming path — a
    // non-identity transform must be part of the replayed function too
    val parsed = transform(parse(Topic.readAll(spark, topicDir))
      .withColumn("__ord", struct(col("__file"), monotonically_increasing_id())))
    import org.apache.spark.sql.expressions.Window
    parsed
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyField).orderBy(col("__ord").desc)))
      .where(col("__rn") === 1)
      .drop("__rn", "__ord", "__file")
  }

  /** Fixed-delay restart policy (C5; flink-conf.yaml: fixed-delay,
    * 999 attempts, 10 s). Blocks until the query stops cleanly or
    * attempts are exhausted (then rethrows the last failure).
    */
  def runWithRestarts(spark: SparkSession, maxAttempts: Int = 999,
      delayMs: Long = 10000L): Unit = {
    require(maxAttempts > 0, s"maxAttempts must be positive, got $maxAttempts")
    var attempt = 0
    var lastError: Throwable = null
    while (attempt < maxAttempts) {
      try {
        // start() inside the try: a failure during query STARTUP
        // (checkpoint dir briefly locked after a crash, source listing
        // hiccup) must consume an attempt, not bypass the policy
        val q = start(spark)
        q.awaitTermination()
        return // clean stop
      } catch {
        case e: Throwable =>
          lastError = e
          attempt += 1
          if (attempt < maxAttempts) Thread.sleep(delayMs)
      }
    }
    throw lastError
  }
}

/** C7 heartbeat/liveness (reference 1 s Debezium heartbeats +
  * Connect progress): records streaming progress events; `last` gives
  * the most recent progress for monitoring.
  */
class HeartbeatListener extends StreamingQueryListener {
  private val lastProgress =
    new AtomicReference[Option[StreamingQueryListener.QueryProgressEvent]](None)
  @volatile var progressCount: Long = 0L

  def last: Option[StreamingQueryListener.QueryProgressEvent] = lastProgress.get()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    progressCount += 1
    lastProgress.set(Some(e))
  }
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
