package graft.cdc

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.UpsertTable
import graft.streaming.Topic

/** The CDC-aware sink (SURVEY.md §2.1 S6; reference
  * connect-iceberg-sink.json:4-29): consumes serialized Debezium
  * envelopes, flattens them (the `DebeziumTransform` SMT role), routes
  * each record to `cdc.{source.table}_postgres`, auto-creates and
  * schema-evolves target tables, and applies upsert/delete by key —
  * all committed atomically per micro-batch.
  */
object CdcSink {

  /** Target table path for a source table — the `_cdc.target` routing
    * rule `cdc.{table}_postgres` (connect-iceberg-sink.json:10-11).
    */
  def targetPath(warehouseDir: String, table: String): String =
    s"$warehouseDir/cdc/${table}_postgres"

  /** Apply one batch of serialized envelope JSON (`value STRING`) to
    * the per-table upsert stores.
    *
    * Pipeline per record: extract op / source.table / (lsn, txId)
    * ordering / row image (`after`, or `before` for deletes) with
    * `get_json_object`; group by target table; per table infer the
    * payload schema (`spark.read.json` — the sink's auto-create
    * inference), `from_json`-parse, flatten `row.*`, convert any
    * declared Debezium MicroTimestamp columns, and CDC-merge.
    *
    * Scale notes: the only driver-side materialization is the distinct
    * table list (bounded by the schema's table count, like the
    * connector's own per-table writers); each table's merge is a
    * bucketed rewrite touching only affected buckets.
    *
    * @param microTsCols per-table columns carried as
    *   io.debezium.time.MicroTimestamp (epoch micros int64) to convert
    *   to real timestamps on materialize (FIXTURES.md §3 `created_at`)
    */
  def applyBatch(
      spark: SparkSession,
      raw: DataFrame,
      warehouseDir: String,
      keyColsFor: String => Seq[String],
      microTsCols: Map[String, Seq[String]] = Map.empty,
      streamId: Option[String] = None,
      batchId: Option[Long] = None): Unit = {
    val meta = raw.select(
      get_json_object(col("value"), "$.op").as("__op"),
      get_json_object(col("value"), "$.source.table").as("__table"),
      expr("try_cast(get_json_object(value, '$.source.lsn') AS BIGINT)").as("__lsn"),
      expr("try_cast(get_json_object(value, '$.source.txId') AS BIGINT)").as("__txid"),
      when(get_json_object(col("value"), "$.op") === "d",
        get_json_object(col("value"), "$.before"))
        .otherwise(get_json_object(col("value"), "$.after")).as("__payload"))
      .where(col("__op").isNotNull && col("__table").isNotNull
        && col("__payload").isNotNull)
      .cache()
    try {
      // per-record dynamic routing; table count is bounded (the
      // connector's topics.regex match list), so collecting it is safe
      val tables = meta.select("__table").distinct().collect().map(_.getString(0))
      tables.sorted.foreach { table =>
        val rows = meta.where(col("__table") === table)
        val payloadSchema = spark.read
          .json(rows.select("__payload").as(Encoders.STRING)).schema
        val flattened = rows
          .withColumn("__row", from_json(col("__payload"), payloadSchema))
          .select(col("__row.*"), col("__op"),
            struct(col("__lsn"), col("__txid")).as("__ord"))
        val converted = microTsCols.getOrElse(table, Seq.empty)
          .foldLeft(flattened) { (df, c) =>
            if (df.columns.contains(c)) df.withColumn(c, timestamp_micros(col(c)))
            else df
          }
        UpsertTable(spark, targetPath(warehouseDir, table)).merge(
          converted,
          opCol = Some("__op"),
          orderCol = Some("__ord"),
          streamId = streamId,
          batchId = batchId,
          autoCreateKeys = keyColsFor(table))
      }
    } finally meta.unpersist()
  }
}

/** Standing CDC ingestion query (the Kafka-Connect sink task role):
  * envelope topic → [[CdcSink.applyBatch]] per micro-batch, with the
  * same checkpoint/trigger/commit cycle as [[graft.streaming.IngestJob]]
  * (10 s cadence, connect-iceberg-sink.json:15).
  */
case class CdcJob(
    topicDir: String,
    warehouseDir: String,
    checkpointDir: String,
    keyColsFor: String => Seq[String],
    microTsCols: Map[String, Seq[String]] = Map.empty,
    trigger: Trigger = Trigger.ProcessingTime("10 seconds")) {

  def start(spark: SparkSession): StreamingQuery =
    Topic.stream(spark, topicDir).writeStream
      .queryName(s"cdc:$topicDir")
      .foreachBatch { (b: DataFrame, id: Long) =>
        CdcSink.applyBatch(spark, b, warehouseDir, keyColsFor, microTsCols,
          streamId = Some(checkpointDir), batchId = Some(id))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
