package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.UpsertTable
import graft.streaming.Topic

/** Snapshot-then-tail changelog source (SURVEY.md §2.1 S2): the
  * Debezium connector's startup contract — an initial consistent
  * snapshot of the source table (every row emitted as op `r`),
  * followed by the streaming WAL tail of `c`/`u`/`d` envelopes
  * (connect-postgres-source.json; captured `op:"r"` snapshot events in
  * the reference's topic logs).
  *
  * Natively: the snapshot is a batch read merged first (one bulk
  * `r`-batch, ordering key below any tail LSN), then the envelope
  * topic is tailed by a standing [[CdcJob]]-style query. The store's
  * last-wins merge makes the handoff safe: tail events at or after the
  * snapshot LSN simply re-apply. The tail consumes both bare envelopes
  * and the reference's actual Kafka-Connect `{"schema",…,"payload":…}`
  * framing, tombstones included (see [[CdcSink.applyBatch]]).
  */
object ChangelogSource {

  /** Apply the initial snapshot: every row of `snapshot` lands as an
    * op-`r` upsert with ordering key (`snapshotLsn`, 0) — below every
    * tail event's (lsn, txId), like Debezium emitting the snapshot
    * before streaming begins.
    */
  def applySnapshot(
      spark: SparkSession,
      snapshot: DataFrame,
      tablePath: String,
      keys: Seq[String],
      snapshotLsn: Long = 0L): Unit = {
    val tagged = snapshot
      .withColumn("__op", lit("r"))
      .withColumn("__ord", struct(lit(snapshotLsn).as("__lsn"),
        lit(0L).as("__txid")))
    UpsertTable(spark, tablePath).merge(
      tagged,
      opCol = Some("__op"),
      orderCol = Some("__ord"),
      autoCreateKeys = keys)
  }

  /** JDBC snapshot read — the real first touch of the CDC story: a
    * user points the source at the live database and bulk-loads the
    * initial consistent snapshot over JDBC before the WAL tail takes
    * over (Debezium's `snapshot.mode=initial`;
    * connect-postgres-source.json's database.* block).
    *
    * Scale contract: pass `partitionColumn` (the numeric PK) with its
    * bounds — Spark then issues `numPartitions` parallel range reads
    * (`WHERE pk >= lo AND pk < hi`), the JDBC analog of Debezium's
    * chunked incremental snapshot. An unpartitioned read funnels the
    * whole table through ONE connection — fine for dims, wrong for a
    * 100 TB fact snapshot, hence the loud require below.
    *
    * Tested in-sandbox against embedded Derby (the JDBC driver the
    * Spark distribution ships); Postgres is the same call with its
    * driver jar on the executor classpath — deployment config, not
    * code.
    */
  def jdbcSnapshot(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 8,
      connectionProperties: java.util.Properties =
        new java.util.Properties): DataFrame =
    partitionColumn match {
      case Some(pc) =>
        require(lowerBound.isDefined && upperBound.isDefined,
          "jdbcSnapshot: partitionColumn needs lowerBound/upperBound " +
            "(SELECT min(pk), max(pk) on the source is one cheap query)")
        spark.read.jdbc(url, table, pc, lowerBound.get, upperBound.get,
          numPartitions, connectionProperties)
      case None =>
        spark.read.jdbc(url, table, connectionProperties)
    }

  /** Snapshot-then-tail in one call: bulk-load the snapshot, then
    * start the standing envelope tail (returns the running query).
    */
  def start(
      spark: SparkSession,
      snapshots: Map[String, DataFrame], // source table -> snapshot rows
      topicDir: String,
      warehouseDir: String,
      checkpointDir: String,
      keyColsFor: String => Seq[String],
      microTsCols: Map[String, Seq[String]] = Map.empty,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    snapshots.foreach { case (table, df) =>
      applySnapshot(spark, df, CdcSink.targetPath(warehouseDir, table),
        keyColsFor(table))
    }
    CdcJob(topicDir, warehouseDir, checkpointDir, keyColsFor, microTsCols, trigger)
      .start(spark)
  }
}
