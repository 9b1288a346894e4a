package graft.cdc

import org.apache.spark.sql.types._

/** The Debezium change-event envelope (FIXTURES.md §3; captured from
  * the reference's `cdc.commerce.account` topic log, schema
  * `cdc.commerce.account.Envelope` version 2).
  *
  * `before`/`after` carry the row image (null per op semantics);
  * `source` carries provenance incl. the (lsn, txId) replay-ordering
  * key that the reference's connector flushes as offsets
  * (data/kafka/tmp/connect.offsets).
  */
object Envelope {

  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType), // io.debezium.data.Enum ≙ string
    StructField("db", StringType),
    StructField("sequence", StringType),
    StructField("ts_us", LongType),
    StructField("ts_ns", LongType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("txId", LongType),
    StructField("lsn", LongType),
    StructField("xmin", LongType)))

  val transactionSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("total_order", LongType),
    StructField("data_collection_order", LongType)))

  /** Full envelope for a known row-payload schema (typed parse path). */
  def schema(payload: StructType): StructType = StructType(Seq(
    StructField("before", payload),
    StructField("after", payload),
    StructField("source", sourceSchema),
    StructField("transaction", transactionSchema),
    StructField("op", StringType), // r | c | u | d
    StructField("ts_ms", LongType),
    StructField("ts_us", LongType),
    StructField("ts_ns", LongType)))
}
