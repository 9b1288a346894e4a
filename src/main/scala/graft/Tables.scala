package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  * One parquet file per table under `sfDir`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // `events.ts` has shipped in two physical encodings across testdata
  // generations: parquet TIMESTAMP(NANOS) (reads as a nanos LongType
  // under `spark.sql.legacy.parquet.nanosAsLong=true`, which sessions
  // set at build time — see Verify/Bench/TestSpark) and parquet
  // TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ). The engine's changelog
  // ordering, sessionization, and range joins all operate on a
  // ns-epoch long — the finest precision either encoding carries — so
  // the loader normalizes the µs form to ns here. Sessions run with
  // spark.sql.session.timeZone=UTC, making the NTZ→LTZ cast the
  // identity on the stored instant. Session-global confs are
  // intentionally NOT set here: a library loader must not flip
  // session behavior.
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType != LongType) {
      // fail LOUDLY on a non-UTC session: the NTZ→LTZ cast below would
      // silently shift every instant by the zone offset — corrupting
      // day buckets, session gaps, and as-of joins with no error
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"events.ts µs→ns normalization requires spark.sql.session.timeZone=UTC, got '$tz'")
      df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    } else df
  }
}
