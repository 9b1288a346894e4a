package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  * One parquet file per table under `sfDir`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // `events.ts` is parquet TIMESTAMP(NANOS) which Spark rejects by
    // default (PARQUET_TYPE_ILLEGAL); read it as a nanos LongType
    // instead. This also makes changelog ordering exact — no µs
    // truncation ties — matching the DuckDB oracle's ns ordering.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
