package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  * One parquet file per table under `sfDir`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // `events.ts` is parquet TIMESTAMP(NANOS) which Spark rejects by
  // default (PARQUET_TYPE_ILLEGAL); sessions must set
  // `spark.sql.legacy.parquet.nanosAsLong=true` at build time (see
  // Verify/Bench/TestSpark) so it reads as a nanos LongType. This also
  // makes changelog ordering exact — no µs truncation ties — matching
  // the DuckDB oracle's ns ordering. The conf is intentionally NOT set
  // here: a library loader must not flip session-global behavior.
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
