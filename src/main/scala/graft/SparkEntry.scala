package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{CurationQueries, PipelineQueries}
import graft.queries.{AnalyticsQueries, ReferenceQueries, StoreQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2) to runnable DataFrame
  * pipelines over a testdata dir; `oracleSql` carries a DuckDB-dialect
  * equivalent for hash-compare. Column names + row order match between
  * the two on purpose — the driver sorts columns by name and hashes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Upsert materialization (changelog-normalize, SURVEY.md §2.3 C1) —
    * the heart of the reference's capability.
    */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.queries("q5_upsert_latest")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * LLM-training-data pipeline surface (dedup/similarity/text). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ PipelineQueries.queries ++
      StoreQueries.queries ++ AnalyticsQueries.queries ++
      CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSql ++ PipelineQueries.oracleSql ++
      StoreQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      CurationQueries.oracleSql
}
