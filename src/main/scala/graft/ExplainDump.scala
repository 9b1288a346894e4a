package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print `explain("formatted")` for named SparkEntry queries
  * (plan audits beyond the PlanShapeSpec string asserts).
  * `sbt "runMain graft.ExplainDump q40_pack_chunks q45_range_join"`
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
