package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog-normalize (last-row-per-key, SURVEY.md §2.3 C1) as a
  * `max_by` aggregation rather than a `row_number` window.
  *
  * Why it matters at 100 TB: the window plan shuffles EVERY row to its
  * key's partition and sorts there — a skewed key concentrates its
  * whole history on one task. `max_by(struct(...), ord)` gets partial
  * aggregation (map-side combine): each input partition reduces to at
  * most one row per key before the exchange, so shuffle volume is
  * bounded by distinct keys per partition and hot keys reduce in
  * parallel. Ties on `ord` are broken arbitrarily (callers pass a
  * total order — offset/LSN — exactly like the window formulation).
  */
object ChangelogNormalize {

  /** Latest row per key by `ordCol` (dropped from the output). */
  def latestByKey(df: DataFrame, keys: Seq[String], ordCol: String): DataFrame = {
    val payload = struct(df.columns.toSeq.filterNot(_ == ordCol).map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, col(ordCol)).as("__row"))
      .select("__row.*")
  }
}
