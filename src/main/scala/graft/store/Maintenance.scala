package graft.store

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Warehouse maintenance (the reference's snapshot_mgmt.py role):
  * enumerate every store table under a namespace and expire snapshots
  * older than the retention — the Spark-native analog of
  * `ALTER TABLE … EXECUTE expire_snapshots(retention_threshold => '6h')`
  * run over the filtered table list (snapshot_mgmt.py:13-18).
  */
object Maintenance {

  /** Default retention: 6 hours (snapshot_mgmt.py:18). */
  val DefaultRetentionMs: Long = 6L * 3600 * 1000

  /** Store tables (dirs with a `_snapshots` log) under
    * `{warehouseDir}/{namespace}`.
    */
  def listTables(warehouseDir: String, namespace: String): Seq[String] =
    graft.Fs.children(Paths.get(warehouseDir, namespace))
      .filter(p => Files.isDirectory(p.resolve("_snapshots")))
      .map(_.getFileName.toString)
      .sorted

  /** Expire old snapshots on every table in the namespace; returns
    * (table, versions removed) per table.
    */
  def expireAll(spark: SparkSession, warehouseDir: String, namespace: String,
      retentionMs: Long = DefaultRetentionMs): Seq[(String, Int)] =
    listTables(warehouseDir, namespace).map { table =>
      val t = UpsertTable(spark, s"$warehouseDir/$namespace/$table")
      val before = SnapshotLog.listVersions(t.location).size
      t.expireSnapshots(retentionMs)
      val after = SnapshotLog.listVersions(t.location).size
      table -> (before - after)
    }

  /** Orphan-file GC on every table in the namespace (crash leftovers
    * from unpublished commit attempts — see
    * [[UpsertTable.removeOrphanFiles]]); returns (table, files
    * removed) per table.
    */
  def gcAll(spark: SparkSession, warehouseDir: String, namespace: String,
      olderThanMs: Long = UpsertTable.OrphanGcDefaultMs,
      allowShortRetention: Boolean = false): Seq[(String, Int)] =
    listTables(warehouseDir, namespace).map { table =>
      table -> UpsertTable(spark, s"$warehouseDir/$namespace/$table")
        .removeOrphanFiles(olderThanMs, allowShortRetention).size
    }

  /** Collapse merge-on-read deltas / small files on every table in
    * the namespace (the other half of the maintenance loop a
    * 10 s-commit ingest needs, next to [[expireAll]]); returns
    * (table, buckets compacted) per table.
    */
  def compactAll(spark: SparkSession, warehouseDir: String, namespace: String,
      maxFilesPerBucket: Int = 1): Seq[(String, Int)] =
    listTables(warehouseDir, namespace).map { table =>
      table -> UpsertTable(spark, s"$warehouseDir/$namespace/$table")
        .compact(maxFilesPerBucket)
    }

  /** Z-order every table in the namespace that has all `zCols` (other
    * tables are skipped, returned with `clustered = false`) — the
    * scheduled layout-optimization sweep next to [[compactAll]].
    */
  def clusterAll(spark: SparkSession, warehouseDir: String, namespace: String,
      zCols: Seq[String], maxRowsPerFile: Long = 1L << 20)
      : Seq[(String, Boolean)] =
    listTables(warehouseDir, namespace).map { table =>
      val t = UpsertTable(spark, s"$warehouseDir/$namespace/$table")
      val applicable = zCols.forall(t.schema.fieldNames.contains)
      if (applicable) t.cluster(zCols, maxRowsPerFile)
      table -> applicable
    }
}
