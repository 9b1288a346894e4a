package graft.cdc

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.UpsertTable

/** The S3 JDBC snapshot path, end-to-end against a REAL database:
  * embedded Derby (the JDBC driver the Spark distribution bundles) —
  * no fixture parquet stand-in. Partitioned range reads + the
  * snapshot-below-tail ordering handoff are the two contracts.
  */
class JdbcSnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def seedDb(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE customers")
      catch { case _: java.sql.SQLException => () } // first run
      st.execute(
        "CREATE TABLE customers (id BIGINT PRIMARY KEY, " +
          "name VARCHAR(32), balance BIGINT)")
      val ps = conn.prepareStatement(
        "INSERT INTO customers VALUES (?, ?, ?)")
      (1L to 100L).foreach { i =>
        ps.setLong(1, i); ps.setString(2, s"cust-$i"); ps.setLong(3, i * 10)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
  }

  test("partitioned JDBC snapshot reads every row across parallel ranges") {
    seedDb()
    val snap = ChangelogSource.jdbcSnapshot(spark, url, "customers",
      partitionColumn = Some("id"), lowerBound = Some(1L),
      upperBound = Some(101L), numPartitions = 4)
    // 4 parallel range reads, not one connection
    assert(snap.rdd.getNumPartitions === 4)
    val rows = snap.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rows.length === 100)
    assert(rows.head === ((1L, "cust-1", 10L)))
    assert(rows.last === ((100L, "cust-100", 1000L)))
  }

  test("unpartitioned bounds-less read requires no bounds, partitioned does") {
    seedDb()
    assert(ChangelogSource.jdbcSnapshot(spark, url, "customers")
      .count() === 100)
    val e = intercept[IllegalArgumentException] {
      ChangelogSource.jdbcSnapshot(spark, url, "customers",
        partitionColumn = Some("id"))
    }
    assert(e.getMessage.contains("lowerBound"))
  }

  test("snapshot lands as op-r below the tail: tail events supersede") {
    seedDb()
    val dir = Files.createTempDirectory("graft-jdbc-snap").toString
    val snap = ChangelogSource.jdbcSnapshot(spark, url, "customers",
      partitionColumn = Some("id"), lowerBound = Some(1L),
      upperBound = Some(101L), numPartitions = 4)
      .select(col("ID").as("id"), col("NAME").as("name"),
        col("BALANCE").as("balance"))
    ChangelogSource.applySnapshot(spark, snap, dir, keys = Seq("id"))
    val t = UpsertTable(spark, dir)
    assert(t.read().count() === 100)
    // a WAL tail event for id 7 at any positive LSN must win over the
    // snapshot image (snapshot ordering key is (0, 0))
    val tail = Seq((7L, "cust-7-updated", 999L, "u"))
      .toDF("id", "name", "balance", "__op")
      .withColumn("__ord", struct(lit(5L).as("__lsn"), lit(1L).as("__txid")))
    t.merge(tail, opCol = Some("__op"), orderCol = Some("__ord"))
    val got = t.read().where(col("id") === 7L).collect().head
    assert(got.getString(1) === "cust-7-updated" && got.getLong(2) === 999L)
  }
}
