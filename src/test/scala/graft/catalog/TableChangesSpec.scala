package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.UpsertTable

/** `table_changes('cat.ns.t', fromV [, toV])` — the SQL TVF over the
  * row-level change feed (Delta parity: the pure-SQL consumer's CDC
  * surface). The expansion must be byte-identical to the batch
  * [[UpsertTable.readChanges]] feed, honor the 2-arg current-version
  * default, and inherit the servability contract: expired versions and
  * non-delta data commits fail ANALYSIS loudly, never return an
  * incomplete feed.
  */
class TableChangesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse = {
    val wh = Files.createTempDirectory("graft-tvf-wh").toString
    spark.conf.set("spark.sql.catalog.graft_tc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_tc.warehouse", wh)
    Files.createDirectories(java.nio.file.Paths.get(wh, "cdc"))
    wh
  }

  private def mkTable(name: String): UpsertTable = {
    val t = UpsertTable(spark, s"$warehouse/cdc/$name")
    t.merge(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      autoCreateKeys = Seq("id"))
    t
  }

  test("TVF == batch readChanges over the same half-open range") {
    val t = mkTable("t1")
    val v0 = t.currentSnapshot.get.version
    t.merge(Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), delta = true)
    t.merge(Seq((1L, "x")).toDF("id", "v").withColumn("__op", lit("d")),
      opCol = Some("__op"), delta = true)

    val viaSql = spark.sql(
      s"SELECT * FROM table_changes('graft_tc.cdc.t1', $v0, ${v0 + 2}) " +
        "ORDER BY _commit_version, id").collect().toSeq
    val viaApi = t.readChanges(v0, v0 + 2)
      .orderBy("_commit_version", "id").collect().toSeq
    assert(viaSql === viaApi)
    assert(viaSql.nonEmpty)
  }

  test("2-arg form defaults toVersion to the current snapshot") {
    val t = mkTable("t2")
    val v0 = t.currentSnapshot.get.version
    t.merge(Seq((3L, "c")).toDF("id", "v"), delta = true)
    t.merge(Seq((4L, "d")).toDF("id", "v"), delta = true)
    val viaSql = spark.sql(
      s"SELECT id, v, _change_op, _commit_version FROM " +
        s"table_changes('graft_tc.cdc.t2', $v0) ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(viaSql === Seq((3L, "c"), (4L, "d")))
  }

  test("non-delta data commit in range fails analysis loudly") {
    val t = mkTable("t3")
    val v0 = t.currentSnapshot.get.version
    t.merge(Seq((3L, "c")).toDF("id", "v"), delta = true)
    // a FULL merge records no row-level deltas: range becomes unservable
    t.merge(Seq((4L, "d")).toDF("id", "v"))
    val vEnd = t.currentSnapshot.get.version
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('graft_tc.cdc.t3', $v0, $vEnd)")
    }
    assert(err.getMessage.contains("delta"),
      s"expected the servability error, got: ${err.getMessage}")
  }

  test("expired / unknown version range fails loudly") {
    val t = mkTable("t4")
    val vEnd = t.currentSnapshot.get.version
    val err = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM table_changes('graft_tc.cdc.t4', ${vEnd + 5}, ${vEnd + 9})")
    }
    assert(err.getMessage.nonEmpty)
  }

  test("unknown table / non-graft catalog / bad args fail loudly") {
    warehouse
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('graft_tc.cdc.nope', 0, 1)")
    }
    assert(e1.getMessage.contains("not found"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('spark_catalog.db.t', 0, 1)")
    }
    assert(e2.getMessage.contains("not a configured graft catalog"))
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('unqualified', 0, 1)")
    }
    assert(e3.getMessage.contains("fully qualified"))
    val e4 = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('graft_tc.cdc.t1', id, 1)")
    }
    assert(e4.getMessage.nonEmpty)
  }
}
