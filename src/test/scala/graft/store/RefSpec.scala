package graft.store

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Named refs (Iceberg-style tags + branches) on the store: creation
  * and pinning semantics, tag immutability, monotonic fast-forward,
  * ref-protected snapshot expiry, and drop-then-expire. q372's gate
  * only sees closed-form counts + booleans; the mechanics are proven
  * here.
  */
class RefSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fresh(): UpsertTable = {
    val t = UpsertTable(spark,
      Files.createTempDirectory("graft-ref").toString)
    t.create(schema, Seq("id"), numBuckets = 2)
    t.merge(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), delta = true)
    t
  }

  test("tags pin a version across later commits; branches fast-forward") {
    val t = fresh()
    val v1 = t.currentSnapshot.get.version
    t.createTag("baseline")
    t.createBranch("main")
    t.merge(Seq((3L, "c")).toDF("id", "v"), delta = true)
    // both refs still read v1's two rows; head reads three
    assert(t.readRef("baseline").count() === 2)
    assert(t.readRef("main").count() === 2)
    assert(t.read().count() === 3)
    t.fastForward("main")
    assert(t.readRef("main").count() === 3)
    assert(t.refVersion("baseline") === v1)
    assert(t.refs().map(r => (r.name, r.kind)) ===
      Seq(("baseline", "tag"), ("main", "branch")))
  }

  test("tags are immutable, duplicates refused, fast-forward is monotonic") {
    val t = fresh()
    t.createTag("pin")
    t.createBranch("dev")
    intercept[IllegalArgumentException](t.createTag("pin"))
    intercept[IllegalArgumentException](t.fastForward("pin"))
    t.merge(Seq((9L, "z")).toDF("id", "v"), delta = true)
    t.fastForward("dev")
    val head = t.currentSnapshot.get.version
    intercept[IllegalArgumentException](
      t.fastForward("dev", Some(head - 1)))
    intercept[IllegalArgumentException](t.createBranch("bad name!"))
    intercept[IllegalStateException](t.readRef("nope"))
  }

  test("table_ref TVF reads through refs from pure SQL; missing refs fail analysis") {
    val wh = Files.createTempDirectory("graft-ref-wh").toString
    spark.conf.set("spark.sql.catalog.graft_rf",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_rf.warehouse", wh)
    Files.createDirectories(java.nio.file.Paths.get(wh, "ns"))
    val t = UpsertTable(spark, s"$wh/ns/t1")
    t.create(schema, Seq("id"), numBuckets = 2)
    t.merge(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), delta = true)
    t.createBranch("main")
    t.merge(Seq((3L, "c")).toDF("id", "v"), delta = true)
    // SQL through the ref sees the published 2 rows; the catalog
    // identifier sees the head's 3
    assert(spark.sql(
      "SELECT * FROM table_ref('graft_rf.ns.t1', 'main')").count() === 2)
    assert(spark.sql("SELECT * FROM graft_rf.ns.t1").count() === 3)
    t.fastForward("main")
    assert(spark.sql(
      "SELECT * FROM table_ref('graft_rf.ns.t1', 'main')").count() === 3)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM table_ref('graft_rf.ns.t1', 'nope')"))
    assert(e.getMessage.contains("no ref"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM table_ref('graft_rf.ns.t1')"))
    assert(e2.getMessage.contains("usage"), e2.getMessage)
  }

  test("expiry honors ref pins; dropping the ref releases the version") {
    val t = fresh()
    val v1 = t.currentSnapshot.get.version
    t.createTag("keep")
    t.merge(Seq((3L, "c")).toDF("id", "v"), delta = true)
    t.merge(Seq((4L, "d")).toDF("id", "v"), delta = true)
    t.expireSnapshots(retentionMs = 0L)
    // v1 is pinned -> still readable; the unpinned middle version is gone
    assert(t.readRef("keep").count() === 2)
    val left = SnapshotLog.listVersions(t.location)
    assert(left.contains(v1), s"pinned v$v1 expired: $left")
    assert(left.size === 2, s"unpinned middle version must expire: $left")
    assert(t.dropRef("keep"))
    t.expireSnapshots(retentionMs = 0L)
    assert(!SnapshotLog.listVersions(t.location).contains(v1),
      "dropping the ref must make its version expirable")
    assert(!t.dropRef("keep"), "second drop reports absence")
  }
}
