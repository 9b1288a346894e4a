package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental change feed (`readChanges`) + commit history. */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = UpsertTable(spark,
    Files.createTempDirectory("graft-cf").toString)

  private def feed(t: UpsertTable, from: Long, to: Long) =
    t.readChanges(from, to)
      .select("id", "v", "_change_op", "_commit_version")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString),
        r.getString(2), r.getLong(3)))
      .toSet

  test("delta merges stream out as exact per-version row changes") {
    val t = tmp()
    t.merge(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      autoCreateKeys = Seq("id"))                                  // v1+v2 (create+merge)
    val v0 = t.currentSnapshot.get.version
    t.merge(Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), delta = true) // v0+1
    t.merge(Seq((1L, "gone")).toDF("id", "v").withColumn("__op", lit("d")),
      opCol = Some("__op"), delta = true)                             // v0+2
    val got = feed(t, v0, v0 + 2)
    assert(got === Set(
      (2L, Some("b2"), "u", v0 + 1),
      (3L, Some("c"), "u", v0 + 1),
      (1L, Some("gone"), "d", v0 + 2)))
    // sub-range: only the delete commit
    assert(feed(t, v0 + 1, v0 + 2).map(x => (x._1, x._3)) === Set(1L -> "d"))
  }

  test("compaction inside the range is transparent to the feed") {
    val t = tmp()
    t.merge(Seq((1L, "a")).toDF("id", "v"), autoCreateKeys = Seq("id"))
    val v0 = t.currentSnapshot.get.version
    // same key -> same bucket: base + delta stack up for compaction
    t.merge(Seq((1L, "a2")).toDF("id", "v"), delta = true)
    val before = feed(t, v0, v0 + 1)
    t.compact() // folds the delta out of the CURRENT snapshot
    assert(!t.hasDeltas)
    // the feed still serves from the per-version manifests
    assert(feed(t, v0, v0 + 1) === before)
    // and the compact commit itself contributes nothing
    assert(feed(t, v0, t.currentSnapshot.get.version) === before)
  }

  test("a full-rewrite merge inside the range fails loudly") {
    val t = tmp()
    t.merge(Seq((1L, "a")).toDF("id", "v"), autoCreateKeys = Seq("id"))
    val v0 = t.currentSnapshot.get.version
    t.merge(Seq((2L, "b")).toDF("id", "v")) // full merge: no deltas
    val e = intercept[IllegalStateException](t.readChanges(v0, v0 + 1))
    assert(e.getMessage.contains("merge"))
    // but a range that excludes it still works
    t.merge(Seq((3L, "c")).toDF("id", "v"), delta = true)
    assert(feed(t, v0 + 1, v0 + 2).map(_._1) === Set(3L))
  }

  test("feed rows align to the target-version schema across evolution") {
    val t = tmp()
    t.merge(Seq((1L, "a")).toDF("id", "v"), autoCreateKeys = Seq("id"))
    val v0 = t.currentSnapshot.get.version
    t.merge(Seq((2L, "b")).toDF("id", "v"), delta = true)
    t.merge(Seq((3L, "c", 9L)).toDF("id", "v", "extra"), delta = true)
    val rows = t.readChanges(v0, v0 + 2)
      .select("id", "extra", "_commit_version").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
    // the pre-evolution row surfaces with extra = null under the new schema
    assert(rows === Set((2L, None, v0 + 1), (3L, Some(9L), v0 + 2)))
  }

  test("history records one operation per version, newest first") {
    val t = tmp()
    t.merge(Seq((1L, "a")).toDF("id", "v"), autoCreateKeys = Seq("id"))
    t.merge(Seq((1L, "b")).toDF("id", "v"), delta = true)
    t.compact()
    t.cluster(Seq("id"))
    val ops = t.history().map(_._2)
    assert(ops === Seq("cluster", "compact", "delta-merge", "merge", "create"))
    assert(t.history().map(_._1) === t.history().map(_._1).sorted.reverse)
  }

  test("expired versions in the range are rejected") {
    val t = tmp()
    t.merge(Seq((1L, "a")).toDF("id", "v"), autoCreateKeys = Seq("id"))
    val v0 = t.currentSnapshot.get.version
    t.merge(Seq((2L, "b")).toDF("id", "v"), delta = true)
    t.merge(Seq((3L, "c")).toDF("id", "v"), delta = true)
    t.expireSnapshots(retentionMs = 0L) // only the current version survives
    intercept[IllegalArgumentException](t.readChanges(v0, v0 + 2))
  }
}
