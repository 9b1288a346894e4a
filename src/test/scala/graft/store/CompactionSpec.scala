package graft.store

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Targeted compaction of merge-on-read deltas: only over-threshold
  * buckets are collapsed, answers and history are untouched, manifest
  * stats survive, and the pure-base fast path is restored.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("compact collapses only over-threshold buckets, data unchanged") {
    val t = UpsertTable(spark, Files.createTempDirectory("graft-cp").toString)
    t.create(schema, Seq("id"), numBuckets = 2)
    // 5 delta commits over both buckets + a delete -> deltas deepen
    (0 until 5).foreach { i =>
      t.merge(Seq((i.toLong, s"v$i"), (100L + i, s"w$i")).toDF("id", "v"),
        delta = true)
    }
    t.merge(Seq((0L, "dead", "d"), (3L, "v3b", "u")).toDF("id", "v", "op"),
      opCol = Some("op"), delta = true)
    val before = t.currentSnapshot.get
    assert(before.files.count(FileEntry.isDelta) >= 5)
    val expected = t.read().orderBy("id").collect().toSeq
    assert(!expected.exists(_.getLong(0) == 0L), "tombstone must hide id=0")
    assert(expected.exists(r => r.getLong(0) == 3L && r.getString(1) == "v3b"))

    // threshold high enough that nothing qualifies -> no-op
    assert(t.compact(maxFilesPerBucket = 32) === 0)
    assert(t.currentSnapshot.get.version === before.version)

    // full restore
    val compacted = t.compact()
    assert(compacted >= 1)
    val after = t.currentSnapshot.get
    assert(after.version === before.version + 1)
    assert(after.files.forall(!FileEntry.isDelta(_)), "no deltas survive")
    assert(after.files.groupBy(_.bucket).values.forall(_.size === 1))
    assert(!t.hasDeltas)
    // data identical; stats present on rewritten files
    assert(t.read().orderBy("id").collect().toSeq === expected)
    assert(after.files.forall(_.stats.nonEmpty))
    // prior delta-bearing version still time-travels to the same answer
    assert(t.readVersion(before.version).orderBy("id").collect().toSeq
      === expected)
    // idempotent
    assert(t.compact() === 0)
  }

  test("under-threshold buckets keep their exact manifest entries") {
    val t = UpsertTable(spark, Files.createTempDirectory("graft-cp2").toString)
    t.create(schema, Seq("id"), numBuckets = 4)
    t.merge((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    // deepen ONE bucket only: repeated delta updates of a single key
    (0 until 4).foreach { i =>
      t.merge(Seq((7L, s"u$i")).toDF("id", "v"), delta = true)
    }
    val before = t.currentSnapshot.get
    val hot = before.files.filter(FileEntry.isDelta).map(_.bucket).distinct
    assert(hot.size === 1)
    val cold = before.files.filter(f => !hot.contains(f.bucket))
    assert(t.compact(maxFilesPerBucket = 2) >= 1)
    val after = t.currentSnapshot.get
    // cold buckets: entries carried over verbatim (no rewrite)
    assert(cold.forall(after.files.contains))
    assert(after.files.forall(!FileEntry.isDelta(_)))
    assert(t.read().where("id = 7").collect().head.getString(1) === "u3")
  }

  test("compactAll sweeps a namespace") {
    val wh = Files.createTempDirectory("graft-cp-wh")
    Files.createDirectories(wh.resolve("ns"))
    val t = UpsertTable(spark, wh.resolve("ns").resolve("t1").toString)
    t.create(schema, Seq("id"), numBuckets = 2)
    (0 until 3).foreach { i =>
      t.merge(Seq((1L, s"v$i")).toDF("id", "v"), delta = true)
    }
    val res = Maintenance.compactAll(spark, wh.toString, "ns")
    assert(res.exists { case (name, n) => name == "t1" && n >= 1 })
    assert(t.read().collect().map(_.getString(1)).toSeq === Seq("v2"))
  }
}
