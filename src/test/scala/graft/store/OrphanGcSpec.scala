package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[UpsertTable.removeOrphanFiles]]: crash leftovers (data files no
  * snapshot references) are collected, referenced files and recent
  * (possibly in-flight) files survive, table content is untouched.
  */
class OrphanGcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def planted(t: UpsertTable, name: String, ageMs: Long): String = {
    // simulate a lost commit attempt: a real parquet file inside an
    // unpublished attempt directory
    val live = t.dataFiles().head // absolute path
    val dir = Paths.get(t.location, "data", name, "__bucket=0")
    Files.createDirectories(dir)
    val f = dir.resolve("part-orphan.parquet")
    Files.copy(Paths.get(live), f, StandardCopyOption.REPLACE_EXISTING)
    Files.setLastModifiedTime(f,
      FileTime.fromMillis(System.currentTimeMillis() - ageMs))
    s"data/$name/__bucket=0/part-orphan.parquet"
  }

  test("removes old orphans, keeps referenced and recent files, content intact") {
    val t = UpsertTable(spark,
      Files.createTempDirectory("graft-gc").toString)
    t.merge(Seq((1, "a"), (2, "b")).toDF("user_id", "email"),
      autoCreateKeys = Seq("user_id"))
    t.merge(Seq((2, "b2"), (3, "c")).toDF("user_id", "email"),
      autoCreateKeys = Seq("user_id"))
    val before = t.read().orderBy("user_id").collect().toSeq

    val old = planted(t, "v99-deadbeef", ageMs = 7200 * 1000L)
    val fresh = planted(t, "v99-cafebabe", ageMs = 0L)

    // retentions under 24h need the explicit override (an in-flight
    // commit's files must outlive the cutoff — Iceberg's contract)
    intercept[IllegalArgumentException] {
      t.removeOrphanFiles(olderThanMs = 3600 * 1000L)
    }

    val removed = t.removeOrphanFiles(olderThanMs = 3600 * 1000L,
      allowShortRetention = true)
    assert(removed === Seq(old))
    // the stale attempt dir is pruned, the fresh one survives
    assert(!Files.exists(Paths.get(t.location).resolve(old)))
    assert(Files.exists(Paths.get(t.location).resolve(fresh)))
    // every referenced file still present; reads identical
    t.dataFiles().foreach(f => assert(Files.exists(Paths.get(f)), f))
    assert(t.read().orderBy("user_id").collect().toSeq === before)

    // idempotent: nothing old remains
    assert(t.removeOrphanFiles(olderThanMs = 3600 * 1000L,
      allowShortRetention = true).isEmpty)
    // dropping the retention collects the fresh orphan too
    assert(t.removeOrphanFiles(olderThanMs = -1L,
      allowShortRetention = true) === Seq(fresh))
    assert(t.read().orderBy("user_id").collect().toSeq === before)
  }

  test("namespace sweep reports per-table removal counts") {
    val wh = Files.createTempDirectory("graft-gc-ns").toString
    val a = UpsertTable(spark, s"$wh/ns/ta")
    val b = UpsertTable(spark, s"$wh/ns/tb")
    a.merge(Seq((1, "x")).toDF("user_id", "email"),
      autoCreateKeys = Seq("user_id"))
    b.merge(Seq((1, "y")).toDF("user_id", "email"),
      autoCreateKeys = Seq("user_id"))
    planted(a, "v50-00000000", ageMs = 7200 * 1000L)
    val got = Maintenance.gcAll(spark, wh, "ns", olderThanMs = 3600 * 1000L,
      allowShortRetention = true)
    assert(got.toMap === Map("ta" -> 1, "tb" -> 0))
  }
}
