package graft.store

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The optimistic-commit protocol under genuinely CONCURRENT writers —
  * the interleaving proof on top of the crash-safety units: the
  * atomic-exclusive manifest link means two writers racing the same
  * base version produce either serialized commits or a LOUD
  * IllegalStateException ("concurrent commit") — never a silent lost
  * update. Writers here run on separate [[UpsertTable]] instances
  * (separate-process analog: no shared JVM lock), retry on the loud
  * conflict exactly as its message instructs, and the final table
  * must contain EVERY row both writers ever merged.
  */
class ConcurrentCommitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Run `op` with conflict-retries; count the loud conflicts seen.
    * Any OTHER exception propagates — only the documented conflict is
    * a legal race outcome.
    */
  private def withRetry(op: () => Unit, conflicts: java.util.concurrent.atomic.AtomicInteger): Unit = {
    var done = false
    var attempts = 0
    while (!done) {
      attempts += 1
      require(attempts <= 50, "livelock: too many commit retries")
      try { op(); done = true }
      catch {
        case e: IllegalStateException
            if e.getMessage != null && e.getMessage.contains("concurrent commit") =>
          conflicts.incrementAndGet()
      }
    }
  }

  test("merge vs merge on disjoint keys: serialized or loud conflict, never silent loss") {
    val dir = Files.createTempDirectory("graft-conc-mm").toString
    val seed = UpsertTable(spark, dir)
    seed.merge(Seq((-1L, -1L)).toDF("id", "v"), autoCreateKeys = Seq("id"))

    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val batches = 6
    val perBatch = 10
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    def writer(offset: Long): Runnable = () => {
      // a separate instance per writer — nothing shared but the disk
      val mine = UpsertTable(spark, dir)
      start.await()
      (0 until batches).foreach { b =>
        val rows = (0 until perBatch)
          .map(i => (offset + b * perBatch + i, offset + b))
        withRetry(() =>
          mine.merge(rows.toDF("id", "v"), delta = b % 2 == 0), conflicts)
      }
    }
    val fa = pool.submit(writer(1000L))
    val fb = pool.submit(writer(2000L))
    start.countDown()
    fa.get(300, TimeUnit.SECONDS)
    fb.get(300, TimeUnit.SECONDS)
    pool.shutdown()

    val got = seed.read().select("id").collect().map(_.getLong(0)).toSet
    val want = (Set(-1L)
      ++ (0 until batches * perBatch).map(i => 1000L + i)
      ++ (0 until batches * perBatch).map(i => 2000L + i))
    assert(got === want, "every committed row must survive the race")
    // versions are a gapless serial order: one manifest per commit
    val versions = SnapshotLog.listVersions(dir)
    assert(versions === (versions.min to versions.max))
    info(s"observed ${conflicts.get()} loud conflicts across ${versions.size} commits")
  }

  test("two commits prepared from the same base version: the second is a deterministic loud conflict") {
    val dir = Files.createTempDirectory("graft-conc-det").toString
    val t = UpsertTable(spark, dir)
    t.merge(Seq((1L, 1L)).toDF("id", "v"), autoCreateKeys = Seq("id"))
    val base = t.currentSnapshot.get
    SnapshotLog.commit(dir, base.copy(version = base.version + 1,
      timestampMs = base.timestampMs + 1))
    val e = intercept[IllegalStateException] {
      SnapshotLog.commit(dir, base.copy(version = base.version + 1,
        timestampMs = base.timestampMs + 2))
    }
    assert(e.getMessage.contains("concurrent commit"))
  }

  test("merge vs compaction: layout changes never drop or duplicate concurrent data") {
    val dir = Files.createTempDirectory("graft-conc-mc").toString
    val seed = UpsertTable(spark, dir)
    seed.merge((0 until 64).map(i => (i.toLong, 0L)).toDF("id", "v"),
      autoCreateKeys = Seq("id"))

    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val merger: Runnable = () => {
      val mine = UpsertTable(spark, dir)
      start.await()
      (1 to 8).foreach { b =>
        val rows = (0 until 8).map(i => (100L + b * 10 + i, b.toLong))
        withRetry(() => mine.merge(rows.toDF("id", "v"), delta = true),
          conflicts)
      }
    }
    val compactor: Runnable = () => {
      val mine = UpsertTable(spark, dir)
      start.await()
      (1 to 4).foreach { _ =>
        withRetry(() => { mine.compact(); () }, conflicts)
        Thread.sleep(50)
      }
    }
    val fm = pool.submit(merger)
    val fc = pool.submit(compactor)
    start.countDown()
    fm.get(300, TimeUnit.SECONDS)
    fc.get(300, TimeUnit.SECONDS)
    pool.shutdown()

    val rows = seed.read().select("id").collect().map(_.getLong(0)).toSeq
    val want = ((0 until 64).map(_.toLong) ++
      (1 to 8).flatMap(b => (0 until 8).map(i => 100L + b * 10 + i))).sorted
    assert(rows.sorted === want,
      "compaction racing merges must neither drop nor duplicate rows")
    info(s"observed ${conflicts.get()} loud conflicts")
  }
}
