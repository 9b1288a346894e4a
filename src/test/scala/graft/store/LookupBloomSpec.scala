package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-file Bloom lookup stats (the GDPR reverse-index): commits on a
  * table with declared lookup columns must record a bloom per file,
  * reverse lookups must touch only the files whose bloom admits the
  * probe (never missing a true occurrence), the declaration must
  * survive into maintenance commits via the manifest, and the
  * always-keep-deltas rule must make pruning sound even when a key's
  * lookup value CHANGES across versions.
  */
class LookupBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("erasure reverse lookup prunes to admitted files, stays exact, survives compaction") {
    val dir = Files.createTempDirectory("graft-bloom").toString
    spark.conf.set(UpsertTable.LookupBloomsConf, "user_id")
    try {
      val t = UpsertTable(spark, dir)
      // 512 keys, 128 users (4 rows each) — a user's rows land in at
      // most 4 of the 16 key-hash buckets, so lookups can prune
      val df = (0 until 512).map(i => (i.toLong, (i / 4).toLong, i * 10L))
        .toDF("id", "user_id", "v")
      t.merge(df, autoCreateKeys = Seq("id"))
      val snap = t.currentSnapshot.get
      assert(snap.lookupCols === Seq("user_id"))
      assert(snap.files.nonEmpty &&
        snap.files.forall(_.blooms.contains("user_id")))

      // soundness: every file truly containing user 3 is admitted
      val admitted = t.lookupFiles("user_id", Seq(3L)).map(_.path).toSet
      val containing = snap.files.filter { f =>
        spark.read.parquet(s"$dir/${f.path}")
          .where(col("user_id") === 3L).count() > 0
      }.map(_.path).toSet
      assert(containing.nonEmpty && containing.subsetOf(admitted))
      // pruning: the lookup does NOT open the whole table (≤4 true
      // files + 1%-fpp noise out of 16)
      assert(admitted.size < snap.files.size,
        s"expected pruning, admitted ${admitted.size}/${snap.files.size}")

      // exactness: readLookup ≡ full read + residual filter
      val got = t.readLookup("user_id", Seq(3L))
        .collect().map(_.getLong(0)).sorted
      assert(got === t.read().where(col("user_id") === 3L)
        .collect().map(_.getLong(0)).sorted)

      // re-keyed update: a delta moves key 12 to user 999 — the new
      // user finds it (deltas always read) and user 3 no longer does
      spark.conf.unset(UpsertTable.LookupBloomsConf)
      t.merge(Seq((12L, 999L, 0L)).toDF("id", "user_id", "v"),
        delta = true)
      assert(t.readLookup("user_id", Seq(999L))
        .collect().map(_.getLong(0)).toSeq === Seq(12L))
      assert(!t.readLookup("user_id", Seq(3L))
        .collect().map(_.getLong(0)).contains(12L))

      // erasure through the lookup path, then compaction in a session
      // with NO conf set: the manifest declaration keeps blooms coming
      val victims = t.readLookup("user_id", Seq(3L))
      t.merge(victims.withColumn("__op", lit("d")),
        opCol = Some("__op"), delta = true)
      t.compact()
      val snap2 = t.currentSnapshot.get
      assert(snap2.files.forall(_.blooms.contains("user_id")),
        "compaction must keep collecting blooms from the manifest declaration")
      assert(t.readLookup("user_id", Seq(3L)).count() === 0L)
      assert(t.read().count() === 512L - 3L) // 4 rows minus re-keyed 12
    } finally spark.conf.unset(UpsertTable.LookupBloomsConf)
  }
}
