package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Merkle content-audit machinery behind q371: per-bucket
  * commutative set hashes over logical rows. The oracle for q371 can
  * only gate closed-form counts + in-band booleans (bucket membership
  * is engine-side hash arithmetic), so THIS spec carries the teeth:
  * the fingerprint must be layout-independent, must move when any
  * single row changes (bucket + root), must stay put on untouched
  * buckets, and must telescope incrementally across a delta commit.
  */
class MerkleAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fresh(): UpsertTable = {
    val t = UpsertTable(spark,
      Files.createTempDirectory("graft-merkle").toString)
    t.create(schema, Seq("id"), numBuckets = 4)
    t.merge((0L until 40L).map(i => (i, s"v$i")).toDF("id", "v"),
      delta = true)
    t
  }

  private def fps(t: UpsertTable): Map[Long, (Long, BigDecimal)] =
    t.bucketFingerprints().collect()
      .map(r => r.getInt(0).toLong ->
        (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap

  test("fingerprints are layout-independent: compaction changes nothing") {
    val t = fresh()
    t.merge((0L until 10L).map(i => (i, s"u$i")).toDF("id", "v"),
      delta = true)
    val before = fps(t)
    assert(t.compact() >= 1)
    assert(fps(t) === before,
      "same logical rows after compaction must keep every bucket fp")
  }

  test("a single flipped row flips exactly its bucket and the root") {
    val t = fresh()
    val before = fps(t)
    t.merge(Seq((7L, "MUTATED")).toDF("id", "v"), delta = true)
    val after = fps(t)
    val changed = before.keySet.union(after.keySet)
      .filter(b => before.get(b).map(_._2) != after.get(b).map(_._2))
    val expectedBucket = spark.range(1)
      .select(pmod(hash(lit(7L)), lit(4)).as("b"))
      .head().getInt(0).toLong
    assert(changed === Set(expectedBucket),
      s"exactly id=7's bucket must change, got $changed")
    assert(before.values.map(_._2).sum !== after.values.map(_._2).sum,
      "root fingerprint must move")
    // row counts unchanged: an upsert of an existing key replaces
    assert(before.view.mapValues(_._1).toMap ===
      after.view.mapValues(_._1).toMap)
  }

  test("delta commit telescopes: fp(v2) - fp(v1) = hash(new) - hash(old)") {
    val t = fresh()
    val v1 = t.currentSnapshot.get.version
    val batch = Seq((3L, "n3"), (11L, "n11"), (100L, "fresh"))
      .toDF("id", "v")
    t.merge(batch, delta = true)
    val v2 = t.currentSnapshot.get.version
    def keyed(version: Long): Map[Long, BigDecimal] = {
      val df = t.readVersion(version)
        .join(batch.select("id"), "id")
      df.withColumn("__rh", UpsertTable.rowFingerprint(df.columns))
        .withColumn("b", UpsertTable.bucketExpr(Seq("id"), 4))
        .groupBy("b")
        .agg(sum(expr("cast(__rh as decimal(38,0))")).as("kf"))
        .collect().map(r => r.getInt(0).toLong ->
          BigDecimal(r.getDecimal(1))).toMap
    }
    val f1 = t.bucketFingerprints(Some(v1)).collect()
      .map(r => r.getInt(0).toLong -> BigDecimal(r.getDecimal(2))).toMap
    val f2 = t.bucketFingerprints(Some(v2)).collect()
      .map(r => r.getInt(0).toLong -> BigDecimal(r.getDecimal(2))).toMap
    val (ko, kn) = (keyed(v1), keyed(v2))
    val buckets = f1.keySet ++ f2.keySet
    buckets.foreach { b =>
      val lhs = f2.getOrElse(b, BigDecimal(0)) - f1.getOrElse(b, BigDecimal(0))
      val rhs = kn.getOrElse(b, BigDecimal(0)) - ko.getOrElse(b, BigDecimal(0))
      assert(lhs === rhs, s"bucket $b: fp delta $lhs != keyed delta $rhs")
    }
  }

  test("fingerprint ignores projection order (name-sorted struct)") {
    assert(UpsertTable.rowFingerprint(Seq("v", "id")).toString ===
      UpsertTable.rowFingerprint(Seq("id", "v")).toString)
  }
}
