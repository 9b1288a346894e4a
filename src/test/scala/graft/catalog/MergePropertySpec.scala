package graft.catalog

import java.nio.file.{Files, Paths}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.UpsertTable

/** Property: a CDC-shaped SQL `MERGE INTO` through [[GraftMergeRule]]
  * lands EXACTLY the state of the native [[UpsertTable.merge]] applied
  * to the same batch — the SQL layer is a pure translation, never a
  * second merge semantics. Any divergence (dropped delete, doubled
  * insert, condition drift in the `__merge_op` projection) fails here
  * before it could reach the q85 oracle.
  */
class MergePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse: String = {
    val wh = Files.createTempDirectory("graft-mergeprop").toString
    spark.conf.set("spark.sql.catalog.graft_mp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_mp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_mp.cdc")
    wh
  }

  private case class Row3(k: Int, v: String, op: String)

  // seed rows (unique keys, op ignored) + one batch (unique keys)
  private val genSeed: Gen[List[(Int, String)]] =
    Gen.listOfN(12, for {
      k <- Gen.choose(0, 9)
      v <- Gen.alphaStr.map(_.take(5) + "s")
    } yield (k, v)).map(_.distinctBy(_._1))

  private val genBatch: Gen[List[Row3]] =
    Gen.listOfN(12, for {
      k <- Gen.choose(0, 14)
      v <- Gen.alphaStr.map(_.take(5) + "b")
      op <- Gen.frequency(3 -> Gen.const("u"), 1 -> Gen.const("d"))
    } yield Row3(k, v, op)).map(_.distinctBy(_.k))

  private var n = 0

  test("SQL MERGE INTO ≡ native keyed merge on the same batch") {
    val prop = Prop.forAll(genSeed, genBatch) { (seed, batch) =>
      n += 1
      val tbl = s"t_prop_$n"
      graft.Fs.deleteRecursively(Paths.get(warehouse, "cdc", tbl))
      // SQL path: DDL + INSERT seed + MERGE batch
      spark.sql(s"CREATE TABLE graft_mp.cdc.$tbl (k INT, v STRING) " +
        "TBLPROPERTIES('keys'='k')")
      if (seed.nonEmpty) {
        seed.toDF("k", "v").createOrReplaceTempView("mp_seed")
        spark.sql(s"INSERT INTO graft_mp.cdc.$tbl SELECT * FROM mp_seed")
      }
      batch.map(r => (r.k, r.v, r.op)).toDF("k", "v", "op")
        .createOrReplaceTempView("mp_batch")
      spark.sql(
        s"""MERGE INTO graft_mp.cdc.$tbl t USING mp_batch s ON t.k = s.k
           |WHEN MATCHED AND s.op = 'd' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED AND NOT (s.op = 'd') THEN INSERT *""".stripMargin)
      // compare full sorted row MULTISETS, not maps — a regression
      // emitting duplicate rows per key must fail, not be collapsed
      val sqlState = spark.sql(s"SELECT k, v FROM graft_mp.cdc.$tbl")
        .collect().map(r => r.getInt(0) -> r.getString(1)).toSeq.sorted

      // native path: fresh store, same seed merge + batch merge
      val nativeDir = Paths.get(warehouse, "native", tbl)
      graft.Fs.deleteRecursively(nativeDir)
      val nt = UpsertTable(spark, nativeDir.toString)
      if (seed.nonEmpty)
        nt.merge(seed.toDF("k", "v"), autoCreateKeys = Seq("k"))
      else
        nt.create(org.apache.spark.sql.types.StructType.fromDDL(
          "k INT, v STRING"), keys = Seq("k"))
      nt.merge(batch.map(r => (r.k, r.v, r.op)).toDF("k", "v", "op"),
        opCol = Some("op"))
      val nativeState = nt.read()
        .collect().map(r => r.getInt(0) -> r.getString(1)).toSeq.sorted

      // and both must equal the plain map fold
      val expected = batch.foldLeft(seed.toMap) {
        case (m, Row3(k, v, o)) => if (o == "d") m - k else m + (k -> v)
      }.toSeq.sorted
      sqlState == nativeState && sqlState == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }
}
