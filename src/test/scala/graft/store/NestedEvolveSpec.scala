package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Nested (struct-typed) schema evolution: additive subfields and leaf
  * widening inside struct columns — the shape a CDC payload's nested
  * objects drift in. */
class NestedEvolveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = UpsertTable(spark,
    Files.createTempDirectory("graft-nested").toString)

  test("additive nested field: old files read-clip, new rows carry it") {
    val t = tmp()
    val b1 = spark.sql(
      "SELECT 1L AS id, named_struct('x', 10, 'y', 'a') AS s")
    t.merge(b1, autoCreateKeys = Seq("id"))
    val b2 = spark.sql(
      "SELECT 2L AS id, named_struct('x', 20, 'y', 'b', 'z', 'new') AS s")
    t.merge(b2)
    val sType = t.schema("s").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]
    assert(sType.fieldNames.toSeq === Seq("x", "y", "z"))
    val got = t.read().orderBy("id")
      .select(col("id"), col("s.x"), col("s.z")).collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2))))
      .toSeq === Seq((1L, 10, None), (2L, 20, Some("new"))))
  }

  test("nested leaf widening int->long rewrites and preserves values") {
    val t = tmp()
    t.merge(spark.sql("SELECT 1L AS id, named_struct('x', 7) AS s"),
      autoCreateKeys = Seq("id"))
    t.merge(spark.sql("SELECT 2L AS id, named_struct('x', 9000000000L) AS s"))
    assert(t.schema("s").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType]("x").dataType.typeName === "long")
    val got = t.read().orderBy("id").select(col("s.x")).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(7L, 9000000000L))
  }

  test("a later batch missing an evolved nested field aligns with nulls") {
    val t = tmp()
    t.merge(spark.sql(
      "SELECT 1L AS id, named_struct('x', 1, 'z', 'v') AS s"),
      autoCreateKeys = Seq("id"))
    // old-shape batch: struct lacks z — must not throw (plain struct
    // cast would), must land with z null
    t.merge(spark.sql("SELECT 3L AS id, named_struct('x', 3) AS s"))
    val got = t.read().orderBy("id")
      .select(col("id"), col("s.x"), col("s.z")).collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), Option(r.getString(2))))
      .toSeq === Seq((1L, 1, Some("v")), (3L, 3, None)))
    // a null struct parent stays null through alignment
    t.merge(spark.sql(
      "SELECT 4L AS id, CAST(NULL AS STRUCT<x:INT>) AS s"))
    assert(t.read().where(col("id") === 4L).select("s").head().isNullAt(0))
  }

  test("incompatible nested change still fails loudly") {
    val t = tmp()
    t.merge(spark.sql("SELECT 1L AS id, named_struct('x', 1) AS s"),
      autoCreateKeys = Seq("id"))
    intercept[IllegalArgumentException] {
      t.merge(spark.sql("SELECT 2L AS id, named_struct('x', 'str') AS s"))
    }
  }
}
