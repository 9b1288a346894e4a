package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnnLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hyperplanes are deterministic and bounded in [-1, 1)") {
    val a = AnnLsh.hyperplanes(dim = 16, nbits = 8, seed = "lsh")
    val b = AnnLsh.hyperplanes(dim = 16, nbits = 8, seed = "lsh")
    assert(a === b)
    assert(a.flatten.forall(w => w >= -1d && w < 1d))
    // different seed -> different planes
    assert(a !== AnnLsh.hyperplanes(16, 8, "other"))
  }

  test("codes are stable, within range, and collide for identical vectors") {
    val vecs = (1L to 50L)
      .map(i => (i, Seq.tabulate(8)(k => math.sin(i * 3 + k).toFloat)))
    val df = (vecs ++ vecs.map { case (i, v) => (i + 1000L, v) })
      .toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb").cast("array<double>").as("emb"))
    val coded = AnnLsh.codes(df, "vec_id", "emb", nbits = 6).collect()
    assert(coded.forall { r => val c = r.getLong(2); c >= 0 && c < 64 })
    val byId = coded.map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1L to 50L).foreach(i => assert(byId(i) === byId(i + 1000L),
      s"copy of vector $i landed in a different bucket"))
  }

  test("empty corpus yields an empty index; mismatched dims get null codes") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "emb")
    assert(AnnLsh.codes(empty, "vec_id", "emb", nbits = 4).count() === 0)
    // the modal length (3, held by 2 of 3 rows) fixes the index
    // dimension; the 2-dim vector must code to null (filterable),
    // not collapse into bucket 0
    val mixed = Seq(
      (1L, Seq(1d, 2d, 3d)), (2L, Seq(1d, 2d)), (3L, Seq(1d, 2d, 3d)))
      .toDF("vec_id", "emb")
    val coded = AnnLsh.codes(mixed, "vec_id", "emb", nbits = 4)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some(r.getLong(2)))).toMap
    assert(coded(2L).isEmpty, "mismatched-dimension vector got a code")
    assert(coded(1L).isDefined && coded(1L) === coded(3L))
    // scan order must not change the chosen dimension: the 2-dim
    // outlier leading the frame still loses to the modal length
    val reversed = Seq(
      (2L, Seq(1d, 2d)), (3L, Seq(1d, 2d, 3d)), (1L, Seq(1d, 2d, 3d)))
      .toDF("vec_id", "emb")
    val recoded = AnnLsh.codes(reversed, "vec_id", "emb", nbits = 4)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some(r.getLong(2)))).toMap
    assert(recoded === coded, "bucket codes depend on scan order")
    // and pairs never include the mismatched vector
    val pairs = AnnLsh.nearDupPairs(mixed, "vec_id", "emb",
      nbits = 4, threshold = -1d).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 3L)))
  }

  test("nearDupPairs finds every planted exact copy at threshold 0.999") {
    val vecs = (1L to 40L)
      .map(i => (i, Seq.tabulate(8)(k => math.cos(i * 7 + k * 2))))
    val df = (vecs ++ vecs.map { case (i, v) => (i + 1000L, v) })
      .toDF("vec_id", "emb")
    val pairs = AnnLsh.nearDupPairs(df, "vec_id", "emb",
      nbits = 6, threshold = 0.999).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    (1L to 40L).foreach(i => assert(found.contains((i, i + 1000L)),
      s"exact copy pair ($i, ${i + 1000L}) missed"))
    // every reported pair genuinely clears the threshold
    assert(pairs.forall(_.getDouble(2) >= 0.999))
  }
}
