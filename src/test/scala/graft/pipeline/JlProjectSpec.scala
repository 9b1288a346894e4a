package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[JlProject]]: the projection of a basis vector e_i must read out
  * column i of the sign matrix (scaled 1/√k in micros), and the sign
  * matrix itself must be ±1-valued and deterministic across calls —
  * the properties the oracle's SQL rebuild relies on.
  */
class JlProjectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sign matrix is ±1, deterministic, and not degenerate") {
    val m = JlProject.signMatrix(64, 16)
    assert(m.size == 16 && m.forall(_.size == 64))
    assert(m.flatten.forall(v => v == 1d || v == -1d))
    assert(m == JlProject.signMatrix(64, 16))
    // a constant matrix would be a hash bug: both signs must occur
    assert(m.flatten.distinct.size == 2)
  }

  test("basis vectors read out sign-matrix columns") {
    val m = JlProject.signMatrix(8, 4)
    val basis = (0 until 8).map { i =>
      (i.toLong, Array.tabulate(8)(k => if (k == i) 1d else 0d))
    }
    val got = JlProject.project(
      basis.toDF("vec_id", "emb"), "vec_id", "emb", inDim = 8, outDim = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    basis.foreach { case (i, _) =>
      (0 until 4).foreach { j =>
        val want = math.floor(m(j)(i.toInt) / 2d * 1e6).toLong
        assert(got((i, j)) == want, s"e_$i → component $j")
      }
    }
  }

  test("projection rejects a non-power-of-four output dim") {
    val df = Seq((1L, Array(1d, 2d))).toDF("vec_id", "emb")
    intercept[IllegalArgumentException] {
      JlProject.project(df, "vec_id", "emb", inDim = 2, outDim = 8)
    }
  }
}
