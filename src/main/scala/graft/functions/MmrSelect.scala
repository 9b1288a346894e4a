package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MMR (maximal marginal relevance, Carbonell & Goldstein
  * SIGIR'98) re-ranking over a BOUNDED candidate array: greedily pick
  * `k` items maximizing `λ·relevance − (1−λ)·max-similarity-to-
  * already-picked` — the diversification step between ANN retrieval
  * and context assembly in a RAG pipeline (near-duplicate passages
  * waste the context window; MMR keeps the relevant AND mutually
  * novel ones).
  *
  * Input: `array<struct<id bigint, rel_micro bigint, emb
  * array<double>>>` — the per-query candidate list (top-N from
  * q16/q22-style retrieval, so its length is bounded by construction;
  * the expression is O(k·N) sims, N ≤ retrieval fan-in, never
  * corpus-sized). Output: the picks in selection order as
  * `array<struct<id bigint, score_micro bigint>>`.
  *
  * Determinism contract (cross-engine, q77's floor-micro idiom):
  * pairwise cosine runs the same sequential double arithmetic as
  * [[DotProduct]] / DuckDB's `list_dot_product`, floored to integer
  * micros BEFORE any comparison; the greedy score is pure long
  * arithmetic `lambdaTenths·rel − (10−lambdaTenths)·maxSim`; ties
  * break by id ascending. An all-zero vector scores cosine 0 by
  * definition (the denominator guard) — callers feeding L2-normalized
  * embeddings never hit it.
  */
case class MmrSelect(child: Expression, k: Int, lambdaTenths: Int)
    extends UnaryExpression {

  require(k >= 1, "mmr_select needs k >= 1")
  require(lambdaTenths >= 0 && lambdaTenths <= 10,
    "mmr_select lambda is in tenths, 0..10")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StructType(Array(a, b, c)), _)
          if a.dataType == LongType && b.dataType == LongType &&
            (c.dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            }) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        "mmr_select expects array<struct<id bigint, rel_micro bigint, " +
          s"emb array<double>>>, got $other")
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score_micro", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "mmr_select"

  override protected def nullSafeEval(input: Any): Any =
    MmrSelect.compute(input.asInstanceOf[ArrayData], k, lambdaTenths)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MmrSelect$$.MODULE$$.compute($c, $k, $lambdaTenths)")

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

object MmrSelect {

  def compute(arr: ArrayData, k: Int, lambdaTenths: Int): ArrayData = {
    // the input type may be ArrayType(..., containsNull = true) /
    // nullable fields: skip null elements and elements with a null
    // id/rel/emb instead of NPE-ing in an executor (a null candidate
    // carries no rankable signal; dropping it is the only sane MMR
    // semantics)
    val total = arr.numElements()
    val ids0 = new Array[Long](total)
    val rel0 = new Array[Long](total)
    val embs0 = new Array[ArrayData](total)
    var n = 0
    var src = 0
    while (src < total) {
      if (!arr.isNullAt(src)) {
        val row = arr.getStruct(src, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2)) {
          ids0(n) = row.getLong(0)
          rel0(n) = row.getLong(1)
          embs0(n) = row.getArray(2)
          n += 1
        }
      }
      src += 1
    }
    val ids = ids0
    val rel = rel0
    val embs = embs0
    var i = 0
    val norms = new Array[Double](n)
    i = 0
    while (i < n) {
      norms(i) = math.sqrt(DotProduct.compute(embs(i), embs(i)))
      i += 1
    }
    // pairwise micro-sims, computed lazily (greedy touches only
    // picked×remaining pairs: k·n of the n² cells)
    val cache = new Array[Long](n * n)
    val filled = new Array[Boolean](n * n)
    def simMicro(a: Int, b: Int): Long = {
      val idx = a * n + b
      if (!filled(idx)) {
        val denom = norms(a) * norms(b)
        val cos =
          if (denom == 0d) 0d
          else DotProduct.compute(embs(a), embs(b)) / denom
        val v = math.floor(cos * 1000000d).toLong
        cache(idx) = v; filled(idx) = true
        cache(b * n + a) = v; filled(b * n + a) = true
      }
      cache(idx)
    }

    val kk = math.min(k, n)
    val chosen = new Array[Int](kk)
    val used = new Array[Boolean](n)
    val out = new Array[Any](kk)
    var r = 0
    while (r < kk) {
      var best = -1
      var bestScore = 0L
      var bestId = 0L
      var c = 0
      while (c < n) {
        if (!used(c)) {
          var maxSim = 0L
          var j = 0
          while (j < r) {
            val s = simMicro(c, chosen(j))
            if (j == 0 || s > maxSim) maxSim = s
            j += 1
          }
          val score = lambdaTenths * rel(c) - (10 - lambdaTenths) * maxSim
          if (best < 0 || score > bestScore ||
            (score == bestScore && ids(c) < bestId)) {
            best = c; bestScore = score; bestId = ids(c)
          }
        }
        c += 1
      }
      used(best) = true
      chosen(r) = best
      out(r) = new GenericInternalRow(
        Array[Any](ids(best), bestScore)): InternalRow
      r += 1
    }
    new GenericArrayData(out)
  }
}
