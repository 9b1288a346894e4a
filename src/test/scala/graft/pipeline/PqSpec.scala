package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Pq]] invariants: complete one-code-per-subspace encoding, the
  * ADC ≡ distance-to-reconstruction decomposition (the identity PQ
  * search rests on), and Lloyd distortion non-increase.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nSub = 4
  private val dSub = 4

  private def corpus = {
    val vecs = (0L until 60L).map(i =>
      (i, Seq.tabulate(nSub * dSub)(k =>
        math.sin(i * 7 + k * 3) + (if (i % 3 == 0) 1.5 else 0.0))))
    vecs.toDF("vec_id", "emb")
  }

  test("every (vector, subspace) gets exactly one code in [0, k)") {
    val e = corpus
    val sub = Pq.subvectors(e, nSub, dSub)
    val cb = Pq.train(spark, sub, k = 8, iters = 2)
    val codes = Pq.assign(sub, cb).select("vec_id", "s", "cid").collect()
    assert(codes.length === 60 * nSub)
    assert(codes.map(r => (r.getLong(0), r.getInt(1))).distinct.length ===
      60 * nSub)
    assert(codes.forall { r => val c = r.getInt(2); c >= 0 && c < 8 })
  }

  test("ADC total ≡ squared L2 to the reconstructed vector (micro-exact per subspace)") {
    val e = corpus
    val sub = Pq.subvectors(e, nSub, dSub)
    val cb = Pq.train(spark, sub, k = 8, iters = 2)
    val cbMap = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val codes = Pq.assign(sub, cb).select("vec_id", "s", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val qsub = sub.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("s"), col("sv").as("qsv"))
    val adc = Pq.adcTopK(codes = Pq.assign(sub, cb)
        .select("vec_id", "s", "cid"),
      codebook = cb, querySub = qsub, k = 60, nSub = nSub)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (((qid, vid), got) <- adc) {
      // reconstruction = per-subspace codeword; ADC must equal the sum
      // of per-subspace 6-dp-rounded squared distances to it
      val want = (0 until nSub).map { s =>
        val q = vecs(qid).slice(s * dSub, (s + 1) * dSub)
        val c = cbMap((s, codes((vid, s))))
        val d2 = q.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        math.round(BigDecimal(d2).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble * 1e6)
      }.sum
      // per-subspace rounding happens on the pinned-order dot-product
      // form in the query; allow 1 micro per subspace of slack
      assert(math.abs(got - want) <= nSub,
        s"ADC mismatch for q$qid->v$vid: $got vs $want")
    }
  }

  test("Lloyd training does not increase total quantization distortion") {
    val e = corpus
    val sub = Pq.subvectors(e, nSub, dSub)
    def distortion(cb: org.apache.spark.sql.DataFrame): Double =
      Pq.assign(sub, cb)
        .join(broadcast(cb), Seq("s", "cid"))
        .select(aggregate(zip_with(col("sv"), col("cemb"),
          (x, y) => (x - y) * (x - y)), lit(0d), (a, x) => a + x).as("d"))
        .agg(sum("d")).collect()(0).getDouble(0)
    val cb0 = sub.where(col("vec_id") < 8)
      .select(col("s"), col("vec_id").cast("int").as("cid"),
        col("sv").as("cemb"))
    val d0 = distortion(cb0)
    val d2 = distortion(Pq.train(spark, sub, k = 8, iters = 2))
    // 6-dp centroid rounding can cost at most a hair; require clear
    // non-increase with a generous epsilon
    assert(d2 <= d0 + 1e-3, s"distortion rose: $d0 -> $d2")
  }
}
