package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Fixture-VARIANT gates for the engine-divergence guard sites: the
  * driver's oracle compare only ever sees the shipped testdata, where
  * every group is populous and every product fits in 64 bits — so the
  * q320/q319/q316/q310 guards (decimal(38,0) accumulators and
  * products, `otherwise`-style degenerate-group sentinels,
  * `greatest(n−1,1)`, the zero-relevant AP convention) were
  * unexercised by the gate they exist to protect. Each test here
  * builds a variant parquet fixture that actually TAKES the guarded
  * path — per-element squares past 2⁶³, a segment missing one
  * variant, a single-row group, a query with zero relevant documents
  * — and checks the query output against independently-computed exact
  * arithmetic (BigInt), proving the guard produces the documented
  * finite value instead of a silent 64-bit wrap or a NULL the oracle
  * would diverge on.
  */
class DegenerateGuardSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = TestSpark.spark

  private def tmpDir(tag: String): String = {
    val d = Paths.get(sys.props("java.io.tmpdir"),
      s"graft-degenerate-$tag-${ProcessHandle.current().pid()}")
    graft.Fs.deleteRecursively(d)
    Files.createDirectories(d)
    d.toString
  }

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // ns epoch — Tables.load passes through
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    val data = rows.map { case (a, b, c, d, e, f) => Row(a, b, c, d, e, f) }
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(data).asJava),
        eventsSchema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  // ---- q320: per-element c² past 2⁶³ must accumulate exactly ----

  test("q320 power analysis survives per-element squares past 2^63") {
    val dir = tmpDir("q320")
    val day = 86400000000000L
    // cents c = 4.0e9 / 4.1e9 / 4.2e9: every c·c ∈ [1.6e19, 1.77e19]
    // individually exceeds Long.MaxValue (9.22e18) — a 64-bit
    // sum(c*c) accumulator wraps on the FIRST element
    val hot = Seq(4.0e7, 4.1e7, 4.2e7)
    val cold = Seq(1.0, 2.0, 3.0, 4.0)
    val rows =
      hot.zipWithIndex.map { case (v, i) =>
        (i.toLong, day + i, 10L + i, "hot", v, "{}") } ++
      cold.zipWithIndex.map { case (v, i) =>
        (100L + i, day + i, 20L + i, "cold", v, "{}") }
    writeEvents(dir, rows)

    val got = SparkEntry.queries("q320_power_analysis")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val z = BigInt(1959964L + 841621L)
    val z2 = z * z
    def expect(vs: Seq[Double]) = {
      val cs = vs.map(v => BigInt(math.round(v * 100)))
      val n = BigInt(cs.size)
      val sx = cs.sum
      val sxx = cs.map(c => c * c).sum
      val num = n * sxx - sx * sx
      val den = n * (n - 1)
      val d2 = den * 250000 * BigInt("1000000000000")
      ((sx / n).toLong, (num / den).toLong,
        ((2 * z2 * num + d2 - 1) / d2).toLong)
    }
    val (hm, hv, hn) = expect(hot)
    assert(got("hot") === ((3L, hm, hv, hn)),
      s"hot group diverged from exact BigInt arithmetic: ${got("hot")}")
    // sanity: the overflowing group's variance really is huge (a
    // silent wrap would collapse or sign-flip it)
    assert(hv > 0L && got("hot")._3 === hv)
    val (cm, cv, cn) = expect(cold)
    assert(got("cold") === ((4L, cm, cv, cn)))
  }

  // ---- q319: a segment missing one variant must hit the sentinels ----

  test("q319 Simpson audit reports -1 rates and exact booleans for a variant-absent segment") {
    val dir = tmpDir("q319")
    val day = 86400000000000L
    // "solo": only even user_ids (variant 0) — n1 = 0, the degenerate
    // segment. "mix": both variants present, variant 1 wins.
    val rows = Seq(
      (1L, day, 2L, "solo", 60.0, "{}"),  // succ (>= 5000 cents)
      (2L, day, 4L, "solo", 70.0, "{}"),  // succ
      (3L, day, 6L, "solo", 10.0, "{}"),
      (4L, day, 8L, "solo", 20.0, "{}"),
      (5L, day, 1L, "mix", 90.0, "{}"),   // v1 succ
      (6L, day, 3L, "mix", 80.0, "{}"),   // v1 succ
      (7L, day, 2L, "mix", 10.0, "{}"),   // v0
      (8L, day, 4L, "mix", 60.0, "{}"))   // v0 succ
    writeEvents(dir, rows)

    val got = SparkEntry.queries("q319_simpson_audit")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5))).toMap

    // solo: n0=4 s0=2, n1=0 s1=0 → rate1 sentinel −1, seg winner
    // false (0·4 > 2·0 is false); mix: n0=2 s0=1, n1=2 s1=2.
    // totals: tn0=6 ts0=3 tn1=2 ts1=2 → overall v1 wins (2·6 > 3·2).
    assert(got("solo") === ((500000L, -1L, false, true, true)))
    assert(got("mix") === ((500000L, 1000000L, true, true, false)))
  }

  // ---- q316: a single-row group must take the greatest(n-1,1) guard ----

  test("q316 ECDF reports percent_rank 0 for a single-row type instead of NULL") {
    val dir = tmpDir("q316")
    val day = 86400000000000L
    val rows = Seq(
      (1L, day, 1L, "one", 3.21, "{}"),
      (2L, day, 2L, "two", 1.00, "{}"),
      (3L, day, 3L, "two", 2.00, "{}"))
    writeEvents(dir, rows)

    val got = SparkEntry.queries("q316_ecdf_ranks")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // n=1: cume = 1·10⁶ div 1, prank = 0·10⁶ div greatest(0,1) = 0 —
    // a finite long, never NULL (Spark) / a division error (DuckDB)
    assert(got(("one", 321L)) === ((1L, 1000000L, 0L)))
    assert(got(("two", 100L)) === ((1L, 500000L, 0L)))
    assert(got(("two", 200L)) === ((1L, 1000000L, 1000000L)))
  }

  // ---- q310: a query with zero relevant docs must report AP 0 ----

  test("q310 average precision reports 0 for a zero-relevant query instead of NULL") {
    val dir = tmpDir("q310")
    val dim = 8
    def vec(seed: Long): Array[Float] =
      Array.tabulate(dim)(i => (((seed * 31 + i * 7) % 13) - 6).toFloat)
    // queries vec_id 0..4; corpus vec_id 5..24 labeled 1/2 only —
    // qid 3's label 99 has ZERO relevant corpus docs (n_pos = 0)
    val rows = (0L until 25L).map { id =>
      val label = if (id == 3L) 99 else if (id < 5L) 1 else (id % 2 + 1).toInt
      Row(id, vec(id).toSeq, label)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir2 = dir
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")

    val got = SparkEntry.queries("q310_avg_precision")(spark, dir2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(got(3L) === ((0L, 0L, 0L)),
      s"zero-relevant query must report n_pos=0, ap=0, p@10=0: ${got(3L)}")
    // the populous queries still return positive AP (the guard did
    // not flatten the normal path)
    assert(got.filterNot(_._1 == 3L).values.forall(_._1 > 0L))
    assert(got.filterNot(_._1 == 3L).values.exists(_._2 > 0L))
  }
}
