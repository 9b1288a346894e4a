package graft.pipeline

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Grid-blocked DBSCAN (q343's engine): exact equivalence with the
  * quadratic textbook reference over adversarial random point sets —
  * the losslessness of the eps-cell blocking (any ≤ eps pair differs
  * by at most one cell per axis), the core/border/noise role rules,
  * and the component-min label construction are PROVEN against every
  * pair, not argued (the SetSimJoinSpec pattern for spatial
  * blocking). Negative coordinates exercise the shift-before-div
  * floor-division guarantee.
  */
class DbscanGridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Clustered + uniform mixture: dense blobs (cores, chains across
    * blob fringes), sparse background (noise), duplicate coordinates
    * (zero-distance pairs), and points straddling cell boundaries.
    */
  private def corpus(seed: Int, n: Int, span: Int): Seq[(Long, Long, Long)] = {
    val rnd = new Random(seed)
    val blobs = Seq.fill(4)((rnd.nextInt(2 * span) - span,
      rnd.nextInt(2 * span) - span))
    (1 to n).map { id =>
      if (rnd.nextInt(4) == 0) // background
        (id.toLong, (rnd.nextInt(2 * span) - span).toLong,
          (rnd.nextInt(2 * span) - span).toLong)
      else {
        val (bx, by) = blobs(rnd.nextInt(blobs.size))
        (id.toLong, (bx + rnd.nextInt(31) - 15).toLong,
          (by + rnd.nextInt(31) - 15).toLong)
      }
    }
  }

  /** Quadratic reference: roles + component-min labels by union-find. */
  private def brute(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
  : Map[Long, (Long, Long)] = {
    def near(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean = {
      val dx = a._2 - b._2; val dy = a._3 - b._3
      dx * dx + dy * dy <= eps * eps
    }
    val nbrs = pts.map { p =>
      p._1 -> pts.filter(q => q._1 != p._1 && near(p, q)).map(_._1)
    }.toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size >= minPts).toSet
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> find(c)).toMap
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> (2L, label(id))
      else {
        val coreNb = nbrs(id).filter(core).map(label)
        if (coreNb.nonEmpty) id -> (1L, coreNb.min) else id -> (0L, -1L)
      }
    }.toMap
  }

  test("grid DBSCAN equals the quadratic reference across eps and density") {
    for {
      (seed, n, span) <- Seq((1, 80, 60), (2, 120, 40), (3, 100, 120))
      eps <- Seq(5L, 12L, 25L)
    } {
      val pts = corpus(seed, n, span)
      val df = pts.toDF("id", "x", "y")
      val got = Dbscan.cluster(df, "id", "x", "y", eps, minPts = 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(got === brute(pts, eps, minPts = 3),
        s"dbscan mismatch at seed=$seed n=$n span=$span eps=$eps")
    }
  }

  test("duplicate points and negative coordinates cluster correctly") {
    // a tight 5-point blob (duplicates included → zero-distance
    // pairs, all core at minPts=4), one point exactly eps from a
    // single blob member (1 neighbor < minPts but core-adjacent →
    // border), one far point (noise) — everything in the negative
    // quadrant to stress the coord shift
    val pts = Seq((1L, -50L, -50L), (2L, -50L, -50L), (3L, -50L, -49L),
      (4L, -49L, -50L), (5L, -48L, -48L), (6L, -42L, -48L),
      (7L, -500L, -500L))
    val got = Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y",
      eps = 6L, minPts = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got === brute(pts, 6L, 4))
    assert(got(1L) === (2L, 1L) && got(6L) === (1L, 1L)
      && got(7L) === (0L, -1L))
  }

  test("a coordinate at or below -shift fails loudly instead of misassigning cells") {
    // x = −shift would make truncating `div` diverge from floor
    // division around zero — the in-plan assert_true must surface as
    // a job failure, never a silently wrong clustering
    val pts = Seq((1L, 0L, 0L), (2L, -100000L, 5L))
    val ex = intercept[Exception] {
      Dbscan.cluster(pts.toDF("id", "x", "y"), "id", "x", "y",
        eps = 6L, minPts = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("dbscan")),
      s"expected the dbscan contract message, got: $ex")
  }
}
