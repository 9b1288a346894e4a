package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Properties over the whole input space for the operators whose
  * scale-safe formulations differ most from their naive references:
  * the bucketed range join, connected-components clustering, and the
  * block prefix-sum packing must agree with brute force on ANY input.
  */
class PipelinePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("range join ≡ naive key+BETWEEN join on random inputs") {
    val genRows = Gen.listOfN(40, for {
      k <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 100L)
    } yield (k, t))
    check(Prop.forAll(genRows, genRows, Gen.oneOf(7L, 10L, 23L)) {
      (ls, rs, gap) =>
        val l = ls.zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }
          .toDF("k", "lid", "t_l")
        val r = rs.zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }
          .toDF("k", "rid", "t_r")
        val got = RangeJoin.inner(l, r, "k", "t_l", "t_r", gap)
          .select("lid", "rid").collect()
          .map(x => (x.getLong(0), x.getLong(1))).toSet
        val want = (for {
          ((lk, lt), li) <- ls.zipWithIndex
          ((rk, rt), ri) <- rs.zipWithIndex
          if lk == rk && rt >= lt && rt < lt + gap
        } yield (li.toLong, ri.toLong)).toSet
        got == want
    })
  }

  test("connected components ≡ brute-force union-find on random graphs") {
    val genEdges = Gen.listOfN(25, for {
      a <- Gen.choose(0L, 19L)
      b <- Gen.choose(0L, 19L)
      if a != b
    } yield (a, b))
    check(Prop.forAll(genEdges) { es =>
      val nodes = (0L until 20L).toDF("id")
      val edges = es.toDF("a", "b")
      val got = Cluster.connectedComponents(nodes, edges, "id", "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force: union-find over the same edges
      val parent = Array.tabulate(20)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until 20).map { i =>
        val root = find(i)
        // canonical label = min member of the component
        val lbl = (0 until 20).filter(j => find(j) == root).min
        i.toLong -> lbl.toLong
      }.toMap
      got == want
    }, n = 10) // each case is an iterative multi-job run — keep it lean
  }

  test("packing offsets ≡ sequential cumsum; full chunks at capacity") {
    val genTok = Gen.listOfN(30, Gen.choose(0L, 40L))
    check(Prop.forAll(genTok, Gen.oneOf(8L, 16L, 64L)) { (toks, cap) =>
      val df = toks.zipWithIndex.map { case (n, i) => (i.toLong, n) }
        .toDF("doc_id", "n_tok")
      val got = Pack.concatChunks(df, "doc_id", "n_tok", cap, blockWidth = 7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val perDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val perChunk = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val lastChunk = if (perChunk.isEmpty) -1L else perChunk.keys.max
      // every doc fully placed; every chunk but the last exactly full
      toks.zipWithIndex.forall { case (n, i) =>
        perDoc.getOrElse(i.toLong, 0L) == n } &&
        perChunk.forall { case (c, s) => c == lastChunk || s == cap } &&
        got.forall(_._3 > 0)
    })
  }

  test("grouped offsets ≡ sequential per-group cumsum on random inputs") {
    // random groups, DUPLICATE ord values (id tie-break exercised),
    // ords spanning several width-5 blocks including empty ones
    val genRows = Gen.listOfN(35, for {
      g <- Gen.oneOf("a", "b", "c")
      o <- Gen.choose(0L, 60L)
      n <- Gen.choose(0L, 9L)
    } yield (g, o, n))
    check(Prop.forAll(genRows) { rows =>
      val df = rows.zipWithIndex.map { case ((g, o, n), i) =>
        (g, o, i.toLong, n)
      }.toDF("grp", "ord", "id", "n")
      val got = Pack.withGroupedOffset(df, "grp", col("ord"), "id", "n",
        blockWidth = 5)
        .select("grp", "ord", "id", "n", "__start").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      // brute force FROM THE INPUT (not from got — a silent row
      // drop/duplication must fail too): per group, sort by (ord, id),
      // running sum
      val input = rows.zipWithIndex.map { case ((g, o, n), i) =>
        (g, o, i.toLong, n)
      }
      val want = input.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy(r => (r._2, r._3))
          .scanLeft(("", 0L, 0L, 0L, 0L)) { case (acc, r) =>
            (r._1, r._2, r._3, r._4, acc._5 + acc._4)
          }.drop(1)
      }.toSet
      got.length == input.length && got.toSet == want
    })
  }

  test("CMS estimates bound exact counts on random token streams") {
    val genToks = Gen.listOfN(80, Gen.oneOf(
      (0 until 12).map(i => s"t$i")))
    check(Prop.forAll(genToks) { toks =>
      val cells = toks.toDF("t").repartition(5)
        .agg(expr("cms_sketch(t, 4, 64)")).as[Seq[Long]].head()
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (tok, n) =>
        val est = (0 until 4)
          .map(j => cells(j * 64 + graft.functions.CmsSketch.cell(j, tok, 64)))
          .min
        // never an underestimate, and over by at most the total
        // colliding mass (trivially bounded by the stream length)
        est >= n && est <= toks.size.toLong
      }
    })
  }
}
