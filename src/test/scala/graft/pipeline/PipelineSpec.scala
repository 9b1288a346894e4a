package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("exact dedup removes the doubled half of a self-unioned corpus") {
    val base = Seq((1L, "Hello  World"), (2L, "other doc"), (3L, "hello world "))
      .toDF("doc_id", "text")
    val out = Dedup.exact(base, "doc_id", "text").collect()
    // 1 and 3 normalize to the same text -> survivor is doc 1
    assert(out.length === 2)
    assert(out.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L))
  }

  test("exactRows keeps full rows and the smallest id per fingerprint") {
    val base = Seq((5L, "a b", "x"), (2L, "A  B", "y"), (9L, "c", "z"))
      .toDF("doc_id", "text", "meta")
    val out = Dedup.exactRows(base, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 9L))
    assert(out.map(_.getString(2)).toSeq === Seq("y", "z"))
  }

  test("shingles produce n-grams and degrade to whole text when short") {
    val df = Seq(("a b c d", 1)).toDF("text", "id")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    assert(df.head().getSeq[String](0) === Seq("a b c", "b c d"))
    val short = Seq(("a b", 1)).toDF("text", "id")
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
    assert(short.head().getSeq[String](0) === Seq("a b"))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Seq(1d, 0d), Seq(1d, 0d), Seq(0d, 1d)))
      .toDF("a", "b", "c")
    val row = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).head()
    assert(math.abs(row.getDouble(0) - 1d) < 1e-12)
    assert(math.abs(row.getDouble(1)) < 1e-12)
  }

  test("native dot_f64 ≡ declarative zip_with/aggregate, bit-for-bit") {
    val e = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val pairs = e.limit(50).crossJoin(
      e.limit(50).select(col("emb").as("emb2")))
    val rows = pairs.select(
      Similarity.dot(col("emb"), col("emb2")).as("fast"),
      Similarity.dotDeclarative(col("emb"), col("emb2")).as("slow")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("bruteForceTopK returns k rows per query, self excluded, broadcast plan") {
    val e = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val topk = Similarity.bruteForceTopK(e, e.where(col("vec_id") < 3), k = 5)
    val rows = topk.collect()
    assert(rows.length === 15)
    assert(!rows.exists(r => r.getLong(0) == r.getLong(1)))
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"query side not broadcast:\n$plan")
  }

  test("native text_stats ≡ declarative formulation") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
      .union(Seq((900L, "the a the"), (901L, "x"), (902L, "  odd   WS\t here "))
        .toDF("doc_id", "text"))
    val fast = docs
      .select(col("doc_id"), expr("text_stats(text, 'the', 'a')").as("st"))
      .select(col("doc_id"), col("st.n_tokens"), col("st.avg_tok_len"),
        col("st.stop_ratio"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val ntext = TextOps.norm(col("text"))
    val slow = docs
      .withColumn("ntext", ntext)
      .withColumn("n_tokens", size(split(col("ntext"), " ")))
      .withColumn("avg_tok_len",
        round((length(col("ntext")) - col("n_tokens") + 1)
          / col("n_tokens").cast("double"), 6))
      .withColumn("stop_ratio",
        round(TextOps.markerScore(split(col("ntext"), " "), Seq("the", "a"))
          / col("n_tokens").cast("double"), 6))
      .select(col("doc_id"), col("n_tokens"), col("avg_tok_len"), col("stop_ratio"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(fast === slow)
  }

  test("IVF probed ANN recalls most of the brute-force top-k") {
    val e = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val queries = e.where(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(e, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = AnnIvf.topKProbed(e, e.where(col("vec_id") < 16), queries,
      k = 10, nprobe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.size === 30) // k results per query even when probing
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"probed recall suspiciously low: $recall")
    // and the probe plan broadcasts the small sides
    val plan = AnnIvf.topKProbed(e, e.where(col("vec_id") < 16), queries,
      k = 10, nprobe = 4).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast in:\n$plan")
  }

  test("VectorMean aggregator averages element-wise with partial merge") {
    import org.apache.spark.sql.functions.udaf
    val mean = udaf(graft.functions.VectorMean)
    val df = Seq(
      ("a", Seq(1d, 2d)), ("a", Seq(3d, 4d)), ("b", Seq(10d, 20d)))
      .toDF("g", "v").repartition(3) // force cross-partition merge
    val got = df.groupBy("g").agg(mean(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") === Seq(2d, 3d))
    assert(got("b") === Seq(10d, 20d))
  }

  test("trained IVF centroids are deterministic and improve assignment tightness") {
    val e = graft.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val t1 = AnnIvf.trainCentroids(e, k = 8, iters = 2).collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getSeq[Double](1)).toMap
    val t2 = AnnIvf.trainCentroids(e, k = 8, iters = 2).collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getSeq[Double](1)).toMap
    assert(t1 === t2) // deterministic across runs
    assert(t1.nonEmpty && t1.size <= 8)
    assert(t1.values.forall(_.length === 64))
  }

  test("connected components propagate min labels across chains") {
    // chain 1-2-3-4 (diameter 3: needs >1 round), disjoint pair 10-11,
    // singleton 20 (no edges at all)
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    val got = Cluster.connectedComponents(nodes, edges, "id", "a", "b")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    val surv = Cluster.survivors(
      Cluster.connectedComponents(nodes, edges, "id", "a", "b"), "id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(surv === Seq(1L, 10L, 20L))
  }

  test("sliding chunks cover every token with the declared overlap") {
    // 10 tokens, window 4, stride 3 -> starts 0,3,6,9; last truncated
    val df = Seq((7L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val got = Chunk.sliding(df, "doc_id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_tok_chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
  }

  test("a document shorter than the window is one untruncated chunk") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val got = Chunk.sliding(df, "doc_id", "text", window = 32, stride = 24)
      .select("chunk_idx", "start_tok", "n_tok_chunk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 0L, 2L)))
  }

  test("identical chunk text hashes identically across documents") {
    val df = Seq((1L, "x y z"), (2L, "x  Y z")).toDF("doc_id", "text")
    val md5s = Chunk.sliding(df, "doc_id", "text", window = 8, stride = 8)
      .select("chunk_md5").collect().map(_.getString(0))
    assert(md5s.distinct.length === 1) // normalization folds case/spacing
  }

  test("edge endpoints outside the node list propagate but don't poison convergence") {
    // 0-9-20 is one component bridged by 20, which is NOT in `nodes`;
    // the round-1 sum happens to equal the initial sum (9's decrease
    // offset by 20 entering at label 9), the exact false-convergence
    // trap when outside endpoints join labels mid-flight
    val nodes = Seq(0L, 9L).toDF("id")
    val edges = Seq((0L, 9L), (9L, 20L)).toDF("a", "b")
    val got = Cluster.connectedComponents(nodes, edges, "id", "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((0L, 0L), (9L, 0L))) // 20 excluded, labels minimal
  }

  test("salted join keeps rows whose salt source is null") {
    val left = Seq((Some(1L), "k"), (None, "k")).toDF("id", "k")
    val right = Seq(("k", 9)).toDF("k", "v")
    val got = SkewJoin.saltedInner(left, right, "k", col("id"), saltN = 4)
      .collect()
    assert(got.length === 2) // the null-id row must survive the join
  }

  test("connected components refuse to return unconverged labels") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L)).toDF("a", "b") // diameter 2
    intercept[IllegalArgumentException] {
      Cluster.connectedComponents(nodes, edges, "id", "a", "b", maxRounds = 1)
        .collect()
    }
    // edge-free graph converges immediately even at maxRounds = 1
    val lone = Cluster.connectedComponents(
      Seq(7L).toDF("id"), edges.limit(0), "id", "a", "b", maxRounds = 1)
      .collect()
    assert(lone.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((7L, 7L)))
  }

  test("global offset equals a naive global cumsum, across blocks") {
    val df = (0L until 57L).map(i => (i * 3 + 1, (i % 7) + 1)) // sparse ids
      .toDF("id", "n")
    val got = Pack.withGlobalOffset(df, "id", "n", blockWidth = 10)
      .select("id", "n", "__start").orderBy("id").collect()
    var running = 0L
    got.foreach { r =>
      assert(r.getLong(2) === running, s"offset wrong at id=${r.getLong(0)}")
      running += r.getLong(1)
    }
  }

  test("grouped offset equals a naive per-group cumsum, across blocks") {
    // two groups interleaved, ord values spanning several width-10
    // blocks, one duplicate ord per group to exercise the id tie-break
    val df = (0L until 60L)
      .map(i => (if (i % 2 == 0) "g1" else "g2", (i * 7) % 40, i, (i % 5) + 1))
      .toDF("grp", "ord", "id", "n")
    val got = Pack.withGroupedOffset(df, "grp", col("ord"), "id", "n",
      blockWidth = 10)
      .select("grp", "ord", "id", "n", "__start")
      .orderBy("grp", "ord", "id").collect()
    val running = scala.collection.mutable.Map.empty[String, Long]
    got.foreach { r =>
      val g = r.getString(0)
      assert(r.getLong(4) === running.getOrElse(g, 0L),
        s"offset wrong at grp=$g id=${r.getLong(2)}")
      running(g) = running.getOrElse(g, 0L) + r.getLong(3)
    }
    // reserved working columns are rejected loudly, not overwritten
    intercept[IllegalArgumentException] {
      Pack.withGroupedOffset(df.withColumn("__start", lit(1)),
        "grp", col("ord"), "id", "n", blockWidth = 10)
    }
  }

  test("concat-and-chunk packing splits straddling docs exactly") {
    // capacity 4: starts 0,3,7 -> doc2 straddles chunks 0/1, doc3 1/2
    val df = Seq((1L, 3L), (2L, 4L), (3L, 2L)).toDF("doc_id", "n_tok_doc")
    val got = Pack.concatChunks(df, "doc_id", "n_tok_doc", capacity = 4)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 0L, 3L), (2L, 0L, 1L), (2L, 1L, 3L), (3L, 1L, 1L), (3L, 2L, 1L)))
    // invariants: per-doc totals and full chunks at capacity
    val perDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perDoc === Map(1L -> 3L, 2L -> 4L, 3L -> 2L))
    val perChunk = got.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(perChunk === Map(0L -> 4L, 1L -> 4L, 2L -> 1L))
  }

  test("zero-token docs are dropped from packing, offsets unaffected") {
    val df = Seq((1L, 2L), (2L, 0L), (3L, 3L)).toDF("doc_id", "n_tok_doc")
    val got = Pack.concatChunks(df, "doc_id", "n_tok_doc", capacity = 10)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 0L, 2L), (3L, 0L, 3L)))
  }

  test("range join matches within the window, including across buckets") {
    // gap 10: left t=5 must catch right t=12 (right bucket 1 -> copy
    // into bucket 0 where the left row lives)
    val l = Seq((1L, 10L, 0L), (1L, 11L, 5L), (1L, 12L, 10L), (2L, 13L, 0L))
      .toDF("k", "lid", "t_l")
    val r = Seq((1L, 20L, 5L), (1L, 21L, 9L), (1L, 22L, 12L), (1L, 23L, 25L),
      (2L, 24L, 3L))
      .toDF("k", "rid", "t_r")
    val got = RangeJoin.inner(l, r, "k", "t_l", "t_r", gap = 10L)
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set(
      (10L, 20L), (10L, 21L), // [0,10): 5, 9
      (11L, 20L), (11L, 21L), (11L, 22L), // [5,15): 5, 9, 12
      (12L, 22L), // [10,20): 12
      (13L, 24L))) // other key, [0,10): 3
  }

  test("salted join equals the plain join and spreads hot keys") {
    val left = (1L to 100L).map(i => (i, if (i % 10 == 0) "hot" else "cold"))
      .toDF("id", "k")
    val right = Seq(("hot", 1), ("cold", 2)).toDF("k", "v")
    val salted = SkewJoin.saltedInner(left, right, "k", col("id"), saltN = 8)
      .orderBy("id").collect().map(r => (r.getLong(1), r.getInt(2)))
    val plain = left.join(right, "k")
      .orderBy("id").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(salted.toSeq === plain.toSeq)
    assert(salted.length === 100)
  }

  test("lang-id scores are consistent with token content") {
    val df = Seq((1L, "the cat and the hat"), (2L, "der die das und"),
      (3L, "xyz qqq")).toDF("doc_id", "text")
    val toks = TextOps.tokens(col("text"))
    val out = df.select(col("doc_id"),
      TextOps.markerScore(toks, TextOps.langMarkers.toMap.apply("en")).as("s_en"),
      TextOps.markerScore(toks, TextOps.langMarkers.toMap.apply("de")).as("s_de"))
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) === 3 && out(0).getInt(2) === 0)
    assert(out(1).getInt(1) === 0 && out(1).getInt(2) === 4)
    assert(out(2).getInt(1) === 0 && out(2).getInt(2) === 0)
  }
}
