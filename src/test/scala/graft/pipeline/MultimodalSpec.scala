package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus: org.apache.spark.sql.Dataset[Media] =
    (1 to 100).map { i =>
      val kind = i % 3 match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"
      }
      Media(i.toLong, kind, s"payload-bytes-$i".getBytes("UTF-8"),
        width = 640, height = 480, sample_rate = 16000,
        duration_ms = 1000L * (i % 5 + 1), format = "fake")
    }.toDS().repartition(4)

  test("extractFeatures: right schema, dim, determinism, no shuffle") {
    val feats = extractFeatures(corpus, dim = 16)
    assert(feats.schema.fieldNames.toSeq === Seq("media_id", "kind", "features"))
    val rows = feats.collect()
    assert(rows.length === 100)
    assert(rows.forall(_.features.length === 16))
    // deterministic across recomputation (retries/speculation safe)
    val again = extractFeatures(corpus, dim = 16).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(rows.forall(f => again(f.media_id) == f.features.toSeq))
    // partition-local: input partitioning carries straight through
    assert(feats.rdd.getNumPartitions === corpus.rdd.getNumPartitions)
  }

  test("resize rewrites payload and metadata together") {
    val resized = resize(corpus, width = 64, height = 64).collect()
    assert(resized.forall(m => m.width === 64 && m.height === 64))
    assert(resized.forall(_.payload.nonEmpty))
  }

  test("frameSample fans out one row per interval for videos only") {
    val frames = frameSample(corpus, everyMs = 500L)
    val byMedia = frames.collect().groupBy(_.media_id)
    val videos = corpus.filter(_.kind == "video").collect()
    assert(byMedia.keySet === videos.map(_.media_id).toSet)
    videos.foreach { v =>
      val expected = math.max(1L, v.duration_ms / 500L).toInt
      assert(byMedia(v.media_id).length === expected,
        s"media ${v.media_id} duration ${v.duration_ms}")
      assert(byMedia(v.media_id).map(_.frame_idx).sorted.toSeq ===
        (0 until expected))
    }
  }

  test("media features feed similarity search end-to-end") {
    import org.apache.spark.sql.functions.col
    val feats = extractFeatures(corpus, dim = 16)
      .toDF("media_id", "kind", "features")
      .select(col("media_id").as("vec_id"),
        col("features").cast("array<double>").as("emb"))
    val queries = feats.where(col("vec_id") <= 2)
    val topk = Similarity.bruteForceTopK(feats, queries, k = 3)
    val rows = topk.collect()
    assert(rows.length === 6) // 2 queries x top-3
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // deterministic: the stub codec + brute force give a stable answer
    val again = Similarity.bruteForceTopK(feats, queries, k = 3).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("media round-trips through parquet with binary payload intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    corpus.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Media].collect()
      .map(m => m.media_id -> m.payload.toSeq).toMap
    assert(corpus.collect().forall(m => back(m.media_id) == m.payload.toSeq))
  }
  test("metadata pass digests payloads exactly, batched per partition") {
    val metas = Multimodal.metadata(corpus).collect()
      .map(m => m.media_id -> m).toMap
    assert(metas.size === 100)
    (1 to 100).foreach { i =>
      val payload = s"payload-bytes-$i".getBytes("UTF-8")
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = md.digest(payload).map("%02x".format(_)).mkString
      assert(metas(i.toLong).n_bytes === payload.length.toLong)
      assert(metas(i.toLong).payload_md5 === expect)
    }
    // partition-local: no shuffle introduced
    assert(Multimodal.metadata(corpus).rdd.getNumPartitions
      === corpus.rdd.getNumPartitions)
  }
}

class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q21 approx distinct within 10% of exact per group") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val approx = graft.SparkEntry.queries("q21_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.load(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(2L, (n * 0.1).toLong),
        s"group $k: approx ${approx(k)} vs exact $n")
    }
  }
}
