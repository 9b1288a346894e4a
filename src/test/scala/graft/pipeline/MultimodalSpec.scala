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
  test("ImageCodec decodes a real PNG back to the exact generated pixels") {
    val id = 37L
    val png = synthImagePng(id)
    // a real PNG signature, not a fake buffer
    assert(png.take(8).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val raw = ImageCodec.decode(png, "png")
    val (w, h) = ImageCodec.rawDims(raw)
    assert(w === 16 + (id % 16).toInt && h === 16 + (id % 8).toInt)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = ImageCodec.rawPixel(raw, x, y)
      assert(r === ((id * 31 + x * 7 + y * 13) % 256).toInt, s"r at ($x,$y)")
      assert(g === ((id + x * 3 + y * 5) % 256).toInt, s"g at ($x,$y)")
      assert(b === ((id * 17 + x + y * 2) % 256).toInt, s"b at ($x,$y)")
    }
  }

  test("ImageCodec nearest-neighbor resize picks floor(dst*src/dstDim) pixels") {
    val raw = ImageCodec.decode(synthImagePng(5L), "png")
    val (w, h) = ImageCodec.rawDims(raw)
    val small = ImageCodec.resize(raw, 8, 8)
    assert(ImageCodec.rawDims(small) === ((8, 8)))
    for (y <- 0 until 8; x <- 0 until 8) {
      val (sx, sy) = ((x * w) / 8, (y * h) / 8)
      assert(ImageCodec.rawPixel(small, x, y) ===
        ImageCodec.rawPixel(raw, sx, sy), s"resized ($x,$y) from ($sx,$sy)")
    }
  }

  test("ImageCodec features are bucket means of real pixel intensities") {
    val raw = ImageCodec.decode(synthImagePng(11L), "png")
    val (w, h) = ImageCodec.rawDims(raw)
    val dim = 8
    val feats = ImageCodec.features(raw, dim)
    assert(feats.length === dim && feats.forall(f => f >= 0f && f <= 1f))
    // recompute bucket 0 by hand
    val members = (0 until w * h).filter(_ % dim == 0)
    val sum = members.map { p =>
      val (r, g, b) = ImageCodec.rawPixel(raw, p % w, p / w)
      r + g + b
    }.sum
    val expect = sum.toDouble / (members.size * 3d * 255d)
    assert(math.abs(feats(0) - expect) < 1e-6)
  }

  test("ImageCodec rejects undecodable payloads loudly") {
    val e = intercept[IllegalArgumentException] {
      ImageCodec.decode("definitely not an image".getBytes("UTF-8"), "png")
    }
    assert(e.getMessage.contains("undecodable"))
  }

  test("VideoCodec demuxes MJPG AVI and decodes frames within a tight band of the source ramps") {
    // tighter than q201's gated ±8: observed javax JPEG error on these
    // linear ramps at 1.0 quality is ±5 (residual chroma subsampling)
    // — a codec/regression canary at ±6
    (0L until 12L).foreach { id =>
      val raw = Multimodal.VideoCodec.decode(
        Multimodal.synthMjpegAvi(id), "avi")
      val (w, h, n, us) = Multimodal.VideoCodec.rawDims(raw)
      assert((w, h, n, us) ===
        ((8 + (id % 8).toInt, 8 + (id % 4).toInt, 2 + (id % 4).toInt, 40000)))
      var maxErr = 0
      for (f <- 0 until n; y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.VideoCodec.rawPixel(raw, f, x, y)
        val (er, eg, eb) = Multimodal.mjpegPixel(id, f, x, y)
        maxErr = math.max(maxErr, math.max(math.abs(r - er),
          math.max(math.abs(g - eg), math.abs(b - eb))))
      }
      assert(maxErr <= 6, s"clip $id decoded ±$maxErr from the source ramps")
    }
  }

  test("AudioCodec decodes a real WAV back to the exact generated samples") {
    val id = 23L
    val wav = synthWav(id)
    // a real RIFF/WAVE container, not a fake buffer
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val raw = AudioCodec.decode(wav, "wav")
    val (rate, n) = AudioCodec.rawDims(raw)
    assert(rate === 8000 && n === 800 + (id % 5).toInt * 160)
    (0 until n).foreach { i =>
      assert(AudioCodec.rawSample(raw, i) ===
        (((id * 7919 + i * 31) % 65536) - 32768).toInt, s"sample $i")
    }
  }

  test("AudioCodec resample/frame pick exact source indices") {
    val raw = AudioCodec.decode(synthWav(4L), "wav")
    val (rate, n) = AudioCodec.rawDims(raw)
    val small = AudioCodec.resize(raw, 100, 0)
    assert(AudioCodec.rawDims(small) === ((rate, 100)))
    (0 until 100).foreach { i =>
      assert(AudioCodec.rawSample(small, i) ===
        AudioCodec.rawSample(raw, (i.toLong * n / 100).toInt))
    }
    // a frame at 50 ms starts at sample 400 and is clamped to the clip
    val fr = AudioCodec.frame(raw, 50L)
    val (_, fn) = AudioCodec.rawDims(fr)
    assert(fn === math.min(rate, n - 400))
    assert(AudioCodec.rawSample(fr, 0) === AudioCodec.rawSample(raw, 400))
  }

  test("AudioCodec rejects undecodable payloads loudly") {
    val e = intercept[IllegalArgumentException] {
      AudioCodec.decode("definitely not audio".getBytes("UTF-8"), "wav")
    }
    assert(e.getMessage.contains("undecodable"))
  }

  test("VideoCodec demuxes a real AVI back to the exact generated frames") {
    val id = 13L
    val avi = synthAvi(id)
    // a real RIFF/AVI container
    assert(new String(avi.take(4), "US-ASCII") === "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") === "AVI ")
    val raw = VideoCodec.decode(avi, "avi")
    val (w, h, n, us) = VideoCodec.rawDims(raw)
    assert(w === 8 + (id % 8).toInt && h === 8 + (id % 4).toInt)
    assert(n === 2 + (id % 4).toInt && us === 40000)
    for (f <- 0 until n; y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = VideoCodec.rawPixel(raw, f, x, y)
      assert(r === ((id * 31 + f * 11 + x * 7 + y * 13) % 256).toInt,
        s"r at f$f ($x,$y)")
      assert(g === ((id + f * 19 + x * 3 + y * 5) % 256).toInt,
        s"g at f$f ($x,$y)")
      assert(b === ((id * 17 + f * 7 + x + y * 2) % 256).toInt,
        s"b at f$f ($x,$y)")
    }
  }

  test("VideoCodec frame selection floors by frame period and clamps") {
    val raw = VideoCodec.decode(synthAvi(3L), "avi") // 5 frames @40ms
    val (w, h, n, _) = VideoCodec.rawDims(raw)
    assert(n === 5)
    // ts 0 -> frame 0; ts 79 -> frame 1; ts 10_000 -> clamped to last
    Seq((0L, 0), (79L, 1), (40L, 1), (10000L, n - 1)).foreach {
      case (ts, want) =>
        val fr = VideoCodec.frame(raw, ts)
        assert(ImageCodec.rawDims(fr) === ((w, h)))
        assert(ImageCodec.rawPixel(fr, 1, 1) ===
          VideoCodec.rawPixel(raw, want, 1, 1), s"ts $ts -> frame $want")
    }
  }

  test("VideoCodec resize resamples every frame with exact index math") {
    val raw = VideoCodec.decode(synthAvi(9L), "avi")
    val (w, h, n, us) = VideoCodec.rawDims(raw)
    val small = VideoCodec.resize(raw, 4, 4)
    assert(VideoCodec.rawDims(small) === ((4, 4, n, us)))
    for (f <- 0 until n; y <- 0 until 4; x <- 0 until 4) {
      assert(VideoCodec.rawPixel(small, f, x, y) ===
        VideoCodec.rawPixel(raw, f, (x * w) / 4, (y * h) / 4))
    }
  }

  test("VideoCodec rejects undecodable payloads loudly") {
    val e = intercept[IllegalArgumentException] {
      VideoCodec.decode("definitely not a video".getBytes("UTF-8"), "avi")
    }
    assert(e.getMessage.contains("undecodable"))
  }

  test("VideoCodec rejects corrupt chunk sizes instead of hanging or walking out") {
    // adversarial size fields in an otherwise-valid container: sz = -8
    // makes the walk advance by 0 (infinite loop), other negatives walk
    // backwards, oversized sizes recurse past the buffer
    def withChunkSize(sz: Int): Array[Byte] = {
      val avi = synthAvi(1L)
      val bad = avi.clone()
      // first chunk inside the RIFF body is the hdrl LIST at offset 12;
      // its le32 size field sits at offset 16
      bad(16) = (sz & 0xff).toByte
      bad(17) = ((sz >> 8) & 0xff).toByte
      bad(18) = ((sz >> 16) & 0xff).toByte
      bad(19) = ((sz >> 24) & 0xff).toByte
      bad
    }
    for (sz <- Seq(-8, -1, Int.MinValue, Int.MaxValue)) {
      val e = intercept[IllegalArgumentException] {
        VideoCodec.decode(withChunkSize(sz), "avi")
      }
      assert(e.getMessage.contains("corrupt chunk"), s"size $sz")
    }
  }

  test("real image features feed LSH near-dup search: planted duplicates found") {
    import org.apache.spark.sql.functions.col
    // ids 0..19 but pixels keyed on id % 10: each image 0..9 appears
    // twice under different media ids — exact pixel duplicates
    val media = (0L until 20L).map { mid =>
      Media(mid, "image", synthImagePng(mid % 10), 0, 0, 0, 0L, "png")
    }.toDS().repartition(4)
    val feats = extractFeatures(media, dim = 16, codec = ImageCodec)
      .toDF("media_id", "kind", "features")
      .select(col("media_id").as("vec_id"),
        col("features").cast("array<double>").as("emb"))
    val pairs = AnnLsh.nearDupPairs(feats, "vec_id", "emb",
      nbits = 8, threshold = 0.9999).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical pixels -> bit-identical features -> same bucket, sim 1
    (0L until 10L).foreach { i =>
      assert(pairs.contains((i, i + 10L)),
        s"duplicate image pair ($i, ${i + 10L}) missed")
    }
    // distinct source images must not collide at this threshold
    assert(pairs.size === 10, s"false-positive pairs: ${pairs.size - 10}")
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

  test("q21 exact counts match countDistinct and the sketch stays in band") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q21_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    val exact = graft.Tables.load(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(rows(k)._1 === n, s"group $k: exact_users ${rows(k)._1} vs $n")
      assert(rows(k)._2, s"group $k: HLL estimate fell outside the 10% band")
    }
  }
}
