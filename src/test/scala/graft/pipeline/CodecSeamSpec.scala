package graft.pipeline

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Multimodal._

/** The documented ffmpeg deployment seam, proven to actually plug: a
  * THIRD-PARTY codec for a fake compressed format ("fkv" — an
  * xor-obfuscated AVI standing in for H.264-in-AVI) runs through the
  * UNMODIFIED extractFeatures / frameSample operators, produces the
  * same answers as the built-in [[Multimodal.VideoCodec]] on the
  * uncompressed twin, and initializes its (expensive, non-serializable)
  * decoder context exactly once per task — the per-partition
  * amortization contract a real ffmpeg context needs.
  */
object CodecSeamSpec {
  val inits = new AtomicInteger(0)

  /** What a deployment would write: decompress ("xor"), then reuse the
    * container demuxer. No operator code involved.
    */
  class FkvCodec extends Codec {
    // the "ffmpeg context": expensive to open, must not be opened per
    // record, cannot be serialized — @transient lazy is the pattern
    @transient private lazy val ctx: Long = {
      CodecSeamSpec.inits.incrementAndGet(); 0xC0DEC
    }
    private def decompress(payload: Array[Byte]): Array[Byte] = {
      require(ctx == 0xC0DEC)
      payload.map(b => (b ^ 0x5a).toByte)
    }
    def decode(payload: Array[Byte], format: String): Array[Byte] = {
      require(format == "fkv", s"FkvCodec: not an fkv payload ($format)")
      VideoCodec.decode(decompress(payload), "avi")
    }
    def resize(raw: Array[Byte], width: Int, height: Int): Array[Byte] =
      VideoCodec.resize(raw, width, height)
    def features(raw: Array[Byte], dim: Int): Array[Float] =
      VideoCodec.features(raw, dim)
    def frame(raw: Array[Byte], tsMs: Long): Array[Byte] =
      VideoCodec.frame(raw, tsMs)
  }
}

class CodecSeamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media(ids: Seq[Long], fmt: String,
      parts: Int): org.apache.spark.sql.Dataset[Media] = {
    import spark.implicits._
    val rows = ids.map { id =>
      val avi = synthAvi(id)
      val payload =
        if (fmt == "fkv") avi.map(b => (b ^ 0x5a).toByte) else avi
      Media(id, "video", payload, 0, 0, 0,
        duration_ms = 400L, format = fmt)
    }
    spark.createDataset(rows).repartition(parts)
  }

  test("a compressed-format codec plugs into extractFeatures unchanged") {
    val plain = Multimodal.extractFeatures(
      media(0L until 12L, "avi", 3), dim = 8, codec = VideoCodec)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val viaSeam = Multimodal.extractFeatures(
      media(0L until 12L, "fkv", 3), dim = 8,
      codec = new CodecSeamSpec.FkvCodec)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(viaSeam === plain)
  }

  test("frameSample through the seam equals the built-in codec") {
    val plain = Multimodal.frameSample(
      media(0L until 6L, "avi", 2), everyMs = 100L, codec = VideoCodec)
      .collect().map(f => (f.media_id, f.frame_idx) -> f.payload.toSeq).toMap
    val viaSeam = Multimodal.frameSample(
      media(0L until 6L, "fkv", 2), everyMs = 100L,
      codec = new CodecSeamSpec.FkvCodec)
      .collect().map(f => (f.media_id, f.frame_idx) -> f.payload.toSeq).toMap
    assert(viaSeam === plain)
  }

  test("decoder context opens once per task, not per record") {
    CodecSeamSpec.inits.set(0)
    val parts = 4
    val out = Multimodal.extractFeatures(
      media(0L until 32L, "fkv", parts), dim = 4,
      codec = new CodecSeamSpec.FkvCodec).collect()
    assert(out.length === 32)
    // 32 records in 4 partitions: a per-record init would be 32
    assert(CodecSeamSpec.inits.get() === parts,
      s"expected one ffmpeg-context init per task, " +
        s"got ${CodecSeamSpec.inits.get()} for $parts partitions")
  }
}
