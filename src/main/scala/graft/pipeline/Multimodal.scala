package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` payloads plus typed metadata, with
  * decode / resize / feature-extract / frame-sample as per-partition
  * batched transforms.
  *
  * Execution shape (the part that matters at 100 TB): every operator
  * is `mapPartitions` over bounded batches — the Scala analog of an
  * Arrow-batched pandas UDF — so payload bytes never leave executors,
  * nothing shuffles, and partitioning/ordering of the input is
  * preserved. Codecs are pluggable per partition (one init per task,
  * amortized over the batch, like a pandas-UDF's per-batch model load).
  *
  * Codecs: all three media kinds decode for REAL through JDK-native
  * code paths, each oracle-gated against a closed-form pixel/sample
  * oracle — [[Multimodal.ImageCodec]] (PNG/JPEG via `javax.imageio`,
  * deterministic nearest-neighbor resize, features from actual pixel
  * values; q78), [[Multimodal.AudioCodec]] (WAV/PCM via
  * `javax.sound.sampled`; q79), and [[Multimodal.VideoCodec]] (a pure
  * RIFF/AVI demuxer for uncompressed BI_RGB frames; q80). The only
  * remaining seam is COMPRESSED formats (MP3, H.264, JPEG-in-AVI):
  * no ffmpeg ships in this environment, so those arrive by plugging
  * an ffmpeg-backed [[Multimodal.Codec]] — deployment configuration,
  * not operator code (CodecSeamSpec proves the plug point).
  * [[Multimodal.StubCodec]] remains only as a clearly-labeled test
  * fake for plumbing tests.
  */
object Multimodal {

  /** One media row: binary payload + typed metadata (flat columns so
    * parquet stats/pruning work on the metadata without touching
    * payload bytes).
    */
  case class Media(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long,
      format: String)

  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])

  case class MediaMeta(media_id: Long, n_bytes: Long, payload_md5: String)

  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long, payload: Array[Byte])

  /** Pluggable per-executor codec. Implementations must be
    * deterministic for a given payload (retries/speculative tasks).
    */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte], format: String): Array[Byte]
    def resize(raw: Array[Byte], width: Int, height: Int): Array[Byte]
    def features(raw: Array[Byte], dim: Int): Array[Float]
    def frame(raw: Array[Byte], tsMs: Long): Array[Byte]
  }

  /** STUB: deterministic fake codec — NOT a real media decoder (no
    * image/audio libs in this environment). Real deployments supply a
    * libjpeg/libsndfile/ffmpeg-backed Codec; everything around it is
    * unchanged.
    */
  object StubCodec extends Codec {
    private def mix(bytes: Array[Byte], salt: Long): Long =
      bytes.foldLeft(salt)((h, b) => h * 31 + b)

    def decode(payload: Array[Byte], format: String): Array[Byte] = {
      // fake "raw" buffer: payload digest replicated — stable, cheap
      val h = mix(payload, format.length.toLong)
      Array.tabulate[Byte](64)(i => ((h >>> (i % 8 * 8)) & 0xff).toByte)
    }

    def resize(raw: Array[Byte], width: Int, height: Int): Array[Byte] =
      Array.tabulate[Byte](math.min(64, math.max(1, (width * height) % 64)))(
        i => raw(i % raw.length))

    def features(raw: Array[Byte], dim: Int): Array[Float] = {
      val h = mix(raw, 7L)
      Array.tabulate(dim)(i => (((h >>> (i % 16)) & 0xffff).toFloat / 65535f))
    }

    def frame(raw: Array[Byte], tsMs: Long): Array[Byte] =
      Array.tabulate[Byte](16)(i => (raw(i % raw.length) + tsMs % 7).toByte)
  }

  /** REAL image codec over the JDK's built-in `javax.imageio`
    * (PNG/JPEG/BMP/GIF — zero external dependencies). The canonical
    * raw form is an 8-byte big-endian (width, height) header followed
    * by row-major 3-byte RGB triplets; every derived value is integer
    * pixel arithmetic, so decode → resize → features is bit-stable
    * across retries, executors, and engines (q78's DuckDB oracle
    * recomputes the same sums from a closed-form pixel function).
    */
  object ImageCodec extends Codec {

    /** (width, height) of a canonical raw buffer. */
    def rawDims(raw: Array[Byte]): (Int, Int) = {
      val bb = java.nio.ByteBuffer.wrap(raw)
      (bb.getInt(0), bb.getInt(4))
    }

    /** RGB triplet of pixel (x, y) in a canonical raw buffer. */
    def rawPixel(raw: Array[Byte], x: Int, y: Int): (Int, Int, Int) = {
      val w = java.nio.ByteBuffer.wrap(raw).getInt(0)
      val o = 8 + (y * w + x) * 3
      (raw(o) & 0xff, raw(o + 1) & 0xff, raw(o + 2) & 0xff)
    }

    /** 2×2 box-filter downsample of a canonical raw buffer: each
      * output channel is the truncating mean of its four source
      * pixels ((p₀₀ + p₀₁ + p₁₀ + p₁₁) div 4 — integer-exact,
      * engine-replayable), odd trailing rows/columns dropped (floor
      * dims). The antialiasing resize next to [[resize]]'s
      * nearest-neighbor decimation — what a vision-data pipeline
      * actually runs before feature extraction.
      */
    def boxDownsample(raw: Array[Byte]): Array[Byte] = {
      val (w, h) = rawDims(raw)
      val (w2, h2) = (w / 2, h / 2)
      val out = new Array[Byte](8 + w2 * h2 * 3)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, w2); bb.putInt(4, h2)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          var c = 0
          while (c < 3) {
            val s = (raw(8 + (2 * y * w + 2 * x) * 3 + c) & 0xff) +
              (raw(8 + (2 * y * w + 2 * x + 1) * 3 + c) & 0xff) +
              (raw(8 + ((2 * y + 1) * w + 2 * x) * 3 + c) & 0xff) +
              (raw(8 + ((2 * y + 1) * w + 2 * x + 1) * 3 + c) & 0xff)
            out(8 + (y * w2 + x) * 3 + c) = (s / 4).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }

    private def toRaw(img: java.awt.image.BufferedImage): Array[Byte] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Byte](8 + w * h * 3)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, w); bb.putInt(4, h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // getRGB converts any source type (indexed, BGR, gray) to
          // packed sRGB — one deterministic colorspace for the raw form
          val argb = img.getRGB(x, y)
          val o = 8 + (y * w + x) * 3
          out(o) = ((argb >> 16) & 0xff).toByte
          out(o + 1) = ((argb >> 8) & 0xff).toByte
          out(o + 2) = (argb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }

    def decode(payload: Array[Byte], format: String): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      // null (not an exception) is ImageIO's undecodable signal —
      // surface it loudly; a corrupt payload silently becoming an
      // empty buffer would poison everything downstream
      require(img != null,
        s"ImageCodec: undecodable $format payload (${payload.length} bytes)")
      toRaw(img)
    }

    /** Nearest-neighbor resample — pure index arithmetic
      * (src = floor(dst·srcDim/dstDim)), no filtering library, so the
      * result is the same on every JVM and mirrors the oracle's SQL. */
    def resize(raw: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(width > 0 && height > 0, s"bad resize target $width x $height")
      val (sw, sh) = rawDims(raw)
      val out = new Array[Byte](8 + width * height * 3)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, width); bb.putInt(4, height)
      var y = 0
      while (y < height) {
        val sy = (y.toLong * sh / height).toInt
        var x = 0
        while (x < width) {
          val sx = (x.toLong * sw / width).toInt
          val so = 8 + (sy * sw + sx) * 3
          val o = 8 + (y * width + x) * 3
          out(o) = raw(so); out(o + 1) = raw(so + 1); out(o + 2) = raw(so + 2)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Grid-pooled intensity features: pixels are striped into `dim`
      * buckets by flat index, and each feature is the bucket's mean
      * (r+g+b) normalized to [0, 1]. Integer accumulation, one float
      * division at the end. */
    def features(raw: Array[Byte], dim: Int): Array[Float] = {
      require(dim > 0, s"bad feature dim $dim")
      val (w, h) = rawDims(raw)
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var p = 0
      val n = w * h
      while (p < n) {
        val o = 8 + p * 3
        sums(p % dim) += (raw(o) & 0xff) + (raw(o + 1) & 0xff) + (raw(o + 2) & 0xff)
        counts(p % dim) += 1
        p += 1
      }
      Array.tabulate(dim)(i =>
        if (counts(i) == 0) 0f
        else (sums(i).toDouble / (counts(i) * 3d * 255d)).toFloat)
    }

    /** A still image is its own single frame. */
    def frame(raw: Array[Byte], tsMs: Long): Array[Byte] = raw
  }

  /** REAL audio codec over the JDK's built-in `javax.sound.sampled`
    * (WAV/PCM — zero external dependencies, no audio hardware
    * involved). Canonical raw form: 8-byte big-endian (sampleRate,
    * nSamples) header + 16-bit little-endian signed mono samples.
    * PCM WAV is lossless, so q79's oracle can recompute every decoded
    * sample from the closed-form generator. Compressed formats
    * (MP3/AAC/Opus) stay out of scope in-sandbox — same deployment
    * seam as the ffmpeg-backed video codec.
    */
  object AudioCodec extends Codec {

    /** (sampleRate, nSamples) of a canonical raw buffer. */
    def rawDims(raw: Array[Byte]): (Int, Int) = {
      val bb = java.nio.ByteBuffer.wrap(raw)
      (bb.getInt(0), bb.getInt(4))
    }

    /** Signed 16-bit sample `i` of a canonical raw buffer. */
    def rawSample(raw: Array[Byte], i: Int): Int = {
      val o = 8 + i * 2
      ((raw(o) & 0xff) | (raw(o + 1) << 8)).toShort.toInt
    }

    def decode(payload: Array[Byte], format: String): Array[Byte] = {
      val in0 = try javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"AudioCodec: undecodable $format payload " +
              s"(${payload.length} bytes)", e)
      }
      // G.711 companded payloads (µ-law/A-law — WAV format tags 7/6,
      // the telephony 2:1 COMPRESSED encodings) decode through the
      // JDK's own FormatConversionProvider to the canonical 16-bit
      // PCM form; the expansion tables are fixed by ITU G.711, so the
      // decode is bit-deterministic (UlawCodecSpec/AlawCodecSpec pin
      // all 256 values of BOTH tables against the closed forms the
      // q302/q326 oracles use)
      val enc = in0.getFormat.getEncoding
      val in =
        if (enc == javax.sound.sampled.AudioFormat.Encoding.ULAW ||
            enc == javax.sound.sampled.AudioFormat.Encoding.ALAW) {
          val f0 = in0.getFormat
          javax.sound.sampled.AudioSystem.getAudioInputStream(
            new javax.sound.sampled.AudioFormat(
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
              f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
              f0.getSampleRate, false), in0)
        } else in0
      val f = in.getFormat
      require(f.getSampleSizeInBits == 16 && f.getChannels == 1
        && !f.isBigEndian,
        s"AudioCodec: expected 16-bit LE mono PCM, got $f")
      val pcm = in.readAllBytes()
      val out = new Array[Byte](8 + pcm.length)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, f.getSampleRate.toInt)
      bb.putInt(4, pcm.length / 2)
      System.arraycopy(pcm, 0, out, 8, pcm.length)
      out
    }

    /** Nearest-neighbor resample to `width` samples (height unused) —
      * the same src = floor(dst·srcN/dstN) index arithmetic as
      * [[ImageCodec.resize]], deterministic on every JVM. */
    def resize(raw: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(width > 0, s"bad resample target $width")
      val (rate, n) = rawDims(raw)
      val out = new Array[Byte](8 + width * 2)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, rate); bb.putInt(4, width)
      var i = 0
      while (i < width) {
        val s = (i.toLong * n / width).toInt
        out(8 + i * 2) = raw(8 + s * 2)
        out(8 + i * 2 + 1) = raw(8 + s * 2 + 1)
        i += 1
      }
      out
    }

    /** Striped mean-absolute-amplitude features, normalized to [0, 1]
      * — integer accumulation, one float division at the end. */
    def features(raw: Array[Byte], dim: Int): Array[Float] = {
      require(dim > 0, s"bad feature dim $dim")
      val (_, n) = rawDims(raw)
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var i = 0
      while (i < n) {
        sums(i % dim) += math.abs(rawSample(raw, i).toLong)
        counts(i % dim) += 1
        i += 1
      }
      Array.tabulate(dim)(d =>
        if (counts(d) == 0) 0f
        else (sums(d).toDouble / (counts(d) * 32768d)).toFloat)
    }

    /** The frame at `tsMs`: one sample-rate-sized window starting at
      * the timestamp (clamped to the clip), as canonical raw. */
    def frame(raw: Array[Byte], tsMs: Long): Array[Byte] = {
      val (rate, n) = rawDims(raw)
      val start = math.min(n.toLong - 1L, tsMs * rate / 1000L).toInt.max(0)
      val len = math.min(rate, n - start)
      val out = new Array[Byte](8 + len * 2)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, rate); bb.putInt(4, len)
      System.arraycopy(raw, 8 + start * 2, out, 8, len * 2)
      out
    }
  }

  /** REAL video codec for uncompressed-DIB AVI — a complete RIFF
    * container demuxer in pure JDK code (AVI is the RIFF grammar:
    * `RIFF('AVI ' LIST('hdrl' avih strl) LIST('movi' 00db...))`, with
    * frames as bottom-up, 4-byte-row-padded BGR bitmaps per the
    * BITMAPINFOHEADER spec). Raw DIB frames are lossless, so q80's
    * oracle recomputes every decoded pixel from the closed-form
    * generator — the same gate discipline as the image/audio codecs.
    * Compressed codecs (H.264/VP9) remain the ffmpeg deployment seam.
    *
    * Canonical raw form: 16-byte big-endian header (width, height,
    * nFrames, usPerFrame) + nFrames × width·height·3 top-down RGB
    * frames. [[frame]] returns a single frame in [[ImageCodec]]'s raw
    * layout, so per-frame image ops compose directly.
    */
  object VideoCodec extends Codec {

    /** (width, height, nFrames, usPerFrame) of a canonical raw buffer. */
    def rawDims(raw: Array[Byte]): (Int, Int, Int, Int) = {
      val bb = java.nio.ByteBuffer.wrap(raw)
      (bb.getInt(0), bb.getInt(4), bb.getInt(8), bb.getInt(12))
    }

    /** RGB triplet of pixel (x, y) in frame f of a canonical raw. */
    def rawPixel(raw: Array[Byte], f: Int, x: Int, y: Int): (Int, Int, Int) = {
      val bb = java.nio.ByteBuffer.wrap(raw)
      val (w, h) = (bb.getInt(0), bb.getInt(4))
      val o = 16 + (f * w * h + y * w + x) * 3
      (raw(o) & 0xff, raw(o + 1) & 0xff, raw(o + 2) & 0xff)
    }

    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** `BITMAPINFOHEADER.biCompression` little-endian value of the
      * 'MJPG' fourcc — each movi chunk is then a complete baseline
      * JPEG (Motion-JPEG), decoded per frame via javax.imageio.
      */
    private val MjpgFourcc = 0x47504A4D

    def decode(payload: Array[Byte], format: String): Array[Byte] = {
      require(payload.length >= 12 && fourcc(payload, 0) == "RIFF"
        && fourcc(payload, 8) == "AVI ",
        s"VideoCodec: undecodable $format payload " +
          s"(${payload.length} bytes, not a RIFF/AVI container)")
      var usPerFrame = 0
      var w = 0; var h = 0
      var compression = 0
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      // generic RIFF chunk walk; LIST chunks recurse into their body
      def walk(from: Int, to: Int): Unit = {
        var o = from
        while (o + 8 <= to) {
          val id = fourcc(payload, o)
          val sz = le32(payload, o + 4)
          // the size field is attacker-controlled: a negative value
          // walks backwards or loops forever (sz = -8 advances by 0),
          // an oversized one recurses past the buffer — fail loudly
          // like every other undecodable-container path. Long
          // arithmetic: o + 8 + Int.MaxValue wraps negative in Int and
          // would slip past the bound
          require(sz >= 0 && o + 8 + sz.toLong <= payload.length,
            s"VideoCodec: corrupt chunk '$id' at offset $o " +
              s"(size $sz, container ${payload.length} bytes)")
          if (id == "LIST" || id == "RIFF") walk(o + 12, o + 8 + sz)
          else id match {
            case "avih" => usPerFrame = le32(payload, o + 8)
            case "strf" =>
              require(le32(payload, o + 8) == 40,
                "VideoCodec: unexpected BITMAPINFOHEADER size")
              w = le32(payload, o + 12); h = le32(payload, o + 16)
              compression = le32(payload, o + 24)
              require((le16(payload, o + 22) == 24 && compression == 0)
                || compression == MjpgFourcc,
                "VideoCodec: only 24-bit uncompressed DIB (BI_RGB) " +
                  "or MJPG (JPEG-in-AVI) frames")
            case "00db" | "00dc" => frames += ((o + 8, sz))
            case _ => () // strh, idx1, JUNK, ...
          }
          o += 8 + sz + (sz & 1) // chunks are word-aligned
        }
      }
      walk(12, payload.length)
      require(w > 0 && h > 0 && frames.nonEmpty,
        "VideoCodec: no video stream header or frames in container")
      val out = new Array[Byte](16 + frames.size * w * h * 3)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, w); bb.putInt(4, h)
      bb.putInt(8, frames.size); bb.putInt(12, usPerFrame)
      if (compression == MjpgFourcc) {
        // MJPEG: every chunk is an independent baseline JPEG —
        // per-frame decode through the image codec (pure javax.imageio,
        // the same path q78 gates), already top-down RGB behind its
        // 8-byte header
        frames.zipWithIndex.foreach { case ((off, sz), f) =>
          val img = ImageCodec.decode(
            java.util.Arrays.copyOfRange(payload, off, off + sz), "jpeg")
          val ib = java.nio.ByteBuffer.wrap(img)
          require(ib.getInt(0) == w && ib.getInt(4) == h,
            s"VideoCodec: MJPG frame $f is ${ib.getInt(0)}x${ib.getInt(4)}, " +
              s"stream header says ${w}x$h")
          System.arraycopy(img, 8, out, 16 + f * w * h * 3, w * h * 3)
        }
        return out
      }
      val rowBytes = (w * 3 + 3) & ~3 // DIB rows pad to 4 bytes
      frames.zipWithIndex.foreach { case ((off, sz), f) =>
        require(sz >= rowBytes * h, s"VideoCodec: frame $f truncated")
        var y = 0
        while (y < h) {
          // DIB rows are bottom-up BGR; canonical is top-down RGB
          val src = off + (h - 1 - y) * rowBytes
          var x = 0
          while (x < w) {
            val o = 16 + (f * w * h + y * w + x) * 3
            out(o) = payload(src + x * 3 + 2)     // R
            out(o + 1) = payload(src + x * 3 + 1) // G
            out(o + 2) = payload(src + x * 3)     // B
            x += 1
          }
          y += 1
        }
      }
      out
    }

    /** The frame nearest `tsMs` (floor by frame period, clamped), in
      * [[ImageCodec]]'s single-image raw layout. */
    def frame(raw: Array[Byte], tsMs: Long): Array[Byte] = {
      val (w, h, n, us) = rawDims(raw)
      val f = if (us <= 0) 0
        else math.min(n - 1L, tsMs * 1000L / us).toInt.max(0)
      val out = new Array[Byte](8 + w * h * 3)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, w); bb.putInt(4, h)
      System.arraycopy(raw, 16 + f * w * h * 3, out, 8, w * h * 3)
      out
    }

    /** Nearest-neighbor resize of every frame — same index arithmetic
      * as [[ImageCodec.resize]], applied per frame. */
    def resize(raw: Array[Byte], width: Int, height: Int): Array[Byte] = {
      require(width > 0 && height > 0, s"bad resize target $width x $height")
      val (sw, sh, n, us) = rawDims(raw)
      val out = new Array[Byte](16 + n * width * height * 3)
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, width); bb.putInt(4, height)
      bb.putInt(8, n); bb.putInt(12, us)
      var f = 0
      while (f < n) {
        var y = 0
        while (y < height) {
          val sy = (y.toLong * sh / height).toInt
          var x = 0
          while (x < width) {
            val sx = (x.toLong * sw / width).toInt
            val so = 16 + (f * sw * sh + sy * sw + sx) * 3
            val o = 16 + (f * width * height + y * width + x) * 3
            out(o) = raw(so); out(o + 1) = raw(so + 1); out(o + 2) = raw(so + 2)
            x += 1
          }
          y += 1
        }
        f += 1
      }
      out
    }

    /** Striped mean-intensity features pooled across ALL frames. */
    def features(raw: Array[Byte], dim: Int): Array[Float] = {
      require(dim > 0, s"bad feature dim $dim")
      val (w, h, n, _) = rawDims(raw)
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var p = 0
      val total = n * w * h
      while (p < total) {
        val o = 16 + p * 3
        sums(p % dim) += (raw(o) & 0xff) + (raw(o + 1) & 0xff) + (raw(o + 2) & 0xff)
        counts(p % dim) += 1
        p += 1
      }
      Array.tabulate(dim)(d =>
        if (counts(d) == 0) 0f
        else (sums(d).toDouble / (counts(d) * 3d * 255d)).toFloat)
    }
  }

  /** Deterministic synthetic AVI clip: a real RIFF/AVI container
    * (avih + vids/DIB stream headers, word-aligned 00db chunks,
    * bottom-up 4-byte-padded BGR frames) whose frame-f pixel at
    * (x, y) is the fixed mod-256 polynomial below. 25 fps
    * (40 000 µs/frame), 2 + (id mod 4) frames, width 8 + (id mod 8),
    * height 8 + (id mod 4). Lossless, so q80's oracle recomputes
    * every decoded value in SQL.
    */
  def synthAvi(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + (id % 4).toInt
    val nFrames = 2 + (id % 4).toInt
    val usPerFrame = 40000
    val rowBytes = (w * 3 + 3) & ~3
    val frameBytes = rowBytes * h

    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    val avih = Array.concat(le32(usPerFrame), le32(frameBytes * 25),
      le32(0), le32(0), le32(nFrames), le32(0), le32(1), le32(frameBytes),
      le32(w), le32(h), le32(0), le32(0), le32(0), le32(0))
    val strh = Array.concat(cc("vids"), cc("DIB "), le32(0), le16(0),
      le16(0), le32(0), le32(1), le32(25), le32(0), le32(nFrames),
      le32(frameBytes), le32(0), le32(0), le16(0), le16(0), le16(w), le16(h))
    val strf = Array.concat(le32(40), le32(w), le32(h), le16(1), le16(24),
      le32(0), le32(frameBytes), le32(0), le32(0), le32(0), le32(0))
    def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      Array.concat(cc(id4), le32(body.length), body, pad)
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      Array.concat(cc("LIST"), le32(body.length + 4), cc(typ), body)

    val frames = (0 until nFrames).map { f =>
      val data = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        val row = (h - 1 - y) * rowBytes // bottom-up
        var x = 0
        while (x < w) {
          val r = ((id * 31 + f * 11 + x * 7 + y * 13) % 256).toInt
          val g = ((id + f * 19 + x * 3 + y * 5) % 256).toInt
          val b = ((id * 17 + f * 7 + x + y * 2) % 256).toInt
          data(row + x * 3) = b.toByte     // DIB stores BGR
          data(row + x * 3 + 1) = g.toByte
          data(row + x * 3 + 2) = r.toByte
          x += 1
        }
        y += 1
      }
      chunk("00db", data)
    }
    val hdrl = list("hdrl", Array.concat(chunk("avih", avih),
      list("strl", Array.concat(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", Array.concat(frames: _*))
    val body = Array.concat(cc("AVI "), hdrl, movi)
    bos.write(cc("RIFF")); bos.write(le32(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** The closed-form pixel of [[synthMjpegAvi]]'s frame `f` at (x, y):
    * SMOOTH linear ramps (not synthAvi's mod-256 noise) because the
    * frames are JPEG-encoded — DCT reproduces low-frequency gradients
    * almost exactly at high quality, so a tight tolerance band is an
    * honest decode gate where per-pixel equality cannot be (JPEG is
    * lossy by definition).
    */
  def mjpegPixel(id: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = (
    math.min(255, x * 6 + f * 10 + (id % 16).toInt),
    math.min(255, y * 6 + f * 6),
    math.min(255, (x + y) * 3 + (id % 32).toInt))

  /** Deterministic Motion-JPEG clip: the same RIFF/AVI container as
    * [[synthAvi]] but `biCompression = 'MJPG'` and every movi chunk a
    * complete baseline JPEG (javax.imageio writer, explicit 1.0
    * quality — measured round-trip error on the ramps: ±5 at 1.0,
    * ±6+ at 0.95, the residual being chroma subsampling). Same
    * dims/frame-count formulas as synthAvi.
    */
  def synthMjpegAvi(id: Long): Array[Byte] = {
    val w = 8 + (id % 8).toInt
    val h = 8 + (id % 4).toInt
    val nFrames = 2 + (id % 4).toInt
    val usPerFrame = 40000

    def le32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      Array.concat(cc(id4), le32(body.length), body, pad)
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      Array.concat(cc("LIST"), le32(body.length + 4), cc(typ), body)

    def encodeJpeg(f: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val (r, g, b) = mjpegPixel(id, f, x, y)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val writer =
        javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(1.0f)
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      writer.dispose(); ios.close()
      out.toByteArray
    }

    val jpegs = (0 until nFrames).map(encodeJpeg)
    val maxBytes = jpegs.map(_.length).max
    val avih = Array.concat(le32(usPerFrame), le32(maxBytes * 25),
      le32(0), le32(0), le32(nFrames), le32(0), le32(1), le32(maxBytes),
      le32(w), le32(h), le32(0), le32(0), le32(0), le32(0))
    val strh = Array.concat(cc("vids"), cc("MJPG"), le32(0), le16(0),
      le16(0), le32(0), le32(1), le32(25), le32(0), le32(nFrames),
      le32(maxBytes), le32(0), le32(0), le16(0), le16(0), le16(w), le16(h))
    val strf = Array.concat(le32(40), le32(w), le32(h), le16(1), le16(24),
      cc("MJPG"), le32(maxBytes), le32(0), le32(0), le32(0), le32(0))

    val hdrl = list("hdrl", Array.concat(chunk("avih", avih),
      list("strl", Array.concat(chunk("strh", strh), chunk("strf", strf)))))
    val movi = list("movi", Array.concat(jpegs.map(chunk("00dc", _)): _*))
    val body = Array.concat(cc("AVI "), hdrl, movi)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(cc("RIFF")); bos.write(le32(body.length)); bos.write(body)
    bos.toByteArray
  }

  /** Deterministic synthetic WAV clip: sample `i` is the fixed
    * mod-65536 polynomial `((id·7919 + i·31) mod 65536) − 32768`,
    * encoded through the real `javax.sound.sampled` WAV writer at
    * 8 kHz 16-bit mono. Length 800 + (id mod 5)·160 samples. PCM is
    * lossless, so decoding gives back exactly these samples — q79's
    * oracle recomputes them in SQL without seeing a WAV byte. */
  def synthWav(id: Long): Array[Byte] = {
    val n = 800 + (id % 5).toInt * 160
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((id * 7919 + i * 31) % 65536) - 32768).toInt
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** ITU G.711 µ-law expansion table: 8-bit companded byte → 16-bit
    * linear sample, the fixed closed form (bias 0x84, 3-bit exponent,
    * 4-bit mantissa, one's-complement wire form). This is the SAME
    * table every conforming decoder ships — UlawCodecSpec asserts the
    * JDK's converter agrees on all 256 values, and q302's oracle gets
    * these values interpolated as SQL literals, so the gate never
    * depends on two codecs agreeing implicitly.
    */
  val UlawDecodeTable: Array[Int] = Array.tabulate(256) { b =>
    val v = ~b & 0xff
    val exp = (v >> 4) & 0x07
    val mant = v & 0x0f
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((v & 0x80) != 0) -mag else mag
  }

  /** ITU G.711 A-law expansion table: 8-bit companded byte → 16-bit
    * linear sample, the fixed closed form (even-bit inversion 0x55,
    * 3-bit segment, 4-bit mantissa; segment 0 adds 8, higher segments
    * add 0x108 then shift) — the same table every conforming decoder
    * ships. AlawCodecSpec asserts the JDK's converter agrees on all
    * 256 values, and q326's oracle gets these values interpolated as
    * SQL literals — the µ-law (q302) contract, second G.711 leg.
    */
  val AlawDecodeTable: Array[Int] = Array.tabulate(256) { b =>
    val v = b ^ 0x55
    val seg = (v >> 4) & 0x07
    val mant = v & 0x0f
    val mag = seg match {
      case 0 => (mant << 4) + 8
      case 1 => (mant << 4) + 0x108
      case _ => ((mant << 4) + 0x108) << (seg - 1)
    }
    if ((v & 0x80) != 0) mag else -mag
  }

  /** Deterministic synthetic A-law WAV clip: same companded-byte
    * polynomial and length rule as [[synthUlawWav]], wrapped by the
    * JDK writer as a real WAVE with format tag 6 (A-law), so q326's
    * oracle recomputes every decoded sample as
    * `AlawDecodeTable[(id·131 + i·7) mod 256]`.
    */
  def synthAlawWav(id: Long): Array[Byte] = {
    val n = 800 + (id % 5).toInt * 160
    val u = new Array[Byte](n)
    var i = 0
    while (i < n) {
      u(i) = (((id * 131 + i * 7) % 256) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ALAW,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(u), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic µ-law WAV clip: sample `i`'s COMPANDED
    * byte is the fixed polynomial `(id·131 + i·7) mod 256`, wrapped
    * in a real WAVE container with format tag 7 (µ-law) by the JDK's
    * own writer at 8 kHz 8-bit mono. Decoding expands each byte
    * through the G.711 table, so q302's oracle recomputes every
    * decoded sample as `UlawDecodeTable[(id·131 + i·7) mod 256]`
    * without seeing a WAV byte. Length matches [[synthWav]].
    */
  def synthUlawWav(id: Long): Array[Byte] = {
    val n = 800 + (id % 5).toInt * 160
    val u = new Array[Byte](n)
    var i = 0
    while (i < n) {
      u(i) = (((id * 131 + i * 7) % 256) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(u), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic image: pixel RGB at (x, y) is a fixed
    * mod-256 polynomial of (id, x, y), PNG-encoded through the real
    * `javax.imageio` writer. PNG is lossless, so decoding gives back
    * exactly these pixels — which is what lets q78's oracle recompute
    * the decoded sums in SQL without ever seeing a PNG byte. Width
    * 16+(id mod 16), height 16+(id mod 8).
    */
  def synthImagePng(id: Long): Array[Byte] = {
    val w = 16 + (id % 16).toInt
    val h = 16 + (id % 8).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id + x * 3 + y * 5) % 256).toInt
        val b = ((id * 17 + x + y * 2) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** q209 fixture: GRAYSCALE pixel ramp (r=g=b = the q78 red-channel
    * polynomial) encoded as a real GIF by javax.imageio — the second
    * COMPRESSED format through the codec seam, and unlike MJPEG a
    * LOSSLESS one: a ≤256-value grayscale source fits the GIF palette
    * exactly, so LZW round-trips every pixel and the gate can be
    * exact integer sums (no tolerance band). GifDecodeSpec pins the
    * byte signature ("GIF89a"/"GIF87a") so a silent fallback to a
    * different writer format cannot pass.
    */
  def synthGif(id: Long): Array[Byte] = {
    val w = 16 + (id % 16).toInt
    val h = 16 + (id % 8).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  /** q131 fixture: [[synthImagePng]]'s pixel polynomial on `bid` with
    * the left 2-pixel column strip brightened (red channel +8, clamped
    * at 255) — a NEAR-duplicate of the base image whose perceptual
    * hash stays within a few bits, the re-encoded/re-cropped-asset
    * case image dedup exists for. Closed form, so the DuckDB oracle
    * recomputes the twin's pixels (and its aHash) from arithmetic.
    */
  def synthImagePngTwin(bid: Long): Array[Byte] = {
    val w = 16 + (bid % 16).toInt
    val h = 16 + (bid % 8).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r0 = ((bid * 31 + x * 7 + y * 13) % 256).toInt
        val r = if (x < 2) math.min(r0 + 8, 255) else r0
        val g = ((bid + x * 3 + y * 5) % 256).toInt
        val b = ((bid * 17 + x + y * 2) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Tuning knob: rows per in-partition batch (the Arrow batch-size
    * analog; bounds per-task memory for big payloads).
    */
  val DefaultBatchSize = 64

  /** Payload metadata/integrity pass: size + content digest per media
    * row, through the SAME batched `mapPartitions` shape as the codec
    * operators — no stub involved, so (unlike the codec outputs) these
    * values are engine-portable and sit under the DuckDB oracle gate
    * (q48). The ingest-side fixity check of a real media pipeline.
    */
  def metadata(media: Dataset[Media],
      batchSize: Int = DefaultBatchSize): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // one digest instance per task, reused across the batch (the
      // per-partition init the codec operators amortize the same way)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          md.reset()
          val hex = md.digest(m.payload).map("%02x".format(_)).mkString
          MediaMeta(m.media_id, m.payload.length.toLong, hex)
        }
      }
    }
  }

  /** decode + embed: payload → feature vector, batched per partition. */
  def extractFeatures(media: Dataset[Media], dim: Int,
      codec: Codec = StubCodec,
      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val raw = codec.decode(m.payload, m.format)
          MediaFeatures(m.media_id, m.kind, codec.features(raw, dim))
        }
      }
    }
  }

  /** decode + resize, keeping metadata in sync. */
  def resize(media: Dataset[Media], width: Int, height: Int,
      codec: Codec = StubCodec,
      batchSize: Int = DefaultBatchSize): Dataset[Media] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          val raw = codec.decode(m.payload, m.format)
          m.copy(payload = codec.resize(raw, width, height),
            width = width, height = height)
        }
      }
    }
  }

  /** Video frame sampling: one output row per `everyMs` of duration —
    * a flatMap (rows fan out, still no shuffle).
    */
  def frameSample(media: Dataset[Media], everyMs: Long,
      codec: Codec = StubCodec,
      batchSize: Int = DefaultBatchSize): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          val raw = codec.decode(m.payload, m.format)
          val n = math.max(1L, m.duration_ms / everyMs).toInt
          (0 until n).iterator.map { i =>
            val ts = i * everyMs
            Frame(m.media_id, i, ts, codec.frame(raw, ts))
          }
        }
      }
    }
  }
}
