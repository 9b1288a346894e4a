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
  * The actual media decoding is STUBBED: this container has no
  * image/audio libraries, so [[Multimodal.StubCodec]] is a clearly
  * marked deterministic fake. The Spark-side plumbing — schema,
  * batching, partition preservation, frame explosion — is real and
  * tested; swapping in a libjpeg/ffmpeg-backed [[Multimodal.Codec]]
  * is deployment configuration.
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
