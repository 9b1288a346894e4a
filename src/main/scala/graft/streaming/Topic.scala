package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** File-backed topic: the native stand-in for a Kafka topic (SURVEY.md
  * §2.1 S1/S4 — no Kafka connector ships locally, so the transport
  * semantics are reproduced over append-only JSONL part files).
  *
  * A topic is a directory; each append creates new part files named
  * with a monotonically increasing sequence prefix, so lexicographic
  * file order ≙ broker arrival order (the offset analog; reference
  * `startingOffsets=earliest` ≙ Spark's file source processing
  * existing files first). Files are immutable once visible — writers
  * stage to a temp dir and atomically move in, exactly the contract
  * Spark's file streaming source requires.
  */
object Topic {

  val valueSchema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Streaming read of a topic (reference Kafka source DDL,
    * flink_json_to_iceberg.py:95-108): unbounded `value STRING` rows
    * plus `__file` (the offset-carrying provenance column: file path +
    * block start). The block start matters: Spark plans one large file
    * as several splits and packs splits into partitions sorted by size
    * descending, so path alone would not order rows across the splits
    * of a single file — (path, block_start, in-partition row id) does.
    */
  def stream(spark: SparkSession, topicDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(valueSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader
      .text(topicDir)
      .select(col("value"), fileOrd.as("__file"))
  }

  /** Batch read of the whole topic (replay/verification path). */
  def readAll(spark: SparkSession, topicDir: String): DataFrame =
    spark.read
      .schema(valueSchema)
      .text(topicDir)
      .select(col("value"), fileOrd.as("__file"))

  private def fileOrd =
    struct(col("_metadata.file_path").as("path"),
      col("_metadata.file_block_start").as("block"))

  /** Producer sink (S4/P8, reference test_cdc.py:99-121): serialize
    * every column of `df` to one JSON object per row (`to_json(struct)`)
    * and append to the topic. A single STRING column named `value` is
    * treated as an already-serialized record and passed through raw —
    * the Kafka-producer contract — instead of being wrapped a second
    * time into `{"value":"..."}` (which downstream envelope parsers
    * would silently drop as malformed). Distributed write: Spark
    * writes part files to a staging dir, then they move into the topic
    * under the next sequence prefix.
    */
  def produce(df: DataFrame, topicDir: String): Unit = {
    val preSerialized = df.columns.toSeq == Seq("value") &&
      df.schema.head.dataType == StringType
    val json =
      if (preSerialized)
        // a null, empty, or newline-bearing record can't be
        // represented in a line-framed text topic — fail loudly at
        // write time rather than land lines that downstream parsers
        // silently drop or SPLIT into multiple malformed records
        // (to_json below never produces any of these, so only this
        // path needs the guard)
        df.select(when(col("value").isNull
            || length(col("value")) === 0
            || col("value").contains("\n") || col("value").contains("\r"),
          raise_error(concat(lit("Topic.produce: record is null, empty, " +
            "or contains a line break: "), col("value"))))
          .otherwise(col("value")).as("value"))
      else df.select(to_json(struct(df.columns.toSeq.map(col): _*)).as("value"))
    val dir = Paths.get(topicDir)
    Files.createDirectories(dir)
    // stage INSIDE the topic dir: publish is then a same-filesystem
    // hard link (staging under java.io.tmpdir breaks with EXDEV when
    // /tmp is a different filesystem). Dot-prefixed dirs are invisible
    // to Spark's file source, so consumers never see staged parts.
    val tmp = Files.createTempDirectory(dir, ".graft-topic-stage")
    try {
      json.write.mode("overwrite").text(tmp.toString)
      publish(tmp, dir)
    } finally graft.Fs.deleteRecursively(tmp)
  }

  /** Driver-side harness append (the test_cdc.py role): raw JSON lines
    * straight into one new part file.
    */
  def appendLines(topicDir: String, lines: Seq[String]): Unit = {
    val dir = Paths.get(topicDir)
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, ".graft-topic", ".tmp")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    try publishOne(dir, tmp, suffix = "00000")
    finally Files.deleteIfExists(tmp)
  }

  private def publish(staging: Path, dir: Path): Unit = {
    Files.createDirectories(dir)
    val parts = graft.Fs.children(staging)
      .filter(_.getFileName.toString.startsWith("part-")).sortBy(_.toString)
    // ONE directory listing per publish (not per part): the sequence
    // advances locally across parts and is re-read only on an actual
    // collision with a concurrent producer — on a topic holding tens
    // of thousands of files, per-part re-listing made produce
    // O(parts x topic-files)
    var seq = nextSeq(dir)
    parts.zipWithIndex.foreach { case (p, i) =>
      try seq = publishOne(dir, p, suffix = f"$i%05d", seqHint = seq) + 1
      finally Files.deleteIfExists(p)
    }
  }

  /** Atomic-exclusive publish under the next free sequence prefix:
    * hard-link creation fails (rather than replaces) if a concurrent
    * producer claimed the same offset, so racing producers interleave
    * instead of clobbering — broker-style offset assignment.
    * Returns the sequence actually claimed.
    */
  private def publishOne(dir: Path, src: Path, suffix: String,
      seqHint: Long = -1L): Long = {
    var seq = if (seqHint >= 0) seqHint else nextSeq(dir)
    var done = false
    while (!done) {
      val target = dir.resolve(f"$seq%08d-$suffix.jsonl")
      try {
        Files.createLink(target, src)
        done = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // lost the race; re-read the sequence floor
          seq = math.max(seq + 1, nextSeq(dir))
      }
    }
    seq
  }

  private def nextSeq(dir: Path): Long =
    graft.Fs.children(dir)
      .map(_.getFileName.toString)
      .filter(_.endsWith(".jsonl"))
      .map(_.takeWhile(_ != '-').toLong)
      .maxOption.map(_ + 1).getOrElse(0L)
}
