package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.UpsertTable
import graft.streaming.Topic

/** S2: snapshot-then-tail — bulk snapshot first, WAL-tail envelopes
  * after, including a tail event that re-applies over a snapshot row
  * (the Debezium handoff overlap case).
  */
class ChangelogSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshot load then envelope tail, with overlapping re-apply") {
    val base = Files.createTempDirectory("graft-cls")
    val topic = s"$base/topic"
    Files.createDirectories(java.nio.file.Paths.get(topic))

    val snapshot = Seq(
      (1, "alice@example.com"), (2, "bob@example.com"), (3, "carol@example.com"))
      .toDF("user_id", "email")

    val q = ChangelogSource.start(
      spark,
      snapshots = Map("account" -> snapshot),
      topicDir = topic,
      warehouseDir = s"$base/wh",
      checkpointDir = s"$base/cp",
      keyColsFor = _ => Seq("user_id"),
      trigger = Trigger.ProcessingTime("100 milliseconds"))

    def accounts: Map[Long, String] =
      UpsertTable(spark, CdcSink.targetPath(s"$base/wh", "account"))
        .read().select("user_id", "email").collect()
        .map(r => r.getAs[Number](0).longValue() -> r.getString(1)).toMap

    assert(accounts === Map(1L -> "alice@example.com", 2L -> "bob@example.com",
      3L -> "carol@example.com"))

    // tail: overlap re-apply of row 3 (same content, higher lsn),
    // update of row 1, insert of row 4, delete of row 2
    def env(op: String, lsn: Long, before: String, after: String): String =
      s"""{"before":$before,"after":$after,""" +
        s""""source":{"version":"3.2.1.Final","connector":"postgresql",""" +
        s""""name":"cdc","ts_ms":1,"snapshot":"false","db":"postgres",""" +
        s""""sequence":"[]","ts_us":1,"ts_ns":1,"schema":"commerce",""" +
        s""""table":"account","txId":9,"lsn":$lsn,"xmin":null},""" +
        s""""transaction":null,"op":"$op","ts_ms":1,"ts_us":1,"ts_ns":1}"""
    def row(id: Int, email: String) = s"""{"user_id":$id,"email":"$email"}"""

    Topic.appendLines(topic, Seq(
      env("r", 100, "null", row(3, "carol@example.com")),
      env("u", 200, row(1, "alice@example.com"), row(1, "alice+v2@example.com")),
      env("c", 300, "null", row(4, "derek@example.com")),
      env("d", 400, row(2, "bob@example.com"), "null")))
    q.processAllAvailable()
    q.stop()

    assert(accounts === Map(1L -> "alice+v2@example.com",
      3L -> "carol@example.com", 4L -> "derek@example.com"))
  }
}
