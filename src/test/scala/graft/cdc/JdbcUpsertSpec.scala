package graft.cdc

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Failure-path proof for the guarded JDBC upsert sink (q152): the
  * monotonic (ts, event_id) guard makes the sink correct under
  * out-of-order delivery, crash/restart replay of ANY batch prefix,
  * and even a full from-scratch re-run — without a batchId ledger,
  * because idempotence is a function of the data, not the delivery.
  */
class JdbcUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftupserttest;create=true"
  private val table = "user_latest_t"

  // (event_id, ts, user_id, cents): user 1 has three versions, user 2
  // one; the NEWEST version of user 1 (e3) deliberately sits in the
  // EARLIEST batch below
  private def rows(ids: (Long, Long, Long)*): org.apache.spark.sql.DataFrame =
    ids.map { case (eid, ts, uid) => (eid, ts, uid, eid * 100) }
      .toDF("event_id", "ts", "user_id", "cents")

  private def state(): Map[Long, (Long, Long, Long)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery(s"SELECT user_id, event_id, ts, cents FROM $table")
      val b = Map.newBuilder[Long, (Long, Long, Long)]
      while (rs.next())
        b += rs.getLong(1) -> ((rs.getLong(2), rs.getLong(3), rs.getLong(4)))
      b.result()
    } finally c.close()
  }

  private val finalState =
    Map(1L -> ((3L, 30L, 300L)), 2L -> ((4L, 5L, 400L)))

  test("out-of-order batches: an older row never regresses a newer one") {
    JdbcUpsert.ensureTable(url, table)
    // newest version of user 1 arrives FIRST
    JdbcUpsert.applyBatch(url, table, rows((3L, 30L, 1L), (4L, 5L, 2L)))
    // stale versions arrive later and must be ignored
    JdbcUpsert.applyBatch(url, table, rows((1L, 10L, 1L)))
    JdbcUpsert.applyBatch(url, table, rows((2L, 20L, 1L)))
    assert(state() === finalState)
  }

  test("crash replay: re-applying any batch prefix is a no-op") {
    JdbcUpsert.ensureTable(url, table)
    val b1 = rows((1L, 10L, 1L), (4L, 5L, 2L))
    val b2 = rows((2L, 20L, 1L), (3L, 30L, 1L))
    JdbcUpsert.applyBatch(url, table, b1)
    // crash after b1 committed to the DB but before the checkpoint
    // recorded it: restart re-delivers b1, then continues
    JdbcUpsert.applyBatch(url, table, b1)
    JdbcUpsert.applyBatch(url, table, b2)
    // a second crash replays EVERYTHING from scratch
    JdbcUpsert.applyBatch(url, table, b1)
    JdbcUpsert.applyBatch(url, table, b2)
    assert(state() === finalState)
  }

  test("ties on ts resolve by event_id, deterministically") {
    JdbcUpsert.ensureTable(url, table)
    JdbcUpsert.applyBatch(url, table, rows((7L, 50L, 9L)))
    JdbcUpsert.applyBatch(url, table, rows((6L, 50L, 9L))) // same ts, lower id
    assert(state() === Map(9L -> ((7L, 50L, 700L))))
    JdbcUpsert.applyBatch(url, table, rows((8L, 50L, 9L))) // same ts, higher id
    assert(state() === Map(9L -> ((8L, 50L, 800L))))
  }
}
