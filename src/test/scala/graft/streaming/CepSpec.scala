package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The CEP automaton ([[Cep.fold]]) pinned on hand-computed scripts,
  * plus the crash/restart proof for the streaming operator: the kill
  * lands with a click-run OPEN in state, and the purchase that
  * completes it only arrives after the restart — the match must still
  * emit exactly once.
  */
class CepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hourUs = 3600L * 1000000L

  private def ev(u: Long, id: Long, tUs: Long, t: String): CepEvent =
    CepEvent(u, id, tUs, new java.sql.Timestamp(tUs / 1000), t)

  // ---- automaton fold ----

  test("fold: click{2,} purchase within 24h emits one match") {
    val (out, acc) = Cep.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, 2 * hourUs, "purchase")))
    assert(out === Seq(CepMatch(1L, 0, hourUs, 2, 2 * hourUs)))
    assert(acc === CepRun("purchase", 1, 2 * hourUs, 2 * hourUs))
  }

  test("fold: a single click does not match; an intervening event breaks the run") {
    assert(Cep.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "purchase")))._1.isEmpty)
    assert(Cep.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, 2 * hourUs, "view"),
      ev(1, 4, 3 * hourUs, "purchase")))._1.isEmpty)
  }

  test("fold: purchase later than the WITHIN horizon does not match") {
    assert(Cep.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, hourUs + Cep.PatternGapUs + 1, "purchase")))._1.isEmpty)
    // exactly at the horizon: inclusive, matches
    assert(Cep.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, hourUs + Cep.PatternGapUs, "purchase")))._1.size === 1)
  }

  test("fold: state carries a run across calls (the batch-boundary contract)") {
    val (out1, acc1) = Cep.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click")))
    assert(out1.isEmpty && acc1 === CepRun("click", 2, 0, hourUs))
    // next batch: one more click extends, then the purchase completes
    val (out2, acc2) = Cep.fold(1L, acc1, Seq(
      ev(1, 3, 2 * hourUs, "click"), ev(1, 4, 3 * hourUs, "purchase")))
    assert(out2 === Seq(CepMatch(1L, 0, 2 * hourUs, 3, 3 * hourUs)))
    assert(acc2.curType === "purchase")
  }

  test("fold: maximal runs never overlap matches (AFTER MATCH SKIP PAST LAST ROW)") {
    // click click purchase click click purchase -> exactly two matches
    val (out, _) = Cep.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, 1 * hourUs, "click"),
      ev(1, 3, 2 * hourUs, "purchase"),
      ev(1, 4, 3 * hourUs, "click"), ev(1, 5, 4 * hourUs, "click"),
      ev(1, 6, 5 * hourUs, "purchase")))
    assert(out.map(_.purchase_us) === Seq(2 * hourUs, 5 * hourUs))
  }

  test("fold is split-invariant: any batch boundary yields the whole-stream result") {
    // the exact contract the streaming operator stands on: folding a
    // time-ordered script in one call ≡ folding any prefix, carrying
    // the run state, then folding the rest — for EVERY split point
    // and random scripts (types, tie-heavy timestamps, gap jumps)
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val types = Seq("click", "purchase", "view", "error")
    val genScript: Gen[List[CepEvent]] = for {
      n <- Gen.choose(0, 14)
      steps <- Gen.listOfN(n, for {
        t <- Gen.oneOf(types)
        // mostly small steps, occasionally beyond the WITHIN horizon
        dt <- Gen.frequency(
          6 -> Gen.choose(0L, 2 * hourUs),
          1 -> Gen.const(Cep.PatternGapUs + hourUs))
      } yield (t, dt))
    } yield {
      var ts = 0L
      steps.zipWithIndex.map { case ((t, dt), i) =>
        ts += dt
        ev(1, i.toLong, ts, t)
      }
    }
    val prop = Prop.forAll(genScript) { script =>
      val (whole, wAcc) = Cep.fold(1L, null, script)
      (0 to script.size).forall { cut =>
        val (m1, acc1) = Cep.fold(1L, null, script.take(cut))
        val (m2, acc2) = Cep.fold(1L, acc1, script.drop(cut))
        m1 ++ m2 == whole && acc2 == wAcc
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- Cep2: click{2,} (view|error)? purchase ----

  test("fold2: direct path, via-view, via-error — disjoint and exact") {
    // direct: no middle run
    val (d0, _) = Cep2.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, 2 * hourUs, "purchase")))
    assert(d0 === Seq(Cep2Match(1L, 0, hourUs, 2, null, 2 * hourUs)))
    // via a single view
    val (d1, _) = Cep2.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, 2 * hourUs, "view"), ev(1, 4, 3 * hourUs, "purchase")))
    assert(d1 === Seq(Cep2Match(1L, 0, hourUs, 2, "view", 3 * hourUs)))
    // via a single error
    val (d2, _) = Cep2.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, 2 * hourUs, "error"), ev(1, 4, 3 * hourUs, "purchase")))
    assert(d2 === Seq(Cep2Match(1L, 0, hourUs, 2, "error", 3 * hourUs)))
  }

  test("fold2: middle run longer than one event, or two middle runs, kill the match") {
    assert(Cep2.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, 2 * hourUs, "view"), ev(1, 4, 3 * hourUs, "view"),
      ev(1, 5, 4 * hourUs, "purchase")))._1.isEmpty)
    assert(Cep2.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, 2 * hourUs, "view"), ev(1, 4, 3 * hourUs, "error"),
      ev(1, 5, 4 * hourUs, "purchase")))._1.isEmpty)
  }

  test("fold2: WITHIN anchors on the last click, middle included") {
    // purchase 24h+1µs after the last click, via a middle view: no match
    assert(Cep2.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, 2 * hourUs, "view"),
      ev(1, 4, hourUs + Cep.PatternGapUs + 1, "purchase")))._1.isEmpty)
    // exactly at the horizon: inclusive
    assert(Cep2.fold(1L, null, Seq(
      ev(1, 1, 0, "click"), ev(1, 2, hourUs, "click"),
      ev(1, 3, 2 * hourUs, "view"),
      ev(1, 4, hourUs + Cep.PatternGapUs, "purchase")))._1.size === 1)
  }

  test("fold2 is split-invariant: any batch boundary yields the whole-stream result") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val types = Seq("click", "purchase", "view", "error")
    val genScript: Gen[List[CepEvent]] = for {
      n <- Gen.choose(0, 14)
      steps <- Gen.listOfN(n, for {
        t <- Gen.oneOf(types)
        dt <- Gen.frequency(
          6 -> Gen.choose(0L, 2 * hourUs),
          1 -> Gen.const(Cep.PatternGapUs + hourUs))
      } yield (t, dt))
    } yield {
      var ts = 0L
      steps.zipWithIndex.map { case ((t, dt), i) =>
        ts += dt
        ev(1, i.toLong, ts, t)
      }
    }
    val prop = Prop.forAll(genScript) { script =>
      val (whole, wAcc) = Cep2.fold(1L, null, script)
      (0 to script.size).forall { cut =>
        val (m1, acc1) = Cep2.fold(1L, null, script.take(cut))
        val (m2, acc2) = Cep2.fold(1L, acc1, script.drop(cut))
        m1 ++ m2 == whole && acc2 == wAcc
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- streaming kill/restart ----

  private def cepQuery(topic: String, cp: String, out: String,
      tws: Boolean = false): Unit = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, event_id BIGINT, t_us BIGINT, event_type STRING")
    val events = Topic.stream(spark, topic, maxFilesPerTrigger = Some(1))
      .select(from_json(col("value"), schema).as("j"))
      .select(col("j.user_id").as("user_id"),
        col("j.event_id").as("event_id"), col("j.t_us").as("t_us"),
        timestamp_micros(col("j.t_us")).as("ts"),
        col("j.event_type").as("etype"))
      .as[CepEvent]
    val matches =
      if (tws) CepTws.matches(events, watermarkDelay = "1 hour")
      else Cep.matches(events, watermarkDelay = "1 hour")
    val q = matches.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(out)
      }
      .start()
    q.awaitTermination()
  }

  private def cepResult(out: String): Seq[(Long, Long, Long, Long, Long)] =
    spark.read.parquet(out).where(col("user_id") >= 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSeq.sorted

  test("streaming CEP: kill with a click-run open, restart completes the match once") {
    val base = Files.createTempDirectory("graft-restart-cep")
    // D offsets everything off epoch 0: a first-batch event at
    // exactly ts=0 sits at the INITIAL watermark and gets dropped by
    // the stateful operator's late-event filter — a watermark-origin
    // artifact, not CEP semantics (real event times are nowhere near
    // epoch 0).
    // user 1: clicks at 0,1h — purchase at 3h (MATCH, straddles cut);
    // user 2: click 0h, view 1h, purchase 3h (no match);
    // user 3: clicks 0,1h, purchase at 1h+24h+1h (outside WITHIN);
    // user 4: clicks at 3,4h, purchase 5h (match entirely in phase 2)
    val D = 24L * hourUs
    val rows = Seq(
      (1L, 10L, D, "click"), (1L, 11L, D + hourUs, "click"),
      (1L, 12L, D + 3 * hourUs, "purchase"),
      (2L, 20L, D, "click"), (2L, 21L, D + hourUs, "view"),
      (2L, 22L, D + 3 * hourUs, "purchase"),
      (3L, 30L, D, "click"), (3L, 31L, D + hourUs, "click"),
      (3L, 32L, D + hourUs + Cep.PatternGapUs + hourUs, "purchase"),
      (4L, 40L, D + 3 * hourUs, "click"), (4L, 41L, D + 4 * hourUs, "click"),
      (4L, 42L, D + 5 * hourUs, "purchase"))
    val df = rows.toDF("user_id", "event_id", "t_us", "event_type")
    val cutUs = D + 2 * hourUs
    val maxUs = rows.map(_._3).max
    def sentinels(topic: String): Unit = (48 to 49).foreach { h =>
      Topic.produce(Seq((-1L, -h.toLong, maxUs + h * hourUs, "view"))
        .toDF("user_id", "event_id", "t_us", "event_type"), topic)
    }

    locally { // uninterrupted twin
      val topic = s"$base/full/topic"
      Topic.produce(df.where(col("t_us") < cutUs).coalesce(1), topic)
      Topic.produce(df.where(col("t_us") >= cutUs).coalesce(1), topic)
      sentinels(topic)
      cepQuery(topic, s"$base/full/cp", s"$base/full/out")
    }
    val expected = cepResult(s"$base/full/out")
    assert(expected === Seq(
      (1L, D, D + hourUs, 2L, D + 3 * hourUs),
      (4L, D + 3 * hourUs, D + 4 * hourUs, 2L, D + 5 * hourUs)))

    // kill/restart: phase 1 ends with user 1's (and 3's) click-runs
    // open in state; the completing purchase arrives after the restart
    val topic = s"$base/kr/topic"
    Topic.produce(df.where(col("t_us") < cutUs).coalesce(1), topic)
    cepQuery(topic, s"$base/kr/cp", s"$base/kr/out") // phase 1, then die
    assert(cepResult(s"$base/kr/out").isEmpty,
      "no match can complete before the cut")
    Topic.produce(df.where(col("t_us") >= cutUs).coalesce(1), topic)
    sentinels(topic)
    cepQuery(topic, s"$base/kr/cp", s"$base/kr/out") // restart, same cp
    assert(cepResult(s"$base/kr/out") === expected,
      "restarted run must reload the open run state and emit each match exactly once")

    // transformWithState twin: same script through CepTws (RocksDB
    // provider) must produce the same matches
    runTwsTwin(base.toString, df, cutUs, expected, sentinels)
  }

  /** Pins the TTL-eviction boundary the Cep.TtlMs note documents: a
    * key whose idle gap ACROSS micro-batches exceeds the TTL restarts
    * its run, so streaming diverges from the batch fold (which has no
    * run expiry) EXACTLY by the evicted prefix. This is the contract
    * edge, asserted from both sides — outside it (q167's time-split
    * contract) equivalence holds; past it, divergence is this shape
    * and no other.
    */
  test("streaming CEP: TTL-cold key restarts its run — the documented batch-divergence edge") {
    val base = Files.createTempDirectory("graft-cep-ttl")
    val D = 24L * hourUs
    val ttlUs = Cep.PatternGapUs
    // phase 1: two clicks; phase 2: watermark-advancing sentinels from
    // another user push user 5 past its TTL with no data (two files →
    // the eviction fires in the second's batch); phase 3: two more
    // clicks + a purchase, all within WITHIN of each other
    val p1 = Seq((5L, 50L, D, "click"), (5L, 51L, D + hourUs, "click"))
    val sent = Seq((-1L, -1L, D + ttlUs + 6 * hourUs, "view"),
      (-1L, -2L, D + ttlUs + 7 * hourUs, "view"))
    val p3 = Seq((5L, 52L, D + ttlUs + 16 * hourUs, "click"),
      (5L, 53L, D + ttlUs + 17 * hourUs, "click"),
      (5L, 54L, D + ttlUs + 18 * hourUs, "purchase"))
    val topic = s"$base/topic"
    Topic.produce(p1.toDF("user_id", "event_id", "t_us", "event_type")
      .coalesce(1), topic)
    sent.foreach { r =>
      Topic.produce(Seq(r).toDF("user_id", "event_id", "t_us", "event_type"),
        topic)
    }
    Topic.produce(p3.toDF("user_id", "event_id", "t_us", "event_type")
      .coalesce(1), topic)
    cepQuery(topic, s"$base/cp", s"$base/out")
    // streaming: the evicted prefix is gone — the match counts ONLY
    // the post-eviction clicks
    assert(cepResult(s"$base/out") === Seq(
      (5L, D + ttlUs + 16 * hourUs, D + ttlUs + 17 * hourUs, 2L,
        D + ttlUs + 18 * hourUs)))
    // batch fold over the same total order: no expiry, the run spans
    // all four clicks (same-type events never break a run) and the
    // purchase is within WITHIN of the LAST click — 4 clicks from D
    val script = (p1 ++ p3).map { case (u, id, t, ty) => ev(u, id, t, ty) }
    val (batchOut, _) = Cep.fold(5L, null, script)
    assert(batchOut === Seq(CepMatch(5L, D, D + ttlUs + 17 * hourUs, 4L,
      D + ttlUs + 18 * hourUs)))
  }

  private def runTwsTwin(base: String, df: DataFrame, cutUs: Long,
      expected: Seq[(Long, Long, Long, Long, Long)],
      sentinels: String => Unit): Unit = {
    // transformWithState twin: same script through CepTws (RocksDB
    // provider) must produce the same matches
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t2 = s"$base/tws/topic"
      Topic.produce(df.where(col("t_us") < cutUs).coalesce(1), t2)
      Topic.produce(df.where(col("t_us") >= cutUs).coalesce(1), t2)
      sentinels(t2)
      cepQuery(t2, s"$base/tws/cp", s"$base/tws/out", tws = true)
      assert(cepResult(s"$base/tws/out") === expected,
        "the transformWithState twin must emit the same matches")
    } finally prev match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
  }
}
