package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time streaming aggregation (beyond-reference extension: the
  * reference job is processing-time only, SURVEY.md §2.5, but any
  * production stream over the same topics needs these).
  *
  * Watermarks bound state: a window's state is evicted once the
  * watermark passes its end, and later-than-watermark data is dropped —
  * the Structured-Streaming analog of the reference's
  * `table.exec.state.ttl` (SURVEY.md §2.3 C3).
  */
object WindowedStats {

  /** Tumbling-window counts per key with a watermark. Append mode
    * emits each window exactly once, when the watermark closes it.
    */
  def tumblingCounts(
      events: DataFrame,
      timeCol: String,
      windowDur: String,
      watermarkDelay: String,
      keyCols: Seq[String] = Seq.empty): DataFrame =
    events
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowDur) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("window_start") +:
          col("window.end").as("window_end") +:
          keyCols.map(col) :+ col("n"): _*)
}

/** Streaming exact dedup with watermark-bounded state
  * (`dropDuplicatesWithinWatermark`): duplicates arriving within the
  * watermark horizon are suppressed; state older than the horizon is
  * evicted, so memory is bounded at any corpus size — the streaming
  * member of the dedup family (batch variants in graft.pipeline.Dedup).
  */
object StreamingDedup {
  def dedup(events: DataFrame, idCols: Seq[String], timeCol: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)
}

case class SessionEvent(user_id: Long, ts: Timestamp)

case class UserSession(
    user_id: Long, session_start: Timestamp, session_end: Timestamp, events: Int)

/** Internal per-key session state (top level: the state encoder
  * codegen needs a publicly constructible case class).
  */
case class SessionAcc(startMs: Long, endMs: Long, n: Int)

/** Session windows over a keyed event stream via
  * `flatMapGroupsWithState` — the custom-state operator surface
  * (KeyValueGroupedDataset) with event-time timeouts: a session closes
  * `gap` after its last event, enforced by the watermark.
  */
object Sessionize extends Serializable {

  /** The shared session fold: absorb `sorted` (ascending event-time)
    * into `acc0`, returning (closed sessions, live session or null).
    * One copy on purpose — [[Sessionize]] and [[SessionizeTws]] are
    * documented output-equivalent, so their core must be THE SAME
    * code, not two copies kept in sync by hand.
    *
    * Cross-batch out-of-order events (possible while the watermark
    * allows): an event inside [start − gap, end + gap] merges and may
    * extend the session BACKWARD (start = min); an event more than
    * `gap` before the stored start closes immediately as its own
    * single-event session (this simple one-live-session state cannot
    * hold a second open session; the approximation is bounded by the
    * watermark delay and only affects late stragglers).
    */
  private[streaming] def fold(key: Long, acc0: SessionAcc,
      sorted: Seq[SessionEvent], gapMs: Long)
      : (Seq[UserSession], SessionAcc) = {
    val out = scala.collection.mutable.ListBuffer.empty[UserSession]
    var acc = acc0
    sorted.foreach { e =>
      val t = e.ts.getTime
      acc match {
        case null => acc = SessionAcc(t, t, 1)
        case s if t < s.startMs - gapMs => // late straggler, own session
          out += UserSession(key, new Timestamp(t), new Timestamp(t), 1)
        case s if t - s.endMs <= gapMs => // merge; may extend backward
          acc = s.copy(startMs = math.min(s.startMs, t),
            endMs = math.max(s.endMs, t), n = s.n + 1)
        case s => // gap exceeded inside the batch: emit, start anew
          out += UserSession(key, new Timestamp(s.startMs),
            new Timestamp(s.endMs), s.n)
          acc = SessionAcc(t, t, 1)
      }
    }
    (out.toSeq, acc)
  }

  def sessions(
      events: Dataset[SessionEvent],
      gapMs: Long,
      watermarkDelay: String): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionAcc]): Iterator[UserSession] = {
      val out = scala.collection.mutable.ListBuffer.empty[UserSession]
      if (state.hasTimedOut) {
        // watermark passed end+gap: close and evict (state TTL)
        state.getOption.foreach { s =>
          out += UserSession(userId, new Timestamp(s.startMs),
            new Timestamp(s.endMs), s.n)
        }
        state.remove()
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        val (closed, acc) = fold(userId, state.getOption.orNull, sorted, gapMs)
        out ++= closed
        if (acc != null) {
          state.update(acc)
          state.setTimeoutTimestamp(acc.endMs + gapMs)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}

/** The same gap-session operator on `transformWithState` — Spark 4's
  * arbitrary-state successor to flatMapGroupsWithState: typed
  * `ValueState` handles, explicit event-time timers (registered per
  * session end, stale timers deleted on update), RocksDB-backed state.
  * Semantically identical to [[Sessionize]]; proven equivalent in
  * WindowedStatsSpec. Requires
  * `spark.sql.streaming.stateStore.providerClass =
  *  org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`.
  */
object SessionizeTws {

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, UserSession] {
    @transient private var state: ValueState[SessionAcc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionAcc]("session",
        Encoders.product[SessionAcc], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
        tv: TimerValues): Iterator[UserSession] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      val prev = if (state.exists()) state.get() else null
      // the previous batch's timer is stale the moment the session
      // grows — delete it so only the live session-end timer can fire
      if (prev != null) getHandle.deleteTimer(prev.endMs + gapMs)
      val (closed, acc) = Sessionize.fold(key, prev, sorted, gapMs)
      if (acc != null) {
        state.update(acc)
        getHandle.registerTimer(acc.endMs + gapMs)
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[UserSession] = {
      // only the live session's timer survives updates, so expiry
      // means the watermark passed end + gap: close and evict
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(UserSession(key, new Timestamp(s.startMs),
          new Timestamp(s.endMs), s.n))
      } else Iterator.empty
    }
  }

  def sessions(events: Dataset[SessionEvent], gapMs: Long,
      watermarkDelay: String): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
