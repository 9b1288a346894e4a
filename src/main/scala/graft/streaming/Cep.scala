package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event in a keyed CEP stream: `ts` drives the watermark (and is
  * always `timestamp_micros(t_us)`); `t_us` is the exact µs-epoch the
  * automaton computes with; `event_id` breaks timestamp ties the same
  * way the batch twin does.
  */
case class CepEvent(
    user_id: Long, event_id: Long, t_us: Long, ts: Timestamp, etype: String)

/** Per-key automaton state: the CURRENT maximal run of equal-typed
  * events (top level: the state encoder needs a publicly
  * constructible case class).
  */
case class CepRun(curType: String, len: Long, startUs: Long, endUs: Long)

/** One detected pattern match — MATCH_RECOGNIZE's MEASURES row. */
case class CepMatch(
    user_id: Long, first_click_us: Long, last_click_us: Long,
    n_clicks: Long, purchase_us: Long)

/** Streaming CEP — the Flink-CEP / MATCH_RECOGNIZE role on
  * `flatMapGroupsWithState`: detect `click{2,} purchase` (two-or-more
  * consecutive clicks immediately followed by a purchase within
  * [[Cep.PatternGapUs]] of the last click) per user, on a LIVE stream.
  *
  * The pattern over maximal greedy runs needs only O(1) state per key
  * — the current run's (type, length, start, end) — because a match
  * completes the moment its final event arrives: matches emit EAGERLY,
  * no watermark coordination gates the output (contrast q87/q90, where
  * emission itself waits on eviction). The watermark's job here is
  * purely state TTL: an event-time timeout clears idle users' run
  * state, so state size tracks ACTIVE keys, not stream lifetime — the
  * Flink `within()`-clause analog that keeps a 100 TB/day stream's
  * state bounded. Equivalence with the batch lowering holds under the
  * time-split-topic contract — see the [[TtlMs]] note for the exact
  * boundary (a key idle past the TTL between batches restarts its
  * run; the batch twin has no such expiry).
  *
  * Ordering contract: within a batch the group sorts by (t_us,
  * event_id) — the batch twin's exact total order; across batches the
  * harness feeds time-split topic files (a replayable log partitioned
  * by time), so batch N+1 never carries an event older than batch N.
  * Cross-batch run continuity is exactly what the persisted [[CepRun]]
  * provides: a run that straddles the boundary extends seamlessly, and
  * a purchase arriving in the next batch still completes its
  * click-run. Output equivalence with the batch run-length lowering
  * (q162's shape) is driver-gated by q167.
  *
  * Semantics pinned to the reference surface: Flink MATCH_RECOGNIZE
  * (flink-docs: dev/table/sql/queries/match_recognize) — PATTERN
  * (A{2,} B) WITHIN INTERVAL, ONE ROW PER MATCH, AFTER MATCH SKIP PAST
  * LAST ROW (runs are maximal, so matches can never overlap).
  */
object Cep extends Serializable {

  /** `B` must arrive within 24 h of the last `A` — the WITHIN clause. */
  val PatternGapUs: Long = 86400000000L

  /** State-TTL horizon. A `click` run idle past the WITHIN gap can no
    * longer be COMPLETED by a purchase (purchase − last click would
    * exceed [[PatternGapUs]]) — but the batch lowering places no time
    * bound on run EXTENSION: a later click may still extend the run,
    * and a purchase after that would match with `n_clicks` /
    * `first_click_us` covering the evicted prefix. Eviction therefore
    * trades exact batch equivalence for bounded state, and the
    * equivalence contract is correspondingly NARROW: streaming output
    * matches the batch lowering whenever each key's idle gap ACROSS
    * micro-batch boundaries stays under this TTL (the time-split-topic
    * replay contract the harness feeds — batch N+1 never jumps a key
    * past its TTL while same-type events are still coming). A key that
    * goes TTL-cold between batches restarts its run from the next
    * event; CepSpec's `ttl eviction` case pins that divergence
    * explicitly so it is a tested contract, not a silent gap. The
    * alternative — never evicting click runs — is unbounded state on a
    * 100 TB/day stream; re-defining the batch oracle with run expiry
    * would silently change q162's published semantics. */
  private val TtlMs: Long = PatternGapUs / 1000

  /** The shared automaton step: absorb `sorted` (ascending (t_us,
    * event_id)) into `acc0`, returning (completed matches, live run).
    * Package-visible so CepSpec can drive it directly.
    */
  private[streaming] def fold(key: Long, acc0: CepRun,
      sorted: Seq[CepEvent]): (Seq[CepMatch], CepRun) = {
    val out = scala.collection.mutable.ListBuffer.empty[CepMatch]
    var acc = acc0
    sorted.foreach { e =>
      acc match {
        case null =>
          acc = CepRun(e.etype, 1, e.t_us, e.t_us)
        case r if r.curType == e.etype => // run extends
          acc = r.copy(len = r.len + 1, endUs = e.t_us)
        case r => // run boundary: the one place a match can complete
          if (e.etype == "purchase" && r.curType == "click" &&
            r.len >= 2 && e.t_us - r.endUs <= PatternGapUs)
            out += CepMatch(key, r.startUs, r.endUs, r.len, e.t_us)
          acc = CepRun(e.etype, 1, e.t_us, e.t_us)
      }
    }
    (out.toSeq, acc)
  }

  def matches(events: Dataset[CepEvent], watermarkDelay: String)
      : Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[CepEvent],
        state: GroupState[CepRun]): Iterator[CepMatch] = {
      if (state.hasTimedOut) {
        // no emission on timeout — matches already emitted eagerly;
        // this is pure state eviction (the bounded-state guarantee)
        state.remove()
        Iterator.empty
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.t_us, e.event_id))
        val (found, acc) = fold(userId, state.getOption.orNull, sorted)
        state.update(acc)
        // TTL must sit strictly above the current watermark or Spark
        // rejects it; an already-cold run just evicts next batch
        state.setTimeoutTimestamp(
          math.max(acc.endUs / 1000 + TtlMs,
            state.getCurrentWatermarkMs() + 1))
        found.iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}

/** Two-run automaton state for [[Cep2]]: the current maximal run plus
  * the one before it (the optional middle element needs exactly one
  * run of look-behind — still O(1) per key). `prevType` is "" while no
  * previous run exists (Spark state encoders want a flat,
  * null-free-by-construction product).
  */
case class Cep2State(
    prevType: String, prevLen: Long, prevStartUs: Long, prevEndUs: Long,
    curType: String, curLen: Long, curStartUs: Long, curEndUs: Long)

/** A [[Cep2]] match: `via_type` is null for the direct
  * click-run→purchase path, or the middle event's type ("view" /
  * "error") when the optional element matched.
  */
case class Cep2Match(
    user_id: Long, first_click_us: Long, last_click_us: Long,
    n_clicks: Long, via_type: String, purchase_us: Long)

/** CEP with ALTERNATION and an OPTIONAL step — Flink MATCH_RECOGNIZE
  * `PATTERN (A{2,} (B|C)? D) WITHIN t`: two-or-more consecutive
  * clicks, optionally ONE intervening view-or-error event (a single
  * event, so over maximal runs the middle run must have length 1),
  * then a purchase within [[Cep.PatternGapUs]] of the LAST CLICK (the
  * WITHIN clause spans the whole tail of the match, middle included).
  *
  * Compiled to the same run-state fold as [[Cep.fold]], extended by
  * one run of look-behind: a match can only complete at a run
  * boundary whose incoming event is a purchase, and the two paths are
  * disjoint by construction — the finished run is either the click
  * run itself (direct) or a length-1 view/error run whose PREDECESSOR
  * is the click run (via). Matches stay non-overlapping
  * (AFTER MATCH SKIP PAST LAST ROW falls out of run maximality), and
  * the same TTL/batch-equivalence contract as [[Cep.TtlMs]] applies.
  */
object Cep2 extends Serializable {

  private val Empty = ""
  private def isMiddle(t: String): Boolean = t == "view" || t == "error"

  /** Shared automaton step over ascending (t_us, event_id) events —
    * the streaming operator and the split-invariance property drive
    * this directly.
    */
  private[streaming] def fold(key: Long, acc0: Cep2State,
      sorted: Seq[CepEvent]): (Seq[Cep2Match], Cep2State) = {
    val out = scala.collection.mutable.ListBuffer.empty[Cep2Match]
    var acc = acc0
    sorted.foreach { e =>
      acc match {
        case null =>
          acc = Cep2State(Empty, 0, 0, 0, e.etype, 1, e.t_us, e.t_us)
        case s if s.curType == e.etype => // run extends
          acc = s.copy(curLen = s.curLen + 1, curEndUs = e.t_us)
        case s => // run boundary — the only place a match can complete
          if (e.etype == "purchase") {
            if (s.curType == "click" && s.curLen >= 2 &&
              e.t_us - s.curEndUs <= Cep.PatternGapUs)
              out += Cep2Match(key, s.curStartUs, s.curEndUs, s.curLen,
                null, e.t_us)
            else if (isMiddle(s.curType) && s.curLen == 1 &&
              s.prevType == "click" && s.prevLen >= 2 &&
              e.t_us - s.prevEndUs <= Cep.PatternGapUs)
              out += Cep2Match(key, s.prevStartUs, s.prevEndUs, s.prevLen,
                s.curType, e.t_us)
          }
          acc = Cep2State(s.curType, s.curLen, s.curStartUs, s.curEndUs,
            e.etype, 1, e.t_us, e.t_us)
      }
    }
    (out.toSeq, acc)
  }

  def matches(events: Dataset[CepEvent], watermarkDelay: String)
      : Dataset[Cep2Match] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[CepEvent],
        state: GroupState[Cep2State]): Iterator[Cep2Match] = {
      if (state.hasTimedOut) {
        state.remove() // pure state TTL — matches were emitted eagerly
        Iterator.empty
      } else {
        val sorted = rows.toSeq.sortBy(e => (e.t_us, e.event_id))
        val (found, acc) = fold(userId, state.getOption.orNull, sorted)
        state.update(acc)
        state.setTimeoutTimestamp(
          math.max(acc.curEndUs / 1000 + Cep.PatternGapUs / 1000,
            state.getCurrentWatermarkMs() + 1))
        found.iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}

/** The same CEP automaton on `transformWithState` — the API-parity
  * twin ([[graft.streaming.SessionizeTws]]'s pattern applied to
  * pattern matching): typed `ValueState[CepRun]`, explicit event-time
  * timers for the TTL eviction (stale timers deleted on every
  * update), RocksDB-backed state. Shares [[Cep.fold]] verbatim, so
  * the two engines cannot drift; proven output-equivalent in CepSpec.
  */
object CepTws {

  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

  class PatternProcessor
      extends StatefulProcessor[Long, CepEvent, CepMatch] {
    @transient private var state: ValueState[CepRun] = _
    private val ttlMs = Cep.PatternGapUs / 1000

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CepRun]("run",
        Encoders.product[CepRun], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CepEvent],
        tv: TimerValues): Iterator[CepMatch] = {
      val sorted = rows.toSeq.sortBy(e => (e.t_us, e.event_id))
      val prev = if (state.exists()) state.get() else null
      // raw end+TTL timestamps on purpose (no above-watermark guard —
      // that is an fMGWS-only constraint): delete/register then always
      // name the SAME instant, so no stale timer can survive an update
      if (prev != null) getHandle.deleteTimer(prev.endUs / 1000 + ttlMs)
      val (found, acc) = Cep.fold(key, prev, sorted)
      state.update(acc)
      getHandle.registerTimer(acc.endUs / 1000 + ttlMs)
      found.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[CepMatch] = {
      // pure state TTL — matches were emitted eagerly
      state.clear()
      Iterator.empty
    }
  }

  def matches(events: Dataset[CepEvent], watermarkDelay: String)
      : Dataset[CepMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new PatternProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
