package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event in a keyed running-aggregate stream (same envelope rules
  * as [[CepEvent]]: `ts` = `timestamp_micros(t_us)`, `event_id`
  * breaks timestamp ties).
  */
case class OverEvent(
    user_id: Long, event_id: Long, t_us: Long, ts: Timestamp, cents: Long)

/** Per-key running totals — the WHOLE state: two longs per key. */
case class OverAcc(n: Long, s: Long)

/** One emitted row: the input event with its running rank and sum. */
case class OverRow(user_id: Long, event_id: Long, rn: Long, rsum: Long)

/** Streaming OVER aggregation — Flink SQL's per-row unbounded OVER
  * window (`count/sum ... OVER (PARTITION BY key ORDER BY time ROWS
  * UNBOUNDED PRECEDING)`) on a live stream: every arriving event
  * emits ONE row carrying its running rank and running sum, in event
  * order.
  *
  * This is the streaming surface Spark's built-in aggregations don't
  * offer (streaming `groupBy` emits per-GROUP rows on state change,
  * not per-INPUT-ROW results), so it runs on
  * `flatMapGroupsWithState`: state is exactly (count, sum) per key —
  * the information-theoretic minimum, O(keys) not O(events) — and
  * emission is eager (append mode, no watermark coordination; the
  * q167 rule). Within a batch the group sorts by (t_us, event_id);
  * across batches the harness feeds time-split topic files, so the
  * carried state makes per-key order global — the batch twin's exact
  * total order.
  *
  * State lives for the key's lifetime by design: evicting a running
  * total forgets it (Flink's idle-state TTL makes the same
  * correctness trade; we keep exactness and document the O(keys)
  * bound instead).
  */
object OverAgg extends Serializable {

  def running(events: Dataset[OverEvent]): Dataset[OverRow] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[OverEvent],
        state: GroupState[OverAcc]): Iterator[OverRow] = {
      val sorted = rows.toSeq.sortBy(e => (e.t_us, e.event_id))
      var acc = state.getOption.getOrElse(OverAcc(0L, 0L))
      val out = sorted.map { e =>
        acc = OverAcc(acc.n + 1, acc.s + e.cents)
        OverRow(userId, e.event_id, acc.n, acc.s)
      }
      state.update(acc)
      out.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
