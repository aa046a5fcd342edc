package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Closed-session summaries via EVENT-TIME TIMERS (SURVEY.md §2.9 T5
  * `[EXT]`, the timer half of the Spark 4 arbitrary-state API —
  * [[AlertStream]] exercises the TTL half): a session emits exactly
  * ONE summary row, and only when the watermark proves the session can
  * no longer grow (no event can arrive within the gap). Neither
  * `session_window` (emits via output-mode semantics, can emit
  * partials under update mode) nor `mapGroupsWithState` (timeouts are
  * processing-time or need manual watermark bookkeeping) gives this
  * emit-exactly-on-close contract directly; `registerTimer` on the
  * event-time clock does.
  *
  * Mechanics per key: accumulate (n, total, first, last) in
  * `ValueState`; on every input batch re-arm ONE timer at
  * `last + gap` (deleting the stale one — timers are per-key
  * multiset, not keyed slots); when the watermark passes the armed
  * expiry, `handleExpiredTimer` emits the summary and clears state.
  * Scale: state is one record per OPEN session; timers live in the
  * RocksDB timer column family, scanned by expiry — both bounded by
  * active keys, checkpointed, restart-idempotent.
  */
object SessionClose {

  case class UserActivity(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(n: Long, total: Double, first_ms: Long, last_ms: Long)
  case class SessionSummary(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, total_value: Double)

  val GapMs: Long = 60 * 1000L

  class Processor extends StatefulProcessor[Long, UserActivity, SessionSummary] {
    @transient private var sess: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessionState]("sess",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserActivity],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      val evs = rows.toSeq
      val lo = evs.map(_.ts.getTime).min
      val hi = evs.map(_.ts.getTime).max
      val merged = if (sess.exists()) {
        val s = sess.get()
        SessionState(s.n + evs.size, s.total + evs.map(_.value).sum,
          math.min(s.first_ms, lo), math.max(s.last_ms, hi))
      } else SessionState(evs.size.toLong, evs.map(_.value).sum, lo, hi)
      // re-arm the single close timer at last-event + gap
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(merged.last_ms + GapMs)
      sess.update(merged)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionSummary] = {
      val out = if (sess.exists()) {
        val s = sess.get()
        Iterator.single(SessionSummary(key, new Timestamp(s.first_ms),
          new Timestamp(s.last_ms), s.n, s.total))
      } else Iterator.empty
      sess.clear()
      out
    }
  }

  /** Apply the operator: input must carry a watermark on `ts` (the
    * event-time clock the timers fire against). */
  def sessions(ds: Dataset[UserActivity]): Dataset[SessionSummary] = {
    implicit val outEnc = Encoders.product[SessionSummary]
    ds.withWatermark("ts", "1 second")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
