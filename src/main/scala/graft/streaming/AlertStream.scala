package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Streaming spike alerts via `transformWithState` (SURVEY.md §2.9 T5
  * `[EXT]`, Spark 4's arbitrary-state API): per user, keep a running
  * (count, total) baseline and emit an alert row whenever an event's
  * value exceeds 3x the user's prior mean. Alerts are sparse — the
  * operator emits rows only on condition, which `mapGroupsWithState`
  * (one output row per touched key per batch, see [[StatefulTotals]])
  * cannot express without a sentinel-row hack; `transformWithState`
  * returns an iterator per key, so zero or many alerts per batch are
  * first-class.
  *
  * The other capability this API adds over the old one: TTL on the
  * state itself. The baseline evicts after 4h of inactivity via
  * `TTLConfig` — at 100 TB-of-events scale the state store holds only
  * ACTIVE users, with no hand-rolled timeout bookkeeping (compare
  * `GroupStateTimeout` + manual `state.remove()` in the old API).
  * Requires the RocksDB state store provider (multiple column
  * families); checkpointed and restart-idempotent like every stateful
  * operator here.
  */
object AlertStream {

  case class UserActivity(user_id: Long, ts: Timestamp, value: Double)
  case class MeanState(n: Long, total: Double)
  case class Alert(user_id: Long, ts: Timestamp, value: Double,
    baseline_mean: Double, n_prior: Long)

  /** Minimum history before alerting (a 3x spike over a 1-event
    * baseline is noise, not signal). */
  val MinHistory = 3L

  class SpikeProcessor extends StatefulProcessor[Long, UserActivity, Alert] {
    @transient private var mean: ValueState[MeanState] = _

    // TTL requires the processing-time clock; under TimeMode.None the
    // state is unexpiring (the deterministic-test configuration — a
    // processing-time query keeps running EMPTY micro-batches to
    // advance its clock, which is correct in production and unbounded
    // in a processAllAvailable() test)
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mean = getHandle.getValueState[MeanState]("mean",
        Encoders.product[MeanState],
        if (timeMode == TimeMode.ProcessingTime())
          TTLConfig(java.time.Duration.ofHours(4))
        else TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserActivity],
        timerValues: TimerValues): Iterator[Alert] = {
      // process in event order (ts, value tiebreak) so the running
      // baseline — and therefore the emitted alert set — is independent
      // of micro-batch partition order
      val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.value))
      var st = if (mean.exists()) mean.get() else MeanState(0L, 0.0)
      val out = Seq.newBuilder[Alert]
      sorted.foreach { r =>
        if (st.n >= MinHistory && r.value > 3.0 * (st.total / st.n))
          out += Alert(key, r.ts, r.value, st.total / st.n, st.n)
        st = MeanState(st.n + 1, st.total + r.value)
      }
      mean.update(st)
      out.result().iterator
    }
  }

  /** Apply the alerting operator to a stream of user activity.
    * `withTtl = true` (production) runs the processing-time clock so
    * idle users' baselines expire after 4h; the default `TimeMode.None`
    * keeps batch-deterministic tests finite. */
  def spikes(ds: Dataset[UserActivity], withTtl: Boolean = false,
      mode: OutputMode = OutputMode.Update()): Dataset[Alert] = {
    implicit val outEnc = Encoders.product[Alert]
    // alerts are emit-once facts (never retracted), so Append — needed
    // by recoverable file sinks (AlertRestartSpec) — is equally valid
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SpikeProcessor,
        if (withTtl) TimeMode.ProcessingTime() else TimeMode.None(),
        mode)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
