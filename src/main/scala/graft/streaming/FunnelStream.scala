package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `events_funnel` query
  * (`star/EventWindows.funnel`): per-user view → click → purchase
  * conversion tracked incrementally with `flatMapGroupsWithState` —
  * the zero-or-many-outputs keyed-state API (`mapGroupsWithState`
  * emits exactly one row per key per batch; a funnel emits one row per
  * STAGE TRANSITION, i.e. zero to three).
  *
  * Ordering contract: events within one micro-batch are replayed in
  * (ts, event_id) order before advancing the state machine, so
  * intra-batch disorder is absorbed; an event arriving in a LATER
  * batch than a logically-later event is dropped by the monotone
  * state machine (documented trade: exact cross-batch reordering
  * needs an event-time watermark + buffer, which the batch twin —
  * same oracle-checked semantics — provides after the fact).
  *
  * Scale posture: state is three booleans + a timestamp per user in
  * the state store, incrementally checkpointed; output is bounded by
  * 3 rows per user ever. Append mode — transitions are immutable
  * facts, so downstream sinks can be append-only.
  */
object FunnelStream {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
  case class FunnelState(seenView: Boolean, seenClick: Boolean, seenPurchase: Boolean)
  case class Transition(user_id: Long, stage: String, ts: Timestamp)

  private def advance(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[Transition] = {
    var s = state.getOption.getOrElse(FunnelState(false, false, false))
    val out = Seq.newBuilder[Transition]
    // absorb intra-batch disorder: replay this batch in event order
    events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      e.event_type match {
        case "view" if !s.seenView =>
          s = s.copy(seenView = true); out += Transition(userId, "view", e.ts)
        case "click" if s.seenView && !s.seenClick =>
          s = s.copy(seenClick = true); out += Transition(userId, "click", e.ts)
        case "purchase" if s.seenClick && !s.seenPurchase =>
          s = s.copy(seenPurchase = true); out += Transition(userId, "purchase", e.ts)
        case _ => ()
      }
    }
    state.update(s)
    out.result().iterator
  }

  /** Apply the funnel state machine to a stream of events. */
  def transitions(ds: Dataset[Ev]): Dataset[Transition] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[Transition]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(advance)
  }

  val outputMode: OutputMode = OutputMode.Append()
}
