package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type transitions — the STATEFUL lag: each user's
  * consecutive event pairs emitted incrementally as the stream advances,
  * the cross-batch complement of the batch lag window in
  * [[graft.ops.EventQueries.eventTransitions]] (a window function cannot
  * run incrementally; carrying ONE last-event record per user can).
  * The hash-gated entry shares the batch oracle verbatim, so the gate
  * certifies stateful-lag ≡ window-lag; the cross-batch boundary case (a
  * user's sequence SPLIT between micro-batches must still emit the
  * boundary transition) is spec-pinned over a two-batch MemoryStream.
  *
  * Scale design: state is one tiny (ts, id, type) record per user ever
  * seen, partitioned by the group key — memory ∝ user universe, not
  * history. Unlike [[FunnelState]] there is NO idle eviction: dropping an
  * idle user's last event would silently swallow the transition emitted
  * when they return (batch parity would break). Deployments that cannot
  * carry the full user universe accept that miss explicitly by setting an
  * event-time timeout in [[update]]'s caller — the trade is documented,
  * not default.
  *
  * Within a batch events sort by (event-time µs, event_id) — the same
  * total order as the batch window; across batches arrival order stands
  * in for event order (the file stream replays in time order). */
object TransitionState {
  case class In(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String)

  case class LastEvent(us: Long, eventId: Long, eventType: String)

  case class Transition(user_id: Long, prev_type: String, next_type: String)

  def update(userId: Long, events: Iterator[In],
      state: GroupState[LastEvent]): Iterator[Transition] = {
    var prev = state.getOption
    val out = Seq.newBuilder[Transition]
    events.toSeq
      .sortBy(e => (FunnelState.micros(e.ts), e.event_id))
      .foreach { e =>
        prev.foreach(p => out += Transition(userId, p.eventType, e.event_type))
        prev = Some(LastEvent(FunnelState.micros(e.ts), e.event_id,
          e.event_type))
      }
    prev.foreach(state.update)
    out.result().iterator
  }

  /** Wires the stateful lag over a (possibly streaming) typed event set. */
  def transitions(spark: SparkSession,
      events: Dataset[In]): Dataset[Transition] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
