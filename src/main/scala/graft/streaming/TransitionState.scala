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

  /** Parses a `withWatermark`-style delay ("1 hour", "30 seconds") to
    * milliseconds, so ONE string drives both the watermark and the TTL
    * clock (the horizon-equals-delay alignment can't silently drift).
    * Calendar months are rejected — they have no fixed ms length. */
  private[streaming] def horizonMs(delay: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    require(iv.months == 0, s"calendar-month horizons are ambiguous: $delay")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** [[update]] under a watermark-aligned TTL: timed-out keys drop their
    * last-event record, otherwise the base machine runs unchanged and the
    * eviction clock re-arms to `max(batch max event time, watermark) +
    * horizonMs`. The max(…) keeps the re-arm LEGAL (EventTimeTimeout
    * rejects a timestamp at/behind the watermark, which a key lagging the
    * global watermark by more than the horizon would otherwise produce)
    * and covers the first batch, where the watermark is still 0. */
  def updateTtl(horizonMs: Long)(userId: Long, events: Iterator[In],
      state: GroupState[LastEvent]): Iterator[Transition] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val batch = events.toSeq
    val out = update(userId, batch.iterator, state)
    val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
    val maxEventMs = batch.map(e => FunnelState.micros(e.ts) / 1000L).max
    if (state.exists)
      state.setTimeoutTimestamp(math.max(maxEventMs, wm) + horizonMs)
    out
  }

  /** The watermark-aligned-TTL twin of [[transitions]] — the 100 TB-stream
    * configuration: per-user state evicts once the event-time watermark
    * passes the user's last activity by `delay` (the SAME horizon as the
    * stream's watermark delay, so state is bounded by users active inside
    * one watermark window, not the whole user universe).
    *
    * The trade, stated: an evicted user's RETURN event finds no last-event
    * record, so the boundary transition that [[transitions]] would emit is
    * silently skipped — eventual completeness inside the horizon, a
    * documented miss beyond it (spec-pinned over a multi-batch
    * MemoryStream). Batch parity therefore holds exactly as long as every
    * per-user gap fits inside the horizon — which a bounded replay (one
    * data batch, watermark still at its initial 0) always satisfies, so
    * the hash-gated entry shares the batch oracle verbatim. */
  def transitionsTtl(spark: SparkSession, events: Dataset[In],
      delay: String = "1 hour"): Dataset[Transition] = {
    import spark.implicits._
    val ms = horizonMs(delay)
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateTtl(ms))
  }
}
