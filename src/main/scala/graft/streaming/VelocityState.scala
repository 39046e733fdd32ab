package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming velocity-rule counter — the STATEFUL twin of
  * [[graft.ops.EventQueries.velocityFlags]]' trailing-hour RANGE window:
  * per user a buffer of event seconds inside the last
  * [[graft.ops.EventQueries.VelocityWindowSec]] is carried as group state,
  * so every incoming event's in-window count emits incrementally — the
  * fraud rule evaluated as events arrive instead of in a batch window.
  * The hash-gated entry shares the batch oracle verbatim
  * (`VelocityFlagsSql`), certifying stateful-buffer ≡ RANGE-window.
  *
  * Tie semantics: the batch RANGE frame counts PEERS (events in the same
  * second, regardless of sort position), so within a batch events process
  * in runs of equal second — every event of a run reports the run-complete
  * count. Across micro-batches arrival order stands in for event order and
  * a same-second run split between batches would undercount its earlier
  * members — the same documented stand-in as [[TransitionState]] (the
  * file stream replays in time order, and the boundary case is spec-pinned
  * for the cross-batch window, not the cross-batch tie).
  *
  * Scale design: state per user is the event seconds of ONE trailing
  * window — memory ∝ the busiest user's events/hour, aged out on every
  * update. No idle eviction (an evicted user's return event must still
  * see its surviving window; here aging empties the buffer naturally). */
object VelocityState {
  case class In(event_id: Long, ts: Timestamp, user_id: Long)

  case class Recent(times: List[Long])

  case class Flag(event_id: Long, user_id: Long, sec: Long,
      n_in_window: Long)

  private val windowSec = graft.ops.EventQueries.VelocityWindowSec

  def update(userId: Long, events: Iterator[In],
      state: GroupState[Recent]): Iterator[Flag] = {
    var buf = state.getOption.map(_.times).getOrElse(Nil)
    val out = Seq.newBuilder[Flag]
    val sorted = events.toSeq
      .map(e => (FunnelState.micros(e.ts) / 1000000L, e))
      .sortBy { case (sec, e) => (sec, e.event_id) }
    // process runs of equal second together: the RANGE frame counts
    // peers, so every event of a run reports the run-complete count
    var i = 0
    while (i < sorted.length) {
      val sec = sorted(i)._1
      var j = i
      while (j < sorted.length && sorted(j)._1 == sec) j += 1
      val run = sorted.slice(i, j)
      buf = buf.filter(_ >= sec - windowSec) ++ run.map(_ => sec)
      val n = buf.size.toLong
      run.foreach { case (_, e) => out += Flag(e.event_id, userId, sec, n) }
      i = j
    }
    state.update(Recent(buf))
    out.result().iterator
  }

  /** Wires the stateful counter over a (possibly streaming) event set. */
  def flags(spark: SparkSession, events: Dataset[In]): Dataset[Flag] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** [[update]] under a watermark-aligned TTL (the [[TransitionState]]
    * discipline): timed-out keys drop their buffer, otherwise the base
    * counter runs unchanged and the eviction clock re-arms to
    * `max(batch max event sec, watermark) + horizonMs`. */
  def updateTtl(horizonMs: Long)(userId: Long, events: Iterator[In],
      state: GroupState[Recent]): Iterator[Flag] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val batch = events.toSeq
    val out = update(userId, batch.iterator, state)
    val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
    val maxEventMs = batch
      .map(e => (FunnelState.micros(e.ts) / 1000000L) * 1000L).max
    // +1000: the aging filter is INCLUSIVE at second granularity (an
    // entry at sec S still counts for an event at sec S+W), so the
    // timeout must sit one full second PAST the horizon or an on-time
    // return landing exactly at S+W could find its peer evicted — the
    // losslessness claim would break at the boundary
    if (state.exists)
      state.setTimeoutTimestamp(math.max(maxEventMs, wm) + horizonMs + 1000L)
    out
  }

  /** The watermark-aligned-TTL twin of [[flags]]. Unlike
    * [[TransitionState.transitionsTtl]], eviction here is LOSSLESS for
    * on-time traffic whenever the horizon covers the velocity window
    * (the default: horizon = watermark delay = [[windowSec]]): a buffer
    * entry only influences events within [[windowSec]] of it, and an
    * evicted user's on-time return event is by construction at least the
    * horizon past their last activity — the aging filter would have
    * emptied the buffer anyway. The residual trade is LATE return events
    * (behind the watermark): the watermark filter ahead of the stateful
    * operator DROPS them outright (no flag emitted at all — the standard
    * late-data discipline), where the unbounded twin would still have
    * counted them against surviving peers — spec-pinned over a
    * multi-batch MemoryStream. */
  def flagsTtl(spark: SparkSession, events: Dataset[In],
      delay: String = s"${graft.ops.EventQueries.VelocityWindowSec} seconds")
      : Dataset[Flag] = {
    import spark.implicits._
    val ms = TransitionState.horizonMs(delay)
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateTtl(ms))
  }
}
