package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state (SURVEY §2.8: the reference outsources all streaming
  * state to Flink/Kafka; this is the Spark-native custom-state path —
  * `flatMapGroupsWithState` — for semantics windowed aggregates can't
  * express): a per-user funnel-progression machine that emits a conversion
  * record the moment a user completes view → cart(click) → purchase, with
  * the time-to-convert, then resets.
  *
  * Scale design: state is one small case class per active user, partitioned
  * by the group key (users spread across executors); event-time timeout
  * evicts users idle past `idleTimeout`, so state is bounded by *active*
  * users, not history — the property that keeps this runnable against an
  * unbounded 100 TB stream.
  */
object FunnelState {
  case class In(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Furthest funnel stage reached + timestamps. */
  case class UserFunnel(viewAt: Option[Long], clickAt: Option[Long])

  case class Conversion(user_id: Long, viewAt: Timestamp,
      purchaseAt: Timestamp, secondsToConvert: Long, purchaseValue: Double)

  /** Microseconds since epoch: `getTime` alone truncates to milliseconds,
    * which mis-orders same-ms events and corrupts emitted timestamps (the
    * testdata carries microsecond components). */
  private[streaming] def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  private[streaming] def toTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def update(idleTimeoutMs: Long)(userId: Long, events: Iterator[In],
      state: GroupState[UserFunnel]): Iterator[Conversion] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var s = state.getOption.getOrElse(UserFunnel(None, None))
    val out = Seq.newBuilder[Conversion]
    // process in event order within the batch (microsecond precision)
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val t = micros(e.ts)
      e.event_type match {
        case "view" if s.viewAt.isEmpty => s = s.copy(viewAt = Some(t))
        case "click" if s.viewAt.isDefined && s.clickAt.isEmpty =>
          s = s.copy(clickAt = Some(t))
        case "purchase" if s.clickAt.isDefined =>
          out += Conversion(userId, toTimestamp(s.viewAt.get),
            toTimestamp(t), (t - s.viewAt.get) / 1000000L, e.value)
          s = UserFunnel(None, None) // reset after conversion
        case _ => ()
      }
    }
    state.update(s)
    // batch execution has no watermark; timeouts only apply when streaming
    val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
    if (wm > 0) state.setTimeoutTimestamp(wm + idleTimeoutMs)
    out.result().iterator
  }

  /** Wires the state machine over a (possibly streaming) typed event set.
    * Requires a watermark on `ts` upstream when streaming. */
  def conversions(spark: SparkSession, events: Dataset[In],
      idleTimeout: String = "1h"): Dataset[Conversion] = {
    import spark.implicits._
    val ms = org.apache.spark.network.util.JavaUtils.timeStringAsMs(idleTimeout)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update(ms))
  }
}
