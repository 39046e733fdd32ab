package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import FunnelState.{micros, toTimestamp, Conversion, In, UserFunnel}

/** Spark 4 `transformWithState` twin of [[FunnelState]]: the same per-user
  * funnel machine on the modern arbitrary-state API — multiple named
  * `ValueState` variables per key and an explicit timer registry instead of
  * `flatMapGroupsWithState`'s single implicit state slot and timeout.
  *
  * State is BOUNDED exactly like the fMGWS machine: each invocation
  * re-registers an event-time timer at `watermark + idleMs` (deleting the
  * previous one — TWS timers accumulate, unlike fMGWS's single timeout
  * slot, so the old timer must be explicitly removed), and
  * `handleExpiredTimer` clears the user's state — idle users are evicted,
  * state stays proportional to ACTIVE users. Runs only on the RocksDB
  * state store (see [[graft.Tuning.rocksDbStateStore]]);
  * `flatMapGroupsWithState` remains the default-store-compatible fallback.
  * The spec pins single-batch stream output ≡ the fMGWS batch machine and
  * separately proves idle eviction.
  */
object FunnelStateTws {

  class FunnelProcessor(idleMs: Long)
      extends StatefulProcessor[Long, In, Conversion] {
    @transient private var state: ValueState[UserFunnel] = _
    @transient private var timer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[UserFunnel]("funnel",
        Encoders.product[UserFunnel], TTLConfig.NONE)
      timer = getHandle.getValueState[Long]("timer",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(userId: Long, events: Iterator[In],
        timerValues: TimerValues): Iterator[Conversion] = {
      var s = if (state.exists()) state.get() else UserFunnel(None, None)
      val out = Seq.newBuilder[Conversion]
      // same machine, same in-batch ordering as FunnelState.update
      events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val t = micros(e.ts)
        e.event_type match {
          case "view" if s.viewAt.isEmpty => s = s.copy(viewAt = Some(t))
          case "click" if s.viewAt.isDefined && s.clickAt.isEmpty =>
            s = s.copy(clickAt = Some(t))
          case "purchase" if s.clickAt.isDefined =>
            out += Conversion(userId, toTimestamp(s.viewAt.get),
              toTimestamp(t), (t - s.viewAt.get) / 1000000L, e.value)
            s = UserFunnel(None, None)
          case _ => ()
        }
      }
      state.update(s)
      // slide the idle-eviction timer (watermark 0 = batch/no-watermark
      // run: no timers, matching FunnelState.update's wm > 0 guard)
      val wm = timerValues.getCurrentWatermarkInMs()
      if (wm > 0) {
        if (timer.exists()) getHandle.deleteTimer(timer.get())
        getHandle.registerTimer(wm + idleMs)
        timer.update(wm + idleMs)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Conversion] = {
      state.clear()
      timer.clear()
      Iterator.empty
    }
  }

  /** Wires the processor over a typed event set, streaming or batch.
    * Requires the RocksDB state store; for idle eviction the stream needs a
    * watermark on `ts` upstream. Batch execution carries no event-time
    * values at all, so the time mode must be `None` there (EventTime is
    * rejected by the operator) — timers never fire and the machine behaves
    * exactly like [[FunnelState.update]]'s wm=0 batch path, which is what
    * the shared `q_funnel_conversions` oracle hash-checks. */
  def conversions(spark: SparkSession, events: Dataset[In],
      idleTimeout: String = "1h"): Dataset[Conversion] = {
    import spark.implicits._
    val ms = org.apache.spark.network.util.JavaUtils.timeStringAsMs(idleTimeout)
    val timeMode =
      if (events.isStreaming) TimeMode.EventTime() else TimeMode.None()
    // batch TWS still loads per-partition state stores, whose loader
    // reports to a coordinator endpoint only streaming runs register
    if (!events.isStreaming)
      org.apache.spark.sql.graft.ColumnBridge.ensureStateStoreCoordinator(spark)
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(ms), timeMode,
        OutputMode.Append(), Encoders.product[Conversion])
  }
}
