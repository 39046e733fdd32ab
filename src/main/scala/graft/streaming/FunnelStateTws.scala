package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

import FunnelState.{micros, toTimestamp, Conversion, In, UserFunnel}

/** Spark 4 `transformWithState` twin of [[FunnelState]]: the same per-user
  * funnel machine on the modern arbitrary-state API (typed `ValueState`
  * handles, timer registry, state TTL) instead of
  * `flatMapGroupsWithState`'s single implicit state slot.
  *
  * Why both exist: TWS is the forward path — it runs ONLY on the RocksDB
  * state store (see [[graft.Tuning.rocksDbStateStore]]), supports multiple
  * named state variables per key and native TTL eviction (`TTLConfig`
  * replaces the manual watermark-timeout dance in
  * [[FunnelState.update]]) — while `flatMapGroupsWithState` remains the
  * default-store-compatible fallback. The spec pins stream output ≡ the
  * fMGWS batch output, so the two stay interchangeable.
  */
object FunnelStateTws {

  class FunnelProcessor extends StatefulProcessor[Long, In, Conversion] {
    @transient private var state: ValueState[UserFunnel] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserFunnel]("funnel",
        Encoders.product[UserFunnel], TTLConfig.NONE)

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
      out.result().iterator
    }
  }

  /** Wires the processor over a streaming typed event set (requires the
    * RocksDB state store provider). */
  def conversions(spark: SparkSession, events: Dataset[In]): Dataset[Conversion] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(),
        OutputMode.Append(), Encoders.product[Conversion])
  }
}
