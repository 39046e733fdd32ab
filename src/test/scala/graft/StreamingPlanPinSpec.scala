package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.streaming.{StreamingQueries, TransitionState}

/** Plan-shape pins for the EXECUTED MICRO-BATCH plans of the heaviest
  * streaming entries (r11 verdict task #7): batch PlanPinSpec covers
  * batch entries only, so a refactor could reintroduce a quadratic join
  * inside a streaming pipeline unnoticed — these pins capture each
  * query's last `IncrementalExecution.executedPlan` via the harness's
  * `onDrained` hook (`ColumnBridge.lastMicroBatchPlan`; the plan object
  * dies with the query, so capture happens between drain and stop) and
  * assert the stateful-operator shape plus the absence of
  * BroadcastNestedLoopJoin/CartesianProduct anywhere in the micro-batch.
  *
  * A MUTATION CONTROL proves the detector actually sees planted
  * quadratic joins through this capture path: a stream-static join
  * downgraded to an inequality predicate MUST plan as BNLJ and MUST be
  * caught by the same forbidden-node check the pins use.
  */
class StreamingPlanPinSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = sf("sf0.001")

  private val Forbidden = Seq("BroadcastNestedLoopJoin", "CartesianProduct")

  private def capture(run: (org.apache.spark.sql.streaming.StreamingQuery
      => Unit) => DataFrame): String = {
    val plan = new AtomicReference[String]("")
    run(q => plan.set(ColumnBridge.lastMicroBatchPlan(q)))
    plan.get()
  }

  private def quadraticNodes(plan: String): Seq[String] =
    Forbidden.filter(plan.contains)

  private def assertShape(name: String, plan: String,
      mustHave: Seq[String]): Unit = {
    assert(plan.nonEmpty, s"$name: no micro-batch plan captured")
    mustHave.foreach(tok =>
      assert(plan.contains(tok), s"$name: missing $tok in:\n$plan"))
    assert(quadraticNodes(plan).isEmpty,
      s"$name: quadratic join ${quadraticNodes(plan)} in:\n$plan")
  }

  test("streaming plan pin: q_stream_attribution's interval stream-stream " +
      "join is a StreamingSymmetricHashJoin (never BNLJ)") {
    val plan = capture(cb =>
      StreamingQueries.runStream(spark, sf001, "pin_attr", "append",
        onDrained = cb)(StreamingQueries.streamAttributionPairs(_)))
    assertShape("q_stream_attribution", plan,
      Seq("StreamingSymmetricHashJoin", "EventTimeWatermark"))
  }

  test("streaming plan pin: q_stream_abandoned_views' LEFT OUTER interval " +
      "join stays a watermarked StreamingSymmetricHashJoin") {
    val plan = capture(cb =>
      StreamingQueries.runAppendFinalized(spark, sf001, "pin_abandoned",
        onDrained = cb)(StreamingQueries.streamAbandonedViews(_)))
    assertShape("q_stream_abandoned_views", plan,
      Seq("StreamingSymmetricHashJoin", "LeftOuter", "EventTimeWatermark"))
  }

  test("streaming plan pin: q_stream_sessions_append plans the session-" +
      "window state store, not a re-sorted global window") {
    val plan = capture(cb =>
      StreamingQueries.runAppendFinalized(spark, sf001, "pin_sessions",
        onDrained = cb)(StreamingQueries.sessionizeAppend(_)))
    assertShape("q_stream_sessions_append", plan,
      Seq("SessionWindowStateStore", "EventTimeWatermark"))
  }

  test("streaming plan pin: q_stream_event_transitions_ttl runs one " +
      "FlatMapGroupsWithState with an event-time timeout") {
    val plan = capture(cb =>
      StreamingQueries.runStream(spark, sf001, "pin_trans_ttl", "append",
        onDrained = cb)(ev =>
        TransitionState.transitionsTtl(spark,
          ev.select(col("event_id"), col("ts"), col("user_id"),
            col("event_type")).as[TransitionState.In]).toDF))
    assertShape("q_stream_event_transitions_ttl", plan,
      Seq("FlatMapGroupsWithState", "EventTimeTimeout",
        "EventTimeWatermark"))
  }

  test("streaming plan pin: q_stream_dau_ttl plans the bounded " +
      "StreamingDeduplicateWithinWatermark operator") {
    val plan = capture(cb =>
      StreamingQueries.runStream(spark, sf001, "pin_dau_ttl", "append",
        onDrained = cb)(StreamingQueries.dedupDailyUsersBounded(_)))
    assertShape("q_stream_dau_ttl", plan,
      Seq("StreamingDeduplicateWithinWatermark", "EventTimeWatermark"))
  }

  test("streaming plan pin: q_stream_segment_revenue's stream-static " +
      "dimension join is a broadcast hash join per micro-batch") {
    val plan = capture(cb =>
      StreamingQueries.runStream(spark, sf001, "pin_segment", "complete",
        onDrained = cb)(ev =>
        StreamingQueries.segmentRevenue(ev,
          graft.ingest.Sources.table(spark, sf001, "customer"))))
    assertShape("q_stream_segment_revenue", plan, Seq("BroadcastHashJoin"))
  }

  test("MUTATION CONTROL: a planted inequality stream-static join plans " +
      "as BNLJ and the forbidden-node detector catches it") {
    val customer = graft.ingest.Sources.table(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_mktsegment")).limit(5)
    val plan = capture(cb =>
      StreamingQueries.runStream(spark, sf001, "pin_mutant", "append",
        onDrained = cb)(ev =>
        ev.filter(col("event_type") === "purchase")
          // the planted defect: a range predicate instead of the equi-key
          .join(broadcast(customer), col("user_id") >= col("c_custkey"))
          .select(col("event_id"), col("c_mktsegment"))))
    assert(plan.nonEmpty, "mutant: no micro-batch plan captured")
    assert(quadraticNodes(plan).nonEmpty,
      s"the mutation control expected a quadratic join node — the " +
        s"detector would miss a real regression. Plan:\n$plan")
  }
}
