package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Exprs._

/** Windowed analytics beyond the reference's single `row_number` (SURVEY
  * §2.5): gap-based sessionization and running/moving/delta revenue — the
  * "rolling aggregations, windowing functions" the reference delegates to
  * its (uncommitted) Flink SQL layer (`reference:README.md:47`), expressed
  * Spark-first.
  */
object WindowedQueries {
  /** Per-user sessionization with Spark's native `session_window`: an event
    * exactly `gap` after its predecessor still merges into the session;
    * only strictly-greater gaps split (boundary pinned by spec and mirrored
    * with `>` in the oracle). The grouping shuffles once on user_id and
    * merges windows
    * per user — the 100 TB-friendly formulation (state per user bounded by
    * open sessions, no global sort; contrast with a gaps-and-islands
    * window-function rewrite, which is how the oracle mirrors it). */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("duration_us"))
      .orderBy("user_id", "session_start")

  /** Per-day session statistics composed over [[sessionize]]: sessions
    * starting each day with count, mean events per session, and the
    * longest duration — the engagement rollup a product dashboard reads
    * off the session table. The input aggregate is sessions-sized (not
    * events-sized) before this per-day group-by. */
  def sessionStats(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    sessionize(events, gap)
      .groupBy(to_date(col("session_start")).as("event_date"))
      .agg(count(lit(1)).as("n_sessions"),
        round2(sum(col("n_events")).cast(DoubleType) / count(lit(1)))
          .as("avg_events"),
        max(col("duration_us")).as("max_duration_us"))
      .orderBy("event_date")

  /** Gap-filled daily revenue: a generated date spine (min..max event day)
    * left-joined with per-day purchase revenue, missing days filled with
    * 0.0 — the time-series normalization every downstream
    * window/forecasting step assumes. The spine is bounded by days, so the
    * cross-SF cost is the broadcast of one tiny generated relation. */
  def revenueGapfill(events: DataFrame): DataFrame = {
    val daily = events.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(moneySum(col("value")).as("rev"))
    val spine = events
      .agg(min(to_date(col("ts"))).as("mn"), max(to_date(col("ts"))).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"),
        expr("interval 1 day"))).as("event_date"))
    spine.join(daily, Seq("event_date"), "left")
      .select(col("event_date"),
        coalesce(col("rev"), lit(0.0)).as("total_revenue"))
      .orderBy("event_date")
  }

  /** Daily revenue with running total, 7-day moving average, and
    * day-over-day delta. Frame sums run over the exact decimal per-day
    * revenue (order-fixed frames + exact accumulator = engine-exact);
    * the moving average divides as double with engine-agnostic rounding.
    * The dataset is pre-aggregated to one row per day, so the unpartitioned
    * window is bounded (days, not events) at any scale. */
  def runningRevenue(events: DataFrame): DataFrame = {
    val daily = events.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(exactSum(col("value")).as("rev"))
    val w = Window.orderBy("event_date")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w7 = w.rowsBetween(-6, Window.currentRow)
    daily.select(
        col("event_date"),
        round(col("rev"), 2).cast(DoubleType).as("total_revenue"),
        round(sum(col("rev")).over(cum), 2).cast(DoubleType)
          .as("running_total"),
        round2(sum(col("rev")).over(w7).cast(DoubleType) /
          count(lit(1)).over(w7)).as("ma7_revenue"),
        round(col("rev") - lag(col("rev"), 1).over(w), 2).cast(DoubleType)
          .as("delta_revenue"))
      .orderBy("event_date")
  }

  /** HOPPING (sliding) windows — 2-day windows advancing by 1 day, so
    * every purchase lands in exactly two windows: native
    * `window(ts, "2 days", "1 day")` (Spark plans one Expand — each row
    * duplicated per overlapping window — then a plain hash aggregate;
    * windows align to the epoch in the session timezone, i.e. UTC day
    * boundaries here). The same transform runs unchanged as a streaming
    * complete-mode aggregation — `q_stream_sliding_revenue` shares this
    * query's oracle verbatim, the batch ≡ stream equivalence-proof
    * pattern of q_sessionization/q_stream_sessions. Unlike the
    * frame-based 7-day moving average over gap-filled days
    * ([[runningRevenue]]), hopping windows are the form watermarks can
    * evict incrementally, which is why both exist. */
  def slidingRevenue(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(moneySum(col("value")).as("revenue"),
        count(lit(1)).as("n_purchases"))
      .select(to_date(col("window.start")).as("window_start"),
        col("revenue"), col("n_purchases"))
      .orderBy("window_start")

  /** Per-user trailing-7-day revenue features — the feature-store rolling
    * window (for every purchase-day of every user: that day's spend and
    * the spend/active-day count over the preceding week) that a churn or
    * LTV model trains on.
    *
    * The frame is a RANGE window over the integer day number (days since
    * epoch), so a user who skips days still gets a true calendar week —
    * a ROWS frame would silently widen over gaps. All values are exact
    * integer cents (window sums of longs — no IEEE accumulation), making
    * the whole feature table hash-exact. Scale: one events-sized hash
    * aggregate down to (user, day), then a window partitioned by user —
    * each partition bounded by that user's active days (≤ calendar), with
    * AQE-free skew impossible by construction. */
  def rollingUserRevenue(events: DataFrame): DataFrame = {
    val perDay = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("event_date"))
      .agg(moneySum(col("value")).as("rev"))
      .select(col("user_id"), col("event_date"),
        floor(col("rev") * 100 + 0.5).cast("long").as("day_cents"),
        datediff(col("event_date"), lit("1970-01-01").cast("date"))
          .as("day_num"))
    val w7 = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      .rangeBetween(-6, Window.currentRow)
    perDay
      .select(col("user_id"), col("event_date"), col("day_cents"),
        sum(col("day_cents")).over(w7).as("r7_cents"),
        count(lit(1)).over(w7).as("r7_days"))
      .orderBy("user_id", "event_date")
  }
}
