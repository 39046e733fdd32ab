package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent right row
  * with `right.ts <= left.ts` on the same key — the operator behind
  * "state of X when the event happened" features (price as-of trade,
  * last-touch attribution, point-in-time feature joins).
  *
  * Spark has no native as-of join; the standard composition (a range
  * self-join) explodes quadratically in dense keys. This formulation is
  * linear: union both sides, one shuffle+sort on (key, ts), and a
  * `last(value, ignoreNulls)` running window carries the latest right-side
  * value forward into each left row. Equal timestamps sort the right side
  * first, so a same-instant right row is visible to the left row (`<=`
  * semantics, matching DuckDB's ASOF JOIN, which oracles this operator).
  *
  * At 100 TB: one exchange on the key, sorted within partitions — the same
  * cost as any keyed window; no broadcast, no range blow-up. Skewed keys
  * respond to the usual salting of the window partition key.
  */
object AsOfJoin {
  /** Banded range join: (view, purchase) pairs of the same user with
    * `view.ts <= purchase.ts <= view.ts + window`, counted per purchase
    * day. A naive inequality join is quadratic per user; here both sides
    * key on (user, time-bucket) with the purchase side exploded into the
    * two buckets its window can reach, so the equi-join prunes candidates
    * to ±1 bucket before the exact range filter — the standard
    * interval-join banding, linear in events for a fixed window. */
  def viewToPurchaseWithin(events: DataFrame,
      windowMinutes: Int = 30): DataFrame =
    viewPurchasePairs(events, windowMinutes)
      .groupBy(to_date(col("purchase_ts")).as("event_date"))
      .agg(count(lit(1)).as("attributed_pairs"))
      .orderBy("event_date")

  /** The raw (user, view_ts, purchase_ts) pair stream of the banded
    * interval join — shared by the attribution count above and the
    * latency stats of [[graft.ops.EventQueries.conversionLatency]]. */
  def viewPurchasePairs(events: DataFrame,
      windowMinutes: Int = 30): DataFrame = {
    val bucketUs = windowMinutes * 60L * 1000000L
    val bucket = expr(s"unix_micros(ts) div ${bucketUs}L")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"), bucket.as("bucket"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        explode(array(bucket, bucket - 1)).as("bucket"))
    views.join(purchases, Seq("user_id", "bucket"))
      .filter(col("purchase_ts") >= col("view_ts") &&
        unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")) <= bucketUs)
      .select(col("user_id"), col("view_ts"), col("purchase_ts"))
  }
  /** Attaches the latest prior (or same-instant) purchase per user to every
    * view event: (event_id, user_id, ts, last_purchase_value nullable,
    * us_since_purchase nullable). Rights at identical (user, ts) are
    * deduped to the highest event_id so the pick is deterministic. */
  def lastPurchaseAsOfView(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val dedupW = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("_rn", row_number().over(dedupW))
      .filter(col("_rn") === 1)
    val unioned =
      purchases.select(col("user_id"), col("ts"), lit(0).as("_side"),
          lit(null).cast("long").as("event_id"), col("value"))
        .unionByName(
          views.select(col("user_id"), col("ts"), lit(1).as("_side"),
            col("event_id"), lit(null).cast("double").as("value")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("last_purchase_value", last(col("value"), true).over(w))
      .withColumn("_last_pts",
        last(when(col("_side") === 0, col("ts")), true).over(w))
      .filter(col("_side") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("last_purchase_value"),
        (unix_micros(col("ts")) - unix_micros(col("_last_pts")))
          .as("us_since_purchase"))
      .orderBy("event_id")
  }
}
