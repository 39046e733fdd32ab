package graft

import java.sql.Timestamp

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("banded range join counts pairs across bucket boundaries") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 10:29:00"), 1L, "purchase", 5.0, "{}"),  // in window
      (3L, ts("2024-01-01 10:31:00"), 1L, "purchase", 5.0, "{}"),  // 31m: out
      (4L, ts("2024-01-01 10:30:00"), 1L, "purchase", 5.0, "{}"),  // exactly 30m: in
      (5L, ts("2024-01-01 11:59:00"), 2L, "view", 0.0, "{}"),
      (6L, ts("2024-01-01 12:01:00"), 2L, "purchase", 1.0, "{}"),  // crosses bucket
      (7L, ts("2024-01-01 09:59:00"), 3L, "purchase", 1.0, "{}"))  // before any view
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.ops.AsOfJoin.viewToPurchaseWithin(events)
      .as[(java.sql.Date, Long)].collect().toSeq
    assert(got == Seq((java.sql.Date.valueOf("2024-01-01"), 3L)))
  }

  test("asof picks the latest prior-or-equal purchase per user") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "purchase", 10.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),   // -> 10.0
      (3L, ts("2024-01-01 11:00:00"), 1L, "purchase", 20.0, "{}"),
      (4L, ts("2024-01-01 11:00:00"), 1L, "view", 0.0, "{}"),   // same instant -> 20.0
      (5L, ts("2024-01-01 12:00:00"), 1L, "view", 0.0, "{}"),   // -> 20.0
      (6L, ts("2024-01-01 08:00:00"), 2L, "view", 0.0, "{}"),   // no purchase -> null
      // two purchases at the same instant: higher event_id wins
      (7L, ts("2024-01-01 09:00:00"), 3L, "purchase", 1.0, "{}"),
      (8L, ts("2024-01-01 09:00:00"), 3L, "purchase", 2.0, "{}"),
      (9L, ts("2024-01-01 09:30:00"), 3L, "view", 0.0, "{}"))   // -> 2.0
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = AsOfJoin.lastPurchaseAsOfView(events)
      .select("event_id", "last_purchase_value", "us_since_purchase")
      .as[(Long, Option[Double], Option[Long])].collect().toSeq
    assert(got == Seq(
      (2L, Some(10.0), Some(3600000000L)),
      (4L, Some(20.0), Some(0L)),
      (5L, Some(20.0), Some(3600000000L)),
      (6L, None, None),
      (9L, Some(2.0), Some(1800000000L))))
  }
}
