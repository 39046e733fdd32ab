package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1704067200000L + min * 60000L)

  test("sessionConcurrency counts inclusive overlaps, keeps zero-overlap " +
    "sessions, and never counts self") {
    // u1: 0-10min; u2: 10-20min (touches u1 at minute 10 → inclusive
    // overlap); u3: 100-110min (isolated); u4: 5min point session inside u1
    val ev = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(10), 1L, "view", 1.0, "{}"),
      (3L, ts(10), 2L, "view", 1.0, "{}"), (4L, ts(20), 2L, "view", 1.0, "{}"),
      (5L, ts(100), 3L, "view", 1.0, "{}"), (6L, ts(110), 3L, "view", 1.0, "{}"),
      (7L, ts(5), 4L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = RangeJoin.sessionConcurrency(ev)
      .as[(Long, Timestamp, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 1L), got.toString)
  }

  test("bucket decomposition equals the naive overlap join for any bucket " +
    "width, each pair exactly once") {
    // adversarial intervals: spans from 0 to 50x the bucket width, shared
    // endpoints, containment, duplicates of the time range across ids
    val iv = (1L to 60L).map { i =>
      val s = (i * 7919) % 500
      (i, s, s + (i * 31) % 250)
    }
    val a = iv.toDF("a_id", "a_s", "a_e")
    val b = iv.map { case (i, s, e) => (i + 1000, s, e) }
      .toDF("b_id", "b_s", "b_e")
    val naive = a.crossJoin(b)
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 100L, 10000L)) {
      val got = RangeJoin.overlapJoin(a, "a_s", "a_e", b, "b_s", "b_e", w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"width $w: pair emitted more than once")
      assert(got.toSet == naive, s"width $w: ${got.toSet.size} vs ${naive.size}")
    }
  }

  test("peakConcurrency reads the step-function maximum per day, self " +
    "included, off the rank sweep") {
    // minute 0-10 u1, 5-? u4 point (peak 3 at minute 10 when u2 starts?
    // sessions: u1 [0,10], u2 [10,20], u3 [100,110], u4 [5,5]. Active at
    // starts: t=0 → {u1}=1; t=5 → {u1,u4}=2; t=10 → {u1,u2}=2 (u4 ended
    // at 5); t=100 → {u3}=1. All on one day → peak 2.
    val ev = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(10), 1L, "view", 1.0, "{}"),
      (3L, ts(10), 2L, "view", 1.0, "{}"), (4L, ts(20), 2L, "view", 1.0, "{}"),
      (5L, ts(100), 3L, "view", 1.0, "{}"),
      (6L, ts(110), 3L, "view", 1.0, "{}"),
      (7L, ts(5), 4L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = RangeJoin.peakConcurrency(ev)
      .as[(java.sql.Date, Long)].collect()
    assert(got.length == 1 && got.head._2 == 2L, got.toSeq.toString)
  }

  test("overlapJoinTailSplit equals the single-pass join pair-for-pair " +
    "on a heavy-tailed input, each pair exactly once") {
    // heavy tail by construction: most spans ~ the bucket width, a few
    // 100-1000x wider (the long-session shape that blew up the fine-
    // bucket fan-out); boundary spans sit EXACTLY at factor*bucket
    val iv = (1L to 80L).map { i =>
      val s = (i * 7919) % 1000
      val span =
        if (i % 17 == 0) 5000L + i // tail
        else if (i % 13 == 0) 5L * RangeJoin.TailBucketFactor // boundary
        else (i * 31) % 12
      (i, s, s + span)
    }
    val a = iv.toDF("a_id", "a_s", "a_e")
    val b = iv.map { case (i, s, e) => (i + 1000, s, e) }
      .toDF("b_id", "b_s", "b_e")
    val naive = a.crossJoin(b)
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 5L, 100L)) {
      val got = RangeJoin
        .overlapJoinTailSplit(a, "a_s", "a_e", b, "b_s", "b_e", w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"width $w: pair emitted more than once")
      assert(got.toSet == naive,
        s"width $w: ${got.toSet.size} vs ${naive.size}")
    }
  }

  test("overlapJoin fails fast on reserved columns and runaway fan-out") {
    val a = Seq((1L, 10L, 20L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((2L, 15L, 25L)).toDF("b_id", "b_s", "b_e")
    // reserved internal name on either side → immediate require, not
    // silent column loss
    val poisoned = a.withColumn("_lb", lit(0L))
    intercept[IllegalArgumentException] {
      RangeJoin.overlapJoin(poisoned, "a_s", "a_e", b, "b_s", "b_e", 5L)
    }
    // an open-ended sentinel interval with a tiny bucket would try to
    // materialize ~2.5e17/1 bucket ids — must raise clearly, not OOM
    val openEnded = Seq((1L, 0L, 300000000000000000L))
      .toDF("a_id", "a_s", "a_e")
    val err = intercept[Exception] {
      RangeJoin.overlapJoin(openEnded, "a_s", "a_e", b, "b_s", "b_e", 1L)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("raise bucketUs")),
      s"unexpected error: ${messages(err)}")
  }

  test("the bucketed plan is an equi-shuffle join, never a nested loop") {
    val a = (1L to 20L).map(i => (i, i * 10, i * 10 + 5)).toDF("a_id", "a_s", "a_e")
    val b = (1L to 20L).map(i => (i, i * 10 + 3, i * 10 + 8)).toDF("b_id", "b_s", "b_e")
    val plan = RangeJoin.overlapJoin(a, "a_s", "a_e", b, "b_s", "b_e", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }

  test("autoBucketUs picks the median span, floors degenerate inputs, " +
    "and leaves the join result unchanged") {
    // spans: 9 × 100s plus one 10000s outlier → median 100s (in µs)
    val iv = ((1 to 9).map(i => (i.toLong, i * 1000000000L,
        i * 1000000000L + 100000000L)) :+
      (10L, 0L, 10000000000L)).toDF("a_id", "a_s", "a_e")
    val w = RangeJoin.autoBucketUs(iv, "a_s", "a_e")
    assert(w == 100000000L, s"got $w")
    // point intervals floor at the default minute
    val pts = (1 to 5).map(i => (i.toLong, i * 1000L, i * 1000L))
      .toDF("a_id", "a_s", "a_e")
    assert(RangeJoin.autoBucketUs(pts, "a_s", "a_e") == 60000000L)
    // empty input floors too
    assert(RangeJoin.autoBucketUs(pts.filter(col("a_id") < 0L),
      "a_s", "a_e") == 60000000L)
    // width invariance: auto width ≡ a fixed width, pair for pair
    val b = iv.toDF("b_id", "b_s", "b_e")
    def pairs(bucket: Long) =
      RangeJoin.overlapJoin(iv, "a_s", "a_e", b, "b_s", "b_e", bucket,
          extraPred = col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(w) == pairs(7777777L))
  }
}
