package graft

import java.sql.Timestamp

import graft.ops.Checks

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("dataChecks computes metrics and pass/fail on planted-dirty data") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    // 8 rows: one null user, one null value, one dup event_id, one
    // out-of-domain type, one negative value
    val df = Seq(
      (1L, t, Option(10L), "view", Option(1.0), "{}"),
      (2L, t, Option(11L), "click", Option(2.0), "{}"),
      (3L, t, None: Option[Long], "view", Option(3.0), "{}"),
      (4L, t, Option(12L), "purchase", None: Option[Double], "{}"),
      (4L, t, Option(13L), "view", Option(4.0), "{}"),
      (5L, t, Option(14L), "weird", Option(5.0), "{}"),
      (6L, t, Option(15L), "view", Option(-1.0), "{}"),
      (7L, t, Option(16L), "purchase", Option(6.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Checks.dataChecks(df)
      .as[(String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("completeness_user_id")._2 == 0.875)  // 7/8
    assert(!got("completeness_user_id")._4)
    assert(got("completeness_value")._2 == 0.875)    // 7/8
    assert(got("uniqueness_event_id")._2 == 0.875)   // 7 distinct / 8
    assert(!got("uniqueness_event_id")._4)
    assert(got("domain_event_type")._2 == 0.875)     // 'weird' fails
    assert(got("non_negative_value")._2 == 0.857143) // 6/7 non-null, 6dp
    assert(!got("non_negative_value")._4)
    assert(got("purchase_share_min")._2 == 0.25)     // 2/8
    assert(got("purchase_share_min")._4)             // >= 0.01
  }

  test("dataChecks on an empty frame passes vacuously with metric 1.0, not NaN") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val empty = Seq((1L, t, Option(1L), "view", Option(1.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .filter($"event_id" < 0)
    val got = Checks.dataChecks(empty)
      .as[(String, Double, Double, Boolean)].collect()
    assert(got.length == 6)
    got.foreach { case (name, metric, _, passed) =>
      assert(!metric.isNaN, s"$name metric is NaN")
      assert(metric == 1.0, s"$name metric $metric, want vacuous 1.0")
      assert(passed, s"$name failed on empty input")
    }
  }

  test("custom suite validates a different table with the same machinery") {
    import org.apache.spark.sql.functions.{col, length}
    val docs = ingest.Sources.table(spark, sf("sf0.001"), "documents")
    val got = Checks.suite(docs, Seq(
      Checks.Uniqueness("doc_id"),
      Checks.Completeness("text"),
      Checks.InDomain("lang", Seq("de", "en", "es", "fr", "zh")),
      Checks.PredicateShare("nonempty_text", length(col("text")) > 0)))
      .as[(String, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 4)
    assert(got("uniqueness_doc_id")._4)
    assert(got("completeness_text")._4)
    assert(got("nonempty_text")._4)
    // the synthetic corpus is entirely in-domain for lang
    assert(got("domain_lang")._2 == 1.0)
  }

  test("keySkewReport ranks heavy keys with share and skew factor") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(2)(3L))
      .zipWithIndex.map { case (u, i) => (i.toLong, t, u, "view", 0.0, "{}") }
    import spark.implicits._
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Checks.keySkewReport(df, "user_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // 10 rows / 3 keys: key 1 holds 60% of rows at 1.8× the mean frequency
    assert(got == Seq(
      (1L, 6L, 3L, 0.6, 1.8), (2L, 2L, 3L, 0.2, 0.6),
      (3L, 2L, 3L, 0.2, 0.6)), got.toString)
  }

  test("joinProfile counts shared keys and orphans in both directions") {
    val left = Seq(1L, 1L, 2L, 3L, 5L).toDF("lk")   // dup key collapses
    val right = Seq(2L, 3L, 4L).toDF("rk")
    val got = Checks.joinProfile(left, "lk", right, "rk")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    // left keys {1,2,3,5}, right {2,3,4}: shared {2,3}, left-only {1,5},
    // right-only {4}; containment 2/4
    assert(got == ((4L, 3L, 2L, 2L, 1L, 0.5)), s"got $got")
  }

  test("dataChecks passes everything on the clean synthetic events") {
    val ev = ingest.Sources.events(spark, sf("sf0.001"))
    val got = Checks.dataChecks(ev)
      .as[(String, Double, Double, Boolean)].collect()
    assert(got.length == 6)
    assert(got.forall(_._4), s"failed checks: ${got.filterNot(_._4).toSeq}")
  }

  test("observedSuite rides an existing action and matches the suite " +
    "report bit-for-bit") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val df = Seq(
      (1L, t, Option(10L), "view", Option(1.0), "{}"),
      (2L, t, Option(11L), "click", Option(2.0), "{}"),
      (3L, t, None: Option[Long], "view", Option(3.0), "{}"),
      (4L, t, Option(12L), "purchase", None: Option[Double], "{}"),
      (5L, t, Option(14L), "weird", Option(5.0), "{}"),
      (6L, t, Option(15L), "view", Option(-1.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // Uniqueness is a DISTINCT aggregate — CollectMetrics must reject it
    val checks = ops.Checks.EventChecks
      .filterNot(_.isInstanceOf[ops.Checks.Uniqueness])
    intercept[IllegalArgumentException] {
      ops.Checks.observedSuite(df, ops.Checks.EventChecks)
    }
    val (instrumented, report) = ops.Checks.observedSuite(df, checks)
    // the ONLY pass over the data is the caller's own action — the
    // counters ride it via the CollectMetrics operator
    assert(instrumented.queryExecution.executedPlan.toString
      .contains("CollectMetrics"))
    val nRows = instrumented.count()
    assert(nRows == 6L)
    val observed = report().map(r => (r._1, r._2, r._3, r._4))
    val viaSuite = ops.Checks.suite(df, checks)
      .as[(String, Double, Double, Boolean)].collect().toSeq
    assert(observed.sortBy(_._1) == viaSuite.sortBy(_._1),
      s"observed $observed != suite $viaSuite")
  }

  test("kAnonymity: profiles, buckets, dominant-type tiebreak and the " +
      "at-risk flag match a driver replay; null users drop") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-01-02 00:00:00")
    def rows(uid: Long, day: Timestamp, types: Seq[String]) =
      types.zipWithIndex.map { case (ty, i) =>
        (uid * 100 + i, day, Option(uid), ty, Option(1.0), "{}") }
    // users 1-5 share a profile (day1, "1", view); user 6 is unique
    // (at_risk); user 7 ties view/click 2-2 → dominant = click (asc);
    // one null-user row must vanish from the report
    val df = ((1L to 5L).flatMap(u => rows(u, t, Seq("view"))) ++
      rows(6L, t2, Seq("purchase", "purchase", "view")) ++
      rows(7L, t, Seq("view", "click", "click", "view")) ++
      Seq((999L, t, None: Option[Long], "view", Option(1.0), "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Checks.kAnonymity(df)
      .as[(java.sql.Date, String, String, Long, Boolean)].collect().toSeq
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    assert(got == Seq(
      (d1, "1", "view", 5L, false),          // k = 5 meets the threshold
      (d1, "2-4", "click", 1L, true),        // tie → lexicographic min
      (d2, "2-4", "purchase", 1L, true)))
    assert(got.map(_._4).sum == 7L)          // null user contributes none
  }

  test("partitionAdvice: verdict ladder on cardinality, skew, small files") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    // one event type (too coarse); 20 uniform users (fine-grained but
    // tiny → too_fine); 2 days (too coarse)
    val df = (1 to 20).map(i =>
      (i.toLong, new Timestamp(t.getTime + (i % 2) * 86400000L),
        i.toLong, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = ops.Checks.partitionAdvice(df)
      .as[(String, Long, Double, Double, String)].collect().toSeq
    val byCol = got.map(r => r._1 -> r).toMap
    assert(byCol("event_type")._2 == 1L)
    assert(byCol("event_type")._5 == "too_coarse")
    assert(byCol("event_date")._5 == "too_coarse")
    assert(byCol("user_id")._2 == 20L)
    assert(byCol("user_id")._3 == 0.05)
    assert(byCol("user_id")._5 == "too_fine", got.toString)
  }
}
