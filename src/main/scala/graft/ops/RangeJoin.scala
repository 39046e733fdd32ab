package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join — an operator Spark has no native physical
  * strategy for: a bare `a.s <= b.e AND b.s <= a.e` join predicate plans as
  * BroadcastNestedLoopJoin (quadratic compute, and undistributable once
  * neither side broadcasts). The classic fix is BUCKET DECOMPOSITION
  * (DuckDB's IEJoin and Databricks' range-join hints solve the same
  * problem): explode each interval onto the fixed-width buckets it covers,
  * equi-join on the bucket id — a shuffle join AQE can size and skew-split
  * — and keep the overlap predicate as a post-join filter.
  *
  * Duplicate elimination is FREE, not a distinct: an overlapping pair would
  * meet once per shared bucket, so the join keeps only the bucket
  * containing `greatest(aS, bS)` — the first overlapping point, which both
  * intervals cover by definition of overlap — and every pair survives
  * exactly once, no dedup shuffle.
  *
  * Scale notes: fan-out per row is `span/bucketWidth + 1` — pick the width
  * near the TYPICAL span so the blow-up stays O(1) per row; a hot bucket
  * (many concurrent intervals) is an equi-join skew key, which AQE
  * skew-split handles (the advantage over a window-by-bucket formulation,
  * which gets no skew handling — the round-6 rule).
  */
object RangeJoin {
  /** Hard per-interval fan-out cap: an interval spanning more buckets than
    * this (a mis-sized `bucketUs`, or an open-ended sentinel end bound)
    * fails FAST with a clear message instead of dying deep in codegen on
    * the array-size limit or OOM-ing the executor. */
  val MaxBucketsPerInterval = 100000L

  /** Pairs of `left` × `right` rows whose [lS,lE] / [rS,rE] µs intervals
    * overlap INCLUSIVELY, each pair exactly once, plus `extraPred` (e.g. a
    * self-pair exclusion). Column names must be disjoint across the two
    * sides, and `_lb`/`_rb` are RESERVED for the internal bucket ids
    * (rejected up front — `withColumn` would silently overwrite a caller
    * column of that name). Bounds are non-negative longs (µs since
    * epoch); spans wider than [[MaxBucketsPerInterval]] buckets raise at
    * run time. */
  def overlapJoin(left: DataFrame, lS: String, lE: String,
      right: DataFrame, rS: String, rE: String,
      bucketUs: Long, extraPred: Column = lit(true)): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive: $bucketUs")
    val reserved = (left.columns ++ right.columns).toSet
      .intersect(Set("_lb", "_rb"))
    require(reserved.isEmpty,
      s"overlapJoin reserves column names _lb/_rb; rename: $reserved")
    def buckets(s: String, e: String): org.apache.spark.sql.Column = expr(
      s"""explode(CASE
         |  WHEN ($e div $bucketUs) - ($s div $bucketUs)
         |       <= ${MaxBucketsPerInterval}
         |  THEN sequence($s div $bucketUs, $e div $bucketUs)
         |  ELSE CAST(raise_error(concat(
         |    'overlapJoin: interval [', CAST($s AS STRING), ',',
         |    CAST($e AS STRING), '] spans more than
         | ${MaxBucketsPerInterval} buckets - raise bucketUs'))
         |    AS ARRAY<BIGINT>) END)""".stripMargin.replace("\n", " "))
    val lb = left.withColumn("_lb", buckets(lS, lE))
    val rb = right.withColumn("_rb", buckets(rS, rE))
    lb.join(rb,
        col("_lb") === col("_rb") &&
          col(lS) <= col(rE) && col(rS) <= col(lE) &&
          expr(s"_lb = (greatest($lS, $rS) div $bucketUs)") &&
          extraPred)
      .drop("_lb", "_rb")
  }

  /** Data-derived bucket width for [[overlapJoin]]: the MEDIAN interval
    * span (one approx-percentile aggregate over `e − s`), floored at
    * `floorUs`. The join RESULT is bucket-width invariant (spec-proven in
    * RangeJoinSpec), so this tunes only fan-out and skew: a width near
    * the typical span keeps the per-row explode O(1), while the floor
    * stops a point-interval-dominated input from degenerating into
    * per-microsecond buckets. Long-tail intervals still hit the
    * [[MaxBucketsPerInterval]] guard loudly rather than silently
    * exploding. */
  def autoBucketUs(intervals: DataFrame, s: String, e: String,
      floorUs: Long = 60L * 1000000L): Long = {
    require(floorUs > 0, s"floorUs must be positive: $floorUs")
    val p50 = intervals
      .agg(percentile_approx((col(e) - col(s)).cast("long"), lit(0.5),
        lit(10000)).as("p"))
      .head().getAs[java.lang.Long]("p")
    if (p50 == null) floorUs else math.max(floorUs, p50.longValue())
  }

  /** Session concurrency — how many OTHER sessions overlap each session in
    * time (the live-concurrency metric an ops dashboard reads): the
    * [[overlapJoin]] self-join over [[WindowedQueries.sessionize]]'s
    * intervals, zero-overlap sessions kept via the left join back. The
    * oracle mirror states the NAIVE quadratic overlap self-join, so the
    * hash gate certifies bucket decomposition ≡ naive semantics
    * (inclusive bounds, self-exclusion, zero rows) pair-for-pair.
    *
    * Same-user sessions never overlap by construction (gap-separated), so
    * excluding the identical (user, start) pair excludes exactly the
    * self-pairs. The sessions frame is pinned once — three consumers
    * (both join sides and the zero-fill) must not re-run the
    * events-sized sessionization per branch. */
  def sessionConcurrency(events: DataFrame,
      bucketMinutes: Int = 60): DataFrame = {
    val iv = WindowedQueries.sessionize(events)
      .select(col("user_id"), col("session_start"),
        unix_micros(col("session_start")).as("s_us"),
        (unix_micros(col("session_start")) + col("duration_us")).as("e_us"))
      .localCheckpoint(true)
    val a = iv.toDF("a_user", "a_start", "a_s", "a_e")
    val b = iv.toDF("b_user", "b_start", "b_s", "b_e")
    val pairs = overlapJoin(a, "a_s", "a_e", b, "b_s", "b_e",
        bucketMinutes.toLong * 60L * 1000000L,
        extraPred = !(col("a_user") === col("b_user") &&
          col("a_start") === col("b_start")))
      .groupBy(col("a_user"), col("a_start"))
      .agg(count(lit(1)).as("n"))
    iv.join(pairs,
        iv("user_id") === pairs("a_user") &&
          iv("session_start") === pairs("a_start"), "left_outer")
      .select(col("user_id"), col("session_start"),
        coalesce(col("n"), lit(0L)).as("n_concurrent"))
      .orderBy("user_id", "session_start")
  }
}
