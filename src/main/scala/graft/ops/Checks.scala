package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Exprs._

/** Deequ-shape declarative data validation (the AWS Deequ / Great
  * Expectations pattern): a constraint suite evaluated in ONE aggregate
  * pass over the table, emitting a per-constraint report
  * `(check_name, metric, threshold, passed)` — the gate a production
  * pipeline runs before publishing a partition.
  *
  * Scale stance: every metric is a counter or a distinct-count inside a
  * single-row aggregate — one scan with map-side partials. ONE Uniqueness
  * check plans as a two-phase aggregate over its key column; several in
  * one suite plan as an Expand over those key columns (cost multiplies by
  * the distinct-aggregate count — keep keys narrow, the bounded-width
  * discipline from ops.Profile; row text never shuffles either way). The
  * per-constraint explosion happens on the 1-row aggregate frame, so
  * report size ∝ constraints, not data. Metrics are ratios of exact longs
  * rounded with the floor trick, so the pass/fail PREDICATES are
  * engine-identical and the whole report rides the hash gate. */
object Checks {
  /** Allowed event_type values (FIXTURES.md domain), sorted; shared with
    * the generated oracle IN-list. */
  val EventTypeDomain: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view").sorted

  /** The domain rendered for the DuckDB mirror. */
  def eventTypeDomainSql: String =
    EventTypeDomain.map(v => s"'$v'").mkString(", ")

  /** 6dp ratio with the zero-denominator case VACUOUSLY satisfied (all
    * zero rows meet the constraint) — ONE definition for every check
    * ratio, guarded explicitly on BOTH sides: unguarded, Spark yields NaN
    * (and NaN >= t is TRUE under Spark's NaN ordering — a silent pass
    * with a garbage metric) while DuckDB yields NULL, a latent hash-gate
    * divergence on an empty input. Mirror as
    * `CASE WHEN den = 0 THEN CAST(1.0 AS DOUBLE) ELSE floor(...) END`. */
  private[ops] def vacuousRatio(num: Column, den: Column): Column =
    when(den === 0, lit(1.0))
      .otherwise(round2(num.cast("double") / den, 6))

  /** One declarative constraint: a name, a numerator/denominator pair of
    * aggregate expressions (the metric is their [[vacuousRatio]]), and an
    * inclusive minimum threshold on the 6dp-rounded metric. The
    * constructors below cover the standard Deequ vocabulary; anything
    * else is a [[PredicateShare]]. */
  sealed trait Check {
    def name: String
    def numerator: Column
    def denominator: Column
    def threshold: Double
  }
  /** Non-null share of `column`. */
  final case class Completeness(column: String,
      threshold: Double = 1.0) extends Check {
    val name = s"completeness_$column"
    def numerator = count(col(column))
    def denominator = count(lit(1))
  }
  /** Distinct share of `column` (1.0 = a true key). The distinct count
    * shuffles only the key column — keep keys narrow (the bounded-width
    * discipline); several Uniqueness checks in one suite plan as an
    * Expand over those key columns. */
  final case class Uniqueness(column: String,
      threshold: Double = 1.0) extends Check {
    val name = s"uniqueness_$column"
    def numerator = countDistinct(col(column))
    def denominator = count(lit(1))
  }
  /** Share of rows whose `column` is in the allowed value set. */
  final case class InDomain(column: String, values: Seq[String],
      threshold: Double = 1.0) extends Check {
    val name = s"domain_$column"
    def numerator = count(when(col(column).isin(values: _*), 1))
    def denominator = count(lit(1))
  }
  /** Share of rows satisfying `predicate`, over all rows or (via `over`)
    * over the non-null rows of a column — the escape hatch for any
    * constraint the named shapes don't cover. */
  final case class PredicateShare(name: String, predicate: Column,
      threshold: Double = 1.0, over: Option[String] = None) extends Check {
    def numerator = count(when(predicate, 1))
    def denominator = over.map(c => count(col(c))).getOrElse(count(lit(1)))
  }

  /** Evaluate a constraint suite in ONE aggregate pass: every check's
    * numerator and denominator ride the same single-row aggregate (named
    * positionally, deduplication left to Catalyst's common-expression
    * handling), then the per-constraint explosion runs on the 1-row
    * frame. Report: `(check_name, metric, threshold, passed)` sorted by
    * name. */
  /** Shared by [[suite]] and [[observedSuite]]: validates the check list
    * and builds the positional num/den aggregate columns. */
  private def checkAggExprs(checks: Seq[Check]): Seq[Column] = {
    require(checks.nonEmpty, "empty check suite")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name)}")
    checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(c.numerator.as(s"_num$i"), c.denominator.as(s"_den$i"))
    }
  }

  def suite(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggExprs = checkAggExprs(checks)
    val agg = df.agg(aggExprs.head, aggExprs.tail: _*)
    agg.select(explode(array(checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"),
          vacuousRatio(col(s"_num$i"), col(s"_den$i")).as("metric"),
          lit(c.threshold).as("threshold"))
      }: _*)).as("c"))
      .select(col("c.check_name"), col("c.metric"), col("c.threshold"))
      .withColumn("passed", col("metric") >= col("threshold"))
      .orderBy("check_name")
  }

  /** The standard suite for the events table (thresholds: hard 1.0 for
    * integrity constraints, a floor for the purchase share). */
  val EventChecks: Seq[Check] = Seq(
    Completeness("user_id"),
    Completeness("value"),
    Uniqueness("event_id"),
    InDomain("event_type", EventTypeDomain),
    PredicateShare("non_negative_value", col("value") >= 0,
      over = Some("value")),
    PredicateShare("purchase_share_min", col("event_type") === "purchase",
      threshold = 0.01))

  /** [[suite]] with [[EventChecks]] — the oracle-gated entry. */
  def dataChecks(events: DataFrame): DataFrame = suite(events, EventChecks)

  /** ZERO-PASS metrics: the same constraint counters piggybacked on an
    * EXISTING job via `Dataset.observe` (Catalyst's `CollectMetrics`
    * operator) instead of [[suite]]'s dedicated aggregate scan. At 100 TB
    * the difference is a whole extra pass over the input: here the
    * counters accumulate inside whatever action the caller was running
    * anyway (the write, the count, the downstream aggregate) for free.
    *
    * Returns the instrumented frame — substitute it for `df` in the real
    * job — and a report thunk that renders the familiar
    * `(check_name, metric, threshold, passed)` rows once ANY action on
    * the frame has completed (`Observation.get` blocks until then; one
    * Observation instruments one action).
    *
    * [[Uniqueness]] checks are rejected by construction: `CollectMetrics`
    * forbids DISTINCT aggregates (they cannot accumulate in a single
    * pass over unordered partials) — run those through [[suite]] or an
    * md5-digest group-by. Metrics round with the same floor trick as
    * [[vacuousRatio]], so observed and suite-computed reports are
    * bit-identical (spec-pinned). */
  def observedSuite(df: DataFrame, checks: Seq[Check],
      name: String = "graft_checks")
      : (DataFrame, () => Seq[(String, Double, Double, Boolean)]) = {
    require(!checks.exists(_.isInstanceOf[Uniqueness]),
      "CollectMetrics forbids DISTINCT aggregates - run Uniqueness via suite")
    val aggExprs = checkAggExprs(checks)
    val obs = org.apache.spark.sql.Observation(name)
    val instrumented = df.observe(obs, aggExprs.head, aggExprs.tail: _*)
    val report = () => {
      val row = obs.get
      checks.zipWithIndex.map { case (c, i) =>
        val num = row(s"_num$i").asInstanceOf[Number].longValue()
        val den = row(s"_den$i").asInstanceOf[Number].longValue()
        // driver-side [[vacuousRatio]]: same vacuous-1.0 guard, same 6dp
        // floor trick — the spec pins bit-identity with the suite pass
        val metric =
          if (den == 0) 1.0
          else math.floor(num.toDouble / den * 1e6 + 0.5) / 1e6
        (c.name, metric, c.threshold, metric >= c.threshold)
      }
    }
    (instrumented, report)
  }

  /** Join-key profile — the referential-integrity check a pipeline runs
    * BEFORE a 100 TB join: distinct key counts per side, the shared-key
    * count, orphans in each direction (left orphans = FK violations when
    * `right` is the dimension), and the left containment ratio that
    * predicts the join hit rate.
    *
    * Shape: each side collapses to its DISTINCT key frame FIRST (the only
    * input-sized work, map-side partial dedup), then a keys-sized FULL
    * OUTER join and a single-row aggregate. Never joins the fact tables
    * themselves — cost ∝ distinct keys, not rows. */
  /** Top-key count of [[keySkewReport]] — shared with its mirror. */
  val SkewTopK = 10

  def joinProfile(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val l = left.select(col(leftKey).as("k")).filter(col("k").isNotNull)
      .distinct().withColumn("in_l", lit(1))
    val r = right.select(col(rightKey).as("k")).filter(col("k").isNotNull)
      .distinct().withColumn("in_r", lit(1))
    l.join(r, Seq("k"), "full_outer")
      .agg(
        count(col("in_l")).as("n_left_keys"),
        count(col("in_r")).as("n_right_keys"),
        count(when(col("in_l").isNotNull && col("in_r").isNotNull, 1))
          .as("n_shared"),
        count(when(col("in_r").isNull, 1)).as("n_left_only"),
        count(when(col("in_l").isNull, 1)).as("n_right_only"))
      .withColumn("left_containment",
        vacuousRatio(col("n_shared"), col("n_left_keys")))
  }

  /** Join-key SKEW profile — the other half of the pre-join toolkit
    * next to [[joinProfile]] (that one predicts match rates; this one
    * predicts straggler tasks): the `topK` heaviest keys with their row
    * share and skew factor (frequency ÷ mean frequency — the AQE
    * skew-split trigger is exactly this ratio). Cost ∝ keys, not rows:
    * one partial-aggregated count shuffle, the global totals as a 1-row
    * broadcast frame, top-k via TakeOrderedAndProject. Shares divide
    * exact longs as doubles with shared rounding — hash-gated. */
  def keySkewReport(df: DataFrame, keyCol: String,
      topK: Int = SkewTopK): DataFrame = {
    val counts = df.select(col(keyCol).as("key")).filter(col("key").isNotNull)
      .groupBy("key").agg(count(lit(1)).as("freq"))
    val tot = counts.agg(sum(col("freq")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select(col("key"), col("freq"), col("n_keys"),
        round2(col("freq").cast("double") / col("total_rows"), 6).as("share"),
        round2(col("freq").cast("double") * col("n_keys") / col("total_rows"),
          4).as("skew_factor"))
      .orderBy(col("freq").desc, col("key"))
      .limit(topK)
  }

  /** Partition-advisor thresholds — shared with the mirror's CASE. */
  val AdviceMinPartitions = 8L
  val AdviceSkewShare = 0.2
  val AdviceMinRowsPerPartition = 1000.0

  /** Partition-layout advisor — the lakehouse design check run before
    * picking a table's partition column: for each CANDIDATE key
    * (event_type, event day, user_id) the distinct-partition count, the
    * heaviest partition's row share, mean rows per partition, and a
    * verdict — `too_coarse` (< [[AdviceMinPartitions]] partitions: no
    * parallelism/pruning), `skewed` (one partition holds >
    * [[AdviceSkewShare]] of rows: a straggler by construction),
    * `too_fine` (mean rows < [[AdviceMinRowsPerPartition]]: the
    * small-files problem q_compaction_plan then has to fix), else `ok`.
    *
    * One value-counts aggregate per candidate (map-side partials; the
    * per-value frame is partitions-sized), verdicts compared on the
    * 4dp-ROUNDED share/mean (quantile-parity discipline). */
  def partitionAdvice(events: DataFrame): DataFrame = {
    def cand(name: String, v: Column): DataFrame =
      events.select(v.as("v")).groupBy("v")
        .agg(count(lit(1)).as("cnt"))
        .agg(lit(name).as("part_col"),
          count(lit(1)).as("n_partitions"),
          max(col("cnt")).as("top_cnt"),
          sum(col("cnt")).as("total"))
    cand("event_type", col("event_type"))
      .unionByName(cand("event_date", to_date(col("ts")).cast("string")))
      .unionByName(cand("user_id", col("user_id").cast("string")))
      .select(col("part_col"), col("n_partitions"),
        round2(col("top_cnt").cast("double") / col("total"), 4)
          .as("top_share"),
        round2(col("total").cast("double") / col("n_partitions"), 4)
          .as("avg_rows"))
      .withColumn("advice",
        when(col("n_partitions") < AdviceMinPartitions, "too_coarse")
          .when(col("top_share") > AdviceSkewShare, "skewed")
          .when(col("avg_rows") < AdviceMinRowsPerPartition, "too_fine")
          .otherwise("ok"))
      .orderBy("part_col")
  }

  /** k-anonymity threshold and activity-bucket edges for
    * [[kAnonymity]] — shared with the generated mirror's CASE chain. */
  val KAnonK = 5L
  val KAnonBucketEdges: Seq[Long] = Seq(2L, 5L, 10L)

  /** `q_k_anonymity`: re-identification risk audit over the event log —
    * the privacy check run before releasing behavioral data as training
    * corpus. Each user collapses to a QUASI-IDENTIFIER profile
    * `(first_date, activity_bucket, dominant_type)` — derived
    * attributes an adversary with partial knowledge could match on —
    * and the report counts users per profile: a profile with fewer than
    * [[KAnonK]] users is `at_risk` (its members are k-anonymous only
    * below the policy threshold). All arithmetic is exact counts and
    * CASE buckets; the dominant event type tie-breaks to the
    * lexicographically smallest (row_number over count desc, type asc
    * nulls last — the fuzz null-ordering rule). Null-user rows drop at
    * the profile join in BOTH engines (equi-join semantics — never a
    * window re-attach, per the null-key join rule).
    *
    * Scale: two user-keyed hash aggregates (map-side partials) + a
    * per-user window over ≤ |event-type domain| rows + one
    * profile-keyed count — nothing beyond the DAU family's shape. */
  def kAnonymity(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Seq(e1, e2, e3) = KAnonBucketEdges
    val byUser = events.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      min(to_date(col("ts"))).as("first_date"))
    val dom = events.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("c").desc, col("event_type").asc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("dominant_type"))
    byUser.join(dom, Seq("user_id"))
      .select(col("first_date"), col("dominant_type"),
        when(col("n") < e1, "1").when(col("n") < e2, s"$e1-${e2 - 1}")
          .when(col("n") < e3, s"$e2-${e3 - 1}")
          .otherwise(s"$e3+").as("activity_bucket"))
      .groupBy("first_date", "activity_bucket", "dominant_type")
      .agg(count(lit(1)).cast("long").as("n_users"))
      .withColumn("at_risk", col("n_users") < KAnonK)
      .orderBy(col("first_date").asc_nulls_last, col("activity_bucket"),
        col("dominant_type").asc_nulls_last)
  }
}
