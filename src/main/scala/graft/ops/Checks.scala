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
  * single-row aggregate — one scan, map-side partials, and the single
  * distinct count plans as a two-phase aggregate over one 8-byte key
  * column (no Expand; the bounded-width discipline from ops.Profile —
  * row text never shuffles). The per-constraint explosion happens on the 1-row
  * aggregate frame, so report size ∝ constraints, not data. Metrics are
  * ratios of exact longs rounded with the floor trick, so the pass/fail
  * PREDICATES are engine-identical and the whole report rides the hash
  * gate. */
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

  /** Constraint suite over the events table. Thresholds are inclusive
    * minima on the 6dp-rounded metric. */
  def dataChecks(events: DataFrame): DataFrame = {
    val agg = events.agg(
      count(lit(1)).as("n"),
      count(col("user_id")).as("nn_user"),
      count(col("value")).as("nn_value"),
      countDistinct(col("event_id")).as("d_eid"),
      count(when(col("event_type").isin(EventTypeDomain: _*), 1)).as("in_dom"),
      count(when(col("value") >= 0, 1)).as("nonneg"),
      count(when(col("event_type") === "purchase", 1)).as("n_purch"))
    def ratio(num: String, den: String) = vacuousRatio(col(num), col(den))
    val checks: Seq[(String, Column, Double)] = Seq(
      ("completeness_user_id", ratio("nn_user", "n"), 1.0),
      ("completeness_value", ratio("nn_value", "n"), 1.0),
      ("uniqueness_event_id", ratio("d_eid", "n"), 1.0),
      ("domain_event_type", ratio("in_dom", "n"), 1.0),
      ("non_negative_value", ratio("nonneg", "nn_value"), 1.0),
      ("purchase_share_min", ratio("n_purch", "n"), 0.01))
    agg.select(explode(array(checks.map { case (nm, m, thr) =>
        struct(lit(nm).as("check_name"), m.as("metric"),
          lit(thr).as("threshold"))
      }: _*)).as("c"))
      .select(col("c.check_name"), col("c.metric"), col("c.threshold"))
      .withColumn("passed", col("metric") >= col("threshold"))
      .orderBy("check_name")
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
}
