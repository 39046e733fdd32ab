package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Reference-parity batch cleaning (SURVEY.md §2.2 P1–P6, P10–P11, §2.5 W1):
  * the cast chain of
  * `reference:airflow_docker/dags/ecomm_pipeline/extractor.py:105-124` over
  * a stringly CSV frame, expressed as one declarative projection so Catalyst
  * collapses it into the scan.
  */
object Cleaning {
  /** ISO-8601 gate used by the producer before serialization
    * (`reference:airflow_docker/dags/ecomm_pipeline/producer.py:18-20`). */
  val IsoTimestampPattern: String =
    "^\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?([+-]\\d{2}:?\\d{2}|Z| UTC)?$"

  /** The full cast chain (`extractor.py:106-114`):
    * timestamp/date derivation, 4 string casts, the deliberate null
    * *pass-through* for brand/category_code (NOT imputation), and the price
    * null→0.0 coalesce. Input: all-string columns named as the canonical
    * event schema. */
  def castChain(raw: DataFrame): DataFrame =
    raw.select(
      to_timestamp(col("event_time")).as("event_time"),
      to_date(to_timestamp(col("event_time"))).as("event_date"),
      col("event_type").cast(StringType).as("event_type"),
      col("product_id").cast(StringType).as("product_id"),
      col("category_id").cast(StringType).as("category_id"),
      when(col("category_code").isNotNull, col("category_code"))
        .otherwise(lit(null)).cast(StringType).as("category_code"),
      when(col("brand").isNotNull, col("brand"))
        .otherwise(lit(null)).cast(StringType).as("brand"),
      coalesce(col("price").cast(DoubleType), lit(0.0)).as("price"),
      col("user_id").cast(StringType).as("user_id"),
      col("user_session").cast(StringType).as("user_session"))

  /** Per-day earliest-N cap (`extractor.py:117-124`): row_number over
    * (partition event_date, order event_time) with an explicit tiebreak
    * column for determinism, filter ≤ n, drop the rank. Spark ≥3.5 rewrites
    * the rank filter into a window group limit (per-partition top-n heap). */
  def capPerDay(df: DataFrame, n: Int, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col("event_date"))
      .orderBy(col("event_time"), col(tiebreak))
    df.withColumn("row_num", row_number().over(w))
      .filter(col("row_num") <= n)
      .drop("row_num")
  }

  /** Producer-side timestamp validity gate (P11), as a distributed filter
    * instead of the reference's per-row driver loop. */
  def validTimestamps(df: DataFrame, tsStringCol: String): DataFrame =
    df.filter(col(tsStringCol).rlike(IsoTimestampPattern))

  /** Rule-based quarantine split — the dead-letter path [[validTimestamps]]
    * lacks: instead of silently dropping rows that fail validation, split
    * the frame into (valid, quarantined) where every quarantined row
    * carries the comma-joined names of ALL rules it failed (one projection
    * evaluates every rule once; `concat_ws` skips the null of a passing
    * rule). Each `rule` maps name → BAD-row predicate; a predicate that
    * evaluates to NULL (e.g. a comparison over a null column) counts as
    * passing — wrap with `coalesce(p, lit(true))` to quarantine nulls.
    *
    * Both halves are pure filters over the same projection: Catalyst
    * pushes them into the scan, and a caller landing both sinks pays one
    * pass per sink with no shuffle (or persists the tagged frame once). */
  def splitQuarantine(df: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)])
      : (DataFrame, DataFrame) = {
    val reason = concat_ws(",",
      rules.map { case (name, bad) => when(bad, lit(name)) }: _*)
    val tagged = df.withColumn("quarantine_reason", reason)
    (tagged.filter(col("quarantine_reason") === "").drop("quarantine_reason"),
      tagged.filter(col("quarantine_reason") =!= ""))
  }

  /** The standing rule set `q_quarantine` reports: sub-unit purchases
    * (suspected unit errors), values above the catalog ceiling, and
    * error-type events routed to the dead letter. */
  def standardEventRules: Seq[(String, org.apache.spark.sql.Column)] = Seq(
    "micro_purchase" -> (col("event_type") === "purchase" && col("value") < 1.0),
    "outlier_value" -> (col("value") > 400.0),
    "error_event" -> (col("event_type") === "error"))
}
