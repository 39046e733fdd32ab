package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Entry-A parity: the reference's monthly batch extraction
  * (`reference:airflow_docker/dags/ecomm_pipeline/extractor.py:89-164`,
  * SURVEY §3.1) as one declarative pipeline — stringly CSV scan → cast
  * chain → per-day earliest-N cap → parquet overwrite — plus the extract
  * statistics (per-day counts, total, distinct days; `extractor.py:127-130`)
  * computed off one cached frame, and the resumable month cursor advanced
  * atomically. The driver-side `collect()` loop of the reference's producer
  * stage is NOT replicated; the Kafka-shaped envelope is a distributed
  * projection (see [[graft.sink.Sinks.kafkaEnvelope]]).
  */
object Pipeline {
  final case class ExtractResult(outputPath: String, rowCount: Long,
      distinctDays: Long, month: String)

  def extractMonth(spark: SparkSession, csvPath: String, outputPath: String,
      checkpointPath: String, month: String, capPerDay: Int = 10000)
      : ExtractResult = {
    val raw = Sources.rawCsv(spark, csvPath)
    val cleaned = Cleaning.castChain(raw)
    val capped = Cleaning.capPerDay(cleaned, capPerDay, "product_id")
    capped.persist()
    try {
      // C2 (`reference:ecommerce_pipeline_dag.py:43-44`): an empty extract
      // aborts before any write/produce step, surfaced as an exception for
      // the scheduler's retry policy. `isEmpty` is a limit-1 probe on the
      // cached frame — not a full count.
      if (capped.isEmpty)
        throw new IllegalStateException(
          s"empty extract for month $month from $csvPath")
      // stats before write, served from cache (C1: persist across actions)
      val stats = capped.groupBy(col("event_date"))
        .agg(count(lit(1)).as("event_count"))
      val total = stats.agg(coalesce(sum(col("event_count")), lit(0L)))
        .head().getLong(0)
      val days = stats.count()
      capped.write.mode(SaveMode.Overwrite).parquet(outputPath)
      val ck = ReplayCheckpoint.load(checkpointPath,
        ReplayCheckpoint(month, 0L))
      ReplayCheckpoint.save(checkpointPath,
        (if (ck.month == month) ck else ck.rotate(month)).advance(total))
      ExtractResult(outputPath, total, days, month)
    } finally capped.unpersist()
  }
}
