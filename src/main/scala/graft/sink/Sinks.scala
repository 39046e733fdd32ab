package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** Sinks (SURVEY.md §2.1 S4/S5/S7/S8), Spark-first.
  *
  * The reference's Kafka producer collects every row to the driver and loops
  * (`reference:airflow_docker/dags/ecomm_pipeline/producer.py:47-71`) — the
  * one anti-pattern we explicitly do NOT replicate: here serialization is a
  * distributed projection and the write is a distributed sink, so throughput
  * scales with executors instead of the driver NIC.
  *
  * No kafka connector jar ships in this environment, so the Kafka-shaped
  * frame (`key`,`value`) is exercised against file/memory sinks; with
  * spark-sql-kafka on the classpath the same frame feeds
  * `.write.format("kafka")` unchanged.
  */
object Sinks {
  /** Kafka-shaped envelope keyed by user (partitioning parity with
    * `producer.py:60`): deterministic hand-built JSON value. Timestamps ride
    * as epoch micros and money as 2dp decimal text, so the byte-exact
    * envelope is reproducible in any engine (doubles never stringify). */
  def kafkaEnvelope(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("user_id").cast(StringType).as("kafka_key"),
      concat(
        lit("{\"event_id\":"), col("event_id").cast(StringType),
        lit(",\"ts_us\":"), unix_micros(col("ts")).cast(StringType),
        lit(",\"event_type\":\""), col("event_type"),
        lit("\",\"price\":"), col("value").cast(DecimalType(18, 2)).cast(StringType),
        lit("}")).as("kafka_value"))
      .orderBy("event_id")

  /** Idiomatic variant of the envelope (`to_json(struct(...))`) — the form
    * you'd ship to a real broker; ISO-millis timestamp formatting parity
    * with `producer.py:36`. */
  def jsonEnvelope(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast(StringType).as("key"),
      to_json(struct(
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("event_time"),
        col("event_id"), col("event_type"), col("user_id"),
        col("value").as("price"), col("props"))).as("value"))

  /** AVRO envelope for the aggregated/processed topic (SURVEY S7; the
    * reference's PROCESSED topic is AVRO, `reference:README.md:39,216`):
    * Kafka-shaped (key, binary value) frame with the value in real Avro
    * binary wire format via [[graft.ext.AvroEnvelope]]. Byte-deterministic:
    * timestamps ride as epoch micros, no doubles are stringified. */
  def avroEnvelope(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("user_id").cast(StringType).as("kafka_key"),
      graft.ext.AvroEnvelope.encode(
        col("event_id"), unix_micros(col("ts")), col("user_id"),
        col("event_type"), col("value")).as("kafka_value"))

  /** Date-partitioned parquet layer (the Snowflake "partitioned by event
    * timestamps" layout, `reference:README.md:40`): downstream day-range
    * predicates prune whole directories (`PruneFileSourcePartitions`). */
  def writeDatePartitioned(events: DataFrame, path: String): Unit =
    events.withColumn("event_date", to_date(col("ts")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path)

  /** TRUNCATE+INSERT full-refresh semantics of the reference's reporting
    * layer (`snowflake_refresh.py:7-8`). */
  def overwrite(result: DataFrame, path: String): Unit =
    result.write.mode(SaveMode.Overwrite).parquet(path)

  /** Streaming warehouse layering (`reference:README.md:36-40,162-176`,
    * ST7): per micro-batch, append the raw events into the date-partitioned
    * RAW layer and refresh a REPORTING aggregate — the
    * Kafka→Snowflake-connector→RAW + reporting pattern, expressed as one
    * foreachBatch sink. Returns the handle; callers own
    * `processAllAvailable`/`stop`.
    *
    * Refresh is PARTITION-SCOPED by default (`incremental = true`): only the
    * `event_date` partitions present in the micro-batch are recomputed —
    * the RAW read prunes to those day directories
    * (`PruneFileSourcePartitions`) and the REPORTING write uses dynamic
    * partition overwrite, so per-batch cost is O(affected days), constant as
    * history accumulates. This is the Spark-native twin of the reference's
    * continuously-maintained PROCESSED layer (`reference:README.md:39,47`);
    * re-reading all of RAW each batch (the TRUNCATE+INSERT literalism) grows
    * without bound and is kept only as the `incremental = false` fallback
    * for reporting aggregates that are NOT per-day decomposable.
    *
    * Incremental contract: `reporting` must key its output by an
    * `event_date` column derived from the input rows' `ts` (any per-day
    * group-by qualifies, e.g. [[graft.ops.EventQueries.dailyRevenue]]) —
    * validated eagerly against an empty frame before the stream starts, so
    * a non-conforming aggregate fails at call time with a clear message,
    * not mid-stream inside `foreachBatch`. Both modes write day-keyed
    * REPORTING output date-partitioned, so toggling `incremental` never
    * mixes layouts under `reportingPath`; note the partitioned read-back
    * surfaces `event_date` as the LAST column — select by name, not
    * position. The per-batch driver `collect()` is the distinct day
    * list only — bounded by the batch's event-time span, never by volume.
    *
    * `trigger = None` runs micro-batches as fast as they arrive (the
    * processAllAvailable test shape); production passes
    * `Some(Trigger.ProcessingTime("5 minutes"))` for the reference's
    * freshness SLO (`reference:README.md:51`, ST5). */
  def streamToWarehouse(events: DataFrame, rawPath: String,
      reportingPath: String, checkpoint: String,
      reporting: DataFrame => DataFrame,
      incremental: Boolean = true,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    if (incremental) {
      // schema-only dry run over an empty frame with EXACTLY the runtime
      // shape: both foreachBatch branches call reporting() on frames whose
      // event_date column has been dropped (the RAW read-back minus the
      // partition column ≡ events.schema), so the probe must not add one —
      // a reporting fn leaning on a pre-stamped event_date would otherwise
      // pass here and then throw mid-stream.
      val probe = events.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), events.schema)
      require(reporting(probe).columns.contains("event_date"),
        "incremental streamToWarehouse requires the reporting aggregate to " +
          "key its output by an 'event_date' column (group by " +
          "to_date(col(\"ts\"))); pass incremental = false for aggregates " +
          "that are not per-day decomposable")
    }
    val writer = events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val stamped = batch.withColumn("event_date", to_date(col("ts")))
        stamped.write.mode(SaveMode.Append)
          .partitionBy("event_date").parquet(rawPath)
        if (incremental) {
          val days = stamped.select("event_date").distinct()
            .collect().map(_.getDate(0))
          if (days.nonEmpty) {
            val affected = spark.read.parquet(rawPath)
              .filter(col("event_date").isin(days.toIndexedSeq: _*))
              .drop("event_date")
            reporting(affected)
              .write.mode(SaveMode.Overwrite)
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("event_date")
              .parquet(reportingPath)
          }
        } else {
          val raw = spark.read.parquet(rawPath).drop("event_date")
          val full = reporting(raw)
          // keep the on-disk layout identical to incremental mode for
          // day-keyed aggregates, so toggling modes never mixes layouts
          val w = full.write.mode(SaveMode.Overwrite)
          if (full.columns.contains("event_date"))
            w.partitionBy("event_date").parquet(reportingPath)
          else w.parquet(reportingPath)
        }
      }
      .start()
  }

  /** CDC-style upsert into a parquet path: keep target rows whose key has
    * no update (anti-join), union the updates, swap via two renames
    * (target → backup, tmp → target; plain parquet has no ACID merge — the
    * rewrite is the no-table-format equivalent of MERGE INTO). A crash
    * between the renames leaves both the old data (backup dir) and the new
    * (tmp dir) on disk; nothing is deleted until the new data is live. At
    * scale, partition the target by a key prefix and rewrite only affected
    * partitions. */
  def upsertParquet(updates: DataFrame, path: String,
      keyCols: Seq[String]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val spark = updates.sparkSession
    val target = Paths.get(path)
    val merged =
      if (Files.exists(target)) {
        val existing = spark.read.parquet(path)
        existing.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
          .unionByName(updates)
      } else updates
    val tmp = Paths.get(path + ".upsert-tmp")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap: the write above has already fully materialized (no lazy reads
    // of `path` remain). Move the old data aside, move the new data in,
    // only then delete the old — the target is never the sole copy removed.
    val backup = Paths.get(path + ".upsert-old")
    if (Files.exists(backup)) deleteRecursively(backup)
    if (Files.exists(target))
      Files.move(target, backup, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(backup)) deleteRecursively(backup)
  }

  /** Small-file compaction: rewrite a parquet path into files of
    * ~`targetBytes` each (streaming appends and per-batch writes accumulate
    * tiny files whose per-file open/footer cost eventually dominates scans
    * — the standard operational chore at 100 TB). File count follows the
    * CURRENT on-disk size; the rewrite reuses [[upsertParquet]]'s
    * backup-then-swap so a crash never leaves the target as the sole
    * deleted copy.
    *
    * Hive-partitioned layouts (`k=v/` directories, e.g.
    * [[writeDatePartitioned]] output) are PRESERVED: the inferred
    * partition columns are re-applied with `partitionBy` on the rewrite.
    * Flattening them instead would be a correctness hazard — a later
    * dynamic-partition-overwrite refresh only replaces matching partition
    * directories, so rows baked into flat files would survive as
    * duplicates. At scale, run per partition directory. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L << 20): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(path)
    val onDisk = {
      val walk = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
          .map(Files.size).sum
      } finally walk.close()
    }
    // detect partition levels: descend while a child dir is named k=v
    val partitionCols = {
      import scala.jdk.CollectionConverters._
      val keys = Seq.newBuilder[String]
      var cur = dir
      var descend = true
      while (descend) {
        val kv = Files.list(cur).iterator().asScala
          .find(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
        kv match {
          case Some(p) =>
            keys += p.getFileName.toString.takeWhile(_ != '=')
            cur = p
          case None => descend = false
        }
      }
      keys.result()
    }
    val nFiles = math.max(1L, (onDisk + targetBytes - 1) / targetBytes).toInt
    val tmp = Paths.get(path + ".compact-tmp")
    val writer = spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(tmp.toString)
    val backup = Paths.get(path + ".compact-old")
    if (Files.exists(backup)) deleteRecursively(backup)
    Files.move(dir, backup, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(backup)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(p)
    try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    finally walk.close()
  }

  /** Range-partitioned, internally sorted layout: `repartitionByRange` +
    * `sortWithinPartitions` writes files with DISJOINT key ranges, each
    * internally ordered — so parquet footer min/max stats let a range scan
    * skip whole files and row groups (the poor-man's clustering a 100 TB
    * time-series or id-ordered corpus wants; the same idea as Z-order for
    * one key). Sampling picks balanced boundaries, so file sizes track data
    * volume even under key skew. */
  def writeRangeLayout(df: DataFrame, path: String, partitions: Int,
      cols: String*): Unit =
    df.repartitionByRange(partitions, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Bucketed + sorted table: two tables bucketed on the same key join
    * co-located — no Exchange on either side — which is the pre-partitioning
    * strategy for repeated fact-fact joins at 100 TB (pay the shuffle once
    * at write time, never again). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
