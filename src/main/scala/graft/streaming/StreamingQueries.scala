package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Exprs._

/** Structured-Streaming twins of the reference's Flink-SQL layer
  * (SURVEY.md §2.8: "rolling aggregations, windowing functions, or filtering
  * based on event types", `reference:README.md:47`; the Flink SQL itself is
  * not committed, so semantics are pinned to the batch queries of
  * `snowflake_refresh.py` — stream result ≡ batch result is the contract,
  * enforced by the DuckDB oracle and the batch-equals-stream specs).
  *
  * Design: the transforms are the *same* DataFrame expressions as
  * [[graft.ops.EventQueries]] applied to an unbounded source — Catalyst
  * plans them incrementally (partial aggregates into the state store). At
  * scale the state is bounded per key-day; watermarking (see
  * [[windowedRevenue]]) evicts closed days.
  */
object StreamingQueries {
  /** Per-sfDir cache of the 2-row sentinel parquet FILE
    * [[runAppendFinalized]] plants as its second micro-batch: the file's
    * content depends only on the source dir (one template row + the ts
    * encoding its schema dictates), yet it was being rebuilt with a full
    * Spark write job on EVERY invocation — ~9 append-finalized bench
    * entries × two interleaved passes paid a fixed write-job tax each
    * (the r13 verdict's harness-amortization ask). The cached file lives
    * in a JVM-lifetime temp dir; each run COPIES it into the per-run
    * source dir, so per-run cleanup and replay semantics are unchanged
    * byte-for-byte. */
  private val sentinelCache =
    new scala.collection.concurrent.TrieMap[String, java.nio.file.Path]

  /** Measurement-only phase timer (env `GRAFT_STREAM_PHASES=1`): prints
    * per-entry harness-phase walls (setup / start / drain / stop) to
    * stderr so the streaming coordination floor can be attributed to a
    * phase instead of guessed at (guide §1 — measure first). Off by
    * default; zero cost on the normal path. */
  private val phaseLog = sys.env.get("GRAFT_STREAM_PHASES").contains("1")
  @inline private def phase[T](entry: String, name: String)(f: => T): T =
    if (!phaseLog) f
    else {
      val t0 = System.nanoTime()
      try f
      finally System.err.println(
        f"[sphase] $entry%-28s $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

  /** Runs `transform` over a file-streamed view of `<sfDir>/events.parquet`
    * and materializes the result (memory sink) as a batch frame. The file
    * source wants a directory, so the single parquet file is symlinked into
    * a fresh temp dir; the checkpoint dir is likewise per-call temp (WAL +
    * state parity with `reference:extractor.py:25-41`'s resumable cursor,
    * ST4).
    *
    * `trigger` (ST5): `None` = ASAP micro-batches drained by
    * `processAllAvailable` (the verify/test harness shape); pass
    * `Some(Trigger.AvailableNow())` for a bounded run or
    * `Some(Trigger.ProcessingTime("5 minutes"))` for the reference's
    * 5-minute freshness SLO (`reference:README.md:51`); the sink twin
    * [[graft.sink.Sinks.streamToWarehouse]] takes the same opt-in
    * parameter. */
  def runStream(spark: SparkSession, sfDir: String, name: String,
      mode: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      onDrained: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ())(
      transform: DataFrame => DataFrame): DataFrame =
    runTableStream(spark, sfDir, "events", name, mode, trigger, onDrained)(
      df => transform(graft.ingest.Sources.normalizeEvents(df)))

  /** [[runStream]] generalized to any driver table (the text-pipeline
    * streams run over `documents`); events callers get the nanos
    * normalization composed in by [[runStream]]. */
  /** `onDrained` runs after the stream fully drains and BEFORE stop() —
    * the hook the streaming PlanPin spec uses to capture the last
    * micro-batch's executed plan (gone once the query stops). */
  def runTableStream(spark: SparkSession, sfDir: String, table: String,
      name: String, mode: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      onDrained: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ())(
      transform: DataFrame => DataFrame): DataFrame = {
    // absolute target: a relative sfDir would be stored verbatim in the
    // symlink and resolve against the /tmp source dir — a dangling link
    val path = java.nio.file.Paths.get(s"$sfDir/$table.parquet")
      .toAbsolutePath
    graft.ingest.Sources.pinTimestampSemantics(spark)
    val srcDir = Files.createTempDirectory(s"graft-src-$name")
    Files.createSymbolicLink(srcDir.resolve(s"$table.parquet"), path)
    val schema = phase(name, "schema") {
      spark.read.parquet(path.toString).schema }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val ck = Files.createTempDirectory(s"graft-ck-$name").toString
    // stateful operators allocate one state store per shuffle partition per
    // side; at local scale the per-store fixed cost dominates — run the
    // micro-batches with a small state partition count (baked into the
    // fresh per-run checkpoint, so no cross-run conflict)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try phase(name, "start") {
        val writer = transform(stream).writeStream
          .outputMode(mode)
          .format("memory").queryName(name)
          .option("checkpointLocation", ck)
        trigger.fold(writer)(writer.trigger).start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try { phase(name, "drain")(q.processAllAvailable()); onDrained(q) }
    finally {
      // the memory sink holds the rows; the per-run source/checkpoint
      // dirs are dead — reap them (the q_minhash_incremental discipline).
      // stop() can rethrow a terminal stream error, so the deletes live
      // in their own finally and are individually best-effort.
      try phase(name, "stop")(q.stop()) finally {
        graft.Fs.deleteQuietly(srcDir)
        graft.Fs.deleteQuietly(ck)
      }
    }
    spark.table(name)
  }

  def runCompleteMode(spark: SparkSession, sfDir: String, name: String)(
      transform: DataFrame => DataFrame): DataFrame =
    runStream(spark, sfDir, name, "complete")(transform)

  /** [[runStream]] in APPEND mode with SENTINEL-FINALIZED output — the
    * production streaming configuration (watermark + append) made
    * deterministic over a bounded input: after the real events file is
    * fully processed, a single far-future sentinel row (year 2100,
    * `user_id = -1`) arrives as a LATER micro-batch, advancing the global
    * event-time watermark past every real session/window end, so append
    * mode emits every real group exactly once and the no-data flush batch
    * drains the state. The sentinel's own group is never finalized (the
    * watermark cannot pass its end) and stays withheld in state —
    * transforms additionally filter `user_id = -1` defensively.
    *
    * Two-phase by construction (processAllAvailable between files): if the
    * sentinel instead raced into the FIRST batch, the watermark would jump
    * to 2100 and every real row in later batches would be dropped as late
    * — ordering the phases is what makes the finalization sound. */
  def runAppendFinalized(spark: SparkSession, sfDir: String, name: String,
      onDrained: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ())(
      transform: DataFrame => DataFrame): DataFrame = {
    // absolute target: see runTableStream's symlink note
    val path = java.nio.file.Paths.get(s"$sfDir/events.parquet")
      .toAbsolutePath
    graft.ingest.Sources.pinTimestampSemantics(spark)
    val srcDir = Files.createTempDirectory(s"graft-src-$name")
    Files.createSymbolicLink(srcDir.resolve("events.parquet"), path)
    val raw = spark.read.parquet(path.toString)
    val stream = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val ck = Files.createTempDirectory(s"graft-ck-$name").toString
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q =
      try phase(name, "start") {
        transform(graft.ingest.Sources.normalizeEvents(stream)).writeStream
          .outputMode("append")
          .format("memory").queryName(name)
          .option("checkpointLocation", ck)
          .start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      phase(name, "drain1")(q.processAllAvailable())
      // 2100-01-01T00:00:00Z in the raw file's ns-long encoding. TWO
      // sentinel rows, one per funnel side ('view' then 'purchase' 10 days
      // later): transforms pre-filter on event_type, and a filtered-out
      // sentinel advances nothing — a stream-stream join derives one
      // watermark node per side and the query's global watermark is their
      // MIN, so BOTH sides need a surviving sentinel. The two are 10 days
      // apart (never interval-joinable) and single-typed, so neither can
      // match or merge with anything; their own groups/windows sit forever
      // above the watermark and are never emitted.
      val sentinelNs = 4102444800000000000L
      // the sentinel file is per-sfDir-constant: build it ONCE per JVM
      // (a Spark write job), then copy the cached bytes per run
      val cached = sentinelCache.getOrElseUpdate(path.toString, {
        val sentDir = Files.createTempDirectory(s"graft-sentcache")
        val base = raw.limit(1)
        // The sentinel file must carry `ts` in the SAME encoding as the
        // raw file it joins in the stream (the reader applies one fixed
        // schema): ns-long for the TIMESTAMP(NANOS) era, µs TimestampType
        // for the µs-parquet era — derive from the raw schema, not an
        // assumption.
        def sentinelTs(ns: Long): Column =
          raw.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType => lit(ns)
            case _ => expr(s"timestamp_micros(${ns / 1000L}L)")
          }
        base.withColumn("ts", sentinelTs(sentinelNs))
          .withColumn("user_id", lit(-1L))
          .withColumn("event_type", lit("view"))
          .unionByName(base
            .withColumn("ts",
              sentinelTs(sentinelNs + 864000L * 1000000000L))
            .withColumn("user_id", lit(-1L))
            .withColumn("event_type", lit("purchase")))
          .coalesce(1).write.mode("overwrite").parquet(s"$sentDir/out")
        val part = {
          import scala.jdk.CollectionConverters._
          val ls = Files.list(java.nio.file.Paths.get(s"$sentDir/out"))
          try ls.iterator().asScala
            .find(_.getFileName.toString.endsWith(".parquet")).get
          finally ls.close()
        }
        part
      })
      phase(name, "sentinel")(
        Files.copy(cached, srcDir.resolve("zz-sentinel.parquet")))
      phase(name, "drain2")(q.processAllAvailable())
      onDrained(q)
    } finally {
      try phase(name, "stop")(q.stop()) finally {
        graft.Fs.deleteQuietly(srcDir)
        graft.Fs.deleteQuietly(ck)
      }
    }
    spark.table(name)
  }

  /** Append-mode twin of [[graft.ops.WindowedQueries.sessionize]]: the
    * IDENTICAL `session_window` aggregation preceded by a watermark (append
    * mode requires one to know when a session can no longer grow) and
    * without the output sort (unsupported on append streams — callers sort
    * the materialized result). Run under [[runAppendFinalized]] it shares
    * `q_sessionization`'s DuckDB oracle verbatim: the hash gate proves the
    * PRODUCTION configuration (watermark + append finalization) emits
    * exactly the batch sessions.
    *
    * Deliberately NO in-stream sentinel filter: a `user_id != -1` predicate
    * here is on a grouping key, so Catalyst pushes it below the aggregation
    * AND below `EventTimeWatermark` into the parquet scan — the sentinel
    * row would be dropped before the watermark tracker ever sees it and
    * nothing would finalize (observed, not hypothetical). The sentinel
    * needs no filter anyway: its session end (2100 + gap) is forever above
    * the watermark, so append mode never emits it; [[runAppendFinalized]]
    * callers may still filter the MATERIALIZED output defensively. */
  def sessionizeAppend(events: DataFrame,
      gap: String = "30 minutes", delay: String = "0 seconds"): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("duration_us"))

  /** Streaming conversion funnel (ST3 twin of A6). */
  def funnelCounts(events: DataFrame): DataFrame =
    events.filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("event_count"))

  /** Streaming daily revenue as a 1-day tumbling event-time window
    * (ST3 twin of A4); project window start back to a date so the streaming
    * result is schema-identical to the batch query. */
  def dailyRevenueWindowed(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .groupBy(window(col("ts"), "1 day"))
      .agg(moneySum(col("value")).as("total_revenue"))
      .select(to_date(col("window.start")).as("event_date"),
        col("total_revenue"))

  /** Streaming half of the DAU twin (ST3 twin of A9): exact distinct isn't
    * supported on streams, so the stream performs the stateful first-seen
    * dedup of (day, type, user) and the count happens as a batch aggregate
    * over the materialized deduped stream (SURVEY §7.3's parity choice; the
    * at-scale alternative is approx_count_distinct with watermark-scoped
    * state). */
  def dedupDailyUsers(events: DataFrame): DataFrame =
    events.select(to_date(col("ts")).as("event_date"), col("event_type"),
        col("user_id"))
      .dropDuplicates("event_date", "event_type", "user_id")

  /** Watermark-bounded streaming dedup: first-seen (day, type, user) rows,
    * with dedup state EVICTED once the watermark passes `delay` beyond an
    * entry's event time — the production-shaped variant of
    * [[dedupDailyUsers]] (whose exact-parity state grows unboundedly). A
    * duplicate arriving after its original's state is evicted is re-emitted:
    * bounded state trades exactly-once dedup for eventual dedup, which the
    * overwrite-style reporting finisher tolerates. */
  def dedupDailyUsersBounded(events: DataFrame,
      delay: String = "2 days"): DataFrame =
    events.withWatermark("ts", delay)
      .select(col("ts"), to_date(col("ts")).as("event_date"),
        col("event_type"), col("user_id"))
      .dropDuplicatesWithinWatermark("event_date", "event_type", "user_id")
      .drop("ts")

  /** Batch finisher for [[dedupDailyUsers]]' materialized output. */
  def countDailyActiveUsers(deduped: DataFrame): DataFrame =
    deduped.groupBy("event_date", "event_type")
      .agg(count(lit(1)).as("daily_active_users"))
      .orderBy(col("event_date").desc, col("event_type"))

  /** Streaming exact dedup of a DOCUMENT stream: first-seen (lang, text)
    * rows via the stateful dropDuplicates store — the text-pipeline twin
    * of the event-side [[dedupDailyUsers]], proving the curation ops run
    * incrementally as documents arrive, not only in batch. Keyed by
    * (lang, text) so the keeper choice is deterministic regardless of
    * file/micro-batch arrival order (a global-keeper policy would depend
    * on which batch a duplicate lands in). At scale the state key should
    * be md5(text), not text — same first-seen semantics, 16-byte state. */
  def dedupDocs(docs: DataFrame): DataFrame =
    docs.select(col("lang"), col("text")).dropDuplicates("lang", "text")

  /** Batch finisher for [[dedupDocs]]: unique docs per language. Null
    * ordering pinned to NULLS LAST — Spark's ascending default is NULLS
    * FIRST while DuckDB's is NULLS LAST, so a null `lang` would otherwise
    * break the row-order hash match without changing the aggregate. */
  def countUniqueDocs(deduped: DataFrame): DataFrame =
    deduped.groupBy("lang").agg(count(lit(1)).as("n_unique"))
      .orderBy(col("lang").asc_nulls_last)

  /** Stream-static enrichment join — the canonical streaming dimension
    * lookup: streamed purchase events joined to the STATIC customer
    * dimension (user_id = c_custkey) and aggregated to revenue per market
    * segment. Stream-static joins are stateless on the stream side (no
    * watermark, no join state): Spark re-plans the static side each
    * micro-batch and, with the explicit broadcast, every batch is a
    * map-side hash join — the dimension table never shuffles the stream.
    * At scale the dimension snapshot is the usual slowly-changing copy;
    * re-planning per batch picks up file-level updates for free. */
  def segmentRevenue(events: DataFrame, customer: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("value"))
      .groupBy("segment")
      .agg(moneySum(col("value")).as("revenue"),
        count(lit(1)).as("n_purchases"))

  /** Stream-stream interval self-join (the hardest reference-relevant
    * streaming operator): views joined to same-user purchases arriving
    * within `windowMinutes` — the streaming twin of
    * [[graft.ops.AsOfJoin.viewToPurchaseWithin]]. Both sides carry
    * watermarks + the time-range condition, so Spark bounds each side's
    * state to the interval plus the watermark delay and evicts beyond it —
    * state stays proportional to the in-flight window at any stream length.
    * Inner joins emit eagerly on match (watermarks govern eviction only). */
  def streamAttributionPairs(events: DataFrame,
      windowMinutes: Int = 30, delay: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    views.join(purchases, expr(
      s"""v_user = p_user AND purchase_ts >= view_ts
         |AND purchase_ts <= view_ts + interval $windowMinutes minutes""".stripMargin))
  }

  /** Batch finisher: per-day pair counts over the materialized join. */
  def countAttributionPairs(pairs: DataFrame): DataFrame =
    pairs.groupBy(to_date(col("purchase_ts")).as("event_date"))
      .agg(count(lit(1)).as("attributed_pairs"))
      .orderBy("event_date")

  /** Watermarked stream-stream LEFT OUTER interval join — the streaming
    * negation query ([[streamAttributionPairs]] finds views that converted;
    * this finds views that did NOT): views left-joined to same-user
    * purchases within `windowMinutes`, keeping only the null-extended
    * (unmatched) rows. Outer-join semantics are what make this a genuinely
    * different operator: an unmatched view can only be emitted once the
    * watermark proves no matching purchase can still arrive (view_ts +
    * window + delay below the global watermark), so emission is
    * EVICTION-DRIVEN — the state bound is the same as the inner join's,
    * but correctness now depends on watermark finalization, which is why
    * the checked entry runs under [[runAppendFinalized]] (both sides need
    * a sentinel: the global watermark is the min across the two sides'
    * watermark nodes). A view matched by ≥1 purchase emits only matched
    * rows (filtered here); an abandoned view emits exactly one null row. */
  def streamAbandonedViews(events: DataFrame, windowMinutes: Int = 30,
      delay: String = "0 seconds"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    views.join(purchases, expr(
        s"""v_user = p_user AND purchase_ts >= view_ts
           |AND purchase_ts <= view_ts + interval $windowMinutes minutes"""
          .stripMargin), "left_outer")
      .filter(col("purchase_ts").isNull)
      .select(col("v_user").as("user_id"), col("view_ts"))
  }

  /** Batch finisher for [[streamAbandonedViews]]: per-day abandoned-view
    * counts over the materialized unmatched rows. */
  def countAbandonedViews(unmatched: DataFrame): DataFrame =
    unmatched.groupBy(to_date(col("view_ts")).as("event_date"))
      .agg(count(lit(1)).as("abandoned_views"))
      .orderBy("event_date")

  /** Projects the events table onto [[FunnelState.In]]'s columns. */
  def toConversionInput(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))

  /** Watermarked append-mode windowed revenue — the production-shaped
    * variant (ST6): 1-day tumbling windows finalized once the watermark
    * passes window end + delay; state for closed windows is evicted. Late
    * rows beyond `delay` are dropped — the declared divergence-by-necessity
    * (the reference commits no late-data policy). Exercised by the streaming
    * specs over MemoryStream. */
  def windowedRevenue(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.filter(col("event_type") === "purchase")
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 day"))
      .agg(moneySum(col("value")).as("total_revenue"))
      .select(to_date(col("window.start")).as("event_date"),
        col("total_revenue"))
}
