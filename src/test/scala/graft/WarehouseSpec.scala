package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.EventQueries
import graft.ext.Multimodal
import graft.ingest.Sources
import graft.sink.Sinks

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streamToWarehouse appends RAW and refreshes REPORTING per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PropEvent]
    val raw = Files.createTempDirectory("graft-raw").toString
    val rep = Files.createTempDirectory("graft-rep").toString
    val ck = Files.createTempDirectory("graft-whck").toString
    val q = Sinks.streamToWarehouse(mem.toDF(), raw, rep, ck,
      EventQueries.dailyRevenue)
    try {
      mem.addData(
        PropEvent(1, ts("2024-01-01 10:00:00"), 1, "purchase", 10.0, "{}"),
        PropEvent(2, ts("2024-01-01 11:00:00"), 2, "view", 1.0, "{}"))
      q.processAllAvailable()
      assert(spark.read.parquet(raw).count() == 2)
      val rev1 = spark.read.parquet(rep)
        .as[(java.sql.Date, Double)].collect().toMap
      assert(rev1(java.sql.Date.valueOf("2024-01-01")) == 10.0)
      // second batch: RAW appends, REPORTING reflects the full history
      mem.addData(
        PropEvent(3, ts("2024-01-02 09:00:00"), 1, "purchase", 5.5, "{}"))
      q.processAllAvailable()
      assert(spark.read.parquet(raw).count() == 3)
      val rev2 = spark.read.parquet(rep)
        .as[(java.sql.Date, Double)].collect().toMap
      assert(rev2 == Map(
        java.sql.Date.valueOf("2024-01-01") -> 10.0,
        java.sql.Date.valueOf("2024-01-02") -> 5.5))
    } finally q.stop()
  }

  test("upsertParquet replaces matching keys and appends new ones") {
    val path = Files.createTempDirectory("graft-upsert").toString + "/t"
    Sinks.upsertParquet(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path, Seq("k"))
    Sinks.upsertParquet(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), path, Seq("k"))
    val got = spark.read.parquet(path).as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // idempotent re-apply
    Sinks.upsertParquet(Seq((3L, "c")).toDF("k", "v"), path, Seq("k"))
    assert(spark.read.parquet(path).count() == 3)
  }

  test("approximate DAU stays within the configured error of exact") {
    val ev = Sources.events(spark, sf("sf0.01"))
    val approx = EventQueries.dailyActiveUsersApprox(ev)
      .as[(java.sql.Date, String, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    val exact = EventQueries.dailyActiveUsers(ev)
      .as[(java.sql.Date, String, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.1, s"$k approx=$a exact=$e")
    }
  }

  test("repartitionByBytes sizes partitions by payload volume") {
    val meta = Multimodal.mediaByteStats(
      Sources.table(spark, sf("sf0.001"), "documents"))
    val total = meta.agg(sum("n_bytes")).as[Long].head()
    val target = total / 7
    val parts = Multimodal.repartitionByBytes(meta, "doc_id", "n_bytes", target)
      .rdd.getNumPartitions
    assert(parts == 8 || parts == 7, s"got $parts partitions")
  }
}
