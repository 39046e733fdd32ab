package graft

import org.apache.spark.sql.functions._

import graft.ops.Ordinals

class OrdinalsSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumbers equals the single-window row_number, any partitioning") {
    val ev = ingest.Sources.events(spark, sf("sf0.001"))
    val want = ev
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id"))
        .cast("long"))
      .select($"event_id", $"rn")
      .as[(Long, Long)].collect().sorted.toSeq
    // the distributed form must be invariant to the INPUT's partitioning
    // (range boundaries shift; offset + local must not)
    Seq(ev, ev.repartition(13), ev.repartition(1), ev.coalesce(2))
      .foreach { in =>
        val got = Ordinals
          .globalRowNumbers(in, Seq(col("ts"), col("event_id")))
          .select($"event_id", $"rn")
          .as[(Long, Long)].collect().sorted.toSeq
        assert(got == want)
      }
  }

  test("globalRowNumbers plans no unpartitioned window (no single-task sort)") {
    val ev = ingest.Sources.events(spark, sf("sf0.001"))
    val plan = Ordinals.globalRowNumbers(ev, Seq(col("ts"), col("event_id")))
      .queryExecution.optimizedPlan.toString
    // every Window in the plan must carry a partition spec: the row
    // numbering windows by _pid, the offset cumsum windows over the tiny
    // per-partition count frame (also keyed) — an unpartitioned window
    // over the INPUT would be the single-task shape this operator exists
    // to avoid. The offset frame's Window.orderBy(_pid) is unpartitioned
    // but bounded by the partition COUNT, so assert specifically that no
    // window consumes the raw event columns unpartitioned.
    val windows = plan.split("\n").filter(_.contains("windowspecdefinition"))
    val overEvents = windows.filter(l =>
      l.contains("ts#") && !l.contains("_pid"))
    assert(overEvents.isEmpty,
      s"unpartitioned window over the input:\n${overEvents.mkString("\n")}")
  }
}
