package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.ops.Profile

class ProfileSpec extends SparkSpec {

  test("columnProfile: counts, nulls, exact distinct, length stats") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("txt", StringType)))
    val rows = Seq(
      Row(1L, "aa"),
      Row(2L, "aa"),
      Row(3L, null),
      Row(null, "bbbb"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val prof = Profile.columnProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap

    val id = prof("id")
    assert(id.getLong(1) == 4L, "n_rows")
    assert(id.getLong(2) == 1L, "id nulls")
    assert(id.getLong(3) == 3L, "id distinct")
    assert(id.getInt(4) == 1 && id.getInt(5) == 1, "id lengths")
    assert(id.getDouble(6) == 1.0, "id avg_len")

    val txt = prof("txt")
    assert(txt.getLong(2) == 1L, "txt nulls")
    assert(txt.getLong(3) == 2L, "txt distinct (aa, bbbb)")
    assert(txt.getInt(4) == 2 && txt.getInt(5) == 4, "txt lengths")
    // (2 + 2 + 4) / 3 = 2.67 after round2
    assert(txt.getDouble(6) == 2.67, "txt avg_len")
  }

  test("columnProfile: an all-null column profiles as null lengths, 0 distinct") {
    val schema = StructType(Seq(StructField("x", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(null), Row(null)), 1), schema)
    val r = Profile.columnProfile(df).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }

  test("approx profile: no Expand, estimates within HLL error of exact") {
    val docs = ingest.Sources.table(spark, sf("sf0.01"), "documents")
    val approx = Profile.columnProfileApprox(docs)
    // scale-path plan shape: NO Expand (exact's multi-DISTINCT needs one)
    val planA = approx.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!planA.contains("Expand"), "approx profile must not Expand")
    assert(Profile.columnProfile(docs).queryExecution.executedPlan
      .toString.contains("Expand"), "exact profile plans the Expand")
    val exact = Profile.columnProfile(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val est = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    exact.foreach { case (c, nd) =>
      val e = est(c)
      assert(math.abs(e - nd) <= math.max(2.0, 0.05 * nd),
        s"$c: approx $e vs exact $nd")
    }
    // every non-distinct stat is identical (same exact aggregates)
    val exRest = Profile.columnProfile(docs).drop("n_distinct").collect()
    val apRest = approx.drop("n_distinct").collect()
    assert(exRest.toSeq == apRest.toSeq)
  }

  test("q_profile_docs runs on the real table with one scan") {
    val docs = ingest.Sources.table(spark, sf("sf0.001"), "documents")
    val out = Profile.columnProfile(docs)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Profile.DocumentCols.sorted, "one row per column, ordered")
    val docIdRow = rows.find(_.getString(0) == "doc_id").get
    assert(docIdRow.getLong(1) == docIdRow.getLong(3),
      "doc_id must be unique (distinct == rows)")
    // exactly one Scan in the physical plan: profiling is one pass
    // (AQE's toString appends the Initial Plan — count the final only)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected ONE scan, got $scans:\n$plan")
  }
}
