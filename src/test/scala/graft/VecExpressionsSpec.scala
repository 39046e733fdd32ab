package graft

import org.apache.spark.sql.functions._

import graft.ext.VecExpressions

class VecExpressionsSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -0.5f), Array(2.0f, 2.0f)))
    .toDF("id", "a", "b")

  test("vecDot computes the double dot product") {
    val got = df.select($"id", VecExpressions.vecDot($"a", $"b"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 32.0)
    assert(got(2L) == 0.0)
  }

  test("vecDot is bit-identical to the interpreted HOF formulation") {
    val emb = ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = emb.select(
        (VecExpressions.vecDot(col("embedding"), col("embedding")) - hof)
          .as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff == 0L)
  }

  test("vecDot stays inside WholeStageCodegen") {
    // local relations constant-fold, so assert on a parquet-backed plan
    val emb = ingest.Sources.table(spark, sf("sf0.001"), "embeddings")
    val plan = emb.select(
        VecExpressions.vecDot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("vec_dot") && l.trim.startsWith("*(")),
      s"vec_dot not inside a codegen stage:\n$plan")
  }

  test("null array yields null, not a crash") {
    val withNull = Seq((1L, Array(1.0f), null.asInstanceOf[Array[Float]]))
      .toDF("id", "a", "b")
    val r = withNull.select(VecExpressions.vecDot($"a", $"b")).collect().head
    assert(r.isNullAt(0))
  }
}
