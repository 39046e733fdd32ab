package graft

import org.apache.spark.sql.catalyst.expressions.Explode
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.functions._

import graft.ingest.Sources
import graft.ops.{EventQueries, RelationalQueries, Skew}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("revenueByNationSalted expands only the replicated customer side") {
    val d = sf("sf0.001")
    val df = RelationalQueries.revenueByNationSalted(
      Sources.table(spark, d, "lineitem"), Sources.table(spark, d, "orders"),
      Sources.table(spark, d, "customer"), Sources.table(spark, d, "nation"))
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.size == 1, s"expected exactly one Generate, got ${gens.size}")
    // buckets× replication: the exploded salt array carries 8 elements
    // (ConstantFolding may have collapsed the literal CreateArray)
    gens.head.generator match {
      case Explode(e) if e.foldable =>
        val arr = e.eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        assert(arr.numElements() == 8, s"salt fan-out: ${arr.numElements()}")
      case other => fail(s"unexpected generator shape: $other")
    }
    // ...and the Expand sits over the small customer side ONLY — salting
    // that fanned out the fact tables would multiply the big shuffle 8×
    val leafCols =
      gens.head.child.collectLeaves().flatMap(_.output.map(_.name))
    assert(leafCols.contains("c_custkey"), s"not over customer: $leafCols")
    assert(!leafCols.exists(n => n.startsWith("l_") || n.startsWith("o_")),
      s"fact-table columns under the Generate: $leafCols")
  }

  test("saltedJoin equals the unsalted join") {
    val li = Sources.table(spark, sf("sf0.001"), "lineitem")
    val part = Sources.table(spark, sf("sf0.001"), "part")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
      .agg(sum("p_retailprice"), count(lit(1))).as[(Double, Long)].head()
    val salted = Skew.saltedJoin(li, part, "l_partkey",
        buckets = 8, saltSource = "l_orderkey")
      .agg(sum("p_retailprice"), count(lit(1))).as[(Double, Long)].head()
    assert(salted._2 == plain._2)
    assert(math.abs(salted._1 - plain._1) < 1e-6)
  }

  test("distinctCountSpread equals countDistinct") {
    val ev = Sources.events(spark, sf("sf0.001"))
      .withColumn("event_date", to_date(col("ts")))
    val viaSpread = Skew.distinctCountSpread(ev,
        Seq("event_date", "event_type"), "user_id", "daily_active_users")
      .orderBy(col("event_date").desc, col("event_type"))
      .as[(java.sql.Date, String, Long)].collect().toSeq
    val viaDistinct = EventQueries.dailyActiveUsers(
        Sources.events(spark, sf("sf0.001")))
      .as[(java.sql.Date, String, Long)].collect().toSeq
    assert(viaSpread == viaDistinct)
  }
}
