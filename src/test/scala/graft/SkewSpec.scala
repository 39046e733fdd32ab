package graft

import org.apache.spark.sql.functions._

import graft.ingest.Sources
import graft.ops.{EventQueries, Skew}

class SkewSpec extends SparkSpec {
  import spark.implicits._

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
