package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// temporary diagnostic; deleted before commit
object ProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1000).toDF("src").withColumn("dst", col("src") + 1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ck = df.repartition(2, col("src")).localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    println("CK-PART: " + ck.queryExecution.executedPlan.outputPartitioning)
    val other = spark.range(100).toDF("node")
    val j = ck.join(other.hint("shuffle_hash"), col("src") === col("node"))
      .groupBy("src").agg(count(lit(1)))
    j.collect()
    println("JOIN+AGG PLAN:\n" + j.queryExecution.executedPlan)
    spark.stop()
  }
}
