package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Similarity, TopK}
import graft.ingest.Sources

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("heap top-k per group equals the window formulation") {
    val df = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.8), (1L, 13L, 0.1),
      (2L, 20L, 0.5), (2L, 21L, 0.6),
      (3L, 30L, 0.3))
      .toDF("g", "id", "score")
    val viaHeap = TopK.topKPerGroup(df, "g", "score", "id", 2)
      .orderBy("g", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2)
      .select("g", "rank", "id", "score")
      .orderBy("g", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    assert(viaHeap == viaWindow)
    // tie at 0.8 broken by id: 11 before 12
    assert(viaHeap.contains((1L, 2L, 11L, 0.8)))
  }

  test("batchKnn per-query neighbors match single-query cosineTopK") {
    val emb = Sources.table(spark, sf("sf0.001"), "embeddings")
    // with one query, batchKnn's corpus (vec_id >= 1) equals cosineTopK's
    // corpus (vec_id != 0), so the neighbor lists must agree exactly
    val batch = Similarity.batchKnn(emb, numQueries = 1, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    val single = Similarity.cosineTopK(emb, queryVecId = 0L, k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(batch == single)
  }
}
