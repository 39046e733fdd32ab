package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.ext.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  // real multilingual snippets (the synthetic corpus shares one vocabulary,
  // so discriminative behavior is only testable on real text)
  lazy val multilingual: DataFrame = Seq(
    (0L, "the cat sat on the mat and it is a good day", "en"),
    (1L, "der hund ist nicht in der stadt und ich bin zu hause", "de"),
    (2L, "el perro corre por el parque y se esconde como un gato", "es"),
    (3L, "le chien est dans le jardin et je ne vois pas les fleurs", "fr"),
    (4L, "今天天气很好我们去公园散步", "zh"),
    (5L, "xyzzy plugh quux", "und"))
    .toDF("doc_id", "text", "lang")

  test("langId classifies real multilingual text correctly") {
    val got = multilingual
      .select($"lang", TextOps.langIdExpr(col("text")).as("pred"))
      .as[(String, String)].collect()
    got.foreach { case (want, pred) => assert(pred == want,
      s"expected $want got $pred") }
  }

  test("fingerprint is invariant to word order and repetition") {
    val df = Seq(
      (0L, "alpha beta gamma"),
      (1L, "gamma alpha beta alpha"),
      (2L, "alpha beta delta")).toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextOps.fingerprintExpr(col("text")))
      .as[(Long, String)].collect().toMap
    assert(fps(0L) == fps(1L))
    assert(fps(0L) != fps(2L))
  }

  test("fingerprintDedup groups permuted docs under min doc_id") {
    val df = Seq(
      (0L, "alpha beta gamma"),
      (1L, "gamma alpha beta alpha"),
      (2L, "alpha beta delta")).toDF("doc_id", "text")
    val got = TextOps.fingerprintDedup(df)
      .select("keeper_id", "n_docs").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 2L -> 1L))
  }

  test("qualityScores computes token counts and ratios") {
    val df = Seq((0L, "the the cat. sat!", 17L))
      .toDF("doc_id", "text", "n_chars")
    val r = TextOps.qualityScores(df).collect().head
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Double]("lexical_diversity") == 0.75)
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
    assert(r.getAs[Long]("n_sentence_marks") == 2L)
  }

  test("approxSubwordCount adds letter-digit transitions") {
    val df = Seq((0L, "abc1 def plain")).toDF("doc_id", "text")
    val n = df.select(TextOps.approxSubwordCount(col("text")))
      .as[Int].head()
    assert(n == 4) // 3 tokens + 1 transition in "abc1"
  }
}
