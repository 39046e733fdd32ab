package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.ext.{DeflateRatio, MinHashSig, QuantizeInt8, RemoveTokensAt,
  RewriteTokenCount, ShingleCounts, ShingleHashes, ShinglePosHashes,
  SimHash64, TokenCount, VecDotProduct, VecDotProductInt8}

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column API.
  *
  * Two paths: [[GraftFunctions.register]] installs into an existing
  * session's function registry; [[GraftExtensions]] is the
  * `spark.sql.extensions=graft.GraftExtensions` builder-time hook.
  */
object GraftFunctions {
  private[graft] def vecDotBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    require(exprs.length == 2, s"vec_dot takes 2 arguments, got ${exprs.length}")
    VecDotProduct(exprs(0), exprs(1))
  }

  // shared (text[, int-literal width]) builder for the shingle functions.
  // The builder runs before constant folding, so only a bare int Literal is
  // accepted as the width — `1+2` is rejected with the message below.
  private def widthBuilder(name: String,
      make: (org.apache.spark.sql.catalyst.expressions.Expression, Int) =>
        org.apache.spark.sql.catalyst.expressions.Expression)(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprs match {
      case Seq(text) => make(text, 3)
      case Seq(text, Literal(w: Int, _)) => make(text, w)
      case other => throw new IllegalArgumentException(
        s"$name takes (text[, bare int literal width]), " +
          s"got ${other.length} args: ${other.mkString(", ")}")
    }
  }

  /** `shingle_hashes(text[, width])`. */
  private[graft] val shingleHashesBuilder =
    widthBuilder("shingle_hashes", ShingleHashes.apply) _

  /** `shingle_counts(text[, width])`. */
  private[graft] val shingleCountsBuilder =
    widthBuilder("shingle_counts", ShingleCounts.apply) _

  /** `shingle_pos_hashes(text[, width])`. */
  private[graft] val shinglePosHashesBuilder =
    widthBuilder("shingle_pos_hashes", ShinglePosHashes.apply) _

  private[graft] def vecDotInt8Builder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    require(exprs.length == 2,
      s"vec_dot_int8 takes 2 arguments, got ${exprs.length}")
    VecDotProductInt8(exprs(0), exprs(1))
  }

  private[graft] def quantizeInt8Builder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    require(exprs.length == 1,
      s"quantize_int8 takes 1 argument, got ${exprs.length}")
    QuantizeInt8(exprs(0))
  }

  private[graft] def tokenCountBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    require(exprs.length == 1,
      s"token_count takes 1 argument, got ${exprs.length}")
    TokenCount(exprs(0))
  }

  private[graft] def simhash64Builder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    require(exprs.length == 1,
      s"simhash64 takes 1 argument, got ${exprs.length}")
    SimHash64(exprs(0))
  }

  /** `minhash_sig(text[, width, num_hashes])` — bare int literals only
    * (the widthBuilder discipline; builders run before constant folding). */
  private[graft] def minhashSigBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprs match {
      case Seq(text) => MinHashSig(text, 3, 32)
      case Seq(text, Literal(w: Int, _), Literal(n: Int, _)) =>
        MinHashSig(text, w, n)
      case other => throw new IllegalArgumentException(
        "minhash_sig takes (text[, bare int literal width, bare int " +
          s"literal num_hashes]), got ${other.length} args")
    }
  }

  private[graft] def removeTokensAtBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    require(exprs.length == 2,
      s"remove_tokens_at takes 2 arguments, got ${exprs.length}")
    RemoveTokensAt(exprs(0), exprs(1))
  }

  private[graft] def deflateRatioBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    require(exprs.length == 1,
      s"deflate_ratio takes 1 argument, got ${exprs.length}")
    DeflateRatio(exprs(0))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vec_dot", vecDotBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("shingle_hashes",
      shingleHashesBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("shingle_counts",
      shingleCountsBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("shingle_pos_hashes",
      shinglePosHashesBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("vec_dot_int8",
      vecDotInt8Builder, "scala_udf")
    registry.createOrReplaceTempFunction("quantize_int8",
      quantizeInt8Builder, "scala_udf")
    registry.createOrReplaceTempFunction("simhash64",
      simhash64Builder, "scala_udf")
    registry.createOrReplaceTempFunction("token_count",
      tokenCountBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("minhash_sig",
      minhashSigBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("remove_tokens_at",
      removeTokensAtBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("deflate_ratio",
      deflateRatioBuilder, "scala_udf")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotProduct].getName, "vec_dot"),
      GraftFunctions.vecDotBuilder))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      GraftFunctions.shingleHashesBuilder))
    e.injectFunction((FunctionIdentifier("shingle_counts"),
      new ExpressionInfo(classOf[ShingleCounts].getName, "shingle_counts"),
      GraftFunctions.shingleCountsBuilder))
    e.injectFunction((FunctionIdentifier("shingle_pos_hashes"),
      new ExpressionInfo(classOf[ShinglePosHashes].getName, "shingle_pos_hashes"),
      GraftFunctions.shinglePosHashesBuilder))
    e.injectFunction((FunctionIdentifier("vec_dot_int8"),
      new ExpressionInfo(classOf[VecDotProductInt8].getName, "vec_dot_int8"),
      GraftFunctions.vecDotInt8Builder))
    e.injectFunction((FunctionIdentifier("quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "quantize_int8"),
      GraftFunctions.quantizeInt8Builder))
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      GraftFunctions.simhash64Builder))
    e.injectFunction((FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
      GraftFunctions.tokenCountBuilder))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      GraftFunctions.minhashSigBuilder))
    e.injectFunction((FunctionIdentifier("remove_tokens_at"),
      new ExpressionInfo(classOf[RemoveTokensAt].getName, "remove_tokens_at"),
      GraftFunctions.removeTokensAtBuilder))
    e.injectFunction((FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      GraftFunctions.deflateRatioBuilder))
    // LangGuess / UnigramFamiliarity / Pq* are artifact-bearing (trained
    // lists ride the constructor) — they have no literal-only SQL form and
    // stay Column-API-only by design.
    // plan-wide rewrite: size(split(text, ' ')) → token_count(text); the
    // oracle gate runs with this extension enabled, so every hash-match
    // certifies the rewrite's semantics end-to-end
    e.injectOptimizerRule(_ => RewriteTokenCount)
  }
}
