package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.ext.{ShingleCounts, ShingleHashes, VecDotProduct}

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

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vec_dot", vecDotBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("shingle_hashes",
      shingleHashesBuilder, "scala_udf")
    registry.createOrReplaceTempFunction("shingle_counts",
      shingleCountsBuilder, "scala_udf")
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
  }
}
