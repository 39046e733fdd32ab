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

  /** `shingle_hashes(text[, width])` — width must be a foldable int. */
  private[graft] def shingleHashesBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprs match {
      case Seq(text) => ShingleHashes(text, 3)
      case Seq(text, Literal(w: Int, _)) => ShingleHashes(text, w)
      case other => throw new IllegalArgumentException(
        s"shingle_hashes takes (text[, int literal width]), got ${other.length} args")
    }
  }

  /** `shingle_counts(text[, width])` — width must be a foldable int. */
  private[graft] def shingleCountsBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprs match {
      case Seq(text) => ShingleCounts(text, 3)
      case Seq(text, Literal(w: Int, _)) => ShingleCounts(text, w)
      case other => throw new IllegalArgumentException(
        s"shingle_counts takes (text[, int literal width]), got ${other.length} args")
    }
  }

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
