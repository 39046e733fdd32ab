package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.ext.{ShingleHashes, VecDotProduct}

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column API.
  *
  * Two paths: [[GraftFunctions.register]] installs into an existing
  * session's function registry; [[GraftExtensions]] is the
  * `spark.sql.extensions=graft.GraftExtensions` builder-time hook.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vec_dot",
      exprs => VecDotProduct(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("shingle_hashes",
      exprs => ShingleHashes(exprs.head, 3), "scala_udf")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotProduct].getName, "vec_dot"),
      exprs => VecDotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      exprs => ShingleHashes(exprs.head, 3)))
  }
}
