package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column ↔ catalyst Expression conversions `private[sql]`
  * (column-node decoupling). This bridge lives inside the `sql` package
  * namespace to expose exactly the two conversions custom expressions need
  * — the standard technique for third-party Catalyst extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Drain the listener bus (`private[spark]`) so tests can read metrics
    * accumulated by a SparkListener deterministically. */
  def waitForListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** BATCH `transformWithState` loads state stores outside any streaming
    * query, and store loading reports to the driver's StateStoreCoordinator
    * RPC endpoint — which is registered lazily by the session's
    * StreamingQueryManager (`private[sql]`), normally on first stream
    * start. Touch it so batch TWS works in sessions that never started a
    * stream (otherwise: CANNOT_LOAD_STATE_STORE / RpcEndpointNotFound). */
  def ensureStateStoreCoordinator(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.streams match {
      case m: org.apache.spark.sql.classic.StreamingQueryManager =>
        m.stateStoreCoordinator
      case _ => ()
    }
}
