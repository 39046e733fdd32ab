package graft

import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.ColumnBridge

/** Guards the repo's ONLY private-API surface (see ColumnBridge's scaladoc
  * for the exact internals it touches): the version pin must match the
  * running Spark, and the two Column ↔ Expression conversions must
  * round-trip — so a Spark upgrade fails here with a pointed message, not
  * as a MethodNotFound deep inside a query. */
class ColumnBridgeSpec extends SparkSpec {
  test("bridge is pinned to the running Spark line") {
    assert(org.apache.spark.SPARK_VERSION.startsWith(
      ColumnBridge.PinnedSparkLine))
    ColumnBridge.assertPinnedSparkVersion() // must not throw
  }

  test("column ↔ expression conversions round-trip") {
    val c = lit(42)
    val e = ColumnBridge.expression(c)
    val back = ColumnBridge.column(e)
    assert(ColumnBridge.expression(back).semanticEquals(e))
    // and the coordinator bootstrap + listener drain are callable
    ColumnBridge.ensureStateStoreCoordinator(spark)
    ColumnBridge.waitForListeners(spark.sparkContext)
  }
}
