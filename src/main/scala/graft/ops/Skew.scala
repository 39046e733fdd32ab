package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) splits oversized sort-merge partitions at runtime; these helpers
  * cover the cases AQE doesn't: broadcast-averse shuffled hash joins against
  * a replicable side, and per-key exact-distinct state that a hot key would
  * otherwise concentrate on one task.
  */
object Skew {
  /** Salted equi-join for a skewed `big` side against a small-but-not-
    * broadcastable `right` side: the big side gets a deterministic salt from
    * `saltSource` (any roughly-unique column), the right side is replicated
    * once per salt bucket, and the join key becomes (key, salt) — a hot key
    * now spreads over `buckets` tasks. Result is identical to the unsalted
    * join. */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String,
      buckets: Int, saltSource: String): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(buckets.toLong)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew-resistant exact distinct count: dedup on (key, value) first —
    * that shuffle spreads a hot key across partitions by value — then a
    * plain count per key. Equivalent to `countDistinct(value)` grouped by
    * `key`, without concentrating a hot key's distinct-set on one task. */
  def distinctCountSpread(df: DataFrame, keyCols: Seq[String],
      valueCol: String, resultName: String): DataFrame =
    df.select((keyCols :+ valueCol).map(col): _*)
      .filter(col(valueCol).isNotNull) // countDistinct ignores NULLs; match it
      .distinct()
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(resultName))
}
