package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared expression helpers enforcing cross-engine (Spark vs DuckDB oracle)
  * deterministic numerics.
  *
  * Why: the driver hash-compares query output against a DuckDB oracle.
  * `sum(double)` is order-dependent and `round(double)` semantics differ
  * between engines (Spark re-reads the shortest decimal representation and
  * rounds HALF_UP; DuckDB rounds the binary value). Both are eliminated here:
  *   - money-like sums go through an exact DECIMAL(18,6) accumulator
  *     (associative, overflow-safe via Spark's sum-widening to (28,6));
  *   - double rounding uses floor(x*scale + 0.5)/scale, which is the same
  *     IEEE op sequence in both engines.
  */
object Exprs {
  /** Exact accumulator type for money-like sums. 6 fractional digits is
    * enough: inputs are 2dp prices times 2dp factors (max 4dp products). */
  val Money: DecimalType = DecimalType(18, 6)

  /** Exact, order-independent sum of a money-like double column, rounded to
    * 2dp and returned as double. Mirror in oracle SQL as
    * `CAST(round(sum(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)`. */
  def moneySum(c: Column): Column =
    round(sum(c.cast(Money)), 2).cast(DoubleType)

  /** Exact decimal sum without final rounding (for ratios computed later). */
  def exactSum(c: Column): Column = sum(c.cast(Money))

  /** Engine-agnostic half-up rounding of a double to `dp` decimals.
    * Mirror in oracle SQL as `floor(x * 1eDP + 0.5) / 1eDP`. */
  def round2(c: Column, dp: Int = 2): Column = {
    val s = math.pow(10, dp)
    floor(c * s + 0.5) / s
  }

  /** SQL fragment producing the same bits as [[moneySum]] in DuckDB. */
  def moneySumSql(x: String): String =
    s"CAST(round(sum(CAST($x AS DECIMAL(18,6))), 2) AS DOUBLE)"

  /** SQL fragment producing the same bits as [[round2]] in DuckDB. */
  def round2Sql(x: String, dp: Int = 2): String = {
    val s = "1" + ("0" * dp)
    s"floor(($x) * $s + 0.5) / $s"
  }
}
