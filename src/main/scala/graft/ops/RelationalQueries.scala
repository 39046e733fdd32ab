package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Exprs._

/** Join/aggregation coverage beyond the reference's single anti-join
  * (SURVEY.md §2.3 notes the engine "gets joins for free from Spark"; this
  * module exercises them on the driver's TPC-H-ish star schema so the
  * capability is demonstrated and benchmarked, not just claimed).
  *
  * Scale stance per query:
  *  - dimension tables (`part`, `nation`, `customer` at small SF; `nation`/
  *    `region` at any SF) are broadcast — no shuffle of the fact table;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key once and
  *    reuse that partitioning for the following aggregation where possible;
  *  - revenue sums ride exact decimal accumulation (order-independent).
  */
object RelationalQueries {
  private def revenue = (col("l_extendedprice") * (lit(1) - col("l_discount")))

  /** TPC-H Q1-style pricing summary over lineitem: one wide hash aggregate,
    * no joins, map-side partials; the canonical scan+agg throughput probe. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(revenue).as("sum_disc_price"),
        round2(exactSum(col("l_quantity")).cast("double") / count(lit(1)))
          .as("avg_qty"),
        round2(exactSum(col("l_extendedprice")).cast("double") / count(lit(1)))
          .as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Top-10 brands by discounted revenue — the reference's
    * `TOP_SELLING_BRANDS` (`snowflake_refresh.py:17-28`) upgraded with a
    * dimension join. `part` is broadcast: lineitem never shuffles; the
    * top-k plans as TakeOrderedAndProject. */
  def topBrandRevenue(lineitem: DataFrame, part: DataFrame, k: Int = 10): DataFrame =
    lineitem.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(moneySum(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("p_brand"))
      .limit(k)

  /** Revenue by customer nation: a 3-table chain
    * (nation ⋈ customer ⋈ orders ⋈ lineitem). nation+customer are
    * broadcast-joined onto orders; only orders ⋈ lineitem shuffles. */
  def revenueByNation(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(moneySum(revenue).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** [[revenueByNation]] with the orders ⋈ customer step routed through
    * [[Skew.saltedJoin]] (buckets=8, salt from o_orderkey): the hot-key
    * mitigation for when a handful of customers carry a disproportionate
    * share of orders and the right side is small-but-not-broadcastable.
    * Result is IDENTICAL to the unsalted query — it shares
    * `q_revenue_by_nation`'s DuckDB oracle verbatim, so the hash gate is
    * the salted ≡ unsalted equivalence proof on real data. The Expand
    * (explode of the salt array) sits on the replicated CUSTOMER side
    * only — asserted in SkewSpec; salting that fans out the big side
    * instead would multiply the fact-table shuffle by `buckets`. */
  def revenueByNationSalted(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame, buckets: Int = 8): DataFrame = {
    val cust = customer.select(col("c_custkey").as("o_custkey"),
      col("c_nationkey"))
    val salted = Skew.saltedJoin(
      orders.select(col("o_orderkey"), col("o_custkey")), cust,
      "o_custkey", buckets, saltSource = "o_orderkey")
    lineitem
      .join(salted, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(moneySum(revenue).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q3-style top unshipped-order revenue for one market segment:
    * selective dimension filter broadcast against the fact chain, global
    * top-k.
    *
    * Join order matters at scale: the segment filter keeps ~1/5 of
    * customers, so broadcast-joining it onto `orders` FIRST discards ~4/5
    * of orders before the only real shuffle (orders ⋈ lineitem). Filtering
    * after that join would shuffle the whole fact table for rows that are
    * then thrown away — at 100 TB that ordering is the difference between
    * shuffling the fact table and a fifth of it. */
  def topOrders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      segment: String = "BUILDING", k: Int = 10): DataFrame = {
    val segmentOrders = orders
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)
          .select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))
    lineitem
      .select(col("l_orderkey"), revenue.as("rev"))
      .join(segmentOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
      .agg(moneySum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(k)
  }

  /** TPC-H Q4-style order-priority count via EXISTS (left semi join):
    * orders with at least one line shipped after the order date. */
  def orderPriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    orders.join(
        lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
}
