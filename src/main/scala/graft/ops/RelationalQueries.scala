package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  // Query constants shared with the generated oracle mirrors (the
  // shared-constant discipline: a default can never silently desync from
  // its mirror because both render from one definition)
  val TopSupplierFrom = "1996-01-01"
  val TopSupplierUntil = "1996-04-01"
  val ReturnedFrom = "1996-01-01"
  val ReturnedUntil = "1996-04-01"
  val LargeOrderQty = 300
  val WaitingLateDays = 365
  val IdleRichSince = "2000-01-01"
  val MarketShareRegion = "ASIA"
  val MarketShareNation = "NATION_2"
  val RegionalRegion = "EUROPE"
  val RegionalFrom = "1996-01-01"
  val RegionalUntil = "1997-01-01"
  val DeltaFrom = "1996-01-01"
  val DeltaUntil = "1997-01-01"
  val DeltaDiscLo = 0.03
  val DeltaDiscHi = 0.05
  val DeltaQtyMax = 24
  val Scd2From = "1995-01-01"
  val Scd2Split = "1998-07-01"
  val Scd2To = "2002-01-01"
  val Scd2V1Factor = 0.9

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

  /** Small-quantity revenue per brand (the TPC-H Q17 shape): line items
    * whose quantity sits below 20% of their part's average quantity —
    * the correlated scalar subquery DECORRELATED into an aggregate +
    * self-join, the standard rewrite at scale (a correlated probe per
    * row would re-scan lineitem per part).
    *
    * The per-part threshold frame is one row per partkey — UNBOUNDED, so
    * it joins back via shuffle hash with both sides exchanging on
    * `l_partkey` once (key-aligned co-partitioning; the two subtrees
    * project different columns, so they are separate exchanges, not a
    * ReusedExchange), never a broadcast. `part` has no hint: it is a
    * dimension whose size scales with SF, so AQE decides broadcast vs
    * shuffle at runtime from the actual build size. Exactness: quantities
    * are whole numbers, so their double sums are order-independent
    * integers and avg/threshold/predicate are identical bits in both
    * engines. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val thr = lineitem.groupBy("l_partkey")
      .agg((lit(0.2) * avg(col("l_quantity"))).as("thr"))
    lineitem.join(thr.hint("shuffle_hash"), "l_partkey")
      .filter(col("l_quantity") < col("thr"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        moneySum(revenue).as("small_revenue"))
      .orderBy("p_brand")
  }

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

  /** TPC-H Q10-style returned-item reporting: top customers by revenue of
    * lines they returned (`l_returnflag = 'R'`) in one order quarter.
    *
    * The order-date window filters `orders` BEFORE the fact-fact join (a
    * quarter of a multi-year history — the pushed predicate shrinks the
    * shuffle ~25×); the returnflag filter reaches the lineitem scan the
    * same way. `customer` joins the already-aggregable stream unhinted
    * (SF-scaled; AQE decides), `nation` is a true broadcast, and the
    * top-k plans as TakeOrderedAndProject — no global sort at any SF. */
  def returnedItems(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame, k: Int = 20): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revenue.as("rev"))
      .join(orders
          .filter(col("o_orderdate") >= lit(ReturnedFrom).cast("date") &&
            col("o_orderdate") < lit(ReturnedUntil).cast("date"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name"),
          col("c_acctbal"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(moneySum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** TPC-H Q12-style shipping-latency priority split: per order-to-ship
    * latency bucket, how many lines belong to critical-priority orders vs
    * the rest. (The reference schema has no ship mode / commit / receipt
    * dates, so the Q12 "late shipment" axis is re-based on the
    * days-from-order-to-ship latency — same conditional-count shape.)
    *
    * One fact-fact shuffle, then a 3-row aggregate; both conditional
    * counts ride the same pass (no second scan). Day arithmetic is on
    * CAST-to-date values in both engines — integer day diffs, no
    * timezone/fraction ambiguity. */
  def shipLatencyPriority(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val lat = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("latency_bucket",
        when(lat <= 30, "0-30").when(lat <= 90, "31-90").otherwise("90+"))
      .groupBy("latency_bucket")
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!critical, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("latency_bucket")
  }

  /** TPC-H Q18-style large-volume customers: orders whose total quantity
    * exceeds [[LargeOrderQty]], with their customer and order facts.
    *
    * The HAVING pre-aggregates lineitem on `l_orderkey` — the same key the
    * subsequent join uses, so the one shuffle is reused; the surviving
    * big-order set is tiny (p99.9 of order quantity sits near the
    * threshold by construction) and AQE broadcasts it against `orders`.
    * The quantity threshold compares EXACT decimal (never the rounded
    * display double), so boundary orders classify identically in both
    * engines; the displayed `sum_qty` rounds after. */
  def largeOrders(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, k: Int = 100): DataFrame =
    lineitem.groupBy("l_orderkey")
      .agg(exactSum(col("l_quantity")).as("q"))
      .filter(col("q") > LargeOrderQty)
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"),
        round2(col("q").cast("double")).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)

  /** TPC-H Q21-style suppliers who kept orders waiting: for finished
    * orders with lines from MULTIPLE suppliers where exactly ONE supplier
    * shipped late (> [[WaitingLateDays]] days after the order date), count
    * each late line against that supplier. (Lateness is re-based on
    * order-to-ship latency — the schema has no commit/receipt dates.)
    *
    * Spark-first decomposition: Q21's correlated EXISTS / NOT-EXISTS pair
    * would plan as TWO lineitem self-joins; instead ONE extra aggregate
    * over the already-joined stream computes per-order `(distinct
    * suppliers, distinct LATE suppliers)` and the predicate becomes
    * `nsupp > 1 AND nlate = 1` on a join back to the late lines — the
    * fact table shuffles on `l_orderkey` for the stats pass and the
    * join reuses that key. The DuckDB mirror states the original
    * correlated-subquery form, so the hash gate certifies the
    * aggregation decomposition ≡ EXISTS semantics row-for-row
    * (including the same-supplier-twice-late edge, which `countDistinct`
    * handles exactly as `l2.l_suppkey <> l1.l_suppkey` does). */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, k: Int = 100): DataFrame = {
    val enriched = lineitem.select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"))
      .join(orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          > WaitingLateDays)
    val stats = enriched.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("nsupp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("nlate"))
    enriched.filter(col("late"))
      .join(stats.filter(col("nsupp") > 1 && col("nlate") === 1),
        Seq("l_orderkey"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(k)
  }

  /** TPC-H Q15-style top supplier: per-supplier revenue over a shipdate
    * quarter, keep the supplier(s) achieving the global max.
    *
    * The aggregate is consumed twice (once for the max scalar, once for
    * the filter), so it is eagerly materialized with `localCheckpoint` —
    * suppliers-sized, vs scanning the fact table twice if the subtree were
    * recomputed. The max is a 1-row broadcast-scalar crossJoin; equality
    * on the rounded revenue double is exact (identical decimal inputs →
    * identical bits in both engines). The final supplier join is unhinted:
    * the filtered side is tie-bounded but `supplier` scales with SF, so
    * AQE picks broadcast vs shuffle from runtime sizes. */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame,
      from: String = TopSupplierFrom,
      until: String = TopSupplierUntil): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("date") &&
        col("l_shipdate") < lit(until).cast("date"))
      .groupBy("l_suppkey")
      .agg(moneySum(revenue).as("total_revenue"))
      .localCheckpoint()
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q13-style order-count distribution: how many customers placed
    * exactly N orders, zero included.
    *
    * Orders are pre-aggregated to (custkey, n) BEFORE touching customer —
    * the map-side-partial-then-join discipline — so the join input is
    * customers-sized on both sides, and the LEFT join + `coalesce(n, 0)`
    * preserves order-less customers (the COUNT(o_orderkey)-over-LEFT-JOIN
    * semantics, without shuffling the orders fact through a per-customer
    * group-by of the joined rows). The final histogram re-agg is
    * distinct-counts-sized. */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q16-style supplier variety: distinct suppliers per
    * (brand, size), excluding suppliers in deficit (`s_acctbal < 0`) — the
    * NOT-IN-complaint-suppliers shape as a left anti join.
    *
    * The fact table is first projected to DISTINCT (partkey, suppkey)
    * pairs — the only columns the query needs — so everything downstream
    * of the one fact-sized shuffle is pairs-sized. The anti-join side and
    * `part` are unhinted (both scale with SF; AQE decides). Single-column
    * count distinct plans as a two-phase aggregate, no Expand. */
  def supplierVariety(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame): DataFrame =
    lineitem.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))

  /** TPC-H Q22-style idle rich customers: customers whose balance exceeds
    * the average positive balance yet placed no orders, rolled up by
    * market segment.
    *
    * The global threshold is computed as exact decimal (sum, count) and
    * applied CROSS-MULTIPLIED — `bal * n > s` — so the predicate never
    * divides: both engines evaluate exact decimal arithmetic and the
    * boolean matches bit-free. (D(12,2) accumulators: acctbal is 2dp
    * money, and D(18,6) products would overflow DuckDB's multiply — the
    * profiling-round rule.) The 1-row stats frame is a broadcast-scalar
    * crossJoin; the idleness test is a left anti join on the
    * custkey-distinct projection of RECENT orders (no order since the
    * cutoff — the synthetic history gives every customer SOME order, so a
    * no-orders-ever predicate would be vacuously empty at every gated SF
    * and the hash gate would only ever certify empty==empty). */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame,
      since: String = IdleRichSince): DataFrame = {
    val bal = col("c_acctbal").cast(DecimalType(12, 2))
    val stats = customer.filter(col("c_acctbal") > 0)
      .agg(sum(bal).as("s"), count(lit(1)).as("n"))
    customer.crossJoin(broadcast(stats))
      .filter(bal * col("n") > col("s"))
      .join(orders.filter(col("o_orderdate") >= lit(since).cast("date"))
          .select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q7-flavoured local-supply share: per customer nation, the
    * fraction of revenue supplied from within that same nation.
    *
    * One fact-fact shuffle (lineitem ⋈ orders); the customer and supplier
    * key→nation maps are unhinted SF-scaled sides (AQE decides), `nation`
    * is a true broadcast. Local and total revenue ride one aggregate pass
    * (conditional decimal sums); the share is a single double division of
    * two exact-decimal-derived doubles — identical inputs, identical IEEE
    * result in both engines — rounded engine-agnostically to 4dp. */
  def localSupplyShare(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select(col("s_suppkey"),
          col("s_nationkey").as("supp_nation")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        coalesce(moneySum(when(col("supp_nation") === col("c_nationkey"),
          col("rev"))), lit(0.0)).as("local_revenue"),
        moneySum(col("rev")).as("total_revenue"))
      .withColumn("local_share",
        round2(col("local_revenue") / col("total_revenue"), 4))
      .orderBy("n_name")

  /** TPC-H Q14-style promo revenue share: per ship month, the fraction of
    * discounted revenue earned by promotional parts.
    *
    * One aggregate pass carries both conditional decimal sums; `part` is
    * unhinted (SF-scaled; AQE decides build side). Month keys are
    * `year()`/`month()` ints — calendar functions agree across engines,
    * unlike formatted timestamp renderings. The share divides two
    * exact-decimal-derived doubles (identical bits both engines), rounded
    * engine-agnostically to 4dp. */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part.select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mo"))
      .agg(
        coalesce(moneySum(when(col("p_type") === "PROMO", revenue)), lit(0.0))
          .as("promo_revenue"),
        moneySum(revenue).as("total_revenue"))
      .withColumn("promo_share",
        round2(col("promo_revenue") / col("total_revenue"), 4))
      .orderBy("yr", "mo")

  /** TPC-H Q8-style market share: within one customer region, the yearly
    * revenue share supplied by one nation.
    *
    * `nation` and `region` are true broadcasts (≤25 / 5 rows at any SF);
    * the region predicate filters customers BEFORE the fact join, so
    * non-region orders never shuffle. The supplier side joins its own
    * broadcast copy of nation (aliased — the two nation roles are distinct
    * join keys). Share numerics follow the Q7/Q14 discipline. */
  def marketShare(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, targetRegion: String = MarketShareRegion,
      suppNation: String = MarketShareNation): DataFrame = {
    val regionCust = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === targetRegion)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNations = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    lineitem.select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(regionCust, col("o_custkey") === col("c_custkey"))
      .join(suppNations, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(
        coalesce(moneySum(when(col("supp_nation") === suppNation, col("rev"))),
          lit(0.0)).as("nation_revenue"),
        moneySum(col("rev")).as("total_revenue"))
      .withColumn("mkt_share",
        round2(col("nation_revenue") / col("total_revenue"), 4))
      .orderBy("yr")
  }

  /** TPC-H Q9-style profit by supplier nation and order year. The cost
    * model uses `p_retailprice * l_quantity` (the schema carries no
    * partsupp/supplycost), so profit = discounted revenue − retail cost —
    * the same join/aggregate shape as Q9 with an available cost basis.
    *
    * The profit expression is cast to exact decimal PER ROW before the sum
    * (2dp retail × whole-number qty and 4dp revenue both fit in 6 fractional
    * digits), keeping the aggregate order-independent. One fact-fact
    * shuffle; part/supplier key-maps unhinted (AQE); nation broadcast. */
  def profitByNationYear(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, part: DataFrame, nation: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(part.select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("supp_nation"),
        year(col("o_orderdate")).as("yr"))
      .agg(moneySum(revenue - col("p_retailprice") * col("l_quantity"))
        .as("sum_profit"))
      .orderBy("supp_nation", "yr")

  /** TPC-H Q5-style local-supplier revenue per nation within one region
    * and order year: the classic 6-table star-chain with the LOCAL
    * constraint (`s_nationkey = c_nationkey`) riding the supplier join
    * condition. The region membership reduces nation to a ≤25-row
    * broadcast filter applied to customers BEFORE the fact join (non-
    * region orders never shuffle); the date window prunes orders at the
    * scan. The supplier join carries BOTH the key equality and the
    * nation equality, so Catalyst hashes on (suppkey) with the local
    * predicate as a join filter — one fact-fact shuffle total, the Q7/Q8
    * dimension discipline on a new shape (Q7 groups by nation PAIR; Q5
    * keeps only the local diagonal). */
  def regionalRevenue(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, targetRegion: String = RegionalRegion,
      from: String = RegionalFrom, until: String = RegionalUntil): DataFrame = {
    val regionNations = nation
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .join(broadcast(region.filter(col("r_name") === targetRegion)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(regionNations),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    lineitem.select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
      .join(orders
        .filter(col("o_orderdate") >= lit(from).cast("date") &&
          col("o_orderdate") < lit(until).cast("date"))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(moneySum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6-style forecast-revenue-change probe: the no-join,
    * fully-pushed-down quantified aggregate — how much revenue a
    * discount-band elimination would have added. All three predicates
    * (date window, discount band, quantity cap) reach the parquet scan
    * (`PushedFilters`), the projection prunes to three columns, and the
    * answer is one exact-decimal row. The canonical scan-selectivity
    * probe next to Q1's full-scan throughput probe. Discount values are
    * stored doubles compared verbatim — no derived arithmetic in the
    * predicate, so both engines select identical rows. */
  def revenueDelta(lineitem: DataFrame, from: String = DeltaFrom,
      until: String = DeltaUntil, discLo: Double = DeltaDiscLo,
      discHi: Double = DeltaDiscHi, qtyMax: Int = DeltaQtyMax): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("date") &&
        col("l_shipdate") < lit(until).cast("date") &&
        col("l_discount") >= discLo && col("l_discount") <= discHi &&
        col("l_quantity") < qtyMax)
      .agg(moneySum(col("l_extendedprice") * col("l_discount"))
        .as("forecast_delta"),
        count(lit(1)).as("n_items"))

  /** Deterministic two-version price history for [[scd2Revenue]] — the
    * SCD-type-2 dimension shape (one row per (key, validity window))
    * derived from `part` so both engines construct the identical dim:
    * v1 at 90% of retail through mid-1998, v2 at retail after. The 0.9
    * multiply is a per-row IEEE double op — identical bits both engines. */
  def partPriceHistory(part: DataFrame): DataFrame =
    part.select(col("p_partkey"), explode(array(
      struct(lit("v1").as("version"),
        (col("p_retailprice") * Scd2V1Factor).as("price"),
        lit(Scd2From).cast("date").as("valid_from"),
        lit(Scd2Split).cast("date").as("valid_to")),
      struct(lit("v2").as("version"),
        col("p_retailprice").as("price"),
        lit(Scd2Split).cast("date").as("valid_from"),
        lit(Scd2To).cast("date").as("valid_to")))).as("v"))
      .select(col("p_partkey"), col("v.version"), col("v.price"),
        col("v.valid_from"), col("v.valid_to"))

  /** SCD-type-2 as-of dimension join: enrich each line item with the
    * dimension version VALID AT its ship date, then roll revenue at the
    * historical price up by (version, year).
    *
    * The temporal lookup is an EQUI-join on the dimension key with the
    * validity window as a post-join range filter — the plan Spark picks
    * (SMJ or broadcast via AQE) keys on `p_partkey` alone, and the range
    * predicate prunes the per-key fan-out, which is bounded by the
    * VERSION COUNT per key (small by SCD construction), never by the
    * fact table. A genuine interval join (range-keyed, no equi key)
    * would need binning; the SCD shape never does. Dates compare as
    * DATE on both sides (`to_date` the fact timestamp) — timestamp↔date
    * promotion is the kind of implicit cast two engines disagree on. */
  def scd2Revenue(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.select(col("l_partkey"), col("l_quantity"),
        to_date(col("l_shipdate")).as("ship_day"))
      .join(partPriceHistory(part),
        col("l_partkey") === col("p_partkey") &&
          col("ship_day") >= col("valid_from") &&
          col("ship_day") < col("valid_to"))
      .groupBy(col("version"), year(col("ship_day")).as("yr"))
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("price") * col("l_quantity")).as("hist_revenue"))
      .orderBy("version", "yr")

  /** One branch of the Q19-style disjunctive predicate: a brand with its
    * admissible size and quantity windows. Shared constants — the Spark
    * predicate AND the oracle SQL are both generated from [[DisjunctWindows]]
    * so the two engines can never drift. */
  final case class BrandWindow(brand: String, sizeMax: Int,
      qtyMin: Int, qtyMax: Int)

  val DisjunctWindows: Seq[BrandWindow] = Seq(
    BrandWindow("Brand#12", 15, 1, 20),
    BrandWindow("Brand#23", 25, 10, 30),
    BrandWindow("Brand#13", 35, 20, 40))

  /** The OR-of-ANDs rendered for the DuckDB mirror. */
  def disjunctSql: String = DisjunctWindows.map(w =>
    s"(p_brand = '${w.brand}' AND p_size BETWEEN 1 AND ${w.sizeMax}" +
      s" AND l_quantity BETWEEN ${w.qtyMin} AND ${w.qtyMax})")
    .mkString("\n   OR ")

  /** TPC-H Q19-style disjunctive-predicate revenue: revenue per brand over
    * an OR of per-brand (size, quantity) windows.
    *
    * An OR spanning both join sides cannot push down as-is, so the IMPLIED
    * single-side predicates are derived and applied before the join — the
    * quantity envelope on lineitem and the brand-IN + size envelope on part
    * (lossless: every disjunct implies them). `.explain` shows both reach
    * the parquet scans as PushedFilters; the exact OR then runs on the
    * joined (already heavily pruned) rows. The mirror states only the OR —
    * semantically identical, so the hash gate certifies the derivation. */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val disjunct = DisjunctWindows.map(w =>
      col("p_brand") === w.brand &&
        col("p_size").between(1, w.sizeMax) &&
        col("l_quantity").between(w.qtyMin, w.qtyMax)).reduce(_ || _)
    val qtyLo = DisjunctWindows.map(_.qtyMin).min
    val qtyHi = DisjunctWindows.map(_.qtyMax).max
    val sizeHi = DisjunctWindows.map(_.sizeMax).max
    val brands = DisjunctWindows.map(_.brand)
    lineitem.filter(col("l_quantity").between(qtyLo, qtyHi))
      .join(part.filter(col("p_brand").isin(brands: _*) &&
          col("p_size").between(1, sizeHi)),
        col("l_partkey") === col("p_partkey"))
      .filter(disjunct)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"), moneySum(revenue).as("disc_revenue"))
      .orderBy("p_brand")
  }

  /** Max edit distance for a [[nameMatching]] candidate pair — shared
    * with the mirror (the shared-constant discipline). */
  val NameMatchMaxDist = 4

  /** Exact per-brand retail-price quartile anchors — count, min/max and
    * MEDIAN cents per brand, the two-middle-ranks discipline
    * (q_mad_anomalies) generalized to PER-GROUP medians: the rank and
    * count windows partition by brand (each partition bounded by the
    * largest brand's catalog slice, never the corpus), and the median
    * divides two exact longs — no interpolated percentile. */
  def brandMedianPrice(part: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBrand = Window.partitionBy(col("p_brand"))
    val ranked = part.select(col("p_brand"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long").as("cents"),
        col("p_partkey"))
      .withColumn("rk", row_number().over(
        byBrand.orderBy(col("cents"), col("p_partkey"))).cast("long"))
      .withColumn("nb", count(lit(1)).over(byBrand))
      .withColumn("mid", col("rk") === expr("(nb + 1) div 2") ||
        col("rk") === expr("(nb + 2) div 2"))
    ranked.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"),
        (sum(when(col("mid"), col("cents"))).cast("double") /
          sum(when(col("mid"), 1L))).as("median_cents"))
      .orderBy("p_brand")
  }

  /** Golden-record survivorship — the entity-resolution closer over
    * [[nameMatching]]: matched name pairs become edges, transitive match
    * clusters resolve by min-label connected components
    * ([[graft.ext.Dedup.connectedComponents]] — the SAME primitive the
    * dedup family certifies), the lexicographically-smallest member
    * survives as the canonical name, and the catalog rolls up to one
    * golden record per canonical (names merged, parts covered; unmatched
    * names survive as their own canonical via the left join — never
    * silently dropped).
    *
    * Mirror = the naive recursive-CTE reachability over the same edge
    * list (the q_dup_clusters discipline), so the gate certifies the
    * iterative min-label propagation a third time, now on STRING vertex
    * ids. Scale: the cluster frame is vocabulary-sized — the join back
    * onto the catalog broadcasts. */
  def nameSurvivorship(part: DataFrame): DataFrame = {
    val pairs = nameMatching(part).select(col("name1"), col("name2"))
    val labels = graft.ext.Dedup.connectedComponents(pairs)
      .select(col("id").as("name"), col("component").as("canonical"))
    part.select(col("p_name"))
      .join(broadcast(labels), col("p_name") === col("name"), "left")
      .select(col("p_name"),
        coalesce(col("canonical"), col("p_name")).as("canonical_name"))
      .groupBy("canonical_name")
      .agg(countDistinct(col("p_name")).as("n_names"),
        count(lit(1)).as("n_parts"))
      .orderBy("canonical_name")
  }

  /** Blocked entity resolution over the part-name vocabulary: candidate
    * near-duplicate name pairs = same blocking key (the last name token —
    * the head noun) and Levenshtein distance ≤ [[NameMatchMaxDist]].
    * Classic record-linkage shape: BLOCK first (an equi-join Catalyst
    * hashes and AQE can split — never an all-pairs cross join), then the
    * expensive pairwise metric only within blocks.
    *
    * The pair list is EXACT GIVEN THE BLOCKING (both engines apply the
    * identical block + threshold, so the gate certifies pair parity;
    * blocking recall is a documented trade, as in every real linkage
    * pipeline). Scale: the join runs on the DISTINCT name vocabulary —
    * catalog-sized, not row-sized — and Levenshtein is evaluated only on
    * within-block pairs. Spark and DuckDB both implement the classic
    * unit-cost edit distance, so the integer rides the gate. */
  def nameMatching(part: DataFrame,
      maxDist: Int = NameMatchMaxDist): DataFrame = {
    val names = part.select(col("p_name")).distinct()
      .select(col("p_name").as("name"),
        element_at(split(col("p_name"), " "), -1).as("block"))
    names.as("a").join(names.as("b"),
        col("a.block") === col("b.block") && col("a.name") < col("b.name"))
      .select(col("a.block").as("block"), col("a.name").as("name1"),
        col("b.name").as("name2"),
        levenshtein(col("a.name"), col("b.name")).as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
      .orderBy("block", "name1", "name2")
  }
}
