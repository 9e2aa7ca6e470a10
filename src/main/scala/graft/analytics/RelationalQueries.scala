package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational capability coverage over the TPC-H-ish test tables
  * (SURVEY.md §2.5 joins, §2.9 windows, §2.10 set ops, §7.2 step 4).
  *
  * Scale notes (100 TB / 1000-executor thinking):
  *  - Dimension tables (region/nation/supplier/part/customer) are broadcast —
  *    no shuffle of the fact side. `broadcast()` hints are explicit where the
  *    dim is guaranteed small; AQE handles the rest.
  *  - Fact-fact joins (orders⋈lineitem) shuffle on the join key once; the
  *    following aggregate reuses that partitioning (no second exchange).
  *  - Top-K queries rely on TakeOrderedAndProject (per-partition heaps, no
  *    global sort).
  */
object RelationalQueries {

  /** TPC-H Q1 pricing summary — the canonical scan-heavy aggregate.
    * One pass over lineitem; partial aggregation map-side, tiny shuffle
    * (6 groups). Filter on l_shipdate is pushed to the parquet scan.
    */
  def q1PricingSummary(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumDisc(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        dsumCharge(col("l_extendedprice"), col("l_discount"), col("l_tax")).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Distinct aggregation (expand + two-phase agg in Catalyst). */
  def distinctCounts(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders")
      )

  /** ROLLUP over orders: (status, priority) / (status) / () levels.
    * Nulls produced by the rollup are coalesced to a sentinel so the Spark
    * and DuckDB orderings agree regardless of NULL-placement defaults.
    */
  def ordersRollup(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n_orders"), col("total_price")
      )
      .orderBy(col("status"), col("priority"))

  /** CUBE over lineitem flags. */
  def lineitemCube(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n_items"), col("sum_qty")
      )
      .orderBy(col("returnflag"), col("linestatus"))

  /** Global top-20 orders by price — TakeOrderedAndProject, no full sort. */
  def topOrders(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  // ---------------------------------------------------------------- joins

  /** Broadcast chain join: nation ⋈ region (both tiny → pure broadcast). */
  def joinNationRegion(spark: SparkSession, d: String): DataFrame =
    Tables.nation(spark, d)
      .join(broadcast(Tables.region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))

  /** Fact ⋈ broadcast-dim join: orders ⋈ customer, revenue per market segment.
    * customer is the small side at any SF ratio → broadcast, so the orders
    * scan never shuffles.
    */
  def joinCustomerOrders(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .join(broadcast(Tables.customer(spark, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"),
        countDistinct(col("c_custkey")).as("n_customers")
      )
      .orderBy(col("c_mktsegment"))

  /** TPC-H Q3-ish: 3-way join + filtered revenue top-10.
    * customer (filtered, small) broadcasts into orders; orders⋈lineitem is
    * the one shuffle (co-partitioned on orderkey); final top-10 via
    * TakeOrderedAndProject.
    */
  def q3Shipping(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li   = Tables.lineitem(spark, d).filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
    ord
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsumDisc(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-ish: 6-way join, revenue per nation within a region.
    * All dims broadcast; lineitem⋈orders is the only repartitioning join.
    */
  def q5LocalSupplier(spark: SparkSession, d: String): DataFrame = {
    val region = Tables.region(spark, d).filter(col("r_name") === "ASIA")
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsumDisc(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Left-semi join: customers that have at least one order, per nation. */
  def semiJoinCustomers(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_active_customers"))
      .orderBy(col("c_nationkey"))

  /** Bloom-prefiltered semi-join ([[graft.functions.BloomPrefilter]]):
    * parts with at least one max-quantity line item. The RESULT is
    * identical to a plain left-semi join (the sketch admits no false
    * negatives and the exact join kills its false positives — asserted
    * against the plain join in RelationalSpec); the PLAN probes a
    * fixed-size Bloom sketch inside codegen before any exchange, so at
    * scale the semi-join's shuffle carries only sketch survivors
    * instead of the full probe table. The relational face of the same
    * operator the decontamination pipeline uses on shingle hashes.
    */
  def bloomSemiJoinParts(spark: SparkSession, d: String): DataFrame =
    bloomJoinParts(spark, d, graft.functions.BloomPrefilter.bloomSemiJoin(_, _, "p_partkey", "l_partkey"))

  /** Bloom-prefiltered anti-join: parts with NO max-quantity line item —
    * the exact complement of [[bloomSemiJoinParts]], via
    * [[graft.functions.BloomPrefilter.bloomAntiJoin]]. Probes the sketch
    * rejects are definitely-absent and skip the join; only survivors
    * reach the exact anti-join. Result identical to a plain left-anti
    * join (asserted in BloomPrefilterSpec).
    */
  def bloomAntiJoinParts(spark: SparkSession, d: String): DataFrame =
    bloomJoinParts(spark, d, graft.functions.BloomPrefilter.bloomAntiJoin(_, _, "p_partkey", "l_partkey"))

  /** Shared operands + projection of the two bloom join queries: parts
    * probed against the max-quantity line-item key set.
    */
  private def bloomJoinParts(spark: SparkSession, d: String,
                             join: (DataFrame, DataFrame) => DataFrame): DataFrame =
    join(Tables.part(spark, d),
      Tables.lineitem(spark, d).filter(col("l_quantity") > 49))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  /** Left-anti join: customers with no URGENT orders, per nation. (The
    * generated data is dense — every customer has some order — so the
    * unrestricted form matched the oracle only on 0 = 0 rows, which
    * certifies nothing; the priority-restricted form returns real rows
    * at every scale factor.)
    */
  def antiJoinCustomers(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .join(
        Tables.orders(spark, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_inactive_customers"))
      .orderBy(col("c_nationkey"))

  /** Left-outer join preserving order-less customers; order-count histogram. */
  def outerJoinHistogram(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_orders"))

  /** Non-equi (range) join: suppliers × same-nation customers with a larger
    * account balance. Equi part (nationkey) keys the join; the range predicate
    * filters inside — so this stays a hash join, not a nested-loop.
    */
  def rangeJoinBalance(spark: SparkSession, d: String): DataFrame =
    Tables.supplier(spark, d).as("s")
      .join(Tables.customer(spark, d).as("c"),
        col("s.s_nationkey") === col("c.c_nationkey") && col("c.c_acctbal") > col("s.s_acctbal"))
      .groupBy(col("s.s_suppkey"))
      .agg(count(lit(1)).as("n_richer_customers"))
      .orderBy(col("s.s_suppkey"))

  /** As-of join: for each purchase event, the most recent prior error event
    * of the same user. Implemented the scale-friendly way — union the two
    * event streams, sort within user, carry the last error forward with a
    * running `max ... rows unbounded preceding` window — ONE shuffle on
    * user_id, no row-explosion (vs. the O(n·m) join+max formulation).
    */
  def asofJoinEvents(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val tagged = ev.select(
      col("event_id"), col("user_id"), col("ts"), col("event_type"),
      when(col("event_type") === "error", col("ts")).as("error_ts")
    )
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("prev_error_ts", max(col("error_ts")).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("prev_error_ts"))
      .orderBy(col("event_id"))
  }

  // ------------------------------------------------------------- windows

  /** Ranking window: top-3 customers by balance per nation. */
  def windowTopCustomers(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_nationkey"), col("rk"), col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("rk"))
  }

  /** Running-total window: cumulative spend per customer over time. */
  def windowRunningTotal(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("price_dec"))
      .withColumn("cum_spend", sum(col("price_dec")).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("cum_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Analytic window: lag — each event paired with the user's previous event. */
  def windowLagEvents(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("prev_event_id", lag(col("event_id"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .orderBy(col("event_id"))
  }

  /** Rank/dense_rank/percent share per nation (multi-window-function). */
  def windowRankShare(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey")).orderBy(col("s_acctbal").desc, col("s_suppkey"))
    Tables.supplier(spark, d)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .orderBy(col("s_suppkey"))
  }

  // ------------------------------------------------------------- set ops

  private def custNations(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d).select(col("c_nationkey").cast("long").as("nationkey"))
  private def suppNations(spark: SparkSession, d: String): DataFrame =
    Tables.supplier(spark, d).select(col("s_nationkey").cast("long").as("nationkey"))

  /** UNION (distinct): nation keys present among customers or suppliers. */
  def setUnionNations(spark: SparkSession, d: String): DataFrame =
    custNations(spark, d).union(suppNations(spark, d)).distinct().orderBy(col("nationkey"))

  /** INTERSECT: nation keys with both customers and suppliers. */
  def setIntersectNations(spark: SparkSession, d: String): DataFrame =
    custNations(spark, d).intersect(suppNations(spark, d)).orderBy(col("nationkey"))

  /** EXCEPT: nation keys with customers but no suppliers. */
  /** EXCEPT with guaranteed-non-empty result: order keys that placed an
    * order but have no lineitems. (Customer-vs-supplier nation keys —
    * the previous form — cover the same 25 nations at every scale
    * factor, so that EXCEPT matched its oracle only on 0 = 0 rows.)
    */
  def setExceptNations(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d).select(col("o_orderkey").as("orderkey")).distinct()
      .except(Tables.lineitem(spark, d).select(col("l_orderkey").as("orderkey")).distinct())
      .orderBy(col("orderkey"))
}
