package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/** The remaining TPC-H query suite (Q2, Q4, Q7-Q13, Q15, Q16, Q18-Q22),
  * completing the 22-query set together with Q1/Q3/Q5/Q6/Q14/Q17 in
  * [[Relational]]. The reference runs only a Q3 variant
  * (reference pipeline/reduce.py:24-78); the full suite is included because it
  * is the canonical coverage test for a warehouse engine's plan space —
  * each query below exists to exercise a distinct plan shape (decorrelated
  * min, EXISTS/NOT-EXISTS self-joins, disjunctive join predicates, scalar
  * subqueries in HAVING, left-outer distribution counts, ...).
  *
  * FIXTURE ADAPTATIONS (documented per query): the driver fixtures have no
  * `partsupp` table and drop several classic columns (l_shipmode,
  * l_commitdate, l_receiptdate, c_phone, p_container, p_mfgr, o_comment).
  * Queries touching those are VARIANTS that keep the classic plan shape
  * but substitute an available column/derivation; the DuckDB oracle runs
  * the identical variant semantics, so the correctness gate is exact.
  * Recurring substitutions:
  *  - supply cost (partsupp.ps_supplycost) → min unit price ever charged
  *    by that supplier for that part, from lineitem;
  *  - "late" (l_receiptdate > l_commitdate) → l_shipdate lateness
  *    relative to o_orderdate;
  *  - shipmode class column → l_returnflag.
  *
  * Scale notes, applied throughout (same stance as [[Relational]]):
  * range/equality filters precede joins and reach the parquet scans; only
  * O(1)-size relations (nation⋈region, global scalar aggregates, the
  * 6-row negative-balance supplier list) are explicitly `broadcast()`;
  * SF-proportional sides are left to AQE; every aggregation is a
  * partial/final HashAggregate; fixed-point [[Exact]] sums keep doubles
  * bit-identical to the oracle at any parallelism.
  */
object Tpch {

  private def ts(s: String) = lit(s + " 00:00:00").cast("timestamp")
  private def vol = col("l_extendedprice") * (lit(1) - col("l_discount"))

  // ---------------------------------------------------------------- Q2
  /** Q2 minimum-cost supplier. VARIANT: no partsupp, so supply cost is
    * min(l_extendedprice / l_quantity) per (part, supplier) — the
    * cheapest unit price that supplier ever charged for that part (IEEE
    * division of identical parquet doubles is bit-stable across engines,
    * and min() is order-independent, so the float equi-join back onto
    * the per-part minimum is exact).
    *
    * Plan shape: the classic correlated "cost = (SELECT min ...)"
    * subquery is evaluated as a PER-PARTKEY WINDOW MIN over the joined
    * relation — one shuffle on partkey and a single pass, where the
    * textbook aggregate-and-join-back decorrelation executes the whole
    * join subtree twice (measured: 15 exchanges vs 5 here; the two
    * subtree copies don't canonicalize equal, so ReuseExchange can't
    * merge them). nation⋈region is O(25) and broadcast; the
    * (part,supplier) cost relation is SF-proportional and left to AQE. */
  def q2MinCost(spark: SparkSession, sfDir: String): DataFrame = {
    val cost = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("supply_cost"))
    val dims = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val w = Window.partitionBy("p_partkey")
    cost
      .join(Tables.supplier(spark, sfDir), col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(dims), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.part(spark, sfDir).filter(col("p_size") <= 15 && col("p_type") === "LARGE"),
        col("ps_partkey") === col("p_partkey"))
      .withColumn("min_cost", min(col("supply_cost")).over(w))
      .filter(col("supply_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
        col("p_brand"), col("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  private val q2Sql: String =
    """WITH cost AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         min(l_extendedprice / l_quantity) AS supply_cost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost
      |FROM (
      |  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost,
      |    min(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
      |  FROM cost, supplier, nation, region, part
      |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |    AND ps_partkey = p_partkey AND p_size <= 15 AND p_type = 'LARGE') t
      |WHERE supply_cost = min_cost
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- Q4
  /** Q4 order-priority checking. VARIANT: "late line" is
    * l_shipdate > o_orderdate (no commit/receipt dates in fixtures).
    * Plan shape preserved: EXISTS → LEFT SEMI join (each order counted
    * once however many lines are late), then a 5-group count. */
  def q4Priority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= ts("1997-07-01") && col("o_orderdate") < ts("1997-10-01"))
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- Q7
  /** Q7 volume shipping between two nations, both directions, by ship
    * year. Faithful to the classic shape: the ship-date range reaches
    * the lineitem scan; both nation lookups are O(25) broadcasts; the
    * (supplier↔customer) nation-pair disjunction is evaluated after the
    * equi-joins, exactly as Catalyst plans the classic query. */
  def q7Volume(spark: SparkSession, sfDir: String): DataFrame = {
    val (na, nb) = ("NATION_1", "NATION_2")
    val nat = Tables.nation(spark, sfDir)
    val suppN = Tables.supplier(spark, sfDir)
      .join(broadcast(nat.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    val custN = Tables.customer(spark, sfDir)
      .join(broadcast(nat.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .select("c_custkey", "cust_nation")
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .join(suppN, col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(Exact.exactSum(vol, 4).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  ${Exact.sqlSum("volume", 4)} AS revenue
       |FROM (
       |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |    year(l_shipdate)::BIGINT AS l_year,
       |    l_extendedprice * (1 - l_discount) AS volume
       |  FROM lineitem, orders, customer, supplier, nation sn, nation cn
       |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |    AND l_suppkey = s_suppkey AND s_nationkey = sn.n_nationkey
       |    AND c_nationkey = cn.n_nationkey
       |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |    AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       |      OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))) t
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** Q8 national market share: of all STANDARD-part order volume sold to
    * ASIA customers in 1996-1997, the fraction supplied by NATION_3, per
    * order year. The share is a ratio of two fixed-point exact sums, so
    * the single closing division is bit-identical in both engines. */
  def q8MktShare(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables.nation(spark, sfDir)
    val asiaCust = Tables.customer(spark, sfDir)
      .join(broadcast(nat
        .join(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk"))), col("c_nationkey") === col("cnk"))
      .select("c_custkey")
    val suppN = Tables.supplier(spark, sfDir)
      .join(broadcast(nat.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "STANDARD").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .join(suppN, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        Exact.exactSum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0.0)), 4)
          .as("nation_volume"),
        Exact.exactSum(vol, 4).as("total_volume"))
      .select(col("o_year"), col("nation_volume"), col("total_volume"),
        (col("nation_volume") / col("total_volume")).as("mkt_share"))
      .orderBy("o_year")
  }

  private val q8Sql: String =
    s"""SELECT o_year, nation_volume, total_volume,
       |  nation_volume / total_volume AS mkt_share
       |FROM (
       |  SELECT year(o_orderdate)::BIGINT AS o_year,
       |    ${Exact.sqlSum("CASE WHEN n_supp.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)} AS nation_volume,
       |    ${Exact.sqlSum("l_extendedprice * (1 - l_discount)", 4)} AS total_volume
       |  FROM lineitem, part, orders, customer, nation n_cust, region, supplier, nation n_supp
       |  WHERE l_partkey = p_partkey AND p_type = 'STANDARD'
       |    AND l_orderkey = o_orderkey
       |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |    AND o_custkey = c_custkey AND c_nationkey = n_cust.n_nationkey
       |    AND n_cust.n_regionkey = r_regionkey AND r_name = 'ASIA'
       |    AND l_suppkey = s_suppkey AND s_nationkey = n_supp.n_nationkey
       |  GROUP BY 1) t
       |ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- Q9
  /** Q9 product-type profit. VARIANT: no partsupp.ps_supplycost, so line
    * cost is 0.4 * p_retailprice * l_quantity (a fixed cost fraction of
    * retail — the derivation both engines evaluate with the same IEEE
    * expression shape, so the fixed-point sum stays exact). Plan shape
    * preserved: part-name filter → fact joins → (nation, year) rollup. */
  def q9Profit(spark: SparkSession, sfDir: String): DataFrame = {
    val profit = vol - lit(0.4) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice"), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(Exact.exactSum(profit, 4).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q9Sql: String =
    s"""SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
       |  ${Exact.sqlSum("l_extendedprice * (1 - l_discount) - 0.4 * p_retailprice * l_quantity", 4)} AS sum_profit
       |FROM lineitem, part, orders, supplier, nation
       |WHERE l_partkey = p_partkey AND p_name LIKE '%gear%'
       |  AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
       |  AND s_nationkey = n_nationkey
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // --------------------------------------------------------------- Q10
  /** Q10 returned-item reporting: top 20 customers by revenue lost to
    * returns in one quarter. Faithful shape: date filter on orders and
    * flag filter on lineitem reach the scans; nation is broadcast;
    * TakeOrderedAndProject keeps 20 rows per partition. */
  def q10Returns(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01"))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(Exact.exactSum(vol, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  ${Exact.sqlSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
       |FROM lineitem, orders, customer, nation
       |WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
       |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
       |  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // --------------------------------------------------------------- Q11
  /** Q11 important stock. VARIANT: no partsupp, so a part's "stock
    * value" from EUROPE suppliers is the exact sum of l_extendedprice
    * over their lineitems. Plan shape preserved: the HAVING threshold is
    * a SCALAR subquery — computed once as a 1-row aggregate, broadcast
    * into a cross join (not recomputed per group), then a post-agg
    * filter. Both sides of the comparison are fixed-point sums scaled by
    * the same literal, so the cut is bit-exact. */
  def q11StockValue(spark: SparkSession, sfDir: String): DataFrame = {
    val eurSupp = Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .join(Tables.region(spark, sfDir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val eurLines = Tables.lineitem(spark, sfDir)
      .join(eurSupp, col("l_suppkey") === col("s_suppkey"))
    val threshold = eurLines
      .agg((Exact.exactSum(col("l_extendedprice"), 2) * lit(0.001)).as("cut"))
    eurLines.groupBy(col("l_partkey").as("p_partkey"))
      .agg(Exact.exactSum(col("l_extendedprice"), 2).as("stock_value"))
      .crossJoin(broadcast(threshold))
      .filter(col("stock_value") > col("cut"))
      .select("p_partkey", "stock_value")
      .orderBy(col("stock_value").desc, col("p_partkey"))
  }

  private val q11Sql: String =
    s"""SELECT l_partkey AS p_partkey,
       |  ${Exact.sqlSum("l_extendedprice", 2)} AS stock_value
       |FROM lineitem, supplier, nation, region
       |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |  AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
       |GROUP BY l_partkey
       |HAVING ${Exact.sqlSum("l_extendedprice", 2)} > (
       |  SELECT ${Exact.sqlSum("l_extendedprice", 2)} * 0.001
       |  FROM lineitem, supplier, nation, region
       |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
       |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE')
       |ORDER BY stock_value DESC, p_partkey""".stripMargin

  // --------------------------------------------------------------- Q12
  /** Q12 shipping-priority classes. VARIANT: the class column is
    * l_returnflag (fixtures have no l_shipmode) and "late" is shipping
    * 60+ days after order placement (no commit/receipt dates). Plan
    * shape preserved: pushed ship-date range, one orders equi-join,
    * conditional counts per class (count-of-CASE, not sum-of-int, so
    * both engines emit BIGINT). */
  def q12Priority(spark: SparkSession, sfDir: String): DataFrame = {
    val highPrio = col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01") &&
        col("l_returnflag").isin("A", "N"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(highPrio, lit(1))).as("high_line_count"),
        count(when(!highPrio, lit(1))).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  private val q12Sql: String =
    """SELECT l_returnflag,
      |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      |FROM lineitem, orders
      |WHERE l_orderkey = o_orderkey AND l_returnflag IN ('A', 'N')
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- Q13
  /** Q13 customer order-count distribution. VARIANT: the classic
    * o_comment NOT LIKE filter becomes o_orderpriority <> '5-LOW' (any
    * non-key join-side filter preserves the shape). Plan shape: LEFT
    * OUTER join so zero-order customers survive with count 0, then a
    * second aggregation over the counts — the double-group-by
    * distribution pattern. */
  def q13CustDist(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select("c_custkey")
      .join(Tables.orders(spark, sfDir).filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  private val q13Sql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // --------------------------------------------------------------- Q15
  /** Q15 top supplier: suppliers whose quarterly revenue equals the
    * maximum. The classic view + scalar-max is a grouped aggregate, a
    * 1-row max broadcast into an equi-ish join on the revenue value
    * (bit-exact: both sides are the same fixed-point sum), then the
    * supplier dimension join. */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(Exact.exactSum(vol, 4).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val q15Sql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    ${Exact.sqlSum("l_extendedprice * (1 - l_discount)", 4)} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier, revenue
       |WHERE s_suppkey = supplier_no
       |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  // --------------------------------------------------------------- Q16
  /** Q16 part/supplier relationship. VARIANT: the part↔supplier link is
    * lineitem (no partsupp) and the excluded-supplier subquery
    * ("complaints" in the classic) is negative account balance. Plan
    * shape preserved: NOT IN → LEFT ANTI against an O(few)-row broadcast
    * list, dimension filters before the join, count(DISTINCT) per
    * (brand, type, size) group. */
  def q16SuppCnt(spark: SparkSession, sfDir: String): DataFrame = {
    val badSupp = Tables.supplier(spark, sfDir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
      .join(Tables.part(spark, sfDir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  private val q16Sql: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // --------------------------------------------------------------- Q18
  /** Q18 large-volume orders: orders whose total quantity exceeds 250
    * (fixture p99 is 262). Faithful shape: the HAVING subquery is a
    * grouped sum over the fact re-joined to orders on orderkey —
    * aggregate-then-join, never a per-order subquery — and the top-100
    * is TakeOrderedAndProject. */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(Exact.exactSum(col("l_quantity"), 2).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    big.join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Sql: String =
    s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
       |FROM (SELECT l_orderkey, ${Exact.sqlSum("l_quantity", 2)} AS sum_qty
       |      FROM lineitem GROUP BY l_orderkey
       |      HAVING ${Exact.sqlSum("l_quantity", 2)} > 250) big, orders, customer
       |WHERE big.l_orderkey = o_orderkey AND o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  // --------------------------------------------------------------- Q19
  /** Q19 discounted revenue under a DISJUNCTION of brand/size/quantity
    * conjunct groups. VARIANT: p_container/l_shipmode predicates are
    * replaced by p_size/l_quantity ranges. The point of the query is the
    * plan: Catalyst keeps the equi-key (partkey) as the hash-join key
    * and evaluates the OR-of-ANDs as a post-join filter while pushing
    * the derivable single-side conjuncts (brand/size supersets) into the
    * scans. */
  def q19Disjunct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))))
      .agg(Exact.exactSum(vol, 4).as("revenue"), count(lit(1)).as("n_rows"))

  private val q19Sql: String =
    s"""SELECT ${Exact.sqlSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
       |  count(*) AS n_rows
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey AND (
       |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
       |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       |  OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  // --------------------------------------------------------------- Q20
  /** Q20 potential part promotion. VARIANT: "supplied more than the
    * availability threshold" (partsupp.ps_availqty) becomes "shipped
    * more than 40 units of small* parts during 1997". Plan shape
    * preserved: innermost part-name filter → per-(supplier, part)
    * quantity aggregate → threshold filter → LEFT SEMI into the
    * region-filtered supplier dimension — the nested-IN chain
    * decorrelated into joins. */
  def q20PartSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val smallParts = Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val shipped = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .join(smallParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(Exact.exactSum(col("l_quantity"), 2).as("qty"))
      .filter(col("qty") > 40)
      .select("l_suppkey")
    Tables.supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)
        .join(Tables.region(spark, sfDir).filter(col("r_name") === "AFRICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")), col("s_nationkey") === col("n_nationkey"))
      .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("n_name"), col("s_acctbal"))
      .orderBy("s_name")
  }

  private val q20Sql: String =
    s"""SELECT s_name, n_name, s_acctbal
       |FROM supplier, nation, region
       |WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'AFRICA'
       |  AND s_suppkey IN (
       |    SELECT l_suppkey FROM lineitem, part
       |    WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
       |      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |    GROUP BY l_suppkey, l_partkey
       |    HAVING ${Exact.sqlSum("l_quantity", 2)} > 40)
       |ORDER BY s_name""".stripMargin

  // --------------------------------------------------------------- Q21
  /** Q21 suppliers who kept orders waiting. VARIANT: "late" is shipping
    * 30+ days after order placement (no receipt/commit dates). Plan
    * shape preserved — the query's whole point is the EXISTS +
    * NOT EXISTS pair against the SAME fact table: one LEFT SEMI (some
    * other supplier contributed to the order) and one LEFT ANTI (no
    * other supplier was also late), both hash equi-joins on orderkey
    * with the supplier inequality as a residual condition. */
  def q21Waiting(spark: SparkSession, sfDir: String): DataFrame = {
    val late = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select("l_orderkey", "l_suppkey")
    val allLines = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("x_orderkey"), col("l_suppkey").as("x_suppkey"))
    val lateLines = late
      .select(col("l_orderkey").as("y_orderkey"), col("l_suppkey").as("y_suppkey"))
    late
      .join(allLines, col("l_orderkey") === col("x_orderkey") &&
        col("l_suppkey") =!= col("x_suppkey"), "left_semi")
      .join(lateLines, col("l_orderkey") === col("y_orderkey") &&
        col("l_suppkey") =!= col("y_suppkey"), "left_anti")
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  private val q21Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1, orders, supplier
      |WHERE l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
      |  AND l1.l_suppkey = s_suppkey
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // --------------------------------------------------------------- Q22
  /** Q22 global sales opportunity. VARIANT: the phone-prefix country
    * code is c_nationkey (fixtures have no c_phone) and "no orders" is
    * "no orders since 1999" (every fixture customer has at least one
    * order). Plan shape preserved: scalar above-average-balance
    * threshold (1-row broadcast), anti-join against the filtered orders
    * projection, per-country count + exact balance sum. */
  def q22IdleBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val codes = Seq(0, 1, 2, 3, 4, 5, 6).map(Integer.valueOf)
    val inCodes = col("c_nationkey").isin(codes: _*)
    val cust = Tables.customer(spark, sfDir)
    val avgBal = cust.filter(inCodes && col("c_acctbal") > 0)
      .agg(Exact.exactAvg(col("c_acctbal"), 2).as("ab"))
    cust.filter(inCodes)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(Tables.orders(spark, sfDir).filter(col("o_orderdate") >= ts("1999-01-01"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), Exact.exactSum(col("c_acctbal"), 2).as("totacctbal"))
      .orderBy("cntrycode")
  }

  private val q22Sql: String =
    s"""SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       |  ${Exact.sqlSum("c_acctbal", 2)} AS totacctbal
       |FROM customer c
       |WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
       |  AND c_acctbal > (
       |    SELECT ${Exact.sqlAvg("c_acctbal", 2)}
       |    FROM customer WHERE c_acctbal > 0 AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c.c_custkey
       |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
       |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin

  // ------------------------------------------------------------ surface

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost" -> (q2MinCost _),
    "q4_priority" -> (q4Priority _),
    "q7_volume" -> (q7Volume _),
    "q8_mktshare" -> (q8MktShare _),
    "q9_profit" -> (q9Profit _),
    "q10_returns" -> (q10Returns _),
    "q11_stock_value" -> (q11StockValue _),
    "q12_priority_class" -> (q12Priority _),
    "q13_cust_dist" -> (q13CustDist _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_supp_cnt" -> (q16SuppCnt _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q19_disjunct" -> (q19Disjunct _),
    "q20_part_suppliers" -> (q20PartSuppliers _),
    "q21_waiting" -> (q21Waiting _),
    "q22_idle_balance" -> (q22IdleBalance _))

  val oracles: Map[String, String] = Map(
    "q2_min_cost" -> q2Sql,
    "q4_priority" -> q4Sql,
    "q7_volume" -> q7Sql,
    "q8_mktshare" -> q8Sql,
    "q9_profit" -> q9Sql,
    "q10_returns" -> q10Sql,
    "q11_stock_value" -> q11Sql,
    "q12_priority_class" -> q12Sql,
    "q13_cust_dist" -> q13Sql,
    "q15_top_supplier" -> q15Sql,
    "q16_supp_cnt" -> q16Sql,
    "q18_large_orders" -> q18Sql,
    "q19_disjunct" -> q19Sql,
    "q20_part_suppliers" -> q20Sql,
    "q21_waiting" -> q21Sql,
    "q22_idle_balance" -> q22Sql)
}
