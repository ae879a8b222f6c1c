package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Join shapes. The reference only exercises left equi-joins
  * (pandas_DataModel.py:56-59); the rest complete the surface a user of
  * a general engine needs (SURVEY.md §2 "categories with no
  * representative").
  *
  * Scale design: BOUNDED dimension sides (region/nation — fixed 5/25
  * rows at any SF) are explicitly `broadcast()`; SF-proportional
  * tables (customer/supplier/part/orders/lineitem) carry no hint —
  * AQE broadcasts them while they are small and falls back to a
  * co-keyed shuffle join when they are not (r19 review: a forced
  * broadcast of an unbounded side aborts at the broadcast-relation
  * limit exactly when the data grows). Fact-to-fact (orders⋈lineitem)
  * relies on sort-merge with AQE; both sides hash-partition on the
  * join key.
  */
object Joins {

  /** users ⟕ weights analog: customer ⟕ orders, row-level. */
  def leftJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("o_orderstatus"))

  /** Star join: fact ⋈ dims, revenue per region/nation. nation/region
    * are BOUNDED dimensions (25/5 rows at any SF) and broadcast
    * explicitly; customer scales WITH the corpus, so its join carries
    * no hint (r19 review — the q24 rule: per-customer cardinality is
    * never a bounded dimension; a forced broadcast aborts at the 8 GB
    * relation limit exactly when the data is big, while AQE still
    * broadcasts it at gate scale where it is small).
    */
  def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Left-semi: customers having at least one high-value order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 200000)
    Tables.customer(spark, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Left-anti: customers with no HIGH-VALUE order. The original
    * "no orders at all" phrasing returned 0 rows at every gate SF
    * (every customer has an order by fixture construction), so the
    * gate passed trivially for ANY implementation returning empty —
    * the r18-verdict vacuous-gate class. The >250k predicate leaves
    * real survivors at sf0.01 while gating the same left_anti plan.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 250000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Right join (users⟕weights reversed): orders ⟖ customer. */
  def rightJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))

  /** Full-outer of two keyed aggregates: customer vs supplier counts per
    * nation (exercises null sides on both ends).
    */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val s = Tables.supplier(spark, dir).groupBy(col("s_nationkey").as("s_nk"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(s, c("nationkey") === s("s_nk"), "full_outer")
      .select(
        coalesce(col("nationkey"), col("s_nk")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
  }

  /** Cross join (small × small): region × order priorities. */
  def crossJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.region(spark, dir).select(col("r_name"))
      .crossJoin(Tables.orders(spark, dir).select(col("o_orderpriority")).distinct())

  /** Non-equi range join: parts paired with suppliers in the same
    * acctbal band (theta join — no representative in the reference).
    * Small sides keep the quadratic bound tiny; broadcast-NL is the
    * right physical plan and Catalyst picks it.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    s.join(n, col("s_nationkey") >= col("n_nationkey") - 2 &&
              col("s_nationkey") <= col("n_nationkey") + 2)
      .select(col("s_suppkey"), col("s_name"), col("n_nationkey"), col("n_name"))
  }

  /** The same band join as q09 through [[graft.operators.IntervalJoin]]
    * — a pure equi-join plan (bucketized banding), hash-gated against
    * the SAME range-join SQL: the scale path must produce byte-identical
    * results to the nested-loop path it replaces.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"),
        (col("n_nationkey") - 2).as("lo"), (col("n_nationkey") + 2).as("hi"))
    graft.operators.IntervalJoin.pointInInterval(
        s, n, pointCol = "s_nationkey", loCol = "lo", hiCol = "hi",
        bucketWidth = 4)
      .select(col("s_suppkey"), col("s_name"), col("n_nationkey"), col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q02_join_left" -> (leftJoin _),
    "q03_join_star" -> (starJoin _),
    "q04_join_semi" -> (semiJoin _),
    "q05_join_anti" -> (antiJoin _),
    "q06_join_right" -> (rightJoin _),
    "q07_join_full_outer" -> (fullOuterJoin _),
    "q08_join_cross" -> (crossJoin _),
    "q09_join_range" -> (rangeJoin _),
    "q70_interval_join" -> (intervalJoin _))

  val oracles: Map[String, String] = Map(
    "q02_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice, o_orderstatus
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "q03_join_star" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q04_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)""".stripMargin,
    "q05_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)""".stripMargin,
    "q06_join_right" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "q07_join_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
        |           FROM customer GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey AS s_nk, count(*) AS n_suppliers
        |           FROM supplier GROUP BY s_nationkey)
        |SELECT coalesce(nationkey, s_nk) AS nationkey,
        |       coalesce(n_customers, 0) AS n_customers,
        |       coalesce(n_suppliers, 0) AS n_suppliers
        |FROM c FULL OUTER JOIN s ON nationkey = s_nk""".stripMargin,
    "q08_join_cross" ->
      """SELECT r_name, o_orderpriority
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)""".stripMargin,
    "q09_join_range" ->
      """SELECT s_suppkey, s_name, n_nationkey, n_name
        |FROM supplier JOIN nation
        |  ON s_nationkey >= n_nationkey - 2 AND s_nationkey <= n_nationkey + 2""".stripMargin,
    "q70_interval_join" ->
      """SELECT s_suppkey, s_name, n_nationkey, n_name
        |FROM supplier JOIN nation
        |  ON s_nationkey >= n_nationkey - 2 AND s_nationkey <= n_nationkey + 2""".stripMargin)
}
