package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, SkewJoin}
import graft.sources.Tables

/** Advanced operator battery: as-of join, SQL text entry, exact
  * percentiles, skew-salted join.
  */
object AdvancedQ {

  /** Backward as-of: every event joined to the user's most recent
    * 'purchase' event at-or-before it. Oracle: DuckDB's native ASOF
    * LEFT JOIN — our union+window idiom must reproduce it exactly.
    * Timestamps compared in integer microseconds on both sides.
    */
  def asOfPurchases(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("ts_us"))
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("ts_ns div 1000").as("p_ts_us"),
        col("event_id").as("p_event_id"),
        col("value").as("p_value"))
    AsOfJoin.backward(ev, purchases, Seq("user_id"), "ts_us", "p_ts_us")
  }

  /** SQL-text entry point: the engine accepts ANSI SQL over registered
    * views (spark.sql), here a TPC-H-Q3-shaped query.
    */
  def sqlEntry(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_orderkey,
        |  CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS revenue_e4,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin)
  }

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`), plus median, per order status.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"),
        round(median(col("o_totalprice")), 4).as("med"))

  /** Salted join (skew utility) — result must equal the plain inner
    * join, so the oracle IS the plain join SQL.
    */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame =
    SkewJoin.saltedInner(
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        Tables.customer(spark, dir)
          .select(col("c_custkey").as("o_custkey"), col("c_name"), col("c_mktsegment")),
        Seq("o_custkey"), saltFactor = 8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_asof_join" -> (asOfPurchases _),
    "q37_sql_entry" -> (sqlEntry _),
    "q38_percentiles" -> (percentiles _),
    "q39_salted_join" -> (saltedJoin _))

  val oracles: Map[String, String] = Map(
    "q36_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |     p AS (SELECT user_id, epoch_us(ts) AS p_ts_us,
        |                  event_id AS p_event_id, "value" AS p_value
        |           FROM events WHERE event_type = 'purchase')
        |SELECT ev.event_id, ev.user_id, ev.ts_us,
        |       p.p_ts_us, p.p_event_id, p.p_value
        |FROM ev ASOF LEFT JOIN p
        |  ON ev.user_id = p.user_id AND ev.ts_us >= p.p_ts_us""".stripMargin,
    "q37_sql_entry" ->
      """SELECT l_orderkey,
        |  CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) AS revenue_e4,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin,
    "q38_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
        |  round(median(o_totalprice), 4) AS med
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q39_salted_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin)
}
