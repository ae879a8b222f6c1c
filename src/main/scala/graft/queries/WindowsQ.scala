package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Analytic window functions beyond the reference's first/last/count/max
  * (SURVEY.md §2: "no ranking/analytic functions" — these complete the
  * surface). Every window here is PARTITIONED (by customer or by year) —
  * no global single-partition windows outside the clinical bug-compat
  * mode; that is the scale rule.
  */
object WindowsQ {

  /** Top-3 orders per customer — row_number with a total (deterministic)
    * tie-break; rank/dense_rank over the PRICE ALONE (r17 review: under
    * the tie-broken ordering no peer rows exist, so rk/drk provably
    * equaled rn and the gate never exercised tie semantics — the very
    * surface these functions were added for). The emitted ROWS stay
    * pinned by rn; rk/drk VALUES are deterministic because peers share
    * them by definition.
    */
  def rankTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val wTies = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(wTies).as("rk"),
        dense_rank().over(wTies).as("drk"))
      .filter(col("rn") <= 3)
  }

  /** lag/lead navigation within each customer's order history. */
  def lagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
        round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2).as("delta_prev"))
  }

  /** Running (cumulative) aggregates per customer. */
  def runningAgg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("run_total"),
        count(lit(1)).over(w).as("run_n"))
  }

  /** ntile / percent_rank / cume_dist within each order-year —
    * DISTRIBUTED (r19 review): the obvious
    * `Window.partitionBy(year)` spelling has only as many partitions
    * as the corpus spans years (~7 here), so at 100 TB one year's
    * billions of orders sort and rank inside a single task — the
    * near-global-window cliff the battery's scale rule exists for.
    * Instead: ONE range-partitioned global rank over (year, price,
    * key) — [[graft.operators.SortedNeighborhood.globalRank]], the
    * same machinery as PrefixScan — then each row's within-year rank
    * is its global rank minus the year's start offset, and the three
    * distribution stats are integer/double arithmetic on (rank, n):
    * the per-year offset table is #years rows, a true broadcast
    * dimension. The ordering key is unique (orderkey breaks price
    * ties), so percent_rank = (rk−1)/(n−1) and cume_dist = rk/n are
    * the tie-free forms, and ntile follows Spark's own
    * first-(n mod b)-buckets-get-one-extra rule — double divisions
    * have the SAME operands the window functions would produce, so
    * results are bit-identical to the window spelling and the DuckDB
    * oracle keeps the plain ntile/percent_rank/cume_dist SQL.
    */
  def distribution(spark: SparkSession, dir: String): DataFrame = {
    val ranked = graft.operators.SortedNeighborhood.globalRank(
      Tables.orders(spark, dir)
        .select(year(col("o_orderdate")).as("y"), col("o_orderkey"),
          col("o_totalprice")),
      Seq(col("y").asc, col("o_totalprice").asc, col("o_orderkey").asc),
      "_g")
      .localCheckpoint(false) // two consumers: offsets + the join back
    val years = ranked.groupBy(col("y"))
      .agg(min(col("_g")).as("_y0"), count(lit(1)).as("_n"))
    ranked.join(broadcast(years), Seq("y"))
      .withColumn("_rk", col("_g") - col("_y0") + 1)
      .select(
        col("y"), col("o_orderkey"),
        // Spark's NTile: q = n div b, r = n mod b; the first r tiles
        // hold q+1 rows
        expr("""CASE WHEN _rk <= (_n % 4) * (_n div 4 + 1)
               |  THEN (_rk - 1) div (_n div 4 + 1) + 1
               |  ELSE _n % 4 + ((_rk - 1) - (_n % 4) * (_n div 4 + 1)) div (_n div 4) + 1
               |END""".stripMargin.replace("\n", " ")).cast("int").as("quartile"),
        round(when(col("_n") === 1, lit(0.0))
          .otherwise((col("_rk") - 1).cast("double") / (col("_n") - 1)), 6)
          .as("pct_rank"),
        round(col("_rk").cast("double") / col("_n"), 6).as("cume"))
  }

  /** RANGE frame: count + sum of each customer's orders in the
    * trailing-30-day value window (as-of-style trailing aggregate).
    */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val days = datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_no"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("day_no", days)
      .select(col("o_custkey"), col("o_orderkey"), col("day_no"),
        count(lit(1)).over(w).as("n_trailing_30d"),
        round(sum(col("o_totalprice")).over(w), 2).as("spend_trailing_30d"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_window_topk" -> (rankTopK _),
    "q26_window_lag_lead" -> (lagLead _),
    "q27_window_running" -> (runningAgg _),
    "q28_window_distribution" -> (distribution _),
    "q29_window_range_frame" -> (rangeFrame _))

  val oracles: Map[String, String] = Map(
    "q25_window_topk" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER w AS INT) AS rn,
        |    CAST(rank() OVER wt AS INT) AS rk,
        |    CAST(dense_rank() OVER wt AS INT) AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
        |         wt AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC))
        |WHERE rn <= 3""".stripMargin,
    "q26_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        |  round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS delta_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin,
    "q27_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER w, 2) AS run_total,
        |  count(*) OVER w AS run_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q28_window_distribution" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY year(o_orderdate) ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,
    "q29_window_range_frame" ->
      """SELECT o_custkey, o_orderkey, day_no,
        |  count(*) OVER w AS n_trailing_30d,
        |  round(sum(o_totalprice) OVER w, 2) AS spend_trailing_30d
        |FROM (SELECT *, CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS INT) AS day_no
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin)
}
