package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Core relational operators over the driver's TPC-H-ish test tables.
  *
  * Each query has a DuckDB oracle in this module's own `oracles` map (consumed via `SparkEntry.modules`); column names
  * and value rounding match the oracle exactly (the driver sorts columns
  * by name and hashes values).
  *
  * Scale notes are inline per query — every plan here is shuffle-minimal:
  * dimension joins broadcast, aggregations pre-aggregate map-side (Spark
  * hash aggregate does partial agg automatically), filters/projections
  * reach the parquet scan.
  */
object Relational {

  /** Pricing-summary aggregate (reference op #11-style windowed count is
    * covered in Windows; this is the groupBy().agg() summary layer from
    * SURVEY.md §7.5). Map-side partial aggregation → tiny shuffle (few
    * groups), safe at any scale.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (q1Agg _))

  val oracles: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
}
