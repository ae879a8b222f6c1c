package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate aggregates — the sketches a 100 TB engine reaches for
  * when exact distinct/percentile costs a full shuffle of the key
  * space. Sketch values are engine-defined (Spark HLL++ / KLL vs
  * DuckDB's approx implementations differ by design) so these are
  * rows-only entries; SketchSpec bounds their error against the exact
  * answers instead.
  */
object SketchQ {

  /** HyperLogLog++ distinct counts at two precisions + exact, per
    * order status.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        approx_count_distinct(col("o_custkey")).as("approx_customers"),
        approx_count_distinct(col("o_custkey"), rsd = 0.01).as("approx_customers_1pct"),
        countDistinct(col("o_custkey")).as("exact_customers"))

  /** approx_percentile (KLL-style) vs exact interpolated percentile. */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("approx_p"),
        expr("percentile(l_extendedprice, array(0.5, 0.95))").as("exact_p"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_approx_distinct" -> (approxDistinct _),
    "q64_approx_percentiles" -> (approxPercentiles _))

  val oracles: Map[String, String] = Map()  // engine-defined sketches: rows-only
}
