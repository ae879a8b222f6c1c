package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate aggregates — the sketches a 100 TB engine reaches for
  * when exact distinct/percentile costs a full shuffle of the key
  * space. Sketch values are engine-defined (Spark HLL++ / GK vs
  * DuckDB's approx implementations differ by design), so the gate
  * checks what IS engine-independent: the sketches' published error
  * bounds, emitted as boolean columns the oracle states literally,
  * alongside hash-matched exact answers. SketchSpec asserts the same
  * bounds in-process.
  */
object SketchQ {

  /** HyperLogLog++ distinct counts at two precisions vs exact, per
    * order status — hash-gated with the q64 trick: the sketch VALUES are
    * engine-defined, but their 3σ error bounds are checkable facts the
    * oracle states literally (HLL merge is per-register max —
    * commutative — so the booleans are deterministic under any
    * partitioning), and the exact count is plain SQL.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        approx_count_distinct(col("o_custkey")).as("a_default"),
        approx_count_distinct(col("o_custkey"), rsd = 0.01).as("a_1pct"),
        countDistinct(col("o_custkey")).as("exact_customers"))
      .select(
        col("o_orderstatus"),
        (abs(col("a_default") - col("exact_customers")).cast("double") /
          col("exact_customers") <= 0.05 * 3).as("approx_within_3sigma"),
        (abs(col("a_1pct") - col("exact_customers")).cast("double") /
          col("exact_customers") <= 0.01 * 3).as("approx_1pct_within_3sigma"),
        col("exact_customers"))

  /** approx_percentile (GK summary) vs exact interpolated percentile.
    *
    * Sketch values are engine-defined, so they can't hash-match an
    * oracle directly. Instead the query asserts the sketch's published
    * rank-error guarantee AS a column: with accuracy 10000 the returned
    * value's rank is within n/10000 of target, far inside ±0.005
    * quantile rank — so `approx_pXX between exact quantiles at
    * (p∓0.005)` must be TRUE, and the oracle states TRUE literally.
    * Exact columns follow q38's hash-match discipline
    * (round(,4) ≡ DuckDB round(quantile_cont,4)).
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("ap"),
        expr("percentile(l_extendedprice, array(0.495, 0.5, 0.505, 0.945, 0.95, 0.955))").as("ep"))
      .select(
        col("l_returnflag"),
        element_at(col("ap"), 1)
          .between(element_at(col("ep"), 1), element_at(col("ep"), 3))
          .as("approx_p50_in_bounds"),
        element_at(col("ap"), 2)
          .between(element_at(col("ep"), 4), element_at(col("ep"), 6))
          .as("approx_p95_in_bounds"),
        round(element_at(col("ep"), 2), 4).as("exact_p50"),
        round(element_at(col("ep"), 5), 4).as("exact_p95"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_approx_distinct" -> (approxDistinct _),
    "q64_approx_percentiles" -> (approxPercentiles _))

  val oracles: Map[String, String] = Map(
    "q63_approx_distinct" ->
      """SELECT o_orderstatus,
        |  TRUE AS approx_within_3sigma,
        |  TRUE AS approx_1pct_within_3sigma,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q64_approx_percentiles" ->
      """SELECT l_returnflag,
        |  TRUE AS approx_p50_in_bounds,
        |  TRUE AS approx_p95_in_bounds,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
