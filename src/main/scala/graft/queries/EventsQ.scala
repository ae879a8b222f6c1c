package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Event-log analytics over the `events` table: semi-structured (JSON)
  * extraction, time bucketing, and gap-based sessionization. These are
  * the batch shapes of the streaming module ([[graft.streaming]]) —
  * identical logic, bounded input.
  */
object EventsQ {

  /** JSON extraction from the props column + grouped aggregate. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))

  /** Tumbling 1-hour buckets per event type. At scale this is the
    * pre-aggregation shape: map-side partial agg per (bucket, type), tiny
    * shuffle.
    */
  def timeBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("hour_epoch", unix_timestamp(date_trunc("hour", col("ts"))))
      .groupBy(col("hour_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))

  /** Gap-based sessionization (gap > 30 min ⇒ new session), the
    * lag-flag-cumsum idiom, then per-user session stats. The batch twin
    * of streaming `flatMapGroupsWithState` sessionization.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val sess = Window.partitionBy(col("user_id"), col("session_id"))
    Tables.events(spark, dir)
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(byUser))
      .withColumn("new_sess", when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("sess_events", count(lit(1)).over(sess))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("total_events"),
        max(col("sess_events")).as("max_session_events"))
  }

  /** Per-type event share. The denominator is a global scalar joined
    * back via broadcast-on-constant-key — NOT an unpartitioned window
    * over the grouped result: a Window over Exchange SinglePartition is
    * the exact plan shape that melts on unbounded key cardinality, and
    * PlanContractSpec bans it battery-wide. (A global scalar AGGREGATE
    * still single-partitions — one partial row per task, which is fine
    * and unavoidable.)
    */
  def typeShare(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_total"))
    counts.crossJoin(broadcast(total))
      .select(col("event_type"), col("n"),
        round(col("n") / col("_total"), 6).as("share"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_json_extract" -> (jsonExtract _),
    "q33_time_buckets" -> (timeBuckets _),
    "q34_sessionize" -> (sessionize _),
    "q35_type_share" -> (typeShare _))

  val oracles: Map[String, String] = Map(
    "q32_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
        |  count(*) AS n, round(sum("value"), 2) AS total_value
        |FROM events GROUP BY 1""".stripMargin,
    "q33_time_buckets" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |  event_type, count(*) AS n, round(sum("value"), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q34_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM g),
        |sid AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM s),
        |se AS (
        |  SELECT *, count(*) OVER (PARTITION BY user_id, session_id) AS sess_events
        |  FROM sid)
        |SELECT user_id, max(session_id) AS n_sessions, count(*) AS total_events,
        |  max(sess_events) AS max_session_events
        |FROM se GROUP BY user_id""".stripMargin,
    "q35_type_share" ->
      """WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
        |SELECT event_type, n, round(n / CAST(sum(n) OVER () AS DOUBLE), 6) AS share
        |FROM c""".stripMargin)
}
