package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streaming

/** Structured Streaming under the driver's hash gate.
  *
  * The streaming operators' correctness otherwise rests only on
  * batch-twin ScalaTest comparisons; this entry runs the REAL streaming
  * path — readStream → watermark → stateful windowed aggregation →
  * memory sink — over a bounded copy of the events table, then lets the
  * driver hash-compare the emitted result against DuckDB computing the
  * same tumbling windows in SQL. Window bounds go out as epoch seconds
  * (5-minute aligned, so the cast is exact) to dodge timestamp-unit
  * skew between parquet writers.
  */
object StreamQ {

  // file-source streams read a DIRECTORY: stage the single events
  // parquet once per source dir for the whole JVM — both gate entries
  // (and their warm/timed bench runs) share the copy
  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def stagedEvents(dir: String): String =
    staged.computeIfAbsent(dir, d => {
      val stage = Files.createTempDirectory("graft_stream_gate")
      stage.toFile.deleteOnExit()
      Files.copy(Paths.get(d, "events.parquet"),
        stage.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
      stage.toString
    })

  /** 5-minute tumbling counts per event type, via the streaming engine. */
  def streamWindowedCounts(spark: SparkSession, dir: String): DataFrame = {
    val res = Streaming.runToMemory(
      Streaming.windowedCounts(Streaming.eventStream(spark, stagedEvents(dir))),
      name = "q66_stream_windowed_counts_mem",
      mode = OutputMode.Complete,
      skipNoDataBatch = true)
    res.select(
      col("window_start").cast("long").as("window_start_epoch"),
      col("window_end").cast("long").as("window_end_epoch"),
      col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming stateful dedup under the gate: dropDuplicatesWithinWatermark
    * over the bounded stream (one micro-batch → dedup state covers the
    * whole input → exact distinct), projected to the dedup KEY columns
    * so the surviving representative's identity cannot matter.
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val res = Streaming.runToMemory(
      Streaming.dedupWithinWatermark(Streaming.eventStream(spark, stagedEvents(dir))),
      name = "q73_stream_dedup_mem",
      mode = OutputMode.Append,
      skipNoDataBatch = true)
    res.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_unique"),
        round(sum(col("value")), 2).as("unique_value_sum"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_stream_windowed_counts" -> (streamWindowedCounts _),
    "q73_stream_dedup" -> (streamDedup _))

  val oracles: Map[String, String] = Map(
    "q73_stream_dedup" ->
      """WITH u AS (SELECT DISTINCT user_id, event_type, "value" FROM events)
        |SELECT user_id, count(*) AS n_unique,
        |  round(sum("value"), 2) AS unique_value_sum
        |FROM u GROUP BY user_id""".stripMargin,
    "q66_stream_windowed_counts" ->
      """SELECT
        |  CAST(epoch_us(ts) // 300000000 * 300 AS BIGINT) AS window_start_epoch,
        |  CAST(epoch_us(ts) // 300000000 * 300 + 300 AS BIGINT) AS window_end_epoch,
        |  event_type, count(*) AS n, round(sum("value"), 2) AS total_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin)
}
