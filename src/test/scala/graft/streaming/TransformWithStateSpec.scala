package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestSession
import scala.jdk.CollectionConverters._

/** The transformWithState running-mean monitor: cross-batch state is
  * the part the driver gate (single-batch bounded input) cannot see —
  * split the same events over TWO files, replay as two micro-batches
  * (maxFilesPerTrigger=1), and the per-user LAST emitted row must
  * equal the single-batch answer: ValueState carried count/sum/flags
  * across the batch boundary.
  */
class TransformWithStateSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val rocks = Map("spark.sql.streaming.stateStore.providerClass" ->
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  private def mkDir(name: String): java.nio.file.Path = {
    val d = java.nio.file.Paths.get(s"target/tmp/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d.toFile)
    java.nio.file.Files.createDirectories(d)
    d
  }

  // (user, ts_us, id, value): user 1 values 1,2,3,4 -> exceeds prior
  // mean at 2 (2>1), 3 (3>1.5), 4 (4>2) = 3; user 2 flat -> 0
  private val rows = Seq(
    (1L, 1000L, 1L, 1.00), (1L, 2000L, 2L, 2.00),
    (1L, 3000L, 3L, 3.00), (1L, 4000L, 4L, 4.00),
    (2L, 1000L, 5L, 5.00), (2L, 2000L, 6L, 5.00), (2L, 3000L, 7L, 5.00))

  /** Stage one batch as a single TOP-LEVEL parquet file (the file
    * stream source lists plain files) with an explicit, strictly
    * increasing mtime — the source processes files in mtime order, and
    * two files written back-to-back can otherwise share a timestamp.
    */
  private def writeEvents(dir: java.nio.file.Path, part: Seq[(Long, Long, Long, Double)],
      file: String, mtimeMs: Long): Unit = {
    val tmp = dir.resolve(s"_tmp_$file")
    part.toDF("user_id", "ts_us", "event_id", "value")
      .select(col("event_id"), (col("ts_us") * 1000).as("ts"), col("user_id"),
        lit("click").as("event_type"), col("value"), lit("{}").as("props"))
      .coalesce(1).write.parquet(tmp.toString)
    val partFile = java.nio.file.Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val dst = dir.resolve(s"$file.parquet")
    java.nio.file.Files.copy(partFile, dst)
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  private def lastPerUser(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] = {
    // memory sink preserves arrival order; later batches append after
    // earlier ones, so "last row per user" = state after final batch
    df.collect().zipWithIndex
      .groupBy(_._1.getLong(0))
      .map { case (u, rs) =>
        val r = rs.maxBy(_._2)._1
        u -> (r.getLong(1), r.getLong(2), r.getLong(3))
      }
  }

  test("state carries across micro-batches (two files == one file)") {
    val twoDir = mkDir("tws_two")
    // split mid-user-1 so the running fold MUST resume from state
    writeEvents(twoDir, rows.take(2) ++ rows.slice(4, 6), "a", 1000000L)
    writeEvents(twoDir, rows.slice(2, 4) ++ rows.slice(6, 7), "b", 2000000L)
    val oneDir = mkDir("tws_one")
    writeEvents(oneDir, rows, "all", 1000000L)

    def run(dir: java.nio.file.Path, name: String) = lastPerUser(
      Streaming.runToMemory(
        Streaming.runningMeanExceedance(Streaming.eventStream(spark, dir.toString)).toDF(),
        name, OutputMode.Append, skipNoDataBatch = true, extraConfs = rocks))

    val two = run(twoDir, "tws_two_mem")
    val one = run(oneDir, "tws_one_mem")
    assert(two == one)
    assert(two(1L) == ((4L, 1000L, 3L)))
    assert(two(2L) == ((3L, 1500L, 0L)))
  }

  test("ties do not count as exceedance and order is (ts, event_id)") {
    val d = mkDir("tws_tie")
    // same ts: event_id breaks the tie -> order is (10, id=1, v=2), (10, id=2, v=2):
    // second equals running mean exactly -> not above
    writeEvents(d, Seq((9L, 10L, 1L, 2.00), (9L, 10L, 2L, 2.00)), "a", 1000000L)
    val got = lastPerUser(Streaming.runToMemory(
      Streaming.runningMeanExceedance(Streaming.eventStream(spark, d.toString)).toDF(),
      "tws_tie_mem", OutputMode.Append, skipNoDataBatch = true, extraConfs = rocks))
    assert(got(9L) == ((2L, 400L, 0L)))
  }
}
