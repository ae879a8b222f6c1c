package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTestSession
import graft.queries.EventsQ

/** Streaming results must agree with their batch twins on bounded
  * input — the bounded parquet is replayed as a file stream into a
  * memory sink.
  */
class StreamingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** File streams need a DIRECTORY of files; stage the single parquet
    * into one (under target/, inside the repo).
    */
  private lazy val streamDir: String = {
    val d = java.nio.file.Paths.get("target/tmp/events_stream")
    java.nio.file.Files.createDirectories(d)
    val dst = d.resolve("events.parquet")
    if (!java.nio.file.Files.exists(dst))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), dst)
    d.toString
  }

  test("windowed counts (complete mode) match the batch 5-minute buckets") {
    val stream = Streaming.windowedCounts(Streaming.eventStream(spark, streamDir))
    val got = Streaming.runToMemory(stream, "wc", OutputMode.Complete())
      .select(unix_timestamp($"window_start").as("bucket"), $"event_type", $"n", $"total_value")
      .orderBy($"bucket", $"event_type")
      .collect().toSeq

    val exp = graft.sources.Tables.events(spark, dir)
      .withColumn("bucket", (unix_timestamp($"ts") - pmod(unix_timestamp($"ts"), lit(300))))
      .groupBy($"bucket", $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .orderBy($"bucket", $"event_type")
      .collect().toSeq

    assert(got == exp)
  }

  test("sliding windows emit two rows per event (10min window, 5min slide)") {
    val stream = Streaming.slidingRates(Streaming.eventStream(spark, streamDir))
    val got = Streaming.runToMemory(stream, "sr", OutputMode.Complete())
    val totalEvents = graft.sources.Tables.events(spark, dir).count()
    assert(got.agg(sum($"n")).as[Long].collect()(0) == totalEvents * 2)
  }

  test("windowed distinct-user sketches stay within bound of the batch exact counts") {
    val stream = Streaming.windowedDistinctUsers(Streaming.eventStream(spark, streamDir))
    val got = Streaming.runToMemory(stream, "wdu", OutputMode.Complete())
      .select(unix_timestamp($"window_start").as("bucket"), $"event_type", $"approx_users")
    val exact = graft.sources.Tables.events(spark, dir)
      .withColumn("bucket", (unix_timestamp($"ts") - pmod(unix_timestamp($"ts"), lit(300))))
      .groupBy($"bucket", $"event_type")
      .agg(countDistinct($"user_id").as("exact_users"))
    val bad = got.join(exact, Seq("bucket", "event_type"), "full")
      .filter($"approx_users".isNull || $"exact_users".isNull ||
        abs($"approx_users" - $"exact_users") > greatest(lit(2.0), $"exact_users" * 0.05))
      .count()
    assert(bad == 0L, s"$bad windows outside the HLL bound (or unmatched)")
  }

  test("streaming sessionization closes exactly the batch sessions minus the open one per user") {
    val stream = Streaming.sessionize(Streaming.eventStream(spark, streamDir))
    val got = Streaming.runToMemory(stream.toDF(), "sess", OutputMode.Append())
      .groupBy($"user_id").agg(count(lit(1)).as("n_closed"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val batch = EventsQ.sessionize(spark, dir)
      .select($"user_id", $"n_sessions")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // single-file input = single micro-batch: every session except each
    // user's last closes inside the batch; the last one ALSO closes iff
    // the final watermark (max ts - 10min) passes its last event + gap
    batch.foreach { case (u, n) =>
      val closed = got.getOrElse(u, 0L)
      assert(closed == n - 1 || closed == n,
        s"user $u: closed $closed vs batch sessions $n")
    }
    // and at least one of each outcome must occur in this dataset
    assert(batch.exists { case (u, n) => got.getOrElse(u, 0L) == n })
    assert(batch.exists { case (u, n) => got.getOrElse(u, 0L) == n - 1 })
  }

  test("stream-stream interval join matches the batch interval join") {
    val stream = Streaming.purchasesWithRecentClicks(Streaming.eventStream(spark, streamDir))
    val got = Streaming.runToMemory(stream, "ssj", OutputMode.Append())
      .select($"p_id", $"c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = graft.sources.Tables.events(spark, dir)
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"ts".as("p_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
    val exp = p.join(c, $"user_id" === $"c_user" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") && $"c_ts" <= $"p_ts")
      .select($"p_id", $"c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("streaming dedup within watermark removes in-window duplicates") {
    val stream = Streaming.dedupWithinWatermark(Streaming.eventStream(spark, streamDir))
      .select($"event_id", $"user_id", $"event_type", $"value")
    val got = Streaming.runToMemory(stream, "dd", OutputMode.Append())
    val total = graft.sources.Tables.events(spark, dir).count()
    val distinctKeys = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"value").distinct().count()
    // single micro-batch ⇒ all duplicates are in-window: exactly one
    // survivor per key
    assert(got.count() == distinctKeys)
    assert(got.count() <= total)
    assert(got.select($"user_id", $"event_type", $"value").distinct().count() == got.count())
  }

  test("sessionize under cross-batch late events: backward extension, below-watermark drop, no timeout crash") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000L * 1000000 // us
    val min = 60L * 1000 * 1000
    def row(u: Long, us: Long, v: Double) =
      (u, new java.sql.Timestamp(us / 1000), us * 1000, v)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val df = mem.toDF.toDF("user_id", "ts", "ts_ns", "value")
    val q = Streaming.sessionize(df).toDF().writeStream.format("memory")
      .queryName("sess_late").outputMode("append").start()
    try {
      // b1: user 1 at T; user 2 at T+5m -> watermark after b1 = T-5m
      mem.addData(row(1, base, 1.0), row(2, base + 5 * min, 1.0))
      q.processAllAvailable()
      // b2: user 1 late by 3m (inside the watermark: must extend the
      // session BACKWARD, never regress its end) and late by 2h
      // (below the watermark: must be DROPPED, not crash the query
      // with a below-watermark setTimeoutTimestamp)
      mem.addData(row(1, base - 3 * min, 1.0), row(1, base - 120 * min, 9.0))
      q.processAllAvailable()
      // two more batches: the first raises the max event time, the
      // second runs with the raised watermark and fires the timeout
      mem.addData(row(2, base + 300 * min, 1.0))
      q.processAllAvailable()
      mem.addData(row(2, base + 301 * min, 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_late").filter($"user_id" === 1L)
        .select($"start_us", $"end_us", $"n_events", $"total_value").collect()
      assert(out.length == 1, s"user 1 must emit exactly one session: ${out.toSeq}")
      val r = out.head
      assert(r.getLong(0) == base - 3 * min,
        "the late in-watermark event extends the session start backward")
      assert(r.getLong(1) == base,
        "the session end must not regress to a late event's timestamp")
      assert(r.getLong(2) == 2 && r.getDouble(3) == 2.0,
        "the below-watermark event is dropped, the in-watermark one merged")
    } finally q.stop()
  }

  test("an all-late batch re-arms the session timeout instead of disarming it (r18)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000L * 1000000
    val min = 60L * 1000 * 1000
    def row(u: Long, us: Long, v: Double) =
      (u, new java.sql.Timestamp(us / 1000), us * 1000, v)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val df = mem.toDF.toDF("user_id", "ts", "ts_ns", "value")
    val q = Streaming.sessionize(df).toDF().writeStream.format("memory")
      .queryName("sess_disarm").outputMode("append").start()
    try {
      // b1: user 1 opens a session (timeout armed); user 2 keeps the
      // watermark advancing later
      mem.addData(row(1, base, 1.0), row(2, base + 6 * min, 1.0))
      q.processAllAvailable()
      // b2: user 1's ONLY row is below the watermark — every row
      // late-dropped. Spark resets the stored timeout on each function
      // invocation, so skipping the re-arm here silently disarmed the
      // open session (it would then never emit — the state leak)
      mem.addData(row(1, base - 120 * min, 9.0))
      q.processAllAvailable()
      // advance the watermark past user 1's gap; the re-armed timeout
      // must fire and emit the session
      mem.addData(row(2, base + 50 * min, 1.0))
      q.processAllAvailable()
      mem.addData(row(2, base + 51 * min, 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_disarm").filter($"user_id" === 1L)
        .select($"start_us", $"end_us", $"n_events").collect()
      assert(out.length == 1,
        s"user 1's session must still emit after an all-late batch: ${out.toSeq}")
      assert(out.head.getLong(0) == base && out.head.getLong(1) == base &&
        out.head.getLong(2) == 1L)
    } finally q.stop()
  }

  test("session outputs respect the 30-minute gap invariant") {
    val stream = Streaming.sessionize(Streaming.eventStream(spark, streamDir))
    val rows = Streaming.runToMemory(stream.toDF(), "sess2", OutputMode.Append())
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getLong(3) >= 1)
    }
  }
}
