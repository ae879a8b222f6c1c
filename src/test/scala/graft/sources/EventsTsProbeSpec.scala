package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The events timestamp-encoding probe must treat ONLY the
  * TIMESTAMP(NANOS) inference failure as a nanos verdict. Before r8 it
  * caught every Throwable as "nanos", so a missing path or an empty
  * stream directory silently selected the nanos factor and later
  * micros files read as 1970-era timestamps — the exact corruption the
  * probe was added to prevent (advisor finding, round 7).
  */
class EventsTsProbeSpec extends AnyFunSuite with SparkTestSession {

  private val nanosFixture = "fixtures/events_nanos/events.parquet"

  // generated in-test (repo-relative like the nanos fixture, not a
  // host-absolute testdata path): Spark writes TIMESTAMP(MICROS) when
  // told to, which is exactly the encoding the probe must accept
  private lazy val microsFile: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_micros")
    dir.toFile.deleteOnExit()
    val out = dir.resolve("events.parquet").toString
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      import spark.implicits._
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .toDF("event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(out)
    } finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    // a single FILE like the old fixture (several tests Files.copy it)
    import scala.jdk.CollectionConverters._
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get(out))
    try listing.iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get.toString
    finally listing.close()
  }

  test("micros-encoded file probes true") {
    assert(Tables.eventsTsIsMicros(spark, microsFile))
  }

  test("legacy nanos-encoded file probes false") {
    assert(!Tables.eventsTsIsMicros(spark, nanosFixture))
  }

  test("missing path fails fast instead of reading as nanos") {
    val e = intercept[IllegalArgumentException] {
      Tables.eventsTsIsMicros(spark, "/tmp/graft_probe_missing_xyz.parquet")
    }
    assert(e.getMessage.contains("does not exist"))
  }

  test("empty directory fails fast instead of reading as nanos") {
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_empty")
    val e = intercept[IllegalArgumentException] {
      Tables.eventsTsIsMicros(spark, dir.toString)
    }
    assert(e.getMessage.contains("no parquet files"))
  }

  test("homogeneous directory probes per-file and agrees") {
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_homog")
    for (i <- 1 to 2)
      java.nio.file.Files.copy(java.nio.file.Paths.get(microsFile),
        dir.resolve(s"part-$i.parquet"))
    assert(Tables.eventsTsIsMicros(spark, dir.toString))
  }

  test("mixed nanos+micros directory fails loudly, not one arbitrary verdict") {
    val dir = java.nio.file.Files.createTempDirectory("graft_probe_mixed")
    java.nio.file.Files.copy(java.nio.file.Paths.get(microsFile),
      dir.resolve("part-micros.parquet"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(nanosFixture),
      dir.resolve("part-nanos.parquet"))
    val e = intercept[IllegalArgumentException] {
      Tables.eventsTsIsMicros(spark, dir.toString)
    }
    assert(e.getMessage.contains("mixed"))
  }
}
