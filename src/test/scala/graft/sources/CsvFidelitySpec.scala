package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** The q110 gate's fixture corpus carries no hostile characters, so
  * write/read option asymmetry would pass it silently — this spec is
  * the teeth: byte-faithful roundtrip of quotes, embedded newlines,
  * backslashes, edge whitespace, commas, and unicode through
  * [[Sinks.csv]] + the matching reader options.
  */
class CsvFidelitySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("hostile text roundtrips byte-faithfully through the CSV sink") {
    val rows = Seq(
      (1L, """he said "hi" and left"""),
      (2L, "line one\nline two\nline three"),
      (3L, """back\slash and trailing \"""),
      (4L, "  leading and trailing  "),
      (5L, "comma, separated, values"),
      (6L, "unicode: 中文 «guillemets» emoji-less"),
      (7L, "quote-then-newline \"\nnext"),
      (8L, ""),
      (9L, "\ttab\tstops\t"))
    val df = rows.toDF("id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv_fidelity")
    Sinks.csv(df, s"$tmp/t")
    val back = spark.read
      .schema("id LONG, text STRING")
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(s"$tmp/t")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    rows.foreach { case (id, text) =>
      assert(back(id) == text, s"row $id mangled: ${back(id)}")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }
}
