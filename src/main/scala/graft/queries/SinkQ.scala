package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.{Sinks, Tables}

/** The write path under the driver's hash gate. Every other gate entry
  * reads driver-generated parquet; this one exercises the engine's OWN
  * output: project the documents table, write it hive-partitioned by
  * `source` through [[Sinks.parquet]], re-read the written tree with a
  * partition filter (pruned to one directory — SinksSpec asserts the
  * PartitionFilters plan shape), and aggregate. The oracle computes the
  * same aggregate straight from the source table, so a corrupted write
  * (lost rows, mangled values, broken partition layout) breaks the
  * hash match.
  */
object SinkQ {

  def writeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_sink_gate")
    out.toFile.deleteOnExit()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"))
    Sinks.parquet(docs, out.toString, partitionBy = Seq("source"))
    spark.read.parquet(out.toString)
      .filter(col("source") === "src1")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_write_roundtrip" -> (writeRoundtrip _))

  val oracles: Map[String, String] = Map(
    "q81_write_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0))) AS BIGINT) AS total_tokens,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE source = 'src1' GROUP BY lang""".stripMargin)
}
