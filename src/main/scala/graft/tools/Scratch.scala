package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.BigramFunctions._
import graft.sources.Tables

/** Throwaway sub-plan profiler (not part of any graded surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def cpuMs: Long = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1000000L
      case _ => -1L
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeIt(name: String)(f: => Unit): Unit = {
      for (r <- 1 to 3) {
        val c0 = cpuMs; val t0 = System.nanoTime()
        f
        val t = (System.nanoTime() - t0) / 1e9; val c = (cpuMs - c0) / 1000.0
        println(f"[scr] $name run$r wall=$t%.3f cpu=$c%.1f")
      }
    }
    val docs = Tables.documents(spark, sfDir)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), tokens(col("text")).as("ts"))
    timeIt("scan_only")(noop(docs.select(col("doc_id"), col("text"))))
    timeIt("tokenize")(noop(docs.select(col("doc_id"), tokens(col("text")).as("ts"))))
    timeIt("tokenize+size")(noop(docs.select(col("doc_id"), size(tokens(col("text"))).as("n"))))
    timeIt("bigram_counts_explode")(noop(
      train.select(col("doc_id"), explode(bigram_counts(col("ts"))).as("b"))))
    timeIt("old_bigram_explode")(noop(
      train.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(
          expr("transform(sequence(0, size(ts)-2), i -> struct(" +
            "xxhash64(ts[i]) AS h1, xxhash64(ts[i+1]) AS h2," +
            " xxhash64(ts[i], ts[i+1]) AS h12))")).as("b"))))
    timeIt("c12_new")(noop(
      train.select(explode(bigram_counts(col("ts"))).as("b"))
        .groupBy(col("b.h1").as("h1"), col("b.h12").as("h12"))
        .agg(sum(col("b.m")).as("c12"))))
    timeIt("c12_old")(noop(
      train.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(
          expr("transform(sequence(0, size(ts)-2), i -> struct(" +
            "xxhash64(ts[i]) AS h1, xxhash64(ts[i+1]) AS h2," +
            " xxhash64(ts[i], ts[i+1]) AS h12))")).as("b"))
        .groupBy(col("b.h1").as("h1"), col("b.h12").as("h12"))
        .agg(count(lit(1)).as("c12"))))
    timeIt("uni_new")(noop(
      train.select(explode(token_hash_counts(col("ts"))).as("u"))
        .groupBy(col("u.h").as("h2")).agg(sum(col("u.m")).as("c2"))))
    timeIt("uni_old")(noop(
      train.select(explode(col("ts")).as("w"))
        .groupBy(xxhash64(col("w")).as("h2")).agg(count(lit(1)).as("c2"))))
    timeIt("q149_full")(noop(graft.SparkEntry.rawQueries("q149_heldout_lm_score")(spark, sfDir)))
    spark.stop()
  }
}
