package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streaming

/** Throwaway profiler: per-batch duration breakdown for the streaming
  * gate queries (`runMain graft.tools.StreamProf`).
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val ms = for {s <- i.submissionTime; c <- i.completionTime} yield c - s
        println(s"[sp]   stage ${i.stageId} tasks=${i.numTasks} wall=${ms.getOrElse(-1L)}ms ${i.name.take(60)}")
      }
    })
    val stage = java.nio.file.Files.createTempDirectory("sp_ev")
    java.nio.file.Files.copy(java.nio.file.Paths.get(sfDir, "events.parquet"),
      stage.resolve("events.parquet"))
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      Streaming.runToMemory(
        Streaming.windowedCounts(Streaming.eventStream(spark, stage.toString)),
        name = s"sp_$r", mode = OutputMode.Complete)
      println(f"[sp] run$r total=${(System.nanoTime()-t0)/1e9}%.3f")
    }
    spark.stop()
  }
}
