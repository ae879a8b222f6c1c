package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiler: per-stage wall breakdown of one gate query
  * (`runMain graft.tools.StageProf <query> [warmups]`).
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val warm = if (args.length > 1) args(1).toInt else 1
    for (_ <- 1 to warm) graft.SparkEntry.queries(name)(spark, sfDir).count()
    @volatile var on = true
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = if (on) {
        val i = sc.stageInfo
        val ms = for {s <- i.submissionTime; c <- i.completionTime} yield c - s
        println(s"[sp] stage ${i.stageId} tasks=${i.numTasks} wall=${ms.getOrElse(-1L)}ms ${i.name.take(70)}")
      }
    })
    val t0 = System.nanoTime()
    val cnt = graft.SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[sp] TOTAL $name rows=$cnt wall=${(System.nanoTime()-t0)/1e9}%.3f")
    on = false
    spark.stop()
  }
}
