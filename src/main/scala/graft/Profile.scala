package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Local profiling harness: run selected queries repeatedly in one warm
  * JVM (`runMain graft.Profile q43,q54 [reps]`) — Bench's per-battery
  * numbers include cold-start; this isolates steady-state time.
  * Honors `SPARK_GRAFT_CPUS` (default 32) so driver-like 4-CPU runs are
  * reproducible, and prints per-job wall times (with callsite) for any
  * job over 100 ms, so an iteration-heavy query's cost decomposes.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId,
          (System.nanoTime(), Option(j.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobStart.remove(j.jobId)
        if (s != null) {
          val dt = (System.nanoTime() - s._1) / 1e9
          if (dt > 0.1) println(f"[job] #${j.jobId}%-4d ${dt}%7.3f s  ${s._2}")
        }
      }
    })
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    for (n <- names; q <- SparkEntry.queries.filter(_._1.contains(n)).toSeq.sortBy(_._1);
         r <- 1 to reps) {
      val t0 = System.nanoTime()
      q._2(spark, sfDir).count()
      println(f"[prof] ${q._1} run$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
