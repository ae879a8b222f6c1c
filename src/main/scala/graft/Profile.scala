package graft

import org.apache.spark.sql.SparkSession

/** Local profiling harness: run selected queries repeatedly in one warm
  * JVM (`runMain graft.Profile q43,q54 [reps]`) — Bench's per-battery
  * numbers include cold-start; this isolates steady-state time.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
