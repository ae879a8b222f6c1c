import org.apache.spark.sql.SparkSession
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    for (n <- names; q = graft.SparkEntry.queries.filter(_._1.contains(n)).head;
         r <- 1 to reps) {
      val t0 = System.nanoTime()
      q._2(spark, sfDir).count()
      println(f"[prof] ${q._1} run$r ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
