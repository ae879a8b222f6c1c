package graft.tools
import org.apache.spark.sql.SparkSession

/** Print a registry query's formatted physical plan — the ".explain
  * the plan you ship" discipline as a one-liner:
  * `runMain graft.tools.QExplain q202_image_near_dups`.
  * Uses the RAW (bench) surface, so the hash-gate's total sort doesn't
  * obscure the operator's own plan.
  */
object QExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.rawQueries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
