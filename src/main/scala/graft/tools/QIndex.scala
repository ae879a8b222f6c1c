package graft.tools

/** Generates the QUERIES.md index table from the live registry (no
  * Spark session — pure reflection over the module maps).
  */
object QIndex {
  def main(args: Array[String]): Unit = {
    val modules: Seq[(String, Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame], Map[String, String])] = Seq(
      ("Relational", graft.queries.Relational.queries, graft.queries.Relational.oracles),
      ("Joins", graft.queries.Joins.queries, graft.queries.Joins.oracles),
      ("Shapes", graft.queries.Shapes.queries, graft.queries.Shapes.oracles),
      ("WindowsQ", graft.queries.WindowsQ.queries, graft.queries.WindowsQ.oracles),
      ("Clinical", graft.queries.Clinical.queries, graft.queries.Clinical.oracles),
      ("EventsQ", graft.queries.EventsQ.queries, graft.queries.EventsQ.oracles),
      ("TextQ", graft.queries.TextQ.queries, graft.queries.TextQ.oracles),
      ("CurationQ", graft.queries.CurationQ.queries, graft.queries.CurationQ.oracles),
      ("RetrievalQ", graft.queries.RetrievalQ.queries, graft.queries.RetrievalQ.oracles),
      ("EvalQ", graft.queries.EvalQ.queries, graft.queries.EvalQ.oracles),
      ("VectorQ", graft.queries.VectorQ.queries, graft.queries.VectorQ.oracles),
      ("MediaQ", graft.queries.MediaQ.queries, graft.queries.MediaQ.oracles),
      ("AdvancedQ", graft.queries.AdvancedQ.queries, graft.queries.AdvancedQ.oracles),
      ("SummaryQ", graft.queries.SummaryQ.queries, graft.queries.SummaryQ.oracles),
      ("SketchQ", graft.queries.SketchQ.queries, graft.queries.SketchQ.oracles),
      ("StreamQ", graft.queries.StreamQ.queries, graft.queries.StreamQ.oracles),
      ("SinkQ", graft.queries.SinkQ.queries, graft.queries.SinkQ.oracles))
    val rows = for ((mod, qs, os) <- modules; name <- qs.keys.toSeq.sorted) yield {
      val gate = if (os.contains(name)) "full hash" else "rows-only (companion gate)"
      s"| $name | $mod | $gate |"
    }
    require(rows.size == graft.SparkEntry.queries.size,
      s"QIndex module list is stale: ${rows.size} rows vs " +
        s"${graft.SparkEntry.queries.size} registered queries")
    println(s"[qindex] total=${rows.size}")
    // numeric qNN order, not lexicographic (q100 would sort before q10_)
    rows.sortBy { r =>
      val name = r.split('|')(1).trim
      (name.drop(1).takeWhile(_.isDigit).toInt, name)
    }.foreach(println)
  }
}
