package graft.tools

/** Generates the QUERIES.md index table from the live registry (no
  * Spark session — pure reflection over the module maps).
  */
object QIndex {
  def main(args: Array[String]): Unit = {
    // the ONE module list — SparkEntry's own (r11: this file kept a
    // hand copy that only a size check guarded)
    val modules = graft.SparkEntry.modules
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
