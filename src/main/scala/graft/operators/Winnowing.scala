package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD '03): hash every k-gram, slide a w-window over positions,
  * keep each window's minimum hash; the distinct kept hashes are the
  * document's fingerprints. Guarantee: any match of length ≥ w + k − 1
  * between two documents shares at least one selected print, with an
  * expected density of 2/(w+1) — the local algorithm the paper proves
  * optimal within 33% of the density lower bound.
  *
  * Plan shape: one posexplode pass, one per-document ordered window
  * (partitioned by doc — distributes), one distinct. The hash is
  * deliberately PORTABLE (md5 tail, not xxhash) so the whole operator
  * is reproducible in plain SQL and can sit under the DuckDB hash gate.
  */
object Winnowing {

  /** 60-bit portable k-gram hash: low 15 hex chars of md5 — exactly
    * `CAST('0x' || substr(md5(s), 18, 15) AS BIGINT)` in DuckDB.
    * Computed by the codegen'd [[graft.functions.Md5Low60]] directly
    * from digest bytes (no hex string / substring / base-16 parse per
    * row); WinnowingSpec pins bit-equality with the SQL form.
    */
  def portableHash(s: Column): Column =
    graft.functions.Md5Functions.md5_low60(s)

  /** Contamination check — the decontamination primitive: for every
    * corpus document, how many winnowing prints it shares with the
    * `benchmark` document set. Any verbatim overlap of length
    * ≥ w + k − 1 tokens is guaranteed to surface (the winnowing
    * guarantee), so `n_shared > 0` is a sound screen for benchmark
    * leakage. Plan: two print sets, one broadcast-or-shuffle equi-join
    * on the print hash — never a text×text comparison.
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, k: Int, w: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val corpusPrints = selectedPrints(corpus, k, w, idCol, textCol)
    val benchPrints = selectedPrints(benchmark, k, w, idCol, textCol)
      .select(col("print")).distinct()
    corpusPrints.join(benchPrints, Seq("print"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** (id, print) — the distinct selected fingerprints per document.
    * Documents with fewer than `w` k-grams select nothing (the paper's
    * windows are only defined once w k-grams exist).
    */
  def selectedPrints(docs: DataFrame, k: Int, w: Int,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0 && w > 1)
    val byDocWindow = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), Window.currentRow)
    docs
      .select(col(idCol), posexplode(TextFunctions.shingles(col(textCol), k)).as(Seq("pos", "sh")))
      .withColumn("h", portableHash(col("sh")))
      .withColumn("wmin", min(col("h")).over(byDocWindow))
      .filter(col("pos") >= w - 1)
      .select(col(idCol), col("wmin").as("print"))
      .distinct()
  }
}
