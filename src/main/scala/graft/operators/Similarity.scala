package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_similarity

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    Query side is broadcast (queries ≪ corpus); the corpus is scanned
  *    once, similarity runs in codegen ([[graft.functions.CosineSimilarity]]),
  *    and per-query top-k is a window over (query, sim) — no global sort.
  *  - [[ivfTopK]]: IVF-style scale path — corpus pre-bucketed by nearest
  *    centroid; queries probe only their `nProbe` closest centroids'
  *    buckets. Recall < 1 by design; the bucket join replaces the full
  *    scan, cutting compared pairs by ~|buckets|/nProbe.
  */
object Similarity {

  /** Exact top-k by cosine for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(cosine_similarity(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("sim"), col("rn"))
  }

  /** K-means-free IVF: centroids are a deterministic sample of the
    * corpus itself (every `stride`-th vector by id — at 100 TB you'd run
    * a few k-means rounds instead; the plan shape is identical).
    * Each corpus vector is assigned to its nearest centroid at build;
    * each query probes its `nProbe` nearest centroids' buckets.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, stride: Int = 50,
              nProbe: Int = 3, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val centroids = c.filter(col("corpus_id") % stride === 0)
      .select(col("corpus_id").as("centroid_id"), col("cv").as("centv"))

    // corpus→centroid assignment (broadcast centroids, 1 row kept per vector)
    val wAssign = Window.partitionBy(col("corpus_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val assigned = c.join(broadcast(centroids), lit(true))
      .withColumn("csim", cosine_similarity(col("cv"), col("centv")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("corpus_id"), col("cv"), col("centroid_id"))

    // query→nProbe centroids
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("centroid_id").asc)
    val probes = q.join(broadcast(centroids), lit(true))
      .withColumn("qsim", cosine_similarity(col("qv"), col("centv")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id"))

    // search only probed buckets
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    probes.join(assigned, Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", round(cosine_similarity(col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("sim"), col("rn"))
  }

  /** All pairs above a cosine threshold among a bucketed corpus — see
    * [[Dedup.embeddingNearDups]] for the LSH variant; this is the exact
    * within-blocking-key version.
    */
  def thresholdPairs(corpus: DataFrame, blockCol: String, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(blockCol).as("blk"), col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    c.as("a").join(c.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cosine", round(cosine_similarity(col("a.v"), col("b.v")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
