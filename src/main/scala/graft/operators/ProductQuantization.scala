package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PqFunctions.{pq_adc_dot, pq_encode, pq_table}
import graft.functions.VectorFunctions.cosine_similarity6

/** Product-quantized ANN — the MEMORY-scale path (Jégou et al. 2011).
  *
  * IVF ([[Similarity.ivfTopK]]) cuts how many vectors a query touches;
  * PQ cuts how many BYTES each touched vector costs: a dim-64 float
  * vector (512 B as doubles) becomes m=8 one-byte codes + one norm —
  * a 100 TB embedding corpus becomes a ~2 TB code table that fits the
  * cluster's page cache. Search is asymmetric distance computation:
  * the query stays exact, each corpus vector is represented by its
  * per-subspace nearest centroids, and `dot(q, v) ≈ Σ_j
  * table_q[j][code_v[j]]` — O(m) lookups per pair against a per-QUERY
  * table, never a per-pair O(dim) loop.
  *
  * Spark shape: the codebook (m·ksub·dsub doubles, ~8 KB) is a
  * driver-held artifact like the IVF centers — training is Lloyd
  * rounds where assignment is one codegen'd [[graft.functions.PqEncode]]
  * projection and the mean update is ONE partial-agg groupBy keyed
  * (subspace, code, pos) covering all m subspaces in a single pass
  * (not m separate k-means jobs). The encoded index is a DataFrame
  * (corpus_id, codes, vnorm) — the artifact a deployment writes once
  * and scans instead of the raw vectors; queries broadcast with their
  * precomputed ADC tables.
  */
object ProductQuantization {

  /** The trained codebook artifact. `centers` is flat: subspace j's
    * centroid c at `[(j·ksub + c)·dsub, +dsub)`.
    */
  final case class Codebook(m: Int, ksub: Int, dsub: Int, centers: Array[Double]) {
    def isEmpty: Boolean = centers.isEmpty
  }

  private def asVec(vecCol: String): Column = col(vecCol).cast("array<double>")

  private def l2norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), _ + _))

  /** Train per-subspace centroids: deterministic seed sample + Lloyd
    * rounds (same contract as [[Similarity.kmeansCenters]] — centers
    * live on the driver between rounds; corpora smaller than ksub
    * cycle their seeds, ties resolve to the lowest code).
    */
  def train(corpus: DataFrame, m: Int = 8, ksub: Int = 16, lloydIters: Int = 2,
            idCol: String = "vec_id", vecCol: String = "embedding"): Codebook = {
    // NULL embeddings never seed (r18 review: a null vector hashing
    // into the first ksub rows NPE'd the collect; in the Lloyd rounds
    // nulls already drop — posexplode generates nothing and pq_encode
    // codes to null → filtered)
    val c = corpus.select(col(idCol).as("id"), asVec(vecCol).as("v"))
      .filter(col("v").isNotNull)
    val seeds = c.orderBy(xxhash64(col("id")).asc, col("id").asc).limit(ksub)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    if (seeds.isEmpty) return Codebook(m, ksub, 0, Array.empty)
    val dim = seeds(0).length
    // mixed dims fail LOUDLY here, not as an AIOOBE deep in the seed
    // cycle (pq_encode's convention; r18 review)
    val badDim = seeds.find(_.length != dim)
    require(badDim.isEmpty,
      s"pq: corpus mixes embedding dims (${badDim.get.length} vs $dim)")
    require(dim % m == 0, s"pq: dim $dim not divisible by m=$m")
    val dsub = dim / m
    var centers = Array.ofDim[Double](m * ksub * dsub)
    for (code <- 0 until ksub; j <- 0 until m; i <- 0 until dsub)
      centers((j * ksub + code) * dsub + i) = seeds(code % seeds.length)(j * dsub + i)
    for (_ <- 1 to lloydIters) {
      val j = (col("pos") / dsub).cast("int")
      val means = c
        .select(pq_encode(col("v"), centers, m, ksub).as("codes"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .select(j.as("j"), element_at(col("codes"), j + 1).as("code"),
          col("pos"), col("x"))
        .filter(col("code") >= 0)
        .groupBy(col("j"), col("code"), col("pos")).agg(avg(col("x")).as("mu"))
        .collect()
      // empty cells keep their previous centroid
      val next = centers.clone()
      means.foreach { r =>
        val sj = r.getInt(0); val code = r.getInt(1); val pos = r.getInt(2)
        next((sj * ksub + code) * dsub + (pos - sj * dsub)) = r.getDouble(3)
      }
      centers = next
    }
    Codebook(m, ksub, dsub, centers)
  }

  /** The encoded index: (corpus_id, codes, vnorm) — what a deployment
    * persists and scans in place of the raw vectors.
    */
  def encodedIndex(corpus: DataFrame, cb: Codebook,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("corpus_id"),
      pq_encode(asVec(vecCol), cb.centers, cb.m, cb.ksub).as("codes"),
      l2norm(asVec(vecCol)).as("vnorm"))

  /** ADC top-k by estimated cosine for each query: queries broadcast
    * with their per-query lookup tables; one scan of the code table;
    * per-query top-k is the same WindowGroupLimit window as the exact
    * path — no global sort.
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, k: Int, cb: Codebook,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val idx = encodedIndex(corpus, cb, idCol, vecCol)
    val q = queries.select(col(idCol).as("query_id"), asVec(vecCol).as("qv"))
      .select(col("query_id"),
        pq_table(col("qv"), cb.centers, cb.m, cb.ksub).as("tbl"),
        l2norm(col("qv")).as("qnorm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est").desc, col("corpus_id").asc)
    // Unsearchable rows are excluded DETERMINISTICALLY before the
    // estimate: zero-norm vectors (est would be ±Infinity) and NaN
    // codes (encode emits −1 → est NaN). NOTE this is an engine
    // semantic, not oracle parity — an exact-cosine oracle ranks a NaN
    // sim FIRST under desc ordering; the gate fixture carries no such
    // rows, and EmptyInputSpec pins the exclusion behavior.
    idx.filter(col("vnorm") > 0.0)
      .join(broadcast(q.filter(col("qnorm") > 0.0)),
        col("corpus_id") =!= col("query_id"))
      .withColumn("est",
        pq_adc_dot(col("tbl"), col("codes"), cb.ksub) / (col("qnorm") * col("vnorm")))
      .filter(!isnan(col("est")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"),
        round(col("est"), 6).as("est"), col("rn"))
  }

  /** ADC shortlist + exact re-rank — the production arrangement: the
    * code-table scan nominates `shortlist` candidates per query (O(m)
    * per pair over 16-byte rows), and only those re-join the raw
    * vectors for exact cosine ranking (shortlist·|queries| rows — the
    * expensive fetch is bounded regardless of corpus size). Uniform
    * random vectors are PQ's worst case (raw ADC recall@5 ≈ 0.3-0.6 on
    * this fixture); the re-ranked form measures recall 1.0 at
    * m=16/ksub=256/shortlist=20·k, which is what lets q97 sit under the
    * FULL hash gate against the exact-top-k oracle. Output schema and
    * tie-break match [[Similarity.bruteForceTopK]] exactly (round-6
    * sim DESC, corpus_id ASC).
    */
  def adcRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int, cb: Codebook,
                    shortlist: Int = 0,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val r = if (shortlist > 0) shortlist else math.max(20 * k, 100)
    val cand = adcTopK(corpus, queries, r, cb, idCol, vecCol)
      .select(col("query_id"), col("corpus_id"))
    // fused cosine kernel, deliberately (r19): the parts-cosine
    // precompute regressed here (q97 CPU 3.2→3.7-5.0 s) — the
    // shortlist join's row machinery dominates, not the cosine
    val cv = corpus.select(col(idCol).as("corpus_id"), asVec(vecCol).as("cv"))
    val qv = queries.select(col(idCol).as("query_id"), asVec(vecCol).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("corpus_id").asc)
    cand
      .join(cv, Seq("corpus_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("sim", cosine_similarity6(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("sim"), col("rn"))
  }
}
