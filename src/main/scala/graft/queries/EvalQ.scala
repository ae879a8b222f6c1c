package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixScan
import graft.sources.Tables

/** Evaluation metrics computed AT CORPUS SCALE — the measurement half
  * of a training-data platform: ranking quality of the retrieval stack
  * and classifier quality of any score column, both in exact integer
  * arithmetic so the gate is bit-exact on any engine and any
  * partitioning.
  */
object EvalQ {

  /** q131 — retrieval evaluation (MRR@10, precision@5, recall@10) of
    * the q100 BM25 ranking against CONTAINMENT relevance labels: a doc
    * is relevant to a query iff it contains EVERY query term. Labels
    * derive from the same postings the scorer uses, so the whole
    * benchmark is self-contained and the DuckDB oracle recomputes it
    * end-to-end — a FULL hash gate over ranking-quality numbers, not a
    * planted boolean.
    *
    * Exactness: every metric is a rational with a small known
    * denominator, scaled to millionths by integer division —
    * `1000000 div rank`, `hits·1000000 div 5`, `hits·1000000 div
    * n_relevant` — no float anywhere. Scale shape: the relevant-set
    * count aggregates the full per-doc scored table (never just the
    * top-k), the top-10 cut is the WindowGroupLimit window from q100,
    * and the final join is per-query (3 rows).
    */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val (perDoc, nq) = RetrievalQ.perDocScored(spark, dir,
      probes = RetrievalQ.evalQueries)
    val labeled = perDoc.join(broadcast(nq), Seq("query_id"))
      .withColumn("rel",
        when(col("n_matched_terms") === col("n_query_terms"), 1L).otherwise(0L))
    // ONE windowed pass: rn is computed for every matched doc anyway,
    // so the relevant-set count and the top-10 stats are conditional
    // aggregates over the SAME stream — splitting them into two
    // consumers would execute the whole scoring pipeline twice.
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_millionths").desc, col("doc_id").asc)
    labeled
      .withColumn("rn", row_number().over(w).cast("int"))
      .groupBy(col("query_id")).agg(
        sum(col("rel")).as("n_relevant"),
        sum(when(col("rn") <= 10, col("rel")).otherwise(0L)).as("hits_at_10"),
        sum(when(col("rn") <= 5, col("rel")).otherwise(0L)).as("_hits5"),
        max(when(col("rel") === 1L && col("rn") <= 10, expr("1000000L div rn"))
          .otherwise(0L)).as("rr_micro"))
      .select(col("query_id"), col("n_relevant"), col("hits_at_10"),
        col("rr_micro"),
        expr("_hits5 * 1000000L div 5L").as("p5_micro"),
        when(col("n_relevant") > 0,
            expr("hits_at_10 * 1000000L div n_relevant"))
          .otherwise(0L).as("r10_micro"))
  }

  /** q132 — exact AUC (Mann-Whitney rank-sum) of a score column
    * against a binary label, distributed: here P(len(text) ranks an
    * English doc above a non-English one), i.e. score = n_chars,
    * label = (lang = 'en'). The classic formulation needs a GLOBAL
    * rank — a SinglePartition sort at scale — but grouping by score
    * value first reduces the input to one row per distinct score, and
    * the "negatives below me" term is then a strict-prefix SUM in
    * score order: [[PrefixScan.strictPrefixSum]]'s bucketed scan, no
    * single-task stage anywhere. Ties contribute half, kept exact by
    * working in DOUBLED units: U·2 = Σ_s pos(s)·(2·cumneg_below(s) +
    * neg(s)), and auc_micro = U·2 · 10⁶ div (2·P·N) — pure BIGINT
    * end-to-end, bit-identical on any engine/partitioning.
    */
  def aucExact(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .groupBy(col("n_chars").as("score"))
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("lang") === "en", 0L).otherwise(1L)).as("n_neg"))
    PrefixScan.strictPrefixSum(g, col("score"), col("n_neg"), "cumneg")
      .withColumn("cumneg", coalesce(col("cumneg"), lit(0L)))
      // decimal(38,0) per-row products and quotient (r17 review): the
      // long spelling wrapped once P·N > 4.6e12 (u_times2·1e6 past
      // int64) — far below the stated corpus scale — while DuckDB's
      // HUGEINT kept computing; output columns stay BIGINT (the gate
      // schema), only the intermedates widen
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"),
        sum(expr("cast(n_pos as decimal(38,0)) * (2L * cumneg + n_neg)"))
          .as("_u2"))
      .select(col("n_pos"), col("n_neg"),
        // loud on a u_times2 past int64 (r19 review): Spark's
        // non-ANSI decimal→long cast yields NULL silently where
        // DuckDB's CAST raises — ~2.1e9 docs per class reaches the
        // bound, inside stated scale; matching loud failures beat a
        // silent NULL gate column on one engine
        when(col("_u2") > lit(Long.MaxValue),
            expr(s"raise_error('q132: u_times2 exceeds int64 — " +
              "widen the gate column to decimal')"))
          .otherwise(col("_u2")).cast("long").as("u_times2"),
        // AUC is undefined with an empty class: emit 0 as the stated
        // contract (Spark's div would yield null, DuckDB's // would
        // raise — two different failures instead of one defined answer)
        when(col("n_pos") > 0 && col("n_neg") > 0,
            expr("_u2 * 1000000L div " +
              "(cast(n_pos as decimal(38,0)) * n_neg * 2)"))
          .otherwise(0L).as("auc_micro"))
  }

  /** q145 — leakage-free GroupKFold assignment: every EVENT of a user
    * lands in the fold its USER hashes to (the group-k-fold discipline
    * — splitting by row would leak a user's behavior across
    * train/test, the eval-split analog of q77's contamination rule).
    * Fold = portable sampling hash of user_id mod 5 — deterministic,
    * engine-portable, reproducible on rerun at any scale; the report
    * is one partial-agg pass: per-fold users, events, purchases, and
    * the per-fold event share in millionths.
    */
  def groupKfold(spark: SparkSession, dir: String): DataFrame = {
    val perFold = Tables.events(spark, dir)
      .withColumn("fold",
        pmod(graft.operators.Sampling.bucket(col("user_id"), "fold"), lit(5L))
          .cast("int"))
      .groupBy(col("fold"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
    // n_total = Σ n_events over the ≤5-row aggregate (every event
    // lands in exactly one fold — the bucket never returns NULL), so
    // the total rolls up from perFold's OWN exchange (ReuseExchange
    // dedups the two consumers) instead of a second events scan (r17
    // review; the old separate count branch re-read the table). NOT a
    // partitionBy() window — the no-SinglePartition-window contract
    // holds battery-wide even over 5-row frames.
    val total = perFold.agg(sum(col("n_events")).as("n_total"))
    perFold
      .crossJoin(broadcast(total))
      .select(col("fold"), col("n_users"), col("n_events"),
        col("n_purchases"),
        // quotient decomposition (the abReadout discipline, r17
        // review): never forms n_events·1e6 in int64, exactly equal
        // where both fit
        expr("""(n_events div n_total) * 1000000L
               | + (n_events % n_total) * 1000000L div n_total"""
          .stripMargin).as("share_micro"))
  }

  /** q147 — A/B experiment readout, the composition an experimentation
    * platform runs: deterministic arm assignment by the portable user
    * hash (every rerun and every engine agrees on who is in B),
    * per-arm outcome metrics, and Poisson-bootstrap replicate means
    * (the q143 weights at the USER level — resampling users, not
    * events, because the user is the randomization unit) giving the
    * spread a CI is read from. replicate −1 carries the unweighted
    * actuals. Two partial-agg passes over one events scan; all
    * integers. The mean is the quotient decomposition q·1e6 +
    * (r·1e6 div n) — exactly (purchases_w·1e6) div n but never forming
    * the big product, so the overflow bound is n_users_w ≤ 9.2e12
    * users per arm (the remainder r < n), not the weighted purchase
    * sum the naive form binds on.
    */
  def abReadout(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("purchases"))
      .withColumn("arm",
        pmod(graft.operators.Sampling.bucket(col("user_id"), "exp1"), lit(2L))
          .cast("int"))
    val w = when(col("replicate") === -1, 1L)
      .otherwise(graft.operators.Sampling.poissonWeight(
        graft.operators.Sampling.bucket(
          concat(col("user_id").cast("string"), lit(":"),
            col("replicate").cast("string")), "boot2")))
    perUser
      .select(col("*"),
        explode(array(lit(-1), lit(0), lit(1), lit(2))).as("replicate"))
      .withColumn("w", w)
      .groupBy(col("arm"), col("replicate"))
      .agg(sum(col("w")).as("n_users_w"),
        sum(col("w") * col("purchases")).as("purchases_w"))
      .select(col("arm"), col("replicate"), col("n_users_w"),
        col("purchases_w"),
        when(col("n_users_w") > 0,
            expr("""(purchases_w div n_users_w) * 1000000L
                   | + (purchases_w % n_users_w) * 1000000L div n_users_w"""
              .stripMargin))
          .otherwise(0L).as("mean_purchases_micro"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_retrieval_eval" -> (retrievalEval _),
    "q145_group_kfold" -> (groupKfold _),
    "q147_ab_readout" -> (abReadout _),
    "q132_auc_exact" -> (aucExact _))

  val oracles: Map[String, String] = Map(
    "q147_ab_readout" ->
      s"""WITH pu AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS purchases,
        |    CAST((${OracleSql.bucketSql("user_id", "exp1")})
        |      % 2 AS INT) AS arm
        |  FROM events GROUP BY user_id),
        |r AS (
        |  SELECT pu.*, u.rep AS replicate,
        |    ${OracleSql.bucketSql(
             "CAST(user_id AS VARCHAR) || ':' || CAST(u.rep AS VARCHAR)",
             "boot2")} AS h
        |  FROM pu, unnest([-1, 0, 1, 2]) u(rep)),
        |wt AS (
        |  SELECT arm, replicate, purchases,
        |    CASE WHEN replicate = -1 THEN 1
        |         WHEN h < 367879 THEN 0 WHEN h < 735758 THEN 1
        |         WHEN h < 919698 THEN 2 WHEN h < 981011 THEN 3
        |         WHEN h < 996340 THEN 4 WHEN h < 999405 THEN 5
        |         ELSE 6 END AS w
        |  FROM r)
        |SELECT arm, replicate,
        |  CAST(sum(w) AS BIGINT) AS n_users_w,
        |  CAST(sum(w * purchases) AS BIGINT) AS purchases_w,
        |  CASE WHEN sum(w) > 0
        |    THEN CAST(sum(w * purchases) * 1000000 // sum(w) AS BIGINT)
        |    ELSE 0 END AS mean_purchases_micro
        |FROM wt GROUP BY arm, replicate""".stripMargin,
    "q145_group_kfold" ->
      s"""WITH f AS (
        |  SELECT CAST((${OracleSql.bucketSql("user_id", "fold")})
        |      % 5 AS INT) AS fold,
        |    user_id, event_type
        |  FROM events),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM events)
        |SELECT fold,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchases,
        |  CAST(count(*) * 1000000 // t.n_total AS BIGINT) AS share_micro
        |FROM f, t GROUP BY fold, t.n_total""".stripMargin,
    "q131_retrieval_eval" -> {
      s"""WITH ${RetrievalQ.bm25PerDocCte(RetrievalQ.evalQueries)},
         |labeled AS (
         |  SELECT p.*, CASE WHEN p.n_matched_terms = nq.n_query_terms
         |    THEN 1 ELSE 0 END AS rel
         |  FROM per_doc p JOIN nq ON p.query_id = nq.query_id),
         |n_rel AS (
         |  SELECT query_id, CAST(sum(rel) AS BIGINT) AS n_relevant
         |  FROM labeled GROUP BY query_id),
         |ranked AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY score_millionths DESC, doc_id ASC) AS INT) AS rn
         |  FROM labeled),
         |top_stats AS (
         |  SELECT query_id,
         |    CAST(sum(rel) AS BIGINT) AS hits_at_10,
         |    CAST(sum(CASE WHEN rn <= 5 THEN rel ELSE 0 END) AS BIGINT) AS hits5,
         |    CAST(max(CASE WHEN rel = 1 THEN 1000000 // rn ELSE 0 END) AS BIGINT)
         |      AS rr_micro
         |  FROM ranked WHERE rn <= 10 GROUP BY query_id)
         |SELECT r.query_id, r.n_relevant, t.hits_at_10, t.rr_micro,
         |  CAST(t.hits5 * 1000000 // 5 AS BIGINT) AS p5_micro,
         |  CAST(CASE WHEN r.n_relevant > 0
         |    THEN t.hits_at_10 * 1000000 // r.n_relevant ELSE 0 END AS BIGINT)
         |    AS r10_micro
         |FROM n_rel r JOIN top_stats t ON r.query_id = t.query_id""".stripMargin
    },
    "q132_auc_exact" ->
      """WITH g AS (
        |  SELECT n_chars AS score,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
        |  FROM documents GROUP BY 1),
        |c AS (
        |  SELECT *, CAST(coalesce(sum(n_neg) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS cumneg
        |  FROM g)
        |SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
        |  CAST(sum(n_neg) AS BIGINT) AS n_neg,
        |  CAST(sum(n_pos * (2 * cumneg + n_neg)) AS BIGINT) AS u_times2,
        |  CASE WHEN sum(n_pos) > 0 AND sum(n_neg) > 0
        |    THEN CAST(sum(n_pos * (2 * cumneg + n_neg)) * 1000000
        |      // (2 * sum(n_pos) * sum(n_neg)) AS BIGINT)
        |    ELSE 0 END AS auc_micro
        |FROM c""".stripMargin)
}
