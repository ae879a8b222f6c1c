package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import graft.functions.ShingleFunctions.shingle_hashes_all
import graft.functions.SpanFunctions.remove_dup_spans

/** Cross-document duplicated-span REMOVAL — the purge half of the
  * ExactSubstr family (Lee et al. 2022 §3): q153's report says which
  * token positions sit under a cross-document duplicated k-gram; this
  * operator REWRITES each document with its maximal duplicated runs of
  * ≥ `minSpan` tokens cut — the dedup step RefinedWeb/CCNet pipelines
  * actually run on the corpus.
  *
  * Shape (all evidence gathering is the proven q153 plan):
  *   1. one (position, gram-hash) long per token — text bodies never
  *      leave the scan ([[graft.functions.ShingleHashes]] multiset);
  *   2. gram document-frequency by (doc,h)-rollup → h-rollup, both
  *      map-side partial-aggregating;
  *   3. an h-keyed join marks dup positions (fan-in bounded by gram
  *      document frequency — the q84/q153 contract);
  *   4. dup starts collect per doc (bounded by doc length — a document
  *      already fits in one row) and join back on doc_id;
  *   5. the O(n+|D|) row-local kernel
  *      ([[graft.functions.RemoveDupSpans]]) rebuilds survivors inside
  *      whole-stage codegen.
  * No driver state, no all-pairs, two shuffles keyed on h / doc_id.
  *
  * Documents shorter than k tokens carry no k-gram position and pass
  * through verbatim (a sub-gram document cannot hold a ≥ minSpan ≥ k
  * duplicated run). Rebuilt text is the surviving lowercased tokens
  * space-joined — the tokenizer's normal form, same on the oracle side.
  */
object DupSpanPurge {

  /** (doc_id, source, n_before, n_after, new_text): every input doc,
    * rewritten. `docs` needs (doc_id, source, text).
    */
  def purge(docs: DataFrame, k: Int, minSpan: Int): DataFrame = {
    require(k >= 1 && minSpan >= k)
    purgeWithPositions(docs,
      docs.select(col("doc_id"), tokens(col("text")).as("ts"))
        .filter(size(col("ts")) >= k)
        .select(col("doc_id"),
          posexplode(shingle_hashes_all(col("ts"), k)).as(Seq("pos", "h"))),
      k, minSpan)
  }

  /** [[purge]] with the (doc_id, pos, h) position stream supplied by
    * the caller — the r13 family promotion: at scale the ExactSubstr
    * evidence stream is a WRITTEN table beside the corpus (the Lee et
    * al. suffix-array analogue), built once and consumed by the report
    * (q153) and the purge (q199/q200) alike instead of re-tokenized per
    * consumer. `positions` must cover exactly the docs with ≥ k tokens
    * (the [[purge]] convention — shorter docs pass through verbatim).
    */
  def purgeWithPositions(docs: DataFrame, positions: DataFrame,
                         k: Int, minSpan: Int): DataFrame = {
    require(k >= 1 && minSpan >= k)
    // NULL text tokenizes to an EMPTY array, not NULL (r16 review
    // finding): a null `ts` would null-propagate through
    // remove_dup_spans and size(), so the row came back reshaped —
    // n_before/n_after NULL (silently poisoning sum() rollups) and
    // new_text '' where the input was NULL. Empty-array semantics
    // give the verbatim pass-through the scaladoc promises:
    // n_before = n_after = 0, new_text = ''
    val toks = docs.select(col("doc_id"), col("source"),
      coalesce(tokens(col("text")), array().cast("array<string>")).as("ts"))
    val pos = positions.select(col("doc_id"), col("pos"), col("h"))
    // distinct (doc, h) first so the h-rollup counts DOCUMENT
    // frequency; both layers partial-aggregate map-side
    val nd = pos.groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("h")).agg(count(lit(1)).as("nd"))
    val dupStarts = pos.join(nd.filter(col("nd") >= 2).select(col("h")), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pos"))).as("dstarts"))
    toks.join(dupStarts, Seq("doc_id"), "left")
      .withColumn("surv", remove_dup_spans(col("ts"),
        coalesce(col("dstarts"), array().cast("array<int>")), k, minSpan))
      .select(col("doc_id"), col("source"),
        size(col("ts")).as("n_before"),
        size(col("surv")).as("n_after"),
        concat_ws(" ", col("surv")).as("new_text"))
  }
}
