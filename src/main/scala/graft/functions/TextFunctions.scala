package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for large-scale corpus processing: tokenizing,
  * shingling, quality scoring, language ID, fingerprinting. All pure
  * `functions._` compositions (codegen'd, no UDFs) so they stay inside
  * whole-stage codegen on a 100 TB scan.
  */
object TextFunctions {

  /** The ONE whitespace class every tokenizing spelling uses, spelled
    * out as the RE2 `\s` set `[\t\n\f\r ]` (r19 review): the oracles
    * run `'\s+'` under DuckDB's RE2, which EXCLUDES vertical tab
    * , while Java's `\s` includes it — a document containing a
    * vertical tab would tokenize differently on the two engines and
    * flip every token-derived hash gate. The engine adopts the RE2
    * set so `\s+` stays the canonical oracle spelling
    * (OracleSqlContractSpec); [[QualityStatsUtil.isWs]] mirrors this
    * set character-for-character.
    */
  val WsClass = "[ \\t\\n\\f\\r]"

  /** Whitespace tokens of the lowercased text (empty tokens dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(text), WsClass + "+"), t => length(t) > 0)

  /** BPE-ish subword segmentation: splits on word/number/punctuation
    * boundaries like a GPT-style pre-tokenizer regex (letters runs,
    * digit runs, single non-space punctuation).
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word k-shingles (k consecutive tokens joined by a space); the
    * near-dup unit for MinHash/Jaccard. Documents shorter than k tokens
    * get their whole token string as a single shingle.
    */
  def shingles(text: Column, k: Int): Column = {
    val ts = tokens(text)
    when(size(ts) <= k, array(concat_ws(" ", ts)))
      .otherwise(transform(
        sequence(lit(0), size(ts) - k),
        i => concat_ws(" ", slice(ts, i + 1, lit(k)))))
  }

  /** Distinct shingles — the set form used for exact Jaccard. */
  def shingleSet(text: Column, k: Int): Column = array_distinct(shingles(text, k))

  // ---- quality scoring (length / punctuation / stopword ratios) ----

  /** The (tiny, English) stopword list used by [[stopwordRatio]]. */
  val stopwordList: Seq[String] = Seq("the", "a", "an", "of", "to", "in", "and",
    "is", "on", "for", "with", "as", "at", "by", "it", "be", "this", "that")

  /** Fraction of characters that are letters. */
  def alphaRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / total)
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", "")).cast("double") / total)
  }

  /** Fraction of tokens that are (English) stopwords — a proxy for
    * natural-language-ness; word soup and code score near 0.
    */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    val sw = typedLit(stopwordList)
    when(size(ts) === 0, 0.0).otherwise(
      size(filter(ts, t => array_contains(sw, t))).cast("double") / size(ts))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Composite quality score in [0,1]: blend of length band, alpha
    * ratio, stopword presence and sane mean token length.
    *
    * Delegates to the single-pass [[QualityStats]] expression — the
    * all-builtins composite re-split the text once per component
    * (lambdas block CSE) and exploded under predicate-pushdown
    * substitution (q87 evaluated it 3×/row). The builtin spelling
    * survives as [[qualityScoreComposite]], kept as the executable
    * specification: QualityStatsSpec asserts bit-equality on the real
    * corpus, and the DuckDB oracle CTEs remain its direct translation.
    */
  def qualityScore(text: Column): Column =
    QualityFunctions.quality_stats(text).getField("q")

  /** The original builtins-only blend (the specification form). */
  def qualityScoreComposite(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0))
    val tokLen = meanTokenLen(text)
    val tokScore = when(tokLen.between(3.0, 10.0), 1.0).otherwise(0.3)
    round(lenScore * 0.25 + alpha * 0.25 + stop * 0.25 + tokScore * 0.25, 6)
  }

  // ---- language identification (character n-gram heuristic) ----

  /** Tiny per-language marker sets: highest-frequency function words +
    * diacritic classes. A real system would use trained n-gram profiles;
    * the shape (score-per-language then greatest) is the same.
    */
  /** Exposed so the DuckDB oracle for q44 is GENERATED from the same
    * table — the heuristic and its gate can never drift apart.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is ", " to "),
    "es" -> Seq(" el ", " la ", " los ", " que ", " y ", "ción"),
    "fr" -> Seq(" le ", " la ", " les ", " est ", " une ", " dans "),
    "de" -> Seq(" der ", " die ", " das ", " und ", " ist ", "sch"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Best-scoring language code, "und" when nothing matches.
    *
    * One [[MarkerGroupArgmax]] scan per row: all ~27 markers counted
    * byte-wise in a single pass (earlier forms — 27 regexp_counts or a
    * fold over a counts array — either brushed the 64KB codegen method
    * limit or re-evaluated the scan per reference).
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val idx = MultiCountFunctions.marker_group_argmax(
      padded, langMarkers.flatMap(_._2), langMarkers.map(_._2.length))
    val codes = typedLit(langMarkers.map(_._1))
    when(idx >= 0, element_at(codes, idx + 1)).otherwise("und")
  }

  // ---- PII redaction ----

  /** Deliberately engine-portable patterns (RE2 ∩ java.util.regex:
    * character classes, bounded repeats, ASCII \b only) so the same
    * strings run in the DuckDB oracle verbatim.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longNumberPattern = "\\b[0-9]{6,}\\b"

  /** Scrub emails and id-like digit runs — the redaction pass a
    * training pipeline runs before anything is retained. Pure
    * regexp_replace chain: codegen'd, order fixed (emails first so an
    * address's digits can't be half-eaten by the number rule).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      longNumberPattern, "<NUM>")

  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def longNumberCount(text: Column): Column = regexp_count(text, lit(longNumberPattern))

  // ---- fingerprinting ----

  /** Order-sensitive 60-bit document fingerprint: rolling hash over the
    * token sequence — each step hashes `"<acc> <token>"` and keeps the
    * low 60 bits of the md5 (the q74 winnowing tail convention), so the
    * chain is order-sensitive and never overflows. Pure
    * higher-order-function fold — distributed, no UDF.  Equal texts
    * (after whitespace normalization) get equal fingerprints; any token
    * edit changes it.
    *
    * r8: the chain step moved from Spark's xxhash64 (engine-private
    * seed/algorithm — unreproducible outside Spark, which held q46 at a
    * rows-only gate) to the ENGINE-PORTABLE md5 tail: DuckDB replays
    * the identical chain via `list_reduce` + the same substr(md5) tail,
    * graduating q46 to the full hash gate. Chain step on the oracle
    * side: `CAST('0x' || substr(md5(acc || ' ' || t), 18, 15) AS
    * BIGINT)`.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      conv(substring(md5(concat(acc.cast("string"), lit(" "), t)), 18, 15),
        16, 10).cast("long"))
}
