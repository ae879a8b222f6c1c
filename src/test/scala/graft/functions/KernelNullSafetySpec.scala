package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** r18 adversarial-review pins for the expression kernels: null-slot
  * semantics (WinnowSelect NPE, RemoveDupSpans null-start-as-0,
  * Shingle hash/render disagreement), the MinHash empty-input refusal,
  * and the TopGramStats single-build-per-distinct-hash rewrite. These
  * inputs are unreachable from the production tokenizers (containsNull
  * = false) — the pins exist so the kernels stay total and consistent
  * for any caller the type check admits.
  */
class KernelNullSafetySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def nullableTokens(toks: Seq[Option[String]]) =
    Seq(Tuple1(toks)).toDF("tokens")
      .select(col("tokens").cast("array<string>").as("tokens"))

  test("winnow_select skips null tokens exactly as concat_ws does") {
    // null-free result must be byte-stable across the fix
    val plain = nullableTokens(Seq("a", "b", "c", "d", "e", "f").map(Some(_)))
      .select(WinnowFunctions.winnow_select($"tokens", 2, 3).as("p"))
      .as[Seq[Long]].head()
    assert(plain.nonEmpty)
    // a null slot no longer NPEs, and each window hashes like
    // md5(concat_ws(' ', slice(...))) — null skipped WITHOUT a
    // separator, so ["a", null, "c"] windows render "a c" etc.
    val withNull = nullableTokens(
      Seq(Some("a"), None, Some("c"), Some("d"), Some("e"), Some("f")))
      .select(WinnowFunctions.winnow_select($"tokens", 2, 3).as("p"))
      .as[Seq[Long]].head()
    // oracle: the documented SQL form over the same positions
    val oracle = nullableTokens(
      Seq(Some("a"), None, Some("c"), Some("d"), Some("e"), Some("f")))
      .select(expr(
        """transform(sequence(0, size(tokens) - 2),
          |  i -> cast(conv(substring(md5(concat_ws(' ', slice(tokens, i + 1, 2))), 18, 15), 16, 10)
          |            as long))""".stripMargin).as("h"))
      .as[Seq[Long]].head()
    // winnow mins over w=3 windows of the oracle hashes, distinct-sorted
    val mins = oracle.sliding(3).map(_.min).toSeq.distinct.sorted
    assert(withNull == mins,
      s"winnow with null token diverged from the concat_ws SQL form: $withNull vs $mins")
  }

  test("remove_dup_spans: a null start is no evidence, not position 0") {
    val df = Seq(Tuple1(Seq("t0", "t1", "t2", "t3", "t4"))).toDF("tokens")
      .withColumn("starts", expr("array(cast(null as int))"))
    val out = df.select(SpanFunctions.remove_dup_spans(
        $"tokens", $"starts", 2, 2).as("kept"))
      .as[Seq[String]].head()
    assert(out == Seq("t0", "t1", "t2", "t3", "t4"),
      s"null dup-start deleted tokens: $out")
  }

  test("shingle family: null token ≡ empty string, hash agrees with render") {
    def hashes(toks: Seq[Option[String]]) = nullableTokens(toks)
      .select(ShingleFunctions.shingle_hashes($"tokens", 2).as("h"))
      .as[Seq[Long]].head()
    assert(hashes(Seq(Some("a"), None)) == hashes(Seq(Some("a"), Some(""))),
      "null and empty-string tokens must hash identically (both render 'a ')")
    // top_gram_stats on the same pair: identical [count, char_len]
    def top(toks: Seq[Option[String]]) = nullableTokens(toks)
      .select(ShingleFunctions.top_gram_stats($"tokens", 2).as("t"))
      .as[Seq[Long]].head()
    assert(top(Seq(Some("a"), None, Some("a"), None)) ==
      top(Seq(Some("a"), Some(""), Some("a"), Some(""))))
  }

  test("top_gram_stats: degenerate all-same-gram document stays correct") {
    // m identical grams: count = m, gram = "x x", char_len = 3 — and
    // the r18 rewrite builds the gram string once, not m times
    val m = 500
    val out = Seq(Tuple1(Seq.fill(m + 1)("x"))).toDF("tokens")
      .select(ShingleFunctions.top_gram_stats($"tokens", 2).as("t"))
      .as[Seq[Long]].head()
    assert(out == Seq(m.toLong, 3L), s"got $out")
    // tie between two distinct grams: lexicographically larger wins
    val tie = Seq(Tuple1(Seq("b", "b", "a", "a"))).toDF("tokens")
      .select(ShingleFunctions.top_gram_stats($"tokens", 2).as("t"))
      .as[Seq[Long]].head()
    // grams: "b b"(1) "b a"(1) "a a"(1) — all count 1, max gram "b b"
    assert(tie == Seq(1L, 3L), s"got $tie")
  }

  test("pq_adc_dot refuses an out-of-range code instead of reading past the table") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // m=2, ksub=2 → 4-entry table; code 3 at subspace 0 would read
    // table[0*2+3] past the end on an unchecked getDouble
    val table = new GenericArrayData(Array(1.0, 2.0, 3.0, 4.0))
    val good = new GenericArrayData(Array(1, 0))
    assert(PqUtil.adcDot(table, good, 2) == 2.0 + 3.0)
    val oob = new GenericArrayData(Array(3, 0))
    val e = intercept[IllegalArgumentException] { PqUtil.adcDot(table, oob, 2) }
    assert(e.getMessage.contains("out of range"))
    // null code slot is the NaN drop-out, not centroid 0
    val withNull = new GenericArrayData(Array[Any](null, 0))
    assert(PqUtil.adcDot(table, withNull, 2).isNaN)
  }

  test("graft SQL functions validate arity at analysis time") {
    graft.plans.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_md5_low60('a', 'b')").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("expects 1 argument"), msgs)
    // correct arity still works
    assert(spark.sql("SELECT graft_md5_low60('abc') AS h").collect()(0)
      .getLong(0) == 474636617523494770L)
  }

  test("minhash_signature yields NULL for an input with no contributing hash") {
    // r18 ADVICE (revising the r18-review throw): contentless input is
    // row-local NULL — never an all-MaxValue signature (which would
    // LSH-band every contentless doc together at similarity 1.0), and
    // never a stage-aborting throw for SQL callers with user-built
    // arrays
    val rows = Seq(Tuple1(Seq.empty[Long]), Tuple1(Seq(42L, 7L)))
      .toDF("h")
      .select(MinHashFunctions.minhash_signature($"h", 8).as("s"))
      .collect()
    assert(rows(0).isNullAt(0), "empty hash array must yield NULL signature")
    assert(!rows(1).isNullAt(0), "a real row in the same stage still signs")
    // non-empty unchanged: deterministic, numHashes-wide, not MaxValue
    val sig = Seq(Tuple1(Seq(42L, 7L))).toDF("h")
      .select(MinHashFunctions.minhash_signature($"h", 8).as("s"))
      .as[Seq[Long]].head()
    assert(sig.length == 8 && sig.forall(_ != Long.MaxValue))
  }
}
