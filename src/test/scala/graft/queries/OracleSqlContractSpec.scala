package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The tokens() contract appears (inlined) in oracle SQL across six
  * modules; every copy must carry the ONE canonical spelling — a
  * tokenizer change that updates some oracles but not others would
  * fail gates in a way that looks like an engine bug.
  */
class OracleSqlContractSpec extends AnyFunSuite {

  test("every oracle's tokenizer inline matches the canonical spelling") {
    // the INVARIANT core: split on Java-\s over lower(col). The
    // len(x)>0 filter wrapper varies legitimately (some oracles fuse a
    // stopword predicate into the same lambda) — the split regex and
    // the lowercasing are what must never drift from tokens()
    val canon = """string_split_regex\(lower\(\w+\), '\\s\+'\)""".r
    val offenders = graft.SparkEntry.oracleSql.toSeq.flatMap { case (name, rawSql) =>
      // stripMargin line wraps are not drift — compare on collapsed
      // whitespace (the '\s+' LITERAL is backslash-s, untouched)
      val sql = rawSql.replaceAll("[ \t\r\n|]+", " ")
      val occurrences = "string_split_regex".r.findAllMatchIn(sql).size
      val canonical = canon.findAllMatchIn(sql).size
      if (occurrences != canonical) Some(s"$name ($canonical/$occurrences canonical)")
      else None
    }
    assert(offenders.isEmpty,
      s"non-canonical tokenizer spelling in: ${offenders.mkString(", ")}")
  }

  test("QUERIES.md stays in sync with the live registry") {
    val md = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("QUERIES.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val documented = """\| (q\d+\w*) \|""".r
      .findAllMatchIn(md).map(_.group(1)).toSet
    val registered = graft.SparkEntry.queries.keySet
    val missing = registered -- documented
    val stale = documented -- registered
    assert(missing.isEmpty && stale.isEmpty,
      s"QUERIES.md drift — missing: ${missing.toSeq.sorted.mkString(",")}; " +
        s"stale: ${stale.toSeq.sorted.mkString(",")} (regenerate via tools/QIndex)")
  }

  test("OracleSql.tokens renders the canonical spelling") {
    assert(OracleSql.tokens("text") ==
      """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)""")
  }
}
