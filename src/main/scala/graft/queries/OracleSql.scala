package graft.queries

/** Shared DuckDB oracle fragments that must stay bit-identical to the
  * engine expressions they mirror. The tokens() contract appears in
  * oracles across six modules; new oracles should reference THIS
  * spelling (OracleSqlContractSpec pins the legacy inline copies to
  * it, so none can drift independently).
  */
object OracleSql {
  /** DuckDB token list of the column/expression `e` — identical to
    * [[graft.functions.TextFunctions.tokens]].
    */
  def tokens(e: String): String =
    s"""list_filter(string_split_regex(lower($e), '\\s+'), x -> len(x) > 0)"""
}
