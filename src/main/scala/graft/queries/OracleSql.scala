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

  /** The portable sampling bucket in [0, 1e6), as DuckDB SQL —
    * identical to [[graft.operators.Sampling.bucket]] INCLUDING its
    * NULL-key sentinel (r17 review): the engine coalesces a NULL key
    * to "<NUL>null" so null-key rows get one deterministic bucket,
    * and an oracle spelled without the coalesce would hash NULL to
    * NULL (weight 6 / fold NULL) and diverge the moment a fixture
    * carries a NULL key. `key` may be any VARCHAR-castable expression;
    * a NULL-propagating concat is coalesced as a whole, matching the
    * engine's argument-level coalesce.
    */
  def bucketSql(key: String, salt: String): String =
    s"CAST('0x' || substr(md5(coalesce(CAST($key AS VARCHAR), " +
      s"chr(0) || 'null') || chr(1) || '$salt'), 18, 15) AS BIGINT) % 1000000"
}
