package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/** Per-plan functional-dependency declarations, carried as column
  * metadata.
  *
  * A column tagged `constantPer(anchor)` is declared constant within
  * every group of rows sharing the anchor column's value — domain
  * knowledge no optimizer can infer from a plan (e.g. Gender is
  * constant per UID because the users table has one row per UID).
  * Because the tag lives in Attribute metadata it travels with the
  * column through joins, windows, projections and renames (Alias
  * inherits child metadata), and it exists ONLY on DataFrames that
  * explicitly declared it — so an optimizer rule keyed on these tags
  * ([[UserConstantPredicatePushdown]]) is inert on arbitrary data, per
  * the round-1 advice: a session-global rule keyed on hard-coded column
  * NAMES could silently mis-optimize a coincidentally-named column.
  */
object Fd {

  /** Metadata key holding the anchor column name. */
  val ConstantPerKey = "graft.fd.constantPer"

  /** Tag one column as constant per `anchor` (keeps its name). */
  def constantPer(c: Column, name: String, anchor: String): Column =
    c.as(name, new MetadataBuilder().putString(ConstantPerKey, anchor).build())

  /** Tag `cols` of `df` as constant per `anchor`; other columns pass
    * through untouched.
    */
  def declareConstantPer(df: DataFrame, anchor: String, cols: Seq[String]): DataFrame = {
    val tagged = cols.toSet
    df.select(df.columns.map { c =>
      if (tagged.contains(c)) constantPer(col(c), c, anchor) else col(c)
    }.toSeq: _*)
  }

  /** The anchor this attribute is declared constant per, if any. */
  def anchorOf(a: Attribute): Option[String] =
    if (a.metadata.contains(ConstantPerKey)) Some(a.metadata.getString(ConstantPerKey))
    else None
}
