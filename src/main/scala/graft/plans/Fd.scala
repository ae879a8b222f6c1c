package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/** Per-plan functional-dependency declarations, carried as column
  * metadata.
  *
  * A column tagged constant-per-anchor is declared constant within
  * every group of rows sharing the anchor column's value — domain
  * knowledge no optimizer can infer from a plan (e.g. Gender is
  * constant per UID because the users table has one row per UID).
  * Because the tags live in Attribute metadata they travel with the
  * columns through joins, windows, projections and renames (Alias
  * inherits child metadata), and they exist ONLY on DataFrames that
  * explicitly declared them — so an optimizer rule keyed on these tags
  * ([[UserConstantPredicatePushdown]]) is inert on arbitrary data.
  *
  * The dependency is keyed by a per-declaration TOKEN stamped on BOTH
  * the anchor column and its dependents — never by the anchor's NAME:
  * a window partitioned by a column that merely shares the anchor's
  * name (a renamed session id, the other side of a self-join of a
  * different table) carries no matching token and is never pushed
  * through. (Limitation: a self-join of the SAME declared table gives
  * both sides identical tokens; FD tracking at expression-id level
  * would be needed to separate those — declared in Scaladoc, not
  * solvable in metadata.)
  */
object Fd {

  /** Anchor column name at declaration time (informational). */
  val ConstantPerKey = "graft.fd.constantPer"
  /** Declaration token on dependent columns. */
  val TokenKey = "graft.fd.token"
  /** Declaration token on the anchor column itself. */
  val AnchorTokenKey = "graft.fd.anchorToken"

  /** Tag `cols` of `df` as constant per `anchor`; the anchor column is
    * stamped with the matching token; other columns pass through.
    */
  def declareConstantPer(df: DataFrame, anchor: String, cols: Seq[String]): DataFrame = {
    require(df.columns.contains(anchor), s"anchor $anchor not in ${df.columns.mkString(",")}")
    // a typo'd dependent name would otherwise stamp nothing and the
    // pushdown would silently never fire for the intended column
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"declared columns not in the frame: ${missing.mkString(", ")}")
    // a programmatically-built cols list that happens to include the
    // anchor would otherwise hit the anchor branch below, stamp no
    // TokenKey, and the pushdown would silently never fire for it —
    // the same silent-no-op class the `missing` require refuses (r19
    // review)
    require(!cols.contains(anchor),
      s"anchor $anchor cannot also be declared as its own dependent")
    // REUSE the anchor's existing token when the same column anchors a
    // second declaration (r18 review): a fresh UUID would overwrite
    // AnchorTokenKey and silently orphan every dependent of the earlier
    // declaration — declareConstantPer(d, "UID", Seq("Gender")) then
    // (…, "UID", Seq("Age")) must leave BOTH dependents anchored.
    val token = {
      val m = df.schema(anchor).metadata
      if (m.contains(AnchorTokenKey)) m.getString(AnchorTokenKey)
      else java.util.UUID.randomUUID().toString
    }
    val tagged = cols.toSet
    // seed each builder with the column's EXISTING metadata (r16
    // review finding): a fresh builder silently erased prior metadata
    // — including an earlier declaration where this column plays the
    // OTHER role (anchor vs dependent), killing that pushdown. One
    // token per ROLE still holds (a column dependent on two anchors
    // keeps only the later TokenKey — declare the tighter anchor
    // last); cross-role and foreign metadata now survive.
    // backtick-quote before col() (r19 review, the IntervalJoin
    // quoteId rule): the bare form PARSES the name, so a legal column
    // literally named "a.b" would fail to resolve (or resolve a
    // same-named nested field) right after the requires accepted it
    def q(c: String) = col("`" + c.replace("`", "``") + "`")
    def seeded(c: String) = new MetadataBuilder().withMetadata(df.schema(c).metadata)
    df.select(df.columns.map { c =>
      if (c == anchor)
        q(c).as(c, seeded(c).putString(AnchorTokenKey, token).build())
      else if (tagged.contains(c))
        q(c).as(c, seeded(c)
          .putString(ConstantPerKey, anchor).putString(TokenKey, token).build())
      else q(c)
    }.toSeq: _*)
  }

  /** The declaration token this dependent attribute carries, if any. */
  def tokenOf(a: Attribute): Option[String] =
    if (a.metadata.contains(TokenKey)) Some(a.metadata.getString(TokenKey)) else None

  /** The declaration token this attribute ANCHORS, if any. */
  def anchorTokenOf(a: Attribute): Option[String] =
    if (a.metadata.contains(AnchorTokenKey)) Some(a.metadata.getString(AnchorTokenKey))
    else None
}
