package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Point query against a serialized [[CountMinSketch]] (the binary
  * Spark's `count_min_sketch` aggregate emits).
  *
  * The agg side is the scale story — per-partition sketches merge
  * map-side, so a 100 TB token stream reduces to one (depth×width)
  * counter grid with NO key-space shuffle (contrast the exact
  * heavy-hitters groupBy, which shuffles every distinct token). This
  * expression is the read side: estimate a candidate's count straight
  * from the sketch bytes. Deserialization is memoized per sketch
  * CONTENT fingerprint, so probing N candidates against one sketch
  * parses it once per thread, not once per row (row extraction copies
  * the binary, so an identity key would never hit).
  *
  * Hashing matches the aggregate's write side: StringType items probe
  * with their UTF-8 bytes, exactly what CountMinSketchAgg adds.
  */
object CmsUtil {
  // last-used cache keyed by a CONTENT fingerprint: row extraction
  // copies the binary per evaluation, so an identity (`eq`) key would
  // never hit and the ~100 KB payload would re-parse per probed row.
  // The sampled bytes must actually VARY between sketches — Spark's
  // layout is version(4) totalCount(8) depth(4) width(4) hashA[depth]
  // table[depth·width], and the head/tail are constant for same-config
  // sketches (version, high totalCount bytes, a usually-zero last grid
  // cell). So: totalCount (bytes 4–11, differs whenever the data
  // volume does) XOR 16 longs sampled at even strides across the
  // counter grid — two same-config sketches colliding would need equal
  // counts at every sampled cell on top of equal totals.
  @transient private val cache =
    new ThreadLocal[((Int, Long), CountMinSketch)]

  private def fp(b: Array[Byte]): (Int, Long) = {
    def longAt(off: Int): Long = {
      var v = 0L; var i = 0
      while (i < 8 && off + i < b.length) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
      v
    }
    var h = longAt(4) // totalCount
    val stride = math.max(8, b.length / 17)
    var off = 20 // past the fixed header, into hashA/table territory
    while (off + 8 <= b.length) { h = h * 1099511628211L ^ longAt(off); off += stride }
    (b.length, h)
  }

  private def sketchOf(bytes: Array[Byte]): CountMinSketch = {
    val k = fp(bytes)
    val c = cache.get()
    if (c != null && c._1 == k) c._2
    else {
      val s = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
      cache.set((k, s))
      s
    }
  }

  def estimate(bytes: Array[Byte], item: UTF8String): Long =
    sketchOf(bytes).estimateCount(item.getBytes)
}

case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate needs (binary, string), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CmsUtil.estimate(sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = graft.functions.CmsUtil.estimate($s, $i);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}

object CmsFunctions {
  def cms_estimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
}
