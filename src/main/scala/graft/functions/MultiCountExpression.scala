package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Occurrence counts of N fixed literal patterns in one scan of the
  * input string (overlapping matches counted, byte-wise over UTF-8).
  *
  * The language-ID scorer needs ~27 marker counts per document; as
  * `regexp_count` chains that is 27 regex scans and a codegen tree that
  * brushes the 64KB method limit. This expression walks the text once
  * per pattern with raw byte comparisons — no regex machinery, one
  * array output — and keeps the whole scorer in a single codegen'd
  * call. Patterns are plan-time constants, so their bytes live in
  * generated-class fields, not per-row allocations.
  */
case class MultiSubstringCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty literals")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_substring_count needs string input, got ${t.catalogString}")
    }

  @transient private lazy val patternBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes("UTF-8")).toArray

  private def countIn(text: Array[Byte], pat: Array[Byte]): Int = {
    var c = 0; var i = 0
    val n = text.length - pat.length
    while (i <= n) {
      var j = 0
      while (j < pat.length && text(i + j) == pat(j)) j += 1
      if (j == pat.length) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(patternBytes.map(countIn(text, _)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // patterns as a class-level field, initialized once
    val pats = ctx.addReferenceObj("patterns", patternBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val text = ctx.freshName("text"); val out = ctx.freshName("out")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val pat = ctx.freshName("pat")
      s"""
         |byte[] $text = $a.getBytes();
         |int[] $out = new int[${patterns.length}];
         |for (int $p = 0; $p < ${patterns.length}; $p++) {
         |  byte[] $pat = $pats[$p];
         |  int $c = 0;
         |  for (int $i = 0; $i + $pat.length <= $text.length; $i++) {
         |    int $j = 0;
         |    while ($j < $pat.length && $text[$i + $j] == $pat[$j]) $j++;
         |    if ($j == $pat.length) $c++;
         |  }
         |  $out[$p] = $c;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Argmax over grouped pattern counts: patterns are partitioned into
  * consecutive groups (`groupSizes`); returns the index of the group
  * with the highest summed count, or -1 if every count is zero.
  * First-wins on ties.
  *
  * This IS the language-ID kernel: referencing a counts array from an
  * argmax fold would re-evaluate the scan per reference (lambda-free
  * CSE is not guaranteed across 27 uses); folding the argmax into the
  * expression guarantees exactly one scan per row.
  */
case class MarkerGroupArgmax(child: Expression, patterns: Seq[String],
    groupSizes: Seq[Int]) extends UnaryExpression {
  require(groupSizes.sum == patterns.length, "groupSizes must cover patterns")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"marker_group_argmax needs string input, got ${t.catalogString}")
    }

  @transient private lazy val patternBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes("UTF-8")).toArray
  @transient private lazy val groupOf: Array[Int] =
    groupSizes.zipWithIndex.flatMap { case (n, g) => Seq.fill(n)(g) }.toArray

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].getBytes
    val sums = new Array[Int](groupSizes.length)
    var p = 0
    while (p < patternBytes.length) {
      val pat = patternBytes(p)
      var i = 0; val n = text.length - pat.length
      while (i <= n) {
        var j = 0
        while (j < pat.length && text(i + j) == pat(j)) j += 1
        if (j == pat.length) sums(groupOf(p)) += 1
        i += 1
      }
      p += 1
    }
    var best = -1; var bestScore = 0
    var g = 0
    while (g < sums.length) {
      if (sums(g) > bestScore) { bestScore = sums(g); best = g }
      g += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pats = ctx.addReferenceObj("patterns", patternBytes, "byte[][]")
    val groups = ctx.addReferenceObj("groupOf", groupOf, "int[]")
    nullSafeCodeGen(ctx, ev, a => {
      val text = ctx.freshName("text"); val sums = ctx.freshName("sums")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val pat = ctx.freshName("pat")
      val g = ctx.freshName("g"); val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      s"""
         |byte[] $text = $a.getBytes();
         |int[] $sums = new int[${groupSizes.length}];
         |for (int $p = 0; $p < $pats.length; $p++) {
         |  byte[] $pat = $pats[$p];
         |  for (int $i = 0; $i + $pat.length <= $text.length; $i++) {
         |    int $j = 0;
         |    while ($j < $pat.length && $text[$i + $j] == $pat[$j]) $j++;
         |    if ($j == $pat.length) $sums[$groups[$p]]++;
         |  }
         |}
         |int $best = -1; int $bestScore = 0;
         |for (int $g = 0; $g < $sums.length; $g++) {
         |  if ($sums[$g] > $bestScore) { $bestScore = $sums[$g]; $best = $g; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MultiCountFunctions {
  def multi_substring_count(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiSubstringCount(ColumnBridge.expression(text), patterns))

  def marker_group_argmax(text: Column, patterns: Seq[String], groupSizes: Seq[Int]): Column =
    ColumnBridge.column(MarkerGroupArgmax(ColumnBridge.expression(text), patterns, groupSizes))
}
