package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, shiftleft}

/** Morton (Z-order) bit interleave — the ONE spelling of the Part1By1
  * spread shared by the q134 layout report and
  * [[graft.sources.Snapshots.compact]]'s two-column clustered rewrite
  * (the two can never drift). Input must be a 16-bit value (callers
  * bucket-normalize first); output spreads bit i to bit 2i. Pure
  * integer shift/mask — codegen, no UDF, no per-row allocation.
  */
object ZOrder {

  def spread16(v: Column): Column = {
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Interleaved 32-bit Morton code of two 16-bit dims. */
  def code(x: Column, y: Column): Column =
    spread16(x) + shiftleft(spread16(y), 1)
}
