package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** MISRA–GRIES heavy hitters — the deterministic frequency-summary
  * counterpart of CMS (q98): where CMS answers point queries with an
  * OVERestimate bound, an MG summary holds at most k counters whose
  * estimates UNDERcount by at most ⌊n/(k+1)⌋, and every item with true
  * count above that threshold is guaranteed PRESENT (the ε-heavy-hitter
  * completeness CMS cannot give without a candidate set). Summaries
  * merge by counter addition followed by the (k+1)-th-largest-count
  * subtraction — the mergeability result of Agarwal et al. 2012
  * ("Mergeable Summaries"), which keeps the same bound under ANY merge
  * tree, so partial states cross the exchange at O(k) size and the
  * corpus's key space never shuffles.
  *
  * Counter CONTENTS below the threshold are partitioning-dependent by
  * design (like q190's digest nodes), so the q193 gate states the
  * published bounds as booleans against exact counts — the
  * q63/q64/q98/q190 discipline.
  */
object MisraGries {

  final class State(var n: Long, val m: java.util.HashMap[String, Long])
      extends Serializable

  class Summary(k: Int) extends Aggregator[String, State, Map[String, Long]] {
    require(k >= 1, s"counter budget must be >= 1: $k")

    override def zero: State = new State(0L, new java.util.HashMap)

    override def reduce(b: State, x: String): State = {
      // skip NULLs, the built-in-aggregate convention (r16 review
      // finding): a null HashMap key survives to finish() and
      // Catalyst's map encoder then throws "Cannot use null as map
      // key" far from the cause; a null is also not an item whose
      // frequency the summary should count
      if (x == null) return b
      b.n += 1
      // getOrDefault, not get: with a Scala Long value type, a missing
      // key's null would silently unbox to 0 and read as "present"
      val cur = b.m.getOrDefault(x, 0L)
      if (cur > 0L) b.m.put(x, cur + 1L)
      else if (b.m.size < k) b.m.put(x, 1L)
      else {
        // decrement-all, drop zeros — the classic O(k) amortized step
        val it = b.m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
      b
    }

    override def merge(a: State, b: State): State = {
      val it = b.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        a.m.merge(e.getKey, e.getValue, (x, y) => x + y)
      }
      a.n += b.n
      if (a.m.size > k) {
        // subtract the (k+1)-th largest count from every counter and
        // keep the positives — the mergeable-summaries combine step
        val counts = new Array[Long](a.m.size)
        var i = 0
        val vit = a.m.values().iterator()
        while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val cut = counts(a.m.size - k - 1)
        val eit = a.m.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          if (e.getValue <= cut) eit.remove()
          else e.setValue(e.getValue - cut)
        }
      }
      a
    }

    override def finish(r: State): Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      val it = r.m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }

    override def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: the ≤ k-counter MG summary of a string column as a
    * map. Estimates undercount by at most ⌊n/(k+1)⌋; anything above
    * that threshold is guaranteed a key.
    */
  def mg_summary(c: Column, k: Int): Column = udaf(new Summary(k)).apply(c)
}
