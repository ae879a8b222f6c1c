package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Q-DIGEST — the mergeable QUANTILE sketch (Shrivastava, Buragohain,
  * Agrawal, Suri 2004, "Medians and Beyond"), completing the sketch
  * family beside CMS (frequencies, q98) and HLL (distincts, q63/q114).
  *
  * State: counts on nodes of the complete binary tree over the integer
  * universe [0, 2^log2U) — node 1 is the root, value x lives at leaf
  * 2^log2U + x. Compression (the digest property) folds any sibling
  * pair whose (pair + parent) mass is below n/k into the parent, so
  * the sketch holds O(k · log2U) nodes regardless of n, and a rank
  * query's error is at most (log2U / k) · n — the published bound,
  * asserted per-group by the q190 gate with DuckDB recomputing exact
  * ranks.
  *
  * Merge is node-wise count addition followed by one compression —
  * commutative up to re-compression, which preserves the error bound
  * (batching can change the NODES, never the guarantee, so the gate
  * states bound booleans, not sketch bytes — the q63/q64/q98
  * discipline for approximate operators). The aggregation buffer is a
  * plain object inside Spark's ObjectHashAggregate, serialized only
  * when partial states cross the exchange — the partial-merge shape
  * that lets a 100 TB column's quantiles resolve with one small-state
  * shuffle and zero sorts (contrast q38's per-group sort cliff).
  */
object QDigest {

  /** Mutable digest state: node id → count, plus the stream length.
    * Lives decoded inside ObjectHashAggregate; java-serialized only at
    * partial-state shuffle boundaries.
    */
  final class State(var n: Long, val m: java.util.HashMap[Long, Long])
      extends Serializable

  class Quantiles(log2U: Int, k: Int, probes: Seq[Double])
      extends Aggregator[java.lang.Long, State, Array[Long]] {
    require(log2U >= 1 && log2U <= 40, s"log2U out of range: $log2U")
    require(k >= 8, s"compression factor too small: $k")
    require(probes.nonEmpty && probes.forall(p => p > 0 && p < 1))
    private val U = 1L << log2U
    // compress when the working map outgrows this (amortizes the
    // O(m·log2U) fold across inserts) — kept tight so PARTIAL states
    // crossing the exchange stay near the O(k·log2U) digest size
    // instead of one-entry-per-distinct-value (the first cut shipped
    // ~20k-leaf maps per partition and paid ~2 s of serialization)
    private val compressAt = 4 * k

    override def zero: State = new State(0L, new java.util.HashMap)

    override def reduce(b: State, boxed: java.lang.Long): State = {
      // BOXED input + null skip (r17 review): a primitive Long input
      // encoder made a NULL row crash the query ("Null value appeared
      // in non-nullable field") — or silently count as 0 — instead of
      // being skipped like the built-in percentile() it mirrors (the
      // MisraGries r16 NULL convention)
      if (boxed == null) return b
      val x = boxed.longValue()
      require(x >= 0 && x < U, s"value out of universe [0, $U): $x")
      b.m.merge(U + x, 1L, (a, c) => a + c)
      b.n += 1
      if (b.m.size > compressAt) compress(b)
      b
    }

    override def merge(a: State, b: State): State = {
      val it = b.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        a.m.merge(e.getKey, e.getValue, (x, y) => x + y)
      }
      a.n += b.n
      compress(a)
      a
    }

    override def finish(r: State): Array[Long] = {
      if (r.n == 0) return Array.fill(probes.size)(-1L)
      compress(r)
      // canonical q-digest quantile walk: nodes in increasing order of
      // upper bound, smaller ranges first; the first node carrying the
      // cumulative rank past ceil(q·n) reports its range maximum
      val ids = new Array[Long](r.m.size)
      var i = 0
      val kit = r.m.keySet().iterator()
      while (kit.hasNext) { ids(i) = kit.next(); i += 1 }
      // one spelling of the node geometry (r17 review: the d/width/hi
      // derivation appeared verbatim in the sort key AND the walk —
      // the trickiest bit-arithmetic in the file must not fork)
      def geometry(v: Long): (Long, Long) = {
        val d = 63 - java.lang.Long.numberOfLeadingZeros(v)
        val width = U >> d
        ((v - (1L << d)) * width + width, width)
      }
      val ordered = ids.map(v => (v, geometry(v))).sortBy(_._2)
      val targets = probes.map(p => math.max(1L, math.ceil(p * r.n).toLong))
      val out = Array.fill(probes.size)(-1L)
      var cum = 0L
      for ((v, (hi, _)) <- ordered) {
        cum += r.m.get(v)
        for (j <- targets.indices)
          if (out(j) < 0 && cum >= targets(j)) out(j) = hi - 1
      }
      out
    }

    /** Bottom-up level-by-level sibling fold: a pair whose (pair +
      * parent) mass stays under the n/k threshold moves to the parent.
      * Level order matters — a parent created by folding depth d is
      * itself a fold candidate at depth d−1, so each level's key set
      * snapshots AFTER the deeper level finished (the single-sweep
      * shortcut missed these cascades and left partial states at
      * one-entry-per-distinct-value). Deterministic given (map, n);
      * O(m · log2U).
      */
    private def compress(b: State): Unit = {
      val t = math.max(1L, b.n / k)
      if (t <= 1) return // no pair can have mass < 1
      var d = log2U
      while (d >= 1) {
        val lo = 1L << d
        val hi = lo << 1
        val level = new scala.collection.mutable.ArrayBuffer[Long]()
        val kit = b.m.keySet().iterator()
        while (kit.hasNext) {
          val v = kit.next()
          if (v >= lo && v < hi && (v & 1L) == 0L) level += v
        }
        for (v0 <- level) {
          val cv = b.m.getOrDefault(v0, 0L)
          val cs = b.m.getOrDefault(v0 | 1L, 0L)
          if (cv + cs > 0) {
            val p = v0 >> 1
            val cp = b.m.getOrDefault(p, 0L)
            if (cv + cs + cp < t) {
              b.m.remove(v0)
              b.m.remove(v0 | 1L)
              b.m.put(p, cv + cs + cp)
            }
          }
        }
        // odd nodes whose even sibling is absent fold too
        val oddOnly = new scala.collection.mutable.ArrayBuffer[Long]()
        val kit2 = b.m.keySet().iterator()
        while (kit2.hasNext) {
          val v = kit2.next()
          if (v >= lo && v < hi && (v & 1L) == 1L &&
              !b.m.containsKey(v & ~1L)) oddOnly += v
        }
        for (v <- oddOnly) {
          val cv = b.m.getOrDefault(v, 0L)
          if (cv > 0) {
            val p = v >> 1
            val cp = b.m.getOrDefault(p, 0L)
            if (cv + cp < t) {
              b.m.remove(v)
              b.m.put(p, cv + cp)
            }
          }
        }
        d -= 1
      }
    }

    override def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: estimated values at `probes` quantiles of a
    * non-negative long column bounded by 2^log2U.
    */
  def qdigest_quantiles(c: Column, log2U: Int, k: Int,
                        probes: Seq[Double]): Column =
    udaf(new Quantiles(log2U, k, probes), Encoders.LONG).apply(c)
}
