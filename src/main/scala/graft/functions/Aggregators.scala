package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregators (`org.apache.spark.sql.expressions
  * .Aggregator`) — the engine's UDAF surface. The reference needs none
  * for parity (SURVEY.md §2: no group-reducing aggregates at all);
  * these cover the capability with the canonical example: numerically
  * stable moments in one pass.
  */
object Aggregators {

  /** Welford/Chan single-pass mean+variance state. Mergeable across
    * partitions (parallel-safe, unlike the naive sum-of-squares form
    * which cancels catastrophically at large magnitude).
    */
  case class Moments(n: Long, mean: Double, m2: Double) {
    def add(x: Double): Moments = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      Moments(n1, mean1, m2 + d * (x - mean1))
    }
    def merge(o: Moments): Moments =
      if (n == 0) o
      else if (o.n == 0) this
      else {
        val tot = n + o.n
        val d = o.mean - mean
        Moments(tot,
          mean + d * o.n / tot,
          m2 + o.m2 + d * d * n * o.n / tot)
      }
    def variance: Option[Double] = if (n < 2) None else Some(m2 / (n - 1))
  }

  class WelfordVariance extends Aggregator[Double, Moments, Option[Double]] {
    override def zero: Moments = Moments(0, 0.0, 0.0)
    override def reduce(b: Moments, a: Double): Moments = b.add(a)
    override def merge(a: Moments, b: Moments): Moments = a.merge(b)
    override def finish(r: Moments): Option[Double] = r.variance
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped (DataFrame) column form of the Welford variance. */
  def welford_variance(c: Column): Column = udaf(new WelfordVariance).apply(c)

  /** Typed column form for Dataset[Double].agg. */
  def welfordVarianceTyped: org.apache.spark.sql.TypedColumn[Double, Option[Double]] =
    (new WelfordVariance).toColumn
}
