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

  /** BOXED input (r17 review): with a primitive Double input encoder a
    * NULL row crashed the query ("Null value appeared in non-nullable
    * field") — or silently counted as 0.0 — instead of being skipped
    * like the built-in var_samp it mirrors (the MisraGries r16 NULL
    * convention). All moment arithmetic lives in [[Moments]]; this
    * class only routes input.
    */
  class WelfordVariance
      extends Aggregator[java.lang.Double, Moments, Option[Double]] {
    override def zero: Moments = Moments(0, 0.0, 0.0)
    override def reduce(b: Moments, a: java.lang.Double): Moments =
      if (a == null) b else b.add(a)
    override def merge(a: Moments, b: Moments): Moments = a.merge(b)
    override def finish(r: Moments): Option[Double] = r.variance
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Untyped (DataFrame) column form of the Welford variance. */
  def welford_variance(c: Column): Column =
    udaf(new WelfordVariance, Encoders.DOUBLE).apply(c)

  /** Typed column form for Dataset[Double].agg — a primitive Double
    * can't be null by construction, so this thin adapter delegates
    * every moment step to [[Moments]] (no arithmetic to drift).
    */
  def welfordVarianceTyped: org.apache.spark.sql.TypedColumn[Double, Option[Double]] =
    (new Aggregator[Double, Moments, Option[Double]] {
      override def zero: Moments = Moments(0, 0.0, 0.0)
      override def reduce(b: Moments, a: Double): Moments = b.add(a)
      override def merge(a: Moments, b: Moments): Moments = a.merge(b)
      override def finish(r: Moments): Option[Double] = r.variance
      override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      override def outputEncoder: Encoder[Option[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }).toColumn
}
