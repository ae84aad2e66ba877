package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass numerically-stable mean + variance (Welford/Chan), the
  * optional custom Aggregator from SURVEY §7.4: the reference computes
  * K-means' mean and SSE in two coupled reduce passes
  * (K-means/src/main/java/wc/CountFollowers.java:115-141); this computes
  * both in one pass with a mergeable state, so it runs as an ordinary
  * partial+final aggregate.
  *
  * Numerically stable where the naive Σx²−(Σx)²/n cancels catastrophically
  * (large means, small variance). Not oracle-checked: the pairwise merge
  * order is partition-dependent, so results differ in the last ulps run to
  * run — WelfordSpec asserts agreement with exact moments to 1e-9 instead.
  */
object WelfordAgg {

  final case class Stats(n: Long, mean: Double, m2: Double) {
    def variance: Double = if (n < 2) 0.0 else m2 / n
    def sse: Double = m2
  }

  val of: Aggregator[Double, Stats, Stats] = new Aggregator[Double, Stats, Stats] {
    override def zero: Stats = Stats(0L, 0.0, 0.0)

    override def reduce(b: Stats, x: Double): Stats = {
      val n = b.n + 1
      val d = x - b.mean
      val mean = b.mean + d / n
      Stats(n, mean, b.m2 + d * (x - mean))
    }

    // Chan's parallel merge — what makes this a valid partial aggregate
    override def merge(a: Stats, b: Stats): Stats =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        Stats(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n.toDouble * b.n / n)
      }

    override def finish(b: Stats): Stats = b
    override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** typed column for Dataset[Double].select / KeyValueGroupedDataset.agg */
  def column: TypedColumn[Double, Stats] = of.toColumn
}
