package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for [[WeightedStats]]: value `x` with weight `w`, plus an
  * independent column `v` for the streaming variance. */
case class WInput(x: Double, w: Double, v: Double)

/** Mutable-free aggregation buffer.
  *
  * The weighted sums are kept as BigDecimal (mirroring CAST(.. AS
  * DECIMAL(30,10)) in the DuckDB oracle) so the result is independent of
  * partition/merge order — double accumulation would drift with Spark's
  * nondeterministic partial-agg order. The variance runs Welford's
  * algorithm with Chan's parallel merge.
  */
case class WBuf(wsum: BigDecimal, wxsum: BigDecimal, n: Long, mean: Double, m2: Double)

case class WOut(wmean: Double, var_v: Double)

/** Q-agg-06: custom typed UDAF — numerically stable weighted mean +
  * Welford/Chan sample variance (SURVEY.md §2B).
  *
  * Distributed correctness: `merge` is associative & commutative, so Spark's
  * partial (map-side) + final aggregation applies — shuffle volume is one
  * ~80-byte buffer per group per partition regardless of input size.
  */
object WeightedStats extends Aggregator[WInput, WBuf, WOut] {

  private val S = 10 // decimal scale, mirrors DECIMAL(30,10)

  override def zero: WBuf = WBuf(BigDecimal(0), BigDecimal(0), 0L, 0.0, 0.0)

  override def reduce(b: WBuf, in: WInput): WBuf = {
    val n1 = b.n + 1
    val delta = in.v - b.mean
    val mean1 = b.mean + delta / n1
    val m21 = b.m2 + delta * (in.v - mean1)
    WBuf(
      b.wsum + BigDecimal(in.w).setScale(S, BigDecimal.RoundingMode.HALF_UP),
      b.wxsum + BigDecimal(in.x * in.w).setScale(S, BigDecimal.RoundingMode.HALF_UP),
      n1, mean1, m21)
  }

  override def merge(a: WBuf, b: WBuf): WBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      val mean = a.mean + delta * b.n / n
      val m2 = a.m2 + b.m2 + delta * delta * a.n * b.n / n
      WBuf(a.wsum + b.wsum, a.wxsum + b.wxsum, n, mean, m2)
    }
  }

  override def finish(r: WBuf): WOut = {
    // divide as doubles (not decimals): the oracle computes
    // CAST(sum AS DOUBLE) / CAST(sum AS DOUBLE) — identical IEEE division
    val wmean =
      if (r.wsum.signum == 0) Double.NaN
      else r.wxsum.toDouble / r.wsum.toDouble
    val v = if (r.n < 2) Double.NaN else r.m2 / (r.n - 1)
    WOut(wmean, v)
  }

  override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
  override def outputEncoder: Encoder[WOut] = Encoders.product[WOut]
}
