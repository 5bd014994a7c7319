package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.K): weighted mean of a 2-dp money column.
  *
  * The buffer keeps exact integer cents (money * 100, half-up — identical
  * to a DECIMAL(12,2) cast) times the weight, so reduce/merge order cannot
  * change the result: the only floating-point ops are the two divisions in
  * `finish`, which the DuckDB oracle mirrors verbatim.
  */
case class WeightedAcc(sumWeightedCents: Long, sumWeights: Long)

object WeightedMean extends Aggregator[(Double, Int), WeightedAcc, Double] {
  def zero: WeightedAcc = WeightedAcc(0L, 0L)

  def reduce(b: WeightedAcc, a: (Double, Int)): WeightedAcc =
    WeightedAcc(b.sumWeightedCents + WeightedMean.cents(a._1) * a._2,
      b.sumWeights + a._2)

  /** money → exact integer cents, HALF_UP (round half AWAY FROM ZERO, like
    * CAST(x AS DECIMAL(12,2)) in both engines) — `math.round` would round
    * -0.125 half toward +inf and diverge on negative half-cent boundaries.
    */
  def cents(x: Double): Long =
    BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.unscaledValue.longValueExact

  def merge(x: WeightedAcc, y: WeightedAcc): WeightedAcc =
    WeightedAcc(x.sumWeightedCents + y.sumWeightedCents,
      x.sumWeights + y.sumWeights)

  def finish(r: WeightedAcc): Double =
    if (r.sumWeights == 0L) 0.0
    else r.sumWeightedCents.toDouble / 100.0 / r.sumWeights.toDouble

  def bufferEncoder: Encoder[WeightedAcc] = Encoders.product[WeightedAcc]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
