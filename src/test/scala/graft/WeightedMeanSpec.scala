package graft

import graft.functions.{WeightedAcc, WeightedMean}
import org.scalatest.funsuite.AnyFunSuite

/** The UDAF's exactness claim: because the buffer is integer cents, any
  * reduce/merge split of the input gives the same buffer — checked over
  * many random partitions of random inputs (seeded, deterministic).
  */
class WeightedMeanSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def randomInputs(n: Int): Seq[(Double, Int)] =
    Seq.fill(n)((rnd.nextLong(50000000L) / 100.0, 1 + rnd.nextInt(5)))

  private def fold(xs: Seq[(Double, Int)]): WeightedAcc =
    xs.foldLeft(WeightedMean.zero)(WeightedMean.reduce)

  test("merge of any split equals straight fold (order/partition invariance)") {
    for (_ <- 1 to 200) {
      val xs = randomInputs(rnd.nextInt(40))
      val k = if (xs.isEmpty) 0 else rnd.nextInt(xs.size + 1)
      val (l, r) = xs.splitAt(k)
      assert(WeightedMean.merge(fold(l), fold(r)) == fold(xs))
      assert(WeightedMean.merge(fold(r), fold(l)) == fold(xs))
    }
  }

  test("finish matches the direct exact formula") {
    for (_ <- 1 to 200) {
      val xs = randomInputs(1 + rnd.nextInt(40))
      val expected =
        xs.map { case (p, w) => math.round(p * 100) * w.toLong }.sum.toDouble / 100.0 /
          xs.map(_._2.toLong).sum.toDouble
      assert(WeightedMean.finish(fold(xs)) == expected)
    }
  }

  test("empty input finishes to 0.0") {
    assert(WeightedMean.finish(WeightedMean.zero) == 0.0)
  }
}
