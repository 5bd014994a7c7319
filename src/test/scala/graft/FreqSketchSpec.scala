package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.FreqSketch

/** The TypedImperativeAggregate contract for freq_sketch: exactness
  * below eviction through any split + the serde boundary, and the
  * NO_FALSE_NEGATIVES bounds guarantee once eviction kicks in — the
  * regime the fixture never reaches but 100 TB always does.
  */
class FreqSketchSpec extends AnyFunSuite {

  private val agg = FreqSketch(Literal("x"), 8)

  private def toMap(m: Any): Map[String, (Long, Long, Long)] = {
    val md = m.asInstanceOf[MapData]
    (0 until md.numElements()).map { i =>
      val k = md.keyArray().getUTF8String(i).toString
      val row = md.valueArray().getStruct(i, 3)
      k -> ((row.getLong(0), row.getLong(1), row.getLong(2)))
    }.toMap
  }

  test("exact below eviction: est == lb == ub == true count, any split, through serde") {
    val stream = Seq.tabulate(100)(i => s"w${i % 5}") // 5 distinct << 0.75*8
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (cut <- Seq(0, 1, 37, 50, 99, 100)) {
      val (l, r) = stream.splitAt(cut)
      val bl = agg.createAggregationBuffer(); l.foreach(bl.update)
      val br = agg.createAggregationBuffer(); r.foreach(br.update)
      val merged = agg.merge(agg.deserialize(agg.serialize(bl)),
        agg.deserialize(agg.serialize(br)))
      val got = toMap(agg.eval(merged))
      assert(got.keySet == truth.keySet)
      got.foreach { case (k, (est, lb, ub)) =>
        assert(est == truth(k) && lb == truth(k) && ub == truth(k), s"$k: $est/$lb/$ub")
      }
    }
  }

  test("bounds hold under eviction and the heavy hitter survives") {
    // 40 distinct items through an 8-slot map forces eviction; the one
    // genuinely heavy item must still be reported with lb <= true <= ub
    val heavy = Seq.fill(500)("HOT")
    val noise = (0 until 40).flatMap(i => Seq.fill(5)(s"n$i"))
    val buf = agg.createAggregationBuffer()
    (heavy ++ noise).foreach(buf.update)
    val got = toMap(agg.eval(agg.deserialize(agg.serialize(buf))))
    assert(got.contains("HOT"), s"heavy hitter evicted: ${got.keys}")
    val (est, lb, ub) = got("HOT")
    assert(lb <= 500 && 500 <= ub && lb <= est && est <= ub, s"$est/$lb/$ub")
  }

  test("empty buffer serves an empty map") {
    assert(toMap(agg.eval(agg.createAggregationBuffer())).isEmpty)
    assert(agg.eval(agg.createAggregationBuffer())
      .isInstanceOf[ArrayBasedMapData])
  }
}
