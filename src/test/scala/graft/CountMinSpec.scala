package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-side pins for the r15 sketch/stream additions — the oracles
  * pin the arithmetic; these pin the published guarantees the arithmetic
  * is supposed to deliver.
  */
class CountMinSpec extends AnyFunSuite {
  import TestSpark._

  test("q_agg_countmin: estimates are one-sided (never under-count)") {
    val rows = SparkEntry.queries("q_agg_countmin")(spark, sf0001).collect()
    assert(rows.length == 10, s"expected the top-10 users, got ${rows.length}")
    rows.foreach { r =>
      val (exact, cm) = (r.getLong(1), r.getLong(2))
      // THE Count-Min property: cell sums can only add other keys' mass
      assert(cm >= exact, s"CM under-counted user ${r.getLong(0)}: $cm < $exact")
    }
    // d=4 lanes over w=256 buckets on the fixture's key space: the min
    // lane is collision-free for most keys — a degenerate grid (bad hash,
    // wrong modulus) collapses this to 0
    val exactHits = rows.count(r => r.getLong(1) == r.getLong(2))
    assert(exactHits >= 5, s"only $exactHits/10 estimates exact — grid degenerated")
  }

  test("q_stream_latedata: the drop ledger partitions the stream exactly") {
    val rows = SparkEntry.queries("q_stream_latedata")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"${r.getString(0)}: total ${r.getLong(1)} != late ${r.getLong(2)} + kept ${r.getLong(3)}")
    }
    val late = rows.map(_.getLong(2)).sum
    val kept = rows.map(_.getLong(3)).sum
    // the sharded-arrival model must actually produce disorder, and the
    // watermark must not drop everything
    assert(late > 0, "no late events — the arrival model degenerated to in-order")
    assert(kept > 0, "everything dropped — watermark ran away")
  }
}
