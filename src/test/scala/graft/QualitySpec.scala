package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-side pins for the quality family — the oracles pin the
  * arithmetic; these pin that the checks measure what they claim on the
  * fixture's known blemishes.
  */
class QualitySpec extends AnyFunSuite {
  import TestSpark._

  test("q_quality_expectations: ledger bounds + the fixture's known blemishes") {
    val rows = SparkEntry.queries("q_quality_expectations")(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(rows.size == 8, s"expected 8 checks, got ${rows.keySet}")
    rows.foreach { case (name, (n, v, pass)) =>
      assert(v >= 0 && v <= n, s"$name: violations $v outside [0, $n]")
      assert(pass == (v == 0), s"$name: pass flag disagrees with count")
    }
    // the fixture's two deliberate-shaped blemishes are REAL violations —
    // a ledger that reads all-green is measuring nothing
    assert(rows("customer_acctbal_nonneg")._2 > 0, "negative balances not seen")
    assert(rows("lineitem_ship_after_order")._2 > 0, "early ship dates not seen")
    // and the structurally-clean checks hold
    assert(rows("orders_pk_unique")._2 == 0, "fixture pk uniqueness broken?")
    assert(rows("lineitem_fk_orders")._2 == 0, "fixture FK orphans appeared?")
  }

  test("q_quality_drift: TV is a [0,1] distance and halves are populated") {
    val rows = SparkEntry.queries("q_quality_drift")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nr, nc, tv) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nr > 0 && nc > 0, s"${r.getString(0)}: an empty half degenerates TV")
      assert(tv >= 0.0 && tv <= 1.0, s"${r.getString(0)}: TV $tv outside [0,1]")
      assert(r.getBoolean(4) == (tv > 0.1), "drifted flag disagrees with TV")
    }
  }
}
