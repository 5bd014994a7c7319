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

  test("q_agg_joinest: scalar re-derivation + one-sided estimate (r18 closing-trio pin)") {
    val row = SparkEntry.queries("q_agg_joinest")(spark, sf0001).collect().head
    val (n1, n2, exactN, cmEst) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(row.getBoolean(4), s"one-sided guarantee broken: est $cmEst < exact $exactN")
    assert(row.getBoolean(5), "published (e/w)·N₁·N₂ bound broken")
    // re-derive BOTH numbers scalar-side from the fixture: the exact
    // join size as the count-product sum, the estimate as min-over-lanes
    // CM inner product with the SAME md5 lane hash
    val md = java.security.MessageDigest.getInstance("MD5")
    def lane(j: Int, key: Long): Int = {
      val hex = md.digest(s"$j:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 4096L).toInt
    }
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id").collect().map(_.getLong(0))
    val os = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0))
    assert(ev.length.toLong == n1 && os.length.toLong == n2)
    val c1 = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c2 = os.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exactScalar = c1.map { case (k, n) => n * c2.getOrElse(k, 0L) }.sum
    assert(exactScalar == exactN, s"exact leg drifted: $exactScalar vs $exactN")
    val estScalar = (0 to 3).map { j =>
      val a = new Array[Long](4096); val b = new Array[Long](4096)
      c1.foreach { case (k, n) => a(lane(j, k)) += n }
      c2.foreach { case (k, n) => b(lane(j, k)) += n }
      (0 until 4096).map(i => a(i) * b(i)).sum
    }.min
    assert(estScalar == cmEst, s"CM inner product drifted: $estScalar vs $cmEst")
  }

  test("q_agg_joinest plan: sketches aggregate two-phase; the exact leg is the only table-scale join") {
    val df = SparkEntry.queries("q_agg_joinest")(spark, sf0001)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct"), fin.take(2500))
    // both sketch builds are partial+final hash aggregates keyed on (j, b)
    assert("HashAggregate\\(keys=\\[j#".r.findAllIn(fin).size >= 2, fin.take(2500))
    // the estimate/count attaches ride 1-row broadcasts (3 BNLJ cross
    // joins of single-row frames), never a shuffle
    assert("BroadcastNestedLoopJoin".r.findAllIn(fin).size == 3, fin.take(2500))
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
