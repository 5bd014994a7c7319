package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query executes on sf0.001 and returns a sane result;
  * targeted shape assertions where the answer is structurally known.
  * (Value-level correctness is the DuckDB oracle harness — tools/compare.py;
  * these specs are the fast in-repo safety net.)
  */
class AllQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("driver contract: every oracle key has a query; flagship smokes") {
    val qs = SparkEntry.queries
    val missing = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q_agg_hashgroup has the Q1 group structure") {
    val rows = SparkEntry.queries("q_agg_hashgroup")(spark, sf0001).collect()
    assert(rows.length >= 4 && rows.length <= 6)
    assert(rows.map(_.getAs[Double]("sum_qty")).forall(_ > 0))
  }

  test("q_join_cross is exactly |region| x |nation|") {
    assert(SparkEntry.queries("q_join_cross")(spark, sf0001).count() == 125)
  }

  test("q_limit_topk returns exactly 20 rows in descending revenue") {
    val rev = SparkEntry.queries("q_limit_topk")(spark, sf0001)
      .collect().map(_.getAs[Double]("revenue"))
    assert(rev.length == 20)
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("q_sim_topk: 10 probes x 5 neighbors, scores within [-1, 1] desc per probe") {
    val rows = SparkEntry.queries("q_sim_topk")(spark, sf0001).collect()
    assert(rows.length == 50)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, g) =>
      val scores = g.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(s => s >= -1.0 && s <= 1.0))
    }
  }

  test("q_stream_session: every session spans >= its event count - sane bounds") {
    val rows = SparkEntry.queries("q_stream_session")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val start = r.getAs[java.time.LocalDateTime]("s_start")
      val end = r.getAs[java.time.LocalDateTime]("s_end")
      assert(!end.isBefore(start.plusMinutes(30)))
    }
  }

  test("q_agg_approxdistinct: HLL estimate within 10% of exact") {
    SparkEntry.queries("q_agg_approxdistinct")(spark, sf0001).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10)
    }
  }

  test("q_dedup_exact keeps every distinct text exactly once") {
    val docs = Tables(spark, sf0001, "documents")
    val expected = docs.select("text").distinct().count()
    assert(SparkEntry.queries("q_dedup_exact")(spark, sf0001).count() == expected)
  }
}
