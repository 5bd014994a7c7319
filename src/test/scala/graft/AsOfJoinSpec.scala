package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

/** The native as-of join operator (logical node → strategy → physical
  * merge): value-identical to the composed window form, right physical
  * shape, loud type guards. The oracle gate cross-checks it against
  * DuckDB; DeterminismSpec re-runs it across partition counts.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def events = Tables(spark, sf0001, "events")
    .select("user_id", "ts", "event_id")
  private def orders = Tables(spark, sf0001, "orders")
    .select("o_custkey", "o_orderdate", "o_orderkey")

  private def native = AsOfJoin.asOf(events, orders,
    leftKey = "user_id", rightKey = "o_custkey",
    leftTime = "ts", rightTime = "o_orderdate",
    rightOrder = Seq("o_orderkey"))

  test("native as-of equals the composed window implementation exactly") {
    val viaNative = native
      .select("event_id", "user_id", "o_orderkey", "o_orderdate")
      .orderBy("event_id").collect().map(_.toString).toSeq
    val viaWindow = SparkEntry.queries("q_join_asof")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(viaNative == viaWindow)
    assert(viaNative.size == events.count())
  }

  test("physical plan: AsOfJoinExec fed by per-side exchanges and sorts") {
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(3000))
    // EnsureRequirements satisfied the operator's contract: each side
    // hash-partitioned on its key and sorted (key, time[, order])
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).nonEmpty, p.take(3000))
    assert("Exchange hashpartitioning\\(o_custkey".r.findAllIn(p).nonEmpty, p.take(3000))
    assert("Sort \\[".r.findAllIn(p).size >= 2, p.take(3000))
    // and there is NO union / window machinery (the composed form's cost)
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("Union"), p.take(3000))
  }

  test("events before any order carry nulls (left-outer semantics)") {
    val unmatched = native.where(col("o_orderkey").isNull).count()
    val matched = native.where(col("o_orderkey").isNotNull).count()
    assert(matched > 0)
    // the earliest event of a user with no prior order must still appear
    assert(unmatched + matched == events.count())
  }

  test("non-long-backed key/time columns are refused loudly") {
    val bad = Tables(spark, sf0001, "documents").select(
      col("lang"), col("doc_id"), col("n_chars"))
    val e = intercept[IllegalArgumentException](
      AsOfJoin.asOf(bad, bad.select(col("lang").as("l2"),
          col("doc_id").as("d2"), col("n_chars").as("n2")),
        "lang", "l2", "doc_id", "d2"))
    assert(e.getMessage.contains("long-backed"))
  }
}
