package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization through the real (Derby-backed) metastore:
  * ANALYZE TABLE column statistics let the optimizer estimate FILTER
  * selectivity, and that estimate flips a join from sort-merge to
  * broadcast — the decision that matters at 100 TB, where "dim filtered
  * to 1/5th fits in memory" can only be known from stats, never from
  * file sizes.
  *
  * Without CBO, Spark propagates the child's sizeInBytes through a
  * Filter untouched; with `spark.sql.cbo.enabled` + column stats the
  * estimate shrinks by the predicate's selectivity. The spec pins both
  * the statistics layer (optimizedPlan.stats) and the resulting physical
  * strategy, compile-time (no AQE involvement: the flip must come from
  * STATS, not from runtime sizes).
  */
class CboSpec extends AnyFunSuite {
  import TestSpark._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE column stats shrink the filter estimate and flip SMJ to broadcast") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft")
    Tables(spark, sf0001, "customer")
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").saveAsTable("graft.cust_stats")
    Tables(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").saveAsTable("graft.orders_stats")

    def query = spark.table("graft.orders_stats")
      .join(
        spark.table("graft.cust_stats")
          .where(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"))

    def filterEstimate: BigInt = query.queryExecution.optimizedPlan.stats.sizeInBytes

    withConfs(
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.adaptive.enabled" -> "false") {
      val noCbo = filterEstimate

      withConfs("spark.sql.cbo.enabled" -> "true") {
        spark.sql("ANALYZE TABLE graft.cust_stats COMPUTE STATISTICS")
        spark.sql("ANALYZE TABLE graft.cust_stats COMPUTE STATISTICS FOR COLUMNS c_mktsegment")
        spark.sql("ANALYZE TABLE graft.orders_stats COMPUTE STATISTICS")
        val withStats = filterEstimate
        assert(withStats < noCbo,
          s"column stats did not shrink the estimate: $withStats !< $noCbo")

        // threshold between the two estimates: only the stats-aware
        // estimate clears it, so the strategy choice IS the stats
        val threshold = (withStats + noCbo) / 2
        withConfs("spark.sql.autoBroadcastJoinThreshold" -> threshold.toString) {
          val plan = query.queryExecution.sparkPlan.toString
          assert(plan.contains("BroadcastHashJoin"),
            s"stats estimate $withStats under threshold $threshold should broadcast:\n${plan.take(800)}")
        }
        withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
          val plan = query.queryExecution.sparkPlan.toString
          assert(plan.contains("SortMergeJoin"),
            s"threshold -1 must fall back to sort-merge:\n${plan.take(800)}")
        }
      }
    }
  }
}
