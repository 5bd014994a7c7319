package graft.operators

import graft.{Dets, QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2.E — window functions.
  *
  * Determinism: rank/dense_rank/percent_rank are computed over an ordering
  * with deliberate ties (a coarse bucket) — their outputs are well-defined
  * under ties; row_number/ntile get a unique tiebreaker appended so row
  * assignment is total. Every query ends with a unique total ORDER BY.
  *
  * Scale: windows partitioned by a key shuffle once on that key; the only
  * single-partition window in the repo is the batching demo in ScanSink
  * (documented there). Running/sliding frames stream in one pass per
  * partition; the RANGE frame is O(n log n) per partition.
  */
object Windows extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ranking family over (nation, coarse balance bucket desc).
    "q_win_rank" -> ((s, dir) => {
      val df = Tables(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000.0))
      val wTies = Window.partitionBy("c_nationkey").orderBy(col("bal_bucket").desc)
      val wTotal = Window.partitionBy("c_nationkey")
        .orderBy(col("bal_bucket").desc, col("c_custkey"))
      df.select(col("c_custkey"), col("c_nationkey"), col("bal_bucket"),
          big(rank().over(wTies)).as("rnk"),
          big(dense_rank().over(wTies)).as("drnk"),
          percent_rank().over(wTies).as("prnk"),
          big(row_number().over(wTotal)).as("rn"))
        .orderBy("c_custkey")
    }),

    // Top-3 orders per customer.
    "q_win_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), big(col("rn")).as("rn"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    // Running (cumulative) sum per customer in date order.
    "q_win_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          dbl(sum(money(col("o_totalprice"))).over(w)).as("run_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // Moving average over the previous 2 rows + current.
    "q_win_sliding" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          (dbl(sum(dec6(col("value"))).over(w)) / count(lit(1)).over(w)).as("mov_avg"))
        .orderBy("event_id")
    }),

    // RANGE frame over a numeric: all orders within +-1000 of the current
    // price inside the priority class.
    "q_win_rangeframe" -> ((s, dir) => {
      val over = "OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice " +
        "RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)"
      Tables(s, dir, "orders").selectExpr(
          "o_orderkey", "o_orderpriority", "o_totalprice",
          s"CAST(count(*) $over AS BIGINT) AS n_band",
          s"CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) $over AS DOUBLE) AS sum_band")
        .orderBy("o_orderkey")
    }),

    // lag/lead deltas over event time per user.
    "q_win_leadlag" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"),
          (col("value") - lag("value", 1).over(w)).as("delta"))
        .orderBy("event_id")
    }),

    // cume_dist over deliberate ties (same bucket trick as q_win_rank).
    "q_win_cumedist" -> ((s, dir) => {
      val df = Tables(s, dir, "customer")
        .withColumn("bal_bucket", floor(col("c_acctbal") / 1000.0))
      val w = Window.partitionBy("c_nationkey").orderBy(col("bal_bucket"))
      df.select(col("c_custkey"), col("c_nationkey"), col("bal_bucket"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_custkey")
    }),

    // Gaps-and-islands sessionization in the window DSL (lag + cumulative
    // flag sum) — the THIRD independent sessionization next to
    // session_window (q_stream_session) and flatMapGroupsWithState
    // (StreamDemo); this one emits per-USER session statistics. One
    // shuffle on user_id serves both window passes and the final agg.
    "q_win_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            expr("ts - prev >= INTERVAL 30 MINUTES"), 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(run))
        .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          big(sum(col("n"))).as("n_events"),
          max(col("n")).as("longest_session"),
          (dbl(sum(col("n"))) / count(lit(1))).as("avg_events"))
        .orderBy("user_id")
    }),

    // Windowed funnel (the ClickHouse windowFunnel / product-analytics
    // shape): per user, the strict view → click → purchase chain where
    // every step must land within 72 hours of the funnel entry. Each
    // step's earliest qualifying time is a conditional MIN over the SAME
    // user partition — three chained projections, one shuffle on
    // user_id, no self-joins (the naive per-step join cascade would
    // re-shuffle events three times; conditional windows over one
    // partitioning is the shape that survives 100 TB of events).
    "q_win_funnel" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
      val horizon = expr("t1 + INTERVAL 72 HOURS")
      Tables(s, dir, "events")
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t2",
          min(when(col("event_type") === "click" &&
            col("ts") > col("t1") && col("ts") <= horizon, col("ts"))).over(w))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" &&
            col("ts") > col("t2") && col("ts") <= horizon, col("ts"))).over(w))
        .groupBy("user_id")
        .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"))
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          when(col("t3").isNotNull, lit(3L))
            .when(col("t2").isNotNull, lit(2L))
            .when(col("t1").isNotNull, lit(1L))
            .otherwise(lit(0L)).as("depth"))
        .orderBy("user_id")
    }),

    // Event transition matrix (the Sankey/Markov view of a product
    // funnel): consecutive event-type pairs per user in time order,
    // counted globally with the distinct users that made each
    // transition. One lead() over the same user_id shuffle every other
    // event window uses; the transition table is O(|types|²) rows.
    "q_win_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("next_type", lead("event_type", 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n_transitions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("from_type", "to_type")
    }),

    // ntile + first/last/nth with explicit full frame.
    "q_win_ntile_firstlast" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          big(ntile(4).over(w)).as("quartile"),
          first(col("o_orderkey")).over(wFull).as("cheapest_key"),
          last(col("o_orderkey")).over(wFull).as("priciest_key"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"))
        .orderBy("o_orderkey")
    }),
  )

  def oracles: Map[String, String] = Map(
    // same chained conditional-window recompute; per-user values are
    // constant across the partition, so the min() collapse per user is
    // a no-op selection in both engines
    "q_win_funnel" ->
      ("WITH a AS (SELECT user_id, ts, event_type, " +
        "min(CASE WHEN event_type = 'view' THEN ts END) " +
        "OVER (PARTITION BY user_id) AS t1 FROM events), " +
        "b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 " +
        "AND ts <= t1 + INTERVAL 72 HOUR THEN ts END) " +
        "OVER (PARTITION BY user_id) AS t2 FROM a), " +
        "c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 " +
        "AND ts <= t1 + INTERVAL 72 HOUR THEN ts END) " +
        "OVER (PARTITION BY user_id) AS t3 FROM b) " +
        "SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3, " +
        "CAST(CASE WHEN min(t3) IS NOT NULL THEN 3 " +
        "WHEN min(t2) IS NOT NULL THEN 2 " +
        "WHEN min(t1) IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth " +
        "FROM c GROUP BY user_id ORDER BY user_id"),

    "q_win_transitions" ->
      ("WITH t AS (SELECT user_id, event_type, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type " +
        "FROM events) " +
        "SELECT event_type AS from_type, next_type AS to_type, " +
        "count(*) AS n_transitions, count(DISTINCT user_id) AS n_users " +
        "FROM t WHERE next_type IS NOT NULL " +
        "GROUP BY 1, 2 ORDER BY from_type, to_type"),

    "q_win_sessionize" -> ("WITH e AS (SELECT user_id, ts, event_id, " +
      "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL " +
      "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) " +
      ">= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM events), " +
      "sess AS (SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id " +
      "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
      "AS sid FROM e), " +
      "per AS (SELECT user_id, sid, count(*) AS n FROM sess GROUP BY user_id, sid) " +
      "SELECT user_id, count(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events, " +
      "max(n) AS longest_session, CAST(SUM(n) AS DOUBLE) / count(*) AS avg_events " +
      "FROM per GROUP BY user_id ORDER BY user_id"),

    "q_win_rank" -> ("SELECT c_custkey, c_nationkey, " +
      "CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket, " +
      "CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000.0) DESC) AS BIGINT) AS rnk, " +
      "CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000.0) DESC) AS BIGINT) AS drnk, " +
      "percent_rank() OVER (PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000.0) DESC) AS prnk, " +
      "CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000.0) DESC, c_custkey) AS BIGINT) AS rn " +
      "FROM customer ORDER BY c_custkey"),

    "q_win_topk" -> ("SELECT o_custkey, rn, o_orderkey, o_totalprice FROM " +
      "(SELECT o_custkey, o_orderkey, o_totalprice, " +
      "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn " +
      "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"),

    "q_win_running" -> ("SELECT o_custkey, o_orderdate, o_orderkey, " +
      "CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER " +
      "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total " +
      "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"),

    "q_win_sliding" -> ("SELECT event_id, user_id, ts, value, " +
      "CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) " +
      "/ COUNT(*) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg " +
      "FROM events ORDER BY event_id"),

    "q_win_rangeframe" -> ("SELECT o_orderkey, o_orderpriority, o_totalprice, " +
      "CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice " +
      "RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS BIGINT) AS n_band, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice " +
      "RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS DOUBLE) AS sum_band " +
      "FROM orders ORDER BY o_orderkey"),

    "q_win_leadlag" -> ("SELECT event_id, user_id, ts, value, " +
      "lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value, " +
      "lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value, " +
      "value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta " +
      "FROM events ORDER BY event_id"),

    "q_win_cumedist" -> ("SELECT c_custkey, c_nationkey, " +
      "CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket, " +
      "cume_dist() OVER (PARTITION BY c_nationkey ORDER BY floor(c_acctbal / 1000.0)) AS cd " +
      "FROM customer ORDER BY c_custkey"),

    "q_win_ntile_firstlast" -> ("SELECT o_orderkey, o_orderpriority, o_totalprice, " +
      "CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile, " +
      "first_value(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS cheapest_key, " +
      "last_value(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key, " +
      "nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key " +
      "FROM orders ORDER BY o_orderkey"),
  )
}
