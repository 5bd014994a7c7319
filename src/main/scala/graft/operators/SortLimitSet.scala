package graft.operators

import graft.{Dets, QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2.F (sorts / limits / top-k) + §2.G (set operations).
  *
  * Scale notes: global sort is a range-partitioned shuffle (Spark samples
  * boundaries); `orderBy(...).limit(k)` collapses to TakeOrderedAndProject —
  * a per-partition top-k + driver merge, no full sort, which is the plan we
  * want at 100 TB. Set ops are hash-partitioned distincts; UNION ALL is a
  * zero-shuffle concat.
  */
object SortLimitSet extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Multi-column sort, mixed asc/desc, explicit null ordering (Spark's
    // asc default is NULLS FIRST, DuckDB's is NULLS LAST — spelled out).
    "q_sort_multi" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .withColumn("seg_n", expr("nullif(c_mktsegment, 'BUILDING')"))
        .select("c_custkey", "seg_n", "c_acctbal")
        .orderBy(col("seg_n").asc_nulls_first, col("c_acctbal").desc, col("c_custkey"))),

    // Global top-k: TakeOrderedAndProjectExec, not a full sort.
    "q_limit_topk" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)),

    // Pagination: rows 21-40 of a deterministic order.
    "q_limit_offset" -> ((s, dir) =>
      Tables(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey").offset(20).limit(20)),

    // UNION ALL of reshaped halves + provenance tag.
    "q_set_unionall" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val neg = c.where(col("c_acctbal") < 0)
        .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"), lit("neg").as("tag"))
      val hi = c.where(col("c_acctbal") >= 9000)
        .select(col("c_custkey").as("id"), col("c_acctbal").as("bal"), lit("high").as("tag"))
      neg.unionByName(hi).orderBy("tag", "id")
    }),

    // UNION distinct of customer vs supplier nation keys.
    "q_set_union" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.union(sup).distinct().orderBy("nk")
    }),

    "q_set_intersect" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.intersect(sup).orderBy("nk")
    }),

    "q_set_except" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.except(sup).orderBy("nk")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_sort_multi" -> ("SELECT c_custkey, nullif(c_mktsegment,'BUILDING') AS seg_n, " +
      "c_acctbal FROM customer ORDER BY seg_n ASC NULLS FIRST, c_acctbal DESC, c_custkey"),

    "q_limit_topk" -> ("SELECT l_orderkey, l_linenumber, " +
      "l_extendedprice * (1.0 - l_discount) AS revenue FROM lineitem " +
      "ORDER BY revenue DESC, l_orderkey, l_linenumber LIMIT 20"),

    "q_limit_offset" -> ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
      "ORDER BY o_orderkey LIMIT 20 OFFSET 20"),

    "q_set_unionall" -> ("SELECT * FROM (" +
      "SELECT c_custkey AS id, c_acctbal AS bal, 'neg' AS tag FROM customer WHERE c_acctbal < 0 " +
      "UNION ALL SELECT c_custkey, c_acctbal, 'high' FROM customer WHERE c_acctbal >= 9000) " +
      "ORDER BY tag, id"),

    "q_set_union" -> ("SELECT c_nationkey AS nk FROM customer UNION " +
      "SELECT s_nationkey FROM supplier ORDER BY nk"),

    "q_set_intersect" -> ("SELECT c_nationkey AS nk FROM customer INTERSECT " +
      "SELECT s_nationkey FROM supplier ORDER BY nk"),

    "q_set_except" -> ("SELECT c_nationkey AS nk FROM customer EXCEPT " +
      "SELECT s_nationkey FROM supplier ORDER BY nk"),
  )
}
