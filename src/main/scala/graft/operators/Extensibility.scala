package graft.operators

import graft.{Dets, QueryFamily, Tables}
import graft.functions.WeightedMean
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2.K — the public extension surface: scalar UDF, typed
  * Aggregator UDAF, and a generator (UDTF analog) via explode.
  *
  * Note on cost: a JVM-closure UDF blocks whole-stage codegen for its
  * operator (documented trade-off; the oracle-equivalent CASE expression
  * in q_fn_cond shows the codegen-friendly alternative). The Aggregator
  * buffers exact integer cents so partial/final merge order can't change
  * the result. The bigram generator is `explode(transform(sequence ...))`
  * — a Catalyst Generator node, the native UDTF path.
  */
object Extensibility extends QueryFamily {

  private val wmean = udaf(WeightedMean)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Scalar Scala UDF: order-priority scoring.
    "q_udf_scalar" -> ((s, dir) => {
      val prioScore = udf((p: String) => p match {
        case "1-URGENT" => 100L
        case "2-HIGH" => 80L
        case "3-MEDIUM" => 50L
        case "4-NOT SPECIFIED" => 30L
        case _ => 10L
      })
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          prioScore(col("o_orderpriority")).as("prio_score"))
        .orderBy("o_orderkey")
    }),

    // Typed UDAF: priority-weighted mean price per order status.
    "q_udaf_typed" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .withColumn("wt", expr("CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 5 " +
          "WHEN '2-HIGH' THEN 4 WHEN '3-MEDIUM' THEN 3 " +
          "WHEN '4-NOT SPECIFIED' THEN 2 ELSE 1 END AS INT)"))
        .groupBy("o_orderstatus")
        .agg(wmean(col("o_totalprice"), col("wt")).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // Table-generating function: bigram explosion, global top-20.
    "q_udtf_explode" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .selectExpr("split(text, ' ') AS t")
        .selectExpr("explode(transform(sequence(1, size(t) - 1), " +
          "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))) AS bigram")
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20)),
  )

  def oracles: Map[String, String] = Map(
    "q_udf_scalar" -> ("SELECT o_orderkey, o_orderpriority, " +
      "CAST(CASE o_orderpriority WHEN '1-URGENT' THEN 100 WHEN '2-HIGH' THEN 80 " +
      "WHEN '3-MEDIUM' THEN 50 WHEN '4-NOT SPECIFIED' THEN 30 ELSE 10 END AS BIGINT) AS prio_score " +
      "FROM orders ORDER BY o_orderkey"),

    // Mirrors WeightedMean.finish exactly: double(sum cents*wt)/100.0/sumW.
    "q_udaf_typed" -> ("WITH w AS (SELECT o_orderstatus, o_totalprice, " +
      "CASE o_orderpriority WHEN '1-URGENT' THEN 5 WHEN '2-HIGH' THEN 4 " +
      "WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 2 ELSE 1 END AS wt FROM orders) " +
      "SELECT o_orderstatus, " +
      "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) * wt) AS DOUBLE) " +
      "/ 100.0 / CAST(SUM(wt) AS DOUBLE) AS wavg_price, " +
      "count(*) AS n FROM w GROUP BY o_orderstatus ORDER BY o_orderstatus"),

    "q_udtf_explode" -> ("SELECT bigram, count(*) AS n FROM " +
      "(SELECT unnest([t[i] || ' ' || t[i+1] for i in generate_series(1, len(t) - 1)]) AS bigram " +
      "FROM (SELECT string_split(text, ' ') AS t FROM documents)) " +
      "GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20"),
  )
}
