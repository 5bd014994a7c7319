package graft.operators

import graft.{Dets, QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2.B — projection / filter / predicates. */
object ProjectFilter extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Column select + rename + reorder (ES-friendly field names).
    "q_project_rename" -> ((s, dir) =>
      Tables(s, dir, "customer").select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_mktsegment").as("segment"), col("c_nationkey").as("nation_id"))
        .orderBy("id")),

    // Computed columns: per-row double arithmetic is identical in both
    // engines (only aggregation order is hazardous), plus a concat key.
    "q_project_expr" -> ((s, dir) =>
      Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("line_key"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Compound predicate: AND/OR/NOT, IN, BETWEEN, LIKE.
    "q_filter_pred" -> ((s, dir) =>
      Tables(s, dir, "part").where(
        col("p_size").between(10, 20) &&
        (col("p_type").isin("PROMO", "ECONOMY") || col("p_brand").like("Brand#1%")) &&
        !(col("p_retailprice") < lit(920.0)))
        .select("p_partkey", "p_name", "p_type", "p_brand", "p_size", "p_retailprice")
        .orderBy("p_partkey")),

    // Three-valued logic: nullif-generated nulls, IS [NOT] NULL, null-safe
    // equality <=> (DuckDB: IS NOT DISTINCT FROM).
    "q_filter_null" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .withColumn("st_f", expr("nullif(o_orderstatus, 'P')"))
        .withColumn("st_o", expr("nullif(o_orderstatus, 'O')"))
        .where(col("st_f").isNull || (col("st_f") <=> col("st_o")))
        .select(col("o_orderkey"), col("st_f"), col("st_o"),
          (col("st_f") <=> col("st_o")).as("same_nullsafe"),
          col("st_o").isNotNull.as("o_not_null"))
        .orderBy("o_orderkey")),

    // Incremental-sync predicate (the reference's incremental mode): only
    // rows past the watermark. At 100 TB this is the partition-pruning
    // predicate — on a date-partitioned table it prunes at the catalog.
    "q_filter_incremental" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .where(col("o_orderdate") > tsLit("2000-06-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy("o_orderkey")),
  )

  def oracles: Map[String, String] = Map(
    "q_project_rename" -> ("SELECT c_custkey AS id, c_name AS name, " +
      "c_mktsegment AS segment, c_nationkey AS nation_id FROM customer ORDER BY id"),

    "q_project_expr" -> ("SELECT l_orderkey, l_linenumber, " +
      "l_extendedprice * (1.0 - l_discount) AS revenue, " +
      "concat_ws('-', l_orderkey, l_linenumber) AS line_key " +
      "FROM lineitem ORDER BY l_orderkey, l_linenumber"),

    "q_filter_pred" -> ("SELECT p_partkey, p_name, p_type, p_brand, p_size, " +
      "p_retailprice FROM part WHERE p_size BETWEEN 10 AND 20 AND " +
      "(p_type IN ('PROMO','ECONOMY') OR p_brand LIKE 'Brand#1%') AND " +
      "NOT (p_retailprice < 920.0) ORDER BY p_partkey"),

    "q_filter_null" -> ("SELECT o_orderkey, nullif(o_orderstatus,'P') AS st_f, " +
      "nullif(o_orderstatus,'O') AS st_o, " +
      "(nullif(o_orderstatus,'P') IS NOT DISTINCT FROM nullif(o_orderstatus,'O')) AS same_nullsafe, " +
      "(nullif(o_orderstatus,'O') IS NOT NULL) AS o_not_null FROM orders " +
      "WHERE nullif(o_orderstatus,'P') IS NULL OR " +
      "nullif(o_orderstatus,'P') IS NOT DISTINCT FROM nullif(o_orderstatus,'O') " +
      "ORDER BY o_orderkey"),

    "q_filter_incremental" -> ("SELECT o_orderkey, o_custkey, o_orderdate " +
      "FROM orders WHERE o_orderdate > TIMESTAMP '2000-06-01' ORDER BY o_orderkey"),
  )
}
