package graft.operators

import graft.{Dets, QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2.A — sources & sinks.
  *
  * The reference's surface is "scan a Hive table / HiveQL result, build JSON
  * docs with a configured `_id`, bulk-index in batches". Here the scan side
  * is a parquet read (pushdown verified by Catalyst) and the ES sink is
  * modeled as the *document-construction* stage: `(es_id, routing, doc)`
  * rows, which a real `org.elasticsearch.spark.sql` writer would bulk-index
  * partition-parallel with idempotent ids (100 TB note in SURVEY.md §7.6).
  */
object ScanSink extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full scan, all columns; pushdown has nothing to do — baseline scan.
    "q_scan_parquet" -> ((s, dir) =>
      Tables(s, dir, "region").orderBy("r_regionkey")),

    // SQL-string entry point (the reference's jobs are HiveQL strings):
    // register views, run textual SQL through the same Catalyst pipeline.
    "q_scan_sql_view" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("SELECT n_nationkey, n_name, r_name FROM nation JOIN region " +
        "ON n_regionkey = r_regionkey ORDER BY n_nationkey")
    }),

    // Projection + predicate pushed into the parquet scan: the physical plan
    // shows PushedFilters on l_shipdate and a 3-column ReadSchema.
    "q_scan_pushdown" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= tsLit("1997-01-01") &&
               col("l_shipdate") <  tsLit("1997-04-01"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // ES bulk-sink analog: doc JSON built with explicit concat (NOT to_json —
    // cross-engine float formatting differs), _id from the configured key
    // column, routing = hash-mod like ES routing shards.
    "q_sink_esdocs" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(
          o("o_orderkey").as("es_id"),
          pmod(o("o_custkey"), lit(8L)).as("routing"),
          concat(
            lit("{\"order_id\":"), o("o_orderkey").cast("string"),
            lit(",\"customer\":\""), c("c_name"),
            lit("\",\"status\":\""), o("o_orderstatus"),
            lit("\",\"total\":"), money(o("o_totalprice")).cast("string"),
            lit("}")).as("doc"))
        .orderBy("es_id")
    }),

    // Bulk batching analog: batch number of size 500 in key order, stats per
    // batch. The global rank is computed scalably: deterministic key-range
    // buckets (never a sampled range partitioner — bucket membership must
    // not depend on run-time sampling), a per-bucket count whose running
    // total gives each bucket's rank offset, and a PARALLEL per-bucket
    // row_number. The only totally-ordered window runs over the bucket
    // COUNTS (one row per bucket — thousands at 100 TB, never row-scale);
    // no row-scale single-partition window anywhere in the plan.
    "q_sink_batched" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(col("o_orderkey"), expr("o_orderkey DIV 2048 AS bkt"))
      val offs = o.groupBy("bkt").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum("cnt").over(
          Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select("bkt", "off")
      o.join(broadcast(offs), "bkt")
        .withColumn("rn", col("off") +
          row_number().over(Window.partitionBy("bkt").orderBy("o_orderkey")))
        .withColumn("batch_id", expr("CAST((rn - 1) DIV 500 AS BIGINT)"))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n_docs"),
             min("o_orderkey").as("first_key"),
             max("o_orderkey").as("last_key"))
        .orderBy("batch_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_scan_parquet" -> "SELECT * FROM region ORDER BY r_regionkey",

    "q_scan_sql_view" -> ("SELECT n_nationkey, n_name, r_name FROM nation " +
      "JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey"),

    "q_scan_pushdown" -> ("SELECT l_orderkey, l_linenumber, l_quantity " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' " +
      "AND l_shipdate < TIMESTAMP '1997-04-01' " +
      "ORDER BY l_orderkey, l_linenumber"),

    "q_sink_esdocs" -> ("SELECT o_orderkey AS es_id, o_custkey % 8 AS routing, " +
      "concat('{\"order_id\":', CAST(o_orderkey AS VARCHAR), " +
      "',\"customer\":\"', c_name, '\",\"status\":\"', o_orderstatus, " +
      "'\",\"total\":', CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), '}') AS doc " +
      "FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY es_id"),

    "q_sink_batched" -> ("SELECT batch_id, count(*) AS n_docs, " +
      "min(o_orderkey) AS first_key, max(o_orderkey) AS last_key FROM " +
      "(SELECT o_orderkey, (row_number() OVER (ORDER BY o_orderkey) - 1) // 500 AS batch_id FROM orders) " +
      "GROUP BY batch_id ORDER BY batch_id"),
  )
}
