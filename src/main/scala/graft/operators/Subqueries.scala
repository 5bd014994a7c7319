package graft.operators

import graft.{QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery & CTE surface — the reference's jobs are arbitrary HiveQL
  * strings, so correlated subqueries and WITH clauses are part of the
  * capability contract. Catalyst decorrelates these into joins
  * (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery): the
  * correlated count becomes a left outer aggregate join, the IN becomes a
  * left semi join — i.e. they scale exactly like §2.C joins, no
  * per-row re-execution.
  */
object Subqueries extends QueryFamily {

  private def sql(q: String)(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  private val scalarSql =
    "SELECT c_custkey, c_acctbal, " +
      "(SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders, " +
      "(SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders WHERE o_custkey = c_custkey) AS max_order " +
      "FROM customer ORDER BY c_custkey"

  private val inSql =
    "SELECT p_partkey, p_name FROM part WHERE p_partkey IN " +
      "(SELECT l_partkey FROM lineitem WHERE l_quantity > 45) " +
      "ORDER BY p_partkey"

  private val cteSql =
    "WITH rev AS (SELECT o_custkey, " +
      "SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total FROM orders GROUP BY o_custkey), " +
      "ranked AS (SELECT c_custkey, c_name, CAST(rev.total AS DOUBLE) AS total " +
      "FROM customer JOIN rev ON c_custkey = o_custkey) " +
      "SELECT c_custkey, c_name, total FROM ranked " +
      "WHERE total > 1000000 ORDER BY c_custkey"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sub_scalar" -> (sql(scalarSql) _),
    "q_sub_in" -> (sql(inSql) _),
    "q_sql_cte" -> (sql(cteSql) _),
  )

  // Identical ANSI SQL runs in DuckDB.
  def oracles: Map[String, String] = Map(
    "q_sub_scalar" -> scalarSql,
    "q_sub_in" -> inSql,
    "q_sql_cte" -> cteSql,
  )
}
