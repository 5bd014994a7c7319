package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One §2 family of the SURVEY.md operator inventory: a set of named
  * queries plus (where SQL-expressible) their DuckDB oracle SQL.
  */
trait QueryFamily {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Determinism helpers — SURVEY.md §7.4 is law: the t2 gate hash-compares
  * our parquet output against DuckDB running the oracle SQL, so every
  * query needs a deterministic total order, order-independent arithmetic,
  * and identical output types in both engines.
  */
object Dets {
  /** 2-dp money double → exact DECIMAL(12,2): sums become order-independent
    * integer arithmetic in both engines. Narrow precision keeps products of
    * three factors well under DuckDB's 38-digit multiply limit.
    */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** 2-dp fraction (discount/tax), already combined with 1.0 in double space
    * first so both engines cast the identical double.
    */
  def frac(c: Column): Column = c.cast(DecimalType(4, 2))

  /** General measure with up to 6 dp (events.value). */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  def dbl(c: Column): Column = c.cast("double")
  def big(c: Column): Column = c.cast("bigint")

  /** Exact mean: double(exact decimal sum) / count — one IEEE division,
    * identical in Spark and DuckDB regardless of aggregation order.
    */
  def avgMoney(c: Column): Column = dbl(sum(money(c))) / count(lit(1))

  /** TIMESTAMP_NTZ literal from 'yyyy-MM-dd'. */
  def tsLit(d: String): Column = lit(d).cast("timestamp_ntz")
}
