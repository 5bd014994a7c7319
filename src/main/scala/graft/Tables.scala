package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared fixture reader (SURVEY.md §7.2 phase 0).
  *
  * All fixture tables — including `events` — are plain parquet reads. The
  * timestamp columns (`events.ts`, `o_orderdate`, `l_shipdate`) are parquet
  * `timestamp[us]` with isAdjustedToUTC=false, which Spark 4 infers natively
  * as TIMESTAMP_NTZ — lining up with DuckDB's naive TIMESTAMP, so the oracle
  * comparison needs no conversion on either side. (Earlier fixture
  * generations wrote `events.ts` as TIMESTAMP(NANOS), which needed a
  * nanosAsLong + truncate-to-µs workaround here; the regenerated fixtures
  * made that a type error and it is gone — SURVEY.md §7.4 R6.)
  *
  * Scans stay declarative: no caching, no driver-side materialization —
  * Catalyst pushes each query's filters/projections into the parquet scan
  * (verify with `.explain("formatted")`: PushedFilters / ReadSchema).
  *
  * 100 TB note: at scale these would be partitioned-directory reads (e.g.
  * `events/date=.../`) registered in a catalog so partition pruning + DPP
  * apply; the single-file fixture layout changes nothing about the query
  * code above this helper.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // Keyed on the SparkSession OBJECT (identity equality), not its
  // identityHashCode — a hash collision between two sessions in one JVM
  // would skip registration against the new session's catalog. Stopped /
  // overflowing sessions are evicted by SessionMemo (re-registering
  // against a fresh session is cheap and idempotent).
  private val registeredDir = new SessionMemo[SparkSession, String](identity)

  /** Register all fixtures as temp views (for SQL-string entry points).
    * Idempotent per (session, dir): several SQL-entry queries call this
    * back-to-back in Verify/Bench and re-registering 10 views each time
    * costs more than the queries themselves.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    if (!registeredDir.get(spark).contains(sfDir)) {
      names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
      registeredDir.put(spark, sfDir)
    }
  }
}
