package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fixture reader (SURVEY.md §7.2 phase 0).
  *
  * Every query function reads through here so that:
  *
  *  - `events.ts` (parquet `TIMESTAMP(NANOS)`) is readable at all: Spark's
  *    parquet reader rejects nano timestamps, so we read them as raw Long
  *    nanoseconds (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
  *    microseconds with *integer* division, which matches DuckDB's ns→µs
  *    truncation bit-for-bit (SURVEY.md §7.4 R6, verified V5/V6). The column
  *    is exposed as TIMESTAMP_NTZ to line up with DuckDB's naive TIMESTAMP.
  *  - scans stay declarative: no caching, no driver-side materialization —
  *    Catalyst pushes each query's filters/projections into the parquet scan
  *    (verify with `.explain("formatted")`: PushedFilters / ReadSchema).
  *
  * 100 TB note: at scale these would be partitioned-directory reads (e.g.
  * `events/date=.../`) registered in a catalog so partition pruning + DPP
  * apply; the single-file fixture layout changes nothing about the query
  * code above this helper.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // Runtime SQLConf consulted at read time; idempotent.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    case other => spark.read.parquet(s"$sfDir/$other.parquet")
  }

  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  /** Register all fixtures as temp views (for SQL-string entry points).
    * Idempotent per (session, dir): several SQL-entry queries call this
    * back-to-back in Verify/Bench and re-registering 10 views each time
    * costs more than the queries themselves.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    val key = Integer.valueOf(System.identityHashCode(spark))
    if (registeredDir.get(key) != sfDir) {
      names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
      registeredDir.put(key, sfDir)
    }
  }
}
