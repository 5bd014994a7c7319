package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized as `QueryFamily` modules under `graft.operators`,
  * one per SURVEY.md §2 letter; this object is the aggregation point the
  * driver's smoke/verify/bench harnesses consume.
  */
object SparkEntry {
  private val families: Seq[QueryFamily] = Seq(
    operators.ScanSink,      // §2.A sources & sinks
    operators.Warehouse,     // §2.A catalog & layout: metastore, partitioning, bucketing
    operators.ProjectFilter, // §2.B projection / filter / predicates
    operators.Subqueries,    // correlated/IN subqueries + CTE (HiveQL surface)
    operators.Joins,         // §2.C joins
    operators.Aggregates,    // §2.D aggregations
    operators.Windows,       // §2.E window functions
    operators.TimeSeries,    // §2.E time-series: cohorts, gap-fill, ffill, outliers
    operators.SortLimitSet,  // §2.F sorts/limits + §2.G set ops
    operators.ScalarFuncs,   // §2.H scalar function families
    operators.Dedup,         // §2.I dedup + similarity search
    operators.GraphOps,      // §2.I iterative graph analytics (PageRank, degrees)
    operators.TextOps,       // §2.I text analysis + multimodal
    operators.Sampling,      // §2.I reproducible sampling / splits / cleaning pipeline
    operators.Packing,       // §2.I training-batch construction: packing, vocab, novelty
    operators.Quality,       // §2.I data-quality expectation ledger
    operators.StreamOps,     // §2.J streaming analogs
    operators.Extensibility, // §2.K UDF / UDAF / UDTF
    sync.SyncQueries,        // §3.1 config-driven sync-job orchestration
    sync.ViewQueries,        // incrementally-maintained aggregate views
    search.SearchQueries,    // inverted index + ranked retrieval (serve side)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_hashgroup")(spark, "/root/testdata/sf0.001")

  // toMap silently last-wins on duplicates — a copy-pasted key in one
  // family would shadow another family's query and shrink the verified
  // surface without any failure. Fail loudly instead.
  private def uniqueMap[V](kvs: Seq[(String, V)], what: String): Map[String, V] = {
    val dups = kvs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty, s"duplicate $what keys across families: ${dups.mkString(", ")}")
    kvs.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    uniqueMap(families.flatMap(_.queries), "query")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    uniqueMap(families.flatMap(_.oracles), "oracle")
}
