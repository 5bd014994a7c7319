package graft.sync

import graft.QueryFamily
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-checked surface of the sync-job layer (SURVEY §3.1): the same
  * job spec the runner delivers, reported as per-(shard, batch) stats the
  * DuckDB oracle can recompute. Both queries run through
  * [[SyncRunner.plan]]/[[SyncRunner.stats]] — the exact code path
  * [[SyncRunner.run]] batches from — so a green row certifies the
  * orchestration layer's routing + batching + incremental predicate, not a
  * lookalike.
  */
object SyncQueries extends QueryFamily {

  /** The demo job: orders → ES-style documents, like the reference's
    * bread-and-butter "sync this Hive table into this index" config.
    * Fields carry the Spark expression; [[duckDoc]] mirrors them in
    * DuckDB dialect (decimal-cast money so the value strings are
    * byte-identical across engines, per q_sink_esdocs).
    */
  private val ordersFields = Seq(
    DocField("order_id", "o_orderkey", quoted = false),
    DocField("status", "o_orderstatus", quoted = true),
    DocField("total", "CAST(o_totalprice AS DECIMAL(12,2))", quoted = false))

  private val duckDoc =
    "concat('{\"order_id\":', CAST(o_orderkey AS VARCHAR), " +
      "',\"status\":\"', o_orderstatus, " +
      "'\",\"total\":', CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), '}')"

  private def fullJob = SyncJob("orders_full", SyncSource.Table("orders"),
    idCol = "o_orderkey", fields = ordersFields, shards = 8, batchSize = 500)

  private def incrJob = fullJob.copy(name = "orders_incremental",
    mode = SyncMode.Incremental("o_orderdate", "TIMESTAMP '1997-06-01'"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sync_full" -> ((s, dir) => SyncRunner.stats(SyncRunner.plan(s, dir, fullJob))),
    "q_sync_incremental" -> ((s, dir) => SyncRunner.stats(SyncRunner.plan(s, dir, incrJob))),
  )

  /** DuckDB mirror of plan+stats. The oracle uses the simple per-shard
    * row_number form; the Spark side's bucket-offset decomposition is
    * rank-identical by construction (and that identity is exactly what
    * the hash gate certifies).
    */
  private def duckSync(where: String): String =
    "WITH src AS (SELECT CAST(o_orderkey AS VARCHAR) AS _id, " +
      s"$duckDoc AS doc FROM orders$where), " +
      "h AS (SELECT _id, doc, CAST(concat('0x', substr(md5(_id), 1, 15)) AS BIGINT) AS h FROM src), " +
      "r AS (SELECT _id, doc, h, h % 8 AS shard FROM h), " +
      "n AS (SELECT shard, _id, doc, row_number() OVER (PARTITION BY shard ORDER BY h, _id) AS rn FROM r) " +
      "SELECT CAST(shard AS BIGINT) AS shard, CAST((rn - 1) // 500 AS BIGINT) AS batch_id, " +
      "count(*) AS n_docs, CAST(sum(length(doc)) AS BIGINT) AS doc_bytes, " +
      "min(_id) AS first_id, max(_id) AS last_id " +
      "FROM n GROUP BY 1, 2 ORDER BY shard, batch_id"

  def oracles: Map[String, String] = Map(
    "q_sync_full" -> duckSync(""),
    "q_sync_incremental" -> duckSync(" WHERE o_orderdate > TIMESTAMP '1997-06-01'"),
  )
}
