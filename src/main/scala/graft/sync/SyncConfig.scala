package graft.sync

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import graft.sinks.BulkClient

/** The reference's startup shape (SURVEY §3.1): a CONFIG enumerates sync
  * jobs — each naming its source query/table, id column, document
  * fields, target sizing, and full|incremental mode — and an
  * orchestration loop executes them one by one. [[fromJson]] parses that
  * config (Jackson, already on Spark's classpath — no new dependency);
  * [[runAll]] is the loop, with per-job failure ISOLATION: one job
  * failing (bad SQL, missing table) must not kill the batch run, it
  * lands as a failed [[JobOutcome]] in the report while the remaining
  * jobs still deliver — the operational contract of a nightly multi-job
  * sync.
  *
  * Config shape:
  * {{{
  * {"jobs": [{
  *   "name": "orders_full",
  *   "table": "orders",                  // or "sql": "SELECT ..."
  *   "idCol": "o_orderkey",
  *   "fields": [{"name": "order_id", "expr": "o_orderkey", "quoted": false}],
  *   "shards": 8, "batchSize": 500,      // optional, defaulted
  *   "mode": "full"                      // or {"watermarkCol": ..., "from": ...}
  * }]}
  * }}}
  */
object SyncConfig {

  final case class JobOutcome(job: String, ok: Boolean, docs: Long,
      batches: Long, error: Option[String])

  def fromJson(json: String): Seq[SyncJob] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val jobs = root.get("jobs")
    require(jobs != null && jobs.isArray && jobs.size > 0,
      "sync config needs a non-empty jobs array")
    jobs.elements.asScala.map { j =>
      def str(f: String): String = {
        val n = j.get(f)
        require(n != null && n.isTextual, s"job field '$f' missing or not a string")
        n.asText
      }
      val source =
        if (j.has("table")) SyncSource.Table(str("table"))
        else SyncSource.Sql(str("sql"))
      val fields = j.get("fields") match {
        case a if a != null && a.isArray => a.elements.asScala.map { f =>
          DocField(f.get("name").asText, f.get("expr").asText,
            f.has("quoted") && f.get("quoted").asBoolean)
        }.toSeq
        case _ => throw new IllegalArgumentException(
          s"job '${str("name")}' needs a fields array")
      }
      val mode = j.get("mode") match {
        case null => SyncMode.Full
        case m if m.isTextual && m.asText == "full" => SyncMode.Full
        case m if m.isObject => SyncMode.Incremental(
          m.get("watermarkCol").asText, m.get("from").asText)
        case m => throw new IllegalArgumentException(s"bad mode: $m")
      }
      SyncJob(str("name"), source, str("idCol"), fields,
        shards = if (j.has("shards")) j.get("shards").asInt else 8,
        batchSize = if (j.has("batchSize")) j.get("batchSize").asInt else 500,
        mode = mode)
    }.toSeq
  }

  /** The orchestration loop. Jobs run sequentially (the reference is a
    * single-process loop; on a shared cluster, sequential jobs also keep
    * peak resource use to one job's worth — parallelism belongs INSIDE a
    * job, where Spark already provides it). Each job's outcome carries
    * its delivered doc/batch counts from the same planned stats the
    * oracle checks; a throwing job is caught, reported, and does not
    * stop the loop.
    */
  def runAll(spark: SparkSession, sfDir: String, jobs: Seq[SyncJob],
      clientFor: SyncJob => BulkClient): Seq[JobOutcome] = {
    val dupNames = jobs.groupBy(_.name).collect { case (n, js) if js.size > 1 => n }
    require(dupNames.isEmpty, s"duplicate job names: ${dupNames.mkString(", ")}")
    jobs.map { job =>
      try {
        val st = SyncRunner.stats(SyncRunner.plan(spark, sfDir, job))
          .agg(org.apache.spark.sql.functions.sum("n_docs"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1))).head()
        SyncRunner.run(spark, sfDir, job, clientFor(job))
        JobOutcome(job.name, ok = true,
          docs = if (st.isNullAt(0)) 0L else st.getLong(0),
          batches = st.getLong(1), error = None)
      } catch {
        case e: Throwable =>
          JobOutcome(job.name, ok = false, docs = 0L, batches = 0L,
            error = Some(e.toString.linesIterator.next()))
      }
    }
  }
}
