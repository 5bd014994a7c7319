package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._

/** One bulk-delivery target. Implementations MUST be idempotent in
  * (shard, batchIdx): redelivering the same batch (task retry, full job
  * replay) must leave the store with no duplicates — the same contract a
  * real document store gives bulk writers that index by `_id`.
  */
trait BulkClient extends Serializable {
  def send(shard: Int, batchIdx: Int, docs: Seq[(String, String)]): Unit
}

/** Filesystem-backed [[BulkClient]]: each batch lands as one JSONL file
  * under a deterministic `shard=NNNNN/batch-MMMMMM.jsonl` name, written
  * to a temp file and atomically renamed. Replays overwrite byte-identical
  * files instead of appending — the offline analog of `_id`-keyed
  * upserts (no network/store in this environment; the ROUTING, BATCHING,
  * and IDEMPOTENCY are the production shape under test).
  */
case class FileBulkClient(dir: String) extends BulkClient {
  override def send(shard: Int, batchIdx: Int, docs: Seq[(String, String)]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val d = Paths.get(dir, f"shard=$shard%05d")
    Files.createDirectories(d)
    val tmp = Files.createTempFile(d, s".batch-$batchIdx-", ".tmp")
    val body = docs.map { case (id, doc) => s"""{"_id":"$id","doc":$doc}""" }
      .mkString("", "\n", "\n")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, d.resolve(f"batch-$batchIdx%06d.jsonl"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}

/** Production writer surface (SURVEY.md §2.A / §7.6). The reference
  * engine's defining half is "bulk-load query results into a keyed store,
  * idempotently, partition-parallel"; the real connector and metastore are
  * environment-blocked, but the writer SHAPES are not:
  *
  *  1. [[writePartitioned]] — warehouse layout: parquet partitioned by
  *     low-cardinality columns, so downstream scans partition-prune.
  *  2. [[bulkIndex]] — ES-style bulk sink: rows routed to a shard by
  *     hash(`_id`) (deterministic, like ES routing), ordered within the
  *     shard, and delivered in `batchSize`-doc batches via foreachPartition
  *     — no driver collect at any size. Deterministic routing + ordering
  *     means batch membership is stable across replays, so an idempotent
  *     [[BulkClient]] yields exactly-once-equivalent results after any
  *     number of retries.
  */
object Writers {

  /** Partitioned warehouse write; returns the path for chaining. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): String = {
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
    path
  }

  /** Bucketed warehouse table: pays the shuffle ONCE at write time so
    * every later equi-join or aggregation on `bucketCols` reads
    * co-located buckets and skips its exchange entirely — the layout for
    * a fact table joined repeatedly on the same key at 100 TB. sortBy
    * keeps each bucket file key-ordered for merge-friendly reads.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(buckets > 0 && bucketCols.nonEmpty, s"bad buckets=$buckets/$bucketCols")
    df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bulk-index `df` through `client`. `idCol` is the document `_id`
    * (stringified), `docCol` the serialized document body.
    */
  def bulkIndex(df: DataFrame, idCol: String, docCol: String,
      shards: Int, batchSize: Int, client: BulkClient): Unit = {
    require(shards > 0 && batchSize > 0, s"bad shards=$shards/batchSize=$batchSize")
    df.select(col(idCol).cast("string").as("_id"), col(docCol).as("_doc"))
      // hash routing on _id: the shard a doc lands in never depends on
      // which task produced it, so replays re-route identically
      .repartition(shards, col("_id"))
      .sortWithinPartitions("_id")
      .foreachPartition { (rows: Iterator[Row]) =>
        val shard = org.apache.spark.TaskContext.getPartitionId()
        rows.grouped(batchSize).zipWithIndex.foreach { case (batch, bi) =>
          client.send(shard, bi, batch.map(r => (r.getString(0), r.getString(1))))
        }
      }
  }
}
