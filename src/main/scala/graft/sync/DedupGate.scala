package graft.sync

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.operators.Dedup

/** First-copy-wins dedup gate for a continuous ingest: each micro-batch
  * is probed against a DURABLE signature store of every document ever
  * seen, near-dups of earlier docs are shed, and the batch's own
  * signatures — shed docs included, the store is grow-only — are
  * appended before the survivors flow on to delivery. Plugged into
  * [[ContinuousSync.start]] via its `gate` parameter, this is the
  * streaming form of `q_dedup_ingest`: the same fold, arriving one
  * micro-batch at a time instead of one nightly batch.
  *
  * Batch rows must carry `doc_id`, `lang`, `text`, `n_chars` (the
  * `documents` shape), and doc ids must be an id-suffix per batch
  * (every id in batch N greater than every id before it — the natural
  * append-only assignment, and what a CDC offset or ingest sequence
  * gives for free). [[Dedup.incrementalCandidates]] then emits each
  * candidate pair exactly once with no distinct pass, and the shed set
  * is batching-invariant: any micro-batch schedule converges to the
  * one-shot corpus answer (IncrementalDedupSpec's fold theorem).
  *
  * Idempotent replay, the [[ContinuousSync]] contract: the store is
  * partitioned `batch=<id>`, a replayed batch OVERWRITES its own
  * partition, and probing reads only partitions strictly below the
  * current batchId — so a half-written partition from a crashed
  * attempt is invisible to its own replay and the shed set is
  * deterministic. At 100 TB the store holds a few hundred bytes per
  * doc (block keys + token codes, not text), and each batch's probe
  * cost is delta × blockmates — the lake's history is read, never
  * self-joined.
  */
class DedupGate(val storeRoot: String, thresh: Double = 0.8,
    num: Int = 4, den: Int = 5) {

  private val sigCols = Seq("doc_id", "lang", "bucket", "sz", "codes")

  /** Signatures from every batch strictly below `batchId`, or None if
    * the store has none (first batch, or a replay of it). The listing
    * check is explicit because reading a nonexistent/empty parquet root
    * throws rather than yielding an empty frame.
    */
  private def prior(batch: DataFrame, batchId: Long): Option[DataFrame] = {
    val root = java.nio.file.Paths.get(storeRoot)
    val hasPrior = java.nio.file.Files.isDirectory(root) && {
      val s = java.nio.file.Files.list(root)
      try {
        s.iterator().asScala.exists { p =>
          val n = p.getFileName.toString
          n.startsWith("batch=") &&
            n.stripPrefix("batch=").toLongOption.exists(_ < batchId)
        }
      } finally s.close()
    }
    if (!hasPrior) None
    else Some(batch.sparkSession.read.option("basePath", storeRoot)
      .parquet(storeRoot).where(col("batch") < batchId)
      .select(sigCols.map(col): _*))
  }

  /** Shed earlier-seen near-dups from `batch`, record the whole batch's
    * signatures, return the survivors. Shaped for
    * [[ContinuousSync.start]]'s `gate` parameter.
    */
  def filterBatch(batch: DataFrame, batchId: Long): DataFrame = {
    val s = batch.sparkSession
    graft.functions.SortedJaccardGe.register(s)
    val sig = Dedup.signatures(batch)
    val all = prior(batch, batchId).fold(sig)(p => p.unionAll(sig))
    val meta = (df: DataFrame) => df.select("doc_id", "lang", "bucket", "sz")
    val dropped = Dedup.jaccardVerifyUnordered(
        Dedup.incrementalCandidates(meta(sig), meta(all), num, den),
        all.select("doc_id", "codes"), thresh)
      .select(col("doc_b").as("doc_id")).distinct()
    // record BEFORE returning: the survivors frame is consumed lazily by
    // the delivery pass, and the probe above never reads this batch's
    // partition (strict < filter), so writing first keeps the gate's
    // state transition atomic with respect to a crash after delivery
    sig.write.mode("overwrite").parquet(s"$storeRoot/batch=$batchId")
    batch.join(dropped.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
  }
}
