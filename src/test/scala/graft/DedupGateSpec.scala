package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.operators.Dedup
import graft.sinks.Writers
import graft.sync._

/** The streaming form of q_dedup_ingest: a [[DedupGate]] plugged into
  * [[ContinuousSync]] sheds near-dups of ever-seen docs before
  * delivery, keeping a durable batch-scoped signature store. Contracts:
  *  - CONVERGENCE: streaming the corpus through any micro-batch
  *    schedule delivers exactly the one-shot `ingestSurvivors` answer
  *    (the fold theorem, now across foreachBatch boundaries);
  *  - IDEMPOTENT REPLAY: kill between a gated batch's delivery and its
  *    commit — the replay re-sheds the same docs (the crashed attempt's
  *    own store partition is invisible to its replay) and restores the
  *    served state byte-identically.
  */
class DedupGateSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d.toString
  }

  private def dirSnapshot(dir: String): Map[String, String] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString.stripPrefix(dir) -> new String(Files.readAllBytes(p), "UTF-8"))
      .toMap

  private val fields = Seq(
    DocField("doc_id", "doc_id", quoted = false),
    DocField("lang", "lang", quoted = true))

  /** The sf0.001 documents as (doc_id, lang, text, n_chars) rows in id
    * order — the id-suffix contract the gate requires — split into k
    * slices to feed as separate micro-batches.
    */
  private def fixtureSlices(k: Int): Seq[Seq[(Long, String, String, Long)]] = {
    val rows = Tables(spark, sf0001, "documents")
      .selectExpr("doc_id", "lang", "text", "n_chars")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val per = (rows.size + k - 1) / k
    rows.grouped(per).toSeq
  }

  test("streamed corpus delivers exactly the one-shot ingest survivors") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val df = input.toDF().toDF("doc_id", "lang", "text", "n_chars")
    val job = SyncJob("gate_conv", SyncSource.Table("unused"), idCol = "doc_id",
      fields = fields, shards = 2, batchSize = 200)
    val gate = new DedupGate(tmp("graft_gate_sig"))
    val idx = tmp("graft_gate_idx")
    val q = ContinuousSync.start(df, job, idx,
      new WatermarkStore(tmp("graft_gate_wm")), tmp("graft_gate_ckpt"),
      gate = Some(gate.filterBatch))
    try {
      for (slice <- fixtureSlices(3)) {
        input.addData(slice: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val delivered = Writers.foldState(idx).keySet.map(_.toLong)
    val oneShot = Dedup.ingestSurvivors(spark, sf0001, 1)
      .collect().map(_.getLong(0)).toSet
    assert(delivered == oneShot,
      s"streamed survivors diverge from the one-shot answer: " +
        s"extra=${(delivered -- oneShot).take(5)} missing=${(oneShot -- delivered).take(5)}")
    // the premise: the gate actually shed something on this corpus
    assert(oneShot.size < fixtureSlices(3).map(_.size).sum)
    // and the signature store is grow-only: every doc ever seen is
    // recorded, shed docs included
    val stored = spark.read.parquet(gate.storeRoot).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(stored.size == fixtureSlices(3).map(_.size).sum,
      "signature store must record every seen doc, not just survivors")
  }

  test("watermark covers gate-shed docs, so the batch-mode handoff cannot re-ship them") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val df = input.toDF().toDF("doc_id", "lang", "text", "n_chars")
    val job = SyncJob("gate_wm", SyncSource.Table("unused"), idCol = "doc_id",
      fields = fields, shards = 2, batchSize = 200,
      mode = SyncMode.Incremental("doc_id", "0"))
    val store = new WatermarkStore(tmp("graft_gw_wm"))
    val idx = tmp("graft_gw_idx")
    val q = ContinuousSync.start(df, job, idx, store, tmp("graft_gw_ckpt"),
      gate = Some(new DedupGate(tmp("graft_gw_sig")).filterBatch))
    try {
      // doc 2 is a same-block near-dup of doc 1 (9 of 11 union tokens,
      // J=0.818) and carries the batch's max watermark — the gate sheds
      // it, but the stream still consumed it
      input.addData(
        (1L, "en", "a b c d e f g h i j", 10L),
        (2L, "en", "a b c d e f g h i k", 10L))
      q.processAllAvailable()
    } finally q.stop()
    assert(Writers.foldState(idx).keySet == Set("1"), "the near-dup must be shed")
    assert(store.get("gate_wm").contains("2"),
      s"watermark must cover the shed doc or the ungated nightly job " +
        s"re-ships it: ${store.get("gate_wm")}")
  }

  test("store compaction preserves probe semantics across a restart") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val df = input.toDF().toDF("doc_id", "lang", "text", "n_chars")
    val job = SyncJob("gate_compact", SyncSource.Table("unused"), idCol = "doc_id",
      fields = fields, shards = 2, batchSize = 200)
    val gate = new DedupGate(tmp("graft_gc_sig"))
    val idx = tmp("graft_gc_idx")
    val ckpt = tmp("graft_gc_ckpt")
    val slices = fixtureSlices(4)
    val q1 = ContinuousSync.start(df, job, idx,
      new WatermarkStore(tmp("graft_gc_wm")), ckpt, gate = Some(gate.filterBatch))
    try {
      for (slice <- slices.take(3)) { input.addData(slice: _*); q1.processAllAvailable() }
    } finally q1.stop()
    // maintenance window: merge batches 0..2 into one partition (2 is
    // the last ran batch; it committed, so nothing <= 2 can replay)
    gate.compact(spark, 2)
    val parts0 = Files.list(Paths.get(gate.storeRoot)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("batch=")).toSeq.sorted
    assert(parts0 == Seq("batch=2"), s"store partitions after compact: $parts0")
    // restart and feed the remaining slice: batch 3's probe must see the
    // merged history exactly as before
    val q2 = ContinuousSync.start(df, job, idx,
      new WatermarkStore(tmp("graft_gc_wm2")), ckpt, gate = Some(gate.filterBatch))
    try {
      input.addData(slices(3): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val delivered = Writers.foldState(idx).keySet.map(_.toLong)
    val oneShot = Dedup.ingestSurvivors(spark, sf0001, 1)
      .collect().map(_.getLong(0)).toSet
    assert(delivered == oneShot,
      s"post-compaction survivors diverge: extra=${(delivered -- oneShot).take(5)} " +
        s"missing=${(oneShot -- delivered).take(5)}")
    assert(spark.read.parquet(gate.storeRoot).count() == slices.map(_.size).sum,
      "compaction or the post-compaction append lost signature rows")
  }

  test("stopAndCompact shrinks the store at the stop path and the restart converges") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val df = input.toDF().toDF("doc_id", "lang", "text", "n_chars")
    val job = SyncJob("gate_stop", SyncSource.Table("unused"), idCol = "doc_id",
      fields = fields, shards = 2, batchSize = 200)
    val gate = new DedupGate(tmp("graft_gs_sig"))
    val idx = tmp("graft_gs_idx")
    val ckpt = tmp("graft_gs_ckpt")
    val slices = fixtureSlices(4)
    val q1 = ContinuousSync.start(df, job, idx,
      new WatermarkStore(tmp("graft_gs_wm")), ckpt, gate = Some(gate.filterBatch))
    for (slice <- slices.take(3)) { input.addData(slice: _*); q1.processAllAvailable() }
    // the operator stop path: stop, await, compact everything that can
    // no longer replay — the newest batch (2) stays addressable because
    // the checkpoint may still replay it after a crashed commit
    ContinuousSync.stopAndCompact(q1, gate, spark)
    val parts = Files.list(Paths.get(gate.storeRoot)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("batch=")).toSeq.sorted
    assert(parts == Seq("batch=1", "batch=2"),
      s"stop-path compaction should leave merged history + newest: $parts")
    val q2 = ContinuousSync.start(df, job, idx,
      new WatermarkStore(tmp("graft_gs_wm2")), ckpt, gate = Some(gate.filterBatch))
    try {
      input.addData(slices(3): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val delivered = Writers.foldState(idx).keySet.map(_.toLong)
    val oneShot = Dedup.ingestSurvivors(spark, sf0001, 1)
      .collect().map(_.getLong(0)).toSet
    assert(delivered == oneShot,
      s"post-stopAndCompact survivors diverge: extra=${(delivered -- oneShot).take(5)} " +
        s"missing=${(oneShot -- delivered).take(5)}")
    assert(spark.read.parquet(gate.storeRoot).count() == slices.map(_.size).sum,
      "stop-path compaction lost signature rows")
  }

  test("a compaction crash after the commit marker is recovered without losing rows") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val df = input.toDF().toDF("doc_id", "lang", "text", "n_chars")
    val job = SyncJob("gate_crashc", SyncSource.Table("unused"), idCol = "doc_id",
      fields = fields, shards = 2, batchSize = 200)
    val gate = new DedupGate(tmp("graft_cc_sig"))
    val q1 = ContinuousSync.start(df, job, tmp("graft_cc_idx"),
      new WatermarkStore(tmp("graft_cc_wm")), tmp("graft_cc_ckpt"),
      gate = Some(gate.filterBatch))
    try {
      for (slice <- fixtureSlices(3)) { input.addData(slice: _*); q1.processAllAvailable() }
    } finally q1.stop()
    val total = spark.read.parquet(gate.storeRoot).count()
    // hand-build the crash window: merged rows staged and the marker
    // committed for upTo=1, but the crash hit mid-delete (batch=0 gone,
    // batch=1 still present) before the staged dir moved into place
    val staged = spark.read.option("basePath", gate.storeRoot)
      .parquet(gate.storeRoot).where(col("batch") <= 1)
      .select("doc_id", "lang", "bucket", "sz", "codes")
    staged.write.parquet(s"${gate.storeRoot}/.compact_tmp")
    Files.write(Paths.get(gate.storeRoot, ".compact_commit"), "1".getBytes("UTF-8"))
    Files.walk(Paths.get(gate.storeRoot, "batch=0")).iterator().asScala
      .toSeq.reverse.foreach(Files.delete(_))
    new DedupGate(gate.storeRoot).recover()
    val parts = Files.list(Paths.get(gate.storeRoot)).iterator().asScala
      .map(_.getFileName.toString).filter(!_.startsWith(".")).toSeq.sorted
    assert(parts == Seq("batch=1", "batch=2"), s"recovered partitions: $parts")
    assert(spark.read.parquet(gate.storeRoot).count() == total,
      "recovery lost signature rows")
  }

  test("a compaction crash after the merged-dir move keeps the merged partition intact") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val df = input.toDF().toDF("doc_id", "lang", "text", "n_chars")
    val job = SyncJob("gate_crashm", SyncSource.Table("unused"), idCol = "doc_id",
      fields = fields, shards = 2, batchSize = 200)
    val gate = new DedupGate(tmp("graft_cm_sig"))
    val q1 = ContinuousSync.start(df, job, tmp("graft_cm_idx"),
      new WatermarkStore(tmp("graft_cm_wm")), tmp("graft_cm_ckpt"),
      gate = Some(gate.filterBatch))
    try {
      for (slice <- fixtureSlices(3)) { input.addData(slice: _*); q1.processAllAvailable() }
    } finally q1.stop()
    val total = spark.read.parquet(gate.storeRoot).count()
    gate.compact(spark, 1)
    // the LAST crash window: sources deleted, staged dir already moved
    // to batch=1, only the marker delete outstanding. Re-plant the
    // marker: recover() must recognize the move happened (no staged
    // dir) and NOT delete the merged partition it points at.
    Files.write(Paths.get(gate.storeRoot, ".compact_commit"), "1".getBytes("UTF-8"))
    new DedupGate(gate.storeRoot).recover()
    assert(!Files.exists(Paths.get(gate.storeRoot, ".compact_commit")))
    val parts = Files.list(Paths.get(gate.storeRoot)).iterator().asScala
      .map(_.getFileName.toString).filter(!_.startsWith(".")).toSeq.sorted
    assert(parts == Seq("batch=1", "batch=2"), s"partitions after recovery: $parts")
    assert(spark.read.parquet(gate.storeRoot).count() == total,
      "post-move recovery destroyed the merged partition")
  }

  test("kill a gated batch between delivery and commit: replay converges byte-identically") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long)]
    val df = input.toDF().toDF("doc_id", "lang", "text", "n_chars")
    val job = SyncJob("gate_resume", SyncSource.Table("unused"), idCol = "doc_id",
      fields = fields, shards = 2, batchSize = 200)
    val sig = tmp("graft_gr_sig")
    val idx = tmp("graft_gr_idx")
    val ckpt = tmp("graft_gr_ckpt")
    val q1 = ContinuousSync.start(df, job, idx,
      new WatermarkStore(tmp("graft_gr_wm")), ckpt,
      gate = Some(new DedupGate(sig).filterBatch))
    try {
      for (slice <- fixtureSlices(2)) {
        input.addData(slice: _*)
        q1.processAllAvailable()
      }
    } finally q1.stop()
    val uninterrupted = dirSnapshot(idx)
    assert(uninterrupted.keys.exists(_.contains("gen=0001")),
      s"expected a batch-1 generation in ${uninterrupted.keys.take(5)}")
    // the at-least-once crash window: batch 1 delivered (and its
    // signatures recorded — the store's batch=1 partition deliberately
    // SURVIVES the crash) but its offset never committed, and the
    // delivery was torn mid-write. The replay must not be confused by
    // its own crashed attempt's signatures: probing reads only
    // partitions strictly below batchId, so the shed set is recomputed
    // identically and the partition is overwritten.
    Files.delete(Paths.get(ckpt, "commits", "1"))
    Files.deleteIfExists(Paths.get(ckpt, "commits", ".1.crc"))
    Files.walk(Paths.get(idx)).iterator().asScala.toSeq.reverse
      .filter(_.toString.contains("gen=0001")).foreach(Files.delete(_))
    assert(dirSnapshot(idx) != uninterrupted, "the crash must have torn the index")
    val q2 = ContinuousSync.start(df, job, idx,
      new WatermarkStore(tmp("graft_gr_wm2")), ckpt,
      gate = Some(new DedupGate(sig).filterBatch))
    try q2.processAllAvailable() finally q2.stop()
    assert(dirSnapshot(idx) == uninterrupted,
      "replayed gated batch must restore the uninterrupted run's bytes exactly")
    // the store still holds exactly one partition per batch
    val parts = Files.list(Paths.get(sig)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("batch=")).toSeq.sorted
    assert(parts == Seq("batch=0", "batch=1"), s"store partitions: $parts")
  }
}
