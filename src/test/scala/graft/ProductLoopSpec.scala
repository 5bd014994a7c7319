package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.search.InvertedIndex
import graft.sinks.Writers
import graft.sync._

/** The whole product in one stream: documents arrive as micro-batches,
  * the dedup gate sheds near-dups of ever-seen docs, the survivors are
  * DELIVERED through the idempotent sync engine AND indexed for search
  * — the reference's "ship docs to ES so users can search them" loop,
  * closed end-to-end inside the engine. Every leg is exactly-once by
  * its own mechanism (delivery generations, the gate's batch-scoped
  * store, the index's batch ledger), and this spec pins that the three
  * stay CONSISTENT with each other and with the one-shot batch answer:
  * same survivors delivered, same survivors searchable, same BM25 as a
  * from-scratch index of the one-shot survivors.
  */
class ProductLoopSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d.toString
  }

  private val fields = Seq(
    DocField("doc_id", "doc_id", quoted = false),
    DocField("lang", "lang", quoted = true))

  test("stream -> gate -> deliver + index: survivors delivered, indexed, searchable") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = Tables(spark, sf0001, "documents")
      .selectExpr("doc_id", "lang", "text", "n_chars")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val slices = rows.grouped((rows.size + 2) / 3).toSeq

    val gate = new DedupGate(tmp("graft_pl_sig"))
    val idxRoot = tmp("graft_pl_search")
    // compose the gate with index maintenance: the survivors of each
    // micro-batch feed appendBatch under the SAME batchId, so the index
    // leg inherits the stream's replay story through its own ledger —
    // a deterministic (rows, batchId) -> rows function, the gate contract
    val gateAndIndex: (DataFrame, Long) => DataFrame = (batch, id) => {
      val survivors = gate.filterBatch(batch, id)
      InvertedIndex.appendBatch(spark, idxRoot, survivors.select("doc_id", "text"), id)
      survivors
    }

    val input = MemoryStream[(Long, String, String, Long)]
    val df = input.toDF().toDF("doc_id", "lang", "text", "n_chars")
    val job = SyncJob("product_loop", SyncSource.Table("unused"),
      idCol = "doc_id", fields = fields, shards = 2, batchSize = 200)
    val delivered = tmp("graft_pl_idx")
    val q = ContinuousSync.start(df, job, delivered,
      new WatermarkStore(tmp("graft_pl_wm")), tmp("graft_pl_ckpt"),
      gate = Some(gateAndIndex))
    try {
      for (s <- slices) { input.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()

    // one-shot truth: the batch ingest fold over the same corpus
    val oneShotIds = Dedup.ingestSurvivors(spark, sf0001, 1)
      .collect().map(_.getLong(0)).toSet
    assert(oneShotIds.size < rows.size, "premise: the gate sheds something")

    // leg 1: the served delivery state holds exactly the survivors
    val deliveredIds = Writers.foldState(delivered).keySet.map(_.toLong)
    assert(deliveredIds == oneShotIds,
      s"delivered set diverges: extra=${(deliveredIds -- oneShotIds).take(5)} " +
        s"missing=${(oneShotIds -- deliveredIds).take(5)}")

    // leg 2: the search index holds exactly the survivors
    val indexedIds = InvertedIndex.docstats(spark, idxRoot)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexedIds == oneShotIds,
      s"indexed set diverges: extra=${(indexedIds -- oneShotIds).take(5)} " +
        s"missing=${(oneShotIds -- indexedIds).take(5)}")

    // leg 3: ranked search over the streamed index equals a from-scratch
    // index of the one-shot survivors — stats and all
    val clean = tmp("graft_pl_clean")
    InvertedIndex.build(spark, clean,
      Tables(spark, sf0001, "documents").select("doc_id", "text")
        .where(org.apache.spark.sql.functions.col("doc_id")
          .isin(oneShotIds.toSeq: _*)))
    val terms = Seq("spark", "merge", "window")
    def serve(r: String): Seq[String] =
      InvertedIndex.bm25(spark, r, terms, 20).collect().map(_.toString).toSeq
    assert(serve(idxRoot) == serve(clean),
      "search over the streamed index diverges from the one-shot survivors' index")
  }
}
