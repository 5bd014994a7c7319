package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.search.InvertedIndex

/** Streaming maintenance of the inverted index: micro-batch appends
  * through the exactly-once ledger must converge to the one-shot build,
  * survive a stop/restart, and skip replays instead of double-indexing
  * (the failure mode: a replayed append doubles every df/tf the lexicon
  * carries — wrong BM25 forever after).
  */
class ContinuousIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d.toString
  }

  private def docRows: Seq[(Long, String)] =
    Tables(spark, sf0001, "documents").select("doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  private val terms = Seq("spark", "merge", "window")

  private def fingerprint(root: String): Seq[Seq[String]] = Seq(
    InvertedIndex.bm25(spark, root, terms, 20),
    InvertedIndex.phrase(spark, root, "merge", "batch"),
    InvertedIndex.lexicon(spark, root).orderBy("tok"),
    InvertedIndex.globals(spark, root))
    .map(_.collect().map(_.toString).toSeq)

  test("streamed appends equal the one-shot build, across a restart") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("graft_cidx")
    val ckpt = tmp("graft_cidx_ckpt")
    val rows = docRows
    val slices = rows.grouped((rows.size + 3) / 4).toSeq

    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val q1 = InvertedIndex.maintainContinuous(df, root, ckpt)
    try {
      for (s <- slices.take(2)) { input.addData(s: _*); q1.processAllAvailable() }
    } finally q1.stop()
    // restart from the same checkpoint: the remaining slices continue
    // from the committed offset, batch numbering intact
    val q2 = InvertedIndex.maintainContinuous(df, root, ckpt)
    try {
      for (s <- slices.drop(2)) { input.addData(s: _*); q2.processAllAvailable() }
    } finally q2.stop()

    val one = tmp("graft_cidx_one")
    InvertedIndex.build(spark, one,
      Tables(spark, sf0001, "documents").select("doc_id", "text"))
    assert(fingerprint(root) == fingerprint(one),
      "streamed index diverges from the one-shot build")
  }

  test("a replayed micro-batch is skipped by the ledger, not re-indexed") {
    import spark.implicits._
    val root = tmp("graft_cidx_replay")
    val d = Tables(spark, sf0001, "documents").select("doc_id", "text")
    assert(InvertedIndex.appendBatch(spark, root, d.where("doc_id % 2 = 0"), 0L))
    assert(InvertedIndex.appendBatch(spark, root, d.where("doc_id % 2 = 1"), 1L))
    val before = fingerprint(root)
    // at-least-once delivery re-runs batch 1 with the same rows
    assert(!InvertedIndex.appendBatch(spark, root, d.where("doc_id % 2 = 1"), 1L),
      "replay must be skipped")
    assert(fingerprint(root) == before, "replay changed the index")
    // the ledger survives a nightly (un-batched) append, a delete, and
    // a compaction — any of them dropping it would re-admit the replay
    InvertedIndex.append(spark, root,
      d.select((col("doc_id") + 1000000).as("doc_id"), col("text")).limit(10))
    InvertedIndex.delete(spark, root, d.limit(1).select("doc_id"))
    InvertedIndex.compact(spark, root)
    assert(!InvertedIndex.appendBatch(spark, root, d.where("doc_id % 2 = 1"), 1L),
      "ledger lost through append/delete/compact — replay re-admitted")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
