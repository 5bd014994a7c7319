package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.LakeBridge

/** The streaming→lake bridge (r18): micro-batch append commits through
  * the exactly-once ledger must converge to the one-shot load, survive
  * a stop/restart on the same checkpoint, skip replays instead of
  * double-committing, and serve every commit to the CDF consumer whose
  * summed deltas reconcile with the final snapshot — the
  * ContinuousIndexSpec contract, replayed for the commit tier.
  */
class StreamLakeSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d.toString
  }

  private def docRows: Seq[(Long, String)] =
    Tables(spark, sf0001, "documents").select("doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("streamed commits equal the one-shot load, across a restart") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("graft_lake")
    val ckpt = tmp("graft_lake_ckpt")
    val rows = docRows
    val slices = rows.grouped((rows.size + 3) / 4).toSeq

    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val q1 = LakeBridge.maintainContinuous(df, root, ckpt)
    try {
      for (s <- slices.take(2)) { input.addData(s: _*); q1.processAllAvailable() }
    } finally q1.stop()
    // restart from the same checkpoint: the remaining slices continue
    // from the committed offset, batch numbering intact
    val q2 = LakeBridge.maintainContinuous(df, root, ckpt)
    try {
      for (s <- slices.drop(2)) { input.addData(s: _*); q2.processAllAvailable() }
    } finally q2.stop()

    val streamed = LakeBridge.read(spark, root)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val oneShot = Tables(spark, sf0001, "documents").select("doc_id", "text")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(streamed == oneShot, "streamed lake diverges from the one-shot load")
    // one commit per non-empty micro-batch, each over immutable files:
    // every earlier manifest is a prefix of the final one
    val vs = LakeBridge.versions(root)
    assert(vs.size >= slices.size, s"expected >= ${slices.size} commits, got $vs")
    val finalM = LakeBridge.manifest(spark, root, vs.last).toSet
    vs.init.foreach { v =>
      val m = LakeBridge.manifest(spark, root, v).toSet
      assert(m.subsetOf(finalM), s"v$v references files the final snapshot lost")
    }
  }

  test("a replayed commit is skipped by the ledger, not re-appended") {
    val root = tmp("graft_lake_replay")
    val d = Tables(spark, sf0001, "documents").select("doc_id", "text")
    assert(LakeBridge.appendCommit(spark, root, d.where("doc_id % 2 = 0"), Some(0L)))
    assert(LakeBridge.appendCommit(spark, root, d.where("doc_id % 2 = 1"), Some(1L)))
    val before = LakeBridge.read(spark, root).count()
    // at-least-once delivery re-runs batch 1 with the same rows
    assert(!LakeBridge.appendCommit(spark, root, d.where("doc_id % 2 = 1"), Some(1L)),
      "replay must be skipped")
    assert(LakeBridge.read(spark, root).count() == before, "replay changed the table")
    // the ledger survives an interleaved un-batched (nightly) commit
    assert(LakeBridge.appendCommit(spark, root,
      d.select((col("doc_id") + 1000000).as("doc_id"), col("text")).limit(10), None))
    assert(!LakeBridge.appendCommit(spark, root, d.where("doc_id % 2 = 1"), Some(1L)),
      "ledger lost through the nightly commit — replay re-admitted")
  }

  test("compact + vacuum: snapshots retire, only exclusive files are reclaimed") {
    val root = tmp("graft_lake_vac")
    val d = Tables(spark, sf0001, "documents").select("doc_id", "text")
    (0 to 3).foreach(b => assert(LakeBridge.appendCommit(spark, root,
      d.where(s"doc_id % 4 = $b"), Some(b.toLong))))
    val before = LakeBridge.read(spark, root)
      .orderBy("doc_id").collect().map(_.toString).toSeq

    // append lineage shares every file: a retention vacuum drops old
    // snapshots but must delete NOTHING (nothing is exclusive to them)
    val (drop1, del1) = LakeBridge.vacuum(spark, root, keep = 2)
    assert(drop1 == 2 && del1 == 0, s"append lineage lost files: ($drop1, $del1)")
    assert(LakeBridge.read(spark, root)
      .orderBy("doc_id").collect().map(_.toString).toSeq == before)

    // compaction rewrites the world into one file; the pre-compaction
    // snapshot stays readable (retention) until vacuum retires it, and
    // THEN the small micro-batch files are reclaimed
    val cv = LakeBridge.compactCommit(spark, root)
    val compacted = LakeBridge.manifest(spark, root, cv)
    assert(compacted.size == 1, s"compaction kept ${compacted.size} files")
    assert(LakeBridge.read(spark, root)
      .orderBy("doc_id").collect().map(_.toString).toSeq == before,
      "compaction changed the rows")
    val (drop2, del2) = LakeBridge.vacuum(spark, root, keep = 1)
    assert(drop2 == 2, s"expected the 2 pre-compaction snapshots dropped: $drop2")
    assert(del2 == 4, s"expected the 4 micro-batch dirs reclaimed: $del2")
    assert(LakeBridge.read(spark, root)
      .orderBy("doc_id").collect().map(_.toString).toSeq == before,
      "vacuum changed the current snapshot's rows")
    compacted.foreach(p => assert(
      Files.exists(java.nio.file.Paths.get(p)), s"kept file $p deleted"))
    // the ledger rode compaction AND vacuum: the last folded batch
    // still skips
    assert(!LakeBridge.appendCommit(spark, root, d.limit(5), Some(3L)),
      "maintenance lost the ledger — replay re-admitted")
  }

  test("the CDF consumer's summed deltas equal the final snapshot") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("graft_lake_cdf")
    val ckpt = tmp("graft_lake_cdf_ckpt")
    val rows = docRows
    val slices = rows.grouped((rows.size + 2) / 3).toSeq
    val input = MemoryStream[(Long, String)]
    val q = LakeBridge.maintainContinuous(input.toDF().toDF("doc_id", "text"), root, ckpt)
    try {
      for (s <- slices) { input.addData(s: _*); q.processAllAvailable() }
    } finally q.stop()

    val diffs = LakeBridge.commitDiffs(spark, root)
    assert(diffs.size == LakeBridge.versions(root).size)
    // each delta reads ONLY its commit's added files (the manifest-diff
    // contract: no table scan), and the folded deltas reconcile exactly
    diffs.foreach { case (v, df) =>
      val prevFiles = LakeBridge.versions(root).filter(_ < v).lastOption
        .map(p => LakeBridge.manifest(spark, root, p).toSet).getOrElse(Set.empty)
      assert(!df.inputFiles.exists(f => prevFiles.exists(f.contains)),
        s"commit v$v delta rescanned pre-existing files")
    }
    val summed = diffs.map(_._2.count()).sum
    assert(summed == LakeBridge.read(spark, root).count(),
      "summed commit deltas diverge from the final snapshot")
    val union = diffs.map(_._2).reduce(_ unionByName _)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val snapshot = LakeBridge.read(spark, root)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(union == snapshot, "commit deltas do not rebuild the snapshot")
  }

  test("CDF across a compaction: rewrite commits carry no row delta (r18 advice)") {
    val root = tmp("graft_lake_cdf_compact")
    val d = Tables(spark, sf0001, "documents").select("doc_id", "text")
    (0 to 2).foreach(b => assert(LakeBridge.appendCommit(spark, root,
      d.where(s"doc_id % 3 = $b"), Some(b.toLong))))
    val cv = LakeBridge.compactCommit(spark, root)
    assert(LakeBridge.commitKind(root, cv) == "rewrite")
    // a post-compaction append still deltas against the compacted manifest
    assert(LakeBridge.appendCommit(spark, root,
      d.select((col("doc_id") + 1000000).as("doc_id"), col("text")).limit(7), Some(3L)))

    val diffs = LakeBridge.commitDiffs(spark, root)
    // 5 commits, 4 of them row deltas — the rewrite is SKIPPED, not
    // folded (folding it would double-count the whole pre-compact table)
    assert(LakeBridge.versions(root).size == 5)
    assert(diffs.map(_._1) == Seq(1, 2, 3, 5), s"wrong delta commits: ${diffs.map(_._1)}")
    val summed = diffs.map(_._2.count()).sum
    assert(summed == LakeBridge.read(spark, root).count(),
      "deltas across the compaction double- or under-count")
    val union = diffs.map(_._2).reduce(_ unionByName _)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val snapshot = LakeBridge.read(spark, root)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(union == snapshot, "folded deltas diverge across the compaction")
  }

  test("lake-fed incremental sync converges to the one-shot index across restart + compaction") {
    import graft.sync._
    val root = tmp("graft_lake_sync")
    val idx = tmp("graft_lake_sync_idx")
    val oneShotIdx = tmp("graft_lake_sync_oneshot")
    val job = SyncJob("docs_lake", SyncSource.Table("documents"),
      idCol = "doc_id",
      fields = Seq(DocField("doc_id", "doc_id", quoted = false),
        DocField("lang", "lang", quoted = true),
        DocField("text", "text", quoted = true)),
      shards = 4, batchSize = 200)
    val d = Tables(spark, sf0001, "documents").select("doc_id", "lang", "text")

    // two stream commits, then the first sync leg
    assert(LakeBridge.appendCommit(spark, root, d.where("doc_id % 3 = 0"), Some(0L)))
    assert(LakeBridge.appendCommit(spark, root, d.where("doc_id % 3 = 1"), Some(1L)))
    assert(LakeBridge.syncCommits(spark, root, job, idx) == Seq(1, 2))
    // RESTART with nothing new: the sync ledger skips everything
    assert(LakeBridge.syncCommits(spark, root, job, idx).isEmpty,
      "restart redelivered already-synced commits")

    // more lake life: one append, a compaction, another append
    assert(LakeBridge.appendCommit(spark, root, d.where("doc_id % 3 = 2"), Some(2L)))
    LakeBridge.compactCommit(spark, root)
    assert(LakeBridge.appendCommit(spark, root,
      d.select((col("doc_id") + 1000000).as("doc_id"), col("lang"), col("text"))
        .limit(9), Some(3L)))
    // the resumed sync delivers ONLY the two new row deltas — the
    // rewrite commit (v4) must not redeliver the whole table
    assert(LakeBridge.syncCommits(spark, root, job, idx) == Seq(3, 5),
      "compaction leaked into the sync stream")

    // convergence: the generation-folded incremental index equals a
    // one-shot delivery of the final snapshot
    SyncRunner.runOn(LakeBridge.read(spark, root), job,
      graft.sinks.FileBulkClient(oneShotIdx))
    val incr = graft.sinks.Writers.foldState(idx)
    val oneShot = graft.sinks.Writers.foldState(oneShotIdx)
    assert(incr.nonEmpty && incr == oneShot,
      s"lake-fed sync diverged from the one-shot index: ${incr.size} vs ${oneShot.size} docs")
  }
}
