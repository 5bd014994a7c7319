package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sync.IncrementalView
import graft.sync.IncrementalView.ViewDef

/** Continuous view maintenance: each micro-batch folds through the
  * batchId ledger committed atomically with the state, so foreachBatch's
  * at-least-once replays land exactly once — the streaming version of
  * the (state, watermark) atomic-commit argument, with the checkpoint
  * as the progress store.
  */
class ViewStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d.toString
  }

  private def freshRoot(tag: String): String = {
    val root = tmp(s"graft_vstream_$tag")
    graft.sinks.AliasedIndex.deleteRecursively(Paths.get(root))
    root
  }

  private def stateSnapshot(root: String): Seq[(String, Long, java.math.BigDecimal)] =
    IncrementalView.read(spark, root).select("k", "mv_n", "mv_s")
      .orderBy("k").as[(String, Long, java.math.BigDecimal)].collect().toSeq

  private val v = ViewDef(Seq("k"), "m")

  test("a replayed micro-batch folds exactly once") {
    val root = freshRoot("replay")
    def batch(rows: (String, Long)*) = rows.toDF("k", "m")
    assert(IncrementalView.refreshBatch(spark, root, batch("a" -> 1L, "b" -> 2L), v, 0L))
    assert(IncrementalView.refreshBatch(spark, root, batch("a" -> 10L), v, 1L))
    val after1 = stateSnapshot(root)
    // crash AFTER publish, BEFORE checkpoint commit: same batchId, same
    // rows, must be a no-op — not a double fold
    assert(!IncrementalView.refreshBatch(spark, root, batch("a" -> 10L), v, 1L))
    assert(stateSnapshot(root) == after1, "replay changed the state")
    assert(IncrementalView.lastBatch(root).contains(1L))
    // and an out-of-order stale id is equally refused
    assert(!IncrementalView.refreshBatch(spark, root, batch("z" -> 9L), v, 0L))
    assert(IncrementalView.refreshBatch(spark, root, batch("b" -> 3L), v, 2L))
    assert(stateSnapshot(root).map(t => (t._1, t._2)) == Seq("a" -> 2L, "b" -> 2L))
  }

  test("kill between fold and checkpoint commit: replay does not double-fold") {
    val root = freshRoot("restart")
    val ckpt = tmp("graft_vstream_ckpt")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDF().toDF("k", "m")
    val q1 = IncrementalView.maintainContinuous(df, root, v, ckpt)
    try {
      input.addData("a" -> 1L, "b" -> 2L)
      q1.processAllAvailable()
      input.addData("a" -> 3L)
      q1.processAllAvailable()
    } finally q1.stop()
    val after = stateSnapshot(root)
    assert(after.map(t => (t._1, t._2, t._3.longValue())) ==
      Seq(("a", 2L, 4L), ("b", 1L, 2L)))
    // crash window: batch 1's fold PUBLISHED but the checkpoint commit
    // didn't land — the restart replays batchId 1 with the same rows and
    // the ledger must shrug it off (the .crc sidecar must go too, or the
    // replay's rename fails)
    Files.delete(Paths.get(ckpt, "commits", "1"))
    Files.deleteIfExists(Paths.get(ckpt, "commits", ".1.crc"))
    val q2 = IncrementalView.maintainContinuous(df, root, v, ckpt)
    try {
      q2.processAllAvailable()
      assert(stateSnapshot(root) == after, "replayed batch double-folded")
      assert(IncrementalView.lastBatch(root).contains(1L))
      // and the stream keeps going past the replay
      input.addData("c" -> 5L)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(stateSnapshot(root).map(t => (t._1, t._2, t._3.longValue())) ==
      Seq(("a", 2L, 4L), ("b", 1L, 2L), ("c", 1L, 5L)),
      "post-replay batch lost")
  }

  test("signed repair between stream segments carries the batch ledger") {
    val root = freshRoot("repair")
    val rv = ViewDef(Seq("k"), "m", retractable = true)
    assert(IncrementalView.refreshBatch(spark, root,
      Seq("a" -> 1L, "bad" -> 99L).toDF("k", "m"), rv, 0L))
    // nightly repair: retract the bad rows with a signed refresh
    IncrementalView.refreshSigned(spark, root,
      Seq("bad" -> 99L).toDF("k", "m"), rv, lit(-1L))
    assert(IncrementalView.lastBatch(root).contains(0L),
      "signed repair reset the stream ledger")
    // a replay of the already-folded batch must still be refused
    assert(!IncrementalView.refreshBatch(spark, root,
      Seq("a" -> 1L, "bad" -> 99L).toDF("k", "m"), rv, 0L))
    assert(stateSnapshot(root).map(t => (t._1, t._2)) == Seq("a" -> 1L))
  }
}
