package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sinks.{AliasedIndex, FileBulkClient, Writers}
import graft.sync._

/** The product-level acceptance scenario: the reference's nightly loop,
  * composed end to end from every sync-layer piece — config-shaped jobs,
  * watermark-TRACKED upsert sync with tombstone deletes into a
  * generation-stacked index, and a full re-sync behind an alias swap —
  * run over "two nights" with the source mutating in between. The
  * invariant under test: after each night, what a reader of the served
  * index sees equals the LIVE (non-deleted) source state, and the
  * incremental path ships only deltas.
  */
class NightlySyncSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String) = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d.toString
  }

  // the mutable upstream table: (id, status, total, ver, deleted) — soft
  // deletes bump the watermark, the standard scan-based-CDC contract
  private def setSource(rows: Seq[(Long, String, Long, Long, Boolean)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "status", "total", "ver", "deleted")
      .createOrReplaceTempView("nightly_src")
  }

  private val fields = Seq(
    DocField("id", "id", quoted = false),
    DocField("status", "status", quoted = true),
    DocField("total", "total", quoted = false))

  /** What a search over the served index should return: doc per live row. */
  private def liveDocs(rows: Seq[(Long, String, Long, Long, Boolean)]): Map[String, String] =
    rows.collect { case (id, st, total, _, deleted) if !deleted =>
      id.toString -> s"""{"id":$id,"status":"$st","total":$total}"""
    }.toMap

  test("two nightly runs: tracked upsert converges the index to the live source; full job re-publishes behind the alias") {
    val night1 = Seq(
      (1L, "O", 100L, 1L, false), (2L, "O", 200L, 1L, false),
      (3L, "F", 300L, 1L, false), (4L, "O", 400L, 1L, false))
    // between nights: 2 updated (ver bump), 1 soft-deleted, 2 inserted
    val night2 = Seq(
      (1L, "F", 150L, 2L, false),          // updated
      (2L, "O", 200L, 1L, false),          // untouched
      (3L, "F", 300L, 2L, true),           // deleted (tombstone)
      (4L, "P", 400L, 2L, false),          // updated
      (5L, "O", 500L, 2L, false), (6L, "O", 600L, 2L, false)) // inserted

    val upsertJob = SyncJob("nightly_upsert", SyncSource.Sql("SELECT * FROM nightly_src"),
      idCol = "id", fields = fields, shards = 2, batchSize = 10,
      mode = SyncMode.Upsert("ver", "0", "deleted"))
    val fullJob = SyncJob("nightly_full",
      SyncSource.Sql("SELECT * FROM nightly_src WHERE NOT deleted"),
      idCol = "id", fields = fields, shards = 2, batchSize = 10)

    val store = new WatermarkStore(tmp("graft_nightly_wm"))
    val idxDir = tmp("graft_nightly_idx")    // generation-stacked upsert index
    val aliasRoot = tmp("graft_nightly_alias") // alias-swapped full index
    var night = 0

    def runNight(): Seq[SyncConfig.JobOutcome] = {
      night += 1
      val upsertOutcome = SyncConfig.runAll(spark, sf0001, Seq(upsertJob),
        _ => FileBulkClient(idxDir, gen = Some(night)), watermarks = Some(store))
      SyncRunner.fullSync(spark, sf0001, fullJob, aliasRoot)
      upsertOutcome
    }

    // ---- night 1: everything is new ----
    setSource(night1)
    val o1 = runNight()
    assert(o1.head.ok && o1.head.docs == 4, o1.head.toString)
    assert(store.get("nightly_upsert").contains("1"))
    assert(Writers.foldState(idxDir) == liveDocs(night1))
    val served1 = AliasedIndex.resolve(aliasRoot).get
    assert(Writers.foldState(served1) == liveDocs(night1))

    // ---- night 2: only the 5 changed rows ship on the tracked path ----
    setSource(night2)
    val o2 = runNight()
    assert(o2.head.ok && o2.head.docs == 5,
      s"tracked upsert must ship only the delta (4 changed + 1 tombstone): ${o2.head}")
    assert(store.get("nightly_upsert").contains("2"))
    assert(Writers.foldState(idxDir) == liveDocs(night2),
      "served upsert index must equal the live source after night 2")
    val served2 = AliasedIndex.resolve(aliasRoot).get
    assert(served2 != served1, "full job must have published a new version")
    assert(Writers.foldState(served2) == liveDocs(night2))
    // both delivery strategies converge to the same served state
    assert(Writers.foldState(idxDir) == Writers.foldState(served2))

    // ---- a quiet night: nothing ships, nothing changes ----
    val o3 = runNight()
    assert(o3.head.ok && o3.head.docs == 0, o3.head.toString)
    assert(store.get("nightly_upsert").contains("2"))
    assert(Writers.foldState(idxDir) == liveDocs(night2))
  }
}
