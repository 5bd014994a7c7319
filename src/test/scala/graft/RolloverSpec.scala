package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import graft.sync._

/** Time-partitioned index families (Rollover): a full run fans the corpus
  * out into one index per period behind an alias manifest; an incremental
  * run touches ONLY the periods its delta covers — appending a generation
  * to live periods, creating brand-new ones, and leaving every other
  * period's bytes untouched. Replays converge; mapping drift against a
  * live period fails loudly.
  */
class RolloverSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String) = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d.toString
  }

  // upstream rows: (id, day, status, ver, deleted) across three months;
  // soft deletes bump the watermark (scan-based-CDC contract)
  private type Row5 = (Long, String, String, Long, Boolean)
  private def setSource(rows: Seq[Row5]): Unit = {
    import spark.implicits._
    rows.map { case (id, d, st, v, del) => (id, java.sql.Date.valueOf(d), st, v, del) }
      .toDF("id", "d", "status", "ver", "deleted")
      .createOrReplaceTempView("rollover_src")
  }

  private val night1: Seq[Row5] = Seq(
    (1L, "1997-01-10", "O", 1L, false), (2L, "1997-01-20", "O", 1L, false),
    (3L, "1997-02-05", "O", 1L, false), (4L, "1997-02-25", "F", 1L, false),
    (5L, "1997-03-15", "O", 1L, false))

  // delta: late data + an update + a tombstone in 1997-02, a brand-new
  // month 1997-04; 1997-01 and 1997-03 see nothing
  private val night2: Seq[Row5] = night1.map {
    case (3L, d, _, _, _) => (3L, d, "P", 2L, false) // updated
    case (4L, d, st, _, _) => (4L, d, st, 2L, true)  // tombstoned
    case r => r
  } ++ Seq(
    (6L, "1997-02-27", "O", 2L, false),              // late arrival
    (7L, "1997-04-02", "O", 2L, false))              // new month

  private val fields = Seq(
    DocField("id", "id", quoted = false),
    DocField("status", "status", quoted = true))

  private def job(mode: SyncMode) = SyncJob("rollover_demo",
    SyncSource.Sql("SELECT * FROM rollover_src"),
    idCol = "id", fields = fields, shards = 2, batchSize = 10,
    mode = mode, period = Some(IndexPeriod("d", "yyyy-MM")))

  private def doc(id: Long, st: String) = s"""{"id":$id,"status":"$st"}"""

  /** (relative path, size) of every regular file under `root` — the
    * "these bytes did not move" fingerprint. */
  private def fingerprint(root: String): Set[(String, Long)] = {
    val r = Paths.get(root)
    if (!Files.isDirectory(r)) return Set.empty
    val walk = Files.walk(r)
    try walk.iterator.asScala.filter(Files.isRegularFile(_))
      .map(p => (r.relativize(p).toString, Files.size(p))).toSet
    finally walk.close()
  }

  test("full → incremental: delta periods append/create, others byte-untouched, alias tracks") {
    val family = tmp("graft-rollover-")
    setSource(night1)

    val out1 = Rollover.rolloverSync(spark, sf0001, job(SyncMode.Full), family)
    assert(out1.map(_.index) ==
      Seq("rollover_demo-1997-01", "rollover_demo-1997-02", "rollover_demo-1997-03"))
    assert(out1.forall(o => o.created && o.gen.isEmpty))
    assert(Rollover.readAlias(family) == out1.map(_.index))
    // every member carries its mapping
    out1.foreach { o =>
      val cur = graft.sinks.AliasedIndex.resolve(s"$family/${o.index}").get
      assert(Files.exists(Paths.get(cur, "mapping.json")))
    }
    assert(Rollover.familyState(family, "rollover_demo") == Map(
      ("rollover_demo-1997-01", "1") -> doc(1, "O"),
      ("rollover_demo-1997-01", "2") -> doc(2, "O"),
      ("rollover_demo-1997-02", "3") -> doc(3, "O"),
      ("rollover_demo-1997-02", "4") -> doc(4, "F"),
      ("rollover_demo-1997-03", "5") -> doc(5, "O")))

    val untouched1 = fingerprint(s"$family/rollover_demo-1997-01")
    val untouched3 = fingerprint(s"$family/rollover_demo-1997-03")

    setSource(night2)
    val incr = job(SyncMode.Upsert("ver", "1", "deleted"))
    val out2 = Rollover.rolloverSync(spark, sf0001, incr, family)
    // only the delta's periods were visited: 02 appended, 04 created
    assert(out2.map(o => (o.index, o.created, o.gen)) == Seq(
      ("rollover_demo-1997-02", false, Some(1)),
      ("rollover_demo-1997-04", true, None)))
    assert(fingerprint(s"$family/rollover_demo-1997-01") == untouched1)
    assert(fingerprint(s"$family/rollover_demo-1997-03") == untouched3)
    assert(Rollover.readAlias(family) == Seq(
      "rollover_demo-1997-01", "rollover_demo-1997-02",
      "rollover_demo-1997-03", "rollover_demo-1997-04"))

    val expected = Map(
      ("rollover_demo-1997-01", "1") -> doc(1, "O"),
      ("rollover_demo-1997-01", "2") -> doc(2, "O"),
      ("rollover_demo-1997-02", "3") -> doc(3, "P"), // update won
      // 4 tombstoned away
      ("rollover_demo-1997-02", "6") -> doc(6, "O"), // late arrival landed
      ("rollover_demo-1997-03", "5") -> doc(5, "O"),
      ("rollover_demo-1997-04", "7") -> doc(7, "O"))
    assert(Rollover.familyState(family, "rollover_demo") == expected)

    // replaying the same delta appends the next generation but the served
    // state is unchanged (idempotent _id fold)
    val out3 = Rollover.rolloverSync(spark, sf0001, incr, family)
    assert(out3.map(o => (o.index, o.created, o.gen)) == Seq(
      ("rollover_demo-1997-02", false, Some(2)),
      ("rollover_demo-1997-04", false, Some(1))))
    assert(Rollover.familyState(family, "rollover_demo") == expected)
  }

  test("mapping drift against a live period fails loudly, before any delivery") {
    val family = tmp("graft-rollover-drift-")
    setSource(night1)
    Rollover.rolloverSync(spark, sf0001, job(SyncMode.Full), family)
    val before = fingerprint(family)
    val drifted = job(SyncMode.Full).copy(fields =
      fields :+ DocField("version", "ver", quoted = false))
    val e = intercept[IllegalStateException] {
      Rollover.rolloverSync(spark, sf0001, drifted, family)
    }
    assert(e.getMessage.contains("mapping drift"))
    assert(fingerprint(family) == before, "a refused append must not write")
  }

  test("expire drops only pre-cutoff periods; manifest shrinks before bytes do") {
    val family = tmp("graft-rollover-exp-")
    setSource(night1)
    Rollover.rolloverSync(spark, sf0001, job(SyncMode.Full), family)
    val dropped = Rollover.expire(family, "rollover_demo", keepFrom = "1997-02")
    assert(dropped == Seq("rollover_demo-1997-01"))
    assert(Rollover.readAlias(family) ==
      Seq("rollover_demo-1997-02", "rollover_demo-1997-03"))
    assert(!Files.isDirectory(Paths.get(family, "rollover_demo-1997-01")))
    assert(Rollover.familyState(family, "rollover_demo").keySet.forall {
      case (idx, _) => idx != "rollover_demo-1997-01"
    })
    // expiry is idempotent: nothing left before the cutoff
    assert(Rollover.expire(family, "rollover_demo", keepFrom = "1997-02").isEmpty)
  }

  test("rebuildPeriod repairs mapping drift for ONE period; appends follow") {
    val family = tmp("graft-rollover-rebuild-")
    setSource(night1)
    Rollover.rolloverSync(spark, sf0001, job(SyncMode.Full), family)
    val drifted = job(SyncMode.Full).copy(fields =
      fields :+ DocField("version", "ver", quoted = false))
    val fp1 = fingerprint(s"$family/rollover_demo-1997-01")
    val fp3 = fingerprint(s"$family/rollover_demo-1997-03")

    val out = Rollover.rebuildPeriod(spark, sf0001, drifted, family, "1997-02")
    assert(out.index == "rollover_demo-1997-02" && out.created)
    // the rebuilt period serves the NEW doc shape; the others are untouched
    val state = Rollover.familyState(family, "rollover_demo")
    assert(state(("rollover_demo-1997-02", "3")) == """{"id":3,"status":"O","version":1}""")
    assert(state(("rollover_demo-1997-01", "1")) == doc(1, "O"))
    assert(fingerprint(s"$family/rollover_demo-1997-01") == fp1)
    assert(fingerprint(s"$family/rollover_demo-1997-03") == fp3)

    // the drifted job can now APPEND to the rebuilt period...
    setSource(Seq((6L, "1997-02-27", "O", 2L, false)))
    val out2 = Rollover.rolloverSync(spark, sf0001,
      drifted.copy(mode = SyncMode.Incremental("ver", "1")), family)
    assert(out2.map(o => (o.index, o.created)) == Seq(("rollover_demo-1997-02", false)))
    // ...but a NOT-rebuilt period still refuses it
    setSource(Seq((8L, "1997-01-30", "O", 2L, false)))
    intercept[IllegalStateException] {
      Rollover.rolloverSync(spark, sf0001,
        drifted.copy(mode = SyncMode.Incremental("ver", "1")), family)
    }
  }

  test("rebuildPeriod refuses empty periods and watermarked modes") {
    val family = tmp("graft-rollover-guard-")
    setSource(night1)
    Rollover.rolloverSync(spark, sf0001, job(SyncMode.Full), family)
    val eEmpty = intercept[IllegalArgumentException] {
      Rollover.rebuildPeriod(spark, sf0001, job(SyncMode.Full), family, "1999-12")
    }
    assert(eEmpty.getMessage.contains("no rows"))
    intercept[IllegalArgumentException] {
      Rollover.rebuildPeriod(spark, sf0001,
        job(SyncMode.Incremental("ver", "0")), family, "1997-02")
    }
  }

  test("a NULL period column refuses the whole run — rows must not route nowhere") {
    import spark.implicits._
    Seq((1L, Some(java.sql.Date.valueOf("1997-01-10")), "O", 1L, false),
        (2L, None: Option[java.sql.Date], "O", 1L, false))
      .toDF("id", "d", "status", "ver", "deleted")
      .createOrReplaceTempView("rollover_src")
    val family = tmp("graft-rollover-null-")
    val e = intercept[IllegalArgumentException] {
      Rollover.rolloverSync(spark, sf0001, job(SyncMode.Full), family)
    }
    assert(e.getMessage.contains("NULL"))
    assert(Rollover.readAlias(family).isEmpty, "nothing may publish on refusal")
  }

  test("poison quarantines per period: no period's rejects clobber another's") {
    val family = tmp("graft-rollover-dlq-")
    val dlq = tmp("graft-rollover-dlq-root-")
    setSource(night1)
    // one poisoned id per month: 1 (1997-01), 3 (1997-02)
    val j = job(SyncMode.Full).copy(
      deadLetter = Some(graft.sinks.DeadLetterPolicy(dlq, budget = 10)))
    Rollover.rolloverSync(spark, sf0001, j, family,
      wrap = c => PoisonClient(c, Set("1", "3")))
    // both months' quarantines exist side by side, with their docs
    val shed = spark.read.parquet(dlq)
    assert(shed.select("_id").collect().map(_.getString(0)).sorted.toSeq == Seq("1", "3"))
    val state = Rollover.familyState(family, "rollover_demo")
    assert(state.keySet.map(_._2) == Set("2", "4", "5"), s"survivors delivered: $state")
  }

  test("expired-but-unresolvable members are never resurrected into the alias") {
    val family = tmp("graft-rollover-res-")
    setSource(night1)
    Rollover.rolloverSync(spark, sf0001, job(SyncMode.Full), family)
    // simulate a crash mid-expire: the pointer died, the bytes did not
    Files.delete(Paths.get(family, "rollover_demo-1997-01", "current"))
    // the next alias refresh (here: an idempotent expire) must exclude it
    Rollover.expire(family, "rollover_demo", keepFrom = "0000")
    assert(Rollover.readAlias(family) ==
      Seq("rollover_demo-1997-02", "rollover_demo-1997-03"))
  }

  test("a job without a period refuses rolloverSync") {
    setSource(night1)
    val single = job(SyncMode.Full).copy(period = None)
    intercept[IllegalArgumentException] {
      Rollover.rolloverSync(spark, sf0001, single, tmp("graft-rollover-none-"))
    }
  }
}
