package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.to_date
import graft.sync._

/** The continuous path over a period family: micro-batches fan out to
  * their periods (create-on-first-sight, ledger-pinned generations),
  * nightly batch appends interleave without generation collisions, and
  * the crash/replay contract holds per period.
  */
class ContinuousRolloverSpec extends AnyFunSuite {
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
    DocField("id", "id", quoted = false),
    DocField("value", "value", quoted = true))

  private def job(name: String) = SyncJob(name, SyncSource.Table("unused"),
    idCol = "id", fields = fields, shards = 2, batchSize = 10,
    mode = SyncMode.Upsert("ver", "0", "deleted"),
    period = Some(IndexPeriod("d", "yyyy-MM")))

  private def genDirs(family: String, index: String): Seq[String] = {
    val cur = graft.sinks.AliasedIndex.resolve(s"$family/$index").get
    val l = Files.list(Paths.get(cur))
    try l.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("gen=")).toSeq.sorted
    finally l.close()
  }

  test("micro-batches fan out per period; nightly appends interleave without gen collisions") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long, Boolean)]
    val df = input.toDF().toDF("id", "d", "value", "ver", "deleted")
      .withColumn("d", to_date($"d"))
    val j = job("cr_mix")
    val family = tmp("graft_cr_family")
    val store = new WatermarkStore(tmp("graft_cr_wm"))
    val q = Rollover.startContinuous(df, j, family, store, tmp("graft_cr_ckpt"))
    try {
      input.addData((1L, "1997-01-10", "a", 1L, false), (2L, "1997-01-20", "b", 1L, false))
      q.processAllAvailable()
      assert(Rollover.readAlias(family) == Seq("cr_mix-1997-01"))
      // a period boundary + late data in one batch: 01 appended, 02 created
      input.addData((1L, "1997-01-10", "a2", 2L, false), (3L, "1997-02-05", "c", 2L, false))
      q.processAllAvailable()
      assert(Rollover.readAlias(family) == Seq("cr_mix-1997-01", "cr_mix-1997-02"))
      assert(Rollover.familyState(family, "cr_mix") == Map(
        ("cr_mix-1997-01", "1") -> """{"id":1,"value":"a2"}""",
        ("cr_mix-1997-01", "2") -> """{"id":2,"value":"b"}""",
        ("cr_mix-1997-02", "3") -> """{"id":3,"value":"c"}"""))
      assert(store.get("cr_mix").contains("2"))
      assert(genDirs(family, "cr_mix-1997-01") == Seq("gen=0001", "gen=0002"))
      assert(genDirs(family, "cr_mix-1997-02") == Seq("gen=0001"))

      // a NIGHTLY batch append lands between stream batches: its
      // generation must come after every ledger-reserved one
      Seq((4L, java.sql.Date.valueOf("1997-02-10"), "d", 3L, false))
        .toDF("id", "d", "value", "ver", "deleted")
        .createOrReplaceTempView("cr_nightly_src")
      val nightly = j.copy(source = SyncSource.Sql("SELECT * FROM cr_nightly_src"),
        mode = SyncMode.Incremental("ver", "2"))
      val out = Rollover.rolloverSync(spark, sf0001, nightly, family)
      assert(out.map(o => (o.index, o.gen)) == Seq(("cr_mix-1997-02", Some(2))))

      // and the NEXT stream batch allocates past the nightly's generation
      input.addData((3L, "1997-02-05", "c2", 4L, false))
      q.processAllAvailable()
      assert(genDirs(family, "cr_mix-1997-02") == Seq("gen=0001", "gen=0002", "gen=0003"))
      assert(Rollover.familyState(family, "cr_mix") == Map(
        ("cr_mix-1997-01", "1") -> """{"id":1,"value":"a2"}""",
        ("cr_mix-1997-01", "2") -> """{"id":2,"value":"b"}""",
        ("cr_mix-1997-02", "3") -> """{"id":3,"value":"c2"}""",
        ("cr_mix-1997-02", "4") -> """{"id":4,"value":"d"}"""))
    } finally q.stop()
  }

  test("a dedup gate composes with the period fan-out: shed docs never create their period") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long, String)]
    val df = input.toDF().toDF("doc_id", "lang", "text", "n_chars", "d")
      .withColumn("d", to_date($"d"))
    val j = SyncJob("cr_gated", SyncSource.Table("unused"), idCol = "doc_id",
      fields = Seq(DocField("doc_id", "doc_id", quoted = false),
        DocField("lang", "lang", quoted = true)),
      shards = 2, batchSize = 10,
      mode = SyncMode.Incremental("doc_id", "0"),
      period = Some(IndexPeriod("d", "yyyy-MM")))
    val family = tmp("graft_crg_family")
    val store = new WatermarkStore(tmp("graft_crg_wm"))
    val q = Rollover.startContinuous(df, j, family, store, tmp("graft_crg_ckpt"),
      gate = Some(new DedupGate(tmp("graft_crg_sig")).filterBatch))
    try {
      // doc 2 (1997-02) is a same-block near-dup of doc 1 (1997-01): the
      // gate sheds it BEFORE the period fan-out, so its period index is
      // never even created — but the watermark still covers it
      input.addData(
        (1L, "en", "a b c d e f g h i j", 10L, "1997-01-10"),
        (2L, "en", "a b c d e f g h i k", 10L, "1997-02-05"))
      q.processAllAvailable()
      assert(Rollover.readAlias(family) == Seq("cr_gated-1997-01"),
        "a fully-shed period must not be created")
      assert(store.get("cr_gated").contains("2"),
        s"watermark must cover shed docs: ${store.get("cr_gated")}")
      // a genuinely novel doc in that period creates it as usual
      input.addData((3L, "en", "x y z w v u t s r q", 10L, "1997-02-20"))
      q.processAllAvailable()
      assert(Rollover.readAlias(family) == Seq("cr_gated-1997-01", "cr_gated-1997-02"))
      assert(Rollover.familyState(family, "cr_gated").keySet ==
        Set(("cr_gated-1997-01", "1"), ("cr_gated-1997-02", "3")))
    } finally q.stop()
  }

  test("the gate plan evaluates each batch row once despite the period fan-out") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long, Boolean)]
    val df = input.toDF().toDF("id", "d", "value", "ver", "deleted")
      .withColumn("d", to_date($"d"))
    val j = job("cr_once")
    val family = tmp("graft_cro_family")
    val store = new WatermarkStore(tmp("graft_cro_wm"))
    // a counting stand-in for an expensive gate probe (DedupGate re-reads
    // its whole grow-only signature store per execution): without the
    // fan-out pinning the gated batch, collectPeriods + each period slice
    // would re-run this plan, tripling the count on a 2-period batch
    val evals = spark.sparkContext.longAccumulator("cr_once_gate_evals")
    val counted = org.apache.spark.sql.functions.udf { (_: Long) =>
      evals.add(1); true
    }.asNondeterministic() // a fold-proof call per row per execution
    val gate: (org.apache.spark.sql.DataFrame, Long) => org.apache.spark.sql.DataFrame =
      (b, _) => b.filter(counted($"id"))
    val q = Rollover.startContinuous(df, j, family, store,
      tmp("graft_cro_ckpt"), gate = Some(gate))
    try {
      input.addData((1L, "1997-01-10", "a", 1L, false),
        (2L, "1997-02-05", "b", 1L, false))
      q.processAllAvailable()
      assert(Rollover.readAlias(family) == Seq("cr_once-1997-01", "cr_once-1997-02"))
      assert(evals.value == 2,
        s"gate must evaluate each row once per batch, got ${evals.value}")
    } finally q.stop()
  }

  test("streaming append refuses mapping drift like the batch path") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long, Boolean)]
    val df = input.toDF().toDF("id", "d", "value", "ver", "deleted")
      .withColumn("d", to_date($"d"))
    val j = job("cr_drift")
    val family = tmp("graft_crd_family")
    val q1 = Rollover.startContinuous(df, j, family,
      new WatermarkStore(tmp("graft_crd_wm")), tmp("graft_crd_ckpt"))
    try {
      input.addData((1L, "1997-01-10", "a", 1L, false))
      q1.processAllAvailable()
    } finally q1.stop()
    val drifted = j.copy(fields = fields :+ DocField("version", "ver", quoted = false))
    val input2 = MemoryStream[(Long, String, String, Long, Boolean)]
    val df2 = input2.toDF().toDF("id", "d", "value", "ver", "deleted")
      .withColumn("d", to_date($"d"))
    val q2 = Rollover.startContinuous(df2, drifted, family,
      new WatermarkStore(tmp("graft_crd_wm2")), tmp("graft_crd_ckpt2"))
    try {
      input2.addData((2L, "1997-01-20", "b", 2L, false))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(e).exists(_.getMessage != null) &&
        causes(e).exists(c => c.getMessage != null && c.getMessage.contains("mapping drift")),
        s"expected a mapping-drift refusal, got: $e")
    } finally q2.stop()
    // the refused batch delivered nothing: the period still serves batch 0
    assert(Rollover.familyState(family, "cr_drift") == Map(
      ("cr_drift-1997-01", "1") -> """{"id":1,"value":"a"}"""))
  }

  test("kill between delivery and commit: replay restores per-period bytes exactly") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Long, Boolean)]
    val df = input.toDF().toDF("id", "d", "value", "ver", "deleted")
      .withColumn("d", to_date($"d"))
    val j = job("cr_resume")
    val family = tmp("graft_crr_family")
    val store = new WatermarkStore(tmp("graft_crr_wm"))
    val ckpt = tmp("graft_crr_ckpt")
    val q1 = Rollover.startContinuous(df, j, family, store, ckpt)
    try {
      input.addData((1L, "1997-01-10", "a", 1L, false))
      q1.processAllAvailable()
      input.addData((2L, "1997-01-20", "b", 2L, false), (3L, "1997-02-05", "c", 2L, false))
      q1.processAllAvailable()
    } finally q1.stop()
    val uninterrupted = dirSnapshot(family)
    // crash window: batch 1 delivered but uncommitted, its doc files torn
    // in BOTH periods it touched (the ledger survives — it is what makes
    // the replay land on the same generations)
    Files.delete(Paths.get(ckpt, "commits", "1"))
    Files.deleteIfExists(Paths.get(ckpt, "commits", ".1.crc"))
    Files.walk(Paths.get(family)).iterator().asScala.toSeq
      .filter(p => p.toString.endsWith(".jsonl") &&
        ((p.toString.contains("cr_resume-1997-01/") && p.toString.contains("gen=0002")) ||
         (p.toString.contains("cr_resume-1997-02/") && p.toString.contains("gen=0001"))))
      .foreach(Files.delete(_))
    assert(dirSnapshot(family) != uninterrupted, "the crash must have torn the family")
    val q2 = Rollover.startContinuous(df, j, family, store, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(dirSnapshot(family) == uninterrupted,
      "replayed batch must restore the family's bytes exactly")
    assert(Rollover.familyState(family, "cr_resume") == Map(
      ("cr_resume-1997-01", "1") -> """{"id":1,"value":"a"}""",
      ("cr_resume-1997-01", "2") -> """{"id":2,"value":"b"}""",
      ("cr_resume-1997-02", "3") -> """{"id":3,"value":"c"}"""))
  }
}
