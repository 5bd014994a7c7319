package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{BulkClient, BulkDoc, BulkRejectedException, DocOutcome, FileBulkClient, Writers}

/** Attempt counter for [[FlakyClient]], JVM-global: foreachPartition
  * serializes the client per task, so instance state would be a per-task
  * copy — in local mode a static map is the shared failure script.
  */
object FlakyState {
  private val attempts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()
  def next(key: String): Int = attempts.computeIfAbsent(key,
    _ => new java.util.concurrent.atomic.AtomicInteger).incrementAndGet()
}

/** Fails the first `failures` sends of every (shard, batch), then
  * delegates — the transient-outage model for the retry loop:
  * `throw` = network-level request failure, `reject` = per-doc 429-style
  * retryable rejections, `permanent` = per-doc mapping-style rejection.
  */
case class FlakyClient(tag: String, inner: BulkClient, failures: Int,
    mode: String) extends BulkClient {
  override def send(shard: Int, batchIdx: Int, docs: Seq[BulkDoc]): Seq[DocOutcome] = {
    val n = FlakyState.next(s"$tag:$shard:$batchIdx")
    if (n > failures) inner.send(shard, batchIdx, docs)
    else mode match {
      case "throw" => throw new RuntimeException(s"transient network failure #$n")
      case "reject" => docs.map(d => DocOutcome(d.id, ok = false,
        retryable = true, error = Some("429 es_rejected_execution")))
      case "permanent" => docs.zipWithIndex.map { case (d, i) =>
        if (i == 0) DocOutcome(d.id, ok = false, retryable = false,
          error = Some("mapper_parsing_exception"))
        else DocOutcome(d.id, ok = true)
      }
    }
  }
}

/** The production writer surface (SURVEY.md §2.A / §7.6): partitioned
  * warehouse layout with partition-pruned reads, and the ES-style bulk
  * sink — deterministic hash routing, in-shard ordering, fixed-size
  * batches, and idempotent redelivery. "Exactly-once" here is the
  * replay test: running the whole sink twice leaves the store
  * byte-identical with zero duplicate `_id`s.
  */
class SinkSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String): Path = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit(); d
  }

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("writePartitioned lays out lang=... dirs and reads partition-prune") {
    val dir = tmp("graft_part").toString
    Writers.writePartitioned(docs.select("doc_id", "lang", "n_chars"), dir, Seq("lang"))
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).sorted
    val subdirs = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("lang=")).toSeq.sorted
    assert(subdirs == langs.map("lang=" + _).toSeq)
    // a lang-filtered read partition-prunes the scan (inputFiles is
    // pre-pruning, so assert the scan's PartitionFilters instead)
    val one = spark.read.parquet(dir).where(col("lang") === langs.head)
    val p = one.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("lang"), p.take(1500))
    assert(one.count() == docs.where(col("lang") === langs.head).count())
    // round-trip: nothing lost
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("bucketed saveAsTable join reads co-located buckets with no exchange") {
    import org.apache.spark.sql.functions.col
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val l = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    sinks.Writers.writeBucketed(o, "g_orders_b", 4, Seq("o_orderkey"))
    sinks.Writers.writeBucketed(l, "g_lineitem_b", 4, Seq("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join: the point is that the bucket layout
      // replaces the shuffle both sides would otherwise pay
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("g_orders_b").join(spark.table("g_lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val expected = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
      assert(j.count() == expected)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${p.take(2000)}")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
      // the scan itself advertises the bucket layout
      assert(p.contains("SelectedBucketsCount"), p.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    }
  }

  test("bulkIndex batches in _id order per shard and replay is duplicate-free") {
    val dir = tmp("graft_bulk").toString
    val in = docs.select(col("doc_id"), to_json(struct(col("lang"), col("n_chars"))).as("doc"))
    def runOnce(): Unit =
      Writers.bulkIndex(in, "doc_id", "doc", shards = 4, batchSize = 50,
        FileBulkClient(dir))

    def snapshot(): Map[String, String] =
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => p.toString.stripPrefix(dir) -> new String(Files.readAllBytes(p), "UTF-8"))
        .toMap

    runOnce()
    val first = snapshot()
    // every input row landed exactly once, across 4 shards
    val ids = first.values.flatMap(_.split("\n")).filter(_.nonEmpty)
      .map(l => l.split("\"_id\":\"")(1).takeWhile(_ != '"')).toSeq
    assert(ids.size == in.count())
    assert(ids.distinct.size == ids.size, "duplicate _id in bulk output")
    assert(first.keys.map(_.split("/")(1)).toSet.size == 4)
    // batches respect batchSize (only the last batch per shard may be short)
    first.foreach { case (name, body) =>
      val n = body.split("\n").count(_.nonEmpty)
      assert(n <= 50, s"$name has $n docs > batchSize")
    }
    // the exactly-once story: full replay (task-retry analog) changes nothing
    runOnce()
    assert(snapshot() == first, "replay must be byte-identical, not appended")
  }

  private def dirSnapshot(dir: String): Map[String, String] =
    Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => p.toString.stripPrefix(dir) -> new String(Files.readAllBytes(p), "UTF-8"))
      .toMap

  test("a transiently-failing client converges byte-identically under the retry loop") {
    import graft.sync.{DocField, SyncJob, SyncRunner, SyncSource}
    val job = SyncJob("flaky", SyncSource.Table("orders"), idCol = "o_orderkey",
      fields = Seq(DocField("order_id", "o_orderkey", quoted = false)),
      shards = 2, batchSize = 200)
    val clean = tmp("graft_flaky_clean").toString
    SyncRunner.run(spark, sf0001, job, FileBulkClient(clean))
    // every (shard, batch)'s first TWO requests fail at the network level
    val thrown = tmp("graft_flaky_throw").toString
    SyncRunner.run(spark, sf0001, job,
      FlakyClient("throw-run", FileBulkClient(thrown), failures = 2, mode = "throw"))
    assert(dirSnapshot(thrown) == dirSnapshot(clean),
      "retried delivery must converge to the clean run's bytes")
    // ... and per-doc retryable rejections (429s) converge the same way
    val rejected = tmp("graft_flaky_reject").toString
    SyncRunner.run(spark, sf0001, job,
      FlakyClient("reject-run", FileBulkClient(rejected), failures = 1, mode = "reject"))
    assert(dirSnapshot(rejected) == dirSnapshot(clean))
  }

  test("permanent rejections and exhausted retries fail loudly with the rejected ids") {
    val docs = Seq(BulkDoc("1", Some("{}")), BulkDoc("2", Some("{}")))
    val sink = FileBulkClient(tmp("graft_flaky_perm").toString)
    // a permanent (non-retryable) rejection throws immediately
    val e = intercept[BulkRejectedException] {
      Writers.deliver(FlakyClient("perm", sink, failures = 1, mode = "permanent"),
        shard = 0, batchIdx = 0, docs)
    }
    assert(e.rejected.map(_.id) == Seq("1"))
    assert(e.getMessage.contains("mapper_parsing_exception"))
    // retryable failures beyond maxRetries also surface, with the ids
    val e2 = intercept[BulkRejectedException] {
      Writers.deliver(FlakyClient("exhaust", sink, failures = 10, mode = "reject"),
        shard = 0, batchIdx = 1, docs, maxRetries = 2, backoffMs = 1)
    }
    assert(e2.rejected.map(_.id) == Seq("1", "2"))
  }
}
