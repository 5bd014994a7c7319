package graft

import graft.streaming.StreamDemo
import org.scalatest.funsuite.AnyFunSuite

class StreamDemoSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val work = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_test").toString
    StreamDemo.stage(spark, sf0001, dir)
    dir
  }

  test("watermarked windowed aggregation produces every (window, type) group") {
    val streamed = StreamDemo.windowedCounts(spark, work)
    // update-mode memory sink keeps the latest row per group; group count
    // must equal the batch tumbling query's.
    val batchGroups = SparkEntry.queries("q_stream_tumbling")(spark, sf0001).count()
    assert(streamed.select("window", "event_type").distinct().count() == batchGroups)
  }

  test("RocksDB state store provider yields the identical windowed result") {
    // the 100 TB state backend: same query, state in RocksDB (local-disk,
    // changelog-checkpointed) instead of executor heap — results must be
    // indistinguishable from the default provider's
    val heap = StreamDemo.windowedCounts(spark, work)
      .select("window", "event_type", "n", "sum_value").collect().toSet
    val rocks = StreamDemo.windowedCounts(spark, work, rocksdb = true)
      .select("window", "event_type", "n", "sum_value").collect().toSet
    assert(rocks == heap)
    assert(rocks.nonEmpty)
  }

  test("streaming dedup matches the batch keyed-dedup row count") {
    val streamed = StreamDemo.dedup(spark, work).count()
    val batch = SparkEntry.queries("q_stream_dedup")(spark, sf0001).count()
    assert(streamed == batch)
  }

  test("foreachBatch-maintained IncrementalView equals the one-shot batch aggregate") {
    import org.apache.spark.sql.functions._
    val viewRoot = java.nio.file.Files.createTempDirectory("graft_stream_view").toString
    graft.sinks.AliasedIndex.deleteRecursively(java.nio.file.Paths.get(viewRoot))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_view_ckpt").toString
    val q = StreamDemo.maintainedView(spark, work, viewRoot, ckpt)
    try q.processAllAvailable() finally q.stop()
    // the stream replayed 4 file chunks — the fold must have run per batch
    assert(graft.sync.IncrementalView.lastBatch(viewRoot).exists(_ >= 1L),
      "view folded in fewer than 2 micro-batches — not a streaming fold")
    val streamed = graft.sync.IncrementalView.read(spark, viewRoot)
      .select("k", "day", "mv_n", "mv_s").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDecimal(3).stripTrailingZeros))).toMap
    val batch = Tables(spark, sf0001, "events")
      .groupBy(col("event_type").as("k"),
        to_date(col("ts").cast("timestamp")).cast("string").as("day"))
      .agg(count(lit(1)).as("n"), sum(Dets.dec6(col("value"))).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDecimal(3).stripTrailingZeros))).toMap
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed fold != one-shot aggregate (streamed ${streamed.size} keys, " +
        s"batch ${batch.size})")
  }

  test("foreachBatch bulk sink delivers every event exactly once; restart adds nothing") {
    import scala.jdk.CollectionConverters._
    val out = java.nio.file.Files.createTempDirectory("graft_stream_bulk").toString
    StreamDemo.bulkSink(spark, work, out)
    def ids(): Seq[String] = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      try walk.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".jsonl"))
        .flatMap(p => new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          .split("\n").filter(_.nonEmpty)
          .map(l => l.split("\"_id\":\"")(1).takeWhile(_ != '"')))
        .toList
      finally walk.close()
    }
    val first = ids()
    val expected = spark.read.parquet(s"$work/in").count()
    assert(first.size == expected, s"${first.size} docs delivered, $expected events staged")
    assert(first.distinct.size == first.size, "duplicate _id across micro-batches")
    // restart against the same checkpoint: everything already committed,
    // so the store must be unchanged (the exactly-once story)
    StreamDemo.bulkSink(spark, work, out)
    assert(ids().sorted == first.sorted, "restart re-delivered documents")
  }

  test("bulk sink resumes from its checkpoint: an interrupted run plus a resumed run converge") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    // private input dir that receives the staged files INCREMENTALLY —
    // the mid-stream-interruption scenario: deliver half, stop, more
    // data arrives, resume from the same checkpoint
    val in2root = Files.createTempDirectory("graft_stream_resume_in").toString
    val in2 = Paths.get(in2root, "in")
    Files.createDirectories(in2)
    val staged = {
      val listing = Files.list(Paths.get(s"$work/in"))
      try listing.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toList.sortBy(_.toString)
      finally listing.close()
    }
    assert(staged.size >= 3, s"expected several staged chunks, got ${staged.size}")
    def arrive(p: java.nio.file.Path): Unit =
      Files.copy(p, in2.resolve(p.getFileName), StandardCopyOption.COPY_ATTRIBUTES)
    val (firstHalf, lateHalf) = staged.splitAt(2)
    firstHalf.foreach(arrive)
    val out = Files.createTempDirectory("graft_stream_resume_out").toString
    StreamDemo.bulkSink(spark, in2root, out) // run 1: sees only the first half
    def ids(): Seq[String] = {
      val walk = Files.walk(Paths.get(out))
      try walk.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".jsonl"))
        .flatMap(p => new String(Files.readAllBytes(p), "UTF-8")
          .split("\n").filter(_.nonEmpty)
          .map(l => l.split("\"_id\":\"")(1).takeWhile(_ != '"')))
        .toList
      finally walk.close()
    }
    val partial = ids()
    val firstHalfCount = spark.read.parquet(firstHalf.map(_.toString): _*).count()
    assert(partial.size == firstHalfCount,
      s"interrupted run delivered ${partial.size}, staged $firstHalfCount")
    // late data arrives while the query is DOWN; the resumed query must
    // pick up exactly the unseen files from the checkpointed source log
    lateHalf.foreach(arrive)
    StreamDemo.bulkSink(spark, in2root, out)
    val full = ids()
    val expected = spark.read.parquet(s"$work/in")
      .select("event_id").collect().map(_.getLong(0).toString).toSet
    assert(full.toSet == expected, "resumed run must complete the delivery")
    assert(full.size == full.distinct.size,
      "resume re-delivered documents outside their original micro-batch keys")
    assert(partial.toSet.subsetOf(full.toSet))
  }

  test("stream-stream interval join agrees with the batch interval join") {
    import org.apache.spark.sql.functions._
    val streamed = StreamDemo.intervalJoin(spark, work)
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = spark.read.parquet(s"$work/in")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val batch = clicks.join(purchases,
        col("c_user") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 6 HOURS"))
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the fixture replays in event-time order, so no pair is dropped as
    // late: the streaming result must equal the batch join exactly
    assert(streamed == batch)
    assert(streamed.size >= 10, s"degenerate join: ${streamed.size} pairs")
  }

  test("flatMapGroupsWithState sessions agree with batch session_window") {
    import org.apache.spark.sql.functions._
    val closed = StreamDemo.sessions(spark, work).count()
    val batch = SparkEntry.queries("q_stream_session")(spark, sf0001)
    val users = batch.select("user_id").distinct().count()
    // The streaming job only emits *closed* sessions; each user's final
    // session is still open when the input ends.
    assert(closed == batch.count() - users)
    // And closed sessions' (user, n) multiset must match the batch result
    // dropping each user's last session.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("s_start").desc)
    val batchClosed = batch
      .withColumn("r", row_number().over(w)).where(col("r") > 1)
      .groupBy("user_id").agg(sum("n").as("events"))
    val streamClosed = StreamDemo.sessions(spark, work)
      .groupBy("user_id").agg(sum("n").as("events"))
    assert(streamClosed.exceptAll(batchClosed).isEmpty &&
      batchClosed.exceptAll(streamClosed).isEmpty)
  }

  test("transformWithState sessions match flatMapGroupsWithState row-for-row") {
    // Spark 4's arbitrary-state API against the classic one: identical
    // extend-or-emit rule, identical output — three independent
    // implementations (tws, fmgws, batch session_window) one answer.
    // transformWithState runs on the RocksDB provider (it requires it),
    // so this doubles as a second RocksDB-backend leg.
    val tws = StreamDemo.sessionsTws(spark, work)
      .collect().map(_.toString).sorted.toSeq
    val fmgws = StreamDemo.sessions(spark, work)
      .collect().map(_.toString).sorted.toSeq
    assert(tws.nonEmpty, "transformWithState emitted no closed sessions")
    assert(tws == fmgws,
      s"APIs diverge: tws ${tws.size} rows vs fmgws ${fmgws.size}")
  }
}
