package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q_stream_latedata MODEL cross-checked against the REAL engine:
  * the same sharded-arrival micro-batches, replayed through an actual
  * readStream with the same watermark, must drop exactly the rows the
  * batch model predicts — `numRowsDroppedByWatermark` is the ground
  * truth, not our arithmetic.
  *
  * The streaming op is `dropDuplicates("event_id")` under the
  * watermark: every event_id is unique, so the operator's ONLY effect
  * is the watermark's row-level late filter — the same per-EVENT
  * criterion the declared ledger counts (a windowed aggregation would
  * instead drop per closed WINDOW). Engine detail the model reproduces:
  * the watermark is tracked in MILLISECONDS — wm = floor(maxPrevTs_us /
  * 1000) ms minus the delay, and a row drops iff ts_us < wm_ms * 1000.
  *
  * One file per micro-batch (maxFilesPerTrigger=1) with strictly
  * increasing mtimes pins the replay order to the model's batch order.
  */
class StreamLateDataSpec extends AnyFunSuite {
  import TestSpark._

  test("sharded replay: engine watermark drops == the batch model's count") {
    val work = java.nio.file.Files.createTempDirectory("graft_late_").toString
    val ev = Tables(spark, sf0001, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("seq", expr(
        "row_number() OVER (PARTITION BY user_id % 4 ORDER BY ts, event_id) - 1"))
      .withColumn("batch", expr("CAST(seq DIV 25 AS BIGINT)"))
    val batches = ev.select(col("batch"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"))
      .collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (b, rows) => b -> rows.map(_.getLong(2)).toSeq }
    // write one parquet file per batch, mtimes strictly increasing
    val inDir = new java.io.File(s"$work/in"); inDir.mkdirs()
    val seen = scala.collection.mutable.Set.empty[String]
    batches.foreach { case (b, _) =>
      ev.where(col("batch") === b).drop("seq", "batch").coalesce(1)
        .write.mode("append").parquet(s"$work/in")
      val fresh = inDir.listFiles.filter(f =>
        f.getName.endsWith(".parquet") && !seen.contains(f.getName))
      assert(fresh.length == 1, s"batch $b wrote ${fresh.length} files")
      fresh.head.setLastModified(1700000000000L + b * 2000L)
      seen += fresh.head.getName
    }
    // the model: Spark's exact arithmetic — ms-truncated running max of
    // event time, minus the delay, strict row-level compare (ts_us <
    // wm_ms * 1000). Propagation detail pinned EMPIRICALLY on this
    // engine: a batch's stats advance the watermark only at the next
    // offset commit, and the advanced value filters the batch after
    // that — so batch k is filtered by stats through batch k-2 (a
    // two-trigger lag; modeling k-1 predicts 526 drops where the engine
    // drops 220).
    val delayMs = 2L * 3600 * 1000
    val runMaxMs = batches.scanLeft(Long.MinValue) { case (m, (_, tsList)) =>
      math.max(m, tsList.map(_ / 1000).max)
    } // runMaxMs(i) = max over batches < i
    val expectedPerBatch = batches.zipWithIndex.map { case ((_, tsList), k) =>
      // runMaxMs(k-1) = max through batch k-2 — the two-trigger lag
      val wmMs =
        if (k < 2 || runMaxMs(k - 1) == Long.MinValue) Long.MinValue
        else runMaxMs(k - 1) - delayMs
      tsList.count(us => wmMs != Long.MinValue && us < wmMs * 1000).toLong
    }
    val expectedDrops = expectedPerBatch.sum
    // the engine: same files, same order, same watermark
    val schema = spark.read.parquet(s"$work/in").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$work/in")
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("late_xcheck").start()
    q.processAllAvailable()
    val enginePerBatch = q.recentProgress
      .map(p => p.batchId ->
        Option(p.stateOperators).toSeq.flatten.map(_.numRowsDroppedByWatermark).sum)
      .toMap
    val engineDrops = enginePerBatch.values.sum
    q.stop()
    assert(expectedDrops > 0, "fixture produced no late rows — model degenerated")
    assert(engineDrops == expectedDrops,
      s"engine dropped $engineDrops, model predicted $expectedDrops")
    // not just the total: the model must predict every micro-batch's count
    expectedPerBatch.zipWithIndex.foreach { case (exp, k) =>
      assert(enginePerBatch.getOrElse(k.toLong, 0L) == exp,
        s"batch $k: engine ${enginePerBatch.getOrElse(k.toLong, 0L)} != model $exp")
    }
    // and nothing dropped is also served: survivors = total - drops
    val served = spark.table("late_xcheck").count()
    assert(served == batches.map(_._2.size).sum - engineDrops)
  }
}
