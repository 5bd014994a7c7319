package graft.operators

import graft.{Dets, QueryFamily, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Dets._

/** SURVEY.md §2.J — streaming semantics, batch-checkable analogs.
  *
  * These run the `events` stream table in batch mode with the exact
  * operators Structured Streaming uses (`window`, `session_window`,
  * keyed dedup), so a DuckDB oracle can check them; the true streaming
  * path (readStream + watermark + triggers) is graft.streaming.StreamDemo,
  * which cannot be oracle-checked (incremental triggers have no DuckDB
  * model). Value sums go through DECIMAL(18,6) so they're order-exact.
  *
  * Scale: tumbling/sliding aggs are partial-aggregated map-side before the
  * shuffle on (window, key); session windows shuffle once on user_id; at
  * 100 TB the streaming versions keep state in RocksDB with watermark
  * eviction (see StreamDemo).
  */
object StreamOps extends QueryFamily {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 1h window per event_type.
    "q_stream_tumbling" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec6(col("value")))).as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("wstart", "event_type")),

    // Sliding 1h window every 15min — each event lands in 4 windows.
    "q_stream_sliding" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec6(col("value")))).as("sum_value"))
        .select(col("w.start").as("wstart"), col("n"), col("sum_value"))
        .orderBy("wstart")),

    // Session windows, 30-minute gap, per user. The oracle is the classic
    // gaps-and-islands form — doubling as a correctness proof of
    // session_window. Note Spark merges strictly-overlapping windows, so a
    // gap of exactly 30:00 starts a new session (oracle uses >=).
    "q_stream_session" -> ((s, dir) =>
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec6(col("value")))).as("sum_value"))
        .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")),

    // Stream-static enrichment: the event stream joined to the static
    // customer dimension (broadcast — the canonical plan for a
    // stream-static join, re-evaluated per micro-batch with no stream
    // state), then a tumbling 1h revenue window per market segment. The
    // true readStream path is cross-checked against this batch analog in
    // StreamDemoSpec.
    "q_stream_join" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      Tables(s, dir, "events")
        .join(broadcast(c), col("user_id") === col("c_custkey"))
        .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec6(col("value")))).as("sum_value"))
        .select(col("w.start").as("wstart"), col("c_mktsegment"), col("n"), col("sum_value"))
        .orderBy("wstart", "c_mktsegment")
    }),

    // Watermark late-data accounting — the drop ledger every production
    // stream publishes (numRowsDroppedByWatermark): how many events the
    // 2h watermark would discard, per event type. The fixture's events
    // are globally time-ordered, so arrival disorder is modeled the way
    // it actually arises: 4 per-shard time-ordered streams (Kafka
    // partitions; shard = user_id % 4) interleaved into micro-batches of
    // 5 rows per shard — per-shard order preserved, global order not.
    // The watermark before batch k is max event time over batches < k
    // minus the 2h delay — the SEMANTIC watermark rule (the ledger a
    // user reasons about), deliberately NOT the engine's observed
    // propagation: StreamLateDataSpec pins empirically that the real
    // engine filters batch k by stats through batch k-2 (a two-trigger
    // lag; the k-1 model here predicts 526 drops where the engine drops
    // 220 — the spec replays the k-2 model and matches
    // numRowsDroppedByWatermark batch-by-batch). Scale:
    // the per-shard sequence is the source's own partition offset (free
    // in Kafka; one window shuffle per shard here); the watermark table
    // is one tiny row per micro-batch (running max over the batch
    // SUMMARY, broadcast back) — never a global window over events.
    "q_stream_latedata" -> ((s, dir) => {
      val wSeq = Window.partitionBy(expr("user_id % 4"))
        .orderBy(col("ts"), col("event_id"))
      val b = Tables(s, dir, "events")
        .withColumn("seq", row_number().over(wSeq) - lit(1))
        .withColumn("batch", expr("CAST(seq DIV 5 AS BIGINT)"))
        .select("batch", "ts", "event_type")
      val wWm = Window.orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wm = b.groupBy("batch").agg(max("ts").as("bmax"))
        .withColumn("wm", max(col("bmax")).over(wWm) - expr("INTERVAL 2 HOURS"))
        .select("batch", "wm")
      b.join(broadcast(wm), "batch")
        .withColumn("late", col("wm").isNotNull && col("ts") < col("wm"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
          sum(when(!col("late"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("event_type")
    }),

    // Streaming-dedup analog: earliest event per (user, type, minute) —
    // row_number, not dropDuplicates (which keeps an arbitrary row).
    "q_stream_dedup" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("user_id"), col("event_type"), date_trunc("minute", col("ts")))
        .orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("event_id")
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_stream_tumbling" -> ("SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, " +
      "event_type, count(*) AS n, " +
      "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
      "FROM events GROUP BY wstart, event_type ORDER BY wstart, event_type"),

    "q_stream_sliding" -> ("SELECT wstart, count(*) AS n, " +
      "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value FROM " +
      "(SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL 1 MINUTE AS wstart, value " +
      "FROM events, unnest([0, 15, 30, 45]) AS t(k)) " +
      "GROUP BY wstart ORDER BY wstart"),

    "q_stream_session" -> ("WITH e AS (SELECT user_id, ts, value, event_id, " +
      "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL " +
      "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL 30 MINUTE " +
      "THEN 1 ELSE 0 END AS new_s FROM events), " +
      "sess AS (SELECT user_id, ts, value, " +
      "SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM e) " +
      "SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end, " +
      "count(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
      "FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start"),

    // identical shard/sequence/batch/watermark arithmetic; counts CAST
    // (DuckDB sums to HUGEINT)
    "q_stream_latedata" -> ("WITH e AS (SELECT event_id, ts, event_type, " +
      "row_number() OVER (PARTITION BY user_id % 4 ORDER BY ts, event_id) - 1 AS seq " +
      "FROM events), " +
      "b AS (SELECT seq // 5 AS batch, ts, event_type FROM e), " +
      "bm AS (SELECT batch, max(ts) AS bmax FROM b GROUP BY batch), " +
      "wm AS (SELECT batch, max(bmax) OVER (ORDER BY batch " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - INTERVAL 2 HOUR AS wm FROM bm) " +
      "SELECT event_type, count(*) AS n_total, " +
      "CAST(sum(CASE WHEN wm.wm IS NOT NULL AND b.ts < wm.wm THEN 1 ELSE 0 END) AS BIGINT) AS n_late, " +
      "CAST(sum(CASE WHEN wm.wm IS NULL OR b.ts >= wm.wm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept " +
      "FROM b JOIN wm USING (batch) GROUP BY event_type ORDER BY event_type"),

    "q_stream_join" -> ("SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, " +
      "c_mktsegment, count(*) AS n, " +
      "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value " +
      "FROM events JOIN customer ON user_id = c_custkey " +
      "GROUP BY wstart, c_mktsegment ORDER BY wstart, c_mktsegment"),

    "q_stream_dedup" -> ("SELECT event_id, user_id, event_type, ts, value FROM " +
      "(SELECT *, row_number() OVER (PARTITION BY user_id, event_type, " +
      "date_trunc('minute', ts) ORDER BY ts, event_id) AS rn FROM events) " +
      "WHERE rn = 1 ORDER BY event_id"),
  )
}
