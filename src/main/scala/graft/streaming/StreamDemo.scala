package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SURVEY.md §2.J — true Structured Streaming (no oracle: DuckDB cannot
  * model triggers/watermarks).
  *
  * The events fixture is replayed as a file-source stream: rewritten into
  * many small parquet files consumed with maxFilesPerTrigger=1, so the
  * query really executes as a sequence of micro-batches and the watermark
  * advances between them.
  *
  * Three canonical stateful patterns:
  *  1. watermarked tumbling-window aggregation (update mode);
  *  2. stateful dedup via dropDuplicatesWithinWatermark;
  *  3. custom session state via flatMapGroupsWithState — the count is
  *     cross-checked against the batch session_window query by the test
  *     suite (two independent implementations, one answer).
  *
  * 100 TB notes: state lives in the state store (RocksDB provider in a
  * real cluster: spark.sql.streaming.stateStore.providerClass), watermark
  * bounds state size, and the file source becomes Kafka with the same
  * query body.
  */
object StreamDemo {

  case class Ev(event_id: Long, user_id: Long, ts_us: Long, event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n: Int)

  private val gapUs = 30L * 60 * 1000000 // 30 minutes in microseconds

  /** Rewrite events as time-ordered parquet chunks so the stream has real
    * micro-batches that replay in event-time order — with out-of-order
    * chunks the 1h watermark would (correctly) drop whole files as late,
    * which is the behavior being demonstrated, not the fixture we want.
    * Chunks are written sequentially so file mtimes (the file source's
    * replay order) follow event time. Adds ts_us for the typed path.
    */
  def stage(spark: SparkSession, sfDir: String, workDir: String): Unit = {
    val ev = Tables(spark, sfDir, "events")
      // withWatermark demands TIMESTAMP (not NTZ); session TZ is UTC so the
      // cast is value-preserving.
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("chunk", expr("(dayofmonth(ts) - 1) DIV 8"))
    (0 to 3).foreach { c =>
      ev.where(col("chunk") === c).drop("chunk").coalesce(1)
        .write.mode(if (c == 0) "overwrite" else "append").parquet(s"$workDir/in")
    }
  }

  private def source(spark: SparkSession, workDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$workDir/in").schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$workDir/in")
  }

  /** The nightly→continuous migration shape (§2.J meeting §2.L's views):
    * the SAME watermarked file-source stream maintains an
    * [[graft.sync.IncrementalView]] through foreachBatch — every
    * micro-batch folds its raw rows into the per-(event_type, day) state
    * at O(delta + state) cost, exactly-once under replays via the
    * batchId ledger committed atomically with the state. The contract a
    * migration needs: the streamed fold must equal the one-shot batch
    * aggregate over the same corpus — StreamDemoSpec asserts that
    * equality (no oracle needed; the equality IS the check). At 100 TB
    * the stream is Kafka and the view root is the same key-space-sized
    * state table the nightly job folded into — the query body and the
    * fold do not change.
    */
  def maintainedView(spark: SparkSession, workDir: String, viewRoot: String,
      ckptDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.sync.IncrementalView
    val st = source(spark, workDir)
      .withWatermark("ts", "1 hour")
      .select(col("event_type").as("k"),
        to_date(col("ts")).cast("string").as("day"),
        graft.Dets.dec6(col("value")).as("m"))
    IncrementalView.maintainContinuous(st, viewRoot,
      IncrementalView.ViewDef(Seq("k", "day"), "m"), ckptDir)
  }

  /** Watermarked tumbling aggregation; late data beyond 1h is dropped once
    * the watermark passes it.
    *
    * `rocksdb = true` runs the SAME query on the RocksDB state store
    * provider — the 100 TB streaming-state story: the default
    * HDFSBackedStateStoreProvider keeps every partition's state map in
    * executor HEAP (state size is bounded by executor memory, GC churn
    * scales with it), while RocksDB spills state to local SSD with
    * changelog checkpointing — billions of keys per executor. The conf is
    * read per-query at start, so it is set just for this one and restored
    * after; same watermark, same output, different state backend.
    */
  def windowedCounts(spark: SparkSession, workDir: String,
      rocksdb: Boolean = false): DataFrame = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    if (rocksdb) spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val name = if (rocksdb) "stream_windowed_rocksdb" else "stream_windowed"
      val q = source(spark, workDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .writeStream.outputMode("update").format("memory")
        .queryName(name).start()
      q.processAllAvailable(); q.stop()
      spark.table(name)
    } finally if (rocksdb) {
      prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
    }
  }

  /** Stateful streaming dedup: first event per (user, type, minute) with
    * bounded state (expired by the watermark).
    */
  def dedup(spark: SparkSession, workDir: String): DataFrame = {
    val q = source(spark, workDir)
      .withColumn("minute", date_trunc("minute", col("ts")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_dedup").start()
    q.processAllAvailable(); q.stop()
    spark.table("stream_dedup")
  }

  /** Custom sessionization with explicit GroupState: same 30-minute-gap
    * semantics as session_window / the gaps-and-islands oracle. Events
    * arrive in timestamp order per user (the fixture is time-ordered and
    * files are replayed in order), so carry-forward state suffices.
    */
  def sessions(spark: SparkSession, workDir: String): Dataset[SessionOut] = {
    import spark.implicits._
    val ds = source(spark, workDir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value"))
      .as[Ev]

    def fn(userId: Long, events: Iterator[Ev], state: GroupState[SessionState]): Iterator[SessionOut] = {
      var st = state.getOption.orNull
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      events.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        st match {
          case null =>
            st = SessionState(e.ts_us, e.ts_us, 1)
          case s if e.ts_us - s.last < gapUs =>
            st = SessionState(s.start, e.ts_us, s.n + 1)
          case s =>
            out += SessionOut(userId, s.start, s.last + gapUs, s.n)
            st = SessionState(e.ts_us, e.ts_us, 1)
        }
      }
      if (st != null) state.update(st)
      out.iterator
    }

    val q = ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_sessions").start()
    q.processAllAvailable(); q.stop()

    // Closed sessions were emitted; flush the still-open per-user tail by
    // reading the final state indirectly: re-run statically for the count
    // check the suite performs (open sessions = one per active user).
    spark.table("stream_sessions").as[SessionOut]
  }

  /** The SAME 30-minute-gap sessionization through Spark 4's
    * `transformWithState` — the arbitrary-state API that supersedes
    * `flatMapGroupsWithState` (typed named state handles, timers, TTL,
    * and schema evolution of state). The processor holds ONE
    * ValueState[SessionState] per user and applies the identical
    * extend-or-emit rule, so the output must match [[sessions]]
    * row-for-row — StreamDemoSpec pins the three-way agreement
    * (transformWithState == flatMapGroupsWithState == batch
    * session_window): three independent implementations, one answer.
    * transformWithState REQUIRES the RocksDB state store provider (the
    * 100 TB state backend [[windowedCounts]] demos); the conf is set
    * for this query and restored. */
  def sessionsTws(spark: SparkSession, workDir: String): Dataset[SessionOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
    val ds = source(spark, workDir)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"), col("value"))
      .as[Ev]
    class SessionProc extends StatefulProcessor[Long, Ev, SessionOut] {
      @transient private var st: ValueState[SessionState] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[SessionState]("session",
          org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
      override def handleInputRows(userId: Long, rows: Iterator[Ev],
          timers: TimerValues): Iterator[SessionOut] = {
        var cur = if (st.exists) st.get else null
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
          cur match {
            case null =>
              cur = SessionState(e.ts_us, e.ts_us, 1)
            case s if e.ts_us - s.last < gapUs =>
              cur = SessionState(s.start, e.ts_us, s.n + 1)
            case s =>
              out += SessionOut(userId, s.start, s.last + gapUs, s.n)
              cur = SessionState(e.ts_us, e.ts_us, 1)
          }
        }
        if (cur != null) st.update(cur)
        out.iterator
      }
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = ds.groupByKey(_.user_id)
        .transformWithState(new SessionProc, TimeMode.None(), OutputMode.Append())
        .writeStream.outputMode("append").format("memory")
        .queryName("stream_sessions_tws").start()
      q.processAllAvailable(); q.stop()
      spark.table("stream_sessions_tws").as[SessionOut]
    } finally prev.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }

  /** True stream-STREAM interval join (the §2.J shape the stream-static
    * enrichment can't show): clicks joined to later purchases by the same
    * user within six hours. Both sides are watermarked, and the join
    * condition carries an explicit event-time RANGE — that pair is what
    * lets Spark bound the join state: a buffered click can be evicted
    * once the purchase-side watermark passes click_ts + 6 h, so state is
    * O(events per join window), not O(stream history). At 100 TB this is the
    * only admissible shape — an unconstrained stream-stream join would
    * buffer both streams forever. Inner join + append mode: results emit
    * only once both watermarks clear the match window.
    */
  def intervalJoin(spark: SparkSession, workDir: String): DataFrame = {
    val clicks = source(spark, workDir)
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = source(spark, workDir)
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val q = clicks.join(purchases,
        col("c_user") === col("p_user") &&
        col("purchase_ts") > col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 6 HOURS"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("click_ts"), col("purchase_ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_interval_join").start()
    q.processAllAvailable(); q.stop()
    spark.table("stream_interval_join")
  }

  /** Stream → bulk store: the batch bulk sink reused under
    * foreachBatch. Exactly-once end to end from two layers:
    * the checkpoint makes each micro-batch processed once (a recovered
    * query re-runs at most the in-flight batch), and folding the
    * micro-batch id into the delivery directory makes that re-run land
    * on the same (batch, shard, file) keys — the idempotent client
    * overwrites instead of appending. This is the streaming half of the
    * "rows into a keyed store" contract (SURVEY.md §2.A / §7.6).
    */
  def bulkSink(spark: SparkSession, workDir: String, outDir: String): Unit = {
    val q = source(spark, workDir)
      .select(col("event_id"),
        to_json(struct(col("user_id"), col("event_type"), col("value"))).as("doc"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sinks.Writers.bulkIndex(batch, "event_id", "doc",
          shards = 4, batchSize = 500,
          graft.sinks.FileBulkClient(s"$outDir/mb=$batchId"))
      }
      .option("checkpointLocation", s"$outDir/_chk")
      .start()
    q.processAllAvailable(); q.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    stage(spark, sfDir, work)
    println(s"windowed rows: ${windowedCounts(spark, work).count()}")
    println(s"dedup rows:    ${dedup(spark, work).count()}")
    println(s"closed sessions: ${sessions(spark, work).count()}")
    spark.stop()
  }
}
