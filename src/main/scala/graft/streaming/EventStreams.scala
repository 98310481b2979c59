package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import java.sql.Timestamp

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props) — the streaming
  * extension planned in SURVEY.md §2.9/§7.5 (the reference itself is
  * batch-only; its dashboard "interactivity" is re-filtering a cached
  * table).
  *
  * Every transform takes a DataFrame so it works identically on a batch
  * frame (unit tests, backfill) and a `readStream` source — the
  * batch/streaming unification is the point of Structured Streaming.
  * Watermarks bound state: at scale these aggregations hold one state
  * entry per (window, key) only until `watermark` passes the window end.
  */
object EventStreams {

  /** Tumbling event-time window counts with late-data drop. */
  def tumblingCounts(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"))

  /** Sliding event-time windows. */
  def slidingCounts(events: DataFrame, width: String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"))

  /** Exactly-once-per-id event stream: watermark-bounded streaming
    * deduplication (`dropDuplicates` keeps state per event_id only until
    * the watermark passes — bounded state, the streaming analog of d01's
    * exact dedup; an at-least-once upstream becomes effectively-once). */
  def dedupedEvents(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Session windows per user (gap-based, built-in session_window). */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("cnt"), col("total_value"))

  /** Number of time-contiguous part files the events table is split into
    * for the streaming catalog queries — with `maxFilesPerTrigger=1` each
    * file becomes its own micro-batch, so every run exercises state
    * carried across ≥ SplitFiles triggers (not the single-batch shortcut
    * VERDICT r3 flagged). */
  val SplitFiles = 3

  // split dirs are JVM-scoped (one per source dataset) and removed on
  // exit — lifecycle via the shared graft.io.TempLayouts registry

  /** Split `events.parquet` into [[SplitFiles]] TIME-RANGE part files with
    * strictly ascending modification times. Contiguity + processing order
    * matter for correctness, not just evidence: the file source feeds
    * files oldest-mtime-first, so batch N+1's event times all follow
    * batch N's — a watermark computed from earlier batches never marks a
    * later file's rows late. A round-robin split would make q36's
    * stream-stream join silently DROP pairs whose view fell behind the
    * watermark advanced by a later-timestamped row in an earlier batch —
    * exactly the out-of-order-ingest discipline a production deployment
    * needs from its upstream (per-source ordered offsets in Kafka terms). */
  private def splitEventsDir(ss: SparkSession, dir: String): String =
    graft.io.TempLayouts.cached(
      "events_split#" + new java.io.File(dir).getCanonicalPath,
      "graft_events_split_") { outDir =>
      val out = java.nio.file.Paths.get(outDir)
      val staging = out.resolve("_staging")
      // normalize ts to the engine-wide TIMESTAMP convention BEFORE the
      // split write (one place), so the stream's inferred schema and
      // watermark arithmetic match the batch twins regardless of the
      // source file's physical timestamp encoding
      graft.io.Tables.normalizeEventTs(ss.read.parquet(s"$dir/events.parquet"))
        .repartitionByRange(SplitFiles, col("ts"))
        .write.mode("overwrite").parquet(staging.toString)
      // part-NNNNN names follow range order (partition 0 = earliest ts)
      val parts = staging.toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val base = System.currentTimeMillis()
      parts.zipWithIndex.foreach { case (f, i) =>
        val dst = out.resolve(f"events_$i%04d.parquet").toFile
        java.nio.file.Files.move(f.toPath, dst.toPath)
        dst.setLastModified(base - (parts.length - i) * 60000L): Unit
      }
      graft.io.TempLayouts.delete(staging.toString)
    }

  /** Streaming file source over the split events layout for an isolated
    * session, one file per micro-batch, with the TIMESTAMP(NANOS)
    * convention applied in ONE place (the nanosAsLong batch read yields
    * INT64 → convert exactly; a micros-typed file passes through
    * unchanged — mirrors Tables.normalizeEventTs). Returns a thunk so
    * callers can attach the same source more than once (q31's union,
    * q36's two sides). */
  private def eventStreamSource(ss: SparkSession, dir: String): () => DataFrame =
    streamFromSplitDir(ss, splitEventsDir(ss, dir))

  /** Split-dir schema, inferred once per JVM: the footer-read batch job
    * behind `.read.parquet(srcDir).schema` was re-paid on EVERY source
    * creation (16 streaming entries × bench iterations) for a layout
    * that is immutable once staged (TempLayouts.cached). */
  private val splitSchemas =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  private def streamFromSplitDir(ss: SparkSession, srcDir: String): () => DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val batchSchema = splitSchemas.computeIfAbsent(srcDir,
      d => ss.read.parquet(d).schema)
    val tsType = batchSchema("ts").dataType
    () => {
      val raw = ss.readStream.schema(batchSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      tsType match {
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    }
  }

  /** The [[splitEventsDir]] layout plus a FOURTH, latest-mtime file that
    * replays the EARLIEST time range — deliberately ~10 days late against
    * the watermark the first three batches will have advanced. Input for
    * q67's late-data-drop demonstration. */
  private def splitEventsWithReplayDir(ss: SparkSession, dir: String): String = {
    val srcDir = splitEventsDir(ss, dir) // build (or reuse) the ordered split
    graft.io.TempLayouts.cached(
      "events_split_replay#" + new java.io.File(dir).getCanonicalPath,
      "graft_events_replay_") { outDir =>
      val parts = new java.io.File(srcDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val out = java.nio.file.Paths.get(outDir)
      val base = System.currentTimeMillis()
      parts.zipWithIndex.foreach { case (f, i) =>
        val dst = out.resolve(f.getName).toFile
        java.nio.file.Files.copy(f.toPath, dst.toPath)
        dst.setLastModified(base - (parts.length + 1 - i) * 60000L): Unit
      }
      val late = out.resolve(f"events_${parts.length}%04d_late.parquet").toFile
      java.nio.file.Files.copy(parts.head.toPath, late.toPath)
      late.setLastModified(base): Unit
    }
  }

  /** Progress evidence from the most recent run of each streaming catalog
    * query: micro-batch count (batches that read input), total state rows
    * after each batch, and the state-store provider class — what
    * StreamingSpec asserts to prove state actually survives across
    * triggers. */
  final case class StreamRunStats(
      nBatches: Int, stateRowsPerBatch: Seq[Long], provider: String,
      commitMsTotal: Long,
      inputRowsPerBatch: Seq[Long] = Seq.empty,
      droppedByWatermarkPerBatch: Seq[Long] = Seq.empty,
      triggerMsTotal: Long = 0L,
      nStateOps: Int = 0)

  @volatile private var runStats: Map[String, StreamRunStats] = Map.empty
  def lastRunStats: Map[String, StreamRunStats] = runStats

  /** Run-scoped streaming checkpoint on the fastest local volume (tmpfs
    * when present): the state store's per-batch commit is delta-file
    * write + fsync per partition, and on a disk shared with co-tenants
    * that fixed cost is both slow and NOISY (the round-11 q79 regression
    * was 7.1 s of RocksDB commit under a degraded disk, zero plan
    * change). Checkpoint durability is an object-store concern in a
    * cluster deployment; locally the checkpoint is run-scoped scratch.
    * Keyed per query tag via [[graft.io.TempLayouts.replacing]]: each run
    * gets a FRESH dir (a reused one would make the file source skip
    * already-processed input) and the previous run's dir is deleted at
    * the swap, so a bench loop holds at most one live checkpoint per
    * entry. */
  private def freshCkpt(tag: String): String =
    graft.io.TempLayouts.replacing(s"ckpt#$tag", s"graft_ckpt_${tag}_",
      fast = true)(_ => ())

  /** Public recorder for streaming catalog entries that live OUTSIDE
    * this module (the DSv2 source/sink entries q100/q108 in
    * graft.sources) so StreamCost's exec/setup attribution covers them
    * too. */
  def record(name: String,
      q: org.apache.spark.sql.streaming.StreamingQuery,
      ss: SparkSession): Unit = recordRun(name, q, ss)

  private def recordRun(name: String,
      q: org.apache.spark.sql.streaming.StreamingQuery,
      ss: SparkSession): Unit = {
    val withInput = q.recentProgress.filter(_.numInputRows > 0)
    runStats += name -> StreamRunStats(
      withInput.length,
      withInput.map(_.stateOperators.map(_.numRowsTotal).sum).toSeq,
      ss.conf.get("spark.sql.streaming.stateStore.providerClass", "default-hdfs"),
      withInput.map(_.stateOperators.map(_.commitTimeMs).sum).sum,
      withInput.map(_.numInputRows).toSeq,
      withInput.map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum).toSeq,
      // Engine time across ALL micro-batches (incl. empty finalization
      // triggers): wall-clock minus this is harness/setup cost — split
      // corpus staging, checkpoint dir creation, query-thread startup.
      q.recentProgress
        .map(_.durationMs.getOrDefault("triggerExecution", 0L).longValue).sum,
      q.recentProgress.map(_.stateOperators.length).maxOption.getOrElse(0))
  }

  /** The hourly aggregation (q20's shape) executed as an ACTUAL
    * Structured Streaming job: file source over the events parquet,
    * complete-mode memory sink, `Trigger.AvailableNow` (process the
    * bounded backlog to completion, then stop). Deterministic on bounded
    * input, so it carries the same DuckDB oracle as the batch twin — the
    * driver's correctness gate exercises the streaming engine itself.
    *
    * Scale notes: complete mode + memory sink suit a finite backfill
    * (result = one row per (hour, type)); an unbounded deployment swaps
    * in append mode + watermark (see [[tumblingCounts]]) and a durable
    * sink — the aggregation plan is identical.
    *
    * `statePartitions` sizes the stateful-aggregation state store. The
    * HDFS-backed provider pays a fixed per-partition commit cost (delta
    * file write + fsync) EVERY micro-batch regardless of data volume —
    * profiled here via `lastProgress.durationMs`: at the session default
    * of 32 partitions one 100k-row batch spent 23.5s of task time in
    * state commit vs 71ms at 1 partition. A bounded backfill with ~3.6k
    * groups wants few state partitions; an unbounded deployment sizes
    * this to key cardinality × throughput instead (the partition count
    * is frozen into the checkpoint at first start). */
  def hourlyCountsStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    // Run the stream in an isolated session (shared SparkContext, own
    // SQLConf): the streaming engine clones the session ON THE QUERY
    // THREAD, so setting shuffle.partitions on the caller's session and
    // restoring it after start() would race with that clone — and would
    // also leak a conf change into a concurrent caller.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val agg = eventStreamSource(ss, dir)()
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    val q = agg.writeStream
      .format("memory").queryName("q27_sink")
      .option("checkpointLocation", freshCkpt("q27"))
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q27_events_hourly_stream", q, ss)
    ss.table("q27_sink").orderBy(col("hour_start"), col("event_type"))
  }

  /** Streaming deduplication under the oracle: the events file is read
    * as TWO streams unioned (every event planted twice — an
    * at-least-once upstream), `dropDuplicates` keeps state per event_id,
    * and a per-type count aggregates the deduped stream — TWO chained
    * stateful operators (dedup state feeding aggregation state) running
    * as a real streaming job. Deterministic on bounded input, so it
    * carries the exact batch oracle `count(DISTINCT event_id)`.
    * Session/state sizing as in [[hourlyCountsStreaming]].
    *
    * This job runs on the RocksDB state-store provider by default — the
    * production choice once per-partition state outgrows the executor
    * heap (the HDFS-backed provider keeps the full map in JVM memory and
    * re-writes a delta file per partition per batch; RocksDB keeps state
    * off-heap with incremental changelog/snapshot upload). The dedup
    * state here (every event_id) is exactly the kind that grows without
    * bound relative to the aggregation states of q27/q36.
    *
    * Measured (sf0.01, 100k planted-duplicate rows, 8 state partitions,
    * 3 micro-batches — companion to the HDFS per-partition commit-cost
    * profile at [[hourlyCountsStreaming]]): state-commit task time is a
    * wash at this state size (HDFS ≈19.0s vs RocksDB ≈19.8s total), and
    * RocksDB adds a ~10s per-JVM first-use cost (JNI library load +
    * instance setup). The crossover argument is memory, not latency:
    * HDFS-backed state lives on the executor heap and fails with OOM as
    * keys grow, RocksDB spills to local disk and ships changelogs. */
  def dedupCountsStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8, rocksdb: Boolean = true): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    if (rocksdb) useRocksDb(ss)
    val src = eventStreamSource(ss, dir)
    val agg = src().unionByName(src())
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream
      .format("memory").queryName("q31_sink")
      .option("checkpointLocation", freshCkpt("q31"))
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q31_events_dedup_stream", q, ss)
    ss.table("q31_sink").orderBy(col("event_type"))
  }

  /** Streaming dedup of JITTERED duplicates — `dropDuplicatesWithinWatermark`
    * (Spark 3.5+), the API that exists because real at-least-once upstreams
    * re-emit records with DIFFERENT event times (a retry re-stamps the
    * envelope): the duplicate stream here is the events source shifted
    * +2 seconds, so every event arrives twice with two distinct `ts`
    * values. Plain `dropDuplicates("event_id")` (q31) would also collapse
    * them but can NEVER evict its state (the event-time column is not in
    * the dedup key, so no watermark bound applies — unbounded state
    * growth); `dropDuplicatesWithinWatermark` keys on event_id alone yet
    * evicts each key once the watermark passes its first-seen event time
    * plus the delay. The guarantee narrows to "duplicates land within the
    * watermark delay of each other" (2 s ≪ 30 min here) and state becomes
    * watermark-bounded — which is the 100 TB difference: dedup state
    * proportional to the watermark window, not to stream history.
    *
    * Downstream: per-type count + value sum over the deduped stream (two
    * chained stateful operators, q31's shape). Counts and sums are
    * independent of WHICH twin survives (twins differ only in ts), so
    * the entry is deterministic and carries the exact batch oracle. */
  def dedupWithinWatermarkStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    useRocksDb(ss)
    val src = eventStreamSource(ss, dir)
    val jittered = src().withColumn("ts",
      col("ts") + expr("INTERVAL 2 SECONDS"))
    val agg = src().unionByName(jittered)
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1e6).cast("long")).as("value_micros"))
    val q = agg.writeStream
      .format("memory").queryName("q79_sink")
      .option("checkpointLocation", freshCkpt("q79"))
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q79_stream_dedup_within_wm", q, ss)
    ss.table("q79_sink").orderBy(col("event_type"))
  }

  /** Queryable state: after a checkpointed streaming aggregation
    * terminates, the checkpoint's state store is itself a TABLE —
    * Spark's `statestore` batch source reads (key, value, partition_id)
    * straight from the operator's state files. This is the ops-facing
    * surface for "what does the stream currently believe": debugging a
    * hot key, auditing state size, or backfilling a serving store
    * without replaying the stream. Runs a per-type streaming count with
    * an EXPLICIT checkpoint location, then reads the aggregation
    * operator's state back as a batch frame — for a complete-mode
    * count the state IS the final result, so the entry carries the
    * exact batch oracle (the reader path, not the memory sink, produces
    * the rows the driver hashes).
    *
    * Scale: the state source reads state files directly,
    * partition-parallel, no stream replay — N keys cost O(N) to read
    * regardless of how many events built them. */
  def stateStoreRead(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // freshCkpt (not createTempDirectory): fastest local volume, and the
    // previous run's dir — still referenced by that run's lazy statestore
    // read, long since consumed — is reclaimed at the swap
    val ckpt = freshCkpt("q71")
    val agg = eventStreamSource(ss, dir)()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream
      .format("memory").queryName("q71_sink")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q71_state_store_read", q, ss)
    // the batch read of the checkpoint's aggregation state: key = the
    // grouping columns, value = the aggregation buffer
    ss.read.format("statestore").load(ckpt)
      .select(col("key.event_type").as("event_type"),
        col("value.count").as("cnt"))
      .orderBy(col("event_type"))
  }

  /** Stream-stream interval join under the oracle: each view joined to
    * the purchases that follow it within one hour, per user — the
    * canonical watermarked two-stream join. Both sides carry event-time
    * watermarks AND the join condition bounds p_ts to [v_ts, v_ts+1h],
    * which is what lets the join state evict rows once the watermark
    * passes the interval — an unconstrained stream-stream join would
    * buffer both streams forever. Inner join in append mode emits each
    * pair as soon as both sides have arrived; deterministic on bounded
    * input → exact batch self-join oracle. Session/state sizing as in
    * [[hourlyCountsStreaming]]. */
  def intervalJoinStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 4): DataFrame = {
    val ss = joinSession(spark, statePartitions)
    val src = eventStreamSource(ss, dir)
    val views = src().where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("v_ts"), col("p_ts"))
    val q = joined.writeStream
      .format("memory").queryName("q36_sink")
      .option("checkpointLocation", freshCkpt("q36"))
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q36_stream_interval_join", q, ss)
    ss.table("q36_sink").orderBy(col("user_id"), col("v_ts"), col("p_ts"))
  }

  /** LEFT OUTER stream-stream interval join — q36's inner join plus the
    * semantics that make outer joins hard in streaming: a view with no
    * purchase in its hour can only emit its null-extended row once the
    * engine can PROVE no match will arrive, i.e. once the global
    * event-time watermark (min across both inputs of max-event-time −
    * delay) passes the view's match window [v_ts, v_ts + 1h]. Matched
    * pairs emit as they meet, exactly as in the inner join; unmatched
    * views in the final watermark horizon are withheld FOREVER on
    * bounded input — the same still-might-match contract as q54's tail
    * windows, encoded in the oracle's horizon predicate. AvailableNow
    * runs the no-data finalization batch so every provably-unmatched
    * view flushes before the query stops.
    *
    * At 100 TB the interval bound + watermark are what keep BOTH state
    * stores finite (evict once the window passes) — an unconstrained
    * outer join would buffer the full history of both streams AND never
    * be able to emit a single null row. */
  def leftOuterIntervalJoinStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 4): DataFrame = {
    val ss = joinSession(spark, statePartitions)
    val src = eventStreamSource(ss, dir)
    val views = src().where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("user_id"), col("v_ts"), col("p_ts"))
    val q = joined.writeStream
      .format("memory").queryName("q69_sink")
      .option("checkpointLocation", freshCkpt("q69"))
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q69_stream_outer_join", q, ss)
    ss.table("q69_sink").orderBy(col("user_id"), col("v_ts"), col("p_ts"))
  }

  /** LEFT SEMI stream-stream interval join — the EXISTS of streams,
    * completing the join-type matrix (inner q36, left outer q69): each
    * view row emits AT MOST ONCE, as soon as some purchase lands in its
    * [v_ts, v_ts + 1h] window; the join carries no purchase columns, so
    * the engine marks the left row matched in state and never re-emits
    * it for later matches (where the inner join emits one row PER
    * match). Unmatched views never emit and their state evicts once the
    * watermark passes the window — on bounded input the output is
    * therefore exactly the views with ≥1 in-window purchase, with input
    * multiplicity preserved (two identical view rows both emit), and
    * NO horizon predicate is needed in the oracle: matched rows emit
    * eagerly, only the never-emitted unmatched rows depend on the
    * watermark. At 100 TB semi is strictly cheaper than inner + distinct
    * downstream: state drops a left row at FIRST match instead of
    * buffering it for the full window, and the output is one row per
    * view instead of one per (view, purchase) pair. */
  def leftSemiIntervalJoinStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 4): DataFrame = {
    val ss = joinSession(spark, statePartitions)
    val src = eventStreamSource(ss, dir)
    val views = src().where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = views.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
      "left_semi")
    val q = joined.writeStream
      .format("memory").queryName("q90_sink")
      .option("checkpointLocation", freshCkpt("q90"))
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q90_stream_semi_join", q, ss)
    ss.table("q90_sink").orderBy(col("user_id"), col("v_ts"))
  }

  /** Streaming keyed UPSERT through `foreachBatch` — the sink-side
    * pattern the memory-sink demos don't cover: each micro-batch merges
    * its latest-row-per-user into a keyed parquet table (read previous
    * version ∪ batch → argmax per key → write next version), so batch N
    * genuinely consumes batch N−1's output. That read-merge-write is the
    * idempotent upsert a warehouse without MERGE support runs; versioned
    * directories stand in for a transactional table format's snapshot
    * (equivalent plan, atomic swap instead of file overwrite).
    * Determinism: the per-key argmax orders by (ts, event_id) — a total
    * order — so the final table equals the batch argmax regardless of
    * how rows split across micro-batches; `maxFilesPerTrigger=1` forces
    * ≥3 real merges. The per-batch merge reads only the compacted
    * key table (≤ |users| rows), not the history — at scale this is the
    * constant-size-state upsert loop, with the argmax aggregated
    * map-side before the shuffle. */
  def latestRowUpsertStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val base = graft.io.TempLayouts.scratch("graft_upsert_")
    val ckpt = graft.io.TempLayouts.scratch("graft_upsert_ckpt_", fast = true)
    try {
      runUpsertStreaming(spark, dir, base, ckpt, statePartitions)
      upsertResult(spark, base, dir).localCheckpoint(true)
    } finally {
      graft.io.TempLayouts.discard(base)
      graft.io.TempLayouts.discard(ckpt)
    }
  }

  private def latestPerUser(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value")))
        .as("last"))

  /** One streaming run of the upsert job against `base` (a
    * [[graft.io.CommitLog]] table) and `ckpt` (streaming checkpoint).
    * RESTART-SAFE BY CONSTRUCTION: the merge input for batch N is the
    * newest COMMITTED version with id < N, discovered from the commit
    * log on DISK — never in-JVM state (the round-4 shape held `current`
    * in a `@volatile var`, which a restarted JVM would lose, silently
    * dropping all pre-crash state). A batch replayed after a failure
    * between sink commit and checkpoint commit therefore re-derives the
    * same predecessor and re-commits its own version id with identical
    * content — the foreachBatch idempotence contract, which is exactly
    * CommitLog's idempotent-replay contract. `failAtBatch` injects a
    * crash before that batch id's sink write (the recovery spec's
    * lever); the StreamingQueryException it causes propagates to the
    * caller. */
  def runUpsertStreaming(spark: SparkSession, dir: String, base: String,
      ckpt: String, statePartitions: Int = 8,
      failAtBatch: Option[Long] = None): Unit = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val q = eventStreamSource(ss, dir)()
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (failAtBatch.contains(id))
          throw new RuntimeException(s"injected failure before batch $id commit")
        val merged = graft.io.CommitLog.committedBefore(base, id) match {
          case Some(prev) =>
            latestPerUser(
              graft.io.CommitLog.snapshot(batch.sparkSession, base, prev)
              .select(col("user_id"), col("last.ts").as("ts"),
                col("last.event_id").as("event_id"),
                col("last.event_type").as("event_type"), col("last.value").as("value"))
              .unionByName(batch))
          case None => latestPerUser(batch)
        }
        graft.io.CommitLog.commit(base, id) { p =>
          merged.write.mode("overwrite").parquet(p)
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally recordRun("q44_stream_upsert_latest", q, ss)
  }

  /** The upsert table as of the newest committed version (empty-input
    * fallback keeps the catalog schema). */
  def upsertResult(spark: SparkSession, base: String, dir: String): DataFrame = {
    val result = graft.io.CommitLog.snapshotLatest(spark, base).getOrElse(
      latestPerUser(spark.read.parquet(dir + "/events.parquet").limit(0)))
    result.select(col("user_id"),
        col("last.ts").as("last_ts"), col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"), col("last.value").as("last_value"))
      .orderBy(col("user_id"))
  }

  /** Stream-static broadcast enrichment under the oracle: the events
    * stream joined per micro-batch to the (static) customer dimension on
    * user_id, then aggregated per (segment, type). The static side is
    * STATELESS for the streaming engine — no join state, no watermark;
    * Catalyst plans it as a broadcast hash join re-executed against each
    * micro-batch, which is exactly the production shape for enriching an
    * event stream with a slowly-changing dimension (swap the parquet for
    * a Delta/JDBC snapshot; the plan is unchanged). Only the downstream
    * aggregation keeps state (one row per segment×type).
    *
    * The measure is `sum` of VALUE in integer micro-units
    * (floor(value·1e6) per row BEFORE the sum — the t12 quantization
    * convention): double addition is order-sensitive across micro-batch
    * boundaries, integer addition is not, which is what lets a streaming
    * sum carry a batch hash oracle at all. */
  def enrichedSegmentCountsStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 4): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    // un-hinted stream-static join: customer is SF-proportional, so a
    // forced broadcast() would pin driver materialization of an
    // unbounded dim at corpus scale. The static planner's size estimate
    // picks broadcast-hash at any plausible test SF on its own (AQE is
    // off for stateful streams, but autoBroadcastJoinThreshold applies
    // to the per-batch static plan); past the threshold the same join
    // degrades to a per-batch shuffle with no semantic change.
    val dim = ss.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = eventStreamSource(ss, dir)()
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1e6).cast("long")).as("value_micros"))
    val q = agg.writeStream
      .format("memory").queryName("q45_sink")
      .option("checkpointLocation", freshCkpt("q45"))
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q45_stream_static_enrich", q, ss)
    ss.table("q45_sink").orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** Gap-based sessionization as a REAL streaming job via the built-in
    * `session_window` aggregation — the state operator that MERGES
    * windows: each event opens a candidate session [ts, ts+gap) and the
    * store coalesces overlapping candidates per user, including sessions
    * that STRADDLE micro-batch boundaries (the time-range file split
    * guarantees some do: a user's evening session continues in the next
    * file). Complete mode needs no watermark on bounded input; an
    * unbounded deployment adds `withWatermark` + append mode and the
    * session state evicts once the watermark passes a session's end.
    *
    * Boundary semantics pinned by StreamingSpec: an event at EXACTLY
    * last_ts + gap DOES merge — Spark treats the candidate [b, b+gap)
    * as overlapping [a, a+gap=b) inclusively — so the oracle's break
    * condition is `> gap`, the same convention batch q29 uses. Value
    * sums are integer micro-units (floor BEFORE sum) per the q45/t12
    * rule. */
  def sessionWindowStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val agg = eventStreamSource(ss, dir)()
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 1e6).cast("long")).as("value_micros"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("value_micros"))
    val q = agg.writeStream
      .format("memory").queryName("q50_sink")
      .option("checkpointLocation", freshCkpt("q50"))
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q50_stream_sessionize", q, ss)
    ss.table("q50_sink").orderBy(col("user_id"), col("session_start"))
  }

  /** Watermarked APPEND-mode aggregation under the oracle — the output
    * mode every unbounded production aggregation runs (complete mode
    * re-emits the whole result per trigger; append emits each window
    * ONCE, when the watermark passes its end, and then frees its
    * state). On bounded input the emitted set is exactly the windows
    * whose end ≤ final watermark (= global max event time − delay): the
    * tail windows still inside the watermark horizon when the backlog
    * drains are NEVER emitted — not an artifact but the actual contract
    * (they might still receive data); the oracle encodes the same
    * predicate in SQL. AvailableNow runs the no-data finalization batch
    * (`noDataMicroBatches`) so every eligible window flushes before the
    * query stops. State sizing per [[hourlyCountsStreaming]]; value
    * sums in integer micro-units per the q45/t12 rule. */
  def hourlyAppendStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val agg = eventStreamSource(ss, dir)()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1e6).cast("long")).as("value_micros"))
      .select(col("window.start").as("hour_start"),
        col("event_type"), col("cnt"), col("value_micros"))
    val q = agg.writeStream
      .format("memory").queryName("q54_sink")
      .option("checkpointLocation", freshCkpt("q54"))
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q54_stream_append_hourly", q, ss)
    ss.table("q54_sink").orderBy(col("hour_start"), col("event_type"))
  }

  /** Chained windowed aggregations — Spark's multiple-stateful-operator
    * surface (SPARK-40925): a 5-minute per-type pre-aggregation feeds an
    * hourly rollup INSIDE the same streaming query, the watermark
    * propagating through the first window's event-time column
    * (`window(col("window"), "1 hour")` re-windows the emitted window
    * struct). This is the streaming shape of the classic rollup cascade.
    *
    * Correctness invariant that makes chained append windows sound:
    * both operators close on the SAME watermark — a 5-minute bucket
    * forwards once wm ≥ its end, and an hour emits once wm ≥ hour end,
    * by which point every inner bucket (end ≤ hour end) has already
    * been forwarded. Final output = hours with end ≤ final watermark,
    * exactly the batch oracle's HAVING predicate; `n_buckets` (distinct
    * non-empty 5-minute buckets per hour, replayed by the oracle via
    * integer epoch division) is the direct evidence the rollup consumed
    * pre-aggregated buckets rather than raw rows.
    *
    * Scale: only the FIRST operator's state is keyed by fine windows;
    * the hourly operator sees ≤12 pre-combined rows per (hour, type) —
    * the map-side-combine argument applied across OPERATORS. At
    * 100 TB/day the fine pre-aggregation absorbs the event volume and
    * the coarse rollup's state shuffle carries pre-reduced rows only. */
  def windowRollupStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val five = eventStreamSource(ss, dir)()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt5"),
        sum(floor(col("value") * 1e6).cast("long")).as("vm5"))
    val hourly = five
      .groupBy(window(col("window"), "1 hour"), col("event_type"))
      .agg(sum(col("cnt5")).as("cnt"),
        sum(col("vm5")).as("value_micros"),
        count(lit(1)).as("n_buckets"))
      .select(col("window.start").as("hour_start"),
        col("event_type"), col("cnt"), col("value_micros"), col("n_buckets"))
    val q = hourly.writeStream
      .format("memory").queryName("q75_sink")
      .option("checkpointLocation", freshCkpt("q75"))
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q75_stream_window_rollup", q, ss)
    ss.table("q75_sink").orderBy(col("hour_start"), col("event_type"))
  }

  /** The late-data contract under the oracle: the earliest time-range
    * file is REPLAYED as a fourth micro-batch after three in-order
    * batches have advanced the watermark ~20 days past its windows, and
    * the watermarked append aggregation must DROP every replayed row —
    * those windows were emitted and their state freed batches ago. The
    * final table is therefore identical to the no-replay run, which is
    * exactly what the DuckDB oracle encodes (counts over the ORIGINAL
    * events, windows whose end ≤ max event time); if the engine failed
    * to drop, every early window would double and the oracle would
    * catch it. The drop is also evidenced directly:
    * numRowsDroppedByWatermark over the run equals the replayed row
    * count (StreamingSpec). Delay 0 keeps every original row on time
    * (files arrive in ascending time ranges) while making the replay
    * maximally late.
    *
    * At 100 TB this is the guarantee that makes streaming state
    * BOUNDED: reprocessed or duplicated upstream data cannot resurrect
    * evicted windows, so state size tracks the watermark horizon, not
    * the backlog or the reprocessing history. */
  def lateDataStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    val src = streamFromSplitDir(ss, splitEventsWithReplayDir(ss, dir))
    val agg = src()
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 1e6).cast("long")).as("value_micros"))
      .select(col("window.start").as("hour_start"),
        col("event_type"), col("cnt"), col("value_micros"))
    val q = agg.writeStream
      .format("memory").queryName("q67_sink")
      .option("checkpointLocation", freshCkpt("q67"))
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q67_stream_late_data", q, ss)
    ss.table("q67_sink").orderBy(col("hour_start"), col("event_type"))
  }

  /** Per-user running-totals state for [[RunningTotalsProcessor]]. */
  final case class RunningTotals(n: Long, valueMicros: Long, lastTsMicros: Long)

  /** q72's emitted row: the key's cumulative totals as of this batch. */
  final case class UserTotals(user_id: Long, n_events: Long,
      value_micros: Long, last_ts_micros: Long)

  /** Arbitrary per-key state via Spark 4's `transformWithState`
    * StatefulProcessor API — the successor surface to
    * map/flatMapGroupsWithState (composable named state variables,
    * timers, TTL, initial state) and the third custom-state surface in
    * this catalog next to [[sessionize]] and the built-in stateful ops.
    * One ValueState cell per user accumulates (count, Σvalue_micros,
    * max ts); every batch in which a key sees input emits that key's
    * cumulative row — the update-mode contract. Counts are strictly
    * increasing across a key's emitted rows, so the LAST row per key
    * (max n_events) is the final total — which is exactly the batch
    * aggregate, giving the entries their full oracles.
    *
    * ONE processor serves both q72 (no initial state — a
    * `StatefulProcessorWithInitialState` IS a `StatefulProcessor`, and
    * `handleInitialState` is simply never called) and q74 (warm-started
    * from the batch aggregate), so the accumulate fold cannot drift
    * between the two entries.
    *
    * Input rows are pre-projected to (user_id, ts_micros, value_micros)
    * BEFORE groupByKey — the state shuffle carries 24 bytes/row, and the
    * integer micro-unit discipline keeps the running sum exact. */
  final class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, Long, Long), UserTotals, RunningTotals] {
    @transient private var state: ValueState[RunningTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningTotals]("totals",
        org.apache.spark.sql.Encoders.product[RunningTotals], TTLConfig.NONE)

    override def handleInitialState(key: Long, initial: RunningTotals,
        timerValues: TimerValues): Unit =
      state.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long, Long)],
        timerValues: TimerValues): Iterator[UserTotals] = {
      val prev =
        if (state.exists()) state.get() else RunningTotals(0L, 0L, Long.MinValue)
      var n = prev.n; var v = prev.valueMicros; var last = prev.lastTsMicros
      rows.foreach { case (_, tsMicros, valueMicros) =>
        n += 1; v += valueMicros
        if (tsMicros > last) last = tsMicros
      }
      state.update(RunningTotals(n, v, last))
      Iterator.single(UserTotals(key, n, v, last))
    }
  }

  /** Configure a session's state store as RocksDB WITH CHANGELOG
    * checkpointing (round-14 optimization, guide §1/§5): without it,
    * every commit of every partition ZIPS A FULL RocksDB snapshot into
    * the checkpoint — O(state) per partition per micro-batch.
    * StreamCost attributed 8–38 s of summed per-partition commit to the
    * RocksDB entries (q72: 38 s for 1,500 state rows). With changelog
    * checkpointing the per-commit upload is just that batch's delta
    * (O(changes)), and full snapshots move to the background
    * maintenance thread — the production configuration for
    * high-frequency triggers, and at 100 TB the difference between
    * commit cost scaling with STATE SIZE vs with BATCH SIZE. State
    * CONTENT and query results are identical; only the checkpoint file
    * format changes (checkpoints here are run-scoped scratch). */
  private def useRocksDb(ss: SparkSession): Unit = {
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
  }

  /** Stream-stream join sessions. Round-14 measured-and-REJECTED
    * experiment: join state format v3 (one RocksDB store with virtual
    * column families instead of v2's four HDFS-backed stores per
    * partition) benched 1.2–1.6× SLOWER here — q36 4.9→5.9 s,
    * q69 3.5→5.5 s, q90 3.8→4.9 s (min-of-warm, back-to-back A/B) —
    * because at this state size (≤ tens of KB per store) the
    * HDFS-backed provider is a plain in-heap map with a tmpfs delta
    * write, while each RocksDB instance pays JNI open/load/commit
    * machinery per partition per batch regardless of size. v3 remains
    * the right call once per-partition join state outgrows the heap;
    * the providers' crossover is state size, not store count. */
  private def joinSession(spark: SparkSession, statePartitions: Int): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    ss
  }

  /** Isolated session for the transformWithState entries: own shuffle
    * width for the state store, RocksDB provider (the only one the
    * operator supports). */
  private def twsSession(spark: SparkSession, statePartitions: Int): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    useRocksDb(ss)
    ss
  }

  /** Final totals from an update-mode totals sink: one row per
    * (key, batch-with-input) accumulated there; the final row per key is
    * the one with the largest n_events (strictly increasing across a
    * key's emitted rows). */
  private def latestTotals(ss: SparkSession, sink: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    ss.table(sink)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("n_events"), col("value_micros"),
        timestamp_micros(col("last_ts_micros")).as("last_ts"))
      .orderBy(col("user_id"))
  }

  /** q72: per-user running totals through `transformWithState` (TimeMode
    * None, update mode), ≥3 micro-batches via the split file source, then
    * the final row per key selected from the update stream. At 100 TB the
    * state is one 24-byte cell per user and each micro-batch shuffles
    * only its own rows — the unbounded-key analog of q44's foreachBatch
    * upsert, with the merge logic inside the state store instead of a
    * sink rewrite. */
  def transformWithStateTotals(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val ss = twsSession(spark, statePartitions)
    import ss.implicits._
    val typed = eventStreamSource(ss, dir)()
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")),
        floor(col("value") * lit(1000000)).cast("long"))
      .as[(Long, Long, Long)]
    val out = typed.groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
    val q = out.toDF().writeStream
      .format("memory").queryName("q72_sink")
      .option("checkpointLocation", freshCkpt("q72"))
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q72_stream_transform_with_state", q, ss)
    latestTotals(ss, "q72_sink")
  }

  /** The warm-start handoff boundary for q74: history strictly before
    * this instant is served from the BATCH aggregate; the stream
    * processes only rows at-or-after it. Day 11 of the 30-day corpus —
    * inside the first split file's range, so the stream's first
    * micro-batch really does drop already-aggregated history. */
  private val WarmStartBoundary = "2024-01-11 00:00:00"

  /** q74: totals warm-started from a batch aggregate — the
    * batch→streaming handoff pattern. A deployment with months of
    * history in the warehouse does not replay it through the stream: the
    * history aggregates ONCE as a batch frame and is handed to
    * `transformWithState` as initial state ([[RunningTotalsProcessor]]'s
    * `handleInitialState` runs once per key before the first batch); the
    * stream processes only the live tail. Output rows exist for every
    * user with ≥1 LIVE (post-boundary) event, and their totals include
    * the pre-boundary history the stream never read; users whose events
    * all precede the boundary stay in state but never emit (no input ⇒
    * no row — the update-mode contract). */
  def warmStartTotalsStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val ss = twsSession(spark, statePartitions)
    import ss.implicits._
    val boundary = lit(WarmStartBoundary).cast("timestamp")
    // the warehouse side of the handoff: history aggregated ONCE
    val initState = graft.io.Tables(ss, dir).events
      .where(col("ts") < boundary)
      .groupBy(col("user_id").cast("long").as("u"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * lit(1000000)).cast("long")).as("v"),
        max(unix_micros(col("ts"))).as("last"))
      .as[(Long, Long, Long, Long)]
      .map { case (u, n, v, last) => (u, RunningTotals(n, v, last)) }
      .groupByKey(_._1).mapValues(_._2)
    val typed = eventStreamSource(ss, dir)()
      .where(col("ts") >= boundary)
      .select(col("user_id").cast("long"),
        unix_micros(col("ts")),
        floor(col("value") * lit(1000000)).cast("long"))
      .as[(Long, Long, Long)]
    val out = typed.groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update(), initState)
    val q = out.toDF().writeStream
      .format("memory").queryName("q74_sink")
      .option("checkpointLocation", freshCkpt("q74"))
      .outputMode(OutputMode.Update())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q74_stream_warm_start", q, ss)
    latestTotals(ss, "q74_sink")
  }

  /** Open-session state for [[SessionCloseProcessor]]: running totals
    * plus the registered close-timer (ms) so re-registration can delete
    * the stale timer precisely. */
  final case class OpenSession(n: Long, valueMicros: Long,
      startMicros: Long, lastMicros: Long, timerMs: Long)

  /** q73's emitted row: a session closed either by an intra-batch gap or
    * by an event-time timer firing after the watermark passed its gap. */
  final case class ClosedSession(user_id: Long, start_micros: Long,
      last_micros: Long, n_events: Long, value_micros: Long)

  /** Event-time TIMERS through transformWithState — the StatefulProcessor
    * feature q72 doesn't touch: per-user sessions (gap `gapMs`) that are
    * closed and EMITTED by `handleExpiredTimer` once the watermark passes
    * last-event + gap, not by waiting for the user's next event. This is
    * how a production pipeline emits a user's FINAL session (there is no
    * next event to trigger it — q50's built-in session_window does the
    * same internally; here the mechanism is explicit and composable).
    *
    * Intra-batch gap splits emit immediately: with the time-range-ordered
    * split source (see [[splitEventsDir]]), any event that could extend a
    * session sorts into the same or a later batch, and a later batch's
    * minimum event time is ≥ the current watermark — so a gap observed
    * within a batch can never be refuted by later input. The timer path
    * covers cross-batch closes: on every batch the key re-registers its
    * close timer at floor(last_micros/1000) + gapMs (timers are epoch
    * ms), deleting the stale one.
    *
    * State: one OpenSession cell + one timer per user with an open
    * session — O(active users), watermark-bounded exactly like the
    * built-in session window's state. */
  final class SessionCloseProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Long), ClosedSession] {
    @transient private var state: ValueState[OpenSession] = _
    private val gapMicros = gapMs * 1000L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)

    private def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp, Long)],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.map { case (_, t, v) => (micros(t), v) }.toVector.sorted
      var cur: Option[OpenSession] =
        if (state.exists()) Some(state.get()) else None
      val closed = Vector.newBuilder[ClosedSession]
      sorted.foreach { case (tsMicros, vMicros) =>
        cur match {
          case Some(s) if tsMicros - s.lastMicros <= gapMicros =>
            cur = Some(s.copy(n = s.n + 1, valueMicros = s.valueMicros + vMicros,
              lastMicros = math.max(s.lastMicros, tsMicros)))
          case Some(s) =>
            closed += ClosedSession(key, s.startMicros, s.lastMicros,
              s.n, s.valueMicros)
            // carry the superseded session's timer so the end-of-batch
            // re-registration path deletes it (one timer per active key)
            cur = Some(OpenSession(1L, vMicros, tsMicros, tsMicros, s.timerMs))
          case None =>
            cur = Some(OpenSession(1L, vMicros, tsMicros, tsMicros, 0L))
        }
      }
      cur.foreach { s =>
        if (s.timerMs > 0L) getHandle.deleteTimer(s.timerMs)
        val closeAt = s.lastMicros / 1000L + gapMs
        getHandle.registerTimer(closeAt)
        state.update(s.copy(timerMs = closeAt))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (state.exists()) {
        val s = state.get()
        // a stale timer (re-registered since) must not close the newer
        // session the key has moved on to
        if (s.timerMs == expiredTimerInfo.getExpiryTimeInMs()) {
          state.clear()
          Iterator.single(
            ClosedSession(key, s.startMicros, s.lastMicros, s.n, s.valueMicros))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** q73: timer-closed sessions — see [[SessionCloseProcessor]]. Gap
    * 30 min, watermark delay 0 (files arrive in ascending time ranges, so
    * every original row is on time — the q67 discipline). On bounded
    * input the emitted set is exactly the maximal sessions whose
    * close-timer the final watermark reached — timers fire INCLUSIVELY
    * (expiry ≤ watermark), so the horizon is
    * floor(last_us/1000) + gap_ms ≤ floor(max_ts_us/1000); sessions
    * still inside it stay open forever — the q54/q69 still-might-extend
    * contract, encoded in the oracle's horizon predicate. */
  def timerClosedSessionsStreaming(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val ss = twsSession(spark, statePartitions)
    import ss.implicits._
    val typed = eventStreamSource(ss, dir)()
      .withWatermark("ts", "0 seconds")
      .select(col("user_id").cast("long"), col("ts"),
        floor(col("value") * lit(1000000)).cast("long"))
      .as[(Long, java.sql.Timestamp, Long)]
    val out = typed.groupByKey(_._1)
      .transformWithState(new SessionCloseProcessor(gapMs = 1800000L),
        TimeMode.EventTime(), OutputMode.Append())
    val q = out.toDF().writeStream
      .format("memory").queryName("q73_sink")
      .option("checkpointLocation", freshCkpt("q73"))
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    recordRun("q73_stream_timer_sessions", q, ss)
    ss.table("q73_sink")
      .select(col("user_id"),
        timestamp_micros(col("start_micros")).as("session_start"),
        timestamp_micros(col("last_micros")).as("session_last"),
        col("n_events"), col("value_micros"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Driver-visible streaming artifacts: q27 carries batch q20's oracle,
    * q31 carries the batch count-distinct oracle over planted dups, and
    * q36 carries the batch self-join oracle for the interval join. */
  val catalog: Seq[graft.queries.GraftQuery] = Seq(
    graft.queries.GraftQuery(
      "q27_events_hourly_stream",
      "q20's hourly aggregation via readStream -> AvailableNow -> memory sink",
      (spark, dir) => hourlyCountsStreaming(spark, dir),
      Some(
        """SELECT date_trunc('hour', ts) AS hour_start, event_type,
          |       count(*) AS cnt, min(value) AS min_value, max(value) AS max_value
          |FROM events
          |GROUP BY 1, 2
          |ORDER BY hour_start, event_type""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q31_events_dedup_stream",
      "streaming dropDuplicates over doubled events feeding a per-type count (two chained stateful ops, RocksDB state store)",
      (spark, dir) => dedupCountsStreaming(spark, dir),
      Some(
        """SELECT event_type, count(DISTINCT event_id) AS cnt
          |FROM events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q79_stream_dedup_within_wm",
      "streaming dropDuplicatesWithinWatermark over time-jittered duplicates (watermark-bounded dedup state) feeding a per-type rollup",
      (spark, dir) => dedupWithinWatermarkStreaming(spark, dir),
      Some(
        """SELECT event_type,
          |       count(*) AS cnt,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros
          |FROM events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q71_state_store_read",
      "queryable state: batch-read the aggregation state store from a finished stream's checkpoint (statestore source)",
      (spark, dir) => stateStoreRead(spark, dir),
      Some(
        """SELECT event_type, count(*) AS cnt
          |FROM events
          |GROUP BY event_type
          |ORDER BY event_type""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q36_stream_interval_join",
      "watermarked stream-stream interval join: purchases within 1h of each view",
      (spark, dir) => intervalJoinStreaming(spark, dir),
      Some(
        """SELECT v.user_id AS user_id, v.ts AS v_ts, p.ts AS p_ts
          |FROM events v JOIN events p
          |  ON v.user_id = p.user_id
          | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
          |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
          |ORDER BY v.user_id, v_ts, p_ts""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q69_stream_outer_join",
      "LEFT OUTER watermarked stream-stream interval join: null rows emitted only once the watermark proves no match",
      (spark, dir) => leftOuterIntervalJoinStreaming(spark, dir),
      Some(
        """WITH v AS (
          |  SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'),
          |p AS (
          |  SELECT user_id AS p_user, ts AS p_ts FROM events
          |  WHERE event_type = 'purchase'),
          |wm AS (
          |  SELECT least((SELECT max(v_ts) FROM v), (SELECT max(p_ts) FROM p))
          |         - INTERVAL 1 HOUR AS w),
          |matched AS (
          |  SELECT v.user_id, v.v_ts, p.p_ts
          |  FROM v JOIN p ON v.user_id = p.p_user
          |   AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR),
          |unmatched AS (
          |  SELECT v.user_id, v.v_ts, CAST(NULL AS TIMESTAMP) AS p_ts
          |  FROM v, wm
          |  WHERE v.v_ts + INTERVAL 1 HOUR < wm.w
          |    AND NOT EXISTS (
          |      SELECT 1 FROM p
          |      WHERE p.p_user = v.user_id
          |        AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR))
          |SELECT * FROM matched
          |UNION ALL SELECT * FROM unmatched
          |ORDER BY user_id, v_ts, p_ts""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q90_stream_semi_join",
      "LEFT SEMI watermarked stream-stream interval join: each matched view emits exactly once",
      (spark, dir) => leftSemiIntervalJoinStreaming(spark, dir),
      Some(
        """SELECT v.user_id, v.ts AS v_ts
          |FROM events v
          |WHERE v.event_type = 'view'
          |  AND EXISTS (
          |    SELECT 1 FROM events p
          |    WHERE p.event_type = 'purchase'
          |      AND p.user_id = v.user_id
          |      AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR)
          |ORDER BY user_id, v_ts""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q44_stream_upsert_latest",
      "foreachBatch keyed upsert: latest event per user merged across >=3 micro-batches",
      (spark, dir) => latestRowUpsertStreaming(spark, dir),
      Some(
        """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
          |       event_type AS last_type, value AS last_value
          |FROM events
          |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
          |ORDER BY user_id""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q45_stream_static_enrich",
      "stream-static broadcast enrichment: events joined to the customer dim per micro-batch",
      (spark, dir) => enrichedSegmentCountsStreaming(spark, dir),
      Some(
        """SELECT c_mktsegment, event_type, count(*) AS cnt,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micros
          |FROM events JOIN customer ON user_id = c_custkey
          |GROUP BY c_mktsegment, event_type
          |ORDER BY c_mktsegment, event_type""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q50_stream_sessionize",
      "streaming session_window (30 min gap) per user with state merged across micro-batches",
      (spark, dir) => sessionWindowStreaming(spark, dir),
      Some(
        """WITH flagged AS (
          |  SELECT user_id, event_id, ts, value,
          |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER
          |                (PARTITION BY user_id ORDER BY ts, event_id))
          |              > 1800000000 THEN 1 ELSE 0 END AS brk
          |  FROM events),
          |sessions AS (
          |  SELECT user_id, ts, value,
          |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
          |  FROM flagged)
          |SELECT min(ts) AS session_start,
          |       max(ts) + INTERVAL 30 MINUTE AS session_end,
          |       user_id, count(*) AS n_events,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |         AS value_micros
          |FROM sessions
          |GROUP BY user_id, seq
          |ORDER BY user_id, session_start""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q54_stream_append_hourly",
      "append-mode watermarked hourly aggregation: windows emitted once, tail inside the horizon withheld",
      (spark, dir) => hourlyAppendStreaming(spark, dir),
      Some(
        """WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
          |SELECT date_trunc('hour', ts) AS hour_start, event_type,
          |       count(*) AS cnt,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |         AS value_micros
          |FROM events
          |GROUP BY 1, 2
          |HAVING hour_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
          |ORDER BY hour_start, event_type""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q67_stream_late_data",
      "watermark drops a replayed late batch: result identical to the no-replay run, drop count evidenced",
      (spark, dir) => lateDataStreaming(spark, dir),
      Some(
        """WITH wm AS (SELECT max(ts) AS w FROM events)
          |SELECT date_trunc('hour', ts) AS hour_start, event_type,
          |       count(*) AS cnt,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |         AS value_micros
          |FROM events
          |GROUP BY 1, 2
          |HAVING hour_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
          |ORDER BY hour_start, event_type""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q72_stream_transform_with_state",
      "per-user running totals via transformWithState (StatefulProcessor + ValueState, update mode, RocksDB)",
      (spark, dir) => transformWithStateTotals(spark, dir),
      Some(
        """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |         AS value_micros,
          |       max(ts) AS last_ts
          |FROM events
          |GROUP BY user_id
          |ORDER BY user_id""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q73_stream_timer_sessions",
      "sessions closed by event-time TIMERS (transformWithState handleExpiredTimer, append mode)",
      (spark, dir) => timerClosedSessionsStreaming(spark, dir),
      Some(
        """WITH flagged AS (
          |  SELECT user_id, event_id, ts, value,
          |         CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER
          |                (PARTITION BY user_id ORDER BY ts, event_id))
          |              > 1800000000 THEN 1 ELSE 0 END AS brk
          |  FROM events),
          |sessions AS (
          |  SELECT user_id, ts, value,
          |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
          |  FROM flagged),
          |agg AS (
          |  SELECT user_id, min(ts) AS session_start, max(ts) AS session_last,
          |         CAST(count(*) AS BIGINT) AS n_events,
          |         CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |           AS value_micros
          |  FROM sessions GROUP BY user_id, seq),
          |wm AS (SELECT epoch_us(max(ts)) // 1000 AS w_ms FROM events)
          |SELECT user_id, session_start, session_last, n_events, value_micros
          |FROM agg, wm
          |WHERE epoch_us(session_last) // 1000 + 1800000 <= w_ms
          |ORDER BY user_id, session_start""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q74_stream_warm_start",
      "totals warm-started from a batch aggregate (StatefulProcessorWithInitialState): history never replays",
      (spark, dir) => warmStartTotalsStreaming(spark, dir),
      Some(
        """WITH live AS (
          |  SELECT DISTINCT user_id FROM events
          |  WHERE ts >= TIMESTAMP '2024-01-11 00:00:00')
          |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |         AS value_micros,
          |       max(ts) AS last_ts
          |FROM events
          |WHERE user_id IN (SELECT user_id FROM live)
          |GROUP BY user_id
          |ORDER BY user_id""".stripMargin)
    ),

    graft.queries.GraftQuery(
      "q75_stream_window_rollup",
      "chained windowed aggregations (5-min pre-agg feeding an hourly rollup, one streaming query)",
      (spark, dir) => windowRollupStreaming(spark, dir),
      Some(
        """WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events)
          |SELECT date_trunc('hour', ts) AS hour_start, event_type,
          |       CAST(count(*) AS BIGINT) AS cnt,
          |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
          |         AS value_micros,
          |       CAST(count(DISTINCT epoch_us(ts) // 300000000) AS BIGINT)
          |         AS n_buckets
          |FROM events
          |GROUP BY 1, 2
          |HAVING hour_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
          |ORDER BY hour_start, event_type""".stripMargin)
    )
  )

  // ---- custom state: sessionization via flatMapGroupsWithState ----

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(nEvents: Long, totalValue: Double,
      startMs: Long, lastMs: Long)

  final case class SessionSummary(user_id: Long, n_events: Long,
      total_value: Double, start_ms: Long, end_ms: Long, closed: Boolean)

  /** Custom stateful sessionization: closes a user's session once a new
    * event arrives more than `gapMs` after the last one (the
    * `mapGroupsWithState`-family surface the prompt/SURVEY call for;
    * event-time-timeout closing works the same way with
    * GroupStateTimeout.EventTimeTimeout + watermark in production). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionSummary]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(s.copy(nEvents = s.nEvents + 1,
                  totalValue = s.totalValue + e.value, lastMs = t))
              case Some(s) =>
                closed += SessionSummary(user, s.nEvents, s.totalValue,
                  s.startMs, s.lastMs, closed = true)
                cur = Some(SessionState(1L, e.value, t, t))
              case None =>
                cur = Some(SessionState(1L, e.value, t, t))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
