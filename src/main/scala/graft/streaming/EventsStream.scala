package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event queries.
  *
  * The reference has no streaming (each run is a batch snapshot), but
  * its audit-event entity is event-shaped and its retention mode is a
  * poor-man's watermark (SURVEY §2.2) — these pipelines are the
  * capability extension: file-source stream → event-time windowed
  * aggregation with a watermark → sink. `foreachBatch` + Sinks.snapshot
  * reproduces the reference's overwrite-load semantics per micro-batch.
  *
  * At scale the file source becomes Kafka/eventhub; the query shape
  * (watermark + window + stateful agg) is unchanged.
  */
object EventsStream {

  /** Streaming DataFrame over the events parquet with proper event-time.
    *
    * File-stream sources require an explicit schema; hard-coding one is
    * how round 7 broke (the testdata's ts encoding changed under a
    * frozen schema and every timestamp silently collapsed 1000×).
    * Instead, sniff the ACTUAL schema with a footer-only batch read —
    * O(1) driver work, no data scan, memoized per (sfDir, table) so
    * probe loops re-opening the same source pay the footer read once —
    * and apply the same encoding-dispatching normalization the batch
    * path uses ([[graft.core.Tables.normalizeTs]]). */
  def readEvents(spark: SparkSession, sfDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val rawSchema = sniffSchema(spark, sfDir, "events")
    // the nanos-magnitude guard cannot run on a streaming frame (no
    // jobs at plan time) — validate the source FILE through the batch
    // path first, so a mis-encoded raw INT64 ts throws here instead of
    // silently collapsing 1000x inside the stream
    graft.core.Tables.validateNanos(spark, s"$sfDir/events.parquet", "ts")
    val raw = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      // file-stream sources take a directory; select just the events
      // file out of the shared SF dir
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    graft.core.Tables.normalizeTs(raw)
  }

  /** Tumbling 1-hour counts with a 2-hour watermark (streaming twin of
    * q15_event_window). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(30, 2))).cast(DoubleType)
          .as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"),
        col("sum_value"))

  /** Per-user session aggregation with a 30-minute inactivity gap
    * (session_window handles merge-and-extend state under streaming). */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"))

  /** The reference's load semantics under streaming: each micro-batch
    * full-refresh-overwrites the target via foreachBatch + the snapshot
    * sink, stamping one batch-constant timeGenerated per trigger
    * (O15/O16 applied per micro-batch). */
  def snapshotEachBatch(streamed: DataFrame, target: String,
      loadTimeForBatch: Long => java.sql.Timestamp =
        _ => new java.sql.Timestamp(System.currentTimeMillis())): Unit = {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_snap")
    try {
      val q = streamed.writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch(DedupStream.ingestBody(streamed.sparkSession) {
          (batch, batchId) =>
          // batch-constant stamp: ONE driver-side timestamp per trigger,
          // derived per batchId (injectable for deterministic tests)
          graft.operators.Sinks.snapshot(batch, target,
            loadTimeForBatch(batchId))
        })
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally deleteRecursively(ckpt.toFile)
  }

  final case class UserRunning(user_id: Long, n_events: Long,
      total_value: Double)

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * event count + value sum, emitting the updated aggregate each
    * micro-batch — the template for stateful ops session_window can't
    * express (counters, custom machines, cross-window state). */
  def userRunningTotals(events: DataFrame): org.apache.spark.sql.Dataset[UserRunning] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
            state: GroupState[(Long, Double)]) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var v = v0
          rows.foreach { case (_, value) => n += 1; v += value }
          state.update((n, v))
          Iterator(UserRunning(user, n, v))
      }
  }

  /** Streaming DataFrame over the documents parquet (the corpus as an
    * ingestion stream — at scale, the object-store listing feed).
    * Schema sniffed from the file footer, same rationale as
    * [[readEvents]]. */
  def readDocuments(spark: SparkSession, sfDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(sniffSchema(spark, sfDir, "documents"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)

  /** Streaming DataFrame over the embeddings parquet (the vector feed
    * an ANN index ingests incrementally). Schema sniffed from the file
    * footer, same rationale as [[readEvents]]. */
  def readEmbeddings(spark: SparkSession, sfDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(sniffSchema(spark, sfDir, "embeddings"))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(sfDir)

  /** Footer-only schema sniff, memoized per (sfDir, table). The
    * testdata tree is immutable within a run, so a once-read schema
    * stays valid; a NEW path (regenerated tree elsewhere) misses the
    * cache and is sniffed fresh — the encoding dispatch is never
    * frozen across generations. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()

  private def sniffSchema(spark: SparkSession, sfDir: String,
      table: String): org.apache.spark.sql.types.StructType =
    schemaCache.computeIfAbsent(s"$sfDir/$table.parquet",
      path => spark.read.parquet(path).schema)

  /** Streaming exact dedup — d01's operator under the streaming
    * engine: the first-seen document per content digest is emitted,
    * later copies are dropped as they arrive. State is one digest per
    * DISTINCT document and never ages out: correct for a bounded
    * corpus backfill. For endless streams where duplicates arrive
    * close together (at-least-once delivery), use
    * [[dedupEventsWithinWatermark]] — its state is bounded by the
    * watermark horizon. */
  def dedupDocuments(docs: DataFrame): DataFrame =
    docs.withColumn("digest", md5(col("text")))
      .dropDuplicates("digest")
      .select(col("doc_id"), col("digest"))

  /** Watermark-bounded streaming dedup: duplicate event_ids arriving
    * within the 2-hour event-time horizon are dropped; state for keys
    * older than the watermark is evicted, so memory is O(horizon), not
    * O(stream) — the production dedup for redelivering transports. */
  def dedupEventsWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** Stream-stream interval self-join — the pair stage of the batch
    * range join (q30) under the streaming engine: purchases matched to
    * the error events whose 10-minute window contains them.
    *
    * Spark refuses a stream-stream join with no equality predicate,
    * and the batch answer to that is also the streaming one: the
    * RangeJoin TIME BUCKET is the equi-key. Errors explode to the
    * buckets their window covers, purchases map to exactly one bucket
    * (so no duplicate pairs), and the precise range predicate rides as
    * the residual condition. Both sides carry watermarks and the
    * condition bounds their event-time distance, which is what lets
    * the state store EVICT: an error row stops waiting once the
    * purchase watermark passes its window end — state is O(watermark
    * horizon + window), never O(stream). Inner matches emit as soon as
    * both sides arrive (append mode); the watermark only governs state
    * cleanup. */
  def errorPurchasePairs(events: DataFrame,
      bucketSeconds: Long = 600L): DataFrame = {
    val bucketMicros = lit(bucketSeconds * 1000000L)
    // cast first: no-op on TimestampType, exact on NTZ under the UTC
    // session pin (unix_micros alone rejects TIMESTAMP_NTZ inputs)
    def bucketOf(ts: org.apache.spark.sql.Column) =
      floor(unix_micros(ts.cast(TimestampType)) / bucketMicros).cast(LongType)
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
      .withColumn("bucket", explode(sequence(bucketOf(col("e_ts")),
        bucketOf(col("e_ts") + expr("INTERVAL 10 MINUTES")))))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
      .withColumn("bucket", bucketOf(col("p_ts")))
    purchases.join(errors, Seq("bucket"))
      // pushed into the join condition by the optimizer, where the
      // time bound also drives state eviction
      .filter(col("p_ts") >= col("e_ts") &&
        col("p_ts") < col("e_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("error_id"), col("p_id"))
  }

  /** Run a streaming query to completion against the (static) fixture
    * and return the materialized result. Proves the plan runs under
    * the streaming engine, not just batch. Aggregating queries use
    * `complete` mode; non-aggregating ones (dedup, maps) use `append`.
    *
    * `statePartitions` sizes the stateful operators' state-store count
    * — pinned at first start from `spark.sql.shuffle.partitions`, and
    * pure fixed overhead per micro-batch (store setup + checkpoint
    * files per partition per trigger, ~2× wall time at 32 vs 8 on the
    * fixtures). A deployment sizes this to sustained stream
    * throughput, NOT to the batch session's shuffle width — so the
    * plan is BUILT in an isolated `newSession()` child (same
    * SparkContext and shared state, private SQLConf): the caller's
    * session conf is never mutated, safe under concurrent harnesses.
    * The scratch checkpoint dir is deleted after stop; a throwing
    * `processAllAvailable` cannot leak a live query.
    *
    * `extraConfs` land on that child session (e.g. a state-store
    * provider override — the newSession() does NOT inherit runtime
    * conf from the caller's session); `inspect` runs after
    * `processAllAvailable` while the query is still live, for specs
    * that assert on `lastProgress` state metrics. */
  def runToCompletion(spark: SparkSession, build: SparkSession => DataFrame,
      name: String, outputMode: String = "complete",
      statePartitions: Int = 8,
      extraConfs: Map[String, String] = Map.empty,
      inspect: org.apache.spark.sql.streaming.StreamingQuery => Unit =
        _ => ()): DataFrame = {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    extraConfs.foreach { case (k, v) => session.conf.set(k, v) }
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft_ckpt_$name")
    try {
      val q = build(session).writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", ckpt.toString)
        .start()
      // stop in finally: a throwing processAllAvailable must not leak a
      // live query (it would keep the memory-sink name registered and
      // fail any same-name retry) or race the checkpoint delete below
      try { q.processAllAvailable(); inspect(q) } finally q.stop()
    } finally deleteRecursively(ckpt.toFile)
    session.table(name)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
