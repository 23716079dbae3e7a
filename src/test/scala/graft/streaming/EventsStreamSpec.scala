package graft.streaming

import graft.SparkSpec
import graft.queries.CapabilityQueries

class EventsStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming tumbling-window agg equals the batch twin") {
    val batch = CapabilityQueries.q15EventWindow(spark, sf).collect().toSeq
    val streamed = EventsStream.runToCompletion(spark,
      sess => EventsStream.tumblingHourly(EventsStream.readEvents(sess, sf)),
      "spec_tumbling")
      .orderBy("hour_start", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("foreachBatch snapshot load reproduces overwrite semantics under streaming") {
    val target = java.nio.file.Files.createTempDirectory("graft_stream_snap")
      .resolve("agg").toString
    EventsStream.snapshotEachBatch(
      EventsStream.tumblingHourly(EventsStream.readEvents(spark, sf)), target,
      bid => java.sql.Timestamp.valueOf(s"2024-11-08 00:00:0$bid"))
    val loaded = spark.read.parquet(target)
    val batch = CapabilityQueries.q15EventWindow(spark, sf)
    assert(loaded.count() == batch.count())
    assert(loaded.columns.contains("timeGenerated"))
    assert(loaded.select("timeGenerated").distinct().count() == 1)
  }

  test("flatMapGroupsWithState running totals equal batch aggregation") {
    import spark.implicits._
    // single source file -> one micro-batch -> final update per user
    val got = EventsStream.runToCompletion(spark,
        sess => EventsStream.userRunningTotals(
          EventsStream.readEvents(sess, sf)).toDF(),
        "spec_running", outputMode = "update")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n_events").as("n"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = graft.core.Tables.events(spark, sf)
      .groupBy("user_id").count().orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("streaming exact dedup emits exactly one row per content digest") {
    import org.apache.spark.sql.functions.{col, md5}
    val batchDigests = graft.core.Tables.documents(spark, sf)
      .select(md5(col("text")).as("digest")).distinct()
      .collect().map(_.getString(0)).toSet
    val streamed = EventsStream.runToCompletion(spark,
      sess => EventsStream.dedupDocuments(EventsStream.readDocuments(sess, sf)),
      "spec_dedup_docs", outputMode = "append")
    assert(streamed.count() == batchDigests.size)
    assert(streamed.select("digest").collect().map(_.getString(0)).toSet
      == batchDigests)
  }

  test("watermark-bounded dedup drops a full redelivery across micro-batches") {
    // two copies of the events file in one source dir + one file per
    // trigger = the second micro-batch is an exact redelivery; every
    // event_id is inside the watermark horizon, so all copies drop
    val dir = java.nio.file.Files.createTempDirectory("graft_redeliver")
    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    java.nio.file.Files.copy(src, dir.resolve("batch_a.parquet"))
    java.nio.file.Files.copy(src, dir.resolve("batch_b.parquet"))
    val events = (sess: org.apache.spark.sql.SparkSession) =>
      graft.core.Tables.normalizeTs(sess.readStream
        .schema(sess.read.parquet(src.toString).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir.toString))
    val streamed = EventsStream.runToCompletion(spark,
      sess => EventsStream.dedupEventsWithinWatermark(events(sess)),
      "spec_dedup_events", outputMode = "append")
    val want = graft.core.Tables.events(spark, sf).count()
    assert(streamed.count() == want)
    assert(streamed.select("event_id").distinct().count() == want)
  }

  test("streaming session windows equal the batch session_window result") {
    val batch = CapabilityQueries.q19SessionWindow(spark, sf).collect().toSeq
    val streamed = EventsStream.runToCompletion(spark,
      sess => EventsStream.userSessions(EventsStream.readEvents(sess, sf)),
      "spec_sessions")
      .orderBy("user_id", "session_start_us").collect().toSeq
    assert(streamed == batch)
  }

  test("stream-stream interval join emits exactly the batch range-join pair set") {
    import org.apache.spark.sql.functions.{col, expr}
    val streamed = EventsStream.runToCompletion(spark,
        sess => EventsStream.errorPurchasePairs(EventsStream.readEvents(sess, sf)),
        "spec_ss_join", outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.core.Tables.events(spark, sf)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val batch = graft.operators.RangeJoin.pointInInterval(
        purchases, errors, "p_ts", "w_start", "w_end", 600L)
      .select("error_id", "p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("stream-static broadcast join: streaming events enrich against a static dimension, equals batch") {
    import org.apache.spark.sql.functions.{broadcast, col}
    // the static side broadcasts to every micro-batch — the standard
    // streaming-enrichment shape (no state, no watermark needed)
    val dim = broadcast(graft.core.Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment")))
    val enrich = (ev: org.apache.spark.sql.DataFrame) =>
      ev.join(dim, Seq("user_id"))
        .select("event_id", "user_id", "c_mktsegment")
    val streamed = EventsStream.runToCompletion(spark,
        sess => enrich(EventsStream.readEvents(sess, sf)),
        "spec_stream_static", outputMode = "append")
    val batch = enrich(graft.core.Tables.events(spark, sf))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("ANN encode kernels run stateless on an embedding stream, equal batch") {
    import org.apache.spark.sql.functions.col
    import graft.similarity.Ann
    // the incremental-ingest half of an ANN index build: bucket/code
    // assignment is per-row (native kernels), so it streams with no
    // state at all
    val encode = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("vec_id"),
        Ann.portableLshBucket(col("embedding"), nBits = 8, dim = 64)
          .as("bucket"),
        Ann.portablePqEncode(col("embedding"), dim = 64, m = 8, k = 8)
          .getField("codes").as("codes"))
    val streamed = EventsStream.runToCompletion(spark,
      sess => encode(EventsStream.readEmbeddings(sess, sf)),
      "spec_ann_stream", outputMode = "append")
    val batch = encode(graft.core.Tables.embeddings(spark, sf))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("sliding-window chunking runs stateless on a document stream, equals batch") {
    import graft.corpus.Selection
    val chunk = (df: org.apache.spark.sql.DataFrame) =>
      Selection.chunkSliding(df, "doc_id", "text", chunkSize = 32, stride = 24)
    val streamed = EventsStream.runToCompletion(spark,
      sess => chunk(EventsStream.readDocuments(sess, sf)),
      "spec_chunk_stream", outputMode = "append")
    val batch = chunk(graft.core.Tables.documents(spark, sf))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("corpus selection composes with streaming: split + PII redaction on a document stream equals batch") {
    import graft.corpus.Selection
    import graft.functions.TextOps
    import org.apache.spark.sql.functions.col
    val project = (df: org.apache.spark.sql.DataFrame) =>
      Selection.assignSplits(df, "doc_id")
        .select(col("doc_id"), col("split"),
          TextOps.redactPii(col("text")).as("redacted"))
    val streamed = EventsStream.runToCompletion(spark,
      sess => project(EventsStream.readDocuments(sess, sf)),
      "spec_corpus_stream", outputMode = "append")
    val batch = project(graft.core.Tables.documents(spark, sf))
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}
