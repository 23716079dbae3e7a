package graft.pipeline

import graft.SparkSpec
import graft.core.EntitySchemas
import graft.queries.ParityQueries.fixtureRoot
import java.nio.file.Files

class IncrementalSyncSpec extends SparkSpec {

  test("two sync rounds: first run loads the full set + cursor, second applies only the delta") {
    val schema = EntitySchemas.managedDeviceSource
    val work = Files.createTempDirectory("graft_inc_sync")
    val snapshotPath = work.resolve("snapshot").toString
    val cursorPath = work.resolve("cursor").toString

    // round 1: no cursor yet — start from the delta endpoint's first
    // sync (full set, deltaLink on the final page)
    assert(IncrementalSync.loadCursor(spark, cursorPath).isEmpty)
    val c1 = IncrementalSync.runRound(spark,
      s"$fixtureRoot/managedDevicesInit/page1.json",
      schema, snapshotPath, cursorPath)
    assert(c1.isDefined)
    assert(IncrementalSync.loadCursor(spark, cursorPath) == c1)
    assert(spark.read.schema(schema).parquet(snapshotPath).count() == 6)

    // round 2: start from the persisted cursor (which resolves to the
    // delta change pages: update + tombstone + insert)
    val c2 = IncrementalSync.runRound(spark, c1.get,
      schema, snapshotPath, cursorPath)
    assert(c2.exists(_.contains("$deltatoken=abc123")))
    assert(IncrementalSync.loadCursor(spark, cursorPath) == c2)
    val byId = spark.read.schema(schema).parquet(snapshotPath)
      .select("id", "deviceName").collect()
      .map(r => r.getString(0).take(8) -> r.getString(1)).toMap
    assert(byId.size == 6)
    assert(!byId.contains("33333333"))
    assert(byId("11111111") == "DESKTOP-ALPHA-R2")
    assert(byId("77777777") == "DESKTOP-ETA")

    // crash-ordering property: replaying round 2 (snapshot committed,
    // cursor save lost) converges to the identical snapshot
    IncrementalSync.runRound(spark, c1.get, schema, snapshotPath, cursorPath)
    val replayed = spark.read.schema(schema).parquet(snapshotPath)
      .select("id", "deviceName").collect()
      .map(r => r.getString(0).take(8) -> r.getString(1)).toMap
    assert(replayed == byId)
  }

  test("sync + retention composition: per-day partitions, replay-idempotent history, age-out") {
    import graft.operators.Sinks
    import java.sql.Timestamp
    val schema = EntitySchemas.managedDeviceSource
    val work = Files.createTempDirectory("graft_inc_ret")
    val snapshotPath = work.resolve("snapshot").toString
    val cursorPath = work.resolve("cursor").toString
    val history = work.resolve("history").toString
    val t1 = Timestamp.valueOf("2024-09-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-10-01 00:00:00")
    val t3 = Timestamp.valueOf("2024-11-08 00:00:00")
    def narrow = spark.read.schema(schema).parquet(snapshotPath)
      .select("id", "deviceName")
    def datesInHistory = spark.read.parquet(history)
      .select("load_date").distinct().collect().map(_.get(0).toString).sorted.toSeq

    val c1 = IncrementalSync.runRound(spark,
      s"$fixtureRoot/managedDevicesInit/page1.json",
      schema, snapshotPath, cursorPath)
    Sinks.retentionReplace(spark, narrow, history, t1)
    IncrementalSync.runRound(spark, c1.get, schema, snapshotPath, cursorPath)
    Sinks.retentionReplace(spark, narrow, history, t2)
    // both daily partitions live inside the window
    assert(datesInHistory == Seq("2024-09-01", "2024-10-01"))
    val day2 = spark.read.parquet(history)
      .filter("load_date = '2024-10-01'").count()

    // crash between history write and cursor save: the runbook replays
    // the WHOLE round — delta re-applied, day partition re-landed —
    // and the history must not grow (partition replace, not append)
    IncrementalSync.runRound(spark, c1.get, schema, snapshotPath, cursorPath)
    Sinks.retentionReplace(spark, narrow, history, t2)
    assert(datesInHistory == Seq("2024-09-01", "2024-10-01"))
    assert(spark.read.parquet(history)
      .filter("load_date = '2024-10-01'").count() == day2)

    // a later run's age-out drops only the expired day; the snapshot
    // state it lands is untouched
    Sinks.retentionReplace(spark, narrow, history, t3, maxAgeDays = 40)
    assert(datesInHistory == Seq("2024-10-01", "2024-11-08"))
    // history days carry the post-delta set: tombstone gone, insert in
    val names = spark.read.parquet(history)
      .filter("load_date = '2024-11-08'")
      .select("id", "deviceName").collect()
      .map(r => r.getString(0).take(8) -> r.getString(1)).toMap
    assert(!names.contains("33333333") && names.contains("77777777"))
  }
}
