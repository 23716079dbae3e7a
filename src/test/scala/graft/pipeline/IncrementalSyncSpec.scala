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
}
