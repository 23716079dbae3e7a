package graft.streaming

import graft.SparkSpec
import graft.core.EntitySchemas
import graft.queries.ParityQueries.fixtureRoot
import graft.sources.ODataPageReader
import java.nio.file.{Files, Paths}

class DeltaStreamSpec extends SparkSpec {

  test("streamed delta pages maintain the snapshot: per-page micro-batches converge to the merged state") {
    val schema = EntitySchemas.managedDeviceSource
    val work = Files.createTempDirectory("graft_delta_stream")
    val snapshotPath = work.resolve("snapshot").toString
    val pagesDir = work.resolve("incoming").toString
    Files.createDirectories(Paths.get(pagesDir))

    // seed: the full refresh this incremental run starts from
    ODataPageReader.readPages(spark,
        s"$fixtureRoot/managedDevices/page1.json", schema)
      .write.parquet(snapshotPath)

    // the delta round lands as two page documents; one micro-batch each
    for (p <- Seq("page1.json", "page2.json"))
      Files.copy(Paths.get(s"$fixtureRoot/managedDevicesDelta/$p"),
        Paths.get(pagesDir, p))

    val q = DeltaStream.maintainSnapshot(spark, pagesDir, schema,
      snapshotPath, work.resolve("ckpt").toString,
      maxFilesPerTrigger = 1) // force one micro-batch per page
    try q.processAllAvailable() finally q.stop()

    val byId = spark.read.schema(schema).parquet(snapshotPath)
      .select("id", "deviceName").collect()
      .map(r => r.getString(0).take(8) -> r.getString(1)).toMap
    assert(byId.size == 6)                           // 6 -1 tombstone +1 new
    assert(!byId.contains("33333333"))               // deleted
    assert(byId("11111111") == "DESKTOP-ALPHA-R2")   // updated
    assert(byId("77777777") == "DESKTOP-ETA")        // inserted
    assert(byId.contains("55555555"))                // untouched survives
    // the swap left no stray working copies behind
    assert(!Files.exists(Paths.get(snapshotPath + "_next")))
    assert(!Files.exists(Paths.get(snapshotPath + "_old")))
  }

  test("interrupted swap recovers: a crash between set-aside and promote restores _old before merging") {
    val schema = EntitySchemas.managedDeviceSource
    val work = Files.createTempDirectory("graft_delta_recover")
    val snapshotPath = work.resolve("snapshot").toString
    val pagesDir = work.resolve("incoming").toString
    Files.createDirectories(Paths.get(pagesDir))

    // simulate the crash window: live copy renamed aside, promote never
    // happened — only `_old` exists, holding the real snapshot
    ODataPageReader.readPages(spark,
        s"$fixtureRoot/managedDevices/page1.json", schema)
      .write.parquet(snapshotPath + "_old")

    Files.copy(Paths.get(s"$fixtureRoot/managedDevicesDelta/page1.json"),
      Paths.get(pagesDir, "page1.json"))
    Files.copy(Paths.get(s"$fixtureRoot/managedDevicesDelta/page2.json"),
      Paths.get(pagesDir, "page2.json"))

    val q = DeltaStream.maintainSnapshot(spark, pagesDir, schema,
      snapshotPath, work.resolve("ckpt").toString)
    try q.processAllAvailable() finally q.stop()

    // the 6 pre-crash rows were recovered and merged, not discarded
    val byId = spark.read.schema(schema).parquet(snapshotPath)
      .select("id", "deviceName").collect()
      .map(r => r.getString(0).take(8) -> r.getString(1)).toMap
    assert(byId.size == 6)
    assert(byId.contains("55555555"))                // pre-crash data survived
    assert(byId("11111111") == "DESKTOP-ALPHA-R2")
    assert(!byId.contains("33333333"))
    assert(!Files.exists(Paths.get(snapshotPath + "_old")))
  }
}
