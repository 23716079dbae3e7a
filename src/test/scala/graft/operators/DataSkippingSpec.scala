package graft.operators

import graft.SparkSpec
import graft.core.Tables
import graft.functions.ThetaKernel
import org.apache.spark.sql.functions._

/** Sketch-backed partition skipping: soundness (a pruned read NEVER
  * loses a matching row — for every predicate tried, results equal
  * the unpruned filter), effectiveness (some partitions actually
  * skip on this corpus), and the theta membership rule's
  * no-false-negative guarantee exhaustively over every (user, day)
  * pair that truly exists.
  */
class DataSkippingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val layout = {
    val dir = java.nio.file.Files.createTempDirectory("graft_skip_layout")
      .resolve("events_by_day").toString
    Tables.buildPartitionedEvents(spark, sf, dir)
    dir
  }
  private lazy val statsDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_skip_stats")
      .resolve("stats").toString
    DataSkipping.buildEventStats(spark, layout, dir)
    dir
  }

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
    }.flatten
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("value-range skip: sound (equal rows) and effective (fewer files) at a mid-range threshold") {
    val full = Tables.eventsPartitioned(spark, layout)
    val totalFiles = full.inputFiles.length
    // mid-range threshold from the stats themselves: the median of the
    // per-partition maxes — above it, ~half the partitions are provably
    // predicate-free
    val maxes = spark.read.parquet(statsDir)
      .select("value_max").collect().map(_.getDouble(0)).sorted
    val t = maxes(maxes.length / 2)
    val pruned = DataSkipping.eventsWithValueAtLeast(spark, layout,
      statsDir, t)
    val flat = full.filter(col("value") >= t)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids(pruned) == ids(flat) && ids(flat).nonEmpty)
    val fr = filesRead(pruned)
    assert(fr < totalFiles, s"no files skipped ($fr/$totalFiles)")
  }

  test("user membership skip: sound for every user; effective for the sparsest user") {
    val full = Tables.eventsPartitioned(spark, layout)
    val totalFiles = full.inputFiles.length
    // exhaustive no-false-negative check: every (user, day) pair that
    // exists must be mayContain=true in that day's sketch
    val present = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("dt"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toString)).toSet
    val sketches = spark.read.parquet(statsDir)
      .select(col("dt"), col("user_theta")).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Array[Byte]]("user_theta"))
      .toMap
    present.foreach { case (u, d) =>
      assert(ThetaKernel.mayContain(sketches(d), u),
        s"false negative: user $u IS in $d")
    }
    // the user on the fewest days skips the most partitions
    val byDays = present.groupBy(_._1).view.mapValues(_.size)
    val (sparsest, nDays) = byDays.minBy { case (u, n) => (n, u) }
    val pruned = DataSkipping.eventsForUser(spark, layout, statsDir,
      sparsest)
    val flat = full.filter(col("user_id") === sparsest)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids(pruned) == ids(flat) && ids(flat).nonEmpty)
    val fr = filesRead(pruned)
    assert(fr < totalFiles,
      s"no files skipped for user on $nDays days ($fr/$totalFiles)")
  }

  test("write-path stats: retention lifecycle keeps the stats table consistent (replace replay, append merge, age-out)") {
    import java.sql.Timestamp
    val base = java.nio.file.Files.createTempDirectory("graft_wps")
    val dataPath = base.resolve("store").toString
    val spec = DataSkipping.SkipStatsSpec(
      base.resolve("stats").toString, "value", "user_id")
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    def batch(m: Int) = ev.filter(col("event_id") % 3 === m)
    def ts(day: String) = Timestamp.valueOf(s"$day 06:00:00")
    def statRows() = spark.read.parquet(spec.statsDir)
      .collect().map(r => r.getAs[java.sql.Date]("load_date").toString ->
        r.getAs[Long]("n_rows")).toMap

    // two replace rounds on different days
    Sinks.retentionReplace(spark, batch(0), dataPath, ts("2024-10-01"),
      stats = Some(spec))
    Sinks.retentionReplace(spark, batch(1), dataPath, ts("2024-10-02"),
      stats = Some(spec))
    val n0 = batch(0).count(); val n1 = batch(1).count()
    assert(statRows() == Map("2024-10-01" -> n0, "2024-10-02" -> n1))

    // REPLAY of round 2 (the sink's crash contract): data and stats
    // both land identically — the stats table is replay-idempotent
    Sinks.retentionReplace(spark, batch(1), dataPath, ts("2024-10-02"),
      stats = Some(spec))
    assert(statRows() == Map("2024-10-01" -> n0, "2024-10-02" -> n1))

    // two APPEND batches on one day: the day's stats row is the MERGE
    // (counts add; sketches union — no partition read-back)
    val a1 = batch(2).filter(col("event_id") % 2 === 0)
    val a2 = batch(2).filter(col("event_id") % 2 === 1)
    Sinks.retentionAppend(spark, a1, dataPath, ts("2024-10-03"),
      stats = Some(spec))
    Sinks.retentionAppend(spark, a2, dataPath, ts("2024-10-03"),
      stats = Some(spec))
    assert(statRows() == Map("2024-10-01" -> n0, "2024-10-02" -> n1,
      "2024-10-03" -> (a1.count() + a2.count())))

    // skip reads are SOUND against the flat filter (value and key)
    val flat = spark.read.parquet(dataPath)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id").collect().map(_.getLong(0)).sorted
    val t = 300.0
    assert(ids(DataSkipping.retentionValueAtLeast(spark, dataPath, spec, t))
      .sameElements(ids(flat.filter(col("value") >= t))))
    val someUser = ev.select("user_id").head().getLong(0)
    assert(ids(DataSkipping.retentionForKey(spark, dataPath, spec, someUser))
      .sameElements(ids(flat.filter(col("user_id") === someUser))))
    // absent key: skip everything, still equal (empty = empty)
    assert(DataSkipping.retentionForKey(spark, dataPath, spec,
      -999999L).count() == 0)

    // age-out: a later load (cutoff 2024-10-02) drops the expired
    // 2024-10-01 partition from BOTH layouts; the stats table tracks
    // exactly the surviving partitions
    Sinks.retentionReplace(spark, batch(0), dataPath, ts("2024-11-11"),
      maxAgeDays = 40, stats = Some(spec))
    val survivingData = spark.read.parquet(dataPath)
      .select("load_date").distinct().collect()
      .map(_.getDate(0).toString).toSet
    assert(survivingData == Set("2024-10-02", "2024-10-03", "2024-11-11"),
      survivingData.toString)
    assert(statRows().keySet == survivingData)
    // and the skip read stays sound on the aged store
    val flat2 = spark.read.parquet(dataPath)
    assert(ids(DataSkipping.retentionValueAtLeast(spark, dataPath, spec, t))
      .sameElements(ids(flat2.filter(col("value") >= t))))
  }

  test("write-path stats: string-keyed theta probe uses the marker-byte encoding (no false negatives, absent key skips)") {
    import java.sql.Timestamp
    val base = java.nio.file.Files.createTempDirectory("graft_wps_str")
    val dataPath = base.resolve("store").toString
    val spec = DataSkipping.SkipStatsSpec(
      base.resolve("stats").toString, "value", "label")
    import spark.implicits._
    val d1 = Seq(("alpha", 1.0), ("beta", 2.0), ("", 3.0))
      .toDF("label", "value")
    val d2 = Seq(("gamma", 4.0), ("delta", 5.0)).toDF("label", "value")
    Sinks.retentionReplace(spark, d1, dataPath,
      Timestamp.valueOf("2024-10-01 00:00:00"), stats = Some(spec))
    Sinks.retentionReplace(spark, d2, dataPath,
      Timestamp.valueOf("2024-10-02 00:00:00"), stats = Some(spec))
    // present keys (incl. the empty string the marker byte protects):
    // found, never a false negative
    for (k <- Seq("alpha", "", "gamma"))
      assert(DataSkipping.retentionForKey(spark, dataPath, spec, k)
        .count() == 1, s"key '$k'")
    // absent key: both sketches are in exact mode, so absence is
    // PROVEN and both partitions skip — zero files read
    val absent = DataSkipping.retentionForKey(spark, dataPath, spec,
      "nope")
    assert(absent.count() == 0)
    assert(filesRead(absent) == 0, "exact-mode absence should skip all")
  }

  test("KLL estimate prices the scan within a loose envelope, never used to skip") {
    val full = Tables.eventsPartitioned(spark, layout)
    val maxes = spark.read.parquet(statsDir)
      .select("value_max").collect().map(_.getDouble(0)).sorted
    val t = maxes(maxes.length / 2)
    val est = DataSkipping.estimateMatchingRows(spark, statsDir, t)
    val exact = full.filter(col("value") >= t).count()
    // k=200 ⇒ ~1.65% rank error per partition; 3x slack on the total
    val slack = math.max(50L, (full.count() * 0.05).toLong)
    assert(math.abs(est - exact) <= slack, s"est $est vs exact $exact")
  }
}
