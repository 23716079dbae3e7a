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
