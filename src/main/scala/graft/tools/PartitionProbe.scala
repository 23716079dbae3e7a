package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.core.Tables

/** Partition-pruning evidence probe: builds the date-partitioned
  * events layout ([[Tables.buildPartitionedEvents]]), runs a one-day
  * query through it, and reports what the scan actually LISTED — the
  * read-path posture artifact for 100 TB (a day query over a year of
  * events must touch 1/365th of the files, not all of them).
  *
  * Prints one JSON line:
  *   {"metric":"partition_prune","total_days":N,"total_files":N,
  *    "pruned_days":N,"files_read":N,"partition_filters":true,
  *    "rows_flat":N,"rows_pruned":N,"agree":true}
  * Usage: runMain graft.tools.PartitionProbe <sfDir> [outDir]
  */
object PartitionProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(16)
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      s"/tmp/graft_events_by_day_${new java.io.File(sfDir).getName}")

    Tables.buildPartitionedEvents(spark, sfDir, outDir)
    val part = Tables.eventsPartitioned(spark, outDir)
    val totalDays = part.select("dt").distinct().count()
    val totalFiles = part.inputFiles.length

    // the probe day: the layout's median day (data-independent choice)
    val day = part.select("dt").distinct().orderBy("dt")
      .collect().map(_.getDate(0)).apply((totalDays / 2).toInt)

    // scan inspection on the filter alone (no exchange → no AQE
    // wrapper hiding the scan node inside query stages)
    val scanDf = part.filter(col("dt") === lit(day))
    scanDf.collect() // execute so scan metrics populate
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
    }.flatten
    val scan = scans(scanDf.queryExecution.executedPlan).head
    // decimal sum: the two sides aggregate under different physical
    // plans, and a DOUBLE sum is merge-order sensitive — exact-equality
    // comparison needs the order-free accumulator (the tumblingHourly
    // pattern)
    val pruned = part.filter(col("dt") === lit(day))
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).as("v"))
    val prunedRows = pruned.collect()
    val filesRead = scan.metrics("numFiles").value
    val hasPartFilters = scan.partitionFilters.nonEmpty

    // correctness twin: the flat table filtered on to_date(ts)
    val flat = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")) === lit(day))
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).as("v"))
      .collect()
    def keyed(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2)))).toMap
    val agree = keyed(flat) == keyed(prunedRows)

    // ---- sketch-backed skipping BEYOND the date key (round 10):
    // per-partition stats (exact min/max + KLL + theta,
    // operators.DataSkipping) prune partitions for VALUE predicates.
    val statsDir = s"${outDir}_stats"
    graft.operators.DataSkipping.buildEventStats(spark, outDir, statsDir)
    def filesOf(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      scans(df.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    // value threshold: median of the per-partition maxes (data-driven,
    // deterministic) — partitions below it are provably predicate-free
    val maxes = spark.read.parquet(statsDir)
      .select("value_max").collect().map(_.getDouble(0)).sorted
    val vt = maxes(maxes.length / 2)
    val vPruned = graft.operators.DataSkipping
      .eventsWithValueAtLeast(spark, outDir, statsDir, vt)
    val vFiles = filesOf(vPruned)
    val vAgree = vPruned.count() ==
      part.filter(col("value") >= vt).count()
    // user probe: the user on the fewest distinct days (sparsest —
    // the strongest membership-skip case this corpus offers)
    val sparsest = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .groupBy("user_id").agg(count(lit(1)).as("nd"))
      .orderBy(col("nd"), col("user_id")).limit(1)
      .collect().head.getLong(0)
    val uPruned = graft.operators.DataSkipping
      .eventsForUser(spark, outDir, statsDir, sparsest)
    val uFiles = filesOf(uPruned)
    val uAgree = uPruned.count() ==
      part.filter(col("user_id") === sparsest).count()

    println(s"""{"metric":"partition_prune","sf":"${new java.io.File(sfDir)
        .getName}","total_days":$totalDays,"total_files":$totalFiles,""" +
      s""""probe_day":"$day","files_read":$filesRead,""" +
      s""""partition_filters":$hasPartFilters,""" +
      s""""rows_flat":${flat.length},"rows_pruned":${prunedRows.length},""" +
      s""""agree":$agree,""" +
      f""""skip_value_threshold":$vt%.2f,"skip_value_files":$vFiles,""" +
      s""""skip_value_agree":$vAgree,"skip_user":$sparsest,""" +
      s""""skip_user_files":$uFiles,"skip_user_agree":$uAgree}""")
    require(hasPartFilters, "scan planned no partition filters")
    require(filesRead < totalFiles,
      s"pruning did not reduce files read ($filesRead/$totalFiles)")
    require(agree, "pruned result disagrees with the flat-table filter")
    require(vAgree && uAgree, "sketch-skip result disagrees with flat filter")
    require(vFiles < totalFiles && uFiles < totalFiles,
      s"sketch stats skipped nothing ($vFiles/$uFiles of $totalFiles)")
    spark.stop()
  }
}
