package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Sinks (SURVEY.md O15–O18).
  *
  * The reference's load is a TVP + stored procedure doing
  * `DELETE FROM t; INSERT ... GETDATE()` in one transaction
  * (MD-SQL:98-181) — full-refresh snapshot semantics with a
  * batch-constant load timestamp. Spark-first: `SaveMode.Overwrite`
  * parquet with `lit(loadTime)` stamped on the driver (one value per
  * batch, matching "same GETDATE() for all rows of the statement";
  * a per-row `current_timestamp()` would drift across tasks).
  */
object Sinks {

  /** O15/O16 — full-refresh snapshot: overwrite + batch-constant
    * timeGenerated. */
  def snapshot(df: DataFrame, path: String, loadTime: Timestamp): Unit =
    df.withColumn("timeGenerated", lit(loadTime))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** O15/O16 over NEWLINE-DELIMITED JSON — the closest analog of the
    * reference README's alternate targets ("Azure blob storage / log
    * analytics workspace" ship row-wise JSON): same full-refresh +
    * batch-constant-timestamp semantics as [[snapshot]], rendered as
    * an NDJSON directory (one JSON document per line, Spark's native
    * distributed json writer — no driver-side serialization).
    * Timestamps render as ISO-8601 UTC strings (the session pins UTC),
    * so any log-ingestion agent can consume the lines without parquet
    * tooling. */
  def ndjsonSnapshot(df: DataFrame, path: String, loadTime: Timestamp): Unit =
    df.withColumn("timeGenerated", lit(loadTime))
      .write.mode(SaveMode.Overwrite).json(path)

  /** O17 — retention mode (the reference's commented alternative,
    * MD-SQL:107-111): append this batch as a `load_date=<date>`
    * partition (the date of the batch-constant `timeGenerated`), then
    * age out by DROPPING expired partition directories. Surviving data
    * is never read back or rewritten — a load touches one new
    * partition plus the expired deletes, so the cost is O(batch), not
    * O(table), and there is no delete/rename swap window: the only
    * destructive step removes directories that are expired by
    * definition. Readers prune on `load_date` for free
    * (PartitionFilters). */
  def retentionAppend(spark: SparkSession, df: DataFrame, path: String,
      loadTime: Timestamp, maxAgeDays: Int = 40,
      stats: Option[DataSkipping.SkipStatsSpec] = None): Unit = {
    df.withColumn("timeGenerated", lit(loadTime))
      .withColumn("load_date", lit(loadTime).cast("date"))
      .write.mode(SaveMode.Append).partitionBy("load_date").parquet(path)
    // write-path stats (round 11): MERGE the batch's summary row into
    // the partition's stored row (append may land several batches on
    // one load_date) — mergeable-sketch combine, O(batch), the
    // partition is never read back. Stats partitions age out with
    // their data partitions below.
    stats.foreach(sp => DataSkipping.upsertPartitionStats(spark, sp,
      loadDateOf(spark, loadTime), df, mergeExisting = true))
    dropExpired(spark, path, loadTime, maxAgeDays)
    stats.foreach(sp =>
      dropExpired(spark, sp.statsDir, loadTime, maxAgeDays))
  }

  /** The `load_date` partition value this load writes — derived in the
    * SESSION timezone exactly as `lit(loadTime).cast("date")`
    * evaluates, so the stats row and the age-out cutoff can never
    * disagree with the partition directory name. */
  private def loadDateOf(spark: SparkSession,
      loadTime: Timestamp): java.sql.Date = {
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    java.sql.Date.valueOf(loadTime.toInstant.atZone(zone).toLocalDate)
  }

  /** Age-out: drop `load_date=` partition directories older than the
    * retention window. Surviving data is never read or rewritten. */
  private def dropExpired(spark: SparkSession, path: String,
      loadTime: Timestamp, maxAgeDays: Int): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // partition names come from lit(loadTime).cast("date"), which
    // evaluates in the SESSION timezone — derive the cutoff in the
    // same zone or boundary partitions age out a day off on any
    // JVM whose default zone differs from the session's
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    val cutoff = loadTime.toInstant.atZone(zone).toLocalDate
      .minusDays(maxAgeDays)
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("load_date=")) {
        val d = java.time.LocalDate.parse(name.stripPrefix("load_date="))
        if (d.isBefore(cutoff) && !fs.delete(st.getPath, true))
          throw new java.io.IOException(
            s"retention: failed to drop expired partition ${st.getPath}")
      }
    }
  }

  /** [[retentionAppend]]'s replay-idempotent sibling: the batch
    * REPLACES its own `load_date=` partition (dynamic partition
    * overwrite — other partitions untouched) instead of appending, so
    * re-running a crashed load lands the identical bytes instead of
    * duplicating the day. This is the right mode when the load is
    * driven by a replayable upstream (e.g. [[graft.pipeline
    * .IncrementalSync]], whose crash contract re-runs the last round);
    * plain append matches the reference's insert-only retention sink.
    * Age-out is the same partition drop. */
  def retentionReplace(spark: SparkSession, df: DataFrame, path: String,
      loadTime: Timestamp, maxAgeDays: Int = 40,
      stats: Option[DataSkipping.SkipStatsSpec] = None): Unit = {
    df.withColumn("timeGenerated", lit(loadTime))
      .withColumn("load_date", lit(loadTime).cast("date"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("load_date").parquet(path)
    // write-path stats: the batch REPLACES its partition, so its stats
    // row replaces too — a replayed round rewrites both identically
    // (the sink's replay-idempotence extends to the stats table)
    stats.foreach(sp => DataSkipping.upsertPartitionStats(spark, sp,
      loadDateOf(spark, loadTime), df, mergeExisting = false))
    dropExpired(spark, path, loadTime, maxAgeDays)
    stats.foreach(sp =>
      dropExpired(spark, sp.statsDir, loadTime, maxAgeDays))
  }

  /** Apply an OData delta change set (`ODataPageReader.readDeltaPages`
    * output: entity columns + boolean `removed`) to a snapshot:
    * tombstoned ids are deleted, changed/new entities replace or
    * extend the snapshot. One anti-join on the changed-id set plus a
    * union — cost scales with the delta, not the table. No broadcast
    * hint: a routine delta is small and AQE broadcasts it at runtime,
    * but a delta after long downtime (or an expired delta token) can
    * approach full-table size, where a forced broadcast would OOM the
    * driver. Assumes the service coalesces to at most one change per
    * id per delta round (the documented OData delta contract). */
  def applyDelta(snapshot: DataFrame, changes: DataFrame,
      idCol: String): DataFrame = {
    val changedIds = changes.select(col(idCol))
    val upserts = changes.filter(!col("removed")).drop("removed")
    snapshot.join(changedIds, Seq(idCol), "left_anti")
      .unionByName(upserts)
  }

  /** Overwrite `path` from a DataFrame that may READ `path` (e.g. a
    * merged snapshot), without ever reading and writing it in the same
    * job: materialize to `_next`, rename the live copy aside to
    * `_old`, promote, drop `_old` — a complete snapshot exists on
    * disk at every instant. Recover an interrupted swap with
    * [[recoverSwap]] before reading. */
  def overwriteViaSwap(spark: SparkSession, df: DataFrame,
      path: String, partitionCols: Seq[String] = Nil): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = new org.apache.hadoop.fs.Path(path + "_next")
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(next.toString)
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"swap: cannot clear $old")
    if (fs.exists(hPath) && !fs.rename(hPath, old))
      throw new java.io.IOException(s"swap: cannot set aside $hPath")
    if (!fs.rename(next, hPath))
      throw new java.io.IOException(s"swap: cannot promote $next")
    fs.delete(old, true) // best-effort; a leftover _old is recoverable state
    ()
  }

  /** Keyed MERGE (upsert + tombstone delete) into a hash-bucket-
    * partitioned parquet store, with rewrite cost O(touched buckets)
    * — the disk-level sibling of [[applyDelta]] (which merges
    * DataFrames in memory). Layout: `bucket=<pmod(xxhash64(id), n)>`
    * directories; a change only ever lands in its key's bucket, so
    * the merge reads and rewrites exactly the buckets containing
    * changed keys (partition pruning on the scan; the touched-bucket
    * list is ≤ n values collected to the driver) and every other
    * bucket's files are NEVER opened. At 100 TB with n sized so a
    * bucket is a few GB, a routine delta rewrites a handful of
    * bucket directories instead of the table.
    *
    * `changes` may carry a boolean `removed` column ([[applyDelta]]'s
    * tombstone contract); absent, every change row is an upsert.
    * Assumes ≤ one change per id per call (the OData delta contract).
    *
    * Crash safety mirrors [[overwriteViaSwap]], scoped to buckets:
    * the merged buckets materialize under `_next`, live bucket dirs
    * are set aside under `_old`, staged dirs promote, `_old` drops
    * last — a complete copy of every bucket exists on disk at every
    * instant; `_next` doubles as the commit marker (it drops first,
    * mandatorily, so leftover `_old` without `_next` is completed-
    * merge debris, never rolled back). A call interrupted mid-swap is
    * repaired on the NEXT call's entry ([[repairBuckets]]: promote a
    * staged copy where one exists, roll the set-aside copy back
    * otherwise), after which a
    * replay of the same change set lands the identical state — the
    * same replay-the-uncommitted-delta contract as
    * [[graft.pipeline.IncrementalSync]] (the cursor only advances
    * after a completed merge).
    *
    * The store records its bucket count in a `_graft_buckets` file
    * (underscore-prefixed → invisible to parquet reads); a later call
    * with a different `buckets` fails fast instead of silently
    * missing the buckets existing keys actually live in. */
  def bucketedUpsert(spark: SparkSession, changes: DataFrame, path: String,
      idCol: String, buckets: Int): Unit = {
    require(buckets > 0, "buckets must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasRemoved = changes.columns.contains("removed")
    def withBucket(df: DataFrame) =
      df.withColumn("bucket", pmod(xxhash64(col(idCol)), lit(buckets.toLong)))
    val upserts = if (hasRemoved) changes.filter(!col("removed")).drop("removed")
      else changes
    if (fs.exists(hPath)) repairBuckets(fs, path)
    if (!fs.exists(hPath) || !hasBucketDirs(fs, hPath)) {
      // absent store, or an empty shell left by a merge that
      // tombstoned every bucket: recreate from scratch. An
      // all-tombstone change set must not write a footerless empty
      // directory (which would brick reads) — leave the path absent
      if (fs.exists(hPath) && !fs.delete(hPath, true))
        throw new java.io.IOException(s"upsert: cannot clear empty shell $hPath")
      if (upserts.isEmpty) return
      withBucket(upserts).write.mode(SaveMode.Overwrite)
        .partitionBy("bucket").parquet(path)
      writeBucketMeta(fs, path, buckets)
      return
    }
    readBucketMeta(fs, path) match {
      case Some(n) => require(n == buckets,
        s"store at $path was built with $n buckets, called with $buckets")
      case None =>
        // pre-metadata store: before pinning the caller's count as
        // authoritative, check it against the on-disk layout — a
        // bucket id >= buckets proves the store was built wider, and
        // merging mod a smaller count would silently duplicate keys
        val maxB = fs.listStatus(hPath).map(_.getPath.getName)
          .filter(_.startsWith("bucket="))
          .map(_.stripPrefix("bucket=").toLong).max
        require(maxB < buckets,
          s"store at $path has bucket=$maxB on disk, called with $buckets buckets")
        writeBucketMeta(fs, path, buckets)
    }
    val ch = withBucket(changes).cache()
    try {
      val touched = ch.select("bucket").distinct()
        .collect().map(_.getLong(0)).sorted // bounded: <= `buckets` values
      if (touched.isEmpty) return
      val existing = spark.read.parquet(path)
        .filter(col("bucket").isin(touched: _*)) // partition-pruned scan
      val changedIds = ch.select(col(idCol))
      val merged = existing.join(changedIds, Seq(idCol), "left_anti")
        .unionByName(withBucket(upserts))
      val next = new org.apache.hadoop.fs.Path(path + "_next")
      val old = new org.apache.hadoop.fs.Path(path + "_old")
      merged.write.mode(SaveMode.Overwrite).partitionBy("bucket")
        .parquet(next.toString)
      if (fs.exists(old) && !fs.delete(old, true))
        throw new java.io.IOException(s"upsert: cannot clear $old")
      if (!fs.mkdirs(old))
        throw new java.io.IOException(s"upsert: cannot stage $old")
      touched.foreach { b =>
        val live = new org.apache.hadoop.fs.Path(path, s"bucket=$b")
        val staged = new org.apache.hadoop.fs.Path(next, s"bucket=$b")
        if (fs.exists(live) &&
            !fs.rename(live, new org.apache.hadoop.fs.Path(old, s"bucket=$b")))
          throw new java.io.IOException(s"upsert: cannot set aside $live")
        // a bucket can vanish entirely (all rows tombstoned): staged
        // dir absent is a valid outcome, the set-aside already removed it
        if (fs.exists(staged) && !fs.rename(staged, live))
          throw new java.io.IOException(s"upsert: cannot promote $staged")
      }
      // `_next` is the commit marker: it drops FIRST, and mandatorily —
      // repairBuckets rolls a set-aside bucket back only while `_next`
      // still exists, so "_old without _next" unambiguously means a
      // COMPLETED merge whose debris must never be rolled back (a
      // rollback there would resurrect buckets the merge legitimately
      // emptied, after the caller's cursor advanced)
      if (!fs.delete(next, true))
        throw new java.io.IOException(s"upsert: cannot clear $next")
      fs.delete(old, true) // best-effort; repair clears completed debris
      // a merge that tombstoned every bucket leaves an empty shell:
      // drop it so the store's empty form is "path absent", keeping
      // every future read and upsert on the defined entry paths
      if (!hasBucketDirs(fs, hPath) && !fs.delete(hPath, true))
        throw new java.io.IOException(s"upsert: cannot clear empty shell $hPath")
      ()
    } finally ch.unpersist()
  }

  private def bucketMetaPath(path: String) =
    new org.apache.hadoop.fs.Path(path, "_graft_buckets")

  private def writeBucketMeta(fs: org.apache.hadoop.fs.FileSystem,
      path: String, buckets: Int): Unit = {
    val out = fs.create(bucketMetaPath(path), true)
    try out.write(buckets.toString.getBytes("UTF-8")) finally out.close()
  }

  private def readBucketMeta(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[Int] = {
    val p = bucketMetaPath(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        // read fully (a single read() may return short on some
        // filesystems); an empty or non-numeric file — a write torn
        // between create and write — counts as absent, which routes
        // through the pre-metadata validation and a clean rewrite
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        val s = bytes.toString("UTF-8").trim
        if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toInt) else None
      } finally in.close()
    }
  }

  /** Restore a [[bucketedUpsert]] interrupted mid-swap to a per-bucket
    * consistent state: every bucket set aside under `_old` but missing
    * live gets its staged `_next` copy promoted (completing that
    * bucket's swap) or, when no staged copy exists, its `_old` copy
    * rolled back; staging debris then drops. Each bucket ends fully
    * pre- or fully post-merge — either way a replay of the interrupted
    * change set (the caller's contract) converges to the committed
    * state, because the merge is idempotent per key. */
  private def repairBuckets(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val next = new org.apache.hadoop.fs.Path(path + "_next")
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    // `_next` still on disk = the interrupted call never reached its
    // commit point (the merge deletes `_next` first, mandatorily).
    // `_old` WITHOUT `_next` = debris of a COMPLETED merge whose
    // best-effort cleanup failed: restoring from it would resurrect
    // buckets that merge legitimately emptied — only delete it.
    val midSwap = fs.exists(next)
    if (fs.exists(old)) {
      if (midSwap) {
        fs.listStatus(old).filter(s => s.isDirectory &&
            s.getPath.getName.startsWith("bucket=")).foreach { s =>
          val live = new org.apache.hadoop.fs.Path(path, s.getPath.getName)
          if (!fs.exists(live)) {
            val staged = new org.apache.hadoop.fs.Path(next, s.getPath.getName)
            val src = if (fs.exists(staged)) staged else s.getPath
            if (!fs.rename(src, live))
              throw new java.io.IOException(s"upsert repair: cannot restore $live")
          }
        }
      }
      if (!fs.delete(old, true))
        throw new java.io.IOException(s"upsert repair: cannot clear $old")
    }
    if (midSwap && !fs.delete(next, true))
      throw new java.io.IOException(s"upsert repair: cannot clear $next")
  }

  private def hasBucketDirs(fs: org.apache.hadoop.fs.FileSystem,
      hPath: org.apache.hadoop.fs.Path): Boolean =
    fs.listStatus(hPath).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("bucket="))

  /** Restore a swap interrupted between set-aside and promote: the
    * live path is missing but a complete `_old` copy exists. Call
    * before reading a swap-maintained table. No-op when healthy. */
  def recoverSwap(spark: SparkSession, path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath) && fs.exists(old) && !fs.rename(old, hPath))
      throw new java.io.IOException(
        s"swap recovery: cannot restore $old to $hPath")
  }

  /** O15 variant — JDBC snapshot: truncate-overwrite into a relational
    * store, the closest analog of the reference's TVP+sproc load
    * (MD-SQL:98-181) when the target stays a SQL database. Same trait
    * shape as the parquet sink; spec-tested against embedded Derby. */
  def jdbcSnapshot(df: DataFrame, url: String, table: String,
      props: java.util.Properties, loadTime: Timestamp): Unit =
    df.withColumn("timeGenerated", lit(loadTime))
      .write.mode(SaveMode.Overwrite)
      .option("truncate", "true")   // preserve DDL, delete+insert semantics
      .jdbc(url, table, props)

  /** O18 — surrogate key. `monotonically_increasing_id` is the
    * scale-correct choice (no shuffle, no driver bottleneck);
    * `contiguous=true` reproduces the reference's IDENTITY(1,1)
    * contiguity via a global row_number — a single-partition sort,
    * acceptable only for dimension-sized outputs. */
  def withSurrogateKey(df: DataFrame, keyCol: String = "ClusterID",
      orderBy: String = "id", contiguous: Boolean = false): DataFrame =
    if (contiguous)
      df.withColumn(keyCol,
        row_number().over(Window.orderBy(col(orderBy))).cast("long"))
    else df.withColumn(keyCol, monotonically_increasing_id())
}
