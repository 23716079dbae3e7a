package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.operators.Sinks
import graft.sources.ODataPageReader

/** Incremental sync as a stream: OData delta page documents arriving
  * in a directory (the object-store drop a poller writes) are treated
  * as a micro-batched change feed, and a parquet snapshot is kept
  * current by applying each micro-batch with [[Sinks.applyDelta]].
  *
  * Per-page independence makes this sound: the OData delta contract
  * coalesces to at most one change per id per round, so each page's
  * changes commute with the others and can be applied in any
  * micro-batch grouping.
  *
  * The snapshot rewrite swaps via rename-aside (`_next` written first,
  * current renamed to `_old`, `_next` promoted, `_old` dropped) so a
  * crash at any point leaves a complete copy on disk. A table format
  * with transactions (Delta/Iceberg) would replace the swap with a
  * MERGE commit; the parquet swap is the same semantics without the
  * format dependency.
  */
object DeltaStream {

  /** Streaming DataFrame of delta changes: parse page documents as
    * they land, explode `value[]`, surface tombstones as `removed`. */
  def readDeltaChanges(spark: SparkSession, pagesDir: String,
      valueSchema: StructType, maxFilesPerTrigger: Int = 1): DataFrame = {
    val deltaValueSchema = valueSchema.add(
      StructField(ODataPageReader.removedField,
        ODataPageReader.removedMarkerSchema))
    val pageSchema = StructType(Seq(
      StructField("value", ArrayType(deltaValueSchema))))
    spark.readStream.schema(pageSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("multiLine", "true")
      .json(pagesDir)
      .select(explode(col("value")).as("v")).select(col("v.*"))
      .withColumn("removed",
        col(ODataPageReader.removedField).isNotNull)
      .drop(ODataPageReader.removedField)
  }

  /** Maintain `snapshotPath` from the change stream: one applyDelta +
    * swap per micro-batch. Batching more pages per trigger
    * (`maxFilesPerTrigger`, default 1000 ≈ one listing round) directly
    * divides the number of snapshot rewrites — per-page application is
    * correct but pays one O(table) rewrite per page. Returns the
    * running query (caller stops). */
  def maintainSnapshot(spark: SparkSession, pagesDir: String,
      valueSchema: StructType, snapshotPath: String,
      checkpointDir: String, idCol: String = "id",
      maxFilesPerTrigger: Int = 1000): StreamingQuery =
    readDeltaChanges(spark, pagesDir, valueSchema, maxFilesPerTrigger)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (changes: DataFrame, _: Long) =>
        val s = changes.sparkSession
        val snap = currentSnapshot(s, snapshotPath, valueSchema)
        val merged = Sinks.applyDelta(snap, changes, idCol)
        Sinks.overwriteViaSwap(s, merged, snapshotPath)
      }
      .start()

  /** Current snapshot, RECOVERING from an interrupted swap first
    * (Sinks.recoverSwap). A missing live path with no `_old` is
    * genuinely the first batch (empty snapshot). */
  private def currentSnapshot(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    Sinks.recoverSwap(spark, path)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath))
      spark.read.schema(schema).parquet(path)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
  }
}
