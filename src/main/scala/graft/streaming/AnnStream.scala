package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.similarity.Ann

/** Streaming ingest for the ANN serving index: embedding files landing
  * in a directory are assigned to coarse IVF cells per micro-batch and
  * persisted as a CELL-PARTITIONED parquet index, so that
  *  1. ingest COMPUTE scales with the BATCH (quantize + k-way argmin
  *     per row against broadcast-literal centroids — no shuffle of
  *     the corpus, no re-quantization of committed vectors; the one
  *     index-sized touch per batch is the column-pruned id scan that
  *     guards against re-sent ids, measured flat-in-practice by
  *     tools.IngestProbe), and
  *  2. a serve-time query reads ONLY the probed cells' files
  *     (partition-directory pruning on `cell=`), i.e. query cost is
  *     proportional to the probed inverted lists, never the corpus —
  *     the property that makes an IVF index useful at 100 TB.
  *
  * The coarse quantizer is TRAINED ON THE FIRST ARRIVAL SLICE and then
  * FROZEN ([[Ann.portableKmeansCentroids]] on batch 0, stored beside
  * the index): the standard practice for a corpus that cannot be
  * rescanned — train on a sample, freeze, assign everything after.
  * Because later batches never move the centroids, cell assignment is
  * a pure per-row function once batch 0 commits, and the accumulated
  * index equals the batch build "train on slice 0, assign the whole
  * corpus" for ANY arrival split of the remaining data — which is what
  * lets a driver query verify the streamed index against a one-shot
  * batch oracle (s13).
  *
  * Crash safety as [[DedupStream.processBatch]]: every write is a
  * per-batch overwrite of a deterministic function of the committed
  * prefix. A replay of batch 0 retrains on the identical batch (exact
  * integer Lloyd's — bit-identical centroids) and overwrites; a replay
  * of batch N > 0 reads the frozen centroids and overwrites its own
  * `batch_id=N` directory.
  */
object AnnStream {

  /** Persist trained centroids as `(cell, c)` rows — the model object
    * (k·dim longs), one file — through the rename-aside swap, so a
    * serve or batch-N replay reading concurrently with a batch-0
    * replay's rewrite always sees a complete model on disk (the same
    * discipline [[publishIndex]] applies to the index tree). */
  def writeCentroids(spark: SparkSession, cents: Seq[Array[Long]],
      path: String): Unit = {
    import spark.implicits._
    graft.operators.Sinks.recoverSwap(spark, path)
    graft.operators.Sinks.overwriteViaSwap(spark,
      cents.zipWithIndex.map { case (c, j) => (j.toLong, c.toSeq) }
        .toDF("cell", "c")
        .coalesce(1),
      path)
  }

  /** Load frozen centroids back as the literal model object (repairing
    * a crashed swap first — recoverable state, the bucketedUpsert
    * read-path pattern). */
  def readCentroids(spark: SparkSession, path: String): Seq[Array[Long]] = {
    graft.operators.Sinks.recoverSwap(spark, path)
    spark.read.parquet(path)
      .orderBy("cell")
      .select("c")
      .collect()
      .map(_.getSeq[Long](0).toArray)
      .toSeq
  }

  /** One micro-batch of the IVF index ingest — exposed for direct
    * (batch-mode) use and testing. Batch 0 trains and freezes the
    * coarse quantizer; every batch assigns its vectors under the
    * frozen centroids and writes `(idCol, q, cell)` rows to
    * `indexPath/batch_id=N/cell=M/`, cell-partitioned for serve-time
    * directory pruning. */
  def processIvfBatch(batch: DataFrame, batchId: Long, indexPath: String,
      centroidsPath: String, idCol: String, vecCol: String, dim: Int,
      cells: Int, iters: Int, salt: String = "pkmeans"): Unit = {
    val spark = batch.sparkSession
    val cents =
      if (batchId == 0L) {
        val c = Ann.portableKmeansCentroids(batch, idCol, vecCol, dim,
          cells, iters, salt)
        writeCentroids(spark, c, centroidsPath)
        c
      } else readCentroids(spark, centroidsPath)
    // ingest contract: ids identify vectors — a row re-sent under an
    // already-indexed id (across OR within a batch) is the same
    // vector, not a new one, and a duplicate index row would shift
    // serve-time ranks. Cross-batch protection is one column-pruned
    // id scan of the committed index; within-batch, dropDuplicates
    // (deterministic under the same-id-same-payload contract).
    val committed = committedIds(spark, indexPath, idCol,
      batch.schema(idCol).dataType, batchId)
    val fresh = batch.dropDuplicates(idCol)
      .join(committed, Seq(idCol), "left_anti")
    Ann.portableAssignWithCentroids(fresh, idCol, vecCol, cents)
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$indexPath/batch_id=$batchId")
  }

  /** Ids of all PRIOR batches' index rows (a partial `batch_id=batchId`
    * dir from a crashed attempt is excluded — it is this attempt's
    * output, about to be overwritten). Empty frame if no index yet.
    * The schema is EXPLICIT: a crashed batch-0 attempt can leave the
    * index dir existing with zero committed data files, and schema
    * inference would throw on every replay — with the schema given,
    * an empty tree reads as an empty frame and the replay proceeds. */
  private def committedIds(spark: SparkSession, indexPath: String,
      idCol: String, idType: DataType, batchId: Long): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = StructType(Seq(
      StructField(idCol, idType),
      StructField("q", ArrayType(LongType)),
      StructField("cell", LongType),
      StructField("batch_id", LongType)))
    if (fs.exists(hPath))
      spark.read.schema(schema).parquet(indexPath)
        .filter(col("batch_id") < batchId)
        .select(col(idCol))
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(idCol, idType))))
  }

  /** Run the IVF index build as a stream over parquet embedding files
    * landing in `vecsDir`. Returns the running query (caller stops). */
  def ivfIngest(spark: SparkSession, vecsDir: String, schema: StructType,
      indexPath: String, centroidsPath: String, checkpointDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, cells: Int = 8, iters: Int = 2,
      salt: String = "pkmeans", maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(vecsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processIvfBatch(batch, batchId, indexPath, centroidsPath,
          idCol, vecCol, dim, cells, iters, salt)
      }
      .start()

  /** Publish the streamed per-batch index as the SERVING layout: the
    * crash-safe `batch_id=N/cell=M` ingest tree is folded into
    * `cell=M` alone — one shuffle by cell co-locates whole inverted
    * lists, so a serve-time probe reads ONE file per probed cell
    * instead of one per (batch × cell). This is the small-files
    * lifecycle for an ingest-built index at 100 TB: per-batch dirs
    * give crash safety during ingest, a periodic publish folds them
    * into the read-optimized tree (idempotent overwrite — republish
    * after more batches lands the same way). Row set is identical to
    * the raw tree, so [[ivfServeTopK]] answers match bit-for-bit
    * from either layout (AnnStreamSpec pins both the equality and
    * the per-cell file count). Republish goes through the crash-safe
    * rename-aside swap ([[graft.operators.Sinks.overwriteViaSwap]])
    * so a complete serving tree exists on disk at every instant. */
  def publishIndex(spark: SparkSession, indexPath: String,
      servingPath: String): Unit = {
    graft.operators.Sinks.recoverSwap(spark, servingPath)
    graft.operators.Sinks.overwriteViaSwap(spark,
      spark.read.parquet(indexPath)
        .drop("batch_id")
        .repartition(col("cell")), // whole cells co-locate → 1 file/cell
      servingPath, Seq("cell"))
  }

  /** Serve exact-integer top-k from the STORED index: assign the query
    * set under the frozen centroids, then scan ONLY the probed cells'
    * partition directories (`cell IN (...)` is a literal predicate on
    * the partition column — the file index prunes every other cell
    * before a byte is read) and rank by exact integer squared L2
    * ([[Ann.integerTopK]]: index side never shuffles before ranking,
    * queries broadcast). The driver holds the probed cell ids — at
    * most `nprobe` per query, model-sized. `nprobe` is the
    * recall/read-cost knob: each extra probed cell adds one inverted
    * list to the scan and can only improve the candidate set
    * (a corpus row lives in exactly one cell, so probing more cells
    * never duplicates a candidate). */
  def ivfServeTopK(spark: SparkSession, indexPath: String,
      centroidsPath: String, queries: DataFrame, idCol: String,
      vecCol: String, topK: Int, nprobe: Int = 1): DataFrame = {
    val cents = readCentroids(spark, centroidsPath)
    val q = Ann.portableQueryCells(queries, idCol, vecCol, cents, nprobe)
    val probed = q.select("cell").distinct()
      .collect().map(_.getLong(0)) // ≤ nprobe per query
    val index = spark.read.parquet(indexPath)
      .filter(col("cell").isin(probed: _*))
      .select(col(idCol), col("q"), col("cell").cast(LongType).as("cell"))
    Ann.integerTopK(index, q, idCol, "cell", topK)
  }
}
