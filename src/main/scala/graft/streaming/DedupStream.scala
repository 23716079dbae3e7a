package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType
import graft.dedup.Dedup

/** Streaming ingest dedup: document files landing in a directory are
  * deduplicated per micro-batch against a persistent MinHash signature
  * index ([[Dedup.minhashIndex]] rows stored as parquet), so each
  * round's work scales with the BATCH, never the corpus — re-shingling
  * 100 TB per ingest round is replaced by one scan of precomputed
  * signatures plus O(batch) hashing.
  *
  * Per micro-batch:
  *  1. near-dup pairs touching the batch come from
  *     [[Dedup.minhashLshPairsFromIndexes]] against the committed
  *     index (prior batches' signature partitions);
  *  2. batch docs resolve to SURVIVORS by cluster: any cluster that
  *     contains an indexed doc keeps the indexed representative (the
  *     whole batch side drops); a cluster of only new docs keeps its
  *     minimum id. Cluster resolution reuses
  *     [[Dedup.duplicateClusters]] over the batch-touching pair graph
  *     only — a tiny fraction of the batch;
  *  3. pairs, surviving docs, AND the survivors' signatures are all
  *     written to per-batch `batch_id=N` directories, each with
  *     overwrite semantics.
  *
  * Crash safety follows from every write being a per-batch overwrite
  * of a deterministic function of the committed prefix: a replay of
  * batch N reads the index as partitions `batch_id < N` (a partial
  * `batch_id=N` dir from the crashed attempt is excluded, then
  * overwritten), recomputes identical outputs, and overwrites them in
  * place. No append, no commit marker, no cross-batch mutation.
  */
object DedupStream {

  /** Index schema for an empty store: (idCol, shh, sig). The id field
    * takes the CALLER's id type (string ids are supported everywhere
    * else in the dedup framework, so the bootstrap batch must not
    * coerce them to long). */
  private def emptyIndex(spark: SparkSession, idCol: String,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField(idCol, idType),
      StructField("shh", ArrayType(LongType)),
      StructField("sig", ArrayType(LongType))))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Compact a committed per-batch index tree: fold every partition
    * with `batch_id <= upToBatch` into ONE `batch_id=upToBatch`
    * directory. This is the dedup-side small-files lifecycle (the
    * counterpart of [[AnnStream.publishIndex]] for the serving tree):
    * per-batch dirs give crash safety DURING ingest, but at a real
    * cadence the committed prefix becomes thousands of tiny
    * partitions that every batch's index scan must open — a periodic
    * compaction folds the prefix into one partition while preserving
    * the replay discipline exactly, because a replayed batch N >
    * upToBatch still reads `batch_id < N`, which selects the folded
    * dir's identical row set, and still overwrites only its own dir.
    *
    * `upToBatch` must be a COMMITTED bound and the call must not race
    * an in-flight batch `<= upToBatch` (the [[AnnStream.publishIndex]]
    * contract — in practice: compact from the foreachBatch body or a
    * quiesced maintenance window). Works on any of the three index
    * shapes (MinHash signatures, 64-bit signatures, embeddings) —
    * the fold is shape-agnostic.
    *
    * Crash safety: the folded rows stage under `<path>_cnext`; a
    * `_STAGED_<upToBatch>` marker commits the staging; source dirs
    * drop only after the marker exists; the staged dir promotes to
    * `batch_id=<upToBatch>` last. [[repairCompaction]] (run on entry
    * here AND by every index load) rolls an interrupted compaction
    * forward (marker present: the staged fold IS the committed
    * prefix) or back (no marker: sources are intact, the partial
    * stage drops). */
  def compactIndex(spark: SparkSession, indexPath: String,
      upToBatch: Long, partitionCols: Seq[String] = Nil): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    repairCompaction(fs, indexPath)
    if (!fs.exists(hPath)) return
    val ids = fs.listStatus(hPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName.stripPrefix("batch_id=").toLong)
      .filter(_ <= upToBatch)
    if (ids.length <= 1) return // nothing to fold
    // all-empty prefix (every batch dropped everything): no rows to
    // fold and nothing for schema inference to read — leave the
    // (cheap, data-free) dirs alone
    def hasParquet(p: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(p).exists { s =>
        if (s.isDirectory) hasParquet(s.getPath)
        else s.getPath.getName.endsWith(".parquet")
      }
    if (!ids.exists(n =>
      hasParquet(new org.apache.hadoop.fs.Path(hPath, s"batch_id=$n"))))
      return
    val tgt = ids.max
    val next = new org.apache.hadoop.fs.Path(indexPath + "_cnext")
    if (fs.exists(next) && !fs.delete(next, true))
      throw new java.io.IOException(s"compact: cannot clear $next")
    val folded = spark.read.parquet(indexPath)
      .filter(col("batch_id") <= tgt)
      .drop("batch_id")
    // sub-partitioned trees (the ANN raw tree's batch_id=N/cell=M) keep
    // their inner layout: shuffle by the partition keys so each folded
    // sub-dir is one file — the read path's pruning contract survives
    val writer = (if (partitionCols.isEmpty)
        folded.coalesce(math.max(1, ids.length / 8)) // ~8 batch dirs/file
      else folded.repartition(partitionCols.map(col): _*))
      .write.mode(SaveMode.Overwrite)
    (if (partitionCols.isEmpty) writer
     else writer.partitionBy(partitionCols: _*))
      .parquet(next.toString)
    fs.create(new org.apache.hadoop.fs.Path(next, s"_STAGED_$tgt")).close()
    promoteCompaction(fs, indexPath, next, tgt)
  }

  /** The commit half of [[compactIndex]] — also the roll-forward of
    * [[repairCompaction]]: drop every source dir the staged fold
    * subsumes, then promote the stage to `batch_id=<tgt>`. */
  private def promoteCompaction(fs: org.apache.hadoop.fs.FileSystem,
      indexPath: String, next: org.apache.hadoop.fs.Path,
      tgt: Long): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(indexPath)
    fs.listStatus(hPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .filter(_.getPath.getName.stripPrefix("batch_id=").toLong <= tgt)
      .foreach { s =>
        if (!fs.delete(s.getPath, true))
          throw new java.io.IOException(s"compact: cannot drop ${s.getPath}")
      }
    fs.delete(new org.apache.hadoop.fs.Path(next, s"_STAGED_$tgt"), false)
    if (!fs.rename(next,
        new org.apache.hadoop.fs.Path(hPath, s"batch_id=$tgt")))
      throw new java.io.IOException(s"compact: cannot promote $next")
  }

  /** Repair an interrupted [[compactIndex]]: a `_cnext` stage with
    * its `_STAGED_<tgt>` marker is a COMPLETE fold of the committed
    * prefix — roll forward (the crashed call may already have
    * dropped some source dirs, so the stage is the only full copy);
    * without the marker the sources are untouched — roll back by
    * dropping the partial stage. Cheap for every index load to call:
    * one existence check when no compaction ever ran. */
  private def repairCompaction(fs: org.apache.hadoop.fs.FileSystem,
      indexPath: String): Unit = {
    val next = new org.apache.hadoop.fs.Path(indexPath + "_cnext")
    if (!fs.exists(next)) return
    val marker = fs.listStatus(next).toSeq
      .map(_.getPath.getName).find(_.startsWith("_STAGED_"))
    marker match {
      case Some(m) =>
        promoteCompaction(fs, indexPath, next, m.stripPrefix("_STAGED_").toLong)
      case None =>
        if (!fs.delete(next, true))
          throw new java.io.IOException(s"compact repair: cannot clear $next")
    }
  }

  /** The committed index as seen by batch `batchId`: signature
    * partitions of all PRIOR batches. A partial `batch_id=batchId`
    * dir left by a crashed attempt is excluded — it is this attempt's
    * output, about to be overwritten. The schema is EXPLICIT: a
    * crashed batch-0 attempt can leave the index dir existing with
    * zero committed data files, and schema inference would throw on
    * every replay — with the schema given, an empty tree reads as an
    * empty frame and the replay proceeds. */
  private def loadIndex(spark: SparkSession, path: String, idCol: String,
      idType: org.apache.spark.sql.types.DataType, batchId: Long): DataFrame = {
    import org.apache.spark.sql.types._
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    repairCompaction(fs, path)
    val schema = StructType(Seq(
      StructField(idCol, idType),
      StructField("shh", ArrayType(LongType)),
      StructField("sig", ArrayType(LongType)),
      StructField("batch_id", LongType)))
    if (fs.exists(hPath))
      spark.read.schema(schema).parquet(path)
        .filter(col("batch_id") < batchId)
        .select(col(idCol), col("shh"), col("sig"))
    else emptyIndex(spark, idCol, idType)
  }

  /** One micro-batch of the ingest — exposed for direct (batch-mode)
    * use and testing. */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
      pairsPath: String, survivorsPath: String, idCol: String,
      textCol: String, n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    val index =
      loadIndex(spark, indexPath, idCol, batch.schema(idCol).dataType, batchId)
        .cache()
    // ingest contract: ids identify documents — a doc re-sent under an
    // already-indexed id (across OR within a batch) is the same
    // document, not a new one (within-batch dropDuplicates is
    // deterministic under the same-id-same-payload contract)
    val fresh = batch.dropDuplicates(idCol)
      .join(index.select(col(idCol)), Seq(idCol), "left_anti")
      .cache()
    val newIdx = Dedup.minhashIndex(fresh, idCol, textCol, n, k).cache()
    val pairs = Dedup
      .minhashLshPairsFromIndexes(index, newIdx, idCol, k, bands, threshold)
      .cache()

    // resolve survivors over the batch-touching pair graph: the graph's
    // nodes are the batch plus only the indexed docs that appear in a
    // pair (never the whole index)
    val newIds = fresh.select(col(idCol))
    val touchedOld = pairs.select(col("a_id").as(idCol))
      .unionByName(pairs.select(col("b_id").as(idCol)))
      .distinct()
      .join(newIds, Seq(idCol), "left_anti")
    val nodes = newIds.withColumn("is_new", lit(true))
      .unionByName(touchedOld.withColumn("is_new", lit(false)))
    val roots = Dedup.duplicateClusters(nodes, idCol, pairs)
      .join(nodes, col("id") === col(idCol)).select("id", "root", "is_new")
    // Survivor rule as ONE per-root aggregation (a cluster with any
    // indexed member keeps the indexed representative — the whole
    // batch side drops; an only-new cluster keeps its minimum id), so
    // no window functions run over the node frame. Cached: BOTH
    // per-batch outputs (survivor docs, survivor signatures) semi-join
    // against this frame — uncached, the whole cluster-resolution
    // chain (distinct + anti-join + union-find + this aggregation)
    // would run once per write.
    val survivorIds = roots
      .groupBy("root")
      .agg(max(when(!col("is_new"), 1).otherwise(0)).as("has_old"),
        min(when(col("is_new"), col("id"))).as("min_new"))
      .filter(col("has_old") === 0)
      .select(col("min_new").as(idCol))
      .cache()

    // materialize every cached frame ONCE (survivorIds sits downstream
    // of them all), then the three writes share computed caches
    // instead of racing to build them
    survivorIds.count()
    // per-batch output dirs: every write is an idempotent overwrite of
    // a deterministic function of the committed prefix, with NO
    // ordering requirement among the three (a replay recomputes all)
    // — so they run CONCURRENTLY and the batch pays the slowest
    // write's wall, not the sum
    concurrently(
      () => pairs.write.mode(SaveMode.Overwrite)
        .parquet(s"$pairsPath/batch_id=$batchId"),
      () => fresh.join(survivorIds, Seq(idCol), "left_semi")
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$survivorsPath/batch_id=$batchId"),
      () => newIdx.join(survivorIds, Seq(idCol), "left_semi")
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$indexPath/batch_id=$batchId"))

    Seq(index, fresh, newIdx, pairs, survivorIds).foreach(_.unpersist())
  }

  /** Run independent per-batch writes concurrently: each is an
    * idempotent per-batch overwrite with no ordering requirement (a
    * crash anywhere leaves a replay that recomputes and overwrites
    * them all), so the batch pays the SLOWEST write's wall instead of
    * the sum. Callers materialize shared cached inputs first (one
    * count) so the concurrent jobs read computed caches instead of
    * racing to build them. Failures propagate: every write is awaited
    * and the first failure rethrows. */
  private def concurrently(writes: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    writes.map(w => Future(w())).foreach(Await.result(_, Duration.Inf))
  }

  /** The in-stream compaction cadence shared by every ingest entry
    * point: after batch N commits its writes, fold the index prefix
    * `batch_id <= N-1`. Inside foreachBatch the prior prefix is
    * quiescent BY CONSTRUCTION (no concurrent batch), satisfying
    * [[compactIndex]]'s contract with no coordination; and the bound
    * is N-1, NOT N, so a crash between compaction and the stream's
    * checkpoint commit replays batch N against a tree whose
    * `batch_id < N` read still selects the full committed prefix
    * (the folded `batch_id=N-1` dir) — folding N itself would hide
    * the fold from its own replay. */
  private def maybeCompact(spark: SparkSession, indexPath: String,
      batchId: Long, compactEvery: Option[Int],
      partitionCols: Seq[String] = Nil): Unit =
    compactEvery.filter(n => batchId > 0 && batchId % n == 0)
      .foreach(_ => compactIndex(spark, indexPath, batchId - 1, partitionCols))

  /** Run the ingest as a stream over parquet document files landing in
    * `docsDir`. Returns the running query (caller stops).
    * `compactEvery = Some(n)` folds the committed index prefix every n
    * batches ([[maybeCompact]]) — the small-files cadence for a
    * long-running ingest. */
  def dedupIngest(spark: SparkSession, docsDir: String, schema: StructType,
      indexPath: String, pairsPath: String, survivorsPath: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, maxFilesPerTrigger: Int = 8,
      compactEvery: Option[Int] = None): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, pairsPath, survivorsPath,
          idCol, textCol, n, k, bands, threshold)
        maybeCompact(batch.sparkSession, indexPath, batchId, compactEvery)
      }
      .start()

  /** One micro-batch of the CONTAINMENT ingest — the quote/inclusion
    * REPORT run at ingest time: the batch is scored against the
    * committed signature index with
    * [[Dedup.minhashContainmentPairsFromIndexes]] (directed pairs
    * touching the batch, exact-verified after band blocking), the
    * pairs land in a per-batch partition, and the batch's signatures
    * join the index UNFILTERED — containment is a report, not a
    * survivor rule, so every document stays probe-able by later
    * arrivals (a future doc can contain, or sit inside, any prior
    * one).
    *
    * The accumulated pair set is BATCH-SPLIT-INVARIANT: an unordered
    * pair is emitted exactly once — in the batch where its later
    * member arrives (same-batch pairs once, by the candidate join's
    * id ordering) — and the band collisions that gate candidacy are
    * computed from per-document signatures that do not depend on
    * batching. So the union over any micro-batch partitioning of the
    * corpus equals [[Dedup.minhashContainmentPairs]] run once over
    * the whole corpus, which is what lets a driver query verify the
    * streamed ingest against the BATCH oracle.
    *
    * Crash safety as [[processBatch]]: every write is a per-batch
    * overwrite of a deterministic function of the committed prefix. */
  def processContainmentBatch(batch: DataFrame, batchId: Long,
      indexPath: String, pairsPath: String, idCol: String,
      textCol: String, n: Int = 3, k: Int = 64, bands: Int = 32,
      threshold: Double = 0.8,
      maxBucketSize: Option[Int] = None): Unit = {
    val spark = batch.sparkSession
    val index =
      loadIndex(spark, indexPath, idCol, batch.schema(idCol).dataType, batchId)
        .cache()
    // ingest contract: ids identify documents — a doc re-sent under an
    // already-indexed id (across OR within a batch) is the same
    // document, not a new one (within-batch dropDuplicates is
    // deterministic under the same-id-same-payload contract)
    val fresh = batch.dropDuplicates(idCol)
      .join(index.select(col(idCol)), Seq(idCol), "left_anti")
      .cache()
    val newIdx = Dedup.minhashIndex(fresh, idCol, textCol, n, k).cache()
    val pairs = Dedup.minhashContainmentPairsFromIndexes(index, newIdx,
      idCol, k, bands, threshold, maxBucketSize)
    newIdx.count() // materialize the shared caches once (see concurrently)
    concurrently(
      () => pairs.write.mode(SaveMode.Overwrite)
        .parquet(s"$pairsPath/batch_id=$batchId"),
      () => newIdx.write.mode(SaveMode.Overwrite)
        .parquet(s"$indexPath/batch_id=$batchId"))
    Seq(index, fresh, newIdx).foreach(_.unpersist())
  }

  /** One micro-batch of the 64-bit-SIGNATURE ingest — the generic
    * chunk-collision near-dup monitor (SimHash text signatures,
    * perceptual image hashes — any 64-bit fingerprint) run at ingest
    * time: the batch's signatures are scored against the committed
    * signature index with [[Dedup.hammingPairsFromIndexes]] (pairs
    * touching the batch, exact `bit_count(xor)` verify after chunk
    * blocking), the pairs land in a per-batch partition, and the
    * batch's signatures join the index. The expensive part of an
    * image corpus — decode + hash — runs ONCE, in the arrival batch
    * (the caller's `toSignatures` stage); the stored index is 16
    * bytes a row. Batch-split invariance and crash safety exactly as
    * [[processContainmentBatch]]. */
  def processSignatureBatch(sigs: DataFrame, batchId: Long,
      indexPath: String, pairsPath: String, idCol: String,
      sigCol: String, maxHamming: Int = 3,
      maxBucketSize: Option[Int] = None): Unit = {
    val spark = sigs.sparkSession
    val index =
      loadSigIndex(spark, indexPath, idCol, sigs.schema(idCol).dataType,
        batchId).cache()
    // ingest contract: ids identify media — re-sent ids (across or
    // within a batch) are not new items
    val fresh = sigs.dropDuplicates(idCol)
      .join(index.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), col(sigCol).as("sig"))
      .cache()
    val pairs = Dedup.hammingPairsFromIndexes(index, fresh, idCol, "sig",
      maxHamming, maxBucketSize)
    fresh.count() // materialize the shared caches once (see concurrently)
    concurrently(
      () => pairs.write.mode(SaveMode.Overwrite)
        .parquet(s"$pairsPath/batch_id=$batchId"),
      () => fresh.write.mode(SaveMode.Overwrite)
        .parquet(s"$indexPath/batch_id=$batchId"))
    Seq(index, fresh).foreach(_.unpersist())
  }

  /** One micro-batch of the EMBEDDING near-dup ingest — the fourth
    * dedup family's ingest-time path (MinHash → [[processBatch]],
    * containment → [[processContainmentBatch]], 64-bit signatures →
    * [[processSignatureBatch]]; this one is d05/d12's cosine relation
    * over a block key): the batch's vectors get their block key from
    * the caller's `blockOf` column function (which must be a PURE
    * per-row function of the vector), near-dup pairs
    * touching the batch come from
    * [[Dedup.embeddingNearDupPairsFromIndexes]] against the committed
    * `(id, vec, block)` index (block join's right side = the batch),
    * pairs land in a per-batch partition, and the batch's rows join
    * the index. Because the block key is a pure function of the
    * vector, the accumulated pair set is BATCH-SPLIT-INVARIANT (a row
    * lives in one block; a pair emits once, where its later member
    * arrives) — the union over any arrival split equals the one-shot
    * intra-block self-join, which is what the driver oracle checks.
    * Crash safety exactly as [[processBatch]]: per-batch overwrites
    * of deterministic functions of the committed prefix. */
  def processEmbeddingBatch(batch: DataFrame, batchId: Long,
      indexPath: String, pairsPath: String, idCol: String, vecCol: String,
      blockOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      threshold: Double): Unit = {
    val spark = batch.sparkSession
    val index = loadEmbIndex(spark, indexPath, idCol,
      batch.schema(idCol).dataType, batch.schema(vecCol).dataType, vecCol,
      batchId).cache()
    // ingest contract: ids identify vectors — re-sent ids (across or
    // within a batch) are not new items
    val fresh = batch.dropDuplicates(idCol)
      .join(index.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), col(vecCol), blockOf(col(vecCol)).as("block"))
      .cache()
    val pairs = Dedup.embeddingNearDupPairsFromIndexes(index, fresh,
      idCol, vecCol, "block", threshold)
    fresh.count() // materialize the shared caches once (see concurrently)
    concurrently(
      () => pairs.write.mode(SaveMode.Overwrite)
        .parquet(s"$pairsPath/batch_id=$batchId"),
      () => fresh.write.mode(SaveMode.Overwrite)
        .parquet(s"$indexPath/batch_id=$batchId"))
    Seq(index, fresh).foreach(_.unpersist())
  }

  /** The committed embedding index for batch `batchId` (prior batches
    * only; explicit schema — the [[loadIndex]] crash-debris rule). */
  private def loadEmbIndex(spark: SparkSession, path: String,
      idCol: String, idType: org.apache.spark.sql.types.DataType,
      vecType: org.apache.spark.sql.types.DataType, vecCol: String,
      batchId: Long): DataFrame = {
    import org.apache.spark.sql.types._
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    repairCompaction(fs, path)
    val schema = StructType(Seq(
      StructField(idCol, idType),
      StructField(vecCol, vecType),
      StructField("block", LongType),
      StructField("batch_id", LongType)))
    if (fs.exists(hPath))
      spark.read.schema(schema).parquet(path)
        .filter(col("batch_id") < batchId)
        .select(col(idCol), col(vecCol), col("block"))
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(idCol, idType),
          StructField(vecCol, vecType), StructField("block", LongType))))
  }

  /** Run the embedding near-dup monitor as a stream over parquet
    * files landing in `srcDir`. Returns the running query (caller
    * stops). */
  def embeddingIngest(spark: SparkSession, srcDir: String,
      schema: StructType, indexPath: String, pairsPath: String,
      checkpointDir: String, idCol: String, vecCol: String,
      blockOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      threshold: Double, maxFilesPerTrigger: Int = 1,
      compactEvery: Option[Int] = None): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processEmbeddingBatch(batch, batchId, indexPath, pairsPath,
          idCol, vecCol, blockOf, threshold)
        maybeCompact(batch.sparkSession, indexPath, batchId, compactEvery)
      }
      .start()

  /** The committed signature index for batch `batchId` (prior batches
    * only; explicit schema — the [[loadIndex]] crash-debris rule). */
  private def loadSigIndex(spark: SparkSession, path: String,
      idCol: String, idType: org.apache.spark.sql.types.DataType,
      batchId: Long): DataFrame = {
    import org.apache.spark.sql.types._
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    repairCompaction(fs, path)
    val schema = StructType(Seq(
      StructField(idCol, idType),
      StructField("sig", LongType),
      StructField("batch_id", LongType)))
    if (fs.exists(hPath))
      spark.read.schema(schema).parquet(path)
        .filter(col("batch_id") < batchId)
        .select(col(idCol), col("sig"))
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField(idCol, idType),
          StructField("sig", LongType))))
  }

  /** Run the signature near-dup monitor as a stream over parquet
    * files landing in `srcDir`: each micro-batch goes through the
    * caller's `toSignatures` stage (e.g. decode + perceptual hash for
    * images, SimHash for text) and then [[processSignatureBatch]].
    * Returns the running query (caller stops). */
  def signatureIngest(spark: SparkSession, srcDir: String,
      schema: StructType, indexPath: String, pairsPath: String,
      checkpointDir: String, idCol: String, sigCol: String,
      maxHamming: Int = 3, maxFilesPerTrigger: Int = 1,
      maxBucketSize: Option[Int] = None,
      compactEvery: Option[Int] = None)
      (toSignatures: DataFrame => DataFrame): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processSignatureBatch(toSignatures(batch), batchId, indexPath,
          pairsPath, idCol, sigCol, maxHamming, maxBucketSize)
        maybeCompact(batch.sparkSession, indexPath, batchId, compactEvery)
      }
      .start()

  /** Run the containment report as a stream over parquet document
    * files landing in `docsDir`. Returns the running query (caller
    * stops). */
  def containmentIngest(spark: SparkSession, docsDir: String,
      schema: StructType, indexPath: String, pairsPath: String,
      checkpointDir: String, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, k: Int = 64, bands: Int = 32,
      threshold: Double = 0.8, maxFilesPerTrigger: Int = 1,
      maxBucketSize: Option[Int] = None,
      compactEvery: Option[Int] = None): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processContainmentBatch(batch, batchId, indexPath, pairsPath,
          idCol, textCol, n, k, bands, threshold, maxBucketSize)
        maybeCompact(batch.sparkSession, indexPath, batchId, compactEvery)
      }
      .start()
}
