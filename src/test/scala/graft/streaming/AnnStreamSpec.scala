package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import graft.similarity.Ann
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class AnnStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString

  private def emb = Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  /** Run the ingest with slice i landing as batch i. */
  private def ingest(slices: Int): (String, String) = {
    val vecsDir = tmp("as_vecs"); val indexPath = tmp("as_idx") + "/index"
    val centroidsPath = tmp("as_cen") + "/centroids"
    val ckpt = tmp("as_ckpt")
    val e = emb
    val write = (i: Int) => e.filter(pmod($"vec_id", lit(slices)) === i)
      .coalesce(1).write.mode("append").parquet(vecsDir)
    write(0)
    val q = AnnStream.ivfIngest(spark, vecsDir, e.schema, indexPath,
      centroidsPath, ckpt, dim = 64, cells = 8, iters = 2)
    try {
      q.processAllAvailable()
      (1 until slices).foreach { i => write(i); q.processAllAvailable() }
    } finally q.stop()
    (indexPath, centroidsPath)
  }

  test("streamed index + frozen quantizer equals the batch twin") {
    val e = emb.cache()
    val (indexPath, centroidsPath) = ingest(3)

    // batch twin: train on slice 0, freeze, assign everything
    val cents = Ann.portableKmeansCentroids(
      e.filter(pmod($"vec_id", lit(3)) === 0), "vec_id", "embedding",
      dim = 64, k = 8, iters = 2)
    assert(AnnStream.readCentroids(spark, centroidsPath)
      .map(_.toSeq) == cents.map(_.toSeq))

    val expected = Ann
      .portableAssignWithCentroids(e, "vec_id", "embedding", cents)
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toMap
    val stored = spark.read.parquet(indexPath)
      .select($"vec_id", $"cell".cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(stored == expected)
    // the index is genuinely multi-cell (the pruning claim is non-vacuous)
    assert(expected.values.toSet.size > 1)

    // served top-k equals the batch-composed search over the same cells
    val served = AnnStream.ivfServeTopK(spark, indexPath, centroidsPath,
        e.filter($"vec_id" < 10), "vec_id", "embedding", topK = 3)
      .select("query_id", "neighbor_id", "rank", "d2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val batchAssigned = Ann
      .portableAssignWithCentroids(e, "vec_id", "embedding", cents)
    val batchServed = Ann.integerTopK(batchAssigned,
        batchAssigned.filter($"vec_id" < 10)
          .select($"vec_id".as("query_id"), $"q".as("qv"), $"cell"),
        "vec_id", "cell", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(served == batchServed && served.nonEmpty)
  }

  test("serve reads only the probed cells' partition directories") {
    val (indexPath, centroidsPath) = ingest(3)
    val cents = AnnStream.readCentroids(spark, centroidsPath)
    val queries = emb.filter($"vec_id" < 10)
    val probed = Ann
      .portableAssignWithCentroids(queries, "vec_id", "embedding", cents)
      .select("cell").distinct().as[Long].collect().toSet
    val allCells = spark.read.parquet(indexPath)
      .select($"cell".cast("long")).distinct().as[Long].collect().toSet
    assert(probed.size < allCells.size,
      s"pruning test vacuous: queries probe all $allCells")

    val served = AnnStream.ivfServeTopK(spark, indexPath, centroidsPath,
      queries, "vec_id", "embedding", topK = 3)
    served.collect()
    // the executed index scan's partition count covers only probed
    // cells: numFiles ≤ batches × |probed| (one writer file per
    // cell dir per batch), strictly under the full layout's file count
    // the serve plan has exchanges, so under AQE the scans sit inside
    // QueryStageExec boundaries that TreeNode.collect does not cross
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        allScans(r.child)
    }.flatten
    val scans = allScans(served.queryExecution.executedPlan)
    val indexScan = scans.find(
      _.relation.location.rootPaths.exists(_.toString.contains("as_idx")))
    assert(indexScan.isDefined, s"no index scan among ${scans.size} scans")
    val filesRead = indexScan.get.metrics("numFiles").value
    val totalFiles = spark.read.parquet(indexPath).inputFiles.length
    assert(filesRead < totalFiles,
      s"no pruning: read $filesRead of $totalFiles")
    assert(filesRead <= 3L * probed.size)
  }

  test("nprobe widens the candidate set and never worsens the best hit") {
    val (indexPath, centroidsPath) = ingest(3)
    val queries = emb.filter($"vec_id" < 10)
    def serve(nprobe: Int) = AnnStream.ivfServeTopK(spark, indexPath,
        centroidsPath, queries, "vec_id", "embedding", topK = 3,
        nprobe = nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val one = serve(1); val two = serve(2)
    // nprobe=1 through the exploded path == the original single-cell
    // serve (the head of the cell ranking IS the argmin)
    val cents = AnnStream.readCentroids(spark, centroidsPath)
    val assigned = Ann.portableAssignWithCentroids(emb, "vec_id",
      "embedding", cents)
    val single = Ann.integerTopK(assigned,
        Ann.portableQueryCells(queries, "vec_id", "embedding", cents, 1),
        "vec_id", "cell", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(one.toSet == single.toSet)
    // per query: the rank-1 distance can only improve with more cells
    val best1 = one.filter(_._3 == 1L).map(t => t._1 -> t._4).toMap
    val best2 = two.filter(_._3 == 1L).map(t => t._1 -> t._4).toMap
    assert(best1.keySet == best2.keySet)
    best2.foreach { case (qid, d2) => assert(d2 <= best1(qid)) }
    // and for SOME query the second cell actually changed the answer
    // (non-vacuous on this corpus) or at least widened candidates:
    // two cells per query were probed
    val probedTwo = Ann.portableQueryCells(queries, "vec_id", "embedding",
      cents, 2).select("query_id", "cell").distinct().count()
    assert(probedTwo == 2 * queries.count())
  }

  test("publish folds the batch tree into one file per cell, answers unchanged") {
    val (indexPath, centroidsPath) = ingest(3)
    val servingPath = tmp("as_pub") + "/serving"
    AnnStream.publishIndex(spark, indexPath, servingPath)

    // pure relayout: identical row set, batch_id gone
    def rows(path: String) = spark.read.parquet(path)
      .select($"vec_id", $"cell".cast("long")).as[(Long, Long)]
      .collect().toSet
    assert(rows(servingPath) == rows(indexPath))
    assert(!spark.read.parquet(servingPath).columns.contains("batch_id"))

    // one file per inverted list vs one per (batch × cell)
    val pubFiles = spark.read.parquet(servingPath).inputFiles.length
    val rawFiles = spark.read.parquet(indexPath).inputFiles.length
    val nCells = rows(indexPath).map(_._2).size
    assert(pubFiles == nCells, s"$pubFiles files for $nCells cells")
    assert(pubFiles < rawFiles)

    // served answers are bit-identical from either layout
    val queries = emb.filter($"vec_id" < 10)
    def serve(path: String) = AnnStream.ivfServeTopK(spark, path,
        centroidsPath, queries, "vec_id", "embedding", topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(serve(servingPath) == serve(indexPath))

    // republish (the periodic-fold lifecycle) is an idempotent swap
    AnnStream.publishIndex(spark, indexPath, servingPath)
    assert(rows(servingPath) == rows(indexPath))
    assert(spark.read.parquet(servingPath).inputFiles.length == pubFiles)
  }

  test("replayed ingest batch is a committed no-op") {
    val e = emb.filter($"vec_id" < 200)
    val indexPath = tmp("asr_idx") + "/index"
    val centroidsPath = tmp("asr_cen") + "/centroids"
    val b0 = e.filter($"vec_id" % 2 === 0)
    val b1 = e.filter($"vec_id" % 2 === 1)
    AnnStream.processIvfBatch(b0, 0L, indexPath, centroidsPath,
      "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    AnnStream.processIvfBatch(b1, 1L, indexPath, centroidsPath,
      "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    def snapshot() = spark.read.parquet(indexPath)
      .select($"vec_id", $"cell".cast("long")).as[(Long, Long)]
      .collect().sorted.toSeq
    val first = snapshot()
    val cenFirst = AnnStream.readCentroids(spark, centroidsPath).map(_.toSeq)
    // replay batch 1 (the crash-recovery path): same rows, no growth
    AnnStream.processIvfBatch(b1, 1L, indexPath, centroidsPath,
      "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    assert(snapshot() == first)
    // replay batch 0: retrains on the identical batch — bit-identical
    // centroids (exact integer Lloyd's), index unchanged
    AnnStream.processIvfBatch(b0, 0L, indexPath, centroidsPath,
      "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    assert(snapshot() == first)
    assert(AnnStream.readCentroids(spark, centroidsPath).map(_.toSeq)
      == cenFirst)
  }

  test("a crashed first attempt (index dir exists, no data files) does not wedge the replay") {
    val e = emb.filter($"vec_id" < 100)
    val indexPath = tmp("asc_idx") + "/index"
    val centroidsPath = tmp("asc_cen") + "/centroids"
    // simulate the crash debris: the output tree was created but no
    // parquet file ever committed
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(indexPath, "batch_id=0", "_temporary"))
    AnnStream.processIvfBatch(e, 0L, indexPath, centroidsPath,
      "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    assert(spark.read.parquet(indexPath).count() == e.count())
  }

  test("duplicate ids inside one batch index once") {
    val e = emb.filter($"vec_id" < 100)
    val indexPath = tmp("asw_idx") + "/index"
    val centroidsPath = tmp("asw_cen") + "/centroids"
    AnnStream.processIvfBatch(e.unionAll(e), 0L, indexPath, centroidsPath,
      "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    val ids = spark.read.parquet(indexPath).select("vec_id").as[Long]
      .collect().toSeq
    assert(ids.length == ids.distinct.length && ids.length == e.count())
  }

  test("re-sent ids do not duplicate index rows") {
    val e = emb.filter($"vec_id" < 100)
    val indexPath = tmp("asd_idx") + "/index"
    val centroidsPath = tmp("asd_cen") + "/centroids"
    AnnStream.processIvfBatch(e, 0L, indexPath, centroidsPath,
      "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    // batch 1 re-sends half of batch 0 plus nothing new → no new rows
    AnnStream.processIvfBatch(e.filter($"vec_id" < 50), 1L, indexPath,
      centroidsPath, "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    val ids = spark.read.parquet(indexPath).select("vec_id").as[Long]
      .collect().toSeq
    assert(ids.length == ids.distinct.length)
    assert(ids.length == e.count())
  }
}
