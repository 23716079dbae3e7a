package graft.tools

import org.apache.spark.sql.functions._

/** Ingest-time cost evidence for the streaming containment monitor
  * (d17, [[graft.streaming.DedupStream.processContainmentBatch]]):
  * the corpus arrives in `slices` equal batches, each scored against
  * the signature index committed by the prior batches. The 100 TB
  * claim this probe pins is O(BATCH) WORK PER ROUND: candidate
  * generation's band join keeps the BATCH on its right side, so
  * per-batch wall must stay ~flat while the index grows `slices`×
  * behind it — the index contributes one scan of precomputed
  * signatures, never a re-shingle. A superlinear drift across
  * batches would mean ingest cost grows with corpus age, the failure
  * mode that makes ingest-time dedup impossible at scale.
  *
  * A second section measures the ANN ingest the same way
  * ([[graft.streaming.AnnStream.processIvfBatch]]: batch 0 pays the
  * one-time quantizer training, later batches are assign-only).
  *
  * Every batch reads its slice from the SOURCE parquet (no Spark
  * cache): a cached batch 0 vs uncached batch N would make the
  * flat-wall comparison apples-to-oranges.
  *
  * Prints one JSON line:
  *   {"metric":"ingest_containment","slices":N,
  *    "cells":[{"batch":i,"sec":s,"batch_docs":n,"index_docs":m,
  *              "pairs":p},...],
  *    "ann_cells":[{"batch":i,"sec":s,"batch_vecs":n},...]}
  * Usage: runMain graft.tools.IngestProbe [sfDir] [slices]
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val slices = args.lift(1).map(_.toInt).getOrElse(10)

    val base = java.nio.file.Files.createTempDirectory("graft_ingest_probe")
    val indexPath = base.resolve("index").toString
    val pairsPath = base.resolve("pairs").toString
    val docs = graft.core.Tables.documents(spark, src)
      .select("doc_id", "text")
    docs.count() // warm the page cache; every batch then reads uncached

    // warm-up: JIT + codegen for the whole batch path on a small slice
    graft.streaming.DedupStream.processContainmentBatch(
      docs.filter(col("doc_id") % 100 === 0), 0L,
      base.resolve("warm_idx").toString, base.resolve("warm_pairs").toString,
      "doc_id", "text")
    spark.catalog.clearCache()

    val cells = (0 until slices).map { i =>
      val batch = docs.filter(pmod(col("doc_id"), lit(slices)) === i)
      val batchDocs = batch.count()
      val indexDocs =
        if (i == 0) 0L
        else spark.read.parquet(indexPath).count()
      val t0 = System.nanoTime()
      graft.streaming.DedupStream.processContainmentBatch(batch, i.toLong,
        indexPath, pairsPath, "doc_id", "text")
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // per-batch caches must not pay forward
      val pairs = spark.read.parquet(s"$pairsPath/batch_id=$i").count()
      println(f"[ingest] batch $i%2d  $dt%6.2f s  batch=$batchDocs%6d  " +
        f"index=$indexDocs%7d  pairs=$pairs%6d")
      (i, dt, batchDocs, indexDocs, pairs)
    }

    // ANN ingest (s13's AnnStream): batch 0 trains + freezes the coarse
    // quantizer, later batches are assign-only — per-batch wall must
    // stay flat as the index grows behind the batch (the only
    // index-sized touch is the column-pruned committed-id anti-join)
    val annIdx = base.resolve("ann_index").toString
    val annCen = base.resolve("ann_cen").toString
    val vecs = graft.core.Tables.embeddings(spark, src)
      .select("vec_id", "embedding")
    vecs.count() // warm the page cache; every batch then reads uncached
    val annCells = (0 until slices).map { i =>
      val batch = vecs.filter(pmod(col("vec_id"), lit(slices)) === i)
      val batchVecs = batch.count()
      val t0 = System.nanoTime()
      graft.streaming.AnnStream.processIvfBatch(batch, i.toLong, annIdx,
        annCen, "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[ingest] ann batch $i%2d  $dt%6.2f s  batch=$batchVecs%6d")
      (i, dt, batchVecs)
    }

    def block(name: String, rows: Seq[String]) =
      rows.mkString(s""""$name":[""", ",", "]")
    val json = Seq(
      block("cells", cells.map { case (i, t, b, m, p) =>
        f"""{"batch":$i,"sec":$t%.2f,"batch_docs":$b,"index_docs":$m,"pairs":$p}"""
      }),
      block("ann_cells", annCells.map { case (i, t, b) =>
        f"""{"batch":$i,"sec":$t%.2f,"batch_vecs":$b}"""
      })
    ).mkString(s"""{"metric":"ingest_containment","slices":$slices,""",
      ",", "}")
    println(json)
    spark.stop()
    graft.core.TempDirs.deleteRecursively(base.toFile)
  }
}
