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

    // Survivor-rule dedup ingest (d18's DedupStream.processBatch): the
    // MinHash survivor ingest — each batch resolves against the
    // committed SURVIVOR index (band join right side = batch, windows
    // over only the batch-touching pair graph), so per-batch wall must
    // stay flat while the survivor index grows behind the batch, the
    // same O(batch) shape as the containment cells above with the
    // added cluster-resolution stage.
    val dedupIdx = base.resolve("dedup_index").toString
    val dedupPairs = base.resolve("dedup_pairs").toString
    val dedupSurv = base.resolve("dedup_surv").toString
    val dedupCells = (0 until slices).map { i =>
      val batch = docs.filter(pmod(col("doc_id"), lit(slices)) === i)
      val batchDocs = batch.count()
      val t0 = System.nanoTime()
      graft.streaming.DedupStream.processBatch(batch, i.toLong, dedupIdx,
        dedupPairs, dedupSurv, "doc_id", "text")
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val survivors = spark.read.parquet(s"$dedupSurv/batch_id=$i").count()
      println(f"[ingest] dedup batch $i%2d  $dt%6.2f s  batch=$batchDocs%6d  " +
        f"survivors=$survivors%6d")
      (i, dt, batchDocs, survivors)
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

    // Publish lifecycle: full fold (O(corpus) — reads and reshuffles
    // the entire raw tree) vs incremental fold of a LOCALIZED delta
    // ([[graft.streaming.AnnStream.publishIndexDelta]]: reads the new
    // batch partitions plus ONLY the affected published cells,
    // rewrites exactly those cell dirs). The honest cost claim is
    // O(delta + affected inverted lists) — at a few-thousand-row
    // index the delta path's fixed job count swamps the corpus scan,
    // so this cell runs on a `pubScale`×-replicated embedding set
    // (distinct ids, same frozen-model mechanics) where the corpus
    // read genuinely dominates, and records ROWS alongside wall: the
    // full fold touches every row, the delta fold touches
    // delta + one inverted list, and that ratio is what holds at
    // 100 TB. The delta is a small arrival landing in ONE cell
    // (vectors drawn from a single existing cell, re-sent under
    // fresh ids — the frozen quantizer assigns them back to the
    // same cell).
    val pubScale = args.lift(2).map(_.toInt).getOrElse(10)
    // replica offset far above any source id (the 10× tree already
    // uses +1e8-per-copy shifts — a smaller stride would collide and
    // dropDuplicates would silently shrink the corpus)
    val bigVecs = (0 until pubScale)
      .map(c => vecs.select(
        (col("vec_id") + lit(c * 10000000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _)
    val pubIdx = base.resolve("pub_index").toString
    val pubCen = base.resolve("pub_cen").toString
    graft.streaming.AnnStream.processIvfBatch(bigVecs, 0L, pubIdx, pubCen,
      "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    spark.catalog.clearCache()
    val rowsTotal = spark.read.parquet(pubIdx).count()

    val pubFull = base.resolve("pub_full").toString
    val tFull0 = System.nanoTime()
    graft.streaming.AnnStream.publishIndex(spark, pubIdx, pubFull)
    val tFull = (System.nanoTime() - tFull0) / 1e9
    spark.catalog.clearCache()

    val oneCell = spark.read.parquet(pubIdx)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .filter(col("cell") === 0L).limit(50).select("vec_id")
    val localized = bigVecs.join(oneCell, "vec_id")
      .select((col("vec_id") + 7000000000000L).as("vec_id"),
        col("embedding"))
    val deltaRows = localized.count()
    graft.streaming.AnnStream.processIvfBatch(localized, 1L, pubIdx,
      pubCen, "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
    val cellRows = spark.read.parquet(pubFull)
      .filter(col("cell") === 0).count() // what the delta fold rereads
    spark.catalog.clearCache()
    val tDelta0 = System.nanoTime()
    graft.streaming.AnnStream.publishIndexDelta(spark, pubIdx, pubFull)
    val tDelta = (System.nanoTime() - tDelta0) / 1e9
    val affected = 1 // by construction: the localized batch's one cell
    println(f"[ingest] publish full $tFull%6.2f s ($rowsTotal rows)  " +
      f"delta $tDelta%6.2f s (reads $deltaRows delta + $cellRows cell rows, " +
      f"affected_cells=$affected/8)")

    // PQ serving recall: does the batch-0-TRAINED residual codebook
    // (AnnStream.trainPqCodebook) beat the data-independent spread
    // table as a shortlist filter? recall@5 of the two-stage PQ serve
    // (ADC shortlist → exact rerank) against the exhaustive exact
    // top-5, plus the IVF ceiling (exact ranking within the same
    // nprobe=2 probed cells — the recall the probe loss alone allows;
    // the gap between a codebook's recall and the ceiling is CODING
    // loss, the number training is supposed to shrink).
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val qn = 50
    def qz(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      transform(col("embedding").cast(ArrayType(DoubleType)),
        x => floor(x * 1000000d).cast(LongType)).as("q"))
    val exact = graft.similarity.Ann.integerTopK(
      qz(vecs).withColumn("k0", lit(0)),
      qz(vecs.filter(col("vec_id") < qn))
        .select(col("vec_id").as("query_id"), col("q").as("qv"))
        .withColumn("k0", lit(0)),
      "vec_id", "k0", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("query_id").cast("long"),
          col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val pqQueries = vecs.filter(col("vec_id") < qn)
    def servedRecall(cb: Seq[Seq[Seq[Long]]], tag: String): Double = {
      val coded = base.resolve(s"pq_$tag").toString
      graft.streaming.AnnStream.publishPqIndex(spark, annIdx, annCen,
        coded, "vec_id", m = 8, k = 8, cb)
      val r = recallOf(graft.streaming.AnnStream.pqServeTopK(spark, coded,
        annCen, vectors = vecs, queries = pqQueries, "vec_id", "embedding",
        m = 8, k = 8, nprobe = 2, shortlist = 20, topK = 5, cb))
      spark.catalog.clearCache()
      r
    }
    val recallSpread = servedRecall(
      graft.similarity.Ann.portablePqCodebookSpread(8, 8, 8), "spread")
    val recallTrained = servedRecall(
      graft.streaming.AnnStream.trainPqCodebook(spark, annIdx, annCen,
        m = 8, k = 8, iters = 2), "trained")
    val recallCeiling = recallOf(graft.streaming.AnnStream.ivfServeTopK(
      spark, annIdx, annCen, pqQueries, "vec_id", "embedding",
      topK = 5, nprobe = 2))
    println(f"[ingest] pq recall@5: spread $recallSpread%.3f  " +
      f"trained $recallTrained%.3f  ivf_ceiling $recallCeiling%.3f")

    // PQ recall-knob SWEEP (round-13 verdict #4): the single trained
    // point (shortlist 20, 2 Lloyd's iterations → recall@5 0.200 vs
    // IVF ceiling 0.524) left the remaining coding loss unswept. One
    // cell per (iters, shortlist) point — training iterations attack
    // coding loss at PUBLISH time (better codebooks, same serve
    // cost), shortlist attacks it at SERVE time (more exact reranks
    // per query) — so the curve shows which knob buys recall per unit
    // of serve wall, and where the ceiling caps further tuning.
    val sweepCbs = Seq(2, 5).map { iters =>
      iters -> graft.streaming.AnnStream.trainPqCodebook(spark, annIdx,
        annCen, m = 8, k = 8, iters = iters)
    }.toMap
    val sweep = Seq(2, 5).flatMap { iters =>
      val cb = sweepCbs(iters)
      val coded = base.resolve(s"pq_sweep_i$iters").toString
      graft.streaming.AnnStream.publishPqIndex(spark, annIdx, annCen,
        coded, "vec_id", m = 8, k = 8, cb)
      Seq(20, 50, 100).map { shortlist =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val r = recallOf(graft.streaming.AnnStream.pqServeTopK(spark,
          coded, annCen, vectors = vecs, queries = pqQueries, "vec_id",
          "embedding", m = 8, k = 8, nprobe = 2, shortlist = shortlist,
          topK = 5, cb))
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[ingest] pq sweep iters=$iters shortlist=$shortlist%3d  " +
          f"recall@5 $r%.3f  serve $dt%5.2f s")
        (iters, shortlist, r, dt)
      }
    }

    // The nprobe axis of the same sweep: the spread→trained→shortlist
    // knobs all chase the nprobe=2 CEILING (the recall the probe loss
    // alone allows) — past shortlist ~100 the remaining loss is probe
    // loss, and the knob that moves it is nprobe. One cell per nprobe
    // at the sweep's best codebook/shortlist, with the matching
    // ceiling, so the curve shows recall converging to (and the
    // ceiling rising with) wider probes at linearly more read cost.
    // the SAME frozen table pq_sweep_i5 was published with — a
    // retrain here would rest the ADC sums' validity on trainer
    // bit-determinism for no reason (the pqServeTopK MUST-match rule)
    val cbBest = sweepCbs(5)
    val codedBest = base.resolve("pq_sweep_i5").toString // published above
    val nprobeSweep = Seq(2, 4, 8).map { np =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = recallOf(graft.streaming.AnnStream.pqServeTopK(spark,
        codedBest, annCen, vectors = vecs, queries = pqQueries, "vec_id",
        "embedding", m = 8, k = 8, nprobe = np, shortlist = 100,
        topK = 5, cbBest))
      val dt = (System.nanoTime() - t0) / 1e9
      val ceil = recallOf(graft.streaming.AnnStream.ivfServeTopK(
        spark, annIdx, annCen, pqQueries, "vec_id", "embedding",
        topK = 5, nprobe = np))
      println(f"[ingest] pq nprobe=$np  recall@5 $r%.3f  " +
        f"ceiling $ceil%.3f  serve $dt%5.2f s")
      (np, r, ceil, dt)
    }

    // COMPACTION pricing (round-13 verdict #3): compactIndex exists so
    // a months-long ingest's committed prefix does not decay into
    // thousands of tiny partitions that every batch's index scan must
    // list and open. Two signature ingests over the same `nComp`-batch
    // arrival — compactEvery=8 (the in-stream cadence: fold
    // `batch_id <= N-1` after batch N, the maybeCompact bound) vs
    // never — recording per batch: ingest wall, the COMMITTED-INDEX
    // SCAN wall as the next batch sees it (read + count of the full
    // tree, cache cleared), and the tree's data-file / partition-dir
    // counts. The claim priced: without compaction both file count and
    // scan wall grow with batch NUMBER (corpus age); with it they stay
    // bounded by the cadence.
    val nComp = args.lift(3).map(_.toInt).getOrElse(60)
    val sigsAll = docs.select(col("doc_id"),
      graft.dedup.Dedup.simhash64(col("text")).as("sig"))
    def countTree(path: String): (Long, Long) = {
      val root = new java.io.File(path)
      def files(f: java.io.File): Long = {
        val c = f.listFiles(); if (c == null) 0L
        else c.map(x => if (x.isDirectory) files(x)
          else if (x.getName.endsWith(".parquet")) 1L else 0L).sum
      }
      val dirs = Option(root.listFiles()).map(
        _.count(d => d.isDirectory && d.getName.startsWith("batch_id="))).getOrElse(0)
      (files(root), dirs.toLong)
    }
    def compRun(tag: String, every: Option[Int]) = {
      val idxP = base.resolve(s"comp_idx_$tag").toString
      val prsP = base.resolve(s"comp_pairs_$tag").toString
      val cs = (0 until nComp).map { i =>
        val batch = sigsAll.filter(pmod(col("doc_id"), lit(nComp)) === i)
        val t0 = System.nanoTime()
        graft.streaming.DedupStream.processSignatureBatch(batch, i.toLong,
          idxP, prsP, "doc_id", "sig", maxHamming = 3)
        every.filter(n => i > 0 && i % n == 0).foreach(_ =>
          graft.streaming.DedupStream.compactIndex(spark, idxP, i - 1L))
        val tIngest = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val tS0 = System.nanoTime()
        spark.read.parquet(idxP).count() // what batch i+1's guard scans
        val tScan = (System.nanoTime() - tS0) / 1e9
        val (nFiles, nDirs) = countTree(idxP)
        (i, tIngest, tScan, nFiles, nDirs)
      }
      (idxP, cs)
    }
    val (plainIdx, compPlain) = compRun("plain", None)
    val (_, compFolded) = compRun("folded", Some(8))
    Seq(("none", compPlain), ("every8", compFolded)).foreach { case (t, cs) =>
      val last = cs.last
      println(f"[ingest] compaction=$t%-7s batches=$nComp  " +
        f"final files=${last._4}  dirs=${last._5}  " +
        f"scan first=${cs.head._3}%5.2f s last=${last._3}%5.2f s")
    }

    // RETIREMENT pricing (round-14 verdict #2a): retireIds' cost claim
    // is "∝ affected partitions, tree-size-independent" — one pruned
    // semi-join finds the affected batch dirs, only those are re-read,
    // filtered and swapped. Cells: retire id sets touching 1 / 8 / 32
    // of the plain tree's 60 batch dirs (5 ids per dir, picked from
    // the current tree so each round retires live rows) at FIXED tree
    // size. If the claim holds, wall grows with `affected`, with a
    // fixed floor (the semi-join probe scans the whole tree's id
    // column once — column-pruned, the committed-id-guard cost shape).
    val retireCells = Seq(1, 8, 32).map { naff =>
      import spark.implicits._
      val ids = (0 until naff).flatMap { b =>
        spark.read.parquet(s"$plainIdx/batch_id=$b").select("doc_id")
          .limit(5).collect().map(_.getLong(0))
      }
      val idsDf = ids.toDF("doc_id")
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.streaming.DedupStream.retireIds(spark, plainIdx, idsDf,
        "doc_id")
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ingest] retire affected=$naff%2d/60  $dt%6.2f s  " +
        f"(${ids.length} ids)")
      (naff, dt, ids.length)
    }

    // RETIRE-PROBE scaling (round-16 verdict #3): the affected-
    // partition probe is now FOOTER-STATS-BOUNDED
    // (DedupStream.statsCandidateParts): per-partition id min/max come
    // from parquet footers (metadata, no column data, no job over the
    // tree), and only candidate partitions' id columns are probed
    // exactly. Cells: a 60-dir and a 600-dir flat signature tree with
    // RANGE-sliced ids (each batch dir holds a contiguous id range —
    // the monotone-arrival-id shape real erasure requests hit, where
    // stats genuinely discriminate), retiring 5 ids confined to one
    // dir; plus a 600-dir MOD-sliced tree (every dir spans the full id
    // range — stats prune nothing, the documented worst case) to show
    // the fallback costs no more than the old full probe. Claim: the
    // range-sliced walls stay near-flat from 60 → 600 dirs. The trees
    // are built by one partitioned write each (the probe prices
    // retireIds, not ingest).
    val maxDoc = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    // `sidecar = true` gives the tree per-dir [[StatsSidecar]] entries
    // first (what any compaction/retire/migration would have written on
    // a MAINTAINED tree) — the round-17 manifest cells: mod-sliced ids
    // at 600 dirs must then cost ~the ranged case (the Bloom prunes
    // what min/max cannot) and the ranged cases drop to O(dirs) small
    // reads instead of O(files) footer opens.
    def retireProbeCell(tag: String, nd: Int, ranged: Boolean,
        sidecar: Boolean = false) = {
      val treeP = base.resolve(s"rps_${tag}").toString
      val bcol =
        if (ranged) floor(col("doc_id") / lit(maxDoc / nd + 1))
        else pmod(col("doc_id"), lit(nd))
      sigsAll.withColumn("batch_id", bcol)
        .repartition(col("batch_id"))
        .write.partitionBy("batch_id").parquet(treeP)
      if (sidecar)
        graft.streaming.StatsSidecar.writeForTree(spark, treeP,
          "batch_id=", "doc_id")
      import spark.implicits._
      val ids = spark.read.parquet(s"$treeP/batch_id=7")
        .select("doc_id").limit(5).collect().map(_.getLong(0)).toSeq
      val idsDf = ids.toDF("doc_id")
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.streaming.DedupStream.retireIds(spark, treeP, idsDf, "doc_id")
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ingest] retire probe $tag%-14s dirs=$nd%4d  $dt%6.2f s  " +
        f"(${ids.length} ids)")
      (tag, nd, dt, ids.length)
    }
    val retireProbe = Seq(
      retireProbeCell("ranged60", 60, ranged = true),
      retireProbeCell("ranged600", 600, ranged = true),
      retireProbeCell("mod600", 600, ranged = false),
      retireProbeCell("ranged600_sc", 600, ranged = true, sidecar = true),
      retireProbeCell("mod600_sc", 600, ranged = false, sidecar = true))

    // RETIREMENT pricing (round-14 verdict #2b): the per-batch cost of
    // DRAINING the queue under a 20-batch ingest — a request landing
    // every other batch vs a permanently empty queue. The empty-queue
    // drain must be metadata-only (one directory listing); the
    // non-empty drain pays one retire of its affected partition.
    def drainRun(tag: String, withRequests: Boolean) = {
      val idxP = base.resolve(s"drain_idx_$tag").toString
      val prsP = base.resolve(s"drain_pairs_$tag").toString
      val queueDir = base.resolve(s"drain_queue_$tag")
      java.nio.file.Files.createDirectories(queueDir)
      val nDrain = 20
      (0 until nDrain).map { i =>
        if (withRequests && i % 2 == 1) {
          // stage-then-rename landing (the documented contract)
          import spark.implicits._
          val ids = spark.read.parquet(s"$idxP/batch_id=${i - 1}")
            .select("doc_id").limit(5).collect().map(_.getLong(0)).toSeq
          val stage = base.resolve(s"drain_stage_${tag}_$i")
          ids.toDF("doc_id").coalesce(1).write
            .parquet(stage.toString)
          val part = stage.toFile.listFiles()
            .find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath,
            queueDir.resolve(f"req_$i%03d.parquet"))
        }
        val batch = sigsAll.filter(pmod(col("doc_id"), lit(nDrain)) === i)
        val tD0 = System.nanoTime()
        val applied = graft.streaming.DedupStream.drainRetireQueue(spark,
          queueDir.toString, Seq(idxP -> Nil), "doc_id")
        val tDrain = (System.nanoTime() - tD0) / 1e9
        val tB0 = System.nanoTime()
        graft.streaming.DedupStream.processSignatureBatch(batch, i.toLong,
          idxP, prsP, "doc_id", "sig", maxHamming = 3)
        val tBatch = (System.nanoTime() - tB0) / 1e9
        spark.catalog.clearCache()
        (i, tDrain, tBatch, applied)
      }
    }
    val drainEmpty = drainRun("empty", withRequests = false)
    val drainReq = drainRun("withreq", withRequests = true)
    Seq(("empty", drainEmpty), ("withreq", drainReq)).foreach { case (t, cs) =>
      val dsum = cs.map(_._2).sum
      println(f"[ingest] drain=$t%-8s batches=${cs.length}  " +
        f"drain total=$dsum%6.2f s  avg=${dsum / cs.length}%6.3f s/batch  " +
        f"applied=${cs.map(_._4).sum}")
    }

    // ANN-tree compaction pricing (round-14 verdict #3): the r14
    // pairing covered the flat signature layout; this is its twin on
    // the CELL-PARTITIONED raw ANN tree (batch_id=N/cell=M — compact
    // preserves the inner cell layout, so the serve path's pruning
    // contract survives the fold). 60 one-batch arrivals
    // with/without compactEvery=8, recording per batch: ingest wall,
    // a timed cell-pruned SERVE against the raw tree (what the
    // nprobe read path pays as the dir count grows), and the tree's
    // file/dir counts.
    val annQ = vecs.filter(col("vec_id") < 5)
    def annCompRun(tag: String, every: Option[Int]) = {
      val idxP = base.resolve(s"anncomp_idx_$tag").toString
      val cenP = base.resolve(s"anncomp_cen_$tag").toString
      (0 until nComp).map { i =>
        val batch = vecs.filter(pmod(col("vec_id"), lit(nComp)) === i)
        val t0 = System.nanoTime()
        graft.streaming.AnnStream.processIvfBatch(batch, i.toLong, idxP,
          cenP, "vec_id", "embedding", dim = 64, cells = 8, iters = 2)
        every.filter(n => i > 0 && i % n == 0).foreach(_ =>
          graft.streaming.DedupStream.compactIndex(spark, idxP, i - 1L,
            partitionCols = Seq("cell")))
        val tIngest = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val tS0 = System.nanoTime()
        graft.streaming.AnnStream.ivfServeTopK(spark, idxP, cenP, annQ,
          "vec_id", "embedding", topK = 3, nprobe = 2).count()
        val tServe = (System.nanoTime() - tS0) / 1e9
        val (nFiles, nDirs) = countTree(idxP)
        (i, tIngest, tServe, nFiles, nDirs)
      }
    }
    val annCompPlain = annCompRun("plain", None)
    val annCompFolded = annCompRun("folded", Some(8))
    Seq(("none", annCompPlain), ("every8", annCompFolded)).foreach {
      case (t, cs) =>
        val last = cs.last
        println(f"[ingest] ann compaction=$t%-7s batches=$nComp  " +
          f"final files=${last._4}  dirs=${last._5}  " +
          f"serve first=${cs.head._3}%5.2f s last=${last._3}%5.2f s")
    }

    // ANN SERVING-TREE retirement pricing: [[AnnStream.retireIds]]
    // rewrites affected CELLS only (the replaceCells protocol — s19's
    // spec pins untouched-cell files byte-stable; this prices the
    // wall). Publish the 60-batch plain raw tree to the cell serving
    // layout, then retire id sets confined to 1 / 2 / 4 / 8 of its 8
    // cells (5 live ids per cell, picked fresh each round) at fixed
    // tree size. The claim: wall grows with the affected-cell count
    // over a fixed floor (the semi-join probe that finds the affected
    // cells scans the tree's id/cell columns once), never with tree
    // size.
    // Republish from the raw tree BEFORE EACH round (r15 advice): a
    // retire permanently deletes rows, so without the per-round
    // republish the 2/4/8-cell rounds would measure a tree already
    // shrunk by earlier rounds while claiming fixed tree size.
    val annServP = base.resolve("ann_retire_serving").toString
    val annRetire = Seq(1, 2, 4, 8).map { ncells =>
      import spark.implicits._
      graft.streaming.AnnStream.publishIndex(spark,
        base.resolve("anncomp_idx_plain").toString, annServP)
      val ids = (0 until ncells).flatMap { c =>
        spark.read.parquet(annServP).filter(col("cell") === c)
          .select("vec_id").limit(5).collect().map(_.getLong(0))
      }
      val idsDf = ids.toDF("vec_id")
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.streaming.AnnStream.retireIds(spark, annServP, idsDf, "vec_id")
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ingest] ann retire cells=$ncells/8  $dt%6.2f s  " +
        f"(${ids.length} ids)")
      (ncells, dt, ids.length)
    }

    // CAPACITY-MIGRATION pricing (round-17 verdict #1): two claims.
    // (a) the per-batch check autoCapacity adds is METADATA-ONLY when
    //     it declines — a pooled footer row-count walk plus one model
    //     read — and near-flat in tree dirs (cells: the same 1k-row
    //     corpus under 60 vs 600 batch dirs, rule already satisfied);
    // (b) the migration itself is O(corpus) — one retrain over the
    //     committed rows plus one re-shard shuffle — and fires O(log N)
    //     times over a stream's life (cells: a 10k corpus crossing
    //     8→32 and a 40k corpus crossing 8→64; wall should scale
    //     ~linearly with rows, NOT with the boundary count it skips).
    def synthV(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        ((pmod(xxhash64(concat_ws(":", col("id"), j)), lit(2000))
          - lit(1000)).cast("double") / 500.0).cast("float"))
        .as("embedding"))
    def migCell(tag: String, n: Long, nd: Int) = {
      val idxP = base.resolve(s"mig_${tag}_idx").toString
      val cenP = base.resolve(s"mig_${tag}_cen").toString
      val sv = synthV(n)
      val cents = graft.similarity.Ann.portableKmeansCentroids(
        sv.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        dim = 64, k = 8, iters = 2)
      graft.streaming.AnnStream.writeCentroids(spark, cents, cenP)
      graft.similarity.Ann
        .portableAssignWithCentroids(sv, "vec_id", "embedding", cents)
        .withColumn("batch_id", pmod(col("vec_id"), lit(nd)))
        .repartition(col("batch_id"), col("cell"))
        .write.partitionBy("batch_id", "cell").parquet(idxP)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val res = graft.streaming.AnnStream.migrateCapacityIfNeeded(spark,
        idxP, cenP, "vec_id", dim = 64, iters = 2)
      val dt = (System.nanoTime() - t0) / 1e9
      val to = res.map(_.cells).getOrElse(8)
      println(f"[ingest] capacity $tag%-12s rows=$n%6d dirs=$nd%4d  " +
        f"8->$to%-3d  $dt%6.2f s")
      (tag, n, nd, to, dt)
    }
    val migCells = Seq(
      migCell("check60", 1000L, 60),    // declines: rule(1000) = 8
      migCell("check600", 1000L, 600),  // declines, 10x dirs
      migCell("fire10k", 10000L, 4),    // fires: 8 -> 32
      migCell("fire40k", 40000L, 4))    // fires: 8 -> 64

    // ZERO-OUTAGE REPUBLISH pricing (round-18 #1): the same firing
    // migration with serving layouts attached, two dispositions —
    // r17's invalidate (trees deleted; the serve after fails loudly
    // until an operator republish) vs r18's staged republish (tree +
    // model + codebook promote under the one _mcommit; the serve
    // after answers immediately). The cell prices what the atomic
    // republish ADDS to the migration (one extra fold + one encode of
    // the re-sharded tree — O(corpus), the same family as the
    // migration itself) and evidences the availability claim (the
    // serve-after column).
    def migPubCell(tag: String, n: Long, repub: Boolean) = {
      val idxP = base.resolve(s"migp_${tag}_idx").toString
      val cenP = base.resolve(s"migp_${tag}_cen").toString
      val pubP = base.resolve(s"migp_${tag}_pub").toString
      val codedP = base.resolve(s"migp_${tag}_pq").toString
      val sv = synthV(n)
      val cents = graft.similarity.Ann.portableKmeansCentroids(
        sv.filter(col("vec_id") % 4 === 0), "vec_id", "embedding",
        dim = 64, k = 8, iters = 2)
      graft.streaming.AnnStream.writeCentroids(spark, cents, cenP)
      val assigned = graft.similarity.Ann
        .portableAssignWithCentroids(sv, "vec_id", "embedding", cents)
      assigned
        .withColumn("batch_id", pmod(col("vec_id"), lit(4)))
        .repartition(col("batch_id"), col("cell"))
        .write.partitionBy("batch_id", "cell").parquet(idxP)
      // the retained training slice a trainSliceRows ingest maintains
      // (the codebook retrain's input) — the SAME Selection hash-order
      // discipline maintainTrainSlice uses, so the fixture holds the
      // row set a real trainSliceRows=1024 ingest of this batch would
      // (r18 review: a hand-rolled md5 order sampled a different set)
      assigned.select(col("vec_id"), col("q"))
        .orderBy(graft.corpus.Selection.hashValue(
          graft.corpus.Selection.saltedKey(col("vec_id"), "tslice")),
          col("vec_id"))
        .limit(1024).coalesce(1)
        .write.parquet(s"${idxP}_tslice/batch_id=0")
      graft.streaming.AnnStream.publishIndex(spark, idxP, pubP)
      val cb = graft.streaming.AnnStream.trainPqCodebookFromSlice(spark,
        idxP, cenP, m = 8, k = 16, iters = 2)
      graft.streaming.AnnStream.publishPqIndex(spark, idxP, cenP, codedP,
        "vec_id", m = 8, k = 16, cb)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val res = graft.streaming.AnnStream.migrateCapacityIfNeeded(spark,
        idxP, cenP, "vec_id", dim = 64, iters = 2,
        servingTrees = if (repub) Nil else Seq(pubP, codedP),
        republishPublished = if (repub) Seq(pubP) else Nil,
        republishCoded = if (repub)
          Seq(graft.streaming.AnnStream.CodedRepublish(codedP, 8, 16, 2))
        else Nil)
      val dtMig = (System.nanoTime() - t0) / 1e9
      val to = res.map(_.cells).getOrElse(8)
      val queries = sv.filter(col("vec_id") < 8)
      val t1 = System.nanoTime()
      val pubOk = scala.util.Try(graft.streaming.AnnStream.ivfServeTopK(
        spark, pubP, cenP, queries, "vec_id", "embedding", topK = 3,
        nprobe = 4).count() > 0).getOrElse(false)
      val dtServe = (System.nanoTime() - t1) / 1e9
      val codedOk = scala.util.Try(graft.streaming.AnnStream.pqServeTopK(
        spark, codedP, cenP, vectors = sv, queries = queries, "vec_id",
        "embedding", m = 8, k = 16, nprobe = 2, shortlist = 20,
        topK = 3).count() > 0).getOrElse(false)
      println(f"[ingest] mig-repub $tag%-14s rows=$n%6d  8->$to%-3d  " +
        f"mig=$dtMig%6.2f s  pub_after=$pubOk%-5s coded_after=$codedOk%-5s " +
        f"serve=$dtServe%5.2f s")
      (tag, n, to, dtMig, pubOk, codedOk, dtServe)
    }
    val migPubCells = Seq(
      migPubCell("invalidate10k", 10000L, repub = false),
      migPubCell("republish10k", 10000L, repub = true))

    // d18 AMORTIZATION at production batch size (round-13 verdict #5):
    // the survivor ingest's per-batch cost at 500-doc batches is
    // dominated by the resolution stages' fixed job count (~2.1 s per
    // batch of overhead per the paired cells above). The claim that
    // this AMORTIZES needs a cell at a production batch size: the same
    // 10-batch arrival shape over a 10x corpus (distinct contents —
    // the Scale10Probe replication: copy-shifted ids, copy-seeded
    // token permutation so copies are not near-dups of each other),
    // ~5k docs per batch. If the overhead is fixed, per-DOC cost must
    // fall ~linearly with batch size vs the dedup_cells above.
    val permuted = expr(
      """array_join(transform(array_sort(transform(split(text, ' '),
        |  (t, i) -> named_struct(
        |    'h', md5(concat(t, '#', CAST(i AS STRING), '#', CAST(_k AS STRING))),
        |    't', t))), s -> s.t), ' ')""".stripMargin)
    val bigDocs = (0 until 10).map { c =>
      docs.withColumn("_k", lit(c))
        .select((col("doc_id") + lit(c * 10000000000L)).as("doc_id"),
          (if (c == 0) col("text") else permuted).as("text"))
    }.reduce(_ unionByName _)
    val bigIdx = base.resolve("big_dedup_index").toString
    val bigPairs = base.resolve("big_dedup_pairs").toString
    val bigSurv = base.resolve("big_dedup_surv").toString
    val bigCells = (0 until slices).map { i =>
      val batch = bigDocs.filter(pmod(col("doc_id"), lit(slices)) === i)
      val batchDocs = batch.count()
      val t0 = System.nanoTime()
      graft.streaming.DedupStream.processBatch(batch, i.toLong, bigIdx,
        bigPairs, bigSurv, "doc_id", "text")
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[ingest] big dedup batch $i%2d  $dt%6.2f s  " +
        f"batch=$batchDocs%6d  ms/doc=${dt * 1000 / batchDocs}%6.2f")
      (i, dt, batchDocs)
    }

    def block(name: String, rows: Seq[String]) =
      rows.mkString(s""""$name":[""", ",", "]")
    val json = Seq(
      block("cells", cells.map { case (i, t, b, m, p) =>
        f"""{"batch":$i,"sec":$t%.2f,"batch_docs":$b,"index_docs":$m,"pairs":$p}"""
      }),
      block("dedup_cells", dedupCells.map { case (i, t, b, sv) =>
        f"""{"batch":$i,"sec":$t%.2f,"batch_docs":$b,"survivors":$sv}"""
      }),
      block("ann_cells", annCells.map { case (i, t, b) =>
        f"""{"batch":$i,"sec":$t%.2f,"batch_vecs":$b}"""
      }),
      f""""publish":{"full_sec":$tFull%.2f,"delta_sec":$tDelta%.2f,""" +
        f""""rows_total":$rowsTotal,"delta_rows":$deltaRows,""" +
        f""""affected_cell_rows":$cellRows,"affected_cells":$affected,""" +
        f""""cells":8,"pub_scale":$pubScale}""",
      f""""pq_recall":{"spread":$recallSpread%.3f,""" +
        f""""trained":$recallTrained%.3f,""" +
        f""""ivf_ceiling":$recallCeiling%.3f,""" +
        f""""queries":$qn,"topk":5,"nprobe":2,"shortlist":20}""",
      block("pq_sweep", sweep.map { case (it, sl, r, dt) =>
        f"""{"iters":$it,"shortlist":$sl,"recall":$r%.3f,"serve_sec":$dt%.2f}"""
      }),
      block("pq_nprobe", nprobeSweep.map { case (np, r, ceil, dt) =>
        f"""{"nprobe":$np,"recall":$r%.3f,"ivf_ceiling":$ceil%.3f,"serve_sec":$dt%.2f}"""
      }),
      block("compaction_none", compPlain.map { case (i, ti, ts, nf, nd) =>
        f"""{"batch":$i,"ingest_sec":$ti%.2f,"index_scan_sec":$ts%.3f,"files":$nf,"dirs":$nd}"""
      }),
      block("compaction_every8", compFolded.map { case (i, ti, ts, nf, nd) =>
        f"""{"batch":$i,"ingest_sec":$ti%.2f,"index_scan_sec":$ts%.3f,"files":$nf,"dirs":$nd}"""
      }),
      block("retire_affected", retireCells.map { case (naff, dt, nids) =>
        f"""{"affected_dirs":$naff,"tree_dirs":$nComp,"sec":$dt%.2f,"ids":$nids}"""
      }),
      block("retire_probe_scaling", retireProbe.map { case (tg, nd, dt, nids) =>
        f"""{"tag":"$tg","tree_dirs":$nd,"sec":$dt%.2f,"ids":$nids}"""
      }),
      block("drain_empty", drainEmpty.map { case (i, td, tb, ap) =>
        f"""{"batch":$i,"drain_sec":$td%.3f,"ingest_sec":$tb%.2f,"applied":$ap}"""
      }),
      block("drain_withreq", drainReq.map { case (i, td, tb, ap) =>
        f"""{"batch":$i,"drain_sec":$td%.3f,"ingest_sec":$tb%.2f,"applied":$ap}"""
      }),
      block("ann_compaction_none", annCompPlain.map { case (i, ti, ts, nf, nd) =>
        f"""{"batch":$i,"ingest_sec":$ti%.2f,"serve_sec":$ts%.3f,"files":$nf,"dirs":$nd}"""
      }),
      block("ann_compaction_every8", annCompFolded.map { case (i, ti, ts, nf, nd) =>
        f"""{"batch":$i,"ingest_sec":$ti%.2f,"serve_sec":$ts%.3f,"files":$nf,"dirs":$nd}"""
      }),
      block("ann_retire", annRetire.map { case (ncells, dt, nids) =>
        f"""{"affected_cells":$ncells,"tree_cells":8,"sec":$dt%.2f,"ids":$nids}"""
      }),
      block("capacity_migration", migCells.map { case (tg, n, nd, to, dt) =>
        f"""{"tag":"$tg","rows":$n,"tree_dirs":$nd,"cells_from":8,"cells_to":$to,"sec":$dt%.2f}"""
      }),
      block("migration_republish", migPubCells.map {
        case (tg, n, to, dt, pok, cok, ds) =>
          f"""{"tag":"$tg","rows":$n,"cells_from":8,"cells_to":$to,""" +
            f""""mig_sec":$dt%.2f,"pub_serve_after":$pok,""" +
            f""""coded_serve_after":$cok,"pub_serve_sec":$ds%.2f}"""
      }),
      block("big_dedup_cells", bigCells.map { case (i, t, b) =>
        f"""{"batch":$i,"sec":$t%.2f,"batch_docs":$b,"ms_per_doc":${t * 1000 / b}%.2f}"""
      })
    ).mkString(s"""{"metric":"ingest_containment","slices":$slices,""",
      ",", "}")
    println(json)
    spark.stop()
    graft.core.TempDirs.deleteRecursively(base.toFile)
  }
}
